"""Cross-engine numeric compatibility helpers.

``F.round`` on DOUBLE converts the exact binary value to BigDecimal and
rounds HALF_UP, while DuckDB (the correctness oracle) computes
``std::round(x * 10^s) / 10^s`` in IEEE doubles. For values that land on a
representation boundary (e.g. 26.241249999999997 * 1e4 == 262412.5 exactly)
the two disagree in the last digit. ``dround`` reproduces the
multiply-then-round sequence with IEEE semantics on the Spark side, so a
rounded value — and anything ranked or thresholded on it — is bit-identical
across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, scale: int = 0) -> Column:
    """DuckDB-equivalent ROUND(double, scale): round(x*10^s)/10^s in doubles."""
    if isinstance(col, str):
        col = F.col(col)
    if scale == 0:
        return F.round(col, 0)
    p = F.lit(float(10**scale))
    return F.round(col * p, 0) / p
