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


def pyround(x: float, scale: int = 0) -> float:
    """Driver-side twin of ``dround``: DuckDB/Spark-style ROUND on
    doubles (scale by 10^s, round HALF AWAY FROM ZERO, divide).  Python's
    builtin ``round`` is banker's (half-to-even), which disagrees with
    both engines exactly on the .5 boundaries that 6-decimal-rounded
    inputs routinely produce (e.g. 0.5*(a - b) of two 6dp values)."""
    import math

    p = float(10 ** scale)
    y = x * p
    f = math.floor(y)
    frac = y - f
    if frac > 0.5:
        r = f + 1.0
    elif frac < 0.5:
        r = f
    else:  # exact half: away from zero
        r = f + 1.0 if y > 0 else f
    return r / p
