"""Skew-mitigation join: explicit key salting.

AQE's skew-join split (spark.sql.adaptive.skewJoin.*) is the first line of
defense and is enabled by default in our sessions; explicit salting is the
manual fallback for the cases AQE can't fix — e.g. a shuffle-hash join
where ONE key holds most rows on BOTH the probe and the build side, or a
groupBy-like join feeding a stateful op. The technique: append a salt in
[0, n) to the big side's key, replicate the small side n times (one copy
per salt), and join on (key, salt) — the hot key's rows now spread over n
reducers instead of one.

Cost model: small side grows n-fold (it must still fit its shuffle
partition), big side is unchanged; pick n ~ hot-key-rows / target-rows-
per-partition. Join RESULTS are identical for any salt assignment, so the
salt source only needs uniformity, not determinism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    num_salts: int = 16,
    how: str = "inner",
    salt_expr: Column | None = None,
) -> DataFrame:
    """Join ``big`` with ``small`` on ``on`` with the hot keys spread over
    ``num_salts`` reducers. ``small`` is replicated num_salts times."""
    salt = (
        salt_expr
        if salt_expr is not None
        else F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(num_salts))
    )
    big_s = big.withColumn("__salt", salt.cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return big_s.join(small_s, [*on, "__salt"], how).drop("__salt")
