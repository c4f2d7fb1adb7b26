"""Distinct-count sketches with cross-engine-exact replay.

Spark's built-in approx_count_distinct is HyperLogLog++ — engine-specific
registers, so its driver oracle can only be a rows-check.  The KMV
(k-minimum-values) sketch here is the deterministic alternative: hash every
value with md5 (bit-identical in Spark and DuckDB), keep the k smallest
48-bit prefixes, and estimate distinct = (k-1) / (kth_min / 2^48) — the
classic bottom-k estimator (Bar-Yossef et al.).  Every intermediate is an
integer or a single double division, so the estimate is VALUE-EXACT across
engines and the driver hash-compare verifies the sketch itself, not just
row counts.

Scale shape: the estimator consumes the k smallest hashes per group.  This
query-form computes them with a per-group window over distinct hashes
(one shuffle keyed by group + rank cut); an always-on pipeline would keep a
bounded k-size state per group instead (mergeable: union then re-take k
smallest) — same estimate, O(k) memory per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 48)


def kmv_hash(value: Column) -> Column:
    """48-bit integer prefix of md5(value) — the sketch's hash function.

    Values hash via their STRING form so any engine hashing utf8 text
    (DuckDB md5(varchar)) produces identical digests.
    """
    return F.conv(
        F.substring(F.md5(value.cast("string").cast("binary")), 1, 12), 16, 10
    ).cast("long")


def kmv_distinct_estimate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """(group, n_exact, kmv_estimate) per group.

    Groups with fewer than k distinct values report the EXACT count (the
    sketch holds every value — standard KMV behavior); larger groups use
    the (k-1)/kth_min estimator.
    """
    hashed = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("v"))
        .distinct()
        .select("grp", kmv_hash(F.col("v")).alias("h"))
    )
    w = Window.partitionBy("grp").orderBy("h")
    ranked = hashed.withColumn("rk", F.row_number().over(w))
    per_group = ranked.groupBy("grp").agg(
        F.count("*").alias("n_exact"),
        F.max(F.when(F.col("rk") == k, F.col("h"))).alias("kth"),
    )
    est = F.when(
        F.col("kth").isNotNull(),
        F.round((k - 1) / (F.col("kth") / F.lit(_HASH_SPACE)), 4),
    ).otherwise(F.col("n_exact").cast("double"))
    return per_group.select(
        F.col("grp"),
        F.col("n_exact").cast("bigint").alias("n_exact"),
        est.alias("kmv_estimate"),
    )
