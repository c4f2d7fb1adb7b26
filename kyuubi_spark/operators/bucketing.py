"""Bucketed tables: co-located joins and aggregations without a shuffle.

The reference leans on AQE and rebalance rules for shuffle hygiene
(SURVEY §2.F); bucketing is the complementary STORAGE-side lever Spark
offers natively: write both fact tables hash-clustered on the join key
into the same bucket count, and every subsequent equi-join or groupBy on
that key is planned WITHOUT an Exchange — at 100 TB that turns the
nightly fact-to-fact join from a full network shuffle into a local merge
per bucket.

Usage contract mirrored from Spark's DataFrameWriter.bucketBy (public
API): bucketed tables must be saved as managed/catalog tables
(`saveAsTable`), not bare paths — the bucket spec lives in the catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` hash-bucketed on ``bucket_cols`` (optionally
    sorted within buckets — enables shuffle-AND-sort-free sort-merge
    joins)."""
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Spark plans this without any Exchange (verify with
    `plan_has_exchange`)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the executed plan contains a shuffle Exchange — the
    assertion hook for co-location tests (excludes broadcast exchanges,
    which move no shuffle data)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        line.strip().startswith(("Exchange", "+- Exchange", ":- Exchange"))
        or "Exchange hashpartitioning" in line
        for line in plan.splitlines()
        if "BroadcastExchange" not in line
    )
