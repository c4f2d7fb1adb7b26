"""JDBC source/sink wrappers.

The reference ships per-database JDBC engine dialects (externals/
kyuubi-jdbc-engine/.../dialect/ — Doris/MySQL/PostgreSQL/ClickHouse/...);
on Spark these reduce to `spark.read.jdbc` options, which already handle
dialect-specific type mapping, predicate pushdown, and partitioned reads.

Scale notes: always pass (partition_column, lower/upper bound, num_partitions)
for big tables — without them the read is a single connection on one
executor. `fetchsize` tunes row batching per round trip.

Tested end-to-end against embedded Derby (the one JDBC engine shipped
inside the Spark distribution): write/read round trip, partitioned reads,
and filter pushdown into the JDBC scan (tests/test_jdbc_roundtrip.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **properties: str,
) -> DataFrame:
    from kyuubi_spark.sources.jdbc_dialect import get_dialect

    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    # dialect-specific fetch/stream quirks (MySQL cursor fetch, PostgreSQL
    # prepare threshold, ...); explicit **properties override them below
    for k, v in get_dialect(url).reader_options(fetchsize).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned JDBC read needs lower_bound, upper_bound, num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    **properties: str,
) -> None:
    from kyuubi_spark.sources.jdbc_dialect import get_dialect

    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in get_dialect(url).writer_options(batchsize).items():
        writer = writer.option(k, v)
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.save()
