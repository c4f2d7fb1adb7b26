"""Write-path value-add: rebalance-before-write + auto z-order.

Counterparts of the reference rules
(extensions/.../RebalanceBeforeWriting.scala:1-177 — inject AQE-optimized
RebalancePartitions before INSERT/CTAS to prevent small files;
zorder/InsertZorderBeforeWriting.scala:1-179 — auto z-sort when table props
request it). Both are wrappers around our write path instead of Catalyst
injection: the gateway funnels writes through ``write_table``.

Scale rationale: an unbalanced final stage writes one file per task — at
1000 executors that's thousands of small files per insert. The REBALANCE
hint lets AQE coalesce/split shuffle blocks to target-size outputs
(spark.sql.adaptive.advisoryPartitionSizeInBytes), which is exactly what
the reference's injected RebalancePartitions node does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kyuubi_spark.operators.zorder import optimize_zorder


def rebalance(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """AQE rebalance ahead of a write (small-files prevention).

    Uses the REBALANCE hint (Spark 3.4+), the DataFrame face of
    RebalancePartitions — AQE splits skewed / coalesces tiny partitions.
    """
    if cols:
        return df.hint("rebalance", *cols)
    return df.hint("rebalance")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    rebalance_by: list[str] | None = None,
    do_rebalance: bool = True,
) -> None:
    """Gateway write path with the reference's auto-injected optimizations.

    Order matters (InsertZorderBeforeWriting then rebalance in the
    reference's rule list): z-order clustering first (global range
    repartition + local sort), rebalance only when NOT z-ordering (a
    rebalance after the range partition would destroy clustering).
    """
    out = df
    if zorder_by:
        out = optimize_zorder(out, zorder_by)
    elif do_rebalance:
        out = rebalance(out, rebalance_by)
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
