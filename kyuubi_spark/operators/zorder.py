"""Z-order clustering for data-skipping locality.

Re-expresses the reference's z-order support
(extensions/spark/kyuubi-extension-spark-3-5/.../zorder/Zorder.scala:29-91,
ZorderBytesUtils.scala:33-75 bit interleaving; OptimizeZorderCommand.scala:
32-68 for `OPTIMIZE t [WHERE p] ZORDER BY c1,c2`) Spark-first:

- the z-value is a pure Column expression (shift/mask bit interleave —
  whole-stage-codegen, no UDF, no Python);
- `optimize_zorder` = one stats pass (min/max per column) + linear scaling
  to [0, 2^bits) + `repartitionByRange(zvalue).sortWithinPartitions` —
  exactly the repartition+sort the reference's command plans, with AQE free
  to size the range partitions. At 100 TB the stats pass is a cheap
  column-pruned scan and the sort is the unavoidable clustering cost
  (reference measures 5.3x OPTIMIZE overhead for 11x read speedup,
  docs/extensions/engines/spark/z-order.md:292-331).

Why z-order helps at scale: parquet min/max page+file stats let Spark skip
files whose [min,max] range excludes a predicate; sorting by interleaved
bits keeps BOTH columns' ranges tight in every file, so point/range lookups
on either column skip ~99% of files (z-order.md:310-331).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(c: Column, cmin: Column | float, cmax: Column | float, bits: int) -> Column:
    """Linearly map a numeric column into [0, 2^bits) as a long."""
    span = F.lit(cmax) - F.lit(cmin)
    frac = F.when(span <= 0, F.lit(0.0)).otherwise(
        (c.cast("double") - F.lit(cmin)) / span
    )
    top = float(2**bits - 1)
    # floor, not round: floor of an IEEE double is engine-independent, so the
    # same formula in ANSI SQL (the oracle) produces bit-identical z-values
    return F.least(
        F.greatest(F.floor(frac * top).cast("long"), F.lit(0)), F.lit(2**bits - 1)
    )


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Interleave ``bits`` low bits of each (non-negative long) column.

    Bit b of column j lands at position b*len(cols)+j — the classic Morton
    code (ZorderBytesUtils.interleaveBits). Pure shift/mask expression tree:
    codegen'd, ~bits*n_cols ops/row, no shuffle of its own.
    """
    n = len(cols)
    assert n >= 1 and bits * n <= 63, "z-value must fit a signed long"
    z = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + j))
    return z


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16) -> DataFrame:
    """Append a ``zvalue`` column: per-column min/max stats (one aggregate
    job, column-pruned) then scaled bit interleave."""
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"max_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        scale_to_bits(F.col(c), stats[f"min_{c}"] or 0.0, stats[f"max_{c}"] or 0.0, bits)
        for c in cols
    ]
    return df.withColumn("zvalue", interleave_bits(scaled, bits))


def optimize_zorder(
    df: DataFrame, cols: list[str], bits: int = 16, num_partitions: int | None = None
) -> DataFrame:
    """`OPTIMIZE ... ZORDER BY cols` as a DataFrame transform: cluster rows
    by z-value so a subsequent write produces skip-friendly files.

    repartitionByRange gives globally ordered, evenly sized output files
    (range boundaries from a sampled sketch — no full sort shuffle skew);
    sortWithinPartitions finishes the clustering file-locally.
    """
    z = zorder_value(df, cols, bits)
    parted = (
        z.repartitionByRange(num_partitions, "zvalue")
        if num_partitions
        else z.repartitionByRange("zvalue")
    )
    return parted.sortWithinPartitions("zvalue").drop("zvalue")
