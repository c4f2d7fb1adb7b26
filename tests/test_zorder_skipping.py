"""Quantified z-order file skipping — the baseline's headline claim.

BASELINE.md: the reference documents 99.5%+ row-skipping on point-range
predicates over z-ordered files (docs/extensions/engines/spark/z-order.md
case study). This test reproduces the mechanism at test scale and measures
it from the parquet footers directly: write the same 2-key dataset
z-ordered vs randomly ordered into the same file count, then count the
files whose column min/max statistics exclude a point-range predicate —
exactly the pruning a min/max-indexed scan (parquet row-group skipping,
Delta/Iceberg data skipping) performs.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kyuubi_spark.operators.zorder import optimize_zorder

N_FILES = 16
# point-range predicate à la the baseline's ip-range lookup
X_LO, X_HI = 100, 110
Y_LO, Y_HI = 200, 210


def _skip_fraction(path: str) -> float:
    """Fraction of parquet files whose footer min/max excludes the
    predicate (file can be skipped without reading any data page)."""
    files = glob.glob(f"{path}/*.parquet")
    assert files
    skipped = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        xmin = ymin = float("inf")
        xmax = ymax = float("-inf")
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == "x":
                    xmin, xmax = min(xmin, st.min), max(xmax, st.max)
                elif name == "y":
                    ymin, ymax = min(ymin, st.min), max(ymax, st.max)
        if xmax < X_LO or xmin > X_HI or ymax < Y_LO or ymin > Y_HI:
            skipped += 1
    return skipped / len(files)


@pytest.fixture(scope="module")
def datasets(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zskip")
    df = spark.range(200_000).select(
        ((F.col("id") * 2654435761) % 1000).alias("x"),
        ((F.col("id") * 40503) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )
    z_path, r_path = str(base / "zordered"), str(base / "random")
    optimize_zorder(df, ["x", "y"], num_partitions=N_FILES).drop("zvalue").write.mode(
        "overwrite"
    ).parquet(z_path)
    # control: same rows, hash-scattered across the same file count
    df.repartition(N_FILES).write.mode("overwrite").parquet(r_path)
    return z_path, r_path


def test_zorder_files_skip_point_range_predicate(datasets):
    z_path, r_path = datasets
    z_skip, r_skip = _skip_fraction(z_path), _skip_fraction(r_path)
    # z-order clusters both keys: the vast majority of files exclude the
    # 1%x1% predicate box; hash-scattered files exclude almost none
    assert z_skip >= 0.75, f"z-order skipped only {z_skip:.0%}"
    assert r_skip <= 0.25, f"random layout unexpectedly skipped {r_skip:.0%}"


def test_zorder_scan_result_is_unchanged(spark, datasets):
    z_path, r_path = datasets
    pred = (
        F.col("x").between(X_LO, X_HI) & F.col("y").between(Y_LO, Y_HI)
    )
    z_rows = spark.read.parquet(z_path).filter(pred).agg(
        F.count("*"), F.sum("payload")
    ).collect()
    r_rows = spark.read.parquet(r_path).filter(pred).agg(
        F.count("*"), F.sum("payload")
    ).collect()
    assert z_rows == r_rows
