"""Python DataSource connector (sources/pyds.py) — the DSv2 TPCHBatchScan
analog: partition chunking, Arrow-batch generation, filter pushdown into
the generator, and value parity with the mapInPandas datagen."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kyuubi_spark.sources import pyds  # noqa: E402
from kyuubi_spark.sources.datagen import SEGMENTS, gen_customer  # noqa: E402


@pytest.fixture(scope="module")
def registered(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pyds.register(spark)
    return spark


def _load(spark, sf="0.002", parts=None):
    r = spark.read.format(pyds.FORMAT_NAME).option("table", "customer").option(
        "sf", sf
    )
    if parts:
        r = r.option("numPartitions", str(parts))
    return r.load()


def test_connector_matches_datagen_exactly(registered):
    """Connector rows == mapInPandas generator rows (same key formulas),
    so the connector inherits the generator's verified value contract."""
    df = _load(registered)
    ref = gen_customer(registered, 0.002)
    assert df.count() == 300
    assert df.exceptAll(ref).count() == 0
    assert ref.exceptAll(df).count() == 0


def test_partition_chunking(registered):
    """numPartitions option controls InputPartition count — the
    TPCHBatchScan.scala:56-74 key-range chunking."""
    assert _load(registered, parts=3).rdd.getNumPartitions() == 3
    assert _load(registered, parts=16).rdd.getNumPartitions() == 16
    # ranges tile the key space exactly (no dupes/gaps at the seams)
    df = _load(registered, parts=7)
    assert df.select("c_custkey").distinct().count() == 300


def test_filter_pushdown_prunes_generation(registered):
    """EqualTo and In on c_mktsegment push into the generator — row
    counts prove pruning semantics; every derived frame loads fresh
    (one relation per query is the connector's documented usage)."""
    one = _load(registered).filter(F.col("c_mktsegment") == "BUILDING")
    assert one.count() == 300 // len(SEGMENTS)
    assert one.select("c_mktsegment").distinct().collect()[0][0] == "BUILDING"
    two = _load(registered).filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    assert two.count() == 2 * (300 // len(SEGMENTS))
    # a non-pushable predicate still evaluates correctly (Spark-side)
    rich = _load(registered).filter(F.col("c_acctbal") > 0)
    assert 0 < rich.count() < 300


def test_unsupported_table_fails_loudly(registered):
    with pytest.raises(Exception, match="unsupported table"):
        registered.read.format(pyds.FORMAT_NAME).option(
            "table", "lineitem"
        ).load().count()


def test_registry_entry_exercises_connector(spark, sf_dir):
    from kyuubi_spark.queries import all_queries

    df = all_queries()["pyds_tpch_scan"].builder(spark, sf_dir)
    rows = df.collect()
    assert [r["c_mktsegment"] for r in rows] == ["BUILDING", "MACHINERY"]
    assert all(r["n_cust"] == 300 for r in rows)
