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


def _load(spark, sf="0.002", parts=None, pushdown=False):
    r = spark.read.format(pyds.FORMAT_NAME).option("table", "customer").option(
        "sf", sf
    )
    if parts:
        r = r.option("numPartitions", str(parts))
    if pushdown:
        r = r.option("pushdown", "true")
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
    one = _load(registered, pushdown=True).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    assert one.count() == 300 // len(SEGMENTS)
    assert one.select("c_mktsegment").distinct().collect()[0][0] == "BUILDING"
    two = _load(registered, pushdown=True).filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    assert two.count() == 2 * (300 // len(SEGMENTS))
    # a non-pushable predicate still evaluates correctly (Spark-side)
    rich = _load(registered, pushdown=True).filter(F.col("c_acctbal") > 0)
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


# -- arrowdir write path (sources/arrowdir.py) -------------------------------


@pytest.fixture(scope="module")
def arrow_registered(spark):
    from kyuubi_spark.sources import arrowdir

    arrowdir.register(spark)
    return spark


def test_arrowdir_roundtrip_and_manifest(arrow_registered, tmp_path):
    import json
    import os

    from kyuubi_spark.sources.arrowdir import MANIFEST

    d = str(tmp_path / "sink")
    src = arrow_registered.range(100).selectExpr(
        "id", "id * 2 AS v", "CAST(id % 3 AS STRING) AS s"
    )
    src.repartition(4).write.format("kyuubi_arrowdir").mode("append").save(d)
    with open(os.path.join(d, MANIFEST)) as f:
        man = json.load(f)
    assert man["rows"] == 100 and len(man["files"]) == 4
    back = arrow_registered.read.format("kyuubi_arrowdir").load(d)
    assert back.schema == src.schema
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0
    # one read partition per manifested file
    assert back.rdd.getNumPartitions() == 4


def test_arrowdir_orphans_are_invisible(arrow_registered, tmp_path):
    """Files NOT in the manifest (a failed/speculative task's leftovers)
    must never be read — the commit-protocol visibility contract."""
    import os

    d = str(tmp_path / "sink2")
    arrow_registered.range(10).write.format("kyuubi_arrowdir").mode("append").save(d)
    # plant an orphan .arrow file (valid IPC, not manifested)
    import pyarrow as pa

    orphan = os.path.join(d, "part-orphan.arrow")
    with pa.ipc.new_file(
        orphan, pa.schema([("id", pa.int64())])
    ) as w:
        w.write_batch(pa.record_batch({"id": pa.array([999], pa.int64())}))
    back = arrow_registered.read.format("kyuubi_arrowdir").load(d)
    assert back.count() == 10
    assert back.filter("id = 999").count() == 0


def test_arrowdir_empty_partitions_commit_cleanly(arrow_registered, tmp_path):
    d = str(tmp_path / "sink3")
    df = arrow_registered.range(2).repartition(8)  # 6 empty partitions
    df.write.format("kyuubi_arrowdir").mode("append").save(d)
    back = arrow_registered.read.format("kyuubi_arrowdir").load(d)
    assert back.count() == 2


def test_arrowdir_write_empty_then_read_back(arrow_registered, tmp_path):
    """A committed zero-file manifest (every task partition empty) must
    read back as zero rows, not crash on pyspark's None partition."""
    d = str(tmp_path / "sink_empty")
    arrow_registered.range(5).filter("id < 0").write.format(
        "kyuubi_arrowdir"
    ).mode("append").save(d)
    back = arrow_registered.read.format("kyuubi_arrowdir").load(d)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["id"]


def test_arrowdir_append_schema_mismatch_fails_at_commit(
    arrow_registered, tmp_path
):
    """Appending a differently-shaped DataFrame must fail the COMMIT, not
    commit silently and explode at read time."""
    import pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    d = str(tmp_path / "sink_mismatch")
    arrow_registered.range(3).write.format("kyuubi_arrowdir").mode(
        "append"
    ).save(d)
    bad = arrow_registered.range(3).selectExpr("id", "id * 2 AS extra")
    with pytest.raises(AnalysisException, match="schema mismatch"):
        bad.write.format("kyuubi_arrowdir").mode("append").save(d)
    # the prior committed data is intact and readable
    back = arrow_registered.read.format("kyuubi_arrowdir").load(d)
    assert back.count() == 3


def test_arrowdir_append_sweeps_inprogress_orphans(arrow_registered, tmp_path):
    """Crashed-task .inprogress staging files are reclaimed on append
    commits once OLDER than the sweep age; a FRESH one (possibly a
    concurrently-running writer's live staging file) must survive."""
    import os
    import time

    from kyuubi_spark.sources.arrowdir import ORPHAN_SWEEP_AGE_SEC

    d = str(tmp_path / "sink_sweep")
    arrow_registered.range(4).write.format("kyuubi_arrowdir").mode(
        "append"
    ).save(d)
    old = os.path.join(d, "part-crashed.arrow.inprogress")
    fresh = os.path.join(d, "part-live-writer.arrow.inprogress")
    for p in (old, fresh):
        with open(p, "wb") as f:
            f.write(b"partial")
    past = time.time() - ORPHAN_SWEEP_AGE_SEC - 60
    os.utime(old, (past, past))
    arrow_registered.range(4, 8).write.format("kyuubi_arrowdir").mode(
        "append"
    ).save(d)
    assert not os.path.exists(old)  # aged orphan reclaimed
    assert os.path.exists(fresh)  # concurrent writer's file untouched
    os.remove(fresh)
    back = arrow_registered.read.format("kyuubi_arrowdir").load(d)
    assert back.count() == 8


def test_nationkey_pushdown_prunes_generation(registered):
    """c_nationkey is a modular image of the key too — EqualTo/In on it
    prune key generation; results match post-filtering the full scan."""
    full = _load(registered)
    want = full.filter(F.col("c_nationkey") == 7).collect()
    pushed = (
        _load(registered, pushdown=True)
        .filter(F.col("c_nationkey") == 7)
        .collect()
    )
    assert sorted(want) == sorted(pushed) and len(want) > 0
    combo = (
        _load(registered, pushdown=True)
        .filter(
            (F.col("c_nationkey").isin(3, 7))
            & (F.col("c_mktsegment") == "BUILDING")
        )
        .collect()
    )
    ref = [
        r
        for r in full.collect()
        if r.c_nationkey in (3, 7) and r.c_mktsegment == "BUILDING"
    ]
    assert sorted(combo) == sorted(ref)


def test_default_reader_is_reuse_safe(registered):
    """WITHOUT option("pushdown"), the reader has no pushFilters, so the
    plan-cache quirk cannot bite: a filterless action after a filtered
    action on the SAME loaded DataFrame stays full-cardinality."""
    df = _load(registered)
    assert df.filter(F.col("c_mktsegment") == "BUILDING").count() == 60
    assert df.count() == 300


def test_arrowdir_append_extends_committed_set(arrow_registered, tmp_path):
    """mode('append') must EXTEND the manifest — the second write may not
    orphan the first write's committed rows."""
    d = str(tmp_path / "sink4")
    arrow_registered.range(0, 5).write.format("kyuubi_arrowdir").mode(
        "append"
    ).save(d)
    arrow_registered.range(5, 10).write.format("kyuubi_arrowdir").mode(
        "append"
    ).save(d)
    back = arrow_registered.read.format("kyuubi_arrowdir").load(d)
    assert sorted(r.id for r in back.collect()) == list(range(10))


def test_arrowdir_overwrite_reclaims_stale_files(arrow_registered, tmp_path):
    import os

    d = str(tmp_path / "sink5")
    arrow_registered.range(5).write.format("kyuubi_arrowdir").mode(
        "overwrite"
    ).save(d)
    # plant a crashed task's staging file too
    open(os.path.join(d, "part-dead.arrow.inprogress"), "w").close()
    arrow_registered.range(3).repartition(1).write.format(
        "kyuubi_arrowdir"
    ).mode("overwrite").save(d)
    files = [f for f in os.listdir(d) if f.endswith((".arrow", ".inprogress"))]
    assert len(files) == 1  # only the live part survives
    back = arrow_registered.read.format("kyuubi_arrowdir").load(d)
    assert back.count() == 3


def test_pushdown_rejects_out_of_domain_values(registered):
    """EqualTo/In with values outside the column domain must NOT be
    claimed (claiming one would mis-prune); Spark evaluates them
    post-scan and results stay correct."""
    none = _load(registered, pushdown=True).filter(
        F.col("c_mktsegment") == "NOT_A_SEGMENT"
    )
    assert none.count() == 0
    bad_nation = _load(registered, pushdown=True).filter(
        F.col("c_nationkey") == 999
    )
    assert bad_nation.count() == 0
    mixed = _load(registered, pushdown=True).filter(
        F.col("c_mktsegment").isin("BUILDING", "NOT_A_SEGMENT")
    )
    assert mixed.count() == 60  # only the valid member matches


def test_arrowdir_abort_removes_reported_files(arrow_registered, tmp_path):
    """abort() deletes every part file whose task reported a commit
    message — driver-side cleanup of a failed job's visible leftovers."""
    import os

    import pyarrow as pa

    from kyuubi_spark.sources.arrowdir import _ArrowDirWriter

    d = str(tmp_path / "sink_abort")
    schema_json = (
        '{"type":"struct","fields":[{"name":"v","type":"long",'
        '"nullable":true,"metadata":{}}]}'
    )
    w = _ArrowDirWriter(d, schema_json, overwrite=False)
    msgs = [
        w.write(iter([pa.record_batch({"v": pa.array([i], pa.int64())})]))
        for i in range(3)
    ]
    assert len([f for f in os.listdir(d) if f.endswith(".arrow")]) == 3
    w.abort(msgs)
    assert [f for f in os.listdir(d) if f.endswith(".arrow")] == []
