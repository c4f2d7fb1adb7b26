"""Sources suite: format round-trips + deterministic datagen."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kyuubi_spark.sources import datagen, formats  # noqa: E402


# -- formats ---------------------------------------------------------------
def test_parquet_orc_roundtrip(spark, sf_dir, tmp_path):
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    for fmt, write, read in [
        ("parquet", formats.write_parquet, formats.read_parquet),
        ("orc", formats.write_orc, formats.read_orc),
    ]:
        p = str(tmp_path / fmt)
        write(src, p)
        back = read(spark, p)
        assert back.schema == src.schema, fmt
        assert back.count() == src.count(), fmt


def test_csv_json_roundtrip_with_schema(spark, sf_dir, tmp_path):
    src = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    p_csv, p_json = str(tmp_path / "csv"), str(tmp_path / "json")
    formats.write_csv(src, p_csv)
    formats.write_json(src, p_json)
    back_csv = formats.read_csv(spark, p_csv, src.schema)
    back_json = formats.read_json(spark, p_json, src.schema)
    assert back_csv.schema == src.schema
    assert back_json.schema == src.schema
    a = sorted(map(tuple, src.collect()))
    assert sorted(map(tuple, back_csv.collect())) == a
    assert sorted(map(tuple, back_json.collect())) == a


def test_csv_rejects_nested(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    with pytest.raises(ValueError, match="nested"):
        formats.write_csv(emb, str(tmp_path / "bad"))


# -- datagen ---------------------------------------------------------------
def test_datagen_fixed_dims(spark):
    assert datagen.gen_region(spark).count() == 5
    nation = datagen.gen_nation(spark)
    assert nation.count() == 25
    # referential integrity: every nation's region exists
    joined = nation.join(
        datagen.gen_region(spark), F.col("n_regionkey") == F.col("r_regionkey")
    )
    assert joined.count() == 25


def test_datagen_row_counts_scale(spark):
    sf = 0.001
    assert datagen.gen_customer(spark, sf).count() == 150
    assert datagen.gen_orders(spark, sf).count() == 1500
    li = datagen.gen_lineitem(spark, sf).count()
    assert 1500 <= li <= 1500 * 7  # 1..7 lines per order


def test_datagen_partition_independence(spark):
    """Rows are pure functions of the key: any partitioning, same table."""
    a = sorted(map(tuple, datagen.gen_customer(spark, 0.001, partitions=2).collect()))
    b = sorted(map(tuple, datagen.gen_customer(spark, 0.001, partitions=7).collect()))
    assert a == b


def test_datagen_referential_integrity(spark):
    sf = 0.001
    orders = datagen.gen_orders(spark, sf)
    customer = datagen.gen_customer(spark, sf)
    dangling = orders.join(
        customer, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
    )
    assert dangling.count() == 0


def test_datagen_queryable(spark):
    """Generated tables answer a TPC-H-shaped query (the connector's bar)."""
    li = datagen.gen_lineitem(spark, 0.001)
    out = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
    )
    rows = out.collect()
    assert len(rows) == 6  # 3 returnflags x 2 linestatuses
    assert all(r["n"] > 0 for r in rows)


def test_datagen_part_supplier_partsupp_counts(spark):
    sf = 0.001
    assert datagen.gen_supplier(spark, sf).count() == 10
    assert datagen.gen_part(spark, sf).count() == 200
    # 4 suppliers per part, spec ratio
    assert datagen.gen_partsupp(spark, sf).count() == 800


def test_datagen_partsupp_integrity(spark):
    """Every partsupp row references a live part and supplier; a part's four
    suppliers are distinct (the spec's spread function guarantees it)."""
    sf = 0.001
    ps = datagen.gen_partsupp(spark, sf)
    part = datagen.gen_part(spark, sf)
    supp = datagen.gen_supplier(spark, sf)
    assert ps.join(part, F.col("ps_partkey") == F.col("p_partkey"), "left_anti").count() == 0
    assert ps.join(supp, F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti").count() == 0
    dup = (
        ps.groupBy("ps_partkey", "ps_suppkey")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dup.count() == 0


def test_datagen_lineitem_supplier_integrity(spark):
    sf = 0.001
    li = datagen.gen_lineitem(spark, sf)
    supp = datagen.gen_supplier(spark, sf)
    assert li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti").count() == 0


def test_datagen_q2_shape_over_partsupp(spark):
    """The full 8-table corpus answers TPC-H q2's true partsupp form."""
    sf = 0.001
    part = datagen.gen_part(spark, sf)
    supp = datagen.gen_supplier(spark, sf)
    ps = datagen.gen_partsupp(spark, sf)
    nation = datagen.gen_nation(spark)
    region = datagen.gen_region(spark)
    out = (
        ps.join(part.filter(F.col("p_size") <= 25), F.col("ps_partkey") == F.col("p_partkey"))
        .join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region.filter(F.col("r_name") == "EUROPE"), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("p_partkey")
        .agg(F.min("ps_supplycost").alias("min_cost"))
    )
    assert out.count() > 0


def test_bench_headline_covers_registry():
    """Every registry entry is benchmarked and nothing phantom is listed —
    guards against a new operator silently missing from the perf lane."""
    import sys as _s

    _s.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import bench
    from kyuubi_spark.queries import all_queries

    reg, head = set(all_queries()), set(bench.HEADLINE)
    assert reg - head == set(), f"registry entries missing from bench: {reg - head}"
    assert head - reg == set(), f"bench lists unknown queries: {head - reg}"
