"""Deterministic on-the-fly TPC-H-style data generation.

Capability parity with the reference's TPCH DSv2 connector
(extensions/spark/kyuubi-spark-connector-tpch/.../TPCHBatchScan.scala:39-91:
the table is split into InputPartition chunks, each chunk runs an
independent row generator for its key range; stats reported per scale).
Spark-first equivalent: `spark.range(n)` already *is* the partitioned key
space — mapInPandas turns each Arrow batch of keys into rows, so generation
is embarrassingly parallel, allocation-free on the driver, and identical
for any partition count (rows are pure functions of the key).

Row-count model (classic TPC-H ratios): customer=SF*150k, orders=SF*1.5M
(10/customer), lineitem≈4 lines/order, supplier=SF*10k, part=SF*200k.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [  # (name, regionkey) — 25 nations, 5 per region
    ("ALGERIA", 0), ("ETHIOPIA", 0), ("KENYA", 0), ("MOROCCO", 0), ("MOZAMBIQUE", 0),
    ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1), ("PERU", 1), ("UNITED STATES", 1),
    ("CHINA", 2), ("INDIA", 2), ("INDONESIA", 2), ("JAPAN", 2), ("VIETNAM", 2),
    ("FRANCE", 3), ("GERMANY", 3), ("ROMANIA", 3), ("RUSSIA", 3), ("UNITED KINGDOM", 3),
    ("EGYPT", 4), ("IRAN", 4), ("IRAQ", 4), ("JORDAN", 4), ("SAUDI ARABIA", 4),
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _keyed(spark: SparkSession, n: int, partitions: int | None) -> DataFrame:
    df = spark.range(n)
    return df.repartition(partitions) if partitions else df


def gen_region(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, name) for i, name in enumerate(REGIONS)], "r_regionkey int, r_name string"
    )


def gen_nation(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(i, name, rk) for i, (name, rk) in enumerate(NATIONS)],
        "n_nationkey int, n_name string, n_regionkey int",
    )


def customer_columns(keys: "np.ndarray") -> dict:
    """key array -> customer column arrays — the ONE place the customer
    row formulas live. Shared by gen_customer (mapInPandas) and the
    Python DataSource connector (sources/pyds.py), and mirrored by the
    DuckDB oracle of pyds_tpch_scan; change it in lockstep or the
    cross-path parity tests fail."""
    return {
        "c_custkey": keys + 1,
        "c_name": [f"Customer#{k + 1:09d}" for k in keys],
        "c_nationkey": (keys * 2654435761 % 25).astype("int32"),
        "c_acctbal": np.round((keys * 977 % 1_099_999) / 100.0 - 999.99, 2),
        "c_mktsegment": [SEGMENTS[int(k) % 5] for k in keys],
    }


def gen_customer(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    n = max(1, int(sf * 150_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(customer_columns(pdf["id"].to_numpy()))

    return _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )


def gen_orders(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    n = max(1, int(sf * 1_500_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf["id"].to_numpy()
            days = (keys * 6364136223846793005 % 2406).astype("int64")  # 1992-01-01..1998-08-02
            yield pd.DataFrame(
                {
                    "o_orderkey": keys + 1,
                    "o_custkey": keys * 48271 % max(1, int(sf * 150_000)) + 1,
                    "o_orderstatus": [("O", "F", "P")[int(k) % 3] for k in keys],
                    "o_totalprice": np.round((keys * 31 % 45_000_000) / 100.0 + 857.71, 2),
                    "o_orderdate": pd.to_datetime("1992-01-01")
                    + pd.to_timedelta(days, unit="D"),
                    "o_orderpriority": [PRIORITIES[int(k) % 5] for k in keys],
                }
            )

    return _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )


def gen_lineitem(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    n_orders = max(1, int(sf * 1_500_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            okeys = pdf["id"].to_numpy() + 1
            # 1..7 lines per order, deterministic per order key
            nlines = (okeys * 2654435761 % 7 + 1).astype("int64")
            okey = np.repeat(okeys, nlines)
            line = np.concatenate([np.arange(1, k + 1) for k in nlines])
            h = okey * 1_000_003 + line
            ship_days = h * 6364136223846793005 % 2557  # 1992..1999
            yield pd.DataFrame(
                {
                    "l_orderkey": okey,
                    "l_linenumber": line.astype("int32"),
                    "l_partkey": h * 48271 % max(1, int(sf * 200_000)) + 1,
                    "l_suppkey": h * 69621 % max(1, int(sf * 10_000)) + 1,
                    "l_quantity": (h % 50 + 1).astype("float64"),
                    "l_extendedprice": np.round((h % 10_000_000) / 100.0 + 900.0, 2),
                    "l_discount": np.round((h % 11) / 100.0, 2),
                    "l_tax": np.round((h % 9) / 100.0, 2),
                    "l_returnflag": [("A", "N", "R")[int(x) % 3] for x in h],
                    "l_linestatus": [("O", "F")[int(x) % 2] for x in h],
                    "l_shipdate": pd.to_datetime("1992-01-01")
                    + pd.to_timedelta(ship_days, unit="D"),
                }
            )

    return _keyed(spark, n_orders, partitions).mapInPandas(
        gen,
        schema="l_orderkey long, l_linenumber int, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp_ntz",
    )


_MFGRS = [f"Manufacturer#{i}" for i in range(1, 6)]
_BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
_TYPES = [
    f"{a} {b} {c}"
    for a in ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
    for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
    for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")
]
_CONTAINERS = [
    f"{a} {b}"
    for a in ("SM", "LG", "MED", "JUMBO", "WRAP")
    for b in ("CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM")
]


def gen_supplier(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    """Supplier table (TPCHSchemaUtils.scala:49-58 column set)."""
    n = max(1, int(sf * 10_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf["id"].to_numpy()
            nk = (keys * 2654435761 % 25).astype("int32")
            yield pd.DataFrame(
                {
                    "s_suppkey": keys + 1,
                    "s_name": [f"Supplier#{k + 1:09d}" for k in keys],
                    "s_address": [f"addr{k * 48271 % 100000:05d}" for k in keys],
                    "s_nationkey": nk,
                    "s_phone": [
                        f"{10 + int(v)}-{k * 31 % 900 + 100}-{k * 7 % 900 + 100}-"
                        f"{k * 13 % 9000 + 1000}"
                        for k, v in zip(keys, nk)
                    ],
                    "s_acctbal": np.round((keys * 997 % 1_099_999) / 100.0 - 999.99, 2),
                }
            )

    return _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="s_suppkey long, s_name string, s_address string, s_nationkey int, "
        "s_phone string, s_acctbal double",
    )


def gen_part(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    """Part table: mfgr/brand/type/size/container per the TPC-H value sets."""
    n = max(1, int(sf * 200_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf["id"].to_numpy()
            mfgr_idx = keys % 5
            yield pd.DataFrame(
                {
                    "p_partkey": keys + 1,
                    "p_name": [f"part {k * 69621 % 100000:05d}" for k in keys],
                    "p_mfgr": [_MFGRS[int(i)] for i in mfgr_idx],
                    # brand is a refinement of mfgr, as in the spec
                    "p_brand": [
                        _BRANDS[int(i) * 5 + int(k * 48271 % 5)]
                        for i, k in zip(mfgr_idx, keys)
                    ],
                    "p_type": [_TYPES[int(k * 2654435761 % 150)] for k in keys],
                    "p_size": (keys * 31 % 50 + 1).astype("int32"),
                    "p_container": [_CONTAINERS[int(k * 977 % 40)] for k in keys],
                    "p_retailprice": np.round(
                        900.0 + (keys % 200_000) / 10.0 + (keys % 1000) / 100.0, 2
                    ),
                }
            )

    return _keyed(spark, n, partitions).mapInPandas(
        gen,
        schema="p_partkey long, p_name string, p_mfgr string, p_brand string, "
        "p_type string, p_size int, p_container string, p_retailprice double",
    )


def gen_partsupp(spark: SparkSession, sf: float, partitions: int | None = None) -> DataFrame:
    """Partsupp: 4 suppliers per part (spec ratio), deterministic spread so a
    part's suppliers land in distinct supplier keys."""
    n_parts = max(1, int(sf * 200_000))
    n_supp = max(1, int(sf * 10_000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pkeys = np.repeat(pdf["id"].to_numpy() + 1, 4)
            i = np.tile(np.arange(4), len(pdf))
            # spec-style spread; the i-stride S//4 makes a part's four
            # suppliers distinct mod S for any S >= 4 (the per-part terms
            # are constant shifts), unlike the spec's S/4 + (pk-1)/S stride
            # which collides at tiny scale factors.
            s = n_supp
            sk = (pkeys + (pkeys - 1) // s + i * max(1, s // 4)) % s + 1
            h = pkeys * 4 + i
            yield pd.DataFrame(
                {
                    "ps_partkey": pkeys,
                    "ps_suppkey": sk,
                    "ps_availqty": (h * 48271 % 9999 + 1).astype("int32"),
                    "ps_supplycost": np.round((h * 31 % 99_900) / 100.0 + 1.0, 2),
                }
            )

    return _keyed(spark, n_parts, partitions).mapInPandas(
        gen,
        schema="ps_partkey long, ps_suppkey long, ps_availqty int, "
        "ps_supplycost double",
    )


GENERATORS = {
    "region": lambda spark, sf, partitions=None: gen_region(spark),
    "nation": lambda spark, sf, partitions=None: gen_nation(spark),
    "customer": gen_customer,
    "orders": gen_orders,
    "lineitem": gen_lineitem,
    "supplier": gen_supplier,
    "part": gen_part,
    "partsupp": gen_partsupp,
}


def generate(
    spark: SparkSession, table: str, sf: float = 0.01, partitions: int | None = None
) -> DataFrame:
    return GENERATORS[table](spark, sf, partitions=partitions)
