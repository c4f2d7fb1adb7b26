"""TPC-H q1–q22 adapted to the driver's testdata subset (FIXTURES.md §4b).

The reference verifies its relational surface with the TPC-H golden corpus
(kyuubi TPCHQuerySuite.scala:45-71; query texts at
extensions/spark/kyuubi-spark-connector-tpch/src/main/resources/kyuubi/tpch/).
The driver's tables omit partsupp and several columns, so queries keep the
*operator shape* of the original (join graph, subquery pattern, agg set) but
swap missing columns for present ones. Each docstring names the original.

Implementation style: declarative DataFrame API so Catalyst plans everything
(predicate pushdown to the parquet scan, join reordering, AQE). The only
explicit physical hints are ``F.broadcast`` on the fixed-size dimensions
(region=5 rows, nation=25 rows at EVERY scale factor — safe at 100 TB).
Larger dimensions are left to AQE's size-based broadcast decision so the same
code is correct at sf0.001 and at 100 TB.

Determinism: every float aggregate is rounded identically on both sides;
every LIMIT is preceded by a total order (rounded measure + unique keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table
from kyuubi_spark.functions.compat import dround


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


def _revenue():
    """l_extendedprice * (1 - l_discount); built lazily — Column construction
    needs an active SparkContext, and this module must import without one."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# q1 — pricing summary report (original: kyuubi/tpch/q1.sql)
# --------------------------------------------------------------------------
@query(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
           ROUND(AVG(l_discount), 4)                                        AS avg_disc,
           COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Full-scan hash aggregate, 8 aggregates, partial+final combine.",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            dround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            dround(F.sum(_revenue()), 2).alias("sum_disc_price"),
            dround(F.sum(_revenue() * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            dround(F.avg("l_quantity"), 4).alias("avg_qty"),
            dround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            dround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q2 — minimum-cost supplier (original q2 uses partsupp; unit cost is derived
# from lineitem instead: min(extendedprice/quantity) per part)
# --------------------------------------------------------------------------
@query(
    "tpch_q2",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT s.s_name, n.n_name, p.p_partkey, p.p_type,
           ROUND(c.unit_cost, 4) AS min_cost
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
      AND c.unit_cost = (
        SELECT MIN(c2.unit_cost) FROM cost c2
        JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE c2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="Correlated scalar subquery (min per part) + 5-way join, top-k.",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, supplier, nation, region, lineitem = _t(
        spark, sf_dir, "part", "supplier", "nation", "region", "lineitem"
    )
    # The part predicate selects a tiny key set — push it below the heavy
    # lineitem aggregation as a broadcast SEMI join, so at 100 TB the
    # (partkey, suppkey) shuffle carries only eligible parts' rows.
    # (Filtering by partkey commutes with the per-part window-min.)
    p = part.filter((F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    li = lineitem.join(
        F.broadcast(p.select("p_partkey")),
        lineitem.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    # Decorrelated form of `unit_cost = (select min(..) where same part)`:
    # window-min per part over the EUROPE-filtered cost rows.
    eur_cost = (
        cost.join(supplier, cost.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
    )
    w = Window.partitionBy("l_partkey")
    best = eur_cost.withColumn("best_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("best_cost")
    )
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            dround("unit_cost", 4).alias("min_cost"),
            "s_acctbal",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
        .drop("s_acctbal")
    )


# --------------------------------------------------------------------------
# q3 — shipping priority (original q3.sql)
# --------------------------------------------------------------------------
@query(
    "tpch_q3",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(o.o_orderdate AS DATE) AS o_orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="3-way join + agg + top-k (TakeOrderedAndProject).",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < "1998-03-15")
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > "1998-03-15")
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dround(F.sum(_revenue()), 2).alias("revenue"))
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q4 — order priority checking (original uses commitdate<receiptdate; adapted
# to "shipped more than 60 days after order")
# --------------------------------------------------------------------------
@query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="EXISTS → left-semi join with non-equi condition.",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY")
    )
    return (
        o.join(lineitem, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q5 — local supplier volume (original q5.sql)
# --------------------------------------------------------------------------
@query(
    "tpch_q5",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    doc="6-way join incl. co-nation equi-pair, hash agg.",
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem, supplier, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
        )
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dround(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --------------------------------------------------------------------------
# q6 — forecasting revenue change (original q6.sql)
# --------------------------------------------------------------------------
@query(
    "tpch_q6",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="Pushed-down conjunctive range scan + scalar agg.",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return lineitem.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(dround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))


# --------------------------------------------------------------------------
# q7 — volume shipping between two nations (original q7.sql)
# --------------------------------------------------------------------------
@query(
    "tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l.l_shipdate) AS INT)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="Nation-pair disjunction, dual dimension join, year extraction.",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier, lineitem, orders, customer, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        supplier.join(lineitem, F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("l_shipdate").between("1996-01-01", "1997-12-31"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dround(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# q8 — national market share (original q8.sql)
# --------------------------------------------------------------------------
@query(
    "tpch_q8",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                              AND TIMESTAMP '1997-12-31 00:00:00'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="8-way join, conditional agg ratio (market share).",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, lineitem, supplier, orders, customer, nation, region = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer", "nation", "region"
    )
    n1 = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey"))
    n2 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    base = (
        part.filter(F.col("p_type") == "ECONOMY")
        .join(lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("o_orderdate").between("1996-01-01", "1997-12-31"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "AMERICA")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _revenue().alias("volume"),
            "nation",
        )
    )
    return (
        base.groupBy("o_year")
        .agg(
            dround(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# q9 — product-type profit (original uses ps_supplycost; substituted with
# 0.6 * p_retailprice as the unit cost)
# --------------------------------------------------------------------------
@query(
    "tpch_q9",
    oracle="""
    SELECT nation, o_year,
           ROUND(CAST(SUM(amount) AS DOUBLE), 2) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  - 0.6 * p.p_retailprice * l.l_quantity
                  AS DECIMAL(25,6)) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_type = 'PROMO'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="Star join + derived measure, group by (nation, year). The per-row "
    "amount is one deterministic double expression cast to DECIMAL(25,6) "
    "BEFORE summation, so the group sum is exact and association-"
    "independent — a raw double SUM flips the final half-cent between "
    "engines once groups get large enough (first seen at sf0.1).",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, lineitem, supplier, orders, nation = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation"
    )
    amount = (
        _revenue() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(25,6)")
    return (
        part.filter(F.col("p_type") == "PROMO")
        .join(lineitem, F.col("p_partkey") == F.col("l_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dround(F.sum("amount").cast("double"), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# q10 — returned-item reporting (original q10.sql)
# --------------------------------------------------------------------------
@query(
    "tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="Join + wide group-by + top-k by measure.",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
        )
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_returnflag") == "R")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dround(F.sum(_revenue()), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q11 — important stock identification (original uses partsupp value; adapted
# to lineitem revenue per part from suppliers of one nation)
# --------------------------------------------------------------------------
@query(
    "tpch_q11",
    oracle="""
    WITH part_value AS (
      SELECT l.l_partkey AS p_key,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS value
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
      GROUP BY l.l_partkey
    )
    SELECT p_key AS l_partkey, ROUND(value, 2) AS value
    FROM part_value
    WHERE value > (SELECT SUM(value) * 0.002 FROM part_value)
    ORDER BY value DESC, l_partkey
    """,
    doc="Group-agg + uncorrelated scalar subquery threshold (HAVING > frac of total).",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    pv = (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_5")
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).alias("value"))
        # the per-part aggregate feeds BOTH the threshold scalar and the
        # join side; lazy localCheckpoint materializes it once instead of
        # re-running the fact scan + join + agg per consumer
        .localCheckpoint(eager=False)
    )
    # Uncorrelated scalar subquery → cross-join a 1-row broadcast aggregate.
    total = pv.agg((F.sum("value") * 0.002).alias("threshold"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", dround("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


# --------------------------------------------------------------------------
# q12 — shipping-delay classification (original groups by l_shipmode, which
# the subset lacks; grouped by l_returnflag, "late" = shipped >45d after order)
# --------------------------------------------------------------------------
@query(
    "tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    doc="Join with non-equi lateness predicate + conditional counts.",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 45 DAY"))
            & (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# q13 — customer order-count distribution (original q13.sql; the comment-LIKE
# exclusion is replaced by an order-priority exclusion)
# --------------------------------------------------------------------------
@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="Left-outer join preserved through double aggregation.",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    o = orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# q14 — promotion effect (original LIKE 'PROMO%' → p_type = 'PROMO')
# --------------------------------------------------------------------------
@query(
    "tpch_q14",
    oracle="""
    SELECT ROUND(100.00 * SUM(CASE WHEN p.p_type = 'PROMO'
                                   THEN l.l_extendedprice * (1 - l.l_discount)
                                   ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    doc="Conditional-aggregate ratio over a month slice.",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(0.0)
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(dround(100.0 * F.sum(promo) / F.sum(_revenue()), 4).alias("promo_revenue"))
    )


# --------------------------------------------------------------------------
# q15 — top supplier (original q15.sql, view → CTE)
# --------------------------------------------------------------------------
@query(
    "tpch_q15",
    oracle="""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, ROUND(r.total_revenue, 2) AS total_revenue
    FROM supplier s JOIN revenue0 r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s.s_suppkey
    """,
    doc="Agg view + uncorrelated MAX scalar subquery.",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("total_revenue"))
        .localCheckpoint(eager=False)  # shared by the max scalar + join side
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", dround("total_revenue", 2).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# q16 — parts/supplier relationship (original counts partsupp suppliers;
# adapted to distinct lineitem suppliers, excluding negative-balance suppliers)
# --------------------------------------------------------------------------
@query(
    "tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="NOT IN → left-anti join, COUNT(DISTINCT), multi-col group.",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier = _t(spark, sf_dir, "lineitem", "part", "supplier")
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    p = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))
    )
    return (
        lineitem.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# q17 — small-quantity-order revenue (original q17.sql; container → type)
# --------------------------------------------------------------------------
@query(
    "tpch_q17",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
    doc="Correlated scalar AVG subquery (decorrelated to window/agg-join).",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    p = part.filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
    avg_q = lineitem.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        lineitem.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_q, F.col("ap_key") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(dround(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# q18 — large-volume customers (original q18.sql)
# --------------------------------------------------------------------------
@query(
    "tpch_q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           o.o_totalprice,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 270)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="IN-subquery with HAVING → semi-join on aggregated keys.",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 270)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("big_okey"), "left_semi")
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dround(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q19 — discounted revenue, disjunctive predicates (original q19.sql)
# --------------------------------------------------------------------------
@query(
    "tpch_q19",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    doc="Disjunction-of-conjunctions join predicate (CNF pushdown test).",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    b = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        lineitem.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(b)
        .agg(dround(F.sum(_revenue()), 2).alias("revenue"))
    )


# --------------------------------------------------------------------------
# q20 — potential part promotion (original via partsupp; adapted: suppliers in
# one nation whose shipped PROMO volume in 1997 exceeds a threshold)
# --------------------------------------------------------------------------
@query(
    "tpch_q20",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name IN ('NATION_7', 'NATION_8')
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING SUM(l.l_quantity) > 50)
    ORDER BY s.s_name, n.n_name
    """,
    doc="Nested IN-subquery over aggregated join → semi-join.",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier, nation, lineitem, part = _t(
        spark, sf_dir, "supplier", "nation", "lineitem", "part"
    )
    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    heavy = (
        lineitem.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(promo, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_7", "NATION_8"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name", "n_name")
    )


# --------------------------------------------------------------------------
# q21 — suppliers who kept orders waiting (original q21.sql; "late" =
# shipped >45 days after order date)
# --------------------------------------------------------------------------
@query(
    "tpch_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_4'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    doc="EXISTS + NOT EXISTS with inequality correlation (semi + anti join).",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier, lineitem, orders, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "nation"
    )
    l1 = lineitem.alias("l1")
    l2 = lineitem.select(
        F.col("l_orderkey").alias("l2_okey"), F.col("l_suppkey").alias("l2_skey")
    )
    base = (
        supplier.join(l1, F.col("s_suppkey") == F.col("l1.l_suppkey"))
        .join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l1.l_orderkey"),
        )
        .filter(F.col("l1.l_shipdate") > F.expr("o_orderdate + INTERVAL 45 DAY"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_4")
    )
    exists_other = base.join(
        l2,
        (F.col("l2_okey") == F.col("l1.l_orderkey"))
        & (F.col("l2_skey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    # NOT EXISTS other-supplier-also-late: anti join against late lineitems.
    l3 = lineitem.select(
        F.col("l_orderkey").alias("l3_okey"),
        F.col("l_suppkey").alias("l3_skey"),
        F.col("l_shipdate").alias("l3_ship"),
    )
    result = exists_other.join(
        l3,
        (F.col("l3_okey") == F.col("l1.l_orderkey"))
        & (F.col("l3_skey") != F.col("l1.l_suppkey"))
        & (F.col("l3_ship") > F.expr("o_orderdate + INTERVAL 45 DAY")),
        "left_anti",
    )
    return (
        result.groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q22 — global sales opportunity (original uses phone country codes; adapted
# to c_nationkey % 5 buckets)
# --------------------------------------------------------------------------
@query(
    "tpch_q22",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust, ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM (
      SELECT CAST(c.c_nationkey % 5 AS INT) AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE c.c_nationkey % 5 IN (0, 1, 2)
        AND c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey % 5 IN (0, 1, 2))
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    doc="Anti join (no orders) + uncorrelated AVG subquery + bucketed group.",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    code = (F.col("c_nationkey") % 5).cast("int")
    cust = customer.withColumn("cntrycode", code).filter(
        F.col("cntrycode").isin(0, 1, 2)
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            dround(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
