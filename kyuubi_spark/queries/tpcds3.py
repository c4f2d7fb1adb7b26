"""TPC-DS slice, batch 3 — q64 and the a/b second shapes (q14b/q23b/q39b).

Reference corpus: extensions/spark/kyuubi-spark-connector-tpcds/src/main/
resources/kyuubi/tpcds_3.2/q*.sql (the reference ships BOTH variants of
q14/q23/q39 and verifies each via OutputSchemaTPCDSSuite).  Same star
mapping as queries/tpcds.py / tpcds2.py: fact = lineitem, item -> part,
store -> supplier, date dim from l_shipdate / o_orderdate, demographics ->
customer, returns = l_returnflag = 'R' rows paired back to sales on
(orderkey, partkey).  House rules: money in integer cents, one rounded
double division per surfaced ratio, every surfaced integer aggregate CAST
to BIGINT in the oracle (the HUGEINT lint in tools/verify.py enforces it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.queries.tpcds import _in_years, _rev
from kyuubi_spark.queries.tpcds2 import (
    _NET_CENTS_SQL,
    _Q39_STAT_SQL,
    _cents,
    _net_cents,
    _t,
)


# --------------------------------------------------------------------------
# q64 — twice-sold item mega-join (tpcds_3.2/q64.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q64",
    oracle="""
    WITH cs_ui AS (
      SELECT s.l_partkey AS item,
             CAST(SUM(CAST(ROUND(s.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sale,
             CAST(SUM(CAST(ROUND(r.l_extendedprice
                                 * (r.l_discount + r.l_tax) * 100)
                           AS BIGINT)) AS BIGINT) AS refund
      FROM lineitem s JOIN lineitem r
        ON s.l_orderkey = r.l_orderkey AND s.l_partkey = r.l_partkey
      WHERE s.l_linestatus = 'O' AND r.l_returnflag = 'R'
      GROUP BY 1
      HAVING SUM(CAST(ROUND(s.l_extendedprice * 100) AS BIGINT))
           > 8 * SUM(CAST(ROUND(r.l_extendedprice
                                * (r.l_discount + r.l_tax) * 100)
                          AS BIGINT))),
    cross_sales AS (
      SELECT p.p_name AS product_name, l.l_partkey AS item_sk,
             su.s_name AS store_name, n1.n_name AS store_nation,
             year(l.l_shipdate) AS syear,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS s1,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS s2,
             CAST(SUM(CAST(ROUND(l.l_discount * 10000) AS BIGINT))
                  AS BIGINT) AS s3
      FROM lineitem l
      JOIN lineitem r ON l.l_orderkey = r.l_orderkey
                     AND l.l_partkey = r.l_partkey
                     AND r.l_returnflag = 'R'
      JOIN supplier su ON l.l_suppkey = su.s_suppkey
      JOIN nation n1 ON su.s_nationkey = n1.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_linestatus = 'F'
        AND c.c_nationkey <> su.s_nationkey
        AND l.l_partkey IN (SELECT item FROM cs_ui)
      GROUP BY 1, 2, 3, 4, 5)
    SELECT cs1.product_name AS product_name, cs1.store_name AS store_name,
           cs1.store_nation AS store_nation,
           cs1.cnt AS cnt1, cs1.s1 AS s11, cs1.s2 AS s21, cs1.s3 AS s31,
           cs2.cnt AS cnt2, cs2.s1 AS s12, cs2.s2 AS s22, cs2.s3 AS s32
    FROM cross_sales cs1 JOIN cross_sales cs2
      ON cs1.item_sk = cs2.item_sk AND cs1.store_name = cs2.store_name
    WHERE cs1.syear = 1996 AND cs2.syear = 1997 AND cs2.cnt <= cs1.cnt
    ORDER BY product_name, store_name, cnt2, s11, s12
    """,
    doc="TPC-DS q64 shape (tpcds_3.2/q64.sql: cs_ui = catalog items whose "
    "sale dwarfs their refunds, cross_sales = store sales WITH a matching "
    "store return over a wide dimension graph, then year-1 x year-2 "
    "self-join on (item, store) keeping pairs whose repeat count fell): "
    "cs_ui maps to the 'O' channel paired to its returns on (order, "
    "part) with an integer cross-multiplied HAVING (sale > 8*refund, "
    "refund = discount+tax portion standing in for refunded cash); "
    "cross_sales is the 'F' channel paired to returns the same way, "
    "joined through supplier->nation (store + zip), orders->customer "
    "(buyer), part (item), with the cross-demographic inequality mapped "
    "to buyer-nation <> store-nation; final 1996 x 1997 self-join on "
    "(item, store) with cnt2 <= cnt1. Spark computes cross_sales ONCE "
    "and joins two filtered year slices (no CTE re-instantiation), "
    "broadcasts every dimension, and reduces the returns pairing to a "
    "(orderkey, partkey) equi-join — no cartesian anywhere.",
)
def tpcds_q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, supplier, nation, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier",
        "nation", "part",
    )
    returns = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_partkey").alias("r_partkey"),
        F.round(
            F.col("l_extendedprice")
            * (F.col("l_discount") + F.col("l_tax"))
            * 100
        ).cast("long").alias("refund_cents"),
    )
    pair = (F.col("l_orderkey") == F.col("r_orderkey")) & (
        F.col("l_partkey") == F.col("r_partkey")
    )
    cs_ui = (
        lineitem.filter(F.col("l_linestatus") == "O")
        .join(returns, pair)
        .groupBy(F.col("l_partkey").alias("item"))
        .agg(
            F.sum(_cents()).alias("sale"),
            F.sum("refund_cents").alias("refund"),
        )
        .filter(F.col("sale") > 8 * F.col("refund"))
        .select("item")
    )
    cross_sales = (
        lineitem.filter(F.col("l_linestatus") == "F")
        .join(returns.select("r_orderkey", "r_partkey"), pair)
        .join(F.broadcast(cs_ui), F.col("l_partkey") == F.col("item"), "left_semi")
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_name").alias("product_name"),
            F.col("l_partkey").alias("item_sk"),
            F.col("s_name").alias("store_name"),
            F.col("n_name").alias("store_nation"),
            F.year("l_shipdate").alias("syear"),
        )
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("l_quantity").cast("long")).alias("s1"),
            F.sum(_cents()).alias("s2"),
            F.sum(F.round(F.col("l_discount") * 10000).cast("long")).alias("s3"),
        )
    )
    cs1 = cross_sales.filter(F.col("syear") == 1996).select(
        "product_name", "item_sk", "store_name", "store_nation",
        F.col("cnt").alias("cnt1"),
        F.col("s1").alias("s11"),
        F.col("s2").alias("s21"),
        F.col("s3").alias("s31"),
    )
    cs2 = cross_sales.filter(F.col("syear") == 1997).select(
        F.col("item_sk").alias("item_sk2"),
        F.col("store_name").alias("store_name2"),
        F.col("cnt").alias("cnt2"),
        F.col("s1").alias("s12"),
        F.col("s2").alias("s22"),
        F.col("s3").alias("s32"),
    )
    return (
        cs1.join(
            cs2,
            (F.col("item_sk") == F.col("item_sk2"))
            & (F.col("store_name") == F.col("store_name2")),
        )
        .filter(F.col("cnt2") <= F.col("cnt1"))
        .select(
            "product_name", "store_name", "store_nation",
            "cnt1", "s11", "s21", "s31", "cnt2", "s12", "s22", "s32",
        )
        .orderBy("product_name", "store_name", "cnt2", "s11", "s12")
    )


# --------------------------------------------------------------------------
# q14b — this-year vs last-year cross-channel item slice (tpcds_3.2/q14b.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q14b",
    oracle="""
    WITH cross_items AS (
      SELECT l_partkey AS item FROM lineitem WHERE l_returnflag = 'N'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    ),
    avg_sales AS (
      SELECT ROUND(AVG(l_extendedprice * (1 - l_discount)), 4)
               AS average_sales
      FROM lineitem
    ),
    per_year AS (
      SELECT year(l.l_shipdate) AS dyear, p.p_brand AS p_brand,
             p.p_type AS p_type,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS sales,
             COUNT(*) AS number_sales
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey, avg_sales
      WHERE l.l_partkey IN (SELECT item FROM cross_items)
        AND year(l.l_shipdate) IN (1996, 1997)
      GROUP BY 1, 2, 3, average_sales
      HAVING ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
             > average_sales)
    SELECT ty.p_brand AS ty_brand, ty.p_type AS ty_type,
           ty.sales AS ty_sales, ty.number_sales AS ty_number_sales,
           ly.sales AS ly_sales, ly.number_sales AS ly_number_sales
    FROM per_year ty JOIN per_year ly
      ON ty.p_brand = ly.p_brand AND ty.p_type = ly.p_type
    WHERE ty.dyear = 1997 AND ly.dyear = 1996
    ORDER BY ty_brand, ty_type
    """,
    doc="TPC-DS q14b shape (tpcds_3.2/q14b.sql: the q14a cross_items + "
    "avg_sales CTEs, but instead of a rollup the same week-slice "
    "aggregate is instantiated for this year and last year and joined "
    "on the item hierarchy): (brand, type) sales over the 3-channel "
    "intersect item set for 1997 vs 1996, each side kept above the "
    "all-history average (the decorrelated scalar subquery), joined on "
    "(brand, type). Spark aggregates BOTH years in one pass (dyear in "
    "the grouping key), applies the broadcast scalar threshold once, "
    "then joins the two filtered year slices — one fact scan instead of "
    "the spec's two CTE instantiations.",
)
def tpcds_q14b(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    cross_items = (
        lineitem.filter(F.col("l_returnflag").isin("N", "R", "A"))
        .groupBy(F.col("l_partkey").alias("item"))
        .agg(
            *[
                F.max(F.when(F.col("l_returnflag") == f, F.lit(1))).alias(f"in_{f}")
                for f in ("N", "R", "A")
            ]
        )
        .filter(
            F.col("in_N").isNotNull()
            & F.col("in_R").isNotNull()
            & F.col("in_A").isNotNull()
        )
        .select("item")
    )
    avg_sales = lineitem.agg(dround(F.avg(_rev()), 4).alias("average_sales"))
    per_year = (
        lineitem.filter(_in_years("l_shipdate", 1996, 1997))
        .join(F.broadcast(cross_items), F.col("l_partkey") == F.col("item"),
              "left_semi")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.year("l_shipdate").alias("dyear"),
            "p_brand",
            "p_type",
        )
        .agg(
            dround(F.sum(_rev()), 2).alias("sales"),
            F.count("*").alias("number_sales"),
        )
        .join(F.broadcast(avg_sales))
        .filter(F.col("sales") > F.col("average_sales"))
    )
    ty = per_year.filter(F.col("dyear") == 1997).select(
        F.col("p_brand").alias("ty_brand"),
        F.col("p_type").alias("ty_type"),
        F.col("sales").alias("ty_sales"),
        F.col("number_sales").alias("ty_number_sales"),
    )
    ly = per_year.filter(F.col("dyear") == 1996).select(
        F.col("p_brand").alias("ly_brand"),
        F.col("p_type").alias("ly_type"),
        F.col("sales").alias("ly_sales"),
        F.col("number_sales").alias("ly_number_sales"),
    )
    return (
        ty.join(
            ly,
            (F.col("ty_brand") == F.col("ly_brand"))
            & (F.col("ty_type") == F.col("ly_type")),
        )
        .select(
            "ty_brand", "ty_type", "ty_sales", "ty_number_sales",
            "ly_sales", "ly_number_sales",
        )
        .orderBy("ty_brand", "ty_type")
    )


# --------------------------------------------------------------------------
# q23b — frequent items ∩ best customers, per-customer spend (q23b.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q23b",
    oracle=f"""
    WITH frequent_items AS (
      SELECT l_partkey
      FROM lineitem WHERE year(l_shipdate) = 1996
      GROUP BY l_partkey HAVING COUNT(DISTINCT l_shipdate) > 6),
    spend AS (
      SELECT o.o_custkey, SUM({_NET_CENTS_SQL}) AS cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey),
    best_customers AS (
      SELECT o_custkey FROM (
        SELECT o_custkey,
               ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS r
        FROM spend) t
      WHERE r <= 100)
    SELECT c.c_name AS c_name,
           CAST(SUM({_NET_CENTS_SQL}) AS BIGINT) AS sales
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate < DATE '1997-07-01'
      AND l.l_partkey IN (SELECT l_partkey FROM frequent_items)
      AND o.o_custkey IN (SELECT o_custkey FROM best_customers)
    GROUP BY c.c_name
    ORDER BY c_name, sales LIMIT 100
    """,
    doc="TPC-DS q23b shape (tpcds_3.2/q23b.sql: same frequent_ss_items x "
    "best_ss_customer qualifiers as q23a, but the month slice is grouped "
    "per CUSTOMER NAME and top-100'd instead of summed per channel): "
    "1997-H1 spend of the top-100 lifetime spenders on >6-day items, "
    "per customer, first 100 by (name, sales). Spark: both qualifier "
    "sets broadcast into left-semi joins (fact scanned once), the "
    "best-customers cut is orderBy().limit() (TakeOrderedAndProject, "
    "never a global window), and the final top-100 is another "
    "TakeOrderedAndProject.",
)
def tpcds_q23b(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer = _t(spark, sf_dir, "lineitem", "orders",
                                    "customer")
    net = _net_cents()
    frequent = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .groupBy("l_partkey")
        .agg(F.countDistinct("l_shipdate").alias("nd"))
        .filter(F.col("nd") > 6)
        .select("l_partkey")
    )
    spend = (
        lineitem.join(orders.select("o_orderkey", "o_custkey"),
                      F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(net).alias("cents"))
    )
    best = (
        spend.orderBy(F.col("cents").desc(), F.col("o_custkey"))
        .limit(100)
        .select("o_custkey")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("date"))
        )
        .join(F.broadcast(frequent), "l_partkey", "left_semi")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(best), "o_custkey", "left_semi")
        .join(customer.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name")
        .agg(F.sum(net).alias("sales"))
        .orderBy("c_name", "sales")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q39b — inventory variance pairs, high-variance March slice (q39b.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q39b",
    oracle=f"""
    WITH stats AS ({_Q39_STAT_SQL}),
    cov AS (
      SELECT nation, brand, moy,
             ROUND(s1 * 1.0 / n, 4) AS mean,
             ROUND(sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1)))
                   / (s1 * 1.0 / n), 4) AS cov
      FROM stats WHERE s1 > 0)
    SELECT m1.nation AS nation, m1.brand AS brand,
           m1.mean AS mean_mar, m1.cov AS cov_mar,
           m2.mean AS mean_apr, m2.cov AS cov_apr
    FROM cov m1 JOIN cov m2
      ON m1.nation = m2.nation AND m1.brand = m2.brand
     AND m1.moy = 3 AND m2.moy = 4
    WHERE m1.cov >= 0.45 AND m2.cov >= 0.45 AND m1.cov >= 0.6
    ORDER BY nation, brand
    """,
    doc="TPC-DS q39b shape (tpcds_3.2/q39b.sql: identical inv CTE to "
    "q39a, but the March side must clear a HIGHER variance bar — "
    "inv1.cov > 1.5 — and both months' mean and cov are surfaced): the "
    "q39 per-(nation, brand, month) coefficient of variation from "
    "integer power sums, March-April self-join, with the b-variant's "
    "asymmetric stricter March threshold (0.6 vs 0.45 on this data) and "
    "mean+cov surfaced for both months. One fact aggregation reused for "
    "both sides of the self-join.",
)
def tpcds_q39b(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation, part = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "part"
    )
    qty = F.col("l_quantity").cast("long")
    stats = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-03-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-05-01").cast("date"))
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("p_brand").alias("brand"),
            F.month("l_shipdate").alias("moy"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(qty).alias("s1"),
            F.sum(qty * qty).alias("s2"),
        )
        .filter((F.col("n") > 1) & (F.col("s1") > 0))
        .select(
            "nation", "brand", "moy",
            dround(F.col("s1") / F.col("n"), 4).alias("mean"),
            dround(
                F.sqrt(
                    (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
                    / (F.col("n") * (F.col("n") - 1))
                )
                / (F.col("s1") / F.col("n")),
                4,
            ).alias("cov"),
        )
        .filter(F.col("cov") >= 0.45)
    )
    m1 = stats.filter((F.col("moy") == 3) & (F.col("cov") >= 0.6)).select(
        "nation", "brand",
        F.col("mean").alias("mean_mar"),
        F.col("cov").alias("cov_mar"),
    )
    m2 = stats.filter(F.col("moy") == 4).select(
        F.col("nation").alias("nation2"),
        F.col("brand").alias("brand2"),
        F.col("mean").alias("mean_apr"),
        F.col("cov").alias("cov_apr"),
    )
    return (
        m1.join(
            m2,
            (F.col("nation") == F.col("nation2"))
            & (F.col("brand") == F.col("brand2")),
        )
        .select("nation", "brand", "mean_mar", "cov_mar", "mean_apr", "cov_apr")
        .orderBy("nation", "brand")
    )
