"""TPC-DS representative slice, batch 2 — 14 more plan shapes over the
driver testdata schema (continues queries/tpcds.py; same mapping: fact =
lineitem, item -> part, store -> supplier, date dim from l_shipdate /
o_orderdate, demographics -> customer, state/county -> region/nation).

Reference corpus: extensions/spark/kyuubi-spark-connector-tpcds/src/main/
resources/kyuubi/tpcds_3.2/q*.sql (verified by OutputSchemaTPCDSSuite).
Each port preserves the original query's JOIN GRAPH / CTE STACK / WINDOW
usage and cites its source file; the Spark side is free to re-express the
plan Spark-first (single-pass conditional pivots instead of CTE
re-instantiation) when the semantics are identical.

Cross-engine determinism (house rules from tpcds.py):
- money runs in integer cents (CAST(ROUND(x*100) AS BIGINT)); quantities
  as longs; discount in basis points — sums never hit float association;
- every ratio/average is ONE double division of exact integer sums,
  rounded identically (dround <-> ROUND);
- ranks order by already-exact keys plus a unique tiebreak;
- growth comparisons are integer cross-multiplications, never float
  division thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.queries.tpcds import _date_range, _in_month, _in_years
from kyuubi_spark.session import load_table


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


def _cents(col: str = "l_extendedprice"):
    return F.round(F.col(col) * 100).cast("long")


_NET_CENTS_SQL = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _net_cents():
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")


# --------------------------------------------------------------------------
# q4 — year-over-year growth comparison across channels (tpcds_3.2/q4.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q4",
    oracle=f"""
    WITH year_total AS (
      SELECT o.o_custkey AS customer_id, year(l.l_shipdate) AS dyear,
             l.l_linestatus AS channel,
             SUM({_NET_CENTS_SQL}) AS year_total
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE year(l.l_shipdate) IN (1996, 1997)
      GROUP BY 1, 2, 3)
    SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
           c.c_mktsegment AS segment
    FROM year_total t_s_firstyear
    JOIN year_total t_s_secyear
      ON t_s_secyear.customer_id = t_s_firstyear.customer_id
    JOIN year_total t_c_firstyear
      ON t_c_firstyear.customer_id = t_s_firstyear.customer_id
    JOIN year_total t_c_secyear
      ON t_c_secyear.customer_id = t_s_firstyear.customer_id
    JOIN customer c ON c.c_custkey = t_s_firstyear.customer_id
    WHERE t_s_firstyear.channel = 'F' AND t_s_firstyear.dyear = 1996
      AND t_s_secyear.channel = 'F' AND t_s_secyear.dyear = 1997
      AND t_c_firstyear.channel = 'O' AND t_c_firstyear.dyear = 1996
      AND t_c_secyear.channel = 'O' AND t_c_secyear.dyear = 1997
      AND t_s_firstyear.year_total > 0 AND t_c_firstyear.year_total > 0
      AND t_c_secyear.year_total * t_s_firstyear.year_total
          > t_s_secyear.year_total * t_c_firstyear.year_total
    ORDER BY customer_id
    """,
    doc="TPC-DS q4 shape (tpcds_3.2/q4.sql): the year_total CTE "
    "instantiated four times (2 channels x 2 years), joined on customer, "
    "keeping customers whose 'catalog' (linestatus O) year-over-year "
    "growth beats their 'store' (F) growth. Growth comparison is an "
    "integer cents cross-multiplication — no float division, no NULLIF "
    "edge. Spark side folds all four instantiations into ONE pass of "
    "conditional sums keyed by customer (one fact shuffle instead of "
    "four), then a broadcast join to customer.",
)
def tpcds_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer = _t(spark, sf_dir, "lineitem", "orders", "customer")
    yr = F.year("l_shipdate")
    net = _net_cents()

    def tot(status: str, year: int):
        return F.sum(
            F.when((F.col("l_linestatus") == status) & (yr == year), net)
        )

    pivoted = (
        lineitem.filter(_in_years("l_shipdate", 1996, 1997))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            tot("F", 1996).alias("s_y1"),
            tot("F", 1997).alias("s_y2"),
            tot("O", 1996).alias("c_y1"),
            tot("O", 1997).alias("c_y2"),
        )
        .filter(
            (F.col("s_y1") > 0)
            & (F.col("c_y1") > 0)
            & F.col("s_y2").isNotNull()
            & F.col("c_y2").isNotNull()
            & (F.col("c_y2") * F.col("s_y1") > F.col("s_y2") * F.col("c_y1"))
        )
    )
    return (
        pivoted.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_mktsegment").alias("segment"),
        )
        .orderBy("customer_id")
    )


# --------------------------------------------------------------------------
# q16 — distinct-count + EXISTS + NOT EXISTS over the order graph (q16.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q16",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS order_count,
           CAST(SUM(CAST(ROUND(l1.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS total_ship_cents
    FROM lineitem l1
    JOIN orders o ON l1.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1996-05-01'
      AND n.n_name IN ('NATION_1', 'NATION_3', 'NATION_5')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_returnflag = 'R')
    """,
    doc="TPC-DS q16 shape (tpcds_3.2/q16.sql: count(distinct "
    "cs_order_number) + sum over catalog_sales with an EXISTS on a "
    "second-warehouse sale and NOT EXISTS on returns): here orders "
    "shipped by >=2 suppliers with no returned line, from 3 nations in a "
    "date window. Spark plans the EXISTS as a left-semi self-join keyed "
    "on orderkey (suppkey-mismatch as join condition) and the NOT EXISTS "
    "as a left-anti join — both shuffle on the same orderkey as the "
    "orders join, so AQE coalesces them into one keyed exchange chain.",
)
def tpcds_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1996-05-01").cast("date"))
    )
    c = customer.join(
        F.broadcast(nation.filter(F.col("n_name").isin("NATION_1", "NATION_3", "NATION_5"))),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey")
    l2 = lineitem.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey")
    )
    base = (
        lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(l3, F.col("l_orderkey") == F.col("l3_orderkey"), "left_anti")
    )
    return base.agg(
        F.countDistinct("o_orderkey").alias("order_count"),
        F.sum(_cents()).alias("total_ship_cents"),
    )


# --------------------------------------------------------------------------
# q18 — ROLLUP of four averages over the demographic star (q18.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q18",
    oracle="""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           ROUND(SUM(CAST(l.l_quantity AS BIGINT)) * 1.0
                 / COUNT(*), 4) AS agg_qty,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) * 1.0
                 / (COUNT(*) * 100), 4) AS agg_price,
           ROUND(SUM(CAST(ROUND(l.l_discount * 10000) AS BIGINT)) * 1.0
                 / (COUNT(*) * 10000), 4) AS agg_disc,
           ROUND(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) * 1.0
                 / (COUNT(*) * 100), 4) AS agg_total,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE year(l.l_shipdate) = 1997
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    ORDER BY nation NULLS FIRST, segment NULLS FIRST
    """,
    doc="TPC-DS q18 shape (tpcds_3.2/q18.sql: rollup(i_item_id, ca_country, "
    "ca_state, ca_county) of four AVGs over the catalog/demographic star): "
    "rollup(nation, segment) of four averages — quantity, price, discount, "
    "order total — over the order/customer/nation star for one year. "
    "Every average is one double division of integer sums (qty as longs, "
    "money as cents, discount as basis points), so rollup subtotal rows "
    "hash identically across engines.",
)
def tpcds_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    joined = (
        lineitem.filter(_in_years("l_shipdate", 1997))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    cnt = F.count("*")
    return (
        joined.rollup(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
        .agg(
            dround(F.sum(F.col("l_quantity").cast("long")) / cnt, 4).alias("agg_qty"),
            dround(F.sum(_cents()) / (cnt * 100), 4).alias("agg_price"),
            dround(
                F.sum(F.round(F.col("l_discount") * 10000).cast("long"))
                / (cnt * 10000),
                4,
            ).alias("agg_disc"),
            dround(F.sum(_cents("o_totalprice")) / (cnt * 100), 4).alias("agg_total"),
            cnt.alias("n_rows"),
        )
        .orderBy(F.col("nation").asc_nulls_first(), F.col("segment").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# q23 — frequent items ∩ best customers, two-channel spend (q23a/b.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q23",
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
    SELECT l.l_linestatus AS channel,
           CAST(SUM({_NET_CENTS_SQL}) AS BIGINT) AS sales_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate < DATE '1997-07-01'
      AND l.l_partkey IN (SELECT l_partkey FROM frequent_items)
      AND o.o_custkey IN (SELECT o_custkey FROM best_customers)
    GROUP BY l.l_linestatus ORDER BY channel
    """,
    doc="TPC-DS q23 shape (tpcds_3.2/q23a.sql: frequent_ss_items x "
    "best_ss_customer CTEs feeding a two-channel month scan): items sold "
    "on >6 distinct days in 1996, customers in the top-100 lifetime "
    "spend (deterministic ROW_NUMBER cut standing in for the 95th-"
    "percentile tpcds_cmax), then 1997-H1 revenue restricted to both "
    "sets, split by channel. Spark: both qualifier sets are "
    "broadcast-able aggregates feeding left-semi joins on partkey and "
    "custkey — the fact table is scanned once and never shuffled except "
    "for the final 2-group aggregation.",
)
def tpcds_q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    net = _net_cents()
    frequent = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .groupBy("l_partkey")
        .agg(F.countDistinct("l_shipdate").alias("nd"))
        .filter(F.col("nd") > 6)
        .select("l_partkey")
    )
    spend = (
        lineitem.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(net).alias("cents"))
    )
    # Top-100 lifetime spenders via orderBy().limit() — Spark plans a
    # distributed TakeOrderedAndProject (per-partition top-k + driver merge)
    # instead of a single-partition global ROW_NUMBER window, so the
    # per-customer spend relation is never shuffled to one task. The
    # (cents DESC, o_custkey) tiebreak keeps the cut deterministic and
    # identical to the oracle's ROW_NUMBER qualifier.
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
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(best), "o_custkey", "left_semi")
        .groupBy(F.col("l_linestatus").alias("channel"))
        .agg(F.sum(net).alias("sales_cents"))
        .orderBy("channel")
    )


# --------------------------------------------------------------------------
# q28 — six scalar-aggregate band subqueries cross-joined (q28.sql)
# --------------------------------------------------------------------------
_Q28_BANDS = [(0, 5), (6, 10), (11, 15), (16, 20), (21, 30), (31, 50)]


@query(
    "tpcds_q28",
    oracle="""
    SELECT {cols}
    FROM {froms}
    """.format(
        cols=", ".join(
            f"b{i}.avg_price AS b{i}_avg, b{i}.cnt AS b{i}_cnt, "
            f"b{i}.dst AS b{i}_dst"
            for i in range(len(_Q28_BANDS))
        ),
        froms=", ".join(
            f"""(SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                       * 1.0 / (COUNT(*) * 100), 4) AS avg_price,
                       CAST(COUNT(*) AS BIGINT) AS cnt,
                       CAST(COUNT(DISTINCT CAST(ROUND(l_extendedprice * 100)
                            AS BIGINT)) AS BIGINT) AS dst
                FROM lineitem
                WHERE l_quantity BETWEEN {lo} AND {hi}) b{i}"""
            for i, (lo, hi) in enumerate(_Q28_BANDS)
        ),
    ),
    doc="TPC-DS q28 shape (tpcds_3.2/q28.sql: six independent scalar "
    "aggregate subqueries over quantity bands of store_sales, "
    "cross-joined into one row): per quantity band — avg price, row "
    "count, distinct price count. The oracle keeps the six-subquery "
    "form; Spark computes all 18 aggregates in ONE scan as conditional "
    "aggregates (count distinct per band via distinct-on-condition), "
    "which is the plan the six-scan form should collapse to at 100 TB.",
)
def tpcds_q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    cents = _cents()
    aggs = []
    for i, (lo, hi) in enumerate(_Q28_BANDS):
        in_band = F.col("l_quantity").between(lo, hi)
        band_cents = F.when(in_band, cents)
        aggs += [
            dround(F.sum(band_cents) / (F.count(band_cents) * 100), 4).alias(
                f"b{i}_avg"
            ),
            F.count(band_cents).alias(f"b{i}_cnt"),
            F.countDistinct(band_cents).alias(f"b{i}_dst"),
        ]
    return lineitem.agg(*aggs)


# --------------------------------------------------------------------------
# q39 — coefficient-of-variation month-over-month self-join (q39.sql)
# --------------------------------------------------------------------------
_Q39_STAT_SQL = """
      SELECT n.n_name AS nation, p.p_brand AS brand,
             month(l.l_shipdate) AS moy,
             COUNT(*) AS n,
             SUM(CAST(l.l_quantity AS BIGINT)) AS s1,
             SUM(CAST(l.l_quantity AS BIGINT) * CAST(l.l_quantity AS BIGINT))
               AS s2
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE year(l.l_shipdate) = 1996 AND month(l.l_shipdate) IN (3, 4)
      GROUP BY 1, 2, 3 HAVING COUNT(*) > 1
"""


@query(
    "tpcds_q39",
    oracle=f"""
    WITH stats AS ({_Q39_STAT_SQL}),
    cov AS (
      SELECT nation, brand, moy,
             ROUND(sqrt((n * s2 - s1 * s1) * 1.0 / (n * (n - 1)))
                   / (s1 * 1.0 / n), 4) AS cov
      FROM stats WHERE s1 > 0)
    SELECT m1.nation AS nation, m1.brand AS brand,
           m1.cov AS cov_mar, m2.cov AS cov_apr
    FROM cov m1 JOIN cov m2
      ON m1.nation = m2.nation AND m1.brand = m2.brand
     AND m1.moy = 3 AND m2.moy = 4
    WHERE m1.cov >= 0.45 AND m2.cov >= 0.45
    ORDER BY nation, brand
    """,
    doc="TPC-DS q39 shape (tpcds_3.2/q39a.sql: per warehouse-item-month "
    "inventory mean/stdev, month-to-month self-join keeping cov >= 1): "
    "per (supplier-nation, part, month) quantity coefficient of "
    "variation per (nation, brand) from integer power sums (stddev_samp = sqrt((n*S2-S1^2)/"
    "(n(n-1))) — bit-identical across engines), March joined to April "
    "where both months are high-variance. One fact aggregation, then a "
    "self-join on the (nation, part) grouping key.",
)
def tpcds_q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation, part = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "part"
    )
    qty = F.col("l_quantity").cast("long")
    stats = (
        lineitem.filter(
            _date_range("l_shipdate", "1996-03-01", "1996-05-01")
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
        .withColumn(
            "cov",
            dround(
                F.sqrt(
                    (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
                    / (F.col("n") * (F.col("n") - 1))
                )
                / (F.col("s1") / F.col("n")),
                4,
            ),
        )
        .filter(F.col("cov") >= 0.45)
    )
    m1 = stats.filter(F.col("moy") == 3).select(
        "nation", "brand", F.col("cov").alias("cov_mar")
    )
    m2 = stats.filter(F.col("moy") == 4).select(
        F.col("nation").alias("nation2"),
        F.col("brand").alias("brand2"),
        F.col("cov").alias("cov_apr"),
    )
    return (
        m1.join(
            m2,
            (F.col("nation") == F.col("nation2"))
            & (F.col("brand") == F.col("brand2")),
        )
        .select("nation", "brand", "cov_mar", "cov_apr")
        .orderBy("nation", "brand")
    )


# --------------------------------------------------------------------------
# q44 — best/worst performing items by ascending/descending rank (q44.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q44",
    oracle="""
    WITH perf AS (
      SELECT l_partkey AS item_sk,
             ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) * 1.0 / (COUNT(*) * 100), 4) AS rank_col
      FROM lineitem WHERE l_suppkey % 25 = 2
      GROUP BY l_partkey),
    asceding AS (
      SELECT item_sk, ROW_NUMBER() OVER (ORDER BY rank_col ASC, item_sk) AS rnk
      FROM perf),
    descending AS (
      SELECT item_sk, ROW_NUMBER() OVER (ORDER BY rank_col DESC, item_sk) AS rnk
      FROM perf)
    SELECT a.rnk AS rnk, i1.p_name AS best_performing,
           i2.p_name AS worst_performing
    FROM asceding a JOIN descending d ON a.rnk = d.rnk
    JOIN part i1 ON i1.p_partkey = d.item_sk
    JOIN part i2 ON i2.p_partkey = a.item_sk
    WHERE a.rnk <= 10
    ORDER BY rnk
    """,
    doc="TPC-DS q44 shape (tpcds_3.2/q44.sql: items ranked ascending and "
    "descending by avg net profit at one store, best/worst joined on "
    "rank position, item names resolved twice): one aggregation per "
    "part over the supplier-bucket slice, a distributed top-10 per "
    "direction (orderBy().limit() -> TakeOrderedAndProject, "
    "deterministic rounded-avg + item tiebreak) with ROW_NUMBER applied "
    "only to the surviving <=10 rows, rank-position join, double "
    "broadcast join to part.",
)
def tpcds_q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    perf = (
        lineitem.filter(F.col("l_suppkey") % 25 == 2)
        .groupBy(F.col("l_partkey").alias("item_sk"))
        .agg(dround(F.sum(_net_cents()) / (F.count("*") * 100), 4).alias("rank_col"))
    )
    # Each direction first takes its top-10 via orderBy().limit() — Spark
    # plans a distributed TakeOrderedAndProject (per-partition heap + driver
    # merge), so the full per-item relation never collapses into one task.
    # ROW_NUMBER then runs over only the surviving <=10 rows to number the
    # rank positions; the (rank_col, item_sk) tiebreak keeps both the cut
    # and the numbering deterministic.
    asc = (
        perf.orderBy(F.col("rank_col").asc(), F.col("item_sk"))
        .limit(10)
        .select(
            F.col("item_sk").alias("a_item"),
            F.row_number()
            .over(Window.orderBy(F.col("rank_col").asc(), F.col("item_sk")))
            .alias("rnk"),
        )
    )
    desc = (
        perf.orderBy(F.col("rank_col").desc(), F.col("item_sk"))
        .limit(10)
        .select(
            F.col("item_sk").alias("d_item"),
            F.row_number()
            .over(Window.orderBy(F.col("rank_col").desc(), F.col("item_sk")))
            .alias("rnk"),
        )
    )
    i1 = part.select(F.col("p_partkey").alias("i1_key"), F.col("p_name").alias("best_performing"))
    i2 = part.select(F.col("p_partkey").alias("i2_key"), F.col("p_name").alias("worst_performing"))
    return (
        asc.join(desc, "rnk")
        .join(F.broadcast(i1), F.col("d_item") == F.col("i1_key"))
        .join(F.broadcast(i2), F.col("a_item") == F.col("i2_key"))
        .select("rnk", "best_performing", "worst_performing")
        .orderBy("rnk")
    )


# --------------------------------------------------------------------------
# q49 — three-channel worst-return-ratio ranking union (q49.sql)
# --------------------------------------------------------------------------
_Q49_CHAN_SQL = """
      SELECT o.o_orderstatus AS status, l.l_partkey AS item,
             SUM(CASE WHEN l.l_returnflag = 'R'
                      THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS ret_qty,
             SUM(CAST(l.l_quantity AS BIGINT)) AS qty,
             SUM(CASE WHEN l.l_returnflag = 'R'
                      THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                      ELSE 0 END) AS ret_amt,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS amt
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE year(l.l_shipdate) = 1996
      GROUP BY 1, 2 HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 0
         AND SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) > 0
"""


@query(
    "tpcds_q49",
    oracle=f"""
    WITH base AS ({_Q49_CHAN_SQL}),
    ranked AS (
      SELECT status, item,
             ROUND(ret_qty * 1.0 / qty, 6) AS return_ratio,
             ROW_NUMBER() OVER (PARTITION BY status
                                ORDER BY ROUND(ret_qty * 1.0 / qty, 6), item)
               AS return_rank,
             ROW_NUMBER() OVER (PARTITION BY status
                                ORDER BY ROUND(ret_amt * 1.0 / amt, 6), item)
               AS currency_rank
      FROM base)
    SELECT CASE status WHEN 'O' THEN 'web' WHEN 'F' THEN 'store'
                       ELSE 'catalog' END AS channel,
           item, return_ratio, return_rank, currency_rank
    FROM ranked
    WHERE return_rank <= 10 OR currency_rank <= 10
    ORDER BY channel, return_rank, currency_rank, item
    """,
    doc="TPC-DS q49 shape (tpcds_3.2/q49.sql: per-channel worst return "
    "ratios, double-ranked by quantity ratio and currency ratio, "
    "union-all of web/catalog/store blocks, rank<=10 either way): "
    "channels are the o_orderstatus slices computed in ONE fact pass; "
    "ratios are single double divisions of integer sums rounded to 6dp; "
    "per-status ROW_NUMBER comes from the distributed ranker over the "
    "composite (status, ratio, item) order minus broadcast per-status "
    "start offsets — never a 3-task Window.partitionBy(status).",
)
def tpcds_q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    qty = F.col("l_quantity").cast("long")
    cents = _cents()
    is_ret = F.col("l_returnflag") == "R"
    base = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(orders.select("o_orderkey", "o_orderstatus"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_orderstatus").alias("status"), F.col("l_partkey").alias("item"))
        .agg(
            F.sum(F.when(is_ret, qty).otherwise(F.lit(0))).alias("ret_qty"),
            F.sum(qty).alias("qty"),
            F.sum(F.when(is_ret, cents).otherwise(F.lit(0))).alias("ret_amt"),
            F.sum(cents).alias("amt"),
        )
        .filter((F.col("qty") > 0) & (F.col("amt") > 0))
    )
    # Window.partitionBy(status) would put ITEM-cardinality rows on only 3
    # tasks (one per status) at scale.  Instead: per-status ROW_NUMBER ==
    # global row number over the composite total order (status, ratio,
    # item) minus the status's start offset.  The composite key folds into
    # one monotone numeric (status_num*10 + ratio, ratio in [0,1] so the
    # bands never overlap and the 1e-6-grained ratio survives the +10
    # exactly), ranked by the two-phase distributed ranker
    # (operators/ranking.py — every Window bucket-partitioned); offsets
    # come from a 3-row per-status MIN broadcast back.
    from kyuubi_spark.operators.ranking import global_row_numbers

    s_num = (
        F.when(F.col("status") == "F", 0)
        .when(F.col("status") == "O", 1)
        .otherwise(2)
    )
    keyed = base.withColumn(
        "skey_r", s_num * 10 + dround(F.col("ret_qty") / F.col("qty"), 6)
    ).withColumn(
        "skey_c", s_num * 10 + dround(F.col("ret_amt") / F.col("amt"), 6)
    )
    with_c, _ = global_row_numbers(
        keyed,
        {
            "grn_r": [("skey_r", "asc"), ("item", "asc")],
            "grn_c": [("skey_c", "asc"), ("item", "asc")],
        },
    )
    starts = with_c.groupBy("status").agg(
        F.min("grn_r").alias("start_r"), F.min("grn_c").alias("start_c")
    )
    ranked = (
        with_c.join(F.broadcast(starts), "status")
        .select(
            "status",
            "item",
            dround(F.col("ret_qty") / F.col("qty"), 6).alias("return_ratio"),
            (F.col("grn_r") - F.col("start_r") + 1).cast("int").alias("return_rank"),
            (F.col("grn_c") - F.col("start_c") + 1).cast("int").alias("currency_rank"),
        )
    )
    return (
        ranked.filter((F.col("return_rank") <= 10) | (F.col("currency_rank") <= 10))
        .select(
            F.when(F.col("status") == "O", "web")
            .when(F.col("status") == "F", "store")
            .otherwise("catalog")
            .alias("channel"),
            "item",
            "return_ratio",
            "return_rank",
            "currency_rank",
        )
        .orderBy("channel", "return_rank", "currency_rank", "item")
    )


# --------------------------------------------------------------------------
# q50 — ship-lag bucket counts per store (q50.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q50",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              <= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS d30,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS d31_60,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS d61_90,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 91 AND 120 THEN 1 ELSE 0 END) AS BIGINT)
             AS d91_120,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              > 120 THEN 1 ELSE 0 END) AS BIGINT)
             AS d120_plus
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE year(l.l_shipdate) = 1997
    GROUP BY n.n_name ORDER BY nation
    """,
    doc="TPC-DS q50 shape (tpcds_3.2/q50.sql: store_sales joined to its "
    "store_returns, counts bucketed by days-to-return 30/60/90/120/120+ "
    "per store): order-to-ship lag buckets per supplier nation — five "
    "conditional counts over one star join, the canonical latency "
    "histogram plan (single fact shuffle on the grouping key, dims "
    "broadcast).",
)
def tpcds_q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def bucket(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return (
        lineitem.filter(_in_years("l_shipdate", 1997))
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            bucket(lag <= 30).alias("d30"),
            bucket(lag.between(31, 60)).alias("d31_60"),
            bucket(lag.between(61, 90)).alias("d61_90"),
            bucket(lag.between(91, 120)).alias("d91_120"),
            bucket(lag > 120).alias("d120_plus"),
        )
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# q57 — monthly deviation from yearly average + neighbors (q57.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q57",
    oracle="""
    WITH v1 AS (
      SELECT p.p_brand AS brand, n.n_name AS cc_name,
             year(l.l_shipdate) AS d_year, month(l.l_shipdate) AS d_moy,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE year(l.l_shipdate) IN (1996, 1997)
      GROUP BY 1, 2, 3, 4),
    v2 AS (
      SELECT brand, cc_name, d_year, d_moy, sum_cents,
             AVG(sum_cents) OVER (PARTITION BY brand, cc_name, d_year)
               AS avg_monthly,
             LAG(sum_cents) OVER (PARTITION BY brand, cc_name
                                  ORDER BY d_year, d_moy) AS psum,
             LEAD(sum_cents) OVER (PARTITION BY brand, cc_name
                                   ORDER BY d_year, d_moy) AS nsum
      FROM v1)
    SELECT brand, cc_name, d_year, d_moy, sum_cents,
           ROUND(avg_monthly / 100, 2) AS avg_monthly_sales,
           psum, nsum
    FROM v2
    WHERE d_year = 1996 AND avg_monthly > 0
      AND abs(sum_cents - avg_monthly) * 10 > avg_monthly
      AND psum IS NOT NULL AND nsum IS NOT NULL
    ORDER BY brand, cc_name, d_year, d_moy
    """,
    doc="TPC-DS q57 shape (tpcds_3.2/q57.sql: v1 monthly sums per "
    "item-category/brand/call-center with AVG-over-year and RANK "
    "windows, v1 self-joined at rn-1/rn+1 for neighbor months, keeping "
    "months deviating >10% from the yearly average): monthly brand x "
    "supplier-nation revenue with the neighbor self-joins expressed as "
    "LAG/LEAD over the same window ordering — one fact aggregation, one "
    "window shuffle instead of three CTE re-instantiations. The "
    "deviation test multiplies through by 10 (integer-exact against the "
    "cent sums; AVG of exact longs is deterministic double division).",
)
def tpcds_q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    v1 = (
        lineitem.filter(_in_years("l_shipdate", 1996, 1997))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("n_name").alias("cc_name"),
            F.year("l_shipdate").alias("d_year"),
            F.month("l_shipdate").alias("d_moy"),
        )
        .agg(F.sum(_cents()).alias("sum_cents"))
    )
    series = Window.partitionBy("brand", "cc_name").orderBy("d_year", "d_moy")
    yearly = Window.partitionBy("brand", "cc_name", "d_year")
    v2 = v1.select(
        "brand",
        "cc_name",
        "d_year",
        "d_moy",
        "sum_cents",
        F.avg("sum_cents").over(yearly).alias("avg_monthly"),
        F.lag("sum_cents").over(series).alias("psum"),
        F.lead("sum_cents").over(series).alias("nsum"),
    )
    return (
        v2.filter(
            (F.col("d_year") == 1996)
            & (F.col("avg_monthly") > 0)
            & (F.abs(F.col("sum_cents") - F.col("avg_monthly")) * 10 > F.col("avg_monthly"))
            & F.col("psum").isNotNull()
            & F.col("nsum").isNotNull()
        )
        .select(
            "brand",
            "cc_name",
            "d_year",
            "d_moy",
            "sum_cents",
            dround(F.col("avg_monthly") / 100, 2).alias("avg_monthly_sales"),
            "psum",
            "nsum",
        )
        .orderBy("brand", "cc_name", "d_year", "d_moy")
    )


# --------------------------------------------------------------------------
# q70 — ROLLUP + rank-within-parent with a top-region semi filter (q70.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q70",
    oracle="""
    WITH profit AS (
      SELECT r.r_name AS state, n.n_name AS county,
             CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                  AS BIGINT) AS net_cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE year(l.l_shipdate) = 1997),
    top_states AS (
      SELECT state FROM (
        SELECT state, ROW_NUMBER() OVER (ORDER BY SUM(net_cents) DESC, state)
                 AS r
        FROM profit GROUP BY state) t
      WHERE r <= 3),
    rolled AS (
      SELECT CAST(SUM(net_cents) AS BIGINT) AS total_cents, state, county,
             GROUPING(state) + GROUPING(county) AS lochierarchy,
             CASE WHEN GROUPING(county) = 0 THEN state END AS parent
      FROM profit WHERE state IN (SELECT state FROM top_states)
      GROUP BY ROLLUP (state, county))
    SELECT total_cents, state, county, lochierarchy,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY lochierarchy, parent
             ORDER BY total_cents DESC, state NULLS FIRST, county NULLS FIRST)
             AS BIGINT) AS rank_within_parent
    FROM rolled
    ORDER BY lochierarchy DESC, state NULLS FIRST, county NULLS FIRST,
             rank_within_parent
    """,
    doc="TPC-DS q70 shape (tpcds_3.2/q70.sql: rollup(s_state, s_county) of "
    "net profit over states surviving a top-5-by-rank subquery, "
    "lochierarchy from GROUPING bits, rank within each hierarchy "
    "parent): region/nation stand in for state/county, the qualifying "
    "subquery keeps the top-3 regions by ROW_NUMBER (deterministic), "
    "and rank_within_parent partitions on (grouping level, parent "
    "state) ordered by the exact cent totals. The rollup and both "
    "windows run over the aggregated relation, not the fact scan.",
)
def tpcds_q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation, region = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "region"
    )
    profit = (
        lineitem.filter(_in_years("l_shipdate", 1997))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("r_name").alias("state"),
            F.col("n_name").alias("county"),
            _net_cents().alias("net_cents"),
        )
    )
    top_states = (
        profit.groupBy("state")
        .agg(F.sum("net_cents").alias("tot"))
        .withColumn(
            "r",
            F.row_number().over(Window.orderBy(F.col("tot").desc(), F.col("state"))),
        )
        .filter(F.col("r") <= 3)
        .select("state")
    )
    rolled = (
        profit.join(F.broadcast(top_states), "state", "left_semi")
        .rollup("state", "county")
        .agg(
            F.sum("net_cents").alias("total_cents"),
            (F.grouping("state") + F.grouping("county")).alias("lochierarchy"),
            F.when(F.grouping("county") == 0, F.col("state")).alias("parent"),
        )
    )
    rank_w = Window.partitionBy("lochierarchy", "parent").orderBy(
        F.col("total_cents").desc(),
        F.col("state").asc_nulls_first(),
        F.col("county").asc_nulls_first(),
    )
    return (
        rolled.select(
            "total_cents",
            "state",
            "county",
            "lochierarchy",
            F.row_number().over(rank_w).cast("bigint").alias("rank_within_parent"),
        )
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("state").asc_nulls_first(),
            F.col("county").asc_nulls_first(),
            "rank_within_parent",
        )
    )


# --------------------------------------------------------------------------
# q87 — EXCEPT-chain distinct customer-day combinations (q87.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q87",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS num_customers FROM (
      (SELECT DISTINCT o.o_custkey, CAST(o.o_orderdate AS DATE) AS d
       FROM orders o WHERE o.o_orderstatus = 'F'
         AND year(o.o_orderdate) = 1996)
      EXCEPT
      (SELECT DISTINCT o.o_custkey, CAST(o.o_orderdate AS DATE) AS d
       FROM orders o WHERE o.o_orderstatus = 'O'
         AND year(o.o_orderdate) = 1996)
      EXCEPT
      (SELECT DISTINCT o.o_custkey, CAST(o.o_orderdate AS DATE) AS d
       FROM orders o WHERE o.o_orderstatus = 'P'
         AND year(o.o_orderdate) = 1996)
    ) t
    """,
    doc="TPC-DS q87 shape (tpcds_3.2/q87.sql: count of (customer, date) "
    "combos in store_sales EXCEPT catalog_sales EXCEPT web_sales): "
    "customers-with-day present in the 'F' channel but neither 'O' nor "
    "'P', as a distinct-projection EXCEPT chain — each EXCEPT is a "
    "shuffle on the full projected key, the plan TPC-DS uses to stress "
    "set-op dedup. Channels are orderstatus slices of one orders scan.",
)
def tpcds_q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    y96 = orders.filter(_in_years("o_orderdate", 1996))

    def chan(status: str) -> DataFrame:
        return (
            y96.filter(F.col("o_orderstatus") == status)
            .select("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
            .distinct()
        )

    result = chan("F").exceptAll(chan("O")).distinct().exceptAll(chan("P")).distinct()
    return result.agg(F.count("*").alias("num_customers"))


# --------------------------------------------------------------------------
# q90 — early/late period ratio from two scalar aggregates (q90.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q90",
    oracle="""
    SELECT ROUND(amc.cnt * 1.0 / NULLIF(pmc.cnt, 0), 4) AS am_pm_ratio
    FROM (SELECT COUNT(*) AS cnt FROM lineitem
          WHERE year(l_shipdate) = 1996 AND month(l_shipdate) BETWEEN 1 AND 3
            AND l_quantity BETWEEN 10 AND 30) amc,
         (SELECT COUNT(*) AS cnt FROM lineitem
          WHERE year(l_shipdate) = 1996 AND month(l_shipdate) BETWEEN 7 AND 9
            AND l_quantity BETWEEN 10 AND 30) pmc
    """,
    doc="TPC-DS q90 shape (tpcds_3.2/q90.sql: am_pm_ratio = count of web "
    "sales in the 8am hour over the 8pm hour, two scalar subqueries "
    "cross-joined): Q1-vs-Q3 shipment count ratio under a quantity band "
    "— two filtered counts collapsed into one conditional-aggregate "
    "scan on the Spark side, ratio as one rounded division.",
)
def tpcds_q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    base = lineitem.filter(
        _in_years("l_shipdate", 1996) & F.col("l_quantity").between(10, 30)
    )
    moy = F.month("l_shipdate")
    counts = base.agg(
        F.sum(F.when(moy.between(1, 3), 1).otherwise(0)).alias("amc"),
        F.sum(F.when(moy.between(7, 9), 1).otherwise(0)).alias("pmc"),
    )
    return counts.select(
        dround(F.col("amc") / F.nullif(F.col("pmc"), F.lit(0)), 4).alias("am_pm_ratio")
    )


# --------------------------------------------------------------------------
# q97 — full-outer channel overlap counts (q97.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q97",
    oracle="""
    WITH ssci AS (
      SELECT DISTINCT o.o_custkey AS customer_sk, l.l_partkey AS item_sk
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_linestatus = 'F' AND year(l.l_shipdate) = 1996),
    csci AS (
      SELECT DISTINCT o.o_custkey AS customer_sk, l.l_partkey AS item_sk
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_linestatus = 'O' AND year(l.l_shipdate) = 1996)
    SELECT CAST(SUM(CASE WHEN s.customer_sk IS NOT NULL
                          AND c.customer_sk IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS store_only,
           CAST(SUM(CASE WHEN s.customer_sk IS NULL
                          AND c.customer_sk IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS catalog_only,
           CAST(SUM(CASE WHEN s.customer_sk IS NOT NULL
                          AND c.customer_sk IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS store_and_catalog
    FROM ssci s FULL OUTER JOIN csci c
      ON s.customer_sk = c.customer_sk AND s.item_sk = c.item_sk
    """,
    doc="TPC-DS q97 shape (tpcds_3.2/q97.sql: distinct (customer, item) "
    "sets per channel, FULL OUTER JOIN, store-only / catalog-only / "
    "both counts): the canonical channel-overlap audit — two distinct "
    "projections shuffled on the composite key, one full-outer join, "
    "three conditional counts. Channels are the linestatus slices.",
)
def tpcds_q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    base = lineitem.filter(_in_years("l_shipdate", 1996)).join(
        orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey")
    )

    def chan(status: str, pre: str) -> DataFrame:
        return (
            base.filter(F.col("l_linestatus") == status)
            .select(
                F.col("o_custkey").alias(f"{pre}_customer_sk"),
                F.col("l_partkey").alias(f"{pre}_item_sk"),
            )
            .distinct()
        )

    s, c = chan("F", "s"), chan("O", "c")
    joined = s.join(
        c,
        (F.col("s_customer_sk") == F.col("c_customer_sk"))
        & (F.col("s_item_sk") == F.col("c_item_sk")),
        "full_outer",
    )
    return joined.agg(
        F.sum(
            F.when(
                F.col("s_customer_sk").isNotNull() & F.col("c_customer_sk").isNull(), 1
            ).otherwise(0)
        ).alias("store_only"),
        F.sum(
            F.when(
                F.col("s_customer_sk").isNull() & F.col("c_customer_sk").isNotNull(), 1
            ).otherwise(0)
        ).alias("catalog_only"),
        F.sum(
            F.when(
                F.col("s_customer_sk").isNotNull() & F.col("c_customer_sk").isNotNull(),
                1,
            ).otherwise(0)
        ).alias("store_and_catalog"),
    )


# --------------------------------------------------------------------------
# q21 — before/after inventory ratio band around a pivot date (q21.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q21",
    oracle="""
    SELECT * FROM (
      SELECT n.n_name AS warehouse, p.p_brand AS item,
             CAST(SUM(CASE WHEN l.l_shipdate <  DATE '1996-07-01'
                      THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS inv_before,
             CAST(SUM(CASE WHEN l.l_shipdate >= DATE '1996-07-01'
                      THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS inv_after
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_retailprice BETWEEN 920 AND 980
        AND l.l_shipdate BETWEEN DATE '1996-06-01' AND DATE '1996-07-31'
      GROUP BY 1, 2) x
    WHERE inv_before > 0 AND inv_after > 0
      AND 3 * inv_after >= 2 * inv_before
      AND 2 * inv_after <= 3 * inv_before
    ORDER BY warehouse, item
    """,
    doc="TPC-DS q21 shape (tpcds_3.2/q21.sql: per warehouse-item inventory "
    "sums 30 days either side of a pivot date, keeping items whose "
    "after/before ratio sits in [2/3, 3/2] (brand-level grouping keeps "
    "month buckets populated at small SFs), under an item price-band "
    "filter): supplier-nation stands in for warehouse, ship quantity for "
    "inventory. The ratio band is evaluated by integer "
    "cross-multiplication of the exact quantity sums — no float "
    "division — and the price-band filter pushes into the part scan.",
)
def tpcds_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation, part = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "part"
    )
    pivot = F.lit("1996-07-01").cast("date")
    qty = F.col("l_quantity").cast("long")
    agged = (
        lineitem.filter(
            F.col("l_shipdate").between(
                F.lit("1996-06-01").cast("date"), F.lit("1996-07-31").cast("date")
            )
        )
        .join(
            F.broadcast(part.filter(F.col("p_retailprice").between(920, 980))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("warehouse"), F.col("p_brand").alias("item"))
        .agg(
            F.sum(F.when(F.col("l_shipdate") < pivot, qty).otherwise(F.lit(0))).alias(
                "inv_before"
            ),
            F.sum(F.when(F.col("l_shipdate") >= pivot, qty).otherwise(F.lit(0))).alias(
                "inv_after"
            ),
        )
    )
    return (
        agged.filter(
            (F.col("inv_before") > 0)
            & (F.col("inv_after") > 0)
            & (3 * F.col("inv_after") >= 2 * F.col("inv_before"))
            & (2 * F.col("inv_after") <= 3 * F.col("inv_before"))
        )
        .orderBy("warehouse", "item")
    )


# --------------------------------------------------------------------------
# q35 — demographic stats gated by channel EXISTS combinations (q35.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q35",
    oracle="""
    WITH store_c AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
        AND year(o_orderdate) = 1996),
    other_c AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderstatus IN ('O', 'P') AND year(o_orderdate) = 1996)
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS min_bal_cents,
           CAST(MAX(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS max_bal_cents,
           ROUND(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) * 1.0
                 / (COUNT(*) * 100), 4) AS avg_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM store_c s WHERE s.o_custkey = c.c_custkey)
      AND EXISTS (SELECT 1 FROM other_c o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1, 2 ORDER BY nation, segment
    """,
    doc="TPC-DS q35 shape (tpcds_3.2/q35.sql: customer demographics with "
    "an EXISTS on store_sales AND (EXISTS web OR EXISTS catalog), "
    "grouped stats — count/avg/max/sum — per state/gender/...): "
    "customers active in BOTH the 'F' channel and an 'O'/'P' channel in "
    "1996, account-balance stats per (nation, segment). Both EXISTS "
    "become broadcast left-semi joins of distinct customer sets; "
    "min/max/avg run over exact cents.",
)
def tpcds_q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    y96 = orders.filter(_in_years("o_orderdate", 1996))
    store_c = (
        y96.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )
    other_c = (
        y96.filter(F.col("o_orderstatus").isin("O", "P"))
        .select("o_custkey")
        .distinct()
    )
    bal = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        customer.join(
            F.broadcast(store_c), F.col("c_custkey") == store_c["o_custkey"], "left_semi"
        )
        .join(
            F.broadcast(other_c), F.col("c_custkey") == other_c["o_custkey"], "left_semi"
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("cnt"),
            F.min(bal).alias("min_bal_cents"),
            F.max(bal).alias("max_bal_cents"),
            dround(F.sum(bal) / (F.count("*") * 100), 4).alias("avg_bal"),
        )
        .orderBy("nation", "segment")
    )


# --------------------------------------------------------------------------
# q54 — revenue-band histogram of cross-channel converts (q54.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q54",
    oracle="""
    WITH my_customers AS (
      SELECT DISTINCT o.o_custkey AS c
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_linestatus = 'O'
        AND p.p_type IN ('PROMO', 'ECONOMY')
        AND year(l.l_shipdate) = 1996 AND month(l.l_shipdate) = 3),
    my_revenue AS (
      SELECT o.o_custkey AS c,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS rev_cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_linestatus = 'F'
        AND l.l_shipdate >= DATE '1996-04-01'
        AND l.l_shipdate < DATE '1996-07-01'
        AND o.o_custkey IN (SELECT c FROM my_customers)
      GROUP BY 1),
    segments AS (
      SELECT CAST(rev_cents // 500000 AS BIGINT) AS segment FROM my_revenue)
    SELECT segment, CAST(COUNT(*) AS BIGINT) AS num_customers,
           segment * 5000 AS segment_base
    FROM segments GROUP BY segment ORDER BY segment
    """,
    doc="TPC-DS q54 shape (tpcds_3.2/q54.sql: my_customers = buyers of a "
    "category in catalog/web during one month; my_revenue = their store "
    "revenue over the following quarter; histogram of customers by "
    "$50 revenue band): buyers of two part types in channel 'O' during "
    "1996-03, their 'F'-channel spend in Q2, counted per $5000 cent "
    "band (integer floor division — engine-exact). The customer "
    "qualifier is a broadcast semi-join; the histogram groups the "
    "per-customer aggregate, not the fact table.",
)
def tpcds_q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    ok = orders.select("o_orderkey", "o_custkey")
    my_customers = (
        lineitem.filter(
            (F.col("l_linestatus") == "O")
            & _in_month("l_shipdate", 1996, 3)
        )
        .join(
            F.broadcast(part.filter(F.col("p_type").isin("PROMO", "ECONOMY"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(ok, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"))
        .distinct()
    )
    my_revenue = (
        lineitem.filter(
            (F.col("l_linestatus") == "F")
            & (F.col("l_shipdate") >= F.lit("1996-04-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("date"))
        )
        .join(ok, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(my_customers), F.col("o_custkey") == F.col("c"), "left_semi")
        .groupBy("o_custkey")
        .agg(F.sum(_cents()).alias("rev_cents"))
    )
    return (
        my_revenue.select(
            F.floor(F.col("rev_cents") / 500000).cast("long").alias("segment")
        )
        .groupBy("segment")
        .agg(F.count("*").alias("num_customers"))
        .select("segment", "num_customers", (F.col("segment") * 5000).alias("segment_base"))
        .orderBy("segment")
    )


# --------------------------------------------------------------------------
# q75 — year-over-year per-brand sales decline (q75.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q75",
    oracle=f"""
    WITH all_sales AS (
      SELECT year(l.l_shipdate) AS d_year, p.p_brand AS brand,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sales_cnt,
             CAST(SUM({_NET_CENTS_SQL}) AS BIGINT) AS sales_amt
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE year(l.l_shipdate) IN (1996, 1997)
        AND l.l_returnflag <> 'R'
      GROUP BY 1, 2)
    SELECT prev.d_year AS prev_year, curr.d_year AS year,
           curr.brand AS brand,
           prev.sales_cnt AS prev_yr_cnt, curr.sales_cnt AS curr_yr_cnt,
           curr.sales_cnt - prev.sales_cnt AS sales_cnt_diff,
           curr.sales_amt - prev.sales_amt AS sales_amt_diff
    FROM all_sales curr JOIN all_sales prev
      ON curr.brand = prev.brand
     AND curr.d_year = 1997 AND prev.d_year = 1996
    WHERE 10 * curr.sales_cnt < 9 * prev.sales_cnt
    ORDER BY sales_cnt_diff, sales_amt_diff, brand
    """,
    doc="TPC-DS q75 shape (tpcds_3.2/q75.sql: all_sales = three-channel "
    "union of sales minus returns per item hierarchy, current year "
    "joined to previous year keeping brands whose unit count fell below "
    "90%): net-of-returns quantity and amount per (year, brand), "
    "1997-vs-1996 self-join, decline test as integer "
    "cross-multiplication (10*curr < 9*prev). Spark folds the two CTE "
    "instantiations into one aggregation and joins the two year slices "
    "on brand.",
)
def tpcds_q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    all_sales = (
        lineitem.filter(
            _in_years("l_shipdate", 1996, 1997) & (F.col("l_returnflag") != "R")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").alias("d_year"), F.col("p_brand").alias("brand"))
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sales_cnt"),
            F.sum(_net_cents()).alias("sales_amt"),
        )
    )
    curr = all_sales.filter(F.col("d_year") == 1997).select(
        F.col("d_year").alias("year"),
        "brand",
        F.col("sales_cnt").alias("curr_yr_cnt"),
        F.col("sales_amt").alias("curr_amt"),
    )
    prev = all_sales.filter(F.col("d_year") == 1996).select(
        F.col("d_year").alias("prev_year"),
        F.col("brand").alias("brand_p"),
        F.col("sales_cnt").alias("prev_yr_cnt"),
        F.col("sales_amt").alias("prev_amt"),
    )
    return (
        curr.join(prev, F.col("brand") == F.col("brand_p"))
        .filter(10 * F.col("curr_yr_cnt") < 9 * F.col("prev_yr_cnt"))
        .select(
            "prev_year",
            "year",
            "brand",
            "prev_yr_cnt",
            "curr_yr_cnt",
            (F.col("curr_yr_cnt") - F.col("prev_yr_cnt")).alias("sales_cnt_diff"),
            (F.col("curr_amt") - F.col("prev_amt")).alias("sales_amt_diff"),
        )
        .orderBy("sales_cnt_diff", "sales_amt_diff", "brand")
    )


# --------------------------------------------------------------------------
# q78 — cross-channel ratio for return-free sales (q78.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q78",
    oracle="""
    WITH returned_orders AS (
      SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
    ss AS (
      SELECT l_partkey AS item,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ss_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS ss_amt
      FROM lineitem
      WHERE l_linestatus = 'F' AND year(l_shipdate) = 1996
        AND l_orderkey NOT IN (SELECT l_orderkey FROM returned_orders)
      GROUP BY 1),
    os AS (
      SELECT l_partkey AS item,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS other_qty,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS other_amt
      FROM lineitem
      WHERE l_linestatus = 'O' AND year(l_shipdate) = 1996
      GROUP BY 1)
    SELECT ss.item AS item, ss.ss_qty, ss.ss_amt,
           COALESCE(os.other_qty, 0) AS other_qty,
           ROUND(ss.ss_qty * 1.0 / NULLIF(COALESCE(os.other_qty, 0), 0), 4)
             AS qty_ratio
    FROM ss LEFT JOIN os ON ss.item = os.item
    WHERE 2 * ss.ss_qty > COALESCE(os.other_qty, 0)
    ORDER BY item
    """,
    doc="TPC-DS q78 shape (tpcds_3.2/q78.sql: per item-year store sales "
    "restricted to rows with NO matching return (null-extended left "
    "join), ratioed against web+catalog volumes): 'F'-channel quantity "
    "per item excluding returned orders (left-anti on the distinct "
    "returned-order set), left-joined to the 'O'-channel aggregate with "
    "COALESCE null extension, keeping items where the return-free store "
    "volume dominates. Two aggregations on the same item key + one "
    "null-tolerant join; the ratio is a rounded division guarded by "
    "NULLIF.",
)
def tpcds_q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    y96 = lineitem.filter(_in_years("l_shipdate", 1996))
    returned = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("r_orderkey"))
        .distinct()
    )
    qty = F.col("l_quantity").cast("long")
    ss = (
        y96.filter(F.col("l_linestatus") == "F")
        .join(returned, F.col("l_orderkey") == F.col("r_orderkey"), "left_anti")
        .groupBy(F.col("l_partkey").alias("item"))
        .agg(F.sum(qty).alias("ss_qty"), F.sum(_cents()).alias("ss_amt"))
    )
    os_ = (
        y96.filter(F.col("l_linestatus") == "O")
        .groupBy(F.col("l_partkey").alias("o_item"))
        .agg(F.sum(qty).alias("other_qty"), F.sum(_cents()).alias("other_amt"))
    )
    return (
        ss.join(os_, F.col("item") == F.col("o_item"), "left")
        .select(
            "item",
            "ss_qty",
            "ss_amt",
            F.coalesce("other_qty", F.lit(0)).alias("other_qty"),
            dround(
                F.col("ss_qty")
                / F.nullif(F.coalesce("other_qty", F.lit(0)), F.lit(0)),
                4,
            ).alias("qty_ratio"),
        )
        .filter(2 * F.col("ss_qty") > F.col("other_qty"))
        .orderBy("item")
    )


# --------------------------------------------------------------------------
# q80 — three-channel sales/returns/profit ROLLUP union (q80.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q80",
    oracle=f"""
    WITH per_chan AS (
      SELECT CASE l_linestatus WHEN 'F' THEN 'store channel'
                               ELSE 'catalog channel' END AS channel,
             p_brand AS id,
             SUM(CASE WHEN l_returnflag <> 'R'
                      THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      ELSE 0 END) AS sales_cents,
             SUM(CASE WHEN l_returnflag = 'R'
                      THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      ELSE 0 END) AS returns_cents,
             SUM(CASE WHEN l_returnflag <> 'R'
                      THEN {_NET_CENTS_SQL} ELSE 0 END) AS profit_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE year(l_shipdate) = 1996
      GROUP BY 1, 2)
    SELECT channel, id,
           CAST(SUM(sales_cents) AS BIGINT) AS sales,
           CAST(SUM(returns_cents) AS BIGINT) AS returns,
           CAST(SUM(profit_cents) AS BIGINT) AS profit
    FROM per_chan
    GROUP BY ROLLUP (channel, id)
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    """,
    doc="TPC-DS q80 shape (tpcds_3.2/q80.sql: per-channel CTEs of sales / "
    "returns / net profit unioned then ROLLUP(channel, id)): channel "
    "slices from linestatus computed in one fact pass of conditional "
    "cent sums, re-aggregated under rollup(channel, brand) for channel "
    "and grand totals. The rollup runs over the per-(channel, brand) "
    "aggregate — constant-factor grouping-set expansion, no second "
    "fact shuffle.",
)
def tpcds_q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    cents = _cents()
    is_ret = F.col("l_returnflag") == "R"
    per_chan = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.when(F.col("l_linestatus") == "F", "store channel")
            .otherwise("catalog channel")
            .alias("channel"),
            F.col("p_brand").alias("id"),
        )
        .agg(
            F.sum(F.when(~is_ret, cents).otherwise(F.lit(0))).alias("sales_cents"),
            F.sum(F.when(is_ret, cents).otherwise(F.lit(0))).alias("returns_cents"),
            F.sum(F.when(~is_ret, _net_cents()).otherwise(F.lit(0))).alias(
                "profit_cents"
            ),
        )
    )
    return (
        per_chan.rollup("channel", "id")
        .agg(
            F.sum("sales_cents").alias("sales"),
            F.sum("returns_cents").alias("returns"),
            F.sum("profit_cents").alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# q32 — excess discount vs 1.3x correlated per-item average (q32.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q32",
    oracle="""
    WITH win AS (
      SELECT l.l_partkey,
             CAST(ROUND(l.l_extendedprice * l.l_discount * 100) AS BIGINT)
               AS disc_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        AND l.l_shipdate >= DATE '1996-03-18'
        AND l.l_shipdate < DATE '1996-06-16'),
    item_avg AS (
      SELECT l_partkey, SUM(disc_cents) AS sum_cents, COUNT(*) AS cnt
      FROM win GROUP BY 1)
    SELECT CAST(SUM(w.disc_cents) AS BIGINT) AS excess_discount_cents
    FROM win w JOIN item_avg a ON w.l_partkey = a.l_partkey
    WHERE 10 * w.disc_cents * a.cnt > 13 * a.sum_cents
    """,
    doc="TPC-DS q32 shape (tpcds_3.2/q32.sql: 'excess discount amount' — "
    "sum of discounts exceeding 1.3x the item's own 90-day average, "
    "correlated scalar subquery over the same scan): the subquery "
    "decorrelates to a per-item aggregate joined back to the windowed "
    "scan; the 1.3x threshold is integer cross-multiplication "
    "(10*disc*cnt > 13*sum) over discount cents — exact on both "
    "engines. Brand + date-range filters push into the scans.",
)
def tpcds_q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    disc_cents = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 100
    ).cast("long")
    win = (
        lineitem.filter(_date_range("l_shipdate", "1996-03-18", "1996-06-16"))
        .join(
            F.broadcast(part.filter(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_partkey", disc_cents.alias("disc_cents"))
    )
    item_avg = win.groupBy(F.col("l_partkey").alias("k")).agg(
        F.sum("disc_cents").alias("sum_cents"), F.count("*").alias("cnt")
    )
    return (
        win.join(item_avg, F.col("l_partkey") == F.col("k"))
        .filter(10 * F.col("disc_cents") * F.col("cnt") > 13 * F.col("sum_cents"))
        .agg(F.sum("disc_cents").alias("excess_discount_cents"))
    )


# --------------------------------------------------------------------------
# q41 — distinct names via correlated attribute-combination count (q41.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q41",
    oracle="""
    SELECT DISTINCT i1.p_name AS product_name
    FROM part i1
    WHERE i1.p_partkey BETWEEN 100 AND 900
      AND (SELECT COUNT(*) FROM part i2
           WHERE i2.p_brand = i1.p_brand
             AND ((i2.p_type = 'PROMO'   AND i2.p_size BETWEEN 1 AND 15)
               OR (i2.p_type = 'ECONOMY' AND i2.p_size BETWEEN 20 AND 35))
          ) > 0
    ORDER BY product_name
    """,
    doc="TPC-DS q41 shape (tpcds_3.2/q41.sql: distinct product names where "
    "a correlated count over the SAME item table — matching manufacturer "
    "plus a deep OR-nest of category/color/units/size combinations — is "
    "positive): correlated count(*) > 0 over the part self-reference "
    "reduces to a left-semi self-join on brand against the "
    "attribute-qualified subset; the OR-nest stays a pure pushable scan "
    "predicate. Dimension-only query — no fact table at all.",
)
def tpcds_q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    qual = part.filter(
        ((F.col("p_type") == "PROMO") & F.col("p_size").between(1, 15))
        | ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(20, 35))
    ).select(F.col("p_brand").alias("q_brand"))
    return (
        part.filter(F.col("p_partkey").between(100, 900))
        .join(F.broadcast(qual), F.col("p_brand") == F.col("q_brand"), "left_semi")
        .select(F.col("p_name").alias("product_name"))
        .distinct()
        .orderBy("product_name")
    )


# --------------------------------------------------------------------------
# q45 — OR of an IN-list and a correlated item-subset membership (q45.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q45",
    oracle="""
    WITH qual_items AS (
      SELECT p_partkey FROM part WHERE p_brand IN ('Brand#5', 'Brand#7'))
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sales_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE year(l.l_shipdate) = 1996
      AND (n.n_name IN ('NATION_2', 'NATION_4', 'NATION_6')
           OR l.l_partkey IN (SELECT p_partkey FROM qual_items))
    GROUP BY 1 ORDER BY nation
    """,
    doc="TPC-DS q45 shape (tpcds_3.2/q45.sql: web sales by zip/county "
    "where the zip prefix is in a literal list OR the item is in a "
    "correlated item-id subset): a disjunction of a dimension IN-list "
    "and a subquery membership — not semi-joinable directly, so Spark "
    "plans the membership as a broadcast LEFT join marker and filters "
    "on (in_list OR marker IS NOT NULL), preserving exactly the "
    "original's OR semantics without a cartesian rewrite.",
)
def tpcds_q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "part"
    )
    qual = part.filter(F.col("p_brand").isin("Brand#5", "Brand#7")).select(
        F.col("p_partkey").alias("q_partkey"), F.lit(1).alias("q_hit")
    )
    return (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(qual), F.col("l_partkey") == F.col("q_partkey"), "left")
        .filter(
            F.col("n_name").isin("NATION_2", "NATION_4", "NATION_6")
            | F.col("q_hit").isNotNull()
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_cents()).alias("sales_cents"))
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# q48 — single sum over an OR of segment x price-band combos (q48.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q48",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE year(l.l_shipdate) = 1996
      AND ((c.c_mktsegment = 'BUILDING'
            AND l.l_extendedprice BETWEEN 30000 AND 60000)
        OR (c.c_mktsegment = 'MACHINERY'
            AND l.l_extendedprice BETWEEN 10000 AND 40000)
        OR (c.c_mktsegment = 'AUTOMOBILE'
            AND l.l_extendedprice BETWEEN 50000 AND 90000))
    """,
    doc="TPC-DS q48 shape (tpcds_3.2/q48.sql: one sum(ss_quantity) under "
    "an OR of three (marital status x education x price band) demographic "
    "combos): market-segment x price-band disjunction over the "
    "order/customer join — a single scalar aggregate whose predicate "
    "cannot be factored into one pushable conjunct; the per-band price "
    "bounds still prune via the derived min/max envelope.",
)
def tpcds_q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer = _t(spark, sf_dir, "lineitem", "orders", "customer")
    seg = F.col("c_mktsegment")
    price = F.col("l_extendedprice")
    return (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((seg == "BUILDING") & price.between(30000, 60000))
            | ((seg == "MACHINERY") & price.between(10000, 40000))
            | ((seg == "AUTOMOBILE") & price.between(50000, 90000))
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
    )


# --------------------------------------------------------------------------
# q61 — promotional share of revenue from two scalar aggregates (q61.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q61",
    oracle="""
    SELECT promo.cents AS promotions, total.cents AS total,
           ROUND(promo.cents * 100.0 / total.cents, 4) AS promo_pct
    FROM (SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE year(l.l_shipdate) = 1996
            AND o.o_orderpriority IN ('1-URGENT', '2-HIGH')) promo,
         (SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                 AS BIGINT) AS cents
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE year(l.l_shipdate) = 1996) total
    """,
    doc="TPC-DS q61 shape (tpcds_3.2/q61.sql: promotional sales over total "
    "sales x100, two seven-way star-join scalar subqueries cross-joined "
    "into one ratio row): priority classes stand in for promo channels; "
    "Spark computes both numerator and denominator in ONE conditional "
    "pass over the joined scan (the two-subquery form would scan the "
    "fact twice), then emits the rounded percentage.",
)
def tpcds_q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    cents = _cents()
    is_promo = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    agged = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(
            F.sum(F.when(is_promo, cents)).alias("promotions"),
            F.sum(cents).alias("total"),
        )
    )
    return agged.select(
        "promotions",
        "total",
        dround(F.col("promotions") * 100.0 / F.col("total"), 4).alias("promo_pct"),
    )


# --------------------------------------------------------------------------
# q66 — twelve-month sales/quantity pivot per warehouse (q66.sql)
# --------------------------------------------------------------------------
_MONTHS = [
    "jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec",
]


@query(
    "tpcds_q66",
    oracle="""
    SELECT n.n_name AS warehouse, {cols}
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE year(l.l_shipdate) = 1996
    GROUP BY 1 ORDER BY warehouse
    """.format(
        cols=", ".join(
            f"CAST(SUM(CASE WHEN month(l.l_shipdate) = {m} THEN "
            f"CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) ELSE 0 END) "
            f"AS BIGINT) AS {name}_sales, "
            f"CAST(SUM(CASE WHEN month(l.l_shipdate) = {m} THEN "
            f"CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) "
            f"AS {name}_qty"
            for m, name in enumerate(_MONTHS, start=1)
        )
    ),
    doc="TPC-DS q66 shape (tpcds_3.2/q66.sql: per-warehouse 12-month "
    "sales pivot — jan_sales..dec_sales plus per-sq-ft variants, "
    "union of two ship-carrier CTEs re-aggregated): 24 conditional "
    "month aggregates (12 cent sums + 12 quantity sums) per supplier "
    "nation in one fact pass — the widest single-aggregate row in the "
    "corpus, exercising codegen'd multi-aggregate combine.",
)
def tpcds_q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    cents = _cents()
    qty = F.col("l_quantity").cast("long")
    moy = F.month("l_shipdate")
    aggs = []
    for m, name in enumerate(_MONTHS, start=1):
        aggs.append(
            F.sum(F.when(moy == m, cents).otherwise(F.lit(0))).alias(f"{name}_sales")
        )
        aggs.append(
            F.sum(F.when(moy == m, qty).otherwise(F.lit(0))).alias(f"{name}_qty")
        )
    return (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("warehouse"))
        .agg(*aggs)
        .orderBy("warehouse")
    )


# --------------------------------------------------------------------------
# q69 — demographics of store-only customers (EXISTS + NOT EXISTS) (q69.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q69",
    oracle="""
    WITH store_c AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderstatus = 'F' AND year(o_orderdate) = 1996),
    other_c AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderstatus IN ('O', 'P') AND year(o_orderdate) = 1996)
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM store_c s WHERE s.o_custkey = c.c_custkey)
      AND NOT EXISTS (SELECT 1 FROM other_c o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1, 2 ORDER BY nation, segment
    """,
    doc="TPC-DS q69 shape (tpcds_3.2/q69.sql: demographic counts of "
    "customers with a store purchase but NO web and NO catalog purchase "
    "in the window — EXISTS + two NOT EXISTS): the q35 complement — "
    "the store set becomes a broadcast left-semi join and the "
    "web/catalog set a broadcast left-ANTI join on the same customer "
    "key, then a dimension-only group-count.",
)
def tpcds_q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    y96 = orders.filter(_in_years("o_orderdate", 1996))
    store_c = (
        y96.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )
    other_c = (
        y96.filter(F.col("o_orderstatus").isin("O", "P"))
        .select(F.col("o_custkey").alias("x_custkey"))
        .distinct()
    )
    return (
        customer.join(
            F.broadcast(store_c), F.col("c_custkey") == store_c["o_custkey"], "left_semi"
        )
        .join(
            F.broadcast(other_c), F.col("c_custkey") == F.col("x_custkey"), "left_anti"
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("cnt"))
        .orderBy("nation", "segment")
    )


# --------------------------------------------------------------------------
# q76 — union-all of marker-row channel scans with literal columns (q76.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q76",
    oracle="""
    SELECT channel, col_name, d_year, d_qoy, p_type,
           CAST(COUNT(*) AS BIGINT) AS sales_cnt,
           CAST(SUM(cents) AS BIGINT) AS sales_cents
    FROM (
      SELECT 'store' AS channel, 'l_discount' AS col_name,
             year(l.l_shipdate) AS d_year, quarter(l.l_shipdate) AS d_qoy,
             p.p_type AS p_type,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_linestatus = 'F' AND l.l_discount = 0
      UNION ALL
      SELECT 'web' AS channel, 'l_tax' AS col_name,
             year(l.l_shipdate) AS d_year, quarter(l.l_shipdate) AS d_qoy,
             p.p_type AS p_type,
             CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_linestatus = 'O' AND l.l_tax = 0) u
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY channel, col_name, d_year, d_qoy, p_type
    """,
    doc="TPC-DS q76 shape (tpcds_3.2/q76.sql: union-all of three channel "
    "scans keeping rows whose dimension fk IS NULL, literal channel / "
    "column-name discriminator columns, grouped counts): zero-discount "
    "and zero-tax rows stand in for the null-fk markers (the testdata "
    "has no null keys); each branch carries its literal discriminators "
    "through the union into one grouped count/sum — the plan shape that "
    "stresses union-all widening plus aggregation over mixed literal "
    "and scan columns.",
)
def tpcds_q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")

    def branch(status: str, channel: str, col_name: str, marker) -> DataFrame:
        return (
            lineitem.filter((F.col("l_linestatus") == status) & marker)
            .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
            .select(
                F.lit(channel).alias("channel"),
                F.lit(col_name).alias("col_name"),
                F.year("l_shipdate").alias("d_year"),
                F.quarter("l_shipdate").alias("d_qoy"),
                F.col("p_type").alias("p_type"),
                _cents().alias("cents"),
            )
        )

    u = branch("F", "store", "l_discount", F.col("l_discount") == 0).unionByName(
        branch("O", "web", "l_tax", F.col("l_tax") == 0)
    )
    return (
        u.groupBy("channel", "col_name", "d_year", "d_qoy", "p_type")
        .agg(F.count("*").alias("sales_cnt"), F.sum("cents").alias("sales_cents"))
        .orderBy("channel", "col_name", "d_year", "d_qoy", "p_type")
    )


# --------------------------------------------------------------------------
# q12 — revenue share within class via a windowed ratio (q12.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q12",
    oracle="""
    WITH rev AS (
      SELECT p.p_type AS class, p.p_brand AS brand,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= DATE '1996-02-01'
        AND l.l_shipdate < DATE '1996-03-03'
      GROUP BY 1, 2)
    SELECT class, brand, cents,
           ROUND(cents * 100.0 / SUM(cents) OVER (PARTITION BY class), 4)
             AS revenue_ratio
    FROM rev ORDER BY class, revenue_ratio DESC, brand
    """,
    doc="TPC-DS q12 shape (tpcds_3.2/q12.sql: 30-day web revenue per item, "
    "revenueratio = item revenue x100 over the class total via "
    "sum-over-partition window): brand revenue share within its part "
    "type — one fact aggregation, one window over the aggregate, ratio "
    "as a rounded division of exact cent sums (the window SUM of longs "
    "is association-free).",
)
def tpcds_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    rev = (
        lineitem.filter(_date_range("l_shipdate", "1996-02-01", "1996-03-03"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_type").alias("class"), F.col("p_brand").alias("brand"))
        .agg(F.sum(_cents()).alias("cents"))
    )
    share = Window.partitionBy("class")
    return (
        rev.select(
            "class",
            "brand",
            "cents",
            dround(F.col("cents") * 100.0 / F.sum("cents").over(share), 4).alias(
                "revenue_ratio"
            ),
        )
        .orderBy("class", F.col("revenue_ratio").desc(), "brand")
    )


# --------------------------------------------------------------------------
# q30 — customers returning >1.2x their nation's average (q30.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q30",
    oracle="""
    WITH ctr AS (
      SELECT n.n_name AS nation, o.o_custkey AS custkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS ret_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R' AND year(l.l_shipdate) = 1996
      GROUP BY 1, 2),
    nation_avg AS (
      SELECT nation, SUM(ret_cents) AS s, COUNT(*) AS k
      FROM ctr GROUP BY nation)
    SELECT c.c_custkey AS custkey, c.c_name AS c_name,
           ctr.nation AS nation, ctr.ret_cents AS ret_cents
    FROM ctr
    JOIN nation_avg a ON ctr.nation = a.nation
    JOIN customer c ON ctr.custkey = c.c_custkey
    WHERE 10 * ctr.ret_cents * a.k > 12 * a.s
    ORDER BY custkey
    """,
    doc="TPC-DS q30 shape (tpcds_3.2/q30.sql: web returns per customer per "
    "state, keep customers whose return total exceeds 1.2x their "
    "state's average, resolve customer attributes): returns aggregated "
    "per (nation, customer), nation averages as a broadcastable "
    "aggregate-of-aggregate, the 1.2x test as integer "
    "cross-multiplication (10*ret*k > 12*sum) — the q1 pattern at "
    "customer grain with attribute resolution.",
)
def tpcds_q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    ctr = (
        lineitem.filter((F.col("l_returnflag") == "R") & _in_years("l_shipdate", 1996))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_custkey").alias("custkey"))
        .agg(F.sum(_cents()).alias("ret_cents"))
    )
    nation_avg = ctr.groupBy(F.col("nation").alias("na_nation")).agg(
        F.sum("ret_cents").alias("s"), F.count("*").alias("k")
    )
    return (
        ctr.join(F.broadcast(nation_avg), F.col("nation") == F.col("na_nation"))
        .filter(10 * F.col("ret_cents") * F.col("k") > 12 * F.col("s"))
        .join(
            customer.select("c_custkey", "c_name"),
            F.col("custkey") == F.col("c_custkey"),
        )
        .select(F.col("c_custkey").alias("custkey"), "c_name", "nation", "ret_cents")
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# q42 / q52 — month-of-year star aggregates ordered by revenue (q42/q52.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q42",
    oracle="""
    SELECT year(l.l_shipdate) AS d_year, p.p_type AS category,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1996-11-01'
      AND l.l_shipdate < DATE '1996-12-01'
    GROUP BY 1, 2 ORDER BY cents DESC, d_year, category
    """,
    doc="TPC-DS q42 shape (tpcds_3.2/q42.sql: category revenue for one "
    "month-of-year, ordered by revenue desc): the minimal dated star "
    "aggregate — one broadcast dim join, one grouped sum, the month "
    "filter pushed to the scan as a raw range.",
)
def tpcds_q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        lineitem.filter(_in_month("l_shipdate", 1996, 11))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").alias("d_year"), F.col("p_type").alias("category"))
        .agg(F.sum(_cents()).alias("cents"))
        .orderBy(F.col("cents").desc(), "d_year", "category")
    )


@query(
    "tpcds_q52",
    oracle="""
    SELECT year(l.l_shipdate) AS d_year, p.p_brand AS brand,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1996-11-01'
      AND l.l_shipdate < DATE '1996-12-01'
    GROUP BY 1, 2 ORDER BY d_year, cents DESC, brand
    """,
    doc="TPC-DS q52 shape (tpcds_3.2/q52.sql: brand revenue for one "
    "month-of-year, ordered year then revenue desc): q42 at brand "
    "grain with the original's ordering.",
)
def tpcds_q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        lineitem.filter(_in_month("l_shipdate", 1996, 11))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").alias("d_year"), F.col("p_brand").alias("brand"))
        .agg(F.sum(_cents()).alias("cents"))
        .orderBy("d_year", F.col("cents").desc(), "brand")
    )


# --------------------------------------------------------------------------
# q89 — monthly sales deviating from the yearly average (q89.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q89",
    oracle="""
    WITH v1 AS (
      SELECT p.p_type AS category, p.p_brand AS brand, n.n_name AS store,
             month(l.l_shipdate) AS d_moy,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE year(l.l_shipdate) = 1996
        AND p.p_type IN ('PROMO', 'STANDARD', 'ECONOMY')
      GROUP BY 1, 2, 3, 4)
    SELECT category, brand, store, d_moy, sum_cents,
           ROUND(AVG(sum_cents) OVER (PARTITION BY category, brand, store)
                 / 100, 2) AS avg_monthly_sales
    FROM v1
    QUALIFY AVG(sum_cents) OVER (PARTITION BY category, brand, store) > 0
      AND abs(sum_cents
              - AVG(sum_cents) OVER (PARTITION BY category, brand, store)) * 10
          > AVG(sum_cents) OVER (PARTITION BY category, brand, store)
    ORDER BY category, brand, store, d_moy
    """,
    doc="TPC-DS q89 shape (tpcds_3.2/q89.sql: monthly sales per "
    "category/brand/store vs the AVG-over-partition, keeping months "
    "deviating >10%): the q57 family without the neighbor self-joins — "
    "one fact aggregation, one partition-average window, deviation test "
    "multiplied through by 10 against exact cent sums (window AVG of "
    "longs is a deterministic double division).",
)
def tpcds_q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    v1 = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(
            F.broadcast(part.filter(F.col("p_type").isin("PROMO", "STANDARD", "ECONOMY"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("p_type").alias("category"),
            F.col("p_brand").alias("brand"),
            F.col("n_name").alias("store"),
            F.month("l_shipdate").alias("d_moy"),
        )
        .agg(F.sum(_cents()).alias("sum_cents"))
    )
    grp = Window.partitionBy("category", "brand", "store")
    avg_m = F.avg("sum_cents").over(grp)
    return (
        v1.withColumn("avg_raw", avg_m)
        .filter(
            (F.col("avg_raw") > 0)
            & (F.abs(F.col("sum_cents") - F.col("avg_raw")) * 10 > F.col("avg_raw"))
        )
        .select(
            "category",
            "brand",
            "store",
            "d_moy",
            "sum_cents",
            dround(F.col("avg_raw") / 100, 2).alias("avg_monthly_sales"),
        )
        .orderBy("category", "brand", "store", "d_moy")
    )


# --------------------------------------------------------------------------
# q96 — scalar count under a time-slot/band filter (q96.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q96",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= DATE '1996-06-01'
      AND l.l_shipdate < DATE '1996-07-01'
      AND l.l_quantity BETWEEN 20 AND 40
      AND o.o_orderpriority = '1-URGENT'
    """,
    doc="TPC-DS q96 shape (tpcds_3.2/q96.sql: count of store sales in one "
    "half-hour time slot at one store under a household-demographic "
    "filter): a pure selectivity benchmark — month slot + quantity band "
    "+ priority filter, one count, every predicate pushable.",
)
def tpcds_q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    return (
        lineitem.filter(
            _in_month("l_shipdate", 1996, 6) & F.col("l_quantity").between(20, 40)
        )
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(F.count("*").alias("cnt"))
    )


# --------------------------------------------------------------------------
# q8 — sales restricted to an intersected qualifier set (q8.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q8",
    oracle="""
    WITH preferred AS (
      SELECT n.n_name AS nation
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE c.c_acctbal > 7500
      GROUP BY 1 HAVING COUNT(*) > 10
      INTERSECT
      SELECT unnest(['NATION_1','NATION_3','NATION_5','NATION_7','NATION_9',
                     'NATION_11','NATION_13','NATION_15']) AS nation)
    SELECT sn.n_name AS store_nation,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS net_cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE year(l.l_shipdate) = 1996
      AND sn.n_name IN (SELECT nation FROM preferred)
    GROUP BY 1 ORDER BY store_nation
    """,
    doc="TPC-DS q8 shape (tpcds_3.2/q8.sql: store net profit for stores "
    "whose zip prefix falls in the INTERSECTION of a literal zip list "
    "and zips of >10 preferred customers): the qualifier is a set "
    "INTERSECT between a literal list and a HAVING-count aggregate, "
    "then a semi filter on the star's store dimension. Spark: the "
    "intersect runs on two tiny nation sets and broadcasts into a "
    "left-semi join — the fact table never shuffles for qualification.",
)
def tpcds_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation, customer = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "customer"
    )
    literal = spark.createDataFrame(
        [(f"NATION_{i}",) for i in (1, 3, 5, 7, 9, 11, 13, 15)], ["nation"]
    )
    counted = (
        customer.filter(F.col("c_acctbal") > 7500)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") > 10)
        .select("nation")
    )
    preferred = counted.intersect(literal)
    return (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(preferred), F.col("n_name") == F.col("nation"), "left_semi"
        )
        .groupBy(F.col("n_name").alias("store_nation"))
        .agg(F.sum(_cents()).alias("net_cents"))
        .orderBy("store_nation")
    )


# --------------------------------------------------------------------------
# q27 — three-level ROLLUP of four averages (q27.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q27",
    oracle="""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment, p.p_type AS category,
           ROUND(SUM(CAST(l.l_quantity AS BIGINT)) * 1.0 / COUNT(*), 4)
             AS agg1,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) * 1.0
                 / (COUNT(*) * 100), 4) AS agg2,
           ROUND(SUM(CAST(ROUND(l.l_discount * 10000) AS BIGINT)) * 1.0
                 / (COUNT(*) * 10000), 4) AS agg3,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) * 1.0 / (COUNT(*) * 100), 4) AS agg4
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE year(l.l_shipdate) = 1996 AND c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment, p.p_type)
    ORDER BY nation NULLS FIRST, segment NULLS FIRST, category NULLS FIRST
    """,
    doc="TPC-DS q27 shape (tpcds_3.2/q27.sql: rollup(i_item_id, s_state) of "
    "four demographic-filtered averages over the store star): a "
    "THREE-level rollup (nation, segment, category) of four integer-sum "
    "averages — q18's two-level pattern one level deeper, doubling the "
    "grouping-set expansion while still one fact shuffle.",
)
def tpcds_q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "part"
    )
    joined = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    cnt = F.count("*")
    return (
        joined.rollup(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.col("p_type").alias("category"),
        )
        .agg(
            dround(F.sum(F.col("l_quantity").cast("long")) / cnt, 4).alias("agg1"),
            dround(F.sum(_cents()) / (cnt * 100), 4).alias("agg2"),
            dround(
                F.sum(F.round(F.col("l_discount") * 10000).cast("long"))
                / (cnt * 10000),
                4,
            ).alias("agg3"),
            dround(F.sum(_net_cents()) / (cnt * 100), 4).alias("agg4"),
        )
        .orderBy(
            F.col("nation").asc_nulls_first(),
            F.col("segment").asc_nulls_first(),
            F.col("category").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# q37 — price-band items with bounded monthly volume, channel semi (q37.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q37",
    oracle="""
    WITH vol AS (
      SELECT l_partkey FROM lineitem
      WHERE l_shipdate >= DATE '1996-05-01' AND l_shipdate < DATE '1996-07-01'
      GROUP BY l_partkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) BETWEEN 100 AND 500)
    SELECT DISTINCT p.p_partkey AS item, p.p_name AS item_name,
           CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS price_cents
    FROM part p
    JOIN vol v ON p.p_partkey = v.l_partkey
    WHERE p.p_retailprice BETWEEN 930 AND 970
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_linestatus = 'O'
                    AND year(l.l_shipdate) = 1996)
    ORDER BY item
    """,
    doc="TPC-DS q37 shape (tpcds_3.2/q37.sql: distinct item id/name/price "
    "for items in a price band whose inventory stayed between 100 and "
    "500 over 60 days, sold through catalog): the volume band is a "
    "HAVING range on a quantity aggregate (both bounds), the channel "
    "requirement a left-semi join, output a distinct dimension "
    "projection — a qualifier-heavy dimension query whose fact work is "
    "two aggregated/semi passes.",
)
def tpcds_q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    vol = (
        lineitem.filter(_date_range("l_shipdate", "1996-05-01", "1996-07-01"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q").between(100, 500))
        .select("l_partkey")
    )
    sold_o = (
        lineitem.filter((F.col("l_linestatus") == "O") & _in_years("l_shipdate", 1996))
        .select(F.col("l_partkey").alias("o_partkey"))
        .distinct()
    )
    return (
        part.filter(F.col("p_retailprice").between(930, 970))
        .join(F.broadcast(vol), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .join(F.broadcast(sold_o), F.col("p_partkey") == F.col("o_partkey"), "left_semi")
        .select(
            F.col("p_partkey").alias("item"),
            F.col("p_name").alias("item_name"),
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        )
        .distinct()
        .orderBy("item")
    )


# --------------------------------------------------------------------------
# q58 — items selling equally across all three channels (q58.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q58",
    oracle="""
    WITH per_chan AS (
      SELECT l.l_partkey AS item, o.o_orderstatus AS chan,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE year(l.l_shipdate) = 1996
      GROUP BY 1, 2),
    pivoted AS (
      SELECT item,
             CAST(SUM(CASE WHEN chan = 'F' THEN cents ELSE 0 END)
                  AS BIGINT) AS ss,
             CAST(SUM(CASE WHEN chan = 'O' THEN cents ELSE 0 END)
                  AS BIGINT) AS cs,
             CAST(SUM(CASE WHEN chan = 'P' THEN cents ELSE 0 END)
                  AS BIGINT) AS ws,
             CAST(COUNT(DISTINCT chan) AS BIGINT) AS nchan
      FROM per_chan GROUP BY item)
    SELECT item, ss AS store_cents, cs AS catalog_cents, ws AS web_cents,
           ROUND((ss + cs + ws) / 300.0, 4) AS average
    FROM pivoted
    WHERE nchan = 3
      AND 10 * 3 * ss BETWEEN 9 * (ss + cs + ws) AND 11 * (ss + cs + ws)
      AND 10 * 3 * cs BETWEEN 9 * (ss + cs + ws) AND 11 * (ss + cs + ws)
      AND 10 * 3 * ws BETWEEN 9 * (ss + cs + ws) AND 11 * (ss + cs + ws)
    ORDER BY item
    """,
    doc="TPC-DS q58 shape (tpcds_3.2/q58.sql: items whose store, catalog "
    "and web revenue each sit within 10% of the three-channel average "
    "for one day): three channel CTEs collapse to one conditional pivot "
    "per item; each 'within [0.9, 1.1] x average' test is an integer "
    "cross-multiplication (30*c between 9*total and 11*total) over cent "
    "sums — exact on both engines, no division anywhere.",
)
def tpcds_q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    cents = _cents()
    per = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(
            orders.select("o_orderkey", "o_orderstatus"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_partkey").alias("item"))
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", cents).otherwise(F.lit(0))).alias("ss"),
            F.sum(F.when(F.col("o_orderstatus") == "O", cents).otherwise(F.lit(0))).alias("cs"),
            F.sum(F.when(F.col("o_orderstatus") == "P", cents).otherwise(F.lit(0))).alias("ws"),
            F.countDistinct("o_orderstatus").alias("nchan"),
        )
    )
    total = F.col("ss") + F.col("cs") + F.col("ws")
    within = lambda c: (10 * 3 * c >= 9 * total) & (10 * 3 * c <= 11 * total)
    return (
        per.filter(
            (F.col("nchan") == 3)
            & within(F.col("ss"))
            & within(F.col("cs"))
            & within(F.col("ws"))
        )
        .select(
            "item",
            F.col("ss").alias("store_cents"),
            F.col("cs").alias("catalog_cents"),
            F.col("ws").alias("web_cents"),
            dround(total / 300.0, 4).alias("average"),
        )
        .orderBy("item")
    )


# --------------------------------------------------------------------------
# q3 — month-of-year brand revenue across all years (q3.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q3",
    oracle="""
    SELECT year(l.l_shipdate) AS d_year, p.p_brand AS brand,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE month(l.l_shipdate) = 12 AND p.p_size = 25
    GROUP BY 1, 2 ORDER BY d_year, cents DESC, brand
    """,
    doc="TPC-DS q3 shape (tpcds_3.2/q3.sql: every-December brand revenue "
    "for one manufacturer across all years): the month-of-year filter "
    "spans years, so the Spark side expresses it as an OR of per-year "
    "December ranges (parquet pushes Or(And(ge,lt),...) — month(col)=12 "
    "alone would prune nothing), semantically identical over the data's "
    "1995-2001 domain.",
)
def tpcds_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    decembers = functools.reduce(
        lambda a, b: a | b, [_in_month("l_shipdate", y, 12) for y in range(1995, 2002)]
    )
    return (
        lineitem.filter(decembers)
        .join(F.broadcast(part.filter(F.col("p_size") == 25)), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("l_shipdate").alias("d_year"), F.col("p_brand").alias("brand"))
        .agg(F.sum(_cents()).alias("cents"))
        .orderBy("d_year", F.col("cents").desc(), "brand")
    )


# --------------------------------------------------------------------------
# q15 — zip/state/price OR-qualified quarterly catalog sales (q15.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q15",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sales_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1996-04-01'
      AND (n.n_name IN ('NATION_2', 'NATION_8', 'NATION_14')
           OR c.c_mktsegment IN ('FURNITURE', 'HOUSEHOLD')
           OR l.l_extendedprice > 80000)
    GROUP BY 1 ORDER BY nation
    """,
    doc="TPC-DS q15 shape (tpcds_3.2/q15.sql: quarterly catalog sales by "
    "zip where zip-prefix in list OR state in list OR sale > $500): the "
    "three-way OR of dimension and measure predicates over the customer "
    "star, grouped by geography — only the date range is pushable; the "
    "OR evaluates post-join exactly as the original.",
)
def tpcds_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    return (
        lineitem.filter(_date_range("l_shipdate", "1996-01-01", "1996-04-01"))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(
            F.col("n_name").isin("NATION_2", "NATION_8", "NATION_14")
            | F.col("c_mktsegment").isin("FURNITURE", "HOUSEHOLD")
            | (F.col("l_extendedprice") > 80000)
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_cents()).alias("sales_cents"))
        .orderBy("nation")
    )


# --------------------------------------------------------------------------
# q20 — revenue share within size class (q20.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q20",
    oracle="""
    WITH rev AS (
      SELECT p.p_size AS class, p.p_brand AS brand,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_linestatus = 'O'
        AND l.l_shipdate >= DATE '1996-02-01'
        AND l.l_shipdate < DATE '1996-03-03'
        AND p.p_size IN (5, 10, 15, 20)
      GROUP BY 1, 2)
    SELECT CAST(class AS BIGINT) AS class, brand, cents,
           ROUND(cents * 100.0 / SUM(cents) OVER (PARTITION BY class), 4)
             AS revenue_ratio
    FROM rev ORDER BY class, revenue_ratio DESC, brand
    """,
    doc="TPC-DS q20 shape (tpcds_3.2/q20.sql: 30-day catalog revenue per "
    "item within selected categories, revenueratio over the class "
    "total): q12's window-share pattern on the catalog channel with an "
    "IN-list class filter — ratio of exact cent sums via "
    "sum-over-partition.",
)
def tpcds_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    rev = (
        lineitem.filter(
            (F.col("l_linestatus") == "O")
            & _date_range("l_shipdate", "1996-02-01", "1996-03-03")
        )
        .join(
            F.broadcast(part.filter(F.col("p_size").isin(5, 10, 15, 20))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_size").cast("long").alias("class"), F.col("p_brand").alias("brand"))
        .agg(F.sum(_cents()).alias("cents"))
    )
    share = Window.partitionBy("class")
    return rev.select(
        "class",
        "brand",
        "cents",
        dround(F.col("cents") * 100.0 / F.sum("cents").over(share), 4).alias(
            "revenue_ratio"
        ),
    ).orderBy("class", F.col("revenue_ratio").desc(), "brand")


# --------------------------------------------------------------------------
# q26 — catalog demographic star of four averages (q26.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q26",
    oracle="""
    SELECT p.p_brand AS brand,
           ROUND(SUM(CAST(l.l_quantity AS BIGINT)) * 1.0 / COUNT(*), 4)
             AS agg1,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) * 1.0
                 / (COUNT(*) * 100), 4) AS agg2,
           ROUND(SUM(CAST(ROUND(l.l_discount * 10000) AS BIGINT)) * 1.0
                 / (COUNT(*) * 10000), 4) AS agg3,
           ROUND(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                     AS BIGINT)) * 1.0 / (COUNT(*) * 100), 4) AS agg4
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_linestatus = 'O' AND year(l.l_shipdate) = 1996
      AND c.c_mktsegment = 'AUTOMOBILE'
    GROUP BY 1 ORDER BY brand
    """,
    doc="TPC-DS q26 shape (tpcds_3.2/q26.sql: catalog_sales demographic "
    "star, four averages per item under gender/marital/education and "
    "promotion filters): the q7 pattern on the 'O' channel with a "
    "segment filter — four integer-sum averages per brand, one fact "
    "shuffle, dims broadcast.",
)
def tpcds_q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "part"
    )
    cnt = F.count("*")
    return (
        lineitem.filter((F.col("l_linestatus") == "O") & _in_years("l_shipdate", 1996))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            dround(F.sum(F.col("l_quantity").cast("long")) / cnt, 4).alias("agg1"),
            dround(F.sum(_cents()) / (cnt * 100), 4).alias("agg2"),
            dround(
                F.sum(F.round(F.col("l_discount") * 10000).cast("long")) / (cnt * 10000), 4
            ).alias("agg3"),
            dround(F.sum(_net_cents()) / (cnt * 100), 4).alias("agg4"),
        )
        .orderBy("brand")
    )


# --------------------------------------------------------------------------
# q40 — before/after net sales around a pivot date per warehouse (q40.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q40",
    oracle="""
    SELECT n.n_name AS warehouse, p.p_brand AS item,
           CAST(SUM(CASE WHEN l.l_shipdate < DATE '1996-07-01'
                    THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                              * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
             AS sales_before,
           CAST(SUM(CASE WHEN l.l_shipdate >= DATE '1996-07-01'
                    THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                              * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
             AS sales_after
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_returnflag <> 'R'
      AND p.p_retailprice BETWEEN 920 AND 980
      AND l.l_shipdate BETWEEN DATE '1996-06-01' AND DATE '1996-07-31'
    GROUP BY 1, 2 ORDER BY warehouse, item
    """,
    doc="TPC-DS q40 shape (tpcds_3.2/q40.sql: net-of-returns catalog sales "
    "per warehouse-item 30 days either side of a pivot date, item price "
    "band): q21's pivot-date pattern over MONEY net of returned rows "
    "(returnflag exclusion standing in for the catalog_returns "
    "null-extension) — two conditional cent sums, price band pushed to "
    "the part scan.",
)
def tpcds_q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, nation, part = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "part"
    )
    pivot = F.lit("1996-07-01").cast("date")
    net = _net_cents()
    return (
        lineitem.filter(
            (F.col("l_returnflag") != "R")
            & F.col("l_shipdate").between(
                F.lit("1996-06-01").cast("date"), F.lit("1996-07-31").cast("date")
            )
        )
        .join(
            F.broadcast(part.filter(F.col("p_retailprice").between(920, 980))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("warehouse"), F.col("p_brand").alias("item"))
        .agg(
            F.sum(F.when(F.col("l_shipdate") < pivot, net).otherwise(F.lit(0))).alias(
                "sales_before"
            ),
            F.sum(F.when(F.col("l_shipdate") >= pivot, net).otherwise(F.lit(0))).alias(
                "sales_after"
            ),
        )
        .orderBy("warehouse", "item")
    )


# --------------------------------------------------------------------------
# q53 — quarterly brand sales vs partition average (q53.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q53",
    oracle="""
    WITH v1 AS (
      SELECT p.p_brand AS brand, quarter(l.l_shipdate) AS d_qoy,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE year(l.l_shipdate) = 1996
        AND p.p_type IN ('LARGE', 'MEDIUM', 'SMALL')
      GROUP BY 1, 2)
    SELECT brand, d_qoy, sum_cents,
           ROUND(AVG(sum_cents) OVER (PARTITION BY brand) / 100, 2)
             AS avg_quarterly_sales
    FROM v1
    QUALIFY AVG(sum_cents) OVER (PARTITION BY brand) > 0
      AND abs(sum_cents - AVG(sum_cents) OVER (PARTITION BY brand)) * 10
          > AVG(sum_cents) OVER (PARTITION BY brand)
    ORDER BY brand, d_qoy
    """,
    doc="TPC-DS q53 shape (tpcds_3.2/q53.sql: quarterly manager sales vs "
    "the AVG-over-partition, keeping >10% deviations): the q89 family at "
    "quarter grain with an item-type filter — one aggregation, one "
    "partition-average window, deviation via multiply-through.",
)
def tpcds_q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    v1 = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(
            F.broadcast(part.filter(F.col("p_type").isin("LARGE", "MEDIUM", "SMALL"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"), F.quarter("l_shipdate").alias("d_qoy"))
        .agg(F.sum(_cents()).alias("sum_cents"))
    )
    grp = Window.partitionBy("brand")
    return (
        v1.withColumn("avg_raw", F.avg("sum_cents").over(grp))
        .filter(
            (F.col("avg_raw") > 0)
            & (F.abs(F.col("sum_cents") - F.col("avg_raw")) * 10 > F.col("avg_raw"))
        )
        .select(
            "brand",
            "d_qoy",
            "sum_cents",
            dround(F.col("avg_raw") / 100, 2).alias("avg_quarterly_sales"),
        )
        .orderBy("brand", "d_qoy")
    )


# --------------------------------------------------------------------------
# q55 — single-month brand revenue, revenue-desc order (q55.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q55",
    oracle="""
    SELECT p.p_brand AS brand,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS ext_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1997-08-01'
      AND l.l_shipdate < DATE '1997-09-01'
      AND p.p_size BETWEEN 10 AND 20
    GROUP BY 1 ORDER BY ext_cents DESC, brand
    """,
    doc="TPC-DS q55 shape (tpcds_3.2/q55.sql: brand revenue for one "
    "month/manager, ordered by revenue desc): the q52 pattern on a "
    "different month with a size-band manager stand-in.",
)
def tpcds_q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        lineitem.filter(_in_month("l_shipdate", 1997, 8))
        .join(
            F.broadcast(part.filter(F.col("p_size").between(10, 20))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum(_cents()).alias("ext_cents"))
        .orderBy(F.col("ext_cents").desc(), "brand")
    )


# --------------------------------------------------------------------------
# q62 — ship-lag buckets per (warehouse, ship mode) (q62.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q62",
    oracle="""
    SELECT n.n_name AS warehouse, o.o_orderpriority AS ship_mode,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS d31_60,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS d61_90,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 91 AND 120 THEN 1 ELSE 0 END) AS BIGINT)
             AS d91_120,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120_plus
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE year(l.l_shipdate) = 1996
    GROUP BY 1, 2 ORDER BY warehouse, ship_mode
    """,
    doc="TPC-DS q62 shape (tpcds_3.2/q62.sql: web ship-lag buckets per "
    "(warehouse, ship mode, web site)): q50's latency histogram at the "
    "finer (warehouse nation, order priority) grain — priority stands "
    "in for ship mode, five conditional counts, one fact shuffle on the "
    "composite grouping key.",
)
def tpcds_q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation"
    )
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def bucket(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("warehouse"),
            F.col("o_orderpriority").alias("ship_mode"),
        )
        .agg(
            bucket(lag <= 30).alias("d30"),
            bucket(lag.between(31, 60)).alias("d31_60"),
            bucket(lag.between(61, 90)).alias("d61_90"),
            bucket(lag.between(91, 120)).alias("d91_120"),
            bucket(lag > 120).alias("d120_plus"),
        )
        .orderBy("warehouse", "ship_mode")
    )


# --------------------------------------------------------------------------
# q73 — order-size band frequent buyers (q73.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q73",
    oracle="""
    WITH sized AS (
      SELECT o.o_custkey, l.l_orderkey, COUNT(*) AS n_lines
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE year(o.o_orderdate) = 1996
      GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 4)
    SELECT c.c_name AS c_name, c.c_mktsegment AS segment,
           s.l_orderkey AS orderkey, s.n_lines AS n_lines
    FROM sized s JOIN customer c ON s.o_custkey = c.c_custkey
    ORDER BY c_name, orderkey
    """,
    doc="TPC-DS q73 shape (tpcds_3.2/q73.sql: tickets with 1-5 items per "
    "household under demographic filters, resolved to customer names): "
    "q34's frequency-band pattern at ORDER grain (line count per order "
    "instead of orders per month) — a HAVING band on the per-order "
    "aggregate joined back to the customer dimension.",
)
def tpcds_q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer = _t(spark, sf_dir, "lineitem", "orders", "customer")
    sized = (
        lineitem.join(
            orders.filter(_in_years("o_orderdate", 1996)).select(
                "o_orderkey", "o_custkey"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey", "l_orderkey")
        .agg(F.count("*").alias("n_lines"))
        .filter(F.col("n_lines").between(2, 4))
    )
    return (
        sized.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            F.col("c_mktsegment").alias("segment"),
            F.col("l_orderkey").alias("orderkey"),
            "n_lines",
        )
        .orderBy("c_name", "orderkey")
    )


# --------------------------------------------------------------------------
# q74 — year-over-year quantity-growth comparison (q74.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q74",
    oracle="""
    WITH year_total AS (
      SELECT o.o_custkey AS customer_id, year(l.l_shipdate) AS dyear,
             l.l_linestatus AS channel,
             SUM(CAST(l.l_quantity AS BIGINT)) AS year_total
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE year(l.l_shipdate) IN (1996, 1997)
      GROUP BY 1, 2, 3)
    SELECT c.c_custkey AS customer_id, c.c_name AS customer_name
    FROM year_total t_s_1 JOIN year_total t_s_2
      ON t_s_2.customer_id = t_s_1.customer_id
    JOIN year_total t_w_1 ON t_w_1.customer_id = t_s_1.customer_id
    JOIN year_total t_w_2 ON t_w_2.customer_id = t_s_1.customer_id
    JOIN customer c ON c.c_custkey = t_s_1.customer_id
    WHERE t_s_1.channel = 'F' AND t_s_1.dyear = 1996
      AND t_s_2.channel = 'F' AND t_s_2.dyear = 1997
      AND t_w_1.channel = 'O' AND t_w_1.dyear = 1996
      AND t_w_2.channel = 'O' AND t_w_2.dyear = 1997
      AND t_s_1.year_total > 0 AND t_w_1.year_total > 0
      AND t_w_2.year_total * t_s_1.year_total
          > t_s_2.year_total * t_w_1.year_total
    ORDER BY customer_id
    """,
    doc="TPC-DS q74 shape (tpcds_3.2/q74.sql: q4's four-way year_total "
    "self-join over QUANTITY totals instead of dollar totals): same "
    "one-pass conditional pivot + integer cross-multiplied growth "
    "comparison, demonstrating the CTE fold is measure-agnostic.",
)
def tpcds_q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer = _t(spark, sf_dir, "lineitem", "orders", "customer")
    qty = F.col("l_quantity").cast("long")
    yr = F.year("l_shipdate")

    def tot(status: str, year: int):
        return F.sum(F.when((F.col("l_linestatus") == status) & (yr == year), qty))

    pivoted = (
        lineitem.filter(_in_years("l_shipdate", 1996, 1997))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            tot("F", 1996).alias("s1"),
            tot("F", 1997).alias("s2"),
            tot("O", 1996).alias("w1"),
            tot("O", 1997).alias("w2"),
        )
        .filter(
            (F.col("s1") > 0)
            & (F.col("w1") > 0)
            & F.col("s2").isNotNull()
            & F.col("w2").isNotNull()
            & (F.col("w2") * F.col("s1") > F.col("s2") * F.col("w1"))
        )
    )
    return (
        pivoted.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
        )
        .orderBy("customer_id")
    )


# --------------------------------------------------------------------------
# q81 — catalog returns vs 1.2x the state average (q81.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q81",
    oracle="""
    WITH ctr AS (
      SELECT n.n_name AS nation, o.o_custkey AS custkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                 AS BIGINT)) AS BIGINT) AS ret_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'A' AND year(l.l_shipdate) = 1997
      GROUP BY 1, 2),
    nation_avg AS (
      SELECT nation, SUM(ret_cents) AS s, COUNT(*) AS k FROM ctr GROUP BY 1)
    SELECT c.c_custkey AS custkey, c.c_name AS c_name,
           c.c_mktsegment AS segment, ctr.nation AS nation,
           ctr.ret_cents AS ret_cents
    FROM ctr
    JOIN nation_avg a ON ctr.nation = a.nation
    JOIN customer c ON ctr.custkey = c.c_custkey
    WHERE 10 * ctr.ret_cents * a.k > 12 * a.s
    ORDER BY custkey
    """,
    doc="TPC-DS q81 shape (tpcds_3.2/q81.sql: catalog returns per customer "
    "vs 1.2x the state average, customer + address attributes resolved): "
    "q30's pattern on the 'A' return class for 1997 with NET cents and "
    "an extra resolved attribute — integer cross-multiplied threshold, "
    "broadcast aggregate-of-aggregate.",
)
def tpcds_q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    ctr = (
        lineitem.filter((F.col("l_returnflag") == "A") & _in_years("l_shipdate", 1997))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_custkey").alias("custkey"))
        .agg(F.sum(_net_cents()).alias("ret_cents"))
    )
    nation_avg = ctr.groupBy(F.col("nation").alias("na")).agg(
        F.sum("ret_cents").alias("s"), F.count("*").alias("k")
    )
    return (
        ctr.join(F.broadcast(nation_avg), F.col("nation") == F.col("na"))
        .filter(10 * F.col("ret_cents") * F.col("k") > 12 * F.col("s"))
        .join(
            customer.select("c_custkey", "c_name", "c_mktsegment"),
            F.col("custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_custkey").alias("custkey"),
            "c_name",
            F.col("c_mktsegment").alias("segment"),
            "nation",
            "ret_cents",
        )
        .orderBy("custkey")
    )


# --------------------------------------------------------------------------
# q86 — ROLLUP + rank-within-parent, no qualifying subquery (q86.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q86",
    oracle="""
    WITH rolled AS (
      SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS total_cents,
             p.p_type AS category, p.p_brand AS class,
             GROUPING(p.p_type) + GROUPING(p.p_brand) AS lochierarchy,
             CASE WHEN GROUPING(p.p_brand) = 0 THEN p.p_type END AS parent
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_linestatus = 'O' AND year(l.l_shipdate) = 1997
      GROUP BY ROLLUP (p.p_type, p.p_brand))
    SELECT total_cents, category, class, lochierarchy,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY lochierarchy, parent
             ORDER BY total_cents DESC, category NULLS FIRST,
                      class NULLS FIRST) AS BIGINT) AS rank_within_parent
    FROM rolled
    ORDER BY lochierarchy DESC, category NULLS FIRST, class NULLS FIRST,
             rank_within_parent
    """,
    doc="TPC-DS q86 shape (tpcds_3.2/q86.sql: rollup(i_category, i_class) "
    "of web net paid with GROUPING-bit hierarchy and rank within each "
    "parent): q70 without the qualifying subquery — the pure "
    "rollup+rank-within-parent pattern over the item hierarchy.",
)
def tpcds_q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    rolled = (
        lineitem.filter((F.col("l_linestatus") == "O") & _in_years("l_shipdate", 1997))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_type").alias("category"),
            F.col("p_brand").alias("class"),
            _cents().alias("cents"),
        )
        .rollup("category", "class")
        .agg(
            F.sum("cents").alias("total_cents"),
            (F.grouping("category") + F.grouping("class")).alias("lochierarchy"),
            F.when(F.grouping("class") == 0, F.col("category")).alias("parent"),
        )
    )
    rank_w = Window.partitionBy("lochierarchy", "parent").orderBy(
        F.col("total_cents").desc(),
        F.col("category").asc_nulls_first(),
        F.col("class").asc_nulls_first(),
    )
    return (
        rolled.select(
            "total_cents",
            "category",
            "class",
            "lochierarchy",
            F.row_number().over(rank_w).cast("bigint").alias("rank_within_parent"),
        )
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("category").asc_nulls_first(),
            F.col("class").asc_nulls_first(),
            "rank_within_parent",
        )
    )


# --------------------------------------------------------------------------
# q5 — sales-and-returns union rows rolled up by channel (q5.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q5",
    oracle="""
    WITH salesreturns AS (
      SELECT CASE l.l_linestatus WHEN 'F' THEN 'store channel'
                                 ELSE 'catalog channel' END AS channel,
             p.p_brand AS id,
             CASE WHEN l.l_returnflag <> 'R'
                  THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                  ELSE 0 END AS sales_cents,
             CASE WHEN l.l_returnflag = 'R'
                  THEN CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                  ELSE 0 END AS returns_cents,
             CASE WHEN l.l_returnflag <> 'R'
                  THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                            AS BIGINT)
                  ELSE -CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT) END AS profit_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= DATE '1996-08-01'
        AND l.l_shipdate < DATE '1996-08-15')
    SELECT channel, id,
           CAST(SUM(sales_cents) AS BIGINT) AS sales,
           CAST(SUM(returns_cents) AS BIGINT) AS returns,
           CAST(SUM(profit_cents) AS BIGINT) AS profit
    FROM salesreturns
    GROUP BY ROLLUP (channel, id)
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    """,
    doc="TPC-DS q5 shape (tpcds_3.2/q5.sql: per-channel salesreturns CTEs "
    "— sales rows and return rows unioned as SIGNED measure rows — "
    "rolled up by (channel, id) over a 14-day window): returns carry "
    "negative profit at ROW level before aggregation (q80 aggregates "
    "per-channel first; q5 unions raw signed rows), then "
    "rollup(channel, brand).",
)
def tpcds_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    cents = _cents()
    net = _net_cents()
    is_ret = F.col("l_returnflag") == "R"
    rows = (
        lineitem.filter(_date_range("l_shipdate", "1996-08-01", "1996-08-15"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.when(F.col("l_linestatus") == "F", "store channel")
            .otherwise("catalog channel")
            .alias("channel"),
            F.col("p_brand").alias("id"),
            F.when(~is_ret, cents).otherwise(F.lit(0)).alias("sales_cents"),
            F.when(is_ret, cents).otherwise(F.lit(0)).alias("returns_cents"),
            F.when(~is_ret, net).otherwise(-net).alias("profit_cents"),
        )
    )
    return (
        rows.rollup("channel", "id")
        .agg(
            F.sum("sales_cents").alias("sales"),
            F.sum("returns_cents").alias("returns"),
            F.sum("profit_cents").alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# q33 — three-channel union re-aggregated by manufacturer (q33.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q33",
    oracle="""
    WITH chan AS (
      SELECT o.o_orderstatus AS status, p.p_brand AS manufact,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS total
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO'
        AND l.l_shipdate >= DATE '1996-03-01'
        AND l.l_shipdate < DATE '1996-04-01'
      GROUP BY 1, 2)
    SELECT manufact, CAST(SUM(total) AS BIGINT) AS total_sales
    FROM chan GROUP BY manufact
    ORDER BY total_sales DESC, manufact
    """,
    doc="TPC-DS q33 shape (tpcds_3.2/q33.sql: per-channel manufacturer "
    "totals for one category/month, union-all of the three channel "
    "CTEs re-aggregated by manufacturer): the three channel scans "
    "collapse to one per-(channel, brand) aggregate re-grouped across "
    "channels; category + month filters push to the scans.",
)
def tpcds_q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    chan = (
        lineitem.filter(_in_month("l_shipdate", 1996, 3))
        .join(orders.select("o_orderkey", "o_orderstatus"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(part.filter(F.col("p_type") == "PROMO")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("o_orderstatus").alias("status"), F.col("p_brand").alias("manufact"))
        .agg(F.sum(_cents()).alias("total"))
    )
    return (
        chan.groupBy("manufact")
        .agg(F.sum("total").alias("total_sales"))
        .orderBy(F.col("total_sales").desc(), "manufact")
    )


# --------------------------------------------------------------------------
# q92 — web excess discount vs 1.3x correlated average (q92.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q92",
    oracle="""
    WITH win AS (
      SELECT l.l_partkey,
             CAST(ROUND(l.l_extendedprice * l.l_discount * 100) AS BIGINT)
               AS disc_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE o.o_orderstatus = 'P'
        AND p.p_brand IN ('Brand#4', 'Brand#6', 'Brand#8')
        AND l.l_shipdate >= DATE '1996-05-01'
        AND l.l_shipdate < DATE '1996-07-30'),
    item_avg AS (
      SELECT l_partkey, SUM(disc_cents) AS sum_cents, COUNT(*) AS cnt
      FROM win GROUP BY 1)
    SELECT CAST(SUM(w.disc_cents) AS BIGINT) AS excess_discount_cents
    FROM win w JOIN item_avg a ON w.l_partkey = a.l_partkey
    WHERE 10 * w.disc_cents * a.cnt > 13 * a.sum_cents
    """,
    doc="TPC-DS q92 shape (tpcds_3.2/q92.sql: web 'excess discount amount' "
    "vs 1.3x the item's 90-day average): q32's correlated-scalar "
    "decorrelation restricted to the 'P' (web) channel via the orders "
    "join — same integer cross-multiplied threshold.",
)
def tpcds_q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    disc_cents = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 100
    ).cast("long")
    win = (
        lineitem.filter(_date_range("l_shipdate", "1996-05-01", "1996-07-30"))
        .join(
            orders.filter(F.col("o_orderstatus") == "P").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(part.filter(F.col("p_brand").isin("Brand#4", "Brand#6", "Brand#8"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select("l_partkey", disc_cents.alias("disc_cents"))
    )
    item_avg = win.groupBy(F.col("l_partkey").alias("k")).agg(
        F.sum("disc_cents").alias("sum_cents"), F.count("*").alias("cnt")
    )
    return (
        win.join(item_avg, F.col("l_partkey") == F.col("k"))
        .filter(10 * F.col("disc_cents") * F.col("cnt") > 13 * F.col("sum_cents"))
        .agg(F.sum("disc_cents").alias("excess_discount_cents"))
    )


# --------------------------------------------------------------------------
# q94 — web orders shipped by multiple suppliers, never returned (q94.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q94",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS order_count,
           CAST(SUM(CAST(ROUND(l1.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS total_ship_cents,
           CAST(SUM(CAST(ROUND(l1.l_extendedprice * l1.l_discount * 100)
                    AS BIGINT)) AS BIGINT) AS total_disc_cents
    FROM lineitem l1
    JOIN orders o ON l1.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'P'
      AND o.o_orderdate >= DATE '1997-02-01'
      AND o.o_orderdate < DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_returnflag = 'R')
    """,
    doc="TPC-DS q94 shape (tpcds_3.2/q94.sql: count/ship-cost/profit of "
    "web orders shipped from more than one warehouse with no return, "
    "60-day window): q16's EXISTS/NOT-EXISTS pattern on the 'P' (web) "
    "channel with a second summed measure — semi + anti self-joins on "
    "the order key, distinct-count on top.",
)
def tpcds_q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    o = orders.filter(
        (F.col("o_orderstatus") == "P")
        & (F.col("o_orderdate") >= F.lit("1997-02-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("date"))
    ).select("o_orderkey")
    l2 = lineitem.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey")
    )
    return (
        lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(l3, F.col("l_orderkey") == F.col("l3_orderkey"), "left_anti")
        .agg(
            F.countDistinct("o_orderkey").alias("order_count"),
            F.sum(_cents()).alias("total_ship_cents"),
            F.sum(
                F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast("long")
            ).alias("total_disc_cents"),
        )
    )


# --------------------------------------------------------------------------
# q99 — ship-lag buckets per (priority, quarter) (q99.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q99",
    oracle="""
    SELECT o.o_orderpriority AS ship_mode, quarter(l.l_shipdate) AS d_qoy,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS d31_60,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS d61_90,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              BETWEEN 91 AND 120 THEN 1 ELSE 0 END) AS BIGINT)
             AS d91_120,
           CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate)
                              > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120_plus
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE year(l.l_shipdate) = 1997 AND o.o_orderstatus = 'O'
    GROUP BY 1, 2 ORDER BY ship_mode, d_qoy
    """,
    doc="TPC-DS q99 shape (tpcds_3.2/q99.sql: catalog ship-lag buckets per "
    "(warehouse, ship mode, call center)): the catalog-channel latency "
    "histogram at (priority, quarter) grain — the q50/q62 family's "
    "third grouping variant, one fact shuffle.",
)
def tpcds_q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))

    def bucket(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    return (
        lineitem.filter(_in_years("l_shipdate", 1997))
        .join(
            orders.filter(F.col("o_orderstatus") == "O").select(
                "o_orderkey", "o_orderdate", "o_orderpriority"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_orderpriority").alias("ship_mode"),
            F.quarter("l_shipdate").alias("d_qoy"),
        )
        .agg(
            bucket(lag <= 30).alias("d30"),
            bucket(lag.between(31, 60)).alias("d31_60"),
            bucket(lag.between(61, 90)).alias("d61_90"),
            bucket(lag.between(91, 120)).alias("d91_120"),
            bucket(lag > 120).alias("d120_plus"),
        )
        .orderBy("ship_mode", "d_qoy")
    )


# --------------------------------------------------------------------------
# q56 / q60 — three-channel union by item attribute (q56.sql / q60.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q56",
    oracle="""
    WITH chan AS (
      SELECT o.o_orderstatus AS status, p.p_name AS item_id,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS total
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_size IN (5, 15, 25, 35, 45)
        AND l.l_shipdate >= DATE '1996-06-01'
        AND l.l_shipdate < DATE '1996-07-01'
      GROUP BY 1, 2)
    SELECT item_id, CAST(SUM(total) AS BIGINT) AS total_sales
    FROM chan GROUP BY item_id
    ORDER BY total_sales, item_id
    """,
    doc="TPC-DS q56 shape (tpcds_3.2/q56.sql: per-channel item totals for "
    "a color list in one month, union-all re-aggregated by item id): "
    "q33's channel-union pattern keyed by item name under a size-list "
    "filter (colors absent from the testdata item dim).",
)
def tpcds_q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    chan = (
        lineitem.filter(_in_month("l_shipdate", 1996, 6))
        .join(orders.select("o_orderkey", "o_orderstatus"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(part.filter(F.col("p_size").isin(5, 15, 25, 35, 45))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("o_orderstatus").alias("status"), F.col("p_name").alias("item_id"))
        .agg(F.sum(_cents()).alias("total"))
    )
    return (
        chan.groupBy("item_id")
        .agg(F.sum("total").alias("total_sales"))
        .orderBy("total_sales", "item_id")
    )


@query(
    "tpcds_q60",
    oracle="""
    WITH chan AS (
      SELECT o.o_orderstatus AS status, p.p_name AS item_id,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS total
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'STANDARD'
        AND l.l_shipdate >= DATE '1997-09-01'
        AND l.l_shipdate < DATE '1997-10-01'
      GROUP BY 1, 2)
    SELECT item_id, CAST(SUM(total) AS BIGINT) AS total_sales
    FROM chan GROUP BY item_id
    ORDER BY item_id, total_sales
    """,
    doc="TPC-DS q60 shape (tpcds_3.2/q60.sql: per-channel item totals for "
    "one category/month, union-all re-aggregated by item id): q33/q56's "
    "pattern with the category filter and the spec's item-id-first "
    "ordering.",
)
def tpcds_q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    chan = (
        lineitem.filter(_in_month("l_shipdate", 1997, 9))
        .join(orders.select("o_orderkey", "o_orderstatus"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(part.filter(F.col("p_type") == "STANDARD")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("o_orderstatus").alias("status"), F.col("p_name").alias("item_id"))
        .agg(F.sum(_cents()).alias("total"))
    )
    return (
        chan.groupBy("item_id")
        .agg(F.sum("total").alias("total_sales"))
        .orderBy("item_id", "total_sales")
    )


# --------------------------------------------------------------------------
# q63 — manager monthly sales vs yearly monthly average (q63.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q63",
    oracle="""
    WITH v1 AS (
      SELECT p.p_size AS manager, month(l.l_shipdate) AS d_moy,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS sum_cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE year(l.l_shipdate) = 1996
        AND ((p.p_type IN ('PROMO', 'STANDARD') AND p.p_brand IN
                ('Brand#1', 'Brand#3', 'Brand#5'))
          OR (p.p_type IN ('LARGE', 'SMALL') AND p.p_brand IN
                ('Brand#2', 'Brand#4', 'Brand#6')))
      GROUP BY 1, 2)
    SELECT CAST(manager AS BIGINT) AS manager, d_moy, sum_cents,
           ROUND(AVG(sum_cents) OVER (PARTITION BY manager) / 100, 2)
             AS avg_monthly_sales
    FROM v1
    QUALIFY AVG(sum_cents) OVER (PARTITION BY manager) > 0
      AND abs(sum_cents - AVG(sum_cents) OVER (PARTITION BY manager)) * 10
          > AVG(sum_cents) OVER (PARTITION BY manager)
    ORDER BY manager, d_moy
    """,
    doc="TPC-DS q63 shape (tpcds_3.2/q63.sql: manager monthly sales vs "
    "their yearly monthly average under a two-branch category/class OR "
    "filter, keeping >10% deviations): the q53/q89 deviation family at "
    "(manager=p_size, month) grain with the spec's OR-of-conjunctions "
    "item filter.",
)
def tpcds_q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    item_f = part.filter(
        (F.col("p_type").isin("PROMO", "STANDARD")
         & F.col("p_brand").isin("Brand#1", "Brand#3", "Brand#5"))
        | (F.col("p_type").isin("LARGE", "SMALL")
           & F.col("p_brand").isin("Brand#2", "Brand#4", "Brand#6"))
    )
    v1 = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(F.broadcast(item_f), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_size").cast("long").alias("manager"),
            F.month("l_shipdate").alias("d_moy"),
        )
        .agg(F.sum(_cents()).alias("sum_cents"))
    )
    grp = Window.partitionBy("manager")
    return (
        v1.withColumn("avg_raw", F.avg("sum_cents").over(grp))
        .filter(
            (F.col("avg_raw") > 0)
            & (F.abs(F.col("sum_cents") - F.col("avg_raw")) * 10 > F.col("avg_raw"))
        )
        .select(
            "manager",
            "d_moy",
            "sum_cents",
            dround(F.col("avg_raw") / 100, 2).alias("avg_monthly_sales"),
        )
        .orderBy("manager", "d_moy")
    )


# --------------------------------------------------------------------------
# q82 — store-channel price-band inventory-window items (q82.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q82",
    oracle="""
    WITH vol AS (
      SELECT l_partkey FROM lineitem
      WHERE l_shipdate >= DATE '1997-03-01' AND l_shipdate < DATE '1997-05-01'
      GROUP BY l_partkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) BETWEEN 100 AND 500)
    SELECT DISTINCT p.p_partkey AS item, p.p_name AS item_name,
           CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS price_cents
    FROM part p
    JOIN vol v ON p.p_partkey = v.l_partkey
    WHERE p.p_retailprice BETWEEN 940 AND 990
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_linestatus = 'F'
                    AND year(l.l_shipdate) = 1997)
    ORDER BY item
    """,
    doc="TPC-DS q82 shape (tpcds_3.2/q82.sql: q37's price-band inventory "
    "window qualified through the STORE channel instead of catalog): "
    "same HAVING-band + semi-join composition, 'F' channel, 1997 "
    "window.",
)
def tpcds_q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    vol = (
        lineitem.filter(_date_range("l_shipdate", "1997-03-01", "1997-05-01"))
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q").between(100, 500))
        .select("l_partkey")
    )
    sold_f = (
        lineitem.filter((F.col("l_linestatus") == "F") & _in_years("l_shipdate", 1997))
        .select(F.col("l_partkey").alias("f_partkey"))
        .distinct()
    )
    return (
        part.filter(F.col("p_retailprice").between(940, 990))
        .join(F.broadcast(vol), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .join(F.broadcast(sold_f), F.col("p_partkey") == F.col("f_partkey"), "left_semi")
        .select(
            F.col("p_partkey").alias("item"),
            F.col("p_name").alias("item_name"),
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        )
        .distinct()
        .orderBy("item")
    )


# --------------------------------------------------------------------------
# q83 — three-channel equal-share on RETURNED items (q83.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q83",
    oracle="""
    WITH per_chan AS (
      SELECT l.l_partkey AS item, o.o_orderstatus AS chan,
             SUM(CAST(l.l_quantity AS BIGINT)) AS qty
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R' AND year(l.l_shipdate) = 1996
      GROUP BY 1, 2),
    pivoted AS (
      SELECT item,
             CAST(SUM(CASE WHEN chan = 'F' THEN qty ELSE 0 END)
                  AS BIGINT) AS sr,
             CAST(SUM(CASE WHEN chan = 'O' THEN qty ELSE 0 END)
                  AS BIGINT) AS cr,
             CAST(SUM(CASE WHEN chan = 'P' THEN qty ELSE 0 END)
                  AS BIGINT) AS wr,
             CAST(COUNT(DISTINCT chan) AS BIGINT) AS nchan
      FROM per_chan GROUP BY item)
    SELECT item, sr AS store_returns, cr AS catalog_returns,
           wr AS web_returns,
           ROUND((sr + cr + wr) / 3.0, 4) AS average
    FROM pivoted
    WHERE nchan = 3
      AND 10 * 3 * sr BETWEEN 9 * (sr + cr + wr) AND 11 * (sr + cr + wr)
      AND 10 * 3 * cr BETWEEN 9 * (sr + cr + wr) AND 11 * (sr + cr + wr)
      AND 10 * 3 * wr BETWEEN 9 * (sr + cr + wr) AND 11 * (sr + cr + wr)
    ORDER BY item
    """,
    doc="TPC-DS q83 shape (tpcds_3.2/q83.sql: items whose store, catalog "
    "and web RETURN quantities each sit within 10% of the three-channel "
    "average): q58's equal-share integer cross-multiplication applied "
    "to the returned-quantity slice.",
)
def tpcds_q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    qty = F.col("l_quantity").cast("long")
    per = (
        lineitem.filter((F.col("l_returnflag") == "R") & _in_years("l_shipdate", 1996))
        .join(
            orders.select("o_orderkey", "o_orderstatus"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_partkey").alias("item"))
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", qty).otherwise(F.lit(0))).alias("sr"),
            F.sum(F.when(F.col("o_orderstatus") == "O", qty).otherwise(F.lit(0))).alias("cr"),
            F.sum(F.when(F.col("o_orderstatus") == "P", qty).otherwise(F.lit(0))).alias("wr"),
            F.countDistinct("o_orderstatus").alias("nchan"),
        )
    )
    total = F.col("sr") + F.col("cr") + F.col("wr")
    within = lambda c: (10 * 3 * c >= 9 * total) & (10 * 3 * c <= 11 * total)
    return (
        per.filter(
            (F.col("nchan") == 3) & within(F.col("sr")) & within(F.col("cr")) & within(F.col("wr"))
        )
        .select(
            "item",
            F.col("sr").alias("store_returns"),
            F.col("cr").alias("catalog_returns"),
            F.col("wr").alias("web_returns"),
            dround(total / 3.0, 4).alias("average"),
        )
        .orderBy("item")
    )


# --------------------------------------------------------------------------
# q25 — sale → return → repurchase chain, money aggregates (q25.sql)
# --------------------------------------------------------------------------
_Q25_CHAIN_SQL = """
      l AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice, l.l_discount,
               l.l_returnflag, l.l_linestatus, o.o_custkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE year(l.l_shipdate) = 1996),
      ss AS (SELECT o_custkey AS c, l_partkey AS p,
                    CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT) AS v
             FROM l WHERE l_linestatus = 'F'),
      sr AS (SELECT o_custkey AS c, l_partkey AS p,
                    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v
             FROM l WHERE l_returnflag = 'R'),
      cs AS (SELECT o_custkey AS c, l_partkey AS p,
                    CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT) AS v
             FROM l WHERE l_linestatus = 'O')
"""


@query(
    "tpcds_q25",
    oracle=f"""
    WITH {_Q25_CHAIN_SQL}
    SELECT ss.p AS item,
           CAST(SUM(ss.v) AS BIGINT) AS store_profit_cents,
           CAST(SUM(sr.v) AS BIGINT) AS return_amt_cents,
           CAST(SUM(cs.v) AS BIGINT) AS catalog_profit_cents
    FROM ss
    JOIN sr ON ss.c = sr.c AND ss.p = sr.p
    JOIN cs ON ss.c = cs.c AND ss.p = cs.p
    GROUP BY 1 ORDER BY item
    """,
    doc="TPC-DS q25 shape (tpcds_3.2/q25.sql: store_sales joined to the "
    "same customer-item's store_returns and a later catalog_sales — the "
    "sale -> return -> repurchase chain — with money aggregates per "
    "item/store): the three channel legs join pairwise on the "
    "(customer, item) composite key; each leg's measure is exact cents. "
    "Two keyed shuffles on (customer, item) — the multi-fact chain "
    "plan TPC-DS uses to stress join ordering.",
)
def tpcds_q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    l = lineitem.filter(_in_years("l_shipdate", 1996)).join(
        orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    ss = l.filter(F.col("l_linestatus") == "F").select(
        F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"), _net_cents().alias("ssv")
    )
    sr = l.filter(F.col("l_returnflag") == "R").select(
        F.col("o_custkey").alias("rc"), F.col("l_partkey").alias("rp"), _cents().alias("srv")
    )
    cs = l.filter(F.col("l_linestatus") == "O").select(
        F.col("o_custkey").alias("cc"), F.col("l_partkey").alias("cp"), _net_cents().alias("csv")
    )
    return (
        ss.join(sr, (F.col("c") == F.col("rc")) & (F.col("p") == F.col("rp")))
        .join(cs, (F.col("c") == F.col("cc")) & (F.col("p") == F.col("cp")))
        .groupBy(F.col("p").alias("item"))
        .agg(
            F.sum("ssv").alias("store_profit_cents"),
            F.sum("srv").alias("return_amt_cents"),
            F.sum("csv").alias("catalog_profit_cents"),
        )
        .orderBy("item")
    )


# --------------------------------------------------------------------------
# q29 — sale → return → repurchase chain, quantity aggregates (q29.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q29",
    oracle=f"""
    WITH {_Q25_CHAIN_SQL},
    ssq AS (SELECT o_custkey AS c, l_partkey AS p,
                   CAST(l_quantity AS BIGINT) AS q
            FROM l WHERE l_linestatus = 'F'),
    srq AS (SELECT o_custkey AS c, l_partkey AS p,
                   CAST(l_quantity AS BIGINT) AS q
            FROM l WHERE l_returnflag = 'R'),
    csq AS (SELECT o_custkey AS c, l_partkey AS p,
                   CAST(l_quantity AS BIGINT) AS q
            FROM l WHERE l_linestatus = 'O')
    SELECT ssq.p AS item,
           CAST(SUM(ssq.q) AS BIGINT) AS store_qty,
           CAST(SUM(srq.q) AS BIGINT) AS return_qty,
           CAST(SUM(csq.q) AS BIGINT) AS catalog_qty
    FROM ssq
    JOIN srq ON ssq.c = srq.c AND ssq.p = srq.p
    JOIN csq ON ssq.c = csq.c AND ssq.p = csq.p
    GROUP BY 1 ORDER BY item
    """,
    doc="TPC-DS q29 shape (tpcds_3.2/q29.sql: the q25 chain with QUANTITY "
    "sums per item/store over staggered date windows): same "
    "(customer, item)-keyed three-leg join, integer quantity measures.",
)
def tpcds_q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    l = lineitem.filter(_in_years("l_shipdate", 1996)).join(
        orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    qty = F.col("l_quantity").cast("long")
    ss = l.filter(F.col("l_linestatus") == "F").select(
        F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"), qty.alias("ssq")
    )
    sr = l.filter(F.col("l_returnflag") == "R").select(
        F.col("o_custkey").alias("rc"), F.col("l_partkey").alias("rp"), qty.alias("srq")
    )
    cs = l.filter(F.col("l_linestatus") == "O").select(
        F.col("o_custkey").alias("cc"), F.col("l_partkey").alias("cp"), qty.alias("csq")
    )
    return (
        ss.join(sr, (F.col("c") == F.col("rc")) & (F.col("p") == F.col("rp")))
        .join(cs, (F.col("c") == F.col("cc")) & (F.col("p") == F.col("cp")))
        .groupBy(F.col("p").alias("item"))
        .agg(
            F.sum("ssq").alias("store_qty"),
            F.sum("srq").alias("return_qty"),
            F.sum("csq").alias("catalog_qty"),
        )
        .orderBy("item")
    )


# --------------------------------------------------------------------------
# q71 — three-channel brand revenue by time slot (q71.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q71",
    oracle="""
    WITH chan AS (
      SELECT o.o_orderstatus AS status, p.p_brand AS brand,
             month(l.l_shipdate) AS t_slot,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE year(l.l_shipdate) = 1996 AND p.p_size BETWEEN 20 AND 30
      GROUP BY 1, 2, 3)
    SELECT brand, t_slot, CAST(SUM(cents) AS BIGINT) AS ext_cents
    FROM chan GROUP BY 1, 2
    ORDER BY ext_cents DESC, brand, t_slot
    """,
    doc="TPC-DS q71 shape (tpcds_3.2/q71.sql: brand revenue union across "
    "the three channels bucketed by breakfast/dinner time slots): month "
    "buckets stand in for time-of-day (the testdata has no time dim); "
    "the channel union collapses to one pass re-aggregated by (brand, "
    "slot), ordered revenue-first as the spec does.",
)
def tpcds_q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, part = _t(spark, sf_dir, "lineitem", "orders", "part")
    chan = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(orders.select("o_orderkey", "o_orderstatus"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(part.filter(F.col("p_size").between(20, 30))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.col("o_orderstatus").alias("status"),
            F.col("p_brand").alias("brand"),
            F.month("l_shipdate").alias("t_slot"),
        )
        .agg(F.sum(_cents()).alias("cents"))
    )
    return (
        chan.groupBy("brand", "t_slot")
        .agg(F.sum("cents").alias("ext_cents"))
        .orderBy(F.col("ext_cents").desc(), "brand", "t_slot")
    )


# --------------------------------------------------------------------------
# q77 — per-channel sales FULL OUTER returns, rolled up (q77.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q77",
    oracle="""
    WITH sales AS (
      SELECT l_linestatus AS channel, l_suppkey AS sk,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sales_cents,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                 AS BIGINT)) AS profit_cents
      FROM lineitem
      WHERE l_returnflag <> 'R' AND year(l_shipdate) = 1996
      GROUP BY 1, 2),
    returns_ AS (
      SELECT l_linestatus AS channel, l_suppkey AS sk,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS ret_cents,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                 AS BIGINT)) AS loss_cents
      FROM lineitem
      WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996
      GROUP BY 1, 2)
    SELECT COALESCE(s.channel, r.channel) AS channel,
           COALESCE(s.sk, r.sk) AS id,
           CAST(SUM(COALESCE(s.sales_cents, 0)) AS BIGINT) AS sales,
           CAST(SUM(COALESCE(r.ret_cents, 0)) AS BIGINT) AS returns,
           CAST(SUM(COALESCE(s.profit_cents, 0) - COALESCE(r.loss_cents, 0))
                AS BIGINT) AS profit
    FROM sales s FULL OUTER JOIN returns_ r
      ON s.channel = r.channel AND s.sk = r.sk
    GROUP BY ROLLUP (1, 2)
    ORDER BY channel NULLS FIRST, id NULLS FIRST
    """,
    doc="TPC-DS q77 shape (tpcds_3.2/q77.sql: per-channel sales and "
    "returns aggregated separately, FULL OUTER joined on the entity key, "
    "then rollup(channel, id) of sales/returns/profit): returns may "
    "exist where sales don't and vice versa — the null-extended "
    "combination feeds the rollup through COALESCE, per the spec.",
)
def tpcds_q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    y96 = lineitem.filter(_in_years("l_shipdate", 1996))
    sales = (
        y96.filter(F.col("l_returnflag") != "R")
        .groupBy(F.col("l_linestatus").alias("s_channel"), F.col("l_suppkey").alias("s_sk"))
        .agg(F.sum(_cents()).alias("sales_cents"), F.sum(_net_cents()).alias("profit_cents"))
    )
    rets = (
        y96.filter(F.col("l_returnflag") == "R")
        .groupBy(F.col("l_linestatus").alias("r_channel"), F.col("l_suppkey").alias("r_sk"))
        .agg(F.sum(_cents()).alias("ret_cents"), F.sum(_net_cents()).alias("loss_cents"))
    )
    combined = sales.join(
        rets,
        (F.col("s_channel") == F.col("r_channel")) & (F.col("s_sk") == F.col("r_sk")),
        "full_outer",
    ).select(
        F.coalesce("s_channel", "r_channel").alias("channel"),
        F.coalesce("s_sk", "r_sk").alias("id"),
        F.coalesce("sales_cents", F.lit(0)).alias("sales_c"),
        F.coalesce("ret_cents", F.lit(0)).alias("ret_c"),
        (F.coalesce("profit_cents", F.lit(0)) - F.coalesce("loss_cents", F.lit(0))).alias("profit_c"),
    )
    return (
        combined.rollup("channel", "id")
        .agg(
            F.sum("sales_c").alias("sales"),
            F.sum("ret_c").alias("returns"),
            F.sum("profit_c").alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_first(), F.col("id").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# q91 — returns loss by call center and customer segment (q91.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q91",
    oracle="""
    SELECT n.n_name AS call_center, c.c_mktsegment AS segment,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT)) AS BIGINT) AS net_loss_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND l.l_shipdate >= DATE '1996-11-01'
      AND l.l_shipdate < DATE '1996-12-01'
    GROUP BY 1, 2
    ORDER BY net_loss_cents DESC, call_center, segment
    """,
    doc="TPC-DS q91 shape (tpcds_3.2/q91.sql: catalog returns net loss per "
    "call center for one month, sliced by customer demographic / HH "
    "buckets, ordered by loss desc): supplier nation stands in for the "
    "call center, market segment for the demographic slice — a "
    "two-dimension star aggregate over the returned slice.",
)
def tpcds_q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    return (
        lineitem.filter((F.col("l_returnflag") == "R") & _in_month("l_shipdate", 1996, 11))
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_mktsegment"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("call_center"), F.col("c_mktsegment").alias("segment"))
        .agg(F.sum(_net_cents()).alias("net_loss_cents"))
        .orderBy(F.col("net_loss_cents").desc(), "call_center", "segment")
    )
