"""TPC-DS representative slice re-expressed over the driver testdata schema.

The reference's correctness bar is the TPC-DS 99-query golden corpus
(extensions/spark/kyuubi-spark-connector-tpcds/src/main/resources/kyuubi/
tpcds_3.2/q*.sql, verified by OutputSchemaTPCDSSuite.scala).  The driver
testdata has no TPC-DS tables, so each port keeps the original query's PLAN
SHAPE — the join graph, CTE stack, grouping structure, window usage — on the
TPC-H-ish star schema: fact = lineitem, date dim derived from l_shipdate /
o_orderdate, item → part, store → supplier, demographics → customer.
Each docstring names the original query whose shape it preserves.

Cross-engine determinism rules (same as tpch.py):
- every float aggregate is rounded identically on both sides (dround ↔
  DuckDB ROUND);
- running/cumulative aggregates go through DECIMAL(18,2) so window summation
  is exact and association-independent, cast back to DOUBLE at the end;
- top-k cuts are either rank()-filters (set semantics, order-independent) or
  LIMIT behind a total order on non-null unique keys.

Scale notes (100 TB): every query is a star join over the lineitem fact —
dimension sides are broadcast (explicitly for the fixed-size ones, by AQE
size estimate for part/supplier/customer), so the only big shuffles are the
fact-table aggregations on their grouping keys.  Rollups add a constant
factor (grouping-set expansion), not a new shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _date_range(col: str, lo: str, hi: str):
    """[lo, hi) range predicate on the raw timestamp column.

    Replaces year(col)/month(col)/quarter(col) equality FILTERS: those wrap
    the column in an expression, so parquet predicate pushdown and
    row-group pruning see nothing (PushedFilters: [IsNotNull] only); a
    plain range comparison pushes both bounds to the scan. At 100 TB on a
    date-sorted/z-ordered layout that is the difference between reading
    one year and reading the whole table. NULL semantics are identical
    (both forms are false for NULL)."""
    return (F.col(col) >= F.lit(lo).cast("timestamp_ntz")) & (
        F.col(col) < F.lit(hi).cast("timestamp_ntz")
    )


def _in_years(col: str, y0: int, y1: int | None = None):
    """year(col) BETWEEN y0 AND y1 (inclusive) as a pushable range."""
    return _date_range(col, f"{y0}-01-01", f"{(y1 if y1 is not None else y0) + 1}-01-01")


def _in_month(col: str, y: int, m: int):
    """year(col)=y AND month(col)=m as a pushable range."""
    ny, nm = (y + 1, 1) if m == 12 else (y, m + 1)
    return _date_range(col, f"{y}-{m:02d}-01", f"{ny}-{nm:02d}-01")



# --------------------------------------------------------------------------
# q1 — CTE + correlated average over the CTE + star join (tpcds_3.2/q1.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q1",
    oracle="""
    WITH customer_total_return AS (
      SELECT o.o_custkey AS ctr_customer, l.l_suppkey AS ctr_store,
             ROUND(SUM(l.l_extendedprice), 2) AS ctr_total_return
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R' AND year(l.l_shipdate) = 1996
      GROUP BY o.o_custkey, l.l_suppkey
    )
    SELECT c.c_name AS c_name
    FROM customer_total_return ctr1
    JOIN supplier s ON s.s_suppkey = ctr1.ctr_store
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN customer c ON c.c_custkey = ctr1.ctr_customer
    WHERE n.n_regionkey = 1
      AND ctr1.ctr_total_return > (
        SELECT AVG(ctr2.ctr_total_return) * 1.2
        FROM customer_total_return ctr2
        WHERE ctr2.ctr_store = ctr1.ctr_store)
    ORDER BY c_name
    LIMIT 100
    """,
    doc="TPC-DS q1 shape: returns CTE, correlated avg-per-store subquery "
    "over the same CTE (Catalyst decorrelates to an aggregate+join), "
    "star join back to the customer dim.",
)
def tpcds_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, supplier, nation, customer = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "customer"
    )
    ctr = (
        lineitem.filter(
            (F.col("l_returnflag") == "R") & _in_years("l_shipdate", 1996)
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("o_custkey").alias("ctr_customer"),
            F.col("l_suppkey").alias("ctr_store"),
        )
        .agg(dround(F.sum("l_extendedprice"), 2).alias("ctr_total_return"))
        # shared by the per-store average and the filter side — materialize
        # once (lazy localCheckpoint) instead of recomputing the fact join
        .localCheckpoint(eager=False)
    )
    # Decorrelated form of the per-store average threshold.
    store_avg = ctr.groupBy(F.col("ctr_store").alias("avg_store")).agg(
        (F.avg("ctr_total_return") * 1.2).alias("avg_return")
    )
    return (
        ctr.join(store_avg, F.col("ctr_store") == F.col("avg_store"))
        .filter(F.col("ctr_total_return") > F.col("avg_return"))
        .join(
            supplier.join(
                F.broadcast(nation.filter(F.col("n_regionkey") == 1)),
                F.col("n_nationkey") == F.col("s_nationkey"),
            ),
            F.col("s_suppkey") == F.col("ctr_store"),
        )
        .join(customer, F.col("c_custkey") == F.col("ctr_customer"))
        .select("c_name")
        .orderBy("c_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q2 — union-all channels + day-of-week pivot + week self-join (q2.sql)
# --------------------------------------------------------------------------
_Q2_DAYS = [
    ("Sunday", "sun"),
    ("Monday", "mon"),
    ("Tuesday", "tue"),
    ("Wednesday", "wed"),
    ("Thursday", "thu"),
    ("Friday", "fri"),
    ("Saturday", "sat"),
]


@query(
    "tpcds_q2",
    oracle="""
    WITH wscs AS (
      SELECT l_shipdate AS sold_ts, l_extendedprice AS sales_price
      FROM lineitem WHERE l_linestatus = 'O'
      UNION ALL
      SELECT l_shipdate, l_extendedprice FROM lineitem WHERE l_linestatus = 'F'
    ),
    wswscs AS (
      SELECT year(sold_ts) AS d_year, weekofyear(sold_ts) AS d_week_seq,
             ROUND(SUM(CASE WHEN dayname(sold_ts) = 'Sunday' THEN sales_price END), 2) AS sun_sales,
             ROUND(SUM(CASE WHEN dayname(sold_ts) = 'Monday' THEN sales_price END), 2) AS mon_sales,
             ROUND(SUM(CASE WHEN dayname(sold_ts) = 'Tuesday' THEN sales_price END), 2) AS tue_sales,
             ROUND(SUM(CASE WHEN dayname(sold_ts) = 'Wednesday' THEN sales_price END), 2) AS wed_sales,
             ROUND(SUM(CASE WHEN dayname(sold_ts) = 'Thursday' THEN sales_price END), 2) AS thu_sales,
             ROUND(SUM(CASE WHEN dayname(sold_ts) = 'Friday' THEN sales_price END), 2) AS fri_sales,
             ROUND(SUM(CASE WHEN dayname(sold_ts) = 'Saturday' THEN sales_price END), 2) AS sat_sales
      FROM wscs GROUP BY 1, 2
    )
    SELECT y.d_week_seq AS d_week_seq1,
           ROUND(y.sun_sales / NULLIF(z.sun_sales, 0), 2) AS sun_ratio,
           ROUND(y.mon_sales / NULLIF(z.mon_sales, 0), 2) AS mon_ratio,
           ROUND(y.tue_sales / NULLIF(z.tue_sales, 0), 2) AS tue_ratio,
           ROUND(y.wed_sales / NULLIF(z.wed_sales, 0), 2) AS wed_ratio,
           ROUND(y.thu_sales / NULLIF(z.thu_sales, 0), 2) AS thu_ratio,
           ROUND(y.fri_sales / NULLIF(z.fri_sales, 0), 2) AS fri_ratio,
           ROUND(y.sat_sales / NULLIF(z.sat_sales, 0), 2) AS sat_ratio
    FROM wswscs y JOIN wswscs z
      ON y.d_week_seq = z.d_week_seq AND y.d_year = 1996 AND z.d_year = 1997
    ORDER BY d_week_seq1
    """,
    doc="TPC-DS q2 shape: union-all of two channel scans, per-week "
    "day-of-week pivot (7 conditional sums), year-over-year self-join on "
    "the week sequence, rounded ratios.",
)
def tpcds_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    # The oracle instantiates the weekly pivot CTE twice (once per year)
    # over a two-scan union — four fact scans.  One pass computes all 14
    # conditional day×year sums plus per-year presence flags keyed by week;
    # a week emits a row iff BOTH year groups exist, exactly the oracle's
    # join condition (both channels pass the same l_linestatus IN filter,
    # so the union is just the filtered scan).
    wscs = lineitem.filter(F.col("l_linestatus").isin("O", "F")).select(
        F.col("l_shipdate").alias("sold_ts"),
        F.col("l_extendedprice").alias("sales_price"),
    )
    day = F.date_format("sold_ts", "EEEE")
    yr = F.year("sold_ts")

    def day_sum(label: str, year: int):
        return dround(
            F.sum(F.when((day == label) & (yr == year), F.col("sales_price"))), 2
        )

    pivoted = wscs.groupBy(F.weekofyear("sold_ts").alias("d_week_seq")).agg(
        *[day_sum(label, 1996).alias(f"{pre}_y") for label, pre in _Q2_DAYS],
        *[day_sum(label, 1997).alias(f"{pre}_z") for label, pre in _Q2_DAYS],
        F.max(F.when(yr == 1996, F.lit(1))).alias("in_y"),
        F.max(F.when(yr == 1997, F.lit(1))).alias("in_z"),
    )
    ratio = [
        dround(
            F.col(f"{pre}_y") / F.nullif(F.col(f"{pre}_z"), F.lit(0.0)), 2
        ).alias(f"{pre}_ratio")
        for _, pre in _Q2_DAYS
    ]
    return (
        pivoted.filter(F.col("in_y").isNotNull() & F.col("in_z").isNotNull())
        .select(F.col("d_week_seq").alias("d_week_seq1"), *ratio)
        .orderBy("d_week_seq1")
    )


# --------------------------------------------------------------------------
# q7 — 5-way star join with demographic + promotion filters (q7.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q7",
    oracle="""
    SELECT p.p_brand AS p_brand,
           ROUND(AVG(l.l_quantity), 4) AS agg1,
           ROUND(AVG(l.l_extendedprice), 4) AS agg2,
           ROUND(AVG(l.l_discount), 4) AS agg3,
           ROUND(AVG(l.l_tax), 4) AS agg4
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND (o.o_orderpriority = '5-LOW' OR o.o_orderstatus = 'F')
      AND year(o.o_orderdate) = 1996
    GROUP BY p.p_brand
    ORDER BY p_brand
    LIMIT 100
    """,
    doc="TPC-DS q7 shape: fact × 4 dims star join (demographics filter on "
    "the customer dim, disjunctive promotion-style filter on orders), four "
    "AVG aggregates per item brand.",
)
def tpcds_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "part"
    )
    o = orders.filter(
        _in_years("o_orderdate", 1996)
        & ((F.col("o_orderpriority") == "5-LOW") | (F.col("o_orderstatus") == "F"))
    )
    c = customer.filter(F.col("c_mktsegment") == "BUILDING")
    return (
        lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            dround(F.avg("l_quantity"), 4).alias("agg1"),
            dround(F.avg("l_extendedprice"), 4).alias("agg2"),
            dround(F.avg("l_discount"), 4).alias("agg3"),
            dround(F.avg("l_tax"), 4).alias("agg4"),
        )
        .orderBy("p_brand")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q19 — star join with cross-dim inequality predicate (q19.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q19",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS p_type,
           ROUND(SUM(l.l_extendedprice), 2) AS ext_price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN (SELECT n_nationkey AS cn_key, n_name AS cn_name FROM nation) cn
      ON cn.cn_key = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN (SELECT n_nationkey AS sn_key, n_name AS sn_name FROM nation) sn
      ON sn.sn_key = s.s_nationkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE year(o.o_orderdate) = 1996 AND month(o.o_orderdate) = 11
      AND cn.cn_name <> sn.sn_name
      AND p.p_size <= 20
    GROUP BY p.p_brand, p.p_type
    ORDER BY ext_price DESC, brand, p_type
    LIMIT 100
    """,
    doc="TPC-DS q19 shape: fact × 5 dims with a cross-dimension inequality "
    "(customer nation ≠ supplier nation — the zip-prefix mismatch of the "
    "original), month/year filters, top brands by revenue.",
)
def tpcds_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation, supplier, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "supplier", "part"
    )
    o = orders.filter(
        _in_month("o_orderdate", 1996, 11)
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cn_name")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    return (
        lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .filter(F.col("cn_name") != F.col("sn_name"))
        .join(part.filter(F.col("p_size") <= 20), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("p_brand").alias("brand"), "p_type")
        .agg(dround(F.sum("l_extendedprice"), 2).alias("ext_price"))
        .orderBy(F.col("ext_price").desc(), "brand", "p_type")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q22 — 4-level ROLLUP average over a dated fact window (q22.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q22",
    oracle="""
    SELECT p.p_brand AS p_brand, p.p_type AS p_type,
           CAST(p.p_size AS INT) AS p_size, l.l_returnflag AS ret_flag,
           ROUND(AVG(l.l_quantity), 4) AS qoh,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1996-12-31 23:59:59'
    GROUP BY ROLLUP (p.p_brand, p.p_type, CAST(p.p_size AS INT), l.l_returnflag)
    """,
    doc="TPC-DS q22 shape: 12-month fact window, AVG at every prefix level "
    "of a 4-column rollup hierarchy (brand → type → size → returnflag).",
)
def tpcds_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    base = (
        lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") <= "1996-12-31 23:59:59")
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("int").alias("p_size"),
            F.col("l_returnflag").alias("ret_flag"),
            "l_quantity",
        )
    )
    return base.rollup("p_brand", "p_type", "p_size", "ret_flag").agg(
        dround(F.avg("l_quantity"), 4).alias("qoh"), F.count("*").alias("n")
    )


# --------------------------------------------------------------------------
# q34 — dense grouped count with HAVING band + join back to the dim (q34.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q34",
    oracle="""
    WITH freq AS (
      SELECT o_custkey, year(o_orderdate) AS d_year, month(o_orderdate) AS d_moy,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1, 2, 3
      HAVING COUNT(*) BETWEEN 2 AND 5
    )
    SELECT c.c_name AS c_name, f.d_year AS d_year, f.d_moy AS d_moy,
           f.cnt AS cnt
    FROM freq f JOIN customer c ON c.c_custkey = f.o_custkey
    ORDER BY c_name, d_year, d_moy
    """,
    doc="TPC-DS q34 shape: per-customer-month order frequency, HAVING band "
    "filter on the count, join back to the customer dimension.",
)
def tpcds_q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    freq = (
        orders.groupBy(
            "o_custkey",
            F.year("o_orderdate").alias("d_year"),
            F.month("o_orderdate").alias("d_moy"),
        )
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt").between(2, 5))
    )
    return (
        freq.join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_name", "d_year", "d_moy", "cnt")
        .orderBy("c_name", "d_year", "d_moy")
    )


# --------------------------------------------------------------------------
# q36 — rollup + GROUPING() hierarchy + rank within parent (q36.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q36",
    oracle="""
    SELECT gross_margin, p_type, p_brand, lochierarchy,
           CAST(RANK() OVER (
             PARTITION BY lochierarchy,
                          CASE WHEN g_brand = 0 THEN p_type END
             ORDER BY gross_margin ASC) AS BIGINT) AS rank_within_parent
    FROM (
      SELECT ROUND(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                   / ROUND(SUM(l.l_extendedprice), 2), 6) AS gross_margin,
             p.p_type AS p_type, p.p_brand AS p_brand,
             CAST(GROUPING(p.p_type) + GROUPING(p.p_brand) AS INT) AS lochierarchy,
             CAST(GROUPING(p.p_brand) AS INT) AS g_brand
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey IN (1, 2, 3) AND year(l.l_shipdate) = 1996
      GROUP BY ROLLUP (p.p_type, p.p_brand)
    ) t
    """,
    doc="TPC-DS q36 shape: discounted-margin ratio at every rollup level, "
    "GROUPING()-derived hierarchy depth, rank-within-parent window "
    "partitioned by the grouping level.",
)
def tpcds_q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier = _t(spark, sf_dir, "lineitem", "part", "supplier")
    base = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(
            supplier.filter(F.col("s_nationkey").isin(1, 2, 3)),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )
    agged = base.rollup("p_type", "p_brand").agg(
        dround(
            dround(F.sum(_rev()), 2) / dround(F.sum("l_extendedprice"), 2), 6
        ).alias("gross_margin"),
        (F.grouping("p_type") + F.grouping("p_brand"))
        .cast("int")
        .alias("lochierarchy"),
        F.grouping("p_brand").cast("int").alias("g_brand"),
    )
    w = Window.partitionBy(
        "lochierarchy", F.when(F.col("g_brand") == 0, F.col("p_type"))
    ).orderBy(F.col("gross_margin").asc())
    return agged.select(
        "gross_margin",
        "p_type",
        "p_brand",
        "lochierarchy",
        F.rank().over(w).cast("bigint").alias("rank_within_parent"),
    )


# --------------------------------------------------------------------------
# q38 — three-channel INTERSECT + count (q38.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q38",
    oracle="""
    SELECT COUNT(*) AS n FROM (
      SELECT DISTINCT o.o_custkey, CAST(l.l_shipdate AS DATE) AS d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'N'
      INTERSECT
      SELECT DISTINCT o.o_custkey, CAST(l.l_shipdate AS DATE)
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
      INTERSECT
      SELECT DISTINCT o.o_custkey, CAST(l.l_shipdate AS DATE)
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'A'
    ) t
    """,
    doc="TPC-DS q38 shape: (customer, date) appearing in all three sales "
    "channels, counted. The original (and the oracle) chain two INTERSECTs "
    "— three scans, three distincts, two intersect shuffles; the Spark "
    "plan computes the identical set membership with per-channel presence "
    "flags in ONE aggregation over one scan (a pair is in the intersection "
    "iff all three flags are set), then counts.",
)
def tpcds_q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    flags = (
        lineitem.filter(F.col("l_returnflag").isin("N", "R", "A"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", F.col("l_shipdate").cast("date").alias("d"))
        .agg(
            *[
                F.max(F.when(F.col("l_returnflag") == flag, F.lit(1))).alias(
                    f"in_{flag}"
                )
                for flag in ("N", "R", "A")
            ]
        )
    )
    return flags.filter(
        F.col("in_N").isNotNull()
        & F.col("in_R").isNotNull()
        & F.col("in_A").isNotNull()
    ).agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# q47 — grouped monthly series + window avg/rank + lag/lead self-joins (q47.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q47",
    oracle="""
    WITH v1 AS (
      SELECT p.p_type AS p_type, p.p_brand AS p_brand, s.s_name AS s_name,
             year(l.l_shipdate) AS d_year, month(l.l_shipdate) AS d_moy,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS sum_sales,
             ROUND(AVG(ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)) OVER (
               PARTITION BY p.p_type, p.p_brand, s.s_name, year(l.l_shipdate)), 4)
               AS avg_monthly_sales,
             CAST(RANK() OVER (
               PARTITION BY p.p_type, p.p_brand, s.s_name
               ORDER BY year(l.l_shipdate), month(l.l_shipdate)) AS BIGINT) AS rn
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE year(l.l_shipdate) BETWEEN 1995 AND 1997
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT v1.p_type AS p_type, v1.p_brand AS p_brand, v1.s_name AS s_name,
           v1.d_year AS d_year, v1.d_moy AS d_moy,
           v1.avg_monthly_sales AS avg_monthly_sales,
           v1.sum_sales AS sum_sales,
           v1_lag.sum_sales AS psum, v1_lead.sum_sales AS nsum
    FROM v1
    JOIN v1 v1_lag ON v1.p_type = v1_lag.p_type AND v1.p_brand = v1_lag.p_brand
      AND v1.s_name = v1_lag.s_name AND v1.rn = v1_lag.rn + 1
    JOIN v1 v1_lead ON v1.p_type = v1_lead.p_type AND v1.p_brand = v1_lead.p_brand
      AND v1.s_name = v1_lead.s_name AND v1.rn = v1_lead.rn - 1
    WHERE v1.d_year = 1996 AND v1.avg_monthly_sales > 0
      AND ABS(v1.sum_sales - v1.avg_monthly_sales) / v1.avg_monthly_sales > 0.1
    ORDER BY v1.sum_sales - v1.avg_monthly_sales, nsum,
             p_type, p_brand, s_name, d_moy
    LIMIT 100
    """,
    doc="TPC-DS q47 shape: per-(item,store,month) sales series, yearly-avg "
    "window over the grouped series, rank-as-time-index, neighbors via "
    "rn±1, >10% deviation filter. The original (and the oracle) reach the "
    "neighboring months through two self-joins of the CTE on rn±1; the "
    "Spark plan computes the identical psum/nsum with LAG/LEAD over the "
    "same partition+order — (d_year, d_moy) is unique per partition, so "
    "rank() is a gap-free time index and the window neighbors ARE the "
    "rn±1 rows — turning three recomputations of the grouped series into "
    "one scan + one window pass.",
)
def tpcds_q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier = _t(spark, sf_dir, "lineitem", "part", "supplier")
    grouped = (
        lineitem.filter(_in_years("l_shipdate", 1995, 1997))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            "p_type",
            "p_brand",
            "s_name",
            F.year("l_shipdate").alias("d_year"),
            F.month("l_shipdate").alias("d_moy"),
        )
        .agg(dround(F.sum(_rev()), 2).alias("sum_sales"))
    )
    w_avg = Window.partitionBy("p_type", "p_brand", "s_name", "d_year")
    w_rn = Window.partitionBy("p_type", "p_brand", "s_name").orderBy(
        "d_year", "d_moy"
    )
    v1 = grouped.select(
        "p_type",
        "p_brand",
        "s_name",
        "d_year",
        "d_moy",
        "sum_sales",
        dround(F.avg("sum_sales").over(w_avg), 4).alias("avg_monthly_sales"),
        # LAG/LEAD over the same frame replace the oracle's rn±1 self-joins
        # (identical rows: the time index is gap-free within a partition)
        F.lag("sum_sales").over(w_rn).alias("psum"),
        F.lead("sum_sales").over(w_rn).alias("nsum"),
    )
    return (
        v1.filter(
            (F.col("d_year") == 1996)
            & (F.col("avg_monthly_sales") > 0)
            & (
                F.abs(F.col("sum_sales") - F.col("avg_monthly_sales"))
                / F.col("avg_monthly_sales")
                > 0.1
            )
            # inner rn±1 self-joins kept only rows with both neighbors
            & F.col("psum").isNotNull()
            & F.col("nsum").isNotNull()
        )
        .select(
            "p_type",
            "p_brand",
            "s_name",
            "d_year",
            "d_moy",
            "avg_monthly_sales",
            "sum_sales",
            "psum",
            "nsum",
        )
        .orderBy(
            F.col("sum_sales") - F.col("avg_monthly_sales"),
            "nsum",
            "p_type",
            "p_brand",
            "s_name",
            "d_moy",
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# q51 — dual-channel cumulative sums, full outer join, running max (q51.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q51",
    oracle="""
    WITH web_v1 AS (
      SELECT l.l_partkey AS item_sk, CAST(l.l_shipdate AS DATE) AS d_date,
             SUM(CAST(ROUND(SUM(l.l_extendedprice), 2) AS DECIMAL(18,2))) OVER (
               PARTITION BY l.l_partkey ORDER BY CAST(l.l_shipdate AS DATE)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume_sales
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND year(l.l_shipdate) = 1996
      GROUP BY l.l_partkey, CAST(l.l_shipdate AS DATE)
    ),
    store_v1 AS (
      SELECT l.l_partkey AS item_sk, CAST(l.l_shipdate AS DATE) AS d_date,
             SUM(CAST(ROUND(SUM(l.l_extendedprice), 2) AS DECIMAL(18,2))) OVER (
               PARTITION BY l.l_partkey ORDER BY CAST(l.l_shipdate AS DATE)
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume_sales
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        AND year(l.l_shipdate) = 1996
      GROUP BY l.l_partkey, CAST(l.l_shipdate AS DATE)
    )
    SELECT item_sk, d_date,
           CAST(web_cumulative AS DOUBLE) AS web_cumulative,
           CAST(store_cumulative AS DOUBLE) AS store_cumulative
    FROM (
      SELECT CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk
                  ELSE store.item_sk END AS item_sk,
             CASE WHEN web.d_date IS NOT NULL THEN web.d_date
                  ELSE store.d_date END AS d_date,
             MAX(web.cume_sales) OVER (
               PARTITION BY CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk
                                 ELSE store.item_sk END
               ORDER BY CASE WHEN web.d_date IS NOT NULL THEN web.d_date
                             ELSE store.d_date END
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS web_cumulative,
             MAX(store.cume_sales) OVER (
               PARTITION BY CASE WHEN web.item_sk IS NOT NULL THEN web.item_sk
                                 ELSE store.item_sk END
               ORDER BY CASE WHEN web.d_date IS NOT NULL THEN web.d_date
                             ELSE store.d_date END
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS store_cumulative
      FROM web_v1 web FULL OUTER JOIN store_v1 store
        ON web.item_sk = store.item_sk AND web.d_date = store.d_date
    ) y
    WHERE web_cumulative > store_cumulative
    ORDER BY item_sk, d_date
    """,
    doc="TPC-DS q51 shape: per-channel cumulative revenue (sum-of-sum "
    "window over the grouped series, exact DECIMAL accumulation), full "
    "outer date alignment, running-max crossover filter.",
)
def tpcds_q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    urgent = ("1-URGENT", "2-HIGH")
    is_web = F.col("o_orderpriority").isin(*urgent)

    # One pass computes BOTH channels' daily sums as conditional aggregates;
    # the oracle's dual-CTE + full-outer-join + running-max alignment is
    # equivalent because cumulative sums are monotone: at every (item, date)
    # observed in either channel, the running max of a channel's cumulative
    # series equals that channel's window sum of its (null-skipped) daily
    # sums. 2 scans + FOJ + 4 windows collapse into 1 scan + 2 windows.
    day = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("l_partkey").alias("item_sk"),
            F.col("l_shipdate").cast("date").alias("d_date"),
        )
        .agg(
            dround(F.sum(F.when(is_web, F.col("l_extendedprice"))), 2)
            .cast("decimal(18,2)")
            .alias("web_day"),
            dround(F.sum(F.when(~is_web, F.col("l_extendedprice"))), 2)
            .cast("decimal(18,2)")
            .alias("store_day"),
        )
    )
    cume_w = (
        Window.partitionBy("item_sk")
        .orderBy("d_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        day.select(
            "item_sk",
            "d_date",
            F.sum("web_day").over(cume_w).cast("double").alias("web_cumulative"),
            F.sum("store_day").over(cume_w).cast("double").alias("store_cumulative"),
        )
        .filter(F.col("web_cumulative") > F.col("store_cumulative"))
        .orderBy("item_sk", "d_date")
    )


# --------------------------------------------------------------------------
# q67 — wide rollup + rank-per-category cut (q67.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q67",
    oracle="""
    SELECT * FROM (
      SELECT p_type, p_brand, d_year, d_qoy, d_moy, s_name, sumsales,
             CAST(RANK() OVER (PARTITION BY p_type ORDER BY sumsales DESC)
                  AS BIGINT) AS rk
      FROM (
        SELECT p.p_type AS p_type, p.p_brand AS p_brand,
               year(l.l_shipdate) AS d_year, quarter(l.l_shipdate) AS d_qoy,
               month(l.l_shipdate) AS d_moy, s.s_name AS s_name,
               ROUND(SUM(COALESCE(l.l_extendedprice * l.l_quantity, 0)), 2)
                 AS sumsales
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE year(l.l_shipdate) = 1996
        GROUP BY ROLLUP (p.p_type, p.p_brand, year(l.l_shipdate),
                         quarter(l.l_shipdate), month(l.l_shipdate), s.s_name)
      ) dw1
    ) dw2
    WHERE rk <= 10
    """,
    doc="TPC-DS q67 shape: 6-column rollup of quantity-weighted sales over "
    "a dated window, rank within item category, top-N cut by rank value "
    "(set semantics — no LIMIT, so the result is order-independent).",
)
def tpcds_q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part, supplier = _t(spark, sf_dir, "lineitem", "part", "supplier")
    base = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "p_type",
            "p_brand",
            F.year("l_shipdate").alias("d_year"),
            F.quarter("l_shipdate").alias("d_qoy"),
            F.month("l_shipdate").alias("d_moy"),
            "s_name",
            F.coalesce(
                F.col("l_extendedprice") * F.col("l_quantity"), F.lit(0.0)
            ).alias("sales"),
        )
    )
    agged = base.rollup(
        "p_type", "p_brand", "d_year", "d_qoy", "d_moy", "s_name"
    ).agg(dround(F.sum("sales"), 2).alias("sumsales"))
    w = Window.partitionBy("p_type").orderBy(F.col("sumsales").desc())
    return (
        agged.withColumn("rk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rk") <= 10)
        .select(
            "p_type", "p_brand", "d_year", "d_qoy", "d_moy", "s_name",
            "sumsales", "rk",
        )
    )


# --------------------------------------------------------------------------
# q88 — eight independent scalar-count subqueries cross-joined (q88.sql)
# --------------------------------------------------------------------------
_Q88_BANDS = [(i * 6 + 1, i * 6 + 6) for i in range(8)]  # quantity bands 1-48


@query(
    "tpcds_q88",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 6
         AND l_discount >= 0.05) AS h1,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 7 AND 12
         AND l_discount >= 0.05) AS h2,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 13 AND 18
         AND l_discount >= 0.05) AS h3,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 19 AND 24
         AND l_discount >= 0.05) AS h4,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 25 AND 30
         AND l_discount >= 0.05) AS h5,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 36
         AND l_discount >= 0.05) AS h6,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 37 AND 42
         AND l_discount >= 0.05) AS h7,
      (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 43 AND 48
         AND l_discount >= 0.05) AS h8
    """,
    doc="TPC-DS q88 shape: eight independent scalar COUNT subqueries (one "
    "per quantity band) cross-joined into a single row. Spark plans eight "
    "scans that run as one multi-aggregate pass here via conditional "
    "aggregation — same values, one scan instead of eight.",
)
def tpcds_q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    # One conditional-aggregation scan replaces the original's 8 self-scans
    # (the values are identical; at 100 TB one pass beats eight).
    base = lineitem.filter(F.col("l_discount") >= 0.05)
    return base.agg(
        *[
            F.count(
                F.when(F.col("l_quantity").between(lo, hi), F.lit(1))
            ).alias(f"h{i + 1}")
            for i, (lo, hi) in enumerate(_Q88_BANDS)
        ]
    )


# --------------------------------------------------------------------------
# q10 — demographics count gated by EXISTS across channels (q10.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q10",
    oracle="""
    SELECT c.c_mktsegment AS segment, n.n_name AS n_name,
           COUNT(*) AS cnt
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND year(o.o_orderdate) = 1996)
      AND (EXISTS (SELECT 1 FROM lineitem l JOIN orders o2
                     ON l.l_orderkey = o2.o_orderkey
                   WHERE o2.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
        OR EXISTS (SELECT 1 FROM lineitem l JOIN orders o3
                     ON l.l_orderkey = o3.o_orderkey
                   WHERE o3.o_custkey = c.c_custkey AND l.l_returnflag = 'A'))
    GROUP BY 1, 2
    ORDER BY segment, n_name
    """,
    doc="TPC-DS q10 shape: customer demographics counts gated by an EXISTS "
    "battery — active in the base channel AND present in either secondary "
    "channel. Spark plans the EXISTS as broadcast/shuffled LEFT SEMI joins; "
    "the OR-of-EXISTS becomes one semi join against the union of both "
    "channels' customer key sets (same semantics, one membership probe).",
)
def tpcds_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    # One pass over orders x lineitem computes all three membership flags
    # per customer (active 1996 order; any R line; any A line) — the
    # oracle's EXISTS battery needed three scans of orders and two of
    # lineitem; the flags produce the identical qualifying-customer set.
    flags = (
        orders.join(
            lineitem.filter(F.col("l_returnflag").isin("R", "A")),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .groupBy("o_custkey")
        .agg(
            F.max(F.when(F.year("o_orderdate") == 1996, F.lit(1))).alias("active"),
            F.max(F.when(F.col("l_returnflag") == "R", F.lit(1))).alias("in_R"),
            F.max(F.when(F.col("l_returnflag") == "A", F.lit(1))).alias("in_A"),
        )
        .filter(
            F.col("active").isNotNull()
            & (F.col("in_R").isNotNull() | F.col("in_A").isNotNull())
        )
        .select("o_custkey")
    )
    return (
        customer.join(flags, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"), "n_name")
        .agg(F.count("*").alias("cnt"))
        .orderBy("segment", "n_name")
    )


# --------------------------------------------------------------------------
# q11 — year-over-year growth ratio compared across channels (q11.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q11",
    oracle="""
    WITH year_total AS (
      SELECT o.o_custkey AS custkey, l.l_linestatus AS channel,
             year(l.l_shipdate) AS d_year,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS total
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE year(l.l_shipdate) IN (1996, 1997)
      GROUP BY 1, 2, 3
    )
    SELECT c.c_name AS c_name
    FROM year_total w1
    JOIN year_total w2 ON w1.custkey = w2.custkey
    JOIN year_total s1 ON w1.custkey = s1.custkey
    JOIN year_total s2 ON w1.custkey = s2.custkey
    JOIN customer c ON c.c_custkey = w1.custkey
    WHERE w1.channel = 'O' AND w1.d_year = 1996
      AND w2.channel = 'O' AND w2.d_year = 1997
      AND s1.channel = 'F' AND s1.d_year = 1996
      AND s2.channel = 'F' AND s2.d_year = 1997
      AND w1.total > 0 AND s1.total > 0
      AND w2.total / w1.total > s2.total / s1.total
    ORDER BY c_name
    LIMIT 100
    """,
    doc="TPC-DS q11 shape: per-customer yearly totals across two channels × "
    "two years, keeping customers whose primary-channel growth ratio beats "
    "their secondary-channel ratio. The original (and the oracle) "
    "instantiate the totals CTE four times and join on the customer key; "
    "the Spark plan computes the identical four totals as CONDITIONAL "
    "aggregates in ONE pass over the fact (a conditional-sum pivot) — a "
    "customer absent from a slice yields NULL, exactly the rows the inner "
    "joins drop — collapsing 4 scans + 3 self-joins (8 exchanges) into one "
    "scan and one customer-keyed shuffle.",
)
def tpcds_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer = _t(spark, sf_dir, "lineitem", "orders", "customer")

    def slot(channel: str, year: int):
        return dround(
            F.sum(
                F.when(
                    (F.col("l_linestatus") == channel)
                    & (F.year("l_shipdate") == year),
                    _rev(),
                )
            ),
            2,
        )

    totals = (
        lineitem.filter(_in_years("l_shipdate", 1996, 1997))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            slot("O", 1996).alias("w1"),
            slot("O", 1997).alias("w2"),
            slot("F", 1996).alias("s1"),
            slot("F", 1997).alias("s2"),
        )
    )
    return (
        totals.filter(
            F.col("w1").isNotNull()
            & F.col("w2").isNotNull()
            & F.col("s1").isNotNull()
            & F.col("s2").isNotNull()
            & (F.col("w1") > 0)
            & (F.col("s1") > 0)
            & (F.col("w2") / F.col("w1") > F.col("s2") / F.col("s1"))
        )
        .join(customer, F.col("c_custkey") == F.col("custkey"))
        .select("c_name")
        .orderBy("c_name")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q65 — per-store item revenue vs 10% of the store average (q65.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q65",
    oracle="""
    WITH sa AS (
      SELECT l_suppkey, l_partkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem GROUP BY 1, 2
    ),
    sb AS (
      SELECT l_suppkey, ROUND(AVG(revenue), 4) AS ave FROM sa GROUP BY 1
    )
    SELECT s.s_name AS s_name, p.p_name AS p_name,
           sa.revenue AS revenue, sb.ave AS ave
    FROM sa
    JOIN sb ON sa.l_suppkey = sb.l_suppkey
    JOIN supplier s ON s.s_suppkey = sa.l_suppkey
    JOIN part p ON p.p_partkey = sa.l_partkey
    WHERE sa.revenue <= 0.1 * sb.ave
    ORDER BY s_name, p_name, revenue
    LIMIT 100
    """,
    doc="TPC-DS q65 shape: aggregate-of-aggregate — per-(store, item) "
    "revenue, re-aggregated to a per-store average, theta-joined back to "
    "find items selling under 10% of their store's average. The store-key "
    "partitioning from the first aggregation is reusable by the second "
    "(no extra shuffle for sb) and by the sa-sb join.",
)
def tpcds_q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier, part = _t(spark, sf_dir, "lineitem", "supplier", "part")
    sa = (
        lineitem.groupBy("l_suppkey", "l_partkey")
        .agg(dround(F.sum(_rev()), 2).alias("revenue"))
        .localCheckpoint(eager=False)  # shared by sb and the theta join
    )
    sb = sa.groupBy(F.col("l_suppkey").alias("sb_suppkey")).agg(
        dround(F.avg("revenue"), 4).alias("ave")
    )
    return (
        sa.join(sb, F.col("l_suppkey") == F.col("sb_suppkey"))
        .filter(F.col("revenue") <= 0.1 * F.col("ave"))
        .join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .select("s_name", "p_name", "revenue", "ave")
        # p_name is NOT unique (two parts can share a name), so the spec's
        # (s_name, p_name) order ties at the LIMIT boundary; revenue makes
        # any remaining tie an identical full row (multiset-deterministic)
        .orderBy("s_name", "p_name", "revenue")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q14 — cross-channel item intersect + scalar average + rollup over the
# channel union (q14a/b.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q14",
    oracle="""
    WITH cross_items AS (
      SELECT l_partkey AS item FROM lineitem WHERE l_returnflag = 'N'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    ),
    avg_sales AS (
      SELECT ROUND(AVG(l_extendedprice * (1 - l_discount)), 4) AS average_sales
      FROM lineitem
    ),
    united AS (
      SELECT l.l_returnflag AS channel, p.p_brand AS p_brand,
             p.p_type AS p_type,
             l.l_extendedprice * (1 - l.l_discount) AS rev
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_partkey IN (SELECT item FROM cross_items)
    )
    SELECT channel, p_brand, p_type,
           ROUND(SUM(rev), 2) AS sum_sales, COUNT(*) AS n
    FROM united, avg_sales
    GROUP BY ROLLUP (channel, p_brand, p_type), average_sales
    HAVING ROUND(SUM(rev), 2) > average_sales
    """,
    doc="TPC-DS q14 shape: items present in ALL THREE channels via a "
    "chained INTERSECT, a scalar average over the whole fact history "
    "(broadcast as a 1-row join, the decorrelated scalar subquery), and a "
    "3-level rollup over the channel union kept above that average. The "
    "intersect sides prune to distinct item keys before their shuffles; "
    "the IN becomes a broadcast semi join against the intersected key set.",
)
def tpcds_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")

    # items in all three channels via presence flags in one pass (the
    # oracle keeps the literal INTERSECT chain)
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
    united = (
        lineitem.join(
            cross_items, F.col("l_partkey") == F.col("item"), "left_semi"
        )
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            F.col("l_returnflag").alias("channel"),
            "p_brand",
            "p_type",
            _rev().alias("rev"),
        )
    )
    return (
        united.rollup("channel", "p_brand", "p_type")
        .agg(dround(F.sum("rev"), 2).alias("sum_sales"), F.count("*").alias("n"))
        .join(F.broadcast(avg_sales))
        .filter(F.col("sum_sales") > F.col("average_sales"))
        .select("channel", "p_brand", "p_type", "sum_sales", "n")
    )


# --------------------------------------------------------------------------
# q6 — dim-side correlated average-price subquery + month filter (q6.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q6",
    oracle="""
    WITH pc AS (
      SELECT p_partkey, p_type,
             CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part),
    cat AS (
      SELECT p_type, SUM(price_cents) AS sum_cents, COUNT(*) AS cnt
      FROM pc GROUP BY p_type),
    expensive AS (
      SELECT p_partkey FROM pc JOIN cat USING (p_type)
      WHERE price_cents * cnt * 100 > 103 * sum_cents)
    SELECT n.n_name AS state, COUNT(*) AS cnt
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
      AND year(o.o_orderdate) = 1996 AND quarter(o.o_orderdate) = 1
    JOIN expensive e ON e.p_partkey = l.l_partkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    HAVING COUNT(*) >= 10
    ORDER BY cnt, state
    LIMIT 100
    """,
    doc="TPC-DS q6 shape (tpcds_3.2/q6.sql): customers-by-state buying "
    "items priced >1.03x their category average in one quarter (testdata "
    "prices span 900-1000, so the original 1.2x never fires), HAVING "
    "count>=10. The correlated per-category average subquery is "
    "decorrelated into a category aggregate joined back to the item dim "
    "(what Catalyst does to the original), and the 1.2x price comparison "
    "is integer-exact in cents (price*cnt*10 > 12*sum) so no float "
    "boundary can flip membership across engines. The dim-side filter "
    "result is a broadcast semi-join input to the fact scan.",
)
def tpcds_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation, part = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "part"
    )
    pc = part.select(
        "p_partkey",
        "p_type",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    cat = pc.groupBy("p_type").agg(
        F.sum("price_cents").alias("sum_cents"), F.count("*").alias("cnt")
    )
    expensive = (
        pc.join(F.broadcast(cat), "p_type")
        .filter(
            F.col("price_cents") * F.col("cnt") * 100 > 103 * F.col("sum_cents")
        )
        .select("p_partkey")
    )
    return (
        lineitem.join(
            orders.filter(
                _date_range("o_orderdate", "1996-01-01", "1996-04-01")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(expensive),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("state"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 10)
        .orderBy("cnt", "state")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q9 — five CASE-bucketed scalar subqueries over the fact (q9.sql)
# --------------------------------------------------------------------------
_Q9_BUCKETS = [(1, 10, 12000), (11, 20, 11000), (21, 30, 13000),
               (31, 40, 12500), (41, 50, 11500)]


def _q9_oracle() -> str:
    cases = []
    for i, (lo, hi, thr) in enumerate(_Q9_BUCKETS, 1):
        base = f"FROM lineitem WHERE l_quantity BETWEEN {lo} AND {hi}"
        cases.append(f"""
      ROUND(CASE WHEN (SELECT COUNT(*) {base}) > {thr}
        THEN (SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                     AS DOUBLE) / COUNT(*) / 100 {base})
        ELSE (SELECT CAST(SUM(CAST(ROUND(l_extendedprice
                     * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE)
                     / COUNT(*) / 100 {base})
      END, 6) AS bucket{i}""")
    return "SELECT " + ", ".join(cases)


@query(
    "tpcds_q9",
    oracle=_q9_oracle(),
    doc="TPC-DS q9 shape (tpcds_3.2/q9.sql): five quantity-band buckets, "
    "each choosing between two averages based on a count threshold. The "
    "original (and the oracle) issue 15 scalar subqueries = 15 fact "
    "scans; the Spark plan computes every band's count and both "
    "conditional sums in ONE aggregation over one scan, then selects the "
    "same CASE per bucket. All averages divide integer cent sums, so "
    "both engines round identical doubles.",
)
def tpcds_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")[0]
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    rev_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    aggs = []
    for i, (lo, hi, _) in enumerate(_Q9_BUCKETS, 1):
        inb = F.col("l_quantity").between(lo, hi)
        aggs += [
            F.count(F.when(inb, 1)).alias(f"cnt{i}"),
            F.sum(F.when(inb, price_c)).alias(f"sp{i}"),
            F.sum(F.when(inb, rev_c)).alias(f"sr{i}"),
        ]
    one = lineitem.agg(*aggs)
    buckets = [
        dround(
            F.when(
                F.col(f"cnt{i}") > thr,
                F.col(f"sp{i}").cast("double") / F.col(f"cnt{i}") / 100,
            ).otherwise(
                F.col(f"sr{i}").cast("double") / F.col(f"cnt{i}") / 100
            ),
            6,
        ).alias(f"bucket{i}")
        for i, (_, _, thr) in enumerate(_Q9_BUCKETS, 1)
    ]
    return one.select(*buckets)


# --------------------------------------------------------------------------
# q13 — OR-ed demographic/address band predicates, single-row averages (q13.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q13",
    oracle="""
    SELECT
      ROUND(CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS DOUBLE)
            / COUNT(*), 6) AS avg_qty,
      ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
            AS DOUBLE) / COUNT(*) / 100, 6) AS avg_price,
      ROUND(CAST(SUM(CAST(ROUND(l.l_discount * 100) AS BIGINT))
            AS DOUBLE) / COUNT(*) / 100, 6) AS avg_disc,
      ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
            AS DOUBLE) / 100, 2) AS sum_price
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE (
        (c.c_mktsegment = 'BUILDING' AND o.o_orderpriority = '1-URGENT'
         AND l.l_extendedprice BETWEEN 1000 AND 20000)
        OR (c.c_mktsegment = 'AUTOMOBILE' AND o.o_orderpriority = '2-HIGH'
            AND l.l_extendedprice BETWEEN 20000 AND 40000)
        OR (c.c_mktsegment = 'MACHINERY' AND o.o_orderpriority = '3-MEDIUM'
            AND l.l_extendedprice BETWEEN 40000 AND 60000))
      AND (
        (n.n_regionkey IN (0, 1) AND o.o_totalprice BETWEEN 50000 AND 150000)
        OR (n.n_regionkey IN (2, 3)
            AND o.o_totalprice BETWEEN 100000 AND 200000)
        OR (n.n_regionkey = 4 AND o.o_totalprice BETWEEN 150000 AND 250000))
    """,
    doc="TPC-DS q13 shape (tpcds_3.2/q13.sql): one-row fact averages under "
    "two stacked OR-of-band predicate groups (demographic bands x address "
    "bands). Demographics map to c_mktsegment/o_orderpriority, address "
    "bands to n_regionkey/o_totalprice. All averages divide integer cent "
    "sums so both engines round identical doubles. Dims are broadcast; "
    "the OR predicate stays on the probe side of the joins.",
)
def tpcds_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    seg_bands = (
        (F.col("c_mktsegment") == "BUILDING")
        & (F.col("o_orderpriority") == "1-URGENT")
        & F.col("l_extendedprice").between(1000, 20000)
    ) | (
        (F.col("c_mktsegment") == "AUTOMOBILE")
        & (F.col("o_orderpriority") == "2-HIGH")
        & F.col("l_extendedprice").between(20000, 40000)
    ) | (
        (F.col("c_mktsegment") == "MACHINERY")
        & (F.col("o_orderpriority") == "3-MEDIUM")
        & F.col("l_extendedprice").between(40000, 60000)
    )
    addr_bands = (
        (F.col("n_regionkey").isin(0, 1)
         & F.col("o_totalprice").between(50000, 150000))
        | (F.col("n_regionkey").isin(2, 3)
           & F.col("o_totalprice").between(100000, 200000))
        | ((F.col("n_regionkey") == 4)
           & F.col("o_totalprice").between(150000, 250000))
    )
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    base = (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .filter(seg_bands & addr_bands)
    )
    return base.agg(
        dround(
            F.sum(F.col("l_quantity").cast("long")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_qty"),
        dround(F.sum(price_c).cast("double") / F.count("*") / 100, 6).alias(
            "avg_price"
        ),
        dround(F.sum(disc_c).cast("double") / F.count("*") / 100, 6).alias(
            "avg_disc"
        ),
        dround(F.sum(price_c).cast("double") / 100, 2).alias("sum_price"),
    )


# --------------------------------------------------------------------------
# q17 — three-channel chain join + stddev_samp statistics (q17.sql)
# --------------------------------------------------------------------------
def _chan_stats(prefix: str, qty: str):
    """count/avg/stddev_samp/cov from integer sums — bit-identical across
    engines: stddev_samp = sqrt((n*Σx² - (Σx)²) / (n*(n-1)))."""
    n = F.count(qty).cast("long")
    s1 = F.sum(F.col(qty).cast("long"))
    s2 = F.sum((F.col(qty) * F.col(qty)).cast("long"))
    ave = s1.cast("double") / n
    # guarded: stddev_samp undefined for n=1 (NULL on both engines)
    var = F.when(
        n > 1,
        (n.cast("double") * s2 - s1.cast("double") * s1)
        / (n.cast("double") * (n - 1)),
    )
    std = F.sqrt(var)
    return [
        n.alias(f"{prefix}_cnt"),
        dround(ave, 6).alias(f"{prefix}_ave"),
        dround(std, 6).alias(f"{prefix}_stdev"),
        dround(std / ave, 6).alias(f"{prefix}_cov"),
    ]


def _q17_chan_stats_sql(prefix: str, qty: str) -> str:
    n = f"COUNT({qty})"
    s1 = f"SUM(CAST({qty} AS BIGINT))"
    s2 = f"SUM(CAST({qty} * {qty} AS BIGINT))"
    ave = f"(CAST({s1} AS DOUBLE) / {n})"
    var = (
        f"(CASE WHEN {n} > 1 THEN"
        f" (CAST({n} AS DOUBLE) * {s2} - CAST({s1} AS DOUBLE) * {s1})"
        f" / (CAST({n} AS DOUBLE) * ({n} - 1)) END)"
    )
    return (
        f"CAST({n} AS BIGINT) AS {prefix}_cnt, "
        f"ROUND({ave}, 6) AS {prefix}_ave, "
        f"ROUND(SQRT({var}), 6) AS {prefix}_stdev, "
        f"ROUND(SQRT({var}) / {ave}, 6) AS {prefix}_cov"
    )


@query(
    "tpcds_q17",
    oracle=f"""
    SELECT p.p_brand AS p_brand, n.n_name AS s_state,
           {_q17_chan_stats_sql("store_sales", "s.l_quantity")},
           {_q17_chan_stats_sql("store_returns", "r.r_qty")},
           {_q17_chan_stats_sql("catalog_sales", "cs.c_qty")}
    FROM (SELECT l.l_partkey, l.l_suppkey, l.l_quantity, o.o_custkey
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE l.l_returnflag = 'N' AND year(l.l_shipdate) = 1996
            AND quarter(l.l_shipdate) = 1) s
    JOIN (SELECT o.o_custkey, l.l_quantity AS r_qty
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE l.l_returnflag = 'R' AND year(l.l_shipdate) = 1996
            AND quarter(l.l_shipdate) <= 3) r
      ON r.o_custkey = s.o_custkey
    JOIN (SELECT o.o_custkey, l.l_quantity AS c_qty
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE l.l_returnflag = 'A' AND year(l.l_shipdate) = 1996
            AND quarter(l.l_shipdate) <= 3) cs
      ON cs.o_custkey = r.o_custkey
    JOIN part p ON p.p_partkey = s.l_partkey
    JOIN supplier su ON su.s_suppkey = s.l_suppkey
    JOIN nation n ON n.n_nationkey = su.s_nationkey
    GROUP BY p.p_brand, n.n_name
    ORDER BY p_brand, s_state
    LIMIT 100
    """,
    doc="TPC-DS q17 shape (tpcds_3.2/q17.sql): sale -> return -> "
    "re-purchase chain joined on customer across three quarter "
    "windows, grouped stats with stddev_samp per channel. Channels are "
    "the N/R/A returnflag slices of lineitem. stddev_samp/avg/cov are "
    "computed from integer quantity sums (n*Σx²-(Σx)² form) so both "
    "engines evaluate identical doubles. The three channel relations "
    "shuffle on the same custkey; dims broadcast.",
)
def tpcds_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, part, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation"
    )

    def chan(flag: str, max_q: int, qty_alias: str, with_keys: bool = False):
        cols = [F.col("o_custkey"), F.col("l_quantity").alias(qty_alias)]
        if with_keys:
            cols += [F.col("l_partkey"), F.col("l_suppkey")]
        return (
            lineitem.filter(
                (F.col("l_returnflag") == flag)
                & _date_range(
                    "l_shipdate",
                    "1996-01-01",
                    "1997-01-01" if max_q == 4 else f"1996-{3 * max_q + 1:02d}-01",
                )
            )
            .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .select(*cols)
        )

    s = chan("N", 1, "s_qty", with_keys=True)
    r = chan("R", 3, "r_qty").withColumnRenamed("o_custkey", "r_custkey")
    cs = chan("A", 3, "c_qty").withColumnRenamed("o_custkey", "c_custkey")
    joined = (
        s.join(r, F.col("r_custkey") == F.col("o_custkey"))
        .join(cs, F.col("c_custkey") == F.col("r_custkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
    )
    return (
        joined.groupBy("p_brand", F.col("n_name").alias("s_state"))
        .agg(
            *_chan_stats("store_sales", "s_qty"),
            *_chan_stats("store_returns", "r_qty"),
            *_chan_stats("catalog_sales", "c_qty"),
        )
        .orderBy("p_brand", "s_state")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q43 — day-of-week conditional pivot per store (q43.sql)
# --------------------------------------------------------------------------
_DOW_NAMES = ["mon", "tue", "wed", "thu", "fri", "sat", "sun"]


def _dow_pivot_sql(src_col: str = "l.l_extendedprice",
                   date_col: str = "l.l_shipdate") -> str:
    """sun..sat conditional cent sums as SQL (isodow: Mon=1..Sun=7)."""
    return ", ".join(
        f"SUM(CASE WHEN isodow(CAST({date_col} AS DATE)) = {i + 1} THEN "
        f"CAST(ROUND({src_col} * 100) AS BIGINT) END) AS {d}_c"
        for i, d in enumerate(_DOW_NAMES)
    )


def _dow_pivot_spark(src=None, date_col: str = "l_shipdate"):
    """sun..sat conditional cent sums as Columns (weekday: Mon=0..Sun=6)."""
    src = src if src is not None else F.round(
        F.col("l_extendedprice") * 100
    ).cast("long")
    return [
        F.sum(F.when(F.weekday(date_col) == i, src)).alias(f"{d}_c")
        for i, d in enumerate(_DOW_NAMES)
    ]


@query(
    "tpcds_q43",
    oracle=f"""
    SELECT s.s_name AS s_name, s.s_suppkey AS s_suppkey,
           {", ".join(f"ROUND(CAST(t.{d}_c AS DOUBLE) / 100, 2) AS {d}_sales"
                      for d in _DOW_NAMES)}
    FROM (
      SELECT l.l_suppkey, {_dow_pivot_sql()}
      FROM lineitem l
      WHERE year(l.l_shipdate) = 1996
      GROUP BY l.l_suppkey) t
    JOIN supplier s ON s.s_suppkey = t.l_suppkey
    WHERE s.s_nationkey IN (1, 2, 3, 4, 5)
    ORDER BY s_name, s_suppkey
    LIMIT 100
    """,
    doc="TPC-DS q43 shape (tpcds_3.2/q43.sql): per-store weekly sales "
    "pivot — seven day-of-week conditional sums over one year of the "
    "fact, store dim joined for name/filter. Day-of-week is "
    "weekday()+1 == DuckDB isodow (Mon=1..Sun=7) so bucket membership "
    "is engine-independent; sums are integer cents. One fact scan, one "
    "shuffle on suppkey, dim broadcast.",
)
def tpcds_q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    pivot = (
        lineitem.filter(_in_years("l_shipdate", 1996))
        .groupBy("l_suppkey")
        .agg(*_dow_pivot_spark())
    )
    return (
        pivot.join(
            F.broadcast(supplier.filter(F.col("s_nationkey").isin(1, 2, 3, 4, 5))),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select(
            "s_name",
            "s_suppkey",
            *[
                dround(F.col(f"{d}_c").cast("double") / 100, 2).alias(
                    f"{d}_sales"
                )
                for d in _DOW_NAMES
            ],
        )
        .orderBy("s_name", "s_suppkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q59 — week-over-year same-store sales ratios (q59.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q59",
    oracle=f"""
    WITH wss AS (
      SELECT year(l.l_shipdate) AS yr, weekofyear(CAST(l.l_shipdate AS DATE))
               AS wk, l.l_suppkey,
             {_dow_pivot_sql()}
      FROM lineitem l
      WHERE year(l.l_shipdate) IN (1995, 1996)
      GROUP BY 1, 2, 3)
    SELECT s.s_name AS s_name, c.wk AS wk,
           {", ".join(f"ROUND(CAST(c.{d}_c AS DOUBLE) / NULLIF(p.{d}_c, 0), 6)"
                      f" AS {d}_ratio" for d in _DOW_NAMES)}
    FROM (SELECT * FROM wss WHERE yr = 1996) c
    JOIN (SELECT * FROM wss WHERE yr = 1995) p
      ON p.wk = c.wk AND p.l_suppkey = c.l_suppkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    WHERE s.s_nationkey IN (1, 2)
    ORDER BY s_name, wk
    LIMIT 100
    """,
    doc="TPC-DS q59 shape (tpcds_3.2/q59.sql): per-(store, week) "
    "day-of-week pivot compared against the same store-week one year "
    "earlier. The original (and the oracle) self-join the pivot CTE on "
    "(week, store) across the two years — two instantiations of the "
    "aggregate; the Spark plan pivots BOTH years in one conditional "
    "pass (14 conditional sums keyed by year) and keeps groups present "
    "in both years — identical inner-join semantics, one fact scan, one "
    "shuffle. Ratios divide integer cent sums via NULLIF guards.",
)
def tpcds_q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, supplier = _t(spark, sf_dir, "lineitem", "supplier")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    yr = F.year("l_shipdate")
    aggs = []
    for yname, y in (("c", 1996), ("p", 1995)):
        for i, d in enumerate(_DOW_NAMES):
            aggs.append(
                F.sum(
                    F.when((yr == y) & (F.weekday("l_shipdate") == i), cents)
                ).alias(f"{yname}_{d}")
            )
        aggs.append(
            F.count(F.when(yr == y, F.lit(1))).alias(f"{yname}_n")
        )
    pivot = (
        lineitem.filter(yr.isin(1995, 1996))
        .groupBy(
            F.weekofyear(F.col("l_shipdate").cast("date")).alias("wk"),
            "l_suppkey",
        )
        .agg(*aggs)
        # inner-join semantics of the original self-join: the store-week
        # must have rows in BOTH years
        .filter((F.col("c_n") > 0) & (F.col("p_n") > 0))
    )
    return (
        pivot.join(
            F.broadcast(supplier.filter(F.col("s_nationkey").isin(1, 2))),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select(
            "s_name",
            "wk",
            *[
                dround(
                    F.col(f"c_{d}").cast("double")
                    / F.nullif(F.col(f"p_{d}"), F.lit(0)),
                    6,
                ).alias(f"{d}_ratio")
                for d in _DOW_NAMES
            ],
        )
        .orderBy("s_name", "wk")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q93 — returns-adjusted actual sales via left outer join (q93.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q93",
    oracle="""
    WITH ret AS (
      SELECT l_orderkey, l_linenumber,
             CAST(FLOOR(l_quantity / 2) AS BIGINT) AS ret_qty
      FROM lineitem
      WHERE l_returnflag = 'R' AND l_linestatus = 'F'),
    t AS (
      SELECT o.o_custkey,
             CASE WHEN r.ret_qty IS NOT NULL
                  THEN (CAST(l.l_quantity AS BIGINT) - r.ret_qty)
                       * CAST(ROUND(l.l_extendedprice / l.l_quantity * 100)
                              AS BIGINT)
                  ELSE CAST(l.l_quantity AS BIGINT)
                       * CAST(ROUND(l.l_extendedprice / l.l_quantity * 100)
                              AS BIGINT)
             END AS act_cents
      FROM lineitem l
      LEFT OUTER JOIN ret r
        ON r.l_orderkey = l.l_orderkey AND r.l_linenumber = l.l_linenumber
      JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT o_custkey AS customer, ROUND(CAST(SUM(act_cents) AS DOUBLE) / 100, 2)
             AS sumsales
    FROM t
    GROUP BY o_custkey
    ORDER BY sumsales, customer
    LIMIT 100
    """,
    doc="TPC-DS q93 shape (tpcds_3.2/q93.sql): actual sales net of "
    "returns — fact LEFT OUTER JOIN its returns slice on the line "
    "composite key, conditional quantity arithmetic, per-customer sum, "
    "ascending top-100. Returns are the R/F lineitem rows with half the "
    "quantity returned. Unit price in cents is a rounded double "
    "division evaluated identically on both engines; all later math is "
    "integer.",
)
def tpcds_q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders = _t(spark, sf_dir, "lineitem", "orders")
    ret = (
        lineitem.filter(
            (F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F")
        )
        .select(
            F.col("l_orderkey").alias("r_orderkey"),
            F.col("l_linenumber").alias("r_linenumber"),
            F.floor(F.col("l_quantity") / 2).cast("long").alias("ret_qty"),
        )
    )
    unit_c = F.round(
        F.col("l_extendedprice") / F.col("l_quantity") * 100
    ).cast("long")
    act = F.when(
        F.col("ret_qty").isNotNull(),
        (F.col("l_quantity").cast("long") - F.col("ret_qty")) * unit_c,
    ).otherwise(F.col("l_quantity").cast("long") * unit_c)
    return (
        lineitem.join(
            ret,
            (F.col("r_orderkey") == F.col("l_orderkey"))
            & (F.col("r_linenumber") == F.col("l_linenumber")),
            "left_outer",
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("customer"), act.alias("act_cents"))
        .groupBy("customer")
        .agg(
            dround(F.sum("act_cents").cast("double") / 100, 2).alias("sumsales")
        )
        .orderBy("sumsales", "customer")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q68 — two-level agg + current-vs-bought city mismatch join (q68.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q68",
    oracle="""
    WITH dn AS (
      SELECT l.l_orderkey, o.o_custkey, ns.n_name AS bought_city,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
               AS price_cents,
             SUM(CAST(ROUND(l.l_extendedprice * l.l_tax * 100) AS BIGINT))
               AS tax_cents,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                      AS BIGINT)) AS list_cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      WHERE day(CAST(l.l_shipdate AS DATE)) BETWEEN 1 AND 5
        AND year(l.l_shipdate) IN (1996, 1997)
        AND ns.n_regionkey IN (1, 2)
      GROUP BY 1, 2, 3)
    SELECT c.c_name AS c_name, nc.n_name AS ca_city, dn.bought_city,
           dn.l_orderkey AS ticket,
           ROUND(CAST(dn.price_cents AS DOUBLE) / 100, 2) AS extended_price,
           ROUND(CAST(dn.tax_cents AS DOUBLE) / 100, 2) AS extended_tax,
           ROUND(CAST(dn.list_cents AS DOUBLE) / 100, 2) AS list_price
    FROM dn
    JOIN customer c ON c.c_custkey = dn.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE nc.n_name <> dn.bought_city
    ORDER BY c_name, ticket
    LIMIT 100
    """,
    doc="TPC-DS q68 shape (tpcds_3.2/q68.sql): per-ticket (order) "
    "aggregation under date/demographic filters, then joined to the "
    "customer dim keeping only tickets bought in a city different from "
    "the customer's current city. Cities map to supplier/customer "
    "nations. Money sums are integer cents; the ticket key makes the "
    "ORDER BY total.",
)
def tpcds_q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, supplier, nation, customer = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "customer"
    )
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    tax_c = F.round(F.col("l_extendedprice") * F.col("l_tax") * 100).cast("long")
    list_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"),
        F.col("n_name").alias("bought_city"),
        F.col("n_regionkey").alias("ns_region"),
    )
    dn = (
        lineitem.filter(
            F.dayofmonth("l_shipdate").between(1, 5)
            & _in_years("l_shipdate", 1996, 1997)
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(ns.filter(F.col("ns_region").isin(1, 2))),
            F.col("ns_key") == F.col("s_nationkey"),
        )
        .groupBy("l_orderkey", "o_custkey", "bought_city")
        .agg(
            F.sum(price_c).alias("price_cents"),
            F.sum(tax_c).alias("tax_cents"),
            F.sum(list_c).alias("list_cents"),
        )
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("ca_city")
    )
    return (
        dn.join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("nc_key") == F.col("c_nationkey"))
        .filter(F.col("ca_city") != F.col("bought_city"))
        .select(
            "c_name",
            "ca_city",
            "bought_city",
            F.col("l_orderkey").alias("ticket"),
            dround(F.col("price_cents").cast("double") / 100, 2).alias(
                "extended_price"
            ),
            dround(F.col("tax_cents").cast("double") / 100, 2).alias(
                "extended_tax"
            ),
            dround(F.col("list_cents").cast("double") / 100, 2).alias(
                "list_price"
            ),
        )
        .orderBy("c_name", "ticket")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q98 — ratio-to-report window over grouped item revenue (q98.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q98",
    oracle="""
    WITH g AS (
      SELECT p.p_name, p.p_type, p.p_brand,
             ROUND(p.p_retailprice, 2) AS current_price,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS rev_cents
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type IN ('ECONOMY', 'STANDARD', 'PROMO')
        AND CAST(l.l_shipdate AS DATE)
            BETWEEN DATE '1996-01-12' AND DATE '1996-02-11'
      GROUP BY 1, 2, 3, 4)
    SELECT p_name, p_type, p_brand, current_price,
           ROUND(CAST(rev_cents AS DOUBLE) / 100, 2) AS itemrevenue,
           ROUND(CAST(rev_cents AS DOUBLE) * 100
                 / SUM(rev_cents) OVER (PARTITION BY p_brand), 6)
             AS revenueratio
    FROM g
    ORDER BY p_type, p_brand, p_name, revenueratio, itemrevenue,
             current_price
    LIMIT 200
    """,
    doc="TPC-DS q98 shape (tpcds_3.2/q98.sql): item revenue with "
    "ratio-to-report — each item's share of its class's total via a "
    "window SUM over the grouped result. The window input is an integer "
    "cent sum, so the share is one double division on both engines. One "
    "fact scan, one group-by shuffle, one windows pass over the small "
    "grouped relation.",
)
def tpcds_q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, part = _t(spark, sf_dir, "lineitem", "part")
    g = (
        lineitem.filter(
            F.col("l_shipdate")
            .cast("date")
            .between(F.lit("1996-01-12"), F.lit("1996-02-11"))
        )
        .join(
            F.broadcast(
                part.filter(F.col("p_type").isin("ECONOMY", "STANDARD", "PROMO"))
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy(
            "p_name",
            "p_type",
            "p_brand",
            dround(F.col("p_retailprice"), 2).alias("current_price"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "rev_cents"
            )
        )
    )
    w = Window.partitionBy("p_brand")
    return (
        g.select(
            "p_name",
            "p_type",
            "p_brand",
            "current_price",
            dround(F.col("rev_cents").cast("double") / 100, 2).alias(
                "itemrevenue"
            ),
            dround(
                F.col("rev_cents").cast("double") * 100
                / F.sum("rev_cents").over(w),
                6,
            ).alias("revenueratio"),
        )
        # p_name is not unique: itemrevenue + current_price totalize the
        # LIMIT cut (same q65 tie class)
        .orderBy(
            "p_type", "p_brand", "p_name", "revenueratio",
            "itemrevenue", "current_price",
        )
        .limit(200)
    )


# --------------------------------------------------------------------------
# q31 — county QoQ growth race between two channels (q31.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q31",
    oracle="""
    WITH ss AS (
      SELECT nc.n_name AS county, quarter(l.l_shipdate) AS qoy,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS sales
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'N' AND year(l.l_shipdate) = 1996
      GROUP BY 1, 2),
    ws AS (
      SELECT nc.n_name AS county, quarter(l.l_shipdate) AS qoy,
             SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS sales
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'A' AND year(l.l_shipdate) = 1996
      GROUP BY 1, 2)
    SELECT ss1.county AS county,
           ROUND(CAST(ws2.sales AS DOUBLE) / ws1.sales, 6)
             AS web_q1_q2_increase,
           ROUND(CAST(ss2.sales AS DOUBLE) / ss1.sales, 6)
             AS store_q1_q2_increase,
           ROUND(CAST(ws3.sales AS DOUBLE) / ws2.sales, 6)
             AS web_q2_q3_increase,
           ROUND(CAST(ss3.sales AS DOUBLE) / ss2.sales, 6)
             AS store_q2_q3_increase
    FROM ss ss1 JOIN ss ss2 ON ss1.county = ss2.county
    JOIN ss ss3 ON ss2.county = ss3.county
    JOIN ws ws1 ON ss1.county = ws1.county
    JOIN ws ws2 ON ws1.county = ws2.county
    JOIN ws ws3 ON ws1.county = ws3.county
    WHERE ss1.qoy = 1 AND ss2.qoy = 2 AND ss3.qoy = 3
      AND ws1.qoy = 1 AND ws2.qoy = 2 AND ws3.qoy = 3
      AND (CASE WHEN ws1.sales > 0
                THEN CAST(ws2.sales AS DOUBLE) / ws1.sales END)
        > (CASE WHEN ss1.sales > 0
                THEN CAST(ss2.sales AS DOUBLE) / ss1.sales END)
      AND (CASE WHEN ws2.sales > 0
                THEN CAST(ws3.sales AS DOUBLE) / ws2.sales END)
        > (CASE WHEN ss2.sales > 0
                THEN CAST(ss3.sales AS DOUBLE) / ss2.sales END)
    ORDER BY county
    """,
    doc="TPC-DS q31 shape (tpcds_3.2/q31.sql): counties where the web "
    "channel's quarter-over-quarter growth beat the store channel's in "
    "both Q1->Q2 and Q2->Q3. The original (and the oracle) six-way "
    "self-join two channel CTEs; the Spark plan computes all six "
    "(channel, quarter) cells as conditional sums in ONE pass over one "
    "fact scan keyed by county — identical inner-join semantics "
    "enforced by requiring every cell non-null. Ratios divide integer "
    "cent sums; growth comparisons evaluate the same doubles on both "
    "engines.",
)
def tpcds_q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    q = F.quarter("l_shipdate")
    flag = F.col("l_returnflag")
    cells = {}
    aggs = []
    for ch, fl in (("ss", "N"), ("ws", "A")):
        for qi in (1, 2, 3):
            name = f"{ch}{qi}"
            cells[name] = F.col(name)
            aggs.append(
                F.sum(F.when((flag == fl) & (q == qi), cents)).alias(name)
            )
    pivot = (
        lineitem.filter(
            flag.isin("N", "A") & _date_range("l_shipdate", "1996-01-01", "1996-10-01")
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("county"))
        .agg(*aggs)
        # the original's six-way inner self-join keeps only counties with
        # every (channel, quarter) cell present
        .filter(
            F.lit(True)
            & F.col("ss1").isNotNull() & F.col("ss2").isNotNull()
            & F.col("ss3").isNotNull() & F.col("ws1").isNotNull()
            & F.col("ws2").isNotNull() & F.col("ws3").isNotNull()
        )
    )
    ratio = lambda a, b: F.when(  # noqa: E731
        F.col(b) > 0, F.col(a).cast("double") / F.col(b)
    )
    return (
        pivot.filter(
            (ratio("ws2", "ws1") > ratio("ss2", "ss1"))
            & (ratio("ws3", "ws2") > ratio("ss3", "ss2"))
        )
        .select(
            "county",
            dround(F.col("ws2").cast("double") / F.col("ws1"), 6).alias(
                "web_q1_q2_increase"
            ),
            dround(F.col("ss2").cast("double") / F.col("ss1"), 6).alias(
                "store_q1_q2_increase"
            ),
            dround(F.col("ws3").cast("double") / F.col("ws2"), 6).alias(
                "web_q2_q3_increase"
            ),
            dround(F.col("ss3").cast("double") / F.col("ss2"), 6).alias(
                "store_q2_q3_increase"
            ),
        )
        .orderBy("county")
    )


# --------------------------------------------------------------------------
# q95 — double semi-join on multi-warehouse + returned orders (q95.sql)
# --------------------------------------------------------------------------
@query(
    "tpcds_q95",
    oracle="""
    WITH ws_wh AS (
      SELECT DISTINCT ws1.l_orderkey
      FROM lineitem ws1 JOIN lineitem ws2
        ON ws1.l_orderkey = ws2.l_orderkey
       AND ws1.l_suppkey <> ws2.l_suppkey),
    returned AS (
      SELECT DISTINCT r.l_orderkey
      FROM lineitem r JOIN ws_wh w ON w.l_orderkey = r.l_orderkey
      WHERE r.l_returnflag = 'R')
    SELECT COUNT(DISTINCT l.l_orderkey) AS order_count,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * l.l_discount * 100)
                               AS BIGINT)) AS DOUBLE) / 100, 2)
             AS total_ship_cost,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                     * 100) AS BIGINT)) AS DOUBLE) / 100, 2)
             AS total_net_profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE CAST(o.o_orderdate AS DATE)
            BETWEEN DATE '1996-05-01' AND DATE '1996-06-30'
      AND n.n_regionkey = 1
      AND o.o_orderpriority = '1-URGENT'
      AND l.l_orderkey IN (SELECT l_orderkey FROM ws_wh)
      AND l.l_orderkey IN (SELECT l_orderkey FROM returned)
    """,
    doc="TPC-DS q95 shape (tpcds_3.2/q95.sql): orders shipped from more "
    "than one warehouse (supplier) AND having a return, via two IN "
    "subqueries over a self-joined order/warehouse CTE, then COUNT "
    "DISTINCT + money sums. The Spark plan derives multi-supplier "
    "orders with a per-order count-distinct aggregate instead of the "
    "quadratic self-join (same set, no pair blowup on hot orders) and "
    "feeds both predicates as LEFT SEMI joins. The count-distinct "
    "final aggregate is the reference plan's signature bottleneck — "
    "kept, but over the already-semi-joined slice.",
)
def tpcds_q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation"
    )
    multi = (
        lineitem.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") > 1)
        .select(F.col("l_orderkey").alias("m_orderkey"))
    )
    returned = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            multi, F.col("m_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .select(F.col("l_orderkey").alias("r_orderkey"))
        .distinct()
    )
    ship_c = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 100
    ).cast("long")
    profit_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    base = (
        lineitem.join(
            orders.filter(
                F.col("o_orderdate")
                .cast("date")
                .between(F.lit("1996-05-01"), F.lit("1996-06-30"))
                & (F.col("o_orderpriority") == "1-URGENT")
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_regionkey") == 1)),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .join(multi, F.col("m_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(
            returned, F.col("r_orderkey") == F.col("l_orderkey"), "left_semi"
        )
    )
    return base.agg(
        F.count_distinct("l_orderkey").alias("order_count"),
        dround(F.sum(ship_c).cast("double") / 100, 2).alias("total_ship_cost"),
        dround(F.sum(profit_c).cast("double") / 100, 2).alias(
            "total_net_profit"
        ),
    )
