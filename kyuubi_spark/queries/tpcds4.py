"""TPC-DS slice, batch 4 — the last six shapes: q24 (a+b), q46, q72, q79,
q84, q85.

Reference corpus: extensions/spark/kyuubi-spark-connector-tpcds/src/main/
resources/kyuubi/tpcds_3.2/q24a.sql, q24b.sql, q46.sql, q72.sql, q79.sql,
q84.sql, q85.sql (OutputSchemaTPCDSSuite verifies both q24 variants).
Same star mapping as queries/tpcds.py / tpcds2.py / tpcds3.py:
fact = lineitem, sales rows l_linestatus = 'O', returns rows
l_returnflag = 'R' paired back to sales on (orderkey, partkey), ticket =
l_orderkey, item -> part, store/warehouse -> supplier, cities/states ->
nation names, demographics -> customer attributes (mktsegment /
acctbal bands stand in for dep_count / vehicle_count / income_band).
House determinism rules: money in integer cents, one rounded double
division per surfaced ratio, every surfaced integer aggregate CAST to
BIGINT in the oracle, LIMIT only behind an ordering whose ties are
identical full rows (multiset-deterministic cut).

Scale notes (100 TB): every port is a star join over the lineitem fact.
Dimension sides (nation, supplier, part subsets) broadcast; the q24
scalar threshold is a one-row aggregate cross-joined back (broadcast
nested loop over 1 row); q72's sales-inventory pairing is an equi-join
on (partkey, week) — both relations data-scaled but co-partitioned by
the join key, no theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.queries.tpcds import _in_years
from kyuubi_spark.queries.tpcds2 import _t


def _ssales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q24's ssales CTE: sales paired with their returns, store/item/
    customer dims, per-dimension-tuple netpaid in integer cents.

    i_color -> p_brand (the selective item attribute both variants pivot
    on), s_market_id = 7 -> supplier region, s_zip = ca_zip -> equal
    customer/supplier region, c_birth_country <> upper(ca_country) ->
    c_nationkey <> s_nationkey (same swap q64 uses)."""
    lineitem, orders, supplier, nation, customer, part = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "customer", "part"
    )
    sales = lineitem.filter(F.col("l_linestatus") == "O").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    returns = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("r_orderkey"),
            F.col("l_partkey").alias("r_partkey"),
        )
        .distinct()
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("s_state"),
        F.col("n_regionkey").alias("sn_region"),
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("ca_state"),
        F.col("n_regionkey").alias("cn_region"),
    )
    return (
        sales.join(
            returns,
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_partkey") == F.col("r_partkey")),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        # s_market_id = 7 -> supplier region 1; s_zip = ca_zip -> same
        # region; birth country <> address country -> different nations
        .filter(
            (F.col("sn_region") == 1)
            & (F.col("sn_region") == F.col("cn_region"))
            & (F.col("c_nationkey") != F.col("s_nationkey"))
        )
        .groupBy(
            F.col("c_name"),
            F.col("s_name").alias("store_name"),
            F.col("ca_state"),
            F.col("s_state"),
            F.col("p_brand"),
            F.col("p_retailprice"),
            F.col("p_size"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "netpaid_cents"
            )
        )
    )


_SSALES_SQL = """
    ssales AS (
      SELECT c.c_name AS c_name, su.s_name AS store_name,
             nc.n_name AS ca_state, ns.n_name AS s_state,
             p.p_brand AS p_brand, p.p_retailprice AS p_retailprice,
             p.p_size AS p_size,
             SUM(CAST(ROUND(s.l_extendedprice * 100) AS BIGINT))
               AS netpaid_cents
      FROM (SELECT l_orderkey, l_partkey, l_suppkey, l_extendedprice
            FROM lineitem WHERE l_linestatus = 'O') s
      JOIN (SELECT DISTINCT l_orderkey AS r_orderkey,
                            l_partkey AS r_partkey
            FROM lineitem WHERE l_returnflag = 'R') r
        ON s.l_orderkey = r.r_orderkey AND s.l_partkey = r.r_partkey
      JOIN supplier su ON su.s_suppkey = s.l_suppkey
      JOIN nation ns ON ns.n_nationkey = su.s_nationkey
      JOIN orders o ON o.o_orderkey = s.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN part p ON p.p_partkey = s.l_partkey
      WHERE ns.n_regionkey = 1
        AND ns.n_regionkey = nc.n_regionkey
        AND c.c_nationkey <> su.s_nationkey
      GROUP BY 1, 2, 3, 4, 5, 6, 7)
"""


def _q24_oracle(brand: str) -> str:
    return f"""
    WITH {_SSALES_SQL}
    SELECT c_name, store_name,
           ROUND(CAST(SUM(netpaid_cents) AS DOUBLE) / 100, 2) AS paid
    FROM ssales
    WHERE p_brand = '{brand}'
    GROUP BY c_name, store_name
    HAVING SUM(netpaid_cents)
         > (SELECT 0.05 * AVG(netpaid_cents) FROM ssales)
    ORDER BY c_name, store_name
    """


def _q24_build(spark: SparkSession, sf_dir: str, brand: str) -> DataFrame:
    ss = _ssales(spark, sf_dir).localCheckpoint(eager=False)
    # scalar threshold over the WHOLE CTE (both variants share it): a
    # one-row aggregate, cross-joined back = broadcast nested loop over
    # a single row — never a data-scaled shuffle
    threshold = ss.agg(
        (F.avg("netpaid_cents") * F.lit(0.05)).alias("threshold")
    )
    return (
        ss.filter(F.col("p_brand") == brand)
        .groupBy("c_name", "store_name")
        .agg(F.sum("netpaid_cents").alias("paid_cents"))
        .crossJoin(F.broadcast(threshold))
        .filter(F.col("paid_cents") > F.col("threshold"))
        .select(
            "c_name",
            "store_name",
            dround(F.col("paid_cents").cast("double") / 100, 2).alias("paid"),
        )
        .orderBy("c_name", "store_name")
    )


@query(
    "tpcds_q24a",
    oracle=_q24_oracle("Brand#12"),
    doc="TPC-DS q24a shape (tpcds_3.2/q24a.sql): ssales CTE (sales paired "
    "with returns across store/item/customer dims), filter one item "
    "attribute value, HAVING against a scalar 5%-of-average subquery "
    "over the SAME CTE. i_color='orchid' -> p_brand='Brand#12'.",
)
def tpcds_q24a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q24_build(spark, sf_dir, "Brand#12")


@query(
    "tpcds_q24b",
    oracle=_q24_oracle("Brand#21"),
    doc="TPC-DS q24b shape (tpcds_3.2/q24b.sql): identical plan to q24a "
    "with the other item-attribute literal (i_color='chiffon' -> "
    "p_brand='Brand#21') — the reference verifies BOTH variant files.",
)
def tpcds_q24b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q24_build(spark, sf_dir, "Brand#21")


# --------------------------------------------------------------------------
# q46 — bought-city vs current-city per ticket, demographics OR filter
# --------------------------------------------------------------------------
@query(
    "tpcds_q46",
    oracle="""
    WITH dn AS (
      SELECT l.l_orderkey AS ticket, o.o_custkey,
             ns.n_name AS bought_city,
             SUM(CAST(ROUND(l.l_extendedprice * l.l_discount * 100)
                      AS BIGINT)) AS amt_cents,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                      AS BIGINT)) AS profit_cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      WHERE dayofweek(CAST(l.l_shipdate AS DATE)) IN (0, 6)
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1999-01-01'
        AND ns.n_name IN ('NATION_2', 'NATION_7', 'NATION_12')
        AND (o.o_orderpriority = '1-URGENT' OR o.o_totalprice > 150000)
      GROUP BY 1, 2, 3)
    SELECT c.c_name AS c_name, nc.n_name AS ca_city, dn.bought_city,
           dn.ticket,
           ROUND(CAST(dn.amt_cents AS DOUBLE) / 100, 2) AS amt,
           ROUND(CAST(dn.profit_cents AS DOUBLE) / 100, 2) AS profit
    FROM dn
    JOIN customer c ON c.c_custkey = dn.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE nc.n_name <> dn.bought_city
    ORDER BY c_name, ca_city, bought_city, ticket
    LIMIT 100
    """,
    doc="TPC-DS q46 shape (tpcds_3.2/q46.sql): weekend-day per-ticket "
    "aggregation under an OR of two demographic predicates "
    "(hd_dep_count=5 OR hd_vehicle_count=3 -> order priority OR total "
    "price band) and a store-city IN list (-> supplier nations), joined "
    "to the customer keeping tickets bought in a different city than "
    "the customer's current one. Ticket key makes the ORDER BY total.",
)
def tpcds_q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, supplier, nation, customer = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "customer"
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("bought_city")
    ).filter(F.col("bought_city").isin("NATION_2", "NATION_7", "NATION_12"))
    amt_c = F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
        "long"
    )
    profit_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    # DuckDB dayofweek: 0=Sunday..6=Saturday; Spark dayofweek: 1=Sunday..
    # 7=Saturday — (0,6) there == (1,7) here, both mean Sat+Sun
    dn = (
        lineitem.filter(
            F.dayofweek("l_shipdate").isin(1, 7)
            & _in_years("l_shipdate", 1996, 1998)
        )
        .join(
            orders.filter(
                (F.col("o_orderpriority") == "1-URGENT")
                | (F.col("o_totalprice") > 150000)
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .groupBy(
            F.col("l_orderkey").alias("ticket"),
            F.col("o_custkey"),
            F.col("bought_city"),
        )
        .agg(
            F.sum(amt_c).alias("amt_cents"),
            F.sum(profit_c).alias("profit_cents"),
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
            "ticket",
            dround(F.col("amt_cents").cast("double") / 100, 2).alias("amt"),
            dround(F.col("profit_cents").cast("double") / 100, 2).alias(
                "profit"
            ),
        )
        .orderBy("c_name", "ca_city", "bought_city", "ticket")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q72 — inventory-lag: sales paired with same-week low inventory
# --------------------------------------------------------------------------
@query(
    "tpcds_q72",
    oracle="""
    WITH sales AS (
      SELECT l.l_partkey, l.l_suppkey, l.l_quantity, l.l_shipdate,
             l.l_orderkey, o.o_orderdate
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE l.l_linestatus = 'O'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
        AND c.c_mktsegment = 'BUILDING'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 5 DAY
    ),
    inv AS (
      SELECT l_partkey AS inv_partkey, l_quantity AS inv_qty,
             CAST(FLOOR(datediff('day', DATE '1992-01-01',
                                 CAST(l_shipdate AS DATE)) / 7) AS BIGINT)
               AS inv_week
      FROM lineitem WHERE l_linestatus = 'F'
    ),
    promo AS (
      SELECT DISTINCT p_partkey AS promo_key FROM part WHERE p_size > 45
    ),
    ret AS (
      SELECT DISTINCT l_orderkey AS r_orderkey, l_partkey AS r_partkey
      FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT p.p_name AS item_desc, su.s_name AS warehouse_name,
           CAST(FLOOR(datediff('day', DATE '1992-01-01',
                               CAST(s.o_orderdate AS DATE)) / 7) AS BIGINT)
             AS week_seq,
           CAST(SUM(CASE WHEN pr.promo_key IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS no_promo,
           CAST(SUM(CASE WHEN pr.promo_key IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS promo,
           CAST(COUNT(*) AS BIGINT) AS total_cnt
    FROM sales s
    JOIN inv ON inv.inv_partkey = s.l_partkey
            AND inv.inv_week = CAST(FLOOR(datediff('day', DATE '1992-01-01',
                               CAST(s.o_orderdate AS DATE)) / 7) AS BIGINT)
            AND inv.inv_qty < s.l_quantity
    JOIN supplier su ON su.s_suppkey = s.l_suppkey
    JOIN part p ON p.p_partkey = s.l_partkey
    LEFT JOIN promo pr ON pr.promo_key = s.l_partkey
    LEFT JOIN ret ON ret.r_orderkey = s.l_orderkey
                 AND ret.r_partkey = s.l_partkey
    GROUP BY 1, 2, 3
    ORDER BY total_cnt DESC, item_desc, warehouse_name, week_seq
    LIMIT 100
    """,
    doc="TPC-DS q72 shape (tpcds_3.2/q72.sql): sales joined to same-week "
    "inventory rows with quantity-on-hand below the ordered quantity, "
    "ship-after-5-days lag filter, demographics filter, LEFT joins to "
    "promotion and returns, promo/no-promo CASE counts per item/"
    "warehouse/week. inventory -> the 'F' lineitem slice keyed "
    "(partkey, week); week_seq = days-since-epoch/7 (total, engine-"
    "agnostic); warehouse -> supplier.",
)
def tpcds_q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, supplier, part, customer = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "part", "customer"
    )

    def week_seq(col):
        return F.floor(
            F.datediff(F.col(col).cast("date"), F.lit("1992-01-01").cast("date"))
            / 7
        ).cast("long")

    sales = (
        lineitem.filter(F.col("l_linestatus") == "O")
        .join(
            orders.filter(_in_years("o_orderdate", 1996)),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 5 DAYS")
        )
        .select(
            "l_partkey", "l_suppkey", "l_quantity", "l_orderkey",
            week_seq("o_orderdate").alias("week_seq"),
        )
    )
    inv = lineitem.filter(F.col("l_linestatus") == "F").select(
        F.col("l_partkey").alias("inv_partkey"),
        F.col("l_quantity").alias("inv_qty"),
        week_seq("l_shipdate").alias("inv_week"),
    )
    promo = (
        part.filter(F.col("p_size") > 45)
        .select(F.col("p_partkey").alias("promo_key"))
        .distinct()
    )
    ret = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select(
            F.col("l_orderkey").alias("r_orderkey"),
            F.col("l_partkey").alias("r_partkey"),
        )
        .distinct()
    )
    return (
        # sales-inventory pairing is an equi-join on (partkey, week): both
        # sides co-partition on the key — the inequality rides along as a
        # residual, never a theta join
        sales.join(
            inv,
            (F.col("inv_partkey") == F.col("l_partkey"))
            & (F.col("inv_week") == F.col("week_seq"))
            & (F.col("inv_qty") < F.col("l_quantity")),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(promo), F.col("promo_key") == F.col("l_partkey"), "left")
        .join(
            ret,
            (F.col("r_orderkey") == F.col("l_orderkey"))
            & (F.col("r_partkey") == F.col("l_partkey")),
            "left",
        )
        .groupBy(
            F.col("p_name").alias("item_desc"),
            F.col("s_name").alias("warehouse_name"),
            F.col("week_seq"),
        )
        .agg(
            F.sum(
                F.when(F.col("promo_key").isNull(), 1).otherwise(0)
            ).alias("no_promo"),
            F.sum(
                F.when(F.col("promo_key").isNotNull(), 1).otherwise(0)
            ).alias("promo"),
            F.count(F.lit(1)).alias("total_cnt"),
        )
        .orderBy(
            F.col("total_cnt").desc(), "item_desc", "warehouse_name", "week_seq"
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# q79 — per-ticket Monday-shopping aggregation by store city
# --------------------------------------------------------------------------
@query(
    "tpcds_q79",
    oracle="""
    WITH ms AS (
      SELECT l.l_orderkey AS ticket, o.o_custkey,
             ns.n_name AS s_city,
             SUM(CAST(ROUND(l.l_extendedprice * l.l_discount * 100)
                      AS BIGINT)) AS amt_cents,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                      AS BIGINT)) AS profit_cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      WHERE dayofweek(CAST(l.l_shipdate AS DATE)) = 1
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1999-01-01'
        AND s.s_acctbal BETWEEN 2000 AND 8000
        AND (o.o_orderpriority = '2-HIGH' OR o.o_totalprice > 0)
      GROUP BY 1, 2, 3)
    SELECT c.c_name AS c_name, SUBSTR(ms.s_city, 1, 30) AS s_city,
           ms.ticket,
           ROUND(CAST(ms.amt_cents AS DOUBLE) / 100, 2) AS amt,
           ROUND(CAST(ms.profit_cents AS DOUBLE) / 100, 2) AS profit
    FROM ms
    JOIN customer c ON c.c_custkey = ms.o_custkey
    ORDER BY c_name, s_city, profit, ticket
    LIMIT 100
    """,
    doc="TPC-DS q79 shape (tpcds_3.2/q79.sql): Monday per-ticket "
    "aggregation under a demographics OR filter and a store-size band "
    "(s_number_employees BETWEEN -> s_acctbal BETWEEN), joined to the "
    "customer dim, ordered by name/city/profit. Ticket appended to the "
    "ORDER BY for a total order.",
)
def tpcds_q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, supplier, nation, customer = _t(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation", "customer"
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("s_city_raw")
    )
    amt_c = F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
        "long"
    )
    profit_c = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    # DuckDB dayofweek(d)=1 is Monday-as-1? No: 0=Sunday..6=Saturday, so
    # 1 = Monday there; Spark dayofweek: 1=Sunday..7=Saturday, 2 = Monday
    ms = (
        lineitem.filter(
            (F.dayofweek("l_shipdate") == 2) & _in_years("l_shipdate", 1996, 1998)
        )
        .join(
            orders.filter(
                (F.col("o_orderpriority") == "2-HIGH")
                | (F.col("o_totalprice") > 0)
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            F.broadcast(supplier.filter(F.col("s_acctbal").between(2000, 8000))),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .groupBy(
            F.col("l_orderkey").alias("ticket"),
            F.col("o_custkey"),
            F.col("s_city_raw"),
        )
        .agg(
            F.sum(amt_c).alias("amt_cents"),
            F.sum(profit_c).alias("profit_cents"),
        )
    )
    return (
        ms.join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            F.substring("s_city_raw", 1, 30).alias("s_city"),
            "ticket",
            dround(F.col("amt_cents").cast("double") / 100, 2).alias("amt"),
            dround(F.col("profit_cents").cast("double") / 100, 2).alias(
                "profit"
            ),
        )
        .orderBy("c_name", "s_city", "profit", "ticket")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q84 — income-band customer lookup through the returns fact
# --------------------------------------------------------------------------
@query(
    "tpcds_q84",
    oracle="""
    SELECT c.c_custkey AS customer_id,
           COALESCE(c.c_name, '') || ', ' || COALESCE(c.c_mktsegment, '')
             AS customername
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region rg ON rg.r_regionkey = n.n_regionkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE n.n_name = 'NATION_7'
      AND c.c_acctbal BETWEEN 3000 AND 8000
      AND rg.r_name = 'ASIA'
      AND l.l_returnflag = 'R'
    ORDER BY customer_id
    LIMIT 100
    """,
    doc="TPC-DS q84 shape (tpcds_3.2/q84.sql): pure dimension-chain lookup "
    "(customer -> address -> demographics -> income band) probed by the "
    "returns fact (sr_cdemo_sk join -> returned lineitems through "
    "orders), COALESCE'd concatenated display name, ordered by id. "
    "ca_city='Hopewell' -> nation, income band bounds -> acctbal band. "
    "Duplicate ids carry identical full rows, so the LIMIT cut is "
    "multiset-deterministic.",
)
def tpcds_q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, nation, region = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    dims = (
        customer.filter(F.col("c_acctbal").between(3000, 8000))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
    )
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(dims, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.col("c_custkey").alias("customer_id"),
            F.concat(
                F.coalesce(F.col("c_name"), F.lit("")),
                F.lit(", "),
                F.coalesce(F.col("c_mktsegment"), F.lit("")),
            ).alias("customername"),
        )
        .orderBy("customer_id")
        .limit(100)
    )


# --------------------------------------------------------------------------
# q85 — returns reason analysis under OR-blocks of demo/geo predicates
# --------------------------------------------------------------------------
@query(
    "tpcds_q85",
    oracle="""
    SELECT SUBSTR(o.o_orderpriority, 1, 20) AS reason,
           ROUND(AVG(s.l_quantity), 2) AS avg_quantity,
           ROUND(AVG(r.l_extendedprice * (1 - r.l_discount)), 2)
             AS avg_refunded,
           ROUND(AVG(r.l_extendedprice * r.l_tax), 2) AS avg_fee
    FROM (SELECT * FROM lineitem WHERE l_linestatus = 'O') s
    JOIN (SELECT * FROM lineitem WHERE l_returnflag = 'R') r
      ON s.l_orderkey = r.l_orderkey AND s.l_partkey = r.l_partkey
    JOIN orders o ON o.o_orderkey = s.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier su ON su.s_suppkey = r.l_suppkey
    JOIN nation n ON n.n_nationkey = su.s_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND ((c.c_mktsegment = 'BUILDING'
            AND s.l_extendedprice BETWEEN 10000 AND 40000)
        OR (c.c_mktsegment = 'AUTOMOBILE'
            AND s.l_extendedprice BETWEEN 20000 AND 60000)
        OR (c.c_mktsegment = 'MACHINERY'
            AND s.l_extendedprice BETWEEN 30000 AND 80000))
      AND ((n.n_name IN ('NATION_0', 'NATION_5', 'NATION_10')
            AND r.l_quantity BETWEEN 10 AND 40)
        OR (n.n_name IN ('NATION_1', 'NATION_6', 'NATION_11')
            AND r.l_quantity BETWEEN 20 AND 50)
        OR (n.n_name IN ('NATION_2', 'NATION_7', 'NATION_12')
            AND r.l_quantity BETWEEN 5 AND 45))
    GROUP BY 1
    ORDER BY reason, avg_quantity, avg_refunded, avg_fee
    LIMIT 100
    """,
    doc="TPC-DS q85 shape (tpcds_3.2/q85.sql): web sales paired with their "
    "returns, reason dim (-> order priority), two OR-of-three predicate "
    "blocks (marital/education x sales-price band -> mktsegment x price "
    "band; state-set x net-profit band -> nation-set x quantity band), "
    "per-reason averages of quantity/refund/fee.",
)
def tpcds_q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, supplier, nation = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    s = lineitem.filter(F.col("l_linestatus") == "O").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    r = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_partkey").alias("r_partkey"),
        F.col("l_suppkey").alias("r_suppkey"),
        F.col("l_quantity").alias("r_quantity"),
        F.col("l_extendedprice").alias("r_extendedprice"),
        F.col("l_discount").alias("r_discount"),
        F.col("l_tax").alias("r_tax"),
    )
    demo_block = (
        ((F.col("c_mktsegment") == "BUILDING")
         & F.col("l_extendedprice").between(10000, 40000))
        | ((F.col("c_mktsegment") == "AUTOMOBILE")
           & F.col("l_extendedprice").between(20000, 60000))
        | ((F.col("c_mktsegment") == "MACHINERY")
           & F.col("l_extendedprice").between(30000, 80000))
    )
    geo_block = (
        (F.col("n_name").isin("NATION_0", "NATION_5", "NATION_10")
         & F.col("r_quantity").between(10, 40))
        | (F.col("n_name").isin("NATION_1", "NATION_6", "NATION_11")
           & F.col("r_quantity").between(20, 50))
        | (F.col("n_name").isin("NATION_2", "NATION_7", "NATION_12")
           & F.col("r_quantity").between(5, 45))
    )
    return (
        s.join(
            r,
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_partkey") == F.col("r_partkey")),
        )
        .join(
            orders.filter(_in_years("o_orderdate", 1996)),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("r_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .filter(demo_block & geo_block)
        .groupBy(F.substring("o_orderpriority", 1, 20).alias("reason"))
        .agg(
            dround(F.avg("l_quantity"), 2).alias("avg_quantity"),
            dround(
                F.avg(F.col("r_extendedprice") * (1 - F.col("r_discount"))), 2
            ).alias("avg_refunded"),
            dround(F.avg(F.col("r_extendedprice") * F.col("r_tax")), 2).alias(
                "avg_fee"
            ),
        )
        .orderBy("reason", "avg_quantity", "avg_refunded", "avg_fee")
        .limit(100)
    )
