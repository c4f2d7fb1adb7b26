"""Analytics operator corpus — windows, rollup/cube/grouping-sets, set ops.

Covers SURVEY.md §2.D rows the TPC-H subset corpus doesn't exercise
(window frames, GROUPING SETS family, UNION/INTERSECT/EXCEPT, pivot),
mirroring the reference's TPC-DS evidence (q12/q20/q36/q44/q47... use
windows; q14a/q18/q22/q27/q36/q67 use rollup — SURVEY.md §2.D).

Determinism notes:
- events.ts is nano in parquet: Spark side reads via nanosAsLong → micros
  (session.load_table); oracles CAST to micros TIMESTAMP explicitly.
- windowed float sums are rounded on both sides; every window order has a
  unique tiebreaker (event_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table, load_tables
from kyuubi_spark.functions.compat import dround


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------
@query(
    "win_topn_per_group",
    oracle="""
    SELECT event_type, user_id, total_value, rnk FROM (
      SELECT event_type, user_id, total_value,
             RANK() OVER (PARTITION BY event_type
                          ORDER BY total_value DESC, user_id) AS rnk
      FROM (SELECT event_type, user_id,
                   ROUND(SUM(value), 2) AS total_value
            FROM events GROUP BY event_type, user_id) t
    ) ranked
    WHERE rnk <= 3
    ORDER BY event_type, rnk, user_id
    """,
    doc="Agg + rank() window, top-N per group (TPC-DS q44 shape).",
)
def win_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    totals = events.groupBy("event_type", "user_id").agg(
        dround(F.sum("value"), 2).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        totals.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("event_type", "rnk", "user_id")
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW), 2) AS running_value,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS BIGINT) AS seq
    FROM events
    WHERE user_id % 50 = 0
    """,
    doc="Cumulative frame (rows unbounded preceding) + row_number.",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        dround(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            2,
        ).alias("running_value"),
        F.row_number().over(w).cast("bigint").alias("seq"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg,
           ROUND(LAG(value, 1, 0.0) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 4) AS prev_value
    FROM events
    WHERE user_id % 50 = 1
    """,
    doc="Sliding row frame + lag() with default.",
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 1)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        dround(F.avg("value").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg"),
        dround(F.lag("value", 1, 0.0).over(w), 4).alias("prev_value"),
    )


@query(
    "win_sessionize",
    oracle="""
    SELECT user_id,
           CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM (
      SELECT user_id,
             SUM(CASE WHEN gap_sec IS NULL OR gap_sec > 3600 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               date_diff('second',
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                         ts) AS gap_sec
        FROM events) g
    ) s
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Gap-based sessionization: lag + conditional running sum (session ids).",
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # TIMESTAMP_NTZ has no direct long cast in Spark 4; hop through TIMESTAMP
    # (session tz is UTC, so the wall-clock value is preserved exactly).
    ts_sec = F.col("ts").cast("timestamp").cast("long")
    gap = ts_sec - F.lag(ts_sec).over(w)
    with_gap = events.withColumn("gap_sec", gap)
    sid = F.sum(
        F.when(F.col("gap_sec").isNull() | (F.col("gap_sec") > 3600), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        with_gap.withColumn("session_id", sid)
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# ROLLUP / CUBE / GROUPING SETS
# --------------------------------------------------------------------------
@query(
    "agg_rollup",
    oracle="""
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n
    FROM events
    GROUP BY ROLLUP (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
    """,
    doc="ROLLUP hierarchy (TPC-DS q18/q22/q67 shape).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("timestamp_ntz")
    )
    return events.rollup("event_type", "day").agg(
        dround(F.sum("value"), 2).alias("sum_value"), F.count("*").alias("n")
    )


@query(
    "agg_cube",
    oracle="""
    SELECT event_type, CAST(hour(ts) AS INT) AS hr,
           ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n
    FROM events
    GROUP BY CUBE (event_type, CAST(hour(ts) AS INT))
    """,
    doc="CUBE over (type, hour-of-day).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn(
        "hr", F.hour("ts").cast("int")
    )
    return events.cube("event_type", "hr").agg(
        dround(F.sum("value"), 2).alias("sum_value"), F.count("*").alias("n")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT event_type, source,
           ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n
    FROM (SELECT e.event_type, 'src' || CAST(e.user_id % 5 AS VARCHAR) AS source,
                 e.value
          FROM events e) t
    GROUP BY GROUPING SETS ((event_type), (source), (event_type, source))
    """,
    doc="Explicit GROUPING SETS (three groupings in one pass).",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type, source,
               ROUND(SUM(value), 2) AS sum_value, COUNT(*) AS n
        FROM (SELECT e.event_type,
                     CONCAT('src', CAST(e.user_id % 5 AS STRING)) AS source,
                     e.value
              FROM events e) t
        GROUP BY GROUPING SETS ((event_type), (source), (event_type, source))
        """
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
@query(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    ORDER BY user_id
    """,
    doc="INTERSECT (distinct semantics, TPC-DS q38 shape).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    erring = events.filter(F.col("event_type") == "error").select("user_id")
    return buyers.intersect(erring).orderBy("user_id")


@query(
    "set_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    ORDER BY user_id
    """,
    doc="EXCEPT (set difference).",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    signed = events.filter(F.col("event_type") == "signup").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    # subtract = EXCEPT DISTINCT (set semantics, matching the SQL oracle);
    # exceptAll would keep multiset remainders of repeat signups.
    return signed.subtract(buyers).orderBy("user_id")


@query(
    "set_union_all",
    oracle="""
    SELECT kind, COUNT(*) AS n FROM (
      SELECT 'click' AS kind FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT 'view' AS kind FROM events WHERE event_type = 'view'
    ) u GROUP BY kind ORDER BY kind
    """,
    doc="UNION ALL + re-aggregation.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.lit("click").alias("kind")
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.lit("view").alias("kind")
    )
    return clicks.unionAll(views).groupBy("kind").agg(F.count("*").alias("n")).orderBy("kind")


# --------------------------------------------------------------------------
# Pivot / time-bucketed aggregation / fact-dim join
# --------------------------------------------------------------------------
@query(
    "pivot_event_values",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           ROUND(SUM(CASE WHEN event_type = 'click'    THEN value ELSE 0 END), 2) AS click,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2) AS purchase,
           ROUND(SUM(CASE WHEN event_type = 'view'     THEN value ELSE 0 END), 2) AS view
    FROM events
    GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP)
    ORDER BY day
    """,
    doc="Pivot (wide conditional aggregate) by day.",
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("timestamp_ntz")
    )
    return (
        events.groupBy("day")
        .pivot("event_type", ["click", "purchase", "view"])
        .agg(dround(F.sum("value"), 2))
        .fillna(0.0, subset=["click", "purchase", "view"])
        .orderBy("day")
    )


@query(
    "time_bucket_agg",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value,
           ROUND(MIN(value), 4) AS min_value, ROUND(MAX(value), 4) AS max_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY CAST(date_trunc('hour', ts) AS TIMESTAMP), event_type
    ORDER BY bucket, event_type
    """,
    doc="Hourly time-bucket aggregation with range pushdown (hypertable rollup shape).",
)
def time_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(
            (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-12")
        )
        .groupBy(
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            dround(F.sum("value"), 2).alias("sum_value"),
            dround(F.min("value"), 4).alias("min_value"),
            dround(F.max("value"), 4).alias("max_value"),
        )
        .orderBy("bucket", "event_type")
    )


@query(
    "events_customer_join",
    oracle="""
    SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    ORDER BY c.c_mktsegment, e.event_type
    """,
    doc="Fact-dim join across event and TPC-H tables.",
)
def events_customer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return (
        events.join(customer, F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n"), dround(F.sum("value"), 2).alias("sum_value"))
        .orderBy("c_mktsegment", "event_type")
    )


@query(
    "distinct_users_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(DISTINCT user_id) AS unique_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP)
    ORDER BY day
    """,
    doc="COUNT(DISTINCT) per day (expanding distinct aggregate).",
)
def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("unique_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("day")
    )


@query(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS hll_within_5pct
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="approx_count_distinct (HLL++) — scale path for 100 TB distinct "
    "counts. DuckDB's HLL produces different estimates than Spark's, so "
    "the raw estimate has no exact oracle; instead the result surfaces "
    "the EXACT distinct count (value-checked) plus hll_within_5pct, the "
    "±5%-tolerance assertion evaluated Spark-side and pinned to TRUE in "
    "the oracle — an estimate drifting out of tolerance flips the "
    "boolean and fails the driver's value hash. The raw estimates are "
    "additionally asserted within ±5% in pytest (test_functions). At "
    "100 TB the HLL path is the one to run (fixed-size sketch, map-side "
    "combinable, no distinct shuffle explosion); the exact column here "
    "doubles as the correctness yardstick at test SFs.",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", 0.01)
    exact = F.countDistinct("user_id")
    return (
        events.groupBy("event_type")
        .agg(
            exact.alias("exact_users"),
            (
                F.abs(approx.cast("double") - exact.cast("double"))
                <= 0.05 * exact.cast("double")
            ).alias("hll_within_5pct"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Additional relational surface (SURVEY §2.D rows not covered by TPC-H subset)
# --------------------------------------------------------------------------
@query(
    "lateral_explode_tokens",
    oracle="""
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents) t
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
    doc="Generator expression (LATERAL VIEW explode / unnest) + re-aggregation.",
)
def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.trim("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


@query(
    "string_functions",
    oracle="""
    SELECT o_orderkey,
           UPPER(o_orderpriority)                       AS up,
           LOWER(o_orderstatus)                         AS lo,
           LPAD(CAST(o_orderkey AS VARCHAR), 8, '0')    AS padded,
           REPLACE(o_orderpriority, '-', '_')           AS repl,
           REVERSE(o_orderstatus)                       AS rev,
           INSTR(o_orderpriority, '-')                  AS pos,
           SUBSTR(o_orderpriority, 3)                   AS tail,
           CONCAT(o_orderstatus, '/', o_orderpriority)  AS joined,
           LENGTH(TRIM(o_orderpriority))                AS len
    FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
    """,
    doc="Scalar string function surface (SparkQueryTests builtin-functions parity).",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") <= 100)
        .select(
            "o_orderkey",
            F.upper("o_orderpriority").alias("up"),
            F.lower("o_orderstatus").alias("lo"),
            F.lpad(F.col("o_orderkey").cast("string"), 8, "0").alias("padded"),
            F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("repl"),
            F.reverse("o_orderstatus").alias("rev"),
            F.instr("o_orderpriority", "-").cast("bigint").alias("pos"),
            F.substring("o_orderpriority", 3, 1000000).alias("tail"),
            F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("joined"),
            F.length(F.trim(F.col("o_orderpriority"))).cast("bigint").alias("len"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + 30                                   AS plus_30d,
           CAST(EXTRACT(year  FROM o_orderdate) AS INT)                     AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT)                     AS mo,
           CAST(EXTRACT(day   FROM o_orderdate) AS INT)                     AS dy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)              AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT)
                                                                            AS days_to_eoy
    FROM orders WHERE o_orderkey <= 100 ORDER BY o_orderkey
    """,
    doc="Date/interval arithmetic: offsets, extract, trunc, datediff.",
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") <= 100)
        .select(
            "o_orderkey",
            F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus_30d"),
            F.year("o_orderdate").cast("int").alias("yr"),
            F.month("o_orderdate").cast("int").alias("mo"),
            F.dayofmonth("o_orderdate").cast("int").alias("dy"),
            F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
            F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date"))
            .cast("int")
            .alias("days_to_eoy"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "conditional_functions",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER')   AS seg,
           GREATEST(ROUND(c_acctbal, 2), 0.0)                    AS pos_bal,
           LEAST(CAST(c_nationkey AS INT), 10)                   AS capped_nation
    FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey
    """,
    doc="CASE / COALESCE / NULLIF / GREATEST / LEAST conditional surface.",
)
def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.filter(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .alias("tier"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias("seg"),
            F.greatest(dround("c_acctbal", 2), F.lit(0.0)).alias("pos_bal"),
            F.least(F.col("c_nationkey").cast("int"), F.lit(10)).alias("capped_nation"),
        )
        .orderBy("c_custkey")
    )


@query(
    "semi_anti_join",
    oracle="""
    SELECT 'with_orders' AS kind, COUNT(*) AS n
    FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS kind, COUNT(*) AS n
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY kind
    """,
    doc="Standalone LEFT SEMI / LEFT ANTI join (EXISTS / NOT EXISTS).",
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    on = F.col("o_custkey") == F.col("c_custkey")
    semi = customer.join(orders, on, "left_semi").agg(F.count("*").alias("n")).select(
        F.lit("with_orders").alias("kind"), "n"
    )
    anti = customer.join(orders, on, "left_anti").agg(F.count("*").alias("n")).select(
        F.lit("without_orders").alias("kind"), "n"
    )
    return semi.unionAll(anti).orderBy("kind")


@query(
    "json_variant_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           ROUND(CAST(AVG(k) AS DOUBLE), 2) AS avg_k,
           MAX(k) AS max_k
    FROM (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    ) x
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Semi-structured path extraction over the VARIANT surface "
    "(SchemaHelper.scala:38,54 maps Spark 4 VariantType; SURVEY §1.2): "
    "parse_json → variant_get stays in the JVM with no Python UDF, so the "
    "extraction is codegen'd per row group and aggregates partial+final.",
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long").alias("k")
    return (
        events.select("event_type", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            dround(F.avg("k"), 2).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "exact_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(CAST(quantile_cont(value, 0.50) AS DOUBLE), 2) AS p50,
           ROUND(CAST(quantile_cont(value, 0.95) AS DOUBLE), 2) AS p95,
           ROUND(CAST(quantile_cont(value, 0.99) AS DOUBLE), 2) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Exact continuous percentiles (linear interpolation) per group — the "
    "exact twin of approx_distinct_users' sketch path. At scale prefer "
    "percentile_approx (mergeable t-digest-style sketch, map-side partials); "
    "exact percentile shuffles all values to the group's reducer.",
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            dround(F.percentile("value", 0.50), 2).alias("p50"),
            dround(F.percentile("value", 0.95), 2).alias("p95"),
            dround(F.percentile("value", 0.99), 2).alias("p99"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# TPC-DS-shaped composites (the shapes the reference's 99-query corpus adds
# over TPC-H: CTE + correlated per-group average filter (q1), best/worst
# rank self-join (q44), cumulative-share windows (q51). Money sums run in
# DECIMAL so threshold compares are exact across engines.
# --------------------------------------------------------------------------
@query(
    "tpcds_shape_avg_filter",
    oracle="""
    WITH ctr AS (
      SELECT o_custkey AS cust, c_nationkey AS nat,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2),
    natagg AS (
      SELECT nat, SUM(total) AS sum_nat, COUNT(*) AS n_nat
      FROM ctr GROUP BY nat)
    SELECT c.c_name AS c_name, CAST(ctr.total AS DOUBLE) AS total
    FROM ctr
    JOIN natagg ON natagg.nat = ctr.nat
    JOIN customer c ON ctr.cust = c.c_custkey
    WHERE 10 * ctr.total * natagg.n_nat > 12 * natagg.sum_nat
    ORDER BY total DESC, c_name LIMIT 100
    """,
    doc="TPC-DS q1 shape: CTE totals, keep customers above 1.2x their "
    "nation's average spend (decorrelated into a per-nation aggregate "
    "join; the integer-scaled decimal compare is exact on both engines).",
)
def tpcds_shape_avg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    ctr = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("o_custkey").alias("cust"), F.col("c_nationkey").alias("nat"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total"))
    )
    natagg = ctr.groupBy("nat").agg(
        F.sum("total").alias("sum_nat"), F.count("*").alias("n_nat")
    )
    return (
        ctr.join(natagg, "nat")
        .filter(10 * F.col("total") * F.col("n_nat") > 12 * F.col("sum_nat"))
        .join(customer, F.col("cust") == customer.c_custkey)
        .select("c_name", F.col("total").cast("double").alias("total"))
        .orderBy(F.desc("total"), "c_name")
        .limit(100)
    )


@query(
    "tpcds_shape_rank_bestworst",
    oracle="""
    WITH perf AS (
      SELECT l_partkey,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*), 4) AS avg_price
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT l_partkey, avg_price,
             ROW_NUMBER() OVER (ORDER BY avg_price DESC, l_partkey) AS best_r,
             ROW_NUMBER() OVER (ORDER BY avg_price ASC,  l_partkey) AS worst_r
      FROM perf)
    SELECT b.best_r AS rnk,
           pb.p_name AS best_part, CAST(b.avg_price AS DOUBLE) AS best_avg,
           pw.p_name AS worst_part, CAST(w.avg_price AS DOUBLE) AS worst_avg
    FROM ranked b
    JOIN ranked w ON b.best_r = w.worst_r
    JOIN part pb ON pb.p_partkey = b.l_partkey
    JOIN part pw ON pw.p_partkey = w.l_partkey
    WHERE b.best_r <= 10
    ORDER BY rnk
    """,
    doc="TPC-DS q44 shape: rank parts by average revenue both directions, "
    "join best rank N with worst rank N, resolve names from the dim.",
)
def tpcds_shape_rank_bestworst(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    perf = lineitem.groupBy("l_partkey").agg(
        dround(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            / F.count("*"),
            4,
        ).alias("avg_price")
    )
    # Only ranks <= 10 survive, so take the top/bottom 10 with distributed
    # partial top-k (TakeOrderedAndProject) and number the 10 survivors —
    # never a global row_number over every part (single-partition window
    # at scale; the limit(10) keeps each window input at 10 rows).
    top10 = perf.orderBy(F.desc("avg_price"), "l_partkey").limit(10)
    bot10 = perf.orderBy(F.asc("avg_price"), "l_partkey").limit(10)
    b = top10.select(
        "l_partkey", "avg_price",
        F.row_number()
        .over(Window.orderBy(F.desc("avg_price"), "l_partkey"))
        .alias("best_r"),
    ).alias("b")
    w = bot10.select(
        "l_partkey", "avg_price",
        F.row_number()
        .over(Window.orderBy(F.asc("avg_price"), "l_partkey"))
        .alias("worst_r"),
    ).alias("w")
    return (
        b.join(w, F.col("b.best_r") == F.col("w.worst_r"))
        .join(part.alias("pb"), F.col("pb.p_partkey") == F.col("b.l_partkey"))
        .join(part.alias("pw"), F.col("pw.p_partkey") == F.col("w.l_partkey"))
        .select(
            F.col("b.best_r").alias("rnk"),
            F.col("pb.p_name").alias("best_part"),
            F.col("b.avg_price").cast("double").alias("best_avg"),
            F.col("pw.p_name").alias("worst_part"),
            F.col("w.avg_price").cast("double").alias("worst_avg"),
        )
        .orderBy("rnk")
    )


@query(
    "tpcds_shape_cumulative_share",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
             SUM(CAST(value AS DECIMAL(18,6))) AS v
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY 1, 2),
    pivoted AS (
      SELECT day,
             SUM(CASE WHEN event_type = 'click' THEN v ELSE 0 END) AS click_v,
             SUM(CASE WHEN event_type = 'purchase' THEN v ELSE 0 END) AS purch_v
      FROM daily GROUP BY day)
    SELECT day,
           CAST(SUM(click_v) OVER w AS DOUBLE) AS cum_click,
           CAST(SUM(purch_v) OVER w AS DOUBLE) AS cum_purchase,
           SUM(click_v) OVER w > SUM(purch_v) OVER w AS click_leads
    FROM pivoted
    WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY day
    """,
    doc="TPC-DS q51 shape: two channels pivoted per day, running totals "
    "compared in one window pass (decimal running sums are order-exact).",
)
def tpcds_shape_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.date_trunc("day", "ts").cast("timestamp_ntz").alias("day"),
            "event_type",
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("v"))
    )
    pivoted = daily.groupBy("day").agg(
        F.sum(F.when(F.col("event_type") == "click", F.col("v")).otherwise(0)).alias("click_v"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("v")).otherwise(0)).alias("purch_v"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_c, cum_p = F.sum("click_v").over(w), F.sum("purch_v").over(w)
    return pivoted.select(
        "day",
        cum_c.cast("double").alias("cum_click"),
        cum_p.cast("double").alias("cum_purchase"),
        (cum_c > cum_p).alias("click_leads"),
    ).orderBy("day")


@query(
    "asof_join_events_orders",
    oracle="""
    WITH r AS (
      SELECT o_custkey AS user_id,
             CAST(o_orderdate AS TIMESTAMP) AS od,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_spend,
             MAX(o_orderkey) AS last_order
      FROM orders GROUP BY 1, 2)
    SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
           r.last_order, r.day_spend
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.user_id AND e.ts >= r.od
    WHERE e.event_type = 'purchase'
    ORDER BY e.event_id
    """,
    doc="Backward as-of join (time-series point-in-time enrich): each "
    "purchase event picks up the customer's most recent order day at or "
    "before the event. Spark has no ASOF JOIN; composed as union + "
    "last-ignorenulls window (operators/asof.py) — one shuffle on the key, "
    "O(1) window state per key. Oracle uses DuckDB's native ASOF JOIN.",
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.operators.asof import asof_join

    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("od"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("day_spend"),
        F.max("o_orderkey").alias("last_order"),
    )
    out = asof_join(
        events.select("event_id", "user_id", "ts"),
        daily,
        on="user_id",
        left_time="ts",
        right_time="od",
        payload_cols=["last_order", "day_spend"],
    )
    return out.select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"),
        "last_order", "day_spend",
    ).orderBy("event_id")


@query(
    "range_join_incident_clicks",
    oracle="""
    SELECT e.event_id AS incident_id, COUNT(c.event_id) AS n_clicks
    FROM events e LEFT JOIN events c
      ON c.event_type = 'click'
     AND c.ts >= e.ts AND c.ts <= e.ts + INTERVAL 30 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY 1 ORDER BY 1
    """,
    doc="Range (interval) join without an equi-key: clicks landing inside "
    "each error event's 30-minute incident window. A bare range predicate "
    "plans BroadcastNestedLoop (O(L*R)); operators/range_join.py quantizes "
    "time into buckets, explodes each interval over the <=2 buckets it "
    "covers, hash-joins on the bucket, then re-checks the exact predicate "
    "- linear shuffle at any scale.",
)
def range_join_incident_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.operators.range_join import bucketed_range_join

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts"
    )
    incidents = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts").cast("timestamp") + F.expr("INTERVAL 30 MINUTE")).alias("w_end"),
    )
    matched = bucketed_range_join(
        clicks, incidents, "ts", "w_start", "w_end", bucket_seconds=1800
    ).groupBy("incident_id").agg(F.count("*").alias("n"))
    return (
        incidents.select("incident_id")
        .join(matched, "incident_id", "left")
        .select(
            "incident_id", F.coalesce(F.col("n"), F.lit(0)).alias("n_clicks")
        )
        .orderBy("incident_id")
    )


@query(
    "win_range_frame",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events WHERE user_id % 50 = 1)
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           ROUND(CAST(SUM(v) OVER w AS DOUBLE), 4) AS sum_last_hour
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    doc="Event-time RANGE window frame (TPC-DS q51-family shape): per user, "
    "rolling 1-hour count/sum keyed on epoch-microseconds — a value-range "
    "frame, not a row-count frame, so ties and gaps behave identically in "
    "any engine. Partitioned by user: state stays per-key, no global sort. "
    "Decimal window sums are order-exact across partitionings.",
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 1)
    e = events.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_last_hour"),
        dround(F.sum("v").over(w).cast("double"), 4).alias("sum_last_hour"),
    ).orderBy("event_id")


@query(
    "set_intersect_except_all",
    oracle="""
    WITH ia AS (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'click'),
    ea AS (
      SELECT user_id FROM events WHERE event_type = 'click'
      EXCEPT ALL
      SELECT user_id FROM events WHERE event_type = 'purchase')
    SELECT 'intersect_all' AS op, user_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM ia GROUP BY 2
    UNION ALL
    SELECT 'except_all' AS op, user_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM ea GROUP BY 2
    ORDER BY op, user_id
    """,
    doc="Multiset INTERSECT ALL / EXCEPT ALL (TPC-DS q14/q38 'ALL' "
    "variants): per-row multiplicities min(a,b) and a-b survive, unlike the "
    "distinct set ops. Spark plans both as a single aggregate+join of "
    "per-key counts — no row explosion at any scale.",
)
def set_intersect_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    clicks = events.filter(F.col("event_type") == "click").select("user_id")
    ia = (
        buyers.intersectAll(clicks)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "user_id", "n")
    )
    ea = (
        clicks.exceptAll(buyers)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "user_id", "n")
    )
    return ia.unionByName(ea).orderBy("op", "user_id")


@query(
    "null_safe_join",
    oracle="""
    WITH a AS (
      SELECT user_id,
             CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % 5 END AS k,
             COUNT(*) AS n_a
      FROM events WHERE event_type = 'click' GROUP BY 1, 2),
    b AS (
      SELECT user_id,
             CASE WHEN user_id % 7 = 0 THEN NULL ELSE user_id % 5 END AS k,
             COUNT(*) AS n_b
      FROM events WHERE event_type = 'error' GROUP BY 1, 2)
    SELECT a.user_id, a.k, a.n_a, b.n_b
    FROM a JOIN b ON a.user_id = b.user_id AND a.k IS NOT DISTINCT FROM b.k
    ORDER BY a.user_id
    """,
    doc="NULL-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other, unlike plain =. Same hash-join physical plan — "
    "NULLs hash to one bucket, so heavily-NULL keys would need the salting "
    "operator at scale.",
)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.when(F.col("user_id") % 7 == 0, F.lit(None)).otherwise(F.col("user_id") % 5)
    a = (
        events.filter(F.col("event_type") == "click")
        .groupBy(F.col("user_id"), k.alias("k"))
        .agg(F.count("*").alias("n_a"))
    )
    b = (
        events.filter(F.col("event_type") == "error")
        .groupBy(F.col("user_id"), k.alias("k"))
        .agg(F.count("*").alias("n_b"))
        .select(F.col("user_id").alias("user_id_b"), F.col("k").alias("k_b"), "n_b")
    )
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_id_b")) & F.col("k").eqNullSafe(F.col("k_b")),
        )
        .select("user_id", "k", "n_a", "n_b")
        .orderBy("user_id")
    )


@query(
    "agg_grouping_id",
    oracle="""
    SELECT event_type, source,
           CAST(GROUPING(event_type) * 2 + GROUPING(source) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM (SELECT event_type, user_id % 3 AS source FROM events) t
    GROUP BY GROUPING SETS ((event_type, source), (event_type), ())
    ORDER BY gid, event_type NULLS FIRST, source NULLS FIRST
    """,
    doc="GROUPING/GROUPING_ID disambiguation: distinguishes 'NULL because "
    "rolled up' from 'NULL in the data' — the standard cube-consumer "
    "contract (TPC-DS q27/q36 use it for level filtering).",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 3).alias("source")
    )
    return (
        events.groupingSets(
            [["event_type", "source"], ["event_type"], []],
            "event_type", "source",
        )
        .agg(
            (F.grouping("event_type") * 2 + F.grouping("source"))
            .cast("bigint")
            .alias("gid"),
            F.count("*").alias("n"),
        )
        .orderBy(
            "gid",
            F.col("event_type").asc_nulls_first(),
            F.col("source").asc_nulls_first(),
        )
    )


@query(
    "win_distribution",
    oracle="""
    WITH spend AS (
      SELECT user_id, ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS total
      FROM events WHERE event_type = 'purchase' GROUP BY user_id)
    SELECT user_id, CAST(total AS DOUBLE) AS total,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(FIRST_VALUE(user_id) OVER wf AS BIGINT) AS top_spender,
           CAST(NTH_VALUE(user_id, 2) OVER wf AS BIGINT) AS runner_up
    FROM spend
    WINDOW w  AS (ORDER BY total DESC, user_id),
           wf AS (ORDER BY total DESC, user_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY total DESC, user_id
    """,
    doc="Window distribution functions (ntile/percent_rank/cume_dist/"
    "first_value/nth_value — TPC-DS q49/q51-family): spender quartiles. "
    "The per-user spend relation is DATA-SCALED, so no bare "
    "Window.orderBy: exact global row numbers come from the two-phase "
    "distributed ranker (operators/ranking.py — range-bucketed local "
    "row_number + broadcast prefix offsets), and ntile/percent_rank/"
    "cume_dist derive from (rn, N) in closed form map-side; the sort key "
    "(total desc, user_id) is total, so rank()==row_number and "
    "cume_dist==rn/N exactly. first/nth_value over the full frame reduce "
    "to the rn=1/rn=2 rows, cross-joined back as a broadcast scalar.",
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.operators.ranking import global_row_number, ntile_expr

    events = load_table(spark, sf_dir, "events")
    spend = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(dround(F.sum(F.col("value").cast("decimal(18,6)")), 2).alias("total"))
    )
    ranked, n = global_row_number(
        spend, [("total", "desc"), ("user_id", "asc")], rn_col="rn"
    )
    rn = F.col("rn")
    tops = ranked.filter(rn <= 2).agg(
        F.max(F.when(rn == 1, F.col("user_id"))).alias("top_u"),
        F.max(F.when(rn == 2, F.col("user_id"))).alias("runner_u"),
    )
    return (
        ranked.crossJoin(F.broadcast(tops))
        .select(
            "user_id",
            F.col("total").cast("double").alias("total"),
            ntile_expr(rn, n, 4).alias("quartile"),
            dround((rn - 1) / F.lit(max(n - 1, 1)), 6).alias("pct_rank"),
            dround(rn / F.lit(n), 6).alias("cume"),
            F.col("top_u").cast("bigint").alias("top_spender"),
            F.col("runner_u").cast("bigint").alias("runner_up"),
        )
        .orderBy(F.col("total").desc(), "user_id")
    )

@query(
    "funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click,
           (SELECT COUNT(*) FROM p) AS n_purchase,
           ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 4) AS view_to_click,
           ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                 / NULLIF((SELECT COUNT(*) FROM c), 0), 4) AS click_to_purchase
    """,
    doc="Ordered funnel analysis (view -> later click -> later purchase per "
    "user): each stage is a min-timestamp aggregate gated by the previous "
    "stage's time — three user-keyed aggregations and joins, no window "
    "over the whole event stream, so each stage shrinks the data and the "
    "shuffles stay keyed on user_id at any scale.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def stage(event_type, prev=None, prev_t=None):
        base = events.filter(F.col("event_type") == event_type)
        if prev is not None:
            base = base.join(prev, "user_id").filter(F.col("ts") > F.col(prev_t))
        return base.groupBy("user_id").agg(F.min("ts").alias(f"t_{event_type}"))

    v = stage("view")
    c = stage("click", v, "t_view")
    p = stage("purchase", c, "t_click")
    nv = v.agg(F.count("*").alias("n_view"))
    nc = c.agg(F.count("*").alias("n_click"))
    np_ = p.agg(F.count("*").alias("n_purchase"))
    return (
        nv.join(F.broadcast(nc))
        .join(F.broadcast(np_))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            dround(F.col("n_click") / F.col("n_view"), 4).alias("view_to_click"),
            dround(
                F.col("n_purchase") / F.nullif(F.col("n_click"), F.lit(0)), 4
            ).alias("click_to_purchase"),
        )
    )

@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             MIN(date_trunc('month', o_orderdate)) AS cohort_month
      FROM orders GROUP BY o_custkey),
    activity AS (
      SELECT DISTINCT o.o_custkey, f.cohort_month,
             date_diff('month', f.cohort_month,
                       date_trunc('month', o.o_orderdate)) AS months_since
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey)
    SELECT CAST(cohort_month AS TIMESTAMP) AS cohort_month,
           CAST(months_since AS BIGINT) AS months_since,
           COUNT(*) AS n_active
    FROM activity
    WHERE months_since <= 6
    GROUP BY 1, 2 ORDER BY cohort_month, months_since
    """,
    doc="Monthly cohort retention matrix: cohort = each customer's first "
    "order month, cells count customers still ordering N months later "
    "(clipped to 6). Two customer-keyed aggregations and one join — the "
    "firsts side is per-customer (small) and broadcastable against the "
    "fact at any scale.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    activity = (
        orders.join(firsts, "o_custkey")
        .select(
            "o_custkey",
            "cohort_month",
            (
                (F.year("o_orderdate") - F.year("cohort_month")) * 12
                + (F.month("o_orderdate") - F.month("cohort_month"))
            ).cast("bigint").alias("months_since"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("months_since") <= 6)
        .groupBy(
            F.col("cohort_month").cast("timestamp_ntz").alias("cohort_month"),
            "months_since",
        )
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort_month", "months_since")
    )

@query(
    "events_anomaly_zscore",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type,
             AVG(n) AS mu,
             stddev_pop(n) AS sigma
      FROM hourly GROUP BY event_type)
    SELECT h.event_type AS event_type, CAST(h.hr AS TIMESTAMP) AS hr,
           h.n AS n,
           ROUND((h.n - s.mu) / NULLIF(s.sigma, 0), 4) AS zscore
    FROM hourly h JOIN stats s ON h.event_type = s.event_type
    WHERE ABS((h.n - s.mu) / NULLIF(s.sigma, 0)) >= 2
    ORDER BY event_type, hr
    """,
    doc="Rate-anomaly detection: hourly event counts z-scored against each "
    "type's own mean/stddev, keeping |z| >= 2 outliers. Aggregate-of-"
    "aggregate with a broadcastable per-type stats side; population stddev "
    "over integer counts divides identically in both engines.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"))
    stats = hourly.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_pop("n").alias("sigma")
    )
    z = F.col("n") - F.col("mu")
    zscore = z / F.nullif(F.col("sigma"), F.lit(0.0))
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .filter(F.abs(zscore) >= 2)
        .select(
            "event_type",
            F.col("hr").cast("timestamp_ntz").alias("hr"),
            "n",
            dround(zscore, 4).alias("zscore"),
        )
        .orderBy("event_type", "hr")
    )

@query(
    "rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             ROUND(SUM(o_totalprice), 2) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey,
             NTILE(4) OVER (ORDER BY last_order, o_custkey) AS r_quartile,
             NTILE(4) OVER (ORDER BY frequency, o_custkey) AS f_quartile,
             NTILE(4) OVER (ORDER BY monetary, o_custkey) AS m_quartile
      FROM per_cust)
    SELECT CAST(r_quartile AS INT) AS r_quartile,
           CAST(f_quartile AS INT) AS f_quartile,
           CAST(m_quartile AS INT) AS m_quartile,
           COUNT(*) AS n_customers
    FROM scored
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    doc="RFM customer segmentation: per-customer recency/frequency/monetary "
    "aggregates quartiled with NTILE (unique o_custkey tiebreak makes the "
    "tiling deterministic across engines), rolled up to segment sizes. "
    "Customer cardinality is DATA-SCALED, so the three NTILEs never run "
    "as bare Window.orderBy single-partition sorts: each axis gets an "
    "exact global row number from the two-phase distributed ranker "
    "(operators/ranking.py) chained on the same relation, and the "
    "quartile derives from (rn, N) in closed form map-side.",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.operators.ranking import global_row_numbers, ntile_expr

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        dround(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    # three independent total orders -> one multi-axis exact ranking (all
    # three axes share the two bounded driver passes; no global window)
    ranked, n = global_row_numbers(
        per_cust,
        {
            "rn_r": [("last_order", "asc"), ("o_custkey", "asc")],
            "rn_f": [("frequency", "asc"), ("o_custkey", "asc")],
            "rn_m": [("monetary", "asc"), ("o_custkey", "asc")],
        },
    )
    scored = ranked.select(
        "o_custkey",
        ntile_expr(F.col("rn_r"), n, 4).alias("r_quartile"),
        ntile_expr(F.col("rn_f"), n, 4).alias("f_quartile"),
        ntile_expr(F.col("rn_m"), n, 4).alias("m_quartile"),
    )
    return (
        scored.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


@query(
    "unpivot_daily_metrics",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2)
    SELECT day, event_type, metric, value
    FROM (UNPIVOT d ON n, users, cents INTO NAME metric VALUE value)
    ORDER BY day, event_type, metric
    """,
    doc="UNPIVOT (wide-to-long melt, the inverse of PIVOT): daily "
    "per-type metrics (count / distinct users / cent sum) melted into "
    "(metric, value) rows via DataFrame.unpivot — Spark's native melt, "
    "matching ANSI/DuckDB UNPIVOT. All metrics are integers so the "
    "single value column needs no float parity care. One group-by "
    "shuffle; the melt itself is a map-only expand (3x rows, no "
    "exchange).",
)
def unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    d = (
        events.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("users"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    return d.unpivot(
        ids=["day", "event_type"],
        values=["n", "users", "cents"],
        variableColumnName="metric",
        valueColumnName="value",
    ).orderBy("day", "event_type", "metric")
