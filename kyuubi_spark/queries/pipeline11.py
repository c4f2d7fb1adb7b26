"""Pipeline batch 11 — sequence, audit and change-detection analytics.

Round-10 widening of the analytics surface: user-journey transition
matrices (the Markov view of the event stream), Benford first-digit
fraud/quality auditing, and CUSUM change-point detection over the
revenue series.  Every plan is keyed-aggregate + broadcast; the only
unpartitioned windows run over calendar-bounded rollups
(audit-allowlisted, same class as ts_gap_fill).

Reference scope: extends the engine the way SURVEY.md §2's
beyond-operator pipeline set sanctions; oracle-parity conventions
follow queries/pipeline.py (integer-exact arithmetic wherever a
cumulative would otherwise compound float error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.queries import query


@query(
    "markov_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events),
    trans AS (
      SELECT from_type, to_type, COUNT(*) AS n_trans
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY 1, 2),
    tot AS (
      SELECT from_type, SUM(n_trans) AS n_from
      FROM trans GROUP BY 1)
    SELECT trans.from_type, trans.to_type,
           CAST(trans.n_trans AS BIGINT) AS n_trans,
           ROUND(CAST(trans.n_trans AS DOUBLE) / tot.n_from, 6) AS prob
    FROM trans JOIN tot USING (from_type)
    ORDER BY from_type, to_type
    """,
    doc="User-journey transition matrix — the Markov view of the event "
    "stream: P(next event type | current event type) from per-user "
    "time-ordered sequences (ties broken by event_id for a total "
    "order). Plan: one LEAD window PARTITIONED BY user_id (keyed — "
    "shuffles once on the natural session key, no global ordering), "
    "then a (from,to)-keyed count and a broadcast join against the "
    "per-from totals (|event types|^2 rows). At 100 TB the only "
    "corpus-scaled stage is the user-keyed window, which AQE can "
    "coalesce freely; the matrix itself is O(types^2).",
)
def markov_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    trans = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_trans"))
    )
    tot = trans.groupBy("from_type").agg(F.sum("n_trans").alias("n_from"))
    return (
        trans.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n_trans").cast("bigint").alias("n_trans"),
            dround(
                F.col("n_trans").cast("double") / F.col("n_from"), 6
            ).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "benford_digit_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                         AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders WHERE o_totalprice >= 1),
    c AS (SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY 1),
    g AS (SELECT SUM(n_orders) AS total FROM c)
    SELECT c.digit,
           CAST(c.n_orders AS BIGINT) AS n_orders,
           ROUND(CAST(c.n_orders AS DOUBLE) / g.total, 6) AS obs_share,
           ROUND(log10(1.0 + 1.0 / c.digit), 6) AS benford_share,
           ROUND(g.total
                 * pow(CAST(c.n_orders AS DOUBLE) / g.total
                       - log10(1.0 + 1.0 / c.digit), 2)
                 / log10(1.0 + 1.0 / c.digit), 4) AS chi_term
    FROM c, g ORDER BY c.digit
    """,
    doc="Benford first-digit audit — the classic fraud/data-quality "
    "screen: the leading digit of every order total against Benford's "
    "log10(1+1/d) law, with per-digit chi-square contributions so an "
    "auditor sees WHICH digit band deviates. The digit is extracted "
    "from the BIGINT floor's decimal string (integer-exact in both "
    "engines — no float log10 at the extraction step, which can "
    "misround at exact powers of ten). Plan: one map-side digit "
    "projection + a 9-row keyed count + a broadcast grand total; "
    "at 100 TB this is a single scan with map-side combine.",
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    d = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").alias("n_orders"))
    g = c.agg(F.sum("n_orders").alias("total"))
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    obs = F.col("n_orders").cast("double") / F.col("total")
    return (
        c.crossJoin(F.broadcast(g))
        .select(
            "digit",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            dround(obs, 6).alias("obs_share"),
            dround(benford, 6).alias("benford_share"),
            dround(
                F.col("total") * F.pow(obs - benford, F.lit(2.0)) / benford, 4
            ).alias("chi_term"),
        )
        .orderBy("digit")
    )


@query(
    "cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1),
    g AS (SELECT SUM(cents) AS total, COUNT(*) AS n FROM daily),
    pre AS (
      SELECT day, cents,
             SUM(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
             ROW_NUMBER() OVER (ORDER BY day) AS t
      FROM daily),
    c AS (
      SELECT pre.day, pre.cents,
             pre.n * pre.prefix - pre.t * pre.total AS ckey
      FROM (SELECT pre.*, g.n, g.total FROM pre, g) pre),
    ranked AS (
      SELECT day, cents, ckey,
             ROW_NUMBER() OVER (ORDER BY abs(ckey) DESC, day) AS rn
      FROM c)
    SELECT CAST(rn AS INTEGER) AS rn, day,
           ROUND(cents / 100.0, 2) AS revenue,
           ROUND(ckey / (100.0 * (SELECT n FROM g)), 4) AS cusum
    FROM ranked WHERE rn <= 10 ORDER BY rn
    """,
    doc="CUSUM change-point detection over the daily revenue series: "
    "S_t = prefix_t - t*mean, reported as the top-10 days by |S_t| — "
    "where the cumulative drift against the long-run mean peaks is "
    "where the level shifted. The whole recursion is INTEGER-EXACT: "
    "revenue is summed in cents (BIGINT), and S_t is kept as the "
    "scaled integer n*prefix_t - t*total so no float accumulates "
    "across the series (cross-engine float drift over a 2399-step "
    "cumulative would otherwise flip round() at boundaries). Plan: a "
    "day-keyed aggregate (map-side combined) collapses the corpus to "
    "one row per calendar day; the cumulative windows run over that "
    "calendar-bounded rollup (<=2557 rows for the 7-year range, "
    "audit-allowlisted — same class as ts_gap_fill), never the corpus.",
)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        ).alias("cents")
    )
    g = daily.agg(F.sum("cents").alias("total"), F.count("*").alias("n"))
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w_cum).alias("prefix"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
    )
    c = pre.crossJoin(F.broadcast(g)).select(
        "day",
        "cents",
        "n",
        (F.col("n") * F.col("prefix") - F.col("t") * F.col("total")).alias(
            "ckey"
        ),
    )
    ranked = c.select(
        "day",
        "cents",
        "n",
        "ckey",
        F.row_number()
        .over(Window.orderBy(F.abs(F.col("ckey")).desc(), F.col("day")))
        .alias("rn"),
    ).filter(F.col("rn") <= 10)
    return ranked.select(
        F.col("rn").cast("int").alias("rn"),
        "day",
        dround(F.col("cents") / 100.0, 2).alias("revenue"),
        dround(F.col("ckey") / (100.0 * F.col("n")), 4).alias("cusum"),
    ).orderBy("rn")
