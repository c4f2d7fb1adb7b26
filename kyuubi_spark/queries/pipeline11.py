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


@query(
    "market_basket_lift",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM op),
    pc AS (SELECT pk, COUNT(*) AS n_p FROM op GROUP BY 1),
    pairs AS (
      SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n_pair
      FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2)
    SELECT CAST(pairs.pa AS BIGINT) AS pa, CAST(pairs.pb AS BIGINT) AS pb,
           CAST(pairs.n_pair AS BIGINT) AS n_pair,
           CAST(ca.n_p AS BIGINT) AS n_a, CAST(cb.n_p AS BIGINT) AS n_b,
           ROUND(CAST(pairs.n_pair AS DOUBLE) / n.n_orders, 6) AS support,
           ROUND(CAST(pairs.n_pair AS DOUBLE) / ca.n_p, 6) AS confidence,
           ROUND(CAST(pairs.n_pair AS DOUBLE) * n.n_orders
                 / (ca.n_p * cb.n_p), 4) AS lift
    FROM pairs JOIN pc ca ON ca.pk = pairs.pa
               JOIN pc cb ON cb.pk = pairs.pb, n
    ORDER BY (CAST(pairs.n_pair AS DOUBLE) * n.n_orders
              / (ca.n_p * cb.n_p)) DESC, pa, pb
    LIMIT 20
    """,
    doc="Market-basket association mining: co-purchased part pairs with "
    "support / confidence / lift, top-20 by lift among pairs seen at "
    "least twice. Plan: the pair space is generated by an ORDER-KEYED "
    "self-join of the distinct (order, part) projection — per-order "
    "line counts are spec-bounded (<=7 parts/order in TPC-H), so the "
    "join emits O(orders * 21) rows and never goes all-pairs over the "
    "part catalog; per-part priors ride a broadcast join (parts << "
    "facts), the final top-20 is TakeOrderedAndProject (no global "
    "window). Lift is ordered on the exact double expression "
    "(n_pair * n_orders)/(n_a * n_b) with (pa, pb) as total tiebreak "
    "so the LIMIT is deterministic cross-engine.",
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n = op.agg(F.countDistinct("ok").alias("n_orders"))
    pc = op.groupBy("pk").agg(F.count("*").alias("n_p"))
    a = op.alias("a")
    b = op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(
            F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb")
        )
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= 2)
    )
    ca = pc.select(F.col("pk").alias("pa"), F.col("n_p").alias("ca_n"))
    cb = pc.select(F.col("pk").alias("pb"), F.col("n_p").alias("cb_n"))
    lift = (
        F.col("n_pair").cast("double") * F.col("n_orders")
        / (F.col("ca_n") * F.col("cb_n"))
    )
    return (
        pairs.join(F.broadcast(ca), "pa")
        .join(F.broadcast(cb), "pb")
        .crossJoin(F.broadcast(n))
        .orderBy(lift.desc(), "pa", "pb")
        .limit(20)
        .select(
            F.col("pa").cast("bigint").alias("pa"),
            F.col("pb").cast("bigint").alias("pb"),
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.col("ca_n").cast("bigint").alias("n_a"),
            F.col("cb_n").cast("bigint").alias("n_b"),
            dround(
                F.col("n_pair").cast("double") / F.col("n_orders"), 6
            ).alias("support"),
            dround(
                F.col("n_pair").cast("double") / F.col("ca_n"), 6
            ).alias("confidence"),
            dround(lift, 4).alias("lift"),
        )
    )


@query(
    "ab_test_zscore",
    oracle="""
    WITH assign AS (
      SELECT c_custkey, (c_custkey * 2654435761) % 2 AS variant
      FROM customer),
    conv AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT'),
    agg AS (
      SELECT
        SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
        SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
        SUM(CASE WHEN variant = 0 AND conv.o_custkey IS NOT NULL
                 THEN 1 ELSE 0 END) AS conv_a,
        SUM(CASE WHEN variant = 1 AND conv.o_custkey IS NOT NULL
                 THEN 1 ELSE 0 END) AS conv_b
      FROM assign LEFT JOIN conv ON conv.o_custkey = assign.c_custkey)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(conv_a AS BIGINT) AS conv_a,
           CAST(conv_b AS BIGINT) AS conv_b,
           ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           ROUND((CAST(conv_a AS DOUBLE) / n_a
                  - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                               / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 4) AS z_score
    FROM agg
    """,
    doc="Two-proportion A/B test: customers are hash-assigned to "
    "variants (Knuth multiplicative hash on the key — deterministic, "
    "balanced, and reproducible across engines, the same trick "
    "train_test_split uses), conversion is 'placed an URGENT-priority "
    "order', and the pooled two-proportion z-score tests the rate gap. "
    "Plan: one distinct-converter projection left-joined (key-equi) to "
    "the assignment, collapsed by ONE map-side conditional aggregate "
    "to a single row — no window anywhere. At 100 TB the join is the "
    "only shuffle and AQE can broadcast the converter side when the "
    "conversion event is rare.",
)
def ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    assign = cust.select(
        "c_custkey",
        ((F.col("c_custkey") * F.lit(2654435761)) % 2).alias("variant"),
    )
    conv = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    joined = assign.join(
        conv, assign.c_custkey == conv.o_custkey, "left"
    )
    agg = joined.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(
                (F.col("variant") == 0) & F.col("o_custkey").isNotNull(), 1
            ).otherwise(0)
        ).alias("conv_a"),
        F.sum(
            F.when(
                (F.col("variant") == 1) & F.col("o_custkey").isNotNull(), 1
            ).otherwise(0)
        ).alias("conv_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a")
    rb = F.col("conv_b").cast("double") / F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("conv_a").cast("bigint").alias("conv_a"),
        F.col("conv_b").cast("bigint").alias("conv_b"),
        dround(ra, 6).alias("rate_a"),
        dround(rb, 6).alias("rate_b"),
        dround(
            (ra - rb)
            / F.sqrt(
                pooled
                * (F.lit(1.0) - pooled)
                * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
            ),
            4,
        ).alias("z_score"),
    )


@query(
    "ks_two_sample",
    oracle="""
    WITH c AS (
      SELECT n_chars AS v,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
      FROM documents WHERE source IN ('src0', 'src1')
      GROUP BY 1),
    cum AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_a,
             SUM(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_b
      FROM c),
    g AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM c),
    d AS (
      SELECT cum.v, g.n_a, g.n_b,
             abs(cum.cum_a * g.n_b - cum.cum_b * g.n_a) AS dkey
      FROM cum, g)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(v AS BIGINT) AS ks_at,
           ROUND(CAST(dkey AS DOUBLE) / (n_a * n_b), 6) AS ks_stat
    FROM d ORDER BY dkey DESC, v LIMIT 1
    """,
    doc="Two-sample Kolmogorov-Smirnov test between the doc-length "
    "distributions of two corpus sources — the distribution-shift "
    "screen a curator runs before mixing a new source into the "
    "training blend. The ECDF gap is kept INTEGER-EXACT as "
    "|cum_a*n_b - cum_b*n_a| (the cross-multiplied rational), so the "
    "argmax is never decided by float rounding; the statistic divides "
    "once at the end. Plan: the corpus collapses to a value-keyed "
    "rollup (one row per distinct length — bounded by the length cap, "
    "not the corpus), the cumulative window runs over that rollup "
    "(audit-allowlisted, vocab_coverage class), and the final argmax "
    "is TakeOrderedAndProject over the same bounded set.",
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.filter(F.col("source").isin("src0", "src1"))
        .groupBy(F.col("n_chars").alias("v"))
        .agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias(
                "ca"
            ),
            F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias(
                "cb"
            ),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = c.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    g = c.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    d = cum.crossJoin(F.broadcast(g)).select(
        "v",
        "n_a",
        "n_b",
        F.abs(
            F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
        ).alias("dkey"),
    )
    return (
        d.orderBy(F.col("dkey").desc(), "v")
        .limit(1)
        .select(
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("v").cast("bigint").alias("ks_at"),
            dround(
                F.col("dkey").cast("double") / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("ks_stat"),
        )
    )


@query(
    "degree_assortativity",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
      SELECT n, COUNT(*) AS d FROM (
        SELECT u AS n FROM e0 UNION ALL SELECT v AS n FROM e0)
      GROUP BY 1),
    ed AS (
      SELECT du.d AS du, dv.d AS dv
      FROM e0 JOIN deg du ON du.n = e0.u JOIN deg dv ON dv.n = e0.v),
    s AS (
      SELECT 2 * COUNT(*) AS n,
             SUM(du + dv) AS sx,
             SUM(2 * du * dv) AS sxy,
             SUM(du * du + dv * dv) AS sxx
      FROM ed),
    g AS (SELECT COUNT(*) AS n_nodes FROM deg)
    SELECT CAST(g.n_nodes AS BIGINT) AS n_nodes,
           CAST(s.n / 2 AS BIGINT) AS n_edges,
           ROUND(CAST(s.sx AS DOUBLE) / s.n, 4) AS mean_degree,
           ROUND((CAST(s.n AS DOUBLE) * s.sxy
                  - CAST(s.sx AS DOUBLE) * s.sx)
                 / (CAST(s.n AS DOUBLE) * s.sxx
                    - CAST(s.sx AS DOUBLE) * s.sx), 6) AS assortativity
    FROM s, g
    """,
    doc="Degree assortativity of the co-purchase graph (same edge "
    "semantics as triangle_count_oriented: parts are nodes, distinct "
    "within-order pairs are edges): the Pearson correlation of "
    "endpoint degrees over the symmetrized edge list — do hub parts "
    "attach to hubs or to the periphery? All moments are accumulated "
    "as exact BIGINTs (degrees are integers), and the Pearson ratio "
    "divides ONCE in doubles at the end, so no cross-engine float "
    "summation can move the result. Plan: the order-keyed pair "
    "self-join (spec-bounded lines/order), a node-keyed degree count "
    "joined back onto edges, one map-side moment aggregate — no "
    "window, no all-pairs stage.",
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.caching import persisted
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    e0 = persisted(
        a.join(b, "k").filter(F.col("u") < F.col("v")).select("u", "v")
        .distinct()
    )
    # single-pass degree off the edge cache (explode ≡ the two-scan
    # unionAll), PERSISTED because three consumers read it — the du/dv
    # broadcast builds and the n_nodes aggregate each re-ran the degree
    # shuffle before (3 aggregates -> 1, r14)
    deg = persisted(
        e0.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    # the degree relation is |parts|-sized (<< edges); broadcast both
    # copies so attaching endpoint degrees never shuffles the edge list
    ed = e0.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    s = ed.agg(
        (F.lit(2) * F.count("*")).alias("n"),
        F.sum(F.col("du") + F.col("dv")).alias("sx"),
        F.sum(F.lit(2) * F.col("du") * F.col("dv")).alias("sxy"),
        F.sum(
            F.col("du") * F.col("du") + F.col("dv") * F.col("dv")
        ).alias("sxx"),
    )
    g = deg.agg(F.count("*").alias("n_nodes"))
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    return s.crossJoin(F.broadcast(g)).select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        (F.col("n") / 2).cast("bigint").alias("n_edges"),
        dround(sxd / F.col("n"), 4).alias("mean_degree"),
        dround(
            (nd * F.col("sxy") - sxd * F.col("sx"))
            / (nd * F.col("sxx") - sxd * F.col("sx")),
            6,
        ).alias("assortativity"),
    )


@query(
    "seasonality_dow_index",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1),
    g AS (SELECT SUM(cents) AS total, COUNT(*) AS n_days FROM daily),
    dw AS (
      SELECT isodow(day) AS dow, COUNT(*) AS n_days_dow,
             SUM(cents) AS cents_dow
      FROM daily GROUP BY 1)
    SELECT CAST(dw.dow AS INTEGER) AS dow,
           CAST(dw.n_days_dow AS BIGINT) AS n_days,
           ROUND(dw.cents_dow / (100.0 * dw.n_days_dow), 2)
             AS avg_daily_revenue,
           ROUND(CAST(dw.cents_dow AS DOUBLE) * g.n_days
                 / (CAST(dw.n_days_dow AS DOUBLE) * g.total), 6)
             AS seasonal_index
    FROM dw, g ORDER BY dow
    """,
    doc="Day-of-week seasonality index over the revenue series: mean "
    "daily revenue per ISO weekday divided by the overall daily mean "
    "— the ratio-to-overall-average decomposition a forecaster "
    "detrends with. Revenue is summed in exact cents (BIGINT) and the "
    "index is the exact-rational ratio cents_dow*n_days / "
    "(n_days_dow*total) evaluated in one double step, so both engines "
    "agree bit-for-bit. Plan: a day-keyed rollup (map-side combined), "
    "then a 7-row weekday aggregate against a broadcast grand total — "
    "single corpus scan, no window.",
)
def seasonality_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    g = daily.agg(F.sum("cents").alias("total"), F.count("*").alias("n_days"))
    dw = daily.groupBy(
        (F.weekday("day") + 1).alias("dow")
    ).agg(
        F.count("*").alias("n_days_dow"), F.sum("cents").alias("cents_dow")
    )
    return (
        dw.crossJoin(F.broadcast(g))
        .select(
            F.col("dow").cast("int").alias("dow"),
            F.col("n_days_dow").cast("bigint").alias("n_days"),
            dround(
                F.col("cents_dow") / (100.0 * F.col("n_days_dow")), 2
            ).alias("avg_daily_revenue"),
            dround(
                F.col("cents_dow").cast("double") * F.col("n_days")
                / (F.col("n_days_dow").cast("double") * F.col("total")),
                6,
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@query(
    "score_calibration_bins",
    oracle="""
    WITH scored AS (
      SELECT (o_orderkey * 2654435761) % 1000000 AS micro,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
      FROM orders),
    b AS (
      SELECT micro // 100000 AS bin, COUNT(*) AS n,
             SUM(micro) AS sum_micro, SUM(label) AS n_pos
      FROM scored GROUP BY 1)
    SELECT CAST(bin AS INTEGER) AS bin, CAST(n AS BIGINT) AS n,
           ROUND(sum_micro / (1000000.0 * n), 6) AS avg_score,
           ROUND(CAST(n_pos AS DOUBLE) / n, 6) AS obs_rate,
           ROUND(CAST(n_pos AS DOUBLE) / n
                 - sum_micro / (1000000.0 * n), 6) AS gap
    FROM b ORDER BY bin
    """,
    doc="Model-calibration reliability bins — the audit a scored "
    "dataset gets before its scores gate anything: decile-bin the "
    "score, compare mean predicted score to observed positive rate "
    "per bin. The 'model' is a deterministic Knuth-hash pseudo-score "
    "(this engine ships no trained weights; the BINNING/CALIBRATION "
    "machinery is the operator under test), the label is a real "
    "column, and both bin id and mean score come from exact integer "
    "micro-units so the bins and averages are engine-independent. "
    "Plan: one map-side projection + a 10-row keyed aggregate — a "
    "single scan with map-side combine at any scale.",
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    scored = orders.select(
        ((F.col("o_orderkey") * F.lit(2654435761)) % 1000000).alias("micro"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    b = scored.groupBy(
        F.floor(F.col("micro") / 100000).alias("bin")
    ).agg(
        F.count("*").alias("n"),
        F.sum("micro").alias("sum_micro"),
        F.sum("label").alias("n_pos"),
    )
    obs = F.col("n_pos").cast("double") / F.col("n")
    avg = F.col("sum_micro") / (1000000.0 * F.col("n"))
    return b.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("n").cast("bigint").alias("n"),
        dround(avg, 6).alias("avg_score"),
        dround(obs, 6).alias("obs_rate"),
        dround(obs - avg, 6).alias("gap"),
    ).orderBy("bin")


def _containment_oracle() -> str:
    from kyuubi_spark.queries.pipeline import _SHINGLE_CTE

    return f"""
    WITH {_SHINGLE_CTE},
    shx AS (SELECT DISTINCT id, ('0x' || substring(md5(s), 1, 15))::BIGINT AS s
            FROM (SELECT id, unnest(shs) AS s FROM sh) u),
    counts AS (SELECT id, COUNT(*) AS n_sh FROM shx GROUP BY id),
    inter AS (
      SELECT sa.id AS a_id, sb.id AS b_id, COUNT(*) AS inter
      FROM shx sa JOIN shx sb ON sa.s = sb.s AND sa.id < sb.id
      GROUP BY 1, 2)
    SELECT i.a_id, i.b_id, CAST(i.inter AS BIGINT) AS inter,
           CAST(ca.n_sh AS BIGINT) AS n_a, CAST(cb.n_sh AS BIGINT) AS n_b,
           ROUND(CAST(i.inter AS DOUBLE) / least(ca.n_sh, cb.n_sh), 6)
             AS containment
    FROM inter i
    JOIN counts ca ON ca.id = i.a_id
    JOIN counts cb ON cb.id = i.b_id
    WHERE 2 * i.inter >= least(ca.n_sh, cb.n_sh)
    ORDER BY a_id, b_id
    """


@query(
    "containment_near_dup",
    oracle=_containment_oracle(),
    doc="Containment near-dup detection — the ASYMMETRIC dedup MinHash "
    "misses: containment = |A∩B| / min(|A|,|B|) >= 1/2 catches "
    "quote-inclusion (a short doc embedded inside a long one), where "
    "Jaccard stays tiny because the union is dominated by the long "
    "doc. Exact, via the overlap-join construction: under the global "
    "rarest-first shingle order, a pair meeting overlap t = "
    "ceil(min/2) must match inside the SMALLER doc's first "
    "n - t + 1 shingles, so only the smaller side's prefix probes "
    "the index (lossless; proof: >= t matches can't all hide in a "
    "suffix shorter than t). Prefixes keep each doc's RAREST "
    "shingles, so corpus-hot shingles never appear on the probe side "
    "— the quadratic hot-key blowup is cut at the source. "
    "Verification is one codegen array_intersect per candidate in "
    "md5-long space (the oracle replays the same hash) — the "
    "integer-exact test 2*inter >= min(n_a, n_b).",
)
def containment_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.caching import persisted
    from kyuubi_spark.functions import dedup as D
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    arrays = persisted(
        docs.select(
            F.col("doc_id").alias("id"),
            D.hashed_shingles_arrow(3)(F.col("text")).alias("shs"),
        ).withColumn("n_sh", F.size("shs"))
    )
    sh = arrays.select("id", "n_sh", F.explode("shs").alias("sh"))
    df_freq = sh.groupBy("sh").agg(F.count("*").alias("df_sh"))
    by_id = Window.partitionBy("id")
    # smaller-side prefix: required overlap t = ceil(n/2) once this doc is
    # the smaller endpoint, so its first n - t + 1 rarest shingles must
    # contain a match — rank by (df, sh) and keep the prefix only
    ranked = sh.join(df_freq, "sh").withColumn(
        "rk", F.row_number().over(by_id.orderBy("df_sh", "sh"))
    )
    probe = ranked.filter(
        F.col("rk") <= F.col("n_sh") - ((F.col("n_sh") + 1) / 2).cast("long") + 1
    ).select(
        F.col("id").alias("a_id"),
        F.col("n_sh").alias("n_a"),
        F.col("sh"),
    )
    index = sh.select(
        F.col("id").alias("b_id"), F.col("n_sh").alias("n_b"), F.col("sh")
    )
    smaller_first = (F.col("n_a") < F.col("n_b")) | (
        (F.col("n_a") == F.col("n_b")) & (F.col("a_id") < F.col("b_id"))
    )
    cand = (
        probe.join(index, "sh")
        .filter((F.col("a_id") != F.col("b_id")) & smaller_first)
        .select("a_id", "b_id")
        .distinct()
    )
    va = arrays.select(
        F.col("id").alias("a_id"), F.col("shs").alias("shs_a")
    )
    vb = arrays.select(
        F.col("id").alias("b_id"), F.col("shs").alias("shs_b")
    )
    verified = (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.size(F.array_intersect("shs_a", "shs_b")).alias("inter"),
            F.size("shs_a").alias("n_a"),
            F.size("shs_b").alias("n_b"),
        )
        .filter(
            F.lit(2) * F.col("inter") >= F.least(F.col("n_a"), F.col("n_b"))
        )
    )
    return verified.select(
        F.least("a_id", "b_id").alias("a_id"),
        F.greatest("a_id", "b_id").alias("b_id"),
        F.col("inter").cast("bigint").alias("inter"),
        F.when(F.col("a_id") < F.col("b_id"), F.col("n_a"))
        .otherwise(F.col("n_b"))
        .cast("bigint")
        .alias("n_a"),
        F.when(F.col("a_id") < F.col("b_id"), F.col("n_b"))
        .otherwise(F.col("n_a"))
        .cast("bigint")
        .alias("n_b"),
        dround(
            F.col("inter").cast("double")
            / F.least(F.col("n_a"), F.col("n_b")),
            6,
        ).alias("containment"),
    ).orderBy("a_id", "b_id")


@query(
    "token_source_pmi",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id, source,
             unnest(string_split(trim(text), ' ')) AS term
      FROM documents),
    nts AS (SELECT term, source, COUNT(*) AS n_ts FROM tok GROUP BY 1, 2),
    nt AS (SELECT term, SUM(n_ts) AS n_t FROM nts GROUP BY 1),
    ns AS (SELECT source, SUM(n_ts) AS n_s FROM nts GROUP BY 1),
    n AS (SELECT SUM(n_ts) AS total FROM nts),
    scored AS (
      SELECT nts.term, nts.source, nts.n_ts,
             ln(CAST(nts.n_ts AS DOUBLE) * n.total / (nt.n_t * ns.n_s))
               AS pmi_raw
      FROM nts JOIN nt USING (term) JOIN ns USING (source), n)
    SELECT term, source, CAST(n_ts AS BIGINT) AS n_ts,
           ROUND(pmi_raw, 6) AS pmi
    FROM scored
    ORDER BY pmi_raw DESC, term, source
    LIMIT 20
    """,
    doc="Token-source pointwise mutual information: which tokens are "
    "over-represented in which corpus source — the signature screen "
    "that surfaces boilerplate, source-specific artifacts, and "
    "domain markers before they bias a training blend. PMI is "
    "ln(p(t,s)/(p(t)p(s))) over doc-presence counts, computed as ONE "
    "log of an exact integer rational (n_ts*N)/(n_t*n_s) — no float "
    "sum anywhere, so ordering and values are engine-exact. Plan: "
    "one tokenize+distinct (doc,source,term) projection, three keyed "
    "counts, two broadcast joins (vocab and source marginals are "
    "tiny), TakeOrderedAndProject top-20.",
)
def token_source_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("term"),
    ).distinct()
    nts = tok.groupBy("term", "source").agg(F.count("*").alias("n_ts"))
    nt = nts.groupBy("term").agg(F.sum("n_ts").alias("n_t"))
    ns = nts.groupBy("source").agg(F.sum("n_ts").alias("n_s"))
    n = nts.agg(F.sum("n_ts").alias("total"))
    pmi_raw = F.log(
        F.col("n_ts").cast("double") * F.col("total")
        / (F.col("n_t") * F.col("n_s"))
    )
    return (
        nts.join(F.broadcast(nt), "term")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(n))
        .withColumn("pmi_raw", pmi_raw)
        .orderBy(F.col("pmi_raw").desc(), "term", "source")
        .limit(20)
        .select(
            "term",
            "source",
            F.col("n_ts").cast("bigint").alias("n_ts"),
            dround(F.col("pmi_raw"), 6).alias("pmi"),
        )
    )


@query(
    "dataset_card_report",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 2) AS avg_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           ROUND(SUM(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END)
                 / COUNT(*), 6) AS en_share,
           ROUND(SUM(CASE WHEN n_chars < 100 THEN 1.0 ELSE 0.0 END)
                 / COUNT(*), 6) AS short_share,
           ROUND(1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE) / COUNT(*), 6)
             AS exact_dup_rate
    FROM documents
    GROUP BY source ORDER BY source
    """,
    doc="Per-source dataset card — the 'nutrition label' a corpus "
    "release ships: volume, length profile, language mix, short-doc "
    "share, and exact-duplicate rate, one row per source. Everything "
    "is a single source-keyed aggregate pass (COUNT DISTINCT text "
    "rides Spark's partial-aggregate path — at 100 TB swap to a "
    "per-source HLL sketch if 2% error is acceptable; the exact form "
    "is the oracle-checkable contract). No window, no join.",
)
def dataset_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    cnt = F.count("*")
    return (
        docs.groupBy("source")
        .agg(
            cnt.cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            dround(F.sum("n_chars").cast("double") / cnt, 2).alias(
                "avg_chars"
            ),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            dround(
                F.sum(F.when(F.col("lang") == "en", 1.0).otherwise(0.0))
                / cnt,
                6,
            ).alias("en_share"),
            dround(
                F.sum(F.when(F.col("n_chars") < 100, 1.0).otherwise(0.0))
                / cnt,
                6,
            ).alias("short_share"),
            dround(
                F.lit(1.0) - F.countDistinct("text").cast("double") / cnt, 6
            ).alias("exact_dup_rate"),
        )
        .orderBy("source")
    )


@query(
    "attribution_touchpoints",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS pid, ts AS pts
      FROM events WHERE event_type = 'purchase'),
    t AS (
      SELECT p.pid, e.event_type, e.ts, e.event_id
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type <> 'purchase'
       AND e.ts < p.pts
       AND e.ts >= p.pts - INTERVAL 7 DAY),
    r AS (
      SELECT pid, event_type,
             ROW_NUMBER() OVER (PARTITION BY pid
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY pid) AS cnt
      FROM t),
    credits AS (
      SELECT 'linear' AS model, event_type,
             CAST(round(1000000.0 / cnt) AS BIGINT) AS micro FROM r
      UNION ALL
      SELECT 'first_touch', event_type, 1000000 FROM r WHERE rn = 1
      UNION ALL
      SELECT 'last_touch', event_type, 1000000 FROM r WHERE rn = cnt)
    SELECT model, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(micro) / 1000000.0, 4) AS credit
    FROM credits
    GROUP BY model, event_type
    ORDER BY model, event_type
    """,
    doc="Multi-touch marketing attribution over the event stream: every "
    "purchase's preceding 7-day journey is credited to its touchpoints "
    "under three standard models (first-touch, last-touch, linear), "
    "aggregated by event type — which channel actually drives "
    "conversions under each lens. Linear credit 1/n is accumulated in "
    "round()-ed integer MICRO-credits so the cross-path sum is exact "
    "(a float 1/n summed over thousands of paths would drift by "
    "addition order across engines). Plan: a user-keyed join "
    "purchases->events bounded by the 7-day predicate, per-purchase "
    "(keyed) rank/count windows, one (model,type)-keyed aggregate. "
    "At 100 TB both the join and windows key on user/purchase — no "
    "global ordering anywhere.",
)
def attribution_touchpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    t = ev.filter(F.col("event_type") != "purchase").join(
        p,
        (F.col("user_id") == F.col("pu"))
        & (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
    )
    w = Window.partitionBy("pid")
    r = t.select(
        "pid",
        "event_type",
        F.row_number().over(w.orderBy("ts", "event_id")).alias("rn"),
        F.count("*").over(w).alias("cnt"),
    )
    micro_linear = F.round(F.lit(1000000.0) / F.col("cnt"), 0).cast("bigint")
    credits = (
        r.select(
            F.lit("linear").alias("model"),
            "event_type",
            micro_linear.alias("micro"),
        )
        .unionAll(
            r.filter(F.col("rn") == 1).select(
                F.lit("first_touch").alias("model"),
                "event_type",
                F.lit(1000000).cast("bigint").alias("micro"),
            )
        )
        .unionAll(
            r.filter(F.col("rn") == F.col("cnt")).select(
                F.lit("last_touch").alias("model"),
                "event_type",
                F.lit(1000000).cast("bigint").alias("micro"),
            )
        )
    )
    return (
        credits.groupBy("model", "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_touches"),
            dround(F.sum("micro") / 1000000.0, 4).alias("credit"),
        )
        .orderBy("model", "event_type")
    )


@query(
    "kneser_ney_counts",
    oracle="""
    WITH tok AS (
      SELECT doc_id, i, toks[i] AS w1, toks[i + 1] AS w2
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
            FROM documents),
           unnest(generate_series(1, len(toks) - 1)) AS u(i)),
    bg AS (SELECT w1, w2, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    left_tot AS (
      SELECT w1, SUM(c) AS c_w1, COUNT(*) AS n1p_right FROM bg GROUP BY 1),
    right_ctx AS (SELECT w2, COUNT(*) AS n1p_left FROM bg GROUP BY 1),
    t AS (SELECT COUNT(*) AS n_types FROM bg)
    SELECT bg.w1, bg.w2, CAST(bg.c AS BIGINT) AS c,
           ROUND(CAST(right_ctx.n1p_left AS DOUBLE) / t.n_types, 6)
             AS p_continuation,
           ROUND((bg.c - 0.75) / left_tot.c_w1
                 + (0.75 * left_tot.n1p_right / left_tot.c_w1)
                   * (CAST(right_ctx.n1p_left AS DOUBLE) / t.n_types), 6)
             AS p_kn
    FROM bg
    JOIN left_tot USING (w1)
    JOIN right_ctx USING (w2), t
    ORDER BY c DESC, w1, w2
    LIMIT 20
    """,
    doc="Kneser-Ney smoothed bigram model counts — the classic LM "
    "estimator's sufficient statistics straight from the corpus: "
    "bigram counts, left-context totals, continuation counts "
    "N1+(.w) (in how many DISTINCT contexts does w complete a "
    "bigram — the insight that makes KN beat raw MLE), and the "
    "interpolated probability p_KN = (c - D)/c(w1.) + "
    "lambda(w1) * p_continuation with discount D = 0.75. Every input "
    "is an integer count (observed bigrams have c >= 1 > D, so the "
    "max(c - D, 0) clamp is vacuous) and the probability is one fixed "
    "double expression — engine-exact. Plan: a positional bigram "
    "explode, three keyed counts, two broadcast marginal joins "
    "(vocab-sized), TakeOrderedAndProject top-20.",
)
def kneser_ney_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("toks")
    )
    tok = toks.select(
        F.posexplode("toks").alias("i0", "w1"),
        F.col("toks"),
    ).select(
        # F.get is 0-based and null-safe past the end (ANSI-mode element_at
        # would throw on the final position)
        "w1",
        F.get("toks", F.col("i0") + 1).alias("w2"),
    ).filter(F.col("w2").isNotNull())
    bg = tok.groupBy("w1", "w2").agg(F.count("*").alias("c"))
    left_tot = bg.groupBy("w1").agg(
        F.sum("c").alias("c_w1"), F.count("*").alias("n1p_right")
    )
    right_ctx = bg.groupBy("w2").agg(F.count("*").alias("n1p_left"))
    t = bg.agg(F.count("*").alias("n_types"))
    p_cont = F.col("n1p_left").cast("double") / F.col("n_types")
    return (
        bg.join(F.broadcast(left_tot), "w1")
        .join(F.broadcast(right_ctx), "w2")
        .crossJoin(F.broadcast(t))
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(20)
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("c"),
            dround(p_cont, 6).alias("p_continuation"),
            dround(
                (F.col("c") - 0.75) / F.col("c_w1")
                + (0.75 * F.col("n1p_right") / F.col("c_w1")) * p_cont,
                6,
            ).alias("p_kn"),
        )
    )


_RRF_QUERY = "spark join stream"
_RRF_K = 60


@query(
    "rrf_fusion_topk",
    oracle=f"""
    WITH dl AS (
      SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS DOUBLE)
               AS doclen
      FROM documents),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(doclen) AS avgdl
      FROM dl),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
            FROM documents)
      WHERE term IN ('spark', 'join', 'stream')
      GROUP BY 1, 2),
    df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    idf AS (SELECT term,
                   ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                     AS idf
            FROM df, stats),
    bm AS (
      SELECT dl.doc_id, ROUND(SUM(
               idf.idf * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.doclen
                                 / stats.avgdl))), 4) AS bm25
      FROM dl JOIN tf ON tf.doc_id = dl.doc_id
              JOIN idf ON idf.term = tf.term
      CROSS JOIN stats
      GROUP BY dl.doc_id),
    lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
      FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50)),
    qg AS (
      SELECT list_distinct(list_transform(
               generate_series(1, len('{_RRF_QUERY}') - 2),
               i -> substr('{_RRF_QUERY}', i, 3))) AS qgrams),
    dg AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(text) - 2, 1)),
               i -> substr(text, i, 3))) AS dgrams
      FROM documents),
    jac AS (
      SELECT doc_id,
             CAST(len(list_intersect(dgrams, qgrams)) AS DOUBLE)
             / (len(dgrams) + len(qgrams)
                - len(list_intersect(dgrams, qgrams))) AS j
      FROM dg, qg),
    sem AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY j DESC, doc_id) AS sem_rank
      FROM (SELECT * FROM jac ORDER BY j DESC, doc_id LIMIT 50)),
    fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             lex.lex_rank, sem.sem_rank,
             COALESCE(1.0 / ({_RRF_K} + lex.lex_rank), 0.0)
             + COALESCE(1.0 / ({_RRF_K} + sem.sem_rank), 0.0) AS rrf_raw
      FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
    SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
           CAST(sem_rank AS BIGINT) AS sem_rank,
           ROUND(rrf_raw, 6) AS rrf
    FROM fused
    ORDER BY rrf_raw DESC, doc_id
    LIMIT 20
    """,
    doc="Hybrid retrieval via Reciprocal Rank Fusion — the standard "
    "way production search combines heterogeneous rankers without "
    "score calibration: RRF(d) = sum over lanes of 1/(60 + rank). "
    "Lane 1 is whole-word Okapi BM25 (bm25_topk's scorer); lane 2 is "
    "character-3-gram Jaccard against the query string, which "
    "catches substring/typo/compound matches whole-word BM25 is "
    "blind to — genuinely complementary evidence. Ranks come from "
    "each lane's top-50 (TakeOrderedAndProject on a total order: "
    "rounded score desc, doc_id), so the only unpartitioned windows "
    "number <=50 rows each (audit-allowlisted, tpcds_q44 class); the "
    "fusion itself is a 50x50 full outer join. Gram sets intersect "
    "via codegen array_intersect against ONE broadcast query-gram "
    "array — the gram relation is never exploded or shuffled.",
)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    # --- lane 1: BM25 (same scorer as bm25_topk) ---
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("term")
    )
    tf = (
        tok.filter(F.col("term").isin(*_RRF_QUERY.split()))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dl = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " "))
        .cast("double")
        .alias("doclen"),
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ).alias("idf"),
            "avgdl",
        )
    )
    bm = (
        dl.join(tf, "doc_id")
        .join(F.broadcast(idf), "term")
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * (1.2 + 1.0)
                / (
                    F.col("tf")
                    + 1.2 * (1.0 - 0.75 + 0.75 * F.col("doclen") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(dround(F.sum("part"), 4).alias("bm25"))
    )
    lex50 = bm.orderBy(F.col("bm25").desc(), "doc_id").limit(50)
    lex = lex50.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("lex_rank"),
    )
    # --- lane 2: char-3-gram Jaccard vs the query string ---
    grams = "array_distinct(transform(sequence(1, greatest(length({0}) - 2, 1)), i -> substring({0}, i, 3)))"
    qg = spark.range(1).select(
        F.expr(grams.format(f"'{_RRF_QUERY}'")).alias("qgrams")
    )
    dg = docs.select("doc_id", F.expr(grams.format("text")).alias("dgrams"))
    inter = F.size(F.array_intersect("dgrams", "qgrams"))
    jac = dg.crossJoin(F.broadcast(qg)).select(
        "doc_id",
        (
            inter.cast("double")
            / (F.size("dgrams") + F.size("qgrams") - inter)
        ).alias("j"),
    )
    sem50 = jac.orderBy(F.col("j").desc(), "doc_id").limit(50)
    sem = sem50.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("j").desc(), "doc_id"))
        .alias("sem_rank"),
    )
    # --- fusion ---
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0)
            )
        ).alias("rrf_raw"),
    )
    return (
        fused.orderBy(F.col("rrf_raw").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            F.col("lex_rank").cast("bigint").alias("lex_rank"),
            F.col("sem_rank").cast("bigint").alias("sem_rank"),
            dround(F.col("rrf_raw"), 6).alias("rrf"),
        )
    )


@query(
    "pareto_abc_classification",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
      FROM lineitem GROUP BY 1),
    g AS (SELECT SUM(cents) AS total FROM pr),
    cum AS (
      SELECT l_partkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      FROM pr),
    cls AS (
      SELECT CASE WHEN 5 * cum.running <= 4 * g.total THEN 'A'
                  WHEN 20 * cum.running <= 19 * g.total THEN 'B'
                  ELSE 'C' END AS abc_class,
             cum.cents, g.total
      FROM cum, g)
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(cents) / 100.0, 2) AS revenue,
           ROUND(CAST(SUM(cents) AS DOUBLE) / any_value(total), 6)
             AS rev_share
    FROM cls GROUP BY abc_class ORDER BY abc_class
    """,
    doc="Pareto / ABC inventory classification: parts ranked by revenue, "
    "class A = the head covering 80% of cumulative revenue, B = the "
    "next 15%, C = the tail — the classic 80/20 working-capital split. "
    "The global prefix sum comes from the DISTRIBUTED exact scan "
    "primitive (operators/ranking.py global_running_sum: percentile-"
    "cut range buckets + per-bucket local cumsum + bounded prefix "
    "offsets — no corpus-wide single-partition window; the oracle "
    "replays it as a plain window cumsum). Class membership tests are "
    "INTEGER-EXACT (5*running <= 4*total in cents), so the boundary "
    "part never flips class on float rounding.",
)
def pareto_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.operators.ranking import global_running_sum
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        ).alias("cents")
    )
    cum, total = global_running_sum(
        pr, [("cents", "desc"), ("l_partkey", "asc")], "cents"
    )
    cls = cum.withColumn(
        "abc_class",
        F.when(5 * F.col("running") <= 4 * F.lit(total), "A")
        .when(20 * F.col("running") <= 19 * F.lit(total), "B")
        .otherwise("C"),
    )
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            dround(F.sum("cents") / 100.0, 2).alias("revenue"),
            dround(
                F.sum("cents").cast("double") / F.lit(float(total)), 6
            ).alias("rev_share"),
        )
        .orderBy("abc_class")
    )


@query(
    "l_diversity_report",
    oracle="""
    WITH rec AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             CAST(floor(c.c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             o.o_orderpriority AS sensitive
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    grp AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             COUNT(*) AS n_rows, COUNT(DISTINCT sensitive) AS l
      FROM rec GROUP BY 1, 2, 3),
    g AS (SELECT SUM(n_rows) AS total FROM grp)
    SELECT CAST(grp.l AS INTEGER) AS l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(grp.n_rows) AS BIGINT) AS n_rows,
           ROUND(100.0 * SUM(grp.n_rows) / any_value(g.total), 4)
             AS pct_rows
    FROM grp, g GROUP BY grp.l ORDER BY l
    """,
    doc="l-diversity audit — k-anonymity's sharper sibling "
    "(k_anonymity_report shares the same quasi-identifier): a "
    "QI group whose members all share one sensitive value leaks that "
    "value even when the group is large, so the screen is the number "
    "of DISTINCT sensitive values (order priority) per "
    "(nation, segment, balance-band) group. Reports how many groups "
    "and rows sit at each diversity level l — rows at l=1 are subject "
    "to homogeneity attack. Plan: one key-equi join orders->customer, "
    "one QI-keyed aggregate with partial distinct, a <=5-row rollup "
    "with a broadcast total. At 100 TB the join broadcasts the "
    "dimension side and the QI aggregate map-side combines.",
)
def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rec = orders.join(
        F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")
    ).select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
        F.col("o_orderpriority").alias("sensitive"),
    )
    grp = rec.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("sensitive").alias("l"),
    )
    g = grp.agg(F.sum("n_rows").alias("total"))
    return (
        grp.groupBy("l")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum("n_rows").alias("rows_l"),
        )
        .crossJoin(F.broadcast(g))
        .select(
            F.col("l").cast("int").alias("l"),
            "n_groups",
            F.col("rows_l").cast("bigint").alias("n_rows"),
            dround(100.0 * F.col("rows_l") / F.col("total"), 4).alias(
                "pct_rows"
            ),
        )
        .orderBy("l")
    )


@query(
    "weighted_sample_ares",
    oracle="""
    WITH u AS (
      SELECT o_orderkey, o_totalprice,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
               ::BIGINT / 1152921504606846976.0 AS frac
      FROM orders),
    keyed AS (
      SELECT o_orderkey, o_totalprice,
             1000000.0 * (-ln(frac)) / o_totalprice AS skey
      FROM u)
    SELECT o_orderkey,
           ROUND(o_totalprice, 2) AS weight,
           ROUND(skey, 6) AS sample_key
    FROM keyed
    ORDER BY skey, o_orderkey
    LIMIT 20
    """,
    doc="Weighted sampling without replacement (Efraimidis-Spirtsis "
    "A-ES / exponential-jumps form): each row draws u from a "
    "DETERMINISTIC md5 hash of its key (reproducible across engines "
    "and reruns — the property a sampling audit needs) and the k "
    "smallest -ln(u)/weight keys are the sample, which provably draws "
    "each row with probability proportional to its weight. The 60-bit "
    "md5 prefix gives u in (0,1); ln and one division are single "
    "IEEE ops, so ordering is engine-exact. Plan: map-side key "
    "computation + TakeOrderedAndProject top-k — one scan, no "
    "shuffle beyond the k-row merge, embarrassingly parallel at "
    "any scale.",
)
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    frac = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15), 16, 10
    ).cast("bigint") / F.lit(1152921504606846976.0)
    keyed = orders.select(
        "o_orderkey",
        "o_totalprice",
        (F.lit(1000000.0) * -F.log(frac) / F.col("o_totalprice")).alias(
            "skey"
        ),
    )
    return (
        keyed.orderBy("skey", "o_orderkey")
        .limit(20)
        .select(
            "o_orderkey",
            dround(F.col("o_totalprice"), 2).alias("weight"),
            dround(F.col("skey"), 6).alias("sample_key"),
        )
    )


@query(
    "simpson_reversal_audit",
    oracle="""
    WITH assign AS (
      SELECT c_custkey, c_mktsegment,
             (c_custkey * 2654435761) % 2 AS variant
      FROM customer),
    conv AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT'),
    rec AS (
      SELECT a.c_mktsegment AS segment, a.variant,
             CASE WHEN conv.o_custkey IS NULL THEN 0 ELSE 1 END AS converted
      FROM assign a LEFT JOIN conv ON conv.o_custkey = a.c_custkey),
    seg AS (
      SELECT segment,
             SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS conv_a,
             SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS conv_b
      FROM rec GROUP BY 1),
    pooled AS (
      SELECT SUM(conv_a) * SUM(n_b) - SUM(conv_b) * SUM(n_a) AS pooled_num
      FROM seg)
    SELECT seg.segment,
           CAST(seg.n_a AS BIGINT) AS n_a,
           CAST(seg.n_b AS BIGINT) AS n_b,
           ROUND(CAST(seg.conv_a AS DOUBLE) / seg.n_a, 6) AS rate_a,
           ROUND(CAST(seg.conv_b AS DOUBLE) / seg.n_b, 6) AS rate_b,
           CAST(CASE WHEN sign(seg.conv_a * seg.n_b - seg.conv_b * seg.n_a)
                          * sign(pooled.pooled_num) < 0
                     THEN 1 ELSE 0 END AS INTEGER) AS reversed
    FROM seg, pooled ORDER BY segment
    """,
    doc="Simpson's-paradox audit for the A/B experiment: does any "
    "segment's treatment effect point the OPPOSITE way from the pooled "
    "effect? (The classic aggregation trap — a pooled win hiding a "
    "per-segment loss.) The sign comparison is INTEGER-EXACT: "
    "rate_a > rate_b iff conv_a*n_b > conv_b*n_a (cross-multiplied), "
    "so no float subtraction decides a reversal. Same hash assignment "
    "and conversion definition as ab_test_zscore. Plan: one "
    "distinct-converter left join, a segment-keyed conditional "
    "aggregate, and a 1-row pooled broadcast — a 5-row result at "
    "any corpus size.",
)
def simpson_reversal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    assign = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        ((F.col("c_custkey") * F.lit(2654435761)) % 2).alias("variant"),
    )
    conv = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    rec = assign.join(
        conv, assign.c_custkey == conv.o_custkey, "left"
    ).select(
        "segment",
        "variant",
        F.when(F.col("o_custkey").isNull(), 0).otherwise(1).alias("converted"),
    )
    seg = rec.groupBy("segment").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("variant") == 0, F.col("converted")).otherwise(0)
        ).alias("conv_a"),
        F.sum(
            F.when(F.col("variant") == 1, F.col("converted")).otherwise(0)
        ).alias("conv_b"),
    )
    pooled = seg.agg(
        (
            F.sum("conv_a") * F.sum("n_b") - F.sum("conv_b") * F.sum("n_a")
        ).alias("pooled_num")
    )
    seg_num = F.col("conv_a") * F.col("n_b") - F.col("conv_b") * F.col("n_a")
    return (
        seg.crossJoin(F.broadcast(pooled))
        .select(
            "segment",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            dround(F.col("conv_a").cast("double") / F.col("n_a"), 6).alias(
                "rate_a"
            ),
            dround(F.col("conv_b").cast("double") / F.col("n_b"), 6).alias(
                "rate_b"
            ),
            F.when(
                F.signum(seg_num.cast("double"))
                * F.signum(F.col("pooled_num").cast("double"))
                < 0,
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("reversed"),
        )
        .orderBy("segment")
    )


@query(
    "quantile_shift_report",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r_s,
             COUNT(*) OVER (PARTITION BY source) AS n_s
      FROM documents),
    pooled_ranked AS (
      SELECT n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS r_p
      FROM documents),
    n AS (SELECT COUNT(*) AS total FROM documents),
    d AS (SELECT unnest([1, 5, 9]) AS decile),
    src_q AS (
      SELECT ranked.source, d.decile, ranked.n_chars AS src_len
      FROM ranked, d
      WHERE ranked.r_s = CAST(ceil(d.decile * ranked.n_s / 10.0) AS BIGINT)),
    pool_q AS (
      SELECT d.decile, pooled_ranked.n_chars AS pooled_len
      FROM pooled_ranked, d, n
      WHERE pooled_ranked.r_p
            = CAST(ceil(d.decile * n.total / 10.0) AS BIGINT))
    SELECT src_q.source, CAST(src_q.decile AS INTEGER) AS decile,
           CAST(src_q.src_len AS BIGINT) AS src_len,
           CAST(pool_q.pooled_len AS BIGINT) AS pooled_len,
           CAST(src_q.src_len - pool_q.pooled_len AS BIGINT) AS shift
    FROM src_q JOIN pool_q USING (decile)
    ORDER BY source, decile
    """,
    doc="Per-source quantile-shift report: each source's exact P10/P50/"
    "P90 document length against the pooled corpus quantiles — the "
    "distribution-alignment check quantile normalization starts from, "
    "INTEGER-EXACT throughout (quantiles are selected by rank, never "
    "interpolated, so no float percentile semantics can diverge "
    "between engines). Per-source ranks are keyed windows; the POOLED "
    "rank comes from the distributed exact ranker "
    "(operators/ranking.py — no corpus-wide window; the oracle "
    "replays it as a plain global ROW_NUMBER). Quantile positions "
    "ceil(d*n/10) are computed map-side from broadcast per-source "
    "counts.",
)
def quantile_shift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.operators.ranking import global_row_number
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    w = Window.partitionBy("source")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number().over(w.orderBy("n_chars", "doc_id")).alias("r_s"),
        F.count("*").over(w).alias("n_s"),
    )
    deciles = F.array(*[F.lit(d) for d in (1, 5, 9)])
    src_q = (
        ranked.select(
            "source", "n_chars", "r_s", "n_s",
            F.explode(deciles).alias("decile"),
        )
        .filter(
            F.col("r_s")
            == F.ceil(F.col("decile") * F.col("n_s") / 10.0).cast("bigint")
        )
        .select("source", "decile", F.col("n_chars").alias("src_len"))
    )
    pooled, total = global_row_number(
        docs, [("n_chars", "asc"), ("doc_id", "asc")], rn_col="r_p"
    )
    pool_q = (
        pooled.select("n_chars", "r_p", F.explode(deciles).alias("decile"))
        .filter(
            F.col("r_p")
            == F.ceil(F.col("decile") * F.lit(total) / 10.0).cast("bigint")
        )
        .select("decile", F.col("n_chars").alias("pooled_len"))
    )
    return (
        src_q.join(F.broadcast(pool_q), "decile")
        .select(
            "source",
            F.col("decile").cast("int").alias("decile"),
            F.col("src_len").cast("bigint").alias("src_len"),
            F.col("pooled_len").cast("bigint").alias("pooled_len"),
            (F.col("src_len") - F.col("pooled_len"))
            .cast("bigint")
            .alias("shift"),
        )
        .orderBy("source", "decile")
    )


@query(
    "revenue_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(round(o_totalprice) AS BIGINT)) AS dollars
      FROM orders GROUP BY 1),
    lags AS (SELECT unnest([1, 7, 30, 365]) AS lag),
    pairs AS (
      SELECT lags.lag, a.dollars AS x, b.dollars AS y
      FROM daily a
      JOIN lags ON TRUE
      JOIN daily b ON b.day = a.day + lags.lag * INTERVAL 1 DAY),
    m AS (
      SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs GROUP BY lag)
    SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_pairs,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS acf
    FROM m ORDER BY lag
    """,
    doc="Revenue autocorrelation at business-relevant lags (1d, 1w, "
    "1m, 1y) — the seasonality/persistence fingerprint a forecaster "
    "reads first. The series is the day-keyed rollup in WHOLE DOLLARS "
    "(BIGINT, so the lag-join moment sums are exact integers that fit "
    "— cents would overflow sum(x*y) at the 7-year series length) and "
    "Pearson r divides once in doubles. The lag alignment is a "
    "self-EQUI-join on day+lag over the calendar-bounded rollup (no "
    "window at all, so nothing to allowlist); at 100 TB only the "
    "day-keyed aggregate sees the corpus.",
)
def revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice"), 0).cast("bigint")).alias(
            "dollars"
        )
    )
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(x) for x in (1, 7, 30, 365)])).alias("lag")
    )
    a = daily.select(F.col("day").alias("da"), F.col("dollars").alias("x"))
    b = daily.select(F.col("day").alias("db"), F.col("dollars").alias("y"))
    pairs = (
        a.join(F.broadcast(lags))
        .join(
            b,
            F.col("db") == F.expr("date_add(da, CAST(lag AS INT))"),
        )
    )
    m = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        dround(
            (nd * F.col("sxy") - sxd * F.col("sy"))
            / (
                F.sqrt(nd * F.col("sxx") - sxd * F.col("sx"))
                * F.sqrt(nd * F.col("syy") - syd * F.col("sy"))
            ),
            6,
        ).alias("acf"),
    ).orderBy("lag")


@query(
    "event_burstiness_fano",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, COUNT(*) AS n_days, SUM(c) AS sc,
             SUM(c * c) AS scc
      FROM daily GROUP BY 1)
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           CAST(sc AS BIGINT) AS n_events,
           ROUND(CAST(sc AS DOUBLE) / n_days, 4) AS mean_daily,
           ROUND((CAST(scc AS DOUBLE) * n_days - CAST(sc AS DOUBLE) * sc)
                 / (CAST(n_days AS DOUBLE) * n_days), 4) AS var_daily,
           ROUND((CAST(scc AS DOUBLE) * n_days - CAST(sc AS DOUBLE) * sc)
                 / (CAST(n_days AS DOUBLE) * sc), 4) AS fano
    FROM m ORDER BY event_type
    """,
    doc="Event burstiness via the Fano factor (variance/mean of daily "
    "counts per event type): ~1 for a Poisson arrival process, >1 for "
    "bursty traffic — the dispersion screen that separates organic "
    "activity from batchy/bot-like load before rate-based features "
    "are trusted. Population variance is computed from exact integer "
    "moments (sum c, sum c^2 over the calendar-bounded daily rollup) "
    "in one double expression. Plan: two keyed aggregates, both "
    "map-side combined; result is |event types| rows.",
)
def event_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("c"))
    m = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    nd = F.col("n_days").cast("double")
    scd = F.col("sc").cast("double")
    var_num = F.col("scc").cast("double") * F.col("n_days") - scd * F.col("sc")
    return m.select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("sc").cast("bigint").alias("n_events"),
        dround(scd / F.col("n_days"), 4).alias("mean_daily"),
        dround(var_num / (nd * F.col("n_days")), 4).alias("var_daily"),
        dround(var_num / (nd * F.col("sc")), 4).alias("fano"),
    ).orderBy("event_type")


@query(
    "referential_integrity_audit",
    oracle="""
    WITH checks AS (
      SELECT 'lineitem.l_orderkey->orders' AS fk,
             (SELECT COUNT(*) FROM lineitem) AS n_child,
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphans
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey))
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                WHERE s.s_suppkey = l.l_suppkey))
      UNION ALL
      SELECT 'orders.o_custkey->customer',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = c.c_nationkey))
      UNION ALL
      SELECT 'supplier.s_nationkey->nation',
             (SELECT COUNT(*) FROM supplier),
             (SELECT COUNT(*) FROM supplier s
              WHERE NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = s.s_nationkey))
      UNION ALL
      SELECT 'nation.n_regionkey->region',
             (SELECT COUNT(*) FROM nation),
             (SELECT COUNT(*) FROM nation n
              WHERE NOT EXISTS (SELECT 1 FROM region r
                                WHERE r.r_regionkey = n.n_regionkey))
      UNION ALL
      SELECT 'events.user_id->customer',
             (SELECT COUNT(*) FROM events),
             (SELECT COUNT(*) FROM events e
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = e.user_id)))
    SELECT fk, CAST(n_child AS BIGINT) AS n_child,
           CAST(n_orphans AS BIGINT) AS n_orphans,
           ROUND(100.0 * n_orphans / n_child, 4) AS pct_orphans
    FROM checks ORDER BY fk
    """,
    doc="Referential-integrity audit across the whole star schema: for "
    "every declared FK edge (lineitem->orders/part/supplier, "
    "orders->customer, customer/supplier->nation, nation->region, plus "
    "the behavioral events.user_id->customer link), count child rows "
    "whose key has no parent — the first report a warehouse migration "
    "or a training-data join plan needs, since every silent orphan "
    "becomes a dropped row in an inner join. Each check is one "
    "LEFT ANTI join (broadcast for dimension parents, shuffled-keyed "
    "for the fact-fact edge) + a count; the 8-row union is constant "
    "size at any corpus scale.",
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    t = {
        n: load_table(spark, sf_dir, n)
        for n in (
            "lineitem",
            "orders",
            "part",
            "supplier",
            "customer",
            "nation",
            "region",
            "events",
        )
    }
    checks = [
        ("lineitem.l_orderkey->orders", t["lineitem"], "l_orderkey",
         t["orders"], "o_orderkey", False),
        ("lineitem.l_partkey->part", t["lineitem"], "l_partkey",
         t["part"], "p_partkey", True),
        ("lineitem.l_suppkey->supplier", t["lineitem"], "l_suppkey",
         t["supplier"], "s_suppkey", True),
        ("orders.o_custkey->customer", t["orders"], "o_custkey",
         t["customer"], "c_custkey", True),
        ("customer.c_nationkey->nation", t["customer"], "c_nationkey",
         t["nation"], "n_nationkey", True),
        ("supplier.s_nationkey->nation", t["supplier"], "s_nationkey",
         t["nation"], "n_nationkey", True),
        ("nation.n_regionkey->region", t["nation"], "n_regionkey",
         t["region"], "r_regionkey", True),
        ("events.user_id->customer", t["events"], "user_id",
         t["customer"], "c_custkey", True),
    ]
    rows = []
    for fk, child, ck, parent, pk, bcast in checks:
        pkeys = parent.select(pk)
        if bcast:
            pkeys = F.broadcast(pkeys)
        orphans = child.join(
            pkeys, child[ck] == pkeys[pk], "left_anti"
        ).agg(F.count("*").alias("n_orphans"))
        total = child.agg(F.count("*").alias("n_child"))
        rows.append(
            total.crossJoin(orphans).select(
                F.lit(fk).alias("fk"), "n_child", "n_orphans"
            )
        )
    u = reduce(lambda a, b: a.unionAll(b), rows)
    return u.select(
        "fk",
        F.col("n_child").cast("bigint").alias("n_child"),
        F.col("n_orphans").cast("bigint").alias("n_orphans"),
        dround(100.0 * F.col("n_orphans") / F.col("n_child"), 4).alias(
            "pct_orphans"
        ),
    ).orderBy("fk")


@query(
    "covisitation_topk",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    pairs AS (
      SELECT a.pk AS pa, b.pk AS pb, COUNT(*) AS n_co
      FROM op a JOIN op b ON a.ok = b.ok AND a.pk <> b.pk
      GROUP BY 1, 2),
    seed_tot AS (
      SELECT pa AS seed, SUM(n_co) AS total_co FROM pairs GROUP BY 1),
    seeds AS (
      SELECT seed, total_co FROM seed_tot
      ORDER BY total_co DESC, seed LIMIT 10),
    ranked AS (
      SELECT pairs.pa AS seed, pairs.pb AS neighbor, pairs.n_co,
             ROW_NUMBER() OVER (PARTITION BY pairs.pa
                                ORDER BY pairs.n_co DESC, pairs.pb) AS rnk
      FROM pairs JOIN seeds ON seeds.seed = pairs.pa)
    SELECT CAST(seed AS BIGINT) AS seed,
           CAST(neighbor AS BIGINT) AS neighbor,
           CAST(n_co AS BIGINT) AS n_co,
           CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 3
    ORDER BY seed, rnk
    """,
    doc="Co-visitation top-k — the classical 'bought X, also bought Y' "
    "recommender primitive (the item-item heart of e-commerce recsys "
    "and of co-occurrence candidate generation): directed co-purchase "
    "counts, top-3 neighbors for the 10 most-connected seed items. "
    "Plan: the order-keyed pair self-join (spec-bounded lines/order), "
    "a (pa,pb)-keyed count, seed selection via TakeOrderedAndProject, "
    "then a PER-SEED (keyed) top-k window over the broadcast-filtered "
    "10-seed slice — no global window, no all-pairs over the catalog. "
    "Deterministic: neighbor ranks break count ties by id.",
)
def covisitation_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.caching import persisted
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = op.select(F.col("ok"), F.col("pk").alias("pa"))
    b = op.select(F.col("ok"), F.col("pk").alias("pb"))
    pairs = persisted(
        a.join(b, "ok")
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("n_co"))
    )
    seeds = (
        pairs.groupBy(F.col("pa").alias("seed"))
        .agg(F.sum("n_co").alias("total_co"))
        .orderBy(F.col("total_co").desc(), "seed")
        .limit(10)
        .select("seed")
    )
    w = Window.partitionBy("seed").orderBy(F.col("n_co").desc(), "neighbor")
    return (
        pairs.join(
            F.broadcast(seeds), pairs.pa == seeds.seed
        )
        .select(
            "seed", F.col("pb").alias("neighbor"), "n_co"
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("seed").cast("bigint").alias("seed"),
            F.col("neighbor").cast("bigint").alias("neighbor"),
            F.col("n_co").cast("bigint").alias("n_co"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("seed", "rnk")
    )


_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]


@query(
    "t_closeness_report",
    oracle="""
    WITH rec AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             CAST(floor(c.c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             o.o_orderpriority AS sensitive
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    grp AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             COUNT(*) AS n_g,
             SUM(CASE WHEN sensitive = '1-URGENT' THEN 1 ELSE 0 END) AS p1,
             SUM(CASE WHEN sensitive = '2-HIGH' THEN 1 ELSE 0 END) AS p2,
             SUM(CASE WHEN sensitive = '3-MEDIUM' THEN 1 ELSE 0 END) AS p3,
             SUM(CASE WHEN sensitive = '4-NOT SPECIFIED' THEN 1 ELSE 0 END)
               AS p4
      FROM rec GROUP BY 1, 2, 3),
    gl AS (
      SELECT SUM(n_g) AS nn, SUM(p1) AS g1, SUM(p1 + p2) AS g2,
             SUM(p1 + p2 + p3) AS g3, SUM(p1 + p2 + p3 + p4) AS g4
      FROM grp),
    emd AS (
      SELECT grp.n_g,
             abs(grp.p1 * gl.nn - gl.g1 * grp.n_g)
             + abs((grp.p1 + grp.p2) * gl.nn - gl.g2 * grp.n_g)
             + abs((grp.p1 + grp.p2 + grp.p3) * gl.nn
                   - gl.g3 * grp.n_g)
             + abs((grp.p1 + grp.p2 + grp.p3 + grp.p4) * gl.nn
                   - gl.g4 * grp.n_g) AS num,
             4 * grp.n_g * gl.nn AS den
      FROM grp, gl),
    banded AS (
      SELECT CASE WHEN 10 * num <= den THEN 'a_t<=0.1'
                  WHEN 5 * num <= den THEN 'b_t<=0.2'
                  ELSE 'c_t>0.2' END AS t_band,
             n_g, CAST(num AS DOUBLE) / den AS emd
      FROM emd)
    SELECT t_band, CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(n_g) AS BIGINT) AS n_rows,
           ROUND(MAX(emd), 6) AS max_emd
    FROM banded GROUP BY 1 ORDER BY t_band
    """,
    doc="t-closeness audit — the third leg of the privacy triad "
    "(k_anonymity_report, l_diversity_report share the same "
    "quasi-identifier): even a diverse group leaks if its sensitive-"
    "value DISTRIBUTION diverges from the corpus-wide one, so the "
    "screen is the Earth Mover's Distance between each QI group's "
    "order-priority distribution and the global distribution over the "
    "ordered categories (EMD = mean |cumulative-share gap|). Every "
    "comparison is INTEGER-EXACT: cum shares are cross-multiplied "
    "rationals |c_k*N - C_k*n_g| with one division at report time, "
    "and the t<=0.1/0.2 band tests are scaled-integer inequalities. "
    "Plan: one broadcast dim join, one QI-keyed conditional aggregate "
    "(the 5 category columns pivot map-side), a 1-row global "
    "broadcast, a 3-row band rollup.",
)
def t_closeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rec = orders.join(
        F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")
    ).select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
        F.col("o_orderpriority").alias("sensitive"),
    )
    pcols = [
        F.sum(F.when(F.col("sensitive") == p, 1).otherwise(0)).alias(
            f"p{i + 1}"
        )
        for i, p in enumerate(_PRIORITIES[:4])
    ]
    grp = rec.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("n_g"), *pcols
    )
    c1 = F.col("p1")
    c2 = F.col("p1") + F.col("p2")
    c3 = c2 + F.col("p3")
    c4 = c3 + F.col("p4")
    glob = grp.agg(
        F.sum("n_g").alias("nn"),
        F.sum(c1).alias("g1"),
        F.sum(c2).alias("g2"),
        F.sum(c3).alias("g3"),
        F.sum(c4).alias("g4"),
    )
    emd = grp.crossJoin(F.broadcast(glob)).select(
        "n_g",
        (
            F.abs(c1 * F.col("nn") - F.col("g1") * F.col("n_g"))
            + F.abs(c2 * F.col("nn") - F.col("g2") * F.col("n_g"))
            + F.abs(c3 * F.col("nn") - F.col("g3") * F.col("n_g"))
            + F.abs(c4 * F.col("nn") - F.col("g4") * F.col("n_g"))
        ).alias("num"),
        (4 * F.col("n_g") * F.col("nn")).alias("den"),
    )
    banded = emd.select(
        F.when(10 * F.col("num") <= F.col("den"), "a_t<=0.1")
        .when(5 * F.col("num") <= F.col("den"), "b_t<=0.2")
        .otherwise("c_t>0.2")
        .alias("t_band"),
        "n_g",
        (F.col("num").cast("double") / F.col("den")).alias("emd"),
    )
    return (
        banded.groupBy("t_band")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum("n_g").cast("bigint").alias("n_rows"),
            dround(F.max("emd"), 6).alias("max_emd"),
        )
        .orderBy("t_band")
    )


@query(
    "ips_policy_value",
    oracle="""
    WITH logged AS (
      SELECT event_type AS action, value AS reward FROM events),
    a AS (
      SELECT action, COUNT(*) AS n, ROUND(SUM(reward), 2) AS sum_reward
      FROM logged GROUP BY 1),
    g AS (SELECT SUM(n) AS nn, COUNT(*) AS k FROM a)
    SELECT a.action, CAST(a.n AS BIGINT) AS n,
           ROUND(CAST(a.n AS DOUBLE) / g.nn, 6) AS logging_p,
           ROUND(1.0 / g.k, 6) AS target_p,
           a.sum_reward,
           ROUND(a.sum_reward / (g.k * a.n), 6) AS ips_contrib
    FROM a, g ORDER BY a.action
    """,
    doc="Off-policy evaluation via Inverse Propensity Scoring — the "
    "counterfactual question every logged-interaction dataset gets "
    "asked before a policy change ships: what value WOULD the uniform "
    "target policy have earned on this log? Each action's IPS "
    "contribution is (1/N) * sum(reward * target_p / logging_p) with "
    "the empirical logging propensity n_a/N, which collapses "
    "algebraically to sum_reward_a / (k * n_a) — so the estimate "
    "needs only per-action keyed aggregates (count + reward sum, "
    "rounded before the ratio per the repo's float-sum convention). "
    "Per-action rows keep the output deterministic (no cross-action "
    "float total). Plan: one map-side keyed aggregate + a 1-row "
    "broadcast — a |actions|-row result at any log size.",
)
def ips_policy_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    a = ev.groupBy(F.col("event_type").alias("action")).agg(
        F.count("*").alias("n"),
        dround(F.sum("value"), 2).alias("sum_reward"),
    )
    g = a.agg(F.sum("n").alias("nn"), F.count("*").alias("k"))
    return (
        a.crossJoin(F.broadcast(g))
        .select(
            "action",
            F.col("n").cast("bigint").alias("n"),
            dround(F.col("n").cast("double") / F.col("nn"), 6).alias(
                "logging_p"
            ),
            dround(F.lit(1.0) / F.col("k"), 6).alias("target_p"),
            "sum_reward",
            dround(
                F.col("sum_reward") / (F.col("k") * F.col("n")), 6
            ).alias("ips_contrib"),
        )
        .orderBy("action")
    )


@query(
    "growth_accounting_weekly",
    oracle="""
    WITH um AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS m FROM events),
    seq AS (
      SELECT user_id, m,
             LAG(m) OVER (PARTITION BY user_id ORDER BY m) AS prev_m
      FROM um),
    tagged AS (
      SELECT m,
             CASE WHEN prev_m IS NULL THEN 'new'
                  WHEN prev_m = m - INTERVAL 1 WEEK THEN 'retained'
                  ELSE 'resurrected' END AS status
      FROM seq),
    act AS (SELECT m, COUNT(*) AS n_active FROM um GROUP BY 1),
    churn AS (
      SELECT m + INTERVAL 1 WEEK AS m, COUNT(*) AS n_churned
      FROM (
        SELECT user_id, m,
               LEAD(m) OVER (PARTITION BY user_id ORDER BY m) AS next_m
        FROM um)
      WHERE next_m IS NULL OR next_m > m + INTERVAL 1 WEEK
      GROUP BY 1)
    SELECT CAST(act.m AS DATE) AS week,
           CAST(act.n_active AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN tagged.status = 'new' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN tagged.status = 'retained' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN tagged.status = 'resurrected' THEN 1 ELSE 0
                END) AS BIGINT) AS n_resurrected,
           CAST(COALESCE(any_value(churn.n_churned), 0) AS BIGINT)
             AS n_churned_in
    FROM tagged
    JOIN act ON act.m = tagged.m
    LEFT JOIN churn ON churn.m = tagged.m
    GROUP BY act.m, act.n_active
    ORDER BY week
    """,
    doc="Growth accounting — the canonical active-base decomposition every "
    "growth team reads weekly: each month's active users split into "
    "new (first month ever), retained (active last month too) and "
    "resurrected (returning after a gap), plus the users who churned "
    "INTO the month (active previous month, absent now). Identity "
    "n_active = new + retained + resurrected holds by construction. "
    "Plan: one distinct (user, week) projection, LAG/LEAD windows "
    "PARTITIONED BY user (keyed — the corpus-scaled stage shuffles "
    "once on the user key), then calendar-bounded month rollups "
    "joined month-to-month. All counts are integers; no floats "
    "anywhere.",
)
def growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    um = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("m")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("m")
    seq = um.select(
        "user_id", "m", F.lag("m").over(w).alias("prev_m"),
        F.lead("m").over(w).alias("next_m"),
    )
    tagged = seq.select(
        "m",
        F.when(F.col("prev_m").isNull(), "new")
        .when(
            F.col("prev_m") == F.col("m") - F.expr("INTERVAL 1 WEEK"),
            "retained",
        )
        .otherwise("resurrected")
        .alias("status"),
    )
    act = um.groupBy("m").agg(F.count("*").alias("n_active"))
    churn = (
        seq.filter(
            F.col("next_m").isNull()
            | (F.col("next_m") > F.col("m") + F.expr("INTERVAL 1 WEEK"))
        )
        .select((F.col("m") + F.expr("INTERVAL 1 WEEK")).alias("cm"))
        .groupBy("cm")
        .agg(F.count("*").alias("n_churned"))
    )
    per_status = tagged.groupBy("m").agg(
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias(
            "n_new"
        ),
        F.sum(F.when(F.col("status") == "retained", 1).otherwise(0)).alias(
            "n_retained"
        ),
        F.sum(
            F.when(F.col("status") == "resurrected", 1).otherwise(0)
        ).alias("n_resurrected"),
    )
    return (
        per_status.join(F.broadcast(act), "m")
        .join(F.broadcast(churn), per_status.m == churn.cm, "left")
        .select(
            F.col("m").cast("date").alias("week"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("n_new").cast("bigint").alias("n_new"),
            F.col("n_retained").cast("bigint").alias("n_retained"),
            F.col("n_resurrected").cast("bigint").alias("n_resurrected"),
            F.coalesce(F.col("n_churned"), F.lit(0))
            .cast("bigint")
            .alias("n_churned_in"),
        )
        .orderBy("week")
    )


@query(
    "dau_wau_stickiness",
    oracle="""
    WITH d AS (
      SELECT date_trunc('week', ts) AS m, CAST(ts AS DATE) AS day,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2),
    wau AS (
      SELECT date_trunc('week', ts) AS m, COUNT(DISTINCT user_id) AS wau
      FROM events GROUP BY 1),
    davg AS (
      SELECT m, COUNT(*) AS n_days, SUM(dau) AS sum_dau FROM d GROUP BY 1)
    SELECT CAST(davg.m AS DATE) AS week,
           CAST(davg.n_days AS BIGINT) AS n_days,
           CAST(wau.wau AS BIGINT) AS wau,
           ROUND(CAST(davg.sum_dau AS DOUBLE) / davg.n_days, 4) AS avg_dau,
           ROUND(CAST(davg.sum_dau AS DOUBLE)
                 / (davg.n_days * wau.wau), 6) AS stickiness
    FROM davg JOIN wau ON wau.m = davg.m
    ORDER BY week
    """,
    doc="DAU/WAU stickiness — the engagement-frequency ratio (what "
    "fraction of the week's users show up on an average day). Exact "
    "distinct counts keyed by (week, day) and week; the ratio is "
    "one double division over integer sums. Plan: two keyed "
    "distinct aggregates (partial-distinct map side), a calendar-"
    "bounded week join. At 100 TB swap the exact distincts for HLL "
    "sketches if 2% error is acceptable — the exact form is the "
    "oracle-checkable contract.",
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("week", F.col("ts")).alias("m"),
        F.col("ts").cast("date").alias("day"),
    ).agg(F.countDistinct("user_id").alias("dau"))
    wau = ev.groupBy(
        F.date_trunc("week", F.col("ts")).alias("m")
    ).agg(F.countDistinct("user_id").alias("wau"))
    davg = d.groupBy("m").agg(
        F.count("*").alias("n_days"), F.sum("dau").alias("sum_dau")
    )
    return (
        davg.join(F.broadcast(wau), "m")
        .select(
            F.col("m").cast("date").alias("week"),
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("wau").cast("bigint").alias("wau"),
            dround(
                F.col("sum_dau").cast("double") / F.col("n_days"), 4
            ).alias("avg_dau"),
            dround(
                F.col("sum_dau").cast("double")
                / (F.col("n_days") * F.col("wau")),
                6,
            ).alias("stickiness"),
        )
        .orderBy("week")
    )


def _frontier_expand(
    edges: DataFrame, frontier: DataFrame, visited: DataFrame
) -> DataFrame:
    """One BFS hop: neighbors of the (pre-gated) frontier minus the
    (pre-gated) visited set.  Callers pass ``F.broadcast``-wrapped
    frontier/visited under the size gate — the edge relation is then
    never shuffled (BroadcastHashJoin + broadcast anti-join, zero edge
    Exchange).  Module-level so the plan-pinning test asserts that
    shape on the exact production join."""
    return (
        edges.select(F.col("u").alias("n"), "v")
        .join(frontier, "n")
        .select(F.col("v").alias("n"))
        .distinct()
        .join(visited, "n", "left_anti")
    )


@query(
    "bfs_reachability_hops",
    oracle="""
    WITH RECURSIVE e0 AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    edges AS (
      SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
    deg AS (
      SELECT u AS n, COUNT(*) AS d FROM edges GROUP BY 1),
    seed AS (SELECT n FROM deg ORDER BY d DESC, n LIMIT 1),
    reach(n, hop) AS (
      SELECT n, 0 FROM seed
      UNION
      SELECT edges.v, reach.hop + 1
      FROM reach JOIN edges ON edges.u = reach.n
      WHERE reach.hop < 3),
    first_hop AS (SELECT n, MIN(hop) AS hop FROM reach GROUP BY 1)
    SELECT CAST(hop AS INTEGER) AS hop,
           CAST(COUNT(*) AS BIGINT) AS n_reached
    FROM first_hop GROUP BY hop ORDER BY hop
    """,
    doc="Breadth-first reachability from the co-purchase graph's "
    "highest-degree part: how many parts are first reached at hop "
    "1/2/3 — the frontier-expansion profile that sizes any "
    "graph-traversal workload (and the small-world check: a dense "
    "catalog saturates by hop 2). Spark side is the canonical "
    "distributed BFS: per round, frontier JOIN edges (keyed on node "
    "id) -> distinct -> LEFT ANTI against the visited set, with "
    "localCheckpoint truncating the iterative lineage "
    "(connected_components' convention); the driver holds only the "
    "4 per-hop counts. The oracle replays reachability with a "
    "recursive CTE. Seed selection (max degree, id tiebreak) is a "
    "bounded TakeOrdered.",
)
def bfs_reachability_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.caching import persisted
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    # Persist the UNDIRECTED pair list only (r14): the doubled directed
    # edge list is derivable by two cheap projections of this cache, so
    # materializing and storing a second relation of twice the rows
    # bought nothing — the seed degree now comes from ONE single-pass
    # explode scan of the half-size cache instead of a full scan of the
    # doubled one (explode(array(u,v)) ≡ the doubled list's groupBy(u)).
    e0 = persisted(
        a.join(b, "k").filter(F.col("u") < F.col("v")).select("u", "v")
        .distinct()
    )
    edges = e0.unionByName(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    seed_row = (
        e0.select(F.explode(F.array("u", "v")).alias("u"))
        .groupBy("u")
        .agg(F.count("*").alias("d"))
        .orderBy(F.col("d").desc(), "u")
        .limit(1)
        .first()
    )
    seed = int(seed_row["u"])
    frontier = spark.createDataFrame([(seed,)], "n bigint").localCheckpoint()
    # r13 optimization: each hop's frontier is already materialized by its
    # localCheckpoint (needed to truncate the iterative lineage), so the
    # per-hop count() jobs and the per-hop visited re-checkpoints were
    # redundant work — visited stays a lazy union of the checkpointed
    # frontiers (<= 4 tiny scans per anti-join) and the hop histogram is
    # ONE final aggregate over the tagged union (7 jobs -> 3).
    # A checkpointed frontier has no size statistics, so the planner
    # falls back to sort-merge and shuffles the FULL edge list every hop.
    # The frontier/visited sets are checkpointed (already materialized),
    # so counting them is a cheap in-memory job — use it to SIZE-GATE an
    # explicit broadcast (guide §3.1: hint when you know a side is small;
    # estimates are wrong after checkpoints).  Past the budget (a hop
    # where the frontier blows up at scale) the gate disappears and the
    # keyed joins stand.
    from kyuubi_spark.operators.broadcast import broadcast_budget as _broadcast_budget

    budget = _broadcast_budget(spark)

    def _gate(df, n_rows):
        return F.broadcast(df) if 0 <= n_rows * 16 <= budget else df

    levels = [frontier.withColumn("hop", F.lit(0))]
    visited = frontier
    n_visited = 1
    for hop in (1, 2, 3):
        # LAZY checkpoint + count = ONE job per hop (r14): the count is
        # the materializing action, so the r13 eager-checkpoint job and
        # its follow-up count job collapse into a single pass while the
        # checkpoint still truncates the iterative lineage
        nxt = _frontier_expand(
            edges,
            _gate(frontier, n_visited),
            _gate(visited, n_visited),
        ).localCheckpoint(eager=False)
        c = nxt.count()  # materializes the checkpoint AND counts it
        levels.append(nxt.withColumn("hop", F.lit(hop)))
        visited = visited.unionByName(nxt.select("n"))
        n_visited += c
        frontier = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return (
        out.groupBy("hop")
        .agg(F.count("*").alias("n_reached"))
        .filter(F.col("n_reached") > 0)
        .select(
            F.col("hop").cast("int").alias("hop"),
            F.col("n_reached").cast("bigint").alias("n_reached"),
        )
        .orderBy("hop")
    )


@query(
    "naive_bayes_langid_eval",
    oracle="""
    WITH train AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 <> 0),
    eval AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 10 = 0),
    tok_train AS (
      SELECT lang, unnest(string_split(trim(text), ' ')) AS term
      FROM train),
    ntl AS (SELECT term, lang, COUNT(*) AS n FROM tok_train GROUP BY 1, 2),
    nl AS (SELECT lang, COUNT(*) AS n_l FROM tok_train GROUP BY 1),
    vocab AS (SELECT DISTINCT term FROM tok_train),
    vsz AS (SELECT COUNT(*) AS v FROM vocab),
    prior AS (
      SELECT lang, CAST(round(1000000.0 * ln(
               CAST(COUNT(*) AS DOUBLE)
               / (SELECT COUNT(*) FROM train))) AS BIGINT) AS prior_micro
      FROM train GROUP BY lang),
    grid AS (
      SELECT vocab.term, nl.lang,
             CAST(round(1000000.0 * ln(
               (COALESCE(ntl.n, 0) + 1.0) / (nl.n_l + vsz.v)))
               AS BIGINT) AS micro
      FROM vocab CROSS JOIN nl CROSS JOIN vsz
      LEFT JOIN ntl ON ntl.term = vocab.term AND ntl.lang = nl.lang),
    tok_eval AS (
      SELECT doc_id, lang AS true_lang,
             unnest(string_split(trim(text), ' ')) AS term
      FROM eval),
    scores AS (
      SELECT t.doc_id, t.true_lang, g.lang AS cand,
             any_value(p.prior_micro) + SUM(g.micro) AS score
      FROM tok_eval t
      JOIN grid g ON g.term = t.term
      JOIN prior p ON p.lang = g.lang
      GROUP BY t.doc_id, t.true_lang, g.lang),
    pred AS (
      SELECT doc_id, true_lang, cand AS pred_lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, cand) AS rn
      FROM scores)
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred WHERE rn = 1
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Multinomial Naive Bayes language-ID, trained and evaluated "
    "inside the engine: token-given-language probabilities with "
    "Laplace smoothing from the 90% training split (deterministic "
    "doc_id%10 holdout, the train_test_split convention), scored on "
    "the held-out 10% and reported as a confusion matrix. Scoring is "
    "FIXED-POINT: every log-prob quantizes to an integer micro-logit "
    "(round(1e6*ln p)) so per-doc score sums are exact integer "
    "arithmetic — the argmax can never flip on cross-engine float "
    "summation order, the failure mode a naive SUM(ln p) would have. "
    "Plan: token-keyed training counts, a |vocab|x|langs| smoothed "
    "grid (155 rows) BROADCAST to the eval tokens, one (doc, lang) "
    "keyed integer aggregate, per-doc argmax via min(struct) — keyed, "
    "no global window. OOV eval tokens drop (inner join), the "
    "standard NB treatment.",
)
def naive_bayes_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 10 != 0)
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tok_train = train.select(
        "lang", F.explode(F.split(F.trim(F.col("text")), " ")).alias("term")
    )
    ntl = tok_train.groupBy("term", "lang").agg(F.count("*").alias("n"))
    nl = tok_train.groupBy("lang").agg(F.count("*").alias("n_l"))
    vocab = tok_train.select("term").distinct()
    vsz = vocab.agg(F.count("*").alias("v"))
    n_train = train.count()
    prior = train.groupBy("lang").agg(
        F.round(
            1000000.0
            * F.log(F.count("*").cast("double") / F.lit(float(n_train))),
            0,
        )
        .cast("bigint")
        .alias("prior_micro")
    )
    grid = (
        vocab.crossJoin(F.broadcast(nl))
        .crossJoin(F.broadcast(vsz))
        .join(F.broadcast(ntl), ["term", "lang"], "left")
        .select(
            "term",
            "lang",
            F.round(
                1000000.0
                * F.log(
                    (F.coalesce(F.col("n"), F.lit(0)) + 1.0)
                    / (F.col("n_l") + F.col("v"))
                ),
                0,
            )
            .cast("bigint")
            .alias("micro"),
        )
    )
    tok_eval = ev.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("term"),
    )
    scores = (
        tok_eval.join(F.broadcast(grid), "term")
        .join(F.broadcast(prior), "lang")
        .groupBy("doc_id", "true_lang", F.col("lang").alias("cand"))
        .agg(
            (F.any_value("prior_micro") + F.sum("micro")).alias("score")
        )
    )
    pred = scores.groupBy("doc_id", "true_lang").agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("cand"))).alias(
            "best"
        )
    )
    return (
        pred.groupBy(
            "true_lang", F.col("best.cand").alias("pred_lang")
        )
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


@query(
    "ndcg_retrieval_eval",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
      FROM documents),
    rel AS (
      SELECT doc_id, COUNT(DISTINCT term) AS relevance
      FROM tok WHERE term IN ('spark', 'join', 'stream')
      GROUP BY 1),
    dl AS (SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS DOUBLE)
                    AS doclen FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(doclen) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
           FROM tok WHERE term IN ('spark', 'join', 'stream') GROUP BY 1, 2),
    df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
    idf AS (SELECT term, ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5)
                            + 1.0) AS idf
            FROM df, stats),
    bm AS (
      SELECT dl.doc_id, ROUND(SUM(
               idf.idf * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / stats.avgdl))),
             4) AS bm25
      FROM dl JOIN tf ON tf.doc_id = dl.doc_id
              JOIN idf ON idf.term = tf.term, stats
      GROUP BY dl.doc_id),
    ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
      FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20)),
    gains AS (
      SELECT ranked.r,
             CAST(round(1000000.0 * COALESCE(rel.relevance, 0)
                        / log2(ranked.r + 1)) AS BIGINT) AS dcg_micro
      FROM ranked LEFT JOIN rel ON rel.doc_id = ranked.doc_id),
    ideal AS (
      SELECT ROW_NUMBER() OVER (ORDER BY relevance DESC, doc_id) AS r,
             relevance
      FROM (SELECT doc_id, relevance FROM rel
            ORDER BY relevance DESC, doc_id LIMIT 20)),
    igains AS (
      SELECT r, CAST(round(1000000.0 * relevance / log2(r + 1)) AS BIGINT)
               AS idcg_micro
      FROM ideal),
    ks AS (SELECT unnest([5, 10, 20]) AS k)
    SELECT CAST(ks.k AS INTEGER) AS k,
           CAST((SELECT SUM(dcg_micro) FROM gains WHERE r <= ks.k)
                AS BIGINT) AS dcg_micro,
           CAST((SELECT SUM(idcg_micro) FROM igains WHERE r <= ks.k)
                AS BIGINT) AS idcg_micro,
           ROUND(CAST((SELECT SUM(dcg_micro) FROM gains WHERE r <= ks.k)
                      AS DOUBLE)
                 / (SELECT SUM(idcg_micro) FROM igains WHERE r <= ks.k), 6)
             AS ndcg
    FROM ks ORDER BY k
    """,
    doc="NDCG@k evaluation of the BM25 ranker — the IR quality metric "
    "that closes the retrieval loop (bm25_topk/rrf_fusion produce "
    "rankings; this scores one): graded relevance = number of "
    "distinct query terms a doc contains (an exact, label-free "
    "integer), DCG discounts each rank by log2(r+1), normalized by "
    "the ideal ordering. Per-rank gains quantize to integer "
    "micro-units (round(1e6*rel/log2(r+1))) so the k-prefix sums are "
    "exact integer arithmetic — no float accumulation order can move "
    "NDCG. Plan: the BM25 top-20 and the ideal top-20 are "
    "TakeOrderedAndProject slices; ranks are <=20-row windows "
    "(audit-allowlisted, tpcds_q44 class); the k-sweep is a 3-row "
    "broadcast.",
)
def ndcg_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("term")
    )
    qterms = ["spark", "join", "stream"]
    rel = (
        tok.filter(F.col("term").isin(*qterms))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("relevance"))
    )
    tf = (
        tok.filter(F.col("term").isin(*qterms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dl = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " "))
        .cast("double")
        .alias("doclen"),
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ).alias("idf"),
            "avgdl",
        )
    )
    bm = (
        dl.join(tf, "doc_id")
        .join(F.broadcast(idf), "term")
        .select(
            "doc_id",
            (
                F.col("idf") * F.col("tf") * 2.2
                / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("doclen") / F.col("avgdl")))
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(dround(F.sum("part"), 4).alias("bm25"))
    )
    ranked = (
        bm.orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
            .alias("r"),
        )
    )
    gains = ranked.join(rel, "doc_id", "left").select(
        "r",
        F.round(
            1000000.0
            * F.coalesce(F.col("relevance"), F.lit(0))
            / F.log2(F.col("r") + 1),
            0,
        )
        .cast("bigint")
        .alias("dcg_micro"),
    )
    ideal = (
        rel.orderBy(F.col("relevance").desc(), "doc_id")
        .limit(20)
        .select(
            "relevance",
            F.row_number()
            .over(Window.orderBy(F.col("relevance").desc(), "doc_id"))
            .alias("r"),
        )
        .select(
            "r",
            F.round(
                1000000.0 * F.col("relevance") / F.log2(F.col("r") + 1), 0
            )
            .cast("bigint")
            .alias("idcg_micro"),
        )
    )
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (5, 10, 20)])).alias("k")
    )
    dcg = (
        ks.join(F.broadcast(gains), F.col("r") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("dcg_micro").alias("dcg_micro"))
    )
    idcg = (
        ks.join(F.broadcast(ideal), F.col("r") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("idcg_micro").alias("idcg_micro"))
    )
    return (
        dcg.join(idcg, "k")
        .select(
            F.col("k").cast("int").alias("k"),
            F.col("dcg_micro").cast("bigint").alias("dcg_micro"),
            F.col("idcg_micro").cast("bigint").alias("idcg_micro"),
            dround(
                F.col("dcg_micro").cast("double") / F.col("idcg_micro"), 6
            ).alias("ndcg"),
        )
        .orderBy("k")
    )


@query(
    "interevent_gap_histogram",
    oracle="""
    WITH seq AS (
      SELECT user_id, epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_us
      FROM events),
    gaps AS (
      SELECT CAST(floor(log2((us - prev_us) / 1000000.0 + 1.0)) AS BIGINT)
               AS bucket
      FROM seq WHERE prev_us IS NOT NULL AND us > prev_us),
    g AS (SELECT COUNT(*) AS total FROM gaps)
    SELECT bucket,
           CAST(pow(2, bucket) - 1 AS BIGINT) AS gap_from_sec,
           CAST(pow(2, bucket + 1) - 1 AS BIGINT) AS gap_to_sec,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(CAST(COUNT(*) AS DOUBLE) / any_value(g.total), 6) AS share
    FROM gaps, g GROUP BY bucket ORDER BY bucket
    """,
    doc="Inter-event gap histogram in log2 seconds buckets — the "
    "arrival-process fingerprint (heartbeats pile into low buckets, "
    "organic sessions spread, day-scale gaps mark returns) that "
    "complements event_burstiness_fano's dispersion scalar with the "
    "full distribution. Gaps come from a LAG window PARTITIONED BY "
    "user (keyed); the log2 bucket is floor(log2(sec+1)) on an exact "
    "integer microsecond difference, so bucket edges can't drift "
    "(zero-gaps from same-timestamp events are excluded as "
    "non-arrivals). Plan: one keyed window + one ~20-row bucket "
    "rollup + broadcast total.",
)
def interevent_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(us.alias("us"), F.lag(us).over(w).alias("prev_us"))
    gaps = seq.filter(
        F.col("prev_us").isNotNull() & (F.col("us") > F.col("prev_us"))
    ).select(
        F.floor(
            F.log2((F.col("us") - F.col("prev_us")) / 1000000.0 + 1.0)
        )
        .cast("bigint")
        .alias("bucket")
    )
    g = gaps.agg(F.count("*").alias("total"))
    return (
        gaps.groupBy("bucket")
        .agg(F.count("*").alias("n_gaps"))
        .crossJoin(F.broadcast(g))
        .select(
            "bucket",
            (F.pow(F.lit(2.0), F.col("bucket")) - 1)
            .cast("bigint")
            .alias("gap_from_sec"),
            (F.pow(F.lit(2.0), F.col("bucket") + 1) - 1)
            .cast("bigint")
            .alias("gap_to_sec"),
            F.col("n_gaps").cast("bigint").alias("n_gaps"),
            dround(
                F.col("n_gaps").cast("double") / F.col("total"), 6
            ).alias("share"),
        )
        .orderBy("bucket")
    )


@query(
    "column_profile_report",
    oracle="""
    WITH p AS (
      SELECT 'documents' AS tbl, 'lang' AS col, COUNT(*) AS n,
             COUNT(*) - COUNT(lang) AS n_null,
             COUNT(DISTINCT lang) AS n_distinct
      FROM documents
      UNION ALL
      SELECT 'documents', 'source', COUNT(*), COUNT(*) - COUNT(source),
             COUNT(DISTINCT source) FROM documents
      UNION ALL
      SELECT 'documents', 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
             COUNT(DISTINCT n_chars) FROM documents
      UNION ALL
      SELECT 'events', 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
             COUNT(DISTINCT event_type) FROM events
      UNION ALL
      SELECT 'events', 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
             COUNT(DISTINCT user_id) FROM events
      UNION ALL
      SELECT 'orders', 'o_orderstatus', COUNT(*),
             COUNT(*) - COUNT(o_orderstatus),
             COUNT(DISTINCT o_orderstatus) FROM orders
      UNION ALL
      SELECT 'orders', 'o_orderpriority', COUNT(*),
             COUNT(*) - COUNT(o_orderpriority),
             COUNT(DISTINCT o_orderpriority) FROM orders
      UNION ALL
      SELECT 'customer', 'c_mktsegment', COUNT(*),
             COUNT(*) - COUNT(c_mktsegment),
             COUNT(DISTINCT c_mktsegment) FROM customer
      UNION ALL
      SELECT 'customer', 'c_acctbal', COUNT(*),
             COUNT(*) - COUNT(c_acctbal),
             COUNT(DISTINCT c_acctbal) FROM customer)
    SELECT tbl, col, CAST(n AS BIGINT) AS n,
           CAST(n_null AS BIGINT) AS n_null,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           ROUND(100.0 * n_null / n, 4) AS pct_null
    FROM p ORDER BY tbl, col
    """,
    doc="Column profiling report (the Deequ/Great-Expectations "
    "baseline every warehouse onboarding runs): row count, null "
    "count, exact distinct cardinality and null share for the "
    "categorical/key columns of four tables in one pass per table. "
    "Each table contributes ONE aggregate (all its columns' COUNT/"
    "COUNT(col)/COUNT(DISTINCT col) fold into a single grouped "
    "aggregate with partial distinct) — no per-column rescans; the "
    "9-row union is constant size. At 100 TB swap exact distincts "
    "for HLL per the dataset_card convention.",
)
def column_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    spec = {
        "documents": ["lang", "source", "n_chars"],
        "events": ["event_type", "user_id"],
        "orders": ["o_orderstatus", "o_orderpriority"],
        "customer": ["c_mktsegment", "c_acctbal"],
    }
    parts = []
    for tbl, cols in spec.items():
        df = load_table(spark, sf_dir, tbl)
        aggs = [F.count("*").alias("_n")]
        for c in cols:
            aggs.append(F.count(c).alias(f"_nn_{c}"))
            aggs.append(F.countDistinct(c).alias(f"_nd_{c}"))
        one = df.agg(*aggs)
        for c in cols:
            parts.append(
                one.select(
                    F.lit(tbl).alias("tbl"),
                    F.lit(c).alias("col"),
                    F.col("_n").alias("n"),
                    (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
                    F.col(f"_nd_{c}").alias("n_distinct"),
                )
            )
    u = reduce(lambda a, b: a.unionAll(b), parts)
    return u.select(
        "tbl",
        "col",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        dround(100.0 * F.col("n_null") / F.col("n"), 4).alias("pct_null"),
    ).orderBy("tbl", "col")


@query(
    "popularity_powerlaw_hill",
    oracle="""
    WITH pop AS (
      SELECT l_partkey, COUNT(DISTINCT l_orderkey) AS d
      FROM lineitem GROUP BY 1),
    topk AS (
      SELECT l_partkey, d,
             ROW_NUMBER() OVER (ORDER BY d DESC, l_partkey) AS r
      FROM (SELECT * FROM pop ORDER BY d DESC, l_partkey LIMIT 101)),
    kth AS (SELECT d AS d_ref FROM topk WHERE r = 101),
    hill AS (
      SELECT COUNT(*) AS k,
             SUM(CAST(round(1000000.0 * ln(CAST(topk.d AS DOUBLE)
                                           / kth.d_ref)) AS BIGINT))
               AS sum_micro
      FROM topk, kth WHERE topk.r <= 100)
    SELECT CAST(hill.k AS BIGINT) AS k,
           CAST(kth.d_ref AS BIGINT) AS d_ref,
           CAST(hill.sum_micro AS BIGINT) AS sum_log_micro,
           ROUND(1000000.0 * hill.k / hill.sum_micro, 4) AS hill_alpha
    FROM hill, kth
    """,
    doc="Hill tail-index estimate of the item-popularity distribution "
    "(how heavy is the head of 'orders per part'?): alpha = "
    "k / sum(ln(d_i / d_(k+1))) over the top-k=100 items — the "
    "standard power-law exponent estimator, and the number that "
    "decides whether hot-key mitigation (salting, skew joins) is "
    "needed at scale (alpha < 2 means unbounded variance: expect "
    "monster keys). Per-item log terms quantize to integer "
    "micro-units so the k-sum is exact; popularity itself is one "
    "keyed distinct count and the top-(k+1) slice is "
    "TakeOrderedAndProject with an id tiebreak (the <=101-row rank "
    "window is audit-allowlisted, tpcds_q44 class).",
)
def popularity_powerlaw_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    pop = li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").alias("d")
    )
    topk = (
        pop.orderBy(F.col("d").desc(), "l_partkey")
        .limit(101)
        .select(
            "d",
            F.row_number()
            .over(Window.orderBy(F.col("d").desc(), "l_partkey"))
            .alias("r"),
        )
    )
    kth = topk.filter(F.col("r") == 101).select(
        F.col("d").alias("d_ref")
    )
    hill = (
        topk.filter(F.col("r") <= 100)
        .crossJoin(F.broadcast(kth))
        .agg(
            F.count("*").alias("k"),
            F.sum(
                F.round(
                    1000000.0
                    * F.log(F.col("d").cast("double") / F.col("d_ref")),
                    0,
                ).cast("bigint")
            ).alias("sum_micro"),
            F.any_value("d_ref").alias("d_ref"),
        )
    )
    return hill.select(
        F.col("k").cast("bigint").alias("k"),
        F.col("d_ref").cast("bigint").alias("d_ref"),
        F.col("sum_micro").cast("bigint").alias("sum_log_micro"),
        dround(1000000.0 * F.col("k") / F.col("sum_micro"), 4).alias(
            "hill_alpha"
        ),
    )


@query(
    "outlier_iqr_fences",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    q AS (
      SELECT event_type,
             any_value(n) AS n,
             MAX(CASE WHEN r = CAST(ceil(0.25 * n) AS BIGINT)
                      THEN value END) AS q1,
             MAX(CASE WHEN r = CAST(ceil(0.75 * n) AS BIGINT)
                      THEN value END) AS q3
      FROM ranked GROUP BY event_type),
    f AS (
      SELECT event_type, n, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
      FROM q)
    SELECT f.event_type, CAST(f.n AS BIGINT) AS n,
           ROUND(f.q1, 4) AS q1, ROUND(f.q3, 4) AS q3,
           CAST(SUM(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low,
           CAST(SUM(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high
    FROM events e JOIN f ON f.event_type = e.event_type
    GROUP BY f.event_type, f.n, f.q1, f.q3
    ORDER BY f.event_type
    """,
    doc="Tukey IQR-fence outlier screen per event type — the "
    "distribution-free anomaly count (events_anomaly_zscore assumes "
    "normality; fences don't): Q1/Q3 are EXACT rank-selected order "
    "statistics (ceil(p*n), id tiebreak — never an interpolated "
    "percentile whose semantics differ between engines), fences at "
    "1.5 IQR, then one counting pass. The quartile rank windows are "
    "PARTITIONED BY event type (keyed); the recount joins against "
    "the |types|-row broadcast fence table. No float aggregation "
    "anywhere — the only arithmetic is two IEEE ops on two selected "
    "doubles.",
)
def outlier_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w.orderBy("value", "event_id")).alias("r"),
        F.count("*").over(w).alias("n"),
    )
    q = ranked.groupBy("event_type").agg(
        F.any_value("n").alias("n"),
        F.max(
            F.when(
                F.col("r") == F.ceil(0.25 * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("q1"),
        F.max(
            F.when(
                F.col("r") == F.ceil(0.75 * F.col("n")).cast("bigint"),
                F.col("value"),
            )
        ).alias("q3"),
    )
    f = q.select(
        "event_type",
        "n",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        ev.join(F.broadcast(f), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("n").cast("bigint").alias("n"),
            dround(F.any_value("q1"), 4).alias("q1"),
            dround(F.any_value("q3"), 4).alias("q3"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_low"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_high"),
        )
        .orderBy("event_type")
    )


@query(
    "mann_whitney_auc",
    oracle="""
    WITH c AS (
      SELECT n_chars AS v,
             SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
      FROM documents WHERE source IN ('src0', 'src1')
      GROUP BY 1),
    cum AS (
      SELECT v, ca, cb,
             SUM(cb) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cb
               AS cb_less
      FROM c),
    g AS (SELECT SUM(ca) AS n_a, SUM(cb) AS n_b FROM c),
    u AS (SELECT SUM(ca * (2 * cb_less + cb)) AS u2 FROM cum)
    SELECT CAST(g.n_a AS BIGINT) AS n_a, CAST(g.n_b AS BIGINT) AS n_b,
           CAST(u.u2 AS BIGINT) AS u2,
           ROUND(CAST(u.u2 AS DOUBLE) / (2.0 * g.n_a * g.n_b), 6) AS auc,
           ROUND(CAST(u.u2 AS DOUBLE) / (g.n_a * g.n_b) - 1.0, 6)
             AS cliffs_delta
    FROM u, g
    """,
    doc="Mann-Whitney U between two sources' doc-length distributions, "
    "reported as AUC (P(random src0 doc longer than random src1 doc), "
    "ties half-credited) and Cliff's delta — the nonparametric effect "
    "size that pairs with ks_two_sample's max-gap statistic. The U "
    "statistic is kept as the exact integer 2U = sum(ca*(2*cb_less + "
    "cb_ties)) over the value-keyed rollup, so ordering and ties "
    "never touch floats; AUC divides once at the end. Plan: the "
    "corpus collapses to one row per distinct length (bounded by the "
    "length cap), the cb_less cumulative runs over that rollup "
    "(audit-allowlisted, ks_two_sample class), one 1-row aggregate.",
)
def mann_whitney_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.filter(F.col("source").isin("src0", "src1"))
        .groupBy(F.col("n_chars").alias("v"))
        .agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias(
                "ca"
            ),
            F.sum(F.when(F.col("source") == "src1", 1).otherwise(0)).alias(
                "cb"
            ),
        )
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = c.select(
        "ca",
        "cb",
        (F.sum("cb").over(w) - F.col("cb")).alias("cb_less"),
    )
    g = c.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    u = cum.agg(
        F.sum(
            F.col("ca") * (2 * F.col("cb_less") + F.col("cb"))
        ).alias("u2")
    )
    return u.crossJoin(F.broadcast(g)).select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("u2").cast("bigint").alias("u2"),
        dround(
            F.col("u2").cast("double") / (2.0 * F.col("n_a") * F.col("n_b")),
            6,
        ).alias("auc"),
        dround(
            F.col("u2").cast("double") / (F.col("n_a") * F.col("n_b")) - 1.0,
            6,
        ).alias("cliffs_delta"),
    )


@query(
    "session_path_motifs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events),
    motifs AS (
      SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
      FROM seq WHERE e3 IS NOT NULL
      GROUP BY 1),
    g AS (SELECT SUM(n) AS total FROM motifs)
    SELECT motifs.path, CAST(motifs.n AS BIGINT) AS n,
           ROUND(CAST(motifs.n AS DOUBLE) / g.total, 6) AS share
    FROM motifs, g
    ORDER BY motifs.n DESC, motifs.path
    LIMIT 10
    """,
    doc="Behavioral path motifs: the top-10 three-step event-type "
    "sequences across user journeys — the order-3 extension of "
    "markov_transition_matrix that surfaces WHOLE flows "
    "(view>click>purchase vs view>error>view) instead of single "
    "hops. Plan: two LEAD windows over ONE user-keyed sort (same "
    "partition+order, so Spark plans a single Window node and one "
    "shuffle), a path-keyed count (bounded by |types|^3), broadcast "
    "total, TakeOrderedAndProject top-10 with a path tiebreak.",
)
def session_path_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    motifs = (
        seq.filter(F.col("e3").isNotNull())
        .groupBy(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .agg(F.count("*").alias("n"))
    )
    g = motifs.agg(F.sum("n").alias("total"))
    return (
        motifs.crossJoin(F.broadcast(g))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
        .select(
            "path",
            F.col("n").cast("bigint").alias("n"),
            dround(F.col("n").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
    )


@query(
    "price_quantity_regression",
    oracle="""
    WITH d AS (
      SELECT CAST(round(l_extendedprice) AS BIGINT) AS price_dollars,
             CAST(round(l_quantity) AS BIGINT) AS qty
      FROM lineitem),
    b AS (
      SELECT CAST(price_dollars // 10000 AS BIGINT) AS price_band, qty
      FROM d),
    m AS (
      SELECT COUNT(*) AS n, SUM(price_band) AS sx, SUM(qty) AS sy,
             SUM(price_band * qty) AS sxy,
             SUM(price_band * price_band) AS sxx,
             SUM(qty * qty) AS syy
      FROM b)
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
             AS slope_qty_per_band,
           ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(n AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS pearson_r
    FROM m
    """,
    doc="Demand-curve regression: OLS slope and Pearson correlation of "
    "order-line quantity against the line's $10k price band — the "
    "price/volume screen behind elasticity analysis, computed as ONE "
    "exact-integer moment aggregate (prices round to whole dollars, "
    "quantities are integral in TPC-H; all five moment sums are "
    "BIGINT-exact) with the two ratios evaluated once in doubles. "
    "Plan: a single map-side aggregate over one scan — no shuffle "
    "beyond the 1-row combine, embarrassingly parallel at any scale.",
)
def price_quantity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.floor(
            F.round(F.col("l_extendedprice"), 0).cast("bigint") / 10000
        )
        .cast("bigint")
        .alias("x"),
        F.round(F.col("l_quantity"), 0).cast("bigint").alias("y"),
    )
    m = b.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    num = nd * F.col("sxy") - sxd * F.col("sy")
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        dround(num / (nd * F.col("sxx") - sxd * F.col("sx")), 6).alias(
            "slope_qty_per_band"
        ),
        dround(
            num
            / (
                F.sqrt(nd * F.col("sxx") - sxd * F.col("sx"))
                * F.sqrt(nd * F.col("syy") - syd * F.col("sy"))
            ),
            6,
        ).alias("pearson_r"),
    )


@query(
    "order_to_ship_latency",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority AS priority,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS days,
             l.l_orderkey, l.l_linenumber
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    ranked AS (
      SELECT priority, days,
             ROW_NUMBER() OVER (PARTITION BY priority
                                ORDER BY days, l_orderkey, l_linenumber)
               AS r,
             COUNT(*) OVER (PARTITION BY priority) AS n
      FROM lat)
    SELECT priority, CAST(any_value(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN r = CAST(ceil(0.5 * n) AS BIGINT)
                         THEN days END) AS BIGINT) AS p50_days,
           CAST(MAX(CASE WHEN r = CAST(ceil(0.9 * n) AS BIGINT)
                         THEN days END) AS BIGINT) AS p90_days,
           ROUND(CAST(SUM(days) AS DOUBLE) / any_value(n), 4)
             AS mean_days
    FROM ranked GROUP BY priority ORDER BY priority
    """,
    doc="Order-to-ship latency SLA report per order priority: exact "
    "rank-selected P50/P90 (order statistics with a total tiebreak — "
    "never interpolated percentiles) and the mean, from integer day "
    "differences. The operational question is whether URGENT orders "
    "actually ship faster — a latency-percentile report shaped "
    "exactly like a service SLO dashboard. Plan: one fact-fact keyed "
    "join (order key), per-priority rank windows (keyed, 5 "
    "partitions), one rollup. Day arithmetic is calendar-exact in "
    "both engines (datediff on DATE).",
)
def order_to_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lat = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        )
        .cast("bigint")
        .alias("days"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("priority")
    ranked = lat.select(
        "priority",
        "days",
        F.row_number()
        .over(w.orderBy("days", "l_orderkey", "l_linenumber"))
        .alias("r"),
        F.count("*").over(w).alias("n"),
    )
    return (
        ranked.groupBy("priority")
        .agg(
            F.any_value("n").cast("bigint").alias("n"),
            F.max(
                F.when(
                    F.col("r") == F.ceil(0.5 * F.col("n")).cast("bigint"),
                    F.col("days"),
                )
            )
            .cast("bigint")
            .alias("p50_days"),
            F.max(
                F.when(
                    F.col("r") == F.ceil(0.9 * F.col("n")).cast("bigint"),
                    F.col("days"),
                )
            )
            .cast("bigint")
            .alias("p90_days"),
            dround(
                F.sum("days").cast("double") / F.any_value("n"), 4
            ).alias("mean_days"),
        )
        .orderBy("priority")
    )


@query(
    "audience_overlap_matrix",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    c AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_inter
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT inter.type_a, inter.type_b,
           CAST(ca.n AS BIGINT) AS n_a, CAST(cb.n AS BIGINT) AS n_b,
           CAST(inter.n_inter AS BIGINT) AS n_inter,
           ROUND(CAST(inter.n_inter AS DOUBLE)
                 / (ca.n + cb.n - inter.n_inter), 6) AS jaccard
    FROM inter JOIN c ca ON ca.event_type = inter.type_a
               JOIN c cb ON cb.event_type = inter.type_b
    ORDER BY type_a, type_b
    """,
    doc="Audience overlap matrix: pairwise Jaccard between the USER "
    "SETS of each event type (do purchasers also click? are error "
    "users a separate population?) — the segment-overlap primitive "
    "behind ads-audience planning and feature-interaction checks. "
    "Plan: one distinct (user, type) projection, a USER-KEYED "
    "self-join (per-user fan-out bounded by |types| = 5, so the pair "
    "stream is O(users * 10), never all-pairs over users), per-type "
    "broadcast marginals, |types|^2/2 output rows. Jaccard is an "
    "exact integer rational divided once.",
)
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    c = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = c.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    cb = c.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(ca), "type_a")
        .join(F.broadcast(cb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_inter").cast("bigint").alias("n_inter"),
            dround(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "revenue_by_user_tenure",
    oracle="""
    WITH um AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS first_week
      FROM events GROUP BY 1),
    rec AS (
      SELECT date_trunc('week', e.ts) AS w,
             CASE WHEN date_trunc('week', e.ts) = um.first_week
                  THEN 'new' ELSE 'returning' END AS tenure,
             e.value
      FROM events e JOIN um ON um.user_id = e.user_id)
    SELECT CAST(w AS DATE) AS week, tenure,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS revenue
    FROM rec GROUP BY w, tenure ORDER BY week, tenure
    """,
    doc="Weekly revenue split by user tenure (new-this-week vs "
    "returning) — the growth-quality decomposition that says whether "
    "the topline is acquisition or retention: pairs with "
    "growth_accounting_weekly's count view by weighting each event "
    "with its value. Plan: one user-keyed MIN aggregate (first "
    "activity week) joined back on the user key, then a calendar-"
    "bounded (week, tenure) rollup; the value sum rounds at 2 per "
    "the repo's float-aggregate convention.",
)
def revenue_by_user_tenure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    um = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("first_week")
    )
    rec = ev.join(um, "user_id").select(
        F.date_trunc("week", F.col("ts")).alias("w"),
        F.when(
            F.date_trunc("week", F.col("ts")) == F.col("first_week"), "new"
        )
        .otherwise("returning")
        .alias("tenure"),
        "value",
    )
    return (
        rec.groupBy("w", "tenure")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            dround(F.sum("value"), 2).alias("revenue"),
        )
        .select(
            F.col("w").cast("date").alias("week"),
            "tenure",
            "n_events",
            "revenue",
        )
        .orderBy("week", "tenure")
    )


def _kfold_oracle() -> str:
    from kyuubi_spark.queries.pipeline import _MINHASH_PAIRS_CTE

    return f"""
    WITH RECURSIVE {_MINHASH_PAIRS_CTE},
    edges AS (
      SELECT a_id AS u, b_id AS v FROM dup_pairs
      UNION ALL
      SELECT b_id, a_id FROM dup_pairs),
    reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
    comp AS (
      SELECT u AS doc_id, MIN(v) AS component_id FROM reach GROUP BY u),
    assigned AS (
      SELECT d.doc_id,
             COALESCE(comp.component_id, d.doc_id) AS component_id,
             (COALESCE(comp.component_id, d.doc_id) * 2654435761) % 5
               AS fold
      FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id),
    leaks AS (
      SELECT COUNT(*) AS n FROM dup_pairs p
      JOIN assigned fa ON fa.doc_id = p.a_id
      JOIN assigned fb ON fb.doc_id = p.b_id
      WHERE fa.fold <> fb.fold)
    SELECT CAST(assigned.fold AS INTEGER) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT assigned.component_id) AS BIGINT)
             AS n_components,
           CAST(any_value(leaks.n) AS BIGINT) AS cross_fold_dup_pairs
    FROM assigned, leaks
    GROUP BY assigned.fold ORDER BY fold
    """


@query(
    "groupwise_kfold_split",
    oracle=_kfold_oracle(),
    doc="Group-aware k-fold assignment — the cross-validation split a "
    "deduplicated corpus actually needs: folds are assigned by "
    "hashing the NEAR-DUP COMPONENT id (MinHash-LSH pairs -> "
    "connected components, the verified dedup chain), so two "
    "near-duplicate documents can never land in different folds and "
    "leak train data into eval — the failure train_test_split + "
    "split_leakage_report can only DETECT, this split prevents by "
    "construction (cross_fold_dup_pairs pins it at 0). Singleton "
    "docs are their own component. Plan: the LSH/components chain "
    "(bucketed, iterative keyed joins), one left join back to the "
    "corpus, a Knuth-hash fold id map-side, a 5-row rollup plus a "
    "pair-level leak recount.",
)
def groupwise_kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import dedup as D
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_arrays_df(docs).localCheckpoint()
    cand = D.lsh_candidate_pairs(
        docs, n=3, num_hashes=16, bands=8, shingle_arrays=sh
    )
    pairs = D.jaccard_pairs(
        docs, cand, n=3, tau_num=1, tau_den=4, shingle_arrays=sh
    ).select("a_id", "b_id").localCheckpoint()
    comp = D.connected_components(pairs)
    assigned = (
        docs.select("doc_id")
        .join(F.broadcast(comp), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component_id"), F.col("doc_id")).alias(
                "component_id"
            ),
        )
        .withColumn(
            "fold", (F.col("component_id") * F.lit(2654435761)) % 5
        )
        .localCheckpoint()
    )
    fa = assigned.select(
        F.col("doc_id").alias("a_id"), F.col("fold").alias("fold_a")
    )
    fb = assigned.select(
        F.col("doc_id").alias("b_id"), F.col("fold").alias("fold_b")
    )
    leaks = (
        pairs.join(F.broadcast(fa), "a_id")
        .join(F.broadcast(fb), "b_id")
        .filter(F.col("fold_a") != F.col("fold_b"))
        .agg(F.count("*").alias("n"))
    )
    return (
        assigned.groupBy("fold")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("component_id").cast("bigint").alias(
                "n_components"
            ),
        )
        .crossJoin(F.broadcast(leaks))
        .select(
            F.col("fold").cast("int").alias("fold"),
            "n_docs",
            "n_components",
            F.col("n").cast("bigint").alias("cross_fold_dup_pairs"),
        )
        .orderBy("fold")
    )


@query(
    "revenue_weighted_quartiles",
    oracle="""
    WITH d AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
             l_orderkey, l_linenumber
      FROM lineitem),
    g AS (SELECT SUM(price_cents) AS total FROM d),
    cum AS (
      SELECT price_cents,
             SUM(price_cents) OVER (ORDER BY price_cents, l_orderkey,
                                             l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running
      FROM d),
    qs AS (SELECT unnest([1, 2, 3]) AS q)
    SELECT CAST(qs.q AS INTEGER) AS quartile,
           ROUND(MIN(CASE WHEN 4 * cum.running >= qs.q * g.total
                          THEN cum.price_cents END) / 100.0, 2)
             AS price_at_quartile
    FROM cum, g, qs
    GROUP BY qs.q ORDER BY quartile
    """,
    doc="Revenue-weighted price quartiles: the price points below which "
    "25/50/75% of total REVENUE (not row count) sits — the "
    "value-concentration view a pricing or curation team needs when "
    "cheap rows dominate counts but expensive ones dominate value "
    "(for a corpus: token-weighted length quantiles, same machinery). "
    "The cumulative comes from the DISTRIBUTED exact prefix scan "
    "(operators/ranking.py global_running_sum — no corpus-wide "
    "window; the oracle replays it as a window cumsum), thresholds "
    "are integer-exact (4*running >= q*total in cents), and the "
    "boundary row is a MIN over the qualifying set.",
)
def revenue_weighted_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.operators.ranking import global_running_sum
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("bigint")
        .alias("price_cents"),
        "l_orderkey",
        "l_linenumber",
    )
    cum, total = global_running_sum(
        d,
        [("price_cents", "asc"), ("l_orderkey", "asc"), ("l_linenumber", "asc")],
        "price_cents",
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("q")
    )
    return (
        cum.crossJoin(F.broadcast(qs))
        .groupBy("q")
        .agg(
            dround(
                F.min(
                    F.when(
                        4 * F.col("running") >= F.col("q") * F.lit(total),
                        F.col("price_cents"),
                    )
                )
                / 100.0,
                2,
            ).alias("price_at_quartile")
        )
        .select(
            F.col("q").cast("int").alias("quartile"), "price_at_quartile"
        )
        .orderBy("quartile")
    )


@query(
    "supplier_hhi_by_brand",
    oracle="""
    WITH s AS (
      SELECT p.p_brand AS brand, l.l_suppkey,
             SUM(CAST(round(l.l_quantity) AS BIGINT)) AS q
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    b AS (
      SELECT brand, COUNT(*) AS n_suppliers, SUM(q) AS tq,
             SUM(q * q) AS sqq
      FROM s GROUP BY 1)
    SELECT brand, CAST(n_suppliers AS BIGINT) AS n_suppliers,
           CAST(tq AS BIGINT) AS total_qty,
           ROUND(CAST(sqq AS DOUBLE) / (CAST(tq AS DOUBLE) * tq), 6)
             AS hhi
    FROM b ORDER BY brand
    """,
    doc="Supplier concentration per brand via the Herfindahl-Hirschman "
    "index: HHI = sum of squared supplier quantity shares — the "
    "supply-chain-risk scalar (1/HHI is the effective number of "
    "suppliers; HHI -> 1 means single-sourced). Computed from exact "
    "integer moments (sum q, sum q^2 per brand over the "
    "(brand, supplier)-keyed rollup) with one double division, so "
    "shares are never individually floated. Plan: a broadcast dim "
    "join, two keyed aggregates, |brands| output rows.",
)
def supplier_hhi_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    s = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_quantity"), 0).cast("bigint")).alias("q")
        )
    )
    b = s.groupBy("brand").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("q").alias("tq"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
    )
    return b.select(
        "brand",
        F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
        F.col("tq").cast("bigint").alias("total_qty"),
        dround(
            F.col("sqq").cast("double")
            / (F.col("tq").cast("double") * F.col("tq")),
            6,
        ).alias("hhi"),
    ).orderBy("brand")


@query(
    "skyline_price_size",
    oracle="""
    WITH g AS (
      SELECT p_retailprice AS price, MAX(p_size) AS gmax
      FROM part GROUP BY 1),
    m AS (
      SELECT price, gmax,
             MAX(gmax) OVER (ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM g),
    fp AS (
      SELECT price, gmax FROM m
      WHERE prev_max IS NULL OR gmax > prev_max)
    SELECT p.p_partkey, ROUND(p.p_retailprice, 2) AS price,
           CAST(p.p_size AS INTEGER) AS size
    FROM part p JOIN fp ON fp.price = p.p_retailprice
                       AND fp.gmax = p.p_size
    ORDER BY price, p_partkey
    """,
    doc="Skyline (Pareto frontier) over parts: the set not dominated on "
    "(cheaper price, larger size) — the classic multi-criteria "
    "operator behind 'best tradeoff' queries (cheapest-for-its-size "
    "catalog slice). A part survives iff its size equals its price "
    "group's max AND strictly exceeds the running max over all "
    "cheaper prices (ties on both axes stay — neither dominates). "
    "The strictly-preceding running max comes from the DISTRIBUTED "
    "prefix-scan primitive (operators/ranking.py global_running_max, "
    "exclusive form — no corpus-wide window; the oracle replays it "
    "as a 1-PRECEDING window max). Expected frontier size is "
    "O(log n) under independence, so output stays tiny at any scale.",
)
def skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.operators.ranking import global_running_max
    from kyuubi_spark.session import load_table

    part = load_table(spark, sf_dir, "part")
    g = part.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("gmax")
    )
    m = global_running_max(
        g, [("price", "asc")], "gmax", max_col="prev_max", exclusive=True
    )
    fp = m.filter(
        F.col("prev_max").isNull() | (F.col("gmax") > F.col("prev_max"))
    ).select("price", "gmax")
    return (
        part.join(
            F.broadcast(fp),
            (part.p_retailprice == fp.price) & (part.p_size == fp.gmax),
        )
        .select(
            "p_partkey",
            dround(F.col("p_retailprice"), 2).alias("price"),
            F.col("p_size").cast("int").alias("size"),
        )
        .orderBy("price", "p_partkey")
    )


@query(
    "signup_to_purchase_lag",
    oracle="""
    WITH su AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    fp AS (
      SELECT su.user_id, su.signup_ts, MIN(e.ts) AS purchase_ts
      FROM su JOIN events e
        ON e.user_id = su.user_id
       AND e.event_type = 'purchase' AND e.ts >= su.signup_ts
      GROUP BY 1, 2),
    cohort AS (
      SELECT su.user_id,
             CAST(date_trunc('week', su.signup_ts) AS DATE) AS week,
             CAST((epoch_us(fp.purchase_ts) - epoch_us(su.signup_ts))
                  // 3600000000 AS BIGINT) AS lag_hours
      FROM su LEFT JOIN fp ON fp.user_id = su.user_id),
    ranked AS (
      SELECT week, lag_hours, user_id,
             ROW_NUMBER() OVER (PARTITION BY week
                                ORDER BY lag_hours, user_id) AS r,
             COUNT(lag_hours) OVER (PARTITION BY week) AS n_conv
      FROM cohort WHERE lag_hours IS NOT NULL),
    wk AS (
      SELECT week, any_value(n_conv) AS n_conv,
             MAX(CASE WHEN r = CAST(ceil(0.5 * n_conv) AS BIGINT)
                      THEN lag_hours END) AS p50
      FROM ranked GROUP BY week),
    base AS (
      SELECT week, COUNT(*) AS n_signups FROM cohort GROUP BY week)
    SELECT base.week,
           CAST(base.n_signups AS BIGINT) AS n_signups,
           CAST(wk.n_conv AS BIGINT) AS n_converted,
           ROUND(CAST(wk.n_conv AS DOUBLE) / base.n_signups, 6)
             AS conversion,
           CAST(wk.p50 AS BIGINT) AS p50_lag_hours
    FROM base LEFT JOIN wk ON wk.week = base.week
    ORDER BY base.week
    """,
    doc="Signup-to-first-purchase lag by signup-week cohort: conversion "
    "rate and the EXACT median activation lag in hours (rank-selected "
    "order statistic, never an interpolated percentile) — the "
    "activation funnel metric a growth team tracks cohort over "
    "cohort. Lags are exact integer microsecond differences floored "
    "to hours. Plan: two user-keyed MIN aggregates (signup, first "
    "purchase after signup), per-cohort (keyed) rank windows for the "
    "median, a calendar-bounded weekly rollup.",
)
def signup_to_purchase_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    su = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    fp = (
        su.join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pts") >= F.col("signup_ts")),
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("pts").alias("purchase_ts"))
    )
    cohort = su.join(
        fp.select("user_id", "purchase_ts"), "user_id", "left"
    ).select(
        "user_id",
        F.date_trunc("week", F.col("signup_ts"))
        .cast("date")
        .alias("week"),
        (
            (
                F.unix_micros(F.col("purchase_ts").cast("timestamp"))
                - F.unix_micros(F.col("signup_ts").cast("timestamp"))
            )
            / F.lit(3600000000)
        )
        .cast("bigint")
        .alias("lag_hours"),
    )
    conv = cohort.filter(F.col("lag_hours").isNotNull())
    w = Window.partitionBy("week")
    ranked = conv.select(
        "week",
        "lag_hours",
        F.row_number().over(w.orderBy("lag_hours", "user_id")).alias("r"),
        F.count("*").over(w).alias("n_conv"),
    )
    p50 = ranked.groupBy("week").agg(
        F.any_value("n_conv").alias("n_conv"),
        F.max(
            F.when(
                F.col("r") == F.ceil(0.5 * F.col("n_conv")).cast("bigint"),
                F.col("lag_hours"),
            )
        ).alias("p50"),
    )
    base = cohort.groupBy("week").agg(F.count("*").alias("n_signups"))
    return (
        base.join(F.broadcast(p50), "week", "left")
        .select(
            "week",
            F.col("n_signups").cast("bigint").alias("n_signups"),
            F.col("n_conv").cast("bigint").alias("n_converted"),
            dround(
                F.col("n_conv").cast("double") / F.col("n_signups"), 6
            ).alias("conversion"),
            F.col("p50").cast("bigint").alias("p50_lag_hours"),
        )
        .orderBy("week")
    )


@query(
    "concentration_trend_yearly",
    oracle="""
    WITH cy AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr, o_custkey,
             SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2),
    ranked AS (
      SELECT yr, cents,
             ROW_NUMBER() OVER (PARTITION BY yr
                                ORDER BY cents DESC, o_custkey) AS r,
             COUNT(*) OVER (PARTITION BY yr) AS n
      FROM cy)
    SELECT CAST(yr AS INTEGER) AS yr,
           CAST(any_value(n) AS BIGINT) AS n_cust,
           ROUND(SUM(cents) / 100.0, 2) AS revenue,
           ROUND(CAST(SUM(CASE WHEN 10 * r <= n THEN cents ELSE 0 END)
                      AS DOUBLE) / SUM(cents), 6) AS top_decile_share
    FROM ranked GROUP BY yr ORDER BY yr
    """,
    doc="Revenue-concentration trend: the share of each year's revenue "
    "held by the top 10% of that year's customers — is the business "
    "getting MORE dependent on whales over time? (The longitudinal "
    "view of spend_gini_lorenz's single-snapshot Gini.) Top-decile "
    "membership is the integer-exact test 10*rank <= n on per-year "
    "rank windows PARTITIONED BY year (keyed — each year's ranking "
    "is independent, so no global window; at extreme per-year "
    "cardinality swap in the distributed ranker per year). Revenue "
    "in exact cents.",
)
def concentration_trend_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    cy = orders.groupBy(
        F.year("o_orderdate").alias("yr"), "o_custkey"
    ).agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        ).alias("cents")
    )
    w = Window.partitionBy("yr")
    ranked = cy.select(
        "yr",
        "cents",
        F.row_number()
        .over(w.orderBy(F.col("cents").desc(), "o_custkey"))
        .alias("r"),
        F.count("*").over(w).alias("n"),
    )
    return (
        ranked.groupBy("yr")
        .agg(
            F.any_value("n").cast("bigint").alias("n_cust"),
            dround(F.sum("cents") / 100.0, 2).alias("revenue"),
            dround(
                F.sum(
                    F.when(10 * F.col("r") <= F.col("n"), F.col("cents"))
                    .otherwise(0)
                ).cast("double")
                / F.sum("cents"),
                6,
            ).alias("top_decile_share"),
        )
        .select(
            F.col("yr").cast("int").alias("yr"),
            "n_cust",
            "revenue",
            "top_decile_share",
        )
        .orderBy("yr")
    )


@query(
    "brand_mix_drift_yearly",
    oracle="""
    WITH r AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS yr,
             p.p_brand AS brand, COUNT(*) AS n
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    yt AS (SELECT yr, SUM(n) AS n_yr FROM r GROUP BY 1),
    bt AS (SELECT brand, SUM(n) AS n_brand FROM r GROUP BY 1),
    g AS (SELECT SUM(n) AS total FROM r),
    chi AS (
      SELECT r.yr,
             SUM(pow(r.n - CAST(yt.n_yr AS DOUBLE) * bt.n_brand / g.total, 2)
                 / (CAST(yt.n_yr AS DOUBLE) * bt.n_brand / g.total))
               AS chi2
      FROM r JOIN yt USING (yr) JOIN bt USING (brand), g
      GROUP BY r.yr)
    SELECT CAST(chi.yr AS INTEGER) AS yr,
           CAST(yt.n_yr AS BIGINT) AS n_lines,
           ROUND(chi.chi2, 4) AS chi2_vs_pooled
    FROM chi JOIN yt ON yt.yr = chi.yr
    ORDER BY yr
    """,
    doc="Brand-mix drift by year: each year's brand distribution tested "
    "against the pooled expectation with a per-year chi-square — the "
    "composition-shift monitor (for a corpus: source-mix drift per "
    "snapshot, same machinery as snapshot_psi_drift but with the "
    "classical statistic). Expected counts are exact rationals "
    "n_yr*n_brand/total from integer marginals; each year's statistic "
    "sums ~25 brand terms of fixed expression shape and rounds at 4 "
    "(repo float-aggregate convention; the ~25-term sum is over the "
    "bounded brand vocabulary, not corpus rows). Plan: two broadcast "
    "dim joins, one (year, brand)-keyed count, marginal broadcasts — "
    "the corpus is touched once.",
)
def brand_mix_drift_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    r = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.col("p_brand").alias("brand"),
        )
        .agg(F.count("*").alias("n"))
    )
    yt = r.groupBy("yr").agg(F.sum("n").alias("n_yr"))
    bt = r.groupBy("brand").agg(F.sum("n").alias("n_brand"))
    g = r.agg(F.sum("n").alias("total"))
    e = F.col("n_yr").cast("double") * F.col("n_brand") / F.col("total")
    chi = (
        r.join(F.broadcast(yt), "yr")
        .join(F.broadcast(bt), "brand")
        .crossJoin(F.broadcast(g))
        .groupBy("yr")
        .agg(
            F.sum(F.pow(F.col("n") - e, F.lit(2.0)) / e).alias("chi2"),
            F.any_value("n_yr").alias("n_yr"),
        )
    )
    return chi.select(
        F.col("yr").cast("int").alias("yr"),
        F.col("n_yr").cast("bigint").alias("n_lines"),
        dround(F.col("chi2"), 4).alias("chi2_vs_pooled"),
    ).orderBy("yr")


@query(
    "interaction_matrix_stats",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    dims AS (
      SELECT COUNT(DISTINCT user_id) AS n_users,
             COUNT(DISTINCT event_type) AS n_types,
             COUNT(*) AS nnz
      FROM ut),
    tc AS (SELECT event_type, COUNT(*) AS c FROM ut GROUP BY 1),
    ent AS (
      SELECT SUM(CAST(round(1000000.0
                 * (CAST(c AS DOUBLE) / dims.nnz)
                 * ln(CAST(dims.nnz AS DOUBLE) / c)) AS BIGINT))
               AS h_micro
      FROM tc, dims)
    SELECT CAST(dims.n_users AS BIGINT) AS n_users,
           CAST(dims.n_types AS BIGINT) AS n_types,
           CAST(dims.nnz AS BIGINT) AS nnz,
           ROUND(CAST(dims.nnz AS DOUBLE)
                 / (dims.n_users * dims.n_types), 6) AS fill_rate,
           ROUND(ent.h_micro / 1000000.0, 6) AS type_entropy_nats
    FROM dims, ent
    """,
    doc="Interaction-matrix profile — the shape report a recommender "
    "or embedding-training job reads before touching the user x "
    "event-type matrix: dimensions, nonzeros, fill rate, and the "
    "column-marginal Shannon entropy (how evenly interaction mass "
    "spreads across types; low entropy means one interaction type "
    "dominates the gradient signal). Each entropy term quantizes to "
    "an integer micro-nat before summing over the bounded type "
    "vocabulary, so the sum is exact integer arithmetic. Plan: one "
    "distinct projection, one 1-row dims aggregate, a |types|-row "
    "marginal — single corpus scan.",
)
def interaction_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    dims = ut.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        F.count("*").alias("nnz"),
    )
    tc = ut.groupBy("event_type").agg(F.count("*").alias("c"))
    ent = tc.crossJoin(F.broadcast(dims)).agg(
        F.sum(
            F.round(
                1000000.0
                * (F.col("c").cast("double") / F.col("nnz"))
                * F.log(F.col("nnz").cast("double") / F.col("c")),
                0,
            ).cast("bigint")
        ).alias("h_micro")
    )
    return dims.crossJoin(F.broadcast(ent)).select(
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.col("nnz").cast("bigint").alias("nnz"),
        dround(
            F.col("nnz").cast("double")
            / (F.col("n_users") * F.col("n_types")),
            6,
        ).alias("fill_rate"),
        dround(F.col("h_micro") / 1000000.0, 6).alias("type_entropy_nats"),
    )


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH fw AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort FROM events
      GROUP BY 1),
    sizes AS (SELECT cohort, COUNT(*) AS n_users FROM fw GROUP BY 1),
    rev AS (
      SELECT fw.cohort,
             CAST(date_diff('week', fw.cohort, date_trunc('week', e.ts))
                  AS BIGINT) AS age_weeks,
             ROUND(SUM(e.value), 2) AS revenue
      FROM events e JOIN fw ON fw.user_id = e.user_id
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort, age_weeks, revenue,
             ROUND(SUM(revenue) OVER (PARTITION BY cohort ORDER BY age_weeks
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS cum_revenue
      FROM rev)
    SELECT CAST(cum.cohort AS DATE) AS cohort,
           CAST(cum.age_weeks AS INTEGER) AS age_weeks,
           CAST(sizes.n_users AS BIGINT) AS n_users,
           cum.revenue,
           ROUND(cum.cum_revenue / sizes.n_users, 4) AS cum_ltv_per_user
    FROM cum JOIN sizes ON sizes.cohort = cum.cohort
    ORDER BY cohort, age_weeks
    """,
    doc="Cohort LTV curve: cumulative revenue per user by signup-week "
    "cohort and week age — THE payback chart every subscription/"
    "commerce business plots (do newer cohorts monetize faster?). "
    "Per-(cohort, age) revenue rounds at 2 before the cumulative "
    "(repo float convention — the cumulative then adds already-"
    "rounded values in deterministic frame order), and the cumulative "
    "window is PARTITIONED BY cohort over <=|weeks| rows per "
    "partition — keyed and calendar-bounded. Plan: one user-keyed "
    "MIN (cohort assignment) joined back on the user key, a "
    "(cohort, age) rollup, per-cohort cumulative.",
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    fw = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort")
    )
    sizes = fw.groupBy("cohort").agg(F.count("*").alias("n_users"))
    rev = (
        ev.join(fw, "user_id")
        .groupBy(
            "cohort",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("age_weeks"),
        )
        .agg(dround(F.sum("value"), 2).alias("revenue"))
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = rev.withColumn("cum_revenue", dround(F.sum("revenue").over(w), 2))
    return (
        cum.join(F.broadcast(sizes), "cohort")
        .select(
            F.col("cohort").cast("date").alias("cohort"),
            F.col("age_weeks").cast("int").alias("age_weeks"),
            F.col("n_users").cast("bigint").alias("n_users"),
            "revenue",
            dround(F.col("cum_revenue") / F.col("n_users"), 4).alias(
                "cum_ltv_per_user"
            ),
        )
        .orderBy("cohort", "age_weeks")
    )


@query(
    "return_rate_wilson",
    oracle="""
    WITH r AS (
      SELECT p.p_brand AS brand,
             COUNT(*) AS n,
             SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS k
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1),
    s AS (
      SELECT brand, n, k, CAST(k AS DOUBLE) / n AS p,
             1.959963984540054 AS z
      FROM r)
    SELECT brand, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_returned,
           ROUND(p, 6) AS return_rate,
           ROUND((p + z * z / (2 * n)
                  - z * sqrt((p * (1 - p) + z * z / (4 * n)) / n))
                 / (1 + z * z / n), 6) AS wilson_lower
    FROM s
    ORDER BY (p + z * z / (2 * n)
              - z * sqrt((p * (1 - p) + z * z / (4 * n)) / n))
             / (1 + z * z / n) DESC, brand
    LIMIT 10
    """,
    doc="Return-rate ranking by Wilson 95% lower bound — the correct "
    "way to rank rates when sample sizes differ (a brand with 3/3 "
    "returns must NOT outrank one with 90/100; the naive rate sort "
    "gets this wrong, the Wilson interval's lower bound fixes it — "
    "the canonical 'how not to sort by average rating' construction). "
    "Inputs are exact integer (returns, totals) per brand; the bound "
    "is one fixed double expression evaluated identically in both "
    "engines, used for both the ordering and the reported value. "
    "Plan: a broadcast dim join + one brand-keyed conditional "
    "aggregate + TakeOrderedAndProject top-10.",
)
def return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    r = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("k"),
        )
    )
    p = F.col("k").cast("double") / F.col("n")
    z = F.lit(1.959963984540054)
    wilson = (
        p
        + z * z / (2 * F.col("n"))
        - z * F.sqrt((p * (1 - p) + z * z / (4 * F.col("n"))) / F.col("n"))
    ) / (1 + z * z / F.col("n"))
    return (
        r.withColumn("_w", wilson)
        .orderBy(F.col("_w").desc(), "brand")
        .limit(10)
        .select(
            "brand",
            F.col("n").cast("bigint").alias("n"),
            F.col("k").cast("bigint").alias("n_returned"),
            dround(p, 6).alias("return_rate"),
            dround(F.col("_w"), 6).alias("wilson_lower"),
        )
    )
