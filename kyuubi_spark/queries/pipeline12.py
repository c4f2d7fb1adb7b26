"""Pipeline batch 12 — experimentation, lakehouse-maintenance and
point-in-time analytics (round 11).

CUPED variance-reduced A/B readout (the industry-standard pre-period
covariate adjustment), snapshot CDC diffing (the append-only lakehouse
audit between two as-of states), and the point-in-time join against an
SCD2 dimension (the feature-store correctness primitive: every fact row
joined to the dimension version valid AT ITS OWN timestamp, never a
leaked future attribute).

Determinism: monetary inputs collapse to exact INTEGER dollars
(cents-roundtrip floor) and every covariance/variance comes from
integer power sums; division happens once at the end under dround —
the conventions that keep all cross-engine hashes exact (see
queries/pipeline.py).

Reference scope: extends the engine the way SURVEY.md §2's
beyond-operator pipeline set sanctions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query

# exact integer dollars from a double price: round to cents, floor the
# cent-scaled value back to whole dollars — identical in both engines
_DOLLARS = "CAST(floor(round(o_totalprice * 100, 0) / 100) AS BIGINT)"


def _dollars(col: str):
    return F.floor(F.round(F.col(col) * 100, 0) / 100).cast("bigint")


@query(
    "cuped_adjusted_ab",
    oracle=f"""
    WITH per AS (
      SELECT o_custkey,
             CAST(o_custkey % 2 AS INTEGER) AS arm,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                      THEN {_DOLLARS} ELSE 0 END) AS pre,
             SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                      THEN {_DOLLARS} ELSE 0 END) AS post
      FROM orders GROUP BY 1, 2),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pre) AS BIGINT) AS sx,
             CAST(SUM(post) AS BIGINT) AS sy,
             CAST(SUM(pre * pre) AS BIGINT) AS sxx,
             CAST(SUM(pre * post) AS BIGINT) AS sxy,
             CAST(SUM(post * post) AS BIGINT) AS syy
      FROM per),
    th AS (
      SELECT n, sx, sy,
             (CAST(sxy AS DOUBLE) / n - CAST(sx AS DOUBLE) / n
                * CAST(sy AS DOUBLE) / n)
             / (CAST(sxx AS DOUBLE) / n
                - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
               AS theta,
             POWER(CAST(sxy AS DOUBLE) / n - CAST(sx AS DOUBLE) / n
                   * CAST(sy AS DOUBLE) / n, 2)
             / ((CAST(sxx AS DOUBLE) / n
                 - POWER(CAST(sx AS DOUBLE) / n, 2))
                * (CAST(syy AS DOUBLE) / n
                   - POWER(CAST(sy AS DOUBLE) / n, 2))) AS rho2
      FROM g),
    a AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_units,
             CAST(SUM(pre) AS BIGINT) AS sxa,
             CAST(SUM(post) AS BIGINT) AS sya
      FROM per GROUP BY 1)
    SELECT a.arm, a.n_units,
           ROUND(CAST(a.sya AS DOUBLE) / a.n_units, 6) AS mean_post,
           ROUND(CAST(a.sya AS DOUBLE) / a.n_units
                 - th.theta * (CAST(a.sxa AS DOUBLE) / a.n_units
                               - CAST(th.sx AS DOUBLE) / th.n), 6)
             AS mean_cuped,
           ROUND(th.theta, 6) AS theta,
           ROUND(th.rho2, 6) AS var_reduction
    FROM a, th
    ORDER BY a.arm
    """,
    doc="CUPED variance-reduced A/B readout (Deng et al. 2013, the "
    "pre-experiment covariate adjustment every large experimentation "
    "platform runs): units are customers, the deterministic hash arm is "
    "custkey % 2, the metric is post-1998 spend and the covariate "
    "pre-1998 spend (exact integer dollars). theta = cov(X,Y)/var(X) "
    "comes from INTEGER power sums (one keyed aggregate + one global "
    "aggregate), and each arm's adjusted mean is computed from its own "
    "exact sums — the only float division happens once per output cell. "
    "var_reduction = rho-squared is the variance CUPED removes. Scale: "
    "one shuffle by custkey, then two scalar aggregates broadcast back; "
    "no window, no join against the fact table.",
)
def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    per = orders.groupBy("o_custkey").agg(
        F.sum(
            F.when(F.col("o_orderdate") < cut, _dollars("o_totalprice"))
            .otherwise(F.lit(0))
        ).alias("pre"),
        F.sum(
            F.when(F.col("o_orderdate") >= cut, _dollars("o_totalprice"))
            .otherwise(F.lit(0))
        ).alias("post"),
    ).withColumn("arm", (F.col("o_custkey") % 2).cast("int"))
    g = per.agg(
        F.count("*").alias("n"),
        F.sum("pre").alias("sx"),
        F.sum("post").alias("sy"),
        F.sum(F.col("pre") * F.col("pre")).alias("sxx"),
        F.sum(F.col("pre") * F.col("post")).alias("sxy"),
        F.sum(F.col("post") * F.col("post")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov = F.col("sxy") / nd - (F.col("sx") / nd) * (F.col("sy") / nd)
    varx = F.col("sxx") / nd - F.pow(F.col("sx") / nd, F.lit(2.0))
    vary = F.col("syy") / nd - F.pow(F.col("sy") / nd, F.lit(2.0))
    th = g.select(
        "n", "sx",
        (cov / varx).alias("theta"),
        (F.pow(cov, F.lit(2.0)) / (varx * vary)).alias("rho2"),
    )
    arms = per.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_units"),
        F.sum("pre").alias("sxa"),
        F.sum("post").alias("sya"),
    )
    out = arms.crossJoin(F.broadcast(th))
    na = F.col("n_units").cast("double")
    return out.select(
        "arm",
        "n_units",
        dround(F.col("sya") / na, 6).alias("mean_post"),
        dround(
            F.col("sya") / na
            - F.col("theta")
            * (F.col("sxa") / na - F.col("sx") / F.col("n").cast("double")),
            6,
        ).alias("mean_cuped"),
        dround(F.col("theta"), 6).alias("theta"),
        dround(F.col("rho2"), 6).alias("var_reduction"),
    ).orderBy("arm")


@query(
    "snapshot_cdc_diff",
    oracle=f"""
    WITH st AS (
      SELECT o_custkey,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '2000-01-01'
                      THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '2000-01-01'
                      THEN {_DOLLARS} ELSE 0 END) AS sum_a,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '2001-01-01'
                      THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN o_orderdate < TIMESTAMP '2001-01-01'
                      THEN {_DOLLARS} ELSE 0 END) AS sum_b
      FROM orders GROUP BY 1),
    cls AS (
      SELECT CASE WHEN n_a = 0 AND n_b > 0 THEN 'added'
                  WHEN n_a > 0 AND n_b = n_a THEN 'unchanged'
                  ELSE 'changed' END AS change_class,
             n_b - n_a AS d_orders, sum_b - sum_a AS d_dollars
      FROM st WHERE n_b > 0)
    SELECT change_class,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(d_orders) AS BIGINT) AS delta_orders,
           CAST(SUM(d_dollars) AS BIGINT) AS delta_dollars
    FROM cls GROUP BY 1 ORDER BY change_class
    """,
    doc="Snapshot CDC diff: the change-data-capture audit between two "
    "as-of states of a keyed aggregate (customer order book at "
    "2000-01-01 vs 2001-01-01) — the report a lakehouse table-"
    "maintenance job emits after every incremental merge (how many "
    "keys appeared, how many mutated, how much volume moved). Computed "
    "in ONE pass with conditional aggregation — NOT a self-join of two "
    "snapshot scans, so at 100 TB it costs one shuffle of the fact "
    "table instead of two scans plus a key-key join; both snapshot "
    "states fall out of the same groupBy.",
)
def snapshot_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    c1 = F.lit("2000-01-01").cast("timestamp")
    c2 = F.lit("2001-01-01").cast("timestamp")
    d = _dollars("o_totalprice")
    st = orders.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderdate") < c1, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("o_orderdate") < c1, d).otherwise(0)).alias(
            "sum_a"
        ),
        F.sum(F.when(F.col("o_orderdate") < c2, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("o_orderdate") < c2, d).otherwise(0)).alias(
            "sum_b"
        ),
    )
    cls = st.filter(F.col("n_b") > 0).select(
        F.when((F.col("n_a") == 0) & (F.col("n_b") > 0), "added")
        .when(
            (F.col("n_a") > 0) & (F.col("n_b") == F.col("n_a")), "unchanged"
        )
        .otherwise("changed")
        .alias("change_class"),
        (F.col("n_b") - F.col("n_a")).alias("d_orders"),
        (F.col("sum_b") - F.col("sum_a")).alias("d_dollars"),
    )
    return (
        cls.groupBy("change_class")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("d_orders").cast("bigint").alias("delta_orders"),
            F.sum("d_dollars").cast("bigint").alias("delta_dollars"),
        )
        .orderBy("change_class")
    )


@query(
    "scd2_point_in_time_join",
    oracle="""
    WITH chg AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
             CASE WHEN LAG(o_orderpriority) OVER w IS DISTINCT FROM
                       o_orderpriority THEN 1 ELSE 0 END AS is_new
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)),
    grp AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS gid
      FROM chg),
    dim AS (
      SELECT o_custkey AS custkey, gid,
             MIN(o_orderpriority) AS priority,
             MIN(o_orderdate) AS valid_from
      FROM grp GROUP BY 1, 2),
    scd AS (
      SELECT custkey, priority, valid_from,
             LEAD(valid_from) OVER (PARTITION BY custkey
               ORDER BY valid_from, gid) AS valid_to
      FROM dim),
    fact AS (
      SELECT l.l_orderkey, l.l_quantity, l.l_shipdate,
             o.o_custkey, o.o_orderpriority
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    pit AS (
      SELECT f.*, s.priority AS dim_priority
      FROM fact f JOIN scd s
        ON s.custkey = f.o_custkey
       AND f.l_shipdate >= s.valid_from
       AND (s.valid_to IS NULL OR f.l_shipdate < s.valid_to))
    SELECT dim_priority,
           CAST(COUNT(*) AS BIGINT) AS n_shipments,
           CAST(SUM(CASE WHEN dim_priority = o_orderpriority
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_same_as_order,
           CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT)
             AS sum_qty
    FROM pit GROUP BY 1 ORDER BY dim_priority
    """,
    doc="Point-in-time join against an SCD2 dimension (the feature-"
    "store/backtest correctness primitive): each shipment joins to the "
    "customer-priority VERSION valid at its OWN ship date — versions "
    "built with the scd2_dimension_build recipe (priority islands -> "
    "[valid_from, valid_to) intervals). Because ship dates trail order "
    "dates, some shipments land in a LATER version than the one that "
    "created their order; n_same_as_order measures exactly that leak "
    "an as-of-now join would cause. Scale: dim windows and the PIT "
    "join both key on custkey (one shuffle each side, per-key version "
    "lists are tiny so the interval residual is a short per-key scan); "
    "the fact->orders hookup is an orderkey equi-join.",
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = orders.select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    ).withColumn(
        "is_new",
        F.when(
            ~F.lag("o_orderpriority").over(w).eqNullSafe(
                F.col("o_orderpriority")
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    grp = chg.withColumn(
        "gid",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    dim = grp.groupBy(F.col("o_custkey").alias("custkey"), "gid").agg(
        F.min("o_orderpriority").alias("priority"),
        F.min("o_orderdate").alias("valid_from"),
    )
    w2 = Window.partitionBy("custkey").orderBy("valid_from", "gid")
    scd = dim.select(
        "custkey",
        "priority",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )
    fact = li.select("l_orderkey", "l_quantity", "l_shipdate").join(
        orders.select("o_orderkey", "o_custkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    pit = fact.join(
        scd,
        (F.col("custkey") == F.col("o_custkey"))
        & (F.col("l_shipdate") >= F.col("valid_from"))
        & (
            F.col("valid_to").isNull()
            | (F.col("l_shipdate") < F.col("valid_to"))
        ),
    )
    return (
        pit.groupBy(F.col("priority").alias("dim_priority"))
        .agg(
            F.count("*").cast("bigint").alias("n_shipments"),
            F.sum(
                F.when(
                    F.col("priority") == F.col("o_orderpriority"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_same_as_order"),
            F.sum(F.round(F.col("l_quantity"), 0).cast("bigint"))
            .cast("bigint")
            .alias("sum_qty"),
        )
        .orderBy("dim_priority")
    )


def _peel_survivor_join(edges: DataFrame, keep: DataFrame, hint) -> DataFrame:
    """One k-core peel round's edge filter: both endpoints must survive.
    ``hint`` is ``F.broadcast`` under the size gate (the edge relation is
    then never shuffled — two BroadcastHashJoin left-semis, zero
    Exchange) or identity past it.  Module-level so the plan-pinning
    test (tests/test_plan_quality.py) asserts the no-shuffle shape on
    the exact production join."""
    return (
        edges.join(hint(keep.withColumnRenamed("n", "u")), "u", "left_semi")
        .join(hint(keep.withColumnRenamed("n", "v")), "v", "left_semi")
        .select("u", "v")
    )


@query(
    "kcore_peel_rounds",
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey),
    e0 AS (SELECT DISTINCT u, v FROM pairs),
    d1 AS (SELECT n, COUNT(*) AS d FROM (
             SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0)
           GROUP BY 1),
    k1 AS (SELECT n FROM d1 WHERE d >= 3),
    e1 AS (SELECT e0.u, e0.v FROM e0
           JOIN k1 a ON a.n = e0.u JOIN k1 b ON b.n = e0.v),
    d2 AS (SELECT n, COUNT(*) AS d FROM (
             SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1)
           GROUP BY 1),
    k2 AS (SELECT n FROM d2 WHERE d >= 3),
    e2 AS (SELECT e1.u, e1.v FROM e1
           JOIN k2 a ON a.n = e1.u JOIN k2 b ON b.n = e1.v),
    d3 AS (SELECT n, COUNT(*) AS d FROM (
             SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2)
           GROUP BY 1),
    k3 AS (SELECT n FROM d3 WHERE d >= 3),
    e3 AS (SELECT e2.u, e2.v FROM e2
           JOIN k3 a ON a.n = e2.u JOIN k3 b ON b.n = e2.v)
    SELECT * FROM (
      SELECT 1 AS round, CAST((SELECT COUNT(*) FROM k1) AS BIGINT) AS n_nodes,
             CAST((SELECT COUNT(*) FROM e1) AS BIGINT) AS n_edges
      UNION ALL
      SELECT 2, CAST((SELECT COUNT(*) FROM k2) AS BIGINT),
             CAST((SELECT COUNT(*) FROM e2) AS BIGINT)
      UNION ALL
      SELECT 3, CAST((SELECT COUNT(*) FROM k3) AS BIGINT),
             CAST((SELECT COUNT(*) FROM e3) AS BIGINT)
    ) ORDER BY round
    """,
    doc="k-core decomposition by iterative peeling (k=3, three fixed "
    "rounds) over the co-purchase graph: each round drops nodes of "
    "degree < k and the edges touching them, converging toward the "
    "3-core — the graph-ML preprocessing step that strips low-degree "
    "fringe before community/embedding work. Distributed shape per "
    "round: one keyed degree aggregate + two semi-joins of the edge "
    "list against the surviving node set (broadcast under a carried "
    "|part| bound, shuffled past it), with per-round persists pinning "
    "each round's edges/survivors to one computation — the same "
    "iterate-without-driver-state discipline as bfs_reachability_hops. "
    "The edge list never gathers to the driver; round metrics are "
    "1-row aggregates.",
)
def kcore_peel_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.caching import persisted
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    edges = persisted(
        a.join(b, "k").filter(F.col("u") < F.col("v")).select("u", "v")
        .distinct()
    )
    from kyuubi_spark.operators.broadcast import broadcast_budget

    budget = broadcast_budget(spark)
    # Broadcast gate for the per-round survivor sets, decided ONCE from a
    # carried bound instead of a per-round blocking count (r14, VERDICT
    # r13 Next #3): node ids are l_partkey values, so every round's keep
    # set is bounded by |part| — one cheap table count gates all three
    # rounds at ~16 B/row.  Within budget both per-round semi-joins are
    # broadcast joins and the edge relation is never shuffled during
    # peeling; past it (real scale) the gate disappears and plain
    # shuffled semi-joins carry the round (guide §3.1/§2.4).
    bcast = 0 <= load_table(spark, sf_dir, "part").count() * 16 <= budget
    hint = F.broadcast if bcast else (lambda d: d)
    rows = []
    for rnd in (1, 2, 3):
        # single-pass degree: explode(array(u,v)) scans the cached edge
        # relation ONCE where the old unionAll form scanned it twice
        deg = (
            edges.select(F.explode(F.array("u", "v")).alias("n"))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
        )
        # lazily persisted: the round's ONE heavy action below (the new
        # edge count) materializes it through the broadcast build, so the
        # r13 per-round localCheckpoint job + separate count job collapse
        keep = persisted(deg.filter(F.col("d") >= 3).select("n"))
        if not bcast:
            # shuffled path: materialize keep before the two semi-joins
            # race to compute the degree aggregate independently
            n_nodes = keep.count()
        edges = persisted(_peel_survivor_join(edges, keep, hint))
        n_edges = edges.count()
        if bcast:
            # the broadcast build above already materialized keep's
            # cache; this count is a cached in-memory scan
            n_nodes = keep.count()
        rows.append((rnd, n_nodes, n_edges))
    return spark.createDataFrame(
        rows, "round INT, n_nodes BIGINT, n_edges BIGINT"
    ).orderBy("round")


@query(
    "ohlc_daily_value",
    oracle="""
    WITH k AS (
      SELECT *, epoch_us(ts)::HUGEINT * 9223372036854775808::HUGEINT
                + event_id AS ord
      FROM events)
    SELECT CAST(ts AS DATE) AS day,
           ROUND(arg_min(value, ord), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(arg_max(value, ord), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume
    FROM k
    GROUP BY 1 ORDER BY day
    """,
    doc="OHLC candlestick rollup of the event value stream: per day, the "
    "first (open) and last (close) value under the total (ts, event_id) "
    "order plus high/low/volume — the time-series downsampling shape "
    "every metrics store serves. Spark side uses min_by/max_by over a "
    "(ts, event_id) ordering STRUCT — no integer packing, so no "
    "overflow at any event span or event_id range (the DuckDB oracle "
    "packs the same order into a HUGEINT with a 2^63 multiplier, exact "
    "for every int64 event_id) — so the whole query is ONE "
    "map-side-combinable keyed aggregate: no window, no sort of the "
    "raw stream, one shuffle of 30 daily partials per executor.",
)
def ohlc_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    # struct total order (ts micros, event_id tiebreak): lexicographic
    # struct comparison matches the oracle's HUGEINT-packed order
    key = F.struct(F.col("ts").cast("timestamp"), F.col("event_id"))
    return (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            dround(F.min_by("value", key), 6).alias("open"),
            dround(F.max("value"), 6).alias("high"),
            dround(F.min("value"), 6).alias("low"),
            dround(F.max_by("value", key), 6).alias("close"),
            F.count("*").cast("bigint").alias("volume"),
        )
        .orderBy("day")
    )


@query(
    "embedding_pca_power_iteration",
    oracle="""
    WITH e AS (
      SELECT vec_id, dim, CAST(embedding[dim] AS DOUBLE) AS x
      FROM embeddings, unnest(generate_series(1, 64)) AS t(dim)),
    m AS (SELECT dim, ROUND(SUM(x) / COUNT(*), 9) AS mu
          FROM e GROUP BY 1),
    c AS (SELECT vec_id, e.dim, x - mu AS cx
          FROM e JOIN m ON m.dim = e.dim),
    nrows AS (SELECT COUNT(*) AS n FROM embeddings),
    s1 AS (SELECT vec_id, SUM(cx * 0.125) AS s FROM c GROUP BY 1),
    w1 AS (SELECT c.dim,
                  ROUND(SUM(s1.s * c.cx) / (SELECT n FROM nrows), 7) AS w
           FROM c JOIN s1 ON s1.vec_id = c.vec_id GROUP BY 1),
    l1 AS (SELECT SQRT(SUM(w * w)) AS lam FROM w1),
    v1 AS (SELECT dim, w / (SELECT lam FROM l1) AS v FROM w1),
    s2 AS (SELECT c.vec_id, SUM(c.cx * v1.v) AS s
           FROM c JOIN v1 ON v1.dim = c.dim GROUP BY 1),
    w2 AS (SELECT c.dim,
                  ROUND(SUM(s2.s * c.cx) / (SELECT n FROM nrows), 7) AS w
           FROM c JOIN s2 ON s2.vec_id = c.vec_id GROUP BY 1),
    l2 AS (SELECT SQRT(SUM(w * w)) AS lam FROM w2),
    v2 AS (SELECT dim, w / (SELECT lam FROM l2) AS v FROM w2),
    t1 AS (SELECT dim, v,
                  ROW_NUMBER() OVER (ORDER BY ROUND(ABS(v), 6) DESC, dim)
                    AS rk
           FROM v1),
    t2 AS (SELECT dim, v,
                  ROW_NUMBER() OVER (ORDER BY ROUND(ABS(v), 6) DESC, dim)
                    AS rk
           FROM v2)
    SELECT * FROM (
      SELECT 1 AS iter,
             ROUND((SELECT lam FROM l1), 6) AS eigval_est,
             CAST((SELECT dim FROM t1 WHERE rk = 1) AS INTEGER) AS top_dim,
             ROUND((SELECT v FROM t1 WHERE rk = 1), 6) AS top_loading
      UNION ALL
      SELECT 2,
             ROUND((SELECT lam FROM l2), 6),
             CAST((SELECT dim FROM t2 WHERE rk = 1) AS INTEGER),
             ROUND((SELECT v FROM t2 WHERE rk = 1), 6)
    ) ORDER BY iter
    """,
    doc="Distributed PCA top component by POWER ITERATION (2 fixed "
    "rounds from the exact v0 = 1/sqrt(64) = 0.125): per round, the "
    "matrix-free covariance product C*v is two keyed aggregates — "
    "row-local dots s_i = (x_i - mu).v (in-order array fold, no "
    "shuffle), then per-dimension sums of s_i*(x_i - mu) (64 keys, "
    "map-side combined). Only 64-vectors ever reach the driver (mean, "
    "w), the iterate-with-bounded-driver-state discipline of "
    "kmeans_lloyd. eigval_est = ||C v|| converges to the top "
    "eigenvalue; top_dim/top_loading expose the leading loading. "
    "Cross-engine determinism: mu and w are ROUNDED (9/7 decimals) at "
    "each aggregate so both engines iterate from identical vectors; "
    "division and sqrt happen on those exact rounded values.",
)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from kyuubi_spark.caching import persisted
    from kyuubi_spark.functions.compat import pyround
    from kyuubi_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    d = 64
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    ex = emb.select("vec_id", F.posexplode(dbl).alias("dim0", "x"))
    mean_rows = (
        ex.groupBy("dim0")
        .agg(F.round(F.sum("x") / F.lit(n), 9).alias("mu"))
        .collect()
    )
    mu = [0.0] * d
    for r in mean_rows:
        mu[r["dim0"]] = r["mu"]
    cent = persisted(
        emb.select(
            "vec_id",
            F.zip_with(
                dbl,
                F.array(*[F.lit(v) for v in mu]),
                lambda x, m: x - m,
            ).alias("cent"),
        )
    )
    v = [0.125] * d
    out_rows = []
    for it in (1, 2):
        varr = F.array(*[F.lit(x) for x in v])
        s = cent.select(
            "vec_id",
            F.aggregate(
                F.zip_with(F.col("cent"), varr, lambda c, vv: c * vv),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("s"),
            "cent",
        )
        w_rows = (
            s.select("s", F.posexplode("cent").alias("dim0", "cx"))
            .groupBy("dim0")
            .agg(F.round(F.sum(F.col("s") * F.col("cx")) / F.lit(n), 7)
                 .alias("w"))
            .collect()
        )
        w = [0.0] * d
        for r in w_rows:
            w[r["dim0"]] = r["w"]
        lam = math.sqrt(sum(x * x for x in w))
        v = [x / lam for x in w]
        top_dim = min(
            range(d), key=lambda j: (-pyround(abs(v[j]), 6), j)
        )
        out_rows.append(
            (it, pyround(lam, 6), top_dim + 1, pyround(v[top_dim], 6))
        )
    return spark.createDataFrame(
        out_rows, "iter int, eigval_est double, top_dim int, "
        "top_loading double"
    ).orderBy("iter")


@query(
    "fd_discovery_report",
    oracle="""
    WITH cand AS (
      SELECT 'p_brand' AS lhs, 'p_type' AS rhs,
             p_brand AS l, p_type AS r FROM part
      UNION ALL
      SELECT 'p_type', 'p_brand', p_type, p_brand FROM part
      UNION ALL
      SELECT 'p_name', 'p_brand', p_name, p_brand FROM part
      UNION ALL
      SELECT 'n_name', 'r_name', n_name, r_name
      FROM nation JOIN region ON n_regionkey = r_regionkey
      UNION ALL
      SELECT 'o_custkey', 'o_orderpriority',
             CAST(o_custkey AS VARCHAR), o_orderpriority FROM orders
      UNION ALL
      SELECT 'c_name', 'c_mktsegment', c_name, c_mktsegment FROM customer),
    g AS (
      SELECT lhs, rhs, l, COUNT(DISTINCT r) AS nd
      FROM cand GROUP BY 1, 2, 3)
    SELECT lhs, rhs,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           CAST(SUM(nd - 1) AS BIGINT) AS excess_pairs,
           SUM(nd - 1) = 0 AS holds
    FROM g GROUP BY 1, 2 ORDER BY lhs, rhs
    """,
    doc="Functional-dependency discovery audit: for a fixed candidate "
    "set of X -> Y dependencies across part/nation/orders/customer, "
    "measure exactly how far each holds (violating LHS groups, excess "
    "distinct-RHS pairs) — the schema-inference pass a data catalog "
    "runs to propose keys and denormalization targets. Plan: the "
    "candidates union into ONE (lhs,rhs,l,r) relation, then a single "
    "two-level keyed aggregate (distinct per group, rollup per "
    "candidate) — no joins beyond the 25-row nation-region broadcast, "
    "map-side combinable, scales as one shuffle of the unioned "
    "column pairs.",
)
def fd_discovery_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.session import load_table

    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    def pair(df, lhs, rhs, lcol=None, rcol=None):
        return df.select(
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            (lcol if lcol is not None else F.col(lhs)).cast("string")
            .alias("l"),
            (rcol if rcol is not None else F.col(rhs)).cast("string")
            .alias("r"),
        )

    cand = (
        pair(part, "p_brand", "p_type")
        .unionAll(pair(part, "p_type", "p_brand"))
        .unionAll(pair(part, "p_name", "p_brand"))
        .unionAll(
            pair(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ),
                "n_name",
                "r_name",
            )
        )
        .unionAll(pair(orders, "o_custkey", "o_orderpriority"))
        .unionAll(pair(customer, "c_name", "c_mktsegment"))
    )
    g = cand.groupBy("lhs", "rhs", "l").agg(
        F.countDistinct("r").alias("nd")
    )
    return (
        g.groupBy("lhs", "rhs")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
            F.sum(F.col("nd") - 1).cast("bigint").alias("excess_pairs"),
            (F.sum(F.col("nd") - 1) == 0).alias("holds"),
        )
        .orderBy("lhs", "rhs")
    )


@query(
    "char_entropy_profile",
    oracle="""
    WITH bg AS (
      SELECT doc_id, source, bg
      FROM (SELECT doc_id, source, text FROM documents
            WHERE length(text) >= 2) d,
           unnest(list_transform(generate_series(1, length(d.text) - 1),
                                 i -> substr(d.text, i, 2))) AS t(bg)),
    c AS (SELECT doc_id, source, bg, COUNT(*) AS c
          FROM bg GROUP BY 1, 2, 3),
    h AS (
      SELECT doc_id, source,
             LN(SUM(c)) - SUM(c * LN(c)) / SUM(c) AS ent
      FROM c GROUP BY 1, 2)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(SUM(ent) / COUNT(*), 6) AS mean_entropy,
           ROUND(MIN(ent), 6) AS min_entropy,
           ROUND(MAX(ent), 6) AS max_entropy
    FROM h GROUP BY 1 ORDER BY source
    """,
    doc="Character-bigram Shannon entropy per document, profiled per "
    "source — the cheap gibberish/boilerplate detector (low entropy = "
    "repeated boilerplate, implausibly high = random noise) that "
    "complements dictionary-based quality scores in a curation stack. "
    "Entropy comes from exact integer bigram counts via "
    "H = ln(n) - sum(c*ln c)/n, so the only float ops are ln of "
    "integers and one division per doc. Plan: row-local bigram "
    "explode -> one (doc,bigram) keyed aggregate -> one doc rollup -> "
    "one source rollup; all map-side combinable, no windows, no joins.",
)
def char_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= 2
    )
    bg = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1),"
                " i -> substring(text, i, 2))"
            )
        ).alias("bg"),
    )
    c = bg.groupBy("doc_id", "source", "bg").agg(F.count("*").alias("c"))
    h = c.groupBy("doc_id", "source").agg(
        (
            F.log(F.sum("c"))
            - F.sum(F.col("c") * F.log(F.col("c"))) / F.sum("c")
        ).alias("ent")
    )
    return (
        h.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            dround(F.sum("ent") / F.count("*"), 6).alias("mean_entropy"),
            dround(F.min("ent"), 6).alias("min_entropy"),
            dround(F.max("ent"), 6).alias("max_entropy"),
        )
        .orderBy("source")
    )


def _bpe_oracle() -> str:
    """Unrolled 5-step greedy BPE oracle (each step: rank pairs, pick
    the (count desc, pair asc) top, literal-replace it everywhere)."""
    head = r"""
    WITH w0 AS (
      SELECT word, COUNT(*) AS w,
             regexp_replace(word, '(.)', ' \1 ', 'g') AS s
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE length(word) >= 1
      GROUP BY 1)
    """
    steps = []
    for i in range(1, 6):
        prev = f"w{i - 1}"
        steps.append(f"""
    p{i} AS (
      SELECT sym[i] || '+' || sym[i + 1] AS pair,
             ' ' || sym[i] || '  ' || sym[i + 1] || ' ' AS pat,
             ' ' || sym[i] || sym[i + 1] || ' ' AS rep,
             SUM(w) AS cnt
      FROM (SELECT w, string_split(trim(s), '  ') AS sym FROM {prev}),
           unnest(generate_series(1, len(sym) - 1)) AS t(i)
      GROUP BY 1, 2, 3),
    t{i} AS (SELECT * FROM p{i} ORDER BY cnt DESC, pair ASC LIMIT 1),
    w{i} AS (
      SELECT word, w,
             replace(s, (SELECT pat FROM t{i}), (SELECT rep FROM t{i}))
               AS s
      FROM {prev})""")
        # noqa: the i-th stage reads stage i-1; replace() is literal and
        # boundary-exact under the double-space symbol separator
    finals = "\n      UNION ALL\n".join(
        f"""
      SELECT {i} AS step, (SELECT pair FROM t{i}) AS pair,
             CAST((SELECT cnt FROM t{i}) AS BIGINT) AS pair_count,
             CAST((SELECT SUM(w * len(string_split(trim(s), '  ')))
                   FROM w{i}) AS BIGINT) AS corpus_symbols_after"""
        for i in range(1, 6)
    )
    return (
        head + "," + ",".join(steps)
        + f"\n    SELECT * FROM (\n{finals}\n    ) ORDER BY step"
    )


@query(
    "bpe_apply_merges",
    oracle=_bpe_oracle(),
    doc="TRUE greedy BPE learning, 5 sequential merges: each round "
    "counts adjacent symbol pairs over the CURRENT segmentation "
    "(occurrence-weighted), picks the (count desc, pair asc) top, and "
    "applies it corpus-wide before recounting — the sequential-"
    "dependency structure tokenizer training actually has, unlike the "
    "one-shot pair count in bpe_merge_pair_counts. Distributed shape: "
    "the working relation is the VOCABULARY (word type, occurrence "
    "count, segmentation string), so each round is one vocab-keyed "
    "pair-explode aggregate + a 1-row driver collect (the chosen "
    "merge) + a map-side literal replace; corpus scale enters only "
    "through the initial word count. Symbol boundaries are exact: "
    "symbols join on double spaces, patterns pad one space each side, "
    "so a merged multi-char symbol can never match a suffix of "
    "another symbol. Reports each chosen pair, its weighted count, "
    "and the corpus token length after the merge.",
)
def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.caching import persisted
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count("*").alias("w"))
        .select(
            "word",
            "w",
            F.regexp_replace(F.col("word"), "(.)", " $1 ").alias("s"),
        )
    )
    cur = persisted(vocab)
    out_rows = []
    for step in range(1, 6):
        # Spark sequence(0, -1) counts DOWN, so a 1-symbol word would
        # index sym[1]: keep only words that still have a pair
        syms = cur.select(
            "w", F.split(F.trim(F.col("s")), "  ").alias("sym")
        ).filter(F.size("sym") >= 2)
        pairs = syms.select(
            "w",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(sym) - 2),"
                    " i -> struct(sym[i] AS a, sym[i + 1] AS b))"
                )
            ).alias("p"),
        ).select(
            F.concat_ws("+", F.col("p.a"), F.col("p.b")).alias("pair"),
            F.concat(
                F.lit(" "), F.col("p.a"), F.lit("  "), F.col("p.b"),
                F.lit(" "),
            ).alias("pat"),
            F.concat(
                F.lit(" "), F.col("p.a"), F.col("p.b"), F.lit(" ")
            ).alias("rep"),
            F.col("w"),
        )
        top = (
            pairs.groupBy("pair", "pat", "rep")
            .agg(F.sum("w").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()[0]
        )
        nxt = persisted(
            cur.select(
                "word",
                "w",
                F.replace(
                    F.col("s"), F.lit(top["pat"]), F.lit(top["rep"])
                ).alias("s"),
            )
        )
        symbols_after = nxt.select(
            F.sum(
                F.col("w") * F.size(F.split(F.trim(F.col("s")), "  "))
            ).alias("t")
        ).collect()[0]["t"]
        out_rows.append(
            (step, top["pair"], int(top["cnt"]), int(symbols_after))
        )
        cur = nxt
    return spark.createDataFrame(
        out_rows,
        "step int, pair string, pair_count bigint, "
        "corpus_symbols_after bigint",
    ).orderBy("step")


_HEX = "0123456789abcdef"


@query(
    "audio_fingerprint_near_dup",
    oracle=f"""
    WITH b AS (SELECT unnest(generate_series(0, 39)) AS bid),
    m AS (
      SELECT 2 * bid + v AS media_id, sha256('audio:' || bid) AS sha,
             v = 1 AS isv
      FROM b, (SELECT unnest([0, 1]) AS v)),
    g AS (SELECT unnest(generate_series(0, 64)) AS w),
    j AS (SELECT unnest(generate_series(0, 3)) AS jj),
    en AS (
      SELECT media_id, w,
             SUM(CASE WHEN isv AND (5 * w + jj) = 137 THEN
                   ((strpos('{_HEX}',
                            substr(sha, ((5*w+jj) % 32) * 2 + 1, 1)) - 1)
                    * 16
                    + strpos('{_HEX}',
                             substr(sha, ((5*w+jj) % 32) * 2 + 2, 1)) - 1
                    + 101) % 256
                 ELSE
                   (strpos('{_HEX}',
                           substr(sha, ((5*w+jj) % 32) * 2 + 1, 1)) - 1)
                   * 16
                   + strpos('{_HEX}',
                            substr(sha, ((5*w+jj) % 32) * 2 + 2, 1)) - 1
                 END) AS e
      FROM m, g, j
      GROUP BY 1, 2),
    bits AS (
      SELECT e1.media_id, e1.w AS bidx,
             CASE WHEN e2.e > e1.e THEN 1 ELSE 0 END AS bit
      FROM en e1 JOIN en e2
        ON e2.media_id = e1.media_id AND e2.w = e1.w + 1
      WHERE e1.w < 64),
    pairs AS (
      SELECT a.media_id AS a_id, b.media_id AS b_id,
             SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
      FROM bits a JOIN bits b
        ON a.bidx = b.bidx AND a.media_id < b.media_id
      GROUP BY 1, 2)
    SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
           CAST(hamming AS BIGINT) AS hamming
    FROM pairs WHERE hamming <= 3 ORDER BY a_id, b_id
    """,
    doc="Audio near-duplicate detection, completing the multimodal dedup "
    "set (text/embedding/image/video/AUDIO): each clip collapses to a "
    "64-bit energy-delta-sign fingerprint (the Shazam-family shape — "
    "overlapping sample-energy windows, keep the sign of each "
    "successive delta; Arrow-batched mapInPandas with the PCM decode "
    "stubbed to the synthetic payload bytes), then the SAME banded-"
    "Hamming kernel as image/simhash (4x16-bit chunks, pigeonhole-"
    "complete for distance <= 3) surfaces transcoded copies. The corpus "
    "plants one one-byte-perturbed variant per base clip (flips at most "
    "2 adjacent delta signs); the oracle replays the sha256 sample "
    "arithmetic and brute-forces all pairs, proving the bucketed path "
    "loses nothing. 8 bytes/clip at 100 TB; payload bytes touched once.",
)
def audio_fingerprint_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import multimodal as M
    from kyuubi_spark.functions.dedup import packed_hamming_near_dup_pairs

    media = M.synthesize_audio_pairs(spark, n_base=40, partitions=8)
    sig = M.energy_sign_fingerprint(media)
    pairs = packed_hamming_near_dup_pairs(
        sig, id_col="media_id", sig_col="afp", max_hamming=3, chunks=4
    )
    return pairs.orderBy("a_id", "b_id")


@query(
    "elasticity_by_brand",
    oracle="""
    WITH x AS (
      SELECT p.p_brand,
             LN(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS lx,
             LN(CAST(round(l.l_quantity, 0) AS BIGINT)) AS ly
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_quantity >= 1 AND l.l_extendedprice > 0),
    s AS (
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(lx) AS sx, SUM(ly) AS sy,
             SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
      FROM x GROUP BY 1)
    SELECT p_brand, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
             AS elasticity,
           ROUND(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                 * sx / n, 6) AS intercept
    FROM s ORDER BY p_brand
    """,
    doc="Grouped log-log OLS: per-brand price elasticity of demand "
    "(slope of ln quantity on ln price) — the pricing-analytics shape "
    "that generalizes price_quantity_regression from one global fit to "
    "thousands of per-group fits in a single pass. Inputs are ln of "
    "EXACT integers (cents, rounded quantity) so the per-group power "
    "sums are reproducible to the final dround; the whole query is one "
    "brand-keyed aggregate after a partkey equi-join (part side "
    "broadcast-eligible), slope and intercept computed closed-form "
    "from (n, Sx, Sy, Sxx, Sxy) — no per-group iteration, no window.",
)
def elasticity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    x = (
        li.filter((F.col("l_quantity") >= 1) & (F.col("l_extendedprice") > 0))
        .join(
            part.select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            "p_brand",
            F.log(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            ).alias("lx"),
            F.log(F.round(F.col("l_quantity"), 0).cast("bigint")).alias(
                "ly"
            ),
        )
    )
    s = x.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        "p_brand",
        "n",
        dround(slope, 6).alias("elasticity"),
        dround(F.col("sy") / nd - slope * F.col("sx") / nd, 6).alias(
            "intercept"
        ),
    ).orderBy("p_brand")


@query(
    "segment_migration_matrix",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             SUM(CASE WHEN o_orderdate >= TIMESTAMP '1999-01-01'
                       AND o_orderdate < TIMESTAMP '2000-01-01'
                      THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN o_orderdate >= TIMESTAMP '2000-01-01'
                       AND o_orderdate < TIMESTAMP '2001-01-01'
                      THEN 1 ELSE 0 END) AS n2
      FROM orders GROUP BY 1),
    t AS (
      SELECT CASE WHEN n1 = 0 THEN 'inactive' WHEN n1 = 1 THEN 'light'
                  WHEN n1 <= 3 THEN 'regular' ELSE 'heavy' END AS tier_from,
             CASE WHEN n2 = 0 THEN 'inactive' WHEN n2 = 1 THEN 'light'
                  WHEN n2 <= 3 THEN 'regular' ELSE 'heavy' END AS tier_to
      FROM per WHERE n1 > 0 OR n2 > 0),
    m AS (SELECT tier_from, tier_to, COUNT(*) AS n
          FROM t GROUP BY 1, 2),
    tot AS (SELECT tier_from, SUM(n) AS nf FROM m GROUP BY 1)
    SELECT m.tier_from, m.tier_to,
           CAST(m.n AS BIGINT) AS n_customers,
           ROUND(CAST(m.n AS DOUBLE) / tot.nf, 6) AS share_of_from
    FROM m JOIN tot ON tot.tier_from = m.tier_from
    ORDER BY m.tier_from, m.tier_to
    """,
    doc="Customer lifecycle migration matrix: activity tiers (inactive/"
    "light/regular/heavy by order count) in 1999 vs 2000, cross-"
    "tabulated with per-origin shares — the year-over-year engagement "
    "movement report behind churn/upsell planning, and the segment-"
    "level Markov matrix (markov_transition_matrix's event-level "
    "sibling). ONE pass: both years' counts come from the same "
    "custkey groupBy via conditional aggregation (never two scans "
    "self-joined), tiers are map-side CASEs, the matrix is a 16-cell "
    "aggregate and the share join is a broadcast of <= 4 row totals.",
)
def segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    y1, y2, y3 = (
        F.lit("1999-01-01").cast("timestamp"),
        F.lit("2000-01-01").cast("timestamp"),
        F.lit("2001-01-01").cast("timestamp"),
    )
    per = orders.groupBy("o_custkey").agg(
        F.sum(
            F.when(
                (F.col("o_orderdate") >= y1) & (F.col("o_orderdate") < y2), 1
            ).otherwise(0)
        ).alias("n1"),
        F.sum(
            F.when(
                (F.col("o_orderdate") >= y2) & (F.col("o_orderdate") < y3), 1
            ).otherwise(0)
        ).alias("n2"),
    )

    def tier(c):
        return (
            F.when(F.col(c) == 0, "inactive")
            .when(F.col(c) == 1, "light")
            .when(F.col(c) <= 3, "regular")
            .otherwise("heavy")
        )

    t = per.filter((F.col("n1") > 0) | (F.col("n2") > 0)).select(
        tier("n1").alias("tier_from"), tier("n2").alias("tier_to")
    )
    m = t.groupBy("tier_from", "tier_to").agg(F.count("*").alias("n"))
    tot = m.groupBy("tier_from").agg(F.sum("n").alias("nf"))
    return (
        m.join(F.broadcast(tot), "tier_from")
        .select(
            "tier_from",
            "tier_to",
            F.col("n").cast("bigint").alias("n_customers"),
            dround(F.col("n").cast("double") / F.col("nf"), 6).alias(
                "share_of_from"
            ),
        )
        .orderBy("tier_from", "tier_to")
    )


@query(
    "join_cardinality_audit",
    oracle="""
    WITH stats AS (
      SELECT 'orders_x_lineitem' AS join_name,
             (SELECT COUNT(*) FROM orders) AS n_left,
             (SELECT COUNT(*) FROM lineitem) AS n_right,
             (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS ndv_l,
             (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS ndv_r,
             (SELECT COUNT(*) FROM orders o JOIN lineitem l
                ON o.o_orderkey = l.l_orderkey) AS actual
      UNION ALL
      SELECT 'part_x_lineitem',
             (SELECT COUNT(*) FROM part),
             (SELECT COUNT(*) FROM lineitem),
             (SELECT COUNT(DISTINCT p_partkey) FROM part),
             (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
             (SELECT COUNT(*) FROM part p JOIN lineitem l
                ON p.p_partkey = l.l_partkey)
      UNION ALL
      SELECT 'customer_x_orders',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(DISTINCT c_custkey) FROM customer),
             (SELECT COUNT(DISTINCT o_custkey) FROM orders),
             (SELECT COUNT(*) FROM customer c JOIN orders o
                ON c.c_custkey = o.o_custkey))
    SELECT join_name,
           CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           CAST(n_left * n_right
                / GREATEST(ndv_l, ndv_r) AS BIGINT) AS est_rows,
           CAST(actual AS BIGINT) AS actual_rows,
           ROUND(GREATEST(
             CAST(n_left * n_right / GREATEST(ndv_l, ndv_r) AS DOUBLE)
               / actual,
             actual / CAST(n_left * n_right / GREATEST(ndv_l, ndv_r)
                           AS DOUBLE)), 4) AS q_error
    FROM stats ORDER BY join_name
    """,
    doc="Join-cardinality estimator audit: the textbook independence/"
    "containment estimate |R||S|/max(ndv_R, ndv_S) vs the ACTUAL join "
    "size for three FK joins, reported as q-error — the optimizer-"
    "quality diagnostic behind cost_based_stats (a CBO whose q-errors "
    "drift from 1.0 picks wrong join orders at scale; TPC-H FK joins "
    "should sit near 1.0, so drift flags stats staleness or skew). All "
    "inputs are exact counts/NDVs (integer floor-division estimate, "
    "one dround on the ratio); each leg is a keyed aggregate or "
    "equi-join count, unioned into one 3-row report.",
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cust = load_table(spark, sf_dir, "customer")

    def leg(name, left, lkey, right, rkey):
        nl = left.agg(F.count("*").alias("n_left")).crossJoin(
            left.agg(F.countDistinct(lkey).alias("ndv_l"))
        )
        nr = right.agg(F.count("*").alias("n_right")).crossJoin(
            right.agg(F.countDistinct(rkey).alias("ndv_r"))
        )
        actual = (
            left.select(F.col(lkey).alias("k"))
            .join(right.select(F.col(rkey).alias("k")), "k")
            .agg(F.count("*").alias("actual"))
        )
        return (
            nl.crossJoin(nr)
            .crossJoin(actual)
            .select(F.lit(name).alias("join_name"), "n_left", "n_right",
                    "ndv_l", "ndv_r", "actual")
        )

    stats = (
        leg("orders_x_lineitem", orders, "o_orderkey", li, "l_orderkey")
        .unionAll(leg("part_x_lineitem", part, "p_partkey", li, "l_partkey"))
        .unionAll(leg("customer_x_orders", cust, "c_custkey", orders,
                      "o_custkey"))
    )
    est = F.floor(
        (F.col("n_left") * F.col("n_right"))
        / F.greatest(F.col("ndv_l"), F.col("ndv_r"))
    ).cast("bigint")
    return stats.select(
        "join_name",
        F.col("n_left").cast("bigint").alias("n_left"),
        F.col("n_right").cast("bigint").alias("n_right"),
        est.alias("est_rows"),
        F.col("actual").cast("bigint").alias("actual_rows"),
        dround(
            F.greatest(
                est.cast("double") / F.col("actual"),
                F.col("actual") / est.cast("double"),
            ),
            4,
        ).alias("q_error"),
    ).orderBy("join_name")


@query(
    "holt_trend_forecast",
    oracle="""
    WITH RECURSIVE monthly AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(SUM(CAST(floor(round(o_totalprice * 100, 0) / 100)
                           AS BIGINT)) AS DOUBLE) AS y
      FROM orders GROUP BY 1),
    m AS (SELECT ROW_NUMBER() OVER (ORDER BY mon) AS i, mon, y
          FROM monthly),
    hw(i, mon, y, l, b) AS (
      SELECT i, mon, y, y,
             (SELECT y FROM m WHERE i = 2) - y
      FROM m WHERE i = 1
      UNION ALL
      SELECT m.i, m.mon, m.y,
             0.5 * m.y + 0.5 * (hw.l + hw.b),
             0.25 * (0.5 * m.y + 0.5 * (hw.l + hw.b) - hw.l)
               + 0.75 * hw.b
      FROM hw JOIN m ON m.i = hw.i + 1)
    SELECT CAST(mon AS TIMESTAMP) AS month,
           CAST(y AS BIGINT) AS actual,
           ROUND(l, 6) AS level,
           ROUND(b, 6) AS trend,
           ROUND(l + b, 6) AS forecast_next
    FROM hw
    WHERE i > (SELECT MAX(i) FROM m) - 6
    ORDER BY month
    """,
    doc="Holt double exponential smoothing over monthly revenue (alpha "
    "= 0.5, beta = 0.25 — BINARY fractions, so with integer-dollar "
    "inputs every level/trend value is an exact dyadic rational and "
    "the recursion is bit-identical across engines with no rounding "
    "tricks): level/trend recursion seeded l0 = y0, b0 = y1 - y0, "
    "emitting the last 6 months with one-step-ahead forecasts. "
    "Distributed shape: the fact scan collapses to a CALENDAR-BOUNDED "
    "monthly rollup (one keyed aggregate), and only that ~80-row "
    "series reaches the driver for the inherently-sequential fold — "
    "the same bounded-driver-state discipline as the ranking offsets. "
    "Oracle runs the identical recursion as a recursive CTE.",
)
def holt_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import pyround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("mon")
        )
        .agg(F.sum(_dollars("o_totalprice")).alias("y"))
        .orderBy("mon")
        .collect()
    )
    ys = [(r["mon"], float(r["y"])) for r in monthly]
    out = []
    lvl = ys[0][1]
    b = ys[1][1] - ys[0][1]
    out.append((ys[0][0], int(ys[0][1]), lvl, b))
    for mon, y in ys[1:]:
        new_l = 0.5 * y + 0.5 * (lvl + b)
        b = 0.25 * (new_l - lvl) + 0.75 * b
        lvl = new_l
        out.append((mon, int(y), lvl, b))
    rows = [
        (mon, actual, pyround(lv, 6), pyround(tr, 6),
         pyround(lv + tr, 6))
        for mon, actual, lv, tr in out[-6:]
    ]
    return spark.createDataFrame(
        rows,
        "month timestamp, actual bigint, level double, trend double, "
        "forecast_next double",
    ).orderBy("month")


@query(
    "median_ci_orderstat",
    oracle="""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders),
    n AS (SELECT COUNT(*) AS n FROM v),
    ks AS (
      SELECT n,
             CAST(FLOOR((n + 1) / 2.0) AS BIGINT) AS k_med,
             CAST(FLOOR((n - 1.959964 * SQRT(n)) / 2.0) AS BIGINT) AS k_lo,
             CAST(CEIL(1 + (n + 1.959964 * SQRT(n)) / 2.0) AS BIGINT)
               AS k_hi
      FROM n),
    r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rk FROM v)
    SELECT CAST(ks.n AS BIGINT) AS n,
           (SELECT cents FROM r WHERE rk = ks.k_med) AS median_cents,
           (SELECT cents FROM r WHERE rk = ks.k_lo) AS ci_lo_cents,
           (SELECT cents FROM r WHERE rk = ks.k_hi) AS ci_hi_cents
    FROM ks
    """,
    doc="Distribution-free 95% confidence interval for the MEDIAN by "
    "order statistics (the binomial/normal-approx rank bounds — no "
    "distributional assumption, the textbook nonparametric CI): ranks "
    "k_lo/k_med/k_hi are computed from n, then the three exact order "
    "statistics of order price (integer cents) are fetched. Spark side "
    "uses the DISTRIBUTED exact ranker (operators/ranking.py: range-"
    "bucket + per-bucket window + bounded offsets) instead of the "
    "oracle's single-partition ROW_NUMBER, then filters the three "
    "ranks — order statistics at 100 TB without a global sort to one "
    "task. Rank formulas use the same double sqrt in both engines.",
)
def median_ci_orderstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from kyuubi_spark.operators.ranking import global_row_numbers
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    v = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents")
    )
    ranked, n = global_row_numbers(v, {"rk": [("cents", "asc")]})
    k_med = math.floor((n + 1) / 2.0)
    k_lo = math.floor((n - 1.959964 * math.sqrt(n)) / 2.0)
    k_hi = math.ceil(1 + (n + 1.959964 * math.sqrt(n)) / 2.0)
    picks = ranked.filter(
        F.col("rk").isin([k_med, k_lo, k_hi])
    ).select("cents", "rk")
    out = picks.agg(
        F.lit(n).cast("bigint").alias("n"),
        F.max(F.when(F.col("rk") == k_med, F.col("cents"))).alias(
            "median_cents"
        ),
        F.max(F.when(F.col("rk") == k_lo, F.col("cents"))).alias(
            "ci_lo_cents"
        ),
        F.max(F.when(F.col("rk") == k_hi, F.col("cents"))).alias(
            "ci_hi_cents"
        ),
    )
    return out


@query(
    "selectivity_correlation_audit",
    oracle="""
    WITH f AS (
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS b,
             CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS c
      FROM orders),
    s AS (SELECT COUNT(*) AS n, SUM(a) AS na, SUM(b) AS nb, SUM(c) AS nc,
                 SUM(a * b) AS nab, SUM(a * c) AS nac, SUM(b * c) AS nbc
          FROM f)
    SELECT * FROM (
      SELECT 'priority_x_status' AS pair,
             CAST(nab AS BIGINT) AS actual_rows,
             ROUND(CAST(na AS DOUBLE) * nb / n, 4) AS independent_est,
             ROUND(nab * CAST(n AS DOUBLE) / (na * nb), 6)
               AS correlation_factor
      FROM s
      UNION ALL
      SELECT 'priority_x_price', CAST(nac AS BIGINT),
             ROUND(CAST(na AS DOUBLE) * nc / n, 4),
             ROUND(nac * CAST(n AS DOUBLE) / (na * nc), 6)
      FROM s
      UNION ALL
      SELECT 'status_x_price', CAST(nbc AS BIGINT),
             ROUND(CAST(nb AS DOUBLE) * nc / n, 4),
             ROUND(nbc * CAST(n AS DOUBLE) / (nb * nc), 6)
      FROM s)
    ORDER BY pair
    """,
    doc="Predicate-correlation audit, the selectivity half of the CBO "
    "diagnostic pair (join_cardinality_audit covers joins): for three "
    "predicate pairs on orders, compare the optimizer's independence "
    "assumption sel(A)sel(B) against the actual conjunctive count and "
    "report the correlation factor (1.0 = independent; far from 1.0 = "
    "the multi-column-stats case). ONE scan: all three indicator "
    "columns and their pairwise products reduce in a single scalar "
    "aggregate — no joins, no second pass.",
)
def selectivity_correlation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    f = orders.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        .alias("a"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("b"),
        F.when(F.col("o_totalprice") > 150000, 1).otherwise(0).alias("c"),
    )
    s = f.agg(
        F.count("*").alias("n"),
        F.sum("a").alias("na"),
        F.sum("b").alias("nb"),
        F.sum("c").alias("nc"),
        F.sum(F.col("a") * F.col("b")).alias("nab"),
        F.sum(F.col("a") * F.col("c")).alias("nac"),
        F.sum(F.col("b") * F.col("c")).alias("nbc"),
    )

    def row(name, nxy, nx, ny):
        return s.select(
            F.lit(name).alias("pair"),
            F.col(nxy).cast("bigint").alias("actual_rows"),
            dround(
                F.col(nx).cast("double") * F.col(ny) / F.col("n"), 4
            ).alias("independent_est"),
            dround(
                F.col(nxy) * F.col("n").cast("double")
                / (F.col(nx) * F.col(ny)),
                6,
            ).alias("correlation_factor"),
        )

    return (
        row("priority_x_status", "nab", "na", "nb")
        .unionAll(row("priority_x_price", "nac", "na", "nc"))
        .unionAll(row("status_x_price", "nbc", "nb", "nc"))
        .orderBy("pair")
    )


@query(
    "feature_hash_collision_audit",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT word
      FROM (SELECT unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE length(word) >= 1),
    h AS (
      SELECT word,
             CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS hv
      FROM tok),
    per AS (
      SELECT width, hv % width AS bucket, COUNT(*) AS c
      FROM h, (SELECT unnest([256, 4096, 65536]) AS width)
      GROUP BY 1, 2)
    SELECT CAST(width AS BIGINT) AS width,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS buckets_used,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
             AS tokens_in_collisions,
           CAST(SUM(c - 1) AS BIGINT) AS excess_collisions
    FROM per GROUP BY 1 ORDER BY width
    """,
    doc="Feature-hashing collision audit: the hashing-trick risk report "
    "behind text_hash_embed — for bucket widths 2^8/2^12/2^16, how "
    "many distinct vocabulary tokens share buckets (tokens_in_"
    "collisions, excess = sum over buckets of occupancy-1). The hash "
    "is the cross-engine md5-prefix bigint (the house convention), so "
    "both engines bucket identically. Plan: vocab distinct (one "
    "shuffle, vocab-sized), a 3x width explode, one bucket-keyed "
    "aggregate, one width rollup — all map-side combinable.",
)
def feature_hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 1)
        .distinct()
    )
    h = tok.select(
        F.conv(F.substring(F.md5("word"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hv")
    )
    widths = F.explode(F.array(F.lit(256), F.lit(4096), F.lit(65536)))
    per = (
        h.select("hv", widths.alias("width"))
        .groupBy("width", (F.col("hv") % F.col("width")).alias("bucket"))
        .agg(F.count("*").alias("c"))
    )
    return (
        per.groupBy("width")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("buckets_used"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("tokens_in_collisions"),
            F.sum(F.col("c") - 1).cast("bigint").alias("excess_collisions"),
        )
        .select(
            F.col("width").cast("bigint").alias("width"),
            "n_tokens", "buckets_used", "tokens_in_collisions",
            "excess_collisions",
        )
        .orderBy("width")
    )


@query(
    "interval_coverage_islands",
    oracle="""
    WITH iv AS (
      SELECT o_custkey, o_orderdate AS s,
             o_orderdate + INTERVAL 7 DAY AS e
      FROM orders),
    g AS (
      SELECT o_custkey, s, e,
             CASE WHEN s > MAX(e) OVER (PARTITION BY o_custkey
                    ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    OR MAX(e) OVER (PARTITION BY o_custkey
                    ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM iv),
    isl AS (
      SELECT o_custkey, SUM(new_island) OVER (PARTITION BY o_custkey
               ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS iid, s, e
      FROM g),
    per_island AS (
      SELECT o_custkey, iid,
             date_diff('day', MIN(s), MAX(e)) AS len_days
      FROM isl GROUP BY 1, 2),
    per_cust AS (
      SELECT o_custkey, COUNT(*) AS n_islands,
             SUM(len_days) AS covered_days
      FROM per_island GROUP BY 1)
    SELECT CASE WHEN n_islands >= 5 THEN 5 ELSE n_islands END
             AS islands_band,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(SUM(covered_days) / CAST(COUNT(*) AS DOUBLE), 6)
             AS avg_covered_days
    FROM per_cust GROUP BY 1 ORDER BY islands_band
    """,
    doc="Interval UNION per key (the temporal coverage operator): each "
    "order opens a 7-day activity window, per-customer windows merge "
    "into maximal islands via the running-max-end gaps-and-islands "
    "recipe (an interval starts a new island iff it begins after the "
    "max end seen so far), then total covered days and island counts "
    "roll up into a coverage distribution. This is the generic "
    "machinery behind uptime/SLA coverage, ad-exposure windows and "
    "sessionized availability. Scale: both windows partition on "
    "custkey (uniform key), the rest is two keyed aggregates; no "
    "self-join of intervals, no corpus-wide window.",
)
def interval_coverage_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    iv = orders.select(
        "o_custkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")).alias("e"),
    )
    w = Window.partitionBy("o_custkey").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    g = iv.withColumn(
        "new_island",
        F.when(
            prev_max_e.isNull() | (F.col("s") > prev_max_e), 1
        ).otherwise(0),
    )
    isl = g.withColumn(
        "iid",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = isl.groupBy("o_custkey", "iid").agg(
        F.datediff(F.max("e"), F.min("s")).alias("len_days")
    )
    per_cust = per_island.groupBy("o_custkey").agg(
        F.count("*").alias("n_islands"),
        F.sum("len_days").alias("covered_days"),
    )
    return (
        per_cust.groupBy(
            F.when(F.col("n_islands") >= 5, 5)
            .otherwise(F.col("n_islands"))
            .alias("islands_band")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            dround(
                F.sum("covered_days") / F.count("*").cast("double"), 6
            ).alias("avg_covered_days"),
        )
        .orderBy("islands_band")
    )


@query(
    "rolling_distinct_users_7d",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    cov AS (
      SELECT d.day,
             COUNT(DISTINCT u.user_id) AS dau7
      FROM days d JOIN ud u
        ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
      GROUP BY 1)
    SELECT CAST(day AS TIMESTAMP) AS day, CAST(dau7 AS BIGINT) AS dau7
    FROM cov ORDER BY day
    """,
    doc="EXACT rolling 7-day distinct users — the metric sliding "
    "windows cannot compute by summing daily distincts (users repeat "
    "across days). Distributed recipe: distinct (user, day) pairs -> "
    "per-user interval UNION of [day, day+6] coverage windows (gaps-"
    "and-islands keyed on user, so a user active on overlapping days "
    "contributes ONE interval, not seven) -> +1/-1 boundary deltas -> "
    "one cumulative sum over the CALENDAR-BOUNDED day axis (<= 31+6 "
    "rows; the only unpartitioned window, audit-allowlisted). The "
    "oracle brute-forces each day's 7-day membership with COUNT "
    "DISTINCT - a completely different evaluation strategy, so "
    "agreement is strong evidence. At 100 TB: everything shuffles on "
    "user_id or day; the stream is never exploded 7x.",
)
def rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).distinct()
    # per-user coverage intervals [day, day+6], merged into islands
    iv = ud.select(
        "user_id",
        F.col("day").alias("s"),
        F.date_add(F.col("day"), 6).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    isl = iv.withColumn(
        "new_island",
        F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1)
        .otherwise(0),
    ).withColumn(
        "iid",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = isl.groupBy("user_id", "iid").agg(
        F.min("s").alias("s"), F.max("e").alias("e")
    )
    # +1 at island start, -1 the day after island end; cumulative over days
    deltas = (
        merged.select(F.col("s").alias("day"), F.lit(1).alias("d"))
        .unionAll(
            merged.select(
                F.date_add(F.col("e"), 1).alias("day"), F.lit(-1).alias("d")
            )
        )
        .groupBy("day")
        .agg(F.sum("d").alias("d"))
    )
    # reporting days join the delta axis with d=0 so the running value
    # exists on every calendar day, not only boundary days
    days = ud.select("day").distinct()
    axis = (
        deltas.unionAll(days.select("day", F.lit(0).alias("d")))
        .groupBy("day")
        .agg(F.sum("d").alias("d"))
    )
    wd = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    run = axis.withColumn("dau7", F.sum("d").over(wd))
    return (
        days.join(run, "day")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            F.col("dau7").cast("bigint").alias("dau7"),
        )
        .orderBy("day")
    )


def _rp_signs(out_dims: int = 8, in_dims: int = 64) -> list:
    """Deterministic +-1 projection matrix from md5 parity (the SAME
    derivation the oracle replays in SQL: sign = +1 iff the first hex
    digit of md5('rp:j:k') is < 8)."""
    import hashlib

    return [
        [
            1.0
            if int(
                hashlib.md5(f"rp:{j}:{k}".encode()).hexdigest()[0], 16
            ) < 8
            else -1.0
            for j in range(1, in_dims + 1)
        ]
        for k in range(1, out_dims + 1)
    ]


@query(
    "random_projection_distortion",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    pr AS (
      SELECT a.vec_id,
             a.v AS va, b.v AS vb
      FROM e a JOIN e b ON b.vec_id = a.vec_id + 1),
    d AS (
      SELECT vec_id,
        SQRT(list_sum(list_transform(generate_series(1, 64),
             j -> (va[j] - vb[j]) * (va[j] - vb[j])))) AS d_orig,
        SQRT(list_sum(list_transform(generate_series(1, 8), k ->
          POWER(list_sum(list_transform(generate_series(1, 64), j ->
            (va[j] - vb[j])
            * (CASE WHEN strpos('01234567',
                       substr(md5('rp:' || j || ':' || k), 1, 1)) > 0
                    THEN 1.0 ELSE -1.0 END))), 2)))) / SQRT(8)
          AS d_proj
      FROM pr),
    r AS (SELECT vec_id, d_proj / d_orig AS ratio
          FROM d WHERE d_orig > 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(SUM(ratio) / COUNT(*), 6) AS mean_ratio,
           ROUND(MIN(ratio), 6) AS min_ratio,
           ROUND(MAX(ratio), 6) AS max_ratio,
           CAST(SUM(CASE WHEN ratio BETWEEN 0.8 AND 1.2
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within_20pct
    FROM r
    """,
    doc="Johnson-Lindenstrauss distance-preservation report: project "
    "the 64-d embeddings to 8-d with a deterministic +-1 matrix "
    "(md5-parity signs, replayed identically in SQL) and measure the "
    "pairwise-distance distortion ratio over consecutive-id pairs — "
    "the acceptance test run before swapping an ANN index to a "
    "random-projection sketch. Every distance is a row-local in-order "
    "fold (identical IEEE sequence in both engines), so min/max pick "
    "identical champions; the projection is a literal in the plan "
    "(64x8 signs), applied map-side — at 100 TB this is one narrow "
    "map + a self-join on adjacent ids, no shuffle of the matrix.",
)
def random_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    e = emb.select("vec_id", dbl.alias("v"))
    b = e.select(
        (F.col("vec_id") - 1).alias("vec_id"), F.col("v").alias("vb")
    )
    pr = e.join(b, "vec_id").select("vec_id", F.col("v").alias("va"), "vb")
    diff = F.zip_with("va", "vb", lambda x, y: x - y)
    pr = pr.select("vec_id", diff.alias("dv"))
    d_orig = F.sqrt(
        F.aggregate(
            F.transform("dv", lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    signs = _rp_signs()
    comps = []
    for k in range(8):
        sk = F.array(*[F.lit(s) for s in signs[k]])
        comp = F.aggregate(
            F.zip_with(F.col("dv"), sk, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        comps.append(comp * comp)
    d_proj = F.sqrt(sum(comps[1:], comps[0])) / F.lit(math.sqrt(8))
    r = (
        pr.select(d_orig.alias("d_orig"), d_proj.alias("d_proj"))
        .filter(F.col("d_orig") > 0)
        .select((F.col("d_proj") / F.col("d_orig")).alias("ratio"))
    )
    return r.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        dround(F.sum("ratio") / F.count("*"), 6).alias("mean_ratio"),
        dround(F.min("ratio"), 6).alias("min_ratio"),
        dround(F.max("ratio"), 6).alias("max_ratio"),
        F.sum(
            F.when(F.col("ratio").between(0.8, 1.2), 1).otherwise(0)
        ).cast("bigint").alias("n_within_20pct"),
    )


@query(
    "rec_coverage_diversity",
    oracle="""
    WITH co AS (
      SELECT a.l_partkey AS anchor, b.l_partkey AS rec, COUNT(*) AS c
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2),
    topk AS (
      SELECT anchor, rec, c,
             ROW_NUMBER() OVER (PARTITION BY anchor
                                ORDER BY c DESC, rec) AS rk
      FROM co),
    recs AS (SELECT anchor, rec, rk FROM topk WHERE rk <= 3),
    cov AS (
      SELECT COUNT(DISTINCT rec) AS n_rec_items,
             (SELECT COUNT(*) FROM part) AS n_catalog
      FROM recs),
    pairs AS (
      SELECT r1.anchor,
             CASE WHEN pa.p_brand <> pb.p_brand THEN 1 ELSE 0 END AS diff
      FROM recs r1 JOIN recs r2
        ON r2.anchor = r1.anchor AND r1.rk < r2.rk
      JOIN part pa ON pa.p_partkey = r1.rec
      JOIN part pb ON pb.p_partkey = r2.rec),
    ild AS (SELECT SUM(diff) AS n_diff, COUNT(*) AS n_pairs FROM pairs)
    SELECT CAST((SELECT COUNT(*) FROM recs) AS BIGINT) AS n_recs,
           CAST(cov.n_rec_items AS BIGINT) AS n_rec_items,
           ROUND(CAST(cov.n_rec_items AS DOUBLE) / cov.n_catalog, 6)
             AS catalog_coverage,
           ROUND(CAST(ild.n_diff AS DOUBLE) / ild.n_pairs, 6)
             AS intra_list_diversity
    FROM cov, ild
    """,
    doc="Recommender coverage & diversity evaluation over co-purchase "
    "top-3 recommendations: catalog coverage (share of the catalog "
    "that ever gets recommended - the long-tail starvation metric) "
    "and intra-list diversity (share of rec-pairs per anchor whose "
    "brands differ - the filter-bubble metric). These are the offline "
    "evals that complement accuracy (ndcg_retrieval_eval) in any "
    "recommender review. Plan: co-occurrence keyed aggregate, top-3 "
    "window PARTITIONED by anchor, rec-pair self-join bounded at "
    "C(3,2)=3 rows per anchor, two broadcast brand lookups.",
)
def rec_coverage_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = load_table(spark, sf_dir, "part")
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("anchor"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("rec"))
    co = (
        a.join(b, "k")
        .filter(F.col("anchor") != F.col("rec"))
        .groupBy("anchor", "rec")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("anchor").orderBy(F.col("c").desc(), F.col("rec"))
    recs = (
        co.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("anchor", "rec", "rk")
    )
    from kyuubi_spark.caching import persisted

    recs = persisted(recs)
    n_catalog = part.count()
    cov = recs.agg(
        F.count("*").cast("bigint").alias("n_recs"),
        F.countDistinct("rec").cast("bigint").alias("n_rec_items"),
    )
    r2 = recs.select(
        F.col("anchor"), F.col("rec").alias("rec2"), F.col("rk").alias("rk2")
    )
    brand = part.select("p_partkey", "p_brand")
    pairs = (
        recs.join(r2, "anchor")
        .filter(F.col("rk") < F.col("rk2"))
        .join(
            brand.withColumnRenamed("p_partkey", "rec").withColumnRenamed(
                "p_brand", "brand_a"
            ),
            "rec",
        )
        .join(
            brand.withColumnRenamed("p_partkey", "rec2").withColumnRenamed(
                "p_brand", "brand_b"
            ),
            "rec2",
        )
        .select(
            F.when(F.col("brand_a") != F.col("brand_b"), 1)
            .otherwise(0)
            .alias("diff")
        )
    )
    ild = pairs.agg(
        F.sum("diff").alias("n_diff"), F.count("*").alias("n_pairs")
    )
    return (
        cov.crossJoin(F.broadcast(ild))
        .select(
            "n_recs",
            "n_rec_items",
            dround(
                F.col("n_rec_items").cast("double") / F.lit(n_catalog), 6
            ).alias("catalog_coverage"),
            dround(
                F.col("n_diff").cast("double") / F.col("n_pairs"), 6
            ).alias("intra_list_diversity"),
        )
    )


@query(
    "peak_concurrency_sessions",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR date_diff('microsecond', LAG(ts) OVER w, ts)
                       >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid,
             ts
      FROM g),
    sess AS (
      SELECT user_id, sid, MIN(ts) AS s_start,
             MAX(ts) + INTERVAL 30 MINUTE AS s_end
      FROM s GROUP BY 1, 2),
    ev AS (
      SELECT (epoch_us(s_start)
              - epoch_us(TIMESTAMP '2024-01-01')) * 2 + 1 AS ordk,
             1 AS delta
      FROM sess
      UNION ALL
      SELECT (epoch_us(s_end)
              - epoch_us(TIMESTAMP '2024-01-01')) * 2, -1
      FROM sess),
    r AS (
      SELECT ordk, delta,
             SUM(delta) OVER (ORDER BY ordk, delta
               ROWS UNBOUNDED PRECEDING) AS running
      FROM ev)
    SELECT CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions,
           CAST(MAX(running) AS BIGINT) AS peak_concurrency,
           CAST(to_timestamp((MIN(CASE WHEN running = (
                  SELECT MAX(running) FROM r) THEN ordk END) // 2
                  + epoch_us(TIMESTAMP '2024-01-01')) / 1000000.0)
                AS TIMESTAMP) AS peak_first_ts
    FROM r
    """,
    doc="Peak concurrency over user sessions (the capacity-planning "
    "number: most sessions alive at one instant): sessionize by 30-min "
    "gaps (user-keyed windows), emit +1/-1 boundary events on a packed "
    "(micros*2 + type) total order — ends sort before starts at the "
    "same instant, so back-to-back sessions never double-count — and "
    "take the max of the EXACT GLOBAL running sum. Spark computes that "
    "prefix sum with the DISTRIBUTED scan primitive (operators/"
    "ranking.py global_running_sum: percentile range-buckets + "
    "per-bucket cumsum + 64 bounded offsets), so the event-scaled "
    "sequence never lands in one task — the oracle uses the "
    "single-partition SUM OVER the primitive replaces.",
)
def peak_concurrency_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.operators.ranking import global_running_sum
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    g = ev.select("user_id", "ts", "event_id").withColumn(
        "new_session",
        F.when(
            lag_ts.isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(lag_ts.cast("timestamp"))
                >= 1_800_000_000
            ),
            1,
        ).otherwise(0),
    )
    s = g.withColumn(
        "sid",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    from kyuubi_spark.caching import persisted

    # PERSIST + materialize the session relation once (r14): three
    # consumers scan it (the +1 starts branch, the -1 ends branch and
    # the n_sessions count) — unpersisted, each re-ran the full
    # sessionize window pipeline, so the expensive user-window stage
    # executed 3x.  The count doubles as the materializing action.
    sess = persisted(
        s.groupBy("user_id", "sid").agg(
            F.min("ts").alias("s_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTE")).alias("s_end"),
        )
    )
    n_sessions = sess.count()
    base = F.unix_micros(F.lit("2024-01-01").cast("timestamp"))
    starts = sess.select(
        (
            (F.unix_micros(F.col("s_start").cast("timestamp")) - base) * 2
            + 1
        ).alias("ordk"),
        F.lit(1).alias("delta"),
    )
    ends = sess.select(
        (
            (F.unix_micros(F.col("s_end").cast("timestamp")) - base) * 2
        ).alias("ordk"),
        F.lit(-1).alias("delta"),
    )
    evts = starts.unionAll(ends)
    run, _total = global_running_sum(
        evts, [("ordk", "asc"), ("delta", "asc")], "delta", sum_col="running"
    )
    peak = run.agg(F.max("running").alias("p"))
    out = (
        run.join(F.broadcast(peak), F.col("running") == F.col("p"))
        .agg(F.min("ordk").alias("first_ordk"), F.max("p").alias("peak"))
        .select(
            F.lit(n_sessions).cast("bigint").alias("n_sessions"),
            F.col("peak").cast("bigint").alias("peak_concurrency"),
            F.timestamp_micros(
                (F.col("first_ordk") / 2).cast("bigint") + base
            ).cast("timestamp_ntz").alias("peak_first_ts"),
        )
    )
    return out


@query(
    "business_days_latency",
    oracle="""
    WITH f AS (
      SELECT o.o_orderpriority,
             CAST(l.l_shipdate AS DATE) AS ship,
             CAST(o.o_orderdate AS DATE) AS ord
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate),
    wd AS (
      SELECT o_orderpriority,
             (date_diff('day', ord, ship) + 1)
             - 2 * (date_diff('week', date_trunc('week', ord),
                              date_trunc('week', ship)))
             - (CASE WHEN dayofweek(ord) = 0 THEN 1 ELSE 0 END)
             - (CASE WHEN dayofweek(ship) = 6 THEN 1 ELSE 0 END)
               AS bdays
      FROM f)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_shipments,
           ROUND(SUM(bdays) / CAST(COUNT(*) AS DOUBLE), 6)
             AS avg_business_days,
           CAST(MAX(bdays) AS BIGINT) AS max_business_days
    FROM wd GROUP BY 1 ORDER BY o_orderpriority
    """,
    doc="Ship latency in BUSINESS days by order priority: the SLA view "
    "ops teams actually track (weekend-blind calendar latency "
    "systematically overstates fast lanes). Weekday count is the "
    "closed-form inclusive formula — span days minus 2 per crossed "
    "week boundary, minus edge corrections for Sunday starts and "
    "Saturday ends — pure integer date arithmetic, identical in both "
    "engines, NO calendar-table join and no per-row iteration. One "
    "orderkey equi-join + one priority-keyed aggregate.",
)
def business_days_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    f = (
        li.select("l_orderkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            F.col("l_shipdate").cast("date").alias("ship"),
            F.col("o_orderdate").cast("date").alias("ord"),
        )
    )
    # DuckDB dayofweek: 0=Sunday..6=Saturday; Spark dayofweek: 1=Sunday..7
    weeks_crossed = F.floor(
        F.datediff(F.date_trunc("week", F.col("ship")),
                   F.date_trunc("week", F.col("ord"))) / 7
    )
    bdays = (
        (F.datediff(F.col("ship"), F.col("ord")) + 1)
        - 2 * weeks_crossed
        - F.when(F.dayofweek("ord") == 1, 1).otherwise(0)
        - F.when(F.dayofweek("ship") == 7, 1).otherwise(0)
    )
    wd = f.select("o_orderpriority", bdays.alias("bdays"))
    return (
        wd.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_shipments"),
            dround(F.sum("bdays") / F.count("*").cast("double"), 6).alias(
                "avg_business_days"
            ),
            F.max("bdays").cast("bigint").alias("max_business_days"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "ks_segment_matrix",
    oracle="""
    WITH f AS (
      SELECT c.c_mktsegment AS seg,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) // 100000
               AS bin
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    cnt AS (SELECT seg, bin, COUNT(*) AS c FROM f GROUP BY 1, 2),
    tot AS (SELECT seg, SUM(c) AS t FROM cnt GROUP BY 1),
    pairs AS (
      SELECT a.seg AS s1, b.seg AS s2, a.t AS t1, b.t AS t2
      FROM tot a JOIN tot b ON a.seg < b.seg),
    axis AS (SELECT DISTINCT bin FROM cnt),
    grid AS (
      SELECT p.s1, p.s2, p.t1, p.t2, x.bin,
             COALESCE(c1.c, 0) AS c1, COALESCE(c2.c, 0) AS c2
      FROM pairs p CROSS JOIN axis x
      LEFT JOIN cnt c1 ON c1.seg = p.s1 AND c1.bin = x.bin
      LEFT JOIN cnt c2 ON c2.seg = p.s2 AND c2.bin = x.bin),
    cum AS (
      SELECT s1, s2, t1, t2, bin,
             SUM(c1) OVER (PARTITION BY s1, s2 ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS k1,
             SUM(c2) OVER (PARTITION BY s1, s2 ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS k2
      FROM grid)
    SELECT s1, s2,
           CAST(MAX(t1) AS BIGINT) AS n1, CAST(MAX(t2) AS BIGINT) AS n2,
           ROUND(CAST(MAX(ABS(k1 * t2 - k2 * t1)) AS DOUBLE)
                 / (MAX(t1) * MAX(t2)), 6) AS ks_stat
    FROM cum GROUP BY 1, 2 ORDER BY s1, s2
    """,
    doc="Pairwise two-sample KS matrix across market segments (order-"
    "value distributions, 1000-dollar bins): the drift-triage view "
    "that generalizes ks_two_sample from one comparison to all "
    "C(5,2) = 10, sharing ONE binned count relation. The supremum "
    "|F1 - F2| is found as an EXACT INTEGER argmax of "
    "|k1*t2 - k2*t1| (cross-multiplied cumulative counts - no float "
    "enters until the single final division), and every cumulative "
    "window partitions on the segment PAIR, so nothing is "
    "single-partition at scale; the grid is pairs x bins (bounded by "
    "the bin range), built from broadcast-sized relations.",
)
def ks_segment_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    f = orders.join(
        cust.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 100000
        ).alias("bin"),
    )
    cnt = f.groupBy("seg", "bin").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("seg").agg(F.sum("c").alias("t"))
    a = tot.select(F.col("seg").alias("s1"), F.col("t").alias("t1"))
    b = tot.select(F.col("seg").alias("s2"), F.col("t").alias("t2"))
    pairs = a.join(b, F.col("s1") < F.col("s2"))
    axis = cnt.select("bin").distinct()
    grid = (
        F.broadcast(pairs)
        .crossJoin(axis)
        .join(
            cnt.select(
                F.col("seg").alias("s1"), F.col("bin").alias("bin"),
                F.col("c").alias("c1"),
            ),
            ["s1", "bin"],
            "left",
        )
        .join(
            cnt.select(
                F.col("seg").alias("s2"), F.col("bin").alias("bin"),
                F.col("c").alias("c2"),
            ),
            ["s2", "bin"],
            "left",
        )
        .fillna(0, subset=["c1", "c2"])
    )
    w = Window.partitionBy("s1", "s2").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.select(
        "s1", "s2", "t1", "t2",
        F.sum("c1").over(w).alias("k1"),
        F.sum("c2").over(w).alias("k2"),
    )
    return (
        cum.groupBy("s1", "s2")
        .agg(
            F.max("t1").cast("bigint").alias("n1"),
            F.max("t2").cast("bigint").alias("n2"),
            dround(
                F.max(
                    F.abs(F.col("k1") * F.col("t2") - F.col("k2") * F.col("t1"))
                ).cast("double")
                / (F.max("t1") * F.max("t2")),
                6,
            ).alias("ks_stat"),
        )
        .orderBy("s1", "s2")
    )


@query(
    "gini_by_brand",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand, l.l_partkey,
             SUM(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
               AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2),
    rk AS (
      SELECT p_brand, cents,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY cents, l_partkey) AS i,
             COUNT(*) OVER (PARTITION BY p_brand) AS n,
             SUM(cents) OVER (PARTITION BY p_brand) AS s
      FROM rev)
    SELECT p_brand, CAST(MAX(n) AS BIGINT) AS n_parts,
           ROUND(2.0 * SUM(i * cents) / (MAX(n) * MAX(s))
                 - (MAX(n) + 1.0) / MAX(n), 6) AS gini
    FROM rk GROUP BY 1 ORDER BY p_brand
    """,
    doc="Per-brand Gini coefficient of part-level revenue concentration "
    "— the grouped form of spend_gini_lorenz (one Gini per brand in a "
    "single pass instead of one global curve): classic rank formula "
    "G = 2*sum(i*x_i)/(n*sum_x) - (n+1)/n over cents-exact revenues, "
    "ranks and totals from windows PARTITIONED by brand (uniform "
    "group key — never a corpus-wide sort), ties broken by partkey "
    "for a deterministic ranking in both engines.",
)
def gini_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(
            part.select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
            ).alias("cents")
        )
    )
    wo = Window.partitionBy("p_brand").orderBy("cents", "l_partkey")
    wp = Window.partitionBy("p_brand")
    rk = rev.select(
        "p_brand",
        "cents",
        F.row_number().over(wo).alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("cents").over(wp).alias("s"),
    )
    return (
        rk.groupBy("p_brand")
        .agg(
            F.max("n").cast("bigint").alias("n_parts"),
            dround(
                F.lit(2.0) * F.sum(F.col("i") * F.col("cents"))
                / (F.max("n") * F.max("s"))
                - (F.max("n") + F.lit(1.0)) / F.max("n"),
                6,
            ).alias("gini"),
        )
        .orderBy("p_brand")
    )


@query(
    "doremi_domain_reweight",
    oracle="""
    WITH tok AS (
      SELECT source, word
      FROM (SELECT source, unnest(string_split(text, ' ')) AS word
            FROM documents)
      WHERE length(word) >= 1),
    sw AS (SELECT source, word, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    gw AS (SELECT word, SUM(c) AS g FROM sw GROUP BY 1),
    gt AS (SELECT SUM(g) AS gn FROM gw),
    st AS (SELECT source, SUM(c) AS sn FROM sw GROUP BY 1),
    hx AS (
      SELECT sw.source,
             -SUM((CAST(sw.c AS DOUBLE) / st.sn)
                  * LN(CAST(gw.g AS DOUBLE) / gt.gn)) AS h
      FROM sw JOIN gw ON gw.word = sw.word
      JOIN st ON st.source = sw.source, gt
      GROUP BY 1, st.sn, gt.gn),
    ew AS (SELECT source, h, EXP(0.1 * h) AS raw FROM hx),
    z AS (SELECT SUM(raw) AS z FROM ew)
    SELECT source,
           ROUND(h, 6) AS cross_entropy,
           ROUND(raw / z.z, 6) AS domain_weight
    FROM ew, z
    ORDER BY source
    """,
    doc="DoReMi-style domain reweighting (one exponentiated-gradient "
    "step): each source's proxy excess loss is its token-level cross-"
    "entropy under the GLOBAL unigram LM, and the mixture weight is "
    "w ~ exp(eta * H_s) normalized (eta = 0.1) — upweight the domains "
    "the reference model finds hardest, the published recipe's "
    "one-step deterministic core. Plan: one (source, word) keyed "
    "count, the global word counts broadcast back, per-source "
    "entropy sums (vocab-bounded), a scalar normalizer broadcast — "
    "all keyed aggregates, corpus touched once.",
)
def doremi_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") >= 1)
    sw = tok.groupBy("source", "word").agg(F.count("*").alias("c"))
    gw = sw.groupBy("word").agg(F.sum("c").alias("g"))
    gn = gw.agg(F.sum("g").alias("gn"))
    st = sw.groupBy("source").agg(F.sum("c").alias("sn"))
    hx = (
        sw.join(F.broadcast(gw), "word")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(gn))
        .groupBy("source")
        .agg(
            (
                -F.sum(
                    (F.col("c").cast("double") / F.col("sn"))
                    * F.log(F.col("g").cast("double") / F.col("gn"))
                )
            ).alias("h")
        )
    )
    ew = hx.select(
        "source", "h", F.exp(F.lit(0.1) * F.col("h")).alias("raw")
    )
    z = ew.agg(F.sum("raw").alias("z"))
    return (
        ew.crossJoin(F.broadcast(z))
        .select(
            "source",
            dround(F.col("h"), 6).alias("cross_entropy"),
            dround(F.col("raw") / F.col("z"), 6).alias("domain_weight"),
        )
        .orderBy("source")
    )


@query(
    "annotator_agreement_kappa",
    oracle="""
    WITH ann AS (
      SELECT vec_id, label AS l1,
             CASE WHEN strpos('0123',
                    substr(md5('ann:' || vec_id), 1, 1)) > 0
                  THEN (label + 1) % 10 ELSE label END AS l2
      FROM embeddings),
    conf AS (SELECT l1, l2, COUNT(*) AS c FROM ann GROUP BY 1, 2),
    n AS (SELECT SUM(c) AS n FROM conf),
    diag AS (SELECT COALESCE(SUM(c), 0) AS d FROM conf WHERE l1 = l2),
    marg AS (
      SELECT COALESCE(SUM(r.rc * co.cc), 0) AS rc_cc
      FROM (SELECT l1, SUM(c) AS rc FROM conf GROUP BY 1) r
      JOIN (SELECT l2, SUM(c) AS cc FROM conf GROUP BY 1) co
        ON co.l2 = r.l1)
    SELECT CAST(n.n AS BIGINT) AS n_items,
           ROUND(CAST(diag.d AS DOUBLE) / n.n, 6) AS observed_agreement,
           ROUND(CAST(marg.rc_cc AS DOUBLE) / (n.n * n.n), 6)
             AS expected_agreement,
           ROUND(CAST(n.n * diag.d - marg.rc_cc AS DOUBLE)
                 / (n.n * n.n - marg.rc_cc), 6) AS cohens_kappa
    FROM n, diag, marg
    """,
    doc="Cohen's kappa inter-annotator agreement: a second synthetic "
    "annotator disagrees on a deterministic 25% of items (md5-parity "
    "selection, +1 mod 10 label shift), and kappa is computed from "
    "the exact integer confusion matrix via the cross-multiplied "
    "form (n*diag - sum(row*col)) / (n^2 - sum(row*col)) — float "
    "enters only in the final divisions. The label-quality gate "
    "every human-annotation pipeline reports before training on the "
    "labels. Plan: one keyed confusion aggregate (<=100 cells), "
    "marginals joined cell-wise, three scalar reductions.",
)
def annotator_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    flip = F.substring(F.md5(F.concat(F.lit("ann:"), F.col("vec_id"))), 1, 1)
    ann = emb.select(
        "vec_id",
        F.col("label").alias("l1"),
        F.when(
            flip.isin("0", "1", "2", "3"), (F.col("label") + 1) % 10
        ).otherwise(F.col("label")).alias("l2"),
    )
    conf = ann.groupBy("l1", "l2").agg(F.count("*").alias("c"))
    n = conf.agg(F.sum("c").alias("n"))
    diag = conf.filter(F.col("l1") == F.col("l2")).agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("d")
    )
    r = conf.groupBy("l1").agg(F.sum("c").alias("rc"))
    co = conf.groupBy("l2").agg(F.sum("c").alias("cc"))
    marg = (
        r.join(co, F.col("l2") == F.col("l1"))
        .agg(F.coalesce(F.sum(F.col("rc") * F.col("cc")), F.lit(0))
             .alias("rc_cc"))
    )
    return (
        n.crossJoin(F.broadcast(diag))
        .crossJoin(F.broadcast(marg))
        .select(
            F.col("n").cast("bigint").alias("n_items"),
            dround(F.col("d").cast("double") / F.col("n"), 6).alias(
                "observed_agreement"
            ),
            dround(
                F.col("rc_cc").cast("double") / (F.col("n") * F.col("n")), 6
            ).alias("expected_agreement"),
            dround(
                (F.col("n") * F.col("d") - F.col("rc_cc")).cast("double")
                / (F.col("n") * F.col("n") - F.col("rc_cc")),
                6,
            ).alias("cohens_kappa"),
        )
    )


@query(
    "pass_at_k_estimator",
    oracle="""
    WITH t AS (
      SELECT doc_id, 10 AS n,
             CAST((doc_id * 7 + n_chars) % 11 AS BIGINT) AS c
      FROM documents),
    est AS (
      SELECT doc_id, k,
             1.0 - list_product(list_transform(generate_series(0, k - 1),
                     j -> CAST(n - c - j AS DOUBLE)))
                   / list_product(list_transform(generate_series(0, k - 1),
                     j -> CAST(n - j AS DOUBLE))) AS p
      FROM t, (SELECT unnest([1, 5, 10]) AS k)
      WHERE n - c - (k - 1) >= 0
      UNION ALL
      SELECT doc_id, k, 1.0
      FROM t, (SELECT unnest([1, 5, 10]) AS k)
      WHERE n - c - (k - 1) < 0)
    SELECT CAST(k AS INTEGER) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_tasks,
           ROUND(SUM(p) / COUNT(*), 6) AS pass_at_k
    FROM est GROUP BY 1 ORDER BY k
    """,
    doc="Unbiased pass@k estimator (Chen et al. 2021, the HumanEval "
    "combinatorial formula 1 - C(n-c,k)/C(n,k)): per task, n = 10 "
    "attempts with a deterministic correct-count, the binomial ratio "
    "evaluated as an EXACT falling-factorial product (row-local "
    "integer list fold — no factorial overflow, no log-gamma "
    "approximation; the n-c < k branch short-circuits to 1), then "
    "averaged per k in one keyed aggregate. The eval-pipeline "
    "aggregation every code-model benchmark reports. Map-side "
    "explode x3 + one aggregate; no joins.",
)
def pass_at_k_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.lit(10).alias("n"),
        ((F.col("doc_id") * 7 + F.col("n_chars")) % 11).cast("bigint")
        .alias("c"),
    ).select(
        "doc_id", "n", "c",
        F.explode(F.array(F.lit(1), F.lit(5), F.lit(10))).alias("k"),
    )
    num = F.aggregate(
        F.expr("transform(sequence(0, k - 1), j -> double(n - c - j))"),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    den = F.aggregate(
        F.expr("transform(sequence(0, k - 1), j -> double(n - j))"),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    est = t.select(
        "doc_id",
        "k",
        F.when(F.col("n") - F.col("c") - (F.col("k") - 1) < 0, F.lit(1.0))
        .otherwise(F.lit(1.0) - num / den)
        .alias("p"),
    )
    return (
        est.groupBy(F.col("k").cast("int").alias("k"))
        .agg(
            F.count("*").cast("bigint").alias("n_tasks"),
            dround(F.sum("p") / F.count("*"), 6).alias("pass_at_k"),
        )
        .orderBy("k")
    )


@query(
    "attribution_time_decay",
    oracle="""
    WITH p AS (
      SELECT user_id, event_id AS pid, ts AS pts
      FROM events WHERE event_type = 'purchase'),
    t AS (
      SELECT p.pid, e.event_type,
             EXP(-((epoch_us(p.pts) - epoch_us(e.ts))
                   / (3.0 * 86400000000.0))) AS w
      FROM p JOIN events e
        ON e.user_id = p.user_id
       AND e.event_type <> 'purchase'
       AND e.ts < p.pts
       AND e.ts >= p.pts - INTERVAL 7 DAY),
    z AS (SELECT pid, SUM(w) AS z FROM t GROUP BY 1)
    SELECT t.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           ROUND(SUM(t.w / z.z), 4) AS credit
    FROM t JOIN z ON z.pid = t.pid
    GROUP BY 1 ORDER BY t.event_type
    """,
    doc="Time-decay multi-touch attribution: every non-purchase touch "
    "in the 7 days before a conversion earns weight exp(-age/3d), "
    "normalized per conversion, and credit rolls up by channel "
    "(event type) — the exponential-decay sibling of the positional "
    "models in attribution_touchpoints, the default in most marketing "
    "stacks. Decay weights are row-local IEEE exp of exact integer "
    "microsecond ages (identical both engines); normalizers are one "
    "conversion-keyed aggregate joined back. Scale: the touch "
    "relation shuffles on user then conversion id - no window, no "
    "explode; credit is one final keyed aggregate (dround 4 absorbs "
    "relational float-sum ordering).",
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    e = ev.filter(F.col("event_type") != "purchase")
    t = p.join(
        e,
        (F.col("user_id") == F.col("pu"))
        & (F.col("ts") < F.col("pts"))
        & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
    ).select(
        "pid",
        "event_type",
        F.exp(
            -(
                (
                    F.unix_micros(F.col("pts").cast("timestamp"))
                    - F.unix_micros(F.col("ts").cast("timestamp"))
                ).cast("double")
                / F.lit(3.0 * 86400000000.0)
            )
        ).alias("w"),
    )
    z = t.groupBy("pid").agg(F.sum("w").alias("z"))
    return (
        t.join(z, "pid")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_touches"),
            dround(F.sum(F.col("w") / F.col("z")), 4).alias("credit"),
        )
        .orderBy("event_type")
    )


@query(
    "gains_lift_table",
    oracle="""
    WITH scored AS (
      SELECT o_orderkey,
             (o_orderkey * 2654435761) % 1000000 AS score,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
      FROM orders),
    rk AS (
      SELECT score, label,
             NTILE(10) OVER (ORDER BY score DESC, o_orderkey) AS decile,
             COUNT(*) OVER () AS n,
             SUM(label) OVER () AS pos
      FROM scored),
    dec AS (SELECT decile, label, n, pos FROM rk),
    per AS (
      SELECT decile, MAX(n) AS n, MAX(pos) AS pos,
             COUNT(*) AS n_rows, SUM(label) AS n_pos
      FROM dec GROUP BY 1),
    cum AS (
      SELECT decile, n_rows, n_pos, n, pos,
             SUM(n_pos) OVER (ORDER BY decile
                              ROWS UNBOUNDED PRECEDING) AS cum_pos,
             SUM(n_rows) OVER (ORDER BY decile
                               ROWS UNBOUNDED PRECEDING) AS cum_rows
      FROM per)
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_pos AS BIGINT) AS n_pos,
           ROUND(CAST(cum_pos AS DOUBLE) / pos, 6) AS cum_capture,
           ROUND(CAST(cum_pos AS DOUBLE) * n
                 / (CAST(cum_rows AS DOUBLE) * pos), 6) AS cum_lift
    FROM cum ORDER BY decile
    """,
    doc="Gains / lift table by score decile — the model-evaluation "
    "artifact behind 'top 20% of scores captures X% of positives' "
    "targeting decisions (complements score_calibration_bins, which "
    "checks probability honesty, not ranking power). Spark assigns "
    "deciles with the DISTRIBUTED exact ranker + closed-form NTILE "
    "from (rn, N) (operators/ranking.py - the oracle's single-"
    "partition ROW_NUMBER replaced by range-bucketed ranking), then "
    "one 10-row rollup; the only unpartitioned window runs over "
    "those 10 decile rows (audit-allowlisted, tpcds_q44 class). "
    "Capture and lift stay integer-exact until the final divisions.",
)
def gains_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.operators.ranking import global_row_numbers, ntile_expr
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    scored = orders.select(
        "o_orderkey",
        ((F.col("o_orderkey") * 2654435761) % 1000000).alias("score"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    ranked, n = global_row_numbers(
        scored, {"rn": [("score", "desc"), ("o_orderkey", "asc")]}
    )
    pos_row = scored.agg(F.sum("label").alias("pos")).first()
    pos = int(pos_row["pos"])
    dec = ranked.withColumn("decile", ntile_expr(F.col("rn"), n, 10))
    per = dec.groupBy("decile").agg(
        F.count("*").alias("n_rows"), F.sum("label").alias("n_pos")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        "n_rows",
        "n_pos",
        F.sum("n_pos").over(w).alias("cum_pos"),
        F.sum("n_rows").over(w).alias("cum_rows"),
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        dround(F.col("cum_pos").cast("double") / F.lit(pos), 6).alias(
            "cum_capture"
        ),
        dround(
            F.col("cum_pos").cast("double") * F.lit(n)
            / (F.col("cum_rows").cast("double") * F.lit(pos)),
            6,
        ).alias("cum_lift"),
    ).orderBy("decile")


@query(
    "lttb_downsample",
    oracle="""
    WITH pt AS (
      SELECT event_id, ts, value,
             (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 1000000
               AS x,
             CAST(round(value * 1000000, 0) AS BIGINT) AS y
      FROM events),
    b AS (SELECT *, x // 108000 AS bucket FROM pt),
    rep AS (
      SELECT bucket,
             CAST(round(SUM(x) * 1.0 / COUNT(*), 0) AS BIGINT) AS bx,
             CAST(round(SUM(y) * 1.0 / COUNT(*), 0) AS BIGINT) AS by
      FROM b GROUP BY 1),
    tri AS (
      SELECT b.bucket, b.event_id, b.ts, b.value,
             ABS((p.bx - nx.bx) * (b.y - p.by)
                 - (p.bx - b.x) * (nx.by - p.by)) AS area
      FROM b
      JOIN rep p ON p.bucket = b.bucket - 1
      JOIN rep nx ON nx.bucket = b.bucket + 1),
    sel AS (
      SELECT bucket, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY bucket
                                ORDER BY area DESC, event_id) AS rk
      FROM tri)
    SELECT CAST(bucket AS INTEGER) AS bucket,
           CAST(ts AS TIMESTAMP) AS sel_ts,
           ROUND(value, 6) AS sel_value
    FROM sel WHERE rk = 1 ORDER BY bucket
    """,
    doc="Largest-Triangle-Three-Buckets downsampling (the standard "
    "time-series visualization reducer): the month of events collapses "
    "to 24 fixed 30-hour buckets; each interior bucket keeps the point "
    "forming the LARGEST TRIANGLE with its neighbor buckets' mean "
    "points — preserving spikes and inflections a per-bucket mean "
    "would flatten. Parallel-friendly variant: anchors are bucket "
    "MEANS (not the sequentially-chosen previous point), so every "
    "bucket selects independently. Determinism: triangle areas are "
    "EXACT integer cross products (seconds x micro-values), ties "
    "break on event_id. Plan: one bucket rollup, two broadcast joins "
    "of the 24-row rep relation, argmax via bucket-partitioned "
    "window — no global sort, corpus touched once.",
)
def lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    base = F.unix_micros(F.lit("2024-01-01").cast("timestamp"))
    pt = ev.select(
        "event_id",
        "ts",
        "value",
        F.floor(
            (F.unix_micros(F.col("ts").cast("timestamp")) - base) / 1000000
        ).alias("x"),
        F.round(F.col("value") * 1000000, 0).cast("bigint").alias("y"),
    )
    b = pt.withColumn("bucket", F.floor(F.col("x") / 108000))
    rep = b.groupBy("bucket").agg(
        F.round(F.sum("x") * 1.0 / F.count("*"), 0).cast("bigint")
        .alias("bx"),
        F.round(F.sum("y") * 1.0 / F.count("*"), 0).cast("bigint")
        .alias("by"),
    )
    prev = rep.select(
        (F.col("bucket") + 1).alias("bucket"),
        F.col("bx").alias("pbx"),
        F.col("by").alias("pby"),
    )
    nxt = rep.select(
        (F.col("bucket") - 1).alias("bucket"),
        F.col("bx").alias("nbx"),
        F.col("by").alias("nby"),
    )
    tri = (
        b.join(F.broadcast(prev), "bucket")
        .join(F.broadcast(nxt), "bucket")
        .select(
            "bucket",
            "event_id",
            "ts",
            "value",
            F.abs(
                (F.col("pbx") - F.col("nbx")) * (F.col("y") - F.col("pby"))
                - (F.col("pbx") - F.col("x"))
                * (F.col("nby") - F.col("pby"))
            ).alias("area"),
        )
    )
    w = Window.partitionBy("bucket").orderBy(
        F.col("area").desc(), F.col("event_id")
    )
    return (
        tri.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("ts").cast("timestamp_ntz").alias("sel_ts"),
            dround(F.col("value"), 6).alias("sel_value"),
        )
        .orderBy("bucket")
    )


@query(
    "supplier_peak_open_lines",
    oracle="""
    WITH iv AS (
      SELECT l.l_suppkey, o.o_orderdate AS s, l.l_shipdate AS e
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate),
    ev AS (
      SELECT l_suppkey,
             (epoch_us(s) - epoch_us(TIMESTAMP '1995-01-01')) * 2 + 1
               AS ordk,
             1 AS delta
      FROM iv
      UNION ALL
      SELECT l_suppkey,
             (epoch_us(e) - epoch_us(TIMESTAMP '1995-01-01')) * 2, -1
      FROM iv),
    r AS (
      SELECT l_suppkey,
             SUM(delta) OVER (PARTITION BY l_suppkey
               ORDER BY ordk, delta ROWS UNBOUNDED PRECEDING) AS running
      FROM ev),
    pk AS (SELECT l_suppkey, MAX(running) AS peak FROM r GROUP BY 1)
    SELECT CAST(peak AS BIGINT) AS peak_open_lines,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM pk GROUP BY 1 ORDER BY peak_open_lines
    """,
    doc="Per-supplier peak concurrent open order lines (order date -> "
    "ship date intervals), reported as a peak-load distribution — the "
    "keyed form of peak_concurrency_sessions and the capacity view a "
    "fulfillment planner reads. Because the interval-stabbing "
    "running sum PARTITIONS on suppkey (uniform key), the whole "
    "operator is windows-on-keyed-shuffles — no global sequence, no "
    "driver state, no allowlist needed; ends sort before starts at "
    "equal instants via the packed (micros*2 + type) order.",
)
def supplier_peak_open_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    iv = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select(
            "l_suppkey",
            F.col("o_orderdate").alias("s"),
            F.col("l_shipdate").alias("e"),
        )
    )
    base = F.unix_micros(F.lit("1995-01-01").cast("timestamp"))
    starts = iv.select(
        "l_suppkey",
        (
            (F.unix_micros(F.col("s").cast("timestamp")) - base) * 2 + 1
        ).alias("ordk"),
        F.lit(1).alias("delta"),
    )
    ends = iv.select(
        "l_suppkey",
        ((F.unix_micros(F.col("e").cast("timestamp")) - base) * 2).alias(
            "ordk"
        ),
        F.lit(-1).alias("delta"),
    )
    w = Window.partitionBy("l_suppkey").orderBy("ordk", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = starts.unionAll(ends).withColumn(
        "running", F.sum("delta").over(w)
    )
    pk = r.groupBy("l_suppkey").agg(F.max("running").alias("peak"))
    return (
        pk.groupBy(F.col("peak").cast("bigint").alias("peak_open_lines"))
        .agg(F.count("*").cast("bigint").alias("n_suppliers"))
        .orderBy("peak_open_lines")
    )


@query(
    "dq_rule_scorecard",
    oracle="""
    SELECT * FROM (
      SELECT 'lineitem.ship_after_order' AS rule,
             CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(SUM(CASE WHEN l.l_shipdate >= o.o_orderdate
                           THEN 0 ELSE 1 END) AS BIGINT) AS n_violations
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'lineitem.qty_in_1_50', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50
                           THEN 0 ELSE 1 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem.discount_in_0_1', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 1
                           THEN 0 ELSE 1 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'orders.totalprice_positive', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
                  AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders.priority_in_domain', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH',
                        '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
                           THEN 0 ELSE 1 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'customer.acctbal_not_null', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN c_acctbal IS NOT NULL THEN 0 ELSE 1 END)
                  AS BIGINT)
      FROM customer)
    ORDER BY rule
    """,
    doc="Data-quality rule scorecard: six declarative cross-field and "
    "domain rules (temporal ordering, range, domain membership, "
    "non-null) evaluated as conditional aggregates — the table-"
    "contract check a pipeline gate runs before publishing a "
    "snapshot, complementing referential_integrity_audit's FK rules. "
    "Each rule costs a fraction of one scan (conditional sum, "
    "map-side combined); the only join is the one temporal rule's "
    "orderkey equi-join. Violations are exact counts, no sampling.",
)
def dq_rule_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def rule(name, df, ok):
        return df.agg(
            F.lit(name).alias("rule"),
            F.count("*").cast("bigint").alias("n_checked"),
            F.sum(F.when(ok, 0).otherwise(1)).cast("bigint").alias(
                "n_violations"
            ),
        )

    joined = li.select("l_orderkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        rule(
            "lineitem.ship_after_order",
            joined,
            F.col("l_shipdate") >= F.col("o_orderdate"),
        )
        .unionAll(
            rule(
                "lineitem.qty_in_1_50", li,
                F.col("l_quantity").between(1, 50),
            )
        )
        .unionAll(
            rule(
                "lineitem.discount_in_0_1", li,
                F.col("l_discount").between(0, 1),
            )
        )
        .unionAll(
            rule(
                "orders.totalprice_positive", orders,
                F.col("o_totalprice") > 0,
            )
        )
        .unionAll(
            rule(
                "orders.priority_in_domain", orders,
                F.col("o_orderpriority").isin(
                    "1-URGENT", "2-HIGH", "3-MEDIUM",
                    "4-NOT SPECIFIED", "5-LOW",
                ),
            )
        )
        .unionAll(
            rule(
                "customer.acctbal_not_null", cust,
                F.col("c_acctbal").isNotNull(),
            )
        )
        .orderBy("rule")
    )


@query(
    "slo_burn_rate_windows",
    oracle="""
    WITH h AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
             COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err
      FROM events GROUP BY 1),
    w AS (
      SELECT hour, n, err,
             SUM(n) OVER (ORDER BY hour
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS n6,
             SUM(err) OVER (ORDER BY hour
               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS err6
      FROM h),
    br AS (
      SELECT hour,
             err * 50.0 / n AS burn_1h,
             err6 * 50.0 / n6 AS burn_6h
      FROM w)
    SELECT hour,
           ROUND(burn_1h, 6) AS burn_1h,
           ROUND(burn_6h, 6) AS burn_6h,
           burn_1h > 14.4 AND burn_6h > 6.0 AS page_alert
    FROM br
    WHERE burn_1h > 14.4 AND burn_6h > 6.0
    ORDER BY hour
    """,
    doc="Multi-window SLO burn-rate alerting (the Google SRE workbook "
    "recipe): with a 98%-success SLO (error budget 2%), burn rate = "
    "error_rate / budget over 1h and 6h windows, and a page fires "
    "only when BOTH exceed their thresholds (14.4x / 6x) — the "
    "two-window AND that suppresses blips while catching sustained "
    "burns. Integer counts to the end (burn = err*50/n); the 6h "
    "window runs over the CALENDAR-BOUNDED hourly rollup (<= 720 "
    "rows/month, audit-allowlisted), never the raw stream.",
)
def slo_burn_rate_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("err"),
    )
    w6 = Window.orderBy("hour").rowsBetween(-5, 0)
    w = h.select(
        "hour", "n", "err",
        F.sum("n").over(w6).alias("n6"),
        F.sum("err").over(w6).alias("err6"),
    )
    br = w.select(
        "hour",
        (F.col("err") * 50.0 / F.col("n")).alias("b1"),
        (F.col("err6") * 50.0 / F.col("n6")).alias("b6"),
    )
    return (
        br.filter((F.col("b1") > 14.4) & (F.col("b6") > 6.0))
        .select(
            F.col("hour").cast("timestamp_ntz").alias("hour"),
            dround(F.col("b1"), 6).alias("burn_1h"),
            dround(F.col("b6"), 6).alias("burn_6h"),
            ((F.col("b1") > 14.4) & (F.col("b6") > 6.0)).alias(
                "page_alert"
            ),
        )
        .orderBy("hour")
    )


@query(
    "forecast_backtest_naive",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(round(value * 1000000, 0) AS BIGINT))
                  AS BIGINT) AS y
      FROM events GROUP BY 1),
    lagged AS (
      SELECT day, y,
             LAG(y, 1) OVER (ORDER BY day) AS f_naive,
             LAG(y, 7) OVER (ORDER BY day) AS f_snaive
      FROM d),
    e AS (SELECT * FROM lagged WHERE f_snaive IS NOT NULL)
    SELECT * FROM (
      SELECT 'naive_lag1' AS model,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(ABS(y - f_naive)) AS BIGINT) AS mae_micro,
             ROUND(SUM(ABS(y - f_naive) * 1.0 / y) / COUNT(*), 6)
               AS mape
      FROM e
      UNION ALL
      SELECT 'seasonal_lag7', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(ABS(y - f_snaive)) AS BIGINT),
             ROUND(SUM(ABS(y - f_snaive) * 1.0 / y) / COUNT(*), 6)
      FROM e)
    ORDER BY model
    """,
    doc="Forecast backtest on the daily value series: naive (lag-1) vs "
    "seasonal-naive (lag-7) one-step forecasts scored by MAE (exact "
    "integer micro-units) and MAPE over the common evaluable window — "
    "the baseline pair every forecasting effort must beat, and the "
    "skill ratio that justifies (or kills) a seasonal model. The lags "
    "run over the CALENDAR-BOUNDED daily rollup (<= 31 rows, audit-"
    "allowlisted); the corpus collapses in one keyed aggregate first.",
)
def forecast_backtest_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 1000000, 0).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    w = Window.orderBy("day")
    lagged = d.select(
        "day", "y",
        F.lag("y", 1).over(w).alias("f_naive"),
        F.lag("y", 7).over(w).alias("f_snaive"),
    ).filter(F.col("f_snaive").isNotNull())

    def model(name, fcol):
        return lagged.agg(
            F.lit(name).alias("model"),
            F.count("*").cast("bigint").alias("n_days"),
            F.sum(F.abs(F.col("y") - F.col(fcol)))
            .cast("bigint")
            .alias("mae_micro"),
            dround(
                F.sum(
                    F.abs(F.col("y") - F.col(fcol)) * F.lit(1.0) / F.col("y")
                )
                / F.count("*"),
                6,
            ).alias("mape"),
        )

    return (
        model("naive_lag1", "f_naive")
        .unionAll(model("seasonal_lag7", "f_snaive"))
        .orderBy("model")
    )


@query(
    "neyman_allocation_plan",
    oracle="""
    WITH s AS (
      SELECT c.c_mktsegment AS stratum,
             COUNT(*) AS nh,
             SUM(CAST(floor(round(o.o_totalprice * 100, 0) / 100)
                      AS BIGINT)) AS sx,
             SUM(CAST(floor(round(o.o_totalprice * 100, 0) / 100)
                      AS BIGINT)
                 * CAST(floor(round(o.o_totalprice * 100, 0) / 100)
                        AS BIGINT)) AS sxx
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1),
    sd AS (
      SELECT stratum, nh,
             SQRT(CAST(sxx AS DOUBLE) / nh
                  - POWER(CAST(sx AS DOUBLE) / nh, 2)) AS sh
      FROM s),
    wsum AS (SELECT SUM(nh * sh) AS z FROM sd),
    alloc AS (
      SELECT stratum, nh, sh,
             nh * sh / z * 1000 AS exact_alloc,
             CAST(FLOOR(nh * sh / z * 1000) AS BIGINT) AS base
      FROM sd, wsum),
    seats AS (SELECT 1000 - SUM(base) AS extra FROM alloc),
    rk AS (
      SELECT stratum, nh, sh, exact_alloc, base,
             ROW_NUMBER() OVER (ORDER BY exact_alloc - base DESC,
                                stratum) AS r
      FROM alloc)
    SELECT stratum,
           CAST(nh AS BIGINT) AS n_stratum,
           ROUND(sh, 6) AS stddev,
           CAST(base + CASE WHEN r <= (SELECT extra FROM seats)
                            THEN 1 ELSE 0 END AS BIGINT)
             AS neyman_n,
           CAST(ROUND(1000.0 * nh / (SELECT SUM(nh) FROM sd), 0)
                AS BIGINT) AS proportional_n
    FROM rk ORDER BY stratum
    """,
    doc="Neyman-optimal stratified sampling allocation: a 1000-row "
    "sample budget split across market segments proportional to "
    "N_h * S_h (population-std weighting — the design that minimizes "
    "estimator variance, vs the naive proportional split shown "
    "alongside). Per-stratum stds come from exact integer-dollar "
    "power sums in ONE keyed aggregate; seats round by largest "
    "remainder (rank over the 5 stratum rows, allowlist-bounded). "
    "The sampling-design planner behind stratified_sample.",
)
def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    d = _dollars("o_totalprice")
    s = (
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("stratum"))
        .agg(
            F.count("*").alias("nh"),
            F.sum(d).alias("sx"),
            F.sum(d * d).alias("sxx"),
        )
    )
    sd = s.select(
        "stratum",
        "nh",
        F.sqrt(
            F.col("sxx").cast("double") / F.col("nh")
            - F.pow(F.col("sx").cast("double") / F.col("nh"), F.lit(2.0))
        ).alias("sh"),
    )
    z = sd.agg(
        F.sum(F.col("nh") * F.col("sh")).alias("z"),
        F.sum("nh").alias("ntot"),
    )
    alloc = sd.crossJoin(F.broadcast(z)).select(
        "stratum", "nh", "sh", "ntot",
        (F.col("nh") * F.col("sh") / F.col("z") * 1000).alias("exact_alloc"),
        F.floor(F.col("nh") * F.col("sh") / F.col("z") * 1000)
        .cast("bigint")
        .alias("base"),
    )
    seats = alloc.agg((F.lit(1000) - F.sum("base")).alias("extra"))
    w = Window.orderBy(
        (F.col("exact_alloc") - F.col("base")).desc(), F.col("stratum")
    )
    rk = alloc.withColumn("r", F.row_number().over(w)).crossJoin(
        F.broadcast(seats)
    )
    return rk.select(
        "stratum",
        F.col("nh").cast("bigint").alias("n_stratum"),
        dround(F.col("sh"), 6).alias("stddev"),
        (
            F.col("base")
            + F.when(F.col("r") <= F.col("extra"), 1).otherwise(0)
        ).cast("bigint").alias("neyman_n"),
        F.round(F.lit(1000.0) * F.col("nh") / F.col("ntot"), 0)
        .cast("bigint")
        .alias("proportional_n"),
    ).orderBy("stratum")


@query(
    "brier_decomposition",
    oracle="""
    WITH scored AS (
      SELECT (o_orderkey * 2654435761) % 1000000 AS micro,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
      FROM orders),
    b AS (
      SELECT micro // 100000 AS bin, COUNT(*) AS nk,
             SUM(label) AS ok_, SUM(micro) AS sm
      FROM scored GROUP BY 1),
    tot AS (SELECT SUM(nk) AS n, SUM(ok_) AS o FROM b),
    parts AS (
      SELECT
        SUM(nk * POWER(CAST(sm AS DOUBLE) / nk / 1000000.0
                       - CAST(ok_ AS DOUBLE) / nk, 2)) / MAX(tot.n)
          AS reliability,
        SUM(nk * POWER(CAST(ok_ AS DOUBLE) / nk
                       - CAST(tot.o AS DOUBLE) / tot.n, 2)) / MAX(tot.n)
          AS resolution,
        (CAST(MAX(tot.o) AS DOUBLE) / MAX(tot.n))
          * (1 - CAST(MAX(tot.o) AS DOUBLE) / MAX(tot.n)) AS uncertainty
      FROM b, tot
      GROUP BY tot.n, tot.o)
    SELECT ROUND(reliability, 6) AS reliability,
           ROUND(resolution, 6) AS resolution,
           ROUND(uncertainty, 6) AS uncertainty,
           ROUND(reliability - resolution + uncertainty, 6)
             AS brier_score
    FROM parts
    """,
    doc="Murphy decomposition of the Brier score (reliability - "
    "resolution + uncertainty) over 10 probability bins — the "
    "diagnostic that splits a probabilistic model's error into "
    "calibration badness vs discriminative power vs irreducible base-"
    "rate noise (complements score_calibration_bins, which shows the "
    "reliability curve but not the decomposition). Same deterministic "
    "hash score and bins; every term is built from exact integer bin "
    "counts with float entering only in the final per-bin means. One "
    "keyed aggregate + one scalar rollup.",
)
def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    scored = orders.select(
        ((F.col("o_orderkey") * 2654435761) % 1000000).alias("micro"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    b = scored.groupBy(
        F.floor(F.col("micro") / 100000).alias("bin")
    ).agg(
        F.count("*").alias("nk"),
        F.sum("label").alias("ok_"),
        F.sum("micro").alias("sm"),
    )
    tot = b.agg(F.sum("nk").alias("n"), F.sum("ok_").alias("o"))
    j = b.crossJoin(F.broadcast(tot))
    rel = F.sum(
        F.col("nk")
        * F.pow(
            F.col("sm").cast("double") / F.col("nk") / 1000000.0
            - F.col("ok_").cast("double") / F.col("nk"),
            F.lit(2.0),
        )
    ) / F.max("n")
    res = F.sum(
        F.col("nk")
        * F.pow(
            F.col("ok_").cast("double") / F.col("nk")
            - F.col("o").cast("double") / F.col("n"),
            F.lit(2.0),
        )
    ) / F.max("n")
    unc = (F.max("o").cast("double") / F.max("n")) * (
        1 - F.max("o").cast("double") / F.max("n")
    )
    parts = j.agg(
        rel.alias("reliability"), res.alias("resolution"),
        unc.alias("uncertainty"),
    )
    return parts.select(
        dround(F.col("reliability"), 6).alias("reliability"),
        dround(F.col("resolution"), 6).alias("resolution"),
        dround(F.col("uncertainty"), 6).alias("uncertainty"),
        dround(
            F.col("reliability") - F.col("resolution")
            + F.col("uncertainty"),
            6,
        ).alias("brier_score"),
    )


@query(
    "mmr_rerank_topk",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             SQRT(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    q AS (SELECT v AS qv, nrm AS qn FROM e WHERE vec_id = 0),
    rel AS (
      SELECT e.vec_id,
             ROUND(list_sum(list_transform(generate_series(1, 64),
                     j -> e.v[j] * q.qv[j])) / (e.nrm * q.qn), 6) AS rel
      FROM e, q WHERE e.vec_id <> 0),
    cand AS (
      SELECT vec_id, rel,
             ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) AS rk
      FROM rel QUALIFY rk <= 10),
    sim AS (
      SELECT a.vec_id AS ai, b.vec_id AS bi,
             ROUND(list_sum(list_transform(generate_series(1, 64),
                     j -> ea.v[j] * eb.v[j])) / (ea.nrm * eb.nrm), 6)
               AS s
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id),
    s1 AS (
      SELECT vec_id, rel FROM cand
      ORDER BY rel DESC, vec_id LIMIT 1),
    r2 AS (
      SELECT c.vec_id, c.rel,
             0.5 * c.rel - 0.5 * sim.s AS mmr
      FROM cand c JOIN sim
        ON sim.ai = c.vec_id AND sim.bi = (SELECT vec_id FROM s1)
      WHERE c.vec_id <> (SELECT vec_id FROM s1)),
    s2 AS (SELECT vec_id, rel, mmr FROM r2
           ORDER BY mmr DESC, vec_id LIMIT 1),
    r3 AS (
      SELECT c.vec_id, c.rel,
             0.5 * c.rel - 0.5 * GREATEST(sa.s, sb.s) AS mmr
      FROM cand c
      JOIN sim sa ON sa.ai = c.vec_id
                 AND sa.bi = (SELECT vec_id FROM s1)
      JOIN sim sb ON sb.ai = c.vec_id
                 AND sb.bi = (SELECT vec_id FROM s2)
      WHERE c.vec_id NOT IN ((SELECT vec_id FROM s1),
                             (SELECT vec_id FROM s2))),
    s3 AS (SELECT vec_id, rel, mmr FROM r3
           ORDER BY mmr DESC, vec_id LIMIT 1)
    SELECT * FROM (
      SELECT 1 AS rank, vec_id, ROUND(rel, 6) AS relevance,
             ROUND(rel, 6) AS mmr_score
      FROM s1
      UNION ALL
      SELECT 2, vec_id, ROUND(rel, 6), ROUND(mmr, 6) FROM s2
      UNION ALL
      SELECT 3, vec_id, ROUND(rel, 6), ROUND(mmr, 6) FROM s3)
    ORDER BY rank
    """,
    doc="Maximal Marginal Relevance re-ranking (Carbonell & Goldstein "
    "1998 — the diversified-retrieval operator behind every 'varied "
    "results' requirement): from the top-10 cosine candidates for a "
    "query vector, greedily pick 3 maximizing 0.5*relevance - "
    "0.5*max-similarity-to-already-picked. Distributed shape: "
    "relevance scoring + top-k are corpus-scaled (row-local dots, "
    "TakeOrderedAndProject), then the greedy loop runs on the BOUNDED "
    "candidate set (a 10x10 rounded-cosine matrix — kmeans-centroid "
    "class driver state); all similarities rounded to 6 before "
    "selection so both engines pick identical champions, vec_id "
    "tiebreaks throughout.",
)
def mmr_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import pyround
    from kyuubi_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    e = emb.select(
        "vec_id",
        dbl.alias("v"),
        F.sqrt(
            F.aggregate(
                F.transform(dbl, lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("nrm"),
    )
    qrow = e.filter(F.col("vec_id") == 0).select("v", "nrm").first()
    qv, qn = list(qrow["v"]), float(qrow["nrm"])
    qarr = F.array(*[F.lit(x) for x in qv])
    rel = (
        e.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "v",
            "nrm",
            F.round(
                F.aggregate(
                    F.zip_with(F.col("v"), qarr, lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / (F.col("nrm") * F.lit(qn)),
                6,
            ).alias("rel"),
        )
    )
    cand = rel.orderBy(F.col("rel").desc(), F.col("vec_id")).limit(10)
    rows = cand.collect()  # BOUNDED: 10 candidates (centroid-class)
    import itertools

    vecs = {r["vec_id"]: (list(r["v"]), float(r["nrm"])) for r in rows}
    rels = {r["vec_id"]: float(r["rel"]) for r in rows}
    sims = {}
    for a, b in itertools.permutations(vecs, 2):
        va, na = vecs[a]
        vb, nb = vecs[b]
        dot = 0.0
        for x, y in zip(va, vb):
            dot += x * y
        sims[(a, b)] = pyround(dot / (na * nb), 6)
    picked = []
    out = []
    for rank in (1, 2, 3):
        best = None
        for c in sorted(vecs):
            if c in picked:
                continue
            if not picked:
                score = rels[c]
            else:
                score = 0.5 * rels[c] - 0.5 * max(
                    sims[(c, p)] for p in picked
                )
            if best is None or score > best[1]:
                best = (c, score)
        picked.append(best[0])
        out.append(
            (rank, best[0], pyround(rels[best[0]], 6),
             pyround(best[1], 6))
        )
    return spark.createDataFrame(
        out, "rank int, vec_id bigint, relevance double, mmr_score double"
    ).orderBy("rank")


@query(
    "isotonic_calibration_pava",
    oracle="""
    WITH scored AS (
      SELECT (o_orderkey * 2654435761) % 1000000 AS micro,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
      FROM orders),
    b AS (
      SELECT micro // 100000 AS bin, COUNT(*) AS nk, SUM(label) AS pk
      FROM scored GROUP BY 1),
    seg AS (
      SELECT j.bin AS j, k.bin AS k,
             SUM(i.pk) AS sp, SUM(i.nk) AS sn
      FROM b j JOIN b k ON k.bin >= j.bin
      JOIN b i ON i.bin BETWEEN j.bin AND k.bin
      GROUP BY 1, 2),
    inner_min AS (
      SELECT s.j, t.bin AS i,
             MIN(CAST(s.sp AS DOUBLE) / s.sn) AS mn
      FROM seg s JOIN b t ON s.j <= t.bin AND s.k >= t.bin
      GROUP BY 1, 2),
    iso AS (
      SELECT i, MAX(mn) AS iso_rate
      FROM inner_min WHERE j <= i
      GROUP BY 1)
    SELECT CAST(b.bin AS INTEGER) AS bin,
           CAST(b.nk AS BIGINT) AS n,
           ROUND(CAST(b.pk AS DOUBLE) / b.nk, 6) AS raw_rate,
           ROUND(iso.iso_rate, 6) AS iso_rate
    FROM b JOIN iso ON iso.i = b.bin
    ORDER BY bin
    """,
    doc="Isotonic calibration (PAVA) of the reliability curve, computed "
    "via the MINIMAX identity iso_i = max_{j<=i} min_{k>=i} "
    "mean(bins j..k) — equivalent to pool-adjacent-violators but "
    "expressible as pure relational algebra over the BOUNDED 10-bin "
    "rollup (a 10x10x10 interval grid of exact integer sums; float "
    "enters only in the interval-mean comparisons). The monotone "
    "recalibration every production scorer applies when "
    "score_calibration_bins shows non-monotone bins. Corpus-scaled "
    "work is one keyed bin aggregate; everything after is "
    "constant-size.",
)
def isotonic_calibration_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    scored = orders.select(
        ((F.col("o_orderkey") * 2654435761) % 1000000).alias("micro"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    b = scored.groupBy(
        F.floor(F.col("micro") / 100000).alias("bin")
    ).agg(F.count("*").alias("nk"), F.sum("label").alias("pk"))
    from kyuubi_spark.caching import persisted

    b = persisted(b)
    j = b.select(F.col("bin").alias("j"))
    k = b.select(F.col("bin").alias("k"))
    i = b.select(F.col("bin").alias("ib"), "nk", "pk")
    seg = (
        j.join(k, F.col("k") >= F.col("j"))
        .join(i, (F.col("ib") >= F.col("j")) & (F.col("ib") <= F.col("k")))
        .groupBy("j", "k")
        .agg(F.sum("pk").alias("sp"), F.sum("nk").alias("sn"))
    )
    t = b.select(F.col("bin").alias("i"))
    inner_min = (
        seg.join(t, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("j", "i")
        .agg(F.min(F.col("sp").cast("double") / F.col("sn")).alias("mn"))
    )
    iso = (
        inner_min.filter(F.col("j") <= F.col("i"))
        .groupBy("i")
        .agg(F.max("mn").alias("iso_rate"))
    )
    return (
        b.join(iso, F.col("bin") == F.col("i"))
        .select(
            F.col("bin").cast("int").alias("bin"),
            F.col("nk").cast("bigint").alias("n"),
            dround(F.col("pk").cast("double") / F.col("nk"), 6).alias(
                "raw_rate"
            ),
            dround(F.col("iso_rate"), 6).alias("iso_rate"),
        )
        .orderBy("bin")
    )


@query(
    "conformal_interval_naive",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(round(value * 1000000, 0) AS BIGINT))
                  AS BIGINT) AS y
      FROM events GROUP BY 1),
    f AS (
      SELECT day, y, LAG(y, 7) OVER (ORDER BY day) AS fc
      FROM d),
    resid AS (
      SELECT day, y, fc, ABS(y - fc) AS r,
             ROW_NUMBER() OVER (ORDER BY day) AS idx,
             COUNT(*) OVER () AS m
      FROM f WHERE fc IS NOT NULL),
    calib AS (SELECT * FROM resid WHERE idx <= m / 2),
    qr AS (
      SELECT r AS qhat FROM (
        SELECT r, ROW_NUMBER() OVER (ORDER BY r, day) AS rk,
               COUNT(*) OVER () AS n
        FROM calib)
      WHERE rk = CAST(CEIL((n + 1) * 0.9) AS BIGINT)),
    test AS (SELECT * FROM resid WHERE idx > m / 2)
    SELECT CAST((SELECT COUNT(*) FROM calib) AS BIGINT) AS n_calib,
           CAST((SELECT COUNT(*) FROM test) AS BIGINT) AS n_test,
           CAST((SELECT qhat FROM qr) AS BIGINT) AS qhat_micro,
           ROUND((SELECT SUM(CASE WHEN ABS(y - fc) <= (SELECT qhat
                    FROM qr) THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
                  FROM test), 6) AS test_coverage
    """,
    doc="Split conformal prediction interval for the seasonal-naive "
    "forecaster: the first half of evaluable days calibrates "
    "(qhat = the ceil((n+1)*0.9)-th order statistic of absolute "
    "residuals — the distribution-free 90% guarantee), the second "
    "half measures empirical coverage of y in fc +- qhat. The "
    "UQ wrapper modern forecast pipelines ship; residuals are exact "
    "integer micro-units and the order statistic is an exact rank "
    "selection, so both engines agree bit-for-bit. All windows run "
    "over the calendar-bounded daily rollup (allowlisted class).",
)
def conformal_interval_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from kyuubi_spark.functions.compat import pyround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 1000000, 0).cast("bigint"))
            .cast("bigint")
            .alias("y")
        )
        .orderBy("day")
        .collect()  # BOUNDED: calendar days
    )
    ys = [(r["day"], int(r["y"])) for r in d]
    resid = [
        (day, y, ys[i - 7][1], abs(y - ys[i - 7][1]))
        for i, (day, y) in enumerate(ys)
        if i >= 7
    ]
    m = len(resid)
    calib, test = resid[: m // 2], resid[m // 2:]
    n = len(calib)
    order = sorted(calib, key=lambda t: (t[3], t[0]))
    qhat = order[math.ceil((n + 1) * 0.9) - 1][3]
    covered = sum(1 for _, y, fc, _r in test if abs(y - fc) <= qhat)
    return spark.createDataFrame(
        [(n, len(test), qhat, pyround(covered / len(test), 6))],
        "n_calib bigint, n_test bigint, qhat_micro bigint, "
        "test_coverage double",
    )


@query(
    "emd_segment_matrix",
    oracle="""
    WITH f AS (
      SELECT c.c_mktsegment AS seg,
             CAST(round(o.o_totalprice * 100, 0) AS BIGINT) // 100000
               AS bin
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    cnt AS (SELECT seg, bin, COUNT(*) AS c FROM f GROUP BY 1, 2),
    tot AS (SELECT seg, SUM(c) AS t FROM cnt GROUP BY 1),
    pairs AS (
      SELECT a.seg AS s1, b.seg AS s2, a.t AS t1, b.t AS t2
      FROM tot a JOIN tot b ON a.seg < b.seg),
    axis AS (SELECT DISTINCT bin FROM cnt),
    grid AS (
      SELECT p.s1, p.s2, p.t1, p.t2, x.bin,
             COALESCE(c1.c, 0) AS c1, COALESCE(c2.c, 0) AS c2
      FROM pairs p CROSS JOIN axis x
      LEFT JOIN cnt c1 ON c1.seg = p.s1 AND c1.bin = x.bin
      LEFT JOIN cnt c2 ON c2.seg = p.s2 AND c2.bin = x.bin),
    cum AS (
      SELECT s1, s2, t1, t2, bin,
             SUM(c1) OVER (PARTITION BY s1, s2 ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS k1,
             SUM(c2) OVER (PARTITION BY s1, s2 ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS k2
      FROM grid)
    SELECT s1, s2,
           ROUND(CAST(SUM(ABS(k1 * t2 - k2 * t1)) AS DOUBLE)
                 / (MAX(t1) * MAX(t2)), 6) AS emd_bins
    FROM cum GROUP BY 1, 2 ORDER BY s1, s2
    """,
    doc="Pairwise 1-D earth mover's distance between segment order-"
    "value histograms (in bin units): EMD_1d = sum |F1 - F2| over the "
    "bin axis — the magnitude-aware companion to ks_segment_matrix's "
    "supremum (KS says IF distributions differ, EMD says HOW MUCH "
    "mass must move; same integer-exact cross-multiplied cumulative "
    "machinery, float only in the single final division). Same "
    "shared-grid plan: one binned count relation, pair-partitioned "
    "cumulative windows, 10 output rows.",
)
def emd_segment_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    f = orders.join(
        cust.select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 100000
        ).alias("bin"),
    )
    cnt = f.groupBy("seg", "bin").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("seg").agg(F.sum("c").alias("t"))
    a = tot.select(F.col("seg").alias("s1"), F.col("t").alias("t1"))
    b = tot.select(F.col("seg").alias("s2"), F.col("t").alias("t2"))
    pairs = a.join(b, F.col("s1") < F.col("s2"))
    axis = cnt.select("bin").distinct()
    grid = (
        F.broadcast(pairs)
        .crossJoin(axis)
        .join(
            cnt.select(F.col("seg").alias("s1"), "bin",
                       F.col("c").alias("c1")),
            ["s1", "bin"], "left",
        )
        .join(
            cnt.select(F.col("seg").alias("s2"), "bin",
                       F.col("c").alias("c2")),
            ["s2", "bin"], "left",
        )
        .fillna(0, subset=["c1", "c2"])
    )
    w = Window.partitionBy("s1", "s2").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.select(
        "s1", "s2", "t1", "t2",
        F.sum("c1").over(w).alias("k1"),
        F.sum("c2").over(w).alias("k2"),
    )
    return (
        cum.groupBy("s1", "s2")
        .agg(
            dround(
                F.sum(
                    F.abs(F.col("k1") * F.col("t2") - F.col("k2") * F.col("t1"))
                ).cast("double")
                / (F.max("t1") * F.max("t2")),
                6,
            ).alias("emd_bins")
        )
        .orderBy("s1", "s2")
    )


@query(
    "transition_entropy_profile",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS a,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS b
      FROM events),
    t AS (SELECT a, b, COUNT(*) AS c FROM seq WHERE b IS NOT NULL
          GROUP BY 1, 2),
    rowt AS (SELECT a, SUM(c) AS ra FROM t GROUP BY 1),
    h AS (
      SELECT t.a, rowt.ra,
             LN(CAST(rowt.ra AS DOUBLE))
             - SUM(t.c * LN(CAST(t.c AS DOUBLE))) / rowt.ra AS ha
      FROM t JOIN rowt ON rowt.a = t.a
      GROUP BY 1, 2)
    SELECT a AS from_type,
           CAST(ra AS BIGINT) AS n_transitions,
           ROUND(ha, 6) AS next_entropy_nats,
           ROUND(SUM(ha * ra) OVER () / SUM(ra) OVER (), 6)
             AS overall_conditional_entropy
    FROM h ORDER BY from_type
    """,
    doc="Next-event predictability profile: per from-state Shannon "
    "entropy of the transition distribution H(next | from) plus the "
    "weighted overall conditional entropy of the user-journey chain — "
    "the single number that says how predictable the event stream is "
    "(markov_transition_matrix gives the probabilities; this scores "
    "them). Entropies from exact integer transition counts via "
    "H = ln(n) - sum(c ln c)/n (ln of integers only); the 5-row "
    "grand-total window is state-space-bounded. User-keyed LEAD "
    "window, then two tiny aggregates.",
)
def transition_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("a"),
        F.lead("event_type").over(w).alias("b"),
    ).filter(F.col("b").isNotNull())
    t = seq.groupBy("a", "b").agg(F.count("*").alias("c"))
    h = t.groupBy("a").agg(
        F.sum("c").alias("ra"),
        (
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double")))
            / F.sum("c")
        ).alias("ha"),
    )
    wg = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return h.select(
        F.col("a").alias("from_type"),
        F.col("ra").cast("bigint").alias("n_transitions"),
        dround(F.col("ha"), 6).alias("next_entropy_nats"),
        dround(
            F.sum(F.col("ha") * F.col("ra")).over(wg)
            / F.sum("ra").over(wg),
            6,
        ).alias("overall_conditional_entropy"),
    ).orderBy("from_type")


@query(
    "binary_segmentation_split",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(round(SUM(value), 0) AS BIGINT) AS y
      FROM events GROUP BY 1),
    r AS (
      SELECT day, y,
             ROW_NUMBER() OVER (ORDER BY day) AS i,
             SUM(y) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cy,
             SUM(y * y) OVER (ORDER BY day
                              ROWS UNBOUNDED PRECEDING) AS cyy,
             COUNT(*) OVER () AS n,
             SUM(y) OVER () AS sy,
             SUM(y * y) OVER () AS syy
      FROM d),
    cand AS (
      SELECT day, i, n,
             (CAST(cyy AS DOUBLE) - CAST(cy AS DOUBLE) * cy / i)
             + (CAST(syy - cyy AS DOUBLE)
                - CAST(sy - cy AS DOUBLE) * (sy - cy) / (n - i))
               AS sse,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n
               AS sse0
      FROM r WHERE i < n),
    best AS (
      SELECT day, sse, sse0,
             ROW_NUMBER() OVER (ORDER BY sse, day) AS rk
      FROM cand)
    SELECT CAST(day AS TIMESTAMP) AS split_after_day,
           ROUND(sse0, 4) AS sse_unsplit,
           ROUND(sse, 4) AS sse_split,
           ROUND(1 - sse / sse0, 6) AS variance_explained
    FROM best WHERE rk = 1
    """,
    doc="Binary segmentation change-point (one split): the day "
    "boundary minimizing total within-segment SSE of the daily value "
    "series — the first recursion step of the classic segmentation "
    "family and CUSUM's model-based sibling (cusum_changepoint "
    "detects drift; this OPTIMIZES the split). SSE at every candidate "
    "split comes from prefix sums of exact integer y and y^2 (one "
    "pass, no per-split rescans — the O(n) trick); windows run over "
    "the calendar-bounded daily rollup (allowlisted class). Argmin "
    "ties break on day.",
)
def binary_segmentation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 0).cast("bigint").alias("y"))
    wo = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wg = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = d.select(
        "day",
        "y",
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.sum("y").over(wo).alias("cy"),
        F.sum(F.col("y") * F.col("y")).over(wo).alias("cyy"),
        F.count("*").over(wg).alias("n"),
        F.sum("y").over(wg).alias("sy"),
        F.sum(F.col("y") * F.col("y")).over(wg).alias("syy"),
    )
    cand = r.filter(F.col("i") < F.col("n")).select(
        "day",
        (
            (
                F.col("cyy").cast("double")
                - F.col("cy").cast("double") * F.col("cy") / F.col("i")
            )
            + (
                (F.col("syy") - F.col("cyy")).cast("double")
                - (F.col("sy") - F.col("cy")).cast("double")
                * (F.col("sy") - F.col("cy"))
                / (F.col("n") - F.col("i"))
            )
        ).alias("sse"),
        (
            F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy") / F.col("n")
        ).alias("sse0"),
    )
    best = cand.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.col("sse"), F.col("day"))),
    ).filter(F.col("rk") == 1)
    return best.select(
        F.col("day").cast("timestamp").alias("split_after_day"),
        dround(F.col("sse0"), 4).alias("sse_unsplit"),
        dround(F.col("sse"), 4).alias("sse_split"),
        dround(1 - F.col("sse") / F.col("sse0"), 6).alias(
            "variance_explained"
        ),
    )


@query(
    "exact_topk_twopass",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    c AS (SELECT word, COUNT(*) AS c FROM tok
          WHERE length(word) >= 1 GROUP BY 1),
    r AS (
      SELECT word, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rk
      FROM c)
    SELECT CAST(rk AS INTEGER) AS rk, word, CAST(c AS BIGINT) AS c
    FROM r WHERE rk <= 10 ORDER BY rk
    """,
    doc="EXACT top-10 heavy hitters by the classic TWO-PASS candidate "
    "protocol (the pattern that makes exact top-k affordable when key "
    "cardinality explodes): pass 1 computes LOCAL per-partition top-40 "
    "candidates inside an Arrow-batched mapInPandas (map-side, no "
    "shuffle of the long tail - a true global top-10 token is "
    "guaranteed to be a local top-10 in at least one partition, so "
    "the candidate union is a superset); pass 2 recounts ONLY the "
    "candidate set exactly via a broadcast semi-join and ranks it. "
    "Versus the one-shot groupBy the oracle runs, the shuffle carries "
    "O(partitions x k) candidate rows instead of every distinct key - "
    "the difference between shuffling 40M distinct tokens and 40 "
    "rows x partition at 100 TB. Complements approx_topk_cms (sketch, "
    "bounded error) with the exact two-scan answer.",
)
def exact_topk_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import Window

    from kyuubi_spark.caching import persisted
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    tok = persisted(
        docs.select(F.explode(F.split("text", " ")).alias("word")).filter(
            F.length("word") >= 1
        )
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one candidate list per TASK (partition): count locally, keep 40
        counts: dict = {}
        for pdf in batches:
            for w, n in pdf["word"].value_counts().items():
                counts[w] = counts.get(w, 0) + int(n)
        top = sorted(counts.items(), key=lambda t: (-t[1], t[0]))[:40]
        yield pd.DataFrame({"word": [w for w, _ in top]})

    cands = (
        tok.mapInPandas(local_topk, schema="word string")
        .distinct()
    )
    exact = (
        tok.join(F.broadcast(cands), "word", "left_semi")
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("word"))
    return (
        exact.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select(F.col("rk").cast("int").alias("rk"), "word",
                F.col("c").cast("bigint").alias("c"))
        .orderBy("rk")
    )


@query(
    "pinball_quantile_grid",
    oracle="""
    WITH x AS (
      SELECT p.p_brand,
             CAST(round(l.l_extendedprice * 100, 0) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    pctl AS (
      SELECT p_brand,
             CAST(round(quantile_cont(cents, 0.5), 0) AS BIGINT) AS q50,
             CAST(round(quantile_cont(cents, 0.7), 0) AS BIGINT) AS q70,
             CAST(round(quantile_cont(cents, 0.8), 0) AS BIGINT) AS q80,
             CAST(round(quantile_cont(cents, 0.9), 0) AS BIGINT) AS q90,
             CAST(round(quantile_cont(cents, 0.95), 0) AS BIGINT) AS q95
      FROM x GROUP BY 1),
    qs AS (
      SELECT p_brand, q50 AS cand, 0.5 AS q FROM pctl
      UNION ALL SELECT p_brand, q70, 0.7 FROM pctl
      UNION ALL SELECT p_brand, q80, 0.8 FROM pctl
      UNION ALL SELECT p_brand, q90, 0.9 FROM pctl
      UNION ALL SELECT p_brand, q95, 0.95 FROM pctl),
    loss AS (
      SELECT x.p_brand, qs.cand, qs.q,
             SUM(CASE WHEN x.cents >= qs.cand
                      THEN 9 * (x.cents - qs.cand)
                      ELSE 1 * (qs.cand - x.cents) END) AS pinball
      FROM x JOIN qs ON qs.p_brand = x.p_brand
      GROUP BY 1, 2, 3),
    best AS (
      SELECT p_brand, cand, q, pinball,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY pinball, cand) AS rk
      FROM loss)
    SELECT p_brand,
           CAST(cand AS BIGINT) AS fitted_p90_cents,
           ROUND(CAST(q AS DOUBLE), 2) AS source_quantile,
           CAST(pinball AS BIGINT) AS pinball_loss
    FROM best WHERE rk = 1 ORDER BY p_brand
    """,
    doc="Grouped quantile fit by PINBALL-LOSS grid search: for each "
    "brand, five candidate price points (the exact 50/70/80/90/95th "
    "percentiles) are scored with the tau = 0.9 pinball loss "
    "(9x penalty below, 1x above — all EXACT integer cents, so the "
    "argmin is deterministic) and the minimizer is reported — "
    "validating that the loss bottoms out at the true 0.9 quantile, "
    "the mechanism quantile-regression models train on. Plan: one "
    "partkey equi-join, a per-(brand, candidate) keyed loss aggregate "
    "(5x fan-out of the brand relation, broadcast candidates), argmin "
    "via brand-partitioned window.",
)
def pinball_quantile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    x = li.join(
        part.select("p_partkey", "p_brand"),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias(
            "cents"
        ),
    )
    from kyuubi_spark.caching import persisted

    x = persisted(x)
    # ONE array-percentile aggregate instead of five scalar percentile
    # aggregates (r13 optimization): the exact percentile aggregate
    # buffers the group's values once per aggregate expression, so the
    # array form does a fifth of the buffering/sorting work — identical
    # values (same function, same interpolation, evaluated on one
    # buffer).
    q_list = (0.5, 0.7, 0.8, 0.9, 0.95)
    qs = (
        x.groupBy("p_brand")
        .agg(
            F.expr(
                "percentile(cents, array("
                + ", ".join(f"{q}D" for q in q_list)
                + "))"
            ).alias("qarr")
        )
        .select(
            "p_brand",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.round(F.element_at("qarr", i + 1), 0)
                            .cast("bigint")
                            .alias("cand"),
                            F.lit(q).alias("q"),
                        )
                        for i, q in enumerate(q_list)
                    ]
                )
            ).alias("c"),
        )
        .select("p_brand", F.col("c.cand").alias("cand"),
                F.col("c.q").alias("q"))
    )
    loss = (
        x.join(F.broadcast(qs), "p_brand")
        .groupBy("p_brand", "cand", "q")
        .agg(
            F.sum(
                F.when(
                    F.col("cents") >= F.col("cand"),
                    9 * (F.col("cents") - F.col("cand")),
                ).otherwise(F.col("cand") - F.col("cents"))
            ).alias("pinball")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("pinball"), F.col("cand")
    )
    return (
        loss.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "p_brand",
            F.col("cand").cast("bigint").alias("fitted_p90_cents"),
            dround(F.col("q"), 2).alias("source_quantile"),
            F.col("pinball").cast("bigint").alias("pinball_loss"),
        )
        .orderBy("p_brand")
    )


@query(
    "anomaly_ensemble_vote",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(round(SUM(value), 0) AS BIGINT) AS y
      FROM events GROUP BY 1),
    stats AS (
      SELECT COUNT(*) AS n, SUM(y) AS sy, SUM(y * y) AS syy,
             CAST(round(quantile_cont(y, 0.25), 0) AS BIGINT) AS q1,
             CAST(round(quantile_cont(y, 0.5), 0) AS BIGINT) AS med,
             CAST(round(quantile_cont(y, 0.75), 0) AS BIGINT) AS q3
      FROM d),
    mad AS (
      SELECT CAST(round(quantile_cont(ABS(d.y - stats.med), 0.5), 0)
                  AS BIGINT) AS mad
      FROM d, stats),
    flags AS (
      SELECT d.day, d.y,
             ABS(d.y - CAST(stats.sy AS DOUBLE) / stats.n)
               > 2.0 * SQRT(CAST(stats.syy AS DOUBLE) / stats.n
                            - POWER(CAST(stats.sy AS DOUBLE)
                                    / stats.n, 2)) AS f_z,
             d.y < stats.q1 - 15 * (stats.q3 - stats.q1) / 10.0
               OR d.y > stats.q3 + 15 * (stats.q3 - stats.q1) / 10.0
               AS f_iqr,
             ABS(d.y - stats.med) > 2.0 * 1.4826 * mad.mad AS f_mad
      FROM d, stats, mad)
    SELECT CAST(day AS TIMESTAMP) AS day, CAST(y AS BIGINT) AS y,
           f_z, f_iqr, f_mad,
           CAST((CASE WHEN f_z THEN 1 ELSE 0 END
                 + CASE WHEN f_iqr THEN 1 ELSE 0 END
                 + CASE WHEN f_mad THEN 1 ELSE 0 END) AS INTEGER)
             AS votes
    FROM flags
    WHERE (CASE WHEN f_z THEN 1 ELSE 0 END
           + CASE WHEN f_iqr THEN 1 ELSE 0 END
           + CASE WHEN f_mad THEN 1 ELSE 0 END) >= 2
    ORDER BY day
    """,
    doc="Anomaly-detector ENSEMBLE over the daily value series: a day "
    "is surfaced only when at least 2 of 3 detectors agree — "
    "parametric z-score (mean/std from integer power sums), Tukey IQR "
    "fences, and robust MAD (1.4826 consistency constant) — the "
    "majority vote that suppresses each detector's characteristic "
    "false positives (z misses under heavy tails, IQR/MAD under-flag "
    "mild shifts). All thresholds from exact integer aggregates; "
    "quantiles are the engines' identical interpolated percentiles. "
    "One rollup + three scalar stats broadcast back, no windows.",
)
def anomaly_ensemble_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 0).cast("bigint").alias("y"))
    from kyuubi_spark.caching import persisted

    d = persisted(d)
    stats = d.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.round(F.expr("percentile(y, 0.25)"), 0).cast("bigint").alias("q1"),
        F.round(F.expr("percentile(y, 0.5)"), 0).cast("bigint").alias("med"),
        F.round(F.expr("percentile(y, 0.75)"), 0).cast("bigint").alias("q3"),
    )
    mad = (
        d.crossJoin(F.broadcast(stats))
        .agg(
            F.round(
                F.expr("percentile(abs(y - med), 0.5)"), 0
            ).cast("bigint").alias("mad")
        )
    )
    j = d.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(mad))
    mean = F.col("sy").cast("double") / F.col("n")
    std = F.sqrt(
        F.col("syy").cast("double") / F.col("n") - mean * mean
    )
    f_z = F.abs(F.col("y") - mean) > 2.0 * std
    iqr15 = 15 * (F.col("q3") - F.col("q1")) / 10.0
    f_iqr = (F.col("y") < F.col("q1") - iqr15) | (
        F.col("y") > F.col("q3") + iqr15
    )
    f_mad = F.abs(F.col("y") - F.col("med")) > 2.0 * 1.4826 * F.col("mad")
    votes = (
        F.when(f_z, 1).otherwise(0)
        + F.when(f_iqr, 1).otherwise(0)
        + F.when(f_mad, 1).otherwise(0)
    )
    return (
        j.select(
            F.col("day").cast("timestamp").alias("day"),
            F.col("y").cast("bigint").alias("y"),
            f_z.alias("f_z"),
            f_iqr.alias("f_iqr"),
            f_mad.alias("f_mad"),
            votes.cast("int").alias("votes"),
        )
        .filter(F.col("votes") >= 2)
        .orderBy("day")
    )


@query(
    "cosine_threshold_pr_curve",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             SQRT(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    pr AS (
      SELECT a.label = b.label AS same,
             ROUND(list_sum(list_transform(generate_series(1, 64),
                     j -> a.v[j] * b.v[j])) / (a.nrm * b.nrm), 6) AS s
      FROM e a JOIN e b ON b.vec_id = a.vec_id + 1),
    th AS (SELECT unnest([0.0, 0.2, 0.4, 0.6, 0.8]) AS t),
    m AS (
      SELECT th.t,
             SUM(CASE WHEN s >= th.t AND same THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN s >= th.t AND NOT same THEN 1 ELSE 0 END)
               AS fp,
             SUM(CASE WHEN s < th.t AND same THEN 1 ELSE 0 END) AS fn
      FROM pr, th GROUP BY 1)
    SELECT ROUND(CAST(t AS DOUBLE), 2) AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           ROUND(CASE WHEN tp + fp = 0 THEN 1.0
                      ELSE tp * 1.0 / (tp + fp) END, 6) AS precision,
           ROUND(CASE WHEN tp + fn = 0 THEN 1.0
                      ELSE tp * 1.0 / (tp + fn) END, 6) AS recall
    FROM m ORDER BY threshold
    """,
    doc="Precision/recall curve for a cosine same-label predictor over "
    "adjacent-id embedding pairs at five thresholds — the calibration "
    "sweep run before fixing a semantic-dedup or matching cutoff "
    "(lsh_band_s_curve tunes the INDEX; this tunes the DECISION "
    "boundary against labels). Cosines are row-local in-order folds "
    "rounded to 6, counts exact; the 5x threshold fan-out is a "
    "broadcast of a literal array. One self-join on adjacent ids, "
    "one keyed aggregate.",
)
def cosine_threshold_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    e = emb.select(
        "vec_id",
        "label",
        dbl.alias("v"),
        F.sqrt(
            F.aggregate(
                F.transform(dbl, lambda x: x * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        ).alias("nrm"),
    )
    b = e.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("label").alias("lb"),
        F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pr = e.join(b, "vec_id").select(
        (F.col("label") == F.col("lb")).alias("same"),
        F.round(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("vb"), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / (F.col("nrm") * F.col("nb")),
            6,
        ).alias("s"),
    )
    th = F.explode(
        F.array(*[F.lit(t) for t in (0.0, 0.2, 0.4, 0.6, 0.8)])
    ).alias("t")
    m = (
        pr.select("same", "s", th)
        .groupBy("t")
        .agg(
            F.sum(
                F.when((F.col("s") >= F.col("t")) & F.col("same"), 1)
                .otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when((F.col("s") >= F.col("t")) & ~F.col("same"), 1)
                .otherwise(0)
            ).alias("fp"),
            F.sum(
                F.when((F.col("s") < F.col("t")) & F.col("same"), 1)
                .otherwise(0)
            ).alias("fn"),
        )
    )
    return m.select(
        dround(F.col("t").cast("double"), 2).alias("threshold"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        dround(
            F.when(F.col("tp") + F.col("fp") == 0, F.lit(1.0)).otherwise(
                F.col("tp") * 1.0 / (F.col("tp") + F.col("fp"))
            ),
            6,
        ).alias("precision"),
        dround(
            F.when(F.col("tp") + F.col("fn") == 0, F.lit(1.0)).otherwise(
                F.col("tp") * 1.0 / (F.col("tp") + F.col("fn"))
            ),
            6,
        ).alias("recall"),
    ).orderBy("threshold")


@query(
    "price_ending_bias",
    oracle="""
    WITH e AS (
      SELECT CAST(round(p_retailprice * 100, 0) AS BIGINT) % 100
               AS ending
      FROM part),
    c AS (SELECT ending, COUNT(*) AS n FROM e GROUP BY 1),
    tot AS (SELECT SUM(n) AS t, COUNT(*) AS k FROM c),
    chi AS (
      SELECT SUM(POWER(n - CAST(t AS DOUBLE) / 100, 2)
                 / (CAST(t AS DOUBLE) / 100)) AS chi2
      FROM c, tot),
    top AS (
      SELECT ending, n,
             ROW_NUMBER() OVER (ORDER BY n DESC, ending) AS rk
      FROM c)
    SELECT CAST(top.ending AS INTEGER) AS ending,
           CAST(top.n AS BIGINT) AS n,
           ROUND(top.n * 100.0 / tot.t, 6) AS pct,
           ROUND(chi.chi2, 4) AS chi2_vs_uniform
    FROM top, tot, chi
    WHERE top.rk <= 5
    ORDER BY top.n DESC, top.ending
    """,
    doc="Psychological price-point audit: the distribution of cent "
    "endings (.99, .00, ...) in retail prices vs the uniform null, "
    "reported as the top-5 endings plus a chi-square statistic — the "
    "pricing-integrity sibling of benford_digit_audit (Benford checks "
    "leading digits for fabrication; endings expose charm-pricing "
    "policy and import errors). Exact integer cent endings, one keyed "
    "aggregate; the chi-square sums over at most 100 ending rows.",
)
def price_ending_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    part = load_table(spark, sf_dir, "part")
    e = part.select(
        (
            F.round(F.col("p_retailprice") * 100, 0).cast("bigint") % 100
        ).alias("ending")
    )
    c = e.groupBy("ending").agg(F.count("*").alias("n"))
    from kyuubi_spark.caching import persisted

    c = persisted(c)
    tot = c.agg(F.sum("n").alias("t"))
    chi = c.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.pow(F.col("n") - F.col("t").cast("double") / 100, F.lit(2.0))
            / (F.col("t").cast("double") / 100)
        ).alias("chi2")
    )
    w = Window.orderBy(F.col("n").desc(), F.col("ending"))
    top = c.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 5
    )
    return (
        top.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(chi))
        .select(
            F.col("ending").cast("int").alias("ending"),
            F.col("n").cast("bigint").alias("n"),
            dround(F.col("n") * 100.0 / F.col("t"), 6).alias("pct"),
            dround(F.col("chi2"), 4).alias("chi2_vs_uniform"),
        )
        .orderBy(F.col("n").desc(), F.col("ending"))
    )


@query(
    "rich_club_coefficient",
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey),
    e0 AS (SELECT DISTINCT u, v FROM pairs),
    deg AS (SELECT n, COUNT(*) AS d FROM (
              SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0)
            GROUP BY 1),
    ks AS (SELECT unnest([10, 20, 40]) AS k),
    rich AS (
      SELECT ks.k, deg.n
      FROM ks JOIN deg ON deg.d > ks.k),
    nr AS (SELECT k, COUNT(*) AS n_rich FROM rich GROUP BY 1),
    er AS (
      SELECT r1.k, COUNT(*) AS e_rich
      FROM e0
      JOIN rich r1 ON r1.n = e0.u
      JOIN rich r2 ON r2.n = e0.v AND r2.k = r1.k
      GROUP BY 1)
    SELECT CAST(nr.k AS INTEGER) AS k,
           CAST(nr.n_rich AS BIGINT) AS n_rich,
           CAST(COALESCE(er.e_rich, 0) AS BIGINT) AS edges_among_rich,
           ROUND(COALESCE(er.e_rich, 0) * 2.0
                 / (nr.n_rich * (nr.n_rich - 1)), 6) AS phi
    FROM nr LEFT JOIN er ON er.k = nr.k
    ORDER BY k
    """,
    doc="Rich-club coefficient of the co-purchase graph: for degree "
    "thresholds k in {10, 20, 40}, the edge density phi(k) among "
    "nodes of degree > k — rising phi means hubs preferentially "
    "interconnect (the supply-chain/popularity core every power-law "
    "graph analysis reports alongside assortativity). Plan: one "
    "degree aggregate, the rich sets materialize as (k, node) rows "
    "(3x fan-out of the hub slice only), and rich-edge counting is "
    "two keyed joins of the edge list against them — no densification "
    "beyond the hub-induced subgraph.",
)
def rich_club_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.caching import persisted
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k0"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k0"), F.col("l_partkey").alias("v"))
    e0 = persisted(
        a.join(b, "k0").filter(F.col("u") < F.col("v")).select("u", "v")
        .distinct()
    )
    deg = (
        e0.select(F.col("u").alias("n"))
        .unionAll(e0.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    ks = F.explode(F.array(F.lit(10), F.lit(20), F.lit(40))).alias("k")
    rich = persisted(
        deg.select("n", "d", ks).filter(F.col("d") > F.col("k"))
        .select("k", "n")
    )
    nr = rich.groupBy("k").agg(F.count("*").alias("n_rich"))
    # the rich sets are the hub slice (3 x nodes above the degree cuts —
    # tiny next to the edge list); size-gate a broadcast so rich-edge
    # counting streams the persisted edges through two broadcast hash
    # joins instead of shuffling them by u and again by v (guide §3.1);
    # past the budget the gate disappears and the keyed joins stand
    from kyuubi_spark.operators.broadcast import broadcast_budget as _broadcast_budget

    n_rich_rows = rich.count()  # also primes the persisted rich cache
    hint = (
        F.broadcast
        if 0 <= n_rich_rows * 16 <= _broadcast_budget(spark)
        else (lambda d: d)
    )
    er = (
        e0.join(hint(rich.withColumnRenamed("n", "u")), "u")
        .join(
            hint(
                rich.withColumnRenamed("n", "v").withColumnRenamed("k", "k2")
            ),
            "v",
        )
        .filter(F.col("k") == F.col("k2"))
        .groupBy("k")
        .agg(F.count("*").alias("e_rich"))
    )
    return (
        nr.join(er, "k", "left")
        .fillna(0, subset=["e_rich"])
        .select(
            F.col("k").cast("int").alias("k"),
            F.col("n_rich").cast("bigint").alias("n_rich"),
            F.col("e_rich").cast("bigint").alias("edges_among_rich"),
            dround(
                F.col("e_rich") * 2.0
                / (F.col("n_rich") * (F.col("n_rich") - 1)),
                6,
            ).alias("phi"),
        )
        .orderBy("k")
    )


@query(
    "spearman_rank_correlation",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS spend,
             COUNT(*) AS n_orders
      FROM orders GROUP BY 1),
    j AS (
      SELECT per.o_custkey, per.spend,
             CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS bal
      FROM per JOIN customer c ON c.c_custkey = per.o_custkey),
    rk AS (
      SELECT ROW_NUMBER() OVER (ORDER BY spend, o_custkey) AS r1,
             ROW_NUMBER() OVER (ORDER BY bal, o_custkey) AS r2,
             COUNT(*) OVER () AS n
      FROM j)
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(SUM((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2,
           ROUND(1 - 6.0 * SUM((r1 - r2) * (r1 - r2))
                 / (MAX(n) * (CAST(MAX(n) AS DOUBLE) * MAX(n) - 1)), 6)
             AS spearman_rho
    FROM rk
    """,
    doc="Spearman rank correlation between customer lifetime spend and "
    "account balance: both variables rank on the DISTRIBUTED exact "
    "multi-axis ranker (operators/ranking.py global_row_numbers — the "
    "two axes share the same two bounded driver passes, rfm_segments "
    "machinery; the oracle's single-partition ROW_NUMBERs replaced), "
    "then rho = 1 - 6*sum(d^2)/(n(n^2-1)) from the EXACT integer "
    "rank-difference sum — the outlier-robust correlation the Pearson "
    "r of price_quantity_regression can't give. Ties broken by "
    "custkey on both axes so ranks are identical cross-engine.",
)
def spearman_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.operators.ranking import global_row_numbers
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    per = orders.groupBy("o_custkey").agg(
        F.sum(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        ).alias("spend")
    )
    j = per.join(
        cust.select(
            "c_custkey",
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("bal"),
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select("o_custkey", "spend", "bal")
    ranked, n = global_row_numbers(
        j,
        {
            "r1": [("spend", "asc"), ("o_custkey", "asc")],
            "r2": [("bal", "asc"), ("o_custkey", "asc")],
        },
    )
    d2 = ranked.agg(
        F.sum(
            (F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))
        ).alias("sum_d2")
    )
    nd = float(n)
    return d2.select(
        F.lit(n).cast("bigint").alias("n_customers"),
        F.col("sum_d2").cast("bigint").alias("sum_d2"),
        dround(
            1 - 6.0 * F.col("sum_d2") / F.lit(nd * (nd * nd - 1)), 6
        ).alias("spearman_rho"),
    )
