"""Spark 4 SQL language surface served through the gateway (SURVEY §2.D).

The reference's relational surface IS whatever its Spark engine accepts
over the wire (`spark.sql(statement)` — reference ExecuteStatement.scala:90),
and its tests pin the session-state statements a JDBC user can issue
(SparkQueryTests.scala:51 exercises variable substitution). Spark 4 grew
that statement surface substantially; these entries verify each piece
end-to-end with value-exact oracles:

- ``session_variables`` — DECLARE VARIABLE + EXECUTE IMMEDIATE ... INTO:
  a scalar computed from data lands in a session variable and
  parameterizes the next statement (the session-state flow a BI tool
  does with `SET hivevar:` against the reference).
- ``sql_scripting_loop`` — SQL scripting (BEGIN/DECLARE/FOR cursor
  loop): procedural control flow entirely server-side; the loop body
  runs a correlated scalar query per cursor row.
- ``ddl_column_defaults`` — CREATE TABLE ... DEFAULT + INSERT ...
  DEFAULT: column defaults materialize into the stored data.
- ``parameterized_sql`` — named parameter markers (`:name`) plus the
  IDENTIFIER() clause: injection-safe dynamic SQL — the table name and
  the predicate value arrive as BINDINGS, never string-spliced (the same
  discipline gateway/trino.py PREPARE/EXECUTE and the JDBC dialects'
  sql_literal enforce).

Session-state hygiene: variables use a ``ks4_`` prefix with DECLARE OR
REPLACE so repeated runs on a shared session are idempotent; catalog
TABLES additionally get a per-run uuid suffix so concurrent sessions
sharing one catalog can never DROP each other's in-flight table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kyuubi_spark.scratch import scratch_dir
from pyspark.sql import functions as F  # noqa: F401

from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table


@query(
    "session_variables",
    oracle="""
    WITH thr AS (
      SELECT ROUND(MAX(o_totalprice) * 0.5, 2) AS t FROM orders)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_above,
           CAST(MAX(thr.t) AS DOUBLE) AS threshold
    FROM orders, thr WHERE o_totalprice > thr.t
    """,
    doc="Session variables: EXECUTE IMMEDIATE computes a data-derived "
    "scalar (half the max order total — MAX is bit-exact on both engines, "
    "unlike a float AVG) INTO a declared variable, which then "
    "parameterizes the next statement. The variable is a literal by the "
    "time Catalyst plans the query, so the filter constant-folds and "
    "pushes to the scan exactly like hand-written SQL.",
)
def session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    spark.sql("DECLARE OR REPLACE VARIABLE ks4_thr DOUBLE")
    spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT ROUND(MAX(o_totalprice) * 0.5, 2) FROM orders' INTO ks4_thr"
    )
    return spark.sql(
        """
        SELECT COUNT(*) AS n_above, CAST(ks4_thr AS DOUBLE) AS threshold
        FROM orders WHERE o_totalprice > ks4_thr
        """
    )


@query(
    "sql_scripting_loop",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nations,
           CAST((SELECT COUNT(*) FROM region) AS BIGINT) AS n_iterations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    doc="SQL scripting (Spark 4 BEGIN ... END): a FOR cursor loop over "
    "region accumulates a correlated per-region nation count into a "
    "script-local variable — procedural control flow running entirely "
    "server-side, no client round-trips (what the reference needs "
    "ExecuteScala/ExecutePython sessions for). The cursor relation is "
    "region (bounded); each body iteration is an independent Catalyst "
    "plan, so this is for small control relations — corpus-scaled "
    "aggregation stays in plain declarative SQL.",
)
def sql_scripting_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        BEGIN
          DECLARE total BIGINT DEFAULT 0;
          DECLARE iters BIGINT DEFAULT 0;
          FOR r AS SELECT r_regionkey AS k FROM region ORDER BY r_regionkey DO
            SET total = total + (
              SELECT COUNT(*) FROM nation WHERE n_regionkey = r.k);
            SET iters = iters + 1;
          END FOR;
          SELECT total AS n_nations, iters AS n_iterations;
        END
        """
    )


@query(
    "ddl_column_defaults",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'explicit', CAST(3.5 AS DOUBLE), 100),
      (2, 'pending',  CAST(3.5 AS DOUBLE), 7),
      (3, 'pending',  CAST(1.25 AS DOUBLE), 100))
      AS t(id, status, weight, prio)
    ORDER BY id
    """,
    doc="Column DEFAULT DDL (Spark 3.4+/4): CREATE TABLE declares "
    "per-column defaults, INSERT supplies DEFAULT positionally or omits "
    "trailing columns, and the stored parquet materializes the resolved "
    "values (defaults are write-time constants, not read-time patches — "
    "files stay self-describing for any downstream reader at any scale).",
)
def ddl_column_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    path = scratch_dir("kyuubi_defaults_")
    # session-unique name: a fixed name + DROP-first would race a
    # concurrent session sharing the catalog (its DROP could delete OUR
    # just-created table mid-query)
    tab = f"ks4_defaults_{uuid.uuid4().hex[:12]}"
    try:
        spark.sql(
            f"""
            CREATE TABLE {tab} (
              id INT,
              status STRING DEFAULT 'pending',
              weight DOUBLE DEFAULT 3.5,
              prio INT DEFAULT 100
            ) USING parquet LOCATION '{path}/t'
            """
        )
        spark.sql(
            f"INSERT INTO {tab} VALUES "
            "(1, 'explicit', DEFAULT, DEFAULT), "
            "(2, DEFAULT, DEFAULT, 7)"
        )
        # omitted trailing columns also fill from defaults
        spark.sql(f"INSERT INTO {tab} (id, weight) VALUES (3, 1.25)")
        out = spark.sql(f"SELECT * FROM {tab} ORDER BY id")
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tab}")
        shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "parameterized_sql",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders WHERE o_totalprice > 100000.0
    GROUP BY 1 ORDER BY 1
    """,
    doc="Named parameter markers + IDENTIFIER(): the table name and the "
    "predicate value arrive as bindings (spark.sql args=...), never "
    "spliced into the statement text — the engine-side analog of the "
    "gateway's Trino PREPARE/EXECUTE placeholder binding and the JDBC "
    "dialects' sql_literal escaping. The bound value plans as a literal, "
    "so pushdown/pruning are identical to inline SQL.",
)
def parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM IDENTIFIER(:tab) WHERE o_totalprice > :thr
        GROUP BY 1 ORDER BY 1
        """,
        args={"tab": "orders", "thr": 100000.0},
    )


@query(
    "ansi_try_semantics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_custkey % 10 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_div_null,
           ROUND(SUM(CASE WHEN o_custkey % 10 = 0 THEN 0
                          ELSE o_totalprice / (o_custkey % 10) END), 2)
             AS sum_safe_div,
           CAST(SUM(CASE WHEN TRY_CAST(o_orderstatus AS INT) IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_null,
           CAST(SUM(TRY_CAST(substr(o_orderpriority, 1, 1) AS INT))
                AS BIGINT) AS sum_prio
    FROM orders
    """,
    doc="ANSI-mode error handling (Spark 4 runs spark.sql.ansi.enabled="
    "true by default — plain x/0 now THROWS at any row, a behavior "
    "change every reference user migrating to a Spark 4 engine hits): "
    "the try_ family (try_divide, try_cast) returns NULL instead of "
    "failing the job, per-row and vectorized. The oracle spells the NULL "
    "semantics explicitly (CASE on the zero divisor, TRY_CAST), so the "
    "value contract — not just 'does not crash' — is pinned. Map-only "
    "single aggregate; one scan, no shuffle beyond the final combine.",
)
def ansi_try_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT COUNT(*) AS n_rows,
               SUM(CASE WHEN try_divide(o_totalprice, o_custkey % 10)
                        IS NULL THEN 1 ELSE 0 END) AS n_div_null,
               ROUND(SUM(COALESCE(
                 try_divide(o_totalprice, o_custkey % 10), 0)), 2)
                 AS sum_safe_div,
               SUM(CASE WHEN try_cast(o_orderstatus AS INT) IS NULL
                        THEN 1 ELSE 0 END) AS n_cast_null,
               SUM(try_cast(substr(o_orderpriority, 1, 1) AS INT))
                 AS sum_prio
        FROM orders
        """
    )


@query(
    "script_transform",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    """,
    doc="Hive-style script transformation (SELECT TRANSFORM ... USING): "
    "rows stream through an external process ('cat' here) as "
    "tab-separated text and come back as strings — the legacy ETL "
    "surface HS2 clients still send (reference Spark engine runs it via "
    "spark.sql like any statement). The identity pipe is aggregated "
    "downstream so the oracle pins lossless round-tripping of every row "
    "and value. Scale note: TRANSFORM forks one process per task and "
    "serializes rows as text — it works distributed at any SF, but "
    "Arrow-batched Pandas UDFs are the modern path; this entry exists "
    "for wire-surface parity, not as a recommended kernel.",
)
def script_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(
        """
        SELECT COUNT(*) AS n_docs,
               SUM(CAST(n_chars_s AS BIGINT)) AS total_chars
        FROM (
          SELECT TRANSFORM (doc_id, n_chars) USING 'cat'
                 AS (doc_id_s STRING, n_chars_s STRING)
          FROM documents
        )
        """
    )


@query(
    "pyds_tpch_scan",
    oracle="""
    WITH k AS (SELECT unnest(generate_series(0, 1499)) AS k),
    c AS (SELECT k, k % 5 AS seg,
                 ROUND((k * 977 % 1099999) / 100.0 - 999.99, 2) AS bal
          FROM k WHERE k % 5 IN (1, 4))
    SELECT CASE seg WHEN 1 THEN 'BUILDING' ELSE 'MACHINERY' END
             AS c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           CAST(MIN(k) + 1 AS BIGINT) AS min_key,
           CAST(MAX(k) + 1 AS BIGINT) AS max_key
    FROM c GROUP BY 1 ORDER BY 1
    """,
    doc="TPC-H generator as a REAL connector (Spark 4 Python DataSource "
    "API; sources/pyds.py) — the reference's DSv2 TPCHBatchScan shape "
    "(TPCHBatchScan.scala:39-91): spark.read.format('kyuubi_tpch') "
    "splits the key space into InputPartition ranges and generates "
    "Arrow RecordBatches per range, and the isin() predicate PUSHES "
    "INTO the generator (pushFilters accepts EqualTo/In on "
    "c_mktsegment and skips non-matching keys before any row is "
    "built). The oracle reproduces the modular row formulas over "
    "generate_series, so connector output is value-exact, not just "
    "shape-correct. Balances sum in DECIMAL for order-exactness.",
)
def pyds_tpch_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.sources import pyds

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pyds.register(spark)
    df = (
        spark.read.format("kyuubi_tpch")
        .option("table", "customer")
        .option("sf", "0.01")  # 1500 rows — connector shape, not volume
        .option("pushdown", "true")  # opt-in; see sources/pyds.py
        .load()
    )
    return (
        df.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "arrow_sink_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY 1 ORDER BY 1
    """,
    doc="Write path of the Python DataSource connector (sources/"
    "arrowdir.py — the DSv2 HiveBatchWrite two-phase commit shape): a "
    "filtered orders projection streams Arrow RecordBatches to one IPC "
    "file per task, the driver commit atomically publishes a manifest, "
    "and the read side lists only manifested files (orphans from failed "
    "tasks are invisible). Read back and aggregated; the oracle "
    "aggregates the source directly, so commit-protocol visibility and "
    "the Arrow round trip must both be lossless.",
)
def arrow_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kyuubi_spark.sources import arrowdir

    arrowdir.register(spark)
    orders = load_table(spark, sf_dir, "orders")
    proj = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderpriority", "o_totalprice"
    )
    path = scratch_dir("kyuubi_arrowsink_", data_scale=True)
    try:
        proj.write.format(arrowdir.FORMAT_NAME).mode("overwrite").save(path)
        back = spark.read.format(arrowdir.FORMAT_NAME).load(path)
        from kyuubi_spark.functions.compat import dround

        out = (
            back.groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_orders"),
                dround(F.sum("o_totalprice"), 2).alias("total"),
            )
            .orderBy("o_orderpriority")
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "cost_based_stats",
    oracle="""
    WITH f AS (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F')
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_stats,
           CAST(COUNT(*) AS BIGINT) AS n_rows_exact,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM f
    """,
    doc="ANALYZE TABLE ... COMPUTE STATISTICS: the statement that feeds "
    "Catalyst's cost-based optimizer (join reordering, broadcast "
    "decisions, and the OPTIMIZE_WITH_STATS plan-only mode this gateway "
    "already serves). A CTAS table is analyzed, and the catalog's stored "
    "rowCount — parsed back out of DESCRIBE EXTENDED — must equal the "
    "exact live count (ANALYZE's row count is a real count, not an "
    "estimate; only column NDVs are sketched). At 100 TB the ANALYZE "
    "scan is the one-time price for every subsequent stats-informed "
    "plan.",
)
def cost_based_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    path = scratch_dir("kyuubi_stats_", data_scale=True)
    # session-unique (see ddl_column_defaults): never race a concurrent
    # session's DROP on a shared catalog
    tab = f"ks4_stats_{uuid.uuid4().hex[:12]}"
    try:
        spark.sql(
            f"""
            CREATE TABLE {tab} USING parquet LOCATION '{path}/t' AS
            SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
            """
        )
        spark.sql(
            f"ANALYZE TABLE {tab} COMPUTE STATISTICS FOR ALL COLUMNS"
        )
        stats = (
            spark.sql(f"DESCRIBE EXTENDED {tab}")
            .filter(F.col("col_name") == "Statistics")
            .select(
                F.regexp_extract("data_type", r"(\d+) rows", 1)
                .cast("bigint")
                .alias("n_rows_stats")
            )
        )
        exact = spark.table(tab).agg(
            F.count("*").alias("n_rows_exact"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
        out = stats.crossJoin(exact)
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tab}")
        shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "named_window_reuse",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(RANK() OVER w AS BIGINT) AS rk,
           ROUND(SUM(o_totalprice) OVER w, 2) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    ORDER BY o_orderpriority, o_orderkey LIMIT 200
    """,
    doc="Named WINDOW clause: one window specification declared once and "
    "shared by multiple window functions — Catalyst plans a SINGLE "
    "Window node (one partition-shuffle + sort) instead of one per "
    "OVER, exactly what a reviewer wants in a plan with many window "
    "aggregates over the same spec. Partitioned by priority, so the "
    "window is shard-parallel at any scale; LIMIT on a total order "
    "keeps the cut deterministic.",
)
def named_window_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderkey,
               RANK() OVER w AS rk,
               ROUND(SUM(o_totalprice) OVER w, 2) AS running_total
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
        ORDER BY o_orderpriority, o_orderkey LIMIT 200
        """
    )


@query(
    "limit_offset_page",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders ORDER BY o_orderkey
    LIMIT 25 OFFSET 50
    """,
    doc="LIMIT ... OFFSET pagination (Spark 3.4+) over a total order — "
    "the page-2+ fetch JDBC tools issue. Spark plans a global "
    "TakeOrdered of offset+limit rows then drops the prefix, so the "
    "driver never materializes more than one page beyond the skip; at "
    "deep offsets this degrades by design (offset+limit rows move) — "
    "keyset pagination (WHERE key > last_seen, already the pattern in "
    "the gateway's incremental fetch) is the scale path.",
)
def limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders ORDER BY o_orderkey
        LIMIT 25 OFFSET 50
        """
    )


@query(
    "xml_extract",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY 1 ORDER BY 1
    """,
    doc="Native XML functions (Spark 4 first-class XML): each order row "
    "is serialized to an XML doc, parsed back with from_xml against a "
    "schema, and the priority re-extracted with an XPath expression — "
    "the aggregate over the round-tripped values must equal a direct "
    "scan (numbers survive double->string->double exactly in Spark's "
    "shortest-repr formatting). Map-only expressions; the XML codec "
    "runs inside the JVM row pipeline, no Python boundary.",
)
def xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    # The `concat(xml, substring(cast(rand() ...), 1, 0))` wrapper is a
    # no-op on the value (always appends the empty string) whose ONLY
    # job is to make the from_xml expression non-deterministic: the
    # optimizer otherwise pushes `v.st = 'F'` below the projection and
    # re-evaluates the XML parse in BOTH the filter and the project —
    # every row paid the parser twice (optimization guide §4.4, the same
    # duplication UDFs hit, visible as two from_xml nodes in the before
    # plan).  A plain `rand() < 2` guard does not survive: Spark 4
    # range-folds rand comparisons back to a literal.  With the guard
    # the plan parses each row exactly once; xpath_string (its own
    # second parser pass) still runs only on the filter's survivors.
    return spark.sql(
        """
        WITH doc AS (
          SELECT concat('<o><k>', o_orderkey, '</k><p>', o_totalprice,
                        '</p><pri>', o_orderpriority, '</pri><st>',
                        o_orderstatus, '</st></o>') AS xml
          FROM orders),
        parsed AS (
          SELECT from_xml(concat(xml,
                                 substring(cast(rand() AS STRING), 1, 0)),
                          'k BIGINT, p DOUBLE, pri STRING, st STRING')
                   AS v,
                 xml
          FROM doc)
        SELECT xpath_string(xml, '/o/pri') AS o_orderpriority,
               COUNT(*) AS n_orders,
               SUM(v.k) AS sum_keys,
               ROUND(SUM(v.p), 2) AS total
        FROM parsed WHERE v.st = 'F'
        GROUP BY 1 ORDER BY 1
        """
    )


@query(
    "hll_sketch_union",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS sketch_within_5pct,
           TRUE AS union_within_5pct
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
    doc="Mergeable HLL sketches (Spark 4 Apache DataSketches functions): "
    "per-day hll_sketch_agg sketches union via hll_union_agg into a "
    "per-event-type estimate — the pre-aggregation pattern a 100 TB "
    "rollup needs (daily sketch partials persist; any window re-unions "
    "in O(sketch bytes), never rescanning raw events). Like "
    "approx_distinct_users, the raw estimate has no cross-engine "
    "oracle; the result pins the EXACT count plus two booleans: the "
    "whole-data sketch AND the union-of-daily-sketches estimate each "
    "land within 5% of exact. (The union is NOT register-identical to "
    "sketching the whole — DataSketches unions re-estimate through a "
    "union buffer, observed 1488 vs 1494 on 1500 at sf0.1 — which is "
    "exactly why the tolerance contract, not equality, is the sound "
    "claim for mergeable-sketch rollups.)",
)
def hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    events.createOrReplaceTempView("events_hll")
    return spark.sql(
        """
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 hll_sketch_agg(user_id) AS sk
          FROM events_hll GROUP BY 1, 2),
        merged AS (
          SELECT event_type,
                 hll_sketch_estimate(hll_union_agg(sk)) AS est
          FROM daily GROUP BY 1),
        whole AS (
          SELECT event_type,
                 hll_sketch_estimate(hll_sketch_agg(user_id)) AS est_whole,
                 COUNT(DISTINCT user_id) AS exact_users
          FROM events_hll GROUP BY 1)
        SELECT w.event_type, w.exact_users,
               abs(w.est_whole - w.exact_users) <= 0.05 * w.exact_users
                 AS sketch_within_5pct,
               abs(m.est - w.exact_users) <= 0.05 * w.exact_users
                 AS union_within_5pct
        FROM whole w JOIN merged m ON m.event_type = w.event_type
        ORDER BY w.event_type
        """
    )


@query(
    "collated_group_by",
    oracle="""
    SELECT upper(CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                      ELSE c_mktsegment END) AS segment,
           COUNT(*) AS n,
           ROUND(SUM(c_acctbal), 2) AS total_bal
    FROM customer
    GROUP BY 1 ORDER BY segment
    """,
    doc="Spark 4 string collations: mixed-case segment values grouped "
    "under COLLATE UTF8_LCASE merge case-insensitively in ONE hash "
    "aggregate — the engine-native form of the lower()-wrapping "
    "workaround (which the oracle uses, so the result is value-exact "
    "across engines). Collation-aware grouping keeps the original "
    "bytes (no normalize-then-group rewrite materializes a second "
    "column) and the comparison stays JVM-side in codegen.",
)
def collated_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    customer.createOrReplaceTempView("customer_coll")
    return spark.sql(
        """
        SELECT upper(seg) AS segment, COUNT(*) AS n,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM (
          SELECT CASE WHEN c_custkey % 2 = 0 THEN lower(c_mktsegment)
                      ELSE c_mktsegment END COLLATE UTF8_LCASE AS seg,
                 c_acctbal
          FROM customer_coll)
        GROUP BY seg ORDER BY segment
        """
    )


@query(
    "group_order_by_all",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY ALL ORDER BY ALL
    """,
    doc="GROUP BY ALL / ORDER BY ALL (Spark 3.4+/4 analyst-SQL "
    "surface): every non-aggregate select item groups implicitly and "
    "the whole projection orders positionally — the exact same syntax "
    "runs on the DuckDB oracle, so the resolution rules (which columns "
    "count as grouping keys) are pinned cross-engine, not just the "
    "values. Plan is the ordinary partial+final hash aggregate.",
)
def group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(SUM(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY ALL ORDER BY ALL
        """
    )


@query(
    "listagg_within_group",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    doc="Spark 4 LISTAGG ... WITHIN GROUP (ORDER BY ...) (SPARK-42746), "
    "the SQL-standard ordered string aggregation JDBC reporting tools "
    "emit — DISTINCT + explicit order make the concatenation "
    "deterministic, pinned against DuckDB's ordered string_agg. "
    "Aggregation state is the distinct-status set per group (bounded "
    "by the status domain), partial+final as usual.",
)
def listagg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, ',')
                 WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1 ORDER BY 1
        """
    )


@query(
    "lateral_column_alias",
    oracle="""
    SELECT o_orderkey,
           o_orderkey * 3 + 1 AS tripled,
           (o_orderkey * 3 + 1) * 2 + o_custkey AS chained
    FROM orders ORDER BY o_orderkey LIMIT 30
    """,
    doc="Lateral column aliases (Spark 3.4+): a SELECT item referencing "
    "an alias defined earlier in the same projection (tripled -> "
    "chained), resolved in one SELECT without a subquery. The Spark "
    "side uses the ACTUAL lateral-alias syntax through spark.sql; the "
    "oracle spells out the expansion, proving the alias binds to the "
    "aliased expression. Integer arithmetic keeps the pin exact.",
)
def lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               o_orderkey * 3 + 1 AS tripled,
               tripled * 2 + o_custkey AS chained
        FROM orders ORDER BY o_orderkey LIMIT 30
        """
    )


@query(
    "array_hof_pipeline",
    oracle="""
    SELECT lang,
           CAST(SUM(len(list_filter(string_split(trim(text), ' '),
                                    x -> length(x) > 4))) AS BIGINT)
             AS long_tokens,
           CAST(SUM(list_sum(list_transform(
                  string_split(trim(text), ' '),
                  x -> length(x)))) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
    doc="Higher-order array functions as a cross-engine pin: split -> "
    "lambda filter (length > 4) -> size, and split -> lambda transform "
    "(per-token length) -> aggregate fold, summed per language. HOF "
    "lambdas evaluate inside the JVM expression interpreter (no Python), "
    "one projection + one hash aggregate; DuckDB's list_filter/"
    "list_transform replay the identical lambdas.",
)
def array_hof_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    return (
        docs.select(
            "lang",
            F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("lt"),
            F.aggregate(
                F.transform(toks, lambda x: F.length(x)),
                F.lit(0),
                lambda acc, v: acc + v,
            ).alias("tc"),
        )
        .groupBy("lang")
        .agg(
            F.sum("lt").cast("bigint").alias("long_tokens"),
            F.sum("tc").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang")
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE event_type <> 'view'
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Spark 4 SQL PIPE syntax (|> operators, SPARK-49555): the same "
    "statement surface a gateway client can now send — FROM ... "
    "|> WHERE ... |> AGGREGATE ... GROUP BY ... |> ORDER BY — "
    "verified value-exact against the classic GROUP BY equivalent. "
    "Pipe stages are pure sugar over the relational algebra, so "
    "Catalyst plans them identically (same pushed filter, same "
    "partial aggregate); the entry pins that the gateway accepts the "
    "modern dialect BI tools are starting to emit.",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid

    from kyuubi_spark.functions.compat import dround  # noqa: F401

    v = f"ks4_pipe_events_{uuid.uuid4().hex[:8]}"
    load_table(spark, sf_dir, "events").createOrReplaceTempView(v)
    try:
        return spark.sql(
            f"""
            FROM {v}
            |> WHERE event_type <> 'view'
            |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n,
                         ROUND(SUM(value), 2) AS sum_value,
                         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
               GROUP BY event_type
            |> SELECT event_type, n, sum_value, n_users
            |> ORDER BY event_type
            """
        ).localCheckpoint()
    finally:
        spark.catalog.dropTempView(v)


@query(
    "variant_json_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS sum_value,
           CAST(MAX(event_id) AS BIGINT) AS max_event_id
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Spark 4 VARIANT type end-to-end (SPARK-45827): each event row "
    "round-trips through a JSON document (to_json -> parse_json -> "
    "VARIANT) and the analysis runs ENTIRELY on variant_get typed "
    "extractions ($.event_type string, $.value double, $.event_id "
    "bigint) — the semi-structured ingestion path a log/telemetry "
    "pipeline uses when the payload schema is open. The oracle "
    "computes the same aggregate from the typed columns, proving the "
    "variant round-trip is value-exact (numbers survive shredding). "
    "At 100 TB: VARIANT's binary encoding pushes extraction into the "
    "scan (no per-row JSON re-parse after ingestion) and variant_get "
    "stays in whole-stage codegen.",
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround

    ev = load_table(spark, sf_dir, "events").select(
        F.to_json(
            F.struct("event_id", "event_type", "user_id", "value")
        ).alias("j")
    )
    v = ev.select(F.parse_json(F.col("j")).alias("v"))
    typed = v.select(
        F.expr("variant_get(v, '$.event_type', 'string')").alias(
            "event_type"
        ),
        F.expr("variant_get(v, '$.value', 'double')").alias("value"),
        F.expr("variant_get(v, '$.event_id', 'bigint')").alias(
            "event_id"
        ),
    )
    return (
        typed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dround(F.sum("value"), 2).alias("sum_value"),
            F.max("event_id").cast("bigint").alias("max_event_id"),
        )
        .orderBy("event_type")
    )
