"""Gateway behavior suite.

Mirrors the reference's shared JDBC suites (SURVEY.md §5.1):
SparkQueryTests (statements, plan-only, UDFs, timeout, cancel),
SparkMetadataTests (catalog/schema/table/column shapes), and the fetch
semantics of FetchIterator.
"""

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kyuubi_spark.gateway import Engine, FetchOrientation, OperationState  # noqa: E402
from kyuubi_spark.gateway.fetch import ArrayFetchIterator, IterableFetchIterator  # noqa: E402
from kyuubi_spark.gateway.state import IllegalStateTransition, validate_transition  # noqa: E402


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    from kyuubi_spark.session import load_tables

    load_tables(spark, sf_dir)  # temp views in the root session
    eng = Engine(spark=spark)
    yield eng


@pytest.fixture()
def session(engine, sf_dir):
    from kyuubi_spark.session import load_tables

    s = engine.open_session(user="tester")
    # newSession() clones do not inherit temp views — register per session
    load_tables(s.spark, sf_dir)
    yield s
    engine.close_session(s.handle)


# -- statements ------------------------------------------------------------
def test_execute_statement_roundtrip(session):
    op = session.execute_statement("SELECT 1 AS a, 'x' AS b")
    assert op.state is OperationState.FINISHED
    assert [f.name for f in op.get_result_set_schema().fields] == ["a", "b"]
    rows = op.get_next_row_set(size=10)
    assert [(r["a"], r["b"]) for r in rows] == [(1, "x")]


def test_query_on_corpus_tables(session):
    op = session.execute_statement(
        "SELECT r_name, count(*) AS n FROM region GROUP BY r_name ORDER BY r_name"
    )
    rows = op.get_next_row_set(size=100)
    assert len(rows) == 5


def test_paged_fetch_and_orientations(session):
    op = session.execute_statement(
        "SELECT id FROM range(10) ORDER BY id"
    )
    p1 = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 4)
    p2 = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 4)
    assert [r["id"] for r in p1] == [0, 1, 2, 3]
    assert [r["id"] for r in p2] == [4, 5, 6, 7]
    # FETCH_PRIOR repositions to the page before the current window
    # (FetchIterator.scala fetchPrior → fetchAbsolute(start - size))
    prior = op.get_next_row_set(FetchOrientation.FETCH_PRIOR, 4)
    assert [r["id"] for r in prior] == [0, 1, 2, 3]
    first = op.get_next_row_set(FetchOrientation.FETCH_FIRST, 3)
    assert [r["id"] for r in first] == [0, 1, 2]


def test_incremental_collect_mode(session):
    op = session.execute_statement(
        "SELECT id FROM range(100)",
        conf_overlay={"kyuubi.operation.incremental.collect": "true"},
    )
    total = 0
    while True:
        page = op.get_next_row_set(size=17)
        if not page:
            break
        total += len(page)
    assert total == 100


def test_result_max_rows(session):
    op = session.execute_statement(
        "SELECT id FROM range(1000)",
        conf_overlay={"kyuubi.operation.result.max.rows": "7"},
    )
    assert len(op.get_next_row_set(size=1000)) == 7


def test_spill_to_file_mode(session):
    op = session.execute_statement(
        "SELECT id, repeat('x', 10) AS pad FROM range(1000)",
        conf_overlay={
            "kyuubi.operation.result.saveToFile.enabled": "true",
            "kyuubi.operation.result.saveToFile.minSize": "1",  # force spill
        },
    )
    rows = []
    while True:
        page = op.get_next_row_set(size=300)
        if not page:
            break
        rows.extend(page)
    assert len(rows) == 1000
    assert {f.name for f in op.get_result_set_schema().fields} == {"id", "pad"}
    op.close()  # cleans spill dir


def test_arrow_result_format(session):
    op = session.execute_statement(
        "SELECT id, CAST(id AS STRING) AS s FROM range(10)",
        conf_overlay={"kyuubi.operation.result.format": "arrow"},
    )
    batches = op.get_next_row_set(size=10)
    assert sum(b.num_rows for b in batches) == 10
    assert batches[0].schema.names == ["id", "s"]


def test_error_statement_reports_error_state(session):
    op = session.execute_statement("SELECT * FROM nonexistent_table_xyz")
    assert op.state is OperationState.ERROR
    assert op.exception is not None
    with pytest.raises(Exception, match="cannot fetch"):
        op.get_next_row_set()


def test_query_timeout(session):
    # a join big enough to outlive a 1-second timeout
    op = session.execute_statement(
        "SELECT count(*) FROM range(100000000) a CROSS JOIN range(10000) b",
        conf_overlay={"kyuubi.operation.query.timeout": "1"},
        run_async=True,
    )
    state = op.wait(timeout=60)
    assert state in (OperationState.TIMEOUT, OperationState.ERROR)


def test_cancel_operation(session):
    op = session.execute_statement(
        "SELECT count(*) FROM range(100000000) a CROSS JOIN range(10000) b",
        run_async=True,
    )
    time.sleep(0.5)
    session.cancel_operation(op.handle)
    assert op.wait(timeout=30) in (OperationState.CANCELED, OperationState.ERROR)


# -- engine UDFs (KDF) -----------------------------------------------------
def test_kdf_registry(session):
    op = session.execute_statement(
        "SELECT kyuubi_version() AS v, engine_name() AS e, session_user() AS u"
    )
    r = op.get_next_row_set()[0]
    assert r["v"] == "1.0.0"
    assert r["e"] == "kyuubi-spark-py"
    assert r["u"] == "tester"


# -- plan-only modes -------------------------------------------------------
@pytest.mark.parametrize("mode,needle", [
    ("parse", "'UnresolvedRelation"),
    ("analyze", "Aggregate"),
    ("optimize", "Aggregate"),
    ("physical", "HashAggregate"),
    ("execution", "AdaptiveSparkPlan"),
])
def test_plan_only_modes(session, mode, needle):
    op = session.execute_statement(
        "SELECT r_regionkey, count(*) FROM region GROUP BY r_regionkey",
        conf_overlay={"kyuubi.operation.plan.only.mode": mode},
    )
    (plan_text,) = op.get_next_row_set()[0]
    assert needle in plan_text, f"{mode}: {plan_text[:200]}"


def test_plan_only_lineage(session):
    import json

    op = session.execute_statement(
        "SELECT r_name, count(*) AS n FROM region GROUP BY r_name",
        conf_overlay={"kyuubi.operation.plan.only.mode": "lineage"},
    )
    lineage = json.loads(op.get_next_row_set()[0][0])
    assert lineage["inputTables"] == ["region"]
    assert lineage["outputColumns"] == ["r_name", "n"]
    assert lineage["columnLineage"]["n"] == []
    assert lineage["columnLineage"]["r_name"] == ["region.r_name"]


def test_lineage_transitive_through_nested_projections(session):
    """Column lineage resolves through arbitrary plan depth to physical
    source columns (SparkSQLLineageParseHelper's transitive behavior):
    a derived column built in a nested subquery, re-projected and
    aggregated, still maps back to its base table columns."""
    import json

    op = session.execute_statement(
        """
        SELECT nation, total_rev
        FROM (
          SELECT n.n_name AS nation,
                 SUM(o.o_totalprice) AS total_rev
          FROM (SELECT o_custkey, o_totalprice FROM orders) o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          GROUP BY n.n_name
        ) t
        WHERE total_rev > 0
        """,
        conf_overlay={"kyuubi.operation.plan.only.mode": "lineage"},
    )
    lineage = json.loads(op.get_next_row_set()[0][0])
    assert set(lineage["inputTables"]) >= {"orders", "customer", "nation"}
    cl = lineage["columnLineage"]
    assert cl["nation"] == ["nation.n_name"]
    assert cl["total_rev"] == ["orders.o_totalprice"]


def test_lineage_union_and_expression_columns(session):
    import json

    op = session.execute_statement(
        """
        SELECT k FROM (
          SELECT r_regionkey AS k FROM region
          UNION ALL
          SELECT n_nationkey AS k FROM nation
        ) u
        """,
        conf_overlay={"kyuubi.operation.plan.only.mode": "lineage"},
    )
    lineage = json.loads(op.get_next_row_set()[0][0])
    assert lineage["columnLineage"]["k"] == [
        "nation.n_nationkey", "region.r_regionkey",
    ]


# -- python operation ------------------------------------------------------
def test_execute_python(session):
    op = session.execute_statement(
        "print(spark.sql('SELECT 40 + 2').collect()[0][0])",
        conf_overlay={"kyuubi.operation.language": "PYTHON"},
    )
    out, status = op.get_next_row_set()[0]
    assert status == "ok"
    assert out.strip() == "42"


def test_execute_python_error(session):
    op = session.execute_statement(
        "1/0", conf_overlay={"kyuubi.operation.language": "PYTHON"}
    )
    out, status = op.get_next_row_set()[0]
    assert status == "error"
    assert "ZeroDivisionError" in out


# -- metadata operations ---------------------------------------------------
def test_get_catalogs_schemas_tables(session):
    cats = session.get_catalogs().get_next_row_set()
    assert ("spark_catalog",) in cats
    schemas = session.get_schemas().get_next_row_set()
    assert any(r[0] == "default" for r in schemas)
    tables = session.get_tables(schema_pattern="default", table_pattern="%").get_next_row_set()
    names = {r[2] for r in tables}
    assert {"region", "nation", "lineitem"} <= names
    assert all(r[3] in ("TABLE", "VIEW") for r in tables)


def test_get_columns_shapes(session):
    op = session.get_columns(table_pattern="region")
    cols = op.get_next_row_set(size=100)
    schema_names = [f.name for f in op.get_result_set_schema().fields]
    assert schema_names[:6] == [
        "TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "COLUMN_NAME", "DATA_TYPE", "TYPE_NAME",
    ]
    by_col = {r[3]: r for r in cols}
    assert by_col["r_regionkey"][5] in ("INT", "BIGINT")
    assert by_col["r_regionkey"][4] in (4, -5)  # java.sql.Types INTEGER/BIGINT
    assert by_col["r_name"][5] == "STRING"


def test_get_table_types_and_type_info(session):
    tt = session.get_table_types().get_next_row_set()
    assert tt == [("TABLE",), ("VIEW",)]
    ti = session.get_type_info().get_next_row_set(size=100)
    names = {r[0] for r in ti}
    assert {"BOOLEAN", "BIGINT", "DOUBLE", "STRING", "TIMESTAMP", "ARRAY"} <= names


def test_get_functions_and_primary_keys(session):
    fns = session.get_functions(function_pattern="kyuubi%").get_next_row_set()
    assert any(r[2] == "kyuubi_version" for r in fns)
    assert session.get_primary_keys().get_next_row_set() == []
    xr = session.get_cross_reference()
    assert xr.get_next_row_set() == []
    names = [f.name for f in xr.get_result_set_schema().fields]
    assert names[0] == "PKTABLE_CAT" and "FKCOLUMN_NAME" in names


def test_use_statement_switches_database(session):
    session.spark.sql("CREATE DATABASE IF NOT EXISTS gw_test_db")
    session.execute_statement("USE gw_test_db")
    assert session.spark.catalog.currentDatabase() == "gw_test_db"
    session.execute_statement("USE default")


# -- watchdog --------------------------------------------------------------
def test_watchdog_forced_max_output_rows(session):
    op = session.execute_statement(
        "SELECT id FROM range(100)",
        conf_overlay={"kyuubi.watchdog.forcedMaxOutputRows": "5"},
    )
    assert len(op.get_next_row_set(size=100)) == 5


def test_watchdog_max_scan_rejects(session):
    op = session.execute_statement(
        "SELECT * FROM lineitem",
        conf_overlay={"spark.sql.watchdog.maxFileSize": "10"},  # 10 bytes
    )
    assert op.state is OperationState.ERROR
    assert "watchdog" in str(op.exception)


def test_watchdog_allows_under_limit(session):
    op = session.execute_statement(
        "SELECT r_name FROM region",
        conf_overlay={"spark.sql.watchdog.maxFileSize": str(10**12)},
    )
    assert op.state is OperationState.FINISHED


# -- state machine / fetch units ------------------------------------------
def test_state_machine_legality():
    validate_transition(OperationState.INITIALIZED, OperationState.PENDING)
    validate_transition(OperationState.RUNNING, OperationState.COMPILED)
    with pytest.raises(IllegalStateTransition):
        validate_transition(OperationState.FINISHED, OperationState.RUNNING)
    with pytest.raises(IllegalStateTransition):
        validate_transition(OperationState.CLOSED, OperationState.FINISHED)


def test_array_fetch_iterator():
    it = ArrayFetchIterator(list(range(10)))
    assert it.take(4) == [0, 1, 2, 3]
    it.fetch_prior(4)
    assert it.take(4) == [0, 1, 2, 3]
    it.fetch_absolute(8)
    assert it.take(4) == [8, 9]
    assert it.take(4) == []


def test_iterable_fetch_iterator_forward_only():
    it = IterableFetchIterator(iter(range(10)))
    assert it.take(4) == [0, 1, 2, 3]
    it.fetch_absolute(2)  # rewind → no-op past consumed prefix
    assert it.take(2) == [4, 5]
    it.fetch_absolute(8)  # forward skip honored
    assert it.take(4) == [8, 9]


# -- sessions --------------------------------------------------------------
def test_session_isolation_temp_views(engine):
    s1 = engine.open_session(user="alice")
    s2 = engine.open_session(user="bob")
    try:
        s1.spark.sql("SELECT 1 AS x").createOrReplaceTempView("iso_view")
        assert s1.spark.catalog.tableExists("iso_view")
        assert not s2.spark.catalog.tableExists("iso_view")
        u1 = s1.execute_statement("SELECT session_user() AS u").get_next_row_set()[0]["u"]
        u2 = s2.execute_statement("SELECT session_user() AS u").get_next_row_set()[0]["u"]
        assert (u1, u2) == ("alice", "bob")
    finally:
        engine.close_session(s1.handle)
        engine.close_session(s2.handle)


def test_session_conf_isolation(engine):
    s1 = engine.open_session(conf={"spark.sql.shuffle.partitions": "3"})
    s2 = engine.open_session()
    try:
        assert s1.spark.conf.get("spark.sql.shuffle.partitions") == "3"
        assert s2.spark.conf.get("spark.sql.shuffle.partitions") != "3"
    finally:
        engine.close_session(s1.handle)
        engine.close_session(s2.handle)


def test_get_info(engine):
    info = engine.get_info()
    assert info["DBMS_NAME"] == "Spark SQL"
    assert info["SERVER_NAME"] == "kyuubi-spark-py"


# -- zorder DSL --------------------------------------------------------------
def test_optimize_zorder_rejects_temp_view(session):
    op = session.execute_statement("OPTIMIZE region ZORDER BY r_regionkey")
    assert op.state is OperationState.ERROR
    assert "persistent table" in str(op.exception)


def test_optimize_zorder_rewrites_table(session):
    spark = session.spark
    spark.sql("DROP TABLE IF EXISTS zorder_gw_t")
    spark.table("lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    ).write.saveAsTable("zorder_gw_t")
    try:
        before = spark.table("zorder_gw_t").count()
        op = session.execute_statement(
            "OPTIMIZE zorder_gw_t ZORDER BY l_partkey, l_suppkey"
        )
        assert op.state is OperationState.FINISHED
        assert spark.table("zorder_gw_t").count() == before
    finally:
        spark.sql("DROP TABLE IF EXISTS zorder_gw_t")


# -- DDL / DML through the gateway ------------------------------------------
def test_ddl_dml_lifecycle(session):
    s = session
    s.execute_statement("DROP TABLE IF EXISTS gw_ddl_t")
    op = s.execute_statement(
        "CREATE TABLE gw_ddl_t (k INT, v STRING) USING parquet"
    )
    assert op.state is OperationState.FINISHED
    s.execute_statement("INSERT INTO gw_ddl_t VALUES (1, 'a'), (2, 'b')")
    op = s.execute_statement("SELECT * FROM gw_ddl_t ORDER BY k")
    assert [(r["k"], r["v"]) for r in op.get_next_row_set()] == [(1, "a"), (2, "b")]
    # CTAS
    s.execute_statement("DROP TABLE IF EXISTS gw_ctas_t")
    s.execute_statement("CREATE TABLE gw_ctas_t USING parquet AS SELECT k * 10 AS k10 FROM gw_ddl_t")
    op = s.execute_statement("SELECT sum(k10) AS s FROM gw_ctas_t")
    assert op.get_next_row_set()[0]["s"] == 30
    s.execute_statement("DROP TABLE gw_ctas_t")
    s.execute_statement("DROP TABLE gw_ddl_t")


def test_variable_substitution(session):
    # SparkQueryTests.scala:51 exercises ${...} substitution
    session.spark.conf.set("spark.sql.variable.substitute", "true")
    session.execute_statement("SET mylimit=3")
    op = session.execute_statement("SELECT id FROM range(10) ORDER BY id LIMIT ${mylimit}")
    assert len(op.get_next_row_set()) == 3


# -- engine pool / share levels ----------------------------------------------
def test_engine_pool_share_levels(spark):
    from kyuubi_spark.gateway.pool import EnginePool

    user_pool = EnginePool(spark, share_level="USER")
    a1 = user_pool.get_engine("alice")
    a2 = user_pool.get_engine("alice")
    b = user_pool.get_engine("bob")
    assert a1 is a2 and a1 is not b

    conn_pool = EnginePool(spark, share_level="CONNECTION")
    assert conn_pool.get_engine("alice") is not conn_pool.get_engine("alice")

    server_pool = EnginePool(spark, share_level="SERVER")
    assert server_pool.get_engine("alice") is server_pool.get_engine("bob")

    group_pool = EnginePool(spark, share_level="GROUP")
    assert group_pool.get_engine("alice", group="eng") is group_pool.get_engine("bob", group="eng")
    assert group_pool.get_engine("alice", group="eng") is not group_pool.get_engine("carol", group="ops")


def test_engine_pool_round_robin_and_ttl(spark):
    import time as _time

    from kyuubi_spark.gateway.pool import EnginePool

    pool = EnginePool(spark, share_level="USER", pool_size=2, idle_timeout=0.2)
    e1 = pool.get_engine("alice")
    e2 = pool.get_engine("alice")
    e3 = pool.get_engine("alice")
    assert e1 is not e2  # pool grows to size 2
    assert e3 is e1      # then round-robins
    assert pool.engine_count == 2
    _time.sleep(0.3)
    assert pool.sweep_idle() == 2
    assert pool.engine_count == 0


def test_get_operation_status_with_progress(session):
    op = session.execute_statement(
        "select count(*) from lineitem join orders on l_orderkey = o_orderkey"
    )
    st = op.get_status(with_progress=True)
    assert st["state"] == "FINISHED" and st["error"] is None
    p = st["progress"]
    # finished query: tasks ran, none active; AQE may skip scheduled tasks
    # so completed <= scheduled (same fuzziness as SparkProgressMonitor)
    assert p["num_tasks"] > 0 and p["completed_tasks"] > 0
    assert p["completed_tasks"] <= p["num_tasks"]
    assert p["active_tasks"] == 0 and 0 < p["progress"] <= 1.0


def test_execute_python_json_magic(session):
    session.execute_statement(
        "payload = {'a': 1, 'b': [1, 2]}",
        conf_overlay={"kyuubi.operation.language": "PYTHON"},
    )
    op = session.execute_statement(
        "%json payload", conf_overlay={"kyuubi.operation.language": "PYTHON"}
    )
    out, status = op.get_next_row_set()[0]
    assert status == "ok"
    import json
    assert json.loads(out) == {"a": 1, "b": [1, 2]}


def test_execute_python_table_magic_dataframe(session):
    op = session.execute_statement(
        "%table spark.sql('SELECT id, id * 10 AS v FROM range(3) ORDER BY id')",
        conf_overlay={"kyuubi.operation.language": "PYTHON"},
    )
    # a REAL result set with the DataFrame's own schema
    assert [f.name for f in op.get_result_set_schema().fields] == ["id", "v"]
    rows = [tuple(r) for r in op.get_next_row_set()]
    assert rows == [(0, 0), (1, 10), (2, 20)]


def test_execute_python_table_magic_dicts(session):
    session.execute_statement(
        "recs = [{'x': 1, 'y': 'a'}, {'x': 2, 'y': 'b'}]",
        conf_overlay={"kyuubi.operation.language": "PYTHON"},
    )
    op = session.execute_statement(
        "%table recs", conf_overlay={"kyuubi.operation.language": "PYTHON"}
    )
    assert [f.name for f in op.get_result_set_schema().fields] == ["x", "y"]
    assert [tuple(r) for r in op.get_next_row_set()] == [("1", "a"), ("2", "b")]


def test_watchdog_forbids_cross_join(session):
    op = session.execute_statement(
        "SELECT * FROM region CROSS JOIN nation",
        conf_overlay={"kyuubi.watchdog.forbidCrossJoin": "true"},
    )
    assert op.state is OperationState.ERROR
    assert "cartesian" in str(op.exception)


def test_watchdog_cross_join_check_allows_equi_join(session):
    # comma-join with an equality predicate optimizes to an equi-join —
    # must pass the plan-shape denylist
    op = session.execute_statement(
        "SELECT count(*) AS n FROM nation, region "
        "WHERE n_regionkey = r_regionkey",
        conf_overlay={"kyuubi.watchdog.forbidCrossJoin": "true"},
    )
    assert op.state is OperationState.FINISHED
    assert op.get_next_row_set(size=1)[0][0] == 25


def test_watchdog_cross_join_allowed_by_default(session):
    op = session.execute_statement("SELECT count(*) AS n FROM region CROSS JOIN nation")
    assert op.state is OperationState.FINISHED


def test_hivevar_variable_substitution(session):
    # SparkQueryTests.scala:51 parity: ${hivevar:...} resolves in statements
    session.spark.conf.set("spark.sql.variable.substitute", "true")
    session.execute_statement("SET hivevar:threshold=5")
    op = session.execute_statement(
        "SELECT count(*) AS n FROM region WHERE r_regionkey < ${hivevar:threshold}"
    )
    assert op.state is OperationState.FINISHED
    assert op.get_next_row_set(size=1)[0][0] == 5


def test_watchdog_scan_bytes_reflects_partition_pruning(session, tmp_path):
    """MaxScanStrategy's value is measuring the PRUNED scan: a filter on
    the partition column must shrink scan_bytes, so a query that touches
    one partition passes a limit the full-table scan would trip."""
    from kyuubi_spark.operators.watchdog import scan_bytes

    spark = session.spark
    path = str(tmp_path / "parted")
    spark.range(20_000).selectExpr(
        "id", "CAST(id % 10 AS INT) AS part", "md5(CAST(id AS STRING)) AS pay"
    ).write.partitionBy("part").mode("overwrite").parquet(path)
    full = spark.read.parquet(path)
    one = full.filter("part = 3")
    b_full, b_one = scan_bytes(full), scan_bytes(one)
    assert b_one > 0
    assert b_one < b_full / 5  # one of ten partitions, with headroom
    # and the gateway enforcement sees the same pruned number
    one.createOrReplaceTempView("parted_view")
    op = session.execute_statement(
        "SELECT count(*) FROM parted_view",
        conf_overlay={"spark.sql.watchdog.maxFileSize": str(int(b_full))},
    )
    assert op.state is OperationState.FINISHED


def test_session_close_releases_operator_caches(spark, sf_dir):
    """Gateway Session.close() must release operator-internal persisted
    relations (kyuubi_spark.caching) so a long-lived gateway process does
    not accumulate cached partitions across sessions."""
    from kyuubi_spark.caching import cache_scope, persisted
    from kyuubi_spark.gateway.engine import Engine

    engine = Engine(spark)
    sess = engine.open_session(user="cache-test")
    with cache_scope(sess._cached):
        df = persisted(spark.range(10).toDF("n"))
    df.count()
    assert df in sess._cached
    engine.sessions.close_session(sess.handle)
    assert df not in sess._cached  # close released the tracked persist


def test_session_close_spares_other_sessions_caches(spark, sf_dir):
    """Closing one session must NOT unpersist relations registered by a
    different still-open session (the persist is load-bearing for that
    session's in-flight dedup plans)."""
    from kyuubi_spark.caching import cache_scope, persisted
    from kyuubi_spark.gateway.engine import Engine

    engine = Engine(spark)
    s1 = engine.open_session(user="cache-a")
    s2 = engine.open_session(user="cache-b")
    with cache_scope(s2._cached):
        df = persisted(spark.range(10).toDF("n"))
    df.count()
    engine.sessions.close_session(s1.handle)  # must not touch s2's cache
    assert df in s2._cached
    assert df.storageLevel.useMemory or df.storageLevel.useDisk
    engine.sessions.close_session(s2.handle)
    assert df not in s2._cached


def test_async_operation_persists_land_in_session_scope(spark, sf_dir):
    """An ASYNC operation executes on a fresh thread; Operation.run() must
    copy the ContextVar context so persisted() calls made inside the worker
    register in the owning session's cache registry (not the process-global
    fallback) and are released by Session.close().  Regression for the
    round-5 scoped-caching change, which leaked async-statement persists
    for the life of the gateway process."""
    from kyuubi_spark.caching import _TRACKED, persisted
    from kyuubi_spark.gateway.engine import Engine
    from kyuubi_spark.gateway.operations import ExecuteStatement

    class PersistingStatement(ExecuteStatement):
        def _execute(self):
            self.captured = persisted(
                self.session.engine.root_spark.range(10).toDF("n")
            )
            self.captured.count()
            self.result = self.captured

    engine = Engine(spark)
    sess = engine.open_session(user="cache-async")
    global_before = len(_TRACKED)
    from kyuubi_spark.caching import cache_scope

    with cache_scope(sess._cached):
        op = PersistingStatement(sess, "SELECT 1", should_run_async=True)
        op.run()
    op.wait()
    assert len(_TRACKED) == global_before  # did NOT leak to the global registry
    assert op.captured in sess._cached     # landed in the session scope
    engine.sessions.close_session(sess.handle)
    assert op.captured not in sess._cached


def test_agent_operation_persists_scoped_to_session(spark, sf_dir):
    """execute_agent() routes its (async) operation through the session
    cache scope so agent-run persists are released on Session.close()."""
    from kyuubi_spark.caching import _TRACKED
    from kyuubi_spark.gateway.agent import execute_agent
    from kyuubi_spark.gateway.engine import Engine

    engine = Engine(spark)
    sess = engine.open_session(user="cache-agent")
    global_before = len(_TRACKED)
    op = execute_agent(sess, "count the orders table rows", run_async=True)
    op.wait()
    assert len(_TRACKED) == global_before
    engine.sessions.close_session(sess.handle)
