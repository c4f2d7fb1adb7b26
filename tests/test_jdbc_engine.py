"""JDBC engine — statements executed directly on a backend database with
the gateway's operation/fetch surface (reference: externals/
kyuubi-jdbc-engine ExecuteStatement.scala:46-97, metadata operations,
per-session connections)."""

import pytest

from kyuubi_spark.gateway.jdbc_engine import JdbcEngine
from kyuubi_spark.gateway.state import OperationState


@pytest.fixture()
def duck():
    eng = JdbcEngine.duckdb()
    s = eng.open_session(user="jdbc-tester")
    s.execute_statement("CREATE TABLE t (k INTEGER, v VARCHAR)")
    s.execute_statement(
        "INSERT INTO t VALUES (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')"
    )
    yield eng, s
    eng.close_session(s.handle)


def test_query_schema_and_rows(duck):
    _, s = duck
    op = s.execute_statement("SELECT k, v FROM t ORDER BY k")
    assert op.state is OperationState.FINISHED
    assert [c[0] for c in op.schema] == ["k", "v"]
    assert op.fetch(max_rows=10) == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_fetch_orientation_full_collect(duck):
    _, s = duck
    op = s.execute_statement("SELECT k FROM t ORDER BY k")
    assert op.fetch("FETCH_NEXT", 2) == [(1,), (2,)]
    assert op.fetch("FETCH_NEXT", 2) == [(3,), (4,)]
    assert op.fetch("FETCH_PRIOR", 2) == [(1,), (2,)]
    assert op.fetch("FETCH_FIRST", 3) == [(1,), (2,), (3,)]


def test_incremental_collect_streams_next_only(duck):
    _, s = duck
    op = s.execute_statement(
        "SELECT k FROM t ORDER BY k", incremental=True, fetch_size=2
    )
    assert op.fetch("FETCH_NEXT", 2) == [(1,), (2,)]
    # ExecuteStatement.validateFetchOrientation: incremental = NEXT only
    with pytest.raises(ValueError, match="not supported of incremental"):
        op.fetch("FETCH_PRIOR", 2)
    assert op.fetch("FETCH_NEXT", 10) == [(3,), (4,)]


def test_update_count_shape_sqlite():
    # sqlite's DBAPI reports no result set for DML -> the (result INT)
    # update-count relation (ExecuteStatement.scala:77-88)
    eng = JdbcEngine.sqlite()
    s = eng.open_session()
    s.execute_statement("CREATE TABLE u (x INTEGER)")
    op = s.execute_statement("INSERT INTO u VALUES (1), (2), (3)")
    assert op.schema == [("result", "INTEGER")]
    assert op.fetch() == [(3,)]
    eng.close_session(s.handle)


def test_error_surfaces_in_state_and_log(duck):
    _, s = duck
    op = s.execute_statement("SELECT * FROM missing_table")
    assert op.state is OperationState.ERROR
    assert op.exception is not None
    assert any("missing_table" in line for line in op.log)


def test_async_statement(duck):
    _, s = duck
    op = s.execute_statement("SELECT count(*) AS n FROM t", run_async=True)
    op.wait(10)
    assert op.state is OperationState.FINISHED
    assert op.fetch() == [(4,)]


def test_metadata_ops_duckdb(duck):
    _, s = duck
    tables = s.get_tables()
    rows = tables.fetch(max_rows=100)
    names = [r[2] for r in rows]
    assert "t" in names
    cols = s.get_columns("t").fetch(max_rows=100)
    assert [(r[2], r[4]) for r in cols] == [("k", 1), ("v", 2)]
    cats = s.get_catalogs().fetch(max_rows=10)
    assert len(cats) >= 1
    schemas = s.get_schemas().fetch(max_rows=100)
    assert ("main",) in [(r[0],) for r in schemas]
    tt = s.get_table_types().fetch()
    assert tt == [("TABLE",), ("VIEW",)]
    ti = s.get_type_info().fetch(max_rows=50)
    assert ("BIGINT", -5) in ti


def test_metadata_ops_sqlite():
    eng = JdbcEngine.sqlite()
    s = eng.open_session()
    s.execute_statement("CREATE TABLE m (a INTEGER, b TEXT)")
    rows = s.get_tables().fetch(max_rows=10)
    assert [r[2] for r in rows] == ["m"]
    cols = s.get_columns("m").fetch(max_rows=10)
    assert [(r[2], r[3], r[4]) for r in cols] == [
        ("a", "INTEGER", 1), ("b", "TEXT", 2),
    ]
    eng.close_session(s.handle)


def test_current_database(duck):
    _, s = duck
    assert s.get_current_database() == "memory"


def test_session_isolation_two_connections():
    # per-session connections over one embedded database: DDL from one is
    # visible to the other (shared db), temp state is not
    eng = JdbcEngine.duckdb()
    s1 = eng.open_session(user="a")
    s2 = eng.open_session(user="b")
    s1.execute_statement("CREATE TABLE shared (x INTEGER)")
    s1.execute_statement("CREATE TEMP TABLE mine (y INTEGER)")
    assert s2.execute_statement("SELECT count(*) FROM shared").fetch() == [(0,)]
    op = s2.execute_statement("SELECT * FROM mine")
    assert op.state is OperationState.ERROR  # temp is session-scoped
    eng.close_session(s1.handle)
    eng.close_session(s2.handle)


def test_cancel_terminal_and_safe(duck):
    _, s = duck
    op = s.execute_statement("SELECT 1", run_async=True)
    op.wait(10)
    op.cancel()  # cancel after finish: no-op (terminal state preserved)
    assert op.state is OperationState.FINISHED


def test_cancel_before_worker_start_wins(duck):
    """A cancel that lands before the async worker thread begins must not
    be overwritten by the worker's RUNNING transition — the operation
    stays CANCELED and the statement is never executed."""
    from kyuubi_spark.gateway.jdbc_engine import JdbcOperation

    _, s = duck
    op = JdbcOperation(s, "INSERT INTO t VALUES (99, 'z')",
                       should_run_async=True)
    op.cancel()  # terminal state set before run()
    op._guarded()  # worker body runs after — must early-return
    assert op.state is OperationState.CANCELED
    check = s.execute_statement("SELECT count(*) AS c FROM t WHERE k = 99")
    assert check.fetch() == [(0,)]


def test_query_timeout_marks_timeout_state():
    """addTimeoutMonitor semantics: a statement past its queryTimeout
    flips to TIMEOUT (not ERROR) and interrupts the backend."""
    import time

    eng = JdbcEngine.duckdb()
    s = eng.open_session()
    # a deliberately slow cross-product aggregation
    op = s.execute_statement(
        "SELECT count(*) FROM range(100000) a, range(100000) b",
        run_async=True,
        query_timeout=0.2,
    )
    op.wait(20)
    assert op.state is OperationState.TIMEOUT
    assert any("timed out" in line for line in op.log)
    # the session connection stays usable afterwards
    ok = s.execute_statement("SELECT 1")
    assert ok.fetch() == [(1,)]
    eng.close_session(s.handle)


def test_fast_query_unaffected_by_timeout():
    eng = JdbcEngine.duckdb()
    s = eng.open_session()
    op = s.execute_statement("SELECT 5", query_timeout=30.0)
    assert op.state is OperationState.FINISHED
    assert op.fetch() == [(5,)]
    eng.close_session(s.handle)
