"""Engine-type routing: gateway sessions served by the JDBC engine
(kyuubi.engine.type=JDBC) through the unchanged frontends."""

import json
import urllib.request

import pytest

from kyuubi_spark.gateway.state import FetchOrientation, OperationState


def test_inproc_session_routes_to_jdbc_engine(spark, sf_dir):
    from kyuubi_spark.gateway.engine import Engine

    engine = Engine(spark)
    s = engine.open_session(
        user="router",
        conf={
            "kyuubi.engine.type": "JDBC",
            "kyuubi.engine.jdbc.connection.url": "jdbc:duckdb::memory:",
        },
    )
    s.execute_statement("CREATE TABLE jt (k INTEGER, v VARCHAR)")
    s.execute_statement("INSERT INTO jt VALUES (1, 'a'), (2, 'b')")
    op = s.execute_statement("SELECT k, v FROM jt ORDER BY k")
    assert op.state is OperationState.FINISHED
    schema = op.get_result_set_schema()
    assert [f.name for f in schema.fields] == ["k", "v"]
    assert [f.dataType.simpleString() for f in schema.fields] == ["bigint", "string"]
    rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 10)
    assert [tuple(r) for r in rows] == [(1, "a"), (2, "b")]
    # metadata through the same session surface
    tbl = s.get_tables(schema_pattern="main")
    names = [r[2] for r in tbl.get_next_row_set(FetchOrientation.FETCH_NEXT, 50)]
    assert "jt" in names
    engine.close_session(s.handle)


def test_jdbc_backed_fetch_windows(spark, sf_dir):
    from kyuubi_spark.gateway.engine import Engine

    engine = Engine(spark)
    s = engine.open_session(
        user="router2", conf={"kyuubi.engine.type": "JDBC"}
    )
    s.execute_statement("CREATE TABLE w (x INTEGER)")
    s.execute_statement("INSERT INTO w SELECT * FROM range(10)")
    op = s.execute_statement("SELECT x FROM w ORDER BY x")
    op.get_result_set_schema()
    first = [r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_NEXT, 4)]
    second = [r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_NEXT, 4)]
    assert first == [0, 1, 2, 3] and second == [4, 5, 6, 7]
    again = [r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_FIRST, 3)]
    assert again == [0, 1, 2]
    engine.close_session(s.handle)


def test_thrift_wire_to_duckdb_backend(spark, sf_dir):
    """A thrift client opens a JDBC-engine session and runs SQL on the
    embedded DuckDB backend over the same wire that serves Spark."""
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.thrift import ThriftClient, ThriftFrontendService

    svc = ThriftFrontendService(Engine(spark=spark)).start()
    try:
        c = ThriftClient(svc.host, svc.port)
        c.open_session(
            user="wire",
            conf={
                "kyuubi.engine.type": "JDBC",
                "kyuubi.engine.jdbc.connection.url": "jdbc:duckdb::memory:",
            },
        )
        c.execute("CREATE TABLE t2 (a INTEGER)")
        c.execute("INSERT INTO t2 VALUES (7), (8)")
        op = c.execute("SELECT a FROM t2 ORDER BY a")
        rows = c.fetch(op, 10)
        assert [r[0] for r in rows] == [7, 8]
        c.close_session()
        c.close()
    finally:
        svc.stop()


def test_error_shape_through_router(spark, sf_dir):
    from kyuubi_spark.gateway.engine import Engine

    engine = Engine(spark)
    s = engine.open_session(user="router3", conf={"kyuubi.engine.type": "JDBC"})
    op = s.execute_statement("SELECT * FROM nope")
    assert op.state is OperationState.ERROR
    assert "nope" in str(op.exception)
    assert any("nope" in line for line in op.get_operation_log())
    engine.close_session(s.handle)


def test_routed_metadata_completeness(spark, sf_dir):
    """The full JDBC-metadata surface works on routed sessions (empty
    shapes where the backend has no concept, like the reference)."""
    from kyuubi_spark.gateway.engine import Engine

    engine = Engine(spark)
    s = engine.open_session(user="meta", conf={"kyuubi.engine.type": "JDBC"})
    assert s.get_functions().get_next_row_set(FetchOrientation.FETCH_NEXT, 5) == []
    assert s.get_primary_keys().get_next_row_set(FetchOrientation.FETCH_NEXT, 5) == []
    tt = s.get_table_types().get_next_row_set(FetchOrientation.FETCH_NEXT, 5)
    assert ("TABLE",) in [tuple(r) for r in tt]
    engine.close_session(s.handle)
