"""Trino-protocol frontend: statement POST, nextUri paging, errors, cancel.

Shape parity with the reference's KyuubiTrinoFrontendService: any Trino
REST client can POST SQL and page through QueryResults JSON.
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from kyuubi_spark.gateway.trino import TrinoGateway


@pytest.fixture(scope="module")
def trino_server(spark):
    from kyuubi_spark.gateway import Engine

    svc = TrinoGateway(Engine(spark=spark), page_size=5).start()
    yield svc
    svc.stop()


def _post(svc, sql: str, user: str = "trino_tester") -> dict:
    req = urllib.request.Request(
        f"http://{svc.host}:{svc.port}/v1/statement",
        data=sql.encode(),
        headers={"X-Trino-User": user},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def _get(uri: str) -> dict:
    with urllib.request.urlopen(uri) as r:
        return json.loads(r.read())


def test_statement_single_page(trino_server):
    out = _post(trino_server, "SELECT 1 AS a, 'x' AS b, CAST(2.5 AS DOUBLE) AS c")
    assert [c["name"] for c in out["columns"]] == ["a", "b", "c"]
    assert [c["type"] for c in out["columns"]] == ["integer", "varchar", "double"]
    assert out["data"] == [[1, "x", 2.5]]
    assert out["stats"]["state"] == "FINISHED"
    assert "nextUri" not in out


def test_statement_pages_through_next_uri(trino_server):
    out = _post(trino_server, "SELECT id FROM range(12) ORDER BY id")
    got = [r[0] for r in out["data"]]
    while "nextUri" in out:
        out = _get(out["nextUri"])
        got.extend(r[0] for r in out["data"])
    assert got == list(range(12))
    assert out["stats"]["state"] == "FINISHED"


def test_statement_error_shape(trino_server):
    out = _post(trino_server, "SELECT * FROM no_such_trino_table")
    assert out["stats"]["state"] == "FAILED"
    assert "no_such_trino_table" in out["error"]["message"]


def test_complex_types_render_varchar(trino_server):
    out = _post(trino_server, "SELECT array(1,2) AS a, named_struct('f', 1) AS s")
    assert [c["type"] for c in out["columns"]] == ["varchar", "varchar"]
    assert out["data"] == [["[1,2]", '{"f":1}']]


def test_sessions_are_per_user(trino_server):
    _post(trino_server, "SET trino.test.flag=alice_only", user="alice")
    out = _post(trino_server, "SET trino.test.flag", user="bob")
    assert out["data"][0][1] != "alice_only"


def test_jdbc_metadata_schemas_catalogs(trino_server):
    """trino-jdbc DatabaseMetaData SQL (system.jdbc.*) is translated to
    the gateway's metadata operations (KyuubiTrinoFeBaseParser.g4:26-62,
    KyuubiTrinoOperationTranslator.scala:39-60)."""
    out = _post(
        trino_server,
        "SELECT TABLE_SCHEM, TABLE_CATALOG FROM system.jdbc.schemas "
        "ORDER BY TABLE_CATALOG, TABLE_SCHEM",
    )
    schemas = [r[0] for r in out["data"]]
    assert "default" in schemas
    out = _post(
        trino_server, "SELECT TABLE_CAT FROM system.jdbc.catalogs ORDER BY TABLE_CAT"
    )
    assert ["spark_catalog"] in out["data"]


def test_jdbc_metadata_tables_and_columns(trino_server, spark):
    spark.sql("CREATE TABLE IF NOT EXISTS trino_meta_t (k INT, v STRING) USING parquet")
    try:
        out = _post(
            trino_server,
            "SELECT TABLE_CAT, TABLE_SCHEM, TABLE_NAME, TABLE_TYPE, REMARKS, "
            "TYPE_CAT, TYPE_SCHEM, TYPE_NAME, SELF_REFERENCING_COL_NAME, "
            "REF_GENERATION FROM system.jdbc.tables WHERE "
            "TABLE_SCHEM LIKE 'default' AND TABLE_NAME LIKE 'trino_meta%' "
            "ORDER BY TABLE_TYPE, TABLE_CAT, TABLE_SCHEM, TABLE_NAME",
        )
        names = [r[2] for r in out["data"]]
        assert "trino_meta_t" in names
        out = _post(
            trino_server,
            "SELECT TABLE_CAT, TABLE_SCHEM, TABLE_NAME, COLUMN_NAME FROM "
            "system.jdbc.columns WHERE TABLE_NAME LIKE 'trino_meta_t' "
            "ORDER BY TABLE_CAT, TABLE_SCHEM, TABLE_NAME, ORDINAL_POSITION",
        )
        col_idx = [c["name"].upper() for c in out["columns"]].index("COLUMN_NAME")
        cols = [r[col_idx] for r in out["data"]]
        assert "k" in cols and "v" in cols
    finally:
        spark.sql("DROP TABLE IF EXISTS trino_meta_t")


def test_jdbc_metadata_table_types_types_pk(trino_server):
    out = _post(
        trino_server,
        "SELECT TABLE_TYPE FROM system.jdbc.table_types ORDER BY TABLE_TYPE",
    )
    assert [r[0] for r in out["data"]]  # at least TABLE/VIEW rows
    out = _post(
        trino_server,
        "SELECT TYPE_NAME, DATA_TYPE, PRECISION, LITERAL_PREFIX, LITERAL_SUFFIX, "
        "CREATE_PARAMS, NULLABLE, CASE_SENSITIVE, SEARCHABLE, UNSIGNED_ATTRIBUTE, "
        "FIXED_PREC_SCALE, AUTO_INCREMENT, LOCAL_TYPE_NAME, MINIMUM_SCALE, "
        "MAXIMUM_SCALE, SQL_DATA_TYPE, SQL_DATETIME_SUB, NUM_PREC_RADIX "
        "FROM system.jdbc.types ORDER BY DATA_TYPE",
    )
    assert out["data"]
    # primary keys: the literal WHERE FALSE projection -> empty, 6 columns
    out = _post(
        trino_server,
        "SELECT CAST(NULL AS varchar) TABLE_CAT, CAST(NULL AS varchar) "
        "TABLE_SCHEM, CAST(NULL AS varchar) TABLE_NAME, CAST(NULL AS varchar) "
        "COLUMN_NAME, CAST(NULL AS smallint) KEY_SEQ, CAST(NULL AS varchar) "
        "PK_NAME WHERE FALSE",
    )
    assert out["data"] == []
    assert len(out["columns"]) == 6


def test_prepare_execute_deallocate(trino_server):
    out = _post(trino_server, "PREPARE q1 FROM SELECT ? + 1 AS n")
    assert out["updateType"] == "PREPARE"
    assert out["stats"]["state"] == "FINISHED"
    out = _post(trino_server, "EXECUTE q1 USING 41")
    assert out["data"] == [[42]]
    out = _post(trino_server, "DEALLOCATE PREPARE q1")
    assert out["updateType"] == "DEALLOCATE"
    out = _post(trino_server, "EXECUTE q1 USING 1")
    assert out["stats"]["state"] == "FAILED"
    assert "not found" in out["error"]["message"]


def test_prepare_execute_multiple_params_and_quotes(trino_server):
    _post(trino_server, "PREPARE q2 FROM SELECT ? AS a, ? AS b")
    out = _post(trino_server, "EXECUTE q2 USING 'x,y', 7")
    assert out["data"] == [["x,y", 7]]
    _post(trino_server, "DEALLOCATE PREPARE q2")


def test_prepare_execute_question_mark_in_param(trino_server):
    """A parameter value containing '?' must not be re-scanned as a
    placeholder, and '?' inside a string literal of the prepared SQL is
    literal text — real Trino locates placeholders syntactically."""
    _post(trino_server, "PREPARE q3 FROM SELECT ? AS a, ? AS b")
    out = _post(trino_server, "EXECUTE q3 USING 'x?y', 1")
    assert out["data"] == [["x?y", 1]]
    _post(trino_server, "DEALLOCATE PREPARE q3")
    # '?' inside a literal is not a parameter slot
    _post(trino_server, "PREPARE q4 FROM SELECT 'lit?' AS a, ? AS b")
    out = _post(trino_server, "EXECUTE q4 USING 9")
    assert out["data"] == [["lit?", 9]]
    _post(trino_server, "DEALLOCATE PREPARE q4")


def test_bind_placeholders_unit():
    from kyuubi_spark.gateway.trino import _bind_placeholders

    assert _bind_placeholders("a = ? AND b = ?", ["'x?y'", "'1'"]) == (
        "a = 'x?y' AND b = '1'"
    )
    # '' escape inside a literal, placeholder after it still found
    assert _bind_placeholders("x = 'it''s?' AND y = ?", ["2"]) == (
        "x = 'it''s?' AND y = 2"
    )
    # more placeholders than params: extras stay as '?'
    assert _bind_placeholders("? + ?", ["1"]) == "1 + ?"
    # '?' inside a double-quoted identifier is part of the name, not a
    # placeholder (Trino lexes it the same way) — incl. "" escapes
    assert _bind_placeholders('SELECT "is_valid?" FROM t WHERE id = ?', ["42"]) == (
        'SELECT "is_valid?" FROM t WHERE id = 42'
    )
    assert _bind_placeholders('SELECT "a""?b", ? FROM t', ["7"]) == (
        'SELECT "a""?b", 7 FROM t'
    )


def test_session_properties_pick_jdbc_engine(trino_server):
    """X-Trino-Session properties route the backing engine: a Trino client
    can run SQL on the embedded DuckDB backend through the Trino wire."""
    req = urllib.request.Request(
        f"http://{trino_server.host}:{trino_server.port}/v1/statement",
        data=b"SELECT 40 + 2 AS a",
        headers={
            "X-Trino-User": "duck_user",
            "X-Trino-Session": "kyuubi.engine.type=JDBC,"
            "kyuubi.engine.jdbc.connection.url=jdbc:duckdb::memory:",
        },
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert out["data"] == [[42]]
    # duckdb-only syntax proves which engine served it
    out2 = _post(trino_server, "SELECT 21 * 2 AS v FROM range(1)", user="duck_user")
    assert out2["data"] == [[42]]


def test_literal_mentioning_system_jdbc_is_not_hijacked(trino_server):
    """A plain query whose STRING LITERAL contains 'from system.jdbc.x'
    must execute as a query, not be rerouted to a metadata listing —
    dispatch matches the FROM target on literal-stripped text."""
    out = _post(
        trino_server, "SELECT 'from system.jdbc.catalogs' AS s, 1 + 1 AS n"
    )
    assert out["stats"]["state"] == "FINISHED"
    assert out["data"] == [["from system.jdbc.catalogs", 2]]
    # and the REAL metadata form still routes
    out = _post(
        trino_server, "SELECT TABLE_CAT FROM system.jdbc.catalogs"
    )
    assert ["spark_catalog"] in out["data"]


def test_multi_mb_result_pages_bounded(spark):
    """r09 Next #6: a multi-MB result streams through the Trino protocol
    in BOUNDED chunks — every response body is O(page), the gateway-side
    buffer is capped (incremental collect: toLocalIterator, never a full
    collect()), and the concatenated pages are value-complete."""
    from kyuubi_spark.gateway import Engine

    svc = TrinoGateway(Engine(spark=spark), page_size=200).start()
    try:
        # ~5 MB: 5000 rows x ~1 KB payload
        sql = (
            "SELECT id, repeat(concat('x', CAST(id AS STRING)), 200) AS pad "
            "FROM range(5000) ORDER BY id"
        )
        req = urllib.request.Request(
            f"http://{svc.host}:{svc.port}/v1/statement",
            data=sql.encode(),
            headers={"X-Trino-User": "pager"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            body = r.read()
        out = json.loads(body)

        # whitebox: the live operation streams, it did not collect()
        (q,) = svc._queries.values()
        assert q.op.collect_mode == "incremental"

        page_cap = 350_000  # 200 rows x ~1 KB + JSON overhead, with slack
        assert len(body) < page_cap
        n_pages, got_rows, total_bytes = 1, len(out["data"]), len(body)
        ids = [r[0] for r in out["data"]]
        while "nextUri" in out:
            with urllib.request.urlopen(out["nextUri"]) as r:
                body = r.read()
            out = json.loads(body)
            assert len(body) < page_cap  # EVERY page bounded
            n_pages += 1
            got_rows += len(out["data"])
            total_bytes += len(body)
            ids.extend(r[0] for r in out["data"])
        assert out["stats"]["state"] == "FINISHED"
        assert got_rows == 5000 and ids == list(range(5000))
        assert n_pages >= 25  # genuinely chunked
        assert total_bytes > 4_000_000  # and genuinely multi-MB overall
    finally:
        svc.stop()
