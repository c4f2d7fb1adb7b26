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
