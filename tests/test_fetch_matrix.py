"""Fetch-orientation × collect-mode matrix over the thrift wire.

Reference: ExecuteStatement.scala:161-209 (four collect modes) ×
FetchIterator.scala:23-128 (cursor semantics).  Array-backed cursors
(collect / take(n)) honor FETCH_PRIOR and FETCH_FIRST exactly; the
iterable-backed cursors (incremental toLocalIterator, spill+stream)
are forward-only — rewinding orientations are NO-OPS past the consumed
prefix and degrade to FETCH_NEXT, the same punt the reference documents
at FetchIterator.scala:121-128 (and enforces for the incremental JDBC
engine by rejecting non-NEXT outright).  This matrix pins both halves
through the real wire path, spill included.
"""

from __future__ import annotations

import pytest

from kyuubi_spark.gateway import Engine
from kyuubi_spark.gateway.thrift import ThriftClient, ThriftFrontendService

# HS2 TFetchOrientation wire values
NEXT, PRIOR, FIRST = 0, 1, 4

SQL = "SELECT id FROM range(10) ORDER BY id"

MODE_CONF = {
    "collect": {},
    "take": {"kyuubi.operation.result.max.rows": "10"},
    "incremental": {"kyuubi.operation.incremental.collect": "true"},
    "spill": {
        "kyuubi.operation.result.saveToFile.enabled": "true",
        "kyuubi.operation.result.saveToFile.minSize": "0",
    },
}
REWINDABLE = {"collect": True, "take": True,
              "incremental": False, "spill": False}


@pytest.fixture(scope="module", params=["inproc", "process"])
def thrift_matrix_server(request, spark, launched_wire):
    """Both halves of the reference's shared-suite pattern: the matrix
    runs against the in-proc engine AND through a gateway-LAUNCHED engine
    OS process (three processes: client -> gateway -> child engine; the
    session conf that selects the collect mode must forward to the child
    on open — KyuubiSessionImpl.openEngineSession's normalizedConf)."""
    if request.param == "process":
        yield launched_wire.host, launched_wire.port, launched_wire.launch_conf
        return
    svc = ThriftFrontendService(Engine(spark=spark)).start()
    yield svc.host, svc.port, {}
    svc.stop()


def _rows(batch):
    return [r[0] for r in batch]


@pytest.mark.parametrize("mode", list(MODE_CONF))
def test_fetch_orientation_matrix(thrift_matrix_server, mode):
    host, port, extra = thrift_matrix_server
    c = ThriftClient(host, port)
    c.open_session(user="wire", conf={**MODE_CONF[mode], **extra})
    try:
        op = c.execute(SQL)
        # page forward twice
        assert _rows(c.fetch(op, 3, orientation=NEXT)) == [0, 1, 2]
        assert _rows(c.fetch(op, 3, orientation=NEXT)) == [3, 4, 5]
        if REWINDABLE[mode]:
            # PRIOR re-serves the window before the last one
            assert _rows(c.fetch(op, 3, orientation=PRIOR)) == [0, 1, 2]
            # FIRST rewinds to the absolute start
            assert _rows(c.fetch(op, 4, orientation=FIRST)) == [0, 1, 2, 3]
            # and NEXT continues from there
            assert _rows(c.fetch(op, 3, orientation=NEXT)) == [4, 5, 6]
        else:
            # forward-only cursor: rewinds are no-ops past the consumed
            # prefix — PRIOR/FIRST just keep streaming forward
            # (FetchIterator.scala:121-128)
            assert _rows(c.fetch(op, 2, orientation=PRIOR)) == [6, 7]
            assert _rows(c.fetch(op, 2, orientation=FIRST)) == [8, 9]
            assert _rows(c.fetch(op, 2, orientation=NEXT)) == []
        c.close_operation(op)
    finally:
        c.close_session()
        c.close()


def test_spill_mode_really_spilled(spark):
    """minSize=0 forces the spill path: the operation logs the spill dir
    and streams the parquet back — proving the matrix's 'spill' column
    exercised IterableFetchIterator over a re-read, not collect()."""
    from kyuubi_spark.gateway.state import FetchOrientation

    eng = Engine(spark=spark)
    s = eng.open_session(
        user="spiller",
        conf=MODE_CONF["spill"],
    )
    op = s.execute_statement(SQL)
    logs = op.fetch_log(100)
    assert any("spilling result to" in line for line in logs)
    rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 100)
    assert [r[0] for r in rows] == list(range(10))
    eng.close_session(s.handle)


def test_take_mode_truncates_at_max_rows(spark):
    from kyuubi_spark.gateway.state import FetchOrientation

    eng = Engine(spark=spark)
    s = eng.open_session(
        user="taker",
        conf={"kyuubi.operation.result.max.rows": "4"},
    )
    op = s.execute_statement(SQL)
    rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 100)
    assert [r[0] for r in rows] == [0, 1, 2, 3]  # truncated by take(4)
    # and the truncated result still rewinds (array-backed)
    rows = op.get_next_row_set(FetchOrientation.FETCH_FIRST, 2)
    assert [r[0] for r in rows] == [0, 1]
    eng.close_session(s.handle)


def test_large_result_pages_through_launched_engine(launched_wire):
    """10k rows in spill+stream mode paged 1000-at-a-time through THREE
    processes (client -> gateway -> child engine): every page arrives in
    order and complete, and no hop ever materializes the full result
    (the child spills, the gateway relays page-by-page)."""
    c = ThriftClient(launched_wire.host, launched_wire.port)
    c.open_session(
        user="wire",
        conf={
            "kyuubi.operation.result.saveToFile.enabled": "true",
            "kyuubi.operation.result.saveToFile.minSize": "0",
            **launched_wire.launch_conf,
        },
    )
    try:
        op = c.execute("SELECT id FROM range(10000) ORDER BY id")
        got, pages = [], 0
        while True:
            page = [r[0] for r in c.fetch(op, 1000)]
            if not page:
                break
            pages += 1
            got.extend(page)
        assert pages >= 10
        assert got == list(range(10000))
        c.close_operation(op)
    finally:
        c.close_session()
        c.close()


@pytest.mark.parametrize("mode", list(MODE_CONF))
def test_rest_fetch_orientation_matrix(spark, mode):
    """The same orientation x collect-mode matrix through the REST
    frontend: /operations/{oid}/rowset?orientation= maps straight onto
    the operation cursor, so array-backed modes rewind exactly and
    iterable-backed modes degrade to forward streaming — parity with the
    thrift wire rows above."""
    import json
    import urllib.request

    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.rest import RestGateway

    gw = RestGateway(Engine(spark=spark)).start()

    def call(method, path, body=None):
        url = f"http://127.0.0.1:{gw.port}{path}"
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, method=method)
        if data:
            req.add_header("Content-Type", "application/json")
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    def fetch(oid, n, orientation):
        page = call(
            "GET",
            f"/api/v1/operations/{oid}/rowset?maxrows={n}"
            f"&orientation={orientation}",
        )
        return [r[0] for r in page["rows"]]

    try:
        s = call(
            "POST", "/api/v1/sessions",
            {"user": "rest_matrix", "conf": MODE_CONF[mode]},
        )
        op = call(
            "POST", f"/api/v1/sessions/{s['identifier']}/operations",
            {"statement": SQL},
        )
        oid = op["identifier"]
        assert fetch(oid, 3, "FETCH_NEXT") == [0, 1, 2]
        assert fetch(oid, 3, "FETCH_NEXT") == [3, 4, 5]
        if REWINDABLE[mode]:
            assert fetch(oid, 3, "FETCH_PRIOR") == [0, 1, 2]
            assert fetch(oid, 4, "FETCH_FIRST") == [0, 1, 2, 3]
            assert fetch(oid, 3, "FETCH_NEXT") == [4, 5, 6]
        else:
            assert fetch(oid, 2, "FETCH_PRIOR") == [6, 7]
            assert fetch(oid, 2, "FETCH_FIRST") == [8, 9]
            assert fetch(oid, 2, "FETCH_NEXT") == []
        call("DELETE", f"/api/v1/operations/{oid}")
        call("DELETE", f"/api/v1/sessions/{s['identifier']}")
    finally:
        gw.shutdown()


def test_trino_fetch_retry_matrix(spark):
    """The Trino-frontend row of the matrix: the wire protocol is
    forward-only (nextUri continuation), so HS2's FETCH_PRIOR surfaces
    in the only form the protocol allows — an idempotent RETRY of the
    last nextUri (io.trino.client retries a GET whose response it lost),
    which must re-serve the SAME page, including the FINAL page; older
    tokens (a true rewind) are rejected, matching the reference's
    forward-only punt for iterable cursors."""
    import json
    import urllib.request
    from urllib.error import HTTPError

    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.trino import TrinoGateway

    svc = TrinoGateway(Engine(spark=spark), page_size=4).start()

    def get(url):
        with urllib.request.urlopen(url) as r:
            return json.loads(r.read())

    try:
        req = urllib.request.Request(
            f"http://{svc.host}:{svc.port}/v1/statement",
            data=SQL.encode(),
            headers={"X-Trino-User": "retry_matrix"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            p1 = json.loads(r.read())
        assert [r[0] for r in p1["data"]] == [0, 1, 2, 3]

        uri2 = p1["nextUri"]
        p2 = get(uri2)
        assert [r[0] for r in p2["data"]] == [4, 5, 6, 7]

        # idempotent retry: same URI again -> SAME page, cursor unmoved
        assert get(uri2) == p2

        # a token older than the retry window is a rewind the protocol
        # cannot honor -> explicit error, not silent data
        stale = uri2.rsplit("/", 1)[0] + "/0"
        err = get(stale)
        assert err["stats"]["state"] == "FAILED"
        assert "invalid page token" in err["error"]["message"]

        # after the retry, forward resumes exactly where it left off
        p3 = get(p2["nextUri"])
        assert [r[0] for r in p3["data"]] == [8, 9]
        assert p3["stats"]["state"] == "FINISHED"

        # FINAL page is retryable too (the finished query is retained)
        assert get(p2["nextUri"]) == p3
    finally:
        svc.stop()
