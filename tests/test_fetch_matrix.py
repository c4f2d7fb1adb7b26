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
