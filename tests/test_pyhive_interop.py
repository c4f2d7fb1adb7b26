"""Independent-client interop: the REFERENCE's own PyHive DBAPI client
(public Apache code under python/pyhive, serialized by Apache-thrift-
GENERATED TCLIService code) drives this repo's thrift frontend.

Every other wire test uses this repo's hand-rolled ThriftClient — a bug
mirrored between our client and server would go unseen.  PyHive's
struct layouts, field ids, null-bitmask decoding, and call sequences
are independent; only the byte-level binary-protocol primitives come
from the local shim (tests/pyhive_shim — the Apache `thrift` runtime
is not installable here; the gate below documents that).

Gate: KYUUBI_PYHIVE_PATH (default /root/reference/python) must contain
pyhive/ + TCLIService/; the suite SKIPS when the client is unavailable.
"""

from __future__ import annotations

import os
import sys

import pytest

PYHIVE_PATH = os.environ.get("KYUUBI_PYHIVE_PATH", "/root/reference/python")
SHIM_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pyhive_shim")

_SHIM_MODULES = ("thrift", "future", "past")
_CLIENT_MODULES = ("pyhive", "TCLIService")


@pytest.fixture(scope="module")
def pyhive_env():
    if not os.path.isdir(os.path.join(PYHIVE_PATH, "pyhive")):
        pytest.skip(f"pyhive client not available at {PYHIVE_PATH} "
                    "(set KYUUBI_PYHIVE_PATH)")
    # the client + shim must not leak into other tests' import space
    saved = {
        name: mod for name, mod in sys.modules.items()
        if name.split(".")[0] in _SHIM_MODULES + _CLIENT_MODULES
    }
    for name in list(sys.modules):
        if name.split(".")[0] in _SHIM_MODULES + _CLIENT_MODULES:
            del sys.modules[name]
    sys.path.insert(0, SHIM_PATH)
    sys.path.insert(0, PYHIVE_PATH)
    try:
        import pyhive.hive as hive

        yield hive
    finally:
        sys.path.remove(SHIM_PATH)
        sys.path.remove(PYHIVE_PATH)
        for name in list(sys.modules):
            if name.split(".")[0] in _SHIM_MODULES + _CLIENT_MODULES:
                del sys.modules[name]
        sys.modules.update(saved)


@pytest.fixture(scope="module")
def frontend(spark):
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.thrift import ThriftFrontendService

    svc = ThriftFrontendService(Engine(spark=spark)).start()
    yield svc
    svc.stop()


def test_pyhive_connect_select_fetch(pyhive_env, frontend):
    hive = pyhive_env
    conn = hive.Connection(
        host=frontend.host, port=frontend.port,
        username="pyhive_user", auth="NOSASL", database="default",
    )
    try:
        cur = conn.cursor()
        cur.execute(
            "SELECT id AS i, CAST(id AS DOUBLE)/4 AS d, "
            "CONCAT('r', id) AS s, MOD(id, 2) = 0 AS b "
            "FROM range(6) ORDER BY id"
        )
        # description via GetResultSetMetadata through the generated code
        names = [d[0] for d in cur.description]
        types = [d[1] for d in cur.description]
        assert names == ["i", "d", "s", "b"]
        assert types == ["BIGINT_TYPE", "DOUBLE_TYPE", "STRING_TYPE",
                         "BOOLEAN_TYPE"]
        rows = cur.fetchall()
        assert rows == [(i, i / 4, f"r{i}", i % 2 == 0) for i in range(6)]
        cur.close()
    finally:
        conn.close()


def test_pyhive_nulls_and_types(pyhive_env, frontend):
    """Null bitmask decoding + string-carried types through PyHive's own
    _unwrap_column (independent of this repo's wire decoding)."""
    hive = pyhive_env
    conn = hive.Connection(
        host=frontend.host, port=frontend.port,
        username="pyhive_user", auth="NOSASL", database="default",
    )
    try:
        cur = conn.cursor()
        cur.execute(
            "SELECT CASE WHEN id = 1 THEN NULL ELSE id END AS v, "
            "DATE '2018-11-17' AS dt, 1.25BD AS dec "
            "FROM range(3) ORDER BY id"
        )
        rows = cur.fetchall()
        assert [r[0] for r in rows] == [0, None, 2]
        assert all(str(r[1]) == "2018-11-17" for r in rows)
        assert all(str(r[2]) in ("1.25", "1.250") for r in rows)
        cur.close()
    finally:
        conn.close()


def test_pyhive_async_poll_and_logs(pyhive_env, frontend):
    """Async submission + GetOperationStatus polling + the operation-log
    channel (FetchResults fetchType=1), all through PyHive."""
    import time

    hive = pyhive_env
    from TCLIService import ttypes

    conn = hive.Connection(
        host=frontend.host, port=frontend.port,
        username="pyhive_user", auth="NOSASL", database="default",
    )
    try:
        cur = conn.cursor()
        cur.execute("SELECT COUNT(*) AS n FROM range(100000)", async_=True)
        deadline = time.time() + 60
        while time.time() < deadline:
            st = cur.poll(get_progress_update=False).operationState
            if st in (
                ttypes.TOperationState.FINISHED_STATE,
                ttypes.TOperationState.ERROR_STATE,
            ):
                break
            time.sleep(0.1)
        assert st == ttypes.TOperationState.FINISHED_STATE
        logs = cur.fetch_logs()
        assert isinstance(logs, list)
        assert cur.fetchall() == [(100000,)]
        cur.close()
    finally:
        conn.close()


def test_pyhive_cancel(pyhive_env, frontend):
    hive = pyhive_env
    conn = hive.Connection(
        host=frontend.host, port=frontend.port,
        username="pyhive_user", auth="NOSASL", database="default",
    )
    try:
        cur = conn.cursor()
        cur.execute(
            "SELECT COUNT(*) FROM range(100000000) a CROSS JOIN range(10000) b",
            async_=True,
        )
        cur.cancel()
        # a fresh statement on the same connection still works
        cur.execute("SELECT 1 AS one")
        assert cur.fetchall() == [(1,)]
        cur.close()
    finally:
        conn.close()
