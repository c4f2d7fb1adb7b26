"""Remote engine sessions: the gateway->engine hop over the real thrift
wire, resolved via discovery (KyuubiSessionImpl + EngineRef +
KyuubiSyncThriftClient shape). Tests self-host: the 'remote engine' is
this repo's own ThriftFrontendService."""

import pytest

from kyuubi_spark.gateway.state import FetchOrientation, OperationState


@pytest.fixture(scope="module")
def remote_engine(spark):
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.thrift import ThriftFrontendService

    svc = ThriftFrontendService(Engine(spark=spark)).start()
    yield svc
    svc.stop()


def test_session_forwards_over_the_wire(spark, sf_dir, remote_engine):
    from kyuubi_spark.gateway.engine import Engine

    gw = Engine(spark)
    s = gw.open_session(
        user="fwd",
        conf={
            "kyuubi.engine.type": "THRIFT",
            "kyuubi.engine.thrift.host": remote_engine.host,
            "kyuubi.engine.thrift.port": str(remote_engine.port),
        },
    )
    op = s.execute_statement("SELECT 41 + 1 AS answer, 'ok' AS s")
    assert op.state is OperationState.FINISHED
    schema = op.get_result_set_schema()
    assert [f.name for f in schema.fields] == ["answer", "s"]
    assert schema.fields[0].dataType.simpleString() == "int"
    rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 10)
    assert [tuple(r) for r in rows] == [(42, "ok")]
    gw.close_session(s.handle)


def test_remote_fetch_windows_and_rewind(spark, sf_dir, remote_engine):
    from kyuubi_spark.gateway.engine import Engine

    gw = Engine(spark)
    s = gw.open_session(
        user="fwd2",
        conf={
            "kyuubi.engine.type": "THRIFT",
            "kyuubi.engine.thrift.host": remote_engine.host,
            "kyuubi.engine.thrift.port": str(remote_engine.port),
        },
    )
    op = s.execute_statement("SELECT id FROM range(9) ORDER BY id")
    first = [r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_NEXT, 4)]
    second = [r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_NEXT, 4)]
    assert first == [0, 1, 2, 3] and second == [4, 5, 6, 7]
    rewound = [r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_FIRST, 3)]
    assert rewound == [0, 1, 2]
    gw.close_session(s.handle)


def test_remote_resolution_via_discovery(spark, sf_dir, remote_engine):
    """EngineRef semantics: no explicit host/port -> look the engine up in
    the discovery namespace (newest service node wins)."""
    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient
    from kyuubi_spark.gateway.engine import Engine

    disco = SqliteDiscoveryClient()
    disco.create_client()
    ns = "/kyuubi/user/fwd3"
    disco.create_and_get_service_node(
        ns, f"{remote_engine.host}:{remote_engine.port}"
    )
    gw = Engine(spark)
    gw.discovery = disco
    s = gw.open_session(
        user="fwd3",
        conf={
            "kyuubi.engine.type": "THRIFT",
            "kyuubi.engine.namespace": ns,
        },
    )
    op = s.execute_statement("SELECT 7 AS n")
    assert [r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_NEXT, 5)] == [7]
    gw.close_session(s.handle)
    with pytest.raises(LookupError):
        gw.open_session(
            user="fwd4",
            conf={
                "kyuubi.engine.type": "THRIFT",
                "kyuubi.engine.namespace": "/kyuubi/user/nobody",
            },
        )
    disco.close_client()


def test_remote_error_surfaces(spark, sf_dir, remote_engine):
    from kyuubi_spark.gateway.engine import Engine

    gw = Engine(spark)
    s = gw.open_session(
        user="fwd5",
        conf={
            "kyuubi.engine.type": "THRIFT",
            "kyuubi.engine.thrift.host": remote_engine.host,
            "kyuubi.engine.thrift.port": str(remote_engine.port),
        },
    )
    op = s.execute_statement("SELECT * FROM definitely_missing")
    assert op.state is OperationState.ERROR
    assert "definitely_missing" in str(op.exception).lower() or op.exception
    gw.close_session(s.handle)


def test_remote_metadata_pass_through(spark, sf_dir, remote_engine):
    from kyuubi_spark.gateway.engine import Engine

    gw = Engine(spark)
    s = gw.open_session(
        user="fwd6",
        conf={
            "kyuubi.engine.type": "THRIFT",
            "kyuubi.engine.thrift.host": remote_engine.host,
            "kyuubi.engine.thrift.port": str(remote_engine.port),
        },
    )
    op = s.get_table_types()
    types = [r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_NEXT, 20)]
    assert "TABLE" in types or "VIEW" in types or "MANAGED" in " ".join(map(str, types))
    op = s.get_schemas(schema_pattern="default")
    schemas = [r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_NEXT, 50)]
    assert "default" in schemas
    gw.close_session(s.handle)


def test_hive_engine_type_aliases_hs2_wire(spark, sf_dir, remote_engine):
    """kyuubi.engine.type=HIVE speaks the HS2 thrift wire (the reference's
    kyuubi-hive-engine is the same protocol client against Hive)."""
    from kyuubi_spark.gateway.engine import Engine

    gw = Engine(spark)
    s = gw.open_session(
        user="hive_fwd",
        conf={
            "kyuubi.engine.type": "HIVE",
            "kyuubi.engine.thrift.host": remote_engine.host,
            "kyuubi.engine.thrift.port": str(remote_engine.port),
        },
    )
    op = s.execute_statement("SELECT 'hs2' AS wire")
    assert [r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_NEXT, 5)] == ["hs2"]
    gw.close_session(s.handle)


def test_engine_launch_on_discovery_miss(spark, sf_dir):
    """EngineRef.getOrCreate: a namespace miss launches the engine under
    the discovery lock; concurrent opens reuse the one launched engine."""
    import threading

    from kyuubi_spark.gateway import Engine as GwEngine
    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient
    from kyuubi_spark.gateway.engine import Engine
    from kyuubi_spark.gateway.thrift import ThriftFrontendService

    disco = SqliteDiscoveryClient()
    disco.create_client()
    launched = []
    launch_lock = threading.Lock()

    def launcher(ns):
        with launch_lock:
            svc = ThriftFrontendService(GwEngine(spark=spark)).start()
            launched.append(svc)
            return f"{svc.host}:{svc.port}"

    gw = Engine(spark)
    gw.discovery = disco
    gw.engine_launcher = launcher
    ns = "/kyuubi/user/launchme"

    conf = {"kyuubi.engine.type": "THRIFT", "kyuubi.engine.namespace": ns}
    results = []

    def open_and_query(i):
        s = gw.open_session(user=f"launch{i}", conf=conf)
        op = s.execute_statement(f"SELECT {i} AS n")
        results.append(op.get_next_row_set(FetchOrientation.FETCH_NEXT, 5)[0][0])
        gw.close_session(s.handle)

    threads = [threading.Thread(target=open_and_query, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == [0, 1, 2]
    assert len(launched) == 1  # exactly ONE launch despite 3 concurrent opens
    assert disco.get_server_host(ns) is not None
    for svc in launched:
        svc.stop()
    disco.close_client()


def test_concurrent_remote_operations_serialize(spark, sf_dir, remote_engine):
    """The remote session's single thrift socket serializes RPCs — 8
    threads polling state + fetching concurrently must not corrupt the
    stream (KyuubiSyncThriftClient's per-RPC lock)."""
    import threading

    from kyuubi_spark.gateway.engine import Engine

    gw = Engine(spark)
    s = gw.open_session(
        user="concurrent",
        conf={
            "kyuubi.engine.type": "THRIFT",
            "kyuubi.engine.thrift.host": remote_engine.host,
            "kyuubi.engine.thrift.port": str(remote_engine.port),
        },
    )
    results, errors = [], []

    def worker(i):
        try:
            op = s.execute_statement(f"SELECT {i} AS n")
            _ = op.state
            rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 5)
            results.append(rows[0][0])
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert sorted(results) == list(range(8))
    gw.close_session(s.handle)


def test_forwarded_operations_land_in_op_store(spark, sf_dir, remote_engine):
    """Gateway-side accounting covers FORWARDED sessions too: a remote
    operation's statement, user, and fetched-row count appear in the
    gateway's op store (the production multi-tenant path)."""
    from kyuubi_spark.gateway.engine import Engine

    gw = Engine(spark)
    s = gw.open_session(
        user="acct_fwd",
        conf={
            "kyuubi.engine.type": "THRIFT",
            "kyuubi.engine.thrift.host": remote_engine.host,
            "kyuubi.engine.thrift.port": str(remote_engine.port),
        },
    )
    op = s.execute_statement("SELECT id FROM range(6)")
    rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 100)
    assert len(rows) == 6
    rec = gw.op_store.get(op.handle.id)
    assert rec is not None
    assert rec["collectMode"] == "forwarded"
    assert rec["user"] == "acct_fwd"
    assert rec["rowsFetched"] == 6
    assert rec["statement"].startswith("SELECT id")
    gw.close_session(s.handle)


def test_conf_overlay_crosses_the_wire(spark, sf_dir, remote_engine):
    """Per-statement conf rides TExecuteStatementReq.confOverlay: a
    forwarded session can flip collect modes per statement (the remote
    engine's op store records the mode it actually used)."""
    from kyuubi_spark.gateway.engine import Engine

    gw = Engine(spark)
    s = gw.open_session(
        user="overlay_fwd",
        conf={
            "kyuubi.engine.type": "THRIFT",
            "kyuubi.engine.thrift.host": remote_engine.host,
            "kyuubi.engine.thrift.port": str(remote_engine.port),
        },
    )
    op = s.execute_statement(
        "SELECT id FROM range(8) ORDER BY id",
        conf_overlay={"kyuubi.operation.incremental.collect": "true"},
    )
    rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 100)
    assert [r[0] for r in rows] == list(range(8))
    # the REMOTE engine's accounting shows the overlay took effect
    modes = {
        r["collectMode"]
        for r in remote_engine.engine.op_store.list()
        if (r.get("statement") or "").startswith("SELECT id FROM range(8)")
    }
    assert "incremental" in modes
    gw.close_session(s.handle)
