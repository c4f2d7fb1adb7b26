"""Trino-backed gateway sessions (kyuubi.engine.type=TRINO): statements
executed over the Trino client protocol (kyuubi-trino-engine shape),
self-hosted against this repo's own TrinoGateway."""

import pytest

from kyuubi_spark.gateway.state import FetchOrientation, OperationState


@pytest.fixture(scope="module")
def trino_backend(spark):
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.trino import TrinoGateway

    svc = TrinoGateway(Engine(spark=spark), page_size=4).start()
    yield svc
    svc.stop()


def _open(spark, trino_backend, user):
    from kyuubi_spark.gateway.engine import Engine

    gw = Engine(spark)
    s = gw.open_session(
        user=user,
        conf={
            "kyuubi.engine.type": "TRINO",
            "kyuubi.engine.trino.connection.url":
                f"http://{trino_backend.host}:{trino_backend.port}",
        },
    )
    return gw, s


def test_trino_backed_query(spark, sf_dir, trino_backend):
    gw, s = _open(spark, trino_backend, "trino_fwd")
    op = s.execute_statement("SELECT 6 * 7 AS answer, 'trino' AS via")
    assert op.state is OperationState.FINISHED
    schema = op.get_result_set_schema()
    assert [f.name for f in schema.fields] == ["answer", "via"]
    assert schema.fields[0].dataType.simpleString() == "int"
    rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 10)
    assert [tuple(r) for r in rows] == [(42, "trino")]
    gw.close_session(s.handle)


def test_trino_backed_multi_page_drain(spark, sf_dir, trino_backend):
    # the backend pages at 4 rows; the engine must follow nextUri to drain
    gw, s = _open(spark, trino_backend, "trino_fwd2")
    op = s.execute_statement("SELECT id FROM range(11) ORDER BY id")
    rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 100)
    assert [r[0] for r in rows] == list(range(11))
    gw.close_session(s.handle)


def test_trino_backed_error(spark, sf_dir, trino_backend):
    gw, s = _open(spark, trino_backend, "trino_fwd3")
    op = s.execute_statement("SELECT * FROM nope_missing")
    assert op.state is OperationState.ERROR
    assert op.exception is not None
    gw.close_session(s.handle)


def test_trino_backed_basic_credentials(spark, sf_dir):
    """kyuubi.engine.trino.connection.user/.password attach Basic auth so
    TRINO sessions can reach an endpoint running authentication — here
    this repo's own TrinoGateway with an authenticator (which 401s
    credential-less requests)."""
    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.engine import Engine as GwEngine
    from kyuubi_spark.gateway.trino import TrinoGateway

    class OneUser:
        def authenticate(self, user, password):
            from kyuubi_spark.gateway.auth import AuthenticationError

            if (user, password) != ("svc", "pw"):
                raise AuthenticationError("bad credentials")

    svc = TrinoGateway(Engine(spark=spark), auth=OneUser()).start()
    try:
        url = f"http://{svc.host}:{svc.port}"
        gw = GwEngine(spark)
        # without credentials: the secured endpoint rejects the session
        s_anon = gw.open_session(
            user="x",
            conf={"kyuubi.engine.type": "TRINO",
                  "kyuubi.engine.trino.connection.url": url},
        )
        op = s_anon.execute_statement("SELECT 1 AS a")
        assert op.exception is not None
        gw.close_session(s_anon.handle)
        # with credentials: full roundtrip
        s = gw.open_session(
            user="x",
            conf={
                "kyuubi.engine.type": "TRINO",
                "kyuubi.engine.trino.connection.url": url,
                "kyuubi.engine.trino.connection.user": "svc",
                "kyuubi.engine.trino.connection.password": "pw",
            },
        )
        from kyuubi_spark.gateway.state import FetchOrientation

        op = s.execute_statement("SELECT 2 + 2 AS a")
        rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 10)
        assert [r[0] for r in rows] == [4]
        gw.close_session(s.handle)
    finally:
        svc.stop()
