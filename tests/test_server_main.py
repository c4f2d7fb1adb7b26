"""KyuubiServer assembly: all four frontends over ONE engine, shared
session manager, discovery registration (KyuubiServer.scala shape)."""

import json
import urllib.request

from kyuubi_spark.gateway.server_main import SERVER_NAMESPACE, KyuubiServer


def test_all_frontends_share_one_engine(spark, sf_dir):
    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient
    from kyuubi_spark.gateway.thrift import ThriftClient, ThriftHttpClient

    disco = SqliteDiscoveryClient()
    server = KyuubiServer(spark, discovery=disco).start()
    try:
        eps = server.endpoints()
        # the server registered itself like an engine would
        assert disco.get_server_host(SERVER_NAMESPACE) == eps["thrift_binary"]

        # thrift binary
        c = ThriftClient(*eps["thrift_binary"])
        c.open_session(user="bin_user")
        op = c.execute("SELECT 1 AS one")
        assert c.fetch(op, 5) == [[1]]

        # thrift http
        h = ThriftHttpClient(*eps["thrift_http"])
        h.open_session(user="http_user")
        op2 = h.execute("SELECT 2 AS two")
        assert h.fetch(op2, 5) == [[2]]

        # REST
        req = urllib.request.Request(
            f"http://{server.host}:{eps['rest'][1]}/api/v1/sessions",
            data=json.dumps({"user": "rest_user"}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            sid = json.loads(r.read())["identifier"]

        # trino
        treq = urllib.request.Request(
            f"http://{eps['trino'][0]}:{eps['trino'][1]}/v1/statement",
            data=b"SELECT 3 AS three",
            headers={"X-Trino-User": "trino_user"},
            method="POST",
        )
        with urllib.request.urlopen(treq) as r:
            assert json.loads(r.read())["data"] == [[3]]

        # ONE engine saw every connection: all four users share the
        # session manager / limiter / metrics
        users = {s.user for s in server.engine.sessions._sessions.values()}
        assert {"bin_user", "http_user", "rest_user", "trino_user"} <= users

        c.close_session(); c.close()
        h.close_session(); h.close()
        urllib.request.urlopen(
            urllib.request.Request(
                f"http://{server.host}:{eps['rest'][1]}/api/v1/sessions/{sid}",
                method="DELETE",
            )
        )
    finally:
        server.stop()
        # deregistered on stop
        assert disco.get_server_host(SERVER_NAMESPACE) is None
        disco.close_client()


def test_periodic_gc_tick(spark, sf_dir):
    """PeriodicGCService.scala shape: one tick sweeps idle sessions,
    pooled engines, and expired credentials."""
    from kyuubi_spark.gateway.credentials import CredentialsManager
    from kyuubi_spark.gateway.engine import Engine
    from kyuubi_spark.gateway.pool import EnginePool
    from kyuubi_spark.gateway.server_main import PeriodicGCService

    engine = Engine(spark)
    sess = engine.open_session(
        user="gc-user", conf={"kyuubi.session.idle.timeout": "1"}
    )
    sess.last_access = 0  # force idle
    pool = EnginePool(spark, idle_timeout=0.0)
    pool.get_engine(user="gc-pooled")
    creds = CredentialsManager(credentials_timeout_s=0.0)
    creds.renew_if_due("gc-cred-user")
    import time

    time.sleep(0.01)
    gc = PeriodicGCService(engine, pool=pool, credentials=creds)
    swept = gc.tick()
    assert swept["sessions"] >= 1
    assert swept["engines"] >= 1
    assert swept["credentials"] >= 1


def test_gateway_federation_via_discovery(spark, sf_dir):
    """Gateway-to-gateway federation: server A registers in discovery;
    gateway B serves a THRIFT-type session that resolves A's namespace
    and forwards over the wire — the reference's server->engine hop,
    composed end-to-end."""
    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient
    from kyuubi_spark.gateway.engine import Engine
    from kyuubi_spark.gateway.state import FetchOrientation

    disco = SqliteDiscoveryClient()
    server_a = KyuubiServer(spark, discovery=disco).start()
    try:
        gw_b = Engine(spark)
        gw_b.discovery = disco
        s = gw_b.open_session(
            user="federated",
            conf={
                "kyuubi.engine.type": "THRIFT",
                "kyuubi.engine.namespace": SERVER_NAMESPACE,
            },
        )
        op = s.execute_statement("SELECT 'hello-from-A' AS msg")
        rows = op.get_next_row_set(FetchOrientation.FETCH_NEXT, 5)
        assert rows == [["hello-from-A"]]
        # the statement really ran on server A's engine
        assert any(
            sess.user == "federated"
            for sess in server_a.engine.sessions._sessions.values()
        )
        gw_b.close_session(s.handle)
    finally:
        server_a.stop()
        disco.close_client()


def test_delegation_token_shared_across_thrift_transports(spark, sf_dir):
    """One server-wide token plane (the reference's per-server manager):
    a token issued over the binary transport renews and cancels over the
    HTTP transport — previously each frontend minted its own secret and
    the cross-transport renew failed signature verification."""
    from kyuubi_spark.gateway.thrift import ThriftClient, ThriftHttpClient

    server = KyuubiServer(spark).start()
    try:
        eps = server.endpoints()
        assert server.thrift.tokens is server.thrift_http.tokens
        c = ThriftClient(*eps["thrift_binary"])
        c.open_session(user="tok_user")
        tok = c.get_delegation_token("alice", renewer="tok_user")

        h = ThriftHttpClient(*eps["thrift_http"])
        h.open_session(user="tok_user")
        h.renew_delegation_token(tok)
        h.cancel_delegation_token(tok)
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="canceled|unknown"):
            c.renew_delegation_token(tok)
        c.close_session(); c.close()
        h.close_session()
    finally:
        server.stop()
