"""TCP discovery service (discovery_tcp.py): ZooKeeper-grade ephemeral
semantics over a real network boundary.

What the sqlite backend approximates, this proves for real: EPHEMERAL
nodes and lock grants are owned by a client SESSION (one TCP
connection) and vanish the moment the session dies — clean close,
crash, or SIGKILL — with no endpoint probing and no lock-TTL steal
(ZookeeperDiscoveryClient.scala ephemerals / curator leases)."""

from __future__ import annotations

import os
import signal
import time

import pytest

from kyuubi_spark.gateway.discovery import (
    DiscoveryStoreError,
    connect_discovery,
)
from kyuubi_spark.gateway.discovery_tcp import (
    DiscoveryServer,
    TcpDiscoveryClient,
)
from kyuubi_spark.gateway.state import FetchOrientation


@pytest.fixture()
def server():
    srv = DiscoveryServer().start()
    yield srv
    srv.stop()


def _client(srv) -> TcpDiscoveryClient:
    c = TcpDiscoveryClient(srv.address)
    c.create_client()
    return c


def test_znode_semantics_parity(server):
    """The TCP backend honors the same DiscoveryClient contract the
    sqlite store implements (and the reference's ZK client defines)."""
    c = _client(server)
    try:
        assert connect_discovery(server.address)._path == server.address

        # persistent + parents
        c.create("/kyuubi/a/b", "PERSISTENT", data=b"v1")
        assert c.path_exists("/kyuubi/a/b")
        assert c.get_data("/kyuubi/a/b") == b"v1"
        assert c.set_data("/kyuubi/a/b", b"v2")
        assert c.get_data("/kyuubi/a/b") == b"v2"
        assert c.get_children("/kyuubi/a") == ["b"]
        with pytest.raises(DiscoveryStoreError):
            c.get_data("/kyuubi/missing")

        # sequential suffixes are dense and zero-padded
        n0 = c.create("/kyuubi/seq/node-", "PERSISTENT_SEQUENTIAL")
        n1 = c.create("/kyuubi/seq/node-", "PERSISTENT_SEQUENTIAL")
        assert n0.endswith("0000000000") and n1.endswith("0000000001")

        # service registry derivations (shared DiscoveryClientOps)
        node = c.create_and_get_service_node(
            "/kyuubi/user/alice", "127.0.0.1:1234",
            engine_ref_id="r1", attributes={"pid": "42"},
        )
        assert node.startswith("/kyuubi/user/alice/serverUri=")
        assert c.get_server_host("/kyuubi/user/alice") == ("127.0.0.1", 1234)
        assert c.get_engine_by_ref_id("/kyuubi/user/alice", "r1") == (
            "127.0.0.1", 1234,
        )
        infos = c.get_service_nodes_info("/kyuubi/user/alice")
        assert infos[0].attributes["pid"] == "42"
        assert c.engine_spaces("/kyuubi") == ["/kyuubi/user/alice"]

        # counter: returns PREVIOUS value
        assert c.get_and_increment("/kyuubi/pool-seq") == 0
        assert c.get_and_increment("/kyuubi/pool-seq") == 1

        c.delete("/kyuubi/a", delete_children=True)
        assert not c.path_exists("/kyuubi/a/b")
    finally:
        c.close_client()


def test_ephemerals_die_with_session(server):
    """Clean close AND abrupt socket death both expire the session's
    ephemerals; persistent nodes survive."""
    c1 = _client(server)
    c2 = _client(server)
    try:
        c1.create("/kyuubi/perm", "PERSISTENT", data=b"stay")
        c1.create_and_get_service_node("/kyuubi/user/u1", "h1:1111")
        c2.create_and_get_service_node("/kyuubi/user/u1", "h2:2222")
        assert len(c2.get_service_nodes_info("/kyuubi/user/u1")) == 2

        c1.close_client()  # clean close
        deadline = time.time() + 5
        while time.time() < deadline:
            nodes = c2.get_service_nodes_info("/kyuubi/user/u1")
            if len(nodes) == 1:
                break
            time.sleep(0.02)
        assert [n.instance for n in nodes] == ["h2:2222"]
        assert c2.get_data("/kyuubi/perm") == b"stay"

        # abrupt death: kill the raw socket without any protocol goodbye
        c3 = _client(server)
        c3.create_and_get_service_node("/kyuubi/user/u1", "h3:3333")
        c3._sock.close()  # simulated crash (no deregistration)
        deadline = time.time() + 5
        while time.time() < deadline:
            nodes = c2.get_service_nodes_info("/kyuubi/user/u1")
            if len(nodes) == 1:
                break
            time.sleep(0.02)
        assert [n.instance for n in nodes] == ["h2:2222"]
    finally:
        c2.close_client()


def test_lock_mutual_exclusion_and_holder_death(server):
    """Locks exclude concurrent holders and — unlike the sqlite TTL
    steal — are released the instant the holding session dies."""
    c1 = _client(server)
    c2 = _client(server)
    try:
        with c1.try_with_lock("/kyuubi/ns.launch-lock", timeout_ms=2000):
            with pytest.raises(TimeoutError):
                with c2.try_with_lock(
                    "/kyuubi/ns.launch-lock", timeout_ms=300
                ):
                    pass
        # released on exit: c2 gets it immediately
        with c2.try_with_lock("/kyuubi/ns.launch-lock", timeout_ms=500):
            pass

        # holder dies while holding: grant evaporates with the session
        c3 = _client(server)
        c3._call("lock_acquire", path="/kyuubi/ns.launch-lock")
        with pytest.raises(TimeoutError):
            with c2.try_with_lock("/kyuubi/ns.launch-lock", timeout_ms=300):
                pass
        c3._sock.close()  # crash, lock never released by the holder
        t0 = time.time()
        with c2.try_with_lock("/kyuubi/ns.launch-lock", timeout_ms=5000):
            pass
        assert time.time() - t0 < 5  # no 600s TTL wait
    finally:
        c1.close_client()
        c2.close_client()


def test_engine_process_lifecycle_over_tcp_discovery(spark, server):
    """The full launched-engine lifecycle rides the TCP backend: the
    child process CONNECTS to the gateway's DiscoveryServer (its _path
    travels through the spawn plumbing), registers an ephemeral, serves
    a forwarded query — and after SIGKILL its registration vanishes via
    session expiry, NOT endpoint probing, so the next open relaunches
    cleanly."""
    from kyuubi_spark.gateway.engine import Engine
    from kyuubi_spark.gateway.engine_process import EngineProcessManager

    disco = _client(server)
    gw = Engine(spark)
    gw.discovery = disco
    gw.process_manager = EngineProcessManager(
        disco,
        {
            "kyuubi.session.engine.initialize.timeout": "90",
            "kyuubi.session.engine.idle.timeout": "600",
        },
    )
    try:
        s = gw.open_session(
            user="tcp_user", conf={"kyuubi.engine.launch.enabled": "true"}
        )
        ns = s.namespace
        nodes = disco.get_service_nodes_info(ns)
        assert len(nodes) == 1
        engine_pid = int(nodes[0].attributes["pid"])
        assert engine_pid != os.getpid()

        op = s.execute_statement("SELECT 'over tcp discovery' AS s")
        assert [
            r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_NEXT, 5)
        ] == ["over tcp discovery"]
        gw.close_session(s.handle)

        # SIGKILL: no deregistration runs in the engine — the TCP session
        # expiry removes the node by itself
        os.kill(engine_pid, signal.SIGKILL)
        deadline = time.time() + 10
        while time.time() < deadline:
            if not disco.get_service_nodes_info(ns):
                break
            time.sleep(0.05)
        assert disco.get_service_nodes_info(ns) == []

        # relaunch works against the same namespace
        s2 = gw.open_session(
            user="tcp_user", conf={"kyuubi.engine.launch.enabled": "true"}
        )
        nodes = disco.get_service_nodes_info(ns)
        assert len(nodes) == 1
        assert int(nodes[0].attributes["pid"]) != engine_pid
        op = s2.execute_statement("SELECT 1 + 1 AS two")
        assert [
            r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_NEXT, 5)
        ] == [2]
        gw.close_session(s2.handle)
    finally:
        gw.process_manager.stop_all()
        disco.close_client()


def test_ha_failover_over_tcp_discovery(spark):
    """The full HA story on the TCP backend: two gateways register on
    one DiscoveryServer, clients resolve and connect via tcp://
    discovery, and when a server dies its registration expires with its
    SESSION — the client needs no liveness probe to skip it."""
    from kyuubi_spark.client import dbapi, ha
    from kyuubi_spark.gateway.server_main import KyuubiServer

    srv = DiscoveryServer().start()
    d1 = _client(srv)
    d2 = _client(srv)
    s1 = KyuubiServer(spark, discovery=d1).start()
    s2 = KyuubiServer(spark, discovery=d2).start()
    try:
        addr = srv.address
        got = set(ha.discover_servers(addr))
        assert got == {
            s1.endpoints()["thrift_binary"],
            s2.endpoints()["thrift_binary"],
        }

        conn = dbapi.connect(discovery=addr, user="tcp_ha")
        cur = conn.cursor()
        cur.execute("SELECT 6 * 7 AS answer")
        assert cur.fetchall() == [(42,)]
        conn.close()

        # crash s1's discovery SESSION without any deregistration: its
        # node vanishes server-side (no probing needed, probe=False)
        d1._sock.close()
        deadline = time.time() + 5
        while time.time() < deadline:
            live = ha.discover_servers(addr, probe=False)
            if live == [s2.endpoints()["thrift_binary"]]:
                break
            time.sleep(0.05)
        assert live == [s2.endpoints()["thrift_binary"]]

        conn = dbapi.connect(discovery=addr, user="tcp_ha")
        cur = conn.cursor()
        cur.execute("SELECT 'survivor' AS s")
        assert cur.fetchall() == [("survivor",)]
        conn.close()
    finally:
        for s in (s2, s1):
            try:
                s.stop()
            except Exception:
                pass
        for d in (d1, d2):
            try:
                d.close_client()
            except Exception:
                pass
        srv.stop()


def test_spark_submit_engine_over_tcp_discovery(spark, server):
    """Composability: the two r10 launch-path features stack — a
    spark-submit-launched engine (PythonRunner child) joins the TCP
    DiscoveryServer, serves a session, and its registration still dies
    with its discovery session."""
    if not os.path.exists("/opt/spark/bin/spark-submit"):
        pytest.skip("no spark-submit binary in this environment")

    from kyuubi_spark.gateway.engine import Engine
    from kyuubi_spark.gateway.engine_process import EngineProcessManager

    disco = _client(server)
    gw = Engine(spark)
    gw.discovery = disco
    gw.process_manager = EngineProcessManager(
        disco,
        {
            "kyuubi.engine.spark.submit.enabled": "true",
            "kyuubi.engine.spark.submit.path": "/opt/spark/bin/spark-submit",
            "kyuubi.session.engine.initialize.timeout": "240",
            "kyuubi.session.engine.idle.timeout": "600",
        },
    )
    try:
        s = gw.open_session(
            user="stacked", conf={"kyuubi.engine.launch.enabled": "true"}
        )
        ns = s.namespace
        child = gw.process_manager._engines[ns]
        assert child.launch_kind == "spark-submit"
        nodes = disco.get_service_nodes_info(ns)
        assert len(nodes) == 1
        assert nodes[0].attributes["appId"].startswith("local-")

        op = s.execute_statement("SELECT 'stacked launch paths' AS s")
        assert [
            r[0] for r in op.get_next_row_set(FetchOrientation.FETCH_NEXT, 5)
        ] == ["stacked launch paths"]
        gw.close_session(s.handle)

        # kill the whole submit chain; the node expires with the engine's
        # TCP session, no probing
        child.terminate()
        deadline = time.time() + 15
        while time.time() < deadline:
            if not disco.get_service_nodes_info(ns):
                break
            time.sleep(0.1)
        assert disco.get_service_nodes_info(ns) == []
    finally:
        gw.process_manager.stop_all()
        disco.close_client()


def _spawn_daemon(port: int):
    """Start the discovery daemon as a REAL OS process on a fixed port;
    returns the Popen after reading its ready line."""
    import subprocess
    import sys as _sys

    proc = subprocess.Popen(
        [
            _sys.executable,
            "-m",
            "kyuubi_spark.gateway.discovery_tcp",
            "--port",
            str(port),
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    addr = proc.stdout.readline().strip()
    assert addr == f"tcp://127.0.0.1:{port}", addr
    return proc


def test_daemon_kill9_restart_reregisters_and_resolves(spark):
    """The crash-recovery half of ZK parity: kill -9 the discovery
    DAEMON mid-session, restart it on the same port (empty tree), and
    the surviving owners REPOPULATE it — the gateway's keepalive'd
    client replays its ephemeral registration automatically, and fresh
    clients resolve + connect through the restarted daemon with no
    operator intervention (what a ZK quorum gives via replicated state,
    the single-daemon deployment gets via owner-side replay)."""
    import socket as _socket

    from kyuubi_spark.client import dbapi, ha
    from kyuubi_spark.gateway.server_main import KyuubiServer

    with _socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    proc = _spawn_daemon(port)
    addr = f"tcp://127.0.0.1:{port}"
    disco = connect_discovery(addr)
    disco.create_client()
    srv = KyuubiServer(spark, discovery=disco).start()
    try:
        endpoint = srv.endpoints()["thrift_binary"]
        assert ha.discover_servers(addr) == [endpoint]

        # daemon dies hard mid-session: resolution is down, the
        # registration is gone with the daemon's memory
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=10)

        # restart on the SAME port with an EMPTY tree
        proc = _spawn_daemon(port)

        # the gateway's client re-registers by itself (keepalive ping ->
        # reconnect -> ephemeral replay); clients re-resolve
        deadline = time.time() + 15
        live = []
        while time.time() < deadline:
            try:
                live = ha.discover_servers(addr)
            except DiscoveryStoreError:
                live = []
            if live == [endpoint]:
                break
            time.sleep(0.2)
        assert live == [endpoint]

        conn = dbapi.connect(discovery=addr, user="quake_survivor")
        cur = conn.cursor()
        cur.execute("SELECT 'rejoined' AS s")
        assert cur.fetchall() == [("rejoined",)]
        conn.close()
    finally:
        try:
            srv.stop()
        except Exception:
            pass
        try:
            disco.close_client()
        except Exception:
            pass
        proc.kill()
        proc.wait(timeout=10)


def _free_port() -> int:
    import socket as _socket

    with _socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_outage_longer_than_reconnect_timeout_recovers():
    """A daemon outage LONGER than one reconnect_timeout must not brick
    the client: after an exhausted reconnect attempt leaves the socket
    down, the next call (the keepalive ping in production) re-dials
    instead of failing fast with 'client not created', and the
    ephemeral replays once the daemon returns.  Replayed sequential
    nodes get fresh suffixes; callers holding the OLD path are
    translated by the alias map in get_data/set_data/delete."""
    port = _free_port()
    proc = _spawn_daemon(port)
    c = TcpDiscoveryClient(
        f"tcp://127.0.0.1:{port}", keepalive=0.1, reconnect_timeout=0.5
    )
    c.create_client()
    try:
        # two sequential ephemerals; dropping the first forces the
        # survivor to get a DIFFERENT suffix on the restarted daemon
        e0 = c.create("/kyuubi/out/e-", "EPHEMERAL_SEQUENTIAL", data=b"a")
        e1 = c.create("/kyuubi/out/e-", "EPHEMERAL_SEQUENTIAL", data=b"b")
        c.delete(e0)

        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=10)
        # let several keepalive ticks exhaust their reconnect deadlines
        time.sleep(1.5)
        with pytest.raises(DiscoveryStoreError) as ei:
            c.path_exists("/kyuubi/out")
        assert "not created" not in str(ei.value)  # it kept re-dialing

        proc = _spawn_daemon(port)
        deadline = time.time() + 10
        kids = []
        while time.time() < deadline:
            try:
                kids = c.get_children("/kyuubi/out")
            except DiscoveryStoreError:
                kids = []
            if kids:
                break
            time.sleep(0.1)
        assert len(kids) == 1
        new_path = "/kyuubi/out/" + kids[0]
        assert new_path != e1  # fresh daemon, fresh suffix
        # old-path callers keep working through the alias map
        assert c.get_data(e1) == b"b"
        assert c.set_data(e1, b"b2")
        assert c.get_data(new_path) == b"b2"
        c.delete(e1)
        assert c.get_children("/kyuubi/out") == []
    finally:
        c.close_client()
        proc.kill()
        proc.wait(timeout=10)


def test_rid_dedup_makes_retries_safe(server):
    """A retried request (same rid — what _call resends after a
    reconnect when the first response was lost in transit) must not
    double-apply non-idempotent ops: the server answers the duplicate
    from its dedup cache."""
    c = _client(server)
    try:
        # counter: duplicate rid returns the SAME pre-increment value
        p1 = {"op": "get_and_increment", "path": "/ctr", "delta": 1,
              "rid": "rid-ctr"}
        r1 = c._rpc_once(dict(p1))
        r2 = c._rpc_once(dict(p1))
        assert r1 == r2 and r1["value"] == 0
        fresh = c.get_and_increment("/ctr")
        assert fresh == 1  # applied exactly once

        # sequential create: duplicate rid returns the SAME path, one node
        p2 = {"op": "create", "path": "/kyuubi/rid/n-",
              "mode": "PERSISTENT_SEQUENTIAL", "data": "",
              "create_parent": True, "rid": "rid-seq"}
        s1 = c._rpc_once(dict(p2))["value"]
        s2 = c._rpc_once(dict(p2))["value"]
        assert s1 == s2
        assert c.get_children("/kyuubi/rid") == [s1.rsplit("/", 1)[-1]]
    finally:
        c.close_client()


def test_warm_standby_failover(spark):
    """VERDICT r11 #5: a ZK-connect-string standby (tcp://h:p1,h:p2)
    removes the single-daemon dead window — when the primary dies, the
    gateway's client fails over to the standby on the next call,
    replays its ephemeral registration there, and NEW sessions open
    through the standby without any engine restart."""
    from kyuubi_spark.client import dbapi, ha
    from kyuubi_spark.gateway.server_main import KyuubiServer

    port1 = _free_port()
    primary = _spawn_daemon(port1)
    standby = DiscoveryServer().start()  # in-process survivor
    connstr = f"tcp://127.0.0.1:{port1},{standby.host}:{standby.port}"

    disco = connect_discovery(connstr)
    disco.create_client()
    assert disco._addr_idx == 0  # registered through the primary
    srv = KyuubiServer(spark, discovery=disco).start()
    try:
        endpoint = srv.endpoints()["thrift_binary"]
        assert ha.discover_servers(connstr) == [endpoint]

        os.kill(primary.pid, signal.SIGKILL)
        primary.wait(timeout=10)

        # the gateway's keepalive fails over + replays onto the standby
        deadline = time.time() + 15
        live = []
        while time.time() < deadline:
            try:
                live = ha.discover_servers(connstr)
            except DiscoveryStoreError:
                live = []
            if live == [endpoint]:
                break
            time.sleep(0.2)
        assert live == [endpoint]
        assert disco._addr_idx == 1  # it is the STANDBY answering now

        conn = dbapi.connect(discovery=connstr, user="standby_user")
        cur = conn.cursor()
        cur.execute("SELECT 'standby' AS s")
        assert cur.fetchall() == [("standby",)]
        conn.close()
    finally:
        try:
            srv.stop()
        except Exception:
            pass
        try:
            disco.close_client()
        except Exception:
            pass
        primary.kill()
        standby.stop()


def test_delete_mid_outage_does_not_resurrect_node(server):
    """ADVICE r12 (medium): a delete whose first RPC dies mid-flight
    must NOT resurrect the node — the reconnect inside _call replays
    _ephemerals, and if the node being deleted were still recorded
    there it would re-register under a fresh sequential path and then
    survive the retried delete (which targets the OLD path) forever."""
    c = _client(server)
    try:
        node = c.create_and_get_service_node("/kyuubi/user/del", "h:1")
        assert node in c._ephemerals
        # sever the session so delete()'s first RPC hits OSError and
        # _call reconnects (server stays up: same address answers)
        c._sock.close()
        c.delete(node)
        # neither recorded client-side ...
        assert c._ephemerals == {}
        assert node not in c._replay_aliases
        # ... nor present server-side, under ANY path
        assert c.get_service_nodes_info("/kyuubi/user/del") == []
        # and a FURTHER reconnect replays nothing back
        c._sock.close()
        assert c._call("ping") == "pong"
        assert c.get_service_nodes_info("/kyuubi/user/del") == []
    finally:
        c.close_client()


def test_partial_replay_failure_keeps_exactly_one_copy(server):
    """ADVICE r12 (low ×2): if replay fails partway, (a) the failure
    must surface as DiscoveryStoreError (not raw OSError), and (b) only
    the NOT-yet-replayed remainder is restored — re-adding already
    replayed old paths would register duplicate sequential ephemerals
    for the same logical node on the next reconnect."""
    c = _client(server)
    try:
        n1 = c.create_and_get_service_node("/kyuubi/user/pr", "h:1")
        n2 = c.create_and_get_service_node("/kyuubi/user/pr", "h:2")
        assert set(c._ephemerals) == {n1, n2}

        real_rpc = c._rpc_once
        calls = {"creates": 0}

        def flaky(payload):
            if payload.get("op") == "create":
                calls["creates"] += 1
                if calls["creates"] == 2:  # second replayed create dies
                    raise OSError("injected mid-replay failure")
            return real_rpc(payload)

        c._rpc_once = flaky
        c._sock.close()  # force _call into _reconnect_and_replay
        with pytest.raises(DiscoveryStoreError):
            c._call("ping")
        c._rpc_once = real_rpc

        # exactly TWO logical nodes recorded: the first under its NEW
        # replayed path, the second under its original (pending) path
        assert len(c._ephemerals) == 2
        assert n2 in c._ephemerals and n1 not in c._ephemerals

        # next reconnect replays the remainder; server ends with
        # exactly two service nodes — no duplicates
        c._sock.close()
        assert c._call("ping") == "pong"
        infos = c.get_service_nodes_info("/kyuubi/user/pr")
        assert sorted(i.instance for i in infos) == ["h:1", "h:2"]
    finally:
        c.close_client()


def _spawn_daemon_with_standby(port: int, standby_addr: str):
    import subprocess
    import sys as _sys

    proc = subprocess.Popen(
        [
            _sys.executable,
            "-m",
            "kyuubi_spark.gateway.discovery_tcp",
            "--port",
            str(port),
            "--standby",
            standby_addr,
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    addr = proc.stdout.readline().strip()
    assert addr == f"tcp://127.0.0.1:{port}", addr
    return proc


def test_persistent_state_survives_primary_kill9_via_standby():
    """VERDICT r12 Next #2: persistent registry state is replicated to
    the warm standby, so a kill -9 of the primary loses NOTHING
    non-ephemeral — the failed-over client reads persistent nodes
    straight from the standby with no replay of any kind, sequential
    suffixes keep advancing (no collision with primary-issued ones),
    and counters never move backwards."""
    standby = DiscoveryServer().start()
    port = _free_port()
    primary = _spawn_daemon_with_standby(
        port, f"tcp://{standby.host}:{standby.port}"
    )
    connstr = f"tcp://127.0.0.1:{port},{standby.host}:{standby.port}"
    c = TcpDiscoveryClient(connstr)
    c.create_client()
    try:
        c.create("/kyuubi/conf/ns", "PERSISTENT", data=b"v1")
        seq0 = c.create("/kyuubi/jobs/job-", "PERSISTENT_SEQUENTIAL",
                        data=b"j0")
        assert c.get_and_increment("/kyuubi/pool") == 0
        assert c.get_and_increment("/kyuubi/pool") == 1
        # ephemeral alongside, to prove the standby separates planes
        c.create_and_get_service_node("/kyuubi/user/ha", "h:9")

        # async snapshot lands on the standby (poll its tree directly)
        deadline = time.time() + 10
        while time.time() < deadline:
            with standby._lock:
                if (
                    "/kyuubi/conf/ns" in standby._znodes
                    and seq0 in standby._znodes
                    and standby._counters.get("/kyuubi/pool") == 2
                ):
                    break
            time.sleep(0.02)
        with standby._lock:
            assert standby._znodes["/kyuubi/conf/ns"]["data"] == b"v1"
            assert standby._znodes[seq0]["data"] == b"j0"
            # the primary's ephemerals do NOT replicate: only their
            # owner knows they are alive
            assert not any(
                z["mode"].startswith("EPHEMERAL")
                for z in standby._znodes.values()
            )

        os.kill(primary.pid, signal.SIGKILL)
        primary.wait(timeout=10)

        # read through the survivor: NO client replay involved for
        # persistent state (the ephemeral replays; the persistent node
        # was never in _ephemerals)
        assert "/kyuubi/conf/ns" not in c._ephemerals
        assert c.get_data("/kyuubi/conf/ns") == b"v1"
        assert c._addr_idx == 1  # the standby is answering
        assert c.get_data(seq0) == b"j0"

        # sequence counter replicated: the next suffix continues past
        # the primary-issued one instead of colliding at 0
        seq1 = c.create("/kyuubi/jobs/job-", "PERSISTENT_SEQUENTIAL",
                        data=b"j1")
        assert seq1 != seq0
        assert int(seq1[-10:]) == int(seq0[-10:]) + 1
        # counter continues forward
        assert c.get_and_increment("/kyuubi/pool") == 2
    finally:
        c.close_client()
        primary.kill()
        standby.stop()


def test_replication_chain_forwards_and_quiesces():
    """One-way replication chain A -> B -> C: a persistent write to A
    lands on C via B's change-gated forwarding, and once the chain is
    in sync the identical snapshots are absorbed silently (the repl
    events drain and stay clear — no ping-pong even if someone wires
    an accidental cycle)."""
    c = DiscoveryServer().start()
    b = DiscoveryServer(standby=f"tcp://{c.host}:{c.port}").start()
    a = DiscoveryServer(standby=f"tcp://{b.host}:{b.port}").start()
    ca = _client(a)
    try:
        ca.create("/kyuubi/chain/x", "PERSISTENT", data=b"vx")
        assert ca.get_and_increment("/kyuubi/chain/ctr") == 0
        deadline = time.time() + 10
        ok = False
        while time.time() < deadline:
            with c._lock:
                ok = (
                    "/kyuubi/chain/x" in c._znodes
                    and c._counters.get("/kyuubi/chain/ctr") == 1
                )
            if ok:
                break
            time.sleep(0.02)
        assert ok
        with c._lock:
            assert c._znodes["/kyuubi/chain/x"]["data"] == b"vx"
        # quiescence: nothing re-arms once the chain is identical
        deadline = time.time() + 5
        while time.time() < deadline:
            if not (
                a._repl_event.is_set()
                or b._repl_event.is_set()
                or c._repl_event.is_set()
            ):
                break
            time.sleep(0.05)
        time.sleep(0.3)
        assert not b._repl_event.is_set()
        assert not c._repl_event.is_set()
    finally:
        ca.close_client()
        a.stop()
        b.stop()
        c.stop()
