"""Discovery registry + delegation-token / credential-epoch plane.

Single-node analogs of kyuubi-ha DiscoveryClient (ZK/etcd) and the
credential managers (KyuubiTBinaryFrontendService.scala:546-566,
HadoopCredentialsManager.scala:52-97) — see gateway/discovery.py and
gateway/credentials.py docstrings for the mapping.
"""

import threading
import time

import pytest

from kyuubi_spark.gateway.credentials import (
    CredentialsManager,
    DelegationTokenManager,
    TokenError,
)
from kyuubi_spark.gateway.discovery import (
    SqliteDiscoveryClient,
    parse_instance_host_port,
)


@pytest.fixture()
def disco():
    c = SqliteDiscoveryClient()
    c.create_client()
    yield c
    c.close_client()


def test_parse_instance_both_forms():
    # DiscoveryClient.parseInstanceHostPort: HIVE-11581 kv form + host:port
    assert parse_instance_host_port("h1:10009") == ("h1", 10009)
    kv = "hive.server2.thrift.bind.host=h2;hive.server2.thrift.port=10010"
    assert parse_instance_host_port(kv) == ("h2", 10010)


def test_sequential_nodes_and_children(disco):
    a = disco.create("/ns/eng-", "EPHEMERAL_SEQUENTIAL", data=b"x")
    b = disco.create("/ns/eng-", "EPHEMERAL_SEQUENTIAL", data=b"y")
    assert a.endswith("0000000000") and b.endswith("0000000001")
    assert disco.get_children("/ns") == ["eng-0000000000", "eng-0000000001"]
    assert disco.get_data(b) == b"y"


def test_register_and_resolve_server(disco):
    ns = "/kyuubi/user/alice"
    disco.create_and_get_service_node(ns, "hostA:10009")
    disco.create_and_get_service_node(ns, "hostB:10010")
    # newest node wins (the reference's takeRight(1))
    assert disco.get_server_host(ns) == ("hostB", 10010)
    infos = disco.get_service_nodes_info(ns)
    assert [i.instance for i in infos] == ["hostA:10009", "hostB:10010"]
    assert all(i.version for i in infos)


def test_engine_by_ref_id(disco):
    ns = "/kyuubi/user/bob"
    disco.create_and_get_service_node(ns, "h1:1", engine_ref_id="ref-1")
    disco.create_and_get_service_node(ns, "h2:2", engine_ref_id="ref-2")
    assert disco.get_engine_by_ref_id(ns, "ref-1") == ("h1", 1)
    assert disco.get_engine_by_ref_id(ns, "nope") is None


def test_ephemeral_nodes_die_with_client():
    shared = "/tmp/kyuubi_spark_disco_test.db"
    import os

    if os.path.exists(shared):
        os.unlink(shared)
    c1 = SqliteDiscoveryClient(shared)
    c2 = SqliteDiscoveryClient(shared)
    c1.create_client()
    c2.create_client()
    c1.create_and_get_service_node("/ns", "gone:1")
    c2.create("/ns/keep", "PERSISTENT", data=b"stay")
    c1.close_client()  # ZK session expiry analog
    assert all("gone" not in disco_n for disco_n in c2.get_children("/ns"))
    assert c2.path_exists("/ns/keep")
    c2.close_client()
    os.unlink(shared)


def test_try_with_lock_mutual_exclusion(disco):
    order = []

    def worker(tag):
        with disco.try_with_lock("/lock/engine-launch", timeout_ms=5000):
            order.append(f"{tag}-in")
            time.sleep(0.05)
            order.append(f"{tag}-out")

    t1 = threading.Thread(target=worker, args=("a",))
    t2 = threading.Thread(target=worker, args=("b",))
    t1.start(); t2.start(); t1.join(); t2.join()
    # critical sections never interleave
    assert order[0].endswith("-in") and order[1] == order[0].replace("-in", "-out")


def test_get_and_increment_returns_previous(disco):
    assert disco.get_and_increment("/ctr") == 0
    assert disco.get_and_increment("/ctr", 5) == 1
    assert disco.get_and_increment("/ctr") == 6


def test_engine_pool_registers_in_discovery(spark, sf_dir):
    from kyuubi_spark.gateway.pool import EnginePool

    disco = SqliteDiscoveryClient()
    pool = EnginePool(spark, share_level="USER", pool_size=2, discovery=disco)
    pool.get_engine(user="alice")
    pool.get_engine(user="alice")  # second engine in alice's pool
    infos = disco.get_service_nodes_info("/kyuubi/user/alice")
    assert len(infos) == 2
    assert all(i.engine_ref_id for i in infos)
    assert disco.get_server_host("/kyuubi/user/alice") is not None
    # idle eviction deregisters
    pool.idle_timeout = 0.0
    time.sleep(0.01)
    assert pool.sweep_idle() >= 1
    assert disco.get_service_nodes_info("/kyuubi/user/alice") == []
    disco.close_client()


# --- delegation tokens -----------------------------------------------------


def test_token_issue_verify_roundtrip():
    mgr = DelegationTokenManager()
    tok = mgr.issue("alice", "admin")
    assert mgr.verify(tok) == "alice"


def test_token_forgery_rejected():
    mgr = DelegationTokenManager()
    tok = mgr.issue("alice")
    tampered = tok.replace("alice", "mallory", 1)
    with pytest.raises(TokenError):
        mgr.verify(tampered)
    with pytest.raises(TokenError):
        DelegationTokenManager().verify(tok)  # different server secret


def test_token_cancel_revokes():
    mgr = DelegationTokenManager()
    tok = mgr.issue("alice")
    mgr.cancel(tok)
    with pytest.raises(TokenError):
        mgr.verify(tok)


def test_token_renew_extends_within_max_and_checks_renewer():
    mgr = DelegationTokenManager(renew_interval_ms=50)
    tok = mgr.issue("alice", renewer="admin")
    time.sleep(0.08)
    with pytest.raises(TokenError):
        mgr.verify(tok)  # expired
    with pytest.raises(TokenError):
        mgr.renew(tok, renewer="mallory")  # wrong renewer
    mgr.renew(tok, renewer="admin")
    assert mgr.verify(tok) == "alice"


def test_credentials_epoch_protocol():
    """HadoopCredentialsManager.scala:52-66: send only when the session's
    epoch is stale; session epoch advances only on successful send."""
    mgr = CredentialsManager(renewal_interval_s=1e9)
    sent = []
    assert mgr.send_credentials_if_needed("s1", "alice", sent.append)
    assert not mgr.send_credentials_if_needed("s1", "alice", sent.append)
    assert len(sent) == 1
    # a renewal bumps the epoch -> next send fires
    mgr.renewal_interval_s = 0.0
    assert mgr.renew_if_due("alice")
    assert mgr.send_credentials_if_needed("s1", "alice", sent.append)
    assert len(sent) >= 2
    # a failing send leaves the session stale (retried next time)
    mgr.renew_if_due("alice")

    def boom(_):
        raise RuntimeError("engine unreachable")

    with pytest.raises(RuntimeError):
        mgr.send_credentials_if_needed("s1", "alice", boom)
    assert mgr.send_credentials_if_needed("s1", "alice", sent.append)


def test_credentials_sweep_expired():
    mgr = CredentialsManager(credentials_timeout_s=0.0)
    mgr.renew_if_due("alice")
    time.sleep(0.01)
    assert mgr.sweep_expired() == 1


def test_stale_lock_is_stealable(disco):
    """A crashed holder's lock (old acquired timestamp) is stolen after
    the TTL — the ephemeral-lock-dies-with-session analog."""
    # simulate a crashed holder: insert a lock row with an ancient stamp
    with disco._lock:
        disco._db().execute(
            "INSERT INTO locks VALUES (?,?,?)", ("/stale", "dead-client", 0.0)
        )
        disco._db().commit()
    with disco.try_with_lock("/stale", timeout_ms=2000):
        pass  # acquired despite the leftover row


def test_fresh_lock_not_stolen(disco):
    import pytest as _pytest

    with disco.try_with_lock("/fresh", timeout_ms=2000):
        with _pytest.raises(TimeoutError):
            with disco.try_with_lock("/fresh", timeout_ms=200):
                pass


def test_cross_process_sequential_nodes_unique(tmp_path):
    """Two CLIENTS (separate sqlite connections, the two-process shape the
    file-backed store documents) minting sequential nodes under the same
    prefix must get distinct suffixes — the per-prefix counter upsert runs
    under BEGIN IMMEDIATE, not a per-process threading lock."""
    path = str(tmp_path / "reg.db")
    a = SqliteDiscoveryClient(path)
    b = SqliteDiscoveryClient(path)
    a.create_client()
    b.create_client()
    try:
        names = []
        for i in range(10):
            c = a if i % 2 == 0 else b
            names.append(c.create("/x/n-", "PERSISTENT_SEQUENTIAL"))
        assert len(set(names)) == 10
        assert sorted(names) == names  # monotone zero-padded suffixes
    finally:
        a.close_client()
        b.close_client()


def test_cross_process_lock_exclusion(tmp_path):
    """A lock held through connection A blocks connection B (polls to
    timeout instead of raising IntegrityError), and B acquires once A
    releases."""
    path = str(tmp_path / "reg2.db")
    a = SqliteDiscoveryClient(path)
    b = SqliteDiscoveryClient(path)
    a.create_client()
    b.create_client()
    try:
        with a.try_with_lock("/launch", timeout_ms=2000):
            with pytest.raises(TimeoutError):
                with b.try_with_lock("/launch", timeout_ms=200):
                    pass
        with b.try_with_lock("/launch", timeout_ms=2000):
            pass
    finally:
        a.close_client()
        b.close_client()


def test_cross_process_get_and_increment(tmp_path):
    path = str(tmp_path / "reg3.db")
    a = SqliteDiscoveryClient(path)
    b = SqliteDiscoveryClient(path)
    a.create_client()
    b.create_client()
    try:
        seen = [a.get_and_increment("/ctr"), b.get_and_increment("/ctr"),
                a.get_and_increment("/ctr")]
        assert seen == [0, 1, 2]
    finally:
        a.close_client()
        b.close_client()
