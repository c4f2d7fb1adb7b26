"""HA server discovery + connect-time failover (reference:
kyuubi-hive-jdbc ZooKeeperHiveClientHelper + ServiceDiscovery): TWO
gateway servers share one registry; clients resolve a live server from
/kyuubi/servers instead of a fixed host:port, skip dead registrations,
and fail over when one server goes away."""

from __future__ import annotations

import pytest

from kyuubi_spark.client import dbapi, ha


@pytest.fixture()
def two_servers(spark, tmp_path):
    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient
    from kyuubi_spark.gateway.server_main import KyuubiServer

    path = str(tmp_path / "ha.db")
    d1 = SqliteDiscoveryClient(path)
    d1.create_client()
    d2 = SqliteDiscoveryClient(path)
    d2.create_client()
    s1 = KyuubiServer(spark, discovery=d1).start()
    s2 = KyuubiServer(spark, discovery=d2).start()
    yield path, s1, s2
    for s in (s1, s2):
        try:
            s.stop()
        except Exception:
            pass
    d1.close_client()
    d2.close_client()


def test_discovery_lists_both_servers(two_servers):
    path, s1, s2 = two_servers
    got = set(ha.discover_servers(path))
    want = {
        s1.endpoints()["thrift_binary"],
        s2.endpoints()["thrift_binary"],
    }
    assert got == want


def test_connect_via_discovery_and_failover(two_servers):
    path, s1, s2 = two_servers
    # both alive: discovery connect reaches SOME live gateway
    conn = dbapi.connect(discovery=path, user="ha_user")
    cur = conn.cursor()
    cur.execute("SELECT 40 + 2 AS answer")
    assert cur.fetchall() == [(42,)]
    conn.close()

    # one server gone (graceful stop deregisters): new connections land
    # on the survivor
    s1.stop()
    survivor = s2.endpoints()["thrift_binary"]
    assert ha.discover_servers(path) == [survivor]
    conn = dbapi.connect(discovery=path, user="ha_user")
    cur = conn.cursor()
    cur.execute("SELECT 'survivor' AS s")
    assert cur.fetchall() == [("survivor",)]
    conn.close()


def test_dead_registration_is_skipped(two_servers, tmp_path):
    """A crashed server's node can outlive it (no graceful deregister):
    the client's liveness probe skips it and connects to the live one —
    the same next-candidate walk the reference's driver does."""
    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient

    path, s1, s2 = two_servers
    disco = SqliteDiscoveryClient(path)
    disco.create_client()
    try:
        # plant a corpse: a registration nothing listens on
        disco.create_and_get_service_node(
            ha.SERVER_NAMESPACE, "127.0.0.1:1"
        )
        live = set(ha.discover_servers(path))
        assert ("127.0.0.1", 1) not in live
        assert s1.endpoints()["thrift_binary"] in live
        conn = dbapi.connect(discovery=path, user="ha_user")
        cur = conn.cursor()
        cur.execute("SELECT 1 AS one")
        assert cur.fetchall() == [(1,)]
        conn.close()
    finally:
        disco.close_client()


def test_no_live_server_raises(tmp_path):
    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient

    path = str(tmp_path / "empty.db")
    disco = SqliteDiscoveryClient(path)
    disco.create_client()
    disco.close_client()
    with pytest.raises(dbapi.OperationalError, match="no live gateway"):
        dbapi.connect(discovery=path, user="ha_user")


def test_beeline_discovery_mode(two_servers, capsys):
    """beeline --discovery resolves a live server from the registry
    (the JDBC URL's serviceDiscoveryMode=zooKeeper analog)."""
    from tools import beeline

    path, s1, s2 = two_servers
    rc = beeline.main([
        "--discovery", path, "-e", "SELECT 6 * 7 AS answer",
        "--outputformat", "csv",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "answer" in out and "42" in out
