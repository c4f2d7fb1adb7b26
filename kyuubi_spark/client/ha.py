"""HA service discovery for clients — the reference's
``serviceDiscoveryMode=zooKeeper`` JDBC behavior
(kyuubi-hive-jdbc/.../ZooKeeperHiveClientHelper.java: resolve the server
list from the registry's /kyuubi/servers namespace, pick one, fail over
to the next on a connect failure; session state does NOT survive a
failover — a new connection is a new session, exactly like the
reference's driver).

The registry here is the repo's file-backed SqliteDiscoveryClient (the
single-node ZK analog); swapping in a real ZooKeeper/etcd client changes
only the discovery object, not this resolution logic.
"""

from __future__ import annotations

import random
import socket

SERVER_NAMESPACE = "/kyuubi/servers"


def discover_servers(
    discovery_path: str,
    namespace: str = SERVER_NAMESPACE,
    probe_timeout: float = 1.0,
    probe: bool = True,
) -> list[tuple[str, int]]:
    """Live gateway endpoints registered under ``namespace``, in node
    order.  With ``probe`` on, endpoints that fail a TCP liveness check
    are dropped (a crashed server's ephemeral node may outlive it until
    the registry sweeps — the reference's driver hits the same window
    and handles it by trying the next candidate)."""
    from kyuubi_spark.gateway.discovery import connect_discovery

    # sqlite registry file OR tcp://h:p[,h2:p2...] (DiscoveryServer +
    # optional warm standbys, ZK-connect-string style)
    disco = connect_discovery(discovery_path)
    disco.create_client()
    try:
        nodes = disco.get_service_nodes_info(namespace)
    finally:
        disco.close_client()
    out = []
    for n in nodes:
        if probe:
            try:
                with socket.create_connection(
                    (n.host, n.port), timeout=probe_timeout
                ):
                    pass
            except OSError:
                continue
        out.append((n.host, n.port))
    return out


def connect_ha(
    discovery_path: str,
    namespace: str = SERVER_NAMESPACE,
    shuffle: bool = True,
    **connect_kwargs,
):
    """DBAPI connect via service discovery: resolve the live server
    list, pick one (shuffled for load spreading, like the reference's
    random server selection), and fail over to the next candidate on a
    connect failure.  Returns a kyuubi_spark.client.dbapi.Connection.
    """
    from kyuubi_spark.client import dbapi

    candidates = discover_servers(discovery_path, namespace)
    if not candidates:
        raise dbapi.OperationalError(
            f"no live gateway registered under {namespace} "
            f"in {discovery_path}"
        )
    if shuffle:
        candidates = list(candidates)
        random.shuffle(candidates)
    last_error: Exception | None = None
    for host, port in candidates:
        try:
            return dbapi.connect(host=host, port=port, **connect_kwargs)
        except dbapi.OperationalError as e:
            last_error = e
    raise dbapi.OperationalError(
        f"all {len(candidates)} discovered gateways failed; last: "
        f"{last_error}"
    ) from last_error
