"""Service discovery / HA registry — single-node analog of the reference's
ZooKeeper/etcd discovery layer.

The reference abstracts engine/server discovery behind ``DiscoveryClient``
(kyuubi-ha/src/main/scala/org/apache/kyuubi/ha/client/DiscoveryClient.scala:
create/getData/setData/getChildren/pathExists/delete/tryWithLock/
getServerHost/getEngineByRefId/getServiceNodesInfo/registerService/
deregisterService/createAndGetServiceNode/getAndIncrement) with ZooKeeper
(ZookeeperDiscoveryClient.scala) and etcd implementations.  In this
single-node deployment the registry is a sqlite store (same choice as the
gateway's batch metadata store) with the SAME semantics:

- node modes PERSISTENT / EPHEMERAL / *_SEQUENTIAL — sequential nodes get
  a zero-padded 10-digit suffix per prefix (ZK CreateMode semantics);
  ephemeral nodes die with their owning client (``close_client``), the
  stand-in for ZK session expiry;
- service node names follow the reference's path prefix format
  ``serverUri=<instance>;version=<v>[;refId=<r>];sequence=<n>``
  (ZookeeperDiscoveryClient.scala:363-366), node data = the raw instance
  string;
- ``get_server_host`` picks the LAST child (the reference's
  ``takeRight(1)`` on the children list, ZookeeperDiscoveryClient.scala:
  178-185) — newest server wins;
- instance strings parse in both published forms: the HIVE-11581
  key=value form (``hive.server2.thrift.bind.host=h;...port=p``) and
  plain ``host:port`` (DiscoveryClient.scala parseInstanceHostPort);
- ``try_with_lock`` provides the distributed-lock shape engine launch
  uses to serialize engine creation per user (ZookeeperDiscoveryClient
  .scala:136-150): here a polling lease in the same store;
- ``get_and_increment`` is the DistributedAtomicInteger used for
  round-robin engine pool selection.

At scale the store behind this interface is ZooKeeper/etcd; everything
above the interface (engine pools, share-level namespaces, ref-id lookup)
is store-agnostic, which is the property the reference's trait encodes.
"""

from __future__ import annotations

import contextlib
import os
import sqlite3
import threading
import time
import uuid
from dataclasses import dataclass, field


@dataclass(frozen=True)
class ServiceNodeInfo:
    """ServiceNodeInfo.scala:20-29."""

    namespace: str
    node_name: str
    host: str
    port: int
    version: str | None = None
    engine_ref_id: str | None = None
    attributes: dict = field(default_factory=dict)

    @property
    def instance(self) -> str:
        return f"{self.host}:{self.port}"


def parse_instance_host_port(instance: str) -> tuple[str, int]:
    """DiscoveryClient.scala parseInstanceHostPort: key=value form
    (HIVE-11581 published configs) or plain host:port."""
    infos = dict(
        kv.split("=", 1) for kv in instance.split(";") if "=" in kv
    )
    if infos:
        return (
            infos["hive.server2.thrift.bind.host"],
            int(infos["hive.server2.thrift.port"]),
        )
    host, port = instance.rsplit(":", 1)
    return host, int(port)


class DiscoveryStoreError(Exception):
    pass


class DiscoveryClientOps:
    """Store-agnostic half of the reference's DiscoveryClient trait:
    everything here derives from the znode primitives (create/get_data/
    get_children/delete), so any backend that implements those — the
    sqlite store below, the TCP ephemeral server (discovery_tcp.py), a
    real ZooKeeper — inherits the service-registry semantics unchanged.
    """

    # --- service registry ---

    def create_and_get_service_node(
        self,
        namespace: str,
        instance: str,
        version: str | None = None,
        engine_ref_id: str | None = None,
        external: bool = False,
        attributes: dict | None = None,
    ) -> str:
        """ZookeeperDiscoveryClient.createPersistentNode:339-380 —
        node name serverUri=..;version=..[;<attrs>][;refId=..];sequence=N,
        EPHEMERAL_SEQUENTIAL unless external."""
        ver = version or "1.10.0"
        extra = "".join(
            f";{k}={v}" for k, v in (attributes or {}).items()
        )
        ref = f"refId={engine_ref_id};" if engine_ref_id else ""
        prefix = (
            f"{namespace.rstrip('/')}/serverUri={instance};version={ver}"
            f"{extra};{ref}sequence="
        )
        mode = "PERSISTENT_SEQUENTIAL" if external else "EPHEMERAL_SEQUENTIAL"
        return self.create(prefix, mode, data=instance.encode("utf-8"))

    def register_service(
        self,
        namespace: str,
        instance: str,
        version: str | None = None,
        engine_ref_id: str | None = None,
    ) -> str:
        node = self.create_and_get_service_node(
            namespace, instance, version, engine_ref_id
        )
        self._registered = node
        return node

    def deregister_service(self) -> None:
        node = getattr(self, "_registered", None)
        if node:
            self.delete(node)
            self._registered = None

    def get_service_nodes_info(
        self, namespace: str, size: int | None = None
    ) -> list[ServiceNodeInfo]:
        children = self.get_children(namespace)
        take = children[-(size or len(children)):] if children else []
        out = []
        for name in take:
            try:
                data = self.get_data(
                    f"{namespace.rstrip('/')}/{name}"
                ).decode()
            except DiscoveryStoreError:
                # the node EXPIRED between listing and reading (a dying
                # session's ephemeral) — a vanished child simply is not
                # a live service; ZK clients skip NoNodeException the
                # same way rather than failing the whole resolution
                continue
            host, port = parse_instance_host_port(data)
            attrs = dict(
                kv.split("=", 1) for kv in name.split(";") if "=" in kv
            )
            out.append(
                ServiceNodeInfo(
                    namespace=namespace,
                    node_name=name,
                    host=host,
                    port=port,
                    version=attrs.get("version"),
                    engine_ref_id=attrs.get("refId"),
                    attributes=attrs,
                )
            )
        return out

    def get_server_host(self, namespace: str) -> tuple[str, int] | None:
        """Newest node wins (the reference's takeRight(1))."""
        nodes = self.get_service_nodes_info(namespace, size=1)
        if len(nodes) == 1:
            return (nodes[0].host, nodes[0].port)
        return None

    def get_engine_by_ref_id(
        self, namespace: str, engine_ref_id: str
    ) -> tuple[str, int] | None:
        for n in self.get_service_nodes_info(namespace):
            if n.engine_ref_id == engine_ref_id:
                return (n.host, n.port)
        return None


def connect_discovery(addr: str | None):
    """Backend factory: ``tcp://h:p[,h2:p2...]`` → the ephemeral TCP client
    (primary + warm standbys, ZK-connect-string failover)
    (discovery_tcp.py); anything else → the sqlite store at that path.
    The launched-engine plumbing forwards a client's ``_path`` verbatim,
    so engines join whichever backend the gateway runs."""
    if addr and str(addr).startswith("tcp://"):
        from kyuubi_spark.gateway.discovery_tcp import TcpDiscoveryClient

        # keepalive gives long-lived owners (gateways, engines) prompt
        # daemon-crash detection + automatic ephemeral re-registration
        # once a restarted daemon answers on the same address
        return TcpDiscoveryClient(addr, keepalive=2.0)
    return SqliteDiscoveryClient(addr)


class SqliteDiscoveryClient(DiscoveryClientOps):
    """DiscoveryClient over sqlite — one table of znodes + counters.

    Thread-safe (one connection guarded by a lock; sqlite serializes
    writers anyway).  ``path`` defaults to a shared in-memory database so
    tests and a single gateway process see one registry; point it at a
    file to share across processes on one host.
    """

    def __init__(self, path: str | None = None):
        self._client_id = uuid.uuid4().hex
        self._path = path or ":memory:"
        self._lock = threading.RLock()
        self._conn: sqlite3.Connection | None = None

    # --- lifecycle (createClient/closeClient) ---

    def create_client(self) -> None:
        with self._lock:
            if self._conn is not None:
                return
            if self._path != ":memory:":
                os.makedirs(os.path.dirname(self._path) or ".", exist_ok=True)
            # isolation_level=None → autocommit; multi-statement writes go
            # through _immediate() (BEGIN IMMEDIATE), which takes the sqlite
            # write lock up front so two PROCESSES sharing a file-backed
            # store serialize instead of racing check-then-insert sequences.
            self._conn = sqlite3.connect(
                self._path, check_same_thread=False, isolation_level=None
            )
            self._conn.execute("PRAGMA busy_timeout=5000")
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS znodes ("
                " path TEXT PRIMARY KEY, data BLOB, mode TEXT,"
                " owner TEXT, created REAL)"
            )
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS seqs (prefix TEXT PRIMARY KEY, n INTEGER)"
            )
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS counters (path TEXT PRIMARY KEY, n INTEGER)"
            )
            self._conn.execute(
                "CREATE TABLE IF NOT EXISTS locks ("
                " path TEXT PRIMARY KEY, owner TEXT, acquired REAL)"
            )
            self._conn.commit()

    def close_client(self) -> None:
        """Drop this client's EPHEMERAL nodes (ZK session-expiry analog)
        and its held locks, then close."""
        with self._lock:
            if self._conn is None:
                return
            self._conn.execute(
                "DELETE FROM znodes WHERE owner = ? AND mode LIKE 'EPHEMERAL%'",
                (self._client_id,),
            )
            self._conn.execute(
                "DELETE FROM locks WHERE owner = ?", (self._client_id,)
            )
            self._conn.commit()
            self._conn.close()
            self._conn = None

    def _db(self) -> sqlite3.Connection:
        if self._conn is None:
            raise DiscoveryStoreError("client not created (create_client())")
        return self._conn

    @contextlib.contextmanager
    def _immediate(self):
        """Cross-process atomic write transaction: BEGIN IMMEDIATE takes
        the sqlite write lock before the first read, so check-then-insert
        sequences can't interleave between processes; busy_timeout makes
        contenders wait instead of erroring."""
        db = self._db()
        db.execute("BEGIN IMMEDIATE")
        try:
            yield db
        except BaseException:
            db.execute("ROLLBACK")
            raise
        else:
            db.execute("COMMIT")

    # --- znode primitives ---

    def create(
        self,
        path: str,
        mode: str = "PERSISTENT",
        data: bytes = b"",
        create_parent: bool = True,
    ) -> str:
        mode = mode.upper()
        with self._lock, self._immediate() as db:
            if create_parent:
                parts = [p for p in path.split("/") if p]
                for i in range(1, len(parts)):
                    parent = "/" + "/".join(parts[:i])
                    db.execute(
                        "INSERT OR IGNORE INTO znodes VALUES (?,?,?,?,?)",
                        (parent, b"", "PERSISTENT", self._client_id, time.time()),
                    )
            actual = path
            if mode.endswith("_SEQUENTIAL"):
                # atomic per-prefix counter — two processes can't mint the
                # same suffix (the upsert runs under the write lock)
                db.execute(
                    "INSERT INTO seqs VALUES (?, 0)"
                    " ON CONFLICT(prefix) DO UPDATE SET n = n + 1",
                    (path,),
                )
                n = db.execute(
                    "SELECT n FROM seqs WHERE prefix = ?", (path,)
                ).fetchone()[0]
                actual = f"{path}{n:010d}"
            db.execute(
                "INSERT OR REPLACE INTO znodes VALUES (?,?,?,?,?)",
                (actual, data, mode, self._client_id, time.time()),
            )
            return actual

    def get_data(self, path: str) -> bytes:
        with self._lock:
            row = self._db().execute(
                "SELECT data FROM znodes WHERE path = ?", (path,)
            ).fetchone()
        if row is None:
            raise DiscoveryStoreError(f"no node at {path}")
        return row[0]

    def set_data(self, path: str, data: bytes) -> bool:
        with self._lock:
            cur = self._db().execute(
                "UPDATE znodes SET data = ? WHERE path = ?", (data, path)
            )
            self._db().commit()
            return cur.rowcount > 0

    def get_children(self, path: str) -> list[str]:
        prefix = path.rstrip("/") + "/"
        with self._lock:
            rows = self._db().execute(
                "SELECT path FROM znodes WHERE path LIKE ?", (prefix + "%",)
            ).fetchall()
        out = []
        for (p,) in rows:
            rest = p[len(prefix):]
            if rest and "/" not in rest:
                out.append(rest)
        return sorted(out)

    def engine_spaces(self, root: str = "/kyuubi") -> list[str]:
        """Every namespace under ``root`` that holds at least one service
        node, at ANY depth — share-level engine spaces are two levels
        deep (/kyuubi/user/alice, EngineRef.engineSpace), so a
        single-level children walk misses them."""
        prefix = root.rstrip("/") + "/"
        with self._lock:
            rows = self._db().execute(
                "SELECT path FROM znodes WHERE path LIKE ?", (prefix + "%",)
            ).fetchall()
        spaces = {
            p.rsplit("/", 1)[0]
            for (p,) in rows
            if p.rsplit("/", 1)[-1].startswith("serverUri=")
        }
        return sorted(spaces)

    def path_exists(self, path: str) -> bool:
        with self._lock:
            return (
                self._db().execute(
                    "SELECT 1 FROM znodes WHERE path = ?", (path,)
                ).fetchone()
                is not None
            )

    def path_non_exists(self, path: str, is_prefix: bool = False) -> bool:
        if not is_prefix:
            return not self.path_exists(path)
        with self._lock:
            return (
                self._db().execute(
                    "SELECT 1 FROM znodes WHERE path LIKE ?", (path + "%",)
                ).fetchone()
                is None
            )

    def delete(self, path: str, delete_children: bool = False) -> None:
        with self._lock:
            db = self._db()
            db.execute("DELETE FROM znodes WHERE path = ?", (path,))
            if delete_children:
                db.execute(
                    "DELETE FROM znodes WHERE path LIKE ?",
                    (path.rstrip("/") + "/%",),
                )
            db.commit()

    # --- locking (tryWithLock) ---

    # A crashed holder cannot release a file-backed lock (ZK ephemeral
    # locks die with the session; sqlite rows do not) — locks older than
    # the TTL are stealable.
    LOCK_TTL_S = 600.0

    @contextlib.contextmanager
    def try_with_lock(self, lock_path: str, timeout_ms: int = 10_000):
        """Serialize engine creation across sessions (the reference's
        curator lease, ZookeeperDiscoveryClient.scala:136-150); raises on
        timeout like the reference ('throw exception if timeout')."""
        deadline = time.time() + timeout_ms / 1000.0
        acquired = False
        while time.time() < deadline:
            with self._lock:
                try:
                    with self._immediate() as db:
                        now = time.time()
                        db.execute(
                            "DELETE FROM locks WHERE path = ? AND acquired < ?",
                            (lock_path, now - self.LOCK_TTL_S),
                        )
                        row = db.execute(
                            "SELECT owner FROM locks WHERE path = ?",
                            (lock_path,),
                        ).fetchone()
                        if row is None:
                            db.execute(
                                "INSERT INTO locks VALUES (?,?,?)",
                                (lock_path, self._client_id, now),
                            )
                            acquired = True
                except (sqlite3.IntegrityError, sqlite3.OperationalError):
                    # lost a cross-process race (or the file is busy) —
                    # keep polling until the deadline, like the curator
                    # lease the reference waits on
                    pass
            if acquired:
                break
            time.sleep(0.01)
        if not acquired:
            raise TimeoutError(
                f"Timeout acquiring lock {lock_path} after {timeout_ms}ms"
            )
        try:
            yield
        finally:
            with self._lock:
                self._db().execute(
                    "DELETE FROM locks WHERE path = ? AND owner = ?",
                    (lock_path, self._client_id),
                )
                self._db().commit()

    # --- atomic counter (getAndIncrement) ---

    def get_and_increment(self, path: str, delta: int = 1) -> int:
        """Returns the PREVIOUS value (DistributedAtomicInteger.add
        semantics, ZookeeperDiscoveryClient.scala:300-307)."""
        with self._lock, self._immediate() as db:
            row = db.execute(
                "SELECT n FROM counters WHERE path = ?", (path,)
            ).fetchone()
            prev = row[0] if row else 0
            db.execute(
                "INSERT OR REPLACE INTO counters VALUES (?, ?)",
                (path, prev + delta),
            )
            return prev
