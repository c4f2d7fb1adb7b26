"""TCP discovery service — ZooKeeper-grade ephemeral semantics for
multi-node deployments.

The sqlite registry (discovery.py) implements the reference's
DiscoveryClient semantics on one shared FILE, which bounds it to one
host and approximates two ZooKeeper properties:

- EPHEMERAL liveness: a SIGKILLed engine cannot delete its sqlite rows,
  so the sqlite backend relies on endpoint probing at resolve time;
- lock liveness: a crashed lock holder leaves a row that is only
  reclaimed by a TTL steal (discovery.py LOCK_TTL_S).

This module provides both properties for real, the way ZooKeeper does
(kyuubi-ha/.../client/ZookeeperDiscoveryClient.scala: ephemerals and
curator leases die with the client SESSION):

- ``DiscoveryServer``: a tiny in-memory znode tree served over TCP.
  Every client connection IS a session; EPHEMERAL* nodes and held locks
  are owned by the session and are deleted the moment the connection
  drops — process crash, SIGKILL, or clean close all look the same
  (the OS closes the socket), so a dead engine's registration vanishes
  without anyone probing its endpoint.
- ``TcpDiscoveryClient``: same duck-typed API as SqliteDiscoveryClient
  (create/get_data/set_data/get_children/engine_spaces/path_exists/
  delete/try_with_lock/get_and_increment + the DiscoveryClientOps
  service-registry derivations), over a length-prefixed JSON protocol.
  Its ``_path`` is ``tcp://host:port``, so the launched-engine plumbing
  (EngineProcessManager forwards ``discovery._path`` to children;
  engine_main connects via discovery.connect_discovery) carries engines
  onto the same server with zero changes.

Wire format: 4-byte big-endian length + UTF-8 JSON, request
``{"op": ..., ...}`` → response ``{"ok": true, "value": ...}`` or
``{"ok": false, "error": ...}``; binary node data travels base64.
Locks are granted first-come (non-blocking try per request); clients
poll inside try_with_lock exactly like the sqlite backend, but a grant
dies with its session instead of waiting out a TTL.
"""

from __future__ import annotations

import base64
import contextlib
import json
import socket
import struct
import threading
import time
import uuid

from kyuubi_spark.gateway.discovery import (
    DiscoveryClientOps,
    DiscoveryStoreError,
)


def _send_frame(sock: socket.socket, obj: dict) -> None:
    payload = json.dumps(obj, separators=(",", ":")).encode("utf-8")
    sock.sendall(struct.pack(">I", len(payload)) + payload)


def _recv_frame(sock: socket.socket) -> dict | None:
    head = b""
    while len(head) < 4:
        chunk = sock.recv(4 - len(head))
        if not chunk:
            return None
        head += chunk
    (n,) = struct.unpack(">I", head)
    if n > 16 * 1024 * 1024:
        raise DiscoveryStoreError(f"oversized discovery frame: {n} bytes")
    body = b""
    while len(body) < n:
        chunk = sock.recv(n - len(body))
        if not chunk:
            return None
        body += chunk
    return json.loads(body.decode("utf-8"))


class DiscoveryServer:
    """In-memory znode tree with session-scoped ephemerals and locks.

    ``standby``: address (``tcp://host:port`` or ``host:port``) of a
    warm-standby DiscoveryServer.  When set, every mutation of
    PERSISTENT state (persistent creates/deletes/set_data, sequence
    suffix counters, atomic counters) schedules an async snapshot push
    so the standby holds the full non-ephemeral namespace — after a
    primary kill -9, clients that fail over read persistent nodes
    straight from the standby with no replay (ephemerals are still
    client-replayed, as they must be: only their owners know they are
    alive).  Mirrors the durability the reference gets from running
    its registry IN ZooKeeper/etcd (kyuubi-ha/.../client/
    DiscoveryClient.scala — the persistent znodes live in the quorum,
    not the Kyuubi process)."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        standby: str | None = None,
    ):
        self._srv = socket.create_server((host, port))
        self.host, self.port = self._srv.getsockname()[:2]
        self._lock = threading.RLock()
        self._znodes: dict[str, dict] = {}  # path -> {data, mode, owner}
        self._seqs: dict[str, int] = {}
        self._counters: dict[str, int] = {}
        self._locks: dict[str, str] = {}  # lock path -> session id
        # request-id dedup: a client that loses the connection AFTER the
        # server applied a non-idempotent op (sequential create,
        # get_and_increment) retries with the same rid; we answer from
        # the cache instead of double-applying.  Bounded FIFO.
        self._rid_cache: "dict[str, dict]" = {}
        self._rid_order: list[str] = []
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        # -- warm-standby replication plane --
        self._standby_addr: tuple[str, int] | None = None
        if standby:
            hp = standby[len("tcp://"):] if standby.startswith(
                "tcp://") else standby
            h, p = hp.strip().rsplit(":", 1)
            self._standby_addr = (h, int(p))
        self._repl_event = threading.Event()
        self._repl_sock: socket.socket | None = None

    @property
    def address(self) -> str:
        return f"tcp://{self.host}:{self.port}"

    def start(self) -> "DiscoveryServer":
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        if self._standby_addr is not None:
            r = threading.Thread(target=self._repl_loop, daemon=True)
            r.start()
            self._threads.append(r)
        return self

    def stop(self) -> None:
        self._stop.set()
        self._repl_event.set()  # unblock the replication thread
        try:
            self._srv.close()
        except OSError:
            pass

    # -- warm-standby replication -----------------------------------------

    def _persistent_snapshot(self) -> dict:
        """Compact full snapshot of the non-ephemeral namespace.  The
        sequence counters ship too: a failed-over client creating a
        sequential node on the standby must NOT collide with a suffix
        the primary already handed out."""
        with self._lock:
            return {
                "znodes": {
                    p: {
                        "data": base64.b64encode(z["data"]).decode("ascii"),
                        "mode": z["mode"],
                    }
                    for p, z in self._znodes.items()
                    if not z["mode"].startswith("EPHEMERAL")
                },
                "seqs": dict(self._seqs),
                "counters": dict(self._counters),
            }

    def _schedule_replication(self) -> None:
        if self._standby_addr is not None:
            self._repl_event.set()

    def _repl_loop(self) -> None:
        """Async snapshot push: coalesces bursts (the event, not a
        queue, is the signal), reconnects on failure, and silently
        retries while the standby is down — a warm standby that is
        momentarily absent must never slow the primary's write path."""
        while not self._stop.is_set():
            self._repl_event.wait()
            if self._stop.is_set():
                return
            self._repl_event.clear()
            snap = self._persistent_snapshot()
            try:
                if self._repl_sock is None:
                    self._repl_sock = socket.create_connection(
                        self._standby_addr, timeout=10
                    )
                _send_frame(
                    self._repl_sock, {"op": "repl_snapshot", **snap}
                )
                resp = _recv_frame(self._repl_sock)
                if resp is None or not resp.get("ok"):
                    raise OSError("standby rejected snapshot")
            except OSError:
                try:
                    if self._repl_sock is not None:
                        self._repl_sock.close()
                except OSError:
                    pass
                self._repl_sock = None
                # leave the event set so the next loop retries after a
                # short pause (standby restarting / not up yet)
                self._repl_event.set()
                time.sleep(0.2)

    def _apply_repl_snapshot(self, req: dict) -> bool:
        """Standby side: replace the persistent namespace with the
        primary's snapshot.  Live ephemerals (client-replayed service
        nodes, lock grants) belong to THIS server's sessions and are
        left untouched; persistent nodes absent from the snapshot were
        deleted on the primary and are dropped here too.

        Forwarding is CHANGE-GATED: if this server has its own standby
        (a one-way replication CHAIN, A -> B -> C), an applied snapshot
        re-schedules a push only when it actually changed state — an
        identical snapshot is absorbed silently, so an accidental cycle
        quiesces instead of ping-ponging forever.  NOTE: snapshots are
        full-replace (deletes propagate), so the supported topology is
        a one-way chain; pointing two daemons at EACH OTHER is
        last-writer-wins and can drop the loser's writes — mutual
        replication needs a quorum store (the reference's ZooKeeper),
        which SURVEY §7 sanctions out."""
        changed = False
        with self._lock:
            for p in [
                p
                for p, z in self._znodes.items()
                if not z["mode"].startswith("EPHEMERAL")
                and p not in req.get("znodes", {})
            ]:
                del self._znodes[p]
                changed = True
            for p, z in req.get("znodes", {}).items():
                node = {
                    "data": base64.b64decode(z.get("data", "")),
                    "mode": z.get("mode", "PERSISTENT"),
                    "owner": "repl",
                }
                old = self._znodes.get(p)
                if (
                    old is None
                    or old["data"] != node["data"]
                    or old["mode"] != node["mode"]
                ):
                    self._znodes[p] = node
                    changed = True
            # counters only move forward: a stale snapshot racing a
            # post-failover local increment must not hand out suffixes
            # twice
            for p, n in req.get("seqs", {}).items():
                if int(n) > self._seqs.get(p, -1):
                    self._seqs[p] = int(n)
                    changed = True
            for p, n in req.get("counters", {}).items():
                if int(n) > self._counters.get(p, 0):
                    self._counters[p] = int(n)
                    changed = True
        if changed:
            self._schedule_replication()
        return True

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            t = threading.Thread(
                target=self._serve_session, args=(conn,), daemon=True
            )
            t.start()
            self._threads.append(t)

    # -- session ---------------------------------------------------------

    def _serve_session(self, conn: socket.socket) -> None:
        session = uuid.uuid4().hex
        try:
            while True:
                req = _recv_frame(conn)
                if req is None:
                    break  # EOF/reset: the session is DEAD
                rid = req.pop("rid", None)
                cached = self._rid_lookup(rid) if rid else None
                if cached is not None:
                    _send_frame(conn, cached)
                    continue
                try:
                    value = self._dispatch(session, req)
                    frame = {"ok": True, "value": value}
                except KeyError as e:
                    frame = {"ok": False, "error": f"no node at {e}"}
                except Exception as e:  # protocol-visible failure
                    frame = {"ok": False, "error": str(e)}
                if rid and self._rid_dedupable(req):
                    self._rid_store(rid, frame)
                _send_frame(conn, frame)
        except OSError:
            pass
        finally:
            self._expire_session(session)
            try:
                conn.close()
            except OSError:
                pass

    def _rid_lookup(self, rid: str) -> dict | None:
        with self._lock:
            return self._rid_cache.get(rid)

    def _rid_store(self, rid: str, frame: dict) -> None:
        with self._lock:
            if rid in self._rid_cache:
                return
            self._rid_cache[rid] = frame
            self._rid_order.append(rid)
            while len(self._rid_order) > 8192:
                self._rid_cache.pop(self._rid_order.pop(0), None)

    @staticmethod
    def _rid_dedupable(req: dict) -> bool:
        """EPHEMERAL creates are NOT deduped: the node died with the
        session that applied it, so re-applying on the retry session is
        the correct semantics (answering from cache would hand back a
        path that no longer exists).  Everything else — including
        sequential creates and counters — dedupes on rid."""
        op = req.get("op")
        if op == "create":
            return not str(req.get("mode", "PERSISTENT")).upper(
            ).startswith("EPHEMERAL")
        # lock grants are session-scoped like ephemerals: a cached True
        # from the dead session would lie about the NEW session's grant
        return op not in ("ping", "lock_acquire", "lock_release")

    def _expire_session(self, session: str) -> None:
        """ZK session expiry: the session's ephemerals and lock grants
        vanish atomically when its connection dies."""
        with self._lock:
            for path in [
                p
                for p, z in self._znodes.items()
                if z["owner"] == session
                and z["mode"].startswith("EPHEMERAL")
            ]:
                del self._znodes[path]
            for lp in [p for p, o in self._locks.items() if o == session]:
                del self._locks[lp]

    # -- ops ---------------------------------------------------------------

    def _dispatch(self, session: str, req: dict):
        op = req.get("op")
        with self._lock:
            try:
                return self._dispatch_locked(session, req, op)
            finally:
                # any mutation of persistent/sequence/counter state
                # wakes the standby snapshot pusher (no-op without a
                # standby).  Scheduled while STILL HOLDING the lock and
                # AFTER the mutation applied: the pusher's snapshot
                # also takes the lock, so it cannot clear the event and
                # read a pre-mutation tree (a pre-lock set() could) —
                # and the finally means a failed op still replicates
                # whatever partial state landed
                if op in (
                    "create", "set_data", "delete", "get_and_increment"
                ):
                    self._schedule_replication()

    def _dispatch_locked(self, session: str, req: dict, op):
        if op == "ping":
            return "pong"
        if op == "repl_snapshot":
            return self._apply_repl_snapshot(req)
        if op == "create":
            return self._create(
                session,
                req["path"],
                req.get("mode", "PERSISTENT"),
                base64.b64decode(req.get("data", "")),
                req.get("create_parent", True),
            )
        if op == "get_data":
            z = self._znodes.get(req["path"])
            if z is None:
                raise KeyError(req["path"])
            return base64.b64encode(z["data"]).decode("ascii")
        if op == "set_data":
            z = self._znodes.get(req["path"])
            if z is None:
                return False
            z["data"] = base64.b64decode(req.get("data", ""))
            return True
        if op == "get_children":
            prefix = req["path"].rstrip("/") + "/"
            out = []
            for p in self._znodes:
                rest = p[len(prefix):] if p.startswith(prefix) else ""
                if rest and "/" not in rest:
                    out.append(rest)
            return sorted(out)
        if op == "engine_spaces":
            prefix = req.get("root", "/kyuubi").rstrip("/") + "/"
            spaces = {
                p.rsplit("/", 1)[0]
                for p in self._znodes
                if p.startswith(prefix)
                and p.rsplit("/", 1)[-1].startswith("serverUri=")
            }
            return sorted(spaces)
        if op == "path_exists":
            return req["path"] in self._znodes
        if op == "path_non_exists":
            if req.get("is_prefix"):
                pre = req["path"]
                return not any(p.startswith(pre) for p in self._znodes)
            return req["path"] not in self._znodes
        if op == "delete":
            self._znodes.pop(req["path"], None)
            if req.get("delete_children"):
                pre = req["path"].rstrip("/") + "/"
                for p in [p for p in self._znodes if p.startswith(pre)]:
                    del self._znodes[p]
            return True
        if op == "lock_acquire":
            holder = self._locks.get(req["path"])
            if holder is None or holder == session:
                self._locks[req["path"]] = session
                return True
            return False
        if op == "lock_release":
            if self._locks.get(req["path"]) == session:
                del self._locks[req["path"]]
            return True
        if op == "get_and_increment":
            prev = self._counters.get(req["path"], 0)
            self._counters[req["path"]] = prev + req.get("delta", 1)
            return prev
        raise ValueError(f"unknown discovery op {op!r}")

    def _create(
        self, session: str, path: str, mode: str, data: bytes,
        create_parent: bool,
    ) -> str:
        mode = mode.upper()
        if create_parent:
            parts = [p for p in path.split("/") if p]
            for i in range(1, len(parts)):
                parent = "/" + "/".join(parts[:i])
                self._znodes.setdefault(
                    parent,
                    {"data": b"", "mode": "PERSISTENT", "owner": session},
                )
        actual = path
        if mode.endswith("_SEQUENTIAL"):
            n = self._seqs.get(path, -1) + 1
            self._seqs[path] = n
            actual = f"{path}{n:010d}"
        self._znodes[actual] = {"data": data, "mode": mode, "owner": session}
        return actual


class TcpDiscoveryClient(DiscoveryClientOps):
    """DiscoveryClient over one TCP session to a DiscoveryServer.

    The connection IS the liveness signal: everything EPHEMERAL this
    client creates (service nodes, lock grants) is deleted server-side
    the instant the socket dies — which is exactly when the owning
    process dies, however it dies.

    ZK-connect-string failover: ``tcp://h1:p1,h2:p2`` names a primary
    and any number of warm standbys (reference:
    kyuubi-ha/src/main/scala/org/apache/kyuubi/ha/client/
    DiscoveryClient.scala connect-string semantics).  Dialing — at
    create_client and on every reconnect — tries each address in order
    and sticks with the first that answers; ephemerals replay onto
    whichever daemon accepted, so a dead primary costs one failed dial,
    not an outage.
    """

    def __init__(
        self,
        address: str,
        keepalive: float | None = None,
        reconnect_timeout: float = 10.0,
    ):
        if not address.startswith("tcp://"):
            raise ValueError(f"not a tcp discovery address: {address}")
        self._path = address  # forwarded to launched engines verbatim
        self._addrs: list[tuple[str, int]] = []
        for hostport in address[len("tcp://"):].split(","):
            host, port = hostport.strip().rsplit(":", 1)
            self._addrs.append((host, int(port)))
        self._addr_idx = 0  # last address that answered
        self._sock: socket.socket | None = None
        self._lock = threading.RLock()
        # crash recovery (the ZK-client reconnect + Curator PersistentNode
        # re-create half of parity): every EPHEMERAL this client owns is
        # recorded and REPLAYED onto a fresh session when the daemon dies
        # and comes back — a restarted (empty) registry repopulates from
        # its surviving owners, no operator intervention
        self._ephemerals: dict[str, dict] = {}
        # sequential replays get fresh suffixes; callers holding the old
        # path still need delete()/set_data()/get_data() to land on the
        # live node, so renames are tracked here (old -> current)
        self._replay_aliases: dict[str, str] = {}
        self._created = False  # survives _sock=None: "should reconnect"
        self._reconnect_timeout = reconnect_timeout
        self._keepalive = keepalive
        self._keepalive_thread: threading.Thread | None = None
        self._closed = threading.Event()

    def _dial(self) -> socket.socket:
        """Try every address in the connect string, starting from the
        last one that answered; first to accept wins."""
        n = len(self._addrs)
        last: OSError | None = None
        for k in range(n):
            i = (self._addr_idx + k) % n
            try:
                sock = socket.create_connection(self._addrs[i], timeout=30)
                self._addr_idx = i
                return sock
            except OSError as e:
                last = e
        raise last if last is not None else OSError("no discovery address")

    # --- lifecycle ---

    def create_client(self) -> None:
        with self._lock:
            if self._sock is not None:
                return
            self._closed.clear()
            self._sock = self._dial()
            self._created = True
        if self._keepalive and self._keepalive_thread is None:
            t = threading.Thread(target=self._keepalive_loop, daemon=True)
            t.start()
            self._keepalive_thread = t

    def close_client(self) -> None:
        self._closed.set()
        with self._lock:
            self._keepalive_thread = None
            self._ephemerals.clear()
            self._replay_aliases.clear()
            self._created = False
            if self._sock is None:
                return
            try:
                self._sock.close()  # server expires the session on EOF
            except OSError:
                pass
            self._sock = None

    def _keepalive_loop(self) -> None:
        """Periodic ping: detects a dead daemon promptly and (via _call's
        reconnect path) re-registers this client's ephemerals as soon as
        a daemon answers again — without waiting for the next real op."""
        while not self._closed.wait(self._keepalive):
            try:
                self._call("ping")
            except (DiscoveryStoreError, OSError):
                pass  # daemon still down: retry next tick

    def _rpc_once(self, payload: dict) -> dict:
        _send_frame(self._sock, payload)
        resp = _recv_frame(self._sock)
        if resp is None:
            raise OSError("EOF from discovery server")
        return resp

    def _reconnect_and_replay(self) -> None:
        """Called under self._lock after a send/recv failure: dial every
        address in the connect string (a restarted primary comes back on
        its fixed port; a warm standby answers immediately) until one
        accepts, then replay this session's ephemerals onto it.
        Sequential nodes get fresh suffixes, exactly as a Curator
        PersistentNode would; the registered-service pointer follows its
        node and renames are recorded in _replay_aliases so callers
        holding old paths keep working."""
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
            self._sock = None
        deadline = time.time() + self._reconnect_timeout
        delay = 0.05
        while True:
            if self._closed.is_set():
                raise DiscoveryStoreError("client closed during reconnect")
            try:
                self._sock = self._dial()
                break
            except OSError:
                if time.time() >= deadline:
                    raise DiscoveryStoreError(
                        f"discovery server unreachable at {self._path} "
                        f"after {self._reconnect_timeout:.0f}s"
                    )
                time.sleep(delay)
                delay = min(delay * 2, 1.0)
        replay, self._ephemerals = self._ephemerals, {}
        for old_path in list(replay):
            req = replay[old_path]
            try:
                resp = self._rpc_once({"op": "create", **req})
            except OSError as e:
                # restore ONLY the not-yet-replayed remainder: successful
                # replays already live in _ephemerals under their NEW
                # paths, and restoring their old keys too would register
                # duplicate sequential nodes on the next reconnect
                self._ephemerals.update(replay)
                # translate so the failure never escapes _call as a raw
                # OSError (callers only catch DiscoveryStoreError)
                raise DiscoveryStoreError(
                    f"discovery reconnect replay failed: {e}"
                ) from e
            del replay[old_path]
            if not resp.get("ok"):
                continue  # e.g. parent namespace gone: node stays dropped
            new_path = resp.get("value")
            self._ephemerals[new_path] = req
            if new_path != old_path:
                # flatten chains so every recorded alias points at the
                # CURRENT path even after repeated daemon deaths
                for k, v in list(self._replay_aliases.items()):
                    if v == old_path:
                        self._replay_aliases[k] = new_path
                self._replay_aliases[old_path] = new_path
            if getattr(self, "_registered", None) == old_path:
                self._registered = new_path

    def _alias(self, path: str) -> str:
        """Translate a pre-replay path to its live replayed node."""
        with self._lock:
            return self._replay_aliases.get(path, path)

    def _call(self, op: str, **kwargs):
        # rid: the server answers a RETRIED non-idempotent op (sequential
        # create, get_and_increment) from its dedup cache instead of
        # applying it twice when the first response was lost in transit
        payload = {"op": op, "rid": uuid.uuid4().hex, **kwargs}
        with self._lock:
            if self._sock is None:
                if not self._created:
                    raise DiscoveryStoreError(
                        "client not created (create_client())"
                    )
                # a previous reconnect attempt exhausted its deadline and
                # left us disconnected: keep re-dialing (this is what
                # lets the keepalive ping revive a long daemon outage)
                self._reconnect_and_replay()
            try:
                resp = self._rpc_once(payload)
            except OSError:
                self._reconnect_and_replay()
                try:
                    resp = self._rpc_once(payload)
                except OSError as e:
                    raise DiscoveryStoreError(
                        f"discovery server connection lost: {e}"
                    )
        if not resp.get("ok"):
            raise DiscoveryStoreError(resp.get("error", "discovery error"))
        return resp.get("value")

    # --- znode primitives (same signatures as SqliteDiscoveryClient) ---

    def create(
        self,
        path: str,
        mode: str = "PERSISTENT",
        data: bytes = b"",
        create_parent: bool = True,
    ) -> str:
        req = {
            "path": path,
            "mode": mode,
            "data": base64.b64encode(data).decode("ascii"),
            "create_parent": create_parent,
        }
        out = self._call("create", **req)
        if mode.startswith("EPHEMERAL"):
            with self._lock:
                self._ephemerals[out] = req
        return out

    def get_data(self, path: str) -> bytes:
        return base64.b64decode(
            self._call("get_data", path=self._alias(path))
        )

    def set_data(self, path: str, data: bytes) -> bool:
        return self._call(
            "set_data",
            path=self._alias(path),
            data=base64.b64encode(data).decode("ascii"),
        )

    def get_children(self, path: str) -> list[str]:
        return self._call("get_children", path=path)

    def engine_spaces(self, root: str = "/kyuubi") -> list[str]:
        return self._call("engine_spaces", root=root)

    def path_exists(self, path: str) -> bool:
        return self._call("path_exists", path=path)

    def path_non_exists(self, path: str, is_prefix: bool = False) -> bool:
        return self._call("path_non_exists", path=path, is_prefix=is_prefix)

    def delete(self, path: str, delete_children: bool = False) -> None:
        # Drop the node from the replay set BEFORE the RPC: if the
        # connection dies mid-delete, _call's reconnect replays
        # _ephemerals, and a node still present there would be
        # re-registered under a fresh sequential path — the retried
        # delete then targets the OLD path (rid cache or "no node"),
        # silently resurrecting a deregistered service on every future
        # reconnect.  Restore on failure so an unreachable daemon does
        # not lose the registration either.
        with self._lock:
            live = self._replay_aliases.get(path, path)
            saved = {
                p: self._ephemerals.pop(p)
                for p in (live, path)
                if p in self._ephemerals
            }
            saved_alias = self._replay_aliases.pop(path, None)
        try:
            self._call("delete", path=live, delete_children=delete_children)
        except DiscoveryStoreError:
            with self._lock:
                for p, req in saved.items():
                    self._ephemerals.setdefault(p, req)
                if saved_alias is not None:
                    self._replay_aliases.setdefault(path, saved_alias)
            raise

    # --- locking: a grant dies with this session, no TTL steal needed ---

    @contextlib.contextmanager
    def try_with_lock(self, lock_path: str, timeout_ms: int = 10_000):
        deadline = time.time() + timeout_ms / 1000.0
        acquired = False
        while time.time() < deadline:
            if self._call("lock_acquire", path=lock_path):
                acquired = True
                break
            time.sleep(0.01)
        if not acquired:
            raise TimeoutError(
                f"Timeout acquiring lock {lock_path} after {timeout_ms}ms"
            )
        try:
            yield
        finally:
            try:
                self._call("lock_release", path=lock_path)
            except DiscoveryStoreError:
                pass  # connection died: the server already released it

    # --- atomic counter ---

    def get_and_increment(self, path: str, delta: int = 1) -> int:
        return self._call("get_and_increment", path=path, delta=delta)


def main(argv: list[str] | None = None) -> None:
    """Standalone daemon: ``python -m kyuubi_spark.gateway.discovery_tcp
    --port N`` serves the registry until killed.  Prints its
    ``tcp://host:port`` address on the first stdout line (flushed) so a
    launcher can wait for readiness; a FIXED --port lets a restarted
    daemon come back on the same address, which is what client-side
    reconnect + ephemeral replay (TcpDiscoveryClient) dials back to."""
    import argparse
    import sys

    ap = argparse.ArgumentParser(description="kyuubi_spark TCP discovery")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument(
        "--standby",
        default=None,
        help="warm-standby address (tcp://host:port) to push async "
        "persistent-state snapshots to",
    )
    args = ap.parse_args(argv)
    srv = DiscoveryServer(
        host=args.host, port=args.port, standby=args.standby
    ).start()
    print(srv.address, flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()
        sys.exit(0)


if __name__ == "__main__":
    main()
