"""Engine pooling with share-level routing.

Counterpart of the reference's EngineRef (kyuubi-server/.../engine/
EngineRef.scala:74,108-118,164-191 + ShareLevel.scala:23-33): an incoming
connection is routed to an engine keyed by its share level —

  CONNECTION  one engine per connection (strongest isolation, no reuse)
  USER        one engine (or pool) per user        [reference default]
  GROUP       one per primary group
  SERVER      one shared by everyone

plus engine pools (`ENGINE_POOL_SIZE`: round-robin over N engines per key)
and idle TTL (`ENGINE_IDLE_TIMEOUT`).

In-process simplification, stated plainly: the reference spawns a separate
Spark APPLICATION per engine (process isolation); a single JVM can hold one
SparkContext, so each pooled "engine" here shares the root SparkSession and
isolation is per-session `newSession()` SQLConf/temp-view isolation. The
routing, pooling, and TTL semantics — what the gateway layer owns — are
faithfully exercised.  For REAL process-level engines (crash isolation,
per-user resource boundaries), `kyuubi.engine.launch.enabled` routes
session opens through gateway/engine_process.py instead: a separate OS
process per share-level engine space, discovered and torn down with the
EngineRef.getOrCreate lifecycle.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql import SparkSession

from kyuubi_spark.gateway.engine import Engine

SHARE_LEVELS = ("CONNECTION", "USER", "GROUP", "SERVER")


class PooledEngine:
    def __init__(self, engine: Engine, key: str, node_path: str | None = None):
        self.engine = engine
        self.key = key
        self.node_path = node_path  # discovery znode, when registered
        self.last_used = time.time()

    def touch(self) -> "PooledEngine":
        self.last_used = time.time()
        return self


class EnginePool:
    def __init__(
        self,
        root_spark: SparkSession,
        share_level: str = "USER",
        pool_size: int = 1,
        idle_timeout: float = 3600.0,
        discovery=None,
    ):
        """``discovery``: optional SqliteDiscoveryClient (gateway/
        discovery.py). When given, every pooled engine registers an
        EPHEMERAL_SEQUENTIAL service node under /kyuubi/<engine space>
        (EngineRef.scala's create-on-launch + DiscoveryClient
        registerService), is discoverable via get_server_host /
        get_engine_by_ref_id, and is deregistered on idle eviction."""
        level = share_level.upper()
        if level not in SHARE_LEVELS:
            raise ValueError(f"unknown share level {share_level}; one of {SHARE_LEVELS}")
        self.root_spark = root_spark
        self.share_level = level
        self.pool_size = max(1, pool_size)
        self.idle_timeout = idle_timeout
        self.discovery = discovery
        if discovery is not None:
            discovery.create_client()
        self._engines: dict[str, list[PooledEngine]] = {}
        self._rr: dict[str, int] = {}
        self._lock = threading.RLock()
        self._conn_seq = 0

    def _engine_space(self, user: str, group: str | None, connection_id: str | None) -> str:
        """The discovery key (EngineRef.engineSpace, :175-196)."""
        if self.share_level == "CONNECTION":
            return f"connection/{connection_id}"
        if self.share_level == "USER":
            return f"user/{user}"
        if self.share_level == "GROUP":
            return f"group/{group or user}"
        return "server/shared"

    def _make_engine(self) -> Engine:
        return Engine(spark=self.root_spark)

    def _pooled(self, key: str) -> PooledEngine:
        """Create an engine; when discovery is wired, publish its service
        node (instance = in-process pseudo host:port derived from the
        engine id; with spark-submit engines this is the real thrift
        host:port the engine binds)."""
        engine = self._make_engine()
        node = None
        if self.discovery is not None:
            import uuid as _uuid

            ref_id = _uuid.uuid4().hex
            seq = self.discovery.get_and_increment("/kyuubi/ports")
            node = self.discovery.create_and_get_service_node(
                f"/kyuubi/{key}",
                f"localhost:{20000 + seq}",
                engine_ref_id=ref_id,
            )
        return PooledEngine(engine, key, node_path=node)

    def get_engine(
        self, user: str = "anonymous", group: str | None = None, connection_id: str | None = None
    ) -> Engine:
        """Route a connection to its engine (create on miss, round-robin in
        the key's pool)."""
        with self._lock:
            if self.share_level == "CONNECTION":
                self._conn_seq += 1
                connection_id = connection_id or str(self._conn_seq)
            key = self._engine_space(user, group, connection_id)
            pool = self._engines.setdefault(key, [])
            if self.share_level == "CONNECTION":
                if not pool:
                    pool.append(self._pooled(key))
                return pool[0].touch().engine
            if len(pool) < self.pool_size:
                pe = self._pooled(key)
                pool.append(pe)
                return pe.touch().engine
            idx = self._rr.get(key, 0) % len(pool)
            self._rr[key] = idx + 1
            return pool[idx].touch().engine

    def sweep_idle(self) -> int:
        """Evict engines idle beyond the TTL (ENGINE_IDLE_TIMEOUT)."""
        now = time.time()
        evicted = 0
        with self._lock:
            for key, pool in list(self._engines.items()):
                keep = []
                for pe in pool:
                    if now - pe.last_used > self.idle_timeout:
                        for s in list(pe.engine.sessions._sessions.values()):
                            pe.engine.close_session(s.handle)
                        if self.discovery is not None and pe.node_path:
                            self.discovery.delete(pe.node_path)
                        evicted += 1
                    else:
                        keep.append(pe)
                if keep:
                    self._engines[key] = keep
                else:
                    self._engines.pop(key, None)
        return evicted

    @property
    def engine_count(self) -> int:
        return sum(len(p) for p in self._engines.values())
