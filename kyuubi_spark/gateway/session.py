"""Gateway sessions and the session manager.

Counterpart of the reference's Session/SessionManager
(kyuubi-common/.../session/Session.scala:24-99 — executeStatement + the
metadata operation set; SessionManager.scala) and the Spark engine's
session impl (externals/.../session/SparkSessionImpl.scala:56-105 — conf
application, current catalog/db, KDF registration;
SparkSQLSessionManager.scala:126-138 — `rootSparkSession.newSession()`
clones sharing one SparkContext with isolated SQLConf/temp views).
"""

from __future__ import annotations

import re
import threading
import time
from typing import TYPE_CHECKING, Any

from kyuubi_spark.gateway import conf as C
from kyuubi_spark.gateway import operations as OPS
from kyuubi_spark.gateway.kdf import register_kdfs
from kyuubi_spark.gateway.state import OperationHandle, SessionHandle

if TYPE_CHECKING:
    from pyspark.sql import SparkSession

    from kyuubi_spark.gateway.engine import Engine

# `use catalog.db` / `use db` statements are converted to catalog ops, as the
# reference dispatches them (SparkSQLOperationManager.scala:64-71).
_USE_RE = re.compile(r"^\s*use\s+(?:(\w+)\.)?(\w+)\s*;?\s*$", re.IGNORECASE)


class Session:
    def __init__(
        self,
        engine: "Engine",
        user: str,
        session_conf: dict[str, Any] | None = None,
    ):
        self.engine = engine
        self.user = user
        self.ip_address = ""
        self.handle = SessionHandle()
        self.conf = engine.conf.merged(session_conf)
        self.spark: SparkSession = engine.root_spark.newSession()
        self.operations: dict[str, OPS.Operation] = {}
        self.last_access = time.time()
        self._lock = threading.RLock()
        self.python_namespace: dict[str, Any] = {"spark": self.spark}
        # Session-owned registry for operator-internal persists (dedup
        # signature caches etc.): statements executed through this session
        # register here (kyuubi_spark.caching.cache_scope), and close()
        # releases ONLY these — never another session's in-flight caches.
        self._cached: list[Any] = []

        # Apply client conf: spark.* keys become session SQLConf overrides
        # (SparkSessionImpl.scala:56-105).
        for k, v in self.conf.items():
            if k.startswith("spark.") and not k.startswith("spark.master"):
                try:
                    self.spark.conf.set(k, str(v))
                except Exception:
                    pass  # static conf — builder-level only
        # HS2 "use:database" client conf selects the session's initial
        # database (reference SparkSQLSessionManager.openSession applies
        # use:<db> on open; the JDBC URL's /db path arrives this way)
        use_db = self.conf.get_raw("use:database")
        if use_db:
            self.spark.catalog.setCurrentDatabase(str(use_db))
        register_kdfs(self.spark, session_user=user)

    # -- statement execution ----------------------------------------------
    def execute_statement(
        self,
        statement: str,
        conf_overlay: dict[str, Any] | None = None,
        run_async: bool = False,
    ) -> OPS.Operation:
        """Dispatch a statement (SparkSQLOperationManager.scala:58-131):
        language/plan-only conf routing, `use` conversion, zorder DSL."""
        self.last_access = time.time()
        conf = self.conf.merged(conf_overlay)

        # Server DSL: answered by the gateway, never reaching Spark
        # (KyuubiSqlBaseParser.g4:22-34; DescribeSession/DescribeEngine.scala).
        from kyuubi_spark.gateway import server as SRV

        dsl = SRV.parse_server_dsl(statement)
        if dsl is not None:
            op = OPS.MetadataOperation(self)
            if dsl == "session":
                fields = [("SESSION_ID", OPS._S), ("SESSION_USER", OPS._S),
                          ("SESSION_TYPE", OPS._S)]
                rows = [(self.handle.id, self.user, "INTERACTIVE")]
            else:
                info = self.engine.get_info()
                fields = [("ENGINE_ID", OPS._S), ("ENGINE_NAME", OPS._S),
                          ("ENGINE_URL", OPS._S), ("ENGINE_INSTANCE", OPS._S),
                          ("ENGINE_VERSION", OPS._S), ("ENGINE_ATTRIBUTES", OPS._S)]
                rows = [(
                    info["APPLICATION_ID"], info["SERVER_NAME"], "",
                    "local", info["ENGINE_VERSION"], "",
                )]
            op._execute = lambda: op._finish(fields, rows)  # type: ignore[method-assign]
            return self._register(op.run())

        if conf.get(C.DROP_IGNORE_NONEXISTENT):
            statement = SRV.drop_ignore_nonexistent(statement)

        m = _USE_RE.match(statement)
        if m:
            catalog, db = m.group(1), m.group(2)
            if catalog:
                self.spark.catalog.setCurrentCatalog(catalog)
            self.spark.catalog.setCurrentDatabase(db)
            op = OPS.MetadataOperation(self)
            op._execute = lambda: op._finish([("result", OPS._S)], [])  # type: ignore[method-assign]
            return self._register(op.run())

        if self.engine.authorizer is not None:
            # Plan-level privilege check on the analyzed statement (the
            # secured-view layer enforces row/column policies; this audits
            # and gates arbitrary SQL — PrivilegesBuilder parity).
            from kyuubi_spark.operators.privileges import authorize_statement

            authorize_statement(self, statement, self.engine.authorizer)

        zorder_stmt = self.engine.parse_optimize_zorder(statement)
        if zorder_stmt is not None:
            return self._register(zorder_stmt(self).run())

        lang = conf.get(C.OPERATION_LANGUAGE).upper()
        if lang == "PYTHON":
            op: OPS.Operation = OPS.ExecutePython(
                self, statement, should_run_async=run_async
            )
        else:
            mode = conf.get(C.OPERATION_PLAN_ONLY_MODE).lower()
            if mode != "none":
                op = OPS.PlanOnlyStatement(
                    self,
                    statement,
                    mode,
                    conf.get(C.OPERATION_PLAN_ONLY_OUT_STYLE),
                    should_run_async=run_async,
                )
            else:
                op = OPS.ExecuteStatement(
                    self, statement, conf=conf, should_run_async=run_async
                )
        from kyuubi_spark.caching import cache_scope

        with cache_scope(self._cached):
            op.run()
            if not run_async:
                op.wait()
        return self._register(op)

    def write_table(self, df, path: str, fmt: str = "parquet",
                    mode: str = "overwrite", partition_by=None) -> None:
        """Conf-driven write path: kyuubi.zorder.enabled/cols auto-inject a
        z-order cluster (InsertZorderBeforeWriting.scala:1-179, table-prop
        driven in the reference, session-conf driven here), else
        kyuubi.write.rebalance.enabled injects the AQE rebalance
        (RebalanceBeforeWriting.scala:1-177)."""
        from kyuubi_spark.operators.write import write_table as wt

        zorder_by = None
        if self.conf.get(C.ZORDER_ENABLED):
            cols = self.conf.get(C.ZORDER_COLS)
            zorder_by = [c.strip() for c in cols.split(",") if c.strip()] or None
        wt(
            df, path, fmt=fmt, mode=mode, partition_by=partition_by,
            zorder_by=zorder_by,
            do_rebalance=self.conf.get(C.REBALANCE_BEFORE_WRITE),
        )

    def _register(self, op: OPS.Operation) -> OPS.Operation:
        with self._lock:
            self.operations[op.handle.id] = op
        return op

    # -- metadata operations (Session.scala:51-96) -------------------------
    def get_catalogs(self) -> OPS.Operation:
        return self._register(OPS.GetCatalogs(self).run())

    def get_schemas(self, catalog=None, schema_pattern=None) -> OPS.Operation:
        return self._register(OPS.GetSchemas(self, catalog, schema_pattern).run())

    def get_tables(self, catalog=None, schema_pattern=None, table_pattern=None, table_types=None) -> OPS.Operation:
        return self._register(
            OPS.GetTables(self, catalog, schema_pattern, table_pattern, table_types).run()
        )

    def get_table_types(self) -> OPS.Operation:
        return self._register(OPS.GetTableTypes(self).run())

    def get_columns(self, catalog=None, schema_pattern=None, table_pattern=None, column_pattern=None) -> OPS.Operation:
        return self._register(
            OPS.GetColumns(self, catalog, schema_pattern, table_pattern, column_pattern).run()
        )

    def get_functions(self, function_pattern=None) -> OPS.Operation:
        return self._register(OPS.GetFunctions(self, function_pattern).run())

    def get_type_info(self) -> OPS.Operation:
        return self._register(OPS.GetTypeInfo(self).run())

    def get_primary_keys(self) -> OPS.Operation:
        return self._register(OPS.GetPrimaryKeys(self).run())

    def get_cross_reference(self) -> OPS.Operation:
        return self._register(OPS.GetCrossReference(self).run())

    # -- operation management ---------------------------------------------
    def get_operation(self, handle: OperationHandle | str) -> OPS.Operation:
        hid = handle.id if isinstance(handle, OperationHandle) else handle
        return self.operations[hid]

    def cancel_operation(self, handle: OperationHandle | str) -> None:
        self.get_operation(handle).cancel()

    def close_operation(self, handle: OperationHandle | str) -> None:
        op = self.get_operation(handle)
        op.close()
        with self._lock:
            self.operations.pop(op.handle.id, None)

    def close(self) -> None:
        with self._lock:
            for op in list(self.operations.values()):
                op.close()
            self.operations.clear()
        # release THIS session's operator-internal persisted relations
        # (dedup signature caches etc.) so a long-lived gateway process
        # doesn't accumulate cached partitions across sessions — mirrors
        # the reference's engine-TTL-bounded resource lifecycle
        # (EngineRef.scala).  Scoped to self._cached: closing one session
        # must not unpersist relations load-bearing for other still-open
        # sessions' in-flight queries.
        from kyuubi_spark.caching import release_caches

        # Swap the registry atomically under the lock: statement threads
        # append to self._cached concurrently, and popping while they append
        # could strand a persist untracked.  After the swap, late appends
        # land in the fresh list and are released by a later close() (close
        # is idempotent) or the engine shutdown drain.
        with self._lock:
            reg, self._cached = self._cached, []
        release_caches(reg)


class SessionManager:
    """Open/close/lookup + idle timeout sweep (SessionManager.scala)."""

    def __init__(self, engine: "Engine"):
        self.engine = engine
        self._sessions: dict[str, Session] = {}
        self._lock = threading.RLock()

    def open_session(self, user: str = "anonymous", conf: dict | None = None) -> Session:
        # per-session engine-type routing (KyuubiConf ENGINE_TYPE — the
        # reference launches a kyuubi-jdbc-engine for these sessions and
        # every frontend keeps working against the shared surface)
        engine_type = (conf or {}).get("kyuubi.engine.type", "").upper()
        if engine_type == "JDBC":
            from kyuubi_spark.gateway.jdbc_backed import JdbcBackedSession

            s = JdbcBackedSession(self.engine, user, conf)
        elif engine_type in ("THRIFT", "HIVE"):
            # HIVE sessions speak the HS2 thrift wire to the configured
            # endpoint — a HiveServer2-compatible server or another
            # gateway/engine (the reference's kyuubi-hive-engine is the
            # same HS2-protocol client against a Hive backend)
            from kyuubi_spark.gateway.remote import RemoteEngineSession

            s = RemoteEngineSession(self.engine, user, conf)
        elif engine_type == "TRINO":
            from kyuubi_spark.gateway.trino_engine import TrinoBackedSession

            s = TrinoBackedSession(self.engine, user, conf)
        elif engine_type in ("", "SPARK_SQL") and (
            str((conf or {}).get("kyuubi.engine.launch.enabled", "")).lower()
            in ("true", "1", "yes")
            or getattr(self.engine, "launch_engines", False)
        ):
            # the reference's DEFAULT lifecycle: EngineRef.getOrCreate
            # spawns/discovers a separate engine process per share level
            # and forwards the session over thrift (KyuubiSessionImpl
            # .openEngineSession); in-process remains this repo's default,
            # opted out of via kyuubi.engine.launch.enabled
            from kyuubi_spark.gateway.engine_process import (
                open_process_session,
            )

            s = open_process_session(self.engine, user, conf)
        else:
            s = Session(self.engine, user, conf)
        with self._lock:
            self._sessions[s.handle.id] = s
        return s

    def get_session(self, handle: SessionHandle | str) -> Session:
        hid = handle.id if isinstance(handle, SessionHandle) else handle
        return self._sessions[hid]

    def close_session(self, handle: SessionHandle | str) -> None:
        hid = handle.id if isinstance(handle, SessionHandle) else handle
        with self._lock:
            s = self._sessions.pop(hid, None)
        if s:
            s.close()

    def sweep_idle(self) -> int:
        """Close sessions idle beyond kyuubi.session.idle.timeout."""
        now = time.time()
        closed = 0
        for s in list(self._sessions.values()):
            timeout = s.conf.get(C.SESSION_IDLE_TIMEOUT)
            if timeout > 0 and now - s.last_access > timeout:
                # engine-level close keeps the limiter/metadata store in sync
                self.engine.close_session(s.handle)
                closed += 1
        return closed

    @property
    def count(self) -> int:
        return len(self._sessions)
