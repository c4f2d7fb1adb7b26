"""The engine facade: root SparkSession + session manager + value-add rules.

Counterpart of the reference's SparkSQLEngine bootstrap (externals/.../
SparkSQLEngine.scala createSpark) plus the gateway-level statement
pre-parse the reference does with ANTLR grammars
(KyuubiSparkSQL.g4:52-61 `OPTIMIZE t [WHERE p] ZORDER BY cols`;
KyuubiSqlBaseParser.g4 server DSL). Share levels (EngineRef.scala:74) are a
process-pooling concern; in-process we model the CONNECTION level as one
`newSession()` clone per open_session — same isolation surface
(SQLConf/temp views), one JVM.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from kyuubi_spark.gateway import conf as C
from kyuubi_spark.gateway import server as SRV
from kyuubi_spark.gateway.session import Session, SessionManager
from kyuubi_spark.operators import watchdog as WD


def _csv_set(raw: str) -> set[str]:
    return {p.strip() for p in raw.split(",") if p.strip()}

_OPTIMIZE_RE = re.compile(
    r"^\s*optimize\s+(?P<table>[\w.`]+)"
    r"(?:\s+where\s+(?P<where>.+?))?"
    r"\s+zorder\s+by\s+(?P<cols>[\w,\s.`]+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


class Engine:
    """One engine process = one root SparkSession (the reference's Spark
    app); gateway sessions are newSession() clones."""

    def __init__(self, spark: SparkSession | None = None, conf: dict[str, Any] | None = None):
        if spark is None:
            from kyuubi_spark.session import build_session

            spark = build_session(app_name="kyuubi-spark-engine")
        self.root_spark = spark
        self.conf = C.GatewayConf(conf)
        self.sessions = SessionManager(self)
        self.limiter = SRV.SessionLimiter(
            user_limit=self.conf.get(C.LIMIT_CONNECTIONS_PER_USER),
            ip_limit=self.conf.get(C.LIMIT_CONNECTIONS_PER_IP),
            user_ip_limit=self.conf.get(C.LIMIT_CONNECTIONS_PER_USER_IP),
            unlimited_users=_csv_set(self.conf.get(C.LIMIT_CONNECTIONS_UNLIMITED_USERS)),
            deny_users=_csv_set(self.conf.get(C.LIMIT_CONNECTIONS_DENY_USERS)),
        )
        advisor_dir = self.conf.get(C.SESSION_CONF_ADVISOR_DIR)
        self.conf_advisor = (
            SRV.FileSessionConfAdvisor(advisor_dir) if advisor_dir else None
        )
        store_path = self.conf.get(C.METADATA_STORE_PATH)
        self.metadata_store = SRV.MetadataStore(store_path) if store_path else None
        # Lifecycle events + metrics (kyuubi-events EventBus / kyuubi-metrics
        # MetricsSystem). Optional JSON-lines event log via conf.
        from kyuubi_spark.gateway.events import (
            EventBus,
            JsonFileEventLogger,
            OperationEventsStore,
        )
        from kyuubi_spark.gateway.metrics import MetricsRegistry

        self.events = EventBus()
        self.metrics = MetricsRegistry()
        # per-operation accounting, queryable after close (EngineEventsStore)
        self.op_store = OperationEventsStore()
        log_path = self.conf.get(C.EVENT_LOG_PATH)
        if log_path:
            self.events.subscribe(JsonFileEventLogger(log_path))
        # Plan-level ACL authorizer (PrivilegesBuilder parity); None = off.
        self.authorizer = None
        acl_path = self.conf.get(C.AUTHZ_ACL_PATH)
        if acl_path:
            import json

            from kyuubi_spark.operators.privileges import AclAuthorizer, UserAcl

            with open(acl_path) as f:
                raw = json.load(f)
            self.authorizer = AclAuthorizer(
                {
                    user: UserAcl(
                        tables=set(spec.get("tables", [])),
                        can_update=bool(spec.get("can_update", False)),
                        can_ddl=bool(spec.get("can_ddl", False)),
                    )
                    for user, spec in raw.items()
                },
                default_allow=self.conf.get(C.AUTHZ_DEFAULT_ALLOW),
            )

    # -- session lifecycle -------------------------------------------------
    def open_session(
        self, user: str = "anonymous", conf: dict | None = None, ip_address: str = ""
    ) -> Session:
        self.limiter.increment(user, ip_address)
        try:
            if self.conf_advisor is not None:
                overlay = self.conf_advisor.get_conf_overlay(user, conf or {})
                # advisor-provided profile conf is the base; explicit client
                # conf wins (KyuubiSessionManager.openSession merge order)
                conf = {**overlay, **(conf or {})}
            s = self.sessions.open_session(user, conf)
        except Exception:
            self.limiter.decrement(user, ip_address)
            raise
        s.ip_address = ip_address
        if self.metadata_store is not None:
            self.metadata_store.insert(
                s.handle.id, "INTERACTIVE", user, ip_address,
                state="RUNNING", request_conf=conf,
            )
        from kyuubi_spark.gateway import metrics as M
        from kyuubi_spark.gateway.events import make_event

        self.metrics.inc(M.CONN_OPEN)
        self.metrics.inc(M.CONN_TOTAL)
        self.metrics.inc(f"{M.CONN_TOTAL}.{user}")
        self.events.post(
            make_event("SessionOpened", sessionId=s.handle.id, user=user, ip=ip_address)
        )
        return s

    def close_session(self, handle) -> None:
        try:
            s = self.sessions.get_session(handle)
        except KeyError:
            return
        self.sessions.close_session(handle)
        self.limiter.decrement(s.user, getattr(s, "ip_address", ""))
        if self.metadata_store is not None:
            self.metadata_store.update_state(s.handle.id, "CLOSED", ended=True)
        from kyuubi_spark.gateway import metrics as M
        from kyuubi_spark.gateway.events import make_event

        self.metrics.dec(M.CONN_OPEN)
        self.events.post(
            make_event("SessionClosed", sessionId=s.handle.id, user=s.user)
        )

    # -- GetInfo (TFrontendService.scala:223) ------------------------------
    def get_info(self) -> dict[str, Any]:
        from kyuubi_spark.gateway.kdf import ENGINE_NAME, ENGINE_VERSION

        return {
            "SERVER_NAME": ENGINE_NAME,
            "DBMS_NAME": "Spark SQL",
            "DBMS_VER": self.root_spark.version,
            "ENGINE_VERSION": ENGINE_VERSION,
            "APPLICATION_ID": self.root_spark.sparkContext.applicationId,
            "MAX_COLUMN_NAME_LEN": 128,
            "MAX_SCHEMA_NAME_LEN": 128,
            "MAX_TABLE_NAME_LEN": 128,
        }

    # -- value-add hooks ---------------------------------------------------
    def watchdog_check(self, session: Session, df: DataFrame) -> None:
        max_bytes = session.conf.get(C.WATCHDOG_MAX_SCAN_BYTES)
        WD.check_max_scan(df, max_bytes)

    def apply_write_rules(self, session: Session, df: DataFrame) -> DataFrame:
        """forcedMaxOutputRows cap on SELECT results (watchdog docs)."""
        max_rows = session.conf.get(C.WATCHDOG_FORCED_MAX_ROWS)
        return WD.forced_limit(df, max_rows)

    def parse_optimize_zorder(
        self, statement: str
    ) -> Callable[[Session], Any] | None:
        """Pre-parse `OPTIMIZE t [WHERE p] ZORDER BY c1,c2` (the reference's
        extension grammar) → an operation factory, else None."""
        m = _OPTIMIZE_RE.match(statement)
        if not m:
            return None
        table = m.group("table").replace("`", "")
        where = m.group("where")
        cols = [c.strip().replace("`", "") for c in m.group("cols").split(",")]

        def make(session: Session):
            from kyuubi_spark.gateway.operations import Operation

            class OptimizeZorder(Operation):
                def _execute(op_self) -> None:  # noqa: N805
                    from pyspark.sql import types as T

                    from kyuubi_spark.gateway.fetch import ArrayFetchIterator
                    from kyuubi_spark.gateway.operations import OperationError
                    from kyuubi_spark.operators.zorder import optimize_zorder

                    spark = session.spark
                    # Only persistent catalog tables may be rewritten: an
                    # insert into a path-backed temp view writes through to
                    # the source files (OptimizeZorderCommand resolves to a
                    # catalog relation for the same reason).
                    short = table.split(".")[-1]
                    meta = None
                    try:
                        meta = spark.catalog.getTable(table)
                    except Exception:
                        pass
                    if meta is None or meta.isTemporary:
                        raise OperationError(
                            f"OPTIMIZE ZORDER requires a persistent table; "
                            f"'{short}' is a temporary view or not found"
                        )
                    df = spark.table(table)
                    if where:
                        df = df.filter(where)
                    clustered = optimize_zorder(df, cols)
                    # rewrite in place via a temp overwrite cycle
                    tmp = f"__kyuubi_zorder_tmp_{op_self.handle.id[:8]}"
                    clustered.write.mode("overwrite").saveAsTable(tmp)
                    spark.table(tmp).write.mode("overwrite").insertInto(table)
                    spark.sql(f"DROP TABLE {tmp}")
                    op_self._schema = T.StructType(
                        [T.StructField("result", T.StringType())]
                    )
                    op_self._iter = ArrayFetchIterator([("OK",)])

            return OptimizeZorder(session, should_run_async=False)

        return make
