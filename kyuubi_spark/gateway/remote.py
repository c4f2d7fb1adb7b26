"""Remote engine sessions — the gateway→engine hop over the thrift wire,
resolved through service discovery.

In the reference, EVERY interactive session takes this shape: the server's
``KyuubiSessionImpl`` asks ``EngineRef`` for the engine's (host, port) —
found via the discovery client under the share-level namespace, launching
the engine on miss — then opens a REAL thrift connection with
``KyuubiSyncThriftClient`` and forwards each operation over the wire
(kyuubi-server/.../session/KyuubiSessionImpl.scala, engine/EngineRef
.scala:164-191, client/KyuubiSyncThriftClient.scala).  Our default
in-process engine collapses that hop; this module restores it for
sessions that ask (``kyuubi.engine.type=THRIFT``), completing the
architecture: frontends → gateway session → discovery lookup → thrift
client → a remote engine's thrift frontend.

Resolution order (EngineRef.getOrCreate semantics, minus the launch):
1. explicit ``kyuubi.engine.thrift.host``/``kyuubi.engine.thrift.port``;
2. else a discovery lookup of ``kyuubi.engine.namespace`` via the
   engine's discovery client (``get_server_host`` — newest node wins).

The remote operation surface mirrors the gateway's (StructType from the
wire's TTypeId entries, FetchIterator-style windows via FETCH_NEXT /
FETCH_PRIOR / FETCH_FIRST pass-through), so the unchanged frontends can
serve a forwarded session — self-hosting included (tests point a remote
session at this repo's OWN ThriftFrontendService).
"""

from __future__ import annotations

import time

from pyspark.sql import types as T

from kyuubi_spark.gateway import conf as C
from kyuubi_spark.gateway.state import (
    FetchOrientation,
    OperationHandle,
    OperationState,
    SessionHandle,
)

ENGINE_HOST_KEY = "kyuubi.engine.thrift.host"
ENGINE_PORT_KEY = "kyuubi.engine.thrift.port"
ENGINE_NAMESPACE_KEY = "kyuubi.engine.namespace"

# session-conf keys the GATEWAY consumes for routing/transport/launch —
# everything else is the engine's business and crosses the wire on open
_NO_FORWARD_PREFIXES = (
    "kyuubi.engine.thrift.",
    "kyuubi.engine.share.level",
    "kyuubi.engine.pool.",
    "kyuubi.session.engine.",
)
_NO_FORWARD_KEYS = frozenset(
    {
        "kyuubi.engine.launch.enabled",
        ENGINE_NAMESPACE_KEY,
        "kyuubi.engine.type",
        "kyuubi.session.group",
    }
)


def _forwardable_session_conf(raw: dict) -> dict:
    return {
        k: v
        for k, v in (raw or {}).items()
        if k not in _NO_FORWARD_KEYS
        and not any(k.startswith(p) for p in _NO_FORWARD_PREFIXES)
    }

# TTypeId ordinal -> Spark type (reverse of thrift._TYPE_ID)
# Python-side types of FETCHED values.  String-carried wire types
# (timestamp/date/decimal/nested/interval) arrive as their FINAL rendered
# strings — mapping them to StringType keeps the outer re-serialization an
# identity (re-rendering an already-rendered string crashes); the ORIGINAL
# TTypeIds still reach clients via the wire_type_ids metadata pass-through.
_SPARK_TYPE = {
    0: T.BooleanType(),
    1: T.ByteType(),
    2: T.ShortType(),
    3: T.IntegerType(),
    4: T.LongType(),
    5: T.FloatType(),
    6: T.DoubleType(),
    7: T.StringType(),
    8: T.StringType(),  # TIMESTAMP (hive-string on the wire)
    9: T.BinaryType(),
    10: T.StringType(),  # ARRAY (hive-string on the wire)
    11: T.StringType(),  # MAP (hive-string on the wire)
    12: T.StringType(),  # STRUCT (hive-string on the wire)
    15: T.StringType(),  # DECIMAL (hive-string on the wire)
    16: T.NullType(),
    17: T.StringType(),  # DATE (hive-string on the wire)
    18: T.StringType(),  # VARCHAR
    19: T.StringType(),  # CHAR
    20: T.StringType(),  # INTERVAL_YEAR_MONTH (hive-string on the wire)
    21: T.StringType(),  # INTERVAL_DAY_TIME (hive-string on the wire)
}

_ORIENT_ORDINAL = {
    FetchOrientation.FETCH_NEXT: 0,
    FetchOrientation.FETCH_PRIOR: 1,
    FetchOrientation.FETCH_FIRST: 4,
}


class RemoteOperation:
    """Gateway-operation adapter over a remote op guid on the wire."""

    def __init__(self, session: "RemoteEngineSession", guid: bytes,
                 failed: BaseException | None = None,
                 statement: str | None = None,
                 arrow: bool = False):
        self.session = session
        self.guid = guid
        self._arrow = arrow
        self.handle = OperationHandle()
        self.exception = failed
        self._struct: T.StructType | None = None
        self.wire_type_ids: list | None = None  # engine (name, TTypeId)s
        self.statement = statement
        self.start_time = time.time()
        self.rows_fetched = 0
        # last-known remote state, refreshed only when something else
        # already paid for a wire poll (the .state property) — accounting
        # must NOT add GetOperationStatus RPCs on the hot fetch path
        # (ADVICE r08), and failed ops (guid=b'') must record terminally
        self._last_state = "ERROR" if failed is not None else "RUNNING"
        self._store_summary()

    def _store_summary(self) -> None:
        """Gateway-side accounting for FORWARDED operations: the op store
        is where a multi-tenant operator looks first, and forwarded
        sessions are the production path — record them alongside local
        ops. State is the cached last-known remote state (no wire call
        here): ERROR when the forward failed, else whatever the latest
        .state poll observed."""
        engine = getattr(self.session, "engine", None)
        store = getattr(engine, "op_store", None)
        if store is None:
            return
        state = "ERROR" if self.exception is not None else self._last_state
        store.put(
            {
                "operationId": self.handle.id,
                "sessionId": self.session.handle.id,
                "operation": "RemoteOperation",
                "statement": self.statement,
                "user": self.session.user,
                "state": state,
                "createTime": self.start_time,
                "completeTime": (
                    time.time()
                    if state in ("ERROR", "FINISHED", "CANCELED", "CLOSED")
                    else None
                ),
                "duration": time.time() - self.start_time,
                "transitions": [],
                "rowsFetched": self.rows_fetched,
                "collectMode": "forwarded",
                "error": str(self.exception) if self.exception else None,
            }
        )

    @property
    def state(self) -> OperationState:
        if self.exception is not None:
            return OperationState.ERROR
        # poll the remote state (GetOperationStatus pass-through)
        ordinal = self.session.client.operation_state(self.guid)
        st = {
            0: OperationState.INITIALIZED, 1: OperationState.RUNNING,
            2: OperationState.FINISHED, 3: OperationState.CANCELED,
            4: OperationState.CLOSED, 5: OperationState.ERROR,
            7: OperationState.PENDING, 8: OperationState.TIMEOUT,
        }.get(ordinal, OperationState.RUNNING)
        self._last_state = st.value  # accounting reuses this paid-for poll
        return st

    def get_result_set_schema(self) -> T.StructType:
        if self._struct is None:
            cols = self.session.client.result_schema(self.guid)
            # keep the ENGINE's TTypeIds for metadata pass-through: the
            # Spark-type round-trip below collapses intervals/nested to
            # string, but the outer wire must re-serve the original ids
            # (KyuubiOperation relays the engine's TTableSchema verbatim)
            self.wire_type_ids = list(cols)
            self._struct = T.StructType(
                [
                    T.StructField(
                        name, _SPARK_TYPE.get(tid, T.StringType()), True
                    )
                    for name, tid in cols
                ]
            )
        return self._struct

    def get_next_row_set(
        self,
        orientation: FetchOrientation = FetchOrientation.FETCH_NEXT,
        size: int = 100,
    ) -> list:
        rows = self.session.client.fetch(
            self.guid, size, orientation=_ORIENT_ORDINAL[orientation]
        )
        if self._arrow and rows:
            # arrow result mode crosses the hop as one IPC-stream payload
            # per batch in the arrowBatch binary column; decode back to
            # RecordBatches so a forwarded session serves the same
            # get_next_row_set contract as a local one (and the outer
            # thrift frontend re-ships them arrow-form to the client)
            import io

            import pyarrow as pa

            batches = []
            for (payload,) in rows:
                with pa.ipc.open_stream(io.BytesIO(payload)) as rd:
                    batches.extend(rd)
            rows = batches
        if rows:
            self.rows_fetched += len(rows)
            engine = getattr(self.session, "engine", None)
            if engine is not None and hasattr(engine, "metrics"):
                from kyuubi_spark.gateway import metrics as M

                engine.metrics.inc(M.BS_FETCH_RESULT_ROWS, len(rows))
            self._store_summary()
        return rows

    def get_operation_log(self) -> list[str]:
        try:
            return self.session.client.fetch_log(self.guid)
        except Exception:
            return []

    def fetch_log(self, max_rows: int = 100) -> list[str]:
        return self.get_operation_log()[:max_rows]

    def get_status(self, with_progress: bool = False) -> dict:
        return {
            "operation_id": self.handle.id,
            "state": self.state.value,
            "error": str(self.exception) if self.exception else None,
        }

    def cancel(self) -> None:
        try:
            self.session.client.cancel_operation(self.guid)
        except Exception:
            pass

    def close(self) -> None:
        pass  # remote op closed with the remote session


class RemoteEngineSession:
    """Gateway session forwarding to a remote engine over thrift
    (KyuubiSessionImpl + KyuubiSyncThriftClient shape)."""

    def __init__(self, engine, user: str, conf: dict | None = None):
        from kyuubi_spark.gateway.thrift import ThriftClient

        self.engine = engine
        self.user = user
        self.conf = C.GatewayConf(conf)
        raw = dict(conf or {})
        host, port = self._resolve(engine, raw)
        # engine-side SASL/PLAIN credentials, in precedence order:
        # 1. explicit kyuubi.engine.thrift.user/.password conf (manual
        #    per-deployment credential)
        # 2. engine-secure internal auth (kyuubi.engine.security.enabled):
        #    mint a token from the cluster-shared secret and present it as
        #    the SASL password under the internal principal — no static
        #    credential anywhere (EngineSecureAuthenticationProviderImpl
        #    + InternalSecurityAccessor.issueToken)
        # 3. NOSASL (the target frontend runs without authentication)
        # TLS: kyuubi.engine.thrift.ssl.enabled wraps the hop (cafile =
        # the engine's PEM cert for self-signed deployments) — SASL or
        # the internal token then rides inside the channel
        kwargs = {}
        if str(raw.get("kyuubi.engine.thrift.ssl.enabled", "false")).lower() in (
            "true", "1", "yes",
        ):
            from kyuubi_spark.gateway.tls import client_ssl_context

            kwargs["ssl_context"] = client_ssl_context(
                cafile=raw.get("kyuubi.engine.thrift.ssl.cafile")
            )
        eng_user = raw.get("kyuubi.engine.thrift.user")
        accessor = getattr(engine, "internal_accessor", None)
        if eng_user:
            self.client = ThriftClient(
                host, port, user=eng_user,
                password=raw.get("kyuubi.engine.thrift.password", "anonymous"),
                **kwargs,
            )
        elif accessor is not None:
            from kyuubi_spark.gateway.internal_auth import INTERNAL_USER

            self.client = ThriftClient(
                host, port, user=INTERNAL_USER,
                password=accessor.issue_token(), **kwargs,
            )
        else:
            self.client = ThriftClient(host, port, **kwargs)
        try:
            # forward the session conf to the remote open, minus the keys
            # the GATEWAY consumes for routing/transport — the reference's
            # KyuubiSessionImpl.openEngineSession sends normalizedConf so
            # e.g. kyuubi.operation.incremental.collect governs the ENGINE
            # side of a forwarded session (KyuubiSessionImpl.scala)
            self.client.open_session(
                user=user, conf=_forwardable_session_conf(raw) or None
            )
        except BaseException:
            self.client.close()  # don't leak the socket on a failed open
            raise
        self.handle = SessionHandle()
        self.last_access = time.time()
        self.operations: dict[str, RemoteOperation] = {}

    @staticmethod
    def _resolve(engine, raw: dict) -> tuple[str, int]:
        host = raw.get(ENGINE_HOST_KEY)
        port = raw.get(ENGINE_PORT_KEY)
        if host and port:
            return host, int(port)
        ns = raw.get(ENGINE_NAMESPACE_KEY)
        disco = getattr(engine, "discovery", None)
        if ns and disco is not None:
            resolved = disco.get_server_host(ns)
            if resolved is not None:
                return resolved
            # create-on-miss under the discovery lock (EngineRef
            # .getOrCreate: concurrent sessions for the same namespace
            # serialize on tryWithLock; the winner launches + registers,
            # the rest re-resolve inside the lock and reuse it —
            # ZookeeperDiscoveryClient.scala:136-150)
            launcher = getattr(engine, "engine_launcher", None)
            if launcher is not None:
                with disco.try_with_lock(f"{ns}.launch-lock", timeout_ms=60_000):
                    resolved = disco.get_server_host(ns)  # double-check
                    if resolved is None:
                        instance = launcher(ns)  # "host:port" of the new engine
                        disco.create_and_get_service_node(ns, instance)
                        from kyuubi_spark.gateway.discovery import (
                            parse_instance_host_port,
                        )

                        resolved = parse_instance_host_port(instance)
                return resolved
            raise LookupError(f"no engine registered under {ns}")
        raise ValueError(
            "remote engine needs kyuubi.engine.thrift.host/port or "
            "kyuubi.engine.namespace + a discovery client on the engine"
        )

    def execute_statement(
        self,
        statement: str,
        conf_overlay: dict | None = None,
        run_async: bool = False,
    ) -> RemoteOperation:
        self.last_access = time.time()
        try:
            # per-statement conf crosses the wire in TExecuteStatementReq's
            # confOverlay field — a forwarded session keeps the full
            # statement surface (incremental collect, plan-only, ...);
            # run_async rides field 4 so a forwarded cancel can land
            # mid-query on the engine side
            guid = self.client.execute(
                statement, conf_overlay=conf_overlay, run_async=run_async
            )
            fmt = (conf_overlay or {}).get(
                "kyuubi.operation.result.format",
                self.conf.get_raw("kyuubi.operation.result.format", ""),
            )
            op = RemoteOperation(
                self, guid, statement=statement,
                arrow=str(fmt).lower() == "arrow",
            )
        except RuntimeError as e:
            op = RemoteOperation(self, b"", failed=e, statement=statement)
        self.operations[op.handle.id] = op
        return op

    # -- metadata pass-through (KyuubiSyncThriftClient forwards the JDBC
    #    metadata calls verbatim; the remote engine answers) --------------

    def _meta(self, method: str, extra: list | None = None) -> RemoteOperation:
        self.last_access = time.time()
        guid = self.client.metadata_op(method, extra)
        op = RemoteOperation(self, guid)
        self.operations[op.handle.id] = op
        return op

    def get_catalogs(self) -> RemoteOperation:
        return self._meta("GetCatalogs")

    def get_schemas(self, catalog=None, schema_pattern=None) -> RemoteOperation:
        from kyuubi_spark.gateway.thrift import TType

        extra = []
        if catalog:
            extra.append((2, TType.STRING, catalog))
        if schema_pattern:
            extra.append((3, TType.STRING, schema_pattern))
        return self._meta("GetSchemas", extra)

    def get_tables(
        self, catalog=None, schema_pattern=None, table_pattern=None, table_types=None
    ) -> RemoteOperation:
        from kyuubi_spark.gateway.thrift import TType

        extra = []
        if catalog:
            extra.append((2, TType.STRING, catalog))
        if schema_pattern:
            extra.append((3, TType.STRING, schema_pattern))
        if table_pattern:
            extra.append((4, TType.STRING, table_pattern))
        return self._meta("GetTables", extra)

    def get_columns(
        self, catalog=None, schema_pattern=None, table_pattern=None, column_pattern=None
    ) -> RemoteOperation:
        from kyuubi_spark.gateway.thrift import TType

        extra = []
        if catalog:
            extra.append((2, TType.STRING, catalog))
        if schema_pattern:
            extra.append((3, TType.STRING, schema_pattern))
        if table_pattern:
            extra.append((4, TType.STRING, table_pattern))
        if column_pattern:
            extra.append((5, TType.STRING, column_pattern))
        return self._meta("GetColumns", extra)

    def get_table_types(self) -> RemoteOperation:
        return self._meta("GetTableTypes")

    def get_type_info(self) -> RemoteOperation:
        return self._meta("GetTypeInfo")

    def get_functions(self, function_pattern=None) -> RemoteOperation:
        from kyuubi_spark.gateway.thrift import TType

        extra = []
        if function_pattern:
            extra.append((4, TType.STRING, function_pattern))
        return self._meta("GetFunctions", extra)

    def get_primary_keys(self) -> RemoteOperation:
        return self._meta("GetPrimaryKeys")

    def close_operation(self, handle) -> None:
        hid = getattr(handle, "id", handle)
        op = self.operations.pop(hid, None)
        if op is not None:
            try:
                self.client.close_operation(op.guid)
            except Exception:
                pass

    def close(self) -> None:
        try:
            self.client.close_session()
        finally:
            self.client.close()
