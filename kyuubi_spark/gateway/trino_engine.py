"""Trino engine sessions — statements executed on a Trino-protocol server.

Counterpart of the reference's kyuubi-trino-engine (externals/
kyuubi-trino-engine/src/main/scala/org/apache/kyuubi/engine/trino/...):
a session whose ``kyuubi.engine.type=TRINO`` executes each statement via
the Trino client protocol (POST /v1/statement, follow nextUri pages,
DELETE to cancel — TrinoStatement.scala drives io.trino.client
StatementClient the same way) and adapts results back to the gateway
Session/Operation surface, so the unchanged frontends can serve a
Trino-backed session.

Conf: ``kyuubi.engine.trino.connection.url=http://host:port`` (the
reference's ENGINE_TRINO_CONNECTION_URL).  Tests self-host against this
repo's OWN TrinoGateway — the same protocol a real Trino coordinator
speaks.
"""

from __future__ import annotations

import json
import time
import urllib.request

from pyspark.sql import types as T

from kyuubi_spark.gateway import conf as C
from kyuubi_spark.gateway.fetch import ArrayFetchIterator
from kyuubi_spark.gateway.state import (
    FetchOrientation,
    OperationHandle,
    OperationState,
    SessionHandle,
)

TRINO_URL_KEY = "kyuubi.engine.trino.connection.url"

_SPARK_TYPE = {
    "boolean": T.BooleanType(),
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "varchar": T.StringType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "varbinary": T.BinaryType(),
}


class TrinoBackedOperation:
    """Runs one statement through the Trino wire, draining every page
    (the reference's TrinoStatement collects through StatementClient the
    same way); rows land in a FetchIterator for gateway-style windows."""

    def __init__(self, session: "TrinoBackedSession", statement: str):
        self.session = session
        self.statement = statement
        self.handle = OperationHandle()
        self.exception: BaseException | None = None
        self.state = OperationState.RUNNING
        self._struct = T.StructType([])
        self._iter = ArrayFetchIterator([])
        self._run()

    def _run(self) -> None:
        try:
            page = self.session._post(self.statement)
            rows: list = []
            columns = None
            while True:
                if page.get("error"):
                    raise RuntimeError(page["error"].get("message", "trino error"))
                if columns is None and "columns" in page:
                    columns = page["columns"]
                rows.extend(page.get("data", []))
                nxt = page.get("nextUri")
                if not nxt:
                    break
                page = self.session._get(nxt)
            fields = []
            for col in columns or []:
                raw = col["type"].split("(")[0].lower()
                fields.append(
                    T.StructField(
                        col["name"], _SPARK_TYPE.get(raw, T.StringType()), True
                    )
                )
            self._struct = T.StructType(fields)
            self._iter = ArrayFetchIterator([tuple(r) for r in rows])
            self.state = OperationState.FINISHED
        except Exception as e:  # noqa: BLE001 - reported via status
            self.exception = e
            self.state = OperationState.ERROR

    def get_result_set_schema(self) -> T.StructType:
        return self._struct

    def get_next_row_set(
        self,
        orientation: FetchOrientation = FetchOrientation.FETCH_NEXT,
        size: int = 100,
    ) -> list:
        if orientation is FetchOrientation.FETCH_FIRST:
            self._iter.fetch_absolute(0)
        elif orientation is FetchOrientation.FETCH_PRIOR:
            self._iter.fetch_prior(size)
        else:
            self._iter.fetch_next()
        return self._iter.take(size)

    def get_status(self, with_progress: bool = False) -> dict:
        return {
            "operation_id": self.handle.id,
            "state": self.state.value,
            "error": str(self.exception) if self.exception else None,
        }

    def fetch_log(self, max_rows: int = 100) -> list[str]:
        return [str(self.exception)] if self.exception else []

    def cancel(self) -> None:
        pass  # pages are drained synchronously; nothing in flight

    def close(self) -> None:
        pass


class TrinoBackedSession:
    """Gateway session over the Trino client protocol."""

    def __init__(self, engine, user: str, conf: dict | None = None):
        self.engine = engine
        self.user = user
        self.conf = C.GatewayConf(conf)
        raw = dict(conf or {})
        self.base = raw.get(TRINO_URL_KEY, "").rstrip("/")
        if not self.base:
            raise ValueError(f"{TRINO_URL_KEY} is required for TRINO sessions")
        # optional Basic credentials for a Trino endpoint running
        # authentication (mirrors kyuubi.engine.thrift.user/.password on
        # THRIFT sessions; without these a secured endpoint 401s every
        # request).  The authenticated user outranks X-Trino-User there.
        self._basic: str | None = None
        cred_user = raw.get("kyuubi.engine.trino.connection.user")
        if cred_user:
            import base64

            cred = f"{cred_user}:" \
                f"{raw.get('kyuubi.engine.trino.connection.password', '')}"
            self._basic = "Basic " + base64.b64encode(
                cred.encode("utf-8")
            ).decode("ascii")
        # TLS for https:// endpoints: cafile = the server's PEM cert for
        # self-signed deployments (else the system trust store applies)
        self._ssl_ctx = None
        if self.base.startswith("https://"):
            from kyuubi_spark.gateway.tls import client_ssl_context

            self._ssl_ctx = client_ssl_context(
                cafile=raw.get("kyuubi.engine.trino.connection.ssl.cafile")
            )
        self.handle = SessionHandle()
        self.last_access = time.time()
        self.operations: dict[str, TrinoBackedOperation] = {}

    def _headers(self) -> dict:
        headers = {"X-Trino-User": self.user}
        if self._basic is not None:
            headers["Authorization"] = self._basic
        return headers

    def _post(self, sql: str) -> dict:
        req = urllib.request.Request(
            f"{self.base}/v1/statement",
            data=sql.encode("utf-8"),
            headers=self._headers(),
            method="POST",
        )
        with urllib.request.urlopen(req, context=self._ssl_ctx) as resp:
            return json.loads(resp.read())

    def _get(self, uri: str) -> dict:
        req = urllib.request.Request(uri, headers=self._headers())
        with urllib.request.urlopen(req, context=self._ssl_ctx) as resp:
            return json.loads(resp.read())

    def execute_statement(
        self,
        statement: str,
        conf_overlay: dict | None = None,
        run_async: bool = False,
    ) -> TrinoBackedOperation:
        self.last_access = time.time()
        op = TrinoBackedOperation(self, statement)
        self.operations[op.handle.id] = op
        return op

    def close_operation(self, handle) -> None:
        hid = getattr(handle, "id", handle)
        self.operations.pop(hid, None)

    def close(self) -> None:
        self.operations.clear()
