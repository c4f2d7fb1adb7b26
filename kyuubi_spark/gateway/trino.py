"""Trino wire-protocol frontend (the reference's second SQL-over-HTTP API).

Counterpart: kyuubi-server/.../server/KyuubiTrinoFrontendService.scala and
sql/plan/trino/TrinoFeOperations.scala:26-73. Implements the PUBLIC Trino
client REST protocol (docs.trino.io client-protocol) on the stdlib HTTP
stack — enough for any Trino client to run statements:

  POST   /v1/statement                      (SQL body, X-Trino-User header)
  GET    /v1/statement/{id}/{token}         (follow nextUri for more pages)
  DELETE /v1/statement/{id}/{token}         (cancel)

Responses are QueryResults JSON: {id, columns, data, nextUri?, stats,
error?}. Result pages are bounded (`page_size` rows per GET) so client and
server memory stay O(page), never O(result) — the same paging discipline as
thrift FetchResults. Statements execute on gateway sessions (one per
X-Trino-User, created lazily), so session conf, KDFs, and the operation
state machine are shared with the thrift/REST frontends.
"""

from __future__ import annotations

import datetime
import decimal
import json
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import types as T

from kyuubi_spark.gateway.engine import Engine
from kyuubi_spark.gateway.state import FetchOrientation, OperationState

_TRINO_TYPES = {
    "boolean": "boolean",
    "tinyint": "tinyint",
    "smallint": "smallint",
    "int": "integer",
    "bigint": "bigint",
    "float": "real",
    "double": "double",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "binary": "varbinary",
}


def _trino_type(dt: T.DataType) -> str:
    s = dt.simpleString()
    base = s.split("(")[0]
    if base == "decimal":
        return s  # decimal(p,s) spells identically
    return _TRINO_TYPES.get(base, "varchar")


def _cell(v, dt: T.DataType):
    from kyuubi_spark.gateway.wire import to_hive_string

    if v is None:
        return None
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return to_hive_string(v, dt)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return v


class _Query:
    def __init__(self, op, session):
        self.op = op
        self.session = session
        self.token = 0
        self.done = False
        # last served page, kept for idempotent nextUri retry: the Trino
        # client retries a GET whose response it lost (io.trino.client
        # retry-on-IOException), and the server must re-serve the SAME
        # page — one cached page per query, O(page) memory
        self.last_page: dict | None = None


def _split_params(raw: str) -> list[str]:
    """Split a USING parameter list on commas outside quoted literals."""
    out: list[str] = []
    cur: list[str] = []
    in_quote = False
    for ch in raw:
        if ch == "'":
            in_quote = not in_quote
            cur.append(ch)
        elif ch == "," and not in_quote:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _bind_placeholders(text: str, params: list[str]) -> str:
    """Substitute positional ?-placeholders in prepared SQL.

    Placeholders are located syntactically — '?' inside single-quoted
    string literals (with '' escapes) or double-quoted identifiers (with
    "" escapes) is literal text, not a parameter — and positions come
    from the ORIGINAL text, so a substituted value containing '?' is
    never re-scanned (Trino parses placeholders the same way; naive
    text.replace('?', p, 1) corrupts quote boundaries)."""
    out: list[str] = []
    it = iter(params)
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch in "'\"":
            # copy the quoted region verbatim, honoring doubled-quote
            # escapes ('' in literals, "" in identifiers)
            j = i + 1
            while j < n:
                if text[j] == ch:
                    if j + 1 < n and text[j + 1] == ch:
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            out.append(text[i:j])
            i = j
        elif ch == "?":
            out.append(next(it, "?"))
            i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


class TrinoGateway:
    """Minimal Trino-protocol server over a gateway Engine."""

    def __init__(self, engine: Engine, host: str = "127.0.0.1", port: int = 0,
                 page_size: int = 1000, auth=None, ssl_context=None):
        self.engine = engine
        self.page_size = page_size
        # optional PasswdAuthenticationProvider: Basic credentials on every
        # request; the authenticated principal outranks X-Trino-User (real
        # Trino behaves the same way — the header is only trusted when the
        # server runs without an authenticator)
        self.auth = auth
        self._queries: dict[str, _Query] = {}
        self._done_order: list[str] = []  # FIFO purge of finished queries
        self._sessions: dict[str, object] = {}
        # (user, statement_name) -> sql, for PREPARE/EXECUTE/DEALLOCATE
        self._prepared: dict[tuple[str, str], str] = {}
        self._lock = threading.Lock()
        service = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, payload: dict) -> None:
                raw = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(raw)))
                self.end_headers()
                self.wfile.write(raw)

            def _authenticate(self) -> tuple[bool, str | None]:
                if service.auth is None:
                    return True, None
                from kyuubi_spark.gateway.auth import (
                    AuthenticationError,
                    check_basic,
                )

                try:
                    return True, check_basic(
                        self.headers.get("Authorization"), service.auth
                    )
                except AuthenticationError:
                    self.send_response(401)
                    self.send_header(
                        "WWW-Authenticate", 'Basic realm="kyuubi"'
                    )
                    self.end_headers()
                    return False, None

            def do_POST(self):  # noqa: N802
                ok, auth_user = self._authenticate()
                if not ok:
                    return
                if self.path.rstrip("/") != "/v1/statement":
                    self._reply(404, {"error": "not found"})
                    return
                n = int(self.headers.get("Content-Length", 0))
                sql = self.rfile.read(n).decode("utf-8")
                # engine-secure internal principals proved cluster-token
                # possession and carry the REAL end user in the header
                # (same proxy carve-out as the thrift OpenSession path)
                from kyuubi_spark.gateway.internal_auth import INTERNAL_USER

                if auth_user == INTERNAL_USER:
                    auth_user = None
                user = auth_user or self.headers.get(
                    "X-Trino-User", "anonymous"
                )
                # Trino session properties header: comma-separated k=v —
                # lets a Trino client pick the backing engine
                # (kyuubi.engine.type=JDBC etc.); applied when this user's
                # gateway session is first created
                conf = None
                props = self.headers.get("X-Trino-Session")
                if props:
                    conf = dict(
                        kv.split("=", 1) for kv in props.split(",") if "=" in kv
                    )
                self._reply(
                    200, service.post_statement(sql, user, self._base(), conf)
                )

            def do_GET(self):  # noqa: N802
                if not self._authenticate()[0]:
                    return
                parts = self.path.strip("/").split("/")
                # /v1/statement/{id}/{slug}/{token}
                if len(parts) >= 4 and parts[:2] == ["v1", "statement"]:
                    try:
                        token = int(parts[4]) if len(parts) >= 5 else None
                    except ValueError:
                        token = None
                    self._reply(
                        200,
                        service.next_page(parts[2], self._base(), token),
                    )
                else:
                    self._reply(404, {"error": "not found"})

            def do_DELETE(self):  # noqa: N802
                if not self._authenticate()[0]:
                    return
                parts = self.path.strip("/").split("/")
                if len(parts) >= 4 and parts[:2] == ["v1", "statement"]:
                    self._reply(204, service.cancel(parts[2]))
                else:
                    self._reply(404, {"error": "not found"})

            def _base(self) -> str:
                return f"{service.scheme}://{service.host}:{service.port}"

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.scheme = "http"
        if ssl_context is not None:
            # nextUri pages must come back over the same TLS listener
            from kyuubi_spark.gateway.tls import wrap_http_server

            wrap_http_server(self.server, ssl_context)
            self.scheme = "https"
        self.host, self.port = self.server.server_address
        self._thread: threading.Thread | None = None

    # -- lifecycle --------------------------------------------------------
    def start(self) -> "TrinoGateway":
        self._thread = threading.Thread(
            target=self.server.serve_forever, name="trino-frontend", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()

    # -- protocol ---------------------------------------------------------
    def _session_for(self, user: str, conf: dict | None = None):
        with self._lock:
            s = self._sessions.get(user)
            if s is None:
                # The Trino wire protocol is strictly paged (bounded
                # response sizes, nextUri continuation) — so the backing
                # operation must not buffer O(result) rows in the gateway
                # either.  Default Trino sessions to incremental collect
                # (toLocalIterator: at most one partition resident), the
                # paging discipline the reference's Trino frontend gets
                # from Trino's own spooling; session properties can still
                # override per-user.
                base = {"kyuubi.operation.incremental.collect": "true"}
                base.update(conf or {})
                s = self.engine.open_session(user=user, conf=base)
                self._sessions[user] = s
            return s

    # -- trino-jdbc metadata/prepared-statement surface --------------------
    #
    # trino-jdbc's DatabaseMetaData issues fixed-shape SQL over the wire
    # (SELECT ... FROM system.jdbc.{schemas,catalogs,table_types,types,
    # tables,columns}, and a literal WHERE FALSE projection for primary
    # keys) plus PREPARE/EXECUTE/DEALLOCATE for parameterized statements.
    # The reference parses these with a dedicated ANTLR grammar into
    # GetSchemas/GetTables/... nodes and routes them to the backend's
    # metadata operations (KyuubiTrinoFeBaseParser.g4:26-62,
    # TrinoFeOperations.scala:26-73, KyuubiTrinoOperationTranslator.scala:
    # 39-60).  Same translation here, regex-matched (the client emits a
    # fixed shape, same contract the grammar encodes).

    @staticmethod
    def _like_operand(low: str, field: str) -> str | None:
        m = re.search(rf"{field}\s+like\s+'([^']*)'", low)
        return m.group(1) if m else None

    @staticmethod
    def _eq_operand(low: str, field: str) -> str | None:
        m = re.search(rf"{field}\s*=\s*'([^']*)'", low)
        return m.group(1) if m else None

    def _translate_jdbc_metadata(self, sql: str, session):
        """Returns a metadata Operation for a system.jdbc query, else
        None (fall through to ExecuteStatement)."""
        low = " ".join(sql.split()).strip().rstrip(";").lower()
        # dispatch on the FROM target with string literals STRIPPED — a
        # user query whose literal merely CONTAINS "from system.jdbc.x"
        # (SELECT 'from system.jdbc.catalogs') must not be hijacked into
        # a metadata listing; operand extraction still reads `low` (it
        # needs the literal values)
        no_lit = re.sub(r"'(?:[^']|'')*'", "''", low)
        m_tbl = re.search(r"\bfrom\s+system\.jdbc\.(\w+)", no_lit)
        if m_tbl is None:
            if "key_seq" in no_lit and "where false" in no_lit:
                return session.get_primary_keys()
            return None
        target = m_tbl.group(1)
        if target == "schemas":
            return session.get_schemas(
                self._eq_operand(low, "table_catalog"),
                self._like_operand(low, "table_schem") or "%",
            )
        if target == "catalogs":
            return session.get_catalogs()
        if target == "table_types":
            return session.get_table_types()
        if target == "types":
            return session.get_type_info()
        if target == "tables":
            types = None
            m = re.search(r"table_type\s+in\s*\(([^)]*)\)", low)
            if m:
                types = [t.strip().strip("'").upper() for t in m.group(1).split(",")]
            return session.get_tables(
                self._eq_operand(low, "table_cat"),
                self._like_operand(low, "table_schem") or "%",
                self._like_operand(low, "table_name") or "%",
                types,
            )
        if target == "columns":
            return session.get_columns(
                self._eq_operand(low, "table_cat"),
                self._like_operand(low, "table_schem") or "%",
                self._like_operand(low, "table_name") or "%",
                self._like_operand(low, "column_name") or "%",
            )
        if "key_seq" in no_lit and "where false" in no_lit:
            return session.get_primary_keys()
        return None

    def _handle_prepared(self, sql: str, user: str, base: str) -> dict | None:
        """PREPARE name FROM sql / EXECUTE name [USING p1, ...] /
        DEALLOCATE PREPARE name.  PREPARE/DEALLOCATE answer with a
        FINISHED updateType page (the Trino wire shape); EXECUTE
        substitutes positional ?-parameters and runs the stored text."""
        s = sql.strip().rstrip(";")
        m = re.match(r"(?is)^\s*prepare\s+(\w+)\s+from\s+(.+)$", s)
        if m:
            with self._lock:
                self._prepared[(user, m.group(1))] = m.group(2).strip()
            return {
                "id": uuid.uuid4().hex,
                "stats": {"state": "FINISHED"},
                "updateType": "PREPARE",
            }
        m = re.match(r"(?is)^\s*deallocate\s+prepare\s+(\w+)\s*$", s)
        if m:
            with self._lock:
                self._prepared.pop((user, m.group(1)), None)
            return {
                "id": uuid.uuid4().hex,
                "stats": {"state": "FINISHED"},
                "updateType": "DEALLOCATE",
            }
        m = re.match(r"(?is)^\s*execute\s+(\w+)(?:\s+using\s+(.+))?$", s)
        if m:
            with self._lock:
                text = self._prepared.get((user, m.group(1)))
            if text is None:
                return {
                    "id": uuid.uuid4().hex,
                    "stats": {"state": "FAILED"},
                    "error": {
                        "message": f"prepared statement not found: {m.group(1)}",
                        "errorCode": 1,
                        "errorName": "NOT_FOUND",
                    },
                }
            if m.group(2):
                # positional ?-substitution; parameters arrive as Trino
                # literals (already quoted/typed by the client)
                text = _bind_placeholders(text, _split_params(m.group(2)))
            return self.post_statement(text, user, base)
        return None

    def post_statement(
        self, sql: str, user: str, base: str, conf: dict | None = None
    ) -> dict:
        session = self._session_for(user, conf)
        prepared = self._handle_prepared(sql, user, base)
        if prepared is not None:
            return prepared
        op = self._translate_jdbc_metadata(sql, session)
        if op is None:
            op = session.execute_statement(sql)
        qid = uuid.uuid4().hex
        q = _Query(op, session)
        with self._lock:
            self._queries[qid] = q
        if op.exception is not None:
            q.done = True
            return self._error_results(qid, op)
        return self._page(qid, q, base)

    def next_page(self, qid: str, base: str, token: int | None = None) -> dict:
        with self._lock:
            q = self._queries.get(qid)
        if q is None:
            return {"id": qid, "stats": {"state": "FAILED"},
                    "error": {"message": "unknown query"}}
        if q.op.exception is not None:
            return self._error_results(qid, q.op)
        if token is not None:
            # Token discipline (the paged-cursor half of HS2's
            # FETCH_PRIOR, in the form the Trino protocol allows):
            # q.token is the only token a FORWARD fetch accepts; the
            # immediately preceding token is an idempotent RETRY and
            # re-serves the cached page verbatim; anything older is a
            # rewind the forward-only wire cannot honor.
            if token == q.token - 1 and q.last_page is not None:
                return q.last_page
            if token != q.token:
                return {
                    "id": qid,
                    "stats": {"state": "FAILED"},
                    "error": {
                        "message": f"invalid page token {token} "
                                   f"(expected {q.token})",
                        "errorCode": 1,
                        "errorName": "GENERIC_INTERNAL_ERROR",
                    },
                }
        return self._page(qid, q, base)

    def cancel(self, qid: str) -> dict:
        with self._lock:
            q = self._queries.pop(qid, None)
        if q is not None:
            q.op.cancel()
        return {}

    # -- page assembly ----------------------------------------------------
    def _error_results(self, qid: str, op) -> dict:
        return {
            "id": qid,
            "stats": {"state": "FAILED"},
            "error": {
                "message": str(op.exception),
                "errorCode": 1,
                "errorName": "GENERIC_INTERNAL_ERROR",
            },
        }

    def _page(self, qid: str, q: _Query, base: str) -> dict:
        schema = q.op.get_result_set_schema()
        columns = [
            {
                "name": f.name,
                "type": _trino_type(f.dataType),
                "typeSignature": {
                    "rawType": _trino_type(f.dataType).split("(")[0],
                    "arguments": [],
                },
            }
            for f in schema.fields
        ]
        rows = q.op.get_next_row_set(FetchOrientation.FETCH_NEXT, self.page_size)
        data = [
            [_cell(v, f.dataType) for v, f in zip(row, schema.fields)]
            for row in rows
        ]
        q.token += 1
        more = len(rows) == self.page_size
        out: dict = {
            "id": qid,
            "columns": columns,
            "data": data,
            "stats": {
                "state": "RUNNING" if more else "FINISHED",
                "queued": False,
                "scheduled": True,
            },
        }
        if more:
            out["nextUri"] = f"{base}/v1/statement/{qid}/x/{q.token}"
        else:
            q.done = True
            if q.op.state is OperationState.FINISHED:
                # keep the finished query (bounded FIFO) so a retry of
                # the FINAL page can still be served; purge the oldest
                # beyond the cap instead of dropping eagerly
                with self._lock:
                    self._done_order.append(qid)
                    while len(self._done_order) > 64:
                        old = self._done_order.pop(0)
                        self._queries.pop(old, None)
        q.last_page = out
        return out
