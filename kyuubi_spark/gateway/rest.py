"""REST v1 frontend over the gateway (stdlib http.server — no web framework
in the container).

Endpoint shape mirrors the reference's REST API (kyuubi-server/.../server/
api/v1/{SessionsResource,OperationsResource,BatchesResource}.scala):

  POST   /api/v1/sessions                      {user, conf}      → session handle
  GET    /api/v1/sessions                                        → list
  DELETE /api/v1/sessions/{sid}
  POST   /api/v1/sessions/{sid}/operations     {statement, conf, async}
  GET    /api/v1/operations/{oid}                                → status
  GET    /api/v1/operations/{oid}/rowset?maxrows=&orientation=   → rows page
  GET    /api/v1/operations/{oid}/log
  POST   /api/v1/operations/{oid}/cancel
  DELETE /api/v1/operations/{oid}
  POST   /api/v1/batches                       {script, args}    → batch job
  GET    /api/v1/batches/{bid}                                   → state
  GET    /api/v1/batches/{bid}/localLog
  DELETE /api/v1/batches/{bid}

Batches are subprocess-managed scripts (BatchJobSubmission.scala:236-333
runs spark-submit and monitors the app; our engine's `spark-submit` is a
Python interpreter with its own SparkSession).
"""

from __future__ import annotations

import datetime
import decimal
import json
import subprocess
import sys
import tempfile
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from kyuubi_spark.gateway.engine import Engine
from kyuubi_spark.gateway.state import FetchOrientation


def _parse_multipart(h, ctype: str) -> dict[str, bytes]:
    """Parse a multipart/form-data request body into {field name: bytes}
    (stdlib email parser; enough for the batch resource-upload form)."""
    import email.parser

    n = int(h.headers.get("Content-Length") or 0)
    raw = b"Content-Type: " + ctype.encode("latin-1") + b"\r\n\r\n"
    raw += h.rfile.read(n)
    msg = email.parser.BytesParser().parsebytes(raw)
    fields: dict[str, bytes] = {}
    for part in msg.get_payload():
        name = part.get_param("name", header="content-disposition")
        if name:
            fields[str(name)] = part.get_payload(decode=True) or b""
    return fields


def _principal(h) -> str | None:
    """Authenticated principal for precedence over request-claimed users;
    engine-secure internal principals proved cluster-token possession and
    defer to the claimed identity (the thrift OpenSession carve-out)."""
    user = getattr(h, "auth_user", None)
    if user is not None:
        from kyuubi_spark.gateway.internal_auth import INTERNAL_USER

        if user == INTERNAL_USER:
            return None
    return user


def _json_cell(v):
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return [_json_cell(x) for x in v]
    return v


class BatchJob:
    """One subprocess batch (the spark-submit analogue).

    When a metadata ``store`` is given, lifecycle transitions are persisted
    (BatchJobSubmission.scala:236-333 records batch state through the
    metadata manager so a restarted gateway can list/recover batches).
    """

    def __init__(
        self,
        script: str,
        args: list[str] | None = None,
        store=None,
        user: str = "anonymous",
        batch_type: str = "PYSPARK",
        name: str | None = None,
        submit_conf: dict | None = None,
        gateway_conf=None,
    ):
        self.id = str(uuid.uuid4())
        self.state = "PENDING"
        self.user = user
        self.batch_type = batch_type.upper()
        self.name = name
        self._store = store
        if store is not None:
            store.insert(
                self.id, "BATCH", user, state="PENDING",
                request_name=name or "rest-batch",
                request_args=list(args or []),
            )
        self._log_file = tempfile.NamedTemporaryFile(
            mode="w+", prefix="kyuubi_spark_batch_", suffix=".log", delete=False
        )
        self._script_file = tempfile.NamedTemporaryFile(
            mode="w", prefix="kyuubi_spark_batch_", suffix=".py", delete=False
        )
        self._script_file.write(script)
        self._script_file.close()
        env = None
        if self.batch_type == "SPARK":
            # the reference batch IS a spark-submit
            # (BatchJobSubmission.scala:293-333): assemble the real
            # invocation — the batch id becomes the application tag
            # (spark.yarn.tags KYUUBI,<id> / K8s label) so the app can be
            # found and killed by id, KyuubiApplicationManager-style
            from kyuubi_spark.gateway.engine_process import (
                EngineProcessBuilder,
            )
            from kyuubi_spark.gateway.spark_submit import (
                build_spark_submit_command,
            )

            def _gconf(key, default=None):
                try:
                    return gateway_conf.get_raw(key, default)
                except AttributeError:
                    return (gateway_conf or {}).get(key, default)

            conf = dict(submit_conf or {})
            conf.setdefault(
                "spark.master",
                _gconf("kyuubi.engine.spark.master", "local[2]"),
            )
            conf.setdefault("spark.ui.enabled", "false")
            if name:
                conf.setdefault("spark.app.name", name)
            submit_bin = conf.pop(
                "kyuubi.engine.spark.submit.path", None
            ) or _gconf("kyuubi.engine.spark.submit.path", "spark-submit")
            cmd = build_spark_submit_command(
                conf,
                self.id,
                spark_submit=submit_bin,
                main_resource=self._script_file.name,
                app_args=list(args or []),
            )
            env = EngineProcessBuilder().env()  # PYSPARK_PYTHON/PYTHONPATH
        else:
            cmd = [sys.executable, self._script_file.name, *(args or [])]
        self.command = cmd
        self.proc = subprocess.Popen(
            cmd,
            stdout=self._log_file,
            stderr=subprocess.STDOUT,
            env=env,
        )
        self.state = "RUNNING"
        self._record()
        threading.Thread(target=self._watch, daemon=True).start()

    def _record(self, ended: bool = False) -> None:
        if self._store is not None:
            self._store.update_state(
                self.id, self.state, engine_state=self.state, ended=ended
            )

    def _watch(self) -> None:
        rc = self.proc.wait()
        if self.state != "CANCELED":
            self.state = "FINISHED" if rc == 0 else "ERROR"
        self._record(ended=True)

    def log(self) -> str:
        with open(self._log_file.name) as f:
            return f.read()

    def cancel(self) -> None:
        if self.proc.poll() is None:
            self.state = "CANCELED"
            self.proc.terminate()
            self._record(ended=True)

    def info(self) -> dict:
        out = {
            "id": self.id,
            "state": self.state,
            "pid": self.proc.pid,
            "batchType": self.batch_type,
            "name": self.name,
            # the reference's application tag: how KyuubiApplicationManager
            # finds/kills the submitted app (KYUUBI,<id> in spark.yarn.tags)
            "appTag": self.id if self.batch_type == "SPARK" else None,
        }
        if self.batch_type == "SPARK":
            from kyuubi_spark.gateway.applications import (
                LocalApplicationOperation,
            )

            out["application"] = (
                LocalApplicationOperation()
                .get_application_info_by_tag(self.id)
                .to_dict()
            )
        return out


class RestGateway:
    """HTTP frontend bound to an Engine; start()/shutdown() lifecycle."""

    def __init__(
        self,
        engine: Engine,
        host: str = "127.0.0.1",
        port: int = 0,
        auth=None,
        ssl_context=None,
    ):
        self.engine = engine
        self.operations: dict[str, tuple] = {}  # oid → (session, operation)
        self.batches: dict[str, BatchJob] = {}
        # optional PasswdAuthenticationProvider — when set every request
        # must carry Basic credentials (the reference applies one
        # AuthenticationFilter across its HTTP frontends) and the
        # authenticated principal overrides any user in the request body
        self.auth = auth
        gateway = self

        class Handler(BaseHTTPRequestHandler):
            auth_user: str | None = None

            def log_message(self, *a):  # quiet test output
                pass

            def _reply(self, code: int, payload) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n) or b"{}")

            def _authenticate(self) -> bool:
                if gateway.auth is None:
                    return True
                from kyuubi_spark.gateway.auth import (
                    AuthenticationError,
                    check_basic,
                )

                try:
                    self.auth_user = check_basic(
                        self.headers.get("Authorization"), gateway.auth
                    )
                    return True
                except AuthenticationError:
                    self.send_response(401)
                    self.send_header(
                        "WWW-Authenticate", 'Basic realm="kyuubi"'
                    )
                    self.end_headers()
                    return False

            def do_POST(self):  # noqa: N802
                if not self._authenticate():
                    return
                try:
                    gateway._route(self, "POST")
                except Exception as e:  # noqa: BLE001
                    self._reply(500, {"error": str(e)})

            def do_GET(self):  # noqa: N802
                if not self._authenticate():
                    return
                try:
                    gateway._route(self, "GET")
                except Exception as e:  # noqa: BLE001
                    self._reply(500, {"error": str(e)})

            def do_DELETE(self):  # noqa: N802
                if not self._authenticate():
                    return
                try:
                    gateway._route(self, "DELETE")
                except Exception as e:  # noqa: BLE001
                    self._reply(500, {"error": str(e)})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        if ssl_context is not None:
            # HTTPS termination (the reference's AuthenticationFilter +
            # jetty SSL connector layering) — gateway/tls.py
            from kyuubi_spark.gateway.tls import wrap_http_server

            wrap_http_server(self.httpd, ssl_context)
        self._thread: threading.Thread | None = None

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> "RestGateway":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def shutdown(self) -> None:
        self.httpd.shutdown()
        for b in self.batches.values():
            b.cancel()

    # -- routing -----------------------------------------------------------
    def _route(self, h, method: str) -> None:
        url = urlparse(h.path)
        parts = [p for p in url.path.split("/") if p]
        q = parse_qs(url.query)
        if parts[:1] == ["ui"] and method == "GET":
            self._serve_ui(h)
            return
        if parts == ["metrics"] and method == "GET":
            # top-level /metrics = Prometheus text format (the reference's
            # PrometheusReporter path, kyuubi.metrics.prometheus.path);
            # the JSON snapshot stays at /api/v1/metrics
            body = self.engine.metrics.prometheus().encode()
            h.send_response(200)
            h.send_header("Content-Type", "text/plain; version=0.0.4")
            h.send_header("Content-Length", str(len(body)))
            h.end_headers()
            h.wfile.write(body)
            return
        if parts[:2] != ["api", "v1"]:
            h._reply(404, {"error": "unknown path"})
            return
        parts = parts[2:]

        if parts[:1] == ["admin"]:
            self._route_admin(h, method, parts[1:], q)
        elif parts == ["metrics"] and method == "GET":
            h._reply(200, self.engine.metrics.snapshot())
        elif parts == ["events"] and method == "GET":
            n = int(q.get("n", ["100"])[0])
            etype = q.get("type", [None])[0]
            h._reply(200, self.engine.events.recent(n, etype))
        elif parts == ["sessions"] and method == "POST":
            body = h._body()
            s = self.engine.open_session(
                user=_principal(h) or body.get("user", "anonymous"),
                conf=body.get("conf"),
            )
            h._reply(200, {"identifier": s.handle.id, "user": s.user})
        elif parts == ["sessions"] and method == "GET":
            h._reply(
                200,
                [
                    {"identifier": s.handle.id, "user": s.user}
                    for s in self.engine.sessions._sessions.values()
                ],
            )
        elif len(parts) == 2 and parts[0] == "sessions" and method == "DELETE":
            self.engine.close_session(parts[1])
            h._reply(200, {"closed": parts[1]})
        elif (
            len(parts) == 3
            and parts[0] == "sessions"
            and parts[2] == "operations"
            and method == "POST"
        ):
            body = h._body()
            s = self.engine.sessions.get_session(parts[1])
            op = s.execute_statement(
                body["statement"],
                conf_overlay=body.get("conf"),
                run_async=bool(body.get("async", False)),
            )
            self.operations[op.handle.id] = (s, op)
            h._reply(200, {"identifier": op.handle.id, "state": op.state.value})
        elif parts == ["operations"] and method == "GET":
            # per-operation accounting records (EngineEventsStore
            # getStatementList shape): state transitions, wall time, rows
            # fetched, collect mode — survive operation close
            h._reply(200, self.engine.op_store.list())
        elif len(parts) >= 2 and parts[0] == "operations":
            self._route_operation(h, method, parts, q)
        elif parts == ["batches"] and method == "GET":
            # CLUSTER-WIDE batch listing from the shared metadata store
            # (BatchesResource.getBatchInfoList reads the metadata
            # manager, so batches submitted on ANY server in the fleet
            # are visible here); ?user= / ?state= filters as the
            # reference's query params. Local in-memory jobs overlay the
            # stored record (fresher state between persists).
            store = self.engine.metadata_store
            user_f = q.get("user", [None])[0]
            state_f = q.get("state", [None])[0]
            out = []
            seen = set()
            if store is not None:
                for rec in store.list(session_type="BATCH", state=state_f):
                    if user_f and rec.get("real_user") != user_f:
                        continue
                    local = self.batches.get(rec["identifier"])
                    out.append({
                        "id": rec["identifier"],
                        "user": rec.get("real_user"),
                        "state": local.state if local else rec.get("state"),
                        "local": local is not None,
                        "createTime": rec.get("create_time"),
                        "endTime": rec.get("end_time"),
                    })
                    seen.add(rec["identifier"])
            for bid, job in self.batches.items():  # storeless gateways
                if bid in seen:
                    continue
                if user_f and job.user != user_f:
                    continue
                if state_f and job.state != state_f:
                    continue
                out.append({"id": bid, "user": job.user,
                            "state": job.state, "local": True,
                            "createTime": None, "endTime": None})
            h._reply(200, out)
        elif parts == ["batches"] and method == "POST":
            ctype = h.headers.get("Content-Type", "")
            if ctype.startswith("multipart/form-data"):
                # resource-upload form (BatchesResource.scala:196-218):
                # field 'batchRequest' = JSON, 'resourceFile' = the script
                fields = _parse_multipart(h, ctype)
                if "batchRequest" not in fields or "resourceFile" not in fields:
                    h._reply(400, {
                        "error": "batchRequest and resourceFile are not "
                        "uploaded in the multipart form data"
                    })
                    return
                body = json.loads(fields["batchRequest"])
                script = fields["resourceFile"].decode("utf-8")
            else:
                body = h._body()
                script = body["script"]
            # same precedence as sessions: the authenticated principal
            # outranks anything the request claims
            job = BatchJob(
                script, body.get("args"),
                store=self.engine.metadata_store,
                user=_principal(h) or body.get("user", "anonymous"),
                batch_type=str(body.get("batchType", "PYSPARK")),
                name=body.get("name"),
                submit_conf=body.get("conf"),
                gateway_conf=getattr(self.engine, "conf", None),
            )
            self.batches[job.id] = job
            h._reply(200, job.info())
        elif len(parts) >= 2 and parts[0] == "batches":
            job = self.batches.get(parts[1])
            if job is None:
                # not OURS: answer from the shared metadata store so a
                # fleet peer (or a restarted gateway) still reports the
                # batch's persisted state; the OWNING server keeps the
                # process handle, so log/cancel stay there (the
                # reference redirects those via its internal client)
                store = self.engine.metadata_store
                rec = store.get(parts[1]) if store is not None else None
                if rec is not None and rec.get("session_type") == "BATCH":
                    if method == "DELETE":
                        # not our subprocess — kill by APPLICATION TAG,
                        # the reference's closeBatchSession →
                        # killApplicationByTag path (works after a
                        # gateway restart loses its process handles;
                        # spark-submit batches carry KYUUBI,<id> in
                        # their cmdline via spark.yarn.tags)
                        from kyuubi_spark.gateway.applications import (
                            LocalApplicationOperation,
                        )

                        killed, msg = (
                            LocalApplicationOperation()
                            .kill_application_by_tag(rec["identifier"])
                        )
                        if killed:
                            store.update_state(
                                rec["identifier"], "CANCELED", ended=True
                            )
                        h._reply(200, {
                            "id": rec["identifier"],
                            "killed": killed,
                            "message": msg,
                            "state": "CANCELED" if killed
                            else rec.get("state"),
                        })
                    elif len(parts) == 3:
                        h._reply(409, {
                            "error": "batch is owned by another server; "
                            "logs must go to the submitting gateway",
                            "id": rec["identifier"],
                            "state": rec.get("state"),
                        })
                    else:
                        h._reply(200, {
                            "id": rec["identifier"],
                            "state": rec.get("state"),
                            "user": rec.get("real_user"),
                            "local": False,
                        })
                    return
                h._reply(404, {"error": "no such batch"})
            elif len(parts) == 3 and parts[2] == "localLog":
                h._reply(200, {"log": job.log()})
            elif method == "DELETE":
                job.cancel()
                h._reply(200, job.info())
            else:
                h._reply(200, job.info())
        else:
            h._reply(404, {"error": f"unknown route {method} {h.path}"})

    def _admin_gate(self, h, action: str) -> bool:
        """Administrator check shared by every mutating admin route
        (reference AdminResource requires isAdministrator for engine
        delete and the refresh endpoints alike). Returns False after
        replying 403."""
        user = getattr(h, "auth_user", None)
        admins = {
            a.strip()
            for a in str(
                self.engine.conf.get_raw("kyuubi.server.administrators", "")
                or ""
            ).split(",")
            if a.strip()
        }
        if self.auth is not None and user not in admins:
            h._reply(403, {"error": f"{user} is not allowed to {action}"})
            return False
        return True

    def _route_admin(self, h, method: str, parts: list[str], q) -> None:
        """Admin resource (reference AdminResource.scala:282-408):
        list/delete engine nodes and list server nodes straight from the
        discovery registry — what `kyuubi-ctl list engine` / `delete
        engine` speak to."""
        if parts[:1] == ["refresh"] and method == "POST":
            self._route_refresh(h, parts)
            return
        disco = getattr(self.engine, "discovery", None)
        if disco is None:
            h._reply(503, {"error": "no discovery client configured"})
            return

        def node_dict(n):
            return {
                "namespace": n.namespace,
                "nodeName": n.node_name,
                "instance": f"{n.host}:{n.port}",
                "version": n.version,
                "engineRefId": n.engine_ref_id,
                "attributes": n.attributes,
            }

        if parts == ["engine"] and method == "GET":
            # every engine space under /kyuubi at ANY depth (share-level
            # spaces are two levels: /kyuubi/user/alice — EngineRef
            # .engineSpace) except server/infra nodes
            from kyuubi_spark.gateway.server_main import SERVER_NAMESPACE

            # gateway-LAUNCHED engines carry live process fields (PID,
            # uptime, aliveness, log path) alongside their discovery
            # node — the reference's admin engine listing shape plus the
            # ProcBuilder process context a multi-tenant operator needs
            manager = getattr(self.engine, "process_manager", None)
            by_ns: dict[str, dict] = {}
            if manager is not None:
                by_ns = {
                    d["namespace"]: d for d in manager.describe_engines()
                }
            out = []
            for space in disco.engine_spaces("/kyuubi"):
                if space == SERVER_NAMESPACE:
                    continue
                try:
                    for n in disco.get_service_nodes_info(space):
                        d = node_dict(n)
                        proc = by_ns.get(n.namespace)
                        if proc is not None and proc.get(
                            "engineRefId"
                        ) == n.engine_ref_id:
                            d["process"] = {
                                k: proc[k]
                                for k in (
                                    "pid", "alive", "uptimeSec",
                                    "exitCode", "logPath",
                                    # app-level launch fields (reference
                                    # AdminResource engine listing):
                                    # submission kind, master, deploy mode
                                    "launchKind", "master", "deployMode",
                                )
                            }
                        out.append(d)
                except Exception:
                    continue
            h._reply(200, out)
        elif parts == ["engine"] and method == "DELETE":
            node = q.get("node", [None])[0]
            if not node:
                h._reply(400, {"error": "node query parameter required"})
                return
            # destructive: deregisters a live engine (or, pointed at an
            # infra node, the cluster secret) — administrators only, like
            # the reference's AdminResource delete-engine
            if not self._admin_gate(h, f"delete engine node {node}"):
                return
            disco.delete("/" + node.lstrip("/"))
            h._reply(200, {"deleted": node})
        elif parts == ["server"] and method == "GET":
            from kyuubi_spark.gateway.server_main import SERVER_NAMESPACE

            h._reply(
                200,
                [
                    node_dict(n)
                    for n in disco.get_service_nodes_info(SERVER_NAMESPACE)
                ],
            )
        else:
            h._reply(404, {"error": f"unknown admin route {method} {parts}"})


    def _route_refresh(self, h, parts: list[str]) -> None:
        """refreshDenyUser/refreshUnlimitedUser/refreshDenyIp
        (AdminResource.scala:113-168): administrators swap the limiter
        lists at runtime; body {"values": [...]} pushes the new list,
        empty body re-reads the server conf."""
        from kyuubi_spark.gateway import conf as C
        from kyuubi_spark.gateway.engine import _csv_set

        if not self._admin_gate(
            h, f"refresh {parts[1] if len(parts) > 1 else ''}"
        ):
            return
        what = parts[1] if len(parts) > 1 else ""
        body = h._body()
        # an explicit empty list CLEARS the limiter list; only a missing
        # key falls back to re-reading server conf
        raw_values = body.get("values")
        values = set(raw_values) if raw_values is not None else None
        lim = self.engine.limiter
        attr = {"denyUsers": "deny_users",
                "unlimitedUsers": "unlimited_users",
                "denyIps": "deny_ips"}.get(what)
        if attr is None:
            h._reply(404, {"error": f"unknown refresh target {what!r}"})
            return
        if values is None:
            entry = {"denyUsers": C.LIMIT_CONNECTIONS_DENY_USERS,
                     "unlimitedUsers": C.LIMIT_CONNECTIONS_UNLIMITED_USERS,
                     "denyIps": None}[what]
            values = _csv_set(self.engine.conf.get(entry)) if entry else set()
        setattr(lim, attr, values)
        h._reply(200, {"refreshed": what, "size": len(values)})

    def _serve_ui(self, h) -> None:
        """Read-only status page (the reference ships a web UI at the
        server root, kyuubi-server/.../server/ui): sessions, operations,
        batches, and the metrics snapshot rendered as plain HTML tables —
        no assets, no javascript, served from the live engine state."""
        import html as _html

        def table(title: str, headers: list[str], rows: list[list]) -> str:
            head = "".join(f"<th>{_html.escape(str(c))}</th>" for c in headers)
            body = "".join(
                "<tr>" + "".join(
                    f"<td>{_html.escape(str(c))}</td>" for c in row
                ) + "</tr>"
                for row in rows
            )
            return (
                f"<h2>{_html.escape(title)}</h2>"
                f"<table border=1 cellpadding=4><tr>{head}</tr>{body}</table>"
            )

        sessions = [
            [s.handle.id[:8], s.user, type(s).__name__]
            for s in self.engine.sessions._sessions.values()
        ]
        ops = [
            [oid[:8], type(op).__name__, getattr(op, "state", "?")]
            for oid, (sess, op) in self.operations.items()
        ]
        batches = [
            [bid[:8], b.state] for bid, b in self.batches.items()
        ]
        metrics = sorted(self.engine.metrics.snapshot().items())
        page = (
            "<html><head><title>pyspark-sql-gateway</title></head><body>"
            "<h1>pyspark-sql-gateway</h1>"
            + table("Sessions", ["id", "user", "kind"], sessions)
            + table("Operations", ["id", "type", "state"], ops)
            + table("Batches", ["id", "state"], batches)
            + table("Metrics", ["metric", "value"], [[k, v] for k, v in metrics])
            + "</body></html>"
        ).encode()
        h.send_response(200)
        h.send_header("Content-Type", "text/html; charset=utf-8")
        h.send_header("Content-Length", str(len(page)))
        h.end_headers()
        h.wfile.write(page)

    def _route_operation(self, h, method: str, parts: list[str], q) -> None:
        ent = self.operations.get(parts[1])
        if ent is None:
            # not a REST-created live op: serve the accounting record (ops
            # from any frontend land in op_store and outlive close)
            record = self.engine.op_store.get(parts[1])
            if record is not None and len(parts) == 2 and method == "GET":
                h._reply(200, record)
                return
            h._reply(404, {"error": "no such operation"})
            return
        session, op = ent
        if len(parts) == 2 and method == "GET":
            # OperationsResource GET /operations/{id} shape + optional
            # ?progress=true task counters (SparkProgressMonitor rows)
            with_progress = q.get("progress", ["false"])[0].lower() == "true"
            status = op.get_status(with_progress=with_progress)
            status["identifier"] = status.pop("operation_id")
            h._reply(200, status)
        elif len(parts) == 2 and method == "DELETE":
            session.close_operation(op.handle)
            self.operations.pop(parts[1], None)
            h._reply(200, {"closed": parts[1]})
        elif parts[2:] == ["cancel"] and method == "POST":
            op.cancel()
            h._reply(200, {"state": op.state.value})
        elif parts[2:] == ["log"] and method == "GET":
            h._reply(200, {"log": op.fetch_log(int(q.get("maxrows", ["100"])[0]))})
        elif parts[2:] == ["rowset"] and method == "GET":
            orientation = FetchOrientation[
                q.get("orientation", ["FETCH_NEXT"])[0].upper()
            ]
            rows = op.get_next_row_set(orientation, int(q.get("maxrows", ["100"])[0]))
            schema = [f.name for f in op.get_result_set_schema().fields]
            h._reply(
                200,
                {
                    "columns": schema,
                    "rows": [[_json_cell(c) for c in row] for row in rows],
                },
            )
        else:
            h._reply(404, {"error": "unknown operation route"})
