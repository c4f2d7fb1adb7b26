"""kyuubi-ctl analog — admin CLI over the gateway REST API.

The reference ships kyuubi-ctl (kyuubi-ctl/src/main/scala/org/apache/
kyuubi/ctl/ — `kyuubi-ctl list session`, `get batch <id>`, `delete
session <id>`, log tailing) speaking to the server's REST v1.  Same verbs
here over this repo's REST frontend:

    python tools/ctl.py --url http://host:port list sessions
    python tools/ctl.py --url ... list batches
    python tools/ctl.py --url ... get batch <id>
    python tools/ctl.py --url ... delete session <id>
    python tools/ctl.py --url ... delete batch <id>
    python tools/ctl.py --url ... log batch <id>
    python tools/ctl.py --url ... submit batch <script.py> [args...]
    python tools/ctl.py --url ... sql "<statement>" [--user u]

Plain stdlib (argparse + urllib), JSON-lines output for scripting.
"""

from __future__ import annotations

import argparse
import json
import sys
import urllib.error
import urllib.request


_BASIC: str | None = None  # set from --user/--password in main()
_SSL_CTX = None  # set from --ssl-ca/--ssl-insecure in main()


def _call(url: str, method: str = "GET", body: dict | None = None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    if _BASIC:
        req.add_header("Authorization", _BASIC)
    try:
        with urllib.request.urlopen(req, context=_SSL_CTX) as resp:
            raw = resp.read()
            return json.loads(raw) if raw else {}
    except urllib.error.HTTPError as e:
        print(f"error {e.code}: {e.read().decode(errors='replace')}", file=sys.stderr)
        sys.exit(1)


def _emit(obj) -> None:
    if isinstance(obj, list):
        for item in obj:
            print(json.dumps(item, default=str))
    else:
        print(json.dumps(obj, default=str))


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="ctl", description=__doc__.splitlines()[0])
    p.add_argument("--url", required=True, help="gateway REST base, e.g. http://127.0.0.1:8080")
    p.add_argument("--user", default=None,
                   help="Basic-auth user (servers running kyuubi.authentication)")
    p.add_argument("--ssl-ca", metavar="PEM",
                   help="CA / server cert PEM for an https:// gateway")
    p.add_argument("--ssl-insecure", action="store_true",
                   help="https without certificate verification (dev only)")
    p.add_argument("--password", default="anonymous")
    sub = p.add_subparsers(dest="verb", required=True)

    lst = sub.add_parser("list")
    lst.add_argument("what", choices=["sessions", "batches", "engines",
                                      "servers"])

    get = sub.add_parser("get")
    get.add_argument("what", choices=["session", "batch", "operation"])
    get.add_argument("id")

    dele = sub.add_parser("delete")
    dele.add_argument("what", choices=["session", "batch", "operation",
                                       "engine"])
    dele.add_argument("id")

    log = sub.add_parser("log")
    log.add_argument("what", choices=["batch", "operation"])
    log.add_argument("id")
    log.add_argument("--maxrows", type=int, default=100)

    subm = sub.add_parser("submit")
    subm.add_argument("what", choices=["batch"])
    subm.add_argument("script")
    subm.add_argument("args", nargs="*")

    sql = sub.add_parser("sql")
    sql.add_argument("statement")
    sql.add_argument("--user", default="ctl")
    sql.add_argument("--maxrows", type=int, default=100)

    a = p.parse_args(argv)
    if a.ssl_ca or a.ssl_insecure:
        from kyuubi_spark.gateway.tls import client_ssl_context

        global _SSL_CTX
        _SSL_CTX = client_ssl_context(cafile=a.ssl_ca, insecure=a.ssl_insecure)
    if a.user is not None:
        import base64

        global _BASIC
        _BASIC = "Basic " + base64.b64encode(
            f"{a.user}:{a.password}".encode()
        ).decode()
    base = a.url.rstrip("/") + "/api/v1"

    if a.verb == "list":
        # engines/servers read the discovery registry via the admin
        # resource (reference kyuubi-ctl list engine / AdminListEngine)
        path = {"engines": "admin/engine", "servers": "admin/server"}.get(
            a.what, a.what)
        _emit(_call(f"{base}/{path}"))
    elif a.verb == "get":
        path = {"session": "sessions", "batch": "batches", "operation": "operations"}[a.what]
        _emit(_call(f"{base}/{path}/{a.id}"))
    elif a.verb == "delete":
        if a.what == "engine":
            import urllib.parse as _up

            _emit(_call(
                f"{base}/admin/engine?node={_up.quote(a.id)}",
                method="DELETE",
            ))
        else:
            path = {"session": "sessions", "batch": "batches", "operation": "operations"}[a.what]
            _emit(_call(f"{base}/{path}/{a.id}", method="DELETE"))
    elif a.verb == "log":
        if a.what == "batch":
            _emit(_call(f"{base}/batches/{a.id}/localLog"))
        else:
            _emit(_call(f"{base}/operations/{a.id}/log?maxrows={a.maxrows}"))
    elif a.verb == "submit":
        _emit(_call(f"{base}/batches", "POST", {"script": a.script, "args": a.args}))
    elif a.verb == "sql":
        s = _call(f"{base}/sessions", "POST", {"user": a.user})
        sid = s["identifier"]
        try:
            op = _call(
                f"{base}/sessions/{sid}/operations", "POST", {"statement": a.statement}
            )
            oid = op["identifier"]
            status = _call(f"{base}/operations/{oid}")
            if status.get("error"):
                print(f"error: {status['error']}", file=sys.stderr)
                sys.exit(1)
            _emit(_call(f"{base}/operations/{oid}/rowset?maxrows={a.maxrows}"))
        finally:
            _call(f"{base}/sessions/{sid}", method="DELETE")


if __name__ == "__main__":
    main()
