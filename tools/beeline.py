"""beeline analog — interactive/one-shot SQL shell over the thrift wire.

The reference ships kyuubi-hive-beeline (a Hive beeline fork) as the
interactive client for the thrift frontend.  Same usage shape here over
this repo's NOSASL thrift (or HTTP-transport) frontend:

    python tools/beeline.py -u host:port -e "SELECT 1"        # one-shot
    python tools/beeline.py -u host:port -f script.sql        # file mode
    python tools/beeline.py -u host:port                      # REPL
    python tools/beeline.py -u host:port --http -e "..."      # HTTP mode
    ... [--hiveconf k=v]... [-n user] [--maxrows N] [--outputformat csv]

Statements are split on ';'. Output formats: table (aligned ASCII, the
beeline default), csv, tsv.
"""

from __future__ import annotations

import argparse
import sys


def _render(schema: list[tuple[str, int]], rows: list[list], fmt: str) -> str:
    headers = [name for name, _ in schema]
    if fmt in ("csv", "tsv"):
        sep = "," if fmt == "csv" else "\t"
        out = [sep.join(headers)]
        for r in rows:
            out.append(sep.join("" if v is None else str(v) for v in r))
        return "\n".join(out)
    # aligned table (beeline style)
    cells = [[("NULL" if v is None else str(v)) for v in r] for r in rows]
    widths = [
        max(len(headers[i]), *(len(c[i]) for c in cells)) if cells else len(headers[i])
        for i in range(len(headers))
    ]
    bar = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    def fmt_row(vals):
        return "| " + " | ".join(v.ljust(w) for v, w in zip(vals, widths)) + " |"
    lines = [bar, fmt_row(headers), bar]
    lines.extend(fmt_row(c) for c in cells)
    lines.append(bar)
    lines.append(f"{len(rows)} row(s) selected")
    return "\n".join(lines)


def run_statement(client, sql: str, maxrows: int, fmt: str, out=None) -> bool:
    # resolve stdout at CALL time: a default bound at import would pin
    # whatever sys.stdout was during the first import (test captures,
    # redirections) for the life of the process
    out = out if out is not None else sys.stdout
    sql = sql.strip().rstrip(";")
    if not sql:
        return True
    try:
        guid = client.execute(sql)
    except RuntimeError as e:
        print(f"Error: {e}", file=sys.stderr)
        return False
    schema = client.result_schema(guid)
    rows = []
    while len(rows) < maxrows:
        page = client.fetch(guid, min(1000, maxrows - len(rows)))
        if not page:
            break
        rows.extend(page)
    print(_render(schema, rows, fmt), file=out)
    client.close_operation(guid)
    return True


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="beeline", description=__doc__.splitlines()[0])
    p.add_argument("-u", "--url", help="host:port of the thrift frontend")
    p.add_argument("--discovery", metavar="REGISTRY",
                   help="resolve a live server from this discovery "
                        "registry file and fail over across candidates "
                        "(the JDBC URL's serviceDiscoveryMode=zooKeeper "
                        "analog); overrides -u")
    p.add_argument("-n", "--user", default="beeline")
    p.add_argument("-p", "--password", default=None,
                   help="enable SASL/PLAIN (binary) or Basic (http) auth")
    p.add_argument("-e", "--execute", action="append", default=[],
                   help="statement(s) to run (repeatable; ';'-separated)")
    p.add_argument("-f", "--file", help="run statements from a file")
    p.add_argument("--http", action="store_true", help="HTTP transport mode")
    p.add_argument("--hiveconf", action="append", default=[], metavar="K=V")
    p.add_argument("--maxrows", type=int, default=1000)
    p.add_argument("--outputformat", choices=["table", "csv", "tsv"], default="table")
    p.add_argument("--ssl", action="store_true",
                   help="connect over TLS (hive ;ssl=true analog)")
    p.add_argument("--ssl-ca", metavar="PEM",
                   help="CA / server cert PEM to verify against "
                        "(sslTrustStore analog); implies --ssl")
    p.add_argument("--ssl-insecure", action="store_true",
                   help="TLS without certificate verification (dev only)")
    a = p.parse_args(argv)

    from kyuubi_spark.gateway.thrift import ThriftClient, ThriftHttpClient

    if not a.url and not a.discovery:
        p.error("one of -u/--url or --discovery is required")
    cls = ThriftHttpClient if a.http else ThriftClient
    kwargs = {}
    if a.ssl or a.ssl_ca or a.ssl_insecure:
        from kyuubi_spark.gateway.tls import client_ssl_context

        kwargs["ssl_context"] = client_ssl_context(
            cafile=a.ssl_ca, insecure=a.ssl_insecure
        )
    if a.password is not None:
        kwargs.update(user=a.user, password=a.password)
    if a.discovery:
        from kyuubi_spark.client.ha import discover_servers

        candidates = discover_servers(a.discovery)
        if not candidates:
            print(f"no live gateway registered in {a.discovery}",
                  file=sys.stderr)
            return 1
        client = None
        last = None
        for host, port in candidates:
            try:
                client = cls(host, int(port), **kwargs)
                a.url = f"{host}:{port}"
                break
            except OSError as e:
                last = e
        if client is None:
            print(f"all discovered gateways failed: {last}",
                  file=sys.stderr)
            return 1
    else:
        host, port = a.url.rsplit(":", 1)
        client = cls(host, int(port), **kwargs)
    conf = dict(kv.split("=", 1) for kv in a.hiveconf if "=" in kv)
    client.open_session(user=a.user, conf=conf or None)

    statements: list[str] = []
    for chunk in a.execute:
        statements.extend(s for s in chunk.split(";") if s.strip())
    if a.file:
        with open(a.file) as fh:
            statements.extend(s for s in fh.read().split(";") if s.strip())

    rc = 0
    try:
        if statements:
            for sql in statements:
                if not run_statement(client, sql, a.maxrows, a.outputformat):
                    rc = 1
        else:  # REPL
            print(f"Connected to {a.url} as {a.user}. Ctrl-D to exit.")
            buf = ""
            for line in sys.stdin:
                buf += line
                while ";" in buf:
                    stmt, buf = buf.split(";", 1)
                    run_statement(client, stmt, a.maxrows, a.outputformat)
    finally:
        try:
            client.close_session()
        finally:
            client.close()
    return rc


if __name__ == "__main__":
    sys.exit(main())
