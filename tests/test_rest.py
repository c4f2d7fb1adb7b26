"""REST frontend suite — full HTTP round trips against a live server."""

import json
import os
import sys
import time
import urllib.request

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kyuubi_spark.gateway import Engine  # noqa: E402
from kyuubi_spark.gateway.rest import RestGateway  # noqa: E402


@pytest.fixture(scope="module")
def rest(spark, sf_dir):
    from kyuubi_spark.session import load_tables

    load_tables(spark, sf_dir)
    gw = RestGateway(Engine(spark=spark)).start()
    yield gw
    gw.shutdown()


def _call(rest, method, path, body=None, expect=200):
    url = f"http://127.0.0.1:{rest.port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method)
    if data:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == expect
        return json.loads(resp.read())


def test_session_lifecycle(rest):
    s = _call(rest, "POST", "/api/v1/sessions", {"user": "restuser"})
    assert s["user"] == "restuser"
    listed = _call(rest, "GET", "/api/v1/sessions")
    assert any(x["identifier"] == s["identifier"] for x in listed)
    _call(rest, "DELETE", f"/api/v1/sessions/{s['identifier']}")
    listed = _call(rest, "GET", "/api/v1/sessions")
    assert not any(x["identifier"] == s["identifier"] for x in listed)


def test_statement_roundtrip_over_http(rest, sf_dir):
    s = _call(rest, "POST", "/api/v1/sessions", {"user": "restuser"})
    sid = s["identifier"]
    try:
        op = _call(
            rest, "POST", f"/api/v1/sessions/{sid}/operations",
            {"statement": "SELECT id * 2 AS d FROM range(5) ORDER BY id"},
        )
        assert op["state"] == "FINISHED"
        oid = op["identifier"]
        rs = _call(rest, "GET", f"/api/v1/operations/{oid}/rowset?maxrows=3")
        assert rs["columns"] == ["d"]
        assert rs["rows"] == [[0], [2], [4]]
        rs2 = _call(rest, "GET", f"/api/v1/operations/{oid}/rowset?maxrows=3")
        assert rs2["rows"] == [[6], [8]]
        log = _call(rest, "GET", f"/api/v1/operations/{oid}/log")
        assert any("executing" in line for line in log["log"])
        _call(rest, "DELETE", f"/api/v1/operations/{oid}")
    finally:
        _call(rest, "DELETE", f"/api/v1/sessions/{sid}")


def test_async_operation_and_status_poll(rest):
    s = _call(rest, "POST", "/api/v1/sessions", {})
    sid = s["identifier"]
    try:
        op = _call(
            rest, "POST", f"/api/v1/sessions/{sid}/operations",
            {"statement": "SELECT count(*) AS n FROM range(1000000)", "async": True},
        )
        oid = op["identifier"]
        for _ in range(100):
            st = _call(rest, "GET", f"/api/v1/operations/{oid}")
            if st["state"] in ("FINISHED", "ERROR"):
                break
            time.sleep(0.2)
        assert st["state"] == "FINISHED"
        rs = _call(rest, "GET", f"/api/v1/operations/{oid}/rowset")
        assert rs["rows"] == [[1000000]]
    finally:
        _call(rest, "DELETE", f"/api/v1/sessions/{sid}")


def test_error_reported_via_status(rest):
    s = _call(rest, "POST", "/api/v1/sessions", {})
    sid = s["identifier"]
    try:
        op = _call(
            rest, "POST", f"/api/v1/sessions/{sid}/operations",
            {"statement": "SELECT * FROM no_such_table_rest"},
        )
        st = _call(rest, "GET", f"/api/v1/operations/{op['identifier']}")
        assert st["state"] == "ERROR" and "no_such_table_rest" in st["error"]
    finally:
        _call(rest, "DELETE", f"/api/v1/sessions/{sid}")


def test_batch_submission_lifecycle(rest):
    job = _call(
        rest, "POST", "/api/v1/batches",
        {"script": "import sys\nprint('batch says', sys.argv[1])", "args": ["hello"]},
    )
    bid = job["id"]
    for _ in range(100):
        st = _call(rest, "GET", f"/api/v1/batches/{bid}")
        if st["state"] in ("FINISHED", "ERROR"):
            break
        time.sleep(0.1)
    assert st["state"] == "FINISHED"
    log = _call(rest, "GET", f"/api/v1/batches/{bid}/localLog")
    assert "batch says hello" in log["log"]


def test_batch_failure_state(rest):
    job = _call(
        rest, "POST", "/api/v1/batches", {"script": "raise SystemExit(3)"}
    )
    for _ in range(100):
        st = _call(rest, "GET", f"/api/v1/batches/{job['id']}")
        if st["state"] in ("FINISHED", "ERROR"):
            break
        time.sleep(0.1)
    assert st["state"] == "ERROR"


def test_rest_session_backed_by_jdbc_engine(rest, sf_dir):
    """REST clients pass conf on session open, so a REST session can route
    to the JDBC engine and run SQL on the embedded DuckDB backend."""
    s = _call(
        rest,
        "POST",
        "/api/v1/sessions",
        {
            "user": "rest_duck",
            "conf": {
                "kyuubi.engine.type": "JDBC",
                "kyuubi.engine.jdbc.connection.url": "jdbc:duckdb::memory:",
            },
        },
    )
    sid = s["identifier"]
    op = _call(
        rest,
        "POST",
        f"/api/v1/sessions/{sid}/operations",
        {"statement": "SELECT 6 * 7 AS a, 'duck' AS b"},
    )
    oid = op["identifier"]
    page = _call(rest, "GET", f"/api/v1/operations/{oid}/rowset?maxrows=10")
    assert page["columns"] == ["a", "b"]
    assert page["rows"] == [[42, "duck"]]
    _call(rest, "DELETE", f"/api/v1/operations/{oid}")
    _call(rest, "DELETE", f"/api/v1/sessions/{sid}")


def test_ctl_cli_over_rest(rest, sf_dir, capsys):
    """tools/ctl.py (kyuubi-ctl analog): list/sql/delete verbs against the
    live REST frontend."""
    import json as _json
    import sys

    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    from tools import ctl

    base = f"http://127.0.0.1:{rest.port}"
    ctl.main(["--url", base, "sql", "SELECT 2 + 2 AS four", "--user", "ctl-test"])
    out = capsys.readouterr().out.strip().splitlines()
    page = _json.loads(out[-1])
    assert page["columns"] == ["four"]
    assert page["rows"] == [[4]]
    # list sessions (the sql session is already closed by the CLI)
    ctl.main(["--url", base, "list", "sessions"])
    out = capsys.readouterr().out
    assert "ctl-test" not in out


def test_ui_status_page(rest, sf_dir):
    s = _call(rest, "POST", "/api/v1/sessions", {"user": "ui_user"})
    req = urllib.request.Request(f"http://127.0.0.1:{rest.port}/ui")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        assert "text/html" in resp.headers["Content-Type"]
        page = resp.read().decode()
    assert "ui_user" in page
    assert "<h2>Metrics</h2>" in page
    _call(rest, "DELETE", f"/api/v1/sessions/{s['identifier']}")


def test_admin_engine_and_server_listing(spark, sf_dir):
    """Admin resource (AdminResource.scala:282-408 analog): engine and
    server nodes listed from the discovery registry, engine nodes
    deletable — what `ctl list engines` / `delete engine` speak to."""
    import json as _json
    import urllib.parse
    import urllib.request

    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient
    from kyuubi_spark.gateway.server_main import KyuubiServer

    disco = SqliteDiscoveryClient()
    disco.create_client()
    server = KyuubiServer(spark, discovery=disco).start()
    try:
        # publish an engine node like a pooled engine would
        disco.create_and_get_service_node(
            "/kyuubi/USER_alice", "127.0.0.1:12345", version="1.9.0"
        )
        base = f"http://{server.host}:{server.endpoints()['rest'][1]}/api/v1"
        with urllib.request.urlopen(f"{base}/admin/engine") as r:
            engines = _json.loads(r.read())
        assert any(e["instance"] == "127.0.0.1:12345" for e in engines)
        with urllib.request.urlopen(f"{base}/admin/server") as r:
            servers = _json.loads(r.read())
        assert len(servers) == 1  # the KyuubiServer registered itself

        node = next(
            e for e in engines if e["instance"] == "127.0.0.1:12345"
        )
        full = f"{node['namespace'].lstrip('/')}/{node['nodeName']}"
        req = urllib.request.Request(
            f"{base}/admin/engine?node={urllib.parse.quote(full)}",
            method="DELETE",
        )
        with urllib.request.urlopen(req) as r:
            assert _json.loads(r.read())["deleted"] == full
        with urllib.request.urlopen(f"{base}/admin/engine") as r:
            left = _json.loads(r.read())
        assert not any(e["instance"] == "127.0.0.1:12345" for e in left)

        # ctl verbs over the same routes
        import sys as _sys

        _sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
        from tools import ctl

        ctl.main(["--url", base.rsplit("/api", 1)[0], "list", "servers"])
    finally:
        server.stop()
        disco.close_client()


def test_batch_multipart_resource_upload(spark):
    """POST /api/v1/batches with multipart/form-data (BatchesResource
    .scala:196-218): 'batchRequest' JSON + uploaded 'resourceFile' script;
    missing parts get the reference's 400 message."""
    import json as _json
    import time
    import urllib.error
    import urllib.request

    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.rest import RestGateway

    svc = RestGateway(Engine(spark=spark)).start()
    try:
        base = f"http://127.0.0.1:{svc.port}/api/v1"
        boundary = "xyzBOUNDARYxyz"
        req_json = _json.dumps({"args": ["7"], "user": "uploader"})
        script = "import sys\nprint('upload-ran', sys.argv[1])\n"
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="batchRequest"\r\n\r\n'
            f"{req_json}\r\n"
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="resourceFile"; '
            'filename="job.py"\r\n'
            "Content-Type: application/octet-stream\r\n\r\n"
            f"{script}\r\n"
            f"--{boundary}--\r\n"
        ).encode()
        req = urllib.request.Request(
            f"{base}/batches",
            data=body,
            headers={
                "Content-Type": f"multipart/form-data; boundary={boundary}"
            },
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            info = _json.loads(r.read())
        bid = info["id"]
        for _ in range(100):
            with urllib.request.urlopen(f"{base}/batches/{bid}") as r:
                st = _json.loads(r.read())["state"]
            if st in ("FINISHED", "ERROR"):
                break
            time.sleep(0.1)
        assert st == "FINISHED"
        with urllib.request.urlopen(f"{base}/batches/{bid}/localLog") as r:
            assert "upload-ran 7" in _json.loads(r.read())["log"]

        # missing resourceFile -> 400 with the reference's message
        bad = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="batchRequest"\r\n\r\n'
            f"{req_json}\r\n"
            f"--{boundary}--\r\n"
        ).encode()
        req = urllib.request.Request(
            f"{base}/batches",
            data=bad,
            headers={
                "Content-Type": f"multipart/form-data; boundary={boundary}"
            },
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
    finally:
        svc.shutdown()


def test_admin_refresh_limiter_lists(spark):
    """POST /api/v1/admin/refresh/{denyUsers,unlimitedUsers}
    (AdminResource.scala:113-168): swaps the limiter lists at runtime —
    a freshly denied user is rejected on the next connection; only
    administrators may refresh when auth is on."""
    import base64
    import json as _json
    import urllib.error
    import urllib.request

    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.auth import AuthenticationError
    from kyuubi_spark.gateway.rest import RestGateway

    class TwoUsers:
        def authenticate(self, user, password):
            if password != "pw":
                raise AuthenticationError("bad")

    eng = Engine(
        spark=spark,
        conf={"kyuubi.server.administrators": "admin"},
    )
    svc = RestGateway(eng, auth=TwoUsers()).start()
    try:
        base = f"http://127.0.0.1:{svc.port}/api/v1"

        def call(path, user, body=None):
            req = urllib.request.Request(
                f"{base}/{path}",
                data=_json.dumps(body or {}).encode(),
                headers={
                    "Content-Type": "application/json",
                    "Authorization": "Basic "
                    + base64.b64encode(f"{user}:pw".encode()).decode(),
                },
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                return _json.loads(r.read())

        # non-admin refused
        try:
            call("admin/refresh/denyUsers", "mallory", {"values": ["x"]})
            raise AssertionError("expected 403")
        except urllib.error.HTTPError as e:
            assert e.code == 403

        out = call("admin/refresh/denyUsers", "admin",
                   {"values": ["blocked_user"]})
        assert out == {"refreshed": "denyUsers", "size": 1}
        # the denied user bounces at session open now
        try:
            call("sessions", "blocked_user")
            raise AssertionError("expected 500 deny")
        except urllib.error.HTTPError as e:
            assert "deny" in e.read().decode()
        # and can be un-denied (empty body -> re-read conf, which has none)
        out = call("admin/refresh/denyUsers", "admin")
        assert out["size"] == 0
        s = call("sessions", "blocked_user")
        assert s["user"] == "blocked_user"
    finally:
        svc.shutdown()


def test_admin_engine_delete_requires_administrator(spark):
    """DELETE /api/v1/admin/engine is destructive (deregisters a live
    engine — or, pointed at an infra node, the cluster secret) and must
    be administrator-gated exactly like the refresh endpoints
    (AdminResource requires isAdministrator for both)."""
    import base64
    import json as _json
    import urllib.error
    import urllib.parse
    import urllib.request

    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.auth import AuthenticationError
    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient
    from kyuubi_spark.gateway.rest import RestGateway

    class AnyPw:
        def authenticate(self, user, password):
            if password != "pw":
                raise AuthenticationError("bad")

    disco = SqliteDiscoveryClient()
    disco.create_client()
    disco.create_and_get_service_node(
        "/kyuubi/USER_alice", "127.0.0.1:23456", version="1.9.0"
    )
    eng = Engine(
        spark=spark, conf={"kyuubi.server.administrators": "admin"}
    )
    eng.discovery = disco
    svc = RestGateway(eng, auth=AnyPw()).start()
    try:
        base = f"http://127.0.0.1:{svc.port}/api/v1"
        info = disco.get_service_nodes_info("/kyuubi/USER_alice")[0]
        node = urllib.parse.quote(
            f"kyuubi/USER_alice/{info.node_name}"
        )

        def delete(user):
            req = urllib.request.Request(
                f"{base}/admin/engine?node={node}",
                headers={
                    "Authorization": "Basic "
                    + base64.b64encode(f"{user}:pw".encode()).decode()
                },
                method="DELETE",
            )
            with urllib.request.urlopen(req) as r:
                return _json.loads(r.read())

        try:
            delete("mallory")
            raise AssertionError("expected 403")
        except urllib.error.HTTPError as e:
            assert e.code == 403
        # the node survived the refused attempt
        assert disco.get_children("/kyuubi/USER_alice")
        assert delete("admin")["deleted"]
        assert not disco.get_children("/kyuubi/USER_alice")
    finally:
        svc.shutdown()


def test_admin_refresh_explicit_empty_list_clears(spark):
    """{"values": []} CLEARS a limiter list at runtime — distinct from a
    missing key, which re-reads server conf. A conf-seeded deny list must
    be clearable without a restart."""
    import base64
    import json as _json
    import urllib.request

    from kyuubi_spark.gateway import Engine
    from kyuubi_spark.gateway.rest import RestGateway

    eng = Engine(
        spark=spark,
        conf={
            "kyuubi.server.administrators": "admin",
            "kyuubi.server.limit.connections.user.deny.list": "alice",
        },
    )
    svc = RestGateway(eng).start()  # auth off: gate passes everyone
    try:
        base = f"http://127.0.0.1:{svc.port}/api/v1"

        def refresh(body):
            req = urllib.request.Request(
                f"{base}/admin/refresh/denyUsers",
                data=_json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                return _json.loads(r.read())

        assert eng.limiter.deny_users == {"alice"}
        out = refresh({"values": []})
        assert out == {"refreshed": "denyUsers", "size": 0}
        assert eng.limiter.deny_users == set()
        # missing key still re-reads conf (re-seeds alice)
        out = refresh({})
        assert out["size"] == 1 and eng.limiter.deny_users == {"alice"}
    finally:
        svc.shutdown()


def test_admin_engine_listing_walks_share_level_spaces(spark):
    """Share-level engine spaces are TWO levels deep (/kyuubi/user/alice,
    EngineRef.engineSpace) — gateway-launched engine processes register
    there and must show up in the admin listing."""
    import json as _json
    import urllib.request

    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient
    from kyuubi_spark.gateway.server_main import KyuubiServer

    disco = SqliteDiscoveryClient()
    disco.create_client()
    server = KyuubiServer(spark, discovery=disco).start()
    try:
        disco.create_and_get_service_node(
            "/kyuubi/user/bob", "127.0.0.1:23456",
            engine_ref_id="ref42", attributes={"pid": "999"},
        )
        disco.create_and_get_service_node(
            "/kyuubi/connection/c1", "127.0.0.1:23457"
        )
        base = f"http://{server.host}:{server.endpoints()['rest'][1]}/api/v1"
        with urllib.request.urlopen(f"{base}/admin/engine") as r:
            engines = _json.loads(r.read())
        by_instance = {e["instance"]: e for e in engines}
        assert "127.0.0.1:23456" in by_instance
        assert by_instance["127.0.0.1:23456"]["engineRefId"] == "ref42"
        assert by_instance["127.0.0.1:23456"]["attributes"]["pid"] == "999"
        assert "127.0.0.1:23457" in by_instance
        # the server's own registration is NOT an engine
        assert not any(
            e["namespace"] == "/kyuubi/servers" for e in engines
        )
    finally:
        server.stop()
        disco.close_client()


def test_spark_batch_submission_real_spark_submit(rest):
    """batchType=SPARK submits the resource through the REAL spark-submit
    binary (BatchJobSubmission.scala:293-333): the batch id becomes the
    application tag (KYUUBI,<id> in spark.yarn.tags), the driver python
    runs the script as a PySpark app, and state/log/kill flow through the
    same batch lifecycle."""
    if not os.path.exists("/opt/spark/bin/spark-submit"):
        pytest.skip("no spark-submit binary in this environment")
    script = (
        "from pyspark.sql import SparkSession\n"
        "import sys\n"
        "spark = SparkSession.builder.getOrCreate()\n"
        "n = spark.range(100).count()\n"
        "print('SPARK BATCH OK', n, sys.argv[1])\n"
        "spark.stop()\n"
    )
    job = _call(
        rest, "POST", "/api/v1/batches",
        {
            "batchType": "SPARK",
            "name": "rest-spark-batch",
            "script": script,
            "args": ["tagcheck"],
            "conf": {
                "kyuubi.engine.spark.submit.path":
                    "/opt/spark/bin/spark-submit",
                "spark.master": "local[2]",
            },
        },
    )
    assert job["batchType"] == "SPARK"
    assert job["appTag"] == job["id"]
    bid = job["id"]
    for _ in range(600):
        st = _call(rest, "GET", f"/api/v1/batches/{bid}")
        if st["state"] in ("FINISHED", "ERROR"):
            break
        time.sleep(0.2)
    log = _call(rest, "GET", f"/api/v1/batches/{bid}/localLog")["log"]
    assert st["state"] == "FINISHED", log
    assert "SPARK BATCH OK 100 tagcheck" in log
