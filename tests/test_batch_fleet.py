"""Cross-server batch visibility over the shared metadata store
(reference: BatchesResource.getBatchInfoList + MetadataManager — every
server in the fleet lists/reads batch records regardless of which
server runs the subprocess; log/cancel belong to the owner)."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from kyuubi_spark.gateway import Engine
from kyuubi_spark.gateway.rest import RestGateway


@pytest.fixture()
def fleet(spark, tmp_path):
    store = str(tmp_path / "meta.db")
    conf = {"kyuubi.metadata.store.path": store}
    a, b = Engine(spark, conf=conf), Engine(spark, conf=conf)
    ga, gb = RestGateway(a).start(), RestGateway(b).start()
    yield ga, gb
    ga.shutdown()
    gb.shutdown()


def _call(gw, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{gw.port}{path}", data=data, method=method
    )
    if data:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_batch_visible_fleet_wide(fleet):
    ga, gb = fleet
    job = _call(ga, "POST", "/api/v1/batches", {
        "script": "print('fleet batch done')", "user": "erin",
    })
    bid = job["id"]
    deadline = time.time() + 30
    while time.time() < deadline:
        if _call(ga, "GET", f"/api/v1/batches/{bid}")["state"] == "FINISHED":
            break
        time.sleep(0.2)

    # server B never ran the subprocess, but lists and reads the batch
    # from the shared metadata store
    listing = _call(gb, "GET", "/api/v1/batches")
    mine = [x for x in listing if x["id"] == bid]
    assert mine and mine[0]["state"] == "FINISHED"
    assert mine[0]["user"] == "erin"
    assert mine[0]["local"] is False
    one = _call(gb, "GET", f"/api/v1/batches/{bid}")
    assert one["state"] == "FINISHED" and one["local"] is False

    # user/state filters (the reference's query params)
    assert _call(gb, "GET", "/api/v1/batches?user=nobody") == []
    assert [x["id"] for x in _call(
        gb, "GET", "/api/v1/batches?state=FINISHED&user=erin"
    )] == [bid]

    # the OWNER serves logs; a peer answers 409 pointing at the owner
    log = _call(ga, "GET", f"/api/v1/batches/{bid}/localLog")
    assert "fleet batch done" in log["log"]
    try:
        _call(gb, "GET", f"/api/v1/batches/{bid}/localLog")
        raise AssertionError("peer served a log it does not own")
    except urllib.error.HTTPError as e:
        assert e.code == 409
        assert "owned by another server" in json.loads(e.read())["error"]


def test_spark_batch_killed_by_tag_from_nonowner(fleet):
    """ApplicationOperation parity (JpsApplicationOperation /
    KyuubiApplicationManager): a SPARK batch's submit command carries
    KYUUBI,<id> in spark.yarn.tags, so a server that does NOT own the
    subprocess (fleet peer, or a restarted gateway with no process
    handle) can still kill it by scanning for the tag — the reference's
    closeBatchSession -> killApplicationByTag path."""
    import os

    if not os.path.exists("/opt/spark/bin/spark-submit"):
        pytest.skip("no spark-submit binary in this environment")
    ga, gb = fleet
    job = _call(ga, "POST", "/api/v1/batches", {
        "batchType": "SPARK",
        "name": "long-runner",
        "script": "import time\ntime.sleep(300)\n",
        "conf": {
            "kyuubi.engine.spark.submit.path": "/opt/spark/bin/spark-submit",
            "spark.master": "local[1]",
        },
        "user": "erin",
    })
    bid = job["id"]
    assert job["appTag"] == bid

    # the tag is discoverable fleet-wide while the app runs
    from kyuubi_spark.gateway.applications import LocalApplicationOperation

    op = LocalApplicationOperation()
    deadline = time.time() + 30
    while time.time() < deadline:
        if op.get_application_info_by_tag(bid).state == "RUNNING":
            break
        time.sleep(0.2)
    assert op.get_application_info_by_tag(bid).state == "RUNNING"

    # server B owns no process handle for this batch — DELETE kills by tag
    out = _call(gb, "DELETE", f"/api/v1/batches/{bid}")
    assert out["killed"] is True
    assert out["state"] == "CANCELED"

    deadline = time.time() + 15
    while time.time() < deadline:
        if op.get_application_info_by_tag(bid).state == "NOT_FOUND":
            break
        time.sleep(0.2)
    assert op.get_application_info_by_tag(bid).state == "NOT_FOUND"

    # a second kill attempt finds nothing (idempotent-ish contract)
    out = _call(gb, "DELETE", f"/api/v1/batches/{bid}")
    assert out["killed"] is False
