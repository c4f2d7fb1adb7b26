"""Plan-level authz: privilege extraction from the analyzed plan, ACL
enforcement on arbitrary SQL, and the audit event trail
(PrivilegesBuilder / RuleAuthorization parity)."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kyuubi_spark.gateway import Engine  # noqa: E402
from kyuubi_spark.operators.privileges import (  # noqa: E402
    AccessDenied,
    AclAuthorizer,
    UserAcl,
    build_privileges,
    statement_action,
)


def test_statement_action_classification():
    assert statement_action("SELECT * FROM t") == "QUERY"
    assert statement_action("  insert into t values (1)") == "UPDATE"
    assert statement_action("WITH x AS (SELECT 1) SELECT * FROM x") == "QUERY"
    assert statement_action("CREATE TABLE t (a INT)") == "DDL"
    assert statement_action("drop table t") == "DDL"
    assert statement_action("MERGE INTO t USING s ON t.id=s.id") == "UPDATE"


@pytest.fixture(scope="module")
def loaded_spark(spark, sf_dir):
    from kyuubi_spark.session import load_tables

    load_tables(spark, sf_dir)
    return spark


def test_build_privileges_resolves_plan_tables(loaded_spark):
    privs = build_privileges(
        loaded_spark,
        "SELECT r_name, n_name FROM region JOIN nation "
        "ON r_regionkey = n_regionkey",
    )
    assert {p.name for p in privs} == {"region", "nation"}
    assert all(p.action == "QUERY" for p in privs)


def test_build_privileges_sees_through_subqueries(loaded_spark):
    privs = build_privileges(
        loaded_spark,
        "WITH top AS (SELECT o_custkey FROM orders LIMIT 5) "
        "SELECT c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM top)",
    )
    assert {"orders", "customer"} <= {p.name for p in privs}


def test_acl_allow_and_deny():
    auth = AclAuthorizer({"alice": UserAcl(tables={"region"})})
    auth.check("alice", [])  # empty = nothing to check
    from kyuubi_spark.operators.privileges import PrivilegeObject

    auth.check("alice", [PrivilegeObject("region", "QUERY")])
    with pytest.raises(AccessDenied, match="may not access table"):
        auth.check("alice", [PrivilegeObject("orders", "QUERY")])
    with pytest.raises(AccessDenied, match="may not run DDL"):
        auth.check("alice", [PrivilegeObject("region", "DDL")])
    with pytest.raises(AccessDenied, match="no ACL"):
        auth.check("mallory", [PrivilegeObject("region", "QUERY")])


def test_gateway_enforcement_and_audit(loaded_spark, sf_dir, tmp_path):
    acl = {
        "alice": {"tables": ["region", "nation"]},
        "admin": {"tables": ["*"], "can_update": True, "can_ddl": True},
    }
    acl_path = str(tmp_path / "acl.json")
    with open(acl_path, "w") as f:
        json.dump(acl, f)
    eng = Engine(
        spark=loaded_spark, conf={"kyuubi.authz.acl.json.path": acl_path}
    )
    from kyuubi_spark.session import load_tables

    alice = eng.open_session(user="alice")
    load_tables(alice.spark, sf_dir)
    try:
        op = alice.execute_statement("SELECT count(*) AS n FROM region")
        assert op.get_next_row_set(size=1)[0][0] == 5
        with pytest.raises(AccessDenied, match="orders"):
            alice.execute_statement("SELECT count(*) FROM orders")
        with pytest.raises(AccessDenied, match="DDL"):
            alice.execute_statement("CREATE TABLE should_not_exist (a INT)")
        audits = eng.events.recent(50, "AccessAudit")
        assert any(a["allowed"] for a in audits)
        denied = [a for a in audits if not a["allowed"]]
        assert any(
            {"name": "orders", "action": "QUERY"} in a["objects"] for a in denied
        )
    finally:
        eng.close_session(alice.handle)

    mallory = eng.open_session(user="mallory")
    load_tables(mallory.spark, sf_dir)
    try:
        with pytest.raises(AccessDenied, match="no ACL"):
            mallory.execute_statement("SELECT 1")
    finally:
        eng.close_session(mallory.handle)
