"""Ranger policy-export evaluation (operators/ranger.py) — the service
policies JSON shape the reference authz plugin consumes (its test fixture
policies_base.json), reduced to TablePolicy/secured views + access checks."""

from __future__ import annotations

import pytest

from kyuubi_spark.operators.masking import apply_policies
from kyuubi_spark.operators.ranger import (
    RangerAccessDenied,
    load_service_policies,
)

_DOC = {
    "serviceName": "test_hive",
    "policies": [
        {
            "name": "all_select_for_analysts",
            "policyType": 0,
            "isEnabled": True,
            "resources": {
                "database": {"values": ["default"]},
                "table": {"values": ["*"]},
                "column": {"values": ["*"]},
            },
            "policyItems": [
                {
                    "users": [],
                    "groups": ["analysts"],
                    "accesses": [{"type": "select", "isAllowed": True}],
                }
            ],
            "denyPolicyItems": [
                {
                    "users": ["mallory"],
                    "accesses": [{"type": "select", "isAllowed": True}],
                }
            ],
        },
        {
            "name": "region_key_lt_3",
            "policyType": 2,
            "isEnabled": True,
            "resources": {
                "database": {"values": ["default"]},
                "table": {"values": ["region"]},
            },
            "rowFilterPolicyItems": [
                {
                    "rowFilterInfo": {"filterExpr": "r_regionkey < 3"},
                    "users": ["bob"],
                    "accesses": [{"type": "select", "isAllowed": True}],
                }
            ],
        },
        {
            "name": "region_name_hash",
            "policyType": 1,
            "isEnabled": True,
            "resources": {
                "database": {"values": ["default"]},
                "table": {"values": ["region"]},
                "column": {"values": ["r_name"]},
            },
            "dataMaskPolicyItems": [
                {
                    "dataMaskInfo": {"dataMaskType": "MASK_HASH"},
                    "users": ["bob"],
                    "accesses": [{"type": "select", "isAllowed": True}],
                }
            ],
        },
        {
            "name": "nation_name_custom_mask",
            "policyType": 1,
            "isEnabled": True,
            "resources": {
                "database": {"values": ["default"]},
                "table": {"values": ["nation"]},
                "column": {"values": ["n_name"]},
            },
            "dataMaskPolicyItems": [
                {
                    "dataMaskInfo": {
                        "dataMaskType": "CUSTOM",
                        "valueExpr": "upper(left({col}, 2))",
                    },
                    "groups": ["public"],
                    "accesses": [{"type": "select", "isAllowed": True}],
                }
            ],
        },
        {
            "name": "disabled_mask_ignored",
            "policyType": 1,
            "isEnabled": False,
            "resources": {
                "database": {"values": ["default"]},
                "table": {"values": ["region"]},
                "column": {"values": ["r_regionkey"]},
            },
            "dataMaskPolicyItems": [
                {
                    "dataMaskInfo": {"dataMaskType": "MASK_NULL"},
                    "groups": ["public"],
                    "accesses": [{"type": "select", "isAllowed": True}],
                }
            ],
        },
    ],
}


@pytest.fixture(scope="module")
def svc():
    return load_service_policies(_DOC)


def test_access_allow_group_deny_user(svc):
    assert svc.allowed("alice", "default", "region",
                       groups={"analysts"})
    assert not svc.allowed("alice", "default", "region")  # no group
    # deny wins over the group allow
    assert not svc.allowed("mallory", "default", "region",
                           groups={"analysts"})
    with pytest.raises(RangerAccessDenied, match="mallory"):
        svc.check_access("mallory", "default", "region",
                         groups={"analysts"})


def test_wildcards_and_excludes():
    doc = {
        "serviceName": "s",
        "policies": [{
            "policyType": 0,
            "isEnabled": True,
            "resources": {
                "database": {"values": ["*"]},
                "table": {"values": ["secret"], "isExcludes": True},
            },
            "policyItems": [{
                "groups": ["public"],
                "accesses": [{"type": "select", "isAllowed": True}],
            }],
        }],
    }
    s = load_service_policies(doc)
    assert s.allowed("anyone", "db1", "normal")
    assert not s.allowed("anyone", "db1", "secret")  # excluded resource


def test_policies_reduce_to_table_policy(svc):
    tables = {"region": ["r_regionkey", "r_name"],
              "nation": ["n_nationkey", "n_name"]}
    pols = svc.policies_for_user("bob", tables)
    tp = pols["region"]
    assert tp.row_filter == "r_regionkey < 3"
    assert tp.column_masks["r_name"] == "md5(CAST(r_name AS STRING))"
    # disabled policy ignored; unmasked column untouched
    assert "r_regionkey" not in tp.column_masks
    assert pols["nation"].column_masks["n_name"] == "upper(left(n_name, 2))"
    # alice matches only the public-group custom mask on nation
    apols = svc.policies_for_user("alice", tables)
    assert "region" not in apols or not apols["region"].column_masks
    assert list(apols["nation"].column_masks) == ["n_name"]


def test_end_to_end_secured_view(spark, sf_dir, svc):
    """The evaluated policies drive the same view-substitution enforcement
    path the authz suite tests: bob sees only r_regionkey<3 rows, hashed
    names, and 2-char comment prefixes."""
    from kyuubi_spark.session import load_table

    load_table(spark, sf_dir, "region").createOrReplaceTempView("region")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    pols = svc.policies_for_user(
        "bob",
        {"region": ["r_regionkey", "r_name"],
         "nation": ["n_nationkey", "n_name"]},
    )
    views = apply_policies(spark, pols, suffix="_bob")
    rows = spark.sql(
        f"SELECT r_regionkey, r_name FROM {views['region']}"
        " ORDER BY r_regionkey"
    ).collect()
    assert [r.r_regionkey for r in rows] == [0, 1, 2]  # row filter applied
    import hashlib

    plain = {
        r.r_regionkey: r.r_name
        for r in spark.sql(
            "SELECT * FROM region WHERE r_regionkey < 3"
        ).collect()
    }
    for r in rows:
        assert r.r_name == hashlib.md5(plain[r.r_regionkey].encode()).hexdigest()
    n = spark.sql(
        f"SELECT n_name FROM {views['nation']} WHERE n_nationkey = 0"
    ).collect()[0].n_name
    n_plain = spark.sql(
        "SELECT n_name FROM nation WHERE n_nationkey = 0"
    ).collect()[0].n_name
    assert n == n_plain[:2].upper()
