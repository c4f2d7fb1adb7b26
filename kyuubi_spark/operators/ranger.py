"""Ranger policy-export evaluation — the policy format the reference's
authz plugin consumes.

The reference plugin (extensions/spark/kyuubi-spark-authz) is a Ranger
client: its admin downloads service policies as JSON (the shape in its
test fixture policies_base.json — ``{"serviceName", "policies": [...]}``
with per-policy ``resources`` (database/table/column value lists with
wildcards), ``policyItems``/``denyPolicyItems`` (access), ``policyType 1``
``dataMaskPolicyItems`` and ``policyType 2`` ``rowFilterPolicyItems``).
This module evaluates that SAME document shape for a (user, groups) pair
and reduces it to this repo's enforcement primitives:

- ``policies_for_user`` → {table: TablePolicy} consumed by
  ``masking.apply_policies`` (view substitution);
- ``allowed``/``check_access`` → the select/update allow decision
  consumed at statement authorization time, with Ranger precedence
  (deny > allow; an enabled deny item wins over any allow).

Only the evaluated subset is implemented: user/group matching (Ranger's
``public`` group matches everyone), ``*`` wildcards and ``isExcludes``
on resource values, enabled flags, and the four standard mask types plus
``CUSTOM`` (valueExpr with ``{col}`` substitution).  Validity schedules,
policy priorities, and tag-based policies are out of scope.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from kyuubi_spark.operators.masking import (
    TablePolicy,
    mask_full,
    mask_hash,
    mask_null,
    mask_show_last_4,
)

PUBLIC_GROUP = "public"

_MASKS = {
    "MASK": mask_full,
    "MASK_SHOW_LAST_4": mask_show_last_4,
    "MASK_HASH": mask_hash,
    "MASK_NULL": mask_null,
}


class RangerAccessDenied(PermissionError):
    pass


def _values(resources: dict, key: str) -> tuple[list[str], bool]:
    r = resources.get(key) or {}
    return [str(v).lower() for v in r.get("values", [])], bool(
        r.get("isExcludes", False)
    )


def _res_matches(resources: dict, key: str, name: str | None) -> bool:
    """Ranger resource matching: value list with '*' wildcard and
    isExcludes inversion; an absent resource level matches anything."""
    vals, excludes = _values(resources, key)
    if not vals:
        return True
    if name is None:
        return "*" in vals and not excludes
    hit = "*" in vals or name.lower() in vals
    return (not hit) if excludes else hit


def _item_matches(item: dict, user: str, groups: set[str]) -> bool:
    iusers = {str(u) for u in item.get("users", [])}
    igroups = {str(g) for g in item.get("groups", [])}
    return (
        user in iusers
        or bool(groups & igroups)
        or PUBLIC_GROUP in igroups
    )


def _item_allows(item: dict, access: str) -> bool:
    return any(
        a.get("type") == access and a.get("isAllowed", False)
        for a in item.get("accesses", [])
    )


@dataclass
class RangerService:
    """One parsed service-policies document."""

    service_name: str
    policies: list[dict] = field(default_factory=list)

    # -- access ----------------------------------------------------------

    def allowed(
        self,
        user: str,
        database: str,
        table: str,
        column: str | None = None,
        access: str = "select",
        groups: set[str] | None = None,
    ) -> bool:
        """Deny > allow, like the Ranger evaluator: any matching enabled
        denyPolicyItem refuses; otherwise any matching allow item grants."""
        groups = groups or set()
        denied = False
        allowed = False
        for p in self.policies:
            if not p.get("isEnabled", True) or p.get("policyType", 0) != 0:
                continue
            res = p.get("resources", {})
            if not (
                _res_matches(res, "database", database)
                and _res_matches(res, "table", table)
                and _res_matches(res, "column", column)
            ):
                continue
            for item in p.get("denyPolicyItems", []):
                if _item_matches(item, user, groups) and _item_allows(
                    item, access
                ):
                    denied = True
            for item in p.get("policyItems", []):
                if _item_matches(item, user, groups) and _item_allows(
                    item, access
                ):
                    allowed = True
        return allowed and not denied

    def check_access(self, user: str, database: str, table: str,
                     column: str | None = None, access: str = "select",
                     groups: set[str] | None = None) -> None:
        if not self.allowed(user, database, table, column, access, groups):
            col = f".{column}" if column else ""
            raise RangerAccessDenied(
                f"Permission denied: user [{user}] does not have [{access}] "
                f"privilege on [{database}/{table}{col}]"
            )

    # -- row filters / masks --------------------------------------------

    def policies_for_user(
        self,
        user: str,
        tables: dict[str, list[str]],
        database: str = "default",
        groups: set[str] | None = None,
    ) -> dict[str, TablePolicy]:
        """Reduce the document to {table: TablePolicy} for ``user`` over
        ``tables`` ({table: [columns]}) — the input
        ``masking.apply_policies`` turns into secured views."""
        groups = groups or set()
        out: dict[str, TablePolicy] = {}

        def pol(table: str) -> TablePolicy:
            return out.setdefault(table, TablePolicy())

        for p in self.policies:
            if not p.get("isEnabled", True):
                continue
            ptype = p.get("policyType", 0)
            res = p.get("resources", {})
            if not _res_matches(res, "database", database):
                continue
            for table, cols in tables.items():
                if not _res_matches(res, "table", table):
                    continue
                if ptype == 2:  # row filter
                    for item in p.get("rowFilterPolicyItems", []):
                        if not _item_matches(item, user, groups):
                            continue
                        expr = (item.get("rowFilterInfo") or {}).get(
                            "filterExpr"
                        )
                        if expr:
                            existing = pol(table).row_filter
                            pol(table).row_filter = (
                                f"({existing}) AND ({expr})"
                                if existing
                                else expr
                            )
                elif ptype == 1:  # data mask
                    for item in p.get("dataMaskPolicyItems", []):
                        if not _item_matches(item, user, groups):
                            continue
                        info = item.get("dataMaskInfo") or {}
                        mtype = info.get("dataMaskType", "MASK")
                        if mtype in ("MASK_NONE", "NONE"):
                            continue
                        for col in cols:
                            if not _res_matches(res, "column", col):
                                continue
                            if mtype == "CUSTOM":
                                expr = (info.get("valueExpr") or "").replace(
                                    "{col}", col
                                )
                            else:
                                fn = _MASKS.get(mtype)
                                expr = fn(col) if fn else None
                            if expr:
                                pol(table).column_masks[col] = expr
        return out


def load_service_policies(source) -> RangerService:
    """Parse a Ranger service-policies export (path, JSON string, or
    already-parsed dict)."""
    if isinstance(source, dict):
        doc = source
    elif isinstance(source, str) and source.lstrip().startswith("{"):
        doc = json.loads(source)
    else:
        with open(source) as f:
            doc = json.load(f)
    return RangerService(
        service_name=doc.get("serviceName", ""),
        policies=list(doc.get("policies", [])),
    )
