"""Plan-level privilege extraction + ACL enforcement for arbitrary SQL.

Counterpart of the reference's PrivilegesBuilder pipeline
(extensions/spark/kyuubi-spark-authz/.../PrivilegesBuilder.scala, ~1k LoC:
build PrivilegeObjects from the analyzed plan, hand them to
RuleAuthorization for the Ranger decision): the secured-view layer
(operators/masking.py) ENFORCES row/column policies, but by itself nothing
audits what an arbitrary statement touches.  This module closes that gap —
every statement's analyzed plan is walked for its input tables (reusing the
lineage walker), the per-user ACL is consulted, and the access decision is
posted to the engine event bus as an audit record.

Statement-type detection covers the write/DDL families the reference's
table_command_spec.json distinguishes (query vs update vs create/drop), so
an ACL can grant SELECT-only users no DDL.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from kyuubi_spark.operators.lineage import extract_lineage


class AccessDenied(PermissionError):
    pass


# action classification — first keyword decides the privilege type, the
# shape the reference encodes per-command in table_command_spec.json
_WRITE_RE = re.compile(
    r"^\s*(insert|update|delete|merge)\b", re.IGNORECASE
)
_DDL_RE = re.compile(
    r"^\s*(create|drop|alter|truncate|replace)\b", re.IGNORECASE
)


def statement_action(statement: str) -> str:
    """'QUERY' | 'UPDATE' | 'DDL' for privilege purposes."""
    if _DDL_RE.match(statement):
        return "DDL"
    if _WRITE_RE.match(statement):
        return "UPDATE"
    return "QUERY"


@dataclass(frozen=True)
class PrivilegeObject:
    """One object an operation needs access to (PrivilegeObject.scala)."""

    name: str
    action: str  # QUERY / UPDATE / DDL


def build_privileges(spark: SparkSession, statement: str) -> list[PrivilegeObject]:
    """PrivilegeObjects for a statement, from its analyzed plan.

    Input tables come from the plan walk (not from regexing the SQL), so
    views, CTEs, and subqueries resolve to the real relations they read.
    DDL statements that do not analyze to a relation tree still yield the
    action-only privilege so the ACL can gate them.
    """
    action = statement_action(statement)
    try:
        tables = extract_lineage(spark, statement)["inputTables"]
    except Exception:
        # not analyzable as a query (e.g. pure DDL) — action-only privilege
        tables = []
    objs = [PrivilegeObject(name=t, action=action) for t in tables]
    if not objs:
        objs = [PrivilegeObject(name="*", action=action)]
    return objs


@dataclass
class UserAcl:
    """Evaluated ACL for one user — the shape a Ranger policy set reduces
    to after evaluation (allow-list semantics)."""

    tables: set[str] = field(default_factory=set)  # readable tables; "*" = all
    can_update: bool = False
    can_ddl: bool = False


class AclAuthorizer:
    """Per-user allow-list authorizer (RuleAuthorization.checkPrivileges)."""

    def __init__(self, acls: dict[str, UserAcl], default_allow: bool = False):
        self.acls = acls
        self.default_allow = default_allow

    def check(self, user: str, privileges: list[PrivilegeObject]) -> None:
        acl = self.acls.get(user)
        if acl is None:
            if self.default_allow:
                return
            raise AccessDenied(f"user {user!r} has no ACL and default is deny")
        for p in privileges:
            if p.action == "DDL" and not acl.can_ddl:
                raise AccessDenied(f"user {user!r} may not run DDL")
            if p.action == "UPDATE" and not acl.can_update:
                raise AccessDenied(f"user {user!r} may not write")
            if p.name != "*" and "*" not in acl.tables and p.name not in acl.tables:
                raise AccessDenied(
                    f"user {user!r} may not access table {p.name!r}"
                )


def authorize_statement(
    session, statement: str, authorizer: AclAuthorizer
) -> list[PrivilegeObject]:
    """Extract → check → audit. Raises AccessDenied on the first violation;
    posts an audit event either way (the reference posts Ranger audit
    records from RuleAuthorization)."""
    privileges = build_privileges(session.spark, statement)
    engine = getattr(session, "engine", None)
    try:
        authorizer.check(session.user, privileges)
        allowed = True
    except AccessDenied:
        allowed = False
        raise
    finally:
        if engine is not None and hasattr(engine, "events"):
            from kyuubi_spark.gateway.events import make_event

            engine.events.post(
                make_event(
                    "AccessAudit",
                    user=session.user,
                    sessionId=session.handle.id,
                    statement=statement[:500],
                    objects=[{"name": p.name, "action": p.action} for p in privileges],
                    allowed=allowed,
                )
            )
    return privileges
