"""Server-side gateway services: connection limits, conf advisor,
metadata store, and the server SQL DSL.

Counterparts in the reference:
- SessionLimiter (kyuubi-server/.../session/SessionLimiter.scala:27-105,
  SessionLimiterWithAccessControlListImpl :107-146): per-user / per-ip /
  per-user:ip connection counters with unlimited- and deny-lists.
- FileSessionConfAdvisor (kyuubi-server/.../session/
  FileSessionConfAdvisor.scala:32-48): `kyuubi.session.conf.profile` names
  profile files `kyuubi-session-<profile>.conf` whose props overlay the
  session conf, cached with a reload interval.
- MetadataManager / JDBC metadata store (kyuubi-server/.../server/metadata/
  MetadataManager.scala, api/Metadata.scala:58-84): durable session/batch
  records for recovery after a gateway restart. We use sqlite (stdlib).
- Server DSL (kyuubi-server/src/main/antlr4/.../KyuubiSqlBaseParser.g4:22-34;
  sql/plan/command/DescribeSession.scala, DescribeEngine.scala): statements
  `KYUUBI DESC|DESCRIBE SESSION|ENGINE` answered by the gateway itself,
  never reaching the engine.
- DropIgnoreNonexistent (extensions/.../sql/DropIgnoreNonexistent.scala:
  30-55): under `spark.sql.optimizer.dropIgnoreNonExistent`, DROP
  TABLE/VIEW/NAMESPACE/DATABASE/FUNCTION without IF EXISTS become no-fail.
  The reference rewrites Catalyst command nodes; we rewrite the SQL text in
  the gateway (SURVEY.md §2.F maps it to a gateway rewrite), which reaches
  the same user-visible semantics through the public SQL surface.
"""

from __future__ import annotations

import json
import re
import sqlite3
import threading
import time
from pathlib import Path
from typing import Any


class SessionLimitExceeded(RuntimeError):
    pass


class SessionLimiter:
    """Connection counters keyed by user, ip, and user:ip.

    A limit of 0 disables that dimension (reference defaults). `increment`
    raises and rolls back if any enabled limit would be exceeded; deny
    lists reject outright; unlimited users skip the counters but still hit
    the deny lists — same precedence as the reference
    (SessionLimiterWithAccessControlListImpl.increment).
    """

    def __init__(
        self,
        user_limit: int = 0,
        ip_limit: int = 0,
        user_ip_limit: int = 0,
        unlimited_users: set[str] | None = None,
        deny_users: set[str] | None = None,
        deny_ips: set[str] | None = None,
    ):
        self.user_limit = user_limit
        self.ip_limit = ip_limit
        self.user_ip_limit = user_ip_limit
        self.unlimited_users = set(unlimited_users or ())
        self.deny_users = set(deny_users or ())
        self.deny_ips = set(deny_ips or ())
        self._counters: dict[str, int] = {}
        self._lock = threading.Lock()

    def _keys(self, user: str, ip: str) -> list[tuple[str, int, str]]:
        out = []
        if self.user_ip_limit > 0 and user and ip:
            out.append((
                f"{user}:{ip}", self.user_ip_limit,
                f"Connection limit per user:ipaddress reached "
                f"(user:ipaddress: {user}:{ip} limit: {self.user_ip_limit})",
            ))
        if self.user_limit > 0 and user:
            out.append((
                user, self.user_limit,
                f"Connection limit per user reached (user: {user} limit: {self.user_limit})",
            ))
        if self.ip_limit > 0 and ip:
            out.append((
                ip, self.ip_limit,
                f"Connection limit per ipaddress reached "
                f"(ipaddress: {ip} limit: {self.ip_limit})",
            ))
        return out

    def increment(self, user: str, ip: str = "") -> None:
        if user and user in self.deny_users:
            raise SessionLimitExceeded(
                f"Connection denied because the user is in the deny user list. (user: {user})"
            )
        if ip and ip in self.deny_ips:
            raise SessionLimitExceeded(
                f"Connection denied because the client ip is in the deny ip list. "
                f"(ipAddress: {ip})"
            )
        if user in self.unlimited_users:
            return
        with self._lock:
            taken: list[str] = []
            for key, limit, msg in self._keys(user, ip):
                if self._counters.get(key, 0) + 1 > limit:
                    for k in taken:  # roll back partial increments
                        self._counters[k] -= 1
                    raise SessionLimitExceeded(msg)
                self._counters[key] = self._counters.get(key, 0) + 1
                taken.append(key)

    def decrement(self, user: str, ip: str = "") -> None:
        if user in self.unlimited_users:
            return
        with self._lock:
            for key, _, _ in self._keys(user, ip):
                if self._counters.get(key, 0) > 0:
                    self._counters[key] -= 1


class FileSessionConfAdvisor:
    """Overlay session conf from profile files.

    `kyuubi.session.conf.profile=a,b` loads `<conf_dir>/kyuubi-session-a.conf`
    then `-b.conf` (later wins), `key=value` lines, `#` comments. Files are
    cached and re-read after `reload_interval` seconds
    (FileSessionConfAdvisor.scala:50-69 uses an expire-after-write cache).
    """

    PROFILE_KEY = "kyuubi.session.conf.profile"

    def __init__(self, conf_dir: str | Path, reload_interval: float = 600.0):
        self.conf_dir = Path(conf_dir)
        self.reload_interval = reload_interval
        self._cache: dict[str, tuple[float, dict[str, str]]] = {}
        self._lock = threading.Lock()

    def _load(self, profile: str) -> dict[str, str]:
        now = time.time()
        with self._lock:
            hit = self._cache.get(profile)
            if hit and now - hit[0] < self.reload_interval:
                return hit[1]
        path = self.conf_dir / f"kyuubi-session-{profile}.conf"
        props: dict[str, str] = {}
        if path.is_file():
            for line in path.read_text().splitlines():
                line = line.strip()
                if not line or line.startswith("#") or "=" not in line:
                    continue
                k, _, v = line.partition("=")
                props[k.strip()] = v.strip()
        with self._lock:
            self._cache[profile] = (now, props)
        return props

    def get_conf_overlay(self, user: str, session_conf: dict[str, Any]) -> dict[str, str]:
        profiles = str(session_conf.get(self.PROFILE_KEY) or "")
        overlay: dict[str, str] = {}
        for profile in (p.strip() for p in profiles.split(",")):
            if profile:
                overlay.update(self._load(profile))
        return overlay


class MetadataStore:
    """Durable session/batch records in sqlite (the reference's JDBC
    metadata store, api/Metadata.scala:58-84 — we persist the subset our
    gateway uses: identity, user/ip, state, request, engine app info,
    timestamps). Enables listing and recovery across gateway restarts."""

    _DDL = """
    CREATE TABLE IF NOT EXISTS metadata (
        identifier TEXT PRIMARY KEY,
        session_type TEXT,
        real_user TEXT,
        ip_address TEXT,
        state TEXT,
        request_name TEXT,
        request_conf TEXT,
        request_args TEXT,
        create_time REAL,
        engine_id TEXT,
        engine_state TEXT,
        engine_error TEXT,
        end_time REAL
    )
    """

    def __init__(self, path: str | Path = ":memory:"):
        self._path = str(path)
        self._lock = threading.Lock()
        self._conn = sqlite3.connect(self._path, check_same_thread=False)
        self._conn.execute(self._DDL)
        self._conn.commit()

    def insert(
        self,
        identifier: str,
        session_type: str,
        real_user: str,
        ip_address: str = "",
        state: str = "INITIALIZED",
        request_name: str = "",
        request_conf: dict | None = None,
        request_args: list | None = None,
    ) -> None:
        with self._lock:
            self._conn.execute(
                "INSERT OR REPLACE INTO metadata (identifier, session_type, real_user,"
                " ip_address, state, request_name, request_conf, request_args,"
                " create_time, end_time) VALUES (?,?,?,?,?,?,?,?,?,0)",
                (
                    identifier, session_type, real_user, ip_address, state,
                    request_name, json.dumps(request_conf or {}),
                    json.dumps(request_args or []), time.time(),
                ),
            )
            self._conn.commit()

    def update_state(
        self,
        identifier: str,
        state: str,
        engine_id: str | None = None,
        engine_state: str | None = None,
        engine_error: str | None = None,
        ended: bool = False,
    ) -> None:
        sets, vals = ["state = ?"], [state]
        if engine_id is not None:
            sets.append("engine_id = ?"); vals.append(engine_id)
        if engine_state is not None:
            sets.append("engine_state = ?"); vals.append(engine_state)
        if engine_error is not None:
            sets.append("engine_error = ?"); vals.append(engine_error)
        if ended:
            sets.append("end_time = ?"); vals.append(time.time())
        vals.append(identifier)
        with self._lock:
            self._conn.execute(
                f"UPDATE metadata SET {', '.join(sets)} WHERE identifier = ?", vals
            )
            self._conn.commit()

    def get(self, identifier: str) -> dict | None:
        with self._lock:
            cur = self._conn.execute(
                "SELECT * FROM metadata WHERE identifier = ?", (identifier,)
            )
            row = cur.fetchone()
            cols = [d[0] for d in cur.description]
        if row is None:
            return None
        rec = dict(zip(cols, row))
        rec["request_conf"] = json.loads(rec["request_conf"] or "{}")
        rec["request_args"] = json.loads(rec["request_args"] or "[]")
        return rec

    def list(self, session_type: str | None = None, state: str | None = None) -> list[dict]:
        q, vals = "SELECT identifier FROM metadata", []
        conds = []
        if session_type:
            conds.append("session_type = ?"); vals.append(session_type)
        if state:
            conds.append("state = ?"); vals.append(state)
        if conds:
            q += " WHERE " + " AND ".join(conds)
        with self._lock:
            ids = [r[0] for r in self._conn.execute(q + " ORDER BY create_time", vals)]
        return [self.get(i) for i in ids]

    def unfinished(self, session_type: str = "BATCH") -> list[dict]:
        """Records to recover after a restart (MetadataManager picks
        non-terminal batches back up)."""
        terminal = ("FINISHED", "ERROR", "CANCELED", "CLOSED")
        return [
            r for r in self.list(session_type=session_type)
            if r["state"] not in terminal
        ]

    def close(self) -> None:
        with self._lock:
            self._conn.close()


# -- server SQL DSL ---------------------------------------------------------

_KYUUBI_DESC_RE = re.compile(
    r"^\s*kyuubi\s+desc(?:ribe)?\s+(session|engine)\s*;?\s*$", re.IGNORECASE
)

# Also accept the bare `[DESC|DESCRIBE] SESSION|ENGINE` form documented on
# DescribeSession.scala:33-36 ("{{{ [DESC|DESCRIBE] SESSION; }}}").
_BARE_DESC_RE = re.compile(
    r"^\s*desc(?:ribe)?\s+(session|engine)\s*;?\s*$", re.IGNORECASE
)


def parse_server_dsl(statement: str) -> str | None:
    """Return 'session' | 'engine' if the statement is a server DSL
    describe command, else None."""
    m = _KYUUBI_DESC_RE.match(statement) or _BARE_DESC_RE.match(statement)
    return m.group(1).lower() if m else None


# DROP <object> [IF EXISTS] name — insert IF EXISTS when missing. TEMPORARY
# and PARTITION forms included; anything unrecognized passes through.
_DROP_RE = re.compile(
    r"^(\s*drop\s+(?:temporary\s+)?"
    r"(?:table|view|namespace|database|schema|function))"
    r"(\s+if\s+exists)?(\s+)",
    re.IGNORECASE,
)


def drop_ignore_nonexistent(statement: str) -> str:
    """Rewrite DROP … → DROP … IF EXISTS … (DropIgnoreNonexistent.scala:30-55)."""
    m = _DROP_RE.match(statement)
    if m and not m.group(2):
        return f"{m.group(1)} IF EXISTS{m.group(3)}{statement[m.end():]}"
    return statement
