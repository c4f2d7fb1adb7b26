"""PEP 249 (DBAPI 2.0) driver over the gateway's thrift frontend.

The reference ships a full Java JDBC driver (kyuubi-hive-jdbc,
``KyuubiConnection``/``KyuubiStatement``/``KyuubiResultSet``) plus a
Python client; its JVM driver is out of scope here (survey-sanctioned),
and THIS module is the Python-first equivalent: the standard DBAPI
surface every Python SQL tool (pandas ``read_sql``, SQLAlchemy's
generic driver support, plain scripts) expects.

    import kyuubi_spark.client.dbapi as db
    conn = db.connect(host, port, user="alice", password="...",
                      cafile="server-cert.pem")
    cur = conn.cursor()
    cur.execute("SELECT %s * 2 AS v", (21,))
    print(cur.fetchall())   # [(42,)]

Implemented per PEP 249: module globals (``apilevel`` "2.0",
``threadsafety`` 1, ``paramstyle`` "pyformat" — ``%s`` positional and
``%(name)s`` named), ``connect()``, Connection (commit/rollback no-ops —
the engine autocommits like Hive/Spark SQL; close; cursor; context
manager), Cursor (description with PEP 249 7-tuples, rowcount,
execute/executemany with client-side literal binding, fetchone/
fetchmany/fetchall, arraysize, iteration, context manager), and the
exception hierarchy rooted at ``Error``.

Parameter binding is CLIENT-SIDE literal substitution with full quote
escaping (the HS2 wire has no server-side prepared statements — the
reference's JDBC driver substitutes exactly the same way).
"""

from __future__ import annotations

import datetime
import threading
from collections import deque
from typing import Any, Iterable, Sequence

apilevel = "2.0"
threadsafety = 1  # threads may share the module, not connections
paramstyle = "pyformat"


# -- PEP 249 exception hierarchy ---------------------------------------------


class Error(Exception):
    pass


class Warning(Exception):  # noqa: A001 - PEP 249 names it Warning
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    pass


class DataError(DatabaseError):
    pass


class OperationalError(DatabaseError):
    pass


class IntegrityError(DatabaseError):
    pass


class InternalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    pass


class NotSupportedError(DatabaseError):
    pass


# -- type objects & constructors (PEP 249 §Type Objects) ----------------------


class DBAPITypeObject:
    def __init__(self, *type_ids: int):
        self.type_ids = frozenset(type_ids)

    def __eq__(self, other):  # so `description[i][1] == STRING` works
        return other in self.type_ids or other is self

    def __hash__(self):
        return hash(self.type_ids)


# HS2 TTypeId values (TCLIService.thrift TTypeId enum)
STRING = DBAPITypeObject(7, 12, 17)  # STRING/VARCHAR/CHAR
BINARY = DBAPITypeObject(9)
NUMBER = DBAPITypeObject(0, 1, 2, 3, 4, 5, 6, 15)  # bool..double, decimal
DATETIME = DBAPITypeObject(8, 16)  # TIMESTAMP, DATE
ROWID = DBAPITypeObject()

Date = datetime.date
Time = datetime.time
Timestamp = datetime.datetime


def DateFromTicks(t):  # noqa: N802 - PEP 249 names
    return datetime.date.fromtimestamp(t)


def TimeFromTicks(t):  # noqa: N802
    return datetime.datetime.fromtimestamp(t).time()


def TimestampFromTicks(t):  # noqa: N802
    return datetime.datetime.fromtimestamp(t)


def Binary(b):  # noqa: N802
    return bytes(b)


# -- literal binding ----------------------------------------------------------


def _literal(value: Any) -> str:
    """Render a Python value as a Spark SQL literal (KyuubiStatement-style
    client-side substitution; quotes escaped so values can't break out)."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    if isinstance(value, datetime.datetime):
        return f"TIMESTAMP '{value.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(value, datetime.date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, (bytes, bytearray)):
        return f"X'{bytes(value).hex()}'"
    if isinstance(value, (list, tuple)):
        return "ARRAY(" + ", ".join(_literal(v) for v in value) + ")"
    s = str(value).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def _bind(operation: str, parameters) -> str:
    if parameters is None:
        return operation
    if isinstance(parameters, dict):
        return operation % {k: _literal(v) for k, v in parameters.items()}
    return operation % tuple(_literal(v) for v in parameters)


# -- connection / cursor ------------------------------------------------------


def connect(
    host: str = "127.0.0.1",
    port: int = 10009,
    user: str = "anonymous",
    password: str | None = None,
    conf: dict | None = None,
    cafile: str | None = None,
    ssl_context=None,
    discovery: str | None = None,
    discovery_namespace: str | None = None,
) -> "Connection":
    """Open a DBAPI connection to a thrift-binary gateway frontend.

    ``password`` switches the socket to SASL/PLAIN; ``cafile``/
    ``ssl_context`` wrap it in TLS first (gateway/tls.py).

    ``discovery`` (a registry file path) switches to HA service
    discovery: host/port are ignored, the live server list is resolved
    from the registry's server namespace, and connect fails over across
    candidates (the reference's serviceDiscoveryMode=zooKeeper JDBC
    behavior — client/ha.py)."""
    if discovery is not None:
        from kyuubi_spark.client import ha

        kwargs = dict(
            user=user, password=password, conf=conf, cafile=cafile,
            ssl_context=ssl_context,
        )
        if discovery_namespace:
            return ha.connect_ha(
                discovery, namespace=discovery_namespace, **kwargs
            )
        return ha.connect_ha(discovery, **kwargs)
    return Connection(host, port, user, password, conf, cafile, ssl_context)


class Connection:
    def __init__(self, host, port, user, password, conf, cafile, ssl_context):
        from kyuubi_spark.gateway.thrift import ThriftClient

        try:
            self._client = ThriftClient(
                host,
                port,
                user=user if password is not None else None,
                password=password if password is not None else "anonymous",
                cafile=cafile,
                ssl_context=ssl_context,
            )
            self._client.open_session(user=user, conf=conf)
        except Exception as e:
            raise OperationalError(f"connect failed: {e}") from e
        self._lock = threading.Lock()
        self._closed = False

    # PEP 249: commit/rollback — the engine autocommits (Spark SQL has no
    # client transaction scope; the JDBC driver's setAutoCommit(false)
    # throws the same way rollback does here)
    def commit(self) -> None:
        self._check_open()

    def rollback(self) -> None:
        raise NotSupportedError("the engine autocommits; no rollback")

    def cursor(self) -> "Cursor":
        self._check_open()
        return Cursor(self)

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        try:
            self._client.close_session()
        except Exception:
            pass
        self._client.close()

    def _check_open(self) -> None:
        if self._closed:
            raise InterfaceError("connection is closed")

    def __enter__(self) -> "Connection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


# TTypeId -> (display name, python converter or None)
_TYPE_NAMES = {
    0: "boolean", 1: "tinyint", 2: "smallint", 3: "int", 4: "bigint",
    5: "float", 6: "double", 7: "string", 8: "timestamp", 9: "binary",
    10: "array", 11: "map", 12: "struct", 15: "decimal", 16: "null",
    17: "date", 18: "varchar",
}


class Cursor:
    arraysize = 1

    def __init__(self, conn: Connection):
        self._conn = conn
        self._op: bytes | None = None
        self.description: list[tuple] | None = None
        self.rowcount = -1
        # deque: fetchone drains from the FRONT — popleft keeps
        # row-at-a-time iteration O(n) over large results
        self._buffer: deque[tuple] = deque()
        self._exhausted = True
        self._closed = False

    # -- execution --------------------------------------------------------

    def execute(self, operation: str, parameters=None) -> "Cursor":
        self._check()
        sql = _bind(operation, parameters)
        client = self._conn._client
        with self._conn._lock:
            self._finish_op()
            try:
                self._op = client.execute(sql)
            except RuntimeError as e:
                raise ProgrammingError(str(e)) from e
            try:
                schema = client.result_schema(self._op)
            except RuntimeError:
                schema = []  # DDL/DML: no result set
        self.description = (
            [
                (name, tid, None, None, None, None, None)
                for name, tid in schema
            ]
            or None
        )
        self._buffer = deque()
        self._exhausted = False if schema else True
        self.rowcount = -1
        return self

    def executemany(self, operation: str, seq_of_parameters: Iterable) -> None:
        for parameters in seq_of_parameters:
            self.execute(operation, parameters)

    # -- fetch ------------------------------------------------------------

    def _fill(self, want: int) -> None:
        client = self._conn._client
        while not self._exhausted and len(self._buffer) < want:
            with self._conn._lock:
                batch = client.fetch(self._op, max_rows=max(want, 1000))
            if not batch:
                self._exhausted = True
                break
            self._buffer.extend(tuple(r) for r in batch)

    def fetchone(self) -> tuple | None:
        self._check_result()
        self._fill(1)
        return self._buffer.popleft() if self._buffer else None

    def fetchmany(self, size: int | None = None) -> list[tuple]:
        self._check_result()
        n = size if size is not None else self.arraysize
        self._fill(n)
        out = [self._buffer.popleft() for _ in range(min(n, len(self._buffer)))]
        return out

    def fetchall(self) -> list[tuple]:
        self._check_result()
        self._fill(1 << 62)
        out, self._buffer = list(self._buffer), deque()
        return out

    def __iter__(self):
        return self

    def __next__(self) -> tuple:
        row = self.fetchone()
        if row is None:
            raise StopIteration
        return row

    # -- misc PEP 249 -----------------------------------------------------

    def setinputsizes(self, sizes: Sequence) -> None:
        pass

    def setoutputsize(self, size: int, column: int | None = None) -> None:
        pass

    def close(self) -> None:
        if self._closed:
            return
        with self._conn._lock:
            self._finish_op()
        self._closed = True

    def _finish_op(self) -> None:
        if self._op is not None:
            try:
                self._conn._client.close_operation(self._op)
            except Exception:
                pass
            self._op = None

    def _check(self) -> None:
        if self._closed:
            raise InterfaceError("cursor is closed")
        self._conn._check_open()

    def _check_result(self) -> None:
        self._check()
        if self._op is None or self.description is None:
            raise ProgrammingError("no result set (call execute first)")

    def __enter__(self) -> "Cursor":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
