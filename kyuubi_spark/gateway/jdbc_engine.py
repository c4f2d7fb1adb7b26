"""JDBC engine — execute statements directly on a backend database,
serving the same Session/Operation surface as the Spark engine.

Counterpart of the reference's kyuubi-jdbc-engine (externals/
kyuubi-jdbc-engine/src/main/scala/org/apache/kyuubi/engine/jdbc/...):
there a gateway session whose ``kyuubi.engine.type=JDBC`` is served by an
engine that runs SQL on a java.sql.Connection instead of Spark —
``ExecuteStatement.scala:46-97`` (execute, ResultSet → Schema + fetch
iterator, update-count shape for non-queries, incremental vs full
collect), ``JdbcOperationManager`` + the metadata operations delegating
to the per-backend dialect, and per-session connections.

Python has no JDBC; the DBAPI connection is the analog.  Backends wired
here: DuckDB (rich SQL + information_schema — the generic ANSI dialect's
metadata queries run verbatim) and sqlite3.  The engine reuses the
gateway's OperationState machine and FetchIterator cursor protocol, so a
frontend can serve a JDBC-engine session with the same fetch semantics as
a Spark one — which is exactly the property the reference's shared
operation layer encodes.

Faithful behaviors worth naming:
- a statement that returns no result set surfaces the update count as a
  one-row (result INT) relation (ExecuteStatement.scala:77-88);
- incremental collect streams the cursor and therefore only supports
  FETCH_NEXT (ExecuteStatement.validateFetchOrientation);
- cancel interrupts the backend when the driver supports it
  (dialect.cancelStatement), else marks CANCELED;
- metadata operations run the dialect's SQL on the SAME connection.
"""

from __future__ import annotations

import contextvars
import threading
import traceback
from typing import Any, Callable

from kyuubi_spark.gateway.fetch import (
    ArrayFetchIterator,
    FetchIterator,
    IterableFetchIterator,
)
from kyuubi_spark.gateway.state import (
    OperationHandle,
    OperationState,
    SessionHandle,
)

# JDBC-shaped GetTypeInfo rows (TYPE_NAME, DATA_TYPE) — the static table a
# DatabaseMetaData.getTypeInfo returns for an ANSI backend
_TYPE_INFO = [
    ("BOOLEAN", 16),
    ("TINYINT", -6),
    ("SMALLINT", 5),
    ("INTEGER", 4),
    ("BIGINT", -5),
    ("FLOAT", 6),
    ("DOUBLE", 8),
    ("DECIMAL", 3),
    ("VARCHAR", 12),
    ("DATE", 91),
    ("TIMESTAMP", 93),
    ("BLOB", 2004),
]


class JdbcOperation:
    """One statement/metadata op on the session's DBAPI connection."""

    def __init__(self, session: "JdbcSession", statement: str,
                 should_run_async: bool = False, incremental: bool = False,
                 fetch_size: int = 1000, query_timeout: float = 0.0):
        self.session = session
        self.statement = statement
        self.handle = OperationHandle()
        self.state = OperationState.INITIALIZED
        self.exception: BaseException | None = None
        self.schema: list[tuple[str, str]] = []
        self.iter: FetchIterator | None = None
        self._async = should_run_async
        self._incremental = incremental
        self._fetch_size = fetch_size
        self._query_timeout = query_timeout
        self._timer: threading.Timer | None = None
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()
        self._log: list[str] = []

    # -- lifecycle --------------------------------------------------------

    def _on_timeout(self) -> None:
        """addTimeoutMonitor (JdbcOperation.scala via AbstractOperation):
        past the query timeout, flip to TIMEOUT and interrupt the
        backend."""
        with self._lock:
            if self.state.is_terminal:
                return
            self.state = OperationState.TIMEOUT
            self._log.append(
                f"query timed out after {self._query_timeout}s"
            )
        interrupt = getattr(self.session.connection, "interrupt", None)
        if callable(interrupt):
            try:
                interrupt()
            except Exception:
                pass

    def run(self) -> "JdbcOperation":
        if self._query_timeout > 0:
            self._timer = threading.Timer(self._query_timeout, self._on_timeout)
            self._timer.daemon = True
            self._timer.start()
        if self._async:
            self.state = OperationState.PENDING
            ctx = contextvars.copy_context()
            self._thread = threading.Thread(
                target=lambda: ctx.run(self._guarded), daemon=True,
                name=f"jdbc-op-{self.handle.id[:8]}",
            )
            self._thread.start()
        else:
            self._guarded()
        return self

    def wait(self, timeout: float | None = None) -> None:
        if self._thread is not None:
            self._thread.join(timeout)

    def _guarded(self) -> None:
        try:
            with self._lock:
                # a cancel()/timeout may land before the worker starts;
                # honor the terminal state instead of overwriting it
                if self.state.is_terminal:
                    return
                self.state = OperationState.RUNNING
            self._execute()
            with self._lock:
                if not self.state.is_terminal:
                    self.state = OperationState.FINISHED
        except BaseException as e:  # noqa: BLE001 - reported via status
            with self._lock:
                if not self.state.is_terminal:
                    self.exception = e
                    self._log.append(
                        "".join(
                            traceback.format_exception_only(type(e), e)
                        ).strip()
                    )
                    self.state = OperationState.ERROR
        finally:
            if self._timer is not None:
                self._timer.cancel()

    def _execute(self) -> None:
        cur = self.session.connection.cursor()
        cur.execute(self.statement)
        if cur.description is not None:
            # result set: schema from cursor description
            self.schema = [
                (d[0], self.session.engine.type_name(d)) for d in cur.description
            ]
            if self._incremental:
                # stream the live cursor — FETCH_NEXT only
                def gen():
                    while True:
                        batch = cur.fetchmany(self._fetch_size)
                        if not batch:
                            break
                        yield from batch

                self.iter = IterableFetchIterator(gen())
            else:
                self.iter = ArrayFetchIterator(cur.fetchall())
                cur.close()
        else:
            # DML/DDL: surface the update count (ExecuteStatement.scala:77)
            n = cur.rowcount if cur.rowcount is not None else -1
            self.schema = [("result", "INTEGER")]
            self.iter = ArrayFetchIterator([(n,)])
            cur.close()

    # -- fetch ------------------------------------------------------------

    def fetch(self, orientation: str = "FETCH_NEXT", max_rows: int = 100) -> list:
        if self.iter is None:
            return []
        if self._incremental and orientation != "FETCH_NEXT":
            raise ValueError(
                f"The fetch type {orientation} is not supported of "
                "incremental collect mode."
            )
        if orientation == "FETCH_FIRST":
            self.iter.fetch_absolute(0)
        elif orientation == "FETCH_PRIOR":
            self.iter.fetch_prior(max_rows)
        else:
            self.iter.fetch_next()
        return self.iter.take(max_rows)

    def cancel(self) -> None:
        with self._lock:
            if self.state.is_terminal:
                return
            self.state = OperationState.CANCELED
        interrupt = getattr(self.session.connection, "interrupt", None)
        if callable(interrupt):
            try:
                interrupt()
            except Exception:
                pass

    def close(self) -> None:
        with self._lock:
            if not self.state.is_terminal:
                self.state = OperationState.CLOSED

    @property
    def log(self) -> list[str]:
        return list(self._log)


class JdbcSession:
    """Per-session backend connection (JdbcSessionImpl.sessionConnection)."""

    def __init__(self, engine: "JdbcEngine", user: str):
        self.engine = engine
        self.user = user
        self.handle = SessionHandle()
        self.connection = engine.connect()
        self.operations: dict[str, JdbcOperation] = {}
        self._lock = threading.Lock()

    def _register(self, op: JdbcOperation) -> JdbcOperation:
        with self._lock:
            self.operations[op.handle.id] = op
        return op

    def execute_statement(
        self, statement: str, run_async: bool = False,
        incremental: bool = False, fetch_size: int = 1000,
        query_timeout: float = 0.0,
    ) -> JdbcOperation:
        op = JdbcOperation(
            self, statement, should_run_async=run_async,
            incremental=incremental, fetch_size=fetch_size,
            query_timeout=query_timeout,
        )
        op.run()
        if not run_async:
            op.wait()
        return self._register(op)

    # -- metadata operations (dialect SQL on the live connection) ---------

    def _meta(self, sql: str) -> JdbcOperation:
        return self.execute_statement(sql)

    def get_catalogs(self) -> JdbcOperation:
        return self._meta(self.engine.catalogs_query())

    def get_schemas(self, schema_pattern: str = "%") -> JdbcOperation:
        return self._meta(self.engine.schemas_query(schema_pattern))

    def get_tables(self, schema_pattern: str = "%") -> JdbcOperation:
        return self._meta(self.engine.tables_query(schema_pattern))

    def get_columns(self, table: str, schema_pattern: str = "%") -> JdbcOperation:
        return self._meta(self.engine.columns_query(table, schema_pattern))

    def get_table_types(self) -> JdbcOperation:
        return self._meta(
            "SELECT 'TABLE' AS TABLE_TYPE UNION ALL SELECT 'VIEW' ORDER BY 1"
        )

    def get_type_info(self) -> JdbcOperation:
        op = JdbcOperation(self, "<GetTypeInfo>")
        op.schema = [("TYPE_NAME", "VARCHAR"), ("DATA_TYPE", "INTEGER")]
        op.iter = ArrayFetchIterator(list(_TYPE_INFO))
        op.state = OperationState.FINISHED
        return self._register(op)

    def get_current_database(self) -> str:
        cur = self.connection.cursor()
        try:
            cur.execute(self.engine.current_database_query())
            return cur.fetchone()[0]
        finally:
            cur.close()

    def set_current_database(self, database: str) -> None:
        # ImpalaDialect.setSchema semantics: plain USE with quoting
        self.execute_statement(
            f"USE {self.engine.dialect.quote_identifier(database)}"
        )

    def close(self) -> None:
        with self._lock:
            for op in self.operations.values():
                op.close()
            self.operations.clear()
        try:
            self.connection.close()
        except Exception:
            pass


class JdbcEngine:
    """Engine over a DBAPI ``connect`` callable + a metadata dialect.

    ``JdbcEngine.duckdb()`` / ``JdbcEngine.sqlite(path)`` build the two
    in-container backends; any DBAPI connect function works.
    """

    def __init__(self, connect: Callable[[], Any], dialect=None,
                 backend: str = "generic"):
        from kyuubi_spark.sources.jdbc_dialect import JdbcDialect

        self.connect = connect
        self.dialect = dialect or JdbcDialect()
        self.backend = backend
        self.sessions: dict[str, JdbcSession] = {}
        self._lock = threading.Lock()

    # -- session management ----------------------------------------------

    def open_session(self, user: str = "anonymous") -> JdbcSession:
        s = JdbcSession(self, user)
        with self._lock:
            self.sessions[s.handle.id] = s
        return s

    def close_session(self, handle: SessionHandle) -> None:
        with self._lock:
            s = self.sessions.pop(handle.id, None)
        if s is not None:
            s.close()

    # -- backend quirks ---------------------------------------------------

    @classmethod
    def duckdb(cls, path: str = ":memory:") -> "JdbcEngine":
        import duckdb

        con = duckdb.connect(path)
        # every "session connection" is a cursor over one embedded database
        # (same pattern as the reference's connection-per-session over one
        # backend); duckdb cursors are independent connections sharing the
        # database
        return cls(connect=con.cursor, backend="duckdb")

    @classmethod
    def sqlite(cls, path: str = ":memory:") -> "JdbcEngine":
        import sqlite3

        return cls(
            connect=lambda: sqlite3.connect(path, check_same_thread=False),
            backend="sqlite",
        )

    def type_name(self, description_entry: tuple) -> str:
        """Column type name from a DBAPI cursor.description entry."""
        t = description_entry[1]
        return str(t) if t is not None else "VARCHAR"

    def catalogs_query(self) -> str:
        if self.backend == "duckdb":
            return (
                "SELECT DISTINCT catalog_name AS TABLE_CAT "
                "FROM information_schema.schemata ORDER BY 1"
            )
        return "SELECT NULL AS TABLE_CAT WHERE 1 = 0"

    def schemas_query(self, schema_pattern: str = "%") -> str:
        from kyuubi_spark.sources.jdbc_dialect import sql_literal

        if self.backend == "duckdb":
            return (
                "SELECT schema_name AS TABLE_SCHEM, catalog_name AS TABLE_CAT "
                "FROM information_schema.schemata "
                f"WHERE schema_name LIKE '{sql_literal(schema_pattern)}' "
                "ORDER BY 1"
            )
        return (
            "SELECT 'main' AS TABLE_SCHEM, NULL AS TABLE_CAT "
            f"WHERE 'main' LIKE '{sql_literal(schema_pattern)}'"
        )

    def current_database_query(self) -> str:
        if self.backend == "duckdb":
            return "SELECT current_database()"
        return "SELECT 'main'"

    def tables_query(self, schema_pattern: str = "%") -> str:
        """Dialect metadata SQL; sqlite (no information_schema) reads
        sqlite_master — the same per-backend split the reference's
        dialects encode."""
        if self.backend == "sqlite":
            return (
                "SELECT NULL AS TABLE_CAT, 'main' AS TABLE_SCHEM, "
                "name AS TABLE_NAME, UPPER(type) AS TABLE_TYPE "
                "FROM sqlite_master WHERE type IN ('table', 'view') "
                "ORDER BY name"
            )
        return self.dialect.tables_query(schema_pattern)

    def columns_query(self, table: str, schema_pattern: str = "%") -> str:
        from kyuubi_spark.sources.jdbc_dialect import sql_literal

        if self.backend == "sqlite":
            t = sql_literal(table)
            return (
                f"SELECT 'main' AS TABLE_SCHEM, '{t}' AS TABLE_NAME, "
                "name AS COLUMN_NAME, type AS TYPE_NAME, "
                "cid + 1 AS ORDINAL_POSITION "
                f"FROM pragma_table_info('{t}') ORDER BY cid"
            )
        return self.dialect.columns_query(table, schema_pattern)
