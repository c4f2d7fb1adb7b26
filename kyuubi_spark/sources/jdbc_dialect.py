"""Per-database JDBC dialect adapters (Spark-first re-expression).

The reference's JDBC engine ships one dialect class per backend
(externals/kyuubi-jdbc-engine/src/main/scala/org/apache/kyuubi/engine/
jdbc/dialect/*.scala — PostgreSQL/MySQL/Doris/ClickHouse/Phoenix/Oracle/
Impala/StarRocks) encapsulating three things:

1. statement/fetch quirks (``JdbcDialect.createStatement`` — e.g. MySQL
   streams only with fetchSize=Integer.MIN_VALUE, PostgreSQL only with
   autocommit off);
2. catalog-vs-schema term semantics (``MySQLDialect.setSchema/setCatalog``
   write BOTH because Connector/J treats them as one "database" term);
3. metadata retrieval (GetTables/GetColumns either via DatabaseMetaData
   or hand-written information_schema/system-table SQL).

On Spark the execution path is ``spark.read.jdbc`` (the JVM driver
handles type mapping and pushdown), so a dialect here reduces to: the
reader/writer options that make the backend behave, identifier quoting,
and the metadata SQL to run through the JDBC ``query`` option.  The
shapes mirror the reference 1:1 so the gateway's GetTables/GetColumns can
serve a JDBC-backed catalog with the same rows a Kyuubi JDBC engine
would.

Tested end-to-end against embedded Derby (the one backend inside the
Spark distribution): tests/test_jdbc_roundtrip.py lists tables/columns
through DerbyDialect's system-table SQL via a real Spark JDBC scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def sql_literal(value: str) -> str:
    """Escape a string for embedding in a single-quoted SQL literal.

    The reference binds metadata patterns via PreparedStatement parameters
    (JdbcDialect.scala forwards to DatabaseMetaData, which parameterizes);
    our Spark-first path ships the metadata SQL through the JDBC ``query``
    reader option, so the operands the gateway's GetTables/GetColumns
    receive from CLIENTS must be escaped before interpolation — both to
    stop SQL injection through a crafted schema/table pattern and to keep
    benign quote-bearing identifiers (O'Brien) from breaking the query.
    Doubling the quote is the portable ANSI escape (works on every dialect
    here, incl. MySQL-family which also accepts it).
    """
    return value.replace("'", "''")


@dataclass(frozen=True)
class JdbcDialect:
    """Base dialect: ANSI double-quote identifiers, information_schema
    metadata, no special reader/writer options (JdbcDialect.scala)."""

    name: str = "generic"
    url_prefixes: tuple = ()
    quote_char: str = '"'
    # catalog and schema are distinct namespaces (PostgreSQL-style); MySQL
    # family collapses them to one "database" term
    database_term_merged: bool = False

    def quote_identifier(self, ident: str) -> str:
        q = self.quote_char
        return f"{q}{ident.replace(q, q + q)}{q}"

    def reader_options(self, fetchsize: int = 10_000) -> dict:
        return {"fetchsize": str(fetchsize)}

    def writer_options(self, batchsize: int = 10_000) -> dict:
        return {"batchsize": str(batchsize)}

    # --- metadata SQL (GetTables/GetColumns shapes, JDBC-metadata rows) ---

    def tables_query(self, schema_pattern: str = "%") -> str:
        return (
            "SELECT table_catalog AS TABLE_CAT, table_schema AS TABLE_SCHEM, "
            "table_name AS TABLE_NAME, table_type AS TABLE_TYPE "
            "FROM information_schema.tables "
            f"WHERE table_schema LIKE '{sql_literal(schema_pattern)}'"
        )

    def columns_query(self, table: str, schema_pattern: str = "%") -> str:
        return (
            "SELECT table_schema AS TABLE_SCHEM, table_name AS TABLE_NAME, "
            "column_name AS COLUMN_NAME, data_type AS TYPE_NAME, "
            "ordinal_position AS ORDINAL_POSITION "
            "FROM information_schema.columns "
            f"WHERE table_name = '{sql_literal(table)}' "
            f"AND table_schema LIKE '{sql_literal(schema_pattern)}'"
        )


@dataclass(frozen=True)
class PostgreSQLDialect(JdbcDialect):
    """PostgreSQLDialect.scala: fetchSize only streams with autocommit off
    (the reference only sets it when getAutoCommit is true for the same
    reason); catalog == database, schema is the real namespace."""

    name: str = "postgresql"
    url_prefixes: tuple = ("jdbc:postgresql:",)

    def reader_options(self, fetchsize: int = 10_000) -> dict:
        # Spark's JDBC source runs with autocommit disabled on the read
        # path, so fetchsize is honored; prepareThreshold=0 avoids
        # server-side prepared-statement surprises on pooled gateways
        return {"fetchsize": str(fetchsize), "prepareThreshold": "0"}


@dataclass(frozen=True)
class MySQLDialect(JdbcDialect):
    """MySQLDialect.scala: backtick quoting; catalog/schema are one
    'database' term (setSchema/setCatalog both write it); row streaming
    needs fetchSize=Integer.MIN_VALUE on Connector/J. Inherited by
    Doris/StarRocks in the reference."""

    name: str = "mysql"
    url_prefixes: tuple = ("jdbc:mysql:", "jdbc:mariadb:")
    quote_char: str = "`"
    database_term_merged: bool = True

    def reader_options(self, fetchsize: int = 10_000) -> dict:
        # Connector/J ignores positive fetch sizes (all-rows buffering)
        # unless useCursorFetch=true; with it, fetchsize batches normally
        return {"fetchsize": str(fetchsize), "useCursorFetch": "true"}

    def tables_query(self, schema_pattern: str = "%") -> str:
        return (
            "SELECT table_schema AS TABLE_CAT, NULL AS TABLE_SCHEM, "
            "table_name AS TABLE_NAME, table_type AS TABLE_TYPE "
            "FROM information_schema.tables "
            f"WHERE table_schema LIKE '{sql_literal(schema_pattern)}'"
        )


@dataclass(frozen=True)
class DorisDialect(MySQLDialect):
    """DorisDialect.scala extends the MySQL wire dialect."""

    name: str = "doris"
    url_prefixes: tuple = ("jdbc:doris:",)


@dataclass(frozen=True)
class ClickHouseDialect(JdbcDialect):
    """ClickHouseDialect.scala: single-level namespace (database only),
    system.tables metadata."""

    name: str = "clickhouse"
    url_prefixes: tuple = ("jdbc:clickhouse:", "jdbc:ch:")
    quote_char: str = "`"
    database_term_merged: bool = True

    def tables_query(self, schema_pattern: str = "%") -> str:
        return (
            "SELECT database AS TABLE_CAT, NULL AS TABLE_SCHEM, "
            "name AS TABLE_NAME, "
            "if(engine LIKE '%View', 'VIEW', 'TABLE') AS TABLE_TYPE "
            f"FROM system.tables WHERE database LIKE '{sql_literal(schema_pattern)}'"
        )

    def columns_query(self, table: str, schema_pattern: str = "%") -> str:
        return (
            "SELECT database AS TABLE_SCHEM, table AS TABLE_NAME, "
            "name AS COLUMN_NAME, type AS TYPE_NAME, "
            "position AS ORDINAL_POSITION "
            f"FROM system.columns WHERE table = '{sql_literal(table)}' "
            f"AND database LIKE '{sql_literal(schema_pattern)}'"
        )


@dataclass(frozen=True)
class DerbyDialect(JdbcDialect):
    """Embedded Derby (the backend the test suite can actually run):
    metadata lives in SYS.* system tables, not information_schema."""

    name: str = "derby"
    url_prefixes: tuple = ("jdbc:derby:",)

    def tables_query(self, schema_pattern: str = "%") -> str:
        return (
            "SELECT CAST(NULL AS VARCHAR(128)) AS TABLE_CAT, "
            "s.SCHEMANAME AS TABLE_SCHEM, "
            "t.TABLENAME AS TABLE_NAME, "
            # TRIM: Derby types a CASE of char literals as CHAR padded to
            # the longest branch ('TABLE       ' otherwise)
            "TRIM(CASE t.TABLETYPE WHEN 'T' THEN 'TABLE' "
            "WHEN 'V' THEN 'VIEW' ELSE 'SYSTEM TABLE' END) AS TABLE_TYPE "
            "FROM SYS.SYSTABLES t JOIN SYS.SYSSCHEMAS s "
            "ON t.SCHEMAID = s.SCHEMAID "
            f"WHERE s.SCHEMANAME LIKE '{sql_literal(schema_pattern)}'"
        )

    def columns_query(self, table: str, schema_pattern: str = "%") -> str:
        return (
            "SELECT s.SCHEMANAME AS TABLE_SCHEM, t.TABLENAME AS TABLE_NAME, "
            "c.COLUMNNAME AS COLUMN_NAME, "
            "CAST(c.COLUMNDATATYPE AS VARCHAR(128)) AS TYPE_NAME, "
            "c.COLUMNNUMBER AS ORDINAL_POSITION "
            "FROM SYS.SYSCOLUMNS c "
            "JOIN SYS.SYSTABLES t ON c.REFERENCEID = t.TABLEID "
            "JOIN SYS.SYSSCHEMAS s ON t.SCHEMAID = s.SCHEMAID "
            f"WHERE t.TABLENAME = '{sql_literal(table)}' "
            f"AND s.SCHEMANAME LIKE '{sql_literal(schema_pattern)}'"
        )


@dataclass(frozen=True)
class StarRocksDialect(MySQLDialect):
    """StarRocksDialect.scala extends the MySQL wire dialect (same
    backtick quoting, merged database term, information_schema)."""

    name: str = "starrocks"
    url_prefixes: tuple = ("jdbc:starrocks:",)


@dataclass(frozen=True)
class OracleSQLDialect(JdbcDialect):
    """OracleSQLDialect.scala: fetchSize set only under autocommit (the
    driver otherwise buffers); no catalogs — TABLE_CAT is NULL and the
    OWNER is the schema.  Metadata via ALL_TABLES/ALL_TAB_COLUMNS (the
    SELECT-able mirror of what DatabaseMetaData reads)."""

    name: str = "oracle"
    url_prefixes: tuple = ("jdbc:oracle:",)

    def tables_query(self, schema_pattern: str = "%") -> str:
        return (
            "SELECT NULL AS TABLE_CAT, t.OWNER AS TABLE_SCHEM, "
            "t.TABLE_NAME AS TABLE_NAME, 'TABLE' AS TABLE_TYPE "
            "FROM ALL_TABLES t "
            f"WHERE t.OWNER LIKE '{sql_literal(schema_pattern)}' "
            "UNION ALL "
            "SELECT NULL, v.OWNER, v.VIEW_NAME, 'VIEW' FROM ALL_VIEWS v "
            f"WHERE v.OWNER LIKE '{sql_literal(schema_pattern)}'"
        )

    def columns_query(self, table: str, schema_pattern: str = "%") -> str:
        return (
            "SELECT c.OWNER AS TABLE_SCHEM, c.TABLE_NAME AS TABLE_NAME, "
            "c.COLUMN_NAME AS COLUMN_NAME, c.DATA_TYPE AS TYPE_NAME, "
            "c.COLUMN_ID AS ORDINAL_POSITION "
            "FROM ALL_TAB_COLUMNS c "
            f"WHERE c.TABLE_NAME = '{sql_literal(table)}' "
            f"AND c.OWNER LIKE '{sql_literal(schema_pattern)}'"
        )


@dataclass(frozen=True)
class PhoenixDialect(JdbcDialect):
    """PhoenixDialect.scala: HBase-backed; metadata lives in the
    SYSTEM.CATALOG Phoenix system table (TABLE_TYPE codes: u=user table,
    v=view, s=system).  Phoenix upper-cases unquoted identifiers, ANSI
    double-quote to preserve case."""

    name: str = "phoenix"
    url_prefixes: tuple = ("jdbc:phoenix:",)

    def tables_query(self, schema_pattern: str = "%") -> str:
        return (
            "SELECT NULL AS TABLE_CAT, TABLE_SCHEM, TABLE_NAME, "
            "CASE TABLE_TYPE WHEN 'u' THEN 'TABLE' WHEN 'v' THEN 'VIEW' "
            "ELSE 'SYSTEM TABLE' END AS TABLE_TYPE "
            "FROM SYSTEM.\"CATALOG\" "
            "WHERE COLUMN_NAME IS NULL AND COLUMN_FAMILY IS NULL "
            f"AND TABLE_SCHEM LIKE '{sql_literal(schema_pattern)}'"
        )

    def columns_query(self, table: str, schema_pattern: str = "%") -> str:
        return (
            "SELECT TABLE_SCHEM, TABLE_NAME, COLUMN_NAME, "
            "DATA_TYPE AS TYPE_NAME, ORDINAL_POSITION "
            "FROM SYSTEM.\"CATALOG\" "
            "WHERE COLUMN_NAME IS NOT NULL "
            f"AND TABLE_NAME = '{sql_literal(table)}' "
            f"AND TABLE_SCHEM LIKE '{sql_literal(schema_pattern)}'"
        )


@dataclass(frozen=True)
class ImpalaDialect(JdbcDialect):
    """ImpalaDialect.scala: Impalad rejects the Hive driver's private
    set/get-current-database session confs, so the reference issues plain
    ``USE `db``` / ``SELECT current_database()`` SQL (ImpalaDialect.scala:
    setSchema/getCurrentSchema, backtick-escaped exactly as here).  Impala
    has no SELECT-able information_schema, so table/column metadata goes
    through SHOW/DESCRIBE statements rather than the JDBC ``query``
    option — exposed as statement builders the gateway can run through a
    plain statement path."""

    name: str = "impala"
    url_prefixes: tuple = ("jdbc:impala:",)
    quote_char: str = "`"
    database_term_merged: bool = True
    metadata_via_show: bool = True

    def use_statement(self, schema: str) -> str:
        return f"USE {self.quote_identifier(schema)}"

    def current_schema_query(self) -> str:
        return "SELECT current_database()"

    def show_tables_statement(self, schema: str | None = None) -> str:
        if schema is None:
            return "SHOW TABLES"
        return f"SHOW TABLES IN {self.quote_identifier(schema)}"

    def describe_statement(self, table: str, schema: str | None = None) -> str:
        qualified = self.quote_identifier(table)
        if schema is not None:
            qualified = f"{self.quote_identifier(schema)}.{qualified}"
        return f"DESCRIBE {qualified}"

    def tables_query(self, schema_pattern: str = "%") -> str:
        raise NotImplementedError(
            "Impala metadata is not SELECT-able; use show_tables_statement()"
        )

    def columns_query(self, table: str, schema_pattern: str = "%") -> str:
        raise NotImplementedError(
            "Impala metadata is not SELECT-able; use describe_statement()"
        )


DIALECTS: tuple[JdbcDialect, ...] = (
    PostgreSQLDialect(),
    MySQLDialect(),
    DorisDialect(),
    StarRocksDialect(),
    ClickHouseDialect(),
    OracleSQLDialect(),
    PhoenixDialect(),
    ImpalaDialect(),
    DerbyDialect(),
)


def get_dialect(url: str) -> JdbcDialect:
    """Dialect for a JDBC url (reference: ServiceLoader keyed on
    ENGINE_JDBC_SHORT_NAME); unknown urls get the ANSI generic dialect."""
    for d in DIALECTS:
        if any(url.startswith(p) for p in d.url_prefixes):
            return d
    return JdbcDialect()


def _metadata_df(
    spark: SparkSession, url: str, sql: str, **properties: str
) -> DataFrame:
    reader = spark.read.format("jdbc").option("url", url).option("query", sql)
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def list_tables(
    spark: SparkSession, url: str, schema_pattern: str = "%", **properties: str
) -> DataFrame:
    """JDBC-shaped GetTables rows straight from the backend's metadata
    (dialect-specific SQL through a real Spark JDBC scan)."""
    d = get_dialect(url)
    return _metadata_df(spark, url, d.tables_query(schema_pattern), **properties)


def list_columns(
    spark: SparkSession,
    url: str,
    table: str,
    schema_pattern: str = "%",
    **properties: str,
) -> DataFrame:
    d = get_dialect(url)
    return _metadata_df(
        spark, url, d.columns_query(table, schema_pattern), **properties
    )
