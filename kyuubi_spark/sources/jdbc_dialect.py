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
            f"WHERE table_schema LIKE '{schema_pattern}'"
        )

    def columns_query(self, table: str, schema_pattern: str = "%") -> str:
        return (
            "SELECT table_schema AS TABLE_SCHEM, table_name AS TABLE_NAME, "
            "column_name AS COLUMN_NAME, data_type AS TYPE_NAME, "
            "ordinal_position AS ORDINAL_POSITION "
            "FROM information_schema.columns "
            f"WHERE table_name = '{table}' "
            f"AND table_schema LIKE '{schema_pattern}'"
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
            f"WHERE table_schema LIKE '{schema_pattern}'"
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
            f"FROM system.tables WHERE database LIKE '{schema_pattern}'"
        )

    def columns_query(self, table: str, schema_pattern: str = "%") -> str:
        return (
            "SELECT database AS TABLE_SCHEM, table AS TABLE_NAME, "
            "name AS COLUMN_NAME, type AS TYPE_NAME, "
            "position AS ORDINAL_POSITION "
            f"FROM system.columns WHERE table = '{table}' "
            f"AND database LIKE '{schema_pattern}'"
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
            f"WHERE s.SCHEMANAME LIKE '{schema_pattern}'"
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
            f"WHERE t.TABLENAME = '{table}' "
            f"AND s.SCHEMANAME LIKE '{schema_pattern}'"
        )


DIALECTS: tuple[JdbcDialect, ...] = (
    PostgreSQLDialect(),
    MySQLDialect(),
    DorisDialect(),
    ClickHouseDialect(),
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
