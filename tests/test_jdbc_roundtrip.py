"""JDBC source/sink round trip against embedded Derby.

The reference's JDBC engine dialects (externals/kyuubi-jdbc-engine/.../
dialect/) reduce on Spark to `spark.read.jdbc` options; Derby ships inside
the Spark distribution, so the wrapper layer is exercised for real: write,
read back, partitioned parallel read, and predicate pushdown into the
JDBC scan.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kyuubi_spark.sources.jdbc import read_jdbc, write_jdbc  # noqa: E402

URL = "jdbc:derby:memory:jdbc_rt;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def seeded(spark):
    src = spark.range(1000).selectExpr(
        "id AS k", "CAST(id % 7 AS INT) AS grp", "CAST(id * 1.5 AS DOUBLE) AS v"
    )
    write_jdbc(src, URL, "rt_table", mode="overwrite", driver=DRIVER)
    return spark


def test_jdbc_roundtrip_values(seeded):
    back = read_jdbc(seeded, URL, "rt_table", driver=DRIVER)
    assert back.count() == 1000
    assert back.selectExpr("sum(k)").collect()[0][0] == 499500


def test_jdbc_partitioned_read(seeded):
    back = read_jdbc(
        seeded,
        URL,
        "rt_table",
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
        driver=DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000


def test_jdbc_partitioned_read_requires_bounds(seeded):
    with pytest.raises(ValueError, match="partitioned JDBC read"):
        read_jdbc(seeded, URL, "rt_table", partition_column="k", driver=DRIVER)


def test_jdbc_filter_pushdown(seeded):
    back = read_jdbc(seeded, URL, "rt_table", driver=DRIVER).filter("grp = 3")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the grp predicate must reach the JDBC scan, not run as a Spark filter
    assert "PushedFilters" in plan and "GRP" in plan.upper()
    assert back.count() == len([i for i in range(1000) if i % 7 == 3])


def test_dialect_registry_resolves_by_url():
    from kyuubi_spark.sources.jdbc_dialect import get_dialect

    assert get_dialect(URL).name == "derby"
    assert get_dialect("jdbc:postgresql://h/db").name == "postgresql"
    assert get_dialect("jdbc:mysql://h/db").name == "mysql"
    assert get_dialect("jdbc:doris://h/db").name == "doris"
    assert get_dialect("jdbc:clickhouse://h/db").name == "clickhouse"
    assert get_dialect("jdbc:sqlite:x").name == "generic"
    # MySQL family merges catalog/schema into one database term
    # (MySQLDialect.scala setSchema/setCatalog); PostgreSQL keeps them apart
    assert get_dialect("jdbc:mysql://h/db").database_term_merged
    assert not get_dialect("jdbc:postgresql://h/db").database_term_merged


def test_dialect_quoting():
    from kyuubi_spark.sources.jdbc_dialect import get_dialect

    assert get_dialect("jdbc:mysql://h/db").quote_identifier("a`b") == "`a``b`"
    assert get_dialect(URL).quote_identifier('a"b') == '"a""b"'


def test_derby_dialect_lists_tables_via_system_tables(seeded):
    """GetTables shape from the backend's own metadata through a real
    Spark JDBC scan (DerbyDialect -> SYS.SYSTABLES/SYSSCHEMAS), mirroring
    the reference dialects' hand-written metadata SQL."""
    from kyuubi_spark.sources.jdbc_dialect import list_tables

    rows = list_tables(seeded, URL, driver=DRIVER).collect()
    assert set(rows[0].asDict()) == {
        "TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "TABLE_TYPE",
    }
    by_name = {r["TABLE_NAME"]: r for r in rows}
    assert "RT_TABLE" in by_name  # Derby upper-cases unquoted identifiers
    assert by_name["RT_TABLE"]["TABLE_TYPE"] == "TABLE"
    assert by_name["RT_TABLE"]["TABLE_SCHEM"] == "APP"


def test_derby_dialect_lists_columns_in_order(seeded):
    from kyuubi_spark.sources.jdbc_dialect import list_columns

    rows = list_columns(seeded, URL, "RT_TABLE", driver=DRIVER).collect()
    cols = [r["COLUMN_NAME"] for r in sorted(rows, key=lambda r: r["ORDINAL_POSITION"])]
    # Spark's JDBC writer quotes identifiers at CREATE time, so the
    # DataFrame's lowercase column names survive verbatim
    assert cols == ["k", "grp", "v"]
    types = {r["COLUMN_NAME"]: r["TYPE_NAME"] for r in rows}
    assert "BIGINT" in types["k"]
    assert "INTEGER" in types["grp"]
    assert "DOUBLE" in types["v"]


def test_metadata_sql_escapes_quote_bearing_patterns():
    """A quote-bearing pattern (benign O'Brien or a crafted injection
    payload) must be escaped into the SQL literal, never break out of it —
    the reference parameterizes these via PreparedStatement
    (JdbcDialect.scala getTables/getColumns); our query-option path must
    escape (sql_literal)."""
    from kyuubi_spark.sources.jdbc_dialect import (
        DIALECTS,
        ImpalaDialect,
        sql_literal,
    )

    assert sql_literal("O'Brien") == "O''Brien"
    payload = "x' UNION SELECT password FROM users --"
    for d in DIALECTS:
        if isinstance(d, ImpalaDialect):
            continue  # metadata via SHOW statements, no literal interpolation
        tq = d.tables_query(payload)
        cq = d.columns_query("O'Brien", payload)
        # every interior quote doubled → the literal never terminates early
        assert "x'' UNION SELECT" in tq, d.name
        assert "O''Brien" in cq, d.name
        assert "x'' UNION SELECT" in cq, d.name
        # and the raw (unescaped) payload must not appear anywhere
        assert "x' UNION" not in tq.replace("x'' UNION", ""), d.name


def test_new_dialects_resolve_by_url():
    from kyuubi_spark.sources.jdbc_dialect import get_dialect

    assert get_dialect("jdbc:oracle:thin:@//h:1521/svc").name == "oracle"
    assert get_dialect("jdbc:phoenix:zk1,zk2:2181").name == "phoenix"
    assert get_dialect("jdbc:impala://h:21050/default").name == "impala"
    assert get_dialect("jdbc:starrocks://h:9030/db").name == "starrocks"


def test_starrocks_inherits_mysql_semantics():
    from kyuubi_spark.sources.jdbc_dialect import StarRocksDialect

    d = StarRocksDialect()
    assert d.quote_char == "`"
    assert d.database_term_merged
    # MySQL-shaped tables query: database term in TABLE_CAT, no schema
    assert "NULL AS TABLE_SCHEM" in d.tables_query("db%")
    assert d.reader_options()["useCursorFetch"] == "true"


def test_oracle_dialect_metadata_shapes():
    from kyuubi_spark.sources.jdbc_dialect import OracleSQLDialect

    d = OracleSQLDialect()
    tq = d.tables_query("SCOTT")
    assert "ALL_TABLES" in tq and "ALL_VIEWS" in tq
    assert "'TABLE' AS TABLE_TYPE" in tq
    cq = d.columns_query("EMP", "SCOTT")
    assert "ALL_TAB_COLUMNS" in cq
    assert "COLUMN_ID AS ORDINAL_POSITION" in cq


def test_phoenix_dialect_metadata_shapes():
    from kyuubi_spark.sources.jdbc_dialect import PhoenixDialect

    d = PhoenixDialect()
    tq = d.tables_query()
    # Phoenix catalog rows for the table itself carry NULL column fields
    assert 'SYSTEM."CATALOG"' in tq
    assert "COLUMN_NAME IS NULL" in tq
    assert "WHEN 'u' THEN 'TABLE'" in tq
    cq = d.columns_query("T1")
    assert "COLUMN_NAME IS NOT NULL" in cq


def test_impala_dialect_show_statements():
    """ImpalaDialect.scala setSchema: Impalad rejects the driver's private
    session confs, so USE/`SELECT current_database()` go as plain SQL with
    backtick escaping."""
    import pytest

    from kyuubi_spark.sources.jdbc_dialect import ImpalaDialect

    d = ImpalaDialect()
    assert d.use_statement("web`logs") == "USE `web``logs`"
    assert d.current_schema_query() == "SELECT current_database()"
    assert d.show_tables_statement("db1") == "SHOW TABLES IN `db1`"
    assert d.describe_statement("t", "db1") == "DESCRIBE `db1`.`t`"
    with pytest.raises(NotImplementedError):
        d.tables_query()


def test_derby_metadata_survives_quote_in_pattern(seeded):
    """End-to-end over a real backend: a quote-bearing schema pattern must
    not raise a SQL syntax error (it matches nothing, returns 0 rows)."""
    from kyuubi_spark.sources.jdbc_dialect import list_tables

    rows = list_tables(seeded, URL, schema_pattern="O'Brien", driver=DRIVER).collect()
    assert rows == []
