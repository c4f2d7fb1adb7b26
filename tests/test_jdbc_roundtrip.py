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
