"""Multi-catalog DSv2: a second catalog (JDBCTableCatalog over embedded
Derby — both ship inside the Spark distribution) registered next to
spark_catalog, exercised through the gateway metadata operations and the
thrift wire.

Reference parity: SparkCatalogUtils.getCatalogs enumerates every DSv2
CatalogPlugin (externals/.../util/SparkCatalogUtils.scala:63-90), getSchemas
walks a non-session catalog via its plugin (:113-147), and the engine
supports SetCurrentCatalog / GetCurrentCatalog session switches.
"""

from __future__ import annotations

import pytest

from kyuubi_spark.gateway import Engine
from kyuubi_spark.gateway.state import OperationState

CAT = "dscat"

# Session-level catalog registration: clients hand these to OpenSession and
# the gateway applies them as session SQLConf overrides (catalog plugins are
# resolved lazily on first reference, so no session rebuild is needed).
CAT_CONF = {
    f"spark.sql.catalog.{CAT}": (
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog"
    ),
    f"spark.sql.catalog.{CAT}.url": f"jdbc:derby:memory:{CAT};create=true",
    f"spark.sql.catalog.{CAT}.driver": "org.apache.derby.jdbc.EmbeddedDriver",
}


@pytest.fixture(scope="module")
def multicat_spark(spark):
    for k, v in CAT_CONF.items():
        spark.conf.set(k, v)
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {CAT}.ns1")
    spark.sql(f"CREATE TABLE IF NOT EXISTS {CAT}.ns1.people (id INT, name STRING)")
    spark.sql(f"INSERT INTO {CAT}.ns1.people VALUES (1, 'a'), (2, 'b')")
    yield spark


@pytest.fixture(scope="module")
def engine(multicat_spark):
    yield Engine(spark=multicat_spark)


@pytest.fixture()
def session(engine):
    s = engine.open_session(user="cat_tester", conf=dict(CAT_CONF))
    yield s
    engine.close_session(s.handle)


def test_get_catalogs_lists_both(session):
    op = session.get_catalogs()
    cats = [r[0] for r in op.get_next_row_set(size=100)]
    assert CAT in cats and "spark_catalog" in cats


def test_get_schemas_cross_catalog(session):
    op = session.get_schemas(catalog=CAT)
    rows = op.get_next_row_set(size=100)
    assert ("ns1", CAT) in [tuple(r) for r in rows]


def test_get_tables_cross_catalog(session):
    op = session.get_tables(catalog=CAT, schema_pattern="ns1")
    rows = [tuple(r) for r in op.get_next_row_set(size=100)]
    assert (CAT, "ns1", "people", "TABLE", "") in rows


def test_get_columns_cross_catalog(session):
    op = session.get_columns(catalog=CAT, schema_pattern="ns1", table_pattern="people")
    rows = op.get_next_row_set(size=100)
    by_name = {r[3]: r for r in rows}
    assert set(by_name) == {"id", "name"}
    assert by_name["id"][0] == CAT and by_name["id"][1] == "ns1"
    assert by_name["id"][2] == "people"


def test_use_statement_switches_catalog(session):
    session.execute_statement(f"USE {CAT}.ns1")
    assert session.spark.catalog.currentCatalog() == CAT
    # statements now resolve against the new catalog without qualification
    op = session.execute_statement("SELECT count(*) AS n FROM people")
    assert op.state is OperationState.FINISHED
    assert op.get_next_row_set(size=1)[0][0] == 2
    session.execute_statement("USE spark_catalog.default")
    assert session.spark.catalog.currentCatalog() == "spark_catalog"


def test_cross_catalog_query_without_switch(session):
    op = session.execute_statement(
        f"SELECT name FROM {CAT}.ns1.people ORDER BY id"
    )
    assert [r[0] for r in op.get_next_row_set(size=10)] == ["a", "b"]


def test_thrift_get_schemas_cross_catalog(multicat_spark):
    from kyuubi_spark.gateway.thrift import (
        ThriftClient,
        ThriftFrontendService,
        TType,
    )

    svc = ThriftFrontendService(Engine(spark=multicat_spark)).start()
    try:
        c = ThriftClient(svc.host, svc.port)
        c.open_session(user="thrift_cat", conf=dict(CAT_CONF))
        try:
            guid = c.metadata_op(
                "GetSchemas", [(2, TType.STRING, CAT), (3, TType.STRING, "ns%")]
            )
            rows = c.fetch(guid, max_rows=100)
            assert ["ns1", CAT] in [list(r) for r in rows]
        finally:
            c.close_session()
            c.close()
    finally:
        svc.stop()
