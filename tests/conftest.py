import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from kyuubi_spark.session import build_session

    spark = build_session(
        app_name="kyuubi-spark-tests",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    # keep embedded Derby's error log out of the repo root (the Derby
    # JDBC tests otherwise drop derby.log wherever the JVM's cwd is)
    spark._jvm.java.lang.System.setProperty(
        "derby.stream.error.file", "/tmp/derby.log"
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def launched_wire(spark, tmp_path_factory):
    """A gateway with engine-process launching enabled, fronted by a
    thrift frontend: the reference runs its shared JDBC behavior suites
    against the SERVER and against every ENGINE over a real connection
    (SURVEY §5 / WithKyuubiServer + the engine operation suites).  This
    fixture is the engine half — sessions opened with
    ``launch_conf`` forward through a gateway-spawned engine OS process
    (one shared USER-level child for the whole test session, internal
    auth on).  Suites parametrize over in-proc vs this to prove wire
    behavior is identical through the child process."""
    from kyuubi_spark.gateway.discovery import SqliteDiscoveryClient
    from kyuubi_spark.gateway.engine import Engine
    from kyuubi_spark.gateway.engine_process import EngineProcessManager
    from kyuubi_spark.gateway.internal_auth import build_accessor
    from kyuubi_spark.gateway.thrift import ThriftFrontendService

    d = tmp_path_factory.mktemp("launched-wire")
    conf = {
        "kyuubi.engine.security.enabled": "true",
        "kyuubi.engine.security.secret.provider.simple.secret": "wire-s3c",
        "kyuubi.session.engine.initialize.timeout": "120",
        "kyuubi.session.engine.idle.timeout": "600",
    }
    disco = SqliteDiscoveryClient(str(d / "registry.db"))
    disco.create_client()
    gw = Engine(spark)
    gw.discovery = disco
    gw.internal_accessor = build_accessor(conf, disco)
    gw.process_manager = EngineProcessManager(disco, conf)
    gw.launch_engines = False  # per-session opt-in via launch_conf

    class _Env:
        gateway = gw
        discovery = disco
        launch_conf = {"kyuubi.engine.launch.enabled": "true"}
        frontend = ThriftFrontendService(gw).start()
        host, port = None, None

    _Env.host, _Env.port = _Env.frontend.host, _Env.frontend.port
    yield _Env
    _Env.frontend.stop()
    gw.process_manager.stop_all()
    disco.close_client()


@pytest.fixture(scope="session")
def tpcds_star(spark, tmp_path_factory):
    """Generated TPC-DS store star (sources/tpcds_datagen.py) landed as
    parquet once per session; yields (spark, duckdb_con) with every table
    registered as a temp view / DuckDB view over the SAME files.  Shared
    by test_tpcds_real.py and test_tpcds_real2.py."""
    from kyuubi_spark.sources.tpcds_datagen import TPCDS_GENERATORS

    sf = 0.002  # ~5.8k store sales rows — non-trivial groups, fast
    root = tmp_path_factory.mktemp("tpcds_star")
    paths = {}
    for name, gen in TPCDS_GENERATORS.items():
        p = str(root / name)
        gen(spark, sf).write.mode("overwrite").parquet(p)
        spark.read.parquet(p).createOrReplaceTempView(name)
        paths[name] = p
    con = duckdb.connect()
    for name, p in paths.items():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
        )
    yield spark, con
    con.close()
    for name in paths:
        spark.catalog.dropTempView(name)
