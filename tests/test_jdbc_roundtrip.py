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
