"""Driver-verified queries that exercise the gateway + value-add operators.

- gateway_sql_q6: TPC-H q6 routed through the full gateway path
  (Engine → Session.newSession clone → ExecuteStatement dispatch), proving
  the session/operation machinery produces the same result as running the
  DataFrame directly (reference parity: a Kyuubi JDBC client vs spark-shell).
- zorder_cluster: the z-order interleave kernel (Zorder.scala semantics)
  verified value-by-value against an identical ANSI-SQL bit-interleave.
- types_scalar: cross-engine scalar type surface (SparkDataTypeTests shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kyuubi_spark.scratch import scratch_dir
from pyspark.sql import functions as F

from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table, load_tables

_Q6_SQL = """
    SELECT ROUND(SUM(l_extendedprice * l_discount) * 100, 0) / 100 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query(
    "gateway_sql_q6",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H q6 through the gateway session/operation path (SQL text in, "
    "DataFrame out via ExecuteStatement).",
)
def gateway_sql_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.gateway import Engine

    engine = Engine(spark=spark)
    session = engine.open_session(user="driver")
    load_tables(session.spark, sf_dir)
    # The dround trick is spelled inline in SQL (round(x*100)/100) so the
    # statement is plain SQL text end-to-end, like a JDBC client would send.
    op = session.execute_statement(_Q6_SQL)
    assert op.result_df is not None
    return op.result_df


def _interleave_sql(cols: list[str], bits: int) -> str:
    """ANSI-SQL twin of operators.zorder.interleave_bits."""
    n = len(cols)
    terms = [
        f"((({c} >> {b}) & 1) << {b * n + j})"
        for b in range(bits)
        for j, c in enumerate(cols)
    ]
    return " | ".join(terms)


_ZBITS = 8


@query(
    "zorder_cluster",
    oracle=f"""
    WITH stats AS (
      SELECT MIN(CAST(l_partkey AS DOUBLE)) AS minp, MAX(CAST(l_partkey AS DOUBLE)) AS maxp,
             MIN(CAST(l_suppkey AS DOUBLE)) AS mins, MAX(CAST(l_suppkey AS DOUBLE)) AS maxs
      FROM lineitem),
    scaled AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((CAST(l_partkey AS DOUBLE) - minp) / (maxp - minp) * 255.0) AS BIGINT), 0), 255) AS p,
             LEAST(GREATEST(CAST(FLOOR((CAST(l_suppkey AS DOUBLE) - mins) / (maxs - mins) * 255.0) AS BIGINT), 0), 255) AS s
      FROM lineitem, stats),
    z AS (SELECT {_interleave_sql(['p', 's'], _ZBITS)} AS zvalue FROM scaled)
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT zvalue) AS BIGINT) AS n_zvalues,
           MIN(zvalue) AS z_min, MAX(zvalue) AS z_max,
           CAST(SUM(zvalue) AS BIGINT) AS z_sum
    FROM z
    """,
    doc="Z-order Morton interleave kernel (Zorder.scala/ZorderBytesUtils "
    "semantics) — value-exact vs an ANSI-SQL bit-interleave oracle.",
)
def zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.operators.zorder import zorder_value

    lineitem = load_table(spark, sf_dir, "lineitem")
    z = zorder_value(lineitem, ["l_partkey", "l_suppkey"], bits=_ZBITS)
    return z.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("zvalue").cast("bigint").alias("n_zvalues"),
        F.min("zvalue").alias("z_min"),
        F.max("zvalue").alias("z_max"),
        F.sum("zvalue").alias("z_sum"),
    )


@query(
    "types_scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS SMALLINT) % 128 AS small_v,
           CAST(o_custkey AS INT) AS int_v,
           CAST(o_orderkey AS BIGINT) * 1000000 AS big_v,
           ROUND(CAST(o_totalprice AS DOUBLE), 2) AS dbl_v,
           o_totalprice > 100000 AS bool_v,
           CAST(o_orderdate AS DATE) AS date_v,
           CAST(o_orderdate AS TIMESTAMP) AS ts_v,
           UPPER(o_orderpriority) AS str_v,
           LENGTH(o_orderpriority) AS len_v,
           SUBSTR(o_orderpriority, 1, 1) AS chr_v
    FROM orders WHERE o_orderkey <= 50 ORDER BY o_orderkey
    """,
    doc="Scalar type surface: integer widths, double, boolean, date, "
    "timestamp, string functions (SparkDataTypeTests parity, §1.2).",
)
def types_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") <= 50)
        .select(
            "o_orderkey",
            (F.col("o_orderkey").cast("smallint") % 128).alias("small_v"),
            F.col("o_custkey").cast("int").alias("int_v"),
            (F.col("o_orderkey").cast("bigint") * 1000000).alias("big_v"),
            F.round(F.col("o_totalprice").cast("double"), 2).alias("dbl_v"),
            (F.col("o_totalprice") > 100000).alias("bool_v"),
            F.col("o_orderdate").cast("date").alias("date_v"),
            F.col("o_orderdate").cast("timestamp").alias("ts_v"),
            F.upper("o_orderpriority").alias("str_v"),
            F.length("o_orderpriority").cast("bigint").alias("len_v"),
            F.substring("o_orderpriority", 1, 1).alias("chr_v"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "authz_row_filter_masking",
    oracle="""
    SELECT c_custkey,
           CASE WHEN length(c_name) <= 4 THEN c_name
                ELSE repeat('x', length(c_name) - 4) || right(c_name, 4) END AS c_name,
           c_nationkey,
           regexp_replace(regexp_replace(regexp_replace(c_mktsegment,
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS c_mktsegment
    FROM customer
    WHERE c_nationkey < 10
    ORDER BY c_custkey LIMIT 100
    """,
    doc="Row-filter + column-masking authz via secured-view substitution "
    "(RuleApplyRowFilter / RuleApplyDataMaskingStage0 semantics, SURVEY §2.G).",
)
def authz_row_filter_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.operators.masking import (
        TablePolicy,
        apply_policies,
        mask_full,
        mask_show_last_4,
    )

    load_tables(spark, sf_dir)
    secured = apply_policies(
        spark,
        {
            "customer": TablePolicy(
                row_filter="c_nationkey < 10",
                column_masks={
                    "c_name": mask_show_last_4("c_name"),
                    "c_mktsegment": mask_full("c_mktsegment"),
                },
            )
        },
    )
    return (
        spark.table(secured["customer"])
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(100)
    )


@query(
    "ctas_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="CTAS round-trip through the gateway write path (SURVEY §2.D "
    "DDL/DML, §2.F RebalanceBeforeWriting): filtered orders projection is "
    "written parquet with the REBALANCE hint (AQE sizes output files — the "
    "small-files guard a 1000-executor final stage needs), then read back "
    "and aggregated. The oracle aggregates the source directly, so the "
    "round-trip must be lossless.",
)
def ctas_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kyuubi_spark.operators.write import write_table

    orders = load_table(spark, sf_dir, "orders")
    proj = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_totalprice",
    )
    path = scratch_dir("kyuubi_ctas_", data_scale=True)
    try:
        write_table(proj, path, rebalance_by=["o_orderpriority"])
        back = spark.read.parquet(path)
        out = (
            back.groupBy("o_orderpriority", "month")
            .agg(
                F.count("*").alias("n_orders"),
                dround(F.sum("o_totalprice"), 2).alias("total"),
            )
            .orderBy("o_orderpriority", "month")
        )
        # materialize before deleting the backing files: the returned DF
        # must survive the caller's collect after cleanup
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "formats_roundtrip",
    oracle="""
    WITH agg AS (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n_name)
    SELECT fmt, n_name, n_cust, total_bal
    FROM agg, (VALUES ('csv'), ('json'), ('orc')) AS f(fmt)
    ORDER BY fmt, n_name
    """,
    doc="Source/sink format coverage (SURVEY §2.D scans & writes): one "
    "customer x nation aggregate written to ORC, CSV, and JSON, read back "
    "through the typed readers (explicit schema — no inference pass over "
    "the data at scale), and stacked. All three copies must agree exactly "
    "with the direct aggregate; decimal sums make the values "
    "order-independent.",
)
def formats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kyuubi_spark.sources import formats as FM

    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
    )
    # materialize the 25-row aggregate once: each of the three format
    # writes is its own job, and without this the customer-join aggregate
    # re-runs per write (r13 optimization — 3 scans+shuffles -> 1)
    agg = agg.localCheckpoint()
    base = scratch_dir("kyuubi_formats_")
    try:
        FM.write_orc(agg, f"{base}/orc")
        FM.write_csv(agg, f"{base}/csv")
        FM.write_json(agg, f"{base}/json")
        schema = agg.schema
        stacked = (
            FM.read_csv(spark, f"{base}/csv", schema)
            .withColumn("fmt", F.lit("csv"))
            .unionByName(
                FM.read_json(spark, f"{base}/json", schema).withColumn(
                    "fmt", F.lit("json")
                )
            )
            .unionByName(
                FM.read_orc(spark, f"{base}/orc").withColumn("fmt", F.lit("orc"))
            )
        )
        out = stacked.select("fmt", "n_name", "n_cust", "total_bal").orderBy(
            "fmt", "n_name"
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out
