"""SQL UDFs (Spark 4 ``CREATE FUNCTION ... RETURN <expr>``) as registry entries.

The reference's UDF surface (SURVEY.md §2.J) is "whatever Spark supports"
— user functions arrive through the gateway as plain SQL (reference:
SparkQueryTests.scala:370 exercises runtime-registered functions through
the wire). Spark 4 adds declarative SQL UDFs: scalar functions
(``RETURNS <type> RETURN <expr>``) and table functions
(``RETURNS TABLE(...) RETURN SELECT ...``), both created by a bare SQL
statement — exactly the shape a gateway user sends. Catalyst INLINES the
body into the calling plan, so unlike Python UDFs these stay inside
whole-stage codegen: the optimized plan contains the expanded expression,
no serialization boundary, no black-box call (asserted in
tests/test_plan_quality.py).

Oracles inline the same expressions in ANSI SQL — the value contract is
that a SQL UDF is pure sugar over its body.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table


@query(
    "sql_udf_scalar",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS sum_charge,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Scalar SQL UDFs (Spark 4 CREATE FUNCTION ... RETURN expr), one "
    "calling the other: ks_charge delegates to ks_disc_price. Catalyst "
    "inlines both bodies at analysis time, so the physical plan is the "
    "same whole-stage-codegen'd hash aggregate tpch_q1 gets — zero UDF "
    "call overhead at any scale (plan-asserted: no BatchEvalPython, no "
    "opaque function call survives optimization).",
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ks_disc_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1 - d)"
    )
    # a SQL UDF may call another SQL UDF — both inline transitively
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ks_charge(p DOUBLE, d DOUBLE, "
        "t DOUBLE) RETURNS DOUBLE RETURN ks_disc_price(p, d) * (1 + t)"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(ks_disc_price(l_extendedprice, l_discount)), 2)
                 AS sum_disc_price,
               ROUND(SUM(ks_charge(l_extendedprice, l_discount, l_tax)), 2)
                 AS sum_charge,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    )


@query(
    "sql_udf_table",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(s.ln) AS BIGINT) AS sum_ln
    FROM orders o,
         LATERAL (SELECT unnest(generate_series(
                    1, CAST(1 + o.o_orderkey % 3 AS INT))) AS ln) s
    GROUP BY 1 ORDER BY 1
    """,
    doc="Table-valued SQL UDF applied LATERALLY with a correlated argument "
    "(each order row fans out into 1 + o_orderkey%3 rows). Spark inlines "
    "the TVF body into a generator (explode) node under the join — the "
    "plan is a plain generate + hash aggregate, map-side expansion with "
    "no shuffle added by the function itself.",
)
def sql_udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION ks_fanout(n INT) "
        "RETURNS TABLE(ln INT) RETURN SELECT explode(sequence(1, greatest(n, 1)))"
    )
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               COUNT(*) AS n_rows,
               SUM(s.ln) AS sum_ln
        FROM orders o, LATERAL ks_fanout(CAST(1 + o.o_orderkey % 3 AS INT)) s
        GROUP BY 1 ORDER BY 1
        """
    )


@query(
    "python_udtf_tokens",
    oracle="""
    WITH w AS (
      SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents)
    SELECT CAST(len(word) AS INT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct
    FROM w WHERE word <> '' GROUP BY 1 ORDER BY 1
    """,
    doc="Python user-defined TABLE function (SURVEY §2.J: the UDTF leg "
    "of the UDF surface; Spark 3.5+/4 @udtf): a tokenizer class "
    "registered as a SQL table function and applied LATERALLY per "
    "document row, aggregated into a token-length profile. Arrow-"
    "optimized (useArrow) so rows batch across the Python boundary. "
    "Scale note: a Python UDTF is still the interpreted path — "
    "lateral_explode_tokens does this same job JVM-side and is the "
    "production kernel; this entry pins the API surface a gateway "
    "client can register and call from plain SQL.",
)
def python_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, n int", useArrow=True)
    class Tokens:
        def eval(self, text: str):
            for w in (text or "").split():
                yield (w, len(w))

    spark.udtf.register("ks_tokens", Tokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(
        """
        SELECT s.n, COUNT(*) AS n_tokens, COUNT(DISTINCT s.word) AS n_distinct
        FROM documents d, LATERAL ks_tokens(d.text) s
        GROUP BY s.n ORDER BY s.n
        """
    )
