"""kyuubi_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Kyuubi (reference: apache/kyuubi).

Layers (mirrors SURVEY.md §0):
  1. gateway/   — sessions, operations, fetch protocol (kyuubi-common parity)
  2. operators/ — value-add query ops: z-order, watchdog, rebalance-on-write
  3. queries/   — the verified relational surface (TPC-H-style corpus)
  4. functions/ — engine UDFs + LLM-data-pipeline ops (dedup, similarity, text)
  5. plans/     — plan-only modes, lineage extraction
  6. streaming/ — Structured Streaming parity (Flink-engine capability)

Execution is always delegated to Spark SQL / Catalyst — this package never
reimplements relational operators; it declares plans and lets Spark optimize,
exactly as the reference delegates to ``spark.sql(statement)``
(kyuubi ExecuteStatement.scala:90).
"""

__version__ = "0.1.0"

from kyuubi_spark.session import build_session, ensure_runtime_confs, load_tables

__all__ = ["build_session", "ensure_runtime_confs", "load_tables", "__version__"]
