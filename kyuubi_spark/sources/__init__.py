"""Data sources & sinks (SURVEY.md §2.E).

- formats: parquet/ORC/CSV/JSON read+write with schema round-trip — the
  format surface the reference exercises (result spill writes ORC,
  ExecuteStatement.scala:190-194; Spark's own readers cover the rest).
- datagen: deterministic on-the-fly TPC-H-style table generator — the
  capability of the reference's TPCH/TPCDS DSv2 connectors
  (TPCHBatchScan.scala:39-91: split into InputPartitions, per-chunk row
  generator), re-expressed as spark.range + mapInPandas.
- jdbc: thin wrapper over spark.read/write.jdbc with pushdown options
  (the reference's JDBC engine dialects reduce to this on Spark).
"""
