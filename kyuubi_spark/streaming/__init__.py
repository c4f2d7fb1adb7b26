"""Structured Streaming operators.

The reference has no native streaming engine — streaming SQL passes through
to Flink (externals/kyuubi-flink-sql-engine/.../operation/ExecuteStatement
.scala:60-87, incremental unbounded fetch). Capability parity in our build
is Spark Structured Streaming exposed through the same session API
(SURVEY.md §2.I): windowed aggregations with watermarks, gap-based session
windows, stream-static joins, stateful per-key operators, and an
incremental-fetch sink that feeds the gateway's IterableFetchIterator.
"""
