"""Stream execution helpers: sources, sinks, and batch-replay runs.

- `file_stream`: a bounded file source over the corpus parquet (the
  standard replay harness — identical semantics to an unbounded source,
  processed with Trigger.AvailableNow).
- `run_to_memory`: execute a streaming DataFrame to a memory sink and
  return the final result as a DataFrame — this is how the gateway serves
  streaming statements through the same fetch API as batch results
  (the reference's Flink engine does the analogous incremental fetch,
  IncrementalResultFetchIterator).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def file_stream(
    spark: SparkSession, path: str, schema=None, fmt: str = "parquet"
) -> DataFrame:
    """Streaming read of a file directory. Schema inference is disabled for
    streams, so callers pass the schema (or we probe it with a batch read —
    one footer read, fine at any scale).

    FileStreamSource only accepts directories; a single-file path (the test
    corpus shape) is exposed through a symlinked temp directory.
    """
    if schema is None:
        schema = spark.read.format(fmt).load(path).schema
    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix="kyuubi_spark_stream_src_")
        os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
        path = d
    return spark.readStream.format(fmt).schema(schema).load(path)


def run_to_memory(
    streaming_df: DataFrame,
    output_mode: str = "append",
    query_name: str | None = None,
    timeout_sec: int = 120,
) -> DataFrame:
    """Run with Trigger.AvailableNow into a memory sink; return the result.

    AvailableNow processes all available input then stops, running no-data
    batches so event-time state (windows past the watermark) flushes —
    final windows are emitted even in append mode.
    """
    name = query_name or f"mem_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory(prefix="kyuubi_spark_ckpt_") as ckpt:
        q = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
    return streaming_df.sparkSession.table(name)


def run_foreach_batch(
    streaming_df: DataFrame, batch_fn, timeout_sec: int = 120
) -> None:
    """foreachBatch sink (arbitrary per-microbatch logic, e.g. writes with
    rebalance/z-order through operators.write)."""
    with tempfile.TemporaryDirectory(prefix="kyuubi_spark_ckpt_") as ckpt:
        q = (
            streaming_df.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
        if q.isActive:
            q.stop()
