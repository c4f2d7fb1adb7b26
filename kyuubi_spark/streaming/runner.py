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
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from kyuubi_spark.scratch import scratch_dir


def _finish(q, timeout_sec: int, ckpt: str) -> None:
    """Wait for a streaming query, then tear down its checkpoint dir.

    - A query that failed re-raises its StreamingQueryException (silent
      partial results are worse than a loud error).
    - A query still running after `timeout_sec` is stopped and reported —
      AvailableNow replays are bounded, so hitting the timeout means the
      run is broken/overloaded, not "needs more data".
    - Checkpoint removal uses ignore_errors: the state-store maintenance
      thread can still be writing snapshots for a short window after
      termination, and a cleanup race must not fail the query.
    """
    try:
        finished = q.awaitTermination(timeout_sec)
        if not finished and q.isActive:
            q.stop()
            raise TimeoutError(
                f"streaming query {q.name or q.id} did not finish "
                f"within {timeout_sec}s"
            )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


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
        d = scratch_dir("kyuubi_spark_stream_src_")
        os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
        path = d
    return spark.readStream.format(fmt).schema(schema).load(path)


def run_to_memory(
    streaming_df: DataFrame,
    output_mode: str = "append",
    query_name: str | None = None,
    timeout_sec: int = 300,
    state_partitions: int | None = 8,
    extra_start_confs: dict | None = None,
) -> DataFrame:
    """Run with Trigger.AvailableNow into a memory sink; return the result.

    AvailableNow processes all available input then stops, running no-data
    batches so event-time state (windows past the watermark) flushes —
    final windows are emitted even in append mode.

    `state_partitions` pins spark.sql.shuffle.partitions for this query's
    startup (stateful operators create one state store PER shuffle
    partition, and the count is frozen into the checkpoint — 32 stores for
    a replay is pure per-batch overhead). Streaming state conf is
    per-query-at-start, so the session conf is set for the `.start()` call
    and restored after; a production always-on job sizes this to key
    cardinality instead.
    """
    name = query_name or f"mem_{uuid.uuid4().hex[:8]}"
    spark = streaming_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    ckpt = scratch_dir("kyuubi_spark_ckpt_")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    # query-at-start confs (e.g. the state store provider a
    # transformWithState query requires); frozen into the query at
    # .start(), restored right after like shuffle partitions
    prev_extra: dict[str, str | None] = {}
    for k, v in (extra_start_confs or {}).items():
        try:
            prev_extra[k] = spark.conf.get(k)
        except Exception:
            prev_extra[k] = None
        spark.conf.set(k, v)
    try:
        q = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    except BaseException:
        # start() itself failed: _finish never runs, so the checkpoint dir
        # would leak (one per failed start in a long-lived gateway session)
        shutil.rmtree(ckpt, ignore_errors=True)
        raise
    finally:
        if state_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        for k, old in prev_extra.items():
            try:
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)
            except Exception:
                pass
    _finish(q, timeout_sec, ckpt)
    return spark.table(name)


def run_foreach_batch(
    streaming_df: DataFrame,
    batch_fn,
    timeout_sec: int = 300,
    output_mode: str | None = None,
    state_partitions: int | None = None,
) -> None:
    """foreachBatch sink (arbitrary per-microbatch logic, e.g. writes with
    rebalance/z-order through operators.write).  ``output_mode`` matters
    for stateful upstreams (update-mode emissions land per microbatch);
    ``state_partitions`` pins the per-query state-store count exactly as
    in run_to_memory."""
    ckpt = scratch_dir("kyuubi_spark_ckpt_")
    spark = streaming_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        writer = streaming_df.writeStream.foreachBatch(batch_fn)
        if output_mode:
            writer = writer.outputMode(output_mode)
        q = (
            writer.option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    except BaseException:
        shutil.rmtree(ckpt, ignore_errors=True)
        raise
    finally:
        if state_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    _finish(q, timeout_sec, ckpt)
