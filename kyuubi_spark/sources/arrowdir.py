"""Arrow-IPC directory connector: Python DataSource with a REAL write path.

The write-side counterpart of sources/pyds.py — capability parity with
the reference's DSv2 write pipeline (Hive connector
HiveWriteBuilder/HiveBatchWrite: per-task files, driver-side commit of
collected task messages; extensions/spark/kyuubi-spark-connector-hive/
.../write/HiveBatchWrite.scala). Spark 4's Python DataSource writer API
has the same two-phase shape, implemented here end to end:

- each task streams its Arrow RecordBatches into one
  ``part-*.arrow.inprogress`` file and RENAMES it to ``part-*.arrow``
  only on success (DataSourceArrowWriter — zero row-by-row Python
  work), returning a commit message (file name, row count); a crashed
  task therefore never leaves a final-named file, only an
  ``.inprogress`` one that commit-time cleanup sweeps;
- ``commit()`` runs ONCE on the driver with every task's message and
  atomically publishes ``_manifest.json`` (file list + schema + row
  total). mode("append") MERGES the prior manifest's files into the new
  one; mode("overwrite") replaces it and deletes every stale
  ``part-*.arrow``/``.inprogress`` the new manifest doesn't reference.
  Readers only trust manifested files, so a failed/speculative task's
  leftovers are invisible either way;
- ``abort()`` deletes the part files of every task that got far enough
  to report one.

The read side lists the manifest: one InputPartition per part file,
``read()`` yields the file's RecordBatches as-is. Round trip is
schema-preserving and value-exact (registry entry arrow_sink_roundtrip).

Scale notes: one file per task (the rebalance-before-write story in
operators/write.py controls task counts upstream); commit is O(tasks)
driver work, matching Spark's own FileCommitProtocol.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    InputPartition,
    WriterCommitMessage,
)

FORMAT_NAME = "kyuubi_arrowdir"
MANIFEST = "_manifest.json"
# append commits only reclaim .inprogress staging files older than this —
# younger ones may belong to a concurrently-running writer (ADVICE r08)
ORPHAN_SWEEP_AGE_SEC = 600.0


@dataclass
class _FileCommit(WriterCommitMessage):
    filename: str
    rows: int


class _ArrowDirWriter(DataSourceArrowWriter):
    def __init__(self, path: str, schema_json: str, overwrite: bool):
        self.path = path
        self.schema_json = schema_json
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        import pyarrow as pa

        os.makedirs(self.path, exist_ok=True)
        name = f"part-{uuid.uuid4().hex}.arrow"
        full = os.path.join(self.path, name)
        staging = full + ".inprogress"
        rows = 0
        writer = None
        try:
            for batch in iterator:
                if writer is None:
                    writer = pa.ipc.new_file(staging, batch.schema)
                writer.write_batch(batch)
                rows += batch.num_rows
            if writer is None:
                return _FileCommit(filename="", rows=0)  # empty partition
        finally:
            if writer is not None:
                writer.close()
        # publish the task file only on success — a crash above leaves
        # .inprogress, never a final-named file a manifest could race
        os.replace(staging, full)
        return _FileCommit(filename=name, rows=rows)

    def commit(self, messages):
        files = sorted(
            m.filename for m in messages if m is not None and m.filename
        )
        total = sum(m.rows for m in messages if m is not None)
        manifest_path = os.path.join(self.path, MANIFEST)
        if not self.overwrite and os.path.exists(manifest_path):
            # append: the new manifest EXTENDS the committed set — prior
            # data stays visible (losing it would be silent data loss)
            with open(manifest_path) as f:
                prior = json.load(f)
            prior_schema = prior.get("schema")
            if prior_schema is not None and prior_schema != json.loads(
                self.schema_json
            ):
                raise ValueError(
                    "kyuubi_arrowdir append: schema mismatch with committed "
                    f"dataset at {self.path} — overwrite or align the schema"
                )
            files = sorted(set(files) | set(prior.get("files", [])))
            total += prior.get("rows", 0)
        manifest = {
            "files": files,
            "rows": total,
            "schema": json.loads(self.schema_json),
        }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)  # atomic publish
        # stale parts from prior commits and crashed tasks are now
        # unreachable — reclaim the space. Finalized .arrow files are only
        # deleted on overwrite (append keeps every manifested file live by
        # construction, but a concurrent writer's final file must survive).
        # .inprogress staging orphans: an append commit must NOT delete a
        # concurrently-running writer's live staging files (its os.replace
        # would fail), so on append only orphans older than
        # ORPHAN_SWEEP_AGE_SEC are reclaimed; overwrite sweeps them all —
        # concurrent writes during an overwrite are undefined anyway.
        live = set(files)
        now = time.time()
        for entry in os.listdir(self.path):
            if entry in live or entry == MANIFEST:
                continue
            full = os.path.join(self.path, entry)
            stale_final = self.overwrite and entry.endswith(".arrow")
            stale_staging = False
            if entry.endswith(".arrow.inprogress"):
                if self.overwrite:
                    stale_staging = True
                else:
                    try:
                        stale_staging = (
                            now - os.path.getmtime(full)
                            > ORPHAN_SWEEP_AGE_SEC
                        )
                    except OSError:
                        stale_staging = False  # vanished: writer finished
            if stale_final or stale_staging:
                try:
                    os.remove(full)
                except OSError:
                    pass

    def abort(self, messages):
        for m in messages:
            if m is not None and m.filename:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


class _FilePartition(InputPartition):
    def __init__(self, filename: str):
        self.filename = filename


class _ArrowDirReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path
        with open(os.path.join(path, MANIFEST)) as f:
            self.manifest = json.load(f)

    def partitions(self):
        return [_FilePartition(f) for f in self.manifest["files"]]

    def read(self, partition: _FilePartition):
        import pyarrow as pa

        if partition is None or not getattr(partition, "filename", None):
            # zero-file manifest: pyspark substitutes a single None
            # partition when partitions() returns [] — yield nothing
            return
        with pa.ipc.open_file(
            os.path.join(self.path, partition.filename)
        ) as reader:
            for i in range(reader.num_record_batches):
                yield reader.get_batch(i)


class ArrowDirDataSource(DataSource):
    """df.write.format("kyuubi_arrowdir").save(path) /
    spark.read.format("kyuubi_arrowdir").load(path)"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _path(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("kyuubi_arrowdir requires a path")
        return path

    def schema(self):
        from pyspark.sql.types import StructType

        with open(os.path.join(self._path(), MANIFEST)) as f:
            return StructType.fromJson(json.load(f)["schema"])

    def reader(self, schema) -> DataSourceReader:
        return _ArrowDirReader(self._path())

    def writer(self, schema, overwrite: bool):
        return _ArrowDirWriter(self._path(), schema.json(), overwrite)


def register(spark) -> None:
    spark.dataSource.register(ArrowDirDataSource)
