"""SparkSession bootstrap + test-corpus table loading.

Scale notes (100 TB target):
- AQE on: runtime partition coalescing, skew-join splitting, and join-strategy
  re-planning replace the reference's hand-rolled ``DynamicShufflePartitions``/
  ``InsertShuffleNodeBeforeJoin`` rules (SURVEY.md §2.F — both superseded by AQE).
- ``maxPartitionBytes`` 128m keeps scan tasks executor-memory-sized at any SF.
- Tiny dimensions (region=5, nation=25 rows at every SF) are explicitly
  broadcast in queries; everything else is left to AQE's size-based choice so
  the same plan code works at sf0.001 and at 100 TB.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession, functions as F

# Tables the driver materializes (TESTDATA.md).
TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
AUX_TABLES = ("events", "documents", "embeddings")
ALL_TABLES = TPCH_TABLES + AUX_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Confs that are safe (and required) to set on an externally-provided session.
# All of these are runtime-settable SQLConf entries.
_RUNTIME_CONFS = {
    # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet reader
    # rejects by default; read as long and convert (see load_tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # AQE family — runtime re-planning at scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamp semantics (testdata is timezone-naive).
    "spark.sql.session.timeZone": "UTC",
    # Arrow transfers for any pandas/UDF interchange.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs; safe on a session we did not build."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment — builder-level conf applies
    return spark


def build_session(
    app_name: str = "kyuubi-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build the engine's root SparkSession.

    Mirrors the reference engine bootstrap (kyuubi SparkSQLEngine.scala
    createSpark): one root session; gateway sessions are ``newSession()``
    clones sharing the SparkContext (SparkSQLSessionManager.scala:126-138).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        # Hundreds of distinct codegen'd plans share this JVM (423-query
        # sweeps; a long-lived gateway serves even more).  The JVM default
        # 240m JIT code cache fills mid-sweep and flushes hot methods —
        # observed as a late-sweep query intermittently running 10x its
        # isolated time while neighbors drift +0.5-1s.  512m is the
        # standard remedy for many-query Spark drivers (Spark tuning docs)
        # and is workload-, not scale-factor-, dependent.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:ReservedCodeCacheSize=512m",
            ),
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_runtime_confs(spark)


# Lazy-DataFrame memo: (realpath, mtime_ns, size) -> DataFrame, per live
# session.  ``spark.read.parquet`` costs ~120-190 ms of driver-side file
# listing + schema inference PER CALL; with 400+ registry queries each
# re-loading 1-4 corpus tables that is minutes of pure metadata re-work per
# sweep.  The memo holds only the LAZY plan (scan node + the events ts
# normalization) — every action still reads the parquet files; no data or
# results are cached.  Keyed on file identity (mtime_ns + size) so a
# rewritten testdata file invalidates its entry, and weakly on the session
# so stopped sessions release their plans.
_TABLE_MEMO: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table with normalized column types.

    Normalizations (FIXTURES.md §4b):
    - ``events.ts`` arrives as raw nanos (via nanosAsLong); convert to
      TIMESTAMP_NTZ by integer-dividing to micros — matches DuckDB's
      truncation of nano parquet timestamps.
    """
    ensure_runtime_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = None
    try:
        st = os.stat(path)
        if os.path.isdir(path):
            # Directory-style dataset: rewriting a part file in place
            # (same name/size) can leave the dir stat unchanged on some
            # filesystems, serving a stale memoized scan (ADVICE r13).
            # Fingerprint the children instead: max mtime_ns + total
            # size + entry count over the directory listing — one
            # scandir, still far cheaper than a fresh spark.read.
            mx, total, n = st.st_mtime_ns, 0, 0
            with os.scandir(path) as it:
                for e in it:
                    s2 = e.stat()
                    mx = max(mx, s2.st_mtime_ns)
                    total += s2.st_size
                    n += 1
            key = (os.path.realpath(path), mx, total, n)
        else:
            key = (os.path.realpath(path), st.st_mtime_ns, st.st_size)
        memo = _TABLE_MEMO.setdefault(spark, {})
        cached = memo.get(key)
        if cached is not None:
            return cached
    except (OSError, TypeError):
        memo = None  # unstattable path or unhashable session: no memo
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    if key is not None and memo is not None:
        memo[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load every corpus table; optionally register temp views (SQL surface)."""
    out: dict[str, DataFrame] = {}
    for name in ALL_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        out[name] = df
        if register_views:
            df.createOrReplaceTempView(name)
    return out
