"""TPC-H generator as a REAL Spark connector (Python DataSource API).

Capability parity with the reference's DSv2 TPC-H connector
(extensions/spark/kyuubi-spark-connector-tpch/.../TPCHBatchScan.scala:39-91:
table split into InputPartition key-range chunks, each chunk running an
independent row generator; `TPCHTable` implements SupportsPushDownFilters
semantics via Spark's scan pipeline). sources/datagen.py covers the
row-generation capability with mapInPandas; THIS module covers the
*connector* shape — `spark.read.format("kyuubi_tpch")` — using Spark 4's
Python DataSource API, so the generator participates in the scan pipeline
like any catalog source:

- ``partitions()`` splits the key space into ``numPartitions`` ranges —
  the InputPartition chunking of TPCHBatchScan.scala:56-74 — so a
  1000-executor cluster generates 1000 ranges concurrently with zero
  driver materialization.
- with ``.option("pushdown", "true")`` (plus the session conf
  ``spark.sql.python.filterPushdown.enabled``), ``pushFilters()``
  accepts EqualTo/In on the low-cardinality derived columns
  (c_mktsegment, c_nationkey) and prunes INSIDE the generator: only
  keys whose modular image matches are emitted, so a pushed filter
  skips row construction entirely, not just post-filters (the DSv2
  "filter reaches the scan" contract). Pushdown is OPT-IN because of an
  upstream plan-cache quirk: a FILTERLESS replan of one loaded
  DataFrame can reuse the previously pushed-down scan (count() after a
  filtered count() returns the pruned total) — opting in binds you to
  the fresh-``.load()``-per-query pattern the registry entry and tests
  follow; the default reader has no pushFilters and is immune.
- ``read()`` yields Arrow RecordBatches (numpy-vectorized), never
  per-row Python tuples — the Arrow-batch wire the API provides for
  exactly this.

Row formulas are shared with sources/datagen.py (pure modular functions
of the row key), so the connector, the mapInPandas generator, and the
DuckDB oracles all agree value-exactly.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)

from kyuubi_spark.sources.datagen import SEGMENTS

FORMAT_NAME = "kyuubi_tpch"

# modular-arithmetic column images a pushed filter can invert (keys are
# kept iff image(key) lands in the wanted set):
#   c_mktsegment = SEGMENTS[key % 5]
#   c_nationkey  = key * 2654435761 % 25


class _RangePartition(InputPartition):
    """Key range plus (segment, nation) keep-sets (None = all).

    The pruning set travels IN the partition: Spark plans the read in a
    fresh worker process (a new reader instance per planning — pyspark
    data_source_pushdown_filters.py), so the partition list is the only
    state that reaches executors. See the module docstring for why
    pushdown (and with it non-None keep sets) is opt-in."""

    def __init__(
        self,
        start: int,
        end: int,
        keep_segments: tuple | None,
        keep_nations: tuple | None,
    ):
        self.start = start
        self.end = end
        self.keep_segments = keep_segments
        self.keep_nations = keep_nations


class _CustomerReader(DataSourceReader):
    """customer generator: keys [0, n) -> rows, chunked like
    TPCHBatchScan.scala:56-74 splits its key space. No pushFilters here:
    the mere presence of the method opts into Spark's Python-DS pushdown
    machinery (and its plan-cache caveat), so the always-correct default
    reader stays pushdown-free and _PushdownCustomerReader adds it."""

    def __init__(self, options):
        self.n = max(1, int(float(options.get("sf", "0.001")) * 150_000))
        self.num_partitions = int(options.get("numpartitions", "8"))
        # residues to keep per pushed column, or None = no pruning
        self._keep_segments: set[int] | None = None
        self._keep_nations: set[int] | None = None

    def partitions(self):
        segs = (
            tuple(sorted(self._keep_segments))
            if self._keep_segments is not None
            else None
        )
        nats = (
            tuple(sorted(self._keep_nations))
            if self._keep_nations is not None
            else None
        )
        # consume this round's filters (see _RangePartition docstring)
        self._keep_segments = None
        self._keep_nations = None
        per = max(1, -(-self.n // self.num_partitions))  # ceil division
        return [
            _RangePartition(lo, min(lo + per, self.n), segs, nats)
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _RangePartition):
        import numpy as np
        import pyarrow as pa

        keys = np.arange(partition.start, partition.end, dtype=np.int64)
        if partition.keep_segments is not None:
            keys = keys[np.isin(keys % 5, partition.keep_segments)]
        if partition.keep_nations is not None:
            keys = keys[np.isin(keys * 2654435761 % 25, partition.keep_nations)]
        if len(keys) == 0:
            return
        # the shared formula helper is the single source of truth for
        # the value contract (datagen.customer_columns)
        from kyuubi_spark.sources.datagen import customer_columns

        yield pa.record_batch(customer_columns(keys))


class _PushdownCustomerReader(_CustomerReader):
    """The opt-in pushdown variant (see module docstring)."""

    @staticmethod
    def _wanted(f: Filter, decode) -> set[int] | None:
        """Decode an EqualTo/In filter's value(s) into residues, or None
        when any value is outside the column's domain (not pushable)."""
        values = [f.value] if isinstance(f, EqualTo) else list(f.value)
        out = set()
        for v in values:
            r = decode(v)
            if r is None:
                return None
            out.add(r)
        return out

    def pushFilters(self, filters: list[Filter]):
        """Accept EqualTo/In on c_mktsegment and c_nationkey: both are
        modular images of the key, so the filter prunes key GENERATION
        itself (only keys whose image lands in the wanted set are
        emitted) — the scan produces ~|wanted|/modulus of the rows
        instead of post-filtering. Everything else is returned for
        Spark to evaluate."""
        # fresh round: never accumulate across replans of this relation
        self._keep_segments = None
        self._keep_nations = None

        def seg(v):
            return SEGMENTS.index(v) if isinstance(v, str) and v in SEGMENTS else None

        def nat(v):
            return int(v) if isinstance(v, int) and 0 <= v < 25 else None

        remaining = []
        for f in filters:
            keep = None
            if isinstance(f, (EqualTo, In)) and f.attribute == ("c_mktsegment",):
                keep = self._wanted(f, seg)
                if keep is not None:
                    self._keep_segments = (
                        keep
                        if self._keep_segments is None
                        else self._keep_segments & keep
                    )
            elif isinstance(f, (EqualTo, In)) and f.attribute == ("c_nationkey",):
                keep = self._wanted(f, nat)
                if keep is not None:
                    self._keep_nations = (
                        keep
                        if self._keep_nations is None
                        else self._keep_nations & keep
                    )
            if keep is None:
                remaining.append(f)
        return remaining


class KyuubiTPCHDataSource(DataSource):
    """spark.read.format("kyuubi_tpch").option("table", "customer")
    .option("sf", "0.01").load()"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        table = self.options.get("table", "customer")
        if table != "customer":
            raise ValueError(
                f"kyuubi_tpch: unsupported table {table!r} (the connector "
                "shape is demonstrated on customer; sources/datagen.py "
                "generates every table as DataFrames)"
            )
        return (
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string"
        )

    def reader(self, schema) -> DataSourceReader:
        if str(self.options.get("pushdown", "false")).lower() == "true":
            # loud, user-facing statement of the opt-in contract (the
            # module docstring documents the upstream plan-cache quirk;
            # this reaches users who never read it)
            import warnings

            warnings.warn(
                "kyuubi_tpch pushdown=true: reuse of ONE loaded DataFrame "
                "across differently-filtered queries can replay a pruned "
                "scan (upstream Python-DataSource plan cache). Call "
                ".load() freshly per query, or drop the pushdown option.",
                stacklevel=2,
            )
            return _PushdownCustomerReader(self.options)
        return _CustomerReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the format with a session."""
    spark.dataSource.register(KyuubiTPCHDataSource)
