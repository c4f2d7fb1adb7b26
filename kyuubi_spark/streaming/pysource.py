"""Streaming Python DataSource: a deterministic tick source (Spark 4).

The streaming leg of the Python-DataSource connector story
(sources/pyds.py covers batch scan, sources/arrowdir.py the write path)
— capability parity with how the reference's Flink engine exposes
unbounded sources through one gateway surface (SURVEY §2.I). The source
is OFFSET-PURE: row k is a pure function of k, so

- ``initialOffset``/``read(start)`` advance a monotone offset in
  batch-sized steps (the microbatch contract), and
- ``readBetweenOffsets(start, end)`` regenerates EXACTLY the rows of any
  committed range — the exactly-once replay hook Spark calls when a
  restarted query must re-read a batch that was planned but not yet
  committed (tested directly in tests/test_streaming.py).

AvailableNow caveat (pinned by test): Spark's prefetch-based simple
stream reader drains ONE prefetched batch under Trigger.AvailableNow, so
bounded replays size ``batch`` >= ``rows`` to consume everything in a
single microbatch; an always-on query with a processing-time trigger
advances through every batch as normal.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

FORMAT_NAME = "kyuubi_ticks"


def tick_row(k: int) -> tuple:
    """Row k — shared with the registry oracle's generate_series form."""
    return (k, k * 7 % 5, k * 31 % 1000)


class _TickStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.batch = int(options.get("batch", "1000"))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        i = start["i"]
        if i >= self.rows:
            return iter([]), start
        end = min(i + self.batch, self.rows)
        return iter([tick_row(k) for k in range(i, end)]), {"i": end}

    def readBetweenOffsets(self, start, end):
        # offset-pure: any committed range replays bit-identically
        return iter([tick_row(k) for k in range(start["i"], end["i"])])


class TickStreamSource(DataSource):
    """spark.readStream.format("kyuubi_ticks").option("rows", n).load()"""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "k long, grp long, value long"

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _TickStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TickStreamSource)
