"""Run ONE registry query against a corpus dir in a FRESH Spark
session and print a single JSON line {"wall_sec": ..., "rows": ...}.

Exists for bench.py's sf10 third-point lane: a 100x-corpus iterative
query (kcore / triangle) needs the WHOLE driver heap, not what is left
of it after ~11k stages of bench session history — r13 measured the
in-session form dying with Java-heap OOM exactly there, taking the
SparkContext (and every lane after it) down with it.  A subprocess per
query gives each probe a clean heap and turns a probe crash into one
recorded error row instead of a dead bench.

Wall time is measured INSIDE (builder + count only), so JVM startup is
not charged to the query.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    name, dst = sys.argv[1], sys.argv[2]
    from kyuubi_spark.queries import all_queries
    from kyuubi_spark.session import build_session

    spark = build_session(f"third-point-{name}")
    specs = all_queries()
    t0 = time.perf_counter()
    n = specs[name].builder(spark, dst).count()
    print(
        json.dumps(
            {"wall_sec": round(time.perf_counter() - t0, 3), "rows": n}
        )
    )


if __name__ == "__main__":
    main()
