"""Round-13 optimization probe: isolate and time single queries.

Usage:
  python tools/opt_probe.py time  [sf_dir] name [name ...]   # repeat-timed
  python tools/opt_probe.py plan  [outdir_suffix] [sf_dir] name [name ...]

`time` runs each named query the same way bench.py does (builder +
count, release_caches after) N times (SPARK_GRAFT_PROBE_REPS, default 3)
and prints each sample plus the median — quiet-box isolation for
before/after comparisons without a full 423-query sweep.

`plan` writes plans/<round>/<name>_<suffix>.txt (SPARK_GRAFT_PLAN_ROUND,
default r14) containing
df.explain(formatted) for each named query (builders that execute work
during build still produce their final-plan explain; the file notes it).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    suffix = "before"
    if mode == "plan" and args and not args[0].startswith("/") and args[0] in (
        "before",
        "after",
    ):
        suffix = args.pop(0)
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0].startswith("/"):
        sf_dir = args.pop(0)
    names = args

    from kyuubi_spark.caching import release_caches
    from kyuubi_spark.queries import all_queries
    from kyuubi_spark.session import build_session

    spark = build_session(app_name="opt-probe")
    specs = all_queries()
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14")
    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", rnd), exist_ok=True)

    # warm like bench.py does
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    if mode == "time":
        reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "3"))
        for name in names:
            samples = []
            for _ in range(reps):
                t0 = time.perf_counter()
                try:
                    df = specs[name].builder(spark, sf_dir)
                    df.count()
                    samples.append(round(time.perf_counter() - t0, 3))
                except Exception as e:  # noqa: BLE001
                    print(f"{name}: ERROR {e}", flush=True)
                    samples.append(-1.0)
                finally:
                    release_caches()
            med = sorted(samples)[len(samples) // 2]
            print(f"{name}: median={med} samples={samples}", flush=True)
    elif mode == "plan":
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for name in names:
            out = os.path.join(here, "plans", rnd, f"{name}_{suffix}.txt")
            try:
                df = specs[name].builder(spark, sf_dir)
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(out, "w") as f:
                    f.write(buf.getvalue())
                print(f"wrote {out}", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: plan ERROR {e}", flush=True)
            finally:
                release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
