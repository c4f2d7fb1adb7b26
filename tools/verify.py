"""Local correctness harness — mirrors the driver's DuckDB-oracle compare.

For every registry entry with an oracle: run the Spark builder and the DuckDB
SQL on the same sf dir, sort columns by name and rows by value, and compare
cell-by-cell (exact, after canonicalization). Prints one line per query plus
a first-differences dump on mismatch.

Usage: python tools/verify.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    """Canonicalize a cell for cross-engine compare (driver-style)."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 and excess precision
        return f"{v:.10g}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_key(row):
    return tuple((x is None, str(x)) for x in row)


# DuckDB widens integer SUM (and a few other aggregates) to HUGEINT/int128
# while Spark stays BIGINT.  The driver's value-hash is type-sensitive, so a
# surfaced HUGEINT column hash-mismatches even when every value is equal —
# this bug class shipped in r01 (json_variant/zorder) and again in r03
# (eight TPC-DS ports).  Every oracle must CAST such aggregates to BIGINT.
_FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "UHUGEINT")


def lint_oracle(con, oracle_sql):
    """Surfaced oracle columns whose DuckDB type cannot hash-match Spark.

    Uses ``DESCRIBE <query>`` (binds and types the query without executing
    it), so it is cheap enough to run over the whole registry.  Returns a
    list of (column_name, duckdb_type) offenders — empty means clean.
    """
    rows = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    return [
        (name, dtype)
        for name, dtype, *_ in rows
        if any(t in dtype.upper() for t in _FORBIDDEN_ORACLE_TYPES)
    ]


def spark_result(spark, spec, sf_dir):
    """Run the Spark builder → (sorted cols, canonicalized sorted rows)."""
    sdf = spec.builder(spark, sf_dir)
    s_cols = sorted(sdf.columns)
    s_rows = [tuple(canon(r[c]) for c in s_cols) for r in sdf.collect()]
    s_rows.sort(key=rows_key)
    return s_cols, s_rows


def duck_result(con, oracle_sql):
    """Run the oracle SQL → (sorted cols, canonicalized sorted rows)."""
    res = con.execute(oracle_sql)
    o_cols_raw = [d[0] for d in res.description]
    o_all = res.fetchall()
    order = sorted(range(len(o_cols_raw)), key=lambda i: o_cols_raw[i])
    o_cols = [o_cols_raw[i] for i in order]
    o_rows = [tuple(canon(r[i]) for i in order) for r in o_all]
    o_rows.sort(key=rows_key)
    return o_cols, o_rows


def compare(spark, con, spec, sf_dir):
    """Driver-style compare. Returns (ok, detail_message)."""
    s_cols, s_rows = spark_result(spark, spec, sf_dir)
    if spec.oracle is None:
        return True, f"rows-only ({len(s_rows)} rows)"
    o_cols, o_rows = duck_result(con, spec.oracle)
    if s_cols != o_cols:
        return False, f"schema {s_cols} != {o_cols}"
    if len(s_rows) != len(o_rows):
        return False, (
            f"rowcount {len(s_rows)} != {len(o_rows)}"
            f"\n  spark[:3]={s_rows[:3]}\n  duck [:3]={o_rows[:3]}"
        )
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    if bad:
        msg = [f"{len(bad)}/{len(s_rows)} differing rows; first:"]
        for i, a, b in bad[:3]:
            msg.append(f"  [{i}] spark={a}\n      duck ={b}")
        return False, "\n".join(msg)
    return True, f"{len(s_rows)} rows"


def run(sf_dir: str, only: list[str]) -> int:
    from kyuubi_spark.caching import release_caches
    from kyuubi_spark.queries import all_queries
    from kyuubi_spark.session import build_session

    spark = build_session(app_name="verify", extra_conf={"spark.sql.shuffle.partitions": "8"})

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    specs = all_queries()
    names = only or list(specs)
    failures = 0
    for name in names:
        spec = specs[name]
        try:
            if spec.oracle is not None:
                offenders = lint_oracle(con, spec.oracle)
                if offenders:
                    print(f"FAIL  {name}: oracle lint: uncast wide-integer "
                          f"columns {offenders} (CAST ... AS BIGINT)")
                    failures += 1
                    continue
            ok, detail = compare(spark, con, spec, sf_dir)
        except Exception as e:
            print(f"FAIL  {name}: error: {e}")
            failures += 1
            continue
        else:
            if ok:
                tag = "ok~  " if spec.oracle is None else "OK   "
                print(f"{tag} {name}: {detail}")
            else:
                print(f"FAIL  {name}: {detail}")
                failures += 1
        finally:
            release_caches()
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    rest = args[1:] if args and os.path.isdir(args[0]) else args
    sys.exit(run(sf, rest))
