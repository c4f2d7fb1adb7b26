"""Generate golden schema+hash files for the TPC query corpus.

Mirrors the reference's golden-file strategy (TPCHQuerySuite.scala:45-71:
per query, assert (a) the result schema DDL and (b) a checked-in content
hash; goldens live beside the queries). Ours cover every tpch_* and
tpcds_q* registry entry at sf0.001 and store:

  {"schema": simpleString DDL, "rows": row count, "hash": md5 of the
   canonicalized, column-name-sorted, row-sorted values}

The hash canonicalization matches tools/verify.py (and the driver): floats
to 10 significant digits, timestamps stringified, columns sorted by name —
so a golden mismatch means the RESULT changed, not formatting.

Usage: python tools/gen_goldens.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.verify import canon, rows_key  # noqa: E402


def result_fingerprint(df) -> dict:
    cols = sorted(df.columns)
    rows = [tuple(canon(r[c]) for c in cols) for r in df.collect()]
    rows.sort(key=rows_key)
    digest = hashlib.md5(
        json.dumps(rows, default=str, separators=(",", ":")).encode()
    ).hexdigest()
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return {"schema": schema, "rows": len(rows), "hash": digest}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
            "goldens",
        )
    )
    os.makedirs(out_dir, exist_ok=True)

    from kyuubi_spark.queries import all_queries
    from kyuubi_spark.session import build_session

    spark = build_session(app_name="gen-goldens")
    n = 0
    for name, spec in all_queries().items():
        if not (name.startswith("tpch_") or name.startswith("tpcds_q")):
            continue
        fp = result_fingerprint(spec.builder(spark, sf_dir))
        with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
            json.dump(fp, f, indent=1, sort_keys=True)
        n += 1
        print(f"golden {name}: rows={fp['rows']} hash={fp['hash'][:12]}")
    print(f"wrote {n} goldens to {out_dir}")


if __name__ == "__main__":
    main()
