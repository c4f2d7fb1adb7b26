"""Deterministic N× scale-up of the driver's parquet corpus.

Builds an sf1-class dataset from sf0.1 by SHARDED REPLICATION: every
table is cross-joined with ``range(factor)`` and every entity key is
shifted by ``shard * OFFSET``, so the result is ``factor`` disjoint
key-universes of the source data.  Properties that make this the right
scale-proof input:

- FK joins never cross shards, so relational results scale exactly
  linearly — a superlinear wall at 10× is a PLAN problem, not a data
  artifact;
- content columns (document text, embeddings, event values) repeat
  across shards, so content-keyed operators (exact/near dedup, ANN
  buckets) see genuine cross-shard load — clusters grow ×factor;
- fixed dimensions (region, nation) are copied verbatim, as real dims
  don't scale with fact data — broadcast-ability is preserved;
- ``events.ts`` stays in its on-disk nanos-as-bigint form, so
  session.load_table's normalization path is identical at every SF.

Usage: ``ensure_scaled(spark, src, dst)`` — idempotent (marker file);
``python tools/scale_data.py [src] [dst] [factor]`` to prebuild.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# larger than any key in the corpus at sf0.1 (max ~600k), so shifted
# key-universes never collide
OFFSET = 1 << 24

# key columns shifted per shard; [] = fixed dimension, copied verbatim
TABLE_KEYS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def ensure_scaled(spark, src_dir: str, dst_dir: str, factor: int = 10) -> str:
    """Build (once) and return the scaled corpus directory."""
    from pyspark.sql import functions as F

    from kyuubi_spark.session import ensure_runtime_confs

    marker = os.path.join(dst_dir, f"_SCALED_x{factor}_OK")
    if os.path.exists(marker):
        return dst_dir
    ensure_runtime_confs(spark)  # nanos-as-long for events
    os.makedirs(dst_dir, exist_ok=True)
    shards = F.broadcast(
        spark.range(factor).select(F.col("id").alias("_shard"))
    )
    for name, keys in TABLE_KEYS.items():
        src = os.path.join(src_dir, f"{name}.parquet")
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        out = os.path.join(dst_dir, f"{name}.parquet")
        if not keys:
            df.write.mode("overwrite").parquet(out)
            continue
        wide = df.crossJoin(shards)
        for k in keys:
            wide = wide.withColumn(
                k,
                (F.col(k) + F.col("_shard") * F.lit(OFFSET)).cast(
                    dict(df.dtypes)[k]
                ),
            )
        wide.drop("_shard").write.mode("overwrite").parquet(out)
    with open(marker, "w") as f:
        f.write("ok")
    return dst_dir


def main() -> None:
    from kyuubi_spark.session import build_session

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kyuubi_spark_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = build_session(app_name="scale-data")
    ensure_scaled(spark, src, dst, factor)
    for name in TABLE_KEYS:
        p = os.path.join(dst, f"{name}.parquet")
        if os.path.exists(p):
            print(name, spark.read.parquet(p).count())


if __name__ == "__main__":
    main()
