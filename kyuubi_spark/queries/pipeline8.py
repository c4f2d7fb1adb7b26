"""Pipeline batch 8: contrastive training-pair mining.

``contrastive_pair_mining`` — the data-side half of contrastive
embedding fine-tuning: for a set of anchor vectors, mine POSITIVE pairs
(same-SRP-bucket candidates whose rounded cosine clears the near-dup
threshold) and HARD negative pairs (same-bucket candidates below it but
above the easy-negative floor).  Hard negatives from the ANN candidate
set are the standard recipe (they collide in the index — plausible —
yet are not duplicates, so they carry gradient; random negatives don't).

100 TB design: rides the verified SRP-LSH machinery
(functions/similarity.py srp_buckets_df — one map-side-combined
aggregate per vector, then a bucket EQUI-join; never all-pairs), anchors
broadcast.  Value-exact against the DuckDB oracle because the bucketing
weights and the rounded-cosine scoring are the same pure md5/decimal
expressions the knn_cosine_lsh oracle replays (queries/pipeline.py
_SRP_TOP5_CTE).

Reference analog: none — extends the reference's surface per the
LLM-pipeline mandate, on the embeddings table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.functions import similarity as S
from kyuubi_spark.queries import query
from kyuubi_spark.queries.pipeline import _COSINE_CTE, _SRP_TOP5_CTE
from kyuubi_spark.session import load_table

_POS_MIN = 0.15  # the embedding_near_dup threshold: >= this is a positive
_NEG_MIN = 0.0  # below this a same-bucket candidate is an easy negative


@query(
    "contrastive_pair_mining",
    oracle=f"""
    WITH {_COSINE_CTE},
    {_SRP_TOP5_CTE}
    SELECT query_id AS anchor_id, neighbor_id AS pair_id,
           CASE WHEN score >= {_POS_MIN} THEN 'pos' ELSE 'hardneg' END
             AS pair_type,
           score
    FROM srp_scored
    WHERE score >= {_NEG_MIN}
    ORDER BY anchor_id, pair_id
    """,
    doc="Contrastive training-pair mining: per anchor, positives = "
    "same-SRP-bucket candidates with cosine >= 0.15 (the near-dup "
    "threshold), hard negatives = same-bucket candidates in [0, 0.15) — "
    "the ANN-candidate hard-negative recipe for contrastive embedding "
    "fine-tuning. Bucketing and scoring reuse the verified SRP-LSH "
    "kernel (one aggregate + bucket equi-join, no all-pairs), so the "
    "pair set is value-exact across engines.",
)
def contrastive_pair_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 10)
    return S.contrastive_pairs(
        emb, anchors, pos_min=_POS_MIN, neg_min=_NEG_MIN
    ).orderBy("anchor_id", "pair_id")
