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


@query(
    "forget_closure",
    oracle=None,  # assigned below (needs pipeline's pair CTE f-string)
    doc="Deletion-request propagation (right-to-be-forgotten over a "
    "training corpus): a removal request for a document must also remove "
    "its NEAR-DUPLICATES, or paraphrases of the forgotten text stay in "
    "the training set. The closure = every doc sharing a MinHash-LSH + "
    "Jaccard>=1/4 dup component with a requested doc, plus the requests "
    "themselves; reasons distinguish direct requests from propagation. "
    "Rides the verified LSH pair set and min-label components — the "
    "request list and its component ids are tiny and broadcast, so the "
    "only corpus-scaled work is the dedup pass a pipeline already runs.",
)
def forget_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    requests = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id")
    sh = D.shingle_arrays_df(docs).localCheckpoint()
    cand = D.lsh_candidate_pairs(docs, n=3, num_hashes=16, bands=8, shingle_arrays=sh)
    pairs = D.jaccard_pairs(
        docs, cand, n=3, tau_num=1, tau_den=4, shingle_arrays=sh
    ).select("a_id", "b_id")
    comp = D.connected_components(pairs)
    req_comps = (
        comp.join(requests, "doc_id").select("component_id").distinct()
    )
    propagated = comp.join(F.broadcast(req_comps), "component_id").select(
        "doc_id"
    )
    closure = propagated.unionByName(requests).distinct()
    return closure.select(
        "doc_id",
        F.when(F.col("doc_id") % 97 == 0, F.lit("requested"))
        .otherwise(F.lit("near_dup_of_requested"))
        .alias("reason"),
    ).orderBy("doc_id")


def _attach_forget_oracle() -> None:
    from kyuubi_spark.queries import REGISTRY, QuerySpec
    from kyuubi_spark.queries.pipeline import _MINHASH_PAIRS_CTE

    oracle = f"""
    WITH RECURSIVE {_MINHASH_PAIRS_CTE},
    edges AS (
      SELECT a_id AS u, b_id AS v FROM dup_pairs
      UNION ALL
      SELECT b_id, a_id FROM dup_pairs),
    reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
    comp AS (SELECT u AS doc_id, MIN(v) AS component_id
             FROM reach GROUP BY u),
    req AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
    req_comp AS (SELECT DISTINCT component_id
                 FROM comp JOIN req USING (doc_id)),
    closure AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_id FROM comp
        WHERE component_id IN (SELECT component_id FROM req_comp)
        UNION ALL
        SELECT doc_id FROM req) u)
    SELECT doc_id,
           CASE WHEN doc_id % 97 = 0 THEN 'requested'
                ELSE 'near_dup_of_requested' END AS reason
    FROM closure ORDER BY doc_id
    """
    spec = REGISTRY["forget_closure"]
    REGISTRY["forget_closure"] = QuerySpec(
        name=spec.name, builder=spec.builder, oracle=oracle, doc=spec.doc
    )


_attach_forget_oracle()


@query(
    "ann_index_report",
    oracle=f"""
    WITH {_COSINE_CTE},
    cent0 AS (
      SELECT vec_id, embedding, nrm FROM e
      WHERE vec_id % 16 = 0 ORDER BY vec_id LIMIT 16),
    cent AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
             embedding, greatest(nrm, 1e-12) AS cnrm
      FROM cent0),
    sim AS (
      SELECT v.vec_id, c.cell,
             list_sum(list_transform(generate_series(1, 64),
               i -> CAST(v.embedding[i] AS DOUBLE)
                    * CAST(c.embedding[i] AS DOUBLE)))
               / (greatest(v.nrm, 1e-12) * c.cnrm) AS d
      FROM e v, cent c),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, cell) AS r
        FROM sim) t WHERE r = 1),
    cells AS (SELECT cell, COUNT(*) AS n FROM assign GROUP BY cell)
    SELECT 16 AS n_cells,
           CAST(COUNT(*) AS BIGINT) AS cells_used,
           CAST(16 - COUNT(*) AS BIGINT) AS cells_empty,
           CAST(MIN(n) AS BIGINT) AS min_cell,
           CAST(MAX(n) AS BIGINT) AS max_cell,
           ROUND(MAX(n) * 16.0 / SUM(n), 4) AS imbalance
    FROM cells
    """,
    doc="ANN index health report: per-cell population of the IVF coarse "
    "quantizer aggregated to used/empty cell counts and the imbalance "
    "factor (max cell / mean cell) — the continuous monitoring signal "
    "for a production vector index (a hot cell caps probe-time "
    "parallelism and recall; re-train centroids when imbalance drifts). "
    "One vectorized assignment pass + a 16-row aggregate; the "
    "deterministic centroid sample makes the whole report SQL-replayable "
    "(same assignment CTE the knn_cosine_ivf oracle verifies).",
)
def ann_index_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = S.ivf_assign(emb, n_cells=16)
    cells = assigned.groupBy("cell").agg(F.count("*").alias("n"))
    from kyuubi_spark.functions.compat import dround

    return cells.agg(
        F.lit(16).alias("n_cells"),
        F.count("*").alias("cells_used"),
        (F.lit(16) - F.count("*")).cast("bigint").alias("cells_empty"),
        F.min("n").alias("min_cell"),
        F.max("n").alias("max_cell"),
        dround(F.max("n") * 16.0 / F.sum("n"), 4).alias("imbalance"),
    )


@query(
    "snapshot_psi_drift",
    oracle="""
    WITH src AS (SELECT DISTINCT source FROM documents),
    grid AS (SELECT source, b
             FROM src, (SELECT unnest(generate_series(0, 7)) AS b)),
    c AS (SELECT source, LEAST(7, n_chars // 200) AS b,
            SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ca,
            SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS cb
          FROM documents GROUP BY 1, 2),
    f AS (SELECT g.source, g.b,
                 COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
          FROM grid g LEFT JOIN c ON c.source = g.source AND c.b = g.b),
    t AS (SELECT source, SUM(ca) AS na, SUM(cb) AS nb FROM f GROUP BY source)
    SELECT f.source,
           CAST(MIN(t.na) AS BIGINT) AS n_a,
           CAST(MIN(t.nb) AS BIGINT) AS n_b,
           ROUND(SUM(((ca + 1.0) / (na + 8.0) - (cb + 1.0) / (nb + 8.0))
                     * ln(((ca + 1.0) / (na + 8.0))
                          / ((cb + 1.0) / (nb + 8.0)))), 4) AS psi
    FROM f JOIN t USING (source)
    GROUP BY f.source ORDER BY f.source
    """,
    doc="Population-stability-index drift between two corpus snapshots "
    "(halves split by doc_id parity here; time-window snapshots in "
    "production), per source, over 8 fixed document-length buckets with "
    "add-one smoothing: PSI = sum_b (p_a - p_b) ln(p_a / p_b). The "
    "standard ingestion-monitoring gate — PSI > 0.2 on a source means "
    "its length distribution shifted enough to re-examine before "
    "training. Scale shape: one map-side-combined (source, bucket) "
    "aggregate, a broadcast 8-row-per-source grid for empty buckets, "
    "and a |sources|-row final aggregate; both engines sum the same "
    "IEEE ln terms and round to 4 (the source_unigram_kl precedent).",
)
def snapshot_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.least(F.lit(7), F.floor(F.col("n_chars") / 200)).cast(
        "bigint"
    )
    c = docs.groupBy(
        "source", bucket.alias("b")
    ).agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0)).alias("cb"),
    )
    srcs = docs.select("source").distinct()
    grid = srcs.crossJoin(
        F.broadcast(spark.range(8).select(F.col("id").alias("b")))
    )
    f = (
        grid.join(c, ["source", "b"], "left")
        .na.fill({"ca": 0, "cb": 0})
    )
    t = f.groupBy("source").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    pa = (F.col("ca") + 1.0) / (F.col("na") + 8.0)
    pb = (F.col("cb") + 1.0) / (F.col("nb") + 8.0)
    return (
        f.join(t, "source")
        .groupBy("source")
        .agg(
            F.min("na").cast("bigint").alias("n_a"),
            F.min("nb").cast("bigint").alias("n_b"),
            dround(F.sum((pa - pb) * F.log(pa / pb)), 4).alias("psi"),
        )
        .orderBy("source")
    )
