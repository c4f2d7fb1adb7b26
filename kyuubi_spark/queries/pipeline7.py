"""Pipeline batch 7: split-hygiene and embedding-quality operators.

- ``split_leakage_report`` — near-duplicate pairs that straddle the
  deterministic train/val/test split: the contamination mode exact-match
  decontamination misses (a paraphrase of a test doc sitting in train).
  Composes the MinHash-LSH pair machinery (functions/dedup.py) with the
  md5 hash split (functions/text.py hash_split) — the split of a pair
  member is a pure map-side expression on the pair's own id columns, so
  the report costs nothing beyond the LSH pass itself.
- ``embedding_outliers`` — per-label centroid cosine audit: every
  vector's cosine to its class centroid, aggregated to per-label count /
  mean / minimum plus the worst offender id. The mislabeled-or-junk
  detector run before training an embedding-space classifier (and the
  quality gate behind SemDeDup-style cluster pruning).

Both are value-exact against DuckDB oracles. Reference analog: none —
these extend the reference's surface per the LLM-pipeline mandate
(BASELINE.json north star); the dedup kernel they ride is the one
verified by dedup_minhash_lsh.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.functions import dedup as D
from kyuubi_spark.functions import text as T
from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.queries.pipeline import _MINHASH_PAIRS_CTE
from kyuubi_spark.session import load_table

# md5-hex thresholds for the 75/12.5/12.5 split — keep in lockstep with
# functions/text.py hash_split (0.75 * 65536 = 0xc000, 0.875 * 65536 = 0xe000).
_SPLIT_CASE = """
      CASE WHEN substr(md5(CAST({col} AS VARCHAR)), 1, 4) < 'c000' THEN 'train'
           WHEN substr(md5(CAST({col} AS VARCHAR)), 1, 4) < 'e000' THEN 'val'
           ELSE 'test' END"""


@query(
    "split_leakage_report",
    oracle=f"""
    WITH {_MINHASH_PAIRS_CTE},
    sp AS (
      SELECT ROUND(CAST(inter AS DOUBLE) / union_sz, 6) AS j,
             {_SPLIT_CASE.format(col='a_id')} AS sa,
             {_SPLIT_CASE.format(col='b_id')} AS sb
      FROM dup_pairs)
    SELECT least(sa, sb) AS split_lo,
           greatest(sa, sb) AS split_hi,
           CASE WHEN least(sa, sb) <> greatest(sa, sb) THEN 1 ELSE 0 END
             AS leaked,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(SUM(CAST(ROUND(j * 1000000, 0) AS BIGINT)) / 1000000.0
                 / COUNT(*), 6) AS avg_jaccard
    FROM sp GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Near-duplicate pairs (MinHash-LSH, Jaccard>=1/4) bucketed by the "
    "train/val/test assignment of each member: any off-diagonal cell is "
    "train/test leakage that exact-hash decontamination cannot see. The "
    "split of each pair member is a map-side md5 expression on the pair's "
    "id columns — zero joins beyond the LSH pass itself, and the final "
    "aggregate is at most 6 cells regardless of corpus size. Per-pair "
    "jaccard is averaged via integer micro-units so the group sum is "
    "order-exact across engines.",
)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # one materialized shingle relation feeds signature/banding + verify,
    # exactly as dedup_minhash_lsh (kept identical so the pair set is the
    # one the dedup query already value-verifies)
    sh = (
        D.shingle_arrays_df(docs)
        .localCheckpoint()
    )
    cand = D.lsh_candidate_pairs(docs, n=3, num_hashes=16, bands=8, shingle_arrays=sh)
    pairs = D.jaccard_pairs(docs, cand, n=3, tau_num=1, tau_den=4, shingle_arrays=sh)
    sa = T.hash_split("a_id")
    sb = T.hash_split("b_id")
    lo = F.least(sa, sb)
    hi = F.greatest(sa, sb)
    micro = F.round(F.col("jaccard") * 1000000, 0).cast("bigint")
    return (
        pairs.select(
            lo.alias("split_lo"),
            hi.alias("split_hi"),
            F.when(lo != hi, F.lit(1)).otherwise(F.lit(0)).alias("leaked"),
            micro.alias("j_micro"),
        )
        .groupBy("split_lo", "split_hi", "leaked")
        .agg(
            F.count("*").alias("n_pairs"),
            dround(
                F.sum("j_micro") / F.lit(1000000.0) / F.count("*"), 6
            ).alias("avg_jaccard"),
        )
        .orderBy("split_lo", "split_hi")
    )


@query(
    "dedup_quality_survivors",
    oracle=f"""
    WITH RECURSIVE {{pairs_cte}},
    edges AS (
      SELECT a_id AS u, b_id AS v FROM dup_pairs
      UNION ALL
      SELECT b_id, a_id FROM dup_pairs),
    reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
    comp AS (SELECT u AS doc_id, MIN(v) AS component_id FROM reach GROUP BY u),
    m AS (
      SELECT c.component_id, c.doc_id, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
    st AS (
      SELECT component_id, CAST(COUNT(*) AS BIGINT) AS n_members,
             MAX(n_chars) AS max_chars, MIN(doc_id) AS naive_keeper_id,
             MIN_BY(n_chars, doc_id) AS naive_chars
      FROM m GROUP BY 1)
    SELECT st.component_id, st.n_members,
           MIN(k.doc_id) AS keeper_id,
           st.naive_keeper_id,
           CAST(st.max_chars - st.naive_chars AS BIGINT) AS quality_gain
    FROM st
    JOIN m k ON k.component_id = st.component_id AND k.n_chars = st.max_chars
    GROUP BY 1, 2, 4, st.max_chars, st.naive_chars
    ORDER BY 1
    """.format(pairs_cte=_MINHASH_PAIRS_CTE),
    doc="Quality-aware survivor selection: within each near-dup cluster "
    "(MinHash-LSH pairs -> connected components) keep the HIGHEST-QUALITY "
    "member (longest text, ties broken by MIN doc_id — deterministic on "
    "both engines) instead of the naive min-id canonical, and report the "
    "per-cluster quality gain. This is the policy production dedup "
    "actually wants: the duplicate that survives should be the best copy, "
    "not the first-seen one. Every relation after the verified LSH/"
    "component stages is dup-cluster-bounded; the per-cluster argmax is "
    "aggregate + equality-join-back, no window over the corpus.",
)
def dedup_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_arrays_df(docs).localCheckpoint()
    cand = D.lsh_candidate_pairs(docs, n=3, num_hashes=16, bands=8, shingle_arrays=sh)
    pairs = D.jaccard_pairs(
        docs, cand, n=3, tau_num=1, tau_den=4, shingle_arrays=sh
    ).select("a_id", "b_id")
    comps = D.connected_components(pairs)
    m = comps.join(docs.select("doc_id", "n_chars"), "doc_id")
    # n_members / max / naive keeper id AND the naive keeper's quality in
    # ONE aggregate (min_by ties are impossible: doc_id is unique per
    # component) — no join back for the naive side
    st = m.groupBy("component_id").agg(
        F.count("*").alias("n_members"),
        F.max("n_chars").alias("max_chars"),
        F.min("doc_id").alias("naive_keeper_id"),
        F.min_by("n_chars", "doc_id").alias("naive_chars"),
    )
    keeper = (
        m.join(F.broadcast(st), "component_id")
        .filter(F.col("n_chars") == F.col("max_chars"))
        .groupBy(
            "component_id", "n_members", "max_chars",
            "naive_keeper_id", "naive_chars",
        )
        .agg(F.min("doc_id").alias("keeper_id"))
    )
    return (
        keeper.select(
            "component_id",
            "n_members",
            "keeper_id",
            "naive_keeper_id",
            (F.col("max_chars") - F.col("naive_chars"))
            .cast("bigint")
            .alias("quality_gain"),
        )
        .orderBy("component_id")
    )


@query(
    "embedding_outliers",
    oracle="""
    WITH ex AS (
      SELECT vec_id, label, t.i - 1 AS dim,
             CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS t(i)),
    cent AS (
      SELECT label, dim,
             ROUND(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*),
                   6) AS c
      FROM ex GROUP BY 1, 2),
    pv AS (
      SELECT e.vec_id, e.label,
             CAST(SUM(CAST(e.x * c.c AS DECIMAL(38,12))) AS DOUBLE) AS dot,
             CAST(SUM(CAST(e.x * e.x AS DECIMAL(38,12))) AS DOUBLE) AS nx,
             CAST(SUM(CAST(c.c * c.c AS DECIMAL(38,12))) AS DOUBLE) AS nc
      FROM ex e JOIN cent c ON c.label = e.label AND c.dim = e.dim
      GROUP BY 1, 2),
    scored AS (
      SELECT vec_id, label,
             ROUND(dot / sqrt(nx * nc), 6) AS cosc
      FROM pv),
    st AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
             ROUND(SUM(CAST(ROUND(cosc * 1000000, 0) AS BIGINT)) / 1000000.0
                   / COUNT(*), 6) AS avg_cos,
             MIN(cosc) AS min_cos
      FROM scored GROUP BY 1)
    SELECT st.label, st.n_vecs, st.avg_cos, st.min_cos,
           MIN(s.vec_id) AS worst_vec_id
    FROM st JOIN scored s ON s.label = st.label AND s.cosc = st.min_cos
    GROUP BY 1, 2, 3, 4 ORDER BY 1
    """,
    doc="Per-label embedding-quality audit: cosine of every vector to its "
    "label centroid, reduced to count / order-exact mean / minimum and the "
    "arg-min vector id (ties broken by MIN(vec_id), deterministic on both "
    "engines). Centroids are DECIMAL-summed then rounded so both engines "
    "score against bit-identical centroid values; per-vector dot products "
    "DECIMAL-sum 64 cells so task order can't flip a bit. Shuffle profile "
    "at 100 TB: posexplode is map-side, the centroid table is labels x "
    "dims rows (broadcast), per-vector sums are one vec_id-keyed shuffle "
    "with map-side partial aggregation, and everything after is "
    "label-cardinality-bounded.",
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "label", "dim", F.col("xf").cast("double").alias("x"))
    cent = (
        ex.groupBy("label", "dim")
        .agg(
            F.sum(F.col("x").cast("decimal(28,12)")).alias("s"),
            F.count("*").alias("n"),
        )
        .select(
            "label", "dim",
            dround(F.col("s").cast("double") / F.col("n"), 6).alias("c"),
        )
    )
    pv = (
        ex.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("x") * F.col("c")).cast("decimal(38,12)")).alias("dot"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("nx"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,12)")).alias("nc"),
        )
    )
    scored = pv.select(
        "vec_id", "label",
        dround(
            F.col("dot").cast("double")
            / F.sqrt(F.col("nx").cast("double") * F.col("nc").cast("double")),
            6,
        ).alias("cosc"),
    )
    st = scored.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        dround(
            F.sum(F.round(F.col("cosc") * 1000000, 0).cast("bigint"))
            / F.lit(1000000.0) / F.count("*"),
            6,
        ).alias("avg_cos"),
        F.min("cosc").alias("min_cos"),
    )
    return (
        scored.join(F.broadcast(st), "label")
        .filter(F.col("cosc") == F.col("min_cos"))
        .groupBy("label", "n_vecs", "avg_cos", "min_cos")
        .agg(F.min("vec_id").alias("worst_vec_id"))
        .select("label", "n_vecs", "avg_cos", "min_cos", "worst_vec_id")
        .orderBy("label")
    )


_SWEEP_GRID = [(5, 0.6), (5, 0.8), (10, 0.6), (10, 0.8), (20, 0.6), (20, 0.8)]


@query(
    "quality_threshold_sweep",
    oracle=f"""
    WITH grid(min_tokens, max_rep) AS (
      VALUES {", ".join(f"({t}, {r})" for t, r in _SWEEP_GRID)}),
    m AS (
      SELECT len(string_split(trim(text), ' ')) AS ntok,
             ROUND(1.0 - CASE WHEN len(string_split(trim(text), ' ')) >= 3
               THEN CAST(len(list_distinct(list_transform(
                      generate_series(1, len(string_split(trim(text), ' ')) - 2),
                      i -> array_to_string(string_split(trim(text), ' ')[i:i+2], ' '))))
                    AS DOUBLE)
                    / (len(string_split(trim(text), ' ')) - 2)
               ELSE 1.0 END, 4) AS rep
      FROM documents)
    SELECT g.min_tokens, CAST(g.max_rep AS DOUBLE) AS max_rep,
           CAST(SUM(CASE WHEN m.ntok >= g.min_tokens AND m.rep <= g.max_rep
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
           ROUND(CAST(SUM(CASE WHEN m.ntok >= g.min_tokens
                          AND m.rep <= g.max_rep THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS survival_rate,
           ROUND(CAST(SUM(CASE WHEN m.ntok >= g.min_tokens
                          AND m.rep <= g.max_rep THEN m.ntok ELSE 0 END)
                      AS DOUBLE) / SUM(m.ntok), 6) AS kept_token_share
    FROM m CROSS JOIN grid g
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Quality-filter threshold tuning table: for a grid of "
    "(min_tokens, max 3-gram repetition) thresholds, the doc survival "
    "rate and the share of corpus TOKENS kept — the sheet a pipeline "
    "team reads before pinning pipeline_corpus_clean's thresholds "
    "(docs kept and tokens kept diverge when the filters bite long "
    "boilerplate). One map-side pass computes the per-doc signals, the "
    "6-row grid joins as a broadcast multiplying each doc into its "
    "grid cells, and the aggregate is grid-bounded — no corpus "
    "shuffle, same sweep discipline as semdedup_threshold_sweep. The "
    "rep ratio is rounded to 4 on BOTH engines before thresholding so "
    "the comparison is cross-engine exact.",
)
def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        T.token_count("text").alias("ntok"),
        dround(T.repetition_ratio("text"), 4).alias("rep"),
    )
    grid = spark.createDataFrame(
        _SWEEP_GRID, "min_tokens int, max_rep double"
    )
    cond = (F.col("ntok") >= F.col("min_tokens")) & (
        F.col("rep") <= F.col("max_rep")
    )
    return (
        m.crossJoin(F.broadcast(grid))
        .groupBy("min_tokens", "max_rep")
        .agg(
            F.sum(F.when(cond, 1).otherwise(0)).alias("n_survivors"),
            dround(
                F.sum(F.when(cond, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("survival_rate"),
            dround(
                F.sum(F.when(cond, F.col("ntok")).otherwise(0)).cast("double")
                / F.sum("ntok"),
                6,
            ).alias("kept_token_share"),
        )
        .orderBy("min_tokens", "max_rep")
    )


@query(
    "near_dup_source_matrix",
    oracle=f"""
    WITH {_MINHASH_PAIRS_CTE},
    sp AS (
      SELECT least(da.source, db.source) AS source_lo,
             greatest(da.source, db.source) AS source_hi,
             ROUND(CAST(p.inter AS DOUBLE) / p.union_sz, 6) AS j
      FROM dup_pairs p
      JOIN documents da ON da.doc_id = p.a_id
      JOIN documents db ON db.doc_id = p.b_id)
    SELECT source_lo, source_hi,
           CASE WHEN source_lo <> source_hi THEN 1 ELSE 0 END AS cross_source,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(SUM(CAST(ROUND(j * 1000000, 0) AS BIGINT)) / 1000000.0
                 / COUNT(*), 6) AS avg_jaccard
    FROM sp GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Near-duplicate pairs (MinHash-LSH, Jaccard>=1/4) bucketed by the "
    "source pair of their members: the doc-level 'who copies from whom' "
    "matrix (source_overlap_matrix is the n-gram-level complement — "
    "shared VOCABULARY; this is shared DOCUMENTS). Off-diagonal cells "
    "are cross-source syndication — the mixture-weights distortion "
    "dedup must resolve before mixture_budget_plan allocates tokens. "
    "The pair relation is near-dup-bounded, so the two source lookups "
    "join a small relation against the corpus projected to (doc_id, "
    "source); the final aggregate is |sources|^2-bounded. Per-pair "
    "jaccard averages via integer micro-units, order-exact on both "
    "engines.",
)
def near_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_arrays_df(docs).localCheckpoint()
    cand = D.lsh_candidate_pairs(docs, n=3, num_hashes=16, bands=8, shingle_arrays=sh)
    pairs = D.jaccard_pairs(docs, cand, n=3, tau_num=1, tau_den=4, shingle_arrays=sh)
    src = docs.select("doc_id", "source")
    sa = src.select(
        F.col("doc_id").alias("a_id"), F.col("source").alias("source_a")
    )
    sb = src.select(
        F.col("doc_id").alias("b_id"), F.col("source").alias("source_b")
    )
    lo = F.least("source_a", "source_b")
    hi = F.greatest("source_a", "source_b")
    micro = F.round(F.col("jaccard") * 1000000, 0).cast("bigint")
    return (
        pairs.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            lo.alias("source_lo"),
            hi.alias("source_hi"),
            F.when(lo != hi, F.lit(1)).otherwise(F.lit(0)).alias("cross_source"),
            micro.alias("j_micro"),
        )
        .groupBy("source_lo", "source_hi", "cross_source")
        .agg(
            F.count("*").alias("n_pairs"),
            dround(
                F.sum("j_micro") / F.lit(1000000.0) / F.count("*"), 6
            ).alias("avg_jaccard"),
        )
        .orderBy("source_lo", "source_hi")
    )
