"""LLM-training-data-pipeline operators as verified queries.

These go beyond the reference's own surface (BASELINE.json north star):
dedup (exact / MinHash-LSH / n-gram Jaccard / SimHash), similarity search,
and text analysis over the driver's `documents` and `embeddings` tables.

Oracle strategy: every hash is md5-hex (bit-identical in Spark and DuckDB),
MinHash minimizes md5 strings lexicographically (binary collation in both),
and Jaccard thresholds are integer comparisons — so even the LSH pipelines
have exact ANSI-SQL oracles. Floating cosine scores are rounded to 6 digits
on both sides before any threshold/ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.functions import dedup as D
from kyuubi_spark.functions import similarity as S
from kyuubi_spark.functions import text as T
from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table
from kyuubi_spark.functions.compat import dround

_STOP_SQL = ", ".join(f"'{s}'" for s in T.STOPWORDS)

# Shared DuckDB CTEs for shingling + minhash (n=3 word shingles, 16 hashes).
_SHINGLE_CTE = """
  docs AS (SELECT doc_id AS id, string_split(trim(text), ' ') AS toks FROM documents),
  sh AS (
    SELECT id,
           CASE WHEN len(toks) >= 3
                THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                   i -> array_to_string(toks[i:i+2], ' ')))
                ELSE [array_to_string(toks, ' ')] END AS shs
    FROM docs)
"""


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------
@query(
    "text_stats",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, string_split(trim(text), ' ') AS toks FROM documents)
    SELECT doc_id, source,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, x -> list_contains([{_STOP_SQL}], lower(x))))
                AS BIGINT) AS n_stopwords,
           ROUND(CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT)))
                      AS DOUBLE) / greatest(len(toks), 1), 4) AS avg_token_len
    FROM t
    ORDER BY doc_id
    """,
    doc="Token counting + stopword stats, map-only (no shuffle).",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    stop_arr = F.array(*[F.lit(s) for s in T.STOPWORDS])
    return docs.select(
        "doc_id",
        "source",
        T.token_count("text").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
        .cast("bigint")
        .alias("n_stopwords"),
        dround(T.avg_token_len("text"), 4).alias("avg_token_len"),
    ).orderBy("doc_id")


@query(
    "text_lang_id",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(trim(text), ' ') AS toks FROM documents),
    scored AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(toks, x -> list_contains([{_STOP_SQL}], lower(x))))
                  AS DOUBLE) / greatest(len(toks), 1) AS stop_ratio
      FROM t)
    SELECT CASE WHEN stop_ratio >= 0.05 THEN 'en' ELSE 'unknown' END AS pred_lang,
           lang, COUNT(*) AS n
    FROM scored GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Stopword-density language ID vs labeled lang (confusion counts).",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(T.lang_id("text").alias("pred_lang"), "lang")
        .groupBy("pred_lang", "lang")
        .agg(F.count("*").alias("n"))
        .orderBy("pred_lang", "lang")
    )


@query(
    "text_quality",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(toks) AS DOUBLE) AS n,
             CAST(len(list_filter(toks, x -> list_contains([{_STOP_SQL}], lower(x))))
                  AS DOUBLE) / greatest(len(toks), 1) AS stop_ratio,
             CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT)))
                  AS DOUBLE) / greatest(len(toks), 1) AS wl
      FROM t)
    SELECT doc_id,
           ROUND(0.4 * least(n / 100.0, 1.0)
               + 0.3 * least(stop_ratio / 0.1, 1.0)
               + 0.3 * (1.0 - least(abs(wl - 5.0) / 5.0, 1.0)), 4) AS quality
    FROM m ORDER BY doc_id
    """,
    doc="Composite quality score (length/stopword/word-length components).",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", dround(T.quality_score("text"), 4).alias("quality")
    ).orderBy("doc_id")


@query(
    "doc_fingerprint",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')))
             AS n_unique
    FROM documents GROUP BY source ORDER BY source
    """,
    doc="md5 fingerprint + exact-dedup accounting per source.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("fp", T.fingerprint("text"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------
@query(
    "dedup_exact",
    oracle="""
    SELECT lang, COUNT(*) AS n_after
    FROM (
      SELECT lang, md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp,
             MIN(doc_id) AS keeper
      FROM documents GROUP BY 1, 2
    ) dedup
    GROUP BY lang ORDER BY lang
    """,
    doc="Exact dedup via fingerprint hash-groupBy; survivor counts per lang.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    survivors = (
        docs.withColumn("fp", T.fingerprint("text"))
        .groupBy("lang", "fp")
        .agg(F.min("doc_id").alias("keeper"))
    )
    return survivors.groupBy("lang").agg(F.count("*").alias("n_after")).orderBy("lang")


@query(
    "approx_distinct_kmv",
    oracle="""
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT AS h
      FROM pairs),
    r AS (
      SELECT event_type, h,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
      FROM h),
    g AS (
      SELECT event_type, COUNT(*) AS n_exact,
             MAX(CASE WHEN rk = 64 THEN h END) AS kth
      FROM r GROUP BY 1)
    SELECT event_type AS grp, CAST(n_exact AS BIGINT) AS n_exact,
           CASE WHEN kth IS NOT NULL
                THEN ROUND(63 / (kth / 281474976710656.0), 4)
                ELSE CAST(n_exact AS DOUBLE) END AS kmv_estimate
    FROM g ORDER BY grp
    """,
    doc="Distinct users per event type via a KMV (k-minimum-values, k=64) "
    "sketch — the deterministic alternative to HLL: md5-derived 48-bit "
    "hashes, bottom-k estimator (k-1)/kth_min. Every intermediate is an "
    "integer or one double division, so unlike approx_count_distinct the "
    "sketch estimate itself is value-exact across engines and gets a full "
    "driver hash check. Groups under k report exact counts (the sketch "
    "holds every value).",
)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.sketches import kmv_distinct_estimate

    events = load_table(spark, sf_dir, "events")
    return kmv_distinct_estimate(events, "event_type", "user_id", k=64).orderBy(
        "grp"
    )


# MinHash(16) + LSH(8 bands × 2 rows) candidates, verified to pairs with
# jaccard >= 1/4 — shared by the pair query and the component clustering.
_MINHASH_PAIRS_CTE = f"""{_SHINGLE_CTE},
    sig AS (
      SELECT id,
             list_transform(generate_series(0, 15),
               s -> list_min(list_transform(shs,
                     g -> (('0x' || substring(md5(g), 1, 12))::BIGINT
                           + s * ('0x' || substring(md5(g), 13, 12))::BIGINT)
                          & 281474976710655))) AS sig
      FROM sh),
    banded AS (
      SELECT id, b AS band, sig[b*2+1] AS k0, sig[b*2+2] AS k1
      FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
    cand AS (
      SELECT DISTINCT l.id AS a_id, r.id AS b_id
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.k0 = r.k0 AND l.k1 = r.k1 AND l.id < r.id),
    shx AS (SELECT DISTINCT id, ('0x' || substring(md5(s), 1, 15))::BIGINT AS s
            FROM (SELECT id, unnest(shs) AS s FROM sh) u),
    counts AS (SELECT id, COUNT(*) AS n_sh FROM shx GROUP BY id),
    inter AS (
      SELECT c.a_id, c.b_id, COUNT(*) AS inter
      FROM cand c
      JOIN shx sa ON sa.id = c.a_id
      JOIN shx sb ON sb.id = c.b_id AND sa.s = sb.s
      GROUP BY c.a_id, c.b_id),
    dup_pairs AS (
      SELECT i.a_id, i.b_id, i.inter,
             ca.n_sh + cb.n_sh - i.inter AS union_sz
      FROM inter i
      JOIN counts ca ON ca.id = i.a_id
      JOIN counts cb ON cb.id = i.b_id
      WHERE 4 * i.inter >= 1 * (ca.n_sh + cb.n_sh - i.inter))"""


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_MINHASH_PAIRS_CTE}
    SELECT a_id, b_id, inter, union_sz AS "union",
           ROUND(CAST(inter AS DOUBLE) / union_sz, 6) AS jaccard
    FROM dup_pairs
    ORDER BY a_id, b_id
    """,
    doc="MinHash(16) + LSH(8 bands × 2 rows) candidates, Jaccard>=1/4 verify.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # one materialized shingle relation feeds both the signature/banding
    # phase and the Jaccard verification phase (at scale: persist to disk
    # rather than recompute the explode+distinct twice); localCheckpoint
    # blocks are freed by the ContextCleaner when the DF is GC'd
    sh = (
        D.shingle_arrays_df(docs)
        # NB: no .distinct() — shingles() already array_distincts per doc,
        # so (id, g) is unique by construction; a distinct here would be a
        # full extra shuffle of the widest relation in the pipeline
        .localCheckpoint()
    )
    cand = D.lsh_candidate_pairs(docs, n=3, num_hashes=16, bands=8, shingle_arrays=sh)
    return D.jaccard_pairs(
        docs, cand, n=3, tau_num=1, tau_den=4, shingle_arrays=sh
    ).orderBy("a_id", "b_id")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    shx AS (SELECT DISTINCT id, ('0x' || substring(md5(s), 1, 15))::BIGINT AS s
            FROM (SELECT id, unnest(shs) AS s FROM sh) u),
    counts AS (SELECT id, COUNT(*) AS n_sh FROM shx GROUP BY id),
    inter AS (
      SELECT sa.id AS a_id, sb.id AS b_id, COUNT(*) AS inter
      FROM shx sa JOIN shx sb ON sa.s = sb.s AND sa.id < sb.id
      GROUP BY 1, 2)
    SELECT i.a_id, i.b_id, i.inter,
           ca.n_sh + cb.n_sh - i.inter AS "union",
           ROUND(CAST(i.inter AS DOUBLE) / (ca.n_sh + cb.n_sh - i.inter), 6)
             AS jaccard
    FROM inter i
    JOIN counts ca ON ca.id = i.a_id
    JOIN counts cb ON cb.id = i.b_id
    WHERE 4 * i.inter >= 1 * (ca.n_sh + cb.n_sh - i.inter)
    ORDER BY a_id, b_id
    """,
    doc="Exact all-pairs n-gram Jaccard >= 1/4 (ground truth for LSH recall).",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(docs, None, n=3, tau_num=1, tau_den=4).orderBy(
        "a_id", "b_id"
    )


@query(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_PAIRS_CTE},
    edges AS (
      SELECT a_id AS u, b_id AS v FROM dup_pairs
      UNION ALL
      SELECT b_id, a_id FROM dup_pairs),
    reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u)
    SELECT u AS doc_id, MIN(v) AS component_id
    FROM reach GROUP BY u ORDER BY doc_id
    """,
    doc="Near-dup GROUPS: connected components over the MinHash-LSH + "
    "Jaccard>=1/4 pair graph (component id = min reachable doc id) — the "
    "canonicalization step of a dedup pipeline: keep one doc per "
    "component. Spark side is iterative min-label propagation (per round: "
    "one id-keyed equi-join + groupBy-min; converges in graph-diameter "
    "rounds, and near-dup clusters are diameter 1-3); the oracle replays "
    "reachability with a recursive CTE. Driver holds only per-round "
    "change counts.",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_arrays_df(docs).localCheckpoint()
    cand = D.lsh_candidate_pairs(docs, n=3, num_hashes=16, bands=8, shingle_arrays=sh)
    pairs = D.jaccard_pairs(
        docs, cand, n=3, tau_num=1, tau_den=4, shingle_arrays=sh
    ).select("a_id", "b_id")
    return D.connected_components(pairs).orderBy("doc_id")


@query(
    "dedup_survivors",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_PAIRS_CTE},
    edges AS (
      SELECT a_id AS u, b_id AS v FROM dup_pairs
      UNION ALL
      SELECT b_id, a_id FROM dup_pairs),
    reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
    comp AS (
      SELECT u AS doc_id, MIN(v) AS component_id FROM reach GROUP BY u),
    dropped AS (SELECT doc_id FROM comp WHERE doc_id <> component_id)
    SELECT d.source AS source,
           COUNT(*) AS n_docs,
           CAST(COUNT(*) - COUNT(x.doc_id) AS BIGINT) AS n_survivors
    FROM documents d LEFT JOIN dropped x ON d.doc_id = x.doc_id
    GROUP BY d.source ORDER BY source
    """,
    doc="End-to-end near-dup dedup accounting: MinHash-LSH pairs -> "
    "connected components -> keep ONE canonical doc per dup group (the "
    "min id) -> per-source before/after counts. The composition a real "
    "corpus-dedup job runs; every stage is the verified distributed "
    "operator (bucketed LSH join, label propagation, anti-join of the "
    "dropped set back to the corpus).",
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_arrays_df(docs).localCheckpoint()
    cand = D.lsh_candidate_pairs(docs, n=3, num_hashes=16, bands=8, shingle_arrays=sh)
    pairs = D.jaccard_pairs(
        docs, cand, n=3, tau_num=1, tau_den=4, shingle_arrays=sh
    ).select("a_id", "b_id")
    comps = D.connected_components(pairs)
    dropped = comps.filter(F.col("doc_id") != F.col("component_id")).select(
        "doc_id"
    )
    survivors = docs.join(dropped, "doc_id", "left_anti")
    return (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .join(
            survivors.groupBy("source").agg(F.count("*").alias("n_survivors")),
            "source",
        )
        .orderBy("source")
    )


@query(
    "dedup_simhash",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS id, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents),
    h AS (
      SELECT id,
             ('0x' || substring(md5(tok), 1, 8))::BIGINT AS hi,
             ('0x' || substring(md5(tok), 9, 8))::BIGINT AS lo
      FROM toks),
    b AS (
      SELECT id, t.i AS bit,
             SUM(CASE WHEN (CASE WHEN t.i < 32 THEN (lo >> t.i) & 1
                            ELSE (hi >> (t.i - 32)) & 1 END) = 1
                      THEN 1 ELSE -1 END) AS s
      FROM h, (SELECT unnest(generate_series(0, 63)) AS i) t(i)
      GROUP BY 1, 2),
    sig AS (
      SELECT id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY bit)
               AS sig
      FROM b GROUP BY id),
    ch AS (
      SELECT id, sig, t.c AS c, substring(sig, t.c * 16 + 1, 16) AS chunk
      FROM sig, (SELECT unnest(generate_series(0, 3)) AS c) t(c)),
    cand AS (
      SELECT DISTINCT a.id AS a_id, b.id AS b_id, a.sig AS sa, b.sig AS sb
      FROM ch a JOIN ch b ON a.c = b.c AND a.chunk = b.chunk AND a.id < b.id),
    scored AS (
      SELECT a_id, b_id,
             CAST(list_sum(list_transform(generate_series(1, 64),
                    i -> CASE WHEN substring(sa, i, 1) <> substring(sb, i, 1)
                         THEN 1 ELSE 0 END)) AS INTEGER) AS hamming
      FROM cand)
    SELECT a_id, b_id, hamming FROM scored
    WHERE hamming <= 3 ORDER BY a_id, b_id
    """,
    doc="SimHash(64) near-dup pairs via 4-chunk banding (Manku et al. "
    "scheme), value-exact against a full SQL replay: md5-derived token "
    "bits, ±1 bit sums, chunk-equality candidates, hamming via bit-string "
    "diff — the md5 base hash makes the whole pipeline engine-independent.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(docs, max_hamming=3, chunks=4).orderBy(
        "a_id", "b_id"
    )


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------
_COSINE_CTE = """
  e AS (
    SELECT vec_id,
           embedding,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
    FROM embeddings)
"""

# Brute-force cosine top-5 chain for the 10 query vectors (shared by the
# baseline kNN oracle and the recall report).
_EXACT_TOP5_CTE = """ex_q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn FROM e WHERE vec_id < 10),
    ex_scored AS (
      SELECT ex_q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(generate_series(1, len(e.embedding)),
                     i -> CAST(e.embedding[i] AS DOUBLE) * CAST(ex_q.qv[i] AS DOUBLE)))
                   / (e.nrm * ex_q.qn), 6) AS score
      FROM e, ex_q WHERE e.vec_id <> ex_q.query_id),
    ex_ranked AS (
      SELECT query_id, neighbor_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
      FROM ex_scored)"""

# SRP-LSH bucketed top-5 chain for the 10 query vectors (shared by the LSH
# kNN oracle and the recall report).
_SRP_TOP5_CTE = """    b AS (
      SELECT vec_id,
             string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY p)
               AS bucket
      FROM (
        SELECT e.vec_id, p.p AS p,
               SUM(CAST(CAST(e.embedding[d.i] AS DOUBLE) AS DECIMAL(18,12))
                   * CAST(CAST(strpos('0123456789abcdef',
                           substring(md5(CAST(p.p AS VARCHAR) || ':' ||
                                         CAST(d.i - 1 AS VARCHAR)), 1, 1)) - 1
                          AS DOUBLE) - 7.5 AS DECIMAL(3,1))) AS s
        FROM e,
             (SELECT unnest(generate_series(0, 7)) AS p) p,
             (SELECT unnest(generate_series(1, 64)) AS i) d(i)
        GROUP BY 1, 2) t
      GROUP BY vec_id),
    eb AS (
      SELECT e.vec_id, e.embedding, e.nrm, b.bucket
      FROM e JOIN b ON e.vec_id = b.vec_id),
    srp_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(generate_series(1, 64),
                     i -> CAST(c.embedding[i] AS DOUBLE)
                          * CAST(q.embedding[i] AS DOUBLE)))
                   / (c.nrm * q.nrm), 6) AS score
      FROM eb q JOIN eb c
        ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
      WHERE q.vec_id < 10),
    srp_ranked AS (
      SELECT query_id, neighbor_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id)
                  AS BIGINT) AS rnk
      FROM srp_scored)"""




@query(
    "knn_cosine_topk",
    oracle=f"""
    WITH {_COSINE_CTE},
    {_EXACT_TOP5_CTE}
    SELECT query_id, neighbor_id, score, rnk
    FROM ex_ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
    doc="Brute-force cosine top-5 for 10 query vectors (ANN baseline).",
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.cosine_topk(emb, queries, k=5)


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH {_COSINE_CTE}
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           ROUND(list_sum(list_transform(generate_series(1, len(a.embedding)),
                   i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                 / (a.nrm * b.nrm), 6) AS score
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ROUND(list_sum(list_transform(generate_series(1, len(a.embedding)),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                / (a.nrm * b.nrm), 6) >= 0.15
    ORDER BY a_id, b_id
    """,
    doc="Embedding-cosine near-duplicate pairs (round(cos,6) >= 0.15).",
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_near_dup_pairs(emb, threshold_rounded=0.15).orderBy("a_id", "b_id")


@query(
    "knn_cosine_lsh",
    oracle=f"""
    WITH {_COSINE_CTE},
    {_SRP_TOP5_CTE}
    SELECT query_id, neighbor_id, score, rnk
    FROM srp_ranked WHERE rnk <= 5 ORDER BY query_id, rnk
    """,
    doc="SRP-LSH bucketed ANN top-5 — the bucket-join scale path for "
    "100 TB. Value-exact oracle: the hyperplane weights are pure "
    "md5(plane:dim) expressions, so DuckDB replays bucketing, candidate "
    "join, and rounded cosine rerank bit-for-bit.",
)
def knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.cosine_topk_lsh(emb, queries, k=5, n_planes=8, dim=64)


@query(
    "knn_recall_report",
    oracle=f"""
    WITH {_COSINE_CTE},
    {_EXACT_TOP5_CTE},
    {_SRP_TOP5_CTE},
    ex AS (SELECT query_id, neighbor_id FROM ex_ranked WHERE rnk <= 5),
    ap AS (SELECT query_id, neighbor_id FROM srp_ranked WHERE rnk <= 5)
    SELECT ex.query_id AS query_id,
           COUNT(*) AS n_exact,
           (SELECT COUNT(*) FROM ap WHERE ap.query_id = ex.query_id) AS n_lsh,
           COUNT(ap.neighbor_id) AS n_common,
           ROUND(CAST(COUNT(ap.neighbor_id) AS DOUBLE) / COUNT(*), 4)
             AS recall_at_5
    FROM ex LEFT JOIN ap
      ON ex.query_id = ap.query_id AND ex.neighbor_id = ap.neighbor_id
    GROUP BY ex.query_id ORDER BY query_id
    """,
    doc="ANN quality as an operator: per-query recall@5 of the SRP-LSH "
    "bucketed search against the brute-force baseline, computed in one "
    "query (both sides are deterministic, so even the recall numbers are "
    "value-exact across engines). The production use: continuous recall "
    "monitoring of an approximate index without leaving the engine.",
)
def knn_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(emb, queries, k=5).select("query_id", "neighbor_id")
    approx = (
        S.cosine_topk_lsh(emb, queries, k=5, n_planes=8, dim=64)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    n_lsh = approx.groupBy("query_id").agg(F.count("*").alias("n_lsh"))
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.count("hit").alias("n_common"),
        )
        .join(n_lsh, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_lsh", F.lit(0)).alias("n_lsh"),
            "n_common",
            dround(F.col("n_common") / F.col("n_exact"), 4).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


@query(
    "knn_cosine_ivf",
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
    probe AS (
      SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, cell) AS r
        FROM sim WHERE vec_id < 10) t WHERE r <= 4),
    scored AS (
      SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(generate_series(1, 64),
                     i -> CAST(cv.embedding[i] AS DOUBLE)
                          * CAST(qv.embedding[i] AS DOUBLE)))
                   / (cv.nrm * qv.nrm), 6) AS score
      FROM probe p
      JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
      JOIN e qv ON qv.vec_id = p.query_id
      JOIN e cv ON cv.vec_id = a.vec_id),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY score DESC, neighbor_id)
                  AS BIGINT) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, score, rnk
    FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk
    """,
    doc="IVF-bucketed ANN top-5 (coarse quantizer + n_probe cells + exact "
    "rerank) — the inverted-file scale path; assignment is an Arrow-batched "
    "numpy matmul pandas UDF. Deterministic centroid sample makes the whole "
    "index SQL-replayable: the oracle rebuilds cells, probes, and rerank.",
)
def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.cosine_topk_ivf(emb, queries, k=5, n_cells=16, n_probe=4)


@query(
    "text_bpe_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+'))
             AS BIGINT) AS n_bpe,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_ws,
           ROUND(CAST(len(regexp_extract_all(text,
             '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+'))
             AS DOUBLE) / greatest(len(string_split(trim(text), ' ')), 1), 4)
             AS bpe_per_word
    FROM documents ORDER BY doc_id
    """,
    doc="BPE-ish token estimation (GPT-2-style pretokenizer regex) next to "
    "whitespace counts — the LLM-pipeline cost estimator. Map-only, "
    "codegen'd regexp_extract_all; the plain-alternation pattern compiles "
    "identically under Java regex and RE2, so counts are cross-engine "
    "exact.",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_bpe = T.bpe_ish_token_count("text")
    n_ws = T.token_count("text")
    return docs.select(
        "doc_id",
        n_bpe.alias("n_bpe"),
        n_ws.alias("n_ws"),
        dround(
            n_bpe.cast("double") / F.greatest(n_ws, F.lit(1)).cast("double"), 4
        ).alias("bpe_per_word"),
    ).orderBy("doc_id")


@query(
    "text_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    m AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3 THEN CAST(len(toks) - 2 AS DOUBLE)
                  ELSE 1.0 END AS n_total,
             CASE WHEN len(toks) >= 3
                  THEN CAST(len(list_distinct(list_transform(
                         generate_series(1, len(toks) - 2),
                         i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE)
                  ELSE 1.0 END AS n_distinct
      FROM t)
    SELECT doc_id, ROUND(1.0 - n_distinct / n_total, 4) AS rep_ratio
    FROM m ORDER BY doc_id
    """,
    doc="Within-doc repetition ratio (1 - distinct/total 3-grams), the "
    "boilerplate/keyword-stuffing quality filter. Map-only: array expressions "
    "inside whole-stage codegen, zero shuffle at any scale.",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", dround(T.repetition_ratio("text"), 4).alias("rep_ratio")
    ).orderBy("doc_id")


@query(
    "train_test_split",
    oracle="""
    WITH s AS (
      SELECT source, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'c000'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e000'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 4) AS avg_chars
    FROM s GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc="Deterministic 75/12.5/12.5 train/val/test split by md5(doc_id) hex "
    "threshold — no RNG, reproducible on any engine and under any "
    "partitioning; per-(split, source) counts audit stratification balance. "
    "One small shuffle of the grouped cells only.",
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            T.hash_split("doc_id").alias("split"), "source",
            F.col("n_chars").cast("double").alias("nc"),
        )
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            dround(F.avg("nc"), 4).alias("avg_chars"),
        )
        .orderBy("split", "source")
    )


@query(
    "contamination_check",
    oracle="""
    WITH docs AS (
      SELECT doc_id AS id, source, string_split(trim(text), ' ') AS toks
      FROM documents),
    sh AS (
      SELECT id, source,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(generate_series(1, len(toks) - 2),
                                     i -> array_to_string(toks[i:i+2], ' ')))
                  ELSE [array_to_string(toks, ' ')] END AS shs
      FROM docs),
    ex AS (SELECT id, source, u.s AS s FROM sh, unnest(shs) AS u(s)),
    tr AS (SELECT DISTINCT s FROM ex WHERE source <> 'src0'),
    ev AS (SELECT id, s FROM ex WHERE source = 'src0')
    SELECT ev.id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hits,
           ROUND(CAST(SUM(CASE WHEN tr.s IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 4) AS overlap
    FROM ev LEFT JOIN tr ON ev.s = tr.s
    GROUP BY 1 ORDER BY 1
    """,
    doc="Eval-set decontamination: per eval doc (source='src0'), the fraction "
    "of its distinct 3-gram shingles that appear anywhere in the training "
    "corpus (every other source). Shingle-key hash join after distinct — "
    "both sides prune to unique shingles before the shuffle; at 100 TB the "
    "train side would additionally push through a bloom filter, the join key "
    "stays a fixed-width hash.",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id", "source", F.explode(D.shingles_arrow(3)(F.col("text"))).alias("s")
    )
    train_sh = (
        ex.filter(F.col("source") != "src0")
        .select("s").distinct()
        .withColumn("hit", F.lit(1))
    )
    ev = ex.filter(F.col("source") == "src0").select("doc_id", "s")
    hits = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (
        ev.join(train_sh, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            hits.cast("bigint").alias("n_hits"),
            dround(
                hits.cast("double") / F.count("*").cast("double"), 4
            ).alias("overlap"),
        )
        .orderBy("doc_id")
    )


@query(
    "stratified_sample",
    oracle="""
    WITH r AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents)
    SELECT source, rk, doc_id FROM r WHERE rk <= 5 ORDER BY source, rk
    """,
    doc="Deterministic stratified sample: per source, the 5 docs with "
    "smallest md5(doc_id) — a seedless, engine-independent uniform draw "
    "that is stable under re-partitioning. Window top-k per stratum plans "
    "as partial top-k before the shuffle; only ~k rows per stratum move.",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
        .select("source", "rk", "doc_id")
        .orderBy("source", "rk")
    )


@query(
    "multimodal_decode",
    oracle="""
    WITH m AS (SELECT unnest(generate_series(0, 63)) AS mid)
    SELECT mid AS media_id,
           CASE mid % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS kind,
           CAST(64 + mid % 512 AS INTEGER) AS decoded_width,
           CAST(64 + (mid * 7) % 512 AS INTEGER) AS decoded_height,
           CAST((mid * 37) % 10000 AS INTEGER) AS duration_ms,
           CAST(140 AS BIGINT) AS payload_bytes
    FROM m ORDER BY media_id
    """,
    doc="Multimodal decode pipeline end-to-end: opaque binary payloads with "
    "typed metadata flow through Arrow-batched mapInPandas (synthesize -> "
    "stub decoder -> feature rows). The decoder is a deterministic header "
    "parser standing in for PIL/ffmpeg (not in this container); the Spark "
    "plumbing — binary columns, Arrow batches, per-row error capture — is "
    "real. Payload bytes never shuffle; the oracle replays the seeded "
    "generator arithmetic.",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import multimodal as M

    media = M.synthesize_media(spark, n=64, partitions=8)
    return (
        M.decode_features(media)
        .select(
            "media_id", "kind", "decoded_width", "decoded_height",
            "duration_ms", "payload_bytes",
        )
        .orderBy("media_id")
    )


@query(
    "multimodal_resize",
    oracle="""
    WITH m AS (SELECT unnest(generate_series(0, 63)) AS mid),
    img AS (
      SELECT mid, 64 + mid % 512 AS w, 64 + (mid * 7) % 512 AS h
      FROM m WHERE mid % 3 = 0),
    sized AS (
      SELECT mid, w, h,
             CASE WHEN greatest(w, h) <= 256 THEN w
                  ELSE greatest(1, w * 256 // greatest(w, h)) END AS dw,
             CASE WHEN greatest(w, h) <= 256 THEN h
                  ELSE greatest(1, h * 256 // greatest(w, h)) END AS dh
      FROM img)
    SELECT mid AS media_id,
           CAST(w AS INTEGER) AS src_width, CAST(h AS INTEGER) AS src_height,
           CAST(dw AS INTEGER) AS dst_width, CAST(dh AS INTEGER) AS dst_height,
           CAST(12 + (128 * (dw * dh)) // (w * h) AS BIGINT) AS resized_bytes
    FROM sized ORDER BY media_id
    """,
    doc="Aspect-preserving image resize (max side 256) through the stubbed "
    "multimodal pipeline: target dims and output-size estimate use pure "
    "integer arithmetic, so the plan is value-exact across engines; the "
    "pixel transform is the stub standing in for PIL, with the real "
    "Arrow-batched mapInPandas plumbing and per-row error capture.",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import multimodal as M

    media = M.synthesize_media(spark, n=64, partitions=8)
    return (
        M.resize_images(media, max_side=256)
        .select(
            "media_id", "src_width", "src_height", "dst_width", "dst_height",
            "resized_bytes",
        )
        .orderBy("media_id")
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (SELECT unnest(generate_series(0, 63)) AS mid),
    v AS (
      SELECT mid, (mid * 37) % 10000 AS dur FROM m WHERE mid % 3 = 2)
    SELECT mid AS media_id,
           CAST(floor(greatest(dur - 1, 0) / 1000) + 1 AS BIGINT) AS n_frames,
           CAST((floor(greatest(dur - 1, 0) / 1000)) * 1000 AS BIGINT)
             AS last_frame_ts_ms
    FROM v ORDER BY media_id
    """,
    doc="Video frame-sampling plan: one row per (media_id, frame_ts) every "
    "1000 ms, exploded JVM-side from duration metadata ONLY — payloads are "
    "projected away before the explode, so at 100 TB the shuffle carries "
    "metadata rows, not video bytes.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import multimodal as M

    media = M.synthesize_media(spark, n=64, partitions=8)
    return (
        M.frame_sample_plan(media, every_ms=1000)
        .groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.max("frame_ts_ms").cast("bigint").alias("last_frame_ts_ms"),
        )
        .orderBy("media_id")
    )


@query(
    "embedding_centroids",
    oracle="""
    WITH ex AS (
      SELECT vec_id % 8 AS bucket,
             t.i - 1 AS dim,
             CAST(CAST(embedding[t.i] AS DOUBLE) AS DECIMAL(28,12)) AS x
      FROM embeddings,
           unnest(generate_series(1, len(embedding))) AS t(i)),
    agg AS (
      SELECT bucket, dim, SUM(x) AS s, COUNT(*) AS n
      FROM ex GROUP BY 1, 2)
    SELECT bucket, dim,
           ROUND(CAST(s AS DOUBLE) / n, 6) AS centroid
    FROM agg WHERE dim < 8 ORDER BY bucket, dim
    """,
    doc="Distributed class centroids over the embedding column (the "
    "k-means/update step of vector pipelines): posexplode to (row, dim), "
    "partial+final sum per (bucket, dim) — one shuffle of n_buckets x dims "
    "cells regardless of row count. Sums run in DECIMAL(28,12) so the "
    "reduction is order-exact; float32 values are widened via double "
    "identically on both engines.",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        (F.col("vec_id") % 8).alias("bucket"),
        F.posexplode("embedding").alias("dim", "xf"),
    ).select(
        "bucket", "dim",
        F.col("xf").cast("double").cast("decimal(28,12)").alias("x"),
    )
    return (
        ex.groupBy("bucket", "dim")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .filter(F.col("dim") < 8)
        .select(
            "bucket", "dim",
            dround(F.col("s").cast("double") / F.col("n"), 6).alias("centroid"),
        )
        .orderBy("bucket", "dim")
    )


@query(
    "pipeline_corpus_clean",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, text, n_chars,
             string_split(trim(text), ' ') AS toks,
             md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp
      FROM documents),
    m AS (
      SELECT doc_id, source, fp,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks, x -> list_contains([{_STOP_SQL}], lower(x))))
                  AS DOUBLE) / greatest(len(toks), 1) AS stop_ratio,
             CASE WHEN len(toks) >= 3
                  THEN 1.0 - CAST(len(list_distinct(list_transform(
                         generate_series(1, len(toks) - 2),
                         i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE)
                       / (len(toks) - 2)
                  ELSE 0.0 END AS rep_ratio
      FROM t),
    filtered AS (
      SELECT * FROM m
      WHERE stop_ratio >= 0.05        -- lang-id: keep english-like
        AND n_tokens >= 10            -- length floor
        AND rep_ratio <= 0.8),        -- repetition ceiling
    deduped AS (
      SELECT source, fp, MIN(doc_id) AS keeper,
             MIN(n_tokens) AS n_tokens
      FROM filtered GROUP BY source, fp)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM deduped GROUP BY source ORDER BY source
    """,
    doc="The composed corpus-curation pass (C4-style): language-ID gate -> "
    "length floor -> repetition ceiling -> exact dedup (md5 fingerprint, "
    "min-doc_id survivor) -> per-source token accounting. One map-only "
    "scan computes every per-doc signal (no Python, no extra passes), "
    "then a single (source, fp) shuffle dedupes and a cells-only shuffle "
    "aggregates: 100 TB in, two shuffles total, both keyed uniformly.",
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        "source",
        T.fingerprint("text").alias("fp"),
        T.token_count("text").alias("n_tokens"),
        T.stopword_ratio("text").alias("stop_ratio"),
        T.repetition_ratio("text").alias("rep_ratio"),
    )
    filtered = m.filter(
        (F.col("stop_ratio") >= 0.05)
        & (F.col("n_tokens") >= 10)
        & (F.col("rep_ratio") <= 0.8)
    )
    deduped = filtered.groupBy("source", "fp").agg(
        F.min("doc_id").alias("keeper"), F.min("n_tokens").alias("n_tokens")
    )
    return (
        deduped.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("source")
    )


@query(
    "sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, doc_id % 16 AS shard,
             CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, source, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS cum
      FROM t),
    binned AS (
      SELECT source, shard,
             CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS bin,
             n_tokens
      FROM c)
    SELECT source, CAST(shard AS BIGINT) AS shard, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM binned GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    doc="Sequence packing for training batches, TWO-LEVEL: docs are hash-"
    "sharded within each source (doc_id % 16), then each (source, shard) "
    "packs independently in doc_id order into 512-token bins via "
    "cumulative-sum bin assignment (bin = floor(start_offset / capacity) — "
    "deterministic, one window pass, no greedy loop). A single-level "
    "per-source window is one task per source — a straggler by "
    "construction at 100 TB; sharding bounds every window partition at "
    "1/16 of a source (raise the shard count with corpus size) while "
    "keeping the same greedy semantics within a shard. Bins are keyed "
    "(source, shard, bin), so shard outputs concatenate without renumber "
    "collisions. Integer token sums are order-exact.",
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % 16).cast("bigint").alias("shard"),
        T.token_count("text").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    binned = c.select(
        "source",
        "shard",
        F.floor((F.col("cum") - F.col("n_tokens")) / 512).cast("bigint").alias("bin"),
        "n_tokens",
    )
    return (
        binned.groupBy("source", "shard", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
        )
        .orderBy("source", "shard", "bin")
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             greatest(list_max(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))), 1e-12) AS scale,
             embedding
      FROM embeddings),
    err AS (
      SELECT vec_id, scale,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)
                        - least(greatest(CAST(ROUND(CAST(CAST(x AS DOUBLE) / scale * 127
                                                    AS DECIMAL(20,6)), 0) AS DOUBLE),
                                         -127), 127) * scale / 127)))
               AS max_err
      FROM q)
    SELECT vec_id, ROUND(scale, 6) AS scale, ROUND(max_err, 8) AS max_abs_err,
           max_err <= scale / 127 AS within_half_step
    FROM err ORDER BY vec_id
    """,
    doc="Symmetric int8 quantization of the embedding column (the vector-"
    "store compression step: 4x smaller, one scale per vector) with "
    "per-vector reconstruction-error audit. Map-only column expressions — "
    "no shuffle, no Python; the error bound (half a quantization step) is "
    "checked row-by-row in both engines. Quantization rounds through a "
    "decimal intermediate so the int codes are engine- and codepath-exact.",
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    # exploded layout: no nested higher-order functions (their lambdas are
    # interpreted AND nested HOF inlining under CollapseProject has been
    # observed to evaluate divergently), and the window/agg pair is
    # whole-stage-codegen with vec_id-keyed shuffles only
    ex = emb.select("vec_id", F.posexplode("embedding").alias("d", "xf")).select(
        "vec_id", F.col("xf").cast("double").alias("x")
    )
    w = Window.partitionBy("vec_id")
    ex = ex.withColumn(
        "scale", F.greatest(F.max(F.abs(F.col("x"))).over(w), F.lit(1e-12))
    )
    qcode = (
        F.round((F.col("x") / F.col("scale") * 127).cast("decimal(20,6)"), 0)
        .cast("double")
    )
    qclamped = F.least(F.greatest(qcode, F.lit(-127.0)), F.lit(127.0))
    err = F.abs(F.col("x") - qclamped * F.col("scale") / 127)
    return (
        ex.select("vec_id", "scale", err.alias("e"))
        .groupBy("vec_id")
        .agg(
            dround(F.first("scale"), 6).alias("scale"),
            dround(F.max("e"), 8).alias("max_abs_err"),
            (F.max("e") <= F.first("scale") / 127).alias("within_half_step"),
        )
        .orderBy("vec_id")
    )

@query(
    "dedup_lsh_recall_report",
    oracle=f"""
    WITH {_MINHASH_PAIRS_CTE},
    exact AS (
      SELECT i.a_id, i.b_id
      FROM (SELECT sa.id AS a_id, sb.id AS b_id, COUNT(*) AS inter
            FROM shx sa JOIN shx sb ON sa.s = sb.s AND sa.id < sb.id
            GROUP BY 1, 2) i
      JOIN counts ca ON ca.id = i.a_id
      JOIN counts cb ON cb.id = i.b_id
      WHERE 4 * i.inter >= 1 * (ca.n_sh + cb.n_sh - i.inter)),
    m AS (SELECT
      (SELECT COUNT(*) FROM exact) AS n_exact,
      (SELECT COUNT(*) FROM cand) AS n_candidates,
      (SELECT COUNT(*) FROM dup_pairs) AS n_verified)
    SELECT CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_verified AS BIGINT) AS n_verified,
           ROUND(CAST(n_verified AS DOUBLE) / NULLIF(n_exact, 0), 6)
             AS recall,
           ROUND(CAST(n_verified AS DOUBLE) / NULLIF(n_candidates, 0), 6)
             AS candidate_precision
    FROM m
    """,
    doc="LSH quality evaluation: MinHash(16)/8-band candidate generation "
    "measured against the exact all-pairs Jaccard>=1/4 ground truth — "
    "recall = verified/exact (verification is exact, so verified == "
    "candidates INTERSECT exact), candidate_precision = verified/"
    "candidates (how much of the candidate stream survives). The "
    "evaluation loop every production dedup pipeline needs before "
    "trusting banding parameters at corpus scale; the exact all-pairs "
    "side is the EVALUATION-time cost only (sampled in production), "
    "never part of the dedup path itself.",
)
def dedup_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        D.shingle_arrays_df(docs)
        .localCheckpoint()
    )
    cand = D.lsh_candidate_pairs(docs, n=3, num_hashes=16, bands=8, shingle_arrays=sh)
    verified = D.jaccard_pairs(docs, cand, n=3, tau_num=1, tau_den=4, shingle_arrays=sh)
    exact = D.jaccard_pairs(docs, None, n=3, tau_num=1, tau_den=4, shingle_arrays=sh)
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_ver = verified.agg(F.count(F.lit(1)).alias("n_verified"))
    return (
        n_exact.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_ver))
        .select(
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.col("n_candidates").cast("bigint").alias("n_candidates"),
            F.col("n_verified").cast("bigint").alias("n_verified"),
            dround(
                F.col("n_verified").cast("double")
                / F.nullif(F.col("n_exact"), F.lit(0)),
                6,
            ).alias("recall"),
            dround(
                F.col("n_verified").cast("double")
                / F.nullif(F.col("n_candidates"), F.lit(0)),
                6,
            ).alias("candidate_precision"),
        )
    )


@query(
    "dedup_cluster_stats",
    oracle=f"""
    WITH RECURSIVE {_MINHASH_PAIRS_CTE},
    edges AS (
      SELECT a_id AS u, b_id AS v FROM dup_pairs
      UNION ALL
      SELECT b_id, a_id FROM dup_pairs),
    reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
    comp AS (
      SELECT u AS doc_id, MIN(v) AS component_id FROM reach GROUP BY u),
    sizes AS (
      SELECT component_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY component_id)
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS removable_docs
    FROM sizes GROUP BY cluster_size ORDER BY cluster_size
    """,
    doc="Dup-cluster size distribution over the connected components of "
    "the MinHash-LSH + Jaccard>=1/4 pair graph: per cluster size, how "
    "many clusters, how many docs they hold, and how many docs a "
    "keep-one-per-cluster policy removes — the dedup-impact report a "
    "pipeline reviews before applying survivors. Reuses the exact "
    "component pipeline dedup_components runs (iterative min-label "
    "propagation), then two tiny aggregations — the report adds no "
    "corpus-scaled work beyond the dedup itself.",
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = dedup_components(spark, sf_dir)
    sizes = comp.groupBy("component_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint")
            .alias("removable_docs"),
        )
        .orderBy("cluster_size")
    )
