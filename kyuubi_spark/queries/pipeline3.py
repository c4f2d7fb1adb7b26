"""Training-data pipeline operators, batch 3: temperature mixture sampling,
Bloom-filter decontamination, SemDeDup semantic deduplication, unigram-LM
perplexity filtering.

These are the remaining curation stages of a production pretraining-data
pipeline (charter: beyond-reference operators are first-class alongside
SURVEY.md §2): how much of each source/language to keep (mixture), whether
eval benchmarks leaked into the corpus (decontamination), which documents
are semantically redundant (SemDeDup), and which documents an in-domain
language model finds anomalous (perplexity filter).

Cross-engine determinism (same rules as pipeline.py/pipeline2.py):
- sampling decisions are INTEGER-exact: md5-derived 32-bit uniforms compared
  against rational take rates via cross-multiplication, never float
  thresholds;
- Bloom bits live in 32-bit lanes of BIGINT words (no sign-bit hazards),
  positions from md5 double hashing — both engines set/test identical bits;
- cosine scores reuse the sequential-fold + half-away-rounding helpers that
  the rest of the similarity family already proves bit-identical;
- the only float aggregate (mean token NLL) is rounded identically on both
  sides before any comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.caching import persisted
from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table


# --------------------------------------------------------------------------
# Temperature-based mixture sampling (alpha = 0.5 source reweighting)
# --------------------------------------------------------------------------
_MIX_TARGET = 200  # target sample size (docs)


@query(
    "mixture_sample_temperature",
    oracle=f"""
    WITH n AS (
      SELECT lang, COUNT(*) AS n_l,
             CAST(floor(sqrt(COUNT(*))) AS BIGINT) AS isq
      FROM documents GROUP BY lang),
    s AS (SELECT CAST(SUM(isq) AS BIGINT) AS s_isq FROM n)
    SELECT d.doc_id AS doc_id, d.lang AS lang, d.source AS source
    FROM documents d JOIN n USING (lang) CROSS JOIN s
    WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          * s.s_isq * n.n_l
          < {_MIX_TARGET} * n.isq * 4294967296
    ORDER BY doc_id
    """,
    doc="Temperature-based mixture sampling (alpha=0.5 over language "
    "counts): head languages are downweighted toward sqrt(n) so "
    "low-resource languages keep a larger share — the standard "
    "multilingual pretraining mix. The accept test is integer-exact "
    "cross-multiplication of an md5-derived 32-bit uniform against the "
    "rational per-language take rate target*floor(sqrt(n_l))/(S*n_l): "
    "no float boundary can flip between engines. At 100 TB this is one "
    "broadcast of the per-language rate table and a map-only filter — "
    "no shuffle of the corpus at all.",
)
def mixture_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    by_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_l"),
        F.floor(F.sqrt(F.count("*"))).cast("long").alias("isq"),
    )
    tot = by_lang.agg(F.sum("isq").cast("long").alias("s_isq"))
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("long")
    return (
        docs.join(F.broadcast(by_lang), "lang")
        .crossJoin(F.broadcast(tot))
        .filter(
            u32 * F.col("s_isq") * F.col("n_l")
            < F.lit(_MIX_TARGET) * F.col("isq") * F.lit(4294967296)
        )
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Bloom-filter decontamination (distributed build + probe, no corpus join)
# --------------------------------------------------------------------------
_BLOOM_BITS = 4096  # m: filter size in bits
_BLOOM_K = 5  # k: hash functions per key
_BLOOM_LANE = 32  # bits stored per BIGINT word (no sign-bit hazards)


def _bloom_positions(df: DataFrame, keep: list) -> DataFrame:
    """Explode each doc's text fingerprint into its k Bloom bit positions
    (word index + in-word mask), via Kirsch-Mitzenmacher double hashing of
    one md5: pos_j = (h1 + j*h2) mod m."""
    fp = F.md5(F.col("text").cast("binary"))
    h1 = F.conv(F.substring(fp, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(fp, 13, 12), 16, 10).cast("long")
    pos = F.explode(
        F.array(*[(h1 + F.lit(j) * h2) % _BLOOM_BITS for j in range(_BLOOM_K)])
    ).alias("pos")
    return df.select(*keep, pos).select(
        *keep,
        (F.col("pos") / _BLOOM_LANE).cast("long").alias("word"),
        # shiftleft's bit count must be a Column here (F.shiftleft only
        # accepts a literal int), so build the mask via expr
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BLOOM_LANE} AS INT))").alias("mask"),
    )


_BLOOM_SQL_POS = f"""
      SELECT doc_id, source,
             (('0x' || substring(md5(text), 1, 12))::BIGINT
              + j.j * ('0x' || substring(md5(text), 13, 12))::BIGINT)
             % {_BLOOM_BITS} AS pos
      FROM documents, (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS j) j
"""


@query(
    "bloom_decontaminate",
    oracle=f"""
    WITH bpos AS ({_BLOOM_SQL_POS}),
    filt AS (
      SELECT pos // {_BLOOM_LANE} AS word,
             CAST(bit_or(1::BIGINT << CAST(pos % {_BLOOM_LANE} AS INTEGER))
                  AS BIGINT) AS bits
      FROM bpos WHERE source = 'src0' GROUP BY 1),
    probe AS (
      SELECT p.doc_id, p.source,
             CASE WHEN f.bits IS NOT NULL
                   AND (f.bits & (1::BIGINT << CAST(p.pos % {_BLOOM_LANE} AS INTEGER)))
                       = (1::BIGINT << CAST(p.pos % {_BLOOM_LANE} AS INTEGER))
                  THEN 1 ELSE 0 END AS hit
      FROM bpos p LEFT JOIN filt f ON p.pos // {_BLOOM_LANE} = f.word),
    per_doc AS (
      SELECT doc_id, source,
             CASE WHEN SUM(hit) = {_BLOOM_K} THEN 1 ELSE 0 END AS flagged
      FROM probe GROUP BY doc_id, source)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(flagged) AS BIGINT) AS n_flagged
    FROM per_doc GROUP BY source ORDER BY source
    """,
    doc="Bloom-filter decontamination: benchmark fingerprints (source "
    "'src0' = the held-out eval set) are folded into a {m}-bit Bloom "
    "filter ({k} md5-double-hashed positions per key, bits in 32-bit "
    "lanes of BIGINT words); the whole corpus is then probed for "
    "membership. Unlike the exact fingerprint equi-join "
    "(contamination_check), the probe side never shuffles the corpus: "
    "the filter is a bounded word->bits table (m/32 rows regardless of "
    "benchmark size) broadcast to a map-only membership test — the shape "
    "that decontaminates 100 TB against a benchmark suite in one pass, "
    "at a documented false-positive rate instead of exactness."
    .format(m=_BLOOM_BITS, k=_BLOOM_K),
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    filt = (
        _bloom_positions(docs.filter(F.col("source") == "src0"), [])
        .withColumn("w", F.col("word"))
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
    )
    probe = _bloom_positions(docs, [F.col("doc_id"), F.col("source")])
    hits = probe.join(F.broadcast(filt), probe["word"] == filt["w"], "left").withColumn(
        "hit",
        F.when(
            F.col("bits").isNotNull()
            & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")),
            1,
        ).otherwise(0),
    )
    per_doc = hits.groupBy("doc_id", "source").agg(
        F.when(F.sum("hit") == _BLOOM_K, 1).otherwise(0).alias("flagged")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("flagged").cast("long").alias("n_flagged"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# SemDeDup: cluster-scoped semantic near-duplicate pairs
# --------------------------------------------------------------------------
@query(
    "semantic_dedup",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    c AS (SELECT vec_id AS c_id, embedding AS c_vec, nrm AS c_nrm
          FROM e WHERE vec_id < 8),
    sc AS (
      SELECT e.vec_id, c.c_id,
             ROUND(list_sum(list_transform(generate_series(1, len(e.embedding)),
                     i -> CAST(e.embedding[i] AS DOUBLE)
                          * CAST(c.c_vec[i] AS DOUBLE)))
                   / (e.nrm * c.c_nrm), 6) AS s
      FROM e, c),
    asg AS (
      SELECT vec_id, CAST(c_id AS INTEGER) AS cluster FROM (
        SELECT vec_id, c_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, c_id) AS r
        FROM sc) t WHERE r = 1)
    SELECT aa.cluster AS cluster, a.vec_id AS a_id, b.vec_id AS b_id,
           ROUND(list_sum(list_transform(generate_series(1, len(a.embedding)),
                   i -> CAST(a.embedding[i] AS DOUBLE)
                        * CAST(b.embedding[i] AS DOUBLE)))
                 / (a.nrm * b.nrm), 6) AS score
    FROM e a JOIN asg aa ON a.vec_id = aa.vec_id
    JOIN asg ab ON ab.cluster = aa.cluster
    JOIN e b ON b.vec_id = ab.vec_id AND a.vec_id < b.vec_id
    WHERE ROUND(list_sum(list_transform(generate_series(1, len(a.embedding)),
                  i -> CAST(a.embedding[i] AS DOUBLE)
                       * CAST(b.embedding[i] AS DOUBLE)))
                / (a.nrm * b.nrm), 6) >= 0.15
    ORDER BY cluster, a_id, b_id
    """,
    doc="SemDeDup (Abbas et al. 2023) semantic dedup: nearest-of-8 "
    "centroid assignment (deterministic centroids = first 8 vectors, the "
    "ivf_assign convention), then cosine>=0.15 pairs scored only WITHIN "
    "each cluster — O(n^2/k) instead of the all-pairs O(n^2) of "
    "embedding_near_dup, with k sized ~sqrt(n) at scale so per-cluster "
    "blocks stay bounded. One broadcast (centroids) + one shuffle "
    "(cluster id); scoring is a vectorized Arrow pass per cluster using "
    "the sequential-fold helpers, bit-identical to the SQL replay.",
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup_pairs(emb, k_clusters=8, threshold_rounded=0.15).orderBy(
        "cluster", "a_id", "b_id"
    )


# --------------------------------------------------------------------------
# Unigram-LM perplexity filter (in-corpus language model)
# --------------------------------------------------------------------------
_NLL_KEEP = 3.41  # keep docs with mean token NLL <= this (rounded to 3dp)


@query(
    "perplexity_filter",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
      FROM documents),
    freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT COUNT(*) AS n FROM toks)
    SELECT t.doc_id AS doc_id,
           COUNT(*) AS n_tok,
           ROUND(AVG(ln(tot.n) - ln(f.c)), 3) AS avg_nll,
           CASE WHEN ROUND(AVG(ln(tot.n) - ln(f.c)), 3) <= {_NLL_KEEP}
                THEN 1 ELSE 0 END AS keep
    FROM toks t JOIN freq f USING (tok) CROSS JOIN tot
    GROUP BY t.doc_id ORDER BY doc_id
    """,
    doc="Unigram-LM perplexity filter (the CCNet/Gopher quality gate with "
    "the LM fit on the corpus itself): token frequencies in one "
    "map-side-combined groupBy, corpus total as a 1-row broadcast, then "
    "mean negative log-likelihood per document; keep = rounded NLL under "
    "a fixed threshold. Two shuffles total (token freq, doc regroup) — "
    "the token-keyed join is the classic hot-key skew case, handled by "
    "AQE skew splitting; scores are engine-identical because both sides "
    "average the same IEEE ln() terms and round before comparing.",
)
def perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = toks.agg(F.count("*").alias("n"))
    nll = dround(F.avg(F.log(F.col("n")) - F.log(F.col("c"))), 3)
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            nll.alias("avg_nll"),
            F.when(nll <= _NLL_KEEP, 1).otherwise(0).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al., MOSS) — verbatim-span overlap
# --------------------------------------------------------------------------
_WIN_K = 3  # tokens per gram
_WIN_W = 4  # grams per window
_WIN_STOP_DF = 50  # drop fingerprints appearing in more docs than this


@query(
    "winnowing_overlap",
    oracle=f"""
    WITH t AS (
      SELECT doc_id AS id, string_split(trim(text), ' ') AS toks
      FROM documents),
    g AS (
      SELECT id, u.i AS gpos,
             ('0x' || substring(md5(
                array_to_string(toks[u.i + 1:u.i + {_WIN_K}], ' ')), 1, 15)
             )::BIGINT AS h
      FROM t, unnest(generate_series(0, len(toks) - {_WIN_K})) u(i)
      WHERE len(toks) >= {_WIN_K}),
    w AS (
      SELECT id, gpos, h,
             MIN(h) OVER (PARTITION BY id ORDER BY gpos
                          ROWS BETWEEN CURRENT ROW
                          AND {_WIN_W - 1} FOLLOWING) AS wmin,
             COUNT(*) OVER (PARTITION BY id) AS ng
      FROM g),
    fp AS (SELECT DISTINCT id, wmin AS fp FROM w
           WHERE gpos <= ng - {_WIN_W}),
    hot AS (SELECT fp FROM fp GROUP BY fp HAVING COUNT(*) > {_WIN_STOP_DF}),
    fpf AS (SELECT * FROM fp WHERE fp NOT IN (SELECT fp FROM hot))
    SELECT a.id AS a_id, b.id AS b_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM fpf a JOIN fpf b ON a.fp = b.fp AND a.id < b.id
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ORDER BY a_id, b_id
    """,
    doc="Winnowing document fingerprints (Schleimer et al. SIGMOD'03, the "
    "MOSS algorithm): md5-hashed {k}-token grams, minimum per sliding "
    "window of {w} grams, distinct selected hashes = the doc's "
    "fingerprint set — any shared verbatim run of >= {span} tokens is "
    "GUARANTEED to share a fingerprint. Cross-doc matching via an "
    "inverted fingerprint index (equi-join), keeping pairs sharing >= 2 "
    "fingerprints. Corpus-hot fingerprints (boilerplate, > {df} docs) "
    "are dropped before the join — the stop-fingerprint guard that "
    "bounds join fanout at 100 TB. One explode + one bounded per-doc "
    "window + one equi-join; no all-pairs stage anywhere."
    .format(k=_WIN_K, w=_WIN_W, span=_WIN_K + _WIN_W - 1, df=_WIN_STOP_DF),
)
def winnowing_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.dedup import gram_hash_arrow

    docs = load_table(spark, sf_dir, "documents")
    # Arrow-batched ordered gram hashing (gram_hash_arrow): the Column
    # form (transform + k element_at per gram + md5/conv) is interpreted
    # and was the dominant cost of this operator — the vectorized UDF is
    # 2.8x faster on the gram stream with bit-identical hashes (the
    # oracle replays them via ('0x' || substring(md5(g),1,15))::BIGINT).
    # Docs shorter than k grams yield an empty array -> no rows from
    # posexplode, replacing the explicit size() pre-filter.
    g = docs.select(
        F.col("doc_id").alias("id"),
        F.posexplode(gram_hash_arrow(_WIN_K)(F.col("text"))).alias(
            "gpos", "h"
        ),
    )
    # One ordered window computes BOTH the per-window min and the
    # full-window guard (lead(h, w-1) IS NOT NULL <=> gpos <= ng - w):
    # same partitioning+ordering -> a single WindowExec, where a
    # count-over-partition guard would add a second window pass.
    w_ord = Window.partitionBy("id").orderBy("gpos")
    fp = (
        g.select(
            "id",
            F.min("h").over(w_ord.rowsBetween(0, _WIN_W - 1)).alias("wmin"),
            F.lead("h", _WIN_W - 1).over(w_ord).alias("guard"),
        )
        .filter(F.col("guard").isNotNull())
        .select("id", F.col("wmin").alias("fp"))
        .distinct()
        # both the hot-fingerprint aggregate and the two self-join sides
        # read this relation; persist so the gram explode + md5 + window
        # pipeline runs once (one row per selected fingerprint — a small
        # fraction of the gram stream); registered with caching.persisted
        # so a long-lived session can release_caches() afterwards
    )
    fp = persisted(fp)
    hot = fp.groupBy("fp").agg(F.count("*").alias("df")).filter(
        F.col("df") > _WIN_STOP_DF
    )
    fpf = fp.join(F.broadcast(hot.select("fp")), "fp", "left_anti")
    a = fpf.select(F.col("id").alias("a_id"), "fp")
    b = fpf.select(F.col("id").alias("b_id"), F.col("fp").alias("fp_b"))
    return (
        a.join(b, (F.col("fp") == F.col("fp_b")) & (F.col("a_id") < F.col("b_id")))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .orderBy("a_id", "b_id")
    )


# --------------------------------------------------------------------------
# Incremental dedup: new batch vs existing corpus (asymmetric MinHash-LSH)
# --------------------------------------------------------------------------
@query(
    "incremental_dedup",
    oracle=None,  # set below: needs pipeline._MINHASH_PAIRS_CTE
    doc="Incremental corpus dedup — the shape an always-on ingestion "
    "pipeline runs: an incoming batch (doc_id % 10 = 0) is deduped "
    "AGAINST the existing corpus without re-pairing the corpus with "
    "itself. MinHash signatures are computed once over both sets; the "
    "LSH band join is ASYMMETRIC (incoming x corpus only), so its cost "
    "scales with batch size, not corpus^2; candidates get the exact "
    "Jaccard>=1/4 verification; incoming docs with any corpus match "
    "are rejected. Output: per-source accepted/rejected accounting. "
    "Oracle replays the symmetric pair CTE and keeps mixed pairs.",
)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_arrays_df(docs).localCheckpoint()
    incoming_pred = F.col("doc_id") % 10 == 0
    # one signature pass over the full relation, split afterwards
    cand_all = D.lsh_candidate_pairs(
        docs, n=3, num_hashes=16, bands=8, shingle_arrays=sh
    )
    # keep only incoming x corpus pairs (either orientation)
    mixed = cand_all.filter(
        (F.col("a_id") % 10 == 0) != (F.col("b_id") % 10 == 0)
    )
    pairs = D.jaccard_pairs(
        docs, mixed, n=3, tau_num=1, tau_den=4, shingle_arrays=sh
    ).select("a_id", "b_id")
    rejected = (
        pairs.select(
            F.when(F.col("a_id") % 10 == 0, F.col("a_id"))
            .otherwise(F.col("b_id"))
            .alias("doc_id")
        )
        .distinct()
    )
    incoming = docs.filter(incoming_pred).select("doc_id", "source")
    return (
        incoming.join(rejected.withColumn("rej", F.lit(1)), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_incoming"),
            F.sum(F.when(F.col("rej").isNotNull(), 1).otherwise(0)).alias(
                "n_rejected"
            ),
            F.sum(F.when(F.col("rej").isNull(), 1).otherwise(0)).alias(
                "n_accepted"
            ),
        )
        .orderBy("source")
    )


def _set_incremental_oracle() -> None:
    from kyuubi_spark.queries import REGISTRY
    from kyuubi_spark.queries.pipeline import _MINHASH_PAIRS_CTE

    spec = REGISTRY["incremental_dedup"]
    oracle = f"""
    WITH {_MINHASH_PAIRS_CTE},
    mixed AS (
      SELECT CASE WHEN a_id % 10 = 0 THEN a_id ELSE b_id END AS doc_id
      FROM dup_pairs WHERE (a_id % 10 = 0) <> (b_id % 10 = 0)
      GROUP BY 1),
    inc AS (SELECT doc_id, source FROM documents WHERE doc_id % 10 = 0)
    SELECT i.source AS source,
           CAST(COUNT(*) AS BIGINT) AS n_incoming,
           CAST(COUNT(m.doc_id) AS BIGINT) AS n_rejected,
           CAST(COUNT(*) - COUNT(m.doc_id) AS BIGINT) AS n_accepted
    FROM inc i LEFT JOIN mixed m ON i.doc_id = m.doc_id
    GROUP BY 1 ORDER BY source
    """
    REGISTRY["incremental_dedup"] = type(spec)(
        name=spec.name, builder=spec.builder, oracle=oracle, doc=spec.doc
    )


_set_incremental_oracle()


# --------------------------------------------------------------------------
# Sliding context-window chunking (pretraining example construction)
# --------------------------------------------------------------------------
_CHUNK_LEN = 64  # tokens per training example
_CHUNK_STRIDE = 48  # tokens between window starts (overlap = len - stride)


@query(
    "context_window_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id, u.i AS chunk_idx,
             u.i * {_CHUNK_STRIDE} AS start_tok,
             least(len(toks) - u.i * {_CHUNK_STRIDE}, {_CHUNK_LEN}) AS n_tok,
             md5(array_to_string(
               toks[u.i * {_CHUNK_STRIDE} + 1:
                    u.i * {_CHUNK_STRIDE} + {_CHUNK_LEN}], ' ')) AS chunk_md5
      FROM t, unnest(generate_series(0,
             CAST(greatest(ceil((len(toks) - {_CHUNK_LEN}) * 1.0
                           / {_CHUNK_STRIDE}), 0) AS BIGINT))) u(i)
      WHERE len(toks) > 0)
    SELECT doc_id, chunk_idx, start_tok, CAST(n_tok AS BIGINT) AS n_tok,
           chunk_md5
    FROM c ORDER BY doc_id, chunk_idx
    """,
    doc="Sliding context-window chunking — the example-construction step "
    "of a pretraining pipeline: each document is cut into {n}-token "
    "windows with stride {s} ({o}-token overlap so no span is seen only "
    "at a window boundary); the last window is short rather than "
    "dropped. Emits (doc, chunk index, start offset, length, content "
    "md5). Pure per-row array expressions — map-only, zero shuffle "
    "before the output sort, embarrassingly parallel at any corpus "
    "size.".format(n=_CHUNK_LEN, s=_CHUNK_STRIDE, o=_CHUNK_LEN - _CHUNK_STRIDE),
)
def context_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    n_windows = F.greatest(
        F.ceil((F.size(toks) - _CHUNK_LEN) / F.lit(_CHUNK_STRIDE)), F.lit(0)
    ).cast("long")
    chunks = docs.filter(F.size(toks) > 0).select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_windows),
                lambda i: F.struct(
                    (i * _CHUNK_STRIDE).cast("long").alias("start_tok"),
                    F.least(
                        F.size(toks) - i * _CHUNK_STRIDE, F.lit(_CHUNK_LEN)
                    ).cast("long").alias("n_tok"),
                    F.md5(
                        F.concat_ws(
                            " ",
                            F.slice(toks, i * _CHUNK_STRIDE + 1, _CHUNK_LEN),
                        ).cast("binary")
                    ).alias("chunk_md5"),
                ),
            )
        ).alias("chunk_idx", "c"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.start_tok").alias("start_tok"),
        F.col("c.n_tok").alias("n_tok"),
        F.col("c.chunk_md5").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# Count-min sketch heavy hitters (token frequency estimation)
# --------------------------------------------------------------------------
_CMS_W = 1024  # buckets per row
_CMS_D = 4  # hash rows


@query(
    "approx_topk_cms",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents),
    h AS (
      SELECT tok,
             ('0x' || substring(md5(tok), 1, 12))::BIGINT AS h1,
             ('0x' || substring(md5(tok), 13, 12))::BIGINT AS h2
      FROM toks),
    pos AS (
      SELECT tok, d.d AS d, (h1 + d.d * h2) % {_CMS_W} AS bucket
      FROM h, (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS d) d),
    sketch AS (
      SELECT d, bucket, COUNT(*) AS c FROM pos GROUP BY 1, 2),
    cand AS (
      SELECT DISTINCT tok, d, bucket FROM pos),
    est AS (
      SELECT c.tok, MIN(s.c) AS cms_est
      FROM cand c JOIN sketch s ON c.d = s.d AND c.bucket = s.bucket
      GROUP BY c.tok),
    truth AS (SELECT tok, COUNT(*) AS true_count FROM toks GROUP BY tok),
    ranked AS (
      SELECT e.tok, CAST(e.cms_est AS BIGINT) AS cms_est,
             CAST(t.true_count AS BIGINT) AS true_count,
             ROW_NUMBER() OVER (ORDER BY e.cms_est DESC, e.tok) AS rnk
      FROM est e JOIN truth t ON e.tok = t.tok)
    SELECT CAST(rnk AS BIGINT) AS rnk, tok, cms_est, true_count
    FROM ranked WHERE rnk <= 20 ORDER BY rnk
    """,
    doc="Count-min sketch heavy hitters (Cormode & Muthukrishnan): token "
    "counts folded into a {d}x{w} sketch (md5 double-hashed buckets, "
    "one grouped count per hash row — the sketch is {d}*{w} cells "
    "REGARDLESS of corpus size, mergeable across partitions by "
    "addition), point estimates as the min over rows, top-20 tokens by "
    "estimate with the exact count alongside (CMS guarantees est >= "
    "truth; the gap is the collision overestimate). At 100 TB the "
    "sketch build is one map-side-combined aggregation and estimation "
    "is a broadcast join — no full-frequency shuffle."
    .format(d=_CMS_D, w=_CMS_W),
)
def approx_topk_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    )
    hx = F.md5(F.col("tok").cast("binary"))
    h1 = F.conv(F.substring(hx, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 13, 12), 16, 10).cast("long")
    pos = toks.select(
        "tok",
        F.posexplode(
            F.array(*[(h1 + F.lit(d) * h2) % _CMS_W for d in range(_CMS_D)])
        ).alias("d", "bucket"),
    )
    sketch = pos.groupBy("d", "bucket").agg(F.count("*").alias("c"))
    cand = pos.select("tok", "d", "bucket").distinct()
    est = (
        cand.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("tok")
        .agg(F.min("c").alias("cms_est"))
    )
    truth = toks.groupBy("tok").agg(F.count("*").alias("true_count"))
    ranked = (
        est.join(truth, "tok")
        .withColumn(
            "rnk",
            F.row_number()
            .over(Window.orderBy(F.col("cms_est").desc(), F.col("tok")))
            .cast("bigint"),
        )
        .filter(F.col("rnk") <= 20)
    )
    return ranked.select("rnk", "tok", "cms_est", "true_count").orderBy("rnk")
