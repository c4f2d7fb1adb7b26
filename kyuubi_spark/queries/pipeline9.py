"""Pipeline batch 9 — training-data ops round 9.

Four first-class LLM-pipeline operators with value-exact DuckDB oracles:

- ``length_outlier_mad``: robust per-source length anomaly screen
  (median absolute deviation), the outlier gate quality pipelines run
  before length-based truncation decisions.
- ``tokenizer_fertility_report``: per-language tokenizer-fertility
  proxies (whitespace tokens, bytes/token, alnum density) — the
  pre-tokenizer audit that decides vocab allocation across languages.
- ``hamming_ann_topk``: sign-bit binary embeddings packed into ONE
  int64 per vector + Hamming top-k via XOR+POPCNT — the classic
  64x-memory-reduction binary ANN path.
- ``matryoshka_recall_report``: truncated-prefix (MRL-style) embedding
  retrieval quality — recall@5 of 16-dim-prefix cosine top-k against
  the full 64-dim ground truth.

Reference scope: these extend the engine the same way the reference's
extensions surface (SURVEY.md §2's beyond-operator pipeline set);
oracle-parity conventions follow queries/pipeline.py (dround rounding,
sequential-order dot products, id tiebreaks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.functions import similarity as S
from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table


@query(
    "length_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT source, COUNT(*) AS n_docs, median(n_chars) AS med
      FROM documents GROUP BY source),
    dev AS (
      SELECT d.source, d.n_chars, m.n_docs, m.med,
             abs(d.n_chars - m.med) AS adev
      FROM documents d JOIN med m ON d.source = m.source),
    mad AS (
      SELECT source, any_value(n_docs) AS n_docs, any_value(med) AS med,
             median(adev) AS mad
      FROM dev GROUP BY source)
    SELECT d.source AS source,
           any_value(m.n_docs) AS n_docs,
           ROUND(any_value(m.med), 1) AS median_chars,
           ROUND(any_value(m.mad), 1) AS mad_chars,
           CAST(SUM(CASE WHEN abs(d.n_chars - m.med) > 3.0 * 1.4826 * m.mad
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM documents d JOIN mad m ON d.source = m.source
    GROUP BY d.source ORDER BY source
    """,
    doc="Robust per-source document-length outliers: median + median "
    "absolute deviation (the 1.4826 normal-consistency constant), "
    "flagging docs beyond 3 robust sigmas — the length-anomaly screen "
    "a quality pipeline runs per source before truncation decisions. "
    "Plan: two per-source aggregates + one broadcast join of the tiny "
    "per-source stats back onto the corpus (sources are low-cardinality, "
    "so the stats side always broadcasts; the corpus shuffles only for "
    "the two keyed aggregates). The exact median is the oracle-parity "
    "choice; a 100 TB production run swaps in percentile_approx with "
    "identical plan shape.",
)
def length_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    med = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.median("n_chars").alias("med")
    )
    dev = docs.join(F.broadcast(med), "source").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("source").agg(
        F.first("n_docs").alias("n_docs"),
        F.first("med").alias("med"),
        F.median("adev").alias("mad"),
    )
    return (
        docs.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.first("n_docs").alias("n_docs"),
            dround(F.first("med"), 1).alias("median_chars"),
            dround(F.first("mad"), 1).alias("mad_chars"),
            F.sum(
                F.when(
                    F.abs(F.col("n_chars") - F.col("med"))
                    > 3.0 * 1.4826 * F.col("mad"),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("source")
    )


@query(
    "tokenizer_fertility_report",
    oracle=r"""
    WITH t AS (
      SELECT lang,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE length(regexp_replace(trim(text), '\s+', ' ', 'g'))
                     - length(replace(
                         regexp_replace(trim(text), '\s+', ' ', 'g'), ' ', ''))
                     + 1 END AS ws_tokens,
             length(text) AS n_chars,
             strlen(text) AS n_bytes,
             length(text) - length(regexp_replace(text, '[A-Za-z0-9]', '', 'g'))
               AS alnum_chars
      FROM documents)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(ws_tokens) AS BIGINT) AS n_tokens,
           ROUND(SUM(n_chars) * 1.0 / SUM(ws_tokens), 4) AS chars_per_token,
           ROUND(SUM(n_bytes) * 1.0 / SUM(ws_tokens), 4) AS bytes_per_token,
           ROUND(SUM(alnum_chars) * 1.0 / SUM(n_chars), 4) AS alnum_ratio
    FROM t GROUP BY lang ORDER BY lang
    """,
    doc="Per-language tokenizer-fertility proxies: whitespace-token "
    "counts via pure length arithmetic (collapse runs, count "
    "separators), bytes per token, and alphanumeric density — the "
    "audit that decides per-language vocab allocation before training "
    "a tokenizer. One map-side projection + one hash aggregate on the "
    "low-cardinality lang key; every expression is whole-stage-codegen "
    "string arithmetic, no UDFs, so the scan dominates at 100 TB.",
)
def tokenizer_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t1 = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    ws_tokens = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.length(t1) - F.length(F.regexp_replace(t1, " ", "")) + 1
    )
    alnum = F.length("text") - F.length(
        F.regexp_replace("text", "[A-Za-z0-9]", "")
    )
    return (
        docs.select(
            "lang",
            ws_tokens.alias("ws_tokens"),
            F.length("text").alias("n_chars"),
            F.octet_length("text").alias("n_bytes"),
            alnum.alias("alnum_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("n_tokens"),
            dround(F.sum("n_chars") * 1.0 / F.sum("ws_tokens"), 4).alias(
                "chars_per_token"
            ),
            dround(F.sum("n_bytes") * 1.0 / F.sum("ws_tokens"), 4).alias(
                "bytes_per_token"
            ),
            dround(F.sum("alnum_chars") * 1.0 / F.sum("n_chars"), 4).alias(
                "alnum_ratio"
            ),
        )
        .orderBy("lang")
    )


@query(
    "hamming_ann_topk",
    oracle="""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(list_sum(list_transform(generate_series(1, 64),
               i -> CASE WHEN (q.embedding[i] >= 0) != (c.embedding[i] >= 0)
                         THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
      FROM q JOIN embeddings c ON c.vec_id != q.vec_id)
    SELECT query_id, neighbor_id, hamming, rnk FROM (
      SELECT query_id, neighbor_id, hamming,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY hamming, neighbor_id) AS BIGINT) AS rnk
      FROM scored) t
    WHERE rnk <= 5 ORDER BY query_id, rnk
    """,
    doc="Binary-embedding ANN: each 64-dim float vector collapses to ONE "
    "int64 of sign bits (64x memory reduction — the standard binary "
    "embedding deployment), and Hamming top-5 for the 10 query vectors "
    "runs as XOR + POPCNT on packed longs (bit_count(sig ^ qsig), "
    "whole-stage codegen, one CPU instruction per comparison). Plan: "
    "one signature projection pass, broadcast of the 10 query "
    "signatures, per-query top-k window. At 100 TB the signature table "
    "is ~1/256th the corpus bytes and the scan is embarrassingly "
    "parallel; the oracle recomputes the same Hamming distances naively "
    "from the sign pattern.",
)
def hamming_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    sig = emb.select(
        "vec_id",
        F.expr(
            "aggregate(transform(sequence(0, 63),"
            " i -> IF(embedding[i] >= 0.0F, shiftleft(1L, i), 0L)),"
            " 0L, (acc, x) -> acc | x)"
        ).alias("sig"),
    )
    q = sig.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("sig").alias("qsig")
    )
    scored = (
        sig.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr("bit_count(sig ^ qsig)").cast("bigint").alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .orderBy("query_id", "rnk")
    )


def _top5_cte(dim: int, pfx: str) -> str:
    """Brute-force rounded-cosine top-5 CTE over the first ``dim``
    embedding dims (sequential list_sum order matches the Spark side's
    _dot_pre fold)."""
    return f"""{pfx}_e AS (
      SELECT vec_id, embedding[1:{dim}] AS v,
             sqrt(list_sum(list_transform(embedding[1:{dim}],
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    {pfx}_s AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(generate_series(1, {dim}),
                     i -> CAST(c.v[i] AS DOUBLE) * CAST(q.v[i] AS DOUBLE)))
                   / (c.nrm * q.nrm), 6) AS score
      FROM {pfx}_e q JOIN {pfx}_e c ON q.vec_id < 10
        AND c.vec_id != q.vec_id),
    {pfx}_t AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY score DESC, neighbor_id) AS r
        FROM {pfx}_s) z WHERE r <= 5)"""


@query(
    "matryoshka_recall_report",
    oracle=f"""
    WITH {_top5_cte(64, "full")},
    {_top5_cte(16, "tr")}
    SELECT f.query_id AS query_id,
           COUNT(t.neighbor_id) AS n_hits,
           ROUND(COUNT(t.neighbor_id) / 5.0, 2) AS recall_at_5
    FROM full_t f LEFT JOIN tr_t t
      ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    GROUP BY f.query_id ORDER BY query_id
    """,
    doc="Matryoshka (prefix-truncated) embedding retrieval quality: "
    "recall@5 of 16-dim-prefix cosine top-5 against the full 64-dim "
    "ground truth, per query — the measurement that justifies serving "
    "truncated MRL embeddings at a fraction of the index size. Both "
    "lanes reuse the brute-force cosine_topk kernel (broadcast queries, "
    "rounded-score id-tiebreak ranking) on the bounded 10-query eval "
    "slice; at 100 TB the truncated lane is the IVF/LSH candidate "
    "generator and this report is its acceptance gate.",
)
def matryoshka_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    full = S.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    tr_emb = emb.select(
        "vec_id", F.slice("embedding", 1, 16).alias("embedding")
    )
    trunc = S.cosine_topk(tr_emb, tr_emb.filter(F.col("vec_id") < 10), k=5)
    # both top-5 relations are <= 50 rows by construction: broadcast the
    # truncated side so the recall join never plans a sort-merge
    hits = full.alias("f").join(
        F.broadcast(trunc.alias("t")),
        (F.col("f.query_id") == F.col("t.query_id"))
        & (F.col("f.neighbor_id") == F.col("t.neighbor_id")),
        "left",
    )
    return (
        hits.groupBy(F.col("f.query_id").alias("query_id"))
        .agg(
            F.count(F.col("t.neighbor_id")).alias("n_hits"),
            dround(F.count(F.col("t.neighbor_id")) / 5.0, 2).alias(
                "recall_at_5"
            ),
        )
        .orderBy("query_id")
    )


_BLOCKLIST = ("slow", "dup", "fail")


@query(
    "blocklist_filter_report",
    oracle=r"""
    WITH f AS (
      SELECT source,
             CASE WHEN regexp_matches(text, '\b(slow|dup|fail)\b')
                  THEN 1 ELSE 0 END AS flagged,
             CASE WHEN regexp_matches(text, '\bslow\b') THEN 1 ELSE 0 END
               AS hit_slow,
             CASE WHEN regexp_matches(text, '\bdup\b') THEN 1 ELSE 0 END
               AS hit_dup,
             CASE WHEN regexp_matches(text, '\bfail\b') THEN 1 ELSE 0 END
               AS hit_fail
      FROM documents)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(flagged) AS BIGINT) AS n_flagged,
           ROUND(SUM(flagged) * 1.0 / COUNT(*), 4) AS flag_rate,
           CAST(SUM(hit_slow) AS BIGINT) AS n_slow,
           CAST(SUM(hit_dup) AS BIGINT) AS n_dup,
           CAST(SUM(hit_fail) AS BIGINT) AS n_fail
    FROM f GROUP BY source ORDER BY source
    """,
    doc="Blocklist (badword) filter report — the C4-style wordlist gate "
    "every corpus-cleaning pipeline runs: per source, the fraction of "
    "documents containing any blocklisted term as a WHOLE word "
    "(word-boundary regex, identical \\b semantics in Java regex and "
    "RE2), with per-term hit counts for blocklist tuning. One map-side "
    "projection (codegen rlike, no UDF) + one hash aggregate on the "
    "low-cardinality source key — scan-bound at 100 TB.",
)
def blocklist_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    any_hit = "|".join(_BLOCKLIST)
    sel = docs.select(
        "source",
        F.col("text").rlike(rf"\b({any_hit})\b").cast("int").alias("flagged"),
        *[
            F.col("text").rlike(rf"\b{w}\b").cast("int").alias(f"hit_{w}")
            for w in _BLOCKLIST
        ],
    )
    return (
        sel.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("flagged").cast("bigint").alias("n_flagged"),
            dround(F.sum("flagged") * 1.0 / F.count("*"), 4).alias(
                "flag_rate"
            ),
            *[
                F.sum(f"hit_{w}").cast("bigint").alias(f"n_{w}")
                for w in _BLOCKLIST
            ],
        )
        .orderBy("source")
    )


_BM25_TERMS = ("spark", "join", "stream")
_BM25_K1, _BM25_B = 1.2, 0.75


@query(
    "bm25_topk",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
           FROM tok WHERE term IN ('spark', 'join', 'stream')
           GROUP BY 1, 2),
    dl AS (SELECT doc_id, CAST(len(string_split(trim(text), ' ')) AS DOUBLE)
                    AS doclen
           FROM documents),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             AVG(doclen) AS avgdl
      FROM dl),
    df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    idf AS (SELECT term,
                   ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                     AS idf
            FROM df, stats),
    parts AS (
      SELECT dl.doc_id,
             idf.idf * tf.tf * (1.2 + 1.0)
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.doclen / stats.avgdl))
               AS part,
             idf.term AS term
      FROM dl
      JOIN tf ON tf.doc_id = dl.doc_id
      JOIN idf ON idf.term = tf.term
      CROSS JOIN stats)
    SELECT doc_id, ROUND(SUM(part), 4) AS bm25, CAST(COUNT(*) AS BIGINT)
             AS n_terms_hit
    FROM parts
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    doc="BM25 retrieval (Okapi, k1=1.2 b=0.75) for a fixed 3-term query "
    "over the corpus: whole-word term frequencies, document length "
    "normalization against the corpus average, ln-smoothed IDF, top-20 "
    "by score with doc-id tiebreak. The summation per doc runs over the "
    "(doc, term) hit relation (<= |terms| rows per doc), so the "
    "rounded-at-4 score is addition-order-safe cross-engine. Plan: one "
    "tokenize+filter pass, a broadcast of the 2-row stats + "
    "|terms|-row IDF table, one aggregate + global top-k "
    "(TakeOrderedAndProject) — the bag-of-words retrieval baseline at "
    "corpus scale with zero UDFs.",
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("term"),
    )
    tf = (
        tok.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dl = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " ")).cast("double").alias(
            "doclen"
        ),
    )
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
        "avgdl",
    )
    k1, b = _BM25_K1, _BM25_B
    parts = (
        dl.join(tf, "doc_id")
        .join(F.broadcast(idf), "term")
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("doclen") / F.col("avgdl"))
                )
            ).alias("part"),
        )
    )
    return (
        parts.groupBy("doc_id")
        .agg(
            dround(F.sum("part"), 4).alias("bm25"),
            F.count("*").cast("bigint").alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


_KMEANS_CTE = """e AS (SELECT vec_id, embedding FROM embeddings),
    c0 AS (SELECT vec_id AS cl, embedding AS c FROM e WHERE vec_id < 8),
    d1 AS (
      SELECT e.vec_id, c0.cl,
             list_sum(list_transform(generate_series(1, 64),
               i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c0.c[i] AS DOUBLE))
                  * (CAST(e.embedding[i] AS DOUBLE) - CAST(c0.c[i] AS DOUBLE))))
               AS d
      FROM e, c0),
    a1 AS (
      SELECT vec_id, cl FROM (
        SELECT vec_id, cl,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS r
        FROM d1) t WHERE r = 1),
    upd AS (
      SELECT a1.cl, u.i AS dim,
             SUM(CAST(CAST(e.embedding[u.i] AS DOUBLE) AS DECIMAL(28,12)))
               AS s,
             COUNT(*) AS n
      FROM a1 JOIN e USING (vec_id),
           unnest(generate_series(1, 64)) AS u(i)
      GROUP BY 1, 2),
    c1 AS (
      SELECT cl, list(ROUND(CAST(s AS DOUBLE) / n, 9) ORDER BY dim) AS c
      FROM upd GROUP BY cl),
    d2 AS (
      SELECT e.vec_id, c1.cl,
             list_sum(list_transform(generate_series(1, 64),
               i -> (CAST(e.embedding[i] AS DOUBLE) - c1.c[i])
                  * (CAST(e.embedding[i] AS DOUBLE) - c1.c[i]))) AS d
      FROM e, c1),
    a2 AS (
      SELECT vec_id, cl FROM (
        SELECT vec_id, cl,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS r
        FROM d2) t WHERE r = 1)"""


@query(
    "kmeans_silhouette_report",
    oracle=f"""
    WITH {_KMEANS_CTE},
    sil AS (
      SELECT a2.vec_id, a2.cl,
             sqrt(down.d) AS a_d, sqrt(dmin.d) AS b_d
      FROM a2
      JOIN d2 down ON down.vec_id = a2.vec_id AND down.cl = a2.cl
      JOIN (SELECT d2.vec_id, MIN(d2.d) AS d
            FROM d2 JOIN a2 USING (vec_id)
            WHERE d2.cl != a2.cl GROUP BY d2.vec_id) dmin
        ON dmin.vec_id = a2.vec_id),
    vals AS (
      SELECT cl,
             CAST(ROUND((b_d - a_d) / greatest(a_d, b_d), 12)
                  AS DECIMAL(20,12)) AS s
      FROM sil)
    SELECT cl AS cluster, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette
    FROM vals GROUP BY cl ORDER BY cluster
    """,
    doc="Cluster-quality report: SIMPLIFIED silhouette (centroid-based "
    "a/b distances — the O(n*k) scale-safe form of the O(n^2) classic) "
    "over the SAME two deterministic Lloyd iterations kmeans_lloyd "
    "verifies. Per point: a = distance to its centroid, b = distance "
    "to the nearest other centroid, s = (b-a)/max(a,b); per-cluster "
    "means aggregate through DECIMAL sums of rounded-12 scores so the "
    "float summation order cannot flip the hash. The entire iterative "
    "algorithm + quality metric is value-exact SQL-replayable. At "
    "100 TB: one vectorized assignment pass + k broadcast centroid "
    "distance expressions per row, no pairwise anything.",
)
def kmeans_silhouette_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.queries.pipeline2 import (
        _kmeans_assign_udf,
        _kmeans_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    init = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    cents0 = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in init
    ]
    a1 = emb.withColumn(
        "cl", _kmeans_assign_udf(spark, cents0)(F.col("embedding"))
    )
    c1_rows = _kmeans_centroids(a1).orderBy("cl", "dim").collect()
    by_cl: dict[int, list[float]] = {}
    for r in c1_rows:
        by_cl.setdefault(int(r["cl"]), []).append(float(r["c"]))
    cents1 = sorted(by_cl.items())

    a2 = emb.withColumn(
        "cl", _kmeans_assign_udf(spark, cents1)(F.col("embedding"))
    )
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # one sequential-fold squared-distance expression per (broadcast)
    # final centroid — zip_with + left-fold matches DuckDB's list_sum
    dists = [
        F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(v)) for v in c]),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for _cl, c in cents1
    ]
    arr = F.array(*dists)
    own = F.sqrt(F.element_at(arr, F.col("cl") + 1))
    other = F.sqrt(
        F.array_min(F.filter(arr, lambda _x, i: i != F.col("cl")))
    )
    sil = a2.select(
        "cl",
        dround((other - own) / F.greatest(own, other), 12)
        .cast("decimal(20,12)")
        .alias("s"),
    )
    return (
        sil.groupBy("cl")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            dround(F.sum("s").cast("double") / F.count("*"), 6).alias(
                "mean_silhouette"
            ),
        )
        .select(F.col("cl").alias("cluster"), "n", "mean_silhouette")
        .orderBy("cluster")
    )


@query(
    "pq_distortion_report",
    oracle="""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
    cw AS (SELECT vec_id AS k, embedding FROM e WHERE vec_id < 16),
    subs AS (SELECT unnest(generate_series(0, 7)) AS s),
    enc_d AS (
      SELECT v.vec_id, s.s, c.k,
             list_sum(list_transform(generate_series(1, 8),
               j -> (CAST(v.embedding[s.s*8+j] AS DOUBLE)
                     - CAST(c.embedding[s.s*8+j] AS DOUBLE))
                  * (CAST(v.embedding[s.s*8+j] AS DOUBLE)
                     - CAST(c.embedding[s.s*8+j] AS DOUBLE)))) AS d
      FROM e v, subs s, cw c),
    qe AS (SELECT vec_id, s, MIN(d) AS d FROM enc_d GROUP BY 1, 2)
    SELECT s AS subspace,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(CAST(SUM(CAST(ROUND(d, 12) AS DECIMAL(26,12))) AS DOUBLE)
                 / COUNT(*), 9) AS mse,
           ROUND(MAX(d), 9) AS max_se
    FROM qe GROUP BY s ORDER BY subspace
    """,
    doc="Product-quantization DISTORTION report — the codebook-quality "
    "gate that decides whether a PQ index (pq_adc_topk's 8x8 codebook) "
    "is fit to serve: per subspace, the mean and max squared "
    "quantization error between each subvector and its nearest "
    "codeword. Per-point errors round to 12 decimals and aggregate "
    "through DECIMAL sums, so the cross-engine mean is "
    "summation-order-proof. One vectorized Arrow-batched encode pass "
    "over a broadcast codebook (the same kernel the index build runs); "
    "errors never leave the executor unaggregated.",
)
def pq_distortion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from kyuubi_spark.functions.similarity import _round_half_away

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_sub, sub_dim, n_codes = 8, 8, 16
    cb_rows = emb.filter(F.col("vec_id") < n_codes).orderBy("vec_id").collect()
    codebook = np.array(
        [[float(x) for x in r["embedding"]] for r in cb_rows], dtype="float64"
    ).reshape(n_codes, n_sub, sub_dim)
    bc = spark.sparkContext.broadcast(codebook)

    @pandas_udf("array<double>")
    def qerr(vecs: pd.Series) -> pd.Series:
        cb = bc.value
        m = np.array(vecs.tolist(), dtype="float64").reshape(
            -1, n_sub, sub_dim
        )
        out = []
        for row in m:
            errs = []
            for s in range(n_sub):
                # sequential (cumsum) sums match list_sum's left fold
                d = ((row[s][None, :] - cb[:, s, :]) ** 2).cumsum(axis=1)[
                    :, -1
                ]
                # round half-away at 12 like the oracle's ROUND(d, 12)
                errs.append(float(_round_half_away(d.min() * 1e12) / 1e12))
            out.append(errs)
        return pd.Series(out)

    per = emb.select(
        F.posexplode(qerr(F.col("embedding"))).alias("s", "err")
    ).select("s", F.col("err").cast("decimal(26,12)").alias("err"))
    return (
        per.groupBy("s")
        .agg(
            F.count("*").cast("bigint").alias("n_vectors"),
            dround(
                F.sum("err").cast("double") / F.count("*"), 9
            ).alias("mse"),
            dround(F.max("err").cast("double"), 9).alias("max_se"),
        )
        .select(F.col("s").alias("subspace"), "n_vectors", "mse", "max_se")
        .orderBy("subspace")
    )


@query(
    "ivf_nprobe_sweep",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
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
    probe_all AS (
      SELECT vec_id AS query_id, cell,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY d DESC, cell) AS pr
      FROM sim WHERE vec_id < 10),
    np AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
    cand AS (
      SELECT np.nprobe, p.query_id, a.vec_id AS neighbor_id
      FROM np
      JOIN probe_all p ON p.pr <= np.nprobe
      JOIN assign a ON a.cell = p.cell AND a.vec_id != p.query_id),
    scored AS (
      SELECT cd.nprobe, cd.query_id, cd.neighbor_id,
             ROUND(list_sum(list_transform(generate_series(1, 64),
                     i -> CAST(cv.embedding[i] AS DOUBLE)
                          * CAST(qv.embedding[i] AS DOUBLE)))
                   / (cv.nrm * qv.nrm), 6) AS score
      FROM cand cd
      JOIN e qv ON qv.vec_id = cd.query_id
      JOIN e cv ON cv.vec_id = cd.neighbor_id),
    ivf5 AS (
      SELECT nprobe, query_id, neighbor_id FROM (
        SELECT nprobe, query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY nprobe, query_id
                                  ORDER BY score DESC, neighbor_id) AS r
        FROM scored) t WHERE r <= 5),
    ex_q AS (SELECT vec_id AS query_id, embedding AS qv, nrm AS qn
             FROM e WHERE vec_id < 10),
    ex_scored AS (
      SELECT ex_q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_sum(list_transform(generate_series(1, 64),
                     i -> CAST(e.embedding[i] AS DOUBLE)
                          * CAST(ex_q.qv[i] AS DOUBLE)))
                   / (e.nrm * ex_q.qn), 6) AS score
      FROM e, ex_q WHERE e.vec_id <> ex_q.query_id),
    ex5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, neighbor_id) AS r
        FROM ex_scored) t WHERE r <= 5),
    hits AS (
      SELECT i.nprobe, COUNT(*) AS n_hits
      FROM ivf5 i JOIN ex5 x
        ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
      GROUP BY i.nprobe),
    costs AS (
      SELECT nprobe, COUNT(*) AS n_candidates FROM cand GROUP BY nprobe)
    SELECT c.nprobe AS nprobe,
           ROUND(c.n_candidates / 10.0, 2) AS avg_candidates,
           ROUND(COALESCE(h.n_hits, 0) / 50.0, 4) AS recall_at_5
    FROM costs c LEFT JOIN hits h ON h.nprobe = c.nprobe
    ORDER BY nprobe
    """,
    doc="IVF nprobe tuning sweep — the recall-vs-cost trade table an ANN "
    "deployment reads before picking nprobe (the IVF twin of "
    "lsh_band_s_curve): for nprobe in {1,2,4,8}, average candidates "
    "scanned per query (the cost: probed-cell population) and recall@5 "
    "against the exact brute-force top-5. Every lane reuses the "
    "verified IVF kernels (deterministic coarse quantizer, bucket "
    "equi-join, rounded-score rerank); candidates grow ~linearly with "
    "nprobe while recall saturates — the knee is the operating point. "
    "At 100 TB each sweep lane scans (nprobe/n_cells) of the corpus "
    "through the same cell-keyed join the production index uses.",
)
def ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    assigned, centroids = S.ivf_assign(emb, 16)
    bc = spark.sparkContext.broadcast(centroids)

    @pandas_udf(ArrayType(IntegerType()))
    def probe8(vecs: pd.Series) -> pd.Series:
        c = bc.value
        m = np.array(vecs.tolist(), dtype="float64")
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ c.T), axis=1)[:, :8]
        return pd.Series([row.astype("int32").tolist() for row in order])

    probes = queries.select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(probe8(S._as_double(F.col("embedding")))).alias(
            "pr0", "cell"
        ),
    ).select("query_id", (F.col("pr0") + 1).alias("pr"), "cell")

    # ALL FOUR nprobe lanes derive from ONE scored candidate relation
    # (r13 optimization): a candidate probed at rank pr belongs to every
    # nprobe >= pr, its exact-rerank score does not depend on nprobe, and
    # argsort(-sims)[:, :p] is a prefix of argsort(-sims)[:, :8] — so the
    # per-lane cosine_topk_ivf pipelines (each re-collecting centroids and
    # re-scoring the same pairs: 13 Spark jobs) collapse to one candidate
    # count pass + one score-once/explode-levels/window plan (3 jobs),
    # value-identical per lane.
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround

    cand = (
        probes.join(
            assigned.select(
                F.col("vec_id").alias("neighbor_id"),
                "cell",
                S._as_double(F.col("embedding")).alias("neighbor_vec"),
            ),
            "cell",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    # per-pr candidate counts; n_cand(nprobe) is the prefix sum over pr
    pr_counts = {
        int(r["pr"]): int(r["n"])
        for r in cand.groupBy("pr").agg(F.count("*").alias("n")).collect()
    }
    # score each candidate pair once with the cosine_topk_ivf expression
    q = S._with_vec_norm(queries, "vec_id", "embedding", "query")
    scored = (
        cand.withColumn(
            "neighbor_nrm",
            F.sqrt(
                F.aggregate(
                    F.col("neighbor_vec"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
        )
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "score",
            dround(
                S._dot_pre(F.col("query_vec"), F.col("neighbor_vec"))
                / (F.col("query_nrm") * F.col("neighbor_nrm")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "score", "pr")
    )
    lanes = scored.select(
        "query_id",
        "neighbor_id",
        "score",
        F.explode(
            F.filter(
                F.array(F.lit(1), F.lit(2), F.lit(4), F.lit(8)),
                lambda lvl: lvl >= F.col("pr"),
            )
        ).alias("nprobe"),
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    hit_rows = (
        lanes.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .join(F.broadcast(exact), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("nprobe")
        .agg(F.count("*").alias("n_hits"))
        .collect()
    )
    hits = {int(r["nprobe"]): int(r["n_hits"]) for r in hit_rows}
    rows = []
    for nprobe in (1, 2, 4, 8):
        n_cand = sum(n for pr, n in pr_counts.items() if pr <= nprobe)
        rows.append(
            (
                nprobe,
                round(n_cand / 10.0, 2),
                round(hits.get(nprobe, 0) / 50.0, 4),
            )
        )
    return spark.createDataFrame(
        rows, "nprobe int, avg_candidates double, recall_at_5 double"
    )


def _dedup_token_savings_oracle() -> str:
    from kyuubi_spark.queries.pipeline import _MINHASH_PAIRS_CTE

    return f"""
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
    dropped AS (SELECT doc_id FROM comp WHERE doc_id <> component_id),
    toks AS (
      SELECT doc_id, source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE length(regexp_replace(trim(text), '\\s+', ' ', 'g'))
                     - length(replace(
                         regexp_replace(trim(text), '\\s+', ' ', 'g'),
                         ' ', '')) + 1 END AS n_tokens
      FROM documents)
    SELECT t.source AS source,
           CAST(SUM(t.n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN x.doc_id IS NOT NULL
                         THEN t.n_tokens ELSE 0 END) AS BIGINT)
             AS dropped_tokens,
           ROUND(SUM(CASE WHEN x.doc_id IS NOT NULL
                          THEN t.n_tokens ELSE 0 END) * 1.0
                 / SUM(t.n_tokens), 4) AS pct_saved
    FROM toks t LEFT JOIN dropped x ON t.doc_id = x.doc_id
    GROUP BY t.source ORDER BY source
    """


@query(
    "dedup_token_savings",
    oracle=_dedup_token_savings_oracle(),
    doc="The dedup MONEY metric: training tokens reclaimed per source by "
    "the near-dup pass — total whitespace tokens, tokens held by dropped "
    "(non-canonical) near-dup docs, and the saved fraction. Rides the "
    "verified MinHash-LSH -> connected-components -> survivor chain "
    "(dedup_survivors) with a token-weighted accounting join; the token "
    "arithmetic is the same codegen length expression as the fertility "
    "report. This is the number a data lead reads to justify the dedup "
    "compute: at 100 TB, pct_saved of the corpus never reaches the "
    "trainer.",
)
def dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_arrays_df(docs).localCheckpoint()
    cand = D.lsh_candidate_pairs(
        docs, n=3, num_hashes=16, bands=8, shingle_arrays=sh
    )
    pairs = D.jaccard_pairs(
        docs, cand, n=3, tau_num=1, tau_den=4, shingle_arrays=sh
    ).select("a_id", "b_id")
    comps = D.connected_components(pairs)
    dropped = comps.filter(F.col("doc_id") != F.col("component_id")).select(
        "doc_id", F.lit(1).alias("is_dropped")
    )
    t1 = F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")
    toks = docs.select(
        "doc_id",
        "source",
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(
            F.length(t1) - F.length(F.regexp_replace(t1, " ", "")) + 1
        )
        .alias("n_tokens"),
    )
    joined = toks.join(dropped, "doc_id", "left")
    return (
        joined.groupBy("source")
        .agg(
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum(
                F.when(F.col("is_dropped") == 1, F.col("n_tokens")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias("dropped_tokens"),
            dround(
                F.sum(
                    F.when(
                        F.col("is_dropped") == 1, F.col("n_tokens")
                    ).otherwise(0)
                )
                * 1.0
                / F.sum("n_tokens"),
                4,
            ).alias("pct_saved"),
        )
        .orderBy("source")
    )


@query(
    "curriculum_rarity_buckets",
    oracle="""
    WITH tok AS (
      SELECT DISTINCT doc_id,
             unnest(string_split(trim(text), ' ')) AS term
      FROM documents),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    idf AS (
      SELECT term,
             CAST(ROUND(ln(n.n_docs / COUNT(DISTINCT tok.doc_id)), 12)
                  AS DECIMAL(26,12)) AS idf
      FROM tok, n GROUP BY term, n.n_docs),
    r AS (
      SELECT tok.doc_id,
             ROUND(CAST(SUM(idf.idf) AS DOUBLE) / COUNT(*), 12) AS rarity
      FROM tok JOIN idf USING (term) GROUP BY tok.doc_id),
    b AS (SELECT MIN(rarity) AS mn, MAX(rarity) AS mx FROM r),
    bucketed AS (
      SELECT r.doc_id, r.rarity,
             CASE WHEN b.mx = b.mn THEN 0
                  ELSE least(3, CAST(floor(
                    4.0 * (r.rarity - b.mn) / (b.mx - b.mn)) AS INT))
             END AS bucket
      FROM r, b)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(rarity AS DECIMAL(26,12))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_rarity
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
    doc="Rarity-bucketed curriculum report — the ordering table a "
    "curriculum-training pipeline builds before scheduling data: each "
    "doc scored by the mean IDF of its DISTINCT tokens (rare-vocabulary "
    "docs score high), then bucketed into four corpus-range bins "
    "(min/max aggregate + map-side arithmetic, no corpus-wide window). "
    "IDF and per-doc means aggregate through rounded DECIMAL sums so "
    "the cross-engine bucket boundaries are bit-stable. Plan: one "
    "gram-keyed df aggregate, a broadcast N + idf join back on the "
    "term key, one per-doc aggregate, broadcast bounds, final 4-row "
    "group — every relation keyed and shuffle-balanced at 100 TB.",
)
def curriculum_rarity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("term"),
    ).distinct()
    n_docs = docs.count()  # broadcast scalar (bounded)
    idf = tok.groupBy("term").agg(
        dround(
            F.log(F.lit(float(n_docs)) / F.countDistinct("doc_id")), 12
        )
        .cast("decimal(26,12)")
        .alias("idf")
    )
    r = (
        tok.join(idf, "term")
        .groupBy("doc_id")
        .agg(
            dround(
                F.sum("idf").cast("double") / F.count("*"), 12
            ).alias("rarity")
        )
    )
    b = r.agg(F.min("rarity").alias("mn"), F.max("rarity").alias("mx"))
    bucketed = r.join(F.broadcast(b)).withColumn(
        "bucket",
        F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
            F.least(
                F.lit(3),
                F.floor(
                    4.0
                    * (F.col("rarity") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                ).cast("int"),
            )
        ),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            dround(
                F.sum(F.col("rarity").cast("decimal(26,12)")).cast("double")
                / F.count("*"),
                6,
            ).alias("avg_rarity"),
        )
        .orderBy("bucket")
    )
