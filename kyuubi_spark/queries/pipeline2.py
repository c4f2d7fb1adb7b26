"""Training-data pipeline operators, batch 2: C4-style line dedup, TF-IDF
term ranking, PII detection/redaction, EWMA smoothing, time-series gap
filling, winsorized robust statistics.

These extend the reference's query surface with the text/curation operators
a 100 TB LLM-data pipeline needs (charter: beyond-reference operators are
first-class). Reference parity anchors: the dedup family mirrors the
corpus-cleaning stages the reference's docs describe for training-data ETL
(docs/extensions/engines/spark/z-order.md motivates file-level clustering
for exactly these scans); everything else follows the same Spark-first
rules as pipeline.py — declarative plans, integer-exact cross-engine math
(cents / md5 / fixed-point), DuckDB-replayable oracles.

Cross-engine determinism (same rules as pipeline.py):
- money/metric sums run over ``CAST(ROUND(x*100) AS BIGINT)`` cents;
- every float output is a single double division of integer (or decimal)
  sums, rounded identically via dround <-> ROUND;
- rankings order by already-rounded scores plus a unique tiebreak;
- text equality/fingerprints go through md5.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table


# --------------------------------------------------------------------------
# C4-style line-level dedup: drop any 8-token chunk that appears >= 2 times
# anywhere in the corpus, rebuild each doc from its surviving chunks.
# --------------------------------------------------------------------------
@query(
    "text_line_dedup",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
    ch AS (
      SELECT doc_id, u.j,
             array_to_string(toks[u.j*8+1 : u.j*8+8], ' ') AS chunk
      FROM t, unnest(generate_series(
             0, CAST(ceil(len(toks) / 8.0) AS BIGINT) - 1)) AS u(j)),
    cnt AS (SELECT chunk, COUNT(*) AS c FROM ch GROUP BY chunk),
    kept AS (
      SELECT ch.doc_id, COUNT(*) AS n_kept,
             md5(string_agg(ch.chunk, ' ' ORDER BY ch.j)) AS clean_md5
      FROM ch JOIN cnt USING (chunk) WHERE cnt.c < 2 GROUP BY ch.doc_id),
    tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM ch GROUP BY doc_id)
    SELECT tot.doc_id AS doc_id, tot.n_chunks AS n_chunks,
           tot.n_chunks - COALESCE(kept.n_kept, 0) AS n_dropped,
           COALESCE(kept.clean_md5, md5('')) AS clean_md5
    FROM tot LEFT JOIN kept USING (doc_id)
    WHERE tot.n_chunks - COALESCE(kept.n_kept, 0) > 0
    ORDER BY doc_id
    """,
    doc="C4-style line-level corpus dedup: every 8-token chunk occurring "
    ">= 2 times anywhere in the corpus is dropped from every document "
    "(boilerplate removal), docs rebuilt from surviving chunks in order. "
    "Plan: one explode to (doc, pos, chunk), one chunk-keyed count "
    "shuffle (map-side combined), one join back, one per-doc re-agg — "
    "all linear; the chunk key space is uniform so no skew. Rebuilt "
    "text is md5-fingerprinted so the verified value is the exact "
    "string without hashing megabytes through the driver.",
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.trim(F.col("text")), " ").alias("toks"))
    nch = F.ceil(F.size("toks") / F.lit(8.0)).cast("long")
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), (nch - 1).cast("int")),
                lambda j: F.concat_ws(" ", F.slice("toks", j * 8 + 1, 8)),
            )
        ).alias("j", "chunk"),
    )
    cnt = chunks.groupBy("chunk").agg(F.count("*").alias("c"))
    kept = (
        chunks.join(cnt, "chunk")
        .filter(F.col("c") < 2)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("j", "chunk"))
                        ),
                        lambda s: s["chunk"],
                    ),
                    " ",
                ).cast("binary")
            ).alias("clean_md5"),
        )
    )
    tot = chunks.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    return (
        tot.join(kept, "doc_id", "left_outer")
        .select(
            "doc_id",
            "n_chunks",
            (F.col("n_chunks") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_dropped"
            ),
            F.coalesce(
                F.col("clean_md5"), F.md5(F.lit("").cast("binary"))
            ).alias("clean_md5"),
        )
        .filter(F.col("n_dropped") > 0)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# TF-IDF top terms per document (log-free inverse-df weight so the score is
# one double multiply/divide of integers — no transcendental parity risk).
# --------------------------------------------------------------------------
@query(
    "text_tfidf_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROUND(CAST(tf.tf AS DOUBLE) * n.n_docs / df.df, 6) AS score
      FROM tf JOIN df USING (term), n),
    ranked AS (
      SELECT doc_id, term, tf, df, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term) AS BIGINT) AS rnk
      FROM scored)
    SELECT doc_id, term, tf, df, score, rnk
    FROM ranked WHERE rnk <= 3 AND doc_id < 300
    ORDER BY doc_id, rnk
    """,
    doc="TF-IDF-style term salience: tf * N/df (inverse document "
    "frequency without the log, so the score is a single double op over "
    "integer counts — bit-identical across engines), top-3 terms per "
    "doc. Plan: one token explode, one (doc,term) count, term-keyed df "
    "aggregate joined back (broadcast: vocabulary << corpus), "
    "per-doc top-k window. Ranking orders by the ROUNDED score plus the "
    "term as total tiebreak.",
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            dround(
                F.col("tf").cast("double") * F.col("n_docs") / F.col("df"), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 300))
        .select("doc_id", "term", "tf", "df", "score", "rnk")
        .orderBy("doc_id", "rnk")
    )


# --------------------------------------------------------------------------
# PII detection + redaction over a deterministically PII-enriched corpus.
# --------------------------------------------------------------------------
_RE_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_RE_PHONE = r"555-[0-9]{4}"
_RE_IP = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


@query(
    "pii_detect_redact",
    oracle=f"""
    WITH enriched AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@'
                     || source || '.example.com' ELSE '' END
             || CASE WHEN doc_id % 2 = 0
                THEN ' tel 555-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
                     || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END
               AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_RE_EMAIL}', 0)) AS BIGINT)
             AS n_email,
           CAST(len(regexp_extract_all(t, '{_RE_PHONE}', 0)) AS BIGINT)
             AS n_phone,
           CAST(len(regexp_extract_all(t, '{_RE_IP}', 0)) AS BIGINT) AS n_ip,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_RE_EMAIL}', '<EMAIL>', 'g'),
               '{_RE_IP}', '<IP>', 'g'),
               '{_RE_PHONE}', '<PHONE>', 'g')) AS red_md5
    FROM enriched
    WHERE doc_id < 500
    ORDER BY doc_id
    """,
    doc="PII scrubbing stage: detect + redact emails / phone numbers / "
    "IPv4 addresses with anchored character-class regexes (identical "
    "semantics in Java regex and RE2, asserted by the value-exact "
    "oracle). The corpus is deterministically PII-enriched from its own "
    "keys so both engines see identical inputs. Map-only — counts via "
    "regexp_extract_all, redaction via chained regexp_replace, result "
    "fingerprinted with md5. At 100 TB this is the cheapest kind of "
    "operator: pure codegen'd projection, no shuffle.",
)
def pii_detect_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    t = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@"),
                F.col("source"),
                F.lit(".example.com"),
            ),
        ).otherwise(""),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit(" tel 555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" from 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                ((did * 7) % 256).cast("string"),
            ),
        ).otherwise(""),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, _RE_EMAIL, "<EMAIL>"), _RE_IP, "<IP>"
        ),
        _RE_PHONE,
        "<PHONE>",
    )
    return (
        docs.filter(did < 500)
        .select(
            "doc_id",
            F.size(F.regexp_extract_all(t, F.lit(_RE_EMAIL), 0))
            .cast("long")
            .alias("n_email"),
            F.size(F.regexp_extract_all(t, F.lit(_RE_PHONE), 0))
            .cast("long")
            .alias("n_phone"),
            F.size(F.regexp_extract_all(t, F.lit(_RE_IP), 0))
            .cast("long")
            .alias("n_ip"),
            F.md5(red.cast("binary")).alias("red_md5"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# EWMA smoothing (truncated depth-8, alpha = 1/2) per user event series.
# --------------------------------------------------------------------------
@query(
    "ewma_user_value",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS c,
             ROW_NUMBER() OVER w AS rn,
             LAG(CAST(ROUND(value * 100) AS BIGINT), 1) OVER w AS c1,
             LAG(CAST(ROUND(value * 100) AS BIGINT), 2) OVER w AS c2,
             LAG(CAST(ROUND(value * 100) AS BIGINT), 3) OVER w AS c3,
             LAG(CAST(ROUND(value * 100) AS BIGINT), 4) OVER w AS c4,
             LAG(CAST(ROUND(value * 100) AS BIGINT), 5) OVER w AS c5,
             LAG(CAST(ROUND(value * 100) AS BIGINT), 6) OVER w AS c6,
             LAG(CAST(ROUND(value * 100) AS BIGINT), 7) OVER w AS c7
      FROM events
      WHERE user_id < 100
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id,
           ROUND(CAST(
             c * 128 + COALESCE(c1, 0) * 64 + COALESCE(c2, 0) * 32
             + COALESCE(c3, 0) * 16 + COALESCE(c4, 0) * 8
             + COALESCE(c5, 0) * 4 + COALESCE(c6, 0) * 2 + COALESCE(c7, 0)
             AS DOUBLE) / (
             128 + CASE WHEN c1 IS NULL THEN 0 ELSE 64 END
             + CASE WHEN c2 IS NULL THEN 0 ELSE 32 END
             + CASE WHEN c3 IS NULL THEN 0 ELSE 16 END
             + CASE WHEN c4 IS NULL THEN 0 ELSE 8 END
             + CASE WHEN c5 IS NULL THEN 0 ELSE 4 END
             + CASE WHEN c6 IS NULL THEN 0 ELSE 2 END
             + CASE WHEN c7 IS NULL THEN 0 ELSE 1 END) / 100, 6) AS ewma
    FROM x
    ORDER BY user_id, event_id
    """,
    doc="Per-user EWMA smoothing of the event value series (alpha = 1/2, "
    "truncated at depth 8 so the recursion becomes a fixed window): "
    "weights 128,64,...,1 over integer cents make numerator and "
    "denominator exact integers — one rounded double division per row, "
    "bit-identical across engines. Plan: one user-keyed window sort, "
    "8 LAGs, map-only arithmetic — the partition key is user_id so "
    "parallelism scales with users, not time.",
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = F.round(F.col("value") * 100).cast("long")
    df = events.filter(F.col("user_id") < 100).select(
        "user_id",
        "event_id",
        c.alias("c"),
        *[F.lag(c, i).over(w).alias(f"c{i}") for i in range(1, 8)],
    )
    num = F.col("c") * 128
    den = F.lit(128)
    for i, wgt in zip(range(1, 8), (64, 32, 16, 8, 4, 2, 1)):
        num = num + F.coalesce(F.col(f"c{i}"), F.lit(0)) * wgt
        den = den + F.when(F.col(f"c{i}").isNull(), 0).otherwise(wgt)
    return df.select(
        "user_id",
        "event_id",
        dround(num.cast("double") / den / 100, 6).alias("ewma"),
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# Time-series gap filling: dense hourly spine + forward fill (LOCF).
# --------------------------------------------------------------------------
@query(
    "ts_gap_fill",
    oracle="""
    WITH hours AS (
      SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
               TIMESTAMP '2024-01-07 23:00:00', INTERVAL 1 HOUR)) AS bucket),
    types AS (SELECT DISTINCT event_type FROM events),
    b AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events
      WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
      GROUP BY 1, 2),
    f AS (
      SELECT t.event_type, h.bucket, b.cents,
             b.cents IS NULL AS is_gap,
             COALESCE(b.cents, LAST_VALUE(b.cents IGNORE NULLS) OVER (
               PARTITION BY t.event_type ORDER BY h.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS filled
      FROM types t CROSS JOIN hours h
      LEFT JOIN b ON b.event_type = t.event_type AND b.bucket = h.bucket)
    SELECT event_type, bucket, is_gap,
           ROUND(CAST(filled AS DOUBLE) / 100, 2) AS value
    FROM f
    ORDER BY event_type, bucket
    """,
    doc="Hypertable-style gap filling: dense hourly spine (generated, not "
    "scanned) per event type, LEFT JOIN of the hourly rollup, "
    "forward-fill (last-observation-carried-forward) via "
    "last_value(IGNORE NULLS) over the preceding frame, gaps flagged. "
    "Hourly sums are integer cents. At scale the spine is tiny "
    "(types x hours) and broadcast; the only data shuffle is the "
    "rollup's group-by.",
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    b = (
        events.filter(F.col("ts") < "2024-01-08")
        .groupBy(
            "event_type",
            F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("bucket"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    )
    spine = (
        events.select("event_type")
        .distinct()
        .crossJoin(
            events.sparkSession.range(1).select(
                F.explode(
                    F.expr(
                        "sequence(timestamp_ntz'2024-01-01 00:00:00', "
                        "timestamp_ntz'2024-01-07 23:00:00', "
                        "interval 1 hour)"
                    )
                ).alias("bucket")
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    filled = (
        spine.join(b, ["event_type", "bucket"], "left_outer")
        .withColumn("is_gap", F.col("cents").isNull())
        .withColumn(
            "filled",
            F.coalesce(
                F.col("cents"), F.last("cents", ignorenulls=True).over(w)
            ),
        )
    )
    return filled.select(
        "event_type",
        "bucket",
        "is_gap",
        dround(F.col("filled").cast("double") / 100, 2).alias("value"),
    ).orderBy("event_type", "bucket")


# --------------------------------------------------------------------------
# Winsorized robust statistics per event type.
# --------------------------------------------------------------------------
@query(
    "winsorize_stats",
    oracle="""
    WITH p AS (
      SELECT event_type,
             ROUND(CAST(quantile_cont(value, 0.05) AS DOUBLE), 4) AS lo,
             ROUND(CAST(quantile_cont(value, 0.95) AS DOUBLE), 4) AS hi
      FROM events GROUP BY event_type),
    wz AS (
      SELECT e.event_type, p.lo, p.hi,
             CASE WHEN e.value < p.lo THEN 1 ELSE 0 END AS clamped_lo,
             CASE WHEN e.value > p.hi THEN 1 ELSE 0 END AS clamped_hi,
             CAST(ROUND(
               CASE WHEN e.value < p.lo THEN p.lo
                    WHEN e.value > p.hi THEN p.hi
                    ELSE e.value END * 100) AS BIGINT) AS wc
      FROM events e JOIN p USING (event_type))
    SELECT event_type, lo, hi,
           CAST(SUM(clamped_lo) AS BIGINT) AS n_lo,
           CAST(SUM(clamped_hi) AS BIGINT) AS n_hi,
           ROUND(CAST(SUM(wc) AS DOUBLE) / COUNT(*) / 100, 6) AS wins_mean
    FROM wz
    GROUP BY event_type, lo, hi
    ORDER BY event_type
    """,
    doc="Winsorized robust scaling per event type: 5th/95th continuous "
    "percentiles (rounded to 4 decimals so the clamp bounds are "
    "identical doubles on both engines), values clamped into [lo, hi], "
    "clamp counts + winsorized mean over integer cents. Two passes over "
    "the fact (percentile pass + clamp pass) with the tiny percentile "
    "relation broadcast back — the standard shape when the exact "
    "percentile cannot be folded into one aggregation.",
)
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    p = events.groupBy("event_type").agg(
        dround(F.percentile("value", 0.05), 4).alias("lo"),
        dround(F.percentile("value", 0.95), 4).alias("hi"),
    )
    v = F.col("value")
    wz = events.join(F.broadcast(p), "event_type").select(
        "event_type",
        "lo",
        "hi",
        F.when(v < F.col("lo"), 1).otherwise(0).alias("clamped_lo"),
        F.when(v > F.col("hi"), 1).otherwise(0).alias("clamped_hi"),
        F.round(
            F.when(v < F.col("lo"), F.col("lo"))
            .when(v > F.col("hi"), F.col("hi"))
            .otherwise(v)
            * 100
        )
        .cast("long")
        .alias("wc"),
    )
    return (
        wz.groupBy("event_type", "lo", "hi")
        .agg(
            F.sum("clamped_lo").cast("long").alias("n_lo"),
            F.sum("clamped_hi").cast("long").alias("n_hi"),
            dround(
                F.sum("wc").cast("double") / F.count("*") / 100, 6
            ).alias("wins_mean"),
        )
        .orderBy("event_type")
        .select("event_type", "lo", "hi", "n_lo", "n_hi", "wins_mean")
    )


# --------------------------------------------------------------------------
# K-means (Lloyd) — 2 exact iterations, value-exact SQL-replayable oracle.
# --------------------------------------------------------------------------
def _kmeans_assign_udf(spark, cents: "list[tuple[int, list[float]]]"):
    """argmin-L2 assignment against a broadcast centroid list.

    Distances are SEQUENTIAL-ORDER sums of (x_i - c_i)^2 (cumsum's last
    column), bit-identical to DuckDB's list_sum fold, so the argmin —
    ties to the lowest cluster id, matching ROW_NUMBER() ORDER BY d, cl —
    is engine-independent.
    """
    from pyspark.sql.functions import pandas_udf

    ids = [c[0] for c in cents]
    mats = [np.asarray(c[1], dtype="float64") for c in cents]
    bc = spark.sparkContext.broadcast((ids, mats))

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        cl_ids, cl_vecs = bc.value
        m = np.array(vecs.tolist(), dtype="float64")
        dists = np.stack(
            [
                ((m - cv[None, :]) ** 2).cumsum(axis=1)[:, -1]
                for cv in cl_vecs
            ],
            axis=1,
        )
        # np.argmin takes the FIRST minimum -> lowest cluster id on ties
        idx = np.argmin(dists, axis=1)
        return pd.Series(np.asarray(cl_ids, dtype="int64")[idx].astype("int32"))

    return assign


def _kmeans_centroids(a: DataFrame) -> DataFrame:
    """Exact Lloyd update: per-(cluster, dim) DECIMAL(28,12) sums (order-
    independent) divided once and rounded to 9 decimals — the rounded
    doubles ARE the next iteration's centroids on both engines."""
    ex = a.select(
        "cl", F.posexplode("embedding").alias("dim", "xf")
    ).select(
        "cl", "dim", F.col("xf").cast("double").cast("decimal(28,12)").alias("x")
    )
    return (
        ex.groupBy("cl", "dim")
        .agg(
            dround(
                F.sum("x").cast("double") / F.count("*"), 9
            ).alias("c")
        )
    )


@query(
    "kmeans_lloyd",
    oracle="""
    WITH e AS (SELECT vec_id, embedding FROM embeddings),
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
        FROM d2) t WHERE r = 1)
    SELECT a2.cl AS cluster, COUNT(*) AS n,
           MAX(c1.c[1]) AS cd0, MAX(c1.c[2]) AS cd1
    FROM a2 JOIN c1 USING (cl)
    GROUP BY a2.cl
    ORDER BY cluster
    """,
    doc="K-means via two exact Lloyd iterations (k=8, d=64): "
    "deterministic init (vectors 0..7), argmin-L2 assignment as an "
    "Arrow-batched numpy pass with sequential-order distance sums, "
    "centroid update as per-(cluster,dim) DECIMAL(28,12) sums — "
    "order-independent, so the rounded next centroids are bit-identical "
    "across engines and the WHOLE iterative algorithm is value-exact "
    "SQL-replayable (most engines settle for rows-only checks on "
    "iterative ops). Scale: assignment is map-only (centroids "
    "broadcast); each update shuffles k x d cells regardless of row "
    "count; driver holds only the k x d centroid matrix per round.",
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    init = (
        emb.filter(F.col("vec_id") < 8)
        .orderBy("vec_id")
        .collect()
    )
    cents0 = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in init]

    a1 = emb.withColumn(
        "cl", _kmeans_assign_udf(spark, cents0)(F.col("embedding"))
    )
    c1_rows = (
        _kmeans_centroids(a1).orderBy("cl", "dim").collect()
    )
    by_cl: dict[int, list[float]] = {}
    for r in c1_rows:
        by_cl.setdefault(int(r["cl"]), []).append(float(r["c"]))
    cents1 = sorted(by_cl.items())

    a2 = emb.withColumn(
        "cl", _kmeans_assign_udf(spark, cents1)(F.col("embedding"))
    )
    cdims = spark.createDataFrame(
        [(cl, c[0], c[1]) for cl, c in cents1], "cl int, cd0 double, cd1 double"
    )
    return (
        a2.groupBy("cl")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(cdims), "cl")
        .select(F.col("cl").alias("cluster"), "n", "cd0", "cd1")
        .orderBy("cluster")
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric distance computation (ADC) ANN.
# --------------------------------------------------------------------------
@query(
    "pq_adc_topk",
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
    codes AS (
      SELECT vec_id, s, k AS code FROM (
        SELECT vec_id, s, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, k) AS r
        FROM enc_d) t WHERE r = 1),
    lut AS (
      SELECT vec_id AS query_id, s, k AS code,
             CAST(ROUND(d * 1000000000) AS BIGINT) AS d_int
      FROM enc_d WHERE vec_id < 10),
    scored AS (
      SELECT l.query_id, cd.vec_id AS neighbor_id, SUM(l.d_int) AS adc
      FROM codes cd JOIN lut l ON l.s = cd.s AND l.code = cd.code
      WHERE cd.vec_id <> l.query_id
      GROUP BY 1, 2),
    ranked AS (
      SELECT query_id, neighbor_id,
             ROUND(CAST(adc AS DOUBLE) / 1000000000, 6) AS adc_dist,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY adc, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
    SELECT query_id, neighbor_id, adc_dist, rnk
    FROM ranked WHERE rnk <= 5
    ORDER BY query_id, rnk
    """,
    doc="Product-quantization ANN with asymmetric distance computation "
    "(the FAISS IndexPQ workhorse): 64 dims split into 8 subspaces, each "
    "subvector encoded as the nearest of 16 deterministic codewords "
    "(vectors 0..15, so the codebook is SQL-replayable), queries score "
    "candidates by summing per-subspace lookup-table distances. LUT "
    "entries are quantized to integer nano-units so the 8-way ADC sum "
    "is order-independent and bit-identical across engines — the whole "
    "approximate index gets a full value hash check. Scale: encoding is "
    "one Arrow-batched numpy pass (map-only, 8 bytes/vector output); "
    "scoring joins the exploded code column against a 1280-row "
    "broadcast LUT; memory per vector is 16x smaller than the raw "
    "embedding, which is the point of PQ at 100 TB.",
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from kyuubi_spark.functions.similarity import _round_half_away

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n_sub, sub_dim, n_codes = 8, 8, 16

    cb_rows = emb.filter(F.col("vec_id") < n_codes).orderBy("vec_id").collect()
    # codebook[k][s] = codeword subvector (float64), identical to DuckDB's
    # CAST(embedding[i] AS DOUBLE) widening
    codebook = np.array(
        [[float(x) for x in r["embedding"]] for r in cb_rows], dtype="float64"
    ).reshape(n_codes, n_sub, sub_dim)
    bc = spark.sparkContext.broadcast(codebook)

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        cb = bc.value  # (K, S, D)
        m = np.array(vecs.tolist(), dtype="float64").reshape(
            -1, n_sub, sub_dim
        )  # (N, S, D)
        out = []
        for row in m:
            codes = []
            for s in range(n_sub):
                # sequential-order (cumsum) sums match list_sum's left fold
                d = ((row[s][None, :] - cb[:, s, :]) ** 2).cumsum(axis=1)[:, -1]
                codes.append(int(np.argmin(d)))  # first min = lowest k
            out.append(codes)
        return pd.Series(out)

    codes = emb.select(
        "vec_id", F.posexplode(encode(F.col("embedding"))).alias("s", "code")
    )

    q_rows = emb.filter(F.col("vec_id") < 10).orderBy("vec_id").collect()
    lut_rows = []
    for r in q_rows:
        qv = np.array([float(x) for x in r["embedding"]], dtype="float64").reshape(
            n_sub, sub_dim
        )
        for s in range(n_sub):
            d = ((qv[s][None, :] - codebook[:, s, :]) ** 2).cumsum(axis=1)[:, -1]
            di = _round_half_away(d * 1e9).astype("int64")
            for k in range(n_codes):
                lut_rows.append((int(r["vec_id"]), s, k, int(di[k])))
    lut = spark.createDataFrame(
        lut_rows, "query_id long, s int, code int, d_int long"
    )

    scored = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("d_int").alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            dround(F.col("adc").cast("double") / 1e9, 6).alias("adc_dist"),
            "rnk",
        )
        .orderBy("query_id", "rnk")
    )


# --------------------------------------------------------------------------
# Histogram-sketch quantiles: mergeable fixed-bin histogram estimator.
# --------------------------------------------------------------------------
@query(
    "approx_quantile_hist",
    oracle="""
    WITH b AS (
      SELECT event_type,
             CAST(least(floor(value / 5), 99) AS BIGINT) AS bin,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    c AS (
      SELECT event_type, bin, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) - cnt
               AS before,
             SUM(cnt) OVER (PARTITION BY event_type) AS total
      FROM b)
    SELECT event_type, CAST(MAX(total) AS BIGINT) AS n,
           ROUND(MIN(CASE WHEN cum >= 0.5 * total AND before < 0.5 * total
             THEN bin * 5 + (0.5 * total - before) / cnt * 5 END), 4) AS p50_est,
           ROUND(MIN(CASE WHEN cum >= 0.95 * total AND before < 0.95 * total
             THEN bin * 5 + (0.95 * total - before) / cnt * 5 END), 4) AS p95_est,
           ROUND(MIN(CASE WHEN cum >= 0.99 * total AND before < 0.99 * total
             THEN bin * 5 + (0.99 * total - before) / cnt * 5 END), 4) AS p99_est
    FROM c GROUP BY event_type ORDER BY event_type
    """,
    doc="Histogram-sketch quantiles (the mergeable alternative to exact "
    "percentile): 100 fixed-width bins per group, quantile estimated by "
    "linear interpolation inside the covering bin. Unlike "
    "percentile_approx's engine-specific digest, the fixed-bin sketch "
    "is deterministic — bin counts are integers and the estimate is one "
    "arithmetic expression over them, so the APPROXIMATE answer itself "
    "is value-hash verified. At scale: bins merge map-side "
    "(100 ints/group shuffled regardless of row count) — this is the "
    "estimator you actually want at 100 TB where exact percentile "
    "shuffles every value.",
)
def approx_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    b = events.groupBy(
        "event_type",
        F.least(F.floor(F.col("value") / 5), F.lit(99))
        .cast("long")
        .alias("bin"),
    ).agg(F.count("*").alias("cnt"))
    wc = Window.partitionBy("event_type").orderBy("bin")
    wt = Window.partitionBy("event_type")
    c = (
        b.withColumn("cum", F.sum("cnt").over(wc))
        .withColumn("before", F.col("cum") - F.col("cnt"))
        .withColumn("total", F.sum("cnt").over(wt))
    )

    def est(q: float):
        t = F.lit(q) * F.col("total")
        return dround(
            F.min(
                F.when(
                    (F.col("cum") >= t) & (F.col("before") < t),
                    F.col("bin") * 5
                    + (t - F.col("before")) / F.col("cnt") * 5,
                )
            ),
            4,
        )

    return (
        c.groupBy("event_type")
        .agg(
            F.max("total").alias("n"),
            est(0.5).alias("p50_est"),
            est(0.95).alias("p95_est"),
            est(0.99).alias("p99_est"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# PageRank (3 fixed-point iterations) over the nation trade graph.
# --------------------------------------------------------------------------
_PR_UNIT = 10**12
_PR_EDGES_CTE = """
    edges AS (
      SELECT nc.n_name AS src, ns.n_name AS dst, COUNT(*) AS w
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      GROUP BY 1, 2),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src)"""


def _pr_iter_sql(prev: str, cur: str) -> str:
    """One fixed-point PageRank step in integer units (floor divisions make
    every intermediate a BIGINT — order-independent and engine-exact)."""
    return f"""
    {cur} AS (
      SELECT n2.node,
             (15 * {_PR_UNIT}) // (100 * nn.n)
             + 85 * COALESCE(t.contrib, 0) // 100 AS pr
      FROM nodes n2 CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node, SUM(p.pr * e.w // o.ow) AS contrib
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        JOIN outw o ON o.src = e.src
        GROUP BY e.dst) t ON t.node = n2.node)"""


@query(
    "pagerank_nations",
    oracle=f"""
    WITH {_PR_EDGES_CTE},
    pr0 AS (SELECT node, {_PR_UNIT} // nn.n AS pr FROM nodes CROSS JOIN nn),
    {_pr_iter_sql("pr0", "pr1")},
    {_pr_iter_sql("pr1", "pr2")},
    {_pr_iter_sql("pr2", "pr3")}
    SELECT node, ROUND(CAST(pr AS DOUBLE) / {_PR_UNIT}, 9) AS pagerank
    FROM pr3 ORDER BY pagerank DESC, node
    """,
    doc="PageRank (damping 0.85, 3 iterations) over the weighted "
    "customer-nation -> supplier-nation trade graph, in FIXED-POINT "
    "integer arithmetic: ranks live in 1e12 units, every transfer is "
    "pr*w // outw and the damped update is integer too, so each "
    "iteration is a BIGINT sum — order-independent, replayable as "
    "unrolled SQL CTEs, and the iterative result gets a full value "
    "hash. Spark side is the distributed loop shape (per iteration: "
    "one edge-keyed broadcast join + one dst-keyed aggregate); node "
    "count here is small but the plan is the one that scales.",
)
def pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem, orders, customer, supplier, nation = _ts = [
        load_table(spark, sf_dir, t)
        for t in ("lineitem", "orders", "customer", "supplier", "nation")
    ]
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("src")
    )
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("dst")
    )
    edges = (
        lineitem.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nc), F.col("nc_key") == F.col("c_nationkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
        .localCheckpoint()  # the edge relation feeds every iteration
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    pr = nodes.select("node", F.lit(_PR_UNIT // n).alias("pr"))
    base = F.lit(15 * _PR_UNIT // (100 * n))
    for _ in range(3):
        # rank + out-weight relations are one row per node — broadcast
        # them against the (potentially huge) edge relation so each
        # iteration is map-side join + one dst-keyed aggregate
        contrib = (
            edges.join(F.broadcast(outw), "src")
            .join(F.broadcast(pr.withColumnRenamed("node", "src")), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("pr * w div ow").alias("t"),
            )
            .groupBy("node")
            .agg(F.sum("t").alias("contrib"))
        )
        pr = nodes.join(F.broadcast(contrib), "node", "left_outer").select(
            "node",
            (
                base
                + F.expr("85 * coalesce(contrib, 0) div 100")
            ).alias("pr"),
        )
    return pr.select(
        "node",
        dround(F.col("pr").cast("double") / _PR_UNIT, 9).alias("pagerank"),
    ).orderBy(F.col("pagerank").desc(), "node")


# --------------------------------------------------------------------------
# Feature-hashing text vectorizer (the hashing trick): text -> signed
# integer component vector, linking the text and vector pipelines.
# --------------------------------------------------------------------------
_HASH_DIMS = 8


@query(
    "text_hash_embed",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t
      FROM documents WHERE doc_id < 400),
    h AS (
      SELECT doc_id,
             ('0x' || substring(md5(t), 1, 8))::BIGINT % {_HASH_DIMS} AS dim,
             CASE WHEN ('0x' || substring(md5(t), 9, 1))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM tok)
    SELECT doc_id,
           {", ".join(
               f"CAST(COALESCE(SUM(CASE WHEN dim = {d} THEN sgn END), 0)"
               f" AS BIGINT) AS d{d}"
               for d in range(_HASH_DIMS))},
           CAST(SUM(1) AS BIGINT) AS n_tokens
    FROM h GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Feature-hashing vectorizer (hashing trick, Weinberger et al.): "
    "each token md5-hashes to a dimension and a sign, components are "
    "signed integer counts — the cheapest text->vector featurizer and "
    "exactly what you reach for before training a fastText-style "
    "classifier at 100 TB. Map-only explode + one doc-keyed aggregate "
    "of 8 conditional integer sums (map-side combined); md5 on both "
    "engines makes every component value-hash verified.",
)
def text_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.filter(F.col("doc_id") < 400).select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " ")).alias("t")
    )
    hx = F.md5(F.col("t").cast("binary"))
    dim = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long") % _HASH_DIMS
    sgn = F.when(
        F.conv(F.substring(hx, 9, 1), 16, 10).cast("long") % 2 == 0, 1
    ).otherwise(-1)
    h = tok.select("doc_id", dim.alias("dim"), sgn.alias("sgn"))
    return (
        h.groupBy("doc_id")
        .agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("dim") == d, F.col("sgn"))), F.lit(0)
                ).alias(f"d{d}")
                for d in range(_HASH_DIMS)
            ],
            F.count("*").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )
