"""Training-data pipeline operators, batch 4 — shard orchestration and
exact repeated-text signals.

Continues pipeline.py/pipeline2.py/pipeline3.py (BASELINE.json north
star: the operations a 100 TB pretraining pipeline needs beyond the
reference's SQL surface; reference hook is the data-agent engine's
pipeline charter, externals/kyuubi-data-agent-engine).  House rules as
before: every surfaced aggregate is value-exact cross-engine (integer
sums, one rounded double division), and every operator documents its
100 TB shuffle profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table

_N_SHARDS = 64
_SHARD_SALT = "shard-v1"


@query(
    "corpus_shard_shuffle",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, n_chars,
             ('0x' || substring(md5('{_SHARD_SALT}' || CAST(doc_id AS VARCHAR)),
                               1, 8))::BIGINT % {_N_SHARDS} AS shard
      FROM documents)
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM assigned GROUP BY shard ORDER BY shard
    """,
    doc="Deterministic training-shard assignment (the 'global shuffle' "
    "step before writing a pretraining corpus): shard = md5(salt || "
    "doc_id) mod N, then per-shard doc/char totals to verify balance. "
    "At 100 TB this is THE way to shuffle a corpus: the assignment is "
    "a map-only expression (no payload shuffle, no RNG state), writers "
    "partitionBy(shard) once, and re-runs are idempotent because the "
    "hash is salted + keyed, not sampled. The only exchange here is "
    "the bounded per-shard aggregate (N rows). Changing the salt "
    "re-deals every epoch deterministically.",
)
def corpus_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(_SHARD_SALT), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _N_SHARDS
    )
    return (
        docs.select(shard.alias("shard"), "doc_id", "n_chars")
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("shard")
    )


_GRAM_N = 5


@query(
    "repeated_ngram_coverage",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, g
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     generate_series(1, greatest(len(w) - {_GRAM_N - 1}, 0)),
                     i -> array_to_string(w[i:i + {_GRAM_N - 1}], ' '))) AS g
            FROM words) x),
    df AS (
      SELECT g, COUNT(*) AS docs_with FROM grams GROUP BY g)
    SELECT grams.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS dup_grams,
           ROUND(CAST(SUM(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS dup_fraction
    FROM grams JOIN df ON grams.g = df.g
    GROUP BY grams.doc_id
    HAVING SUM(CASE WHEN docs_with >= 2 THEN 1 ELSE 0 END) > 0
    ORDER BY doc_id
    """,
    doc="Exact repeated-substring signal (the per-document scoring half "
    "of Lee et al. 2022's 'Deduplicating Training Data Makes Language "
    "Models Better'): for every doc, the fraction of its DISTINCT "
    "word 5-grams that also appear in at least one other document. "
    "High-fraction docs are boilerplate/templates and get dropped or "
    "down-weighted before training. Shuffle profile at 100 TB: one "
    "explode to the gram stream (map-only), one gram-keyed aggregate "
    "for document frequency (map-side combined — the gram space, not "
    "the corpus, bounds the shuffle), one equi-join back on gram, one "
    "doc-keyed count. No pairwise comparison anywhere — unlike a "
    "naive suffix match this never goes quadratic.",
)
def repeated_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    # Guard short docs: sequence(1, 0) in Spark steps DOWNWARD ([1, 0]),
    # so an unguarded transform would call slice(w, 0, 5) and throw
    # INVALID_PARAMETER_VALUE.START on any doc with < _GRAM_N words.
    # DuckDB's generate_series(1, 0) is already empty, so the guarded
    # empty-array branch keeps both engines consistent.
    grams_expr = F.expr(
        f"CASE WHEN size(w) >= {_GRAM_N} THEN"
        f" transform(sequence(1, size(w) - {_GRAM_N - 1}),"
        f" i -> concat_ws(' ', slice(w, i, {_GRAM_N})))"
        f" ELSE array() END"
    )
    grams = (
        docs.select("doc_id", w.alias("w"))
        .select("doc_id", F.explode(grams_expr).alias("g"))
        .distinct()
    )
    gram_df = grams.groupBy("g").agg(F.count("*").alias("docs_with"))
    dup = F.sum(F.when(F.col("docs_with") >= 2, 1).otherwise(0))
    return (
        grams.join(gram_df, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            dup.alias("dup_grams"),
            F.round(
                dup.cast("double") / F.count("*"), 6
            ).alias("dup_fraction"),
        )
        .filter(F.col("dup_grams") > 0)
        .orderBy("doc_id")
    )


_CTX_WINDOW = 512


@query(
    "packing_efficiency_report",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             len(string_split(trim(text), ' ')) AS n_tokens
      FROM documents),
    per_doc AS (
      SELECT source, n_tokens,
             CAST(ceil(n_tokens * 1.0 / {_CTX_WINDOW}) AS BIGINT)
               AS n_chunks
      FROM tok)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chunks) AS BIGINT) AS padded_chunks,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE)
                 / (SUM(n_chunks) * {_CTX_WINDOW}), 6)
             AS naive_efficiency,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE)
                 / (ceil(SUM(n_tokens) * 1.0 / {_CTX_WINDOW})
                    * {_CTX_WINDOW}), 6) AS packed_efficiency
    FROM per_doc GROUP BY source ORDER BY source
    """,
    doc="Context-window packing efficiency report (the planning step "
    "before sequence_packing): per source, how much of the token "
    "budget survives naive one-doc-per-chunk padding (sum of per-doc "
    "ceil(n/W) chunks) vs ideal dense packing (ceil(total/W)). The "
    "gap is the padding waste a greedy packer recovers — at 100 TB "
    "this number decides whether packing is worth a shuffle at all. "
    "Map-only tokenize + one bounded per-source aggregate; nothing "
    "wider than |sources| ever shuffles.",
)
def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), " "))
    per_doc = docs.select(
        "source",
        n_tokens.alias("n_tokens"),
        F.ceil(n_tokens / _CTX_WINDOW).alias("n_chunks"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chunks").alias("padded_chunks"),
            F.round(
                F.sum("n_tokens").cast("double")
                / (F.sum("n_chunks") * _CTX_WINDOW),
                6,
            ).alias("naive_efficiency"),
            F.round(
                F.sum("n_tokens").cast("double")
                / (F.ceil(F.sum("n_tokens") / _CTX_WINDOW) * _CTX_WINDOW),
                6,
            ).alias("packed_efficiency"),
        )
        .orderBy("source")
    )


_MIX_BUDGET = 1_000_000  # target training tokens for the plan


@query(
    "mixture_budget_plan",
    oracle=f"""
    WITH per AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT)
               AS tokens_available
      FROM documents GROUP BY lang),
    w AS (SELECT *, CAST(floor(sqrt(tokens_available)) AS BIGINT) AS wt
          FROM per),
    s AS (SELECT CAST(SUM(wt) AS BIGINT) AS s_w FROM w)
    SELECT w.lang, w.n_docs, w.tokens_available,
           CAST(floor({_MIX_BUDGET} * w.wt / s.s_w) AS BIGINT)
             AS tokens_allocated,
           ROUND(least(CAST(floor({_MIX_BUDGET} * w.wt / s.s_w) AS DOUBLE)
                       / w.tokens_available, 1.0), 6) AS sample_rate,
           ROUND(CAST(floor({_MIX_BUDGET} * w.wt / s.s_w) AS DOUBLE)
                 / w.tokens_available, 4) AS epochs
    FROM w CROSS JOIN s
    ORDER BY lang
    """,
    doc="Training-mix budget planning: given a target token budget, "
    "allocate per-language token shares under a temperature-0.5 weight "
    "(sqrt of available tokens — the same multilingual reweighting "
    "mixture_sample_temperature executes), and surface the review table "
    "a pipeline team signs off before launching a mix: available vs "
    "allocated tokens, the sampling rate (capped at 1), and epochs "
    "(allocated/available > 1 means the source repeats). Integer-exact "
    "allocation (floor of BUDGET*w/S on bigints); at 100 TB this is one "
    "per-language aggregate + a broadcast scalar — map-only planning, "
    "no corpus shuffle.",
)
def mixture_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(T.token_count("text")).cast("bigint").alias("tokens_available"),
    )
    w = per.withColumn(
        "wt", F.floor(F.sqrt(F.col("tokens_available"))).cast("long")
    )
    s = w.agg(F.sum("wt").cast("bigint").alias("s_w"))
    alloc = F.floor(F.lit(_MIX_BUDGET) * F.col("wt") / F.col("s_w"))
    from kyuubi_spark.functions.compat import dround

    return (
        w.crossJoin(F.broadcast(s))
        .select(
            "lang",
            "n_docs",
            "tokens_available",
            alloc.cast("bigint").alias("tokens_allocated"),
            dround(
                F.least(
                    alloc.cast("double") / F.col("tokens_available"), F.lit(1.0)
                ),
                6,
            ).alias("sample_rate"),
            dround(alloc.cast("double") / F.col("tokens_available"), 4).alias(
                "epochs"
            ),
        )
        .orderBy("lang")
    )
