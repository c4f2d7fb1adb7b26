"""Training-data pipeline operators, batch 5 — duplicated-span extraction,
rule-based quality filtering, vocabulary coverage planning, BPE merge-pair
counting, and per-source distribution-drift detection.

Continues pipeline.py..pipeline4.py (BASELINE.json north star: the
operations a 100 TB pretraining pipeline needs beyond the reference's SQL
surface; reference hook is the data-agent engine's pipeline charter,
externals/kyuubi-data-agent-engine).  House rules as before: every
surfaced aggregate is value-exact cross-engine (integer sums / integer
cross-multiplied threshold predicates, explicitly rounded doubles), and
every operator documents its 100 TB shuffle profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table

_SPAN_N = 5


@query(
    "exact_substring_spans",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(trim(text), ' ') AS w
      FROM documents),
    grams AS (
      SELECT doc_id, u.pos AS pos, u.g AS g FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, greatest(len(w) - {_SPAN_N - 1}, 0)),
                 i -> struct_pack(
                   pos := i,
                   g := array_to_string(w[i:i + {_SPAN_N - 1}], ' ')))) AS u
        FROM words) x),
    df AS (
      SELECT g, COUNT(DISTINCT doc_id) AS docs_with FROM grams GROUP BY g),
    hits AS (
      SELECT grams.doc_id, grams.pos
      FROM grams JOIN df USING (g) WHERE df.docs_with >= 2),
    isl AS (
      SELECT doc_id, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
               AS island
      FROM hits)
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) - MIN(pos) + {_SPAN_N} AS BIGINT) AS span_words,
           CAST(COUNT(*) AS BIGINT) AS n_grams
    FROM isl GROUP BY doc_id, island
    ORDER BY doc_id, span_start
    """,
    doc="Exact duplicated-SPAN extraction (the removal half of Lee et al. "
    "2022's exact-substring dedup, which repeated_ngram_coverage only "
    "scores): for every document, the maximal runs of consecutive word "
    "positions whose 5-gram also appears in another document — i.e. the "
    "(start, length) spans a surgical dedup pass would cut, instead of "
    "dropping the whole doc. A run of k consecutive duplicated gram "
    "positions is one maximal shared substring of k+4 words. Shuffle "
    "profile at 100 TB: one posexplode to the positioned gram stream "
    "(map-only), one gram-keyed doc-frequency aggregate (gram-space "
    "bounded, map-side combined), one equi-join back, then a window "
    "PARTITIONED BY doc_id (per-doc gram count is bounded by doc length, "
    "never corpus-scaled) for the gaps-and-islands merge. No pairwise "
    "doc comparison, no suffix array materialization.",
)
def exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    # Same short-doc guard as repeated_ngram_coverage: Spark's
    # sequence(1, 0) steps DOWNWARD, so gate on size(w) >= _SPAN_N.
    grams_expr = F.expr(
        f"CASE WHEN size(w) >= {_SPAN_N} THEN"
        f" transform(sequence(1, size(w) - {_SPAN_N - 1}),"
        f" i -> concat_ws(' ', slice(w, i, {_SPAN_N})))"
        f" ELSE array() END"
    )
    grams = (
        docs.select("doc_id", w.alias("w"))
        .select("doc_id", F.posexplode(grams_expr).alias("pos0", "g"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    )
    dup_grams = (
        grams.select("doc_id", "g")
        .distinct()
        .groupBy("g")
        .agg(F.count("*").alias("docs_with"))
        .filter(F.col("docs_with") >= 2)
        .select("g")
    )
    hits = grams.join(dup_grams, "g").select("doc_id", "pos")
    island = F.col("pos") - F.row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")
    )
    return (
        hits.withColumn("island", island)
        .groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") - F.min("pos") + _SPAN_N)
            .cast("bigint")
            .alias("span_words"),
            F.count("*").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_words", "n_grams")
        .orderBy("doc_id", "span_start")
    )


# Gopher-rule thresholds (Rae et al. 2021, appendix A1.1), adapted to the
# whitespace corpus: word-count bounds, mean-word-length bounds, a
# minimum-distinct-stopword floor, and a repeated-3-gram ceiling (the
# "repetitious text" family).  The repetition predicate is evaluated as an
# integer cross-multiplication so both engines compare exact integers.
_G_MIN_WORDS = 50
_G_MAX_WORDS = 100_000
_G_MIN_MWL = 3.0
_G_MAX_MWL = 10.0
_G_MIN_STOP = 2
_G_STOPSET = ("the", "a", "an", "and", "of", "to", "in", "that", "with", "be")
_G_REP_N = 3  # n-gram order for the repetition rule
_G_REP_PCT = 5  # fail when repeated-3-gram fraction > 5%


@query(
    "gopher_quality_report",
    oracle=f"""
    WITH per_doc AS (
      SELECT source,
             len(w) AS n_words,
             CAST(list_aggregate(list_transform(w, t -> len(t)), 'sum')
                  AS DOUBLE) / len(w) AS mwl,
             len(list_distinct(list_filter(w,
               t -> list_contains({list(_G_STOPSET)!r}, t)))) AS n_stop,
             greatest(len(w) - {_G_REP_N - 1}, 0) AS n_grams,
             len(list_distinct(list_transform(
               generate_series(1, greatest(len(w) - {_G_REP_N - 1}, 0)),
               i -> array_to_string(w[i:i + {_G_REP_N - 1}], ' '))))
               AS n_distinct_grams
      FROM (SELECT source, string_split(trim(text), ' ') AS w
            FROM documents) t),
    flags AS (
      SELECT source,
             CASE WHEN n_words < {_G_MIN_WORDS}
                    OR n_words > {_G_MAX_WORDS} THEN 1 ELSE 0 END AS f_wc,
             CASE WHEN mwl < {_G_MIN_MWL}
                    OR mwl > {_G_MAX_MWL} THEN 1 ELSE 0 END AS f_mwl,
             CASE WHEN n_stop < {_G_MIN_STOP} THEN 1 ELSE 0 END AS f_stop,
             CASE WHEN (n_grams - n_distinct_grams) * 100
                    > n_grams * {_G_REP_PCT} THEN 1 ELSE 0 END AS f_rep
      FROM per_doc)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(f_wc) AS BIGINT) AS fail_word_count,
           CAST(SUM(f_mwl) AS BIGINT) AS fail_mean_word_len,
           CAST(SUM(f_stop) AS BIGINT) AS fail_stopwords,
           CAST(SUM(f_rep) AS BIGINT) AS fail_repetition,
           CAST(SUM(CASE WHEN f_wc + f_mwl + f_stop + f_rep = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           ROUND(CAST(SUM(CASE WHEN f_wc + f_mwl + f_stop + f_rep = 0
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS pass_rate
    FROM flags GROUP BY source ORDER BY source
    """,
    doc="Rule-based quality filtering report (the Gopher rules, Rae et "
    "al. 2021 A1.1 — the standard pre-filter every modern pretraining "
    "pipeline runs before model-based scoring): per source, how many "
    "documents fail each of four rules — word-count bounds [50, 100k], "
    "mean-word-length bounds [3, 10], fewer than 2 distinct stopwords, "
    "repeated-3-gram fraction above 5% — plus the count and rate passing "
    "ALL rules. Unlike text_quality's single composite score, the "
    "per-rule breakdown tells a curation team WHICH rule to retune. "
    "Shuffle profile at 100 TB: every rule is a pure column expression "
    "(higher-order array lambdas, JVM-side), so this is map-only plus "
    "one bounded per-source aggregate; nothing wider than |sources| "
    "shuffles. The repetition threshold compares integer cross-products "
    "(no float ratio), keeping both engines bit-identical.",
)
def gopher_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), " ")
    stop_arr = F.array(*[F.lit(s) for s in _G_STOPSET])
    n_words = F.size(F.col("w"))
    mwl = (
        F.aggregate(
            F.col("w"),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + F.length(t).cast("bigint"),
        ).cast("double")
        / n_words
    )
    n_stop = F.size(
        F.array_distinct(
            F.filter(F.col("w"), lambda t: F.array_contains(stop_arr, t))
        )
    )
    grams = F.expr(
        f"CASE WHEN size(w) >= {_G_REP_N} THEN"
        f" transform(sequence(1, size(w) - {_G_REP_N - 1}),"
        f" i -> concat_ws(' ', slice(w, i, {_G_REP_N})))"
        f" ELSE array() END"
    )
    n_grams = F.greatest(n_words - (_G_REP_N - 1), F.lit(0))
    n_distinct_grams = F.size(F.array_distinct(grams))
    docs_w = docs.select("source", w.alias("w"))
    fails = F.col("f_wc") + F.col("f_mwl") + F.col("f_stop") + F.col("f_rep")
    flags = docs_w.select(
        "source",
        F.when(
            (n_words < _G_MIN_WORDS) | (n_words > _G_MAX_WORDS), 1
        )
        .otherwise(0)
        .alias("f_wc"),
        F.when((mwl < _G_MIN_MWL) | (mwl > _G_MAX_MWL), 1)
        .otherwise(0)
        .alias("f_mwl"),
        F.when(n_stop < _G_MIN_STOP, 1).otherwise(0).alias("f_stop"),
        F.when(
            (n_grams - n_distinct_grams) * 100 > n_grams * _G_REP_PCT, 1
        )
        .otherwise(0)
        .alias("f_rep"),
    )
    n_pass = F.sum(F.when(fails == 0, 1).otherwise(0))
    return (
        flags.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("f_wc").cast("bigint").alias("fail_word_count"),
            F.sum("f_mwl").cast("bigint").alias("fail_mean_word_len"),
            F.sum("f_stop").cast("bigint").alias("fail_stopwords"),
            F.sum("f_rep").cast("bigint").alias("fail_repetition"),
            n_pass.cast("bigint").alias("n_pass"),
            dround(n_pass.cast("double") / F.count("*"), 6).alias(
                "pass_rate"
            ),
        )
        .orderBy("source")
    )


@query(
    "vocab_coverage_report",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(trim(text), ' ')) AS token
      FROM documents),
    freq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
      FROM tok GROUP BY token),
    tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total_tokens FROM freq),
    ranked AS (
      SELECT token, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank
      FROM freq),
    bucketed AS (
      SELECT (1::BIGINT << (length(bin(rank)) - 1)) AS bucket_start,
             token, freq
      FROM ranked),
    per_bucket AS (
      SELECT bucket_start,
             CAST(COUNT(*) AS BIGINT) AS vocab_in_bucket,
             CAST(SUM(freq) AS BIGINT) AS tokens_in_bucket
      FROM bucketed GROUP BY bucket_start)
    SELECT bucket_start, vocab_in_bucket, tokens_in_bucket,
           CAST(SUM(vocab_in_bucket) OVER w AS BIGINT) AS cum_vocab,
           CAST(SUM(tokens_in_bucket) OVER w AS BIGINT) AS cum_tokens,
           ROUND(CAST(SUM(tokens_in_bucket) OVER w AS DOUBLE)
                 / (SELECT total_tokens FROM tot), 6) AS coverage
    FROM per_bucket
    WINDOW w AS (ORDER BY bucket_start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY bucket_start
    """,
    doc="Vocabulary coverage / Zipf report (the tokenizer-budget planning "
    "step before training a BPE vocab): rank every corpus token by "
    "frequency, group ranks into power-of-two buckets (rank bucket = "
    "2^floor(log2 rank), computed via binary-string length so both "
    "engines bucket identically — no float log), and report per-bucket "
    "and cumulative vocabulary size and token coverage. 'How many vocab "
    "entries cover 90% of the stream' falls straight out of the "
    "cumulative column. Shuffle profile at 100 TB: one token-keyed "
    "aggregate (vocab-bounded, map-side combined); the GLOBAL rank runs "
    "on the two-phase distributed ranker (operators/ranking.py — "
    "bucket-partitioned local row_number + broadcast prefix offsets, no "
    "single-partition window over the vocab relation, which grows with "
    "the corpus); the final cumulative window sees only ~log2(vocab) "
    "bucket rows (<= ~40 at any conceivable vocab), a reviewed "
    "bounded-input window.",
)
def vocab_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.operators.ranking import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    ranked, _total_vocab = global_row_number(
        freq, [("freq", "desc"), ("token", "asc")], rn_col="rank"
    )
    tot = freq.agg(F.sum("freq").cast("bigint").alias("total_tokens"))
    # PySpark's F.shiftleft only takes a literal bit count; the SQL
    # function accepts a column, so express the power-of-two bucket there.
    bucket_start = F.expr("shiftleft(cast(1 as bigint), length(bin(rank)) - 1)")
    per_bucket = (
        ranked.select(bucket_start.alias("bucket_start"), "freq")
        .groupBy("bucket_start")
        .agg(
            F.count("*").alias("vocab_in_bucket"),
            F.sum("freq").cast("bigint").alias("tokens_in_bucket"),
        )
    )
    # Cumulative over <= ~40 log2-bucket rows — bounded input, reviewed in
    # tools/window_audit.py's allowlist.
    cum = Window.orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_bucket.crossJoin(F.broadcast(tot))
        .select(
            "bucket_start",
            "vocab_in_bucket",
            "tokens_in_bucket",
            F.sum("vocab_in_bucket").over(cum).cast("bigint").alias("cum_vocab"),
            F.sum("tokens_in_bucket")
            .over(cum)
            .cast("bigint")
            .alias("cum_tokens"),
            dround(
                F.sum("tokens_in_bucket").over(cum).cast("double")
                / F.col("total_tokens"),
                6,
            ).alias("coverage"),
        )
        .orderBy("bucket_start")
    )


_BPE_TOP_K = 20


@query(
    "bpe_merge_pair_counts",
    oracle=f"""
    WITH words AS (
      SELECT unnest(string_split(trim(text), ' ')) AS word
      FROM documents),
    pairs AS (
      SELECT unnest(list_transform(
               generate_series(1, len(word) - 1),
               i -> substring(word, i, 2))) AS pair
      FROM words)
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY pair
    ORDER BY n_pairs DESC, pair
    LIMIT {_BPE_TOP_K}
    """,
    doc="BPE merge-pair counting (iteration 1 of byte-pair-encoding "
    "tokenizer training, Sennrich et al. 2016): count every adjacent "
    "character pair inside every word occurrence and surface the top "
    "merge candidates. A full BPE trainer repeats this after each merge; "
    "the per-iteration corpus scan is exactly this shape, so its scale "
    "behavior is what matters: map-only pair extraction, one pair-keyed "
    "aggregate whose key space is alphabet-squared (bounded, never "
    "corpus-scaled, map-side combined), then a distributed top-k "
    "(TakeOrdered, no global sort). LIMIT is total-ordered "
    "(count desc, pair asc) per the house determinism rule.",
)
def bpe_merge_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("word")
    )
    # Spark's sequence(1, 0) steps downward — guard 1-char words.
    pairs_expr = F.expr(
        "CASE WHEN length(word) >= 2 THEN"
        " transform(sequence(1, length(word) - 1),"
        " i -> substring(word, i, 2))"
        " ELSE array() END"
    )
    return (
        words.select(F.explode(pairs_expr).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), "pair")
        .limit(_BPE_TOP_K)
    )


@query(
    "source_unigram_kl",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(trim(text), ' ')) AS token
      FROM documents),
    st AS (
      SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c_st
      FROM tok GROUP BY source, token),
    s_tot AS (
      SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s
      FROM st GROUP BY source),
    g AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS c_t FROM tok GROUP BY token),
    n AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_g FROM g)
    SELECT st.source,
           CAST(MIN(s_tot.n_s) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_used,
           ROUND(SUM((CAST(st.c_st AS DOUBLE) / s_tot.n_s)
                     * ln((CAST(st.c_st AS DOUBLE) / s_tot.n_s)
                          / (CAST(g.c_t AS DOUBLE) / n.n_g))), 4) AS kl
    FROM st
    JOIN s_tot ON s_tot.source = st.source
    JOIN g ON g.token = st.token
    CROSS JOIN n
    GROUP BY st.source
    ORDER BY st.source
    """,
    doc="Per-source unigram KL divergence against the corpus distribution "
    "(source-mix drift detection: a source whose token distribution "
    "diverges from the pool is boilerplate, spam, or off-domain — the "
    "screening signal curation teams run before weighting a mix). "
    "KL(source || corpus) = sum_t p_s(t) ln(p_s(t)/p_g(t)); every "
    "source's support is a subset of the corpus support, so no zero "
    "terms. Both engines average the same IEEE ln() terms and round to 4 "
    "(the perplexity_filter precedent). Shuffle profile at 100 TB: "
    "token-keyed aggregates bound by |vocab| x |sources| (map-side "
    "combined), one vocab-bounded equi-join, the corpus total broadcast "
    "as a 1-row scalar, and a |sources|-row final aggregate.",
)
def source_unigram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.trim(F.col("text")), " ")).alias("token")
    )
    st = tok.groupBy("source", "token").agg(F.count("*").alias("c_st"))
    s_tot = st.groupBy("source").agg(
        F.sum("c_st").cast("bigint").alias("n_s")
    )
    g = tok.groupBy("token").agg(F.count("*").alias("c_t"))
    n = g.agg(F.sum("c_t").cast("bigint").alias("n_g"))
    p_s = F.col("c_st").cast("double") / F.col("n_s")
    p_g = F.col("c_t").cast("double") / F.col("n_g")
    return (
        st.join(s_tot, "source")
        .join(g, "token")
        .crossJoin(F.broadcast(n))
        .groupBy("source")
        .agg(
            F.min("n_s").cast("bigint").alias("n_tokens"),
            F.count("*").alias("vocab_used"),
            dround(F.sum(p_s * F.log(p_s / p_g)), 4).alias("kl"),
        )
        .orderBy("source")
    )


_SWEEP_THRESHOLDS = (0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5)
_SWEEP_FLOOR = 0.15


@query(
    "semdedup_threshold_sweep",
    oracle=f"""
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
        FROM sc) t WHERE r = 1),
    floor_pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             ROUND(list_sum(list_transform(
                     generate_series(1, len(a.embedding)),
                     i -> CAST(a.embedding[i] AS DOUBLE)
                          * CAST(b.embedding[i] AS DOUBLE)))
                   / (a.nrm * b.nrm), 6) AS score
      FROM e a JOIN asg aa ON a.vec_id = aa.vec_id
      JOIN asg ab ON ab.cluster = aa.cluster
      JOIN e b ON b.vec_id = ab.vec_id AND a.vec_id < b.vec_id
      WHERE ROUND(list_sum(list_transform(
                    generate_series(1, len(a.embedding)),
                    i -> CAST(a.embedding[i] AS DOUBLE)
                         * CAST(b.embedding[i] AS DOUBLE)))
                  / (a.nrm * b.nrm), 6) >= {_SWEEP_FLOOR}),
    t AS (SELECT CAST(unnest({list(_SWEEP_THRESHOLDS)!r}) AS DOUBLE)
            AS threshold),
    hits AS (
      SELECT t.threshold, p.a_id, p.b_id
      FROM floor_pairs p JOIN t ON p.score >= t.threshold)
    SELECT t.threshold,
           CAST(COALESCE(h.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(h.n_docs, 0) AS BIGINT) AS n_docs_in_pairs,
           CAST(COALESCE(h.n_removable, 0) AS BIGINT) AS removable_docs
    FROM t LEFT JOIN (
      SELECT threshold,
             COUNT(*) AS n_pairs,
             (SELECT COUNT(DISTINCT id) FROM (
                SELECT a_id AS id FROM hits h2 WHERE h2.threshold = h.threshold
                UNION ALL
                SELECT b_id FROM hits h3 WHERE h3.threshold = h.threshold))
               AS n_docs,
             COUNT(DISTINCT b_id) AS n_removable
      FROM hits h GROUP BY threshold) h ON h.threshold = t.threshold
    ORDER BY t.threshold
    """,
    doc="Semantic-dedup threshold tuning sweep: for each candidate cosine "
    "threshold, how many near-dup pairs fire, how many documents are "
    "touched, and how many the greedy remove-higher-id policy would drop "
    "— the dial-setting table reviewed before running semantic_dedup for "
    "real. SemDeDup (Abbas et al. 2023) tunes WITHIN k-means clusters, "
    "and so does this sweep: one pass of the CLUSTER-SCOPED pair scorer "
    "(semantic_dedup's own O(n^2/k) kernel — nearest-of-8 deterministic "
    "centroids, pairs scored only inside a cluster, nothing collected "
    "beyond the k centroids) at the FLOOR threshold, then a broadcast "
    "8-row threshold join and bounded aggregates — no full-corpus "
    "all-pairs pass anywhere, so the tuning step runs at the same scale "
    "as the dedup it tunes. Scores round to 6 before comparing, so both "
    "engines count identical pair sets.",
)
def semdedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = S.semantic_dedup_pairs(
        emb, k_clusters=8, threshold_rounded=_SWEEP_FLOOR
    )
    thr = spark.createDataFrame(
        [(t,) for t in _SWEEP_THRESHOLDS], "threshold double"
    )
    hits = pairs.join(
        F.broadcast(thr), F.col("score") >= F.col("threshold")
    )
    # ALL three counts from one exploded relation so the scorer runs in
    # exactly one plan branch (two separate aggregations over `hits`
    # would re-score every cluster once per branch); distinct-doc counts
    # via explode + countDistinct, never a per-group collect_list buffer
    exploded = hits.select(
        "threshold",
        F.posexplode(F.array("a_id", "b_id")).alias("pos", "id"),
    )
    agg = exploded.groupBy("threshold").agg(
        (F.count("*") / 2).cast("bigint").alias("n_pairs"),
        F.countDistinct("id").alias("n_docs_in_pairs"),
        F.countDistinct(
            F.when(F.col("pos") == 1, F.col("id"))
        ).alias("removable_docs"),
    )
    return (
        thr.join(agg, "threshold", "left")
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce("n_docs_in_pairs", F.lit(0))
            .cast("bigint")
            .alias("n_docs_in_pairs"),
            F.coalesce("removable_docs", F.lit(0))
            .cast("bigint")
            .alias("removable_docs"),
        )
        .orderBy("threshold")
    )
