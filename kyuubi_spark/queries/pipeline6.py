"""Pipeline batch 6: data-selection and dedup-planning operators.

- ``dsir_importance_weights`` — hashed-n-gram importance resampling
  (DSIR, Xie et al. 2023): per-document log importance weight of a raw
  pool against a target slice, the scoring pass behind data-selection
  for LM pretraining.
- ``ngram_novelty_curve`` — marginal-novelty curve: what fraction of
  each corpus slice's n-grams are first seen in that slice — the
  diminishing-returns diagnostic behind "how much more of this source is
  worth ingesting".
- ``lsh_band_s_curve`` — MinHash-LSH (bands, rows) tuning table: the
  analytic detection-probability S-curve per banding config, the dial
  sheet read before choosing dedup_minhash_lsh parameters.

All three are value-exact against DuckDB oracles; the corpus-scaled ones
keep the shuffle profile bucket-/gram-keyed (map-side combinable) with
only scalar totals broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.session import load_table

# --------------------------------------------------------------------------
# DSIR hashed-ngram importance weights
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 4096
_DSIR_TARGET = ("src0", "src1", "src2", "src3", "src4")

_FEATS_CTE = f"""
  toks AS (SELECT doc_id, source, string_split(trim(text), ' ') AS t
           FROM documents),
  feats AS (
    SELECT doc_id, source,
           ('0x' || substring(md5(f), 1, 8))::BIGINT % {_DSIR_BUCKETS} AS b
    FROM (
      SELECT doc_id, source, unnest(
        list_concat(
          t,
          CASE WHEN len(t) >= 2
               THEN list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])
               ELSE [] END)) AS f
      FROM toks) u)
"""


DSIR_ORACLE = f"""
    WITH {_FEATS_CTE},
    raw AS (SELECT b, COUNT(*) AS c_r FROM feats GROUP BY b),
    tgt AS (SELECT b, COUNT(*) AS c_t FROM feats
            WHERE source IN {_DSIR_TARGET!r} GROUP BY b),
    tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_r,
                   CAST(SUM(CASE WHEN source IN {_DSIR_TARGET!r}
                            THEN 1 ELSE 0 END) AS DOUBLE) AS n_t
            FROM feats)
    SELECT f.doc_id,
           ANY_VALUE(f.source) AS source,
           CAST(COUNT(*) AS BIGINT) AS n_feats,
           ROUND(AVG(
             ln((COALESCE(t.c_t, 0) + 1) / (tot.n_t + {_DSIR_BUCKETS}))
             - ln((r.c_r + 1) / (tot.n_r + {_DSIR_BUCKETS}))), 3) + 0
             AS avg_logw,
           CASE WHEN ROUND(AVG(
             ln((COALESCE(t.c_t, 0) + 1) / (tot.n_t + {_DSIR_BUCKETS}))
             - ln((r.c_r + 1) / (tot.n_r + {_DSIR_BUCKETS}))), 3) > 0
             THEN 1 ELSE 0 END AS keep
    FROM feats f
    JOIN raw r ON r.b = f.b
    LEFT JOIN tgt t ON t.b = f.b
    CROSS JOIN tot
    GROUP BY f.doc_id
    ORDER BY f.doc_id
    """


def _dsir_bucket_counts(feats: DataFrame) -> DataFrame:
    """Per-bucket (c_r, c_t) in ONE pass over the exploded features.

    The previous shape aggregated `feats` three times (raw counts, target
    counts, corpus totals) — three full tokenize+explode passes over the
    corpus.  A conditional sum folds the target count into the same keyed
    aggregate (count_if ≡ the old left-joined `c_t` under the formula's
    `coalesce(c_t, 0)`), and the corpus totals are re-derived from the
    <=4096-row bucket table instead of the corpus (guide §1.2: one pass)."""
    return feats.groupBy("b").agg(
        F.count("*").alias("c_r"),
        F.sum(
            F.when(F.col("source").isin(*_DSIR_TARGET), 1).otherwise(0)
        ).alias("c_t"),
    )


def _dsir_ratios_from_counts(bucket: DataFrame) -> DataFrame:
    tot = bucket.agg(
        F.sum("c_r").cast("double").alias("n_r"),
        F.sum("c_t").cast("double").alias("n_t"),
    )
    return bucket.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("c_t") + 1) / (F.col("n_t") + _DSIR_BUCKETS))
            - F.log((F.col("c_r") + 1) / (F.col("n_r") + _DSIR_BUCKETS))
        ).alias("log_ratio"),
    )


def dsir_bucket_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fitted per-bucket log ratio table (<=4096 rows): the static
    artifact a deployed DSIR gate broadcasts — shared by the batch query
    below and the streaming stream_dsir_filter replay.

    localCheckpoint materializes the tiny table so the streaming replays'
    per-batch re-broadcast re-ships 4096 rows instead of re-running the
    corpus tokenize+explode fit every microbatch (guide §5: cut lineage
    on a reused, cheap-to-hold intermediate)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = _dsir_features(docs)
    return _dsir_ratios_from_counts(
        _dsir_bucket_counts(feats)
    ).localCheckpoint()


def _dsir_features(docs: DataFrame) -> DataFrame:
    """(doc_id, source, b) hashed unigram+bigram feature stream — works
    on batch AND streaming inputs (pure map-side expressions)."""
    toks = docs.select(
        "doc_id", "source", F.split(F.trim(F.col("text")), " ").alias("t")
    )
    bigrams = F.when(
        F.size("t") >= 2,
        F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select(
        "doc_id",
        "source",
        F.explode(F.concat(F.col("t"), bigrams)).alias("f"),
    ).select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5(F.col("f").cast("binary")), 1, 8), 16, 10)
            .cast("long")
            % _DSIR_BUCKETS
        ).alias("b"),
    )


@query(
    "dsir_importance_weights",
    oracle=DSIR_ORACLE,
    doc="DSIR importance resampling weights (Xie et al. 2023): documents "
    "are featurized as hashed unigrams+bigrams (md5 -> 4096 buckets, the "
    "text_hash_embed trick), the TARGET distribution is a designated "
    "high-quality slice (sources src0-4), and each pool document scores "
    "avg ln(p_target(b)/p_raw(b)) with add-one smoothing — positive "
    "weight = looks more like the target than the pool, the keep bit a "
    "resampler would threshold on. Shuffle profile at 100 TB: two "
    "bucket-keyed aggregates bounded by 4096 rows (map-side combined, "
    "BROADCAST back to the feature stream), scalar totals broadcast, one "
    "doc-keyed regroup — the same profile as perplexity_filter, and both "
    "engines average identical IEEE ln() terms rounded to 3.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # unigrams + bigrams; CASE-guard short docs (Spark sequence(1, 0)
    # steps DOWNWARD, so the bigram lambda must never see len < 2)
    feats = _dsir_features(docs)
    # one fit pass (see _dsir_bucket_counts) + one scoring pass, instead
    # of the previous raw/tgt/tot triple fit (3 extra corpus explosions);
    # the <=4096-row bucket table is checkpointed so the totals and the
    # broadcast both reuse it instead of re-running the fit subplan
    bucket = _dsir_bucket_counts(feats).localCheckpoint()
    tot = bucket.agg(
        F.sum("c_r").cast("double").alias("n_r"),
        F.sum("c_t").cast("double").alias("n_t"),
    )
    logw = F.avg(
        F.log((F.col("c_t") + 1) / (F.col("n_t") + _DSIR_BUCKETS))
        - F.log((F.col("c_r") + 1) / (F.col("n_r") + _DSIR_BUCKETS))
    )
    return (
        feats.join(F.broadcast(bucket), "b")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            F.count("*").alias("n_feats"),
            dround(logw, 3).alias("avg_logw"),
            F.when(dround(logw, 3) > 0, 1).otherwise(0).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Marginal n-gram novelty curve
# --------------------------------------------------------------------------

_NOVELTY_SLICES = 20


@query(
    "ngram_novelty_curve",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(trim(text), ' ') AS t
                  FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest(
          CASE WHEN len(t) >= 3
               THEN list_transform(generate_series(1, len(t) - 2),
                                   i -> array_to_string(t[i:i+2], ' '))
               ELSE [array_to_string(t, ' ')] END) AS g
        FROM toks) u),
    first_seen AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g),
    mx AS (SELECT MAX(doc_id) AS m FROM documents)
    SELECT CAST(LEAST({_NOVELTY_SLICES - 1},
                      FLOOR(doc_id * {_NOVELTY_SLICES} / (mx.m + 1))) AS INT)
             AS slice,
           CAST(COUNT(DISTINCT g.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS novel_grams,
           ROUND(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1.0 ELSE 0 END)
                 / COUNT(*), 6) AS novelty_frac
    FROM grams g JOIN first_seen f ON f.g = g.g CROSS JOIN mx
    GROUP BY slice
    ORDER BY slice
    """,
    doc="Marginal n-gram novelty curve: corpus slices in ingestion order "
    "(doc_id split into 20 equal ranges), each reporting the fraction of "
    "its distinct word-3-grams not seen in ANY earlier document — the "
    "diminishing-returns curve data teams read to decide how much more "
    "of a source is worth ingesting (novelty decays toward the "
    "boilerplate floor as the corpus saturates). First-seen attribution "
    "is a gram-keyed MIN aggregate joined back to the per-doc distinct "
    "grams — the exact_substring_spans shuffle profile: two gram-keyed "
    "map-side-combined passes, no pairwise doc work, scalar max-doc-id "
    "broadcast; the final relation is 20 rows.",
)
def ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), " ").alias("t")
    )
    gram_list = F.when(
        F.size("t") >= 3,
        F.expr(
            "transform(sequence(1, size(t) - 2),"
            " i -> concat_ws(' ', slice(t, i, 3)))"
        ),
    ).otherwise(F.array(F.concat_ws(" ", F.col("t"))))
    grams = (
        toks.select("doc_id", F.explode(gram_list).alias("g")).distinct()
    )
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    mx = docs.agg(F.max("doc_id").alias("m"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    slice_col = F.least(
        F.lit(_NOVELTY_SLICES - 1),
        (F.col("doc_id") * _NOVELTY_SLICES / (F.col("m") + 1)).cast("long"),
    ).cast("int")
    return (
        grams.join(first_seen, "g")
        .crossJoin(F.broadcast(mx))
        .groupBy(slice_col.alias("slice"))
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_grams"),
            F.sum(novel).cast("bigint").alias("novel_grams"),
            dround(F.sum(novel.cast("double")) / F.count("*"), 6).alias(
                "novelty_frac"
            ),
        )
        .orderBy("slice")
    )


# --------------------------------------------------------------------------
# MinHash-LSH banding S-curve tuning table
# --------------------------------------------------------------------------

_LSH_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8))  # 16-hash signatures
_S_STEPS = 19  # s = 0.05 .. 0.95


@query(
    "lsh_band_s_curve",
    oracle=f"""
    WITH cfg AS (
      SELECT unnest([{", ".join(f"{{'bands': {b}, 'rows': {r}}}"
                                for b, r in _LSH_CONFIGS)}],
                    recursive := true)),
    s AS (SELECT CAST(i AS DOUBLE) / 20 AS s
          FROM generate_series(1, {_S_STEPS}) t(i))
    SELECT CAST(cfg.bands AS INT) AS bands,
           CAST(cfg.rows AS INT) AS rows_per_band,
           s.s AS jaccard,
           ROUND(1 - pow(1 - pow(s.s, cfg.rows), cfg.bands), 6)
             AS p_candidate,
           ROUND(pow(1.0 / cfg.bands, 1.0 / cfg.rows), 6) AS threshold
    FROM cfg CROSS JOIN s
    ORDER BY bands, rows_per_band, jaccard
    """,
    doc="MinHash-LSH banding S-curve (Leskovec/Rajaraman/Ullman ch.3): "
    "for every (bands, rows) split of the repo's 16-hash signatures, the "
    "analytic candidate probability 1-(1-s^r)^b over a Jaccard grid plus "
    "the curve's threshold (1/b)^(1/r) — the dial sheet read before "
    "picking dedup_minhash_lsh parameters (more bands catch lower "
    "similarity at more candidate cost). Constant-size relation, no "
    "table scan; both engines evaluate identical IEEE pow() rounded 6.",
)
def lsh_band_s_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = spark.createDataFrame(
        list(_LSH_CONFIGS), "bands int, rows_per_band int"
    )
    s = spark.range(1, _S_STEPS + 1).select(
        (F.col("id").cast("double") / 20).alias("jaccard")
    )
    p = 1 - F.pow(
        1 - F.pow(F.col("jaccard"), F.col("rows_per_band")), F.col("bands")
    )
    thr = F.pow(1.0 / F.col("bands"), 1.0 / F.col("rows_per_band"))
    return (
        cfg.crossJoin(s)
        .select(
            "bands",
            "rows_per_band",
            "jaccard",
            dround(p, 6).alias("p_candidate"),
            dround(thr, 6).alias("threshold"),
        )
        .orderBy("bands", "rows_per_band", "jaccard")
    )


# --------------------------------------------------------------------------
# Cross-source n-gram overlap matrix
# --------------------------------------------------------------------------


@query(
    "source_overlap_matrix",
    oracle="""
    WITH toks AS (SELECT doc_id, source, string_split(trim(text), ' ') AS t
                  FROM documents),
    grams AS (
      SELECT DISTINCT source, g FROM (
        SELECT source, unnest(
          CASE WHEN len(t) >= 3
               THEN list_transform(generate_series(1, len(t) - 2),
                                   i -> array_to_string(t[i:i+2], ' '))
               ELSE [array_to_string(t, ' ')] END) AS g
        FROM toks) u),
    sizes AS (SELECT source, COUNT(*) AS n FROM grams GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
      GROUP BY 1, 2)
    SELECT i.src_a, i.src_b,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(sb.n AS BIGINT) AS n_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           ROUND(CAST(i.n_common AS DOUBLE)
                 / (sa.n + sb.n - i.n_common), 6) AS jaccard,
           ROUND(CAST(i.n_common AS DOUBLE) / LEAST(sa.n, sb.n), 6)
             AS containment
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    WHERE i.n_common > 0
    ORDER BY src_a, src_b
    """,
    doc="Cross-source n-gram overlap matrix: for every source pair, the "
    "distinct word-3-gram intersection, Jaccard, and containment "
    "(overlap over the smaller source) — the redundancy sheet mix "
    "planners read next to mixture_budget_plan (a source 90%-contained "
    "in another adds little new signal at full weight). The Spark plan "
    "NEVER self-joins the gram relation: each gram aggregates its "
    "bounded source set (<= |sources|, collect_set map-side combined), "
    "pairs explode from that tiny array per gram, and a second "
    "map-side-combined count yields the |sources|^2-bounded matrix — "
    "two gram-keyed passes total at 100 TB, no quadratic join. The "
    "oracle keeps the literal pairwise self-join for value parity.",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.split(F.trim(F.col("text")), " ").alias("t")
    )
    gram_list = F.when(
        F.size("t") >= 3,
        F.expr(
            "transform(sequence(1, size(t) - 2),"
            " i -> concat_ws(' ', slice(t, i, 3)))"
        ),
    ).otherwise(F.array(F.concat_ws(" ", F.col("t"))))
    grams = toks.select(
        "source", F.explode(gram_list).alias("g")
    ).distinct()
    # gram -> its (bounded, sorted) source set; ALL ordered pairs
    # INCLUDING self-pairs explode map-side, so one aggregation yields
    # the whole matrix AND the per-source sizes on its diagonal — a
    # single corpus pass (three branches re-reading `grams` would
    # re-scan the parquet and redo the shingle pass each)
    per_gram = grams.groupBy("g").agg(
        F.array_sort(F.collect_set("source")).alias("srcs")
    )
    pairs = per_gram.select(
        F.explode(
            F.expr(
                "flatten(transform(srcs, (a, i) ->"
                " transform(slice(srcs, i + 1, size(srcs)),"
                " b -> struct(a as src_a, b as src_b))))"
            )
        ).alias("p")
    ).select("p.src_a", "p.src_b")
    from kyuubi_spark.caching import persisted

    # <= |sources|^2 rows: persisting it means the corpus aggregation
    # runs ONCE and the diagonal/off-diagonal branches read the cache
    matrix = persisted(
        pairs.groupBy("src_a", "src_b").agg(F.count("*").alias("n_common"))
    )
    diag = matrix.filter(F.col("src_a") == F.col("src_b"))
    inter = matrix.filter(F.col("src_a") < F.col("src_b"))
    sa = diag.select(
        F.col("src_a"), F.col("n_common").alias("n_a")
    )
    sb = diag.select(
        F.col("src_a").alias("src_b"), F.col("n_common").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_common",
            dround(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
            dround(
                F.col("n_common") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
        .orderBy("src_a", "src_b")
    )


# --------------------------------------------------------------------------
# Shuffle-key skew report
# --------------------------------------------------------------------------


@query(
    "shuffle_skew_report",
    oracle="""
    WITH k AS (
      SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
    t AS (SELECT CAST(SUM(c) AS DOUBLE) AS n_rows,
                 CAST(COUNT(*) AS BIGINT) AS n_keys,
                 CAST(MAX(c) AS BIGINT) AS max_key_rows
          FROM k),
    top10 AS (SELECT CAST(SUM(c) AS BIGINT) AS top10_rows
              FROM (SELECT c FROM k ORDER BY c DESC, user_id LIMIT 10)),
    h AS (SELECT ROUND(-SUM((c / t.n_rows) * ln(c / t.n_rows)), 4)
                   AS entropy
          FROM k CROSS JOIN t GROUP BY t.n_rows)
    SELECT CAST(t.n_rows AS BIGINT) AS n_rows,
           t.n_keys,
           t.max_key_rows,
           ROUND(t.n_rows / t.n_keys, 2) AS avg_rows_per_key,
           ROUND(t.max_key_rows / t.n_rows, 6) AS top1_share,
           ROUND(top10.top10_rows / t.n_rows, 6) AS top10_share,
           h.entropy,
           CAST(CEIL(t.max_key_rows / (t.n_rows / t.n_keys)) AS BIGINT)
             AS salt_factor
    FROM t CROSS JOIN top10 CROSS JOIN h
    """,
    doc="Shuffle-key skew report over events.user_id: key cardinality, "
    "hottest-key row counts, top-1/top-10 load shares, key-distribution "
    "entropy, and the recommended salt factor (hottest key's multiple of "
    "the average — the split count that levels a salted repartition) — "
    "the diagnostic run BEFORE choosing salting/AQE-skew settings for a "
    "join or aggregation on this key. One key-keyed count (map-side "
    "combined), a 1-row moment aggregate, a bounded top-10 TakeOrdered, "
    "and one more bounded pass for entropy — no windows, nothing "
    "corpus-scaled on the driver.",
)
def shuffle_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.caching import persisted

    events = load_table(spark, sf_dir, "events")
    # per-key counts persist: the moments, top-10, and entropy passes all
    # read them (a |keys|-sized relation, far smaller than the input)
    k = persisted(
        events.groupBy("user_id").agg(F.count("*").alias("c"))
    )
    t = k.agg(
        F.sum("c").cast("double").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("c").alias("max_key_rows"),
    )
    top10 = (
        k.orderBy(F.col("c").desc(), "user_id")
        .limit(10)
        .agg(F.sum("c").alias("top10_rows"))
    )
    h = (
        k.crossJoin(F.broadcast(t.select("n_rows")))
        .agg(
            dround(
                -F.sum(
                    (F.col("c") / F.col("n_rows"))
                    * F.log(F.col("c") / F.col("n_rows"))
                ),
                4,
            ).alias("entropy")
        )
    )
    return (
        t.crossJoin(F.broadcast(top10))
        .crossJoin(F.broadcast(h))
        .select(
            F.col("n_rows").cast("bigint").alias("n_rows"),
            "n_keys",
            F.col("max_key_rows").cast("bigint").alias("max_key_rows"),
            dround(F.col("n_rows") / F.col("n_keys"), 2).alias(
                "avg_rows_per_key"
            ),
            dround(F.col("max_key_rows") / F.col("n_rows"), 6).alias(
                "top1_share"
            ),
            dround(F.col("top10_rows") / F.col("n_rows"), 6).alias(
                "top10_share"
            ),
            "entropy",
            F.ceil(
                F.col("max_key_rows") / (F.col("n_rows") / F.col("n_keys"))
            ).cast("bigint").alias("salt_factor"),
        )
    )


# --------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE — new §2.D surface)
# --------------------------------------------------------------------------

_RECURSIVE_SQL = """
WITH RECURSIVE tree AS (
  SELECT c_custkey AS node, CAST(c_custkey AS BIGINT) AS root, 0 AS depth
  FROM customer WHERE c_custkey < 10
  UNION ALL
  SELECT c.c_custkey, t.root, t.depth + 1
  FROM customer c JOIN tree t
    ON CAST(FLOOR(c.c_custkey / 10) AS BIGINT) = t.node
  WHERE c.c_custkey >= 10
)
SELECT depth,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
       CAST(MIN(node) AS BIGINT) AS min_node,
       CAST(MAX(node) AS BIGINT) AS max_node
FROM tree
GROUP BY depth
ORDER BY depth
"""


@query(
    "recursive_cte_hierarchy",
    oracle=_RECURSIVE_SQL,
    doc="Recursive CTE (WITH RECURSIVE, new in Spark 4 — SPARK-24497): "
    "iterative hierarchy walk over the decimal-digit parent tree "
    "floor(custkey/10), per-depth node and root counts. Spark executes "
    "the recursion as iterated UNION steps (each step a join of the "
    "frontier against the base relation — the same loop dedup_components "
    "hand-rolls with localCheckpoint); depth is bounded by "
    "log10(|customer|), so the frontier shrinks geometrically and no "
    "step holds more than the previous frontier joined to its children. "
    "Identical SQL text runs on both engines.",
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.session import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)
