"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd — no Python UDFs), so they
vectorize inside whole-stage codegen and scale linearly with input splits:
at 100 TB these run map-only with zero shuffle.

Portability rule: every formula here has an exact ANSI-SQL twin used in the
DuckDB oracles (kyuubi_spark/queries/pipeline.py), so results are
engine-independent integers/strings or explicitly rounded doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small, fixed english stopword list — deterministic across engines.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this", "be",
)


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (split on single space, matching the corpus)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("bigint")


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are stopwords (n-gram-free language signal)."""
    toks = tokens(text)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    return n_stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def lang_id(text: Column | str, threshold: float = 0.05) -> Column:
    """Heuristic language ID: stopword ratio >= threshold → 'en' else 'unknown'.

    (The container has no langdetect libs; this mirrors the classic
    stopword-density heuristic and is fully SQL-expressible.)
    """
    return F.when(stopword_ratio(text) >= threshold, F.lit("en")).otherwise(
        F.lit("unknown")
    )


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t).cast("bigint")
    )
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(text: Column | str) -> Column:
    """Composite quality score in [0,1]:
    0.4 * length_score + 0.3 * stopword_score + 0.3 * word_len_score.

    length_score   = least(n_tokens / 100, 1)
    stopword_score = least(stopword_ratio / 0.1, 1)  (fluency proxy)
    word_len_score = 1 - least(abs(avg_token_len - 5) / 5, 1)
    """
    n = token_count(text).cast("double")
    length_score = F.least(n / 100.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) / 0.1, F.lit(1.0))
    wl = avg_token_len(text)
    word_len_score = 1.0 - F.least(F.abs(wl - 5.0) / 5.0, F.lit(1.0))
    return 0.4 * length_score + 0.3 * stop_score + 0.3 * word_len_score


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of lowercased, space-normalized
    text. md5 is available and bit-identical in Spark and DuckDB."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(c)), " +", " ")
    return F.md5(normalized.cast("binary"))


# GPT-2-style pretokenizer shape: contraction suffixes, space-prefixed word /
# number / punctuation runs, whitespace runs. Plain alternation only — the
# same pattern compiles identically under Java regex (Spark) and RE2
# (DuckDB), so token counts are cross-engine exact.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish pretokenization (the LLM-pipeline token estimator)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(text: Column | str) -> Column:
    return F.size(bpe_ish_tokens(text)).cast("bigint")


def repetition_ratio(text: Column | str, n: int = 3) -> Column:
    """Within-document repetition: 1 - distinct_ngrams / total_ngrams.

    The classic "repetitive text" quality filter (boilerplate, keyword
    stuffing, decoding loops score near 1.0). Pure Column expression —
    map-only, no shuffle, scales linearly with splits.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(c), " ")
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    n_total = F.when(k >= n, (k - n + 1).cast("double")).otherwise(F.lit(1.0))
    n_distinct = F.when(k >= n, F.size(F.array_distinct(grams)).cast("double")).otherwise(
        F.lit(1.0)
    )
    return F.lit(1.0) - n_distinct / n_total


def hash_split(key: Column | str, train: float = 0.75, val: float = 0.125) -> Column:
    """Deterministic train/val/test assignment from md5 of the key.

    The first 4 hex chars of md5 are uniform over [0, 16^4); comparing them
    lexicographically against fixed hex thresholds reproduces the exact same
    split in any engine with a standard md5 — no RNG, no seed coordination
    across a 1000-executor cluster, and stable under re-partitioning.
    """
    c = F.col(key) if isinstance(key, str) else key
    h = F.substring(F.md5(c.cast("string")), 1, 4)
    t_thr = format(int(train * 65536), "04x")
    v_thr = format(int((train + val) * 65536), "04x")
    return (
        F.when(h < t_thr, F.lit("train"))
        .when(h < v_thr, F.lit("val"))
        .otherwise(F.lit("test"))
    )
