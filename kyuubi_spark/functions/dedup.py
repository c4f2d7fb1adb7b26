"""Deduplication operators (exact, MinHash+LSH, n-gram Jaccard, SimHash).

Scale design (100 TB): the only shuffles are (a) the LSH band-bucket join —
keys are uniform md5 band digests, so no skew — and (b) the candidate-pair
verification join, which touches only candidate rows (LSH prunes the O(n²)
pair space to near-linear). Signatures themselves are computed as pure
Column expressions over token arrays: map-only, whole-stage-codegen, no
Python UDFs.

Portability: all hashing is md5-hex (bit-identical in Spark and DuckDB), and
MinHash takes the *lexicographic* min of md5 hex strings — equivalent to min
over the 128-bit hash integers, and expressible in ANSI SQL for the oracle.
Jaccard thresholds compare integers (2*inter >= union for tau=0.5), never
floats, so candidate sets match across engines exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from kyuubi_spark.functions.compat import dround

HEX_DIGITS = "0123456789abcdef"


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column.

    Short texts (< n tokens) yield one whole-text shingle so every doc has a
    non-empty set.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(c), " ")
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), k - n + 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as a single Column: for each seed s, min over
    shingles of md5(s:shingle). Returns array<string>.

    NOTE: higher-order functions (transform/aggregate) are evaluated
    *interpreted* in Spark, not codegen'd — use ``minhash_signatures_df``
    (exploded, whole-stage-codegen md5 + map-side-combined min aggregates)
    for anything beyond toy inputs.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.array_min(
            F.transform(
                shingle_col,
                lambda sh: F.md5(
                    F.concat(s.cast("string"), F.lit(":"), sh).cast("binary")
                ),
            )
        ),
    )


def minhash_signatures_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, sig) per document — same values as ``minhash_signature`` but
    computed on the fast path: explode shingles, evaluate all ``num_hashes``
    md5s as ordinary codegen'd projections, and reduce with ``min``
    aggregates (partial map-side combine ⇒ one small shuffle keyed by doc id,
    linear at any scale).
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("g"),
    )
    hash_cols = [
        F.md5(F.concat(F.lit(f"{s}:"), F.col("g")).cast("binary")).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    wide = (
        sh.select("id", *hash_cols)
        .groupBy("id")
        .agg(*[F.min(f"h{s}").alias(f"m{s}") for s in range(num_hashes)])
    )
    return wide.select(
        "id", F.array(*[F.col(f"m{s}") for s in range(num_hashes)]).alias("sig")
    )


def band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: digest each band of ``rows_per_band`` signature entries.

    Returns array<struct<band:int, key:string>> for explode+group.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.md5(
                F.concat_ws(
                    "|", F.slice(signature, b * rows_per_band + 1, rows_per_band)
                ).cast("binary")
            ).alias("key"),
        ),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """MinHash-LSH candidate pairs (a < b), deduplicated across bands.

    Shuffle profile: one explode (bands× rows) + one self-join keyed on the
    uniform band digest + one distinct — near-linear in matches at any SF.
    """
    rows_per_band = num_hashes // bands
    sig = (
        minhash_signatures_df(df, id_col, text_col, n, num_hashes)
        .withColumn("bk", F.explode(band_keys(F.col("sig"), bands, rows_per_band)))
        .select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )
    left = sig.select(
        F.col("id").alias("a_id"), F.col("band").alias("band"), F.col("key").alias("key")
    )
    right = sig.select(
        F.col("id").alias("b_id"), F.col("band").alias("band_r"), F.col("key").alias("key_r")
    )
    return (
        left.join(
            right,
            (F.col("key") == F.col("key_r"))
            & (F.col("band") == F.col("band_r"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select("a_id", "b_id")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    tau_num: int = 1,
    tau_den: int = 2,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (or all pairs if None).

    Keeps pairs with jaccard >= tau_num/tau_den using the integer-exact test
    ``tau_den * inter >= tau_num * union`` — no float threshold ambiguity.
    Returns (a_id, b_id, inter, union, jaccard).
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), n)).alias("sh")
    ).distinct()
    counts = sh.groupBy("id").agg(F.count("*").alias("n_sh"))

    if candidates is None:
        a = sh.select(F.col("id").alias("a_id"), F.col("sh").alias("sh"))
        b = sh.select(F.col("id").alias("b_id"), F.col("sh").alias("sh_b"))
        inter = (
            a.join(b, (F.col("sh") == F.col("sh_b")) & (F.col("a_id") < F.col("b_id")))
            .groupBy("a_id", "b_id")
            .agg(F.count("*").alias("inter"))
        )
    else:
        a = sh.select(F.col("id").alias("a_id"), F.col("sh").alias("sh_a"))
        b = sh.select(F.col("id").alias("bb_id"), F.col("sh").alias("sh_b"))
        inter = (
            candidates.join(a, "a_id")
            .join(
                b,
                (F.col("b_id") == F.col("bb_id")) & (F.col("sh_a") == F.col("sh_b")),
            )
            .groupBy("a_id", "b_id")
            .agg(F.count("*").alias("inter"))
        )

    ca = counts.select(F.col("id").alias("a_id"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("id").alias("b_id"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ca, "a_id")
        .join(cb, "b_id")
        .withColumn("union", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .filter(tau_den * F.col("inter") >= tau_num * F.col("union"))
        .select(
            "a_id",
            "b_id",
            "inter",
            "union",
            dround(F.col("inter") / F.col("union"), 6).alias("jaccard"),
        )
    )


def _token_bit(h: Column, i: int) -> Column:
    """±1 for bit ``i`` (0-based) of a signed-long hash column.

    Mask test instead of shifting: bit 63 is the sign bit (1<<63 overflows a
    long literal), every other bit is ``h & (1<<i) != 0``.
    """
    on = (h < 0) if i == 63 else (h.bitwiseAND(F.lit(1 << i)) != 0)
    return F.when(on, 1).otherwise(-1)


def simhash_signatures_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 64,
) -> DataFrame:
    """(id, sig) per document; sig is a ``num_bits``-char '0'/'1' string.

    Classic SimHash: per token h = xxhash64(token); signature bit i = 1 iff
    sum over tokens of (2*bit_i(h) - 1) > 0 (ties → 0). Fast path: explode
    tokens, derive the 64 ±1 bit columns as codegen'd projections, reduce
    with 64 sum aggregates (map-side partial combine ⇒ one doc-id-keyed
    shuffle of 64 ints per doc — linear at any scale, no interpreted lambdas).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok"),
    )
    h = F.xxhash64("tok")
    per_tok = toks.select(
        "id", *[_token_bit(h, i).alias(f"b{i}") for i in range(num_bits)]
    )
    sums = per_tok.groupBy("id").agg(
        *[F.sum(f"b{i}").alias(f"s{i}") for i in range(num_bits)]
    )
    sig = F.concat(
        *[
            F.when(F.col(f"s{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(num_bits)
        ]
    )
    return sums.select("id", sig.alias("sig"))


def simhash_bits(text: Column | str, num_bits: int = 64) -> Column:
    """SimHash signature as a single Column (same formula as
    ``simhash_signatures_df``, which is the fast path — this interpreted
    fold exists for per-row composability on small inputs)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(c), " ")
    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), num_bits),
        lambda acc, t: F.zip_with(
            acc,
            F.array(*[_token_bit(F.xxhash64(t), i).cast("long") for i in range(num_bits)]),
            lambda a, b: a + b,
        ),
    )
    bits = F.transform(
        counts, lambda s: F.when(s > 0, F.lit("1")).otherwise(F.lit("0"))
    )
    return F.concat_ws("", bits)


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 64,
    max_hamming: int = 8,
    chunks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs via chunk-banding.

    Pigeonhole: if hamming(a,b) <= max_hamming and we split signatures into
    ``chunks`` > max_hamming/ (num_bits/chunks)… practical LSH shortcut: any
    pair within distance floor-bounded by chunks shares at least one exact
    chunk when max_hamming < chunks. We use chunks=4 ⇒ guaranteed complete
    for max_hamming <= 3; approximate above (documented recall trade-off —
    the standard Manku et al. WWW'07 scheme).
    """
    chunk_len = num_bits // chunks
    sig = simhash_signatures_df(df, id_col, text_col, num_bits)
    sig = sig.withColumn(
        "chunks",
        F.transform(
            F.sequence(F.lit(0), F.lit(chunks - 1)),
            lambda c: F.struct(
                c.cast("int").alias("cidx"),
                F.substring(F.col("sig"), c * chunk_len + 1, chunk_len).alias("ckey"),
            ),
        ),
    ).withColumn("ch", F.explode("chunks")).select(
        "id", "sig", F.col("ch.cidx").alias("cidx"), F.col("ch.ckey").alias("ckey")
    )
    a = sig.select(
        F.col("id").alias("a_id"), F.col("sig").alias("sig_a"), "cidx", "ckey"
    )
    b = sig.select(
        F.col("id").alias("b_id"),
        F.col("sig").alias("sig_b"),
        F.col("cidx").alias("cidx_b"),
        F.col("ckey").alias("ckey_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("cidx") == F.col("cidx_b"))
            & (F.col("ckey") == F.col("ckey_b"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select("a_id", "b_id", "sig_a", "sig_b")
        .distinct()
    )
    # hamming distance between bit strings: sum of per-position differences
    ham = F.aggregate(
        F.zip_with(
            F.split(F.col("sig_a"), ""),
            F.split(F.col("sig_b"), ""),
            lambda x, y: F.when(x != y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact deduplication: keep one row per key (hash groupBy semantics)."""
    return df.dropDuplicates(cols)
