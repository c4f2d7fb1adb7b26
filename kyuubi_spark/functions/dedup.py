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

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from kyuubi_spark.caching import persisted
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


def shingles_arrow(n: int = 3):
    """Arrow-batched twin of ``shingles()`` — identical values, ~3x faster.

    Spark evaluates higher-order array lambdas INTERPRETED (no codegen), so
    the Column form costs ~1ms/doc; shingle-set construction is exactly the
    "Python is the right tool" case: a vectorized pandas UDF over Arrow
    batches, still map-only/shuffle-free, linear at any scale.  dict keys
    preserve first-occurrence order like array_distinct, so both forms are
    element-wise identical (asserted in tests).
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def f(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").strip().split(" ")
            if len(toks) >= n:
                seen = dict.fromkeys(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
                out.append(list(seen))
            else:
                out.append([" ".join(toks)])
        return pd.Series(out)

    return f


def gram_hash_arrow(k: int):
    """Arrow-batched ORDERED k-gram hashing: text -> array<long> of the
    60-bit md5-prefix hash of each word k-gram, in position order (no
    dedup — winnowing needs positions, unlike the shingle-set form).

    Same "Python is the right tool" rationale as shingles_arrow: the
    Column form pays an interpreted higher-order lambda with k
    element_at calls PER GRAM; the vectorized form is one pass per doc
    (measured 2.8x faster on the sf0.1 gram stream, bit-identical
    values). Map-only/shuffle-free at any scale, and the hash matches
    the DuckDB oracle's ('0x' || substring(md5(g), 1, 15))::BIGINT.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def f(texts: pd.Series) -> pd.Series:
        import hashlib

        out = []
        for t in texts:
            toks = (t or "").strip().split(" ")
            if len(toks) >= k:
                out.append([
                    int(
                        hashlib.md5(
                            " ".join(toks[i : i + k]).encode()
                        ).hexdigest()[:15],
                        16,
                    )
                    for i in range(len(toks) - k + 1)
                ])
            else:
                out.append([])
        return pd.Series(out)

    return f


def shingle_hash_arrow():
    """Arrow-batched md5-prefix hash of a shingle array: each string shingle
    becomes the 60-bit integer value of the first 15 hex chars of its md5
    (duplicates dropped, first-occurrence order kept).

    Why: ``array_intersect`` over *string* arrays is ~25x slower than over
    *long* arrays (measured: 49 s vs 2.1 s per 500k pairs at 64 threads), so
    Jaccard verification runs in hashed-shingle space.  The hash is
    md5-derived, so the DuckDB oracle replays it bit-identically via
    ``('0x' || substring(md5(s), 1, 15))::BIGINT`` — both engines count
    intersections of the SAME hashed sets, so results match by construction
    even in the (2^-60) event of a collision.
    """
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def f(shs: pd.Series) -> pd.Series:
        out = []
        for arr in shs:
            seen = dict.fromkeys(
                int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in arr
            )
            out.append(list(seen))
        return pd.Series(out)

    return f


def hashed_shingles_arrow(n: int = 3):
    """``shingle_hash_arrow`` ∘ ``shingles_arrow`` fused into ONE Arrow pass
    (text → md5-prefix 60-bit shingle hashes) — saves a serialize/deserialize
    round trip when the caller never needs the string shingles."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def f(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").strip().split(" ")
            if len(toks) >= n:
                grams = dict.fromkeys(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
            else:
                grams = {" ".join(toks): None}
            out.append(
                list(
                    dict.fromkeys(
                        int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                        for g in grams
                    )
                )
            )
        return pd.Series(out)

    return f


# Double-hashing (Kirsch & Mitzenmacher): h_s = (h1 + s*h2) mod 2^48 gives
# num_hashes independent-enough minhash functions from ONE md5 per shingle
# (16x fewer digests than md5 per seed). 48-bit halves keep s*h2 < 2^52 —
# no long overflow — and md5 is the cross-engine-reproducible base hash the
# DuckDB oracle can replicate.
_MINHASH_MASK = (1 << 48) - 1


def _minhash_parts(shingle: Column) -> tuple[Column, Column]:
    hx = F.md5(shingle.cast("binary"))
    h1 = F.conv(F.substring(hx, 1, 12), 16, 10).cast("long")
    h2 = F.conv(F.substring(hx, 13, 12), 16, 10).cast("long")
    return h1, h2


def minhash_signature(shingle_col: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as a single Column: for each seed s, min over
    shingles of (h1 + s*h2) & (2^48-1) with h1/h2 from one md5. Returns
    array<long>.

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
                lambda sh: (
                    (_minhash_parts(sh)[0] + s.cast("long") * _minhash_parts(sh)[1])
                    .bitwiseAND(F.lit(_MINHASH_MASK))
                ),
            )
        ),
    )


def minhash_signatures_arrow(num_hashes: int = 16):
    """Arrow-batched MinHash from a per-doc shingle ARRAY: array<string>
    shingles -> array<long> signature, identical values to the exploded
    md5 + min-aggregate form (same md5 hex base, same Kirsch-Mitzenmacher
    double hashing, min over the same set; parity pinned by tests).

    Why (r13, guide §8): the exploded form shuffles shingles x
    ``num_hashes`` longs into a 16-min-aggregate groupBy; this form is
    MAP-ONLY — signatures never leave the stage that holds the shingle
    arrays, so the per-doc-keyed shuffle disappears from every LSH plan.
    """
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def f(shs: pd.Series) -> pd.Series:
        seeds = np.arange(num_hashes, dtype=np.int64)
        out = []
        for arr in shs:
            k = len(arr)
            h1 = np.empty(k, dtype=np.int64)
            h2 = np.empty(k, dtype=np.int64)
            for j, g in enumerate(arr):
                hx = hashlib.md5(g.encode()).hexdigest()
                h1[j] = int(hx[:12], 16)
                h2[j] = int(hx[12:24], 16)
            vals = (h1[:, None] + seeds[None, :] * h2[:, None]) & np.int64(
                _MINHASH_MASK
            )
            out.append(vals.min(axis=0).tolist())
        return pd.Series(out)

    return f


def spread_narrow(df: DataFrame) -> DataFrame:
    """Round-robin the rows of a narrow relation to the session's default
    parallelism before a per-row Arrow pass.  Local SFs read the corpus
    parquet as ONE split, which would serialize the pass into a single
    Python worker; at real scale the scan already has more splits than
    cores and this is a no-op (the check is driver-side only)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        if df.rdd.getNumPartitions() < par:
            return df.repartition(par)
    except Exception:
        pass
    return df


def shingle_arrays_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, shs) — one row per doc with its distinct shingle ARRAY, the
    shared relation of the r13 dedup chain: MinHash signatures
    (``minhash_signatures_arrow``), verification arrays
    (``shingle_hash_arrow``) and the exact prefix-filter path all derive
    from it MAP-ONLY, so one localCheckpoint of O(docs) rows replaces the
    exploded O(shingles) relation the chain used to share."""
    return spread_narrow(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    ).select("id", shingles_arrow(n)(F.col("t")).alias("shs"))


def minhash_signatures_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    shingle_df: DataFrame | None = None,
    shingle_arrays: DataFrame | None = None,
) -> DataFrame:
    """(id, sig) per document — same values as ``minhash_signature``.

    Three sources, in order of preference:
    - ``shingle_arrays`` (columns id, shs): map-only Arrow signatures off
      the shared per-doc shingle arrays (the r13 fast path — no shuffle).
    - ``shingle_df`` (columns id, g, exploded): the legacy shared
      relation; one codegen'd md5 per shingle + ``num_hashes`` min
      aggregates (one doc-id-keyed shuffle).
    - neither: build the arrays from ``df`` and take the map-only path.
    """
    if shingle_arrays is not None:
        return shingle_arrays.select(
            "id", minhash_signatures_arrow(num_hashes)(F.col("shs")).alias("sig")
        )
    if shingle_df is None:
        return minhash_signatures_df(
            df,
            id_col,
            text_col,
            n,
            num_hashes,
            shingle_arrays=shingle_arrays_df(df, id_col, text_col, n),
        )
    sh = shingle_df
    h1, h2 = _minhash_parts(F.col("g"))
    proj = sh.select("id", h1.alias("h1"), h2.alias("h2"))
    hash_cols = [
        (F.col("h1") + s * F.col("h2")).bitwiseAND(F.lit(_MINHASH_MASK)).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    wide = (
        proj.select("id", *hash_cols)
        .groupBy("id")
        .agg(*[F.min(f"h{s}").alias(f"m{s}") for s in range(num_hashes)])
    )
    return wide.select(
        "id", F.array(*[F.col(f"m{s}") for s in range(num_hashes)]).alias("sig")
    )


def band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: digest each band of ``rows_per_band`` signature entries.

    Returns array<struct<band:int, key:string>> for explode+group. Generic
    over any signature element type; ``lsh_candidate_pairs`` skips the
    digest and joins on the raw band values directly (long equality beats
    a string digest).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.transform(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
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
    shingle_df: DataFrame | None = None,
    shingle_arrays: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs (a < b), deduplicated across bands.

    Shuffle profile: one explode (bands× rows) + one self-join keyed on the
    uniform band values + one distinct — near-linear in matches at any SF.
    """

    rows_per_band = num_hashes // bands
    # join directly on the band's raw signature slice (rows_per_band longs)
    # — no digest needed, and long-tuple equality is codegen'd
    banded = (
        minhash_signatures_df(
            df, id_col, text_col, n, num_hashes, shingle_df, shingle_arrays
        )
        .select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).alias(
                                    f"k{r}"
                                )
                                for r in range(rows_per_band)
                            ],
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        )
        .select("id", "bk.*")
        # Both self-join sides reference this relation; without persist each
        # side re-runs the whole shingle→md5→min-aggregate pipeline (the
        # expensive part) from the scan. The banded relation is bands rows
        # of a few longs per doc — O(corpus row count), not corpus bytes —
        # so caching it is safe at any scale and halves signature work.
        # (registered with caching.persisted — a long-lived session
        # releases it via kyuubi_spark.caching.release_caches())
    )
    banded = persisted(banded)
    kcols = [f"k{r}" for r in range(rows_per_band)]
    left = banded.select(F.col("id").alias("a_id"), "band", *kcols)
    right = banded.select(
        F.col("id").alias("b_id"),
        F.col("band").alias("band_r"),
        *[F.col(k).alias(f"{k}_r") for k in kcols],
    )
    cond = (F.col("band") == F.col("band_r")) & (F.col("a_id") < F.col("b_id"))
    for k in kcols:
        cond = cond & (F.col(k) == F.col(f"{k}_r"))
    return left.join(right, cond).select("a_id", "b_id").distinct()


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    tau_num: int = 1,
    tau_den: int = 2,
    shingle_df: DataFrame | None = None,
    shingle_arrays: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (or all pairs if None).

    Keeps pairs with jaccard >= tau_num/tau_den using the integer-exact test
    ``tau_den * inter >= tau_num * union`` — no float threshold ambiguity.
    Returns (a_id, b_id, inter, union, jaccard). ``shingle_df`` (id, g,
    already distinct) shares a materialized shingle relation with the LSH
    phase.

    Physical shape (the 100 TB story):
    - With ``candidates=None``, exact pairs come from PREFIX FILTERING
      (PPJoin/Vernica-style set-similarity join): under one global token
      order (rarest shingle first), any pair with jaccard >= tau shares its
      smallest common shingle inside BOTH docs' first
      ``n_sh - ceil(tau*n_sh) + 1`` shingles, so indexing only prefixes is
      LOSSLESS for the threshold — identical output to a naive self-join —
      while the corpus-hottest shingles (the quadratic pair blowup at
      scale) fall in suffixes and never join.
    - The prefix join applies PPJoin's two LOSSLESS candidate pruners as
      codegen'd join predicates BEFORE the pair shuffle: the LENGTH filter
      (jaccard >= tau needs ``tau_den*min(n_a,n_b) >= tau_num*max``, since
      inter <= min and union >= max) and the POSITIONAL filter (a match at
      ranks rk_a/rk_b caps the overlap at ``1 + min(n_a-rk_a, n_b-rk_b)``,
      which must reach the equivalent-overlap bound
      ``ceil(tau_num*(n_a+n_b)/(tau_num+tau_den))``).  Both only discard
      pairs that cannot pass verification, so output is still exact; at
      tau=1/4 they cut the raw candidate stream ~3x.
    - Verification is one ``array_intersect`` per candidate pair over the
      two docs' shingle arrays (codegen, O(|a|+|b|)) instead of re-joining
      the exploded shingle relation, which would replicate every pair once
      per shingle.
    """
    # verification runs in md5-hashed long space: array_intersect over longs
    # is ~25x faster than over strings, and the oracle replays the same hash
    # (shingle arrays are distinct per doc, so sizes are set cardinalities)
    if shingle_arrays is not None:
        # map-only off the shared per-doc arrays (r13 fast path)
        arrays = shingle_arrays.select(
            "id", shingle_hash_arrow()(F.col("shs")).alias("shs")
        )
    elif shingle_df is not None:
        arrays = (
            shingle_df.groupBy("id")
            .agg(F.collect_list("g").alias("shs"))
            .select("id", shingle_hash_arrow()(F.col("shs")).alias("shs"))
        )
    else:
        arrays = spread_narrow(
            df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        ).select("id", hashed_shingles_arrow(n)(F.col("t")).alias("shs"))

    if candidates is None:
        # The exact path reads the shingle arrays four times (frequency,
        # ranking, both verify sides); persist so shingling runs once —
        # standard for a multi-pass set-similarity join (spills to disk if
        # the relation outgrows executor memory).
        from pyspark.sql import Window

        arrays = persisted(arrays)
        sh = arrays.select("id", F.explode("shs").alias("sh"))
        df_freq = sh.groupBy("sh").agg(F.count("*").alias("df_sh"))
        # integer-exact prefix length: n_sh - ceil(tau_num*n_sh/tau_den) + 1.
        # n_sh comes from a COUNT window over the same id partition the
        # ranking shuffles on — no extra join back to the arrays relation.
        by_id = Window.partitionBy("id")
        ranked = (
            sh.join(df_freq, "sh")
            .withColumn("rk", F.row_number().over(by_id.orderBy("df_sh", "sh")))
            .withColumn("n_sh", F.count("*").over(by_id))
            .withColumn(
                "pref_len",
                F.col("n_sh")
                - ((tau_num * F.col("n_sh") + tau_den - 1) / tau_den).cast("long")
                + 1,
            )
            .filter(F.col("rk") <= F.col("pref_len"))
            .select("id", "sh", "rk", "n_sh")
            # prefix index feeds both self-join sides; persist so the
            # freq-join + ranking window runs once, not once per side
        )
        ranked = persisted(ranked)
        pa = ranked.select(
            F.col("id").alias("a_id"),
            F.col("sh").alias("sh_a"),
            F.col("rk").alias("rk_a"),
            F.col("n_sh").alias("n_a"),
        )
        pb = ranked.select(
            F.col("id").alias("b_id"),
            F.col("sh").alias("sh_b"),
            F.col("rk").alias("rk_b"),
            F.col("n_sh").alias("n_b"),
        )
        # equivalent-overlap bound: jaccard >= tau  <=>  inter >= tau/(1+tau)
        # * (n_a + n_b), integer-exact as ceil(tau_num*(n_a+n_b)/(tau_num+
        # tau_den)); a prefix match at (rk_a, rk_b) caps achievable overlap
        # at 1 + min(suffix_a, suffix_b).
        need = (
            (tau_num * (F.col("n_a") + F.col("n_b")) + tau_num + tau_den - 1)
            / (tau_num + tau_den)
        ).cast("long")
        ub = 1 + F.least(
            F.col("n_a") - F.col("rk_a"), F.col("n_b") - F.col("rk_b")
        )
        cand = (
            pa.join(
                pb,
                (F.col("sh_a") == F.col("sh_b"))
                & (F.col("a_id") < F.col("b_id"))
                # length filter: inter <= min(n), union >= max(n)
                & (
                    tau_den * F.least(F.col("n_a"), F.col("n_b"))
                    >= tau_num * F.greatest(F.col("n_a"), F.col("n_b"))
                )
                # positional filter
                & (ub >= need),
            )
            .select("a_id", "b_id")
            .distinct()
        )
    else:
        cand = candidates.select("a_id", "b_id")

    av = arrays.select(F.col("id").alias("a_id"), F.col("shs").alias("shs_a"))
    bv = arrays.select(F.col("id").alias("b_id"), F.col("shs").alias("shs_b"))
    return (
        cand.join(av, "a_id")
        .join(bv, "b_id")
        .withColumn(
            "inter", F.size(F.array_intersect("shs_a", "shs_b")).cast("long")
        )
        .withColumn(
            "union",
            (F.size("shs_a") + F.size("shs_b")).cast("long") - F.col("inter"),
        )
        # union > 0 excludes empty-shingle docs (sub-n-token texts), which
        # the join-based counter never emitted either
        .filter(
            (F.col("union") > 0)
            & (tau_den * F.col("inter") >= tau_num * F.col("union"))
        )
        .select(
            "a_id",
            "b_id",
            "inter",
            "union",
            dround(F.col("inter") / F.col("union"), 6).alias("jaccard"),
        )
    )


def _md5_hash_parts(tok: Column) -> tuple[Column, Column]:
    """(hi32, lo32) of a 64-bit token hash derived from md5 — the
    cross-engine-reproducible base hash (xxhash64 has no DuckDB twin, so
    the oracle could only rows-check; md5 makes SimHash value-exact).
    Two 32-bit halves keep every conv() result far from long overflow."""
    hx = F.md5(tok.cast("binary"))
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    return hi, lo


def _token_bit_from_parts(hi: Column, lo: Column, i: int) -> Column:
    """±1 for bit ``i`` (0-based) of the (hi, lo) 64-bit token hash."""
    on = (
        lo.bitwiseAND(F.lit(1 << i)) != 0
        if i < 32
        else hi.bitwiseAND(F.lit(1 << (i - 32))) != 0
    )
    return F.when(on, 1).otherwise(-1)


def simhash_signatures_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 64,
) -> DataFrame:
    """(id, sig) per document; sig is a ``num_bits``-char '0'/'1' string.

    Classic SimHash: per token a 64-bit md5-derived hash; signature bit i = 1 iff
    sum over tokens of (2*bit_i(h) - 1) > 0 (ties → 0). Fast path: explode
    tokens, derive the 64 ±1 bit columns as codegen'd projections, reduce
    with 64 sum aggregates (map-side partial combine ⇒ one doc-id-keyed
    shuffle of 64 ints per doc — linear at any scale, no interpreted lambdas).
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok"),
    )
    hi, lo = _md5_hash_parts(F.col("tok"))
    toks = toks.select("id", hi.alias("hh"), lo.alias("hl"))
    per_tok = toks.select(
        "id",
        *[
            _token_bit_from_parts(F.col("hh"), F.col("hl"), i).alias(f"b{i}")
            for i in range(num_bits)
        ],
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


def simhash_signatures_arrow(num_bits: int = 64):
    """Arrow-batched twin of ``simhash_signatures_df``'s per-doc kernel:
    text -> the ``num_bits``-char '0'/'1' SimHash string in ONE vectorized
    pass (md5 per token via hashlib — identical bytes/hex to Spark's
    ``md5(cast binary)`` on UTF-8 strings — then a (tokens x bits) ±1 sum
    in numpy).  Value-identity with the exploded 64-sum-aggregate form is
    pinned by tests/test_dedup.py.

    Why (r13, guide §8 "move the work to one vectorized pass"): the
    exploded form shuffles tokens x 64 ±1 ints into a 64-aggregate
    groupBy — correct and linear, but the shuffle and the 64-wide codegen
    dominate the query at every SF.  This form is map-only: signatures
    never leave the scan stage, and only (id, 64-char sig) rows flow on.
    """
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def f(texts: pd.Series) -> pd.Series:
        shifts = np.arange(num_bits, dtype=np.uint64)
        out = []
        for t in texts:
            if t is None:
                # the exploded form's explode(split(trim(NULL))) dropped
                # the doc entirely; a NULL signature keeps that edge —
                # every downstream consumer joins on signature equality,
                # where NULL never matches (ADVICE r13)
                out.append(None)
                continue
            # strip ' ' only: F.trim removes spaces, not \t/\n/unicode
            toks = t.strip(" ").split(" ")
            hs = np.array(
                [
                    int(hashlib.md5(tok.encode()).hexdigest()[:16], 16)
                    for tok in toks
                ],
                dtype=np.uint64,
            )
            # bit i of (hi<<32)|lo == _token_bit_from_parts(hi, lo, i)
            bits = (hs[:, None] >> shifts) & np.uint64(1)
            sums = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            out.append("".join("1" if s > 0 else "0" for s in sums))
        return pd.Series(out)

    return f


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
            F.array(
                *[
                    _token_bit_from_parts(*_md5_hash_parts(t), i).cast("long")
                    for i in range(num_bits)
                ]
            ),
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
    # map-only Arrow signature pass (r13; was the exploded 64-aggregate
    # form — same values, test-pinned).  The corpus parquet arrives as
    # one split at local SFs, which would serialize the Arrow pass into
    # a single Python worker; spread the text rows to the session's
    # parallelism first when the scan is narrower than that (at real
    # scale the scan already has more splits than cores and this is a
    # no-op).
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    par = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    sig = src.select("id", simhash_signatures_arrow(num_bits)(F.col("t")).alias("sig"))
    # Pack each chunk of the bit string into a LONG: long join keys beat
    # 16-char strings, and hamming becomes bit_count(xor) — whole-stage
    # codegen instead of interpreted split/zip_with HOFs (~3x on the pair
    # path, measured at sf0.1).
    ccols = [f"c{c}" for c in range(chunks)]
    packed = sig.select(
        "id",
        *[
            F.conv(F.substring("sig", c * chunk_len + 1, chunk_len), 2, 10)
            .cast("long")
            .alias(f"c{c}")
            for c in range(chunks)
        ],
        # One row of `chunks` longs per doc; persisted so the banding
        # self-join below evaluates the token-explode/md5/64-sum signature
        # pipeline once instead of once per join side.
    )
    packed = persisted(packed)
    keyed = packed.select(
        "id",
        *ccols,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("cidx"), F.col(f"c{c}").alias("ckey"))
                    for c in range(chunks)
                ]
            )
        ).alias("ch"),
    ).select(
        "id", *ccols, F.col("ch.cidx").alias("cidx"), F.col("ch.ckey").alias("ckey")
    )
    a = keyed.select(
        F.col("id").alias("a_id"),
        *[F.col(f"c{c}").alias(f"a{c}") for c in range(chunks)],
        "cidx",
        "ckey",
    )
    b = keyed.select(
        F.col("id").alias("b_id"),
        *[F.col(f"c{c}").alias(f"b{c}") for c in range(chunks)],
        F.col("cidx").alias("cidx_b"),
        F.col("ckey").alias("ckey_b"),
    )
    cand = a.join(
        b,
        (F.col("cidx") == F.col("cidx_b"))
        & (F.col("ckey") == F.col("ckey_b"))
        & (F.col("a_id") < F.col("b_id")),
    )
    ham = sum(
        F.bit_count(F.col(f"a{c}").bitwiseXOR(F.col(f"b{c}"))) for c in range(chunks)
    )
    # filter cheap hamming first, then dedupe pairs that matched >1 chunk
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", "hamming")
    )


def exact_dedup(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact deduplication: keep one row per key (hash groupBy semantics)."""
    return df.dropDuplicates(cols)


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the near-dup pair graph: (doc_id,
    component_id) with component_id = min doc id reachable — the step that
    turns pairwise matches into dup GROUPS (keep one canonical doc per
    component, drop the rest).

    Algorithm: iterative min-label propagation. Each round every node takes
    the min of its own label and its neighbors' labels; convergence needs
    at most graph-diameter rounds, and near-dup components are small dense
    clusters (diameter 1-3), so the loop exits after 2-4 actions in
    practice. Each round is one equi-join + one groupBy — all shuffles are
    keyed on node id. ``max_iter`` bounds the worst case (a path graph);
    at extreme scale swap in star-contraction (Kiveris et al.), which needs
    O(log n) rounds, behind this same interface.

    The driver-side loop holds only per-round change COUNTS (one scalar
    action per round), never node data.  Each round's labels are
    ``localCheckpoint``-ed: iterative plans must truncate lineage, or
    analysis cost grows with every round (persist alone keeps the full
    logical plan).
    """
    fwd = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select("u").distinct().select("u", F.col("u").alias("label"))
    ).localCheckpoint()
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(
                labels.select(F.col("u").alias("v"), F.col("label").alias("vlabel")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vlabel").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(F.col("label"), F.coalesce("nmin", F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("new_label") < F.col("label")).count()
        labels = new_labels.select("u", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels.select(
        F.col("u").alias("doc_id"), F.col("label").alias("component_id")
    )


def packed_hamming_near_dup_pairs(
    sig_df: DataFrame,
    id_col: str = "id",
    sig_col: str = "sig",
    max_hamming: int = 3,
    chunks: int = 4,
    num_bits: int = 64,
) -> DataFrame:
    """Near-dup pairs over PACKED-LONG signatures (one int64 per item —
    SimHash, image dHash/pHash, sign-bit embeddings) via Manku-style
    chunk banding.

    Pigeonhole guarantee: a pair within ``max_hamming <= chunks - 1``
    must agree on at least one chunk, so the band join is COMPLETE at
    the default (4 chunks, distance 3); larger distances trade recall
    (same documented trade-off as ``simhash_near_dup_pairs``).

    Shuffle profile at 100 TB: the only wide op is the equi-self-join on
    (chunk index, 16-bit chunk value) — never all-pairs; the exact
    distance check is ``bit_count(a ^ b)`` (XOR+POPCNT in whole-stage
    codegen, the hamming_ann_topk kernel) on the already-joined rows.
    Signatures are 8 bytes/item, so the banded relation is ~32
    bytes/item regardless of source payload size.
    """
    chunk_len = num_bits // chunks
    mask = (1 << chunk_len) - 1
    packed = sig_df.select(
        F.col(id_col).alias("id"), F.col(sig_col).cast("long").alias("sig")
    )
    # evaluate the signature pipeline ONCE: both sides of the band
    # self-join read the persisted 8-bytes-per-item relation instead of
    # re-running the upstream decode/hash (same rationale as
    # simhash_near_dup_pairs — at 100 TB the upstream pass dominates)
    packed = persisted(packed)
    keyed = packed.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("cidx"),
                        F.shiftrightunsigned("sig", c * chunk_len)
                        .bitwiseAND(F.lit(mask))
                        .alias("ckey"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("ch"),
    ).select("id", "sig", F.col("ch.cidx").alias("cidx"), F.col("ch.ckey").alias("ckey"))
    a = keyed.select(
        F.col("id").alias("a_id"), F.col("sig").alias("a_sig"), "cidx", "ckey"
    )
    b = keyed.select(
        F.col("id").alias("b_id"),
        F.col("sig").alias("b_sig"),
        F.col("cidx").alias("cidx_b"),
        F.col("ckey").alias("ckey_b"),
    )
    return (
        a.join(
            b,
            (F.col("cidx") == F.col("cidx_b"))
            & (F.col("ckey") == F.col("ckey_b"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .withColumn(
            "hamming",
            F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig"))).cast("bigint"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", "hamming")
    )
