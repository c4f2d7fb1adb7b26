"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the 100 TB scale path (bucket join instead of cross join).

All vector math is Column-expression level (`zip_with` + `aggregate`) in
double precision — JVM-side, codegen'd, no Python UDFs. Sequential left-fold
summation makes the result order-deterministic and reproducible in the
DuckDB oracle (unnest-with-ordinality dot products).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kyuubi_spark.functions.compat import dround


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _dot_pre(a: Column, b: Column) -> Column:
    """Dot product of already-double arrays (no per-pair cast)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _with_vec_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    """Project (id, double-cast vector, norm) ONCE per row.

    Higher-order vector expressions are interpreted (not codegen'd), so
    hoisting the cast + norm out of an O(n²) pair join removes ~4/5 of the
    per-pair interpreted work; arithmetic is unchanged (same sequential fold,
    same dot/(na*nb) association) so scores stay bit-identical to the naive
    form and to the DuckDB oracle.
    """
    vd = _as_double(F.col(vec_col))
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"), vd.alias(f"{prefix}_vec")
    ).withColumn(
        f"{prefix}_nrm",
        F.sqrt(
            F.aggregate(
                F.col(f"{prefix}_vec"), F.lit(0.0), lambda acc, x: acc + x * x
            )
        ),
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k neighbors for each query vector.

    Plan shape: broadcast the (small) query set against the embedding table —
    a map-side nested loop scan, then per-query top-k via window. At 100 TB
    the scan is embarrassingly parallel; the only shuffle is the final
    window partition-by-query (tiny: n_queries * n_candidates_per_part rows
    after partial top-k… Spark's TakeOrderedAndProject handles the rest).

    Ranking key is the score ROUNDED to 6 decimals with id tiebreak, so the
    selected neighbor set is engine-independent.
    """
    from pyspark.sql import Window

    q = _with_vec_norm(queries, id_col, vec_col, "query")
    c = _with_vec_norm(embeddings, id_col, vec_col, "neighbor")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "score",
            dround(
                _dot_pre(F.col("query_vec"), F.col("neighbor_vec"))
                / (F.col("query_nrm") * F.col("neighbor_nrm")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def _seq_dot(products: "np.ndarray") -> "np.ndarray":
    """Sequential-order row sums: cumsum's last column is the exact left
    fold (each prefix is one IEEE add), bit-identical to the Spark
    `aggregate` fold and the DuckDB list_sum oracle — unlike BLAS matmul or
    np.sum, whose pairwise/SIMD association differs in the last ulp."""
    return products.cumsum(axis=1)[:, -1]


def _round_half_away(y: "np.ndarray") -> "np.ndarray":
    """Exact ROUND-half-away-from-zero on the double's true value, matching
    Spark's BigDecimal HALF_UP and DuckDB's std::round (np.round is
    half-to-even; floor(y+0.5) can mis-round when y+0.5 is inexact)."""
    t = np.trunc(y)
    return t + np.sign(y) * (np.abs(y - t) >= 0.5)


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold_rounded: float = 0.15,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 16,
) -> DataFrame:
    """All pairs with round(cosine,6) >= threshold (embedding near-dup).

    Exact all-pairs — the correctness baseline (LSH/IVF are the sub-linear
    scale paths). Physical shape: distributed block-pair join. Rows are
    hashed into ``n_blocks`` blocks; each unordered block pair (i <= j)
    becomes one applyInPandas group holding block i as the "lo" side and
    block j as the "hi" side, so every unordered row pair is scored in
    exactly one task. Work per task is O((n/B)^2); nothing is collected to
    the driver and no executor ever holds more than two blocks — at 100 TB
    raise ``n_blocks`` so a block fits an executor (shuffle volume grows
    linearly, O(n * B) replicated rows).

    Scores use sequential-order sums and half-away rounding, bit-identical
    to the expression path and the DuckDB oracle (cross-checked in tests).
    """
    import pandas as pd  # noqa: F811 - explicit for the worker closure
    from pyspark.sql import types as T

    thr = float(threshold_rounded)
    nb = int(n_blocks)

    base = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("blk", F.pmod(F.hash(F.col("id")), F.lit(nb)).cast("int"))
    # A row in block b participates as the lo side of pairs (b, j>=b) and as
    # the hi side of strictly-off-diagonal pairs (i<b, b); only pairs with
    # pi <= pj exist, so each unordered pair of rows lands in exactly one
    # group. Diagonal groups (b, b) use their side-0 rows for both matrix
    # sides, so shipping a side-1 copy there would be pure wasted shuffle;
    # the filter (not sequence(0, blk-1)) excludes it because Spark emits a
    # DESCENDING sequence when blk=0.
    lo = base.withColumn(
        "pj", F.explode(F.sequence(F.col("blk"), F.lit(nb - 1)))
    ).select(
        F.col("blk").alias("pi"), "pj", "id", "vec", F.lit(0).alias("side")
    )
    hi = (
        base.withColumn("pi", F.explode(F.sequence(F.lit(0), F.col("blk"))))
        .filter(F.col("pi") < F.col("blk"))
        .select(
            "pi", F.col("blk").alias("pj"), "id", "vec", F.lit(1).alias("side")
        )
    )

    def score_group(key, pdf):
        pi, pj = int(key[0]), int(key[1])
        diagonal = pi == pj
        if diagonal:
            a_pdf = pdf[pdf["side"] == 0]
            b_pdf = a_pdf
        else:
            a_pdf = pdf[pdf["side"] == 0]
            b_pdf = pdf[pdf["side"] == 1]
        if len(a_pdf) == 0 or len(b_pdf) == 0:
            return pd.DataFrame({"a_id": [], "b_id": [], "score": []}).astype(
                {"a_id": "int64", "b_id": "int64", "score": "float64"}
            )
        a_ids = a_pdf["id"].to_numpy()
        a_mat = np.array(a_pdf["vec"].tolist(), dtype="float64")
        a_norms = np.sqrt(_seq_dot(a_mat * a_mat))
        b_ids = b_pdf["id"].to_numpy()
        b_mat = np.array(b_pdf["vec"].tolist(), dtype="float64")
        b_norms = np.sqrt(_seq_dot(b_mat * b_mat))
        out_a, out_b, out_s = [], [], []
        for i in range(len(a_ids)):
            # Diagonal groups hold the same rows on both sides: id ordering
            # dedups. Cross-block groups score every lo x hi pair once
            # (blocks from pmod(hash(id), nb) are disjoint id sets — id_col
            # must be unique int64, per the LongType output schema) and
            # normalize (a_id, b_id) = (min, max) afterwards.
            if diagonal:
                mask = b_ids > a_ids[i]
                if not mask.any():
                    continue
                sel_ids, sel_mat, sel_norms = b_ids[mask], b_mat[mask], b_norms[mask]
            else:
                sel_ids, sel_mat, sel_norms = b_ids, b_mat, b_norms
            prods = sel_mat * a_mat[i][None, :]
            dots = _seq_dot(prods)
            scores = dots / (a_norms[i] * sel_norms)
            scores = _round_half_away(scores * 1e6) / 1e6
            keep = scores >= thr
            out_a.append(np.full(int(keep.sum()), a_ids[i]))
            out_b.append(sel_ids[keep])
            out_s.append(scores[keep])
        if not out_a:
            return pd.DataFrame({"a_id": [], "b_id": [], "score": []}).astype(
                {"a_id": "int64", "b_id": "int64", "score": "float64"}
            )
        x = np.concatenate(out_a)
        y = np.concatenate(out_b)
        return pd.DataFrame(
            {
                "a_id": np.minimum(x, y),
                "b_id": np.maximum(x, y),
                "score": np.concatenate(out_s),
            }
        )

    schema = T.StructType(
        [
            T.StructField("a_id", T.LongType()),
            T.StructField("b_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    return (
        lo.unionByName(hi)
        .groupBy("pi", "pj")
        .applyInPandas(score_group, schema)
    )


def cosine_near_dup_pairs_expr(
    embeddings: DataFrame,
    threshold_rounded: float = 0.15,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pure Column-expression form of cosine_near_dup_pairs (interpreted
    fold in a pair join) — kept as the semantic reference; tests assert the
    vectorized path is bit-identical."""
    a = _with_vec_norm(embeddings, id_col, vec_col, "a")
    b = _with_vec_norm(embeddings, id_col, vec_col, "b")
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .withColumn(
            "score",
            dround(
                _dot_pre(F.col("a_vec"), F.col("b_vec"))
                / (F.col("a_nrm") * F.col("b_nrm")),
                6,
            ),
        )
        .filter(F.col("score") >= threshold_rounded)
        .select("a_id", "b_id", "score")
    )


def random_hyperplane_buckets(
    vec: Column, n_planes: int = 8, dim: int = 64
) -> Column:
    """Sign-random-projection LSH bucket id (string of sign bits).

    Hyperplane p's weight for dimension d is derived deterministically from
    md5(p:d) — reproducible across runs and engines, no stored model. The
    weight is (hexval(first hex char) - 7.5): zero-mean, fixed variance —
    adequate for SRP bucketing.
    """
    def weight(p: int, d: Column) -> Column:
        h = F.md5(F.concat(F.lit(f"{p}:"), d.cast("string")).cast("binary"))
        return (
            F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
        ).cast("double") - 7.5

    dv = _as_double(vec)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    dv,
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda d: weight(p, d),
                    ),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in range(n_planes)
    ]
    return F.concat(*bits)


def srp_buckets_df(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) via the exploded codegen fast path — the 100 TB shape.

    ``random_hyperplane_buckets`` evaluates an interpreted 8x64 lambda per
    row; here we posexplode to (id, dim, x) and reduce with ``n_planes``
    map-side-combined SUM aggregates — whole-stage codegen, one id-keyed
    shuffle of 8 decimals per row.

    Projections run in DECIMAL fixed point (x quantized to 12 digits,
    weights are exact halves), so the sums are ORDER-INDEPENDENT — any
    partitioning, any engine, bit-identical sign bits. Weights come from
    the same md5(plane:dim) formula, materialized driver-side with hashlib
    (identical digests) into literal arrays: no join, no broadcast.
    """
    import hashlib

    weights = [
        [
            float(int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16)) - 7.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]
    w_arrays = [
        F.array(*[F.lit(w).cast("decimal(3,1)") for w in row]) for row in weights
    ]
    ex = embeddings.select(
        F.col(id_col).alias("id"), F.posexplode(vec_col).alias("d", "xf")
    ).select(
        "id", "d", F.col("xf").cast("double").cast("decimal(18,12)").alias("x")
    )
    sums = ex.groupBy("id").agg(
        *[
            F.sum(F.col("x") * F.element_at(w_arrays[p], F.col("d") + 1)).alias(f"s{p}")
            for p in range(n_planes)
        ]
    )
    bucket = F.concat(
        *[
            F.when(F.col(f"s{p}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for p in range(n_planes)
        ]
    )
    return sums.select("id", bucket.alias("bucket"))


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's SRP bucket.

    Scale path: the cross join becomes an equi-join on bucket id — shuffle
    keyed on a uniform 2^n_planes-way bucket. Recall < 1.0 by construction;
    tests measure recall against cosine_topk.
    """
    from pyspark.sql import Window

    buckets = srp_buckets_df(embeddings, n_planes, dim, id_col, vec_col)
    # (id, vec, norm, bucket) feeds BOTH the query side and the candidate
    # side; lazy localCheckpoint materializes the norm+projection work once
    # instead of recomputing the embedding scan per consumer.
    emb_b = (
        _with_vec_norm(embeddings, id_col, vec_col, "e")
        .join(buckets, F.col("e_id") == F.col("id"))
        .drop("id")
        .localCheckpoint(eager=False)
    )
    q = emb_b.select(
        F.col("e_id").alias("query_id"),
        F.col("e_vec").alias("query_vec"),
        F.col("e_nrm").alias("query_nrm"),
        F.col("bucket").alias("q_bucket"),
    ).join(queries.select(F.col(id_col).alias("query_id")).distinct(), "query_id")
    c = emb_b.select(
        F.col("e_id").alias("neighbor_id"),
        F.col("e_vec").alias("neighbor_vec"),
        F.col("e_nrm").alias("neighbor_nrm"),
        F.col("bucket").alias("c_bucket"),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("q_bucket") == F.col("c_bucket"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn(
            "score",
            dround(
                _dot_pre(F.col("query_vec"), F.col("neighbor_vec"))
                / (F.col("query_nrm") * F.col("neighbor_nrm")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def contrastive_pairs(
    embeddings: DataFrame,
    anchors: DataFrame,
    pos_min: float = 0.15,
    neg_min: float = 0.0,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Training-pair mining for contrastive embedding fine-tuning.

    For each anchor vector: positives = same-SRP-bucket candidates with
    rounded cosine >= ``pos_min``; HARD negatives = same-bucket
    candidates with cosine in [``neg_min``, ``pos_min``) — vectors that
    collide in the ANN index (plausible) yet are not near-duplicates,
    exactly the negatives that sharpen a contrastive loss (easy negatives
    from random sampling carry no gradient).  Below ``neg_min`` the
    candidate is dropped as an easy negative.

    100 TB shape: identical to cosine_topk_lsh's — SRP bucketing is one
    map-side-combined aggregate, candidates come from the bucket
    EQUI-join (never all-pairs), anchors broadcast.  Output is directed
    (anchor → pair).
    """
    buckets = srp_buckets_df(embeddings, n_planes, dim, id_col, vec_col)
    emb_b = (
        _with_vec_norm(embeddings, id_col, vec_col, "e")
        .join(buckets, F.col("e_id") == F.col("id"))
        .drop("id")
        .localCheckpoint(eager=False)
    )
    a = emb_b.select(
        F.col("e_id").alias("anchor_id"),
        F.col("e_vec").alias("anchor_vec"),
        F.col("e_nrm").alias("anchor_nrm"),
        F.col("bucket").alias("a_bucket"),
    ).join(anchors.select(F.col(id_col).alias("anchor_id")).distinct(), "anchor_id")
    c = emb_b.select(
        F.col("e_id").alias("pair_id"),
        F.col("e_vec").alias("pair_vec"),
        F.col("e_nrm").alias("pair_nrm"),
        F.col("bucket").alias("c_bucket"),
    )
    scored = c.join(
        F.broadcast(a),
        (F.col("a_bucket") == F.col("c_bucket"))
        & (F.col("anchor_id") != F.col("pair_id")),
    ).withColumn(
        "score",
        dround(
            _dot_pre(F.col("anchor_vec"), F.col("pair_vec"))
            / (F.col("anchor_nrm") * F.col("pair_nrm")),
            6,
        ),
    )
    return (
        scored.withColumn(
            "pair_type",
            F.when(F.col("score") >= pos_min, F.lit("pos")).when(
                F.col("score") >= neg_min, F.lit("hardneg")
            ),
        )
        .filter(F.col("pair_type").isNotNull())
        .select("anchor_id", "pair_id", "pair_type", "score")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate nearest neighbor
# ---------------------------------------------------------------------------
def ivf_assign(
    embeddings: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list]:
    """Coarse quantizer: deterministic centroid sample + nearest-cell assign.

    Centroids are the first vector of every (id % stride) class — a
    deterministic stand-in for k-means that needs no training job; swap in
    `pyspark.ml.clustering.KMeans` for learned centroids. Assignment is one
    vectorized Arrow-batched pandas pass: a (batch x dim) @ (dim x cells)
    matmul per batch — the documented fast path for per-row vector math
    that expression folds can't match.

    Returns (assigned DataFrame with a `cell` column, centroid matrix).
    """
    from pyspark.sql.functions import pandas_udf

    cents = (
        embeddings.filter((F.col(id_col) % n_cells) == 0)
        .orderBy(id_col)
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    centroids = np.array([list(r[0]) for r in cents], dtype="float64")
    centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    bc = embeddings.sparkSession.sparkContext.broadcast(centroids)

    @pandas_udf("int")
    def nearest_cell(vecs: pd.Series) -> pd.Series:
        c = bc.value
        m = np.array(vecs.tolist(), dtype="float64")
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ c.T, axis=1).astype("int32"))

    return embeddings.withColumn("cell", nearest_cell(F.col(vec_col))), centroids


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: probe the query's ``n_probe`` nearest cells, exact-rerank
    candidates. The 100 TB path: candidate scan is (n_probe/n_cells) of the
    corpus, and the join is an equi-join on cell id (uniform shuffle key)
    instead of a cross join. Recall grows with n_probe (tests measure it
    against brute force).
    """
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    assigned, centroids = ivf_assign(embeddings, n_cells, id_col, vec_col)
    bc = embeddings.sparkSession.sparkContext.broadcast(centroids)

    @pandas_udf(ArrayType(IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        c = bc.value
        m = np.array(vecs.tolist(), dtype="float64")
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ c.T), axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    q = _with_vec_norm(queries, id_col, vec_col, "query").withColumn(
        "cell", F.explode(probe_cells(F.col("query_vec")))
    )
    c = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("neighbor_vec"),
        F.col("cell").alias("ncell"),
    ).withColumn(
        "neighbor_nrm",
        F.sqrt(
            F.aggregate(F.col("neighbor_vec"), F.lit(0.0), lambda acc, x: acc + x * x)
        ),
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("cell") == F.col("ncell"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .withColumn(
            "score",
            dround(
                _dot_pre(F.col("query_vec"), F.col("neighbor_vec"))
                / (F.col("query_nrm") * F.col("neighbor_nrm")),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "score")
        .distinct()  # a pair may appear via multiple probed cells
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# SemDeDup-style semantic deduplication (cluster-scoped cosine near-dup)
# ---------------------------------------------------------------------------
def semantic_dedup_pairs(
    embeddings: DataFrame,
    k_clusters: int = 8,
    threshold_rounded: float = 0.15,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-scoped semantic near-dup pairs (Abbas et al., SemDeDup).

    Stage 1 assigns every vector to its nearest centroid; stage 2 scores
    cosine only WITHIN each cluster, so total pair work drops from O(n²)
    to O(n²/k) — with k ~ sqrt(n) clusters the per-cluster blocks stay
    bounded as the corpus grows, which is exactly how the published recipe
    scales to billions of embeddings.  Returns (cluster, a_id, b_id,
    score) for every in-cluster pair with round(cos, 6) >= threshold.

    Spark shape: centroids are the first ``k_clusters`` vectors by id (a
    deterministic stand-in for a k-means fit, same convention as
    ``ivf_assign``), broadcast to a vectorized Arrow pass that computes the
    ROUNDED-cosine argmax per batch; in-cluster scoring is one
    ``groupBy(cluster).applyInPandas`` — a single shuffle keyed on cluster
    id.  All float math uses the sequential-fold cumsum + half-away
    rounding helpers, so scores and assignments are bit-identical to the
    expression form and the DuckDB oracle.
    """
    from pyspark.sql.functions import pandas_udf

    cents = (
        embeddings.filter(F.col(id_col) < k_clusters)
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    cmat = np.array([list(r[0]) for r in cents], dtype="float64")
    cnrm = np.sqrt(_seq_dot(cmat * cmat))
    bc = embeddings.sparkSession.sparkContext.broadcast((cmat, cnrm))

    @pandas_udf("int")
    def nearest_centroid(vecs: pd.Series) -> pd.Series:
        c, cn = bc.value
        m = np.array(vecs.tolist(), dtype="float64")
        nrm = np.sqrt(_seq_dot(m * m))
        # sequential-fold dot per (row, centroid): cumsum over the dim axis
        dots = (m[:, None, :] * c[None, :, :]).cumsum(axis=2)[:, :, -1]
        scores = dots / (nrm[:, None] * cn[None, :])
        scores = _round_half_away(scores * 1e6) / 1e6
        # argmax returns the FIRST max -> lowest centroid id wins ties,
        # matching ROW_NUMBER() ... ORDER BY score DESC, c_id ASC
        return pd.Series(np.argmax(scores, axis=1).astype("int32"))

    assigned = embeddings.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("vec"),
        nearest_centroid(F.col(vec_col)).alias("cluster"),
    )

    out_schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType()),
            T.StructField("a_id", T.LongType()),
            T.StructField("b_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def score_cluster(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        ids = pdf["id"].to_numpy()
        m = np.array(pdf["vec"].tolist(), dtype="float64")
        n = len(ids)
        if n < 2:
            return pd.DataFrame(columns=["cluster", "a_id", "b_id", "score"])
        nrm = np.sqrt(_seq_dot(m * m))
        ai, bi = np.triu_indices(n, k=1)
        dots = _seq_dot(m[ai] * m[bi])
        scores = _round_half_away(dots / (nrm[ai] * nrm[bi]) * 1e6) / 1e6
        keep = scores >= threshold_rounded
        return pd.DataFrame(
            {
                "cluster": np.full(keep.sum(), key[0], dtype="int32"),
                "a_id": ids[ai[keep]],
                "b_id": ids[bi[keep]],
                "score": scores[keep],
            }
        )

    return assigned.groupBy("cluster").applyInPandas(score_cluster, out_schema)


def label_noise_knn(
    embeddings: DataFrame,
    k_clusters: int = 8,
    k_neighbors: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Confident-learning-style label-noise screen: each point's label is
    compared to the MAJORITY label of its k nearest neighbors (rounded
    cosine), with neighbor search scoped to the point's nearest-centroid
    cluster — the same O(n²/k) bound SemDeDup uses, so the audit scales
    the same way the dedup pass does.

    Returns (id, label, maj_label) per point.  Deterministic everywhere:
    centroids are the first ``k_clusters`` vectors (ivf_assign
    convention), scores round half-away at 6dp before ranking, neighbor
    ties break on ascending id, majority ties on ascending label.
    """
    from pyspark.sql.functions import pandas_udf

    cents = (
        embeddings.filter(F.col(id_col) < k_clusters)
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    cmat = np.array([list(r[0]) for r in cents], dtype="float64")
    cnrm = np.sqrt(_seq_dot(cmat * cmat))
    bc = embeddings.sparkSession.sparkContext.broadcast((cmat, cnrm))

    @pandas_udf("int")
    def nearest_centroid(vecs: pd.Series) -> pd.Series:
        c, cn = bc.value
        m = np.array(vecs.tolist(), dtype="float64")
        nrm = np.sqrt(_seq_dot(m * m))
        dots = (m[:, None, :] * c[None, :, :]).cumsum(axis=2)[:, :, -1]
        scores = dots / (nrm[:, None] * cn[None, :])
        scores = _round_half_away(scores * 1e6) / 1e6
        return pd.Series(np.argmax(scores, axis=1).astype("int32"))

    assigned = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("int").alias("label"),
        _as_double(F.col(vec_col)).alias("vec"),
        nearest_centroid(F.col(vec_col)).alias("cluster"),
    )

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("label", T.IntegerType()),
            T.StructField("maj_label", T.IntegerType()),
        ]
    )

    def vote_cluster(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        ids = pdf["id"].to_numpy()
        labels = pdf["label"].to_numpy()
        m = np.array(pdf["vec"].tolist(), dtype="float64")
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"id": ids, "label": labels, "maj_label": labels}
            )
        nrm = np.sqrt(_seq_dot(m * m))
        mask = ~np.eye(n, dtype=bool)
        ai, bi = np.where(mask)
        dots = _seq_dot(m[ai] * m[bi])
        scores = _round_half_away(dots / (nrm[ai] * nrm[bi]) * 1e6) / 1e6
        smat = np.zeros((n, n))
        smat[ai, bi] = scores
        maj = np.empty(n, dtype="int32")
        k = min(k_neighbors, n - 1)
        for i in range(n):
            others = np.arange(n) != i
            cand = np.arange(n)[others]
            # (-score, id): highest score first, ascending id on ties
            order = np.lexsort((ids[cand], -smat[i, cand]))
            top = cand[order[:k]]
            counts = np.bincount(labels[top])
            maj[i] = int(np.argmax(counts))  # first max = smallest label
        return pd.DataFrame({"id": ids, "label": labels, "maj_label": maj})

    return assigned.groupBy("cluster").applyInPandas(
        vote_cluster, schema=out_schema
    )
