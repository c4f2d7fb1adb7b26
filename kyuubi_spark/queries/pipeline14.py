"""Round-13 depth queries: production-capped dedup, multimodal refresh,
and streaming near-dup — the three compositions VERDICT r12 ranked as
the remaining high-impact shapes.

- ``dedup_lsh_recall_report_capped``: the PRODUCTION form of the LSH
  evaluation loop.  The uncapped report's verification stage is
  Θ(candidate pairs) by design — the right recall contract for an
  evaluation query, but a data-construction quadratic on a replicated
  corpus (every content cluster grows with the corpus factor, so
  within-bucket pairs grow ~factor²).  Production dedup bounds that by
  CAPPING each band bucket: rank the bucket's docs by a salted hash,
  pair only the top CAP, and REPORT the coverage the cap cost
  (bucket-level pair coverage + over-cap bucket count) instead of
  silently dropping work.  Verified pairs per bucket are then O(CAP²)
  regardless of cluster growth — the wall scales with corpus size, not
  cluster size² (second-decade exponent bound 1.2 vs the uncapped 2.0).

Reference intent: the dedup/eval loop every training-data pipeline
runs before trusting banding parameters at corpus scale (same surface
as dedup_lsh_recall_report, queries/pipeline.py); capping mirrors how
production MinHash dedup services bound verification cost per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kyuubi_spark.scratch import scratch_dir
from pyspark.sql import functions as F

from kyuubi_spark.functions import dedup as D
from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.queries.pipeline import _MINHASH_PAIRS_CTE, _SHINGLE_CTE
from kyuubi_spark.queries.pipeline13 import _REFRESH_CTE
from kyuubi_spark.session import load_table

_CAP = 8
_CAP_SALT = "cap-v1:"

# Banding prefix shared with _MINHASH_PAIRS_CTE (pipeline.py), extended
# with the per-bucket salted-hash rank the cap needs.
_CAPPED_BAND_CTE = f"""{_SHINGLE_CTE},
    sig AS (
      SELECT id,
             list_transform(generate_series(0, 15),
               s -> list_min(list_transform(shs,
                     g -> (('0x' || substring(md5(g), 1, 12))::BIGINT
                           + s * ('0x' || substring(md5(g), 13, 12))::BIGINT)
                          & 281474976710655))) AS sig
      FROM sh),
    banded AS (
      SELECT id, b AS band, sig[b*2+1] AS k0, sig[b*2+2] AS k1
      FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
    rk AS (
      SELECT id, band, k0, k1,
             ROW_NUMBER() OVER (PARTITION BY band, k0, k1
               ORDER BY ('0x' || substring(md5('{_CAP_SALT}'
                          || CAST(id AS VARCHAR)), 1, 15))::BIGINT, id)
               AS r,
             COUNT(*) OVER (PARTITION BY band, k0, k1) AS s
      FROM banded)"""


@query(
    "dedup_lsh_recall_report_capped",
    oracle=f"""
    WITH {_CAPPED_BAND_CTE},
    bstats AS (
      SELECT band, k0, k1, MAX(s) AS s, LEAST(MAX(s), {_CAP}) AS kept
      FROM rk GROUP BY 1, 2, 3),
    bs AS (
      SELECT COUNT(*) FILTER (WHERE s >= 2) AS n_buckets_pairable,
             COUNT(*) FILTER (WHERE s > {_CAP}) AS n_buckets_over_cap,
             COALESCE(SUM(s * (s - 1) // 2), 0) AS bucket_pairs_total,
             COALESCE(SUM(kept * (kept - 1) // 2), 0)
               AS bucket_pairs_kept
      FROM bstats),
    cand AS (
      SELECT DISTINCT l.id AS a_id, r2.id AS b_id
      FROM rk l
      JOIN rk r2 ON l.band = r2.band AND l.k0 = r2.k0 AND l.k1 = r2.k1
               AND l.id < r2.id
      WHERE l.r <= {_CAP} AND r2.r <= {_CAP}),
    shx AS (SELECT DISTINCT id,
                   ('0x' || substring(md5(s), 1, 15))::BIGINT AS s
            FROM (SELECT id, unnest(shs) AS s FROM sh) u),
    counts AS (SELECT id, COUNT(*) AS n_sh FROM shx GROUP BY id),
    inter AS (
      SELECT c.a_id, c.b_id, COUNT(*) AS inter
      FROM cand c
      JOIN shx sa ON sa.id = c.a_id
      JOIN shx sb ON sb.id = c.b_id AND sa.s = sb.s
      GROUP BY c.a_id, c.b_id),
    dup AS (
      SELECT i.a_id
      FROM inter i
      JOIN counts ca ON ca.id = i.a_id
      JOIN counts cb ON cb.id = i.b_id
      WHERE 4 * i.inter >= 1 * (ca.n_sh + cb.n_sh - i.inter)),
    m AS (SELECT
      (SELECT COUNT(*) FROM cand) AS n_candidates,
      (SELECT COUNT(*) FROM dup) AS n_verified)
    SELECT CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_verified AS BIGINT) AS n_verified,
           CAST(n_buckets_pairable AS BIGINT) AS n_buckets_pairable,
           CAST(n_buckets_over_cap AS BIGINT) AS n_buckets_over_cap,
           CAST(bucket_pairs_total AS BIGINT) AS bucket_pairs_total,
           CAST(bucket_pairs_kept AS BIGINT) AS bucket_pairs_kept,
           ROUND(CAST(bucket_pairs_kept AS DOUBLE)
                 / NULLIF(bucket_pairs_total, 0), 6) AS pair_coverage,
           ROUND(CAST(n_verified AS DOUBLE)
                 / NULLIF(n_candidates, 0), 6) AS verified_rate
    FROM m, bs
    """,
    doc="PRODUCTION-capped LSH dedup report (VERDICT r12 Next #5): the "
    "identical MinHash(16)/8-band kernel as dedup_lsh_recall_report, "
    "but each band bucket pairs only its top-8 docs under a salted-"
    "hash rank (a deterministic sample — unbiased w.r.t. content), "
    "and the report carries what the cap cost: bucket-level pair "
    "coverage (kept C(min(s,8),2) over total C(s,2)) and the over-cap "
    "bucket count. Verification work per bucket is O(CAP²) no matter "
    "how large a duplicate cluster grows, so the wall scales with "
    "corpus size, not cluster size² — the second-decade exponent "
    "bound is 1.2 where the uncapped evaluation documents 2.0. The "
    "exact all-pairs ground truth is deliberately absent: that is an "
    "EVALUATION-time cost (dedup_lsh_recall_report keeps it); the "
    "production loop reports coverage instead of recall.",
)
def dedup_lsh_recall_report_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_arrays_df(docs).localCheckpoint()

    # banding identical to lsh_candidate_pairs (16 hashes, 8 bands × 2
    # rows, raw long keys); the salted-hash rank + bucket size are ONE
    # window pass over the banded relation (keyed by bucket — fully
    # partitioned, no global sort)
    rows_per_band, bands = 2, 8
    banded = (
        D.minhash_signatures_df(docs, shingle_arrays=sh)
        .select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            *[
                                F.element_at(
                                    "sig", b * rows_per_band + r + 1
                                ).alias(f"k{r}")
                                for r in range(rows_per_band)
                            ],
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        )
        .select("id", "bk.*")
    )
    rank_key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(_CAP_SALT), F.col("id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    w = Window.partitionBy("band", "k0", "k1").orderBy(rank_key, "id")
    ws = Window.partitionBy("band", "k0", "k1")
    rk = (
        banded.withColumn("r", F.row_number().over(w))
        .withColumn("s", F.count(F.lit(1)).over(ws))
        .localCheckpoint()  # feeds bucket stats AND both join sides
    )

    bstats = rk.groupBy("band", "k0", "k1").agg(
        F.max("s").alias("s"),
        F.least(F.max("s"), F.lit(_CAP)).alias("kept"),
    )
    bs = bstats.agg(
        F.count_if(F.col("s") >= 2).cast("bigint")
        .alias("n_buckets_pairable"),
        F.count_if(F.col("s") > _CAP).cast("bigint")
        .alias("n_buckets_over_cap"),
        F.coalesce(
            F.sum(F.expr("s * (s - 1) DIV 2")), F.lit(0)
        ).cast("bigint").alias("bucket_pairs_total"),
        F.coalesce(
            F.sum(F.expr("kept * (kept - 1) DIV 2")), F.lit(0)
        ).cast("bigint").alias("bucket_pairs_kept"),
    )

    kept = rk.filter(F.col("r") <= _CAP)
    left = kept.select(F.col("id").alias("a_id"), "band", "k0", "k1")
    right = kept.select(
        F.col("id").alias("b_id"),
        F.col("band").alias("band_r"),
        F.col("k0").alias("k0_r"),
        F.col("k1").alias("k1_r"),
    )
    cand = (
        left.join(
            right,
            (F.col("band") == F.col("band_r"))
            & (F.col("k0") == F.col("k0_r"))
            & (F.col("k1") == F.col("k1_r"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select("a_id", "b_id")
        .distinct()
    )
    verified = D.jaccard_pairs(
        docs, cand, n=3, tau_num=1, tau_den=4, shingle_arrays=sh
    )
    n_cand = cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates")
    )
    n_ver = verified.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_verified")
    )
    return (
        n_cand.crossJoin(F.broadcast(n_ver))
        .crossJoin(F.broadcast(bs))
        .select(
            "n_candidates",
            "n_verified",
            "n_buckets_pairable",
            "n_buckets_over_cap",
            "bucket_pairs_total",
            "bucket_pairs_kept",
            dround(
                F.col("bucket_pairs_kept").cast("double")
                / F.nullif(F.col("bucket_pairs_total"), F.lit(0)),
                6,
            ).alias("pair_coverage"),
            dround(
                F.col("n_verified").cast("double")
                / F.nullif(F.col("n_candidates"), F.lit(0)),
                6,
            ).alias("verified_rate"),
        )
    )


_HEX = "0123456789abcdef"

# -- multimodal refresh funnel ------------------------------------------
# Replays of the synthetic payload arithmetic (identical to the
# image_phash_near_dup / audio_fingerprint_near_dup oracles,
# queries/pipeline10.py / pipeline12.py) feeding the pipeline13 staged-
# outcome semantics over MEDIA signatures instead of text fingerprints.
_MEDIA_PAIRS_CTE = f"""
    ib AS (SELECT unnest(generate_series(0, 47)) AS bid),
    im AS (
      SELECT 2 * bid + v AS media_id, bid,
             sha256('media:' || bid) AS sha, v = 1 AS isv
      FROM ib, (SELECT unnest([0, 1]) AS v)),
    ig AS (SELECT unnest(generate_series(0, 71)) AS i),
    iluma AS (
      SELECT media_id, i,
        CASE WHEN isv AND i = 37 THEN
          ((strpos('{_HEX}', substr(sha, (i % 32) * 2 + 1, 1)) - 1) * 16
           + strpos('{_HEX}', substr(sha, (i % 32) * 2 + 2, 1)) - 1 + 101)
          % 256
        ELSE
          (strpos('{_HEX}', substr(sha, (i % 32) * 2 + 1, 1)) - 1) * 16
           + strpos('{_HEX}', substr(sha, (i % 32) * 2 + 2, 1)) - 1
        END AS v
      FROM im, ig),
    ibits AS (
      SELECT l1.media_id, (l1.i // 9) * 8 + (l1.i % 9) AS bidx,
             CASE WHEN l2.v > l1.v THEN 1 ELSE 0 END AS bit
      FROM iluma l1 JOIN iluma l2
        ON l2.media_id = l1.media_id AND l2.i = l1.i + 1
      WHERE l1.i % 9 < 8),
    ipairs AS (
      SELECT a.media_id AS a_id, b.media_id AS b_id
      FROM ibits a JOIN ibits b
        ON a.bidx = b.bidx AND a.media_id < b.media_id
      GROUP BY 1, 2
      HAVING SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= 3),
    ab AS (SELECT unnest(generate_series(0, 39)) AS bid),
    am AS (
      SELECT 2 * bid + v AS media_id, bid,
             sha256('audio:' || bid) AS sha, v = 1 AS isv
      FROM ab, (SELECT unnest([0, 1]) AS v)),
    ag AS (SELECT unnest(generate_series(0, 64)) AS w),
    aj AS (SELECT unnest(generate_series(0, 3)) AS jj),
    aen AS (
      SELECT media_id, w,
             SUM(CASE WHEN isv AND (5 * w + jj) = 137 THEN
                   ((strpos('{_HEX}',
                            substr(sha, ((5*w+jj) % 32) * 2 + 1, 1)) - 1)
                    * 16
                    + strpos('{_HEX}',
                             substr(sha, ((5*w+jj) % 32) * 2 + 2, 1)) - 1
                    + 101) % 256
                 ELSE
                   (strpos('{_HEX}',
                           substr(sha, ((5*w+jj) % 32) * 2 + 1, 1)) - 1)
                   * 16
                   + strpos('{_HEX}',
                            substr(sha, ((5*w+jj) % 32) * 2 + 2, 1)) - 1
                 END) AS e
      FROM am, ag, aj
      GROUP BY 1, 2),
    abits AS (
      SELECT e1.media_id, e1.w AS bidx,
             CASE WHEN e2.e > e1.e THEN 1 ELSE 0 END AS bit
      FROM aen e1 JOIN aen e2
        ON e2.media_id = e1.media_id AND e2.w = e1.w + 1
      WHERE e1.w < 64),
    apairs AS (
      SELECT a.media_id AS a_id, b.media_id AS b_id
      FROM abits a JOIN abits b
        ON a.bidx = b.bidx AND a.media_id < b.media_id
      GROUP BY 1, 2
      HAVING SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= 3),
    pr2 AS (
      SELECT 'image' AS kind, a_id AS x, b_id AS y FROM ipairs
      UNION ALL SELECT 'image', b_id, a_id FROM ipairs
      UNION ALL SELECT 'audio', a_id, b_id FROM apairs
      UNION ALL SELECT 'audio', b_id, a_id FROM apairs),
    mmeta AS (
      SELECT 'image' AS kind, media_id,
             (64 + bid % 512) * (64 + (bid * 7) % 512) >= 6000 AS ok
      FROM im
      UNION ALL
      SELECT 'audio', media_id, 1000 + (bid * 13) % 9000 >= 1050
      FROM am),
    msp AS (
      SELECT kind, media_id, ok,
             ('0x' || substring(md5('ingest-m1:' || kind || ':'
                || CAST(media_id AS VARCHAR)), 1, 8))::BIGINT % 3 = 0
               AS is_inc
      FROM mmeta),
    mincq AS (SELECT * FROM msp WHERE is_inc AND ok),
    mstaged AS (
      SELECT s.kind, s.media_id,
        CASE WHEN NOT s.ok THEN 'quality_fail'
             WHEN EXISTS (SELECT 1 FROM pr2 p
                          JOIN mincq i2 ON i2.kind = p.kind
                                       AND i2.media_id = p.y
                          WHERE p.kind = s.kind AND p.x = s.media_id
                            AND p.y < s.media_id)
               THEN 'dup_within'
             WHEN EXISTS (SELECT 1 FROM pr2 p
                          JOIN msp b2 ON b2.kind = p.kind
                                     AND b2.media_id = p.y
                                     AND NOT b2.is_inc
                          WHERE p.kind = s.kind AND p.x = s.media_id)
               THEN 'dup_vs_base'
             ELSE 'accepted' END AS outcome
      FROM msp s WHERE s.is_inc)"""


@query(
    "pipeline_refresh_multimodal",
    oracle=f"""
    WITH {_MEDIA_PAIRS_CTE}
    SELECT kind,
           CAST(COUNT(*) AS BIGINT) AS n_incoming,
           CAST(SUM(CASE WHEN outcome = 'quality_fail' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quality_fail,
           CAST(SUM(CASE WHEN outcome = 'dup_within' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_within,
           CAST(SUM(CASE WHEN outcome = 'dup_vs_base' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_vs_base,
           CAST(SUM(CASE WHEN outcome = 'accepted' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_accepted
    FROM mstaged GROUP BY kind ORDER BY kind
    """,
    doc="The refresh funnel in its MULTIMODAL form (VERDICT r12 Next "
    "#6): an incoming media batch (salted-hash third of the corpus, "
    "images AND audio) runs metadata quality gate -> within-batch "
    "perceptual near-dup -> near-dup against the existing corpus, with "
    "pipeline13's sequential outcome attribution per item and a "
    "per-modality funnel report. Signatures are the production "
    "kernels: 64-bit dHash over the decoded luma grid for images, "
    "64-bit energy-delta-sign fingerprint for audio (Arrow-batched "
    "mapInPandas, decode stubbed to the synthetic sha256 payloads), "
    "paired by the banded-Hamming join (4x16-bit chunks, pigeonhole-"
    "complete at distance <= 3) — never all-pairs. The oracle replays "
    "the payload arithmetic from media ids and brute-forces the "
    "funnel. At 100 TB: payload bytes are touched exactly once per "
    "item (signature extraction), every later stage moves 8-byte "
    "signatures keyed by uniform chunk values, and the vs-corpus "
    "check is an asymmetric join scaled by batch size, not corpus^2. "
    "Reference intent: the data-agent engine's multimodal ambitions "
    "(externals/kyuubi-data-agent-engine/.../ExecuteStatement.scala:"
    "33-140) composed with BatchJobSubmission's refresh-job shape.",
)
def pipeline_refresh_multimodal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from kyuubi_spark.functions import multimodal as M
    from kyuubi_spark.functions.dedup import packed_hamming_near_dup_pairs

    img = M.synthesize_image_pairs(spark, n_base=48, partitions=8)
    aud = M.synthesize_audio_pairs(spark, n_base=40, partitions=8)
    ip = packed_hamming_near_dup_pairs(
        M.dhash64(img), id_col="media_id", sig_col="phash",
        max_hamming=3, chunks=4,
    ).select(F.lit("image").alias("kind"), "a_id", "b_id")
    ap = packed_hamming_near_dup_pairs(
        M.energy_sign_fingerprint(aud), id_col="media_id", sig_col="afp",
        max_hamming=3, chunks=4,
    ).select(F.lit("audio").alias("kind"), "a_id", "b_id")
    pr = ip.unionAll(ap).localCheckpoint()
    pr2 = pr.select(
        "kind", F.col("a_id").alias("x"), F.col("b_id").alias("y")
    ).unionAll(
        pr.select("kind", F.col("b_id").alias("x"), F.col("a_id").alias("y"))
    )

    # metadata plane: quality gate from the typed meta struct, split by
    # the kind-salted ingest hash (modalities draw independently)
    meta = (
        img.select(
            "kind",
            "media_id",
            (F.col("meta.width") * F.col("meta.height") >= 6000)
            .alias("ok"),
        )
        .unionAll(
            aud.select(
                "kind",
                "media_id",
                (F.col("meta.duration_ms") >= 1050).alias("ok"),
            )
        )
        .withColumn(
            "is_inc",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("ingest-m1:"),
                            F.col("kind"),
                            F.lit(":"),
                            F.col("media_id").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 3
            == 0,
        )
        .localCheckpoint()
    )
    incq = meta.filter(F.col("is_inc") & F.col("ok"))
    dwin = (
        pr2.join(
            incq.select("kind", F.col("media_id").alias("y")),
            ["kind", "y"],
        )
        .filter(F.col("y") < F.col("x"))
        .select("kind", F.col("x").alias("media_id"))
        .distinct()
        .withColumn("dw", F.lit(True))
    )
    dbase = (
        pr2.join(
            meta.filter(~F.col("is_inc")).select(
                "kind", F.col("media_id").alias("y")
            ),
            ["kind", "y"],
        )
        .select("kind", F.col("x").alias("media_id"))
        .distinct()
        .withColumn("db", F.lit(True))
    )
    staged = (
        meta.filter("is_inc")
        .join(dwin, ["kind", "media_id"], "left")
        .join(dbase, ["kind", "media_id"], "left")
        .select(
            "kind",
            F.when(~F.col("ok"), F.lit("quality_fail"))
            .when(F.col("dw"), F.lit("dup_within"))
            .when(F.col("db"), F.lit("dup_vs_base"))
            .otherwise(F.lit("accepted"))
            .alias("outcome"),
        )
    )
    is_ = lambda o: F.sum((F.col("outcome") == o).cast("long"))  # noqa: E731
    return (
        staged.groupBy("kind")
        .agg(
            F.count("*").alias("n_incoming"),
            is_("quality_fail").alias("n_quality_fail"),
            is_("dup_within").alias("n_dup_within"),
            is_("dup_vs_base").alias("n_dup_vs_base"),
            is_("accepted").alias("n_accepted"),
        )
        .orderBy("kind")
    )


def _bands(sig_df: DataFrame, bands: int = 8, rows_per_band: int = 2):
    """(id, band, k0, k1) from a (id, sig) relation — the shared LSH
    band explode (same layout as lsh_candidate_pairs / the capped
    report above)."""
    return (
        sig_df.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            *[
                                F.element_at(
                                    "sig", b * rows_per_band + r + 1
                                ).alias(f"k{r}")
                                for r in range(rows_per_band)
                            ],
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        )
        .select("id", "bk.*")
    )


@query(
    "stream_refresh_neardup",
    oracle=f"""
    WITH {_MINHASH_PAIRS_CTE},{_REFRESH_CTE},
    pairs2 AS (
      SELECT a_id AS x, b_id AS y FROM dup_pairs
      UNION ALL SELECT b_id, a_id FROM dup_pairs),
    fpacc AS (
      SELECT q.doc_id, q.source, q.n_tokens,
             (q.ok AND NOT EXISTS
                (SELECT 1 FROM base b WHERE b.fp = q.fp)) AS fp_ok
      FROM q),
    nd AS (
      SELECT DISTINCT f.doc_id
      FROM fpacc f
      JOIN pairs2 p ON p.x = f.doc_id
      JOIN base b ON b.doc_id = p.y
      WHERE f.fp_ok)
    SELECT f.source,
           CAST(COUNT(*) AS BIGINT) AS n_seen,
           CAST(SUM(CASE WHEN f.fp_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_fp_accepted,
           CAST(SUM(CASE WHEN f.fp_ok AND nd.doc_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_near_dup_rejected,
           CAST(SUM(CASE WHEN f.fp_ok AND nd.doc_id IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
           CAST(COALESCE(SUM(CASE WHEN f.fp_ok AND nd.doc_id IS NULL
                                  THEN f.n_tokens END), 0) AS BIGINT)
             AS new_tokens
    FROM fpacc f LEFT JOIN nd ON nd.doc_id = f.doc_id
    GROUP BY f.source ORDER BY f.source
    """,
    doc="STREAMING incremental LSH dedup as one query (VERDICT r12 "
    "Next #7): stream_refresh_accept's always-on ingest loop with the "
    "NEAR-DUP stage chained in — each of the 4 in-order microbatches "
    "computes quality signals + bag-of-words fingerprint map-only, "
    "anti-joins the static corpus fingerprints (exact stage), then "
    "MinHash(16)-bands the batch and joins the STATIC CORPUS BAND "
    "INDEX (stream-side banding per microbatch; the index is built "
    "once), verifies candidates with exact Jaccard >= 1/4 via "
    "array_intersect over precomputed hashed shingle arrays, and "
    "folds per-source outcomes. State bound for an always-on job: "
    "the band index + shingle arrays are STATIC relations (8 band "
    "keys + one hashed-shingle array per corpus doc — disk-backed, "
    "re-broadcast or shuffle-joined per batch, never per-event "
    "state), the streaming side holds NO carried state at all "
    "(each batch's near-dup check is self-contained), and the "
    "running totals are O(sources) rows — nothing grows with corpus "
    "or stream length except the static index, which grows only on "
    "corpus refresh. Batch-order independent by construction (checks "
    "are vs the static corpus only, matching stream_refresh_accept's "
    "documented contract), so the composite oracle replays it as one "
    "batch query. foreachBatch is the sink (the production pattern "
    "for stream-static joins with per-batch verify logic).",
)
def stream_refresh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import threading
    import time as _time

    from kyuubi_spark.functions import text as T
    from kyuubi_spark.functions.dedup import hashed_shingles_arrow
    from kyuubi_spark.queries.pipeline13 import _refresh_parts
    from kyuubi_spark.session import ensure_runtime_confs
    from kyuubi_spark.streaming.runner import run_foreach_batch

    ensure_runtime_confs(spark)
    base, _ = _refresh_parts(spark, sf_dir)
    # lazy: the broadcast-gate count below is the materializing action
    base_fps = base.select("fp").distinct().localCheckpoint(eager=False)
    docs = load_table(spark, sf_dir, "documents")
    is_inc = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ingest-v1"), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 5
        == 0
    )
    incoming = docs.filter(is_inc).select("doc_id", "source", "text")
    base_docs = docs.filter(~is_inc).select("doc_id", "text")

    # static corpus index, built ONCE before the stream starts: the
    # LSH band index (8 keyed rows per doc) and the hashed shingle
    # arrays the verifier intersects — the standing state of an
    # always-on near-dup gate.  r13 optimization: ONE Arrow shingle
    # pass feeds both relations (previously the corpus text was
    # shingled twice — once on the interpreted-HOF minhash path, once
    # in hashed_shingles_arrow); shingle_hash_arrow∘shingles_arrow is
    # element-wise identical to hashed_shingles_arrow by construction.
    from kyuubi_spark.functions.dedup import shingle_hash_arrow

    # base_sh is LAZY (r14): its checkpoint materializes under
    # base_bands' job below instead of paying its own pre-stream job
    base_sh = D.shingle_arrays_df(base_docs).localCheckpoint(eager=False)
    base_bands = _bands(
        D.minhash_signatures_df(base_docs, shingle_arrays=base_sh)
    ).localCheckpoint()
    base_arrays = base_sh.select(
        F.col("id").alias("b_id"),
        shingle_hash_arrow()(F.col("shs")).alias("sb"),
    ).localCheckpoint()

    # Pin the static corpus relations as EXPLICITLY BROADCAST sides
    # (r14, VERDICT r13 Next #4): checkpointed relations carry no size
    # statistics, so each microbatch's stream-static joins were planned
    # as sort-merge — shuffling the corpus band index and shingle arrays
    # once per batch.  Size-gate off the exact post-checkpoint row
    # counts (cheap in-memory scans); past the budget (corpus refresh at
    # real scale) the gate disappears and the keyed joins stand.
    from kyuubi_spark.operators.broadcast import broadcast_budget

    budget = broadcast_budget(spark)

    def _gate(df: DataFrame, est_bytes: int) -> DataFrame:
        return F.broadcast(df) if 0 <= est_bytes <= budget else df

    arr_stats = base_arrays.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(F.size("sb")), F.lit(0)).alias("vals"),
    ).first()
    # ~40 B/row: 32-hex-char fp or (id, band, k0, k1) longs + row overhead
    fps_b = _gate(base_fps, base_fps.count() * 40)
    bands_b = _gate(base_bands, base_bands.count() * 40)
    arrays_b = _gate(
        base_arrays, int(arr_stats["n"]) * 24 + int(arr_stats["vals"]) * 8
    )

    bow_fp = F.md5(
        F.concat_ws(
            " ",
            F.array_sort(
                F.array_distinct(
                    F.split(F.lower(F.trim(F.col("text"))), " ")
                )
            ),
        ).cast("binary")
    )

    acc_rows: list[tuple] = []
    acc_lock = threading.Lock()

    def gate_batch(bdf: DataFrame, _bid: int) -> None:
        sig = bdf.select(
            "doc_id",
            "source",
            "text",
            bow_fp.alias("fp"),
            T.token_count("text").alias("n_tokens"),
            T.stopword_ratio("text").alias("stop_ratio"),
            T.repetition_ratio("text").alias("rep_ratio"),
        )
        ok = sig.filter(
            (F.col("stop_ratio") >= 0.05)
            & (F.col("n_tokens") >= 10)
            & (F.col("rep_ratio") <= 0.8)
        )
        # LAZY checkpoint (r14): the batch's one collect below is the
        # materializing action, so the per-batch eager-checkpoint job
        # disappears; the checkpoint still pins the anti-join's output
        # so the three fresh consumers share one computation.
        fresh = ok.join(fps_b, "fp", "left_anti").localCheckpoint(
            eager=False
        )
        # map-only Arrow minhash off the batch's shingle arrays (r13):
        # same values, no per-batch doc-keyed shuffle.  NOTE: no
        # spread_narrow here — `.rdd.getNumPartitions()` on a derived
        # frame inside a foreachBatch microbatch forces an extra AQE
        # materialization per batch (measured 8x slower); the
        # checkpointed batch already has the join's output partitioning.
        inc_bands = _bands(
            D.minhash_signatures_df(
                fresh,
                shingle_arrays=fresh.select(
                    F.col("doc_id").alias("id"),
                    D.shingles_arrow(3)(F.col("text")).alias("shs"),
                ),
            )
        )
        cand = (
            inc_bands.select(F.col("id").alias("a_id"), "band", "k0", "k1")
            .join(
                bands_b.select(
                    F.col("id").alias("b_id"),
                    F.col("band").alias("band_r"),
                    F.col("k0").alias("k0_r"),
                    F.col("k1").alias("k1_r"),
                ),
                (F.col("band") == F.col("band_r"))
                & (F.col("k0") == F.col("k0_r"))
                & (F.col("k1") == F.col("k1_r")),
            )
            .select("a_id", "b_id")
            .distinct()
        )
        inc_arrays = fresh.select(
            F.col("doc_id").alias("a_id"),
            hashed_shingles_arrow(3)(F.col("text")).alias("sa"),
        )
        inter = F.size(F.array_intersect("sa", "sb"))
        uni = F.size("sa") + F.size("sb") - inter
        nd = (
            cand.join(inc_arrays, "a_id")
            .join(arrays_b, "b_id")
            .filter(4 * inter >= 1 * uni)
            .select(F.col("a_id").alias("doc_id"))
            .distinct()
            .withColumn("is_nd", F.lit(True))
        )
        out = (
            fresh.join(nd, "doc_id", "left")
            .groupBy("source")
            .agg(
                F.count("*").alias("n_fp"),
                F.sum(F.col("is_nd").isNotNull().cast("long")).alias(
                    "n_nd"
                ),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("is_nd").isNull(), F.col("n_tokens")
                        )
                    ),
                    F.lit(0),
                ).alias("tok"),
            )
            .collect()  # O(sources) rows per batch — bounded
        )
        with acc_lock:
            for r in out:
                acc_rows.append(
                    (r["source"], int(r["n_fp"]), int(r["n_nd"]),
                     int(r["tok"]))
                )

    work = scratch_dir("kyuubi_stream_nd_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    try:
        t0 = _time.time() - 1000
        bounds = incoming.agg(
            F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx")
        )
        sliced = incoming.join(F.broadcast(bounds)).withColumn(
            "sl",
            1
            + F.least(
                F.lit(3),
                F.floor(
                    4.0
                    * (F.col("doc_id") - F.col("mn"))
                    / (F.col("mx") - F.col("mn") + 1)
                ).cast("long"),
            ),
        )
        d = os.path.join(work, "sliced")
        sliced.select("doc_id", "source", "text", "sl").repartition(
            "sl"
        ).write.partitionBy("sl").parquet(d)
        for pos in range(1, 5):
            pd_ = os.path.join(d, f"sl={pos}")
            if not os.path.isdir(pd_):
                # an empty doc_id-range slice needs NO microbatch here:
                # unlike the TTL replay there is no watermark recurrence
                # to keep in step — each batch's near-dup check is
                # self-contained against the static corpus
                continue
            part = [
                p for p in os.listdir(pd_) if p.endswith(".parquet")
            ][0]
            dst = os.path.join(src, f"batch-{pos}.parquet")
            shutil.copy(os.path.join(pd_, part), dst)
            os.utime(dst, (t0 + pos * 60, t0 + pos * 60))
        stream = (
            spark.readStream.schema(incoming.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        run_foreach_batch(stream, gate_batch)
        folded: dict[str, list[int]] = {}
        for source, n_fp, n_nd, tok in acc_rows:
            cur = folded.setdefault(source, [0, 0, 0])
            cur[0] += n_fp
            cur[1] += n_nd
            cur[2] += tok
        snap = spark.createDataFrame(
            [
                (s, v[0], v[1], v[2])
                for s, v in sorted(folded.items())
            ]
            or [("__none__", 0, 0, 0)],
            "source string, n_fp bigint, n_nd bigint, tok bigint",
        )
        seen = incoming.groupBy("source").agg(
            F.count("*").alias("n_seen")
        )
        return (
            seen.join(snap, "source", "left")
            .select(
                "source",
                F.col("n_seen").cast("bigint").alias("n_seen"),
                F.coalesce(F.col("n_fp"), F.lit(0))
                .cast("bigint")
                .alias("n_fp_accepted"),
                F.coalesce(F.col("n_nd"), F.lit(0))
                .cast("bigint")
                .alias("n_near_dup_rejected"),
                (
                    F.coalesce(F.col("n_fp"), F.lit(0))
                    - F.coalesce(F.col("n_nd"), F.lit(0))
                )
                .cast("bigint")
                .alias("n_accepted"),
                F.coalesce(F.col("tok"), F.lit(0))
                .cast("bigint")
                .alias("new_tokens"),
            )
            .orderBy("source")
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# analytic candidate probability at the verification threshold tau=1/4:
# p = 1 - (1 - tau^r)^b, evaluated as PYTHON literals so both engines
# consume identical doubles
_BANDING_CONFIGS = [(16, 1), (8, 2), (4, 4)]

# lsh_banding_sweep bucket-skew bounds: buckets over _SWEEP_HOT_BOUND
# members take the salted join path (per-task pair work m^2/K instead of
# m^2); counts are exact either way — only the join STRATEGY is bounded.
_SWEEP_HOT_BOUND = 32
_SWEEP_SALT_K = 16
_P_CAND = {
    (b, r): 1.0 - (1.0 - 0.25 ** r) ** b for (b, r) in _BANDING_CONFIGS
}


def _sweep_candidates(sig: DataFrame) -> DataFrame:
    """Distinct (cfg, a_id, b_id) LSH candidate pairs for all three
    banding configurations off one signature relation.

    ONE self-join serves all three configurations (r13): each config's
    banded rows carry a (cfg, band, key-array) key — keys only compare
    within the same cfg, and within a cfg every key array has the same
    length, so array equality under the composite key is exactly the
    per-config k0..k{r-1} equality of three separate joins.

    BOUNDED bucket self-join (r14, VERDICT r13 Next #5): a band bucket
    with m members emits m^2/2 candidate pairs from ONE join partition
    — unbounded at scale, and AQE cannot split it (single key).  Tag
    every banded row with its bucket size via a window over EXACTLY
    the join partitioning (cfg, band, key): the window's one exchange
    is the same distribution both self-join sides need, so the planner
    reuses it (Exchange + ReusedExchange) instead of paying the two
    per-side shuffles the untagged join paid — measured FASTER than
    the r13 form at sf0.1, not just safer.  Buckets at or under
    _SWEEP_HOT_BOUND members (all of them at this SF — planted
    near-dup clusters are small) take the plain join; buckets over it
    (real under a 100 TB corpus's boilerplate shingles) take a SALTED
    join (guide §2.3): left salt = hash(id) % K splits each hot
    bucket's pair space into K independent groups, the right side
    replicated K ways only WITHIN hot buckets, bounding per-task work
    at m^2/K while the pair SET — and so every count — is exactly the
    unsalted join's.  Buckets are wholly hot or wholly cold, so no
    pair crosses the branches; the per-cfg distinct still dedups pairs
    matching in several bands.  Module-level so the plan-pinning test
    and the plans/r14 artifact read the exact production join."""
    from pyspark.sql import Window

    banded_all = None
    for bands, rpb in _BANDING_CONFIGS:
        banded = _bands(sig, bands=bands, rows_per_band=rpb).select(
            F.lit(bands).alias("cfg"),
            "id",
            "band",
            F.array(*[F.col(f"k{r}") for r in range(rpb)]).alias("key"),
        )
        banded_all = (
            banded if banded_all is None else banded_all.unionByName(banded)
        )
    wb = Window.partitionBy("cfg", "band", "key")
    # The tagged relation feeds FOUR join inputs (cold/hot × left/right);
    # exchange reuse dedups only the shuffle under the window, so without
    # a persist each consumer re-runs the explode + window count — the
    # whole banding pass 4×.  Persist it once (guide §5: reused AND
    # expensive to recompute); O(docs × Σbands) rows of a few fixed-width
    # columns, spills to disk at scale, released by the caller's
    # release_caches.  Same-box A/B: candidate counting min 20.9 s
    # unpersisted → window computed once with the cached scans under it.
    from kyuubi_spark.caching import persisted

    tagged = persisted(banded_all.withColumn("m", F.count("*").over(wb)))
    cold = tagged.filter(F.col("m") <= _SWEEP_HOT_BOUND)
    hot = tagged.filter(F.col("m") > _SWEEP_HOT_BOUND)
    cand_cold = (
        cold.select("cfg", F.col("id").alias("a_id"), "band", "key")
        .join(
            cold.select(
                F.col("cfg").alias("cfg_r"),
                F.col("id").alias("b_id"),
                F.col("band").alias("band_r"),
                F.col("key").alias("key_r"),
            ),
            (F.col("cfg") == F.col("cfg_r"))
            & (F.col("band") == F.col("band_r"))
            & (F.col("key") == F.col("key_r"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select("cfg", "a_id", "b_id")
    )
    hot_left = hot.select(
        "cfg",
        F.col("id").alias("a_id"),
        "band",
        "key",
        F.pmod(F.xxhash64("id"), F.lit(_SWEEP_SALT_K)).alias("sa"),
    )
    hot_right = hot.select(
        F.col("cfg").alias("cfg_r"),
        F.col("id").alias("b_id"),
        F.col("band").alias("band_r"),
        F.col("key").alias("key_r"),
    ).withColumn(
        "sa_r",
        F.explode(F.array(*[F.lit(i) for i in range(_SWEEP_SALT_K)])),
    )
    cand_hot = (
        hot_left.join(
            hot_right,
            (F.col("cfg") == F.col("cfg_r"))
            & (F.col("band") == F.col("band_r"))
            & (F.col("key") == F.col("key_r"))
            & (F.col("sa") == F.col("sa_r"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select("cfg", "a_id", "b_id")
    )
    return cand_cold.unionByName(cand_hot).distinct()


@query(
    "lsh_banding_sweep",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    sig AS (
      SELECT id,
             list_transform(generate_series(0, 15),
               s -> list_min(list_transform(shs,
                     g -> (('0x' || substring(md5(g), 1, 12))::BIGINT
                           + s * ('0x' || substring(md5(g), 13, 12))::BIGINT)
                          & 281474976710655))) AS sig
      FROM sh),
    shx AS (SELECT DISTINCT id,
                   ('0x' || substring(md5(s), 1, 15))::BIGINT AS s
            FROM (SELECT id, unnest(shs) AS s FROM sh) u),
    counts AS (SELECT id, COUNT(*) AS n_sh FROM shx GROUP BY id),
    exact AS (
      SELECT i.a_id, i.b_id
      FROM (SELECT sa.id AS a_id, sb.id AS b_id, COUNT(*) AS inter
            FROM shx sa JOIN shx sb ON sa.s = sb.s AND sa.id < sb.id
            GROUP BY 1, 2) i
      JOIN counts ca ON ca.id = i.a_id
      JOIN counts cb ON cb.id = i.b_id
      WHERE 4 * i.inter >= 1 * (ca.n_sh + cb.n_sh - i.inter)),
    b16 AS (SELECT id, b AS band, sig[b+1] AS k0
            FROM sig, (SELECT unnest(generate_series(0, 15)) AS b)),
    c16 AS (SELECT DISTINCT l.id AS a_id, r.id AS b_id FROM b16 l
            JOIN b16 r ON l.band = r.band AND l.k0 = r.k0
                      AND l.id < r.id),
    b8 AS (SELECT id, b AS band, sig[b*2+1] AS k0, sig[b*2+2] AS k1
           FROM sig, (SELECT unnest(generate_series(0, 7)) AS b)),
    c8 AS (SELECT DISTINCT l.id AS a_id, r.id AS b_id FROM b8 l
           JOIN b8 r ON l.band = r.band AND l.k0 = r.k0
                    AND l.k1 = r.k1 AND l.id < r.id),
    b4 AS (SELECT id, b AS band, sig[b*4+1] AS k0, sig[b*4+2] AS k1,
                  sig[b*4+3] AS k2, sig[b*4+4] AS k3
           FROM sig, (SELECT unnest(generate_series(0, 3)) AS b)),
    c4 AS (SELECT DISTINCT l.id AS a_id, r.id AS b_id FROM b4 l
           JOIN b4 r ON l.band = r.band AND l.k0 = r.k0
                    AND l.k1 = r.k1 AND l.k2 = r.k2 AND l.k3 = r.k3
                    AND l.id < r.id),
    ne AS (SELECT COUNT(*) AS n_exact FROM exact),
    cfg AS (
      SELECT 16 AS bands, 1 AS rows_per_band,
             CAST({_P_CAND[(16, 1)]!r} AS DOUBLE) AS p_cand_at_tau,
             (SELECT COUNT(*) FROM c16) AS n_candidates,
             (SELECT COUNT(*) FROM c16 JOIN exact USING (a_id, b_id))
               AS n_verified
      UNION ALL
      SELECT 8, 2, CAST({_P_CAND[(8, 2)]!r} AS DOUBLE),
             (SELECT COUNT(*) FROM c8),
             (SELECT COUNT(*) FROM c8 JOIN exact USING (a_id, b_id))
      UNION ALL
      SELECT 4, 4, CAST({_P_CAND[(4, 4)]!r} AS DOUBLE),
             (SELECT COUNT(*) FROM c4),
             (SELECT COUNT(*) FROM c4 JOIN exact USING (a_id, b_id)))
    SELECT CAST(bands AS BIGINT) AS bands,
           CAST(rows_per_band AS BIGINT) AS rows_per_band,
           ROUND(p_cand_at_tau, 6) AS p_cand_at_tau,
           CAST(n_candidates AS BIGINT) AS n_candidates,
           CAST(n_verified AS BIGINT) AS n_verified,
           ROUND(CAST(n_verified AS DOUBLE)
                 / NULLIF(ne.n_exact, 0), 6) AS recall,
           ROUND(CAST(n_verified AS DOUBLE)
                 / NULLIF(n_candidates, 0), 6) AS candidate_precision
    FROM cfg, ne ORDER BY bands DESC
    """,
    doc="LSH banding PARAMETER SWEEP — the decision report behind the "
    "8x2 default every dedup query here uses: the same 16 MinHash "
    "values banded three ways (16x1, 8x2, 4x4), each configuration "
    "measured for candidate volume, verified true pairs, recall vs "
    "the exact all-pairs Jaccard>=1/4 ground truth, and candidate "
    "precision, alongside the analytic S-curve hit probability at "
    "the threshold (1-(1-tau^r)^b, shipped as identical literals to "
    "both engines). More bands x fewer rows = higher recall + more "
    "false candidates; the sweep quantifies that trade on THIS corpus "
    "— the calibration a pipeline runs once before committing banding "
    "parameters at 100 TB (where re-running dedup is the expensive "
    "part, not this report). ONE signature relation feeds all three "
    "band joins; verified counts come from intersecting each "
    "candidate set with the ground truth (verification IS exact, so "
    "verified == candidates INTERSECT exact); the exact side is the "
    "evaluation-time cost documented at dedup_lsh_recall_report.",
)
def lsh_banding_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = D.shingle_arrays_df(docs).localCheckpoint()
    sig = D.minhash_signatures_df(docs, shingle_arrays=sh).localCheckpoint()
    # LAZY checkpoint + count = one job (r14): the count below is the
    # materializing action, so the r13 eager-checkpoint job and its
    # follow-up count collapse into a single pass (same fusion as the
    # kcore/bfs rewrites); the checkpoint still pins `exact` so the
    # verified-count join reuses it without recomputing the all-pairs
    # ground truth.
    exact = (
        D.jaccard_pairs(docs, None, n=3, tau_num=1, tau_den=4,
                        shingle_arrays=sh)
        .select("a_id", "b_id")
        .localCheckpoint(eager=False)
    )
    n_exact = exact.count()

    cand = _sweep_candidates(sig)
    per_cfg = {
        int(r["cfg"]): (int(r["n_cand"]), int(r["n_ver"]))
        for r in (
            cand.join(
                exact.withColumn("ex", F.lit(1)), ["a_id", "b_id"], "left"
            )
            .groupBy("cfg")
            .agg(
                F.count("*").alias("n_cand"),
                F.count("ex").alias("n_ver"),
            )
            .collect()
        )
    }
    rows = []
    for bands, rpb in _BANDING_CONFIGS:
        n_cand, n_ver = per_cfg.get(bands, (0, 0))
        rows.append((bands, rpb, _P_CAND[(bands, rpb)], n_cand, n_ver))

    out = spark.createDataFrame(
        rows,
        "bands bigint, rows_per_band bigint, p_raw double, "
        "n_candidates bigint, n_verified bigint",
    )
    return out.select(
        "bands",
        "rows_per_band",
        dround(F.col("p_raw"), 6).alias("p_cand_at_tau"),
        "n_candidates",
        "n_verified",
        dround(
            F.col("n_verified").cast("double")
            / F.nullif(F.lit(n_exact).cast("bigint"), F.lit(0)),
            6,
        ).alias("recall"),
        dround(
            F.col("n_verified").cast("double")
            / F.nullif(F.col("n_candidates"), F.lit(0)),
            6,
        ).alias("candidate_precision"),
    ).orderBy(F.col("bands").desc())


@query(
    "corpus_distinct_ngrams",
    oracle="""
    WITH t AS (
      SELECT source, string_split(trim(text), ' ') AS toks
      FROM documents),
    sized AS (SELECT source, toks, len(toks) AS L FROM t),
    per_n AS (
      SELECT source, n.n,
             CASE WHEN L >= n.n
                  THEN list_transform(generate_series(1, L - n.n + 1),
                         i -> array_to_string(toks[i:i+n.n-1], ' '))
                  ELSE [] END AS grams,
             greatest(L - n.n + 1, 0) AS n_grams
      FROM sized, (SELECT unnest([1, 2, 3]) AS n) n),
    tot AS (
      SELECT source, n, SUM(n_grams) AS n_total
      FROM per_n GROUP BY 1, 2),
    dis AS (
      SELECT source, n, COUNT(DISTINCT g) AS n_distinct
      FROM (SELECT source, n, unnest(grams) AS g FROM per_n) u
      GROUP BY 1, 2)
    SELECT tot.source, CAST(tot.n AS BIGINT) AS n,
           CAST(tot.n_total AS BIGINT) AS n_total,
           CAST(COALESCE(dis.n_distinct, 0) AS BIGINT) AS n_distinct,
           ROUND(CAST(COALESCE(dis.n_distinct, 0) AS DOUBLE)
                 / NULLIF(tot.n_total, 0), 6) AS distinct_ratio
    FROM tot LEFT JOIN dis ON dis.source = tot.source AND dis.n = tot.n
    ORDER BY tot.source, tot.n
    """,
    doc="Corpus diversity via distinct-n (the self-BLEU-family metric "
    "reported for generated/curated corpora): per source and n in "
    "{{1,2,3}}, unique n-grams over total n-gram occurrences — low "
    "ratios flag templated or mode-collapsed sources before they "
    "flood a training mix. Totals are computed ANALYTICALLY from "
    "token counts (no n-gram materialization on that side); the "
    "distinct side explodes n-grams once and aggregates per "
    "(source, n) with map-side partial aggregation — shuffle keyed "
    "by uniform gram hashes, linear at any corpus size (contrast "
    "text_repetition, which is per-doc: this is the corpus-level "
    "collapse signal).",
)
def corpus_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    sized = docs.select(
        "source", toks.alias("toks"), F.size(toks).alias("L")
    )
    branches = []
    for n in (1, 2, 3):
        grams = F.when(
            F.col("L") >= n,
            F.expr(
                f"transform(sequence(1, L - {n} + 1), "
                f"i -> concat_ws(' ', slice(toks, i, {n})))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        branches.append(
            sized.select(
                "source",
                F.lit(n).cast("bigint").alias("n"),
                grams.alias("grams"),
                F.greatest(
                    F.col("L") - n + 1, F.lit(0)
                ).cast("bigint").alias("n_grams"),
            )
        )
    per_n = branches[0].unionAll(branches[1]).unionAll(branches[2])
    tot = per_n.groupBy("source", "n").agg(
        F.sum("n_grams").cast("bigint").alias("n_total")
    )
    dis = (
        per_n.select("source", "n", F.explode("grams").alias("g"))
        .groupBy("source", "n")
        .agg(F.count_distinct("g").cast("bigint").alias("n_distinct"))
    )
    return (
        tot.join(dis, ["source", "n"], "left")
        .select(
            "source",
            "n",
            "n_total",
            F.coalesce(F.col("n_distinct"), F.lit(0))
            .cast("bigint")
            .alias("n_distinct"),
            dround(
                F.coalesce(F.col("n_distinct"), F.lit(0)).cast("double")
                / F.nullif(F.col("n_total"), F.lit(0)),
                6,
            ).alias("distinct_ratio"),
        )
        .orderBy("source", "n")
    )


_CMS_W = 64  # buckets per row
_CMS_D = 4   # hash rows


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH t AS (
      SELECT string_split(trim(text), ' ') AS toks FROM documents),
    grams AS (
      SELECT array_to_string(toks[i:i+1], ' ') AS g
      FROM t, LATERAL unnest(
        CASE WHEN len(toks) >= 2
             THEN generate_series(1, len(toks) - 1) ELSE [] END) AS s(i)),
    exact AS (SELECT g, COUNT(*) AS exact_count FROM grams GROUP BY g),
    rows_ AS (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS j),
    cells AS (
      SELECT j,
             ('0x' || substring(md5('cms' || j || ':' || g), 1, 15))
               ::BIGINT % {_CMS_W} AS bucket,
             SUM(exact_count) AS cnt
      FROM exact, rows_ GROUP BY 1, 2),
    top AS (
      SELECT g, exact_count FROM exact
      ORDER BY exact_count DESC, g ASC LIMIT 20),
    est AS (
      SELECT top.g, top.exact_count, MIN(c.cnt) AS cms_estimate
      FROM top, rows_ r
      JOIN cells c ON c.j = r.j
       AND c.bucket = ('0x' || substring(md5('cms' || r.j || ':' || top.g),
                       1, 15))::BIGINT % {_CMS_W}
      GROUP BY 1, 2)
    SELECT g AS gram, CAST(exact_count AS BIGINT) AS exact_count,
           CAST(cms_estimate AS BIGINT) AS cms_estimate,
           CAST(cms_estimate - exact_count AS BIGINT) AS overestimate
    FROM est ORDER BY exact_count DESC, gram ASC
    """,
    doc="Count-Min-Sketch heavy hitters over corpus bigrams: a "
    f"{_CMS_D}x{_CMS_W} CMS (md5-derived row hashes, identical in both "
    "engines) built with ONE keyed aggregate per row — the mergeable "
    "frequency sketch a 100 TB pipeline maintains instead of a full "
    "bigram count table (the sketch is {_CMS_D}x{_CMS_W} cells per "
    "partition, merged by cell-wise SUM; the exact table is "
    "vocabulary-sized). The report joins the top-20 EXACT bigrams "
    "against their CMS estimates and shows each overestimate — the "
    "one-sided error the sketch trades for constant memory "
    "(estimate >= exact always; collisions inflate, never deflate). "
    "At scale only the sketch side runs; the exact side here is the "
    "evaluation harness proving the estimates' bias structure.",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    grams = (
        docs.select(toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> concat_ws(' ', slice(toks, i, 2)))"
                )
            ).alias("g")
        )
    )
    exact = grams.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    ).localCheckpoint()

    def bucket(j, col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"cms{j}:"), col
                        ).cast("binary")
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % _CMS_W
        )

    # sketch rows: one keyed aggregate per hash row over the exact
    # relation (equivalent to aggregating raw grams — addition is
    # associative — but touches vocabulary-sized input)
    cells = None
    for j in range(_CMS_D):
        c = exact.groupBy(bucket(j, F.col("g")).alias("bucket")).agg(
            F.sum("exact_count").alias("cnt")
        ).select(F.lit(j).alias("j"), "bucket", "cnt")
        cells = c if cells is None else cells.unionAll(c)

    top = exact.orderBy(
        F.col("exact_count").desc(), F.col("g").asc()
    ).limit(20)
    probes = top.select(
        "g",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        bucket(j, F.col("g")).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("p"),
    ).select("g", "exact_count", "p.*")
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("g", "exact_count")
        .agg(F.min("cnt").cast("bigint").alias("cms_estimate"))
        .select(
            F.col("g").alias("gram"),
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count"))
            .cast("bigint")
            .alias("overestimate"),
        )
        .orderBy(F.col("exact_count").desc(), F.col("gram").asc())
    )


@query(
    "vocab_growth_heaps",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(trim(text), ' ') AS toks
      FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS g
      FROM t, LATERAL unnest(
        CASE WHEN len(toks) >= 2
             THEN generate_series(1, len(toks) - 1) ELSE [] END) AS s(i)),
    firsts AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g),
    ob AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM t),
    dd AS (
      SELECT doc_id,
             1 + (10 * (doc_id - mn)) // (mx - mn + 1) AS decile
      FROM t, ob),
    tok_per AS (
      SELECT dd.decile, SUM(CASE WHEN len(t.toks) >= 2
                                 THEN len(t.toks) - 1 ELSE 0 END)
               AS n_grams
      FROM t JOIN dd USING (doc_id) GROUP BY 1),
    voc_per AS (
      SELECT dd.decile, COUNT(*) AS n_new
      FROM firsts f JOIN dd ON dd.doc_id = f.first_doc
      GROUP BY 1),
    cum AS (
      SELECT d.decile,
             SUM(tp.n_grams) OVER (ORDER BY d.decile) AS cum_grams,
             SUM(COALESCE(vp.n_new, 0)) OVER (ORDER BY d.decile)
               AS cum_vocab
      FROM (SELECT DISTINCT decile FROM dd) d
      LEFT JOIN tok_per tp ON tp.decile = d.decile
      LEFT JOIN voc_per vp ON vp.decile = d.decile)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(cum_grams AS BIGINT) AS cum_grams,
           CAST(cum_vocab AS BIGINT) AS cum_vocab,
           ROUND(CAST(cum_vocab AS DOUBLE) / NULLIF(cum_grams, 0), 6)
             AS type_token_ratio
    FROM cum ORDER BY decile
    """,
    doc="Heaps-law vocabulary growth curve over corpus bigrams: "
    "cumulative distinct bigrams vs cumulative bigram occurrences at "
    "10 corpus checkpoints (doc_id-range deciles), plus the "
    "type-token ratio per checkpoint — the saturation curve that "
    "tells a data pipeline when additional raw corpus stops buying "
    "vocabulary (and a mode-collapse alarm when the curve flattens "
    "too early). Fully distributed shape: FIRST OCCURRENCE per gram "
    "is one min-aggregate (no ordered scan, no window over the "
    "corpus), checkpoint assignment is map-only arithmetic, and the "
    "10-row cumulative fold is driver-trivial — at 100 TB the only "
    "wide ops are two keyed aggregates over uniform gram keys.",
)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    t = docs.select("doc_id", toks.alias("toks")).localCheckpoint()
    grams = t.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1), "
                "i -> concat_ws(' ', slice(toks, i, 2)))"
            )
        ).alias("g"),
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    ob = t.agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
    decile = (
        1
        + F.expr("CAST((10 * (doc_id - mn)) DIV (mx - mn + 1) AS BIGINT)")
    )
    dd = t.join(F.broadcast(ob)).select(
        "doc_id",
        F.size("toks").alias("L"),
        decile.alias("decile"),
    )
    tok_per = dd.groupBy("decile").agg(
        F.sum(
            F.when(F.col("L") >= 2, F.col("L") - 1).otherwise(0)
        ).alias("n_grams")
    )
    voc_per = (
        firsts.join(
            dd.select(F.col("doc_id").alias("first_doc"), "decile"),
            "first_doc",
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    # 10-row cumulative fold: the unpartitioned window is over the
    # DECILE axis (<= 10 rows by construction), not the corpus
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        tok_per.join(voc_per, "decile", "left")
        .select(
            "decile",
            F.col("n_grams"),
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
        .withColumn("cum_grams", F.sum("n_grams").over(wc))
        .withColumn("cum_vocab", F.sum("n_new").over(wc))
    )
    return cum.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("cum_grams").cast("bigint").alias("cum_grams"),
        F.col("cum_vocab").cast("bigint").alias("cum_vocab"),
        dround(
            F.col("cum_vocab").cast("double")
            / F.nullif(F.col("cum_grams"), F.lit(0)),
            6,
        ).alias("type_token_ratio"),
    ).orderBy("decile")
