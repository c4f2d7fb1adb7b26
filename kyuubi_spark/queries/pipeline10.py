"""Pipeline batch 10 — training-data ops round 10.

Multimodal near-duplication joins the dedup family: image perceptual
hashing (dHash over the decoded luma grid, packed to ONE int64) feeds
the same banded-Hamming kernel the text/embedding paths use, so image
dedup at 100 TB is an 8-byte-per-image signature join, never an
all-pairs byte comparison.

Reference scope: extends the engine the way SURVEY.md §2's
beyond-operator pipeline set sanctions; oracle-parity conventions
follow queries/pipeline.py (deterministic synthetic corpora replayed
arithmetically by DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kyuubi_spark.scratch import scratch_dir
from pyspark.sql import functions as F

from kyuubi_spark.queries import query

_HEX = "0123456789abcdef"


from kyuubi_spark.operators.broadcast import broadcast_budget as _broadcast_budget


@query(
    "image_phash_near_dup",
    oracle=f"""
    WITH b AS (SELECT unnest(generate_series(0, 47)) AS bid),
    m AS (
      SELECT 2 * bid + v AS media_id, sha256('media:' || bid) AS sha,
             v = 1 AS isv
      FROM b, (SELECT unnest([0, 1]) AS v)),
    g AS (SELECT unnest(generate_series(0, 71)) AS i),
    luma AS (
      SELECT media_id, i,
        CASE WHEN isv AND i = 37 THEN
          ((strpos('{_HEX}', substr(sha, (i % 32) * 2 + 1, 1)) - 1) * 16
           + strpos('{_HEX}', substr(sha, (i % 32) * 2 + 2, 1)) - 1 + 101)
          % 256
        ELSE
          (strpos('{_HEX}', substr(sha, (i % 32) * 2 + 1, 1)) - 1) * 16
           + strpos('{_HEX}', substr(sha, (i % 32) * 2 + 2, 1)) - 1
        END AS v
      FROM m, g),
    bits AS (
      SELECT l1.media_id, (l1.i // 9) * 8 + (l1.i % 9) AS bidx,
             CASE WHEN l2.v > l1.v THEN 1 ELSE 0 END AS bit
      FROM luma l1 JOIN luma l2
        ON l2.media_id = l1.media_id AND l2.i = l1.i + 1
      WHERE l1.i % 9 < 8),
    pairs AS (
      SELECT a.media_id AS a_id, b.media_id AS b_id,
             SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
      FROM bits a JOIN bits b
        ON a.bidx = b.bidx AND a.media_id < b.media_id
      GROUP BY 1, 2)
    SELECT CAST(a_id AS BIGINT) AS a_id, CAST(b_id AS BIGINT) AS b_id,
           CAST(hamming AS BIGINT) AS hamming
    FROM pairs WHERE hamming <= 3 ORDER BY a_id, b_id
    """,
    doc="Image near-duplicate detection — the multimodal counterpart of "
    "MinHash: each image collapses to a 64-bit perceptual dHash (gradient "
    "bits over the decoded 8x9 luma grid, Arrow-batched mapInPandas with "
    "the decode step stubbed to the synthetic payload bytes), then the "
    "banded-Hamming kernel (4x16-bit chunks, pigeonhole-COMPLETE for "
    "distance <= 3, XOR+POPCNT exact filter — the hamming_ann_topk/"
    "simhash machinery) surfaces retouched copies. The corpus plants one "
    "one-byte-retouched variant per base image; the oracle replays the "
    "sha256 body arithmetic and checks pairs by brute force, proving the "
    "bucketed path loses nothing. At 100 TB: signatures are 8 bytes/"
    "image, the join keys are uniform 16-bit chunk values, and payload "
    "bytes are touched exactly once.",
)
def image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import multimodal as M
    from kyuubi_spark.functions.dedup import packed_hamming_near_dup_pairs

    media = M.synthesize_image_pairs(spark, n_base=48, partitions=8)
    sig = M.dhash64(media)
    pairs = packed_hamming_near_dup_pairs(
        sig, id_col="media_id", sig_col="phash", max_hamming=3, chunks=4
    )
    return pairs.orderBy("a_id", "b_id")


@query(
    "video_frame_near_dup",
    oracle=f"""
    WITH b AS (SELECT unnest(generate_series(0, 23)) AS bid),
    fr AS (SELECT unnest(generate_series(0, 7)) AS f),
    m AS (
      SELECT 2*bid + v AS vid, f,
             CASE WHEN v = 1 AND f % 4 = 3
                  THEN sha256('replaced:' || bid || ':' || f)
                  ELSE sha256('video:' || bid || ':' || f) END AS sha,
             (v = 1 AND f % 4 <> 3) AS retouch
      FROM b, (SELECT unnest([0,1]) AS v), fr),
    g AS (SELECT unnest(generate_series(0, 71)) AS i),
    luma AS (
      SELECT vid, f, i,
        CASE WHEN retouch AND i = 37 THEN
          ((strpos('{_HEX}', substr(sha,(i%32)*2+1,1))-1)*16
           + strpos('{_HEX}', substr(sha,(i%32)*2+2,1)) - 1 + 101) % 256
        ELSE
          (strpos('{_HEX}', substr(sha,(i%32)*2+1,1))-1)*16
           + strpos('{_HEX}', substr(sha,(i%32)*2+2,1)) - 1
        END AS val
      FROM m, g),
    bits AS (
      SELECT l1.vid, l1.f, (l1.i // 9)*8 + (l1.i % 9) AS bidx,
             CASE WHEN l2.val > l1.val THEN 1 ELSE 0 END AS bit
      FROM luma l1 JOIN luma l2
        ON l2.vid = l1.vid AND l2.f = l1.f AND l2.i = l1.i + 1
      WHERE l1.i % 9 < 8),
    fham AS (
      SELECT a.vid AS a_video, b.vid AS b_video, a.f,
             SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS ham
      FROM bits a JOIN bits b
        ON a.bidx = b.bidx AND a.f = b.f AND a.vid < b.vid
      GROUP BY 1, 2, 3),
    vm AS (
      SELECT a_video, b_video,
             SUM(CASE WHEN ham <= 3 THEN 1 ELSE 0 END) AS matched_frames
      FROM fham GROUP BY 1, 2)
    SELECT CAST(a_video AS BIGINT) AS a_video,
           CAST(b_video AS BIGINT) AS b_video,
           CAST(matched_frames AS BIGINT) AS matched_frames
    FROM vm WHERE matched_frames >= 5 ORDER BY a_video, b_video
    """,
    doc="Video near-duplicate detection by ALIGNED frame matching: every "
    "sampled frame gets the 64-bit perceptual dHash, the banded-Hamming "
    "kernel (frame ids packed as video*1000+frame) surfaces frame-level "
    "matches, and videos pair when >= 5 of their 8 aligned frames match "
    "at distance <= 3 — tolerating the planted every-4th-frame "
    "replacement (keyframe swap / inserted ad) while the per-frame "
    "one-byte retouch (re-encode noise) still matches. The oracle "
    "replays the sha256 frame bytes and brute-forces aligned Hamming. "
    "At 100 TB: frame signatures are 8 bytes each, candidate generation "
    "is the same uniform 16-bit chunk join, and the video-pair rollup "
    "is one keyed aggregate — video bytes are read exactly once.",
)
def video_frame_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import multimodal as M
    from kyuubi_spark.functions.dedup import packed_hamming_near_dup_pairs

    nframes = 8
    media = M.synthesize_video_frames(spark, n_base=24, frames=nframes)
    sig = M.dhash64(media)  # media_id = video_id*1000 + frame_idx
    fpairs = packed_hamming_near_dup_pairs(
        sig, id_col="media_id", sig_col="phash", max_hamming=3, chunks=4
    )
    # keep ALIGNED frame matches (same frame position, different videos),
    # then roll up to video pairs; a_id < b_id with equal frame offsets
    # implies a_video < b_video
    aligned = fpairs.filter(
        (F.col("a_id") % 1000 == F.col("b_id") % 1000)
        & (F.expr("a_id div 1000") != F.expr("b_id div 1000"))
    )
    return (
        aligned.groupBy(
            F.expr("a_id div 1000").cast("bigint").alias("a_video"),
            F.expr("b_id div 1000").cast("bigint").alias("b_video"),
        )
        .agg(F.count("*").alias("matched_frames"))
        .filter(F.col("matched_frames") >= 5)
        .orderBy("a_video", "b_video")
    )


@query(
    "scd2_dimension_build",
    oracle="""
    WITH chg AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
             CASE WHEN LAG(o_orderpriority) OVER w IS DISTINCT FROM
                       o_orderpriority THEN 1 ELSE 0 END AS is_new
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey)),
    grp AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS gid
      FROM chg),
    island AS (
      SELECT o_custkey AS custkey, gid,
             MIN(o_orderpriority) AS priority,
             MIN(o_orderdate) AS valid_from,
             COUNT(*) AS n_orders
      FROM grp GROUP BY 1, 2),
    scd AS (
      SELECT custkey, priority, valid_from, n_orders,
             LEAD(valid_from) OVER (PARTITION BY custkey
               ORDER BY valid_from, gid) AS valid_to,
             ROW_NUMBER() OVER (PARTITION BY custkey
               ORDER BY valid_from, gid) AS version
      FROM island)
    SELECT CAST(custkey AS BIGINT) AS custkey,
           CAST(version AS BIGINT) AS version,
           priority,
           valid_from, valid_to,
           CAST(n_orders AS BIGINT) AS n_orders,
           valid_to IS NULL AS is_current
    FROM scd
    ORDER BY custkey, version
    """,
    doc="Slowly-changing-dimension type-2 build from a change stream: "
    "each customer's order history collapses into priority 'islands' "
    "(gaps-and-islands via lag-change flag + running-sum group id), "
    "emitted as versioned validity intervals [valid_from, valid_to) "
    "with an open-ended current row — the lakehouse MERGE-into-SCD2 "
    "pattern without engine-specific MERGE syntax. Scale: every window "
    "and the island aggregate partition on custkey (uniform key, no "
    "corpus-wide window — three keyed passes that AQE coalesces), so "
    "the plan is one shuffle by custkey reused across stages.",
)
def scd2_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = orders.select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
    ).withColumn(
        "is_new",
        F.when(
            ~F.lag("o_orderpriority").over(w).eqNullSafe(
                F.col("o_orderpriority")
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    grp = chg.withColumn(
        "gid", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    island = grp.groupBy(
        F.col("o_custkey").alias("custkey"), "gid"
    ).agg(
        F.min("o_orderpriority").alias("priority"),
        F.min("o_orderdate").alias("valid_from"),
        F.count("*").alias("n_orders"),
    )
    w2 = Window.partitionBy("custkey").orderBy("valid_from", "gid")
    return (
        island.select(
            "custkey",
            F.row_number().over(w2).cast("bigint").alias("version"),
            "priority",
            "valid_from",
            F.lead("valid_from").over(w2).alias("valid_to"),
            F.col("n_orders").cast("bigint").alias("n_orders"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("custkey", "version")
    )


@query(
    "export_manifest_integrity",
    oracle="""
    SELECT CAST(doc_id % 8 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(CAST(concat('0x',
                  substr(md5(doc_id || ':' || text), 1, 15)) AS BIGINT)
                % 1000000007) AS BIGINT) AS fingerprint
    FROM documents
    GROUP BY 1 ORDER BY bucket
    """,
    doc="Sharded training-data export with an integrity manifest: the "
    "corpus is written to hash-bucketed parquet shards through the "
    "gateway write path (partitionBy + rebalance — the small-files "
    "guard), READ BACK, and summarized as a per-shard manifest (doc "
    "count, char volume, order-independent content fingerprint: sum of "
    "md5(doc_id:text) 60-bit prefixes mod 1e9+7). The oracle computes "
    "the manifest from the SOURCE table, so any row lost, duplicated, "
    "or corrupted in the write/read round-trip changes a fingerprint "
    "and fails the check — the export-validation step a 100 TB corpus "
    "ships with. Scale: one keyed aggregate per side; the fingerprint "
    "is commutative so shard-local partial aggregation works and no "
    "ordering constraint is imposed on writers.",
)
def export_manifest_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from kyuubi_spark.operators.write import write_table
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "n_chars", (F.col("doc_id") % 8).alias("bucket")
    )
    path = scratch_dir("kyuubi_export_", data_scale=True)
    try:
        write_table(docs, path, partition_by=["bucket"])
        back = spark.read.parquet(path)
        key = F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"),
                               F.lit(":"), F.col("text"))),
                1, 15,
            ),
            16, 10,
        ).cast("long")
        out = (
            back.groupBy(F.col("bucket").cast("bigint").alias("bucket"))
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("sum_chars"),
                F.sum(key % 1000000007).cast("bigint").alias("fingerprint"),
            )
            .orderBy("bucket")
        )
        out = spark.createDataFrame(out.collect(), out.schema)
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "entity_resolution_qgram",
    oracle="""
    WITH b AS (SELECT unnest(generate_series(0, 199)) AS eid),
    clean AS (
      SELECT eid,
             substr(sha256('ent:' || eid), 1, 6) || ' ' ||
             substr(sha256('ent:' || eid), 7, 6) || ' ' ||
             substr(sha256('ent:' || eid), 13, 6) AS name
      FROM b),
    dirty AS (
      SELECT eid AS rid, name,
             CASE WHEN ((eid * 7) % 20) + 1 IN (7, 14)
                  THEN ((eid * 7) % 20) + 2
                  ELSE ((eid * 7) % 20) + 1 END AS pos
      FROM clean),
    dirty2 AS (
      SELECT rid,
             substr(name, 1, pos - 1) || 'z' || substr(name, pos + 1)
               AS name
      FROM dirty),
    cg AS (
      SELECT DISTINCT eid, substr(name, i, 3) AS gram
      FROM clean, (SELECT unnest(generate_series(1, 18)) AS i)),
    dg AS (
      SELECT DISTINCT rid, substr(name, i, 3) AS gram
      FROM dirty2, (SELECT unnest(generate_series(1, 18)) AS i)),
    csz AS (SELECT eid, COUNT(*) AS n FROM cg GROUP BY 1),
    dsz AS (SELECT rid, COUNT(*) AS n FROM dg GROUP BY 1),
    shared AS (
      SELECT cg.eid, dg.rid, COUNT(*) AS shared_grams
      FROM cg JOIN dg ON cg.gram = dg.gram
      GROUP BY 1, 2),
    scored AS (
      SELECT s.eid AS entity_id, s.rid AS record_id,
             CAST(s.shared_grams AS BIGINT) AS shared_grams,
             ROUND(CAST(s.shared_grams AS DOUBLE)
                   / (csz.n + dsz.n - s.shared_grams), 4) AS jacc
      FROM shared s
      JOIN csz ON csz.eid = s.eid
      JOIN dsz ON dsz.rid = s.rid)
    SELECT CAST(entity_id AS BIGINT) AS entity_id,
           CAST(record_id AS BIGINT) AS record_id,
           shared_grams, jacc
    FROM scored WHERE jacc >= 0.5
    ORDER BY entity_id, record_id
    """,
    doc="Entity resolution (record linkage) across two relations: dirty "
    "records link back to their clean entities by 3-gram Jaccard over a "
    "gram-keyed equi-join — the blocking strategy that makes fuzzy "
    "matching a JOIN instead of a cross product. The corpus plants one "
    "single-character-corrupted record per entity (sha256-derived names, "
    "built entirely with JVM-side expressions — sha2/substring/"
    "transform, no UDF); a one-char edit disturbs <=3 of 18 grams, so "
    "the planted pair scores ~0.7 while random hex names share almost "
    "nothing, and the 0.5 threshold recovers exactly the planted "
    "linkage (the oracle brute-replays the arithmetic). At 100 TB: "
    "candidate generation is the gram equi-join (uniform short keys; "
    "production additionally drops stop-grams above a document-"
    "frequency cap), set sizes come from two keyed aggregates, and "
    "scoring touches only candidate pairs.",
)
def entity_resolution_qgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround

    base = spark.range(200).select(
        F.col("id").alias("eid"),
        F.sha2(F.concat(F.lit("ent:"), F.col("id").cast("string")), 256)
        .alias("sha"),
    )
    clean = base.select(
        "eid",
        F.concat(
            F.expr("substring(sha, 1, 6)"), F.lit(" "),
            F.expr("substring(sha, 7, 6)"), F.lit(" "),
            F.expr("substring(sha, 13, 6)"),
        ).alias("name"),
    )
    dirty = clean.select(
        F.col("eid").alias("rid"),
        "name",
        F.expr(
            "CASE WHEN ((eid * 7) % 20) + 1 IN (7, 14)"
            " THEN ((eid * 7) % 20) + 2 ELSE ((eid * 7) % 20) + 1 END"
        ).alias("pos"),
    ).select(
        "rid",
        F.expr(
            "concat(substring(name, 1, pos - 1), 'z',"
            " substring(name, pos + 1))"
        ).alias("name"),
    )

    def grams(df, idc):
        return (
            df.select(
                idc,
                F.explode(
                    F.expr(
                        "transform(sequence(1, 18),"
                        " i -> substring(name, i, 3))"
                    )
                ).alias("gram"),
            )
            .distinct()
        )

    cg, dg = grams(clean, "eid"), grams(dirty, "rid")
    csz = cg.groupBy("eid").agg(F.count("*").alias("cn"))
    dsz = dg.groupBy("rid").agg(F.count("*").alias("dn"))
    shared = (
        cg.join(dg, "gram")
        .groupBy("eid", "rid")
        .agg(F.count("*").alias("shared_grams"))
    )
    return (
        shared.join(csz, "eid")
        .join(dsz, "rid")
        .select(
            F.col("eid").cast("bigint").alias("entity_id"),
            F.col("rid").cast("bigint").alias("record_id"),
            F.col("shared_grams").cast("bigint").alias("shared_grams"),
            dround(
                F.col("shared_grams")
                / (F.col("cn") + F.col("dn") - F.col("shared_grams")),
                4,
            ).alias("jacc"),
        )
        .filter(F.col("jacc") >= 0.5)
        .orderBy("entity_id", "record_id")
    )


@query(
    "k_anonymity_report",
    oracle="""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
             COUNT(*) AS grp
      FROM customer
      GROUP BY 1, 2, 3),
    banded AS (
      SELECT CASE WHEN grp = 1 THEN '1'
                  WHEN grp < 5 THEN '2-4'
                  WHEN grp < 10 THEN '5-9'
                  ELSE '10+' END AS k_band,
             grp
      FROM q)
    SELECT k_band,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(grp) AS BIGINT) AS n_rows,
           ROUND(100.0 * SUM(CASE WHEN grp < 5 THEN grp ELSE 0 END)
                 / SUM(SUM(grp)) OVER (), 4) AS pct_rows_below_k5
    FROM banded GROUP BY 1 ORDER BY k_band
    """,
    doc="k-anonymity audit over quasi-identifiers — the privacy "
    "re-identification screen a training corpus with person-linked "
    "records needs before release: group customers by the "
    "(nation, market segment, account-balance band) quasi-identifier, "
    "band the group sizes, and report each band's contribution to the "
    "rows below k=5 (each such row is re-identifiable by the "
    "combination). "
    "Complements the regex-level pii_detect_redact with a "
    "STRUCTURAL privacy measure. Plan: one keyed aggregate over the "
    "quasi-identifier (partial map-side combine), a tiny second "
    "rollup, and a single-row total broadcast back — no corpus-scaled "
    "window (the OVER () runs on the <=4-row banded rollup).",
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    cust = load_table(spark, sf_dir, "customer")
    q = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
    ).agg(F.count("*").alias("grp"))
    banded = q.select(
        F.when(F.col("grp") == 1, "1")
        .when(F.col("grp") < 5, "2-4")
        .when(F.col("grp") < 10, "5-9")
        .otherwise("10+")
        .alias("k_band"),
        "grp",
    )
    rolled = banded.groupBy("k_band").agg(
        F.count("*").alias("n_groups"),
        F.sum("grp").alias("band_rows"),
        F.sum(F.when(F.col("grp") < 5, F.col("grp")).otherwise(0)).alias(
            "below_k"
        ),
    )
    total = Window.partitionBy()  # <=4-row rollup: safe unpartitioned
    return rolled.select(
        "k_band",
        F.col("n_groups").cast("bigint").alias("n_groups"),
        F.col("band_rows").cast("bigint").alias("n_rows"),
        dround(
            100.0 * F.col("below_k") / F.sum("band_rows").over(total),
            4,
        ).alias("pct_rows_below_k5"),
    ).orderBy("k_band")


@query(
    "triangle_count_oriented",
    oracle="""
    WITH e0 AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
      SELECT n, COUNT(*) AS d FROM (
        SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0) GROUP BY 1),
    o AS (
      SELECT CASE WHEN (du.d, e0.u) < (dv.d, e0.v)
                  THEN e0.u ELSE e0.v END AS s,
             CASE WHEN (du.d, e0.u) < (dv.d, e0.v)
                  THEN e0.v ELSE e0.u END AS t
      FROM e0 JOIN deg du ON du.n = e0.u JOIN deg dv ON dv.n = e0.v),
    w AS (SELECT e1.s AS a, e1.t AS b, e2.t AS c
          FROM o e1 JOIN o e2 ON e2.s = e1.t)
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e0) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM w
                 JOIN o ON o.s = w.a AND o.t = w.c) AS BIGINT)
             AS n_triangles
    """,
    doc="Distributed triangle counting with DEGREE ORIENTATION over the "
    "co-purchase graph (parts sharing an order): every undirected edge "
    "is directed from its lower-(degree, id) endpoint to the higher, so "
    "wedge enumeration fans out from LOW-degree vertices only — the "
    "classic trick that bounds the join blow-up to O(E^1.5) and tames "
    "power-law hubs (a hub's edges all point INTO it, so it never "
    "enumerates its own quadratic wedge set). Plan: edge build is an "
    "orderkey equi-self-join + distinct, degrees one keyed aggregate, "
    "orientation two broadcast-or-shuffle hash joins, wedges + closure "
    "two more equi-joins on uniform vertex keys; the oriented edge "
    "relation is persisted and reused across all three join roles. "
    "At sf0.1 this is 20k nodes / 1.2M edges / 1.9M triangles — a real "
    "graph workload, value-exact vs the oracle.",
)
def triangle_count_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.caching import persisted
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    e0 = persisted(
        a.join(b, "k").filter(F.col("u") < F.col("v")).select("u", "v")
        .distinct()
    )
    deg = (
        e0.select(F.col("u").alias("n"))
        .unionAll(e0.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    o = persisted(
        e0.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du"))
            .alias("dt"),
        )
    )
    # wedges = unordered pairs of OUT-neighbors of each (low-degree)
    # source, ordered by the same (degree, id) key as the orientation so
    # the closing edge, if present, appears in the packed edge set in
    # exactly this direction
    e1 = o.select("s", F.col("t").alias("t1"), F.col("dt").alias("d1"))
    e2 = o.select("s", F.col("t").alias("t2"), F.col("dt").alias("d2"))
    pair_ordered = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("t1") < F.col("t2"))
    )
    # Close wedges against a BROADCAST of the packed edge set: the wedge
    # relation (sum of C(outdeg, 2), the orientation-bounded O(E^1.5)
    # quantity) then streams through broadcast hash joins + a partial
    # count without ever being shuffled or materialized.  The hints are
    # SIZE-GATED: count |E| once off the persisted edge set (the count
    # also primes the cache reused by all three join roles) and only
    # hint broadcast while the packed edges (~24 B/row with join keys)
    # fit the session broadcast budget; past it the hints disappear and
    # the degree-oriented wedge bound survives on plain shuffle joins
    # (AQE may still re-pick broadcast from runtime stats if they shrink).
    n_edges_exact = e0.count()
    hint = (
        F.broadcast
        if 0 <= n_edges_exact * 24 <= _broadcast_budget(spark)
        else (lambda d: d)
    )
    wedges = (
        e1.join(hint(e2), "s")
        .filter(pair_ordered)
        .select(
            (F.shiftleft(F.col("t1"), 32).bitwiseOR(F.col("t2"))).alias("pk")
        )
    )
    closure = o.select(
        (F.shiftleft(F.col("s"), 32).bitwiseOR(F.col("t"))).alias("pk")
    )
    tri = wedges.join(hint(closure), "pk").agg(
        F.count("*").alias("n_triangles")
    )
    counts = e0.agg(F.count("*").alias("n_edges")).crossJoin(
        deg.agg(F.count("*").alias("n_nodes"))
    )
    return counts.crossJoin(tri).select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
    )


@query(
    "label_noise_knn_report",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, embedding,
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
    pairs AS (
      SELECT a.vec_id AS p, b.vec_id AS q, b.label AS q_label,
             ROUND(list_sum(list_transform(generate_series(1, len(a.embedding)),
                     i -> CAST(a.embedding[i] AS DOUBLE)
                          * CAST(b.embedding[i] AS DOUBLE)))
                   / (a.nrm * b.nrm), 6) AS s
      FROM e a
      JOIN asg aa ON aa.vec_id = a.vec_id
      JOIN asg ab ON ab.cluster = aa.cluster AND ab.vec_id <> a.vec_id
      JOIN e b ON b.vec_id = ab.vec_id),
    top5 AS (
      SELECT p, q_label FROM (
        SELECT p, q_label,
               ROW_NUMBER() OVER (PARTITION BY p ORDER BY s DESC, q) AS r
        FROM pairs) t WHERE r <= 5),
    vote AS (
      SELECT p, q_label, COUNT(*) AS cnt FROM top5 GROUP BY 1, 2),
    maj AS (
      SELECT p, q_label AS maj_label FROM (
        SELECT p, q_label,
               ROW_NUMBER() OVER (PARTITION BY p
                                  ORDER BY cnt DESC, q_label) AS r
        FROM vote) t WHERE r = 1)
    SELECT CAST(e.label AS INTEGER) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN m.maj_label <> e.label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
           ROUND(SUM(CASE WHEN m.maj_label <> e.label
                          THEN 1.0 ELSE 0.0 END) / COUNT(*), 4)
             AS flag_rate
    FROM e JOIN maj m ON m.p = e.vec_id
    GROUP BY 1 ORDER BY label
    """,
    doc="Label-noise audit (confident-learning style) over the labeled "
    "embeddings: each point's label is compared to the MAJORITY label "
    "of its 5 nearest in-cluster neighbors (rounded cosine, nearest-of-8 "
    "deterministic centroids — the SemDeDup O(n^2/k) scoping), and the "
    "report shows per-label flag rates — the screen that finds "
    "mislabeled slices before they poison a classifier head or a "
    "quality-filter fit. Ties are fully pinned (score ties by neighbor "
    "id, vote ties by smallest label), so the Arrow-vectorized Spark "
    "vote matches the SQL replay bit-for-bit. One broadcast (8 "
    "centroids) + one shuffle (cluster id); per-cluster votes are a "
    "vectorized pandas pass.",
)
def label_noise_knn_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions import similarity as S
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    votes = S.label_noise_knn(emb, k_clusters=8, k_neighbors=5)
    return (
        votes.groupBy(F.col("label").cast("int").alias("label"))
        .agg(
            F.count("*").alias("n_points"),
            F.sum(
                F.when(F.col("maj_label") != F.col("label"), 1).otherwise(0)
            ).alias("n_flagged"),
        )
        .select(
            "label",
            F.col("n_points").cast("bigint").alias("n_points"),
            F.col("n_flagged").cast("bigint").alias("n_flagged"),
            dround(F.col("n_flagged") / F.col("n_points"), 4).alias(
                "flag_rate"
            ),
        )
        .orderBy("label")
    )


@query(
    "dp_noisy_counts",
    oracle="""
    WITH c AS (
      SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
    u AS (
      SELECT event_type, n,
             CAST(CAST(concat('0x', substr(md5('dp:' || event_type), 1, 13))
                  AS BIGINT) AS DOUBLE) / 4503599627370496.0 AS uu
      FROM c)
    SELECT event_type,
           ROUND(n + (CASE WHEN uu >= 0.5 THEN -1.0 ELSE 1.0 END)
                     * ln(1.0 - 2.0 * abs(uu - 0.5)), 3) AS noisy_count
    FROM u ORDER BY event_type
    """,
    doc="Differentially-private count release (Laplace mechanism, "
    "epsilon=1, sensitivity 1 for per-event-type counts): noise is "
    "drawn by inverse-CDF from a uniform DERIVED from md5 of the "
    "release key, so the mechanism is the real DP shape while the test "
    "harness stays deterministic — swap the hash-uniform for a CSPRNG "
    "in production and nothing else changes. Together with "
    "k_anonymity_report this forms the privacy-release pair: audit "
    "re-identifiability, then publish aggregates with calibrated "
    "noise. Plan: one keyed count (map-side combined) + per-group "
    "scalar math; nothing corpus-scaled after the aggregate.",
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    uu = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dp:"), F.col("event_type"))), 1, 13
            ),
            16, 10,
        ).cast("double")
        / F.lit(4503599627370496.0)  # 16^13
    )
    noise = (
        F.when(uu >= 0.5, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.log(F.lit(1.0) - 2.0 * F.abs(uu - F.lit(0.5)))
    )
    return c.select(
        "event_type",
        dround(F.col("n") + noise, 3).alias("noisy_count"),
    ).orderBy("event_type")


@query(
    "kaplan_meier_retention",
    oracle="""
    WITH u AS (
      SELECT user_id,
             epoch_us(MIN(CAST(ts AS TIMESTAMP))) AS f,
             epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS l
      FROM events GROUP BY 1),
    mx AS (SELECT MAX(l) AS m FROM u),
    lt AS (
      SELECT user_id, (l - f) // 86400000000 AS t,
             CASE WHEN l > m - 3 * 86400000000 THEN 0 ELSE 1 END AS death
      FROM u, mx),
    d AS (
      SELECT t, SUM(death) AS d_t, COUNT(*) AS ends_t FROM lt GROUP BY 1),
    r AS (
      SELECT t, d_t,
             SUM(ends_t) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_t
      FROM d),
    km AS (
      SELECT t, n_t, d_t,
             ROUND(exp(SUM(ln(1.0 - CAST(d_t AS DOUBLE) / n_t))
                   OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
               AS survival
      FROM r WHERE d_t > 0)
    SELECT CAST(t AS BIGINT) AS t_days,
           CAST(n_t AS BIGINT) AS n_risk,
           CAST(d_t AS BIGINT) AS n_deaths,
           survival
    FROM km ORDER BY t_days
    """,
    doc="Kaplan-Meier survival estimator over user lifetimes (first-to-"
    "last event span in days; users still active in the corpus's final "
    "3 days are right-CENSORED — they leave the risk set without "
    "counting as churn, the correction naive retention curves get "
    "wrong). S(t) = product over death times of (1 - d_t/n_t), computed "
    "as exp-of-summed-logs so both engines fold identical IEEE terms. "
    "Plan: one keyed per-user aggregate, a 1-row max broadcast, a "
    "day-keyed rollup, then windows over the <=31 day-step rows "
    "(audit-allowlisted; the corpus-scaled work is all keyed).",
)
def kaplan_meier_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.session import load_table

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    u = ev.select("user_id", us.alias("us")).groupBy("user_id").agg(
        F.min("us").alias("f"), F.max("us").alias("l")
    )
    mx = u.agg(F.max("l").alias("m"))
    day_us = 86_400_000_000
    lt = u.crossJoin(F.broadcast(mx)).select(
        F.expr(f"(l - f) div {day_us}").alias("t"),
        F.when(
            F.col("l") > F.col("m") - 3 * day_us, F.lit(0)
        ).otherwise(F.lit(1)).alias("death"),
    )
    d = lt.groupBy("t").agg(
        F.sum("death").alias("d_t"), F.count("*").alias("ends_t")
    )
    w_desc = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    r = d.select(
        "t", "d_t", F.sum("ends_t").over(w_desc).alias("n_t")
    ).filter(F.col("d_t") > 0)
    w_asc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return r.select(
        F.col("t").cast("bigint").alias("t_days"),
        F.col("n_t").cast("bigint").alias("n_risk"),
        F.col("d_t").cast("bigint").alias("n_deaths"),
        dround(
            F.exp(
                F.sum(
                    F.log(F.lit(1.0) - F.col("d_t").cast("double") / F.col("n_t"))
                ).over(w_asc)
            ),
            6,
        ).alias("survival"),
    ).orderBy("t_days")


@query(
    "spend_gini_lorenz",
    oracle="""
    WITH x AS (
      SELECT o_custkey, SUM(o_totalprice) AS total
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT o_custkey, total,
             ROW_NUMBER() OVER (ORDER BY total, o_custkey) AS rn,
             NTILE(10) OVER (ORDER BY total, o_custkey) AS decile
      FROM x),
    g AS (
      SELECT COUNT(*) AS n, SUM(total) AS st,
             SUM(CAST(rn AS DOUBLE) * total) AS srx
      FROM ranked),
    dec AS (
      SELECT decile, COUNT(*) AS n_cust, SUM(total) AS dt
      FROM ranked GROUP BY 1)
    SELECT CAST(dec.decile AS INTEGER) AS decile,
           CAST(dec.n_cust AS BIGINT) AS n_cust,
           ROUND(dec.dt / g.st, 6) AS spend_share,
           ROUND(SUM(dec.dt) OVER (ORDER BY dec.decile
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / g.st, 6) AS cum_share,
           ROUND(2.0 * g.srx / (g.n * g.st) - (g.n + 1.0) / g.n, 6)
             AS gini
    FROM dec, g ORDER BY decile
    """,
    doc="Spend-concentration report: Lorenz deciles + Gini coefficient "
    "over per-customer order totals — the inequality audit that tells a "
    "curator (or a revenue team) how top-heavy a distribution is; the "
    "same machinery audits per-source token concentration in a corpus. "
    "The global rank comes from the DISTRIBUTED exact ranker "
    "(operators/ranking.py: percentile-cut buckets + per-bucket windows "
    "+ offset add — no corpus-wide window), deciles from the closed-form "
    "NTILE over (rn, n), Gini from the rank-weighted sum identity "
    "G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n. The only unpartitioned "
    "window runs over the 10 decile rows (audit-allowlisted).",
)
def spend_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kyuubi_spark.functions.compat import dround
    from kyuubi_spark.operators.ranking import global_row_number, ntile_expr
    from kyuubi_spark.session import load_table

    orders = load_table(spark, sf_dir, "orders")
    x = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("total"))
    ranked, n = global_row_number(
        x, [("total", "asc"), ("o_custkey", "asc")], rn_col="rn"
    )
    ranked = ranked.withColumn("decile", ntile_expr(F.col("rn"), n, 10))
    g = ranked.agg(
        F.sum("total").alias("st"),
        F.sum(F.col("rn").cast("double") * F.col("total")).alias("srx"),
    )
    dec = ranked.groupBy("decile").agg(
        F.count("*").alias("n_cust"), F.sum("total").alias("dt")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dec.crossJoin(F.broadcast(g))
        .select(
            F.col("decile").cast("int").alias("decile"),
            F.col("n_cust").cast("bigint").alias("n_cust"),
            dround(F.col("dt") / F.col("st"), 6).alias("spend_share"),
            dround(F.sum("dt").over(w) / F.col("st"), 6).alias("cum_share"),
            dround(
                2.0 * F.col("srx") / (F.lit(float(n)) * F.col("st"))
                - (F.lit(float(n)) + 1.0) / F.lit(float(n)),
                6,
            ).alias("gini"),
        )
        .orderBy("decile")
    )
