"""Multimodal pipeline plumbing: schema, Arrow batching, decode stub, frame plan."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kyuubi_spark.functions import multimodal as M  # noqa: E402


@pytest.fixture(scope="module")
def media(spark):
    df = M.synthesize_media(spark, n=48, partitions=4)
    df.cache().count()
    return df


def test_media_schema_and_determinism(spark, media):
    assert media.schema == M.MEDIA_SCHEMA
    assert media.count() == 48
    # deterministic payloads: same id → same bytes across builds
    p1 = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    p2 = {
        r["media_id"]: bytes(r["payload"])
        for r in M.synthesize_media(spark, n=48, partitions=2).collect()
    }
    assert p1 == p2  # partitioning must not change content


def test_decode_features(spark, media):
    feats = M.decode_features(media)
    rows = feats.collect()
    assert len(rows) == 48
    assert all(r["decode_error"] is None for r in rows)
    by_id = {r["media_id"]: r for r in rows}
    meta = {r["media_id"]: r["meta"] for r in media.collect()}
    for mid, r in by_id.items():
        assert r["decoded_width"] == meta[mid]["width"]
        assert r["decoded_height"] == meta[mid]["height"]
        assert r["payload_bytes"] == 12 + 128


def test_decode_error_captured_not_fatal(spark):
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2], "kind": ["image", "image"],
             "payload": [b"xx", None]}
        )
    )
    rows = M.decode_features(bad).collect()
    assert all(r["decode_error"] is not None for r in rows)


def test_frame_sample_plan_no_payload_duplication(spark, media):
    plan = M.frame_sample_plan(media, every_ms=1000)
    assert "payload" not in plan.columns  # bytes are not exploded per frame
    n_videos = media.filter(F.col("kind") == "video").count()
    assert plan.select("media_id").distinct().count() == n_videos
    # frame counts follow duration
    one = plan.groupBy("media_id").count().join(
        media.select("media_id", F.col("meta.duration_ms").alias("d")), "media_id"
    ).collect()
    for r in one:
        assert r["count"] == (max(r["d"] - 1, 0) // 1000) + 1


def test_resize_passthrough_and_error_capture(spark):
    from pyspark.sql import functions as F

    from kyuubi_spark.functions import multimodal as M

    media = M.synthesize_media(spark, n=64, partitions=4)
    out = M.resize_images(media, max_side=10_000)  # larger than any source
    rows = out.collect()
    assert all(r["resize_error"] is None for r in rows)
    # no downscale needed: dims pass through, size estimate = original body
    assert all(
        r["src_width"] == r["dst_width"] and r["src_height"] == r["dst_height"]
        for r in rows
    )
    # garbage payload -> per-row error, task survives
    bad = spark.createDataFrame(
        [(999, "image", bytearray(b"x"), None)], M.synthesize_media(spark, 1).schema
    )
    errs = M.resize_images(bad).collect()
    assert errs[0]["resize_error"] is not None


def test_dhash64_and_banded_near_dup_completeness(spark):
    """The banded-Hamming image near-dup (r09 Next #4) finds EXACTLY the
    brute-force pairs at distance <= 3 (pigeonhole completeness of the
    4x16-bit chunk join), and every planted one-byte-retouch variant
    pairs with its base."""
    from kyuubi_spark.functions import multimodal as M
    from kyuubi_spark.functions.dedup import packed_hamming_near_dup_pairs

    media = M.synthesize_image_pairs(spark, n_base=32, partitions=4)
    sig = M.dhash64(media)
    hashes = {r["media_id"]: r["phash"] for r in sig.collect()}
    assert len(hashes) == 64

    # brute force ground truth on the collected signatures
    ids = sorted(hashes)
    expected = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
            if d <= 3:
                expected.add((a, b, d))

    got = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in packed_hamming_near_dup_pairs(
            sig, id_col="media_id", sig_col="phash", max_hamming=3
        ).collect()
    }
    assert got == expected
    # every planted variant (one-byte retouch flips <= 2 gradient bits)
    # is recovered
    pair_keys = {(a, b) for a, b, _ in got}
    for base in range(32):
        assert (2 * base, 2 * base + 1) in pair_keys
