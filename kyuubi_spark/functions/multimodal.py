"""Multimodal column operators: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB (per the training-pipeline charter):
payloads are `binary` columns with a metadata struct; transforms run as
Arrow-batched pandas iterators over `mapInPandas`, so bytes move
driver-free, partition-parallel, one Arrow batch at a time (bounded
executor memory regardless of payload size).

The container ships no codec libraries, so the DECODE step is stubbed: a
deterministic header parser stands in for the real decoder behind the same
schema/partitioning/UDF plumbing — swap `_decode_stub` for PIL/ffmpeg in a
real deployment; everything around it (batching, schema, metadata
extraction, frame sampling) is real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)


def synthesize_media(spark, n: int = 64, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (seeded by media_id) for exercising
    the pipeline without real codecs. Payload = 16-byte header (width,
    height, duration) + pseudo-random body."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                kind = ("image", "audio", "video")[mid % 3]
                w, h, dur = 64 + mid % 512, 64 + (mid * 7) % 512, (mid * 37) % 10_000
                body = hashlib.sha256(f"media:{mid}".encode()).digest() * 4
                payload = struct.pack("<iii", w, h, dur) + body
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "duration_ms": dur,
                            "codec": "stub",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return (
        spark.range(n)
        .repartition(partitions)
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: parses the 16-byte synthetic header.

    A real deployment replaces this with PIL.Image.open / soundfile /
    pyav — same signature, same surrounding plumbing. Raises on garbage
    like a real decoder would.
    """
    if payload is None or len(payload) < 12:
        raise ValueError("payload too short to decode")
    w, h, dur = struct.unpack("<iii", bytes(payload[:12]))
    return w, h, dur


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("decoded_width", T.IntegerType()),
        T.StructField("decoded_height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def decode_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of binary).

    Per-row decode failures are captured in `decode_error` instead of
    failing the task — at 100 TB a corrupt payload is data, not an outage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                rec = {
                    "media_id": int(row["media_id"]),
                    "kind": row["kind"],
                    "decoded_width": None,
                    "decoded_height": None,
                    "duration_ms": None,
                    "payload_bytes": len(payload) if payload is not None else 0,
                    "payload_sha": hashlib.sha256(bytes(payload)).hexdigest()
                    if payload is not None
                    else None,
                    "decode_error": None,
                }
                try:
                    w, h, dur = _decode_stub(payload)
                    rec.update(
                        {"decoded_width": w, "decoded_height": h, "duration_ms": dur}
                    )
                except Exception as e:  # noqa: BLE001 - captured per-row
                    rec["decode_error"] = str(e)
                out.append(rec)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per (media_id, frame_ts).

    The explode happens JVM-side from metadata only — the payload is NOT
    duplicated per frame (project it away before exploding; re-join by
    media_id at decode time). At scale this is the difference between
    shuffling metadata rows and shuffling terabytes of video bytes.
    """
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.col("meta.duration_ms").alias("duration_ms"))
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("dst_width", T.IntegerType()),
        T.StructField("dst_height", T.IntegerType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resize_error", T.StringType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize plan + STUB execution for image rows.

    Target dims use pure integer arithmetic (dst = src * max_side // longest
    side, floored, min 1), so the plan is replayable exactly in any engine.
    The pixel transform itself is stubbed — the emitted payload is the new
    header plus a proportionally sized body (bytes scale with the pixel
    ratio) — but the plumbing is the real shape: Arrow-batched mapInPandas
    over binary columns, per-row error capture, payloads never shuffled
    (only image rows are selected, and only their own partition touches
    their bytes).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                rec = {
                    "media_id": int(row["media_id"]),
                    "src_width": None,
                    "src_height": None,
                    "dst_width": None,
                    "dst_height": None,
                    "resized_bytes": None,
                    "resize_error": None,
                }
                try:
                    w, h, _dur = _decode_stub(payload)
                    body_len = max(len(payload) - 12, 0)
                    longest = max(w, h)
                    if longest <= max_side:
                        dw, dh = w, h
                    else:
                        dw = max(1, w * max_side // longest)
                        dh = max(1, h * max_side // longest)
                    rec.update(
                        {
                            "src_width": w,
                            "src_height": h,
                            "dst_width": dw,
                            "dst_height": dh,
                            # body bytes scale with the pixel ratio (stub
                            # stand-in for the re-encoded size)
                            "resized_bytes": 12 + body_len * (dw * dh) // (w * h),
                        }
                    )
                except Exception as e:  # noqa: BLE001 - captured per-row
                    rec["resize_error"] = str(e)
                out.append(rec)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=RESIZE_SCHEMA)
    )


def synthesize_image_pairs(spark, n_base: int = 48, partitions: int = 8) -> DataFrame:
    """Deterministic image corpus with planted near-duplicates: every base
    image (media_id = 2*b) has one variant (media_id = 2*b + 1) whose
    payload body differs in exactly ONE byte — the synthetic stand-in for
    a re-encoded / slightly-retouched copy of the same picture.

    Payload layout matches ``synthesize_media`` (12-byte header + sha256
    body), so the stub decoder and a SQL oracle can both replay the exact
    bytes from the media_id alone.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for base in pdf["id"]:
                base = int(base)
                w, h = 64 + base % 512, 64 + (base * 7) % 512
                body = bytearray(hashlib.sha256(f"media:{base}".encode()).digest() * 4)
                header = struct.pack("<iii", w, h, 0)
                rows.append(
                    {"media_id": 2 * base, "kind": "image",
                     "payload": header + bytes(body),
                     "meta": {"width": w, "height": h, "duration_ms": 0,
                              "codec": "stub"}}
                )
                variant = bytearray(body)
                variant[37] = (variant[37] + 101) % 256  # one-byte retouch
                rows.append(
                    {"media_id": 2 * base + 1, "kind": "image",
                     "payload": header + bytes(variant),
                     "meta": {"width": w, "height": h, "duration_ms": 0,
                              "codec": "stub"}}
                )
            yield pd.DataFrame(rows)

    return (
        spark.range(n_base)
        .repartition(partitions)
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def dhash64(media: DataFrame, rows: int = 8, cols: int = 8) -> DataFrame:
    """Perceptual dHash over the decoded luma grid, packed to ONE int64.

    Real-world shape: decode → downsample to a (rows)x(cols+1) grayscale
    grid → compare horizontally adjacent cells → pack the rows*cols
    gradient bits into a single long.  The DECODE step is the stub (the
    container ships no codecs): the luma grid is read straight from the
    payload body bytes — swap that one line for
    ``PIL.Image.open(...).convert("L").resize((cols+1, rows))`` in a real
    deployment.  Everything else (Arrow-batched mapInPandas over binary,
    vectorized numpy bit packing, int64 signatures) is the production
    path: at 100 TB the signature table is ~8 bytes/image and the
    near-dup join never touches payload bytes again.
    """
    n = rows * (cols + 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        weights = np.left_shift(
            np.ones(rows * cols, dtype=np.uint64),
            np.arange(rows * cols, dtype=np.uint64),
        )
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                # STUB decode: luma grid = first n body bytes
                luma = np.frombuffer(
                    bytes(payload[12:12 + n]), dtype=np.uint8
                ).astype(np.int64).reshape(rows, cols + 1)
                bits = (luma[:, 1:] > luma[:, :-1]).reshape(-1)
                phash = np.uint64(np.sum(weights[bits], dtype=np.uint64))
                out.append(
                    {"media_id": int(row["media_id"]),
                     "phash": int(phash.astype(np.int64))}
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, schema=DHASH_SCHEMA
    )


def synthesize_video_frames(
    spark, n_base: int = 24, frames: int = 8, partitions: int = 8
) -> DataFrame:
    """Deterministic video corpus, one row per (video, frame): every base
    video (video_id = 2*b) has a re-encoded variant (video_id = 2*b + 1)
    whose frames are one-byte retouches of the base frames EXCEPT every
    4th frame, which is replaced outright (the inserted-ad / keyframe-
    swap case a frame-level matcher must tolerate).

    media_id packs (video, frame) as video_id*1000 + frame_idx so the
    frame table plugs straight into ``dhash64`` and the packed-Hamming
    kernel unchanged.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for base in pdf["id"]:
                base = int(base)
                for f in range(frames):
                    body = bytearray(
                        hashlib.sha256(f"video:{base}:{f}".encode()).digest() * 4
                    )
                    header = struct.pack("<iii", 64, 64, 0)
                    rows.append(
                        {"media_id": (2 * base) * 1000 + f, "kind": "video",
                         "payload": header + bytes(body),
                         "meta": {"width": 64, "height": 64,
                                  "duration_ms": 0, "codec": "stub"}}
                    )
                    if f % 4 == 3:  # variant: replaced frame
                        vbody = bytearray(
                            hashlib.sha256(
                                f"replaced:{base}:{f}".encode()
                            ).digest() * 4
                        )
                    else:  # variant: one-byte retouch (re-encode noise)
                        vbody = bytearray(body)
                        vbody[37] = (vbody[37] + 101) % 256
                    rows.append(
                        {"media_id": (2 * base + 1) * 1000 + f,
                         "kind": "video", "payload": header + bytes(vbody),
                         "meta": {"width": 64, "height": 64,
                                  "duration_ms": 0, "codec": "stub"}}
                    )
            yield pd.DataFrame(rows)

    return (
        spark.range(n_base)
        .repartition(partitions)
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


def synthesize_audio_pairs(
    spark, n_base: int = 40, partitions: int = 8
) -> DataFrame:
    """Deterministic audio corpus with planted near-duplicates: every
    base clip (media_id = 2*b) has a re-encoded variant (2*b + 1) whose
    sample stream differs in exactly ONE byte — the synthetic stand-in
    for a transcoded copy of the same recording.

    Payload layout matches ``synthesize_media`` (12-byte header + body);
    the body is sha256("audio:b") repeated, so the stub decoder and a
    SQL oracle can replay the exact samples from the media_id alone.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for base in pdf["id"]:
                base = int(base)
                dur = 1000 + (base * 13) % 9000
                body = bytearray(
                    hashlib.sha256(f"audio:{base}".encode()).digest() * 11
                )
                header = struct.pack("<iii", 8000, len(body), dur)
                meta = {"width": 8000, "height": 1, "duration_ms": dur,
                        "codec": "stub"}
                rows.append(
                    {"media_id": 2 * base, "kind": "audio",
                     "payload": header + bytes(body), "meta": meta}
                )
                variant = bytearray(body)
                variant[137] = (variant[137] + 101) % 256  # transcode blip
                rows.append(
                    {"media_id": 2 * base + 1, "kind": "audio",
                     "payload": header + bytes(variant), "meta": meta}
                )
            yield pd.DataFrame(rows)

    return (
        spark.range(n_base)
        .repartition(partitions)
        .mapInPandas(gen, schema=MEDIA_SCHEMA)
    )


AFP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("afp", T.LongType()),
    ]
)


def energy_sign_fingerprint(
    media: DataFrame, windows: int = 64, stride: int = 5, width: int = 4
) -> DataFrame:
    """Acoustic fingerprint packed to ONE int64 — the Shazam-family
    shape: frame the sample stream into overlapping energy windows and
    keep the SIGN of each successive energy delta (robust to gain and
    codec noise, brittle only to time shifts, like the published
    energy-difference fingerprints).

    The DECODE step is the stub (no codecs in the container): samples
    are the payload body bytes — swap that line for a real PCM decode
    in deployment.  The stride (5) is coprime to the synthetic body's
    sha-repeat period so window energies do not degenerate; everything
    else (Arrow-batched mapInPandas, vectorized numpy windowing, int64
    signatures feeding the banded-Hamming join) is the production path:
    8 bytes/clip at 100 TB, payload bytes touched exactly once.
    """
    n_bytes = stride * windows + width

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        idx = (
            stride * np.arange(windows + 1)[:, None]
            + np.arange(width)[None, :]
        )
        weights = np.left_shift(
            np.ones(windows, dtype=np.uint64),
            np.arange(windows, dtype=np.uint64),
        )
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                # STUB decode: samples = body bytes
                samples = np.frombuffer(
                    bytes(payload[12:12 + n_bytes]), dtype=np.uint8
                ).astype(np.int64)
                e = samples[idx].sum(axis=1)
                bits = e[1:] > e[:-1]
                afp = np.uint64(np.sum(weights[bits], dtype=np.uint64))
                out.append(
                    {"media_id": int(row["media_id"]),
                     "afp": int(afp.astype(np.int64))}
                )
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, schema=AFP_SCHEMA
    )
