"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns with typed metadata; compute-heavy
per-item work (decode, resize, feature extraction, frame sampling)
runs as Arrow-batched pandas iterators via ``mapInPandas`` — the
Spark-idiomatic shape for Python-side media processing: each task
pulls record batches, processes locally, emits batches; no driver
involvement, scales with partitions.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode kernels are stubbed behind ``_HAVE_CODECS``: real Spark
plumbing (schemas, batching, partition flow) with a deterministic
fake decode, and a ``NotImplementedError`` on the true path.  Swap
``_fake_decode_*`` for real codec calls in production.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_HAVE_CODECS = False  # PIL / ffmpeg / librosa not installed here

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),   # opaque encoded bytes
        StructField("width", IntegerType()),    # metadata (nullable)
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _fake_decode_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for decode->embed: n doubles derived
    from the payload digest.  Replace with a real decode + model."""
    dig = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in dig[:n]]


def extract_image_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode + featurize image payloads via mapInPandas (Arrow
    batches).  Partition-parallel; the UDF sees pandas DataFrames and
    never crosses the driver."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if _HAVE_CODECS:
                raise NotImplementedError("real image decode requires PIL — not in this container")
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "sha": pdf["payload"].map(lambda b: hashlib.sha256(b or b"").hexdigest()),
                    "features": pdf["payload"].map(_fake_decode_features),
                }
            )
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def extract_image_features_arrow(media: DataFrame) -> DataFrame:
    """`mapInArrow` twin of :func:`extract_image_features`: the UDF
    consumes raw ``pyarrow.RecordBatch``es with NO pandas conversion.
    For wide binary payloads this is the cheaper path at scale —
    pandas materializes every payload as a Python ``bytes`` object per
    row (copy + boxing), while Arrow keeps the batch in one
    contiguous buffer until the kernel actually reads a value.
    Output is bit-identical to the pandas twin (same digest kernel);
    tests assert equality."""
    import pyarrow as pa

    def batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in it:
            if _HAVE_CODECS:
                raise NotImplementedError("real image decode requires PIL — not in this container")
            ids = rb.column(rb.schema.get_field_index("media_id"))
            payloads = rb.column(rb.schema.get_field_index("payload")).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array([len(b) if b is not None else 0 for b in payloads], pa.int64()),
                    pa.array([hashlib.sha256(b or b"").hexdigest() for b in payloads], pa.string()),
                    pa.array([_fake_decode_features(b) for b in payloads], pa.list_(pa.float64())),
                ],
                names=["media_id", "n_bytes", "sha", "features"],
            )

    return media.filter(F.col("kind") == "image").mapInArrow(batches, IMAGE_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_sha", StringType()),
    ]
)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame
    (deterministic fake: digests of payload+idx).  Real impl would
    ffmpeg-decode inside the iterator."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if _HAVE_CODECS:
                raise NotImplementedError("real frame sampling requires ffmpeg — not in this container")
            rows = []
            for _, r in pdf.iterrows():
                n_frames = max(int((r["duration_ms"] or 0) // every_ms), 1)
                for i in range(n_frames):
                    digest = hashlib.sha256((r["payload"] or b"") + str(i).encode()).hexdigest()
                    rows.append((r["media_id"], i, digest))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sha"])

    return media.filter(F.col("kind") == "video").mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize plumbing: emits re-encoded payloads at the target size
    (deterministic fake: digest-derived bytes sized w*h/64 so batch
    shapes are realistic).  Real impl: PIL open/resize/save inside the
    iterator — same schema, same partition flow."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if _HAVE_CODECS:
                raise NotImplementedError("real resize requires PIL — not in this container")
            fake = pdf["payload"].map(
                lambda b: hashlib.sha256((b or b"") + f"{width}x{height}".encode()).digest()
                * max((width * height) // (64 * 32), 1)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": fake,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(batches, RESIZED_SCHEMA)


AUDIO_RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("chunk_sha", StringType()),
    ]
)


def resample_audio(media: DataFrame, target_hz: int = 16000) -> DataFrame:
    """Audio decode->resample plumbing: one row per audio item with
    the resampled length (exact arithmetic from duration metadata) and
    a digest standing in for the waveform.  Real impl: librosa/ffmpeg
    load + resample inside the iterator."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if _HAVE_CODECS:
                raise NotImplementedError("real resampling requires librosa — not in this container")
            dur = pdf["duration_ms"].fillna(0).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": target_hz,
                    "n_samples": dur * target_hz // 1000,
                    "chunk_sha": pdf["payload"].map(
                        lambda b: hashlib.sha256((b or b"") + str(target_hz).encode()).hexdigest()
                    ),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(batches, AUDIO_RESAMPLE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = repeated
    digest bytes; metadata consistent with kind)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 8)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                payload,
                64 + i if kind == "image" else None,
                48 + i if kind == "image" else None,
                3000 + 500 * i if kind in ("audio", "video") else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------
# A REAL codec path: PPM (P6) images in pure numpy
# ---------------------------------------------------------------------
# PPM needs no external codec library, so this branch of the multimodal
# surface is fully real end-to-end: binary payloads decode to pixel
# arrays, resize is actual nearest-neighbor resampling, and features
# are computed from real pixels — same mapInPandas plumbing the
# stubbed PNG/WAV/MP4 paths use, proving the pattern with bytes the
# tests can verify numerically.

PPM_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channel_means", ArrayType(DoubleType())),
    ]
)


def encode_ppm(arr) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6)."""
    import numpy as np

    a = np.asarray(arr, dtype="uint8")
    h, w, c = a.shape
    assert c == 3, "PPM is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes):
    """Decode binary PPM (P6) to an (h, w, 3) uint8 array."""
    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens; '#' comments run to end-of-line
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while payload[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = tokens
    assert maxval == 255, "8-bit PPM only"
    return np.frombuffer(payload, dtype="uint8", count=w * h * 3, offset=i).reshape(h, w, 3)


def decode_ppm_features(media: DataFrame) -> DataFrame:
    """REAL decode + featurize for image/x-portable-pixmap payloads:
    per-channel pixel means from the actual decoded array, via the
    same Arrow-batched mapInPandas flow as the stubbed codecs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            arrs = pdf["payload"].map(decode_ppm)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": arrs.map(lambda a: a.shape[1]).astype("int32"),
                    "height": arrs.map(lambda a: a.shape[0]).astype("int32"),
                    "channel_means": arrs.map(
                        lambda a: [float(m) for m in a.mean(axis=(0, 1))]
                    ),
                }
            )

    return media.filter(F.col("mime") == "image/x-portable-pixmap").mapInPandas(
        batches, PPM_FEATURES_SCHEMA
    )


def resize_ppm_images(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """REAL nearest-neighbor resize for PPM payloads: decode, resample
    with integer index striding, re-encode — the actual pixel
    transform, not a digest stand-in."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def rz(b: bytes) -> bytes:
                a = decode_ppm(b)
                h, w = a.shape[:2]
                yi = np.minimum((np.arange(height) * h) // height, h - 1)
                xi = np.minimum((np.arange(width) * w) // width, w - 1)
                return encode_ppm(a[yi][:, xi])

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(rz),
                }
            )

    return media.filter(F.col("mime") == "image/x-portable-pixmap").mapInPandas(
        batches, RESIZED_SCHEMA
    )


def synthetic_ppm_media(spark, n: int = 16) -> DataFrame:
    """Deterministic real PPM images (per-id gradient patterns,
    varying sizes) as a media table — every byte decodable."""
    import numpy as np

    rows = []
    for i in range(n):
        w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 6
        yy, xx = np.mgrid[0:h, 0:w]
        a = np.stack(
            [
                (xx * 255 // max(w - 1, 1)).astype("uint8"),
                (yy * 255 // max(h - 1, 1)).astype("uint8"),
                np.full((h, w), i * 16 % 256, dtype="uint8"),
            ],
            axis=-1,
        )
        rows.append((i, "image", "image/x-portable-pixmap", encode_ppm(a), w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
