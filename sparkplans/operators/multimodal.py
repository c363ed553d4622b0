"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns with typed metadata; compute-heavy
per-item work (decode, resize, feature extraction, frame sampling)
runs as Arrow-batched pandas iterators via ``mapInPandas`` — the
Spark-idiomatic shape for Python-side media processing: each task
pulls record batches, processes locally, emits batches; no driver
involvement, scales with partitions.

Codec reality map: TWO image formats are fully real with no external
library — PPM (pure numpy) and PNG (stdlib zlib + numpy unfiltering;
see ``encode_png``/``decode_png``) — covering decode, featurize, and
resize end-to-end.  The remaining paths that genuinely need external
codecs (generic PIL formats, WAV/audio resampling, MP4 frame
extraction) are stubbed behind ``_HAVE_CODECS``: real Spark plumbing
(schemas, batching, partition flow) with a deterministic fake decode,
and a ``NotImplementedError`` on the true path.  Swap
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


# ---------------------------------------------------------------------
# A SECOND real codec path: PNG in stdlib zlib + numpy
# ---------------------------------------------------------------------
# PNG needs no external library either: chunks are length/type/CRC
# framing, IDAT is zlib (stdlib), and scanline unfiltering (None /
# Sub / Up / Average / Paeth) is numpy row arithmetic.  This upgrades
# the round-1 `_HAVE_CODECS=False` PNG stub to a fully real branch —
# encode, decode, featurize, resize — through the identical
# mapInPandas plumbing.  8-bit RGB/RGBA, non-interlaced (the common
# case for generated/training imagery); anything else raises.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(arr, filter_per_row: bool = True) -> bytes:
    """Encode an (h, w, 3|4) uint8 array as PNG.  With
    ``filter_per_row`` the encoder cycles through all five scanline
    filters (row i uses filter i % 5), so round-trip tests exercise
    every unfilter branch of :func:`decode_png`."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype="uint8")
    h, w, c = a.shape
    assert c in (3, 4), "RGB or RGBA"
    color_type = 2 if c == 3 else 6
    bpp = c
    raw = a.reshape(h, w * c).astype("int16")
    zero = np.zeros(w * c, dtype="int16")
    lines = []
    for y in range(h):
        cur, prev = raw[y], (raw[y - 1] if y > 0 else zero)
        left = np.concatenate([np.zeros(bpp, dtype="int16"), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype="int16"), prev[:-bpp]])
        ft = y % 5 if filter_per_row else 0
        if ft == 0:
            filt = cur
        elif ft == 1:
            filt = cur - left
        elif ft == 2:
            filt = cur - prev
        elif ft == 3:
            filt = cur - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = cur - pred
        lines.append(bytes([ft]) + (filt % 256).astype("uint8").tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Decode an 8-bit RGB/RGBA non-interlaced PNG to an (h, w, c)
    uint8 array.  Pure stdlib zlib + numpy: chunk CRCs are verified,
    IDAT is inflated, and each scanline is unfiltered (all five PNG
    filter types)."""
    import struct
    import zlib

    import numpy as np

    if not payload or not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, idat, meta = len(_PNG_SIG), [], None
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color_type not in (2, 6) or interlace != 0:
                raise ValueError(
                    "only 8-bit RGB/RGBA non-interlaced PNG supported"
                )
            meta = (w, h, 3 if color_type == 2 else 4)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("no IHDR chunk")
    w, h, c = meta
    stride, bpp = w * c, c
    data = zlib.decompress(b"".join(idat))
    if len(data) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype="int16")
    zero = np.zeros(stride, dtype="int16")
    for y in range(h):
        row = data[y * (stride + 1) : (y + 1) * (stride + 1)]
        ft = row[0]
        line = np.frombuffer(row, dtype="uint8", offset=1).astype("int16")
        prev = out[y - 1] if y > 0 else zero
        if ft == 0:
            rec = line
        elif ft == 1:  # Sub: per-lane cumulative sum mod 256
            rec = line.copy()
            lanes = rec.reshape(w, bpp)
            rec = (
                np.cumsum(lanes.astype("int64"), axis=0) % 256
            ).reshape(stride).astype("int16")
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: sequential left-dependency
            rec = np.zeros(stride, dtype="int16")
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                up = int(prev[x])
                upleft = int(out[y - 1][x - bpp]) if (y > 0 and x >= bpp) else 0
                if ft == 3:
                    pred = (int(left) + up) // 2
                else:
                    p = int(left) + up - upleft
                    pa, pb, pc = (
                        abs(p - int(left)),
                        abs(p - up),
                        abs(p - upleft),
                    )
                    pred = (
                        int(left)
                        if (pa <= pb and pa <= pc)
                        else (up if pb <= pc else upleft)
                    )
                rec[x] = (int(line[x]) + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = rec
    return out.astype("uint8").reshape(h, w, c)


def decode_png_features(media: DataFrame) -> DataFrame:
    """REAL decode + featurize for image/png payloads: per-channel
    pixel means from the actual decoded array — the PPM branch's twin,
    same Arrow-batched mapInPandas flow, no PIL anywhere."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            arrs = pdf["payload"].map(decode_png)
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

    return media.filter(F.col("mime") == "image/png").mapInPandas(
        batches, PPM_FEATURES_SCHEMA
    )


def resize_png_images(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """REAL nearest-neighbor resize for PNG payloads: decode,
    integer-stride resample, re-encode — actual pixels, not digests."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def rz(b: bytes) -> bytes:
                a = decode_png(b)
                h, w = a.shape[:2]
                yi = np.minimum((np.arange(height) * h) // height, h - 1)
                xi = np.minimum((np.arange(width) * w) // width, w - 1)
                return encode_png(a[yi][:, xi])

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(rz),
                }
            )

    return media.filter(F.col("mime") == "image/png").mapInPandas(
        batches, RESIZED_SCHEMA
    )


def synthetic_png_media(spark, n: int = 16) -> DataFrame:
    """Deterministic real PNG images (per-id gradients, varying sizes,
    alternating RGB/RGBA, every scanline filter exercised)."""
    import numpy as np

    rows = []
    for i in range(n):
        w, h = 8 + (i % 5) * 4, 6 + (i % 3) * 6
        c = 3 if i % 2 == 0 else 4
        yy, xx = np.mgrid[0:h, 0:w]
        chans = [
            (xx * 255 // max(w - 1, 1)).astype("uint8"),
            (yy * 255 // max(h - 1, 1)).astype("uint8"),
            np.full((h, w), i * 16 % 256, dtype="uint8"),
        ]
        if c == 4:
            chans.append(((xx + yy) * 7 % 256).astype("uint8"))
        a = np.stack(chans, axis=-1)
        rows.append((i, "image", "image/png", encode_png(a), w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


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
