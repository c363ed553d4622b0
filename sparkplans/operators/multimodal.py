"""Multimodal (image/audio/video) column handling.

Media are opaque ``binary`` columns with typed metadata; compute-heavy
per-item work (decode, resize, feature extraction, frame sampling)
runs as Arrow-batched pandas iterators via ``mapInPandas`` — the
Spark-idiomatic shape for Python-side media processing: each task
pulls record batches, processes locally, emits batches; no driver
involvement, scales with partitions.

Codec reality map: ALL THREE modalities have fully real branches with
no external library —
  images: PPM (pure numpy), PNG incl. Adam7 interlace (stdlib zlib
          + numpy unfiltering), BMP (struct + numpy), JPEG — baseline
          4:4:4/4:2:0 AND progressive SOF2 (full T.81
          encoder/decoder in operators/jpeg), GIF incl. animation +
          LZW + interlace (operators/gif), plus a magic-sniffing
          ``decode_image`` dispatcher → decode / featurize / resize;
  audio:  WAV PCM16 + G.711 mu-law/A-law telephony codings (struct
          + numpy) → decode / linear-interp resample /
          RMS-ZCR-spectral-centroid features / voice-activity
          detection;
  video:  Y4M / YUV4MPEG2 (ffmpeg's uncompressed interchange format,
          pure numpy) → decode / timestamp frame sampling /
          scene-cut detection; animated GIF frames sample over their
          own delay timeline through the same schema.
The DEFAULT API names (`extract_image_features`, `resize_images`,
`sample_video_frames`, `resample_audio`) all run these real codecs —
payloads are sniffed by magic bytes and dispatched to the matching
decoder; unknown formats raise ``ValueError``, the honest boundary of
a container with no external codec libraries.  The ``*_real`` names
remain as compatibility aliases.  Compressed bitstreams that would
need external libraries (MP3/OGG frames, H.264/MP4 video) get REAL
container-level metadata probes instead (`extract_media_metadata` /
operators/mediaprobe: MP4 box walk, MP3 frame headers), because
duration/codec/bitrate gates are what a pipeline needs from them.

**Round-8 decision — MP3/OGG/H.264 stay metadata-probe-only,
permanently (this container).**  Considered writing clean-room
bitstream decoders; rejected because (a) the codec *pattern* —
sniff → Arrow-batched decode → typed features — is already proven on
five real image formats plus WAV/G.711/Y4M, so a sixth decoder adds
engineering risk without adding architectural evidence; (b) these
three are the formats where a correct clean-room decoder is a
multi-thousand-line DSP/entropy-coding project (MDCT + Huffman for
MP3, CABAC for H.264) that no data-pipeline team would hand-roll —
the production answer is a library (ffmpeg/libsndfile) slotted into
the SAME mapInPandas stage, a one-line swap this module's structure
already accommodates; (c) every curation gate the registered queries
need from these formats (duration, codec id, bitrate, channel
layout) is served losslessly by the container probes, which ARE
real parsers.  What would change it: the container gaining a codec
library, or a query needing sample-level features from these formats
(none does).  The dispatchers raise ``ValueError`` for their
payloads — the honest boundary — and this paragraph is the recorded
keep/drop decision so the item leaves the round-over-round carried
list.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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

def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + featurize image payloads via mapInPandas (Arrow
    batches), REAL end-to-end: each payload is sniffed by magic bytes
    and decoded with the matching pure-python codec
    (:func:`decode_image` — PNG/PPM/BMP/JPEG/GIF), emitting actual
    width/height and per-channel pixel means.  Partition-parallel; the
    UDF sees pandas DataFrames and never crosses the driver."""
    return extract_image_features_real(media)


def extract_image_features_arrow(media: DataFrame) -> DataFrame:
    """`mapInArrow` twin of :func:`extract_image_features`: the UDF
    consumes raw ``pyarrow.RecordBatch``es with NO pandas conversion.
    For wide binary payloads this is the cheaper path at scale —
    pandas materializes every payload as a Python ``bytes`` object per
    row (copy + boxing), while Arrow keeps the batch in one
    contiguous buffer until the kernel actually reads a value.
    Same real decode kernel (:func:`decode_image`), bit-identical
    output to the pandas twin; tests assert equality."""
    import pyarrow as pa

    def batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in it:
            ids = rb.column(rb.schema.get_field_index("media_id"))
            arrs = [
                decode_image(b)
                for b in rb.column(rb.schema.get_field_index("payload")).to_pylist()
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array([a.shape[1] for a in arrs], pa.int32()),
                    pa.array([a.shape[0] for a in arrs], pa.int32()),
                    pa.array(
                        [[float(m) for m in a.mean(axis=(0, 1))] for a in arrs],
                        pa.list_(pa.float64()),
                    ),
                ],
                names=["media_id", "width", "height", "channel_means"],
            )

    return media.filter(F.col("kind") == "image").mapInArrow(
        batches, PPM_FEATURES_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling over video payloads, format-sniffed per
    row: Y4M/YUV4MPEG2 decodes with the pure-numpy codec; animated GIF
    composites frames over the stream's own delay timeline.  One
    output row per every_ms tick with the active frame's actual luma
    statistics (same schema as :func:`sample_y4m_frames`)."""
    import numpy as np

    def frame_rows(media_id, payload: bytes, rows: list) -> None:
        b = bytes(payload)
        if b.startswith(b"YUV4MPEG2"):
            frames, fps = decode_y4m(b)
            n = frames.shape[0]
            if n == 0:
                return
            dur_ms = n / fps * 1000
            t = 0.0
            while t < dur_ms:
                idx = min(int(round(t / 1000 * fps)), n - 1)
                y = frames[idx, :, :, 0].astype("float64")
                rows.append(
                    (media_id, idx, int(t), float(y.mean()), float(y.std()))
                )
                t += every_ms
            return
        if b.startswith(b"GIF8"):
            from sparkplans.operators.gif import decode_gif

            frames, delays = decode_gif(b)
            total = sum(delays)
            starts = np.cumsum([0] + delays[:-1])
            t = 0
            while t < total:
                idx = int(np.searchsorted(starts, t, side="right") - 1)
                y = (
                    0.299 * frames[idx, :, :, 0]
                    + 0.587 * frames[idx, :, :, 1]
                    + 0.114 * frames[idx, :, :, 2]
                ).astype("float64")
                rows.append(
                    (media_id, idx, int(t), float(y.mean()), float(y.std()))
                )
                t += every_ms
            return
        raise ValueError(
            "unsupported video format (Y4M / animated GIF decodable here)"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list = []
            for _, r in pdf.iterrows():
                frame_rows(r["media_id"], r["payload"], rows)
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "t_ms", "luma_mean", "luma_std"],
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        batches, Y4M_FRAME_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """REAL format-generic resize: sniff + decode with the matching
    codec, nearest-neighbor resample, re-encode in the SAME format
    (PPM/PNG/BMP lossless; JPEG at q=85).  Delegates to
    :func:`resize_images_real` (kept as a compatibility alias)."""
    return resize_images_real(media, width=width, height=height)


def resample_audio(media: DataFrame, target_hz: int = 16000) -> DataFrame:
    """REAL audio resample: decode WAV PCM16, linear-interpolate to
    ``target_hz``, re-encode — actual waveforms, not digests.
    Delegates to :func:`resample_wav_audio` (kept as a compatibility
    alias)."""
    return resample_wav_audio(media, target_hz=target_hz)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL media table for tests: PNG gradient images,
    WAV sine-tone audio, Y4M gradient video — every payload decodes
    with this module's own codecs, and the metadata columns are
    derived from (not asserted onto) the actual payloads."""
    import numpy as np

    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
            yy, xx = np.mgrid[0:h, 0:w]
            a = np.stack(
                [
                    (xx * 255 // max(w - 1, 1)).astype("uint8"),
                    (yy * 255 // max(h - 1, 1)).astype("uint8"),
                    np.full((h, w), i * 16 % 256, dtype="uint8"),
                ],
                axis=-1,
            )
            rows.append((i, kind, "image/png", encode_png(a), w, h, None))
        elif kind == "audio":
            rate = (8000, 16000)[i % 2]
            dur_ms = 100 + 50 * (i % 4)
            t = np.arange(rate * dur_ms // 1000) / rate
            pcm = np.round(
                32000 * 0.5 * np.sin(2 * np.pi * 220.0 * (1 + i % 5) * t)
            ).astype("<i2")
            rows.append(
                (i, kind, "audio/wav", encode_wav(pcm, rate), None, None, dur_ms)
            )
        else:
            w, h, fps = 16, 12, 10
            n_frames = 4 + (i % 3) * 2
            frames = np.zeros((n_frames, h, w, 3), dtype="uint8")
            for f in range(n_frames):
                frames[f, :, :, 0] = (i * 8 + f * 16) % 256
                frames[f, :, :, 1] = (f * 32) % 256
            rows.append(
                (
                    i,
                    kind,
                    "video/x-yuv4mpeg",
                    encode_y4m(frames, fps, 1),
                    w,
                    h,
                    int(n_frames / fps * 1000),
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
# the round-1 PNG stub to a fully real branch —
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


# Adam7 interlace pass grid: (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_filter_subimage(a, filter_per_row: bool) -> bytes:
    """Filter one (sub)image's scanlines (filter byte + filtered row
    each); row i cycles filter i % 5 when ``filter_per_row``."""
    import numpy as np

    h, w, c = a.shape
    if h == 0 or w == 0:
        return b""
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
    return b"".join(lines)


def encode_png(arr, filter_per_row: bool = True, interlace: bool = False) -> bytes:
    """Encode an (h, w, 1|2|3|4) (or (h, w)) uint8 array as PNG
    (gray / gray+alpha / RGB / RGBA), optionally Adam7-interlaced
    (``interlace=True`` — the progressive web-PNG layout: seven
    subsampled passes, each filtered independently).  With
    ``filter_per_row`` the encoder cycles through all five scanline
    filters (row i uses filter i % 5), so round-trip tests exercise
    every unfilter branch of :func:`decode_png`."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype="uint8")
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    assert c in (1, 2, 3, 4), "gray / gray+alpha / RGB / RGBA"
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if interlace:
        body = b"".join(
            _png_filter_subimage(a[y0::dy, x0::dx], filter_per_row)
            for (x0, y0, dx, dy) in _ADAM7
        )
    else:
        body = _png_filter_subimage(a, filter_per_row)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(body))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Decode an 8-bit gray/gray+alpha/RGB/RGBA non-interlaced PNG
    to an (h, w, c) uint8 array.  Pure stdlib zlib + numpy: chunk CRCs are verified,
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
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if depth != 8 or channels is None or interlace not in (0, 1):
                raise ValueError(
                    "only 8-bit gray/gray+alpha/RGB/RGBA PNG supported"
                )
            meta = (w, h, channels, interlace)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("no IHDR chunk")
    w, h, c, interlace = meta
    data = zlib.decompress(b"".join(idat))
    if interlace == 0:
        img, consumed = _png_unfilter_subimage(data, 0, h, w, c)
        if consumed != len(data):
            raise ValueError("IDAT length mismatch")
        return img
    # Adam7: seven independently-filtered subsampled passes
    out = np.zeros((h, w, c), dtype="uint8")
    offset = 0
    for (x0, y0, dx, dy) in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        sub, offset = _png_unfilter_subimage(data, offset, ph, pw, c)
        if ph and pw:
            out[y0::dy, x0::dx] = sub
    if offset != len(data):
        raise ValueError("IDAT length mismatch")
    return out


def _png_unfilter_subimage(data: bytes, offset: int, h: int, w: int, c: int):
    """Unfilter one (sub)image of h rows x w pixels starting at
    ``offset`` in the inflated stream; returns (array, new_offset)."""
    import numpy as np

    if h == 0 or w == 0:
        return np.zeros((h, w, c), dtype="uint8"), offset
    stride, bpp = w * c, c
    need = h * (stride + 1)
    if offset + need > len(data):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype="int16")
    zero = np.zeros(stride, dtype="int16")
    for y in range(h):
        base = offset + y * (stride + 1)
        row = data[base : base + stride + 1]
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
    return out.astype("uint8").reshape(h, w, c), offset + need


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


# ---------------------------------------------------------------------
# A THIRD real codec path: WAV (PCM16) in stdlib struct + numpy
# ---------------------------------------------------------------------
# RIFF/WAVE PCM needs no external library: the container is
# length-framed chunks (struct), samples are little-endian int16
# (numpy frombuffer).  This upgrades the round-1 audio stub to a fully
# real branch — decode, resample (linear interpolation), feature
# extraction (RMS / zero-crossing rate / spectral centroid over a real
# numpy FFT) — through the identical mapInPandas plumbing.

WAV_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossing_rate", DoubleType()),
        StructField("spectral_centroid_hz", DoubleType()),
    ]
)

WAV_RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Encode an (n,) or (n, channels) int16 array as RIFF/WAVE PCM16."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mulaw_expand(u):
    """ITU-T G.711 mu-law byte -> linear PCM16 (vectorized numpy)."""
    import numpy as np

    u = ~np.asarray(u, dtype=np.uint8)
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = (u & 0x0F).astype(np.int32)
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_expand(a):
    """ITU-T G.711 A-law byte -> linear PCM16 (vectorized numpy)."""
    import numpy as np

    a = np.asarray(a, dtype=np.uint8) ^ 0x55
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 0x07
    mant = (a & 0x0F).astype(np.int32)
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign, -mag, mag).astype(np.int16)


def mulaw_compress(pcm) -> "bytes":
    """Linear PCM16 -> G.711 mu-law bytes (the encoder used by the
    synthetic telephony fixtures; inverse of :func:`_mulaw_expand`)."""
    import numpy as np

    x = np.asarray(pcm, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8).tobytes()


def decode_wav(payload: bytes):
    """Decode RIFF/WAVE to ((n, channels) int16 array, rate).  Walks
    the chunk list (tolerating extra chunks like LIST/fact).  Formats:
    PCM16 (1), A-law (6) and mu-law (7) — the G.711 codings used by
    telephony/speech corpora, expanded to linear PCM16."""
    import struct

    import numpy as np

    if not payload or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        typ = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + length]
        if typ == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", chunk[:16])
            if audio_fmt == 1 and bits == 16:
                pass
            elif audio_fmt in (6, 7) and bits == 8:
                pass
            else:
                raise ValueError("only PCM16 / G.711 A-law / mu-law WAV supported")
            fmt = (audio_fmt, ch, rate)
        elif typ == b"data":
            data = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate = fmt
    if audio_fmt == 1:
        a = np.frombuffer(data, dtype="<i2")
    elif audio_fmt == 7:
        a = _mulaw_expand(np.frombuffer(data, dtype=np.uint8))
    else:
        a = _alaw_expand(np.frombuffer(data, dtype=np.uint8))
    return a.reshape(len(a) // ch, ch), rate


def encode_wav_g711(samples, sample_rate: int = 8000, law: str = "mulaw") -> bytes:
    """Encode int16 samples as an 8-bit G.711 WAV (format 7 mu-law or
    6 A-law) — the telephony container."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if law == "mulaw":
        data, code = mulaw_compress(a.reshape(-1)), 7
    else:
        # A-law compress via inverting the expand table (exact for
        # every byte value: build the 256-entry codebook and match)
        lut = _alaw_expand(np.arange(256, dtype=np.uint8)).astype(np.int32)
        flat = a.reshape(-1).astype(np.int32)
        data = np.abs(flat[:, None] - lut[None, :]).argmin(axis=1).astype(
            np.uint8
        ).tobytes()
        code = 6
    byte_rate = sample_rate * ch
    fmt = struct.pack("<HHIIHH", code, ch, sample_rate, byte_rate, ch, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_feature_row(payload: bytes) -> tuple:
    """Real audio features from decoded PCM: RMS level, zero-crossing
    rate, and spectral centroid (magnitude-weighted mean frequency of
    the rfft) — the standard cheap audio-quality trio."""
    import numpy as np

    a, rate = decode_wav(payload)
    mono = a.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    if n > 1:
        mag = np.abs(np.fft.rfft(mono))
        freqs = np.fft.rfftfreq(n, d=1.0 / rate)
        tot = mag.sum()
        centroid = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
    else:
        centroid = 0.0
    return rate, n, a.shape[1], rms, zcr, centroid


def decode_wav_features(media: DataFrame) -> DataFrame:
    """REAL decode + featurize for audio/wav payloads — the PNG/PPM
    branches' audio twin, same Arrow-batched mapInPandas flow."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(wav_feature_row)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": feats.map(lambda t: t[0]).astype("int32"),
                    "n_samples": feats.map(lambda t: t[1]).astype("int64"),
                    "n_channels": feats.map(lambda t: t[2]).astype("int32"),
                    "rms": feats.map(lambda t: t[3]),
                    "zero_crossing_rate": feats.map(lambda t: t[4]),
                    "spectral_centroid_hz": feats.map(lambda t: t[5]),
                }
            )

    return media.filter(F.col("mime") == "audio/wav").mapInPandas(
        batches, WAV_FEATURES_SCHEMA
    )


def resample_wav(payload: bytes, target_hz: int):
    """Linear-interpolation resample of PCM16 to target_hz; returns the
    re-encoded WAV bytes.  np.interp per channel — the real transform
    the round-1 stub only described."""
    import numpy as np

    a, rate = decode_wav(payload)
    if rate == target_hz:
        return encode_wav(a, rate)
    n = a.shape[0]
    m = max(int(round(n * target_hz / rate)), 1)
    src_t = np.arange(n) / rate
    dst_t = np.arange(m) / target_hz
    out = np.stack(
        [np.interp(dst_t, src_t, a[:, c].astype("float64")) for c in range(a.shape[1])],
        axis=1,
    )
    return encode_wav(np.clip(np.round(out), -32768, 32767).astype("<i2"), target_hz)


def resample_wav_audio(media: DataFrame, target_hz: int = 16000) -> DataFrame:
    """REAL audio resample for audio/wav payloads: decode, linear-interp
    to target_hz, re-encode — actual waveforms, not digests."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf["payload"].map(lambda b: resample_wav(bytes(b), target_hz))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": target_hz,
                    "n_samples": out.map(lambda b: decode_wav(b)[0].shape[0]).astype("int64"),
                    "payload": out,
                }
            )

    return media.filter(F.col("mime") == "audio/wav").mapInPandas(
        batches, WAV_RESAMPLE_SCHEMA
    )


def synthetic_wav_media(spark, n: int = 12) -> DataFrame:
    """Deterministic real WAV payloads: per-id sine (and mixed-tone)
    waveforms at varying rates/durations, mono and stereo."""
    import numpy as np

    rows = []
    for i in range(n):
        rate = (8000, 16000, 44100)[i % 3]
        dur_ms = 200 + 100 * (i % 4)
        t = np.arange(int(rate * dur_ms / 1000)) / rate
        f0 = 220.0 * (1 + i % 5)
        wave = 0.5 * np.sin(2 * np.pi * f0 * t)
        if i % 2:  # add a second tone so the spectrum isn't a pure line
            wave = wave + 0.25 * np.sin(2 * np.pi * 2.5 * f0 * t)
        pcm = np.round(wave * 32000).astype("<i2")
        if i % 4 == 3:  # stereo: right channel phase-shifted
            pcm = np.stack([pcm, np.roll(pcm, rate // 100)], axis=1)
        rows.append(
            (i, "audio", "audio/wav", encode_wav(pcm, rate), None, None, dur_ms)
        )
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


# ---------------------------------------------------------------------
# BMP (24-bit) in stdlib struct + numpy, and a magic-sniffing
# generic-image dispatcher
# ---------------------------------------------------------------------
# 24-bit uncompressed BMP is a 14-byte file header + 40-byte
# BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes — all
# struct/numpy.  With PNG, PPM and BMP real, `decode_image` sniffs the
# payload magic and dispatches, so the *generic* image path
# (extract_image_features_real) is fully real for every format this
# container can legally decode; only formats that genuinely require
# external codecs (JPEG etc.) still raise.


def encode_bmp(arr) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as 24-bit uncompressed BMP
    (bottom-up BGR rows, 4-byte padded)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype="uint8")
    h, w, c = a.shape
    assert c == 3, "24-bit BMP is RGB"
    pad = (-3 * w) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(a[y, :, ::-1].tobytes() + b"\x00" * pad)
    data = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def decode_bmp(payload: bytes):
    """Decode 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array.
    Handles bottom-up and top-down (negative height) row order."""
    import struct

    import numpy as np

    if not payload or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack("<I", payload[10:14])
    hdr_size, w, h = struct.unpack("<Iii", payload[14:26])
    planes, bits, compression = struct.unpack("<HHI", payload[26:34])
    if bits != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    top_down = h < 0
    h = abs(h)
    stride = 3 * w + ((-3 * w) % 4)
    raw = np.frombuffer(payload, dtype="uint8", count=stride * h, offset=offset)
    rows = raw.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_image(payload: bytes):
    """Sniff the payload magic and decode with the matching REAL codec
    (PNG / PPM / BMP / baseline JPEG — see operators/jpeg).  Unknown
    formats raise — the honest boundary of a container with no
    external codec libraries."""
    if payload is None:
        raise ValueError("null image payload")
    b = bytes(payload)
    if b.startswith(_PNG_SIG):
        return decode_png(b)
    if b.startswith(b"P6"):
        return decode_ppm(b)
    if b.startswith(b"BM"):
        return decode_bmp(b)
    if b.startswith(b"\xff\xd8"):
        from sparkplans.operators.jpeg import decode_jpeg

        return decode_jpeg(b)
    if b.startswith(b"GIF8"):
        from sparkplans.operators.gif import decode_gif

        return decode_gif(b)[0][0]  # first frame of a (possibly animated) GIF
    raise ValueError(
        "unsupported image format (PNG/PPM/BMP/JPEG/GIF decodable here)"
    )


def extract_image_features_real(media: DataFrame) -> DataFrame:
    """The generic image-features path, REAL end-to-end: sniff + decode
    each payload with decode_image and emit actual pixel statistics
    (width/height + per-channel means) — format-agnostic across every
    codec this module implements."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            arrs = pdf["payload"].map(decode_image)
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

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, PPM_FEATURES_SCHEMA
    )


# ---------------------------------------------------------------------
# A FOURTH real codec path: Y4M (YUV4MPEG2) video in pure numpy
# ---------------------------------------------------------------------
# YUV4MPEG2 is ffmpeg's uncompressed interchange format: one ASCII
# header line (`YUV4MPEG2 W.. H.. F<num>:<den> .. C444`), then
# `FRAME\n` + raw planar YUV per frame.  No external codec needed, so
# the round-1 video stub (digest fakes) gains a fully real branch:
# decode, timestamp-accurate frame sampling, per-frame luma features,
# and scene-cut detection — all real pixels, same mapInPandas flow.

Y4M_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("t_ms", LongType()),
        StructField("luma_mean", DoubleType()),
        StructField("luma_std", DoubleType()),
    ]
)

SCENE_CUT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("t_ms", LongType()),
        StructField("luma_delta", DoubleType()),
    ]
)


def encode_y4m(frames, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """Encode an (n_frames, h, w, 3) uint8 YUV array as YUV4MPEG2
    (C444 planar: full-resolution U and V planes, no subsampling)."""
    import numpy as np

    a = np.asarray(frames, dtype="uint8")
    n, h, w, c = a.shape
    assert c == 3, "YUV 3-plane"
    header = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C444\n" % (w, h, fps_num, fps_den)
    parts = [header]
    for f in range(n):
        # planar: all Y, then all U, then all V
        parts.append(b"FRAME\n" + a[f].transpose(2, 0, 1).tobytes())
    return b"".join(parts)


def decode_y4m(payload: bytes):
    """Decode YUV4MPEG2 (C444) to ((n, h, w, 3) uint8 array, fps).
    Pure numpy; rejects subsampled or non-8-bit variants."""
    import numpy as np

    if not payload or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    fps_num, fps_den = 25, 1
    colorspace = "C420jpeg"  # spec default when absent
    for tok in payload[10:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            fps_num, fps_den = (int(x) for x in val.split(b":"))
        elif tag == b"C":
            colorspace = "C" + val.decode()
    if w is None or h is None:
        raise ValueError("missing W/H in Y4M header")
    if colorspace != "C444":
        raise ValueError("only C444 (no chroma subsampling) supported")
    frame_bytes = 3 * w * h
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        planes = np.frombuffer(payload, dtype="uint8", count=frame_bytes, offset=fnl + 1)
        frames.append(planes.reshape(3, h, w).transpose(1, 2, 0))
        pos = fnl + 1 + frame_bytes
    return np.stack(frames) if frames else np.zeros((0, h, w, 3), "uint8"), fps_num / fps_den


def sample_y4m_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """REAL frame sampling for video/x-yuv4mpeg payloads: decode, pick
    the frame nearest each every_ms timestamp, emit actual luma
    statistics.  One output row per sampled frame — the video twin of
    the image/audio real branches."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                frames, fps = decode_y4m(bytes(r["payload"]))
                n = frames.shape[0]
                if n == 0:
                    continue
                dur_ms = n / fps * 1000
                t = 0.0
                while t < dur_ms:
                    idx = min(int(round(t / 1000 * fps)), n - 1)
                    y = frames[idx, :, :, 0].astype("float64")
                    rows.append(
                        (r["media_id"], idx, int(t), float(y.mean()), float(y.std()))
                    )
                    t += every_ms
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "t_ms", "luma_mean", "luma_std"]
            )

    return media.filter(F.col("mime") == "video/x-yuv4mpeg").mapInPandas(
        batches, Y4M_FRAME_SCHEMA
    )


def detect_scene_cuts(media: DataFrame, threshold: float = 30.0) -> DataFrame:
    """Scene-cut detection over real decoded frames: a cut is a frame
    whose mean absolute luma delta vs the previous frame exceeds
    ``threshold`` (0-255 scale).  The canonical first step of a video
    training-data pipeline (keyframe selection / shot segmentation)."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                frames, fps = decode_y4m(bytes(r["payload"]))
                if frames.shape[0] < 2:
                    continue
                y = frames[:, :, :, 0].astype("float64")
                deltas = np.abs(y[1:] - y[:-1]).mean(axis=(1, 2))
                for i, d in enumerate(deltas, start=1):
                    if d > threshold:
                        rows.append(
                            (r["media_id"], i, int(i / fps * 1000), float(d))
                        )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "t_ms", "luma_delta"]
            )

    return media.filter(F.col("mime") == "video/x-yuv4mpeg").mapInPandas(
        batches, SCENE_CUT_SCHEMA
    )


def synthetic_y4m_media(spark, n: int = 8) -> DataFrame:
    """Deterministic real Y4M clips: gradient frames whose luma drifts
    smoothly, with a hard scene cut (luma jump) at the midpoint frame
    so detect_scene_cuts has exactly one planted positive per clip."""
    import numpy as np

    rows = []
    for i in range(n):
        w, h = 16 + (i % 3) * 8, 12 + (i % 2) * 8
        fps = (10, 25)[i % 2]
        n_frames = 6 + (i % 4) * 2
        cut_at = n_frames // 2
        frames = np.zeros((n_frames, h, w, 3), dtype="uint8")
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 128 // max(w - 1, 1)).astype("int32")
        for f in range(n_frames):
            jump = 120 if f >= cut_at else 0
            frames[f, :, :, 0] = ((base + 2 * f + jump) % 256).astype("uint8")
            frames[f, :, :, 1] = (
                (yy * 128 // max(h - 1, 1) + i) % 256
            ).astype("uint8")
            frames[f, :, :, 2] = (i * 16 + f) % 256
        dur_ms = int(n_frames / fps * 1000)
        rows.append(
            (i, "video", "video/x-yuv4mpeg", encode_y4m(frames, fps, 1), w, h, dur_ms)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ---------------------------------------------------------------------
# Image perceptual hashing (dHash) + image near-dup detection
# ---------------------------------------------------------------------
# The image analog of MinHash dedup: a 64-bit difference hash is
# robust to re-encoding, mild noise, and resizing, so near-identical
# images collide.  Candidate pairs come from banding the 64 bits into
# 16-bit bands (exact-match join per band — never all-pairs, the
# SimHash recipe), then verify by full Hamming distance JVM-side
# (bit_count(a XOR b)).

DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
    ]
)


def dhash_array(arr) -> int:
    """64-bit difference hash of an (h, w, c|1) image array:
    grayscale -> 8x9 area downsample -> horizontal gradient signs."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    # area downsample to 8 rows x 9 cols (mean over cells)
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(10) * w) // 9
    g = np.empty((8, 9))
    for r in range(8):
        for c in range(9):
            cell = a[ys[r] : max(ys[r + 1], ys[r] + 1),
                     xs[c] : max(xs[c + 1], xs[c] + 1)]
            g[r, c] = cell.mean()
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v  # signed 64-bit


def image_dhash(media: DataFrame) -> DataFrame:
    """(media_id, dhash) for every image payload, decoded with the
    real sniffing codec path — same Arrow-batched mapInPandas flow."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "dhash": pdf["payload"]
                    .map(lambda b: dhash_array(decode_image(b)))
                    .astype("int64"),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, DHASH_SCHEMA
    )


def image_near_dups(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-dup pairs: dHash -> four 16-bit band keys -> band
    equi-join for candidates (near-identical hashes agree on at least
    one band whenever <= 3 of the 64 bits differ per band region) ->
    exact Hamming verify via bit_count(a XOR b), all JVM-side.

    Scale shape: hashes are 8 bytes/image; the candidate join
    shuffles band keys only — the corpus of image bytes is touched
    once, by the hashing pass."""
    h = image_dhash(media)
    bands = h.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("dhash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "dhash", "bk.band", "bk.key")
    a = bands.select(
        "band", "key", F.col("media_id").alias("id_a"), F.col("dhash").alias("ha")
    )
    b = bands.select(
        "band", "key", F.col("media_id").alias("id_b"), F.col("dhash").alias("hb")
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------
# Voice-activity detection (speech-data curation)
# ---------------------------------------------------------------------

VAD_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("seg_start_ms", LongType()),
        StructField("seg_end_ms", LongType()),
        StructField("mean_rms", DoubleType()),
    ]
)


def detect_voice_activity(
    media: DataFrame, frame_ms: int = 20, threshold_ratio: float = 0.5
) -> DataFrame:
    """Energy-based VAD over real decoded WAV payloads: frames of
    ``frame_ms`` whose RMS exceeds ``threshold_ratio`` x the clip's
    overall RMS are active; consecutive active frames merge into
    (start_ms, end_ms) segments — the first curation step of a speech
    training pipeline (trim silence, measure speech density).  Pure
    numpy per clip, same Arrow-batched mapInPandas flow."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                a, rate = decode_wav(bytes(r["payload"]))
                mono = a.mean(axis=1)
                spf = max(int(rate * frame_ms / 1000), 1)
                n_frames = len(mono) // spf
                if n_frames == 0:
                    continue
                frames = mono[: n_frames * spf].reshape(n_frames, spf)
                rms = np.sqrt((frames.astype(np.float64) ** 2).mean(axis=1))
                overall = float(np.sqrt((mono.astype(np.float64) ** 2).mean()))
                active = rms > threshold_ratio * overall
                start = None
                for i in range(n_frames + 1):
                    on = i < n_frames and active[i]
                    if on and start is None:
                        start = i
                    elif not on and start is not None:
                        seg = rms[start:i]
                        rows.append(
                            (
                                r["media_id"],
                                int(start * frame_ms),
                                int(i * frame_ms),
                                float(seg.mean()),
                            )
                        )
                        start = None
            yield pd.DataFrame(
                rows,
                columns=["media_id", "seg_start_ms", "seg_end_ms", "mean_rms"],
            )

    return media.filter(F.col("mime") == "audio/wav").mapInPandas(
        batches, VAD_SCHEMA
    )


def resize_images_real(
    media: DataFrame, width: int = 64, height: int = 64
) -> DataFrame:
    """Format-generic REAL resize: sniff + decode with the matching
    codec, nearest-neighbor resample, re-encode in the SAME format
    (PPM/PNG/BMP lossless; JPEG at q=85).  `resize_images` is the
    default name for this path; this name is kept as a compatibility
    alias."""
    import numpy as np

    def rz_payload(b: bytes) -> bytes:
        a = decode_image(b)
        h, w = a.shape[:2]
        yi = np.minimum((np.arange(height) * h) // height, h - 1)
        xi = np.minimum((np.arange(width) * w) // width, w - 1)
        out = a[yi][:, xi]
        raw = bytes(b)
        if raw.startswith(_PNG_SIG):
            return encode_png(out)
        if raw.startswith(b"P6"):
            return encode_ppm(out)
        if raw.startswith(b"BM"):
            return encode_bmp(out)
        from sparkplans.operators.jpeg import encode_jpeg

        return encode_jpeg(out[:, :, :3], quality=85)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(rz_payload),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, RESIZED_SCHEMA
    )


def sample_gif_frames(media: DataFrame, every_ms: int = 100) -> DataFrame:
    """REAL frame sampling for animated GIF payloads (image/gif):
    frames composite per the stream's own delays; one output row per
    every_ms tick with the luma stats of the frame active at that
    time — web-media animation handled by the same schema as the Y4M
    video branch."""
    import numpy as np

    from sparkplans.operators.gif import decode_gif

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                frames, delays = decode_gif(bytes(r["payload"]))
                total = sum(delays)
                starts = np.cumsum([0] + delays[:-1])
                t = 0
                while t < total:
                    idx = int(np.searchsorted(starts, t, side="right") - 1)
                    y = (
                        0.299 * frames[idx, :, :, 0]
                        + 0.587 * frames[idx, :, :, 1]
                        + 0.114 * frames[idx, :, :, 2]
                    )
                    rows.append(
                        (r["media_id"], idx, int(t), float(y.mean()), float(y.std()))
                    )
                    t += every_ms
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "t_ms", "luma_mean", "luma_std"]
            )

    return media.filter(F.col("mime") == "image/gif").mapInPandas(
        batches, Y4M_FRAME_SCHEMA
    )


MEDIA_METADATA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("container", StringType()),
        StructField("duration_ms", LongType()),
        StructField("detail", StringType()),
    ]
)


def extract_media_metadata(media: DataFrame) -> DataFrame:
    """Container-metadata extraction for the compressed formats whose
    bitstreams stay stubbed (H.264-in-MP4, MP3): REAL box/frame-header
    parsers (`operators/mediaprobe`) pull duration, codec fourccs,
    bitrate and sample rate — the filter/route/gate metadata a media
    pipeline needs even without decoding a single frame.  Same
    Arrow-batched mapInPandas flow as the codec branches."""
    from sparkplans.operators import mediaprobe

    def probe_one(b: bytes) -> tuple:
        raw = bytes(b or b"")
        if len(raw) > 8 and raw[4:8] == b"ftyp":
            m = mediaprobe.probe_mp4(raw)
            detail = ",".join(
                f"{t['handler']}:{t['codec']}" for t in m["tracks"]
            )
            return "mp4", m["duration_ms"], detail
        m = mediaprobe.probe_mp3(raw)
        return (
            "mp3",
            m["est_duration_ms"],
            f"{m['bitrate_kbps']}kbps:{m['sample_rate']}Hz:{m['channel_mode']}",
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            probed = pdf["payload"].map(probe_one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "container": probed.map(lambda t: t[0]),
                    "duration_ms": probed.map(lambda t: t[1]).astype("int64"),
                    "detail": probed.map(lambda t: t[2]),
                }
            )

    return media.filter(
        F.col("mime").isin("video/mp4", "audio/mpeg")
    ).mapInPandas(batches, MEDIA_METADATA_SCHEMA)


# ---------------------------------------------------------------------
# Audio fingerprinting (spectral-peak constellation) + audio near-dup
# ---------------------------------------------------------------------
# The audio member of the cross-modal dedup family (text: MinHash /
# segments, images: dHash): robust landmark hashes over the
# spectrogram — (anchor frequency, target frequency, frame delta)
# triples survive re-encoding, G.711 quantization, and level changes,
# so near-identical recordings share many hashes.  Fingerprint
# extraction is per-clip numpy in mapInPandas; MATCHING is a plain
# hash equi-join + group count — JVM-side and shuffle-bounded by the
# fingerprint table (rows ~ peaks x fanout, not samples).

AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("fp_hash", LongType()),
        StructField("t_anchor", IntegerType()),
    ]
)


def _spectral_peaks(payload: bytes, n_fft: int = 256, hop: int = 128,
                    peaks_per_frame: int = 3):
    """Hann-windowed STFT -> per-frame top-k bins above the global
    median floor; returns [(frame, bin)] sorted."""
    import numpy as np

    a, rate = decode_wav(payload)
    mono = a.mean(axis=1).astype(np.float64)
    if len(mono) < n_fft:
        mono = np.pad(mono, (0, n_fft - len(mono)))
    n_frames = 1 + (len(mono) - n_fft) // hop
    win = np.hanning(n_fft)
    frames = np.stack(
        [mono[i * hop : i * hop + n_fft] * win for i in range(n_frames)]
    )
    mag = np.abs(np.fft.rfft(frames, axis=1))
    floor = np.median(mag) * 2
    out = []
    for t in range(n_frames):
        row = mag[t]
        top = np.argsort(row)[-peaks_per_frame:]
        for b in top:
            if row[b] > floor:
                out.append((t, int(b)))
    return out


def audio_fingerprints(
    media: DataFrame, fanout_frames: int = 4
) -> DataFrame:
    """(media_id, fp_hash, t_anchor) landmark hashes: each spectral
    peak pairs with peaks up to ``fanout_frames`` ahead; the hash
    packs (f_anchor, f_target, dt)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                peaks = _spectral_peaks(bytes(r["payload"]))
                by_frame: dict[int, list[int]] = {}
                for t, b in peaks:
                    by_frame.setdefault(t, []).append(b)
                for t, b in peaks:
                    for dt in range(1, fanout_frames + 1):
                        for b2 in by_frame.get(t + dt, ()):
                            h = (b << 20) | (b2 << 8) | dt
                            rows.append((r["media_id"], h, t))
            yield pd.DataFrame(
                rows, columns=["media_id", "fp_hash", "t_anchor"]
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches, AUDIO_FP_SCHEMA
    )


def audio_near_dups(media: DataFrame, min_matches: int = 20) -> DataFrame:
    """Audio near-dup pairs: clips sharing >= min_matches DISTINCT
    landmark hashes with a CONSISTENT time offset (the constellation
    alignment check: matching hashes from the same recording line up
    at one anchor-time delta).  Join + group count, all JVM-side."""
    fp = audio_fingerprints(media)
    a = fp.select(
        F.col("media_id").alias("id_a"),
        "fp_hash",
        F.col("t_anchor").alias("ta"),
    )
    b = fp.select(
        F.col("media_id").alias("id_b"),
        "fp_hash",
        F.col("t_anchor").alias("tb"),
    )
    return (
        a.join(b, "fp_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dt", F.col("ta") - F.col("tb"))
        .groupBy("id_a", "id_b", "dt")
        .agg(F.countDistinct("fp_hash").alias("n_matches"))
        .filter(F.col("n_matches") >= min_matches)
        .groupBy("id_a", "id_b")
        .agg(F.max("n_matches").alias("n_matches"))
    )


VIDEO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("dhash", LongType()),
    ]
)


def video_frame_dhashes(media: DataFrame) -> DataFrame:
    """Per-frame perceptual hashes for Y4M clips: dHash of each
    frame's luma plane — the video fingerprint table (8 bytes per
    frame, ~1/10^5 of raw clip bytes)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                frames, _fps = decode_y4m(bytes(r["payload"]))
                for i in range(frames.shape[0]):
                    rows.append(
                        (r["media_id"], i, dhash_array(frames[i, :, :, 0]))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "dhash"])

    return media.filter(F.col("mime") == "video/x-yuv4mpeg").mapInPandas(
        batches, VIDEO_FP_SCHEMA
    )


def video_near_dups(
    media: DataFrame, max_hamming: int = 6, min_matching_frames: int = 3
) -> DataFrame:
    """Video near-dup pairs: clips sharing >= min_matching_frames
    frames whose luma dHashes are within ``max_hamming`` — the video
    member of the cross-modal dedup family.  Candidates via the same
    16-bit band equi-join as image_near_dups (never all-pairs);
    matching is join + group count over the 8-byte-per-frame
    fingerprint table, JVM-side."""
    h = video_frame_dhashes(media)
    bands = h.select(
        "media_id",
        "frame_idx",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.shiftright(F.col("dhash"), 16 * bnd)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for bnd in range(4)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "frame_idx", "dhash", "bk.band", "bk.key")
    a = bands.select(
        "band", "key",
        F.col("media_id").alias("id_a"), F.col("frame_idx").alias("fa"),
        F.col("dhash").alias("ha"),
    )
    b = bands.select(
        "band", "key",
        F.col("media_id").alias("id_b"), F.col("frame_idx").alias("fb"),
        F.col("dhash").alias("hb"),
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fa", "fb", "ha", "hb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("fa").alias("n_matching_frames"))
        .filter(F.col("n_matching_frames") >= min_matching_frames)
    )


def media_near_dups(media: DataFrame) -> DataFrame:
    """Cross-modal near-dup facade: route each media kind to its
    dedup family — images by dHash banding, audio by constellation
    fingerprints, video by per-frame dHashes — and return one unified
    (kind, id_a, id_b, score) frame.  Each branch keeps its own scale
    shape; the union is just a plan union."""
    img = image_near_dups(media).select(
        F.lit("image").alias("kind"), "id_a", "id_b",
        F.col("hamming").cast("double").alias("score"),
    )
    aud = audio_near_dups(media).select(
        F.lit("audio").alias("kind"), "id_a", "id_b",
        F.col("n_matches").cast("double").alias("score"),
    )
    vid = video_near_dups(media).select(
        F.lit("video").alias("kind"), "id_a", "id_b",
        F.col("n_matching_frames").cast("double").alias("score"),
    )
    return img.unionByName(aud).unionByName(vid)


# ---------------------------------------------------------------------
# MFCC features (mel filterbank + DCT) — pure numpy, no librosa
# ---------------------------------------------------------------------

def _hz_to_mel(f):
    import numpy as np

    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype="float64") / 700.0)


def _mel_to_hz(m):
    import numpy as np

    return 700.0 * (10.0 ** (np.asarray(m, dtype="float64") / 2595.0) - 1.0)


def _mel_filterbank(n_mels: int, n_fft: int, rate: int):
    """Triangular HTK-style mel filterbank over rfft bins."""
    import numpy as np

    pts = _mel_to_hz(
        np.linspace(_hz_to_mel(0.0), _hz_to_mel(rate / 2.0), n_mels + 2)
    )
    bins = np.floor((n_fft + 1) * pts / rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, mid, hi = bins[i], bins[i + 1], bins[i + 2]
        if mid > lo:
            fb[i, lo:mid] = (np.arange(lo, mid) - lo) / (mid - lo)
        if hi > mid:
            fb[i, mid:hi] = (hi - np.arange(mid, hi)) / (hi - mid)
    return fb


def mfcc_row(
    payload: bytes,
    n_mfcc: int = 8,
    n_mels: int = 20,
    frame: int = 256,
    hop: int = 128,
) -> list:
    """Mean MFCC vector of one WAV clip: Hann-windowed frames ->
    power rfft -> triangular mel filterbank -> log -> orthonormal
    DCT-II -> per-coefficient mean over frames.  Deterministic pure
    numpy (the librosa default recipe minus pre-emphasis/liftering);
    clips shorter than one frame yield the all-zero vector."""
    import numpy as np

    a, rate = decode_wav(payload)
    mono = a.mean(axis=1).astype("float64")
    if len(mono) < frame:
        return [0.0] * n_mfcc
    n_frames = 1 + (len(mono) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    win = np.hanning(frame)
    spec = np.abs(np.fft.rfft(mono[idx] * win, axis=1)) ** 2
    mel = spec @ _mel_filterbank(n_mels, frame, rate).T
    logmel = np.log(mel + 1e-10)
    # orthonormal DCT-II on the mel axis
    k = np.arange(n_mels)
    basis = np.cos(np.pi * (k[:, None] + 0.5) * k[None, :n_mfcc] / n_mels)
    scale = np.full(n_mfcc, np.sqrt(2.0 / n_mels))
    scale[0] = np.sqrt(1.0 / n_mels)
    mfcc = (logmel @ basis) * scale
    return [float(x) for x in mfcc.mean(axis=0)]


MFCC_SCHEMA = StructType(
    [StructField("media_id", LongType())]
    + [StructField(f"mfcc_{i}", DoubleType()) for i in range(8)]
)


def extract_mfcc(media: DataFrame) -> DataFrame:
    """MFCCs for every audio/wav row — the canonical learned-model
    audio feature (speech/music classifiers, audio dedup embeddings).
    Same Arrow-batched mapInPandas flow as every codec branch; output
    is 8 SCALAR columns (driver-hashable), one row per clip."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf["payload"].map(mfcc_row)
            out = {"media_id": pdf["media_id"]}
            for i in range(8):
                out[f"mfcc_{i}"] = feats.map(lambda v, i=i: v[i])
            yield pd.DataFrame(out)

    return media.filter(F.col("mime") == "audio/wav").mapInPandas(
        batches, MFCC_SCHEMA
    )


SHOT_BOUNDARY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("luma_delta", DoubleType()),
        StructField("is_boundary", BooleanType()),
    ]
)


def detect_shot_boundaries(
    media: DataFrame, threshold: float = 10.0
) -> DataFrame:
    """Shot-boundary detection over Y4M clips — the keyframe/segment
    step of a video training-data pipeline: decode, compute the mean
    absolute luma difference between consecutive frames, and flag
    frames whose delta exceeds ``threshold`` as cut points.  One row
    per frame transition (frame_idx = the LATER frame).

    Arrow-batched mapInPandas like every codec stage: per-partition
    CPU, zero shuffles — at 100 TB this runs wherever the clip bytes
    already sit.  Histogram-based detectors drop in by swapping the
    delta expression; the plumbing (decode → pairwise frame walk →
    per-transition rows) is the invariant part."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                frames, _fps = decode_y4m(bytes(r["payload"]))
                y = frames[:, :, :, 0].astype("float64")
                for i in range(1, y.shape[0]):
                    delta = float(np.abs(y[i] - y[i - 1]).mean())
                    rows.append(
                        (r["media_id"], i, delta, delta > threshold)
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "luma_delta", "is_boundary"],
            )

    return media.filter(F.col("mime") == "video/x-yuv4mpeg").mapInPandas(
        batches, SHOT_BOUNDARY_SCHEMA
    )


VAD_SEGMENT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("seg_start_frame", IntegerType()),
        StructField("seg_n_frames", IntegerType()),
        StructField("peak_rms", DoubleType()),
    ]
)


def detect_voice_segments(
    media: DataFrame, frame_samples: int = 16, threshold: float = 100.0
) -> DataFrame:
    """Energy-threshold voice-activity detection over WAV payloads —
    the segmentation step of a speech training-data pipeline: frame
    the signal, mark frames whose RMS exceeds ``threshold`` active,
    and emit one row per CONTIGUOUS active run (start frame, length,
    peak frame RMS).  The audio sibling of
    :func:`detect_shot_boundaries` — same Arrow-batched zero-shuffle
    plumbing; production VADs swap the energy rule for a model, the
    framing/run-length scan is the invariant part."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                samples, _rate = decode_wav(bytes(r["payload"]))
                mono = samples[:, 0].astype("float64")
                n_frames = len(mono) // frame_samples
                if n_frames == 0:
                    continue
                framed = mono[: n_frames * frame_samples].reshape(
                    n_frames, frame_samples
                )
                rms = np.sqrt((framed * framed).mean(axis=1))
                active = rms > threshold
                start = None
                for i in range(n_frames + 1):
                    on = i < n_frames and active[i]
                    if on and start is None:
                        start = i
                    elif not on and start is not None:
                        rows.append(
                            (
                                r["media_id"],
                                start,
                                i - start,
                                float(rms[start:i].max()),
                            )
                        )
                        start = None
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "seg_start_frame", "seg_n_frames", "peak_rms",
                ],
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batches, VAD_SEGMENT_SCHEMA
    )
