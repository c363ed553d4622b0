"""Container-level metadata probes for compressed media formats whose
BITSTREAM decode genuinely needs external libraries (H.264, MP3).

Even when a pipeline cannot decode frames/samples, it can — and in
production does — read container metadata to filter, route, and
deduplicate media at scale (duration gates, codec allowlists, sample
-rate buckets).  These probes are REAL parsers over the public
container specs, so the "stubbed codec" formats still contribute
honest Spark-side functionality:

- **MP4 / ISO BMFF**: box walk (ftyp / moov / mvhd / trak / tkhd /
  mdia / hdlr / stsd) → duration, timescale, per-track handler and
  sample-entry fourcc.
- **MP3 / MPEG-1 Layer III**: frame-header sync parse → version,
  layer, bitrate, sample rate, channel mode, and a duration estimate
  from stream length x bitrate (the standard CBR estimate).
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------
# MP4 (ISO base media file format) box parsing
# ---------------------------------------------------------------------


def _walk_boxes(b: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", b[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("malformed MP4 box")
        yield typ, pos + hdr, pos + size
        pos += size


def probe_mp4(payload: bytes) -> dict:
    """Parse ftyp/moov metadata from an ISO BMFF (MP4/MOV) payload:
    returns brand, duration_ms, timescale, and per-track
    (handler, codec fourcc) pairs.  Raises on non-MP4 bytes."""
    b = bytes(payload or b"")
    if len(b) < 12 or b[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF payload (no ftyp)")
    out = {"brand": b[8:12].decode("latin1"), "duration_ms": None,
           "timescale": None, "tracks": []}
    for typ, s, e in _walk_boxes(b, 0, len(b)):
        if typ != b"moov":
            continue
        for t2, s2, e2 in _walk_boxes(b, s, e):
            if t2 == b"mvhd":
                ver = b[s2]
                if ver == 1:
                    ts, dur = struct.unpack(">IQ", b[s2 + 20 : s2 + 32])
                else:
                    ts, dur = struct.unpack(">II", b[s2 + 12 : s2 + 20])
                out["timescale"] = ts
                out["duration_ms"] = int(dur * 1000 / ts) if ts else None
            elif t2 == b"trak":
                handler = codec = None
                for t3, s3, e3 in _walk_boxes(b, s2, e2):
                    if t3 != b"mdia":
                        continue
                    for t4, s4, e4 in _walk_boxes(b, s3, e3):
                        if t4 == b"hdlr":
                            handler = b[s4 + 8 : s4 + 12].decode("latin1")
                        elif t4 == b"minf":
                            for t5, s5, e5 in _walk_boxes(b, s4, e4):
                                if t5 != b"stbl":
                                    continue
                                for t6, s6, e6 in _walk_boxes(b, s5, e5):
                                    if t6 == b"stsd":
                                        # version/flags + entry_count,
                                        # then first sample entry box
                                        for t7, _s7, _e7 in _walk_boxes(
                                            b, s6 + 8, e6
                                        ):
                                            codec = t7.decode("latin1")
                                            break
                out["tracks"].append({"handler": handler, "codec": codec})
    if out["timescale"] is None:
        raise ValueError("no moov/mvhd found")
    return out


def build_minimal_mp4(
    duration_ms: int = 2000,
    timescale: int = 1000,
    tracks: list[tuple[str, str]] = (("vide", "avc1"), ("soun", "mp4a")),
) -> bytes:
    """Deterministic minimal-but-conforming MP4 metadata skeleton
    (ftyp + moov with mvhd and per-track hdlr/stsd) for tests and
    synthetic fixtures — no media data, which is exactly the point:
    the probe reads structure, not bitstreams."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + typ + payload

    mvhd = box(
        b"mvhd",
        bytes(12)
        + struct.pack(">II", timescale, duration_ms * timescale // 1000)
        + bytes(80),
    )
    traks = b""
    for handler, codec in tracks:
        stsd = box(
            b"stsd",
            bytes(4) + struct.pack(">I", 1) + box(codec.encode(), bytes(8)),
        )
        stbl = box(b"stbl", stsd)
        minf = box(b"minf", stbl)
        hdlr = box(b"hdlr", bytes(8) + handler.encode() + bytes(13))
        mdia = box(b"mdia", hdlr + minf)
        traks += box(b"trak", mdia)
    moov = box(b"moov", mvhd + traks)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    return ftyp + moov


# ---------------------------------------------------------------------
# MP3 frame-header parsing
# ---------------------------------------------------------------------

_MP3_BITRATES_V1L3 = [
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None,
]
_MP3_RATES_V1 = [44100, 48000, 32000, None]


def probe_mp3(payload: bytes) -> dict:
    """Parse the first MPEG-1 Layer III frame header (skipping an ID3v2
    tag if present): returns bitrate_kbps, sample_rate, channel_mode,
    and the standard CBR duration estimate from stream length."""
    b = bytes(payload or b"")
    pos = 0
    if b[:3] == b"ID3":  # ID3v2: 10-byte header + syncsafe size
        if len(b) < 10:
            raise ValueError("truncated ID3 tag")
        size = (
            (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]
        )
        pos = 10 + size
    # find frame sync
    while pos + 4 <= len(b):
        if b[pos] == 0xFF and (b[pos + 1] & 0xE0) == 0xE0:
            break
        pos += 1
    else:
        raise ValueError("no MP3 frame sync found")
    h1, h2, h3 = b[pos + 1], b[pos + 2], b[pos + 3]
    version = (h1 >> 3) & 0x03   # 3 = MPEG-1
    layer = (h1 >> 1) & 0x03     # 1 = Layer III
    if version != 3 or layer != 1:
        raise ValueError("only MPEG-1 Layer III headers supported")
    bitrate = _MP3_BITRATES_V1L3[(h2 >> 4) & 0x0F]
    rate = _MP3_RATES_V1[(h2 >> 2) & 0x03]
    if bitrate is None or rate is None:
        raise ValueError("invalid MP3 bitrate/samplerate index")
    mode = ["stereo", "joint_stereo", "dual_channel", "mono"][(h3 >> 6) & 0x03]
    audio_bytes = len(b) - pos
    return {
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "channel_mode": mode,
        "est_duration_ms": int(audio_bytes * 8 / bitrate),
    }


def build_mp3_header(
    bitrate_kbps: int = 128, sample_rate: int = 44100, mono: bool = False,
    n_frames: int = 38,
) -> bytes:
    """Deterministic MPEG-1 Layer III CBR frame stream (headers +
    zeroed payloads) for probe tests — again: structure, not sound."""
    br_idx = _MP3_BITRATES_V1L3.index(bitrate_kbps)
    sr_idx = _MP3_RATES_V1.index(sample_rate)
    hdr = bytes(
        [
            0xFF,
            0xFB,  # MPEG-1 Layer III, no CRC
            (br_idx << 4) | (sr_idx << 2),
            0xC0 if mono else 0x00,
        ]
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = hdr + bytes(frame_len - 4)
    return frame * n_frames
