"""GIF (87a/89a) encoder/decoder in pure stdlib + numpy.

Another real no-external-lib codec branch for `operators/multimodal`
(the sniffing `decode_image` dispatcher routes ``GIF8`` payloads
here): full LZW decompression with variable code widths and dictionary
resets, global/local color tables, interlaced row order, and ANIMATED
streams — frames composite onto the logical screen with their
per-frame offsets and graphic-control delays, so GIF doubles as a
second real video-ish branch (frame sampling over web media).

The encoder writes a true LZW stream (dictionary-building, width
growth, clear-code resets at 4096) over an exact palette built from
the image's distinct colors; arbitrary-color inputs with more than
256 distinct colors raise — palette *quantization* is a modeling
choice, not a codec feature, and out of scope here.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------
# LZW (GIF variant: variable width, clear/end codes, 4096 cap)
# ---------------------------------------------------------------------


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []

    def reset():
        return {(i,): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, width = reset()
    out_bits.append((clear, width))
    buf: tuple[int, ...] = ()
    for px in indices:
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            out_bits.append((clear, width))
            table, next_code, width = reset()
        buf = (px,)
    if buf:
        out_bits.append((table[buf], width))
    out_bits.append((end, width))
    # pack LSB-first
    acc = nbits = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    acc = nbits = pos = 0

    def read(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream exhausted")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    table: list[tuple[int, ...]] = []
    width = min_code_size + 1
    prev: tuple[int, ...] | None = None
    out: list[int] = []

    def reset_table():
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code_size + 1
        prev = None

    reset_table()
    while len(out) < n_expected:
        code = read(width)
        if code == clear:
            reset_table()
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("corrupt LZW code")
        out.extend(entry)
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out[:n_expected]


# GIF interlace: four passes of rows
_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _interlace_order(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


# ---------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------


def encode_gif(
    frames, delays_ms: list[int] | None = None, interlace: bool = False
) -> bytes:
    """Encode one (h, w, 3) frame or an (n, h, w, 3) animation as GIF
    with an exact palette of the frames' distinct colors (<= 256, else
    raises).  Animations write graphic-control delays per frame."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 3:
        a = a[None]
    n, h, w, c = a.shape
    assert c == 3, "RGB frames"
    colors = np.unique(a.reshape(-1, 3), axis=0)
    if len(colors) > 256:
        raise ValueError("encode_gif needs <=256 distinct colors (exact palette)")
    # palette size = power of two >= max(2, len(colors))
    pbits = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    pal = np.zeros((1 << pbits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(col): i for i, col in enumerate(colors)}

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pbits - 1) << 4) | (pbits - 1), 0, 0)
    out += pal.tobytes()
    if delays_ms is None:
        delays_ms = [100] * n
    for f in range(n):
        if n > 1:
            out += bytes([0x21, 0xF9, 4, 0x00]) + struct.pack(
                "<H", max(delays_ms[f] // 10, 1)
            ) + bytes([0, 0])
        flags = 0x40 if interlace else 0x00
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h) + bytes([flags])
        idx = np.array(
            [lut[tuple(px)] for px in a[f].reshape(-1, 3)], dtype=np.int32
        ).reshape(h, w)
        if interlace:
            idx = idx[_interlace_order(h)]
        min_code = max(pbits, 2)
        out += bytes([min_code])
        data = _lzw_encode([int(x) for x in idx.flatten()], min_code)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------


def decode_gif(payload: bytes):
    """Decode a GIF to ((n_frames, h, w, 3) uint8, delays_ms list).
    Handles global/local palettes, interlace, LZW resets, frame
    offsets (composited onto the logical screen), and graphic-control
    delays.  Still images come back as a 1-frame animation."""
    b = bytes(payload or b"")
    if b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gpal = None
    if flags & 0x80:
        gsize = 2 << (flags & 0x07)
        gpal = np.frombuffer(b, dtype=np.uint8, count=3 * gsize, offset=pos).reshape(
            gsize, 3
        )
        pos += 3 * gsize
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames, delays = [], []
    delay_ms = 100
    transparent = None
    while pos < len(b):
        blk = b[pos]
        pos += 1
        if blk == 0x3B:  # trailer
            break
        if blk == 0x21:  # extension
            label = b[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = b[pos]
                gflags = b[pos + 1]
                (d,) = struct.unpack("<H", b[pos + 2 : pos + 4])
                delay_ms = d * 10
                transparent = b[pos + 4] if gflags & 0x01 else None
                pos += 1 + size
            # skip any remaining sub-blocks (and the whole block for
            # other extension types)
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
            continue
        if blk != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{blk:02x}")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB", b[pos : pos + 9])
        pos += 9
        pal = gpal
        if iflags & 0x80:
            lsize = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                b, dtype=np.uint8, count=3 * lsize, offset=pos
            ).reshape(lsize, 3)
            pos += 3 * lsize
        if pal is None:
            raise ValueError("GIF frame has no color table")
        min_code = b[pos]
        pos += 1
        data = bytearray()
        while b[pos] != 0:
            ln = b[pos]
            data += b[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.array(
            _lzw_decode(bytes(data), min_code, fw * fh), dtype=np.int32
        ).reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive in pass order
            order = _interlace_order(fh)
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        rgb = pal[idx]
        if transparent is not None:
            mask = idx != transparent
            region = canvas[top : top + fh, left : left + fw]
            region[mask] = rgb[mask]
        else:
            canvas[top : top + fh, left : left + fw] = rgb
        frames.append(canvas.copy())
        delays.append(delay_ms)
        transparent = None
    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays
