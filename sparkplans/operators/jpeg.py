"""Baseline JPEG (ITU-T T.81) encoder/decoder in pure stdlib + numpy.

Closes the last stubbed *image* branch of `operators/multimodal`: with
this module, `decode_image` handles JPEG payloads with no external
codec library.  Scope is the honest baseline-sequential subset:

- 8-bit, 3-component YCbCr (JFIF), 4:4:4 AND 4:2:0 chroma sampling
- one scan, non-progressive, non-arithmetic (Huffman only)
- quantization tables and Huffman tables are READ FROM THE STREAM
  (DQT/DHT), so the decoder handles any conforming baseline 4:4:4
  or 4:2:0 file, not just our encoder's output

The encoder writes canonical-Huffman tables it derives itself
(uniform code lengths — valid per the spec, which lets DHT carry any
canonical table; compression is a few % worse than the Annex K
defaults, and correctness is what the tests pin).  The DCT is the
orthonormal matrix form of the spec's FDCT; entropy coding is exact
run/size + magnitude-bits with 0xFF byte stuffing.

Everything numeric is numpy; the only per-symbol Python loop is the
entropy coder, which is the honest cost of a pure-Python codec (the
Arrow-batched mapInPandas flow amortizes it per partition).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------
# Constant tables
# ---------------------------------------------------------------------

# Annex K quantization tables (public spec constants), natural order.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)


def zigzag_order() -> list[tuple[int, int]]:
    """The spec's zigzag scan, generated (not hardcoded): anti-diagonal
    s = i+j walks up-right when s is even, down-left when odd."""
    out = []
    for s in range(15):
        rng = range(s, -1, -1) if s % 2 == 0 else range(0, s + 1)
        for i in rng:
            j = s - i
            if i < 8 and j < 8:
                out.append((i, j))
    return out


_ZZ = zigzag_order()
_ZZ_IDX = np.array([i * 8 + j for i, j in _ZZ])      # natural->stream
_INV_ZZ = np.argsort(_ZZ_IDX)                        # stream->natural


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix — equal to the spec's FDCT
    with its 1/4·C(u)C(v) normalization folded in."""
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(1 / 2)
    return c / 2


_C = _dct_matrix()


def fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def idct2(coeffs: np.ndarray) -> np.ndarray:
    return _C.T @ coeffs @ _C


# JFIF RGB <-> YCbCr (BT.601 full-range)
def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------
# Huffman tables (canonical; uniform lengths, all-ones code unused)
# ---------------------------------------------------------------------

# DC: 12 magnitude-category symbols at 4 bits (codes 0..11 < 1111).
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# AC: 162 run/size symbols at 8 bits (codes 0..161 < 11111111).
_AC_VALS = [16 * r + s for r in range(16) for s in range(1, 11)] + [0x00, 0xF0]
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_VALS)  # all length 8


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment per the spec."""
    codes, code = {}, 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy data exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1  # skip stuffed 0x00
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude_bits(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """Inverse of _magnitude_bits' appended-bits mapping."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ---------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    quality = min(max(quality, 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    qy = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255).astype(np.int32)
    return qy, qc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _encode_block(bw: _BitWriter, block, q, prev_dc: int) -> int:
    """FDCT + quantize + entropy-code one 8x8 block; returns its DC
    (the caller threads per-component DC prediction)."""
    coeffs = np.round(fdct2(block) / q).astype(np.int64)
    stream = coeffs.flatten()[_ZZ_IDX]
    diff = int(stream[0]) - prev_dc
    size, bits = _magnitude_bits(diff)
    code, length = _DC_CODES[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    for v in stream[1:]:
        v = int(v)
        if v == 0:
            run += 1
            continue
        while run >= 16:
            zc, zl = _AC_CODES[0xF0]
            bw.write(zc, zl)
            run -= 16
        size, bits = _magnitude_bits(v)
        code, length = _AC_CODES[16 * run + size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if run:
        ec, el = _AC_CODES[0x00]
        bw.write(ec, el)
    return int(stream[0])


def encode_jpeg(rgb: np.ndarray, quality: int = 85, subsample: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as baseline JFIF — 4:4:4 by
    default, or 4:2:0 (``subsample=True``: 16x16 MCUs of four Y blocks
    plus one 2x2-averaged Cb and Cr block — the variant virtually all
    camera/web JPEGs use)."""
    a = np.asarray(rgb, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3, "RGB input"
    qy, qc = _quant_tables(quality)

    # pad to MCU multiples by edge replication
    mcu = 16 if subsample else 8
    ph, pw = -h % mcu, -w % mcu
    a = np.pad(a, ((0, ph), (0, pw), (0, 0)), mode="edge")
    ycc = rgb_to_ycbcr(a) - 128.0

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    hh, ww = a.shape[:2]
    if not subsample:
        for by in range(0, hh, 8):
            for bx in range(0, ww, 8):
                for comp in range(3):
                    q = qy if comp == 0 else qc
                    prev_dc[comp] = _encode_block(
                        bw, ycc[by : by + 8, bx : bx + 8, comp], q, prev_dc[comp]
                    )
    else:
        y_plane = ycc[:, :, 0]
        # 2x2 box-filter chroma downsample
        cb = ycc[:, :, 1].reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
        cr = ycc[:, :, 2].reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
        for my in range(0, hh, 16):
            for mx in range(0, ww, 16):
                for dy in (0, 8):        # interleave: Y00 Y01 Y10 Y11
                    for dx in (0, 8):
                        prev_dc[0] = _encode_block(
                            bw,
                            y_plane[my + dy : my + dy + 8, mx + dx : mx + dx + 8],
                            qy,
                            prev_dc[0],
                        )
                cy, cx = my // 2, mx // 2
                prev_dc[1] = _encode_block(
                    bw, cb[cy : cy + 8, cx : cx + 8], qc, prev_dc[1]
                )
                prev_dc[2] = _encode_block(
                    bw, cr[cy : cy + 8, cx : cx + 8], qc, prev_dc[2]
                )

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return _seg(0xDB, bytes([tid]) + bytes(int(x) for x in q.flatten()[_ZZ_IDX]))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    y_samp = 0x22 if subsample else 0x11
    sof = _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, y_samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    app0 = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qy)
        + dqt(1, qc)
        + dht(0, 0, _DC_BITS, _DC_VALS)
        + dht(0, 1, _DC_BITS, _DC_VALS)
        + dht(1, 0, _AC_BITS, _AC_VALS)
        + dht(1, 1, _AC_BITS, _AC_VALS)
        + sof
        + sos
        + bw.flush()
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.lut: dict[tuple[int, int], int] = {}
        code, i = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[i]
                code += 1
                i += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential 8-bit 4:4:4 JFIF payload to an
    (h, w, 3) uint8 RGB array.  Tables come from the stream's DQT/DHT
    segments; progressive, subsampled, or arithmetic files raise."""
    b = bytes(payload or b"")
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    scan = None
    while pos < len(b):
        if b[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        data = b[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            dpos = 0
            while dpos < len(data):
                pq, tq = data[dpos] >> 4, data[dpos] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                flat = np.frombuffer(
                    data[dpos + 1 : dpos + 65], dtype=np.uint8
                ).astype(np.int32)
                qtables[tq] = flat[_INV_ZZ].reshape(8, 8)
                dpos += 65
        elif marker == 0xC4:  # DHT
            dpos = 0
            while dpos < len(data):
                tc, th = data[dpos] >> 4, data[dpos] & 0x0F
                bits = list(data[dpos + 1 : dpos + 17])
                n = sum(bits)
                vals = list(data[dpos + 17 : dpos + 17 + n])
                htables[(tc, th)] = _HuffDecoder(bits, vals)
                dpos += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", data[:6])
            if prec != 8 or nc != 3:
                raise ValueError("only 8-bit 3-component baseline supported")
            comps = []
            samps = []
            for i in range(nc):
                cid, samp, tq = data[6 + 3 * i : 9 + 3 * i]
                samps.append(samp)
                comps.append((cid, tq))
            if samps not in ([0x11, 0x11, 0x11], [0x22, 0x11, 0x11]):
                raise ValueError("only 4:4:4 or 4:2:0 sampling supported")
            frame = (h, w, comps, samps[0] == 0x22)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = data[0]
            scan = [(data[1 + 2 * i], data[2 + 2 * i]) for i in range(ns)]
            # entropy-coded data runs to the next real marker (EOI)
            end = len(b) - 2
            entropy = b[pos:end]
            pos = end
            if frame is None:
                raise ValueError("SOS before SOF")
            h, w, comps, sub = frame
            br = _BitReader(entropy)
            prev_dc = [0, 0, 0]

            def block(ci: int) -> np.ndarray:
                _, tq = comps[ci]
                td, ta = scan[ci][1] >> 4, scan[ci][1] & 0x0F
                dc_dec, ac_dec = htables[(0, td)], htables[(1, ta)]
                stream = np.zeros(64, dtype=np.int64)
                size = dc_dec.decode(br)
                diff = _extend(br.read_bits(size), size)
                prev_dc[ci] += diff
                stream[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = ac_dec.decode(br)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0x0F
                    k += run
                    if k > 63:
                        raise ValueError("AC index out of range")
                    stream[k] = _extend(br.read_bits(size), size)
                    k += 1
                coeffs = stream[_INV_ZZ].reshape(8, 8) * qtables[tq]
                return idct2(coeffs.astype(np.float64))

            if not sub:
                hh, ww = h + (-h % 8), w + (-w % 8)
                out = np.zeros((hh, ww, 3), dtype=np.float64)
                for by in range(0, hh, 8):
                    for bx in range(0, ww, 8):
                        for ci in range(3):
                            out[by : by + 8, bx : bx + 8, ci] = block(ci)
            else:
                hh, ww = h + (-h % 16), w + (-w % 16)
                out = np.zeros((hh, ww, 3), dtype=np.float64)
                for my in range(0, hh, 16):
                    for mx in range(0, ww, 16):
                        for dy in (0, 8):  # Y00 Y01 Y10 Y11 interleave
                            for dx in (0, 8):
                                out[
                                    my + dy : my + dy + 8,
                                    mx + dx : mx + dx + 8,
                                    0,
                                ] = block(0)
                        # chroma: one 8x8 block covers the 16x16 MCU
                        for ci in (1, 2):
                            c8 = block(ci)
                            out[my : my + 16, mx : mx + 16, ci] = c8.repeat(
                                2, axis=0
                            ).repeat(2, axis=1)
        elif marker == 0xD8:
            raise ValueError("unexpected SOI")
        # APPn / COM / others: skipped via seglen
    if frame is None or scan is None:
        raise ValueError("truncated JPEG (no frame/scan)")
    h, w = frame[0], frame[1]
    return ycbcr_to_rgb(out[:h, :w] + 128.0)
