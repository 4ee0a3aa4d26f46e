"""Baseline JPEG (ITU-T T.81 / JFIF) decoder + minimal encoder, numpy only.

Closes the PDF ``DCTDecode`` stub (reference delegates to pdf_oxide,
/root/reference/src/jimmy/formats/pdf.py-adjacent converter.py:295-306)
and the multimodal image-decode stub: baseline sequential DCT, Huffman
entropy coding, 8-bit precision, grayscale or YCbCr with 4:4:4 / 4:2:2 /
4:2:0 subsampling, restart markers.  Progressive, arithmetic-coded,
12-bit and hierarchical modes raise ``NotImplementedError`` (still a
documented boundary, now far narrower).

The encoder exists for fixtures and differential tests: it emits
grayscale or 4:4:4 color baseline streams with the Annex K example
tables.  Decoder correctness is pinned three ways in tests/test_jpeg.py:
encode→decode PSNR on gradients, an exactness check on solid blocks
(quantized DC round-trip is exact), and a hand-crafted byte stream whose
decoded output is computed by hand.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K example tables (the de-facto standard tables)
STD_LUMA_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
STD_CHROMA_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# exact 2-D DCT basis: A[u, x] = alpha(u) cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


class _HuffTable:
    """Canonical Huffman table with a 16-bit peek LUT for fast decode."""

    def __init__(self, counts: list[int], symbols: list[int]):
        self.lut_sym = np.zeros(1 << 16, dtype=np.int16)
        self.lut_len = np.zeros(1 << 16, dtype=np.int8)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                k += 1
                lo = code << (16 - length)
                hi = lo + (1 << (16 - length))
                self.lut_sym[lo:hi] = sym
                self.lut_len[lo:hi] = length
                code += 1
            code <<= 1


@lru_cache(maxsize=64)
def _huff_table(counts: tuple, symbols: tuple) -> _HuffTable:
    """Once-per-process table build: the 2×64 KB peek LUTs are costly
    relative to the tiny per-document images pdf_image_features decodes,
    and nearly every real stream ships the same Annex K tables."""
    return _HuffTable(list(counts), list(symbols))


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing
    and RSTn handling."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 48:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs via restart()
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    # EOI or next segment: pad with zeros
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.bitbuf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.bitbuf &= (1 << self.nbits) - 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.bitbuf >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _decode_huff(r: _BitReader, table: _HuffTable) -> int:
    peek = r.peek16()
    length = int(table.lut_len[peek])
    if length == 0:
        raise ValueError("invalid Huffman code")
    r.skip(length)
    return int(table.lut_sym[peek])


class JpegDecodeError(ValueError):
    pass


def decode(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 array (H, W) grayscale or (H, W, 3) RGB."""
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise JpegDecodeError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huffs: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegDecodeError(f"expected marker at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # optional 0xFF fill bytes before a marker (B.1.1.2)
        marker = data[pos + 1] if pos + 1 < len(data) else 0xD9
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                qt = np.frombuffer(seg[i:i + 64], dtype=np.uint8).astype(np.int64)
                i += 64
                qts[tq] = qt
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                i += 1
                counts = list(seg[i:i + 16])
                i += 16
                n = sum(counts)
                syms = list(seg[i:i + n])
                i += n
                huffs[(tc, th)] = _huff_table(tuple(counts), tuple(syms))
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if h * w > 100_000_000:
                # hostile/corrupt dimensions: refuse before allocating
                # multi-GB planes inside a shared worker (the PDF layer
                # degrades this to a decoded=False row)
                raise JpegDecodeError(f"image too large ({w}x{h})")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("non-baseline JPEG mode "
                                      f"(SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegDecodeError("SOS before SOF")
            ns = seg[0]
            if ns != len(frame["comps"]):
                # legal baseline, but the single-pass interleaved decoder
                # below would silently leave the other components zero —
                # raise so PDF rows degrade to decoded=False, never
                # silently-wrong features
                raise NotImplementedError(
                    "multi-scan (non-interleaved) baseline JPEG")
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append({"comp": comp, "dc": tt >> 4, "ac": tt & 15})
            ecs_start = pos + seglen
            return _decode_scan(data[ecs_start:], frame, scan, qts, huffs,
                                restart_interval)
        pos += seglen
    raise JpegDecodeError("no scan data")


def _decode_scan(ecs: bytes, frame, scan, qts, huffs, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in frame["comps"]:
        planes[c["id"]] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
    r = _BitReader(ecs)
    pred = {c["comp"]["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                r.restart()
                for k in pred:
                    pred[k] = 0
            for sc in scan:
                comp = sc["comp"]
                qt = qts[comp["tq"]]
                dc_t = huffs[(0, sc["dc"])]
                ac_t = huffs[(1, sc["ac"])]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        t = _decode_huff(r, dc_t)
                        diff = _extend(r.read_bits(t), t)
                        pred[comp["id"]] += diff
                        coeffs[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, ac_t)
                            rrrr, ssss = rs >> 4, rs & 15
                            if ssss == 0:
                                if rrrr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrrr
                            if k > 63:
                                raise JpegDecodeError("AC index overflow")
                            coeffs[k] = _extend(r.read_bits(ssss), ssss)
                            k += 1
                        block = np.zeros(64)
                        block[ZIGZAG] = (coeffs * qt).astype(np.float64)
                        px = idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    out_planes = []
    for c in frame["comps"]:
        p = planes[c["id"]]
        # upsample to full resolution (sample replication, JFIF default)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        raise NotImplementedError(f"{len(out_planes)}-component JPEG")
    y, cb, cr = out_planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- minimal encoder (fixtures + differential tests) -------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _huff_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


def _csize(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(bw, coeffs_zz, dc_codes, ac_codes, pred):
    diff = int(coeffs_zz[0]) - pred
    t = _csize(diff)
    bw.write(*dc_codes[t])
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    for k in range(1, 64):
        v = int(coeffs_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])
            run -= 16
        s = _csize(v)
        bw.write(*ac_codes[(run << 4) | s])
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        bw.write(*ac_codes[0x00])
    return int(coeffs_zz[0])


def _quantize_plane(plane: np.ndarray, qt64: np.ndarray) -> np.ndarray:
    """plane (H8, W8 multiples) -> per-block zigzag quantized coeffs."""
    hh, ww = plane.shape
    qmat = qt64.astype(np.float64).reshape(8, 8)  # natural-order table
    blocks = []
    for y0 in range(0, hh, 8):
        for x0 in range(0, ww, 8):
            f = dct2(plane[y0:y0 + 8, x0:x0 + 8] - 128.0)
            q = np.round(f / qmat).astype(np.int64)
            zz = q.reshape(64)[ZIGZAG]  # natural order -> zigzag vector
            blocks.append(zz)
    return np.array(blocks)


def _pad8(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    out = np.empty((ph, pw))
    out[:h, :w] = img
    out[h:, :w] = img[h - 1:h, :]       # edge replication
    out[:, w:] = out[:, w - 1:w]
    return out


def encode(img: np.ndarray) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) RGB → baseline JFIF bytes
    (Annex K tables, no subsampling)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"

    def dqt(tq, qt):
        # DQT payload is in zigzag order (T.81 B.2.4.1)
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in qt[ZIGZAG])

    out += dqt(0, STD_LUMA_QT)
    if not gray:
        out += dqt(1, STD_CHROMA_QT)
    nc = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    sof += bytes([1, 0x11, 0])
    if not gray:
        sof += bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof

    def dht(tc, th, table):
        counts, syms = table
        body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(syms)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    out += dht(0, 0, STD_DC_LUMA) + dht(1, 0, STD_AC_LUMA)
    if not gray:
        out += dht(0, 1, STD_DC_CHROMA) + dht(1, 1, STD_AC_CHROMA)
    sos = bytes([nc, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    if gray:
        planes = [(_pad8(img.astype(np.float64)), STD_LUMA_QT, 0)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        planes = [(_pad8(y), STD_LUMA_QT, 0), (_pad8(cb), STD_CHROMA_QT, 1),
                  (_pad8(cr), STD_CHROMA_QT, 1)]

    per_comp = [_quantize_plane(p, qt) for p, qt, _ in planes]
    dc_codes = [_huff_codes(*STD_DC_LUMA), _huff_codes(*STD_DC_CHROMA)]
    ac_codes = [_huff_codes(*STD_AC_LUMA), _huff_codes(*STD_AC_CHROMA)]
    bw = _BitWriter()
    preds = [0] * len(planes)
    n_blocks = len(per_comp[0])
    for bi in range(n_blocks):   # 4:4:4 → interleave one block per comp
        for ci, (_, _, tbl) in enumerate(planes):
            preds[ci] = _encode_block(bw, per_comp[ci][bi],
                                      dc_codes[tbl], ac_codes[tbl],
                                      preds[ci])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
