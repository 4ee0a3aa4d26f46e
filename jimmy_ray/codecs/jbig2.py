"""JBIG2 (ITU-T T.88) generic-region decoder + minimal encoder, numpy only.

Closes the PDF ``JBIG2Decode`` stub (the reference delegates embedded
images to pdf_oxide, /root/reference/src/jimmy/converter.py:295-306).
Scope is the subset PDF scanners actually emit for bilevel page images:

- the MQ arithmetic coder (T.88 Annex E) — decoder and encoder,
- generic region decoding, templates 0-3, nominal or custom AT pixels,
  with and without TPGDON typical-prediction (T.88 6.2.5.7),
- the embedded-stream segment format used by PDF (T.88 Annex D.2 /
  PDF 32000 7.4.7): page info (48), immediate (lossless) generic
  region (36/38/39), end-of-page/stripe/file skipped, unknown segment
  types skipped by their declared length.

MMR-coded regions (generic flags bit 0) and the text/symbol/halftone/
refinement segment families raise ``NotImplementedError`` — PDF callers
surface those rows as ``decoded=False`` instead of failing the document.

The encoder exists for fixtures and differential tests: it emits a page
info + immediate lossless generic region stream for any template and
TPGDON setting, so encode→decode round-trips pin every decode path; the
decoder-only layouts a fixture never exercises (4-byte page association,
long-form referred-segment counts, unknown heights) are pinned with
hand-crafted byte streams in tests/test_jbig2.py.
"""

from __future__ import annotations

import struct

import numpy as np

# T.88 Table E.1 — Qe, NMPS, NLPS, SWITCH
_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)


class MQDecoder:
    """T.88 Annex E.3 arithmetic decoder (software conventions)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte(self, i: int) -> int:
        return self.data[i] if i < len(self.data) else 0xFF

    def _bytein(self) -> None:
        if self._byte(self.bp) == 0xFF:
            if self._byte(self.bp + 1) > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp += 1
                self.c += self._byte(self.bp) << 9
                self.ct = 7
        else:
            self.bp += 1
            self.c += self._byte(self.bp) << 8
            self.ct = 8

    def decode(self, cx: list) -> int:
        # cx = [index, mps] mutable per-context state
        i, mps = cx
        qe, nmps, nlps, switch = _QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS exchange path
            if self.a < qe:
                d = mps
                cx[0] = nmps
            else:
                d = 1 - mps
                if switch:
                    cx[1] = 1 - mps
                cx[0] = nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 - mps
                if switch:
                    cx[1] = 1 - mps
                cx[0] = nlps
            else:
                d = mps
                cx[0] = nmps
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEncoder:
    """T.88 Annex E.3 arithmetic encoder (software conventions)."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b: int | None = None  # pending byte (carry target)
        self.out = bytearray()

    def _byteout(self) -> None:
        if self.b == 0xFF:
            self.out.append(self.b)
            self.b = (self.c >> 20) & 0xFF
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            if self.b is not None:
                self.out.append(self.b)
            self.b = (self.c >> 19) & 0xFF
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            # carry into the pending byte; unreachable before the first
            # byteout (CT starts at 12, so C < 2^27 there — T.88 E.3.4)
            self.b = (self.b or 0) + 1
            if self.b == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append(self.b)
                self.b = (self.c >> 20) & 0xFF
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.out.append(self.b)
                self.b = (self.c >> 19) & 0xFF
                self.c &= 0x7FFFF
                self.ct = 8

    def encode(self, cx: list, d: int) -> None:
        i, mps = cx
        qe, nmps, nlps, switch = _QE[i]
        if d == mps:
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            cx[0] = nmps
        else:
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                cx[1] = 1 - mps
            cx[0] = nlps
        # RENORME (T.88 E.3.8); C is masked in _byteout, never here
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS: push C as high as possible while staying inside the
        # final interval [C, C+A)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.b is not None:
            self.out.append(self.b)
        if self.b != 0xFF:
            self.out.append(0xFF)
        self.out.append(0xAC)
        return bytes(self.out)


# generic-region context templates: fixed pixels per T.88 6.2.5.3
# figures, AT pixel slots marked by index; nominal AT values per 6.2.5.4.
_FIXED = {
    0: ((-2, -1), (-2, 0), (-2, 1),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
        (0, -4), (0, -3), (0, -2), (0, -1)),
    1: ((-2, -1), (-2, 0), (-2, 1), (-2, 2),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
        (0, -3), (0, -2), (0, -1)),
    2: ((-2, -1), (-2, 0), (-2, 1),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1),
        (0, -2), (0, -1)),
    3: ((-1, -3), (-1, -2), (-1, -1), (-1, 0), (-1, 1),
        (0, -4), (0, -3), (0, -2), (0, -1)),
}
NOMINAL_AT = {
    0: ((-1, 3), (-1, -3), (-2, 2), (-2, -2)),
    1: ((-1, 3),),
    2: ((-1, 2),),
    3: ((-1, 2),),
}
# TPGDON pseudo-pixel contexts, T.88 6.2.5.7
_TPGDON_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}


def _template(template: int, at: tuple | None):
    """(dy, dx) context pixels in spec order (raster order, MSB first)."""
    if template not in _FIXED:
        raise NotImplementedError(f"GBTEMPLATE {template}")
    pix = list(_FIXED[template]) + [
        (dy, dx) for dy, dx in (at or NOMINAL_AT[template])]
    pix.sort()
    return pix


def _code_generic(img_or_none, w: int, h: int, template: int,
                  at: tuple | None, tpgdon: bool, coder) -> np.ndarray:
    """Shared generic-region walk: decodes into (and returns) a bitmap
    when ``img_or_none`` is None, else encodes ``img_or_none``.  One
    per-pixel Python loop — generic regions in PDF image XObjects are
    small; the Ray-side batching keeps many such loops in flight."""
    pix = _template(template, at)
    nbits = len(pix)
    cxs = [[0, 0] for _ in range(1 << nbits)]
    tp_cx = cxs[_TPGDON_CTX[template]]
    decode = img_or_none is None
    bm = np.zeros((h, w), np.uint8) if decode else img_or_none
    ltp = 0
    for y in range(h):
        if tpgdon:
            if decode:
                ltp ^= coder.decode(tp_cx)
            else:
                typical = 1 if (y > 0 and np.array_equal(
                    bm[y], bm[y - 1])) else 0
                coder.encode(tp_cx, ltp ^ typical)
                ltp = typical
            if ltp:
                if decode:
                    if y > 0:
                        bm[y] = bm[y - 1]
                continue
        for x in range(w):
            ctx = 0
            for dy, dx in pix:
                yy, xx = y + dy, x + dx
                # yy < h guards hostile positive-dy AT pixels (spec AT
                # pixels only reference already-decoded rows)
                bit = int(bm[yy, xx]) if (
                    0 <= yy < h and 0 <= xx < w) else 0
                ctx = (ctx << 1) | bit
            if decode:
                bm[y, x] = coder.decode(cxs[ctx])
            else:
                coder.encode(cxs[ctx], int(bm[y, x]))
    return bm


def decode_generic(data: bytes, w: int, h: int, template: int = 0,
                   at: tuple | None = None,
                   tpgdon: bool = False) -> np.ndarray:
    """Decode one MQ-coded generic region to a (h, w) uint8 0/1 bitmap."""
    return _code_generic(None, w, h, template, at, tpgdon,
                         MQDecoder(data))


def encode_generic(img: np.ndarray, template: int = 0,
                   at: tuple | None = None, tpgdon: bool = False) -> bytes:
    """MQ-encode a (h, w) 0/1 bitmap as one generic region body."""
    enc = MQEncoder()
    img = np.ascontiguousarray(img, np.uint8)
    _code_generic(img, img.shape[1], img.shape[0], template, at,
                  tpgdon, enc)
    return enc.flush()


# ---------------------------------------------------------------------------
# embedded-stream segment layer (PDF /JBIG2Decode payloads)

_GENERIC_TYPES = (36, 38, 39)


def _parse_segment_header(data: bytes, off: int):
    """T.88 7.2 → (number, type, page, data_length, header_end)."""
    num, flags = struct.unpack_from(">IB", data, off)
    off += 5
    seg_type = flags & 0x3F
    rts = data[off]
    count = rts >> 5
    if count == 7:
        count = struct.unpack_from(">I", data, off)[0] & 0x1FFFFFFF
        off += 4 + (count + 8) // 8  # long form + retain-bit bytes
    else:
        off += 1
    ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
    off += count * ref_size
    if flags & 0x40:
        page = struct.unpack_from(">I", data, off)[0]
        off += 4
    else:
        page = data[off]
        off += 1
    length = struct.unpack_from(">I", data, off)[0]
    off += 4
    if length == 0xFFFFFFFF:
        raise NotImplementedError("unknown segment data length")
    return num, seg_type, page, length, off


def decode(data: bytes) -> np.ndarray:
    """Decode a PDF-embedded JBIG2 stream to a (h, w) uint8 0/1 page
    bitmap (1 = black, the JBIG2 convention).  Only self-contained
    streams are supported — /JBIG2Globals symbol dictionaries, MMR
    regions and the text/halftone/refinement families raise
    ``NotImplementedError`` (callers report the row undecoded)."""
    page_w = page_h = None
    page_default = 0
    regions = []
    off = 0
    while off < len(data):
        num, seg_type, _page, length, off = _parse_segment_header(
            data, off)
        body = data[off:off + length]
        off += length
        if seg_type == 48:  # page info
            page_w, page_h = struct.unpack_from(">II", body, 0)
            if page_h == 0xFFFFFFFF:
                page_h = None
            # page flags (7.4.8.5): bit 2 = default pixel value
            page_default = (body[16] >> 2) & 1 if len(body) > 16 else 0
        elif seg_type in _GENERIC_TYPES:
            w, h, x, y, comb = struct.unpack_from(">IIIIB", body, 0)
            if w * h > 100_000_000:
                # hostile/corrupt u32 dimensions: refuse before the
                # bitmap allocation OOMs a shared worker
                raise ValueError(f"region too large ({w}x{h})")
            gflags = body[17]
            if gflags & 1:
                raise NotImplementedError("MMR-coded generic region")
            template = (gflags >> 1) & 3
            tpgdon = bool(gflags & 8)
            n_at = 4 if template == 0 else 1
            at = tuple(
                (dy, dx) for dx, dy in struct.iter_unpack(
                    "bb", body[18:18 + 2 * n_at]))
            mq = body[18 + 2 * n_at:]
            regions.append((x, y, comb & 7, decode_generic(
                mq, w, h, template, at, tpgdon)))
        elif seg_type in (49, 50, 51, 0):  # end-of-*, symbol dict №0
            if seg_type == 0:
                raise NotImplementedError("symbol dictionary segment")
        elif seg_type in (4, 6, 7, 20, 22, 23, 40, 42, 43, 16):
            raise NotImplementedError(f"segment type {seg_type}")
        # anything else: skip by declared length
    if not regions:
        raise NotImplementedError("no generic region in stream")
    if page_w is None:
        page_w = max(x + r.shape[1] for x, _y, _c, r in regions)
    if page_h is None:
        page_h = max(y + r.shape[0] for _x, y, _c, r in regions)
    if page_w * page_h > 400_000_000:
        raise ValueError(f"page too large ({page_w}x{page_h})")
    page = np.full((page_h, page_w), page_default, np.uint8)
    for x, y, comb, r in regions:
        src = r[:max(0, page_h - y), :max(0, page_w - x)]
        dst = page[y:y + src.shape[0], x:x + src.shape[1]]
        # external combination operator (7.4.1.5): OR/AND/XOR/XNOR/REPLACE
        if comb == 1:
            dst &= src
        elif comb == 2:
            dst ^= src
        elif comb == 3:
            dst[:] = 1 - (dst ^ src)
        elif comb == 4:
            dst[:] = src
        else:
            dst |= src
    return page


def encode(img: np.ndarray, template: int = 0,
           tpgdon: bool = False) -> bytes:
    """Encode a 0/1 bitmap as a PDF-embeddable JBIG2 stream: page info
    (48) + immediate lossless generic region (39) + end-of-page (49),
    nominal AT pixels."""
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape
    mq = encode_generic(img, template=template, tpgdon=tpgdon)

    def seg(num: int, seg_type: int, body: bytes) -> bytes:
        return (struct.pack(">IB", num, seg_type | 0x00)
                + b"\x00"          # no referred-to segments
                + b"\x01"          # page 1 (1-byte association)
                + struct.pack(">I", len(body)) + body)

    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    n_at = 4 if template == 0 else 1
    at_bytes = b"".join(
        struct.pack("bb", dx, dy)
        for dy, dx in NOMINAL_AT[template][:n_at])
    region = (struct.pack(">IIIIB", w, h, 0, 0, 0)
              + bytes([(template << 1) | (8 if tpgdon else 0)])
              + at_bytes + mq)
    return (seg(1, 48, page_info) + seg(2, 39, region)
            + seg(3, 49, b""))
