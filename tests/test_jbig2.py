"""JBIG2 codec (jimmy_ray.codecs.jbig2) — T.88 generic-region subset.

Round-trips pin the MQ coder and every generic-region decode path
(templates 0-3 × TPGDON); hand-crafted segment streams pin the
decoder-only layouts the fixture encoder never emits (4-byte page
association, long-form referred-segment counts, 2-byte referred segment
numbers, unknown page height, custom AT pixels, region offsets, skipped
unknown segments) per the repo's spec-subset-codec rule; unsupported
families (MMR, symbol/text segments, unknown lengths) must raise
``NotImplementedError`` so PDF rows degrade to decoded=False.
"""

import itertools
import struct

import numpy as np
import pytest

from jimmy_ray.codecs import jbig2
from jimmy_ray.codecs.jbig2 import MQDecoder, MQEncoder


def _mq_roundtrip(bits, nctx=1, ctx_ids=None):
    ctx_ids = ctx_ids or [0] * len(bits)
    enc = MQEncoder()
    ecx = [[0, 0] for _ in range(nctx)]
    for b, c in zip(bits, ctx_ids):
        enc.encode(ecx[c], b)
    data = enc.flush()
    dec = MQDecoder(data)
    dcx = [[0, 0] for _ in range(nctx)]
    return [dec.decode(dcx[c]) for c in ctx_ids]


def test_mq_exhaustive_short_sequences():
    for n in range(1, 11):
        for bits in itertools.product((0, 1), repeat=n):
            assert _mq_roundtrip(list(bits)) == list(bits)


def test_mq_random_long_sequences_multi_context():
    rng = np.random.default_rng(7)
    for _ in range(40):
        n = int(rng.integers(1, 4000))
        bits = (rng.random(n) < rng.random()).astype(int).tolist()
        nctx = int(rng.integers(1, 16))
        ids = rng.integers(0, nctx, n).tolist()
        assert _mq_roundtrip(bits, nctx, ids) == bits


def test_mq_skewed_streams_hit_stuffing():
    # long all-MPS runs walk the Qe ladder to tiny intervals and force
    # 0xFF output bytes → exercises the bit-stuffing byteout/bytein paths
    bits = [0] * 5000 + [1] + [0] * 5000
    assert _mq_roundtrip(bits) == bits


@pytest.mark.parametrize("template", [0, 1, 2, 3])
@pytest.mark.parametrize("tpgdon", [False, True])
def test_generic_region_roundtrip(template, tpgdon):
    rng = np.random.default_rng(template * 2 + tpgdon)
    for _ in range(6):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        img = (rng.random((h, w)) < rng.random()).astype(np.uint8)
        body = jbig2.encode_generic(img, template=template, tpgdon=tpgdon)
        out = jbig2.decode_generic(body, w, h, template=template,
                                   tpgdon=tpgdon)
        assert np.array_equal(out, img)


def test_tpgdon_typical_rows_compress_and_roundtrip():
    img = np.zeros((40, 60), np.uint8)
    img[10:20] = 1
    img[25, ::2] = 1
    plain = jbig2.encode_generic(img, tpgdon=False)
    typical = jbig2.encode_generic(img, tpgdon=True)
    assert len(typical) < len(plain)  # repeated rows skip pixel coding
    assert np.array_equal(
        jbig2.decode_generic(typical, 60, 40, tpgdon=True), img)


@pytest.mark.parametrize("template", [0, 1, 2, 3])
@pytest.mark.parametrize("tpgdon", [False, True])
def test_embedded_stream_roundtrip(template, tpgdon):
    img = (np.indices((13, 22)).sum(0) % 3 == 0).astype(np.uint8)
    st = jbig2.encode(img, template=template, tpgdon=tpgdon)
    out = jbig2.decode(st)
    assert np.array_equal(out, img)


# --- hand-crafted decoder-only layouts --------------------------------------

def _segment(num, seg_type, body, page=1, page4=False, refs=(),
             long_form=False):
    """Build a T.88 7.2 segment header the fixture encoder never emits."""
    flags = seg_type | (0x40 if page4 else 0)
    out = struct.pack(">IB", num, flags)
    if long_form or len(refs) > 4:
        out += struct.pack(">I", 0xE0000000 | len(refs))
        out += bytes((len(refs) + 8) // 8)  # retain bits, all zero
    else:
        out += bytes([len(refs) << 5])
    ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
    for r in refs:
        out += r.to_bytes(ref_size, "big")
    out += struct.pack(">I", page) if page4 else bytes([page])
    return out + struct.pack(">I", len(body)) + body


def _region_body(img, template=0, tpgdon=False, x=0, y=0, at=None):
    h, w = img.shape
    n_at = 4 if template == 0 else 1
    at = at or jbig2.NOMINAL_AT[template]
    at_bytes = b"".join(struct.pack("bb", dx, dy)
                        for dy, dx in at[:n_at])
    mq = jbig2.MQEncoder()
    jbig2._code_generic(np.ascontiguousarray(img, np.uint8), w, h,
                        template, at, tpgdon, mq)
    return (struct.pack(">IIIIB", w, h, x, y, 0)
            + bytes([(template << 1) | (8 if tpgdon else 0)])
            + at_bytes + mq.flush())


_IMG = (np.indices((9, 14)).sum(0) % 2).astype(np.uint8)


def test_four_byte_page_association_and_long_form_refs():
    page_info = struct.pack(">IIIIBH", 14, 9, 0, 0, 0, 0)
    st = (_segment(1, 48, page_info, page4=True)
          + _segment(2, 39, _region_body(_IMG), page4=True,
                     refs=(1,) * 9, long_form=True))
    assert np.array_equal(jbig2.decode(st), _IMG)


def test_two_byte_referred_segment_numbers():
    # segment numbers > 256 switch referred-segment ids to 2 bytes
    page_info = struct.pack(">IIIIBH", 14, 9, 0, 0, 0, 0)
    st = (_segment(300, 48, page_info)
          + _segment(301, 39, _region_body(_IMG), refs=(300, 299)))
    assert np.array_equal(jbig2.decode(st), _IMG)


def test_unknown_page_height_derived_from_regions():
    page_info = struct.pack(">IIIIBH", 14, 0xFFFFFFFF, 0, 0, 0, 0)
    st = _segment(1, 48, page_info) + _segment(2, 38, _region_body(_IMG))
    assert np.array_equal(jbig2.decode(st), _IMG)


def test_no_page_info_stream():
    st = _segment(1, 39, _region_body(_IMG))
    assert np.array_equal(jbig2.decode(st), _IMG)


def test_region_offset_composes_onto_page():
    page_info = struct.pack(">IIIIBH", 20, 15, 0, 0, 0, 0)
    st = (_segment(1, 48, page_info)
          + _segment(2, 39, _region_body(_IMG, x=3, y=4)))
    page = jbig2.decode(st)
    assert page.shape == (15, 20)
    assert np.array_equal(page[4:13, 3:17], _IMG)
    assert page[:4].sum() == 0 and page[:, :3].sum() == 0


def test_custom_at_pixels():
    at = ((-1, 1), (-1, -1), (-2, 1), (-2, -1))
    body = _region_body(_IMG, template=0, at=at)
    st = _segment(1, 39, body)
    assert np.array_equal(jbig2.decode(st), _IMG)


def test_unknown_segment_types_skipped_by_length():
    page_info = struct.pack(">IIIIBH", 14, 9, 0, 0, 0, 0)
    st = (_segment(1, 48, page_info)
          + _segment(2, 62, b"extension-payload-ignored")  # extension
          + _segment(3, 53, b"\x00\x01\x02")               # custom table
          + _segment(4, 39, _region_body(_IMG))
          + _segment(5, 49, b"")                           # end of page
          + _segment(6, 51, b""))                          # end of file
    assert np.array_equal(jbig2.decode(st), _IMG)


@pytest.mark.parametrize("body,msg", [
    (struct.pack(">IIIIB", 4, 4, 0, 0, 0) + b"\x01", "MMR"),
])
def test_mmr_region_raises(body, msg):
    with pytest.raises(NotImplementedError, match=msg):
        jbig2.decode(_segment(1, 39, body))


def test_symbol_and_text_segments_raise():
    with pytest.raises(NotImplementedError, match="symbol"):
        jbig2.decode(_segment(1, 0, b"\x00\x00"))
    with pytest.raises(NotImplementedError, match="segment type 6"):
        jbig2.decode(_segment(1, 6, b"\x00"))


def test_unknown_data_length_raises():
    hdr = (struct.pack(">IB", 1, 39) + b"\x00" + b"\x01"
           + struct.pack(">I", 0xFFFFFFFF))
    with pytest.raises(NotImplementedError, match="length"):
        jbig2.decode(hdr)


def test_empty_stream_raises():
    with pytest.raises(NotImplementedError, match="no generic region"):
        jbig2.decode(b"")


# --- PDF integration ---------------------------------------------------------

def test_pdf_jbig2_features_kernel():
    from jimmy_ray.sources.pdf import extract_pdf_images, synth_pdf_with_jbig2

    for d in range(16):  # covers all 8 template×tpgdon variants twice
        r = extract_pdf_images(synth_pdf_with_jbig2(d))[0]
        w, h = 6 + d % 17, 5 + d % 13
        assert r["decoded"] and (r["width"], r["height"]) == (w, h)
        assert r["black_px"] == (w * h - ((3 - d % 3) % 3) + 2) // 3
        assert r["channels"] == 1


def test_pdf_mmr_jbig2_degrades_to_undecoded():
    from jimmy_ray.sources.pdf import extract_pdf_images

    body = _segment(1, 39, struct.pack(">IIIIB", 4, 4, 0, 0, 0) + b"\x01")
    obj = (b"4 0 obj << /Subtype /Image /Width 4 /Height 4 "
           b"/BitsPerComponent 1 /Filter /JBIG2Decode /Length %d >>\n"
           b"stream\n" % len(body))
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
           + obj + body + b"\nendstream endobj\n"
           b"trailer << /Root 1 0 R >>\n%%EOF")
    rows = extract_pdf_images(pdf)
    assert len(rows) == 1 and rows[0]["decoded"] is False


def test_hostile_positive_dy_at_pixel_does_not_crash():
    # spec AT pixels only reference already-decoded rows (dy <= 0); a
    # hostile stream may still declare dy > 0 — decode must treat the
    # out-of-window pixel as 0, not IndexError past the bitmap
    body = _region_body(_IMG, template=1, at=((2, 1),))
    out = jbig2.decode(_segment(1, 39, body))
    assert out.shape == _IMG.shape  # content may differ; no crash


def test_truncated_segment_degrades_in_pdf():
    from jimmy_ray.sources.pdf import extract_pdf_images

    st = jbig2.encode(_IMG)[:11]  # cut inside the first segment header
    obj = (b"4 0 obj << /Subtype /Image /Width 14 /Height 9 "
           b"/BitsPerComponent 1 /Filter /JBIG2Decode /Length %d >>\n"
           b"stream\n" % len(st))
    pdf = (b"%PDF-1.4\n" + obj + st + b"\nendstream endobj\n"
           b"trailer << /Root 1 0 R >>\n%%EOF")
    rows = extract_pdf_images(pdf)
    assert len(rows) == 1 and rows[0]["decoded"] is False


def test_page_default_pixel_one():
    # page flags bit 2: default pixel value 1 — pixels outside regions
    # must be black, not the zeros the fixture encoder always implies
    page_info = struct.pack(">IIIIBH", 20, 12, 0, 0, 0x04, 0)
    body = _region_body(_IMG, x=2, y=1)
    body = body[:16] + b"\x04" + body[17:]  # REPLACE onto the 1s page
    st = _segment(1, 48, page_info) + _segment(2, 39, body)
    page = jbig2.decode(st)
    assert page[0].all() and page[:, 0].all()  # default-1 border
    assert page[11].all() and page[:, 17:].all()
    assert np.array_equal(page[1:10, 2:16], _IMG)  # replaced interior


def test_region_combination_operators():
    ones = np.ones((9, 14), np.uint8)
    page_info = struct.pack(">IIIIBH", 14, 9, 0, 0, 0x04, 0)  # default 1
    for comb, expect in ((1, _IMG),              # AND with 1s → img
                         (2, 1 - _IMG),          # XOR with 1s → ~img
                         (3, _IMG),              # XNOR with 1s → img
                         (4, _IMG)):             # REPLACE → img
        body = _region_body(_IMG)
        # patch the external-combination byte (offset 16 of region info)
        body = body[:16] + bytes([comb]) + body[17:]
        page = jbig2.decode(_segment(1, 48, page_info)
                            + _segment(2, 39, body))
        assert np.array_equal(page, expect), comb
    del ones
