"""Baseline JPEG codec (jimmy_ray.codecs.jpeg) — T.81 conformance.

Three independent anchors (the encoder alone would be co-derived):
1. a hand-crafted byte stream, built marker-by-marker in this file with
   hand-computed Huffman codes, that must decode to an exactly-known
   image;
2. solid-block exactness: quantized-DC round-trip is exact for gray
   levels 128 ± 2k, proven against the closed-form value;
3. encode→decode PSNR on gradients/noise plus structural checks
   (odd sizes, color, ZRL runs, 4:2:0 subsampling, restart markers,
   non-baseline rejection).
"""

import struct

import numpy as np
import pytest

from jimmy_ray.codecs import jpeg


def _psnr(a, b):
    mse = float(np.mean((a.astype(float) - b.astype(float)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


# --- 1. hand-crafted stream --------------------------------------------------

def _handmade_gray_jpeg() -> bytes:
    """8x8 gray value 160, built by hand.

    DC coeff = (160-128)*8 = 256, quantizer 16 → level 16, category 5.
    Std DC-luma canonical codes: cat5 = '110'; AC EOB = '1010'.
    Entropy bits: 110 10000 1010 + 4 one-pad = 0xD0AF.
    """
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
        + bytes(int(x) for x in jpeg.STD_LUMA_QT)
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for tc, (counts, syms) in ((0, jpeg.STD_DC_LUMA), (1, jpeg.STD_AC_LUMA)):
        body = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bytes([0xD0, 0xAF])
    out += b"\xff\xd9"
    return bytes(out)


def test_handmade_stream_decodes_exactly():
    img = jpeg.decode(_handmade_gray_jpeg())
    assert img.shape == (8, 8)
    assert (img == 160).all()


# --- 2. solid-block exactness ------------------------------------------------

def test_solid_gray_exact_for_even_offsets():
    for v in (128, 130, 160, 226, 126, 64):
        img = np.full((13, 21), v, np.uint8)      # odd dims: padding path
        dec = jpeg.decode(jpeg.encode(img))
        assert dec.shape == (13, 21)
        assert (dec == v).all(), v


# --- 3. roundtrips + structure ----------------------------------------------

def test_gradient_roundtrip_gray_and_color():
    h, w = 37, 61
    y, x = np.mgrid[0:h, 0:w]
    gray = ((x * 255 / (w - 1)) * 0.5 + (y * 255 / (h - 1)) * 0.5
            ).astype(np.uint8)
    assert _psnr(jpeg.decode(jpeg.encode(gray)), gray) > 40
    rgb = np.stack([(x * 255 / (w - 1)).astype(np.uint8),
                    (y * 255 / (h - 1)).astype(np.uint8),
                    np.full((h, w), 64, np.uint8)], axis=-1)
    dec = jpeg.decode(jpeg.encode(rgb))
    assert dec.shape == (h, w, 3)
    assert _psnr(dec, rgb) > 35


def test_noise_roundtrip_exercises_zrl_and_long_codes():
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 256, (64, 48), dtype=np.uint8).astype(np.uint8)
    dec = jpeg.decode(jpeg.encode(noise))
    assert dec.shape == noise.shape
    assert _psnr(dec, noise) > 15     # JPEG flattens noise; sanity bound
    # sparse spikes force ZRL (run>15) paths
    spikes = np.zeros((16, 16), np.uint8)
    spikes[3, 9] = 255
    spikes[12, 2] = 200
    dec = jpeg.decode(jpeg.encode(spikes))
    assert dec.shape == (16, 16)


def _build_420(y_plane: np.ndarray, cb_val: int, cr_val: int) -> bytes:
    """Hand-assemble a 4:2:0 stream: Y 2x2 sampling, solid chroma."""
    h, w = y_plane.shape
    assert h % 16 == 0 and w % 16 == 0
    out = bytearray(b"\xff\xd8")

    def dqt(tq, qt):
        # zigzag payload order, B.2.4.1 (matches the fixed encoder)
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in qt[jpeg.ZIGZAG])

    out += dqt(0, jpeg.STD_LUMA_QT) + dqt(1, jpeg.STD_CHROMA_QT)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for tc, th, tbl in ((0, 0, jpeg.STD_DC_LUMA), (1, 0, jpeg.STD_AC_LUMA),
                        (0, 1, jpeg.STD_DC_CHROMA),
                        (1, 1, jpeg.STD_AC_CHROMA)):
        body = bytes([(tc << 4) | th]) + bytes(tbl[0]) + bytes(tbl[1])
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_codes = [jpeg._huff_codes(*jpeg.STD_DC_LUMA),
                jpeg._huff_codes(*jpeg.STD_DC_CHROMA)]
    ac_codes = [jpeg._huff_codes(*jpeg.STD_AC_LUMA),
                jpeg._huff_codes(*jpeg.STD_AC_CHROMA)]
    yq = jpeg._quantize_plane(y_plane.astype(np.float64), jpeg.STD_LUMA_QT)
    # chroma plane is half resolution
    cbq = jpeg._quantize_plane(
        np.full((h // 2, w // 2), float(cb_val)), jpeg.STD_CHROMA_QT)
    crq = jpeg._quantize_plane(
        np.full((h // 2, w // 2), float(cr_val)), jpeg.STD_CHROMA_QT)
    bw = jpeg._BitWriter()
    preds = [0, 0, 0]
    mcux, mcuy = w // 16, h // 16
    yw = w // 8           # Y blocks per row
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(2):          # 4 Y blocks, raster in MCU
                for bx in range(2):
                    bi = (my * 2 + by) * yw + (mx * 2 + bx)
                    preds[0] = jpeg._encode_block(
                        bw, yq[bi], dc_codes[0], ac_codes[0], preds[0])
            ci = my * (w // 16) + mx
            preds[1] = jpeg._encode_block(
                bw, cbq[ci], dc_codes[1], ac_codes[1], preds[1])
            preds[2] = jpeg._encode_block(
                bw, crq[ci], dc_codes[1], ac_codes[1], preds[2])
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def test_420_subsampled_decode():
    h, w = 32, 48
    y, x = np.mgrid[0:h, 0:w]
    yp = (128 + 2 * ((x + y) % 48)).astype(np.float64)
    data = _build_420(yp, 128, 128)       # neutral chroma -> gray RGB
    dec = jpeg.decode(data)
    assert dec.shape == (h, w, 3)
    # neutral chroma: channels equal and track the luma plane
    assert _psnr(dec[..., 0], np.clip(yp, 0, 255).astype(np.uint8)) > 30
    assert np.abs(dec[..., 0].astype(int) - dec[..., 1].astype(int)).max() <= 1


def test_non_baseline_rejected():
    data = bytearray(jpeg.encode(np.full((8, 8), 128, np.uint8)))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2                      # pretend progressive
    with pytest.raises(NotImplementedError):
        jpeg.decode(bytes(data))
    with pytest.raises(jpeg.JpegDecodeError):
        jpeg.decode(b"\x00\x01")


def test_pdf_image_features_kernel():
    from jimmy_ray.sources.pdf import (extract_pdf_images, extract_pdf_text,
                                       synth_pdf_with_images)

    for d in (0, 7, 49, 123):
        pdf = synth_pdf_with_images(d, "hello { } world")
        rows = extract_pdf_images(pdf)
        assert len(rows) == 1
        r = rows[0]
        assert r["width"] == 5 + d % 20 and r["height"] == 4 + d % 15
        assert r["channels"] == 1 and r["decoded"]
        assert r["mean_luma_milli"] == (128 + 2 * (d % 50)) * 1000
        # the image object never pollutes the text path
        assert extract_pdf_text(pdf).startswith(f"Doc {d}:")


def test_multimodal_dispatch_decodes_jpeg():
    from jimmy_ray.stages.multimodal import decode_image

    img = np.full((9, 11), 150, np.uint8)
    out = decode_image(jpeg.encode(img))
    assert out.shape == (9, 11) and (out == 150).all()
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....")


def test_fill_bytes_before_markers_decode():
    # T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    # bytes — real scanner output embedded in PDFs has them
    data = _handmade_gray_jpeg()
    filled = data.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    filled = filled.replace(b"\xff\xc4", b"\xff\xff\xff\xff\xc4", 1)
    img = jpeg.decode(filled)
    assert (img == 160).all()


def test_encoder_dqt_payload_is_zigzag_order():
    # DQT payloads are zigzag-ordered (B.2.4.1); a spec decoder that
    # un-zigzags must recover the natural-order Annex K matrix
    data = jpeg.encode(np.full((8, 8), 130, np.uint8))
    at = data.index(b"\xff\xdb")
    payload = data[at + 5:at + 5 + 64]
    got_natural = np.zeros(64, dtype=np.int64)
    got_natural[jpeg.ZIGZAG] = np.frombuffer(payload, np.uint8)
    assert (got_natural == jpeg.STD_LUMA_QT).all()


def test_truncated_jpeg_degrades_in_media_stage():
    import pyarrow as pa

    from jimmy_ray.stages.multimodal import MediaFeatureStage

    good = jpeg.encode(np.full((8, 8), 130, np.uint8))
    corrupt = good[:18]  # JPEG magic, truncated mid-header
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "media_type": pa.array(["image", "image"], pa.string()),
        "payload": pa.array([good, corrupt], pa.binary()),
    })
    out = MediaFeatureStage()(batch).to_pylist()
    assert out[0]["decoded"] is True
    assert out[1]["decoded"] is False  # fallback row, not a batch error


def test_multi_scan_rejected_not_silently_wrong():
    # a color SOS declaring fewer components than the frame would leave
    # chroma planes zero — must raise, so PDF rows degrade to
    # decoded=False instead of emitting wrong features
    data = bytearray(jpeg.encode(np.zeros((8, 8, 3), np.uint8)))
    i = data.find(b"\xff\xda")
    seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
    # rewrite SOS to a single-component scan (Y only)
    new_sos = bytes([1, 1, 0x00, 0, 63, 0])
    data[i + 2:i + 2 + seglen] = struct.pack(">H", len(new_sos) + 2) + new_sos
    with pytest.raises(NotImplementedError, match="multi-scan"):
        jpeg.decode(bytes(data))
