"""Seeded mutation fuzz for the image codecs' fault-isolation contract.

extract_pdf_images promises that a malformed embedded image degrades to
a ``decoded=False`` row.  That holds only if every failure the codecs
can produce on hostile bytes is (a) one of the exception types the PDF
layer catches and (b) bounded — no hangs, no multi-GB allocations.
These tests bit-flip / truncate / splice valid streams under fixed
seeds and assert exactly that envelope.
"""

import struct

import numpy as np
import pytest

from jimmy_ray.codecs import jbig2, jpeg

# the exact isolation envelope extract_pdf_images catches
_CONTROLLED = (NotImplementedError, ValueError, KeyError, IndexError,
               struct.error)


def _assert_controlled(fn):
    try:
        out = fn()
    except _CONTROLLED:
        return
    assert out is None or isinstance(out, np.ndarray)


def test_jpeg_bitflip_fuzz():
    # flips restricted to the entropy-coded segment: dimension-byte
    # hostility is covered by the explicit too-large test below, and a
    # flipped-but-legal huge SOF would make the fuzz spend minutes in a
    # legitimate decode instead of testing robustness
    rng = np.random.default_rng(1234)
    grad = (np.add.outer(np.arange(24), np.arange(40)) * 3 % 256
            ).astype(np.uint8)
    base = bytearray(jpeg.encode(grad))
    ecs = base.index(b"\xff\xda") + 14  # past the SOS header
    for _ in range(250):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            data[int(rng.integers(ecs, len(data)))] ^= 1 << int(
                rng.integers(0, 8))
        _assert_controlled(lambda d=bytes(data): jpeg.decode(d))


def test_jpeg_truncation_fuzz():
    base = jpeg.encode(np.full((16, 16), 200, np.uint8))
    for cut in range(2, len(base), 3):
        _assert_controlled(lambda d=base[:cut]: jpeg.decode(d))


def test_jpeg_hostile_dimensions_rejected_before_allocating():
    data = bytearray(jpeg.encode(np.full((8, 8), 128, np.uint8)))
    i = data.find(b"\xff\xc0")
    data[i + 5:i + 9] = struct.pack(">HH", 0xFFFF, 0xFFFF)  # 65535x65535
    with pytest.raises(jpeg.JpegDecodeError, match="too large"):
        jpeg.decode(bytes(data))


def test_jbig2_bitflip_fuzz():
    # flips restricted to the MQ-coded body (the last segment's data):
    # header-byte hostility is covered by the explicit tests, and a
    # flipped-but-under-cap region size would turn one mutation into a
    # minutes-long legitimate pixel loop
    rng = np.random.default_rng(99)
    img = (np.indices((11, 17)).sum(0) % 2).astype(np.uint8)
    base = bytearray(jbig2.encode(img))
    mq_start = len(base) - 40  # inside the generic region's MQ data
    for _ in range(250):
        data = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            data[int(rng.integers(mq_start, len(data)))] ^= 1 << int(
                rng.integers(0, 8))
        _assert_controlled(lambda d=bytes(data): jbig2.decode(d))


def test_jbig2_truncation_fuzz():
    base = jbig2.encode((np.indices((9, 9)).sum(0) % 2).astype(np.uint8))
    for cut in range(0, len(base), 2):
        _assert_controlled(lambda d=base[:cut]: jbig2.decode(d))


def test_jbig2_hostile_dimensions_rejected_before_allocating():
    # region header declaring a ~4-billion-pixel bitmap
    body = struct.pack(">IIIIB", 0xFFFF0000, 0xFFFF, 0, 0, 0) + b"\x00"
    seg = (struct.pack(">IB", 1, 39) + b"\x00" + b"\x01"
           + struct.pack(">I", len(body)) + body)
    with pytest.raises(ValueError, match="too large"):
        jbig2.decode(seg)


def test_random_bytes_never_escape_the_envelope():
    rng = np.random.default_rng(7)
    for _ in range(200):
        blob = rng.integers(0, 256, int(rng.integers(0, 300)),
                            dtype=np.uint8).tobytes()
        _assert_controlled(lambda d=blob: jbig2.decode(d))
        _assert_controlled(lambda d=b"\xff\xd8" + blob: jpeg.decode(d))
