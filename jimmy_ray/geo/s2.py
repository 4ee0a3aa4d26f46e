"""S2 cell ids — genuine implementation from the public S2 geometry spec.

No s2 library exists in this environment, so this implements the real
thing from the published algorithm (s2geometry.io docs / the Apache-2.0
reference design): lat/lng → unit XYZ → cube face + (u,v) → quadratic
(s,t) → 30-bit (i,j) → Hilbert-curve position via 4-bit lookup tables →
64-bit leaf cell id; plus parent-at-level and the hex token form.

The encoder is fully vectorized numpy (the Hilbert walk is 8 table
lookups per point, each a ``np.take``); a scalar reference implementation
is kept alongside for conformance tests (FIXTURES.md §4 "trusted scalar
reference").  Float (u,v) math means S2 ids are *not* mirrored in SQL —
s2 queries get the driver's rows-only check; the bit-exact oracle path
uses the integer geocell grid (jimmy_ray.geo.core).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1
LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2

POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)

_LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig_orientation: int,
                 pos: int, orientation: int) -> None:
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = POS_TO_IJ[orientation]
    for index in range(4):
        ij = r[index]
        _init_lookup(level, i + (ij >> 1), j + (ij & 1), orig_orientation,
                     pos + index, orientation ^ POS_TO_ORIENTATION[index])


for _orient in range(4):
    _init_lookup(0, 0, 0, _orient, 0, _orient)


# --- projections -----------------------------------------------------------

def _xyz_from_latlng(lat_deg: np.ndarray, lng_deg: np.ndarray):
    lat = np.deg2rad(lat_deg)
    lng = np.deg2rad(lng_deg)
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lng), cos_lat * np.sin(lng), np.sin(lat)


def _face_uv(x, y, z):
    """Largest-component cube face + per-face (u, v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= np.maximum(ay, az), 0, np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate((
        (lambda: y / x, lambda: z / x),      # face 0: +x
        (lambda: -x / y, lambda: z / y),     # face 1: +y
        (lambda: -x / z, lambda: -y / z),    # face 2: +z
        (lambda: z / x, lambda: y / x),      # face 3: -x
        (lambda: z / y, lambda: -x / y),     # face 4: -y
        (lambda: -y / z, lambda: -x / z),    # face 5: -z
    )):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def _uv_to_st(uv: np.ndarray) -> np.ndarray:
    """S2 quadratic projection."""
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(uv >= 0, 0.5 * np.sqrt(1.0 + 3.0 * uv),
                        1.0 - 0.5 * np.sqrt(1.0 - 3.0 * uv))


def _st_to_ij(st: np.ndarray) -> np.ndarray:
    ij = np.floor((1 << MAX_LEVEL) * st).astype(np.int64)
    return np.clip(ij, 0, (1 << MAX_LEVEL) - 1)


# --- cell id encoding ------------------------------------------------------

def _from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Vectorized Hilbert walk: 8 chunks of 4 bits via lookup tables."""
    n = face.astype(np.uint64) << np.uint64(POS_BITS - 1)
    bits = (face & SWAP_MASK).astype(np.int64)
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = np.take(_LOOKUP_POS, bits)
        n |= (bits.astype(np.uint64) >> np.uint64(2)) << np.uint64(k * 2 * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    return (n * np.uint64(2) + np.uint64(1)).astype(np.uint64)


def latlng_to_cell_id(lat_deg, lng_deg, level: int = MAX_LEVEL) -> np.ndarray:
    """Vectorized: degrees -> uint64 S2 cell id at ``level``."""
    lat_deg = np.asarray(lat_deg, dtype=np.float64)
    lng_deg = np.asarray(lng_deg, dtype=np.float64)
    x, y, z = _xyz_from_latlng(lat_deg, lng_deg)
    face, u, v = _face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    leaf = _from_face_ij(face, i, j)
    return parent(leaf, level) if level < MAX_LEVEL else leaf


def latlng_e6_to_cell_id(lat_e6, lon_e6, level: int = MAX_LEVEL) -> np.ndarray:
    return latlng_to_cell_id(
        np.asarray(lat_e6, dtype=np.float64) / 1e6,
        np.asarray(lon_e6, dtype=np.float64) / 1e6,
        level,
    )


def parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell at ``level`` (spec: clear sub-level bits, set lsb)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (cell_id & (~(new_lsb - np.uint64(1)))) | new_lsb


def level_of(cell_id) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    cell_id = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    lsb = cell_id & (~cell_id + np.uint64(1))
    v = lsb.copy()
    shift = np.zeros(cell_id.shape, dtype=np.uint64)
    for b in (32, 16, 8, 4, 2, 1):
        big = (v >> np.uint64(b)) != 0
        shift[big] += np.uint64(b)
        v[big] >>= np.uint64(b)
    return MAX_LEVEL - (shift.astype(np.int64) >> 1)


def face_of(cell_id) -> np.ndarray:
    return (np.asarray(cell_id, dtype=np.uint64) >> np.uint64(POS_BITS)).astype(np.int64)


def token(cell_id: int) -> str:
    """Canonical hex token: 16 nibbles with trailing zeros stripped."""
    h = f"{int(cell_id):016x}".rstrip("0")
    return h or "X"


# --- scalar reference (conformance tests) ----------------------------------

def latlng_to_cell_id_scalar(lat_deg: float, lng_deg: float,
                             level: int = MAX_LEVEL) -> int:
    import math

    lat = math.radians(lat_deg)
    lng = math.radians(lng_deg)
    x = math.cos(lat) * math.cos(lng)
    y = math.cos(lat) * math.sin(lng)
    z = math.sin(lat)
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x >= 0 else 3
    elif ay >= az:
        face = 1 if y >= 0 else 4
    else:
        face = 2 if z >= 0 else 5
    uv = {
        0: (y / x, z / x),
        1: (-x / y, z / y),
        2: (-x / z, -y / z),
        3: (z / x, y / x),
        4: (z / y, -x / y),
        5: (-y / z, -x / z),
    }[face]

    def st(w: float) -> float:
        return 0.5 * math.sqrt(1 + 3 * w) if w >= 0 else 1 - 0.5 * math.sqrt(1 - 3 * w)

    def ij(s: float) -> int:
        return max(0, min((1 << MAX_LEVEL) - 1, int((1 << MAX_LEVEL) * s)))

    i, j = ij(st(uv[0])), ij(st(uv[1]))
    n = face << (POS_BITS - 1)
    bits = face & SWAP_MASK
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = int(_LOOKUP_POS[bits])
        n |= (bits >> 2) << (k * 2 * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    leaf = n * 2 + 1
    if level < MAX_LEVEL:
        new_lsb = 1 << (2 * (MAX_LEVEL - level))
        leaf = (leaf & ~(new_lsb - 1)) | new_lsb
    return leaf
