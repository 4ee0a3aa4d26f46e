"""Hexagonal multi-resolution geocells (the H3-analogue, from scratch).

No h3 package exists here, so this implements a genuine hexagonal cell
index using the standard public axial-coordinate math (pointy-top
hexagons, cube rounding — the textbook hex-grid construction): the
equirectangular plane (lon, lat in degrees) is tiled by hexagons whose
size shrinks by sqrt(7) per resolution step (H3's aperture-7 ratio).
Resolutions 7-9 match the north star's "H3 res 7-9" scale band
(res 7 edge ≈ 0.05° ≈ 5.5 km).

Hex k-rings are exact in axial coordinates (hex distance =
(|dq| + |dr| + |dq+dr|) / 2), which is what the kNN k-ring expansion
path uses.  Like S2, the float projection means hex ids are not
SQL-mirrorable bit-exactly — hex queries get the rows-only check, the
bit-exact oracle path is the integer geocell grid (jimmy_ray.geo.core).
"""

from __future__ import annotations

import math

import numpy as np

_SQRT3 = math.sqrt(3.0)
_SQRT7 = math.sqrt(7.0)
BASE_SIZE_DEG = 0.05  # hex size (center->vertex) at resolution 7
HEX_RESOLUTIONS = (7, 8, 9)

_OFFSET = 1 << 26  # axial coords packed with sign offset


def hex_size(res: int) -> float:
    return BASE_SIZE_DEG / (_SQRT7 ** (res - 7))


def _axial_fractional(lat_deg, lon_deg, res: int):
    size = hex_size(res)
    x = np.asarray(lon_deg, dtype=np.float64)
    y = np.asarray(lat_deg, dtype=np.float64)
    q = (_SQRT3 / 3.0 * x - y / 3.0) / size
    r = (2.0 / 3.0 * y) / size
    return q, r


def _cube_round(fq: np.ndarray, fr: np.ndarray):
    """Standard cube rounding (fix the axis with the largest error)."""
    fs = -fq - fr
    q = np.round(fq)
    r = np.round(fr)
    s = np.round(fs)
    dq = np.abs(q - fq)
    dr = np.abs(r - fr)
    ds = np.abs(s - fs)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = (~fix_q) & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hexcell_qr(lat_deg, lon_deg, res: int):
    return _cube_round(*_axial_fractional(lat_deg, lon_deg, res))


def hexcell_id(lat_deg, lon_deg, res: int) -> np.ndarray:
    """Packed hex cell id: (res << 56) | (q + 2^26) << 28 | (r + 2^26)."""
    q, r = hexcell_qr(lat_deg, lon_deg, res)
    return (np.int64(res) << 56) | ((q + _OFFSET) << 28) | (r + _OFFSET)


def hexcell_id_e6(lat_e6, lon_e6, res: int) -> np.ndarray:
    return hexcell_id(
        np.asarray(lat_e6, dtype=np.float64) / 1e6,
        np.asarray(lon_e6, dtype=np.float64) / 1e6,
        res,
    )


def hexcell_components(cell_id) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell_id = np.asarray(cell_id, dtype=np.int64)
    res = cell_id >> 56
    q = ((cell_id >> 28) & ((1 << 28) - 1)) - _OFFSET
    r = (cell_id & ((1 << 28) - 1)) - _OFFSET
    return res, q, r


def hexcell_center(cell_id) -> tuple[np.ndarray, np.ndarray]:
    """(lat_deg, lon_deg) of the cell center (projection inverse)."""
    res, q, r = hexcell_components(cell_id)
    size = np.array([hex_size(int(x)) for x in np.atleast_1d(res)])
    lat = 1.5 * r * size
    lon = _SQRT3 * (q + r / 2.0) * size
    return lat, lon


def hex_distance(id_a: int, id_b: int) -> int:
    """Exact hex grid distance between two cells at the same resolution."""
    res_a, qa, ra = hexcell_components(np.int64(id_a))
    res_b, qb, rb = hexcell_components(np.int64(id_b))
    assert int(res_a) == int(res_b)
    dq = int(qa - qb)
    dr = int(ra - rb)
    return (abs(dq) + abs(dr) + abs(dq + dr)) // 2


def k_ring(cell_id: int, k: int) -> np.ndarray:
    """All hex cells within grid distance k (1 + 3k(k+1) cells)."""
    res, q, r = (int(v) for v in hexcell_components(np.int64(cell_id)))
    dqs, drs = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1),
                           indexing="ij")
    dqs = dqs.ravel()
    drs = drs.ravel()
    keep = (np.abs(dqs) + np.abs(drs) + np.abs(dqs + drs)) // 2 <= k
    nq = q + dqs[keep].astype(np.int64)
    nr = r + drs[keep].astype(np.int64)
    return (np.int64(res) << 56) | ((nq + _OFFSET) << 28) | (nr + _OFFSET)


# --- scalar reference ------------------------------------------------------

def hexcell_id_scalar(lat_deg: float, lon_deg: float, res: int) -> int:
    size = hex_size(res)
    fq = (_SQRT3 / 3.0 * lon_deg - lat_deg / 3.0) / size
    fr = (2.0 / 3.0 * lat_deg) / size
    fs = -fq - fr
    q, r, s = round(fq), round(fr), round(fs)
    dq, dr, ds = abs(q - fq), abs(r - fr), abs(s - fs)
    if dq > dr and dq > ds:
        q = -r - s
    elif dr > ds:
        r = -q - s
    return (res << 56) | ((int(q) + _OFFSET) << 28) | (int(r) + _OFFSET)
