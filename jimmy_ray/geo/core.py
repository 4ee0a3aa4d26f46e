"""Deterministic integer-microdegree geo core.

Design decision (scale + determinism): every oracle-checked spatial
operator runs on **int64 microdegrees** (`lat_e6`, `lon_e6`).  All cell /
tile assignment and point-in-polygon tests are pure int64 arithmetic, so
the vectorized numpy kernels here, a scalar Python reference, and a DuckDB
SQL mirror produce *bit-identical* results at any parallelism — there is
no floating-point boundary jitter that could flip a cell assignment
between a 8-CPU and a 256-node run.  (The reference engine gets its
determinism from sorted iteration, cf.
/root/reference/docs/contributing/development_considerations.md:11 and the
first-class note coordinates at
/root/reference/src/jimmy/intermediate_format.py:183-185; we get ours from
integer math keyed off stable columns.)

Cell scheme ("geocell", the H3-analogue built from scratch — no h3/s2
package exists in this environment):

- resolution ``r`` divides the lon axis into ``2**(r+6)`` columns and the
  lat axis into ``2**(r+5)`` rows (equirectangular).  res 7 ≈ 0.044° ≈
  4.9 km at the equator — comparable to H3 res 6/7; res 9 ≈ 0.011°.
- exact parent/child nesting: ``cx_parent == cx_child >> 1`` (floor
  division distributes over the integer projection).
- cell id packing: ``(r << 40) | (cx << 20) | cy``  (cx < 2**15 at res 9).
- k-ring: Chebyshev ring on (cx, cy) with wraparound on cx.

Tile scheme: integer equirectangular z/x/y, ``tile_id = (z << 48) |
(x << 24) | y``.

A genuine hexagonal cell index and a genuine S2 cell id implementation
live in :mod:`jimmy_ray.geo.hexcell` and :mod:`jimmy_ray.geo.s2`; they are
used by the non-oracle query paths (float math cannot be mirrored
bit-exactly in SQL).
"""

from __future__ import annotations

import numpy as np

LAT_SPAN_E6 = 180_000_000
LON_SPAN_E6 = 360_000_000
LAT_MIN_E6 = -90_000_000
LON_MIN_E6 = -180_000_000

GEOCELL_RESOLUTIONS = (7, 8, 9)
TILE_ZOOMS = (7, 10, 12)

EARTH_RADIUS_M = 6_371_000.0


def _as_i64(a) -> np.ndarray:
    return np.asarray(a, dtype=np.int64)


def geocell_cx(lon_e6, res: int) -> np.ndarray:
    """Column index of the geocell at ``res`` (vectorized, exact int64)."""
    nx = np.int64(1) << (res + 6)
    cx = (_as_i64(lon_e6) - LON_MIN_E6) * nx // LON_SPAN_E6
    return np.clip(cx, 0, nx - 1)


def geocell_cy(lat_e6, res: int) -> np.ndarray:
    ny = np.int64(1) << (res + 5)
    cy = (_as_i64(lat_e6) - LAT_MIN_E6) * ny // LAT_SPAN_E6
    return np.clip(cy, 0, ny - 1)


def geocell_id(lat_e6, lon_e6, res: int) -> np.ndarray:
    """Packed geocell id: ``(res << 40) | (cx << 20) | cy``."""
    cx = geocell_cx(lon_e6, res)
    cy = geocell_cy(lat_e6, res)
    return (np.int64(res) << 40) | (cx << 20) | cy


def geocell_parent(cell_id) -> np.ndarray:
    """Parent cell at ``res - 1`` (exact: floor-div nesting)."""
    cell_id = _as_i64(cell_id)
    res = cell_id >> 40
    cx = (cell_id >> 20) & 0xFFFFF
    cy = cell_id & 0xFFFFF
    return ((res - 1) << 40) | ((cx >> 1) << 20) | (cy >> 1)


def geocell_components(cell_id) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell_id = _as_i64(cell_id)
    return cell_id >> 40, (cell_id >> 20) & 0xFFFFF, cell_id & 0xFFFFF


def geocell_k_ring(cell_id: int, k: int) -> np.ndarray:
    """All cell ids within Chebyshev distance ``k`` (incl. center).

    Wraps on the lon axis; clips on the lat axis.  Scalar center — the
    k-ring is used for small broadcast side tables (query points), never
    per data row.
    """
    res, cx, cy = (int(x) for x in geocell_components(np.int64(cell_id)))
    nx = 1 << (res + 6)
    ny = 1 << (res + 5)
    dxs, dys = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1), indexing="ij")
    dxs = dxs.ravel()
    dys = dys.ravel()
    ncx = (cx + dxs) % nx
    ncy = cy + dys
    valid = (ncy >= 0) & (ncy < ny)
    ncx = ncx[valid].astype(np.int64)
    ncy = ncy[valid].astype(np.int64)
    out = (np.int64(res) << 40) | (ncx << 20) | ncy
    return np.unique(out)


def tile_xy(lat_e6, lon_e6, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    n = np.int64(1) << zoom
    tx = (_as_i64(lon_e6) - LON_MIN_E6) * n // LON_SPAN_E6
    ty = (np.int64(90_000_000) - _as_i64(lat_e6)) * n // LAT_SPAN_E6
    return np.clip(tx, 0, n - 1), np.clip(ty, 0, n - 1)


def tile_id(lat_e6, lon_e6, zoom: int) -> np.ndarray:
    tx, ty = tile_xy(lat_e6, lon_e6, zoom)
    return (np.int64(zoom) << 48) | (tx << 24) | ty


def haversine_m(lat1_e6, lon1_e6, lat2_e6, lon2_e6) -> np.ndarray:
    """Great-circle distance in meters (float64; for ranking/top-k only —
    never for cell/tile assignment, which stays integer)."""
    lat1 = np.asarray(lat1_e6, dtype=np.float64) * (np.pi / 180e6)
    lon1 = np.asarray(lon1_e6, dtype=np.float64) * (np.pi / 180e6)
    lat2 = np.asarray(lat2_e6, dtype=np.float64) * (np.pi / 180e6)
    lon2 = np.asarray(lon2_e6, dtype=np.float64) * (np.pi / 180e6)
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


# --- SQL mirrors -----------------------------------------------------------
# These emit DuckDB SQL expressions that are arithmetically identical to the
# numpy kernels above (used by __ray_entry__.oracle_sql).

def sql_geocell_id(lat_col: str, lon_col: str, res: int) -> str:
    nx = 1 << (res + 6)
    ny = 1 << (res + 5)
    cx = (
        f"least(greatest((({lon_col}) - ({LON_MIN_E6})) * {nx} // {LON_SPAN_E6}, 0), {nx - 1})"
    )
    cy = (
        f"least(greatest((({lat_col}) - ({LAT_MIN_E6})) * {ny} // {LAT_SPAN_E6}, 0), {ny - 1})"
    )
    return f"({res} * {1 << 40} + ({cx}) * {1 << 20} + ({cy}))"


def sql_tile_id(lat_col: str, lon_col: str, zoom: int) -> str:
    n = 1 << zoom
    tx = f"least(greatest((({lon_col}) - ({LON_MIN_E6})) * {n} // {LON_SPAN_E6}, 0), {n - 1})"
    ty = f"least(greatest((90000000 - ({lat_col})) * {n} // {LAT_SPAN_E6}, 0), {n - 1})"
    return f"({zoom} * {1 << 48} + ({tx}) * {1 << 24} + ({ty}))"


def sql_haversine_m(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB haversine over microdegree int columns (float64 output)."""
    c = "(pi() / 180000000.0)"
    return (
        f"(2.0 * {EARTH_RADIUS_M} * asin(sqrt("
        f"pow(sin((({lat2}) - ({lat1})) * {c} / 2.0), 2) + "
        f"cos(({lat1}) * {c}) * cos(({lat2}) * {c}) * "
        f"pow(sin((({lon2}) - ({lon1})) * {c} / 2.0), 2))))"
    )
