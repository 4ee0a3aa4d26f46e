"""Polygons, exact integer point-in-polygon, WKB, and the fixture polygon set.

Point-in-polygon is the even-odd (ray-casting) rule evaluated in **pure
int64 arithmetic** over microdegree coordinates: the crossing test

    (y1 > py) != (y2 > py)  and  px  <  x1 + (x2-x1)*(py-y1)/(y2-y1)

is rewritten cross-multiplied so no division happens:

    dy > 0:  (px-x1)*dy < (x2-x1)*(py-y1)
    dy < 0:  (px-x1)*dy > (x2-x1)*(py-y1)

|product| ≤ 3.6e8 * 1.8e8 = 6.5e16 < 2**63, so numpy int64, scalar Python
and DuckDB BIGINT agree bit-for-bit (no float boundary jitter — see
jimmy_ray.geo.core module docstring).  This is the refinement step behind
the cell-cover prune (SURVEY.md §2.4 J8); the reference's analogous
"candidate prune then exact check" pattern is its fuzzy title match,
/root/reference/src/jimmy/common.py:373-400.

Polygon fixture set: deterministic boxes + concave polygons overlapping
the synthetic "urban" clusters (FIXTURES.md §4) — defined once here, and
mirrored verbatim into oracle SQL via :func:`sql_polygon_edges`.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from jimmy_ray.geo import core

# (lat_e6, lon_e6) cluster centers — same constants as data.synth geo hash.
CLUSTERS_E6 = (
    (37_774_900, -122_419_400),  # SF
    (40_712_800, -74_006_000),  # NYC
    (51_507_400, -127_800),  # London
)


def _box(lat_c: int, lon_c: int, half_lat: int, half_lon: int) -> list[tuple[int, int]]:
    """Axis-aligned box as a CCW vertex list [(lon_e6, lat_e6), ...]."""
    return [
        (lon_c - half_lon, lat_c - half_lat),
        (lon_c + half_lon, lat_c - half_lat),
        (lon_c + half_lon, lat_c + half_lat),
        (lon_c - half_lon, lat_c + half_lat),
    ]


def _l_shape(lat_c: int, lon_c: int, a: int) -> list[tuple[int, int]]:
    """Concave L-shaped hexagon around a center; differs from its bbox."""
    return [
        (lon_c - a, lat_c - a),
        (lon_c + a, lat_c - a),
        (lon_c + a, lat_c),
        (lon_c, lat_c),
        (lon_c, lat_c + a),
        (lon_c - a, lat_c + a),
    ]


def _u_shape(lat_c: int, lon_c: int, a: int) -> list[tuple[int, int]]:
    """Concave U shape (notch cut from the top)."""
    return [
        (lon_c - a, lat_c - a),
        (lon_c + a, lat_c - a),
        (lon_c + a, lat_c + a),
        (lon_c + a // 2, lat_c + a),
        (lon_c + a // 2, lat_c - a // 2),
        (lon_c - a // 2, lat_c - a // 2),
        (lon_c - a // 2, lat_c + a),
        (lon_c - a, lat_c + a),
    ]


def fixture_polygons() -> list[dict]:
    """Deterministic polygon set: 9 boxes + 3 concave, ids p00..p11."""
    polys: list[dict] = []
    idx = 0
    for ci, (lat_c, lon_c) in enumerate(CLUSTERS_E6):
        for half_lat, half_lon, dlat, dlon in (
            (60_000, 80_000, 0, 0),
            (30_000, 30_000, 50_000, 50_000),
            (45_000, 20_000, -40_000, 60_000),
        ):
            polys.append(
                {
                    "polygon_id": f"p{idx:02d}",
                    "name": f"box-c{ci}-{idx}",
                    "verts": _box(lat_c + dlat, lon_c + dlon, half_lat, half_lon),
                }
            )
            idx += 1
    for ci, (lat_c, lon_c) in enumerate(CLUSTERS_E6):
        shape = _l_shape if ci % 2 == 0 else _u_shape
        polys.append(
            {
                "polygon_id": f"p{idx:02d}",
                "name": f"concave-c{ci}",
                "verts": shape(lat_c, lon_c, 70_000),
            }
        )
        idx += 1
    return polys


# --- exact PIP kernels -----------------------------------------------------

def point_in_polygon(px, py, verts: list[tuple[int, int]]) -> np.ndarray:
    """Vectorized even-odd test. px/py int64 microdeg arrays; exact."""
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    inside = np.zeros(px.shape, dtype=bool)
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        crosses = (y1 > py) != (y2 > py)
        if not crosses.any():
            continue
        dy = y2 - y1
        lhs = (px - np.int64(x1)) * np.int64(dy)
        rhs = np.int64(x2 - x1) * (py - np.int64(y1))
        hit = lhs > rhs if dy < 0 else lhs < rhs
        inside ^= crosses & hit
    return inside


def point_in_polygon_scalar(px: int, py: int, verts: list[tuple[int, int]]) -> bool:
    """Trusted scalar reference (FIXTURES.md §4 'trusted scalar reference')."""
    inside = False
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            dy = y2 - y1
            lhs = (px - x1) * dy
            rhs = (x2 - x1) * (py - y1)
            if (lhs > rhs) if dy < 0 else (lhs < rhs):
                inside = not inside
    return inside


def polygon_bbox(verts: list[tuple[int, int]]) -> tuple[int, int, int, int]:
    xs = [v[0] for v in verts]
    ys = [v[1] for v in verts]
    return min(xs), min(ys), max(xs), max(ys)


def polygon_cell_cover(verts: list[tuple[int, int]], res: int) -> np.ndarray:
    """Geocell ids at ``res`` intersecting the polygon bbox (candidate
    cover; exact refinement happens per point).  Cells are rectangles, so
    the bbox cover is a superset of the true cover — sound for pruning."""
    min_x, min_y, max_x, max_y = polygon_bbox(verts)
    cx0 = int(core.geocell_cx(np.int64(min_x), res))
    cx1 = int(core.geocell_cx(np.int64(max_x), res))
    cy0 = int(core.geocell_cy(np.int64(min_y), res))
    cy1 = int(core.geocell_cy(np.int64(max_y), res))
    cxs, cys = np.meshgrid(
        np.arange(cx0, cx1 + 1, dtype=np.int64),
        np.arange(cy0, cy1 + 1, dtype=np.int64),
        indexing="ij",
    )
    return ((np.int64(res) << 40) | (cxs.ravel() << 20) | cys.ravel())


# --- WKB (little-endian, 2D Polygon, degrees) ------------------------------

def verts_to_wkb(verts: list[tuple[int, int]]) -> bytes:
    """Serialize as standard WKB Polygon (coords in degrees, closed ring)."""
    ring = list(verts) + [verts[0]]
    out = [struct.pack("<BII", 1, 3, 1), struct.pack("<I", len(ring))]
    for x_e6, y_e6 in ring:
        out.append(struct.pack("<dd", x_e6 / 1e6, y_e6 / 1e6))
    return b"".join(out)


def wkb_to_verts(wkb: bytes) -> list[tuple[int, int]]:
    """Parse the WKB produced by verts_to_wkb back to microdegree verts."""
    byte_order, geom_type, n_rings = struct.unpack_from("<BII", wkb, 0)
    assert byte_order == 1 and geom_type == 3 and n_rings >= 1
    (n_pts,) = struct.unpack_from("<I", wkb, 9)
    verts = []
    off = 13
    for _ in range(n_pts):
        x, y = struct.unpack_from("<dd", wkb, off)
        off += 16
        verts.append((int(round(x * 1e6)), int(round(y * 1e6))))
    return verts[:-1]  # drop closing vertex


def polygons_table() -> pa.Table:
    """Fixture polygons as an Arrow side table (FIXTURES.md §4 schema)."""
    polys = fixture_polygons()
    return pa.table(
        {
            "polygon_id": pa.array([p["polygon_id"] for p in polys], pa.string()),
            "name": pa.array([p["name"] for p in polys], pa.string()),
            "wkb": pa.array([verts_to_wkb(p["verts"]) for p in polys], pa.binary()),
        }
    )


# --- SQL mirror ------------------------------------------------------------

def sql_polygon_edges() -> str:
    """VALUES CTE body of polygon edges (polygon_id, x1, y1, x2, y2)."""
    rows = []
    for p in fixture_polygons():
        verts = p["verts"]
        n = len(verts)
        for i in range(n):
            x1, y1 = verts[i]
            x2, y2 = verts[(i + 1) % n]
            rows.append(f"('{p['polygon_id']}', {x1}, {y1}, {x2}, {y2})")
    return ",\n    ".join(rows)


def sql_pip_crossing(px: str, py: str) -> str:
    """DuckDB crossing-count term per edge row (columns x1,y1,x2,y2);
    identical int64 arithmetic to point_in_polygon above."""
    return (
        f"case when ((y1 > ({py})) != (y2 > ({py}))) and "
        f"(case when y2 > y1 then (({px}) - x1) * (y2 - y1) < (x2 - x1) * (({py}) - y1) "
        f"else (({px}) - x1) * (y2 - y1) > (x2 - x1) * (({py}) - y1) end) "
        f"then 1 else 0 end"
    )
