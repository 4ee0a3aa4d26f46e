"""Geo core: exact integer cells/tiles/PIP vs scalar references and SQL."""

import duckdb
import numpy as np
import pytest

from jimmy_ray.geo import core, polygon as poly_mod


def _rand_points(n=5000, seed=7):
    rng = np.random.default_rng(seed)
    lat = rng.integers(-90_000_000, 90_000_001, n, dtype=np.int64)
    lon = rng.integers(-180_000_000, 180_000_000, n, dtype=np.int64)
    return lat, lon


def test_geocell_parent_nesting():
    lat, lon = _rand_points()
    c9 = core.geocell_id(lat, lon, 9)
    c8 = core.geocell_id(lat, lon, 8)
    c7 = core.geocell_id(lat, lon, 7)
    assert (core.geocell_parent(c9) == c8).all()
    assert (core.geocell_parent(c8) == c7).all()


def test_geocell_ranges():
    lat, lon = _rand_points()
    for res in core.GEOCELL_RESOLUTIONS:
        r, cx, cy = core.geocell_components(core.geocell_id(lat, lon, res))
        assert (r == res).all()
        assert (cx >= 0).all() and (cx < (1 << (res + 6))).all()
        assert (cy >= 0).all() and (cy < (1 << (res + 5))).all()


def test_geocell_sql_mirror():
    lat, lon = _rand_points(2000)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lat_e6": lat, "lon_e6": lon}))
    for res in core.GEOCELL_RESOLUTIONS:
        expr = core.sql_geocell_id("lat_e6", "lon_e6", res)
        got = con.execute(f"SELECT {expr} FROM pts").fetchnumpy()
        sql_vals = next(iter(got.values()))
        np.testing.assert_array_equal(sql_vals, core.geocell_id(lat, lon, res))
    for zoom in core.TILE_ZOOMS:
        expr = core.sql_tile_id("lat_e6", "lon_e6", zoom)
        got = con.execute(f"SELECT {expr} FROM pts").fetchnumpy()
        sql_vals = next(iter(got.values()))
        np.testing.assert_array_equal(sql_vals, core.tile_id(lat, lon, zoom))


def test_k_ring_counts():
    cell = int(core.geocell_id(np.int64(37_774_900), np.int64(-122_419_400), 7))
    ring0 = core.geocell_k_ring(cell, 0)
    ring1 = core.geocell_k_ring(cell, 1)
    ring2 = core.geocell_k_ring(cell, 2)
    assert len(ring0) == 1 and ring0[0] == cell
    assert len(ring1) == 9
    assert len(ring2) == 25
    assert set(ring0) <= set(ring1) <= set(ring2)


def test_haversine_known_distance():
    # SF -> NYC ≈ 4130 km
    d = core.haversine_m(37_774_900, -122_419_400, 40_712_800, -74_006_000)
    assert 4.1e6 < float(d) < 4.2e6
    assert float(core.haversine_m(0, 0, 0, 0)) == 0.0


def test_pip_vectorized_matches_scalar():
    lat, lon = _rand_points(3000, seed=11)
    for p in poly_mod.fixture_polygons():
        # focus points near the polygon bbox so hits actually occur
        min_x, min_y, max_x, max_y = poly_mod.polygon_bbox(p["verts"])
        span_x, span_y = max_x - min_x, max_y - min_y
        px = min_x - span_x + (lon - core.LON_MIN_E6) % (3 * span_x + 1)
        py = min_y - span_y + (lat - core.LAT_MIN_E6) % (3 * span_y + 1)
        vec = poly_mod.point_in_polygon(px, py, p["verts"])
        scalar = np.array(
            [poly_mod.point_in_polygon_scalar(int(x), int(y), p["verts"])
             for x, y in zip(px, py)]
        )
        np.testing.assert_array_equal(vec, scalar)


def test_pip_concave_differs_from_bbox():
    p = next(p for p in poly_mod.fixture_polygons() if p["name"].startswith("concave"))
    min_x, min_y, max_x, max_y = poly_mod.polygon_bbox(p["verts"])
    # center of the bbox of an L-shape lies in the notch -> outside
    cx, cy = (min_x + max_x) // 2, (min_y + max_y) // 2
    in_bbox = min_x <= cx <= max_x and min_y <= cy <= max_y
    assert in_bbox
    rng = np.random.default_rng(3)
    px = rng.integers(min_x, max_x + 1, 2000, dtype=np.int64)
    py = rng.integers(min_y, max_y + 1, 2000, dtype=np.int64)
    inside = poly_mod.point_in_polygon(px, py, p["verts"])
    assert 0 < inside.sum() < len(inside)  # strictly smaller than bbox cover


def test_pip_sql_mirror():
    import pandas as pd

    rng = np.random.default_rng(5)
    p = poly_mod.fixture_polygons()[0]
    min_x, min_y, max_x, max_y = poly_mod.polygon_bbox(p["verts"])
    px = rng.integers(min_x - 50_000, max_x + 50_000, 2000, dtype=np.int64)
    py = rng.integers(min_y - 50_000, max_y + 50_000, 2000, dtype=np.int64)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"i": np.arange(2000), "lon_e6": px, "lat_e6": py}))
    sql = (
        f"WITH edges(polygon_id, x1, y1, x2, y2) AS (VALUES {poly_mod.sql_polygon_edges()}) "
        f"SELECT pts.i FROM pts, edges WHERE edges.polygon_id = '{p['polygon_id']}' "
        f"GROUP BY pts.i HAVING SUM({poly_mod.sql_pip_crossing('pts.lon_e6', 'pts.lat_e6')}) % 2 = 1 "
        f"ORDER BY pts.i"
    )
    sql_inside = set(r[0] for r in con.execute(sql).fetchall())
    np_inside = set(np.nonzero(poly_mod.point_in_polygon(px, py, p["verts"]))[0].tolist())
    assert sql_inside == np_inside


def test_wkb_roundtrip():
    for p in poly_mod.fixture_polygons():
        wkb = poly_mod.verts_to_wkb(p["verts"])
        assert poly_mod.wkb_to_verts(wkb) == p["verts"]


def test_polygon_cell_cover_contains_inside_points():
    rng = np.random.default_rng(13)
    for p in poly_mod.fixture_polygons():
        cover = set(int(c) for c in poly_mod.polygon_cell_cover(p["verts"], 7))
        min_x, min_y, max_x, max_y = poly_mod.polygon_bbox(p["verts"])
        px = rng.integers(min_x, max_x + 1, 500, dtype=np.int64)
        py = rng.integers(min_y, max_y + 1, 500, dtype=np.int64)
        inside = poly_mod.point_in_polygon(px, py, p["verts"])
        cells = core.geocell_id(py[inside], px[inside], 7)
        assert set(int(c) for c in cells) <= cover
