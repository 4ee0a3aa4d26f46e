"""Raster ↔ vector tile round trip + grid integrity."""

import numpy as np

from jimmy_ray.pipelines import flagship
from jimmy_ray.stages import spatial as sp

SF = "/root/testdata/sf0.001"


def test_raster_vector_roundtrip(ray_session):
    points = flagship.geo_points(SF)
    raster = sp.rasterize_tiles(points).materialize()
    vector = sp.raster_to_vector(raster).to_pandas()
    exploded = sp.raster_tiles_exploded(flagship.geo_points(SF)).to_pandas()

    a = vector.sort_values(["tile_z10", "subcell"]).reset_index(drop=True)
    b = exploded.sort_values(["tile_z10", "subcell"]).reset_index(drop=True)
    assert a.equals(b[a.columns])

    # grid integrity: per-tile sums match the vector tile counts
    grids = raster.to_pandas()
    tile_counts = flagship.tile_counts(SF).to_pandas().set_index("tile_z10")
    for _, row in grids.iterrows():
        assert int(np.sum(row["grid"])) == row["n_points"]
        assert row["n_points"] == int(tile_counts.loc[row["tile_id"], "n_pages"])
    # total conservation
    assert grids["n_points"].sum() == points.count()


def test_subcell_range():
    rng = np.random.default_rng(8)
    lat = rng.integers(-90_000_000, 90_000_001, 5000)
    lon = rng.integers(-180_000_000, 180_000_000, 5000)
    sub = sp.raster_subcell(lat, lon)
    assert (sub >= 0).all() and (sub < sp.RASTER_N ** 2).all()
