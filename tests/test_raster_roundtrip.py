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


def test_ppm_decode_roundtrip_and_resize():
    """Real codec tier: synth P6 -> decode -> exact pixels; block-mean
    thumbnail shape + determinism; comment handling per the spec."""
    import numpy as np

    from jimmy_ray.stages import multimodal as mm

    for doc_id in (0, 7, 123):
        img = mm.decode_ppm(mm.synth_ppm(doc_id))
        h, w = 24 + doc_id % 13, 32 + doc_id % 17
        assert img.shape == (h, w, 3)
        r = np.arange(h)[:, None]
        c = np.arange(w)[None, :]
        assert np.array_equal(img[:, :, 0], (doc_id + r + c) % 256)
        assert np.array_equal(img[:, :, 1], (doc_id + 2 * r + c) % 256)
        thumb = mm.resize_block_mean(img, 4, 4)
        assert thumb.shape == (4, 4, 3)
        assert np.array_equal(thumb, mm.resize_block_mean(img, 4, 4))
    # header comments are skipped (Netpbm spec)
    body = mm.synth_ppm(3)
    commented = b"P6\n# a comment\n" + body[3:]
    assert np.array_equal(mm.decode_ppm(commented), mm.decode_ppm(body))


def test_wav_decode_roundtrip():
    import numpy as np

    from jimmy_ray.stages import multimodal as mm

    for doc_id in (0, 7, 100):
        samples, rate = mm.decode_wav(mm.synth_wav(doc_id))
        n = 400 + doc_id % 101
        assert rate == mm.WAV_RATE and len(samples) == n
        i = np.arange(n, dtype=np.int64)
        want = (((doc_id + 1) * (i + 1)) % 20011 - 10005).astype(np.int16)
        assert np.array_equal(samples, want)
    import pytest

    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFFxxxxNOPE")


def test_video_frame_sampling_skips_frames():
    from jimmy_ray.stages import multimodal as mm

    payload = mm.synth_video(2)  # 4 + 2%5 = 6 frames
    frames = mm.sample_frames(payload, stride=3)
    assert len(frames) == 2  # frames 0 and 3
    assert frames[0].shape == (24 + 2 % 13, 32 + 2 % 17, 3)
    assert frames[1].shape == (24 + 5 % 13, 32 + 5 % 17, 3)
