"""Conformance tests for the genuine S2 + hex cell implementations."""

import numpy as np
import pytest

from jimmy_ray.geo import hexcell, s2


def _rand_latlng(n=2000, seed=9):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-89.9, 89.9, n), rng.uniform(-179.9, 179.9, n))


# --- S2 --------------------------------------------------------------------

def test_s2_face_cells_structural():
    # face cells at level 0 are the documented constants: tokens 1,3,5,7,9,b
    for face, tok in enumerate(["1", "3", "5", "7", "9", "b"]):
        cell = (face << s2.POS_BITS) | (1 << (s2.POS_BITS - 1))
        assert s2.token(cell) == tok
        assert int(s2.face_of(np.uint64(cell))) == face
        assert int(s2.level_of(np.uint64(cell))) == 0


def test_s2_vectorized_matches_scalar():
    lat, lng = _rand_latlng(500)
    vec = s2.latlng_to_cell_id(lat, lng)
    for i in range(500):
        assert int(vec[i]) == s2.latlng_to_cell_id_scalar(lat[i], lng[i])


def test_s2_level_and_parent():
    lat, lng = _rand_latlng(300)
    leaf = s2.latlng_to_cell_id(lat, lng)
    assert (s2.level_of(leaf) == 30).all()
    for level in (0, 5, 12, 20, 29):
        p = s2.parent(leaf, level)
        assert (s2.level_of(p) == level).all()
        # parent containment: parent of parent at finer level equals coarser
        assert (s2.parent(s2.parent(leaf, level + 1), level) == p).all()
        assert (s2.face_of(p) == s2.face_of(leaf)).all()


def test_s2_face_assignment():
    cases = [
        ((0.0, 0.0), 0),       # +x
        ((0.0, 90.0), 1),      # +y
        ((89.9, 0.0), 2),      # +z
        ((0.0, 180.0), 3),     # -x
        ((0.0, -90.0), 4),     # -y
        ((-89.9, 0.0), 5),     # -z
    ]
    for (lat, lng), face in cases:
        cell = s2.latlng_to_cell_id(np.array([lat]), np.array([lng]))
        assert int(s2.face_of(cell)[0]) == face


def test_s2_locality():
    # nearby points share a coarse parent; antipodal points do not
    a = s2.latlng_to_cell_id(np.array([51.5000]), np.array([-0.1200]))
    b = s2.latlng_to_cell_id(np.array([51.5001]), np.array([-0.1201]))
    far = s2.latlng_to_cell_id(np.array([-51.5]), np.array([179.0]))
    assert int(s2.parent(a, 10)[0]) == int(s2.parent(b, 10)[0])
    assert int(s2.parent(a, 2)[0]) != int(s2.parent(far, 2)[0])


def test_s2_token_roundtrip_zeros():
    assert s2.token(0x1000000000000000) == "1"
    assert s2.token(0x100000000000001F) == "100000000000001f"


# --- hex cells -------------------------------------------------------------

def test_hex_vectorized_matches_scalar():
    lat, lng = _rand_latlng(500, seed=3)
    for res in hexcell.HEX_RESOLUTIONS:
        vec = hexcell.hexcell_id(lat, lng, res)
        for i in range(0, 500, 7):
            assert int(vec[i]) == hexcell.hexcell_id_scalar(lat[i], lng[i], res)


def test_hex_center_within_size():
    lat, lng = _rand_latlng(300, seed=5)
    for res in hexcell.HEX_RESOLUTIONS:
        ids = hexcell.hexcell_id(lat, lng, res)
        clat, clon = hexcell.hexcell_center(ids)
        # every point is within one hex size of its cell center
        assert (np.abs(clat - lat) <= 2 * hexcell.hex_size(res)).all()
        assert (np.abs(clon - lng) <= 2 * hexcell.hex_size(res)).all()


def test_hex_kring_counts_and_distance():
    cell = int(hexcell.hexcell_id(np.array([37.77]), np.array([-122.42]), 7)[0])
    for k in (0, 1, 2, 3):
        ring = hexcell.k_ring(cell, k)
        assert len(ring) == 1 + 3 * k * (k + 1)
        assert all(hexcell.hex_distance(cell, int(c)) <= k for c in ring)
    # ring-k contains exactly the cells at each distance
    ring2 = set(int(c) for c in hexcell.k_ring(cell, 2))
    ring1 = set(int(c) for c in hexcell.k_ring(cell, 1))
    boundary = ring2 - ring1
    assert len(boundary) == 12  # 6*k cells at exactly distance k=2
    assert all(hexcell.hex_distance(cell, c) == 2 for c in boundary)


def test_hex_neighbors_are_adjacent_cells():
    # points straddling a cell boundary land in hex-distance <= 1 cells
    lat = np.array([10.0, 10.0 + 1e-9])
    lng = np.array([20.0, 20.0 + 1e-9])
    ids = hexcell.hexcell_id(lat, lng, 9)
    assert hexcell.hex_distance(int(ids[0]), int(ids[1])) <= 1


def test_hex_resolution_nesting_scale():
    # aperture-7 ratio: res r+1 size = size(r)/sqrt(7)
    assert hexcell.hex_size(8) == pytest.approx(hexcell.hex_size(7) / np.sqrt(7))
    assert hexcell.hex_size(9) == pytest.approx(hexcell.hex_size(7) / 7.0)
