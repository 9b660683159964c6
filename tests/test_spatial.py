import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cov_tiles_ray.functions import spatial as S


class TestMercatorTiles:
    def test_known_tiles(self):
        # lon=0, lat=0 is the center: tile (2^(z-1), 2^(z-1))
        for z in (1, 4, 10):
            tx, ty = S.lonlat_to_tile(np.array([0.0]), np.array([0.0]), z)
            assert tx[0] == 2 ** (z - 1) and ty[0] == 2 ** (z - 1)

    def test_corners_clipped(self):
        tx, ty = S.lonlat_to_tile(np.array([-180.0, 180.0]), np.array([89.0, -89.0]), 3)
        assert tx[0] == 0 and tx[1] == 7
        assert ty[0] == 0 and ty[1] == 7

    def test_pack_unpack(self):
        z = np.array([0, 7, 14], dtype=np.int64)
        x = np.array([0, 100, 16000], dtype=np.int64)
        y = np.array([0, 5, 12345], dtype=np.int64)
        uz, ux, uy = S.unpack_tile_id(S.pack_tile_id(z, x, y))
        np.testing.assert_array_equal(uz, z)
        np.testing.assert_array_equal(ux, x)
        np.testing.assert_array_equal(uy, y)

    def test_local_coords_in_range(self):
        rng = np.random.default_rng(1)
        lon = rng.uniform(-179, 179, 500)
        lat = rng.uniform(-80, 80, 500)
        tx, ty, lx, ly = S.tile_local_coords(lon, lat, 10)
        assert lx.min() >= 0 and lx.max() < 4096
        assert ly.min() >= 0 and ly.max() < 4096


class TestHexGrid:
    @given(st.lists(st.tuples(st.floats(-179, 179), st.floats(-80, 80)), min_size=1, max_size=50))
    @settings(max_examples=30, deadline=None)
    def test_cell_contains_its_point(self, pts):
        # a point's cell center is nearer than ~1 cell size
        lon = np.array([p[0] for p in pts])
        lat = np.array([p[1] for p in pts])
        for res in (2, 6):
            cell = S.lonlat_to_hex(lon, lat, res)
            mx, my = S.mercator_xy(lon, lat)
            cx, cy = S.hex_center_xy(cell)
            dist = np.hypot(mx - cx, my - cy)
            assert (dist <= S.hex_cell_size(res) * 1.0001).all()

    def test_k_ring_counts(self):
        cell = S.lonlat_to_hex(np.array([10.0]), np.array([50.0]), 5)
        for k in (0, 1, 2, 3):
            ring = S.k_ring(cell, k)
            assert ring.shape == (1, 1 + 3 * k * (k + 1))
            # all within hex distance k of the center
            d = S.hex_distance(np.repeat(cell, ring.shape[1]), ring[0])
            assert d.max() <= k
        assert (S.k_ring(cell, 1)[:, :] == cell[0]).sum() == 1  # contains itself

    def test_neighbors_are_distance_one(self):
        cell = S.lonlat_to_hex(np.array([0.0]), np.array([0.0]), 4)
        ring1 = S.k_ring(cell, 1)[0]
        d = S.hex_distance(np.repeat(cell, 7), ring1)
        assert sorted(d.tolist()) == [0, 1, 1, 1, 1, 1, 1]

    def test_parent_consistency(self):
        rng = np.random.default_rng(3)
        lon = rng.uniform(-170, 170, 200)
        lat = rng.uniform(-75, 75, 200)
        child = S.lonlat_to_hex(lon, lat, 8)
        parent = S.hex_parent(child, 7)
        res, _, _ = S.unpack_hex_id(parent)
        assert (res == 7).all()
        # parent center should be within one parent cell size of child center
        cx, cy = S.hex_center_xy(child)
        px, py = S.hex_center_xy(parent)
        assert (np.hypot(cx - px, cy - py) <= S.hex_cell_size(7) * 1.0001).all()

    def test_resolutions_nest_in_size(self):
        assert S.hex_cell_size(5) == pytest.approx(S.hex_cell_size(4) / S.SQRT7)


class TestPointInPolygon:
    def test_square(self):
        ring_x = np.array([0.0, 10.0, 10.0, 0.0])
        ring_y = np.array([0.0, 0.0, 10.0, 10.0])
        px = np.array([5.0, 15.0, -1.0, 9.999])
        py = np.array([5.0, 5.0, 5.0, 0.001])
        got = S.points_in_rings(px, py, ring_x, ring_y, np.array([4]))
        np.testing.assert_array_equal(got, [True, False, False, True])

    def test_hole(self):
        # outer 0..10 square, hole 4..6 square
        ring_x = np.array([0.0, 10, 10, 0, 4, 6, 6, 4])
        ring_y = np.array([0.0, 0, 10, 10, 4, 4, 6, 6])
        offs = np.array([4, 4])
        px = np.array([5.0, 2.0, 6.5])
        py = np.array([5.0, 2.0, 6.5])
        got = S.points_in_rings(px, py, ring_x, ring_y, offs)
        np.testing.assert_array_equal(got, [False, True, True])

    def test_concave(self):
        # C-shape: notch on the right
        ring_x = np.array([0.0, 10, 10, 4, 4, 10, 10, 0])
        ring_y = np.array([0.0, 0, 3, 3, 7, 7, 10, 10])
        px = np.array([7.0, 2.0, 7.0])
        py = np.array([5.0, 5.0, 1.0])
        got = S.points_in_rings(px, py, ring_x, ring_y, np.array([8]))
        np.testing.assert_array_equal(got, [False, True, True])

    def test_matches_halfplane_counting(self):
        # property: for convex polygon, ray-cast == all-halfplane test
        rng = np.random.default_rng(5)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 8))
        ring_x = 5 + 3 * np.cos(ang)
        ring_y = 5 + 3 * np.sin(ang)
        px = rng.uniform(0, 10, 500)
        py = rng.uniform(0, 10, 500)
        got = S.points_in_rings(px, py, ring_x, ring_y, np.array([8]))
        x2, y2 = np.roll(ring_x, -1), np.roll(ring_y, -1)
        cross = (x2 - ring_x)[:, None] * (py[None] - ring_y[:, None]) - (y2 - ring_y)[:, None] * (
            px[None] - ring_x[:, None]
        )
        want = (cross > 0).all(axis=0) | (cross < 0).all(axis=0)
        # exclude points extremely close to the boundary from the comparison
        near = np.abs(cross).min(axis=0) < 1e-9
        np.testing.assert_array_equal(got[~near], want[~near])


class TestHaversine:
    def test_equator_degree(self):
        d = S.haversine_km(np.array([0.0]), np.array([0.0]), np.array([1.0]), np.array([0.0]))
        assert d[0] == pytest.approx(111.19, abs=0.1)
