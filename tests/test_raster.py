"""Raster <-> vector bridge kernels: scanline fill, polygonize round-trip,
component labeling.  (North-rule extension; per-tile pure kernels.)"""

import numpy as np
import pytest

from cov_tiles_ray.functions import raster as R


def test_rasterize_rectangle_exact():
    # axis-aligned rect [2,7) x [3,6) on corner grid -> pixels 2..6 x 3..5
    mask = R.rasterize_rings(
        np.array([2.0, 7.0, 7.0, 2.0]),
        np.array([3.0, 3.0, 6.0, 6.0]),
        np.array([4]),
        10,
        10,
    )
    want = np.zeros((10, 10), dtype=bool)
    want[3:6, 2:7] = True
    assert np.array_equal(mask, want)


def test_rasterize_triangle_parity():
    tri = R.rasterize_rings(
        np.array([1.0, 9.0, 1.0]), np.array([1.0, 9.0, 9.0]), np.array([3]), 10, 10
    )
    # pixel center (x+0.5, y+0.5) inside iff x+0.5 < y+0.5 (left of diagonal)
    ys, xs = np.nonzero(tri)
    assert tri.sum() > 0
    assert (xs <= ys).all()
    assert (ys >= 1).all() and (ys <= 8).all() and (xs >= 1).all()


def test_rasterize_ring_with_hole_even_odd():
    # outer 1..9, hole 3..6: even-odd cancels the hole
    rx = np.array([1.0, 9.0, 9.0, 1.0, 3.0, 6.0, 6.0, 3.0])
    ry = np.array([1.0, 1.0, 9.0, 9.0, 3.0, 3.0, 6.0, 6.0])
    mask = R.rasterize_rings(rx, ry, np.array([4, 4]), 10, 10)
    assert mask[2, 2] and not mask[4, 4] and mask[7, 7]


@pytest.mark.parametrize("seed", range(8))
def test_polygonize_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    h = int(rng.integers(4, 50))
    w = int(rng.integers(4, 50))
    mask = rng.random((h, w)) < rng.uniform(0.15, 0.85)
    rings = R.polygonize_mask(mask)
    rx, ry, offs = R.rings_to_arrays(rings)
    back = R.rasterize_rings(rx, ry, offs, w, h)
    assert np.array_equal(back, mask)


def test_polygonize_empty_and_full():
    assert R.polygonize_mask(np.zeros((5, 5), dtype=bool)) == []
    rings = R.polygonize_mask(np.ones((3, 4), dtype=bool))
    assert len(rings) == 1
    rx, ry, offs = R.rings_to_arrays(rings)
    assert np.array_equal(R.rasterize_rings(rx, ry, offs, 4, 3), np.ones((3, 4), dtype=bool))


def test_label_components():
    m = np.array(
        [
            [1, 1, 0, 1],
            [0, 0, 0, 1],
            [1, 0, 1, 1],
        ],
        dtype=bool,
    )
    labels, n = R.label_components(m)
    assert n == 3
    assert labels[0, 0] == labels[0, 1]
    assert labels[0, 3] == labels[1, 3] == labels[2, 3] == labels[2, 2]
    assert labels[2, 0] not in (labels[0, 0], labels[2, 2])
    assert (labels[~m] == 0).all() and (labels[m] > 0).all()


def test_rasterize_points_counts():
    px = np.array([0, 0, 3, 3, 3])
    py = np.array([1, 1, 2, 2, 2])
    r = R.rasterize_points(px, py, 4, 4)
    assert r[1, 0] == 2 and r[2, 3] == 3 and r.sum() == 5


def test_pixel_coords_clip():
    px, py = R.pixel_coords(np.array([-0.1, 0.5, 1.2]), np.array([0.0, 0.999, 2.0]), 8)
    assert px.tolist() == [0, 4, 7]
    assert py.tolist() == [0, 7, 7]
