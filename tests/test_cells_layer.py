"""The derived occupancy-grid polygon layer ("cells") — runs ICE + ring
offsets through the distributed flagship pipeline (VERDICT r1 next-round #7).

Key invariants:
* cells_layer_from_points is a deterministic function of the point SET
  (order-independent) — the fragment merger relies on this to rebuild the
  layer byte-identically after a salted merge;
* a 2-layer tile round-trips with full LayerData equality;
* the pyramid pipeline with with_cells=True has zero round-trip failures
  and every tile decodes to [points, cells].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from cov_tiles_ray.model.format import GeometryType
from cov_tiles_ray.stages.tile_encode import (
    cells_layer_from_points,
    verify_tile_buf,
)
from cov_tiles_ray.tile import EncodeOptions, decode_tile, encode_tile

SF = "/root/testdata/sf0.001"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestCellsLayer:
    def test_deterministic_in_point_set(self, rng):
        xy = rng.integers(0, 4096, 400)
        vb = xy.astype(np.int64)
        perm = rng.permutation(200)
        vb2 = np.empty_like(vb)
        vb2[0::2] = vb[0::2][perm]
        vb2[1::2] = vb[1::2][perm]
        assert cells_layer_from_points(vb) == cells_layer_from_points(vb2)

    def test_counts_and_geometry(self):
        # two points in the same cell, one in another
        vb = np.array([10, 10, 20, 20, 4000, 4000], dtype=np.int64)
        ly = cells_layer_from_points(vb, extent=4096, cell_bits=6)
        assert ly.num_features == 2
        assert (ly.geometry_types == GeometryType.POLYGON).all()
        assert list(ly.properties["n_pts"].values) == [2, 1]
        assert list(ly.ring_offsets) == [4, 4]
        assert list(ly.part_offsets) == [1, 1]
        # first cell square at (0,0)-(64,64)
        assert list(ly.vertex_buffer[:8]) == [0, 0, 64, 0, 64, 64, 0, 64]

    def test_shared_corners_dedupe_under_ice(self, rng):
        # a dense blob of points -> adjacent occupied cells share corners
        vb = rng.integers(0, 1024, 4000).astype(np.int64)
        ly = cells_layer_from_points(vb)
        v = ly.vertex_buffer
        packed = v[0::2] * 100000 + v[1::2]
        assert len(np.unique(packed)) < 0.5 * (len(v) // 2)

    def test_two_layer_tile_roundtrips_fully(self, rng):
        from cov_tiles_ray.stages.tile_encode import group_to_layer

        n = 300
        g = {
            "tile_id": np.zeros(n, dtype=np.int64),
            "fid": np.arange(n, dtype=np.int64),
            "loc_x": rng.integers(0, 4096, n),
            "loc_y": rng.integers(0, 4096, n),
            "caption": np.array([f"c{i}" for i in range(n)], dtype=object),
            "fmt": np.array(["png"] * n, dtype=object),
            "phash": rng.integers(0, 1 << 40, n),
        }
        pts = group_to_layer(g)
        cells = cells_layer_from_points(pts.vertex_buffer)
        buf = encode_tile([pts, cells])
        assert verify_tile_buf(buf, n, expect_layers=[pts, cells], n_layers=2)
        got = decode_tile(buf)
        assert [ly.name for ly in got] == ["images", "cells"]

    def test_explicit_ice_on_cells(self, rng):
        vb = rng.integers(0, 1024, 4000).astype(np.int64)
        cells = cells_layer_from_points(vb)
        auto = encode_tile([cells])
        ice = encode_tile([cells], EncodeOptions(geometry_encoding="ice"))
        assert decode_tile(ice)[0] == cells
        assert decode_tile(auto)[0] == cells


class TestCellsPipeline:
    def test_pyramid_with_cells(self, ray_session):
        from cov_tiles_ray.pipelines import tiling

        images = tiling.read_images(SF, columns=tiling.LIGHT_COLUMNS)
        tiles = tiling.build_tile_pyramid(
            images, zooms=(2, 4), with_cells=True
        ).to_pandas()
        assert (tiles["roundtrip_ok"]).all()
        assert (tiles["n_layers"] == 2).all()
        # spot-decode: every sampled tile yields points + polygon cells
        for buf in tiles["covt"].head(5):
            layers = decode_tile(bytes(buf))
            assert len(layers) == 2
            assert (layers[1].geometry_types == GeometryType.POLYGON).all()
            assert int(layers[1].properties["n_pts"].values.sum()) == layers[0].num_features

    def test_salted_merge_matches_unsalted(self, ray_session):
        """A hot-zoom forced salt then merge must produce byte-identical
        tiles to the unsalted single-group encode, cells layer included."""
        from cov_tiles_ray.pipelines import tiling

        images = tiling.read_images(SF, columns=tiling.LIGHT_COLUMNS)
        salted = (
            tiling.build_tiles(images, z=2, with_cells=True, hot_zooms=(2,))
            .to_pandas()
            .sort_values("tile_id")
            .reset_index(drop=True)
        )
        plain = (
            tiling.build_tiles(images, z=2, with_cells=True, hot_zooms=())
            .to_pandas()
            .sort_values("tile_id")
            .reset_index(drop=True)
        )
        assert salted["roundtrip_ok"].all() and plain["roundtrip_ok"].all()
        pd.testing.assert_frame_equal(
            salted[["tile_id", "n_features", "covt_bytes"]],
            plain[["tile_id", "n_features", "covt_bytes"]],
        )
        assert all(
            bytes(a) == bytes(b) for a, b in zip(salted["covt"], plain["covt"])
        )
