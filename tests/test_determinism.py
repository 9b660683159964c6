"""Cluster-shape determinism: the pyramid must produce byte-identical
tiles regardless of input block structure (the single knob that differs
between cluster sizes/read layouts).  This is what makes the N vs 4N
scaling comparison — and a resumable re-run on a different cluster —
well-defined: the plan comes from a deterministic sample, boundaries are
plan-derived, and every kernel is a pure function of its (complete)
partition."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from cov_tiles_ray.pipelines import tiling


def _tile_map(tiles) -> dict:
    out = {}
    for b in tiles.iter_batches(batch_format="pyarrow"):
        tid = b["tile_id"].to_pylist()
        covt = b["covt"].to_pylist()
        ok = b["roundtrip_ok"].to_pylist()
        for t, c, o in zip(tid, covt, ok):
            assert t not in out, f"duplicate tile {t}"
            out[t] = (bytes(c), o)
    return out


def _read(nblocks: int):
    from cov_tiles_ray.sources import synth

    return rd.read_parquet(
        synth.images_parquet_path(0.001),
        columns=tiling.LIGHT_COLUMNS,
        override_num_blocks=nblocks,
    )


class TestClusterShapeDeterminism:
    def test_pyramid_identical_across_block_structures(self, ray_session):
        a = _tile_map(
            tiling.build_tile_pyramid(_read(3), zooms=(2, 4), with_cells=True)
        )
        b = _tile_map(
            tiling.build_tile_pyramid(_read(11), zooms=(2, 4), with_cells=True)
        )
        assert a.keys() == b.keys()
        diff = [t for t in a if a[t][0] != b[t][0]]
        assert not diff, f"{len(diff)} tiles differ across block structures"
        assert all(ok for _, ok in a.values())

    def test_pyramid_identical_with_forced_refinement(self, ray_session):
        """Same invariant through the fragment-merge path (hot_zooms forces
        base-level refinement so fragments + merge actually run)."""
        a = _tile_map(
            tiling.build_tile_pyramid(
                _read(2), zooms=(2, 4), hot_zooms=(2,), with_cells=True
            )
        )
        b = _tile_map(
            tiling.build_tile_pyramid(
                _read(9), zooms=(2, 4), hot_zooms=(2,), with_cells=True
            )
        )
        assert a.keys() == b.keys()
        diff = [t for t in a if a[t][0] != b[t][0]]
        assert not diff, f"{len(diff)} tiles differ across block structures"
