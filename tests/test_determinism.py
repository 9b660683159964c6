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


class TestDegenerateInputs:
    """The pyramid must not crash or mis-plan on empty / single-row
    corpora (a resumable 100-TB run WILL see empty shards)."""

    def _pyramid(self, df: "pd.DataFrame"):
        import pandas as pd  # noqa: F401

        ds = rd.from_pandas(df) if len(df) else rd.from_arrow(
            pa.table(
                {
                    "image_id": pa.array([], pa.string()),
                    "caption": pa.array([], pa.string()),
                    "fmt": pa.array([], pa.string()),
                    "phash": pa.array([], pa.int64()),
                    "lon": pa.array([], pa.float64()),
                    "lat": pa.array([], pa.float64()),
                }
            )
        )
        return tiling.build_tile_pyramid(ds, zooms=(2, 4), with_cells=True)

    def test_empty_corpus(self, ray_session):
        import pandas as pd

        out = self._pyramid(pd.DataFrame(columns=tiling.LIGHT_COLUMNS))
        assert out.count() == 0

    def test_single_row_corpus(self, ray_session):
        import pandas as pd

        df = pd.DataFrame(
            {
                "image_id": ["img000000000001"],
                "caption": ["one lonely pixel"],
                "fmt": ["ppm"],
                "phash": [12345],
                "lon": [11.5],
                "lat": [48.1],
            }
        )
        tiles = _tile_map(self._pyramid(df))
        # one feature -> exactly one tile per zoom, all round-trip clean
        assert len(tiles) == 2
        assert all(ok for _, ok in tiles.values())


class TestMergeStrategyEquivalence:
    """The side-channel fragment merge (PYRAMID_MERGE='channel') and the
    pure-Dataset sort merge must produce byte-identical tile sets."""

    def test_channel_equals_sort_merge(self, ray_session, monkeypatch):
        kw = dict(zooms=(2, 4), hot_zooms=(2,), with_cells=True)
        monkeypatch.setattr(tiling, "PYRAMID_MERGE", "channel")
        a = _tile_map(tiling.build_tile_pyramid(_read(5), **kw))
        monkeypatch.setattr(tiling, "PYRAMID_MERGE", "sort")
        b = _tile_map(tiling.build_tile_pyramid(_read(5), **kw))
        assert a.keys() == b.keys()
        diff = [t for t in a if a[t] != b[t]]
        assert not diff, f"{len(diff)} tiles differ between merge strategies"
        assert all(ok for _, ok in a.values())

    def test_groupby_exchange_with_channel_merge(self, ray_session, monkeypatch):
        """The kept-for-A/B sampled-groupby exchange must compose with the
        channel merge (per-group part values keep the channel src key
        unique) and match the bounds exchange byte-for-byte."""
        kw = dict(zooms=(2, 4), hot_zooms=(2,), with_cells=True)
        a = _tile_map(tiling.build_tile_pyramid(_read(4), **kw))
        monkeypatch.setattr(tiling, "PYRAMID_EXCHANGE", "groupby")
        b = _tile_map(tiling.build_tile_pyramid(_read(4), **kw))
        assert a.keys() == b.keys()
        diff = [t for t in a if a[t] != b[t]]
        assert not diff, f"{len(diff)} tiles differ between exchanges"
