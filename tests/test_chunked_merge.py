"""Chunked mega-tile merge (flag-gated, VERDICT r2 #1).

A fragmented tile above tiling.CHUNK_MERGE_ROWS encodes as fid-ordered
chunks in parallel Ray tasks, framed with model/format.CHUNKED_TILE_MARKER.
Contract under test:

* the chunked frame decodes to LayerData IDENTICAL to the unchunked encode
  of the same rows (whole-tile cells layer included);
* chunked bytes are deterministic across input block structures;
* the default (flag off) path is untouched — byte-identical tiles
  (covered by tests/test_determinism.py, which runs with the flag off);
* batch_verify verifies chunked frames (scalar fallback).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from cov_tiles_ray.model.format import CHUNKED_TILE_MARKER
from cov_tiles_ray.pipelines import tiling
from cov_tiles_ray.tile import decode_tile


def _read(nblocks: int):
    from cov_tiles_ray.sources import synth

    return rd.read_parquet(
        synth.images_parquet_path(0.001),
        columns=tiling.LIGHT_COLUMNS,
        override_num_blocks=nblocks,
    )


def _tile_map(tiles) -> dict:
    out = {}
    for b in tiles.iter_batches(batch_format="pyarrow"):
        for t, c, o, nf in zip(
            b["tile_id"].to_pylist(),
            b["covt"].to_pylist(),
            b["roundtrip_ok"].to_pylist(),
            b["n_features"].to_pylist(),
        ):
            assert t not in out, f"duplicate tile {t}"
            out[t] = (bytes(c), o, nf)
    return out


def _is_chunked(buf: bytes) -> bool:
    return buf[:1] == bytes([CHUNKED_TILE_MARKER])


@pytest.fixture()
def chunk_flag():
    old = tiling.CHUNK_MERGE_ROWS
    tiling.CHUNK_MERGE_ROWS = 400  # tiny threshold so the sf0.001 corpus chunks
    yield 400
    tiling.CHUNK_MERGE_ROWS = old


class TestChunkedPyramid:
    def test_chunked_decodes_to_identical_layers(self, ray_session, chunk_flag):
        """Flag ON vs OFF: same tile set, same decoded LayerData for every
        tile; mega-tiles actually take the chunked frame."""
        on = _tile_map(
            tiling.build_tile_pyramid(
                _read(4), zooms=(2, 4), hot_zooms=(2,), with_cells=True
            )
        )
        tiling.CHUNK_MERGE_ROWS = 0
        off = _tile_map(
            tiling.build_tile_pyramid(
                _read(4), zooms=(2, 4), hot_zooms=(2,), with_cells=True
            )
        )
        assert on.keys() == off.keys()
        assert all(ok for _, ok, _ in on.values())
        n_chunked = 0
        for t in on:
            buf_on, _, nf_on = on[t]
            buf_off, _, nf_off = off[t]
            assert nf_on == nf_off
            if _is_chunked(buf_on):
                n_chunked += 1
                la, lb = decode_tile(buf_on), decode_tile(buf_off)
                assert len(la) == len(lb)
                for a, b in zip(la, lb):
                    assert a == b, f"layer {a.name} of tile {t} differs"
            else:
                assert buf_on == buf_off  # small tiles: untouched path
        # hot_zooms=(2,) forces base-level fragmentation; sf0.001 z2 tiles
        # hold >400 rows, so at least one tile must have chunked
        assert n_chunked >= 1

    def test_chunked_bytes_deterministic_across_block_structures(
        self, ray_session, chunk_flag
    ):
        a = _tile_map(
            tiling.build_tile_pyramid(
                _read(3), zooms=(2, 4), hot_zooms=(2,), with_cells=True
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
        assert any(_is_chunked(buf) for buf, _, _ in a.values())


class TestChunkedFrameKernels:
    def _chunked_and_whole(self, ray_session):
        """Encode one synthetic tile both ways via the real remote tasks."""
        import ray

        from cov_tiles_ray.stages.frag_channel import schedule_chunked_tile
        from cov_tiles_ray.stages.tile_encode import (
            RawFragmentMerger,
            fragment_ipc_bytes,
        )
        from cov_tiles_ray.tile import EncodeOptions

        rng = np.random.default_rng(3)
        n = 2000
        t = pa.table(
            {
                "fid": pa.array(rng.permutation(n).astype(np.int64)),
                "loc_x": pa.array(rng.integers(0, 4096, n).astype(np.int64)),
                "loc_y": pa.array(rng.integers(0, 4096, n).astype(np.int64)),
                "caption": pa.array([f"cap {i % 17}" for i in range(n)]),
                "fmt": pa.array(["png", "raw"] * (n // 2)),
                "phash": pa.array(rng.integers(0, 2**40, n).astype(np.int64)),
            }
        )
        blobs = [
            fragment_ipc_bytes(t.slice(0, 700)),
            fragment_ipc_bytes(t.slice(700, 800)),
            fragment_ipc_bytes(t.slice(1500, 500)),
        ]
        tid = (4 << 58) | (3 << 29) | 5
        merger = RawFragmentMerger(EncodeOptions(), 4096, with_cells=True)
        refs = [ray.put(b) for b in blobs]
        chunk_rows = 512
        n_chunks = -(-n // chunk_rows)
        schema = pa.schema(
            [
                ("tile_id", pa.int64()), ("z", pa.int32()), ("x", pa.int32()),
                ("y", pa.int32()), ("salt", pa.int64()), ("n_features", pa.int64()),
                ("n_layers", pa.int32()), ("covt", pa.binary()),
                ("covt_bytes", pa.int64()), ("plain_bytes", pa.int64()),
                ("roundtrip_ok", pa.bool_()),
            ]
        )
        assert n_chunks >= 2
        out = ray.get(schedule_chunked_tile(merger, tid, refs, n, chunk_rows, schema))
        whole = merger._merge_one(tid, blobs)
        return out, whole, n

    def test_chunk_tasks_equal_whole_merge(self, ray_session):
        out, whole, n = self._chunked_and_whole(ray_session)
        assert out.num_rows == 1
        assert out["n_features"][0].as_py() == n == whole["n_features"]
        assert out["roundtrip_ok"][0].as_py()
        buf = bytes(out["covt"][0].as_py())
        assert _is_chunked(buf) and not _is_chunked(whole["covt"])
        la, lb = decode_tile(buf), decode_tile(whole["covt"])
        assert len(la) == len(lb) == 2  # points + whole-tile cells
        for a, b in zip(la, lb):
            assert a == b, f"layer {a.name} differs between chunked and whole"

    def test_batch_verify_handles_chunked_frames(self, ray_session):
        from cov_tiles_ray.tile.batch_verify import verify_tiles

        out, whole, n = self._chunked_and_whole(ray_session)
        buf = bytes(out["covt"][0].as_py())
        oks = verify_tiles([buf, whole["covt"]], [n, n], [2, 2])
        assert oks.all()
        # a truncated chunk frame must be flagged bad
        assert not verify_tiles([buf[:-1]], [n], [2])[0]
        # and a wrong expected layer count too
        assert not verify_tiles([buf], [n], [1])[0]

    def test_scan_tile_streams_walks_chunks(self, ray_session):
        from cov_tiles_ray.model.format import StreamType
        from cov_tiles_ray.tile.decode import scan_tile_streams

        out, whole, n = self._chunked_and_whole(ray_session)
        rows = scan_tile_streams(bytes(out["covt"][0].as_py()))
        assert {r[0] for r in rows} == {"images", "cells"}
        # vertex-buffer values across point chunks cover all n points
        vb_vals = sum(
            r[4]
            for r in rows
            if r[0] == "images" and r[2] == int(StreamType.VERTEX_BUFFER)
        )
        assert vb_vals >= 2 * n  # interleaved x,y
