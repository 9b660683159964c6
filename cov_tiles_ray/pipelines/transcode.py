"""MVT -> COVT transcode pipeline (the reference's primary entry point,
SURVEY.md §3.1-3.2: read MVT corpus -> decode -> COVT encode -> round-trip
verify against the MVT decode).

    build_mvt_tiles:  images -> assign -> groupby(hash part) -> MVT bytes
    mvt_to_covt:      (tile_id, mvt) -> decode -> encode COVT -> decode ->
                      full LayerData equality vs the MVT decode (the
                      CovtParserTest.compareTiles oracle, :62-91) + sizes

Both stages are stateless pyarrow ``map_batches``; transcode parallelism is
per-tile (embarrassingly parallel — no shuffle at all when the input is
already tiled, matching §2.9 'tiles are independent')."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..sources import mvt as mvt_codec
from ..stages.assign import assign_tiles
from ..stages.tile_encode import MultiTileEncoder, MvtTileEncoder
from ..tile import EncodeOptions, decode_tile, encode_tile


def build_mvt_tiles(images: rd.Dataset, z: int = 6, extent: int = 4096) -> rd.Dataset:
    """images Dataset (light columns) -> Dataset of (tile_id, z, x, y,
    n_features, mvt bytes)."""
    ds = images.map_batches(
        lambda b: assign_tiles(b, z=z, extent=extent), batch_format="pyarrow", zero_copy_batch=True
    )
    ds = ds.select_columns(["tile_id", "image_id", "loc_x", "loc_y", "caption", "fmt", "phash"])

    # Fixed partition count (data-layout-derived, NOT cluster-CPU-derived):
    # CPU-derived fan-out makes the block structure depend on cluster size,
    # which breaks scaling-efficiency comparisons (same rule as
    # tiling.N_PART).
    n_part = 256

    def add_keys(b: pa.Table) -> pa.Table:
        tid = b["tile_id"].to_numpy(zero_copy_only=False)
        h = (tid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        b = b.append_column("part", pa.array((h % np.uint64(n_part)).astype(np.int64)))
        return b.append_column("salt", pa.array(np.zeros(len(tid), dtype=np.int64)))

    ds = ds.map_batches(add_keys, batch_format="pyarrow", zero_copy_batch=True)
    encoder = MultiTileEncoder(inner=MvtTileEncoder(EncodeOptions(), extent))

    def encode_part(g):
        g = {k: v for k, v in g.items() if k != "part"}
        return encoder(g)

    return ds.groupby("part").map_groups(encode_part, batch_format="numpy")


class TranscodeKernel:
    """Per-batch MVT->COVT transcoder (stateless; construction is trivial so
    it ships as a plain callable rather than an actor pool)."""

    def __init__(self, opts: EncodeOptions | None = None):
        self.opts = opts or EncodeOptions()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        covt_bytes = np.zeros(n, dtype=np.int64)
        mvt_bytes = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            raw = batch["mvt"][i].as_py()
            mvt_bytes[i] = len(raw)
            try:
                layers = mvt_codec.decode_mvt_tile(raw)
                covt = encode_tile(layers, self.opts)
                covt_bytes[i] = len(covt)
                back = decode_tile(covt)
                ok[i] = len(back) == len(layers) and all(
                    a == b for a, b in zip(back, layers)
                )
            except Exception:
                ok[i] = False
        return pa.table(
            {
                "tile_id": batch["tile_id"],
                "z": batch["z"],
                "n_features": batch["n_features"],
                "mvt_bytes": pa.array(mvt_bytes),
                "covt_bytes": pa.array(covt_bytes),
                "transcode_ok": pa.array(ok),
            }
        )


def mvt_to_covt(mvt_tiles: rd.Dataset, opts: EncodeOptions | None = None) -> rd.Dataset:
    return mvt_tiles.map_batches(TranscodeKernel(opts), batch_format="pyarrow", batch_size=256)


class FixtureTranscodeKernel:
    """MVT-file -> COVT transcode + full LayerData-equality round-trip for
    real-world fixture tiles (the reference's own converter test loop,
    CovtConverterTest.java:156-276).  Input: (path, z, x, y, mvt) from
    ``sources.mvt_files.read_mvt_dir``."""

    def __init__(self, opts: EncodeOptions | None = None):
        self.opts = opts or EncodeOptions()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mvt_b = np.zeros(n, dtype=np.int64)
        covt_b = np.zeros(n, dtype=np.int64)
        feats = np.zeros(n, dtype=np.int64)
        nlayers = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            raw = batch["mvt"][i].as_py()
            mvt_b[i] = len(raw)
            try:
                layers = mvt_codec.decode_mvt_tile(raw)
                covt = encode_tile(layers, self.opts)
                covt_b[i] = len(covt)
                back = decode_tile(covt)
                nlayers[i] = len(layers)
                feats[i] = sum(ly.num_features for ly in layers)
                ok[i] = len(back) == len(layers) and all(
                    a == b for a, b in zip(back, layers)
                )
            except Exception:
                ok[i] = False
        return pa.table(
            {
                "path": batch["path"],
                "z": batch["z"],
                "n_layers": pa.array(nlayers),
                "n_features": pa.array(feats),
                "mvt_bytes": pa.array(mvt_b),
                "covt_bytes": pa.array(covt_b),
                "roundtrip_ok": pa.array(ok),
            }
        )


def transcode_fixture_dir(path: str | list[str], opts: EncodeOptions | None = None) -> rd.Dataset:
    """Distributed transcode of a real fixture corpus: per-tile parallel
    (batch_size=1 — z14 OMT tiles are ~0.5 MB / seconds of encode CPU each,
    so one tile per task keeps the pool busy with zero skew)."""
    from ..sources.mvt_files import read_mvt_dir

    return read_mvt_dir(path).map_batches(
        FixtureTranscodeKernel(opts), batch_format="pyarrow", batch_size=1
    )
