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
                layers = mvt_codec.decode_mvt_tile_best(raw)
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
                layers = mvt_codec.decode_mvt_tile_best(raw)
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


class DirTranscodeWriter:
    """map_batches kernel: decode each MVT tile, encode to the requested
    layout, verify, and write ``{z}_{x}_{y}.covt`` into ``out_dir``.  Each
    task writes only its own tiles (partitioned-sink pattern) and SKIPS
    tiles whose output already exists — a killed run resumes for free.

    Resume safety: a tile is only skipped when its ``.meta`` sidecar
    records the SAME layout and input-MVT sha256 as the current request —
    a stale ``.covt`` from an earlier run with different options (e.g.
    layout='covtr' vs 'ref') or changed input is re-transcoded instead of
    silently passing (ADVICE r2).  The sidecar is written after the atomic
    covt replace, so a kill between the two re-transcodes on resume (safe
    direction).

    ``layout="ref"`` writes the reference's old-layout framing
    (sources/covt_ref_write — readable by the reference's own parsers);
    ``layout="new"`` writes the reference's CURRENT framing
    (sources/covt_new — CovtConverter.convertMvtTile2's layout; plain
    metadata so each file is self-contained, ids dropped per that
    layout's design); ``layout="covtr"`` writes the engine's COVT-R
    framing."""

    def __init__(self, out_dir: str, layout: str = "ref", opts: EncodeOptions | None = None):
        if layout not in ("ref", "covtr", "new"):
            raise ValueError(f"unknown layout {layout!r}")
        self.out_dir = out_dir
        self.layout = layout
        self.opts = opts or EncodeOptions()

    def _meta_matches(self, meta_path: str, mvt_sha: str) -> bool:
        import json
        import os

        if not os.path.exists(meta_path):
            return False
        try:
            with open(meta_path) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            return False
        return meta.get("layout") == self.layout and meta.get("mvt_sha256") == mvt_sha

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        import json
        import os

        from ..sources.covt_ref import parse_ref_covt
        from ..sources.covt_ref_write import encode_ref_tile

        os.makedirs(self.out_dir, exist_ok=True)
        n = batch.num_rows
        covt_b = np.zeros(n, dtype=np.int64)
        mvt_b = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        skipped = np.zeros(n, dtype=bool)
        names = []
        for i in range(n):
            z, x, y = (int(batch[c][i].as_py()) for c in ("z", "x", "y"))
            name = f"{z}_{x}_{y}.covt"
            names.append(name)
            out_path = os.path.join(self.out_dir, name)
            raw = batch["mvt"][i].as_py()
            mvt_b[i] = len(raw)
            mvt_sha = hashlib.sha256(raw).hexdigest()
            meta_path = out_path + ".meta"
            if os.path.exists(out_path) and self._meta_matches(meta_path, mvt_sha):
                skipped[i] = True
                ok[i] = True
                covt_b[i] = os.path.getsize(out_path)
                continue
            try:
                layers = mvt_codec.decode_mvt_tile_best(raw)
                if self.layout == "ref":
                    buf = encode_ref_tile(layers)
                    back = parse_ref_covt(buf)
                    ok[i] = len(back) == len(layers) and all(
                        a == b for a, b in zip(back, layers)
                    )
                elif self.layout == "new":
                    from ..sources.covt_new import (
                        encode_new_tile,
                        parse_new_covt,
                        roundtrip_equal,
                    )

                    buf, _tj = encode_new_tile(layers, optimize_metadata=False)
                    ok[i] = roundtrip_equal(layers, parse_new_covt(buf))
                else:
                    buf = encode_tile(layers, self.opts)
                    back = decode_tile(buf)
                    ok[i] = len(back) == len(layers) and all(
                        a == b for a, b in zip(back, layers)
                    )
                if ok[i]:
                    tmp = out_path + ".part"
                    with open(tmp, "wb") as f:
                        f.write(buf)
                    os.replace(tmp, out_path)  # atomic: no torn files on kill
                    mtmp = meta_path + ".part"
                    with open(mtmp, "w") as f:
                        json.dump({"layout": self.layout, "mvt_sha256": mvt_sha}, f)
                    os.replace(mtmp, meta_path)
                    covt_b[i] = len(buf)
            except Exception:
                ok[i] = False
        return pa.table(
            {
                "tile": pa.array(names),
                "mvt_bytes": pa.array(mvt_b),
                "covt_bytes": pa.array(covt_b),
                "ok": pa.array(ok),
                "skipped": pa.array(skipped),
            }
        )


def transcode_dir_to_covt(
    mvt_dir: str | list[str],
    out_dir: str,
    layout: str = "ref",
    opts: EncodeOptions | None = None,
) -> dict:
    """Distributed MVT-directory -> .covt-directory transcode (the
    reference converter's batch workflow, CovtConverterTest.java:156-276,
    as a resumable Ray pipeline).  Returns a summary dict."""
    from ..sources.mvt_files import read_mvt_dir

    res = read_mvt_dir(mvt_dir).map_batches(
        DirTranscodeWriter(out_dir, layout, opts), batch_format="pyarrow", batch_size=4
    )
    df = res.to_pandas()
    return {
        "tiles": int(len(df)),
        "ok": int(df["ok"].sum()),
        "skipped": int(df["skipped"].sum()),
        "mvt_bytes": int(df["mvt_bytes"].sum()),
        "covt_bytes": int(df["covt_bytes"].sum()),
    }
