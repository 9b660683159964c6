"""Spatial assignment stages — stateless, zero-copy Arrow ``map_batches``.

Each function is `pa.Table -> pa.Table`; vectorized numpy kernels from
``functions.spatial`` under the hood.  These are the engine's analogue of
the reference's implicit "input is already tiled" assumption (S1-S5 read
pre-tiled MVT; we assign records to tiles ourselves — SURVEY.md §7.2.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import spatial as S


def assign_tiles(batch: pa.Table, z: int, extent: int = 4096, lon_col="lon", lat_col="lat") -> pa.Table:
    """Add tile_z/tile_x/tile_y/tile_id + tile-local integer coords."""
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    tx, ty, lx, ly = S.tile_local_coords(lon, lat, z, extent)
    tid = S.pack_tile_id(z, tx, ty)
    return (
        batch.append_column("tile_z", pa.array(np.full(len(tx), z, dtype=np.int32)))
        .append_column("tile_x", pa.array(tx))
        .append_column("tile_y", pa.array(ty))
        .append_column("tile_id", pa.array(tid))
        .append_column("loc_x", pa.array(lx))
        .append_column("loc_y", pa.array(ly))
    )


def assign_hex(batch: pa.Table, res: int, lon_col="lon", lat_col="lat", out_col=None) -> pa.Table:
    """Add an H3-style hex cell id column at resolution ``res``."""
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    cell = S.lonlat_to_hex(lon, lat, res)
    return batch.append_column(out_col or f"hex_r{res}", pa.array(cell))


def parse_fid(batch: pa.Table, id_col: str = "image_id", out: str = "fid") -> pa.Table:
    """Parse ``img%012d`` ids to int64 ONCE, vectorized in Arrow — the
    numeric id then rides the shuffle instead of the string (fewer bytes,
    and per-tile id handling becomes zero-copy numpy instead of per-row
    Python string parsing)."""
    import pyarrow.compute as pc

    s = pc.utf8_slice_codeunits(batch[id_col], 3, 64)
    return batch.append_column(out, pc.cast(s, pa.int64()))


def _row_salt_hash(batch: pa.Table, n: int) -> np.ndarray:
    """Deterministic per-row uint64 hash for salting: splitmix64 of ``fid``
    when present (vectorized), else pandas hash of the id string."""
    import pandas as pd

    if "fid" in batch.column_names:
        from ..sources.synth import _splitmix64

        fid = batch["fid"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return _splitmix64(fid)
    ids = batch["image_id"].to_numpy(zero_copy_only=False)
    return pd.util.hash_array(ids.astype(object)).astype(np.uint64)


def salt_quadtree(
    batch: pa.Table,
    corpus_rows: int,
    z_salt: int = 6,
    max_group_rows: int = 32_768,
    max_depth: int = 6,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> pa.Table:
    """Quadtree shuffle salt for the ship-once pyramid exchange.

    The pyramid ships each feature ONCE, partitioned by its coarsest-zoom
    tile; finer-zoom assignments are re-derived post-shuffle.  A base tile
    therefore cannot be split by an arbitrary row hash — that would
    fragment EVERY descendant tile.  Instead EVERY row's salt is a hash of
    its ancestor tile at a refinement zoom, starting at ``z_salt`` (the
    second pyramid zoom): rows of one refinement subtree share a salt, so
    every pyramid tile at a zoom >= its local refinement zoom stays WHOLE
    inside one fragment; only the coarser tiles fragment and take the
    merge pass.  Salting is UNIVERSAL (not gated on density) because a
    group's cost has a per-TILE term as well as a per-row one: an unsalted
    base-tile group would drag all ~4^(z_max-z_base) descendant tiles into
    one encode task regardless of row count.  Subtrees whose
    batch-estimated row mass (in-batch share x corpus size) still exceeds
    ``max_group_rows`` refine deeper, so group row mass — and worker heap —
    stays bounded at EVERY corpus scale (the reference's 'low-zoom tiles
    hold the world' skew, SURVEY.md §4).  The estimate is per batch; a
    borderline subtree may refine differently across batches, which only
    creates extra fragments — the count-based merge split reassembles them.
    """
    from ..functions import spatial as S_
    from ..sources.synth import _splitmix64

    n = batch.num_rows
    if n == 0:
        return batch.append_column("salt", pa.array(np.zeros(n, dtype=np.int32)))
    scale = corpus_rows / n if corpus_rows > 0 else 1.0
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    salt_key = np.zeros(n, dtype=np.uint64)
    idx = np.arange(n)
    for z in range(z_salt, z_salt + max_depth + 1):
        tx, ty = S_.lonlat_to_tile(lon[idx], lat[idx], z)
        child = S_.pack_tile_id(z, tx, ty).astype(np.uint64)
        _, inv, counts = np.unique(child, return_inverse=True, return_counts=True)
        fits = (counts.astype(np.float64) * scale)[inv] <= max_group_rows
        if z == z_salt + max_depth:  # depth cap: salt at the deepest level
            fits = np.ones(len(idx), dtype=bool)
        salt_key[idx[fits]] = child[fits]
        idx = idx[~fits]
        if len(idx) == 0:
            break
    # 1..1021 (never 0 — salt 0 is reserved for 'unsalted'); collisions only
    # merge sibling subtrees into one fragment (a perf detail, not
    # a correctness one)
    salt = 1 + (_splitmix64(salt_key) % np.uint64(1021)).astype(np.int32)
    return batch.append_column("salt", pa.array(salt))


def salt_hot_tiles(batch: pa.Table, hot_zooms=(), num_salts: int = 8) -> pa.Table:
    """Add a shuffle-salt column: tiles at the given HOT zooms split into
    ``num_salts`` sub-groups so one group never holds an unbounded slice of
    the corpus (SURVEY.md §7.4 skew row).  Which zooms are hot is a
    corpus-density decision made once at pipeline-build time
    (``tiling.hot_zooms_for``): a zoom salts only when the expected rows per
    tile would blow the per-group cap, so at low densities tiles stay whole
    (one output row per (z,x,y), no fragment-merge pass needed).  Salt is a
    deterministic hash of image_id so re-runs produce identical grouping."""
    import pandas as pd

    salt = np.zeros(batch.num_rows, dtype=np.int32)
    if hot_zooms:
        z = batch["tile_z"].to_numpy(zero_copy_only=False)
        hot = np.isin(z, np.asarray(list(hot_zooms), dtype=z.dtype))
        if hot.any():
            h = _row_salt_hash(batch, batch.num_rows)
            # salted tiles use salt values 1..k: salt==0 then MEANS unsalted,
            # a purely batch-local predicate (the merge stage needs no global
            # salted-tile-id set)
            salt = np.where(hot, 1 + (h % np.uint64(num_salts)).astype(np.int32), salt)
    return batch.append_column("salt", pa.array(salt))


def salt_dense_tiles(
    batch: pa.Table,
    corpus_rows: int,
    max_group_rows: int = 65_536,
    max_salts: int = 64,
) -> pa.Table:
    """Density-ADAPTIVE shuffle salt: estimate each tile's global row count
    from its in-batch share (``in_batch_count * corpus_rows / batch_rows`` —
    blocks are row-order samples of the corpus, so shares are unbiased), and
    split tiles whose estimate blows the per-group cap into
    ``2^ceil(log2(est / cap))`` salt buckets (capped).  Catches CLUSTERED
    skew that a uniform rows-per-zoom model misses — the measured corpus has
    one z4 tile holding ~20% of all rows, a 13x-mean straggler without this.
    Salt is a deterministic hash of image_id; fragments are re-merged into
    whole tiles downstream (TileFragmentMerger)."""
    import pandas as pd

    n = batch.num_rows
    if n == 0 or corpus_rows <= 0:
        return batch.append_column("salt", pa.array(np.zeros(n, dtype=np.int32)))
    tid = batch["tile_id"].to_numpy(zero_copy_only=False)
    _, inv, counts = np.unique(tid, return_inverse=True, return_counts=True)
    est = counts.astype(np.float64) * (corpus_rows / n)
    # salts per tile: next power of two of est/cap, 1 (no salt) when under
    over = np.maximum(est / max_group_rows, 1.0)
    salts_per_tile = np.minimum(
        2 ** np.ceil(np.log2(over)).astype(np.int64), max_salts
    ).astype(np.uint64)
    row_salts = salts_per_tile[inv]
    salt = np.zeros(n, dtype=np.int32)
    hot = row_salts > 1
    if hot.any():
        h = _row_salt_hash(batch, n)
        # 1..k (never 0): salt==0 identifies unsalted tiles locally, so the
        # fragment merge can split the tile stream without a global pass
        salt[hot] = 1 + (h[hot] % row_salts[hot]).astype(np.int32)
    return batch.append_column("salt", pa.array(salt))


class PipAssigner:
    """Actor-pool stage: point-in-polygon tagging against a broadcast
    polygon set (the 'compiled spatial index held by actors' the north rule
    names; reference analogue: the per-process SQLite handle A5).

    ``polygons_ref`` is a ``ray.put`` handle to a dict with arrays
    (poly_id, ring_offsets, ring_x, ring_y, bbox) — fetched ONCE per actor
    in ``__init__``, never per batch.
    """

    def __init__(self, polygons_ref, lon_col="lon", lat_col="lat"):
        import ray

        polys = ray.get(polygons_ref)
        self.lon_col, self.lat_col = lon_col, lat_col
        self.polys = []
        for p in polys:
            bbox = S.rings_bbox(p["ring_x"], p["ring_y"])
            self.polys.append((p["poly_id"], p["ring_offsets"], p["ring_x"], p["ring_y"], bbox))

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        out = np.full(len(lon), "", dtype=object)
        for pid, offs, rx, ry, (x0, y0, x1, y1) in self.polys:
            cand = (lon >= x0) & (lon <= x1) & (lat >= y0) & (lat <= y1) & (out == "")
            if not cand.any():
                continue
            ii = np.flatnonzero(cand)
            hit = S.points_in_rings(lon[ii], lat[ii], rx, ry, offs)
            out[ii[hit]] = pid
        return batch.append_column("poly_id", pa.array(out, pa.string()))
