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


def plan_refinement(
    lon: np.ndarray,
    lat: np.ndarray,
    est_scale: float,
    z_base: int = 4,
    cap: int = 32_768,
    max_depth: int = 6,
    force_levels: tuple = (),
) -> dict[int, np.ndarray]:
    """Build the pyramid's GLOBAL quadtree refinement plan from a sample.

    Returns ``{level: sorted uint64 cell ids}`` — the cells whose estimated
    row mass (sample count x ``est_scale``) exceeds ``cap`` and therefore
    split into their four children for partitioning.  The plan is computed
    ONCE (driver-side, from a deterministic sample) and broadcast, so every
    batch makes IDENTICAL split decisions — which makes "is this tile whole
    inside its partition?" locally decidable (``tiles_whole``) and removes
    the borderline-tile fragment duplication class the per-batch adaptive
    salting had (tests/test_salting.py history).  This is the same
    sample-then-plan pattern Ray's sort uses for range boundaries; the
    sample size bounds driver memory at ANY corpus scale.

    ``force_levels`` refines every observed cell at those levels
    unconditionally (test hook for exercising the merge path on tiny data).
    """
    from ..functions import spatial as S_

    refined: dict[int, np.ndarray] = {}
    zmax = z_base + max_depth
    if len(lon) == 0:
        return refined
    tx, ty = S_.lonlat_to_tile(lon, lat, zmax)
    active = np.ones(len(lon), dtype=bool)
    for l in range(z_base, zmax):  # never refine the deepest level
        sh = zmax - l
        cells = S_.pack_tile_id(l, tx >> sh, ty >> sh).astype(np.uint64)
        u, cnt = np.unique(cells[active], return_counts=True)
        if l in force_levels:
            hot = u
        else:
            hot = u[cnt.astype(np.float64) * est_scale > cap]
        if len(hot) == 0:
            break
        refined[l] = np.sort(hot)
        active &= np.isin(cells, hot)
        if not active.any():
            break
    return refined


def terminal_cells(
    lon: np.ndarray,
    lat: np.ndarray,
    refined: dict[int, np.ndarray],
    z_base: int = 4,
    max_depth: int = 6,
) -> np.ndarray:
    """Per-row terminal quadtree cell under a refinement plan: walk down
    from ``z_base``, descending while the ancestor cell is refined.  The
    terminal cell is the pyramid exchange's partition key — all rows of any
    tile at a zoom >= the terminal level land in ONE partition."""
    from ..functions import spatial as S_

    n = len(lon)
    zmax = z_base + max_depth
    term = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return term
    tx, ty = S_.lonlat_to_tile(lon, lat, zmax)
    undecided = np.ones(n, dtype=bool)
    for l in range(z_base, zmax + 1):
        sh = zmax - l
        cells = S_.pack_tile_id(l, tx >> sh, ty >> sh).astype(np.uint64)
        r = refined.get(l)
        if r is None or len(r) == 0:
            term[undecided] = cells[undecided]
            return term
        stop = undecided & ~np.isin(cells, r)
        term[stop] = cells[stop]
        undecided &= ~stop
        if not undecided.any():
            return term
    # depth cap: anything still undecided terminates at the deepest level
    term[undecided] = S_.pack_tile_id(zmax, tx, ty).astype(np.uint64)[undecided]
    return term


def tiles_whole(
    tile_x: np.ndarray,
    tile_y: np.ndarray,
    z: int,
    refined: dict[int, np.ndarray],
    z_base: int = 4,
) -> np.ndarray:
    """Whole-tile mask: tile t at zoom ``z`` has ALL its corpus rows inside
    one terminal-cell partition iff the refinement walk along t's own
    ancestors stops at a level <= z — equivalently, NOT every ancestor in
    [z_base, z] is refined.  Purely a function of the broadcast plan and
    the tile coords, so every partition classifies identically."""
    from ..functions import spatial as S_

    n = len(tile_x)
    if z < z_base:
        return np.zeros(n, dtype=bool)  # coarser than the partition root
    frag = np.ones(n, dtype=bool)
    for l in range(z_base, z + 1):
        r = refined.get(l)
        if r is None or len(r) == 0:
            return np.ones(n, dtype=bool)
        sh = z - l
        cells = S_.pack_tile_id(l, tile_x >> sh, tile_y >> sh).astype(np.uint64)
        frag &= np.isin(cells, r)
        if not frag.any():
            break
    return ~frag


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
