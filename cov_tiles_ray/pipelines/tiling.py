"""Flagship pipeline: image corpus -> tile assignment -> COVT tile packing.

    read_parquet(images)                      # prune: no image bytes read
      -> map_batches(assign_tiles)            # stateless, pyarrow, vectorized
      -> map_batches(assign_hex)              # hex cells for k-ring queries
      -> map_batches(salt_dense_tiles)        # skew: split measured-hot tiles
      -> groupby(tile_id, salt)               # THE shuffle (light columns)
      -> map_groups(TileEncoder)              # per-tile COVT encode
      -> map_batches(verify_tiles_batch)      # decode round-trip oracle
      -> write parquet partitioned by z       # resumable layout + lineage

The shuffle deliberately carries only (fid, tile keys, local coords,
caption, fmt, phash) — never the binary image payload (SURVEY.md §7.5).
Per-row pixel validation runs as a separate stage over the original table
(validate_images), where the bytes column stays within its own blocks and
never crosses the exchange.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions import image as img_f
from ..functions import spatial as S
from ..sources import synth
from ..stages.assign import (
    assign_hex,
    assign_tiles,
    parse_fid,
    plan_refinement,
    salt_dense_tiles,
    salt_hot_tiles,
    terminal_cells,
    tiles_whole,
)
from ..stages.tile_encode import (
    MultiTileEncoder,
    RawFragmentMerger,
    TileEncoder,
    TileFragmentMerger,
    fragment_ipc_bytes,
    verify_tiles_batch,
)
from ..state import checkpoint
from ..tile import EncodeOptions

LIGHT_COLUMNS = ["image_id", "caption", "fmt", "phash", "lon", "lat"]


def read_images(sf_dir_or_sf, columns: list[str] | None = None) -> rd.Dataset:
    """Dataset over the synthetic image corpus for a scale factor or sf dir.

    ``columns`` prunes at the read (never load `bytes` unless a stage needs
    pixels).  Block count is pinned to DATA SIZE (~20k rows per block), NOT
    cluster size: deriving it from CPU count made runs at different
    parallelism levels non-comparable — the scaling criterion's exact
    failure mode.  History: 5k-row blocks (120 at sf0.1) were chosen when
    the exchange's OUTPUT granularity was tied to its input count; the
    plan-derived boundary exchange decouples them (exchange_ranges), so
    the input count now only sizes read/assign tasks and the shuffle's
    map side — and the sort schedules in_blocks x out_blocks chunks, so
    30 map blocks cut that coordination 4x (measured 24.5s -> 19.0s at
    16 CPUs, sf0.1)."""
    sf = synth.sf_from_dir(sf_dir_or_sf) if isinstance(sf_dir_or_sf, str) else float(sf_dir_or_sf)
    path = synth.images_parquet_path(sf)
    return rd.read_parquet(
        path, columns=columns, override_num_blocks=read_blocks(synth.rows_for_sf(sf))
    )


def read_blocks(n_rows: int) -> int:
    """Input block count for an n-row corpus: ~20k rows/block up to sf0.1,
    sqrt(n)-scaled beyond (see exchange_ranges — the map side of the same
    chunk matrix).  Capped so a block stays a comfortable task size."""
    rpb = int(np.clip(_BLOCK_SQRT_COEF * max(n_rows, 1) ** 0.5, 20_000, 2_000_000))
    return int(np.clip(n_rows // rpb, 8, 512))


# Hash partition count for the tile exchange.  FIXED (not cluster-derived):
# the same job must produce the same partitioning at every cluster size, and
# the sort shuffle moves blocks x partitions chunks — deriving partitions
# from CPU count made the 4N-node exchange pay 4x the coordination of the
# N-node one, which is exactly the anti-scaling the north rule's efficiency
# criterion punishes.  History: 64 parts quantized into uneven sort blocks
# (one 10.9s straggler vs 3.6s mean task at sf0.1); 256 still left a 4x-mean
# block (82k rows, 6.7s straggler vs 2.0s mean — heavy low-zoom tiles
# landing in one bucket); 4096 makes each bucket ~0.02% of the corpus so
# the sort's sampled range boundaries can split mass evenly regardless of
# which buckets the heavy tiles hash into.
N_PART = 4096

# Per-group feature cap target: a (tile, salt) group beyond this many rows
# risks blowing a worker's heap (each feature carries a caption string), so
# zooms whose EXPECTED density exceeds cap/safety get salted.  Safety factor
# covers spatial skew (a dense city tile vs the uniform-average tile).
# 16k (not 64k): a salt fragment is also the largest indivisible unit the
# sort can place in one output block — 64k fragments produced 4x-mean
# straggler blocks (6.3s task vs 2.0s mean at sf0.1); 16k keeps every
# fragment below the ~20k-row mean block so the exchange balances.
MAX_GROUP_ROWS = 16_384
SALT_SAFETY = 8

# Pyramid refinement cap (ship-once exchange): a quadtree cell whose
# estimated row mass exceeds this refines into its four children.  A cell is
# the largest indivisible unit the exchange can place in one reduce block,
# so the cap bounds the encode stage's straggler task directly: 32k left a
# 33.6k-row block = 10.3s task vs 2.1s mean at sf0.1/32cpus; 8k cuts the
# straggler to ~8s and the headline by ~2s.  The cost of refining deeper is
# a few more coarse tiles taking the (single-encode) raw-fragment merge.
PYRAMID_GROUP_ROWS = 8_192

_SHUFFLE_COLUMNS = ["tile_id", "salt", "fid", "loc_x", "loc_y", "caption", "fmt", "phash"]

# What the ship-once pyramid exchange actually moves: partition key + raw
# position; every zoom's tile/local coords are re-derived post-shuffle.
_PYRAMID_SHIP_COLUMNS = ["part", "fid", "lon", "lat", "caption", "fmt", "phash"]


def hot_zooms_for(corpus_rows: int, zooms) -> tuple[int, ...]:
    """Zooms whose expected rows-per-tile would blow the per-group cap.

    Density model: ``corpus_rows / 4**z`` uniform-average rows per tile,
    times SALT_SAFETY for skew headroom.  At sandbox scales this is empty
    (tiles stay whole — one row per (z,x,y), no merge pass); at the
    10^12-image target every z<=9 salts, which is exactly the reference's
    'low-zoom tiles hold the world' skew case (SURVEY.md §4)."""
    return tuple(
        z for z in zooms if corpus_rows / max(1, 4**z) * SALT_SAFETY > MAX_GROUP_ROWS
    )


def _estimate_rows(images: rd.Dataset) -> int:
    """Corpus size for the salting decision — parquet metadata count (cheap;
    no execution for a plain read)."""
    try:
        return int(images.count())
    except Exception:
        return 0


def _encode_partitioned(
    ds: rd.Dataset,
    opts: EncodeOptions | None,
    extent: int,
    with_mvt: bool,
    with_cells: bool = False,
) -> rd.Dataset:
    """Assigned feature rows -> hash-partition by (tile_id, salt) -> THE
    shuffle -> per-partition multi-tile encode -> decode-verify -> (only when
    salting triggered) fragment merge.  MultiTileEncoder segments by
    (tile_id, salt) inside the kernel, so the per-group wrapper cost is paid
    N_PART times, not once per tile, and dense regions hash-spread across
    the pool (skew control beyond salting)."""

    def add_part(b: pa.Table) -> pa.Table:
        tid = b["tile_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        salt = b["salt"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # salt folded into the partition key: fragments of a hot tile SPREAD
        # across partitions (that is the whole point of salting)
        h = ((tid * np.uint64(31) + salt) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return b.append_column("part", pa.array((h % np.uint64(N_PART)).astype(np.int64)))

    ds = ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
    inner = TileEncoder(opts or EncodeOptions(), extent, with_cells=with_cells)
    inner.with_mvt_baseline = with_mvt  # adds true-MVT size columns
    encoder = MultiTileEncoder(inner=inner)

    def encode_part(g):
        g = {k: v for k, v in g.items() if k != "part"}
        return encoder(g)

    tiles = ds.groupby("part").map_groups(encode_part, batch_format="numpy")
    # decode-verify fused into the encode wave: it overlaps encode compute
    # inside phase one instead of running as a second serialized phase after
    # the merge barrier (measured 21s vs 26s at 16 CPUs); the fragment merge
    # re-verifies any tile it re-encodes
    tiles = tiles.map_batches(verify_tiles_batch, batch_format="pyarrow")

    return _merge_multi_fragment_tiles(tiles, opts, extent)


def _merge_multi_fragment_tiles(
    tiles: rd.Dataset, opts: EncodeOptions | None, extent: int
) -> rd.Dataset:
    """Reassemble tiles that came out of the exchange in >1 fragment.

    The split is COUNT-based — a tile goes to the merge branch iff it has
    >=2 encoded rows — which is exact under every salting scheme: it covers
    borderline tiles (salt-0 fragment from one batch, salted fragments from
    another — the adaptive decision is per batch) AND skips salted tiles
    whose rows all collapsed into a single fragment (one row holding every
    feature, already byte-identical to an unsalted encode — the old
    ``salt != 0`` rule paid a pointless decode + re-encode for those).
    The dup scan is DISTRIBUTED (VERDICT r2 #3): a groupby(tile_id) count
    over the tile_id column only, filtered to n>1 before anything reaches
    the driver — so the driver holds one int64 per *fragmented* tile (the
    few salted hot tiles by construction), never one per output tile
    (a z14 pyramid has 2.7e8 tiles; fragmented tiles are bounded by the
    salting plan)."""
    from ray.data.aggregate import Count

    tiles = tiles.materialize()
    dup_df = (
        tiles.select_columns(["tile_id"])
        .groupby("tile_id")
        .aggregate(Count(alias_name="n"))
        .filter(expr="n > 1")
        .to_pandas()
    )
    # an all-filtered (no-dup) result can come back schemaless
    dup_ids = (
        np.sort(dup_df["tile_id"].to_numpy()) if len(dup_df) else np.empty(0, dtype=np.int64)
    )

    def zero_salt(b: pa.Table) -> pa.Table:
        # salt is a shuffle implementation detail; output rows are whole
        # tiles (salt semantically 0) regardless of how they shipped
        i = b.schema.get_field_index("salt")
        return b.set_column(i, "salt", pa.array(np.zeros(b.num_rows, dtype=np.int32)))

    if len(dup_ids) == 0:
        return tiles.map_batches(zero_salt, batch_format="pyarrow", zero_copy_batch=True)

    def split_mask(b: pa.Table) -> np.ndarray:
        tid = b["tile_id"].to_numpy(zero_copy_only=False)
        return np.isin(tid, dup_ids)

    def take_frags(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(split_mask(b)))

    def take_rest(b: pa.Table) -> pa.Table:
        return zero_salt(b.filter(pa.array(~split_mask(b))))

    rest = tiles.map_batches(take_rest, batch_format="pyarrow", zero_copy_batch=True)
    frags = tiles.map_batches(take_frags, batch_format="pyarrow", zero_copy_batch=True)

    merger = TileFragmentMerger(opts or EncodeOptions(), extent)

    # Fragmented tiles are the few hottest (densest) tiles: the fragment ROW
    # count is tiny, but each merge decodes + re-encodes a big tile, so
    # merges must run in PARALLEL (a single-task merge serialized 7 hot-tile
    # merges into an 8.8s critical path at sf0.1).  Group by a HASH bucket
    # of tile_id, not tile_id itself: the groupby exchange range-partitions
    # its key, and tile ids of one zoom are ADJACENT (z lives in the high
    # bits), which funneled every base-zoom merge into ONE task (measured
    # 8.6s straggler); TileFragmentMerger segments by tile_id internally, so
    # a bucket per task is exactly what it wants.  The hash also co-locates
    # all fragments of a tile, and 64 buckets keep the exchange's fixed cost
    # small while spreading the heavy merges across the pool.
    def add_mpart(b: pa.Table) -> pa.Table:
        tid = b["tile_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (tid * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        return b.append_column("mpart", pa.array((h % np.uint64(64)).astype(np.int64)))

    def merge_bucket(g):
        g = {k: v for k, v in g.items() if k != "mpart"}
        return merger(g)

    merged = (
        frags.map_batches(add_mpart, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("mpart")
        .map_groups(merge_bucket, batch_format="numpy")
    )
    return rest.union(merged)


def build_tiles(
    images: rd.Dataset,
    z: int = 8,
    hex_res: int = 6,
    opts: EncodeOptions | None = None,
    extent: int = 4096,
    with_mvt: bool = False,
    hot_zooms: tuple[int, ...] | None = None,
    with_cells: bool = False,
) -> rd.Dataset:
    """images Dataset (light columns) -> verified COVT tile Dataset.

    ``hot_zooms`` forces zoom-level salting (tests / known-hot pyramids);
    the default is per-batch density-ADAPTIVE salting against the measured
    corpus size (salt_dense_tiles), which catches clustered hot tiles a
    uniform model misses."""
    n_rows = _estimate_rows(images)
    images = images.map_batches(parse_fid, batch_format="pyarrow", zero_copy_batch=True)
    ds = images.map_batches(
        lambda b: assign_tiles(b, z=z, extent=extent), batch_format="pyarrow", zero_copy_batch=True
    )
    ds = ds.map_batches(lambda b: assign_hex(b, res=hex_res), batch_format="pyarrow", zero_copy_batch=True)
    if hot_zooms is not None:
        ds = ds.map_batches(
            lambda b: salt_hot_tiles(b, hot_zooms=hot_zooms),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        ds = ds.map_batches(
            lambda b: salt_dense_tiles(b, corpus_rows=n_rows, max_group_rows=MAX_GROUP_ROWS),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    ds = ds.select_columns(_SHUFFLE_COLUMNS)
    return _encode_partitioned(ds, opts, extent, with_mvt, with_cells)


class PyramidPartEncoder:
    """map_groups kernel for the pyramid exchange: one group = one hash
    partition of terminal plan cells.  Re-derives every zoom's tile
    assignment from lon/lat (the exchange ships each feature ONCE), encodes
    every tile that is WHOLE under the broadcast refinement plan, and emits
    the rows of fragmented (coarser-than-terminal) tiles as raw Arrow IPC
    blobs for the single downstream merge encode.

    A module-level class (not a closure) so the kernel is constructible in
    tests/profilers without a Ray session, and so the captured plan ships
    once per task via the serialized callable."""

    def __init__(
        self,
        zooms: tuple[int, ...],
        refined: dict[int, np.ndarray],
        opts: EncodeOptions | None = None,
        extent: int = 4096,
        with_mvt: bool = False,
        with_cells: bool = False,
        channel=None,
        run_id: int = 0,
    ):
        self.zooms = tuple(sorted(zooms))
        self.z_base = self.zooms[0]
        self.refined = refined
        self.extent = extent
        # side-channel mode (stages/frag_channel.py): fragments leave via
        # the channel actor instead of riding the output as kind=0 rows,
        # so the output is whole-tiles-only and needs no kind/frag columns
        self.channel = channel
        self.run_id = run_id
        inner = TileEncoder(opts or EncodeOptions(), extent, with_cells=with_cells)
        inner.with_mvt_baseline = with_mvt
        self.encoder = MultiTileEncoder(inner=inner)
        self.zero_defaults = {
            "n_features": np.int64, "n_layers": np.int32, "covt_bytes": np.int64,
            "plain_bytes": np.int64,
            **({"mvt_bytes": np.int64, "mvt_gzip_bytes": np.int64} if with_mvt else {}),
        }
        self.canon = (
            ["tile_id", "z", "x", "y", "salt", "n_features", "n_layers", "covt",
             "covt_bytes", "plain_bytes"]
            + (["mvt_bytes", "mvt_gzip_bytes"] if with_mvt else [])
            + ["roundtrip_ok"]
            + ([] if channel is not None else ["kind", "frag"])
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        # post-shuffle zoom expansion: int tile/local coords only — the
        # heavy string columns are shared zero-copy across the zoom tables
        src = -1
        if "part" in t.column_names:
            if t.num_rows:
                # first part value of the sorted range: unique per task
                # (boundaries never split a part) — the channel dedup key
                # that makes a retried task's re-registration idempotent
                src = int(t["part"][0].as_py())
            t = t.drop_columns(["part"])
        whole_tables: list[pa.Table] = []
        frag_tid: list[int] = []
        frag_rows: list[int] = []
        frag_blobs: list[bytes] = []
        for z in self.zooms:
            tz = assign_tiles(t, z=z, extent=self.extent)
            whole = tiles_whole(
                tz["tile_x"].to_numpy(zero_copy_only=False),
                tz["tile_y"].to_numpy(zero_copy_only=False),
                z, self.refined, self.z_base,
            )
            tzs = tz.select(_SHUFFLE_COLUMNS[:1] + _SHUFFLE_COLUMNS[2:])  # no salt col
            if whole.all():
                whole_tables.append(tzs)
                continue
            whole_idx = np.flatnonzero(whole)
            if len(whole_idx):
                whole_tables.append(tzs.take(pa.array(whole_idx)))
            fr = tzs.take(pa.array(np.flatnonzero(~whole)))
            tid = fr["tile_id"].to_numpy(zero_copy_only=False)
            order = np.argsort(tid, kind="stable")
            fr = fr.take(pa.array(order)).combine_chunks()
            tid = tid[order]
            change = np.concatenate([[True], tid[1:] != tid[:-1]])
            starts = np.flatnonzero(change)
            ends = np.concatenate([starts[1:], [len(tid)]])
            payload = fr.drop_columns(["tile_id"])
            for s, e in zip(starts, ends):
                frag_tid.append(int(tid[s]))
                frag_rows.append(int(e - s))
                frag_blobs.append(fragment_ipc_bytes(payload.slice(s, e - s)))
        wt = pa.concat_tables(whole_tables) if whole_tables else None
        if wt is not None and wt.num_rows:
            wt = wt.append_column("salt", pa.array(np.zeros(wt.num_rows, dtype=np.int64)))
            cols = self.encoder(wt)
        else:
            cols = None
        out = None
        if cols is not None:
            n = len(cols["tile_id"])
            # decode-verify fused into the encode wave (overlaps compute
            # instead of a second serialized phase; measured 21s vs 26s),
            # run straight off the numpy columns — the covt payloads are
            # still python bytes here, so no per-row Arrow .as_py() cost.
            # Batched decode (tile/batch_verify.py): stream payloads of the
            # whole wave decode grouped by encoding family.
            from ..tile.batch_verify import verify_tiles

            oks = verify_tiles(cols["covt"], cols["n_features"], cols["n_layers"])
            oks &= np.asarray(cols.pop("full_ok"), dtype=bool)
            cols["roundtrip_ok"] = oks
            enc_t = pa.table({k: pa.array(v) for k, v in cols.items()})
            if self.channel is None:
                enc_t = enc_t.append_column("kind", pa.array(np.ones(n, dtype=np.int8)))
                enc_t = enc_t.append_column("frag", pa.array([b""] * n, pa.binary()))
            out = enc_t
        if frag_tid and self.channel is not None:
            import ray

            # bytes go to the object store owned by the channel actor
            # (spillable, survives this worker); the actor holds refs only.
            # The blocking ack makes task completion imply registration —
            # the pipeline's materialize is then a valid collect barrier.
            entries = [
                (tid, src, ray.put(blob, _owner=self.channel), nr)
                for tid, blob, nr in zip(frag_tid, frag_blobs, frag_rows)
            ]
            ray.get(self.channel.add.remote(self.run_id, entries))
        elif frag_tid:
            nf = len(frag_tid)
            ftid = np.array(frag_tid, dtype=np.int64)
            fcols: dict[str, pa.Array] = {
                "tile_id": pa.array(ftid),
                "z": pa.array((ftid >> 58).astype(np.int32)),
                "x": pa.array(((ftid >> 29) & ((1 << 29) - 1)).astype(np.int32)),
                "y": pa.array((ftid & ((1 << 29) - 1)).astype(np.int32)),
                "salt": pa.array(np.zeros(nf, dtype=np.int32)),
            }
            for name, dt in self.zero_defaults.items():
                fcols[name] = pa.array(np.zeros(nf, dtype=dt))
            fcols["covt"] = pa.array([b""] * nf, pa.binary())
            fcols["roundtrip_ok"] = pa.array(np.ones(nf, dtype=bool))
            fcols["kind"] = pa.array(np.zeros(nf, dtype=np.int8))
            fcols["frag"] = pa.array(frag_blobs, pa.binary())
            ft = pa.table(fcols)
            out = pa.concat_tables([out.select(ft.column_names), ft]) if out is not None else ft
        if out is None:
            # an empty partition: emit an empty table with the full schema
            empty = {k: pa.array([], pa.int64()) for k in ["tile_id"]}
            empty.update({k: pa.array([], pa.int32()) for k in ["z", "x", "y", "salt"]})
            for name, dt in self.zero_defaults.items():
                empty[name] = pa.array(np.array([], dtype=dt))
            empty["covt"] = pa.array([], pa.binary())
            empty["roundtrip_ok"] = pa.array([], pa.bool_())
            if self.channel is None:
                empty["kind"] = pa.array([], pa.int8())
                empty["frag"] = pa.array([], pa.binary())
            out = pa.table(empty)
        return out.select(self.canon)


def build_tile_pyramid(
    images: rd.Dataset,
    zooms: tuple[int, ...] = (4, 6, 8, 10),
    hex_res: int = 6,
    opts: EncodeOptions | None = None,
    extent: int = 4096,
    with_mvt: bool = False,
    hot_zooms: tuple[int, ...] | None = None,
    with_cells: bool = False,
) -> rd.Dataset:
    """Full tile pyramid: ONE feature exchange, every tile encoded ONCE.

    Plan-then-execute: a deterministic sample builds a GLOBAL quadtree
    refinement plan (``_plan_pyramid``), features hash-partition by their
    terminal plan cell, and because finer tiles nest inside cells, every
    tile at a zoom >= its region's terminal level is WHOLE in one partition
    — encoded there directly (per-zoom assignments re-derived from lon/lat
    AFTER the exchange, so each feature ships once, not once per zoom).
    Tiles COARSER than their region's terminal level can never be whole in
    one partition; their rows ship onward as raw Arrow IPC fragments
    (dictionary-encoded strings, ``fragment_ipc_bytes``) and the tile is
    encoded exactly once at the merge (``RawFragmentMerger``).  The v2
    design encoded those fragments as real COVT tiles and then
    decode+re-encoded at the merge — ~two wasted encode passes over every
    low-zoom tile, the dominant non-scaling term at 4->16 CPUs.  A union of
    per-zoom pipelines would pay the exchange fixed costs once per zoom
    (measured ~4x worse scaling on a 32-way node).  (Production tileset
    shape: the reference's corpora span z2-z14,
    CovtConverterTest.java:156-276.)

    ``hot_zooms`` (tests): ``()`` disables refinement (every tile whole);
    containing ``zooms[0]`` force-refines the base level so the fragment
    merge runs even on tiny corpora."""

    import time as _time

    _t0 = _time.perf_counter()
    _mark = (
        (lambda label: print(
            f"[pyramid +{_time.perf_counter() - _t0:7.2f}s] {label}", file=__import__("sys").stderr, flush=True
        ))
        if os.environ.get("GRAFT_TIMING") == "1"
        else (lambda label: None)
    )
    zooms = tuple(sorted(zooms))
    z_base = zooms[0]
    # kick off the (cached) channel actor boot BEFORE planning so the
    # worker-process spawn overlaps the driver-side plan sample read
    channel = _get_frag_channel() if PYRAMID_MERGE == "channel" else None
    n_rows = _estimate_rows(images)
    refined, part_bounds = _plan_pyramid(images, n_rows, z_base, zooms[-1], hot_zooms)
    _mark("plan done")
    max_depth = (zooms[-1] + 2) - z_base

    def assign_base(b: pa.Table) -> pa.Table:
        b = parse_fid(b)
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        cell = terminal_cells(lon, lat, refined, z_base, max_depth)
        # splitmix spreads sibling cells of a hot cluster across the key
        # range (the groupby sort range-partitions its key); modulo buckets
        # amortize the per-group cost over many cells per task
        part = (synth._splitmix64(cell) % np.uint64(N_PART)).astype(np.int64)
        b = b.append_column("part", pa.array(part))
        return b.select(_PYRAMID_SHIP_COLUMNS)

    ds = images.map_batches(assign_base, batch_format="pyarrow", zero_copy_batch=True)

    run_id = 0
    if not refined:
        channel = None  # no tile can fragment; the channel is not needed
    elif channel is not None:
        import ray

        # begin_run doubles as the readiness barrier: an actor call only
        # returns once the actor is up, and ray.put(_owner=...) against a
        # still-starting actor fails with "worker_id is empty"
        run_id = ray.get(channel.begin_run.remote())
    kernel = PyramidPartEncoder(
        zooms, refined, opts=opts, extent=extent, with_mvt=with_mvt,
        with_cells=with_cells, channel=channel, run_id=run_id,
    )

    def encode_part(t: pa.Table) -> pa.Table:
        return kernel(t)

    # The exchange: range-partition on `part` with PLAN-DERIVED boundaries
    # instead of groupby's sampled sort.  The boundaries come from the same
    # deterministic sample as the refinement plan, weighted so every range
    # carries ~equal estimated row load — which (a) skips the sort's
    # sampling round-trip, (b) fixes the reduce-block count independent of
    # input block count and cluster size, and (c) removes the straggler
    # class where several heavy cells landed in one sampled range.  A part
    # value never straddles a boundary, so every terminal cell — and hence
    # every whole tile — stays inside one batch; batch_size=None hands each
    # sorted range to the kernel as ONE zero-copy batch.
    if PYRAMID_EXCHANGE == "bounds":
        tiles = ds.sort("part", boundaries=part_bounds).map_batches(
            encode_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    else:  # sampled-sort groupby (the v3 exchange, kept for A/B measurement)
        tiles = ds.groupby("part").map_groups(encode_part, batch_format="pyarrow")
    if not refined:
        # unrefined plan -> no tile can fragment; stay a single streamed
        # pipeline (no materialize, no branch)
        return tiles.drop_columns(["kind", "frag"])
    merger = RawFragmentMerger(
        opts or EncodeOptions(), extent, with_cells=with_cells, with_mvt=with_mvt
    )
    if channel is not None:
        # Side-channel merge (stages/frag_channel.py): the output above is
        # whole-tiles-only; fragments are already registered with the
        # channel actor.  The materialize is the completion barrier (every
        # encode task acked its adds before finishing), and the merge runs
        # as ONE round of plain Ray tasks over sorted tile-id ranges —
        # replacing the filter/repartition/sort serial tail (measured
        # 2.6-4.3 s of driver-side coordination at sf0.1, BASELINE.md).
        import ray

        tiles = tiles.materialize()
        _mark("encode wave materialized")
        groups = ray.get(channel.collect.remote(run_id))
        _mark(f"collect done ({len(groups)} fragmented tiles)")
        if not groups:
            return tiles
        from ..stages.frag_channel import merge_fragment_tiles, schedule_chunked_tile

        schema = tiles.schema()
        pa_schema = getattr(schema, "base_schema", schema)
        # Chunked mega-tile route (flag-gated, VERDICT r2 #1): a fragmented
        # tile above CHUNK_MERGE_ROWS fans its encode across per-chunk Ray
        # tasks — THE Amdahl term at sf0.2 was ONE serial 242k-row z4
        # encode (~1.4-3.3 s on a 128 s-CPU job).  Disabled under with_mvt
        # (a whole-tile MVT baseline needs the serial encode).
        chunk_rows = CHUNK_MERGE_ROWS if (CHUNK_MERGE_ROWS > 0 and not with_mvt) else 0
        chunked = (
            {t for t, (_refs, rows) in groups.items() if rows > chunk_rows}
            if chunk_rows
            else set()
        )
        refs = []
        for t_id in sorted(chunked):
            t_refs, t_rows = groups[t_id]
            refs.append(
                schedule_chunked_tile(merger, t_id, t_refs, t_rows, chunk_rows, pa_schema)
            )
        # one merge task per remaining fragmented tile up to a dispatch cap,
        # LPT-balanced by ROW count (the contiguous array_split this
        # replaces stacked adjacent z4 mega-tiles — 2.65M of sf0.2's 4.8M
        # rows live in fragmented tiles, so bin balance sets the critical
        # path when chunking is off)
        tids = [t for t in sorted(groups) if t not in chunked]
        if tids:
            n_tasks = max(1, min(256, len(tids)))
            bins: list[list[int]] = [[] for _ in range(n_tasks)]
            loads = np.zeros(n_tasks, dtype=np.int64)
            for t_id in sorted(tids, key=lambda t: (-groups[t][1], t)):
                b = int(np.argmin(loads))
                bins[b].append(t_id)
                loads[b] += groups[t_id][1]
            refs += [
                merge_fragment_tiles.remote(
                    merger, span, [groups[t][0] for t in span], pa_schema
                )
                for span in bins
                if span
            ]
        _mark(f"merge tasks dispatched ({len(chunked)} chunked, {len(tids)} binned)")
        # block until the merge tasks finish (fetch_local=False keeps the
        # tables in the object store): after this the run's fragment blobs
        # (already popped from the cached actor by collect) can be GC'd.
        ray.wait(refs, num_returns=len(refs), fetch_local=False)
        _mark("merge wave complete")
        return tiles.union(rd.from_arrow_refs(refs))
    # Pure-Dataset merge path (kept for A/B): materialized ONCE so the
    # whole/fragment branches don't re-execute the exchange; the
    # materialized set is the COMPACT encoded output plus raw fragments of
    # the few fragmented (coarse/hot) tiles.  The branch predicate is the
    # local `kind` flag — no driver-side id pull.
    tiles = tiles.materialize()
    whole = tiles.filter(expr="kind == 1").drop_columns(["kind", "frag"])
    frags = tiles.filter(expr="kind == 0").select_columns(["tile_id", "frag"])

    def merge_tile(g):
        return merger(g)

    # The merge exchange also uses PLAN-derived boundaries: a tile
    # fragments iff its whole ancestor chain is refined, so the fragmented
    # tile ids are EXACTLY the plan's refined cells at pyramid zooms —
    # known up front.  One bounded sort (no sampling, no repartition)
    # replaces the sampled groupby whose chunk matrix inherited the main
    # exchange's ~120 blocks (~14k chunks for a few hundred fragment rows).
    frag_ids = np.sort(
        np.concatenate([refined[z] for z in zooms if z in refined])
    ).astype(np.int64)
    step = max(1, -(-len(frag_ids) // 32))  # ~32 merge ranges
    fb = np.unique(frag_ids[step::step] + 1).tolist()
    # Coalesce before the sort: `frags` inherits the main exchange's ~120
    # blocks, nearly all EMPTY (only refined cells fragment), and the sort
    # schedules in_blocks x ranges chunks — 109x32 of coordination for a
    # few hundred rows.  A non-shuffle repartition to a handful of blocks
    # cuts that ~30x; row content (and thus the merge output) is unchanged.
    merged = (
        frags.repartition(MERGE_SORT_IN_BLOCKS, shuffle=False)
        .sort("tile_id", boundaries=fb)
        .map_batches(merge_tile, batch_format="numpy", batch_size=None)
    )
    return whole.union(merged)


# In-block count for the fragment-merge sort (see coalesce note above):
# FIXED small constant — the fragment set is plan-bounded (refined cells
# only), a few hundred rows at any corpus scale.
MERGE_SORT_IN_BLOCKS = 4


# Exchange range sizing: the encode stage's task granularity.  DATA-derived,
# never cluster-derived, so runs at different parallelism levels build
# identical block structures.  Two regimes:
#   * small corpora (<= ~600k rows): constant ~5k rows per range — the
#     measured per-batch sweet spot (sf0.1 = 120 ranges);
#   * beyond that, rows-per-range grows as sqrt(n).  Ray's range shuffle
#     schedules map_blocks x reduce_ranges intermediate chunks (~1ms of
#     driver coordination each); with BOTH rows-per-block and
#     rows-per-range scaling as sqrt(n) the chunk matrix grows LINEARLY
#     with data instead of quadratically (measured at sf0.2: 60x240 chunks
#     pushed 16-CPU walls from ~2x sf0.1 to ~3x, efficiency 0.65).
# Ranges must also stay far below Ray's target_max_block_size: a reduce
# block that exceeded it would be split mid-range, and a split could cut a
# terminal cell in two — which would encode its "whole" tiles twice.  The
# 500k-row (~50 MB) cap keeps that headroom; past it (n ~ 6e9 rows) and
# past the 65536-range cap, build the pyramid per input shard instead (the
# resumable per-zoom write layout already supports that).
EXCHANGE_ROWS_PER_RANGE = 5_000
MAX_EXCHANGE_RANGES = 65_536
# sqrt coefficients anchored at n=600k (sf0.1): 5_000/sqrt(600k) and
# 20_000/sqrt(600k) — sizing is bit-identical to the tuned constants for
# every corpus at or below sf0.1.
_RANGE_SQRT_COEF = 5_000 / 600_000**0.5
_BLOCK_SQRT_COEF = 20_000 / 600_000**0.5


def exchange_rows_per_range(n_rows: int) -> int:
    return int(np.clip(_RANGE_SQRT_COEF * max(n_rows, 1) ** 0.5, 5_000, 500_000))


def exchange_ranges(n_rows: int) -> int:
    return int(
        np.clip(n_rows // exchange_rows_per_range(n_rows), 8, MAX_EXCHANGE_RANGES)
    )

# Exchange strategy: "bounds" = plan-derived range boundaries (no sort
# sampling, load-balanced reduce ranges); "groupby" = Ray's sampled sort.
PYRAMID_EXCHANGE = "bounds"

# Per-tile cost relative to per-row cost in the exchange boundary weights
# (measured ~190 µs/tile vs ~22 µs/row in the encode kernel — see the
# cost-weighting note in _plan_pyramid).
TILE_COST_WEIGHT = 8.0

# Fragment-merge strategy: "channel" routes fragments through the
# side-channel actor (stages/frag_channel.py — one merge-task round after
# the barrier); "sort" is the pure-Dataset alternative (filter ->
# repartition -> bounded sort -> map), kept for A/B and as the reference
# semantics.  Both produce byte-identical tiles (tests/test_determinism.py).
PYRAMID_MERGE = "channel"

# Chunked mega-tile merge (VERDICT r2 #1, DEFAULT-ON since r4 per VERDICT
# r3 #1): when > 0, a fragmented tile with more rows than this encodes as
# CHUNK_MERGE_ROWS-row fid-ordered chunks in PARALLEL Ray tasks, framed as
# a chunked tile (model/format.CHUNKED_TILE_MARKER).  The chunked frame
# decodes to LayerData identical to the unchunked encode (whole-tile cells
# layer in chunk 0; chunk boundaries are a pure function of the global fid
# order), and the bytes are deterministic under any cluster/fragmenting
# shape — but a CHUNKED tile's bytes DIFFER from the unchunked encode
# (per-chunk dictionaries).  Default 16000 auto-enables chunking only for
# tiles ABOVE the threshold, so small corpora (every tile < 16k rows, e.g.
# sf<=0.01) remain byte-identical to the reference-parity encode while the
# scale path no longer has the one serial mega-tile Amdahl term (the sf0.2
# scaling bar's fix) without any flag.  GRAFT_CHUNK_ROWS=0 is the
# byte-parity opt-out at every scale; job.py/cli.py surface --chunk-rows.
CHUNK_MERGE_ROWS = int(os.environ.get("GRAFT_CHUNK_ROWS", "16000"))

_FRAG_CHANNEL = None


def _get_frag_channel():
    """Session-cached FragmentChannel handle (boot is ~1-2 s of worker
    spawn — on a fresh pyramid's critical path otherwise).  Returns the
    handle WITHOUT waiting for readiness: the caller's first actor call
    (begin_run) is the readiness barrier, so the boot overlaps the
    driver-side plan sample.  A stale handle from a previous Ray session
    (tests / CLI runs that init+shutdown repeatedly) is detected by a
    cheap ping and recreated."""
    global _FRAG_CHANNEL
    import ray

    from ..stages.frag_channel import FragmentChannel

    if _FRAG_CHANNEL is not None:
        try:
            ray.get(_FRAG_CHANNEL.__ray_ready__.remote(), timeout=30)
            return _FRAG_CHANNEL
        except Exception:
            _FRAG_CHANNEL = None
    _FRAG_CHANNEL = FragmentChannel.remote()
    return _FRAG_CHANNEL


def _plan_sample(images: rd.Dataset, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (lon, lat) sample of ~n rows for planning.

    Fast path: when the dataset's input parquet files are discoverable
    (``input_files`` — a metadata call, no execution), read row groups
    DIRECTLY on the driver, round-robining over files spread evenly across
    the listing so spatially-partitioned corpora stay representative.  This
    replaces a full Ray job (~1.8s of fixed cost per pyramid build) with a
    ~50ms bounded read — the same driver-side sampling posture Ray's own
    sort uses for range boundaries.  Falls back to ``limit()`` (stable
    block order -> deterministic) for non-parquet-backed datasets."""
    try:
        files = sorted(images.input_files())
    except Exception:
        files = []
    if files:
        import pyarrow.parquet as pq

        k = min(len(files), 8)
        picks = [files[(i * len(files)) // k] for i in range(k)]
        per_file = -(-n // k)  # ceil: each picked file contributes ~n/k rows
        lons: list[np.ndarray] = []
        lats: list[np.ndarray] = []
        got = 0
        try:
            for path in picks:
                f = pq.ParquetFile(path)
                taken = 0
                for rg in range(f.num_row_groups):
                    t = f.read_row_group(rg, columns=["lon", "lat"])
                    lons.append(t["lon"].to_numpy())
                    lats.append(t["lat"].to_numpy())
                    taken += t.num_rows
                    got += t.num_rows
                    if taken >= per_file:
                        break
        except Exception:
            return _plan_sample_ray(images, n)
        if got:
            lon = np.concatenate(lons)[:n]
            lat = np.concatenate(lats)[:n]
            return lon, lat
    return _plan_sample_ray(images, n)


def _plan_sample_ray(images: rd.Dataset, n: int) -> tuple[np.ndarray, np.ndarray]:
    s = images.limit(n).select_columns(["lon", "lat"]).to_pandas()
    if "lon" not in s.columns:  # empty dataset -> column-less DataFrame
        return np.empty(0, np.float64), np.empty(0, np.float64)
    return s["lon"].to_numpy(), s["lat"].to_numpy()


def _plan_pyramid(
    images: rd.Dataset,
    n_rows: int,
    z_base: int,
    z_max: int,
    hot_zooms: tuple[int, ...] | None,
    sample_target: int = 200_000,
) -> tuple[dict[int, np.ndarray], list[int]]:
    """Compute the pyramid's global refinement plan AND the exchange's
    load-weighted range boundaries from one deterministic sample
    (``limit(sample_target)`` — block order is stable, so every run and
    every cluster size plans IDENTICALLY; the read prunes to the lon/lat
    columns of only the blocks the limit needs).  Driver memory is bounded
    by ``sample_target`` rows at ANY corpus scale.

    Returns ``(refined, part_bounds)``: the quadtree refinement plan and
    the sorted interior boundaries for ``Dataset.sort(boundaries=...)`` —
    chosen so each of the ~exchange_ranges(n_rows) ranges carries an equal
    share
    of the SAMPLED row load (the plan knows where the mass is; Ray's own
    sort sampling is skipped entirely).

    ``hot_zooms`` test hook: ``()`` disables refinement entirely (every
    tile whole); containing ``z_base`` force-refines the base level so the
    fragment-merge path runs even on tiny corpora."""
    lon, lat = _plan_sample(images, min(sample_target, max(n_rows, 1)))
    est_scale = n_rows / max(len(lon), 1)
    max_depth = (z_max + 2) - z_base
    if hot_zooms is not None and z_base not in hot_zooms:
        refined: dict[int, np.ndarray] = {}
    else:
        force = (z_base,) if hot_zooms is not None else ()
        refined = plan_refinement(
            lon, lat, est_scale,
            z_base=z_base, cap=PYRAMID_GROUP_ROWS, max_depth=max_depth,
            force_levels=force,
        )
    # COST-weighted boundaries over the part key space.  Per-range encode
    # cost is NOT proportional to rows: it is ~22 µs/row + ~190 µs/tile
    # (measured, corr(us/row, tiles/row) = 0.97 at sf0.1), so ranges full
    # of tiny sparse tiles run ~3x slower per row and row-weighted
    # boundaries leave a 2.8x straggler task at 16 CPUs.  Each sampled row
    # therefore weighs 1 + TILE_COST_WEIGHT if it opens a NEW
    # (part, z_max tile) pair in the sample — the finest zoom dominates
    # tile count, and in the sparse regions that form tails the sampled
    # distinct-pair count is an unbiased stand-in for tiles-per-row
    # (dense regions overweight slightly, which only narrows already-cheap
    # ranges).  Deterministic: pure function of the same plan sample.
    cell = terminal_cells(lon, lat, refined, z_base, max_depth)
    part_u = (synth._splitmix64(cell) % np.uint64(N_PART)).astype(np.int64)
    nb = exchange_ranges(n_rows)
    if len(part_u) == 0:
        step = max(1, N_PART // nb)
        return refined, list(range(step, N_PART, step))
    tx, ty = S.lonlat_to_tile(lon, lat, z_max)
    pair = (part_u.astype(np.uint64) << np.uint64(2 * z_max + 1)) | (
        tx.astype(np.uint64) << np.uint64(z_max)
    ) | ty.astype(np.uint64)
    order = np.argsort(part_u, kind="stable")
    part = part_u[order]
    pair = pair[order]
    # a row opens a new pair iff it is the FIRST occurrence of its
    # (part, tile) key among the part-sorted rows
    _uniq, first = np.unique(pair, return_index=True)
    opens = np.zeros(len(pair), dtype=bool)
    opens[first] = True
    w = 1.0 + TILE_COST_WEIGHT * opens
    cw = np.cumsum(w)
    targets = (np.arange(1, nb) * cw[-1]) / nb
    idx = np.searchsorted(cw, targets)
    idx = np.minimum(idx, len(part) - 1)
    # boundary ABOVE the part at each load quantile: a part value never
    # splits across ranges, heavy parts just own a wider load share
    bounds = np.unique(part[idx] + 1).tolist()
    return refined, bounds


def write_tiles(tiles: rd.Dataset, out_dir: str, input_desc: dict | None = None) -> dict:
    """Write tiles partitioned by zoom + record lineage/metrics per zoom.

    Returns the aggregate metrics.  Re-runs skip zooms already present in
    the lineage manifest (resume-by-anti-join on the partition key)."""
    done = checkpoint.finished_partitions(out_dir)
    agg = {"tiles": 0, "features": 0, "covt_bytes": 0, "plain_bytes": 0, "skipped_partitions": sorted(done)}

    # The tile set is the compact RESULT of the pipeline (orders of magnitude
    # smaller than the input), so materializing once here is the cheap way to
    # write one partition per zoom without re-executing the whole graph per z.
    tiles = tiles.materialize()
    zs = sorted(tiles.unique("z"))
    for z in zs:
        key = f"z={z}"
        if key in done:
            continue
        part = tiles.filter(expr=f"z == {z}")
        part_dir = f"{out_dir}/{key}"
        # no lineage record => the partition is unfinished by definition; a
        # run killed mid-write leaves partial files here, and write_parquet
        # appends uniquely-named files rather than replacing — clear first
        # so a resume can't produce duplicate rows
        if os.path.isdir(part_dir):
            import shutil

            shutil.rmtree(part_dir)
        part.write_parquet(part_dir)
        pdf = part.select_columns(["n_features", "covt_bytes", "plain_bytes", "roundtrip_ok"]).to_pandas()
        metrics = {
            "tiles": int(len(pdf)),
            "features": int(pdf["n_features"].sum()),
            "covt_bytes": int(pdf["covt_bytes"].sum()),
            "plain_bytes": int(pdf["plain_bytes"].sum()),
            "roundtrip_failures": int((~pdf["roundtrip_ok"]).sum()),
            "reduction_pct": float(100.0 * (1.0 - pdf["covt_bytes"].sum() / max(1, pdf["plain_bytes"].sum()))),
        }
        checkpoint.record_partition(out_dir, key, inputs=input_desc or {}, metrics=metrics)
        agg["tiles"] += metrics["tiles"]
        agg["features"] += metrics["features"]
        agg["covt_bytes"] += metrics["covt_bytes"]
        agg["plain_bytes"] += metrics["plain_bytes"]
    return agg


def validate_images(images: rd.Dataset) -> rd.Dataset:
    """Per-row validation stage (input_hint invariant): decode stored bytes,
    compare against the deterministically re-rendered original — PSNR >= 40dB
    for lossy formats, exact for lossless — plus caption equality."""

    def _check(batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_numpy(zero_copy_only=False)
        idx = np.array([int(s[3:]) for s in ids], dtype=np.int64)
        # re-render ORIGINAL content (ground truth) from the content key
        dup = synth._u01(idx, 21) < 0.01
        content_idx = np.where(dup, idx // 100 * 100, idx)
        originals = synth._render_images(content_idx)
        psnr_db = np.empty(len(idx), dtype=np.float64)
        # per-row Python decode is unavoidable (one codec call per image);
        # everything else in this stage is vectorized across rows
        for i in range(len(idx)):
            img = img_f.decode_image(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            p = img_f.psnr(originals[i], img)
            psnr_db[i] = min(p, 99.0)
        # caption equality against regenerated ground truth: the
        # splitmix64/vocab math runs ONCE vectorized across all rows'
        # concatenated word slots (VERDICT r2 #4); only the join remains
        # per-row Python
        cap_len = 4 + (synth._u01(idx, 30) * 8).astype(np.int64)
        vocab = np.array(synth._VOCAB, dtype=object)
        offsets = np.cumsum(cap_len) - cap_len
        g_rep = np.repeat(idx.astype(np.uint64) * np.uint64(131), cap_len)
        slot = np.arange(int(cap_len.sum()), dtype=np.uint64) - np.repeat(
            offsets, cap_len
        ).astype(np.uint64)
        words = vocab[(synth._splitmix64(g_rep + slot) % len(vocab)).astype(np.int64)]
        caps = batch["caption"].to_numpy(zero_copy_only=False)
        cap_ok = np.fromiter(
            (
                caps[i] == " ".join(words[o : o + l])
                for i, (o, l) in enumerate(zip(offsets, cap_len))
            ),
            dtype=bool,
            count=len(idx),
        )
        valid = (psnr_db >= 40.0) & cap_ok
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "psnr_db": pa.array(psnr_db),
                "caption_ok": pa.array(cap_ok),
                "valid": pa.array(valid),
            }
        )

    return images.map_batches(_check, batch_format="pyarrow", batch_size=2048)


def tiling_pipeline(sf_dir_or_sf, out_dir: str, z: int = 8, **kw) -> dict:
    """Full flagship run; returns aggregate metrics."""
    images = read_images(sf_dir_or_sf, columns=LIGHT_COLUMNS)
    tiles = build_tiles(images, z=z, **kw)
    return write_tiles(tiles, out_dir, input_desc={"sf": str(sf_dir_or_sf), "z": z})
