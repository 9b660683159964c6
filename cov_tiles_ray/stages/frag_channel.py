"""Fragment side-channel for the pyramid's coarse-tile merge.

The pyramid exchange leaves tiles COARSER than a region's terminal plan
cell split across partitions.  The pure-Dataset merge (materialize ->
filter x2 -> repartition -> bounded sort -> map) is correct but pays a
serial tail of 5-7 tiny operator rounds AFTER the materialize barrier —
measured 2.6-4.3 s of a ~7 s sf0.1 wall at 32 CPUs, all driver-side
coordination for ~100 ms of merge compute (same-process A/B, see
BASELINE.md).

This module is the short path: encode tasks hand each fragment blob to
the object store (``ray.put(_owner=channel)`` — bytes stay spillable and
survive the worker; the actor owns only refs, never payload bytes, so its
heap stays O(#fragments), not O(fragment bytes)), and register
``(tile_id, src) -> ref`` with a zero-CPU channel actor.  Registration is
keyed, so a retried encode task overwrites with identical bytes instead
of duplicating (encode is deterministic).  The Dataset materialize that
the branch needed anyway doubles as the completion barrier: every encode
task acks its ``add`` before returning, so by the time the driver calls
``collect`` the channel has every fragment.  Merging then runs as a
handful of plain Ray tasks over sorted tile-id ranges, returned as Arrow
tables and unioned back via ``ray.data.from_arrow_refs`` — one task
round instead of five operator rounds.

Scale notes: a single coarse tile's fragments all land in ONE merge task
— the same unbounded-wide-group hazard the sort-path merge has
(SURVEY.md §7.5); the plan bounds fragmented-tile COUNT, not a hot
tile's row count.  The channel actor is per-pipeline-invocation (plain
handle, not named), dies with the driver's reference after the merge
tasks complete.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


@ray.remote(num_cpus=0)
class FragmentChannel:
    """Collects (tile_id, src_partition) -> fragment-blob ref during the
    encode wave.  num_cpus=0: it only shuffles refs, never bytes.

    One channel actor is CACHED per driver session (worker-process boot is
    ~1-2 s — on the critical path of a fresh pyramid otherwise), so state
    is scoped by a run id: each pipeline invocation calls ``begin_run``
    (which doubles as the actor-readiness barrier) and ``collect`` pops
    its run's entries, freeing the owned blob refs.  Concurrent pyramids
    get distinct run ids.  A run whose driver code crashes between
    begin_run and collect leaks its refs until the actor dies with the
    session — bounded and disclosed."""

    def __init__(self):
        self._runs: dict[int, dict[tuple[int, int], tuple["ray.ObjectRef", int]]] = {}
        self._next_run = 0

    def begin_run(self) -> int:
        self._next_run += 1
        self._runs[self._next_run] = {}
        return self._next_run

    def add(self, run_id: int, entries) -> int:
        """Register ``(tile_id, src, ref, n_rows)`` entries; idempotent per
        (tile_id, src) key.  The row count rides along so the merge
        scheduler can LPT-balance by actual load and route mega-tiles to
        the chunked encode without fetching any blob.

        ``add`` for a run already popped by ``collect`` is a NO-OP: an
        encode task re-executed by lineage reconstruction after the merge
        finished must not resurrect the run dict, or the actor would own
        those blob refs forever (unbounded cross-run object-store leak —
        ADVICE r2).  Unknown run ids (never begun) are likewise dropped."""
        frags = self._runs.get(run_id)
        if frags is None:
            return 0
        for tid, src, ref, n_rows in entries:
            frags[(int(tid), int(src))] = (ref, int(n_rows))
        return len(frags)

    def collect(self, run_id: int) -> dict:
        """tile_id -> (refs ordered by src partition, total rows)
        (deterministic; the merger re-sorts rows by fid anyway, so blob
        order is cosmetic).  Pops the run: the actor drops its refs so the
        blobs can be GC'd once the merge tasks finish with them."""
        groups: dict[int, tuple[list, int]] = {}
        for (tid, _src), (ref, nr) in sorted(
            self._runs.pop(run_id, {}).items(), key=lambda kv: kv[0]
        ):
            refs, rows = groups.get(tid, ([], 0))
            refs.append(ref)
            groups[tid] = (refs, rows + nr)
        return groups


@ray.remote
def merge_fragment_tiles(merger, tids, ref_lists, schema: pa.Schema) -> pa.Table:
    """Merge-encode a sorted range of fragmented tiles (one Ray task).

    ``merger`` is a RawFragmentMerger; the output table is cast to the
    whole-tile side's exact schema so the downstream union is seamless."""
    from .tile_encode import TileEncoder

    rows = []
    for tid, refs in zip(tids, ref_lists):
        blobs = ray.get(list(refs))
        rows.append(merger._merge_one(int(tid), blobs))
    cols = TileEncoder.rows_to_columns(rows)
    t = pa.table({k: pa.array(np.asarray(v)) for k, v in cols.items()})
    return t.select(schema.names).cast(schema)


@ray.remote
def split_tile_chunks(tid: int, refs, n_chunks: int, chunk_rows: int):
    """Assemble a fragmented mega-tile's fid-sorted row table ONCE and
    split it into encode-chunk inputs (flag-gated chunked merge, VERDICT
    r2 #1).  Called with ``options(num_returns=n_chunks + 1)``: returns
    one Arrow table per chunk plus the FULL tile's interleaved coords
    (chunk 0's whole-tile cells layer input).  Chunk boundaries depend
    only on the global fid order and chunk_rows, so the downstream bytes
    are deterministic under any fragmenting/cluster shape."""
    from .tile_encode import assemble_fragment_table

    blobs = ray.get(list(refs))
    t = assemble_fragment_table(blobs)
    outs = []
    for ci in range(n_chunks):
        s = ci * chunk_rows
        outs.append(t.slice(s, min(chunk_rows, t.num_rows - s)).combine_chunks())
    vb = np.empty(2 * t.num_rows, dtype=np.int64)
    vb[0::2] = t["loc_x"].to_numpy(zero_copy_only=False)
    vb[1::2] = t["loc_y"].to_numpy(zero_copy_only=False)
    return (*outs, vb)


@ray.remote
def encode_tile_chunk(merger, tid: int, ci: int, sub, full_vb):
    """Encode ONE fid-ordered chunk (an Arrow table from
    ``split_tile_chunks``).  Whole-tile derived layers (the cells
    occupancy grid) ride in chunk 0, built from ALL rows (``full_vb``),
    so the chunked tile decodes to exactly the same LayerData as an
    unchunked encode.

    Returns ``(ci, buf, n_features, plain_bytes, ok)``."""
    from ..tile import encode_tile
    from ..tile.batch_verify import verify_tiles
    from .tile_encode import (
        VERIFY_FULL_MOD,
        cells_layer_from_points,
        plain_columnar_bytes,
        table_to_layer,
        verify_tile_buf,
    )

    layer = table_to_layer(sub, merger.enc.extent)
    layers = [layer]
    if merger.enc.with_cells and full_vb is not None:
        layers.append(cells_layer_from_points(full_vb, merger.enc.extent))
    buf = encode_tile(layers, merger.enc.opts)
    # same verify policy as every other encode site: full LayerData
    # equality on the deterministic sample, batched structural decode else
    if tid % VERIFY_FULL_MOD == 0:
        ok = verify_tile_buf(buf, layer.num_features, expect_layers=layers, n_layers=len(layers))
    else:
        ok = bool(verify_tiles([buf], [layer.num_features], [len(layers)])[0])
    plain = sum(plain_columnar_bytes(ly) for ly in layers)
    return ci, buf, int(layer.num_features), int(plain), bool(ok)


def schedule_chunked_tile(merger, tid: int, refs, n_rows: int, chunk_rows: int, schema):
    """Fan one mega-tile across a split task + per-chunk encode tasks +
    one assemble task; returns the final 1-row-table ref."""
    n_chunks = -(-n_rows // chunk_rows)
    parts = split_tile_chunks.options(num_returns=n_chunks + 1).remote(
        tid, refs, n_chunks, chunk_rows
    )
    chunk_refs, vb_ref = parts[:-1], parts[-1]
    cparts = [
        encode_tile_chunk.remote(merger, tid, ci, sub, vb_ref if ci == 0 else None)
        for ci, sub in enumerate(chunk_refs)
    ]
    return assemble_chunked_tile.remote(merger, tid, schema, *cparts)


@ray.remote
def assemble_chunked_tile(merger, tid: int, schema: pa.Schema, *chunks) -> pa.Table:
    """Frame a mega-tile's chunk buffers into ONE chunked-tile output row
    (``chunks`` are the resolved encode_tile_chunk results).  Pure
    concatenation + framing — no encode work on this critical path."""
    from ..functions import codecs as C
    from ..model.format import CHUNKED_TILE_MARKER
    from .tile_encode import TileEncoder

    chunks = sorted(chunks)  # by chunk index
    bufs = [c[1] for c in chunks]
    head = C.encode_varint_scalar(CHUNKED_TILE_MARKER) + C.encode_varint_scalar(len(bufs))
    for b in bufs:
        head += C.encode_varint_scalar(len(b))
    frame = head + b"".join(bufs)
    n_layers = 2 if merger.enc.with_cells else 1  # layer count of the DECODED tile
    row = {
        "tile_id": int(tid),
        "z": int(tid) >> 58,
        "x": (int(tid) >> 29) & ((1 << 29) - 1),
        "y": int(tid) & ((1 << 29) - 1),
        "salt": 0,
        "n_features": sum(c[2] for c in chunks),
        "n_layers": n_layers,
        "covt": frame,
        "covt_bytes": len(frame),
        "plain_bytes": sum(c[3] for c in chunks),
        "roundtrip_ok": all(c[4] for c in chunks),
    }
    cols = TileEncoder.rows_to_columns([row])
    t = pa.table({k: pa.array(np.asarray(v)) for k, v in cols.items()})
    return t.select(schema.names).cast(schema)
