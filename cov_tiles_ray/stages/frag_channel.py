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
        self._runs: dict[int, dict[tuple[int, int], "ray.ObjectRef"]] = {}
        self._next_run = 0

    def begin_run(self) -> int:
        self._next_run += 1
        self._runs[self._next_run] = {}
        return self._next_run

    def add(self, run_id: int, entries) -> int:
        """Register fragment refs; idempotent per (tile_id, src) key.

        ``add`` for a run already popped by ``collect`` is a NO-OP: an
        encode task re-executed by lineage reconstruction after the merge
        finished must not resurrect the run dict, or the actor would own
        those blob refs forever (unbounded cross-run object-store leak —
        ADVICE r2).  Unknown run ids (never begun) are likewise dropped."""
        frags = self._runs.get(run_id)
        if frags is None:
            return 0
        for tid, src, ref in entries:
            frags[(int(tid), int(src))] = ref
        return len(frags)

    def collect(self, run_id: int) -> dict:
        """tile_id -> [refs ordered by src partition] (deterministic; the
        merger re-sorts rows by fid anyway, so blob order is cosmetic).
        Pops the run: the actor drops its refs so the blobs can be GC'd
        once the merge tasks finish with them."""
        groups: dict[int, list] = {}
        for (tid, _src), ref in sorted(self._runs.pop(run_id, {}).items(), key=lambda kv: kv[0]):
            groups.setdefault(tid, []).append(ref)
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
