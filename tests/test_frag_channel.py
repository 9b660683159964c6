"""FragmentChannel actor contract: retry idempotency, run isolation, and
collect-pops-the-run (stages/frag_channel.py)."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def channel(ray_session):
    from cov_tiles_ray.stages.frag_channel import FragmentChannel

    return FragmentChannel.remote()


def test_add_is_idempotent_per_key(channel, ray_session):
    import ray

    run = ray.get(channel.begin_run.remote())
    r1 = ray.put(b"blob-first")
    r2 = ray.put(b"blob-retry")
    ray.get(channel.add.remote(run, [(7, 3, r1, 10)]))
    ray.get(channel.add.remote(run, [(7, 3, r2, 10)]))  # same (tile, src): retry
    groups = ray.get(channel.collect.remote(run))
    refs, rows = groups[7]
    assert list(groups) == [7] and len(refs) == 1 and rows == 10
    assert ray.get(refs[0]) == b"blob-retry"  # last registration wins


def test_runs_are_isolated_and_popped(channel, ray_session):
    import ray

    ra = ray.get(channel.begin_run.remote())
    rb = ray.get(channel.begin_run.remote())
    assert ra != rb
    ray.get(channel.add.remote(ra, [(1, 0, ray.put(b"a0"), 3), (1, 1, ray.put(b"a1"), 4)]))
    ray.get(channel.add.remote(rb, [(1, 0, ray.put(b"b0"), 5)]))
    ga = ray.get(channel.collect.remote(ra))
    assert [ray.get(r) for r in ga[1][0]] == [b"a0", b"a1"]  # src order
    assert ga[1][1] == 7  # row counts summed
    # run A is popped; run B untouched
    assert ray.get(channel.collect.remote(ra)) == {}
    gb = ray.get(channel.collect.remote(rb))
    assert [ray.get(r) for r in gb[1][0]] == [b"b0"] and gb[1][1] == 5


def test_add_after_collect_is_noop(channel, ray_session):
    """A lineage-reconstructed encode task re-running add() after collect()
    popped the run must NOT resurrect the run dict (the actor would own the
    blob refs forever — ADVICE r2)."""
    import ray

    run = ray.get(channel.begin_run.remote())
    ray.get(channel.add.remote(run, [(1, 0, ray.put(b"x"), 1)]))
    ray.get(channel.collect.remote(run))
    # late retry of the same run: dropped, not resurrected
    assert ray.get(channel.add.remote(run, [(1, 0, ray.put(b"late"), 1)])) == 0
    assert ray.get(channel.collect.remote(run)) == {}
    # a run id that was never begun is likewise dropped
    assert ray.get(channel.add.remote(9999, [(1, 0, ray.put(b"z"), 1)])) == 0
    assert ray.get(channel.collect.remote(9999)) == {}


def test_merge_task_casts_to_whole_side_schema(ray_session):
    import ray

    from cov_tiles_ray.stages.frag_channel import merge_fragment_tiles
    from cov_tiles_ray.stages.tile_encode import RawFragmentMerger, fragment_ipc_bytes
    from cov_tiles_ray.tile import EncodeOptions

    n = 40
    t = pa.table(
        {
            "fid": pa.array(np.arange(n, dtype=np.int64)),
            "loc_x": pa.array(np.arange(n, dtype=np.int64) % 4096),
            "loc_y": pa.array((np.arange(n, dtype=np.int64) * 7) % 4096),
            "caption": pa.array([f"c {i % 5}" for i in range(n)]),
            "fmt": pa.array(["ppm"] * n),
            "phash": pa.array(np.arange(n, dtype=np.int64) * 11),
        }
    )
    blobs = [fragment_ipc_bytes(t.slice(0, 20)), fragment_ipc_bytes(t.slice(20, 20))]
    tid = (4 << 58) | (1 << 29) | 2
    schema = pa.schema(
        [
            ("tile_id", pa.int64()), ("z", pa.int32()), ("x", pa.int32()),
            ("y", pa.int32()), ("salt", pa.int64()), ("n_features", pa.int64()),
            ("n_layers", pa.int32()), ("covt", pa.binary()),
            ("covt_bytes", pa.int64()), ("plain_bytes", pa.int64()),
            ("roundtrip_ok", pa.bool_()),
        ]
    )
    merger = RawFragmentMerger(EncodeOptions(), 4096, with_cells=False)
    refs = [ray.put(b) for b in blobs]
    out = ray.get(merge_fragment_tiles.remote(merger, [tid], [refs], schema))
    assert out.schema == schema
    assert out.num_rows == 1 and out["n_features"][0].as_py() == n
    assert out["roundtrip_ok"][0].as_py()
