"""Property tests for the r5 part-exchange kernels' tricky semantics —
tie handling, segment boundaries and the segment-composite searchsorted —
against brute-force references on adversarial shapes the driver corpora
don't produce (duplicate timestamps, singleton users, empty sides).

The kernels run in-process on synthetic arrow parts (they are plain
functions over pa.Table), so no Ray execution is involved.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _events_tables(draw_uid, draw_t, n):
    uid = np.array(draw_uid, np.int64)[:n]
    t = np.array(draw_t, np.int64)[:n]
    return uid, t


@settings(max_examples=60, deadline=None)
@given(
    uid=st.lists(st.integers(0, 5), min_size=1, max_size=60),
    toff=st.lists(st.integers(0, 10_000_000_000), min_size=1, max_size=60),
)
def test_range_join_part_kernel_matches_bruteforce(uid, toff, ray_session):
    """follow count = same-user events in (t, t+W] — duplicate timestamps
    within a user must all see identical counts (the side='right' pair)."""
    from cov_tiles_ray.pipelines.queries import _FOLLOW_WINDOW_US, q_range_join_followups

    n = min(len(uid), len(toff))
    uid_a, t_a = _events_tables(uid, toff, n)
    eid = np.arange(n, dtype=np.int64)
    tmp = "/tmp/r5_prop_range"
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(uid_a),
                "ts": pa.array(t_a.astype("datetime64[us]")),
            }
        ),
        f"{tmp}/events.parquet",
    )
    got = (
        q_range_join_followups(tmp)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    want = np.array(
        [
            int(((uid_a == uid_a[i]) & (t_a > t_a[i]) & (t_a <= t_a[i] + _FOLLOW_WINDOW_US)).sum())
            for i in range(n)
        ],
        np.int64,
    )
    np.testing.assert_array_equal(got["n_follow"].to_numpy(np.int64), want)


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(st.integers(0, 4), min_size=0, max_size=40),
    ts=st.lists(st.integers(0, 50), min_size=0, max_size=40),
    sides=st.lists(st.booleans(), min_size=0, max_size=40),
)
def test_asof_composite_matches_per_group_kernel(keys, ts, sides, ray_session):
    """The segment-composite as-of merge must equal _asof_group run per
    key — including equal-t ties (greatest rid wins) and keys with no
    orders at-or-before (masked, not matched to a foreign segment)."""
    from cov_tiles_ray.pipelines.queries import _asof_group

    n = min(len(keys), len(ts), len(sides))
    if n == 0:
        return
    df = pd.DataFrame(
        {
            "key": np.array(keys[:n], np.int64),
            "t": np.array(ts[:n], np.int64),
            "rid": np.arange(n, dtype=np.int64),
            "side": np.array(sides[:n], np.int64),
        }
    )
    want = (
        pd.concat(
            [_asof_group(g) for _, g in df.groupby("key", sort=False)], ignore_index=True
        )
        .sort_values("event_id", ignore_index=True)
        if len(df)
        else pd.DataFrame()
    )

    # run the composite kernel the same way asof_part does
    key = df["key"].to_numpy()
    t = df["t"].to_numpy()
    rid = df["rid"].to_numpy()
    side = df["side"].to_numpy()
    _uk, rank = np.unique(key, return_inverse=True)
    t0 = t.min()
    span = int(t.max()) - int(t0) + 2
    comp = rank.astype(np.int64) * np.int64(span) + (t - t0)
    om = side == 1
    oc, oid, orank = comp[om], rid[om], rank[om]
    o_order = np.lexsort((oid, oc))
    oc, oid, orank = oc[o_order], oid[o_order], orank[o_order]
    ot = t[om][o_order]
    ec, eid, erank = comp[~om], rid[~om], rank[~om]
    if len(oc) == 0 or len(ec) == 0:
        assert len(want) == 0
        return
    idx = np.searchsorted(oc, ec, side="right") - 1
    m = (idx >= 0) & (orank[np.maximum(idx, 0)] == erank)
    got = pd.DataFrame(
        {
            "event_id": eid[m].astype(np.int64),
            "order_key": oid[idx[m]].astype(np.int64),
            "order_day": ot[idx[m]].astype(np.int64),
        }
    ).sort_values("event_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, want.astype(np.int64), check_dtype=False)


@settings(max_examples=60, deadline=None)
@given(
    cust=st.lists(st.integers(0, 5), min_size=1, max_size=50),
    day=st.lists(st.integers(0, 20), min_size=1, max_size=50),
    cents=st.lists(st.integers(-1000, 1000), min_size=1, max_size=50),
)
def test_running_totals_segment_cumsum_matches_per_group(cust, day, cents, ray_session):
    """The part kernel's global-cumsum-minus-base must equal the per-group
    _running_group on every segment, including ties on (day, orderkey)."""
    from cov_tiles_ray.pipelines.queries import _running_group

    n = min(len(cust), len(day), len(cents))
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.array(cust[:n], np.int64),
            "day": np.array(day[:n], np.int64),
            "cents": np.array(cents[:n], np.int64),
        }
    )
    want = (
        pd.concat([_running_group(g) for _, g in df.groupby("o_custkey", sort=False)])
        .sort_values(["o_custkey", "rn"], ignore_index=True)
    )

    # replicate run_part's kernel
    c = df["o_custkey"].to_numpy()
    d = df["day"].to_numpy()
    k = df["o_orderkey"].to_numpy()
    v = df["cents"].to_numpy()
    order = np.lexsort((k, d, c))
    c, d, k, v = c[order], d[order], k[order], v[order]
    new = np.r_[True, c[1:] != c[:-1]]
    starts = np.flatnonzero(new)
    seg_len = np.diff(np.r_[starts, n])
    run = np.cumsum(v)
    base = np.repeat(np.r_[np.int64(0), run[starts[1:] - 1]], seg_len)
    rn = np.arange(n, dtype=np.int64) - np.repeat(starts, seg_len) + 1
    got = pd.DataFrame(
        {
            "o_orderkey": k,
            "o_custkey": c,
            "rn": rn,
            "run_cents": (run - base).astype(np.int64),
        }
    ).sort_values(["o_custkey", "rn"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
