"""Byte-identity of the segmented primitives vs the per-tile codecs."""

import numpy as np
import pytest

from cov_tiles_ray.functions import codecs as C
from cov_tiles_ray.functions import fastpfor as F
from cov_tiles_ray.tile import seg


def _segments(rng, nseg, lo=1, hi=40):
    lens = rng.integers(lo, hi, nseg)
    starts = np.zeros(nseg, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    total = int(lens.sum())
    return starts, starts + lens, total


def test_seg_delta_matches_per_segment():
    rng = np.random.default_rng(1)
    starts, ends, total = _segments(rng, 50)
    v = rng.integers(-(2**40), 2**40, total)
    d = seg.seg_delta(v, starts)
    for s, e in zip(starts, ends):
        np.testing.assert_array_equal(d[s:e], C.delta_encode(v[s:e]))


def test_varint_stream_slices_match_encode_varint():
    rng = np.random.default_rng(2)
    starts, ends, total = _segments(rng, 60)
    u = rng.integers(0, 2**63, total).astype(np.uint64)
    u[rng.integers(0, total, 30)] = 0  # single-byte values mixed in
    vs = seg.VarintStream(u)
    for s, e in zip(starts, ends):
        assert vs.slice(s, e) == C.encode_varint(u[s:e])
        assert vs.seg_sizes(np.array([s]), np.array([e]))[0] == len(
            C.encode_varint(u[s:e])
        )


def test_delta_zigzag_stream_matches_composite():
    rng = np.random.default_rng(3)
    # include tiny (<=16, scalar path) and large (>16, vector path) segments
    starts, ends, total = _segments(rng, 40, lo=1, hi=60)
    v = rng.integers(-(2**31), 2**31, total)
    st = seg.delta_zigzag_stream(v, starts)
    for s, e in zip(starts, ends):
        assert st.slice(s, e) == C.encode_varint_delta_zigzag(v[s:e])


def test_coord_delta_matches_composite():
    rng = np.random.default_rng(4)
    starts, ends, total = _segments(rng, 40, lo=1, hi=50)
    x = rng.integers(0, 4096, total)
    y = rng.integers(0, 4096, total)
    inter = seg.seg_coord_delta(x, y, starts)
    st = seg.VarintStream(C.zigzag_encode(inter))
    for s, e in zip(starts, ends):
        xy = np.empty(2 * (e - s), dtype=np.int64)
        xy[0::2], xy[1::2] = x[s:e], y[s:e]
        assert st.slice(2 * s, 2 * e) == C.encode_varint_coord_delta_zigzag(xy)


def test_zigzag_stream_matches_composite():
    rng = np.random.default_rng(5)
    starts, ends, total = _segments(rng, 30)
    v = rng.integers(-(2**62), 2**62, total)
    st = seg.zigzag_stream(v)
    for s, e in zip(starts, ends):
        assert st.slice(s, e) == C.encode_varint_zigzag(v[s:e])


@pytest.mark.parametrize("case", ["small", "blocky", "zeros", "outliers"])
def test_fastpfor_seg_sizes_exact(case):
    rng = np.random.default_rng(hash(case) % 2**32)
    if case == "small":
        starts, ends, total = _segments(rng, 60, lo=1, hi=120)
        zz = rng.integers(0, 2**12, total).astype(np.uint32)
    elif case == "blocky":
        starts, ends, total = _segments(rng, 20, lo=100, hi=400)
        zz = rng.integers(0, 2**16, total).astype(np.uint32)
    elif case == "zeros":
        starts, ends, total = _segments(rng, 30, lo=1, hi=200)
        zz = np.zeros(total, dtype=np.uint32)
    else:
        starts, ends, total = _segments(rng, 30, lo=50, hi=300)
        zz = rng.integers(0, 2**6, total).astype(np.uint32)
        idx = rng.integers(0, total, total // 20)
        zz[idx] = rng.integers(2**20, 2**31, len(idx)).astype(np.uint32)
    sizes = seg.fastpfor_seg_sizes(zz, starts, ends)
    for k, (s, e) in enumerate(zip(starts, ends)):
        assert sizes[k] == len(F.encode_fastpfor(zz[s:e])), (case, k, e - s)


def test_seg_has_rle_run_brute_force():
    rng = np.random.default_rng(7)
    starts, ends, total = _segments(rng, 80, lo=1, hi=12)
    v = rng.integers(0, 6, total)  # small alphabet: runs happen
    got = seg.seg_has_rle_run(v, starts, ends)
    for k, (s, e) in enumerate(zip(starts, ends)):
        w = v[s:e]
        brute = any(
            w[i + 2] - w[i + 1] == w[i + 1] - w[i] and -128 <= w[i + 1] - w[i] <= 127
            for i in range(len(w) - 2)
        )
        assert got[k] == brute, (k, w.tolist())


def test_literal_rle_matches_encoder_when_run_free():
    rng = np.random.default_rng(8)
    starts, ends, total = _segments(rng, 120, lo=1, hi=25)
    v = rng.integers(0, 2**20, total)
    has_run = seg.seg_has_rle_run(v, starts, ends)
    zz = seg.zigzag_stream(v)
    checked = 0
    for k, (s, e) in enumerate(zip(starts, ends)):
        if has_run[k]:
            continue
        assert seg.literal_rle_bytes(zz, s, e) == C.encode_rle_v1(v[s:e], signed=True)
        assert seg.literal_rle_sizes(zz, np.array([s]), np.array([e]))[0] == len(
            C.encode_rle_v1(v[s:e], signed=True)
        )
        checked += 1
    assert checked > 20  # the generator must actually exercise the path
