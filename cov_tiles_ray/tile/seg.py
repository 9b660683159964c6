"""Segmented (multi-tile) stream-encoding primitives.

The flagship pipeline encodes hundreds of thousands of TINY tiles (median
~5 features); the per-tile encoder pays numpy/Python fixed costs once per
stream per tile.  This module computes varint-family streams for EVERY tile
of a partition in one vectorized pass over the concatenated values, then
recovers each tile's stream bytes by slicing at value boundaries — legal
because every codec in the varint family emits per-value-independent bytes,
so ``encode(concat)`` == ``concat(encode(seg) for seg)`` (tests assert byte
identity against the per-tile encoder).

Inputs are ONE contiguous array holding many tile streams back-to-back plus
``starts`` (segment head indices); segment k spans ``[starts[k], starts[k+1])``
with a final implicit end.  Delta-family transforms restart their implicit 0
predecessor at every segment head, which reproduces the per-tile transforms
exactly (codecs.delta_encode / coord_delta_encode semantics).

For FastPFOR (the one block codec among the candidates) the encoded SIZE is
a closed-form function of the per-block bit-width histogram, so candidate
selection computes exact sizes for all segments vectorized and only segments
that WIN are actually encoded (the per-tile path encodes every candidate).

Reference parity: the per-stream argmin selection this feeds is the
reference's encoding-candidate rule (CovtConverter.java:561-568, 656-668,
911-919); this module changes how fast the same bytes are produced, not
which bytes.
"""

from __future__ import annotations

import numpy as np

from ..functions import codecs as C
from ..functions import fastpfor as F

I64 = np.int64
U64 = np.uint64


def seg_bounds(starts: np.ndarray, total: int) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) with the implicit final end appended."""
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = total
    return starts, ends


def seg_delta(v: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """codecs.delta_encode applied per segment (implicit 0 predecessor at
    each segment head; int64 wrap like the scalar path)."""
    v = np.ascontiguousarray(v, dtype=I64)
    out = np.empty_like(v)
    if len(v):
        np.subtract(v[1:], v[:-1], out=out[1:])
        out[starts] = v[starts]
    return out


def seg_coord_delta(x: np.ndarray, y: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """codecs.coord_delta_encode per segment; returns interleaved deltas
    [dx0, dy0, dx1, dy1, ...] (separate x / y predecessors, reset per
    segment)."""
    dx = seg_delta(x, starts)
    dy = seg_delta(y, starts)
    out = np.empty(2 * len(dx), dtype=I64)
    out[0::2] = dx
    out[1::2] = dy
    return out


class VarintStream:
    """One vectorized varint encode of a concatenated u64 array, sliceable
    at value boundaries.

    ``sizes``/``bounds`` are per-VALUE; callers map segment value ranges to
    byte ranges via ``seg_sizes`` / ``slice``.  The buffer is built lazily:
    candidate selection usually needs only sizes, and losing candidates are
    never materialized.
    """

    __slots__ = ("u", "sizes", "bounds", "_buf")

    def __init__(self, u: np.ndarray):
        self.u = np.ascontiguousarray(u, dtype=U64)
        self.sizes = C.varint_encoded_size(self.u)
        self.bounds = np.zeros(len(u) + 1, dtype=np.int64)
        np.cumsum(self.sizes, out=self.bounds[1:])
        self._buf: bytes | None = None

    def seg_sizes(self, vstarts: np.ndarray, vends: np.ndarray) -> np.ndarray:
        """Encoded byte length of each segment [vstarts[k], vends[k])."""
        return self.bounds[vends] - self.bounds[vstarts]

    @property
    def buf(self) -> bytes:
        if self._buf is None:
            self._buf = C.encode_varint(self.u)
        return self._buf

    def slice(self, vs: int, ve: int) -> bytes:
        return self.buf[self.bounds[vs] : self.bounds[ve]]


def zigzag_stream(v: np.ndarray) -> VarintStream:
    return VarintStream(C.zigzag_encode(np.ascontiguousarray(v, dtype=I64)))


def delta_zigzag_stream(v: np.ndarray, starts: np.ndarray) -> VarintStream:
    return VarintStream(C.zigzag_encode(seg_delta(v, starts)))


def choose(size_rows: list[np.ndarray]) -> np.ndarray:
    """Per-segment argmin over candidate encoded sizes; ties go to the
    candidate listed FIRST — identical to streams.best_encoding's strict-<
    replacement loop."""
    return np.argmin(np.vstack(size_rows), axis=0)


def seg_has_rle_run(v: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """True for segments where ORC RLE v1 would emit at least one run group:
    any 3 consecutive values with equal delta in [-128, 127].  Segments
    WITHOUT such a run encode as pure literal groups, which this module can
    batch; segments with runs fall back to the per-tile greedy encoder."""
    v = np.ascontiguousarray(v, dtype=I64)
    n = len(v)
    out = np.zeros(len(starts), dtype=bool)
    if n < 3:
        return out
    d = v[1:] - v[:-1]
    tri = (d[1:] == d[:-1]) & (d[1:] >= -128) & (d[1:] <= 127)
    # a triple starting at value index i uses deltas i, i+1 -> tri[i]
    # (len n-2); it lies inside a segment iff i >= start and i+2 <= end-1
    seg_of = np.searchsorted(starts, np.arange(n - 2), side="right") - 1
    valid = np.arange(n - 2) + 2 <= ends[seg_of] - 1
    hit = tri & valid
    np.maximum.at(out, seg_of[hit], True)
    return out


def literal_rle_sizes(zz_stream: VarintStream, vstarts, vends) -> np.ndarray:
    """Encoded size of a pure-literal RLE v1 segment of < 128 values:
    1 header byte + the zigzag varints."""
    return 1 + zz_stream.seg_sizes(vstarts, vends)


def literal_rle_bytes(zz_stream: VarintStream, vs: int, ve: int) -> bytes:
    """Pure-literal RLE v1 group (single group; caller guarantees the
    segment has < 128 values and no 3-length constant-delta run)."""
    return bytes([256 - (ve - vs)]) + zz_stream.slice(vs, ve)


# ---------------------------------------------------------------------------
# FastPFOR: exact per-segment encoded size without encoding
# ---------------------------------------------------------------------------


def fastpfor_seg_sizes(
    zz: np.ndarray, vstarts: np.ndarray, vends: np.ndarray
) -> np.ndarray:
    """Exact ``len(F.encode_fastpfor(zz[s:e]))`` for every segment, fully
    vectorized (mirrors the encoder's per-block width selection loop:
    fastpfor.py encode_fastpfor).  ``zz`` must already be the u32-range
    transformed values (zigzag of deltas)."""
    zz = np.ascontiguousarray(zz, dtype=np.uint32)
    nseg = len(vstarts)
    seg_len = (vends - vstarts).astype(np.int64)
    total = int(seg_len.sum())
    if total == 0:
        # encode of an empty array is just varint(0)
        return np.full(nseg, 1, dtype=np.int64)

    widths = F._bit_widths(zz)  # one pass for every value of every segment

    # block instances: segment k contributes ceil(len/128) blocks
    n_blocks = (seg_len + F.BLOCK - 1) // F.BLOCK
    n_blocks = np.maximum(n_blocks, 0)
    blk_base = np.zeros(nseg + 1, dtype=np.int64)
    np.cumsum(n_blocks, out=blk_base[1:])
    B = int(blk_base[-1])

    # per-value block id (values are contiguous per segment)
    val_seg = np.repeat(np.arange(nseg), seg_len)
    pos_in_seg = np.arange(total) - np.repeat(vstarts, seg_len)
    blk_of_val = blk_base[val_seg] + pos_in_seg // F.BLOCK

    blk_len = np.bincount(blk_of_val, minlength=B).astype(np.int64)
    hist = np.bincount(blk_of_val * 33 + widths, minlength=B * 33).reshape(B, 33)

    cols = np.arange(33)
    maxw = np.max(np.where(hist > 0, cols[None, :], -1), axis=1)
    maxw = np.maximum(maxw, 0)  # empty blocks can't occur; all-zero -> 0
    cum = np.cumsum(hist, axis=1)
    wider = blk_len[:, None] - cum  # wider[:, b] = #widths > b

    # encoder's candidate cost for b in [0, maxw): packed + 2 + n_exc * 3
    cost = (blk_len[:, None] * cols[None, :] + 7) // 8 + 2 + wider * 3
    invalid = cols[None, :] >= maxw[:, None]
    cost = np.where(invalid, np.int64(1) << 40, cost)
    base_cost = (blk_len * maxw + 7) // 8 + 2
    mn = cost.min(axis=1)
    arg = np.argmin(cost, axis=1)  # first (lowest b) min — matches the loop
    best_b = np.where(mn < base_cost, arg, maxw)

    # exact emitted size: 2 + packed + n_exc pos bytes + actual high varints
    n_exc = np.take_along_axis(wider, best_b[:, None], axis=1)[:, 0]
    exc_mask = widths > best_b[blk_of_val]
    high = (zz[exc_mask] >> best_b[blk_of_val][exc_mask].astype(np.uint32)).astype(U64)
    high_sz = C.varint_encoded_size(high)
    high_per_blk = np.bincount(
        blk_of_val[exc_mask], weights=high_sz.astype(np.float64), minlength=B
    ).astype(np.int64)
    blk_size = 2 + (blk_len * best_b + 7) // 8 + n_exc + high_per_blk

    per_seg = np.add.reduceat(blk_size, blk_base[:-1]) if B else np.zeros(nseg, np.int64)
    # segments with zero blocks (empty) would corrupt reduceat; caller
    # guarantees non-empty segments (tiles always have >= 1 feature)
    head = C.varint_encoded_size(seg_len.view(U64))
    return per_seg + head
