"""Stream codecs for the COVT-R column-stream format.

Clean-room numpy implementations of the codec family used by the reference
(springmeyer/cov-tiles):

* base-128 varint         (ref: EncodingUtils.java:39-55, DecodingUtils.java:35-44)
* zigzag 32/64            (ref: EncodingUtils.java:57-71)
* delta / coordinate-delta (ref: EncodingUtils.java:73-93,190-211)
* ORC RLE v1 for ints     (framing spec: parser/js/src/decoder/decodingUtils.ts:230-265
                           — run header <=0x7f: numRuns = header+3, int8 delta, varint
                           base; literal header >0x7f: 256-header varints)
* ORC byte RLE v1         (ref: decodingUtils.ts:373-401)
* boolean RLE             (LSB-first bitset + byte RLE; ref: EncodingUtils.java:213-230,
                           isBitSet decodingUtils.ts:404-409)
* IEEE754 float32 LE      (ref: EncodingUtils.java:30-36)
* length-prefixed UTF-8   (ref: EncodingUtils.java:116-120)

All encoders take numpy arrays and return ``bytes``; all decoders take a
buffer + count (+offset) and return ``(ndarray, new_offset)``.  Encoders are
vectorized (no per-value Python loops on the hot path): varint via
repeat/cumsum scatter, RLE via constant-delta segment detection.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

U64 = np.uint64
I64 = np.int64

_SEVEN = U64(7)
_LOW7 = U64(0x7F)
_ONE = U64(1)

# ---------------------------------------------------------------------------
# varint (base-128, protobuf convention)
# ---------------------------------------------------------------------------


def varint_encoded_size(values: np.ndarray) -> np.ndarray:
    """Per-value encoded byte length (1..10) for uint64 input."""
    v = np.ascontiguousarray(values, dtype=U64)
    nbytes = np.ones(len(v), dtype=np.int64)
    if len(v) == 0:
        return nbytes
    vmax = int(v.max())
    for k in range(1, 10):
        if vmax < (1 << (7 * k)):
            break
        nbytes += v >= U64(1 << (7 * k))
    return nbytes


_VARINT_1B = [bytes((i,)) for i in range(128)]


def encode_varint_scalar(value: int) -> bytes:
    if 0 <= value < 128:  # single-byte fast path (most metadata varints)
        return _VARINT_1B[value]
    return _encode_varint_scalar_slow(value)


def _encode_varint_scalar_slow(value: int) -> bytes:
    """Single-value varint (python-int fast path for metadata framing)."""
    out = bytearray()
    v = int(value)
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


# below this length, python-int loops beat the numpy kernel chain (fixed
# per-call numpy overhead dominates tiny tile streams — the flagship's
# median tile has ~5 features)
_SCALAR_N = 16


_U64_MASK = 0xFFFFFFFFFFFFFFFF
_S63 = 1 << 63


def _append_varint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def encode_varint(values: np.ndarray) -> bytes:
    """Vectorized base-128 varint encode of a uint64 array."""
    v = np.ascontiguousarray(values, dtype=U64)
    n = len(v)
    if n == 0:
        return b""
    if n <= _SCALAR_N:  # scalar fast path (metadata descriptors, tiny streams)
        out = bytearray()
        for x in v.tolist():
            _append_varint(out, x)
        return bytes(out)
    if int(v.max()) < 0x80:  # all single-byte
        return v.astype(np.uint8).tobytes()
    nbytes = varint_encoded_size(v)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    vi = np.repeat(np.arange(n), nbytes)
    bpos = (np.arange(total) - np.repeat(starts, nbytes)).astype(U64)
    chunk = ((v[vi] >> (bpos * _SEVEN)) & _LOW7).astype(np.uint8)
    cont = bpos < (nbytes[vi] - 1).astype(U64)
    out = chunk | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def read_varint_py(buf, pos: int) -> tuple[int, int]:
    """Scalar varint read -> (python int, new pos).  Fastest on ``bytes``
    /``memoryview`` input (indexing yields ints directly); ndarray input
    falls back to numpy scalar extraction."""
    if isinstance(buf, np.ndarray):
        val = 0
        shift = 0
        while True:
            byte = int(buf[pos])
            pos += 1
            val |= (byte & 0x7F) << shift
            if byte < 0x80:
                return val & _U64_MASK, pos
            shift += 7
    val = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        val |= (byte & 0x7F) << shift
        if byte < 0x80:
            return val & _U64_MASK, pos
        shift += 7


def _as_u8(buf) -> np.ndarray:
    if isinstance(buf, np.ndarray):
        return buf
    return np.frombuffer(buf, dtype=np.uint8)


def _decode_varint_scalars(buf, n: int, offset: int) -> tuple[list[int], int]:
    """n varints as PYTHON ints (tiny-stream path: no numpy kernels).
    Fastest on ``bytes`` input; ndarray falls back to numpy indexing."""
    bb = buf
    np_input = isinstance(bb, np.ndarray)
    pos = offset
    vals = []
    for _ in range(n):
        val = 0
        shift = 0
        while True:
            byte = int(bb[pos]) if np_input else bb[pos]
            pos += 1
            val |= (byte & 0x7F) << shift
            if byte < 0x80:
                break
            shift += 7
        vals.append(val & _U64_MASK)
    return vals, pos


def decode_varint(buf: bytes | np.ndarray, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    """Vectorized varint decode of ``n`` uint64 values starting at ``offset``."""
    if n == 0:
        return np.empty(0, dtype=U64), offset
    if n <= _SCALAR_N:  # scalar fast path (metadata descriptors, tiny streams)
        vals, pos = _decode_varint_scalars(buf, n, offset)
        return np.array(vals, dtype=U64), pos
    b = _as_u8(buf)[offset:]
    # only need at most 10*n bytes
    b = b[: 10 * n]
    term = (b & 0x80) == 0
    term_idx = np.flatnonzero(term)
    if len(term_idx) < n:
        raise ValueError("varint stream truncated")
    end = int(term_idx[n - 1]) + 1
    b = b[:end]
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = term_idx[: n - 1] + 1
    counts = np.empty(n, dtype=np.int64)
    counts[:-1] = np.diff(starts)
    counts[-1] = end - starts[-1]
    bpos = (np.arange(end) - np.repeat(starts, counts)).astype(U64)
    contrib = (b.astype(U64) & _LOW7) << (bpos * _SEVEN)
    vals = np.add.reduceat(contrib, starts)
    return vals, offset + end


# ---------------------------------------------------------------------------
# zigzag
# ---------------------------------------------------------------------------


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag: (v << 1) ^ (v >> 63)."""
    v = np.ascontiguousarray(values, dtype=I64)
    u = v.view(U64)
    return (u << _ONE) ^ (v >> np.int64(63)).view(U64)


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """uint64 zigzag -> int64: (u >> 1) ^ -(u & 1)."""
    u = np.ascontiguousarray(values, dtype=U64)
    return ((u >> _ONE) ^ (U64(0) - (u & _ONE))).view(I64)


# ---------------------------------------------------------------------------
# delta
# ---------------------------------------------------------------------------


def delta_encode(values: np.ndarray) -> np.ndarray:
    """Running delta with implicit 0 predecessor (int64 out, wrapping)."""
    v = np.ascontiguousarray(values).astype(I64, copy=False)
    out = np.empty_like(v)
    out[0:1] = v[0:1]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    v = np.ascontiguousarray(deltas).astype(I64, copy=False)
    return np.cumsum(v, dtype=I64)


def coord_delta_encode(xy_interleaved: np.ndarray) -> np.ndarray:
    """Interleaved coordinate delta: separate x and y predecessors.

    Mirrors the reference's vertex-buffer encoding
    (EncodingUtils.encodeZigZagDeltaCoordinates, EncodingUtils.java:190-211):
    input [x0,y0,x1,y1,...] -> [x0,y0,x1-x0,y1-y0,...].
    """
    v = np.ascontiguousarray(xy_interleaved).astype(I64, copy=False)
    out = np.empty_like(v)
    out[:2] = v[:2]
    np.subtract(v[2:], v[:-2], out=out[2:])
    return out


def coord_delta_decode(deltas: np.ndarray) -> np.ndarray:
    v = np.ascontiguousarray(deltas).astype(I64, copy=False)
    out = v.reshape(-1, 2).cumsum(axis=0, dtype=I64)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# composite helpers (the combinations the format actually uses)
# ---------------------------------------------------------------------------


def encode_varint_zigzag(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=I64)
    if len(v) <= _SCALAR_N:  # python-int loop: one pass, no numpy kernels
        out = bytearray()
        for x in v.tolist():
            _append_varint(out, ((x << 1) ^ (x >> 63)) & _U64_MASK)
        return bytes(out)
    return encode_varint(zigzag_encode(v))


def decode_varint_zigzag(buf, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    if 0 < n <= _SCALAR_N:
        vals, off = _decode_varint_scalars(buf, n, offset)
        return np.array([(u >> 1) ^ -(u & 1) for u in vals], dtype=I64), off
    u, off = decode_varint(buf, n, offset)
    return zigzag_decode(u), off


def encode_varint_delta_zigzag(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values).astype(I64, copy=False)
    if len(v) <= _SCALAR_N:
        out = bytearray()
        prev = 0
        for x in v.tolist():
            d = ((x - prev + _S63) & _U64_MASK) - _S63  # int64 wrap
            prev = x
            _append_varint(out, ((d << 1) ^ (d >> 63)) & _U64_MASK)
        return bytes(out)
    return encode_varint(zigzag_encode(delta_encode(v)))


def decode_varint_delta_zigzag(buf, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    if 0 < n <= _SCALAR_N:
        vals, off = _decode_varint_scalars(buf, n, offset)
        out = []
        acc = 0
        for u in vals:
            acc = ((acc + ((u >> 1) ^ -(u & 1)) + _S63) & _U64_MASK) - _S63  # int64 wrap
            out.append(acc)
        return np.array(out, dtype=I64), off
    u, off = decode_varint(buf, n, offset)
    return delta_decode(zigzag_decode(u)), off


def encode_varint_coord_delta_zigzag(xy: np.ndarray) -> bytes:
    v = np.ascontiguousarray(xy).astype(I64, copy=False)
    if len(v) <= 2 * _SCALAR_N:
        out = bytearray()
        px = py = 0
        it = iter(v.tolist())
        for x in it:
            y = next(it)
            dx = ((x - px + _S63) & _U64_MASK) - _S63  # int64 wrap
            dy = ((y - py + _S63) & _U64_MASK) - _S63
            px, py = x, y
            _append_varint(out, ((dx << 1) ^ (dx >> 63)) & _U64_MASK)
            _append_varint(out, ((dy << 1) ^ (dy >> 63)) & _U64_MASK)
        return bytes(out)
    return encode_varint(zigzag_encode(coord_delta_encode(v)))


def decode_varint_coord_delta_zigzag(buf, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    if 0 < n <= 2 * _SCALAR_N:
        vals, off = _decode_varint_scalars(buf, n, offset)
        out = []
        px = py = 0
        for i in range(0, n, 2):
            ux, uy = vals[i], vals[i + 1]
            px = ((px + ((ux >> 1) ^ -(ux & 1)) + _S63) & _U64_MASK) - _S63  # int64 wrap
            py = ((py + ((uy >> 1) ^ -(uy & 1)) + _S63) & _U64_MASK) - _S63
            out.append(px)
            out.append(py)
        return np.array(out, dtype=I64), off
    u, off = decode_varint(buf, n, offset)
    return coord_delta_decode(zigzag_decode(u)), off


# ---------------------------------------------------------------------------
# ORC RLE v1 (int)
# ---------------------------------------------------------------------------

_MIN_RUN = 3
_MAX_RUN = 130  # header <= 0x7f -> numRuns = header + 3
_MAX_LITERALS = 128  # header > 0x7f -> numLiterals = 256 - header


@lru_cache(maxsize=8192)
def _const_rle_v1(val: int, n: int, signed: bool) -> bytes:
    """RLE v1 of a constant array — byte-identical to the greedy path:
    delta-0 runs of <=130, any 1-2 value remainder as a literal group."""
    u = ((val << 1) ^ (val >> 63)) & _U64_MASK if signed else val & _U64_MASK
    vb = encode_varint_scalar(u)
    out = bytearray()
    span = n
    if span >= _MIN_RUN:
        while span >= _MIN_RUN:
            take = min(span, _MAX_RUN)
            out += bytes([take - 3, 0])
            out += vb
            span -= take
    if span:
        out.append(256 - span)
        out += vb * span
    return bytes(out)


def encode_rle_v1(values: np.ndarray, signed: bool) -> bytes:
    """ORC-style RLE v1 encode (framing per decodingUtils.ts:230-265).

    Greedy left-to-right maximal fixed-delta runs (delta in int8, length
    3..130) become run groups; everything else accumulates into literal
    groups of <=128 varints.  ``signed`` selects zigzag varints for base /
    literal values (the delta byte is raw int8 either way), matching the
    reference's Int64 vs Uint32 RLE variants.

    Large inputs take a two-pass path: the greedy segmentation loop records
    plain-int group descriptors only, then ALL literal values and ALL run
    bases are varint-encoded in one vectorized pass each and spliced into
    the output with a repeat/cumsum scatter.  (A per-group encode_varint
    call carries ~90us of numpy fixed cost; run-fragmented 100k-value
    streams produce thousands of groups, which made this kernel the single
    hottest line of the tile encode stage.)  Byte output is identical to
    the scalar path.
    """
    v = np.ascontiguousarray(values).astype(I64, copy=False)
    n = len(v)
    if n == 0:
        return b""
    # constant arrays (all-1 part_offsets, all-4 ring_offsets, zero salts —
    # the flagship's every-tile topology streams) hit a cached scalar
    # emitter: the greedy machinery costs ~50us of numpy fixed overhead per
    # call on tiny streams for a byte-identical result
    if (n <= 4 and v[0] == v[-1] and (n < 3 or (v[1] == v[0] and v[2] == v[0]))) or (
        n > 4 and (v[0] == v).all()
    ):
        return _const_rle_v1(int(v[0]), n, signed)
    if n <= 32:
        # scalar greedy for small non-constant streams (dictionary LENGTH
        # streams of few-feature tiles): byte-identical to the numpy greedy
        # below at a fraction of its fixed cost (re-measured with the
        # segmented batch encoder: the numpy greedy's ~60us fixed cost vs
        # ~1.5us/value scalar loop puts the break-even past 32 values)
        vals = v.tolist()
        parts: list[bytes] = []
        lit: list[int] = []

        def _flush_lit() -> None:
            if lit:
                parts.append(bytes([256 - len(lit)]))
                for x in lit:
                    u = ((x << 1) ^ (x >> 63)) & _U64_MASK if signed else x & _U64_MASK
                    parts.append(encode_varint_scalar(u))
                lit.clear()

        i = 0
        while i < n:
            j = i + 1
            d = 0
            if j < n:
                d = vals[j] - vals[i]
                while j + 1 < n and vals[j + 1] - vals[j] == d:
                    j += 1
            span = j - i + 1 if j < n else 1
            if span >= _MIN_RUN and -128 <= d <= 127:
                _flush_lit()
                x = vals[i]
                u = ((x << 1) ^ (x >> 63)) & _U64_MASK if signed else x & _U64_MASK
                parts.append(bytes([span - 3, d & 0xFF]) + encode_varint_scalar(u))
                i += span
            else:
                lit.append(vals[i])
                i += 1
        _flush_lit()
        return b"".join(parts)
    if n > 64:
        return _encode_rle_v1_vec(v, signed)

    def emit_values(vals: np.ndarray) -> bytes:
        if signed:
            return encode_varint(zigzag_encode(vals))
        return encode_varint(vals.view(U64))

    parts: list[bytes] = []

    def emit_literals(vals: np.ndarray) -> None:
        # one vectorized varint pass for the whole literal stretch; 128-value
        # group headers spliced in by byte-offset slicing (a per-chunk
        # encode_varint loop dominated encode CPU on random-value streams)
        if len(vals) == 0:
            return
        if len(vals) <= 4:  # scalar path: tiny gaps between runs are common
            parts.append(bytes([256 - len(vals)]))
            for x in vals.tolist():
                u = ((x << 1) ^ (x >> 63)) & 0xFFFFFFFFFFFFFFFF if signed else x & 0xFFFFFFFFFFFFFFFF
                parts.append(encode_varint_scalar(u))
            return
        u = zigzag_encode(vals) if signed else vals.view(U64)
        enc = encode_varint(u)
        bounds = np.concatenate([[0], np.cumsum(varint_encoded_size(u))])
        for i in range(0, len(vals), _MAX_LITERALS):
            j = min(i + _MAX_LITERALS, len(vals))
            parts.append(bytes([256 - (j - i)]))
            parts.append(enc[bounds[i] : bounds[j]])

    if n < _MIN_RUN:
        emit_literals(v)
        return b"".join(parts)

    # maximal constant-delta stretches in delta space: stretch k spans delta
    # indices [ds_k, ds_{k+1}) and value indices [ds_k, ds_{k+1}] inclusive
    # (adjacent stretches share a boundary value; greedy earlier-run-wins).
    d = np.diff(v)
    brk = np.flatnonzero(d[1:] != d[:-1]) + 1
    ds = np.concatenate([[0], brk]).astype(np.int64)
    # stretch k spans d-indices [ds_k, ds_{k+1}) == value indices [ds_k, ve_k]
    ve = np.concatenate([brk, [n - 1]]).astype(np.int64)  # inclusive value end
    seg_delta = d[ds]
    eligible = (seg_delta >= -128) & (seg_delta <= 127)

    # python loop only over stretches that can possibly become runs (span
    # >= MIN_RUN and int8 delta) — on run-free data this is zero iterations
    candidates = np.flatnonzero(eligible & ((ve - ds + 1) >= _MIN_RUN))
    next_free = 0  # first value index not yet consumed by a run
    lit_from = 0  # first value index not yet emitted at all
    for k in candidates:
        run_start = max(int(ds[k]), next_free)
        run_end = int(ve[k])  # inclusive value index of stretch end
        span = run_end - run_start + 1
        if span < _MIN_RUN:
            continue
        if run_start > lit_from:
            emit_literals(v[lit_from:run_start])
        dd = int(seg_delta[k])
        pos = run_start
        while span >= _MIN_RUN:
            take = min(span, _MAX_RUN)
            x = int(v[pos])
            u = ((x << 1) ^ (x >> 63)) & 0xFFFFFFFFFFFFFFFF if signed else x & 0xFFFFFFFFFFFFFFFF
            parts.append(bytes([take - 3, dd & 0xFF]) + encode_varint_scalar(u))
            pos += take
            span -= take
        next_free = pos
        lit_from = pos
    if lit_from < n:
        emit_literals(v[lit_from:])
    return b"".join(parts)


def _encode_rle_v1_vec(v: np.ndarray, signed: bool) -> bytes:
    """Two-pass vectorized RLE v1 (see encode_rle_v1 docstring)."""
    n = len(v)
    # ---- pass 1: greedy segmentation, recording plain ints only ----
    lit_start: list[int] = []
    lit_len: list[int] = []
    run_pos: list[int] = []
    run_take: list[int] = []
    run_delta: list[int] = []
    order_is_run: list[bool] = []

    def rec_literals(s: int, e: int) -> None:
        i = s
        while i < e:
            j = min(i + _MAX_LITERALS, e)
            lit_start.append(i)
            lit_len.append(j - i)
            order_is_run.append(False)
            i = j

    d = np.diff(v)
    brk = np.flatnonzero(d[1:] != d[:-1]) + 1
    ds = np.concatenate([[0], brk]).astype(np.int64)
    ve = np.concatenate([brk, [n - 1]]).astype(np.int64)
    seg_delta = d[ds]
    eligible = (seg_delta >= -128) & (seg_delta <= 127)
    candidates = np.flatnonzero(eligible & ((ve - ds + 1) >= _MIN_RUN))

    next_free = 0
    lit_from = 0
    ds_l = ds.tolist()
    ve_l = ve.tolist()
    sd_l = seg_delta.tolist()
    for k in candidates.tolist():
        run_start = ds_l[k] if ds_l[k] >= next_free else next_free
        span = ve_l[k] - run_start + 1
        if span < _MIN_RUN:
            continue
        if run_start > lit_from:
            rec_literals(lit_from, run_start)
        dd = sd_l[k]
        pos = run_start
        while span >= _MIN_RUN:
            take = span if span < _MAX_RUN else _MAX_RUN
            run_pos.append(pos)
            run_take.append(take)
            run_delta.append(dd)
            order_is_run.append(True)
            pos += take
            span -= take
        next_free = pos
        lit_from = pos
    if lit_from < n:
        rec_literals(lit_from, n)

    # ---- pass 2: one vectorized varint pass per value pool ----
    ll = np.asarray(lit_len, dtype=np.int64)
    n_lit_vals = int(ll.sum()) if len(ll) else 0
    if n_lit_vals:
        ls = np.asarray(lit_start, dtype=np.int64)
        g_off = np.cumsum(ll) - ll  # group start offset within the lit pool
        intra = np.arange(n_lit_vals, dtype=np.int64) - np.repeat(g_off, ll)
        lit_vals = v[np.repeat(ls, ll) + intra]
        lu = zigzag_encode(lit_vals) if signed else lit_vals.view(U64)
        lit_sizes = varint_encoded_size(lu)
        enc_lits = np.frombuffer(encode_varint(lu), dtype=np.uint8)
        lit_plen = np.add.reduceat(lit_sizes, g_off)
    else:
        enc_lits = np.zeros(0, dtype=np.uint8)
        lit_plen = np.zeros(0, dtype=np.int64)
    rt = np.asarray(run_take, dtype=np.int64)
    if len(rt):
        bases = v[np.asarray(run_pos, dtype=np.int64)]
        bu = zigzag_encode(bases) if signed else bases.view(U64)
        base_sizes = varint_encoded_size(bu)
        enc_bases = np.frombuffer(encode_varint(bu), dtype=np.uint8)
    else:
        enc_bases = np.zeros(0, dtype=np.uint8)
        base_sizes = np.zeros(0, dtype=np.int64)

    # ---- scatter assembly: header bytes + payload slices in group order ----
    is_run = np.asarray(order_is_run, dtype=bool)
    G = len(is_run)
    hdr_len = np.where(is_run, 2, 1).astype(np.int64)
    plen = np.empty(G, dtype=np.int64)
    plen[is_run] = base_sizes
    plen[~is_run] = lit_plen
    glen = hdr_len + plen
    gend = np.cumsum(glen)
    gstart = gend - glen
    out = np.empty(int(gend[-1]), dtype=np.uint8)
    ro = gstart[is_run]
    out[ro] = (rt - _MIN_RUN).astype(np.uint8)
    out[ro + 1] = (np.asarray(run_delta, dtype=np.int64) & 0xFF).astype(np.uint8)
    out[gstart[~is_run]] = (256 - ll).astype(np.uint8)
    src_start = np.empty(G, dtype=np.int64)
    src_start[~is_run] = np.cumsum(lit_plen) - lit_plen
    src_start[is_run] = len(enc_lits) + (np.cumsum(base_sizes) - base_sizes)
    pool = np.concatenate([enc_lits, enc_bases])
    tot_p = int(plen.sum())
    p_off = np.cumsum(plen) - plen
    intra_p = np.arange(tot_p, dtype=np.int64) - np.repeat(p_off, plen)
    gidx = np.repeat(np.arange(G), plen)
    out[(gstart + hdr_len)[gidx] + intra_p] = pool[src_start[gidx] + intra_p]
    return out.tobytes()


def decode_rle_v1(buf, n: int, signed: bool, offset: int = 0) -> tuple[np.ndarray, int]:
    """ORC-style RLE v1 decode (clean-room per decodingUtils.ts:230-265).

    Streams of >=512 values take the vectorized path: the group walk stays
    a (cheap, framing-only) Python loop, but every varint in the stream —
    literal values and run bases — is decoded in two gathered vectorized
    passes and scattered with segment arithmetic.  The scalar path below is
    the reference semantics and the small-stream fast path."""
    if n >= 512:
        return _decode_rle_v1_vec(buf, n, signed, offset)
    b = buf
    np_input = isinstance(b, np.ndarray)
    out = np.empty(n, dtype=I64)
    got = 0
    pos = offset
    while got < n:
        header = int(b[pos]) if np_input else b[pos]
        pos += 1
        if header <= 0x7F:
            num = header + 3
            delta = int(b[pos]) if np_input else b[pos]
            if delta > 127:
                delta -= 256  # int8
            pos += 1
            if signed:
                base, pos = decode_varint_zigzag(b, 1, pos)
            else:
                base, pos = decode_varint(b, 1, pos)
                base = base.view(I64)
            out[got : got + num] = int(base[0]) + delta * np.arange(num, dtype=I64)
            got += num
        else:
            num = 256 - header
            if signed:
                vals, pos = decode_varint_zigzag(b, num, pos)
            else:
                vals, pos = decode_varint(b, num, pos)
                vals = vals.view(I64)
            out[got : got + num] = vals
            got += num
    if got != n:
        raise ValueError("RLE v1 stream produced wrong count")
    return out, pos


def _decode_rle_v1_vec(buf, n: int, signed: bool, offset: int) -> tuple[np.ndarray, int]:
    """Vectorized RLE v1 decode (same framing/semantics as the scalar path).

    Pass 1 walks group headers only — each literal group is skipped in
    O(log) via a searchsorted over the precomputed varint-terminator
    positions, never decoding values.  Pass 2 decodes all literal values
    (one gathered buffer, one ``decode_varint`` call) and all run bases
    (ditto), then scatters with repeat/arange segment arithmetic."""
    # worst case: every value a 10-byte varint + ~n/3 group headers
    b = _as_u8(buf)[offset : offset + 11 * n + (n // 3 + 2) * 2]
    term_idx = np.flatnonzero((b & 0x80) == 0)
    pos = 0
    got = 0
    # (kind, out_start, num, byte_start, byte_end, extra) per group
    lit_regions: list[tuple[int, int, int]] = []  # (out_start, num, bstart)
    lit_bends: list[int] = []
    run_out: list[int] = []
    run_num: list[int] = []
    run_delta: list[int] = []
    run_bstart: list[int] = []
    run_bend: list[int] = []
    try:
        while got < n:
            header = int(b[pos])
            if header <= 0x7F:
                num = header + 3
                delta = int(b[pos + 1])
                if delta > 127:
                    delta -= 256  # int8
                vstart = pos + 2
                j = int(np.searchsorted(term_idx, vstart))
                vend = int(term_idx[j]) + 1
                run_out.append(got)
                run_num.append(num)
                run_delta.append(delta)
                run_bstart.append(vstart)
                run_bend.append(vend)
                pos = vend
            else:
                num = 256 - header
                vstart = pos + 1
                j = int(np.searchsorted(term_idx, vstart))
                vend = int(term_idx[j + num - 1]) + 1
                lit_regions.append((got, num, vstart))
                lit_bends.append(vend)
                pos = vend
            got += num
    except IndexError:
        raise ValueError("RLE v1 stream truncated") from None
    if got != n:
        raise ValueError("RLE v1 stream produced wrong count")
    out = np.empty(n, dtype=I64)
    if lit_regions:
        gathered = np.concatenate(
            [b[s : e] for (_, _, s), e in zip(lit_regions, lit_bends)]
        )
        n_lit = int(sum(num for _, num, _ in lit_regions))
        vals, vpos = decode_varint(gathered, n_lit, 0)
        if vpos != len(gathered):
            raise ValueError("RLE v1 literal group has trailing bytes")
        sv = zigzag_decode(vals) if signed else vals.view(I64)
        starts = np.array([o for o, _, _ in lit_regions], dtype=I64)
        nums = np.array([num for _, num, _ in lit_regions], dtype=I64)
        intra = np.arange(n_lit, dtype=I64) - np.repeat(np.cumsum(nums) - nums, nums)
        out[np.repeat(starts, nums) + intra] = sv
    if run_out:
        gathered = np.concatenate(
            [b[s:e] for s, e in zip(run_bstart, run_bend)]
        )
        bases, vpos = decode_varint(gathered, len(run_out), 0)
        if vpos != len(gathered):
            raise ValueError("RLE v1 run base has trailing bytes")
        sb = zigzag_decode(bases) if signed else bases.view(I64)
        starts = np.array(run_out, dtype=I64)
        nums = np.array(run_num, dtype=I64)
        deltas = np.array(run_delta, dtype=I64)
        total = int(nums.sum())
        intra = np.arange(total, dtype=I64) - np.repeat(np.cumsum(nums) - nums, nums)
        out[np.repeat(starts, nums) + intra] = np.repeat(sb, nums) + np.repeat(deltas, nums) * intra
    return out, offset + pos


# ---------------------------------------------------------------------------
# ORC byte RLE v1
# ---------------------------------------------------------------------------


def encode_byte_rle(values: np.ndarray | bytes) -> bytes:
    """ORC-style byte RLE v1 (framing per decodingUtils.ts:373-401)."""
    v = np.frombuffer(values, dtype=np.uint8) if isinstance(values, (bytes, bytearray)) else np.ascontiguousarray(values, dtype=np.uint8)
    n = len(v)
    if n == 0:
        return b""
    # segments of equal bytes
    brk = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate([[0], brk]).astype(np.int64)
    ends = np.concatenate([brk, [n]]).astype(np.int64)
    lengths = ends - starts

    parts: list[bytes] = []
    lit: list[np.ndarray] = []

    def flush() -> None:
        if not lit:
            return
        vals = np.concatenate(lit)
        lit.clear()
        for i in range(0, len(vals), _MAX_LITERALS):
            chunk = vals[i : i + _MAX_LITERALS]
            parts.append(bytes([256 - len(chunk)]))
            parts.append(chunk.tobytes())

    for k in range(len(starts)):
        s, ln = int(starts[k]), int(lengths[k])
        if ln >= _MIN_RUN:
            flush()
            pos = s
            while ln >= _MIN_RUN:
                take = min(ln, _MAX_RUN)
                parts.append(bytes([take - 3, int(v[pos])]))
                pos += take
                ln -= take
            if ln:
                lit.append(v[pos : pos + ln])
        else:
            lit.append(v[s : s + ln])
    flush()
    return b"".join(parts)


def decode_byte_rle(buf, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    np_input = isinstance(buf, np.ndarray)
    b = buf
    out = np.empty(n, dtype=np.uint8)
    got = 0
    pos = offset
    while got < n:
        header = int(b[pos]) if np_input else b[pos]
        pos += 1
        if header <= 0x7F:
            num = header + 3
            out[got : got + num] = int(b[pos]) if np_input else b[pos]
            pos += 1
            got += num
        else:
            num = 256 - header
            if np_input:
                out[got : got + num] = b[pos : pos + num]
            else:
                out[got : got + num] = np.frombuffer(b, np.uint8, num, pos)
            pos += num
            got += num
    return out, pos


# ---------------------------------------------------------------------------
# boolean RLE (LSB-first bitset + byte RLE)
# ---------------------------------------------------------------------------


def encode_boolean_rle(values: np.ndarray) -> bytes:
    """bools -> LSB-first bitset (padded to whole bytes) -> byte RLE.

    Bit order matches the reference's BitSet/isBitSet convention
    (EncodingUtils.java:213-230, decodingUtils.ts:404-409).
    """
    v = np.ascontiguousarray(values, dtype=bool)
    packed = np.packbits(v, bitorder="little")
    return encode_byte_rle(packed)


def decode_boolean_rle(buf, n_bools: int, offset: int = 0) -> tuple[np.ndarray, int]:
    n_bytes = (n_bools + 7) // 8
    packed, pos = decode_byte_rle(buf, n_bytes, offset)
    bits = np.unpackbits(packed, bitorder="little")[:n_bools]
    return bits.astype(bool), pos


# ---------------------------------------------------------------------------
# floats & strings
# ---------------------------------------------------------------------------


def encode_floats_le(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype="<f4").tobytes()


def decode_floats_le(buf, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    raw = _as_u8(buf)[offset : offset + 4 * n]
    return np.ascontiguousarray(raw).view("<f4"), offset + 4 * n


def encode_doubles_le(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype="<f8").tobytes()


def decode_doubles_le(buf, n: int, offset: int = 0) -> tuple[np.ndarray, int]:
    raw = _as_u8(buf)[offset : offset + 8 * n]
    return np.ascontiguousarray(raw).view("<f8"), offset + 8 * n


def encode_string(s: str) -> bytes:
    """varint length + UTF-8 bytes (ref: EncodingUtils.java:116-120)."""
    raw = s.encode("utf-8")
    return encode_varint(np.array([len(raw)], dtype=U64)) + raw


def decode_string(buf, offset: int = 0) -> tuple[str, int]:
    ln, pos = read_varint_py(buf, offset)
    if isinstance(buf, np.ndarray):
        raw = bytes(buf[pos : pos + ln])
    else:
        raw = buf[pos : pos + ln]
    return raw.decode("utf-8"), pos + ln


def encode_string_dictionary(strings: list[str]) -> tuple[bytes, bytes]:
    """(length_stream_rle, utf8_concat) for a list of dictionary entries.

    Matches the reference's DICTIONARY/LENGTH stream pair
    (CovtConverter.java:1294-1324, decode CovtParser.getStringDictionary).
    """
    raws = [s.encode("utf-8") for s in strings]
    lengths = np.array([len(r) for r in raws], dtype=I64)
    return encode_rle_v1(lengths, signed=False), b"".join(raws)


def decode_string_dictionary(length_buf, dict_buf, n: int) -> list[str]:
    lengths, _ = decode_rle_v1(length_buf, n, signed=False)
    out = []
    pos = 0
    mv = memoryview(dict_buf)
    for ln in lengths.tolist():
        out.append(bytes(mv[pos : pos + ln]).decode("utf-8"))
        pos += ln
    return out


# ---------------------------------------------------------------------------
# Token dictionary (TOKEN_DICT) — engine extension on the format's plugin
# axis (SURVEY.md §2.10: "a new codec = new enum value + encode/decode
# pair").  Caption-like string dictionaries are mostly-unique word sequences
# over a small vocabulary, so the flat utf-8 concat (C12) stores each word
# once PER STRING; this codec stores each word once PER TILE and each string
# as varint token ids.  Self-contained layout (replaces LENGTH+DICTIONARY):
#   varint n_vocab | varint vocab_byte_lengths | vocab utf-8 concat |
#   varint tokens_per_string (n_strings values) | varint token ids (flat)
# Only single-space-joinable strings are representable; the encoder returns
# None otherwise (and the caller falls back to the plain concat layout).
# ---------------------------------------------------------------------------


def encode_token_dict(strings: list[str]) -> bytes | None:
    import pandas as pd

    # one C-level join+split for the whole batch (a per-string .split loop
    # cost ~0.2s per 100k captions); token counts via C-level str.count
    flat_toks = " ".join(strings).split(" ") if strings else []
    counts = np.fromiter(
        (s.count(" ") + 1 for s in strings), dtype=np.int64, count=len(strings)
    )
    if strings:
        codes, uniques = pd.factorize(np.asarray(flat_toks, dtype=object), use_na_sentinel=False)
        if (uniques == "").any():  # empty token: leading/trailing/double space or ""
            return None
        flat = codes.astype(np.int64)
        vocab = list(uniques)
    else:
        flat = np.empty(0, dtype=np.int64)
        vocab = []
    raws = [t.encode("utf-8") for t in vocab]
    lengths = np.array([len(r) for r in raws], dtype=np.int64)
    # plain varints (not RLE) for lengths/counts: same bytes for the small
    # values these hold, and decode is ONE vectorized pass instead of a
    # per-group python loop (dense-tile decode cost)
    return b"".join(
        [
            encode_varint_scalar(len(raws)),
            encode_varint(lengths.view(np.uint64)),
            b"".join(raws),
            encode_varint(counts.view(np.uint64)),
            encode_varint(flat.view(np.uint64)),
        ]
    )


def decode_token_dict(buf, n_strings: int, offset: int = 0) -> tuple[list[str], int]:
    b = _as_u8(buf)
    n_vocab, pos = read_varint_py(b, offset)
    lengths, pos = decode_varint(b, n_vocab, pos)
    lengths = lengths.astype(np.int64)
    vocab: list[str] = []
    mv = memoryview(b)
    for ln in lengths.tolist():
        vocab.append(bytes(mv[pos : pos + ln]).decode("utf-8"))
        pos += ln
    counts, pos = decode_varint(b, n_strings, pos)
    counts = counts.astype(np.int64)
    total = int(counts.sum())
    ids, pos = decode_varint(b, total, pos)
    # gather all tokens in one numpy take + one tolist (a per-token python
    # generator here dominated dense-tile decode)
    toks = np.array(vocab, dtype=object)[ids.astype(np.int64)].tolist()
    bounds = np.concatenate([[0], np.cumsum(counts)]).tolist()
    join = " ".join
    out = [join(toks[bounds[i] : bounds[i + 1]]) for i in range(n_strings)]
    return out, pos
