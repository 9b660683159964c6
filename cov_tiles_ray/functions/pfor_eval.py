"""Eval-only integer codecs completing the reference's 9-codec benchmark.

The reference's evaluation harness (IntegerCompressionEvaluation.java:72-107)
sizes each id/point corpus under varint, ORC RLE v1/v2, Parquet
RLE-bitpacking hybrid, Parquet delta, FastPFOR128, binary packing, NewPFD and
OptPFD.  The engine's tile format uses its own candidate set
(`functions/codecs.py`, `functions/fastpfor.py`); this module adds clean-room
implementations of the remaining *benchmark* roles so the `codec_eval` query
reports the full table.  None of these are wired into the tile format.

Like `fastpfor.py`, these preserve each codec's ROLE and cost model — they
are NOT bit-compatible with the JavaFastPFOR library or the Parquet readers
(block layouts follow the published algorithm descriptions, not any
implementation's wire format).  All encoders take non-negative
uint32-range arrays (callers apply zigzag/delta first) and every encoder has
a decoder, round-tripped in tests.

Layouts (all little-endian, varints as in `codecs.encode_varint`):

* binary packing  — varint n, then per 128-block: 1 byte width b,
  ceil(cnt*b/8) bytes of LSB-first packed values (b = block max bit length;
  the classic BP128 frame without patching).
* NewPFD / OptPFD — varint n, then per 128-block: 1 byte width b, 1 byte
  exception count e, packed low bits, e position bytes, varint high bits.
  NewPFD picks b as the ~90th-percentile bit length (Yan/Ding/Suel's
  heuristic); OptPFD picks b minimizing the block's EXACT encoded size.
* Parquet hybrid  — varint n, 1 byte width (bit length of the stream max),
  then per the published Parquet RLE/bit-packed hybrid grammar: runs encode
  as varint(len<<1) + fixed-width value; literal groups of 8 values encode
  as varint((ngroups<<1)|1) + LSB-first packed bytes.
* Parquet delta   — the DELTA_BINARY_PACKED shape: varint n, varint zigzag
  first value, then per 128-block: varint zigzag min-delta, 1 byte width,
  packed (delta - min_delta) values.
* ORC RLE v2      — the ORCv1-spec grammar (SHORT_REPEAT / DIRECT /
  PATCHED_BASE / DELTA sub-encodings, 2-bit headers, MSB-first packing);
  see the section comment below.
"""

from __future__ import annotations

import numpy as np

from .codecs import _as_u8, decode_varint, encode_varint, varint_encoded_size

BLOCK = 128
U64 = np.uint64


def _pack_lsb(values: np.ndarray, width: int) -> bytes:
    """LSB-first bit-pack of uint32 values at ``width`` bits each."""
    if width == 0 or len(values) == 0:
        return b""
    shifts = np.arange(width, dtype=np.uint32)
    bits = ((values[:, None] >> shifts[None, :]) & 1).astype(np.uint8).reshape(-1)
    return np.packbits(bits, bitorder="little").tobytes()


def _unpack_lsb(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros(n, dtype=np.uint32)
    bits = np.unpackbits(buf, count=n * width, bitorder="little")
    bits = bits.reshape(n, width).astype(np.uint32)
    shifts = np.arange(width, dtype=np.uint32)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint32)


def _bit_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value ceil bit length (0 for 0) of a uint32 array."""
    w = np.zeros(len(values), dtype=np.int32)
    v = values.astype(np.uint32, copy=True)
    for k in (16, 8, 4, 2, 1):
        m = v >= np.uint32(1 << k)
        w[m] += k
        v[m] >>= np.uint32(k)
    w[values > 0] += 1
    return w


# --- binary packing (BP128 frame, no patching) -----------------------------


def encode_binary_packing(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint32)
    parts = [encode_varint(np.array([len(v)], dtype=U64))]
    widths = _bit_lengths(v)
    for s in range(0, len(v), BLOCK):
        blk = v[s : s + BLOCK]
        b = int(widths[s : s + BLOCK].max()) if len(blk) else 0
        parts.append(bytes([b]))
        parts.append(_pack_lsb(blk, b))
    return b"".join(parts)


def decode_binary_packing(buf, offset: int = 0) -> tuple[np.ndarray, int]:
    b8 = _as_u8(buf)
    nv, pos = decode_varint(b8, 1, offset)
    n = int(nv[0])
    out = np.empty(n, dtype=np.uint32)
    done = 0
    while done < n:
        cnt = min(BLOCK, n - done)
        width = int(b8[pos])
        pos += 1
        nbytes = (cnt * width + 7) // 8
        out[done : done + cnt] = _unpack_lsb(
            np.ascontiguousarray(b8[pos : pos + nbytes]), cnt, width
        )
        pos += nbytes
        done += cnt
    return out, pos


# --- NewPFD / OptPFD (patched frame-of-reference) --------------------------


def _encode_pfd(values: np.ndarray, opt: bool) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint32)
    parts = [encode_varint(np.array([len(v)], dtype=U64))]
    widths = _bit_lengths(v)
    for s in range(0, len(v), BLOCK):
        blk = v[s : s + BLOCK]
        bw = widths[s : s + BLOCK]
        maxw = int(bw.max()) if len(blk) else 0
        if opt:
            # exact per-candidate cost: packed bytes + per-exception
            # (1 position byte + true varint size of the high bits)
            best_b, best_cost = maxw, (len(blk) * maxw + 7) // 8
            for b in range(maxw):
                exc = bw > b
                n_exc = int(exc.sum())
                if n_exc > 255:
                    continue
                high = (blk[exc] >> np.uint32(b)).astype(U64)
                cost = (
                    (len(blk) * b + 7) // 8
                    + n_exc
                    + int(varint_encoded_size(high).sum())
                )
                if cost < best_cost:
                    best_b, best_cost = b, cost
            b = best_b
        else:
            # NewPFD heuristic: smallest b covering >=90% of the block
            b = int(np.percentile(bw, 90)) if len(blk) else 0
            if int((bw > b).sum()) > 255:
                b = maxw
        exc_mask = bw > b
        exc_pos = np.flatnonzero(exc_mask).astype(np.uint8)
        low = blk & np.uint32((1 << b) - 1 if b else 0)
        high = (blk[exc_mask] >> np.uint32(b)).astype(U64)
        parts.append(bytes([b, len(exc_pos)]))
        parts.append(_pack_lsb(low, b))
        parts.append(exc_pos.tobytes())
        parts.append(encode_varint(high))
    return b"".join(parts)


def encode_newpfd(values: np.ndarray) -> bytes:
    return _encode_pfd(values, opt=False)


def encode_optpfd(values: np.ndarray) -> bytes:
    return _encode_pfd(values, opt=True)


def decode_pfd(buf, offset: int = 0) -> tuple[np.ndarray, int]:
    """Shared NewPFD/OptPFD decoder (same block grammar, different width
    policies at encode time)."""
    b8 = _as_u8(buf)
    nv, pos = decode_varint(b8, 1, offset)
    n = int(nv[0])
    out = np.empty(n, dtype=np.uint32)
    done = 0
    while done < n:
        cnt = min(BLOCK, n - done)
        width, n_exc = int(b8[pos]), int(b8[pos + 1])
        pos += 2
        nbytes = (cnt * width + 7) // 8
        blk = _unpack_lsb(np.ascontiguousarray(b8[pos : pos + nbytes]), cnt, width)
        pos += nbytes
        exc_pos = b8[pos : pos + n_exc].astype(np.int64)
        pos += n_exc
        high, pos = decode_varint(b8, n_exc, pos)
        if n_exc:
            blk[exc_pos] |= high.astype(np.uint32) << np.uint32(width)
        out[done : done + cnt] = blk
        done += cnt
    return out, pos


# --- Parquet RLE / bit-packed hybrid ---------------------------------------


def encode_parquet_hybrid(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(v)
    width = int(_bit_lengths(v).max()) if n else 0
    head = encode_varint(np.array([n], dtype=U64)) + bytes([width])
    if n == 0:
        return head
    vbytes = max(1, (width + 7) // 8)
    parts = [head]
    # The published grammar requires bit-packed runs to hold a multiple of 8
    # values, so (like real writers) segment at GROUP granularity: a maximal
    # run of adjacent all-equal same-value groups becomes one RLE run
    # (length a multiple of 8); everything else batches into bit-packed
    # groups.  Padding then only ever occurs in the stream's final group.
    n8 = n - (n % 8)
    g = v[:n8].reshape(-1, 8)
    ngrp = len(g)
    is_const = (g == g[:, :1]).all(axis=1) if ngrp else np.zeros(0, dtype=bool)
    # group i starts a new segment if its const-ness differs from i-1, or
    # both are const runs of different values
    if ngrp:
        prev_same = np.zeros(ngrp, dtype=bool)
        prev_same[1:] = (is_const[1:] == is_const[:-1]) & (
            ~is_const[1:] | (g[1:, 0] == g[:-1, 0])
        )
        seg_starts = np.flatnonzero(~prev_same)
        seg_ends = np.concatenate([seg_starts[1:], [ngrp]])
        for s, e in zip(seg_starts, seg_ends):
            if is_const[s]:
                parts.append(encode_varint(np.array([((e - s) * 8) << 1], dtype=U64)))
                parts.append(int(g[s, 0]).to_bytes(vbytes, "little"))
            else:
                parts.append(encode_varint(np.array([((e - s) << 1) | 1], dtype=U64)))
                parts.append(_pack_lsb(g[s:e].reshape(-1), width))
    if n % 8:
        pad = np.zeros(8, dtype=np.uint32)
        pad[: n % 8] = v[n8:]
        parts.append(encode_varint(np.array([(1 << 1) | 1], dtype=U64)))
        parts.append(_pack_lsb(pad, width))
    return b"".join(parts)


def decode_parquet_hybrid(buf, offset: int = 0) -> tuple[np.ndarray, int]:
    b8 = _as_u8(buf)
    nv, pos = decode_varint(b8, 1, offset)
    n = int(nv[0])
    width = int(b8[pos])
    pos += 1
    vbytes = max(1, (width + 7) // 8)
    chunks: list[np.ndarray] = []
    got = 0
    while got < n:
        hv, pos = decode_varint(b8, 1, pos)
        h = int(hv[0])
        if h & 1:  # bit-packed groups
            cnt = (h >> 1) * 8
            nbytes = cnt * width // 8
            vals = _unpack_lsb(np.ascontiguousarray(b8[pos : pos + nbytes]), cnt, width)
            pos += nbytes
            vals = vals[: n - got]  # drop tail-group padding
        else:  # RLE run
            cnt = h >> 1
            val = int.from_bytes(bytes(b8[pos : pos + vbytes]), "little")
            pos += vbytes
            vals = np.full(cnt, val, dtype=np.uint32)
        chunks.append(vals)
        got += len(vals)
    out = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint32)
    return out[:n], pos


# --- Parquet DELTA_BINARY_PACKED shape -------------------------------------


def encode_parquet_delta(values: np.ndarray) -> bytes:
    """Signed-delta block packing over int64-range input (the one codec here
    that deltas internally — the reference feeds it ORIGINAL values,
    IntegerCompressionEvaluation.java:49-50)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    zz = lambda x: (np.asarray(x, np.int64).astype(U64) << U64(1)) ^ (
        np.asarray(x, np.int64) >> np.int64(63)
    ).astype(U64)
    parts = [encode_varint(np.array([n], dtype=U64))]
    if n == 0:
        return b"".join(parts)
    parts.append(encode_varint(zz([v[0]])))
    deltas = np.diff(v)
    for s in range(0, len(deltas), BLOCK):
        blk = deltas[s : s + BLOCK]
        mind = int(blk.min())
        rel = (blk - mind).astype(U64)
        b = int(_bit_lengths64(rel).max())
        parts.append(encode_varint(zz([mind])))
        parts.append(bytes([b]))
        parts.append(_pack_lsb64(rel, b))
    return b"".join(parts)


def decode_parquet_delta(buf, offset: int = 0) -> tuple[np.ndarray, int]:
    b8 = _as_u8(buf)
    nv, pos = decode_varint(b8, 1, offset)
    n = int(nv[0])
    if n == 0:
        return np.empty(0, dtype=np.int64), pos
    unzz = lambda u: (u >> U64(1)).astype(np.int64) ^ -(u & U64(1)).astype(np.int64)
    fv, pos = decode_varint(b8, 1, pos)
    first = int(unzz(fv)[0])
    deltas = np.empty(n - 1, dtype=np.int64)
    done = 0
    while done < n - 1:
        cnt = min(BLOCK, n - 1 - done)
        mv, pos = decode_varint(b8, 1, pos)
        mind = int(unzz(mv)[0])
        b = int(b8[pos])
        pos += 1
        nbytes = (cnt * b + 7) // 8
        rel = _unpack_lsb64(np.ascontiguousarray(b8[pos : pos + nbytes]), cnt, b)
        pos += nbytes
        deltas[done : done + cnt] = rel.astype(np.int64) + mind
        done += cnt
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    if n > 1:
        np.cumsum(deltas, out=out[1:])
        out[1:] += first
    return out, pos


def _bit_lengths64(values: np.ndarray) -> np.ndarray:
    w = np.zeros(len(values), dtype=np.int32)
    v = values.astype(U64, copy=True)
    for k in (32, 16, 8, 4, 2, 1):
        m = v >= (U64(1) << U64(k))
        w[m] += k
        v[m] >>= U64(k)
    w[values > 0] += 1
    return w


def _pack_lsb64(values: np.ndarray, width: int) -> bytes:
    if width == 0 or len(values) == 0:
        return b""
    shifts = np.arange(width, dtype=U64)
    bits = ((values[:, None] >> shifts[None, :]) & U64(1)).astype(np.uint8).reshape(-1)
    return np.packbits(bits, bitorder="little").tobytes()


def _unpack_lsb64(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros(n, dtype=U64)
    bits = np.unpackbits(buf, count=n * width, bitorder="little")
    bits = bits.reshape(n, width).astype(U64)
    shifts = np.arange(width, dtype=U64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=U64)


# --- ORC RLE v2 (clean-room, per the published ORC specification) ----------
#
# The reference's eval harness sizes corpora under ORC's
# RunLengthIntegerWriterV2(signed=true) (EncodingUtils.java:292-303,
# IntegerCompressionEvaluation.java).  This is a clean-room implementation of
# the ORCv1-spec RLE v2 grammar — SHORT_REPEAT / DIRECT / PATCHED_BASE /
# DELTA sub-encodings, MSB-first bit packing, 2-bit headers — with a
# writer-side mode chooser that mirrors the published heuristics (90th/100th
# percentile width gap for patching, monotonic runs as delta).  It preserves
# the codec's ROLE and cost model; it is not guaranteed byte-identical to the
# Java ORC writer's output.

_ORC_MAX_RUN = 512
_ORC_FBS = tuple(range(1, 25)) + (26, 28, 30, 32, 40, 48, 56, 64)


def _orc_closest_fb(w: int) -> int:
    """Smallest allowed fixed-bit width >= w (w >= 1)."""
    for f in _ORC_FBS:
        if f >= w:
            return f
    return 64


def _orc_wcode(w: int) -> int:
    return _ORC_FBS.index(w)


def _pack_msb64(values: np.ndarray, width: int) -> bytes:
    """MSB-first bit-pack of uint64 values at ``width`` bits (ORC layout)."""
    if width == 0 or len(values) == 0:
        return b""
    v = values.astype(U64, copy=False)
    shifts = np.arange(width - 1, -1, -1, dtype=U64)
    bits = ((v[:, None] >> shifts[None, :]) & U64(1)).astype(np.uint8).reshape(-1)
    return np.packbits(bits, bitorder="big").tobytes()


def _unpack_msb64(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros(n, dtype=U64)
    bits = np.unpackbits(buf, count=n * width, bitorder="big")
    bits = bits.reshape(n, width).astype(U64)
    shifts = np.arange(width - 1, -1, -1, dtype=U64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=U64)


def _orc_zigzag(v: np.ndarray) -> np.ndarray:
    x = np.asarray(v, dtype=np.int64)
    return ((x.astype(U64) << U64(1)) ^ (x >> np.int64(63)).astype(U64))


def _orc_unzigzag(u: np.ndarray) -> np.ndarray:
    u = np.asarray(u, dtype=U64)
    return ((u >> U64(1)).astype(np.int64)) ^ -(u & U64(1)).astype(np.int64)


def _orc_vulong(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _orc_vslong(x: int) -> bytes:
    return _orc_vulong(((x << 1) ^ (x >> 63)) & ((1 << 64) - 1))


def _orc_read_vulong(b8: np.ndarray, pos: int) -> tuple[int, int]:
    v = 0
    sh = 0
    while True:
        byte = int(b8[pos])
        pos += 1
        v |= (byte & 0x7F) << sh
        if not byte & 0x80:
            return v, pos
        sh += 7


def _orc_read_vslong(b8: np.ndarray, pos: int) -> tuple[int, int]:
    u, pos = _orc_read_vulong(b8, pos)
    return (u >> 1) ^ -(u & 1), pos


def _orc_emit_short_repeat(val: int, count: int, signed: bool) -> bytes:
    u = int(_orc_zigzag(np.array([val]))[0]) if signed else val
    nb = max(1, (u.bit_length() + 7) // 8)
    return bytes([(0 << 6) | ((nb - 1) << 3) | (count - 3)]) + u.to_bytes(nb, "big")


def _orc_emit_fixed_delta(base: int, delta: int, count: int, signed: bool) -> bytes:
    head = bytes([(3 << 6) | (0 << 1) | ((count - 1) >> 8), (count - 1) & 0xFF])
    b = _orc_vslong(base) if signed else _orc_vulong(base)
    return head + b + _orc_vslong(delta)


def _orc_emit_delta(lits: np.ndarray, signed: bool) -> bytes:
    d = np.diff(lits)
    n = len(lits)
    w = max(2, _orc_closest_fb(max(1, int(_bit_lengths64(np.abs(d[1:]).astype(U64)).max())))) if n > 2 else 2
    head = bytes([(3 << 6) | (_orc_wcode(w) << 1) | ((n - 1) >> 8), (n - 1) & 0xFF])
    base = int(lits[0])
    b = _orc_vslong(base) if signed else _orc_vulong(base)
    out = head + b + _orc_vslong(int(d[0]))
    if n > 2:
        out += _pack_msb64(np.abs(d[1:]).astype(U64), w)
    return out


def _orc_emit_direct(lits: np.ndarray, signed: bool) -> bytes:
    u = _orc_zigzag(lits) if signed else lits.astype(U64)
    w = _orc_closest_fb(max(1, int(_bit_lengths64(u).max())))
    n = len(lits)
    head = bytes([(1 << 6) | (_orc_wcode(w) << 1) | ((n - 1) >> 8), (n - 1) & 0xFF])
    return head + _pack_msb64(u, w)


def _orc_emit_patched_base(lits: np.ndarray, signed: bool) -> bytes | None:
    """PATCHED_BASE attempt; returns None when the chunk doesn't qualify
    (the caller falls back to DIRECT)."""
    base = int(lits.min())
    span = int(lits.max()) - base
    if span < 0 or span >= (1 << 63):  # range overflow guard
        return None
    reduced = (lits - base).astype(U64)
    rw = _bit_lengths64(reduced)
    w100 = int(rw.max())
    w90 = int(np.percentile(rw, 90))
    w = _orc_closest_fb(max(1, w90))
    if w >= _orc_closest_fb(max(1, w100)):
        return None  # no width gap worth patching
    patch_idx = np.flatnonzero(rw > w)
    pll = len(patch_idx)
    if pll == 0 or pll > 31:
        return None
    gaps = np.diff(np.concatenate([[0], patch_idx]))
    if int(gaps.max()) > 255:
        return None
    high = (reduced[patch_idx] >> U64(w)).astype(U64)
    pw = _orc_closest_fb(max(1, int(_bit_lengths64(high).max())))
    gw = max(1, int(gaps.max()).bit_length())
    if gw > 8 or gw + pw > 64:
        return None
    n = len(lits)
    neg = base < 0
    bmag = -base if neg else base
    bw = max(1, (bmag.bit_length() + 1 + 7) // 8)  # +1 sign bit
    if bw > 8:
        return None
    braw = bmag | (1 << (bw * 8 - 1)) if neg else bmag
    head = bytes(
        [
            (2 << 6) | (_orc_wcode(w) << 1) | ((n - 1) >> 8),
            (n - 1) & 0xFF,
            ((bw - 1) << 5) | _orc_wcode(pw),
            ((gw - 1) << 5) | pll,
        ]
    )
    data = _pack_msb64(reduced & U64((1 << w) - 1), w)
    entries = (gaps.astype(U64) << U64(pw)) | high
    ew = _orc_closest_fb(gw + pw)
    return head + braw.to_bytes(bw, "big") + data + _pack_msb64(entries, ew)


def _orc_flush_literals(lits: np.ndarray, signed: bool, parts: list) -> None:
    n = len(lits)
    if n == 0:
        return
    if n >= 3:
        d = np.diff(lits)
        if (d == d[0]).all():
            parts.append(_orc_emit_fixed_delta(int(lits[0]), int(d[0]), n, signed))
            return
        if (d >= 0).all() or ((d <= 0).all() and d[0] < 0):
            # monotonic: DELTA variable (decoder applies |deltas| with the
            # sign of the first delta — require d[0]<0 for decreasing runs)
            parts.append(_orc_emit_delta(lits, signed))
            return
    pb = _orc_emit_patched_base(lits, signed) if n >= 5 else None
    parts.append(pb if pb is not None else _orc_emit_direct(lits, signed))


def encode_orc_rle_v2(values: np.ndarray, signed: bool = True) -> bytes:
    """ORC RLE v2 encode of an int64-range array (original values — the
    reference feeds its writer un-preprocessed ints with signed=true)."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return b""
    # run-length segmentation of equal-value runs
    change = np.flatnonzero(np.diff(v) != 0)
    starts = np.concatenate([[0], change + 1])
    lengths = np.diff(np.concatenate([starts, [n]]))
    parts: list[bytes] = []
    pend_start, pend_len = 0, 0  # pending literal region

    def flush():
        nonlocal pend_len
        s = pend_start
        while pend_len > 0:
            take = min(_ORC_MAX_RUN, pend_len)
            _orc_flush_literals(v[s : s + take], signed, parts)
            s += take
            pend_len -= take

    for s, ln in zip(starts, lengths):
        ln = int(ln)
        if ln >= 3:
            flush()
            pend_start = s + ln
            val = int(v[s])
            while ln > 0:
                if ln <= 10:
                    if ln >= 3:
                        parts.append(_orc_emit_short_repeat(val, ln, signed))
                    else:  # 1-2 leftover values after a 512 chunk
                        _orc_flush_literals(v[s : s + ln], signed, parts)
                    break
                take = min(_ORC_MAX_RUN, ln)
                if ln - take in (1, 2):  # avoid an awkward tiny tail
                    take = ln - 3
                parts.append(_orc_emit_fixed_delta(val, 0, take, signed))
                s += take
                ln -= take
        else:
            if pend_len == 0:
                pend_start = s
            pend_len += ln
    flush()
    return b"".join(parts)


def decode_orc_rle_v2(buf, num_values: int, offset: int = 0, signed: bool = True):
    """Decode ``num_values`` ints from an ORC RLE v2 stream -> (int64 array,
    end offset)."""
    b8 = _as_u8(buf)
    out = np.empty(num_values, dtype=np.int64)
    got = 0
    pos = offset
    while got < num_values:
        h = int(b8[pos])
        enc = h >> 6
        if enc == 0:  # SHORT_REPEAT
            nb = ((h >> 3) & 0x7) + 1
            cnt = (h & 0x7) + 3
            u = int.from_bytes(bytes(b8[pos + 1 : pos + 1 + nb]), "big")
            pos += 1 + nb
            val = int(_orc_unzigzag(np.array([u], dtype=U64))[0]) if signed else u
            out[got : got + cnt] = val
            got += cnt
        elif enc == 1:  # DIRECT
            w = _ORC_FBS[(h >> 1) & 0x1F]
            cnt = (((h & 1) << 8) | int(b8[pos + 1])) + 1
            pos += 2
            nbytes = (cnt * w + 7) // 8
            u = _unpack_msb64(np.ascontiguousarray(b8[pos : pos + nbytes]), cnt, w)
            pos += nbytes
            out[got : got + cnt] = _orc_unzigzag(u) if signed else u.astype(np.int64)
            got += cnt
        elif enc == 2:  # PATCHED_BASE
            w = _ORC_FBS[(h >> 1) & 0x1F]
            cnt = (((h & 1) << 8) | int(b8[pos + 1])) + 1
            b2, b3 = int(b8[pos + 2]), int(b8[pos + 3])
            bw = (b2 >> 5) + 1
            pw = _ORC_FBS[b2 & 0x1F]
            gw = (b3 >> 5) + 1
            pll = b3 & 0x1F
            pos += 4
            braw = int.from_bytes(bytes(b8[pos : pos + bw]), "big")
            pos += bw
            sign_mask = 1 << (bw * 8 - 1)
            base = -(braw & (sign_mask - 1)) if braw & sign_mask else braw
            nbytes = (cnt * w + 7) // 8
            data = _unpack_msb64(np.ascontiguousarray(b8[pos : pos + nbytes]), cnt, w)
            pos += nbytes
            ew = _orc_closest_fb(gw + pw)
            ebytes = (pll * ew + 7) // 8
            entries = _unpack_msb64(np.ascontiguousarray(b8[pos : pos + ebytes]), pll, ew)
            pos += ebytes
            idx = 0
            for e in entries:
                gap = int(e >> U64(pw))
                patch = int(e & U64((1 << pw) - 1))
                idx += gap
                if patch:
                    data[idx] |= U64(patch) << U64(w)
            out[got : got + cnt] = data.astype(np.int64) + base
            got += cnt
        else:  # DELTA
            wc = (h >> 1) & 0x1F
            cnt = (((h & 1) << 8) | int(b8[pos + 1])) + 1
            pos += 2
            if signed:
                base, pos = _orc_read_vslong(b8, pos)
            else:
                base, pos = _orc_read_vulong(b8, pos)
            dbase, pos = _orc_read_vslong(b8, pos)
            vals = np.empty(cnt, dtype=np.int64)
            vals[0] = base
            if wc == 0:  # fixed delta
                if cnt > 1:
                    vals[1:] = base + dbase * np.arange(1, cnt, dtype=np.int64)
            else:
                w = _ORC_FBS[wc]
                if cnt > 1:
                    vals[1] = base + dbase
                if cnt > 2:
                    nbytes = ((cnt - 2) * w + 7) // 8
                    d = _unpack_msb64(
                        np.ascontiguousarray(b8[pos : pos + nbytes]), cnt - 2, w
                    ).astype(np.int64)
                    pos += nbytes
                    sgn = -1 if dbase < 0 else 1
                    np.cumsum(sgn * d, out=vals[2:])
                    vals[2:] += vals[1]
            out[got : got + cnt] = vals
            got += cnt
    return out, pos
