"""FastPFOR-style patched bitpacking (clean-room block codec).

The reference uses the FastPFOR128 library with a VariableByte tail
(EncodingUtils.java:149-188, DecodingUtils.java:316-392).  This module is a
from-scratch "patched frame-of-reference" codec in the same family — NOT a
bit-compatible reimplementation of the FastPFOR library (the library's block
layout is an implementation detail of a C++/Java dependency we don't ship).
It preserves the *role* the codec plays in the format: a per-stream candidate
that wins on dense integer streams with occasional outliers, selected by
encoded size (CovtConverter.java:656-668, 911-919).

Layout (all little-endian):
  header: varint num_values
  per block of 128 values:
      1 byte:  bit width b (0..32)
      1 byte:  number of exceptions e (0..128)
      ceil(128*b/8) bytes: low b bits of each value, bit-packed MSB-first
      e bytes: exception positions (u8)
      varint *e: exception high bits (value >> b)
  the last block may be short (n % 128 values; packed bits sized accordingly).

Values must fit in uint32 (the reference's FastPFOR is a 32-bit codec too);
callers apply zigzag/delta first.  Encoding picks, per block, the bit width
minimizing ``128*b/8 + overhead(exceptions)`` — the classic FastPFOR cost
model.
"""

from __future__ import annotations

import numpy as np

from .codecs import _as_u8, decode_varint, encode_varint

BLOCK = 128
U64 = np.uint64


def _pack_bits(values: np.ndarray, width: int) -> np.ndarray:
    """Bit-pack uint32 values to ``width`` bits each, MSB-first. -> uint8[]"""
    if width == 0:
        return np.empty(0, dtype=np.uint8)
    n = len(values)
    # per-value bits, MSB first within each value's width-bit field
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint32)
    bits = ((values[:, None] >> shifts[None, :]) & 1).astype(np.uint8).reshape(-1)
    pad = (-len(bits)) % 8
    if pad:
        bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(bits)


def _unpack_bits(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros(n, dtype=np.uint32)
    nbits = n * width
    bits = np.unpackbits(buf, count=nbits).reshape(n, width).astype(np.uint32)
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint32)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint32)


def _bit_widths(values: np.ndarray) -> np.ndarray:
    """ceil bit length of each uint32 value (0 for 0)."""
    w = np.zeros(len(values), dtype=np.int32)
    v = values.copy()
    for k in (16, 8, 4, 2, 1):
        m = v >= (1 << k)
        w[m] += k
        v[m] >>= k
    w[values > 0] += 1
    return w


def encode_fastpfor(values: np.ndarray) -> bytes:
    """Patched bitpacking encode of a uint32-range array."""
    v = np.ascontiguousarray(values, dtype=np.uint32)
    n = len(v)
    parts = [encode_varint(np.array([n], dtype=U64))]
    all_widths = _bit_widths(v)  # one vectorized pass (per-block calls were hot)
    for s in range(0, n, BLOCK):
        blk = v[s : s + BLOCK]
        widths = all_widths[s : s + BLOCK]
        maxw = int(widths.max()) if len(blk) else 0
        # choose b minimizing packed + exception cost
        best_b, best_cost = maxw, (len(blk) * maxw + 7) // 8 + 2
        # candidate widths 0..maxw; exception count for width b = #values wider
        hist = np.bincount(widths, minlength=maxw + 1)
        wider = np.concatenate([np.cumsum(hist[::-1])[::-1][1:], [0]])  # wider[b] = #widths > b
        for b in range(0, maxw):
            n_exc = int(wider[b])
            if n_exc > 128:
                continue
            # exception cost: 1 pos byte + ~varint of high bits (estimate 1-4B, use 2)
            cost = (len(blk) * b + 7) // 8 + 2 + n_exc * 3
            if cost < best_cost:
                best_b, best_cost = b, cost
        b = best_b
        exc_mask = widths > b
        exc_pos = np.flatnonzero(exc_mask).astype(np.uint8)
        low = blk & np.uint32((1 << b) - 1 if b else 0)
        high = (blk[exc_mask] >> np.uint32(b)).astype(U64)
        parts.append(bytes([b, len(exc_pos)]))
        parts.append(_pack_bits(low, b).tobytes())
        parts.append(exc_pos.tobytes())
        parts.append(encode_varint(high))
    return b"".join(parts)


def decode_fastpfor(buf, offset: int = 0) -> tuple[np.ndarray, int]:
    b8 = _as_u8(buf)
    nv, pos = decode_varint(b8, 1, offset)
    n = int(nv[0])
    out = np.empty(n, dtype=np.uint32)
    done = 0
    while done < n:
        cnt = min(BLOCK, n - done)
        width = int(b8[pos])
        n_exc = int(b8[pos + 1])
        pos += 2
        nbytes = (cnt * width + 7) // 8
        low = _unpack_bits(np.ascontiguousarray(b8[pos : pos + nbytes]), cnt, width)
        pos += nbytes
        exc_pos = b8[pos : pos + n_exc].astype(np.int64)
        pos += n_exc
        high, pos = decode_varint(b8, n_exc, pos)
        blk = low
        if n_exc:
            blk[exc_pos] |= (high.astype(np.uint32) << np.uint32(width))
        out[done : done + cnt] = blk
        done += cnt
    return out, pos


# --- composites matching the reference's usage -----------------------------


def encode_fastpfor_delta_zigzag(values: np.ndarray) -> bytes:
    from .codecs import delta_encode, zigzag_encode

    zz = zigzag_encode(delta_encode(values))
    if len(zz) and int(zz.max()) >= (1 << 32):
        raise OverflowError("fastpfor stream value exceeds uint32 after delta+zigzag")
    return encode_fastpfor(zz.astype(np.uint32))


def decode_fastpfor_delta_zigzag(buf, offset: int = 0) -> tuple[np.ndarray, int]:
    from .codecs import delta_decode, zigzag_decode

    u, pos = decode_fastpfor(buf, offset)
    return delta_decode(zigzag_decode(u.astype(U64))), pos


def encode_fastpfor_coord_delta_zigzag(xy: np.ndarray) -> bytes:
    from .codecs import coord_delta_encode, zigzag_encode

    zz = zigzag_encode(coord_delta_encode(xy))
    if len(zz) and int(zz.max()) >= (1 << 32):
        raise OverflowError("fastpfor stream value exceeds uint32 after coord-delta+zigzag")
    return encode_fastpfor(zz.astype(np.uint32))


def decode_fastpfor_coord_delta_zigzag(buf, offset: int = 0) -> tuple[np.ndarray, int]:
    from .codecs import coord_delta_decode, zigzag_decode

    u, pos = decode_fastpfor(buf, offset)
    return coord_delta_decode(zigzag_decode(u.astype(U64))), pos
