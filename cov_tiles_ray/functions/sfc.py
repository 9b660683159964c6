"""Space-filling-curve kernels: Morton (z-order) and Hilbert, vectorized.

Mirrors the reference's GeometryUtils (evaluation/java/.../converter/geometry/
GeometryUtils.java:8-47): coordinates are shifted into the positive quadrant
by ``2**(num_bits-1)`` before curve encoding, so tile-local coordinates that
slightly under/overshoot the extent still map.  num_bits is 13-14 in the
reference (tile extents 4096/8192 plus margin).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64


def _spread_bits_u32(x: np.ndarray) -> np.ndarray:
    """Insert a zero bit between each bit of the low 32 bits (-> uint64)."""
    v = x.astype(U64)
    v = (v | (v << U64(16))) & U64(0x0000FFFF0000FFFF)
    v = (v | (v << U64(8))) & U64(0x00FF00FF00FF00FF)
    v = (v | (v << U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << U64(2))) & U64(0x3333333333333333)
    v = (v | (v << U64(1))) & U64(0x5555555555555555)
    return v


def _compact_bits_u64(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits_u32: keep even-indexed bits, compact to low 32."""
    v = v.astype(U64) & U64(0x5555555555555555)
    v = (v | (v >> U64(1))) & U64(0x3333333333333333)
    v = (v | (v >> U64(2))) & U64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> U64(4))) & U64(0x00FF00FF00FF00FF)
    v = (v | (v >> U64(8))) & U64(0x0000FFFF0000FFFF)
    v = (v | (v >> U64(16))) & U64(0x00000000FFFFFFFF)
    return v


def morton_encode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Bit-interleave (x in even bits, y in odd) -> uint64."""
    return _spread_bits_u32(np.asarray(x)) | (_spread_bits_u32(np.asarray(y)) << U64(1))


def morton_decode(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(codes, dtype=U64)
    return _compact_bits_u64(c), _compact_bits_u64(c >> U64(1))


def morton_encode_signed(x: np.ndarray, y: np.ndarray, num_bits: int) -> np.ndarray:
    """Quadrant-shifted Morton code (ref: GeometryUtils.encodeMorton, :24-35)."""
    shift = 1 << (num_bits - 1)
    return morton_encode(np.asarray(x, dtype=np.int64) + shift, np.asarray(y, dtype=np.int64) + shift)


def morton_decode_signed(codes: np.ndarray, num_bits: int) -> tuple[np.ndarray, np.ndarray]:
    shift = 1 << (num_bits - 1)
    x, y = morton_decode(codes)
    return x.astype(np.int64) - shift, y.astype(np.int64) - shift


def hilbert_xy2d(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Hilbert curve index for (x, y) on a 2**order grid, vectorized.

    Standard Hilbert rotation recurrence (public algorithm, e.g. Wikipedia's
    ``xy2d``); loops over ``order`` bit levels, vectorized over the array.
    """
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x, dtype=np.int64)
    s = 1 << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        x[flip] = s - 1 - x_f
        y_f = y[flip]
        y[flip] = s - 1 - y_f
        xs = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xs
        s >>= 1
    return d


def hilbert_d2xy(d: np.ndarray, order: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse Hilbert: index -> (x, y) on a 2**order grid, vectorized."""
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = 1
    while s < (1 << order):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        x[flip] = s - 1 - x_f
        y_f = y[flip]
        y[flip] = s - 1 - y_f
        xs = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = xs
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def hilbert_encode_signed(x: np.ndarray, y: np.ndarray, num_bits: int) -> np.ndarray:
    """Quadrant-shifted Hilbert index (ref: GeometryUtils.encodeHilbertIndex, :8-14)."""
    shift = 1 << (num_bits - 1)
    return hilbert_xy2d(np.asarray(x, dtype=np.int64) + shift, np.asarray(y, dtype=np.int64) + shift, num_bits)


def hilbert_decode_signed(d: np.ndarray, num_bits: int) -> tuple[np.ndarray, np.ndarray]:
    shift = 1 << (num_bits - 1)
    x, y = hilbert_d2xy(d, num_bits)
    return x - shift, y - shift
