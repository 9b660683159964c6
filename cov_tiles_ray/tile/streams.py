"""Generic stream encode/decode dispatch + size-based encoding selection.

This is the reference's per-stream "encoding-candidate argmin" (G1 in
SURVEY.md §2.6; selection sites CovtConverter.java:561-568, 911-919,
656-668, 1095-1109) as a reusable helper: every candidate is actually
encoded and the smallest wins; ties go to the candidate listed FIRST in
the candidate tuple (the tuples in ``model.format`` are ordered to mirror
the reference's tie-breaks: FastPFOR-on-tie for topology/vertex streams,
varint-on-tie for id/long streams).
"""

from __future__ import annotations

import numpy as np

from ..functions import codecs as C
from ..functions import fastpfor as F
from ..model.format import StreamEncoding

I64 = np.int64
U64 = np.uint64


def encode_stream(values: np.ndarray, encoding: StreamEncoding, interleaved: bool = False) -> bytes:
    """Encode an int64 array with the given stream encoding.

    ``interleaved`` selects the coordinate-pair delta predictor (separate
    x/y predecessors) for the delta family — used for vertex buffers.
    """
    v = np.ascontiguousarray(values, dtype=I64)
    if encoding == StreamEncoding.PLAIN:
        return v.astype("<i8").tobytes()
    if encoding == StreamEncoding.VARINT:
        return C.encode_varint(v.view(U64))
    if encoding == StreamEncoding.VARINT_ZIG_ZAG:
        return C.encode_varint_zigzag(v)
    if encoding == StreamEncoding.VARINT_DELTA:
        d = C.coord_delta_encode(v) if interleaved else C.delta_encode(v)
        if len(d) and d.min() < 0:
            raise OverflowError("VARINT_DELTA requires non-negative deltas")
        return C.encode_varint(d.view(U64))
    if encoding == StreamEncoding.VARINT_DELTA_ZIG_ZAG:
        if interleaved:
            return C.encode_varint_coord_delta_zigzag(v)
        return C.encode_varint_delta_zigzag(v)
    if encoding == StreamEncoding.RLE:
        return C.encode_rle_v1(v, signed=True)
    if encoding == StreamEncoding.BYTE_RLE:
        return C.encode_byte_rle(v.astype(np.uint8))
    if encoding == StreamEncoding.BOOLEAN_RLE:
        return C.encode_boolean_rle(v.astype(bool))
    if encoding == StreamEncoding.FAST_PFOR_DELTA:
        d = C.coord_delta_encode(v) if interleaved else C.delta_encode(v)
        if len(d) and d.min() < 0:
            raise OverflowError("FAST_PFOR_DELTA requires non-negative deltas")
        if len(d) and d.max() >= (1 << 32):
            raise OverflowError("delta exceeds uint32")
        return F.encode_fastpfor(d.astype(np.uint32))
    if encoding == StreamEncoding.FAST_PFOR_DELTA_ZIG_ZAG:
        if interleaved:
            return F.encode_fastpfor_coord_delta_zigzag(v)
        return F.encode_fastpfor_delta_zigzag(v)
    raise ValueError(f"unsupported stream encoding {encoding}")


def decode_stream(
    buf, n: int, encoding: StreamEncoding, offset: int = 0, interleaved: bool = False
) -> tuple[np.ndarray, int]:
    """Decode ``n`` int64 values; returns (values, new_offset)."""
    if encoding == StreamEncoding.PLAIN:
        raw = C._as_u8(buf)[offset : offset + 8 * n]
        return np.ascontiguousarray(raw).view("<i8"), offset + 8 * n
    if encoding == StreamEncoding.VARINT:
        u, pos = C.decode_varint(buf, n, offset)
        return u.view(I64), pos
    if encoding == StreamEncoding.VARINT_ZIG_ZAG:
        return C.decode_varint_zigzag(buf, n, offset)
    if encoding == StreamEncoding.VARINT_DELTA:
        u, pos = C.decode_varint(buf, n, offset)
        d = u.view(I64)
        return (C.coord_delta_decode(d) if interleaved else C.delta_decode(d)), pos
    if encoding == StreamEncoding.VARINT_DELTA_ZIG_ZAG:
        if interleaved:
            return C.decode_varint_coord_delta_zigzag(buf, n, offset)
        return C.decode_varint_delta_zigzag(buf, n, offset)
    if encoding == StreamEncoding.RLE:
        return C.decode_rle_v1(buf, n, signed=True, offset=offset)
    if encoding == StreamEncoding.BYTE_RLE:
        v, pos = C.decode_byte_rle(buf, n, offset)
        return v.astype(I64), pos
    if encoding == StreamEncoding.BOOLEAN_RLE:
        v, pos = C.decode_boolean_rle(buf, n, offset)
        return v.astype(I64), pos
    if encoding == StreamEncoding.FAST_PFOR_DELTA:
        u, pos = F.decode_fastpfor(buf, offset)
        d = u.astype(U64).view(I64)
        return (C.coord_delta_decode(d) if interleaved else C.delta_decode(d)), pos
    if encoding == StreamEncoding.FAST_PFOR_DELTA_ZIG_ZAG:
        if interleaved:
            return F.decode_fastpfor_coord_delta_zigzag(buf, offset)
        return F.decode_fastpfor_delta_zigzag(buf, offset)
    raise ValueError(f"unsupported stream encoding {encoding}")


def best_encoding(
    values: np.ndarray,
    candidates: tuple[StreamEncoding, ...],
    interleaved: bool = False,
) -> tuple[StreamEncoding, bytes]:
    """Encode with every candidate, return the smallest (first wins ties).

    Candidates that overflow their value-range constraints (e.g. FastPFOR's
    uint32 limit on 64-bit ids) are skipped.
    """
    best: tuple[StreamEncoding, bytes] | None = None
    for enc in candidates:
        try:
            buf = encode_stream(values, enc, interleaved=interleaved)
        except OverflowError:
            continue
        if best is None or len(buf) < len(best[1]):
            best = (enc, buf)
    if best is None:
        raise ValueError("no candidate encoding applicable")
    return best
