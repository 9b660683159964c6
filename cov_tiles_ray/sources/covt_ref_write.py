"""Writer for the reference's old-layout (layout A) ``.covt`` framing.

The inverse of ``covt_ref.parse_ref_covt``: serializes the engine's
``LayerData`` into the wire layout of the ~130 checked-in reference goldens
(``test/fixtures/*/covt``), so tiles produced here are consumable by the
reference's own parsers (decoder walk: evaluation/CovtParser.java; metadata
shape pinned against the goldens in covt_ref.py's module docstring):

    header   : version (varint) | numLayers (varint)
    layer    : name | extent | numFeatures | numColumns | column metadata...
               | stream payloads (id, then geometry in logical order, then
               property streams in metadata order)
    column   : name | dataType byte (OLD enum) | columnType byte
               | numStreams (varint)
    stream   : name | numValues (varint) | byteLength (varint)
               | encoding byte

Golden conventions reproduced (verified by round-tripping through
``parse_ref_covt``):

* polygon rings are written WITH the SFA closing vertex and ring_offsets
  count it (the reader's ``_strip_closing_vertices`` inverts this);
* vertex_buffer is globally-chained per-axis delta + zigzag varints
  (``_decode_coord_deltas`` layout-A semantics);
* PRESENT streams are little-endian packed bits under byte-RLE;
* BOOLEAN data streams are full-length packed bits (values at present
  positions);
* string columns are insertion-order dictionaries (present, data indices,
  length, dictionary concat);
* ``name:xx`` families become one LOCALIZED_DICTIONARY column with
  (present_xx, xx) stream pairs sharing one dictionary.

Per-stream encodings are selected by the same argmin-by-size rule as the
engine's own format (G1), restricted to the encodings the golden readers
support.  32-bit property types are promoted to their 64-bit forms (the
old layout has no 32-bit enum values); DOUBLE is written as old enum 2.
"""

from __future__ import annotations

import numpy as np

from ..functions import codecs as C
from ..model.format import ColumnDataType, GeometryType, LayerData, localized_base
from . import covt_ref as R

I64 = np.int64
U64 = np.uint64

_REF_VERSION = 1


def _varint(out: bytearray, v: int) -> None:
    C._append_varint(out, int(v))


def _string(out: bytearray, s: str) -> None:
    raw = s.encode("utf-8")
    _varint(out, len(raw))
    out += raw


def _enc_unsigned(vals: np.ndarray) -> tuple[int, bytes]:
    """Best golden-readable encoding for an unsigned int stream."""
    v = np.ascontiguousarray(vals, dtype=I64)
    cands: list[tuple[int, bytes]] = [
        (R._ENC_VARINT, C.encode_varint(v.view(U64))),
        (R._ENC_RLE, C.encode_rle_v1(v, signed=False)),
    ]
    if len(v) and (np.diff(v) >= 0).all() and v[0] >= 0:
        d = C.delta_encode(v)
        cands.append((R._ENC_VARINT_DELTA, C.encode_varint(d.view(U64))))
    if len(v) >= _FPF_MIN_VALUES:
        fp = _fastpfor_zz_delta(v)
        if fp is not None:
            cands.append((R._ENC_FASTPFOR_DELTA_ZZ, fp))
    return min(cands, key=lambda c: len(c[1]))


def _enc_signed(vals: np.ndarray) -> tuple[int, bytes]:
    v = np.ascontiguousarray(vals, dtype=I64)
    cands = [
        (R._ENC_VARINT_ZZ, C.encode_varint_zigzag(v)),
        (R._ENC_RLE, C.encode_rle_v1(v, signed=True)),
        (R._ENC_VARINT_DELTA_ZZ, C.encode_varint_delta_zigzag(v)),
    ]
    if len(v) >= _FPF_MIN_VALUES:
        fp = _fastpfor_zz_delta(v)
        if fp is not None:
            cands.append((R._ENC_FASTPFOR_DELTA_ZZ, fp))
    return min(cands, key=lambda c: len(c[1]))


# ---------------------------------------------------------------------------
# JavaFastPFOR-compatible encoder: Composition(FastPFOR(), VariableByte())
# (exact inverse of covt_ref._decode_fastpfor_ints; layout pinned there)
# ---------------------------------------------------------------------------

_FPF_BLOCK = 256
_FPF_PAGE = 65536
_FPF_MIN_VALUES = 64  # below this the VB-only stream can't beat varints
U32 = np.uint32


def _pack_bits(vals: np.ndarray, b: int) -> np.ndarray:
    """Tightly pack b-bit values LSB-first across u32 words (inverse of
    covt_ref._unpack_bits)."""
    count = len(vals)
    if b == 0 or count == 0:
        return np.zeros(0, dtype=U32)
    if b == 32:
        return vals.astype(U32)
    nw = (count * b + 31) >> 5
    out = np.zeros(nw + 1, dtype=np.uint64)
    bitpos = np.arange(count, dtype=np.int64) * b
    wi = bitpos >> 5
    sh = (bitpos & 31).astype(np.uint64)
    v = vals.astype(np.uint64)
    np.bitwise_or.at(out, wi, v << sh)
    np.bitwise_or.at(out, wi + 1, v >> (np.uint64(32) - sh))
    return (out[:nw] & np.uint64(0xFFFFFFFF)).astype(U32)


def _vb_tail(vals: np.ndarray) -> bytes:
    """lemire VariableByte: 7-bit groups LSB-first, SET high bit terminates
    a value (inverted continuation vs LEB128)."""
    out = bytearray()
    for v in vals.tolist():
        while v >= 128:
            out.append(v & 0x7F)
            v >>= 7
        out.append(v | 0x80)
    return bytes(out)


def _encode_fpf_page(vals: np.ndarray, words: list[np.ndarray]) -> None:
    """One FastPFOR page (<= 65536 values, multiple of 256): data words,
    then the exception area (meta byte container, bitmap, per-width packed
    exception arrays)."""
    nblocks = len(vals) // _FPF_BLOCK
    meta = bytearray()
    data: list[np.ndarray] = []
    ex_by_width: dict[int, list[np.ndarray]] = {}
    for blk in range(nblocks):
        v = vals[blk * _FPF_BLOCK : (blk + 1) * _FPF_BLOCK]
        maxbits = int(v.max()).bit_length()
        # choose b by encoded-bit cost (any legal b decodes; this mirrors
        # JavaFastPFOR's getBestBFromData shape: meta positions cost 8 bits
        # per exception + (maxbits-b) packed bits each)
        best_b, best_cost = maxbits, maxbits * _FPF_BLOCK
        for b in range(maxbits - 1, -1, -1):
            cexcept = int((v >> b != 0).sum()) if b else int((v != 0).sum())
            if cexcept > 255:
                break
            cost = b * _FPF_BLOCK + cexcept * (8 + (maxbits - b)) + 8
            if cost < best_cost:
                best_b, best_cost = b, cost
        b = best_b
        if b == maxbits:
            meta += bytes([b, 0])
        else:
            positions = np.flatnonzero(v >> b) if b else np.flatnonzero(v)
            cexcept = len(positions)
            meta += bytes([b, cexcept, maxbits]) + bytes(positions.tolist())
            width = maxbits - b
            if width > 1:  # width-1 exceptions are implied top bits
                ex_by_width.setdefault(width, []).append(v[positions] >> b)
        data.append(_pack_bits(v & ((np.uint64(1) << np.uint64(b)) - np.uint64(1)) if b < 32 else v, b))
    datawords = np.concatenate(data) if data else np.zeros(0, dtype=U32)
    words.append(np.array([1 + len(datawords)], dtype=U32))  # wheremeta
    words.append(datawords)
    # meta byte container: serialized little-endian per u32 word
    words.append(np.array([len(meta)], dtype=U32))
    pad = (-len(meta)) % 4
    words.append(np.frombuffer(bytes(meta) + b"\x00" * pad, dtype="<u4").astype(U32))
    bitmap = 0
    for width in ex_by_width:
        bitmap |= 1 << (width - 1)
    words.append(np.array([bitmap], dtype=U32))
    for width in sorted(ex_by_width):
        ex = np.concatenate(ex_by_width[width])
        words.append(np.array([len(ex)], dtype=U32))
        words.append(_pack_bits(ex, width))


def encode_fastpfor_ref(vals: np.ndarray) -> bytes:
    """uint32 values -> Composition(FastPFOR, VariableByte) stream as
    big-endian u32 words — bit-compatible with the goldens' FastPFOR
    streams (EncodingUtils.java:149-188) and with covt_ref's decoder."""
    v = np.ascontiguousarray(vals, dtype=U32)
    n = len(v)
    fp_count = n - (n % _FPF_BLOCK)
    words: list[np.ndarray] = []
    words.append(np.array([fp_count], dtype=U32))  # zero count word for short streams
    pos = 0
    while pos < fp_count:
        take = min(_FPF_PAGE, fp_count - pos)
        _encode_fpf_page(v[pos : pos + take], words)
        pos += take
    vb = _vb_tail(v[fp_count:])
    pad = (-len(vb)) % 4
    words.append(np.frombuffer(vb + b"\x00" * pad, dtype="<u4").astype(U32))
    return np.concatenate(words).astype(">u4").tobytes()


def _fastpfor_zz_delta(vals: np.ndarray) -> bytes | None:
    """Int-stream FASTPFOR_DELTA_ZZ payload (reader: cumsum(unzigzag))."""
    v = np.ascontiguousarray(vals, dtype=I64)
    d = np.diff(v, prepend=I64(0))
    zz = ((d << 1) ^ (d >> 63)).view(U64)
    if len(zz) and int(zz.max()) >= (1 << 32):
        return None
    return encode_fastpfor_ref(zz.astype(U32))


def _fastpfor_coords(vb: np.ndarray) -> bytes | None:
    """Coord-stream FASTPFOR_DELTA_ZZ payload: per-axis global delta
    chains, interleaved, zigzag (reader: _decode_coord_deltas)."""
    v = np.ascontiguousarray(vb, dtype=I64)
    d = np.empty_like(v)
    d[0::2] = np.diff(v[0::2], prepend=I64(0))
    d[1::2] = np.diff(v[1::2], prepend=I64(0))
    zz = ((d << 1) ^ (d >> 63)).view(U64)
    if len(zz) and int(zz.max()) >= (1 << 32):
        return None
    return encode_fastpfor_ref(zz.astype(U32))


def _present_bits(mask: np.ndarray) -> bytes:
    packed = np.packbits(np.ascontiguousarray(mask, dtype=bool), bitorder="little")
    return C.encode_byte_rle(packed)


def _vertex_delta_zz(vb: np.ndarray) -> bytes:
    """Layout-A vertex buffer: per-axis GLOBAL delta chains, interleaved,
    zigzag varints (covt_ref._decode_coord_deltas inverse)."""
    v = np.ascontiguousarray(vb, dtype=I64)
    d = np.empty_like(v)
    d[0::2] = np.diff(v[0::2], prepend=I64(0))
    d[1::2] = np.diff(v[1::2], prepend=I64(0))
    return C.encode_varint(((d << 1) ^ (d >> 63)).view(U64))


def _close_rings(layer: LayerData) -> tuple[np.ndarray, np.ndarray | None]:
    """Re-add the SFA closing vertex to every polygon ring (the golden
    convention; the reader's ``_strip_closing_vertices`` inverts it).

    Walks the feature structure exactly like covt_ref._part_lengths so
    mixed layers (lines + polygons sharing one layer) close ONLY their
    polygon rings.  Returns (vertex_buffer, ring_offsets+1)."""
    ro = layer.ring_offsets
    if ro is None or len(ro) == 0:
        return np.asarray(layer.vertex_buffer, dtype=I64), None
    ro = np.asarray(ro, dtype=I64)
    vb = np.asarray(layer.vertex_buffer, dtype=I64).reshape(-1, 2)
    gt = np.asarray(layer.geometry_types)
    go = layer.geometry_offsets
    po = layer.part_offsets
    gi = pi = ri = 0
    units: list[tuple[int, bool]] = []  # (vertex count, is_ring)
    for t in gt:
        t = int(t)
        if t == GeometryType.POINT:
            units.append((1, False))
        elif t == GeometryType.MULTIPOINT:
            n = int(go[gi]); gi += 1
            units.extend([(1, False)] * n)
        elif t == GeometryType.LINESTRING:
            units.append((int(po[pi]), False)); pi += 1
        elif t == GeometryType.MULTILINESTRING:
            n = int(go[gi]); gi += 1
            for _ in range(n):
                units.append((int(po[pi]), False)); pi += 1
        elif t == GeometryType.POLYGON:
            nr = int(po[pi]); pi += 1
            for _ in range(nr):
                units.append((int(ro[ri]), True)); ri += 1
        else:  # MULTIPOLYGON
            npoly = int(go[gi]); gi += 1
            for _ in range(npoly):
                nr = int(po[pi]); pi += 1
                for _ in range(nr):
                    units.append((int(ro[ri]), True)); ri += 1
    pieces = []
    s = 0
    for ln, is_ring in units:
        seg = vb[s : s + ln]
        s += ln
        pieces.append(np.concatenate([seg, seg[:1]]) if is_ring else seg)
    return np.concatenate(pieces).reshape(-1), ro + 1


_NEW2OLD_DT = {
    int(ColumnDataType.STRING): R._DT_STRING,
    int(ColumnDataType.FLOAT): R._DT_FLOAT,
    int(ColumnDataType.DOUBLE): R._DT_DOUBLE,
    int(ColumnDataType.INT_64): R._DT_INT64,
    int(ColumnDataType.UINT_64): R._DT_UINT64,
    int(ColumnDataType.INT_32): R._DT_INT64,  # promoted: no 32-bit old enums
    int(ColumnDataType.UINT_32): R._DT_UINT64,
    int(ColumnDataType.BOOLEAN): R._DT_BOOL,
}


class _Col:
    """One column's metadata + payload accumulator."""

    def __init__(self, name: str, dt: int, ct: int):
        self.name = name
        self.dt = dt
        self.ct = ct
        self.streams: list[tuple[str, int, int, bytes]] = []  # (name, nv, enc, buf)

    def add(self, sname: str, nv: int, enc: int, buf: bytes) -> None:
        self.streams.append((sname, nv, enc, buf))


def _dict_indices(values: np.ndarray) -> tuple[np.ndarray, list[str]]:
    seen: dict[str, int] = {}
    idx = np.empty(len(values), dtype=I64)
    for i, s in enumerate(values):
        s = str(s)
        j = seen.get(s)
        if j is None:
            j = len(seen)
            seen[s] = j
        idx[i] = j
    return idx, list(seen)


def _add_dictionary(col: _Col, distinct: list[str]) -> None:
    raws = [s.encode("utf-8") for s in distinct]
    lengths = np.array([len(r) for r in raws], dtype=I64)
    enc, buf = _enc_unsigned(lengths)
    col.add("length", len(distinct), enc, buf)
    col.add("dictionary", len(distinct), R._ENC_PLAIN, b"".join(raws))


def _ice_streams(vb: np.ndarray) -> tuple[int, np.ndarray, np.ndarray] | None:
    """ICE candidate: dedupe vertices into a Hilbert-ordered dictionary.
    Returns (n_dict_vertices, offsets, dict_vertex_buffer) — or None when
    the dictionary cannot win (no repeats)."""
    from ..functions import sfc

    xy = vb.reshape(-1, 2)
    x, y = xy[:, 0], xy[:, 1]
    if len(x) < 8:
        return None
    # uint64 pack: (x + 2^31) << 32 overflows int64 for every x >= 0
    key = ((x.astype(np.int64) + (1 << 31)).astype(np.uint64) << np.uint64(32)) | (
        (y.astype(np.int64) + (1 << 31)).astype(np.uint64)
    )
    uk, inverse = np.unique(key, return_inverse=True)
    if len(uk) > 0.95 * len(x):
        return None  # nearly all unique: the offsets stream cannot pay off
    dx = (uk >> np.uint64(32)).astype(I64) - (1 << 31)
    dy = (uk & np.uint64(0xFFFFFFFF)).astype(I64) - (1 << 31)
    # dictionary in SFC order when in domain (golden convention: compact
    # deltas); any consistent order round-trips, so out-of-domain coords
    # just keep packed-key order
    span = max(int(np.abs(dx).max()), int(np.abs(dy).max())) if len(dx) else 0
    num_bits = max(span.bit_length() + 1, 2)
    if num_bits <= 16:
        perm = np.argsort(sfc.hilbert_encode_signed(dx, dy, num_bits), kind="stable")
        inv_perm = np.empty_like(perm)
        inv_perm[perm] = np.arange(len(perm))
        dx, dy = dx[perm], dy[perm]
        offsets = inv_perm[inverse]
    else:
        offsets = inverse
    dict_vb = np.empty(2 * len(dx), dtype=I64)
    dict_vb[0::2], dict_vb[1::2] = dx, dy
    return len(dx), offsets.astype(I64), dict_vb


def _geometry_column(layer: LayerData) -> _Col:
    vb, ro_closed = _close_rings(layer)
    col = _Col("geometry", R._DT_GEOM, R._CT_PLAIN)
    # metadata AND payloads in the reader's logical order (covt_ref
    # _GEOM_PAYLOAD_ORDER) — some goldens scramble metadata order, the
    # reader tolerates it, but writing logically keeps both walks aligned
    col.add(
        "geometry_types",
        layer.num_features,
        R._ENC_BYTE_RLE,
        C.encode_byte_rle(np.ascontiguousarray(layer.geometry_types, dtype=np.uint8)),
    )
    for sname, vals in (
        ("geometry_offsets", layer.geometry_offsets),
        ("part_offsets", layer.part_offsets),
        ("ring_offsets", ro_closed if ro_closed is not None else layer.ring_offsets),
    ):
        if vals is not None and len(vals):
            enc, buf = _enc_unsigned(np.asarray(vals, dtype=I64))
            col.add(sname, len(vals), enc, buf)
    # plain vs ICE by encoded size — the reference's own keep-the-smaller
    # rule (CovtConverter.java:227-236), restricted to golden-readable encs
    plain_enc, plain_buf = _coord_candidates(vb)
    ice = _ice_streams(vb)
    if ice is not None:
        n_dict, offsets, dict_vb = ice
        off_enc, off_buf = _enc_unsigned(offsets)
        dict_enc, dict_buf = _coord_candidates(dict_vb)
        if len(off_buf) + len(dict_buf) < len(plain_buf):
            col.ct = R._CT_ICE
            col.add("vertex_offsets", len(offsets), off_enc, off_buf)
            # metadata quirk: ICE vertex_buffer numValues counts VERTICES
            # (the reader doubles it back, covt_ref._parse_metadata_a)
            col.add("vertex_buffer", n_dict, dict_enc, dict_buf)
            return col
    col.add("vertex_buffer", len(vb), plain_enc, plain_buf)
    return col


def _coord_candidates(vb: np.ndarray) -> tuple[int, bytes]:
    """Interleaved coordinate stream: varint vs FastPFOR over the same
    per-axis global zigzag delta chains."""
    cands = [(R._ENC_VARINT_DELTA_ZZ, _vertex_delta_zz(vb))]
    if len(vb) >= _FPF_MIN_VALUES:
        fp = _fastpfor_coords(vb)
        if fp is not None:
            cands.append((R._ENC_FASTPFOR_DELTA_ZZ, fp))
    return min(cands, key=lambda c: len(c[1]))


def _property_columns(layer: LayerData) -> list[_Col]:
    n = layer.num_features
    # group string columns into localization families like the golden
    # writer, but ONLY colon-form members (name, name:de, ...): the old
    # layout's member streams carry just the suffix, so an underscore
    # spelling (name_de) could not be reconstructed — the goldens merged
    # those irrecoverably (covt_ref._canonical_props documents the damage);
    # we keep underscore columns standalone instead of reproducing the bug
    fams: dict[str, list[str]] = {}
    for name, pc in layer.properties.items():
        if int(pc.data_type) != int(ColumnDataType.STRING):
            continue
        base = localized_base(name)
        if name == base or name.startswith(base + ":"):
            fams.setdefault(base, []).append(name)
    loc_members = {m for base, ms in fams.items() if len(ms) >= 2 for m in ms}

    cols: list[_Col] = []
    done_fams: set[str] = set()
    for name, pc in layer.properties.items():
        dt_new = int(pc.data_type)
        present = np.ascontiguousarray(pc.present, dtype=bool)
        if name in loc_members:
            base = localized_base(name)
            if base in done_fams:
                continue
            done_fams.add(base)
            col = _Col(base, R._DT_STRING, R._CT_LOCALIZED)
            members = fams[base]
            all_vals = np.concatenate(
                [np.asarray(layer.properties[m].values, dtype=object) for m in members]
            )
            idx_all, distinct = _dict_indices(all_vals)
            off = 0
            for m in members:
                mpc = layer.properties[m]
                mpresent = np.ascontiguousarray(mpc.present, dtype=bool)
                cnt = len(mpc.values)
                midx = idx_all[off : off + cnt]
                off += cnt
                # member stream name: suffix after the family base, or the
                # base itself for the bare column — the reader maps
                # vname == cname back to the base property name
                # (covt_ref._decode_localized)
                suffix = base if m == base else m[len(base) + 1 :]
                col.add(f"present_{suffix}", n, R._ENC_BOOL_RLE, _present_bits(mpresent))
                enc, buf = _enc_unsigned(midx)
                col.add(suffix, cnt, enc, buf)
            _add_dictionary(col, distinct)
            cols.append(col)
            continue
        old_dt = _NEW2OLD_DT.get(dt_new)
        if old_dt is None:
            raise ValueError(f"unsupported property data type {dt_new}")
        if old_dt == R._DT_STRING:
            col = _Col(name, R._DT_STRING, R._CT_DICT)
            col.add("present", n, R._ENC_BOOL_RLE, _present_bits(present))
            idx, distinct = _dict_indices(np.asarray(pc.values, dtype=object))
            enc, buf = _enc_unsigned(idx)
            col.add("data", len(idx), enc, buf)
            _add_dictionary(col, distinct)
        elif old_dt == R._DT_BOOL:
            col = _Col(name, R._DT_BOOL, R._CT_PLAIN)
            col.add("present", n, R._ENC_BOOL_RLE, _present_bits(present))
            full = np.zeros(n, dtype=bool)
            full[present] = np.asarray(pc.values, dtype=bool)
            col.add("data", n, R._ENC_BOOL_RLE, _present_bits(full))
        elif old_dt == R._DT_FLOAT:
            col = _Col(name, R._DT_FLOAT, R._CT_PLAIN)
            col.add("present", n, R._ENC_BOOL_RLE, _present_bits(present))
            col.add(
                "data",
                len(pc.values),
                R._ENC_PLAIN,
                np.ascontiguousarray(pc.values, dtype=np.float32).astype("<f4").tobytes(),
            )
        elif old_dt == R._DT_DOUBLE:
            col = _Col(name, R._DT_DOUBLE, R._CT_PLAIN)
            col.add("present", n, R._ENC_BOOL_RLE, _present_bits(present))
            col.add(
                "data",
                len(pc.values),
                R._ENC_PLAIN,
                np.ascontiguousarray(pc.values, dtype=np.float64).astype("<f8").tobytes(),
            )
        else:  # INT64 / UINT64
            col = _Col(name, old_dt, R._CT_PLAIN)
            col.add("present", n, R._ENC_BOOL_RLE, _present_bits(present))
            vals = np.asarray(pc.values)
            if old_dt == R._DT_INT64:
                enc, buf = _enc_signed(vals.astype(I64))
            else:
                enc, buf = _enc_unsigned(vals.astype(U64).view(I64))
            col.add("data", len(vals), enc, buf)
        cols.append(col)
    return cols


def encode_ref_layer(layer: LayerData, out: bytearray) -> None:
    cols: list[_Col] = []
    if layer.ids is not None:
        idc = _Col("id", R._DT_UINT64, R._CT_PLAIN)
        enc, buf = _enc_unsigned(np.ascontiguousarray(layer.ids, dtype=U64).view(I64))
        idc.add("data", layer.num_features, enc, buf)
        cols.append(idc)
    cols.append(_geometry_column(layer))
    cols.extend(_property_columns(layer))

    _string(out, layer.name)
    _varint(out, layer.extent)
    _varint(out, layer.num_features)
    _varint(out, len(cols))
    for col in cols:
        _string(out, col.name)
        out.append(col.dt)
        out.append(col.ct)
        _varint(out, len(col.streams))
        for sname, nv, enc, buf in col.streams:
            _string(out, sname)
            _varint(out, nv)
            _varint(out, len(buf))
            out.append(enc)
    for col in cols:
        for _sname, _nv, _enc, buf in col.streams:
            out += buf


def encode_ref_tile(layers: list[LayerData]) -> bytes:
    """Serialize layers as a reference-layout (layout A) .covt tile."""
    out = bytearray()
    _varint(out, _REF_VERSION)
    _varint(out, len(layers))
    for layer in layers:
        encode_ref_layer(layer, out)
    return bytes(out)
