"""COVT-R tile decoder (pure kernel; inverse of encode.py).

Decodes straight into numpy/Arrow-shaped columns — the model is the
reference's columnar TS decoder (parser/js/src/decoder/covtDecoder.ts:32-87,
layerTable.ts), never per-feature objects.  Stream byte lengths come from
metadata (we trust byteLength rather than re-encoding to find it — the
reference's decode-side hack at DecodingUtils.java:268-270 is deliberately
not reproduced; see SURVEY.md §7.5).
"""

from __future__ import annotations

import numpy as np

from ..functions import codecs as C
from ..functions import sfc
from ..model.format import (
    CHUNKED_TILE_MARKER,
    ColumnDataType,
    ColumnType,
    LayerData,
    PropertyColumn,
    StreamEncoding,
    StreamType,
    localized_base,
)
from .encode import _sfc_num_bits
from .streams import decode_stream

I64 = np.int64


def _as_frame_bytes(buf) -> bytes:
    """Normalize a tile buffer to ``bytes`` ONCE per tile: scalar framing
    reads index python bytes (~3x faster than numpy scalar extraction);
    vectorized stream decoders np.frombuffer the same object zero-copy."""
    if isinstance(buf, (bytes, bytearray)):
        return buf
    if isinstance(buf, memoryview):
        return bytes(buf)
    return np.ascontiguousarray(buf, dtype=np.uint8).tobytes()


def _read_streams(b: bytes, pos: int, n_streams: int):
    """Read stream descriptors; returns (list of (type, enc, nvals, blen), pos).

    Types/encodings stay plain ints (IntEnum-compatible in every comparison
    and dict lookup) — constructing enums per stream dominated decode time
    on many-small-tile workloads."""
    metas = []
    for _ in range(n_streams):
        desc = b[pos]
        nvals, p = C.read_varint_py(b, pos + 1)
        blen, pos = C.read_varint_py(b, p)
        metas.append((desc >> 4, desc & 0xF, nvals, blen))
    return metas, pos


def _decode_geometry(col_type: ColumnType, extent: int, data: dict) -> dict:
    """Resolve ICE indirection back to a plain interleaved vertex buffer."""
    out = {
        "geometry_types": data[StreamType.GEOMETRY_TYPES].astype(np.uint8),
        "geometry_offsets": data.get(StreamType.GEOMETRY_OFFSETS),
        "part_offsets": data.get(StreamType.PART_OFFSETS),
        "ring_offsets": data.get(StreamType.RING_OFFSETS),
    }
    if col_type == ColumnType.PLAIN:
        out["vertex_buffer"] = data[StreamType.VERTEX_BUFFER].astype(np.int32)
        return out
    offsets = data[StreamType.VERTEX_OFFSETS]
    if col_type == ColumnType.ICE_MORTON_CODE:
        codes = data[StreamType.VERTEX_BUFFER]
        num_bits = _sfc_num_bits(extent)
        dx, dy = sfc.morton_decode_signed(codes.view(np.uint64), num_bits)
    elif col_type == ColumnType.ICE:
        dict_vb = data[StreamType.VERTEX_BUFFER]
        dx, dy = dict_vb[0::2], dict_vb[1::2]
    else:
        raise ValueError(f"unsupported geometry column type {col_type}")
    vb = np.empty(2 * len(offsets), dtype=np.int32)
    vb[0::2] = dx[offsets]
    vb[1::2] = dy[offsets]
    out["vertex_buffer"] = vb
    return out


def decode_layer(buf, pos: int, ids=None) -> tuple[LayerData, int]:
    """``ids``: SidecarIds required for tiles written with optimized
    (TileJSON-id) metadata — the J3 broadcast-small-side lookup."""
    b = _as_frame_bytes(buf)
    header = b[pos]
    pos += 1
    version = header >> 1
    optimized = bool(header & 1)
    if optimized:
        if ids is None:
            raise ValueError("optimized metadata requires the TileJSON sidecar (SidecarIds)")
        lid, pos = C.read_varint_py(b, pos)
        name = ids.layer_names[lid]
    else:
        name, pos = C.decode_string(b, pos)
    extent, pos = C.read_varint_py(b, pos)
    num_features, pos = C.read_varint_py(b, pos)
    num_columns, pos = C.read_varint_py(b, pos)

    # pass 1: all column/stream descriptors
    columns = []
    for _ in range(num_columns):
        cid, pos = C.read_varint_py(b, pos)
        col_name = None
        if cid >= 2:
            if optimized:
                col_name = ids.column_name(lid, cid)
            else:
                col_name, pos = C.decode_string(b, pos)
        desc = b[pos]
        pos += 1
        # plain ints, not enum constructions (IntEnum-compatible in every
        # comparison and as PropertyColumn.data_type; constructing 2 enums
        # per column measurably dents many-tiny-tile decode)
        dt = (desc >> 3) & 0xF
        ct = desc & 0x7
        ns, pos = C.read_varint_py(b, pos)
        metas, pos = _read_streams(b, pos, ns)
        columns.append((cid, col_name, dt, ct, metas))

    # pass 2: stream payloads in metadata order
    layer = LayerData(
        name=name,
        extent=extent,
        geometry_types=np.empty(0, dtype=np.uint8),
        vertex_buffer=np.empty(0, dtype=np.int32),
    )
    fam_dicts: dict[str, np.ndarray] = {}  # localized shared dicts by family prefix
    for cid, col_name, dt, ct, metas in columns:
        data: dict[StreamType, np.ndarray] = {}
        raw: dict[StreamType, tuple] = {}
        for stype, senc, nvals, blen in metas:
            interleaved = stype == StreamType.VERTEX_BUFFER and ct != ColumnType.ICE_MORTON_CODE
            if dt == ColumnDataType.FLOAT and stype == StreamType.DATA:
                vals, _ = C.decode_floats_le(b, nvals, pos)
            elif dt == ColumnDataType.DOUBLE and stype == StreamType.DATA:
                vals, _ = C.decode_doubles_le(b, nvals, pos)
            elif stype == StreamType.DICTIONARY:
                if senc == StreamEncoding.TOKEN_DICT:
                    strings, _ = C.decode_token_dict(b, nvals, pos)
                    vals = np.array(strings, dtype=object)
                else:
                    vals = b[pos : pos + blen]  # raw utf-8 concat; lengths decoded separately
            elif stype in (StreamType.PRESENT,) or (
                stype == StreamType.DATA and dt == ColumnDataType.BOOLEAN
            ):
                vals, _ = C.decode_boolean_rle(b, nvals, pos)
            else:
                vals, _ = decode_stream(b, nvals, senc, pos, interleaved=interleaved)
            data[stype] = vals
            raw[stype] = (senc, nvals, blen)
            pos += blen

        if cid == 0:  # id column
            layer.ids = data[StreamType.DATA].view(np.uint64)
        elif cid == 1:  # geometry
            geo = _decode_geometry(ct, extent, data)
            layer.geometry_types = geo["geometry_types"]
            layer.vertex_buffer = geo["vertex_buffer"]
            layer.geometry_offsets = geo["geometry_offsets"]
            layer.part_offsets = geo["part_offsets"]
            layer.ring_offsets = geo["ring_offsets"]
        else:
            present = data[StreamType.PRESENT].astype(bool)
            if ct == ColumnType.LOCALIZED_DICTIONARY:
                # shared-dict family: the head column carries LENGTH +
                # DICTIONARY; members resolve by family prefix (M15)
                prefix = localized_base(col_name)
                if StreamType.DICTIONARY in data:
                    n_dict = raw[StreamType.DICTIONARY][1]
                    fam_dicts[prefix] = np.array(
                        _gather_dictionary(data, n_dict), dtype=object
                    )
                idx = data[StreamType.DATA].astype(np.int64)
                shared = fam_dicts[prefix]
                values = shared[idx] if len(idx) else np.empty(0, dtype=object)
            elif dt == ColumnDataType.STRING:
                n_dict = raw[StreamType.DICTIONARY][1]
                strings = _gather_dictionary(data, n_dict)
                idx = data[StreamType.DATA].astype(np.int64)
                values = np.array(strings, dtype=object)[idx] if n_dict else np.empty(0, dtype=object)
            elif dt == ColumnDataType.BOOLEAN:
                values = data[StreamType.DATA].astype(bool)
            elif dt in (ColumnDataType.FLOAT, ColumnDataType.DOUBLE):
                values = data[StreamType.DATA]
            else:
                values = data[StreamType.DATA]
            layer.properties[col_name] = PropertyColumn(data_type=dt, present=present, values=values)
    return layer, pos


def _gather_dictionary(data: dict, n_dict: int) -> list[str]:
    d = data[StreamType.DICTIONARY]
    if isinstance(d, np.ndarray) and d.dtype == object:
        return list(d)  # TOKEN_DICT stream decoded straight to strings
    lengths = data[StreamType.LENGTH].astype(np.int64)
    concat = bytes(d)
    out = []
    p = 0
    for ln in lengths.tolist():
        out.append(concat[p : p + ln].decode("utf-8"))
        p += ln
    return out


def scan_tile_streams(buf, ids=None) -> list[tuple]:
    """Metadata-only framing walk: one row per stream WITHOUT decoding any
    payload (pos skips byteLength) — the cheap scan behind the per-stream
    size analytics query (reference role: MvtEvaluation.java's offline
    per-layer/per-stream breakdown, VERDICT r2 #7).

    Returns ``(layer, column, stream_type:int, stream_encoding:int,
    num_values:int, byte_length:int)`` tuples; id/geometry columns are
    labeled ``"<id>"`` / ``"<geometry>"``."""
    b = _as_frame_bytes(buf)
    _version, pos = C.read_varint_py(b, 0)
    if _version == CHUNKED_TILE_MARKER:
        rows: list[tuple] = []
        for chunk in _read_chunk_frame(b):
            rows.extend(scan_tile_streams(chunk, ids))
        return rows
    num_layers, pos = C.read_varint_py(b, pos)
    rows: list[tuple] = []
    for _ in range(num_layers):
        header = b[pos]
        pos += 1
        optimized = bool(header & 1)
        if optimized:
            if ids is None:
                raise ValueError("optimized metadata requires the TileJSON sidecar")
            lid, pos = C.read_varint_py(b, pos)
            name = ids.layer_names[lid]
        else:
            name, pos = C.decode_string(b, pos)
        _extent, pos = C.read_varint_py(b, pos)
        _nf, pos = C.read_varint_py(b, pos)
        num_columns, pos = C.read_varint_py(b, pos)
        # pass 1: all column/stream descriptors (same two-pass layout as
        # decode_layer — payloads follow ALL descriptors)
        payload_bytes = 0
        for _ in range(num_columns):
            cid, pos = C.read_varint_py(b, pos)
            if cid == 0:
                col_name = "<id>"
            elif cid == 1:
                col_name = "<geometry>"
            elif optimized:
                col_name = ids.column_name(lid, cid)
            else:
                col_name, pos = C.decode_string(b, pos)
            pos += 1  # dataType|columnType descriptor byte
            ns, pos = C.read_varint_py(b, pos)
            metas, pos = _read_streams(b, pos, ns)
            for stype, senc, nvals, blen in metas:
                rows.append((name, col_name, stype, senc, nvals, blen))
                payload_bytes += blen
        # pass 2 equivalent: skip the payload region wholesale
        pos += payload_bytes
    return rows


def _concat_layer_parts(parts: list[LayerData]) -> LayerData:
    """Concatenate decoded row-range parts of ONE layer in chunk order
    (chunks are fid-ordered slices, so plain concatenation restores the
    canonical order — no sort)."""
    if len(parts) == 1:
        return parts[0]

    def cat_opt(attr):
        vals = [getattr(p, attr) for p in parts]
        if all(v is None for v in vals):
            return None
        arrs = [np.asarray(v) for v in vals if v is not None and len(v)]
        if not arrs:
            return np.asarray(next(v for v in vals if v is not None))
        return np.concatenate(arrs)

    props: dict[str, PropertyColumn] = {}
    for name, c0 in parts[0].properties.items():
        present = np.concatenate(
            [np.asarray(p.properties[name].present, dtype=bool) for p in parts]
        )
        values = np.concatenate(
            [np.asarray(p.properties[name].values) for p in parts]
        )
        props[name] = PropertyColumn(c0.data_type, present, values)
    ids = (
        None
        if any(p.ids is None for p in parts)
        else np.concatenate([np.asarray(p.ids) for p in parts])
    )
    return LayerData(
        name=parts[0].name,
        extent=parts[0].extent,
        geometry_types=np.concatenate([p.geometry_types for p in parts]),
        vertex_buffer=np.concatenate([np.asarray(p.vertex_buffer) for p in parts]),
        geometry_offsets=cat_opt("geometry_offsets"),
        part_offsets=cat_opt("part_offsets"),
        ring_offsets=cat_opt("ring_offsets"),
        ids=ids,
        properties=props,
    )


def _read_chunk_frame(b: bytes) -> list[bytes]:
    """Split a chunked tile frame into its chunk buffers."""
    _marker, pos = C.read_varint_py(b, 0)
    n_chunks, pos = C.read_varint_py(b, pos)
    lens = []
    for _ in range(n_chunks):
        ln, pos = C.read_varint_py(b, pos)
        lens.append(ln)
    out = []
    for ln in lens:
        out.append(b[pos : pos + ln])
        pos += ln
    if pos != len(b):
        raise ValueError("chunked tile frame length mismatch")
    return out


def decode_tile(buf, ids=None) -> list[LayerData]:
    b = _as_frame_bytes(buf)
    version, pos = C.read_varint_py(b, 0)
    if version == CHUNKED_TILE_MARKER:
        # chunked frame (model/format.py CHUNKED_TILE_MARKER): decode each
        # chunk tile and concatenate per-layer values by name in first-seen
        # order — the result is identical LayerData to the unchunked encode
        by_name: dict[str, list[LayerData]] = {}
        order: list[str] = []
        for chunk in _read_chunk_frame(b):
            for ly in decode_tile(chunk, ids):
                if ly.name not in by_name:
                    order.append(ly.name)
                    by_name[ly.name] = []
                by_name[ly.name].append(ly)
        return [_concat_layer_parts(by_name[n]) for n in order]
    num_layers, pos = C.read_varint_py(b, pos)
    layers = []
    for _ in range(num_layers):
        layer, pos = decode_layer(b, pos, ids)
        layers.append(layer)
    return layers
