"""Mapbox Vector Tile (MVT 2.1) wire codec over the LayerData model.

Clean-room implementation of the public MVT protobuf spec (the reference
ingests MVT via protobuf libraries — MvtUtils.java:63-132, mvtUtils.ts:17-42;
we encode AND decode so the engine can both ingest real MVT corpora and
produce the MVT-size baseline its compression numbers are defined against,
README.md:21-35 `(1 - covt/mvt)`).

Wire layout (spec: github.com/mapbox/vector-tile-spec/tree/master/2.1):

* Tile            = repeated Layer layers = 3
* Layer           = version=15 (=2), name=1, repeated Feature features=2,
                    repeated string keys=3, repeated Value values=4, extent=5
* Feature         = id=1, packed tags=2 (key/value index pairs),
                    type=3 (1 point / 2 linestring / 3 polygon),
                    packed geometry=4 (command stream)
* Value           = oneof: string=1, float=2 (f32), double=3 (f64),
                    int=4 (varint), uint=5 (varint), sint=6 (zigzag), bool=7
* geometry stream = command integers ``(id & 0x7) | (count << 3)`` with
                    MoveTo=1 LineTo=2 ClosePath=7 and zigzag-delta params;
                    the cursor resets per feature, rings drop the closing
                    vertex (same convention as LayerData / the COVT model).

MVT has no MULTIPOINT-vs-POINT distinction beyond command count and encodes
multipolygons as ring-winding runs; this codec maps LayerData's five
geometry kinds onto the MVT stream and back, recovering the same
counts-per-parent offset arrays on decode.
"""

from __future__ import annotations

import gzip as _gzip

import numpy as np

from ..functions import codecs as C
from ..model.format import ColumnDataType, GeometryType, LayerData, PropertyColumn

U64 = np.uint64
I64 = np.int64

# protobuf wire types
_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2
_WT_I32 = 5


def _tag(field: int, wt: int) -> bytes:
    return C.encode_varint_scalar((field << 3) | wt)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, _WT_LEN) + C.encode_varint_scalar(len(payload)) + payload


def _varint_field(field: int, value: int) -> bytes:
    return _tag(field, _WT_VARINT) + C.encode_varint_scalar(value)


def _zigzag32(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


# ---------------------------------------------------------------------------
# Value (property) encode
# ---------------------------------------------------------------------------


def _encode_value(dt: ColumnDataType, v) -> bytes:
    if dt == ColumnDataType.STRING:
        raw = str(v).encode("utf-8")
        return _len_field(1, raw)
    if dt == ColumnDataType.FLOAT:
        return _tag(2, _WT_I32) + np.float32(v).tobytes()
    if dt == ColumnDataType.DOUBLE:
        return _tag(3, _WT_I64) + np.float64(v).tobytes()
    if dt in (ColumnDataType.INT_32, ColumnDataType.INT_64):
        iv = int(v)
        if iv < 0:
            return _tag(6, _WT_VARINT) + C.encode_varint_scalar(((iv << 1) ^ (iv >> 63)) & ((1 << 64) - 1))
        return _varint_field(4, iv)
    if dt in (ColumnDataType.UINT_32, ColumnDataType.UINT_64):
        return _varint_field(5, int(v))
    if dt == ColumnDataType.BOOLEAN:
        return _varint_field(7, 1 if v else 0)
    raise ValueError(f"MVT cannot encode property type {dt}")


# ---------------------------------------------------------------------------
# geometry command streams
# ---------------------------------------------------------------------------


def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def _encode_path(xs: np.ndarray, ys: np.ndarray, cx: int, cy: int, close: bool) -> tuple[list[int], int, int]:
    """One MoveTo + LineTo run (+ClosePath) from absolute coords; returns
    (command ints, new cursor x, new cursor y)."""
    n = len(xs)
    dx = np.diff(xs, prepend=cx)
    dy = np.diff(ys, prepend=cy)
    zx = _zigzag32(dx)
    zy = _zigzag32(dy)
    out = [_cmd(1, 1), int(zx[0]), int(zy[0])]
    if n > 1:
        out.append(_cmd(2, n - 1))
        inter = np.empty(2 * (n - 1), dtype=np.uint64)
        inter[0::2] = zx[1:]
        inter[1::2] = zy[1:]
        out.extend(int(t) for t in inter)
    if close:
        out.append(_cmd(7, 1))
    return out, int(xs[-1]), int(ys[-1])


class _GeomCursor:
    """Walks LayerData's counts-per-parent streams feature by feature."""

    def __init__(self, layer: LayerData):
        self.types = np.asarray(layer.geometry_types)
        self.vb = np.asarray(layer.vertex_buffer, dtype=np.int64)
        self.geo = None if layer.geometry_offsets is None else np.asarray(layer.geometry_offsets, dtype=np.int64)
        self.part = None if layer.part_offsets is None else np.asarray(layer.part_offsets, dtype=np.int64)
        self.ring = None if layer.ring_offsets is None else np.asarray(layer.ring_offsets, dtype=np.int64)
        self.iv = 0  # vertex index (pairs)
        self.ig = 0
        self.ip = 0
        self.ir = 0

    def take_vertices(self, n: int) -> tuple[np.ndarray, np.ndarray]:
        s = self.iv
        self.iv += n
        return self.vb[2 * s : 2 * self.iv : 2], self.vb[2 * s + 1 : 2 * self.iv : 2]

    def next_geo(self) -> int:
        v = int(self.geo[self.ig])
        self.ig += 1
        return v

    def next_part(self) -> int:
        v = int(self.part[self.ip])
        self.ip += 1
        return v

    def next_ring(self) -> int:
        v = int(self.ring[self.ir])
        self.ir += 1
        return v


_MVT_TYPE = {
    GeometryType.POINT: 1,
    GeometryType.MULTIPOINT: 1,
    GeometryType.LINESTRING: 2,
    GeometryType.MULTILINESTRING: 2,
    GeometryType.POLYGON: 3,
    GeometryType.MULTIPOLYGON: 3,
}


def _encode_feature_geometry(gt: int, cur: _GeomCursor) -> list[int]:
    cx = cy = 0
    out: list[int] = []
    if gt == GeometryType.POINT:
        xs, ys = cur.take_vertices(1)
        out = [_cmd(1, 1), int(_zigzag32(xs)[0]), int(_zigzag32(ys)[0])]
    elif gt == GeometryType.MULTIPOINT:
        n = cur.next_geo()
        xs, ys = cur.take_vertices(n)
        dx = np.diff(xs, prepend=0)
        dy = np.diff(ys, prepend=0)
        zx, zy = _zigzag32(dx), _zigzag32(dy)
        out = [_cmd(1, n)]
        inter = np.empty(2 * n, dtype=np.uint64)
        inter[0::2] = zx
        inter[1::2] = zy
        out.extend(int(t) for t in inter)
    elif gt == GeometryType.LINESTRING:
        n = cur.next_part()
        xs, ys = cur.take_vertices(n)
        seg, cx, cy = _encode_path(xs, ys, cx, cy, close=False)
        out = seg
    elif gt == GeometryType.MULTILINESTRING:
        nlines = cur.next_geo()
        for _ in range(nlines):
            n = cur.next_part()
            xs, ys = cur.take_vertices(n)
            seg, cx, cy = _encode_path(xs, ys, cx, cy, close=False)
            out.extend(seg)
    elif gt == GeometryType.POLYGON:
        nrings = cur.next_part()
        for _ in range(nrings):
            n = cur.next_ring()
            xs, ys = cur.take_vertices(n)
            seg, cx, cy = _encode_path(xs, ys, cx, cy, close=True)
            out.extend(seg)
    elif gt == GeometryType.MULTIPOLYGON:
        npolys = cur.next_geo()
        for _ in range(npolys):
            nrings = cur.next_part()
            for _ in range(nrings):
                n = cur.next_ring()
                xs, ys = cur.take_vertices(n)
                seg, cx, cy = _encode_path(xs, ys, cx, cy, close=True)
                out.extend(seg)
    else:
        raise ValueError(f"unknown geometry type {gt}")
    return out


def encode_mvt_layer(layer: LayerData) -> bytes:
    keys = list(layer.properties.keys())
    values: list[bytes] = []
    value_index: dict[bytes, int] = {}
    # per-feature tag lists
    tags: list[list[int]] = [[] for _ in range(layer.num_features)]
    for ki, key in enumerate(keys):
        col = layer.properties[key]
        present_rows = np.nonzero(np.asarray(col.present, dtype=bool))[0]
        for vi, row in enumerate(present_rows):
            enc = _encode_value(col.data_type, col.values[vi])
            j = value_index.get(enc)
            if j is None:
                j = len(values)
                value_index[enc] = j
                values.append(enc)
            tags[row].extend((ki, j))

    # fast path: all-point layer -> fully vectorized geometry build
    types = np.asarray(layer.geometry_types)
    feats: list[bytes] = []
    cur = _GeomCursor(layer)
    ids = None if layer.ids is None else np.asarray(layer.ids, dtype=np.uint64)
    if len(types) and (types == GeometryType.POINT).all():
        vb = np.asarray(layer.vertex_buffer, dtype=np.int64)
        zx = _zigzag32(vb[0::2])
        zy = _zigzag32(vb[1::2])
        geom3 = np.empty((len(types), 3), dtype=np.uint64)
        geom3[:, 0] = _cmd(1, 1)
        geom3[:, 1] = zx
        geom3[:, 2] = zy
        for i in range(len(types)):
            body = b""
            if ids is not None:
                body += _varint_field(1, int(ids[i]))
            if tags[i]:
                body += _len_field(2, C.encode_varint(np.array(tags[i], dtype=np.uint64)))
            body += _varint_field(3, 1)
            body += _len_field(4, C.encode_varint(geom3[i]))
            feats.append(_len_field(2, body))
    else:
        for i in range(len(types)):
            body = b""
            if ids is not None:
                body += _varint_field(1, int(ids[i]))
            if tags[i]:
                body += _len_field(2, C.encode_varint(np.array(tags[i], dtype=np.uint64)))
            body += _varint_field(3, _MVT_TYPE[GeometryType(int(types[i]))])
            geom = _encode_feature_geometry(GeometryType(int(types[i])), cur)
            body += _len_field(4, C.encode_varint(np.array(geom, dtype=np.uint64)))
            feats.append(_len_field(2, body))

    parts = [_varint_field(15, 2), _len_field(1, layer.name.encode("utf-8"))]
    parts.extend(feats)
    parts.extend(_len_field(3, k.encode("utf-8")) for k in keys)
    parts.extend(_len_field(4, v) for v in values)
    parts.append(_varint_field(5, layer.extent))
    return b"".join(parts)


def encode_mvt_tile(layers: list[LayerData]) -> bytes:
    return b"".join(_len_field(3, encode_mvt_layer(ly)) for ly in layers)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _iter_fields(buf: bytes, start: int, end: int):
    pos = start
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == _WT_VARINT:
            val, pos = _read_varint(buf, pos)
            yield field, wt, val
        elif wt == _WT_LEN:
            ln, pos = _read_varint(buf, pos)
            yield field, wt, (pos, pos + ln)
            pos += ln
        elif wt == _WT_I32:
            yield field, wt, (pos, pos + 4)
            pos += 4
        elif wt == _WT_I64:
            yield field, wt, (pos, pos + 8)
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _decode_value(buf: bytes, span: tuple[int, int]):
    """-> (ColumnDataType, python value)"""
    for field, wt, payload in _iter_fields(buf, span[0], span[1]):
        if field == 1:
            return ColumnDataType.STRING, buf[payload[0] : payload[1]].decode("utf-8")
        if field == 2:
            return ColumnDataType.FLOAT, float(np.frombuffer(buf[payload[0] : payload[1]], dtype=np.float32)[0])
        if field == 3:
            return ColumnDataType.DOUBLE, float(np.frombuffer(buf[payload[0] : payload[1]], dtype=np.float64)[0])
        if field == 4:
            return ColumnDataType.INT_64, _signed64(payload)
        if field == 5:
            return ColumnDataType.UINT_64, payload
        if field == 6:
            return ColumnDataType.INT_64, (payload >> 1) ^ -(payload & 1)
        if field == 7:
            return ColumnDataType.BOOLEAN, bool(payload)
    raise ValueError("empty MVT Value")


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _unzigzag(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64)
    return ((v >> np.uint64(1)).astype(np.int64)) ^ -(v & np.uint64(1)).astype(np.int64)


def _parse_varints(buf: bytes, start: int, end: int) -> list[int]:
    """All varints in buf[start:end] as python ints.  Large spans (packed
    geometry/tag arrays of big features) go through the vectorized decoder;
    small ones take a scalar loop — per-value python appends beat numpy's
    fixed cost below ~25 values."""
    if end - start > 128:
        seg = np.frombuffer(buf, dtype=np.uint8, count=end - start, offset=start)
        n = int((seg < 0x80).sum())
        vals, _ = C.decode_varint(seg, n, 0)
        return vals.tolist()
    out: list[int] = []
    pos = start
    result = 0
    shift = 0
    while pos < end:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
        else:
            out.append(result)
            result = 0
            shift = 0
    return out


def _ring_area2_list(xs: list[int], ys: list[int]) -> int:
    """2x signed shoelace area of an open ring (python ints — exact)."""
    n = len(xs)
    s = 0
    for j in range(n):
        k = j + 1 if j + 1 < n else 0
        s += xs[j] * ys[k] - xs[k] * ys[j]
    return s


def _decode_feature_geometry(mvt_type: int, cmds: list[int]):
    """command ints -> (GeometryType, parts) where parts is a list of
    (xs, ys) absolute-coordinate paths (rings exclude the closing vertex).

    Pure-scalar walk: the median feature has tens of vertices, where
    python-int zigzag/cumsum beats building five numpy temporaries per
    path (measured 3.4x on the z4 OMT fixture: 1.3M cumsum calls gone)."""
    paths: list[tuple[list[int], list[int]]] = []
    cx = cy = 0
    i = 0
    n = len(cmds)
    cur_x: list[int] = []
    cur_y: list[int] = []
    while i < n:
        c = cmds[i]
        i += 1
        cmd_id = c & 0x7
        count = c >> 3
        if cmd_id == 1 or cmd_id == 2:  # MoveTo / LineTo
            if cmd_id == 1 and cur_x:
                paths.append((cur_x, cur_y))
                cur_x, cur_y = [], []
            end = i + 2 * count
            if cmd_id == 1 and count > 1:  # multipoint: each MoveTo param is a point
                while i < end:
                    u = cmds[i]
                    v = cmds[i + 1]
                    i += 2
                    cx += (u >> 1) ^ -(u & 1)
                    cy += (v >> 1) ^ -(v & 1)
                    paths.append(([cx], [cy]))
                continue
            ax = cur_x.append
            ay = cur_y.append
            while i < end:
                u = cmds[i]
                v = cmds[i + 1]
                i += 2
                cx += (u >> 1) ^ -(u & 1)
                cy += (v >> 1) ^ -(v & 1)
                ax(cx)
                ay(cy)
        elif cmd_id == 7:  # ClosePath: ring done (closing vertex implied)
            if cur_x:
                paths.append((cur_x, cur_y))
                cur_x, cur_y = [], []
        else:
            raise ValueError(f"bad MVT command {cmd_id}")
    if cur_x:
        paths.append((cur_x, cur_y))

    if mvt_type == 1:
        gt = GeometryType.POINT if len(paths) == 1 else GeometryType.MULTIPOINT
    elif mvt_type == 2:
        gt = GeometryType.LINESTRING if len(paths) == 1 else GeometryType.MULTILINESTRING
    else:
        # polygon vs multipolygon by outer-ring count (positive shoelace area
        # = exterior per the MVT winding convention); a polygon with holes is
        # one outer + N holes, still POLYGON
        n_outer = sum(1 for p in paths if _ring_area2_list(p[0], p[1]) > 0)
        gt = GeometryType.POLYGON if n_outer <= 1 else GeometryType.MULTIPOLYGON
    return gt, paths


_INT_DTYPES = {
    ColumnDataType.INT_32,
    ColumnDataType.UINT_32,
    ColumnDataType.INT_64,
    ColumnDataType.UINT_64,
    ColumnDataType.BOOLEAN,
}
_FLOAT_DTYPES = {ColumnDataType.FLOAT, ColumnDataType.DOUBLE}


def _promote_dtype(a: ColumnDataType, b: ColumnDataType) -> ColumnDataType:
    """Widen a property column whose MVT values mix wire types.

    Real-world tiles (e.g. the reference's amazon_here fixtures, property
    ``all_route_types``) mix sint64 and string values under one key.  The MVT
    spec allows this; a columnar layout needs ONE type per column, so we
    promote: any mix involving a string becomes STRING (values stringified);
    float+int becomes DOUBLE; differing int widths/signs become INT_64 (the
    decoder only ever emits INT_64/UINT_64 for int values anyway).
    """
    if a == b:
        return a
    if ColumnDataType.STRING in (a, b):
        return ColumnDataType.STRING
    if a in _FLOAT_DTYPES or b in _FLOAT_DTYPES:
        return ColumnDataType.DOUBLE
    return ColumnDataType.INT_64


def _coerce_value(target: ColumnDataType, dt: ColumnDataType, v):
    if target == dt:
        return v
    if target == ColumnDataType.STRING:
        if dt == ColumnDataType.BOOLEAN:
            return "true" if v else "false"
        return str(v)
    if target == ColumnDataType.DOUBLE:
        return float(v)
    return int(v)


def decode_mvt_layer(buf: bytes, span: tuple[int, int]) -> LayerData:
    name = ""
    extent = 4096
    keys: list[str] = []
    values: list = []
    feat_spans: list[tuple[int, int]] = []
    for field, wt, payload in _iter_fields(buf, span[0], span[1]):
        if field == 1:
            name = buf[payload[0] : payload[1]].decode("utf-8")
        elif field == 2:
            feat_spans.append(payload)
        elif field == 3:
            keys.append(buf[payload[0] : payload[1]].decode("utf-8"))
        elif field == 4:
            values.append(_decode_value(buf, payload))
        elif field == 5:
            extent = payload

    feats: list[tuple[int | None, list[int] | None, int, list[int]]] = []
    for fs in feat_spans:
        fid: int | None = None
        mvt_type = 1
        tags: list[int] | None = None
        cmds: list[int] = []
        for field, wt, payload in _iter_fields(buf, fs[0], fs[1]):
            if field == 1:
                fid = payload
            elif field == 2:
                tags = _parse_varints(buf, payload[0], payload[1])
            elif field == 3:
                mvt_type = payload
            elif field == 4:
                cmds = _parse_varints(buf, payload[0], payload[1])
        feats.append((fid, tags, mvt_type, cmds))
    return assemble_layer(name, extent, keys, values, feats)


def assemble_layer(
    name: str,
    extent: int,
    keys: list[str],
    values: list,
    feats: list[tuple[int | None, list[int] | None, int, list[int]]],
) -> LayerData:
    """Parsed layer fields -> LayerData.  ``values`` holds
    (ColumnDataType, value) pairs; each feature is (id-or-None, tag ints
    or None, mvt geometry type, geometry command ints).  Shared by the
    pure-Python wire parser above and the protobuf-C baseline
    (sources/mvt_pb.py) so both decoders have identical semantics."""
    n = len(feats)
    gts = np.zeros(n, dtype=np.uint8)
    ids = np.zeros(n, dtype=np.uint64)
    has_id = False
    geo_off: list[int] = []
    part_off: list[int] = []
    ring_off: list[int] = []
    vx: list[np.ndarray] = []
    prop_rows: dict[str, list[tuple[int, object]]] = {}
    prop_types: dict[str, ColumnDataType] = {}

    for fi, (fid, tags, mvt_type, cmds) in enumerate(feats):
        if fid is not None:
            ids[fi] = fid
            has_id = True
        gt, paths = _decode_feature_geometry(mvt_type, cmds)
        gts[fi] = int(gt)
        if gt == GeometryType.MULTIPOINT:
            geo_off.append(len(paths))
        elif gt == GeometryType.LINESTRING:
            part_off.append(len(paths[0][0]))
        elif gt == GeometryType.MULTILINESTRING:
            geo_off.append(len(paths))
            part_off.extend(len(p[0]) for p in paths)
        elif gt == GeometryType.POLYGON:
            part_off.append(len(paths))
            ring_off.extend(len(p[0]) for p in paths)
        elif gt == GeometryType.MULTIPOLYGON:
            # winding runs are not recoverable without signed area; treat the
            # whole feature as ONE polygon of all rings when re-splitting is
            # ambiguous — encode side writes each polygon's rings in order, so
            # ring count is preserved; polygon split uses positive-area rings
            # as outer boundaries (the MVT convention).
            areas = [_ring_area2_list(p[0], p[1]) for p in paths]
            npolys = sum(1 for a in areas if a > 0) or 1
            geo_off.append(npolys)
            counts: list[int] = []
            for a in areas:
                if a > 0 or not counts:
                    counts.append(1)
                else:
                    counts[-1] += 1
            part_off.extend(counts)
            ring_off.extend(len(p[0]) for p in paths)
        for xs, ys in paths:
            inter = np.empty(2 * len(xs), dtype=np.int64)
            inter[0::2] = xs
            inter[1::2] = ys
            vx.append(inter)
        if tags is not None:
            for ti in range(0, len(tags), 2):
                key = keys[int(tags[ti])]
                dt, val = values[int(tags[ti + 1])]
                prop_rows.setdefault(key, []).append((fi, dt, val))
                prev = prop_types.get(key)
                if prev is None:
                    prop_types[key] = dt
                elif prev != dt:
                    prop_types[key] = _promote_dtype(prev, dt)

    properties = _assemble_properties(prop_rows, prop_types, n)

    return LayerData(
        name=name,
        extent=extent,
        geometry_types=gts,
        vertex_buffer=np.concatenate(vx) if vx else np.zeros(0, dtype=np.int64),
        geometry_offsets=np.array(geo_off, dtype=np.int64) if geo_off else None,
        part_offsets=np.array(part_off, dtype=np.int64) if part_off else None,
        ring_offsets=np.array(ring_off, dtype=np.int64) if ring_off else None,
        ids=ids if has_id else None,
        properties=properties,
    )


def _assemble_properties(
    prop_rows: dict[str, list[tuple[int, object, object]]],
    prop_types: dict[str, "ColumnDataType"],
    n: int,
) -> dict[str, PropertyColumn]:
    """(key -> [(feature_idx, wire dtype, value)], promoted dtypes) ->
    dense PropertyColumns.  Shared by assemble_layer and the optimized
    decoder (sources/mvt_pb.py)."""
    properties: dict[str, PropertyColumn] = {}
    for key, raw_rows in prop_rows.items():
        present = np.zeros(n, dtype=bool)
        present[[r for r, _, _ in raw_rows]] = True
        dt = prop_types[key]
        # a feature MAY carry the same tag key twice (seen in the HERE
        # tileset); LAST occurrence wins (the reference decoder's map-put
        # semantics, MvtUtils.java) so len(values) == present.sum() —
        # otherwise the dense column misaligns with the Present stream
        dedup: dict[int, tuple] = {}
        for fi_, rdt, v in raw_rows:
            dedup[fi_] = (rdt, v)
        rows = [(fi_, _coerce_value(dt, rdt, v)) for fi_, (rdt, v) in dedup.items()]
        if dt == ColumnDataType.STRING:
            dense = np.array([v for _, v in rows], dtype=object)
        elif dt == ColumnDataType.FLOAT:
            dense = np.array([v for _, v in rows], dtype=np.float32)
        elif dt == ColumnDataType.DOUBLE:
            dense = np.array([v for _, v in rows], dtype=np.float64)
        elif dt == ColumnDataType.BOOLEAN:
            dense = np.array([v for _, v in rows], dtype=bool)
        elif dt == ColumnDataType.UINT_64:
            dense = np.array([v for _, v in rows], dtype=np.uint64)
        else:
            dense = np.array([v for _, v in rows], dtype=np.int64)
        if key == "id":
            # "id" is a reserved column name in the COVT format; the reference
            # renames a string-typed "id" property to "_id" and throws on other
            # types (MvtUtils.java:104-113).  We rename for any type.
            key = "_id"
        properties[key] = PropertyColumn(dt, present, dense)

    return properties


def _ring_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Signed shoelace area x2 of an open ring (closing edge implied)."""
    x2 = np.append(xs, xs[0]).astype(np.float64)
    y2 = np.append(ys, ys[0]).astype(np.float64)
    return float(np.sum(x2[:-1] * y2[1:] - x2[1:] * y2[:-1]))


def decode_mvt_tile(buf: bytes) -> list[LayerData]:
    layers = []
    for field, wt, payload in _iter_fields(buf, 0, len(buf)):
        if field == 3:
            layers.append(decode_mvt_layer(buf, payload))
    return layers


_BEST_DECODER = None


def decode_mvt_tile_best(buf: bytes) -> list[LayerData]:
    """Fastest available MVT decode: the compiled-protobuf (upb) vectorized
    decoder when present (output-identical to decode_mvt_tile — equality
    asserted over every reference fixture in tests/test_mvt_pb.py; ~2x
    faster), else the pure-Python wire parser.  Pipeline hot paths call
    this; decode_mvt_tile stays the reference-semantics anchor."""
    global _BEST_DECODER
    if _BEST_DECODER is None:
        try:
            from . import mvt_pb

            _BEST_DECODER = (
                mvt_pb.decode_mvt_tile_fast if mvt_pb.available() else decode_mvt_tile
            )
        except Exception:
            _BEST_DECODER = decode_mvt_tile
    return _BEST_DECODER(buf)


# ---------------------------------------------------------------------------
# tile-level entropy coding (ref S7: EncodingUtils.java:232-240,
# MvtUtils.java:55-61 — MBTiles stores gzip'd MVT)
# ---------------------------------------------------------------------------


def gzip_tile(data: bytes) -> bytes:
    return _gzip.compress(data, compresslevel=6, mtime=0)


def gunzip_tile(data: bytes) -> bytes:
    return _gzip.decompress(data)
