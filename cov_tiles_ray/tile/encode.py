"""COVT-R layer/tile encoder (pure per-group kernel).

Mirrors the reference encode pipeline (CovtConverter.convertMvtTile2,
CovtConverter.java:203-281) re-expressed over numpy arrays:

* geometry column: encode BOTH the plain path and the ICE
  (vertex-dictionary) path and keep the smaller (ref :227-236);
* per-stream encoding selection by encoded size with deterministic
  tie-breaks (ref :561-568, :656-668, :911-919, :1095-1109);
* property columns: Present stream + type-specific Data streams, strings
  dictionary-encoded (ref :1077-1324).

The output of ``encode_tile`` is a self-contained byte buffer:
``varint FORMAT_VERSION, varint num_layers,`` then per layer the metadata
block followed by the concatenated stream bytes (framing documented in
model/format.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions import codecs as C
from ..functions import sfc
from ..model.format import (
    FORMAT_VERSION,
    ID_STREAM_CANDIDATES,
    INT_STREAM_CANDIDATES,
    TOPOLOGY_CANDIDATES,
    VERTEX_CANDIDATES,
    ColumnDataType,
    ColumnType,
    LayerData,
    localized_base,
    StreamEncoding,
    StreamType,
)
from .streams import best_encoding, encode_stream

U64 = np.uint64
I64 = np.int64


@dataclass(frozen=True)
class EncodeOptions:
    """Feature-flag surface mirroring the reference's convertMvtTile flags
    (CovtConverter.java:92-98) plus the GeometryEncoding enum (:78-86)."""

    geometry_encoding: str = "auto"  # "plain" | "ice" | "ice_morton" | "auto"
    allow_fastpfor_topology: bool = True
    allow_fastpfor_vertex: bool = True
    include_ids: bool = True
    sfc: str = "hilbert"  # vertex-dictionary ordering curve: "hilbert" | "morton"
    optimize_metadata: bool = False  # id-based names resolved via TileJSON sidecar
    # Shared dict across name:*/name_* columns.  ON by default: measured on
    # the reference's 92 real OMT fixture tiles it flips the many-language
    # layers (poi/place/*_name) from net-negative to the reference's band
    # (z14: 20% -> 51% reduction).
    allow_localized_dictionary: bool = True
    # Spatial pre-sort of point-only layers on the Hilbert curve before
    # encoding (reference O2: sortPointFeaturesOnHilbertCurve,
    # MvtConverter.java:685-703).  Halves vertex-buffer bytes on clustered
    # points but un-sorts the id column (delta-varint ids give that gain
    # back on sequential-id corpora — measured net loss on ours, so OFF by
    # default; the flag exists for id-sparse corpora where it wins).
    sort_points_on_curve: bool = False


# Deterministic fast-path policy: FastPFOR's block framing can't win on
# short streams, so candidates are pruned below this length (a fixed rule,
# not data-dependent — output stays deterministic).
FASTPFOR_MIN_VALUES = 64
ICE_MIN_VERTICES = 16

# Below this many values the ORC-RLE candidate is pruned from int streams:
# its Python-loop encoder dominates per-tile cost on many-tiny-tile
# workloads (measured ~30% of encode CPU at 4 features/tile) while the
# best case saving on a <32-value stream is a handful of bytes.  Fixed
# n-based rule — output stays deterministic.
RLE_MIN_VALUES = 32
_INT_SMALL = tuple(e for e in INT_STREAM_CANDIDATES if e != StreamEncoding.RLE)
_ID_SMALL = tuple(e for e in ID_STREAM_CANDIDATES if e != StreamEncoding.RLE)


from functools import lru_cache


@lru_cache(maxsize=8192)
def _all_true_present(n: int) -> bytes:
    """PRESENT stream for an all-present column — pure function of n, and
    the overwhelmingly common case on many-tiny-tile workloads (cached:
    boolean-RLE of ones cost ~15% of encode CPU before)."""
    return C.encode_boolean_rle(np.ones(n, dtype=bool))


@lru_cache(maxsize=8192)
def _const_byte_rle(val: int, n: int) -> bytes:
    """BYTE_RLE of a constant run (e.g. all-POINT geometry_types)."""
    return C.encode_byte_rle(np.full(n, val, dtype=np.uint8))


def _int_candidates(n: int):
    return INT_STREAM_CANDIDATES if n >= RLE_MIN_VALUES else _INT_SMALL


def _id_candidates(n: int):
    return ID_STREAM_CANDIDATES if n >= RLE_MIN_VALUES else _ID_SMALL


def _topology_candidates(opts: EncodeOptions, n: int = 1 << 30):
    if opts.allow_fastpfor_topology and n >= FASTPFOR_MIN_VALUES:
        return TOPOLOGY_CANDIDATES
    return (StreamEncoding.RLE,)


def _vertex_candidates(opts: EncodeOptions, n: int = 1 << 30):
    if opts.allow_fastpfor_vertex and n >= FASTPFOR_MIN_VALUES:
        return VERTEX_CANDIDATES
    return (StreamEncoding.VARINT_DELTA_ZIG_ZAG,)


class _StreamBlock:
    """Accumulates (stream_type, encoding, num_values, bytes) per column."""

    def __init__(self):
        self.streams: list[tuple[StreamType, StreamEncoding, int, bytes]] = []

    def add(self, stype: StreamType, enc: StreamEncoding, num_values: int, buf: bytes):
        self.streams.append((stype, enc, num_values, buf))

    def add_best(self, stype: StreamType, values: np.ndarray, candidates, interleaved=False):
        enc, buf = best_encoding(values, candidates, interleaved=interleaved)
        self.add(stype, enc, len(values), buf)

    @property
    def total_bytes(self) -> int:
        return sum(len(b) for _, _, _, b in self.streams)


def _encode_geometry_plain(layer: LayerData, opts: EncodeOptions) -> _StreamBlock:
    blk = _StreamBlock()
    gt = np.ascontiguousarray(layer.geometry_types, dtype=np.uint8)
    if len(gt) and (gt[0] == gt).all():
        gt_buf = _const_byte_rle(int(gt[0]), len(gt))
    else:
        gt_buf = C.encode_byte_rle(gt)
    blk.add(StreamType.GEOMETRY_TYPES, StreamEncoding.BYTE_RLE, len(gt), gt_buf)
    topo = _topology_candidates(opts, layer.num_features)
    if layer.geometry_offsets is not None and len(layer.geometry_offsets):
        blk.add_best(StreamType.GEOMETRY_OFFSETS, np.asarray(layer.geometry_offsets, dtype=I64), topo)
    if layer.part_offsets is not None and len(layer.part_offsets):
        blk.add_best(StreamType.PART_OFFSETS, np.asarray(layer.part_offsets, dtype=I64), topo)
    if layer.ring_offsets is not None and len(layer.ring_offsets):
        blk.add_best(StreamType.RING_OFFSETS, np.asarray(layer.ring_offsets, dtype=I64), topo)
    vb = np.asarray(layer.vertex_buffer, dtype=I64)
    blk.add_best(StreamType.VERTEX_BUFFER, vb, _vertex_candidates(opts, len(vb)), interleaved=True)
    return blk


def _sfc_num_bits(extent: int) -> int:
    """Curve order covering [-(extent), 2*extent): extent bits + 1 margin.

    The reference uses 13 bits for extent 4096 / 14 for 8192 with a
    positive-quadrant shift (GeometryUtils.java:8-22, CovtConverter.java:674-681).
    """
    return max(int(extent).bit_length(), 2) + 1


def _encode_geometry_ice(
    layer: LayerData, opts: EncodeOptions, morton: bool, speculative: bool = False
) -> _StreamBlock | None:
    """ICE: dedupe vertices into an SFC-ordered dictionary + offset stream.

    Returns None when coordinates fall outside the SFC domain (caller then
    uses the plain path).  Ref: createVertexDictionary CovtConverter.java:
    858-870, getVertexOffsets :950-956, encodeVertexBuffer :771-856.
    """
    vb = np.asarray(layer.vertex_buffer, dtype=I64)
    if len(vb) < 2 * ICE_MIN_VERTICES:
        return None
    x, y = vb[0::2], vb[1::2]
    num_bits = _sfc_num_bits(layer.extent)
    half = 1 << (num_bits - 1)
    if x.min() < -half or x.max() >= half or y.min() < -half or y.max() >= half:
        return None

    # Cheap dedup-ratio gate before the expensive SFC pass: the vertex
    # dictionary pays for its offsets stream only when vertices repeat
    # (shared polygon/line vertices — the reference's ICE case).  Nearly
    # all-unique vertices (points) can't win, and the speculative ICE
    # encode was 39% of dense point-tile CPU for identical output bytes.
    # Applied ONLY in "auto" (speculative) mode: an explicitly requested
    # ice/ice_morton encoding must be honored unconditionally.
    if speculative:
        n_verts = len(x)
        packed = (x + half) * I64(4 * half) + (y + half)
        if len(np.unique(packed)) > 0.9 * n_verts:
            return None

    if morton:
        keys = sfc.morton_encode_signed(x, y, num_bits).astype(I64)
    else:
        keys = sfc.hilbert_encode_signed(x, y, num_bits).astype(I64)
    dict_keys, inverse = np.unique(keys, return_inverse=True)
    # NOTE: SFC key -> (x,y) is bijective within the domain, so unique keys
    # ARE unique vertices and `inverse` is the per-vertex dictionary offset.
    blk = _StreamBlock()
    gt = np.ascontiguousarray(layer.geometry_types, dtype=np.uint8)
    if len(gt) and (gt[0] == gt).all():
        gt_buf = _const_byte_rle(int(gt[0]), len(gt))
    else:
        gt_buf = C.encode_byte_rle(gt)
    blk.add(StreamType.GEOMETRY_TYPES, StreamEncoding.BYTE_RLE, len(gt), gt_buf)
    topo = _topology_candidates(opts, layer.num_features)
    if layer.geometry_offsets is not None and len(layer.geometry_offsets):
        blk.add_best(StreamType.GEOMETRY_OFFSETS, np.asarray(layer.geometry_offsets, dtype=I64), topo)
    if layer.part_offsets is not None and len(layer.part_offsets):
        blk.add_best(StreamType.PART_OFFSETS, np.asarray(layer.part_offsets, dtype=I64), topo)
    if layer.ring_offsets is not None and len(layer.ring_offsets):
        blk.add_best(StreamType.RING_OFFSETS, np.asarray(layer.ring_offsets, dtype=I64), topo)

    vc = _vertex_candidates(opts, len(inverse))
    blk.add_best(StreamType.VERTEX_OFFSETS, inverse.astype(I64), vc)
    if morton:
        # dictionary stored as delta'd sorted morton codes (ref :939-948)
        blk.add_best(StreamType.VERTEX_BUFFER, dict_keys, _vertex_candidates(opts, len(dict_keys)))
    else:
        dx, dy = sfc.hilbert_decode_signed(dict_keys, num_bits)
        dict_vb = np.empty(2 * len(dict_keys), dtype=I64)
        dict_vb[0::2], dict_vb[1::2] = dx, dy
        blk.add_best(StreamType.VERTEX_BUFFER, dict_vb, _vertex_candidates(opts, len(dict_vb)), interleaved=True)
    return blk


def _encode_property_column(col, layer_n: int) -> tuple[ColumnDataType, ColumnType, _StreamBlock]:
    blk = _StreamBlock()
    present = np.ascontiguousarray(col.present, dtype=bool)
    present_buf = _all_true_present(layer_n) if present.all() else C.encode_boolean_rle(present)
    blk.add(StreamType.PRESENT, StreamEncoding.BOOLEAN_RLE, layer_n, present_buf)
    dt = col.data_type
    vals = col.values
    if dt == ColumnDataType.BOOLEAN:
        dense = np.asarray(vals, dtype=bool)
        blk.add(StreamType.DATA, StreamEncoding.BOOLEAN_RLE, len(dense), C.encode_boolean_rle(dense))
        return dt, ColumnType.PLAIN, blk
    if dt in (ColumnDataType.INT_32, ColumnDataType.INT_64, ColumnDataType.UINT_32, ColumnDataType.UINT_64):
        dense = np.asarray(vals, dtype=I64)
        blk.add_best(StreamType.DATA, dense, _int_candidates(len(dense)))
        return dt, ColumnType.PLAIN, blk
    if dt == ColumnDataType.FLOAT:
        dense = np.asarray(vals, dtype=np.float32)
        blk.add(StreamType.DATA, StreamEncoding.PLAIN, len(dense), C.encode_floats_le(dense))
        return dt, ColumnType.PLAIN, blk
    if dt == ColumnDataType.DOUBLE:
        dense = np.asarray(vals, dtype=np.float64)
        blk.add(StreamType.DATA, StreamEncoding.PLAIN, len(dense), C.encode_doubles_le(dense))
        return dt, ColumnType.PLAIN, blk
    if dt == ColumnDataType.STRING:
        # insertion-order dictionary (ref convertStringDictionaryColumn,
        # CovtConverter.java:1294-1324): data = dict indices, length+dictionary.
        # Both paths keep first-appearance order == the reference's
        # insertion-order dict, at C speed: pc.dictionary_encode for Arrow
        # inputs (no per-row Python strings), pd.factorize for numpy.
        import pyarrow as pa

        if isinstance(vals, (pa.Array, pa.ChunkedArray)):
            import pyarrow.compute as pc

            d = pc.dictionary_encode(
                vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
            )
            if isinstance(d, pa.ChunkedArray):
                d = d.combine_chunks()
            idx = d.indices.to_numpy(zero_copy_only=False).astype(I64)
            uniques = d.dictionary.to_pylist()
        elif len(vals) >= 64:
            import pandas as pd

            codes, uniques = pd.factorize(np.asarray(vals, dtype=object), use_na_sentinel=False)
            uniques = list(uniques)
            idx = codes.astype(I64)
        else:
            # tiny tiles: plain dict loop beats factorize's fixed cost 7x
            seen: dict[str, int] = {}
            idx = np.empty(len(vals), dtype=I64)
            for i, s in enumerate(vals):
                j = seen.get(s)
                if j is None:
                    j = len(seen)
                    seen[s] = j
                idx[i] = j
            uniques = list(seen)
        enc, data_buf = best_encoding(idx, _int_candidates(len(idx)))
        blk.add(StreamType.DATA, enc, len(idx), data_buf)
        _add_dictionary_streams(blk, uniques)
        return dt, ColumnType.DICTIONARY, blk
    raise ValueError(f"unsupported property data type {dt}")


def _add_dictionary_streams(blk: _StreamBlock, distinct: list[str]) -> None:
    """Emit the dictionary payload: LENGTH(RLE) + DICTIONARY(utf-8 concat)
    (ref CovtConverter.java:1136-1167), or the engine's TOKEN_DICT stream
    when the word-level re-dictionary is representable AND strictly smaller
    (deterministic choice — same argmin-by-size rule as every other stream,
    G1)."""
    raws = [s.encode("utf-8") for s in distinct]
    lengths = np.array([len(r) for r in raws], dtype=I64)
    length_buf = encode_stream(lengths, StreamEncoding.RLE)
    dict_buf = b"".join(raws)
    # tiny dictionaries can't amortize the vocab framing — skip the token
    # attempt below a fixed byte floor (deterministic n-based rule)
    tok_buf = C.encode_token_dict(distinct) if len(dict_buf) >= 128 else None
    if tok_buf is not None and len(tok_buf) < len(length_buf) + len(dict_buf):
        blk.add(StreamType.DICTIONARY, StreamEncoding.TOKEN_DICT, len(distinct), tok_buf)
        return
    blk.add(StreamType.LENGTH, StreamEncoding.RLE, len(distinct), length_buf)
    blk.add(StreamType.DICTIONARY, StreamEncoding.PLAIN, len(distinct), dict_buf)


def _localized_families(names: list[str]) -> dict[str, list[str]]:
    """Group property names into localization families: ``name``/``name:en``/
    ``name_de`` share the base before ':' or '_' (reference detection at
    CovtConverter.java:498-504 — allowlisted prefixes, split on ``:|_``).
    Only families with >= 2 string members localize."""
    fams: dict[str, list[str]] = {}
    for n in names:
        fams.setdefault(localized_base(n), []).append(n)
    return {k: v for k, v in fams.items() if len(v) >= 2}


def _encode_localized_family(
    members: list[str], layer: LayerData
) -> list[tuple[str, ColumnDataType, ColumnType, _StreamBlock]]:
    """One SHARED dictionary across a column family (reference
    convertLocalizedStringDictionaryColumn, CovtConverter.java:1223-1292 —
    unimplemented there, working decode in parser/js evaluation/index.ts:
    507-555).  Framing divergence (documented): each member stays its own
    column of type LOCALIZED_DICTIONARY carrying PRESENT + DATA; the family
    head additionally carries the shared LENGTH + DICTIONARY streams.
    Decoders key the shared dict by the family prefix."""
    import pandas as pd

    member_vals = [np.asarray(layer.properties[name].values, dtype=object) for name in members]
    sizes = np.cumsum([0] + [len(v) for v in member_vals])
    codes, uniques = pd.factorize(np.concatenate(member_vals), use_na_sentinel=False)
    codes = codes.astype(I64)
    seen = list(uniques)
    per_member_idx: list[np.ndarray] = [
        codes[sizes[i] : sizes[i + 1]] for i in range(len(members))
    ]

    out = []
    for mi, name in enumerate(members):
        col = layer.properties[name]
        blk = _StreamBlock()
        present = np.ascontiguousarray(col.present, dtype=bool)
        blk.add(
            StreamType.PRESENT,
            StreamEncoding.BOOLEAN_RLE,
            layer.num_features,
            _all_true_present(layer.num_features) if present.all() else C.encode_boolean_rle(present),
        )
        enc, data_buf = best_encoding(per_member_idx[mi], _int_candidates(len(per_member_idx[mi])))
        blk.add(StreamType.DATA, enc, len(per_member_idx[mi]), data_buf)
        if mi == 0:  # family head carries the shared dictionary
            _add_dictionary_streams(blk, list(seen))
        out.append((name, ColumnDataType.STRING, ColumnType.LOCALIZED_DICTIONARY, blk))
    return out


def _serialize_layer(
    layer: LayerData,
    columns: list[tuple[int, str | None, ColumnDataType, ColumnType, _StreamBlock]],
    layer_id: int | None = None,
) -> bytes:
    """Metadata block + stream bytes for one layer (framing: model/format.py).

    With ``layer_id`` set the optimized layout is written: bit0 of the
    version byte flips and the layer/column names are u32 ids against a
    TileJSON sidecar (ref convertOptimizedLayerMetadata,
    CovtConverter.java:300-363; columns arrive with sidecar field ids and
    name=None)."""
    av = C._append_varint
    optimized = layer_id is not None
    out = bytearray()
    out.append((FORMAT_VERSION << 1) | int(optimized))
    if optimized:
        av(out, layer_id)
    else:
        raw = layer.name.encode("utf-8")
        av(out, len(raw))
        out += raw
    av(out, layer.extent)
    av(out, layer.num_features)
    av(out, len(columns))
    stream_bytes: list[bytes] = []
    for col_id, name, dt, ct, blk in columns:
        av(out, col_id)
        if name is not None:
            raw = name.encode("utf-8")
            av(out, len(raw))
            out += raw
        out.append((int(dt) << 3) | int(ct))
        av(out, len(blk.streams))
        for stype, senc, nvals, buf in blk.streams:
            out.append((int(stype) << 4) | int(senc))
            av(out, nvals)
            av(out, len(buf))
            stream_bytes.append(buf)
    return bytes(out) + b"".join(stream_bytes)


def sort_layer_on_curve(layer: LayerData) -> LayerData:
    """Permute a POINT-only layer into Hilbert-curve order (all columns move
    together — feature order is load-bearing, SURVEY.md §7.5).  Non-point
    layers are returned unchanged (the reference only spatially sorts point
    features)."""
    from ..model.format import GeometryType

    if layer.num_features == 0 or not (layer.geometry_types == GeometryType.POINT).all():
        return layer
    vb = np.asarray(layer.vertex_buffer, dtype=I64)
    x, y = vb[0::2], vb[1::2]
    num_bits = _sfc_num_bits(layer.extent)
    half = 1 << (num_bits - 1)
    if x.min() < -half or x.max() >= half or y.min() < -half or y.max() >= half:
        return layer
    order = np.argsort(sfc.hilbert_encode_signed(x, y, num_bits), kind="stable")
    vb2 = np.empty_like(vb)
    vb2[0::2], vb2[1::2] = x[order], y[order]
    from ..model.format import PropertyColumn

    props = {}
    for name, col in layer.properties.items():
        present = np.asarray(col.present, dtype=bool)
        if present.all():
            vals = col.values
            vals = vals.take(order) if hasattr(vals, "take") and not isinstance(vals, np.ndarray) else np.asarray(vals)[order]
            props[name] = PropertyColumn(col.data_type, present, vals)
        else:
            # sparse: expand to per-feature slots, permute the PRESENT MASK
            # itself (not None-ness of values — a legitimately present None
            # must stay present), re-densify
            full = np.empty(layer.num_features, dtype=object)
            full[present] = np.asarray(col.values, dtype=object)
            full = full[order]
            new_present = present[order]
            props[name] = PropertyColumn(col.data_type, new_present, full[new_present])
    # POINT-only layers carry no topology streams; trivial offsets from a
    # decoded tile would be silently dropped by the rebuild below.
    for off in (layer.geometry_offsets, layer.part_offsets, layer.ring_offsets):
        assert off is None or len(off) == 0, "point layer with topology offsets"
    return LayerData(
        name=layer.name,
        extent=layer.extent,
        geometry_types=layer.geometry_types[order],
        vertex_buffer=vb2,
        ids=None if layer.ids is None else np.asarray(layer.ids)[order],
        properties=props,
    )


def encode_layer(layer: LayerData, opts: EncodeOptions = EncodeOptions(), sidecar_ids=None) -> bytes:
    """``sidecar_ids``: SidecarIds when opts.optimize_metadata (names -> u32 ids)."""
    if opts.sort_points_on_curve:
        layer = sort_layer_on_curve(layer)
    columns: list[tuple[int, str | None, ColumnDataType, ColumnType, _StreamBlock]] = []

    # column id 0 = id, 1 = geometry (ref: 'column id 0 and 1 is always
    # reserved for id and geometry', CovtConverter.java:348-350)
    if opts.include_ids and layer.ids is not None:
        ids = np.asarray(layer.ids, dtype=U64).view(I64)
        blk = _StreamBlock()
        blk.add_best(StreamType.DATA, ids, _id_candidates(len(ids)))
        columns.append((0, None, ColumnDataType.UINT_64, ColumnType.PLAIN, blk))

    mode = opts.geometry_encoding
    use_morton = mode == "ice_morton" or (mode == "auto" and opts.sfc == "morton")
    ice_ct = ColumnType.ICE_MORTON_CODE if use_morton else ColumnType.ICE
    plain_blk = _encode_geometry_plain(layer, opts) if mode in ("plain", "auto") else None
    ice_blk = None
    if mode in ("ice", "ice_morton", "auto"):
        ice_blk = _encode_geometry_ice(layer, opts, morton=use_morton, speculative=mode == "auto")
    if plain_blk is not None and ice_blk is not None:
        # keep the smaller variant (ref: CovtConverter.java:227-236)
        geo_blk, geo_ct = (
            (ice_blk, ice_ct)
            if ice_blk.total_bytes < plain_blk.total_bytes
            else (plain_blk, ColumnType.PLAIN)
        )
    elif ice_blk is not None:
        geo_blk, geo_ct = ice_blk, ice_ct
    else:
        # ICE unavailable (coords out of SFC domain, too few vertices, or the
        # auto-mode dedup-ratio gate declined the speculative encode) ->
        # plain fallback
        if plain_blk is None:
            plain_blk = _encode_geometry_plain(layer, opts)
        geo_blk, geo_ct = plain_blk, ColumnType.PLAIN
    columns.append((1, None, ColumnDataType.GEOMETRY, geo_ct, geo_blk))

    props = _property_blocks(layer, opts)
    if opts.optimize_metadata:
        if sidecar_ids is None:
            raise ValueError("optimize_metadata requires a SidecarIds")
        lid = sidecar_ids.layer_id[layer.name]
        fid = sidecar_ids.field_id[lid]
        for name, dt, ct, blk in props:
            columns.append((fid[name], None, dt, ct, blk))
        return _serialize_layer(layer, columns, layer_id=lid)

    next_id = 2
    for name, dt, ct, blk in props:
        columns.append((next_id, name, dt, ct, blk))
        next_id += 1

    return _serialize_layer(layer, columns)


def _property_blocks(
    layer: LayerData, opts: EncodeOptions
) -> list[tuple[str, ColumnDataType, ColumnType, _StreamBlock]]:
    fam_blocks: dict[str, tuple] = {}
    if opts.allow_localized_dictionary:
        string_names = [
            n
            for n, c in layer.properties.items()
            if ColumnDataType(int(c.data_type)) == ColumnDataType.STRING
        ]
        for members in _localized_families(string_names).values():
            for tup in _encode_localized_family(members, layer):
                fam_blocks[tup[0]] = tup
    out = []
    for name, col in layer.properties.items():
        if name in fam_blocks:
            out.append(fam_blocks[name])
        else:
            dt, ct, blk = _encode_property_column(col, layer.num_features)
            out.append((name, dt, ct, blk))
    return out


def encode_tile(layers: list[LayerData], opts: EncodeOptions = EncodeOptions(), ids=None) -> bytes:
    if opts.optimize_metadata and ids is None:
        from .sidecar import SidecarIds, build_sidecar

        ids = SidecarIds(build_sidecar(layers))
    head = C.encode_varint_scalar(FORMAT_VERSION) + C.encode_varint_scalar(len(layers))
    return head + b"".join(encode_layer(ly, opts, sidecar_ids=ids) for ly in layers)
