"""Per-tile COVT encode / decode-verify stages.

``encode_tile_group`` is the map_groups kernel after the
``groupby(tile_id, salt)`` shuffle — the engine's one mandatory all-to-all
exchange (SURVEY.md §7.4).  Input groups carry only light columns
(ids, local coords, caption, fmt, phash); image bytes stay out of the
shuffle (SURVEY.md §7.5 'image payloads').
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import spatial as S
from ..model.format import ColumnDataType, GeometryType, LayerData, PropertyColumn
from ..sources import mvt as mvt_codec
from ..tile import EncodeOptions, decode_tile, encode_tile

_POINT_LAYER = "images"

# Deterministic full-equality verify sample: tiles with tile_id % MOD == 0
# (~1%) are decode-compared against the ORIGINAL layer at encode time —
# a silent geometry/property corruption cannot hide behind the cheaper
# count/id checks (VERDICT r1 'What's wrong' #6).
VERIFY_FULL_MOD = 97


def check_decoded_tile(
    layers, n_features: int, expect_layers: list[LayerData] | None = None, n_layers: int = 1
) -> bool:
    """The ONE verify predicate shared by every verify site (encode-time
    sample, batch verify stage, fragment-merge re-verify): expected layer
    count, primary-layer feature count matches, ids present; with
    ``expect_layers``, full LayerData equality of EVERY layer (geometry,
    topology, ids, every property column)."""
    if len(layers) != n_layers or layers[0].num_features != n_features or layers[0].ids is None:
        return False
    if expect_layers is None:
        return True
    return len(layers) == len(expect_layers) and all(
        got == want for got, want in zip(layers, expect_layers)
    )


def verify_tile_buf(
    buf, n_features: int, expect_layers: list[LayerData] | None = None, n_layers: int = 1
) -> bool:
    try:
        return check_decoded_tile(decode_tile(bytes(buf)), n_features, expect_layers, n_layers)
    except Exception:
        return False


# occupancy-grid cell resolution for the derived polygon layer: 2^6 = 64
# cells per side (cell size 64 at extent 4096)
CELL_BITS = 6
_CELLS_LAYER = "cells"


def cells_layer_from_points(
    vertex_buffer: np.ndarray, extent: int = 4096, cell_bits: int = CELL_BITS
) -> LayerData:
    """Derive an occupancy-grid POLYGON layer from a tile's point coords:
    one square per grid cell holding >= 1 point, with a per-cell point
    count property.  Adjacent cells SHARE corner vertices, so this layer
    exercises the ICE vertex-dictionary + ring-offset paths in the
    distributed pipeline (VERDICT r1 next-round #7).  Deterministic in the
    point SET (not order) — a fragment merge can rebuild it from merged
    points and get byte-identical output."""
    g = 1 << cell_bits
    cs = extent >> cell_bits
    vb = np.asarray(vertex_buffer, dtype=np.int64)
    if len(vb) <= 64:  # tiny-tile scalar path (flagship median ~5 points)
        counts_by_cell: dict[int, int] = {}
        it = iter(vb.tolist())
        for x in it:
            y = next(it)
            cx = min(max(x // cs, 0), g - 1)
            cy = min(max(y // cs, 0), g - 1)
            k = cy * g + cx
            counts_by_cell[k] = counts_by_cell.get(k, 0) + 1
        cid_l = sorted(counts_by_cell)
        cid = np.array(cid_l, dtype=np.int64)
        counts = np.array([counts_by_cell[k] for k in cid_l], dtype=np.int64)
        vb_l: list[int] = []
        for k in cid_l:
            x0s, y0s = (k % g) * cs, (k // g) * cs
            vb_l += (x0s, y0s, x0s + cs, y0s, x0s + cs, y0s + cs, x0s, y0s + cs)
        n = len(cid_l)
        cells_vb = np.array(vb_l, dtype=np.int64)
    else:
        x, y = vb[0::2], vb[1::2]
        cx = np.clip(x // cs, 0, g - 1)
        cy = np.clip(y // cs, 0, g - 1)
        cid, counts = np.unique(cy * g + cx, return_counts=True)  # ascending ids
        n = len(cid)
        x0 = (cid % g) * cs
        y0 = (cid // g) * cs
        cells_vb = np.empty(8 * n, dtype=np.int64)
        cells_vb[0::8], cells_vb[1::8] = x0, y0
        cells_vb[2::8], cells_vb[3::8] = x0 + cs, y0
        cells_vb[4::8], cells_vb[5::8] = x0 + cs, y0 + cs
        cells_vb[6::8], cells_vb[7::8] = x0, y0 + cs
    return LayerData(
        name=_CELLS_LAYER,
        extent=extent,
        geometry_types=np.full(n, GeometryType.POLYGON, dtype=np.uint8),
        vertex_buffer=cells_vb,
        part_offsets=np.ones(n, dtype=np.int64),  # 1 ring per polygon
        ring_offsets=np.full(n, 4, dtype=np.int64),  # closing vertex dropped
        ids=cid.astype(np.uint64),
        properties={
            "n_pts": PropertyColumn(
                ColumnDataType.INT_64, np.ones(n, bool), counts.astype(np.int64)
            )
        },
    )


def group_to_layer(g: dict, extent: int = 4096) -> LayerData:
    """Build a point LayerData from one tile group (dict of numpy arrays).

    Rows are ordered by image id — ordering is load-bearing (SURVEY.md
    §7.5): feature order ties ids, geometry and property streams together.
    """
    if "fid" in g:
        fid = np.asarray(g["fid"], dtype=np.int64)
        order = np.argsort(fid, kind="stable")
        n = len(fid)
        ids = fid[order].astype(np.uint64)
    else:
        image_id = np.asarray(g["image_id"], dtype=object)
        order = np.argsort(image_id, kind="stable")
        n = len(image_id)
        # img%012d -> numeric id (vectorized slice-parse)
        ids = np.char.lstrip(np.asarray(image_id[order], dtype="U15"), "img").astype(np.uint64)
    vb = np.empty(2 * n, dtype=np.int64)
    vb[0::2] = np.asarray(g["loc_x"], dtype=np.int64)[order]
    vb[1::2] = np.asarray(g["loc_y"], dtype=np.int64)[order]
    ones = np.ones(n, bool)
    return LayerData(
        name=_POINT_LAYER,
        extent=extent,
        geometry_types=np.full(n, GeometryType.POINT, dtype=np.uint8),
        vertex_buffer=vb,
        ids=ids,
        properties={
            "caption": PropertyColumn(
                ColumnDataType.STRING, ones, np.asarray(g["caption"], dtype=object)[order]
            ),
            "fmt": PropertyColumn(
                ColumnDataType.STRING, ones, np.asarray(g["fmt"], dtype=object)[order]
            ),
            "phash": PropertyColumn(
                ColumnDataType.INT_64, ones, np.asarray(g["phash"], dtype=np.int64)[order]
            ),
        },
    )


def table_to_layer(sub: pa.Table, extent: int = 4096) -> LayerData:
    """Arrow-native sibling of ``group_to_layer``: builds a point layer from
    a zero-copy slice of the partition table, rows ALREADY sorted by fid
    (the partition sorts once by (tile_id, salt, fid), so every tile slice
    arrives in canonical id order).  String columns stay Arrow — the encoder
    dictionary-encodes them in C++ without ever materializing per-row Python
    strings (the Arrow->numpy object conversion was ~3x the kernel cost)."""
    n = sub.num_rows
    ids = sub["fid"].to_numpy(zero_copy_only=False).astype(np.uint64)
    vb = np.empty(2 * n, dtype=np.int64)
    vb[0::2] = sub["loc_x"].to_numpy(zero_copy_only=False)
    vb[1::2] = sub["loc_y"].to_numpy(zero_copy_only=False)
    ones = np.ones(n, bool)
    return LayerData(
        name=_POINT_LAYER,
        extent=extent,
        geometry_types=np.full(n, GeometryType.POINT, dtype=np.uint8),
        vertex_buffer=vb,
        ids=ids,
        properties={
            "caption": PropertyColumn(ColumnDataType.STRING, ones, sub["caption"]),
            "fmt": PropertyColumn(ColumnDataType.STRING, ones, sub["fmt"]),
            "phash": PropertyColumn(
                ColumnDataType.INT_64, ones, sub["phash"].to_numpy(zero_copy_only=False)
            ),
        },
    )


def plain_columnar_bytes(layer: LayerData) -> int:
    """Size of the naive uncompressed columnar layout — the 'before'
    denominator for reduction stats until an MVT-equivalent baseline codec
    lands (reference formula: (1 - covt/mvt)*100, CovtConverterTest.java:
    278-291)."""
    n = layer.num_features
    size = len(layer.vertex_buffer) * 4 + n  # int32 coords + geom type byte
    if layer.ids is not None:
        size += 8 * n
    for col in layer.properties.values():
        if col.data_type == ColumnDataType.STRING:
            if isinstance(col.values, (pa.Array, pa.ChunkedArray)):
                import pyarrow.compute as pc

                nbytes = int(pc.sum(pc.binary_length(col.values)).as_py() or 0)
            else:
                nbytes = int(sum(map(len, col.values)))
            size += nbytes + len(col.values) + n // 8 + 1
        elif col.data_type in (ColumnDataType.FLOAT,):
            size += 4 * len(col.values) + n // 8 + 1
        else:
            size += 8 * len(col.values) + n // 8 + 1
    return size


class TileEncoder:
    """map_groups kernel (numpy batch format — no per-group pandas
    construction): one tile group in, one output row (dict of arrays) out.
    Holds EncodeOptions once per worker (stateful-stage pattern,
    SURVEY.md §7.3)."""

    def __init__(
        self, opts: EncodeOptions | None = None, extent: int = 4096, with_cells: bool = False
    ):
        self.opts = opts or EncodeOptions()
        self.extent = extent
        # derive a second (polygon) layer per tile: occupancy-grid cells.
        # Runs ICE + ring offsets through the distributed exchange.
        self.with_cells = with_cells

    with_mvt_baseline = False  # set True to also emit true MVT-encoded sizes

    def _layer_row(self, layer, tid: int, salt: int) -> dict:
        layers = [layer]
        if self.with_cells:
            layers.append(cells_layer_from_points(layer.vertex_buffer, self.extent))
        buf = encode_tile(layers, self.opts)
        out = {
            "tile_id": tid,
            "z": tid >> 58,
            "x": (tid >> 29) & ((1 << 29) - 1),
            "y": tid & ((1 << 29) - 1),
            "salt": salt,
            "n_features": layer.num_features,
            "n_layers": len(layers),
            "covt": buf,
            "covt_bytes": len(buf),
            "plain_bytes": sum(plain_columnar_bytes(ly) for ly in layers),
        }
        if self.with_mvt_baseline:
            mvt_buf = mvt_codec.encode_mvt_tile(layers)
            out["mvt_bytes"] = len(mvt_buf)
            out["mvt_gzip_bytes"] = len(mvt_codec.gzip_tile(mvt_buf))
        # encode-time full-equality sample (the only site that still holds
        # the original LayerData); folded into roundtrip_ok downstream
        out["full_ok"] = (
            verify_tile_buf(buf, layer.num_features, expect_layers=layers, n_layers=len(layers))
            if tid % VERIFY_FULL_MOD == 0
            else True
        )
        return out

    def encode_one(self, g: dict) -> dict:
        """One tile group -> dict of PYTHON SCALARS (callers assemble columns)."""
        layer = group_to_layer(g, self.extent)
        tid = int(g["tile_id"][0])
        salt = int(g["salt"][0]) if "salt" in g else 0
        return self._layer_row(layer, tid, salt)

    def encode_one_table(self, sub: pa.Table, tid: int, salt: int) -> dict:
        """Arrow fast path: a pre-sorted zero-copy tile slice in, row out."""
        return self._layer_row(table_to_layer(sub, self.extent), tid, salt)

    _DTYPES = {
        "tile_id": np.int64, "z": np.int32, "x": np.int32, "y": np.int32,
        "salt": np.int32, "n_features": np.int64, "n_layers": np.int32, "covt": object,
        "covt_bytes": np.int64, "plain_bytes": np.int64,
        "mvt_bytes": np.int64, "mvt_gzip_bytes": np.int64, "mvt": object,
        "roundtrip_ok": np.bool_, "full_ok": np.bool_,
    }

    @classmethod
    def rows_to_columns(cls, rows: list[dict]) -> dict:
        return {
            k: np.array([r[k] for r in rows], dtype=cls._DTYPES.get(k, object))
            for k in rows[0]
        }

    def __call__(self, g: dict) -> dict:
        return self.rows_to_columns([self.encode_one(g)])


class MvtTileEncoder(TileEncoder):
    """Same grouping contract as TileEncoder but emits the tile as real MVT
    wire bytes — the head of the reference's primary pipeline (MVT corpus in,
    SURVEY.md §3.1 step 2)."""

    def encode_one(self, g: dict) -> dict:
        layer = group_to_layer(g, self.extent)
        buf = mvt_codec.encode_mvt_tile([layer])
        tid = int(g["tile_id"][0])
        return {
            "tile_id": tid,
            "z": tid >> 58,
            "x": (tid >> 29) & ((1 << 29) - 1),
            "y": tid & ((1 << 29) - 1),
            "n_features": layer.num_features,
            "mvt": buf,
        }


def encode_tile_group(g: dict, opts: EncodeOptions | None = None) -> dict:
    return TileEncoder(opts)(g)


class MultiTileEncoder:
    """Encode MANY tiles per call: the input group is a hash partition
    (``part = hash(tile_id) mod P``), segmented by (tile_id, salt) inside
    the kernel with numpy, so the Ray per-group wrapper cost is paid P
    times instead of once per tile.  Hash partitioning also spreads dense
    spatial regions across the pool (skew control beyond salting)."""

    def __init__(
        self,
        opts: EncodeOptions | None = None,
        extent: int = 4096,
        inner: TileEncoder | None = None,
    ):
        self.enc = inner if inner is not None else TileEncoder(opts, extent)

    def __call__(self, g) -> dict:
        if isinstance(g, pa.Table):
            return self._encode_table(g)
        tid = np.asarray(g["tile_id"], dtype=np.int64)
        salt = np.asarray(g["salt"], dtype=np.int64)
        order = np.lexsort((salt, tid))
        cols = {k: np.asarray(v)[order] for k, v in g.items()}
        tid, salt = cols["tile_id"], cols["salt"]
        key_change = np.concatenate(
            [[True], (tid[1:] != tid[:-1]) | (salt[1:] != salt[:-1])]
        )
        starts = np.flatnonzero(key_change)
        ends = np.concatenate([starts[1:], [len(tid)]])
        rows: list[dict] = []
        for s, e in zip(starts, ends):
            sub = {k: v[s:e] for k, v in cols.items()}
            rows.append(self.enc.encode_one(sub))
        if not rows:
            return self.enc({k: v[:0] for k, v in cols.items()})
        return TileEncoder.rows_to_columns(rows)

    def _encode_table(self, t: pa.Table) -> dict:
        """Arrow partition path: ONE lexsort + take co-sorts the partition by
        (tile_id, salt, fid); every tile is then a zero-copy slice already in
        canonical id order, and string columns never leave Arrow (SURVEY.md
        §1.4 'encode is a per-batch kernel').  The flagship schema takes the
        SEGMENTED batch encoder (stages/batch_encode.py): every varint-family
        stream of every tile computed in one vectorized pass, byte-identical
        output.  Falls back to the numpy path for option combinations whose
        kernels are row-oriented (MVT baseline, localized dictionaries on
        non-flagship schemas)."""
        from . import batch_encode as BE

        flagship = t.num_rows > 0 and BE.eligible(self.enc, t)
        if not flagship and (
            self.enc.with_mvt_baseline or self.enc.opts.allow_localized_dictionary
        ):
            return self(
                {k: t[k].to_numpy(zero_copy_only=False) for k in t.column_names}
            )
        if t.num_rows == 0:
            return self({k: t[k].to_numpy(zero_copy_only=False) for k in t.column_names})
        tid = t["tile_id"].to_numpy(zero_copy_only=False)
        salt = t["salt"].to_numpy(zero_copy_only=False)
        fid = t["fid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((fid, salt, tid))
        t = t.take(pa.array(order)).combine_chunks()
        tid = t["tile_id"].to_numpy(zero_copy_only=False)
        salt = t["salt"].to_numpy(zero_copy_only=False)
        key_change = np.concatenate(
            [[True], (tid[1:] != tid[:-1]) | (salt[1:] != salt[:-1])]
        )
        starts = np.flatnonzero(key_change)
        ends = np.concatenate([starts[1:], [len(tid)]])
        if flagship:
            rows = BE.encode_flagship_table(
                t, starts, ends, tid[starts], salt[starts], self.enc
            )
        else:
            rows = [
                self.enc.encode_one_table(t.slice(s, e - s), int(tid[s]), int(salt[s]))
                for s, e in zip(starts, ends)
            ]
        return TileEncoder.rows_to_columns(rows)


def _concat_point_layers(layers: list[LayerData], extent: int) -> LayerData:
    """Concatenate per-salt fragments of ONE tile back into a single layer,
    restoring the canonical id-sorted feature order (group_to_layer sorts by
    image id, so a merged tile is byte-identical to an unsalted encode of
    the same rows).  Handles the engine's point-layer shape (no multi-part
    offsets, all-present properties)."""
    ids = np.concatenate([ly.ids for ly in layers])
    order = np.argsort(ids, kind="stable")
    n = len(ids)
    vb = np.concatenate([np.asarray(ly.vertex_buffer) for ly in layers])
    vb2 = np.empty_like(vb)
    vb2[0::2] = vb[0::2][order]
    vb2[1::2] = vb[1::2][order]
    props: dict[str, PropertyColumn] = {}
    for name, col0 in layers[0].properties.items():
        vals = np.concatenate([np.asarray(ly.properties[name].values) for ly in layers])
        present = np.concatenate(
            [np.asarray(ly.properties[name].present, dtype=bool) for ly in layers]
        )
        if not present.all():
            raise ValueError("fragment merge requires all-present property columns")
        props[name] = PropertyColumn(col0.data_type, present, vals[order])
    return LayerData(
        name=layers[0].name,
        extent=extent,
        geometry_types=np.concatenate([ly.geometry_types for ly in layers])[order],
        vertex_buffer=vb2,
        ids=ids[order],
        properties=props,
    )


class TileFragmentMerger:
    """Partition-batched merge kernel over the COMPACT tile table: the input
    group is a hash partition of tiles (``part = hash(tile_id) mod P``),
    segmented by tile_id inside the kernel.  Single-fragment tiles (the
    overwhelming majority) pass through with one vectorized numpy slice; only
    salted hot tiles decode → concat → re-encode.  The expensive
    feature-level shuffle+encode was spread across salts; this second
    exchange moves only encoded tile bytes (orders of magnitude smaller than
    the input) — SURVEY.md §7.4 'pre-encode partial streams per salt,
    concat-merge in final group'."""

    def __init__(self, opts: EncodeOptions | None = None, extent: int = 4096):
        self.opts = opts or EncodeOptions()
        self.extent = extent

    def _merge_one(self, g: dict) -> dict:
        frag_layers = [decode_tile(bytes(buf)) for buf in g["covt"]]
        merged = _concat_point_layers([ls[0] for ls in frag_layers], self.extent)
        n_layers = int(g["n_layers"][0]) if "n_layers" in g else 1
        layers = [merged]
        if n_layers == 2:
            # the cells layer is a deterministic function of the point SET:
            # rebuilding from merged points is byte-identical to an unsalted
            # encode (per-fragment cells could overlap and cannot be concat'd)
            layers.append(cells_layer_from_points(merged.vertex_buffer, self.extent))
        buf = encode_tile(layers, self.opts)
        row = {
            "tile_id": int(g["tile_id"][0]),
            "z": int(g["z"][0]),
            "x": int(g["x"][0]),
            "y": int(g["y"][0]),
            "salt": 0,
            "n_features": merged.num_features,
            "n_layers": len(layers),
            "covt": buf,
            "covt_bytes": len(buf),
            "plain_bytes": sum(plain_columnar_bytes(ly) for ly in layers),
        }
        if "mvt_bytes" in g:
            mvt_buf = mvt_codec.encode_mvt_tile(layers)
            row["mvt_bytes"] = len(mvt_buf)
            row["mvt_gzip_bytes"] = len(mvt_codec.gzip_tile(mvt_buf))
        if "roundtrip_ok" in g:  # verify already ran upstream: re-verify the merge
            # same verify policy as the main path: basic decode check on every
            # merged tile, full LayerData equality on the deterministic
            # sample (merged tiles are the BIGGEST tiles — an unconditional
            # full-equality pass added ~0.4s per hot tile to the merge wave)
            expect = layers if row["tile_id"] % VERIFY_FULL_MOD == 0 else None
            row["roundtrip_ok"] = verify_tile_buf(
                buf, merged.num_features, expect_layers=expect, n_layers=len(layers)
            )
        return row

    def __call__(self, g: dict) -> dict:
        tid = np.asarray(g["tile_id"], dtype=np.int64)
        if len(tid) == 0:
            return {k: np.asarray(v) for k, v in g.items()}
        order = np.argsort(tid, kind="stable")
        cols = {k: np.asarray(v)[order] for k, v in g.items()}
        tid = cols["tile_id"]
        change = np.concatenate([[True], tid[1:] != tid[:-1]])
        starts = np.flatnonzero(change)
        ends = np.concatenate([starts[1:], [len(tid)]])
        single = (ends - starts) == 1
        out = {k: v[starts[single]] for k, v in cols.items()}
        out["salt"] = np.zeros(len(out["tile_id"]), dtype=np.int32)
        rows = [
            self._merge_one({k: v[s:e] for k, v in cols.items()})
            for s, e in zip(starts[~single], ends[~single])
        ]
        if rows:
            merged_cols = TileEncoder.rows_to_columns(rows)
            out = {
                k: np.concatenate([out[k], merged_cols[k]]) for k in out
            }
        return out


def fragment_ipc_bytes(sub: pa.Table) -> bytes:
    """Serialize one tile-fragment slice as an Arrow IPC stream with
    dictionary-encoded string columns — the pyramid's raw-fragment transit
    format.  Fragments ship ONCE and are encoded ONCE at the merge, so the
    transit format optimizes for (de)serialization speed + shuffle bytes,
    not for the COVT candidate machinery (SURVEY.md §7.4 'pre-encode
    partial streams per salt, concat-merge in final group' — here the
    'partial stream' is simply the columnar rows)."""
    import pyarrow.compute as pc

    for name in ("caption", "fmt"):
        i = sub.schema.get_field_index(name)
        col = sub[name]
        if not pa.types.is_dictionary(col.type):
            sub = sub.set_column(i, name, pc.dictionary_encode(col))
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, sub.schema) as w:
        w.write_table(sub)
    return sink.getvalue().to_pybytes()


def assemble_fragment_table(blobs) -> pa.Table:
    """IPC fragment blobs of ONE tile -> one fid-sorted Arrow table (the
    canonical row order every whole-tile encode uses)."""
    tables = [pa.ipc.open_stream(pa.py_buffer(bytes(b))).read_all() for b in blobs]
    t = pa.concat_tables(tables).combine_chunks()
    for name in ("caption", "fmt"):
        i = t.schema.get_field_index(name)
        if pa.types.is_dictionary(t[name].type):
            t = t.set_column(i, name, t[name].cast(pa.string()))
    order = np.argsort(t["fid"].to_numpy(zero_copy_only=False), kind="stable")
    return t.take(pa.array(order)).combine_chunks()


class RawFragmentMerger:
    """map_groups kernel for the pyramid's fragment path: one group = ALL
    raw (never-encoded) fragments of ONE tile, as IPC blobs.  Deserialize,
    concat, sort by fid, encode the tile EXACTLY ONCE — replacing the old
    encode-fragments → decode → re-encode merge, which paid ~two extra full
    encode passes over every fragmented (low-zoom) tile."""

    def __init__(
        self,
        opts: EncodeOptions | None = None,
        extent: int = 4096,
        with_cells: bool = False,
        with_mvt: bool = False,
    ):
        self.enc = TileEncoder(opts, extent, with_cells=with_cells)
        self.enc.with_mvt_baseline = with_mvt

    def _merge_one(self, tid: int, blobs) -> dict:
        t = assemble_fragment_table(blobs)
        row = self.enc.encode_one_table(t, tid, 0)
        # same verify policy as the whole-tile path: basic decode check on
        # every tile; full_ok carries the deterministic full-equality sample.
        # The BATCHED verifier (family-vectorized varint decode, scalar
        # fallback ladder preserves verdict semantics) replaces the scalar
        # verify_tile_buf: on a 242k-row merged z4 tile the scalar decode
        # was 0.87 s of the 2.0 s merge — the sf0.2 merge-phase straggler.
        from ..tile.batch_verify import verify_tiles

        row["roundtrip_ok"] = row.pop("full_ok") and bool(
            verify_tiles([row["covt"]], [row["n_features"]], [row["n_layers"]])[0]
        )
        return row

    def __call__(self, g: dict) -> dict:
        tid = np.asarray(g["tile_id"], dtype=np.int64)
        if len(tid) == 0:  # an empty merge range (bounded sort slack)
            cols = ["tile_id", "z", "x", "y", "salt", "n_features", "n_layers",
                    "covt", "covt_bytes", "plain_bytes"]
            if self.enc.with_mvt_baseline:
                cols += ["mvt_bytes", "mvt_gzip_bytes"]
            cols.append("roundtrip_ok")
            return {
                k: np.array([], dtype=TileEncoder._DTYPES.get(k, object)) for k in cols
            }
        blobs = np.asarray(g["frag"], dtype=object)
        order = np.argsort(tid, kind="stable")
        tid, blobs = tid[order], blobs[order]
        change = np.concatenate([[True], tid[1:] != tid[:-1]])
        starts = np.flatnonzero(change)
        ends = np.concatenate([starts[1:], [len(tid)]])
        rows = [
            self._merge_one(int(tid[s]), blobs[s:e]) for s, e in zip(starts, ends)
        ]
        return TileEncoder.rows_to_columns(rows)


def verify_tiles_batch(batch: pa.Table) -> pa.Table:
    """Decode-verify stage: decode every COVT tile and check feature counts
    and id round-trip (the engine's per-partition slice of the reference's
    round-trip oracle, CovtParserTest.java:44-91).  The encode stage's
    full-equality sample verdict (``full_ok``, ~1% of tiles compared field
    by field against the original layer) is folded into ``roundtrip_ok``."""
    from ..tile.batch_verify import verify_tiles

    if "n_layers" in batch.column_names:
        nl = batch["n_layers"].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        nl = np.ones(batch.num_rows, dtype=np.int64)
    covt = batch["covt"].to_pylist()  # one bulk conversion, not per-row .as_py()
    nf = batch["n_features"].to_numpy(zero_copy_only=False)
    oks = verify_tiles(covt, nf, nl)
    if "full_ok" in batch.column_names:
        oks &= batch["full_ok"].to_numpy(zero_copy_only=False).astype(bool)
        batch = batch.drop_columns(["full_ok"])
    return batch.append_column("roundtrip_ok", pa.array(oks, pa.bool_()))
