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
from ..tile import EncodeOptions, decode_tile, encode_tile

_POINT_LAYER = "images"


def group_to_layer(g: pd.DataFrame, extent: int = 4096) -> LayerData:
    """Build a point LayerData from one tile group (deterministic order:
    sorted by image index — ordering is load-bearing, SURVEY.md §7.5)."""
    g = g.sort_values("image_id", kind="mergesort").reset_index(drop=True)
    n = len(g)
    vb = np.empty(2 * n, dtype=np.int64)
    vb[0::2] = g["loc_x"].to_numpy(dtype=np.int64)
    vb[1::2] = g["loc_y"].to_numpy(dtype=np.int64)
    ids = (
        g["image_id"].str.slice(3).astype(np.int64).to_numpy().astype(np.uint64)
    )  # img%012d -> numeric id
    return LayerData(
        name=_POINT_LAYER,
        extent=extent,
        geometry_types=np.full(n, GeometryType.POINT, dtype=np.uint8),
        vertex_buffer=vb,
        ids=ids,
        properties={
            "caption": PropertyColumn(
                ColumnDataType.STRING, np.ones(n, bool), g["caption"].to_numpy(dtype=object)
            ),
            "fmt": PropertyColumn(
                ColumnDataType.STRING, np.ones(n, bool), g["fmt"].to_numpy(dtype=object)
            ),
            "phash": PropertyColumn(
                ColumnDataType.INT_64, np.ones(n, bool), g["phash"].to_numpy(dtype=np.int64)
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
            size += int(sum(len(str(s)) + 1 for s in col.values)) + n // 8 + 1
        elif col.data_type in (ColumnDataType.FLOAT,):
            size += 4 * len(col.values) + n // 8 + 1
        else:
            size += 8 * len(col.values) + n // 8 + 1
    return size


class TileEncoder:
    """Actor-pool map_groups kernel: holds EncodeOptions + warm codec state
    once per actor (stateful-stage pattern, SURVEY.md §7.3)."""

    def __init__(self, opts: EncodeOptions | None = None, extent: int = 4096):
        self.opts = opts or EncodeOptions()
        self.extent = extent

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        layer = group_to_layer(g, self.extent)
        buf = encode_tile([layer], self.opts)
        tid = int(g["tile_id"].iloc[0])
        salt = int(g["salt"].iloc[0]) if "salt" in g else 0
        z, x, y = (int(a[0]) for a in S.unpack_tile_id(np.array([tid])))
        return pd.DataFrame(
            {
                "tile_id": [tid],
                "z": np.int32(z),
                "x": np.int32(x),
                "y": np.int32(y),
                "salt": np.int32(salt),
                "n_features": [layer.num_features],
                "covt": [buf],
                "covt_bytes": [len(buf)],
                "plain_bytes": [plain_columnar_bytes(layer)],
            }
        )


def encode_tile_group(g: pd.DataFrame, opts: EncodeOptions | None = None) -> pd.DataFrame:
    return TileEncoder(opts)(g)


def verify_tiles_batch(batch: pa.Table) -> pa.Table:
    """Decode-verify stage: decode every COVT tile and check feature counts
    and id round-trip (the engine's per-partition slice of the reference's
    round-trip oracle, CovtParserTest.java:44-91)."""
    oks = []
    for row in range(batch.num_rows):
        buf = batch["covt"][row].as_py()
        n = batch["n_features"][row].as_py()
        try:
            layers = decode_tile(buf)
            ok = len(layers) == 1 and layers[0].num_features == n and layers[0].ids is not None
        except Exception:
            ok = False
        oks.append(ok)
    return batch.append_column("roundtrip_ok", pa.array(oks, pa.bool_()))
