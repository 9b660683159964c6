"""TileJSON sidecar for optimized (id-based) metadata.

The reference's `optimizeMetadata` mode replaces layer/column NAMES in every
tile with u32 ids resolved against a per-tileset TileJSON sidecar
(spec/METADATA.md:1-15, CovtConverter.java:300-363 encode,
CovtParser.java:583-613 decode, converter/tilejson/TileJson.java).  Ours is
the same trade: per-tile bytes shrink, names live once per corpus.

Id assignment (deterministic): layer id = index into ``vector_layers``
(sorted by layer name); column id = 2 + index into the layer's sorted field
names (0/1 stay reserved for id/geometry, matching the unoptimized layout).

Corpus-scale construction is a schema-union aggregate (reference G6: distinct
property keys per layer, CovtConverter.java:487-494) — a tiny
``groupby().count()`` over (layer, field, dtype) triples, never a wide
shuffle of payloads.
"""

from __future__ import annotations

import json

import numpy as np

from ..model.format import ColumnDataType, LayerData

_DT_NAMES = {
    ColumnDataType.BOOLEAN: "Boolean",
    ColumnDataType.INT_64: "Number",
    ColumnDataType.UINT_64: "Number",
    ColumnDataType.INT_32: "Number",
    ColumnDataType.UINT_32: "Number",
    ColumnDataType.FLOAT: "Number",
    ColumnDataType.DOUBLE: "Number",
    ColumnDataType.STRING: "String",
}


def build_sidecar(layers: list[LayerData]) -> dict:
    """TileJSON-shaped sidecar from in-memory layers."""
    by_name: dict[str, dict] = {}
    for ly in layers:
        fields = by_name.setdefault(ly.name, {})
        for fname, col in ly.properties.items():
            fields[fname] = _DT_NAMES.get(ColumnDataType(int(col.data_type)), "String")
    return {
        "tilejson": "3.0.0",
        "vector_layers": [
            {"id": name, "fields": dict(sorted(by_name[name].items()))}
            for name in sorted(by_name)
        ],
    }


def merge_sidecars(sidecars: list[dict]) -> dict:
    """Union many sidecars (the corpus-level schema-union aggregate)."""
    by_name: dict[str, dict] = {}
    for sc in sidecars:
        for vl in sc.get("vector_layers", []):
            by_name.setdefault(vl["id"], {}).update(vl["fields"])
    return {
        "tilejson": "3.0.0",
        "vector_layers": [
            {"id": name, "fields": dict(sorted(by_name[name].items()))}
            for name in sorted(by_name)
        ],
    }


def sidecar_json(sidecar: dict) -> str:
    return json.dumps(sidecar, sort_keys=True, separators=(",", ":"))


def parse_sidecar(text: str) -> dict:
    return json.loads(text)


class SidecarIds:
    """Bidirectional name<->id tables derived from one sidecar."""

    def __init__(self, sidecar: dict):
        self.layer_names: list[str] = [vl["id"] for vl in sidecar["vector_layers"]]
        self.layer_id: dict[str, int] = {n: i for i, n in enumerate(self.layer_names)}
        self.field_names: list[list[str]] = [
            list(vl["fields"].keys()) for vl in sidecar["vector_layers"]
        ]
        self.field_id: list[dict[str, int]] = [
            {f: 2 + i for i, f in enumerate(fs)} for fs in self.field_names
        ]

    def column_name(self, layer_id: int, column_id: int) -> str:
        return self.field_names[layer_id][column_id - 2]


def sidecar_for_dataset(layer_fields) -> dict:
    """Build the corpus sidecar from a Ray Dataset of (layer, field, dtype)
    rows (produced by a map_batches over decoded tiles).  The aggregate is
    exact-distinct over a tiny key domain."""
    import ray.data as rd

    assert isinstance(layer_fields, rd.Dataset)
    pdf = layer_fields.groupby(["layer", "field", "dtype"]).count().to_pandas()
    by_name: dict[str, dict] = {}
    for _, row in pdf.iterrows():
        by_name.setdefault(row["layer"], {})[row["field"]] = _DT_NAMES.get(
            ColumnDataType(int(row["dtype"])), "String"
        )
    return {
        "tilejson": "3.0.0",
        "vector_layers": [
            {"id": name, "fields": dict(sorted(by_name[name].items()))}
            for name in sorted(by_name)
        ],
    }
