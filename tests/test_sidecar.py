"""Optimized (TileJSON-id) metadata: sidecar build/merge + round trips.

Reference surface: spec/METADATA.md, convertOptimizedLayerMetadata
(CovtConverter.java:300-363), decode CovtParser.java:583-613."""

import numpy as np
import pytest

from cov_tiles_ray.model.format import ColumnDataType, GeometryType, LayerData, PropertyColumn
from cov_tiles_ray.tile import (
    EncodeOptions,
    SidecarIds,
    build_sidecar,
    decode_tile,
    encode_tile,
    merge_sidecars,
    parse_sidecar,
    sidecar_json,
)


def _layer(n=30, name="pois", seed=5):
    rng = np.random.default_rng(seed)
    vb = np.empty(2 * n, dtype=np.int64)
    vb[0::2] = rng.integers(0, 4096, n)
    vb[1::2] = rng.integers(0, 4096, n)
    return LayerData(
        name=name,
        extent=4096,
        geometry_types=np.full(n, int(GeometryType.POINT), dtype=np.uint8),
        vertex_buffer=vb,
        ids=np.arange(n, dtype=np.uint64),
        properties={
            "kind": PropertyColumn(
                ColumnDataType.STRING,
                np.ones(n, dtype=bool),
                np.array([f"k{i % 4}" for i in range(n)], dtype=object),
            ),
            "elev": PropertyColumn(
                ColumnDataType.INT_64, np.ones(n, dtype=bool), rng.integers(0, 4000, n)
            ),
        },
    )


def test_optimized_roundtrip_and_smaller():
    layer = _layer()
    plain = encode_tile([layer])
    opts = EncodeOptions(optimize_metadata=True)
    sc = build_sidecar([layer])
    ids = SidecarIds(sc)
    optimized = encode_tile([layer], opts, ids)
    assert len(optimized) < len(plain)
    back = decode_tile(optimized, ids)
    assert back[0] == layer
    # sidecar can round-trip through JSON
    ids2 = SidecarIds(parse_sidecar(sidecar_json(sc)))
    assert decode_tile(optimized, ids2)[0] == layer


def test_optimized_requires_sidecar():
    layer = _layer()
    opts = EncodeOptions(optimize_metadata=True)
    buf = encode_tile([layer], opts)  # encode auto-builds its sidecar
    with pytest.raises(ValueError, match="sidecar"):
        decode_tile(buf)


def test_merge_sidecars_union():
    a = build_sidecar([_layer(name="a")])
    extra = _layer(name="a")
    extra.properties["extra"] = PropertyColumn(
        ColumnDataType.BOOLEAN, np.ones(extra.num_features, dtype=bool),
        np.ones(extra.num_features, dtype=bool),
    )
    b = build_sidecar([extra, _layer(name="z")])
    merged = merge_sidecars([a, b])
    names = [vl["id"] for vl in merged["vector_layers"]]
    assert names == ["a", "z"]
    assert set(merged["vector_layers"][0]["fields"]) == {"kind", "elev", "extra"}


def test_corpus_sidecar_decodes_any_tile():
    """Tiles from different subsets decode against the UNION sidecar as long
    as ids were assigned from it (the per-corpus contract)."""
    l1 = _layer(name="pois", seed=1)
    l2 = _layer(name="roads", seed=2)
    union = merge_sidecars([build_sidecar([l1]), build_sidecar([l2])])
    ids = SidecarIds(union)
    opts = EncodeOptions(optimize_metadata=True)
    t1 = encode_tile([l1], opts, ids)
    t2 = encode_tile([l2], opts, ids)
    assert decode_tile(t1, ids)[0] == l1
    assert decode_tile(t2, ids)[0] == l2


def test_sidecar_for_dataset(ray_session):
    import pandas as pd
    import ray.data as rd

    rows = pd.DataFrame(
        {
            "layer": ["pois", "pois", "roads", "pois"],
            "field": ["kind", "elev", "surface", "kind"],
            "dtype": [
                int(ColumnDataType.STRING),
                int(ColumnDataType.INT_64),
                int(ColumnDataType.STRING),
                int(ColumnDataType.STRING),
            ],
        }
    )
    from cov_tiles_ray.tile import sidecar_for_dataset

    sc = sidecar_for_dataset(rd.from_pandas(rows))
    names = [vl["id"] for vl in sc["vector_layers"]]
    assert names == ["pois", "roads"]
    assert sc["vector_layers"][0]["fields"] == {"elev": "Number", "kind": "String"}
