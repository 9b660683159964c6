"""Localized (shared) string dictionary columns — M15.

Reference: convertLocalizedStringDictionaryColumn (CovtConverter.java:
1223-1292, throws 'implement'); working decode parser/js/src/evaluation/
index.ts:507-555.  Ours implements BOTH sides; framing divergence (each
family member is its own LOCALIZED_DICTIONARY column, head carries the
shared dict) documented in encode.py."""

import numpy as np

from cov_tiles_ray.model.format import ColumnDataType, GeometryType, LayerData, PropertyColumn
from cov_tiles_ray.tile import EncodeOptions, decode_tile, encode_tile


def _layer_with_names(n=40):
    rng = np.random.default_rng(11)
    vb = np.empty(2 * n, dtype=np.int64)
    vb[0::2] = rng.integers(0, 4096, n)
    vb[1::2] = rng.integers(0, 4096, n)
    base = np.array([f"City{i % 6}" for i in range(n)], dtype=object)
    # localized names heavily overlap the base names (the win case)
    en = base.copy()
    de = np.array([f"Stadt{i % 6}" if i % 3 else str(base[i]) for i in range(n)], dtype=object)
    some = np.zeros(n, dtype=bool)
    some[:: 2] = True
    ones = np.ones(n, dtype=bool)
    return LayerData(
        name="place",
        extent=4096,
        geometry_types=np.full(n, int(GeometryType.POINT), dtype=np.uint8),
        vertex_buffer=vb,
        properties={
            "name": PropertyColumn(ColumnDataType.STRING, ones, base),
            "name:en": PropertyColumn(ColumnDataType.STRING, ones, en),
            "name:de": PropertyColumn(ColumnDataType.STRING, some, de[some]),
            "class": PropertyColumn(
                ColumnDataType.STRING, ones, np.array(["town"] * n, dtype=object)
            ),
        },
    )


def test_localized_roundtrip():
    layer = _layer_with_names()
    opts = EncodeOptions(allow_localized_dictionary=True)
    buf = encode_tile([layer], opts)
    assert decode_tile(buf)[0] == layer


def test_localized_smaller_than_per_column_dicts():
    layer = _layer_with_names(200)
    plain = encode_tile([layer], EncodeOptions(allow_localized_dictionary=False))
    localized = encode_tile([layer], EncodeOptions(allow_localized_dictionary=True))
    assert len(localized) < len(plain)


def test_localized_disabled_by_default():
    layer = _layer_with_names()
    assert decode_tile(encode_tile([layer]))[0] == layer


def test_localized_with_optimized_metadata():
    from cov_tiles_ray.tile import SidecarIds, build_sidecar

    layer = _layer_with_names()
    opts = EncodeOptions(allow_localized_dictionary=True, optimize_metadata=True)
    ids = SidecarIds(build_sidecar([layer]))
    buf = encode_tile([layer], opts, ids)
    assert decode_tile(buf, ids)[0] == layer


def test_single_member_family_stays_plain_dictionary():
    n = 10
    layer = LayerData(
        name="t",
        extent=4096,
        geometry_types=np.full(n, int(GeometryType.POINT), dtype=np.uint8),
        vertex_buffer=np.arange(2 * n, dtype=np.int64),
        properties={
            "name": PropertyColumn(
                ColumnDataType.STRING,
                np.ones(n, dtype=bool),
                np.array(["x"] * n, dtype=object),
            )
        },
    )
    opts = EncodeOptions(allow_localized_dictionary=True)
    assert decode_tile(encode_tile([layer], opts))[0] == layer
