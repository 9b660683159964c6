"""MVT wire-codec round trips (clean-room MVT 2.1; reference ingest path is
MvtUtils.java:63-132 — our parity oracle is encode->decode == identity on
the LayerData model)."""

import numpy as np
import pytest

from cov_tiles_ray.model.format import ColumnDataType, GeometryType, LayerData, PropertyColumn
from cov_tiles_ray.sources import mvt
from cov_tiles_ray.tile import decode_tile, encode_tile


def _points_layer(n=20, seed=3, with_props=True):
    rng = np.random.default_rng(seed)
    vb = np.empty(2 * n, dtype=np.int64)
    vb[0::2] = rng.integers(0, 4096, n)
    vb[1::2] = rng.integers(0, 4096, n)
    props = {}
    if with_props:
        present = rng.random(n) < 0.8
        k = int(present.sum())
        props = {
            "name": PropertyColumn(
                ColumnDataType.STRING,
                np.ones(n, dtype=bool),
                np.array([f"pt-{i % 7}" for i in range(n)], dtype=object),
            ),
            "rank": PropertyColumn(
                ColumnDataType.INT_64, present, rng.integers(-50, 50, k).astype(np.int64)
            ),
            "score": PropertyColumn(
                ColumnDataType.FLOAT, np.ones(n, dtype=bool), rng.random(n).astype(np.float32)
            ),
            "flag": PropertyColumn(
                ColumnDataType.BOOLEAN, np.ones(n, dtype=bool), rng.random(n) < 0.5
            ),
            "big": PropertyColumn(
                ColumnDataType.UINT_64,
                np.ones(n, dtype=bool),
                rng.integers(0, 1 << 62, n).astype(np.uint64),
            ),
        }
    return LayerData(
        name="points",
        extent=4096,
        geometry_types=np.full(n, int(GeometryType.POINT), dtype=np.uint8),
        vertex_buffer=vb,
        ids=np.arange(n, dtype=np.uint64) * 7,
        properties=props,
    )


def test_mvt_points_roundtrip():
    layer = _points_layer()
    buf = mvt.encode_mvt_tile([layer])
    back = mvt.decode_mvt_tile(buf)
    assert len(back) == 1
    assert back[0] == layer


def test_mvt_linestring_roundtrip():
    layer = LayerData(
        name="roads",
        extent=4096,
        geometry_types=np.array([GeometryType.LINESTRING, GeometryType.LINESTRING], dtype=np.uint8),
        part_offsets=np.array([3, 2]),
        vertex_buffer=np.array([0, 0, 10, 5, 20, 5, 100, 100, 90, 80], dtype=np.int64),
        ids=np.array([1, 2], dtype=np.uint64),
    )
    assert mvt.decode_mvt_tile(mvt.encode_mvt_tile([layer]))[0] == layer


def test_mvt_polygon_with_hole_roundtrip():
    # outer CW-in-screen (positive shoelace with our orientation), hole opposite
    outer_x = np.array([0, 100, 100, 0], dtype=np.int64)
    outer_y = np.array([0, 0, 100, 100], dtype=np.int64)
    hole_x = np.array([20, 20, 60, 60], dtype=np.int64)
    hole_y = np.array([20, 60, 60, 20], dtype=np.int64)
    assert mvt._ring_area(outer_x, outer_y) > 0
    assert mvt._ring_area(hole_x, hole_y) < 0
    vb = np.empty(16, dtype=np.int64)
    vb[0:8:2], vb[1:8:2] = outer_x, outer_y
    vb[8:16:2], vb[9:16:2] = hole_x, hole_y
    layer = LayerData(
        name="water",
        extent=4096,
        geometry_types=np.array([GeometryType.POLYGON], dtype=np.uint8),
        part_offsets=np.array([2]),  # 2 rings
        ring_offsets=np.array([4, 4]),
        vertex_buffer=vb,
    )
    assert mvt.decode_mvt_tile(mvt.encode_mvt_tile([layer]))[0] == layer


def test_mvt_multipolygon_roundtrip():
    # two squares, both positive-area outers
    ax = np.array([0, 10, 10, 0], dtype=np.int64)
    ay = np.array([0, 0, 10, 10], dtype=np.int64)
    bx = ax + 50
    by = ay
    vb = np.empty(16, dtype=np.int64)
    vb[0:8:2], vb[1:8:2] = ax, ay
    vb[8:16:2], vb[9:16:2] = bx, by
    layer = LayerData(
        name="bldg",
        extent=8192,
        geometry_types=np.array([GeometryType.MULTIPOLYGON], dtype=np.uint8),
        geometry_offsets=np.array([2]),
        part_offsets=np.array([1, 1]),
        ring_offsets=np.array([4, 4]),
        vertex_buffer=vb,
    )
    assert mvt.decode_mvt_tile(mvt.encode_mvt_tile([layer]))[0] == layer


def test_mvt_multilinestring_multipoint_roundtrip():
    ml = LayerData(
        name="paths",
        extent=4096,
        geometry_types=np.array([GeometryType.MULTILINESTRING], dtype=np.uint8),
        geometry_offsets=np.array([2]),
        part_offsets=np.array([2, 3]),
        vertex_buffer=np.array([0, 0, 5, 5, 100, 0, 110, 0, 120, 10], dtype=np.int64),
    )
    mp = LayerData(
        name="pois",
        extent=4096,
        geometry_types=np.array([GeometryType.MULTIPOINT], dtype=np.uint8),
        geometry_offsets=np.array([3]),
        vertex_buffer=np.array([1, 1, 50, 50, 100, 1], dtype=np.int64),
    )
    back = mvt.decode_mvt_tile(mvt.encode_mvt_tile([ml, mp]))
    assert back[0] == ml
    assert back[1] == mp


def test_mvt_negative_and_sparse_values():
    n = 5
    layer = LayerData(
        name="t",
        extent=4096,
        geometry_types=np.full(n, int(GeometryType.POINT), dtype=np.uint8),
        vertex_buffer=np.arange(2 * n, dtype=np.int64),
        properties={
            "neg": PropertyColumn(
                ColumnDataType.INT_64,
                np.array([1, 0, 1, 0, 1], dtype=bool),
                np.array([-1, -(1 << 40), 7], dtype=np.int64),
            ),
            "d": PropertyColumn(
                ColumnDataType.DOUBLE, np.ones(n, dtype=bool), np.linspace(-1, 1, n)
            ),
        },
    )
    assert mvt.decode_mvt_tile(mvt.encode_mvt_tile([layer]))[0] == layer


def test_mvt_value_dedup_shrinks_output():
    n = 200
    same = LayerData(
        name="t",
        extent=4096,
        geometry_types=np.full(n, int(GeometryType.POINT), dtype=np.uint8),
        vertex_buffer=np.zeros(2 * n, dtype=np.int64),
        properties={
            "c": PropertyColumn(
                ColumnDataType.STRING,
                np.ones(n, dtype=bool),
                np.array(["same-value"] * n, dtype=object),
            )
        },
    )
    distinct = LayerData(
        name="t",
        extent=4096,
        geometry_types=np.full(n, int(GeometryType.POINT), dtype=np.uint8),
        vertex_buffer=np.zeros(2 * n, dtype=np.int64),
        properties={
            "c": PropertyColumn(
                ColumnDataType.STRING,
                np.ones(n, dtype=bool),
                np.array([f"value-{i:04d}" for i in range(n)], dtype=object),
            )
        },
    )
    assert len(mvt.encode_mvt_tile([same])) < len(mvt.encode_mvt_tile([distinct])) / 2


def test_mvt_to_covt_transcode():
    """The reference's primary pipeline (§3.1): MVT -> decode -> COVT encode
    -> COVT decode == MVT decode."""
    layer = _points_layer(n=64, seed=9)
    mvt_bytes = mvt.encode_mvt_tile([layer])
    decoded = mvt.decode_mvt_tile(mvt_bytes)
    covt = encode_tile(decoded)
    back = decode_tile(covt)
    assert back[0] == decoded[0] == layer


def test_gzip_roundtrip_deterministic():
    data = b"x" * 1000 + bytes(range(256))
    gz = mvt.gzip_tile(data)
    assert mvt.gunzip_tile(gz) == data
    assert mvt.gzip_tile(data) == gz  # mtime pinned -> deterministic bytes
