"""Golden round-trip tests for the COVT-R tile codec.

Mirrors the reference's core test strategy (SURVEY.md §5: convert -> decode
-> assert full equality of ids, exact geometry, properties; CovtParserTest
.java:44-91) over deterministic synthesized layers instead of checked-in
MVT fixtures.
"""

import numpy as np
import pytest

from cov_tiles_ray.model.format import ColumnDataType, GeometryType, LayerData, PropertyColumn
from cov_tiles_ray.tile import EncodeOptions, decode_tile, encode_tile


def make_point_layer(rng, n=200, extent=4096, clustered=True):
    if clustered:
        centers = rng.integers(0, extent, (8, 2))
        pick = rng.integers(0, 8, n)
        xy = centers[pick] + rng.integers(-100, 100, (n, 2))
        xy = np.clip(xy, 0, extent - 1)
    else:
        xy = rng.integers(0, extent, (n, 2))
    vb = np.empty(2 * n, dtype=np.int64)
    vb[0::2], vb[1::2] = xy[:, 0], xy[:, 1]
    classes = np.array(["bakery", "cafe", "fuel", "school"], dtype=object)
    present_rank = rng.random(n) > 0.4
    return LayerData(
        name="poi",
        extent=extent,
        geometry_types=np.full(n, GeometryType.POINT, dtype=np.uint8),
        vertex_buffer=vb,
        ids=np.sort(rng.integers(0, 10**9, n)).astype(np.uint64),
        properties={
            "class": PropertyColumn(
                ColumnDataType.STRING,
                np.ones(n, dtype=bool),
                classes[rng.integers(0, 4, n)],
            ),
            "rank": PropertyColumn(
                ColumnDataType.INT_64,
                present_rank,
                rng.integers(0, 100, int(present_rank.sum())),
            ),
            "open": PropertyColumn(
                ColumnDataType.BOOLEAN,
                np.ones(n, dtype=bool),
                rng.random(n) > 0.5,
            ),
            "score": PropertyColumn(
                ColumnDataType.FLOAT,
                np.ones(n, dtype=bool),
                rng.random(n).astype(np.float32),
            ),
        },
    )


def make_line_layer(rng, n=60, extent=4096):
    # mixed LINESTRING / MULTILINESTRING with shared vertices (ICE-friendly)
    shared = rng.integers(0, extent, (50, 2))
    gtypes, geo_off, part_off, verts = [], [], [], []
    for i in range(n):
        if rng.random() < 0.3:
            nparts = int(rng.integers(2, 4))
            gtypes.append(GeometryType.MULTILINESTRING)
            geo_off.append(nparts)
        else:
            nparts = 1
            gtypes.append(GeometryType.LINESTRING)
        for _ in range(nparts):
            nv = int(rng.integers(2, 8))
            part_off.append(nv)
            idx = rng.integers(0, 50, nv)
            verts.append(shared[idx])
    vv = np.concatenate(verts)
    vb = np.empty(2 * len(vv), dtype=np.int64)
    vb[0::2], vb[1::2] = vv[:, 0], vv[:, 1]
    admin = np.repeat([2, 4, 4, 8], (n + 3) // 4)[:n]
    brunnel_present = rng.random(n) > 0.7
    brunnel_vals = rng.random(int(brunnel_present.sum())) > 0.5
    return LayerData(
        name="transportation",
        extent=extent,
        geometry_types=np.array(gtypes, dtype=np.uint8),
        vertex_buffer=vb,
        geometry_offsets=np.array(geo_off, dtype=np.int64),
        part_offsets=np.array(part_off, dtype=np.int64),
        ids=rng.integers(0, 10**6, n).astype(np.uint64),
        properties={
            "admin_level": PropertyColumn(ColumnDataType.INT_64, np.ones(n, dtype=bool), admin),
            "brunnel": PropertyColumn(ColumnDataType.BOOLEAN, brunnel_present, brunnel_vals),
        },
    )


def make_polygon_layer(rng, n=40, extent=4096):
    gtypes, geo_off, part_off, ring_off, verts = [], [], [], [], []
    for i in range(n):
        multi = rng.random() < 0.25
        npoly = int(rng.integers(2, 4)) if multi else 1
        gtypes.append(GeometryType.MULTIPOLYGON if multi else GeometryType.POLYGON)
        if multi:
            geo_off.append(npoly)
        for _ in range(npoly):
            nrings = int(rng.integers(1, 3))
            part_off.append(nrings)
            for _ in range(nrings):
                nv = int(rng.integers(4, 10))
                ring_off.append(nv)
                x0, y0 = rng.integers(0, extent - 64, 2)
                ring = np.stack(
                    [x0 + rng.integers(0, 64, nv), y0 + rng.integers(0, 64, nv)], axis=1
                )
                verts.append(ring)
    vv = np.concatenate(verts)
    vb = np.empty(2 * len(vv), dtype=np.int64)
    vb[0::2], vb[1::2] = vv[:, 0], vv[:, 1]
    return LayerData(
        name="building",
        extent=extent,
        geometry_types=np.array(gtypes, dtype=np.uint8),
        vertex_buffer=vb,
        geometry_offsets=np.array(geo_off, dtype=np.int64),
        part_offsets=np.array(part_off, dtype=np.int64),
        ring_offsets=np.array(ring_off, dtype=np.int64),
        ids=np.arange(n, dtype=np.uint64),
        properties={
            "render_height": PropertyColumn(
                ColumnDataType.FLOAT,
                np.ones(n, dtype=bool),
                (rng.random(n) * 100).astype(np.float32),
            ),
            "class": PropertyColumn(
                ColumnDataType.STRING,
                np.ones(n, dtype=bool),
                np.array(["residential", "commercial"], dtype=object)[rng.integers(0, 2, n)],
            ),
        },
    )


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestRoundTrip:
    @pytest.mark.parametrize("geom", ["plain", "ice", "ice_morton", "auto"])
    def test_point_layer(self, rng, geom):
        layer = make_point_layer(rng)
        buf = encode_tile([layer], EncodeOptions(geometry_encoding=geom))
        out = decode_tile(buf)
        assert len(out) == 1
        assert out[0] == layer

    def test_line_layer(self, rng):
        layer = make_line_layer(rng)
        buf = encode_tile([layer])
        assert decode_tile(buf)[0] == layer

    def test_polygon_layer(self, rng):
        layer = make_polygon_layer(rng)
        buf = encode_tile([layer])
        assert decode_tile(buf)[0] == layer

    def test_multi_layer_tile(self, rng):
        layers = [make_point_layer(rng), make_line_layer(rng), make_polygon_layer(rng)]
        buf = encode_tile(layers)
        out = decode_tile(buf)
        assert len(out) == 3
        for got, want in zip(out, layers):
            assert got == want

    def test_no_fastpfor_flags(self, rng):
        layer = make_line_layer(rng)
        buf = encode_tile(
            [layer],
            EncodeOptions(allow_fastpfor_topology=False, allow_fastpfor_vertex=False),
        )
        assert decode_tile(buf)[0] == layer

    def test_without_ids(self, rng):
        layer = make_point_layer(rng)
        buf = encode_tile([layer], EncodeOptions(include_ids=False))
        out = decode_tile(buf)[0]
        assert out.ids is None
        layer.ids = None
        assert out == layer

    def test_empty_layer(self):
        layer = LayerData(
            name="empty",
            extent=4096,
            geometry_types=np.empty(0, dtype=np.uint8),
            vertex_buffer=np.empty(0, dtype=np.int64),
        )
        out = decode_tile(encode_tile([layer]))[0]
        assert out.num_features == 0

    def test_sparse_string_column(self, rng):
        n = 50
        present = rng.random(n) > 0.5
        layer = LayerData(
            name="sparse",
            extent=4096,
            geometry_types=np.full(n, GeometryType.POINT, dtype=np.uint8),
            vertex_buffer=rng.integers(0, 4096, 2 * n).astype(np.int64),
            properties={
                "name": PropertyColumn(
                    ColumnDataType.STRING,
                    present,
                    np.array(["a", "b"], dtype=object)[rng.integers(0, 2, int(present.sum()))],
                )
            },
        )
        assert decode_tile(encode_tile([layer]))[0] == layer


class TestCompression:
    def test_ice_wins_on_shared_vertices(self, rng):
        layer = make_line_layer(rng, n=200)
        plain = encode_tile([layer], EncodeOptions(geometry_encoding="plain", include_ids=False))
        auto = encode_tile([layer], EncodeOptions(geometry_encoding="auto", include_ids=False))
        assert len(auto) <= len(plain)

    def test_beats_plain_int64(self, rng):
        layer = make_point_layer(rng, n=1000)
        buf = encode_tile([layer])
        # plain cost: 2 vertices*8 + id*8 + rank..; just sanity-check density
        assert len(buf) < 1000 * 40


class TestSpatialPointSort:
    """Reference O2 (sortPointFeaturesOnHilbertCurve, MvtConverter.java:
    685-703): point layers optionally pre-sorted on the Hilbert curve."""

    def test_roundtrip_preserves_content_as_set(self, rng):
        layer = make_point_layer(rng, n=300)
        opts = EncodeOptions(sort_points_on_curve=True)
        dec = decode_tile(encode_tile([layer], opts))[0]
        assert dec.num_features == layer.num_features
        assert sorted(dec.ids.tolist()) == sorted(layer.ids.tolist())
        # (id, x, y) triples survive as a set
        want = set(zip(layer.ids.tolist(), layer.vertex_buffer[0::2].tolist(), layer.vertex_buffer[1::2].tolist()))
        got = set(zip(dec.ids.tolist(), dec.vertex_buffer[0::2].tolist(), dec.vertex_buffer[1::2].tolist()))
        assert got == want

    def test_sorted_vertex_stream_shrinks_on_clusters(self, rng):
        layer = make_point_layer(rng, n=2000, clustered=True)
        plain = len(encode_tile([layer], EncodeOptions(geometry_encoding="plain")))
        srt = len(encode_tile([layer], EncodeOptions(geometry_encoding="plain", sort_points_on_curve=True, include_ids=False)))
        base = len(encode_tile([layer], EncodeOptions(geometry_encoding="plain", include_ids=False)))
        assert srt < base  # vertex deltas shrink without the id-stream penalty

    def test_line_layers_unchanged(self, rng):
        from cov_tiles_ray.tile.encode import sort_layer_on_curve

        layer = make_line_layer(rng)
        assert sort_layer_on_curve(layer) is layer


class TestVerifyPredicate:
    """The shared verify predicate (stages.tile_encode.verify_tile_buf) and
    the encode-time full-equality sample must catch injected corruption that
    the count/id checks alone would miss (VERDICT r1 'What's wrong' #6)."""

    def _layer(self, n=50, seed=7):
        rng = np.random.default_rng(seed)
        vb = np.empty(2 * n, dtype=np.int64)
        vb[0::2] = rng.integers(0, 4096, n)
        vb[1::2] = rng.integers(0, 4096, n)
        return LayerData(
            name="images",
            extent=4096,
            geometry_types=np.full(n, GeometryType.POINT, dtype=np.uint8),
            vertex_buffer=vb,
            ids=np.sort(rng.choice(10 * n, n, replace=False)).astype(np.uint64),
            properties={
                "caption": PropertyColumn(
                    ColumnDataType.STRING,
                    np.ones(n, bool),
                    np.array([f"cap{i}" for i in range(n)], dtype=object),
                ),
                "phash": PropertyColumn(
                    ColumnDataType.INT_64, np.ones(n, bool), rng.integers(0, 1 << 40, n)
                ),
            },
        )

    def test_full_equality_catches_property_corruption(self):
        import copy

        from cov_tiles_ray.stages.tile_encode import verify_tile_buf

        layer = self._layer()
        buf = encode_tile([layer])
        assert verify_tile_buf(buf, layer.num_features, expect_layers=[layer])
        # corrupt ONE property value: counts and ids still match, only the
        # full-equality predicate can notice
        bad = copy.deepcopy(layer)
        vals = bad.properties["phash"].values.copy()
        vals[17] += 1
        bad.properties["phash"] = PropertyColumn(
            ColumnDataType.INT_64, bad.properties["phash"].present, vals
        )
        assert not verify_tile_buf(buf, bad.num_features, expect_layers=[bad])
        # geometry corruption likewise
        bad2 = copy.deepcopy(layer)
        bad2.vertex_buffer = bad2.vertex_buffer.copy()
        bad2.vertex_buffer[3] ^= 1
        assert not verify_tile_buf(buf, bad2.num_features, expect_layers=[bad2])

    def test_encoder_full_ok_column_flows_into_roundtrip_ok(self):
        import pyarrow as pa

        from cov_tiles_ray.stages.tile_encode import (
            VERIFY_FULL_MOD,
            TileEncoder,
            verify_tiles_batch,
        )

        n = 8
        g = {
            # tile_id divisible by VERIFY_FULL_MOD -> sampled for full verify
            "tile_id": np.full(n, 2 * VERIFY_FULL_MOD, dtype=np.int64),
            "salt": np.zeros(n, dtype=np.int64),
            "fid": np.arange(n, dtype=np.int64),
            "loc_x": np.arange(n, dtype=np.int64) * 10,
            "loc_y": np.arange(n, dtype=np.int64) * 7,
            "caption": np.array([f"c{i}" for i in range(n)], dtype=object),
            "fmt": np.array(["png"] * n, dtype=object),
            "phash": np.arange(n, dtype=np.int64),
        }
        cols = TileEncoder()(g)
        assert "full_ok" in cols and bool(cols["full_ok"][0])
        t = pa.table({k: pa.array(v) for k, v in cols.items()})
        out = verify_tiles_batch(t)
        assert "full_ok" not in out.column_names
        assert out["roundtrip_ok"].to_pylist() == [True]
        # an injected full_ok=False must force roundtrip_ok False even
        # though the basic decode checks pass
        t_bad = t.set_column(
            t.schema.get_field_index("full_ok"), "full_ok", pa.array([False])
        )
        assert verify_tiles_batch(t_bad)["roundtrip_ok"].to_pylist() == [False]
