"""Reference-layout .covt WRITER tests (sources/covt_ref_write.py): the
engine can now produce old-layout tiles the reference's own parsers read
(inverse of the covt_ref golden reader; framing CovtParser.java /
evaluation/CovtParser.java, pinned against the checked-in goldens).

A per-zoom golden sample + synthetic shape matrix keeps the suite fast;
the full 143-golden sweep runs as the ``covt_ref_write`` driver query.
"""

from __future__ import annotations

import glob
import gzip
import os

import numpy as np
import pytest

from cov_tiles_ray.model.format import ColumnDataType, GeometryType, LayerData, PropertyColumn
from cov_tiles_ray.sources.covt_ref import parse_ref_covt
from cov_tiles_ray.sources.covt_ref_write import encode_ref_tile
from cov_tiles_ray.sources.mvt import decode_mvt_tile

OMT_COVT = "/root/reference/test/fixtures/omt/covt"
OMT_MVT = "/root/reference/test/fixtures/omt/mvt"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(OMT_COVT), reason="reference fixtures not present"
)


def _sample(pattern: str, per_zoom=(2, 4, 7, 10, 13)) -> list[str]:
    out = []
    for z in per_zoom:
        cands = sorted(glob.glob(pattern.format(z=z)))
        if cands:
            out.append(cands[0])
    return out


def _roundtrip(layers):
    buf = encode_ref_tile(layers)
    back = parse_ref_covt(buf)
    assert len(back) == len(layers)
    for a, b in zip(layers, back):
        assert a == b, f"layer {a.name} ref-layout round-trip mismatch"
    return buf


@needs_fixtures
@pytest.mark.parametrize(
    "path", _sample(OMT_COVT + "/{z}_*.covt"), ids=os.path.basename
)
def test_golden_reencode_exact(path):
    """golden -> decode -> ref-layout write -> decode == exact."""
    layers = parse_ref_covt(open(path, "rb").read())
    _roundtrip(layers)


@needs_fixtures
@pytest.mark.parametrize("path", _sample(OMT_MVT + "/{z}_*.mvt"), ids=os.path.basename)
def test_mvt_to_ref_layout(path):
    """real MVT -> our decode -> ref-layout write -> ref read == exact
    (the cross-format interop loop: tiles we write are readable by the
    reference's own layout)."""
    raw = open(path, "rb").read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    layers = decode_mvt_tile(raw)
    _roundtrip(layers)


def _mk_props(n, rng):
    present = np.ones(n, dtype=bool)
    sparse = rng.random(n) < 0.6
    return {
        "name": PropertyColumn(
            ColumnDataType.STRING, present, np.array([f"s{i%3}" for i in range(n)], dtype=object)
        ),
        "name:de": PropertyColumn(
            ColumnDataType.STRING, sparse,
            np.array([f"de{i%2}" for i in range(int(sparse.sum()))], dtype=object),
        ),
        "name_en": PropertyColumn(  # underscore form stays standalone
            ColumnDataType.STRING, present, np.array([f"en{i%2}" for i in range(n)], dtype=object)
        ),
        "rank": PropertyColumn(
            ColumnDataType.INT_64, sparse, rng.integers(-5, 5, size=int(sparse.sum()))
        ),
        "big": PropertyColumn(
            ColumnDataType.UINT_64, present, rng.integers(0, 2**63, size=n, dtype=np.uint64) * 2
        ),
        "height": PropertyColumn(
            ColumnDataType.FLOAT, present, rng.random(n).astype(np.float32)
        ),
        "lonf": PropertyColumn(ColumnDataType.DOUBLE, present, rng.random(n)),
        "flag": PropertyColumn(
            ColumnDataType.BOOLEAN, sparse, rng.random(int(sparse.sum())) < 0.5
        ),
    }


class TestFastPforRefEncoder:
    """encode_fastpfor_ref must be the exact inverse of the golden reader's
    Composition(FastPFOR, VariableByte) decoder."""

    def test_roundtrip_matrix(self):
        from cov_tiles_ray.sources.covt_ref import _decode_fastpfor_ints
        from cov_tiles_ray.sources.covt_ref_write import encode_fastpfor_ref

        rng = np.random.default_rng(3)
        exc = rng.integers(0, 16, size=2048).astype(np.uint32)
        exc[rng.integers(0, 2048, size=100)] = rng.integers(
            2**20, 2**30, size=100
        ).astype(np.uint32)
        w1 = rng.integers(0, 8, size=256).astype(np.uint32)
        w1[7] = 15  # width-1 exception (implied top bit)
        cases = [
            np.zeros(0, dtype=np.uint32),
            np.array([5], dtype=np.uint32),
            rng.integers(0, 100, size=17).astype(np.uint32),
            rng.integers(0, 2**31, size=255).astype(np.uint32),
            rng.integers(0, 2**32, size=256, dtype=np.uint64).astype(np.uint32),
            np.zeros(512, dtype=np.uint32),
            np.full(300, 2**31, dtype=np.uint32),
            rng.integers(0, 2**16, size=70000).astype(np.uint32),  # multi-page
            exc,
            w1,
        ]
        for i, c in enumerate(cases):
            buf = encode_fastpfor_ref(c)
            back = _decode_fastpfor_ints(buf, len(c))
            assert len(back) == len(c) and (back == c).all(), f"case {i}"

    def test_ice_dictionary_roundtrip(self):
        """Shared-vertex layer: ICE must be selected and round-trip."""
        rng = np.random.default_rng(23)
        grid = rng.integers(0, 64, size=(40, 2)) * 64  # heavy vertex sharing
        seq = grid[rng.integers(0, 40, size=400)]
        n = 100
        lay = LayerData(
            name="lines", extent=4096,
            geometry_types=np.full(n, GeometryType.LINESTRING, dtype=np.uint8),
            vertex_buffer=seq.reshape(-1),
            part_offsets=np.full(n, 4, dtype=np.int64),
            ids=np.arange(n, dtype=np.uint64),
            properties={},
        )
        buf = _roundtrip([lay])
        # the dictionary must actually have deduped (ICE chosen => small)
        from cov_tiles_ray.sources.covt_ref_write import _vertex_delta_zz
        assert len(buf) < len(_vertex_delta_zz(seq.reshape(-1).astype(np.int64))) + 200


class TestSyntheticShapes:
    def test_point_layer(self):
        rng = np.random.default_rng(7)
        n = 50
        vb = rng.integers(-10, 4200, size=2 * n)
        lay = LayerData(
            name="pts", extent=4096,
            geometry_types=np.full(n, GeometryType.POINT, dtype=np.uint8),
            vertex_buffer=vb,
            ids=np.sort(rng.integers(0, 1 << 50, size=n).astype(np.uint64)),
            properties=_mk_props(n, rng),
        )
        _roundtrip([lay])

    def test_mixed_line_polygon_layer(self):
        """lines + polygons in ONE layer: only polygon rings gain the
        golden closing vertex (the _close_rings structure walk)."""
        rng = np.random.default_rng(11)
        gt = np.array(
            [GeometryType.LINESTRING, GeometryType.POLYGON,
             GeometryType.MULTILINESTRING, GeometryType.MULTIPOLYGON],
            dtype=np.uint8,
        )
        # line(3) | poly 1 ring(4) | mline 2 parts(2,3) | mpoly 2 polys (1 ring 4, 2 rings 4+3)
        part_offsets = np.array([3, 1, 2, 3, 1, 2], dtype=np.int64)
        ring_offsets = np.array([4, 4, 4, 3], dtype=np.int64)
        geometry_offsets = np.array([2, 2], dtype=np.int64)
        nv = 3 + 4 + (2 + 3) + (4 + 4 + 3)
        vb = rng.integers(0, 4096, size=2 * nv)
        lay = LayerData(
            name="mixed", extent=4096,
            geometry_types=gt,
            vertex_buffer=vb,
            geometry_offsets=geometry_offsets,
            part_offsets=part_offsets,
            ring_offsets=ring_offsets,
            ids=np.arange(4, dtype=np.uint64),
            properties={},
        )
        _roundtrip([lay])

    def test_multipoint_layer(self):
        rng = np.random.default_rng(13)
        gt = np.array([GeometryType.MULTIPOINT, GeometryType.POINT], dtype=np.uint8)
        lay = LayerData(
            name="mp", extent=8192,
            geometry_types=gt,
            vertex_buffer=rng.integers(0, 8192, size=2 * 4),
            geometry_offsets=np.array([3], dtype=np.int64),
            ids=np.array([5, 9], dtype=np.uint64),
            properties={},
        )
        _roundtrip([lay])

    def test_multi_layer_tile_and_no_ids(self):
        rng = np.random.default_rng(17)
        a = LayerData(
            name="a", extent=4096,
            geometry_types=np.full(3, GeometryType.POINT, dtype=np.uint8),
            vertex_buffer=rng.integers(0, 4096, size=6),
            ids=None,
            properties={},
        )
        b = LayerData(
            name="b", extent=4096,
            geometry_types=np.full(2, GeometryType.POINT, dtype=np.uint8),
            vertex_buffer=rng.integers(0, 4096, size=4),
            ids=np.array([1, 2], dtype=np.uint64),
            properties={},
        )
        buf = _roundtrip([a, b])
        assert len(buf) > 4
