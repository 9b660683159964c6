"""Round-trip validation against the reference's REAL checked-in fixture
tiles (CovtConverterTest.java:156-276 exercises the same corpora).

A deterministic per-zoom sample keeps the suite fast; the full 115-tile
sweep runs as the ``omt_fixture_transcode`` driver query.
"""

from __future__ import annotations

import glob
import gzip
import os

import numpy as np
import pytest

from cov_tiles_ray.model.format import ColumnDataType, GeometryType, LayerData, PropertyColumn
from cov_tiles_ray.sources.mvt import decode_mvt_tile, encode_mvt_layer, encode_mvt_tile
from cov_tiles_ray.tile.decode import decode_tile
from cov_tiles_ray.tile.encode import EncodeOptions, encode_tile

OMT_DIR = "/root/reference/test/fixtures/omt/mvt"
HERE_DIR = "/root/reference/test/fixtures/amazon_here/mvt"
BING_DIR = "/root/reference/parser/js/data/bing"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(OMT_DIR), reason="reference fixtures not present"
)


def _load(path: str) -> bytes:
    buf = open(path, "rb").read()
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    return buf


def _sample_tiles() -> list[str]:
    out = []
    for z in (2, 5, 8, 11, 13):
        cands = sorted(glob.glob(f"{OMT_DIR}/{z}_*.mvt"))
        if cands:
            out.append(cands[0])
    out += sorted(glob.glob(f"{HERE_DIR}/*.pbf"))[:2]  # mixed-type property tiles
    out += sorted(glob.glob(f"{BING_DIR}/*.mvt"))[:2]
    return out


@needs_fixtures
@pytest.mark.parametrize("path", _sample_tiles(), ids=os.path.basename)
def test_real_fixture_roundtrip(path):
    layers = decode_mvt_tile(_load(path))
    assert layers and sum(ly.num_features for ly in layers) > 0
    covt = encode_tile(layers)
    back = decode_tile(covt)
    assert len(back) == len(layers)
    for a, b in zip(layers, back):
        assert a == b, f"layer {a.name} round-trip mismatch in {path}"


@needs_fixtures
def test_omt_compression_in_reference_band():
    """z5 fixture reduction must land in the reference's band (README.md:
    21-35 claims 74% at z5; require >=65% to allow corpus drift)."""
    mvt_b = covt_b = 0
    for path in sorted(glob.glob(f"{OMT_DIR}/5_*.mvt"))[:6]:
        raw = _load(path)
        layers = decode_mvt_tile(raw)
        mvt_b += len(raw)
        covt_b += len(encode_tile(layers))
    assert mvt_b > 0
    assert (1 - covt_b / mvt_b) * 100 >= 65.0


@needs_fixtures
def test_mixed_type_property_promoted_to_string():
    """amazon_here roads.all_route_types mixes sint64 and string values;
    the decoder must promote the column to STRING (MVT allows per-value
    types, a columnar layout does not)."""
    layers = decode_mvt_tile(_load(f"{HERE_DIR}/5_16_10.pbf"))
    roads = next(ly for ly in layers if ly.name == "roads")
    col = roads.properties["all_route_types"]
    assert col.data_type == ColumnDataType.STRING
    assert all(isinstance(v, str) for v in col.values)


def test_id_property_renamed_to_underscore_id():
    """'id' is reserved in COVT; the reference renames a string 'id'
    property to '_id' (MvtUtils.java:104-113)."""
    layer = LayerData(
        name="pois",
        extent=4096,
        geometry_types=np.array([GeometryType.POINT] * 2, dtype=np.uint8),
        vertex_buffer=np.array([1, 2, 3, 4], dtype=np.int64),
        ids=np.array([7, 8], dtype=np.uint64),
        properties={
            "id": PropertyColumn(
                ColumnDataType.STRING,
                np.array([True, True]),
                np.array(["a", "b"], dtype=object),
            )
        },
    )
    buf = encode_mvt_tile([layer])
    (back,) = decode_mvt_tile(buf)
    assert "_id" in back.properties and "id" not in back.properties
    assert list(back.properties["_id"].values) == ["a", "b"]


@needs_fixtures
def test_read_mvt_dir_parses_names_and_gunzips(ray_session):
    from cov_tiles_ray.sources.mvt_files import read_mvt_dir

    ds = read_mvt_dir(HERE_DIR)
    rows = ds.take_all()
    assert len(rows) == len(glob.glob(f"{HERE_DIR}/*.pbf"))
    for r in rows:
        assert r["z"] >= 0 and r["mvt"][:2] != b"\x1f\x8b"
        decode_mvt_tile(r["mvt"])  # parses


@needs_fixtures
def test_schema_scan_unions_layer_schemas(ray_session, monkeypatch):
    """M1 distributed schema-union: per-tile scans merge into one
    per-(layer, column) schema with promoted dtypes."""
    from cov_tiles_ray.pipelines import rows_only

    monkeypatch.setattr(rows_only, "REFERENCE_FIXTURE_DIRS", [HERE_DIR])
    df = rows_only.q_schema_scan("ignored")
    assert len(df) > 5
    assert (df.groupby(["layer", "column"]).size() == 1).all()  # unioned
    from cov_tiles_ray.model.format import ColumnDataType
    assert set(df["dtype"]) <= {int(v) for v in ColumnDataType}
    assert (df["present_rows"] > 0).all() and (df["tiles"] >= 1).all()


@needs_fixtures
def test_transcode_dir_ref_layout_resumable(ray_session, tmp_path):
    """MVT dir -> reference-layout .covt dir: outputs parse with the golden
    reader and match the MVT decode exactly; a second run skips everything
    (resumable partitioned sink)."""
    import glob as _glob

    from cov_tiles_ray.pipelines.transcode import transcode_dir_to_covt
    from cov_tiles_ray.sources.covt_ref import parse_ref_covt

    out = str(tmp_path / "covt")
    s1 = transcode_dir_to_covt(HERE_DIR, out, layout="ref")
    n_in = len(_glob.glob(f"{HERE_DIR}/*.pbf"))
    assert s1["tiles"] == n_in and s1["ok"] == n_in and s1["skipped"] == 0
    for f in _glob.glob(out + "/*.covt"):
        z, x, y = (int(v) for v in os.path.basename(f)[:-5].split("_"))
        mvt_path = os.path.join(HERE_DIR, f"{z}_{x}_{y}.pbf")
        want = decode_mvt_tile(_load(mvt_path))
        got = parse_ref_covt(open(f, "rb").read())
        assert len(got) == len(want) and all(a == b for a, b in zip(want, got))
    s2 = transcode_dir_to_covt(HERE_DIR, out, layout="ref")
    assert s2["skipped"] == n_in and s2["ok"] == n_in


@needs_fixtures
def test_transcode_dir_stale_output_retranscoded(ray_session, tmp_path):
    """A pre-existing .covt whose sidecar records a DIFFERENT layout (or no
    sidecar at all) must be re-transcoded, not silently skipped (ADVICE r2:
    stale outputs from an earlier run with different options)."""
    import glob as _glob

    from cov_tiles_ray.pipelines.transcode import transcode_dir_to_covt

    out = str(tmp_path / "covt")
    s1 = transcode_dir_to_covt(HERE_DIR, out, layout="covtr")
    n_in = len(_glob.glob(f"{HERE_DIR}/*.pbf"))
    assert s1["ok"] == n_in and s1["skipped"] == 0
    # same dir, different layout: nothing may be skipped
    s2 = transcode_dir_to_covt(HERE_DIR, out, layout="ref")
    assert s2["skipped"] == 0 and s2["ok"] == n_in
    # now the sidecars record layout=ref -> a repeat run skips everything
    s3 = transcode_dir_to_covt(HERE_DIR, out, layout="ref")
    assert s3["skipped"] == n_in
    # a covt without a sidecar (pre-sidecar run / kill between writes)
    metas = _glob.glob(out + "/*.meta")
    os.remove(metas[0])
    s4 = transcode_dir_to_covt(HERE_DIR, out, layout="ref")
    assert s4["skipped"] == n_in - 1 and s4["ok"] == n_in
