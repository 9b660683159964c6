"""Golden-decode tests: the engine's reference-layout .covt reader
(sources/covt_ref.py) against the reference's checked-in fixture tiles,
validated by comparing with the decode of each tile's MVT twin.

Known golden defects (verified byte-level, excluded below):

* ``omt/3_4_5.covt``, ``amazon_here/*.covt`` — layer data section is
  shorter than the stream metadata declares (exactly one part_offsets
  stream's byteLength missing); written by a buggy converter revision.
* ``omt/{11_1063_1368,6_34_41,8_134_171}`` — the golden dropped degenerate
  polygon rings its JTS reader repaired away (SURVEY.md §7.5's known
  MultiPolygon issues).
* ``omt/{10_532_682,10_533_682,7_68_83,7_68_84,4_8_10}`` — feature-id
  scheme drift: goldens were generated from a tileset revision whose ids
  differ systematically (geometry and properties still match bit-for-bit).
* ``amazon/8_136_89`` — malformed tiny ICE vertex stream.
"""

from __future__ import annotations

import glob
import gzip
import os

import pytest

from cov_tiles_ray.sources.covt_ref import compare_with_mvt, parse_ref_covt
from cov_tiles_ray.sources.mvt import decode_mvt_tile

OMT_COVT = "/root/reference/test/fixtures/omt/covt"
OMT_MVT = "/root/reference/test/fixtures/omt/mvt"
BING_COVT = "/root/reference/test/fixtures/bing/covt"
BING_MVT = "/root/reference/parser/js/data/bing"

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(OMT_COVT), reason="reference fixtures not present"
)

# tiles whose goldens are defective (see module docstring) — decode-only
GOLDEN_DEFECT_TILES = {
    "3_4_5",
    "11_1063_1368",
    "6_34_41",
    "8_134_171",
    "10_532_682",
    "10_533_682",
    "7_68_83",
    "7_68_84",
    "4_8_10",
}

# one pair per zoom, deterministic; full sweep runs as the
# covt_golden_decode driver query
_SAMPLE = [
    "2_2_2",
    "4_3_9",
    "5_16_20",
    "6_32_41",
    "7_66_84",
    "8_132_170",
    "9_264_340",
    "10_530_682",
    "11_1062_1366",
    "12_2130_2733",
    "13_4264_5467",
    "14_8296_10748",
]


def _load_mvt(path):
    buf = open(path, "rb").read()
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    return {ly.name: ly for ly in decode_mvt_tile(buf)}


@needs_fixtures
@pytest.mark.parametrize("tid", _SAMPLE)
def test_omt_golden_matches_mvt_twin(tid):
    cov_path = f"{OMT_COVT}/{tid}.covt"
    mvt_path = f"{OMT_MVT}/{tid}.mvt"
    if not (os.path.exists(cov_path) and os.path.exists(mvt_path)):
        pytest.skip(f"pair {tid} not present")
    golden = {ly.name: ly for ly in parse_ref_covt(open(cov_path, "rb").read())}
    mvt = _load_mvt(mvt_path)
    assert set(golden) == set(mvt)
    for name in mvt:
        issues = compare_with_mvt(mvt[name], golden[name])
        assert not issues, f"{tid}/{name}: {issues}"


@needs_fixtures
def test_all_omt_goldens_parse():
    files = sorted(glob.glob(f"{OMT_COVT}/*.covt"))
    assert len(files) >= 90
    failed = []
    for f in files:
        tid = os.path.basename(f)[:-5]
        try:
            layers = parse_ref_covt(open(f, "rb").read())
            assert layers and sum(ly.num_features for ly in layers) > 0
        except Exception:
            if tid not in GOLDEN_DEFECT_TILES:
                failed.append(tid)
    assert not failed, f"unexpected parse failures: {failed}"


@needs_fixtures
def test_bing_goldens_match_twins():
    files = sorted(glob.glob(f"{BING_COVT}/*.covt"))
    assert len(files) >= 7
    for f in files:
        tid = os.path.basename(f)[:-5]
        mvt_path = f"{BING_MVT}/{tid}.mvt"
        if not os.path.exists(mvt_path):
            continue
        golden = {ly.name: ly for ly in parse_ref_covt(open(f, "rb").read())}
        mvt = _load_mvt(mvt_path)
        for name in set(mvt) & set(golden):
            issues = compare_with_mvt(mvt[name], golden[name])
            assert not issues, f"bing {tid}/{name}: {issues}"


@needs_fixtures
def test_layout_b_goldens_parse():
    """parser/js data files use the TS covtDecoder layout (no extent,
    column-level encodings); they must at least parse into layers."""
    files = sorted(glob.glob("/root/reference/parser/js/data/*/*.covt"))
    assert files
    for f in files:
        layers = parse_ref_covt(open(f, "rb").read())
        assert layers and sum(ly.num_features for ly in layers) > 0


@needs_fixtures
def test_fastpfor_stream_decode_known_values():
    """The landcover ring_offsets stream of omt/10_530_682 is
    FAST_PFOR_DELTA_ZIG_ZAG; its decode must equal the MVT twin's ring
    lengths exactly (pins the JavaFastPFOR block/exception layout)."""
    golden = {ly.name: ly for ly in parse_ref_covt(open(f"{OMT_COVT}/10_530_682.covt", "rb").read())}
    mvt = _load_mvt(f"{OMT_MVT}/10_530_682.mvt")
    import numpy as np

    ra = np.asarray(mvt["landcover"].ring_offsets)
    rb = np.asarray(golden["landcover"].ring_offsets)
    assert len(ra) == len(rb) == 334
    assert (ra == rb).all()


def test_fastpfor_ambiguous_leading_zero_word_fallback():
    """A count-word-less stream can legitimately start with four zero bytes
    (e.g. a LEB128-generation stream whose first four values are 0): the
    skip-count-word parse comes up short and the decoder must retry from
    word 0 instead of failing (ADVICE r2)."""
    import numpy as np

    from cov_tiles_ray.sources.covt_ref import _decode_fastpfor_ints

    raw = bytes([0, 0, 0, 0, 5, 6, 7, 8])  # eight LEB128 varints
    vals = _decode_fastpfor_ints(raw, 8)
    assert vals.tolist() == [0, 0, 0, 0, 5, 6, 7, 8]


def test_fastpfor_zero_count_word_still_parses():
    """The engine's own writer always emits the count word; the normal
    zero-count-word + inverted-continuation VB path must be unaffected by
    the ambiguity fallback."""
    import numpy as np

    from cov_tiles_ray.sources.covt_ref import _decode_fastpfor_ints

    # count word 0 (big-endian), then VB bytes little-endian within the
    # next word: logical [0x85, 0x81, 0x82, 0x83] -> values 5,1,2,3
    raw = bytes([0, 0, 0, 0]) + bytes([0x83, 0x82, 0x81, 0x85])
    vals = _decode_fastpfor_ints(raw, 4)
    assert vals.tolist() == [5, 1, 2, 3]
