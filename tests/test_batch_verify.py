"""verify_tiles (batched) must agree with verify_tile_buf (per tile) on
good tiles, corrupt tiles, wrong expectations, and unsupported shapes."""

import numpy as np
import pyarrow as pa
import pytest

from cov_tiles_ray.stages.tile_encode import MultiTileEncoder, TileEncoder, verify_tile_buf
from cov_tiles_ray.tile import EncodeOptions
from cov_tiles_ray.tile.batch_verify import verify_tiles


def _corpus(rng, n_tiles=40, with_cells=True, kind="mixed"):
    rows = []
    fid = 0
    vocab = ["dog", "cat", "tree", "river", "mountain", "dusk", "harbor", "stone"]
    for k in range(n_tiles):
        tid = (10 << 58) + k * 3
        n = int(rng.integers(1, 60)) if kind == "mixed" else int(rng.integers(1, 8))
        for i in range(n):
            w = rng.integers(3, 9)
            rows.append(
                {
                    "tile_id": tid,
                    "salt": 0,
                    "fid": fid,
                    "loc_x": int(rng.integers(0, 4096)),
                    "loc_y": int(rng.integers(0, 4096)),
                    "caption": " ".join(vocab[j] for j in rng.integers(0, len(vocab), w)),
                    "fmt": ["jpeg", "png"][int(rng.integers(0, 2))],
                    "phash": int(rng.integers(-(2**62), 2**62)),
                }
            )
            fid += 1
    t = pa.Table.from_pylist(rows)
    out = MultiTileEncoder(inner=TileEncoder(EncodeOptions(), with_cells=with_cells))(t)
    return (
        [bytes(b) for b in out["covt"]],
        out["n_features"].astype(np.int64),
        out["n_layers"].astype(np.int64),
    )


def _expected(bufs, nf, nl):
    return np.array(
        [verify_tile_buf(b, int(f), n_layers=int(l)) for b, f, l in zip(bufs, nf, nl)]
    )


@pytest.mark.parametrize("with_cells", [False, True])
def test_good_tiles_all_pass(with_cells):
    rng = np.random.default_rng(21)
    bufs, nf, nl = _corpus(rng, with_cells=with_cells)
    got = verify_tiles(bufs, nf, nl)
    assert got.all()
    np.testing.assert_array_equal(got, _expected(bufs, nf, nl))


def test_wrong_expectations_flagged():
    rng = np.random.default_rng(22)
    bufs, nf, nl = _corpus(rng, n_tiles=12)
    nf2 = nf.copy()
    nf2[3] += 1  # wrong feature count
    nl2 = nl.copy()
    nl2[7] += 1  # wrong layer count
    got = verify_tiles(bufs, nf2, nl2)
    exp = _expected(bufs, nf2, nl2)
    np.testing.assert_array_equal(got, exp)
    assert not got[3] and not got[7] and got[[0, 1, 2, 4, 5, 6]].all()


@pytest.mark.parametrize("mutation", ["truncate", "flip_mid", "flip_head", "empty"])
def test_corruption_agrees_with_per_tile(mutation):
    rng = np.random.default_rng(23)
    bufs, nf, nl = _corpus(rng, n_tiles=15)
    bufs = list(bufs)
    for victim in (2, 9):
        b = bytearray(bufs[victim])
        if mutation == "truncate":
            b = b[: len(b) // 2]
        elif mutation == "flip_mid":
            b[len(b) // 2] ^= 0xFF
        elif mutation == "flip_head":
            b[1] ^= 0x3F
        else:
            b = bytearray()
        bufs[victim] = bytes(b)
    got = verify_tiles(bufs, nf, nl)
    exp = _expected(bufs, nf, nl)
    # agreement with the per-tile oracle is the contract; a flipped byte in
    # e.g. the dictionary payload may still decode cleanly for both paths
    np.testing.assert_array_equal(got, exp)
    if mutation in ("truncate", "empty"):
        assert not got[2] and not got[9]


def test_random_byte_fuzz_agrees():
    rng = np.random.default_rng(24)
    bufs, nf, nl = _corpus(rng, n_tiles=20)
    bufs = list(bufs)
    for trial in range(60):
        i = int(rng.integers(0, len(bufs)))
        b = bytearray(bufs[i])
        b[int(rng.integers(0, len(b)))] ^= int(rng.integers(1, 256))
        mutated = list(bufs)
        mutated[i] = bytes(b)
        got = verify_tiles(mutated, nf, nl)
        exp = _expected(mutated, nf, nl)
        np.testing.assert_array_equal(got, exp, err_msg=f"trial {trial} tile {i}")


def test_ice_and_localized_tiles_route_to_scalar_path():
    """Tiles outside the fast set (ICE geometry via duplicate points) must
    still verify correctly through the per-tile fallback."""
    rng = np.random.default_rng(25)
    rows = []
    for k in range(6):
        tid = (11 << 58) + k
        x0, y0 = int(rng.integers(0, 4000)), int(rng.integers(0, 4000))
        for i in range(20):  # all-duplicate points -> speculative ICE runs
            rows.append(
                {
                    "tile_id": tid, "salt": 0, "fid": k * 100 + i,
                    "loc_x": x0, "loc_y": y0,
                    "caption": "dup point caption", "fmt": "png",
                    "phash": int(rng.integers(0, 2**60)),
                }
            )
    t = pa.Table.from_pylist(rows)
    out = MultiTileEncoder(inner=TileEncoder(EncodeOptions(), with_cells=True))(t)
    bufs = [bytes(b) for b in out["covt"]]
    nf, nl = out["n_features"], out["n_layers"]
    got = verify_tiles(bufs, nf, nl)
    np.testing.assert_array_equal(got, _expected(bufs, nf, nl))
    assert got.all()


def test_fast_path_engages_no_fallback(monkeypatch):
    """Flagship tiles must verify WITHOUT falling back to the scalar
    decoder (guards against a silent full-batch fallback regression)."""
    import cov_tiles_ray.stages.tile_encode as TE

    rng = np.random.default_rng(31)
    bufs, nf, nl = _corpus(rng, n_tiles=20, kind="tiny")
    calls = []
    orig = TE.verify_tile_buf
    monkeypatch.setattr(TE, "verify_tile_buf", lambda *a, **k: calls.append(1) or orig(*a, **k))
    got = verify_tiles(bufs, nf, nl)
    assert got.all()
    assert not calls, f"{len(calls)} tiles fell back to the scalar decoder"
