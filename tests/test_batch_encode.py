"""Byte-identity of the segmented flagship batch encoder vs the per-tile
TileEncoder across adversarial corpora (every fast/fallback routing path)."""

import numpy as np
import pyarrow as pa
import pytest

from cov_tiles_ray.stages import batch_encode as BE
from cov_tiles_ray.stages.tile_encode import MultiTileEncoder, TileEncoder
from cov_tiles_ray.tile import EncodeOptions, decode_tile


def _mk_table(rng, n_tiles, kind="mixed"):
    rows = []
    fid = 0
    vocab = ["dog", "cat", "tree", "river", "mountain", "dusk", "city", "park"]
    for k in range(n_tiles):
        tid = (10 << 58) + k * 7  # some tids hit the 1%-sample modulus
        if kind == "big":
            n = int(rng.integers(32, 120))
        elif kind == "tiny":
            n = int(rng.integers(1, 6))
        elif kind == "dup_points":  # trips the point-ICE speculative gate
            n = int(rng.integers(16, 30))
        else:
            n = int(rng.integers(1, 31))
        xs = rng.integers(0, 4096, n)
        ys = rng.integers(0, 4096, n)
        if kind == "dup_points":
            xs[:] = xs[0]
            ys[:] = ys[0]
        elif kind == "dense_cells":  # many adjacent cells -> FastPFOR range
            n = int(rng.integers(8, 31))
            xs = (rng.integers(0, 20, n) * 64 + rng.integers(0, 64, n)) % 4096
            ys = (rng.integers(0, 20, n) * 64 + rng.integers(0, 64, n)) % 4096
        for i in range(n):
            cap_kind = rng.integers(0, 10)
            if cap_kind == 0:
                cap = ""  # unrepresentable for TOKEN_DICT
            elif cap_kind == 1:
                cap = "double  space word"
            elif cap_kind == 2:
                cap = " leading space"
            elif cap_kind == 3:
                cap = "same caption for everyone"  # dict dedup
            else:
                w = rng.integers(3, 9)
                cap = " ".join(vocab[j] for j in rng.integers(0, len(vocab), w))
            rows.append(
                {
                    "tile_id": tid,
                    "salt": int(rng.integers(0, 2)),
                    "fid": fid,
                    "loc_x": int(xs[i]),
                    "loc_y": int(ys[i]),
                    "caption": cap,
                    "fmt": ["jpeg", "png", "qnt"][int(rng.integers(0, 3))],
                    "phash": int(rng.integers(-(2**62), 2**62)),
                }
            )
            fid += 1
    rng.shuffle(rows)
    return pa.Table.from_pylist(rows)


def _reference_rows(t, inner):
    """The pre-batch per-tile path, verbatim."""
    tid = t["tile_id"].to_numpy(zero_copy_only=False)
    salt = t["salt"].to_numpy(zero_copy_only=False)
    fid = t["fid"].to_numpy(zero_copy_only=False)
    order = np.lexsort((fid, salt, tid))
    t = t.take(pa.array(order)).combine_chunks()
    tid = t["tile_id"].to_numpy(zero_copy_only=False)
    salt = t["salt"].to_numpy(zero_copy_only=False)
    change = np.concatenate([[True], (tid[1:] != tid[:-1]) | (salt[1:] != salt[:-1])])
    starts = np.flatnonzero(change)
    ends = np.concatenate([starts[1:], [len(tid)]])
    return [
        inner.encode_one_table(t.slice(s, e - s), int(tid[s]), int(salt[s]))
        for s, e in zip(starts, ends)
    ]


@pytest.mark.parametrize("kind", ["mixed", "tiny", "big", "dup_points", "dense_cells"])
@pytest.mark.parametrize("with_cells", [False, True])
def test_batch_matches_per_tile(kind, with_cells):
    rng = np.random.default_rng(hash((kind, with_cells)) % 2**32)
    t = _mk_table(rng, 40, kind)
    inner = TileEncoder(EncodeOptions(), with_cells=with_cells)
    expected = _reference_rows(t, inner)
    got = MultiTileEncoder(inner=inner)(t)
    assert len(got["tile_id"]) == len(expected)
    for i, exp in enumerate(expected):
        for key, val in exp.items():
            g = got[key][i]
            assert g == val, (kind, with_cells, i, key, exp["tile_id"], exp["salt"])


def test_batch_used_for_flagship_schema():
    """The fast path must actually engage (guard against silent fallback)."""
    rng = np.random.default_rng(9)
    t = _mk_table(rng, 10, "tiny")
    inner = TileEncoder(EncodeOptions(), with_cells=True)
    assert BE.eligible(inner, t)
    called = {}
    orig = inner.encode_one_table

    def spy(sub, tid, salt):
        called["hit"] = True
        return orig(sub, tid, salt)

    inner.encode_one_table = spy
    MultiTileEncoder(inner=inner)(t)
    # tiny tiles: every segment takes the vectorized path, no fallback
    assert "hit" not in called


def test_batch_decodes_round_trip():
    rng = np.random.default_rng(11)
    t = _mk_table(rng, 25, "mixed")
    inner = TileEncoder(EncodeOptions(), with_cells=True)
    out = MultiTileEncoder(inner=inner)(t)
    for i in range(len(out["tile_id"])):
        layers = decode_tile(bytes(out["covt"][i]))
        assert len(layers) == out["n_layers"][i]
        assert layers[0].num_features == out["n_features"][i]


def test_token_dict_parity_long_captions():
    """Tiles whose caption dictionary crosses the 128-byte TOKEN_DICT
    threshold must pick the same variant (and bytes) as the per-tile path."""
    rng = np.random.default_rng(13)
    rows = []
    for k in range(12):
        tid = (9 << 58) + k
        for i in range(20):
            rows.append(
                {
                    "tile_id": tid,
                    "salt": 0,
                    "fid": k * 100 + i,
                    "loc_x": int(rng.integers(0, 4096)),
                    "loc_y": int(rng.integers(0, 4096)),
                    "caption": "a long shared vocabulary caption number %d with words %d"
                    % (i % 7, i % 3),
                    "fmt": "jpeg",
                    "phash": int(rng.integers(0, 2**60)),
                }
            )
    t = pa.Table.from_pylist(rows)
    inner = TileEncoder(EncodeOptions(), with_cells=False)
    expected = _reference_rows(t, inner)
    got = MultiTileEncoder(inner=inner)(t)
    for i, exp in enumerate(expected):
        assert got["covt"][i] == exp["covt"], i
