"""Skew handling: density-gated salting + fragment merge (SURVEY.md §7.4).

The contract under test: salting a hot zoom fragments tiles across the
shuffle, and the fragment-merge pass restores ONE row per (z,x,y) whose
COVT bytes are identical to an unsalted encode of the same rows — so the
skew machinery is invisible in the output (tile assignments stay
bit-for-bit, north_rule).
"""

import numpy as np
import pandas as pd
import pytest

from cov_tiles_ray.pipelines import tiling


class TestHotZooms:
    def test_sandbox_scale_mid_zooms_never_salt(self):
        # sf0.1 corpus: 600k rows -> z6+ tiles stay whole (z4 is borderline
        # under the 16k fragment cap and may salt — that's the cap working,
        # not a regression; the merge pass keeps output bytes identical)
        assert tiling.hot_zooms_for(600_000, (6, 8, 10)) == ()

    def test_planet_scale_salts_low_zooms(self):
        hot = tiling.hot_zooms_for(10**12, (2, 4, 6, 8, 10, 12, 14))
        assert 2 in hot and 4 in hot
        # expected density shrinks 4x per zoom -> hotness is monotone: if z
        # is hot, every lower zoom in the set is hot
        assert list(hot) == sorted(hot)
        assert hot == tuple(z for z in (2, 4, 6, 8, 10, 12, 14) if z <= max(hot))
        # a corpus small enough that even z2 stays under the cap salts nothing
        assert tiling.hot_zooms_for(16, (2, 4, 6)) == ()

    def test_zero_rows(self):
        assert tiling.hot_zooms_for(0, (2, 4)) == ()


@pytest.fixture(scope="module")
def small_images(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame(
        {
            "image_id": [f"img{i:012d}" for i in range(n)],
            "caption": [f"cap {i % 37} word {i % 11}" for i in range(n)],
            "fmt": np.where(rng.random(n) < 0.5, "ppm", "qoi"),
            "phash": rng.integers(-(2**62), 2**62, n),
            "lon": rng.uniform(-179, 179, n),
            "lat": rng.uniform(-80, 80, n),
        }
    )
    return rd.from_pandas(df)


def _tiles_df(ds):
    return (
        ds.select_columns(["tile_id", "salt", "n_features", "covt", "covt_bytes"])
        .to_pandas()
        .sort_values("tile_id")
        .reset_index(drop=True)
    )


class TestSaltedMerge:
    def test_salted_output_matches_unsalted(self, small_images):
        plain = _tiles_df(tiling.build_tiles(small_images, z=3, hot_zooms=()))
        salted = _tiles_df(tiling.build_tiles(small_images, z=3, hot_zooms=(3,)))
        assert (salted["salt"] == 0).all()
        assert len(salted) == len(plain)
        assert salted["tile_id"].tolist() == plain["tile_id"].tolist()
        assert salted["n_features"].tolist() == plain["n_features"].tolist()
        # merged fragments re-encode to byte-identical tiles
        for a, b in zip(plain["covt"], salted["covt"]):
            assert bytes(a) == bytes(b)

    def test_unsalted_has_one_row_per_tile(self, small_images):
        df = _tiles_df(tiling.build_tiles(small_images, z=3, hot_zooms=()))
        assert df["tile_id"].is_unique
        assert int(df["n_features"].sum()) == 3000


class TestBorderlineTileConsistency:
    def test_inconsistent_batch_salting_still_merges_whole(self, ray_session, monkeypatch):
        """A tile salted in one batch but not another (the adaptive decision
        is per batch) must still come out as ONE row — the salt-0 fragment
        has to join the merge via the global salted-id set, not a local
        salt!=0 filter (regression: duplicated partial tiles)."""
        import ray.data as rd

        from cov_tiles_ray.pipelines import tiling

        rng = np.random.default_rng(23)
        n = 2000
        lon = rng.uniform(100.0, 140.0, n)  # spread over several z3 tiles
        lat = rng.uniform(-40.0, 40.0, n)
        # tile hot in block 1 (rows 0..599), barely present in block 2
        lon[:600] = 10.0 + rng.uniform(0, 20, 600)  # one z3 tile: x in [4..]
        lat[:600] = 10.0 + rng.uniform(0, 20, 600)
        lon[1000:1030] = 10.0 + rng.uniform(0, 20, 30)
        lat[1000:1030] = 10.0 + rng.uniform(0, 20, 30)
        df = pd.DataFrame(
            {
                "image_id": [f"img{i:012d}" for i in range(n)],
                "caption": [f"c {i % 7} d {i % 3}" for i in range(n)],
                "fmt": "ppm",
                "phash": rng.integers(-(2**60), 2**60, n),
                "lon": lon,
                "lat": lat,
            }
        )
        images = rd.from_pandas(df).repartition(2)
        monkeypatch.setattr(tiling, "MAX_GROUP_ROWS", 256)
        out = (
            tiling.build_tiles(images, z=3)
            .select_columns(["tile_id", "n_features", "salt"])
            .to_pandas()
        )
        assert out["tile_id"].is_unique, "borderline tile duplicated across branches"
        assert int(out["n_features"].sum()) == n
        assert (out["salt"] == 0).all()


class TestExchangeSizing:
    """sqrt(n)-scaled block/range sizing: bit-identical to the tuned
    constants at or below sf0.1, linear chunk-matrix growth beyond."""

    def test_anchored_at_sf01_and_below(self):
        from cov_tiles_ray.pipelines.tiling import exchange_ranges, read_blocks

        # the exact tuned values the round-1/2 benchmarks were built on
        assert (read_blocks(600_000), exchange_ranges(600_000)) == (30, 120)
        assert (read_blocks(60_000), exchange_ranges(60_000)) == (8, 12)
        assert (read_blocks(6_000), exchange_ranges(6_000)) == (8, 8)

    def test_chunk_matrix_grows_linearly_beyond(self):
        from cov_tiles_ray.pipelines.tiling import exchange_ranges, read_blocks

        chunks = lambda n: read_blocks(n) * exchange_ranges(n)
        # doubling data must not ~quadruple the shuffle's chunk matrix
        assert chunks(1_200_000) < 2.5 * chunks(600_000)
        assert chunks(2_400_000) < 2.5 * chunks(1_200_000)
        # and sizing keeps growing monotonically (no plateau inversion)
        assert exchange_ranges(2_400_000) > exchange_ranges(1_200_000)
        assert read_blocks(2_400_000) > read_blocks(1_200_000)

    def test_range_rows_capped_below_block_split_hazard(self):
        from cov_tiles_ray.pipelines.tiling import exchange_rows_per_range

        # a reduce range must stay far below Ray's 128 MB block cap: a
        # split range could cut a terminal cell in two -> double-encoded
        # tiles.  500k rows ~ 50 MB of light columns.
        for n in (10**6, 10**8, 10**10, 10**12):
            assert exchange_rows_per_range(n) <= 500_000
