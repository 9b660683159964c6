"""Checkpoint / lineage resume (north rule: 'resumable from checkpoint with
per-partition lineage + metrics')."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from cov_tiles_ray.state import checkpoint


class TestLineageRecords:
    def test_record_and_list(self, tmp_path):
        out = str(tmp_path / "run")
        assert checkpoint.finished_partitions(out) == set()
        checkpoint.record_partition(out, "z=4", inputs={"sf": "x"}, metrics={"tiles": 3})
        checkpoint.record_partition(out, "z=6", inputs={"sf": "x"}, metrics={"tiles": 5})
        assert checkpoint.finished_partitions(out) == {"z=4", "z=6"}
        m = json.load(open(os.path.join(checkpoint.metrics_dir(out), "z=4.json")))
        assert m["tiles"] == 3

    def test_idempotent_rewrite(self, tmp_path):
        out = str(tmp_path / "run2")
        checkpoint.record_partition(out, "z=4", inputs={}, metrics={"tiles": 1})
        checkpoint.record_partition(out, "z=4", inputs={}, metrics={"tiles": 9})
        m = json.load(open(os.path.join(checkpoint.metrics_dir(out), "z=4.json")))
        assert m["tiles"] == 9
        assert checkpoint.finished_partitions(out) == {"z=4"}


class TestResume:
    @pytest.fixture()
    def small_images(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(19)
        n = 1500
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "image_id": [f"img{i:012d}" for i in range(n)],
                    "caption": [f"c {i % 11} w {i % 5}" for i in range(n)],
                    "fmt": np.where(rng.random(n) < 0.5, "ppm", "qoi"),
                    "phash": rng.integers(-(2**62), 2**62, n),
                    "lon": rng.uniform(-179, 179, n),
                    "lat": rng.uniform(-80, 80, n),
                }
            )
        )

    def test_write_tiles_skips_finished_partitions(self, small_images, tmp_path):
        from cov_tiles_ray.pipelines import tiling

        out = str(tmp_path / "tiles")
        tiles = tiling.build_tiles(small_images, z=3)
        agg1 = tiling.write_tiles(tiles, out, input_desc={"run": "1"})
        assert agg1["tiles"] > 0 and agg1["skipped_partitions"] == []
        assert checkpoint.finished_partitions(out) == {"z=3"}

        # resumed run: same output dir -> partition is skipped, nothing rewritten
        tiles2 = tiling.build_tiles(small_images, z=3)
        agg2 = tiling.write_tiles(tiles2, out, input_desc={"run": "2"})
        assert agg2["skipped_partitions"] == ["z=3"]
        assert agg2["tiles"] == 0
        # lineage still records the FIRST run's inputs
        lin = json.load(open(os.path.join(checkpoint.lineage_dir(out), "z=3.json")))
        assert lin["inputs"] == {"sf": "1"} or lin["inputs"] == {"run": "1"}


class TestJobEntrypoint:
    """`python -m cov_tiles_ray.job` — the ray-job-submit driver script."""

    def test_run_and_resume(self, ray_session, tmp_path):
        from cov_tiles_ray import job

        out = str(tmp_path / "job_out")
        s1 = job.run_job(0.001, out, zooms=(4, 6), with_cells=False)
        assert s1["tiles"] > 0 and s1["roundtrip_failures"] == 0
        assert s1["skipped_partitions"] == []
        assert checkpoint.finished_partitions(out) == {"z=4", "z=6"}
        # resume: a second run must skip every finished partition
        s2 = job.run_job(0.001, out, zooms=(4, 6), with_cells=False)
        assert s2["skipped_partitions"] == ["z=4", "z=6"]
        assert s2["tiles"] == 0  # nothing recomputed

    def test_resume_after_partial_kill(self, ray_session, tmp_path):
        """Simulate a killed job: z=4's lineage landed, z=6's did not."""
        from cov_tiles_ray import job

        out = str(tmp_path / "killed")
        job.run_job(0.001, out, zooms=(4,), with_cells=False)
        assert checkpoint.finished_partitions(out) == {"z=4"}
        s = job.run_job(0.001, out, zooms=(4, 6), with_cells=False)
        assert s["skipped_partitions"] == ["z=4"]
        assert checkpoint.finished_partitions(out) == {"z=4", "z=6"}
        assert s["roundtrip_failures"] == 0

    def test_main_guards_existing_session(self, ray_session, tmp_path, capsys):
        """Under `ray job submit` (or pytest) Ray is live: main() must not
        re-init or shut the session down."""
        import ray

        from cov_tiles_ray import job

        rc = job.main(["--sf", "0.001", "--out", str(tmp_path / "m"), "--zooms", "4", "--no-cells"])
        assert rc == 0
        assert ray.is_initialized()  # session untouched
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["tiles"] > 0 and summary["roundtrip_failures"] == 0

    def test_resume_skips_compute(self, ray_session, tmp_path, monkeypatch):
        """A fully-finished output must not rebuild the pyramid at all; a
        partial one must rebuild only the unfinished zooms."""
        from cov_tiles_ray import job
        from cov_tiles_ray.pipelines import tiling

        out = str(tmp_path / "compute_skip")
        job.run_job(0.001, out, zooms=(4,), with_cells=False)

        calls = []
        real = tiling.build_tile_pyramid

        def spy(images, zooms=(4, 6, 8, 10), **kw):
            calls.append(tuple(zooms))
            return real(images, zooms=zooms, **kw)

        monkeypatch.setattr(tiling, "build_tile_pyramid", spy)
        s = job.run_job(0.001, out, zooms=(4, 6), with_cells=False)
        assert calls == [(6,)]  # z=4 finished -> only z=6 recomputed
        assert s["skipped_partitions"] == ["z=4"]
        s2 = job.run_job(0.001, out, zooms=(4, 6), with_cells=False)
        assert calls == [(6,)]  # nothing recomputed on a finished output
        assert s2["skipped_partitions"] == ["z=4", "z=6"] and s2["tiles"] == 0

    def test_mid_write_kill_leaves_no_duplicates(self, ray_session, tmp_path):
        """Partial parquet files WITHOUT a lineage record (killed mid-write)
        must be replaced, not appended to, on resume."""
        import pyarrow.parquet as pq

        from cov_tiles_ray import job

        out = str(tmp_path / "killed_mid_write")
        # simulate the partial debris of a killed write: a stray file in the
        # partition dir, no lineage
        os.makedirs(f"{out}/z=4", exist_ok=True)
        pd.DataFrame({"tile_id": [1], "covt": [b"junk"]}).to_parquet(
            f"{out}/z=4/partial-debris.parquet"
        )
        s = job.run_job(0.001, out, zooms=(4,), with_cells=False)
        assert s["roundtrip_failures"] == 0
        t = pq.read_table(f"{out}/z=4")
        ids = t["tile_id"].to_pylist()
        assert len(ids) == len(set(ids)) == s["tiles"]  # no debris, no dupes


class TestResumeUnderChunking:
    """VERDICT r4 #8: the chunked mega-tile merge is now the library
    DEFAULT, so kill/resume must hold when a partition's mega-tile took
    the chunked path — lineage dedup across chunk boundaries, byte-equal
    output to a clean single-shot run, green under BOTH chunk settings."""

    @pytest.mark.parametrize("chunk_rows", [0, 400])
    def test_kill_resume_matches_clean_run(self, ray_session, tmp_path, chunk_rows):
        import pyarrow.parquet as pq
        import ray.data as rd

        from cov_tiles_ray.model.format import CHUNKED_TILE_MARKER
        from cov_tiles_ray.pipelines import tiling
        from cov_tiles_ray.sources import synth

        def pyramid():
            images = rd.read_parquet(
                synth.images_parquet_path(0.001),
                columns=tiling.LIGHT_COLUMNS,
                override_num_blocks=4,
            )
            # hot_zooms=(2,) forces base-level fragmentation; sf0.001 z2
            # tiles hold >400 rows, so chunk_rows=400 chunks their merge
            return tiling.build_tile_pyramid(
                images, zooms=(2, 4), hot_zooms=(2,), with_cells=True
            )

        old = tiling.CHUNK_MERGE_ROWS
        tiling.CHUNK_MERGE_ROWS = chunk_rows
        try:
            clean = str(tmp_path / "clean")
            s0 = tiling.write_tiles(pyramid(), clean, input_desc={"run": "clean"})
            assert s0["tiles"] > 0

            # killed run: z=2 (the chunked partition) finished with lineage;
            # z=4 left mid-write debris WITHOUT a lineage record
            out = str(tmp_path / "killed")
            s1 = tiling.write_tiles(
                pyramid().filter(expr="z == 2"), out, input_desc={"run": "k1"}
            )
            assert checkpoint.finished_partitions(out) == {"z=2"}
            os.makedirs(f"{out}/z=4", exist_ok=True)
            pd.DataFrame({"tile_id": [1], "covt": [b"junk"]}).to_parquet(
                f"{out}/z=4/partial-debris.parquet"
            )

            # resume with the full pyramid: z=2 must be SKIPPED (not
            # re-encoded through the chunk scheduler), z=4 rebuilt clean
            s2 = tiling.write_tiles(pyramid(), out, input_desc={"run": "k2"})
            assert s2["skipped_partitions"] == ["z=2"]
            assert s2["tiles"] == s0["tiles"] - s1["tiles"]

            n_chunked = 0
            for z in (2, 4):
                a = pq.read_table(f"{out}/z={z}").sort_by("tile_id")
                b = pq.read_table(f"{clean}/z={z}").sort_by("tile_id")
                ids = a["tile_id"].to_pylist()
                assert len(ids) == len(set(ids)), f"z={z}: duplicate tiles after resume"
                assert ids == b["tile_id"].to_pylist(), f"z={z}: tile set differs"
                ac = [bytes(x) for x in a["covt"].to_pylist()]
                bc = [bytes(x) for x in b["covt"].to_pylist()]
                assert ac == bc, f"z={z}: bytes differ from the clean run"
                assert a["roundtrip_ok"].to_pandas().all()
                n_chunked += sum(c[:1] == bytes([CHUNKED_TILE_MARKER]) for c in ac)
            if chunk_rows:
                assert n_chunked >= 1  # the chunked path actually engaged
            else:
                assert n_chunked == 0
            # the killed run's z=2 lineage still records the FIRST run
            lin = json.load(open(os.path.join(checkpoint.lineage_dir(out), "z=2.json")))
            assert lin["inputs"] == {"run": "k1"}
        finally:
            tiling.CHUNK_MERGE_ROWS = old
