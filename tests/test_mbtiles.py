"""MBTiles source/sink round trip (reference S1/S2, actor-pool A5 pattern).

The reference's primary input is an MBTiles corpus read with a per-process
SQLite handle and gunzip (MvtUtils.java:27-41); here: write a generated MVT
tile set to MBTiles, read it back through the actor-pool fetcher, and decode
to identical layers.
"""

import numpy as np
import pandas as pd
import pytest

from cov_tiles_ray.sources import mbtiles, mvt as mvt_codec


@pytest.fixture(scope="module")
def tiny_images(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 800
    return rd.from_pandas(
        pd.DataFrame(
            {
                "image_id": [f"img{i:012d}" for i in range(n)],
                "caption": [f"cap {i % 13} tok {i % 7}" for i in range(n)],
                "fmt": np.where(rng.random(n) < 0.5, "ppm", "qoi"),
                "phash": rng.integers(-(2**62), 2**62, n),
                "lon": rng.uniform(-179, 179, n),
                "lat": rng.uniform(-80, 80, n),
            }
        )
    )


class TestMbtilesRoundTrip:
    def test_write_read_decode(self, tiny_images, tmp_path):
        from cov_tiles_ray.pipelines import transcode

        mvt_tiles = transcode.build_mvt_tiles(tiny_images, z=3).materialize()
        want = {
            (r["z"], r["x"], r["y"]): bytes(r["mvt"])
            for r in mvt_tiles.take_all()
        }
        path = str(tmp_path / "t.mbtiles")
        n = mbtiles.write_mbtiles(mvt_tiles, path)
        assert n == len(want)

        got = mbtiles.read_mbtiles(path, concurrency=2).take_all()
        assert len(got) == len(want)
        for r in got:
            buf = bytes(r["mvt"])
            assert buf == want[(r["z"], r["x"], r["y"])]
            layers = mvt_codec.decode_mvt_tile(buf)
            assert layers[0].num_features > 0

    def test_metadata(self, tiny_images, tmp_path):
        from cov_tiles_ray.pipelines import transcode

        mvt_tiles = transcode.build_mvt_tiles(tiny_images, z=2)
        path = str(tmp_path / "m.mbtiles")
        mbtiles.write_mbtiles(mvt_tiles, path, metadata={"minzoom": "2", "maxzoom": "2"})
        meta = mbtiles.read_metadata(path)
        assert meta["format"] == "pbf" and meta["minzoom"] == "2"

    def test_missing_tile_yields_empty(self, tiny_images, tmp_path):
        import ray.data as rd
        from cov_tiles_ray.pipelines import transcode

        path = str(tmp_path / "e.mbtiles")
        mbtiles.write_mbtiles(transcode.build_mvt_tiles(tiny_images, z=2), path)
        keys = rd.from_pandas(
            pd.DataFrame({"z": [9], "x": [0], "y": [0]}).astype(np.int32)
        )
        out = keys.map_batches(
            mbtiles.MbtilesTileFetcher,
            fn_constructor_args=(path,),
            batch_format="pyarrow",
            concurrency=1,
        ).take_all()
        assert out[0]["mvt"] == b""


class TestCli:
    def test_single_tile_transcode(self, tiny_images, tmp_path):
        from cov_tiles_ray import cli
        from cov_tiles_ray.pipelines import transcode
        from cov_tiles_ray.tile import decode_tile

        mvt_tiles = transcode.build_mvt_tiles(tiny_images, z=3).materialize()
        row = mvt_tiles.take(1)[0]
        path = str(tmp_path / "c.mbtiles")
        mbtiles.write_mbtiles(mvt_tiles, path)
        rc = cli.main(
            ["--filename", path, "-z", str(row["z"]), "-x", str(row["x"]),
             "-y", str(row["y"]), "-o", str(tmp_path)]
        )
        assert rc == 0
        out = tmp_path / f"{row['z']}_{row['x']}_{row['y']}.covt"
        layers = decode_tile(out.read_bytes())
        assert layers[0].num_features > 0

    def test_missing_tile_rc(self, tiny_images, tmp_path):
        from cov_tiles_ray import cli
        from cov_tiles_ray.pipelines import transcode

        path = str(tmp_path / "c2.mbtiles")
        mbtiles.write_mbtiles(transcode.build_mvt_tiles(tiny_images, z=2), path)
        assert cli.main(["--filename", path, "-z", "9", "-x", "0", "-y", "0"]) == 1
