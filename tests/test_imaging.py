"""Multimodal actor-pool stages: thumbnail/feature extraction, frame sampling."""

import numpy as np
import pandas as pd
import pytest

from cov_tiles_ray.functions import image as img_f
from cov_tiles_ray.pipelines import imaging


class TestResize:
    def test_nearest_identity(self):
        img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        assert np.array_equal(imaging.resize_nearest(img, 4, 6), img)

    def test_bilinear_constant_image(self):
        img = np.full((10, 10, 3), 77, dtype=np.uint8)
        out = imaging.resize_bilinear(img, 4, 7)
        assert out.shape == (4, 7, 3)
        assert (out == 77).all()

    def test_downscale_shapes(self):
        img = np.random.default_rng(0).integers(0, 256, (33, 47, 3)).astype(np.uint8)
        assert imaging.resize_bilinear(img, 8, 8).shape == (8, 8, 3)
        assert imaging.resize_nearest(img, 8, 8).shape == (8, 8, 3)


class TestThumbnailPipeline:
    def test_actor_pool_end_to_end(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(5)
        rows = []
        for i in range(40):
            img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
            rows.append(
                {"image_id": f"img{i:012d}", "fmt": "png", "bytes": img_f.encode_image(img, "png")}
            )
        ds = rd.from_pandas(pd.DataFrame(rows))
        out = imaging.thumbnail_pipeline(ds, thumb=8, concurrency=2, batch_size=16).to_pandas()
        assert len(out) == 40
        assert set(["thumb", "thumb_phash", "brightness", "edge_density"]) <= set(out.columns)
        # thumbnails decode back to 8x8 rgb
        t = img_f.decode_image(bytes(out["thumb"][0]), "png")
        assert t.shape == (8, 8, 3)
        assert out["brightness"].between(0, 255).all()


class TestTileMosaic:
    def test_mosaic_matches_independent_recompute(self, ray_session):
        """q_image_tile_mosaic vs a straight-line pandas recompute from the
        same parquet: every tile's membership, cap and crc must match."""
        import zlib

        import pyarrow.parquet as pq

        from cov_tiles_ray.functions import spatial as S
        from cov_tiles_ray.pipelines import rows_only
        from cov_tiles_ray.sources import synth

        sf_dir = "/root/testdata/sf0.001"
        got = rows_only.q_image_tile_mosaic(sf_dir)

        df = (
            pq.read_table(
                synth.images_parquet_path(synth.sf_from_dir(sf_dir)),
                columns=["image_id", "bytes", "fmt", "lon", "lat"],
            )
            .to_pandas()
            .head(8000)
        )
        T, G = rows_only._MOSAIC_THUMB, rows_only._MOSAIC_GRID
        tx, ty = S.lonlat_to_tile(df["lon"].to_numpy(), df["lat"].to_numpy(), rows_only._MOSAIC_Z)
        df["tile_id"] = S.pack_tile_id(rows_only._MOSAIC_Z, tx, ty).astype(np.int64)
        exp_rows = []
        for tid, g in df.groupby("tile_id"):
            g = g.sort_values("image_id")
            canvas = np.zeros((G * T, G * T), np.uint8)
            used = min(len(g), G * G)
            for i in range(used):
                img = img_f.decode_image(bytes(g["bytes"].iloc[i]), g["fmt"].iloc[i])
                gray = (img[:, :, 0].astype(np.uint16) + img[:, :, 1] + img[:, :, 2]) // 3
                t = imaging.resize_nearest(gray.astype(np.uint8)[..., None], T, T)
                r, c = divmod(i, G)
                canvas[r * T : (r + 1) * T, c * T : (c + 1) * T] = t[:, :, 0]
            exp_rows.append(
                {
                    "tile_id": int(tid),
                    "n_images": len(g),
                    "used": used,
                    "mosaic_crc": np.int64(zlib.crc32(canvas.tobytes())),
                }
            )
        exp = pd.DataFrame(exp_rows).sort_values("tile_id", ignore_index=True)
        pd.testing.assert_frame_equal(
            got.astype({"n_images": "int64", "used": "int64", "mosaic_crc": "int64"}),
            exp.astype({"n_images": "int64", "used": "int64", "mosaic_crc": "int64"}),
        )
        assert (got["used"] <= G * G).all() and got["n_images"].sum() == len(df)


class TestFrameSampler:
    def _vid(self, n=6, h=8, w=10, seed=3):
        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, (n, h, w, 3)).astype(np.uint8)
        return frames, imaging.VideoFrameSampler.encode_rawvid(frames)

    def test_sampling(self, ray_session):
        import ray.data as rd

        frames, blob = self._vid()
        ds = rd.from_pandas(
            pd.DataFrame([{"video_id": "v0", "fmt": "rawvid", "bytes": blob}])
        )
        out = imaging.frame_sample_pipeline(ds, every=2, concurrency=1).to_pandas()
        assert list(out["frame_no"]) == [0, 2, 4]
        got = img_f.decode_image(bytes(out["frame_png"][1]), "png")
        assert np.array_equal(got, frames[2])

    def test_unknown_codec_is_stubbed(self):
        s = imaging.VideoFrameSampler(every=1)
        import pyarrow as pa

        batch = pa.table(
            {"video_id": ["v1"], "fmt": ["mp4"], "bytes": [b"\x00\x01"]}
        )
        if s.backend is None:  # this container ships no codec libs
            with pytest.raises(NotImplementedError, match="probed imageio"):
                s(batch)
        else:  # a real backend decodes through the same stage
            s(batch)

    def test_batch_png_encode_matches_per_frame(self):
        """png_encode_batch (the sampler's batched path) is byte-identical
        to the scalar png_encode per frame."""
        frames, _ = self._vid(n=5, h=7, w=9, seed=11)
        got = img_f.png_encode_batch(frames)
        want = [img_f.png_encode(f) for f in frames]
        assert got == want

    def test_mixed_shape_batch(self):
        """Two videos with DIFFERENT frame shapes in one batch: the
        shape-grouped batch encode must keep row order and bytes."""
        import pyarrow as pa

        f1, b1 = self._vid(n=4, h=8, w=10, seed=5)
        f2, b2 = self._vid(n=3, h=6, w=6, seed=7)
        s = imaging.VideoFrameSampler(every=2)
        out = s(
            pa.table(
                {
                    "video_id": ["a", "b"],
                    "fmt": ["rawvid", "rawvid"],
                    "bytes": [b1, b2],
                }
            )
        )
        assert out["video_id"].to_pylist() == ["a", "a", "b", "b"]
        assert out["frame_no"].to_pylist() == [0, 2, 0, 2]
        want = [f1[0], f1[2], f2[0], f2[2]]
        for buf, w in zip(out["frame_png"].to_pylist(), want):
            assert np.array_equal(img_f.decode_image(bytes(buf), "png"), w)
