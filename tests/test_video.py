"""Video multimodal stage: generator determinism, rawvid layout round
trip through VideoFrameSampler, the compressed-container stub path, and
the frame-sample manifest query — the video leg of the image/audio/video
triad."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from cov_tiles_ray.pipelines import imaging
from cov_tiles_ray.sources import synth


def test_video_generator_shard_independent_and_typed():
    a = synth.generate_videos_batch(0, 80)
    b = synth.generate_videos_batch(40, 40)
    assert a.slice(40, 40).equals(b)
    fmts = set(a["fmt"].to_pylist())
    assert fmts <= {"rawvid", "h264"} and "rawvid" in fmts
    df = a.to_pandas()
    for _, r in df[df.fmt == "rawvid"].iterrows():
        # header matches the typed metadata; body is n*h*w*3 bytes
        w, h, n = np.frombuffer(r["data"][:6], dtype="<u2")
        assert (int(w), int(h), int(n)) == (r["w"], r["h"], r["n_frames"])
        assert len(r["data"]) == 6 + r["n_frames"] * r["h"] * r["w"] * 3


def test_video_sampler_rawvid_roundtrip_and_stub():
    t = synth.generate_videos_batch(0, 40).to_pandas()
    raw = t[t.fmt == "rawvid"].iloc[0]
    s = imaging.VideoFrameSampler(every=2)
    out = s(
        pa.table(
            {
                "video_id": pa.array([raw["video_id"]]),
                "fmt": pa.array(["rawvid"]),
                "bytes": pa.array([raw["data"]], pa.large_binary()),
            }
        )
    )
    want = np.arange(0, raw["n_frames"], 2)
    assert out["frame_no"].to_pylist() == want.tolist()
    # decode one sampled png back and compare to the generator's frame
    body = np.frombuffer(raw["data"][6:], dtype=np.uint8).reshape(
        raw["n_frames"], raw["h"], raw["w"], 3
    )
    from cov_tiles_ray.functions import image as img_f

    px = img_f.png_decode(out["frame_png"].to_pylist()[1])
    assert np.array_equal(px, body[2])

    stub = t[t.fmt == "h264"]
    if len(stub):
        r = stub.iloc[0]
        with pytest.raises(NotImplementedError):
            s(
                pa.table(
                    {
                        "video_id": pa.array([r["video_id"]]),
                        "fmt": pa.array(["h264"]),
                        "bytes": pa.array([r["data"]], pa.large_binary()),
                    }
                )
            )


def test_video_frame_sample_query(ray_session):
    from cov_tiles_ray.pipelines.rows_only import q_video_frame_sample

    df = q_video_frame_sample("/root/testdata/sf0.001")
    assert len(df) == synth.video_rows_for_sf(0.001)
    stub = df[df.n_sampled == -1]
    real = df[df.n_sampled > 0]
    assert len(stub) > 0 and len(real) > 0
    # every=2 of n frames samples ceil(n/2); check against the corpus
    meta = (
        imaging.read_videos(0.001, columns=["video_id", "fmt", "n_frames"])
        .to_pandas()
        .set_index("video_id")
    )
    merged = real.join(meta, on="video_id")
    assert (merged.fmt == "rawvid").all()
    assert (merged.n_sampled == (merged.n_frames + 1) // 2).all()
    assert (stub.join(meta, on="video_id").fmt == "h264").all()
