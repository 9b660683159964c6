"""Audio multimodal stages: generator determinism, integer-exact feature
extraction vs a per-clip reference, the compressed-codec stub path, and
the resample layout — the audio leg of the image/audio/video triad."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cov_tiles_ray.pipelines import audio as au
from cov_tiles_ray.sources import synth


def test_generator_shard_independent_and_typed():
    a = synth.generate_audio_batch(0, 80)
    b = synth.generate_audio_batch(40, 40)
    assert a.slice(40, 40).equals(b)
    codecs = set(a["codec"].to_pylist())
    assert codecs <= {"pcm16", "pcmu8", "opus"} and "pcm16" in codecs
    # pcm16 blob length == n_samples * channels * 2 bytes
    df = a.to_pandas()
    for _, r in df[df.codec == "pcm16"].iterrows():
        assert len(r["data"]) == r["n_samples"] * r["channels"] * 2


def test_decode_and_features_match_reference():
    t = synth.generate_audio_batch(0, 60)
    df = t.to_pandas()
    for _, r in df.iterrows():
        if r["codec"] == "opus":
            with pytest.raises(NotImplementedError):
                au.decode_pcm(r["data"], r["codec"], int(r["channels"]))
            continue
        x = au.decode_pcm(r["data"], r["codec"], int(r["channels"]))
        # reference decode, written independently
        if r["codec"] == "pcm16":
            raw = np.frombuffer(r["data"], dtype="<i2").astype(np.int64)
        else:
            raw = (np.frombuffer(r["data"], dtype=np.uint8).astype(np.int64) - 128) * 256
        if r["channels"] == 2:
            raw = raw[0::2] + raw[1::2]
        assert np.array_equal(x.astype(np.int64), raw)
        f = au.clip_features(x)
        assert f["n_samples"] == r["n_samples"]
        assert f["peak"] == int(np.abs(raw).max())
        assert f["abs_sum"] == int(np.abs(raw).sum())
        assert f["energy"] == int((raw * raw).sum())
        sb = np.signbit(raw)
        assert f["zero_crossings"] == int(np.count_nonzero(sb[1:] != sb[:-1]))


def test_extractor_stub_path_marks_undecoded():
    t = synth.generate_audio_batch(0, 200)
    out = au.AudioFeatureExtractor()(t).to_pandas()
    assert len(out) == 200
    opus = out[out.codec == "opus"]
    assert len(opus) > 0 and not opus["decoded"].any()
    pcm = out[out.codec != "opus"]
    assert pcm["decoded"].all() and (pcm["n_samples"] > 0).all()


def test_resampler_halves_16k_and_passes_opus_through():
    t = synth.generate_audio_batch(0, 150)
    out = au.AudioResampler(8000)(t).to_pandas()
    src = t.to_pandas()
    for i in range(len(out)):
        r, s = out.iloc[i], src.iloc[i]
        if s["codec"] == "opus":
            assert not r["resampled"] and r["data"] == s["data"]
            continue
        assert r["resampled"] and r["out_rate"] == 8000
        stride = s["sample_rate"] // 8000
        expect = -(-s["n_samples"] // stride)  # ceil
        assert r["out_samples"] == expect
        assert len(r["data"]) == 2 * expect  # pcm16 mono out


def test_pipeline_aggregate_matches_direct(ray_session):
    from cov_tiles_ray.pipelines.rows_only import ROWS_ONLY_QUERIES

    got = ROWS_ONLY_QUERIES["audio_features"]("/root/testdata/sf0.001")
    # direct recompute over the same (cached) corpus
    import pyarrow.parquet as pq

    tbl = pq.read_table(synth.audio_parquet_path(0.001))
    ext = au.AudioFeatureExtractor()
    feats = ext(tbl).to_pandas()
    ref = (
        feats.groupby(["codec", "sample_rate"])
        .agg(
            clips=("audio_id", "size"),
            decoded=("decoded", "sum"),
            total_samples=("n_samples", "sum"),
            total_zero_crossings=("zero_crossings", "sum"),
            total_abs=("abs_sum", "sum"),
            total_energy=("energy", "sum"),
            clipped_samples=("clipped", "sum"),
            max_peak=("peak", "max"),
        )
        .reset_index()
        .sort_values(["codec", "sample_rate"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in got.columns if c not in ("codec",)}),
        ref.astype({c: "int64" for c in ref.columns if c not in ("codec",)}),
    )
