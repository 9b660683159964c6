"""Multimodal AUDIO actor-pool stages over binary columns.

The audio corpus (sources/synth.py ``audio_parquet_path``) carries opaque
``data`` bytes + typed metadata (codec, sample_rate, channels, n_samples)
— the audio analogue of the image corpus, completing the brief's
image/audio/video multimodal triad:

* ``AudioFeatureExtractor`` — PCM decode → integer-exact clip features
  (peak, |x| sum, energy, zero crossings, clipped count), as a
  ``map_batches`` ACTOR POOL (decode tables + backend probe once per actor
  in ``__init__``, work per batch in ``__call__``).
* ``AudioResampler`` — integer-stride decimation to a target rate +
  pcm16 re-encode (the deterministic resample; a real polyphase resampler
  needs scipy/soxr, absent here).
* Compressed codecs (opus/mp3/...) are NOT decodable in this container:
  ``_audio_backend`` probes for real decoders (soundfile/librosa/av) and
  the extractor marks those rows ``decoded=False`` — the same
  honestly-stubbed shape as VideoFrameSampler (imaging.py).

All metrics are INTEGER-exact (sums of int32/int64 sample math), so the
per-(codec, rate) aggregates are order- and partitioning-invariant —
recompute-tested against a per-clip reference in tests/test_audio.py.
Bytes never cross a shuffle; every stage is embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

_PCM_CODECS = ("pcm16", "pcmu8")


def _audio_backend():
    """Probe for a real compressed-audio decoder.  None in this container
    (no soundfile/librosa/av); when one exists the extractor routes
    non-PCM codecs through it instead of the stub path."""
    for mod in ("soundfile", "librosa", "av"):
        try:
            return __import__(mod)
        except ImportError:
            continue
    return None


def decode_pcm(data: bytes, codec: str, channels: int) -> np.ndarray:
    """PCM bytes -> int32 mono samples (stereo downmixed by exact SUM, so
    every downstream metric stays integer-exact).  pcmu8 is offset-binary:
    centred by subtracting 128 then scaled x256 onto the int16 grid."""
    if codec == "pcm16":
        # truncate a trailing partial sample (corrupt/short blob tolerance)
        x = np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2").astype(np.int32)
    elif codec == "pcmu8":
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128) * 256
    else:
        raise NotImplementedError(
            f"codec {codec!r} needs a real audio decoder (soundfile/librosa/av),"
            " none is installed in this container"
        )
    if channels == 2:
        x = x[: len(x) // 2 * 2]  # drop a trailing unpaired frame
        x = x[0::2] + x[1::2]  # exact integer downmix (sum, not mean)
    return x


def clip_features(x: np.ndarray) -> dict:
    """Integer-exact per-clip features over int32 mono samples."""
    ax = np.abs(x.astype(np.int64))
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return {
        "n_samples": int(len(x)),
        "peak": int(ax.max()) if len(x) else 0,
        "abs_sum": int(ax.sum()),
        "energy": int((ax * ax).sum()),
        "zero_crossings": zc,
        "clipped": int(np.count_nonzero(ax >= 32767)),
    }


class AudioFeatureExtractor:
    """Actor-pool stage: binary clip -> integer-exact feature row.

    State (backend probe) is built once per actor; per-batch work is the
    decode + feature loop (decode is intrinsically per-clip — variable
    length binary — but each clip's math is vectorized numpy)."""

    def __init__(self) -> None:
        self.backend = _audio_backend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        codec = batch["codec"].to_pylist()
        chans = batch["channels"].to_numpy(zero_copy_only=False)
        data = batch["data"].to_pylist()
        cols = {
            "decoded": np.zeros(n, dtype=bool),
            "n_samples": np.zeros(n, dtype=np.int64),
            "peak": np.zeros(n, dtype=np.int64),
            "abs_sum": np.zeros(n, dtype=np.int64),
            "energy": np.zeros(n, dtype=np.int64),
            "zero_crossings": np.zeros(n, dtype=np.int64),
            "clipped": np.zeros(n, dtype=np.int64),
        }
        for i in range(n):
            if codec[i] not in _PCM_CODECS and self.backend is None:
                continue  # stub path: compressed codec, no decoder present
            try:
                x = decode_pcm(data[i], codec[i], int(chans[i]))
            except NotImplementedError:
                continue
            f = clip_features(x)
            cols["decoded"][i] = True
            for k, v in f.items():
                cols[k][i] = v
        out = {
            "audio_id": batch["audio_id"],
            "codec": batch["codec"],
            "sample_rate": batch["sample_rate"],
        }
        out.update({k: pa.array(v) for k, v in cols.items()})
        return pa.table(out)


class AudioResampler:
    """Actor-pool stage: decimate PCM clips to ``target_rate`` by integer
    stride (sample_rate must be a multiple) and re-encode pcm16 mono.
    Non-PCM rows pass through untouched (decoded=False analogue)."""

    def __init__(self, target_rate: int = 8000) -> None:
        self.target = int(target_rate)

    def __call__(self, batch: pa.Table) -> pa.Table:
        codec = batch["codec"].to_pylist()
        rates = batch["sample_rate"].to_numpy(zero_copy_only=False)
        chans = batch["channels"].to_numpy(zero_copy_only=False)
        data = batch["data"].to_pylist()
        out_bytes: list[bytes] = []
        out_n: list[int] = []
        ok = np.zeros(batch.num_rows, dtype=bool)
        for i in range(batch.num_rows):
            if codec[i] not in _PCM_CODECS or rates[i] % self.target:
                out_bytes.append(data[i])
                out_n.append(0)
                continue
            x = decode_pcm(data[i], codec[i], int(chans[i]))
            stride = int(rates[i]) // self.target
            y = np.clip(x[::stride], -32768, 32767).astype("<i2")
            out_bytes.append(y.tobytes())
            out_n.append(len(y))
            ok[i] = True
        return pa.table(
            {
                "audio_id": batch["audio_id"],
                "codec": batch["codec"],
                "resampled": pa.array(ok),
                "out_rate": pa.array(
                    np.where(ok, self.target, rates).astype(np.int64)
                ),
                "out_samples": pa.array(np.asarray(out_n, dtype=np.int64)),
                "data": pa.array(out_bytes, pa.large_binary()),
            }
        )


def read_audio(sf_dir_or_sf, columns: list[str] | None = None) -> rd.Dataset:
    """Audio-corpus Dataset at the sf of ``sf_dir`` (synthesized + cached
    once, like tiling.read_images)."""
    from ..sources import synth

    sf = (
        synth.sf_from_dir(sf_dir_or_sf)
        if isinstance(sf_dir_or_sf, str)
        else float(sf_dir_or_sf)
    )
    return rd.read_parquet(synth.audio_parquet_path(sf), columns=columns)


def features_pipeline(ds: rd.Dataset, concurrency=(1, 4)) -> rd.Dataset:
    """Clip bytes -> per-clip integer-exact feature rows (actor pool;
    small batches — clips are heavy)."""
    return ds.map_batches(
        AudioFeatureExtractor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
        num_cpus=1,
    )


def resample_pipeline(
    ds: rd.Dataset, target_rate: int = 8000, concurrency=(1, 4)
) -> rd.Dataset:
    return ds.map_batches(
        AudioResampler,
        fn_constructor_args=(target_rate,),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
        num_cpus=1,
    )
