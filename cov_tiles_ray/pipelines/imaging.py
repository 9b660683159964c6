"""Multimodal (image/video) actor-pool stages over binary columns.

The corpus carries opaque ``bytes`` + typed metadata (``fmt, w, h``) per
BASELINE.json's input_hint; these stages give the large-scale
training-data side of the engine its image plumbing:

* ``ImageTransformer`` — decode → resize → feature-extract → thumbnail
  re-encode, as a ``map_batches`` ACTOR POOL (codec tables / DCT basis
  built once per actor in ``__init__``, work per batch in ``__call__``).
* ``VideoFrameSampler`` — frame sampling over a multi-frame binary layout;
  real video codecs are NOT in this container, so only the deterministic
  ``rawvid`` layout (concatenated raw RGB frames) decodes — anything else
  raises ``NotImplementedError`` (clearly-marked stub; the Ray-side
  plumbing — schema, batch size, actor signature, output layout — is real
  and tested).

Batches stay small (images are heavy); bytes never cross a shuffle —
every stage is embarrassingly parallel over the input blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions import image as img_f


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy index gather)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize, vectorized (gather 4 corners + lerp)."""
    h, w = img.shape[:2]
    fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    p = img.astype(np.float64)
    top = p[y0[:, None], x0[None, :]] * (1 - wx) + p[y0[:, None], x1[None, :]] * wx
    bot = p[y1[:, None], x0[None, :]] * (1 - wx) + p[y1[:, None], x1[None, :]] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def image_features(img: np.ndarray) -> dict:
    """Cheap dense features: per-channel mean/std, brightness, edge density."""
    f = img.astype(np.float64)
    gray = f.mean(axis=2)
    gx = np.abs(np.diff(gray, axis=1)).mean() if gray.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(gray, axis=0)).mean() if gray.shape[0] > 1 else 0.0
    return {
        "mean_r": float(f[..., 0].mean()),
        "mean_g": float(f[..., 1].mean()),
        "mean_b": float(f[..., 2].mean()),
        "std_gray": float(gray.std()),
        "brightness": float(gray.mean()),
        "edge_density": float(gx + gy),
    }


class ImageTransformer:
    """Actor-pool stage: bytes in -> thumbnail bytes + feature columns out.

    Per-actor state (``__init__``, once): the phash DCT basis and codec
    dispatch.  Use as
    ``ds.map_batches(ImageTransformer, fn_constructor_kwargs={...},
    concurrency=N, batch_size=256, batch_format="pyarrow")``.
    """

    def __init__(self, thumb: int = 32, method: str = "bilinear", thumb_fmt: str = "png"):
        self.thumb = int(thumb)
        self.resize = resize_bilinear if method == "bilinear" else resize_nearest
        self.thumb_fmt = thumb_fmt
        img_f._dct_matrix(32)  # build + cache the DCT basis once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        datas = batch["bytes"].to_pylist()
        n = len(datas)
        thumbs: list[bytes] = []
        ph = np.empty(n, dtype=np.int64)
        feats = {k: np.empty(n, dtype=np.float64) for k in
                 ("mean_r", "mean_g", "mean_b", "std_gray", "brightness", "edge_density")}
        for i in range(n):
            img = img_f.decode_image(datas[i], fmts[i])
            t = self.resize(img, self.thumb, self.thumb)
            thumbs.append(img_f.encode_image(t, self.thumb_fmt))
            ph[i] = np.int64(np.uint64(img_f.phash64(t)))
            for k, v in image_features(img).items():
                feats[k][i] = v
        out = batch.select(["image_id", "fmt"])
        out = out.append_column("thumb", pa.array(thumbs, pa.binary()))
        out = out.append_column("thumb_phash", pa.array(ph))
        for k, v in feats.items():
            out = out.append_column(k, pa.array(v))
        return out


def thumbnail_pipeline(
    images: rd.Dataset, thumb: int = 32, concurrency=(1, 4), batch_size: int = 256
) -> rd.Dataset:
    """images (image_id, bytes, fmt) -> thumbnails + features via actor pool.

    ``concurrency`` defaults to an AUTOSCALING range: a fixed pool sized at
    the CPU count reserves every slot and starves the upstream read tasks
    (observed deadlock on a 4-CPU cluster with concurrency=4)."""
    return images.map_batches(
        ImageTransformer,
        fn_constructor_kwargs={"thumb": thumb},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _video_backend():
    """Detect a real video-codec backend; (name, fn) with
    ``fn(data: bytes) -> (n, h, w, 3) uint8`` or None.  None of these libs
    ship in this container, so the probe degrades to None here and the
    rawvid stub carries the plumbing — but an environment WITH imageio/
    PyAV or OpenCV decodes real containers through the same stage."""
    try:
        import imageio.v3 as iio  # type: ignore

        return ("imageio", lambda data: np.stack(list(iio.imiter(data, plugin="pyav"))))
    except Exception:
        pass
    try:
        import cv2  # type: ignore

        def _cv(data: bytes) -> np.ndarray:
            import os
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
                f.write(data)
                path = f.name
            try:
                cap = cv2.VideoCapture(path)
                frames = []
                while True:
                    ok, frame = cap.read()
                    if not ok:
                        break
                    frames.append(frame[..., ::-1])  # BGR -> RGB
                cap.release()
                return np.stack(frames)
            finally:
                os.unlink(path)

        return ("opencv", _cv)
    except Exception:
        pass
    return None


class VideoFrameSampler:
    """Actor-pool stage: sample every k-th frame of a multi-frame binary.

    The deterministic ``rawvid`` layout (header ``w:uint16 h:uint16
    n:uint16`` then n RGB frames row-major) always decodes; real containers
    (mp4 etc.) decode iff a codec backend was detected at actor init
    (imageio/PyAV or OpenCV — absent in this container), else raise
    NotImplementedError naming the probed libs (stub per the multimodal
    plumbing contract).  Output: one row per sampled frame, png-encoded.
    Frame slicing is one strided view per video and the png scanline
    assembly is batched across every sampled frame of the batch
    (img_f.png_encode_batch), grouped by frame shape.
    """

    def __init__(self, every: int = 2):
        self.every = max(1, int(every))
        self.backend = _video_backend()  # probe once per actor

    @staticmethod
    def encode_rawvid(frames: np.ndarray) -> bytes:
        f = np.ascontiguousarray(frames, dtype=np.uint8)
        n, h, w, _ = f.shape
        head = np.array([w, h, n], dtype="<u2").tobytes()
        return head + f.tobytes()

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["bytes"].to_pylist()
        names = batch["video_id"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        ids: list[str] = []
        fno_parts: list[np.ndarray] = []
        sampled: list[np.ndarray] = []  # one (h, w, 3) frame per output row
        for name, fmt, data in zip(names, fmts, vids):
            if fmt == "rawvid":
                w, h, n = np.frombuffer(data[:6], dtype="<u2")
                body = np.frombuffer(data[6:], dtype=np.uint8).reshape(
                    int(n), int(h), int(w), 3
                )
            elif self.backend is not None:
                body = np.ascontiguousarray(self.backend[1](data), dtype=np.uint8)
            else:
                raise NotImplementedError(
                    f"video codec {fmt!r} not available: no backend importable "
                    "(probed imageio/PyAV, OpenCV); only the deterministic "
                    "'rawvid' layout decodes"
                )
            sel = body[:: self.every]  # strided view, no per-frame loop
            ids.extend([name] * len(sel))
            fno_parts.append(np.arange(0, len(body), self.every, dtype=np.int32))
            sampled.extend(sel)
        # batch the png encode per frame shape: one vectorized scanline
        # assembly per (h, w) group instead of one per frame
        frames: list[bytes | None] = [None] * len(sampled)
        by_shape: dict[tuple[int, int], list[int]] = {}
        for i, fr in enumerate(sampled):
            by_shape.setdefault(fr.shape[:2], []).append(i)
        for idxs in by_shape.values():
            bufs = img_f.png_encode_batch(np.stack([sampled[i] for i in idxs]))
            for i, buf in zip(idxs, bufs):
                frames[i] = buf
        return pa.table(
            {
                "video_id": pa.array(ids, pa.string()),
                "frame_no": pa.array(
                    np.concatenate(fno_parts) if fno_parts else np.empty(0, np.int32)
                ),
                "frame_png": pa.array(frames, pa.binary()),
            }
        )


def read_videos(sf_dir_or_sf, columns=None) -> rd.Dataset:
    """Video-corpus Dataset at the sf of ``sf_dir`` (synthesized + cached
    once, like tiling.read_images / audio.read_audio)."""
    from ..sources import synth

    sf = (
        synth.sf_from_dir(sf_dir_or_sf)
        if isinstance(sf_dir_or_sf, str)
        else float(sf_dir_or_sf)
    )
    return rd.read_parquet(synth.video_parquet_path(sf), columns=columns)


def frame_sample_pipeline(
    videos: rd.Dataset, every: int = 2, concurrency=(1, 2), batch_size: int = 8
) -> rd.Dataset:
    """videos (video_id, fmt, bytes) -> sampled frames (small batches: video
    payloads are heavy; one batch x concurrency must fit a worker heap)."""
    return videos.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every": every},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# thresholds sit at the synthetic corpus's observed quartiles so every
# verdict class is populated (brightness q25 ~68, std_gray q25 ~32)
QUALITY_DARK_BRIGHTNESS = 68.0
QUALITY_FLAT_STD = 32.0


class ImageQualityScorer:
    """Actor-pool stage: bytes in -> per-image quality verdict out.

    The image-side analogue of the text quality_scores operator: decode
    (per-actor codec state), score brightness/contrast/edge features, and
    emit a keep/drop verdict with the reason — the filter stage a 100-TB
    image corpus runs before anything expensive.  Verdict precedence is
    deterministic: dark beats flat beats ok.
    """

    def __init__(self):
        img_f._dct_matrix(32)  # codec warm-up, once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        fmts = batch["fmt"].to_pylist()
        datas = batch["bytes"].to_pylist()
        n = len(datas)
        bright = np.empty(n, np.float64)
        std = np.empty(n, np.float64)
        edge = np.empty(n, np.float64)
        for i in range(n):
            img = img_f.decode_image(datas[i], fmts[i])
            f = image_features(img)
            bright[i] = f["brightness"]
            std[i] = f["std_gray"]
            edge[i] = f["edge_density"]
        verdict = np.where(
            bright < QUALITY_DARK_BRIGHTNESS,
            "dark",
            np.where(std < QUALITY_FLAT_STD, "flat", "ok"),
        ).astype(object)
        out = batch.select(["image_id", "fmt"])
        out = out.append_column("verdict", pa.array(verdict, pa.string()))
        out = out.append_column(
            "brightness_milli", pa.array(np.floor(bright * 1000.0).astype(np.int64))
        )
        out = out.append_column(
            "std_milli", pa.array(np.floor(std * 1000.0).astype(np.int64))
        )
        out = out.append_column(
            "edge_milli", pa.array(np.floor(edge * 1000.0).astype(np.int64))
        )
        return out


def quality_pipeline(
    images: rd.Dataset, concurrency=(1, 4), batch_size: int = 256
) -> rd.Dataset:
    """images (image_id, bytes, fmt) -> quality verdicts via actor pool
    (autoscaling range, same starvation rationale as thumbnail_pipeline)."""
    return images.map_batches(
        ImageQualityScorer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
