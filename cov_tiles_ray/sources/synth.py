"""Deterministic synthetic image+caption corpus (FIXTURES.md T1).

Schema matches BASELINE.json input_hint exactly:
(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
 caption:string, phash:int64) plus lon/lat:float64 for spatial assignment.

Everything is keyed by (seed, row index) so any shard can be regenerated
independently — the generator is itself a Ray-friendly source: row ranges
are generated inside ``map_batches`` over an index range, no driver-side
materialization.  A parquet cache under /tmp makes repeated test/bench
runs cheap.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions import image as img_f

SEED = 42
_VOCAB = (
    "aerial satellite photo view city coast mountain river forest desert harbor "
    "island bridge road field village rooftop snow cloud shadow sunset night "
    "market tower park lake glacier dune reef canyon plain delta"
).split()

# hot cluster centers (lon, lat, weight) — exercises tile/cell skew
_CLUSTERS = [
    (-74.0, 40.7, 0.25),  # NYC
    (2.35, 48.85, 0.2),  # Paris
    (139.7, 35.7, 0.15),  # Tokyo
    (-46.6, -23.5, 0.1),  # São Paulo
    (151.2, -33.9, 0.05),  # Sydney
]
_BG_WEIGHT = 1.0 - sum(w for _, _, w in _CLUSTERS)


def rows_for_sf(sf: float) -> int:
    return max(1, int(round(sf * 6_000_000 * 0.001)) * 1000)  # 6k @ 0.001, 600k @ 0.1


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    return float(base.replace("sf", "")) if base.startswith("sf") else 0.001


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based hash: deterministic per-index randomness (vectorized)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(idx: np.ndarray, salt: int) -> np.ndarray:
    """Uniform [0,1) keyed by (row index, salt) — shard-boundary independent."""
    h = _splitmix64(idx.astype(np.uint64) ^ np.uint64(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


_IMG_W = _IMG_H = 16


def _render_images(content_idx: np.ndarray) -> np.ndarray:
    """(n,) content keys -> (n, 16, 16, 3) uint8 deterministic rasters."""
    n = len(content_idx)
    slope = 0.2 + 0.8 * _u01(content_idx, 1)
    ch = np.stack([0.5 + 0.5 * _u01(content_idx, 2 + c) for c in range(3)], axis=1)  # (n,3)
    base = np.linspace(0, 255, _IMG_W, dtype=np.float64)
    grad = (base[None, None, :] + base[None, :, None] * slope[:, None, None]) / 2  # (n,16,16)
    im = grad[:, :, :, None] * ch[:, None, None, :]  # (n,16,16,3)
    # deterministic per-pixel noise from (content key, pixel#)
    pix = np.arange(_IMG_W * _IMG_H * 3, dtype=np.uint64)
    noise_h = _splitmix64(
        (content_idx.astype(np.uint64)[:, None] * np.uint64(0x100000001B3)) ^ pix[None, :]
    )
    noise = ((noise_h >> np.uint64(40)).astype(np.float64) / (1 << 24) - 0.5) * 40.0
    im = im + noise.reshape(n, _IMG_H, _IMG_W, 3)
    return np.clip(im, 0, 255).astype(np.uint8)


def _phash_batch(imgs: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit DCT phash of (n, h, w, 3) uint8 images."""
    g = imgs.astype(np.float64).mean(axis=3)  # (n,h,w)
    h, w = g.shape[1:]
    yi = (np.arange(32) * h) // 32
    xi = (np.arange(32) * w) // 32
    small = g[:, yi][:, :, xi]  # (n,32,32)
    D = img_f._dct_matrix(32)
    d = np.einsum("ij,njk,lk->nil", D, small, D, optimize=True)
    low = d[:, :8, :8].copy()
    low[:, 0, 0] = 0.0
    med = np.median(low.reshape(len(low), -1), axis=1, keepdims=True)
    bits = (low.reshape(len(low), -1) > med).astype(np.uint8)
    return np.packbits(bits, axis=1, bitorder="little").view(np.uint64)[:, 0]


def generate_images_batch(start: int, n: int, seed: int = SEED) -> pa.Table:
    """Generate rows [start, start+n) of the corpus as a pyarrow Table.

    Fully deterministic per GLOBAL row index (counter-based hashing, not
    sequential RNG state), so any shard range regenerates identically —
    the property that makes the source resumable and Ray-parallel.
    """
    idx = np.arange(start, start + n, dtype=np.int64)

    # positions: hot clusters + uniform background (tile-skew generator)
    u = _u01(idx, 10)
    weights = np.array([w for _, _, w in _CLUSTERS] + [_BG_WEIGHT])
    pick = np.searchsorted(np.cumsum(weights), u)
    bg = pick == len(_CLUSTERS)
    cl = np.array([(c[0], c[1]) for c in _CLUSTERS] + [(0.0, 0.0)])
    # triangular-ish jitter (sum of two uniforms) — deterministic per row
    jlon = (_u01(idx, 11) + _u01(idx, 12) - 1.0) * 2.0
    jlat = (_u01(idx, 13) + _u01(idx, 14) - 1.0) * 1.4
    lons = cl[pick, 0] + jlon
    lats = cl[pick, 1] + jlat
    lons[bg] = _u01(idx[bg], 15) * 359.8 - 179.9
    lats[bg] = _u01(idx[bg], 16) * 160.0 - 80.0
    np.clip(lons, -179.99, 179.99, out=lons)
    np.clip(lats, -84.9, 84.9, out=lats)

    fmt_pick = (_u01(idx, 20) * 10).astype(np.int64)  # 0-4 raw, 5-7 png, 8-9 qnt
    dup = _u01(idx, 21) < 0.01  # ~1% exact content duplicates
    content_idx = np.where(dup, idx // 100 * 100, idx)

    imgs = _render_images(content_idx)
    phashes = _phash_batch(imgs).astype(np.int64, casting="unsafe")

    fmts = np.where(fmt_pick < 5, "raw", np.where(fmt_pick < 8, "png", "qnt")).astype(object)
    out_bytes = [
        img_f.encode_image(imgs[i], fmts[i]) for i in range(n)
    ]
    out_ids = [f"img{g:012d}" for g in idx]

    cap_len = 4 + (_u01(idx, 30) * 8).astype(np.int64)
    vocab = np.array(_VOCAB, dtype=object)
    cap_words = [
        " ".join(vocab[(_splitmix64(np.uint64(g) * np.uint64(131) + np.arange(ln, dtype=np.uint64)) % len(vocab)).astype(np.int64)])
        for g, ln in zip(idx, cap_len)
    ]

    ws = np.full(n, _IMG_W, dtype=np.int32)
    hs = np.full(n, _IMG_H, dtype=np.int32)
    out_caption = cap_words
    out_fmt = fmts.tolist()

    return pa.table(
        {
            "image_id": pa.array(out_ids, pa.string()),
            "bytes": pa.array(out_bytes, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(out_fmt, pa.string()),
            "caption": pa.array(out_caption, pa.string()),
            "phash": pa.array(phashes, pa.int64()),
            "lon": pa.array(lons, pa.float64()),
            "lat": pa.array(lats, pa.float64()),
        }
    )


CACHE_DIR = "/tmp/cov_tiles_ray_cache"

_DOC_VOCAB_N = 30_000
_DOC_VOCAB: np.ndarray | None = None


def _ensure_cache_schema(out_dir: str, gen_fn) -> None:
    """Version a resumable shard cache by the GENERATOR's current schema
    (ADVICE r4: generate_documents_batch grew lang/source/n_chars in r4,
    but an old docscale cache would resume/serve the old columns — and a
    partially generated old cache resumed under new code yields mixed
    schemas in one parquet directory).  A ``_SCHEMA`` marker records the
    schema the shards were written with; on mismatch (or a pre-marker
    cache) every shard and the _SUCCESS sentinel are wiped so generation
    restarts clean.  A PRE-marker cache whose every shard footer already
    matches the generator is ADOPTED (marker written, nothing wiped) —
    footer reads are cheap and this avoids regenerating a multi-GB
    corpus for a missing marker.  Called BEFORE the _SUCCESS early-return
    in every *_parquet_path / *_scale_dir cache.  The 1-row probe
    generation is counter-based and costs ~ms."""
    sig_schema = gen_fn(0, 1).schema.remove_metadata()
    sig = str(sig_schema)
    marker = os.path.join(out_dir, "_SCHEMA")
    if os.path.isdir(out_dir):
        old = None
        if os.path.exists(marker):
            with open(marker) as f:
                old = f.read()
        if old != sig:
            parts = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
            adopt = False
            if old is None and parts:
                try:
                    adopt = all(
                        pq.read_schema(os.path.join(out_dir, p))
                        .remove_metadata()
                        .equals(sig_schema)
                        for p in parts
                    )
                except Exception:
                    adopt = False
            if not adopt:
                for f in os.listdir(out_dir):
                    if f.endswith(".parquet") or ".tmp" in f or f in ("_SUCCESS", "_SCHEMA"):
                        os.remove(os.path.join(out_dir, f))
    os.makedirs(out_dir, exist_ok=True)
    with open(marker, "w") as f:
        f.write(sig)


def _doc_vocab() -> np.ndarray:
    global _DOC_VOCAB
    if _DOC_VOCAB is None:
        _DOC_VOCAB = np.array([f"w{i}" for i in range(_DOC_VOCAB_N)], dtype=object)
    return _DOC_VOCAB


def generate_documents_batch(start: int, n: int) -> pa.Table:
    """Rows [start, start+n) of a SCALABLE documents corpus (doc_id, text)
    for dedup-family scale tests — the driver testdata's documents table is
    500 rows at every sf, so corpus-growth behavior (band-bucket
    saturation, cluster propagation rounds) needs a synthesized table.

    Counter-based like generate_images_batch (any shard range regenerates
    identically).  Shape: 50-300 tokens from a 30k-word zipf-ish vocab;
    ~10% of docs are near-duplicates (clusters of <=7 sharing a base doc,
    ~2% token mutations per copy) and the base construction also yields
    exact duplicates when the mutation mask lands empty."""
    idx = np.arange(start, start + n, dtype=np.int64)
    near = _u01(idx, 71) < 0.10
    base = np.where(near, idx - (idx % 7), idx)
    ln = 50 + (_u01(base, 70) * 250).astype(np.int64)
    vocab = _doc_vocab()
    texts: list[str] = []
    for g, b, L, nd in zip(idx, base, ln, near):
        L = int(L)
        tok_hash = _splitmix64(
            np.uint64(b) * np.uint64(1_000_003) + np.arange(L, dtype=np.uint64)
        )
        u = (tok_hash >> np.uint64(11)).astype(np.float64) / float(1 << 53)
        words = (u * u * _DOC_VOCAB_N).astype(np.int64)  # zipf-ish skew
        if nd and g != b:
            mut_hash = _splitmix64(
                np.uint64(g) * np.uint64(9_176_176_321) + np.arange(L, dtype=np.uint64)
            )
            mut = (mut_hash >> np.uint64(11)) < np.uint64(int(0.02 * (1 << 53)))
            repl = (_splitmix64(mut_hash + np.uint64(17)) % np.uint64(_DOC_VOCAB_N)).astype(
                np.int64
            )
            words = np.where(mut, repl, words)
        texts.append(" ".join(vocab[words]))
    # full driver-documents schema (lang/source/n_chars) so EVERY documents
    # query — not just the dedup family — runs unmodified on the scale
    # corpus (r4 session-4: dup_ngram_spans reads n_chars for its
    # size-estimate pass)
    langs = np.array(["en", "de", "fr", "es", "pt"], dtype=object)
    sources = np.array(["web", "books", "wiki", "code"], dtype=object)
    return pa.table(
        {
            "doc_id": pa.array(idx, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs[(_splitmix64(idx.astype(np.uint64) + np.uint64(5)) % np.uint64(5)).astype(np.int64)]),
            "source": pa.array(sources[(_splitmix64(idx.astype(np.uint64) + np.uint64(9)) % np.uint64(4)).astype(np.int64)]),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )


def audio_rows_for_sf(sf: float) -> int:
    """Audio corpus size at ``sf`` (clips are heavier than images: 1/8)."""
    return max(2000, rows_for_sf(sf) // 8)


def generate_audio_batch(start: int, n: int) -> pa.Table:
    """Rows [start, start+n) of the synthetic AUDIO corpus: opaque binary
    clips + typed metadata (codec, sample_rate, channels, n_samples) — the
    audio analogue of the image corpus for multimodal pipeline stages.

    Counter-based (shard-independent) like generate_images_batch.  Clips
    are two deterministic sine tones + hash noise, 0.1-0.5 s:
      * pcm16 (70%): little-endian int16, channel-interleaved
      * pcmu8 (20%): unsigned 8-bit (offset binary)
      * opus  (10%): a pseudo-blob standing in for a real compressed codec
        — NOT decodable here (codec libs absent in this container); these
        rows exercise the decode stub path, mirroring VideoFrameSampler
    ~1% of clips are exact content duplicates (audio dedup fodder).
    """
    idx = np.arange(start, start + n, dtype=np.int64)
    dup = _u01(idx, 80) < 0.01
    content = np.where(dup, idx // 50 * 50, idx)
    codec_pick = _u01(content, 81)
    codecs = np.where(
        codec_pick < 0.7, "pcm16", np.where(codec_pick < 0.9, "pcmu8", "opus")
    ).astype(object)
    rates = np.where(_u01(content, 82) < 0.5, 8000, 16000).astype(np.int64)
    chans = np.where(_u01(content, 83) < 0.8, 1, 2).astype(np.int64)
    n_samp = (800 + (_u01(content, 84) * 3200)).astype(np.int64)
    f1 = 100.0 + _u01(content, 85) * 900.0
    f2 = 500.0 + _u01(content, 86) * 3000.0
    amp = 0.2 + _u01(content, 87) * 0.7

    blobs: list[bytes] = []
    for g, cd, sr, ch, ns, a, b, am in zip(
        content, codecs, rates, chans, n_samp, f1, f2, amp
    ):
        ns = int(ns)
        if cd == "opus":
            # pseudo-blob: deterministic bytes, not a real opus stream
            h = _splitmix64(np.uint64(g) * np.uint64(977) + np.arange(ns // 4, dtype=np.uint64))
            blobs.append(h.astype("<u8").tobytes()[: ns // 2])
            continue
        t = np.arange(ns, dtype=np.float64) / float(sr)
        noise_u = (
            _splitmix64(np.uint64(g) * np.uint64(523) + np.arange(ns, dtype=np.uint64))
            >> np.uint64(11)
        ).astype(np.float64) / float(1 << 53)
        x = am * (np.sin(2 * np.pi * a * t) + 0.5 * np.sin(2 * np.pi * b * t)) / 1.5
        x = x + (noise_u - 0.5) * 0.05
        x = np.clip(x, -1.0, 1.0)
        if ch == 2:
            # second channel: attenuated + 1-sample delay (deterministic)
            y = np.roll(x, 1) * 0.8
            inter = np.empty(2 * ns, dtype=np.float64)
            inter[0::2] = x
            inter[1::2] = y
            x = inter
        if cd == "pcm16":
            blobs.append((np.rint(x * 32767.0).astype("<i2")).tobytes())
        else:  # pcmu8: offset-binary unsigned 8-bit
            blobs.append((np.rint(x * 127.0) + 128).astype(np.uint8).tobytes())
    return pa.table(
        {
            "audio_id": pa.array([f"aud{g:012d}" for g in idx], pa.string()),
            "codec": pa.array(codecs, pa.string()),
            "sample_rate": pa.array(rates, pa.int64()),
            "channels": pa.array(chans, pa.int64()),
            "n_samples": pa.array(n_samp, pa.int64()),
            "data": pa.array(blobs, pa.large_binary()),
        }
    )


def audio_parquet_path(sf: float, cache_dir: str = CACHE_DIR) -> str:
    """Generate (once) and return the audio-corpus parquet dir at ``sf``
    (same resumable shard layout as images_parquet_path)."""
    n = audio_rows_for_sf(sf)
    out_dir = os.path.join(cache_dir, f"audio_sf{sf:g}")
    _ensure_cache_schema(out_dir, generate_audio_batch)
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    shard = 5_000
    todo = [
        s
        for s in range(0, n, shard)
        if not os.path.exists(os.path.join(out_dir, f"part-{s:09d}.parquet"))
    ]

    def _write(s: int) -> None:
        tbl = generate_audio_batch(s, min(shard, n - s))
        path = os.path.join(out_dir, f"part-{s:09d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    try:
        import ray

        have_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        have_ray = False
    if have_ray and len(todo) > 1:
        import ray

        w = ray.remote(num_cpus=1)(_write)
        ray.get([w.remote(s) for s in todo])
    else:
        for s in todo:
            _write(s)
    with open(done, "w") as f:
        f.write(str(n))
    return out_dir


def video_rows_for_sf(sf: float) -> int:
    """Video corpus size at ``sf`` (clips are the heaviest modality: a
    rawvid blob is n_frames * h * w * 3 bytes, ~5-70 KB)."""
    return max(100, rows_for_sf(sf) // 32)


def generate_videos_batch(start: int, n: int) -> pa.Table:
    """Rows [start, start+n) of the synthetic VIDEO corpus: opaque binary
    clips + typed metadata (fmt, w, h, n_frames) — the video analogue of
    the image/audio corpora for multimodal pipeline stages.

    Counter-based (shard-independent) like generate_images_batch:
      * rawvid (90%): the deterministic multi-frame layout
        VideoFrameSampler always decodes (header w:u16 h:u16 n:u16 then
        n RGB frames row-major); pixels are a per-frame drifting
        gradient + hash noise so frames differ deterministically
      * h264 (10%): a pseudo-blob standing in for a real compressed
        container — NOT decodable here (codec libs absent in this
        container); these rows exercise the sampler's stub path
    ~1% of clips are exact content duplicates (video dedup fodder)."""
    idx = np.arange(start, start + n, dtype=np.int64)
    dup = _u01(idx, 90) < 0.01
    content = np.where(dup, idx // 50 * 50, idx)
    fmts = np.where(_u01(content, 91) < 0.9, "rawvid", "h264").astype(object)
    dims = np.array([16, 24, 32], np.int64)
    ws = dims[(_u01(content, 92) * 3).astype(np.int64)]
    hs = dims[(_u01(content, 93) * 3).astype(np.int64)]
    nfs = (6 + _u01(content, 94) * 18).astype(np.int64)

    blobs: list[bytes] = []
    for g, fmt, w, h, nf in zip(content, fmts, ws, hs, nfs):
        w, h, nf = int(w), int(h), int(nf)
        if fmt == "h264":
            hsh = _splitmix64(
                np.uint64(g) * np.uint64(1117) + np.arange(w * h, dtype=np.uint64)
            )
            blobs.append(hsh.astype("<u8").tobytes()[: w * h * 2])
            continue
        f = np.arange(nf, dtype=np.int64)[:, None, None, None]
        y = np.arange(h, dtype=np.int64)[None, :, None, None]
        x = np.arange(w, dtype=np.int64)[None, None, :, None]
        c = np.arange(3, dtype=np.int64)[None, None, None, :]
        base = (x * 5 + y * 3 + f * 11 + c * 40 + int(g) % 97) % 256
        noise = (
            _splitmix64(
                np.uint64(g) * np.uint64(769)
                + np.arange(nf * h * w * 3, dtype=np.uint64)
            )
            % np.uint64(16)
        ).reshape(nf, h, w, 3)
        frames = ((base + noise.astype(np.int64)) % 256).astype(np.uint8)
        head = np.array([w, h, nf], dtype="<u2").tobytes()
        blobs.append(head + frames.tobytes())
    return pa.table(
        {
            "video_id": pa.array([f"vid{g:012d}" for g in idx], pa.string()),
            "fmt": pa.array(fmts, pa.string()),
            "w": pa.array(ws, pa.int64()),
            "h": pa.array(hs, pa.int64()),
            "n_frames": pa.array(nfs, pa.int64()),
            "data": pa.array(blobs, pa.large_binary()),
        }
    )


def video_parquet_path(sf: float, cache_dir: str = CACHE_DIR) -> str:
    """Generate (once) and return the video-corpus parquet dir at ``sf``
    (same resumable shard layout as images_parquet_path)."""
    n = video_rows_for_sf(sf)
    out_dir = os.path.join(cache_dir, f"video_sf{sf:g}")
    _ensure_cache_schema(out_dir, generate_videos_batch)
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    shard = 1_000
    todo = [
        s
        for s in range(0, n, shard)
        if not os.path.exists(os.path.join(out_dir, f"part-{s:09d}.parquet"))
    ]

    def _write(s: int) -> None:
        tbl = generate_videos_batch(s, min(shard, n - s))
        path = os.path.join(out_dir, f"part-{s:09d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    try:
        import ray

        have_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        have_ray = False
    if have_ray and len(todo) > 1:
        import ray

        w = ray.remote(num_cpus=1)(_write)
        ray.get([w.remote(s) for s in todo])
    else:
        for s in todo:
            _write(s)
    with open(done, "w") as f:
        f.write(str(n))
    return out_dir


def documents_scale_dir(n_docs: int, cache_dir: str = CACHE_DIR) -> str:
    """Generate (once) a dedup-scale corpus of ``n_docs`` documents and
    return a directory usable as ``sf_dir`` (contains documents.parquet as
    a shard DIRECTORY — read_parquet reads it like a file).  Same
    resumable shard layout as images_parquet_path."""
    root = os.path.join(cache_dir, f"docscale_{n_docs}")
    out_dir = os.path.join(root, "documents.parquet")
    _ensure_cache_schema(out_dir, generate_documents_batch)
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return root
    os.makedirs(out_dir, exist_ok=True)
    shard = 10_000
    todo = [
        s
        for s in range(0, n_docs, shard)
        if not os.path.exists(os.path.join(out_dir, f"part-{s:09d}.parquet"))
    ]

    def _write(s: int) -> None:
        tbl = generate_documents_batch(s, min(shard, n_docs - s))
        path = os.path.join(out_dir, f"part-{s:09d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    try:
        import ray

        have_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        have_ray = False
    if have_ray and len(todo) > 1:
        import ray

        w = ray.remote(num_cpus=1)(_write)
        ray.get([w.remote(s) for s in todo])
    else:
        for s in todo:
            _write(s)
    with open(done, "w") as f:
        f.write(str(n_docs))
    return root


_EMB_DIM = 64


def generate_embeddings_batch(start: int, n: int) -> pa.Table:
    """Rows [start, start+n) of a SCALABLE embeddings corpus matching the
    driver table schema (vec_id:int64, embedding:list<float>, label:int32)
    for ANN/near-dup scale checks — the driver embeddings table is 2k rows
    at sf0.1, so corpus-growth behavior (LSH bucket occupancy, k-means
    combiner width) needs a synthesized table.

    Counter-based (any shard range regenerates identically).  Structure:
    ~10% of rows are near-duplicates of a cluster base (clusters <=5,
    base vector + 3% perturbation, renormalized — cosine ~0.999 so the
    LSH near-dup path has real positives without exact-copy bucket
    degeneracy); unit-normalized symmetric-uniform components."""
    idx = np.arange(start, start + n, dtype=np.int64)
    near = _u01(idx, 171) < 0.10
    base = np.where(near, idx - (idx % 5), idx)
    d = _EMB_DIM

    def _vecs(seed_ids: np.ndarray, salt: int) -> np.ndarray:
        h = _splitmix64(
            (seed_ids[:, None].astype(np.uint64) * np.uint64(d))
            + np.arange(d, dtype=np.uint64)[None, :]
            + np.uint64(salt)
        )
        return ((h >> np.uint64(11)).astype(np.float64) / float(1 << 53)) * 2.0 - 1.0

    v = _vecs(base, 0)
    pert = _vecs(idx, 7919)
    mix = np.where((near & (idx != base))[:, None], 0.03, 0.0)
    v = v * (1.0 - mix) + pert * mix
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    label = (_splitmix64(idx.astype(np.uint64) + np.uint64(23)) % np.uint64(10)).astype(
        np.int32
    )
    return pa.table(
        {
            "vec_id": pa.array(idx, pa.int64()),
            "embedding": pa.array(
                list(v.astype(np.float32)), pa.list_(pa.float32())
            ),
            "label": pa.array(label, pa.int32()),
        }
    )


def embeddings_scale_dir(n_vecs: int, cache_dir: str = CACHE_DIR) -> str:
    """Generate (once) an ANN-scale embeddings corpus of ``n_vecs`` rows
    and return a directory usable as ``sf_dir`` (contains
    embeddings.parquet as a shard DIRECTORY).  Same resumable shard
    layout as documents_scale_dir."""
    root = os.path.join(cache_dir, f"embscale_{n_vecs}")
    out_dir = os.path.join(root, "embeddings.parquet")
    _ensure_cache_schema(out_dir, generate_embeddings_batch)
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return root
    os.makedirs(out_dir, exist_ok=True)
    shard = 50_000
    todo = [
        s
        for s in range(0, n_vecs, shard)
        if not os.path.exists(os.path.join(out_dir, f"part-{s:09d}.parquet"))
    ]

    def _write(s: int) -> None:
        tbl = generate_embeddings_batch(s, min(shard, n_vecs - s))
        path = os.path.join(out_dir, f"part-{s:09d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    try:
        import ray

        have_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        have_ray = False
    if have_ray and len(todo) > 1:
        import ray

        w = ray.remote(num_cpus=1)(_write)
        ray.get([w.remote(s) for s in todo])
    else:
        for s in todo:
            _write(s)
    with open(done, "w") as f:
        f.write(str(n_vecs))
    return root


def images_dir(sf: float, cache_dir: str = CACHE_DIR) -> str:
    """Pure path of the corpus cache dir at ``sf`` (no generation)."""
    return os.path.join(cache_dir, f"images_sf{sf:g}")


def images_parquet_path(sf: float, cache_dir: str = CACHE_DIR) -> str:
    """Generate (once) and return the parquet path for the corpus at ``sf``.

    Written as a directory of shard files so reads parallelize; shards are
    generated independently (resumable layout — finished shards are skipped).
    """
    n = rows_for_sf(sf)
    out_dir = os.path.join(cache_dir, f"images_sf{sf:g}")
    _ensure_cache_schema(out_dir, generate_images_batch)
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    shard = 20_000
    todo = [
        s
        for s in range(0, n, shard)
        if not os.path.exists(os.path.join(out_dir, f"part-{s:09d}.parquet"))
    ]

    def _write(s: int) -> None:
        tbl = generate_images_batch(s, min(shard, n - s))
        path = os.path.join(out_dir, f"part-{s:09d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    # parallelize shard generation when a Ray session exists (the generator
    # is counter-based, so shards are independent); else serial.
    try:
        import ray

        have_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        have_ray = False
    if have_ray and len(todo) > 1:
        import ray

        w = ray.remote(num_cpus=1)(_write)
        ray.get([w.remote(s) for s in todo])
    else:
        for s in todo:
            _write(s)
    with open(done, "w") as f:
        f.write(str(n))
    return out_dir
