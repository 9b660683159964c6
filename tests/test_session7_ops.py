"""Property/invariant tests for the session-7 operators.

The SQL-oracle ops (decontaminate, inverted_index, zipf_fit, chi2_terms,
tile_compaction) are value-checked against DuckDB by the parametrized
test_queries_oracle suite; this module adds the semantic invariants the
oracle can't express and the rows-only bpe_merges reference equality.
"""

import collections

import numpy as np
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_tile_compaction_expands_back_to_occupied_set(ray_session):
    """The compacted cover, expanded back down to the base zoom, must
    reproduce EXACTLY the occupied z6 tile set — no tile lost, none
    invented, no overlap between cover members (each base tile has one
    unique covering ancestor)."""
    from cov_tiles_ray.functions import spatial as S
    from cov_tiles_ray.pipelines.queries import (
        _COMPACT_BASE_Z,
        _event_lonlat,
        q_tile_compaction,
    )

    cover = q_tile_compaction(SF_DIR).to_pandas()
    assert (cover["z"] <= _COMPACT_BASE_Z).all()

    # independent occupied set straight from the parquet
    eid = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id"])[
        "event_id"
    ].to_numpy()
    lon, lat = _event_lonlat(eid)
    tx, ty = S.lonlat_to_tile(lon, lat, _COMPACT_BASE_Z)
    occupied = set(zip(tx.tolist(), ty.tolist()))

    expanded: list[tuple[int, int]] = []
    for z, x, y in cover.itertuples(index=False):
        d = _COMPACT_BASE_Z - int(z)
        for dx in range(1 << d):
            for dy in range(1 << d):
                expanded.append(((int(x) << d) + dx, (int(y) << d) + dy))
    assert len(expanded) == len(set(expanded)), "cover members overlap"
    assert set(expanded) == occupied


def test_bpe_merges_matches_single_process_reference(ray_session):
    """bpe_merges (distributed word-count + driver merge loop) must equal
    an independent single-process recompute from the raw parquet text."""
    from cov_tiles_ray.pipelines.rows_only import _BPE_N_MERGES, q_bpe_merges

    got = q_bpe_merges(SF_DIR).to_pandas()

    texts = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    words = collections.Counter(
        w for t in texts for w in str(t).lower().split(" ") if w
    )
    # independent merge loop (deliberately different data structures than
    # rows_only._bpe_train: list-of-(seq, count) instead of dicts)
    seqs = [(list(w) + ["</w>"], c) for w, c in sorted(words.items())]
    expect = []
    for i in range(_BPE_N_MERGES):
        pc = collections.Counter()
        for s, c in seqs:
            for j in range(len(s) - 1):
                pc[(s[j], s[j + 1])] += c
        if not pc:
            break
        best_cnt = max(pc.values())
        a, b = min(p for p, c in pc.items() if c == best_cnt)
        expect.append((i, a, b, best_cnt))
        for k, (s, c) in enumerate(seqs):
            out, j = [], 0
            while j < len(s):
                if j < len(s) - 1 and s[j] == a and s[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[k] = (out, c)

    assert len(got) == len(expect)
    for row, (i, a, b, c) in zip(got.itertuples(index=False), expect):
        assert (row.merge_idx, row.left, row.right, row.pair_count) == (i, a, b, c)


def test_decontaminate_benchmark_docs_never_flagged(ray_session):
    """No benchmark doc (doc_id % MOD == 0) may appear in the output, and
    every reported hit count is positive."""
    from cov_tiles_ray.pipelines.queries import _DECON_MOD, q_decontaminate

    out = q_decontaminate(SF_DIR).to_pandas()
    assert len(out) > 0, "decontaminate degenerate: no hits at sf0.001"
    assert (out["doc_id"] % _DECON_MOD != 0).all()
    assert (out["n_hits"] > 0).all()


def test_inverted_index_postings_sorted_and_capped(ray_session):
    from cov_tiles_ray.pipelines.queries import (
        _INVIX_CAP,
        _INVIX_TOPN,
        q_inverted_index,
    )

    out = q_inverted_index(SF_DIR).to_pandas()
    assert 0 < len(out) <= _INVIX_TOPN
    # df desc, tok asc ordering
    df = out["df"].to_numpy()
    assert (df[:-1] >= df[1:]).all()
    for _, row in out.iterrows():
        ids = [int(x) for x in row["posting"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(int(row["df"]), _INVIX_CAP)


def test_zipf_fit_slope_is_negative(ray_session):
    """A rank-frequency curve always has non-increasing counts, so the
    fitted slope must be negative."""
    from cov_tiles_ray.pipelines.queries import q_zipf_fit

    out = q_zipf_fit(SF_DIR).to_pandas()
    assert len(out) == 1
    assert int(out["slope_x1e6"].iloc[0]) < 0
    assert int(out["n_terms"].iloc[0]) >= 2


def test_chi2_terms_rows_and_nonnegative(ray_session):
    from cov_tiles_ray.pipelines.queries import q_chi2_terms

    out = q_chi2_terms(SF_DIR).to_pandas()
    langs = out["lang"].nunique()
    toks = out["tok"].nunique()
    assert len(out) == langs * toks
    assert (out["chi2_x1e3"] >= 0).all()
    assert (out["n11"] >= 0).all()


def test_trajectory_simplify_matches_recursive_reference(ray_session):
    """trajectory_simplify (part-exchange + iterative DP) must equal an
    independent per-user recursive Douglas-Peucker recompute from the raw
    parquet."""
    import math

    from cov_tiles_ray.functions import spatial as S
    from cov_tiles_ray.pipelines.queries import _event_lonlat
    from cov_tiles_ray.pipelines.rows_only import _TRAJ_EPS, q_trajectory_simplify

    got = (
        q_trajectory_simplify(SF_DIR)
        .to_pandas()
        .sort_values("user_id", ignore_index=True)
    )

    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_id", "ts", "user_id"]
    ).to_pandas()
    lon, lat = _event_lonlat(ev["event_id"].to_numpy())
    mx, my = S.mercator_xy(lon, lat)
    ev["mx"], ev["my"] = mx, my
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")

    def dp_rec(x, y, keep, i, j):
        if j <= i + 1:
            return
        dx, dy = x[j] - x[i], y[j] - y[i]
        norm = math.hypot(dx, dy)
        best_d, best_k = -1.0, -1
        for k in range(i + 1, j):
            if norm == 0.0:
                d = math.hypot(x[k] - x[i], y[k] - y[i])
            else:
                d = abs(dx * (y[k] - y[i]) - dy * (x[k] - x[i])) / norm
            if d > best_d:
                best_d, best_k = d, k
        if best_d > _TRAJ_EPS:
            keep[best_k] = True
            dp_rec(x, y, keep, i, best_k)
            dp_rec(x, y, keep, best_k, j)

    rows = {}
    for uid, g in ev.sort_values(["user_id", "us", "event_id"]).groupby("user_id"):
        x = g["mx"].to_list()
        y = g["my"].to_list()
        keep = [False] * len(x)
        keep[0] = keep[-1] = True
        dp_rec(x, y, keep, 0, len(x) - 1)
        ids = g["event_id"].to_numpy()
        rows[int(uid)] = (
            len(x),
            sum(keep),
            int(ids[np.asarray(keep)].sum()),
        )

    assert len(got) == len(rows)
    for r in got.itertuples(index=False):
        n_raw, n_kept, ksum = rows[int(r.user_id)]
        assert (r.n_raw, r.n_kept, r.kept_id_sum) == (n_raw, n_kept, ksum), r.user_id
    # the op must actually simplify something at this epsilon
    assert (got["n_kept"] < got["n_raw"]).any()
    assert (got["n_kept"] >= 2).all() or (got["n_raw"] == 1).any()


def test_tiles_delta_matches_independent_recompute(ray_session):
    """tiles_delta (one-pass dual-snapshot combiner) must equal a direct
    recompute of both snapshots' per-tile memberships from the corpus
    parquet."""
    import collections

    import duckdb

    from cov_tiles_ray.functions import spatial as S
    from cov_tiles_ray.pipelines.rows_only import _DELTA_MOD, _DELTA_Z, q_tiles_delta
    from cov_tiles_ray.sources import synth

    got = (
        q_tiles_delta(SF_DIR)
        .to_pandas()
        .sort_values("tile_id", ignore_index=True)
    )

    path = synth.images_parquet_path(0.001)
    con = duckdb.connect()
    df = con.execute(
        f"SELECT image_id, lon, lat FROM read_parquet('{path}/*.parquet')"
    ).fetchdf()
    con.close()
    tx, ty = S.lonlat_to_tile(df["lon"].to_numpy(), df["lat"].to_numpy(), _DELTA_Z)
    tid = S.pack_tile_id(_DELTA_Z, tx, ty)
    a = collections.Counter(tid.tolist())
    num = df["image_id"].str[3:].astype("int64")
    keep = (num % _DELTA_MOD != 0).to_numpy()
    b = collections.Counter(tid[keep].tolist())
    changed = sorted(t for t in a if a[t] != b.get(t, 0))
    assert len(changed) > 0, "delta degenerate at sf0.001"
    assert got["tile_id"].tolist() == changed
    for r in got.itertuples(index=False):
        assert r.n_a == a[r.tile_id]
        assert r.n_b == b.get(r.tile_id, 0)
        assert r.n_removed == r.n_a - r.n_b


def test_douglas_peucker_properties(ray_session):
    """DP invariants on random polylines: endpoints always kept; eps=inf
    keeps exactly the endpoints; and the kept set is MONOTONE in eps
    (the split point is argmax of a geometry-only distance, so a larger
    eps's recursion tree is a subtree of a smaller eps's)."""
    from cov_tiles_ray.functions.spatial import douglas_peucker_mask

    rng = np.random.default_rng(7)
    for n in (2, 3, 5, 17, 64, 257):
        x = rng.uniform(0, 1, n)
        y = rng.uniform(0, 1, n)
        prev_kept = None
        for eps in (1e9, 0.5, 0.1, 0.02, 0.0):
            keep = douglas_peucker_mask(x, y, eps)
            assert keep[0] and keep[-1]
            if eps == 1e9 and n >= 2:
                assert keep.sum() == (1 if n == 1 else 2)
            if prev_kept is not None:
                # smaller eps keeps a superset
                assert (keep | prev_kept == keep).all(), (n, eps)
            prev_kept = keep
        # eps=0 keeps every point not exactly collinear with neighbors;
        # on continuous random data that is all points
        assert douglas_peucker_mask(x, y, 0.0).sum() == n


def test_bottom_k_merge_associativity(ray_session):
    """The tile_downsample combiner's premise: bottom-K of a union equals
    bottom-K of merged per-part bottom-K's (splitmix keys are unique, so
    no tie ambiguity)."""
    from cov_tiles_ray.sources import synth

    K = 20
    rng = np.random.default_rng(11)
    ids = rng.choice(10_000_000, size=5000, replace=False).astype(np.uint64)
    h = synth._splitmix64(ids)
    want = np.sort(h)[:K]
    parts = np.array_split(h, 7)
    partial = np.concatenate([np.sort(p)[:K] for p in parts])
    got = np.sort(partial)[:K]
    assert (got == want).all()


def test_doc_compress_ratio_matches_direct_recompute(ray_session):
    import zlib

    from cov_tiles_ray.pipelines.rows_only import q_doc_compress_ratio

    got = (
        q_doc_compress_ratio(SF_DIR).to_pandas().sort_values("doc_id", ignore_index=True)
    )
    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    t = t.sort_values("doc_id", ignore_index=True)
    assert len(got) == len(t)
    for r, (did, txt) in zip(got.itertuples(index=False), zip(t["doc_id"], t["text"])):
        raw = str(txt).encode()
        comp = len(zlib.compress(raw, 6))
        assert r.doc_id == did
        assert r.n_bytes == len(raw)
        assert r.comp_bytes == comp
        assert r.ratio_x100 == comp * 100 // max(len(raw), 1)
    # quality signal sanity: synthetic word soup compresses well in the
    # typical case (tiny docs can exceed 100 from fixed zlib overhead)
    assert int(got["ratio_x100"].median()) < 100
