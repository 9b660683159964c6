"""Regression: the distributed (no-driver-materialization) rewrites of the
dedup pipelines must produce EXACTLY the same pair sets as the brute-force
formulations they replaced (VERDICT round-1 'What's wrong' #1-#3).

Also grep-level guarantees: neither query materializes a full input table
on the driver (no ``to_pandas()`` before the final small result) — see
test_no_driver_materialization.
"""

from __future__ import annotations

import inspect
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def _bucket_pairs(docs):
    from cov_tiles_ray.functions import dedup as dedup_f

    sig = dedup_f.minhash_signatures(docs.text, num_perm=64)
    keys = dedup_f.lsh_band_keys(sig, num_bands=16)
    buckets = defaultdict(set)
    for i, d in enumerate(docs.doc_id.to_numpy()):
        for b in range(16):
            buckets[(b, keys[i, b])].add(d)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return sorted(pairs), sig


def test_neardup_verified_matches_bruteforce(ray_session, docs):
    from cov_tiles_ray.functions import dedup as dedup_f
    from cov_tiles_ray.pipelines.rows_only import q_neardup_verified

    got = q_neardup_verified(SF).to_pandas().reset_index(drop=True).astype(np.int64)
    pairs, _ = _bucket_pairs(docs)
    texts = docs.set_index("doc_id")["text"]
    rows = []
    for a, b in pairs:
        jx = dedup_f.ngram_jaccard(texts[a], texts[b])
        if jx >= 0.5:
            rows.append((a, b, int(jx * 100)))
    exp = pd.DataFrame(rows, columns=["doc_a", "doc_b", "jac_x100"]).astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_minhash_lsh_pairs_matches_bruteforce(ray_session, docs):
    from cov_tiles_ray.pipelines.rows_only import q_minhash_lsh_pairs

    got = q_minhash_lsh_pairs(SF).to_pandas().reset_index(drop=True).astype(np.int64)
    pairs, sig = _bucket_pairs(docs)
    sigmap = {d: sig[i] for i, d in enumerate(docs.doc_id.to_numpy())}
    rows = []
    for a, b in pairs:
        e = float((sigmap[a] == sigmap[b]).mean())
        if e >= 0.5:
            rows.append((a, b, int(e * 100)))
    exp = pd.DataFrame(rows, columns=["doc_a", "doc_b", "est_x100"]).astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_embedding_neardup_matches_bruteforce(ray_session):
    from cov_tiles_ray.functions import ann as ann_f
    from cov_tiles_ray.pipelines.rows_only import q_embedding_neardup

    got = q_embedding_neardup(SF).to_pandas().reset_index(drop=True).astype(np.int64)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = ann_f.normalize_rows(np.stack(emb.embedding.to_numpy()).astype(np.float64))
    ids = emb.vec_id.to_numpy(np.int64)
    sims = mat @ mat.T
    ai, bi = np.nonzero(sims >= 0.4)
    keep = ids[ai] < ids[bi]
    exp = (
        pd.DataFrame(
            {
                "vec_a": ids[ai][keep],
                "vec_b": ids[bi][keep],
                "sim_x1000": np.floor(sims[ai, bi][keep] * 1000).astype(np.int64),
            }
        )
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_embedding_neardup_lsh_subset_and_recall(ray_session):
    """The LSH scale path returns a SUBSET of the exact all-pairs result
    (identical sims on shared pairs) with non-trivial recall: 8 tables of
    6 bits collide ~40% of cos>=0.4 pairs in expectation."""
    from cov_tiles_ray.pipelines.rows_only import q_embedding_neardup, q_embedding_neardup_lsh

    exact = q_embedding_neardup(SF).to_pandas().astype(np.int64)
    lsh = q_embedding_neardup_lsh(SF).to_pandas().astype(np.int64)
    key = lambda df: set(map(tuple, df[["vec_a", "vec_b", "sim_x1000"]].to_numpy()))
    assert key(lsh) <= key(exact)
    assert len(exact) > 0
    assert len(lsh) / len(exact) >= 0.2  # measured 0.46 at sf0.01


def test_simhash_neardup_matches_bruteforce(ray_session, docs):
    """4x16-bit banding at hamming <= 3 has PERFECT recall by pigeonhole
    (no bucket reaches the cap at this sf): the banded result must EQUAL
    the all-pairs bruteforce."""
    from cov_tiles_ray.functions import dedup as dedup_f
    from cov_tiles_ray.pipelines.rows_only import SIMHASH_HAMMING_MAX, q_simhash_neardup

    got = q_simhash_neardup(SF).to_pandas().astype(np.int64).reset_index(drop=True)
    fp = dedup_f.simhash(docs["text"])
    ids = docs["doc_id"].to_numpy(np.int64)
    ai, bi = np.triu_indices(len(ids), k=1)
    hd = dedup_f.hamming_distance64(fp[ai], fp[bi])
    keep = hd <= SIMHASH_HAMMING_MAX
    exp = (
        pd.DataFrame({"doc_a": ids[ai][keep], "doc_b": ids[bi][keep], "hamming": hd[keep]})
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_neardup_clusters_matches_union_find(ray_session):
    """The distributed min-label propagation must produce exactly the
    connected components a sequential union-find finds over the same
    verified pair set — including the keep-one-per-cluster decision."""
    from cov_tiles_ray.pipelines.rows_only import q_neardup_clusters, q_neardup_verified

    pairs = q_neardup_verified(SF).to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs.doc_a, pairs.doc_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = pd.DataFrame(
        sorted((n, find(n)) for n in parent), columns=["doc_id", "cluster_id"]
    ).astype(np.int64)
    exp["keep"] = (exp.doc_id == exp.cluster_id).astype(np.int64)

    got = q_neardup_clusters(SF).to_pandas().reset_index(drop=True).astype(np.int64)
    assert len(pairs) > 0  # the fixture corpus must exercise the graph
    pd.testing.assert_frame_equal(got, exp)
    # every cluster keeps exactly one canonical doc
    assert (got.groupby("cluster_id")["keep"].sum() == 1).all()


def test_no_driver_materialization():
    """The three rewritten pipelines must not call .to_pandas() on a full
    input Dataset mid-pipeline (only on the final small pair result)."""
    from cov_tiles_ray.pipelines import rows_only

    for fn in (
        rows_only.q_neardup_verified,
        rows_only.q_embedding_neardup,
        rows_only.q_minhash_lsh_pairs,
    ):
        src = inspect.getsource(fn)
        # the only allowed to_pandas is the terminal pair collection
        assert src.count(".to_pandas()") <= 1, fn.__name__
        assert "texts = ds.to_pandas" not in src
        assert "emb.to_pandas" not in src


def test_embedding_kmeans_lloyd_invariants(ray_session):
    """Distributed Lloyd must match a single-process numpy reference on the
    integer outputs (cluster sizes per iteration) and obey the Lloyd
    monotonicity: total inertia never increases between iterations."""
    import pyarrow.parquet as pq

    from cov_tiles_ray.pipelines.rows_only import (
        KMEANS_ITERS,
        KMEANS_K,
        q_embedding_kmeans,
    )

    sf = "/root/testdata/sf0.001"
    got = q_embedding_kmeans(sf).to_pandas().sort_values(["iter", "cluster_id"])

    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id")
    v = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    cents = v[: KMEANS_K].copy()
    n_rows = len(v)
    for it in range(KMEANS_ITERS):
        d2 = (v * v).sum(1)[:, None] - 2.0 * (v @ cents.T) + (cents * cents).sum(1)[None, :]
        a = d2.argmin(1)
        g = got[got["iter"] == it]
        assert g["n"].sum() == n_rows
        np.testing.assert_array_equal(
            g.sort_values("cluster_id")["n"].to_numpy(),
            np.bincount(a, minlength=KMEANS_K),
            err_msg=f"iter {it} cluster sizes",
        )
        for c in range(KMEANS_K):
            if (a == c).any():
                cents[c] = v[a == c].mean(0)
    inertia = got.groupby("iter")["inertia_x1e6"].sum().to_numpy()
    assert (np.diff(inertia) <= 0).all(), inertia


def test_part_candidate_pairs_cap_and_coverage(ray_session, monkeypatch):
    """The vectorized part-exchange pairing engine must (a) emit exactly
    the distinct a<b pairs a bruteforce per-bucket enumeration emits, and
    (b) honor the MAX_LSH_BUCKET cap with lowest-id retention — including
    a bucket bigger than the cap."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from cov_tiles_ray.pipelines import rows_only as ro

    monkeypatch.setattr(ro, "MAX_LSH_BUCKET", 5)
    rng = np.random.default_rng(3)
    n = 400
    rows = {
        "doc_id": np.arange(n, dtype=np.int64),
        "band": rng.integers(0, 3, n).astype(np.int64),
        # key 7 in band 0 made hot (bucket of ~80 > cap 5)
        "key": np.where(rng.random(n) < 0.2, 7, rng.integers(0, 40, n)).astype(np.int64),
    }
    rows["band"] = np.where(rows["key"] == 7, 0, rows["band"])
    ds = rd.from_arrow(pa.table(rows)).repartition(7)
    got = (
        ro._part_candidate_pairs(ds, n * 3)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )

    exp = set()
    df = pd.DataFrame(rows)
    for (_b, _k), g in df.groupby(["band", "key"]):
        ids = np.sort(g["doc_id"].to_numpy())[:5]
        exp.update(itertools.combinations(ids.tolist(), 2))
    exp = pd.DataFrame(sorted(exp), columns=["doc_a", "doc_b"])
    pd.testing.assert_frame_equal(got, exp)


def test_embedding_pca_matches_numpy_reference(ray_session):
    """Distributed two-moment PCA must reproduce the single-process numpy
    eigenvalues (the Gram partials are exact per batch; only float reduce
    order differs, so eigenvalues agree to ~1e-9 relative)."""
    import pyarrow.parquet as pq

    from cov_tiles_ray.pipelines.rows_only import PCA_COMPONENTS, q_embedding_pca

    sf = "/root/testdata/sf0.001"
    got = q_embedding_pca(sf).sort_values("component", ignore_index=True)

    v = np.stack(
        pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
        .to_pandas()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    cov = np.cov(v, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:PCA_COMPONENTS]

    assert got["n_rows"].iloc[0] == len(v)
    np.testing.assert_allclose(
        got["eigenvalue_x1e9"].to_numpy() / 1e9, evals, rtol=1e-6, atol=1e-9
    )
    ratios = got["explained_x1e6"].to_numpy() / 1e6
    assert (np.diff(got["eigenvalue_x1e9"].to_numpy()) <= 0).all()
    assert (ratios > 0).all() and ratios.sum() < 1.0 + 1e-9


def test_banded_fp_subband_saturated_bucket(ray_session, monkeypatch):
    """_banded_fp_pairs with a SATURATED band bucket (size >> SUBBAND_MIN,
    the 100-TB-regime shape) must emit exactly the bruteforce hamming<=3
    pair set — the recursive rotated-partition sub-banding only changes
    candidate enumeration order, never recall (pigeonhole holds per
    level).  MAX_LSH_BUCKET is lifted above the bucket size so the cap
    doesn't mask a sub-banding recall bug."""
    import itertools

    import pyarrow as pa
    import ray.data as rd

    from cov_tiles_ray.pipelines import rows_only as ro

    monkeypatch.setattr(ro, "MAX_LSH_BUCKET", 10_000)
    rng = np.random.default_rng(11)
    n = 900
    # all fingerprints share low 16 bits -> band 0 is one bucket of 900
    base = np.uint64(0xBEEF)
    high = rng.integers(0, 1 << 48, n, dtype=np.uint64) << np.uint64(16)
    fp = high | base
    # plant near-dup pairs at hamming 1..3 (flip high bits only)
    for i, (k, bits) in enumerate([(0, (17,)), (2, (20, 33)), (4, (25, 40, 63))]):
        fp[700 + i] = fp[k]
        for b in bits:
            fp[700 + i] ^= np.uint64(1) << np.uint64(b)
    ids = np.arange(n, dtype=np.int64)

    sk = ro._banded_sketch_table(fp, ids, pa.int64(), "doc_id")
    got = (
        ro._banded_fp_pairs(rd.from_arrow(sk).repartition(5), n * 4, "doc_id", "a", "b", pa.int64())
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )

    def hamming(x, y):
        return bin(int(x) ^ int(y)).count("1")

    exp = []
    for i, j in itertools.combinations(range(n), 2):
        h = hamming(fp[i], fp[j])
        if h <= ro.SIMHASH_HAMMING_MAX:
            exp.append((i, j, h))
    exp_df = pd.DataFrame(exp, columns=["a", "b", "hamming"]).sort_values(
        ["a", "b"], ignore_index=True
    )
    assert len(exp_df) >= 3  # the planted pairs are in the truth set
    pd.testing.assert_frame_equal(
        got.astype({"a": "int64", "b": "int64", "hamming": "int64"}), exp_df
    )


def test_documents_scale_generator_shard_independent():
    """The dedup-scale documents corpus is counter-based: any shard range
    regenerates identically, and ~10% of docs are near-duplicates of a
    cluster base (the structure minhash/clusters scale runs rely on)."""
    from cov_tiles_ray.sources import synth

    a = synth.generate_documents_batch(0, 120)
    b = synth.generate_documents_batch(60, 60)
    assert a.slice(60, 60).equals(b)
    t = a["text"].to_pylist()
    sims = 0
    for i in range(1, 120):
        base = i - (i % 7)
        if base != i:
            sa, sb = set(t[i].split()), set(t[base].split())
            if len(sa & sb) / len(sa | sb) > 0.6:
                sims += 1
    assert sims >= 10  # near-dup clusters present


def test_embeddings_scale_generator_shard_independent():
    """The ANN-scale embeddings corpus is counter-based (any shard range
    regenerates identically), unit-normalized, and ~10% of rows are
    near-duplicates (cosine ~0.999) of a cluster base — the structure the
    embedding-LSH scale runs rely on."""
    import numpy as np

    from cov_tiles_ray.sources import synth

    a = synth.generate_embeddings_batch(0, 120)
    b = synth.generate_embeddings_batch(60, 60)
    assert a.slice(60, 60).equals(b)
    v = np.array(a["embedding"].to_pylist(), np.float32)
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    near = sum(
        1
        for i in range(1, 120)
        if (i - (i % 5)) != i and float(v[i] @ v[i - (i % 5)]) > 0.99
    )
    assert near >= 10
