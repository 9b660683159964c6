"""Similarity-search kernels: brute-force cosine top-k + LSH bucketing.

The brute-force path is the per-batch baseline (numpy matmul of each batch
against a broadcast query matrix — the queries are ``ray.put`` once and read
inside every task).  The random-hyperplane LSH path is the scale variant:
bucket vectors by sign patterns so candidate generation becomes a groupby.
"""

from __future__ import annotations

import numpy as np


def normalize_rows(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float32)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


def cosine_topk_block(
    block_vecs: np.ndarray,
    block_ids: np.ndarray,
    queries_normed: np.ndarray,
    k: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-batch partial top-k: returns (query_idx, vec_id, score) triples
    of each query's k best matches within this block.  Partial results from
    all blocks are merged with a tiny final top-k (combiner pattern — the
    shuffle carries k rows per query per block, not the vectors)."""
    bv = normalize_rows(block_vecs)
    sims = queries_normed @ bv.T  # (nq, nb)
    nb = sims.shape[1]
    kk = min(k, nb)
    if kk == 0:
        return (np.empty(0, np.int64), np.empty(0, block_ids.dtype), np.empty(0, np.float32))
    part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # (nq, kk)
    qidx = np.repeat(np.arange(sims.shape[0], dtype=np.int64), kk)
    vidx = part.reshape(-1)
    return qidx, np.asarray(block_ids)[vidx], sims[qidx, vidx].astype(np.float32)


def merge_topk(query_idx: np.ndarray, ids: np.ndarray, scores: np.ndarray, k: int):
    """Merge partial (query, id, score) triples into final per-query top-k,
    deterministic tie-break by (−score, id)."""
    order = np.lexsort((np.asarray(ids), -np.asarray(scores), np.asarray(query_idx)))
    q = np.asarray(query_idx)[order]
    i = np.asarray(ids)[order]
    s = np.asarray(scores)[order]
    # rank within query
    first = np.concatenate([[True], q[1:] != q[:-1]])
    grp_start = np.flatnonzero(first)
    rank = np.arange(len(q)) - np.repeat(grp_start, np.diff(np.concatenate([grp_start, [len(q)]])))
    keep = rank < k
    return q[keep], i[keep], s[keep], rank[keep].astype(np.int64)


def hyperplane_lsh_params(dim: int, num_bits: int = 16, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_bits, dim)).astype(np.float32)


def hyperplane_bucket(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket id (int64) per vector.

    Projections are computed in float64 so the SQL oracle (DuckDB
    ``list_dot_product`` over ``DOUBLE[]``) sees the same signs: the
    smallest |projection| in the test corpora is ~1e-6, seven orders of
    magnitude above float64 summation-order noise, but float32 matmul
    error (~1e-6 relative) would sit right at that margin."""
    proj = np.asarray(vecs, dtype=np.float64) @ np.asarray(planes, dtype=np.float64).T
    bits = (proj > 0).astype(np.uint64)
    out = np.zeros(len(bits), dtype=np.uint64)
    for j in range(bits.shape[1]):
        out |= bits[:, j] << np.uint64(j)
    return out.view(np.int64)


def ivf_assign(vecs: np.ndarray, centroids_normed: np.ndarray) -> np.ndarray:
    """IVF list assignment: nearest centroid by cosine (centroids broadcast)."""
    v = normalize_rows(vecs)
    return np.argmax(v @ centroids_normed.T, axis=1).astype(np.int64)


def kmeans_centroids(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 13) -> np.ndarray:
    """Tiny deterministic k-means (spherical) for IVF training on a sample."""
    rng = np.random.default_rng(seed)
    v = normalize_rows(sample)
    idx = rng.choice(len(v), size=min(n_clusters, len(v)), replace=False)
    cent = v[idx].copy()
    for _ in range(iters):
        assign = np.argmax(v @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = v[m].mean(axis=0)
        cent = normalize_rows(cent)
    return cent
