"""Deduplication kernels: exact hash, MinHash, SimHash, n-gram Jaccard.

Batch-vectorized sketch builders meant for ``map_batches``; the groupby/
LSH-band shuffles live in ``pipelines.dedup``.  All hashing is
deterministic (pandas hash_array / fixed multipliers), so sketches computed
on different workers agree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

U64 = np.uint64
_MERSENNE61 = np.uint64((1 << 61) - 1)


_FNV_OFFSET = U64(14695981039346656037)
_FNV_PRIME = U64(1099511628211)


def fnv1a_hashes(tokens: list[str] | np.ndarray) -> np.ndarray:
    """FNV-1a 64-bit over each token's unicode code points, vectorized by
    character position (h = (h XOR cp) * prime per char, uint64 wrap).

    Chosen over pandas hash_array because the definition is documentable
    and reproducible outside this process — the driver's DuckDB oracle
    recomputes it in SQL (list_reduce over code points)."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=U64)
    lens = np.array([len(t) for t in tokens], dtype=np.int64)
    maxlen = int(lens.max()) if n else 0
    cps = np.zeros((n, maxlen), dtype=np.int64)
    for i, t in enumerate(tokens):
        if t:
            cps[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    h = np.full(n, _FNV_OFFSET, dtype=U64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            m = lens > j
            h[m] = (h[m] ^ cps[m, j].astype(U64)) * _FNV_PRIME
    return h


def _token_hashes(text: str) -> np.ndarray:
    toks = text.lower().split()
    if not toks:
        return np.empty(0, dtype=U64)
    return fnv1a_hashes(toks)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of word k-shingles via a polynomial roll over token hashes."""
    th = _token_hashes(text)
    if len(th) < k:
        return th[:1] if len(th) else np.empty(0, dtype=U64)
    # polynomial combination of k consecutive token hashes
    mult = U64(1099511628211)
    acc = th[: len(th) - k + 1].copy()
    for j in range(1, k):
        acc = acc * mult + th[j : len(th) - k + 1 + j]
    return np.unique(acc)


def _minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, num_perm, dtype=np.uint64) | U64(1)
    b = rng.integers(0, (1 << 61) - 1, num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(texts: pd.Series, num_perm: int = 128, k: int = 5) -> np.ndarray:
    """(n_docs, num_perm) uint64 MinHash signatures over word k-shingles.

    Inner math is vectorized with a segmented ``np.minimum.reduceat`` over
    all docs' shingles at once (perm axis chunked to bound memory).
    """
    a, b = _minhash_params(num_perm)
    per_doc = [shingle_hashes(t, k) for t in texts.fillna("")]
    lengths = np.array([len(s) for s in per_doc], dtype=np.int64)
    sig = np.full((len(per_doc), num_perm), np.iinfo(np.uint64).max, dtype=U64)
    nonempty = lengths > 0
    if not nonempty.any():
        return sig
    hv = np.concatenate([s for s in per_doc if len(s)])
    starts = np.concatenate([[0], np.cumsum(lengths[nonempty])[:-1]])
    with np.errstate(over="ignore"):
        for c0 in range(0, num_perm, 16):
            c1 = min(c0 + 16, num_perm)
            # universal-ish hash: (a*x + b) mod 2^61-1 (wrapping mult is fine
            # for dedup purposes; determinism is what matters)
            vals = (hv[:, None] * a[None, c0:c1] + b[None, c0:c1]) % _MERSENNE61
            sig[nonempty, c0:c1] = np.minimum.reduceat(vals, starts, axis=0)
    return sig


def lsh_band_keys(sig: np.ndarray, num_bands: int = 16) -> np.ndarray:
    """(n_docs, num_bands) int64 band-bucket keys for LSH grouping.

    Rows whose signatures agree on ALL positions of any band share that
    band's key — the classic banding construction.
    """
    n, p = sig.shape
    rows = p // num_bands
    keys = np.empty((n, num_bands), dtype=np.int64)
    with np.errstate(over="ignore"):
        for bi in range(num_bands):
            band = sig[:, bi * rows : (bi + 1) * rows]
            h = np.full(n, 1469598103934665603, dtype=U64)
            for j in range(rows):
                h = (h ^ band[:, j]) * U64(1099511628211)
            # mix in the band index so bands don't collide with each other
            salt = U64((bi * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            keys[:, bi] = ((h ^ salt) >> U64(1)).view(np.int64)
    return keys


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact word-k-shingle Jaccard (used to verify LSH candidate pairs)."""
    sa = set(shingle_hashes(text_a, k).tolist())
    sb = set(shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def simhash(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash over word hashes (sign of per-bit vote sums)."""
    out = np.empty(len(texts), dtype=U64)
    for i, t in enumerate(texts.fillna("")):
        th = _token_hashes(t)
        if len(th) == 0:
            out[i] = 0
            continue
        bits = np.unpackbits(th[:, None].view(np.uint8), axis=1, bitorder="little")  # (n,64)
        votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(th)  # +1/-1 votes
        fp = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
        out[i] = fp.view(U64)[0]
    return out


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Popcount of XOR for uint64 arrays (vectorized via uint8 view)."""
    x = (np.asarray(a, dtype=U64) ^ np.asarray(b, dtype=U64)).view(np.uint8)
    return np.unpackbits(x.reshape(-1, 8), axis=1).sum(axis=1).astype(np.int64)


def hamming_at_most(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """Branchless popcount(a ^ b) <= k mask: clear the lowest set bit k
    times (y &= y - 1) and test for zero — ~10x cheaper than the full
    unpackbits popcount and allocation-light, the right pre-filter when
    candidate pairs vastly outnumber true near-dups (banded LSH buckets
    produce ~10^8 candidates for ~10^4 matches at sf0.1)."""
    y = np.asarray(a, dtype=U64) ^ np.asarray(b, dtype=U64)
    one = np.uint64(1)
    for _ in range(k):
        y &= y - one  # 0 stays 0: 0 & (0-1) == 0
    return y == 0
