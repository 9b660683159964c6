"""Property invariants for the session-6 operators, beyond the oracle
equality the parametrized driver-contract test already checks:

* Skyline: no emitted point is dominated and no non-emitted point is
  undominated (full O(n^2) dominance check against the raw table).
* Entropy: 0 <= H <= ln(n_types) per user, and H == 0 iff one type.
* PageRank: total rank mass is conserved up to floor leakage, and
  every rank is at least the teleport base.
* BM25: every returned doc contains a query term; scores are positive
  and sorted descending with doc_id tie-break.
* dup_ngram_spans: 0 <= n_dup <= n_windows; a doc pair known to share
  its full text (synthetic exact dups) is fully flagged.
* vocab_fuzzy_pairs agrees with a brute-force Levenshtein scan.
"""

import itertools

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).df()


def test_skyline_dominance(ray_session):
    from cov_tiles_ray.pipelines.queries import q_orders_skyline

    got = q_orders_skyline(SF).to_pandas()
    raw = duckdb.connect().execute(
        f"""SELECT o_orderkey,
                   CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents,
                   CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day
            FROM read_parquet('{SF}/orders.parquet')"""
    ).df()
    c = raw["cents"].to_numpy(np.int64)
    d = raw["day"].to_numpy(np.int64)
    dominated = np.zeros(len(raw), bool)
    for i in range(len(raw)):
        dom = (c >= c[i]) & (d <= d[i]) & ((c > c[i]) | (d < d[i]))
        dominated[i] = dom.any()
    expect = set(raw.loc[~dominated, "o_orderkey"])
    assert set(got["o_orderkey"]) == expect and len(got) == len(expect)


def test_entropy_bounds(ray_session):
    from cov_tiles_ray.pipelines.queries import q_user_event_entropy

    got = q_user_event_entropy(SF).to_pandas()
    h = got["entropy_micro"].to_numpy(np.int64) / 1e6
    nt = got["n_types"].to_numpy(np.int64)
    assert (h >= -1e-6).all()
    assert (h <= np.log(nt) + 1e-6).all()
    single = nt == 1
    assert (np.abs(h[single]) <= 1e-6).all()
    assert (got["n_events"] >= got["n_types"]).all()


def test_pagerank_mass_and_base(ray_session):
    from cov_tiles_ray.pipelines.queries import _PR_SCALE, q_nation_pagerank

    got = q_nation_pagerank(SF).to_pandas()
    n = len(got)
    total = got["rank_e12"].sum()
    # floors leak at most ~1 unit per (edge + node) per iteration
    assert 0 <= n * _PR_SCALE - total < 10**7
    assert (got["rank_e12"] >= 15 * _PR_SCALE // 100).all()


def test_bm25_semantics(ray_session):
    from cov_tiles_ray.pipelines.queries import _BM25_TERMS, q_bm25_topk

    got = q_bm25_topk(SF).to_pandas()
    assert (got["score_micro"] > 0).all()
    s = got["score_micro"].to_numpy(np.int64)
    assert (np.diff(s) <= 0).all()
    ties = np.flatnonzero(np.diff(s) == 0)
    did = got["doc_id"].to_numpy(np.int64)
    assert (did[ties] < did[ties + 1]).all()
    texts = _docs().set_index("doc_id")["text"]
    for doc in did:
        toks = set(str(texts.loc[doc]).split(" "))
        assert toks & set(_BM25_TERMS), doc


def test_dup_ngram_full_recompute(ray_session):
    """Independent single-process recompute of every doc's duplicated-window
    count (window-text dict over the whole sf0.001 corpus)."""
    from collections import defaultdict

    from cov_tiles_ray.pipelines.queries import _NGRAM_W, q_dup_ngram_spans

    got = q_dup_ngram_spans(SF).to_pandas().set_index("doc_id").sort_index()
    assert (got["n_dup_windows"] <= got["n_windows"]).all()
    assert (got["n_dup_windows"] >= 0).all()

    owners: dict[str, set] = defaultdict(set)
    per_doc: dict[int, list] = {}
    for _, row in _docs().iterrows():
        toks = str(row["text"]).split(" ")
        wins = [" ".join(toks[i : i + _NGRAM_W]) for i in range(len(toks) - _NGRAM_W + 1)]
        if wins:
            per_doc[int(row["doc_id"])] = wins
            for w in wins:
                owners[w].add(int(row["doc_id"]))
    exp = pd.DataFrame(
        {
            "doc_id": list(per_doc),
            "n_windows": [len(v) for v in per_doc.values()],
            "n_dup_windows": [
                sum(len(owners[w]) >= 2 for w in v) for v in per_doc.values()
            ],
        }
    ).set_index("doc_id").sort_index()
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    assert exp["n_dup_windows"].sum() > 0  # the signal is non-trivial


def test_fuzzy_pairs_brute_force(ray_session):
    from cov_tiles_ray.pipelines.queries import (
        _FUZZY_MAX_EDIT,
        _levenshtein,
        q_vocab_fuzzy_pairs,
    )

    got = q_vocab_fuzzy_pairs(SF).to_pandas()
    vocab = sorted({w for t in _docs()["text"] for w in str(t).split(" ")})
    expect = {
        (a, b, _levenshtein(a, b))
        for a, b in itertools.combinations(vocab, 2)
        if _levenshtein(a, b) <= _FUZZY_MAX_EDIT
    }
    assert {tuple(r) for r in got[["word_a", "word_b", "lev"]].itertuples(index=False)} == expect


def test_dup_ngram_kr_equals_md5(ray_session):
    """The Karp-Rabin scale-path variant must produce the identical
    duplicated-window counts as the oracle-parity md5 variant (the
    output is hash-agnostic absent 64-bit collisions)."""
    from cov_tiles_ray.pipelines.queries import q_dup_ngram_spans, q_dup_ngram_spans_kr

    a = q_dup_ngram_spans(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    b = q_dup_ngram_spans_kr(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a.astype("int64"), b.astype("int64"))
