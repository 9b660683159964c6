"""Edge tests for the shared two-pass rank search (_cents_rank_search):
ranks landing exactly on coarse-bucket boundaries, single-value groups,
duplicate runs, and the value_fn (derived-quantity) path.  The oracle
suite covers the production distributions; these pin the searchsorted
side conventions the helper relies on.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _make_ds(flags, prices):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "l_returnflag": pa.array(list(flags), pa.string()),
                "l_extendedprice": pa.array(np.asarray(prices, np.float64)),
            }
        )
    )


def _brute(cents, ranks):
    s = np.sort(np.asarray(cents, np.int64))
    return {k: int(s[k - 1]) for k in ranks}


def test_rank_at_bucket_boundaries(ray_session):
    from cov_tiles_ray.pipelines.queries import _PQ_SHIFT, _cents_rank_search

    w = 1 << _PQ_SHIFT
    # values straddling bucket edges: w-1 | w | 2w-1 | 2w, plus duplicate
    # runs of each (a duplicate run never spans buckets by construction)
    cents = np.repeat([w - 1, w, 2 * w - 1, 2 * w, 5 * w + 3], [3, 4, 2, 5, 1])
    prices = cents / 100.0
    ds = _make_ds("A" * len(cents), prices)
    n = len(cents)
    ranks = list(range(1, n + 1))  # every rank, incl. first/last of buckets
    totals, at = _cents_rank_search(
        ds, "l_returnflag", "l_extendedprice", lambda m: ranks
    )
    assert totals == {"A": n}
    assert at["A"] == _brute(cents, ranks)


def test_rank_search_multi_flag_and_single_value(ray_session):
    from cov_tiles_ray.pipelines.queries import _cents_rank_search

    ds = _make_ds("AABBB", [1.00, 9.99, 50.00, 50.00, 50.00])
    totals, at = _cents_rank_search(
        ds, "l_returnflag", "l_extendedprice", lambda m: [1, m]
    )
    assert totals == {"A": 2, "B": 3}
    assert at["A"] == {1: 100, 2: 999}
    assert at["B"] == {1: 5000, 3: 5000}


def test_rank_search_value_fn_derived_quantity(ray_session):
    from cov_tiles_ray.pipelines.queries import _cents_rank_search

    # rank |cents - 500| instead of cents (the MAD shape)
    cents = np.array([100, 400, 500, 600, 1100], np.int64)
    ds = _make_ds("A" * 5, cents / 100.0)

    def dev(c, codes, flags):
        return np.abs(c - 500)

    totals, at = _cents_rank_search(
        ds, "l_returnflag", "l_extendedprice", lambda m: [1, 3, 5], value_fn=dev
    )
    assert at["A"] == _brute(np.abs(cents - 500), [1, 3, 5])


def test_mad_prices_matches_numpy(ray_session):
    """mad_prices' chained searches vs a direct numpy recompute at sf0.001."""
    import pyarrow.parquet as pq

    from cov_tiles_ray.pipelines.queries import q_mad_prices

    sf = "/root/testdata/sf0.001"
    got = q_mad_prices(sf).to_pandas().set_index("l_returnflag")
    t = pq.read_table(
        f"{sf}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    )
    df = pd.DataFrame(
        {
            "f": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "c": np.floor(
                t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64),
        }
    )
    for f, g in df.groupby("f"):
        c = np.sort(g["c"].to_numpy())
        k = (len(c) + 1) // 2
        med = int(c[k - 1])
        mad = int(np.sort(np.abs(g["c"].to_numpy() - med))[k - 1])
        assert got.loc[f, "median_cents"] == med
        assert got.loc[f, "mad_cents"] == mad
