"""Edge-case unit tests for the temporal-join group kernels (the SQL-oracle
parametrized test covers end-to-end equality; these cover branches the
testdata never hits: keyed groups with one side empty, exact-boundary
semantics, and tie-breaks)."""

import numpy as np
import pandas as pd

from cov_tiles_ray.pipelines.queries import (
    _FOLLOW_WINDOW_US,
    _asof_group,
    _followups_group,
    _running_group,
)


def _g(side, t, rid):
    return pd.DataFrame(
        {
            "side": np.asarray(side, np.int64),
            "t": np.asarray(t, np.int64),
            "rid": np.asarray(rid, np.int64),
        }
    )


class TestAsofGroup:
    def test_no_orders_in_group_yields_empty(self):
        out = _asof_group(_g([0, 0], [10, 20], [1, 2]))
        assert len(out) == 0
        assert list(out.columns) == ["event_id", "order_key", "order_day"]
        assert out["event_id"].dtype == np.int64

    def test_no_events_in_group_yields_empty(self):
        out = _asof_group(_g([1, 1], [10, 20], [1, 2]))
        assert len(out) == 0

    def test_event_before_all_orders_dropped(self):
        out = _asof_group(_g([0, 1], [5, 10], [100, 1]))
        assert len(out) == 0

    def test_exact_boundary_is_inclusive(self):
        # order at t=10, event at t=10: "at-or-before" matches
        out = _asof_group(_g([0, 1], [10, 10], [100, 7]))
        assert out["order_key"].tolist() == [7]
        assert out["order_day"].tolist() == [10]

    def test_tie_on_day_picks_max_order_key(self):
        # two orders on the same day: the rank-1 row in the oracle is
        # (o_orderdate DESC, o_orderkey DESC) -> max key among max day
        out = _asof_group(_g([0, 1, 1], [15, 10, 10], [100, 3, 9]))
        assert out["order_key"].tolist() == [9]

    def test_picks_latest_not_first(self):
        out = _asof_group(_g([0, 1, 1, 1], [25, 10, 20, 30], [100, 1, 2, 3]))
        assert out["order_key"].tolist() == [2]
        assert out["order_day"].tolist() == [20]


class TestFollowupsGroup:
    def test_window_boundaries_strict_after_inclusive_end(self):
        w = _FOLLOW_WINDOW_US
        g = pd.DataFrame(
            {
                "event_id": np.array([1, 2, 3, 4], np.int64),
                # e2 at +0 (excluded: strict >), e3 at +w (included: <=),
                # e4 at +w+1 (excluded)
                "t": np.array([0, 0, w, w + 1], np.int64),
            }
        )
        out = _followups_group(g).set_index("event_id")["n_follow"]
        assert out[1] == 1  # only e3; e2 shares the timestamp, e4 is past w
        assert out[2] == 1
        assert out[3] == 1  # e4 is within (w, w + w]
        assert out[4] == 0

    def test_singleton_group(self):
        g = pd.DataFrame({"event_id": np.array([5], np.int64), "t": np.array([0], np.int64)})
        out = _followups_group(g)
        assert out["n_follow"].tolist() == [0]


class TestRunningGroup:
    def test_orders_sorted_by_day_then_key(self):
        g = pd.DataFrame(
            {
                "o_orderkey": np.array([3, 1, 2], np.int64),
                "o_custkey": np.array([7, 7, 7], np.int64),
                "day": np.array([10, 10, 5], np.int64),
                "cents": np.array([100, 10, 1], np.int64),
            }
        )
        out = _running_group(g)
        assert out["o_orderkey"].tolist() == [2, 1, 3]
        assert out["rn"].tolist() == [1, 2, 3]
        assert out["run_cents"].tolist() == [1, 11, 111]
        assert (out["o_custkey"] == 7).all()
