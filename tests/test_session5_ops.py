"""Property invariants for the session-5 sketch/spatial operators, beyond
the oracle equality the parametrized driver-contract test already checks:

* CMS estimates never under-count (est >= exact, the sketch's guarantee).
* The Bloom filter admits every true member (no false negatives) and its
  pass set is a superset of the exact semi-join.
* The radius join emits each unordered pair exactly once and agrees with
  a brute-force O(n^2) reference on the sampled point set.
"""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cms_never_undercounts(ray_session):
    from cov_tiles_ray.pipelines.queries import q_cms_heavy_hitters

    t = q_cms_heavy_hitters(SF).to_pandas()
    assert len(t) == 20
    assert (t["cms_n"] >= t["exact_n"]).all()
    # w=16 is deliberately narrow: collisions must actually occur
    assert (t["cms_n"] > t["exact_n"]).any()


def test_bloom_no_false_negatives(ray_session):
    from cov_tiles_ray.pipelines.queries import _RICH_BAL, q_bloom_membership

    got = q_bloom_membership(SF).to_pandas().set_index("priority")
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    exact = con.execute(
        f"""
        SELECT o_orderpriority AS priority,
               SUM(CASE WHEN r.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS n_true
        FROM orders LEFT JOIN (
          SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > {_RICH_BAL}
        ) r ON o_custkey = r.c_custkey
        GROUP BY o_orderpriority
        """
    ).fetchdf().set_index("priority")
    joined = got.join(exact)
    # every true member passes; bloom may only add false positives
    assert (joined["n_bloom_pass"] >= joined["n_true"]).all()
    assert (joined["n_bloom_pass"] <= joined["n_orders"]).all()


def test_radius_join_matches_bruteforce(ray_session):
    from cov_tiles_ray.functions import spatial as S
    from cov_tiles_ray.pipelines.queries import (
        _RADIUS_D,
        _event_lonlat,
        q_geo_radius_join,
    )
    from cov_tiles_ray.sources import synth

    got = q_geo_radius_join(SF).to_pandas()
    # brute force over the same hash-sampled point set
    eid = duckdb.sql(
        f"SELECT event_id FROM read_parquet('{SF}/events.parquet')"
    ).fetchnumpy()["event_id"]
    eid = eid[synth._splitmix64(eid.astype(np.uint64)) % np.uint64(8) == 0]
    lon, lat = _event_lonlat(eid)
    mx, my = S.mercator_xy(lon, lat)
    dx = mx[:, None] - mx[None, :]
    dy = my[:, None] - my[None, :]
    d2 = dx * dx + dy * dy
    ii, jj = np.nonzero((d2 < _RADIUS_D * _RADIUS_D) & (eid[:, None] < eid[None, :]))
    want = pd.DataFrame({"id_a": eid[ii], "id_b": eid[jj]}).sort_values(
        ["id_a", "id_b"], ignore_index=True
    )
    got2 = got[["id_a", "id_b"]].sort_values(["id_a", "id_b"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got2.astype(np.int64), want.astype(np.int64)
    )
    # exactly-once: no duplicate unordered pairs
    assert not got2.duplicated().any()


def test_hll_merge_equals_global(ray_session):
    from cov_tiles_ray.pipelines.queries import (
        q_hll_by_event_type,
        q_hll_distinct_users,
    )

    per_type = q_hll_by_event_type(SF).to_pandas().set_index("event_type")
    glob = q_hll_distinct_users(SF)
    # union-of-sketches == sketch-of-union, bit-for-bit on the estimate
    assert int(per_type.loc["ALL", "estimate"]) == int(glob["estimate"].iloc[0])
    assert int(per_type.loc["ALL", "m_used"]) == int(glob["m_used"].iloc[0])


def test_image_quality_matches_driver_recompute(ray_session):
    import pyarrow as pa

    from cov_tiles_ray.functions import image as img_f
    from cov_tiles_ray.pipelines import imaging
    from cov_tiles_ray.pipelines.rows_only import q_image_quality
    from cov_tiles_ray.sources import synth

    got = q_image_quality(SF)
    # driver-side reference over the same 8k-row (whole sf0.001) sample
    t = synth.generate_images_batch(0, synth.rows_for_sf(0.001))
    ref = {}
    for i in range(t.num_rows):
        img = img_f.decode_image(t["bytes"][i].as_py(), t["fmt"][i].as_py())
        f = imaging.image_features(img)
        v = (
            "dark"
            if f["brightness"] < imaging.QUALITY_DARK_BRIGHTNESS
            else ("flat" if f["std_gray"] < imaging.QUALITY_FLAT_STD else "ok")
        )
        key = (t["fmt"][i].as_py(), v)
        n, s = ref.get(key, (0, 0))
        ref[key] = (n + 1, s + int(np.floor(f["brightness"] * 1000.0)))
    assert len(got) == len(ref)
    for row in got.itertuples():
        n, s = ref[(row.fmt, row.verdict)]
        assert (row.n, row.sum_brightness_milli) == (n, s), (row.fmt, row.verdict)
    # every verdict class populated at the chosen thresholds
    assert set(got["verdict"]) == {"dark", "flat", "ok"}
