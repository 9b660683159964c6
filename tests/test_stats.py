"""Per-zoom stats sink (reference demo drivers G2/S10)."""

import numpy as np
import pandas as pd


def test_zoom_stats_formula(ray_session, tmp_path):
    import ray.data as rd

    from cov_tiles_ray.pipelines import stats

    tiles = rd.from_pandas(
        pd.DataFrame(
            {
                "z": [4, 4, 6],
                "n_features": [10, 20, 5],
                "covt_bytes": [50, 100, 80],
                "mvt_bytes": [100, 100, 60],
            }
        )
    )
    out = str(tmp_path / "stats.csv")
    df = stats.write_stats_csv(tiles, out)
    z4 = df[df["z"] == 4].iloc[0]
    # mean of per-tile ratios (reference printStats), not ratio of sums
    assert abs(z4["mean_reduction_pct"] - np.mean([50.0, 0.0])) < 1e-9
    assert abs(z4["total_reduction_pct"] - (1 - 150 / 200) * 100) < 1e-9
    z6 = df[df["z"] == 6].iloc[0]
    assert z6["mean_reduction_pct"] < 0  # covt larger than baseline -> negative
    back = pd.read_csv(out)
    assert list(back["z"]) == [4, 6]
