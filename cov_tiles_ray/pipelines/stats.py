"""Per-zoom statistics sink — the reference's demo drivers as a pipeline.

``BingCovtDemo`` / ``OmtCovtDemo`` walk the corpus accumulating per-zoom
compression reduction and emit a CSV with spreadsheet formulas
(BingCovtDemo.java:44-115, G2/S10 in SURVEY.md §2).  Engine form: the per-
zoom reduction is a small ``groupby("z").aggregate`` over the compact tile
table (no driver loop), and the CSV is written from the aggregate's few
rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Sum


def zoom_stats(tiles: rd.Dataset) -> pd.DataFrame:
    """Per-zoom tile/feature counts, byte totals and mean reduction.

    Matches the reference's per-tile-ratio-then-mean formula
    ``mean((1 - covt/mvt) * 100)`` (CovtConverterTest.printStats,
    CovtConverterTest.java:278-291) — note this is the mean of ratios, not
    the ratio of sums.  ``plain_bytes`` stands in for mvt when the MVT
    baseline columns are absent."""
    denom = "mvt_bytes" if "mvt_bytes" in tiles.schema().names else "plain_bytes"

    def add_ratio(b: pa.Table) -> pa.Table:
        covt = b["covt_bytes"].to_numpy(zero_copy_only=False).astype(np.float64)
        base = b[denom].to_numpy(zero_copy_only=False).astype(np.float64)
        red = (1.0 - covt / np.maximum(base, 1.0)) * 100.0
        return b.append_column("reduction_pct", pa.array(red))

    agg = (
        tiles.map_batches(add_ratio, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("z")
        .aggregate(
            Count(alias_name="tiles"),
            Sum("n_features", alias_name="features"),
            Sum("covt_bytes", alias_name="covt_bytes"),
            Sum(denom, alias_name="baseline_bytes"),
            Mean("reduction_pct", alias_name="mean_reduction_pct"),
            Max("covt_bytes", alias_name="max_tile_bytes"),
        )
        .to_pandas()
        .sort_values("z")
        .reset_index(drop=True)
    )
    agg["total_reduction_pct"] = (
        1.0 - agg["covt_bytes"] / agg["baseline_bytes"].clip(lower=1)
    ) * 100.0
    return agg


def write_stats_csv(tiles: rd.Dataset, path: str) -> pd.DataFrame:
    """Aggregate per zoom and write the demo-style CSV; returns the frame."""
    df = zoom_stats(tiles)
    df.to_csv(path, index=False)
    return df
