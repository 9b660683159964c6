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


class TestStreamScan:
    """Metadata-only per-stream framing walk (tile/decode.scan_tile_streams)
    behind the stream_stats analytics query (VERDICT r2 #7)."""

    def test_scan_accounts_for_every_stream(self):
        import numpy as np

        from cov_tiles_ray.model.format import StreamType
        from cov_tiles_ray.tile import encode_tile
        from cov_tiles_ray.tile.decode import scan_tile_streams
        from tests.test_tile_roundtrip import make_point_layer

        rng = np.random.default_rng(5)
        layer = make_point_layer(rng, n=300)
        buf = encode_tile([layer])
        rows = scan_tile_streams(buf)
        assert rows
        # every row names the layer; id/geometry columns labeled
        assert {r[0] for r in rows} == {"poi"}
        cols = {r[1] for r in rows}
        assert {"<id>", "<geometry>", "class", "rank", "open", "score"} <= cols
        # stream byte totals account for (almost) the whole tile: only the
        # fixed framing (headers + descriptors) is outside stream payloads
        payload = sum(r[5] for r in rows)
        assert 0 < len(buf) - payload < 0.2 * len(buf) + 64
        # the geometry column carries a VERTEX_BUFFER stream
        st = {r[2] for r in rows if r[1] == "<geometry>"}
        assert int(StreamType.VERTEX_BUFFER) in st

    def test_stream_stats_query(self, ray_session):
        from cov_tiles_ray.pipelines.rows_only import q_stream_stats

        df = q_stream_stats("/root/testdata/sf0.001")
        assert len(df) > 3
        assert set(df.columns) == {
            "z", "layer", "column", "stream_type", "encoding",
            "n_streams", "n_values", "stream_bytes",
        }
        assert (df["stream_bytes"] >= 0).all() and (df["n_streams"] > 0).all()
        assert (df.groupby(["z", "layer", "column", "stream_type", "encoding"]).size() == 1).all()
