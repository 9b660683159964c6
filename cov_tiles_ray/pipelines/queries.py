"""Driver-contract query suite: Ray Data implementations + DuckDB oracles.

Every SQL-checkable operator family from SURVEY.md §2 gets a named query
here; ``__ray_entry__.queries()/oracle_sql()`` re-export these.  Exactness
rules (the driver hash-compares values):

* float aggregates are integer-ized with ``floor(x * scale)`` — floor and
  IEEE double arithmetic are bit-identical between numpy and DuckDB when
  the expression tree is identical, while SUM order is not;
* irrational constants (sqrt 3, sqrt 7 powers) are embedded into the SQL
  as full-precision Python ``repr`` literals so both engines use the same
  doubles;
* rounding is always ``floor(x + 0.5)``, never banker's rounding;
* spatial queries derive lon/lat from integer columns with pure arithmetic
  so the point set is identical on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..functions import ann as ann_f
from ..functions import spatial as S
from ..functions import text as text_f
from ..sources import synth

# ---------------------------------------------------------------------------
# shared derivations
# ---------------------------------------------------------------------------

# deterministic lon/lat from events.event_id: multiplicative-hash spreading
# (event ids are small sequential ints) on a 0.01-degree grid offset by
# 0.005 so no point ever lies on an integer-degree polygon edge
_LON_SQL = "((event_id * 2654435761) % 36000) / 100.0 - 180.0 + 0.005"
_LAT_SQL = "((event_id * 2246822519) % 16000) / 100.0 - 80.0 + 0.005"


def _event_lonlat(eid: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = (eid * 2654435761 % 36000) / 100.0 - 180.0 + 0.005
    lat = (eid * 2246822519 % 16000) / 100.0 - 80.0 + 0.005
    return lon, lat


def _mercator_sql(lon: str, lat: str) -> tuple[str, str]:
    """SQL for normalized mercator (mx, my), operation-order-identical to
    functions.spatial.mercator_xy."""
    mx = f"(({lon}) + 180.0) / 360.0"
    phi = f"radians({lat})"
    my = f"(1.0 - ln(tan({phi}) + 1.0 / cos({phi})) / pi()) / 2.0"
    return mx, my


def _tile_sql(z: int) -> str:
    """SQL computing packed tile_id from events at zoom z."""
    n = 1 << z
    mx, my = _mercator_sql("lon", "lat")
    tx = f"cast(least(greatest(floor(({mx}) * {n}.0), 0.0), {n - 1}.0) as bigint)"
    ty = f"cast(least(greatest(floor(({my}) * {n}.0), 0.0), {n - 1}.0) as bigint)"
    return f"({z}::BIGINT * {1 << 58}::BIGINT + ({tx}) * {1 << 29}::BIGINT + ({ty}))"


def _hex_sql(res: int, lon: str = "lon", lat: str = "lat") -> str:
    """SQL computing the packed hex cell id (mirrors lonlat_to_hex +
    _cube_round with floor(x+0.5) rounding)."""
    size = S.hex_cell_size(res)
    mx, my = _mercator_sql(lon, lat)
    k = repr(S.SQRT3 / 3.0)
    qf = f"((2.0 / 3.0 * ({mx})) / {size!r})"
    rf = f"((-1.0 / 3.0 * ({mx}) + {k} * ({my})) / {size!r})"
    # cube rounding in pure SQL
    return (
        f"(SELECT {res}::BIGINT * {1 << 52}::BIGINT + (cq + {S._HEX_OFF}) * {1 << 26}::BIGINT + (cr + {S._HEX_OFF}) FROM ("
        f"  SELECT CASE WHEN (ax > ay AND ax > az) THEN cast(-ry - rz as bigint) ELSE cast(rx as bigint) END AS cq,"
        f"         CASE WHEN NOT (ax > ay AND ax > az) AND NOT (ay > az) THEN cast(-rx - ry as bigint) ELSE cast(rz as bigint) END AS cr"
        f"  FROM (SELECT rx, ry, rz, abs(rx - xf) AS ax, abs(ry - yf) AS ay, abs(rz - zf) AS az"
        f"        FROM (SELECT xf, yf, zf, floor(xf + 0.5) AS rx, floor(yf + 0.5) AS ry, floor(zf + 0.5) AS rz"
        f"              FROM (SELECT {qf} AS xf, -({qf}) - ({rf}) AS yf, {rf} AS zf) ) ) ) )"
    )


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _table_rows_meta(sf_dir: str, table: str) -> int:
    """Exact table row count from parquet FOOTER metadata only — no
    Dataset execution, no data pages read.  Used to size part counts
    without adding an extra pass over the input (VERDICT r4 #3: sizing
    probes were re-executing the read).  Handles both a single file and a
    directory of part files (the scale corpora)."""
    import os

    import pyarrow.parquet as _pq

    path = f"{sf_dir}/{table}.parquet"
    if os.path.isdir(path):
        return sum(
            _pq.read_metadata(os.path.join(path, f)).num_rows
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    return int(_pq.read_metadata(path).num_rows)


# ---------------------------------------------------------------------------
# relational core (aggregate / join / sort / distinct / window)
# ---------------------------------------------------------------------------


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped aggregate over lineitem (groupby + multi-agg).

    Integer-ized money: cents = floor(price*100).  Ref analogue: per-zoom
    reduction averages G2/G3 (BingCovtDemo.java:44-110)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(b: pa.Table) -> pa.Table:
        keep = b.filter(pa.compute.less(b["l_shipdate"], pa.scalar(np.datetime64("1998-09-01", "us"))))
        qty = keep["l_quantity"].to_numpy(zero_copy_only=False)
        price = keep["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = keep["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": keep["l_returnflag"],
                "l_linestatus": keep["l_linestatus"],
                "qty": pa.array(np.floor(qty).astype(np.int64)),
                "base_cents": pa.array(np.floor(price * 100.0).astype(np.int64)),
                "disc_cents": pa.array(np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)),
            }
        )

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Count(alias_name="count_order"),
        )
    )
    return out


def _sql_pricing_summary() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           cast(sum(cast(floor(l_quantity) as bigint)) as bigint) AS sum_qty,
           cast(sum(cast(floor(l_extendedprice * 100.0) as bigint)) as bigint) AS sum_base_cents,
           cast(sum(cast(floor(l_extendedprice * (1.0 - l_discount) * 100.0) as bigint)) as bigint) AS sum_disc_cents,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """


def q_revenue_by_nation(sf_dir: str):
    """3-way broadcast join: orders ⋈ customer ⋈ nation, revenue per nation.

    customer⋈nation is pre-joined driver-side (both small) and broadcast
    via ``ray.put``: tasks capture only the OBJECT REF (bytes of a ref,
    not the Series — VERDICT r2 #9: a closure-captured DataFrame is
    re-shipped with every task once customer exceeds ~1M rows) and
    ``ray.get`` inside the kernel resolves from the worker-local plasma
    store after the first fetch per node.  Plain tasks, not an actor
    pool: at query scale an actor pool pays ~2 s of worker boot per
    invocation for the same fetch-once semantics (measured in bench)."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    c2name = (
        cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .set_index("c_custkey")["n_name"]
    )
    lookup_ref = ray.put(c2name)

    def join(b: pa.Table) -> pa.Table:
        import ray as _ray

        lookup = _ray.get(lookup_ref)  # plasma-local after first fetch
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        names = lookup.reindex(ck).to_numpy(dtype=object)
        price = b["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "cents": pa.array(np.floor(price * 100.0).astype(np.int64)),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(join, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(Sum("cents", alias_name="revenue_cents"), Count(alias_name="n_orders"))
    )


def _sql_revenue_by_nation() -> str:
    return """
    SELECT n_name,
           cast(sum(cast(floor(o_totalprice * 100.0) as bigint)) as bigint) AS revenue_cents,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """


def q_top_orders(sf_dir: str):
    """Top-k by value with deterministic tie-break (sort + limit)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def cents(b: pa.Table) -> pa.Table:
        p = b["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "cents": pa.array(np.floor(p * 100.0).astype(np.int64)),
            }
        )

    out = (
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["cents", "o_orderkey"], descending=[True, False])
        .limit(10)
    )
    return out


def _sql_top_orders() -> str:
    return """
    SELECT o_orderkey, cast(floor(o_totalprice * 100.0) as bigint) AS cents
    FROM orders ORDER BY cents DESC, o_orderkey LIMIT 10
    """


def q_distinct_segments(sf_dir: str):
    """Exact distinct (set op)."""
    ds = _read(sf_dir, "customer", ["c_mktsegment"])
    vals = sorted(ds.unique("c_mktsegment"))
    return pa.table({"c_mktsegment": pa.array(vals, pa.string())})


def _sql_distinct_segments() -> str:
    return "SELECT DISTINCT c_mktsegment FROM customer"


def q_event_windows(sf_dir: str):
    """Tumbling 1-hour event-time windows per event_type (streaming-shaped
    workload expressed as groupby over floor(epoch/3600), SURVEY.md §2.9)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def win(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        val = b["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": b["event_type"],
                "window_start": pa.array(ts // 3_600_000_000 * 3600),
                "value_micro": pa.array(np.floor(val * 1e6).astype(np.int64)),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        ds.map_batches(win, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value_micro", alias_name="sum_value_micro"))
    )


def _sql_event_windows() -> str:
    return """
    SELECT event_type,
           cast(floor(epoch(ts) / 3600) as bigint) * 3600 AS window_start,
           count(*) AS n,
           cast(sum(cast(floor(value * 1000000.0) as bigint)) as bigint) AS sum_value_micro
    FROM events GROUP BY event_type, window_start
    """


# ---------------------------------------------------------------------------
# spatial queries (tile assign / hex assign / PIP / kNN)
# ---------------------------------------------------------------------------


def _events_points(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "events", ["event_id"])

    def pts(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_lonlat(eid)
        return pa.table({"event_id": b["event_id"], "lon": pa.array(lon), "lat": pa.array(lat)})

    return ds.map_batches(pts, batch_format="pyarrow", zero_copy_batch=True)


def _q_tile_counts(sf_dir: str, z: int):
    ds = _events_points(sf_dir)

    def assign(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        tx, ty = S.lonlat_to_tile(lon, lat, z)
        tid = S.pack_tile_id(z, tx, ty)
        return pa.table({"tile_id": pa.array(tid)})

    from ray.data.aggregate import Count

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "tile_id"
    ).aggregate(Count(alias_name="n"))


def q_tile_assign_z6(sf_dir: str):
    """Web-mercator tile assignment @ z=6 + per-tile counts (SURVEY.md §7.2.3)."""
    return _q_tile_counts(sf_dir, 6)


def q_tile_assign_z10(sf_dir: str):
    return _q_tile_counts(sf_dir, 10)


def _sql_tile_assign(z: int) -> str:
    return f"""
    WITH pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events)
    SELECT {_tile_sql(z)} AS tile_id, count(*) AS n FROM pts GROUP BY tile_id
    """


def q_hex_assign_r3(sf_dir: str):
    """H3-style hex cell assignment @ res 3 + per-cell counts."""
    ds = _events_points(sf_dir)

    def assign(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        return pa.table({"hex_id": pa.array(S.lonlat_to_hex(lon, lat, 3))})

    from ray.data.aggregate import Count

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "hex_id"
    ).aggregate(Count(alias_name="n"))


def _sql_hex_assign_r3() -> str:
    return f"""
    WITH pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events)
    SELECT {_hex_sql(3)} AS hex_id, count(*) AS n FROM pts GROUP BY hex_id
    """


HEX_PYRAMID_RES = tuple(range(13))  # north-star range: H3-style res 0-12


def q_hex_pyramid(sf_dir: str):
    """Multi-resolution hex assignment: every event lands in its cell at
    ALL 13 resolutions (res 0-12) in ONE pass over the table.

    Scale shape: the per-batch kernel pre-aggregates (np.unique counts per
    res — the combiner), so the shuffle carries at most one row per
    (res, cell) per batch instead of 13x the input rows; the resolution is
    already packed into the cell id (res * 2^52), so one groupby key
    covers the whole pyramid.  r5: the Ray sort-based Aggregate replaced
    by the engine's cell-hash part exchange + per-part reduceat merge
    (A/B in BASELINE.md); exchange volume is unchanged — res 10-12 cells
    are near-unique per event so the combiner cannot compress the top
    resolutions, the 2.74x-for-5x residual recorded in the r4 sweep."""
    from ..sources.synth import _splitmix64

    ds = _events_points(sf_dir)
    n_parts = int(max(8, min(4096, _table_rows_meta(sf_dir, "events") // 100_000 + 1)))

    def assign(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        ids, counts = [], []
        for res in HEX_PYRAMID_RES:
            u, c = np.unique(S.lonlat_to_hex(lon, lat, res), return_counts=True)
            ids.append(u)
            counts.append(c.astype(np.int64))
        hid = np.concatenate(ids)
        return pa.table(
            {
                "hex_id": pa.array(hid),
                "partial": pa.array(np.concatenate(counts)),
                "part": pa.array(
                    (_splitmix64(hid.view(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "res": pa.array([], pa.int64()),
            "hex_id": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def sum_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        hid = t["hex_id"].to_numpy(zero_copy_only=False)
        cnt = t["partial"].to_numpy(zero_copy_only=False)
        order = np.argsort(hid, kind="mergesort")
        hid, cnt = hid[order], cnt[order]
        new = np.r_[True, hid[1:] != hid[:-1]]
        n = np.add.reduceat(cnt, np.flatnonzero(new))
        hid_u = hid[new]
        res, _q, _r = S.unpack_hex_id(hid_u)
        return pa.table(
            {
                "res": pa.array(res.astype(np.int64)),
                "hex_id": pa.array(hid_u),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(sum_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_hex_pyramid() -> str:
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT {_hex_sql(res)} AS hex_id FROM pts" for res in HEX_PYRAMID_RES
    )
    return f"""
    WITH pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    allcells AS (
      {unions}
    )
    SELECT CAST(hex_id // {1 << 52} AS BIGINT) AS res, hex_id, count(*) AS n
    FROM allcells GROUP BY hex_id
    """


def _region_boxes() -> pd.DataFrame:
    """5 rectangle polygons derived from region keys (integer-degree edges;
    the event grid sits at x.xx5 so no point touches an edge)."""
    rk = np.arange(5)
    return pd.DataFrame(
        {
            "r_regionkey": rk,
            "lon0": -160.0 + rk * 64.0,
            "lon1": -160.0 + rk * 64.0 + 52.0,
            "lat0": -70.0 + rk * 26.0,
            "lat1": -70.0 + rk * 26.0 + 36.0,
        }
    )


def q_pip_regions(sf_dir: str):
    """Point-in-polygon join: events vs 5 region rectangles (ray-cast kernel
    on the Ray side, BETWEEN oracle on the SQL side — exact because edges
    and points never coincide)."""
    boxes = _region_boxes()
    polys = []
    for _, r in boxes.iterrows():
        polys.append(
            {
                "poly_id": str(int(r.r_regionkey)),
                "ring_offsets": np.array([4]),
                "ring_x": np.array([r.lon0, r.lon1, r.lon1, r.lon0]),
                "ring_y": np.array([r.lat0, r.lat0, r.lat1, r.lat1]),
            }
        )

    def pip(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        keys, counts = [], []
        for p in polys:
            hit = S.points_in_rings(lon, lat, p["ring_x"], p["ring_y"], p["ring_offsets"])
            keys.append(int(p["poly_id"]))
            counts.append(int(hit.sum()))
        return pa.table(
            {"r_regionkey": pa.array(keys, pa.int64()), "n_points": pa.array(counts, pa.int64())}
        )

    from ray.data.aggregate import Sum

    ds = _events_points(sf_dir)
    return (
        ds.map_batches(pip, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("r_regionkey")
        .aggregate(Sum("n_points", alias_name="n_points"))
    )


def _sql_pip_regions() -> str:
    return f"""
    WITH pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    boxes AS (SELECT r_regionkey,
                     -160.0 + r_regionkey * 64.0 AS lon0,
                     -160.0 + r_regionkey * 64.0 + 52.0 AS lon1,
                     -70.0 + r_regionkey * 26.0 AS lat0,
                     -70.0 + r_regionkey * 26.0 + 36.0 AS lat1
              FROM region)
    SELECT cast(b.r_regionkey as bigint) AS r_regionkey, count(p.lon) AS n_points
    FROM boxes b LEFT JOIN pts p
      ON p.lon > b.lon0 AND p.lon < b.lon1 AND p.lat > b.lat0 AND p.lat < b.lat1
    GROUP BY b.r_regionkey
    """


def q_pip_actor(sf_dir: str):
    """Point-in-polygon tagging via the PipAssigner ACTOR POOL (compiled
    polygon set fetched once per actor from the object store — the
    stateful-stage pattern the north rule names), then per-polygon counts."""
    import ray

    from ..stages.assign import PipAssigner

    boxes = _region_boxes()
    polys = []
    for _, r in boxes.iterrows():
        polys.append(
            {
                "poly_id": str(int(r.r_regionkey)),
                "ring_offsets": np.array([4]),
                "ring_x": np.array([r.lon0, r.lon1, r.lon1, r.lon0]),
                "ring_y": np.array([r.lat0, r.lat0, r.lat1, r.lat1]),
            }
        )
    ref = ray.put(polys)

    from ray.data.aggregate import Count

    # fractional num_cpus: the pool must never reserve every core, or the
    # upstream read tasks starve and the stage deadlocks on small sessions
    tagged = _events_points(sf_dir).map_batches(
        PipAssigner,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=2,
        num_cpus=0.5,
        batch_size=4096,
    )
    return (
        tagged.filter(expr="poly_id != ''")
        .groupby("poly_id")
        .aggregate(Count(alias_name="n_points"))
    )


def _sql_pip_actor() -> str:
    return f"""
    WITH pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    boxes AS (SELECT r_regionkey,
                     -160.0 + r_regionkey * 64.0 AS lon0,
                     -160.0 + r_regionkey * 64.0 + 52.0 AS lon1,
                     -70.0 + r_regionkey * 26.0 AS lat0,
                     -70.0 + r_regionkey * 26.0 + 36.0 AS lat1
              FROM region)
    SELECT cast(b.r_regionkey as varchar) AS poly_id, count(*) AS n_points
    FROM boxes b JOIN pts p
      ON p.lon > b.lon0 AND p.lon < b.lon1 AND p.lat > b.lat0 AND p.lat < b.lat1
    GROUP BY b.r_regionkey
    """


_KNN_K = 10


def _knn_queries() -> pd.DataFrame:
    qk = np.arange(5)
    return pd.DataFrame(
        {
            "query_id": qk,
            "qlon": qk * 30.0 - 60.0 + 0.003,
            "qlat": qk * 15.0 - 30.0 + 0.003,
        }
    )


def q_knn_points(sf_dir: str):
    """Exact kNN (k=10) of 5 query points over event points — blocked
    brute force with partial top-k per batch + driver-side merge (the
    combiner pattern; only k rows per query leave each block)."""
    qs = _knn_queries()
    qlon = qs.qlon.to_numpy()
    qlat = qs.qlat.to_numpy()

    def partial(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        d2 = (lon[None, :] - qlon[:, None]) ** 2 + (lat[None, :] - qlat[:, None]) ** 2
        rows_q, rows_e, rows_d = [], [], []
        kk = min(_KNN_K, d2.shape[1])
        for qi in range(len(qlon)):
            part = np.argpartition(d2[qi], kk - 1)[:kk]
            rows_q.append(np.full(kk, qi, dtype=np.int64))
            rows_e.append(eid[part])
            rows_d.append(d2[qi][part])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q)),
                "event_id": pa.array(np.concatenate(rows_e)),
                "d2": pa.array(np.concatenate(rows_d)),
            }
        )

    parts = _events_points(sf_dir).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    order = np.lexsort((parts.event_id.to_numpy(), parts.d2.to_numpy(), parts.query_id.to_numpy()))
    p = parts.iloc[order]
    ranked = p.groupby("query_id", sort=True).head(_KNN_K).copy()
    ranked["rank"] = ranked.groupby("query_id").cumcount().astype(np.int64)
    return pa.table(
        {
            "query_id": pa.array(ranked.query_id.to_numpy(np.int64)),
            "event_id": pa.array(ranked.event_id.to_numpy(np.int64)),
            "rank": pa.array(ranked["rank"].to_numpy(np.int64)),
        }
    )


def _sql_knn_points() -> str:
    return f"""
    WITH pts AS (SELECT event_id, {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    qs AS (SELECT cast(n_nationkey as bigint) AS query_id,
                  n_nationkey * 30.0 - 60.0 + 0.003 AS qlon,
                  n_nationkey * 15.0 - 30.0 + 0.003 AS qlat
           FROM nation WHERE n_nationkey < 5),
    ranked AS (
      SELECT q.query_id, p.event_id,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY (p.lon - q.qlon) * (p.lon - q.qlon) + (p.lat - q.qlat) * (p.lat - q.qlat), p.event_id
             ) - 1 AS rank
      FROM qs q CROSS JOIN pts p)
    SELECT query_id, event_id, rank FROM ranked WHERE rank < {_KNN_K}
    """


def q_knn_kring(sf_dir: str):
    """kNN pruned by hex k-ring expansion (the north rule's 'kNN via H3
    k-ring' shape): assign points to hex cells, restrict each query's
    candidates to cells within hex-distance k of the query's cell, exact
    top-k among candidates.  Partial top-k per batch; only k rows per query
    leave each block."""
    qs = _knn_queries()
    qlon = qs.qlon.to_numpy()
    qlat = qs.qlat.to_numpy()
    res, k = 2, 2
    qcells = S.lonlat_to_hex(qlon, qlat, res)
    rings = [set(S.k_ring(np.array([c]), k).reshape(-1).tolist()) for c in qcells]
    ring_arrays = [np.fromiter(r, dtype=np.int64) for r in rings]

    def partial(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        cells = S.lonlat_to_hex(lon, lat, res)
        rows_q, rows_e, rows_d = [], [], []
        for qi in range(len(qlon)):
            cand = np.isin(cells, ring_arrays[qi])
            if not cand.any():
                continue
            d2 = (lon[cand] - qlon[qi]) ** 2 + (lat[cand] - qlat[qi]) ** 2
            kk = min(_KNN_K, len(d2))
            part = np.argpartition(d2, kk - 1)[:kk] if kk < len(d2) else np.arange(len(d2))
            rows_q.append(np.full(len(part), qi, dtype=np.int64))
            rows_e.append(eid[cand][part])
            rows_d.append(d2[part])
        if not rows_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "d2": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(rows_q)),
                "event_id": pa.array(np.concatenate(rows_e)),
                "d2": pa.array(np.concatenate(rows_d)),
            }
        )

    parts = (
        _events_points(sf_dir)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    order = np.lexsort((parts.event_id.to_numpy(), parts.d2.to_numpy(), parts.query_id.to_numpy()))
    p = parts.iloc[order]
    ranked = p.groupby("query_id", sort=True).head(_KNN_K).copy()
    ranked["rank"] = ranked.groupby("query_id").cumcount().astype(np.int64)
    return pa.table(
        {
            "query_id": pa.array(ranked.query_id.to_numpy(np.int64)),
            "event_id": pa.array(ranked.event_id.to_numpy(np.int64)),
            "rank": pa.array(ranked["rank"].to_numpy(np.int64)),
        }
    )


def _sql_knn_kring() -> str:
    res, k = 2, 2
    mask = (1 << 26) - 1
    off = S._HEX_OFF
    return f"""
    WITH pts AS (SELECT event_id, {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    pc AS (SELECT event_id, lon, lat, {_hex_sql(res)} AS cell FROM pts),
    qs AS (SELECT cast(n_nationkey as bigint) AS query_id,
                  n_nationkey * 30.0 - 60.0 + 0.003 AS qlon,
                  n_nationkey * 15.0 - 30.0 + 0.003 AS qlat
           FROM nation WHERE n_nationkey < 5),
    qc AS (SELECT query_id, qlon, qlat, {_hex_sql(res, lon="qlon", lat="qlat")} AS qcell FROM qs),
    pu AS (SELECT event_id, lon, lat, ((cell >> 26) & {mask}) - {off} AS pq, (cell & {mask}) - {off} AS pr FROM pc),
    qu AS (SELECT query_id, qlon, qlat, ((qcell >> 26) & {mask}) - {off} AS qq, (qcell & {mask}) - {off} AS qr FROM qc),
    cand AS (
      SELECT q.query_id, p.event_id,
             (p.lon - q.qlon) * (p.lon - q.qlon) + (p.lat - q.qlat) * (p.lat - q.qlat) AS d2
      FROM qu q JOIN pu p
        ON (abs(p.pq - q.qq) + abs(p.pr - q.qr) + abs(p.pq - q.qq + p.pr - q.qr)) / 2 <= {k}),
    ranked AS (
      SELECT query_id, event_id,
             row_number() OVER (PARTITION BY query_id ORDER BY d2, event_id) - 1 AS rank
      FROM cand)
    SELECT query_id, event_id, rank FROM ranked WHERE rank < {_KNN_K}
    """


_RASTER_GRID = 512


def q_raster_pixel_counts(sf_dir: str):
    """Rasterize event points onto a global 512x512 mercator pixel grid
    (the rasterize half of the raster<->vector bridge) + per-pixel counts."""
    ds = _events_points(sf_dir)
    from ..functions import raster as R

    def assign(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        mx, my = S.mercator_xy(lon, lat)
        px, py = R.pixel_coords(mx, my, _RASTER_GRID)
        return pa.table({"pixel_id": pa.array(py * _RASTER_GRID + px)})

    from ray.data.aggregate import Count

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).groupby(
        "pixel_id"
    ).aggregate(Count(alias_name="n"))


def _sql_raster_pixel_counts() -> str:
    g = _RASTER_GRID
    mx, my = _mercator_sql("lon", "lat")
    px = f"cast(least(greatest(floor(({mx}) * {g}.0), 0.0), {g - 1}.0) as bigint)"
    py = f"cast(least(greatest(floor(({my}) * {g}.0), 0.0), {g - 1}.0) as bigint)"
    return f"""
    WITH pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events)
    SELECT ({py}) * {g} + ({px}) AS pixel_id, count(*) AS n FROM pts GROUP BY pixel_id
    """


def q_sessionize(sf_dir: str):
    """Gap-based sessionization per user (30-min inactivity gap): the
    canonical streaming-shaped stateful operator.

    Scale shape (r5 rewrite): groupby(user).map_groups invoked a Python
    callback per USER; now one user-hash part exchange (a user's events
    land wholly in one part) and a single vectorized kernel per part —
    lexsort((t, user)), per-user event counts via segment boundaries, and
    session count = 1 + within-user count of gaps > 1800 s.  Same output,
    no per-group Python at any scale (the same rewrite as
    q_running_totals; engine rule in BASELINE.md r5)."""
    from ..sources.synth import _splitmix64

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    n_parts = int(max(8, min(4096, _table_rows_meta(sf_dir, "events") // 200_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64) // 1_000_000
        return pa.table(
            {
                "user_id": pa.array(uid),
                "t": pa.array(t),
                "part": pa.array(
                    (_splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_sessions": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
        }
    )

    def sessions_part(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return _empty
        uid = tb["user_id"].to_numpy(zero_copy_only=False)
        t = tb["t"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, uid))
        uid, t = uid[order], t[order]
        new = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new)
        n_events = np.diff(np.r_[starts, len(uid)])
        # gap breaks count only within a user: mask out segment boundaries
        brk = np.r_[False, (np.diff(t) > 1800) & (uid[1:] == uid[:-1])].astype(np.int64)
        n_sessions = 1 + np.add.reduceat(brk, starts)
        return pa.table(
            {
                "user_id": pa.array(uid[new]),
                "n_sessions": pa.array(n_sessions.astype(np.int64)),
                "n_events": pa.array(n_events.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(sessions_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_sessionize() -> str:
    return """
    WITH e AS (SELECT user_id, epoch(ts) AS t FROM events),
    o AS (SELECT user_id, t,
                 CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL THEN 1
                      WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 1800 THEN 1
                      ELSE 0 END AS brk
          FROM e)
    SELECT user_id, cast(sum(brk) as bigint) AS n_sessions, count(*) AS n_events
    FROM o GROUP BY user_id
    """


def q_parts_by_brand(sf_dir: str):
    """Groupby over part: count, total retail cents, total size."""
    ds = _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])

    def prep(b: pa.Table) -> pa.Table:
        price = b["p_retailprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_brand": b["p_brand"],
                "size": pa.array(b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)),
                "cents": pa.array(np.floor(price * 100.0).astype(np.int64)),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Sum("cents", alias_name="retail_cents"),
            Sum("size", alias_name="sum_size"),
        )
    )


def _sql_parts_by_brand() -> str:
    return """
    SELECT p_brand, count(*) AS n_parts,
           cast(sum(cast(floor(p_retailprice * 100.0) as bigint)) as bigint) AS retail_cents,
           cast(sum(cast(p_size as bigint)) as bigint) AS sum_size
    FROM part GROUP BY p_brand
    """


def q_supplier_balance(sf_dir: str):
    """supplier ⋈ nation broadcast join + per-nation account balance."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name = nation.set_index("n_nationkey")["n_name"]

    def join(b: pa.Table) -> pa.Table:
        nk = b["s_nationkey"].to_numpy(zero_copy_only=False)
        bal = b["s_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_name": pa.array(n2name.reindex(nk).to_numpy(dtype=object), pa.string()),
                "bal_cents": pa.array(np.floor(bal * 100.0).astype(np.int64)),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(join, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_name")
        .aggregate(Sum("bal_cents", alias_name="bal_cents"), Count(alias_name="n_suppliers"))
    )


def _sql_supplier_balance() -> str:
    return """
    SELECT n_name,
           cast(sum(cast(floor(s_acctbal * 100.0) as bigint)) as bigint) AS bal_cents,
           count(*) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    """


# ---------------------------------------------------------------------------
# documents: dedup + text analytics
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition by content, keep min doc_id per text.

    Scale shape (r5 rewrite): Ray's sort-based groupby compared multi-KB
    TEXT keys through the whole exchange (the r4 engine rule — never
    feed a Ray groupby a string sort key — applied to its last holdout).
    The exchange key is now an int64 content-hash part (all copies of a
    text share it, so a text's group is complete within one part); the
    in-part pandas C-hash groupby runs on the FULL text, so exactness
    never relies on hash collision-freedom.  The text column rides the
    exchange once either way (it is the group identity); only the sort
    comparisons changed."""
    from ..sources.synth import _splitmix64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_parts = int(max(8, min(4096, _table_rows_meta(sf_dir, "documents") // 100_000 + 1)))

    def prep(df: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_pandas_object(df["text"], index=False).to_numpy(np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "text": pa.array(df["text"], pa.string()),
                "part": pa.array((_splitmix64(h) % np.uint64(n_parts)).astype(np.int64)),
            }
        )

    _empty = pa.table(
        {"keep_doc_id": pa.array([], pa.int64()), "n_copies": pa.array([], pa.int64())}
    )

    def dedup_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return _empty
        g = df.groupby("text", sort=False)["doc_id"].agg(["min", "count"])
        return pa.table(
            {
                "keep_doc_id": pa.array(g["min"].to_numpy(np.int64)),
                "n_copies": pa.array(g["count"].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pandas")
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(dedup_part, batch_format="pandas", batch_size=None)
    )


def _sql_dedup_exact() -> str:
    return "SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies FROM documents GROUP BY text"


def q_token_counts(sf_dir: str):
    """Whitespace token counting (text.token_count_whitespace)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_tokens": text_f.token_count_whitespace(df["text"])}
        )

    return ds.map_batches(counts, batch_format="pandas")


def _sql_token_counts() -> str:
    return r"""
    SELECT doc_id,
           CASE WHEN regexp_replace(text, '^\s+|\s+$', '', 'g') = '' THEN 0
                ELSE array_length(regexp_split_to_array(regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
           END AS n_tokens
    FROM documents
    """


def q_doc_stats(sf_dir: str):
    """Integer quality signals per doc: chars, digits, uppercase letters."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": t.str.len().astype(np.int64),
                "n_digits": t.str.count(r"\d").astype(np.int64),
                "n_upper": t.str.count(r"[A-Z]").astype(np.int64),
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


def _sql_doc_stats() -> str:
    return r"""
    SELECT doc_id,
           length(text) AS n_chars,
           length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
           length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper
    FROM documents
    """


def q_lang_counts(sf_dir: str):
    """Language-id distribution via the declared lang column (the heuristic
    detector is covered by q_langid_detect, rows-only)."""
    ds = _read(sf_dir, "documents", ["lang"])
    from ray.data.aggregate import Count

    return ds.groupby("lang").aggregate(Count(alias_name="n"))


def _sql_lang_counts() -> str:
    return "SELECT lang, count(*) AS n FROM documents GROUP BY lang"


# ---------------------------------------------------------------------------
# embeddings: similarity search
# ---------------------------------------------------------------------------


def q_ann_cosine_top5(sf_dir: str):
    """Brute-force cosine top-5 for the 3 lowest vec_ids over all
    embeddings (blocked matmul vs broadcast query matrix + merge)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = (
        emb.filter(expr="vec_id < 3")
        .to_pandas()
        .sort_values("vec_id")
    )
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qids = qdf["vec_id"].to_numpy(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        vecs = np.stack(b["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = qn @ vn.T
        kk = min(5, sims.shape[1])
        qi, vi, sc = [], [], []
        for q in range(len(qn)):
            part = np.argpartition(-sims[q], kk - 1)[:kk]
            qi.append(np.full(kk, qids[q]))
            vi.append(ids[part])
            sc.append(sims[q][part])
        return pa.table(
            {
                "query_vec_id": pa.array(np.concatenate(qi).astype(np.int64)),
                "vec_id": pa.array(np.concatenate(vi).astype(np.int64)),
                "sim": pa.array(np.concatenate(sc)),
            }
        )

    parts = emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    order = np.lexsort((parts.vec_id.to_numpy(), -parts.sim.to_numpy(), parts.query_vec_id.to_numpy()))
    p = parts.iloc[order]
    top = p.groupby("query_vec_id", sort=True).head(5).copy()
    top["rank"] = top.groupby("query_vec_id").cumcount().astype(np.int64)
    return pa.table(
        {
            "query_vec_id": pa.array(top.query_vec_id.to_numpy(np.int64)),
            "vec_id": pa.array(top.vec_id.to_numpy(np.int64)),
            "rank": pa.array(top["rank"].to_numpy(np.int64)),
        }
    )


def _sql_ann_cosine_top5() -> str:
    return """
    WITH qs AS (SELECT vec_id AS query_vec_id, embedding AS qe FROM embeddings WHERE vec_id < 3),
    ranked AS (
      SELECT q.query_vec_id, e.vec_id,
             row_number() OVER (
               PARTITION BY q.query_vec_id
               ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id
             ) - 1 AS rank
      FROM qs q CROSS JOIN embeddings e)
    SELECT query_vec_id, vec_id, rank FROM ranked WHERE rank < 5
    """


def q_embedding_label_centroid_norms(sf_dir: str):
    """Per-label aggregate over vector column: count + floor(1e6 * mean of
    first component) — exercises list-column aggregation."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def first_comp(b: pa.Table) -> pa.Table:
        vecs = b["embedding"]
        first = pa.compute.list_element(vecs, 0)
        return pa.table({"label": b["label"], "c0": first})

    from ray.data.aggregate import Count, Sum

    def to_micro(b: pa.Table) -> pa.Table:
        c0 = b["c0"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"label": b["label"], "c0_micro": pa.array(np.floor(c0 * 1e6).astype(np.int64))}
        )

    return (
        ds.map_batches(first_comp, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(to_micro, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .aggregate(Count(alias_name="n"), Sum("c0_micro", alias_name="sum_c0_micro"))
    )


def _sql_embedding_label() -> str:
    return """
    SELECT label, count(*) AS n,
           cast(sum(cast(floor(cast(embedding[1] as double) * 1000000.0) as bigint)) as bigint) AS sum_c0_micro
    FROM embeddings GROUP BY label
    """


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_tile_bbox_z6(sf_dir: str):
    """Per-tile bounding box of tile-local coords @ z=6 — the reference's
    max-extent aggregate G5 (MvtUtils.java:119-123) widened to min/max both
    axes (an SQL-checkable Min/Max groupby over the assign kernel)."""
    from ray.data.aggregate import Count, Max, Min

    ds = _events_points(sf_dir)

    def assign(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        tx, ty, lx, ly = S.tile_local_coords(lon, lat, 6, 4096)
        tid = S.pack_tile_id(6, tx, ty)
        return pa.table(
            {"tile_id": pa.array(tid), "loc_x": pa.array(lx.astype(np.int64)), "loc_y": pa.array(ly.astype(np.int64))}
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tile_id")
        .aggregate(
            Count(alias_name="n"),
            Min("loc_x", alias_name="min_x"),
            Max("loc_x", alias_name="max_x"),
            Min("loc_y", alias_name="min_y"),
            Max("loc_y", alias_name="max_y"),
        )
    )


def _sql_tile_bbox_z6() -> str:
    n = 1 << 6
    mx, my = _mercator_sql("lon", "lat")
    tx = f"cast(least(greatest(floor(({mx}) * {n}.0), 0.0), {n - 1}.0) as bigint)"
    ty = f"cast(least(greatest(floor(({my}) * {n}.0), 0.0), {n - 1}.0) as bigint)"
    lx = f"cast(least(greatest(floor((({mx}) * {n}.0 - ({tx})) * 4096.0), 0.0), 4095.0) as bigint)"
    ly = f"cast(least(greatest(floor((({my}) * {n}.0 - ({ty})) * 4096.0), 0.0), 4095.0) as bigint)"
    return f"""
    WITH pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    locs AS (SELECT {_tile_sql(6)} AS tile_id, {lx} AS loc_x, {ly} AS loc_y FROM pts)
    SELECT tile_id, count(*) AS n, min(loc_x) AS min_x, max(loc_x) AS max_x,
           min(loc_y) AS min_y, max(loc_y) AS max_y
    FROM locs GROUP BY tile_id
    """



_U64 = "CAST('18446744073709551616' AS HUGEINT)"
_S63 = "(CAST(1 AS HUGEINT) << 63)"

# unicode code points of a string, as HUGEINTs (SQL mirror of the python
# kernels' char iteration)
_CPS = "list_transform(regexp_extract_all({col}, '(?s).'), c -> CAST(unicode(c) AS HUGEINT))"


def _sql_doc_fingerprints() -> str:
    # mirrors functions/text.py fingerprint_poly (h = h*1000003 + cp) and
    # token_count_bpe (lookahead-free equivalent of the GPT-2-ish splitter
    # for single-space ASCII corpora)
    cps = _CPS.format(col="text")
    return f"""
    SELECT doc_id,
           CAST(CASE WHEN fp >= {_S63} THEN fp - {_U64} ELSE fp END AS BIGINT) AS fingerprint,
           n_bpe_tokens
    FROM (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), {cps}),
                         (acc, b) -> (acc * 1000003 + b) % {_U64}) AS fp,
             CAST(len(regexp_extract_all(text,
                 '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^ A-Za-zÀ-ÿ0-9]+')) AS BIGINT)
               AS n_bpe_tokens
      FROM documents)
    """


def _sql_simhash_fp_cte() -> str:
    """Shared CTE chain mirroring functions/dedup.simhash over fnv1a token
    hashes, ending at ``fpa(doc_id, f)`` — the u64 fingerprint as HUGEINT
    for EVERY document (token-less docs get 0, like the numpy kernel).
    Used by _sql_simhash_docs and _sql_simhash_neardup."""
    cps = _CPS.format(col="tok")
    return f"""tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), s -> s <> '')) AS tok
      FROM documents
    ), th AS (
      SELECT doc_id,
             list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), {cps}),
                         (acc, b) -> (xor(acc, b) * 1099511628211) % {_U64}) AS h
      FROM tok
    ), votes AS (
      SELECT doc_id, bits.b AS b,
             SUM(CASE WHEN (h // (CAST(1 AS HUGEINT) << bits.b)) % 2 = 1 THEN 1 ELSE -1 END) AS v
      FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) bits
      GROUP BY doc_id, bits.b
    ), fp AS (
      SELECT doc_id,
             SUM(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << b ELSE CAST(0 AS HUGEINT) END) AS f
      FROM votes GROUP BY doc_id
    ), fpa AS (
      SELECT d.doc_id, coalesce(f, CAST(0 AS HUGEINT)) AS f
      FROM documents d LEFT JOIN fp USING (doc_id)
    )"""


def _sql_simhash_docs() -> str:
    return f"""
    WITH {_sql_simhash_fp_cte()}
    SELECT doc_id,
           CAST(CASE WHEN f >= {_S63} THEN f - {_U64} ELSE f END AS BIGINT) AS simhash
    FROM fpa
    """


def _sql_simhash_neardup() -> str:
    """SQL mirror of rows_only.q_simhash_neardup: 4x16-bit bands of the
    shared fingerprint, bucket cap by lowest doc_id, distinct a<b
    candidates, exact 64-bit hamming via bit_count(xor) <= 3."""
    from .rows_only import MAX_LSH_BUCKET, SIMHASH_BANDS, SIMHASH_HAMMING_MAX

    return f"""
    WITH {_sql_simhash_fp_cte()}, m AS (
      SELECT doc_id, bands.band AS band,
             (f // (CAST(1 AS HUGEINT) << (16 * bands.band))) % 65536 AS key,
             f
      FROM fpa CROSS JOIN (SELECT unnest(range({SIMHASH_BANDS})) AS band) bands
    ), mem AS (
      SELECT * FROM (
        SELECT doc_id, band, key, f,
               row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
        FROM m)
      WHERE rn <= {MAX_LSH_BUCKET}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.f AS fa, b.f AS fb
      FROM mem a JOIN mem b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= {SIMHASH_HAMMING_MAX}
    """


_EN_STOP = "'the','of','and','to','in','a','is','that','it','was','for','on','are','with','as','be','at','by','this'"
_DE_STOP = "'der','die','das','und','ist','nicht','ein','eine','zu','mit','von','auf','für','den','im','sich','des'"
_FR_STOP = "'le','la','les','de','des','et','un','une','est','pour','dans','que','qui','sur','pas','au','avec'"
_ES_STOP = "'el','la','los','las','de','y','un','una','es','en','que','no','por','con','para','su','al','se'"
_IT_STOP = "'il','la','le','di','e','un','una','è','che','in','non','per','con','del','si','da','sono'"


def _sql_quality_scores() -> str:
    # mirrors functions/text.py quality_score (single-op double divisions
    # are IEEE-identical between duckdb and numpy)
    return f"""
    WITH base AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(list_filter(string_split(text, ' '), s -> s <> '')) AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(text, '[A-Za-zÀ-ÿ]')) AS BIGINT) AS n_alpha,
             CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS BIGINT) AS n_punct,
             CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
             CAST(len(list_filter(string_split(lower(text), ' '),
                                  w -> w IN ({_EN_STOP}))) AS BIGINT) AS n_stop
      FROM documents)
    SELECT doc_id, n_chars, n_words,
           n_alpha / GREATEST(n_chars, 1) AS alpha_ratio,
           n_punct / GREATEST(n_chars, 1) AS punct_ratio,
           n_digit / GREATEST(n_chars, 1) AS digit_ratio,
           n_stop / GREATEST(n_words, 1) AS stopword_ratio,
           CASE WHEN n_words > 0
                THEN (n_chars - GREATEST(n_words - 1, 0)) / n_words
                ELSE 0.0 END AS mean_word_len
    FROM base
    """


def _sql_langid_detect() -> str:
    # mirrors functions/text.py detect_language (argmax ties resolve in
    # profile order en,de,fr,es,it; all-zero scores -> 'und')
    return f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '[A-Za-zÀ-ÿ]+|[0-9]+|[^\\sA-Za-zÀ-ÿ0-9]') AS ws
      FROM documents
    ), scores AS (
      SELECT doc_id,
             len(list_filter(ws, w -> w IN ({_EN_STOP}))) AS s_en,
             len(list_filter(ws, w -> w IN ({_DE_STOP}))) AS s_de,
             len(list_filter(ws, w -> w IN ({_FR_STOP}))) AS s_fr,
             len(list_filter(ws, w -> w IN ({_ES_STOP}))) AS s_es,
             len(list_filter(ws, w -> w IN ({_IT_STOP}))) AS s_it
      FROM toks
    ), det AS (
      SELECT doc_id,
             CASE WHEN GREATEST(s_en, s_de, s_fr, s_es, s_it) = 0 THEN 'und'
                  WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_it THEN 'en'
                  WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_it THEN 'de'
                  WHEN s_fr >= s_es AND s_fr >= s_it THEN 'fr'
                  WHEN s_es >= s_it THEN 'es'
                  ELSE 'it' END AS detected
      FROM scores)
    SELECT detected, count(*) AS n FROM det GROUP BY detected
    """


def _sql_phash_dedup(sf: float = 0.01) -> str:
    # The image corpus is a deterministic synthesized parquet cache
    # (sources/synth.py images_parquet_path) — not one of the driver's
    # pre-registered views — so the oracle reads the SAME parquet files
    # the Ray query reads.  __ray_entry__.oracle_sql() ensures the sf0.01
    # cache exists before handing this string to DuckDB.
    from ..sources import synth

    return f"""
    SELECT phash, MIN(image_id) AS keep_image_id, COUNT(*) AS n_copies
    FROM read_parquet('{synth.images_dir(sf)}/*.parquet')
    GROUP BY phash
    """


def _sql_geo_grid_dbscan(sf: float = 0.01) -> str:
    """SQL mirror of rows_only.q_geo_grid_dbscan: same 0.5-degree grid and
    core threshold; connected components via a recursive transitive-closure
    CTE seeded with (cid, cid) so singleton core cells keep their label."""
    from ..sources import synth
    from .rows_only import DBSCAN_CELL_DEG, DBSCAN_MIN_PTS

    return f"""
    WITH RECURSIVE pts AS (
      SELECT CAST(floor(lon / {DBSCAN_CELL_DEG!r}) AS BIGINT) AS cx,
             CAST(floor(lat / {DBSCAN_CELL_DEG!r}) AS BIGINT) AS cy
      FROM read_parquet('{synth.images_dir(sf)}/*.parquet')
    ), cells AS (
      SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS c FROM pts GROUP BY cx, cy
    ), core AS (
      SELECT (cx + 360) * 1024 + (cy + 180) AS cid, cx, cy, c
      FROM cells WHERE c >= {DBSCAN_MIN_PTS}
    ), edges AS (
      SELECT a.cid AS u, b.cid AS v
      FROM core a JOIN core b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 AND a.cid <> b.cid
    ), reach(u, v) AS (
      SELECT cid, cid FROM core
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ), lbl AS (
      SELECT u AS cid, MIN(v) AS cluster_id FROM reach GROUP BY u
    )
    SELECT l.cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(c.c) AS BIGINT) AS n_points
    FROM lbl l JOIN core c USING (cid)
    GROUP BY l.cluster_id
    """


def _phash_pair_ctes(sf: float) -> str:
    """The shared CTE chain of the phash near-dup oracle, ending in
    pairs(img_a, img_b, hamming): the stored int64 phash wraps to u64
    HUGEINT, splits into 4x16-bit band keys, bucket cap by lowest
    image_id (binary collation = numpy object-array sort for the ASCII
    ids), distinct a<b candidates, exact hamming via
    bit_count(xor) <= 3 — same construction as _sql_simhash_neardup but
    over the synthesized image-corpus parquet like _sql_phash_dedup.
    Used by _sql_phash_neardup (the pair list) and
    _sql_image_phash_clusters (connected components over the pairs)."""
    from ..sources import synth
    from .rows_only import MAX_LSH_BUCKET, SIMHASH_BANDS, SIMHASH_HAMMING_MAX

    return f"""img AS (
      SELECT image_id,
             CAST(phash AS HUGEINT)
             + CASE WHEN phash < 0 THEN {_U64} ELSE CAST(0 AS HUGEINT) END AS f
      FROM read_parquet('{synth.images_dir(sf)}/*.parquet')
    ), m AS (
      SELECT image_id, bands.band AS band,
             (f // (CAST(1 AS HUGEINT) << (16 * bands.band))) % 65536 AS key,
             f
      FROM img CROSS JOIN (SELECT unnest(range({SIMHASH_BANDS})) AS band) bands
    ), mem AS (
      SELECT * FROM (
        SELECT image_id, band, key, f,
               row_number() OVER (PARTITION BY band, key ORDER BY image_id) AS rn
        FROM m)
      WHERE rn <= {MAX_LSH_BUCKET}
    ), cand AS (
      SELECT DISTINCT a.image_id AS img_a, b.image_id AS img_b,
                      a.f AS fa, b.f AS fb
      FROM mem a JOIN mem b
        ON a.band = b.band AND a.key = b.key AND a.image_id < b.image_id
    ), pairs AS (
      SELECT img_a, img_b, CAST(bit_count(xor(fa, fb)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(fa, fb)) <= {SIMHASH_HAMMING_MAX}
    )"""


def _sql_phash_neardup(sf: float = 0.01) -> str:
    """SQL mirror of rows_only.q_phash_neardup (see _phash_pair_ctes)."""
    return f"""
    WITH {_phash_pair_ctes(sf)}
    SELECT img_a, img_b, hamming FROM pairs
    """


def _sql_image_phash_clusters(sf: float = 0.01) -> str:
    """SQL mirror of rows_only.q_image_phash_clusters: the shared phash
    pair CTEs, then connected components via a recursive
    transitive-closure CTE — cluster_id = lexically smallest image_id
    reachable (fixed-width ids: lexical == numeric), keep = 1 iff the
    image IS its cluster id."""
    return f"""
    WITH RECURSIVE {_phash_pair_ctes(sf)}, edges AS (
      SELECT img_a AS u, img_b AS v FROM pairs
      UNION
      SELECT img_b, img_a FROM pairs
    ), reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS image_id,
           least(u, min(v)) AS cluster_id,
           CAST(u = least(u, min(v)) AS BIGINT) AS keep
    FROM reach GROUP BY u ORDER BY image_id
    """


def _sql_lsh_bucket_expr(col: str = "embedding") -> str:
    """The inlined single-table hyperplane-LSH bucket expression.

    Seeded hyperplanes (functions/ann.hyperplane_lsh_params, seed 11,
    12 bits) inline as DOUBLE[] literals: the testdata embedding dim is
    fixed at 64 (TESTDATA.md), and float32 plane values are exactly
    representable in DOUBLE, so DuckDB's sequential list_dot_product and
    numpy's float64 matmul agree on every projection sign (min |proj| in
    the corpora ~1e-6 vs ~1e-13 summation-order noise).  Shared by
    _sql_ann_lsh_buckets and _sql_ann_recall_eval."""
    from ..functions import ann as ann_f

    planes = ann_f.hyperplane_lsh_params(64, num_bits=12).astype(np.float64)
    terms = []
    for j, p in enumerate(planes):
        lit = "[" + ",".join("%.17g" % v for v in p) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({col}::DOUBLE[], {lit}) > 0"
            f" THEN {1 << j} ELSE 0 END)"
        )
    return "\n         + ".join(terms)


def _sql_ann_lsh_buckets() -> str:
    return f"""
    SELECT ({_sql_lsh_bucket_expr()}) AS bucket, count(*) AS n
    FROM embeddings
    GROUP BY 1
    """


def _sql_embedding_neardup() -> str:
    # The Ray side's block-pair join is an execution strategy for exact
    # all-pairs cosine >= 0.4; the oracle states the semantics directly.
    # Both sides quantize in float64 (floor boundaries sit >= 3e-3 away
    # from every corpus value).
    return """
    WITH p AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS s
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, CAST(floor(s * 1000.0) AS BIGINT) AS sim_x1000
    FROM p WHERE s >= 0.4
    """


def _sql_embedding_neardup_lsh(n_vecs: int = 500) -> str:
    """SQL mirror of rows_only.q_embedding_neardup_lsh: the seeded
    hyperplanes inlined as DOUBLE[] literals (the ann_lsh technique — sign
    agreement proven there), bucket membership capped at 512 by lowest
    vec_id, distinct a<b candidates per (table, bucket), exact cosine in
    DOUBLE on candidates only, floor(s*1000) quantization.

    Table width derives from ``n_vecs`` through the SAME
    rows_only.neardup_lsh_num_bits helper the Ray side uses (ADVICE r4:
    a fixed 6-bit oracle diverged at sf0.1's 2000-row table, where the
    data-derived width is 7).  The registration default n_vecs=500 is the
    driver's sf0.01/sf0.001 embeddings row count; corpus_sql rebuilds with
    the actual count for other scales."""
    from ..functions import ann as ann_f
    from .rows_only import MAX_LSH_BUCKET, NEARDUP_LSH_TABLES, neardup_lsh_num_bits

    num_bits = neardup_lsh_num_bits(n_vecs)
    sels = []
    for t in range(NEARDUP_LSH_TABLES):
        planes = ann_f.hyperplane_lsh_params(64, num_bits=num_bits, seed=11 + t).astype(
            np.float64
        )
        terms = []
        for j, p in enumerate(planes):
            lit = "[" + ",".join("%.17g" % v for v in p) + "]::DOUBLE[]"
            terms.append(
                f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0"
                f" THEN {1 << j} ELSE 0 END)"
            )
        sels.append("(" + "\n         + ".join(terms) + f") AS b{t}")
    sel = ",\n      ".join(sels)
    case = " ".join(f"WHEN {t} THEN b{t}" for t in range(NEARDUP_LSH_TABLES))
    tbls = ",".join(f"({t})" for t in range(NEARDUP_LSH_TABLES))
    return f"""
    WITH bk AS (
      SELECT vec_id,
      {sel}
      FROM embeddings
    ), m AS (
      SELECT vec_id, t.tbl, CASE t.tbl {case} END AS bucket
      FROM bk CROSS JOIN (VALUES {tbls}) AS t(tbl)
    ), mem AS (
      SELECT * FROM (
        SELECT vec_id, tbl, bucket,
               row_number() OVER (PARTITION BY tbl, bucket ORDER BY vec_id) AS rn
        FROM m)
      WHERE rn <= {MAX_LSH_BUCKET}
    ), cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM mem a JOIN mem b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    ), p AS (
      SELECT c.vec_a, c.vec_b,
             list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS s
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.vec_a
      JOIN embeddings eb ON eb.vec_id = c.vec_b)
    SELECT vec_a, vec_b, CAST(floor(s * 1000.0) AS BIGINT) AS sim_x1000
    FROM p WHERE s >= 0.4
    """


def q_vocab_topk(sf_dir: str):
    """Vocabulary build: top-100 corpus tokens (lowercased, split on the
    space character like the dedup tokenizer) by frequency, deterministic
    (count desc, token asc) tie-break.

    Scale shape: a per-batch value_counts COMBINER keeps the exchange at
    distinct-tokens-per-batch; tokens then hash into parts by a
    deterministic siphash (a token lands in exactly ONE part, so per-part
    sums are exact global sums) and each part aggregates its vocab slice
    with one pandas C-hash groupby and emits its local top-100 — the
    driver sees only parts x 100 candidate rows.  A string-keyed Ray
    groupby here measured 49 s at 50k docs (Ray's sort-based aggregate
    crawls on string keys; same finding as q_user_top_event)."""
    from ..sources.synth import _splitmix64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    meta = _read(sf_dir, "documents", ["n_chars"]).sum("n_chars")
    n_parts = int(max(8, min(512, int(meta) // 6 // 2_000_000 + 1)))

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].astype(str).str.lower().str.split(" ").explode()
        toks = toks[toks.notna() & (toks != "")]
        vc = toks.value_counts()
        tok = vc.index.to_numpy(object)
        part = (
            _splitmix64(pd.util.hash_array(tok)) % np.uint64(n_parts)
        ).astype(np.int64)
        # arrow out: pandas-origin blocks put the part sort on a ~10x
        # slower path (measured)
        return pa.table(
            {
                "tok": pa.array(tok, pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
                "part": pa.array(part),
            }
        )

    def part_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        df = pd.DataFrame(
            {
                "tok": t["tok"].to_numpy(zero_copy_only=False),
                "n": t["n"].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("tok", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "tok"], ascending=[False, True]).head(100)
        return pa.table(
            {
                "tok": pa.array(g["tok"].to_numpy(object), pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    top = (
        ds.map_batches(partial, batch_format="pandas")
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(part_topk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .to_pandas()  # bounded: parts x 100 candidate rows
    )
    top = top.sort_values(["n", "tok"], ascending=[False, True]).head(100)
    return pa.table(
        {
            "tok": pa.array(top["tok"].astype(str)),
            "n": pa.array(top["n"].to_numpy(np.int64)),
        }
    )


def _sql_vocab_topk() -> str:
    return """
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '), s -> s <> '')) AS tok
      FROM documents
    )
    SELECT tok, CAST(count(*) AS BIGINT) AS n
    FROM toks GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 100
    """


# per-language training-mix keep rates (x1000) for the deterministic sampler
_SAMPLE_RATE_X1000 = {"en": 500, "zh": 250, "es": 250, "de": 100, "fr": 100}
_FIB64 = 11400714819323198485  # 2^64 / golden ratio (Fibonacci hashing)


def q_stratified_sample(sf_dir: str):
    """Deterministic per-stratum (language) Bernoulli sample: keep a doc
    iff (doc_id * FIB64 mod 2^64) < rate(lang)/1000 * 2^64.

    A pure column-pruned map — no shuffle, no RNG state, reproducible
    under any partitioning, block structure, retry or cluster size (the
    property a 100-TB training-mix sampling stage needs; seeded per-worker
    RNGs are NOT retry-stable)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    unit = (2**64) // 1000  # rate_x1000 * unit < 2^64, fits uint64

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].to_numpy(np.int64).astype(np.uint64) * np.uint64(_FIB64)
        thr = (
            df["lang"].map(_SAMPLE_RATE_X1000).fillna(0).to_numpy(np.uint64)
            * np.uint64(unit)
        )
        return df.loc[h < thr, ["doc_id", "lang"]]

    return ds.map_batches(keep, batch_format="pandas")


def _sql_stratified_sample() -> str:
    rates = " ".join(
        f"WHEN '{lang}' THEN {r}" for lang, r in _SAMPLE_RATE_X1000.items()
    )
    unit = (2**64) // 1000
    return f"""
    SELECT doc_id, lang FROM documents
    WHERE (CAST(doc_id AS HUGEINT) * {_FIB64}) % {_U64}
          < CAST(CASE lang {rates} ELSE 0 END AS HUGEINT) * {unit}
    """


def _sql_lsh_cand_cte() -> str:
    """Shared DuckDB CTE chain mirroring rows_only._lsh_candidates: the
    deterministic uint64 LSH pipeline recomputed with the HUGEINT wrap
    technique proven for simhash/fingerprints.

    FNV-1a token hashes -> k=5 shingle polynomial (wrapping u64) -> distinct
    shingles (``shd``) -> 64 minhash perms ((h*a + b) mod 2^61-1, wrapping
    mult — seeded params inlined as literals like the ann_lsh planes) ->
    16-band FNV band keys (xor/mult wrap, band salt, >>1) -> bucket cap 512
    by lowest doc_id -> distinct a<b candidate pairs (``cand``).  Used by
    both _sql_minhash_lsh_pairs and _sql_neardup_verified."""
    from ..functions.dedup import _minhash_params

    a, b = _minhash_params(64)
    perm_rows = ",\n        ".join(
        f"({p}, CAST('{int(a[p])}' AS HUGEINT), CAST('{int(b[p])}' AS HUGEINT))"
        for p in range(64)
    )
    m = 1099511628211  # FNV prime, also the shingle/band polynomial mult
    cps = _CPS.format(col="t")
    fnv_tok = (
        f"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), {cps}),"
        f" (acc, cb) -> (xor(acc, cb) * {m}) % {_U64})"
    )
    # 5-token shingle polynomial, wrapping u64 at each mult/add like numpy
    sh = "hs[i]"
    for j in range(1, 5):
        sh = f"(({sh} * {m}) % {_U64} + hs[i+{j}]) % {_U64}"
    return f"""toks AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), s -> s <> '') AS ts
      FROM documents
    ), th AS (
      SELECT doc_id, list_transform(ts, t -> {fnv_tok}) AS hs FROM toks
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(hs) = 0 THEN []::HUGEINT[]
                  WHEN len(hs) < 5 THEN [hs[1]]
                  ELSE list_transform(range(1, len(hs) - 3), i -> {sh})
             END AS shs
      FROM th
    ), shd AS (
      SELECT DISTINCT doc_id, unnest(shs) AS s FROM sh
    ), perms AS (
      SELECT * FROM (VALUES
        {perm_rows}
      ) AS t(p, a, b)
    ), sig AS (
      SELECT doc_id, p,
             MIN(((s * a) % {_U64} + b) % {_U64} % CAST('2305843009213693951' AS HUGEINT)) AS s
      FROM shd CROSS JOIN perms GROUP BY doc_id, p
    ), sigf AS (
      -- shingle-less docs keep the uint64-max fill value in every slot
      SELECT d.doc_id, pr.p,
             coalesce(s.s, CAST('18446744073709551615' AS HUGEINT)) AS s
      FROM documents d CROSS JOIN perms pr
      LEFT JOIN sig s ON s.doc_id = d.doc_id AND s.p = pr.p
    ), bandsig AS (
      SELECT doc_id, p // 4 AS band, list(s ORDER BY p) AS ss
      FROM sigf GROUP BY doc_id, p // 4
    ), keys AS (
      SELECT doc_id, band,
             xor(list_reduce(list_prepend(CAST(1469598103934665603 AS HUGEINT), ss),
                             (acc, v) -> (xor(acc, v) * {m}) % {_U64}),
                 (band * CAST('11400714819323198485' AS HUGEINT)) % {_U64}) // 2 AS key
      FROM bandsig
    ), members AS (
      SELECT * FROM (
        SELECT doc_id, band, key,
               row_number() OVER (PARTITION BY band, key ORDER BY doc_id) AS rn
        FROM keys)
      WHERE rn <= 512
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM members a JOIN members b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )"""


def _sql_minhash_lsh_pairs() -> str:
    """SQL mirror of rows_only.q_minhash_lsh_pairs (VERDICT r2 #6): the
    shared LSH candidate chain, then the signature-agreement estimate
    (eq*100)//64, kept at eq >= 32 (est >= 0.5)."""
    return f"""
    WITH {_sql_lsh_cand_cte()}, est AS (
      SELECT c.doc_a, c.doc_b, count(*) FILTER (WHERE sa.s = sb.s) AS eq
      FROM cand c
      JOIN sigf sa ON sa.doc_id = c.doc_a
      JOIN sigf sb ON sb.doc_id = c.doc_b AND sb.p = sa.p
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b, CAST((eq * 100) // 64 AS BIGINT) AS est_x100
    FROM est WHERE eq >= 32
    """


def _sql_neardup_verified() -> str:
    """SQL mirror of rows_only.q_neardup_verified (round-3 promotion): the
    shared LSH candidate chain, then EXACT word-5-shingle Jaccard per
    candidate pair over the very ``shd`` shingle sets the signatures were
    built from (dedup.ngram_jaccard recomputes shingle_hashes, which ``shd``
    mirrors exactly).  Scoring replicates the float semantics of
    ``int(jx * 100) if jx >= 0.5`` bit-for-bit: IEEE double divide then
    trunc; a pair of shingle-less docs is jaccard 1.0 by definition."""
    return f"""
    WITH {_sql_lsh_cand_cte()}, cnt AS (
      SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS i
      FROM cand c
      JOIN shd sa ON sa.doc_id = c.doc_a
      JOIN shd sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
      GROUP BY c.doc_a, c.doc_b
    ), jac AS (
      SELECT c.doc_a, c.doc_b, coalesce(i.i, 0) AS i,
             coalesce(ca.n, 0) + coalesce(cb.n, 0) - coalesce(i.i, 0) AS u
      FROM cand c
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      LEFT JOIN cnt ca ON ca.doc_id = c.doc_a
      LEFT JOIN cnt cb ON cb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b,
           CAST(trunc(CASE WHEN u = 0 THEN 100.0
                           ELSE CAST(i AS DOUBLE) / u * 100.0 END) AS BIGINT)
             AS jac_x100
    FROM jac
    WHERE CASE WHEN u = 0 THEN 1.0 ELSE CAST(i AS DOUBLE) / u END >= 0.5
    """


def _sql_neardup_clusters() -> str:
    """SQL mirror of rows_only.q_neardup_clusters: the shared LSH candidate
    chain + the exact-Jaccard verify (same CTEs as _sql_neardup_verified),
    then connected components via a recursive transitive-closure CTE —
    cluster_id = min doc id reachable in the verified-pair graph, keep = 1
    iff the doc IS its cluster id (the canonical survivor)."""
    return f"""
    WITH RECURSIVE {_sql_lsh_cand_cte()}, cnt AS (
      SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS i
      FROM cand c
      JOIN shd sa ON sa.doc_id = c.doc_a
      JOIN shd sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
      GROUP BY c.doc_a, c.doc_b
    ), jac AS (
      SELECT c.doc_a, c.doc_b, coalesce(i.i, 0) AS i,
             coalesce(ca.n, 0) + coalesce(cb.n, 0) - coalesce(i.i, 0) AS u
      FROM cand c
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      LEFT JOIN cnt ca ON ca.doc_id = c.doc_a
      LEFT JOIN cnt cb ON cb.doc_id = c.doc_b
    ), ver AS (
      SELECT doc_a, doc_b FROM jac
      WHERE CASE WHEN u = 0 THEN 1.0 ELSE CAST(i AS DOUBLE) / u END >= 0.5
    ), edges AS (
      SELECT doc_a AS u, doc_b AS v FROM ver
      UNION
      SELECT doc_b, doc_a FROM ver
    ), reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc_id,
           least(u, min(v)) AS cluster_id,
           CAST(u = least(u, min(v)) AS BIGINT) AS keep
    FROM reach GROUP BY u ORDER BY doc_id
    """


# ---------------------------------------------------------------------------
# temporal joins + windows + quantiles (round-3 additions: the brief's
# "as-of join, range join, windowed aggregate" custom-operator list)
# ---------------------------------------------------------------------------

# events carry 2024 timestamps while orders span 1995-2001, so the as-of
# axis is a deterministic per-event date derived from event_id (the same
# house pattern as the derived lon/lat above): epoch-day 9131 is
# DATE '1995-01-01', and the multiplicative hash spreads events across the
# 2500-day order horizon.
_ASOF_DAY0 = 9131
_ASOF_SPAN = 2500


def _asof_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-key as-of merge: for each event row (side=0) pick the order row
    (side=1) with the greatest t <= event t, ties broken by greatest rid.
    Separated from the query closure so edge cases (no orders in the
    group, all-order group) are unit-testable."""
    side = g["side"].to_numpy()
    t = g["t"].to_numpy()
    rid = g["rid"].to_numpy()
    om = side == 1
    ot, oid = t[om], rid[om]
    order = np.lexsort((oid, ot))  # ascending (t, rid): searchsorted-right
    ot, oid = ot[order], oid[order]  # lands on max rid among the max t
    et, eid = t[~om], rid[~om]
    if len(ot) == 0 or len(et) == 0:
        return pd.DataFrame(
            {
                "event_id": np.array([], dtype=np.int64),
                "order_key": np.array([], dtype=np.int64),
                "order_day": np.array([], dtype=np.int64),
            }
        )
    idx = np.searchsorted(ot, et, side="right") - 1
    m = idx >= 0
    return pd.DataFrame(
        {
            "event_id": eid[m].astype(np.int64),
            "order_key": oid[idx[m]].astype(np.int64),
            "order_day": ot[idx[m]].astype(np.int64),
        }
    )


def q_asof_join(sf_dir: str):
    """Distributed AS-OF join (events -> latest order at-or-before the
    event's derived as-of date, per user/customer key).

    Scale shape: both sides are tagged into a common (key, t, rid, side)
    schema, unioned, and co-partitioned with ONE hash shuffle on the join
    key; each group does a vectorized sort + searchsorted merge.  The
    partitioning assumption (documented per the brief's custom-operator
    rule) is that a single key's history fits in one group — for hot keys
    the scale path is time-range salting with boundary handoff of the
    last order per range."""
    ev = _read(sf_dir, "events", ["event_id", "user_id"])

    def ev_side(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        ad = _ASOF_DAY0 + (eid * 2654435761) % _ASOF_SPAN
        return pa.table(
            {
                "key": b["user_id"],
                "t": pa.array(ad.astype(np.int64)),
                "rid": b["event_id"],
                "side": pa.array(np.zeros(len(eid), np.int64)),
            }
        )

    od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def od_side(b: pa.Table) -> pa.Table:
        d = (
            b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        return pa.table(
            {
                "key": b["o_custkey"],
                "t": pa.array(d),
                "rid": b["o_orderkey"],
                "side": pa.array(np.ones(len(d), np.int64)),
            }
        )

    # r5: per-key map_groups replaced by a key-hash part exchange + one
    # vectorized merge per part.  Keys dense-rank within the part; both
    # sides map to a segment-composite axis comp = rank * SPAN + (t - t0)
    # (SPAN > the part's t-range, so probes cannot cross keys); orders
    # sort ascending (comp, rid) and searchsorted-right lands each event
    # on the greatest (t, rid) order with t <= event t.  A hit in a
    # foreign segment (event's key has no orders at-or-before) is masked
    # by comparing the matched order's key rank.  Same rewrite family as
    # q_running_totals (BASELINE.md r5).
    from ..sources.synth import _splitmix64

    n_rows = _table_rows_meta(sf_dir, "events") + _table_rows_meta(sf_dir, "orders")
    n_parts = int(max(8, min(4096, n_rows // 200_000 + 1)))

    def add_part(b: pa.Table) -> pa.Table:
        key = b["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "part", pa.array((_splitmix64(key) % np.uint64(n_parts)).astype(np.int64))
        )

    _empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "order_key": pa.array([], pa.int64()),
            "order_day": pa.array([], pa.int64()),
        }
    )

    def asof_part(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return _empty
        key = tb["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = tb["t"].to_numpy(zero_copy_only=False)
        rid = tb["rid"].to_numpy(zero_copy_only=False).astype(np.int64)
        side = tb["side"].to_numpy(zero_copy_only=False)
        _uk, rank = np.unique(key, return_inverse=True)
        t0 = t.min()
        span = int(t.max()) - int(t0) + 2
        if (len(_uk)) * span >= (1 << 62):  # pragma: no cover — overflow guard
            import pandas as _pd

            return pa.Table.from_pandas(
                _pd.concat(
                    [
                        _asof_group(g)
                        for _, g in _pd.DataFrame(
                            {"key": key, "t": t, "rid": rid, "side": side}
                        ).groupby("key", sort=False)
                    ],
                    ignore_index=True,
                ),
                preserve_index=False,
            )
        comp = rank.astype(np.int64) * np.int64(span) + (t - t0)
        om = side == 1
        oc, oid, orank = comp[om], rid[om], rank[om]
        o_order = np.lexsort((oid, oc))
        oc, oid, orank = oc[o_order], oid[o_order], orank[o_order]
        ot = t[om][o_order]
        ec, eid, erank = comp[~om], rid[~om], rank[~om]
        if len(oc) == 0 or len(ec) == 0:
            return _empty
        idx = np.searchsorted(oc, ec, side="right") - 1
        m = (idx >= 0) & (orank[np.maximum(idx, 0)] == erank)
        return pa.table(
            {
                "event_id": pa.array(eid[m].astype(np.int64)),
                "order_key": pa.array(oid[idx[m]].astype(np.int64)),
                "order_day": pa.array(ot[idx[m]].astype(np.int64)),
            }
        )

    both = ev.map_batches(ev_side, batch_format="pyarrow", zero_copy_batch=True).union(
        od.map_batches(od_side, batch_format="pyarrow", zero_copy_batch=True)
    )
    return (
        both.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(asof_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_asof_join() -> str:
    return f"""
    WITH e AS (SELECT event_id, user_id,
                      {_ASOF_DAY0} + (event_id * 2654435761) % {_ASOF_SPAN} AS ad
               FROM events),
    j AS (SELECT e.event_id, o.o_orderkey,
                 cast(epoch(o.o_orderdate) as bigint) // 86400 AS od,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          FROM e JOIN orders o ON o.o_custkey = e.user_id
               AND cast(epoch(o.o_orderdate) as bigint) // 86400 <= e.ad)
    SELECT event_id, o_orderkey AS order_key, od AS order_day FROM j WHERE rn = 1
    """


_FOLLOW_WINDOW_US = 7_200 * 1_000_000  # 2-hour range-join window


def _followups_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-user range self-join count: for each event, how many same-user
    events fall strictly after it within the window.  Vectorized two-sided
    searchsorted over the sorted timestamp vector — O(n log n) per group
    instead of the O(n^2) nested-loop range join."""
    t = g["t"].to_numpy()
    eid = g["event_id"].to_numpy()
    ts = np.sort(t)
    n_follow = np.searchsorted(ts, t + _FOLLOW_WINDOW_US, side="right") - np.searchsorted(
        ts, t, side="right"
    )
    return pd.DataFrame(
        {"event_id": eid.astype(np.int64), "n_follow": n_follow.astype(np.int64)}
    )


def q_range_join_followups(sf_dir: str):
    """Range (interval) self-join: per event, the count of same-user events
    in (ts, ts + 2h].  One hash shuffle on user_id; per-group work is a
    sort + two searchsorteds.  Partitioning assumption: one user's events
    fit in a group; hot users would be salted by day with a 2h boundary
    overlap shipped to the next salt."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    # r5: per-user map_groups replaced by a user-hash part exchange + ONE
    # pair of searchsorteds per part over a segment-composite axis: rows
    # sort by (user, t) and map to comp = seg * SPAN + (t - t_min) with
    # SPAN > t-range + window, so a window probe can never cross into the
    # next user's segment and a single global searchsorted answers every
    # per-user range count.  Falls back to the per-segment loop only if
    # seg * SPAN would overflow int64 (never at sane part sizes — parts
    # are ~200k rows and SPAN is the part's own time range).
    from ..sources.synth import _splitmix64

    n_parts = int(max(8, min(4096, _table_rows_meta(sf_dir, "events") // 200_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        t = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "t": pa.array(t),
                "part": pa.array((_splitmix64(uid) % np.uint64(n_parts)).astype(np.int64)),
            }
        )

    _empty = pa.table(
        {"event_id": pa.array([], pa.int64()), "n_follow": pa.array([], pa.int64())}
    )

    def follow_part(tb: pa.Table) -> pa.Table:
        if tb.num_rows == 0:
            return _empty
        uid = tb["user_id"].to_numpy(zero_copy_only=False)
        t = tb["t"].to_numpy(zero_copy_only=False)
        eid = tb["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, uid))
        uid, t, eid = uid[order], t[order], eid[order]
        new = np.r_[True, uid[1:] != uid[:-1]]
        seg = np.cumsum(new) - 1
        t0 = t.min()
        span = int(t.max()) - int(t0) + _FOLLOW_WINDOW_US + 2
        if (int(seg[-1]) + 1) * span < (1 << 62):
            comp = seg * np.int64(span) + (t - t0)
            # right-side both probes (NOT arange+1): duplicate timestamps
            # within a user must all see the same "rows <= t" count,
            # matching _followups_group's semantics
            n_follow = np.searchsorted(comp, comp + _FOLLOW_WINDOW_US, side="right") - (
                np.searchsorted(comp, comp, side="right")
            )
        else:  # pragma: no cover — overflow guard
            n_follow = np.empty(len(t), np.int64)
            for s in range(int(seg[-1]) + 1):
                sl = slice(*np.searchsorted(seg, [s, s + 1]))
                ts = t[sl]
                n_follow[sl] = np.searchsorted(ts, ts + _FOLLOW_WINDOW_US, side="right") - (
                    np.searchsorted(ts, ts, side="right")
                )
        return pa.table(
            {
                "event_id": pa.array(eid.astype(np.int64)),
                "n_follow": pa.array(n_follow.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(follow_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_range_join_followups() -> str:
    return """
    SELECT e1.event_id, count(e2.event_id) AS n_follow
    FROM events e1 LEFT JOIN events e2
      ON e2.user_id = e1.user_id AND e2.ts > e1.ts
         AND e2.ts <= e1.ts + INTERVAL 7200 SECOND
    GROUP BY e1.event_id
    """


def _running_group(g: pd.DataFrame) -> pd.DataFrame:
    """Per-customer cumulative window: orders sorted by (date, key), cents
    integer-ized BEFORE the cumsum so the running total is exact integer
    arithmetic on both engines (float cumsum order would not hash-match)."""
    day = g["day"].to_numpy()
    okey = g["o_orderkey"].to_numpy()
    cents = g["cents"].to_numpy()
    order = np.lexsort((okey, day))
    run = np.cumsum(cents[order])
    n = len(order)
    return pd.DataFrame(
        {
            "o_orderkey": okey[order].astype(np.int64),
            "o_custkey": np.full(n, int(g["o_custkey"].iloc[0]), dtype=np.int64),
            "rn": np.arange(1, n + 1, dtype=np.int64),
            "run_cents": run.astype(np.int64),
        }
    )


def q_running_totals(sf_dir: str):
    """Cumulative windowed aggregate (SUM ... OVER (PARTITION BY customer
    ORDER BY date)): per-customer running spend.

    Scale shape (r5 rewrite, from the 5x sweep's 3.06x ratio — VERDICT r4
    #7): groupby(cust).map_groups invoked a Python callback per CUSTOMER
    (~n_cust small pandas frames), so per-group overhead scaled with
    customer count.  Now ONE customer-hash part exchange (a customer's
    rows land wholly in one part) and a single vectorized kernel per
    ~200k-row part: lexsort((okey, day, cust)) + segment-cumsum (global
    cumsum minus per-segment base) + segment-relative arange for rn —
    no per-group Python at any scale.  Part count sizes from parquet
    footer metadata (no probe execution)."""
    from ..sources.synth import _splitmix64

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    n_parts = int(max(8, min(4096, _table_rows_meta(sf_dir, "orders") // 200_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        d = (
            b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        p = b["o_totalprice"].to_numpy(zero_copy_only=False)
        cust = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "day": pa.array(d),
                "cents": pa.array(np.floor(p * 100.0).astype(np.int64)),
                "part": pa.array(
                    (_splitmix64(cust.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "o_custkey": pa.array([], pa.int64()),
            "rn": pa.array([], pa.int64()),
            "run_cents": pa.array([], pa.int64()),
        }
    )

    def run_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        cust = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = t["day"].to_numpy(zero_copy_only=False)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, day, cust))
        cust, day, okey, cents = cust[order], day[order], okey[order], cents[order]
        n = len(cust)
        new = np.r_[True, cust[1:] != cust[:-1]]
        starts = np.flatnonzero(new)
        seg_len = np.diff(np.r_[starts, n])
        run = np.cumsum(cents)
        base = np.repeat(np.r_[np.int64(0), run[starts[1:] - 1]], seg_len)
        rn = np.arange(n, dtype=np.int64) - np.repeat(starts, seg_len) + 1
        return pa.table(
            {
                "o_orderkey": pa.array(okey),
                "o_custkey": pa.array(cust),
                "rn": pa.array(rn),
                "run_cents": pa.array((run - base).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(run_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_running_totals() -> str:
    return """
    WITH c AS (SELECT o_orderkey, o_custkey, o_orderdate,
                      cast(floor(o_totalprice * 100.0) as bigint) AS cents
               FROM orders)
    SELECT o_orderkey, o_custkey,
           row_number() OVER w AS rn,
           cast(sum(cents) OVER w as bigint) AS run_cents
    FROM c
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING)
    """


_QUANTILES = (0.5, 0.9, 0.99)


_PQ_SHIFT = 14  # 16384-cent coarse buckets: ~700 buckets over the price
# domain so pass-1 partials stay a few-k rows per block (>>8 left 121k
# groups and a 2.5M-row partial stream — the groupby WAS the query)


def _cents_rank_search(ds, flag_col: str, price_col: str, ranks_fn, value_fn=None):
    """Generic EXACT two-pass rank search: for each flag group, fetch the
    integer cent value at a set of 1-based ranks over floor(price*100).

    ``ranks_fn(n) -> iterable[int]`` maps a group's row count to the
    wanted ranks.  ``value_fn(cents, codes, flags)`` optionally maps the
    raw cent values to the ranked quantity (e.g. |cents - median[flag]|
    for MAD); it must be deterministic and integer-valued.  Returns
    ``(totals: {flag: n}, at: {flag: {rank: value}})``.

    Scale shape (shared by price_quantiles / price_percentiles_interp):
    prices are near-unique, so a (flag, cents) value histogram is ~the
    table itself — the one-pass form measured 12.2 s on a 30M-row
    lineitem and its driver pull grew with row count.  Pass 1 ships a
    coarse histogram (cents >> _PQ_SHIFT, ~700 buckets, dictionary-encoded
    flag packed with the bucket into one int64 np.unique key per batch);
    the driver locates each target rank's bucket; pass 2 re-scans with the
    candidate set broadcast and ships exact (flag, cents) counts only for
    rows inside those buckets (~n/700 rows per wanted bucket)."""
    import ray
    from ray.data.aggregate import Sum

    def coarse(b: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(b[flag_col].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        flags = enc.dictionary.to_pylist()
        cents = np.floor(b[price_col].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        if value_fn is not None:
            cents = value_fn(cents, codes, flags)
        key = (codes << np.int64(44)) | (cents >> _PQ_SHIFT)
        uk, cnt = np.unique(key, return_counts=True)
        fl = np.array(flags, object)[(uk >> np.int64(44)).astype(np.int64)]
        return pa.table(
            {
                "flag": pa.array(fl, pa.string()),
                "bucket": pa.array(uk & np.int64((1 << 44) - 1)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    hist_df = (
        ds.map_batches(coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["flag", "bucket"])
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()  # bounded by distinct coarse buckets (domain >> _PQ_SHIFT)
    )

    # per flag: total n; per wanted rank, the bucket holding it plus the
    # residual rank offset inside that bucket
    want: dict[str, dict[int, list[tuple[int, int]]]] = {}
    totals: dict[str, int] = {}
    for flag, grp in hist_df.groupby("flag", sort=True):
        grp = grp.sort_values("bucket")
        counts = grp["n"].to_numpy()
        buckets = grp["bucket"].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])
        totals[flag] = n
        for k in ranks_fn(n):
            k = int(k)
            i = int(np.searchsorted(cum, k, side="left"))
            before = int(cum[i - 1]) if i else 0
            want.setdefault(flag, {}).setdefault(int(buckets[i]), []).append(
                (k, k - before)
            )
    cand_ref = ray.put({f: set(bs) for f, bs in want.items()})

    def sliver(b: pa.Table) -> pa.Table:
        import ray as _ray

        cand = _ray.get(cand_ref)
        enc = pc.dictionary_encode(b[flag_col].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        flags = enc.dictionary.to_pylist()
        cents = np.floor(b[price_col].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        if value_fn is not None:
            cents = value_fn(cents, codes, flags)
        bucket = cents >> _PQ_SHIFT
        keep = np.zeros(len(codes), bool)
        for ci, f in enumerate(flags):
            bs = cand.get(f)
            if bs:
                keep |= (codes == ci) & np.isin(
                    bucket, np.fromiter(bs, np.int64, len(bs))
                )
        key = (codes[keep] << np.int64(44)) | cents[keep]
        uk, cnt = np.unique(key, return_counts=True)
        fl = np.array(flags, object)[(uk >> np.int64(44)).astype(np.int64)]
        return pa.table(
            {
                "flag": pa.array(fl, pa.string()),
                "cents": pa.array(uk & np.int64((1 << 44) - 1)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    sliver_df = (
        ds.map_batches(sliver, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["flag", "cents"])
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()  # bounded by |candidate buckets| x in-bucket values
    )
    at: dict[str, dict[int, int]] = {}
    for flag in sorted(totals):
        fsl = sliver_df[sliver_df["flag"] == flag].sort_values("cents")
        vals = fsl["cents"].to_numpy()
        cnts = fsl["n"].to_numpy()
        bks = vals >> _PQ_SHIFT
        for bucket, picks in want[flag].items():
            inb = bks == bucket
            bvals, bcnts = vals[inb], cnts[inb]
            bcum = np.cumsum(bcnts)
            for k, off in picks:
                at.setdefault(flag, {})[k] = int(
                    bvals[np.searchsorted(bcum, off, side="left")]
                )
    return totals, at


def q_price_quantiles(sf_dir: str):
    """EXACT distributed quantiles of l_extendedprice (cents) per return
    flag via the shared two-pass rank search (_cents_rank_search).  The
    rank convention matches the SQL oracle: value at 1-based rank
    ceil(q*n) per flag."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    totals, at = _cents_rank_search(
        ds,
        "l_returnflag",
        "l_extendedprice",
        # same IEEE expression as the SQL
        lambda n: [int(np.ceil(q * n)) for q in _QUANTILES],
    )
    rows = []
    for flag in sorted(totals):
        n = totals[flag]
        row = {"flag": flag, "n": np.int64(n)}
        for q in _QUANTILES:
            k = int(np.ceil(q * n))
            row[f"p{int(q * 100)}_cents"] = np.int64(at[flag][k])
        rows.append(row)
    cols = ["flag", "n"] + [f"p{int(q * 100)}_cents" for q in _QUANTILES]
    return pd.DataFrame(rows)[cols]


def _sql_price_quantiles() -> str:
    picks = ",\n           ".join(
        f"max(CASE WHEN rn = cast(ceil(CAST({q!r} AS DOUBLE) * n) as bigint) THEN cents END) AS p{int(q * 100)}_cents"
        for q in _QUANTILES
    )
    return f"""
    WITH c AS (SELECT l_returnflag AS flag,
                      cast(floor(l_extendedprice * 100.0) as bigint) AS cents
               FROM lineitem),
    r AS (SELECT flag, cents,
                 row_number() OVER (PARTITION BY flag ORDER BY cents) AS rn,
                 count(*) OVER (PARTITION BY flag) AS n
          FROM c)
    SELECT flag, max(n) AS n,
           {picks}
    FROM r GROUP BY flag
    """


def q_anti_join_customers(sf_dir: str):
    """Broadcast ANTI join: customers with no events.  The distinct key set
    of the big side is reduced FIRST (bounded by user cardinality), shipped
    once via ray.put, and the probe side filters with np.isin — no
    all-to-all shuffle (the VERDICT-r2 #9 broadcast pattern)."""
    import ray

    users = _read(sf_dir, "events", ["user_id"]).unique("user_id")
    users_ref = ray.put(np.asarray(users, dtype=np.int64))

    def anti(b: pa.Table) -> pa.Table:
        import ray as _ray

        uset = _ray.get(users_ref)
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(ck, uset)
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "c_custkey": pa.array(ck[keep].astype(np.int64)),
                "acctbal_cents": pa.array(np.floor(bal * 100.0).astype(np.int64)),
            }
        )

    return _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        anti, batch_format="pyarrow", zero_copy_batch=True
    )


def _sql_anti_join_customers() -> str:
    return """
    SELECT c_custkey, cast(floor(c_acctbal * 100.0) as bigint) AS acctbal_cents
    FROM customer WHERE c_custkey NOT IN (SELECT user_id FROM events)
    """


_TOPK_ORDERS = 3


def q_topk_orders_per_customer(sf_dir: str):
    """Per-group top-k (the 3 most expensive orders per customer, price
    desc / orderkey asc tie-break, with ranks).

    Scale shape: a per-batch partial top-k COMBINER bounds the
    groupby(o_custkey) exchange at k rows per (customer x batch) — the
    classic window-rank query without shipping every order row through
    the shuffle; the in-group final pick is one vectorized sort."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].to_numpy(zero_copy_only=False),
                "o_orderkey": b["o_orderkey"].to_numpy(zero_copy_only=False),
                "cents": np.floor(
                    b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
                ).astype(np.int64),
            }
        )
        df = df.sort_values(["o_custkey", "cents", "o_orderkey"], ascending=[True, False, True])
        return pa.Table.from_pandas(
            df.groupby("o_custkey", sort=False).head(_TOPK_ORDERS), preserve_index=False
        )

    # r5: the final per-customer pick ran as map_groups (one Python
    # callback per customer).  Now a customer-hash part exchange + one
    # lexsort per part: rank = position within the (cust) segment of the
    # (cents desc, okey asc) order, keep rank <= k.  Same rewrite family
    # as q_running_totals (BASELINE.md r5).
    from ..sources.synth import _splitmix64

    n_parts = int(max(8, min(4096, _table_rows_meta(sf_dir, "orders") // 200_000 + 1)))

    def add_part(b: pa.Table) -> pa.Table:
        cust = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "part", pa.array((_splitmix64(cust) % np.uint64(n_parts)).astype(np.int64))
        )

    _empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "o_orderkey": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "rk": pa.array([], pa.int64()),
        }
    )

    def final_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        cust = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, -cents, cust))
        cust, okey, cents = cust[order], okey[order], cents[order]
        new = np.r_[True, cust[1:] != cust[:-1]]
        starts = np.flatnonzero(new)
        seg_len = np.diff(np.r_[starts, len(cust)])
        rk = np.arange(len(cust), dtype=np.int64) - np.repeat(starts, seg_len) + 1
        keep = rk <= _TOPK_ORDERS
        return pa.table(
            {
                "o_custkey": pa.array(cust[keep]),
                "o_orderkey": pa.array(okey[keep]),
                "cents": pa.array(cents[keep]),
                "rk": pa.array(rk[keep]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(final_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_topk_orders_per_customer() -> str:
    return f"""
    WITH c AS (SELECT o_custkey, o_orderkey,
                      cast(floor(o_totalprice * 100.0) as bigint) AS cents
               FROM orders),
    r AS (SELECT o_custkey, o_orderkey, cents,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY cents DESC, o_orderkey) AS rk
          FROM c)
    SELECT o_custkey, o_orderkey, cents, rk FROM r WHERE rk <= {_TOPK_ORDERS}
    """


def q_orders_rollup(sf_dir: str):
    """Hierarchical aggregate (GROUP BY ROLLUP(status, priority)): order
    count + spend at the (status, priority), (status) and grand-total
    levels, 'ALL' standing in for the rolled-up dimension.

    Scale shape: the FINE groupby is the only cluster exchange; the two
    coarser levels re-aggregate its result — a table bounded by the
    dimension cardinality product (|status| x |priority| rows), never a
    rescan of the fact table."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "status": b["o_orderstatus"],
                "priority": b["o_orderpriority"],
                "cents": pa.array(
                    np.floor(b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(
                        np.int64
                    )
                ),
            }
        )

    fine = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["status", "priority"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="spend_cents"))
        .to_pandas()  # bounded by |status| x |priority|
    )
    mid = fine.groupby("status", as_index=False)[["n", "spend_cents"]].sum()
    mid["priority"] = "ALL"
    top = pd.DataFrame(
        {
            "status": ["ALL"],
            "priority": ["ALL"],
            "n": [fine["n"].sum()],
            "spend_cents": [fine["spend_cents"].sum()],
        }
    )
    out = pd.concat([fine, mid, top], ignore_index=True)[
        ["status", "priority", "n", "spend_cents"]
    ]
    out["n"] = out["n"].astype(np.int64)
    out["spend_cents"] = out["spend_cents"].astype(np.int64)
    return out


def _sql_orders_rollup() -> str:
    return """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cast(floor(o_totalprice * 100.0) as bigint)) AS BIGINT) AS spend_cents
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """


# deterministic train/val/test assignment: permille buckets.  The second
# multiplier is the 40-bit FNV prime (not a 64-bit splitmix constant) so the
# oracle's HUGEINT mirror of (u64 h) * mult stays under 2^127 — same wrap
# technique as the LSH CTE's FNV chain.
_SPLIT_MULT2 = 1099511628211
_SPLIT_TRAIN, _SPLIT_VAL = 980, 990  # <980 train, <990 val, else test


def q_train_split(sf_dir: str):
    """Deterministic train/val/test split assignment (98/1/1 permille by a
    two-round multiply-xorshift hash of doc_id), reported as per-language
    split counts.

    Like stratified_sample this is retry-, partitioning- and cluster-size
    stable (no RNG state) — the property a resumable 100-TB corpus split
    needs; the groupby exchange carries |lang| x 3 combiner rows."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h = df["doc_id"].to_numpy(np.int64).astype(np.uint64) * np.uint64(_FIB64)
        h ^= h >> np.uint64(31)
        h *= np.uint64(_SPLIT_MULT2)
        b = (h % np.uint64(1000)).astype(np.int64)
        split = np.where(b < _SPLIT_TRAIN, "train", np.where(b < _SPLIT_VAL, "val", "test"))
        # arrow out: keeps the groupby shuffle off the pandas slow path
        return pa.table({"lang": pa.array(df["lang"].to_numpy(object), pa.string()),
                         "split": pa.array(split, pa.string())})

    return (
        ds.map_batches(assign, batch_format="pandas")
        .groupby(["lang", "split"])
        .aggregate(Count(alias_name="n"))
    )


def _sql_train_split() -> str:
    return f"""
    WITH h1 AS (SELECT lang, (CAST(doc_id AS HUGEINT) * {_FIB64}) % {_U64} AS h
                FROM documents),
    h2 AS (SELECT lang, (xor(h, h // 2147483648) * {_SPLIT_MULT2}) % {_U64} AS h FROM h1),
    b AS (SELECT lang,
                 CASE WHEN h % 1000 < {_SPLIT_TRAIN} THEN 'train'
                      WHEN h % 1000 < {_SPLIT_VAL} THEN 'val'
                      ELSE 'test' END AS split
          FROM h2)
    SELECT lang, split, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY lang, split
    """


_DISTINCTIVE_K = 5


def q_distinctive_terms(sf_dir: str):
    """TF-IDF-style document fingerprinting with EXACT integer ranking:
    the top-5 terms per document ordered by (term frequency desc, corpus
    document frequency asc, token asc) — rarity-weighted without float
    idf, so the oracle comparison is bit-exact.

    Scale shape: pass 1 builds the document-frequency table with a
    per-batch distinct-token combiner feeding one small groupby(tok);
    the result (bounded by vocabulary size) ships once via ray.put.
    Pass 2 is a pure map: each doc's tf + rank computes inside its own
    row, so no per-doc shuffle exists at all.  A vocabulary too big to
    broadcast would swap pass 2's lookup for a hash join on tok —
    documented, not needed at any realistic vocab size."""
    import ray

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.lower().str.split(" ")
        ex = df[["doc_id"]].assign(tok=toks).explode("tok")
        return ex[ex["tok"].notna() & (ex["tok"] != "")]

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = _explode(df).drop_duplicates(["doc_id", "tok"])
        vc = d["tok"].value_counts()
        return pa.table({"tok": pa.array(vc.index.to_numpy(object), pa.string()),
                         "c": pa.array(vc.to_numpy(np.int64))})

    from ray.data.aggregate import Sum

    df_small = (
        ds.map_batches(df_partial, batch_format="pandas")
        .groupby("tok")
        .aggregate(Sum("c", alias_name="df"))
        .to_pandas()  # bounded by vocabulary size
    )
    df_ref = ray.put(
        pd.Series(df_small["df"].to_numpy(np.int64), index=df_small["tok"].astype(str))
    )

    def top_terms(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        dfm = _ray.get(df_ref)
        ex = _explode(df)
        tf = ex.groupby(["doc_id", "tok"], sort=False).size().reset_index(name="tf")
        tf["df"] = tf["tok"].map(dfm).astype(np.int64)
        tf = tf.sort_values(["doc_id", "tf", "df", "tok"], ascending=[True, False, True, True])
        out = tf.groupby("doc_id", sort=False).head(_DISTINCTIVE_K).copy()
        out["rk"] = (out.groupby("doc_id", sort=False).cumcount() + 1).astype(np.int64)
        out["tf"] = out["tf"].astype(np.int64)
        return out

    return ds.map_batches(top_terms, batch_format="pandas")


def _sql_distinctive_terms() -> str:
    return f"""
    WITH ex AS (
      SELECT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), s -> s <> '')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM ex GROUP BY doc_id, tok
    ), dfc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df
      FROM (SELECT DISTINCT doc_id, tok FROM ex) GROUP BY tok
    ), r AS (
      SELECT tf.doc_id, tf.tok, tf.tf, dfc.df,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, dfc.df ASC, tf.tok ASC) AS rk
      FROM tf JOIN dfc USING (tok)
    )
    SELECT doc_id, tok, tf, df, rk FROM r WHERE rk <= {_DISTINCTIVE_K}
    """


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signals per document: token count,
    most-frequent-token fraction and duplicate-bigram fraction (both
    x1000, integer-ized so the oracle comparison is exact).  High values
    flag boilerplate/spam for a training-data filter.

    Pure map over documents — each doc's signals compute inside its own
    row via one exploded-frame pass (no Python loop over tokens, no
    shuffle)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def signals(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.lower().str.split(" ")
        ex = pd.DataFrame({"row": np.repeat(np.arange(len(df)), toks.str.len()),
                           "tok": toks.explode().to_numpy(object)})
        ex = ex[ex["tok"].notna() & (ex["tok"] != "")]
        n_tok = ex.groupby("row").size()
        top = ex.groupby(["row", "tok"], sort=False).size().groupby("row").max()
        nxt_row = ex["row"].shift(-1)
        ex = ex.assign(nxt=ex["tok"].shift(-1))
        bg = ex[ex["row"] == nxt_row]
        n_big = bg.groupby("row").size()
        d_big = bg.drop_duplicates(["row", "tok", "nxt"]).groupby("row").size()

        idx = pd.RangeIndex(len(df))
        n = n_tok.reindex(idx, fill_value=0).to_numpy(np.int64)
        t = top.reindex(idx, fill_value=0).to_numpy(np.int64)
        nb = n_big.reindex(idx, fill_value=0).to_numpy(np.int64)
        db = d_big.reindex(idx, fill_value=0).to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tokens": n,
                "top_tok_x1000": np.where(n > 0, (t * 1000) // np.maximum(n, 1), 0),
                "dup_bigram_x1000": np.where(nb > 0, ((nb - db) * 1000) // np.maximum(nb, 1), 0),
            }
        )

    return ds.map_batches(signals, batch_format="pandas")


def _sql_doc_repetition() -> str:
    return """
    WITH t AS (
      SELECT doc_id, list_filter(string_split(lower(text), ' '), s -> s <> '') AS ts
      FROM documents
    ), tok AS (
      SELECT doc_id, unnest(ts) AS tok FROM t
    ), ntk AS (
      SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
    ), topt AS (
      SELECT doc_id, max(c) AS topc
      FROM (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok)
      GROUP BY doc_id
    ), bge AS (
      SELECT doc_id, unnest(list_transform(range(1, len(ts)), i -> ts[i] || chr(1) || ts[i + 1])) AS bg
      FROM t WHERE len(ts) >= 2
    ), nbg AS (
      SELECT doc_id, count(*) AS nb, count(DISTINCT bg) AS db FROM bge GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(n.n, 0) AS BIGINT) AS n_tokens,
           CAST(CASE WHEN coalesce(n.n, 0) = 0 THEN 0
                     ELSE (tp.topc * 1000) // n.n END AS BIGINT) AS top_tok_x1000,
           CAST(CASE WHEN coalesce(b.nb, 0) = 0 THEN 0
                     ELSE ((b.nb - b.db) * 1000) // b.nb END AS BIGINT) AS dup_bigram_x1000
    FROM documents d
    LEFT JOIN ntk n USING (doc_id)
    LEFT JOIN topt tp USING (doc_id)
    LEFT JOIN nbg b USING (doc_id)
    """


_PACK_BUDGET = 512  # tokens per packed training sequence
_PACK_BUCKET = 4096  # docs per ordered scan bucket (bounds every group)


def q_pack_sequences(sf_dir: str):
    """Concat-and-chunk sequence packing for pretraining: documents
    concatenate in doc_id order within each language and chunk into
    _PACK_BUDGET-token training sequences; each doc reports the sequence
    id and in-sequence offset where it starts.

    The interesting distributed shape is the per-lang EXCLUSIVE PREFIX SUM
    of token counts in doc_id order, computed as a two-phase scan with no
    unbounded group and no driver materialization of doc rows:
      1. bucket = doc_id // _PACK_BUCKET partitions the ID SPACE in order;
         one small groupby((bucket, lang)) sums each bucket's tokens — a
         table bounded by n_buckets x langs that the driver exclusively
         scans and ships back via ray.put (the classic scan-of-block-sums).
      2. groupby(bucket) groups are bounded at _PACK_BUCKET docs; each
         computes its local exclusive cumsum and adds the bucket base.
    The token counting runs once into a slim materialized table (4 int
    cols + lang) feeding both phases."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def count_tokens(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].astype(str).str.lower().str.split(" ")
        ex = pd.DataFrame(
            {
                "row": np.repeat(np.arange(len(df)), s.str.len()),
                "tok": s.explode().to_numpy(object),
            }
        )
        ex = ex[ex["tok"] != ""]
        n = (
            ex.groupby("row")
            .size()
            .reindex(pd.RangeIndex(len(df)), fill_value=0)
            .to_numpy(np.int64)
        )
        doc = df["doc_id"].to_numpy(np.int64)
        # arrow out: this table feeds two shuffles (groupby + map_groups)
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "lang": pa.array(df["lang"].to_numpy(object), pa.string()),
                "n_tokens": pa.array(n),
                "bucket": pa.array(doc // _PACK_BUCKET),
            }
        )

    counted = ds.map_batches(count_tokens, batch_format="pandas").materialize()
    totals = (
        counted.groupby(["bucket", "lang"])
        .aggregate(Sum("n_tokens", alias_name="t"))
        .to_pandas()  # bounded by n_buckets x langs
        .sort_values(["lang", "bucket"])
    )
    totals["base"] = (totals.groupby("lang")["t"].cumsum() - totals["t"]).astype(np.int64)
    base_ref = ray.put(totals[["bucket", "lang", "base"]])

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        bdf = _ray.get(base_ref)
        g = g.sort_values(["lang", "doc_id"]).merge(bdf, on=["bucket", "lang"], how="left")
        local = (g.groupby("lang")["n_tokens"].cumsum() - g["n_tokens"]).to_numpy(np.int64)
        start = local + g["base"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "lang": g["lang"].to_numpy(object),
                "n_tokens": g["n_tokens"].to_numpy(np.int64),
                "seq_id": start // _PACK_BUDGET,
                "seq_offset": start % _PACK_BUDGET,
            }
        )

    return counted.groupby("bucket").map_groups(pack, batch_format="pandas")


def _sql_pack_sequences() -> str:
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split(lower(text), ' '), s -> s <> ''))
                  AS BIGINT) AS n_tokens
      FROM documents
    ), s AS (
      SELECT doc_id, lang, n_tokens,
             coalesce(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
      FROM t
    )
    SELECT doc_id, lang, n_tokens,
           CAST(start_tok // {_PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST(start_tok % {_PACK_BUDGET} AS BIGINT) AS seq_offset
    FROM s
    """


_RETENTION_MAX_WEEKS = 12
_WEEK_US = 7 * 86400 * 1_000_000


def q_events_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by first-activity week, the
    count still active at each week offset (0..12).

    One groupby(user_id) shuffle carries pre-deduplicated (user, week)
    combiner rows; each bounded per-user group derives its cohort week and
    offsets in one pass, and the final count is a small groupby over the
    (cohort x offset) grid."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    # r5: per-user map_groups replaced by a user-hash part exchange (each
    # user's weeks land in one part, so cohort/offset derive locally) +
    # per-part partial counts over the bounded (cohort x offset) grid; the
    # final groupby merges |parts| x grid rows.  Same rewrite family as
    # q_running_totals (BASELINE.md r5).
    from ..sources.synth import _splitmix64

    n_parts = int(max(8, min(4096, _table_rows_meta(sf_dir, "events") // 200_000 + 1)))

    def weeks_part(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wk = us // _WEEK_US
        # pack guard, mirroring q_user_top_event's (ADVICE r4 pattern):
        # a week outside [0, 2^16) or a user outside [0, 2^47) would
        # silently corrupt the dedup key (epoch weeks reach 65536 in
        # year ~3225)
        if len(wk) and (
            wk.min() < 0 or wk.max() >= (1 << 16) or uid.min() < 0 or uid.max() >= (1 << 47)
        ):
            raise ValueError("user_id/week outside packable range for (uid << 16 | week)")
        key = np.unique((uid << np.int64(16)) | wk)
        u_uid = key >> np.int64(16)
        return pa.table(
            {
                "user_id": pa.array(u_uid),
                "week": pa.array(key & np.int64(0xFFFF)),
                "part": pa.array(
                    (_splitmix64(u_uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "cohort_week": pa.array([], pa.int64()),
            "offset": pa.array([], pa.int64()),
            "partial": pa.array([], pa.int64()),
        }
    )

    def count_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        wk = t["week"].to_numpy(zero_copy_only=False)
        order = np.lexsort((wk, uid))
        uid, wk = uid[order], wk[order]
        # cross-batch (user, week) dedup, then per-user cohort/offset
        keep = np.r_[True, (uid[1:] != uid[:-1]) | (wk[1:] != wk[:-1])]
        uid, wk = uid[keep], wk[keep]
        new = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new)
        seg_len = np.diff(np.r_[starts, len(uid)])
        cohort = np.repeat(wk[starts], seg_len)
        off = wk - cohort
        m = off <= _RETENTION_MAX_WEEKS
        key = (cohort[m] << np.int64(8)) | off[m]  # offset <= 12 fits 8 bits
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cohort_week": pa.array(uk >> np.int64(8)),
                "offset": pa.array(uk & np.int64(255)),
                "partial": pa.array(cnt.astype(np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(weeks_part, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(count_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["cohort_week", "offset"])
        .aggregate(Sum("partial", alias_name="n_users"))
    )


def _sql_events_retention() -> str:
    return f"""
    WITH w AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS week FROM events
    ), c AS (
      SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id
    )
    SELECT c.cohort_week, w.week - c.cohort_week AS offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM w JOIN c USING (user_id)
    WHERE w.week - c.cohort_week <= {_RETENTION_MAX_WEEKS}
    GROUP BY c.cohort_week, w.week - c.cohort_week
    """


def q_user_top_event(sf_dir: str):
    """Mode / argmax aggregate: each user's most frequent event type (ties
    to the lexicographically smallest type).

    Scale shape (r5 rewrite — ONE execution of the events read, closing
    VERDICT r4 #1): part count sizes from parquet FOOTER metadata (no
    probe scan) and the type->code dictionary is PER BATCH (sorted
    pd.factorize), so no global distinct pass runs either.  Each batch
    combines packed (user << 8 | local_code) keys with np.unique, then
    unpacks codes back to the type STRINGS for the exchange — the string
    column merely rides the int-keyed part sort on bounded unique-pair
    rows, so the r4 finding (Ray's sort-based aggregate crawls on string
    SORT keys) doesn't apply.  Inside each part a sorted re-factorize +
    np.add.reduceat (int64-exact — ADVICE r4: bincount's float64 weights
    lose exactness above 2^53) fuses the segment sum with the per-user
    argmax; factorize(sort=True) makes code order the lexicographic
    tie-break on both sides.  user_id range is guarded to [0, 2^55) so
    the 8-bit pack cannot silently corrupt keys (ADVICE r4)."""
    from ..sources.synth import _splitmix64

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    n_parts = int(max(8, min(4096, _table_rows_meta(sf_dir, "events") // 200_000 + 1)))

    _UID_MAX = np.int64(1) << np.int64(55)

    def partial(df: pd.DataFrame) -> pa.Table:
        uid = df["user_id"].to_numpy(np.int64)
        if len(uid) and (uid.min() < 0 or uid.max() >= _UID_MAX):
            raise ValueError("user_id outside [0, 2^55): 8-bit pack would corrupt keys")
        code, types = pd.factorize(df["event_type"], sort=True)
        if len(types) > 256:
            raise ValueError(f"event_type domain too wide for 8-bit codes: {len(types)}")
        key = (uid << np.int64(8)) | code.astype(np.int64)
        uk, cnt = np.unique(key, return_counts=True)
        u_uid = uk >> np.int64(8)
        part = (_splitmix64(u_uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u_uid),
                "event_type": pa.array(np.asarray(types, object)[uk & np.int64(255)], pa.string()),
                "c": pa.array(cnt.astype(np.int64)),
                "part": pa.array(part),
            }
        )

    def pick_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_type": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        code, types = pd.factorize(
            pd.Series(t["event_type"].to_numpy(zero_copy_only=False)), sort=True
        )
        if len(types) > 256:
            raise ValueError(f"event_type domain too wide for 8-bit codes: {len(types)}")
        key = (uid << np.int64(8)) | code.astype(np.int64)
        order = np.argsort(key, kind="mergesort")
        key, c = key[order], c[order]
        new = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new)
        n = np.add.reduceat(c, starts)  # int64-exact per (user, code)
        ukey = key[new]
        uid = ukey >> np.int64(8)
        code = ukey & np.int64(255)
        # per-user argmax: sort by (uid, -n, code) and keep first per uid
        o2 = np.lexsort((code, -n, uid))
        uid, code, n = uid[o2], code[o2], n[o2]
        first = np.r_[True, uid[1:] != uid[:-1]]
        return pa.table(
            {
                "user_id": pa.array(uid[first]),
                "event_type": pa.array(np.asarray(types, object)[code[first]], pa.string()),
                "n": pa.array(n[first]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(
            pick_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    )


def _sql_user_top_event() -> str:
    return """
    WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
               FROM events GROUP BY user_id, event_type),
    r AS (SELECT user_id, event_type, n,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY n DESC, event_type) AS rk
          FROM c)
    SELECT user_id, event_type, n FROM r WHERE rk = 1
    """


def q_corr_moments(sf_dir: str):
    """Distributed correlation via EXACT integer moment sums: per return
    flag, corr(l_quantity, floor(l_extendedprice) dollars) computed from
    six integer sums (n, Σq, Σd, Σq², Σd², Σqd) that every batch
    pre-combines — the float expression runs ONCE on the driver from
    exact integers, so both engines produce the bit-identical IEEE value
    (float partial sums would drift with reduce order).  Dollars (not
    cents) keep Σd² within int64 at any realistic scale (1e5² x 1e10
    rows < 2^63)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.floor(b["l_extendedprice"].to_numpy(zero_copy_only=False)).astype(np.int64)
        df = pd.DataFrame({"flag": b["l_returnflag"].to_numpy(zero_copy_only=False)})
        df["n"], df["sq"], df["sd"] = 1, q, d
        df["sqq"], df["sdd"], df["sqd"] = q * q, d * d, q * d
        g = df.groupby("flag", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    m = (
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("flag")
        .aggregate(*[Sum(c, alias_name=c) for c in ["n", "sq", "sd", "sqq", "sdd", "sqd"]])
        .to_pandas()  # bounded by |flag|
        .sort_values("flag")
    )
    import math

    corr = []
    for _, r in m.iterrows():
        n, sq, sd = int(r["n"]), int(r["sq"]), int(r["sd"])
        cov = n * int(r["sqd"]) - sq * sd  # exact python ints (no int64 overflow)
        vq = n * int(r["sqq"]) - sq * sq
        vd = n * int(r["sdd"]) - sd * sd
        corr.append(math.floor(1e6 * (float(cov) / math.sqrt(float(vq) * float(vd)))))
    m["corr_x1e6"] = np.array(corr, dtype=np.int64)
    for c in ["n", "sq", "sd", "sqq", "sdd", "sqd"]:
        m[c] = m[c].astype(np.int64)
    return m.reset_index(drop=True)


def _sql_corr_moments() -> str:
    return """
    WITH c AS (SELECT l_returnflag AS flag,
                      CAST(l_quantity AS BIGINT) AS q,
                      CAST(floor(l_extendedprice) AS BIGINT) AS d
               FROM lineitem),
    m AS (SELECT flag,
                 CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(q) AS HUGEINT) AS sq, CAST(sum(d) AS HUGEINT) AS sd,
                 CAST(sum(q * q) AS HUGEINT) AS sqq,
                 CAST(sum(d * d) AS HUGEINT) AS sdd,
                 CAST(sum(q * d) AS HUGEINT) AS sqd
          FROM c GROUP BY flag)
    SELECT flag,
           CAST(n AS BIGINT) AS n, CAST(sq AS BIGINT) AS sq, CAST(sd AS BIGINT) AS sd,
           CAST(sqq AS BIGINT) AS sqq, CAST(sdd AS BIGINT) AS sdd, CAST(sqd AS BIGINT) AS sqd,
           CAST(floor(1e6 * (CAST(n * sqd - sq * sd AS DOUBLE)
                / sqrt(CAST(n * sqq - sq * sq AS DOUBLE) * CAST(n * sdd - sd * sd AS DOUBLE))))
                AS BIGINT) AS corr_x1e6
    FROM m
    """


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_user_events(sf_dir: str):
    """Pivot aggregate: one row per user with a count column per event
    type (the groupby+FILTER pivot).  Indicator columns are built
    vectorized per batch (one np.equal per type), partial-summed in the
    combiner, and finished by one groupby — the exchange carries
    |users x batches| combiner rows, never events."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": b["user_id"].to_numpy(zero_copy_only=False)})
        for t in _EVENT_TYPES:
            df[f"n_{t}"] = (et == t).astype(np.int64)
        g = df.groupby("user_id", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    # r5: Ray's sort-based Aggregate on the user key replaced by the
    # user-hash part exchange + per-part reduceat merge of the indicator
    # partials (the hex_pyramid rewrite; A/B in BASELINE.md r5)
    from ..sources.synth import _splitmix64

    n_parts = int(max(8, min(4096, _table_rows_meta(sf_dir, "events") // 200_000 + 1)))

    def add_part(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column(
            "part", pa.array((_splitmix64(uid) % np.uint64(n_parts)).astype(np.int64))
        )

    cols = [f"n_{t}" for t in _EVENT_TYPES]
    _empty = pa.table(
        {"user_id": pa.array([], pa.int64()), **{c: pa.array([], pa.int64()) for c in cols}}
    )

    def sum_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="mergesort")
        uid = uid[order]
        new = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new)
        out = {"user_id": pa.array(uid[new].astype(np.int64))}
        for c in cols:
            v = t[c].to_numpy(zero_copy_only=False)[order]
            out[c] = pa.array(np.add.reduceat(v, starts).astype(np.int64))
        return pa.table(out)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(sum_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_pivot_user_events() -> str:
    cols = ",\n           ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in _EVENT_TYPES
    )
    return f"""
    SELECT user_id,
           {cols}
    FROM events GROUP BY user_id
    """


def q_supplier_name_agg(sf_dir: str):
    """Ordered list aggregate (string_agg / collect_list): per nation, the
    comma-joined supplier names in name order.  Bounded per-nation groups
    join their strings vectorized; the one shuffle is the groupby."""
    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_name"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        names = ",".join(sorted(g["s_name"].astype(str)))
        return pd.DataFrame(
            {
                "s_nationkey": [np.int64(g["s_nationkey"].iloc[0])],
                "names": [names],
                "n": [np.int64(len(g))],
            }
        )

    return ds.groupby("s_nationkey").map_groups(agg, batch_format="pandas")


def _sql_supplier_name_agg() -> str:
    return """
    SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
           string_agg(s_name, ',' ORDER BY s_name) AS names,
           CAST(count(*) AS BIGINT) AS n
    FROM supplier GROUP BY s_nationkey
    """


_NTILE_K = 10


def q_order_price_deciles(sf_dir: str):
    """Distributed global NTILE: every order's price decile within its
    priority class (NTILE(10) OVER (PARTITION BY priority ORDER BY cents,
    orderkey)) — the window that normally forces a single sorted pass.

    Two-phase exact rank, nothing driver-side or broadcast scales with
    rows (the earlier form shipped the full near-unique (priority, cents)
    start-rank histogram through ray.put — ~the table at scale):
      1. a COARSE (priority, cents >> _PQ_SHIFT) count histogram (~700
         buckets/priority, np.unique packed-key combiner) gives every
         bucket's exclusive start rank and each priority's total via one
         driver cumsum — a few-k-row table shipped back via ray.put;
      2. rows hash into parts BY COARSE BUCKET (so a bucket never splits);
         each part sorts its rows once by (priority, cents, orderkey) —
         the global order within a bucket — and assigns rank = bucket
         start + in-bucket position, then the NTILE quotient/remainder
         formula — all vectorized."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "priority": b["o_orderpriority"],
                "cents": pa.array(
                    np.floor(b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(
                        np.int64
                    )
                ),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)

    def coarse(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t["priority"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        prios = enc.dictionary.to_pylist()
        bucket = t["cents"].to_numpy(zero_copy_only=False) >> _PQ_SHIFT
        key = (codes << np.int64(44)) | bucket
        uk, cnt = np.unique(key, return_counts=True)
        pr = np.array(prios, object)[(uk >> np.int64(44)).astype(np.int64)]
        return pa.table(
            {
                "priority": pa.array(pr, pa.string()),
                "bucket": pa.array(uk & np.int64((1 << 44) - 1)),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    hdf = (
        prepped.map_batches(coarse, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["priority", "bucket"])
        .aggregate(Sum("c", alias_name="n"))
        .to_pandas()  # bounded: |priorities| x coarse buckets (domain >> 14)
        .sort_values(["priority", "bucket"])
    )
    hdf["start"] = (hdf.groupby("priority")["n"].cumsum() - hdf["n"]).astype(np.int64)
    totals = hdf.groupby("priority")["n"].sum().astype(np.int64)
    lookup_ref = ray.put(
        (hdf[["priority", "bucket", "start"]], dict(zip(totals.index, totals.to_numpy())))
    )
    n_parts = 64

    def add_part(t: pa.Table) -> pa.Table:
        from ..sources.synth import _splitmix64

        # partition key: a (priority, coarse bucket) group must stay in ONE
        # part so its in-bucket sort is the global order.  pd.util.
        # hash_array is a fixed-key siphash — deterministic across batches
        pr = pd.util.hash_array(t["priority"].to_numpy(zero_copy_only=False))
        bucket = (t["cents"].to_numpy(zero_copy_only=False) >> _PQ_SHIFT).astype(np.uint64)
        part = (_splitmix64(bucket ^ pr) % np.uint64(n_parts)).astype(np.int64)
        return t.append_column("part", pa.array(part))

    def rank_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "priority": pa.array([], pa.string()),
                    "cents": pa.array([], pa.int64()),
                    "decile": pa.array([], pa.int64()),
                }
            )
        import ray as _ray

        starts_df, tot = _ray.get(lookup_ref)
        df = pd.DataFrame(
            {
                "o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False),
                "priority": t["priority"].to_numpy(zero_copy_only=False),
                "cents": t["cents"].to_numpy(zero_copy_only=False),
            }
        ).sort_values(["priority", "cents", "o_orderkey"])
        df["bucket"] = df["cents"].to_numpy(np.int64) >> _PQ_SHIFT
        df = df.merge(starts_df, on=["priority", "bucket"], how="left")
        grp = (
            df["priority"].ne(df["priority"].shift())
            | df["bucket"].ne(df["bucket"].shift())
        ).cumsum()
        local = df.groupby(grp.values).cumcount().to_numpy(np.int64)
        rn = df["start"].to_numpy(np.int64) + local + 1  # 1-based global rank
        n = df["priority"].map(tot).to_numpy(np.int64)
        q, r = n // _NTILE_K, n % _NTILE_K
        big = r * (q + 1)
        tile = np.where(
            rn <= big,
            (rn - 1) // np.maximum(q + 1, 1) + 1,
            r + (rn - big - 1) // np.maximum(q, 1) + 1,
        )
        return pa.table(
            {
                "o_orderkey": pa.array(df["o_orderkey"].to_numpy(np.int64)),
                "priority": pa.array(df["priority"].to_numpy(object), pa.string()),
                "cents": pa.array(df["cents"].to_numpy(np.int64)),
                "decile": pa.array(tile.astype(np.int64)),
            }
        )

    return (
        prepped.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(rank_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_order_price_deciles() -> str:
    return f"""
    WITH c AS (SELECT o_orderkey, o_orderpriority AS priority,
                      cast(floor(o_totalprice * 100.0) as bigint) AS cents
               FROM orders)
    SELECT o_orderkey, priority, cents,
           CAST(ntile({_NTILE_K}) OVER (PARTITION BY priority
                                        ORDER BY cents, o_orderkey) AS BIGINT) AS decile
    FROM c
    """


_FUNNEL_WINDOW_DAYS = 7


def q_signup_conversion(sf_dir: str):
    """Funnel / sequence detection: for each user with a signup event, did
    a purchase follow within 7 days of the FIRST signup, and after how
    many whole days?  (converted = 0/1, days_to_convert = -1 if none.)

    One hash co-partition by user (part-exchange), then each part answers
    every user vectorized: segment-min signup ts via sorted first-hit,
    earliest qualifying purchase via searchsorted over the part's
    purchase rows."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))  # metadata count

    def prep(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "signup") | (et == "purchase")
        uid = b["user_id"].to_numpy(zero_copy_only=False)[keep]
        us = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)[keep]
        )
        part = (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "is_signup": pa.array(et[keep] == "signup"),
                "us": pa.array(us),
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "signup_day": pa.array([], pa.int64()),
            "converted": pa.array([], pa.int64()),
            "days_to_convert": pa.array([], pa.int64()),
        }
    )

    def funnel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        sg = t["is_signup"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        # first signup per user: sort (user, ts) over signup rows, take run heads
        s_ord = np.lexsort((us[sg], uid[sg]))
        su, st = uid[sg][s_ord], us[sg][s_ord]
        head = np.r_[True, su[1:] != su[:-1]]
        su, st = su[head], st[head]
        if len(su) == 0:
            return _empty
        # earliest purchase at/after each user's signup: merge_asof forward
        # (vectorized C co-merge — no per-user Python loop)
        sdf = pd.DataFrame({"user_id": su, "st": st}).sort_values("st", kind="stable")
        pdf = pd.DataFrame({"user_id": uid[~sg], "pt": us[~sg]}).sort_values(
            "pt", kind="stable"
        )
        m = pd.merge_asof(
            sdf, pdf, left_on="st", right_on="pt", by="user_id", direction="forward"
        )
        has = m["pt"].notna().to_numpy()
        days = np.where(
            has, (m["pt"].fillna(0).to_numpy(np.int64) - m["st"].to_numpy(np.int64)), -1
        ) // 86_400_000_000
        conv = has & (days <= _FUNNEL_WINDOW_DAYS)
        return pa.table(
            {
                "user_id": pa.array(m["user_id"].to_numpy(np.int64)),
                "signup_day": pa.array(m["st"].to_numpy(np.int64) // 86_400_000_000),
                "converted": pa.array(conv.astype(np.int64)),
                "days_to_convert": pa.array(np.where(conv, days, -1).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(funnel, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_signup_conversion() -> str:
    return f"""
    WITH s AS (
      SELECT user_id, MIN(epoch_us(ts)) AS st FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT s.user_id, s.st, MIN(epoch_us(e.ts)) AS pt
      FROM s JOIN events e ON e.user_id = s.user_id
       AND e.event_type = 'purchase' AND epoch_us(e.ts) >= s.st
      GROUP BY s.user_id, s.st
    )
    SELECT s.user_id,
           s.st // 86400000000 AS signup_day,
           CAST(CASE WHEN p.pt IS NOT NULL
                      AND (p.pt - s.st) // 86400000000 <= {_FUNNEL_WINDOW_DAYS}
                     THEN 1 ELSE 0 END AS BIGINT) AS converted,
           CAST(CASE WHEN p.pt IS NOT NULL
                      AND (p.pt - s.st) // 86400000000 <= {_FUNNEL_WINDOW_DAYS}
                     THEN (p.pt - s.st) // 86400000000 ELSE -1 END AS BIGINT) AS days_to_convert
    FROM s LEFT JOIN p USING (user_id)
    """


def _join_part_key(t: pa.Table):
    """The shared inner-join probe for one hash-co-partitioned part: the
    part's rows carry a bool ``is_build`` and an int64 ``key``; the build
    side is argsorted once and every probe key resolves with one
    searchsorted.  Returns (build_row_idx, probe_row_idx) of the matched
    pairs, or None when either side is empty — used by
    q_order_line_join, q_nation_pagerank and q_local_supplier_revenue so
    the probe edge cases live in exactly one place."""
    isb = t["is_build"].to_numpy(zero_copy_only=False)
    key = t["key"].to_numpy(zero_copy_only=False)
    b_idx = np.flatnonzero(isb)
    p_idx = np.flatnonzero(~isb)
    if len(b_idx) == 0 or len(p_idx) == 0:
        return None
    order = np.argsort(key[b_idx])
    bks = key[b_idx][order]
    pos = np.minimum(np.searchsorted(bks, key[p_idx]), len(bks) - 1)
    found = bks[pos] == key[p_idx]
    return b_idx[order[pos[found]]], p_idx[found]


def q_order_line_join(sf_dir: str):
    """Generic LARGE x LARGE inner hash join (orders x lineitem on
    orderkey), aggregated to revenue per order priority.

    The join is one hash co-partition: both sides tag (part =
    splitmix(orderkey) % P), union, one part-exchange, and each part
    resolves its keys with a vectorized argsort/searchsorted probe — the
    same shape as the pair-payload join, demonstrated here as the
    standalone relational operator.  The aggregate then runs on the
    joined rows with a per-part combiner, so only |priority| x parts
    rows reach the final groupby."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    n_parts = int(max(8, min(4096, lines.count() // 200_000 + 1)))

    def tag_orders(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["o_orderkey"],
                "priority": b["o_orderpriority"],
                "rev_cents": pa.array(np.zeros(len(k), np.int64)),
                "is_build": pa.array(np.ones(len(k), bool)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    def tag_lines(b: pa.Table) -> pa.Table:
        k = b["l_orderkey"].to_numpy(zero_copy_only=False)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)
        return pa.table(
            {
                "key": b["l_orderkey"],
                "priority": pa.array(np.full(len(k), "", object), pa.string()),
                "rev_cents": pa.array(cents),
                "is_build": pa.array(np.zeros(len(k), bool)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {"priority": pa.array([], pa.string()), "rev_cents": pa.array([], pa.int64())}
    )

    def join_part(t: pa.Table) -> pa.Table:
        hit = _join_part_key(t)
        if hit is None:
            return _empty
        b_hit, p_hit = hit
        prio = t["priority"].to_numpy(zero_copy_only=False)[b_hit]
        cents = t["rev_cents"].to_numpy(zero_copy_only=False)[p_hit]
        # per-part combiner: |priority| rows leave the part, not |rows|
        g = pd.DataFrame({"priority": prio, "rev_cents": cents}).groupby(
            "priority", sort=False
        )["rev_cents"].sum()
        return pa.table(
            {
                "priority": pa.array(g.index.to_numpy(object), pa.string()),
                "rev_cents": pa.array(g.to_numpy(np.int64)),
            }
        )

    return (
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
        .union(lines.map_batches(tag_lines, batch_format="pyarrow", zero_copy_batch=True))
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(join_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("priority")
        .aggregate(__import__("ray.data.aggregate", fromlist=["Sum"]).Sum(
            "rev_cents", alias_name="rev_cents"
        ))
    )


def _sql_order_line_join() -> str:
    return """
    SELECT o_orderpriority AS priority,
           CAST(sum(cast(floor(l_extendedprice * (1.0 - l_discount) * 100.0) as bigint))
                AS BIGINT) AS rev_cents
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """


_HLL_P = 10  # 2^10 = 1024 registers
_HLL_M = 1 << _HLL_P


def q_hll_distinct_users(sf_dir: str):
    """Approximate distinct count (HyperLogLog) of event users, with the
    sketch kept INTEGER-EXACT so the oracle comparison is bit-exact: the
    register table (bucket, max rho) and the register power sum
    Σ 2^(54 − rho) are pure integer artifacts of the deterministic
    splitmix hash (rho = trailing zeros + 1, an integer-only form), and
    the final float estimate is one fixed-arity IEEE expression over
    those exact integers — the corr_moments technique applied to a
    sketch aggregate.

    Shape: per-batch register combiner (max per bucket) -> one 1024-row
    groupby MAX -> driver computes the estimate; at 10^12 rows the
    exchange still carries <= batches x 1024 combiner rows."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", ["user_id"])

    def regs(b: pa.Table) -> pa.Table:
        h = synth._splitmix64(b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
        bucket = (h & np.uint64(_HLL_M - 1)).astype(np.int64)
        rest = h >> np.uint64(_HLL_P)
        # rho = trailing zeros of rest + 1 (integer-only): tz = popcount((x & -x) - 1)
        low = rest & (~rest + np.uint64(1))
        tz = np.zeros(len(rest), np.int64)
        nz = low > 0
        tzv = np.log2(low[nz].astype(np.float64)).astype(np.int64)  # exact: low is a power of 2
        tz[nz] = tzv
        rho = np.where(nz, tz + 1, 54).astype(np.int64)
        df = pd.DataFrame({"bucket": bucket, "rho": np.minimum(rho, 54)})
        g = df.groupby("bucket", sort=False)["rho"].max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    reg = (
        ds.map_batches(regs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()  # <= 1024 rows
        .sort_values("bucket", ignore_index=True)
    )
    # exact power sum over ALL m registers (absent bucket -> rho 0 -> 2^54);
    # python int: the sum can exceed int64 (1024 x 2^54 = 2^64)
    pow_sum = sum(1 << (54 - int(r)) for r in reg["rho"]) + (_HLL_M - len(reg)) * (1 << 54)
    import math

    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    # fixed-arity IEEE expression over exact integers, association mirrored
    # by the oracle character-for-character
    est = math.floor(alpha * 1048576.0 * 18014398509481984.0 / float(pow_sum))
    return pd.DataFrame(
        {
            "m_used": [np.int64(len(reg))],
            "pow_hi": [np.int64(pow_sum >> 32)],
            "pow_lo": [np.int64(pow_sum & 0xFFFFFFFF)],
            "estimate": [np.int64(est)],
        }
    )


def _sql_mul64_lo(x: str, c: int) -> str:
    """low64(x * c) for HUGEINT x in [0, 2^64) and a 64-bit constant c —
    the 32-bit limb decomposition keeps every product under 2^65."""
    c_lo, c_hi = c % 2**32, c // 2**32
    return (
        f"((( ({x} // 4294967296) * {c_lo} + ({x} % 4294967296) * {c_hi} ) % 4294967296)"
        f" * 4294967296 + ({x} % 4294967296) * {c_lo}) % {_U64}"
    )


def _sql_splitmix64(v: str) -> str:
    """Exact HUGEINT mirror of sources.synth._splitmix64 (validated
    value-for-value against the numpy kernel)."""
    x = f"((CAST({v} AS HUGEINT) + {0x9E3779B97F4A7C15}) % {_U64})"
    z1 = f"(xor({x}, {x} // {1 << 30}))"
    z2 = f"({_sql_mul64_lo(z1, 0xBF58476D1CE4E5B9)})"
    z3 = f"(xor({z2}, {z2} // {1 << 27}))"
    z4 = f"({_sql_mul64_lo(z3, 0x94D049BB133111EB)})"
    return f"xor({z4}, {z4} // {1 << 31})"


def _sql_hll_distinct_users() -> str:
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    return f"""
    WITH z AS (
      SELECT {_sql_splitmix64("user_id")} AS z FROM events
    ), r AS (
      SELECT CAST(z % {_HLL_M} AS BIGINT) AS bucket, z // {_HLL_M} AS rest FROM z
    ), rh AS (
      SELECT bucket,
             CASE WHEN rest = 0 THEN 54
                  ELSE LEAST(CAST(bit_count((rest & ({_U64} - rest)) - 1) AS BIGINT) + 1, 54)
             END AS rho
      FROM r
    ), reg AS (
      SELECT bucket, MAX(rho) AS rho FROM rh GROUP BY bucket
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS m_used,
             SUM(CAST(1 AS HUGEINT) << (54 - rho)) AS ps FROM reg
    ), tot AS (
      SELECT m_used,
             ps + ({_HLL_M} - m_used) * (CAST(1 AS HUGEINT) << 54) AS pow_sum
      FROM s
    )
    SELECT m_used,
           CAST(pow_sum // 4294967296 AS BIGINT) AS pow_hi,
           CAST(pow_sum % 4294967296 AS BIGINT) AS pow_lo,
           CAST(floor(CAST({alpha!r} AS DOUBLE) * 1048576.0 * 18014398509481984.0
                      / CAST(pow_sum AS DOUBLE)) AS BIGINT) AS estimate
    FROM tot
    """


# ---------------------------------------------------------------------------
# session-5 additions: quadkeys, radius join, hex stencil, exact image dedup
# ---------------------------------------------------------------------------

_QK_Z = 10


def q_quadkey_tiles(sf_dir: str):
    """Bing-style quadkey assignment at z10 (the reference's Bing corpus is
    quadkey-addressed: evaluation/java .../mvt/MvtUtils.java reads Bing
    tiles by z/x/y; quadkeys are the equivalent interleaved addressing) —
    one row per occupied quadkey with its point count.

    Scale shape: digits are pure bit math over the batch (no shuffle until
    the per-batch np.unique combiner has collapsed rows to distinct keys)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id"])

    def assign(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_lonlat(eid)
        tx, ty = S.lonlat_to_tile(lon, lat, _QK_Z)
        tx = tx.astype(np.int64)
        ty = ty.astype(np.int64)
        qk = np.zeros(len(eid), np.int64)
        for i in range(_QK_Z):
            k = _QK_Z - 1 - i
            qk = qk * 10 + (2 * ((ty >> k) & 1) + ((tx >> k) & 1))
        u, c = np.unique(qk, return_counts=True)
        return pa.table({"qk": pa.array(u), "n": pa.array(c.astype(np.int64))})

    counts = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("qk")
        .aggregate(Sum("n", alias_name="n"))
    )

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        qs = df["qk"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "quadkey": [str(v).zfill(_QK_Z) for v in qs],
                "n": df["n"].to_numpy(np.int64),
            }
        )

    return counts.map_batches(fmt, batch_format="pandas")


def _sql_quadkey_tiles() -> str:
    z = _QK_Z
    n = 1 << z
    mx, my = _mercator_sql("lon", "lat")
    tx = f"cast(least(greatest(floor(({mx}) * {n}.0), 0.0), {n - 1}.0) as bigint)"
    ty = f"cast(least(greatest(floor(({my}) * {n}.0), 0.0), {n - 1}.0) as bigint)"
    digits = " || ".join(
        f"CAST((2 * ((ty >> {z - 1 - i}) & 1) + ((tx >> {z - 1 - i}) & 1)) AS VARCHAR)"
        for i in range(z)
    )
    return f"""
    WITH pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    t AS (SELECT {tx} AS tx, {ty} AS ty FROM pts)
    SELECT {digits} AS quadkey, CAST(count(*) AS BIGINT) AS n
    FROM t GROUP BY 1
    """


# radius join: threshold in normalized-mercator plane units (grid-friendly
# and exactly mirrorable in SQL; a km threshold would make the guarantee
# radius lat-dependent under mercator stretch).  0.018 ~ 2000 km at the
# equator — sized so the hash-sampled corpus yields pairs at every sf.
_RADIUS_D = 0.018


def q_geo_radius_join(sf_dir: str):
    """Spatial radius self-join: all pairs of (hash-sampled 1/8) event
    points within euclidean distance D in the normalized mercator plane.

    Scale shape: grid-bucket candidate generation — each point emits to
    the 3x3 neighborhood of its D-sized grid cell, candidates co-locate by
    one part-exchange, and each pair is counted exactly once via the
    (home-cell order, id order) ownership rule.  All-pairs work is bounded
    by local density, never corpus size; the oracle is the O(n^2) join the
    engine must NOT do.  The emitted distance is quantized at 1e9 (not
    finer): numpy and DuckDB libm tan/ln differ in the last ulp, so a
    1e15-scale floor flips on ~1e-3 of pairs — at 1e9 the flip
    probability is ~2e-9 per pair."""
    ds = _read(sf_dir, "events", ["event_id"])
    d = _RADIUS_D
    n_rows = ds.count()
    n_parts = int(max(8, min(4096, (n_rows // 8 * 9) // 50_000 + 1)))

    offs = np.array([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], np.int64)
    is_center = (offs[:, 0] == 0) & (offs[:, 1] == 0)

    def prep(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        eid = eid[synth._splitmix64(eid.astype(np.uint64)) % np.uint64(8) == 0]
        lon, lat = _event_lonlat(eid)
        mx, my = S.mercator_xy(lon, lat)
        cx = np.floor(mx / d).astype(np.int64)
        cy = np.floor(my / d).astype(np.int64)
        home = (cx + 2) * (1 << 32) + (cy + 2)
        k = len(offs)
        cell = (
            (cx[:, None] + offs[None, :, 0] + 2) * (1 << 32)
            + (cy[:, None] + offs[None, :, 1] + 2)
        ).reshape(-1)
        part = (synth._splitmix64(cell.astype(np.uint64)) % np.uint64(n_parts)).astype(
            np.int64
        )
        return pa.table(
            {
                "cell": pa.array(cell),
                "home": pa.array(np.repeat(home, k)),
                "eid": pa.array(np.repeat(eid, k)),
                "mx": pa.array(np.repeat(mx, k)),
                "my": pa.array(np.repeat(my, k)),
                "is_home": pa.array(np.tile(is_center, len(eid))),
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "d2_e9": pa.array([], pa.int64()),
        }
    )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        cell = t["cell"].to_numpy(zero_copy_only=False)
        home = t["home"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        mx = t["mx"].to_numpy(zero_copy_only=False)
        my = t["my"].to_numpy(zero_copy_only=False)
        is_home = t["is_home"].to_numpy(zero_copy_only=False)
        # sort cell-major, home rows first within each cell
        order = np.lexsort((~is_home, cell))
        cell, home, eid, mx, my, is_home = (
            a[order] for a in (cell, home, eid, mx, my, is_home)
        )
        starts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        lens = np.diff(np.r_[starts, len(cell)])
        homes = np.add.reduceat(is_home.astype(np.int64), starts)
        tot = homes * lens
        keep_run = tot > 0
        s, L, H, T = starts[keep_run], lens[keep_run], homes[keep_run], tot[keep_run]
        if len(s) == 0:
            return _empty
        grand = int(T.sum())
        run = np.repeat(np.arange(len(s)), T)
        p = np.arange(grand) - np.repeat(np.r_[0, np.cumsum(T)[:-1]], T)
        a = s[run] + p // L[run]
        b = s[run] + p % L[run]
        m = a != b
        a, b = a[m], b[m]
        ha, hb = home[a], home[b]
        keep = (ha < hb) | ((ha == hb) & is_home[b] & (eid[a] < eid[b]))
        a, b = a[keep], b[keep]
        dx = mx[a] - mx[b]
        dy = my[a] - my[b]
        d2 = dx * dx + dy * dy
        hit = d2 < d * d
        a, b, d2 = a[hit], b[hit], d2[hit]
        lo = np.minimum(eid[a], eid[b])
        hi = np.maximum(eid[a], eid[b])
        return pa.table(
            {
                "id_a": pa.array(lo),
                "id_b": pa.array(hi),
                "d2_e9": pa.array(np.floor(d2 * 1e9).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(pairs, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_geo_radius_join() -> str:
    d = _RADIUS_D
    mx, my = _mercator_sql("lon", "lat")
    return f"""
    WITH s AS (
      SELECT event_id, {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events
      WHERE ({_sql_splitmix64("event_id")}) % 8 = 0
    ), m AS (
      SELECT event_id, {mx} AS mx, {my} AS my FROM s
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           CAST(floor(((a.mx - b.mx) * (a.mx - b.mx)
                       + (a.my - b.my) * (a.my - b.my)) * 1e9) AS BIGINT) AS d2_e9
    FROM m a JOIN m b ON a.event_id < b.event_id
    WHERE (a.mx - b.mx) * (a.mx - b.mx) + (a.my - b.my) * (a.my - b.my) < {d * d!r}
    """


_RING_RES = 5


def q_hex_ring_density(sf_dir: str):
    """Hex-grid stencil / neighborhood smoothing: per occupied res-5 cell,
    its own point count and the total over its k=1 ring (7 cells).

    Scale shape: a grid convolution as two bounded shuffles — per-batch
    np.unique combiner -> groupby sum (distinct cells, not points), then
    each cell fans out 7 stencil contributions (pure int64 math on packed
    ids) into a second groupby.  No point-level data ever re-shuffles."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id"])
    offs = S.k_ring_offsets(1)  # (7, 2) incl. center

    def cnt(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_lonlat(eid)
        cell = S.lonlat_to_hex(lon, lat, _RING_RES)
        u, c = np.unique(cell, return_counts=True)
        return pa.table({"cell": pa.array(u), "n": pa.array(c.astype(np.int64))})

    counts = (
        ds.map_batches(cnt, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
    )

    def stencil(b: pa.Table) -> pa.Table:
        cell = b["cell"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        k = len(offs)
        tgt = (cell[:, None] + offs[None, :, 0] * (1 << 26) + offs[None, :, 1]).reshape(-1)
        contrib = np.repeat(n, k)
        center = np.tile((offs[:, 0] == 0) & (offs[:, 1] == 0), len(cell))
        own = np.where(center, contrib, 0)
        return pa.table(
            {"cell": pa.array(tgt), "contrib": pa.array(contrib), "own": pa.array(own)}
        )

    dens = (
        counts.map_batches(stencil, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cell")
        .aggregate(Sum("contrib", alias_name="ring_n"), Sum("own", alias_name="n"))
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n"] > 0]
        return pd.DataFrame(
            {
                "cell": df["cell"].to_numpy(np.int64),
                "n": df["n"].to_numpy(np.int64),
                "ring_n": df["ring_n"].to_numpy(np.int64),
            }
        )

    return dens.map_batches(fin, batch_format="pandas")


def _sql_hex_ring_density() -> str:
    offs = S.k_ring_offsets(1)
    deltas = ", ".join(str(int(dq) * (1 << 26) + int(dr)) for dq, dr in offs)
    return f"""
    WITH pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    c AS (
      SELECT {_hex_sql(_RING_RES)} AS cell, CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY 1
    ),
    o AS (SELECT unnest([{deltas}]) AS dlt)
    SELECT a.cell, a.n, CAST(SUM(b.n) AS BIGINT) AS ring_n
    FROM c a, o
    JOIN c b ON b.cell = a.cell + o.dlt
    GROUP BY a.cell, a.n
    """


def q_image_exact_dedup(sf_dir: str):
    """Exact byte-level image dedup over the image corpus: one row per
    duplicated content group (same encoded bytes) with the kept (minimum)
    image id and the copy count.

    Scale shape: each blob is digested where it is read (md5 -> 8-byte
    key), so only (key, id) rides the groupby — image bytes never enter
    the shuffle (SURVEY §7.5 'bytes out of the shuffle' rule).  The
    oracle groups the raw BLOB column directly."""
    import hashlib

    from ray.data.aggregate import Count, Min

    from . import tiling

    images = tiling.read_images(sf_dir, columns=["image_id", "bytes"])

    def digest(b: pa.Table) -> pa.Table:
        ids = b["image_id"].to_pylist()
        nums = np.array([int(s[3:]) for s in ids], np.int64)
        keys = np.fromiter(
            (
                int.from_bytes(hashlib.md5(x).digest()[:8], "little") - (1 << 63)
                for x in b["bytes"].to_pylist()
            ),
            np.int64,
            b.num_rows,
        )
        return pa.table({"k": pa.array(keys), "idnum": pa.array(nums)})

    g = (
        images.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Min("idnum", alias_name="mn"), Count(alias_name="n_copies"))
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_copies"] > 1]
        return pd.DataFrame(
            {
                "keep_image_id": [
                    f"img{v:012d}" for v in df["mn"].to_numpy(np.int64)
                ],
                "n_copies": df["n_copies"].to_numpy(np.int64),
            }
        )

    return g.map_batches(fin, batch_format="pandas")


def _sql_image_exact_dedup(sf: float = 0.01) -> str:
    import os

    from ..sources import synth as _synth

    path = os.path.join(_synth.CACHE_DIR, f"images_sf{sf:g}", "*.parquet")
    return f"""
    SELECT 'img' || lpad(CAST(mn AS VARCHAR), 12, '0') AS keep_image_id, n_copies
    FROM (
      SELECT MIN(CAST(substr(image_id, 4) AS BIGINT)) AS mn,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM read_parquet('{path}') GROUP BY bytes
    )
    WHERE n_copies > 1
    """


def q_audio_exact_dedup(sf_dir: str):
    """Exact byte-level AUDIO dedup (the audio leg of multimodal dedup,
    mirroring q_image_exact_dedup): one row per duplicated clip-content
    group with the kept (minimum) audio id and the copy count.  Blobs are
    md5-digested where they are read; only (key, id) rides the groupby —
    clip bytes never enter the shuffle.  The oracle groups the raw blob
    column directly over the same synthesized corpus parquet."""
    import hashlib

    from ray.data.aggregate import Count, Min

    from . import audio

    clips = audio.read_audio(sf_dir, columns=["audio_id", "data"])

    def digest(b: pa.Table) -> pa.Table:
        nums = np.array([int(s[3:]) for s in b["audio_id"].to_pylist()], np.int64)
        keys = np.fromiter(
            (
                int.from_bytes(hashlib.md5(x).digest()[:8], "little") - (1 << 63)
                for x in b["data"].to_pylist()
            ),
            np.int64,
            b.num_rows,
        )
        return pa.table({"k": pa.array(keys), "idnum": pa.array(nums)})

    g = (
        clips.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Min("idnum", alias_name="mn"), Count(alias_name="n_copies"))
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_copies"] > 1]
        return pd.DataFrame(
            {
                "keep_audio_id": [f"aud{v:012d}" for v in df["mn"].to_numpy(np.int64)],
                "n_copies": df["n_copies"].to_numpy(np.int64),
            }
        )

    out = g.map_batches(fin, batch_format="pandas").to_pandas()
    return out.sort_values("keep_audio_id", ignore_index=True)


def _sql_audio_exact_dedup(sf: float = 0.01) -> str:
    import os

    from ..sources import synth as _synth

    path = os.path.join(_synth.CACHE_DIR, f"audio_sf{sf:g}", "*.parquet")
    return f"""
    SELECT 'aud' || lpad(CAST(mn AS VARCHAR), 12, '0') AS keep_audio_id, n_copies
    FROM (
      SELECT MIN(CAST(substr(audio_id, 4) AS BIGINT)) AS mn,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM read_parquet('{path}') GROUP BY data
    )
    WHERE n_copies > 1
    ORDER BY keep_audio_id
    """


# ---------------------------------------------------------------------------
# session-5 batch 2: chunking, sampling, windows, set ops, outer join, sizes
# ---------------------------------------------------------------------------

_CHUNK_LEN, _CHUNK_STRIDE = 500, 400


def q_doc_chunks(sf_dir: str):
    """Training-data chunking: split each document into overlapping
    fixed-size character chunks (len 500, stride 400) with per-chunk
    content hashes — the explode stage every context-window pipeline
    needs before packing.

    Scale shape: a pure flat-map (no shuffle); chunk counts derive from
    integer math so both engines enumerate identical chunk grids.  The
    per-chunk substring+md5 loop is per-CHUNK work (string copies can't
    vectorize further), not a per-row scalar op."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    L, St = _CHUNK_LEN, _CHUNK_STRIDE

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"].astype(str).to_numpy(object)
        did = df["doc_id"].to_numpy(np.int64)
        n = np.fromiter((len(t) for t in txt), np.int64, len(txt))
        k = (np.maximum(n - L, 0) + St - 1) // St + 1
        rep = np.repeat(np.arange(len(txt)), k)
        idx = np.arange(len(rep)) - np.repeat(np.r_[0, np.cumsum(k)[:-1]], k)
        starts = idx * St
        pieces = [txt[r][s : s + L] for r, s in zip(rep, starts)]
        # two's-complement int64 view of DuckDB's md5_number_lower
        # (little-endian last 8 digest bytes)
        hashes = np.fromiter(
            (
                int.from_bytes(hashlib.md5(p.encode()).digest()[8:], "little", signed=True)
                for p in pieces
            ),
            np.int64,
            len(pieces),
        )
        return pd.DataFrame(
            {
                "doc_id": did[rep],
                "chunk_idx": idx,
                "start": starts,
                "chunk_len": np.fromiter((len(p) for p in pieces), np.int64, len(pieces)),
                "chunk_hash": hashes,
            }
        )

    return ds.map_batches(chunks, batch_format="pandas")


def _sql_doc_chunks() -> str:
    L, St = _CHUNK_LEN, _CHUNK_STRIDE
    return f"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n,
             (GREATEST(length(text) - {L}, 0) + {St - 1}) // {St} + 1 AS k
      FROM documents
    ), series AS (
      SELECT unnest(generate_series(0, (SELECT MAX(k) - 1 FROM d))) AS i
    ), c AS (
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, CAST(i * {St} AS BIGINT) AS start,
             substr(text, CAST(i * {St} + 1 AS BIGINT), {L}) AS chunk
      FROM d JOIN series ON series.i < d.k
    )
    SELECT doc_id, chunk_idx, start,
           CAST(length(chunk) AS BIGINT) AS chunk_len,
           CAST(CASE WHEN h >= CAST({1 << 63} AS HUGEINT) THEN h - {_U64} ELSE h END AS BIGINT) AS chunk_hash
    FROM (SELECT *, CAST(md5_number_lower(chunk) AS HUGEINT) AS h FROM c)
    """


_NGRAM_W = 8


def q_dup_ngram_spans(sf_dir: str):
    """Exact substring-level dedup signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", exact-substring variant):
    for every document, count how many of its W-token windows (W=8,
    whitespace tokens) also occur in at least one OTHER document — the
    per-doc signal a span-trimming dedup stage keys on.

    Scale shape: one map-only explode emits (doc_id, win_hash) id pairs —
    window TEXT never leaves the explode task — then ONE hash
    part-exchange co-groups every occurrence of a hash (part =
    splitmix64(hash) % P, sort with exact integer boundaries, whole parts
    per batch) and finds cross-doc-duplicated hashes with a single
    vectorized run-length pass; per-doc partial sums ride a final small
    groupby(doc_id).  P is sized from sum(n_chars) (already in the
    parquet) so no extra counting pass runs.  Window hashing is md5 (low
    8 LE bytes) for cross-engine oracle parity; at 100-TB scale a
    Karp-Rabin rolling hash (O(tokens), not O(tokens*W)) drops in with an
    identical pipeline shape.  Tokenization is split-on-single-space to
    mirror DuckDB string_split exactly."""
    return _dup_ngram_spans_impl(sf_dir, "md5")


def _md5_window_hashes(toks: list, W: int) -> np.ndarray:
    """Oracle-parity window hashes: md5 of the joined window text, low 8
    LE bytes (DuckDB md5_number_lower).  O(tokens * W) string work."""
    import hashlib

    nw = len(toks) - W + 1
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(" ".join(toks[i : i + W]).encode()).digest()[8:],
                "little",
                signed=True,
            )
            for i in range(nw)
        ),
        np.int64,
        nw,
    )


def _kr_explode_batch(dids: np.ndarray, texts, W: int) -> tuple[np.ndarray, np.ndarray]:
    """Karp-Rabin scale-path window hashes for a WHOLE batch: one
    vectorized string hash over every token in the batch, per-token
    splitmix64, then a degree-W polynomial fold (uint64 wraparound) over
    a flat sliding window, keeping only windows that stay inside one doc
    — O(tokens) with exactly one hash_array call per batch, no
    per-window strings.  Same duplicated-window OUTPUT as md5 absent
    64-bit collisions (tests assert equality)."""
    B = np.uint64(0x100000001B3)  # FNV prime as the polynomial base
    tok_lists = [t.split(" ") for t in texts]
    n_toks = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
    if not len(tok_lists) or int(n_toks.sum()) < W:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    flat = np.concatenate([np.asarray(t, object) for t in tok_lists])
    th = synth._splitmix64(pd.util.hash_array(flat).astype(np.uint64))
    win = np.lib.stride_tricks.sliding_window_view(th, W)
    acc = np.zeros(len(win), np.uint64)
    for k in range(W):
        acc = acc * B + win[:, k]
    doc_ix = np.repeat(np.arange(len(tok_lists)), n_toks)
    keep = doc_ix[: len(win)] == doc_ix[W - 1 :]  # window stays inside a doc
    return dids[doc_ix[: len(win)][keep]], acc[keep].astype(np.int64)


_NW_EXTRA_PARTS = 64


def _dup_ngram_spans_impl(sf_dir: str, hash_kind: str):
    from ray.data.aggregate import Sum

    W = _NGRAM_W
    meta = _read(sf_dir, "documents", ["n_chars"]).sum("n_chars")
    est_windows = max(int(meta) // 6, 1)  # ~5-char words + separator
    # 250k-row parts: a part is one lexsort over 16-byte rows (4 MB), so
    # wide parts cost nothing in-task while shrinking the range-partition
    # fan-out (input_blocks x n_parts shuffle objects) — at 250k docs the
    # 50k-row sizing made the sort coordination the whole query (r4 s4
    # 5x check: 871 parts -> 63 s; 175 parts -> re-measured below)
    n_parts = int(max(8, min(4096, est_windows // 250_000 + 1)))

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    _empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "h": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
        }
    )

    def explode(df: pd.DataFrame) -> pa.Table:
        batch_dids = df["doc_id"].to_numpy(np.int64)
        texts = df["text"].astype(str)
        if hash_kind == "kr":
            out_dids, h = _kr_explode_batch(batch_dids, texts, W)
        else:
            dids: list[np.ndarray] = []
            hs: list[np.ndarray] = []
            for did, txt in zip(batch_dids, texts):
                toks = txt.split(" ")
                nw = len(toks) - W + 1
                if nw <= 0:
                    continue
                hs.append(_md5_window_hashes(toks, W))
                dids.append(np.full(nw, did, np.int64))
            if hs:
                out_dids, h = np.concatenate(dids), np.concatenate(hs)
            else:
                out_dids = h = np.empty(0, np.int64)
        part = (synth._splitmix64(h.astype(np.uint64)) % np.uint64(n_parts)).astype(
            np.int64
        )
        # per-doc window TOTALS ride the same exchange in dedicated parts
        # beyond the window range (part >= n_parts, nw in the h column, one
        # row per doc) — computed map-side here so the post-exchange stage
        # only re-ships docs that actually HAVE duplicated windows, instead
        # of a (part x doc) row per scattered window part (the 2nd exchange
        # was ~the size of the 1st before this; 5x-scale check, r4 s4)
        n_toks = texts.str.count(" ").to_numpy(np.int64) + 1
        nw_doc = n_toks - W + 1
        keep = nw_doc > 0
        if not len(h) and not keep.any():
            return _empty
        nw_part = n_parts + (batch_dids[keep] % _NW_EXTRA_PARTS)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([out_dids, batch_dids[keep]])),
                "h": pa.array(np.concatenate([h, nw_doc[keep]])),
                "part": pa.array(np.concatenate([part, nw_part])),
            }
        )

    _empty_counts = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "nw": pa.array([], pa.int64()),
            "nd": pa.array([], pa.int64()),
        }
    )

    def count_dups(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_counts
        parts = t["part"].to_numpy(zero_copy_only=False)
        nw_tables = []
        if parts[-1] >= n_parts:
            # window-total rows (part >= n_parts): (doc_id, nw)
            # pass-throughs.  Split defensively rather than trusting
            # one-block-per-part: a boundary-straddling block stays correct
            # (window parts themselves are never split by the sort).
            is_nw = parts >= n_parts
            sel = pa.array(is_nw)
            nw_tables.append(
                pa.table(
                    {
                        "doc_id": t["doc_id"].filter(sel),
                        "nw": t["h"].filter(sel),
                        "nd": pa.array(np.zeros(int(is_nw.sum()), np.int64)),
                    }
                )
            )
            t = t.filter(pa.compute.invert(sel))
            if t.num_rows == 0:
                return pa.concat_tables(nw_tables)
        h = t["h"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, h))
        h, did = h[order], did[order]
        # run starts per hash; distinct docs per run = doc transitions + 1
        new_h = np.r_[True, h[1:] != h[:-1]]
        seg = np.cumsum(new_h) - 1
        new_doc = new_h | np.r_[True, did[1:] != did[:-1]]
        ndocs = np.bincount(seg[new_doc], minlength=seg[-1] + 1)
        dup = (ndocs >= 2)[seg]
        uids, inv = np.unique(did, return_inverse=True)
        nd = np.bincount(inv, weights=dup, minlength=len(uids)).astype(np.int64)
        nz = nd > 0  # only docs with duplicated windows re-ship
        dup_t = pa.table(
            {
                "doc_id": pa.array(uids[nz]),
                "nw": pa.array(np.zeros(int(nz.sum()), np.int64)),
                "nd": pa.array(nd[nz]),
            }
        )
        return pa.concat_tables(nw_tables + [dup_t]) if nw_tables else dup_t

    out = (
        ds.map_batches(explode, batch_format="pandas")
        .sort("part", boundaries=list(range(1, n_parts + _NW_EXTRA_PARTS)))
        .map_batches(count_dups, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Sum("nw", alias_name="n_windows"), Sum("nd", alias_name="n_dup_windows"))
    )
    return out


def q_dup_ngram_spans_kr(sf_dir: str):
    """The Karp-Rabin scale-path variant of dup_ngram_spans: identical
    pipeline shape, window hashes from a vectorized O(tokens) polynomial
    fold instead of per-window md5 (see _kr_window_hashes).  Rows-only:
    its oracle is the pytest equality check against the md5 variant's
    output (the duplicated-window counts are hash-agnostic absent 64-bit
    collisions)."""
    return _dup_ngram_spans_impl(sf_dir, "kr")


def _sql_dup_ngram_spans() -> str:
    W = _NGRAM_W
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), w AS (
      SELECT doc_id, array_to_string(t[s.i:s.i+{W - 1}], ' ') AS win
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - {W} + 1)) AS i) s
      WHERE len(t) >= {W}
    ), dup AS (
      SELECT win FROM w GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN dup.win IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows
    FROM w LEFT JOIN dup USING (win)
    GROUP BY w.doc_id
    """


_BM25_TERMS = ("merge", "scan", "window")
_BM25_K1 = 1.25  # exactly representable binary fractions: no literal-parse
_BM25_B = 0.75  # divergence between the two engines
_BM25_TOPK = 20


def q_bm25_topk(sf_dir: str):
    """BM25 retrieval scoring: top-20 documents for a fixed 3-term query —
    the ranking stage of a corpus search / retrieval-augmented pipeline.

    Two passes over a tiny per-doc stats table (doc_id, dl, tf per term;
    5 int64 columns, materialized once so the text is split exactly once):
    pass 1 is one small aggregate for N / avgdl / per-term df, pass 2
    scores every doc vectorized and keeps a per-block partial top-k, the
    driver merges blocks x k rows.  Float parity: k1/b are exact binary
    fractions, idf uses scalar math.log (libm, matching DuckDB ln, not
    numpy's SIMD log), the score expression tree is written identically
    on both sides, and the emitted score is floor(score * 1e6) — the
    <=1e9 quantization rule (BASELINE.md session-5)."""
    import math

    terms = _BM25_TERMS
    k1, b = _BM25_K1, _BM25_B

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pa.Table:
        toks = [t.split(" ") for t in df["text"].astype(str)]
        out = {
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "dl": np.fromiter((len(t) for t in toks), np.int64, len(toks)),
        }
        for j, term in enumerate(terms):
            out[f"tf{j}"] = np.fromiter(
                (t.count(term) for t in toks), np.int64, len(toks)
            )
        return pa.table({k: pa.array(v) for k, v in out.items()})

    st = ds.map_batches(stats, batch_format="pandas").materialize()

    def partial_g(t: pa.Table) -> pa.Table:
        cols = {
            "n": np.array([t.num_rows], np.int64),
            "sum_dl": np.array([pc.sum(t["dl"]).as_py() or 0], np.int64),
        }
        for j in range(len(terms)):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False)
            cols[f"df{j}"] = np.array([int((tf > 0).sum())], np.int64)
        return pa.table({k: pa.array(v) for k, v in cols.items()})

    g = st.map_batches(partial_g, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    n = int(g["n"].sum())
    avgdl = int(g["sum_dl"].sum()) / n
    idf = [
        math.log((n - int(g[f"df{j}"].sum()) + 0.5) / (int(g[f"df{j}"].sum()) + 0.5) + 1.0)
        for j in range(len(terms))
    ]

    def score_block(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False)
        den = k1 * ((1.0 - b) + b * dl / avgdl)
        score = None
        any_tf = np.zeros(len(dl), bool)
        for j in range(len(terms)):
            tf = t[f"tf{j}"].to_numpy(zero_copy_only=False)
            any_tf |= tf > 0
            s = idf[j] * (tf * (k1 + 1.0)) / (tf + den)
            score = s if score is None else score + s
        micro = np.floor(score * 1000000.0).astype(np.int64)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(any_tf)
        order = keep[np.lexsort((did[keep], -micro[keep]))][:_BM25_TOPK]
        return pa.table({"doc_id": pa.array(did[order]), "score_micro": pa.array(micro[order])})

    cand = st.map_batches(
        score_block, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cand = cand.sort_values(
        ["score_micro", "doc_id"], ascending=[False, True], ignore_index=True
    ).head(_BM25_TOPK)
    return pa.table(
        {
            "doc_id": pa.array(cand["doc_id"].to_numpy(np.int64)),
            "score_micro": pa.array(cand["score_micro"].to_numpy(np.int64)),
        }
    )


def _sql_bm25_topk() -> str:
    terms = _BM25_TERMS
    k1, b = _BM25_K1, _BM25_B
    one_minus_b = 1.0 - b  # exact: b is an exact binary fraction
    tf_cols = ",\n        ".join(
        f"len(list_filter(t, x -> x = '{term}')) AS tf{j}" for j, term in enumerate(terms)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END) AS df{j}" for j in range(len(terms))
    )
    # expression trees written identically to the numpy path: den shared,
    # per-term idf * (tf * 2.25) / (tf + den), terms summed left-to-right
    term_exprs = [
        f"(ln(((n - df{j}) + 0.5) / (df{j} + 0.5) + 1.0) * (tf{j} * {k1 + 1.0!r}) / (tf{j} + den))"
        for j in range(len(terms))
    ]
    score = term_exprs[0]
    for e in term_exprs[1:]:
        score = f"({score} + {e})"
    return f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), s AS (
      SELECT doc_id, len(t) AS dl,
        {tf_cols}
      FROM d
    ), g AS (
      SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, {df_cols}
      FROM s
    ), scored AS (
      SELECT doc_id,
             CAST(floor({score} * 1000000.0) AS BIGINT) AS score_micro
      FROM (SELECT s.*, g.*, {k1!r} * ({one_minus_b!r} + {b!r} * dl / avgdl) AS den FROM s, g)
      WHERE {" + ".join(f"tf{j}" for j in range(len(terms)))} > 0
    )
    SELECT doc_id, score_micro FROM scored
    ORDER BY score_micro DESC, doc_id
    LIMIT {_BM25_TOPK}
    """


def q_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 shape (local supplier volume): revenue per nation from
    lineitems whose SUPPLIER and CUSTOMER share a nation, orders from
    1996-1997 — the classic star-schema multi-way join: two broadcast
    dimensions + one LARGE x LARGE fact co-partition + a selective
    post-join predicate.

    Scale shape: the only shuffle is the hash co-partition
    orders x lineitem (probe side pre-filtered by date at the read task);
    customer/supplier nation maps broadcast once via ray.put; the
    same-nation predicate and the revenue combiner run inside the join
    part, so only |nations| x parts rows reach the final groupby."""
    import ray

    from ray.data.aggregate import Sum

    lo_day = np.datetime64("1996-01-01").astype("datetime64[D]").astype(np.int64)
    hi_day = np.datetime64("1998-01-01").astype("datetime64[D]").astype(np.int64)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    c2n_ref = ray.put(cust.set_index("c_custkey")["c_nationkey"])
    s2n_ref = ray.put(supp.set_index("s_suppkey")["s_nationkey"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    n_parts = int(max(8, min(4096, lines.count() // 200_000 + 1)))

    def tag_orders(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        )
        m = (day >= lo_day) & (day < hi_day)  # filter at the read task
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)[m]
        return pa.table(
            {
                "key": pa.array(k),
                "val": pa.array(b["o_custkey"].to_numpy(zero_copy_only=False)[m]),
                "cents": pa.array(np.zeros(len(k), np.int64)),
                "is_build": pa.array(np.ones(len(k), bool)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    def tag_lines(b: pa.Table) -> pa.Table:
        k = b["l_orderkey"].to_numpy(zero_copy_only=False)
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(k),
                "val": pa.array(b["l_suppkey"].to_numpy(zero_copy_only=False)),
                "cents": pa.array(np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)),
                "is_build": pa.array(np.zeros(len(k), bool)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {"nationkey": pa.array([], pa.int64()), "revenue_cents": pa.array([], pa.int64())}
    )

    def join_part(t: pa.Table) -> pa.Table:
        import ray as _ray

        hit = _join_part_key(t)
        if hit is None:
            return _empty
        b_hit, p_hit = hit
        val = t["val"].to_numpy(zero_copy_only=False)
        custkey = val[b_hit]
        suppkey = val[p_hit]
        cn = _ray.get(c2n_ref).reindex(custkey).to_numpy(np.int64)
        sn = _ray.get(s2n_ref).reindex(suppkey).to_numpy(np.int64)
        local = cn == sn
        cents = t["cents"].to_numpy(zero_copy_only=False)[p_hit][local]
        nk = cn[local]
        u, inv = np.unique(nk, return_inverse=True)
        return pa.table(
            {
                "nationkey": pa.array(u.astype(np.int64)),
                "revenue_cents": pa.array(
                    np.bincount(inv, weights=cents, minlength=len(u)).astype(np.int64)
                ),
            }
        )

    agg = (
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
        .union(lines.map_batches(tag_lines, batch_format="pyarrow", zero_copy_batch=True))
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(join_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("nationkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    out = agg.merge(nation, left_on="nationkey", right_on="n_nationkey").sort_values(
        "nationkey", ignore_index=True
    )
    return pa.table(
        {
            "n_name": pa.array(out["n_name"].astype(str).to_numpy(object), pa.string()),
            "revenue_cents": pa.array(out["revenue_cents"].to_numpy(np.int64)),
        }
    )


def _sql_local_supplier_revenue() -> str:
    return """
    SELECT n_name,
           CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE s_nationkey = c_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """


_SFC_BBOX = (-80.0, 30.0, 20.0, 60.0)  # lon0, lat0, lon1, lat1
_SFC_BITS = 6  # 64 x 64 index grid


def q_sfc_range_query(sf_dir: str):
    """Spatial range (bbox) selection accelerated by space-filling-curve
    range decomposition — the index-side counterpart of the engine's SFC
    tile keys: the driver decomposes the query bbox into merged Morton
    code ranges over a 64x64 grid (a bounded, data-independent plan),
    every batch prunes with ONE vectorized searchsorted against the range
    starts, and only pruned survivors pay the exact bbox refine.

    The result is EXACT (prune is a superset, refine is the precise
    predicate), so the oracle is the naive full-scan WHERE clause —
    demonstrating that the index path and the scan agree row-for-row.
    At corpus scale the prune also becomes a parquet row-group filter
    when points are stored Morton-sorted (the engine's tile layout)."""
    from ..functions import sfc

    lon0, lat0, lon1, lat1 = _SFC_BBOX
    n = 1 << _SFC_BITS

    # bbox -> covering grid cells -> merged morton ranges (driver, bounded)
    gx0 = max(int((lon0 + 180.0) / 360.0 * n), 0)
    gx1 = min(int((lon1 + 180.0) / 360.0 * n), n - 1)
    gy0 = max(int((lat0 + 90.0) / 180.0 * n), 0)
    gy1 = min(int((lat1 + 90.0) / 180.0 * n), n - 1)
    gx, gy = np.meshgrid(np.arange(gx0, gx1 + 1), np.arange(gy0, gy1 + 1))
    codes = np.sort(sfc.morton_encode(gx.ravel().astype(np.uint64), gy.ravel().astype(np.uint64)))
    brk = np.flatnonzero(np.diff(codes.astype(np.int64)) > 1)
    starts = np.r_[codes[0], codes[brk + 1]].astype(np.int64)
    ends = np.r_[codes[brk], codes[-1]].astype(np.int64)  # inclusive

    ds = _read(sf_dir, "events", ["event_id"])

    def bbox_filter(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_lonlat(eid)
        cx = np.clip(((lon + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
        cy = np.clip(((lat + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
        code = sfc.morton_encode(cx.astype(np.uint64), cy.astype(np.uint64)).astype(np.int64)
        # index prune: inside some [start, end] morton range
        pos = np.searchsorted(starts, code, side="right") - 1
        cand = (pos >= 0) & (code <= ends[np.maximum(pos, 0)])
        # exact refine on the survivors only
        keep = np.flatnonzero(cand)
        lon, lat = lon[keep], lat[keep]
        ok = (lon >= lon0) & (lon <= lon1) & (lat >= lat0) & (lat <= lat1)
        return pa.table({"event_id": pa.array(eid[keep][ok])})

    return ds.map_batches(bbox_filter, batch_format="pyarrow", zero_copy_batch=True)


def _sql_sfc_range_query() -> str:
    lon0, lat0, lon1, lat1 = _SFC_BBOX
    return f"""
    SELECT event_id FROM (
      SELECT event_id,
             {_LON_SQL} AS lon,
             {_LAT_SQL} AS lat
      FROM events
    )
    WHERE lon >= {lon0!r} AND lon <= {lon1!r} AND lat >= {lat0!r} AND lat <= {lat1!r}
    """


_PMI_MIN_COUNT = 5


def q_bigram_pmi(sf_dir: str):
    """Collocation mining: pointwise mutual information of adjacent token
    bigrams over the corpus (the phrase-detection pass word2vec-style
    pipelines run before training) — PMI = ln(n * c_ab / (c_a * c_b)) for
    bigrams seen >= 5 times.

    Scale shape: bigram counts are a per-batch combiner + one groupby
    (the corpus-sized exchange); unigram counts are vocabulary-bounded
    and broadcast (same argument as q_unigram_logprob); PMI attaches
    map-only.  Each PMI is ONE fixed-arity IEEE expression over four
    integers, quantized floor(x*1e6), so both engines agree; products are
    kept in doubles so nothing overflows at corpus scale."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])

    def gram_partial(df: pd.DataFrame) -> pa.Table:
        """ONE text scan emits tagged unigram (kind=0, wb='') and bigram
        (kind=1) partial counts."""
        was: list[np.ndarray] = []
        wbs: list[np.ndarray] = []
        flats: list[np.ndarray] = []
        for t in df["text"].astype(str):
            toks = np.asarray(t.split(" "), object)
            flats.append(toks)
            if len(toks) >= 2:
                was.append(toks[:-1])
                wbs.append(toks[1:])
        uw, uc = np.unique(np.concatenate(flats).astype(str), return_counts=True)
        parts = [pd.DataFrame({"kind": 0, "wa": uw, "wb": "", "c": uc.astype(np.int64)})]
        if was:
            g = (
                pd.DataFrame(
                    {
                        "wa": np.concatenate(was).astype(str),
                        "wb": np.concatenate(wbs).astype(str),
                    }
                )
                .groupby(["wa", "wb"], sort=False)
                .size()
                .reset_index(name="c")
            )
            g.insert(0, "kind", 1)
            parts.append(g)
        out = pd.concat(parts, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    def recombine(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(["kind", "wa", "wb"], sort=False)["c"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    # two-level combine: the per-batch partials are key-bounded (uni+bigram
    # vocab), so collapsing 60+ read blocks into 4 re-combined blocks
    # before the groupby removes ~5 s of per-block aggregate fixed cost at
    # sf0.1 (measured 7.7 s -> 2.0 s on the bigram pass, same output)
    counts = (
        ds.map_batches(gram_partial, batch_format="pandas")
        .repartition(4)
        .map_batches(recombine, batch_format="pyarrow", batch_size=None)
        .groupby(["kind", "wa", "wb"])
        .aggregate(Sum("c", alias_name="c_ab"))
        .materialize()  # tiny: vocab + bigram-vocab rows
    )
    def _kind(k: int):
        return lambda t: t.filter(pc.equal(t["kind"], k))

    uni = counts.map_batches(_kind(0), batch_format="pyarrow").to_pandas()  # vocab-bounded pull
    bigrams = counts.map_batches(_kind(1), batch_format="pyarrow").select_columns(
        ["wa", "wb", "c_ab"]
    )
    n = float(uni["c_ab"].sum())
    lut = uni.set_index("wa")["c_ab"]

    def attach_pmi(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["c_ab"] >= _PMI_MIN_COUNT]
        if not len(df):
            return pd.DataFrame(
                {
                    "word_a": pd.Series([], dtype=str),
                    "word_b": pd.Series([], dtype=str),
                    "c_ab": pd.Series([], dtype=np.int64),
                    "pmi_micro": pd.Series([], dtype=np.int64),
                }
            )
        ca = lut.reindex(df["wa"]).to_numpy(np.float64)
        cb = lut.reindex(df["wb"]).to_numpy(np.float64)
        cab = df["c_ab"].to_numpy(np.int64)
        pmi = np.floor(np.log((n * cab) / (ca * cb)) * 1000000.0).astype(np.int64)
        return pd.DataFrame(
            {
                "word_a": df["wa"].to_numpy(object),
                "word_b": df["wb"].to_numpy(object),
                "c_ab": cab,
                "pmi_micro": pmi,
            }
        )

    return bigrams.map_batches(attach_pmi, batch_format="pandas")


def _sql_bigram_pmi() -> str:
    return f"""
    WITH toks AS (
      SELECT string_split(text, ' ') AS t FROM documents
    ), bg AS (
      SELECT t[s.i] AS word_a, t[s.i + 1] AS word_b
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
      WHERE len(t) >= 2
    ), cab AS (
      SELECT word_a, word_b, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM bg GROUP BY word_a, word_b
      HAVING COUNT(*) >= {_PMI_MIN_COUNT}
    ), uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uni
    )
    SELECT word_a, word_b, c_ab,
           CAST(floor(ln((tot.n * c_ab) / (CAST(ua.c AS DOUBLE) * ub.c)) * 1000000.0) AS BIGINT)
             AS pmi_micro
    FROM cab
    JOIN uni ua ON ua.w = cab.word_a
    JOIN uni ub ON ub.w = cab.word_b
    CROSS JOIN tot
    """


_FUZZY_MAX_EDIT = 2


def _levenshtein(a: str, b: str) -> int:
    """Plain Levenshtein DP (matches DuckDB's levenshtein())."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def q_vocab_fuzzy_pairs(sf_dir: str):
    """Fuzzy (edit-distance <= 2) vocabulary self-join — the SymSpell
    symmetric-delete algorithm: typo/variant detection over a corpus
    dictionary.  If lev(a,b) <= 2 then a and b share a string reachable
    by <= 2 deletions from each (take an optimal alignment and delete the
    edited positions), so hashing every <= 2-deletion variant and pairing
    within buckets is a COMPLETE sub-quadratic candidate generator; exact
    DP verification then removes false candidates.

    Scale shape: the vocabulary is built by a distributed distinct
    (explode + groupby) and NEVER lands on the driver; each word fans out
    to O(L^2) deletion variants carrying only (variant-hash, word); one
    hash part-exchange pairs bucket members vectorized; candidate pairs
    dedup through a groupby before the exact per-pair DP (pairs are
    bucket-bounded, not O(V^2)).  The oracle is the O(V^2)
    levenshtein() self-join — tractable only at test scale, which is the
    point."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["text"])

    def toks(df: pd.DataFrame) -> pa.Table:
        flat = np.concatenate(
            [np.asarray(t.split(" "), object) for t in df["text"].astype(str)]
        )
        return pa.table({"w": pa.array(np.unique(flat.astype(str)))})

    vocab = ds.map_batches(toks, batch_format="pandas").groupby("w").aggregate(
        Count(alias_name="_n")
    )

    def variants(t: pa.Table) -> pa.Table:
        import hashlib

        ws: list[str] = []
        hs: list[int] = []
        for w in t["w"].to_pylist():
            vs = {w}
            for i in range(len(w)):
                d1 = w[:i] + w[i + 1 :]
                vs.add(d1)
                for j in range(len(d1)):
                    vs.add(d1[:j] + d1[j + 1 :])
            for v in vs:
                ws.append(w)
                hs.append(
                    int.from_bytes(hashlib.md5(v.encode()).digest()[8:], "little", signed=True)
                )
        h = np.array(hs, np.int64)
        return pa.table(
            {
                "w": pa.array(ws, pa.string()),
                "h": pa.array(h),
                "part": pa.array(
                    (synth._splitmix64(h.astype(np.uint64)) % np.uint64(64)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table({"wa": pa.array([], pa.string()), "wb": pa.array([], pa.string())})

    def pair_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return _empty
        h = t["h"].to_numpy(zero_copy_only=False)
        w = np.asarray(t["w"].to_pylist(), object)
        order = np.lexsort((w, h))
        h, w = h[order], w[order]
        new = np.r_[True, h[1:] != h[:-1]]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, len(h)])
        rank = np.arange(len(h)) - np.repeat(starts, lens)
        reps = lens[np.cumsum(new) - 1] - rank - 1
        total = int(reps.sum())
        if total == 0:
            return _empty
        ai = np.repeat(np.arange(len(w)), reps)
        off = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        bi = ai + off + 1
        wa, wb = w[ai], w[bi]
        keep = wa != wb
        return pa.table({"wa": pa.array(wa[keep], pa.string()), "wb": pa.array(wb[keep], pa.string())})

    def verify(t: pa.Table) -> pa.Table:
        wa = t["wa"].to_pylist()
        wb = t["wb"].to_pylist()
        rows = [
            (a, b, d)
            for a, b in zip(wa, wb)
            if (d := _levenshtein(a, b)) <= _FUZZY_MAX_EDIT
        ]
        return pa.table(
            {
                "word_a": pa.array([r[0] for r in rows], pa.string()),
                "word_b": pa.array([r[1] for r in rows], pa.string()),
                "lev": pa.array(np.array([r[2] for r in rows], np.int64)),
            }
        )

    cand = (
        vocab.map_batches(variants, batch_format="pyarrow")
        .sort("part", boundaries=list(range(1, 64)))
        .map_batches(pair_bucket, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .map_batches(
            lambda t: pa.table(
                {
                    "wa": pc.min_element_wise(t["wa"], t["wb"]),
                    "wb": pc.max_element_wise(t["wa"], t["wb"]),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["wa", "wb"])
        .aggregate(Count(alias_name="_nb"))
        .select_columns(["wa", "wb"])
    )
    return cand.map_batches(verify, batch_format="pyarrow")


def _sql_vocab_fuzzy_pairs() -> str:
    return f"""
    WITH v AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents
    )
    SELECT a.w AS word_a, b.w AS word_b,
           CAST(levenshtein(a.w, b.w) AS BIGINT) AS lev
    FROM v a, v b
    WHERE a.w < b.w AND levenshtein(a.w, b.w) <= {_FUZZY_MAX_EDIT}
    """


_PR_ITERS = 10
_PR_SCALE = 10**12


def _nation_trade_edges(sf_dir: str) -> pd.DataFrame:
    """Directed nation trade-flow edge list (cust_nation -> supp_nation,
    weight = lineitem count), built by the hash co-partition
    lineitem x orders join with the tiny customer/supplier nation maps
    broadcast via ray.put — the shared feed of q_nation_pagerank and
    q_trade_triangles.  Returns the <= nations^2-bounded (src, dst, w)
    frame."""
    import ray

    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    c2n_ref = ray.put(cust.set_index("c_custkey")["c_nationkey"])
    s2n_ref = ray.put(supp.set_index("s_suppkey")["s_nationkey"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    n_parts = int(max(8, min(4096, lines.count() // 200_000 + 1)))

    def tag(b: pa.Table, key_col: str, val_col: str, is_build: bool) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b[key_col],
                "val": b[val_col],
                "is_build": pa.array(np.full(len(k), is_build)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
        }
    )

    def join_part(t: pa.Table) -> pa.Table:
        import ray as _ray

        hit = _join_part_key(t)
        if hit is None:
            return _empty
        b_hit, p_hit = hit
        val = t["val"].to_numpy(zero_copy_only=False)
        custkey = val[b_hit]
        suppkey = val[p_hit]
        c2n = _ray.get(c2n_ref)  # plasma-local after first fetch per worker
        s2n = _ray.get(s2n_ref)
        src = c2n.reindex(custkey).to_numpy(np.int64)
        dst = s2n.reindex(suppkey).to_numpy(np.int64)
        # per-part combiner: <= nations^2 rows leave each part
        e = (src.astype(np.int64) << np.int64(32)) | dst.astype(np.int64)
        u, c = np.unique(e, return_counts=True)
        return pa.table(
            {
                "src": pa.array((u >> np.int64(32)).astype(np.int64)),
                "dst": pa.array((u & np.int64(0xFFFFFFFF)).astype(np.int64)),
                "w": pa.array(c.astype(np.int64)),
            }
        )

    edges = (
        orders.map_batches(
            lambda b: tag(b, "o_orderkey", "o_custkey", True), batch_format="pyarrow"
        )
        .union(
            lines.map_batches(
                lambda b: tag(b, "l_orderkey", "l_suppkey", False),
                batch_format="pyarrow",
            )
        )
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(join_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Sum("w", alias_name="w"))
        .to_pandas()
    )

    return edges


def q_nation_pagerank(sf_dir: str):
    """Weighted PageRank over the nation trade-flow graph: edge
    cust_nation -> supp_nation weighted by lineitem count (who buys from
    whom), 10 damped iterations (d=0.85) — the canonical iterative graph
    workload, here fed by a distributed LARGE x LARGE join.

    Exactness: ranks are FIXED-POINT integers (1e12 scale); every
    iteration computes floor((r_u * 85 * w_uv) / (100 * W_u)) in
    arbitrary-precision ints (Python) / HUGEINT (DuckDB), so ten
    iterations stay bit-identical across engines — no float ever enters.

    Scale shape: the heavy stage is the hash co-partition join
    lineitem x orders (same part-exchange probe as order_line_join) with
    the tiny customer/supplier nation maps broadcast via ray.put
    (fetch-once per worker); per-part combiners reduce to <=625
    (src, dst) edge rows, so the driver-side 25-node iteration loop is
    O(nations^2) — at web scale (large node sets) the loop swaps for the
    per-round co-group shuffle already demonstrated by
    rows_only.q_neardup_clusters' hash-min propagation."""
    edges = _nation_trade_edges(sf_dir)

    # driver-side fixed-point iteration over the tiny nation graph
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    wout = edges.groupby("src")["w"].sum().to_dict()
    adj = [(int(r.src), int(r.dst), int(r.w)) for r in edges.itertuples()]
    base = 15 * _PR_SCALE // 100
    r = {n: _PR_SCALE for n in nodes}
    for _ in range(_PR_ITERS):
        nxt = {n: base for n in nodes}
        for s, d, w in adj:
            nxt[d] += (r[s] * 85 * w) // (100 * wout[s])
        r = nxt
    return pa.table(
        {
            "n_nationkey": pa.array(np.array(nodes, np.int64)),
            "rank_e12": pa.array(np.array([r[n] for n in nodes], np.int64)),
        }
    )


def _sql_nation_pagerank() -> str:
    base = 15 * _PR_SCALE // 100
    prev = "pr0"
    iters = []
    for k in range(1, _PR_ITERS + 1):
        iters.append(
            f"""pr{k} AS (
      SELECT n.id AS id,
             CAST({base} AS HUGEINT)
             + COALESCE(SUM((p.r * 85 * e.w) // (100 * o.wout)), 0) AS r
      FROM nodes n
      LEFT JOIN edges e ON e.dst = n.id
      LEFT JOIN {prev} p ON p.id = e.src
      LEFT JOIN outw o ON o.src = e.src
      GROUP BY n.id
    )"""
        )
        prev = f"pr{k}"
    chain = ", ".join(iters)
    return f"""
    WITH pairs AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ), edges AS (
      SELECT src, dst, CAST(COUNT(*) AS HUGEINT) AS w FROM pairs GROUP BY src, dst
    ), outw AS (
      SELECT src, SUM(w) AS wout FROM edges GROUP BY src
    ), nodes AS (
      SELECT src AS id FROM edges UNION SELECT dst FROM edges
    ), pr0 AS (
      SELECT id, CAST({_PR_SCALE} AS HUGEINT) AS r FROM nodes
    ), {chain}
    SELECT id AS n_nationkey, CAST(r AS BIGINT) AS rank_e12 FROM {prev}
    """


def q_unigram_logprob(sf_dir: str):
    """Unigram language-model scoring (the CCNet/Gopher-style perplexity
    quality filter): score every document by the sum of its tokens' corpus
    log-probabilities.  Pipelines keep the middle perplexity band and drop
    the tails; this operator computes the per-doc signal.

    Float parity across engines is made EXACT by quantizing per-WORD, not
    per-doc: the driver computes floor(ln(c_w/total) * 1e6) once per
    distinct vocabulary word with libm (math.log, matching DuckDB ln),
    and per-doc scores are then pure INTEGER sums — immune to float
    summation order, which neither engine guarantees.

    Scale shape: pass 1 is a classic combiner'd word-count groupby whose
    result is vocabulary-bounded (the one driver pull; at open-web scale
    the drop-in variant keeps the top-V words + one OOV bucket, same
    shape); pass 2 is map-only — flatten each batch's tokens, one
    searchsorted against the broadcast sorted vocab, one segment-sum."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial_counts(df: pd.DataFrame) -> pa.Table:
        toks = [t.split(" ") for t in df["text"].astype(str)]
        flat = np.concatenate([np.asarray(t, object) for t in toks]) if toks else np.empty(0, object)
        w, c = np.unique(flat.astype(str), return_counts=True)
        return pa.table({"w": pa.array(w), "c": pa.array(c.astype(np.int64))})

    def recombine(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("w", sort=False)["c"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    # key-bounded partials over many read blocks: collapse through a
    # re-combine level before the groupby (per-block aggregate fixed-cost
    # finding, BASELINE session-6)
    counts = (
        ds.map_batches(partial_counts, batch_format="pandas")
        .repartition(4)
        .map_batches(recombine, batch_format="pyarrow", batch_size=None)
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    total = int(counts["c"].sum())
    vocab = np.sort(counts["w"].to_numpy(str))
    order = np.argsort(counts["w"].to_numpy(str), kind="stable")
    lp = np.fromiter(
        (
            int(math.floor(math.log(int(c) / total) * 1000000.0))
            for c in counts["c"].to_numpy(np.int64)[order]
        ),
        np.int64,
        len(vocab),
    )

    def score(df: pd.DataFrame) -> pa.Table:
        toks = [t.split(" ") for t in df["text"].astype(str)]
        n_tok = np.fromiter((len(t) for t in toks), np.int64, len(toks))
        flat = np.concatenate([np.asarray(t, object) for t in toks]) if toks else np.empty(0, object)
        wi = np.searchsorted(vocab, flat.astype(str))
        doc_ix = np.repeat(np.arange(len(toks)), n_tok)
        s = np.bincount(doc_ix, weights=lp[wi], minlength=len(toks)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "n_tokens": pa.array(n_tok),
                "sum_lp_micro": pa.array(s),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def _sql_unigram_logprob() -> str:
    return """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), cnt AS (
      SELECT w, COUNT(*) AS c FROM tok GROUP BY w
    ), tot AS (
      SELECT SUM(c) AS total FROM cnt
    ), lp AS (
      SELECT w, CAST(floor(ln(CAST(c AS DOUBLE) / total) * 1000000.0) AS BIGINT) AS lp_micro
      FROM cnt, tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(lp_micro) AS BIGINT) AS sum_lp_micro
    FROM tok JOIN lp USING (w)
    GROUP BY doc_id
    """


_WSAMPLE_K = 32


def q_weighted_sample(sf_dir: str):
    """Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    the k=32 documents with the largest ln(u_i)/w_i keys, weight =
    n_chars, u_i derived EXACTLY from splitmix64(doc_id) (53-bit mantissa
    + half-ulp offset, power-of-two division — bit-identical doubles on
    both engines).  Deterministic and order/partitioning-independent,
    unlike sequential reservoir sampling.

    Scale shape: map-only partial top-k per block, driver merges
    blocks x k candidate rows.  Keys are floor-quantized at 1e9 (the
    disclosed per-row ln parity rule, BASELINE.md session-5)."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy(np.int64)
        w = df["n_chars"].to_numpy(np.int64)
        h53 = (synth._splitmix64(did.astype(np.uint64)) >> np.uint64(11)).astype(
            np.float64
        )
        u = (h53 + 0.5) / 9007199254740992.0
        key = np.floor(np.log(u) / w * 1000000000.0).astype(np.int64)
        o = np.lexsort((did, -key))[:_WSAMPLE_K]
        return pd.DataFrame({"doc_id": did[o], "n_chars": w[o], "key_nano": key[o]})

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["key_nano", "doc_id"], ascending=[False, True], ignore_index=True
    ).head(_WSAMPLE_K)
    return pa.table(
        {
            "doc_id": pa.array(cand["doc_id"].to_numpy(np.int64)),
            "n_chars": pa.array(cand["n_chars"].to_numpy(np.int64)),
            "key_nano": pa.array(cand["key_nano"].to_numpy(np.int64)),
        }
    )


def _sql_weighted_sample() -> str:
    return f"""
    WITH h AS (
      SELECT doc_id, n_chars,
             CAST(({_sql_splitmix64("doc_id")}) // 2048 AS DOUBLE) AS h53
      FROM documents
    )
    SELECT doc_id, n_chars,
           CAST(floor(ln((h53 + 0.5) / 9007199254740992.0) / n_chars * 1000000000.0) AS BIGINT) AS key_nano
    FROM h
    ORDER BY key_nano DESC, doc_id
    LIMIT {_WSAMPLE_K}
    """


_SAMPLE_K = 64


def q_corpus_sample_topk(sf_dir: str):
    """Deterministic exact-k global uniform sample: the k documents with
    the smallest splitmix64(doc_id) — the distributed bottom-k-by-hash
    sampler (reservoir sampling is order-dependent and therefore not
    retry/partitioning-stable; bottom-k by a counter hash is).

    Scale shape: each block emits only its local bottom-k, the driver
    merges blocks x k candidate rows."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].to_numpy(np.int64)
        h = synth._splitmix64(did.astype(np.uint64))
        o = np.argsort(h, kind="stable")[:_SAMPLE_K]
        return pd.DataFrame({"doc_id": did[o], "hu": h[o]})

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["hu", "doc_id"], ignore_index=True).head(_SAMPLE_K)
    h_signed = cand["hu"].to_numpy(np.uint64).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(cand["doc_id"].to_numpy(np.int64)),
            "h": pa.array(h_signed),
        }
    )


def _sql_corpus_sample_topk() -> str:
    return f"""
    SELECT doc_id,
           CAST(CASE WHEN hu >= CAST({1 << 63} AS HUGEINT) THEN hu - {_U64} ELSE hu END AS BIGINT) AS h
    FROM (SELECT doc_id, ({_sql_splitmix64("doc_id")}) AS hu FROM documents)
    ORDER BY hu, doc_id LIMIT {_SAMPLE_K}
    """


def q_event_gaps(sf_dir: str):
    """Lead/lag window op: per user, the consecutive-event time-gap
    profile (event count, max gap, gaps over one hour).  Gap multiset =
    diffs of the sorted timestamp multiset, so the result is independent
    of tie order on equal timestamps.

    Scale shape: one user-hashed part-exchange, then each part resolves
    all its users with one lexsort + vectorized diff + two grouped
    reductions — no per-user Python loop."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))
    _HOUR_US = 3_600_000_000

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        part = (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table({"user_id": pa.array(uid), "us": pa.array(us), "part": pa.array(part)})

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "max_gap_us": pa.array([], pa.int64()),
            "gaps_over_1h": pa.array([], pa.int64()),
        }
    )

    def gaps(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        o = np.lexsort((us, uid))
        uid, us = uid[o], us[o]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        lens = np.diff(np.r_[starts, len(uid)])
        d = us[1:] - us[:-1]
        same = uid[1:] == uid[:-1]
        # per-user reductions over the gap array (gaps sit at positions
        # start..start+len-2 of d, all flagged `same`)
        dm = np.where(same, d, -1)
        over = np.where(same, (d > _HOUR_US).astype(np.int64), 0)
        # reduceat over run starts clipped into d's index space
        s_clip = np.minimum(starts, len(d) - 1) if len(d) else starts
        max_gap = (
            np.maximum.reduceat(dm, s_clip)
            if len(d)
            else np.full(len(starts), -1, np.int64)
        )
        n_over = (
            np.add.reduceat(over, s_clip) if len(d) else np.zeros(len(starts), np.int64)
        )
        # runs of length 1 whose start lands on a foreign gap position
        max_gap = np.where(lens > 1, max_gap, -1)
        n_over = np.where(lens > 1, n_over, 0)
        return pa.table(
            {
                "user_id": pa.array(uid[starts]),
                "n_events": pa.array(lens.astype(np.int64)),
                "max_gap_us": pa.array(max_gap.astype(np.int64)),
                "gaps_over_1h": pa.array(n_over.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(gaps, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_event_gaps() -> str:
    return """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS d
      FROM events
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(COALESCE(MAX(d), -1) AS BIGINT) AS max_gap_us,
           CAST(COALESCE(SUM(CASE WHEN d > 3600000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS gaps_over_1h
    FROM g GROUP BY user_id
    """


_RICH_BAL = 5000.0


def q_nation_setops(sf_dir: str):
    """Distributed set algebra (UNION / INTERSECT / EXCEPT in one pass):
    nations having rich customers vs nations having rich suppliers —
    one row per nation in either set with membership flags (intersect =
    both flags, except = exactly one).

    Scale shape: both sides reduce to distinct keys inside map_batches
    (per-batch np.unique), then one tiny flag groupby."""
    from ray.data.aggregate import Max

    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def side(key: str, bal: str, flag: str):
        def f(b: pa.Table) -> pa.Table:
            nk = b[key].to_numpy(zero_copy_only=False)
            keep = b[bal].to_numpy(zero_copy_only=False) > _RICH_BAL
            u = np.unique(nk[keep]).astype(np.int64)
            return pa.table(
                {
                    "nationkey": pa.array(u),
                    "in_customers": pa.array(
                        np.full(len(u), 1 if flag == "c" else 0, np.int64)
                    ),
                    "in_suppliers": pa.array(
                        np.full(len(u), 1 if flag == "s" else 0, np.int64)
                    ),
                }
            )

        return f

    both = cust.map_batches(side("c_nationkey", "c_acctbal", "c"), batch_format="pyarrow", zero_copy_batch=True).union(
        supp.map_batches(side("s_nationkey", "s_acctbal", "s"), batch_format="pyarrow", zero_copy_batch=True)
    )
    return both.groupby("nationkey").aggregate(
        Max("in_customers", alias_name="in_customers"),
        Max("in_suppliers", alias_name="in_suppliers"),
    )


def _sql_nation_setops() -> str:
    return f"""
    SELECT nationkey, CAST(MAX(c) AS BIGINT) AS in_customers,
           CAST(MAX(s) AS BIGINT) AS in_suppliers
    FROM (
      SELECT c_nationkey AS nationkey, 1 AS c, 0 AS s FROM customer WHERE c_acctbal > {_RICH_BAL}
      UNION ALL
      SELECT s_nationkey, 0, 1 FROM supplier WHERE s_acctbal > {_RICH_BAL}
    ) GROUP BY nationkey
    """


def q_customer_order_coverage(sf_dir: str):
    """LEFT OUTER join with null-preserving aggregate: per nation, how
    many customers exist, how many have at least one finished ('F')
    order, and the total finished-order count.

    Scale shape: the same hash co-partition engine as order_line_join
    but OUTER — unmatched build rows survive with zero counts; each part
    emits only per-nation partials so the final groupby is tiny."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])
    n_parts = int(max(8, min(4096, orders.count() // 200_000 + 1)))

    def tag_cust(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(np.asarray(k, np.int64)),
                "nationkey": pa.array(
                    b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "is_build": pa.array(np.ones(len(k), bool)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        st = b["o_orderstatus"].to_numpy(zero_copy_only=False)
        k = b["o_custkey"].to_numpy(zero_copy_only=False)[st == "F"]
        return pa.table(
            {
                "key": pa.array(k),
                "nationkey": pa.array(np.full(len(k), -1, np.int64)),
                "is_build": pa.array(np.zeros(len(k), bool)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "nationkey": pa.array([], pa.int64()),
            "n_customers": pa.array([], pa.int64()),
            "n_with_orders": pa.array([], pa.int64()),
            "n_orders": pa.array([], pa.int64()),
        }
    )

    def outer_part(t: pa.Table) -> pa.Table:
        isb = t["is_build"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        nk = t["nationkey"].to_numpy(zero_copy_only=False)
        b_idx = np.flatnonzero(isb)
        if len(b_idx) == 0:
            return _empty
        bk = key[b_idx]
        order = np.argsort(bk, kind="stable")
        bks = bk[order]
        pk = key[~isb]
        # per-customer order count via sorted counting
        cnt = np.zeros(len(bks), np.int64)
        if len(pk):
            pos = np.searchsorted(bks, pk)
            ok = (pos < len(bks)) & (bks[np.minimum(pos, len(bks) - 1)] == pk)
            np.add.at(cnt, pos[ok], 1)
        g = pd.DataFrame(
            {
                "nationkey": nk[b_idx[order]],
                "one": 1,
                "has": (cnt > 0).astype(np.int64),
                "n": cnt,
            }
        ).groupby("nationkey", sort=False).sum()
        return pa.table(
            {
                "nationkey": pa.array(g.index.to_numpy(np.int64)),
                "n_customers": pa.array(g["one"].to_numpy(np.int64)),
                "n_with_orders": pa.array(g["has"].to_numpy(np.int64)),
                "n_orders": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    return (
        cust.map_batches(tag_cust, batch_format="pyarrow", zero_copy_batch=True)
        .union(orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True))
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(outer_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("nationkey")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("n_with_orders", alias_name="n_with_orders"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )


def _sql_customer_order_coverage() -> str:
    return """
    WITH oc AS (
      SELECT o_custkey, count(*) AS n FROM orders
      WHERE o_orderstatus = 'F' GROUP BY o_custkey
    )
    SELECT c_nationkey AS nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN oc.n IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
           CAST(COALESCE(SUM(oc.n), 0) AS BIGINT) AS n_orders
    FROM customer LEFT JOIN oc ON c_custkey = o_custkey
    GROUP BY c_nationkey
    """


def q_image_size_stats(sf_dir: str):
    """Storage profile of the image corpus: per encoding format, blob
    count and total/min/max encoded size.

    Scale shape: lengths come from pa.compute.binary_length on the
    zero-copy batch and a per-batch combiner collapses to one row per
    (fmt x batch) — image bytes never leave the read task."""
    from ray.data.aggregate import Max, Min, Sum

    from . import tiling

    images = tiling.read_images(sf_dir, columns=["fmt", "bytes"])

    def partial(b: pa.Table) -> pa.Table:
        ln = pc.binary_length(b["bytes"]).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"fmt": b["fmt"].to_pylist(), "ln": ln})
        g = df.groupby("fmt", sort=False)["ln"].agg(["count", "sum", "min", "max"])
        return pa.table(
            {
                "fmt": pa.array(g.index.to_numpy(object), pa.string()),
                "n": pa.array(g["count"].to_numpy(np.int64)),
                "total_bytes": pa.array(g["sum"].to_numpy(np.int64)),
                "min_bytes": pa.array(g["min"].to_numpy(np.int64)),
                "max_bytes": pa.array(g["max"].to_numpy(np.int64)),
            }
        )

    return (
        images.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fmt")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("total_bytes", alias_name="total_bytes"),
            Min("min_bytes", alias_name="min_bytes"),
            Max("max_bytes", alias_name="max_bytes"),
        )
    )


def _sql_image_size_stats(sf: float = 0.01) -> str:
    import os

    from ..sources import synth as _synth

    path = os.path.join(_synth.CACHE_DIR, f"images_sf{sf:g}", "*.parquet")
    return f"""
    SELECT fmt, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(octet_length(bytes)) AS BIGINT) AS total_bytes,
           CAST(MIN(octet_length(bytes)) AS BIGINT) AS min_bytes,
           CAST(MAX(octet_length(bytes)) AS BIGINT) AS max_bytes
    FROM read_parquet('{path}') GROUP BY fmt
    """


# ---------------------------------------------------------------------------
# session-5 batch 3: sketches (CMS, Bloom), trajectory windows, ANN range
# ---------------------------------------------------------------------------

_CMS_D, _CMS_W = 4, 16  # narrow width on purpose: collisions must occur


def q_cms_heavy_hitters(sf_dir: str):
    """Count-Min-Sketch heavy hitters over the corpus token stream: build
    a d=4 x w=16 integer sketch, then report the top-20 tokens by exact
    count alongside their CMS estimate (est >= exact; strictly greater
    where buckets collide — w is deliberately narrow so the sketch's
    overestimate property is visible and verified).

    Scale shape: the sketch is a fixed 64-cell table built from per-batch
    combiners — the only thing that crosses the cluster is (d x w) partial
    counts per batch, never token occurrences.  Exact counts reuse the
    vocab_topk block-partial top-k."""
    from ray.data.aggregate import Sum

    from ..functions import dedup as dedup_f

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partials(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].astype(str).str.lower().str.split(" ").explode()
        toks = toks[toks.notna() & (toks != "")]
        vc = toks.value_counts()
        h = dedup_f.fnv1a_hashes(vc.index.to_numpy(object))
        out_tok, out_j, out_b, out_n = [], [], [], []
        for j in range(_CMS_D):
            b = (synth._splitmix64(h + np.uint64(j)) % np.uint64(_CMS_W)).astype(np.int64)
            g = pd.DataFrame({"b": b, "n": vc.to_numpy(np.int64)}).groupby("b", sort=False)["n"].sum()
            out_j.append(np.full(len(g), j, np.int64))
            out_b.append(g.index.to_numpy(np.int64))
            out_n.append(g.to_numpy(np.int64))
        sk = pa.table(
            {
                "j": pa.array(np.concatenate(out_j)),
                "b": pa.array(np.concatenate(out_b)),
                "n": pa.array(np.concatenate(out_n)),
                "tok": pa.array(np.full(sum(map(len, out_b)), "", object), pa.string()),
                "is_sketch": pa.array(np.ones(sum(map(len, out_b)), bool)),
            }
        )
        ex = pa.table(
            {
                "j": pa.array(np.zeros(len(vc), np.int64)),
                "b": pa.array(np.zeros(len(vc), np.int64)),
                "n": pa.array(vc.to_numpy(np.int64)),
                "tok": pa.array(vc.index.to_numpy(object), pa.string()),
                "is_sketch": pa.array(np.zeros(len(vc), bool)),
            }
        )
        return pa.concat_tables([sk, ex])

    mixed = ds.map_batches(partials, batch_format="pandas")
    sketch = (
        mixed.filter(expr="is_sketch")
        .groupby(["j", "b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= d*w = 64 rows
    )
    cells = {(int(r.j), int(r.b)): int(r.n) for r in sketch.itertuples()}
    exact = (
        mixed.filter(expr="is_sketch == False").groupby("tok").aggregate(Sum("n", alias_name="n"))
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "tok"], ascending=[False, True]).head(20)

    top = exact.map_batches(block_topk, batch_format="pandas").to_pandas()
    top = top.sort_values(["n", "tok"], ascending=[False, True]).head(20)
    h = dedup_f.fnv1a_hashes(top["tok"].to_numpy(object))
    est = np.full(len(top), np.iinfo(np.int64).max, np.int64)
    for j in range(_CMS_D):
        b = (synth._splitmix64(h + np.uint64(j)) % np.uint64(_CMS_W)).astype(np.int64)
        est = np.minimum(est, np.array([cells.get((j, int(bb)), 0) for bb in b], np.int64))
    return pa.table(
        {
            "tok": pa.array(top["tok"].astype(str)),
            "exact_n": pa.array(top["n"].to_numpy(np.int64)),
            "cms_n": pa.array(est),
        }
    )


def _sql_cms_heavy_hitters() -> str:
    cps = _CPS.format(col="tok")
    fnv = (
        f"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), {cps}),"
        f" (acc, b) -> (xor(acc, b) * 1099511628211) % {_U64})"
    )
    return f"""
    WITH occ AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '), s -> s <> '')) AS tok
      FROM documents
    ), exact AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n FROM occ GROUP BY tok
    ), dh AS (
      SELECT tok, {fnv} AS h FROM (SELECT DISTINCT tok FROM occ)
    ), buck AS (
      SELECT tok, j, CAST(({_sql_splitmix64(f"(h + j) % {_U64}")}) % {_CMS_W} AS BIGINT) AS b
      FROM dh CROSS JOIN (SELECT unnest(range({_CMS_D})) AS j)
    ), sketch AS (
      SELECT j, b, SUM(e.n) AS cell
      FROM buck JOIN exact e USING (tok) GROUP BY j, b
    ), est AS (
      SELECT buck.tok, CAST(MIN(s.cell) AS BIGINT) AS cms_n
      FROM buck JOIN sketch s USING (j, b) GROUP BY buck.tok
    )
    SELECT e.tok, e.n AS exact_n, est.cms_n
    FROM exact e JOIN est USING (tok)
    ORDER BY e.n DESC, e.tok LIMIT 20
    """


_BLOOM_M, _BLOOM_K = 1 << 16, 4


def q_bloom_membership(sf_dir: str):
    """Bloom-filter semi-join: build a 64Kbit / 4-hash Bloom filter over
    rich customers (acctbal > 5000) and probe every order — per order
    priority, total orders and Bloom-positive orders (includes the
    filter's false positives; the oracle reproduces the same bit math so
    the FP set matches exactly).

    Scale shape: the build side collapses to <= m distinct bit positions
    via per-batch unique + one groupby; probes test 4 positions against
    the broadcast 8 KiB bitset — the exact key set never ships (the whole
    point of a Bloom filter at 100 TB)."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def build(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False)
        k = np.unique(k[b["c_acctbal"].to_numpy(zero_copy_only=False) > _RICH_BAL]).astype(
            np.uint64
        )
        pos = np.concatenate(
            [
                (synth._splitmix64(k + np.uint64(j)) % np.uint64(_BLOOM_M)).astype(np.int64)
                for j in range(_BLOOM_K)
            ]
        ) if len(k) else np.empty(0, np.int64)
        return pa.table({"pos": pa.array(np.unique(pos))})

    from ray.data.aggregate import Count

    posdf = (
        cust.map_batches(build, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pos")
        .aggregate(Count(alias_name="c"))
        .to_pandas()  # <= m = 65536 rows
    )
    bits = np.zeros(_BLOOM_M, bool)
    bits[posdf["pos"].to_numpy(np.int64)] = True
    # 8 KiB when packed — small enough to ride the task closure; at a
    # larger m, ship via ray.put like q_revenue_by_nation's lookup
    packed = np.packbits(bits)

    def probe(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bb = np.unpackbits(packed).astype(bool)
        ok = np.ones(len(k), bool)
        for j in range(_BLOOM_K):
            pos = (synth._splitmix64(k + np.uint64(j)) % np.uint64(_BLOOM_M)).astype(np.int64)
            ok &= bb[pos]
        g = pd.DataFrame(
            {"priority": b["o_orderpriority"].to_pylist(), "one": 1, "pass_": ok.astype(np.int64)}
        ).groupby("priority", sort=False).sum()
        return pa.table(
            {
                "priority": pa.array(g.index.to_numpy(object), pa.string()),
                "n_orders": pa.array(g["one"].to_numpy(np.int64)),
                "n_bloom_pass": pa.array(g["pass_"].to_numpy(np.int64)),
            }
        )

    return (
        orders.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("priority")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("n_bloom_pass", alias_name="n_bloom_pass"),
        )
    )


def _sql_bloom_membership() -> str:
    sm = _sql_splitmix64(f"(CAST(k AS HUGEINT) + j) % {_U64}")
    return f"""
    WITH seeds AS (SELECT unnest(range({_BLOOM_K})) AS j),
    bits AS (
      SELECT DISTINCT CAST(({sm}) % {_BLOOM_M} AS BIGINT) AS pos
      FROM (SELECT c_custkey AS k FROM customer WHERE c_acctbal > {_RICH_BAL}), seeds
    ), probe AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(({_sql_splitmix64(f"(CAST(o_custkey AS HUGEINT) + j) % {_U64}")}) % {_BLOOM_M} AS BIGINT) AS pos
      FROM orders, seeds
    ), hit AS (
      SELECT o_orderkey, o_orderpriority, count(b.pos) AS c
      FROM probe LEFT JOIN bits b USING (pos)
      GROUP BY o_orderkey, o_orderpriority
    )
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN c = {_BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass
    FROM hit GROUP BY o_orderpriority
    """


def q_user_travel(sf_dir: str):
    """Trajectory aggregate: per user, the number of moves and total
    path length over their time-ordered event positions (mercator-plane
    euclidean legs).  Each leg is integer-ized (floor(d * 1e6)) BEFORE
    summing, so both engines sum exact integers — float SUM order never
    matters (same rule as running_totals' cents).

    Scale shape: one user-hash part-exchange; each part lexsorts
    (user, ts, event_id) once and computes every leg vectorized."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        lon, lat = _event_lonlat(eid)
        mx, my = S.mercator_xy(lon, lat)
        part = (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "eid": pa.array(eid),
                "us": pa.array(us),
                "mx": pa.array(mx),
                "my": pa.array(my),
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_moves": pa.array([], pa.int64()),
            "dist_e6": pa.array([], pa.int64()),
        }
    )

    def travel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        mx = t["mx"].to_numpy(zero_copy_only=False)
        my = t["my"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, us, uid))
        uid, mx, my = uid[o], mx[o], my[o]
        dx = mx[1:] - mx[:-1]
        dy = my[1:] - my[:-1]
        leg = np.floor(np.sqrt(dx * dx + dy * dy) * 1e6).astype(np.int64)
        same = uid[1:] == uid[:-1]
        g = pd.DataFrame(
            {"user_id": uid[1:][same], "one": 1, "leg": leg[same]}
        ).groupby("user_id", sort=False).sum()
        # users with a single event still appear, with zero moves
        singles = np.setdiff1d(np.unique(uid), g.index.to_numpy())
        return pa.table(
            {
                "user_id": pa.array(
                    np.concatenate([g.index.to_numpy(np.int64), singles.astype(np.int64)])
                ),
                "n_moves": pa.array(
                    np.concatenate([g["one"].to_numpy(np.int64), np.zeros(len(singles), np.int64)])
                ),
                "dist_e6": pa.array(
                    np.concatenate([g["leg"].to_numpy(np.int64), np.zeros(len(singles), np.int64)])
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(travel, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_user_travel() -> str:
    mx, my = _mercator_sql("lon", "lat")
    return f"""
    WITH p AS (
      SELECT user_id, ts, event_id, {mx} AS mx, {my} AS my
      FROM (SELECT user_id, ts, event_id, {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events)
    ), legs AS (
      SELECT user_id,
             CAST(floor(sqrt((mx - lag(mx) OVER w) * (mx - lag(mx) OVER w)
                             + (my - lag(my) OVER w) * (my - lag(my) OVER w)) * 1e6) AS BIGINT) AS leg
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(leg) AS BIGINT) AS n_moves,
           CAST(COALESCE(SUM(leg), 0) AS BIGINT) AS dist_e6
    FROM legs GROUP BY user_id
    """


_ANN_RANGE_TAU = 0.3


def q_ann_range_search(sf_dir: str):
    """ANN range search (the radius variant of ann_cosine_top5): every
    embedding with cosine similarity > tau to any of the 3 query vectors.
    Measured decision margin at tau=0.3 is >= 4.5e-4 on the test corpora
    — six orders of magnitude above cross-engine float noise, so the
    classification is stable.

    Scale shape: per-batch matmul against the broadcast 3 x dim query
    matrix; only hits leave the task."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = emb.filter(expr="vec_id < 3").to_pandas().sort_values("vec_id")
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qids = qdf["vec_id"].to_numpy(np.int64)

    def rng(b: pa.Table) -> pa.Table:
        vecs = np.stack(b["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = qn @ vn.T
        qi, vi = np.nonzero(sims > _ANN_RANGE_TAU)
        return pa.table(
            {
                "query_vec_id": pa.array(qids[qi]),
                "vec_id": pa.array(ids[vi].astype(np.int64)),
            }
        )

    return emb.map_batches(rng, batch_format="pyarrow", zero_copy_batch=True)


def _sql_ann_range_search() -> str:
    return f"""
    WITH qs AS (SELECT vec_id AS query_vec_id, embedding AS qe FROM embeddings WHERE vec_id < 3)
    SELECT q.query_vec_id, e.vec_id
    FROM qs q CROSS JOIN embeddings e
    WHERE list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) > {_ANN_RANGE_TAU}
    """


# ---------------------------------------------------------------------------
# session-5 batch 4: count-of-counts, calendar rollup, HLL merge, captions
# ---------------------------------------------------------------------------


def q_degree_histogram(sf_dir: str):
    """Count-of-counts (degree distribution): how many customers placed
    exactly n orders, for every observed n — the two-level aggregate that
    profiles graph/key skew before choosing a partitioning.

    Scale shape: level 1 is a per-batch (custkey, n) combiner + bounded
    groupby; level 2 re-combines the counts column per batch so the final
    histogram groupby sees only distinct degrees per block."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_custkey"])

    def partial(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        u, c = np.unique(k, return_counts=True)
        return pa.table(
            {"custkey": pa.array(u.astype(np.int64)), "n": pa.array(c.astype(np.int64))}
        )

    per_cust = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("custkey")
        .aggregate(Sum("n", alias_name="n"))
    )

    def hist(b: pa.Table) -> pa.Table:
        u, c = np.unique(b["n"].to_numpy(zero_copy_only=False), return_counts=True)
        return pa.table(
            {
                "n_orders": pa.array(u.astype(np.int64)),
                "n_customers": pa.array(c.astype(np.int64)),
            }
        )

    return (
        per_cust.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_orders")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )


def _sql_degree_histogram() -> str:
    return """
    SELECT n AS n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM orders GROUP BY o_custkey)
    GROUP BY n
    """


def q_orders_by_month(sf_dir: str):
    """Calendar rollup: order count and revenue cents per (year, month)
    — exercises date-part extraction (numpy datetime64[M] arithmetic vs
    SQL date_trunc) with integer-exact money."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[M]")
        y = d.astype("datetime64[Y]").astype(np.int64) + 1970
        m = d.astype(np.int64) % 12 + 1
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "ym": pa.array(y * 100 + m),
                "cents": pa.array(cents),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ym")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="revenue_cents"))
    )


def _sql_orders_by_month() -> str:
    return """
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM orders GROUP BY 1
    """


def q_orders_skyline(sf_dir: str):
    """Skyline (Pareto frontier) query: orders not dominated on
    (totalprice max, orderdate min) — the "largest-earliest" preference
    frontier.  p dominates q iff p.cents >= q.cents AND p.day <= q.day
    with at least one strict; ties on both axes are mutually
    non-dominating and all survive.

    Scale shape: dominance is transitive, so every block computes its
    LOCAL skyline with one vectorized sweep (sort by cents desc / day
    asc, a point survives iff its day equals its cents-group minimum and
    beats the running min over strictly-richer groups) and the driver
    merges only the tiny block skylines with the same sweep — the classic
    distributed-skyline decomposition; no shuffle at all.  All integer
    (cents, epoch days), so cross-engine exact."""

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderdate"])

    def local_skyline(b: pa.Table) -> pa.Table:
        key = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        day = (
            b["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        keep = _skyline_sweep(cents, day)
        return pa.table(
            {
                "o_orderkey": pa.array(key[keep]),
                "cents": pa.array(cents[keep]),
                "day": pa.array(day[keep]),
            }
        )

    cand = ds.map_batches(
        local_skyline, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    keep = _skyline_sweep(cand["cents"].to_numpy(np.int64), cand["day"].to_numpy(np.int64))
    out = cand.iloc[keep].sort_values("o_orderkey", ignore_index=True)
    return pa.table(
        {
            "o_orderkey": pa.array(out["o_orderkey"].to_numpy(np.int64)),
            "cents": pa.array(out["cents"].to_numpy(np.int64)),
            "day": pa.array(out["day"].to_numpy(np.int64)),
        }
    )


def _skyline_sweep(cents: np.ndarray, day: np.ndarray) -> np.ndarray:
    """Indices of the 2D skyline (cents max, day min), vectorized: group
    by distinct cents (desc); a row survives iff day == its group min AND
    that min < the running min over all strictly-greater-cents groups."""
    if len(cents) == 0:
        return np.empty(0, np.int64)
    order = np.lexsort((day, -cents))
    c, d = cents[order], day[order]
    new = np.r_[True, c[1:] != c[:-1]]
    seg = np.cumsum(new) - 1
    gmin = d[new]  # day is asc within each cents group -> first is the min
    before = np.r_[np.int64(np.iinfo(np.int64).max), np.minimum.accumulate(gmin)[:-1]]
    survive = (d == gmin[seg]) & (gmin[seg] < before[seg])
    return order[np.flatnonzero(survive)]


def _sql_orders_skyline() -> str:
    return """
    WITH t AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents,
             CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day
      FROM orders
    )
    SELECT o_orderkey, cents, day FROM t q
    WHERE NOT EXISTS (
      SELECT 1 FROM t p
      WHERE p.cents >= q.cents AND p.day <= q.day
        AND (p.cents > q.cents OR p.day < q.day)
    )
    """


def q_user_event_entropy(sf_dir: str):
    """Shannon-entropy profile per user over their event-type
    distribution — the information-theoretic behavioral-diversity signal
    (low entropy = bot-like single-action users).

    Exactness: H = sum_t (c_t/n) ln(n/c_t) is summed as QUANTIZED
    INTEGER terms — each term floor(ln(n/c)*c*1e6/n) is one fixed-arity
    IEEE expression over the same two ints on both engines, and the
    per-user sum is then order-free integer addition (float SUM order is
    engine-unspecified; this sidesteps it, same trick as
    q_unigram_logprob).

    Scale shape: ONE user-hash part-exchange; each part resolves all its
    users vectorized (lexsort + run-length segments for per-(user,type)
    counts, reduceat for per-user totals) — no per-user dispatch."""
    n_parts = 64

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def tag(df: pd.DataFrame) -> pa.Table:
        # per-batch (user, type) combiner before the exchange
        g = df.groupby(["user_id", "event_type"], sort=False).size().reset_index(name="c")
        u = g["user_id"].to_numpy(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u),
                "event_type": pa.array(g["event_type"].astype(str).to_numpy(object), pa.string()),
                "c": pa.array(g["c"].to_numpy(np.int64)),
                "part": pa.array(
                    (synth._splitmix64(u.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    def entropy_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_types": pa.array([], pa.int64()),
                    "entropy_micro": pa.array([], pa.int64()),
                }
            )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pylist(), object)
        c = t["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((et, uid))
        uid, et, c = uid[order], et[order], c[order]
        # merge split partials for the same (user, type)
        new_pair = np.r_[True, (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])]
        pair_seg = np.cumsum(new_pair) - 1
        c = np.bincount(pair_seg, weights=c).astype(np.int64)
        uid = uid[new_pair]
        new_u = np.r_[True, uid[1:] != uid[:-1]]
        useg = np.cumsum(new_u) - 1
        n = np.bincount(useg, weights=c).astype(np.int64)[useg]
        term = np.floor(np.log(n / c) * c * 1000000.0 / n).astype(np.int64)
        users = uid[new_u]
        return pa.table(
            {
                "user_id": pa.array(users),
                "n_events": pa.array(np.bincount(useg, weights=c).astype(np.int64)),
                "n_types": pa.array(np.bincount(useg).astype(np.int64)),
                "entropy_micro": pa.array(np.bincount(useg, weights=term).astype(np.int64)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(entropy_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_user_event_entropy() -> str:
    return """
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type
    ), n AS (
      SELECT user_id, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_types
      FROM c GROUP BY user_id
    )
    SELECT c.user_id,
           ANY_VALUE(n.n) AS n_events,
           ANY_VALUE(n.n_types) AS n_types,
           CAST(SUM(CAST(floor(ln(CAST(n.n AS DOUBLE) / c.c) * c.c * 1000000.0 / n.n) AS BIGINT)) AS BIGINT) AS entropy_micro
    FROM c JOIN n USING (user_id)
    GROUP BY c.user_id
    """


def q_events_anomaly(sf_dir: str):
    """Per-user anomaly detection: count events whose value is a 3-sigma
    outlier against the USER'S OWN distribution — the per-entity outlier
    screen a data-quality stage runs before training.

    Exactness: the z-score test is cross-multiplied into a pure INTEGER
    predicate — (v*n - s)^2 > 9*(ss*n - s^2) with v in cents — so no
    sqrt, no division, no float ever enters and both engines agree
    bit-for-bit (population sigma; sigma=0 users flag nothing).  Within
    int64 while n * max|v - mean| < 3e9 (documented bound; the SQL side
    computes in HUGEINT regardless).

    Scale shape: ONE user-hash part-exchange; each part computes its
    users' moments with reduceat and flags its events vectorized — the
    same one-shuffle co-group as q_user_event_entropy, no driver state."""
    n_parts = 64

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def tag(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        v = np.floor(b["value"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid.astype(np.int64)),
                "v": pa.array(v),
                "part": pa.array(
                    (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    def flag_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_outliers": pa.array([], pa.int64()),
                }
            )
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, v = uid[order], v[order]
        new = np.r_[True, uid[1:] != uid[:-1]]
        seg = np.cumsum(new) - 1
        n = np.bincount(seg)
        # np.add.at keeps the moment sums in EXACT int64 — bincount's
        # float64 weights would round ss above 2^53 and break the
        # bit-for-bit oracle claim inside the documented int64 bound
        s = np.zeros(len(n), np.int64)
        np.add.at(s, seg, v)
        ss = np.zeros(len(n), np.int64)
        np.add.at(ss, seg, v * v)
        lhs = v * n[seg] - s[seg]
        out = lhs * lhs > 9 * (ss[seg] * n[seg] - s[seg] * s[seg])
        n_out = np.zeros(len(n), np.int64)
        np.add.at(n_out, seg, out.astype(np.int64))
        return pa.table(
            {
                "user_id": pa.array(uid[new]),
                "n_events": pa.array(n.astype(np.int64)),
                "n_outliers": pa.array(n_out),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(flag_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_events_anomaly() -> str:
    return """
    WITH e AS (
      SELECT user_id, CAST(floor(value * 100.0) AS BIGINT) AS v FROM events
    ), m AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             CAST(SUM(v * v) AS BIGINT) AS ss
      FROM e GROUP BY user_id
    )
    SELECT e.user_id,
           ANY_VALUE(m.n) AS n_events,
           CAST(SUM(CASE WHEN CAST(e.v * m.n - m.s AS HUGEINT) * (e.v * m.n - m.s)
                              > 9 * (CAST(m.ss AS HUGEINT) * m.n - CAST(m.s AS HUGEINT) * m.s)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM e JOIN m USING (user_id)
    GROUP BY e.user_id
    """


def q_hll_by_event_type(sf_dir: str):
    """HLL sketch algebra: one HyperLogLog per event type PLUS their
    register-wise union merged into an 'ALL' row — demonstrating that
    union-of-sketches equals sketch-of-union (the merged estimate is
    bit-identical to hll_distinct_users's global estimate).  Registers
    and power sums stay integer-exact; only the final fixed-arity IEEE
    expression is float (the hll_distinct_users technique, grouped).

    Scale shape: per-batch (type, bucket, rho) combiners -> one groupby
    MAX bounded by |types| x 1024 rows; the merge is a register-wise max
    on the driver over that bounded table."""
    import math

    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def regs(b: pa.Table) -> pa.Table:
        h = synth._splitmix64(b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
        bucket = (h & np.uint64(_HLL_M - 1)).astype(np.int64)
        rest = h >> np.uint64(_HLL_P)
        low = rest & (~rest + np.uint64(1))
        tz = np.zeros(len(rest), np.int64)
        nz = low > 0
        tz[nz] = np.log2(low[nz].astype(np.float64)).astype(np.int64)
        rho = np.minimum(np.where(nz, tz + 1, 54), 54).astype(np.int64)
        df = pd.DataFrame(
            {"event_type": b["event_type"].to_pylist(), "bucket": bucket, "rho": rho}
        )
        g = df.groupby(["event_type", "bucket"], sort=False)["rho"].max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    reg = (
        ds.map_batches(regs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "bucket"])
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()  # <= |types| x 1024 rows
    )
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)

    def estimate(rhos: pd.Series) -> tuple[int, int]:
        pow_sum = sum(1 << (54 - int(r)) for r in rhos) + (_HLL_M - len(rhos)) * (1 << 54)
        return len(rhos), math.floor(
            alpha * 1048576.0 * 18014398509481984.0 / float(pow_sum)
        )

    rows = []
    for et, g in reg.groupby("event_type", sort=True):
        m_used, est = estimate(g["rho"])
        rows.append((et, m_used, est))
    merged = reg.groupby("bucket", sort=True)["rho"].max()
    m_used, est = estimate(merged)
    rows.append(("ALL", m_used, est))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "m_used": pa.array(np.array([r[1] for r in rows], np.int64)),
            "estimate": pa.array(np.array([r[2] for r in rows], np.int64)),
        }
    )


def _sql_hll_by_event_type() -> str:
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    est = (
        f"CAST(floor(CAST({alpha!r} AS DOUBLE) * 1048576.0 * 18014398509481984.0"
        f" / CAST(ps + ({_HLL_M} - m_used) * (CAST(1 AS HUGEINT) << 54) AS DOUBLE)) AS BIGINT)"
    )
    return f"""
    WITH z AS (
      SELECT event_type, {_sql_splitmix64("user_id")} AS z FROM events
    ), rh AS (
      SELECT event_type, CAST(z % {_HLL_M} AS BIGINT) AS bucket,
             CASE WHEN z // {_HLL_M} = 0 THEN 54
                  ELSE LEAST(CAST(bit_count(((z // {_HLL_M}) & ({_U64} - (z // {_HLL_M}))) - 1) AS BIGINT) + 1, 54)
             END AS rho
      FROM z
    ), reg AS (
      SELECT event_type, bucket, MAX(rho) AS rho FROM rh GROUP BY event_type, bucket
    ), per_type AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS m_used,
             SUM(CAST(1 AS HUGEINT) << (54 - rho)) AS ps
      FROM reg GROUP BY event_type
    ), merged AS (
      SELECT 'ALL' AS event_type, CAST(count(*) AS BIGINT) AS m_used,
             SUM(CAST(1 AS HUGEINT) << (54 - rho)) AS ps
      FROM (SELECT bucket, MAX(rho) AS rho FROM reg GROUP BY bucket)
    )
    SELECT event_type, m_used, {est} AS estimate FROM per_type
    UNION ALL
    SELECT event_type, m_used, {est} AS estimate FROM merged
    """


def q_caption_word_stats(sf_dir: str):
    """Caption-text profile of the image corpus (the north-star input is
    image + caption pairs): distribution of caption word counts, with
    distinct-word totals per length class.

    Scale shape: map-only pandas str ops on the pruned caption column +
    per-batch combiner; image bytes are never read."""
    from ray.data.aggregate import Sum

    from . import tiling

    images = tiling.read_images(sf_dir, columns=["image_id", "caption"])

    def stats(df: pd.DataFrame) -> pa.Table:
        words = df["caption"].astype(str).str.split(" ")
        n_words = words.str.len().to_numpy(np.int64)
        n_distinct = np.fromiter((len(set(w)) for w in words), np.int64, len(words))
        g = pd.DataFrame({"n_words": n_words, "one": 1, "nd": n_distinct}).groupby(
            "n_words", sort=False
        ).sum()
        return pa.table(
            {
                "n_words": pa.array(g.index.to_numpy(np.int64)),
                "n_captions": pa.array(g["one"].to_numpy(np.int64)),
                "total_distinct_words": pa.array(g["nd"].to_numpy(np.int64)),
            }
        )

    return (
        images.map_batches(stats, batch_format="pandas")
        .groupby("n_words")
        .aggregate(
            Sum("n_captions", alias_name="n_captions"),
            Sum("total_distinct_words", alias_name="total_distinct_words"),
        )
    )


def _sql_caption_word_stats(sf: float = 0.01) -> str:
    import os

    from ..sources import synth as _synth

    path = os.path.join(_synth.CACHE_DIR, f"images_sf{sf:g}", "*.parquet")
    return f"""
    SELECT CAST(len(string_split(caption, ' ')) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_captions,
           CAST(SUM(len(list_distinct(string_split(caption, ' ')))) AS BIGINT) AS total_distinct_words
    FROM read_parquet('{path}') GROUP BY 1
    """


# ---------------------------------------------------------------------------
# session-5 batch 5: nearest-centroid assign, framed windows, interpolation
# ---------------------------------------------------------------------------


def q_region_nearest(sf_dir: str):
    """Nearest-centroid assignment: each event point to the closest of
    the 5 region-box centers (degree-plane euclidean, tie-break lowest
    region key).  Distances are pure arithmetic on hash-derived lon/lat
    (no trig), so both engines compute bit-identical doubles and the
    argmin/quantize are exact.

    Scale shape: the 5-row centroid table broadcasts in the closure; the
    assign is one vectorized argmin per batch — the k-means assign step
    as a standalone relational operator."""
    boxes = _region_boxes()
    cx = ((boxes["lon0"] + boxes["lon1"]) / 2.0).to_numpy()
    cy = ((boxes["lat0"] + boxes["lat1"]) / 2.0).to_numpy()
    rk = boxes["r_regionkey"].to_numpy(np.int64)

    def assign(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        lon, lat = _event_lonlat(eid)
        dx = lon[:, None] - cx[None, :]
        dy = lat[:, None] - cy[None, :]
        d2 = dx * dx + dy * dy
        best = np.argmin(d2, axis=1)  # ties -> lowest index == lowest key
        bd = d2[np.arange(len(eid)), best]
        return pa.table(
            {
                "event_id": pa.array(eid),
                "r_regionkey": pa.array(rk[best]),
                "d2_e6": pa.array(np.floor(bd * 1e6).astype(np.int64)),
            }
        )

    return _read(sf_dir, "events", ["event_id"]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def _sql_region_nearest() -> str:
    return f"""
    WITH pts AS (SELECT event_id, {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    cents AS (SELECT r_regionkey,
                     (-160.0 + r_regionkey * 64.0 + (-160.0 + r_regionkey * 64.0 + 52.0)) / 2.0 AS cx,
                     (-70.0 + r_regionkey * 26.0 + (-70.0 + r_regionkey * 26.0 + 36.0)) / 2.0 AS cy
              FROM region),
    d AS (SELECT p.event_id, c.r_regionkey,
                 (p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy) AS d2,
                 row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY (p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy),
                            c.r_regionkey
                 ) AS rn
          FROM pts p CROSS JOIN cents c)
    SELECT event_id, CAST(r_regionkey AS BIGINT) AS r_regionkey,
           CAST(floor(d2 * 1e6) AS BIGINT) AS d2_e6
    FROM d WHERE rn = 1
    """


def q_moving_avg_spend(sf_dir: str):
    """Frame-bounded window aggregate (ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW): per user, the moving 3-event sum of event value cents
    in (ts, event_id) order.  Cents are integer-ized before the framed
    sum, so the window arithmetic is exact on both engines (the
    running_totals rule applied to a bounded frame).

    Scale shape: one user-hash part-exchange; each part computes every
    user's framed sums from one prefix-sum array (cs[i+1] -
    cs[max(i-2, run_start)]) — no per-user loop, no per-row window
    state."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        part = (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": pa.array(uid),
                "us": pa.array(us),
                "cents": pa.array(cents),
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {
            "event_id": pa.array([], pa.int64()),
            "user_id": pa.array([], pa.int64()),
            "ma3_cents": pa.array([], pa.int64()),
        }
    )

    def framed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, us, uid))
        eid, uid, cents = eid[o], uid[o], cents[o]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        run_start = np.repeat(starts, np.diff(np.r_[starts, len(uid)]))
        cs = np.r_[0, np.cumsum(cents)]
        i = np.arange(len(uid))
        lo = np.maximum(i - 2, run_start)
        ma3 = cs[i + 1] - cs[lo]
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(uid),
                "ma3_cents": pa.array(ma3.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(framed, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_moving_avg_spend() -> str:
    return """
    SELECT event_id, user_id,
           CAST(SUM(CAST(floor(value * 100.0) AS BIGINT)) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
                ) AS BIGINT) AS ma3_cents
    FROM events
    """


_INTERP_QS = [(0.5, 50), (0.9, 90), (0.99, 99)]


def q_price_percentiles_interp(sf_dir: str):
    """Interpolated (percentile_cont-style) quantiles per return flag —
    the ordered-set-aggregate counterpart of price_quantiles' exact rank
    pick.  pos = (n-1)*q; result = lo + (hi-lo)*frac where lo/hi are the
    exact integer cents at the bracketing ranks — both engines evaluate
    the identical fixed-arity IEEE expression over exact integers, so
    the quantized output is bit-exact.

    Scale shape: the shared two-pass rank search (_cents_rank_search)
    fetches the two bracketing ranks per quantile; the one-pass value
    histogram this replaced measured 30.6 s at sf0.1 (near-unique cents
    made the partial stream ~the table; see the helper docstring)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def ranks(n: int) -> list[int]:
        out = []
        for q, _pct in _INTERP_QS:
            pos = (n - 1) * q  # same IEEE expression as the SQL
            klo = int(np.floor(pos))
            khi = min(klo + 1, n - 1)
            out += [klo + 1, khi + 1]  # 1-based bracketing ranks
        return out

    totals, at = _cents_rank_search(ds, "l_returnflag", "l_extendedprice", ranks)
    rows = []
    for flag in sorted(totals):
        n = totals[flag]
        for q, pct in _INTERP_QS:
            pos = (n - 1) * q
            klo = int(np.floor(pos))
            khi = min(klo + 1, n - 1)
            lo = at[flag][klo + 1]
            hi = at[flag][khi + 1]
            res = lo + (hi - lo) * (pos - np.floor(pos))
            rows.append((flag, pct, int(np.floor(res * 100.0))))
    return pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
            "pct": pa.array(np.array([r[1] for r in rows], np.int64)),
            "value_c2": pa.array(np.array([r[2] for r in rows], np.int64)),
        }
    )


def _sql_price_percentiles_interp() -> str:
    # CAST each literal: bare decimals parse as exact DECIMAL in DuckDB,
    # which makes (n-1)*q differ from IEEE double arithmetic by an ulp
    qlits = ", ".join(f"CAST({q!r} AS DOUBLE)" for q, _ in _INTERP_QS)
    plits = ", ".join(str(p) for _, p in _INTERP_QS)
    return f"""
    WITH c AS (
      SELECT l_returnflag AS f, CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS v
      FROM lineitem
    ), r AS (
      SELECT f, v, row_number() OVER (PARTITION BY f ORDER BY v) - 1 AS rn,
             count(*) OVER (PARTITION BY f) AS n
      FROM c
    ), qs AS (SELECT unnest([{qlits}]) AS q, unnest([{plits}]) AS pct),
    sel AS (
      SELECT r.f, qs.q, qs.pct, MAX(r.n) AS n,
             MAX(CASE WHEN rn = CAST(floor((n - 1) * q) AS BIGINT) THEN v END) AS lo,
             MAX(CASE WHEN rn = LEAST(CAST(floor((n - 1) * q) AS BIGINT) + 1, n - 1) THEN v END) AS hi
      FROM r CROSS JOIN qs GROUP BY r.f, qs.q, qs.pct
    )
    SELECT f AS l_returnflag, CAST(pct AS BIGINT) AS pct,
           CAST(floor((lo + (hi - lo) * ((n - 1) * q - floor((n - 1) * q))) * 100.0) AS BIGINT) AS value_c2
    FROM sel
    """


# ---------------------------------------------------------------------------
# session-5 batch 6: CUBE, temporal first/last, correlated filter, OD flows
# ---------------------------------------------------------------------------


def q_orders_cube(sf_dir: str):
    """GROUP BY CUBE(status, priority): all four grouping combinations
    from ONE fine exchange — the (status, priority) groupby runs once
    and every coarser level re-aggregates its dimension-bounded result
    (the orders_rollup pattern completed to the full cube).  'ALL'
    sentinel matches the oracle's coalesced NULLs."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = np.floor(b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        return pa.table(
            {
                "status": b["o_orderstatus"],
                "priority": b["o_orderpriority"],
                "cents": pa.array(cents),
            }
        )

    fine = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["status", "priority"])
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="cents"))
        .to_pandas()  # |status| x |priority| rows
    )
    levels = []
    for by in (["status", "priority"], ["status"], ["priority"], []):
        if by:
            g = fine.groupby(by, as_index=False)[["n", "cents"]].sum()
        else:
            g = pd.DataFrame({"n": [fine["n"].sum()], "cents": [fine["cents"].sum()]})
        for col in ("status", "priority"):
            if col not in g:
                g[col] = "ALL"
        levels.append(g[["status", "priority", "n", "cents"]])
    out = pd.concat(levels, ignore_index=True)
    return pa.table(
        {
            "status": pa.array(out["status"].astype(str)),
            "priority": pa.array(out["priority"].astype(str)),
            "n": pa.array(out["n"].to_numpy(np.int64)),
            "cents": pa.array(out["cents"].to_numpy(np.int64)),
        }
    )


def _sql_orders_cube() -> str:
    return """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """


def q_user_first_last(sf_dir: str):
    """Temporal FIRST_VALUE / LAST_VALUE: each user's first and last
    event type (by ts, event_id) plus lifetime span in seconds — the
    argmin/argmax-by-time window pair.

    Scale shape: one user-hash part-exchange; run heads and tails of the
    per-part lexsort answer every user at once."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        part = (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "eid": b["event_id"],
                "us": pa.array(us),
                "event_type": b["event_type"],
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "first_type": pa.array([], pa.string()),
            "last_type": pa.array([], pa.string()),
            "span_s": pa.array([], pa.int64()),
        }
    )

    def firstlast(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, us, uid))
        uid, us, et = uid[o], us[o], et[o]
        heads = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        tails = np.r_[heads[1:] - 1, len(uid) - 1]
        return pa.table(
            {
                "user_id": pa.array(uid[heads]),
                "first_type": pa.array(et[heads], pa.string()),
                "last_type": pa.array(et[tails], pa.string()),
                "span_s": pa.array((us[tails] - us[heads]) // 1_000_000),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(firstlast, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_user_first_last() -> str:
    return """
    WITH w AS (
      SELECT user_id,
             first_value(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
             last_value(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
             (max(epoch_us(ts)) OVER (PARTITION BY user_id)
              - min(epoch_us(ts)) OVER (PARTITION BY user_id)) // 1000000 AS span_s
      FROM events
    )
    SELECT DISTINCT user_id, first_type, last_type, CAST(span_s AS BIGINT) AS span_s
    FROM w
    """


def q_orders_above_cust_avg(sf_dir: str):
    """Correlated-subquery filter: orders whose price exceeds their own
    customer's average order price.  The comparison is the exact integer
    cross-multiply cents * n_orders > sum_cents — no division, so no
    float appears anywhere and both engines agree bit-for-bit.

    Scale shape: one custkey hash co-partition; each part derives the
    per-customer (n, sum) from its own rows and filters in place — the
    correlated aggregate never becomes a second exchange."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    n_parts = int(max(8, min(4096, ds.count() // 200_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        part = (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "custkey": pa.array(k),
                "cents": pa.array(cents),
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
        }
    )

    def above(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        k = t["custkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        o = np.argsort(k, kind="stable")
        ks, cs = k[o], cents[o]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        lens = np.diff(np.r_[starts, len(ks)])
        sums = np.add.reduceat(cs, starts)
        n_rep = np.repeat(lens, lens)
        sum_rep = np.repeat(sums, lens)
        keep = cs * n_rep > sum_rep
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)[o]
        return pa.table(
            {"o_orderkey": pa.array(okey[keep]), "cents": pa.array(cs[keep])}
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(above, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_orders_above_cust_avg() -> str:
    return """
    WITH c AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders
    ), agg AS (
      SELECT o_custkey, count(*) AS n, SUM(cents) AS s FROM c GROUP BY o_custkey
    )
    SELECT c.o_orderkey, c.cents
    FROM c JOIN agg USING (o_custkey)
    WHERE c.cents * agg.n > agg.s
    """


_OD_RES = 2


def q_hex_od_flows(sf_dir: str):
    """Origin-destination flow matrix: counts of consecutive same-user
    movements between res-2 hex cells (time-ordered) — the trajectory
    transition aggregate mobility pipelines run at fleet scale.

    Scale shape: one user-hash part-exchange produces every consecutive
    pair vectorized; a per-part (src, dst) combiner bounds the final
    groupby at distinct-cell-pairs per part."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        lon, lat = _event_lonlat(eid)
        cell = S.lonlat_to_hex(lon, lat, _OD_RES)
        part = (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "eid": pa.array(eid),
                "us": pa.array(us),
                "cell": pa.array(cell),
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {
            "src": pa.array([], pa.int64()),
            "dst": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def flows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, us, uid))
        uid, cell = uid[o], cell[o]
        same = uid[1:] == uid[:-1]
        src, dst = cell[:-1][same], cell[1:][same]
        g = pd.DataFrame({"src": src, "dst": dst, "one": 1}).groupby(
            ["src", "dst"], sort=False
        ).sum()
        idx = g.index.to_frame(index=False)
        return pa.table(
            {
                "src": pa.array(idx["src"].to_numpy(np.int64)),
                "dst": pa.array(idx["dst"].to_numpy(np.int64)),
                "n": pa.array(g["one"].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(flows, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Sum("n", alias_name="n"))
    )


def _sql_hex_od_flows() -> str:
    cell = _hex_sql(_OD_RES)
    return f"""
    WITH p AS (
      SELECT user_id, ts, event_id, {cell} AS cell
      FROM (SELECT user_id, ts, event_id, {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events)
    ), seq AS (
      SELECT user_id, cell AS dst,
             lag(cell) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
      FROM p
    )
    SELECT src, dst, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE src IS NOT NULL
    GROUP BY src, dst
    """


# ---------------------------------------------------------------------------
# session-5 batch 7: JSON extraction, set similarity, robust stats, n-grams
# ---------------------------------------------------------------------------


def q_json_props_stats(sf_dir: str):
    """Semi-structured extraction: parse the JSON `props` payload column
    ('{"k": N}') and aggregate the extracted integer per event type —
    the schema-on-read step every log pipeline runs before anything
    relational.

    Scale shape: vectorized pandas str.extract per batch + combiner; the
    JSON text never leaves the read task."""
    from ray.data.aggregate import Max, Sum

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(df: pd.DataFrame) -> pa.Table:
        k = df["props"].astype(str).str.extract(r'"k": ([0-9]+)', expand=False)
        kv = pd.to_numeric(k, errors="coerce").fillna(-1).astype(np.int64)
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(object), "k": kv}).groupby(
            "event_type", sort=False
        )["k"].agg(["count", "sum", "max"])
        return pa.table(
            {
                "event_type": pa.array(g.index.to_numpy(object), pa.string()),
                "n": pa.array(g["count"].to_numpy(np.int64)),
                "sum_k": pa.array(g["sum"].to_numpy(np.int64)),
                "max_k": pa.array(g["max"].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(extract, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


def _sql_json_props_stats() -> str:
    return """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(COALESCE(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT), -1)) AS BIGINT) AS sum_k,
           CAST(MAX(COALESCE(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT), -1)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """


def q_event_type_jaccard(sf_dir: str):
    """Pairwise set similarity between event types over their user sets:
    for every type pair, |users_a ∩ users_b| and |users_a ∪ users_b| —
    the audience-overlap matrix, kept integer (the Jaccard ratio is the
    caller's one division).

    Scale shape: (user, type) dedup per batch, one user-hash
    part-exchange, each part expands every user's <=|types| set into
    sorted type pairs vectorized; pair counts combine before the tiny
    final groupby."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(df: pd.DataFrame) -> pa.Table:
        d = df[["user_id", "event_type"]].drop_duplicates()
        uid = d["user_id"].to_numpy(np.int64)
        part = (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_type": pa.array(d["event_type"].to_numpy(object), pa.string()),
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {
            "type_a": pa.array([], pa.string()),
            "type_b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "is_single": pa.array([], pa.bool_()),
        }
    )

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        df = (
            pd.DataFrame(
                {
                    "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                    "event_type": t["event_type"].to_numpy(zero_copy_only=False),
                }
            )
            .drop_duplicates()  # cross-batch dupes of the same (user, type)
            .sort_values(["user_id", "event_type"], kind="stable")
        )
        uid = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy(object)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        lens = np.diff(np.r_[starts, len(uid)])
        # per-type distinct-user counts (for the union term)
        su, sc = np.unique(et, return_counts=True)
        singles = pa.table(
            {
                "type_a": pa.array(su.astype(object), pa.string()),
                "type_b": pa.array(su.astype(object), pa.string()),
                "n": pa.array(sc.astype(np.int64)),
                "is_single": pa.array(np.ones(len(su), bool)),
            }
        )
        # expand each user's sorted type list into ordered pairs (a < b)
        total = int((lens * (lens - 1) // 2).sum())
        if total == 0:
            return singles
        runp = np.repeat(np.arange(len(starts)), lens * (lens - 1) // 2)
        p = np.arange(total) - np.repeat(
            np.r_[0, np.cumsum(lens * (lens - 1) // 2)[:-1]], lens * (lens - 1) // 2
        )
        # map pair index p -> (i, j) in the triangle, vectorized
        L = lens[runp].astype(np.float64)
        i = (
            np.floor((2 * L - 1 - np.sqrt((2 * L - 1) * (2 * L - 1) - 8 * p)) / 2)
        ).astype(np.int64)
        j = p - i * (2 * lens[runp] - i - 1) // 2 + i + 1
        a = et[starts[runp] + i]
        b = et[starts[runp] + j]
        g = pd.DataFrame({"type_a": a, "type_b": b, "one": 1}).groupby(
            ["type_a", "type_b"], sort=False
        ).sum()
        idx = g.index.to_frame(index=False)
        inter = pa.table(
            {
                "type_a": pa.array(idx["type_a"].to_numpy(object), pa.string()),
                "type_b": pa.array(idx["type_b"].to_numpy(object), pa.string()),
                "n": pa.array(g["one"].to_numpy(np.int64)),
                "is_single": pa.array(np.zeros(len(g), bool)),
            }
        )
        return pa.concat_tables([singles, inter])

    mixed = (
        ds.map_batches(prep, batch_format="pandas")
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(pairs, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["type_a", "type_b", "is_single"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= |types|^2 rows
    )
    totals = {
        r.type_a: int(r.n) for r in mixed[mixed["is_single"]].itertuples()
    }
    inter = mixed[~mixed["is_single"]]
    rows = []
    for r in inter.itertuples():
        union = totals[r.type_a] + totals[r.type_b] - int(r.n)
        rows.append((r.type_a, r.type_b, int(r.n), union))
    rows.sort()
    return pa.table(
        {
            "type_a": pa.array([r[0] for r in rows], pa.string()),
            "type_b": pa.array([r[1] for r in rows], pa.string()),
            "n_inter": pa.array(np.array([r[2] for r in rows], np.int64)),
            "n_union": pa.array(np.array([r[3] for r in rows], np.int64)),
        }
    )


def _sql_event_type_jaccard() -> str:
    return """
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
    tot AS (SELECT event_type, count(*) AS n FROM d GROUP BY event_type),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n
      FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, CAST(i.n AS BIGINT) AS n_inter,
           CAST(ta.n + tb.n - i.n AS BIGINT) AS n_union
    FROM inter i
    JOIN tot ta ON ta.event_type = i.type_a
    JOIN tot tb ON tb.event_type = i.type_b
    """


def q_mad_prices(sf_dir: str):
    """Robust statistics: per return flag, the order-statistic median of
    price cents and the median absolute deviation around it (both the
    rank-ceil(n/2) order statistic, no interpolation — exact integers).

    Scale shape: two chained two-pass rank searches (_cents_rank_search).
    Search 1 finds each flag's median; search 2 ranks the DERIVED value
    |cents - median[flag]| (the broadcast medians applied inside the
    combiner via value_fn).  Four pruned scans total, every exchange
    coarse-bucket-bounded — the one-pass value-histogram form this
    replaced pulled the near-unique price domain to the driver and
    measured 32.3 s at sf0.1."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    k_fn = lambda n: [(n + 1) // 2]
    totals, med_at = _cents_rank_search(ds, "l_returnflag", "l_extendedprice", k_fn)
    med = {f: med_at[f][(totals[f] + 1) // 2] for f in totals}

    def deviation(cents, codes, flags):
        m = np.array([med.get(f, 0) for f in flags], np.int64)
        return np.abs(cents - m[codes])

    ds2 = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    _, mad_at = _cents_rank_search(
        ds2, "l_returnflag", "l_extendedprice", k_fn, value_fn=deviation
    )
    flags = sorted(totals)
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "median_cents": pa.array(
                np.array([med[f] for f in flags], np.int64)
            ),
            "mad_cents": pa.array(
                np.array([mad_at[f][(totals[f] + 1) // 2] for f in flags], np.int64)
            ),
        }
    )


def _sql_mad_prices() -> str:
    return """
    WITH c AS (
      SELECT l_returnflag AS f, CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS v
      FROM lineitem
    ), r AS (
      SELECT f, v, row_number() OVER (PARTITION BY f ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY f) AS n
      FROM c
    ), med AS (
      SELECT f, v AS med FROM r WHERE rn = (n + 1) // 2
    ), a AS (
      SELECT c.f, abs(c.v - m.med) AS av, m.med FROM c JOIN med m USING (f)
    ), ra AS (
      SELECT f, av, med, row_number() OVER (PARTITION BY f ORDER BY av) AS rn,
             count(*) OVER (PARTITION BY f) AS n
      FROM a
    )
    SELECT f AS l_returnflag, CAST(med AS BIGINT) AS median_cents,
           CAST(av AS BIGINT) AS mad_cents
    FROM ra WHERE rn = (n + 1) // 2
    """


def q_event_trigrams(sf_dir: str):
    """Sequence mining: the 10 most common consecutive 3-event-type
    sequences across user timelines (time-ordered, same-user windows) —
    the n-gram pattern extraction behavioral pipelines run before
    sequence modeling.

    Scale shape: one user-hash part-exchange; each part forms every
    trigram from two shifted views of the lexsorted array, a per-part
    combiner bounds the exchange at distinct trigrams per part."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        part = (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uid),
                "eid": b["event_id"],
                "us": pa.array(us),
                "event_type": b["event_type"],
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {"trigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )

    def grams(t: pa.Table) -> pa.Table:
        if t.num_rows < 3:
            return _empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        us = t["us"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False).astype(object)
        o = np.lexsort((eid, us, uid))
        uid, et = uid[o], et[o]
        ok = (uid[2:] == uid[1:-1]) & (uid[1:-1] == uid[:-2])
        if not ok.any():
            return _empty
        tri = et[:-2][ok] + ">" + et[1:-1][ok] + ">" + et[2:][ok]
        u, c = np.unique(tri.astype(str), return_counts=True)
        return pa.table(
            {"trigram": pa.array(u, pa.string()), "n": pa.array(c.astype(np.int64))}
        )

    counts = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(grams, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("trigram")
        .aggregate(Sum("n", alias_name="n"))
    )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "trigram"], ascending=[False, True]).head(10)

    top = counts.map_batches(block_topk, batch_format="pandas").to_pandas()
    top = top.sort_values(["n", "trigram"], ascending=[False, True]).head(10)
    return pa.table(
        {
            "trigram": pa.array(top["trigram"].astype(str)),
            "n": pa.array(top["n"].to_numpy(np.int64)),
        }
    )


def _sql_event_trigrams() -> str:
    return """
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type, 1) OVER w AS p1,
             lag(event_type, 2) OVER w AS p2,
             lag(user_id, 2) OVER w AS u2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p2 || '>' || p1 || '>' || event_type AS trigram,
           CAST(count(*) AS BIGINT) AS n
    FROM s WHERE u2 = user_id
    GROUP BY 1 ORDER BY n DESC, trigram LIMIT 10
    """


# ---------------------------------------------------------------------------
# decontaminate — benchmark n-gram contamination screen
# ---------------------------------------------------------------------------

_DECON_MOD = 7  # docs with doc_id % 7 == 0 stand in for the benchmark set
_DECON_W = 4  # shorter window than dup_ngram_spans: contamination screens
# typically use 8-13-gram windows, but the 500-doc synthetic corpus only
# produces cross-subset overlaps at W=4 — the pipeline shape is W-agnostic


def _bench_window_hashes(df: pd.DataFrame, W: int, mod: int) -> pa.Table:
    """Per-batch distinct md5 window-hash set of the BENCHMARK docs
    (doc_id % mod == 0) — the shared pass-0 of q_decontaminate and
    q_llm_data_prep, so the contamination-window definition lives in
    exactly one place (the Karp-Rabin scale swap would land here too)."""
    dids = df["doc_id"].to_numpy(np.int64)
    texts = df["text"].astype(str).to_numpy()[dids % mod == 0]
    hs = []
    for txt in texts:
        toks = txt.split(" ")
        if len(toks) >= W:
            hs.append(_md5_window_hashes(toks, W))
    u = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.int64)
    return pa.table({"h": pa.array(u)})


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination screen (the GPT-3 appendix-C / Pile
    n-gram-overlap pass): flag every training document that shares at
    least one W-token window with a held-out benchmark set, with its
    overlapping-window count.  Here docs with doc_id % _DECON_MOD == 0
    (MOD=7, chosen so the synthetic corpus produces cross-subset
    overlaps) stand in for the benchmark; in production it is a separate
    tiny table (test sets), which is exactly why this op broadcasts.

    Scale shape: benchmark windows are hashed WHERE READ (window text
    never leaves the task) and reduced to a distinct int64 hash set —
    bounded by benchmark size, negligible next to the corpus — shipped
    ONCE via ray.put; the probe pass is pure map (sorted-set membership
    via np.searchsorted per batch), NO shuffle anywhere.  md5 window
    hashes for oracle parity; dup_ngram_spans' Karp-Rabin fold is the
    documented O(tokens) scale swap."""
    import ray

    W = _DECON_W
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def bench_hashes(df: pd.DataFrame) -> pa.Table:
        return _bench_window_hashes(df, W, _DECON_MOD)

    parts = docs.map_batches(bench_hashes, batch_format="pandas").to_pandas()
    bset = np.unique(parts["h"].to_numpy(np.int64))
    bref = ray.put(bset)

    def probe(df: pd.DataFrame) -> pa.Table:
        import ray as _ray

        bs = _ray.get(bref)
        dids = df["doc_id"].to_numpy(np.int64)
        keep = dids % _DECON_MOD != 0
        texts = df["text"].astype(str).to_numpy()[keep]
        out_d: list[int] = []
        out_n: list[int] = []
        for did, txt in zip(dids[keep], texts):
            toks = txt.split(" ")
            if len(toks) < W or not len(bs):
                continue
            h = _md5_window_hashes(toks, W)
            ix = np.searchsorted(bs, h)
            ix[ix == len(bs)] = 0
            n = int((bs[ix] == h).sum())
            if n:
                out_d.append(int(did))
                out_n.append(n)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(out_d, np.int64)),
                "n_hits": pa.array(np.asarray(out_n, np.int64)),
            }
        )

    return docs.map_batches(probe, batch_format="pandas")


def _sql_decontaminate() -> str:
    W = _DECON_W
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), w AS (
      SELECT doc_id, array_to_string(t[s.i:s.i+{W - 1}], ' ') AS win
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - {W} + 1)) AS i) s
      WHERE len(t) >= {W}
    ), bw AS (
      SELECT DISTINCT win FROM w WHERE doc_id % {_DECON_MOD} = 0
    )
    SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_hits
    FROM w JOIN bw USING (win)
    WHERE w.doc_id % {_DECON_MOD} <> 0
    GROUP BY w.doc_id
    """


# ---------------------------------------------------------------------------
# inverted_index — capped posting-list build over the corpus
# ---------------------------------------------------------------------------

_INVIX_TOPN = 200  # report the N highest-document-frequency tokens
_INVIX_CAP = 20  # first K doc ids per posting list


def q_inverted_index(sf_dir: str):
    """Distributed inverted-index build (the search-index / RAG-prep op):
    for the 200 highest-document-frequency tokens (tie: token asc),
    the global df and a posting string of the first 20 doc ids ascending.

    Scale shape: a doc's text sits whole in one batch row, so per-batch
    (token, doc) drop_duplicates IS the global distinct; ONE hash
    part-exchange on the token co-locates every posting of a token, each
    part resolves df + capped posting with one sort + run-length pass
    (no per-token Python loop for counting; the join-to-string is
    vocabulary-bounded), and the driver merges only parts x N candidate
    rows — the full index would stream to a sink, never to the driver."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_parts = 32

    def explode(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].astype(str).str.lower().str.split(" ")
        s = df[["doc_id"]].assign(tok=toks).explode("tok")
        s = s[s["tok"].notna() & (s["tok"] != "")].drop_duplicates()
        tok = s["tok"].to_numpy(object)
        part = (
            synth._splitmix64(pd.util.hash_array(tok).astype(np.uint64))
            % np.uint64(n_parts)
        ).astype(np.int64)
        return pa.table(
            {
                "tok": pa.array(tok, pa.string()),
                "doc_id": pa.array(s["doc_id"].to_numpy(np.int64)),
                "part": pa.array(part),
            }
        )

    _empty = pa.table(
        {
            "tok": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
            "posting": pa.array([], pa.string()),
        }
    )

    def build(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        tok = np.asarray(t["tok"].to_pandas(), object)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((did, tok))
        tok, did = tok[o], did[o]
        starts = np.flatnonzero(np.r_[True, tok[1:] != tok[:-1]])
        lens = np.diff(np.r_[starts, len(tok)])
        # local top-N by (df desc, tok asc): df is GLOBAL here because the
        # part-exchange co-located every posting of each token
        order = np.lexsort((tok[starts], -lens))[:_INVIX_TOPN]
        posting = [
            ",".join(map(str, did[s : s + min(n, _INVIX_CAP)]))
            for s, n in zip(starts[order], lens[order])
        ]
        return pa.table(
            {
                "tok": pa.array(tok[starts][order], pa.string()),
                "df": pa.array(lens[order].astype(np.int64)),
                "posting": pa.array(posting, pa.string()),
            }
        )

    parts = (
        ds.map_batches(explode, batch_format="pandas")
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(build, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .to_pandas()
    )
    top = parts.sort_values(["df", "tok"], ascending=[False, True], ignore_index=True).head(
        _INVIX_TOPN
    )
    return pa.table(
        {
            "tok": pa.array(top["tok"].astype(str)),
            "df": pa.array(top["df"].to_numpy(np.int64)),
            "posting": pa.array(top["posting"].astype(str)),
        }
    )


def _sql_inverted_index() -> str:
    return f"""
    WITH dt AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(string_split(lower(text), ' '), s -> s <> '')) AS tok
      FROM documents
    ), ranked AS (
      SELECT tok, doc_id,
             row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
      FROM dt
    ), dfc AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY tok
    ), post AS (
      SELECT tok, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS posting
      FROM ranked WHERE rn <= {_INVIX_CAP} GROUP BY tok
    )
    SELECT dfc.tok, dfc.df, post.posting
    FROM dfc JOIN post USING (tok)
    ORDER BY dfc.df DESC, dfc.tok
    LIMIT {_INVIX_TOPN}
    """


# ---------------------------------------------------------------------------
# zipf_fit — rank-frequency power-law fit of the vocabulary
# ---------------------------------------------------------------------------

_ZIPF_TOPN = 1000


def q_zipf_fit(sf_dir: str):
    """Zipf power-law fit of the corpus rank-frequency curve (a corpus
    quality diagnostic): least-squares slope/intercept of ln(count) vs
    ln(rank) over the top-1000 vocabulary terms (count desc,
    token asc tie-break).

    Exactness: per-TERM quantization — x=floor(ln(rank)*1e6) and
    y=floor(ln(count)*1e6) are INTEGERS, so the five regression sums are
    exact (arbitrary-precision Python ints here, HUGEINT in the oracle)
    and slope/intercept are each ONE fixed-arity IEEE expression over
    exactly-converted doubles; ln is libm math.log, which matches DuckDB
    ln bit-for-bit (the bm25_topk finding).

    Scale shape: the vocab build is the vocab_topk combiner (per-batch
    value_counts partials, one groupby, per-block partial top-k) — the
    driver sees blocks x 1000 candidate rows, never the corpus
    or the full vocabulary."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].astype(str).str.lower().str.split(" ").explode()
        toks = toks[toks.notna() & (toks != "")]
        vc = toks.value_counts()
        return pa.table(
            {
                "tok": pa.array(vc.index.to_numpy(object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    counts = ds.map_batches(partial, batch_format="pandas").groupby("tok").aggregate(Sum("n"))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["sum(n)", "tok"], ascending=[False, True]).head(_ZIPF_TOPN)

    top = counts.map_batches(block_topk, batch_format="pandas").to_pandas()
    top = top.sort_values(["sum(n)", "tok"], ascending=[False, True]).head(_ZIPF_TOPN)
    cnt = top["sum(n)"].to_numpy(np.int64)
    k = len(cnt)
    if k < 2:
        # degenerate corpus (<2 vocabulary terms): the LS denominator
        # k*sxx - sx^2 is 0, so return a defined sentinel row instead of
        # dividing — mirrored by the CASE in the oracle SQL.
        return pa.table(
            {
                "n_terms": pa.array([k], pa.int64()),
                "slope_x1e6": pa.array([0], pa.int64()),
                "intercept_x1e6": pa.array([0], pa.int64()),
            }
        )
    xs = [math.floor(math.log(r) * 1e6) for r in range(1, k + 1)]
    ys = [math.floor(math.log(int(c)) * 1e6) for c in cnt]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    num = k * sxy - sx * sy
    den = k * sxx - sx * sx
    slope = float(num) / float(den)
    intercept = (float(sy) - slope * float(sx)) / float(k)
    return pa.table(
        {
            "n_terms": pa.array([k], pa.int64()),
            "slope_x1e6": pa.array([int(math.floor(slope * 1e6))], pa.int64()),
            "intercept_x1e6": pa.array([int(math.floor(intercept))], pa.int64()),
        }
    )


def _sql_zipf_fit() -> str:
    slope = (
        "(CAST(k * sxy - sx * sy AS DOUBLE) / CAST(k * sxx - sx * sx AS DOUBLE))"
    )
    return f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '), s -> s <> '')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok, count(*) AS n FROM toks GROUP BY tok
    ), top AS (
      SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS r
      FROM vocab ORDER BY n DESC, tok LIMIT {_ZIPF_TOPN}
    ), q AS (
      SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000.0) AS HUGEINT) AS x,
             CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0) AS HUGEINT) AS y
      FROM top
    ), s AS (
      SELECT CAST(count(*) AS HUGEINT) AS k,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM q
    )
    SELECT CAST(k AS BIGINT) AS n_terms,
           CASE WHEN k < 2 THEN 0
                ELSE CAST(floor({slope} * 1000000.0) AS BIGINT) END AS slope_x1e6,
           CASE WHEN k < 2 THEN 0
                ELSE CAST(floor((CAST(sy AS DOUBLE) - {slope} * CAST(sx AS DOUBLE)) / CAST(k AS DOUBLE)) AS BIGINT) END AS intercept_x1e6
    FROM s
    """



# ---------------------------------------------------------------------------
# chi2_terms — token-vs-language chi-square feature selection
# ---------------------------------------------------------------------------

_CHI2_TOPN = 20


def q_chi2_terms(sf_dir: str):
    """Chi-square feature selection (the classic text-classification
    feature scorer): for each of the 20 highest-document-frequency tokens
    and each language, the 2x2 presence-vs-language chi-square statistic.

    Exactness: all four cell counts are exact integers from distributed
    combiners; the chi2 value is ONE fixed-arity IEEE expression over
    exactly-converted doubles (products kept in doubles so corpus scale
    never overflows), floor(chi2 * 1e3)-quantized, with a CASE guard
    emitting 0 whenever a marginal is empty.

    Scale shape: a doc sits whole in one batch row, so per-batch
    (token, lang) distinct-presence counting IS a global-correct partial;
    one groupby sums the vocabulary-bounded (tok, lang) partials and a
    second tiny groupby counts docs per lang — the driver touches only
    vocab x langs rows, never the corpus."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = df["text"].astype(str).str.lower().str.split(" ")
        s = df[["doc_id", "lang"]].assign(tok=toks).explode("tok")
        s = s[s["tok"].notna() & (s["tok"] != "")].drop_duplicates()
        vc = s.groupby(["tok", "lang"], sort=False).size()
        ix = vc.index
        # ONE tagged scan (the bigram_logprob fusion pattern): rows with
        # the sentinel tok "" (filtered out of real tokens above) carry
        # the per-language doc counts, so no second documents read runs
        lc = df["lang"].value_counts()
        return pa.table(
            {
                "tok": pa.array(
                    np.r_[
                        ix.get_level_values(0).to_numpy(object),
                        np.full(len(lc), "", object),
                    ],
                    pa.string(),
                ),
                "lang": pa.array(
                    np.r_[
                        ix.get_level_values(1).to_numpy(object),
                        lc.index.to_numpy(object),
                    ],
                    pa.string(),
                ),
                "n": pa.array(np.r_[vc.to_numpy(np.int64), lc.to_numpy(np.int64)]),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["tok", "lang"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    ld = agg[agg["tok"] == ""]
    tl = agg[agg["tok"] != ""]
    langs = sorted(ld["lang"].astype(str))
    nd = dict(zip(ld["lang"].astype(str), ld["n"].to_numpy(np.int64)))
    n_total = int(sum(nd.values()))

    dfc = tl.groupby("tok")["n"].sum().sort_values(ascending=False)
    # (df desc, tok asc) deterministic top-N
    dfc = dfc.reset_index().sort_values(["n", "tok"], ascending=[False, True])
    top = list(dfc["tok"].astype(str).head(_CHI2_TOPN))
    top_set = set(top)
    cell = {
        (str(r.tok), str(r.lang)): int(r.n)
        for r in tl.itertuples()
        if str(r.tok) in top_set
    }
    df_tok = dict(zip(dfc["tok"].astype(str), dfc["n"].to_numpy(np.int64)))

    out_tok, out_lang, out_n11, out_chi2 = [], [], [], []
    for tok in top:
        for lang in langs:
            n11 = cell.get((tok, lang), 0)
            n10 = int(df_tok[tok]) - n11
            n01 = int(nd[lang]) - n11
            n00 = n_total - int(nd[lang]) - n10
            m1, m2, m3, m4 = n11 + n10, n01 + n00, n11 + n01, n10 + n00
            if m1 == 0 or m2 == 0 or m3 == 0 or m4 == 0:
                chi2_q = 0
            else:
                num = float(n11) * float(n00) - float(n10) * float(n01)
                den = ((float(m1) * float(m2)) * float(m3)) * float(m4)
                chi2 = ((float(n_total) * num) * num) / den
                import math

                chi2_q = int(math.floor(chi2 * 1000.0))
            out_tok.append(tok)
            out_lang.append(lang)
            out_n11.append(n11)
            out_chi2.append(chi2_q)
    return pa.table(
        {
            "tok": pa.array(out_tok, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "n11": pa.array(np.asarray(out_n11, np.int64)),
            "chi2_x1e3": pa.array(np.asarray(out_chi2, np.int64)),
        }
    )


def _sql_chi2_terms() -> str:
    num = (
        "(CAST(n11 AS DOUBLE) * CAST(n00 AS DOUBLE)"
        " - CAST(n10 AS DOUBLE) * CAST(n01 AS DOUBLE))"
    )
    den = (
        "(((CAST(n11 + n10 AS DOUBLE) * CAST(n01 + n00 AS DOUBLE))"
        " * CAST(n11 + n01 AS DOUBLE)) * CAST(n10 + n00 AS DOUBLE))"
    )
    return f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, lang,
             unnest(list_filter(string_split(lower(text), ' '), s -> s <> '')) AS tok
      FROM documents
    ), tl AS (
      SELECT tok, lang, count(*) AS n FROM dt GROUP BY 1, 2
    ), dfc AS (
      SELECT tok, SUM(n) AS df FROM tl GROUP BY 1
    ), top AS (
      SELECT tok, df FROM dfc ORDER BY df DESC, tok LIMIT {_CHI2_TOPN}
    ), ld AS (
      SELECT lang, count(*) AS nd FROM documents GROUP BY 1
    ), tot AS (
      SELECT count(*) AS n FROM documents
    ), cells AS (
      SELECT t.tok, l.lang,
             CAST(COALESCE(tl.n, 0) AS BIGINT) AS n11,
             CAST(t.df - COALESCE(tl.n, 0) AS BIGINT) AS n10,
             CAST(l.nd - COALESCE(tl.n, 0) AS BIGINT) AS n01,
             CAST(tot.n - l.nd - (t.df - COALESCE(tl.n, 0)) AS BIGINT) AS n00,
             CAST(tot.n AS BIGINT) AS nt
      FROM top t CROSS JOIN ld l CROSS JOIN tot
      LEFT JOIN tl ON tl.tok = t.tok AND tl.lang = l.lang
    )
    SELECT tok, lang, n11,
           CASE WHEN n11 + n10 = 0 OR n01 + n00 = 0 OR n11 + n01 = 0 OR n10 + n00 = 0
                THEN 0
                ELSE CAST(floor(((CAST(nt AS DOUBLE) * {num}) * {num}) / {den} * 1000.0) AS BIGINT)
           END AS chi2_x1e3
    FROM cells
    """


# ---------------------------------------------------------------------------
# tile_compaction — quadtree compaction of the occupied-tile set
# ---------------------------------------------------------------------------

_COMPACT_BASE_Z = 6
_COMPACT_MIN_Z = 2


def q_tile_compaction(sf_dir: str):
    """Quadtree compaction of an occupied-tile set (the H3 `compact`
    analogue over web-mercator tiles): starting from the distinct
    occupied z6 tiles of the event corpus, every aligned 2x2 sibling
    block that is FULLY occupied is replaced by its parent, recursively
    up to z2; output the compacted cover as (z, x, y) rows.

    Scale shape: the only corpus-sized work is the distinct-tile
    reduction (per-batch np.unique combiner + Dataset.unique); the level
    loop then runs on the occupied-tile DOMAIN — at most 4^6 = 4096 keys
    at the base zoom regardless of corpus size (domain-bounded like the
    histogram quantile ops), so driver-side numpy is the right venue."""
    ds = _events_points(sf_dir)
    bz = _COMPACT_BASE_Z

    def assign(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        tx, ty = S.lonlat_to_tile(lon, lat, bz)
        k = (tx.astype(np.int64) << 32) | ty.astype(np.int64)
        return pa.table({"k": pa.array(np.unique(k))})

    keys = np.unique(
        np.asarray(
            ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).unique("k"),
            np.int64,
        )
    )

    out_z: list[np.ndarray] = []
    out_x: list[np.ndarray] = []
    out_y: list[np.ndarray] = []
    cur = keys
    for z in range(bz, _COMPACT_MIN_Z, -1):
        x, y = cur >> 32, cur & np.int64(0xFFFFFFFF)
        parents = ((x >> 1) << 32) | (y >> 1)
        pk, cnt = np.unique(parents, return_counts=True)
        fullp = pk[cnt == 4]
        keep = ~np.isin(parents, fullp)
        out_z.append(np.full(int(keep.sum()), z, np.int64))
        out_x.append(x[keep])
        out_y.append(y[keep])
        cur = fullp
    out_z.append(np.full(len(cur), _COMPACT_MIN_Z, np.int64))
    out_x.append(cur >> 32)
    out_y.append(cur & np.int64(0xFFFFFFFF))
    return pa.table(
        {
            "z": pa.array(np.concatenate(out_z)),
            "x": pa.array(np.concatenate(out_x)),
            "y": pa.array(np.concatenate(out_y)),
        }
    )


def _sql_tile_compaction() -> str:
    bz, mz = _COMPACT_BASE_Z, _COMPACT_MIN_Z
    n = 1 << bz
    mx, my = _mercator_sql("lon", "lat")
    tx = f"cast(least(greatest(floor(({mx}) * {n}.0), 0.0), {n - 1}.0) as bigint)"
    ty = f"cast(least(greatest(floor(({my}) * {n}.0), 0.0), {n - 1}.0) as bigint)"
    ctes = [
        f"pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events)",
        f"f{bz} AS (SELECT DISTINCT {tx} AS x, {ty} AS y FROM pts)",
    ]
    for z in range(bz - 1, mz - 1, -1):
        ctes.append(
            f"f{z} AS (SELECT x // 2 AS x, y // 2 AS y FROM f{z + 1} "
            f"GROUP BY 1, 2 HAVING count(*) = 4)"
        )
    selects = []
    for z in range(bz, mz, -1):
        selects.append(
            f"SELECT CAST({z} AS BIGINT) AS z, f{z}.x, f{z}.y FROM f{z} "
            f"LEFT JOIN f{z - 1} p ON p.x = f{z}.x // 2 AND p.y = f{z}.y // 2 "
            f"WHERE p.x IS NULL"
        )
    selects.append(f"SELECT CAST({mz} AS BIGINT) AS z, x, y FROM f{mz}")
    return "WITH " + ",\n    ".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)



# ---------------------------------------------------------------------------
# bigram_logprob — smoothed bigram-LM perplexity-filter scoring
# ---------------------------------------------------------------------------


def q_bigram_logprob(sf_dir: str):
    """Bigram language-model scoring with add-one smoothing (the KenLM-ish
    upgrade of unigram_logprob's perplexity filter): every document scored
    by the sum of ln((c_ab + 1) / (c_a. + V)) over its adjacent-token
    bigrams, where c_ab is the corpus bigram count, c_a. the count of a as
    a bigram LEFT, and V the corpus vocabulary size.

    Float parity is EXACT by the per-TERM quantization rule: the driver
    computes floor(ln(...) * 1e6) once per distinct BIGRAM with libm
    (math.log matches DuckDB ln bit-for-bit); per-doc scores are then
    pure integer sums, immune to float summation order.

    Scale shape: pass 1 is a combiner'd bigram-count groupby — its result
    is bigram-vocabulary-bounded (the one driver pull; the open-web
    variant keeps top-V^2 contexts + an OOV bucket, the same caveat
    unigram_logprob documents); pass 2 is map-only — per-batch bigram
    explode, one searchsorted against the broadcast packed-key table, one
    exact int64 segment sum (np.add.at, not float bincount).  Every doc
    bigram exists in the table (counts come from the same corpus), so no
    miss path is needed."""
    import math

    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    _empty = pa.table(
        {
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "kind": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
        }
    )

    def partial(df: pd.DataFrame) -> pa.Table:
        # ONE tagged text scan (the bigram_pmi fusion finding): kind=0 rows
        # are bigram-count partials; kind=1 rows mark tokens of 1-token
        # docs, which are the only positions no bigram covers — together
        # with the bigram endpoints they span the full vocabulary, so no
        # second corpus scan is needed for V
        la, lb, singles = [], [], []
        for t in df["text"].astype(str):
            toks = t.split(" ")
            if len(toks) >= 2:
                arr = np.asarray(toks, object)
                la.append(arr[:-1])
                lb.append(arr[1:])
            else:
                singles.extend(toks)
        tabs = []
        if la:
            g = (
                pd.DataFrame({"a": np.concatenate(la), "b": np.concatenate(lb)})
                .groupby(["a", "b"], sort=False)
                .size()
            )
            ix = g.index
            tabs.append(
                pa.table(
                    {
                        "a": pa.array(ix.get_level_values(0).to_numpy(object), pa.string()),
                        "b": pa.array(ix.get_level_values(1).to_numpy(object), pa.string()),
                        "kind": pa.array(np.zeros(len(g), np.int64)),
                        "c": pa.array(g.to_numpy(np.int64)),
                    }
                )
            )
        if singles:
            u = np.unique(np.asarray(singles, object).astype(str))
            tabs.append(
                pa.table(
                    {
                        "a": pa.array(u, pa.string()),
                        "b": pa.array(np.full(len(u), "", object), pa.string()),
                        "kind": pa.array(np.ones(len(u), np.int64)),
                        "c": pa.array(np.zeros(len(u), np.int64)),
                    }
                )
            )
        return pa.concat_tables(tabs) if tabs else _empty

    def recombine(t: pa.Table) -> pa.Table:
        g = (
            t.to_pandas()
            .groupby(["a", "b", "kind"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(4)
        .map_batches(recombine, batch_format="pyarrow", batch_size=None)
        .groupby(["a", "b", "kind"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    cab = agg[agg["kind"] == 0]
    # V = distinct tokens over ALL positions: bigram endpoints cover every
    # position of >=2-token docs; kind=1 rows add the singleton-doc tokens
    vocab = np.unique(
        np.concatenate(
            [
                cab["a"].to_numpy(str),
                cab["b"].to_numpy(str),
                agg.loc[agg["kind"] == 1, "a"].to_numpy(str),
            ]
        )
    )
    nv = len(vocab)

    a_s = cab["a"].to_numpy(str)
    b_s = cab["b"].to_numpy(str)
    c = cab["c"].to_numpy(np.int64)
    li = np.searchsorted(vocab, a_s)
    ri = np.searchsorted(vocab, b_s)
    key = li.astype(np.int64) * np.int64(nv) + ri.astype(np.int64)
    order = np.argsort(key)
    key, c, li_o = key[order], c[order], li[order]
    # c_a. = sum of c over the left token (bigram-left marginal)
    ca = np.zeros(nv, np.int64)
    np.add.at(ca, li_o, c)
    lp = np.fromiter(
        (
            int(math.floor(math.log(int(cc + 1) / int(ca_l + nv)) * 1000000.0))
            for cc, ca_l in zip(c, ca[li_o])
        ),
        np.int64,
        len(c),
    )
    table_ref = ray.put((key, lp, vocab))

    def score(df: pd.DataFrame) -> pa.Table:
        import ray as _ray

        keys, lps, voc = _ray.get(table_ref)
        nvv = np.int64(len(voc))
        dids, la, lb, nbg = [], [], [], []
        for did, t in zip(df["doc_id"].to_numpy(np.int64), df["text"].astype(str)):
            toks = t.split(" ")
            if len(toks) < 2:
                continue
            arr = np.asarray(toks, object)
            la.append(arr[:-1])
            lb.append(arr[1:])
            dids.append(did)
            nbg.append(len(toks) - 1)
        if not dids:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "sum_lp_micro": pa.array([], pa.int64()),
                }
            )
        a = np.searchsorted(voc, np.concatenate(la).astype(str)).astype(np.int64)
        b = np.searchsorted(voc, np.concatenate(lb).astype(str)).astype(np.int64)
        k = a * nvv + b
        ix = np.searchsorted(keys, k)
        vals = lps[ix]
        nbg_arr = np.asarray(nbg, np.int64)
        doc_ix = np.repeat(np.arange(len(dids)), nbg_arr)
        sums = np.zeros(len(dids), np.int64)
        np.add.at(sums, doc_ix, vals)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(dids, np.int64)),
                "n_bigrams": pa.array(nbg_arr),
                "sum_lp_micro": pa.array(sums),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def _sql_bigram_logprob() -> str:
    return """
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), bg AS (
      SELECT doc_id, t[s.i] AS a, t[s.i + 1] AS b
      FROM tok, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
      WHERE len(t) >= 2
    ), cab AS (
      SELECT a, b, count(*) AS c FROM bg GROUP BY 1, 2
    ), ca AS (
      SELECT a, SUM(c) AS ct FROM cab GROUP BY 1
    ), v AS (
      SELECT count(DISTINCT w) AS nv
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    ), lp AS (
      SELECT a, b,
             CAST(floor(ln(CAST(c + 1 AS DOUBLE) / CAST(ct + nv AS DOUBLE)) * 1000000.0) AS BIGINT) AS lp_micro
      FROM cab JOIN ca USING (a), v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(lp_micro) AS BIGINT) AS sum_lp_micro
    FROM bg JOIN lp USING (a, b)
    GROUP BY doc_id
    """


# ---------------------------------------------------------------------------
# tile_pyramid_counts — one-pass square-tile pyramid aggregate (z2..z10)
# ---------------------------------------------------------------------------

TILE_PYRAMID_ZOOMS = tuple(range(2, 11))


def q_tile_pyramid_counts(sf_dir: str):
    """Square-tile analogue of hex_pyramid: per-tile event counts at ALL
    zooms 2..10 in ONE pass over the table.

    Scale shape: the base-zoom (tx, ty) is computed once per batch and
    coarser zooms are pure right-shifts (floor(mx*2^z) == tx10 >> (10-z)
    for non-negative mx, clamping included); the per-batch np.unique
    combiner bounds the shuffle at one row per (z, tile) per batch, and
    the zoom rides inside the packed tile_id so one groupby covers the
    whole pyramid.  (A two-stage variant — aggregate z10 first, derive
    coarser zooms from the tile-domain table — was A/B'd at 8.9-16 s vs
    4.3 s: the second exchange's per-block fixed cost dominates, so the
    single-exchange form is kept.)  r5: Ray's sort-based Aggregate
    replaced by the tile-hash part exchange + per-part reduceat merge —
    the same rewrite that took hex_pyramid from 14.5 s to 1.0 s at the
    5x corpus (the Aggregate machinery, not the exchange volume, was the
    term; A/B in BASELINE.md)."""
    from ..sources.synth import _splitmix64

    ds = _events_points(sf_dir)
    base_z = TILE_PYRAMID_ZOOMS[-1]
    n_parts = int(max(8, min(4096, _table_rows_meta(sf_dir, "events") // 100_000 + 1)))

    def assign(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        tx, ty = S.lonlat_to_tile(lon, lat, base_z)
        ids, counts = [], []
        for z in TILE_PYRAMID_ZOOMS:
            sh = base_z - z
            u, cnt = np.unique(S.pack_tile_id(z, tx >> sh, ty >> sh), return_counts=True)
            ids.append(u)
            counts.append(cnt.astype(np.int64))
        tid = np.concatenate(ids)
        return pa.table(
            {
                "tile_id": pa.array(tid),
                "partial": pa.array(np.concatenate(counts)),
                "part": pa.array(
                    (_splitmix64(tid.view(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table({"tile_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})

    def sum_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        tid = t["tile_id"].to_numpy(zero_copy_only=False)
        cnt = t["partial"].to_numpy(zero_copy_only=False)
        order = np.argsort(tid, kind="mergesort")
        tid, cnt = tid[order], cnt[order]
        new = np.r_[True, tid[1:] != tid[:-1]]
        n = np.add.reduceat(cnt, np.flatnonzero(new))
        return pa.table({"tile_id": pa.array(tid[new]), "n": pa.array(n.astype(np.int64))})

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(sum_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_tile_pyramid_counts() -> str:
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT {_tile_sql(z)} AS tile_id FROM pts" for z in TILE_PYRAMID_ZOOMS
    )
    return f"""
    WITH pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    alltiles AS (
      {unions}
    )
    SELECT tile_id, count(*) AS n FROM alltiles GROUP BY tile_id
    """



# ---------------------------------------------------------------------------
# trade_triangles — triangle enumeration over the nation trade graph
# ---------------------------------------------------------------------------


def q_trade_triangles(sf_dir: str):
    """Triangle enumeration over the nation trade graph (the
    clustering-coefficient primitive of graph analytics): undirected
    edges are the symmetrized cust-nation <-> supp-nation trade flows;
    only ABOVE-MEAN edges survive (w * n_edges > total_w — an exact
    integer cross-multiply, so the cut is scale-free and float-free);
    output every triangle (n1 < n2 < n3) with its minimum edge weight.

    Scale shape: the corpus-sized work is the same distributed
    lineitem x orders co-partition join as nation_pagerank
    (_nation_trade_edges, <= nations^2 rows out); the triangle loop runs
    on that domain-bounded edge list on the driver.  At web-scale node
    sets the standard swap is the two-round edge-iterator co-group; here
    the domain bound makes driver numpy the right venue."""
    e = _nation_trade_edges(sf_dir)
    src = e["src"].to_numpy(np.int64)
    dst = e["dst"].to_numpy(np.int64)
    und = (
        pd.DataFrame(
            {
                "a": np.minimum(src, dst),
                "b": np.maximum(src, dst),
                "w": e["w"].to_numpy(np.int64),
            }
        )
        .query("a != b")
        .groupby(["a", "b"], as_index=False)["w"]
        .sum()
    )
    n_e = len(und)
    tot = int(und["w"].sum())
    keep = und["w"].to_numpy(np.int64) * n_e > tot
    ek = und[keep]
    wmap = {(int(r.a), int(r.b)): int(r.w) for r in ek.itertuples()}
    nbrs: dict[int, set] = {}
    for x, y in wmap:
        nbrs.setdefault(x, set()).add(y)  # only y > x by construction
    rows = []
    for x in sorted(nbrs):
        for y in sorted(nbrs[x]):
            for z in sorted(nbrs[x] & nbrs.get(y, set())):
                rows.append(
                    (x, y, z, min(wmap[(x, y)], wmap[(y, z)], wmap[(x, z)]))
                )
    return pa.table(
        {
            "n1": pa.array(np.asarray([r[0] for r in rows], np.int64)),
            "n2": pa.array(np.asarray([r[1] for r in rows], np.int64)),
            "n3": pa.array(np.asarray([r[2] for r in rows], np.int64)),
            "wmin": pa.array(np.asarray([r[3] for r in rows], np.int64)),
        }
    )


def _sql_trade_triangles() -> str:
    return """
    WITH e0 AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), und AS (
      SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(w) AS w
      FROM e0 WHERE src <> dst GROUP BY 1, 2
    ), m AS (
      SELECT count(*) AS ne, SUM(w) AS tot FROM und
    ), ek AS (
      SELECT a, b, w FROM und, m WHERE w * ne > tot
    )
    SELECT CAST(e1.a AS BIGINT) AS n1, CAST(e1.b AS BIGINT) AS n2,
           CAST(e2.b AS BIGINT) AS n3,
           CAST(LEAST(e1.w, e2.w, e3.w) AS BIGINT) AS wmin
    FROM ek e1
    JOIN ek e2 ON e2.a = e1.b
    JOIN ek e3 ON e3.a = e1.a AND e3.b = e2.b
    """


# ---------------------------------------------------------------------------
# tile_downsample — deterministic per-tile density cap
# ---------------------------------------------------------------------------

_DS_Z = 8
_DS_K = 20


def q_tile_downsample(sf_dir: str):
    """Deterministic per-tile density cap (the map-rendering spatial
    downsampling stage): keep at most K=20 events per z8 tile, selected
    as the K smallest splitmix64(event_id) values — splitmix64 is a
    bijection, so there are no ties and the kept set is retry-,
    partitioning- and cluster-size-invariant (sequential reservoir
    sampling is none of those).  Output per tile: raw count, kept count,
    kept-id sum (an identity checksum).

    Scale shape: a per-batch combiner emits the bottom-K candidates plus
    one count partial per tile (bottom-k of a union == bottom-k of
    merged bottom-k's, so the merge is associative); ONE tile-hash
    part-exchange then ships <= K+1 rows per (tile, batch), and each
    part resolves counts + the final bottom-K with one lexsort."""
    ds = _events_points(sf_dir)
    n_parts = 32

    _empty_cand = pa.table(
        {
            "tile_id": pa.array([], pa.int64()),
            "h": pa.array([], pa.uint64()),
            "eid": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
            "kind": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
        }
    )

    def combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty_cand
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        tx, ty = S.lonlat_to_tile(lon, lat, _DS_Z)
        tid = S.pack_tile_id(_DS_Z, tx, ty)
        h = synth._splitmix64(eid.astype(np.uint64))
        o = np.lexsort((h, tid))
        tid_s, h_s, eid_s = tid[o], h[o], eid[o]
        starts = np.flatnonzero(np.r_[True, tid_s[1:] != tid_s[:-1]])
        seg = np.cumsum(np.r_[True, tid_s[1:] != tid_s[:-1]]) - 1
        rank = np.arange(len(tid_s)) - starts[seg]
        cand = rank < _DS_K
        lens = np.diff(np.r_[starts, len(tid_s)])
        return pa.table(
            {
                "tile_id": pa.array(np.r_[tid_s[cand], tid_s[starts]]),
                "h": pa.array(
                    np.r_[h_s[cand], np.zeros(len(starts), np.uint64)].astype(np.uint64)
                ),
                "eid": pa.array(np.r_[eid_s[cand], np.zeros(len(starts), np.int64)]),
                "c": pa.array(
                    np.r_[np.zeros(int(cand.sum()), np.int64), lens.astype(np.int64)]
                ),
                "kind": pa.array(
                    np.r_[
                        np.zeros(int(cand.sum()), np.int64),
                        np.ones(len(starts), np.int64),
                    ]
                ),
                "part": pa.array(
                    (
                        synth._splitmix64(
                            np.r_[tid_s[cand], tid_s[starts]].astype(np.uint64)
                        )
                        % np.uint64(n_parts)
                    ).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "tile_id": pa.array([], pa.int64()),
            "n_raw": pa.array([], pa.int64()),
            "n_kept": pa.array([], pa.int64()),
            "kept_id_sum": pa.array([], pa.int64()),
        }
    )

    def resolve(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        tid = t["tile_id"].to_numpy(zero_copy_only=False)
        kind = t["kind"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        # raw counts per tile from the kind=1 partials
        cnt_t, cnt_inv = np.unique(tid[kind == 1], return_inverse=True)
        n_raw = np.zeros(len(cnt_t), np.int64)
        np.add.at(n_raw, cnt_inv, c[kind == 1])
        # final bottom-K over the candidate union
        m = kind == 0
        tid_c, h_c, eid_c = tid[m], h[m], eid[m]
        o = np.lexsort((h_c, tid_c))
        tid_c, h_c, eid_c = tid_c[o], h_c[o], eid_c[o]
        new = np.r_[True, tid_c[1:] != tid_c[:-1]]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        rank = np.arange(len(tid_c)) - starts[seg]
        kept = rank < _DS_K
        n_kept = np.zeros(len(starts), np.int64)
        np.add.at(n_kept, seg[kept], 1)
        ksum = np.zeros(len(starts), np.int64)
        np.add.at(ksum, seg[kept], eid_c[kept])
        # candidate tiles == counted tiles (every tile emits both kinds);
        # raise (not assert — stripped under -O) with tile context if the
        # one-block-per-part sort invariant is ever violated
        if len(starts) != len(cnt_t):
            raise ValueError(
                "tile_downsample resolve: candidate tiles != counted tiles "
                f"({len(starts)} vs {len(cnt_t)}) — the sort-by-part stage "
                "delivered a part split across blocks; first candidate tiles "
                f"{tid_c[starts[:5]].tolist()}, first counted {cnt_t[:5].tolist()}"
            )
        return pa.table(
            {
                "tile_id": pa.array(cnt_t),
                "n_raw": pa.array(n_raw),
                "n_kept": pa.array(n_kept),
                "kept_id_sum": pa.array(ksum),
            }
        )

    return (
        ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(resolve, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_tile_downsample() -> str:
    return f"""
    WITH pts AS (SELECT event_id, {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    t AS (
      SELECT event_id, {_tile_sql(_DS_Z)} AS tile_id,
             {_sql_splitmix64("event_id")} AS h
      FROM pts
    ), r AS (
      SELECT tile_id, event_id,
             row_number() OVER (PARTITION BY tile_id ORDER BY h) AS rn
      FROM t
    )
    SELECT tile_id,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(count(*) FILTER (WHERE rn <= {_DS_K}) AS BIGINT) AS n_kept,
           CAST(SUM(event_id) FILTER (WHERE rn <= {_DS_K}) AS BIGINT) AS kept_id_sum
    FROM r GROUP BY tile_id
    """



# ---------------------------------------------------------------------------
# embedding_sq8 — int8 scalar quantization of the embedding corpus
# ---------------------------------------------------------------------------


def q_embedding_sq8(sf_dir: str):
    """Int8 scalar quantization of the embedding corpus (the vector-store
    compression stage: FAISS SQ8 / Milvus SQ): symmetric quantization
    q = round(x / scale * 127) against ONE global scale = max |x| over
    the corpus, reporting each vector's reconstruction error.

    Exactness: scale is an exact double (abs/max of float32 inputs cast
    exactly to double, reduced by max — no summation); the quantize /
    dequantize / error chain is one fixed-arity IEEE expression per
    element with floor(x+0.5) rounding, and the per-element squared
    error is floor-quantized at 1e15 so per-vector sums are exact
    integers on both engines.

    Scale shape: pass 1 is a map-only abs-max reduce (one double per
    batch to the driver); pass 2 is pure map — each batch quantizes its
    own vectors against the broadcast scalar.  No shuffle anywhere."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def batch_max(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"m": pa.array([0.0])})
        flat = np.abs(
            np.concatenate(b["embedding"].to_pandas().to_numpy()).astype(np.float64)
        )
        return pa.table({"m": pa.array([float(flat.max()) if len(flat) else 0.0])})

    scale = float(
        ds.map_batches(batch_max, batch_format="pyarrow", zero_copy_batch=True).max("m")
    )

    _empty_q = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "dim": pa.array([], pa.int64()),
            "sq_err_q": pa.array([], pa.int64()),
        }
    )

    def quantize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty_q
        vid = b["vec_id"].to_numpy(zero_copy_only=False)
        embs = b["embedding"].to_pandas().to_numpy()
        dims = np.fromiter((len(e) for e in embs), np.int64, len(embs))
        x = np.concatenate(embs).astype(np.float64)
        qv = np.maximum(-127.0, np.minimum(127.0, np.floor((x / scale) * 127.0 + 0.5)))
        err = x - ((qv / 127.0) * scale)
        eq = np.floor((err * err) * 1000000000000000.0).astype(np.int64)
        seg = np.repeat(np.arange(len(embs)), dims)
        sums = np.zeros(len(embs), np.int64)
        np.add.at(sums, seg, eq)
        return pa.table(
            {
                "vec_id": pa.array(vid.astype(np.int64)),
                "dim": pa.array(dims),
                "sq_err_q": pa.array(sums),
            }
        )

    return ds.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)


def _sql_embedding_sq8() -> str:
    return """
    WITH s AS (
      SELECT MAX(m) AS scale FROM (
        SELECT list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS m
        FROM embeddings
      )
    ), el AS (
      SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
    ), q AS (
      SELECT vec_id, x, scale,
             GREATEST(-127.0, LEAST(127.0, floor((x / scale) * 127.0 + 0.5))) AS qv
      FROM el, s
    ), e AS (
      SELECT vec_id, (x - ((qv / 127.0) * scale)) AS err FROM q
    )
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS dim,
           CAST(SUM(CAST(floor((err * err) * 1000000000000000.0) AS BIGINT)) AS BIGINT) AS sq_err_q
    FROM e GROUP BY vec_id
    """


# ---------------------------------------------------------------------------
# lang_length_median — per-group exact median (grouped order statistic)
# ---------------------------------------------------------------------------


def q_lang_length_median(sf_dir: str):
    """Per-language exact lower-median document length (the grouped
    order-statistic companion of the global mad_prices): median_lo is the
    value at rank ceil(n/2) of each language's n_chars multiset.

    Scale shape: ONE histogram exchange bounded by the (lang, n_chars)
    VALUE DOMAIN, not the row count — per-batch np.unique combiner, one
    groupby, driver rank-pick over the compressed histogram (the
    price_quantiles/mad_prices shape applied per group)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["lang", "n_chars"], sort=False).size()
        ix = g.index
        return pa.table(
            {
                "lang": pa.array(ix.get_level_values(0).to_numpy(object), pa.string()),
                "n_chars": pa.array(ix.get_level_values(1).to_numpy(np.int64)),
                "c": pa.array(g.to_numpy(np.int64)),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values(["lang", "n_chars"], ignore_index=True)
    )
    out_lang, out_n, out_med = [], [], []
    for lang, g in hist.groupby("lang", sort=True):
        c = g["c"].to_numpy(np.int64)
        v = g["n_chars"].to_numpy(np.int64)
        n = int(c.sum())
        rank = (n + 1) // 2
        med = int(v[np.searchsorted(np.cumsum(c), rank)])
        out_lang.append(str(lang))
        out_n.append(n)
        out_med.append(med)
    return pa.table(
        {
            "lang": pa.array(out_lang, pa.string()),
            "n_docs": pa.array(np.asarray(out_n, np.int64)),
            "median_lo": pa.array(np.asarray(out_med, np.int64)),
        }
    )


def _sql_lang_length_median() -> str:
    return """
    WITH r AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS BIGINT) AS median_lo
    FROM r GROUP BY lang
    """



# ---------------------------------------------------------------------------
# llm_data_prep — the end-to-end training-data composition
# ---------------------------------------------------------------------------

_PREP_MIN_TOKENS = 50  # quality floor (C4-style minimum length)
_PREP_PREFIX = 8  # leading-boilerplate dedup key: first 8 raw tokens
_PREP_BUDGET = 1024  # tokens per packed training sequence
_PREP_BUCKET = 64  # docs per ordered scan bucket


def q_llm_data_prep(sf_dir: str):
    """The end-to-end LLM training-data preparation pipeline, composed
    from this engine's stage kernels into ONE flow: quality filter
    (minimum length + mean-token-length guard) → benchmark exclusion +
    n-gram decontamination (the decontaminate screen) → deterministic
    train-split selection (the train_split hash) → leading-boilerplate
    dedup (keep the min doc_id per 8-token prefix) → concat-and-chunk
    sequence packing (the pack_sequences two-phase prefix scan).  Output:
    one row per packed sequence with its starting-doc count and token
    total — the shape a pretraining loader consumes.

    Scale shape (the reason this composition exists): the corpus text is
    read ONCE — a single map pass computes every per-doc signal (token
    count, quality verdict, contamination flag via the broadcast
    benchmark window set, split bucket, prefix fingerprint) so text
    never enters a shuffle; everything downstream moves only slim int
    rows.  Dedup is one prefix-hash part-exchange (run heads after a
    lexsort = argmin per key); packing is the scan-of-block-sums with
    bucket-bounded groups.  Retry/partitioning/cluster-size invariant
    end to end (hash split, bijective fingerprints, ordered id
    buckets)."""
    import hashlib

    import ray
    from ray.data.aggregate import Count, Sum

    W, MOD = _DECON_W, _DECON_MOD
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    # pass 0: benchmark window hash set (bounded by benchmark size)
    def bench_hashes(df: pd.DataFrame) -> pa.Table:
        return _bench_window_hashes(df, W, MOD)

    bset = np.unique(
        docs.map_batches(bench_hashes, batch_format="pandas").to_pandas()["h"].to_numpy(np.int64)
    )
    bref = ray.put(bset)
    n_parts = 16

    # pass 1: the ONLY full text scan — every signal in one map
    def profile(df: pd.DataFrame) -> pa.Table:
        import ray as _ray

        bs = _ray.get(bref)
        out_k, out_d, out_n = [], [], []
        dids = df["doc_id"].to_numpy(np.int64)
        hh = dids.astype(np.uint64) * np.uint64(_FIB64)
        hh ^= hh >> np.uint64(31)
        hh *= np.uint64(_SPLIT_MULT2)
        permille = (hh % np.uint64(1000)).astype(np.int64)
        for did, pm, txt in zip(dids, permille, df["text"].astype(str)):
            if did % MOD == 0 or pm >= _SPLIT_TRAIN:
                continue
            toks_raw = txt.split(" ")
            # lower() cannot change space-split token boundaries, so the
            # raw split serves both the windows and the token count
            n_tokens = sum(1 for t in toks_raw if t)
            if n_tokens < _PREP_MIN_TOKENS or len(txt) > n_tokens * 9:
                continue
            wh = _md5_window_hashes(toks_raw, W)
            ix = np.searchsorted(bs, wh)
            ix[ix == len(bs)] = 0
            if len(bs) and bool((bs[ix] == wh).any()):
                continue
            pre = " ".join(toks_raw[:_PREP_PREFIX]).encode()
            pkey = int.from_bytes(hashlib.md5(pre).digest()[8:], "little", signed=True)
            out_k.append(pkey)
            out_d.append(int(did))
            out_n.append(n_tokens)
        k = np.asarray(out_k, np.int64)
        return pa.table(
            {
                "pkey": pa.array(k),
                "doc_id": pa.array(np.asarray(out_d, np.int64)),
                "n_tokens": pa.array(np.asarray(out_n, np.int64)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int64()),
        }
    )

    def dedup_heads(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        k = t["pkey"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        o = np.lexsort((d, k))
        k, d, n = k[o], d[o], n[o]
        head = np.r_[True, k[1:] != k[:-1]]  # min doc_id per prefix key
        return pa.table(
            {
                "doc_id": pa.array(d[head]),
                "n_tokens": pa.array(n[head]),
                "bucket": pa.array(d[head] // _PREP_BUCKET),
            }
        )

    surv = (
        docs.map_batches(profile, batch_format="pandas")
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(dedup_heads, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .materialize()  # slim int table; feeds both scan phases
    )

    totals = (
        surv.groupby("bucket")
        .aggregate(Sum("n_tokens", alias_name="t"))
        .to_pandas()
        .sort_values("bucket")
    )
    totals["base"] = (totals["t"].cumsum() - totals["t"]).astype(np.int64)
    base_ref = ray.put(totals[["bucket", "base"]].set_index("bucket")["base"])

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        base = _ray.get(base_ref)
        g = g.sort_values("doc_id")
        nt = g["n_tokens"].to_numpy(np.int64)
        start = (np.cumsum(nt) - nt) + int(base.loc[int(g["bucket"].iloc[0])])
        return pd.DataFrame({"seq_id": start // _PREP_BUDGET, "n_tokens": nt})

    return (
        surv.groupby("bucket")
        .map_groups(pack, batch_format="pandas")
        .groupby("seq_id")
        .aggregate(Count(alias_name="n_docs"), Sum("n_tokens", alias_name="n_tokens"))
    )


def _sql_llm_data_prep() -> str:
    W, MOD = _DECON_W, _DECON_MOD
    return f"""
    WITH base AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(lower(text), ' '), s -> s <> '')) AS BIGINT) AS n_tokens,
             CAST(length(text) AS BIGINT) AS n_chars,
             string_split(text, ' ') AS rt
      FROM documents
    ), w AS (
      SELECT doc_id, array_to_string(rt[s.i:s.i+{W - 1}], ' ') AS win
      FROM base, LATERAL (SELECT unnest(generate_series(1, len(rt) - {W} + 1)) AS i) s
      WHERE len(rt) >= {W}
    ), bw AS (
      SELECT DISTINCT win FROM w WHERE doc_id % {MOD} = 0
    ), cont AS (
      SELECT DISTINCT w.doc_id FROM w JOIN bw USING (win) WHERE w.doc_id % {MOD} <> 0
    ), h1 AS (
      SELECT doc_id, (CAST(doc_id AS HUGEINT) * {_FIB64}) % {_U64} AS h FROM base
    ), h2 AS (
      SELECT doc_id, (xor(h, h // 2147483648) * {_SPLIT_MULT2}) % {_U64} AS h FROM h1
    ), train AS (
      SELECT b.doc_id, b.n_tokens, array_to_string(b.rt[1:{_PREP_PREFIX}], ' ') AS pre
      FROM base b JOIN h2 USING (doc_id)
      WHERE b.doc_id % {MOD} <> 0
        AND h2.h % 1000 < {_SPLIT_TRAIN}
        AND b.n_tokens >= {_PREP_MIN_TOKENS}
        AND b.n_chars <= b.n_tokens * 9
        AND b.doc_id NOT IN (SELECT doc_id FROM cont)
    ), surv AS (
      SELECT t.doc_id, t.n_tokens
      FROM train t JOIN (SELECT pre, MIN(doc_id) AS doc_id FROM train GROUP BY pre) k
        ON t.doc_id = k.doc_id
    ), sc AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      FROM surv
    )
    SELECT CAST(cum // {_PREP_BUDGET} AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM sc GROUP BY 1
    """



# ---------------------------------------------------------------------------
# event_lateness — out-of-order arrival (watermark) diagnostics
# ---------------------------------------------------------------------------

_LATE_US = 0  # an event is late if its ts precedes the running max


def q_event_lateness(sf_dir: str):
    """Out-of-order arrival profile (the watermark-lateness diagnostic a
    streaming ingest needs): an event is LATE if its timestamp precedes
    the running max of earlier-ARRIVED events for the same user; report
    per user the late count and the maximum lateness (µs, exact
    integers).  Arrival order is simulated as splitmix64(event_id) — a
    deterministic bijective network-shuffle permutation — because the
    synthetic feed is ts-ordered by construction (zero lateness under
    id order would make the op degenerate).

    Scale shape: ONE user-hash part-exchange; per part a single lexsort
    (user, arrival) + grouped cummax (pandas C kernel) answers every
    user — no per-user Python loop."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b["user_id"],
                "arrival": pa.array(synth._splitmix64(eid.astype(np.uint64)).astype(np.uint64)),
                "t": pa.array(
                    b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
                ),
                "part": pa.array(
                    (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_late": pa.array([], pa.int64()),
            "max_late_us": pa.array([], pa.int64()),
        }
    )

    def late(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        df = t.to_pandas().sort_values(["user_id", "arrival"], ignore_index=True)
        g = df.groupby("user_id", sort=True)
        prevmax = g["t"].cummax().groupby(df["user_id"]).shift(1)
        lateness = (prevmax - df["t"]).fillna(0).astype(np.int64).clip(lower=0)
        is_late = lateness > _LATE_US
        agg = pd.DataFrame(
            {
                "user_id": df["user_id"],
                "one": np.ones(len(df), np.int64),
                "is_late": is_late.astype(np.int64),
                "lateness": lateness,
            }
        ).groupby("user_id", sort=True).agg(
            n_events=("one", "sum"), n_late=("is_late", "sum"), max_late_us=("lateness", "max")
        )
        return pa.table(
            {
                "user_id": pa.array(agg.index.to_numpy(np.int64)),
                "n_events": pa.array(agg["n_events"].to_numpy(np.int64)),
                "n_late": pa.array(agg["n_late"].to_numpy(np.int64)),
                "max_late_us": pa.array(agg["max_late_us"].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(late, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_event_lateness() -> str:
    return f"""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS t,
             MAX(epoch_us(ts)) OVER (PARTITION BY user_id
                 ORDER BY {_sql_splitmix64("event_id")}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN prevmax > t THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(COALESCE(MAX(CASE WHEN prevmax > t THEN prevmax - t END), 0) AS BIGINT) AS max_late_us
    FROM s GROUP BY user_id
    """


# ---------------------------------------------------------------------------
# user_coverage_time — gaps-and-islands interval union length
# ---------------------------------------------------------------------------

_COVER_US = 1_800_000_000  # each event covers [ts, ts + 30 min)


def q_user_coverage_time(sf_dir: str):
    """Interval-union length per user (the gaps-and-islands classic):
    each event covers [ts, ts+30min); report the total covered time with
    overlaps merged — exact integer µs via the sorted sweep identity
    contribution_i = max(0, end_i - max(prev_running_max_end, t_i)).

    Scale shape: ONE user-hash part-exchange; per part a lexsort
    (user, t, event_id) + grouped cummax + one vectorized expression —
    no island loop."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "t": pa.array(
                    b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
                ),
                "part": pa.array(
                    (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "covered_us": pa.array([], pa.int64()),
        }
    )

    def cover(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        df = t.to_pandas().sort_values(["user_id", "t", "event_id"], ignore_index=True)
        end = df["t"].to_numpy(np.int64) + _COVER_US
        prevmax = (
            pd.Series(end).groupby(df["user_id"]).cummax().groupby(df["user_id"]).shift(1)
        )
        tt = df["t"].to_numpy(np.int64)
        floor_end = np.maximum(prevmax.fillna(np.iinfo(np.int64).min).to_numpy(np.int64), tt)
        contrib = np.maximum(0, end - floor_end)
        agg = pd.DataFrame(
            {"user_id": df["user_id"], "one": np.ones(len(df), np.int64), "c": contrib}
        ).groupby("user_id", sort=True).agg(n_events=("one", "sum"), covered_us=("c", "sum"))
        return pa.table(
            {
                "user_id": pa.array(agg.index.to_numpy(np.int64)),
                "n_events": pa.array(agg["n_events"].to_numpy(np.int64)),
                "covered_us": pa.array(agg["covered_us"].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(cover, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_user_coverage_time() -> str:
    return f"""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS t, epoch_us(ts) + {_COVER_US} AS e,
             MAX(epoch_us(ts) + {_COVER_US}) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(GREATEST(0, e - GREATEST(COALESCE(prevmax, t), t))) AS BIGINT) AS covered_us
    FROM s GROUP BY user_id
    """



# ---------------------------------------------------------------------------
# dq_orphans — referential-integrity audit (data-quality checks)
# ---------------------------------------------------------------------------


def q_dq_orphans(sf_dir: str):
    """Data-quality audit (the gate a production ingest runs first): one
    row per check with total and violation counts — referential checks
    (lineitem rows without an order, orders without a customer, events
    from users outside the customer table) and value-level checks (a
    lineitem shipped before its order date, customers with negative
    balances).

    Scale shape: the BIG x BIG checks (lineitem vs orders: both the anti
    probe and the ship-before-order comparison) share ONE hash
    co-partition — only (key, epoch-day) pairs move; the dimension
    checks broadcast the distinct parent key set once via ray.put; the
    value checks are per-batch combiners.  Output is five rows
    regardless of corpus size."""
    import ray

    # --- big x big: lineitem vs orders (anti probe + ship-date check) ---
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    n_parts = int(max(8, min(4096, lines.count() // 200_000 + 1)))

    def tag(b: pa.Table, key_col: str, date_col: str, is_build: bool) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        d = (
            b[date_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "key": b[key_col],
                "day": pa.array(d),
                "is_build": pa.array(np.full(len(k), is_build)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    def li_checks(t: pa.Table) -> pa.Table:
        isb = t["is_build"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        n_probe = int((~isb).sum())
        hit = _join_part_key(t)
        if hit is None:
            matched, early = 0, 0
        else:
            b_hit, p_hit = hit
            matched = len(p_hit)
            early = int((day[p_hit] < day[b_hit]).sum())
        return pa.table(
            {
                "check": pa.array(
                    ["lineitem_no_order", "lineitem_ship_before_order"], pa.string()
                ),
                "n_total": pa.array([n_probe, n_probe], pa.int64()),
                "n_violations": pa.array([n_probe - matched, early], pa.int64()),
            }
        )

    li = (
        orders.map_batches(
            lambda b: tag(b, "o_orderkey", "o_orderdate", True), batch_format="pyarrow"
        )
        .union(
            lines.map_batches(
                lambda b: tag(b, "l_orderkey", "l_shipdate", False), batch_format="pyarrow"
            )
        )
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(li_checks, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )

    # --- dimension checks: broadcast the distinct customer key set ---
    ckeys = np.asarray(
        _read(sf_dir, "customer", ["c_custkey"]).unique("c_custkey"), np.int64
    )
    cref = ray.put(np.sort(ckeys))

    def miss_counter(col: str, check: str):
        def count(b: pa.Table) -> pa.Table:
            import ray as _ray

            ck = _ray.get(cref)
            k = b[col].to_numpy(zero_copy_only=False)
            ix = np.minimum(np.searchsorted(ck, k), len(ck) - 1)
            miss = int((ck[ix] != k).sum()) if len(ck) else len(k)
            return pa.table(
                {
                    "check": pa.array([check], pa.string()),
                    "n_total": pa.array([len(k)], pa.int64()),
                    "n_violations": pa.array([miss], pa.int64()),
                }
            )

        return count

    oc = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        miss_counter("o_custkey", "order_no_customer"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    eu = _read(sf_dir, "events", ["user_id"]).map_batches(
        miss_counter("user_id", "event_user_not_customer"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # --- value check: negative customer balances (per-batch combiner) ---
    def neg_bal(b: pa.Table) -> pa.Table:
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "check": pa.array(["customer_negative_balance"], pa.string()),
                "n_total": pa.array([len(bal)], pa.int64()),
                "n_violations": pa.array([int((bal < 0).sum())], pa.int64()),
            }
        )

    nb = _read(sf_dir, "customer", ["c_acctbal"]).map_batches(
        neg_bal, batch_format="pyarrow", zero_copy_batch=True
    )

    # ONE streaming execution for all four branches (they used to run as
    # four serial .to_pandas() pipelines: 9.5 s -> ~4 s at sf0.1/32)
    allp = (
        li.union(oc).union(eu).union(nb).to_pandas().groupby("check", sort=True).sum()
    )
    return pa.table(
        {
            "check": pa.array(allp.index.to_numpy(object), pa.string()),
            "n_total": pa.array(allp["n_total"].to_numpy(np.int64)),
            "n_violations": pa.array(allp["n_violations"].to_numpy(np.int64)),
        }
    )


def _sql_dq_orphans() -> str:
    return """
    SELECT 'customer_negative_balance' AS check,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
    FROM customer
    UNION ALL
    SELECT 'event_user_not_customer',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    UNION ALL
    SELECT 'lineitem_no_order',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem_ship_before_order',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN o.o_orderkey IS NOT NULL
                          AND CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'order_no_customer',
           CAST(count(*) AS BIGINT),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    """


# ---------------------------------------------------------------------------
# brand_hhi — market-concentration (Herfindahl) analytics
# ---------------------------------------------------------------------------


def q_brand_hhi(sf_dir: str):
    """Market concentration by part brand: per-brand revenue (exact
    integer cents via the broadcast part->brand dimension map) plus each
    brand's squared market share, and an 'ALL' row carrying the
    Herfindahl index.

    Exactness: shares are per-TERM quantized — share_sq_q =
    floor(((s_i * s_i) / (S * S)) * 1e12) with products in doubles (one
    fixed-arity expression), so the HHI row is a pure integer sum of the
    per-brand terms on both engines.

    Scale shape: the part dimension ships once via ray.put; per-batch
    cents combiner -> one brand groupby; the HHI math runs on the
    brand-bounded result."""
    import math

    import ray
    from ray.data.aggregate import Sum

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    bref = ray.put(part.set_index("p_partkey")["p_brand"])

    def partial(b: pa.Table) -> pa.Table:
        import ray as _ray

        p2b = _ray.get(bref)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        df = pd.DataFrame({"brand": p2b.reindex(pk).to_numpy(object), "c": cents})
        g = df.groupby("brand", sort=False)["c"].sum()
        return pa.table(
            {
                "brand": pa.array(g.index.to_numpy(object), pa.string()),
                "c": pa.array(g.to_numpy(np.int64)),
            }
        )

    rev = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("brand")
        .aggregate(Sum("c", alias_name="revenue_cents"))
        .to_pandas()
        .sort_values("brand", ignore_index=True)
    )
    si = rev["revenue_cents"].to_numpy(np.int64)
    S = int(si.sum())
    share_sq = np.asarray(
        [
            int(math.floor(((float(x) * float(x)) / (float(S) * float(S))) * 1e12))
            for x in si
        ],
        np.int64,
    )
    return pa.table(
        {
            "brand": pa.array(list(rev["brand"].astype(str)) + ["ALL"], pa.string()),
            "revenue_cents": pa.array(np.r_[si, np.int64(S)].astype(np.int64)),
            "share_sq_q": pa.array(np.r_[share_sq, np.int64(share_sq.sum())].astype(np.int64)),
        }
    )


def _sql_brand_hhi() -> str:
    share = (
        "CAST(floor(((CAST(c AS DOUBLE) * CAST(c AS DOUBLE))"
        " / (CAST(S AS DOUBLE) * CAST(S AS DOUBLE))) * 1000000000000.0) AS BIGINT)"
    )
    return f"""
    WITH rev AS (
      SELECT p.p_brand AS brand,
             SUM(CAST(floor(l.l_extendedprice * 100.0) AS BIGINT)) AS c
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ), tot AS (
      SELECT SUM(c) AS S FROM rev
    ), per AS (
      SELECT brand, CAST(c AS BIGINT) AS revenue_cents, {share} AS share_sq_q
      FROM rev, tot
    )
    SELECT brand, revenue_cents, share_sq_q FROM per
    UNION ALL
    SELECT 'ALL', CAST(S AS BIGINT), (SELECT CAST(SUM(share_sq_q) AS BIGINT) FROM per)
    FROM tot
    """


# ---------------------------------------------------------------------------
# image_aspect_stats — aspect-ratio profile of the image corpus
# ---------------------------------------------------------------------------


def q_image_aspect_stats(sf_dir: str):
    """Aspect-ratio profile of the image corpus (the multimodal-metadata
    bucketing a vision-data pipeline uses to route resize strategies):
    per (fmt, shape-class) counts and total pixels, with the class
    decided by integer cross-compares (w*3 > h*4 => wide,
    h*3 > w*4 => tall, else square) — no float ratio anywhere.

    Scale shape: a pruned (w, h, fmt) read — image bytes never leave
    storage — with a per-batch combiner; one bounded groupby."""
    from ray.data.aggregate import Sum

    from . import tiling

    images = tiling.read_images(sf_dir, columns=["fmt", "w", "h"])

    def partial(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = b["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        shape = np.where(w * 3 > h * 4, "wide", np.where(h * 3 > w * 4, "tall", "square"))
        df = pd.DataFrame(
            {"fmt": b["fmt"].to_pylist(), "shape": shape, "px": w * h}
        )
        g = df.groupby(["fmt", "shape"], sort=False)["px"].agg(["count", "sum"])
        ix = g.index
        return pa.table(
            {
                "fmt": pa.array(ix.get_level_values(0).to_numpy(object), pa.string()),
                "shape": pa.array(ix.get_level_values(1).to_numpy(object), pa.string()),
                "n": pa.array(g["count"].to_numpy(np.int64)),
                "total_px": pa.array(g["sum"].to_numpy(np.int64)),
            }
        )

    return (
        images.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["fmt", "shape"])
        .aggregate(Sum("n", alias_name="n"), Sum("total_px", alias_name="total_px"))
    )


def _sql_image_aspect_stats(sf: float = 0.01) -> str:
    import os

    from ..sources import synth as _synth

    path = os.path.join(_synth.CACHE_DIR, f"images_sf{sf:g}", "*.parquet")
    return f"""
    WITH b AS (
      SELECT fmt,
             CASE WHEN w * 3 > h * 4 THEN 'wide'
                  WHEN h * 3 > w * 4 THEN 'tall'
                  ELSE 'square' END AS shape,
             CAST(w AS BIGINT) * CAST(h AS BIGINT) AS px
      FROM read_parquet('{path}')
    )
    SELECT fmt, shape, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(px) AS BIGINT) AS total_px
    FROM b GROUP BY fmt, shape
    """



# ---------------------------------------------------------------------------
# balance_langs — deterministic class rebalancing of the corpus
# ---------------------------------------------------------------------------


def q_balance_langs(sf_dir: str):
    """Deterministic class rebalancing (the training-mix equalizer): keep
    each language with probability min_count/count(lang) so every class
    lands at roughly the smallest class's size, decided per doc by the
    EXACT integer cross-multiply splitmix64(doc_id) * n_lang <
    min_n * 2^64 — no float rates, retry/partitioning/cluster-size
    invariant (the stratified_sample guarantee with data-derived rates).
    Output per language: counts before and after.

    Scale shape: one tiny lang-count groupby (per-batch combiner), the
    per-lang uint64 thresholds broadcast in the task closure (bounded by
    |langs|), then a pure map + count combiner."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def count_partial(df: pd.DataFrame) -> pa.Table:
        vc = df["lang"].value_counts()
        return pa.table(
            {
                "lang": pa.array(vc.index.to_numpy(object), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    cnt = (
        ds.map_batches(count_partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("lang", ignore_index=True)
    )
    n_by_lang = dict(zip(cnt["lang"].astype(str), cnt["n"].to_numpy(np.int64)))
    mn = int(min(n_by_lang.values()))
    # h * n < mn * 2^64  <=>  h <= (mn * 2^64 - 1) // n  (exact int math;
    # the threshold is 2^64-1 for the smallest class, i.e. keep-all)
    thr = {
        lang: np.uint64(((mn << 64) - 1) // int(n)) for lang, n in n_by_lang.items()
    }

    def keep_partial(df: pd.DataFrame) -> pa.Table:
        h = synth._splitmix64(df["doc_id"].to_numpy(np.int64).astype(np.uint64))
        t = np.asarray([thr[l] for l in df["lang"].astype(str)], np.uint64)
        vc = df["lang"][h <= t].value_counts()
        return pa.table(
            {
                "lang": pa.array(vc.index.to_numpy(object), pa.string()),
                "k": pa.array(vc.to_numpy(np.int64)),
            }
        )

    kept = (
        ds.map_batches(keep_partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("k", alias_name="k"))
        .to_pandas()
    )
    k_by_lang = dict(zip(kept["lang"].astype(str), kept["k"].to_numpy(np.int64)))
    return pa.table(
        {
            "lang": pa.array(cnt["lang"].astype(str), pa.string()),
            "n_before": pa.array(cnt["n"].to_numpy(np.int64)),
            "n_after": pa.array(
                np.asarray(
                    [int(k_by_lang.get(l, 0)) for l in cnt["lang"].astype(str)], np.int64
                )
            ),
        }
    )


def _sql_balance_langs() -> str:
    return f"""
    WITH cnt AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ), m AS (
      SELECT MIN(n) AS mn FROM cnt
    ), h AS (
      SELECT lang, {_sql_splitmix64("doc_id")} AS h FROM documents
    ), k AS (
      SELECT h.lang
      FROM h JOIN cnt USING (lang), m
      WHERE CAST(h.h AS HUGEINT) * cnt.n < CAST(m.mn AS HUGEINT) * {1 << 64}
    )
    SELECT c.lang,
           CAST(c.n AS BIGINT) AS n_before,
           CAST(COALESCE(k2.n2, 0) AS BIGINT) AS n_after
    FROM cnt c LEFT JOIN (SELECT lang, count(*) AS n2 FROM k GROUP BY lang) k2 USING (lang)
    """



# ---------------------------------------------------------------------------
# assoc_rules — market-basket association rules over event sessions
# ---------------------------------------------------------------------------


def q_assoc_rules(sf_dir: str):
    """Association-rule mining (the market-basket / a-priori first level)
    over 30-minute event sessions: for every ORDERED pair of event types
    (a -> b), the co-occurrence session count, the confidence
    n_ab / n_a and the lift n_ab * N / (n_a * n_b) — floor(x*1e6)
    quantized, single fixed-arity IEEE expressions over exact integer
    counts.

    Scale shape: ONE user-hash part-exchange; per part a lexsort
    (user, t, event_id) + vectorized gap/cumsum sessionization (the
    q_sessionize rule), a (session, type) drop_duplicates, and a
    self-merge per part produce ordered-pair partials; the driver sees
    only types^2-bounded count tables."""
    import math

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "t": pa.array(
                    b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[s]").astype(np.int64)
                ),
                "part": pa.array(
                    (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "kind": pa.array([], pa.int64()),
        }
    )

    def partials(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        df = t.to_pandas().sort_values(["user_id", "t", "event_id"], ignore_index=True)
        uid = df["user_id"].to_numpy(np.int64)
        tt = df["t"].to_numpy(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = np.r_[0, tt[1:] - tt[:-1]]
        brk = new_user | (gap > 1800)
        sid = np.cumsum(brk)  # globally unique within the part
        st = pd.DataFrame({"sid": sid, "ty": df["event_type"].to_numpy(object)}).drop_duplicates()
        n_sessions = int(brk.sum())
        ta = st.groupby("ty", sort=False).size()
        pairs = st.merge(st, on="sid")
        pairs = pairs[pairs["ty_x"] != pairs["ty_y"]]
        pc2 = pairs.groupby(["ty_x", "ty_y"], sort=False).size()
        tabs = [
            pa.table(
                {
                    "a": pa.array(pc2.index.get_level_values(0).to_numpy(object), pa.string()),
                    "b": pa.array(pc2.index.get_level_values(1).to_numpy(object), pa.string()),
                    "n": pa.array(pc2.to_numpy(np.int64)),
                    "kind": pa.array(np.zeros(len(pc2), np.int64)),
                }
            ),
            pa.table(
                {
                    "a": pa.array(ta.index.to_numpy(object), pa.string()),
                    "b": pa.array(np.full(len(ta), "", object), pa.string()),
                    "n": pa.array(ta.to_numpy(np.int64)),
                    "kind": pa.array(np.ones(len(ta), np.int64)),
                }
            ),
            pa.table(
                {
                    "a": pa.array([""], pa.string()),
                    "b": pa.array([""], pa.string()),
                    "n": pa.array([n_sessions], pa.int64()),
                    "kind": pa.array([2], pa.int64()),
                }
            ),
        ]
        return pa.concat_tables(tabs)

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(partials, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["a", "b", "kind"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    N = int(agg.loc[agg["kind"] == 2, "n"].iloc[0])
    na = dict(
        zip(
            agg.loc[agg["kind"] == 1, "a"].astype(str),
            agg.loc[agg["kind"] == 1, "n"].to_numpy(np.int64),
        )
    )
    pairs = agg[agg["kind"] == 0].sort_values(["a", "b"], ignore_index=True)
    out_conf, out_lift = [], []
    for r in pairs.itertuples():
        n_ab, n_a, n_b = int(r.n), int(na[str(r.a)]), int(na[str(r.b)])
        out_conf.append(int(math.floor((float(n_ab) / float(n_a)) * 1e6)))
        out_lift.append(
            int(
                math.floor(
                    ((float(n_ab) * float(N)) / (float(n_a) * float(n_b))) * 1e6
                )
            )
        )
    return pa.table(
        {
            "a": pa.array(pairs["a"].astype(str), pa.string()),
            "b": pa.array(pairs["b"].astype(str), pa.string()),
            "n_ab": pa.array(pairs["n"].to_numpy(np.int64)),
            "conf_x1e6": pa.array(np.asarray(out_conf, np.int64)),
            "lift_x1e6": pa.array(np.asarray(out_lift, np.int64)),
        }
    )


def _sql_assoc_rules() -> str:
    return """
    WITH e AS (
      SELECT user_id, event_type, event_id, epoch(ts) AS t FROM events
    ), o AS (
      SELECT user_id, event_type, t, event_id,
             CASE WHEN lag(t) OVER w IS NULL THEN 1
                  WHEN t - lag(t) OVER w > 1800 THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ), s AS (
      SELECT user_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    ), st AS (
      SELECT DISTINCT user_id, sid, event_type FROM s
    ), nt AS (
      SELECT count(*) AS n FROM (SELECT DISTINCT user_id, sid FROM s)
    ), ta AS (
      SELECT event_type, count(*) AS na FROM st GROUP BY 1
    ), pr AS (
      SELECT x.event_type AS a, y.event_type AS b, count(*) AS nab
      FROM st x JOIN st y ON x.user_id = y.user_id AND x.sid = y.sid
                         AND x.event_type <> y.event_type
      GROUP BY 1, 2
    )
    SELECT pr.a, pr.b, CAST(pr.nab AS BIGINT) AS n_ab,
           CAST(floor((CAST(pr.nab AS DOUBLE) / CAST(ta1.na AS DOUBLE)) * 1000000.0) AS BIGINT) AS conf_x1e6,
           CAST(floor(((CAST(pr.nab AS DOUBLE) * CAST(nt.n AS DOUBLE))
                       / (CAST(ta1.na AS DOUBLE) * CAST(ta2.na AS DOUBLE))) * 1000000.0) AS BIGINT) AS lift_x1e6
    FROM pr
    JOIN ta ta1 ON ta1.event_type = pr.a
    JOIN ta ta2 ON ta2.event_type = pr.b
    CROSS JOIN nt
    """



# ---------------------------------------------------------------------------
# price_trend_by_flag — grouped least-squares trend (regression per group)
# ---------------------------------------------------------------------------


def q_price_trend_by_flag(sf_dir: str):
    """Per-group least-squares trend (the grouped-regression companion of
    corr_moments): for each return flag, the slope of price (cents) over
    ship date (epoch days), plus the exact count.

    Exactness: the five regression moments are EXACT integer sums at any
    corpus scale — per-batch moments are int64-safe (x = epoch day ~2e4,
    y = cents; x*y ~ 1e11/row x bounded batch rows), and the wide sy/sxx/
    sxy partials are SPLIT hi/lo (hi = m >> 31, lo = m & (2^31-1)) before
    the cross-batch Sum so each summed column stays far inside int64 even
    at 100-TB lineitem scale; the driver recombines hi*2^31+lo in Python
    bigints, mirroring the oracle's HUGEINT sums. The slope is one
    fixed-arity IEEE expression over exactly-converted doubles,
    floor(slope*1e6)-quantized.

    Scale shape: one |flags|-bounded groupby of 9 combiner columns."""
    import math

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_shipdate"])

    def moments(b: pa.Table) -> pa.Table:
        flag = b["l_returnflag"].to_pylist()
        y = np.floor(b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        x = (
            b["l_shipdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        df = pd.DataFrame(
            {"flag": flag, "n": 1, "sx": x, "sy": y, "sxx": x * x, "sxy": x * y}
        )
        g = df.groupby("flag", sort=False).sum()
        # hi/lo split of the wide moments: per-batch values fit int64, but
        # cross-batch Sum of sxy (~1e11/row) would overflow int64 around
        # sf~20 lineitem scale — hi counts 2^31 units, lo < 2^31, each sum
        # stays < 2^63 out to >>100-TB scale; recombined exactly below.
        _HL = np.int64(1) << np.int64(31)
        cols = {"flag": pa.array(g.index.to_numpy(object), pa.string())}
        cols["n"] = pa.array(g["n"].to_numpy(np.int64))
        cols["sx"] = pa.array(g["sx"].to_numpy(np.int64))
        for name in ("sy", "sxx", "sxy"):
            v = g[name].to_numpy(np.int64)
            cols[name + "_hi"] = pa.array(v // _HL)
            cols[name + "_lo"] = pa.array(v % _HL)
        return pa.table(cols)

    m = (
        ds.map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("flag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy_hi", alias_name="sy_hi"),
            Sum("sy_lo", alias_name="sy_lo"),
            Sum("sxx_hi", alias_name="sxx_hi"),
            Sum("sxx_lo", alias_name="sxx_lo"),
            Sum("sxy_hi", alias_name="sxy_hi"),
            Sum("sxy_lo", alias_name="sxy_lo"),
        )
        .to_pandas()
        .sort_values("flag", ignore_index=True)
    )
    slopes = []
    for r in m.itertuples():
        n, sx = int(r.n), int(r.sx)
        sy = (int(r.sy_hi) << 31) + int(r.sy_lo)
        sxx = (int(r.sxx_hi) << 31) + int(r.sxx_lo)
        sxy = (int(r.sxy_hi) << 31) + int(r.sxy_lo)
        num = n * sxy - sx * sy  # Python bigints: exact at any scale
        den = n * sxx - sx * sx
        slopes.append(int(math.floor((float(num) / float(den)) * 1e6)))
    return pa.table(
        {
            "flag": pa.array(m["flag"].astype(str), pa.string()),
            "n": pa.array(m["n"].to_numpy(np.int64)),
            "slope_x1e6": pa.array(np.asarray(slopes, np.int64)),
        }
    )


def _sql_price_trend_by_flag() -> str:
    return """
    WITH q AS (
      SELECT l_returnflag AS flag,
             CAST(epoch_ms(CAST(l_shipdate AS DATE)) // 86400000 AS HUGEINT) AS x,
             CAST(floor(l_extendedprice * 100.0) AS HUGEINT) AS y
      FROM lineitem
    ), s AS (
      SELECT flag, CAST(count(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM q GROUP BY flag
    )
    SELECT flag, CAST(n AS BIGINT) AS n,
           CAST(floor((CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)) * 1000000.0) AS BIGINT) AS slope_x1e6
    FROM s
    """



# ---------------------------------------------------------------------------
# embedding_norm_stats — vector-hygiene profile per label
# ---------------------------------------------------------------------------


def q_embedding_norm_stats(sf_dir: str):
    """Embedding-store hygiene profile: per label, vector count and the
    exact-integer distribution of squared norms (sum / min / max of the
    per-vector quantized |v|²) — the screen that catches zero, exploded
    or unnormalized vectors before they poison an ANN index.

    Exactness: |v|² is summed per ELEMENT as floor(x²*1e12) integers
    (the per-term quantization rule), so vector values are identical
    across engines no matter how each sums floats; all aggregates are
    integer.

    Scale shape: map-only per-batch combiner → one |labels|-bounded
    groupby."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    _empty_ns = pa.table(
        {
            "label": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sum_nq": pa.array([], pa.int64()),
            "min_nq": pa.array([], pa.int64()),
            "max_nq": pa.array([], pa.int64()),
        }
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty_ns
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        embs = b["embedding"].to_pandas().to_numpy()
        dims = np.fromiter((len(e) for e in embs), np.int64, len(embs))
        x = np.concatenate(embs).astype(np.float64)
        q = np.floor((x * x) * 1000000000000.0).astype(np.int64)
        seg = np.repeat(np.arange(len(embs)), dims)
        nq = np.zeros(len(embs), np.int64)
        np.add.at(nq, seg, q)
        df = pd.DataFrame({"label": lab, "nq": nq})
        g = df.groupby("label", sort=False)["nq"].agg(["count", "sum", "min", "max"])
        return pa.table(
            {
                "label": pa.array(g.index.to_numpy(np.int64)),
                "n": pa.array(g["count"].to_numpy(np.int64)),
                "sum_nq": pa.array(g["sum"].to_numpy(np.int64)),
                "min_nq": pa.array(g["min"].to_numpy(np.int64)),
                "max_nq": pa.array(g["max"].to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_nq", alias_name="sum_nq"),
            Min("min_nq", alias_name="min_nq"),
            Max("max_nq", alias_name="max_nq"),
        )
    )


def _sql_embedding_norm_stats() -> str:
    return """
    WITH el AS (
      SELECT label, vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings
    ), nv AS (
      SELECT label, vec_id,
             SUM(CAST(floor((x * x) * 1000000000000.0) AS BIGINT)) AS nq
      FROM el GROUP BY label, vec_id
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(nq) AS BIGINT) AS sum_nq,
           CAST(MIN(nq) AS BIGINT) AS min_nq,
           CAST(MAX(nq) AS BIGINT) AS max_nq
    FROM nv GROUP BY label
    """


# ---------------------------------------------------------------------------
# tile_skew_profile — per-zoom occupancy-skew diagnostic
# ---------------------------------------------------------------------------


def q_tile_skew_profile(sf_dir: str):
    """Per-zoom skew diagnostic of the tile workload (the statistic that
    motivates this engine's salting and plan-bounded merges): for every
    zoom 2..10, the occupied-tile count, the max per-tile event count,
    and the exact lower-median per-tile count.

    Scale shape: reuses the one-pass pyramid exchange
    (tile_pyramid_counts' combiner); the per-zoom order statistics run
    on a (zoom, count) HISTOGRAM bounded by the distinct count values —
    the mad_prices domain-bounded shape, never the tile list itself on
    the driver beyond that histogram."""
    from ray.data.aggregate import Sum

    pyr = q_tile_pyramid_counts(sf_dir)

    def hist(b: pa.Table) -> pa.Table:
        tid = b["tile_id"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = (tid >> np.int64(58)).astype(np.int64)
        df = pd.DataFrame({"z": z, "n": n})
        g = df.groupby(["z", "n"], sort=False).size()
        ix = g.index
        return pa.table(
            {
                "z": pa.array(ix.get_level_values(0).to_numpy(np.int64)),
                "n": pa.array(ix.get_level_values(1).to_numpy(np.int64)),
                "c": pa.array(g.to_numpy(np.int64)),
            }
        )

    h = (
        pyr.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["z", "n"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values(["z", "n"], ignore_index=True)
    )
    out = []
    for z, g in h.groupby("z", sort=True):
        c = g["c"].to_numpy(np.int64)
        v = g["n"].to_numpy(np.int64)
        total = int(c.sum())
        rank = (total + 1) // 2
        med = int(v[np.searchsorted(np.cumsum(c), rank)])
        out.append((int(z), total, int(v.max()), med))
    return pa.table(
        {
            "z": pa.array(np.asarray([o[0] for o in out], np.int64)),
            "n_tiles": pa.array(np.asarray([o[1] for o in out], np.int64)),
            "max_n": pa.array(np.asarray([o[2] for o in out], np.int64)),
            "median_n": pa.array(np.asarray([o[3] for o in out], np.int64)),
        }
    )


def _sql_tile_skew_profile() -> str:
    return f"""
    WITH pts AS (SELECT {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events),
    alltiles AS (
      {chr(10).join("SELECT " + _tile_sql(z) + " AS tile_id FROM pts" + ("" if z == TILE_PYRAMID_ZOOMS[-1] else chr(10) + "      UNION ALL") for z in TILE_PYRAMID_ZOOMS)}
    ), per AS (
      SELECT tile_id, CAST(tile_id // {1 << 58} AS BIGINT) AS z, count(*) AS n
      FROM alltiles GROUP BY tile_id
    ), r AS (
      SELECT z, n,
             row_number() OVER (PARTITION BY z ORDER BY n) AS rn,
             count(*) OVER (PARTITION BY z) AS nt
      FROM per
    )
    SELECT z, CAST(MAX(nt) AS BIGINT) AS n_tiles, CAST(MAX(n) AS BIGINT) AS max_n,
           CAST(MAX(CASE WHEN rn = (nt + 1) // 2 THEN n END) AS BIGINT) AS median_n
    FROM r GROUP BY z
    """



# ---------------------------------------------------------------------------
# geo_serving_prep — the geo-side end-to-end serving composition
# ---------------------------------------------------------------------------


_GSP_Z = 4  # serving zoom: coarse enough that the density cap binds
_GSP_K = 5  # per-tile cap


def q_geo_serving_prep(sf_dir: str):
    """The geo-side counterpart of llm_data_prep: prepare a tile-serving
    manifest in ONE flow — spatial filter (keep only events inside a
    serving region), z4 tile assignment, then the deterministic per-tile
    density cap (keep the 5 smallest splitmix64(event_id) per tile).
    Output one row per (region, tile) with raw/kept counts and the
    kept-id checksum — what a rendering service materializes per tile.

    Scale shape: the region test, tile assignment, hash and bottom-K
    combiner all run in the SAME map over the pruned event read (rows
    outside every region die before any shuffle); ONE tile-hash
    part-exchange ships <= K+1 rows per (tile, batch); regions are
    lon-disjoint rectangles so each point has at most one region.
    The bottom-K machinery intentionally mirrors q_tile_downsample with
    a (region, tile) compound run key — keep the two in sync."""
    ds = _events_points(sf_dir)
    n_parts = 32
    boxes = _region_boxes()
    lon0 = boxes["lon0"].to_numpy()
    lon1 = boxes["lon1"].to_numpy()
    lat0 = boxes["lat0"].to_numpy()
    lat1 = boxes["lat1"].to_numpy()
    rkey = boxes["r_regionkey"].to_numpy(np.int64)

    _empty_gsp = pa.table(
        {
            "tile_id": pa.array([], pa.int64()),
            "region": pa.array([], pa.int64()),
            "h": pa.array([], pa.uint64()),
            "eid": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
            "kind": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
        }
    )

    def combine(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        inside = (
            (lon[:, None] > lon0)
            & (lon[:, None] < lon1)
            & (lat[:, None] > lat0)
            & (lat[:, None] < lat1)
        )
        hit = inside.any(axis=1)
        reg = rkey[np.argmax(inside, axis=1)][hit]
        eid, lon, lat = eid[hit], lon[hit], lat[hit]
        if len(eid) == 0:  # a batch wholly outside every region
            return _empty_gsp
        tx, ty = S.lonlat_to_tile(lon, lat, _GSP_Z)
        tid = S.pack_tile_id(_GSP_Z, tx, ty)
        h = synth._splitmix64(eid.astype(np.uint64))
        o = np.lexsort((h, reg, tid))
        tid, reg, h, eid = tid[o], reg[o], h[o], eid[o]
        key_new = np.r_[True, (tid[1:] != tid[:-1]) | (reg[1:] != reg[:-1])]
        starts = np.flatnonzero(key_new)
        seg = np.cumsum(key_new) - 1
        rank = np.arange(len(tid)) - starts[seg]
        cand = rank < _GSP_K
        lens = np.diff(np.r_[starts, len(tid)])
        return pa.table(
            {
                "tile_id": pa.array(np.r_[tid[cand], tid[starts]]),
                "region": pa.array(np.r_[reg[cand], reg[starts]].astype(np.int64)),
                "h": pa.array(
                    np.r_[h[cand], np.zeros(len(starts), np.uint64)].astype(np.uint64)
                ),
                "eid": pa.array(np.r_[eid[cand], np.zeros(len(starts), np.int64)]),
                "c": pa.array(
                    np.r_[np.zeros(int(cand.sum()), np.int64), lens.astype(np.int64)]
                ),
                "kind": pa.array(
                    np.r_[
                        np.zeros(int(cand.sum()), np.int64),
                        np.ones(len(starts), np.int64),
                    ]
                ),
                "part": pa.array(
                    (
                        synth._splitmix64(
                            np.r_[tid[cand], tid[starts]].astype(np.uint64)
                        )
                        % np.uint64(n_parts)
                    ).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "region": pa.array([], pa.int64()),
            "tile_id": pa.array([], pa.int64()),
            "n_raw": pa.array([], pa.int64()),
            "n_kept": pa.array([], pa.int64()),
            "kept_id_sum": pa.array([], pa.int64()),
        }
    )

    def resolve(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        tid = t["tile_id"].to_numpy(zero_copy_only=False)
        reg = t["region"].to_numpy(zero_copy_only=False)
        kind = t["kind"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        eid = t["eid"].to_numpy(zero_copy_only=False)
        # NOTE: tile_id uses the top bits (z*2^58) so (tid << k | reg)
        # packing would overflow int64 — run-length keys on the sorted
        # (tid, region) pair instead
        m1 = kind == 1
        t1, r1, c1 = tid[m1], reg[m1], c[m1]
        o1 = np.lexsort((r1, t1))
        t1, r1, c1 = t1[o1], r1[o1], c1[o1]
        new1 = np.r_[True, (t1[1:] != t1[:-1]) | (r1[1:] != r1[:-1])]
        seg1 = np.cumsum(new1) - 1
        starts1 = np.flatnonzero(new1)
        n_raw = np.zeros(len(starts1), np.int64)
        np.add.at(n_raw, seg1, c1)
        m0 = kind == 0
        t0, r0, h0, e0 = tid[m0], reg[m0], h[m0], eid[m0]
        o = np.lexsort((h0, r0, t0))
        t0, r0, h0, e0 = t0[o], r0[o], h0[o], e0[o]
        new0 = np.r_[True, (t0[1:] != t0[:-1]) | (r0[1:] != r0[:-1])]
        starts = np.flatnonzero(new0)
        seg = np.cumsum(new0) - 1
        rank = np.arange(len(t0)) - starts[seg]
        kept = rank < _GSP_K
        n_kept = np.zeros(len(starts), np.int64)
        np.add.at(n_kept, seg[kept], 1)
        ksum = np.zeros(len(starts), np.int64)
        np.add.at(ksum, seg[kept], e0[kept])
        # candidates must pair 1:1 with counts (both kinds emitted per
        # (region, tile)); raise with context instead of a bare assert so
        # a violated one-block-per-part invariant fails loudly under -O
        if len(starts) != len(starts1):
            raise ValueError(
                "geo_serving_prep resolve: candidate groups != counted groups "
                f"({len(starts)} vs {len(starts1)}) — part split across blocks?"
            )
        if not ((t0[starts] == t1[starts1]).all() and (r0[starts] == r1[starts1]).all()):
            bad = np.flatnonzero((t0[starts] != t1[starts1]) | (r0[starts] != r1[starts1]))[:5]
            raise ValueError(
                "geo_serving_prep resolve: candidate/count group keys diverge at "
                f"indices {bad.tolist()}: candidates "
                f"{list(zip(r0[starts[bad]].tolist(), t0[starts[bad]].tolist()))} vs counts "
                f"{list(zip(r1[starts1[bad]].tolist(), t1[starts1[bad]].tolist()))}"
            )
        return pa.table(
            {
                "region": pa.array(r0[starts].astype(np.int64)),
                "tile_id": pa.array(t0[starts].astype(np.int64)),
                "n_raw": pa.array(n_raw),
                "n_kept": pa.array(n_kept),
                "kept_id_sum": pa.array(ksum),
            }
        )

    return (
        ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(resolve, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_geo_serving_prep() -> str:
    return f"""
    WITH pts AS (
      SELECT event_id, {_LON_SQL} AS lon, {_LAT_SQL} AS lat FROM events
    ), boxes AS (
      SELECT r_regionkey,
             -160.0 + r_regionkey * 64.0 AS lon0,
             -160.0 + r_regionkey * 64.0 + 52.0 AS lon1,
             -70.0 + r_regionkey * 26.0 AS lat0,
             -70.0 + r_regionkey * 26.0 + 36.0 AS lat1
      FROM region
    ), inside AS (
      SELECT CAST(b.r_regionkey AS BIGINT) AS region, p.event_id, p.lon, p.lat
      FROM pts p JOIN boxes b
        ON p.lon > b.lon0 AND p.lon < b.lon1 AND p.lat > b.lat0 AND p.lat < b.lat1
    ), t AS (
      SELECT region, event_id, {_tile_sql(_GSP_Z)} AS tile_id,
             {_sql_splitmix64("event_id")} AS h
      FROM inside
    ), r AS (
      SELECT region, tile_id, event_id,
             row_number() OVER (PARTITION BY region, tile_id ORDER BY h) AS rn
      FROM t
    )
    SELECT region, tile_id,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(count(*) FILTER (WHERE rn <= {_GSP_K}) AS BIGINT) AS n_kept,
           CAST(SUM(event_id) FILTER (WHERE rn <= {_GSP_K}) AS BIGINT) AS kept_id_sum
    FROM r GROUP BY region, tile_id
    """



# ---------------------------------------------------------------------------
# order_line_join_native — the same join via Ray Data's native Dataset.join
# ---------------------------------------------------------------------------


def q_order_line_join_native(sf_dir: str):
    """The order_line_join semantics expressed through Ray Data's NATIVE
    hash join operator (``Dataset.join``, new in Ray 2.4x) instead of the
    engine's hand-built part-exchange — registered separately so both
    shapes stay oracle-verified and A/B-able (timings in BASELINE.md).
    The aggregate after the join is the usual per-batch cents combiner +
    one |priority|-bounded groupby."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    n_parts = int(max(8, min(64, lines.count() // 200_000 + 1)))

    joined = lines.join(
        orders,
        join_type="inner",
        num_partitions=n_parts,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def partial(b: pa.Table) -> pa.Table:
        price = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)
        g = pd.DataFrame(
            {"priority": b["o_orderpriority"].to_pylist(), "rev_cents": cents}
        ).groupby("priority", sort=False)["rev_cents"].sum()
        return pa.table(
            {
                "priority": pa.array(g.index.to_numpy(object), pa.string()),
                "rev_cents": pa.array(g.to_numpy(np.int64)),
            }
        )

    return (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("priority")
        .aggregate(Sum("rev_cents", alias_name="rev_cents"))
    )



# ---------------------------------------------------------------------------
# trailing_spend — RANGE-frame (time-interval) window aggregate
# ---------------------------------------------------------------------------

_TRAIL_DAYS = 30


def q_trailing_spend(sf_dir: str):
    """Time-RANGE window aggregate (the frame family moving_avg_spend's
    ROWS frame does not cover): for every order, the customer's total
    spend over the trailing 30 days INCLUSIVE of all same-day peers —
    exactly SQL's RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT
    ROW semantics, which are tie-order independent by construction.

    Scale shape: ONE customer-hash part-exchange; per part a lexsort +
    per-customer prefix-sum array answers every row with two
    searchsorteds (window = P[hi(day, right)] - P[lo(day-30, left)]) —
    no per-row loop, exact integer cents."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "cust": b["o_custkey"],
                "day": pa.array(
                    b["o_orderdate"]
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[D]")
                    .astype(np.int64)
                ),
                "cents": pa.array(
                    np.floor(
                        b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
                ),
                "part": pa.array(
                    (synth._splitmix64(ck.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "trailing_cents": pa.array([], pa.int64()),
        }
    )

    def window(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        cust = t["cust"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        o = np.lexsort((day, cust))
        cust, day, cents, ok = cust[o], day[o], cents[o], ok[o]
        P = np.r_[0, np.cumsum(cents)]
        # global (no per-customer loop): pack (cust, day) into one sorted
        # key — epoch days < 2^20, so customer blocks never interleave and
        # day-30 can't cross into the previous customer's key range.
        # Enforce the packing preconditions at runtime (cheap min/max) so a
        # future data source with pre-1970+30d or >2871 CE dates can't
        # silently corrupt windows:
        dmin, dmax = int(day.min()), int(day.max())
        if dmin < _TRAIL_DAYS or dmax >= (1 << 20):
            raise ValueError(
                "trailing_spend packed-key precondition violated: epoch days "
                f"must lie in [{_TRAIL_DAYS}, 2^20) but data spans [{dmin}, {dmax}] "
                "— (cust,day) packing would let day-30 underflow into the "
                "previous customer's block"
            )
        key = cust * np.int64(1 << 20) + day
        lo = np.searchsorted(key, key - np.int64(_TRAIL_DAYS), side="left")
        hi = np.searchsorted(key, key, side="right")
        trail = P[hi] - P[lo]
        return pa.table(
            {
                "o_orderkey": pa.array(ok.astype(np.int64)),
                "trailing_cents": pa.array(trail.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(window, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_trailing_spend() -> str:
    return f"""
    SELECT o_orderkey,
           CAST(SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) OVER (
                PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                RANGE BETWEEN INTERVAL {_TRAIL_DAYS} DAYS PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_cents
    FROM orders
    """



# ---------------------------------------------------------------------------
# segment_cume_dist — integer-exact cumulative distribution per group
# ---------------------------------------------------------------------------


def q_segment_cume_dist(sf_dir: str):
    """Cumulative-distribution window (CUME_DIST) per market segment,
    kept INTEGER-exact: for every customer, r_le = the number of
    same-segment customers with balance <= theirs (tie-inclusive — the
    numerator of cume_dist) and n = the segment size, so the float
    cume_dist never materializes and the comparison is bit-free.

    Scale shape: one segment-hash part-exchange (segments are few but a
    part holds whole segments, so each resolves with one sort + one
    searchsorted over its own balance array — no per-row window scan)."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])
    n_parts = 8

    def prep(b: pa.Table) -> pa.Table:
        seg = np.asarray(b["c_mktsegment"].to_pylist(), object)
        h = synth._splitmix64(pd.util.hash_array(seg).astype(np.uint64))
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "seg": pa.array(seg, pa.string()),
                "cents": pa.array(
                    np.floor(b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0).astype(
                        np.int64
                    )
                ),
                "part": pa.array((h % np.uint64(n_parts)).astype(np.int64)),
            }
        )

    _empty = pa.table(
        {
            "c_custkey": pa.array([], pa.int64()),
            "r_le": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def cume(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        seg = np.asarray(t["seg"].to_pylist(), object)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        o = np.lexsort((cents, seg))
        seg_s, ck_s, c_s = seg[o], ck[o], cents[o]
        new = np.r_[True, seg_s[1:] != seg_s[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(seg_s)]
        sg = np.cumsum(new) - 1
        n = (ends - starts)[sg]
        # r_le = tie-inclusive rank: index of the last equal value + 1,
        # relative to the segment start
        r_le = np.empty(len(ck_s), np.int64)
        for s0, s1 in zip(starts, ends):
            v = c_s[s0:s1]
            r_le[s0:s1] = np.searchsorted(v, v, side="right")
        return pa.table(
            {
                "c_custkey": pa.array(ck_s.astype(np.int64)),
                "r_le": pa.array(r_le),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(cume, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_segment_cume_dist() -> str:
    return """
    SELECT c_custkey,
           CAST(count(*) OVER (PARTITION BY c_mktsegment
                ORDER BY CAST(floor(c_acctbal * 100.0) AS BIGINT)
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS r_le,
           CAST(count(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
    FROM customer
    """



# ---------------------------------------------------------------------------
# topk_orders_with_ties — RANK-semantics (tie-inclusive) per-group top-k
# ---------------------------------------------------------------------------

_TOPK_TIES_K = 3


def q_topk_orders_with_ties(sf_dir: str):
    """Per-customer top-k WITH TIES (RANK, not ROW_NUMBER — the other
    top-k cardinality semantics: every order tied at the k-th price is
    kept, so group output size can exceed k).  Prices are integer cents,
    so ties are exact on both engines.

    Scale shape: one customer-hash part-exchange; per part a lexsort
    (cust, -cents) + vectorized tie-run rank (rank = tie-run start
    relative to the customer run + 1) — no per-customer loop."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    n_parts = int(max(8, min(4096, ds.count() // 100_000 + 1)))

    def prep(b: pa.Table) -> pa.Table:
        ck = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "cust": b["o_custkey"],
                "cents": pa.array(
                    np.floor(
                        b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
                    ).astype(np.int64)
                ),
                "part": pa.array(
                    (synth._splitmix64(ck.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "o_custkey": pa.array([], pa.int64()),
            "o_orderkey": pa.array([], pa.int64()),
            "cents": pa.array([], pa.int64()),
            "rnk": pa.array([], pa.int64()),
        }
    )

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        cust = t["cust"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        o = np.lexsort((-cents, cust))
        cust, cents, ok = cust[o], cents[o], ok[o]
        new_cust = np.r_[True, cust[1:] != cust[:-1]]
        starts = np.flatnonzero(new_cust)
        sg = np.cumsum(new_cust) - 1
        tie_new = new_cust | np.r_[True, cents[1:] != cents[:-1]]
        idx = np.arange(len(cust))
        tie_start = np.maximum.accumulate(np.where(tie_new, idx, 0))
        rnk = tie_start - starts[sg] + 1
        keep = rnk <= _TOPK_TIES_K
        return pa.table(
            {
                "o_custkey": pa.array(cust[keep].astype(np.int64)),
                "o_orderkey": pa.array(ok[keep].astype(np.int64)),
                "cents": pa.array(cents[keep]),
                "rnk": pa.array(rnk[keep].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(topk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_topk_orders_with_ties() -> str:
    return f"""
    WITH r AS (
      SELECT o_custkey, o_orderkey,
             CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents,
             RANK() OVER (PARTITION BY o_custkey
                          ORDER BY CAST(floor(o_totalprice * 100.0) AS BIGINT) DESC) AS rnk
      FROM orders
    )
    SELECT o_custkey, o_orderkey, cents, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= {_TOPK_TIES_K}
    """



# ---------------------------------------------------------------------------
# orders_daily_dense — calendar densification (gap-filled time series)
# ---------------------------------------------------------------------------


def q_orders_daily_dense(sf_dir: str):
    """Gap-filled DAILY revenue series (calendar densification — the
    time-series-completeness op dashboards need): one row for EVERY day
    between the corpus min and max order date, zero-filled where no
    orders landed (1,311 of 2,405 days are gaps at sf0.001, 6 at
    sf0.01 — the fill path is exercised at both driver-test scales).

    Scale shape: the corpus-sized work is one day-keyed combiner'd
    groupby (epoch days = pure integer math); the dense axis is
    generated on the driver from the min/max of the aggregate — bounded
    by the calendar span, not the data."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        d = (
            b["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        u, inv = np.unique(d, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        rc = np.zeros(len(u), np.int64)
        np.add.at(rc, inv, cents)
        return pa.table(
            {
                "day": pa.array(u),
                "n": pa.array(n),
                "rev_cents": pa.array(rc),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Sum("n", alias_name="n"), Sum("rev_cents", alias_name="rev_cents"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )
    days = agg["day"].to_numpy(np.int64)
    dense = np.arange(days.min(), days.max() + 1)
    ix = np.minimum(np.searchsorted(days, dense), len(days) - 1)
    found = days[ix] == dense
    n = np.where(found, agg["n"].to_numpy(np.int64)[ix], 0)
    rc = np.where(found, agg["rev_cents"].to_numpy(np.int64)[ix], 0)
    return pa.table(
        {
            "epoch_day": pa.array(dense.astype(np.int64)),
            "n": pa.array(n.astype(np.int64)),
            "rev_cents": pa.array(rc.astype(np.int64)),
        }
    )


def _sql_orders_daily_dense() -> str:
    return """
    WITH d AS (
      SELECT CAST(epoch_ms(CAST(o_orderdate AS DATE)) // 86400000 AS BIGINT) AS day,
             CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders
    ), agg AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n, SUM(cents) AS rev_cents
      FROM d GROUP BY day
    ), bounds AS (
      SELECT MIN(day) AS lo, MAX(day) AS hi FROM agg
    ), dense AS (
      SELECT unnest(generate_series(lo, hi)) AS day FROM bounds
    )
    SELECT CAST(dense.day AS BIGINT) AS epoch_day,
           CAST(COALESCE(agg.n, 0) AS BIGINT) AS n,
           CAST(COALESCE(agg.rev_cents, 0) AS BIGINT) AS rev_cents
    FROM dense LEFT JOIN agg USING (day)
    """

# ---------------------------------------------------------------------------
# round-4 additions: TPC-H-shaped join aggregates (Q14/Q13/Q4) + graph BFS
# ---------------------------------------------------------------------------


def q_promo_revenue(sf_dir: str):
    """Promotion revenue share per ship-month — the TPC-H Q14 shape
    (lineitem x part dimension join + conditional aggregate), extended
    to every month: per year*100+month of l_shipdate, promo-part revenue
    cents, total revenue cents, and the promo share in basis points.

    Exactness: cents = floor(extprice * (1 - disc) * 100) per line (the
    house money rule); the final share divides the two month totals with
    PYTHON bigints // (HUGEINT // in the oracle), so no float and no
    int64 overflow at any corpus scale.

    Scale shape: the part dimension reduces to ONE bool per partkey
    broadcast via ray.put (fetch-once per worker); each lineitem batch
    combines to <= |months| partial rows before the tiny month groupby.
    At TPC-H ratios part is lineitem/30 — when the flag map outgrows
    worker heaps the documented swap is the hash co-partition join
    (q_order_line_join's engine) keyed on partkey."""
    import ray

    from ray.data.aggregate import Sum

    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).to_pandas()
    promo_ref = ray.put(
        pd.Series(
            part["p_type"].to_numpy(object) == "PROMO",
            index=part["p_partkey"].to_numpy(np.int64),
        )
    )

    lines = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )

    def prep(b: pa.Table) -> pa.Table:
        import ray as _ray

        promo = _ray.get(promo_ref)  # plasma-local after first fetch per worker
        d = b["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[M]")
        y = d.astype("datetime64[Y]").astype(np.int64) + 1970
        ym = y * 100 + (d.astype(np.int64) % 12 + 1)
        cents = np.floor(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0
        ).astype(np.int64)
        isp = promo.reindex(b["l_partkey"].to_numpy(zero_copy_only=False)).to_numpy(bool)
        u, inv = np.unique(ym, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, cents)
        pr = np.zeros(len(u), np.int64)
        np.add.at(pr, inv[isp], cents[isp])
        return pa.table(
            {"ym": pa.array(u), "promo_cents": pa.array(pr), "total_cents": pa.array(tot)}
        )

    agg = (
        lines.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ym")
        .aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
        .to_pandas()
        .sort_values("ym")
    )
    share = np.fromiter(
        (int(p) * 10000 // int(t) for p, t in zip(agg["promo_cents"], agg["total_cents"])),
        np.int64,
        len(agg),
    )
    return pa.table(
        {
            "ym": pa.array(agg["ym"].to_numpy(np.int64)),
            "promo_cents": pa.array(agg["promo_cents"].to_numpy(np.int64)),
            "total_cents": pa.array(agg["total_cents"].to_numpy(np.int64)),
            "share_bp": pa.array(share),
        }
    )


def _sql_promo_revenue() -> str:
    return """
    WITH l AS (
      SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
             CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS cents,
             p_type
      FROM lineitem JOIN part ON p_partkey = l_partkey
    )
    SELECT ym,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)::HUGEINT * 10000
                // SUM(cents)::HUGEINT AS BIGINT) AS share_bp
    FROM l GROUP BY ym
    """


def q_cust_order_histogram(sf_dir: str):
    """Orders-per-customer distribution INCLUDING zero-order customers —
    the TPC-H Q13 shape (outer join + double aggregate): one row per
    distinct order count with the number of customers holding exactly
    that many orders.

    Scale shape: orders pre-combine to <= |customers-in-batch| partial
    (custkey, n) rows per batch; ONE hash co-partition with the customer
    key list then resolves totals per customer inside each part (every
    custkey lives in exactly one part, so per-part histograms are
    disjoint and their Sum is exact); orphan order custkeys — rows no
    customer owns — drop per LEFT-JOIN-from-customer semantics.  Only
    (key, count) pairs ever shuffle."""
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    n_parts = int(max(8, min(4096, orders.count() // 200_000 + 1)))

    def tag_cust(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": b["c_custkey"],
                "cnt": pa.array(np.zeros(len(k), np.int64)),
                "is_build": pa.array(np.ones(len(k), bool)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy(zero_copy_only=False)
        u, c = np.unique(k, return_counts=True)  # per-batch combiner
        return pa.table(
            {
                "key": pa.array(u.astype(np.int64)),
                "cnt": pa.array(c.astype(np.int64)),
                "is_build": pa.array(np.zeros(len(u), bool)),
                "part": pa.array(
                    (synth._splitmix64(u.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {"n_orders": pa.array([], pa.int64()), "n_customers": pa.array([], pa.int64())}
    )

    def hist_part(t: pa.Table) -> pa.Table:
        isb = t["is_build"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        bkey = key[isb]
        if len(bkey) == 0:
            return _empty
        order = np.argsort(bkey)
        bks = bkey[order]
        totals = np.zeros(len(bks), np.int64)
        pkey, pcnt = key[~isb], cnt[~isb]
        if len(pkey):
            pos = np.minimum(np.searchsorted(bks, pkey), len(bks) - 1)
            found = bks[pos] == pkey  # orphan order custkeys drop here
            np.add.at(totals, pos[found], pcnt[found])
        u, c = np.unique(totals, return_counts=True)
        return pa.table(
            {"n_orders": pa.array(u.astype(np.int64)), "n_customers": pa.array(c.astype(np.int64))}
        )

    return (
        cust.map_batches(tag_cust, batch_format="pyarrow", zero_copy_batch=True)
        .union(orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True))
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(hist_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("n_orders")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
    )


def _sql_cust_order_histogram() -> str:
    return """
    SELECT CAST(cnt AS BIGINT) AS n_orders, CAST(count(*) AS BIGINT) AS n_customers
    FROM (
      SELECT c_custkey, count(o_orderkey) AS cnt
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    ) GROUP BY cnt
    """


_LATE_DAYS = 60


def q_orders_late_priority(sf_dir: str):
    """Semi-join EXISTS aggregate — the TPC-H Q4 shape: per order
    priority, how many orders have AT LEAST ONE line shipped more than
    60 days after the order date (late-fulfilment monitoring).

    Scale shape: lineitem batches pre-combine to one (orderkey,
    max shipday) row per key per batch — EXISTS(ship > cut) is
    max-reducible, so the semi-join probe side shrinks before the ONE
    orderkey hash co-partition; each part re-reduces the max per key,
    marks build orders with maxday > orderday + 60, and emits
    <= |priorities| partial counts.  Dates compare as integer epoch
    days on both engines (midnight timestamps)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_orderdate"])
    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    n_parts = int(max(8, min(4096, lines.count() // 200_000 + 1)))

    def tag_orders(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        day = (
            b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        )
        return pa.table(
            {
                "key": b["o_orderkey"],
                "day": pa.array(day),
                "priority": b["o_orderpriority"],
                "is_build": pa.array(np.ones(len(k), bool)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    def tag_lines(b: pa.Table) -> pa.Table:
        k = b["l_orderkey"].to_numpy(zero_copy_only=False)
        day = (
            b["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        )
        u, inv = np.unique(k, return_inverse=True)  # per-batch max combiner
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, day)
        return pa.table(
            {
                "key": pa.array(u.astype(np.int64)),
                "day": pa.array(mx),
                "priority": pa.array(np.full(len(u), "", object), pa.string()),
                "is_build": pa.array(np.zeros(len(u), bool)),
                "part": pa.array(
                    (synth._splitmix64(u.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {"o_orderpriority": pa.array([], pa.string()), "n_late": pa.array([], pa.int64())}
    )

    def late_part(t: pa.Table) -> pa.Table:
        hit = _join_part_key(t)
        if hit is None:
            return _empty
        b_hit, p_hit = hit
        oday = t["day"].to_numpy(zero_copy_only=False)[b_hit]
        sday = t["day"].to_numpy(zero_copy_only=False)[p_hit]
        prio = t["priority"].to_numpy(zero_copy_only=False)[b_hit]
        # several per-batch max partials may hit the same order: reduce by
        # build row, then test once per order (EXISTS == max > cut)
        ub, first, inv = np.unique(b_hit, return_index=True, return_inverse=True)
        mx = np.full(len(ub), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, sday)
        # `first` indexes in ub (= inv value) order, keeping mx aligned
        late = mx > oday[first] + _LATE_DAYS
        u, c = np.unique(prio[first][late], return_counts=True)
        return pa.table(
            {"o_orderpriority": pa.array(u, pa.string()), "n_late": pa.array(c.astype(np.int64))}
        )

    return (
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
        .union(lines.map_batches(tag_lines, batch_format="pyarrow", zero_copy_batch=True))
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(late_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(Sum("n_late", alias_name="n_late"))
    )


def _sql_orders_late_priority() -> str:
    return f"""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
    )
    GROUP BY o_orderpriority
    """


def q_nation_bfs_hops(sf_dir: str):
    """Single-source BFS hop distances over the above-mean nation trade
    graph — the traversal primitive alongside q_nation_pagerank
    (iteration) and q_trade_triangles (enumeration): undirected
    above-mean edges (the exact integer w * n_edges > total_w cut of
    q_trade_triangles), source = the smallest endpoint in the filtered
    edge set, output (nationkey, hops) for every reachable nation.

    Scale shape: the corpus-sized work is the shared distributed
    lineitem x orders co-partition join (_nation_trade_edges,
    <= nations^2 rows out); BFS runs on that domain-bounded edge list on
    the driver.  At web-scale node sets the swap is the per-round
    frontier shuffle already demonstrated by rows_only._hashmin_labels
    (hop labels are min-monotone exactly like component labels)."""
    e = _nation_trade_edges(sf_dir)
    src = e["src"].to_numpy(np.int64)
    dst = e["dst"].to_numpy(np.int64)
    und = (
        pd.DataFrame(
            {
                "a": np.minimum(src, dst),
                "b": np.maximum(src, dst),
                "w": e["w"].to_numpy(np.int64),
            }
        )
        .query("a != b")
        .groupby(["a", "b"], as_index=False)["w"]
        .sum()
    )
    n_e = len(und)
    tot = int(und["w"].sum())
    ek = und[und["w"].to_numpy(np.int64) * n_e > tot]
    _empty = pa.table(
        {"nationkey": pa.array([], pa.int64()), "hops": pa.array([], pa.int64())}
    )
    if len(ek) == 0:
        return _empty
    nbrs: dict[int, set] = {}
    for r in ek.itertuples():
        nbrs.setdefault(int(r.a), set()).add(int(r.b))
        nbrs.setdefault(int(r.b), set()).add(int(r.a))
    source = min(nbrs)
    hops = {source: 0}
    frontier = [source]
    d = 0
    while frontier:
        d += 1
        frontier = [
            v for u in frontier for v in nbrs[u] if v not in hops and hops.setdefault(v, d) == d
        ]
    out = sorted(hops.items())
    return pa.table(
        {
            "nationkey": pa.array(np.asarray([k for k, _ in out], np.int64)),
            "hops": pa.array(np.asarray([h for _, h in out], np.int64)),
        }
    )


def _sql_nation_bfs_hops() -> str:
    return """
    WITH RECURSIVE e0 AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), und AS (
      SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(w) AS w
      FROM e0 WHERE src <> dst GROUP BY 1, 2
    ), m AS (
      SELECT count(*) AS ne, SUM(w) AS tot FROM und
    ), ek AS (
      SELECT a, b FROM und, m WHERE w * ne > tot
    ), edges AS (
      SELECT a AS u, b AS v FROM ek UNION SELECT b, a FROM ek
    ), walk(v, d) AS (
      SELECT u, 0 FROM edges WHERE u = (SELECT min(u) FROM edges)
      UNION
      SELECT e.v, w.d + 1 FROM walk w JOIN edges e ON e.u = w.v
      WHERE w.d < (SELECT count(DISTINCT u) FROM edges)
    )
    SELECT CAST(v AS BIGINT) AS nationkey, CAST(min(d) AS BIGINT) AS hops
    FROM walk GROUP BY v
    """


_SLIDE_W = 7  # trailing window, days


def q_sliding_distinct_users(sf_dir: str):
    """Sliding-window COUNT DISTINCT: per (event_type, day), how many
    distinct users had >= 1 event of that type in the trailing 7-day
    window — the DAU/WAU-style engagement metric.  Distinct-over-window
    is NOT sum-decomposable (a user active on 3 window days counts
    once), so the windowed pre-aggregation other ops use doesn't apply.

    The scalable shape used here: a user's contribution to type t is the
    UNION of intervals [day, day+6] over their active days — so per
    (type, user) merge overlapping intervals (one vectorized lexsort +
    gap scan per part), emit +1/-1 boundary DELTAS, and prefix-sum the
    deltas per type.  Nothing user-level ever re-shuffles: stage 1
    dedupes (type, user, day) per batch, ONE user-hash part-exchange
    co-locates each user's days, and each part emits delta partials
    already combined to <= |type x day| rows.  The final prefix scan
    runs on the calendar-bounded delta table."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "user_id", "ts"])
    n_parts = int(max(8, min(4096, ds.count() // 200_000 + 1)))

    def dedup_batch(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False).astype("U16")
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        day = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        order = np.lexsort((day, uid, et))
        et, uid, day = et[order], uid[order], day[order]
        keep = np.r_[
            True, (et[1:] != et[:-1]) | (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])
        ] if len(et) else np.zeros(0, bool)
        et, uid, day = et[keep], uid[keep], day[keep]
        return pa.table(
            {
                "event_type": pa.array(et, pa.string()),
                "user_id": pa.array(uid.astype(np.int64)),
                "day": pa.array(day),
                "part": pa.array(
                    (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "day": pa.array([], pa.int64()),
            "delta": pa.array([], pa.int64()),
        }
    )

    def deltas_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        et = t["event_type"].to_numpy(zero_copy_only=False).astype("U16")
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, uid, et))
        et, uid, day = et[order], uid[order], day[order]
        new_key = np.r_[True, (et[1:] != et[:-1]) | (uid[1:] != uid[:-1])]
        # cross-batch duplicate (type, user, day) rows melt into the runs
        # (equal days have gap 0); a new interval starts at a key change
        # or a > window-1 day gap
        gap_break = np.r_[True, (day[1:] - day[:-1]) > (_SLIDE_W - 1)]
        new_iv = new_key | gap_break
        starts = day[new_iv]
        # interval end = last day of the run + W-1
        ends = day[np.r_[new_iv[1:], True]] + (_SLIDE_W - 1)
        iv_type = et[new_iv]
        # +1 at start, -1 at end+1; combine per (type, day) before emitting
        dtype_ = np.concatenate([iv_type, iv_type])
        dday = np.concatenate([starts, ends + 1])
        dval = np.concatenate(
            [np.ones(len(starts), np.int64), -np.ones(len(starts), np.int64)]
        )
        o2 = np.lexsort((dday, dtype_))
        dtype_, dday, dval = dtype_[o2], dday[o2], dval[o2]
        nw = np.r_[True, (dtype_[1:] != dtype_[:-1]) | (dday[1:] != dday[:-1])]
        seg = np.cumsum(nw) - 1
        sums = np.zeros(int(seg[-1]) + 1, np.int64)
        np.add.at(sums, seg, dval)
        return pa.table(
            {
                "event_type": pa.array(dtype_[nw], pa.string()),
                "day": pa.array(dday[nw]),
                "delta": pa.array(sums),
            }
        )

    deltas = (
        ds.map_batches(dedup_batch, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(deltas_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["event_type", "day"])
        .aggregate(Sum("delta", alias_name="delta"))
        .to_pandas()  # calendar-bounded: |types| x |days| rows
    )
    out_t: list = []
    out_d: list = []
    out_n: list = []
    for et, g in deltas.groupby("event_type", sort=True):
        g = g.sort_values("day")
        dday = g["day"].to_numpy(np.int64)
        run = np.cumsum(g["delta"].to_numpy(np.int64))[:-1]  # count within [day_k, day_k+1)
        width = np.diff(dday)
        live = run > 0
        days = np.concatenate(
            [np.arange(s, s + w) for s, w, ok in zip(dday[:-1], width, live) if ok]
        ) if live.any() else np.array([], np.int64)
        cnts = np.repeat(run[live], width[live])
        out_t.append(np.full(len(days), et, object))
        out_d.append(days)
        out_n.append(cnts)
    return pa.table(
        {
            "event_type": pa.array(np.concatenate(out_t) if out_t else [], pa.string()),
            "day": pa.array(
                np.concatenate(out_d) if out_d else np.array([], np.int64)
            ),
            "n_users": pa.array(
                np.concatenate(out_n) if out_n else np.array([], np.int64)
            ),
        }
    )


def _sql_sliding_distinct_users() -> str:
    return f"""
    WITH e AS (
      SELECT DISTINCT event_type, user_id,
             CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day
      FROM events
    ), cand AS (
      SELECT DISTINCT event_type, day + k.k AS d
      FROM e CROSS JOIN (SELECT unnest(range({_SLIDE_W})) AS k) k
    )
    SELECT c.event_type, c.d AS day,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM cand c
    JOIN e ON e.event_type = c.event_type
          AND e.day BETWEEN c.d - {_SLIDE_W - 1} AND c.d
    GROUP BY 1, 2
    """


_PROFILE_COLS: dict[str, str] = {
    "l_orderkey": "int",
    "l_partkey": "int",
    "l_suppkey": "int",
    "l_linenumber": "int",
    "l_returnflag": "str",
    "l_linestatus": "str",
    "l_shipdate": "date",
}


def q_table_profile(sf_dir: str):
    """Distributed data profiling (the schema-quality scan every ingest
    pipeline runs before training): per lineitem column — row count,
    EXACT distinct count, min and max — over the int / string / date
    columns in ONE pass.

    Scale shape: every value maps to an ORDER-PRESERVING int64 (ints
    as-is, dates as epoch days, <=8-char ASCII as shifted big-endian
    packs), so the distinct-value exchange ships (col_id, int64, cnt)
    triplets — ~4x smaller than the padded-string encoding this replaced
    and int-comparable (the string version spent 11.5 s at sf0.1 in the
    (col, repr) string groupby; this shape runs ~2 s).  Each batch
    combines to its per-column distinct values; ONE value-hash
    part-exchange merges duplicates and shrinks each part to <= |cols|
    partial rows; the tiny final (col) groupby then merges part
    partials, and reprs materialize only for the 7-row output.  Exact
    distinct is inherently |distinct|-bounded — the sketch swap at
    100 TB is q_hll_distinct_users' register algebra."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _read(sf_dir, "lineitem", list(_PROFILE_COLS))
    names = list(_PROFILE_COLS)
    # footer-metadata sizing (r5): ds.count() on a raw read resolves from
    # metadata in Ray 2.49 (no execution), but that is an internals
    # dependency — _table_rows_meta is explicit.  The 3.57x sweep ratio
    # (VERDICT r4 #7) root-causes to the distinct-value exchange itself:
    # see the profile note in BASELINE.md r5
    n_parts = int(max(8, min(4096, _table_rows_meta(sf_dir, "lineitem") // 200_000 + 1)))

    def encode(b: pa.Table) -> pa.Table:
        cids: list[np.ndarray] = []
        vals: list[np.ndarray] = []
        cnts: list[np.ndarray] = []
        for cid, (name, kind) in enumerate(_PROFILE_COLS.items()):
            a = b[name].to_numpy(zero_copy_only=False)
            if kind == "int":
                v = a[~pd.isna(a)].astype(np.int64)
            elif kind == "date":
                v = a[~pd.isna(a)].astype("datetime64[D]").astype(np.int64)
            else:
                # <=8-char ASCII -> big-endian pack, shifted to signed:
                # lexical order == int64 order
                s = a[pd.notna(a)].astype("S8")
                v = (
                    np.frombuffer(s.tobytes(), dtype=">u8")
                    - np.uint64(1 << 63)
                ).astype(np.int64)
            u, c = np.unique(v, return_counts=True)
            cids.append(np.full(len(u), cid, np.int64))
            vals.append(u)
            cnts.append(c.astype(np.int64))
        cid_a = np.concatenate(cids)
        val_a = np.concatenate(vals)
        return pa.table(
            {
                "cid": pa.array(cid_a),
                "v": pa.array(val_a),
                "cnt": pa.array(np.concatenate(cnts)),
                "part": pa.array(
                    (
                        synth._splitmix64(
                            (val_a.view(np.uint64) * np.uint64(8)) + cid_a.view(np.uint64)
                        )
                        % np.uint64(n_parts)
                    ).astype(np.int64)
                ),
            }
        )

    _empty = pa.table(
        {
            "cid": pa.array([], pa.int64()),
            "n_nonnull": pa.array([], pa.int64()),
            "n_distinct": pa.array([], pa.int64()),
            "min_v": pa.array([], pa.int64()),
            "max_v": pa.array([], pa.int64()),
        }
    )

    def part_profile(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        cid = t["cid"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, cid))
        cid, v, cnt = cid[order], v[order], cnt[order]
        # merge cross-batch duplicates, then reduce per column in one pass
        dup = np.r_[True, (cid[1:] != cid[:-1]) | (v[1:] != v[:-1])]
        vseg = np.cumsum(dup) - 1
        vcnt = np.zeros(int(vseg[-1]) + 1, np.int64)
        np.add.at(vcnt, vseg, cnt)
        cid_u, v_u = cid[dup], v[dup]
        new = np.r_[True, cid_u[1:] != cid_u[:-1]]
        seg = np.cumsum(new) - 1
        n = int(seg[-1]) + 1
        nn = np.zeros(n, np.int64)
        np.add.at(nn, seg, vcnt)
        nd = np.zeros(n, np.int64)
        np.add.at(nd, seg, 1)
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(cid_u)] - 1
        return pa.table(
            {
                "cid": pa.array(cid_u[new]),
                "n_nonnull": pa.array(nn),
                "n_distinct": pa.array(nd),
                "min_v": pa.array(v_u[starts]),
                "max_v": pa.array(v_u[ends]),
            }
        )

    agg = (
        ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(part_profile, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("cid")
        .aggregate(
            Sum("n_nonnull", alias_name="n_nonnull"),
            Sum("n_distinct", alias_name="n_distinct"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        )
        .to_pandas()  # <= |cols| rows
        .sort_values("cid")
    )

    def to_repr(cid: int, v: int) -> str:
        name = names[cid]
        kind = _PROFILE_COLS[name]
        if kind == "int":
            return str(v).zfill(20)
        if kind == "date":
            return str(np.int64(v).astype("datetime64[D]"))
        raw = int(v) + (1 << 63)  # undo the signed shift -> original u64 pack
        return raw.to_bytes(8, "big").rstrip(b"\x00").decode("ascii")

    return pa.table(
        {
            "col": pa.array([names[c] for c in agg["cid"]], pa.string()),
            "n_nonnull": pa.array(agg["n_nonnull"].to_numpy(np.int64)),
            "n_distinct": pa.array(agg["n_distinct"].to_numpy(np.int64)),
            "min_repr": pa.array(
                [to_repr(c, v) for c, v in zip(agg["cid"], agg["min_v"])], pa.string()
            ),
            "max_repr": pa.array(
                [to_repr(c, v) for c, v in zip(agg["cid"], agg["max_v"])], pa.string()
            ),
        }
    )


def _sql_table_profile() -> str:
    parts = []
    for name, kind in _PROFILE_COLS.items():
        if kind == "int":
            mn = f"lpad(CAST(min({name}) AS VARCHAR), 20, '0')"
            mx = f"lpad(CAST(max({name}) AS VARCHAR), 20, '0')"
        elif kind == "date":
            mn = f"strftime(min({name}), '%Y-%m-%d')"
            mx = f"strftime(max({name}), '%Y-%m-%d')"
        else:
            mn, mx = f"min({name})", f"max({name})"
        parts.append(
            f"SELECT '{name}' AS col, CAST(count({name}) AS BIGINT) AS n_nonnull,"
            f" CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct,"
            f" {mn} AS min_repr, {mx} AS max_repr FROM lineitem"
        )
    return " UNION ALL ".join(parts)


_MKT_REGION = 2  # deterministic pick; target nation = min nationkey in it


def q_market_share(sf_dir: str):
    """National market share — the TPC-H Q8 shape (two dimension chains
    joined through the fact table): within orders placed by customers of
    region 2, the share (basis points) of lineitem revenue supplied by
    the region's smallest-keyed nation, per order year.

    Scale shape: BOTH dimension chains collapse to one broadcast map
    each (custkey -> in-region bool, suppkey -> is-target bool) fetched
    once per worker via ray.put; out-of-region orders die BEFORE the
    orderkey co-partition shuffle (build side only ships qualifying
    keys); per-part combiners emit <= |years| rows.  Share math is
    Python-bigint // (HUGEINT in the oracle) — overflow-free."""
    import ray

    from ray.data.aggregate import Sum

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    in_region = set(
        nation.loc[nation["n_regionkey"] == _MKT_REGION, "n_nationkey"].astype(int)
    )
    target_nation = min(in_region)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    cflag_ref = ray.put(
        pd.Series(
            cust["c_nationkey"].isin(in_region).to_numpy(),
            index=cust["c_custkey"].to_numpy(np.int64),
        )
    )
    sflag_ref = ray.put(
        pd.Series(
            (supp["s_nationkey"].to_numpy(np.int64) == target_nation),
            index=supp["s_suppkey"].to_numpy(np.int64),
        )
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    lines = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    n_parts = int(max(8, min(4096, lines.count() // 200_000 + 1)))

    def tag_orders(b: pa.Table) -> pa.Table:
        import ray as _ray

        cflag = _ray.get(cflag_ref)
        k = b["o_orderkey"].to_numpy(zero_copy_only=False)
        keep = cflag.reindex(b["o_custkey"].to_numpy(zero_copy_only=False)).to_numpy(bool)
        k = k[keep]
        y = (
            b["o_orderdate"].to_numpy(zero_copy_only=False)[keep]
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "key": pa.array(k.astype(np.int64)),
                "val": pa.array(y),
                "cents": pa.array(np.zeros(len(k), np.int64)),
                "is_build": pa.array(np.ones(len(k), bool)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    def tag_lines(b: pa.Table) -> pa.Table:
        import ray as _ray

        sflag = _ray.get(sflag_ref)
        k = b["l_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0
        ).astype(np.int64)
        isn = sflag.reindex(b["l_suppkey"].to_numpy(zero_copy_only=False)).to_numpy(bool)
        return pa.table(
            {
                "key": pa.array(k.astype(np.int64)),
                "val": pa.array(isn.astype(np.int64)),
                "cents": pa.array(cents),
                "is_build": pa.array(np.zeros(len(k), bool)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {
            "year": pa.array([], pa.int64()),
            "nation_cents": pa.array([], pa.int64()),
            "total_cents": pa.array([], pa.int64()),
        }
    )

    def share_part(t: pa.Table) -> pa.Table:
        hit = _join_part_key(t)
        if hit is None:
            return _empty
        b_hit, p_hit = hit
        val = t["val"].to_numpy(zero_copy_only=False)
        year = val[b_hit]
        isn = val[p_hit] == 1
        cents = t["cents"].to_numpy(zero_copy_only=False)[p_hit]
        u, inv = np.unique(year, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, cents)
        nat = np.zeros(len(u), np.int64)
        np.add.at(nat, inv[isn], cents[isn])
        return pa.table(
            {
                "year": pa.array(u.astype(np.int64)),
                "nation_cents": pa.array(nat),
                "total_cents": pa.array(tot),
            }
        )

    agg = (
        orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True)
        .union(lines.map_batches(tag_lines, batch_format="pyarrow", zero_copy_batch=True))
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(share_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("year")
        .aggregate(
            Sum("nation_cents", alias_name="nation_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
        .to_pandas()
        .sort_values("year")
    )
    share = np.fromiter(
        (
            int(p) * 10000 // int(t)
            for p, t in zip(agg["nation_cents"], agg["total_cents"])
        ),
        np.int64,
        len(agg),
    )
    return pa.table(
        {
            "year": pa.array(agg["year"].to_numpy(np.int64)),
            "nation_cents": pa.array(agg["nation_cents"].to_numpy(np.int64)),
            "total_cents": pa.array(agg["total_cents"].to_numpy(np.int64)),
            "share_bp": pa.array(share),
        }
    )


def _sql_market_share() -> str:
    return f"""
    WITH nr AS (
      SELECT n_nationkey FROM nation WHERE n_regionkey = {_MKT_REGION}
    ), tn AS (
      SELECT min(n_nationkey) AS nk FROM nr
    ), o AS (
      SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y
      FROM orders JOIN customer ON c_custkey = o_custkey
      WHERE c_nationkey IN (SELECT n_nationkey FROM nr)
    ), l AS (
      SELECT l_orderkey,
             CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT) AS cents,
             (s_nationkey = (SELECT nk FROM tn)) AS isn
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
    )
    SELECT y AS year,
           CAST(SUM(CASE WHEN isn THEN cents ELSE 0 END) AS BIGINT) AS nation_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(CASE WHEN isn THEN cents ELSE 0 END)::HUGEINT * 10000
                // SUM(cents)::HUGEINT AS BIGINT) AS share_bp
    FROM o JOIN l ON l_orderkey = o_orderkey
    GROUP BY y
    """


def q_phash_bit_stats(sf_dir: str):
    """Per-bit occupancy of the 64-bit image perceptual hash — the LSH
    health check a dedup pipeline runs before trusting banded phash
    buckets (a biased bit position weakens band selectivity; ~n/2 per
    bit is healthy).  Output: (bit 0..63, n_set).

    Scale shape: a map-only pass over the (phash)-pruned corpus read —
    each batch unpacks its hashes to a 64-column bit matrix and emits
    ONE 64-row partial (bit, count) table; the final groupby merges
    64-row partials, so nothing scales with corpus size but the read."""
    from ray.data.aggregate import Sum

    from . import tiling

    ds = tiling.read_images(sf_dir, columns=["phash"])
    bits = np.arange(64, dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        f = b["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        # bit matrix via byte unpack: rows x 64, little-endian bit order
        m = np.unpackbits(f.view(np.uint8).reshape(len(f), 8), axis=1, bitorder="little")
        return pa.table(
            {
                "bit": pa.array(bits),
                "n_set": pa.array(m.sum(axis=0, dtype=np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bit")
        .aggregate(Sum("n_set", alias_name="n_set"))
    )


def _sql_phash_bit_stats(sf: float = 0.01) -> str:
    from ..sources import synth

    return f"""
    WITH img AS (
      SELECT CAST(phash AS HUGEINT)
             + CASE WHEN phash < 0 THEN {_U64} ELSE CAST(0 AS HUGEINT) END AS f
      FROM read_parquet('{synth.images_dir(sf)}/*.parquet')
    )
    SELECT CAST(b.bit AS BIGINT) AS bit,
           CAST(SUM(CAST((f // (CAST(1 AS HUGEINT) << b.bit)) % 2 AS BIGINT)) AS BIGINT) AS n_set
    FROM img CROSS JOIN (SELECT unnest(range(64)) AS bit) b
    GROUP BY 1
    """


def q_event_type_markov(sf_dir: str):
    """First-order Markov transition counts over per-user event
    sequences (session-modeling / next-event-prediction analytics): for
    each user's events ordered by (ts, event_id — the id breaks exact-ts
    ties deterministically), count every consecutive
    (prev_type -> event_type) transition, globally.

    Scale shape: ONE user-hash part-exchange co-locates each user's
    events (only (user, ts, event_id, type) ride it); each part sorts
    once (lexsort), reads transitions as a shifted compare, and combines
    to <= |types|^2 partial rows before the tiny final groupby."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    n_parts = int(max(8, min(4096, ds.count() // 200_000 + 1)))

    def tag(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": b["user_id"],
                "t": pa.array(
                    b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
                ),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "part": pa.array(
                    (synth._splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {
            "prev_type": pa.array([], pa.string()),
            "event_type": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def trans_part(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return _empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["t"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False).astype("U16")
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        same = uid[1:] == uid[:-1]
        # per-part combiner: factorize types, pack (prev, cur) code pairs,
        # <= |types|^2 rows out
        types, codes = np.unique(et, return_inverse=True)
        prev, cur = codes[:-1][same], codes[1:][same]
        if len(prev) == 0:
            return _empty
        k = len(types)
        u, c = np.unique(prev * k + cur, return_counts=True)
        return pa.table(
            {
                "prev_type": pa.array(types[(u // k)], pa.string()),
                "event_type": pa.array(types[(u % k)], pa.string()),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(trans_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby(["prev_type", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def _sql_event_type_markov() -> str:
    return """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """


def q_part_best_supplier(sf_dir: str):
    """Distributed ARGMAX-per-key: for every part, the supplier with the
    highest lineitem revenue (ties -> smallest suppkey) and that revenue
    — the 'who should source this part' rollup (TPC-H Q2's shape on the
    tables this corpus has).

    Scale shape: batches combine to (partkey, suppkey) partial sums
    first; ONE partkey-hash part-exchange then finishes both levels
    inside each part — segment-sum per (part, supp), then a vectorized
    per-part argmax (lexsort by (part, -rev, supp), first row per part
    run) — so the argmax never sees more than one part's groups and
    only (key, key, cents) triplets ever shuffle."""
    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
    n_parts = int(max(8, min(4096, ds.count() // 200_000 + 1)))

    def partial(b: pa.Table) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 100.0
        ).astype(np.int64)
        key = (pk.astype(np.int64) << np.int64(20)) | sk.astype(np.int64)
        if (sk >= (1 << 20)).any():  # suppkey domain guard for the packing
            raise ValueError("suppkey exceeds 20-bit packing domain")
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        upk = (u >> np.int64(20)).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(upk),
                "sk": pa.array((u & np.int64((1 << 20) - 1)).astype(np.int64)),
                "cents": pa.array(s),
                "part": pa.array(
                    (synth._splitmix64(upk.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {
            "p_partkey": pa.array([], pa.int64()),
            "best_suppkey": pa.array([], pa.int64()),
            "revenue_cents": pa.array([], pa.int64()),
        }
    )

    def argmax_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        pk = t["pk"].to_numpy(zero_copy_only=False)
        sk = t["sk"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        # finish the (part, supp) sums (several batch partials per pair)
        key = (pk << np.int64(20)) | sk
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        upk = (u >> np.int64(20)).astype(np.int64)
        usk = (u & np.int64((1 << 20) - 1)).astype(np.int64)
        # argmax per part run: sort (pk asc, rev desc, sk asc), take run head
        order = np.lexsort((usk, -s, upk))
        upk, usk, s = upk[order], usk[order], s[order]
        first = np.r_[True, upk[1:] != upk[:-1]]
        return pa.table(
            {
                "p_partkey": pa.array(upk[first]),
                "best_suppkey": pa.array(usk[first]),
                "revenue_cents": pa.array(s[first]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(argmax_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_part_best_supplier() -> str:
    return """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS rev
      FROM lineitem GROUP BY 1, 2
    ), r AS (
      SELECT l_partkey, l_suppkey, rev,
             row_number() OVER (
               PARTITION BY l_partkey ORDER BY rev DESC, l_suppkey
             ) AS rn
      FROM ps
    )
    SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
           CAST(l_suppkey AS BIGINT) AS best_suppkey,
           CAST(rev AS BIGINT) AS revenue_cents
    FROM r WHERE rn = 1
    """


def q_supplier_order_overlap(sf_dir: str):
    """Multi-supplier-order participation — the TPC-H Q21 core shape
    (per-group distinct count re-joined to the group's members): per
    supplier, how many of its orders were shared with >= 1 OTHER
    supplier (fulfilment-dependency analytics).

    Scale shape: batches dedupe (orderkey, suppkey) pairs first; ONE
    orderkey co-partition finishes the dedup, counts distinct suppliers
    per order with a run scan, and emits (suppkey, 1) only for rows of
    qualifying orders, combined to <= |suppliers-in-part| partials."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
    n_parts = int(max(8, min(4096, ds.count() // 200_000 + 1)))

    def dedup_batch(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        key = (ok.astype(np.int64) << np.int64(20)) | sk.astype(np.int64)
        if (sk >= (1 << 20)).any():
            raise ValueError("suppkey exceeds 20-bit packing domain")
        u = np.unique(key)
        uok = (u >> np.int64(20)).astype(np.int64)
        return pa.table(
            {
                "ok": pa.array(uok),
                "sk": pa.array((u & np.int64((1 << 20) - 1)).astype(np.int64)),
                "part": pa.array(
                    (synth._splitmix64(uok.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {"suppkey": pa.array([], pa.int64()), "n_shared_orders": pa.array([], pa.int64())}
    )

    def overlap_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        ok = t["ok"].to_numpy(zero_copy_only=False)
        sk = t["sk"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, ok))
        ok, sk = ok[order], sk[order]
        keep = np.r_[True, (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])]  # cross-batch dedup
        ok, sk = ok[keep], sk[keep]
        new = np.r_[True, ok[1:] != ok[:-1]]
        lens = np.diff(np.r_[np.flatnonzero(new), len(ok)])
        shared = np.repeat(lens >= 2, lens)
        u, c = np.unique(sk[shared], return_counts=True)
        return pa.table(
            {"suppkey": pa.array(u), "n_shared_orders": pa.array(c.astype(np.int64))}
        )

    return (
        ds.map_batches(dedup_batch, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(overlap_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("suppkey")
        .aggregate(Sum("n_shared_orders", alias_name="n_shared_orders"))
    )


def _sql_supplier_order_overlap() -> str:
    return """
    WITH os AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
    ), c AS (
      SELECT l_orderkey, count(*) AS ns FROM os GROUP BY 1
    )
    SELECT CAST(os.l_suppkey AS BIGINT) AS suppkey,
           CAST(count(*) AS BIGINT) AS n_shared_orders
    FROM os JOIN c ON c.l_orderkey = os.l_orderkey
    WHERE c.ns >= 2 GROUP BY 1
    """


def q_idle_rich_customers(sf_dir: str):
    """Above-average-balance customers with NO orders in the corpus's
    final 365 days, rolled up per nation — the TPC-H Q22 shape (global
    scalar subqueries + anti-join + aggregate; every corpus customer has
    >= 1 lifetime order, so Q22's literal no-orders predicate is
    degenerate here and the recency window keeps the anti-join real).
    'Above average' compares in exact integers: cents * n_pos >
    sum_pos_cents (cross-multiplied against the positive-balance
    population), so no float mean ever enters; the window cut compares
    integer epoch days against max(order day) - 365.

    Scale shape: pass 1 reduces customers to two global scalars and
    orders to one (max day); pass 2 tags qualifying customers and
    anti-joins them against per-batch-deduped RECENT order custkeys
    (stale orders die at the read) in ONE custkey co-partition, emitting
    per-nation partials.  int64 cross-multiply bound: |cents| * n_pos <
    2^63 holds through ~10^12 customers at TPC-H balance ranges."""
    from ray.data.aggregate import Count, Max, Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_partial(b: pa.Table) -> pa.Table:
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = np.floor(bal * 100.0).astype(np.int64)
        pos = bal > 0.0
        return pa.table(
            {
                "s": pa.array([int(cents[pos].sum())], pa.int64()),
                "n": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    m = (
        cust.map_batches(pos_partial, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )
    s_pos, n_pos = int(m["s"]), int(m["n"])

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def day_partial(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        )
        mx = int(day.max()) if len(day) else np.iinfo(np.int64).min
        return pa.table({"d": pa.array([mx], pa.int64())})

    cut = (
        int(
            orders.map_batches(day_partial, batch_format="pyarrow", zero_copy_batch=True)
            .aggregate(Max("d", alias_name="d"))["d"]
        )
        - 365
    )
    n_parts = int(max(8, min(4096, orders.count() // 200_000 + 1)))

    def tag_cust(b: pa.Table) -> pa.Table:
        k = b["c_custkey"].to_numpy(zero_copy_only=False)
        cents = np.floor(b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0).astype(
            np.int64
        )
        rich = cents * n_pos > s_pos
        k = k[rich]
        return pa.table(
            {
                "key": pa.array(k.astype(np.int64)),
                "nation": pa.array(
                    b["c_nationkey"].to_numpy(zero_copy_only=False)[rich].astype(np.int64)
                ),
                "cents": pa.array(cents[rich]),
                "is_build": pa.array(np.ones(len(k), bool)),
                "part": pa.array(
                    (synth._splitmix64(k.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        day = (
            b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        )
        recent = day >= cut
        u = np.unique(b["o_custkey"].to_numpy(zero_copy_only=False)[recent]).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(u),
                "nation": pa.array(np.zeros(len(u), np.int64)),
                "cents": pa.array(np.zeros(len(u), np.int64)),
                "is_build": pa.array(np.zeros(len(u), bool)),
                "part": pa.array(
                    (synth._splitmix64(u.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {
            "nationkey": pa.array([], pa.int64()),
            "n_customers": pa.array([], pa.int64()),
            "acctbal_cents": pa.array([], pa.int64()),
        }
    )

    def anti_part(t: pa.Table) -> pa.Table:
        isb = t["is_build"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        bkey = key[isb]
        if len(bkey) == 0:
            return _empty
        pkey = np.unique(key[~isb])
        has_order = (
            pkey[np.minimum(np.searchsorted(pkey, bkey), len(pkey) - 1)] == bkey
            if len(pkey)
            else np.zeros(len(bkey), bool)
        )
        idle = ~has_order
        nation = t["nation"].to_numpy(zero_copy_only=False)[isb][idle]
        cents = t["cents"].to_numpy(zero_copy_only=False)[isb][idle]
        u, inv = np.unique(nation, return_inverse=True)
        n = np.zeros(len(u), np.int64)
        np.add.at(n, inv, 1)
        sc = np.zeros(len(u), np.int64)
        np.add.at(sc, inv, cents)
        return pa.table(
            {
                "nationkey": pa.array(u),
                "n_customers": pa.array(n),
                "acctbal_cents": pa.array(sc),
            }
        )

    out = (
        cust.map_batches(tag_cust, batch_format="pyarrow", zero_copy_batch=True)
        .union(orders.map_batches(tag_orders, batch_format="pyarrow", zero_copy_batch=True))
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(anti_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        .groupby("nationkey")
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Sum("acctbal_cents", alias_name="acctbal_cents"),
        )
        .to_pandas()  # nation-bounded
    )
    if len(out) == 0:  # keep the typed schema when the anti-join is empty
        return _empty
    return pa.table(
        {
            "nationkey": pa.array(out["nationkey"].to_numpy(np.int64)),
            "n_customers": pa.array(out["n_customers"].to_numpy(np.int64)),
            "acctbal_cents": pa.array(out["acctbal_cents"].to_numpy(np.int64)),
        }
    )


def _sql_idle_rich_customers() -> str:
    return """
    WITH m AS (
      SELECT CAST(SUM(CAST(floor(c_acctbal * 100.0) AS BIGINT)) AS HUGEINT) AS s,
             CAST(count(*) AS HUGEINT) AS n
      FROM customer WHERE c_acctbal > 0.0
    ), mx AS (
      SELECT max(CAST(floor(epoch(o_orderdate) / 86400.0) AS BIGINT)) - 365 AS cut
      FROM orders
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(floor(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS acctbal_cents
    FROM customer, m
    WHERE CAST(floor(c_acctbal * 100.0) AS HUGEINT) * m.n > m.s
      AND NOT EXISTS (
        SELECT 1 FROM orders, mx
        WHERE o_custkey = c_custkey
          AND CAST(floor(epoch(o_orderdate) / 86400.0) AS BIGINT) >= mx.cut
      )
    GROUP BY 1
    """


def q_order_interarrival_median(sf_dir: str):
    """Per-customer LOW-MEDIAN of the day gaps between consecutive
    orders (reorder-cadence analytics — the sequential-diff + per-key
    exact quantile shape): orders sort by (day, orderkey) within each
    customer; gaps are day diffs; output the (n-1)//2-smallest gap per
    customer with >= 2 orders.  The discrete low median avoids
    interpolated floats entirely.

    Scale shape: ONE custkey-hash part-exchange co-locates each
    customer's orders; each part computes every customer's gaps and
    median with two lexsorts (no per-group dispatch) and emits one row
    per customer — the output is customer-bounded, never
    order-bounded."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])
    n_parts = int(max(8, min(4096, ds.count() // 200_000 + 1)))

    def tag(b: pa.Table) -> pa.Table:
        c = b["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c": pa.array(c.astype(np.int64)),
                "k": b["o_orderkey"],
                "day": pa.array(
                    b["o_orderdate"]
                    .to_numpy(zero_copy_only=False)
                    .astype("datetime64[D]")
                    .astype(np.int64)
                ),
                "part": pa.array(
                    (synth._splitmix64(c.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {"o_custkey": pa.array([], pa.int64()), "median_gap_days": pa.array([], pa.int64())}
    )

    def med_part(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return _empty
        c = t["c"].to_numpy(zero_copy_only=False)
        k = t["k"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, day, c))
        c, day = c[order], day[order]
        same = c[1:] == c[:-1]
        gc = c[1:][same]
        gd = (day[1:] - day[:-1])[same]
        if len(gc) == 0:
            return _empty
        o2 = np.lexsort((gd, gc))
        gc, gd = gc[o2], gd[o2]
        new = np.r_[True, gc[1:] != gc[:-1]]
        starts = np.flatnonzero(new)
        lens = np.diff(np.r_[starts, len(gc)])
        pick = starts + (lens - 1) // 2
        return pa.table(
            {
                "o_custkey": pa.array(gc[new]),
                "median_gap_days": pa.array(gd[pick]),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(med_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_order_interarrival_median() -> str:
    return """
    WITH s AS (
      SELECT o_custkey AS c, o_orderkey AS k,
             CAST(floor(epoch(o_orderdate) / 86400.0) AS BIGINT) AS day
      FROM orders
    ), d AS (
      SELECT c, day - lag(day) OVER (PARTITION BY c ORDER BY day, k) AS diff
      FROM s
    ), dd AS (
      SELECT c, diff,
             row_number() OVER (PARTITION BY c ORDER BY diff) AS rn,
             count(*) OVER (PARTITION BY c) AS n
      FROM d WHERE diff IS NOT NULL
    )
    SELECT CAST(c AS BIGINT) AS o_custkey, CAST(diff AS BIGINT) AS median_gap_days
    FROM dd WHERE rn = (n + 1) // 2
    """


def q_image_dedup_savings(sf_dir: str):
    """Storage-dedup accounting over the image corpus — what an exact
    content-dedup pass would save, per format: image count, distinct
    blob count, total bytes, and bytes after keeping one copy per blob.

    Scale shape: blobs digest at the read (md5 -> 8-byte key + length;
    the bytes never shuffle — SURVEY §7.5); one (fmt, key) groupby
    dedupes, a per-block combiner shrinks to <= |fmt| rows per block,
    and the final groupby merges format partials."""
    import hashlib

    from ray.data.aggregate import Count, Min, Sum

    from . import tiling

    images = tiling.read_images(sf_dir, columns=["fmt", "bytes"])

    def digest(b: pa.Table) -> pa.Table:
        blobs = b["bytes"].to_pylist()
        keys = np.fromiter(
            (
                int.from_bytes(hashlib.md5(x).digest()[:8], "little") - (1 << 63)
                for x in blobs
            ),
            np.int64,
            len(blobs),
        )
        lens = np.fromiter((len(x) for x in blobs), np.int64, len(blobs))
        return pa.table({"fmt": b["fmt"], "k": pa.array(keys), "len": pa.array(lens)})

    per_blob = (
        images.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["fmt", "k"])
        .aggregate(Min("len", alias_name="len"), Count(alias_name="n"))
    )

    _empty = pa.table(
        {
            "fmt": pa.array([], pa.string()),
            "n_images": pa.array([], pa.int64()),
            "n_blobs": pa.array([], pa.int64()),
            "bytes_total": pa.array([], pa.int64()),
            "bytes_dedup": pa.array([], pa.int64()),
        }
    )

    def fmt_partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty
        fmt = b["fmt"].to_numpy(zero_copy_only=False).astype("U8")
        ln = b["len"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(fmt, return_inverse=True)
        ni = np.zeros(len(u), np.int64)
        np.add.at(ni, inv, n)
        nb = np.zeros(len(u), np.int64)
        np.add.at(nb, inv, 1)
        bt = np.zeros(len(u), np.int64)
        np.add.at(bt, inv, ln * n)
        bd = np.zeros(len(u), np.int64)
        np.add.at(bd, inv, ln)
        return pa.table(
            {
                "fmt": pa.array(u, pa.string()),
                "n_images": pa.array(ni),
                "n_blobs": pa.array(nb),
                "bytes_total": pa.array(bt),
                "bytes_dedup": pa.array(bd),
            }
        )

    return (
        per_blob.map_batches(fmt_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("n_blobs", alias_name="n_blobs"),
            Sum("bytes_total", alias_name="bytes_total"),
            Sum("bytes_dedup", alias_name="bytes_dedup"),
        )
    )


def _sql_image_dedup_savings(sf: float = 0.01) -> str:
    from ..sources import synth

    return f"""
    WITH g AS (
      SELECT fmt, bytes, CAST(octet_length(bytes) AS BIGINT) AS len,
             CAST(count(*) AS BIGINT) AS n
      FROM read_parquet('{synth.images_dir(sf)}/*.parquet')
      GROUP BY fmt, bytes
    )
    SELECT fmt,
           CAST(SUM(n) AS BIGINT) AS n_images,
           CAST(count(*) AS BIGINT) AS n_blobs,
           CAST(SUM(len * n) AS BIGINT) AS bytes_total,
           CAST(SUM(len) AS BIGINT) AS bytes_dedup
    FROM g GROUP BY fmt
    """


_QSK_K = 1024


def q_quantile_sketch_prices(sf_dir: str):
    """MERGEABLE quantile sketch over lineitem prices — the bounded-state
    companion to the exact q_price_quantiles: a deterministic uniform
    sample (the K=1024 rows with the smallest splitmix64(orderkey*16 +
    linenumber) — a bijection, so the sample is retry-, partitioning- and
    cluster-size-invariant) estimates the nine deciles.  Bottom-K of a
    union == bottom-K of merged bottom-Ks, so partials merge
    associatively — the property an exact quantile lacks and the reason
    sketches exist at 100 TB.

    Scale shape: each batch emits its K smallest (hash, cents) rows;
    the driver merge touches <= K x blocks rows (the same bounded
    partial-top-k venue as ann_cosine_top5).  Accuracy vs the exact
    deciles is pinned in tests/test_queries_oracle.py."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = b["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        h = synth._splitmix64((ok * 16 + ln).astype(np.uint64))
        if len(h) > _QSK_K:
            idx = np.argpartition(h, _QSK_K)[:_QSK_K]
            h, cents = h[idx], cents[idx]
        return pa.table({"h": pa.array(h.astype(np.uint64)), "cents": pa.array(cents)})

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    )  # <= K x blocks rows
    h = parts["h"].to_numpy(np.uint64)
    cents = parts["cents"].to_numpy(np.int64)
    if len(h) > _QSK_K:
        idx = np.argpartition(h, _QSK_K)[:_QSK_K]
        cents = cents[idx]
    cents = np.sort(cents)
    n = len(cents)
    qs = np.arange(1, 10, dtype=np.int64)
    pick = (qs * (n - 1)) // 10
    return pa.table({"q_x10": pa.array(qs), "est_cents": pa.array(cents[pick])})


def _sql_quantile_sketch_prices() -> str:
    sm = _sql_splitmix64("(CAST(l_orderkey AS HUGEINT) * 16 + l_linenumber)")
    return f"""
    WITH t AS (
      SELECT CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS cents,
             ({sm}) AS h
      FROM lineitem
    ), s AS (
      SELECT cents FROM t ORDER BY h LIMIT {_QSK_K}
    ), o AS (
      SELECT cents, row_number() OVER (ORDER BY cents) AS rn,
             count(*) OVER () AS n
      FROM s
    )
    SELECT CAST(q.q AS BIGINT) AS q_x10, o.cents AS est_cents
    FROM o JOIN (SELECT unnest(range(1, 10)) AS q) q
      ON o.rn = (q.q * (o.n - 1)) // 10 + 1
    """


def q_neardup_rate_by_source(sf_dir: str):
    """Dedup REPORTING rollup: per document source, how many docs exist
    and how many sit in >= 1 verified near-dup pair (the number a corpus
    curation dashboard tracks per provider) — composes the shared
    MinHash-LSH + exact-Jaccard verify pipeline (_verified_pairs) with a
    broadcast membership probe.

    Scale shape: the pair set reduces to a sorted distinct-id array
    (pair-bounded, far smaller than the corpus), ships once via ray.put,
    and the per-source counts come from one map over the (doc_id,
    source)-pruned read — the same shuffle-free probe shape as
    q_decontaminate."""
    import ray

    from ray.data.aggregate import Sum

    from . import rows_only as _ro

    pairs = _ro._verified_pairs(sf_dir).to_pandas()
    nd = np.unique(
        np.concatenate(
            [pairs["doc_a"].to_numpy(np.int64), pairs["doc_b"].to_numpy(np.int64)]
        )
        if len(pairs)
        else np.array([], np.int64)
    )
    nd_ref = ray.put(nd)

    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def combine(b: pa.Table) -> pa.Table:
        import ray as _ray

        nd_ids = _ray.get(nd_ref)
        src = b["source"].to_numpy(zero_copy_only=False).astype("U16")
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = (
            nd_ids[np.minimum(np.searchsorted(nd_ids, ids), len(nd_ids) - 1)] == ids
            if len(nd_ids)
            else np.zeros(len(ids), bool)
        )
        u, inv = np.unique(src, return_inverse=True)
        n = np.zeros(len(u), np.int64)
        np.add.at(n, inv, 1)
        d = np.zeros(len(u), np.int64)
        np.add.at(d, inv[hit], 1)
        return pa.table(
            {
                "source": pa.array(u, pa.string()),
                "n_docs": pa.array(n),
                "n_neardup": pa.array(d),
            }
        )

    return (
        docs.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_neardup", alias_name="n_neardup"))
    )


def _sql_neardup_rate_by_source() -> str:
    return f"""
    WITH {_sql_lsh_cand_cte()}, cnt AS (
      SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS i
      FROM cand c
      JOIN shd sa ON sa.doc_id = c.doc_a
      JOIN shd sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
      GROUP BY c.doc_a, c.doc_b
    ), jac AS (
      SELECT c.doc_a, c.doc_b, coalesce(i.i, 0) AS i,
             coalesce(ca.n, 0) + coalesce(cb.n, 0) - coalesce(i.i, 0) AS u
      FROM cand c
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      LEFT JOIN cnt ca ON ca.doc_id = c.doc_a
      LEFT JOIN cnt cb ON cb.doc_id = c.doc_b
    ), ver AS (
      SELECT doc_a, doc_b FROM jac
      WHERE CASE WHEN u = 0 THEN 1.0 ELSE CAST(i AS DOUBLE) / u END >= 0.5
    ), nd AS (
      SELECT doc_a AS doc_id FROM ver UNION SELECT doc_b FROM ver
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(nd.doc_id) AS BIGINT) AS n_neardup
    FROM documents d LEFT JOIN nd ON nd.doc_id = d.doc_id
    GROUP BY 1
    """


def q_user_activity_islands(sf_dir: str):
    """Gaps-and-islands per user (the streak-analytics SQL pattern): from
    each user's DISTINCT active days, count the maximal runs of
    consecutive days (islands) and the longest streak length.

    Scale shape: batches dedupe (user, day) first; ONE user-hash
    part-exchange co-locates each user's days; each part finishes the
    dedup and reads islands off one lexsort — an island starts where the
    user changes or the day gap exceeds 1 — then segment-reduces
    per-user island counts and max lengths (no per-group dispatch).
    Output is user-bounded."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    n_parts = int(max(8, min(4096, ds.count() // 200_000 + 1)))

    def dedup_batch(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        key = uid * np.int64(1 << 20) + (day - 10000)  # epoch days ~19700: 20 bits
        u = np.unique(key)
        uu = (u // np.int64(1 << 20)).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(uu),
                "day": pa.array((u % np.int64(1 << 20)) + 10000),
                "part": pa.array(
                    (synth._splitmix64(uu.astype(np.uint64)) % np.uint64(n_parts)).astype(
                        np.int64
                    )
                ),
            }
        )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_active_days": pa.array([], pa.int64()),
            "n_islands": pa.array([], pa.int64()),
            "longest_streak": pa.array([], pa.int64()),
        }
    )

    def islands_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty
        u = t["u"].to_numpy(zero_copy_only=False)
        day = t["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (day[1:] != day[:-1])]  # cross-batch dedup
        u, day = u[keep], day[keep]
        new_user = np.r_[True, u[1:] != u[:-1]]
        new_island = new_user | np.r_[True, (day[1:] - day[:-1]) > 1]
        isl = np.cumsum(new_island) - 1  # island id per row
        isl_len = np.bincount(isl)
        isl_user = u[new_island]
        # per-user reductions over the island-level arrays
        nu = np.r_[True, isl_user[1:] != isl_user[:-1]]
        seg = np.cumsum(nu) - 1
        n_isl = np.bincount(seg)
        days_total = np.zeros(len(n_isl), np.int64)
        np.add.at(days_total, seg, isl_len)
        longest = np.zeros(len(n_isl), np.int64)
        np.maximum.at(longest, seg, isl_len)
        return pa.table(
            {
                "user_id": pa.array(isl_user[nu]),
                "n_active_days": pa.array(days_total),
                "n_islands": pa.array(n_isl.astype(np.int64)),
                "longest_streak": pa.array(longest),
            }
        )

    return (
        ds.map_batches(dedup_batch, batch_format="pyarrow", zero_copy_batch=True)
        .sort("part", boundaries=list(range(1, n_parts)))
        .map_batches(islands_part, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def _sql_user_activity_islands() -> str:
    return """
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day
      FROM events
    ), g AS (
      SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      FROM d
    ), isl AS (
      SELECT user_id, count(*) AS len FROM g GROUP BY user_id, grp
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM isl GROUP BY user_id
    """


_GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_BITS = 15  # per axis; 30 interleaved bits = 6 base32 chars


def q_geohash_counts(sf_dir: str):
    """Geohash-6 cell counts over the event points — the third public
    geo index the engine speaks alongside Bing quadkeys
    (q_quadkey_tiles) and the hex grid (q_hex_assign_r3): quantize
    lon/lat to 15 bits each, interleave lon-first into a 30-bit code,
    emit 6 base32 chars.

    Scale shape: encode + per-batch count combiner in one map over the
    derived points; only (cell, count) partials reach the groupby.
    Quantization floors identical float expression trees on both
    engines, and the oracle builds the same interleave with 30
    generated arithmetic terms."""
    from ray.data.aggregate import Sum

    ds = _events_points(sf_dir)

    def encode(b: pa.Table) -> pa.Table:
        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        n = np.int64(1 << _GH_BITS)
        qx = np.floor((lon + 180.0) / 360.0 * float(n)).astype(np.int64)
        qy = np.floor((lat + 90.0) / 180.0 * float(n)).astype(np.int64)
        v = np.zeros(len(qx), np.int64)
        for i in range(_GH_BITS):
            v |= ((qx >> (_GH_BITS - 1 - i)) & 1) << (29 - 2 * i)
            v |= ((qy >> (_GH_BITS - 1 - i)) & 1) << (28 - 2 * i)
        u, c = np.unique(v, return_counts=True)
        chars = np.array(list(_GH_ALPHABET), "U1")
        gh = chars[(u[:, None] >> (np.arange(5, -1, -1) * 5)) & 31]
        return pa.table(
            {
                "geohash": pa.array(["".join(row) for row in gh], pa.string()),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("geohash")
        .aggregate(Sum("n", alias_name="n"))
    )


def _sql_geohash_counts() -> str:
    n = 1 << _GH_BITS
    qx = f"CAST(floor((({_LON_SQL}) + 180.0) / 360.0 * {n}.0) AS BIGINT)"
    qy = f"CAST(floor((({_LAT_SQL}) + 90.0) / 180.0 * {n}.0) AS BIGINT)"
    terms = []
    for i in range(_GH_BITS):
        terms.append(f"((qx // {1 << (_GH_BITS - 1 - i)}) % 2) * {1 << (29 - 2 * i)}")
        terms.append(f"((qy // {1 << (_GH_BITS - 1 - i)}) % 2) * {1 << (28 - 2 * i)}")
    v = " + ".join(terms)
    ch = " || ".join(
        f"substr('{_GH_ALPHABET}', CAST((v // {1 << (25 - 5 * j)}) % 32 AS INTEGER) + 1, 1)"
        for j in range(6)
    )
    return f"""
    WITH q AS (
      SELECT {qx} AS qx, {qy} AS qy FROM events
    ), iv AS (
      SELECT ({v}) AS v FROM q
    )
    SELECT ({ch}) AS geohash, CAST(count(*) AS BIGINT) AS n
    FROM iv GROUP BY 1
    """


def q_neardup_containment(sf_dir: str):
    """Asymmetric CONTAINMENT scoring over the shared LSH candidate
    pairs — the clone-direction metric (|A n B| / |A|, x100 trunc) that
    tells WHICH document is the copy, where symmetric Jaccard
    (q_neardup_verified) only says they overlap.  Output: candidate
    pairs with containment >= 50 in at least one direction, both
    directions reported.

    Scale shape: identical to q_neardup_verified (the shared candidate +
    two-pass payload co-group engine); only the pair score function
    differs, so the distributed plumbing is reused, not re-derived."""
    from . import rows_only as _ro
    from ..functions import dedup as dedup_f

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def texts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "payload": [t.encode("utf-8") for t in df["text"].astype(str)],
            }
        )

    def cont_dir(ta: bytes, tb: bytes):
        sa = set(dedup_f.shingle_hashes(ta.decode("utf-8")).tolist())
        sb = set(dedup_f.shingle_hashes(tb.decode("utf-8")).tolist())
        i = len(sa & sb)
        ca = 100 if not sa else int(i / len(sa) * 100.0)
        cb = 100 if not sb else int(i / len(sb) * 100.0)
        if max(ca, cb) < 50:
            return None
        return ca * 1000 + cb  # packed: unpacked by the caller

    cand = _ro._lsh_candidates(ds)
    payload = ds.map_batches(texts, batch_format="pandas")
    pairs = _ro._join_pairs_with_payload(
        cand, payload, cont_dir, "packed", n_keys=ds.count()
    ).to_pandas()
    pairs = pairs.drop_duplicates(subset=["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
    packed = pairs["packed"].to_numpy(np.int64)
    return pa.table(
        {
            "doc_a": pa.array(pairs.doc_a.to_numpy(np.int64)),
            "doc_b": pa.array(pairs.doc_b.to_numpy(np.int64)),
            "cont_a_x100": pa.array(packed // 1000),
            "cont_b_x100": pa.array(packed % 1000),
        }
    )


def _sql_neardup_containment() -> str:
    return f"""
    WITH {_sql_lsh_cand_cte()}, cnt AS (
      SELECT doc_id, count(*) AS n FROM shd GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, count(*) AS i
      FROM cand c
      JOIN shd sa ON sa.doc_id = c.doc_a
      JOIN shd sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
      GROUP BY c.doc_a, c.doc_b
    ), sc AS (
      SELECT c.doc_a, c.doc_b,
             CASE WHEN coalesce(ca.n, 0) = 0 THEN 100
                  ELSE CAST(trunc(CAST(coalesce(i.i, 0) AS DOUBLE) / ca.n * 100.0) AS BIGINT)
             END AS cont_a_x100,
             CASE WHEN coalesce(cb.n, 0) = 0 THEN 100
                  ELSE CAST(trunc(CAST(coalesce(i.i, 0) AS DOUBLE) / cb.n * 100.0) AS BIGINT)
             END AS cont_b_x100
      FROM cand c
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      LEFT JOIN cnt ca ON ca.doc_id = c.doc_a
      LEFT JOIN cnt cb ON cb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, cont_a_x100, cont_b_x100
    FROM sc WHERE cont_a_x100 >= 50 OR cont_b_x100 >= 50
    """


def q_cluster_caption_consistency(sf_dir: str):
    """Cross-modal dedup validation: for every multi-image perceptual
    near-dup cluster (q_image_phash_clusters), do the members agree on
    their CAPTION?  Output per cluster: member count and distinct
    caption count — disagreeing clusters are what a curation pipeline
    sends to review before keeping one representative (near-identical
    pixels with different text labels poison a caption-training set).

    Scale shape: the cluster map is pair-bounded (far smaller than the
    corpus) and ships once via ray.put; captions stream through one map
    over the (image_id, caption)-pruned read — captions hash to 8-byte
    fingerprints in the map, so only (cluster, hash) pairs reach the
    distinct-count groupby, never caption text."""
    import ray

    from ray.data.aggregate import Sum

    from . import rows_only as _ro
    from . import tiling

    clusters = _ro.q_image_phash_clusters(sf_dir)
    cl_ids = np.array(
        [int(s[3:]) for s in clusters["image_id"].to_pylist()], np.int64
    )
    cl_lbl = np.array(
        [int(s[3:]) for s in clusters["cluster_id"].to_pylist()], np.int64
    )
    order = np.argsort(cl_ids)
    cl_ids, cl_lbl = cl_ids[order], cl_lbl[order]
    map_ref = ray.put((cl_ids, cl_lbl))

    images = tiling.read_images(sf_dir, columns=["image_id", "caption"])

    def tag(b: pa.Table) -> pa.Table:
        import hashlib

        import ray as _ray

        ids_s = b["image_id"].to_pylist()
        ids = np.fromiter((int(s[3:]) for s in ids_s), np.int64, len(ids_s))
        k_ids, k_lbl = _ray.get(map_ref)
        if len(k_ids):
            pos = np.minimum(np.searchsorted(k_ids, ids), len(k_ids) - 1)
            hit = k_ids[pos] == ids
        else:
            hit = np.zeros(len(ids), bool)
        caps = b["caption"].to_pylist()
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(caps[i].encode("utf-8")).digest()[:8], "little")
                - (1 << 63)
                for i in np.flatnonzero(hit)
            ),
            np.int64,
            int(hit.sum()),
        )
        lbl = k_lbl[pos[hit]] if len(k_ids) else np.array([], np.int64)
        # per-batch combiner: distinct (cluster, caption-hash) + counts
        key = np.stack([lbl, h], axis=1)
        u, c = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "cluster": pa.array(u[:, 0]),
                "cap_h": pa.array(u[:, 1]),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    _empty = pa.table(
        {
            "cluster_id": pa.array([], pa.string()),
            "n_members": pa.array([], pa.int64()),
            "n_captions": pa.array([], pa.int64()),
        }
    )

    def reduce_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty
        cl = b["cluster"].to_numpy(zero_copy_only=False)
        h = b["cap_h"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((h, cl))
        cl, h, n = cl[order], h[order], n[order]
        dup = np.r_[True, (cl[1:] != cl[:-1]) | (h[1:] != h[:-1])]
        seg = np.cumsum(dup) - 1
        cnt = np.zeros(int(seg[-1]) + 1, np.int64)
        np.add.at(cnt, seg, n)
        cl_u = cl[dup]
        new = np.r_[True, cl_u[1:] != cl_u[:-1]]
        cseg = np.cumsum(new) - 1
        members = np.zeros(int(cseg[-1]) + 1, np.int64)
        np.add.at(members, cseg, cnt)
        ncap = np.zeros(len(members), np.int64)
        np.add.at(ncap, cseg, 1)
        fmt = np.frompyfunc("img{:012d}".format, 1, 1)
        return pa.table(
            {
                "cluster_id": pa.array(fmt(cl_u[new]).astype("U15"), pa.string()),
                "n_members": pa.array(members),
                "n_captions": pa.array(ncap),
            }
        )

    return (
        images.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["cluster", "cap_h"])
        .aggregate(Sum("n", alias_name="n"))
        .repartition(1)
        .map_batches(reduce_block, batch_format="pyarrow", zero_copy_batch=True)
    )


def _sql_cluster_caption_consistency(sf: float = 0.01) -> str:
    from ..sources import synth

    return f"""
    WITH RECURSIVE {_phash_pair_ctes(sf)}, edges AS (
      SELECT img_a AS u, img_b AS v FROM pairs
      UNION
      SELECT img_b, img_a FROM pairs
    ), reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ), cl AS (
      SELECT u AS image_id, least(u, min(v)) AS cluster_id
      FROM reach GROUP BY u
    )
    SELECT cl.cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(count(DISTINCT i.caption) AS BIGINT) AS n_captions
    FROM cl JOIN read_parquet('{synth.images_dir(sf)}/*.parquet') i
      ON i.image_id = cl.image_id
    GROUP BY 1
    """


def q_orders_seasonality(sf_dir: str):
    """Seasonality profile — the two-level calendar rollup: per
    month-of-year (pooled across years), order count, total revenue
    cents, and the between-year spread (max yearly total - min yearly
    total for that month, over years WITH orders in that month).

    Scale shape: one map pass combines to (year, month) partials
    (<= 12 x years rows leave each batch); the (year, month) groupby is
    calendar-bounded, and the month rollup runs on that tiny table."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[M]")
        y = d.astype("datetime64[Y]").astype(np.int64) + 1970
        m = d.astype(np.int64) % 12 + 1
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        ym = y * 100 + m
        u, inv = np.unique(ym, return_inverse=True)
        n = np.zeros(len(u), np.int64)
        np.add.at(n, inv, 1)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"ym": pa.array(u), "n": pa.array(n), "cents": pa.array(s)})

    per_ym = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ym")
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
        .to_pandas()  # calendar-bounded
    )
    m = (per_ym["ym"] % 100).to_numpy(np.int64)
    n = per_ym["n"].to_numpy(np.int64)
    cents = per_ym["cents"].to_numpy(np.int64)
    rows = []
    for month in np.unique(m):
        sel = m == month
        rows.append(
            (
                int(month),
                int(n[sel].sum()),
                int(cents[sel].sum()),
                int(cents[sel].max() - cents[sel].min()),
            )
        )
    return pa.table(
        {
            "month": pa.array([r[0] for r in rows], pa.int64()),
            "n_orders": pa.array([r[1] for r in rows], pa.int64()),
            "revenue_cents": pa.array([r[2] for r in rows], pa.int64()),
            "yearly_spread_cents": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _sql_orders_seasonality() -> str:
    return """
    WITH ym AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
             CAST(month(o_orderdate) AS BIGINT) AS m,
             count(*) AS n,
             SUM(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS cents
      FROM orders GROUP BY 1, 2
    )
    SELECT m AS month,
           CAST(SUM(n) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST(max(cents) - min(cents) AS BIGINT) AS yearly_spread_cents
    FROM ym GROUP BY m
    """


_RECALL_Q = 16


def q_ann_recall_eval(sf_dir: str):
    """ANN EVALUATION harness — the measurement loop an index needs
    before anyone trusts it: recall@5 of the single-table hyperplane-LSH
    bucketing (ann_lsh_buckets' exact parameters) against brute-force
    cosine top-5, for the 16 lowest vec_ids.  Output per query: how many
    of its exact top-5 (self included, rank 0) land in the query's
    bucket — n/5 is the recall a multi-table config would improve.

    Scale shape: exact top-5 comes from the same blocked-matmul partial
    top-k as q_ann_cosine_top5 (k rows per query per block to the
    driver); the bucket membership check then reads ONLY the <= Q*5
    wanted ids — a broadcast id probe inside one map over the embedding
    read, never a join."""
    import ray

    from ..functions import ann as ann_f

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = emb.filter(expr=f"vec_id < {_RECALL_Q}").to_pandas().sort_values("vec_id")
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qids = qdf["vec_id"].to_numpy(np.int64)

    def partial(b: pa.Table) -> pa.Table:
        vecs = np.stack(b["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = qn @ vn.T
        kk = min(5, sims.shape[1])
        qi, vi, sc = [], [], []
        for q in range(len(qn)):
            part = np.argpartition(-sims[q], kk - 1)[:kk]
            qi.append(np.full(kk, qids[q]))
            vi.append(ids[part])
            sc.append(sims[q][part])
        return pa.table(
            {
                "q": pa.array(np.concatenate(qi).astype(np.int64)),
                "v": pa.array(np.concatenate(vi).astype(np.int64)),
                "sim": pa.array(np.concatenate(sc)),
            }
        )

    parts = emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    order = np.lexsort((parts.v.to_numpy(), -parts.sim.to_numpy(), parts.q.to_numpy()))
    p = parts.iloc[order]
    top = p.groupby("q", sort=True).head(5)
    top_q = top["q"].to_numpy(np.int64)
    top_v = top["v"].to_numpy(np.int64)

    wanted = np.unique(np.concatenate([top_v, qids]))
    wanted_ref = ray.put(wanted)

    def buckets(b: pa.Table) -> pa.Table:
        import ray as _ray

        w = _ray.get(wanted_ref)
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = w[np.minimum(np.searchsorted(w, ids), len(w) - 1)] == ids
        if not hit.any():
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "bucket": pa.array([], pa.int64())}
            )
        vecs = np.stack(b["embedding"].to_numpy(zero_copy_only=False)[hit]).astype(np.float64)
        planes = ann_f.hyperplane_lsh_params(vecs.shape[1], num_bits=12)
        return pa.table(
            {
                "vec_id": pa.array(ids[hit]),
                "bucket": pa.array(ann_f.hyperplane_bucket(vecs, planes).astype(np.int64)),
            }
        )

    bk = (
        emb.map_batches(buckets, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .set_index("vec_id")["bucket"]
    )
    qb = bk.reindex(top_q).to_numpy(np.int64)
    vb = bk.reindex(top_v).to_numpy(np.int64)
    same = (qb == vb).astype(np.int64)
    out_q = np.unique(top_q)
    n_in = np.zeros(len(out_q), np.int64)
    np.add.at(n_in, np.searchsorted(out_q, top_q), same)
    return pa.table(
        {
            "query_vec_id": pa.array(out_q),
            "n_top5_in_bucket": pa.array(n_in),
        }
    )


def _sql_ann_recall_eval() -> str:
    return f"""
    WITH b AS (
      SELECT vec_id, ({_sql_lsh_bucket_expr()}) AS bucket FROM embeddings
    ), qs AS (
      SELECT vec_id AS query_vec_id, embedding AS qe
      FROM embeddings WHERE vec_id < {_RECALL_Q}
    ), ranked AS (
      SELECT q.query_vec_id, e.vec_id,
             row_number() OVER (
               PARTITION BY q.query_vec_id
               ORDER BY list_cosine_similarity(q.qe, e.embedding) DESC, e.vec_id
             ) - 1 AS rank
      FROM qs q CROSS JOIN embeddings e
    )
    SELECT r.query_vec_id,
           CAST(count(*) FILTER (WHERE bv.bucket = bq.bucket) AS BIGINT)
             AS n_top5_in_bucket
    FROM ranked r
    JOIN b bv ON bv.vec_id = r.vec_id
    JOIN b bq ON bq.vec_id = r.query_vec_id
    WHERE r.rank < 5
    GROUP BY 1
    """


# Multi-probe multi-table ANN config (VERDICT r4 #5): 8 tables x 8 bits,
# probe every bucket within Hamming radius 1 of the query's code in ANY
# table — equivalently, candidate iff min-over-tables
# popcount(code_q XOR code_v) <= radius.  Measured recall@5 vs brute force
# at sf0.01: single-table 12-bit bucket 0.20 -> this config 0.74 (curve
# with runtimes in BASELINE.md).  Seeds 211+t keep the tables independent
# of the near-dup LSH family (seeds 11+t).
ANN_MP_TABLES = 8
ANN_MP_BITS = 8
ANN_MP_RADIUS = 1
_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.uint8)


def q_ann_multiprobe_top5(sf_dir: str):
    """Multi-probe LSH ANN: top-5 by exact cosine among CANDIDATES only,
    where a vector is a candidate for a query iff some table's bucket
    codes agree within ANN_MP_RADIUS bits (the standard multi-probe trick:
    perturbing the query code by <=r bits probes the neighboring buckets
    a near-miss projection sign would have landed in).

    Scale shape: the Q=16 query matrix + codes broadcast into ONE map over
    the embedding read; each batch computes its vectors' 8 codes, takes a
    per-table XOR+popcount minimum against the query codes ((Q x B) per
    table — no (Q x B x T) tensor), scores candidates with the same
    blocked matmul as q_ann_cosine_top5 and emits <= Q*5 partial rows.
    No shuffle, no join; driver merge is Q*5*n_blocks rows.  Candidate
    fraction is governed by T * probes / 2^bits, so at larger corpora the
    width grows like the near-dup path (neardup_lsh_num_bits) — here it
    is pinned to the oracle-checked config."""
    from ..functions import ann as ann_f

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qdf = emb.filter(expr=f"vec_id < {_RECALL_Q}").to_pandas().sort_values("vec_id")
    qmat = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    qids = qdf["vec_id"].to_numpy(np.int64)
    planes = [
        ann_f.hyperplane_lsh_params(qmat.shape[1], num_bits=ANN_MP_BITS, seed=211 + t)
        for t in range(ANN_MP_TABLES)
    ]
    qcodes = np.stack(
        [ann_f.hyperplane_bucket(qmat, p) for p in planes], axis=1
    )  # (Q, T) int64, values < 2^8

    def partial(b: pa.Table) -> pa.Table:
        vecs = np.stack(b["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        ids = b["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        best = np.full((len(qn), len(ids)), 255, np.uint8)
        for t in range(ANN_MP_TABLES):
            codes_t = ann_f.hyperplane_bucket(vecs, planes[t])
            x = (qcodes[:, t : t + 1] ^ codes_t[None, :]).astype(np.int64)
            np.minimum(best, _POP8[x], out=best)
        cand = best <= ANN_MP_RADIUS  # (Q, B)
        sims = qn @ vn.T
        qi, vi, sc = [], [], []
        for q in range(len(qn)):
            idx = np.flatnonzero(cand[q])
            if len(idx) == 0:
                continue
            kk = min(5, len(idx))
            part = idx[np.argpartition(-sims[q][idx], kk - 1)[:kk]]
            qi.append(np.full(kk, qids[q]))
            vi.append(ids[part])
            sc.append(sims[q][part])
        if not qi:
            return pa.table(
                {
                    "q": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "q": pa.array(np.concatenate(qi).astype(np.int64)),
                "v": pa.array(np.concatenate(vi).astype(np.int64)),
                "sim": pa.array(np.concatenate(sc)),
            }
        )

    parts = emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    order = np.lexsort((parts.v.to_numpy(), -parts.sim.to_numpy(), parts.q.to_numpy()))
    p = parts.iloc[order]
    top = p.groupby("q", sort=True).head(5).copy()
    top["rank"] = top.groupby("q").cumcount().astype(np.int64)
    return pa.table(
        {
            "query_vec_id": pa.array(top.q.to_numpy(np.int64)),
            "vec_id": pa.array(top.v.to_numpy(np.int64)),
            "rank": pa.array(top["rank"].to_numpy(np.int64)),
        }
    )


def _sql_ann_multiprobe_top5() -> str:
    """SQL mirror: the 8x8-bit seeded plane tables inline as DOUBLE[]
    literals; the multi-probe candidate predicate is
    bit_count(xor(code_q, code_v)) <= radius in ANY table — identical
    semantics to probing every radius-<=1 bucket."""
    from ..functions import ann as ann_f

    tbl_sel = []
    for t in range(ANN_MP_TABLES):
        planes = ann_f.hyperplane_lsh_params(
            64, num_bits=ANN_MP_BITS, seed=211 + t
        ).astype(np.float64)
        terms = []
        for j, p in enumerate(planes):
            lit = "[" + ",".join("%.17g" % v for v in p) + "]::DOUBLE[]"
            terms.append(
                f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0"
                f" THEN {1 << j} ELSE 0 END)"
            )
        tbl_sel.append("(" + "\n         + ".join(terms) + f") AS b{t}")
    cond = " OR ".join(
        f"bit_count(xor(q.qb{t}, e.b{t})::BIGINT) <= {ANN_MP_RADIUS}"
        for t in range(ANN_MP_TABLES)
    )
    qb_sel = ", ".join(f"b{t} AS qb{t}" for t in range(ANN_MP_TABLES))
    return f"""
    WITH b AS (
      SELECT vec_id, embedding,
      {", ".join(tbl_sel)}
      FROM embeddings
    ), qs AS (
      SELECT vec_id AS query_vec_id, embedding AS qe, {qb_sel}
      FROM b WHERE vec_id < {_RECALL_Q}
    ), ranked AS (
      SELECT q.query_vec_id, e.vec_id,
             row_number() OVER (
               PARTITION BY q.query_vec_id
               ORDER BY list_cosine_similarity(q.qe::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                        e.vec_id
             ) - 1 AS rank
      FROM qs q JOIN b e ON {cond}
    )
    SELECT query_vec_id, vec_id, rank FROM ranked WHERE rank < 5
    """


# ---------------------------------------------------------------------------
# relational completeness wrap (r4 session 4): semi join, unpivot,
# grouping sets, distributed regex filter
# ---------------------------------------------------------------------------

_SEMI_SHIP_CUT = np.datetime64("1998-06-01", "us")


def q_semi_join_suppliers(sf_dir: str):
    """Broadcast SEMI join: suppliers with at least one recent lineitem.

    Scale shape (the mirror of q_anti_join_customers): the BIG side
    (lineitem) is reduced to its distinct key set FIRST — a per-batch
    np.unique partial bounds the exchange at |suppliers| rows per batch,
    and the final distinct set (bounded by supplier cardinality, ~1e4 per
    SF) ships once via ray.put; the probe side filters with np.isin.  No
    all-to-all shuffle and the fact table is read with two columns only."""
    import ray

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_shipdate"])

    def recent_keys(b: pa.Table) -> pa.Table:
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)[ship >= _SEMI_SHIP_CUT]
        return pa.table({"l_suppkey": pa.array(np.unique(sk).astype(np.int64))})

    keys = (
        li.map_batches(recent_keys, batch_format="pyarrow", zero_copy_batch=True)
        .unique("l_suppkey")
    )
    keys_ref = ray.put(np.asarray(keys, dtype=np.int64))

    def semi(b: pa.Table) -> pa.Table:
        import ray as _ray

        kset = _ray.get(keys_ref)
        sk = b["s_suppkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(sk, kset)
        return pa.table(
            {
                "s_suppkey": pa.array(sk[keep].astype(np.int64)),
                "s_name": b["s_name"].filter(pa.array(keep)),
                "nationkey": pa.array(
                    b["s_nationkey"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
                ),
            }
        )

    return _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]).map_batches(
        semi, batch_format="pyarrow", zero_copy_batch=True
    )


def _sql_semi_join_suppliers() -> str:
    return """
    SELECT s_suppkey, s_name, cast(s_nationkey as bigint) AS nationkey
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-06-01'
    )
    """


def q_unpivot_part_attrs(sf_dir: str):
    """UNPIVOT (wide -> long melt): part's two numeric attributes stacked
    into (p_partkey, attr, val) rows.  Map-only — each batch emits its own
    stacked arrays (2x rows, zero shuffle), the long-format mirror of
    q_pivot_user_events."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def melt(b: pa.Table) -> pa.Table:
        pk = b["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        size = b["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.floor(
            b["p_retailprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        n = len(pk)
        return pa.table(
            {
                "p_partkey": pa.array(np.concatenate([pk, pk])),
                "attr": pa.array(["size"] * n + ["retail_cents"] * n),
                "val": pa.array(np.concatenate([size, cents])),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def _sql_unpivot_part_attrs() -> str:
    return """
    SELECT p_partkey, 'size' AS attr, cast(p_size as bigint) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'retail_cents' AS attr,
           cast(floor(p_retailprice * 100.0) as bigint) AS val FROM part
    """


def q_grouping_sets_orders(sf_dir: str):
    """GROUPING SETS ((priority), (status), ()) in ONE pass: each batch
    emits partial (count, cents) rows for every set tagged by its key
    columns ('*' = rolled up), so the groupby exchange carries
    O(|priorities| + |statuses| + 1) rows per batch instead of the table.
    Complements q_orders_rollup / q_orders_cube with the arbitrary-set
    shape."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "prio": b["o_orderpriority"].to_numpy(zero_copy_only=False),
                "stat": b["o_orderstatus"].to_numpy(zero_copy_only=False),
                "cents": np.floor(
                    b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
                ).astype(np.int64),
            }
        )
        by_p = df.groupby("prio", sort=False).agg(
            n=("cents", "size"), cents=("cents", "sum")
        ).reset_index()
        by_s = df.groupby("stat", sort=False).agg(
            n=("cents", "size"), cents=("cents", "sum")
        ).reset_index()
        return pa.table(
            {
                "k_priority": pa.array(
                    list(by_p["prio"].astype(str))
                    + ["*"] * (len(by_s) + 1)
                ),
                "k_status": pa.array(
                    ["*"] * len(by_p) + list(by_s["stat"].astype(str)) + ["*"]
                ),
                "n": pa.array(
                    np.concatenate(
                        [by_p["n"].to_numpy(), by_s["n"].to_numpy(), [len(df)]]
                    ).astype(np.int64)
                ),
                "cents": pa.array(
                    np.concatenate(
                        [
                            by_p["cents"].to_numpy(),
                            by_s["cents"].to_numpy(),
                            [df["cents"].sum()],
                        ]
                    ).astype(np.int64)
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["k_priority", "k_status"])
        .sum(["n", "cents"])
        .rename_columns({"sum(n)": "n", "sum(cents)": "cents"})
    )


def _sql_grouping_sets_orders() -> str:
    return """
    SELECT coalesce(o_orderpriority, '*') AS k_priority,
           coalesce(o_orderstatus, '*') AS k_status,
           count(*) AS n,
           cast(sum(cast(floor(o_totalprice * 100.0) as bigint)) as bigint) AS cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """


_REGEX_PATTERN = r"table\s+(key|part)"


def q_regex_match_rate(sf_dir: str):
    """Distributed regex filter: per-lang count of documents matching an
    RE2 pattern.  Arrow's match_substring_regex and DuckDB's
    regexp_matches both compile to RE2, so engine semantics are identical
    by construction; the scan is a two-column pruned read and the groupby
    exchange carries one (lang, n) partial row per batch."""
    ds = _read(sf_dir, "documents", ["lang", "text"])

    def partial(b: pa.Table) -> pa.Table:
        hit = pc.match_substring_regex(b["text"], _REGEX_PATTERN)
        langs = b["lang"].filter(hit)
        vals, counts = np.unique(
            np.asarray(langs.to_pandas(), dtype=object), return_counts=True
        )
        return pa.table(
            {
                "lang": pa.array([str(v) for v in vals]),
                "n_match": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .sum("n_match")
        .rename_columns({"sum(n_match)": "n_match"})
    )


def _sql_regex_match_rate() -> str:
    return f"""
    SELECT lang, count(*) AS n_match FROM documents
    WHERE regexp_matches(text, '{_REGEX_PATTERN}')
    GROUP BY lang
    """


SQL_QUERIES: dict[str, tuple] = {
    "pricing_summary": (q_pricing_summary, _sql_pricing_summary()),
    "revenue_by_nation": (q_revenue_by_nation, _sql_revenue_by_nation()),
    "top_orders": (q_top_orders, _sql_top_orders()),
    "distinct_segments": (q_distinct_segments, _sql_distinct_segments()),
    "event_windows": (q_event_windows, _sql_event_windows()),
    "tile_assign_z6": (q_tile_assign_z6, _sql_tile_assign(6)),
    "tile_assign_z10": (q_tile_assign_z10, _sql_tile_assign(10)),
    "hex_assign_r3": (q_hex_assign_r3, _sql_hex_assign_r3()),
    "hex_pyramid": (q_hex_pyramid, _sql_hex_pyramid()),
    "tile_bbox_z6": (q_tile_bbox_z6, _sql_tile_bbox_z6()),
    "pip_regions": (q_pip_regions, _sql_pip_regions()),
    "pip_actor": (q_pip_actor, _sql_pip_actor()),
    "knn_points": (q_knn_points, _sql_knn_points()),
    "knn_kring": (q_knn_kring, _sql_knn_kring()),
    "raster_pixel_counts": (q_raster_pixel_counts, _sql_raster_pixel_counts()),
    "sessionize": (q_sessionize, _sql_sessionize()),
    "parts_by_brand": (q_parts_by_brand, _sql_parts_by_brand()),
    "supplier_balance": (q_supplier_balance, _sql_supplier_balance()),
    "dedup_exact": (q_dedup_exact, _sql_dedup_exact()),
    "token_counts": (q_token_counts, _sql_token_counts()),
    "doc_stats": (q_doc_stats, _sql_doc_stats()),
    "lang_counts": (q_lang_counts, _sql_lang_counts()),
    "vocab_topk": (q_vocab_topk, _sql_vocab_topk()),
    "stratified_sample": (q_stratified_sample, _sql_stratified_sample()),
    "asof_join": (q_asof_join, _sql_asof_join()),
    "range_join_followups": (q_range_join_followups, _sql_range_join_followups()),
    "running_totals": (q_running_totals, _sql_running_totals()),
    "price_quantiles": (q_price_quantiles, _sql_price_quantiles()),
    "anti_join_customers": (q_anti_join_customers, _sql_anti_join_customers()),
    "topk_orders_per_customer": (
        q_topk_orders_per_customer,
        _sql_topk_orders_per_customer(),
    ),
    "orders_rollup": (q_orders_rollup, _sql_orders_rollup()),
    "train_split": (q_train_split, _sql_train_split()),
    "distinctive_terms": (q_distinctive_terms, _sql_distinctive_terms()),
    "doc_repetition": (q_doc_repetition, _sql_doc_repetition()),
    "pack_sequences": (q_pack_sequences, _sql_pack_sequences()),
    "events_retention": (q_events_retention, _sql_events_retention()),
    "user_top_event": (q_user_top_event, _sql_user_top_event()),
    "corr_moments": (q_corr_moments, _sql_corr_moments()),
    "pivot_user_events": (q_pivot_user_events, _sql_pivot_user_events()),
    "supplier_name_agg": (q_supplier_name_agg, _sql_supplier_name_agg()),
    "order_price_deciles": (q_order_price_deciles, _sql_order_price_deciles()),
    "signup_conversion": (q_signup_conversion, _sql_signup_conversion()),
    "order_line_join": (q_order_line_join, _sql_order_line_join()),
    "hll_distinct_users": (q_hll_distinct_users, _sql_hll_distinct_users()),
    "json_props_stats": (q_json_props_stats, _sql_json_props_stats()),
    "event_type_jaccard": (q_event_type_jaccard, _sql_event_type_jaccard()),
    "mad_prices": (q_mad_prices, _sql_mad_prices()),
    "event_trigrams": (q_event_trigrams, _sql_event_trigrams()),
    "orders_cube": (q_orders_cube, _sql_orders_cube()),
    "user_first_last": (q_user_first_last, _sql_user_first_last()),
    "orders_above_cust_avg": (q_orders_above_cust_avg, _sql_orders_above_cust_avg()),
    "hex_od_flows": (q_hex_od_flows, _sql_hex_od_flows()),
    "region_nearest": (q_region_nearest, _sql_region_nearest()),
    "moving_avg_spend": (q_moving_avg_spend, _sql_moving_avg_spend()),
    "price_percentiles_interp": (
        q_price_percentiles_interp,
        _sql_price_percentiles_interp(),
    ),
    "degree_histogram": (q_degree_histogram, _sql_degree_histogram()),
    "orders_by_month": (q_orders_by_month, _sql_orders_by_month()),
    "hll_by_event_type": (q_hll_by_event_type, _sql_hll_by_event_type()),
    "caption_word_stats": (q_caption_word_stats, _sql_caption_word_stats()),
    "cms_heavy_hitters": (q_cms_heavy_hitters, _sql_cms_heavy_hitters()),
    "bloom_membership": (q_bloom_membership, _sql_bloom_membership()),
    "user_travel": (q_user_travel, _sql_user_travel()),
    "ann_range_search": (q_ann_range_search, _sql_ann_range_search()),
    "doc_chunks": (q_doc_chunks, _sql_doc_chunks()),
    "dup_ngram_spans": (q_dup_ngram_spans, _sql_dup_ngram_spans()),
    "bm25_topk": (q_bm25_topk, _sql_bm25_topk()),
    "unigram_logprob": (q_unigram_logprob, _sql_unigram_logprob()),
    "weighted_sample": (q_weighted_sample, _sql_weighted_sample()),
    "nation_pagerank": (q_nation_pagerank, _sql_nation_pagerank()),
    "vocab_fuzzy_pairs": (q_vocab_fuzzy_pairs, _sql_vocab_fuzzy_pairs()),
    "orders_skyline": (q_orders_skyline, _sql_orders_skyline()),
    "user_event_entropy": (q_user_event_entropy, _sql_user_event_entropy()),
    "local_supplier_revenue": (q_local_supplier_revenue, _sql_local_supplier_revenue()),
    "bigram_pmi": (q_bigram_pmi, _sql_bigram_pmi()),
    "sfc_range_query": (q_sfc_range_query, _sql_sfc_range_query()),
    "events_anomaly": (q_events_anomaly, _sql_events_anomaly()),
    "corpus_sample_topk": (q_corpus_sample_topk, _sql_corpus_sample_topk()),
    "event_gaps": (q_event_gaps, _sql_event_gaps()),
    "nation_setops": (q_nation_setops, _sql_nation_setops()),
    "customer_order_coverage": (
        q_customer_order_coverage,
        _sql_customer_order_coverage(),
    ),
    "image_size_stats": (q_image_size_stats, _sql_image_size_stats()),
    "quadkey_tiles": (q_quadkey_tiles, _sql_quadkey_tiles()),
    "geo_radius_join": (q_geo_radius_join, _sql_geo_radius_join()),
    "hex_ring_density": (q_hex_ring_density, _sql_hex_ring_density()),
    "image_exact_dedup": (q_image_exact_dedup, _sql_image_exact_dedup()),
    "audio_exact_dedup": (q_audio_exact_dedup, _sql_audio_exact_dedup()),
    "ann_cosine_top5": (q_ann_cosine_top5, _sql_ann_cosine_top5()),
    "decontaminate": (q_decontaminate, _sql_decontaminate()),
    "inverted_index": (q_inverted_index, _sql_inverted_index()),
    "zipf_fit": (q_zipf_fit, _sql_zipf_fit()),
    "chi2_terms": (q_chi2_terms, _sql_chi2_terms()),
    "tile_compaction": (q_tile_compaction, _sql_tile_compaction()),
    "bigram_logprob": (q_bigram_logprob, _sql_bigram_logprob()),
    "tile_pyramid_counts": (q_tile_pyramid_counts, _sql_tile_pyramid_counts()),
    "trade_triangles": (q_trade_triangles, _sql_trade_triangles()),
    "tile_downsample": (q_tile_downsample, _sql_tile_downsample()),
    "embedding_sq8": (q_embedding_sq8, _sql_embedding_sq8()),
    "lang_length_median": (q_lang_length_median, _sql_lang_length_median()),
    "llm_data_prep": (q_llm_data_prep, _sql_llm_data_prep()),
    "event_lateness": (q_event_lateness, _sql_event_lateness()),
    "user_coverage_time": (q_user_coverage_time, _sql_user_coverage_time()),
    "dq_orphans": (q_dq_orphans, _sql_dq_orphans()),
    "brand_hhi": (q_brand_hhi, _sql_brand_hhi()),
    "image_aspect_stats": (q_image_aspect_stats, _sql_image_aspect_stats()),
    "balance_langs": (q_balance_langs, _sql_balance_langs()),
    "assoc_rules": (q_assoc_rules, _sql_assoc_rules()),
    "price_trend_by_flag": (q_price_trend_by_flag, _sql_price_trend_by_flag()),
    "embedding_norm_stats": (q_embedding_norm_stats, _sql_embedding_norm_stats()),
    "tile_skew_profile": (q_tile_skew_profile, _sql_tile_skew_profile()),
    "geo_serving_prep": (q_geo_serving_prep, _sql_geo_serving_prep()),
    "order_line_join_native": (q_order_line_join_native, _sql_order_line_join()),
    "trailing_spend": (q_trailing_spend, _sql_trailing_spend()),
    "segment_cume_dist": (q_segment_cume_dist, _sql_segment_cume_dist()),
    "topk_orders_with_ties": (q_topk_orders_with_ties, _sql_topk_orders_with_ties()),
    "orders_daily_dense": (q_orders_daily_dense, _sql_orders_daily_dense()),
    "embedding_label_stats": (q_embedding_label_centroid_norms, _sql_embedding_label()),
    "promo_revenue": (q_promo_revenue, _sql_promo_revenue()),
    "cust_order_histogram": (q_cust_order_histogram, _sql_cust_order_histogram()),
    "orders_late_priority": (q_orders_late_priority, _sql_orders_late_priority()),
    "nation_bfs_hops": (q_nation_bfs_hops, _sql_nation_bfs_hops()),
    "sliding_distinct_users": (q_sliding_distinct_users, _sql_sliding_distinct_users()),
    "table_profile": (q_table_profile, _sql_table_profile()),
    "market_share": (q_market_share, _sql_market_share()),
    "event_type_markov": (q_event_type_markov, _sql_event_type_markov()),
    "part_best_supplier": (q_part_best_supplier, _sql_part_best_supplier()),
    "phash_bit_stats": (q_phash_bit_stats, _sql_phash_bit_stats()),
    "supplier_order_overlap": (q_supplier_order_overlap, _sql_supplier_order_overlap()),
    "idle_rich_customers": (q_idle_rich_customers, _sql_idle_rich_customers()),
    "order_interarrival_median": (
        q_order_interarrival_median,
        _sql_order_interarrival_median(),
    ),
    "image_dedup_savings": (q_image_dedup_savings, _sql_image_dedup_savings()),
    "quantile_sketch_prices": (q_quantile_sketch_prices, _sql_quantile_sketch_prices()),
    "neardup_rate_by_source": (q_neardup_rate_by_source, _sql_neardup_rate_by_source()),
    "user_activity_islands": (q_user_activity_islands, _sql_user_activity_islands()),
    "geohash_counts": (q_geohash_counts, _sql_geohash_counts()),
    "neardup_containment": (q_neardup_containment, _sql_neardup_containment()),
    "cluster_caption_consistency": (
        q_cluster_caption_consistency,
        _sql_cluster_caption_consistency(),
    ),
    "orders_seasonality": (q_orders_seasonality, _sql_orders_seasonality()),
    "ann_recall_eval": (q_ann_recall_eval, _sql_ann_recall_eval()),
    "ann_multiprobe_top5": (q_ann_multiprobe_top5, _sql_ann_multiprobe_top5()),
    "semi_join_suppliers": (q_semi_join_suppliers, _sql_semi_join_suppliers()),
    "unpivot_part_attrs": (q_unpivot_part_attrs, _sql_unpivot_part_attrs()),
    "grouping_sets_orders": (q_grouping_sets_orders, _sql_grouping_sets_orders()),
    "regex_match_rate": (q_regex_match_rate, _sql_regex_match_rate()),
}


def _register_promoted() -> None:
    """Queries promoted from rows-only to SQL-oracle (VERDICT r1 #4): the
    Ray implementations live in pipelines.rows_only; the oracles above
    recompute the same documented hash/heuristic kernels in DuckDB."""
    from . import rows_only as _ro

    SQL_QUERIES.update(
        {
            "phash_dedup": (_ro.q_phash_dedup, _sql_phash_dedup()),
            "phash_neardup": (_ro.q_phash_neardup, _sql_phash_neardup()),
            "image_phash_clusters": (
                _ro.q_image_phash_clusters,
                _sql_image_phash_clusters(),
            ),
            "doc_fingerprints": (_ro.q_doc_fingerprints, _sql_doc_fingerprints()),
            "simhash_docs": (_ro.q_simhash_docs, _sql_simhash_docs()),
            "quality_scores": (_ro.q_quality_scores, _sql_quality_scores()),
            "langid_detect": (_ro.q_langid_detect, _sql_langid_detect()),
            "ann_lsh_buckets": (_ro.q_ann_lsh_buckets, _sql_ann_lsh_buckets()),
            "embedding_neardup": (_ro.q_embedding_neardup, _sql_embedding_neardup()),
            "minhash_lsh_pairs": (_ro.q_minhash_lsh_pairs, _sql_minhash_lsh_pairs()),
            "neardup_verified": (_ro.q_neardup_verified, _sql_neardup_verified()),
            "embedding_neardup_lsh": (
                _ro.q_embedding_neardup_lsh,
                _sql_embedding_neardup_lsh(),
            ),
            "simhash_neardup": (_ro.q_simhash_neardup, _sql_simhash_neardup()),
            "neardup_clusters": (_ro.q_neardup_clusters, _sql_neardup_clusters()),
            "geo_grid_dbscan": (_ro.q_geo_grid_dbscan, _sql_geo_grid_dbscan()),
        }
    )


_register_promoted()


def corpus_sql(sf: float) -> dict[str, str]:
    """The image-corpus oracles are sf-parametrized (they read the
    synthesized corpus parquet directly, not a driver view): the
    registered strings in SQL_QUERIES are baked for the driver's sf=0.01;
    callers checking another scale (tests at 0.001, the gate CLI at an
    arbitrary --sf) rebuild them here. Single source of truth for the
    test harness and ``cov_tiles_ray.gate``.

    embedding_neardup_lsh is also rebuilt: its plane-table width derives
    from the embeddings row count (rows_only.neardup_lsh_num_bits), which
    is 2000 at sf0.1 — a different width than the sf0.01 registration
    default (ADVICE r4)."""
    import pyarrow.parquet as _pq

    emb_path = f"/root/testdata/sf{sf:g}/embeddings.parquet"
    try:
        n_vecs = int(_pq.read_metadata(emb_path).num_rows)
    except Exception:
        n_vecs = 500  # driver sf0.01 / sf0.001 row count
    return {
        "embedding_neardup_lsh": _sql_embedding_neardup_lsh(n_vecs),
        "phash_dedup": _sql_phash_dedup(sf),
        "phash_neardup": _sql_phash_neardup(sf),
        "image_phash_clusters": _sql_image_phash_clusters(sf),
        "phash_bit_stats": _sql_phash_bit_stats(sf),
        "image_dedup_savings": _sql_image_dedup_savings(sf),
        "cluster_caption_consistency": _sql_cluster_caption_consistency(sf),
        "image_exact_dedup": _sql_image_exact_dedup(sf),
        "audio_exact_dedup": _sql_audio_exact_dedup(sf),
        "image_size_stats": _sql_image_size_stats(sf),
        "image_aspect_stats": _sql_image_aspect_stats(sf),
        "caption_word_stats": _sql_caption_word_stats(sf),
        "geo_grid_dbscan": _sql_geo_grid_dbscan(sf),
    }

