"""Gate rehearsal CLI — one-command reproduction of the driver's
correctness gate (VERDICT r3 next-round #6).

Runs EVERY registered SQL-oracle query side-by-side with its DuckDB
oracle at the requested scale factor and records the driver's
rows/schema/value-hash protocol per query; optionally runs the
rows-only registry as a weaker ran/rows check. Writes the result to
``GATE_REHEARSAL.json`` at the repo root (or ``--out``).

Usage::

    python -m cov_tiles_ray.gate --sf 0.01
    python -m cov_tiles_ray.gate --sf 0.001 --rows-only --out /tmp/gate.json

This module owns its Ray session (guarded init) — the library itself
never calls ``ray.init``.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time

import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns), ignore_index=True)
    return df


def _value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive exact value hash: columns sorted by name, rows
    sorted by all columns, each column canonicalized (ints/bools ->
    int64 bytes, floats -> float64 bytes, datetimes -> ns int64,
    everything else -> utf-8 of str) and md5'd together."""
    h = hashlib.md5()
    for c in df.columns:
        v = df[c]
        k = v.dtype.kind
        h.update(c.encode())
        if k in "iub":
            h.update(v.to_numpy(np.int64).tobytes())
        elif k == "f":
            h.update(v.to_numpy(np.float64).tobytes())
        elif k == "M":
            h.update(v.to_numpy("datetime64[ns]").astype(np.int64).tobytes())
        else:
            h.update("\x1f".join(map(str, v.tolist())).encode())
    return h.hexdigest()


def _duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def run_gate(sf: float, sf_dir: str | None = None, rows_only: bool = False,
             names: list[str] | None = None) -> dict:
    from cov_tiles_ray.pipelines.queries import SQL_QUERIES, corpus_sql
    from cov_tiles_ray.sources import synth

    sf_dir = sf_dir or f"/root/testdata/sf{sf:g}"
    synth.images_parquet_path(sf)  # corpus cache for both engines
    synth.audio_parquet_path(sf)
    csql = corpus_sql(sf)
    con = _duck(sf_dir)
    results: dict[str, dict] = {}
    t_total = time.time()
    for name in sorted(SQL_QUERIES):
        if names and name not in names:
            continue
        fn, sql = SQL_QUERIES[name]
        sql = csql.get(name, sql)
        rec: dict = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.time()
        try:
            got = _normalize(_to_df(fn(sf_dir)))
            want = _normalize(con.execute(sql).fetchdf())
            rec["spark_rows"] = int(len(got))
            rec["oracle_rows"] = int(len(want))
            rec["rows_match"] = len(got) == len(want)
            rec["schema_match"] = list(got.columns) == list(want.columns)
            rec["hash_match"] = (
                rec["rows_match"]
                and rec["schema_match"]
                and _value_hash(got) == _value_hash(want)
            )
        except Exception as e:  # record, keep going — the gate is a census
            rec["err"] = f"{type(e).__name__}: {e}"
        rec["sec"] = round(time.time() - t0, 3)
        results[name] = rec
        status = "PASS" if rec["hash_match"] else "FAIL"
        print(f"[gate] {name}: {status} ({rec['sec']}s)", flush=True)

    if rows_only:
        from cov_tiles_ray.pipelines.rows_only import ROWS_ONLY_QUERIES

        slow = {"covt_compression", "omt_fixture_transcode"}
        for name, fn in sorted(ROWS_ONLY_QUERIES.items()):
            if names and name not in names:
                continue
            if name in slow and not names:
                results[name] = {"rows_only": True, "skipped": "slow", "err": None}
                continue
            t0 = time.time()
            rec = {"rows_only": True, "rows": None, "err": None}
            try:
                rec["rows"] = int(len(_to_df(fn(sf_dir))))
            except Exception as e:
                rec["err"] = f"{type(e).__name__}: {e}"
            rec["sec"] = round(time.time() - t0, 3)
            results[name] = rec
            print(f"[gate] {name}: rows={rec['rows']} ({rec['sec']}s)", flush=True)

    con.close()
    n_sql = sum(1 for r in results.values() if "hash_match" in r)
    n_pass = sum(1 for r in results.values() if r.get("hash_match"))
    return {
        "sf": sf,
        "sf_dir": sf_dir,
        "sql_total": n_sql,
        "sql_pass": n_pass,
        "rows_only_ran": sum(1 for r in results.values() if r.get("rows_only")),
        "sec_total": round(time.time() - t_total, 1),
        "results": results,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--rows-only", action="store_true",
                    help="also run the rows-only registry (weaker ran/rows check)")
    ap.add_argument("--query", action="append", default=None,
                    help="restrict to named queries (repeatable)")
    ap.add_argument("--out", default="GATE_REHEARSAL.json")
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True)
    try:
        report = run_gate(args.sf, args.sf_dir, args.rows_only, args.query)
    finally:
        ray.shutdown()
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"[gate] {report['sql_pass']}/{report['sql_total']} SQL oracles pass; "
          f"wrote {args.out} ({report['sec_total']}s)")
    return 0 if report["sql_pass"] == report["sql_total"] else 1


if __name__ == "__main__":
    sys.exit(main())
