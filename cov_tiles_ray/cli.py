"""CLI adapter — reference parity for CovtCliAdapter.main
(evaluation/java/src/main/java/com/covt/CovtCliAdapter.java:23-44): fetch
one tile from an MBTiles file, transcode MVT -> COVT, write ``{z}_{x}_{y}.covt``.

Single-tile tool: reads one row via sqlite and never starts Ray (guarded
init would be wasted on one tile).  Usage:

    python -m cov_tiles_ray.cli --filename tiles.mbtiles -z 6 -x 32 -y 41 [-o outdir]
"""

from __future__ import annotations

import argparse
import gzip
import os
import sqlite3


def fetch_tile(path: str, z: int, x: int, y: int) -> bytes | None:
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        row = con.execute(
            "SELECT tile_data FROM tiles WHERE zoom_level=? AND tile_column=? AND tile_row=?",
            (z, x, (1 << z) - 1 - y),  # TMS flip
        ).fetchone()
    finally:
        con.close()
    if row is None:
        return None
    buf = row[0]
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)
    return buf


def main_transcode_dir(argv: list[str]) -> int:
    """Distributed directory transcode: MVT tiles in, reference-readable
    ``.covt`` tiles out (resumable — existing outputs are skipped).

        python -m cov_tiles_ray.cli transcode-dir --in-dir test/fixtures/omt/mvt \\
            --out-dir /tmp/covt [--layout ref|new|covtr] [--num-cpus N]
    """
    import json

    ap = argparse.ArgumentParser(description=main_transcode_dir.__doc__)
    ap.add_argument("--in-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--layout", choices=("ref", "new", "covtr"), default="ref")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from .pipelines.transcode import transcode_dir_to_covt

    summary = transcode_dir_to_covt(args.in_dir, args.out_dir, layout=args.layout)
    print(json.dumps(summary))
    ray.shutdown()
    return 0 if summary["ok"] == summary["tiles"] else 1


def main(argv: list[str] | None = None) -> int:
    import sys

    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "transcode-dir":
        return main_transcode_dir(argv[1:])
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--filename", required=True, help="MBTiles file")
    ap.add_argument("-z", type=int, required=True)
    ap.add_argument("-x", type=int, required=True)
    ap.add_argument("-y", type=int, required=True)
    ap.add_argument("-o", "--out-dir", default=".")
    args = ap.parse_args(argv)

    from .sources import mvt as mvt_codec
    from .tile import encode_tile

    mvt_buf = fetch_tile(args.filename, args.z, args.x, args.y)
    if mvt_buf is None:
        print(f"tile {args.z}/{args.x}/{args.y} not found in {args.filename}")
        return 1
    layers = mvt_codec.decode_mvt_tile_best(mvt_buf)
    covt = encode_tile(layers)
    out = os.path.join(args.out_dir, f"{args.z}_{args.x}_{args.y}.covt")
    with open(out, "wb") as f:
        f.write(covt)
    print(f"{out}: {len(mvt_buf)} mvt bytes -> {len(covt)} covt bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
