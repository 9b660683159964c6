"""MBTiles (SQLite) source / sink — the reference's S1/S2 operators.

The reference reads tiles from MBTiles with a per-process SQLite handle
(``MvtUtils.java:27-41``; TS repository with metadata table
``mbTilesRepository.ts:17-85``) and gunzips ``tile_data``.  Ray-Data-native
shape:

* ``write_mbtiles`` — one writer per file (SQLite is single-writer); tiles
  arrive as an iterator of batches so the dataset never materializes on the
  driver beyond one batch.
* ``MbtilesTileFetcher`` — ACTOR-POOL ``map_batches`` stage holding the
  sqlite connection open across batches (the canonical stateful-stage A5
  pattern, SURVEY.md §2.4): input is a Dataset of ``(z, x, y)`` keys, output
  adds gunzipped ``mvt`` bytes.
* ``read_mbtiles`` — keys from one driver-side index scan (tiny: 3 ints per
  tile) -> ``from_pandas`` -> actor-pool fetch; tile payloads only ever
  exist inside worker batches.

MBTiles stores rows in TMS orientation: ``tile_row = (2^z - 1) - y``
(flip on both paths).
"""

from __future__ import annotations

import gzip
import os
import sqlite3

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_SCHEMA_SQL = (
    "CREATE TABLE IF NOT EXISTS metadata (name text, value text);"
    "CREATE TABLE IF NOT EXISTS tiles (zoom_level integer, tile_column integer,"
    " tile_row integer, tile_data blob);"
    "CREATE UNIQUE INDEX IF NOT EXISTS tile_index ON tiles"
    " (zoom_level, tile_column, tile_row);"
)


def write_mbtiles(
    tiles: rd.Dataset,
    path: str,
    *,
    tile_col: str = "mvt",
    metadata: dict[str, str] | None = None,
    gzip_payload: bool = True,
) -> int:
    """Write a tile Dataset (columns z, x, y, ``tile_col``) to an MBTiles
    file.  Streams batch-by-batch (SQLite is single-writer, so this is the
    one legitimately driver-side sink; the tile table is the compact result
    of the pipeline, not the input corpus).  Returns the tile count."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.executescript(_SCHEMA_SQL)
    meta = {"name": "cov_tiles_ray", "format": "pbf", **(metadata or {})}
    con.executemany("INSERT INTO metadata VALUES (?, ?)", sorted(meta.items()))
    n = 0
    for batch in tiles.iter_batches(batch_format="pyarrow", batch_size=4096):
        z = batch["z"].to_numpy(zero_copy_only=False)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        data = batch[tile_col]
        rows = []
        for i in range(batch.num_rows):
            buf = data[i].as_py()
            if gzip_payload:
                buf = gzip.compress(buf, compresslevel=6)
            rows.append((int(z[i]), int(x[i]), (1 << int(z[i])) - 1 - int(y[i]), buf))
        con.executemany("INSERT OR REPLACE INTO tiles VALUES (?, ?, ?, ?)", rows)
        n += len(rows)
    con.commit()
    con.close()
    return n


def read_metadata(path: str) -> dict[str, str]:
    con = sqlite3.connect(path)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()


class MbtilesTileFetcher:
    """Actor-pool stage: sqlite connection opened ONCE per actor in
    ``__init__`` (never per batch), batches of (z,x,y) keys in, gunzipped
    tile bytes out.  Reference analogue: the per-process MBTiles handle
    (A5, ``MvtUtils.java:30-38``)."""

    def __init__(self, path: str):
        # Ray map workers run __call__ on a pool thread distinct from
        # __init__'s; the connection is read-only and calls are serialized
        # per actor, so cross-thread use is safe.
        self._con = sqlite3.connect(f"file:{path}?mode=ro", uri=True, check_same_thread=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        z = batch["z"].to_numpy(zero_copy_only=False)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        out = []
        cur = self._con.cursor()
        for i in range(batch.num_rows):
            row = cur.execute(
                "SELECT tile_data FROM tiles WHERE zoom_level=? AND tile_column=?"
                " AND tile_row=?",
                (int(z[i]), int(x[i]), (1 << int(z[i])) - 1 - int(y[i])),
            ).fetchone()
            buf = row[0] if row else b""
            # per-tile magic-byte sniff rather than trusting the metadata
            # `format` row: foreign MBTiles store uncompressed pbf with
            # format='pbf', and gzip_payload=False writers exist
            if buf[:2] == b"\x1f\x8b":
                buf = gzip.decompress(buf)
            out.append(buf)
        return batch.append_column("mvt", pa.array(out, pa.binary()))


def read_mbtiles(path: str, concurrency: int = 4) -> rd.Dataset:
    """MBTiles file -> Dataset of (z, x, y, mvt).  The key scan is a single
    tiny index read (3 ints per tile); payload fetch is distributed across
    an actor pool holding read-only connections."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    keys = con.execute("SELECT zoom_level, tile_column, tile_row FROM tiles").fetchall()
    con.close()
    z = np.array([k[0] for k in keys], dtype=np.int32)
    flipped = np.array([(1 << int(k[0])) - 1 - k[2] for k in keys], dtype=np.int32)
    df = pd.DataFrame(
        {"z": z, "x": np.array([k[1] for k in keys], dtype=np.int32), "y": flipped}
    )
    ds = rd.from_pandas(df)
    return ds.map_batches(
        MbtilesTileFetcher,
        fn_constructor_args=(path,),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )
