"""Driver contract for the cov_tiles_ray engine (Ray Data target).

The driver initialises Ray BEFORE importing this module; nothing here (or
in the library) calls ``ray.init``/``ray.shutdown``.

* ``entry()`` — flagship pipeline on /root/testdata/sf0.001: synthesize the
  image+caption corpus (BASELINE.json input_hint schema), assign web-mercator
  tiles + hex cells, shuffle by tile, pack COVT-R tiles, decode-verify.
* ``queries()`` — one callable per implemented operator family
  (SURVEY.md §2); SQL-checkable ones have a matching ``oracle_sql()`` entry,
  the rest are rows-only (codec round-trips, sketches, image validation).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: sf0.001 corpus -> tile assignment -> COVT tiles (verified)."""
    from cov_tiles_ray.pipelines import tiling

    images = tiling.read_images(0.001, columns=tiling.LIGHT_COLUMNS)
    # with_cells: every tile carries a points layer AND a derived polygon
    # (occupancy-grid) layer, so ICE + ring offsets run distributed
    tiles = tiling.build_tiles(images, z=6, with_cells=True)
    return tiles


def queries() -> dict[str, Callable[[str], Any]]:
    from cov_tiles_ray.pipelines import rows_only
    from cov_tiles_ray.pipelines.queries import SQL_QUERIES

    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in SQL_QUERIES.items()
    }
    out.update(rows_only.ROWS_ONLY_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from cov_tiles_ray.pipelines.queries import SQL_QUERIES
    from cov_tiles_ray.sources import synth

    # phash_dedup's oracle reads the synthesized image-corpus parquet
    # directly (it is not a driver-registered view); make sure the sf0.01
    # cache exists whichever side (Ray query / DuckDB oracle) runs first.
    synth.images_parquet_path(0.01)
    return {name: sql for name, (_fn, sql) in SQL_QUERIES.items()}
