"""Spatial indexing kernels: web-mercator z/x/y tiles, hex cells + k-ring,
point-in-polygon ray casting.  All vectorized numpy; no geo libraries.

These are the engine extensions the tiling engine needs beyond the
reference's per-tile codecs (SURVEY.md §2.5 note, §7.0 item 4): the
reference consumes pre-tiled MVT corpora, while this engine *assigns*
records to tiles/cells itself and joins them spatially.

The hex grid is an H3-STYLE hierarchical hexagon index, not Uber H3 (the
h3 library is not available here and its exact cell boundaries are an
implementation detail): a flat-top axial hex grid on the web-mercator
plane whose cell size shrinks by sqrt(7) per resolution (H3's aperture),
with k-ring neighborhoods and parent containment by center lookup.  It is
deterministic, documented, and SQL-expressible for the correctness oracle.
"""

from __future__ import annotations

import numpy as np

WEBMERCATOR_MAX_LAT = 85.05112878

# hex grid base size (fraction of the unit mercator square at res 0)
HEX_SIZE0 = 0.3
SQRT7 = 7.0**0.5
SQRT3 = 3.0**0.5


# ---------------------------------------------------------------------------
# web-mercator tiles
# ---------------------------------------------------------------------------


def mercator_xy(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat degrees -> normalized web-mercator (mx, my) in [0, 1).

    my formula is written as ``(1 - ln(tan(phi) + 1/cos(phi))/pi) / 2`` —
    keep the exact operation order in sync with the DuckDB oracle SQL
    (__ray_entry__.oracle_sql) so both sides compute bit-identical doubles.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -WEBMERCATOR_MAX_LAT, WEBMERCATOR_MAX_LAT)
    mx = (lon + 180.0) / 360.0
    phi = np.radians(lat)
    my = (1.0 - np.log(np.tan(phi) + 1.0 / np.cos(phi)) / np.pi) / 2.0
    return mx, my


def lonlat_to_tile(lon: np.ndarray, lat: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    """Assign lon/lat to web-mercator tile (x, y) at zoom ``z``."""
    mx, my = mercator_xy(lon, lat)
    n = 1 << z
    tx = np.clip(np.floor(mx * n), 0, n - 1).astype(np.int32)
    ty = np.clip(np.floor(my * n), 0, n - 1).astype(np.int32)
    return tx, ty


def tile_local_coords(
    lon: np.ndarray, lat: np.ndarray, z: int, extent: int = 4096
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(tile_x, tile_y, local_x, local_y) — local coords on the tile's
    integer grid [0, extent) like MVT tile-local geometry."""
    mx, my = mercator_xy(lon, lat)
    n = 1 << z
    fx = mx * n
    fy = my * n
    tx = np.clip(np.floor(fx), 0, n - 1).astype(np.int32)
    ty = np.clip(np.floor(fy), 0, n - 1).astype(np.int32)
    lx = np.clip(np.floor((fx - tx) * extent), 0, extent - 1).astype(np.int32)
    ly = np.clip(np.floor((fy - ty) * extent), 0, extent - 1).astype(np.int32)
    return tx, ty, lx, ly


def pack_tile_id(z, x, y) -> np.ndarray:
    """(z, x, y) -> int64: z * 2^58 + x * 2^29 + y  (SQL-expressible)."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return z * (1 << 58) + x * (1 << 29) + y


def unpack_tile_id(tile_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    t = np.asarray(tile_id, dtype=np.int64)
    z = t >> 58
    x = (t >> 29) & ((1 << 29) - 1)
    y = t & ((1 << 29) - 1)
    return z.astype(np.int32), x.astype(np.int32), y.astype(np.int32)


# ---------------------------------------------------------------------------
# hex grid (H3-style)
# ---------------------------------------------------------------------------


def hex_cell_size(res: int) -> float:
    return HEX_SIZE0 / (SQRT7**res)


def _axial_from_xy(mx: np.ndarray, my: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Web-mercator unit square -> fractional flat-top axial (q, r)."""
    size = hex_cell_size(res)
    q = (2.0 / 3.0 * mx) / size
    r = (-1.0 / 3.0 * mx + SQRT3 / 3.0 * my) / size
    return q, r


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Round fractional axial coords to the containing hex (cube rounding).

    Rounding is ``floor(x + 0.5)`` (not numpy's banker's rounding) so the
    DuckDB correctness oracle can express the identical operation.
    """
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    fix_z = ~fix_x & ~fix_y
    rx = np.where(fix_x, -ry - rz, rx)
    ry = np.where(fix_y, -rx - rz, ry)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


_HEX_OFF = 1 << 25  # q/r offset so packed ids are positive


def pack_hex_id(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    """(res, q, r) -> int64: res * 2^52 + (q+2^25) * 2^26 + (r+2^25)."""
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    return np.int64(res) * (1 << 52) + (q + _HEX_OFF) * (1 << 26) + (r + _HEX_OFF)


def unpack_hex_id(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    c = np.asarray(cell, dtype=np.int64)
    res = c >> 52
    q = ((c >> 26) & ((1 << 26) - 1)) - _HEX_OFF
    r = (c & ((1 << 26) - 1)) - _HEX_OFF
    return res.astype(np.int32), q, r


def lonlat_to_hex(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Assign lon/lat to a hex cell id at resolution ``res`` (0-15)."""
    mx, my = mercator_xy(lon, lat)
    qf, rf = _axial_from_xy(mx, my, res)
    q, r = _cube_round(qf, rf)
    return pack_hex_id(res, q, r)


def hex_center_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Hex cell -> center in normalized mercator coords."""
    res, q, r = unpack_hex_id(cell)
    size = HEX_SIZE0 / (SQRT7 ** res.astype(np.float64))
    mx = size * (3.0 / 2.0 * q)
    my = size * (SQRT3 / 2.0 * q + SQRT3 * r)
    return mx, my


def hex_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Containing cell at a coarser resolution (by center containment —
    H3's parent relation is likewise approximate across apertures)."""
    mx, my = hex_center_xy(cell)
    qf, rf = _axial_from_xy(mx, my, parent_res)
    q, r = _cube_round(qf, rf)
    return pack_hex_id(parent_res, q, r)


def hex_distance(cell_a: np.ndarray, cell_b: np.ndarray) -> np.ndarray:
    """Hex grid distance between cells of the SAME resolution."""
    ra, qa, aa = unpack_hex_id(cell_a)
    rb, qb, ab = unpack_hex_id(cell_b)
    dq = qa - qb
    dr = aa - ab
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def k_ring_offsets(k: int) -> np.ndarray:
    """All axial (dq, dr) within hex distance k — shape (1+3k(k+1), 2)."""
    offs = []
    for dq in range(-k, k + 1):
        for dr in range(max(-k, -dq - k), min(k, -dq + k) + 1):
            offs.append((dq, dr))
    return np.array(offs, dtype=np.int64)


def k_ring(cells: np.ndarray, k: int) -> np.ndarray:
    """k-ring expansion: for each input cell, all cells within distance k.

    Returns shape (len(cells), 1+3k(k+1)) of packed cell ids; flatten for a
    flat_map-style explode.
    """
    res, q, r = unpack_hex_id(np.atleast_1d(cells))
    offs = k_ring_offsets(k)
    qq = q[:, None] + offs[None, :, 0]
    rr = r[:, None] + offs[None, :, 1]
    # all inputs must share one resolution for a meaningful ring
    return pack_hex_id(int(res[0]), qq, rr)


# ---------------------------------------------------------------------------
# point-in-polygon (ray casting over packed rings)
# ---------------------------------------------------------------------------


def points_in_rings(
    px: np.ndarray,
    py: np.ndarray,
    ring_x: np.ndarray,
    ring_y: np.ndarray,
    ring_offsets: np.ndarray,
) -> np.ndarray:
    """Even-odd ray cast of points against a polygon's rings.

    ``ring_offsets`` are vertex counts per ring (COVT convention: counts,
    not absolute offsets; closing vertex implied).  Holes fall out of the
    even-odd rule automatically.  Edges follow the half-open rule
    ``(y1 > py) != (y2 > py)`` so shared edges are counted once; boundary
    points are not guaranteed either way (matches typical ray casters).
    Vectorized: edges x points in one broadcast (fine for per-tile polygon
    sizes; the Ray stage blocks over points).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(len(px), dtype=bool)
    pos = 0
    for cnt in np.asarray(ring_offsets, dtype=np.int64):
        cnt = int(cnt)
        rx = np.asarray(ring_x[pos : pos + cnt], dtype=np.float64)
        ry = np.asarray(ring_y[pos : pos + cnt], dtype=np.float64)
        pos += cnt
        if cnt < 3:
            continue
        x1, y1 = rx, ry
        x2, y2 = np.roll(rx, -1), np.roll(ry, -1)  # implied closing edge
        # broadcast edges (m) x points (n)
        cond = (y1[:, None] > py[None, :]) != (y2[:, None] > py[None, :])
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (py[None, :] - y1[:, None]) / (y2[:, None] - y1[:, None])
            xint = x1[:, None] + t * (x2[:, None] - x1[:, None])
        crossings = (cond & (px[None, :] < xint)).sum(axis=0)
        inside ^= (crossings % 2).astype(bool)
    return inside


def rings_bbox(ring_x, ring_y) -> tuple[float, float, float, float]:
    rx = np.asarray(ring_x, dtype=np.float64)
    ry = np.asarray(ring_y, dtype=np.float64)
    return float(rx.min()), float(ry.min()), float(rx.max()), float(ry.max())


def haversine_km(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in km (vectorized)."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(a, dtype=np.float64)) for a in (lon1, lat1, lon2, lat2))
    dlon = lon2 - lon1
    dlat = lat2 - lat1
    h = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2
    return 6371.0088 * 2.0 * np.arcsin(np.sqrt(h))


def douglas_peucker_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification: boolean keep-mask over the
    input vertex order.  Iterative stack form of the classic recursion;
    distance is the perpendicular distance to the LINE through the
    segment endpoints (the textbook DP metric), falling back to point
    distance when the endpoints coincide.  Ties on the max distance keep
    the earliest index (np.argmax), so the output is deterministic."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        dx, dy = x[j] - x[i], y[j] - y[i]
        px, py = x[i + 1 : j], y[i + 1 : j]
        norm = float(np.hypot(dx, dy))
        if norm == 0.0:
            d = np.hypot(px - x[i], py - y[i])
        else:
            d = np.abs(dx * (py - y[i]) - dy * (px - x[i])) / norm
        k = int(np.argmax(d))
        if float(d[k]) > eps:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep
