"""Raster <-> vector bridge kernels (north-rule extension; the reference has
no raster ops — tile-pixel polygonize / rasterize are engine additions named
by BASELINE.json `north_star`).

All kernels are per-tile (pixel grids <= 256^2) and run inside
``map_batches``; the only Python loops are over boundary *edges* of a mask,
never over pixels.

* ``rasterize_points`` — point counts on a pixel grid (np.bincount).
* ``rasterize_rings`` — even-odd scanline polygon fill, vectorized over all
  edge/row crossings at once (pixel-center sampling: row y is filled where
  the ring boundary has odd crossing parity at y + 0.5).
* ``polygonize_mask`` — boolean mask -> rectilinear boundary rings on the
  pixel-corner grid.  Exact inverse of ``rasterize_rings`` under even-odd
  fill (holes come out as separate rings and cancel by parity).
* ``label_components`` — 4-connected component labeling (min-propagation).
"""

from __future__ import annotations

import numpy as np


def pixel_coords(mx: np.ndarray, my: np.ndarray, grid: int) -> tuple[np.ndarray, np.ndarray]:
    """Normalized mercator [0,1) -> integer pixel coords on a grid^2 raster."""
    px = np.clip(np.floor(mx * grid), 0, grid - 1).astype(np.int64)
    py = np.clip(np.floor(my * grid), 0, grid - 1).astype(np.int64)
    return px, py


def rasterize_points(px: np.ndarray, py: np.ndarray, width: int, height: int) -> np.ndarray:
    """Count points per pixel -> (height, width) int64 raster."""
    flat = py.astype(np.int64) * width + px.astype(np.int64)
    counts = np.bincount(flat, minlength=width * height)
    return counts.reshape(height, width)


def rasterize_rings(
    ring_x: np.ndarray,
    ring_y: np.ndarray,
    ring_offsets: np.ndarray,
    width: int,
    height: int,
) -> np.ndarray:
    """Even-odd scanline fill of one or more rings (closing edge implied).

    ``ring_x/ring_y`` are concatenated ring vertices (pixel-corner coords),
    ``ring_offsets`` the per-ring vertex counts (reference stores offsets as
    counts-per-parent too — CovtConverter.java:899-920).  A pixel (ix, iy)
    is inside when the vertical line crossing parity at its center
    (ix + 0.5, iy + 0.5) is odd.
    """
    mask = np.zeros((height, width), dtype=bool)
    x0s, y0s, x1s, y1s = [], [], [], []
    pos = 0
    for n in np.asarray(ring_offsets, dtype=np.int64):
        n = int(n)
        rx = np.asarray(ring_x[pos : pos + n], dtype=np.float64)
        ry = np.asarray(ring_y[pos : pos + n], dtype=np.float64)
        pos += n
        if n < 3:
            continue
        x0s.append(rx)
        y0s.append(ry)
        x1s.append(np.roll(rx, -1))
        y1s.append(np.roll(ry, -1))
    if not x0s:
        return mask
    x0 = np.concatenate(x0s)
    y0 = np.concatenate(y0s)
    x1 = np.concatenate(x1s)
    y1 = np.concatenate(y1s)

    nonh = y0 != y1
    x0, y0, x1, y1 = x0[nonh], y0[nonh], x1[nonh], y1[nonh]
    ylo = np.minimum(y0, y1)
    yhi = np.maximum(y0, y1)
    # rows whose center yc = iy + 0.5 satisfies ylo < yc < yhi (half-open in
    # effect: centers never coincide with integer ring y's)
    row_lo = np.ceil(ylo - 0.5).astype(np.int64)
    row_hi = np.ceil(yhi - 0.5).astype(np.int64)  # exclusive
    row_lo = np.clip(row_lo, 0, height)
    row_hi = np.clip(row_hi, 0, height)
    counts = np.maximum(row_hi - row_lo, 0)
    total = int(counts.sum())
    if total == 0:
        return mask
    edge_idx = np.repeat(np.arange(len(x0)), counts)
    # per-crossing row index
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rows = (np.arange(total) - starts[edge_idx]) + row_lo[edge_idx]
    yc = rows + 0.5
    t = (yc - y0[edge_idx]) / (y1[edge_idx] - y0[edge_idx])
    xc = x0[edge_idx] + t * (x1[edge_idx] - x0[edge_idx])
    # parity toggle at the first pixel whose center is right of the crossing
    col = np.ceil(xc - 0.5).astype(np.int64)
    keep = col < width
    rows, col = rows[keep], np.maximum(col[keep], 0)
    toggles = np.zeros((height, width + 1), dtype=np.int64)
    np.add.at(toggles, (rows, col), 1)
    parity = np.cumsum(toggles[:, :width], axis=1) % 2
    return parity.astype(bool)


def polygonize_mask(mask: np.ndarray) -> list[np.ndarray]:
    """Boolean mask -> list of closed rectilinear rings, each (N, 2) float64
    arrays of (x, y) pixel-corner vertices (not repeating the first vertex —
    the reference likewise drops the closing vertex,
    CovtConverter.java:963-968).

    Boundary edges are oriented with the interior on the LEFT; chaining
    follows outgoing edges, preferring the left turn at 4-valent corners so
    rings stay simple.  ``rasterize_rings(polygonize_mask(m)) == m``.
    """
    h, w = mask.shape
    m = mask.astype(bool)
    up = np.zeros_like(m)
    up[1:, :] = m[:-1, :]
    down = np.zeros_like(m)
    down[:-1, :] = m[1:, :]
    left = np.zeros_like(m)
    left[:, 1:] = m[:, :-1]
    right = np.zeros_like(m)
    right[:, :-1] = m[:, 1:]

    segs: list[tuple[tuple[int, int], tuple[int, int]]] = []
    ys, xs = np.nonzero(m & ~up)  # top edge, interior below: left -> right
    segs += [((x, y), (x + 1, y)) for x, y in zip(xs.tolist(), ys.tolist())]
    ys, xs = np.nonzero(m & ~down)  # bottom edge: right -> left
    segs += [((x + 1, y + 1), (x, y + 1)) for x, y in zip(xs.tolist(), ys.tolist())]
    ys, xs = np.nonzero(m & ~left)  # left edge: bottom -> top
    segs += [((x, y + 1), (x, y)) for x, y in zip(xs.tolist(), ys.tolist())]
    ys, xs = np.nonzero(m & ~right)  # right edge: top -> bottom
    segs += [((x + 1, y), (x + 1, y + 1)) for x, y in zip(xs.tolist(), ys.tolist())]

    out: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for a, b in segs:
        out.setdefault(a, []).append(b)

    def pick_next(prev: tuple[int, int], cur: tuple[int, int]) -> tuple[int, int]:
        cands = out[cur]
        if len(cands) == 1:
            return cands.pop()
        # left turn first (relative to incoming direction) keeps rings simple
        dx, dy = cur[0] - prev[0], cur[1] - prev[1]
        pref = [(-dy, dx), (dx, dy), (dy, -dx)]  # left, straight, right
        for vx, vy in pref:
            nxt = (cur[0] + vx, cur[1] + vy)
            if nxt in cands:
                cands.remove(nxt)
                return nxt
        return cands.pop()

    rings: list[np.ndarray] = []
    for start in list(out.keys()):
        while out.get(start):
            first = out[start].pop()
            ring = [start, first]
            prev, cur = start, first
            while cur != start:
                nxt = pick_next(prev, cur)
                ring.append(nxt)
                prev, cur = cur, nxt
            rings.append(np.array(ring[:-1], dtype=np.float64))
    return rings


def rings_to_arrays(rings: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack polygonize output into (ring_x, ring_y, ring_offsets) — the same
    Arrow-able layout the COVT geometry column uses."""
    if not rings:
        z = np.zeros(0, dtype=np.float64)
        return z, z.copy(), np.zeros(0, dtype=np.int64)
    ring_x = np.concatenate([r[:, 0] for r in rings])
    ring_y = np.concatenate([r[:, 1] for r in rings])
    offs = np.array([len(r) for r in rings], dtype=np.int64)
    return ring_x, ring_y, offs


def label_components(mask: np.ndarray, max_iters: int = 10_000) -> tuple[np.ndarray, int]:
    """4-connected component labels via min-label propagation.

    Returns (labels, n_components); labels are 0 on background, 1..n on
    foreground, renumbered in first-pixel (row-major) order.  Converges in
    O(component diameter) vectorized sweeps — fine for per-tile grids.
    """
    h, w = mask.shape
    lab = np.where(mask, np.arange(h * w, dtype=np.int64).reshape(h, w), -1)
    for _ in range(max_iters):
        prev = lab
        nb = np.full((4, h, w), np.iinfo(np.int64).max, dtype=np.int64)
        nb[0, 1:, :] = np.where(lab[:-1, :] >= 0, lab[:-1, :], np.iinfo(np.int64).max)
        nb[1, :-1, :] = np.where(lab[1:, :] >= 0, lab[1:, :], np.iinfo(np.int64).max)
        nb[2, :, 1:] = np.where(lab[:, :-1] >= 0, lab[:, :-1], np.iinfo(np.int64).max)
        nb[3, :, :-1] = np.where(lab[:, 1:] >= 0, lab[:, 1:], np.iinfo(np.int64).max)
        best = nb.min(axis=0)
        lab = np.where(mask & (best < lab), best, lab)
        if np.array_equal(lab, prev):
            break
    uniq = np.unique(lab[lab >= 0])
    remap = {int(v): i + 1 for i, v in enumerate(uniq)}
    labels = np.zeros((h, w), dtype=np.int64)
    for v, i in remap.items():
        labels[lab == v] = i
    return labels, len(uniq)
