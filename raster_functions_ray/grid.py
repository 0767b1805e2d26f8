"""Hierarchical cell index (quadtree over lon/lat, S2/H3-style role).

Every tile and geometry is assigned to cells of a fixed hierarchical grid;
spatial joins / zonal ops shuffle on ``cell_id``.  Design goals:

- **vectorized**: pure NumPy over coordinate arrays inside ``map_batches``;
- **SQL-reproducible**: the encoding uses only IEEE-double ops + floor +
  integer packing, so a DuckDB oracle computes bit-identical ids
  (the driver's correctness gate hashes values);
- **hierarchical**: ``parent(cell)`` halves ix/iy, like S2 level demotion.

World domain is lon ∈ [0, 360), lat ∈ [-90, 90] (FIXTURES.md §1).  Cells at
level L form a 2^L × 2^L grid (lat axis clipped at the pole).

Packing: cell_id = L * 2^52 + ix * 2^26 + iy  (L ≤ 25).
"""

from __future__ import annotations

import numpy as np

LEVEL_STRIDE = 2**52
IX_STRIDE = 2**26


def cell_encode(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Vectorized lon/lat -> cell id at ``level``.

    DuckDB equivalent (must stay in sync — used by oracle_sql):
      CAST(:L AS BIGINT)*4503599627370496
      + CAST(floor(lon/360.0*n) AS BIGINT)*67108864
      + LEAST(CAST(floor((lat+90.0)/180.0*n) AS BIGINT), n-1)
    """
    n = float(2**level)
    ix = np.floor(np.asarray(lon, dtype=np.float64) / 360.0 * n).astype(np.int64)
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * n).astype(np.int64)
    iy = np.minimum(iy, int(n) - 1)
    return level * LEVEL_STRIDE + ix * IX_STRIDE + iy


def cell_decode(cell_id: np.ndarray):
    cell_id = np.asarray(cell_id, dtype=np.int64)
    level = cell_id // LEVEL_STRIDE
    rem = cell_id % LEVEL_STRIDE
    return level, rem // IX_STRIDE, rem % IX_STRIDE


def parent(cell_id: np.ndarray) -> np.ndarray:
    level, ix, iy = cell_decode(cell_id)
    return (level - 1) * LEVEL_STRIDE + (ix // 2) * IX_STRIDE + (iy // 2)


def cell_bounds(cell_id: int):
    level, ix, iy = cell_decode(np.asarray([cell_id]))
    n = float(2 ** int(level[0]))
    w, h = 360.0 / n, 180.0 / n
    return (ix[0] * w, iy[0] * h - 90.0, (ix[0] + 1) * w, (iy[0] + 1) * h - 90.0)


def seed_range(xmin: float, ymin: float, xmax: float, ymax: float,
               level: int) -> tuple[int, int, int, int]:
    """Grid-index range [ix0, ix1] x [iy0, iy1] of cells whose rectangles
    intersect the (closed) bbox at ``level`` — BOTH ends clamped into the
    2^L grid (a bbox touching lat 90 / lon 360 must neither go out of grid
    nor produce an empty range).  The ONE home of this arithmetic: covering,
    adaptive_covering and the convex coverer all seed from it, and the SQL
    oracles mirror it with GREATEST/LEAST."""
    n = float(2**level)
    hi = int(n) - 1

    def cl(v: float) -> int:
        return max(0, min(hi, int(np.floor(v))))

    ix0 = cl(xmin / 360.0 * n)
    ix1 = cl(xmax / 360.0 * n) if xmax > xmin else ix0
    iy0 = cl((ymin + 90.0) / 180.0 * n)
    iy1 = cl((ymax + 90.0) / 180.0 * n) if ymax > ymin else iy0
    return ix0, max(ix0, ix1), iy0, max(iy0, iy1)


def covering(xmin: float, ymin: float, xmax: float, ymax: float, level: int) -> np.ndarray:
    """All cell ids at ``level`` whose rectangle intersects the (closed) bbox.

    The max edges are treated as INCLUSIVE: a bbox max landing exactly on a
    cell boundary includes the boundary cell (harmless over-covering), so a
    downstream exact containment test that counts the polygon boundary as
    inside (spatial.point_in_convex_batch) never loses a candidate to the
    coarse filter."""
    ix0, ix1, iy0, iy1 = seed_range(xmin, ymin, xmax, ymax, level)
    ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
    iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(ixs, iys, indexing="ij")
    return level * LEVEL_STRIDE + gx.ravel() * IX_STRIDE + gy.ravel()


def neighbors(cell_id: int, ring: int = 1) -> np.ndarray:
    """Cells within ``ring`` king-moves (kNN ring search); lon wraps, lat clips."""
    level, ix, iy = cell_decode(np.asarray([cell_id]))
    level, ix, iy = int(level[0]), int(ix[0]), int(iy[0])
    n = 2**level
    out = []
    for dx in range(-ring, ring + 1):
        for dy in range(-ring, ring + 1):
            jy = iy + dy
            if 0 <= jy < n:
                out.append(level * LEVEL_STRIDE + ((ix + dx) % n) * IX_STRIDE + jy)
    return np.asarray(sorted(set(out)), dtype=np.int64)


def adaptive_covering(bboxes: np.ndarray, level_min: int = 3,
                      level_max: int = 6):
    """S2-RegionCoverer-style adaptive multi-level covering of closed
    bboxes: cells fully inside the bbox are emitted at the coarsest level
    where that holds; boundary cells subdivide until ``level_max``, where
    every still-intersecting cell is emitted as a partial cell.

    Fully vectorized ACROSS zones: one (zone, ix, iy) frontier array per
    level, classified with the same IEEE-double predicates the DuckDB
    recursive-CTE oracle evaluates (cell edges ``ix*(360/2^L)`` are exact
    binary fractions, so equality cases agree bit-for-bit).

    Returns (zone_idx, level, ix, iy, full) int64/bool arrays.
    """
    bboxes = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
    out = {k: [] for k in ("z", "lv", "ix", "iy", "full")}
    seeds_z, seeds_ix, seeds_iy = [], [], []
    for i, (xmin, ymin, xmax, ymax) in enumerate(bboxes):
        ix0, ix1, iy0, iy1 = seed_range(xmin, ymin, xmax, ymax, level_min)
        gx, gy = np.meshgrid(np.arange(ix0, ix1 + 1, dtype=np.int64),
                             np.arange(iy0, iy1 + 1, dtype=np.int64),
                             indexing="ij")
        seeds_z.append(np.full(gx.size, i, dtype=np.int64))
        seeds_ix.append(gx.ravel())
        seeds_iy.append(gy.ravel())
    if not seeds_z:
        e = np.empty(0, np.int64)
        return e, e, e, e, np.empty(0, bool)
    z = np.concatenate(seeds_z)
    ix = np.concatenate(seeds_ix)
    iy = np.concatenate(seeds_iy)
    for level in range(level_min, level_max + 1):
        w = 360.0 / (2.0**level)
        h = 180.0 / (2.0**level)
        x0, x1 = ix * w, (ix + 1) * w
        y0, y1 = iy * h - 90.0, (iy + 1) * h - 90.0
        xmin, ymin = bboxes[z, 0], bboxes[z, 1]
        xmax, ymax = bboxes[z, 2], bboxes[z, 3]
        inside = (x0 >= xmin) & (x1 <= xmax) & (y0 >= ymin) & (y1 <= ymax)
        inter = (x0 <= xmax) & (x1 >= xmin) & (y0 <= ymax) & (y1 >= ymin)
        emit = inter if level == level_max else inside
        out["z"].append(z[emit])
        out["lv"].append(np.full(int(emit.sum()), level, dtype=np.int64))
        out["ix"].append(ix[emit])
        out["iy"].append(iy[emit])
        out["full"].append(inside[emit])
        if level == level_max:
            break
        sub = inter & ~inside
        z = np.repeat(z[sub], 4)
        dx = np.tile(np.array([0, 0, 1, 1], dtype=np.int64), int(sub.sum()))
        dy = np.tile(np.array([0, 1, 0, 1], dtype=np.int64), int(sub.sum()))
        ix = np.repeat(ix[sub] * 2, 4) + dx
        iy = np.repeat(iy[sub] * 2, 4) + dy
    return (np.concatenate(out["z"]), np.concatenate(out["lv"]),
            np.concatenate(out["ix"]), np.concatenate(out["iy"]),
            np.concatenate(out["full"]))
