"""Wave-9 geospatial operators: space-time co-location, vector-overlay
union coverage, and network shortest paths.

Same two-family discipline as `spatial.py`: every input world is derived
deterministically from the driver tables with integer arithmetic (the
`_seg_mix` counter hash, exact in DuckDB UBIGINT), so each engine
lowering has a bit-exact SQL oracle.

Reference parity notes: the reference (Esri/raster-functions) is a raster
operator library; these are the VECTOR analysis siblings its users run in
the same product family (Trace Proximity Events, overlay union area,
Network Analyst shortest path) re-expressed Ray-Data-first — cited per
operator below.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sources import read_table
from .spatial import _mix_sql, _seg_mix, _seg_points

# --------------------------------------------- space-time co-location join

STJ_R = 40                                 # co-location radius (grid units)
STJ_TAU_US = 6 * 3600 * 1_000_000          # 6-hour temporal window
STJ_TB_US = 86_400_000_000                 # time-bucket pitch (1 day >= tau)
STJ_T0_US = 1_704_067_200_000_000          # 2024-01-01T00:00:00Z (events epoch)
STJ_CELL = 500                             # spatial pitch (>= STJ_R)


def q_spacetime_join(sf_dir: str) -> pd.DataFrame:
    """Space-time co-location join (the ArcGIS *Trace Proximity Events*
    tool shape): every pair of events from DIFFERENT users within
    euclidean distance {STJ_R} (integer point world, exact d²) AND
    within {STJ_TAU_US} µs of each other — contact tracing / co-travel
    detection, both sides corpus-sized.

    Scale shape: the q_radius_join grid method lifted to 3-D — each
    point emits its own (cell_x, cell_y, time_bucket) plus the box-
    filtered 3×3×3 ring (a neighbor 3-D cell is emitted only when the
    point lies within {STJ_R} of its spatial box AND {STJ_TAU_US} of
    its time slab, so with pitch ≫ radius most points emit ~2-4 rows,
    not 27); pairs form inside groupby(3-D cell), and the report-once
    owner is the LOWER-ID event's own cell — in both emission sets, so
    each pair surfaces exactly once globally.  Spatial pitch {STJ_CELL}
    ≥ radius and bucket {STJ_TB_US} ≥ τ make the 1-ring lossless."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    R2 = STJ_R * STJ_R

    def emit(b: pa.Table) -> pa.Table:
        eid = np.asarray(b["event_id"], np.int64)
        uid = np.asarray(b["user_id"], np.int64)
        t = b["ts"].cast(pa.int64()).to_numpy() - STJ_T0_US
        px, py = _seg_points(eid)
        cx, cy, tb = px // STJ_CELL, py // STJ_CELL, t // STJ_TB_US
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    sp_ok = np.ones(eid.size, bool)
                else:
                    xlo = (cx + dx) * STJ_CELL
                    ylo = (cy + dy) * STJ_CELL
                    ddx = np.maximum(
                        np.maximum(xlo - px, px - (xlo + STJ_CELL - 1)), 0)
                    ddy = np.maximum(
                        np.maximum(ylo - py, py - (ylo + STJ_CELL - 1)), 0)
                    sp_ok = ddx * ddx + ddy * ddy <= R2
                if not sp_ok.any():
                    continue
                for dt in (-1, 0, 1):
                    if dt == 0:
                        keep = sp_ok
                    else:
                        # distance from t to the neighbor slab's range
                        gap = (t - (tb + 1) * STJ_TB_US + 1 if dt == 1
                               else tb * STJ_TB_US - t)
                        keep = sp_ok & (np.abs(gap) <= STJ_TAU_US)
                    if not keep.any():
                        continue
                    parts.append(pa.table({
                        "key": pa.array(((cx[keep] + dx) * 100003
                                         + cy[keep] + dy) * 64
                                        + tb[keep] + dt + 1),
                        "own": pa.array(np.full(int(keep.sum()),
                                                dx == 0 and dy == 0
                                                and dt == 0)),
                        "id": pa.array(eid[keep]), "u": pa.array(uid[keep]),
                        "x": pa.array(px[keep]), "y": pa.array(py[keep]),
                        "t": pa.array(t[keep])}))
        return pa.concat_tables(parts)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["id"].to_numpy(np.int64)
        u = g["u"].to_numpy(np.int64)
        x = g["x"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        t = g["t"].to_numpy(np.int64)
        own = g["own"].to_numpy(bool)
        oi = np.nonzero(own)[0]
        if oi.size == 0:
            return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                                 "b_id": pd.Series(dtype="int64"),
                                 "d2": pd.Series(dtype="int64"),
                                 "dt_us": pd.Series(dtype="int64")})
        dx = x[oi, None] - x[None, :]
        dy = y[oi, None] - y[None, :]
        d2 = dx * dx + dy * dy
        dt = t[None, :] - t[oi, None]
        hit = ((ids[oi, None] < ids[None, :]) & (u[oi, None] != u[None, :])
               & (d2 <= R2) & (np.abs(dt) <= STJ_TAU_US))
        i, j = np.nonzero(hit)
        return pd.DataFrame({"a_id": ids[oi][i], "b_id": ids[j],
                             "d2": d2[i, j], "dt_us": dt[i, j]})

    out = (ds.map_batches(emit, batch_format="pyarrow")
           .groupby("key").map_groups(pairs, batch_format="pandas")
           .to_pandas())
    return (out.astype({"a_id": "int64", "b_id": "int64",
                        "d2": "int64", "dt_us": "int64"})
            .sort_values(["a_id", "b_id"]).reset_index(drop=True))


def spacetime_join_oracle_sql() -> str:
    """Exactly-once 3-D blocked self-join: each qualifying pair matches
    the (dx,dy,dt) offset mapping b's cell onto a's own cell, and only
    that one — the radius-join oracle lifted to space-time."""
    return f"""
WITH pts AS MATERIALIZED (
  SELECT event_id AS id, user_id AS u,
         {_mix_sql('2000000000 + 2 * event_id')} AS px,
         {_mix_sql('2000000001 + 2 * event_id')} AS py,
         epoch_us(ts) - {STJ_T0_US} AS t
  FROM events),
own AS MATERIALIZED (
  SELECT id, u, px, py, t,
         ((px // {STJ_CELL}) * 100003 + (py // {STJ_CELL})) * 64
         + t // {STJ_TB_US} + 1 AS ck
  FROM pts),
ring AS MATERIALIZED (
  SELECT id, u, px, py, t,
         ((px // {STJ_CELL} + dx.d) * 100003
          + (py // {STJ_CELL} + dy.d)) * 64
         + t // {STJ_TB_US} + dt.d + 1 AS ck
  FROM pts, (VALUES (-1), (0), (1)) dx(d),
            (VALUES (-1), (0), (1)) dy(d),
            (VALUES (-1), (0), (1)) dt(d))
SELECT o.id AS a_id, c.id AS b_id,
       CAST((o.px-c.px)*(o.px-c.px) + (o.py-c.py)*(o.py-c.py) AS BIGINT)
         AS d2,
       CAST(c.t - o.t AS BIGINT) AS dt_us
FROM own o JOIN ring c ON c.ck = o.ck
WHERE o.id < c.id AND o.u <> c.u
  AND (o.px-c.px)*(o.px-c.px) + (o.py-c.py)*(o.py-c.py) <= {STJ_R * STJ_R}
  AND abs(c.t - o.t) <= {STJ_TAU_US}
ORDER BY a_id, b_id
"""


# ------------------------------------------- union coverage (overlay area)

UA_BASE = 6_000_000_000    # counter offset for the rect world (decorrelated)
UA_MAXW = 60               # max rect extent per axis
UA_STRIP = 500             # x-strip pitch for the engine's sharding


def _ua_rects(keys: np.ndarray):
    """Deterministic integer rectangles from order keys: corner in
    [0,10000)², width/height in [1,{UA_MAXW}]."""
    k = keys.astype(np.int64)
    x1 = _seg_mix(UA_BASE + 4 * k, 10000)
    y1 = _seg_mix(UA_BASE + 4 * k + 1, 10000)
    w = _seg_mix(UA_BASE + 4 * k + 2, UA_MAXW) + 1
    h = _seg_mix(UA_BASE + 4 * k + 3, UA_MAXW) + 1
    return x1, y1, w, h


def q_union_area(sf_dir: str) -> pd.DataFrame:
    """Union coverage of overlapping rectangles (the vector-overlay
    *union/dissolve area* primitive — building-footprint coverage,
    burned-area mosaics): per integer x-column, the total length of the
    union of the y-intervals of every rectangle covering that column.
    Σ covered_len over columns IS the exact union area — the overlap
    double-count problem the naive Σw·h gets wrong.

    Scale shape: rectangles shuffle ONCE keyed by x-strip (pitch
    {UA_STRIP} ≫ max extent {UA_MAXW} ⇒ ≤2 strips per rect), clipped at
    the strip edge; disjoint strips make the union additive, and inside
    a strip the sweep is fully vectorized — open/close events, lexsort,
    one cumsum (coverage returns to zero inside every column, so the
    GLOBAL running sum is the per-column coverage), covered length
    accumulated with np.add.at.  No step is O(area); work is
    O(Σ widths) per strip and strips are embarrassingly parallel."""
    ds = read_table(sf_dir, "orders", columns=["o_orderkey"])

    def to_strips(b: pa.Table) -> pa.Table:
        x1, y1, w, h = _ua_rects(np.asarray(b["o_orderkey"], np.int64))
        x2 = x1 + w            # exclusive
        s_lo, s_hi = x1 // UA_STRIP, (x2 - 1) // UA_STRIP
        parts = []
        for d in (0, 1):       # a rect spans at most 2 strips
            s = s_lo + d
            keep = s <= s_hi
            if not keep.any():
                continue
            parts.append(pa.table({
                "strip": pa.array(s[keep]),
                "cx1": pa.array(np.maximum(x1[keep], s[keep] * UA_STRIP)),
                "cx2": pa.array(np.minimum(x2[keep],
                                           (s[keep] + 1) * UA_STRIP)),
                "y1": pa.array(y1[keep]),
                "y2": pa.array(y1[keep] + h[keep])}))
        return pa.concat_tables(parts)

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        cx1 = g["cx1"].to_numpy(np.int64)
        cx2 = g["cx2"].to_numpy(np.int64)
        y1 = g["y1"].to_numpy(np.int64)
        y2 = g["y2"].to_numpy(np.int64)
        # explode each clipped rect to its integer columns
        w = cx2 - cx1
        off = np.repeat(np.cumsum(w) - w, w)
        col = cx1.repeat(w) + (np.arange(int(w.sum())) - off)
        oy1, oy2 = y1.repeat(w), y2.repeat(w)
        # open/close events; coverage zeroes out inside every column, so
        # one global cumsum doubles as the per-column running coverage
        ev_col = np.concatenate([col, col])
        ev_y = np.concatenate([oy1, oy2])
        ev_d = np.concatenate([np.ones(col.size, np.int64),
                               -np.ones(col.size, np.int64)])
        o = np.lexsort((ev_y, ev_col))
        ev_col, ev_y, ev_d = ev_col[o], ev_y[o], ev_d[o]
        cov = np.cumsum(ev_d)
        same = ev_col[1:] == ev_col[:-1]
        seg = np.where(same & (cov[:-1] > 0), ev_y[1:] - ev_y[:-1], 0)
        lo = int(ev_col.min()) if ev_col.size else 0
        acc = np.zeros((int(ev_col.max()) - lo + 1) if ev_col.size else 0,
                       np.int64)
        np.add.at(acc, ev_col[:-1] - lo, seg)
        nz = np.nonzero(acc)[0]
        return pd.DataFrame({"col": nz + lo, "covered_len": acc[nz]})

    out = (ds.map_batches(to_strips, batch_format="pyarrow")
           .groupby("strip").map_groups(sweep, batch_format="pandas")
           .to_pandas())
    return (out.astype({"col": "int64", "covered_len": "int64"})
            .sort_values("col").reset_index(drop=True))


def union_area_oracle_sql() -> str:
    """Gaps-and-islands union length per exploded column: sorted by
    (y1,y2), Σ max(0, y2 − max(y1, running-max prev y2)) is the union
    length — an independent formulation of the engine's event sweep."""
    x1 = _mix_sql("6000000000 + 4 * o_orderkey")
    y1 = _mix_sql("6000000001 + 4 * o_orderkey")
    w = _mix_sql("6000000002 + 4 * o_orderkey", UA_MAXW) + " + 1"
    h = _mix_sql("6000000003 + 4 * o_orderkey", UA_MAXW) + " + 1"
    return f"""
WITH rects AS MATERIALIZED (
  SELECT {x1} AS x1, {y1} AS y1, {w} AS w, {h} AS h FROM orders),
cols AS MATERIALIZED (
  SELECT x1 + t.i AS col, y1, y1 + h AS y2
  FROM rects JOIN range(0, {UA_MAXW}) t(i) ON t.i < w),
marked AS (
  SELECT col, y1, y2,
         MAX(y2) OVER (PARTITION BY col ORDER BY y1, y2
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS pmax
  FROM cols)
SELECT CAST(col AS BIGINT) AS col,
       CAST(SUM(GREATEST(y2 - GREATEST(y1, COALESCE(pmax, y1)), 0))
            AS BIGINT) AS covered_len
FROM marked GROUP BY col HAVING covered_len > 0 ORDER BY col
"""


# --------------------------------- K-hop weighted shortest path (SSSP)

SSSP_N = 1024             # graph nodes
SSSP_K = 6                # relaxation rounds (paths of <= K edges)
SSSP_BASE = 6_500_000_000  # counter offset for the edge world
_SSSP_INF = 1 << 60


def _sssp_edges(keys: np.ndarray):
    """One weighted directed edge per order key over {SSSP_N} nodes,
    integer weights in [1,100]."""
    k = keys.astype(np.int64)
    return (_seg_mix(SSSP_BASE + 3 * k, SSSP_N),
            _seg_mix(SSSP_BASE + 3 * k + 1, SSSP_N),
            _seg_mix(SSSP_BASE + 3 * k + 2, 100) + 1)


def q_sssp_khop(sf_dir: str) -> pd.DataFrame:
    """Single-source shortest paths restricted to ≤{SSSP_K} edges
    (Bellman-Ford rounds — the Network Analyst / OD-cost-matrix
    primitive) from node 0 over the deterministic weighted edge world:
    dist_k(v) = min over paths of ≤k edges, the classic relax
    recurrence, exact integer costs.

    Scale shape: the frontier is O(N) driver state broadcast per round
    (`ray.put` once, zero-copy numpy read per task); each round is ONE
    streaming pass over the edge table emitting per-batch partial
    minima (≤N rows per batch, np.minimum.at), merged driver-side —
    result-sized, never edge-sized.  K rounds = K passes; edges are
    never materialized, re-derived from pruned key columns each pass
    (cheaper than caching at 100 TB edge scale)."""
    import ray

    ds = read_table(sf_dir, "orders", columns=["o_orderkey"])
    dist = np.full(SSSP_N, _SSSP_INF, np.int64)
    dist[0] = 0
    for _ in range(SSSP_K):
        dref = ray.put(dist)

        def relax(b: pa.Table, dref=dref) -> pa.Table:
            d = ray.get(dref)
            s, t, w = _sssp_edges(np.asarray(b["o_orderkey"], np.int64))
            m = d[s] < _SSSP_INF
            loc = np.full(SSSP_N, _SSSP_INF, np.int64)
            np.minimum.at(loc, t[m], d[s[m]] + w[m])
            nz = np.nonzero(loc < _SSSP_INF)[0]
            return pa.table({"node": pa.array(nz),
                             "dist": pa.array(loc[nz])})

        part = ds.map_batches(relax, batch_format="pyarrow").to_pandas()
        nd = dist.copy()
        if len(part):
            np.minimum.at(nd, part["node"].to_numpy(np.int64),
                          part["dist"].to_numpy(np.int64))
        if np.array_equal(nd, dist):
            break                      # converged early — rounds are idempotent
        dist = nd
    reach = np.nonzero(dist < _SSSP_INF)[0]
    return pd.DataFrame({"node": reach.astype(np.int64),
                         "dist": dist[reach]})


def sssp_khop_oracle_sql() -> str:
    """K-times unrolled relax: d_{{k+1}} = per-node MIN over (carry d_k,
    d_k + edge) — the k-means-oracle unrolling discipline."""
    s = _mix_sql("6500000000 + 3 * o_orderkey", SSSP_N)
    t = _mix_sql("6500000001 + 3 * o_orderkey", SSSP_N)
    w = _mix_sql("6500000002 + 3 * o_orderkey", 100) + " + 1"
    rounds = []
    for k in range(SSSP_K):
        rounds.append(f"""d{k + 1} AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{k}
    UNION ALL
    SELECT e.t AS node, d{k}.dist + e.w AS dist
    FROM d{k} JOIN edges e ON e.s = d{k}.node)
  GROUP BY node)""")
    return f"""
WITH edges AS MATERIALIZED (
  SELECT {s} AS s, {t} AS t, {w} AS w FROM orders),
d0(node, dist) AS (SELECT 0, 0),
{', '.join(rounds)}
SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
FROM d{SSSP_K} ORDER BY node
"""
