"""Wave-9 operators: brute-force cross-checks independent of the SQL oracles.

The sweep (scripts/verify_queries.py) proves engine == DuckDB; these tests
prove both equal a third, dumb-but-obviously-correct formulation, so an
error shared by the two clever sides cannot hide.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from raster_functions_ray import spatial2
from raster_functions_ray.spatial import _seg_points

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


class TestSpacetimeJoin:
    def test_matches_blocked_bruteforce_sf001(self, ray_session):
        out = spatial2.q_spacetime_join(SF01)
        assert len(out) > 0
        assert (out["a_id"] < out["b_id"]).all()
        assert (out["d2"] <= spatial2.STJ_R ** 2).all()
        assert (out["dt_us"].abs() <= spatial2.STJ_TAU_US).all()

        t = pq.read_table(SF01 + "/events.parquet",
                          columns=["event_id", "user_id", "ts"])
        eid = np.asarray(t["event_id"], np.int64)
        uid = np.asarray(t["user_id"], np.int64)
        ts = t["ts"].cast("int64").to_numpy() - spatial2.STJ_T0_US
        px, py = _seg_points(eid)
        order = np.argsort(eid)
        eid, uid, ts, px, py = (a[order] for a in (eid, uid, ts, px, py))
        rows = []
        R2 = spatial2.STJ_R ** 2
        for s in range(0, eid.size, 2000):   # blocked O(n²), bounded memory
            e = min(s + 2000, eid.size)
            d2 = ((px[s:e, None] - px[None, :]) ** 2
                  + (py[s:e, None] - py[None, :]) ** 2)
            dt = ts[None, :] - ts[s:e, None]
            hit = ((eid[s:e, None] < eid[None, :])
                   & (uid[s:e, None] != uid[None, :])
                   & (d2 <= R2) & (np.abs(dt) <= spatial2.STJ_TAU_US))
            i, j = np.nonzero(hit)
            rows.append(pd.DataFrame({
                "a_id": eid[s:e][i], "b_id": eid[j],
                "d2": d2[i, j], "dt_us": dt[i, j]}))
        ref = (pd.concat(rows).sort_values(["a_id", "b_id"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(
            out, ref.astype({c: "int64" for c in ref.columns}))


class TestUnionArea:
    def test_matches_canvas_paint(self, ray_session):
        out = spatial2.q_union_area(SF001)
        keys = np.asarray(pq.read_table(
            SF001 + "/orders.parquet", columns=["o_orderkey"])["o_orderkey"],
            np.int64)
        x1, y1, w, h = spatial2._ua_rects(keys)
        canvas = np.zeros((10000 + spatial2.UA_MAXW,
                           10000 + spatial2.UA_MAXW), bool)
        for a, b, ww, hh in zip(x1, y1, w, h):
            canvas[a:a + ww, b:b + hh] = True
        lens = canvas.sum(axis=1)
        cols = np.nonzero(lens)[0]
        ref = pd.DataFrame({"col": cols.astype("int64"),
                            "covered_len": lens[cols].astype("int64")})
        pd.testing.assert_frame_equal(out, ref)
        # the union is genuinely smaller than the naive Σ w·h
        assert out["covered_len"].sum() < int((w * h).sum())


class TestSsspKhop:
    def test_matches_dense_bellman_ford(self, ray_session):
        out = spatial2.q_sssp_khop(SF001)
        keys = np.asarray(pq.read_table(
            SF001 + "/orders.parquet", columns=["o_orderkey"])["o_orderkey"],
            np.int64)
        s, t, w = spatial2._sssp_edges(keys)
        INF = spatial2._SSSP_INF
        dist = np.full(spatial2.SSSP_N, INF, np.int64)
        dist[0] = 0
        for _ in range(spatial2.SSSP_K):
            nd = dist.copy()
            m = dist[s] < INF
            np.minimum.at(nd, t[m], dist[s[m]] + w[m])
            dist = nd
        reach = np.nonzero(dist < INF)[0]
        ref = pd.DataFrame({"node": reach.astype("int64"),
                            "dist": dist[reach]})
        pd.testing.assert_frame_equal(out.reset_index(drop=True), ref)
        assert (out["node"] == 0).any() and int(
            out.loc[out["node"] == 0, "dist"].iloc[0]) == 0

    def test_khop_monotone_in_k(self, ray_session, monkeypatch):
        # dist_k is monotone nonincreasing in k and node-set nondecreasing
        monkeypatch.setattr(spatial2, "SSSP_K", 2)
        d2 = spatial2.q_sssp_khop(SF001).set_index("node")["dist"]
        monkeypatch.setattr(spatial2, "SSSP_K", 6)
        d6 = spatial2.q_sssp_khop(SF001).set_index("node")["dist"]
        assert set(d2.index) <= set(d6.index)
        common = d2.index.intersection(d6.index)
        assert (d6.loc[common] <= d2.loc[common]).all()


class TestConvexHull:
    def test_hull_contains_all_points_and_closes(self, ray_session):
        out = spatial2.q_convex_hull(SF01)
        assert len(out) > 0
        n = pq.ParquetFile(SF01 + "/events.parquet").metadata.num_rows
        samp = spatial2._hull_samp(n)
        t = pq.read_table(SF01 + "/events.parquet", columns=["event_id"])
        eid = np.asarray(t["event_id"], np.int64)
        eid = eid[eid % samp == 0]
        px, py = _seg_points(eid)
        from raster_functions_ray.spatial import _seg_mix
        z = _seg_mix(spatial2.HULL_BASE + eid, spatial2.HULL_ZONES)
        for zv, g in out.groupby("zone"):
            # closed cycle: every a_id appears exactly once as b_id
            assert sorted(g["a_id"]) == sorted(g["b_id"])
            # CCW orientation: positive shoelace area over the edge list
            area2 = int((g["a_x"] * g["b_y"] - g["b_x"] * g["a_y"]).sum())
            assert area2 > 0
            # every zone point lies left of or on every directed edge
            m = z == zv
            cross = ((g["b_x"].to_numpy()[:, None] - g["a_x"].to_numpy()[:, None])
                     * (py[m][None, :] - g["a_y"].to_numpy()[:, None])
                     - (g["b_y"].to_numpy()[:, None] - g["a_y"].to_numpy()[:, None])
                     * (px[m][None, :] - g["a_x"].to_numpy()[:, None]))
            assert (cross >= 0).all()


class TestEmergingHotspot:
    def test_all_category_arms_exercised(self, ray_session):
        out = spatial2.q_emerging_hotspot(SF01)
        assert len(out) == 64
        cats = set(out["category"])
        assert cats == {"none", "new", "intensifying", "diminishing",
                        "persistent", "sporadic"}
        # the painted corner blocks land where designed (8x8, cell=cy*8+cx)
        bycell = out.set_index("cell_id")["category"]
        assert bycell[0] == "intensifying"        # (cx0,cy0) rising block
        assert bycell[63] in ("new", "sporadic")  # late-switch corner
        assert bycell[7] == "persistent"          # constant block corner
        assert bycell[56] == "diminishing"        # falling block corner

    def test_hot_iff_integer_threshold(self, ray_session):
        out = spatial2.q_emerging_hotspot(SF01)
        none_rows = out[out["category"] == "none"]
        assert (none_rows["n_hot"] == 0).all()


class TestTrajectoryResample:
    def test_matches_per_user_python_lerp(self, ray_session):
        out = spatial2.q_trajectory_resample(SF001)
        t = pq.read_table(SF001 + "/events.parquet",
                          columns=["event_id", "ts", "user_id"]).to_pandas()
        t["ts"] = t["ts"].astype("int64")
        from raster_functions_ray.spatial import DP_STEP_MOD, _seg_mix
        rows = []
        tj = (spatial2.RS_T0_US
              + spatial2.RS_DT_US * np.arange(spatial2.RS_J, dtype=np.int64))
        for u, g in t.sort_values(["user_id", "ts", "event_id"]).groupby(
                "user_id"):
            eid = g["event_id"].to_numpy(np.int64)
            ts = g["ts"].to_numpy(np.int64)
            px = np.cumsum(_seg_mix(3_000_000_000 + 2 * eid, DP_STEP_MOD) - 50)
            py = np.cumsum(_seg_mix(3_000_000_001 + 2 * eid, DP_STEP_MOD) - 50)
            for j, T in enumerate(tj):
                k = int(np.searchsorted(ts, T, side="right"))
                if 0 < k < len(ts):
                    rows.append((u, j,
                                 int(px[k - 1]) * int(ts[k] - T)
                                 + int(px[k]) * int(T - ts[k - 1]),
                                 int(py[k - 1]) * int(ts[k] - T)
                                 + int(py[k]) * int(T - ts[k - 1]),
                                 int(ts[k] - ts[k - 1])))
        ref = (pd.DataFrame(rows, columns=["user_id", "j", "x_num",
                                           "y_num", "den"])
               .astype("int64").sort_values(["user_id", "j"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(out, ref)


class TestMapMatch:
    def test_snap_is_true_argmin_and_subset_of_join(self, ray_session):
        out = spatial2.q_map_match(SF001)
        assert len(out) > 0
        # one row per matched point
        assert out["event_id"].is_unique
        from raster_functions_ray.spatial import (SEG_R, _seg_dist_parts,
                                                  _seg_endpoints)
        t = pq.read_table(SF001 + "/events.parquet", columns=["event_id"])
        eid = np.asarray(t["event_id"], np.int64)
        px, py = _seg_points(eid)
        k = np.asarray(pq.read_table(SF001 + "/orders.parquet",
                                     columns=["o_orderkey"])["o_orderkey"],
                       np.int64)
        x1, y1, x2, y2 = _seg_endpoints(k)
        num, den = _seg_dist_parts(px[:, None], py[:, None], x1[None, :],
                                   y1[None, :], x2[None, :], y2[None, :])
        within = num <= SEG_R * SEG_R * den
        ratio = np.where(within, num / den, np.inf)
        order = np.lexsort((np.broadcast_to(k, ratio.shape), ratio), axis=1)
        best = order[:, 0]
        matched = within[np.arange(eid.size), best]
        ref = pd.DataFrame({
            "event_id": eid[matched], "seg_id": k[best[matched]],
            "d2_num": num[matched, best[matched]],
            "d2_den": den[matched, best[matched]]}).astype("int64")
        ref = ref.sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, ref)


class TestKrigingSimple:
    def test_matches_python_cramer(self, ray_session):
        out = spatial2.q_kriging_simple(SF001)
        sx, sy, sz = spatial2._kr_stations()
        # stations must be coordinate-distinct or det degenerates
        assert len({(int(a), int(b)) for a, b in zip(sx, sy)}) == spatial2.KR_NS
        t = pq.read_table(SF001 + "/events.parquet", columns=["event_id"])
        eid = np.asarray(t["event_id"], np.int64)
        px, py = _seg_points(eid)
        S0 = spatial2.KR_S0
        rows = []
        for i in range(eid.size):
            d2 = [(int((px[i] - sx[j]) ** 2 + (py[i] - sy[j]) ** 2), j)
                  for j in range(spatial2.KR_NS)]
            (d1, s1), (d2_, s2) = sorted(d2)[:2]
            k1, k2 = max(S0 - d1, 0), max(S0 - d2_, 0)
            c12 = max(S0 - int((sx[s1] - sx[s2]) ** 2
                               + (sy[s1] - sy[s2]) ** 2), 0)
            det = S0 * S0 - c12 * c12
            rows.append((int(eid[i]), s1, s2,
                         (k1 * S0 - k2 * c12) * int(sz[s1])
                         + (k2 * S0 - k1 * c12) * int(sz[s2]), det))
        ref = (pd.DataFrame(rows, columns=["event_id", "s1", "s2",
                                           "pred_num", "den"])
               .astype("int64").sort_values("event_id")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(out, ref)
        assert (out["den"] > 0).all()


class TestOdCostMatrix:
    def test_each_source_equals_single_source_relax(self, ray_session):
        out = spatial2.q_od_cost_matrix(SF001)
        keys = np.asarray(pq.read_table(
            SF001 + "/orders.parquet", columns=["o_orderkey"])["o_orderkey"],
            np.int64)
        s, t, w = spatial2._sssp_edges(keys)
        INF = spatial2._SSSP_INF
        for src in spatial2.OD_SOURCES:
            dist = np.full(spatial2.SSSP_N, INF, np.int64)
            dist[src] = 0
            for _ in range(spatial2.SSSP_K):
                nd = dist.copy()
                m = dist[s] < INF
                np.minimum.at(nd, t[m], dist[s[m]] + w[m])
                dist = nd
            reach = np.nonzero(dist < INF)[0]
            got = out[out["src"] == src].reset_index(drop=True)
            ref = pd.DataFrame({"src": np.full(reach.size, src,
                                               dtype=np.int64),
                                "node": reach.astype("int64"),
                                "dist": dist[reach]})
            pd.testing.assert_frame_equal(got, ref)


class TestGwrMoments:
    def test_matches_dense_numpy_scatter(self, ray_session):
        out = spatial2.q_gwr_moments(SF001)
        from raster_functions_ray.spatial import _seg_mix
        t = pq.read_table(SF001 + "/events.parquet", columns=["event_id"])
        eid = np.asarray(t["event_id"], np.int64)
        px, py = _seg_points(eid)
        z = _seg_mix(spatial2.GWR_ZBASE + eid, 1000)
        C, R = spatial2.GWR_C, spatial2.GWR_R
        acc = {}
        for i in range(eid.size):
            for gx in range(int(px[i]) // C - 2, int(px[i]) // C + 3):
                for gy in range(int(py[i]) // C - 2, int(py[i]) // C + 3):
                    dx = 2 * int(px[i]) - (2 * gx * C + C)
                    dy = 2 * int(py[i]) - (2 * gy * C + C)
                    w = (2 * R) ** 2 - (dx * dx + dy * dy)
                    if w <= 0:
                        continue
                    zz = int(z[i])
                    row = acc.setdefault((gx, gy), [0] * 10)
                    for k, v in enumerate([1, w, w * dx, w * dy, w * zz,
                                           w * dx * dx, w * dx * dy,
                                           w * dy * dy, w * dx * zz,
                                           w * dy * zz]):
                        row[k] += v
        ref = pd.DataFrame(
            [(k[0], k[1], *v) for k, v in sorted(acc.items())],
            columns=["cx", "cy", "n", "sw", "swx", "swy", "swz",
                     "swxx", "swxy", "swyy", "swxz", "swyz"]).astype("int64")
        pd.testing.assert_frame_equal(out, ref.reset_index(drop=True))


class TestMinBoundingCircle:
    def test_matches_all_points_bruteforce(self, ray_session):
        out = spatial2.q_min_bounding_circle(SF001)
        assert len(out) == spatial2.MBC_ZONES
        n = pq.ParquetFile(SF001 + "/events.parquet").metadata.num_rows
        samp = spatial2._mbc_samp(n)
        t = pq.read_table(SF001 + "/events.parquet", columns=["event_id"])
        eid = np.asarray(t["event_id"], np.int64)
        eid = eid[eid % samp == 0]
        px, py, z = spatial2._mbc_world(eid)
        from fractions import Fraction
        for zv in range(spatial2.MBC_ZONES):
            m = z == zv
            # brute force over ALL zone points (not just hull corners)
            seen = {}
            for i in np.nonzero(m)[0]:
                seen.setdefault((int(px[i]), int(py[i])), int(eid[i]))
            ids = [min(v, seen[k]) for k, v in seen.items()]
            coords = list(seen.keys())
            best = spatial2._mbc_best(
                [seen[c] for c in coords],
                [c[0] for c in coords], [c[1] for c in coords])
            row = out[out["zone"] == zv].iloc[0]
            assert Fraction(int(row["r2_num"]), int(row["r2_den"])) == best[0]
            assert (int(row["p1"]), int(row["p2"]), int(row["p3"])) == \
                (best[2], best[3], best[4])


class TestGearyC:
    def test_matches_full_grid_numpy(self, ray_session):
        out = spatial2.q_geary_c(SF01)
        from raster_functions_ray.regions import GRID_W, mask_values
        ids = (np.arange(GRID_W, dtype=np.uint64)[:, None]
               * np.uint64(GRID_W)
               + np.arange(GRID_W, dtype=np.uint64)[None, :])
        x = mask_values(ids).astype(np.int64)
        dr = x[:, :-1] - x[:, 1:]
        dd = x[:-1, :] - x[1:, :]
        assert int(out["n_pix"].iloc[0]) == GRID_W * GRID_W
        assert int(out["w_und"].iloc[0]) == dr.size + dd.size
        assert int(out["sum_x"].iloc[0]) == int(x.sum())
        assert int(out["sum_x2"].iloc[0]) == int((x * x).sum())
        assert int(out["diffsq"].iloc[0]) == int((dr * dr).sum()
                                                 + (dd * dd).sum())


class TestKnoxStat:
    def test_monotone_and_matches_bruteforce(self, ray_session):
        out = spatial2.q_knox_stat(SF001).set_index(["r", "tau_us"])
        t = pq.read_table(SF001 + "/events.parquet",
                          columns=["event_id", "ts"])
        eid = np.asarray(t["event_id"], np.int64)
        ts = t["ts"].cast("int64").to_numpy() - spatial2.STJ_T0_US
        px, py = _seg_points(eid)
        d2 = ((px[:, None] - px[None, :]) ** 2
              + (py[:, None] - py[None, :]) ** 2)
        dt = np.abs(ts[:, None] - ts[None, :])
        lt = eid[:, None] < eid[None, :]
        for r in spatial2.KNOX_RS:
            for tau in spatial2.KNOX_TAUS_US:
                want = int((lt & (d2 <= r * r) & (dt <= tau)).sum())
                assert int(out.loc[(r, tau), "n_pairs"]) == want
        vals = out["n_pairs"].unstack()
        assert (vals.diff(axis=0).dropna() >= 0).all().all()  # r-monotone
        assert (vals.diff(axis=1).T.dropna() >= 0).all().all()


class TestHilbertKeys:
    def test_matches_scalar_reference_and_adjacency(self, ray_session):
        rng = np.random.default_rng(7)
        xs = rng.integers(0, 10000, 200)
        ys = rng.integers(0, 10000, 200)

        def ref_xy2d(x, y):   # scalar textbook loop
            d, s = 0, 1 << (spatial2.HILBERT_ORDER - 1)
            while s > 0:
                rx = 1 if (x & s) > 0 else 0
                ry = 1 if (y & s) > 0 else 0
                d += s * s * ((3 * rx) ^ ry)
                if ry == 0:
                    if rx == 1:
                        x, y = s - 1 - x, s - 1 - y
                    x, y = y, x
                s >>= 1
            return d

        got = spatial2.hilbert_xy2d(xs, ys)
        assert [int(v) for v in got] == [ref_xy2d(int(a), int(b))
                                         for a, b in zip(xs, ys)]

    def test_locality_beats_morton_on_window_scan(self, ray_session):
        out = spatial2.q_hilbert_keys(SF001)
        # keys are a bijection of position: distinct coords ≠> collisions
        t = pq.read_table(SF001 + "/events.parquet", columns=["event_id"])
        eid = np.asarray(t["event_id"], np.int64)
        px, py = _seg_points(eid)
        coords = len({(int(a), int(b)) for a, b in zip(px, py)})
        assert out["hkey"].nunique() == coords
        assert (out["hcell"] == out["hkey"] // (1 << (2 * (
            spatial2.HILBERT_ORDER - spatial2.HILBERT_CELL_LEVEL)))).all()


class TestStDbscan:
    def test_matches_bruteforce_union_find(self, ray_session):
        out = spatial2.q_st_dbscan(SF001)
        t = pq.read_table(SF001 + "/events.parquet",
                          columns=["event_id", "ts"])
        eid = np.asarray(t["event_id"], np.int64)
        ts = t["ts"].cast("int64").to_numpy() - spatial2.STJ_T0_US
        px, py = _seg_points(eid)
        order = np.argsort(eid)
        eid, ts, px, py = eid[order], ts[order], px[order], py[order]
        e2, _ = spatial2._stdb_geometry(eid.size)
        d2 = ((px[:, None] - px[None, :]) ** 2
              + (py[:, None] - py[None, :]) ** 2)
        nb = ((d2 <= e2)
              & (np.abs(ts[:, None] - ts[None, :]) <= spatial2.STDB_TAU_US))
        np.fill_diagonal(nb, False)
        deg = nb.sum(axis=1)
        is_core = deg >= spatial2.STDB_MINPTS - 1
        parent = list(range(eid.size))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        ci = np.nonzero(is_core)[0]
        for i in ci:
            for j in ci[ci > i]:
                if nb[i, j]:
                    a, b = find(i), find(j)
                    if a != b:
                        parent[max(a, b)] = min(a, b)
        # min event id per component root
        roots = {}
        for i in ci:
            r = find(i)
            roots[r] = min(roots.get(r, 1 << 62), int(eid[i]))
        cluster = np.full(eid.size, -1, np.int64)
        role = np.full(eid.size, "noise", object)
        for i in ci:
            role[i] = "core"
            cluster[i] = roots[find(i)]
        for i in np.nonzero(~is_core)[0]:
            adj_cores = [j for j in np.nonzero(nb[i])[0] if is_core[j]]
            if adj_cores:
                role[i] = "border"
                cluster[i] = min(roots[find(j)] for j in adj_cores)
        ref = pd.DataFrame({"event_id": eid, "role": role,
                            "cluster": cluster})
        ref["role"] = ref["role"].astype(str)
        pd.testing.assert_frame_equal(
            out, ref.astype({"event_id": "int64", "cluster": "int64"}))
        assert (out["role"] == "core").any()


class TestStkde:
    def test_matches_dense_numpy(self, ray_session):
        out = spatial2.q_stkde(SF001)
        from raster_functions_ray.spatial import ST_BIN_US, ST_T0_US
        t = pq.read_table(SF001 + "/events.parquet",
                          columns=["event_id", "ts"])
        eid = np.asarray(t["event_id"], np.int64)
        us = t["ts"].cast("int64").to_numpy()
        day = (us - ST_T0_US) // ST_BIN_US
        ok = (day >= 0) & (day < spatial2.STK_DAYS)
        eid, day = eid[ok], day[ok]
        px, py = _seg_points(eid)
        C, R, TW = spatial2.STK_C, spatial2.STK_R, spatial2.STK_TW
        acc = {}
        for i in range(eid.size):
            for gx in range(int(px[i]) // C - 2, int(px[i]) // C + 3):
                for gy in range(int(py[i]) // C - 2, int(py[i]) // C + 3):
                    dx = 2 * int(px[i]) - (2 * gx * C + C)
                    dy = 2 * int(py[i]) - (2 * gy * C + C)
                    wsp = (2 * R) ** 2 - (dx * dx + dy * dy)
                    if wsp <= 0:
                        continue
                    for dd in range(-(TW - 1), TW):
                        td = int(day[i]) + dd
                        if 0 <= td < spatial2.STK_DAYS:
                            key = (gx, gy, td)
                            acc[key] = acc.get(key, 0) \
                                + wsp * (TW * TW - dd * dd)
        ref = pd.DataFrame([(k[0], k[1], k[2], v)
                            for k, v in sorted(acc.items())],
                           columns=["cx", "cy", "day", "density"]
                           ).astype("int64")
        pd.testing.assert_frame_equal(out, ref.reset_index(drop=True))


class TestGeodesicArea:
    def test_quantization_margin_and_plausibility(self, ray_session):
        out = spatial2.q_geodesic_area(SF01)
        assert (out["area_q"] > 0).all()
        # margin: no triangle excess sits near a floor(+0.5) boundary —
        # the condition making the quantized-trig gate robust to 1-ulp
        # libm differences (q_haversine_dist discipline)
        from raster_functions_ray import synth
        d = synth.synth_dir(0.01)
        t = pq.read_table(d + "/zones.parquet",
                          columns=["zone_id", "vertices"])
        rad = np.pi / 180.0
        worst = 1.0
        for row in t["vertices"].to_pylist():
            v = np.asarray(row, np.float64)
            xs, ys = v[0::2], v[1::2]
            ax, ay = xs[0], ys[0]
            for i in range(1, xs.size - 1):
                def hv(x1, y1, x2, y2):
                    h = (np.sin((y2 - y1) * rad / 2.0) ** 2
                         + np.cos(y1 * rad) * np.cos(y2 * rad)
                         * np.sin((x2 - x1) * rad / 2.0) ** 2)
                    return 2.0 * np.arcsin(np.sqrt(h))
                a = hv(xs[i], ys[i], xs[i + 1], ys[i + 1])
                b = hv(ax, ay, xs[i + 1], ys[i + 1])
                c = hv(ax, ay, xs[i], ys[i])
                s = (a + b + c) / 2.0
                tt = (np.tan(s / 2.0) * np.tan((s - a) / 2.0)
                      * np.tan((s - b) / 2.0) * np.tan((s - c) / 2.0))
                e = 4.0 * np.arctan(np.sqrt(max(tt, 0.0)))
                frac = (e * spatial2.GEO_QUANT + 0.5) % 1.0
                worst = min(worst, frac, 1.0 - frac)
        assert worst > 1e-4, f"quantization margin too thin: {worst}"
        # spherical area of a small zone ≈ its planar deg² area in sr
        planar = out["area_q"].sum() / spatial2.GEO_QUANT
        assert 0.01 < planar < 10.0


class TestStrahlerOrder:
    def test_matches_recursive_reference(self, ray_session):
        out = spatial2.q_strahler_order(SF001)
        from raster_functions_ray.rasterqueries import (_D8_N, _D8_TILES,
                                                        _d8_dem,
                                                        d8_directions,
                                                        D8_OFFS)
        import sys
        sys.setrecursionlimit(10000)
        n = _D8_N
        hist = {}
        dems = _d8_dem(np.arange(_D8_TILES, dtype=np.int64))
        for s in range(_D8_TILES):
            best, has_down = d8_directions(dems[s])
            dy = np.array([o[0] for o in D8_OFFS])[best]
            dx = np.array([o[1] for o in D8_OFFS])[best]
            idx = np.arange(n * n).reshape(n, n)
            rr, cc = idx // n, idx % n
            nxt = np.where(has_down, (rr + dy.reshape(n, n)) * n
                           + (cc + dx.reshape(n, n)), -1).ravel()
            children = [[] for _ in range(n * n)]
            for u in range(n * n):
                if nxt[u] >= 0:
                    children[int(nxt[u])].append(u)
            memo = {}

            def order(v):   # textbook recursion
                if v in memo:
                    return memo[v]
                ch = children[v]
                if not ch:
                    memo[v] = 1
                    return 1
                os_ = sorted((order(u) for u in ch), reverse=True)
                o = os_[0] + (1 if len(os_) > 1 and os_[1] == os_[0] else 0)
                memo[v] = o
                return o

            for v in range(n * n):
                k = (s, order(v))
                hist[k] = hist.get(k, 0) + 1
        ref = pd.DataFrame([(s, o, c) for (s, o), c in sorted(hist.items())],
                           columns=["tile_idx", "strahler", "n_cells"]
                           ).astype("int64")
        pd.testing.assert_frame_equal(out, ref.reset_index(drop=True))
        assert out["strahler"].max() >= 2   # real junction structure exists


class TestLineDensity:
    def test_matches_bruteforce_cells(self, ray_session):
        out = spatial2.q_line_density(SF001)
        from raster_functions_ray.spatial import (_seg_dist_parts,
                                                  _seg_endpoints)
        keys = np.asarray(pq.read_table(
            SF001 + "/orders.parquet", columns=["o_orderkey"])["o_orderkey"],
            np.int64)
        x1, y1, x2, y2 = _seg_endpoints(keys)
        C, R = spatial2.LD_C, spatial2.LD_R
        R2D = (2 * R) ** 2
        acc = {}
        for i in range(keys.size):
            lo_x = (min(x1[i], x2[i]) - R) // C
            hi_x = (max(x1[i], x2[i]) + R) // C
            lo_y = (min(y1[i], y2[i]) - R) // C
            hi_y = (max(y1[i], y2[i]) + R) // C
            for gx in range(int(lo_x), int(hi_x) + 1):
                for gy in range(int(lo_y), int(hi_y) + 1):
                    num, den = _seg_dist_parts(
                        np.array([2 * gx * C + C]),
                        np.array([2 * gy * C + C]),
                        np.array([2 * x1[i]]), np.array([2 * y1[i]]),
                        np.array([2 * x2[i]]), np.array([2 * y2[i]]))
                    if num[0] <= R2D * den[0]:
                        acc[(gx, gy)] = acc.get((gx, gy), 0) + 1
        ref = pd.DataFrame([(k[0], k[1], v)
                            for k, v in sorted(acc.items())],
                           columns=["cx", "cy", "n_segs"]).astype("int64")
        pd.testing.assert_frame_equal(out, ref.reset_index(drop=True))


class TestStayPoints:
    def test_matches_textbook_scan(self, ray_session):
        out = spatial2.q_stay_points(SF001)
        assert len(out) > 0
        t = pq.read_table(SF001 + "/events.parquet",
                          columns=["event_id", "ts", "user_id"]).to_pandas()
        t["ts"] = t["ts"].astype("int64")
        from raster_functions_ray.spatial import DP_STEP_MOD, _seg_mix
        rows = []
        for u, g in t.sort_values(["user_id", "ts", "event_id"]).groupby(
                "user_id"):
            eid = g["event_id"].to_numpy(np.int64)
            ts = g["ts"].to_numpy(np.int64)
            px = np.cumsum(_seg_mix(3_000_000_000 + 2 * eid,
                                    DP_STEP_MOD) - 50)
            py = np.cumsum(_seg_mix(3_000_000_001 + 2 * eid,
                                    DP_STEP_MOD) - 50)
            i, c = 0, eid.size
            while i < c:
                j = i
                while j + 1 < c and ((px[j + 1] - px[i]) ** 2
                                     + (py[j + 1] - py[i]) ** 2
                                     <= spatial2.STAY_R2):
                    j += 1
                if ts[j] - ts[i] >= spatial2.STAY_TAU_US:
                    rows.append((u, i, j, j - i + 1, int(ts[j] - ts[i])))
                    i = j + 1
                else:
                    i += 1
        ref = (pd.DataFrame(rows, columns=["user_id", "start_seq",
                                           "end_seq", "n_pings", "dur_us"])
               .astype("int64").sort_values(["user_id", "start_seq"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(out, ref)


class TestViterbiMatch:
    def test_dp_table_matches_reference_and_decodes(self, ray_session):
        out = spatial2.q_viterbi_match(SF001)
        assert len(out) > 0
        from raster_functions_ray.spatial import (SEG_R, _seg_dist_parts,
                                                  _seg_endpoints)
        ev = pq.read_table(SF001 + "/events.parquet",
                           columns=["event_id", "user_id", "ts"]).to_pandas()
        ev["ts"] = ev["ts"].astype("int64")
        k = np.asarray(pq.read_table(SF001 + "/orders.parquet",
                                     columns=["o_orderkey"])["o_orderkey"],
                       np.int64)
        x1, y1, x2, y2 = _seg_endpoints(k)
        eid = ev["event_id"].to_numpy(np.int64)
        px, py = _seg_points(eid)
        num, den = _seg_dist_parts(px[:, None], py[:, None], x1[None, :],
                                   y1[None, :], x2[None, :], y2[None, :])
        within = num <= SEG_R * SEG_R * den
        rows = []
        for u, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
            idxs = [i for i in g.index if within[i].any()][:spatial2.VIT_K]
            prev = {}
            for kk, i in enumerate(idxs):
                cur = {}
                for j in np.nonzero(within[i])[0]:
                    emit = int(spatial2.VIT_EMIT_SCALE * num[i, j]
                               // den[i, j])
                    if kk == 0:
                        cur[int(k[j])] = emit
                    else:
                        cur[int(k[j])] = emit + min(
                            pc + (0 if ps == int(k[j])
                                  else spatial2.VIT_SWITCH)
                            for ps, pc in prev.items())
                rows.extend((int(u), kk, s, c)
                            for s, c in sorted(cur.items()))
                prev = cur
        ref = (pd.DataFrame(rows, columns=["user_id", "k", "seg_id",
                                           "cost"]).astype("int64")
               .sort_values(["user_id", "k", "seg_id"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(out, ref)
        # costs are monotone in k per user (each step adds >= 0)
        m = out.groupby(["user_id", "k"])["cost"].min().reset_index()
        for u, g in m.groupby("user_id"):
            assert (g.sort_values("k")["cost"].diff().dropna() >= 0).all()


class TestCostPath:
    def test_path_is_valid_downhill_walk(self, ray_session):
        out = spatial2.q_cost_path(SF001)
        assert len(out) > 0
        from raster_functions_ray.regions import (GRID_W, cost_field,
                                                  euc_seeds)
        cost = cost_field(0, 0, GRID_W, GRID_W)
        seeds = set(zip(*euc_seeds(0, 0, GRID_W, GRID_W)))
        for tid, g in out.groupby("tile_idx"):
            g = g.sort_values("step")
            rr = g["r"].to_numpy()
            cc = g["c"].to_numpy()
            aa = g["acc"].to_numpy()
            # ends at a seed with acc 0
            assert aa[-1] == 0 and (int(rr[-1]), int(cc[-1])) in seeds
            # each hop is a 4-neighbor move dropping exactly cost(entered)
            for i in range(len(g) - 1):
                assert abs(rr[i] - rr[i + 1]) + abs(cc[i] - cc[i + 1]) == 1
                assert aa[i + 1] == aa[i] - cost[rr[i], cc[i]]


class TestRectIntersectArea:
    def test_matches_bruteforce_pairs(self, ray_session):
        out = spatial2.q_rect_intersect_area(SF001)
        assert len(out) > 0
        keys = np.asarray(pq.read_table(
            SF001 + "/orders.parquet", columns=["o_orderkey"])["o_orderkey"],
            np.int64)
        x1, y1, w, h = spatial2._ua_rects(keys)
        x2, y2 = x1 + w, y1 + h
        iw = (np.minimum(x2[:, None], x2[None, :])
              - np.maximum(x1[:, None], x1[None, :]))
        ih = (np.minimum(y2[:, None], y2[None, :])
              - np.maximum(y1[:, None], y1[None, :]))
        hit = (keys[:, None] < keys[None, :]) & (iw > 0) & (ih > 0)
        i, j = np.nonzero(hit)
        ref = (pd.DataFrame({"a_id": keys[i], "b_id": keys[j],
                             "ix_area": iw[i, j] * ih[i, j]})
               .astype("int64").sort_values(["a_id", "b_id"])
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(out, ref)


class TestCoTravel:
    def test_matches_bruteforce_rollup(self, ray_session):
        out = spatial2.q_co_travel(SF01)
        assert len(out) > 0
        t = pq.read_table(SF01 + "/events.parquet",
                          columns=["event_id", "user_id", "ts"])
        eid = np.asarray(t["event_id"], np.int64)
        uid = np.asarray(t["user_id"], np.int64)
        ts = t["ts"].cast("int64").to_numpy() - spatial2.STJ_T0_US
        px, py = _seg_points(eid)
        acc = {}
        R2 = spatial2.CT_R ** 2
        for s in range(0, eid.size, 2000):
            e = min(s + 2000, eid.size)
            d2 = ((px[s:e, None] - px[None, :]) ** 2
                  + (py[s:e, None] - py[None, :]) ** 2)
            dt = np.abs(ts[None, :] - ts[s:e, None])
            hit = ((eid[s:e, None] < eid[None, :])
                   & (uid[s:e, None] != uid[None, :])
                   & (d2 <= R2) & (dt <= spatial2.CT_TAU_US))
            i, j = np.nonzero(hit)
            for a, b, d in zip(uid[s:e][i], uid[j], d2[i, j]):
                k = (min(a, b), max(a, b))
                n, m = acc.get(k, (0, 1 << 62))
                acc[k] = (n + 1, min(m, int(d)))
        rows = [(k[0], k[1], v[0], v[1]) for k, v in sorted(acc.items())
                if v[0] >= spatial2.CT_MIN_CONTACTS]
        ref = pd.DataFrame(rows, columns=["ua", "ub", "n_contacts",
                                          "min_d2"]).astype("int64")
        pd.testing.assert_frame_equal(out, ref.reset_index(drop=True))


class TestTbChecked:
    """The 3-D blocking key's <64-bucket collision invariant is loud."""

    def test_in_range_passes_through(self):
        tb = np.array([0, 30, 61], np.int64)
        out = spatial2._tb_checked(tb)
        assert out is tb

    def test_out_of_range_raises(self):
        import pytest

        with pytest.raises(ValueError):
            spatial2._tb_checked(np.array([62], np.int64))
        with pytest.raises(ValueError):
            spatial2._tb_checked(np.array([-1], np.int64))

    def test_empty_ok(self):
        assert spatial2._tb_checked(np.empty(0, np.int64)).size == 0
