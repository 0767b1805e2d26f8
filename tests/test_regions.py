"""Region labeling: distributed tile-merge result == whole-grid labeling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raster_functions_ray import regions


def _whole_grid_reference() -> pd.DataFrame:
    """Single-array labeling of the full grid — no tiling, no merge."""
    W = regions.GRID_W
    mask = regions.percolation_mask(0, 0, W, W)
    ids = np.arange(W * W, dtype=np.int64).reshape(W, W)
    lab = regions.label_min_propagation(mask, ids)
    flat_lab, flat_ids = lab.ravel(), ids.ravel()
    sel = flat_lab >= 0
    df = pd.DataFrame({
        "region_id": flat_lab[sel],
        "r": flat_ids[sel] // W,
        "c": flat_ids[sel] % W,
    })
    out = (df.groupby("region_id", as_index=False)
           .agg(px_count=("r", "size"), min_r=("r", "min"), min_c=("c", "min"),
                max_r=("r", "max"), max_c=("c", "max")))
    return out.sort_values("region_id").reset_index(drop=True)


def test_region_label_matches_whole_grid(ray_session):
    got = regions.q_region_label("/root/testdata/sf0.001")
    ref = _whole_grid_reference()
    pd.testing.assert_frame_equal(
        got.astype("int64"), ref[got.columns].astype("int64"))


@settings(max_examples=50, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), h=st.integers(2, 24), w=st.integers(2, 24))
def test_union_find_agrees_with_propagation(seed, h, w):
    """Driver union-find and vectorized min-propagation give the same
    components on random masks (adversarial shapes incl. snakes/rings)."""
    rng = np.random.default_rng(seed)
    mask = rng.random((h, w)) < 0.55
    ids = np.arange(h * w, dtype=np.int64).reshape(h, w)
    lab = regions.label_min_propagation(mask, ids)
    # build the 4-adjacency edge list over masked pixels
    pairs = []
    m = mask
    right = m[:, :-1] & m[:, 1:]
    down = m[:-1, :] & m[1:, :]
    for sel, (a, b) in ((right, (ids[:, :-1], ids[:, 1:])),
                        (down, (ids[:-1, :], ids[1:, :]))):
        pairs.append(np.stack([a[sel], b[sel]], axis=1))
    e = np.concatenate(pairs) if pairs else np.empty((0, 2), np.int64)
    if len(e) == 0:
        # every masked pixel is its own component
        assert np.array_equal(lab[mask], ids[mask])
        return
    uf = regions.union_find_labels(e[:, 0], e[:, 1])
    lut = dict(zip(uf["node"], uf["label"]))
    expect = np.array([lut.get(i, i) for i in ids[mask]])
    assert np.array_equal(lab[mask], expect)


def test_los_viewshed_matches_sequential_scan(ray_session):
    """Two-phase distributed prefix-max == straight per-row sequential
    scan over the whole grid."""
    got = regions.q_los_viewshed("/root/testdata/sf0.001")
    W = regions.GRID_W
    rows = []
    for r in range(W):
        c = np.arange(1, W)
        z = regions.los_dem(np.full(W - 1, r), c)
        z0 = regions.los_dem(np.array([r]), np.array([0]))[0] + regions.OBS_H
        tan = (z - z0).astype(np.float64) / c.astype(np.float64)
        run = np.maximum.accumulate(np.concatenate([[-np.inf], tan[:-1]]))
        vis = tan > run
        rows.append((r, int(vis.sum()), int(c[vis].max()) if vis.any() else -1))
    ref = pd.DataFrame(rows, columns=["r", "visible_count", "far_c"])
    pd.testing.assert_frame_equal(got.astype("int64"), ref.astype("int64"))


def test_region_geometry_matches_bruteforce(ray_session):
    """Distributed perimeter (4·area − 2·adjacency partials) equals the
    brute-force exposed-edge count over the whole unpadded grid."""
    got = regions.q_region_geometry("/root/testdata/sf0.001")
    W = regions.GRID_W
    mask = regions.percolation_mask(0, 0, W, W)
    ids = np.arange(W * W, dtype=np.int64).reshape(W, W)
    lab = regions.label_min_propagation(mask, ids)
    pad = np.pad(mask, 1, constant_values=False)
    exposed = ((~pad[:-2, 1:-1]).astype(int) + (~pad[2:, 1:-1]).astype(int)
               + (~pad[1:-1, :-2]).astype(int) + (~pad[1:-1, 2:]).astype(int))
    df = pd.DataFrame({"region_id": lab[mask], "edges": exposed[mask]})
    ref = (df.groupby("region_id", as_index=False)
           .agg(px_count=("edges", "size"), perimeter=("edges", "sum")))
    merged = got.merge(ref, on="region_id", suffixes=("", "_ref"))
    assert len(merged) == len(got) == len(ref)
    assert (merged.px_count == merged.px_count_ref).all()
    assert (merged.perimeter == merged.perimeter_ref).all()


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_watershed_pointer_doubling_equals_sequential_walk(seed):
    """Pointer doubling reaches the same sink as a cell-by-cell walk on
    random integer DEMs."""
    from raster_functions_ray import rasterqueries as rq

    rng = np.random.default_rng(seed)
    n = 12
    dem = rng.integers(0, 4096, (n, n)).astype(np.float64)
    best, has_down = rq.d8_directions(dem)
    dy = np.array([o[0] for o in rq.D8_OFFS])[best]
    dx = np.array([o[1] for o in rq.D8_OFFS])[best]
    idx = np.arange(n * n, dtype=np.int64).reshape(n, n)
    rr, cc = idx // n, idx % n
    nxt = np.where(has_down, (rr + dy) * n + (cc + dx), idx).ravel()
    doubled = nxt.copy()
    while True:
        jump = doubled[doubled]
        if np.array_equal(jump, doubled):
            break
        doubled = jump
    for start in range(n * n):
        cur = start
        for _ in range(n * n + 1):
            if nxt[cur] == cur:
                break
            cur = nxt[cur]
        assert doubled[start] == cur


def test_mask_is_subcritical():
    """The gate world must stay oracle-friendly: bounded component size."""
    ref = _whole_grid_reference()
    assert ref["px_count"].max() < 1000
    assert len(ref) > 10000


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_flow_length_doubling_equals_sequential(seed):
    """Pointer doubling with weight accumulation == step-by-step walk."""
    from raster_functions_ray import rasterqueries as rq

    rng = np.random.default_rng(seed)
    n = 10
    dem = rng.integers(0, 4096, (n, n)).astype(np.float64)
    best, has_down = rq.d8_directions(dem)
    dy = np.array([o[0] for o in rq.D8_OFFS])[best]
    dx = np.array([o[1] for o in rq.D8_OFFS])[best]
    diag = ((dy != 0) & (dx != 0)).ravel()
    idx = np.arange(n * n, dtype=np.int64).reshape(n, n)
    rr, cc = idx // n, idx % n
    nxt = np.where(has_down, (rr + dy) * n + (cc + dx), idx).ravel()
    hd = has_down.ravel()
    ns = (hd & ~diag).astype(np.int64)
    nd = (hd & diag).astype(np.int64)
    while True:
        jump = nxt[nxt]
        if np.array_equal(jump, nxt):
            break
        ns = ns + ns[nxt]
        nd = nd + nd[nxt]
        nxt = jump
    # sequential truth
    nxt0 = np.where(hd, (rr.ravel() + dy.ravel()) * n
                    + (cc.ravel() + dx.ravel()), idx.ravel())
    for start in range(n * n):
        cur, es, ed = start, 0, 0
        while nxt0[cur] != cur:
            step_diag = diag[cur]
            es += 0 if step_diag else 1
            ed += 1 if step_diag else 0
            cur = nxt0[cur]
        assert ns[start] == es and nd[start] == ed


class TestGeostatOperators:
    def test_morans_i_moments_and_value(self, ray_session):
        from raster_functions_ray import regions

        out = regions.q_morans_i("/root/testdata/sf0.001")
        assert len(out) == 1
        m = out.iloc[0]
        assert int(m["n_pix"]) == regions.GRID_W ** 2
        # rook lattice: W_und = 2·n·(n−1)
        assert int(m["w_und"]) == 2 * regions.GRID_W * (regions.GRID_W - 1)
        i_val = regions.morans_i_value(m)
        # the counter field is white noise: I must sit near −1/(N−1) ≈ 0,
        # far from the ±1 extremes structured fields produce
        assert abs(i_val) < 0.01, i_val

    def test_contour_case_histogram_conservation(self, ray_session):
        from raster_functions_ray import regions

        out = regions.q_contour_cases("/root/testdata/sf0.001")
        n_cells = (regions.GRID_W - 1) ** 2
        for lv in regions.CONTOUR_LEVELS:
            sub = out[out["level"] == lv]
            assert int(sub["n_cells"].sum()) == n_cells
            # saddle + segment cases must exist in a noise field
            assert set(sub["case_id"]) == set(range(16))

    def test_idw_within_value_range(self, ray_session):
        from raster_functions_ray import regions

        out = regions.q_idw_interp("/root/testdata/sf0.001")
        # a weighted integer mean of values < VMOD stays < VMOD
        assert (out["max_idw"] < regions.IDW_VMOD).all()
        assert (out["n_interp"] > 0).all()
        assert (out["sum_idw"] >= 0).all()

    def test_zonal_percentiles_monotone(self, ray_session):
        from raster_functions_ray import regions

        out = regions.q_zonal_percentiles("/root/testdata/sf0.001")
        assert len(out) == regions.GRID_TILES ** 2
        assert (out["p25"] <= out["p50"]).all()
        assert (out["p50"] <= out["p75"]).all()
        # white-noise field: quartiles of [0,1000) sit near 250/500/750
        assert (out["p50"] - 500).abs().max() < 60

    def test_hist_equalize_flattens(self, ray_session):
        from raster_functions_ray import regions

        out = regions.q_hist_equalize("/root/testdata/sf0.001")
        n_px = regions.TILE_PX ** 2
        # equalized mean per tile ≈ (L-1)/2 — the point of equalization
        mean = out["sum_eq"].sum() / (len(out) * n_px)
        assert abs(mean - (regions.HEQ_L - 1) / 2) < 3.0
        assert out["min_eq"].min() == 0
        assert out["max_eq"].max() == regions.HEQ_L - 1

    def test_terrain_trig_margins(self, ray_session):
        """Every distinct (Δx, Δy) gradient pair over the analytic world
        must quantize with wide margin — the guard that makes the
        micro-degree trig gate safe against ≤2-ulp atan/atan2 drift."""
        import numpy as np

        from raster_functions_ray import analytic2 as a2
        from raster_functions_ray import synth
        from raster_functions_ray.functions import focal as fc

        p = synth.params_for(0.01)
        n = p.tiles_per_side * p.tile_px
        for s in range(synth.A_SCENES):
            gr, gc = np.meshgrid(np.arange(n, dtype=np.float64),
                                 np.arange(n, dtype=np.float64),
                                 indexing="ij")
            dem = synth.analytic_band0(s, 0, gr, gc)
            dem_pad = np.pad(dem, 1, mode="edge")
            delta_x = fc.convolve3x3(dem_pad, fc.ASPECT_X) / 8.0
            delta_y = fc.convolve3x3(dem_pad, fc.ASPECT_Y) / 8.0
            dx, dy = delta_x / 30.0, delta_y / 30.0
            slope = 57.29578 * np.arctan(np.sqrt(dx * dx + dy * dy))
            aspect = 57.29578 * np.arctan2(delta_x, -delta_y)
            aspect = np.where(aspect < 0.0,
                              (360.0 - (90.0 - aspect)) + 90.0, aspect)
            for v in (slope, aspect):
                d = np.unique(v) * a2.TRIG_QUANT + 0.5
                margin = np.abs(d - np.round(d)).min()
                # ≤2-ulp trig drift perturbs d by ≲1e-13·|d| ≈ 1e-5
                # quanta; demand 1000× headroom
                assert margin > 1e-2, (s, margin)
