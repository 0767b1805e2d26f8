"""Full-corpus gate for the .rft.xml loader: every template shipped by the
reference (47 files under functions/ + functions/deprecated/) must parse,
lower to a kernel, and run over a synthetic tile — plus semantic
spot-checks proving the new adapter mappings dispatch to the same engine
kernels the hand-built pipelines use (functions/pointwise.py, focal.py,
stack.py)."""

import glob

import numpy as np
import pytest

from raster_functions_ray.functions import focal as fc
from raster_functions_ray.functions import pointwise as pw
from raster_functions_ray.functions import stack as st
from raster_functions_ray.pipelines import rft

REF = "/root/reference/functions"
CORE = 20


def _inputs(tmpl, nb_min=26, seed=7):
    pad = rft.template_padding(tmpl)
    names = rft.dataset_vars(tmpl)
    H = CORE + 2 * pad
    nb = max(len(names), nb_min)
    rng = np.random.default_rng(seed)
    p = rng.uniform(1.0, 180.0, (nb, H, H))
    for i, nm in enumerate(names):
        low = nm.lower()
        if "mask" in low:  # inpaint cloud masks: sparse binary
            p[i] = (p[i] > 170).astype(float)
        elif "zone" in low:  # zone ids: small integers
            p[i] = np.floor(p[i] % 5.0)
    m = np.ones((H, H), dtype=np.uint8)
    meta = {"width": CORE, "height": CORE,
            "extent": (-120.0, 44.0, -119.0, 45.0),
            "cell_size": (30.0, 30.0), "tile_id": 3,
            "ztable": {i: [(10.0, 150.0, 7.0)] for i in range(5)}}
    return p, m, meta


def _run(path, **kw):
    t = rft.parse_rft(path)
    p, m, meta = _inputs(t, **kw)
    out, msk = rft.template_kernel(t)(p, m, meta)
    return np.asarray(out), np.asarray(msk), p, m, meta


class TestCorpusRuns:
    def test_every_reference_template_parses_and_runs(self):
        files = sorted(glob.glob(f"{REF}/**/*.rft.xml", recursive=True))
        assert len(files) == 47
        for f in files:
            out, msk, _, _, _ = _run(f)
            assert out.ndim in (2, 3), f
            assert msk.shape == out.shape[-2:], f
            # every kernel must produce at least one finite pixel
            assert np.isfinite(out).any(), f


class TestAdapterSemantics:
    def test_windchill_matches_kernel(self):
        out, msk, p, m, _ = _run(f"{REF}/deprecated/Windchill.rft.xml")
        exp, expm = pw.windchill(p[0], p[1], mask_t=m, mask_ws=m)
        np.testing.assert_array_equal(out, exp)
        np.testing.assert_array_equal(msk, expm)

    def test_heat_index_matches_kernel(self):
        out, _, p, _, _ = _run(f"{REF}/deprecated/HeatIndex.rft.xml")
        np.testing.assert_array_equal(out, pw.heat_index(p[0], p[1]))

    def test_fish_habitat_binds_depth_scalar(self):
        out, _, p, _, _ = _run(f"{REF}/FishHabitatSuitability.rft.xml")
        exp = pw.fish_habitat_suitability(p[0], p[1], 0.0)
        np.testing.assert_array_equal(out, exp)

    def test_aggregate_deviation_from_mean(self):
        # DeviationFromMean = Arithmetic(Subtract, R, Aggregate(mean over
        # the mosaic)) — the mosaic axis is the tile's band axis
        out, _, p, _, _ = _run(f"{REF}/deprecated/DeviationFromMean.rft.xml")
        exp = pw.arithmetic(p[0], np.mean(p, axis=0), "Subtract")
        np.testing.assert_array_equal(out, exp)

    def test_find_second_max_matches_kernel(self):
        out, _, p, _, _ = _run(f"{REF}/FindSecondMaxPixel_Mosaic.rft.xml")
        np.testing.assert_array_equal(out, st.find_kth_max(p, 2))

    def test_block_statistics_downsamples(self):
        out, msk, p, m, _ = _run(f"{REF}/BlockStatistics.rft.xml")
        assert out.shape == (CORE // 5, CORE // 5)  # template size=5
        exp = fc.block_statistics(p[0], m, 5, "mean")
        np.testing.assert_array_equal(out, exp)
        assert msk.shape == out.shape

    def test_rank_filter_trims_halo(self):
        out, _, p, _, _ = _run(f"{REF}/RankFilter.rft.xml")
        assert out.shape == (CORE, CORE)
        np.testing.assert_array_equal(out, fc.rank_filter(p[0], 5, "mean"))

    def test_scale_adjusted_hillshade_params(self):
        out, _, p, m, meta = _run(f"{REF}/deprecated/Hillshade-ScaleAdjusted-Py.rft.xml")
        exp, _ = fc.hillshade(p[0], m, meta["cell_size"],
                              z_factor=1.0, ce=0.664, cf=0.024)
        np.testing.assert_array_equal(out, exp)

    def test_merge_rasters_first_finite_wins(self):
        t = rft.parse_rft(f"{REF}/deprecated/MergeRasters.rft.xml")
        p, m, meta = _inputs(t, nb_min=3)
        p[0, 2, 3] = np.nan
        p[1, 2, 3] = 42.0
        out, _ = rft.template_kernel(t)(p, m, meta)
        assert out[2, 3] == 42.0
        np.testing.assert_array_equal(
            np.delete(np.asarray(out).ravel(), 2 * CORE + 3),
            np.delete(p[0].ravel(), 2 * CORE + 3))

    def test_composite_bands_ordered(self):
        out, _, p, _, _ = _run(f"{REF}/CompositeBands-4Bands-Ordered.rft.xml")
        np.testing.assert_array_equal(out, p[:4])

    def test_ndsi_band_arithmetic_and_stretch(self):
        # Colormap(Stretch(MinMax→[0,255], (B3−B6)/(B6+B3))) — B names are
        # 1-indexed bands
        out, _, p, _, _ = _run(
            f"{REF}/deprecated/Normalized-Difference Snow Index (NDSI) "
            "for Landsat OLI.rft.xml")
        nd = (p[2] - p[5]) / (p[5] + p[2])
        exp = (nd - nd.min()) / (nd.max() - nd.min()) * 255.0
        np.testing.assert_allclose(out, exp, rtol=1e-12)

    def test_percent_above_threshold_block(self):
        out, _, p, _, _ = _run(f"{REF}/PercentAboveThreshold.rft.xml")
        pct = (p <= 50.0).mean() * 100.0  # template threshold=50
        np.testing.assert_allclose(out, np.full((CORE, CORE), pct))

    def test_zonal_remap_applies_meta_table(self):
        out, _, p, _, _ = _run(f"{REF}/deprecated/ZonalRemap.rft.xml")
        # every zone id 0-4 maps (10,150)→7, else background 0
        exp = np.where((p[0] > 10.0) & (p[0] < 150.0), 7.0, 0.0)
        np.testing.assert_array_equal(out, exp)

    def test_select_by_pixel_size_routes_fine_input(self):
        # threshold 0.0 with 30 m cells → mean(30) >= 0 picks r2
        out, _, p, _, _ = _run(f"{REF}/SelectByPixelSize.rft.xml")
        np.testing.assert_array_equal(out, p[1])

    def test_random_is_deterministic_and_tiling_free(self):
        out1, _, _, _, _ = _run(f"{REF}/deprecated/Random.rft.xml")
        out2, _, _, _, _ = _run(f"{REF}/deprecated/Random.rft.xml", seed=99)
        np.testing.assert_array_equal(out1, out2)  # input-independent
        assert out1.min() >= 0 and out1.max() < 200

    def test_sarima_template_uses_css_fit(self):
        out, _, p, _, _ = _run(f"{REF}/SeasonalARIMA.rft.xml")
        exp = st.css_sarima_forecast(
            p.reshape(p.shape[0], -1), s=12, horizon=1)[0][0]
        np.testing.assert_allclose(out, exp.reshape(CORE, CORE))

    def test_inpaint_all_cloud_returns_replacement(self):
        # regression: an all-cloud mask used to spin the cycle loop forever
        from raster_functions_ray.functions.inpaint import (
            stepwise_radiometric_adjustment)
        img = np.full((12, 12), 9.0)
        rep = np.full((12, 12), 5.0)
        out = stepwise_radiometric_adjustment(
            img, rep, np.ones((12, 12), np.uint8), win_size=4)
        np.testing.assert_array_equal(out, rep)
