"""Golden-kernel tests for pointwise ops (FIXTURES.md §5).

Oracles are literal transcriptions of the reference formulas evaluated
inline — the kernels must match exactly (integer) / to fp tolerance (float).
"""

import numpy as np
import pytest

from raster_functions_ray.functions import pointwise as pw
from raster_functions_ray.functions import remap as rm


def ramps(n=5):
    y, x = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32), indexing="ij")
    return y + 1, x + 1


class TestNDVI:
    def test_raw(self):
        red, ir = ramps()
        out = pw.ndvi(red, ir, "Raw")
        exp = (ir - red) / (ir + red)
        np.testing.assert_allclose(out, exp, rtol=1e-6)
        assert out.dtype == np.float32

    def test_scaled_modes(self):
        red, ir = ramps()
        exp = ((ir - red) / (ir + red)) * 100.0 + 100.0
        np.testing.assert_allclose(pw.ndvi(red, ir, "Grayscale"), exp, rtol=1e-6)
        np.testing.assert_allclose(pw.ndvi(red, ir, "Colormap"), exp, rtol=1e-6)

    def test_divide_by_zero_propagates(self):
        out = pw.ndvi(np.zeros((2, 2)), np.zeros((2, 2)), "Raw")
        assert np.all(np.isnan(out))


class TestWindchill:
    def test_fahrenheit_mph(self):
        t = np.full((3, 3), 20.0, np.float32)
        ws = np.full((3, 3), 15.0, np.float32)
        wc, m = pw.windchill(t, ws)
        v16 = 15.0**0.16
        exp = 35.74 + 0.6215 * 20.0 + 0.4275 * 20.0 * v16 - 35.75 * v16
        np.testing.assert_allclose(wc, exp, rtol=1e-5)
        assert m.all()

    def test_negative_wind_masks(self):
        wc, m = pw.windchill(np.full((2, 2), 10.0), np.array([[-1.0, 5.0], [5.0, -2.0]]))
        assert m.tolist() == [[0, 1], [1, 0]]

    def test_celsius_units(self):
        t_c = np.full((2, 2), -5.0, np.float32)
        ws_kph = np.full((2, 2), 30.0, np.float32)
        wc, _ = pw.windchill(t_c, ws_kph, t_units="Celsius", ws_units="kph", out_units="Celsius")
        t_f = 1.8 * -5.0 + 32.0
        ws_mph = 30.0 / 1.609344
        v16 = ws_mph**0.16
        exp_f = 35.74 + 0.6215 * t_f + 0.4275 * t_f * v16 - 35.75 * v16
        np.testing.assert_allclose(wc, (exp_f - 32.0) / 1.8, rtol=1e-4)


class TestHeatIndex:
    def test_simple_region(self):
        # cool temps → simple formula only
        t = np.full((2, 2), 70.0, np.float32)
        r = np.full((2, 2), 50.0, np.float32)
        exp = 0.5 * (70 + 61.0 + ((70 - 68.0) * 1.2) + (50 * 0.094))
        np.testing.assert_allclose(pw.heat_index(t, r), exp, rtol=1e-5)

    def test_rothfusz_region(self):
        t, r = np.float32(96.0), np.float32(65.0)
        out = pw.heat_index(np.full((1, 1), t), np.full((1, 1), r))
        tr, rr, tt = t * r, r * r, t * t
        exp = (-42.379 + 2.04901523 * t + 10.14333127 * r - 0.22475541 * tr
               - 6.83783e-3 * tt - 5.481717e-2 * rr + 1.22874e-3 * tt * r
               + 8.5282e-4 * t * rr - 1.99e-6 * tt * rr)
        np.testing.assert_allclose(out, exp, rtol=1e-4)

    def test_low_humidity_adjustment(self):
        t, r = 96.0, 10.0
        out = float(pw.heat_index(np.full((1, 1), t, np.float32), np.full((1, 1), r, np.float32)))
        tr, rr, tt = t * r, r * r, t * t
        full = (-42.379 + 2.04901523 * t + 10.14333127 * r - 0.22475541 * tr
                - 6.83783e-3 * tt - 5.481717e-2 * rr + 1.22874e-3 * tt * r
                + 8.5282e-4 * t * rr - 1.99e-6 * tt * rr)
        adj = ((13.0 - r) / 4.0) * np.sqrt((17.0 - abs(t - 95.0)) / 17.0)
        np.testing.assert_allclose(out, full - adj, rtol=1e-4)


class TestArithmeticDNBR:
    def test_ops(self):
        a = np.arange(4.0).reshape(2, 2) + 1
        b = np.full((2, 2), 2.0)
        np.testing.assert_allclose(pw.arithmetic(a, b, "Add"), a + b)
        np.testing.assert_allclose(pw.arithmetic(a, b, "Subtract"), a - b)
        np.testing.assert_allclose(pw.arithmetic(a, b, "Multiply"), a * b)
        np.testing.assert_allclose(pw.arithmetic(a, b, "Divide"), a / b)

    def test_dnbr(self):
        n1, s1 = np.full((2, 2), 0.5, np.float32), np.full((2, 2), 0.2, np.float32)
        n2, s2 = np.full((2, 2), 0.3, np.float32), np.full((2, 2), 0.25, np.float32)
        exp = (n1 - s1) / (s1 + n1) - (n2 - s2) / (s2 + n2)
        np.testing.assert_allclose(pw.nbr_difference(n1, s1, n2, s2), exp, rtol=1e-6)


class TestFishVineyard:
    def test_depth_factor(self):
        assert pw.depth_factor(0.0) == 0.0
        assert pw.depth_factor(1.0) == pytest.approx(0.5)
        assert pw.depth_factor(5.0) == 1.0
        assert pw.depth_factor(15.5) == pytest.approx((15.5 - 20) / (11 - 20))
        assert pw.depth_factor(25.0) == 0.0

    def test_fish_mid_range(self):
        t = np.full((2, 2), 27.0, np.float32)  # inside plateau
        s = np.full((2, 2), 33.0, np.float32)
        np.testing.assert_allclose(pw.fish_habitat_suitability(t, s, 5.0), 1.0)

    def test_vineyard(self):
        out = pw.vineyard_analysis(np.array([[100.0]]), np.array([[10.0]]), np.array([[150.0]]))
        assert out[0, 0] == 3
        out = pw.vineyard_analysis(np.array([[10.0]]), np.array([[10.0]]), np.array([[300.0]]))
        assert out[0, 0] == 1


class TestFuzzy:
    def test_linear(self):
        r = np.linspace(0, 10, 11)
        out = pw.fuzzy_membership(r, "linear", par1=2.0, par2=8.0)
        np.testing.assert_allclose(out, np.clip((r - 2.0) / 6.0, 0, 1))

    def test_gaussian_and_hedges(self):
        r = np.array([5.0])
        out = pw.fuzzy_membership(r, "gaussian", par1=5.0, par2=0.1)
        np.testing.assert_allclose(out, 1.0)
        out2 = pw.fuzzy_membership(np.array([4.0]), "gaussian", par1=5.0, par2=0.1, hedge="VERY")
        np.testing.assert_allclose(out2, (np.e ** (-0.1 * 1.0)) ** 2)

    def test_mssmall(self):
        out = pw.fuzzy_membership(np.array([50.0, 150.0]), "mssmall",
                                  par1=1.0, par2=1.0, mean=100.0, std=20.0)
        assert out[0] == 1.0
        np.testing.assert_allclose(out[1], 20.0 / (150.0 - 100.0 + 20.0))

    def test_small_large(self):
        r = np.array([2.0])
        np.testing.assert_allclose(pw.fuzzy_membership(r, "small", par1=2.0, par2=5.0), 0.5)
        np.testing.assert_allclose(pw.fuzzy_membership(r, "large", par1=2.0, par2=5.0), 0.5)


class TestMaskFillQA:
    def test_mask_raster(self):
        pix = np.arange(4.0).reshape(2, 2)
        mp = np.array([[1.0, 0.0], [2.0, -1.0]])
        mm = np.array([[1, 1], [0, 1]], np.uint8)
        out, mask = pw.mask_raster(pix, mp, mm)
        np.testing.assert_array_equal(out, pix)
        assert mask.tolist() == [[1, 0], [0, 0]]

    def test_replace_nulls(self):
        out, m = pw.replace_nulls(np.array([[0.0, 2.0], [3.0, 0.0]]), 9.0)
        assert out.tolist() == [[9.0, 2.0], [3.0, 9.0]]
        assert m.all()

    def test_landsat_qa_bits(self):
        qa = np.array([[0b01000000, 0b00001000], [0b10000000, 0]])
        out = pw.landsat_c2_qa(qa, clear=True)
        assert out.tolist() == [[1, 0], [0, 0]]
        out = pw.landsat_c2_qa(qa, cloud=True, water=True)
        assert out.tolist() == [[0, 1], [1, 0]]

    def test_latitude(self):
        out = pw.latitude_block([0.0, 0.0, 90.0, 60.0], (30.0, 30.0), (2, 3))
        assert out[0].tolist() == [60.0, 60.0, 60.0]
        assert out[1].tolist() == [30.0, 30.0, 30.0]

    def test_fill(self):
        np.testing.assert_array_equal(pw.fill_value((2, 2), 7.0), np.full((2, 2), 7.0, np.float32))


class TestRemapLUT:
    def test_remap(self):
        v = np.array([[1.0, 5.0], [10.0, 20.0]])
        out = rm.remap(v, [0, 4, 4, 12], [100, 200], default=0)
        assert out.tolist() == [[100.0, 200.0], [200.0, 0.0]]

    def test_colormap(self):
        vals = np.array([0, 1, 2])
        rgb = (np.array([10, 20, 30]), np.array([11, 21, 31]), np.array([12, 22, 32]))
        out = rm.colormap_lookup(np.array([[2, 0]]), vals, rgb)
        assert out[:, 0, 0].tolist() == [30, 31, 32]
        assert out[:, 0, 1].tolist() == [10, 11, 12]

    def test_stretch(self):
        out = rm.stretch_minmax(np.array([0.0, 50.0, 100.0, 200.0]), 0, 100)
        np.testing.assert_allclose(out, [0.0, 127.5, 255.0, 255.0])

    def test_zonal_remap(self):
        v = np.array([[10.0, 50.0], [90.0, 50.0]])
        z = np.array([[1, 1], [2, 2]])
        zt = {1: [[20.0, 60.0, 7.0]], 2: [[None, 60.0, None]]}
        out = rm.zonal_remap(v, z, zt, background=0, default_target=255)
        assert out.tolist() == [[0, 7], [0, 255]]

    def test_rasterize_attributes(self):
        v = np.array([[1.0, 2.0]])
        z = np.array([[5, 6]])
        out = rm.rasterize_attributes(v, z, {5: [10.0, 20.0], 6: [30.0, None]}, n_attrs=2)
        assert out[0].tolist() == [[1.0, 2.0]]
        assert out[1].tolist() == [[10.0, 30.0]]
        assert out[2].tolist() == [[20.0, 0.0]]


class TestLinearSpectralUnmixing:
    """Golden oracle for functions/deprecated/LinearSpectralUnmixing.py:60-130."""

    def test_exact_decomposition_raw(self):
        # pixels are exact mixes of orthogonal endmembers -> abundances
        # recovered exactly, RSS ~ 0
        sigs = {"A": [1.0, 0.0, 0.0], "B": [0.0, 1.0, 0.0]}
        a = np.array([[2.0, 3.0], [0.5, 1.0]])
        b = np.array([[1.0, 0.0], [4.0, 2.0]])
        pix = np.stack([a, b, np.zeros((2, 2))])  # 3 bands
        out = pw.linear_spectral_unmixing(pix, sigs, method="Raw")
        assert out.shape == (3, 2, 2)
        np.testing.assert_allclose(out[0], a, atol=1e-5)
        np.testing.assert_allclose(out[1], b, atol=1e-5)
        np.testing.assert_allclose(out[2], 0.0, atol=1e-5)

    def test_scaled_matches_hand_oracle(self):
        sigs = {"A": [1.0, 0.0, 0.0], "B": [0.0, 1.0, 0.0]}
        a = np.array([[2.0, 4.0]])
        b = np.array([[1.0, 2.0]])
        pix = np.stack([a, b, np.zeros((1, 2))])
        out = pw.linear_spectral_unmixing(pix, sigs, method="Scaled")
        # global max across endmember bands = 4 -> scaled by 1/4
        np.testing.assert_allclose(out[0], a / 4.0, atol=1e-5)
        np.testing.assert_allclose(out[1], b / 4.0, atol=1e-5)
        # exact fit -> RSS=0 -> R2 = 1 everywhere
        np.testing.assert_allclose(out[2], 1.0, atol=1e-5)

    def test_negative_abundance_clipped_in_scaled(self):
        # y = [0, 1, 0] against A=[1,0,0], B=[1,1,0] solves to (a,b)=(-1,1):
        # Scaled mode clips the negative abundance to 0
        sigs = {"A": [1.0, 0.0, 0.0], "B": [1.0, 1.0, 0.0]}
        pix = np.stack([np.zeros((1, 1)), np.ones((1, 1)), np.zeros((1, 1))])
        out = pw.linear_spectral_unmixing(pix, sigs, method="Scaled")
        assert (out[:2] >= 0).all() and (out[:2] <= 1).all()
        assert out[0, 0, 0] == 0.0


class TestRemoveNoData:
    def test_replaces_masked_and_forces_valid(self):
        p = np.array([[1.0, 2.0], [3.0, 4.0]])
        m = np.array([[1, 0], [0, 1]], np.uint8)
        out, om = pw.remove_nodata(p, m, 0.0)
        assert out.tolist() == [[1.0, 0.0], [0.0, 4.0]]
        assert om.tolist() == [[1, 1], [1, 1]]

    def test_multiband(self):
        p = np.ones((2, 2, 2))
        m = np.array([[1, 0], [1, 1]], np.uint8)
        out, om = pw.remove_nodata(p, m, -5.0)
        assert out[0, 0, 1] == -5.0 and out[1, 0, 1] == -5.0
        assert out[0, 0, 0] == 1.0


class TestSelectByPixelSize:
    def test_mean_and_strict_threshold(self):
        # reference routes on 0.5*(csx+csy) < threshold (SelectByPixelSize.py
        # selectRasters): equality picks the COARSER raster
        assert pw.select_by_pixel_size(30.0, 60.0) == 0
        assert pw.select_by_pixel_size(60.0, 60.0) == 1
        assert pw.select_by_pixel_size(30.0, 40.0, cell_size_y=50.0) == 1
        assert pw.select_by_pixel_size(30.0, 41.0, cell_size_y=50.0) == 0
