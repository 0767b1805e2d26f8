"""The .rft.xml template loader must reproduce hand-built kernel chains
bit-for-bit (pipelines/rft.py — the reference user's switch-over surface)."""

import numpy as np
import pytest

from raster_functions_ray.functions import focal as fc
from raster_functions_ray.functions import pointwise as pw
from raster_functions_ray.pipelines import rft

REF = "/root/reference/functions"


class TestParse:
    def test_vineyard_diamond(self):
        t = rft.parse_rft(f"{REF}/VineyardAnalysis.rft.xml")
        assert t.fn == "PythonAdapterFunction"
        assert t.args["ClassName"] == "VineyardAnalysis"
        # the diamond: one Raster variable feeds elevation + both nested
        # built-ins (functions/VineyardAnalysis.rft.xml:27-115)
        assert rft.dataset_vars(t) == ["Raster"]
        assert t.args["slope"].fn == "SlopeFunction"
        assert t.args["aspect"].fn == "AspectFunction"
        assert float(t.args["slope"].args["ZFactor"]) == 1.0

    def test_subtract_enum(self):
        t = rft.parse_rft(f"{REF}/deprecated/Subtract.rft.xml")
        assert t.fn == "ArithmeticFunction"
        assert int(t.args["Operation"]) == 2
        assert rft.dataset_vars(t) == ["Raster1", "Raster2"]

    def test_unsupported_type_refuses(self):
        t = rft.Template(name="x", fn="TrendFunction",
                         args={"Raster": rft.Var("Raster")})
        with pytest.raises(NotImplementedError):
            rft.template_kernel(t)(np.zeros((1, 8, 8)),
                                   np.ones((8, 8), np.uint8),
                                   {"cell_size": (30.0, 30.0),
                                    "width": 8, "height": 8})


class TestLoweredKernels:
    META = {"cell_size": (30.0, 30.0), "width": 16, "height": 16}

    def test_vineyard_matches_hand_built(self):
        rng = np.random.default_rng(5)
        dem = rng.uniform(0, 400, (18, 18))
        m = np.ones((18, 18), np.uint8)
        k = rft.template_kernel(rft.parse_rft(f"{REF}/VineyardAnalysis.rft.xml"))
        out, om = k(dem, m, self.META)
        dxc = fc.convolve3x3(dem, fc.ASPECT_X) / 8.0
        dyc = fc.convolve3x3(dem, fc.ASPECT_Y) / 8.0
        slope = np.sqrt((dxc / 30.0) ** 2 + (dyc / 30.0) ** 2) * 100.0
        aspect = (57.29578 * np.arctan2(dxc, -dyc)) % 360.0
        ref = pw.vineyard_analysis(dem[1:-1, 1:-1], slope[1:-1, 1:-1],
                                   aspect[1:-1, 1:-1])
        assert np.array_equal(out, ref)
        assert np.array_equal(om, fc.erode_mask_3x3(m))

    def test_subtract_matches_arithmetic(self):
        rng = np.random.default_rng(6)
        r = rng.uniform(0, 100, (2, 8, 8))
        m = np.ones((8, 8), np.uint8)
        k = rft.template_kernel(rft.parse_rft(f"{REF}/deprecated/Subtract.rft.xml"))
        out, _ = k(r, m, {"cell_size": (30.0, 30.0), "width": 8, "height": 8})
        assert np.array_equal(out, pw.arithmetic(r[0], r[1], "Subtract"))

    def test_mask_raster_replaces_mask(self):
        rng = np.random.default_rng(7)
        r = rng.uniform(-50, 100, (2, 8, 8))
        m = np.ones((8, 8), np.uint8)
        k = rft.template_kernel(rft.parse_rft(f"{REF}/MaskRaster.rft.xml"))
        out, om = k(r, m, {"cell_size": (30.0, 30.0), "width": 8, "height": 8})
        e_out, e_m = pw.mask_raster(r[0], r[1], m)
        assert np.array_equal(out, e_out)
        assert np.array_equal(om, e_m)
        assert om.min() == 0  # negatives in the mask raster knock pixels out

    def test_calculator_focal_expression(self):
        # the TRI template's nested RasterCalculator node, evaluated via
        # the expression layer with Focal_* padding inference
        t = rft.parse_rft(f"{REF}/TerrainRuggednessIndex-Riley-Colormap.rft.xml")

        def find_calc(node):
            if isinstance(node, rft.Template):
                if node.fn == "RasterCalculatorFunction":
                    return node
                for v in node.args.values():
                    got = find_calc(v)
                    if got is not None:
                        return got
            if isinstance(node, list):
                for v in node:
                    got = find_calc(v)
                    if got is not None:
                        return got
            return None

        calc = find_calc(t)
        assert calc is not None
        expr_src = calc.args["Expression"]
        assert "Focal_Max" in expr_src
        rng = np.random.default_rng(8)
        dem = rng.uniform(0, 400, (18, 18))
        m = np.ones((18, 18), np.uint8)
        out, om = rft.template_kernel(calc)(dem, m, self.META)
        from raster_functions_ray.functions.expr import Expression

        ref = Expression(expr_src).evaluate({"DEM": dem})
        assert np.array_equal(out, ref)


class TestFullTriTemplate:
    def test_tri_template_end_to_end(self):
        """The COMPLETE TerrainRuggednessIndex template — TableFunction ∘
        Remap ∘ RasterCalculator(Focal_*) — loaded and evaluated, equals
        the hand-composed expression + interval remap."""
        from raster_functions_ray.functions import remap as rm
        from raster_functions_ray.functions.expr import Expression

        t = rft.parse_rft(f"{REF}/TerrainRuggednessIndex-Riley-Colormap.rft.xml")
        rng = np.random.default_rng(9)
        # flat west half (TRI≈0 → class 1), rough east half (high classes)
        yy, xx = np.meshgrid(np.arange(18), np.arange(18), indexing="ij")
        dem = np.where(xx < 9, 100.0, rng.uniform(0, 500, (18, 18)))
        m = np.ones((18, 18), np.uint8)
        out, _ = rft.template_kernel(t)(
            dem, m, {"cell_size": (30.0, 30.0), "width": 16, "height": 16})
        tri = Expression(
            "SquareRoot(Abs((Square(Focal_Max(DEM,3,3))"
            " - Square(Focal_Min(DEM,3,3)))))").evaluate({"DEM": dem})
        ir = [0, 80, 81, 116, 117, 161, 162, 239, 240, 497, 498, 958,
              959, 5000]
        ref = rm.remap(tri, ir, [1, 2, 3, 4, 5, 6, 7])
        assert np.array_equal(out, ref, equal_nan=True)
        got = np.unique(out[~np.isnan(out)])
        assert got.size >= 2  # the remap actually discriminates classes


class TestRadiationTemplate:
    def test_nested_calculators_with_host_latitude(self):
        """'Annual Direct Incident Radiation.rft.xml' — the corpus's most
        complex template (three nested RasterCalculators over Aspect and
        Slope plus a host-supplied latitude plane) — loads and equals the
        hand-composed expression chain."""
        from raster_functions_ray.functions.expr import Expression
        from raster_functions_ray.functions.pointwise import latitude_block

        t = rft.parse_rft(f"{REF}/Annual Direct Incident Radiation.rft.xml")
        rng = np.random.default_rng(10)
        dem = rng.uniform(0, 800, (18, 18))
        m = np.ones((18, 18), np.uint8)
        meta = {"cell_size": (30.0, 30.0), "width": 16, "height": 16,
                "extent": (0.0, 0.0, 480.0, 480.0)}
        out, _ = rft.template_kernel(t)(dem, m, meta)

        dxc = fc.convolve3x3(dem, fc.ASPECT_X) / 8.0
        dyc = fc.convolve3x3(dem, fc.ASPECT_Y) / 8.0
        aspect = (57.29578 * np.arctan2(dxc, -dyc)) % 360.0
        slope = np.sqrt((dxc / 30.0) ** 2 + (dyc / 30.0) ** 2) * 100.0
        to_r = "latitude*3.141592/180"
        fas_r = Expression(to_r).evaluate(
            {"latitude": Expression("Abs( 180-Abs( ras-225 ))")
             .evaluate({"ras": aspect})})
        slo_r = Expression(to_r).evaluate({"latitude": slope})
        ext = [0.0, 0.0, 480.0, 480.0 + 30.0]
        lat_r = Expression(to_r).evaluate(
            {"latitude": latitude_block(ext, (30.0, 30.0), (18, 18))})
        ref = Expression(t.args["Expression"]).evaluate(
            {"fas_rads": fas_r, "slo_rads": slo_r, "lat_rads": lat_r})
        assert np.array_equal(out, ref[1:-1, 1:-1])


class TestLocalAndVectorField:
    def test_remove_nodata_con_isnull(self):
        """functions/RemoveNoData.rft.xml: Con(IsNull(R), 0, R) through the
        id/href shared-node DAG and Scalar constant — equals the engine's
        fused remove_nodata kernel."""
        t = rft.parse_rft(f"{REF}/RemoveNoData.rft.xml")
        assert t.fn == "LocalFunction"
        rng = np.random.default_rng(11)
        r = rng.uniform(1, 100, (8, 8))
        m = (rng.uniform(0, 1, (8, 8)) > 0.3).astype(np.uint8)
        out, om = rft.template_kernel(t)(
            r, m, {"cell_size": (30.0, 30.0), "width": 8, "height": 8})
        ref, refm = pw.remove_nodata(r, m, 0.0)
        assert np.array_equal(out, ref)
        assert np.array_equal(om, refm)

    def test_vector_field(self):
        from raster_functions_ray.functions.expr import vector_field

        t = rft.parse_rft(f"{REF}/VF.rft.xml")
        rng = np.random.default_rng(12)
        uv = rng.uniform(-10, 10, (2, 8, 8))
        out, _ = rft.template_kernel(t)(
            uv, np.ones((8, 8), np.uint8),
            {"cell_size": (30.0, 30.0), "width": 8, "height": 8})
        mag, di = vector_field(uv[0], uv[1])
        assert np.array_equal(out, np.stack([mag, di]))


class TestNdviTemplates:
    def test_all_three_ndvi_variants(self):
        """NDVI / NDVI-Grayscale / NDVI-Colormap templates (ClassName
        omitted — the adapter resolves by Function display name; red/ir
        are Landsat band indices 3/4) equal the engine's f4 NDVI kernel."""
        rng = np.random.default_rng(13)
        p = rng.uniform(1, 255, (7, 8, 8))
        m = np.ones((8, 8), np.uint8)
        meta = {"cell_size": (30.0, 30.0), "width": 8, "height": 8}
        for f, meth in (("NDVI.rft.xml", "Raw"),
                        ("NDVI-Grayscale.rft.xml", "Grayscale"),
                        ("NDVI-Colormap.rft.xml", "Colormap")):
            t = rft.parse_rft(f"{REF}/deprecated/{f}")
            out, _ = rft.template_kernel(t)(p, m, meta)
            assert str(t.args["method"]) == meth
            ref = pw.ndvi(p[int(t.args["red"])], p[int(t.args["ir"])], meth)
            assert np.array_equal(out, ref), f


    def test_extract_band(self):
        from raster_functions_ray.pipelines.rft import Template, Var, \
            template_kernel

        tmpl = Template(name="x", fn="ExtractBandFunction",
                        args={"Raster": Var("Raster"), "BandIDs": [3, 1]})
        rng = np.random.default_rng(14)
        p = rng.uniform(0, 100, (5, 8, 8))
        out, _ = template_kernel(tmpl)(
            p, np.ones((8, 8), np.uint8),
            {"cell_size": (30.0, 30.0), "width": 8, "height": 8})
        assert np.array_equal(out, p[[3, 1]])
