"""Loader for the reference's ``.rft.xml`` raster-function templates.

This is the switch-over surface of the engine: a reference user's
EXISTING template files (the Esri ``RasterFunctionTemplate`` XML schema,
observed across ``/root/reference/functions/*.rft.xml``) parse into a
function tree and lower onto the engine's vectorized kernels, fused per
padded tile exactly like the reference host's demand-driven per-block
pull (SURVEY.md §3.2: a block request recursively pulls child blocks, so
the chain evaluates with no intermediate materialization).

Schema shape (e.g. ``functions/MaskRaster.rft.xml``,
``functions/VineyardAnalysis.rft.xml:27-115``):

- a template node = ``<Function xsi:type='typens:<FnType>'>`` plus
  parallel ``Arguments/Names`` and ``Arguments/Values`` arrays;
- a value is a typed scalar (``xs:string/double/int/boolean``), a
  ``RasterFunctionVariable`` (``IsDataset=true`` → a named raster input;
  otherwise a typed scalar or a string/argument array), or a NESTED
  ``RasterFunctionTemplate`` (the diamond-DAG case: one variable may feed
  several branches, ``functions/VineyardAnalysis.rft.xml:27-115``);
- ``RasterCalculatorFunction`` carries an expression string over named
  inputs (lowered onto functions/expr.py's compiled evaluator, including
  ``Focal_*`` padding inference).

Lowering contract: ``template_kernel(tmpl)`` returns a ``kernel(p, m,
meta)`` for ``stages.tile_map.apply_kernel`` over 1-px-padded tiles; the
template's distinct dataset variables bind to tile bands in first-seen
order.  Unsupported function types raise ``NotImplementedError`` — the
loader refuses rather than silently dropping a node.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np

_XSI = "{http://www.w3.org/2001/XMLSchema-instance}type"


@dataclass(frozen=True)
class Var:
    """A dataset variable — a named raster input of the template."""

    name: str


@dataclass
class Template:
    name: str
    fn: str                     # xsi function type, e.g. 'SlopeFunction'
    args: dict = field(default_factory=dict)
    fn_name: str = ""           # the Function element's display name


def _xsi(el) -> str:
    return (el.get(_XSI) or "").split(":")[-1]


def _typed_text(el):
    t = _xsi(el)
    txt = (el.text or "").strip()
    if t == "double":
        return float(txt)
    if t in ("int", "long", "short"):
        return int(txt)
    if t == "boolean":
        return txt.lower() == "true"
    return txt  # string / untyped


_IDS: dict = {}  # id → element map of the template being parsed


def _deref(el):
    """Resolve an ``href='IDn'`` reference — the schema's shared-node DAG
    encoding (functions/RemoveNoData.rft.xml reuses one dataset node in
    two branches via id/href)."""
    ref = el.get("href")
    return _IDS.get(ref, el) if ref else el


def _parse_value(el):
    el = _deref(el)
    t = _xsi(el)
    if t == "RasterFunctionTemplate":
        return _parse_template(el)
    if t in ("RasterFunctionVariable", ""):
        v0 = el.find("Value")
        if v0 is not None and _xsi(v0) == "Scalar":
            # a constant raster (Con's replacement value,
            # functions/RemoveNoData.rft.xml Const node)
            return _typed_text(v0.find("Value"))
        if v0 is not None and _xsi(v0) == "RasterDatasetName":
            # a file-bound dataset → a named raster input of the template
            return Var(el.findtext("Name") or "")
        if (el.findtext("IsDataset") or "").strip().lower() == "true":
            return Var(el.findtext("Name") or "")
        v = el.find("Value")
        if v is None:
            return None
        vt = _xsi(v)
        if vt == "RasterFunctionTemplate":
            # a variable whose VALUE is a nested template
            # (TerrainRuggednessIndex-Riley-Colormap.rft.xml:25-28)
            return _parse_template(v)
        if vt == "ArrayOfArgument":
            return [_parse_value(a) for a in v]
        if vt == "ArrayOfString":
            return [(s.text or "") for s in v]
        if vt in ("ArrayOfDouble", "ArrayOfInt"):
            cast = float if vt == "ArrayOfDouble" else int
            return [cast((s.text or "0").strip()) for s in v]
        if vt == "":
            return None
        return _typed_text(v)
    return _typed_text(el)


def _parse_template(el) -> Template:
    fn = el.find("Function")
    args_el = el.find("Arguments")
    names_el = args_el.find("Names")
    fn_name = (fn.findtext("Name") or "").strip()
    if names_el is None:
        # Arguments can be a single RasterFunctionVariable — the one-input
        # shorthand (functions/VineyardAnalysis.rft.xml:97-102, Aspect)
        return Template(name=el.findtext("Name") or "", fn=_xsi(fn),
                        args={"Raster": _parse_value(args_el)},
                        fn_name=fn_name)
    names = [(s.text or "") for s in names_el]
    values = [_parse_value(v) for v in args_el.find("Values")]
    return Template(name=el.findtext("Name") or "", fn=_xsi(fn),
                    args=dict(zip(names, values)), fn_name=fn_name)


def parse_rft(path: str) -> Template:
    root = ET.parse(path).getroot()
    _IDS.clear()
    _IDS.update({e.get("id"): e for e in root.iter() if e.get("id")})
    try:
        return _parse_template(root)
    finally:
        _IDS.clear()


def dataset_vars(tmpl: Template) -> list[str]:
    """Distinct dataset-variable names in first-seen order — the band
    binding order of ``template_kernel``."""
    seen: list[str] = []

    def walk(v):
        if isinstance(v, Var):
            if v.name not in seen:
                seen.append(v.name)
        elif isinstance(v, Template):
            for a in v.args.values():
                walk(a)
        elif isinstance(v, list):
            for a in v:
                walk(a)

    walk(tmpl)
    return seen


# Esri ArithmeticFunction Operation enum (evidence:
# functions/deprecated/Subtract.rft.xml binds Operation=2 in a template
# named 'Subtract'): 1=Plus 2=Minus 3=Multiply 4=Divide.
_ARITH_OPS = {1: "Add", 2: "Subtract", 3: "Multiply", 4: "Divide"}


def _adapter_class(a: dict, node: "Template") -> str:
    """Resolve a PythonAdapterFunction's class key: the ClassName argument
    when present and specific, else the PythonModule stem (several
    templates omit ClassName — FishHabitatSuitability names the generic
    'Python Adapter Function', the MultidirectionalHillshade template
    binds only a .pyd module), else the Function element's Name (the NDVI
    trio)."""
    cls = a.get("ClassName")
    if cls and cls != "Python Adapter Function":
        return str(cls)
    mod = str(a.get("PythonModule") or "")
    stem = mod.replace("\\", "/").rsplit("/", 1)[-1].split(".")[0]
    return stem or str(node.fn_name)


def _eval(node, env: dict, meta: dict):
    """Evaluate a template node → (array, shrink, explicit_mask).

    ``shrink`` counts halo pixels the node's subtree already consumed
    (RasterCalculator focal expressions trim their own padding) —
    pointwise parents align operands to the max shrink before combining.
    ``explicit_mask`` is non-None only when a node REPLACED the mask
    (MaskRaster); otherwise the tile mask flows through unchanged.
    """
    from ..functions import expr as ex
    from ..functions import focal as fc
    from ..functions import pointwise as pw

    if isinstance(node, Var):
        return env[node.name], 0, None
    if isinstance(node, (int, float)):
        return float(node), 0, None  # constant raster (Scalar node)
    if not isinstance(node, Template):
        raise NotImplementedError(f"cannot evaluate leaf {node!r}")
    fn, a = node.fn, node.args

    def _mosaic(*keys):
        """Scene stack for mosaic-reducing adapters: explicit Rasters
        bindings when the template has them, else the tile's full band
        axis (the engine's tile world carries the mosaic as bands, one
        scene per band — the same convention stages/composite.py uses)."""
        nodes = next((a[k] for k in keys if a.get(k)), None)
        if nodes:
            evs = [_eval(r, env, meta) for r in nodes]
            s = max(e[1] for e in evs)
            return np.stack([_trim(e[0], s - e[1]) for e in evs]), s
        return np.asarray(env["__bands__"], dtype=np.float64), 0

    if fn == "PythonAdapterFunction":
        from ..functions import stack as st

        cls = _adapter_class(a, node)
        if cls == "NDVI":
            _, s, _ = _eval(a["raster"], env, meta)
            bands = _trim(env["__bands__"], s)
            out = pw.ndvi(bands[int(a.get("red", 0))],
                          bands[int(a.get("ir", 1))],
                          str(a.get("method") or "Raw"))
            return out, s, None
        if cls == "MaskRaster":
            r, s1, _ = _eval(a["r"], env, meta)
            m, s2, _ = _eval(a["m"], env, meta)
            r, m = _align2(r, s1, m, s2)
            mm = _trim(env["__mask__"], max(s1, s2))
            out, msk = pw.mask_raster(r, m, mm)
            return out, max(s1, s2), msk
        if cls == "VineyardAnalysis":
            e, s1, _ = _eval(a["elevation"], env, meta)
            sl, s2, _ = _eval(a["slope"], env, meta)
            asp, s3, _ = _eval(a["aspect"], env, meta)
            s = max(s1, s2, s3)
            e, sl = _align2(e, s1, sl, s2)
            e, asp = _align2(e, max(s1, s2), asp, s3)
            return pw.vineyard_analysis(e, sl, asp), s, None
        if cls == "Windchill":
            # functions/deprecated/Windchill.rft.xml arg names
            t, s1, _ = _eval(a["temperature"], env, meta)
            w, s2, _ = _eval(a["ws"], env, meta)
            t, w = _align2(t, s1, w, s2)
            s = max(s1, s2)
            mm = _trim(env["__mask__"], s)
            out, msk = pw.windchill(
                t, w, mask_t=mm, mask_ws=mm,
                t_units=str(a.get("tunits") or "Fahrenheit"),
                ws_units=str(a.get("wunits") or "mph"),
                out_units=str(a.get("ounits") or "Fahrenheit"))
            return out, s, msk
        if cls == "HeatIndex":
            t, s1, _ = _eval(a["temperature"], env, meta)
            r, s2, _ = _eval(a["rh"], env, meta)
            t, r = _align2(t, s1, r, s2)
            out = pw.heat_index(
                t, r, t_units=str(a.get("units") or "Fahrenheit"),
                out_units=str(a.get("outunits") or "Fahrenheit"))
            return out, max(s1, s2), None
        if cls == "FishHabitatSuitability":
            t, s1, _ = _eval(a["temperature"], env, meta)
            sal, s2, _ = _eval(a["salinity"], env, meta)
            t, sal = _align2(t, s1, sal, s2)
            # depth is a scalar parameter (FishHabitatSuitability.py:50)
            depth = abs(float(a.get("depth") or 0.0))
            return (pw.fish_habitat_suitability(t, sal, depth),
                    max(s1, s2), None)
        if cls == "Arithmetic":
            # functions/deprecated/DeviationFromMean.rft.xml binds r1/r2/op
            r1, s1, _ = _eval(a["r1"], env, meta)
            r2, s2, _ = _eval(a["r2"], env, meta)
            r1, r2 = _align2(r1, s1, r2, s2)
            return (pw.arithmetic(r1, r2, str(a.get("op") or "Add")),
                    max(s1, s2), None)
        if cls == "Aggregate":
            stk, s = _mosaic("Rasters", "rasters")
            mm = np.asarray(_trim(env["__mask__"], s), dtype=bool)
            out, _m = st.aggregate(stk, mm[None],
                                   str(a.get("method") or "Sum"))
            return out, s, None
        if cls in ("FindMax", "FindSecondMax", "FindThirdMax"):
            stk, s = _mosaic("rasters", "Rasters")
            k = {"FindMax": 1, "FindSecondMax": 2, "FindThirdMax": 3}[cls]
            return st.find_kth_max(stk, k), s, None
        if cls == "LandsatPixelPercentile":
            # date/sensor filtering happens upstream as a Dataset filter
            # (functions/stack.py:85); the per-tile reduce is the percentile
            stk, s = _mosaic("rasters", "Rasters")
            return (st.nanpercentile_axis0(
                stk, float(a.get("percentile") or 50.0)), s, None)
        if cls in ("Landsat_Image_Synthesis", "LandsatImageSynthesis"):
            # month selection is an upstream Dataset filter; the per-pixel
            # reduce is the valid mean (functions/Landsat_Image_Synthesis.py)
            stk, s = _mosaic("rasters", "Rasters")
            with np.errstate(invalid="ignore"):
                return np.nanmean(stk, axis=0), s, None
        if cls == "PercentAboveThreshold":
            stk, s = _mosaic("rasters", "Rasters")
            _pct, block = st.percent_above_threshold(
                stk, float(a.get("threshold") or 0.0))
            return block, s, None
        if cls == "SeasonalARIMA":
            stk, s = _mosaic("rasters", "Rasters")
            season = 12
            so = str(a.get("seasonal_order") or "")
            if so.strip():
                parts = [int(float(x)) for x in so.split(",")]
                if len(parts) == 4 and parts[3] > 0:
                    season = parts[3]
            n, hh, ww = stk.shape
            if n > season + 1:
                out = st.css_sarima_forecast(stk.reshape(n, -1),
                                             s=season, horizon=1)[0][0]
                out = out.reshape(hh, ww)
            else:  # too few scenes to difference: seasonal-naive fallback
                out = st.seasonal_naive_forecast_grid(stk, season, 1)[0]
            return out, s, None
        if cls == "TopographicCCorrection":
            sl, s1, _ = _eval(a["slope"], env, meta)
            ap, s2, _ = _eval(a["aspect"], env, meta)
            sl, ap = _align2(sl, s1, ap, s2)
            s = max(s1, s2)
            sun_az = float(meta.get("sun_azimuth", 180.0))
            sun_el = float(meta.get("sun_elevation", 45.0))
            cos_i = st.cos_incidence(sl, ap, sun_az, sun_el)
            czen = float(np.cos(np.deg2rad(90.0 - sun_el)))
            bands = _trim(np.asarray(env["__bands__"], np.float64), s)
            nv = int(env.get("__nvars__", 0))
            rest = bands[nv:] if bands.shape[0] > nv else bands
            outs = []
            for band in rest:
                c, m0, _b0 = st.topographic_c_correction(band, cos_i)
                outs.append(band * (czen + c) / (cos_i + c))
            out = outs[0] if len(outs) == 1 else np.stack(outs)
            return out, s, None
        if cls == "StepwiseLocalRadiometricAdjustment":
            r, s1, _ = _eval(a["input_raster"], env, meta)
            rep, s2, _ = _eval(a["input_replacement_raster"], env, meta)
            mk, s3, _ = _eval(a["input_mask"], env, meta)
            s = max(s1, s2, s3)
            r = _trim(r, s - s1)
            rep = _trim(rep, s - s2)
            mk = _trim(mk, s - s3)
            from ..functions.inpaint import stepwise_radiometric_adjustment

            win = int(float(a.get("size_of_window") or 80))
            out = stepwise_radiometric_adjustment(
                r, rep, (np.asarray(mk) != 0).astype(np.uint8),
                win_size=win)
            return out, s, None
        if cls == "BlockStatistics":
            # genuinely downsampling (BlockStatistics.py:69-71 scales the
            # output cellSize): the result block is h/size × w/size and the
            # explicit mask is the block-subsampled input mask (:108-110).
            # Run unpadded — template_padding() reports 0 for it.
            r, s, _ = _eval(a["raster"], env, meta)
            size = int(float(a.get("size") or 3))
            mm = np.asarray(_trim(env["__mask__"], s), dtype=bool)
            out = fc.block_statistics(
                r, mm, size, str(a.get("measure") or "Mean").lower())
            msk = mm[::size, ::size][: out.shape[0], : out.shape[1]]
            return out, s, msk.astype(np.uint8)
        if cls in ("RankFilter", "FocalStatistics"):
            # FocalStatistics.rft.xml ships no .py (the module predates the
            # repo); its factor parameter is the window size — mapped to
            # the same sliding-window reduce RankFilter.py:80-111 uses
            r, s, _ = _eval(a["raster"], env, meta)
            size = int(float(a.get("size") or a.get("factor") or 3))
            measure = str(a.get("measure") or "Mean").lower()
            return fc.rank_filter(r, size, measure), s + size // 2, None
        if cls == "Hillshade":
            r, s, _ = _eval(a["raster"], env, meta)
            mm = _trim(env["__mask__"], s)
            out, _msk = fc.hillshade(
                r, mm, meta["cell_size"],
                z_factor=float(a.get("zf") or 1.0),
                ce=float(a.get("ce") or 0.664),
                cf=float(a.get("cf") or 0.024))
            return out, s + 1, None
        if cls == "MultidirectionalHillshade":
            r, s, _ = _eval(a["raster"], env, meta)
            mm = _trim(env["__mask__"], s)
            out, _msk = fc.multidirectional_hillshade(r, mm,
                                                      meta["cell_size"])
            return out, s + 1, None
        if cls == "FillRaster":
            r, s, _ = _eval(a["raster"], env, meta)
            out = np.asarray(pw.fill_value(np.asarray(r).shape,
                                           float(a.get("value") or 0.0)),
                             dtype=np.float64)
            return out, s, np.ones(out.shape[-2:], dtype=np.uint8)
        if cls == "ReplaceNulls":
            r, s, _ = _eval(a["raster"], env, meta)
            out, msk = pw.replace_nulls(r, float(a.get("fill_val") or 0.0))
            return out, s, msk
        if cls == "ConvertPerSecondToPerMonth":
            r, s, _ = _eval(a["raster"], env, meta)
            days = int(meta.get("acq_month_days", 30))
            return pw.convert_per_second_to_per_month(r, days), s, None
        if cls == "SelectByPixelSize":
            cs = meta.get("cell_size") or (1.0, 1.0)
            idx = pw.select_by_pixel_size(
                float(cs[0]), float(a.get("threshold") or 0.0),
                float(cs[1]))
            return _eval(a["r1"] if idx == 0 else a["r2"], env, meta)
        if cls == "Random":
            # counter-based stateless generator (same mix constants as the
            # SQL-exact random_source_exact gate) — output independent of
            # tiling/placement, unlike Random.py's per-request seeded RNG
            from ..rasterqueries import _rnd_mix

            shp = np.asarray(env["__bands__"]).shape
            n = int(np.prod(shp))
            ctr = (np.uint64(int(meta.get("tile_id", 0))) * np.uint64(n)
                   + np.arange(n, dtype=np.uint64))
            vals = _rnd_mix(ctr).astype(np.float64).reshape(shp)
            return vals, 0, None
        if cls == "ZonalRemap":
            from ..functions import remap as rm

            v, s1, _ = _eval(a["vraster"], env, meta)
            z, s2, _ = _eval(a["zraster"], env, meta)
            v, z = _align2(v, s1, z, s2)
            zt = str(a.get("ztable") or "")
            if meta.get("ztable") is not None:
                zt_map = meta["ztable"]  # side-input table (the engine's
                # analog of the template's external feature-service URL)
            elif zt.strip():
                import json

                zt_map = {int(k): val
                          for k, val in json.loads(zt).items()}
            else:
                zt_map = {}
            out = rm.zonal_remap(
                v, np.asarray(z), zt_map,
                background=float(a.get("background") or 0.0),
                default_target=float(a.get("defzval") or 255.0),
                out_dtype="f8")
            return out, max(s1, s2), None
        raise NotImplementedError(
            f"PythonAdapterFunction ClassName={cls!r} not in the loader's "
            "registry — add its kernel mapping")

    if fn == "SlopeFunction":
        dem, s, _ = _eval(a.get("DEM", a.get("Raster")), env, meta)
        cs = meta["cell_size"]
        zf = float(a.get("ZFactor") or 1.0)
        dxc = fc.convolve3x3(dem, fc.ASPECT_X) / 8.0
        dyc = fc.convolve3x3(dem, fc.ASPECT_Y) / 8.0
        slope_pct = np.sqrt((dxc / cs[0] * zf) ** 2
                            + (dyc / cs[1] * zf) ** 2) * 100.0
        return slope_pct, s, None

    if fn == "AspectFunction":
        dem, s, _ = _eval(a.get("DEM", a.get("Raster")), env, meta)
        dxc = fc.convolve3x3(dem, fc.ASPECT_X) / 8.0
        dyc = fc.convolve3x3(dem, fc.ASPECT_Y) / 8.0
        aspect = (57.29578 * np.arctan2(dxc, -dyc)) % 360.0
        return aspect, s, None

    if fn == "ArithmeticFunction":
        r1, s1, _ = _eval(a["Raster"], env, meta)
        r2, s2, _ = _eval(a["Raster2"], env, meta)
        r1, r2 = _align2(r1, s1, r2, s2)
        op = _ARITH_OPS[int(a.get("Operation", 1))]
        return pw.arithmetic(r1, r2, op), max(s1, s2), None

    if fn == "LocalFunction":
        # op codes observed in functions/RemoveNoData.rft.xml: the node
        # NAMED 'Is Null' carries Operation=31, the node NAMED 'Con'
        # carries Operation=78
        op = int(a.get("Operation", 0))
        ins = a.get("Rasters") or []
        if op == 31:  # IsNull: 1 where the mask is invalid
            _, s, _ = _eval(ins[0], env, meta)
            msk = _trim(env["__mask__"], s)
            return (np.asarray(msk) == 0).astype(np.float64), s, None
        if op == 78:  # Con(cond, true_val, false_val)
            cond, s1, _ = _eval(ins[0], env, meta)
            tv, s2, _ = _eval(ins[1], env, meta)
            fv, s3, _ = _eval(ins[2], env, meta)
            s = max(s1, s2, s3)
            cond = _trim(cond, s - s1)
            tv, fv = _trim(tv, s - s2), _trim(fv, s - s3)
            out = np.where(np.asarray(cond) != 0, tv, fv)
            # Con over IsNull fills NoData: the result is defined
            # everywhere (pw.remove_nodata's forced-valid mask)
            return out, s, np.ones(out.shape[-2:], np.uint8)
        raise NotImplementedError(f"LocalFunction Operation={op}")

    if fn == "VectorFieldFunction":
        u, s1, _ = _eval(a["Raster1"], env, meta)
        v, s2, _ = _eval(a["Raster2"], env, meta)
        u, v = _align2(u, s1, v, s2)
        mag, direction = ex.vector_field(u, v)
        return np.stack([mag, direction]), max(s1, s2), None

    if fn == "ExtractBandFunction":
        # functions/deprecated/LinearSpectralUnmixing.rft.xml: Raster +
        # BandIDs → band subset (multiband in, multiband out)
        _, s, _ = _eval(a["Raster"], env, meta)
        bands = _trim(env["__bands__"], s)
        ids = [int(i) for i in (a.get("BandIDs") or [])]
        return bands[ids].astype(np.float64), s, None

    if fn == "RemapFunction":
        from ..functions import remap as rm

        v, s, _ = _eval(a["Raster"], env, meta)
        mapped = rm.remap(v, a["InputRanges"], a["OutputValues"],
                          a.get("NoDataRanges") or ())
        if a.get("AllowUnmatched"):
            mapped = np.where(np.isnan(mapped), v, mapped)
        return mapped, s, None

    if fn == "TableFunction":
        # label/color category table — attribute metadata over unchanged
        # pixels (the host renders the table; the engine's analog keeps the
        # class codes and carries the table as dataset metadata)
        v, s, msk = _eval(a["Raster"], env, meta)
        return v, s, msk

    if fn == "RasterCalculatorFunction":
        rasters = a.get("Rasters") or []
        names = a.get("InputNames") or a.get("Names") or []
        expr = ex.Expression(a["Expression"])
        env2, shr = {}, 0
        for nm, rnode in zip(names, rasters):
            arr, s, _ = _eval(rnode, env, meta)
            env2[nm] = arr
            shr = max(shr, s)
        for nm in names[len(rasters):]:
            # an input with NO raster binding: the host supplies it — the
            # only observed case is a latitude plane ('Annual Direct
            # Incident Radiation.rft.xml' third calculator), which the
            # engine derives from the tile georeference like the Latitude
            # operator (functions/Latitude.py:45-83)
            if "lat" in nm.lower() and "__lat__" in env:
                env2[nm] = env["__lat__"]
            else:
                raise NotImplementedError(
                    f"calculator input {nm!r} has no raster binding")
        if shr:
            env2 = {k: v for k, v in env2.items()}  # already aligned: all s==shr
        out = expr.evaluate(env2)
        return out, shr + expr.padding_required, None

    if fn == "CompositeBandFunction":
        # CompositeBands-4Bands-Ordered.rft.xml binds an ordered Raster
        # list; deprecated/CompositeBands.rft.xml binds the mosaic (None)
        stk, s = _mosaic("Raster", "Rasters")
        return np.asarray(stk, np.float64), s, None

    if fn == "MergeRastersFunction":
        # the Merge built-in mosaics inputs: first finite pixel in scene
        # order wins, later scenes fill the holes
        stk, s = _mosaic("Rasters")
        stk = np.asarray(stk, np.float64)
        out = stk[0].copy()
        for nxt in stk[1:]:
            hole = ~np.isfinite(out)
            out[hole] = nxt[hole]
        return out, s, None

    if fn == "BandArithmeticFunction":
        # Method=0 = user-defined expression over 1-indexed band names
        # (the NDSI/NDWI templates: '(B3-B6)/(B6+B3)')
        _, s, _ = _eval(a["Raster"], env, meta)
        method = int(a.get("Method") or 0)
        if method != 0:
            raise NotImplementedError(
                f"BandArithmeticFunction Method={method} (only the "
                "user-defined expression form appears in the corpus)")
        bands = _trim(np.asarray(env["__bands__"], np.float64), s)
        e = ex.Expression(str(a["BandIndexes"]))
        env2 = {}
        for nm in e.variables:
            if not (nm.startswith("B") and nm[1:].isdigit()):
                raise NotImplementedError(f"band variable {nm!r}")
            idx = int(nm[1:]) - 1  # B3 → band 2
            if not 0 <= idx < bands.shape[0]:
                raise NotImplementedError(f"band variable {nm!r}")
            env2[nm] = bands[idx]
        return e.evaluate(env2), s + e.padding_required, None

    if fn == "StretchFunction":
        v, s, msk = _eval(a["Raster"], env, meta)
        st_type = int(a.get("StretchType") or 0)
        arr = np.asarray(v, dtype=np.float64)
        if st_type == 0:
            return arr, s, msk
        mm = np.asarray(_trim(env["__mask__"], s), dtype=bool)
        sel = (mm & np.isfinite(arr)) if (arr.ndim == 2
                                          and mm.shape == arr.shape) \
            else np.isfinite(arr)
        valid = arr[sel]
        if valid.size == 0:
            return arr, s, msk
        if st_type == 6:  # PercentClip
            lo = float(np.percentile(valid,
                                     float(a.get("MinPercent") or 0.0)))
            hi = float(np.percentile(
                valid, 100.0 - float(a.get("MaxPercent") or 0.0)))
        elif st_type == 3:  # StandardDeviation
            nsd = float(a.get("NumberOfStandardDeviation") or 2.0)
            mu, sd = float(valid.mean()), float(valid.std())
            lo, hi = mu - nsd * sd, mu + nsd * sd
        elif st_type == 5:  # MinMax: per-request extremes, host-renderer style
            lo, hi = float(valid.min()), float(valid.max())
        else:  # 1/2/4/8 = StdDevFromParams/Histogram/HistEq/PercentMinmax
            raise NotImplementedError(
                f"StretchType={st_type} (only 0/3/5/6 appear in the corpus)")
        from ..functions import remap as rm

        return (rm.stretch_minmax(arr, lo, hi,
                                  float(a.get("Min") or 0.0),
                                  float(a.get("Max") or 255.0)), s, msk)

    if fn == "ColormapFunction":
        v, s, msk = _eval(a["Raster"], env, meta)
        if a.get("Colormap"):
            raise NotImplementedError(
                "embedded colormap tables do not appear in the corpus — "
                "the NDSI/NDWI templates bind a named host ramp")
        # named-ramp colormaps are display metadata: class codes pass
        # through unchanged (same contract as TableFunction above)
        return v, s, msk

    raise NotImplementedError(
        f"rft function type {fn!r} not in the loader's registry")


def _trim(arr, k: int):
    if arr is None or k <= 0 or np.isscalar(arr):
        return arr
    return arr[..., k:-k, k:-k]


def _align2(a, sa, b, sb):
    """Trim the less-shrunk operand so both share the max shrink."""
    s = max(sa, sb)
    return _trim(a, s - sa), _trim(b, s - sb)


def template_padding(tmpl: Template) -> int:
    """Halo pixels (each side) the template's kernel consumes — what the
    reference host computes from each node's getConfiguration()['padding']
    and the engine passes to halo.with_halo_from_parquet.  Paddings
    compound along nesting, exactly like Expression._padding."""
    from ..functions import expr as ex

    def walk(v) -> int:
        if isinstance(v, Template):
            fn, a = v.fn, v.args
            p = 0
            if fn == "RasterCalculatorFunction":
                p = ex.Expression(str(a["Expression"])).padding_required
            elif fn == "BandArithmeticFunction":
                p = ex.Expression(str(a["BandIndexes"])).padding_required
            elif fn in ("SlopeFunction", "AspectFunction"):
                p = 1
            elif fn == "PythonAdapterFunction":
                cls = _adapter_class(a, v)
                if cls in ("Hillshade", "MultidirectionalHillshade"):
                    p = 1
                elif cls in ("RankFilter", "FocalStatistics"):
                    p = int(float(a.get("size") or a.get("factor")
                                  or 3)) // 2
            return p + max((walk(x) for x in a.values()), default=0)
        if isinstance(v, list):
            return max((walk(x) for x in v), default=0)
        return 0

    return walk(tmpl)


def template_kernel(tmpl: Template):
    """Lower a parsed template to a ``kernel(p, m, meta)`` for
    ``tile_map.apply_kernel``.  Works over unpadded tiles (pointwise
    templates) and 1-px-padded tiles (focal templates): the result is
    trimmed to the tile core, and the mask is the chain's explicit mask
    when one node replaced it (MaskRaster), else the 3×3-eroded input
    mask when a halo was present (the reference's output-mask contract,
    functions/deprecated/Hillshade.py:90-93), else the input mask."""
    from ..functions import focal as fc

    names = dataset_vars(tmpl)

    def kernel(p, m, meta):
        pix = p if p.ndim == 3 else p[None]
        if len(names) > pix.shape[0]:
            raise ValueError(
                f"template needs {len(names)} raster inputs "
                f"({names}), tile has {pix.shape[0]} band(s)")
        env = {nm: pix[i].astype(np.float64) for i, nm in enumerate(names)}
        env["__mask__"] = m
        env["__bands__"] = pix  # band-indexed adapters (NDVI red/ir)
        env["__nvars__"] = len(names)  # bands past these are mosaic scenes
        if meta.get("extent") is not None and meta.get("cell_size") is not None:
            from ..functions.pointwise import latitude_block

            pad0 = (pix.shape[-1] - meta["width"]) // 2
            ext = list(meta["extent"])
            ext[3] = ext[3] + meta["cell_size"][1] * pad0  # padded top edge
            env["__lat__"] = latitude_block(ext, meta["cell_size"],
                                            pix.shape[-2:])
        out, shrink, explicit = _eval(tmpl, env, meta)
        pad = (pix.shape[-1] - meta["width"]) // 2
        out = _trim(out, pad - shrink)
        if explicit is not None:
            msk = _trim(explicit, pad - shrink)
        elif pad > 0:
            msk = fc.erode_mask_3x3(m) if pad == 1 else _trim(m, pad)
        else:
            msk = m
        return out, msk

    return kernel
