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

    if fn == "PythonAdapterFunction":
        # ClassName argument when present, else the Function element's
        # Name (the NDVI templates omit ClassName and name the function)
        cls = a.get("ClassName") or node.fn_name
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
