"""Pixel-local kernels (SURVEY.md §2.1) — one pure function per reference op.

All kernels take/return NumPy arrays; dtype discipline mirrors the reference:
compute in f4/f8 intermediates, caller casts to the output pixel type at the
stage boundary (``astype(props['pixelType'])`` in the reference).
"""

from __future__ import annotations

import numpy as np

F4 = np.float32


def ndvi(red: np.ndarray, ir: np.ndarray, method: str = "Raw") -> np.ndarray:
    """(ir-red)/(ir+red); Grayscale/Colormap scale to *100+100.

    Semantics: functions/deprecated/NDVI.py:90-101 (scaling :66-75).
    Division by zero yields inf/nan like the reference (seterr ignore).
    """
    red = np.asarray(red, dtype=F4)
    ir = np.asarray(ir, dtype=F4)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = (ir - red) / (ir + red)
    if method.lower() in ("grayscale", "colormap"):
        out = (out * F4(100.0)) + F4(100.0)
    return out


def nbr_difference(r1_nir, r1_swir, r2_nir, r2_swir, scaled: bool = False) -> np.ndarray:
    """Differenced NBR: before − after, each (nir−swir)/(swir+nir).

    Semantics: functions/deprecated/DifferencedNormalizedBurnRatio.py:99-117.
    """
    a = [np.asarray(x, dtype=F4) for x in (r1_nir, r1_swir, r2_nir, r2_swir)]
    with np.errstate(divide="ignore", invalid="ignore"):
        n1 = (a[0] - a[1]) / (a[1] + a[0])
        n2 = (a[2] - a[3]) / (a[3] + a[2])
    out = n1 - n2
    if scaled:
        out = (out * F4(100.0)) + F4(100.0)
    return out


_ARITH = {"add": np.add, "subtract": np.subtract, "multiply": np.multiply, "divide": np.divide}


def arithmetic(r1: np.ndarray, r2: np.ndarray, op: str = "Add") -> np.ndarray:
    """Binary band algebra. Semantics: functions/deprecated/Arithmetic.py:46-64."""
    f = _ARITH[op.lower()]
    with np.errstate(divide="ignore", invalid="ignore"):
        return f(np.asarray(r1, dtype=F4), np.asarray(r2, dtype=F4))


def _to_fahrenheit(t: np.ndarray, units: str) -> np.ndarray:
    u = units.lower()[0]
    if u == "k":
        return (F4(1.8) * t) - F4(459.67)
    if u == "c":
        return (F4(1.8) * t) + F4(32.0)
    return t


def _from_fahrenheit(v: np.ndarray, units: str) -> np.ndarray:
    u = units.lower()[0]
    if u == "k":
        return (v + F4(459.67)) / F4(1.8)
    if u == "c":
        return (v - F4(32.0)) / F4(1.8)
    return v


def windchill(t, ws, mask_t=None, mask_ws=None, t_units="Fahrenheit",
              ws_units="mph", out_units="Fahrenheit"):
    """NWS wind chill; returns (wc, mask). Semantics: functions/deprecated/Windchill.py:93-129.

    Mask = t_mask & ws_mask & (ws >= 0); the ws^0.16 term is applied only
    where the mask holds, exactly like the reference.
    """
    t = np.array(t, dtype=F4)
    ws = np.array(ws, dtype=F4)
    m = np.ones(t.shape, dtype=bool)
    if mask_t is not None:
        m &= np.asarray(mask_t).astype(bool)
    if mask_ws is not None:
        m &= np.asarray(mask_ws).astype(bool)
    m &= ws >= 0
    t = _to_fahrenheit(t, t_units)
    w = ws_units.lower()
    if w in ("m/s", "meters/sec", "m"):
        ws = ws * F4(3600.0 / 1609.344)
    elif w in ("kph", "km/h", "k"):
        ws = ws / F4(1.609344)
    elif w in ("knots", "n"):
        ws = ws / F4(1.15077945)
    elif w in ("ft/s", "f"):
        ws = ws * F4(5280.0 / 3600)
    wc = F4(35.74) + (F4(0.6215) * t)
    ws16 = np.power(ws[m], F4(0.16))
    wc[m] += (F4(0.4275) * t[m] * ws16) - (F4(35.75) * ws16)
    wc = _from_fahrenheit(wc, out_units)
    return wc, m.astype(np.uint8)


def heat_index(t, r, t_units="Fahrenheit", out_units="Fahrenheit"):
    """Rothfusz heat index with the reference's exact adjustment regions.

    Semantics: functions/deprecated/HeatIndex.py:73-117 — including its
    idiosyncratic high-humidity adjustment ``((t-85)/10)*((87-t)/5)`` (the
    reference applies it with *t*, not rh, in the first factor).
    """
    shape = np.asarray(t).shape
    t = np.array(t, dtype=F4).ravel()
    r = np.array(r, dtype=F4).ravel()
    t = _to_fahrenheit(t, t_units)
    tr, rr, tt = t * r, r * r, t * t
    ttr, trr = tt * r, t * rr
    ttrr = ttr * r
    H = F4(0.5) * (t + F4(61.0) + (((t - F4(68.0)) * F4(1.2)) + (r * F4(0.094))))
    a = ((H + t) / F4(2.0)) > 80
    full = (F4(-42.379) + (F4(2.04901523) * t) + (F4(10.14333127) * r) - (F4(0.22475541) * tr)
            - (F4(6.83783e-3) * tt) - (F4(5.481717e-2) * rr) + (F4(1.22874e-3) * ttr)
            + (F4(8.5282e-4) * trr) - (F4(1.99e-6) * ttrr))
    c = a & ((r < 13) & (t >= 80.0) & (t <= 112))
    full[c] -= ((F4(13.0) - r[c]) / F4(4.0)) * np.sqrt((F4(17.0) - np.abs(t[c] - F4(95.0))) / F4(17.0))
    c = a & ((r > 85) & (t >= 80.0) & (t <= 87))
    tc = t[c]
    full[c] += ((tc - F4(85.0)) / F4(10.0)) * ((F4(87.0) - tc) / F4(5.0))
    H[a] = full[a]
    H = _from_fahrenheit(H, out_units)
    return H.reshape(shape)


def _piecewise_membership(x, min_a, min_p, max_p, max_a):
    """Shared trapezoid used by FishHabitatSuitability (functions/FishHabitatSuitability.py:71-99)."""
    x = np.array(x, dtype=F4)
    lo = x <= min_p
    hi = x >= max_p
    mid = (~lo) & (~hi)
    np.putmask(x, lo, (x - F4(min_a)) / F4(min_p - min_a))
    np.putmask(x, hi, (x - F4(max_a)) / F4(max_p - max_a))
    np.putmask(x, mid, F4(1.0))
    np.putmask(x, x < 0, F4(0.0))
    return x


def depth_factor(depth: float) -> float:
    """Scalar depth membership (functions/FishHabitatSuitability.py:45-68)."""
    d = abs(float(depth))
    d_min_a, d_min_p, d_max_p, d_max_a = 0.0, 2.0, 11.0, 20.0
    if d < d_min_a or d > d_max_a:
        return 0.0
    if d <= d_min_p:
        return (d - d_min_a) / (d_min_p - d_min_a)
    if d >= d_max_p:
        return (d - d_max_a) / (d_max_p - d_max_a)
    return 1.0


def fish_habitat_suitability(t, s, depth: float) -> np.ndarray:
    """functions/FishHabitatSuitability.py:71-99 (params inline in the reference)."""
    tm = _piecewise_membership(t, 17.99, 26.37, 29.15, 33.35)
    sm = _piecewise_membership(s, 28.81, 32.27, 35.81, 36.79)
    return tm * sm * F4(depth_factor(depth))


def vineyard_analysis(elev, slope, aspect) -> np.ndarray:
    """0–3 suitability sum. Semantics: functions/VineyardAnalysis.py:61-71."""
    elev = np.asarray(elev, dtype=F4)
    slope = np.asarray(slope, dtype=F4)
    aspect = np.asarray(aspect, dtype=F4)
    E = ((elev > 30) & (elev < 400)).astype(np.uint8)
    S = ((slope > 5) & (slope < 60)).astype(np.uint8)
    A = ((aspect > 0) & (aspect < 200)).astype(np.uint8)
    return E + S + A


def fuzzy_membership(r, mode="linear", par1=0.0, par2=0.0, hedge="NONE",
                     stats_min=0.0, stats_max=255.0, mean=0.0, std=1.0) -> np.ndarray:
    """7-mode fuzzy membership + hedges. Semantics: functions/FuzzyMembership.py:114-161.

    MS modes consume dataset-level mean/std (a prior global aggregate in the
    engine — functions/FuzzyMembership.py:87-88).

    Deliberate divergence: for MSSmall/MSLarge the reference applies its two
    np.putmask calls SEQUENTIALLY against the array it is mutating, so when
    ``mean*meanMultiplier < 1.0`` the second putmask re-tests values the
    first already overwrote and clobbers them with rTemp
    (functions/FuzzyMembership.py:150-158).  This kernel precomputes the
    condition from the ORIGINAL array — each pixel takes exactly one branch
    — which is the mathematically-intended semantics; the
    Q_FUZZY_MSSMALL_SQL oracle encodes this (repo) behavior.
    """
    r = np.array(r, dtype=np.float64)
    mode = mode.lower()
    par_min = par1 if par1 != 0.0 else stats_min
    par_mid = par1 if par1 != 0.0 else (stats_min + stats_max) / 2
    mean_mult = par1 if par1 != 0.0 else 1.0
    par_max = par2 if par2 != 0.0 else stats_max
    spread_a = par2 if par2 != 0.0 else 0.1
    spread_b = par2 if par2 != 0.0 else 5.0
    std_mult = par2 if par2 != 0.0 else 1.0
    if mode == "linear":
        r = (r - par_min) / (par_max - par_min)
    elif mode in ("gaussian", "gauss"):
        r = np.e ** ((-spread_a) * ((r - par_mid) ** 2))
    elif mode == "large":
        r = 1 / (1 + (r / par_mid) ** (-spread_b))
    elif mode == "small":
        r = 1 / (1 + (r / par_mid) ** spread_b)
    elif mode == "near":
        r = 1 / (1 + (spread_a * (r - par_mid) ** 2))
    elif mode == "mssmall":
        with np.errstate(divide="ignore", invalid="ignore"):
            tmp = (std_mult * std) / (r - (mean_mult * mean) + (std_mult * std))
        cond = r <= (mean * mean_mult)
        np.putmask(r, cond, 1.0)
        np.putmask(r, ~cond, tmp)
    else:  # mslarge
        with np.errstate(divide="ignore", invalid="ignore"):
            tmp = 1 - (std_mult * std) / (r - (mean_mult * mean) + (std_mult * std))
        cond = r <= (mean * mean_mult)
        np.putmask(r, cond, 0.0)
        np.putmask(r, ~cond, tmp)
    r = np.clip(r, 0.0, 1.0)
    if hedge == "SOMEWHAT":
        r = r**0.5
    elif hedge == "VERY":
        r = r**2
    return r


def mask_raster(pixels, m_pixels, m_mask):
    """Apply raster-as-mask; returns (pixels, mask). Semantics: functions/MaskRaster.py:34-40."""
    out_mask = ((np.asarray(m_pixels) > 0) & (np.asarray(m_mask) > 0)).astype(np.uint8)
    return np.asarray(pixels), out_mask


def replace_nulls(pixels, fill_val: float):
    """Replace 0-valued pixels; mask forced valid. Semantics: functions/ReplaceNulls.py:47-57."""
    out = np.array(pixels, dtype=np.float64)
    np.place(out, out == 0, [fill_val])
    return out, np.ones(out.shape, dtype=np.uint8)


def fill_value(shape, value: float) -> np.ndarray:
    """Constant block. Semantics: functions/FillRaster.py:38-40."""
    return np.full(shape, value, dtype=F4)


QA_BIT_INDEX = {"fill": 0, "diluted": 1, "cirrus": 2, "cloud": 3,
                "shadow": 4, "snow": 5, "clear": 6, "water": 7}


def landsat_c2_qa(qa: np.ndarray, **flags: bool) -> np.ndarray:
    """Bitwise QA decode → u1 0/1, vectorized (reference loops pixels).

    Semantics: functions/LandsatC2QA.py:109-127; bit order :8.
    """
    bit_mask = 0
    for name, idx in QA_BIT_INDEX.items():
        bit_mask |= int(bool(flags.get(name, False))) << idx
    return ((np.asarray(qa).astype(np.int64) & bit_mask) != 0).astype(np.uint8)


def latitude_block(extent, cell_size, shape_hw) -> np.ndarray:
    """Per-pixel latitude (y map coordinate) from tile georeference.

    Semantics: functions/Latitude.py:45-83 — row value = top_left_y − cellsize_y*row.
    """
    h, w = shape_hw
    top_left_y = extent[3]
    yp = top_left_y - cell_size[1] * np.arange(h, dtype=np.float64)
    return np.repeat(yp[:, None], w, axis=1)


def convert_per_second_to_per_month(pixels, acq_month_days: int) -> np.ndarray:
    """Scale rate by seconds-in-acquisition-month.

    Semantics: functions/deprecated/ConvertPerSecondToPerMonth.py:43-75.
    """
    return np.asarray(pixels, dtype=np.float64) * (acq_month_days * 86400.0)


def select_by_pixel_size(cell_size_x: float, threshold: float,
                         cell_size_y: float | None = None) -> int:
    """Route to input 0 (finer) or 1 (coarser).

    Semantics: functions/SelectByPixelSize.py:65-95 — the reference's
    selectRasters routes on the MEAN of the request cell sizes with a
    strict '<' (a cell size exactly equal to the threshold picks the
    coarser raster), so anisotropic cells use both axes."""
    v = 0.5 * (cell_size_x + (cell_size_y if cell_size_y is not None else cell_size_x))
    return 0 if v < threshold else 1


def remove_nodata(pixels: np.ndarray, mask: np.ndarray, value: float = 0.0):
    """Con(IsNull(r), value, r): replace NoData-masked pixels with a
    constant and force the mask valid.

    Semantics: functions/RemoveNoData.rft.xml — Con over Is Null with a
    Const raster (the template's built-in composition re-expressed as one
    pointwise kernel)."""
    out = np.array(pixels, dtype=np.float64)
    invalid = np.asarray(mask) == 0
    if out.ndim == 3:
        out[:, invalid] = value
    else:
        out[invalid] = value
    return out, np.ones(out.shape[-2:], dtype=np.uint8)


def linear_spectral_unmixing(pixels: np.ndarray, signatures: dict,
                             method: str = "Scaled") -> np.ndarray:
    """Per-pixel least-squares endmember abundances + residual band.

    Semantics: functions/deprecated/LinearSpectralUnmixing.py:60-130 —
    coefficients = column-stacked endmember signatures (:66-72), pixels
    flattened to a (bands, n_pix) system solved with np.linalg.lstsq
    (:97-106); 'Scaled' clips negatives, scales by the GLOBAL max across
    all endmember bands, and appends R² computed against the scalar mean
    of y (:108-118, reproducing the reference's y.mean() with no axis);
    'Raw' appends the residual sum of squares.  Output: (n_endmembers + 1,
    h, w) f4, band order = signature-dict order then residuals (:121-127).
    Requires bands > n_endmembers (lstsq residuals defined)."""
    coeff = np.array(list(signatures.values()), dtype=np.float64).T  # (bands, M)
    p = np.asarray(pixels, dtype=np.float64)
    bands, h, w = p.shape
    y = p.transpose(1, 2, 0).reshape(-1, bands).T                   # (bands, n_pix)
    model, resid = np.linalg.lstsq(coeff, y, rcond=None)[:2]
    endmembers = model.reshape(coeff.shape[1], h, w)
    if method.lower() == "scaled":
        endmembers = endmembers.clip(min=0)
        mx = endmembers.max()
        if mx > 0:
            endmembers = endmembers * (1.0 / mx)
        tss = np.sum((y - y.mean()) ** 2, axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            resid_band = (1.0 - resid / tss).reshape(1, h, w)
    else:
        resid_band = resid.reshape(1, h, w)
    return np.vstack([endmembers, resid_band]).astype(F4)


def compound_topographic_index(slope_deg, flow_acc, cell_size: float) -> np.ndarray:
    """CTI/TWI = ln(((flow+1)*cellsize) / tan(slope)).

    Semantics: functions/CompoundTopographicIndex.py:52-86 (pixel-local form).
    """
    slope = np.asarray(slope_deg, dtype=np.float64) * (np.pi / 180.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.log(((np.asarray(flow_acc, dtype=np.float64) + 1.0) * cell_size)
                      / np.tan(np.where(slope == 0, np.nan, slope)))
