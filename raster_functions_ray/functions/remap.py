"""Remap / colormap / stretch / zonal-remap kernels (SURVEY.md §2.5 + §2.3).

Covers the template built-ins (RemapFunction, ColormapFunction,
StretchFunction, TableFunction) and the zone-table ops (ZonalRemap,
RasterizeAttributes) as pure NumPy LUT / interval operations.
"""

from __future__ import annotations

import numpy as np


def remap(v: np.ndarray, input_ranges, output_values, nodata_ranges=(), default=None):
    """Interval remap: value in [lo, hi) → out.

    Semantics: RemapFunction nodes of e.g.
    functions/TerrainRuggednessIndex-Riley-Colormap.rft.xml — InputRanges is
    a flat [lo0, hi0, lo1, hi1, ...] list zipped with OutputValues;
    NoDataRanges become masked (returned as NaN here).
    """
    v = np.asarray(v, dtype=np.float64)
    out = np.full(v.shape, np.nan if default is None else float(default), dtype=np.float64)
    lo = np.asarray(input_ranges[0::2], dtype=np.float64)
    hi = np.asarray(input_ranges[1::2], dtype=np.float64)
    for i in range(len(output_values)):
        out[(v >= lo[i]) & (v < hi[i])] = float(output_values[i])
    for j in range(0, len(nodata_ranges), 2):
        out[(v >= nodata_ranges[j]) & (v < nodata_ranges[j + 1])] = np.nan
    return out


def colormap_lookup(v: np.ndarray, values: np.ndarray, rgb: tuple[np.ndarray, np.ndarray, np.ndarray]):
    """Indexed-color expansion: u1 class values → 3-band RGB via a LUT.

    Semantics: ColormapFunction / the colormap tuples built by e.g.
    functions/deprecated/NDVI.py:73-86.  Values not in the LUT map to 0.
    """
    v = np.asarray(v).astype(np.int64)
    lut_size = int(np.max(values)) + 1
    out = np.zeros((3, *v.shape), dtype=np.uint8)
    idx = np.clip(v, 0, lut_size - 1)
    for b in range(3):
        lut = np.zeros(lut_size, dtype=np.uint8)
        lut[np.asarray(values, dtype=np.int64)] = np.asarray(rgb[b], dtype=np.uint8)
        out[b] = lut[idx]
    return out


def stretch_minmax(v: np.ndarray, in_min: float, in_max: float, out_min: float = 0.0, out_max: float = 255.0):
    """Linear min-max stretch (StretchFunction)."""
    v = np.asarray(v, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        s = (v - in_min) / (in_max - in_min)
    return np.clip(s, 0.0, 1.0) * (out_max - out_min) + out_min


def zonal_remap(v: np.ndarray, z: np.ndarray | None, zt_map: dict,
                background=0, default_target=255, out_dtype="u1") -> np.ndarray:
    """Per-zone interval remap of a value raster.

    Semantics: functions/deprecated/ZonalRemap.py:166-201 — for each zone id
    present in the zone block, apply its [zmin, zmax, zval] triples
    (nullable arms: both → (min,max) open interval, one → one-sided);
    background fill, default target when zval is None.
    """
    v = np.asarray(v)
    p = np.full(v.shape, background, dtype=np.dtype(out_dtype))
    zone_ids = np.unique(z) if z is not None else [None]
    if zt_map:
        for k in zone_ids:
            triples = zt_map.get(k if k is None else int(k))
            if not triples:
                continue
            for t in triples:
                # pandas-sourced maps carry NaN for null arms; NaN `is not
                # None`, so normalize before the nullable-arm dispatch
                t = [None if (isinstance(a, float) and np.isnan(a)) else a for a in t]
                sel = (z == k) if z is not None else np.ones(v.shape, dtype=bool)
                if t[0] is not None and t[1] is not None:
                    sel = sel & (v > t[0]) & (v < t[1])
                elif t[0] is not None:
                    sel = sel & (v > t[0])
                elif t[1] is not None:
                    sel = sel & (v < t[1])
                p[sel] = t[2] if t[2] is not None else default_target
    return p


def rasterize_attributes(v: np.ndarray, z: np.ndarray | None, attr_map: dict,
                         n_attrs: int, background=0) -> np.ndarray:
    """Burn per-zone attribute values into 1+M output bands (band 0 = v).

    Semantics: functions/deprecated/RasterizeAttributes.py:135-169.
    """
    v = np.asarray(v)
    p = np.full((1 + n_attrs, *v.shape), background, dtype=np.float64)
    np.copyto(p[0], v, casting="unsafe")
    zone_ids = np.unique(z) if z is not None else [None]
    ones = np.ones(v.shape, dtype=bool)
    for k in zone_ids:
        attrs = attr_map.get(k if k is None else int(k))
        if not attrs:
            continue
        sel = (z == k) if z is not None else ones
        for b, t in enumerate(attrs, 1):
            if t is not None:
                p[b][sel] = t
    return p
