"""Temporal composites: grouped stack reduces over co-registered scenes.

The reference receives a ``rasters_pixels`` tuple of overlapping scenes from
its host (functions/Reference.py:214-217); the engine computes the overlap
relation explicitly — scenes of one footprint share global ``(tx, ty)`` —
and reduces with ``groupby((tx, ty)).map_groups`` (SURVEY.md §3.3).

Groups are ordered by ``acq_ts`` before stacking (deterministic reduce
order; required by time-sensitive ops like SeasonalARIMA —
functions/SeasonalARIMA.py:162-163).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import ray.data as rd

from .. import tilecodec
from ..functions import stack as stack_fns

StackReduce = Callable[[np.ndarray, np.ndarray, pd.DataFrame], tuple[np.ndarray, np.ndarray]]
# (stack (scene,band,h,w), masks (scene,h,w), group meta df sorted by acq_ts)
#   -> (out (band,h,w) or (h,w), out_mask (h,w))


def _group_reduce(g: pd.DataFrame, reduce_fn: StackReduce, out_pixel_type: str | None) -> pd.DataFrame:
    g = g.sort_values("acq_ts").reset_index(drop=True)
    first = g.iloc[0]
    bc, pt = int(first["band_count"]), first["pixel_type"]
    h, w = int(first["height"]), int(first["width"])
    arrs, masks = [], []
    for _, row in g.iterrows():
        a = tilecodec.decode(row["pixels"], pt, bc, h, w)
        arrs.append(a if a.ndim == 3 else a[None])
        masks.append(tilecodec.decode_mask(row["mask"], h, w))
    stack = np.stack(arrs)          # (scene, band, h, w)
    mstack = np.stack(masks)        # (scene, h, w)
    out, out_mask = reduce_fn(stack, mstack, g)
    opt = out_pixel_type or pt
    out = np.asarray(out).astype(np.dtype(opt), copy=False)
    out_bc = 1 if out.ndim == 2 else out.shape[0]
    rec = {c: [first[c]] for c in ("scene_id", "extent", "cell_size", "srid",
                                   "nodata", "acq_ts", "sun_azimuth", "sun_elevation")
           if c in g.columns}
    rec.update({
        "tile_id": [f"c_{int(first['tx']):04d}_{int(first['ty']):04d}"],
        "tx": [int(first["tx"])], "ty": [int(first["ty"])],
        "width": [w], "height": [h],
        "band_count": [out_bc], "pixel_type": [opt],
        "pixels": [tilecodec.encode(out)],
        "mask": [tilecodec.encode(np.asarray(out_mask, dtype=np.uint8))],
        "n_scenes": [len(g)],
    })
    return pd.DataFrame(rec)


def stack_reduce(tiles: rd.Dataset, reduce_fn: StackReduce,
                 out_pixel_type: str | None = None) -> rd.Dataset:
    """The grouped-reduce lowering (one shuffle keyed on the tile grid)."""
    return tiles.groupby(["tx", "ty"]).map_groups(
        lambda g: _group_reduce(g, reduce_fn, out_pixel_type),
        batch_format="pandas")


# ---- canned reduces wrapping functions/stack.py kernels -------------------

def aggregate_reduce(method: str) -> StackReduce:
    def fn(stack, masks, g):
        return stack_fns.aggregate(stack, masks, method)
    return fn


def median_composite_reduce(qa_band: int) -> StackReduce:
    def fn(stack, masks, g):
        out = stack_fns.median_composite(stack, qa_band)
        return out, np.ones(stack.shape[-2:], np.uint8)
    return fn


def percentile_reduce(qa_band: int, pct: float) -> StackReduce:
    def fn(stack, masks, g):
        out = stack_fns.pixel_percentile(stack, qa_band, pct)
        return out, np.ones(stack.shape[-2:], np.uint8)
    return fn


def synthesis_reduce(qa_band: int) -> StackReduce:
    def fn(stack, masks, g):
        out = stack_fns.image_synthesis_mean(stack, qa_band)
        return out, np.ones(stack.shape[-2:], np.uint8)
    return fn


def find_kth_max_reduce(k: int, invalid_above: float = 100.0) -> StackReduce:
    def fn(stack, masks, g):
        out = stack_fns.find_kth_max(stack[:, 0, :, :], k, invalid_above)
        return out, np.ones(stack.shape[-2:], np.uint8)
    return fn
