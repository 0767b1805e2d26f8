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


import pyarrow as pa


def _group_reduce(g: pa.Table, reduce_fn: StackReduce, out_pixel_type: str | None) -> pa.Table:
    g = g.sort_by("acq_ts")
    meta = {c: g[c][0].as_py() for c in g.column_names if c not in ("pixels", "mask")}
    bc, pt = int(meta["band_count"]), meta["pixel_type"]
    h, w = int(meta["height"]), int(meta["width"])
    pix_col, mask_col = g["pixels"], g["mask"]
    arrs, masks = [], []
    for i in range(g.num_rows):
        a = tilecodec.decode(pix_col[i].as_buffer(), pt, bc, h, w)
        arrs.append(a if a.ndim == 3 else a[None])
        masks.append(tilecodec.decode_mask(mask_col[i].as_buffer(), h, w))
    stack = np.stack(arrs)          # (scene, band, h, w)
    mstack = np.stack(masks)        # (scene, h, w)
    gdf = pd.DataFrame({k: [v] * g.num_rows for k, v in meta.items()
                        if k in ("scene_id", "acq_ts", "sun_azimuth", "sun_elevation")})
    gdf["acq_ts"] = g["acq_ts"].to_pandas().values
    out, out_mask = reduce_fn(stack, mstack, gdf)
    opt = out_pixel_type or pt
    out = np.asarray(out).astype(np.dtype(opt), copy=False)
    out_bc = 1 if out.ndim == 2 else out.shape[0]
    rec: dict = {}
    for c in ("scene_id", "extent", "cell_size", "srid", "nodata", "acq_ts",
              "sun_azimuth", "sun_elevation"):
        if c in g.column_names:
            rec[c] = g[c].slice(0, 1)
    rec.update({
        "tile_id": pa.array([f"c_{int(meta['tx']):04d}_{int(meta['ty']):04d}"]),
        "tx": pa.array([int(meta["tx"])], pa.int32()),
        "ty": pa.array([int(meta["ty"])], pa.int32()),
        "width": pa.array([w], pa.int32()), "height": pa.array([h], pa.int32()),
        "band_count": pa.array([out_bc], pa.int32()),
        "pixel_type": pa.array([opt]),
        "pixels": pa.array([tilecodec.encode(out)], pa.binary()),
        "mask": pa.array([tilecodec.encode(np.asarray(out_mask, dtype=np.uint8))], pa.binary()),
        "n_scenes": pa.array([g.num_rows], pa.int64()),
    })
    return pa.table(rec)


def stack_reduce(tiles: rd.Dataset, reduce_fn: StackReduce,
                 out_pixel_type: str | None = None) -> rd.Dataset:
    """The grouped-reduce lowering (one shuffle keyed on the tile grid).

    Groups arrive as Arrow tables (zero-copy binary pixel columns — the
    pandas path would copy every payload into Python objects)."""
    from .halo import _shuffle_partitions

    tiles = tiles.repartition(_shuffle_partitions())
    return tiles.groupby(["tx", "ty"]).map_groups(
        lambda g: _group_reduce(g, reduce_fn, out_pixel_type),
        batch_format="pyarrow")


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
