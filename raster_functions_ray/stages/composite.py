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
    # per-scene meta must come from each ROW (replicating row 0 would hand
    # reduce_fn the first scene's sun geometry for every scene)
    gdf = pd.DataFrame({c: g[c].to_pandas().values
                        for c in ("scene_id", "acq_ts", "sun_azimuth", "sun_elevation")
                        if c in g.column_names})
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


def _empty_reduced(g: pa.Table) -> pa.Table:
    """Zero-row table with _group_reduce's OUTPUT schema (same construction
    order), so an empty ty-band block unions cleanly with reduced blocks."""
    rec: dict = {}
    for c in ("scene_id", "extent", "cell_size", "srid", "nodata", "acq_ts",
              "sun_azimuth", "sun_elevation"):
        if c in g.column_names:
            rec[c] = g[c].slice(0, 0)
    rec.update({
        "tile_id": pa.array([], pa.string()),
        "tx": pa.array([], pa.int32()), "ty": pa.array([], pa.int32()),
        "width": pa.array([], pa.int32()), "height": pa.array([], pa.int32()),
        "band_count": pa.array([], pa.int32()),
        "pixel_type": pa.array([], pa.string()),
        "pixels": pa.array([], pa.binary()),
        "mask": pa.array([], pa.binary()),
        "n_scenes": pa.array([], pa.int64()),
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


# ------------------------------------------------------------------------
# Shuffle-free stack reduce from storage (the scale path, like
# halo.with_halo_from_parquet): temporal epochs of one footprint are
# ALREADY co-located in storage (scene-aligned row groups; scenes of a
# position are consecutive), so the groupby(tx, ty) exchange above moves
# every pixel byte through the object store only to restore a locality the
# writer guaranteed.  Instead: one Ray task per (position, ty-band) does a
# pruned parquet read of just its scenes/rows, groups in-memory by (tx, ty)
# and runs the SAME _group_reduce — bit-identical output, zero shuffle.
#
# Partitioning assumption (documented): all epochs of a footprint live in
# the one tiles file and share the global (tx, ty) grid.  Violation
# degrades to a wrong group (missing epochs -> n_scenes mismatch), which
# the n_scenes column makes visible — never silent wrong pixels.
# ------------------------------------------------------------------------

def _reduce_tiles_from_parquet(path: str, scene_ids: list[int], ty_lo: int, ty_hi: int,
                               reduce_fn: StackReduce, out_pixel_type: str | None):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    flt = (pc.field("scene_id").isin(scene_ids)
           & (pc.field("ty") >= ty_lo) & (pc.field("ty") < ty_hi))
    t = pq.read_table(path, filters=flt)
    if t.num_rows == 0:  # empty ty-band (gap in coverage): the [0]/[0]
        # boundary slices below would hand _group_reduce a 0-row group
        return _empty_reduced(t)
    t = t.sort_by([("ty", "ascending"), ("tx", "ascending")])
    txs = np.asarray(t["tx"], dtype=np.int64)
    tys = np.asarray(t["ty"], dtype=np.int64)
    keys = (tys << 32) | txs
    cuts = np.flatnonzero(np.diff(keys)) + 1
    starts = np.concatenate([[0], cuts])
    ends = np.concatenate([cuts, [keys.size]])
    outs = [_group_reduce(t.slice(int(s), int(e - s)), reduce_fn, out_pixel_type)
            for s, e in zip(starts, ends)]
    return pa.concat_tables(outs)


def stack_reduce_from_parquet(tiles_path: str, reduce_fn: StackReduce,
                              out_pixel_type: str | None = None,
                              bands: int | None = None,
                              acq_window: tuple | None = None) -> rd.Dataset:
    """Zero-shuffle stack_reduce: per-(position, ty-band) pruned reads in
    parallel Ray tasks; output identical to stack_reduce() (gate:
    tests/test_raster_pipelines.py equality test).

    ``acq_window=(lo, hi)`` prunes whole SCENES at the metadata read —
    filtered epochs' pixels never leave storage (vs the Dataset-side
    filter, which reads then drops them)."""
    import pyarrow.parquet as pq
    import ray

    from ..sources import cluster_cpus

    meta = pq.read_table(tiles_path,
                         columns=["scene_id", "band_count", "tx", "ty", "acq_ts"])
    mdf = meta.to_pandas()
    if bands is not None:
        mdf = mdf[mdf["band_count"] == bands]
    sc = (mdf.groupby("scene_id")
          .agg(tx0=("tx", "min"), ty0=("ty", "min"),
               ty_min=("ty", "min"), ty_max=("ty", "max"),
               acq_ts=("acq_ts", "first")).reset_index())
    if acq_window is not None:
        lo, hi = acq_window
        sc = sc[(sc["acq_ts"] >= lo) & (sc["acq_ts"] < hi)]
    ncpu = cluster_cpus()
    positions = list(sc.groupby(["tx0", "ty0"]))
    bands_per_pos = max(1, (2 * ncpu) // max(1, len(positions)))
    task = ray.remote(_reduce_tiles_from_parquet)
    refs = []
    # band edges are aligned to the synth writer's 4-tile-row row groups, so
    # each task's ty predicate prunes at row-group granularity and pixels
    # outside the band are never decoded (measured 10× read amplification
    # without the alignment)
    rg_ty = 4
    for _, pos in positions:
        ids = [int(s) for s in pos["scene_id"]]
        y0, y1 = int(pos["ty_min"].min()), int(pos["ty_max"].max()) + 1
        n_units = -(-(y1 - y0) // rg_ty)
        units_per_band = max(1, n_units // bands_per_pos)
        step = units_per_band * rg_ty
        for lo_e in range(y0, y1, step):
            refs.append(task.remote(tiles_path, ids, int(lo_e), int(min(lo_e + step, y1)),
                                    reduce_fn, out_pixel_type))
    return rd.from_arrow_refs(refs)


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
