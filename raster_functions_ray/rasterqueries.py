"""Raster pipelines exposed as driver queries over the synthetic tile world.

Pixel payloads cannot be decoded by a SQL oracle, so most entries return
per-tile summary rows (rows-only checks) — their pixel-exact correctness is
gated by the golden-kernel pytest suite instead (tests/test_kernels_*,
tests/test_raster_pipelines.py).  The tile→cell assignment IS SQL-checkable
(pure float arithmetic on the extent column) and is an exact-match gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from . import grid, synth
from .functions import pointwise as pw
from .functions import remap as rm
from .sources import read_tiles, read_zones
from .stages import cellindex, composite, halo, tile_map

LEVEL = cellindex.DEFAULT_LEVEL


def q_tile_cells(sf_dir: str) -> pd.DataFrame:
    """Exact tile→cell assignment table (metadata-only read: no pixels)."""
    d = synth.synth_dir_for(sf_dir)
    p = synth.params_for(synth.sf_from_dir(sf_dir))
    tiles = read_tiles(d, columns=["tile_id", "scene_id", "tx", "ty", "extent"])
    out = cellindex.assign_tile_cells(tiles, p, LEVEL)
    return out.to_pandas().drop(columns=["extent"])


def tile_cells_oracle_sql(sf: float = 0.01) -> str:
    p = synth.params_for(sf)
    d = synth.synth_dir(sf)
    n = float(2**LEVEL)
    return f"""
SELECT tile_id, scene_id, tx, ty,
       CAST({LEVEL} AS BIGINT) * 4503599627370496
       + CAST(floor(((extent[1] + extent[3]) / 2.0) / {p.world_w} * 360.0 / 360.0 * {n}) AS BIGINT) * 67108864
       + LEAST(CAST(floor((((extent[2] + extent[4]) / 2.0) / {p.world_h} * 180.0 - 90.0 + 90.0) / 180.0 * {n}) AS BIGINT), {int(n) - 1}) AS cell_id
FROM read_parquet('{d}/tiles.parquet')
"""


def _stats_df(ds: rd.Dataset) -> pd.DataFrame:
    out = tile_map.tile_stats(ds).to_pandas()
    for c in ("mean", "min", "max"):
        out[c] = out[c].astype(float).round(6)
    return out.sort_values("tile_id").reset_index(drop=True)


def q_ndvi_stats(sf_dir: str) -> pd.DataFrame:
    """NDVI (Grayscale mode) per-tile masked stats over the 2-band scenes."""
    d = synth.synth_dir_for(sf_dir)
    tiles = read_tiles(d).filter(expr="band_count == 2")
    out = tile_map.apply_kernel(
        tiles, lambda p, m, meta: (pw.ndvi(p[0], p[1], "Grayscale"), m), out_pixel_type="f4")
    return _stats_df(out)


def q_hillshade_stats(sf_dir: str) -> pd.DataFrame:
    """DEM → halo exchange → Hillshade (u1) per-tile stats.

    Full path: strip shuffle, padded-kernel, mask erosion semantics."""
    d = synth.synth_dir_for(sf_dir)
    tiles = read_tiles(d).filter(expr="band_count == 1")
    padded = halo.with_halo(tiles, padding=1)

    from .functions import focal as fc

    def hillshade_kernel(p, m, meta):
        dem = p if p.ndim == 2 else p[0]
        out, om = fc.hillshade(dem, m, meta["cell_size"],
                               is_geographic=(meta["srid"] == 4326))
        return out, om

    out = tile_map.apply_kernel(padded, hillshade_kernel, out_pixel_type="u1")
    return _stats_df(out)


def q_aspect_slope_stats(sf_dir: str) -> pd.DataFrame:
    d = synth.synth_dir_for(sf_dir)
    from .functions import focal as fc
    tiles = read_tiles(d).filter(expr="band_count == 1")
    padded = halo.with_halo(tiles, padding=1)

    def kernel(p, m, meta):
        dem = p if p.ndim == 2 else p[0]
        return fc.aspect_slope(dem, m, meta["cell_size"])

    out = tile_map.apply_kernel(padded, kernel, out_pixel_type="u1")
    return _stats_df(out)


def q_aggregate_mean_stats(sf_dir: str) -> pd.DataFrame:
    """Temporal stack mean over the 2-band (before/after) scene pairs."""
    d = synth.synth_dir_for(sf_dir)
    tiles = read_tiles(d).filter(expr="band_count == 2")
    out = composite.stack_reduce(tiles, composite.aggregate_reduce("Average"),
                                 out_pixel_type="f4")
    df = tile_map.tile_stats(out).to_pandas()
    for c in ("mean", "min", "max"):
        df[c] = df[c].astype(float).round(6)
    return df.sort_values("tile_id").reset_index(drop=True)


def q_median_composite_stats(sf_dir: str) -> pd.DataFrame:
    """Clear-pixel median composite over the Landsat epoch stacks (QA band 7)."""
    d = synth.synth_dir_for(sf_dir)
    tiles = read_tiles(d).filter(expr="band_count == 7")
    out = composite.stack_reduce(tiles, composite.median_composite_reduce(qa_band=6),
                                 out_pixel_type="f4")
    df = tile_map.tile_stats(out).to_pandas()
    for c in ("mean", "min", "max"):
        df[c] = df[c].astype(float).round(4)
    return df.sort_values("tile_id").reset_index(drop=True)


def burn_zone_raster(pix_shape, ext, p: synth.SynthParams, zones: pd.DataFrame) -> np.ndarray:
    """Vector→raster burn-in: per-pixel zone id from the zone polygons
    (candidates bbox-filtered; higher zone_id wins on overlap).

    The engine side of functions/deprecated/RasterizeAttributes.py:135-169.
    """
    h, w = pix_shape
    xs = np.linspace(ext[0], ext[2], w, endpoint=False) + (ext[2] - ext[0]) / (2 * w)
    ys = np.linspace(ext[1], ext[3], h, endpoint=False) + (ext[3] - ext[1]) / (2 * h)
    lon, lat = synth.world_to_lonlat(*np.meshgrid(xs, ys, indexing="xy"), p)
    tlon = (ext[0] / p.world_w * 360.0, ext[2] / p.world_w * 360.0)
    tlat = (ext[1] / p.world_h * 180.0 - 90.0, ext[3] / p.world_h * 180.0 - 90.0)
    z = np.zeros((h, w), dtype=np.int32)
    from .spatial import point_in_convex_batch
    for _, zr in zones.sort_values("zone_id").iterrows():
        bb = zr["bbox"]
        if bb[2] < tlon[0] or bb[0] > tlon[1] or bb[3] < tlat[0] or bb[1] > tlat[1]:
            continue
        if zr["is_rect"]:
            hit = (lon >= bb[0]) & (lon < bb[2]) & (lat >= bb[1]) & (lat < bb[3])
        else:
            hit = point_in_convex_batch(lon.ravel(), lat.ravel(),
                                        np.asarray(zr["vertices"])).reshape(h, w)
        z[hit] = int(zr["zone_id"])
    return z


def q_zonal_remap_counts(sf_dir: str) -> pd.DataFrame:
    """ZonalRemap over DEM tiles: burn zone raster from the vector side,
    remap per-zone [zmin, zmax] → zval, count output classes per tile."""
    d = synth.synth_dir_for(sf_dir)
    p = synth.params_for(synth.sf_from_dir(sf_dir))
    zones = read_zones(d).to_pandas()
    zt_map = {int(r["zone_id"]): [[r["zmin"], r["zmax"], r["zval"]]]
              for _, r in zones.iterrows()}
    zones_ref = ray.put((zones, zt_map))
    tiles = read_tiles(d).filter(expr="band_count == 1")

    def kernel_batch(b: pa.Table) -> pd.DataFrame:
        zdf, ztm = ray.get(zones_ref)
        from . import tilecodec
        recs = []
        tid = b["tile_id"].to_pylist()
        exts = b["extent"].to_pylist()
        for i, pix, msk in tilecodec.iter_tiles(b):
            dem = pix if pix.ndim == 2 else pix[0]
            zr = burn_zone_raster(dem.shape, exts[i], p, zdf)
            out = rm.zonal_remap(dem, zr, ztm, background=0, default_target=255)
            vals, cnts = np.unique(out, return_counts=True)
            for v, n in zip(vals, cnts):
                recs.append((tid[i], int(v), int(n)))
        return pd.DataFrame(recs, columns=["tile_id", "zval", "n_px"])

    out = tiles.map_batches(kernel_batch, batch_format="pyarrow", batch_size=16)
    return out.to_pandas().sort_values(["tile_id", "zval"]).reset_index(drop=True)


def q_doc_zone_join(sf_dir: str) -> pd.DataFrame:
    """Interleaved-doc text spans (WKT points) joined to the synthetic zone
    polygons via the cell-indexed actor pool (spatial.ZoneJoiner)."""
    from . import spatial
    from .sources import read_documents

    d = synth.synth_dir_for(sf_dir)
    zones = read_zones(d).to_pandas()
    out = spatial.doc_points_in_zones(read_documents(d), zones)
    return (out.to_pandas().sort_values(["doc_id", "zone_id"])
            .reset_index(drop=True))
