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
    tiles = read_tiles(d, bands=2)
    out = tile_map.apply_kernel(
        tiles, lambda p, m, meta: (pw.ndvi(p[0], p[1], "Grayscale"), m), out_pixel_type="f4")
    return _stats_df(out)


def q_hillshade_stats(sf_dir: str) -> pd.DataFrame:
    """DEM → halo exchange → Hillshade (u1) per-tile stats.

    Full path: strip shuffle, padded-kernel, mask erosion semantics."""
    d = synth.synth_dir_for(sf_dir)
    tiles = read_tiles(d, bands=1)
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
    tiles = read_tiles(d, bands=1)
    padded = halo.with_halo(tiles, padding=1)

    def kernel(p, m, meta):
        dem = p if p.ndim == 2 else p[0]
        return fc.aspect_slope(dem, m, meta["cell_size"])

    out = tile_map.apply_kernel(padded, kernel, out_pixel_type="u1")
    return _stats_df(out)


def q_aggregate_mean_stats(sf_dir: str) -> pd.DataFrame:
    """Temporal stack mean over the 2-band (before/after) scene pairs."""
    d = synth.synth_dir_for(sf_dir)
    tiles = read_tiles(d, bands=2)
    out = composite.stack_reduce(tiles, composite.aggregate_reduce("Average"),
                                 out_pixel_type="f4")
    df = tile_map.tile_stats(out).to_pandas()
    for c in ("mean", "min", "max"):
        df[c] = df[c].astype(float).round(6)
    return df.sort_values("tile_id").reset_index(drop=True)


def q_median_composite_stats(sf_dir: str) -> pd.DataFrame:
    """Clear-pixel median composite over the Landsat epoch stacks (QA band 7)."""
    d = synth.synth_dir_for(sf_dir)
    tiles = read_tiles(d, bands=7)
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
    tiles = read_tiles(d, bands=1)

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


# ------------------------------------------------------- chains & ML ----

def q_tri_stats(sf_dir: str) -> pd.DataFrame:
    """Terrain Ruggedness Index via the expression evaluator
    (functions/TerrainRuggednessIndex-Riley-Colormap.rft.xml Expression),
    run over halo-padded DEM tiles."""
    from .functions.expr import terrain_ruggedness_expression
    from .pipelines.chain import Op, build_chain

    d = synth.synth_dir_for(sf_dir)
    expr = terrain_ruggedness_expression()

    def kernel(p, m, meta):
        dem = p if p.ndim == 2 else p[0]
        out = expr.evaluate({"DEM": dem})
        pad = expr.padding_required
        from .functions.focal import erode_mask_3x3
        return out, erode_mask_3x3(m) if pad == 1 else m
    tiles = read_tiles(d, bands=1)
    out = build_chain(tiles, [Op("tri", kernel, padding=expr.padding_required,
                                 out_pixel_type="f4")])
    return _stats_df(out)


def q_ndvi_colormap_chain(sf_dir: str) -> pd.DataFrame:
    """NDVI → Colormap chain (two fused pointwise ops → ONE map_batches
    stage): per-tile RGB band means of the colormapped output."""
    from .functions.remap import colormap_lookup
    from .pipelines.chain import Op, build_chain

    d = synth.synth_dir_for(sf_dir)
    # compact 4-entry colormap (structure per functions/deprecated/NDVI.py:73-86)
    vals = np.arange(0, 201, dtype=np.int64)
    rgb = (np.clip(vals, 0, 255).astype(np.uint8),
           np.clip(255 - vals, 0, 255).astype(np.uint8),
           np.full(vals.size, 40, np.uint8))

    def ndvi_op(p, m, meta):
        return pw.ndvi(p[0], p[1], "Colormap"), m

    def cmap_op(p, m, meta):
        return colormap_lookup(np.clip(p, 0, 200).astype(np.uint8), vals, rgb), m

    tiles = read_tiles(d, bands=2)
    out = build_chain(tiles, [Op("ndvi", ndvi_op, out_pixel_type="u1"),
                              Op("colormap", cmap_op, out_pixel_type="u1")])

    def band_means(b: pa.Table) -> pd.DataFrame:
        from . import tilecodec
        recs = []
        tid = b["tile_id"].to_pylist()
        for i, pix, msk in tilecodec.iter_tiles(b):
            recs.append((tid[i], *[round(float(pix[k].mean()), 6) for k in range(3)]))
        return pd.DataFrame(recs, columns=["tile_id", "mean_r", "mean_g", "mean_b"])

    return (out.map_batches(band_means, batch_format="pyarrow", batch_size=32)
            .to_pandas().sort_values("tile_id").reset_index(drop=True))


def q_composite_bands_stats(sf_dir: str) -> pd.DataFrame:
    """CompositeBands (functions/deprecated/CompositeBands.rft.xml): zip the
    two redir epochs of each footprint into one 4-band tile (band order =
    acq_ts order, fixed like CompositeBands-4Bands-Ordered.rft.xml)."""
    d = synth.synth_dir_for(sf_dir)
    tiles = read_tiles(d, bands=2)

    def zip_bands(stack, masks, g):
        bands = np.concatenate(list(stack), axis=0)  # (2*epochs, h, w)
        return bands, np.all(masks, axis=0).astype(np.uint8)

    out = composite.stack_reduce(tiles, zip_bands, out_pixel_type="f4")
    df = tile_map.tile_stats(out).to_pandas()
    for c in ("mean", "min", "max"):
        df[c] = df[c].astype(float).round(6)
    return df.sort_values("tile_id").reset_index(drop=True)


def q_vector_field_stats(sf_dir: str) -> pd.DataFrame:
    """VectorFieldFunction (functions/VF.rft.xml): treat the 2 redir bands
    as u/v components → magnitude/direction tile."""
    from .functions.expr import vector_field

    d = synth.synth_dir_for(sf_dir)
    tiles = read_tiles(d, bands=2)

    def kernel(p, m, meta):
        mag, direction = vector_field(p[0], p[1])
        return np.stack([mag, direction]), m

    out = tile_map.apply_kernel(tiles, kernel, out_pixel_type="f4")
    return _stats_df(out)


def q_knn_classify_stats(sf_dir: str) -> pd.DataFrame:
    """kNN pixel classification (functions/KNearestNeighborsClassifier.py:81-128)
    over the Landsat SR bands — actor pool, model fit once per actor."""
    from .sources import read_training
    from .stages.classify import classify_tiles

    d = synth.synth_dir_for(sf_dir)
    training = read_training(d).to_pandas()
    tiles = read_tiles(d, bands=7)

    def drop_qa(p, m, meta):
        return p[:6], m

    sr = tile_map.apply_kernel(tiles, drop_qa, out_pixel_type="u2")
    out = classify_tiles(sr, training, model="knn", k=5)

    def class_counts(b: pa.Table) -> pd.DataFrame:
        from . import tilecodec
        recs = []
        tid = b["tile_id"].to_pylist()
        for i, pix, msk in tilecodec.iter_tiles(b):
            b0 = pix if pix.ndim == 2 else pix[0]
            recs.append((tid[i], int((b0 == 1).sum()), int(b0.size)))
        return pd.DataFrame(recs, columns=["tile_id", "n_class1", "n_px"])

    return (out.map_batches(class_counts, batch_format="pyarrow", batch_size=16)
            .to_pandas().sort_values("tile_id").reset_index(drop=True))


def q_rf_classify_stats(sf_dir: str) -> pd.DataFrame:
    """RandomForest-shaped classifier stage ([pred, p0, p1] 3-band output,
    functions/RandomForestClassifier.py:71-120; deterministic stump-ensemble
    fallback — sklearn absent in this environment)."""
    from .sources import read_training
    from .stages.classify import classify_tiles

    d = synth.synth_dir_for(sf_dir)
    training = read_training(d).to_pandas()
    tiles = read_tiles(d, bands=7)

    def drop_qa(p, m, meta):
        return p[:6], m

    sr = tile_map.apply_kernel(tiles, drop_qa, out_pixel_type="u2")
    out = classify_tiles(sr, training, model="rf")

    def summarize(b: pa.Table) -> pd.DataFrame:
        from . import tilecodec
        recs = []
        tid = b["tile_id"].to_pylist()
        for i, pix, msk in tilecodec.iter_tiles(b):
            recs.append((tid[i], int(pix[0].sum()), round(float(pix[2].mean()), 6)))
        return pd.DataFrame(recs, columns=["tile_id", "n_pred1", "mean_p1"])

    return (out.map_batches(summarize, batch_format="pyarrow", batch_size=16)
            .to_pandas().sort_values("tile_id").reset_index(drop=True))


def q_percent_above_threshold(sf_dir: str) -> pd.DataFrame:
    """PercentAboveThreshold (functions/PercentAboveThreshold.py:90-150):
    date-window filter on acq_ts → per-footprint scalar %≤threshold."""
    d = synth.synth_dir_for(sf_dir)
    tiles = read_tiles(d, bands=7)

    # date window (functions/PercentAboveThreshold.py:128-135) as a
    # vectorized Arrow filter: keep epochs in [1985-02-01, 1985-06-01)
    import pyarrow.compute as pc

    lo = pa.scalar(pd.Timestamp("1985-02-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1985-06-01"), pa.timestamp("us"))
    tiles = tiles.map_batches(
        lambda b: b.filter(pc.and_(pc.greater_equal(b["acq_ts"], lo),
                                   pc.less(b["acq_ts"], hi))),
        batch_format="pyarrow", batch_size=64, zero_copy_batch=True)

    from .functions import stack as st

    def reduce_fn(stack, masks, g):
        pct, block = st.percent_above_threshold(stack[:, 0, :, :], 8000.0, below=True)
        return block, np.ones(block.shape, np.uint8)

    out = composite.stack_reduce(tiles, reduce_fn, out_pixel_type="f8")

    def pct_rows(b: pa.Table) -> pd.DataFrame:
        from . import tilecodec
        recs = []
        tid = b["tile_id"].to_pylist()
        for i, pix, msk in tilecodec.iter_tiles(b):
            b0 = pix if pix.ndim == 2 else pix[0]
            recs.append((tid[i], round(float(b0[0, 0]), 6)))
        return pd.DataFrame(recs, columns=["tile_id", "pct_below"])

    return (out.map_batches(pct_rows, batch_format="pyarrow", batch_size=32)
            .to_pandas().sort_values("tile_id").reset_index(drop=True))


def q_topographic_c(sf_dir: str) -> pd.DataFrame:
    """TopographicCCorrection two-phase plan
    (functions/TopographicCCorrection.py:88-154): per-(scene, band) OLS of
    image vs cos(i) → C = b/m, emitted per scene/band (phase 1; phase 2
    applies the correction map-side)."""
    from .functions import focal as fc
    from .functions import stack as st

    d = synth.synth_dir_for(sf_dir)
    dem_tiles = read_tiles(d, bands=1)
    padded = halo.with_halo(dem_tiles, padding=1)

    def slope_aspect_cos(b: pa.Table) -> pd.DataFrame:
        from . import tilecodec
        recs = []
        meta_cols = {c: b[c].to_pylist() for c in ("tile_id", "scene_id", "sun_azimuth", "sun_elevation", "width", "pixel_type", "band_count", "height")}
        pads = b["padding"].to_pylist()
        for i in range(b.num_rows):
            p2 = 2 * int(pads[i])
            h = int(meta_cols["height"][i]) + p2
            w = int(meta_cols["width"][i]) + p2
            pix = tilecodec.decode(b["pixels"][i].as_buffer(), meta_cols["pixel_type"][i],
                                   int(meta_cols["band_count"][i]), h, w)
            dem = pix if pix.ndim == 2 else pix[0]
            dxc = fc.convolve3x3(dem, fc.ASPECT_X) / 8.0
            dyc = fc.convolve3x3(dem, fc.ASPECT_Y) / 8.0
            slope_deg = np.degrees(np.arctan(np.sqrt(dxc**2 + dyc**2) / 30.0))[1:-1, 1:-1]
            aspect_deg = (57.29578 * np.arctan2(dxc, -dyc))[1:-1, 1:-1] % 360.0
            cos_i = st.cos_incidence(slope_deg, aspect_deg,
                                     meta_cols["sun_azimuth"][i], meta_cols["sun_elevation"][i])
            band = dem[1:-1, 1:-1]
            # per-tile partial regression moments (combine exactly at scene level)
            n = band.size
            recs.append((int(meta_cols["scene_id"][i]), n, float(cos_i.sum()),
                         float(band.sum()), float((cos_i * cos_i).sum()),
                         float((cos_i * band).sum())))
        return pd.DataFrame(recs, columns=["scene_id", "n", "sx", "sy", "sxx", "sxy"])

    partials = padded.map_batches(slope_aspect_cos, batch_format="pyarrow", batch_size=16)
    from ray.data.aggregate import Sum
    agg = (partials.groupby("scene_id")
           .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
                      Sum("sxy", alias_name="sxy"))
           .to_pandas())
    denom = agg["sxx"] - agg["sx"] ** 2 / agg["n"]
    slope = (agg["sxy"] - agg["sx"] * agg["sy"] / agg["n"]) / denom
    intercept = agg["sy"] / agg["n"] - slope * agg["sx"] / agg["n"]
    agg["c_factor"] = np.round(intercept / slope, 6)
    return agg[["scene_id", "c_factor"]].sort_values("scene_id").reset_index(drop=True)
