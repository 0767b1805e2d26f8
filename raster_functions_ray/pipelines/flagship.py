"""Flagship pipeline: interleaved docs → media-ref resolve → NDVI → cell
aggregate.

The shape of the north-star in one run:

1. ``read_parquet(documents)`` → vectorized span explode;
2. media spans aggregated to per-tile reference counts
   (map_batches partial count → small groupby — pre-aggregated shuffle);
3. tile table filtered to 2-band scenes, NDVI kernel per tile (MB stage),
   masked per-tile mean NDVI;
4. ref-counts broadcast via ``ray.put`` and joined map-side (no shuffle:
   the count table is tiny relative to the pixel table);
5. tiles cell-encoded, ``groupby(cell_id)`` aggregate → compact result.

Scales: the only all-to-all moves are (2) over pre-aggregated counts and (5)
over per-tile scalar rows — pixel payloads never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from .. import synth
from ..functions import pointwise
from ..sources import read_documents, read_tiles
from ..stages import cellindex, spans, tile_map


def ndvi_kernel(pix: np.ndarray, msk: np.ndarray, meta: dict):
    red, ir = pix[0], pix[1]
    return pointwise.ndvi(red, ir, "Raw"), msk


def media_ref_counts(docs: rd.Dataset) -> rd.Dataset:
    """Per-tile media reference counts, pre-aggregated inside map_batches
    before the (small) groupby shuffle."""
    exploded = spans.explode_spans(docs)
    media = spans.media_refs(exploded)

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            b.to_pandas().groupby("media_ref", sort=False).size().reset_index(name="n"),
            preserve_index=False)

    partials = media.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("media_ref").aggregate(Sum("n", alias_name="ref_count"))


def run(sf_dir: str = "/root/testdata/sf0.001") -> rd.Dataset:
    d = synth.synth_dir_for(sf_dir)
    p = synth.params_for(synth.sf_from_dir(sf_dir))

    counts = media_ref_counts(read_documents(d)).to_pandas()
    count_map_ref = ray.put(dict(zip(counts["media_ref"], counts["ref_count"])))

    tiles = read_tiles(d, bands=2)
    ndvi_tiles = tile_map.apply_kernel(tiles, ndvi_kernel, out_pixel_type="f4")
    stats = tile_map.tile_stats(ndvi_tiles)

    def attach(batch: pa.Table) -> pa.Table:
        cmap = ray.get(count_map_ref)
        refs = [int(cmap.get(t, 0)) for t in batch["tile_id"].to_pylist()]
        return batch.append_column("ref_count", pa.array(refs, pa.int64()))

    stats = stats.map_batches(attach, batch_format="pyarrow")

    # re-attach georeference for cell encoding (metadata-only read: no pixels)
    geo = read_tiles(d, columns=["tile_id", "extent"]).to_pandas()
    geo_ref = ray.put(dict(zip(geo["tile_id"], geo["extent"])))

    def add_cell(batch: pa.Table) -> pa.Table:
        gmap = ray.get(geo_ref)
        ext = np.asarray([gmap[t] for t in batch["tile_id"].to_pylist()])
        lon, lat = synth.world_to_lonlat((ext[:, 0] + ext[:, 2]) / 2, (ext[:, 1] + ext[:, 3]) / 2, p)
        return batch.append_column("cell_id", pa.array(cellindex.point_cells_batch(lon, lat), pa.int64()))

    stats = stats.map_batches(add_cell, batch_format="pyarrow")
    return (stats.groupby("cell_id")
            .aggregate(Count(alias_name="n_tiles"),
                       Mean("mean", alias_name="mean_ndvi"),
                       Sum("ref_count", alias_name="doc_refs")))
