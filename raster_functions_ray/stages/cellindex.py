"""Cell-encode stages: assign hierarchical cell ids to tiles and geometries.

The batched cell-encode stage of the north-star: every tile row gets a
``cell_id`` from its extent centroid (world→lon/lat→grid.cell_encode), every
point geometry likewise.  Vectorized per batch; the tile→cell assignment
table is one of the driver's exact-match gates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .. import grid
from ..synth import SynthParams, world_to_lonlat

DEFAULT_LEVEL = 6


def tile_cells_batch(batch: pa.Table, p: SynthParams, level: int = DEFAULT_LEVEL) -> pa.Table:
    ext = np.asarray(batch["extent"].combine_chunks().flatten()).reshape(-1, 4)
    cx = (ext[:, 0] + ext[:, 2]) / 2.0
    cy = (ext[:, 1] + ext[:, 3]) / 2.0
    lon, lat = world_to_lonlat(cx, cy, p)
    cells = grid.cell_encode(lon, lat, level)
    return batch.append_column("cell_id", pa.array(cells, pa.int64()))


def assign_tile_cells(ds: rd.Dataset, p: SynthParams, level: int = DEFAULT_LEVEL,
                      batch_size: int = 256) -> rd.Dataset:
    """Append cell_id to tile rows. Metadata-only: select columns WITHOUT
    pixels upstream when only assignments are needed."""
    return ds.map_batches(lambda b: tile_cells_batch(b, p, level),
                          batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def point_cells_batch(lon: np.ndarray, lat: np.ndarray, level: int = DEFAULT_LEVEL) -> np.ndarray:
    return grid.cell_encode(lon, lat, level)
