"""raster_functions_ray — a Ray-Data-native spatial-join + tiling engine.

From-scratch re-expression of the query/data-processing capabilities of
Esri/raster-functions (reference at /root/reference, cited per-module as
file:line) on top of ``ray.data.Dataset`` pipelines:

- raster tiles are *rows* of an Arrow table (binary pixel payload +
  georeference columns), not host-managed pixel blocks;
- per-tile pixel kernels (NDVI, Hillshade, Windchill, ...) are pure NumPy
  functions lowered onto ``map_batches(batch_format="pyarrow")`` stages;
- temporal composites over scene stacks are ``groupby((tx, ty)).map_groups``
  reduces — the engine computes the "which scenes overlap this tile"
  relation explicitly instead of relying on a host;
- vector geometries and tiles are indexed into hierarchical cells
  (quadtree over lon/lat) for point-in-polygon joins, kNN and zonal ops;
- stateful stages (sklearn models, zone-attribute tables) are actor pools.

No code is copied from the reference; only formulas/semantics are
re-implemented (citations in docstrings).
"""

__version__ = "0.1.0"
