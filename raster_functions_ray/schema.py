"""Arrow schemas for the engine's logical tables.

Maps the reference's host-side structures onto columnar rows (SURVEY.md §1.3):

- ``TILE_SCHEMA`` models the raster-info dict + pixel block of
  ``/root/reference/functions/Reference.py:138-168,188-226`` — one row per
  tile, pixels as a C-order binary buffer decoded zero-copy in kernels.
- ``DOC_SCHEMA`` is the driver ``input_hint``: interleaved text+media
  documents, ``media_ref`` spans FK into tiles, text spans carry WKT.
- ``ZONE_SCHEMA`` models ZonalAttributesTable rows
  (``/root/reference/functions/utils.py:149-258``,
  ``/root/reference/functions/deprecated/ZonalRemap.py:12``).
"""

from __future__ import annotations

import pyarrow as pa

# Reference pixel-type domain (functions/Reference.py:140-142): numpy typestr
# without byte order. 't1/t2/t4' (bit-packed) are not representable in numpy;
# the reference itself only produces the ones below in practice.
PIXEL_TYPES = ("u1", "u2", "u4", "i1", "i2", "i4", "f4", "f8")

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),        # "text" | "media"
        ("text", pa.string()),        # WKT geometry for text spans, "" for media
        ("media_ref", pa.string()),   # tile_id FK for media spans, "" for text
        ("offset", pa.int32()),       # strictly increasing per doc
    ]
)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

TILE_SCHEMA = pa.schema(
    [
        ("tile_id", pa.string()),     # f"t{scene:03d}_{tx:03d}_{ty:03d}"
        ("scene_id", pa.int32()),
        ("tx", pa.int32()),
        ("ty", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("band_count", pa.int32()),
        ("pixel_type", pa.string()),  # element of PIXEL_TYPES
        ("pixels", pa.binary()),      # C-order (band_count, height, width)
        ("mask", pa.binary()),        # u1 (height, width); 1 = valid
        ("extent", pa.list_(pa.float64(), 4)),   # xmin, ymin, xmax, ymax
        ("cell_size", pa.list_(pa.float64(), 2)),
        ("srid", pa.int32()),
        ("nodata", pa.float64()),
        ("acq_ts", pa.timestamp("us")),
        ("sun_azimuth", pa.float64()),
        ("sun_elevation", pa.float64()),
    ]
)

ZONE_SCHEMA = pa.schema(
    [
        ("zone_id", pa.int32()),
        # axis-aligned rect (xmin,ymin,xmax,ymax) — the covering box; convex
        # polygons additionally carry vertices as interleaved x,y pairs.
        ("bbox", pa.list_(pa.float64(), 4)),
        ("vertices", pa.list_(pa.float64())),  # convex ring, CCW, interleaved
        ("is_rect", pa.bool_()),
        ("zmin", pa.float64()),
        ("zmax", pa.float64()),
        ("zval", pa.float64()),
        ("attr_1", pa.float64()),
        ("attr_2", pa.float64()),
        ("attr_3", pa.float64()),
        ("attr_4", pa.float64()),
    ]
)

TRAINING_SCHEMA = pa.schema(
    [("OBJECTID", pa.int32()), ("LOCATION_X", pa.float64()), ("LOCATION_Y", pa.float64())]
    + [(f"pred_{i}", pa.float64()) for i in range(1, 7)]
    + [("VarToPredict", pa.int32())]
)
