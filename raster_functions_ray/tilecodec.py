"""Zero-copy codec between tile rows (Arrow binary columns) and NumPy blocks.

The reference receives pixel blocks as ndarrays of shape (rows, cols) or
(bands, rows, cols) from the host (functions/Reference.py:195-198).  Here the
block lives in a ``pixels: binary`` column; ``decode`` wraps the Arrow buffer
with ``np.frombuffer`` (no copy), ``encode`` serializes a C-contiguous array.

Masks are u1 arrays of shape (height, width), 1 = valid, matching the
``<name>_mask`` convention (functions/Reference.py:212-216).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def decode(buf: bytes | memoryview, pixel_type: str, band_count: int, height: int, width: int) -> np.ndarray:
    """binary buffer -> read-only ndarray (band_count, height, width); (h, w) if 1 band."""
    band_count, height, width = int(band_count), int(height), int(width)
    a = np.frombuffer(buf, dtype=np.dtype(pixel_type))
    if band_count == 1:
        return a.reshape(height, width)
    return a.reshape(band_count, height, width)


def decode_mask(buf: bytes | memoryview | None, height: int, width: int) -> np.ndarray:
    height, width = int(height), int(width)
    if buf is None:
        return np.ones((height, width), dtype=np.uint8)
    return np.frombuffer(buf, dtype=np.uint8).reshape(height, width)


def encode(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr).tobytes()


def iter_tiles(batch: pa.Table, pixels_col: str = "pixels", mask_col: str = "mask"):
    """Yield (row_index, pixels ndarray, mask ndarray) per tile row of an Arrow batch.

    Uses python-level iteration over ROWS of the batch (tiles are coarse —
    one row is a whole 64²–256² pixel block, so per-row overhead is
    amortized over thousands of pixels; the per-PIXEL work stays vectorized).
    """
    pt = batch["pixel_type"].to_pylist()
    bc = batch["band_count"].to_pylist()
    h = batch["height"].to_pylist()
    w = batch["width"].to_pylist()
    pix = batch[pixels_col]
    msk = batch[mask_col] if mask_col in batch.column_names else None
    for i in range(batch.num_rows):
        p = decode(pix[i].as_buffer(), pt[i], bc[i], h[i], w[i])
        m = decode_mask(msk[i].as_buffer() if msk is not None and msk[i].is_valid else None, h[i], w[i])
        yield i, p, m


def band(arr: np.ndarray, idx: int) -> np.ndarray:
    """Band extraction — models extractBands (functions/Reference.py:84-88)."""
    return arr if arr.ndim == 2 else arr[idx]
