"""Function-chain builder: the engine analog of ``.rft.xml`` templates.

A chain is a list of ``Op``s lowered onto Ray Data stages by a tiny planner
(SURVEY.md §2.7, §3.2):

- consecutive pointwise ops (padding == 0) FUSE into one ``map_batches``
  stage — the per-tile kernels compose in-process exactly like the
  reference's demand-driven pull evaluation fuses a template per block
  (README.md:4-5, functions/VineyardAnalysis.rft.xml:27-115);
- an op with ``padding > 0`` forces a halo-exchange stage before it;
- an op with ``group == True`` lowers to a grouped stack reduce.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import ray.data as rd

from ..stages import composite, halo, tile_map


@dataclass
class Op:
    """One node of a function chain.

    kernel: (pixels, mask, meta) -> (pixels, mask) over one tile; for
    ``padding > 0`` the kernel receives the padded arrays and must return
    the trimmed core (reference updatePixels contract).
    """

    name: str
    kernel: Callable
    padding: int = 0
    out_pixel_type: str | None = None
    batch_size: int = 32


def _fuse(ops: list[Op]) -> Callable:
    def fused(pix: np.ndarray, msk: np.ndarray, meta: dict):
        for op in ops:
            pix, msk = op.kernel(pix, msk, meta)
            if msk is None:
                msk = np.ones(np.asarray(pix).shape[-2:], np.uint8)
        return pix, msk
    return fused


def build_chain(ds: rd.Dataset, ops: list[Op], tiles_path: str | None = None,
                bands: int | None = None) -> rd.Dataset:
    """Lower a chain onto Dataset stages, fusing pointwise runs.

    When the chain STARTS with a padded op and ``tiles_path`` is given, the
    halo comes from the shuffle-free storage-aligned read
    (halo.with_halo_from_parquet) instead of the groupby exchange — ``ds``
    is then never executed (lazy).  Mid-chain padded ops always use the
    exchange (their input exists only as a Dataset)."""
    i = 0
    while i < len(ops):
        op = ops[i]
        if op.padding > 0:
            if i == 0 and tiles_path is not None:
                ds = halo.with_halo_from_parquet(tiles_path, padding=op.padding,
                                                 bands=bands)
            else:
                ds = halo.with_halo(ds, padding=op.padding)
            ds = tile_map.apply_kernel(ds, op.kernel, op.out_pixel_type,
                                       batch_size=op.batch_size)
            i += 1
            continue
        run = [op]
        j = i + 1
        while j < len(ops) and ops[j].padding == 0:
            run.append(ops[j])
            j += 1
        ds = tile_map.apply_kernel(ds, _fuse(run), run[-1].out_pixel_type,
                                   batch_size=run[0].batch_size)
        i = j
    return ds
