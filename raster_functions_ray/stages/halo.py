"""Halo exchange for focal ops: neighbor strips shuffled on the tile key.

The reference's host hands each focal function a block padded by ``padding``
pixels (functions/Reference.py:100, functions/deprecated/Hillshade.py:60).
The engine reconstructs that halo explicitly:

1. ``emit_strips``: every tile row emits ≤9 contributions — its full body to
   itself, thin edge strips (p rows/cols) to each neighbor key.  Only the
   strips travel to other partitions; the all-to-all volume beyond the
   identity contribution is O(perimeter), not O(area).
2. ``groupby(scene_id, tx, ty).map_groups(assemble)``: pads the body,
   overlays neighbor strips; scene-border pads replicate the edge
   (mask stays 0 there, so the 3×3 mask erosion marks the border invalid —
   SURVEY.md §7.2).

Output rows carry ``pixels``/``mask`` WITH the halo plus a ``padding``
column; focal kernels trim it like the reference trims ``[1:-1, 1:-1]``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .. import tilecodec

_PASS_META = ("tile_id", "width", "height", "band_count", "pixel_type", "extent",
              "cell_size", "srid", "nodata", "acq_ts", "sun_azimuth", "sun_elevation")


def _sel(n: int, d: int, p: int) -> slice:
    # contributor-side selection for offset d = target − contributor
    if d == 1:
        return slice(n - p, n)
    if d == -1:
        return slice(0, p)
    return slice(0, n)


def emit_strips_batch(batch: pa.Table, padding: int) -> pa.Table:
    p = padding
    metas = {c: batch[c].to_pylist() for c in batch.column_names
             if c not in ("pixels", "mask")}
    out: dict[str, list] = {
        "scene_id": [], "tx": [], "ty": [], "dx": [], "dy": [],
        "strip": [], "strip_mask": [], "sh": [], "sw": [],
    }
    for c in _PASS_META:
        out[c] = []
    for i, pix, msk in tilecodec.iter_tiles(batch):
        if pix.ndim == 2:
            pix = pix[None]
        h, w = pix.shape[-2:]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ys, xs = _sel(h, dy, p), _sel(w, dx, p)
                strip = pix[:, ys, xs]
                smask = msk[ys, xs]
                out["scene_id"].append(metas["scene_id"][i])
                out["tx"].append(metas["tx"][i] + dx)
                out["ty"].append(metas["ty"][i] + dy)
                out["dx"].append(dx)
                out["dy"].append(dy)
                out["strip"].append(tilecodec.encode(strip))
                out["strip_mask"].append(tilecodec.encode(smask))
                out["sh"].append(strip.shape[-2])
                out["sw"].append(strip.shape[-1])
                for c in _PASS_META:
                    # meta of the CONTRIBUTOR; only the identity row's meta is
                    # used at assembly (dx=dy=0)
                    out[c].append(metas[c][i] if (dx, dy) == (0, 0) else None)
    t = {k: pa.array(v) for k, v in out.items()}
    t["dx"] = pa.array(out["dx"], pa.int8())
    t["dy"] = pa.array(out["dy"], pa.int8())
    return pa.table(t)


def assemble_group(g: pd.DataFrame, padding: int) -> pd.DataFrame:
    p = padding
    center = g[(g["dx"] == 0) & (g["dy"] == 0)]
    if center.empty:
        # strips addressed to a tile outside the scene grid — drop
        return pd.DataFrame()
    c = center.iloc[0]
    bc, pt = int(c["band_count"]), c["pixel_type"]
    h, w = int(c["height"]), int(c["width"])
    body = tilecodec.decode(c["strip"], pt, bc, h, w)
    if body.ndim == 2:
        body = body[None]
    # pad with body-edge replication, then overlay real neighbor strips
    padded = np.pad(body, ((0, 0), (p, p), (p, p)), mode="edge")
    pmask = np.zeros((h + 2 * p, w + 2 * p), dtype=np.uint8)
    pmask[p:-p, p:-p] = tilecodec.decode_mask(c["strip_mask"], h, w)
    present: set[tuple[int, int]] = set()
    for _, row in g.iterrows():
        dx, dy = int(row["dx"]), int(row["dy"])
        present.add((dx, dy))
        if (dx, dy) == (0, 0):
            continue
        sh, sw = int(row["sh"]), int(row["sw"])
        strip = tilecodec.decode(row["strip"], pt, bc, sh, sw)
        if strip.ndim == 2:
            strip = strip[None]
        smask = tilecodec.decode_mask(row["strip_mask"], sh, sw)
        ys = slice(0, p) if dy == 1 else (slice(h + p, h + 2 * p) if dy == -1 else slice(p, h + p))
        xs = slice(0, p) if dx == 1 else (slice(w + p, w + 2 * p) if dx == -1 else slice(p, w + p))
        padded[:, ys, xs] = strip
        pmask[ys, xs] = smask
    # scene-border sides: replicate inward-adjacent (now strip-filled) values
    # so the result equals np.pad(whole_scene, mode='edge') — x-fill then
    # y-fill covers the corners because the scene grid is rectangular
    # (mask stays 0 outside the scene)
    if (1, 0) not in present:   # no left neighbor
        padded[:, :, 0:p] = padded[:, :, p:p + 1]
    if (-1, 0) not in present:  # no right neighbor
        padded[:, :, w + p:] = padded[:, :, w + p - 1:w + p]
    if (0, 1) not in present:   # no top neighbor
        padded[:, 0:p, :] = padded[:, p:p + 1, :]
    if (0, -1) not in present:  # no bottom neighbor
        padded[:, h + p:, :] = padded[:, h + p - 1:h + p, :]
    rec = {k: [c[k]] for k in _PASS_META}
    rec.update({"scene_id": [c["scene_id"]], "tx": [int(c["tx"])], "ty": [int(c["ty"])],
                "padding": [p],
                "pixels": [tilecodec.encode(padded if bc > 1 else padded[0])],
                "mask": [tilecodec.encode(pmask)]})
    return pd.DataFrame(rec)


def with_halo(tiles: rd.Dataset, padding: int = 1) -> rd.Dataset:
    """tiles → padded tiles (pixels/mask include a ``padding``-px halo).

    The one all-to-all of the focal path; keyed on (scene_id, tx, ty) so
    co-located strips group without a global sort.
    """
    strips = tiles.map_batches(lambda b: emit_strips_batch(b, padding),
                               batch_format="pyarrow", batch_size=32,
                               zero_copy_batch=True)
    return strips.groupby(["scene_id", "tx", "ty"]).map_groups(
        lambda g: assemble_group(g, padding), batch_format="pandas")


def pad_single_tile(pix: np.ndarray, msk: np.ndarray, padding: int):
    """Single-tile fallback used by oracle tests: same edge-replicate +
    zero-mask semantics as assemble_group with no neighbors."""
    p = padding
    if pix.ndim == 2:
        pix = pix[None]
    padded = np.pad(pix, ((0, 0), (p, p), (p, p)), mode="edge")
    pmask = np.zeros((pix.shape[-2] + 2 * p, pix.shape[-1] + 2 * p), dtype=np.uint8)
    pmask[p:-p, p:-p] = msk
    return padded, pmask
