"""Hypothesis property tests for the hierarchical grid (pure numpy, no Ray)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raster_functions_ray.grid import (IX_STRIDE, LEVEL_STRIDE,
                                       adaptive_covering, cell_decode,
                                       cell_encode, covering, parent)

lon = st.floats(min_value=0.0, max_value=360.0, allow_nan=False,
                allow_infinity=False)
lat = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False,
                allow_infinity=False)


@settings(max_examples=150, deadline=None)
@given(x0=lon, y0=lat, dx=st.floats(0.001, 90.0), dy=st.floats(0.001, 45.0),
       lmin=st.integers(2, 4), span=st.integers(1, 3))
def test_adaptive_covering_invariants(x0, y0, dx, dy, lmin, span):
    xmin, ymin = x0, y0
    xmax, ymax = min(360.0, x0 + dx), min(90.0, y0 + dy)
    lmax = lmin + span
    z, lv, ix, iy, full = adaptive_covering(
        np.asarray([[xmin, ymin, xmax, ymax]]), lmin, lmax)
    # 1. all cells in-grid at their level
    n = 2 ** lv
    assert (ix >= 0).all() and (iy >= 0).all()
    assert (ix < n).all() and (iy < n).all()
    # 2. partial cells only at lmax
    assert (lv[~full] == lmax).all()
    # 3. pairwise disjoint (normalize to lmax index ranges)
    s = 2 ** (lmax - lv)
    xs0, xs1 = ix * s, (ix + 1) * s
    ys0, ys1 = iy * s, (iy + 1) * s
    order = np.lexsort((ys0, xs0))
    for a in range(len(order)):
        ia = order[a]
        ov = ((xs0 < xs1[ia]) & (xs1 > xs0[ia])
              & (ys0 < ys1[ia]) & (ys1 > ys0[ia]))
        assert ov.sum() == 1
    # 4. interior sample points land in exactly one cell
    if xmax - xmin > 1e-6 and ymax - ymin > 1e-6:
        rng = np.random.default_rng(0)
        px = rng.uniform(xmin + 1e-7, xmax - 1e-7, 50)
        py = rng.uniform(ymin + 1e-7, ymax - 1e-7, 50)
        w, h = 360.0 / 2 ** lmax, 180.0 / 2 ** lmax
        cx = np.minimum(np.floor(px / w), 2 ** lmax - 1)
        cy = np.minimum(np.floor((py + 90.0) / h), 2 ** lmax - 1)
        hits = ((cx[:, None] >= xs0[None]) & (cx[:, None] < xs1[None])
                & (cy[:, None] >= ys0[None]) & (cy[:, None] < ys1[None]))
        assert (hits.sum(axis=1) == 1).all()


@settings(max_examples=200, deadline=None)
@given(x=lon, y=lat, level=st.integers(1, 12))
def test_cell_encode_decode_parent_roundtrip(x, y, level):
    c = cell_encode(np.asarray([x]), np.asarray([y]), level)
    lv, ix, iy = cell_decode(c)
    assert lv[0] == level
    assert c[0] == level * LEVEL_STRIDE + ix[0] * IX_STRIDE + iy[0]
    if level > 1:
        p = parent(c)
        plv, pix, piy = cell_decode(p)
        assert plv[0] == level - 1
        assert pix[0] == ix[0] // 2 and piy[0] == iy[0] // 2
        # the parent's rectangle contains the child's
        assert pix[0] * 2 <= ix[0] < (pix[0] + 1) * 2


@settings(max_examples=100, deadline=None)
@given(x0=lon, y0=lat, dx=st.floats(0.0, 40.0), dy=st.floats(0.0, 20.0),
       level=st.integers(1, 8))
def test_covering_contains_every_interior_point_cell(x0, y0, dx, dy, level):
    xmin, ymin = x0, y0
    xmax, ymax = min(360.0, x0 + dx), min(90.0, y0 + dy)
    cells = set(covering(xmin, ymin, xmax, ymax, level).tolist())
    rng = np.random.default_rng(1)
    for _ in range(20):
        px = rng.uniform(xmin, xmax) if xmax > xmin else xmin
        py = rng.uniform(ymin, ymax) if ymax > ymin else ymin
        c = int(cell_encode(np.asarray([min(px, 359.999999)]),
                            np.asarray([py]), level)[0])
        assert c in cells
