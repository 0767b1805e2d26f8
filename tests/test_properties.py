"""Property tests (SURVEY.md §5.5): mask monotonicity, percentile==median,
partial-aggregation associativity, cell covering consistency, expression
equivalence."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raster_functions_ray import grid
from raster_functions_ray.functions import focal as fc
from raster_functions_ray.functions import stack as sk
from raster_functions_ray.functions.expr import Expression


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_focal_mask_monotone(seed):
    """Output mask of a focal op ⊆ 3×3 erosion of the input mask
    (functions/deprecated/Hillshade.py:90-93 semantics)."""
    rng = np.random.default_rng(seed)
    dem = rng.random((9, 9)) * 100
    m = (rng.random((9, 9)) > 0.2).astype(np.uint8)
    _, om = fc.hillshade(dem, m, (1.0, 1.0))
    eroded = fc.erode_mask_3x3(m)
    assert np.all(om <= eroded)
    _, om2 = fc.aspect_slope(dem, m, (1.0, 1.0))
    assert np.all(om2 <= eroded)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_percentile50_is_median(seed):
    rng = np.random.default_rng(seed)
    sr = rng.random((5, 2, 4, 4)).astype(np.float32) * 100
    qa = np.full((5, 1, 4, 4), 672.0, np.float32)
    stack = np.concatenate([sr, np.repeat(qa, 1, axis=1)], axis=1)
    med = sk.median_composite(stack, qa_band=2)
    p50 = sk.pixel_percentile(stack, qa_band=2, percentile=50.0)
    np.testing.assert_allclose(p50, med, rtol=1e-6)


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(2, 5))
def test_sum_partial_associativity(seed, splits):
    """aggregate(sum over full stack) == merge of per-split partial sums —
    the invariant that makes salting/pre-aggregation legal."""
    rng = np.random.default_rng(seed)
    stack = rng.random((8, 1, 3, 3))
    masks = np.ones((8, 3, 3), np.uint8)
    full, _ = sk.aggregate(stack, masks, "Sum")
    bounds = sorted(rng.choice(np.arange(1, 8), splits - 1, replace=False))
    parts = np.split(stack, bounds, axis=0)
    merged = sum(p.sum(axis=0) for p in parts)
    np.testing.assert_allclose(full, merged, rtol=1e-12)


@settings(max_examples=50, deadline=None)
@given(st.floats(0.0, 359.999), st.floats(-89.999, 89.999), st.integers(1, 12))
def test_cell_covering_contains_point(lon, lat, level):
    """covering(bbox around p) always contains cell_encode(p)."""
    c = grid.cell_encode(np.asarray([lon]), np.asarray([lat]), level)[0]
    eps = 1e-6
    cells = grid.covering(max(lon - eps, 0), max(lat - eps, -90),
                          min(lon + eps, 360), min(lat + eps, 90), level)
    assert c in set(cells.tolist())


@settings(max_examples=50, deadline=None)
@given(st.floats(0.0, 359.999), st.floats(-89.999, 89.999), st.integers(2, 12))
def test_cell_parent_consistent(lon, lat, level):
    """parent(encode(p, L)) == encode(p, L-1)."""
    c = grid.cell_encode(np.asarray([lon]), np.asarray([lat]), level)
    p = grid.parent(c)[0]
    expected = grid.cell_encode(np.asarray([lon]), np.asarray([lat]), level - 1)[0]
    assert p == expected


@settings(max_examples=30, deadline=None)
@given(st.floats(-100, 100, allow_nan=False), st.floats(-100, 100, allow_nan=False))
def test_expression_matches_python(a, b):
    e = Expression("A * 2 + B / 4 - (A - B) ** 2")
    got = e.evaluate({"A": np.asarray([a]), "B": np.asarray([b])})
    exp = a * 2 + b / 4 - (a - b) ** 2
    np.testing.assert_allclose(got, [exp], rtol=1e-12)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_minhash_estimates_jaccard(seed):
    """MinHash signature agreement ≈ Jaccard similarity (coarse bound)."""
    from raster_functions_ray.dedup import _perm_params, jaccard, minhash_signature, shingles
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(30)]
    t1 = " ".join(rng.choice(words, 40))
    # mutate ~25% of tokens
    toks = t1.split()
    for i in rng.choice(len(toks), len(toks) // 4, replace=False):
        toks[i] = f"x{int(rng.integers(0, 30))}"
    t2 = " ".join(toks)
    a, b = _perm_params()
    s1 = minhash_signature(shingles(t1), a, b)
    s2 = minhash_signature(shingles(t2), a, b)
    est = float((s1 == s2).mean())
    true = jaccard(t1, t2)
    assert abs(est - true) < 0.35  # 64 permutations → loose bound


def test_windchill_mask_and_formula_property():
    """wc(t, ws) is monotone decreasing in ws for fixed cold t (NWS domain)."""
    from raster_functions_ray.functions.pointwise import windchill
    t = np.full((1, 20), 10.0, np.float32)
    ws = np.linspace(5, 60, 20, dtype=np.float32)[None]
    wc, m = windchill(t, ws)
    assert m.all()
    assert (np.diff(wc[0]) < 0).all()
