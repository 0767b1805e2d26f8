"""Training-data prep operators (trainprep.py): packing, clustering,
Bloom anti-dedup, deterministic sampling kernels."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raster_functions_ray import trainprep as tp


def naive_pack(tokens, budget):
    out, acc, p = [], 0, 0
    for t in tokens:
        if acc and acc + t > budget:
            p += 1
            acc = 0
        acc += t
        out.append(p)
    return np.asarray(out, dtype=np.int64)


class TestPackGreedy:
    def test_matches_naive_randomized(self):
        rng = np.random.default_rng(3)
        for _ in range(50):
            n = int(rng.integers(1, 200))
            toks = rng.integers(1, 120, n)
            budget = int(rng.integers(50, 400))
            np.testing.assert_array_equal(tp.pack_greedy(toks, budget),
                                          naive_pack(toks, budget))

    def test_oversized_doc_gets_own_pack(self):
        got = tp.pack_greedy(np.array([10, 999, 10, 10]), budget=100)
        np.testing.assert_array_equal(got, [0, 1, 2, 2])

    def test_exact_fit_stays_in_pack(self):
        got = tp.pack_greedy(np.array([60, 40, 1]), budget=100)
        np.testing.assert_array_equal(got, [0, 0, 1])

    def test_budget_invariant(self):
        # every pack's total <= budget unless it is a single oversized doc,
        # packs are contiguous and consecutive, nothing is dropped
        rng = np.random.default_rng(9)
        toks = rng.integers(1, 500, 1000)
        budget = 300
        pid = tp.pack_greedy(toks, budget)
        assert (np.diff(pid) >= 0).all() and (np.diff(pid) <= 1).all()
        for p in range(pid.max() + 1):
            m = pid == p
            assert toks[m].sum() <= budget or m.sum() == 1


class TestConnectedComponents:
    def test_hand_graph(self):
        import ray.data as rd
        # path 1-2-3-4, triangle 10-11-12 (+chord), isolated edge 20-21
        edges = rd.from_arrow(pa.table({
            "u": pa.array([2, 3, 4, 10, 11, 10, 20], pa.int64()),
            "v": pa.array([1, 2, 3, 11, 12, 12, 21], pa.int64())}))
        labels = tp.connected_components(edges, num_partitions=2)
        got = dict(zip(labels["node"], labels["label"]))
        assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                       10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


class TestBloom:
    def test_no_false_negatives_and_low_fp(self):
        rng = np.random.default_rng(5)
        ref = pd.Series([f"ref doc {i} {rng.integers(1e9)}" for i in range(2000)])
        tab = pa.table({"text": pa.array(ref.tolist())})
        bits = np.frombuffer(tp._bloom_partial(tab)["bits"][0].as_py(),
                             dtype=np.uint64)

        def is_pos(texts):
            h = tp._text_hash64(pd.Series(texts))
            pos = tp._bloom_positions(h)
            return ((bits[pos // 64] >> (pos % 64).astype(np.uint64))
                    & np.uint64(1)).all(axis=1)

        assert is_pos(ref.tolist()).all()  # membership never missed
        other = [f"novel doc {i} {rng.integers(1e9)}" for i in range(5000)]
        assert is_pos(other).mean() < 0.02  # FP rate at design load

    def test_partials_or_associative(self):
        a = pa.table({"text": pa.array(["alpha beta", "gamma"])})
        b = pa.table({"text": pa.array(["delta epsilon"])})
        both = pa.table({"text": pa.array(["alpha beta", "gamma", "delta epsilon"])})
        bits_a = np.frombuffer(tp._bloom_partial(a)["bits"][0].as_py(), np.uint64)
        bits_b = np.frombuffer(tp._bloom_partial(b)["bits"][0].as_py(), np.uint64)
        bits_ab = np.frombuffer(tp._bloom_partial(both)["bits"][0].as_py(), np.uint64)
        np.testing.assert_array_equal(bits_a | bits_b, bits_ab)


class TestSplitHash:
    def test_range_and_determinism(self):
        ids = np.arange(10_000, dtype=np.int64)
        b1, b2 = tp._split_hash(ids, 100), tp._split_hash(ids, 100)
        np.testing.assert_array_equal(b1, b2)
        assert b1.min() >= 0 and b1.max() < 100
        # roughly uniform: every bucket hit, no bucket > 3× the mean
        counts = np.bincount(b1, minlength=100)
        assert (counts > 0).all() and counts.max() < 300

    def test_matches_bigint_sql_semantics(self):
        # engine uint64 wrap == SQL BIGINT math while ids stay < 2^31
        import duckdb
        ids = np.array([0, 1, 499, 123456, 2**31 - 1], dtype=np.int64)
        got = tp._split_hash(ids, 10)
        want = duckdb.sql(
            "SELECT ((i * 2654435761) % 4294967296) % 10 FROM "
            f"(SELECT unnest({ids.tolist()}) AS i)").fetchnumpy()
        np.testing.assert_array_equal(got, list(want.values())[0])
