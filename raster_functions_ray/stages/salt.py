"""Skew handling: hot-key salting for grouped reduces and join fan-outs.

North-rule contract: "skewed cells (dense urban tiles) are salted and split
explicitly".  The mechanism (SURVEY.md §4 'Skew'):

1. detect hot keys — from lineage row counts (state/checkpoint.py
   ``hot_partitions``) or a cheap Count aggregate;
2. salt: rows of a hot key get ``salt = hash(row id) % k`` appended to the
   grouping key, splitting one oversized group into ``k`` bounded ones;
3. reduce per (key, salt) — REQUIRES a reassociable (algebraic) reduce —
   then merge the k partials per key in a tiny second pass.

``salted_aggregate`` packages the full two-phase plan for Sum/Count/Min/Max
style aggregations; holistic reduces (median) must not take this path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def detect_hot_keys(ds: rd.Dataset, key: str, factor: float = 4.0) -> set:
    """Keys whose row count exceeds factor × median (small Count aggregate)."""
    counts = ds.groupby(key).aggregate(Count(alias_name="n")).to_pandas()
    if counts.empty:
        return set()
    med = max(float(counts["n"].median()), 1.0)
    return set(counts.loc[counts["n"] > factor * med, key])


def add_salt(ds: rd.Dataset, key: str, hot_keys: set, k: int = 8,
             salt_col: str = "_salt") -> rd.Dataset:
    """Append a salt column: 0 for cold keys, hash(position) % k for hot
    keys — deterministic (row-content hash, not random)."""
    hot_ref = ray.put(hot_keys)

    def salt_batch(b: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        kser = b[key].to_pandas()
        # batch-position round-robin within hot keys — deterministic GIVEN
        # the batch, which is all an algebraic (key,salt)-partial reduce
        # needs: any assignment merges to the same final value. Vectorized
        # (one hash_array + modular mix), no per-row Python loop.
        pos = np.arange(len(kser), dtype=np.int64)
        mix = (pd.util.hash_array(kser.to_numpy()).view(np.int64) + pos) % k
        is_hot = kser.isin(list(hot)).to_numpy()
        salts = np.where(is_hot, mix, 0).astype(np.int32)
        return b.append_column(salt_col, pa.array(salts, pa.int32()))

    return ds.map_batches(salt_batch, batch_format="pyarrow", zero_copy_batch=True)


_MERGEABLE = {"sum": Sum, "count": Count, "min": Min, "max": Max}


def salted_aggregates(ds: rd.Dataset, key: str, value: str, hows: list[str],
                      hot_factor: float = 4.0, k: int = 8) -> pd.DataFrame:
    """Two-phase skew-safe aggregate: groupby((key, salt)) partials →
    driver-side merge of ≤k rows per key (the partial table is tiny).

    ALL requested ``hows`` are computed in ONE hot-key-detect pass and ONE
    partial-aggregate pass (Ray .aggregate takes multiple AggregateFns) —
    callers needing sum+count must not pay two full scans.  Only algebraic
    ``how`` values are allowed — salting changes group boundaries, so the
    per-group reduce must re-associate exactly.
    """
    hows = [h.lower() for h in hows]
    for how in hows:
        if how not in _MERGEABLE:
            raise ValueError(f"non-reassociable reduce {how!r} cannot be salted")
    hot = detect_hot_keys(ds, key, hot_factor)
    salted = add_salt(ds, key, hot, k)
    aggs = [Count(alias_name="v_count") if how == "count"
            else _MERGEABLE[how](value, alias_name=f"v_{how}") for how in hows]
    pdf = salted.groupby([key, "_salt"]).aggregate(*aggs).to_pandas()
    merge_ops = {f"v_{how}": ("sum" if how in ("sum", "count") else how) for how in hows}
    merged = pdf.groupby(key).agg(merge_ops).reset_index()
    return merged.rename(columns={
        f"v_{how}": (f"{how}_{value}" if how != "count" else "n") for how in hows})


def salted_aggregate(ds: rd.Dataset, key: str, value: str, how: str = "sum",
                     hot_factor: float = 4.0, k: int = 8) -> pd.DataFrame:
    """Single-aggregate convenience wrapper over ``salted_aggregates``."""
    return salted_aggregates(ds, key, value, [how], hot_factor, k)
