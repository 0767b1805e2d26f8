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
        import zlib

        hot = ray.get(hot_ref)
        keys = b[key].to_pylist()
        # content-derived deterministic salt (crc32 — stable across workers
        # and retries, unlike Python's seeded hash())
        h = np.asarray([zlib.crc32(f"{v}:{i}".encode()) for i, v in enumerate(keys)],
                       dtype=np.int64)
        salts = np.where([v in hot for v in keys], h % k, 0).astype(np.int32)
        return b.append_column(salt_col, pa.array(salts, pa.int32()))

    return ds.map_batches(salt_batch, batch_format="pyarrow", zero_copy_batch=True)


_MERGEABLE = {"sum": Sum, "count": Count, "min": Min, "max": Max}


def salted_aggregate(ds: rd.Dataset, key: str, value: str, how: str = "sum",
                     hot_factor: float = 4.0, k: int = 8) -> pd.DataFrame:
    """Two-phase skew-safe aggregate: groupby((key, salt)) partials →
    driver-side merge of ≤k rows per key (the partial table is tiny).

    Only algebraic ``how`` values are allowed — salting changes group
    boundaries, so the per-group reduce must re-associate exactly.
    """
    how = how.lower()
    if how not in _MERGEABLE:
        raise ValueError(f"non-reassociable reduce {how!r} cannot be salted")
    hot = detect_hot_keys(ds, key, hot_factor)
    salted = add_salt(ds, key, hot, k)
    if how == "count":
        partial = salted.groupby([key, "_salt"]).aggregate(Count(alias_name="v"))
        merged = partial.to_pandas().groupby(key)["v"].sum().reset_index()
    else:
        agg_cls = _MERGEABLE[how]
        partial = salted.groupby([key, "_salt"]).aggregate(agg_cls(value, alias_name="v"))
        pdf = partial.to_pandas()
        op = {"sum": "sum", "min": "min", "max": "max"}[how]
        merged = pdf.groupby(key)["v"].agg(op).reset_index()
    return merged.rename(columns={"v": f"{how}_{value}" if how != "count" else "n"})
