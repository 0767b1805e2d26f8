"""Deduplication operators for large-scale training-data pipelines.

- exact:   content hash in map_batches → groupby(hash) → first per group
- minhash: shingle → minhash sigs per batch → explode to (band, band_hash)
           rows → groupby band bucket → candidate pairs → Jaccard verify
- simhash: 64-bit simhash per doc; near-dup candidates share a rotated
           prefix bucket (hamming ≤ k heuristic)
- ngram Jaccard: exact pairwise verify used on MinHash candidates

All hashing is deterministic (blake2b / fixed linear hashes) so results are
stable across runs and workers — required for the correctness gates.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min

from .sources import read_table

# ------------------------------------------------------------------ exact

def _text_hash(s: pd.Series) -> pd.Series:
    return s.map(lambda t: hashlib.blake2b(t.encode("utf-8"), digest_size=8).hexdigest())


def q_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: hash-partition on content hash, keep min doc_id per
    group.  Output: one row per distinct text (survivor + dup count)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_hash(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        return pd.DataFrame({"doc_id": df["doc_id"], "h": _text_hash(df["text"])})

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192)
    out = (hashed.groupby("h")
           .aggregate(Min("doc_id", alias_name="keep_doc_id"),
                      Count(alias_name="n_copies"))
           .to_pandas())
    return out[["keep_doc_id", "n_copies"]]


# (oracle uses GROUP BY text — identical partition since the hash is injective
# on this corpus; validated by the row-count + value-hash match)
Q_EXACT_DEDUP_SQL = """
SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""

# ---------------------------------------------------------------- minhash

N_PERM = 64
N_BANDS = 16  # 4 rows per band
_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int = N_PERM) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(1234567)
    a = rng.integers(1, _MERSENNE, n_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, n_perm, dtype=np.int64)
    return a, b


def shingles(text: str, k: int = 3) -> set[int]:
    """Word k-gram shingles as 32-bit hashes."""
    toks = text.split()
    out = set()
    for i in range(max(0, len(toks) - k + 1)):
        g = " ".join(toks[i : i + k])
        out.add(int.from_bytes(hashlib.blake2b(g.encode(), digest_size=4).digest(), "big"))
    if not out and toks:
        out.add(int.from_bytes(hashlib.blake2b(" ".join(toks).encode(), digest_size=4).digest(), "big"))
    return out


def minhash_signature(sh: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if not sh:
        return np.full(a.size, np.iinfo(np.int64).max, dtype=np.int64)
    vals = np.fromiter(sh, dtype=np.int64)
    # (a*x + b) mod p for each permutation — vectorized outer product
    h = (a[:, None] * vals[None, :] + b[:, None]) % _MERSENNE
    return h.min(axis=1)


class MinHasher:
    """Actor-pool stage: permutation parameters generated once per actor."""

    def __init__(self, k: int = 3):
        self.a, self.b = _perm_params()
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows_doc, rows_band, rows_hash = [], [], []
        rpb = N_PERM // N_BANDS
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = minhash_signature(shingles(text, self.k), self.a, self.b)
            for band in range(N_BANDS):
                bh = hashlib.blake2b(sig[band * rpb:(band + 1) * rpb].tobytes(),
                                     digest_size=8).hexdigest()
                rows_doc.append(doc_id)
                rows_band.append(band)
                rows_hash.append(bh)
        return pa.table({"doc_id": pa.array(rows_doc),
                         "band": pa.array(rows_band, pa.int32()),
                         "band_hash": pa.array(rows_hash, pa.string())})


def minhash_candidates(sf_dir: str, concurrency: int = 4) -> pd.DataFrame:
    """LSH bucket join: (band, band_hash) groups with ≥2 docs → candidate
    pairs (doc_a < doc_b), deduplicated across bands."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    banded = ds.map_batches(MinHasher, batch_format="pyarrow", batch_size=2048,
                            concurrency=concurrency)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].tolist())
        out = [(ids[i], ids[j]) for i in range(len(ids)) for j in range(i + 1, len(ids))]
        if not out:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=group["doc_id"].dtype),
                                 "doc_b": pd.Series([], dtype=group["doc_id"].dtype)})
        return pd.DataFrame(out, columns=["doc_a", "doc_b"])

    cand = (banded.groupby(["band", "band_hash"])
            .map_groups(pairs, batch_format="pandas")
            .to_pandas())
    return cand.drop_duplicates().reset_index(drop=True)


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = shingles(a, k), shingles(b, k)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def q_minhash_dedup(sf_dir: str, threshold: float = 0.7) -> pd.DataFrame:
    """Near-dup pipeline: LSH candidates → exact n-gram Jaccard verify.

    Rows-only check (LSH not SQL-expressible); deterministic output sorted
    by (doc_a, doc_b)."""
    cand = minhash_candidates(sf_dir)
    if cand.empty:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).to_pandas()
    text_of = dict(zip(docs["doc_id"], docs["text"]))
    sims = [jaccard(text_of[a], text_of[b]) for a, b in zip(cand["doc_a"], cand["doc_b"])]
    cand = cand.assign(jaccard=np.round(sims, 6))
    out = cand[cand["jaccard"] >= threshold].sort_values(["doc_a", "doc_b"])
    return out.reset_index(drop=True)


# ---------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    """64-bit SimHash over word unigram hashes (deterministic)."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in text.split():
        h = np.uint64(int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


class SimHasher:
    """Emits the 64-bit simhash as two int64-safe 32-bit halves (a raw u64
    overflows Arrow int64)."""

    def __call__(self, b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas()
        hs = [simhash64(t) for t in df["text"]]
        return pd.DataFrame({"doc_id": df["doc_id"],
                             "simhash_hi": [h >> 32 for h in hs],
                             "simhash_lo": [h & 0xFFFFFFFF for h in hs]})


def q_simhash(sf_dir: str, concurrency: int = 4) -> pd.DataFrame:
    """Per-doc 64-bit simhash (rows-only check; deterministic values)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(SimHasher, batch_format="pyarrow", batch_size=2048,
                          concurrency=concurrency).to_pandas()


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
