"""Similarity search over the embeddings table (list<float> column).

- brute-force cosine top-k: per-batch numpy matmul against a broadcast
  query matrix, partial top-k per batch, tiny final reduce (the exact
  baseline; SQL-checkable via list_cosine_similarity);
- LSH-bucketed variant (random hyperplane signs) as the scale path:
  candidates restricted to matching buckets, then exact re-rank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .sources import read_table

N_QUERIES = 3  # queries are embeddings of vec_id 0..N_QUERIES-1
TOP_K = 5


def _embedding_matrix(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    emb = b["embedding"]
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = np.asarray(emb.flatten(), dtype=np.float64)
    dim = len(emb[0])
    return np.asarray(b["vec_id"], dtype=np.int64), flat.reshape(-1, dim)


def load_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(np.isin(np.asarray(t["vec_id"]), np.arange(N_QUERIES)))
    ids, mat = _embedding_matrix(t)
    order = np.argsort(ids)
    return ids[order], mat[order]


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-k per query (excluding the query rows themselves):
    batch-level matmul partial top-k → small driver-side merge.

    Output: (q_id, vec_id, rank) — similarity values intentionally omitted
    so fp summation-order noise can't flip the value hash; ties break by
    vec_id (and are vanishingly unlikely on random floats).
    """
    qids, qmat = load_queries(sf_dir)
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qref = ray.put(qn)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def partial(b: pa.Table) -> pd.DataFrame:
        q = ray.get(qref)
        ids, mat = _embedding_matrix(b)
        keep = ids >= N_QUERIES
        ids, mat = ids[keep], mat[keep]
        if ids.size == 0:
            return pd.DataFrame({"q_id": pd.Series([], dtype="int64"),
                                 "vec_id": pd.Series([], dtype="int64"),
                                 "sim": pd.Series([], dtype="float64")})
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mn = mat / np.where(norms == 0, 1.0, norms)
        sims = mn @ q.T  # (n, nq)
        frames = []
        k = min(TOP_K, ids.size)
        for qi in range(q.shape[0]):
            idx = np.argpartition(-sims[:, qi], k - 1)[:k]
            frames.append(pd.DataFrame({"q_id": qi, "vec_id": ids[idx], "sim": sims[idx, qi]}))
        return pd.concat(frames, ignore_index=True)

    cand = ds.map_batches(partial, batch_format="pyarrow", batch_size=8192).to_pandas()
    cand = cand.sort_values(["q_id", "sim", "vec_id"], ascending=[True, False, True])
    cand = cand.groupby("q_id").head(TOP_K)
    cand["rank"] = cand.groupby("q_id").cumcount() + 1
    return cand[["q_id", "vec_id", "rank"]].reset_index(drop=True)


Q_ANN_TOPK_SQL = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), queries AS (
  SELECT vec_id AS q_id, e AS qe FROM base WHERE vec_id < {N_QUERIES}
), cands AS (
  SELECT vec_id, e FROM base WHERE vec_id >= {N_QUERIES}
)
SELECT q_id, vec_id, rank FROM (
  SELECT q.q_id, c.vec_id,
         ROW_NUMBER() OVER (PARTITION BY q.q_id
                            ORDER BY list_cosine_similarity(c.e, q.qe) DESC, c.vec_id) AS rank
  FROM cands c CROSS JOIN queries q)
WHERE rank <= {TOP_K}
"""

# --------------------------------------------------------- LSH scale path

N_PLANES = 12


class LshBucketer:
    """Actor-pool stage: random hyperplanes drawn once per actor
    (seeded — identical across actors); emits (vec_id, bucket)."""

    def __init__(self, dim: int = 64):
        rng = np.random.default_rng(271828)
        self.planes = rng.standard_normal((dim, N_PLANES))

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, mat = _embedding_matrix(b)
        signs = (mat @ self.planes) > 0
        buckets = (signs * (1 << np.arange(N_PLANES))).sum(axis=1).astype(np.int64)
        return pa.table({"vec_id": pa.array(ids), "bucket": pa.array(buckets)})


def lsh_buckets(sf_dir: str, concurrency: int = 4) -> rd.Dataset:
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ds.map_batches(LshBucketer, batch_format="pyarrow", batch_size=8192,
                          concurrency=concurrency)


def q_lsh_bucket_sizes(sf_dir: str) -> pd.DataFrame:
    """Bucket histogram of the hyperplane LSH (rows-only check —
    deterministic because the planes are seeded)."""
    from ray.data.aggregate import Count

    out = lsh_buckets(sf_dir).groupby("bucket").aggregate(Count(alias_name="n")).to_pandas()
    return out.sort_values("bucket").reset_index(drop=True)
