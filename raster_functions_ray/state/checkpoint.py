"""Checkpoint store + per-partition lineage for resumable pipelines.

North-rule contract: "every partition emits lineage records and row/byte
metrics to a checkpoint store so jobs resume mid-shuffle without recomputing
finished cells".

Design (SURVEY.md §4 'Checkpoint / resume'):

- output is partitioned by a deterministic key (cell_id band, scene, tile
  range): one parquet directory per partition, written ATOMICALLY (tmp dir →
  rename);
- each completed partition appends a lineage record
  ``(stage, partition_key, input_hash, rows, bytes, wall_sec, status)`` to
  the store (one json file per record — append-only, no coordination needed
  across workers);
- on resume, ``finished_keys`` filters completed partitions out of the work
  list BEFORE the shuffle, so a rerun only touches missing partitions;
- records double as the metrics stream (rows/bytes per partition → skew
  detection input).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        self.lineage_dir = os.path.join(root, "_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)

    # ---------------------------------------------------------- lineage ----

    def record(self, stage: str, partition_key: str, input_hash: str,
               rows: int, nbytes: int, wall_sec: float, status: str = "done") -> None:
        rec = {"stage": stage, "partition_key": partition_key,
               "input_hash": input_hash, "rows": int(rows), "bytes": int(nbytes),
               "wall_sec": round(wall_sec, 4), "status": status,
               "ts": time.time()}
        fname = f"{stage}__{_safe(partition_key)}__{uuid.uuid4().hex[:8]}.json"
        tmp = os.path.join(self.lineage_dir, "." + fname)
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, os.path.join(self.lineage_dir, fname))

    def lineage(self) -> pd.DataFrame:
        recs = []
        for fn in os.listdir(self.lineage_dir):
            if fn.endswith(".json") and not fn.startswith("."):
                with open(os.path.join(self.lineage_dir, fn)) as f:
                    recs.append(json.load(f))
        if not recs:
            return pd.DataFrame(columns=["stage", "partition_key", "input_hash",
                                         "rows", "bytes", "wall_sec", "status", "ts"])
        return pd.DataFrame(recs)

    def finished_keys(self, stage: str, input_hash: str | None = None) -> set[str]:
        """Keys recorded done — restricted to the given ``input_hash`` when
        provided, so a rerun over CHANGED input recomputes every partition
        instead of serving the previous input's output as finished."""
        ln = self.lineage()
        if ln.empty:
            return set()
        done = ln[(ln["stage"] == stage) & (ln["status"] == "done")]
        if input_hash is not None and "input_hash" in done.columns:
            done = done[done["input_hash"] == input_hash]
        return set(done["partition_key"])

    # ---------------------------------------------------- partition I/O ----

    def partition_dir(self, stage: str, partition_key: str) -> str:
        return os.path.join(self.root, stage, _safe(partition_key))

    def write_partition(self, stage: str, partition_key: str, table: pa.Table,
                        input_hash: str = "", t0: float | None = None) -> str:
        """Atomic partition write + lineage record. Idempotent: a retried
        task overwrites the same final path deterministically."""
        start = t0 if t0 is not None else time.time()
        final = self.partition_dir(stage, partition_key)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(table, os.path.join(tmp, "part.parquet"))
        if os.path.exists(final):
            import shutil
            shutil.rmtree(final)
        os.replace(tmp, final)
        self.record(stage, partition_key, input_hash, table.num_rows,
                    table.nbytes, time.time() - start)
        return final

    def read_partition(self, stage: str, partition_key: str) -> pa.Table:
        return pq.read_table(os.path.join(self.partition_dir(stage, partition_key), "part.parquet"))

    # ------------------------------------------------------------- skew ----

    def hot_partitions(self, stage: str, factor: float = 4.0) -> pd.DataFrame:
        """Partitions whose row count exceeds ``factor`` × median — the
        skew-detection input for salting (SURVEY.md §4 'Skew')."""
        ln = self.lineage()
        ln = ln[(ln["stage"] == stage) & (ln["status"] == "done")]
        if ln.empty:
            return ln
        med = ln["rows"].median()
        return ln[ln["rows"] > factor * max(med, 1)]


def _safe(key: str) -> str:
    s = "".join(c if c.isalnum() or c in "-_." else "_" for c in str(key))
    if len(s) <= 80:
        return s
    # hash-suffix instead of plain truncation: two long keys sharing an
    # 80-char prefix must NOT collide onto one partition directory
    import hashlib

    return s[:63] + "-" + hashlib.blake2b(str(key).encode(), digest_size=8).hexdigest()


def input_fingerprint(paths: list[str]) -> str:
    """Cheap input hash for lineage: file names + sizes + mtimes."""
    h = hashlib.blake2b(digest_size=8)
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()


def run_partitioned(ds_factory, keys: list[str], stage: str, store: CheckpointStore,
                    input_hash: str = "") -> list[str]:
    """Resume-aware partition runner: skip finished keys, compute the rest.

    ``ds_factory(key)`` returns the pyarrow Table for one partition.
    Driver-side loop over PARTITIONS (not rows) — each partition's compute
    is a Ray Data pipeline internally.  When ``input_hash`` is given, only
    partitions finished against the SAME input count as done (the
    changed-input-recomputes contract documented on ``finished_keys``).
    """
    done = store.finished_keys(stage, input_hash=input_hash or None)
    written = []
    for key in keys:
        if key in done:
            continue
        t0 = time.time()
        table = ds_factory(key)
        store.write_partition(stage, key, table, input_hash, t0)
        written.append(key)
    return written
