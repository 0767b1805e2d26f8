"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "docs_per_sec": ..., "tiles_per_sec": ...}

``--scaling``: run the same bench in fresh processes at num_cpus=8 and 32
and report both throughputs + scaling efficiency (the sandbox stand-in for
the N vs 4N cluster-size criterion — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from raster_functions_ray import ann, dedup, rasterqueries as rq
    from raster_functions_ray import relational as rel, spatial, synth, textops
    from raster_functions_ray.pipelines import flagship

    # ensure synthetic tiles exist + warm the page cache (untimed)
    d = synth.synth_dir_for(SF_DIR)
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            with open(os.path.join(d, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass
    for t in ("lineitem", "events", "documents", "embeddings"):
        with open(os.path.join(SF_DIR, f"{t}.parquet"), "rb") as fh:
            while fh.read(1 << 24):
                pass

    import pyarrow.parquet as pq
    n_docs = pq.read_metadata(os.path.join(SF_DIR, "documents.parquet")).num_rows
    n_tiles = pq.read_metadata(os.path.join(d, "tiles.parquet")).num_rows
    n_span_docs = pq.read_metadata(os.path.join(d, "documents.parquet")).num_rows

    benches = {
        "flagship": lambda: flagship.run(SF_DIR).to_pandas(),
        "q1_pricing": lambda: rel.q1_pricing(SF_DIR),
        "pip_rect": lambda: spatial.q_pip_rect(SF_DIR),
        "knn": lambda: spatial.q_knn(SF_DIR),
        "cell_assign_tiles": lambda: rq.q_tile_cells(SF_DIR),
        "ndvi": lambda: rq.q_ndvi_stats(SF_DIR),
        "hillshade": lambda: rq.q_hillshade_stats(SF_DIR),
        "median_composite": lambda: rq.q_median_composite_stats(SF_DIR),
        "zonal_remap": lambda: rq.q_zonal_remap_counts(SF_DIR),
        "doc_zone_join": lambda: rq.q_doc_zone_join(SF_DIR),
        "exact_dedup": lambda: dedup.q_exact_dedup(SF_DIR),
        "minhash_dedup": lambda: dedup.q_minhash_dedup(SF_DIR),
        "token_stats": lambda: textops.q_token_stats(SF_DIR),
        "ann_topk": lambda: ann.q_ann_topk(SF_DIR),
    }

    times: dict[str, float] = {}
    for name, fn in benches.items():
        t0 = time.time()
        fn()
        times[name] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    result = {
        "metric": "spatial-join+tiling pipeline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": synth.sf_from_dir(SF_DIR),
        "num_cpus": NUM_CPUS,
        "docs_per_sec": round(n_span_docs / max(times["flagship"], 1e-9), 1),
        "tiles_per_sec": round(n_tiles / max(times["hillshade"], 1e-9), 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "sec_8": lo["value"], "sec_32": hi["value"],
        "queries_8": lo["queries"], "queries_32": hi["queries"],
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
