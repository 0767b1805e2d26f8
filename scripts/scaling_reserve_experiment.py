"""Round-4 verdict item 4: does reserving cores for Ray system processes
(raylet / GCS / object store) lift the focal workload's ABSOLUTE 8→32
scaling efficiency to the ≥0.8 bar, or is the residual host-side?

Two variants per parallelism level, interleaved with the engine-free
multiprocessing control every round (same discipline as bench.py
--scaling):

- standard: ``taskset 0..L-1`` + ``ray.init(num_cpus=L)`` — compute task
  slots share their pinned cores with Ray's system processes (what
  bench.py --scaling measures);
- reserved: ``taskset 0..L-1`` + ``ray.init(num_cpus=3L/4)`` — a quarter
  of each "node" is left to the system processes, the SAME fraction at
  both levels so neither level is flattered (a real N-node and 4N-node
  cluster lose the same per-node daemon share).

Efficiency is throughput(32-core budget) / (4 × throughput(8-core
budget)) in both variants — the core budget, not the slot count, is the
denominator because the north rule scales CLUSTER size.

Writes one JSON blob to stdout; run in a quiet window.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ray_focal(cores: int, slots: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(slots), GRAFT_SF_DIR=SF_DIR,
               OMP_NUM_THREADS="1", MKL_NUM_THREADS="1",
               OPENBLAS_NUM_THREADS="1", NUMEXPR_NUM_THREADS="1")
    cmd = [sys.executable, BENCH, "--scaling-worker"]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         check=True).stdout
    return json.loads(out.strip().splitlines()[-1])


def control(cores: int) -> float:
    sys.path.insert(0, REPO)
    from raster_functions_ray import synth
    from raster_functions_ray.benchkit import mp_baseline

    tiles_path = os.path.join(synth.synth_dir_for(SF_DIR), "tiles.parquet")
    prev = os.sched_getaffinity(0)
    try:
        os.sched_setaffinity(0, set(range(cores)))
        return mp_baseline(tiles_path, cores)
    finally:
        os.sched_setaffinity(0, prev)


def main() -> None:
    os.environ["OMP_NUM_THREADS"] = "1"
    variants = {
        "standard": {8: 8, 32: 32},     # slots == cores
        "reserved": {8: 6, 32: 24},     # 25% of each node left to raylet/GCS
    }
    runs: dict = {(v, c): [] for v in variants for c in (8, 32)}
    ctrl: dict = {c: [] for c in (8, 32)}
    t0 = time.time()
    for rnd in range(3):
        for cores in (8, 32):
            for v, slot_map in variants.items():
                r = ray_focal(cores, slot_map[cores])
                runs[(v, cores)].append(r["tiles_per_sec"])
            ctrl[cores].append(control(cores))
    out = {"sf_dir": SF_DIR, "wall_total_sec": round(time.time() - t0, 1),
           "loadavg_end": os.getloadavg(), "variants": {}}
    for v in variants:
        lo, hi = max(runs[(v, 8)]), max(runs[(v, 32)])
        out["variants"][v] = {
            "slots": variants[v],
            "tiles_per_sec_8": lo, "tiles_per_sec_32": hi,
            "efficiency": round(hi / (4.0 * lo), 3),
            "all_runs": {"c8": runs[(v, 8)], "c32": runs[(v, 32)]},
        }
    c8, c32 = max(ctrl[8]), max(ctrl[32])
    out["control"] = {"tiles_per_sec_8": round(c8, 1),
                      "tiles_per_sec_32": round(c32, 1),
                      "efficiency": round(c32 / (4.0 * c8), 3),
                      "all_runs": {"c8": [round(x, 1) for x in ctrl[8]],
                                   "c32": [round(x, 1) for x in ctrl[32]]}}
    for v in variants:
        out["variants"][v]["engine_relative"] = round(
            out["variants"][v]["efficiency"] / out["control"]["efficiency"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
