#!/usr/bin/env python
"""Cluster entry point for the engine — the `ray job submit` surface.

On a real multi-node cluster (north rule: fixed-size cluster at N and 4N
nodes, streaming execution throughout):

    ray job submit --working-dir /root/repo -- \
        python scripts/run_job.py --query flagship \
        --sf-dir /data/sf100 --output /out/flagship

The job connects to the cluster it was submitted to (``RAY_ADDRESS`` is
set by the job runtime); run standalone it starts a local session. The
result is streamed to partitioned parquet with ``write_parquet`` (never
materialized on the driver) unless the query returns a driver-side
DataFrame, in which case it is small by construction (aggregates /
candidate sets) and written with pyarrow.

Exit status is non-zero on failure so schedulers can retry; a one-line
JSON metrics record (rows, wall seconds) goes to stdout for the job log.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--query", default="flagship",
                    help="queries() key, or 'flagship' for the headline pipeline")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--output", default=None,
                    help="directory for partitioned parquet output (omit to just count rows)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster; standalone
        # falls back to a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    import __ray_entry__ as entrypoints

    t0 = time.time()
    # queries with a streaming-Dataset lowering: when writing to storage,
    # run the Dataset straight into write_parquet (no driver collect at
    # all); the registry callables' driver frames are for the oracle gate
    from raster_functions_ray import spatial, spatial2

    streamed = {"dbscan": spatial.dbscan_dataset,
                "st_dbscan": spatial2.st_dbscan_dataset}
    if args.query == "flagship":
        from raster_functions_ray.pipelines import flagship

        result = flagship.run(args.sf_dir)
    elif args.output and args.query in streamed:
        result = streamed[args.query](args.sf_dir)
    else:
        qs = entrypoints.queries()
        if args.query not in qs:
            print(f"unknown query {args.query!r}; known: {sorted(qs)}", file=sys.stderr)
            return 2
        result = qs[args.query](args.sf_dir)

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        if args.output:
            result.write_parquet(args.output)
            rows = None  # streamed to storage; count would re-execute
        else:
            rows = result.count()
    else:
        t = (pa.Table.from_pandas(result, preserve_index=False)
             if isinstance(result, pd.DataFrame) else result)
        rows = t.num_rows
        if args.output:
            import pyarrow.parquet as pq

            os.makedirs(args.output, exist_ok=True)
            pq.write_table(t, os.path.join(args.output, "part-0.parquet"))
    print(json.dumps({"query": args.query, "sf_dir": args.sf_dir,
                      "rows": rows, "wall_s": round(time.time() - t0, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
