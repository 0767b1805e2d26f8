"""Evidence tool: print ds.stats() for the headline pipelines — the
measure-don't-guess loop used to drive the round-2 optimizations
(row-group-aligned composite reads, fused flagship, stateless minhash).

Usage: python scripts/stage_stats.py [sf_dir]   (default /root/testdata/sf0.01)
"""

import os
import sys

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from raster_functions_ray import synth
    from raster_functions_ray.stages import composite, halo, tile_map

    d = synth.synth_dir_for(sf_dir)
    path = os.path.join(d, "tiles.parquet")

    print("=" * 72)
    print("median composite (storage-aligned stack reduce)")
    out = composite.stack_reduce_from_parquet(
        path, composite.median_composite_reduce(qa_band=6),
        out_pixel_type="f4", bands=7)
    st = tile_map.tile_stats(out).materialize()
    print(st.stats())

    print("=" * 72)
    print("hillshade (shuffle-free parquet halo)")
    from raster_functions_ray.functions import focal as fc

    padded = halo.with_halo_from_parquet(path, padding=1, bands=1)

    def kern(p, m, meta):
        dem = p if p.ndim == 2 else p[0]
        return fc.hillshade(dem, m, meta["cell_size"])

    hs = tile_map.tile_stats(tile_map.apply_kernel(padded, kern, "u1")).materialize()
    print(hs.stats())
    ray.shutdown()


if __name__ == "__main__":
    main(*sys.argv[1:2])
