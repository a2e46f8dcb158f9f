"""Per-stage profile of one registered query: run it and print Ray
Data's execution stats (`ds.stats()`) so wall-time can be attributed to
stages (read, map_batches kernels, shuffles) instead of guessed.

Usage: python tools/profile_query.py <query_name> [sf_dir]

The stats show, per operator: block counts, wall time, CPU time, peak
memory, and output rows — the feedback loop for "is wall-time dominated
by useful compute".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from texel_ray.pipelines.queries import QUERIES
    from texel_ray.sources.images import ensure_images_for_sf_dir

    if name not in QUERIES:
        print(f"unknown query {name!r}; known: {', '.join(sorted(QUERIES))}")
        return 2
    ensure_images_for_sf_dir(sf_dir)

    t0 = time.perf_counter()
    result = QUERIES[name](sf_dir)
    is_ds = hasattr(result, "stats")
    if hasattr(result, "to_pandas"):
        df = result.to_pandas()
    else:
        df = result
    dt = time.perf_counter() - t0
    print(f"=== {name}: {dt:.2f}s, {len(df)} rows ===")
    if is_ds:
        print(result.stats())
    else:
        print("(driver-finished result: no Dataset stats; the heavy "
              "stages ran inside intermediate datasets)")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
