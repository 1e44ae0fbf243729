"""Per-stage profile of any registry query: run it under a fresh Ray
session and print Ray Data's execution stats (per-operator wall time,
CPU time, rows, memory) for every Dataset the query executes.

Usage: python tools/profile_query.py <query> [sf_dir] [num_cpus]

The stats come from ray.data.Dataset.stats() on the LAST executed
dataset plus the per-dataset summaries Ray logs; for multi-execution
queries (iterative graph ops, gated assemblies) each execution's
stats block prints separately, so a fixed-overhead-dominated plan is
visible as many small executions rather than one slow stage.
"""
from __future__ import annotations

import os
import sys
import time


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_auto_log_stats = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bb_ocr_ray.pipelines import queries as Q

    fn = Q.QUERIES[name]

    # warm run (workers + imports), then the profiled run with Ray's
    # per-execution stats tables enabled (covers pandas-returning
    # queries, whose datasets are consumed inside the query body)
    fn(sf_dir)
    ctx.enable_auto_log_stats = True
    t0 = time.time()
    res = fn(sf_dir)
    wall = time.time() - t0

    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.materialize()
        print(res.stats())
        n = res.count()
    else:
        n = len(res)
    print(f"\n{name}: {wall:.2f}s warm, {n} rows, num_cpus={num_cpus}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
