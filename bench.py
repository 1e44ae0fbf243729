"""Benchmark driver — prints ONE JSON line with headline timings.

Plain mode:
    python bench.py
        runs the headline pipelines over $GRAFT_SF_DIR (default
        /root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS
        or 32) and prints
        {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
         "sf": ..., "num_cpus": N, "docs_per_sec": ..., ...}

Scaling mode (the sandbox stand-in for N- vs 4N-node clusters):
    python bench.py --scaling
        runs the SAME headline pipeline in two fresh processes at
        num_cpus=8 and num_cpus=32 and reports both throughputs plus
        scaling efficiency ((t8/t32)/4; 1.0 = perfectly linear).

The headline pipeline is the flagship extraction: synthesize
Common-Crawl-style pages from the documents table (replicated
BENCH_REPLICATION× with distinct urls so actor-pool startup doesn't
dominate), run DOM segmentation + boilerplate classification +
reading-order emission in an actor pool, and consume with an
aggregate (no driver materialization).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATION = int(os.environ.get("BENCH_REPLICATION", "8"))


def _replicated_pages(sf_dir: str, replication: int):
    import pandas as pd
    import ray
    import ray.data as rd

    from bb_ocr_ray.sources.pages import pages_batch

    from bb_ocr_ray.sources.tables import read_parquet_clean

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text", "lang"])
    # fan out the single-file read so synthesis+extract parallelize
    # (see sources.pages.read_pages docstring); scale the fan-out with
    # replication so per-task work stays ~1-2k docs (big tasks lose
    # load-balance, tiny ones drown in scheduling)
    import pyarrow.parquet as pq

    cpus = int(ray.cluster_resources().get("CPU", 4))
    n_source = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    total_docs = n_source * replication
    # workload-proportional fan-out (~1.5k docs per task, floor 2/cpu,
    # cap 512): measured best at BOTH 8 and 32 cpus — small tasks
    # schedule/balance better and keep per-task heap low; the cap stops
    # per-task scheduling overhead (~25 ms) from dominating tiny runs
    fanout = min(512, max(2 * cpus, total_docs // 1500))
    docs = docs.repartition(fanout)

    def replicate(batch: pd.DataFrame) -> pd.DataFrame:
        if replication <= 1:
            return batch
        parts = []
        for r in range(replication):
            p = batch.copy()
            p["doc_id"] = p["doc_id"] + r * 10_000_000
            parts.append(p)
        return pd.concat(parts, ignore_index=True)

    # batch_size=None: per-block tasks — a positive batch_size would
    # make Ray bundle the repartitioned blocks back into few big tasks
    docs = docs.map_batches(replicate, batch_format="pandas", batch_size=None)
    return docs.map_batches(pages_batch, batch_format="pyarrow", batch_size=None)


def bench_extract(sf_dir: str) -> dict:
    from ray.data.aggregate import Count, Sum

    from bb_ocr_ray.pipelines.extract_pipeline import extract_pages

    pages = _replicated_pages(sf_dir, REPLICATION)
    t0 = time.time()
    extracted = extract_pages(pages)
    agg = extracted.aggregate(Count(alias_name="n"),
                              Sum("html_bytes", alias_name="html_bytes"),
                              Sum("n_blocks_kept", alias_name="blocks"))
    dt = time.time() - t0
    return {"sec": dt, "docs": int(agg["n"]),
            "html_mb": round(agg["html_bytes"] / 1e6, 1),
            "docs_per_sec": round(agg["n"] / dt, 1),
            "html_mb_per_sec": round(agg["html_bytes"] / 1e6 / dt, 1)}


def kernel_canary(sf_dir: str, n_docs: int = 2000) -> float:
    """Single-threaded kernel docs/s on this box, best-of-2 — a
    calibration constant, not a pipeline number.  Sandbox VM speed
    drifts 20-30% between sessions (measured 4393 vs 3564 docs/s on
    identical code); reporting the canary alongside wall times lets a
    cross-session comparison separate box drift from real regressions."""
    import pandas as pd
    import pyarrow as pa

    from bb_ocr_ray.kernel.extract import extract_page
    from bb_ocr_ray.sources.pages import pages_batch

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"]).head(n_docs)
    tbl = pages_batch(pa.Table.from_pandas(docs))
    urls = tbl.column("url").to_pylist()
    htmls = tbl.column("html").to_pylist()
    for u, h in zip(urls[:100], htmls[:100]):   # warm (regex JIT, caches)
        extract_page(u, h)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for u, h in zip(urls, htmls):
            extract_page(u, h)
        best = min(best, time.time() - t0)
    return round(len(urls) / best, 1)


def bench_query(fn, sf_dir: str) -> float:
    """Best-of-2 per query (same protocol as the headline): the first
    execution of a shuffle-heavy query also pays groupby-aggregator /
    worker cold costs a long-running cluster never pays per job, and
    single-shot wall clocks on this box vary ±30%."""
    import ray.data

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        res = fn(sf_dir)
        if isinstance(res, ray.data.Dataset):
            res.count()
        best = min(best, time.time() - t0)
    return round(best, 3)


def run_plain() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # warm OS page cache (untimed) so we measure compute+shuffle not disk
    for t in ("documents", "lineitem", "orders", "customer", "embeddings",
              "events"):
        with open(f"{SF_DIR}/{t}.parquet", "rb") as f:
            f.read()

    # warm the Ray worker pool (untimed): spawn worker processes AND
    # import the library + compile its regexes in EVERY worker, so
    # timings measure steady-state throughput rather than session
    # cold-start (which a long-running cluster never pays).  A plain
    # rd.range warm-up is not enough: the first extraction run would
    # still pay ~0.5-1 s of bb_ocr_ray import per worker, and with
    # best-of-2 that cold cost leaks into the reported number
    # (measured 8.1 s -> 3.0 s -> 2.0 s on consecutive runs after a
    # range-only warm-up).
    import ray.data as rd

    from bb_ocr_ray.pipelines.extract_pipeline import extract_pages
    from bb_ocr_ray.sources.pages import read_pages

    warm_sf = SF_DIR.replace("sf0.1", "sf0.001")
    if not os.path.exists(f"{warm_sf}/documents.parquet"):
        warm_sf = SF_DIR
    warm = read_pages(warm_sf, num_blocks=4 * NUM_CPUS)
    extract_pages(warm).count()
    rd.range(10_000).map_batches(lambda b: b, batch_size=None).count()

    from bb_ocr_ray.pipelines import queries as Q

    # best-of-2: single-shot wall clocks on this box vary ±30%
    # (NOTES_r1 #1; round-1 driver measured 1.9 s where steady state is
    # ~1.25 s) — a long-running cluster's steady-state throughput is
    # what the min of two runs approximates
    ext = bench_extract(SF_DIR)
    ext2 = bench_extract(SF_DIR)
    if ext2["sec"] < ext["sec"]:
        ext = ext2
    if os.environ.get("BENCH_ONLY_EXTRACT"):
        # scaling mode: only the headline number is needed
        ray.shutdown()
        return {
            "metric": "headline extraction wall time (docs->text)",
            "value": round(ext["sec"], 3), "unit": "sec", "queries": {},
            "sf": SF_DIR, "num_cpus": NUM_CPUS, "replication": REPLICATION,
            "docs": ext["docs"], "docs_per_sec": ext["docs_per_sec"],
            "html_mb_per_sec": ext["html_mb_per_sec"],
        }
    qtimes = {
        "extract": round(ext["sec"], 3),
        "q1_pricing_summary": bench_query(Q.q1_pricing_summary, SF_DIR),
        "q_hash_join": bench_query(Q.q_hash_join, SF_DIR),
        "q5_revenue_by_nation": bench_query(Q.q5_revenue_by_nation, SF_DIR),
        "q_dedup_exact": bench_query(Q.q_dedup_exact, SF_DIR),
        "q_minhash_candidates": bench_query(Q.q_minhash_candidates, SF_DIR),
        "q_ann_topk": bench_query(Q.q_ann_topk, SF_DIR),
        "q_domain_stats": bench_query(Q.q_domain_stats, SF_DIR),
        "q_events_hourly": bench_query(Q.q_events_hourly, SF_DIR),
    }
    out = {
        "metric": "headline extraction wall time (docs->text)",
        "value": round(ext["sec"], 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "replication": REPLICATION,
        "docs": ext["docs"],
        "docs_per_sec": ext["docs_per_sec"],
        "html_mb_per_sec": ext["html_mb_per_sec"],
        "canary_docs_per_sec_1core": kernel_canary(SF_DIR),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_ONLY_EXTRACT="1")
        # scaling needs a compute-dominated workload: default to a larger
        # replication than plain mode unless the caller pinned one.
        # 384x (1.92M docs, ~2 GB html) keeps the 32-cpu run ~30 s —
        # measured: at 128x the 32-cpu side finishes in ~10-12 s and
        # ±2.4 s of session jitter alone swings efficiency 0.78-0.97;
        # the bar is about throughput scaling, which wants steady state
        env.setdefault("BENCH_REPLICATION", "384")
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    def run(ncpu: int) -> dict:
        # best of 2: single-node wall clocks at this duration are noisy
        # (±20-30%); min is the standard steady-state estimator
        a, b = run_once(ncpu), run_once(ncpu)
        return a if a["value"] <= b["value"] else b

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling efficiency (extraction, 8 vs 32 cpus)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "docs_per_sec_8": r_lo["docs_per_sec"],
        "docs_per_sec_32": r_hi["docs_per_sec"],
        "sf": SF_DIR,
        "replication": r_hi.get("replication", REPLICATION),
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_plain()))
