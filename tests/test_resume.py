"""Lineage manifest + kill/restart resume test (FIXTURES.md §3)."""

import json
import os

import duckdb
import pyarrow.parquet as pq
import pytest

from bb_ocr_ray.state.manifest import (
    PartitionPlan,
    RunManifest,
    output_digest,
    plan_partitions,
    run_resumable_extract,
)


def test_plan_partitions_file_mode():
    frags = [f"/in/part-{i}.parquet" for i in range(10)]
    plans = plan_partitions(frags, 4)
    assert len(plans) == 4
    covered = [f for p in plans for f in p.fragment_ids]
    assert sorted(covered) == sorted(frags)
    assert all(p.hash_bucket is None for p in plans)


def test_plan_partitions_hash_fallback():
    plans = plan_partitions(["/in/one.parquet"], 4)
    assert len(plans) == 4
    assert all(p.hash_bucket == p.partition_id for p in plans)
    assert all(p.n_buckets == 4 for p in plans)


def test_digest_order_insensitive():
    d1 = output_digest(["b", "a"], [2, 1])
    d2 = output_digest(["a", "b"], [1, 2])
    assert d1 == d2
    assert output_digest(["a"], [1]) != output_digest(["a"], [2])


def test_manifest_idempotent_rerun(tmp_path):
    m = RunManifest(str(tmp_path))
    plan = PartitionPlan(0, ("f1",), None, None)
    m.record(plan, 10, "abc")
    m.record(plan, 10, "abc")            # same digest: fine
    with pytest.raises(RuntimeError):
        m.record(plan, 10, "DIFFERENT")  # divergent rerun: refused
    assert m.completed()[0]["row_count"] == 10


def test_kill_restart_no_dupes_no_missing(ray_session, sf_tiny, tmp_path):
    out_root = str(tmp_path / "run")

    # phase 1: run only the first 3 partitions, then "crash"
    n_parts = 6
    from bb_ocr_ray.state import manifest as mod

    orig = mod.plan_partitions

    def truncated_plan(fragments, n):
        return orig(fragments, n)[:3]

    mod.plan_partitions = truncated_plan
    try:
        n_run, n_skipped = run_resumable_extract(sf_tiny, out_root, n_parts)
    finally:
        mod.plan_partitions = orig
    assert (n_run, n_skipped) == (3, 0)

    # phase 2: restart — completed partitions skipped, rest run
    n_run2, n_skipped2 = run_resumable_extract(sf_tiny, out_root, n_parts)
    assert (n_run2, n_skipped2) == (3, 3)

    # invariant: output urls are EXACTLY the input urls (no dupes/missing)
    part_dirs = [os.path.join(out_root, d) for d in sorted(os.listdir(out_root))
                 if d.startswith("part-") and not d.endswith(".tmp")]
    assert len(part_dirs) == n_parts
    urls = []
    for d in part_dirs:
        urls.extend(pq.read_table(d, columns=["url"]).column("url").to_pylist())
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_tiny}/documents.parquet'"
    ).fetchone()[0]
    assert len(urls) == n_docs
    assert len(set(urls)) == n_docs

    # manifest digests are stable across a full re-run of one partition
    man = RunManifest(out_root).completed()
    assert len(man) == n_parts
    first = man[0]
    assert set(first) == {"partition_id", "fragment_ids", "hash_bucket",
                          "n_buckets", "row_count", "digest",
                          "completed_ts", "metrics"}
    assert first["metrics"]["docs_per_sec"] > 0

    # phase 3: delete one partition's output (keep manifest), re-run —
    # it is rebuilt with an identical digest (idempotency under retry)
    import shutil

    victim = part_dirs[0]
    shutil.rmtree(victim)
    n_run3, n_skipped3 = run_resumable_extract(sf_tiny, out_root, n_parts)
    assert (n_run3, n_skipped3) == (1, 5)
    man2 = RunManifest(out_root).completed()
    assert man2[0]["digest"] == man[0]["digest"]


def test_lifecycle_kill_restart_both_sinks(ray_session, sf_tiny, tmp_path):
    """Kill mid-lifecycle, restart: 0 duplicates / 0 missing across
    BOTH the accepted and rejected sinks, and both sinks publish
    atomically per partition (VERDICT r3 item 7)."""
    import duckdb

    from bb_ocr_ray.config import ExtractConfig, PipelineConfig
    from bb_ocr_ray.state.manifest import (RunManifest,
                                           run_resumable_lifecycle)

    out_root = str(tmp_path / "lc")
    n_parts = 4
    # a small oversize gate marks the largest docs status=truncated ->
    # REJECTED rows, so both sinks carry data (the synthetic corpus
    # otherwise validates 100%)
    cfg = PipelineConfig(extract=ExtractConfig(max_html_bytes=3_000))

    # phase 1: "crash" after 2 of 4 partitions
    from bb_ocr_ray.state import manifest as mod

    orig = mod.plan_partitions
    mod.plan_partitions = lambda frags, n: orig(frags, n)[:2]
    try:
        n_run, n_skipped = run_resumable_lifecycle(sf_tiny, out_root,
                                                   n_parts,
                                                   pipeline_cfg=cfg)
    finally:
        mod.plan_partitions = orig
    assert (n_run, n_skipped) == (2, 0)

    # phase 2: restart — completed partitions skipped, rest run
    assert run_resumable_lifecycle(sf_tiny, out_root, n_parts,
                                   pipeline_cfg=cfg) == (2, 2)

    part_dirs = [os.path.join(out_root, d)
                 for d in sorted(os.listdir(out_root))
                 if d.startswith("part-") and ".tmp" not in d]
    assert len(part_dirs) == n_parts
    urls, decisions = [], []
    for d in part_dirs:
        # partitions publish atomically with their decision= subdirs
        assert all(s.startswith("decision=") for s in os.listdir(d)), d
        t = pq.read_table(d, columns=["url", "decision"])
        urls.extend(t.column("url").to_pylist())
        decisions.extend(
            str(x) for x in t.column("decision").to_pylist())
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_tiny}/documents.parquet'"
    ).fetchone()[0]
    assert len(urls) == n_docs          # 0 missing across BOTH sinks
    assert len(set(urls)) == n_docs     # 0 duplicates across BOTH sinks
    assert set(decisions) == {"accepted", "rejected"}

    # manifest carries per-sink counts and a decision-aware digest;
    # a retried partition converges to the identical digest
    man = RunManifest(out_root).completed()
    assert all(m["metrics"]["n_accepted"] + m["metrics"]["n_rejected"]
               == m["row_count"] for m in man.values())
    assert sum(m["metrics"]["n_rejected"] for m in man.values()) > 0
    import shutil as sh

    sh.rmtree(part_dirs[0])
    assert run_resumable_lifecycle(sf_tiny, out_root, n_parts,
                                   pipeline_cfg=cfg) == (1, 3)
    assert RunManifest(out_root).completed()[0]["digest"] == man[0]["digest"]


def test_resume_with_payload_budget(ray_session, sf_tiny, tmp_path):
    """The production runner honors payload_block_budget_mb and its
    digests match the unbudgeted run (sizing never changes content)."""
    from bb_ocr_ray.config import PipelineConfig
    from bb_ocr_ray.state.manifest import RunManifest, run_resumable_extract

    plain = str(tmp_path / "plain")
    budgeted = str(tmp_path / "budgeted")
    run_resumable_extract(sf_tiny, plain, 2)
    cfg = PipelineConfig(payload_block_budget_mb=1)
    run_resumable_extract(sf_tiny, budgeted, 2, pipeline_cfg=cfg)
    d_plain = {k: v["digest"] for k, v in RunManifest(plain).completed().items()}
    d_budg = {k: v["digest"] for k, v in RunManifest(budgeted).completed().items()}
    assert d_plain == d_budg


def test_resume_refuses_changed_partition_plan(ray_session, sf_tiny, tmp_path):
    """Review regression: resuming with a different n_partitions must
    refuse loudly instead of silently duplicating/dropping rows."""
    out = str(tmp_path / "plan")
    run_resumable_extract(sf_tiny, out, 4)
    with pytest.raises(RuntimeError, match="plan mismatch"):
        run_resumable_extract(sf_tiny, out, 8)


def test_manifest_compaction_resume_bounded(tmp_path):
    """VERDICT r4 item 8: 10^4 completed partitions resume through ONE
    snapshot read plus the post-compaction tail — O(new work), not
    O(total partitions) file opens — with every kill/restart invariant
    (idempotent rerun digest guard, merge-over-snapshot) intact."""
    import time

    m = RunManifest(str(tmp_path), compact_threshold=100_000)
    n = 10_000
    for pid in range(n):
        m.record(PartitionPlan(pid, (f"frag-{pid}",), None, None),
                 10, f"d{pid}")
    assert m.compact() == n
    assert m._tail_names() == []

    # a restarted driver: fresh manifest object, cold caches
    m2 = RunManifest(str(tmp_path), compact_threshold=100_000)
    t0 = time.time()
    done = m2.completed()
    dt = time.time() - t0
    assert len(done) == n
    assert done[1234]["digest"] == "d1234"
    assert done[1234]["fragment_ids"] == ["frag-1234"]
    assert dt < 5.0, f"snapshot resume took {dt:.2f}s"

    # new work after compaction lands in the tail and merges on top
    m2.record(PartitionPlan(n, ("frag-x",), None, None), 3, "dx")
    done2 = m2.completed(auto_compact=False)
    assert len(done2) == n + 1 and done2[n]["digest"] == "dx"

    # the non-idempotent-rerun guard survives compaction: the per-pid
    # file was folded + deleted, but the snapshot still holds its digest
    with pytest.raises(RuntimeError, match="non-idempotent"):
        m2.record(PartitionPlan(1234, ("frag-1234",), None, None),
                  10, "0" * 16)

    # crash between snapshot write and tail deletion: a leftover tail
    # file (same content) merges idempotently over the snapshot
    m2.record(PartitionPlan(77, ("frag-77",), None, None), 10, "d77")
    done3 = RunManifest(str(tmp_path)).completed(auto_compact=False)
    assert done3[77]["digest"] == "d77" and len(done3) == n + 1


def test_manifest_auto_compacts_past_threshold(tmp_path):
    """completed() folds the tail into the snapshot once it crosses
    compact_threshold; records are never lost or duplicated."""
    m = RunManifest(str(tmp_path), compact_threshold=5)
    for pid in range(12):
        m.record(PartitionPlan(pid, (f"f{pid}",), None, None), 1, f"g{pid}")
    done = m.completed()                  # tail 12 >= 5: compacts
    assert len(done) == 12
    assert m._tail_names() == []
    assert os.path.exists(os.path.join(str(tmp_path), "manifest",
                                       "_snapshot.json"))
    # post-compaction reads see the same world
    assert RunManifest(str(tmp_path)).completed() == done
