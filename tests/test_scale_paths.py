"""Tests for the at-scale variants: IVF ANN recall, Bloom semi-join,
size-aware repartition."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_ivf_recall_vs_exact(ray_session, sf_tiny):
    import ray.data as rd

    from bb_ocr_ray.stages.ann import ann_topk, ivf_topk

    vecs = rd.read_parquet(f"{sf_tiny}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    qids = list(range(10))
    exact = ann_topk(vecs, qids, k=5).to_pandas()
    approx = ivf_topk(vecs, qids, k=5, n_lists=8, n_probe=4).to_pandas()
    # recall@5 of the approximate index vs the exact baseline
    hits = total = 0
    for q in qids:
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(e & a)
        total += len(e)
    recall = hits / total
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"
    # determinism: a second run returns the identical table
    approx2 = ivf_topk(vecs, qids, k=5, n_lists=8, n_probe=4).to_pandas()
    pd.testing.assert_frame_equal(
        approx.sort_values(["query_id", "rank"]).reset_index(drop=True),
        approx2.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_bloom_semi_join_no_false_negatives(ray_session, sf_tiny):
    import ray.data as rd

    from bb_ocr_ray.stages.joins import build_bloom, semi_join_bloom

    li_keys = rd.read_parquet(f"{sf_tiny}/lineitem.parquet",
                              columns=["l_suppkey"])
    bloom = build_bloom(li_keys, "l_suppkey")
    supp = rd.read_parquet(f"{sf_tiny}/supplier.parquet",
                           columns=["s_suppkey", "s_name"])
    supp = supp.map_batches(
        lambda b: b.rename(columns={"s_suppkey": "l_suppkey"}),
        batch_format="pandas",
    )
    got = set(semi_join_bloom(supp, bloom, "l_suppkey").to_pandas()["l_suppkey"])
    truth = set(pd.read_parquet(f"{sf_tiny}/lineitem.parquet",
                                columns=["l_suppkey"])["l_suppkey"].unique())
    all_supp = set(pd.read_parquet(f"{sf_tiny}/supplier.parquet")["s_suppkey"])
    # no false negatives (every true match kept); fp bounded
    assert truth & all_supp <= got
    fp = got - truth
    assert len(fp) <= max(2, len(all_supp) // 20)


def test_bloom_filter_basics():
    from bb_ocr_ray.stages.joins import BloomFilter

    bf = BloomFilter(n_bits=1 << 14)
    for k in range(200):
        bf.add(f"key-{k}")
    assert all(f"key-{k}" in bf for k in range(200))
    fps = sum(1 for k in range(10_000, 11_000) if f"key-{k}" in bf)
    assert fps < 50   # ~sub-5% at this load factor


def test_split_by_bytes_bounds_blocks(ray_session):
    import ray.data as rd

    from bb_ocr_ray.stages.sizing import block_budget, split_by_bytes

    import ray

    budget = 1_000_000
    with block_budget(budget):
        # NOTE: the dataset must be CREATED inside the budget context —
        # Ray snapshots DataContext at Dataset creation time
        rows = [{"url": f"u{i}", "html": b"x" * 100_000} for i in range(100)]
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = split_by_bytes(ds, "html", max_bytes=budget).materialize()
        # row-preserving
        assert out.count() == len(rows)
        # real block boundaries honor the byte budget
        sizes = [
            sum(len(v.as_py()) for v in ray.get(ref).column("html"))
            for ref in out.to_arrow_refs()
        ]
    assert len(sizes) >= 10, sizes
    assert all(s <= budget for s in sizes), sizes


def test_kmeans_deterministic(ray_session, sf_tiny):
    import ray.data as rd

    from bb_ocr_ray.stages.ann import kmeans_fit

    vecs = rd.read_parquet(f"{sf_tiny}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    c1 = kmeans_fit(vecs, k=8, iters=3)
    c2 = kmeans_fit(vecs, k=8, iters=3)
    np.testing.assert_array_equal(c1, c2)
