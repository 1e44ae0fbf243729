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


def test_embedding_near_dups_planted_pairs(ray_session):
    """Planted >=0.99-cosine twins MUST come back as pairs (VERDICT r1:
    this stage previously had zero positive evidence), and every
    returned pair must truly be above threshold (exact in-bucket
    verify => no false positives)."""
    import ray.data as rd

    from bb_ocr_ray.stages.ann import embedding_near_dups

    rng = np.random.RandomState(7)
    base = rng.standard_normal((300, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [{"vec_id": i, "embedding": base[i].astype(np.float32)}
            for i in range(300)]
    # twins: ids 1000+i are tiny perturbations of ids 0..19
    planted = set()
    for i in range(20):
        twin = base[i] + 0.02 * rng.standard_normal(64)
        rows.append({"vec_id": 1000 + i, "embedding": twin.astype(np.float32)})
        planted.add((i, 1000 + i))
    ds = rd.from_items(rows)

    pairs = embedding_near_dups(ds, threshold=0.95).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].itertuples(index=False)))
    assert planted <= got, f"missing planted pairs: {planted - got}"

    # exact-verify side: recompute every returned cosine
    lut = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in rows}
    for a, b in got:
        va, vb = lut[int(a)], lut[int(b)]
        c = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert c >= 0.95, f"false positive pair ({a},{b}) cosine {c:.4f}"
    # pairs are deduped across tables and ordered id_a < id_b
    assert (pairs["id_a"] < pairs["id_b"]).all()
    assert not pairs.duplicated(["id_a", "id_b"]).any()


def test_embedding_near_dups_flood_cap_chains(ray_session):
    """A 150-copy identical-vector flood exceeds a tiny bucket_cap:
    the chained tail keeps every member connected."""
    import ray.data as rd

    from bb_ocr_ray.stages.ann import embedding_near_dups

    v = np.ones(64, dtype=np.float32) / 8.0
    ds = rd.from_items([{"vec_id": i, "embedding": v} for i in range(150)])
    pairs = embedding_near_dups(ds, threshold=0.99, bucket_cap=32).to_pandas()
    touched = set(pairs["id_a"]) | set(pairs["id_b"])
    assert touched == set(range(150))
    # O(cap^2 + B) not O(B^2): full 150-pairwise would be 11175 pairs
    assert len(pairs) <= 32 * 31 // 2 + (150 - 32)


def test_hll_estimate_accuracy(ray_session):
    """HLL registers from the distributed sketch estimate the true
    user cardinality within the m=64 error band (~13% stderr)."""
    from bb_ocr_ray.functions.hashing import hll_estimate
    from bb_ocr_ray.pipelines.queries import q_hll_registers

    sf = "/root/testdata/sf0.01"
    regs = q_hll_registers(sf)
    registers = dict(zip(regs["bucket"], regs["max_rho"]))
    import duckdb

    truth = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{sf}/events.parquet'"
    ).fetchone()[0]
    est = hll_estimate(registers)
    assert abs(est - truth) / truth < 0.35, (est, truth)


def test_hll_grouped_estimates(ray_session):
    """Per-group HLL registers estimate each event_type's distinct-user
    count within the m=64 error band."""
    import duckdb

    from bb_ocr_ray.functions.hashing import hll_estimate
    from bb_ocr_ray.pipelines.queries import q_hll_grouped

    sf = "/root/testdata/sf0.01"
    regs = q_hll_grouped(sf)
    truth = dict(duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) "
        f"FROM '{sf}/events.parquet' GROUP BY 1").fetchall())
    for etype, g in regs.groupby("event_type"):
        registers = dict(zip(g["bucket"], g["max_rho"]))
        est = hll_estimate(registers)
        assert abs(est - truth[etype]) / truth[etype] < 0.35, (
            etype, est, truth[etype])


def test_hll_registers_mergeable():
    """Register-wise max of two halves == registers of the union (the
    property that makes the sketch a distributed aggregate)."""
    from bb_ocr_ray.functions.hashing import hll_bucket_rho

    def regs(keys):
        r = {}
        for k in keys:
            b, rho = hll_bucket_rho(k)
            r[b] = max(r.get(b, 0), rho)
        return r

    a = regs(str(i) for i in range(500))
    b = regs(str(i) for i in range(250, 900))
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == regs(str(i) for i in range(900))


def test_cms_registers_mergeable():
    """Summed register matrices of two halves == registers of the
    union — the property that makes the sketch a distributed
    aggregate (additive, unlike HLL's max-merge)."""
    import numpy as np

    from bb_ocr_ray.functions.hashing import (_CMS_DEPTH, _CMS_WIDTH,
                                              cms_buckets)

    def regs(keys):
        r = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
        for k in keys:
            for i, b in enumerate(cms_buckets(k)):
                r[i, b] += 1
        return r

    a = [str(i % 37) for i in range(400)]
    b = [str(i % 61) for i in range(300)]
    assert (regs(a) + regs(b) == regs(a + b)).all()


def test_cms_estimate_upper_bounds_truth(ray_session):
    """est_count >= true_count for every reported key (the Count-Min
    one-sided error guarantee), and every key with true count >= n/125
    is reported (candidate recall 1 by pigeonhole)."""
    import duckdb

    from bb_ocr_ray.pipelines.queries import q_cms_heavy_hitters

    sf = "/root/testdata/sf0.01"
    out = q_cms_heavy_hitters(sf)
    assert len(out) > 0
    assert (out["est_count"] >= out["true_count"]).all()
    truth = duckdb.sql(
        f"WITH ev AS (SELECT user_id FROM '{sf}/events.parquet' "
        f"            WHERE user_id IS NOT NULL) "
        f"SELECT user_id, count(*) c FROM ev GROUP BY 1 "
        f"HAVING count(*) * 125 >= (SELECT count(*) FROM ev)"
    ).df()
    assert sorted(out["user_id"]) == sorted(truth["user_id"].astype(int))


def test_cms_planted_heavy_key(ray_session, tmp_path):
    """A planted flood key dominates the corpus and must surface with
    an exact true_count even when spread across many blocks."""
    import pandas as pd
    import ray.data as rd

    from bb_ocr_ray.pipelines import queries as Q

    ev = pd.DataFrame({
        "user_id": [999_999] * 400 + list(range(600)),
        "ts": pd.Timestamp("2024-01-01"),
        "event_id": range(1000),
        "event_type": "click", "value": 1.0, "props": "{}"})
    d = tmp_path / "sf_cms"
    d.mkdir()
    rd.from_pandas(ev).repartition(8).write_parquet(str(d / "events.parquet"))
    out = Q.q_cms_heavy_hitters(str(d))
    row = out[out["user_id"] == 999_999]
    assert len(row) == 1 and int(row["true_count"].iloc[0]) == 400
    # uniform singletons (1/1000 < 1/125) must NOT appear
    assert len(out) == 1


def test_auto_join_size_gate(ray_session, sf_tiny):
    """auto_join routes by the small side's metadata size estimate:
    a parquet-backed dim under the limit broadcasts; forcing the limit
    to 1 byte routes the SAME join through the hash path — results
    identical either way (VERDICT r2 item 3)."""
    import ray.data as rd

    from bb_ocr_ray.stages.joins import auto_join

    li = rd.read_parquet(f"{sf_tiny}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    supp = rd.read_parquet(f"{sf_tiny}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"]
                           ).rename_columns({"s_suppkey": "l_suppkey"})

    choices = []
    via_bcast = auto_join(li, supp, on="l_suppkey",
                          _on_choice=choices.append).to_pandas()
    via_hash = auto_join(
        rd.read_parquet(f"{sf_tiny}/lineitem.parquet",
                        columns=["l_orderkey", "l_suppkey"]),
        rd.read_parquet(f"{sf_tiny}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]
                        ).rename_columns({"s_suppkey": "l_suppkey"}),
        on="l_suppkey", broadcast_limit=1,
        _on_choice=choices.append).to_pandas()
    assert choices == ["broadcast", "hash"]

    key = ["l_orderkey", "l_suppkey", "s_nationkey"]
    a = via_bcast[key].sort_values(key).reset_index(drop=True)
    b = via_hash[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_auto_semi_anti_size_gate(ray_session, sf_tiny):
    """auto_semi / auto_anti: broadcast vs hash paths agree exactly,
    and the 1-byte limit provably exercises the hash path."""
    import ray.data as rd

    from bb_ocr_ray.stages.joins import auto_anti, auto_semi

    def supp():
        return rd.read_parquet(f"{sf_tiny}/supplier.parquet",
                               columns=["s_suppkey", "s_name"])

    def keys():
        return rd.read_parquet(f"{sf_tiny}/lineitem.parquet",
                               columns=["l_suppkey"]
                               ).rename_columns({"l_suppkey": "s_suppkey"})

    def vals(ds):
        df = ds.to_pandas()
        # an all-empty Dataset loses its schema through to_pandas
        # (repo-documented gotcha): an empty anti result is legitimate
        return set(df["s_suppkey"]) if "s_suppkey" in df.columns else set()

    choices = []
    semi_b = vals(auto_semi(supp(), keys(), "s_suppkey",
                            _on_choice=choices.append))
    semi_h = vals(auto_semi(supp(), keys(), "s_suppkey", broadcast_limit=1,
                            _on_choice=choices.append))
    anti_b = vals(auto_anti(supp(), keys(), "s_suppkey",
                            _on_choice=choices.append))
    anti_h = vals(auto_anti(supp(), keys(), "s_suppkey", broadcast_limit=1,
                            _on_choice=choices.append))
    assert choices == ["broadcast", "hash", "broadcast", "hash"]
    assert semi_b == semi_h
    assert anti_b == anti_h
    all_supp = set(supp().to_pandas()["s_suppkey"])
    assert semi_b | anti_b == all_supp and not (semi_b & anti_b)


def test_ivf_exact_equals_brute_any_probe(ray_session, sf_tiny):
    """ivf_topk_exact must equal brute force REGARDLESS of n_probe —
    the triangle-inequality rescan repairs whatever the probe misses
    (n_probe=1 forces maximal reliance on the pruning bound)."""
    import ray.data as rd

    from bb_ocr_ray.stages.ann import ann_topk, ivf_topk_exact

    def vecs():
        return rd.read_parquet(f"{sf_tiny}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    qs = list(range(8))
    exact = (ann_topk(vecs(), qs, k=5).to_pandas()
             .sort_values(["query_id", "rank"]).reset_index(drop=True))
    for n_probe in (1, 4):
        got = (ivf_topk_exact(vecs(), qs, k=5, n_probe=n_probe).to_pandas()
               .sort_values(["query_id", "rank"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["query_id", "rank", "neighbor_id"]],
            exact[["query_id", "rank", "neighbor_id"]])


def test_coarse_agg_matches_pandas(ray_session):
    """coarse_agg == pandas groupby on mixed dtypes, null keys, and
    every refoldable reduction, at several bucket counts."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bb_ocr_ray.stages.coarse import coarse_agg

    rng = np.random.RandomState(7)
    n = 5000
    df = pd.DataFrame({
        "k": rng.randint(0, 800, n).astype("float64"),
        "s": [f"dom{i % 37}.example" for i in rng.randint(0, 5000, n)],
        "v": rng.randint(-100, 100, n).astype("int64"),
    })
    # null keys in both a numeric and a string key column
    df.loc[df.index[:50], "k"] = np.nan
    df.loc[df.index[50:80], "s"] = None

    spec = {"total": ("v", "sum"), "lo": ("v", "min"),
            "hi": ("v", "max"), "n": ("v", "size")}
    ds = rd.from_pandas(df).repartition(8)

    def canon(out):
        out = out.sort_values(["k", "s"], na_position="last",
                              kind="mergesort").reset_index(drop=True)
        return out[["k", "s", "total", "lo", "hi", "n"]]

    expect = canon(df.groupby(["k", "s"], as_index=False,
                              dropna=False).agg(**spec))
    for buckets in (1, 3, 64):
        got = canon(coarse_agg(ds, ["k", "s"], spec,
                               coarse_buckets=buckets).to_pandas())
        pd.testing.assert_frame_equal(
            got.astype({"total": "int64", "lo": "int64",
                        "hi": "int64", "n": "int64"}),
            expect.astype({"total": "int64", "lo": "int64",
                           "hi": "int64", "n": "int64"}))

    # single numeric key seen as int64 in some blocks, float64 in
    # others (null-driven upcast) must still land in one bucket
    a = pd.DataFrame({"k": np.arange(20, dtype="int64"), "v": 1})
    b = pd.DataFrame({"k": np.arange(20).astype("float64"), "v": 1})
    ds2 = rd.from_pandas(a).union(rd.from_pandas(b)).repartition(4)
    got2 = (coarse_agg(ds2, ["k"], {"n": ("v", "sum")}, coarse_buckets=16)
            .to_pandas())
    assert len(got2) == 20 and set(got2["n"]) == {2}


def test_coarse_agg_arrow_blocks_match_pandas_blocks(ray_session):
    """The Arrow-block stamp fast path (pyarrow group_by combiner, no
    full-batch pandas conversion) must produce results identical to
    the pandas-block path on the same data — including null keys/
    values, string keys, every refoldable how, multiple size aggs,
    the partial=False path, and a MIXED arrow+pandas block stream
    (the bucket hash must agree across paths or one key's rows split
    across buckets)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from bb_ocr_ray.stages.coarse import coarse_agg

    rng = np.random.RandomState(13)
    n = 4000
    df = pd.DataFrame({
        "k": [f"key{i % 211}" for i in rng.randint(0, 4000, n)],
        "v": rng.randint(-50, 50, n).astype("int64"),
        "w": rng.randn(n),
    })
    df.loc[df.index[:40], "k"] = None
    df.loc[df.index[40:70], "v"] = pd.NA
    df["v"] = df["v"].astype("Int64")

    spec = {"total": ("v", "sum"), "lo": ("w", "min"),
            "hi": ("w", "max"), "n1": ("v", "size"),
            "n2": ("w", "size"), "nv": ("v", "count")}

    tbl = pa.Table.from_pandas(df, preserve_index=False)
    ds_arrow = rd.from_arrow(tbl).repartition(6)
    ds_pandas = rd.from_pandas(df).repartition(6)

    def canon(out):
        out = out.copy()
        out["total"] = out["total"].astype("float64")
        for c in ("n1", "n2", "nv"):
            out[c] = out[c].astype("int64")
        return (out.sort_values("k", na_position="last",
                                kind="mergesort")
                .reset_index(drop=True)
                [["k", "total", "lo", "hi", "n1", "n2", "nv"]])

    got_a = canon(coarse_agg(ds_arrow, ["k"], spec,
                             coarse_buckets=7).to_pandas())
    got_p = canon(coarse_agg(ds_pandas, ["k"], spec,
                             coarse_buckets=7).to_pandas())
    pd.testing.assert_frame_equal(got_a, got_p, check_dtype=False)

    # mixed block stream: same key must reach ONE bucket in both paths
    # (no repartition on the union — Ray's shuffle reduce itself cannot
    # merge arrow+pandas blocks; the stamp's uniform pandas output is
    # what makes the downstream groupby shuffle legal)
    half = n // 2
    mixed = (rd.from_arrow(pa.Table.from_pandas(df.iloc[:half],
                                                preserve_index=False))
             .union(rd.from_pandas(df.iloc[half:].reset_index(drop=True))))
    got_m = canon(coarse_agg(mixed, ["k"], spec,
                             coarse_buckets=7).to_pandas())
    pd.testing.assert_frame_equal(got_m, got_p, check_dtype=False)

    # partial=False path over arrow blocks ("first" is not refoldable;
    # the probe value is constant per key so shuffle order is moot)
    df2 = df.assign(kw=df["k"].fillna("<null>").str.len().astype("int64"))
    ds2 = rd.from_arrow(pa.Table.from_pandas(
        df2, preserve_index=False)).repartition(4)
    got_f = (coarse_agg(ds2, ["k"], {"f": ("kw", "first")},
                        coarse_buckets=4, partial=False)
             .to_pandas().sort_values("k", na_position="last")
             .reset_index(drop=True))
    exp_f = (df2.groupby("k", as_index=False, dropna=False)
             .agg(f=("kw", "first"))
             .sort_values("k", na_position="last").reset_index(drop=True))
    pd.testing.assert_frame_equal(got_f, exp_f, check_dtype=False)


def test_pagerank_matches_numpy(ray_session):
    """Distributed PageRank == dense numpy power iteration on a random
    graph with parallel edges, skewed in-degrees, and dangling sinks."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bb_ocr_ray.stages.graph import pagerank

    rng = np.random.RandomState(11)
    n = 60
    src = rng.randint(0, 40, 300)            # nodes 40..59 are sinks
    dst = rng.randint(0, n, 300)
    edges = pd.DataFrame({"src": src.astype("int64"),
                          "dst": dst.astype("int64")})

    nodes = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(nodes)}
    nv = len(nodes)
    outdeg = pd.Series(src).value_counts()
    r = np.full(nv, 1.0 / nv)
    for _ in range(10):
        m = np.zeros(nv)
        for s, d in zip(src, dst):
            m[idx[d]] += 0.85 * r[idx[s]] / outdeg[s]
        r = 0.15 / nv + m

    got = (pagerank(rd.from_pandas(edges).repartition(4), iters=10,
                    coarse_buckets=5)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert list(got["node"]) == list(nodes)
    np.testing.assert_allclose(got["rank"].to_numpy(),
                               np.array([r[idx[v]] for v in nodes]),
                               rtol=1e-12, atol=1e-15)


def test_pagerank_tol_early_exit(ray_session):
    """tol-mode PageRank stops as soon as max |Δrank| <= tol (observed
    via the stats out-param) and the early result stays within the
    documented drift bound tol*d/(1-d) of the full fixed-iteration
    run.  Exact mode (tol=None) must NOT exit early here: the deltas
    at iteration 10 are far above float equality."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bb_ocr_ray.stages.graph import pagerank

    rng = np.random.RandomState(7)
    edges = pd.DataFrame({
        "src": rng.randint(0, 50, 400).astype("int64"),
        "dst": rng.randint(0, 60, 400).astype("int64")})
    ds = rd.from_pandas(edges).repartition(4)

    full = (pagerank(ds, iters=40, coarse_buckets=5)
            .to_pandas().sort_values("node").reset_index(drop=True))

    tol = 1e-6
    st = {}
    early = (pagerank(ds, iters=40, coarse_buckets=5, tol=tol, stats=st)
             .to_pandas().sort_values("node").reset_index(drop=True))
    assert st["iters_run"] < 40, "tol exit never fired"
    assert st["max_delta"] <= tol
    bound = tol * 0.85 / 0.15 + 1e-12
    assert list(early["node"]) == list(full["node"])
    assert np.abs(early["rank"].to_numpy()
                  - full["rank"].to_numpy()).max() <= bound

    st2 = {}
    exact = (pagerank(ds, iters=10, coarse_buckets=5, stats=st2)
             .to_pandas().sort_values("node").reset_index(drop=True))
    assert st2["iters_run"] == 10, "exact mode exited before convergence"
    # repeat runs agree to float-sum-reorder noise (coarse partials
    # arrive in nondeterministic order; the query rounds to 6 dp)
    np.testing.assert_allclose(
        exact["rank"].to_numpy(),
        pagerank(ds, iters=10, coarse_buckets=5).to_pandas()
        .sort_values("node")["rank"].to_numpy(), rtol=1e-12, atol=1e-15)


def test_pagerank_static_matches_dataset(ray_session):
    """Actor-resident-edge pagerank == the pure-Dataset pagerank on a
    random graph (parallel edges, sinks, dst-only nodes in edge-less
    shards)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bb_ocr_ray.stages.graph import pagerank, pagerank_static

    rng = np.random.RandomState(23)
    edges = pd.DataFrame({
        "src": rng.randint(0, 30, 200).astype("int64"),
        "dst": rng.randint(0, 80, 200).astype("int64")})

    base = (pagerank(rd.from_pandas(edges).repartition(4), iters=8)
            .to_pandas().sort_values("node").reset_index(drop=True))
    got = (pagerank_static(rd.from_pandas(edges).repartition(4), iters=8,
                           n_shards=5)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert list(got["node"]) == list(base["node"])
    np.testing.assert_allclose(got["rank"].to_numpy(),
                               base["rank"].to_numpy(),
                               rtol=1e-12, atol=1e-15)


def test_grouped_per_key_matches_map_groups_semantics(ray_session):
    """grouped_per_key(fn) == pandas per-key apply of fn, including
    null keys, int/float key upcast across blocks, and fns that fold
    some keys to zero rows."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bb_ocr_ray.stages.coarse import grouped_per_key

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "u": rng.randint(0, 40, 400).astype("float64"),
        "v": rng.randint(0, 1000, 400).astype("int64")})
    df.loc[df.index[:17], "u"] = np.nan

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        # fold to one row per key; keys with an odd min fold to nothing
        # (fn is never handed an empty frame — map_groups semantics)
        lo = int(g["v"].min())
        if lo % 2 == 1:
            return g.head(0)[["v"]].assign(n=pd.array([], dtype="int64"))
        return pd.DataFrame({"v": [lo], "n": [len(g)]})

    got = (grouped_per_key(rd.from_pandas(df).repartition(6), "u", fn,
                           coarse_buckets=5)
           .to_pandas().sort_values(["v", "n"]).reset_index(drop=True))

    parts = [fn(g) for _, g in df.groupby("u", dropna=False, sort=True)]
    exp = (pd.concat([p for p in parts if len(p)], ignore_index=True)
           .sort_values(["v", "n"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"v": "int64", "n": "int64"}),
        exp.astype({"v": "int64", "n": "int64"}))


def test_skew_join_matches_plain_join(ray_session):
    """Planted hot key: skew_join's salted result equals a plain pandas
    merge row-for-row (inner and left), and the hot key really is
    detected (otherwise this test exercises nothing)."""
    import ray.data as rd

    from bb_ocr_ray.stages.joins import skew_join

    rng = np.random.RandomState(7)
    # 20k probe rows, 90% on ONE hot key, the rest across 50 cold keys
    k = np.where(rng.rand(20_000) < 0.9, 777,
                 rng.randint(0, 50, 20_000)).astype("int64")
    left = pd.DataFrame({"k": k, "v": np.arange(20_000, dtype="int64")})
    # build side: every key incl. some unmatched; one row per key
    right = pd.DataFrame({"k": np.arange(-5, 800, dtype="int64")})
    right["w"] = right["k"] * 10

    hot_seen = []
    for how in ("inner", "left"):
        got = (skew_join(rd.from_pandas(left), rd.from_pandas(right),
                         on="k", how=how, salt=8, hot_threshold=1000,
                         _on_hot=hot_seen.append)
               .to_pandas()
               .sort_values(["k", "v"]).reset_index(drop=True))
        want = (left.merge(right, on="k", how=how)
                .sort_values(["k", "v"]).reset_index(drop=True))
        assert "_salt" not in got.columns
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], want[sorted(want.columns)],
            check_dtype=False)
    assert hot_seen == [1, 1]          # exactly the planted hot key


def test_skew_join_no_hot_keys_falls_back(ray_session):
    """Below the hot threshold the operator is a plain hash_join
    (detected hot set empty, no salting stages added)."""
    import ray.data as rd

    from bb_ocr_ray.stages.joins import skew_join

    left = pd.DataFrame({"k": np.arange(100, dtype="int64") % 10,
                         "v": np.arange(100, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(10, dtype="int64"),
                          "w": np.arange(10, dtype="int64") * 2})
    hot_seen = []
    got = (skew_join(rd.from_pandas(left), rd.from_pandas(right),
                     on="k", hot_threshold=1000, _on_hot=hot_seen.append)
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    want = (left.merge(right, on="k")
            .sort_values(["k", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)
    assert hot_seen == [0]


def test_skew_join_refuses_full_outer(ray_session):
    import pytest
    import ray.data as rd

    from bb_ocr_ray.stages.joins import skew_join

    df = pd.DataFrame({"k": [1], "v": [1]})
    with pytest.raises(ValueError):
        skew_join(rd.from_pandas(df), rd.from_pandas(df), on="k",
                  how="full")


def test_interval_join_matches_bruteforce(ray_session):
    """interval_join == a brute-force pandas overlap join on random
    variable-length intervals: pairs sharing MANY buckets must emit
    exactly once (overlap-start rule), NULL keys/endpoints and
    end < start rows must drop."""
    import ray.data as rd

    from bb_ocr_ray.stages.joins import interval_join

    rng = np.random.RandomState(3)
    W = 100          # bucket width
    n = 400

    def mk(side):
        s = rng.randint(0, 3000, n).astype("float64")
        ln = rng.choice([1, 5, 50, 500, 1500], n).astype("float64")
        df = pd.DataFrame({
            "k": rng.randint(0, 5, n).astype("float64"),
            "s": s, "e": s + ln,
            "id": np.arange(n, dtype="int64") + (0 if side == 0 else 10_000)})
        # plant NULLs and ill-formed intervals
        df.loc[::37, "k"] = np.nan
        df.loc[1::53, "s"] = np.nan
        df.loc[2::41, ["s", "e"]] = df.loc[2::41, ["e", "s"]].to_numpy()
        return df

    L, R = mk(0), mk(1)
    got = (interval_join(rd.from_pandas(L), rd.from_pandas(R),
                         key="k", bucket_us=W)
           .to_pandas())
    got_pairs = sorted(zip(got["id"], got["id_r"]))

    lv = L.dropna(subset=["k", "s", "e"]); lv = lv[lv["s"] <= lv["e"]]
    rv = R.dropna(subset=["k", "s", "e"]); rv = rv[rv["s"] <= rv["e"]]
    m = lv.merge(rv, on="k", suffixes=("", "_r"))
    m = m[(m["s"] <= m["e_r"]) & (m["s_r"] <= m["e"])]
    want_pairs = sorted(zip(m["id"], m["id_r"]))
    assert got_pairs == want_pairs
    assert len(got_pairs) == len(set(got_pairs))      # exactly-once
    assert len(got_pairs) > 100                       # non-degenerate


def test_triangle_count_operator_matches_bruteforce(ray_session):
    """Degree-oriented triangle_count == brute-force enumeration on a
    random graph with parallel/reversed/self-loop noise, and on a star
    graph (hub of 60) where the hub's out-degree must be 0 under the
    orientation, so correctness there proves celebrity safety."""
    from itertools import combinations

    import ray.data as rd

    from bb_ocr_ray.stages.graph import triangle_count

    rng = np.random.RandomState(5)
    u = rng.randint(0, 60, 500)
    v = rng.randint(0, 60, 500)
    noisy = pd.DataFrame({
        "src": np.concatenate([u, v, u[:50], np.arange(10)]),
        "dst": np.concatenate([v, u, v[:50], np.arange(10)]),
    }).astype("int64")

    def brute(df):
        es = {(min(a, b), max(a, b))
              for a, b in zip(df["src"], df["dst"]) if a != b}
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        tri = set()
        for x in adj:
            for y, z in combinations(sorted(adj[x]), 2):
                if (min(y, z), max(y, z)) in es:
                    tri.add(tuple(sorted((x, y, z))))
        return sorted(tri)

    got = triangle_count(rd.from_pandas(noisy)).to_pandas()
    got_t = sorted(zip(got["a"], got["b"], got["c"]))
    want = brute(noisy)
    assert got_t == want
    assert len(got_t) == len(set(got_t))
    assert len(want) > 20          # non-degenerate

    # star: hub 0 -- leaves 1..60, plus 8 leaf-leaf chords
    leaves = np.arange(1, 61, dtype="int64")
    star = pd.DataFrame({
        "src": np.concatenate([np.zeros(60, dtype="int64"),
                               leaves[:8]]),
        "dst": np.concatenate([leaves, leaves[1:9]])})
    got2 = triangle_count(rd.from_pandas(star)).to_pandas()
    got2_t = sorted(zip(got2["a"], got2["b"], got2["c"]))
    assert got2_t == brute(star)
    assert len(got2_t) == 8        # one triangle per chord


def test_triangle_count_degree_paths_agree(ray_session):
    """The size-gated degree attachment (broadcast searchsorted vs two
    hash joins) is a pure plan choice: forcing the hash path with a
    0-byte gate must yield the identical triangle set."""
    import ray.data as rd

    from bb_ocr_ray.stages.graph import triangle_count

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "src": rng.randint(0, 80, 700),
        "dst": rng.randint(0, 80, 700)}).astype("int64")

    bcast = triangle_count(rd.from_pandas(df)).to_pandas()
    joined = triangle_count(rd.from_pandas(df),
                            degree_broadcast_limit=0).to_pandas()
    key = lambda t: sorted(zip(t["a"], t["b"], t["c"]))  # noqa: E731
    assert key(bcast) == key(joined)
    assert len(bcast) > 20          # non-degenerate


def test_seed_distance_matches_numpy_bfs(ray_session, sf_tiny):
    """q_seed_distance == a direct numpy/dict BFS over the same
    existence-checked DAG (min hop from any seed, capped)."""
    from collections import deque

    import pyarrow.parquet as pq

    from bb_ocr_ray.pipelines.queries import q_seed_distance

    got = q_seed_distance(sf_tiny)

    ids = set(pq.read_table(f"{sf_tiny}/documents.parquet",
                            columns=["doc_id"])["doc_id"].to_pylist())
    adj = {}
    for d in ids:
        if (d * d + 3 * d) % 11 >= 3 and d + 1 in ids:
            adj.setdefault(d, []).append(d + 1)
        if (7 * d + 5) % 13 >= 4 and d + 2 in ids:
            adj.setdefault(d, []).append(d + 2)
    dist = {d: 0 for d in ids if d % 97 == 0}
    q = deque(dist)
    while q:
        u = q.popleft()
        if dist[u] >= 8:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    want = sorted(dist.items())
    assert list(zip(got["node"], got["dist"])) == want
    assert got["dist"].max() >= 2          # real multi-hop propagation


def test_bucketed_join_pins_dtypes(ray_session):
    """VERDICT r4 item 3: int64 keys/payloads survive the bucketed
    join's emit boundary on BOTH block paths.  Ray's sort shuffle
    rebuilds group blocks through pandas, so a column that is null on
    one union side (padding) or in some rows (outer join) degrades to
    float64/object unless the emit re-casts — the q_boilerplate plan
    showed `doc_id: int64 -> object` in the driver bench tail."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bb_ocr_ray.stages.joins import hash_join

    n = 2000
    # pandas block path (object key column)
    left = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "k": [f"s{i % 7}\x1fh{i % 50}" for i in range(n)],
    })
    right = pd.DataFrame({
        "k": [f"s{i % 7}\x1fh{i}" for i in range(30)],
        "_bp": np.ones(30, dtype=np.int64),
    })
    out = hash_join(rd.from_pandas(left).repartition(8),
                    rd.from_pandas(right).repartition(2),
                    on="k", how="left").to_pandas()
    assert len(out) == n
    assert out["doc_id"].dtype == np.int64      # was object pre-pin
    # right-side int col with unmatched rows: pandas float64 convention
    assert out["_bp"].dtype == np.float64
    assert out.loc[out["_bp"].notna(), "_bp"].eq(1.0).all()

    # Arrow block path (all-int schemas): even an INNER join degrades
    # payload cols pre-fix, because the union pads each side's missing
    # columns with nulls and the shuffle rebuild upcasts them
    lint = pd.DataFrame({"a": np.arange(n, dtype=np.int64),
                         "v": np.arange(n, dtype=np.int64) * 2})
    rint = pd.DataFrame({"a": np.arange(30, dtype=np.int64),
                         "w": np.arange(30, dtype=np.int64)})
    ds = hash_join(rd.from_pandas(lint).repartition(8),
                   rd.from_pandas(rint).repartition(2),
                   on="a", how="inner")
    types = dict(zip(ds.schema().names,
                     [str(t) for t in ds.schema().types]))
    assert types["v"] == "int64", types
    assert types["w"] == "int64", types
    got = ds.to_pandas().sort_values("a").reset_index(drop=True)
    assert got["a"].tolist() == list(range(30))
    assert got["w"].tolist() == list(range(30))


def test_pagerank_rank_broadcast_gate_paths_agree(ray_session):
    """VERDICT r4 item 6: the per-iteration join shape is size-gated
    on the rank vector.  Forced-hash and default-broadcast paths must
    produce the same ranks (within float summation-order drift far
    below the 6dp oracle grain) and report their gate choice."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bb_ocr_ray.stages.graph import pagerank

    rng = np.random.RandomState(7)
    edges = pd.DataFrame({
        "src": rng.randint(0, 400, 3000).astype("int64"),
        "dst": rng.randint(0, 450, 3000).astype("int64")})

    choices = []
    fast = (pagerank(rd.from_pandas(edges).repartition(4), iters=6,
                     _on_choice=choices.append)
            .to_pandas().sort_values("node").reset_index(drop=True))
    slow = (pagerank(rd.from_pandas(edges).repartition(4), iters=6,
                     rank_broadcast_limit=0, _on_choice=choices.append)
            .to_pandas().sort_values("node").reset_index(drop=True))
    assert choices == ["broadcast", "hash"]
    assert fast["node"].tolist() == slow["node"].tolist()
    np.testing.assert_allclose(fast["rank"].to_numpy(),
                               slow["rank"].to_numpy(),
                               rtol=0, atol=1e-12)


def test_heavy_hitters_exact_vs_pandas(ray_session):
    """Two-pass heavy hitters == the exact pandas answer, on a skewed
    corpus with warm keys that clear per-batch bars in SOME batches
    but must be cut by the exact global filter; both membership paths
    (broadcast / forced hash) agree; NULLs drop."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bb_ocr_ray.stages.heavy import heavy_hitters

    rng = np.random.RandomState(11)
    n = 30_000
    r = rng.rand(n)
    keys = np.where(
        r < 0.5, rng.choice([f"hot{i}" for i in range(7)], n),
        np.where(r < 0.75, rng.choice([f"warm{i}" for i in range(80)], n),
                 np.char.add("cold", np.arange(n).astype(str))))
    df = pd.DataFrame({"key": keys.astype(object)})
    df.loc[::997, "key"] = None                      # NULLs drop

    k = 40
    s = df["key"].dropna()
    vc = s.value_counts()
    want = vc[vc.to_numpy() * k > len(s)].sort_index()

    choices = []
    got = (heavy_hitters(rd.from_pandas(df).repartition(16), "key", k=k,
                         _on_choice=choices.append)
           .to_pandas().sort_values("key").reset_index(drop=True))
    assert got["key"].tolist() == want.index.tolist()
    assert got["n"].tolist() == want.to_numpy().tolist()
    # hot keys found, warm/cold keys cut
    assert all(key.startswith("hot") for key in got["key"])

    got2 = (heavy_hitters(rd.from_pandas(df).repartition(16), "key", k=k,
                          broadcast_limit=1, _on_choice=choices.append)
            .to_pandas().sort_values("key").reset_index(drop=True))
    assert choices == ["broadcast", "hash"]
    assert got2["key"].tolist() == got["key"].tolist()
    assert got2["n"].tolist() == got["n"].tolist()

    # empty / all-null inputs yield zero rows, no crash
    empty = heavy_hitters(
        rd.from_pandas(pd.DataFrame({"key": pd.Series([None, None],
                                                      dtype="object")})),
        "key", k=5).to_pandas()
    assert len(empty) == 0


def test_hits_matches_numpy_and_gate_paths_agree(ray_session):
    """HITS == dense numpy reference (same sweep order: a from old h,
    normalize, h from NEW a, normalize); forced-hash path equals the
    default broadcast path; dangling/source-only nodes hold 0."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bb_ocr_ray.stages.graph import hits

    rng = np.random.RandomState(5)
    n = 120
    edges = pd.DataFrame({
        "src": rng.randint(0, n, 600).astype("int64"),
        "dst": rng.randint(0, n + 20, 600).astype("int64")})  # 20 sinks

    nodes = np.unique(np.concatenate([edges["src"], edges["dst"]]))
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in zip(edges["src"], edges["dst"]):
        A[idx[s], idx[d]] += 1.0          # parallel edges carry weight
    h = np.ones(len(nodes))
    for _ in range(5):
        a = A.T @ h
        nrm = np.sqrt((a ** 2).sum())
        a = a / nrm if nrm > 0 else a
        h = A @ a
        nrm = np.sqrt((h ** 2).sum())
        h = h / nrm if nrm > 0 else h

    choices = []
    got = (hits(rd.from_pandas(edges).repartition(4), iters=5,
                _on_choice=choices.append)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert got["node"].tolist() == nodes.tolist()
    np.testing.assert_allclose(got["authority"].to_numpy(), a,
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(got["hub"].to_numpy(), h,
                               rtol=0, atol=1e-9)
    # sinks never emit: hub == 0 exactly for ids >= n present as dst
    sinks = got[got["node"] >= n]
    assert len(sinks) and (sinks["hub"] == 0.0).all()

    forced = (hits(rd.from_pandas(edges).repartition(4), iters=5,
                   vec_broadcast_limit=0, _on_choice=choices.append)
              .to_pandas().sort_values("node").reset_index(drop=True))
    assert choices == ["broadcast", "hash"]
    np.testing.assert_allclose(forced["authority"].to_numpy(),
                               got["authority"].to_numpy(),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(forced["hub"].to_numpy(),
                               got["hub"].to_numpy(), rtol=0, atol=1e-12)


def test_covisit_hot_user_capped(ray_session, tmp_path):
    """The degree cap: a power user touching 100 items contributes
    pairs only among their 12 smallest; normal users' pairs count
    exactly.  Differential vs pandas on a synthetic events table."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bb_ocr_ray.pipelines.queries import q_covisit

    rows = []
    eid = 0
    # hot user 1: events mapping to 100 distinct items (item=eid%251)
    for i in range(100):
        rows.append((eid + i, 1))
    eid += 100
    # 30 normal users each hitting items {3, 7} (eid%251 == 3 or 7)
    for u in range(2, 32):
        rows.append((251 * u + 3, u))
        rows.append((251 * u + 7, u))
    # a NULL user with events: must not contribute
    rows.append((3, None))
    rows.append((7, None))
    df = pd.DataFrame(rows, columns=["event_id", "user_id"])
    pq.write_table(pa.table({
        "event_id": pa.array(df["event_id"], "int64"),
        "user_id": pa.array(df["user_id"], "int64")}),
        f"{tmp_path}/events.parquet")

    got = q_covisit(str(tmp_path), cap=12, min_count=1)

    # pandas reference with the same cap rule
    e = df.dropna(subset=["user_id"]).copy()
    e["u"] = e["user_id"].astype("int64")
    e["item"] = e["event_id"].astype("int64") % 251
    e = e[["u", "item"]].drop_duplicates().sort_values(["u", "item"])
    e["rn"] = e.groupby("u").cumcount() + 1
    k = e[e["rn"] <= 12]
    m = k.merge(k, on="u")
    m = m[m["item_x"] < m["item_y"]]
    want = (m.groupby(["item_x", "item_y"], as_index=False).size()
            .rename(columns={"item_x": "i1", "item_y": "i2", "size": "n"})
            .sort_values(["i1", "i2"]).reset_index(drop=True))
    assert got[["i1", "i2"]].values.tolist() == want[["i1", "i2"]].values.tolist()
    assert got["n"].tolist() == want["n"].tolist()
    # the hot user contributed exactly C(12,2) = 66 pairs (items
    # 0..11), not C(100,2); one of them — (3, 7) — merges with the 30
    # normal users, so 65 pairs sit at count 1 and (3, 7) at 31
    assert len(got) == 66
    assert len(got[got["n"] == 1]) == 65
    assert int(got.loc[(got["i1"] == 3) & (got["i2"] == 7), "n"]) == 31
    assert got["i1"].max() <= 11 and got["i2"].max() <= 11  # cap bound


def test_funnel_window_and_tie_semantics(ray_session, tmp_path):
    """Hand-computed funnel outcomes: window expiry demotes, ties on
    ts resolve by event_id, NULL users drop, greedy earliest-view
    anchoring (a later view cannot re-arm the window)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bb_ocr_ray.pipelines.queries import q_funnel_windowed

    T0 = np.datetime64("2024-01-01T00:00:00", "us")
    H = np.timedelta64(3600 * 1_000_000, "us")
    rows = [
        # u1: view, click +1h, purchase +2h  -> purchase
        (1, T0, 1, "view"), (2, T0 + H, 1, "click"),
        (3, T0 + 2 * H, 1, "purchase"),
        # u2: view, click +30h (window expired) -> view
        (4, T0, 2, "view"), (5, T0 + 30 * H, 2, "click"),
        # u3: click before view, none after -> view
        (6, T0, 3, "click"), (7, T0 + H, 3, "view"),
        # u4: no view at all -> none
        (8, T0, 4, "click"), (9, T0 + H, 4, "purchase"),
        # u5: tie ts: view(eid=10), click(eid=11) same ts -> click
        # counts (event_id orders it after), purchase 30h later: expired
        (10, T0, 5, "view"), (11, T0, 5, "click"),
        (12, T0 + 30 * H, 5, "purchase"),
        # u6: GREEDY anchor — first view's 24h window misses the
        # click, a second view 20h later would catch it, but the
        # anchor never re-arms -> view
        (13, T0, 6, "view"), (14, T0 + 20 * H, 6, "view"),
        (15, T0 + 25 * H, 6, "click"),
        # null user: dropped entirely
        (16, T0, None, "view"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    pq.write_table(pa.table({
        "event_id": pa.array(df["event_id"], "int64"),
        "ts": pa.array(df["ts"]),
        "user_id": pa.array(df["user_id"], "int64"),
        "event_type": pa.array(df["event_type"], "string")}),
        f"{tmp_path}/events.parquet")

    got = q_funnel_windowed(str(tmp_path))
    want = {"purchase": 1, "click": 1, "view": 3, "none": 1}
    assert dict(zip(got["stage"], got["n_users"])) == want


def test_kth_smallest_matches_numpy(ray_session):
    """Histogram-narrowing selection == numpy partition across k
    sweep, duplicates, negatives, constant columns, NaNs, a
    collapsed-width interval (collect_cap=1 forces deep narrowing),
    and out-of-range k."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from bb_ocr_ray.stages.selection import kth_smallest

    rng = np.random.RandomState(3)
    v = np.concatenate([rng.randn(4000) * 100,
                        np.repeat(-7.25, 500),          # heavy duplicate
                        rng.randint(-5, 5, 500).astype(float)])
    df = pd.DataFrame({"value": v})
    df.loc[::97, "value"] = np.nan                      # NaNs excluded
    ds = rd.from_pandas(df).repartition(8)
    clean = np.sort(df["value"].dropna().to_numpy())
    for k in (1, 2, 17, len(clean) // 2, len(clean) - 1, len(clean)):
        got = kth_smallest(ds, "value", k, n_buckets=16)
        assert got == clean[k - 1], k
    # tiny collect cap: forces narrowing to float-resolution intervals
    got = kth_smallest(ds, "value", len(clean) // 3, n_buckets=8,
                       collect_cap=1)
    assert got == clean[len(clean) // 3 - 1]
    # constant column
    const = rd.from_pandas(pd.DataFrame({"value": np.full(100, 3.5)}))
    assert kth_smallest(const, "value", 50) == 3.5
    with pytest.raises(ValueError):
        kth_smallest(ds, "value", len(clean) + 1)
    with pytest.raises(ValueError):
        kth_smallest(ds, "value", 0)


def test_zorder_locality_property():
    """Morton keys interleave correctly (hand-checked values) and
    deliver the locality they promise: points in a small 2-D box span
    a far smaller zkey range than the same count of random points."""
    import numpy as np

    from bb_ocr_ray.pipelines.queries import _part1by1_u16

    # hand-checked spreads
    assert _part1by1_u16(np.array([0b1011]))[0] == 0b1000101
    assert _part1by1_u16(np.array([0xFFFF]))[0] == 0x55555555

    def zkey(a, c):
        return (_part1by1_u16(a).astype(np.uint64)
                | (_part1by1_u16(c).astype(np.uint64) << np.uint64(1)))

    # interleave identity: zkey(a, c) bits alternate a/c
    z = int(zkey(np.array([0b101]), np.array([0b011]))[0])
    # a=101, c=011 -> bits (lsb first) a0=1 c0=1 a1=0 c1=1 a2=1 c2=0
    assert z == 0b011011

    rng = np.random.RandomState(0)
    box_a = rng.randint(1000, 1032, 200).astype(np.uint32)
    box_c = rng.randint(2000, 2032, 200).astype(np.uint32)
    rand_a = rng.randint(0, 65536, 200).astype(np.uint32)
    rand_c = rng.randint(0, 65536, 200).astype(np.uint32)
    zbox = zkey(box_a, box_c)
    zrand = zkey(rand_a, rand_c)
    spread_box = int(zbox.max() - zbox.min())
    spread_rand = int(zrand.max() - zrand.min())
    assert spread_box * 100 < spread_rand    # locality: >100x tighter


def test_seed_distance_gate_paths_agree(ray_session, sf_tiny):
    """q_seed_distance's three loop shapes — pure driver-resident,
    mid-run spill to the distributed loop, and pure distributed —
    produce identical (node, dist) labelings, and the gate reports
    each path taken."""
    from bb_ocr_ray.pipelines.queries import q_seed_distance

    choices = []
    driver = q_seed_distance(sf_tiny, _on_choice=choices.append)
    assert choices == ["driver"]

    choices.clear()
    spill = q_seed_distance(sf_tiny, visited_broadcast_limit=500,
                            _on_choice=choices.append)
    assert choices == ["driver", "distributed"]

    choices.clear()
    dist = q_seed_distance(sf_tiny, visited_broadcast_limit=0,
                           _on_choice=choices.append)
    assert choices == ["distributed"]

    for other in (spill, dist):
        assert driver["node"].tolist() == other["node"].tolist()
        assert driver["dist"].tolist() == other["dist"].tolist()
    assert len(driver) > 10 and driver["dist"].max() >= 2
