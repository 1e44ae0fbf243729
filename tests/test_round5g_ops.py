"""Round-5 sixth-session batch-C differentials: Heaps vocab growth vs
set-prefix counting, shard balance vs per-domain hashing, prefix
cluster sizes vs Counter arithmetic, and RFM cells vs a pandas
groupby."""
import numpy as np
import pandas as pd

from bb_ocr_ray.functions.hashing import stable_u64, ws_tokens


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


# ---------------------------------------------------------- vocab growth
def test_vocab_growth_matches_prefix_sets(ray_session, tmp_path):
    rng = np.random.RandomState(4)
    vocab = [f"w{i}" for i in range(500)]
    n = 600
    # later docs draw from a wider vocabulary slice: growth is real
    texts = [" ".join(rng.choice(vocab[: 20 + d], size=12))
             for d in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                       "text": texts, "lang": "en", "source": "s",
                       "n_chars": [len(t) for t in texts]})
    sf = _write(tmp_path, documents=df)

    from bb_ocr_ray.pipelines.queries import q_vocab_growth
    got = q_vocab_growth(sf)

    for _, r in got.iterrows():
        prefix = set()
        for d in range(min(2 ** r["k"], n)):
            prefix.update(ws_tokens(texts[d]))
        assert r["vocab"] == len(prefix), r["k"]
    assert list(got["k"]) == list(range(len(got)))
    assert int(got["new_tokens"].sum()) == int(got["vocab"].iloc[-1])
    assert got["vocab"].is_monotonic_increasing
    assert got["vocab"].iloc[-1] > got["vocab"].iloc[0]   # real growth


# ---------------------------------------------------------- shard balance
def test_shard_balance_matches_per_domain_hash(ray_session, tmp_path):
    n = 3000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                       "text": "x", "lang": "en", "source": "s",
                       "n_chars": np.int64(1)})
    sf = _write(tmp_path, documents=df)

    from bb_ocr_ray.pipelines.queries import q_shard_balance
    got = q_shard_balance(sf)

    from collections import Counter
    dom_docs: Counter = Counter()
    for d in range(n):
        m = d % 10
        dom = "hot.example.com" if m < 3 else f"site{m}.example.com"
        dom_docs[dom] += 1
    shards: dict = {}
    for dom, c in dom_docs.items():
        s = stable_u64(dom) % 8
        nd, nc = shards.get(s, (0, 0))
        shards[s] = (nd + 1, nc + c)
    assert list(got["shard"]) == sorted(shards)
    for _, r in got.iterrows():
        assert (r["n_domains"], r["n_docs"]) == shards[r["shard"]]
    assert int(got["n_docs"].sum()) == n
    assert int(got["n_domains"].sum()) == 8     # hot + site3..site9
    # the hot domain's shard is visibly heavier than a balanced split
    assert got["n_docs"].max() >= 0.3 * n


# ----------------------------------------------------- prefix clusters
def test_dup_cluster_sizes_matches_counter(ray_session, tmp_path):
    texts = (["shared prefix " + "x" * 60] * 5          # one cluster of 5
             + ["another lead-in " + "y" * 60] * 3      # one of 3
             + [f"unique {i} " + "z" * 60 for i in range(10)])
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts, "lang": "en", "source": "s",
                       "n_chars": [len(t) for t in texts]})
    sf = _write(tmp_path, documents=df)

    from bb_ocr_ray.pipelines.queries import q_dup_cluster_sizes
    got = q_dup_cluster_sizes(sf).set_index("cluster_size")

    from collections import Counter
    c = Counter(t[:64] for t in texts)
    sizes = Counter(c.values())
    assert set(got.index) == set(sizes)
    for sz, n_cl in sizes.items():
        assert got.loc[sz, "n_clusters"] == n_cl
        assert got.loc[sz, "n_docs"] == sz * n_cl
    assert int(got["n_docs"].sum()) == len(texts)


# ------------------------------------------------------------------ RFM
def test_rfm_matches_pandas_reference(ray_session, tmp_path):
    rng = np.random.RandomState(18)
    n = 4000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.randint(0, 250, n).astype("int64"),
        "event_type": rng.choice(["purchase", "view"], n, p=[0.4, 0.6]),
        "value": np.round(rng.gamma(2.0, 25.0, n) + 0.01, 2),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 90 * 86400, n), unit="s")})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_rfm
    got = q_rfm(sf)

    p = ev[ev["event_type"] == "purchase"].copy()
    p["day"] = (p["ts"].astype("datetime64[us]").astype("int64")
                // 86_400_000_000)
    p["cents"] = np.rint(p["value"].to_numpy() * 100).astype("int64")
    md = int(p["day"].max())
    pu = p.groupby("user_id").agg(last_day=("day", "max"),
                                  f=("cents", "size"),
                                  cents=("cents", "sum"))
    cells = pd.DataFrame({
        "r_band": (md - pu["last_day"]) // 7,
        "f_band": [int(x).bit_length() for x in pu["f"]],
        "m_band": [(int(x) // 100).bit_length() for x in pu["cents"]]})
    want = (cells.groupby(["r_band", "f_band", "m_band"])
            .size().rename("n_users").reset_index()
            .sort_values(["r_band", "f_band", "m_band"])
            .reset_index(drop=True).astype("int64"))
    pd.testing.assert_frame_equal(got, want)
    assert int(got["n_users"].sum()) == p["user_id"].nunique()
