"""Round-5 sixth-session operator differentials: each new registry
entry vs an independently-coded (usually brute-force) reference on
hand-built inputs — Benford digits vs string-slicing, entropy /
Simpson / chi-squared vs closed forms, MAD vs numpy's interpolating
median, Mann-Whitney vs the O(na*nb) pairwise definition, the robots
gate vs a per-row loop, market-basket rules vs Counter enumeration,
and the clustering coefficient vs adjacency-set counting."""
import math
from collections import Counter

import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


def _docs(n, langs=("en",), sources=("s0",), seed=7):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "text": "x", "n_chars": np.int64(1),
        "lang": rng.choice(list(langs), n),
        "source": rng.choice(list(sources), n)})


# ------------------------------------------------------------- Benford
def test_benford_matches_string_reference(ray_session, tmp_path):
    rng = np.random.RandomState(2)
    # log-uniform magnitudes 0.01 .. 99999.99 → all nine digits appear
    p = np.round(10.0 ** rng.uniform(-2, 5, 4000), 2)
    p[:3] = [0.0, 0.01, 99999.99]          # zero row must be dropped
    sf = _write(tmp_path, orders=pd.DataFrame(
        {"o_orderkey": np.arange(len(p), dtype="int64"),
         "o_totalprice": p}))

    from bb_ocr_ray.pipelines.queries import q_benford
    got = q_benford(sf)

    cents = np.rint(p * 100).astype("int64")
    digs = [int(str(c)[0]) for c in cents if c > 0]
    cnt = Counter(digs)
    assert list(got["digit"]) == sorted(cnt)
    for _, r in got.iterrows():
        assert r["n"] == cnt[r["digit"]]
        assert abs(r["pct"] - cnt[r["digit"]] / len(digs)) < 1e-6
        assert abs(r["benford_pct"]
                   - math.log10(1 + 1 / r["digit"])) < 1e-6
    assert abs(got["pct"].sum() - 1.0) < 1e-4


# ------------------------------------------------- language-mix entropy
def test_lang_entropy_matches_closed_form(ray_session, tmp_path):
    df = _docs(3000, langs=("en", "de", "fr", "zz"),
               sources=("a", "b", "mono"))
    df.loc[df["source"] == "mono", "lang"] = "en"   # entropy exactly 0
    sf = _write(tmp_path, documents=df)

    from bb_ocr_ray.pipelines.queries import q_lang_entropy
    got = q_lang_entropy(sf)

    for _, r in got.iterrows():
        g = df[df["source"] == r["source"]]["lang"].value_counts()
        n = int(g.sum())
        h = sum(-(c / n) * math.log(c / n) for c in g)
        assert r["n_docs"] == n and r["n_langs"] == len(g)
        assert abs(r["entropy_nats"] - h) < 1e-6
    assert got.set_index("source").loc["mono", "entropy_nats"] == 0.0


# ------------------------------------------------- Simpson concentration
def test_user_concentration_matches_simpson(ray_session, tmp_path):
    rng = np.random.RandomState(4)
    uid = rng.zipf(1.7, 5000).astype("float64")
    uid[::17] = np.nan                       # nulls must be excluded
    ev = pd.DataFrame({
        "event_id": np.arange(len(uid), dtype="int64"),
        "user_id": uid})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_user_concentration
    got = q_user_concentration(sf)

    c = pd.Series(uid).dropna().astype("int64").value_counts()
    n = int(c.sum())
    s2 = int((c.astype(object) ** 2).sum())
    assert int(got["n_events"].iloc[0]) == n
    assert int(got["n_users"].iloc[0]) == len(c)
    assert abs(got["simpson"].iloc[0] - s2 / n ** 2) < 1e-6
    assert abs(got["eff_users"].iloc[0] - n ** 2 / s2) < 1e-4
    # zipf traffic: effective users far below distinct users
    assert got["eff_users"].iloc[0] < len(c) / 2


# --------------------------------------------------- chi-squared cells
def test_chi2_cells_completes_zero_cells(ray_session, tmp_path):
    df = _docs(2000, langs=("en", "de"), sources=("a", "b"))
    # make (de, b) a structurally absent cell
    df.loc[(df["lang"] == "de") & (df["source"] == "b"), "source"] = "a"
    sf = _write(tmp_path, documents=df)

    from bb_ocr_ray.pipelines.queries import q_chi2_cells
    got = q_chi2_cells(sf)

    assert len(got) == 4                     # full grid incl. zero cell
    rt = df["lang"].value_counts()
    ct = df["source"].value_counts()
    n = len(df)
    obs = df.groupby(["lang", "source"]).size()
    for _, r in got.iterrows():
        o = int(obs.get((r["lang"], r["source"]), 0))
        e = rt[r["lang"]] * ct[r["source"]] / n
        assert r["n_obs"] == o
        assert abs(r["expected"] - e) < 1e-5
        assert abs(r["chi2_term"] - (o - e) ** 2 / e) < 1e-5
    zero = got[(got["lang"] == "de") & (got["source"] == "b")]
    assert len(zero) == 1 and zero["n_obs"].iloc[0] == 0
    assert zero["chi2_term"].iloc[0] > 0


# ------------------------------------------------------------ grouped MAD
def test_mad_matches_numpy_interpolating_median(ray_session, tmp_path):
    rng = np.random.RandomState(9)
    n = 5001                                  # odd AND even group sizes
    li = pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_extendedprice": np.round(rng.gamma(3.0, 900.0, n) + 0.01, 2)})
    sf = _write(tmp_path, lineitem=li)

    from bb_ocr_ray.pipelines.queries import q_mad
    got = q_mad(sf)

    for _, r in got.iterrows():
        cents = np.rint(
            li.loc[li["l_returnflag"] == r["l_returnflag"],
                   "l_extendedprice"].to_numpy() * 100).astype("int64")
        med = np.median(cents)
        mad = np.median(np.abs(cents - med))
        assert r["n_rows"] == len(cents)
        assert abs(r["median_price"] - med / 100.0) < 1e-9
        assert abs(r["mad_price"] - mad / 100.0) < 1e-9


# ---------------------------------------------------------- Mann-Whitney
def test_mannwhitney_matches_pairwise_definition(ray_session, tmp_path):
    rng = np.random.RandomState(6)
    n = 3000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.randint(0, 400, n).astype("int64"),
        "event_type": rng.choice(["view", "click"], n),
        # coarse grid → heavy ties, exercising the midrank path
        "value": np.round(rng.randint(0, 40, n) * 0.25, 2)})
    shift = (ev["event_type"] == "click") & (ev["user_id"] % 2 == 1)
    ev.loc[shift, "value"] += 3.0            # arm B dominates on clicks
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_mannwhitney
    got = q_mannwhitney(sf)

    cents = np.rint(ev["value"].to_numpy() * 100).astype("int64")
    arm = (ev["user_id"].to_numpy() % 2)
    for _, r in got.iterrows():
        m = ev["event_type"].to_numpy() == r["event_type"]
        a, b = cents[m & (arm == 0)], cents[m & (arm == 1)]
        gt = (a[:, None] > b[None, :]).sum()
        eq = (a[:, None] == b[None, :]).sum()
        u = gt + 0.5 * eq                     # the pairwise definition
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["u_a"] == float(u)
        assert abs(r["auc"] - u / (len(a) * len(b))) < 1e-6
    # the planted dominance: AUC(click) decisively below 1/2 for arm A
    assert got.set_index("event_type").loc["click", "auc"] < 0.35


# ----------------------------------------------------------- robots gate
def test_robots_filter_matches_per_row_loop(ray_session, tmp_path):
    n = 3000
    sf = _write(tmp_path, documents=_docs(n))

    from bb_ocr_ray.pipelines.queries import q_robots_filter
    got = q_robots_filter(sf)

    rules = {"site0.com": ("/p/1",), "site1.com": ("/p/7",),
             "site2.com": ("/p/3",)}
    ref: dict = {}
    for d in range(n):
        host = f"site{d % 3}.com"
        path = f"/p/{d // 16}"
        blocked = any(path.startswith(p) for p in rules[host])
        a, b = ref.get(host, (0, 0))
        ref[host] = (a + (not blocked), b + blocked)
    assert list(got["host"]) == sorted(ref)
    for _, r in got.iterrows():
        assert (r["n_allowed"], r["n_blocked"]) == ref[r["host"]]
    assert (got["n_blocked"] > 0).all()       # every host's rule fires


# --------------------------------------------------------- market basket
def test_market_basket_matches_counter_reference(ray_session, tmp_path):
    rng = np.random.RandomState(8)
    rows = []
    for o in range(600):
        for pk in rng.randint(0, 500, rng.randint(1, 8)):
            rows.append((o, int(pk)))
        if o % 2 == 0:                        # plant a frequent pair
            rows += [(o, 13), (o, 110)]       # both ≡ 13 (mod 97)? no:
            # 13 % 97 = 13, 110 % 97 = 13 → same item; use 13 and 111
    rows = [(o, pk if pk != 110 else 111) for o, pk in rows]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    li = li.astype("int64")
    sf = _write(tmp_path, lineitem=li)

    from bb_ocr_ray.pipelines.queries import q_market_basket
    got = q_market_basket(sf, min_support=20)

    baskets: dict = {}
    for o, pk in rows:
        baskets.setdefault(o, set()).add(pk % 97)
    item_cnt: Counter = Counter()
    pair_cnt: Counter = Counter()
    for items in baskets.values():
        s = sorted(items)
        item_cnt.update(s)
        for i, x in enumerate(s):
            for y in s[i + 1:]:
                pair_cnt[(x, y)] += 1
    n_orders = len(baskets)
    want = []
    for (x, y), sup in pair_cnt.items():
        if sup < 20:
            continue
        for a, c in ((x, y), (y, x)):
            want.append({"ante": a, "cons": c, "support": sup,
                         "confidence": sup / item_cnt[a],
                         "lift": sup * n_orders
                         / (item_cnt[a] * item_cnt[c])})
    want_df = (pd.DataFrame(want).sort_values(["ante", "cons"])
               .reset_index(drop=True))
    assert len(got) == len(want_df) > 0
    assert list(got["ante"]) == list(want_df["ante"])
    assert list(got["cons"]) == list(want_df["cons"])
    assert list(got["support"]) == list(want_df["support"])
    np.testing.assert_allclose(got["confidence"], want_df["confidence"],
                               atol=1e-6)
    np.testing.assert_allclose(got["lift"], want_df["lift"], atol=1e-6)
    # the planted pair (13, 111%97=14) is the strongest rule
    top = got.sort_values("support", ascending=False).iloc[0]
    assert {top["ante"], top["cons"]} == {13, 14}
    assert top["lift"] > 1.5


# ------------------------------------------------ clustering coefficient
def test_clustering_coeff_matches_adjacency_reference(ray_session,
                                                      tmp_path):
    n = 2500
    sf = _write(tmp_path, documents=_docs(n))

    from bb_ocr_ray.pipelines.queries import q_clustering_coeff
    got = q_clustering_coeff(sf)

    edges = set()
    ids = set(range(n))
    for d in range(n):
        if ((d * d + 3 * d) % 11) >= 3 and d + 1 in ids:
            edges.add((d, d + 1))
        if ((7 * d + 5) % 13) >= 4 and d + 2 in ids:
            edges.add((d, d + 2))
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    tri = sum(1 for (u, v) in edges
              for w in adj[u] & adj[v] if w > v)   # u < v < w once each
    # (u,v) ordered u<v already; require w>v so each triangle counts once
    assert int(got["n_triangles"].iloc[0]) == tri
    assert int(got["n_wedges"].iloc[0]) == wedges
    assert abs(got["global_cc"].iloc[0] - 3 * tri / wedges) < 1e-6
