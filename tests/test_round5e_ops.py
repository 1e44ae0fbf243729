"""Round-5 sixth-session batch-A differentials: Gini vs the sorted
rank formula, new/returning users vs a pandas reference, last-touch
attribution vs a per-user brute-force scan (plus hand-built edge
cases), Zipf slope vs numpy polyfit on planted frequencies, and the
per-source dup ratio vs Counter arithmetic."""
import numpy as np
import pandas as pd

from bb_ocr_ray.functions.hashing import ws_tokens


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


# --------------------------------------------------------------- Gini
def test_gini_matches_rank_formula(ray_session, tmp_path):
    rng = np.random.RandomState(12)
    uid = rng.zipf(1.6, 8000)
    uid = np.concatenate([uid, np.arange(10_000, 10_050)])  # singletons
    ev = pd.DataFrame({"event_id": np.arange(len(uid), dtype="int64"),
                       "user_id": uid.astype("int64")})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_gini
    got = q_gini(sf)

    c = np.sort(pd.Series(uid).value_counts().to_numpy())
    n, tot = len(c), int(c.sum())
    sic = int((np.arange(1, n + 1, dtype=object) * c.astype(object)).sum())
    want = (2 * sic - (n + 1) * tot) / (n * tot)
    assert int(got["n_users"].iloc[0]) == n
    assert int(got["n_events"].iloc[0]) == tot
    assert abs(got["gini"].iloc[0] - want) < 1e-6
    assert 0.3 < got["gini"].iloc[0] < 1.0     # zipf traffic is unequal


def test_gini_uniform_traffic_is_zero(ray_session, tmp_path):
    uid = np.repeat(np.arange(40, dtype="int64"), 5)   # 5 events each
    ev = pd.DataFrame({"event_id": np.arange(len(uid), dtype="int64"),
                       "user_id": uid})
    sf = _write(tmp_path, events=ev)
    from bb_ocr_ray.pipelines.queries import q_gini
    assert q_gini(sf)["gini"].iloc[0] == 0.0


# ------------------------------------------------- new-vs-returning users
def test_new_users_matches_pandas_reference(ray_session, tmp_path):
    rng = np.random.RandomState(3)
    n = 4000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.randint(0, 300, n).astype("float64"),
        "ts": pd.Timestamp("2024-03-01")
        + pd.to_timedelta(rng.randint(0, 20 * 86400, n), unit="s")})
    ev.loc[::29, "user_id"] = np.nan            # nulls drop
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_new_users
    got = q_new_users(sf)

    d = ev.dropna(subset=["user_id"]).copy()
    d["u"] = d["user_id"].astype("int64")
    d["day"] = (d["ts"].astype("datetime64[us]").astype("int64")
                // 86_400_000_000)
    first = d.groupby("u")["day"].min()
    for _, r in got.iterrows():
        day = r["day"]
        active = d.loc[d["day"] == day, "u"].unique()
        new = sum(1 for u in active if first[u] == day)
        assert r["n_active"] == len(active)
        assert r["n_new"] == new
        assert r["n_returning"] == len(active) - new
    # day-partition invariant: every user is new exactly once
    assert int(got["n_new"].sum()) == d["u"].nunique()
    assert list(got["day"]) == sorted(got["day"])


# ---------------------------------------------------------- attribution
def test_attribution_edge_cases(ray_session, tmp_path):
    H = 3_600_000_000                       # 1h in us
    t0 = pd.Timestamp("2024-01-01").value // 1000
    rows = [
        # u1: click then purchase 1h later -> attributed
        (1, 100, "click",    t0),
        (2, 100, "purchase", t0 + H),
        # u2: in-window old click SHADOWED by out-of-window... no:
        # most recent click is 100h before purchase (outside 72h),
        # an older click 10h before it exists but is NOT most recent
        # -> unattributed (last-touch picks candidate first)
        (3, 200, "click",    t0),
        (4, 200, "click",    t0 + 10 * H),
        (5, 200, "purchase", t0 + 110 * H),
        # u3: purchase with no clicks -> unattributed
        (6, 300, "purchase", t0),
        # u4: click at the SAME ts as purchase, smaller event_id ->
        # strictly before in (ts, event_id) order -> attributed, lag 0
        (7, 400, "click",    t0),
        (8, 400, "purchase", t0),
        # u5: purchase BEFORE its user's only click -> unattributed
        (10, 500, "purchase", t0),
        (11, 500, "click",    t0 + H),
        # u6: two purchases share one click; both within window
        (12, 600, "click",    t0),
        (13, 600, "purchase", t0 + H),
        (14, 600, "purchase", t0 + 2 * H),
        # noise: views are ignored entirely
        (15, 100, "view",     t0 + H // 2),
    ]
    ev = pd.DataFrame(rows, columns=["event_id", "user_id",
                                     "event_type", "t"])
    ev["ts"] = pd.to_datetime(ev.pop("t"), unit="us")
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_attribution
    got = q_attribution(sf).set_index("purchase_id")

    assert got.loc[2, "click_id"] == 1 and got.loc[2, "lag_us"] == H
    assert got.loc[5, "click_id"] == -1        # shadowing out-of-window
    assert got.loc[6, "click_id"] == -1        # no clicks at all
    assert got.loc[8, "click_id"] == 7 and got.loc[8, "lag_us"] == 0
    assert got.loc[10, "click_id"] == -1       # click only after
    assert got.loc[13, "click_id"] == 12
    assert got.loc[14, "click_id"] == 12
    assert len(got) == 7                       # one row per purchase


def test_attribution_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.RandomState(21)
    n = 3000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.randint(0, 150, n).astype("int64"),
        "event_type": rng.choice(["click", "purchase", "view"], n,
                                 p=[0.5, 0.2, 0.3]),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 30 * 86400, n), unit="s")})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_attribution
    got = q_attribution(sf)

    W = 72 * 3600 * 1_000_000
    d = ev[ev["event_type"].isin(["click", "purchase"])].copy()
    d["t"] = d["ts"].astype("datetime64[us]").astype("int64")
    want = {}
    for _, p in d[d["event_type"] == "purchase"].iterrows():
        cl = d[(d["event_type"] == "click")
               & (d["user_id"] == p["user_id"])]
        cl = cl[(cl["t"] < p["t"])
                | ((cl["t"] == p["t"]) & (cl["event_id"] < p["event_id"]))]
        if len(cl):
            best = cl.sort_values(["t", "event_id"]).iloc[-1]
            lag = p["t"] - best["t"]
            want[p["event_id"]] = ((best["event_id"], lag)
                                   if lag <= W else (-1, -1))
        else:
            want[p["event_id"]] = (-1, -1)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert (r["click_id"], r["lag_us"]) == want[r["purchase_id"]]
    assert (got["click_id"] >= 0).any() and (got["click_id"] == -1).any()


# ------------------------------------------------------------ Zipf slope
def test_zipf_slope_matches_polyfit_on_planted_freqs(ray_session,
                                                     tmp_path):
    # token w{i} appears exactly round(5000 / (i+1)) times: slope ~ -1
    freqs = [max(1, round(5000 / (i + 1))) for i in range(250)]
    bag = []
    for i, f in enumerate(freqs):
        bag += [f"w{i:03d}"] * f
    rng = np.random.RandomState(7)
    rng.shuffle(bag)
    texts = [" ".join(bag[i::400]) for i in range(400)]
    df = pd.DataFrame({"doc_id": np.arange(400, dtype="int64"),
                       "text": texts, "lang": "en", "source": "s",
                       "n_chars": [len(t) for t in texts]})
    sf = _write(tmp_path, documents=df)

    from bb_ocr_ray.pipelines.queries import q_zipf_slope
    got = q_zipf_slope(sf)

    from collections import Counter
    cnt = Counter()
    for t in texts:
        cnt.update(ws_tokens(t))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    y = np.log([n for _, n in top])
    x = np.log(np.arange(1, len(top) + 1))
    slope = np.polyfit(x, y, 1)[0]
    assert int(got["k"].iloc[0]) == 200
    assert int(got["n_top1"].iloc[0]) == top[0][1]
    assert int(got["n_top_last"].iloc[0]) == top[-1][1]
    assert abs(got["zipf_slope"].iloc[0] - slope) < 1e-5
    assert -1.1 < got["zipf_slope"].iloc[0] < -0.9   # planted Zipf -1


# ------------------------------------------------------------ dup ratio
def test_dup_ratio_matches_counter_reference(ray_session, tmp_path):
    rng = np.random.RandomState(5)
    rows = []
    for s, (n_unique, n_dup_groups, copies) in {
            "clean": (200, 0, 0), "dirty": (100, 20, 4),
            "half": (50, 25, 2)}.items():
        for i in range(n_unique):
            rows.append((s, f"unique {s} {i}"))
        for g in range(n_dup_groups):
            rows += [(s, f"dup {s} {g}")] * copies
    rng.shuffle(rows)
    df = pd.DataFrame(rows, columns=["source", "text"])
    df["doc_id"] = np.arange(len(df), dtype="int64")
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len().astype("int64")
    sf = _write(tmp_path, documents=df)

    from bb_ocr_ray.pipelines.queries import q_dup_ratio
    got = q_dup_ratio(sf).set_index("source")

    from collections import Counter
    for s in ("clean", "dirty", "half"):
        c = Counter(t for src, t in rows if src == s)
        n_docs = sum(c.values())
        n_dup = sum(v for v in c.values() if v > 1)
        r = got.loc[s]
        assert r["n_docs"] == n_docs
        assert r["n_distinct"] == len(c)
        assert r["n_dup_docs"] == n_dup
        assert abs(r["dup_ratio"] - n_dup / n_docs) < 1e-6
    assert got.loc["clean", "dup_ratio"] == 0.0
    assert got.loc["dirty", "n_dup_docs"] == 80
