"""Round-5 sixth-session batch-B differentials: rolling 7-day
distinct actives vs a per-day brute-force set count, cohort LTV vs a
pandas merge, norm bands vs per-vector numpy norms, and the term scan
vs Python str.count."""
import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


# ----------------------------------------------------- rolling actives
def test_rolling_actives_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.RandomState(10)
    n = 4000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.randint(0, 120, n).astype("int64"),
        "ts": pd.Timestamp("2024-02-01")
        + pd.to_timedelta(rng.randint(0, 45 * 86400, n), unit="s")})
    # carve a silent gap so some windows straddle empty days
    day0 = ev["ts"].min().normalize()
    gap = (ev["ts"] >= day0 + pd.Timedelta(days=15)) & \
          (ev["ts"] < day0 + pd.Timedelta(days=24))
    ev = ev[~gap].reset_index(drop=True)
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_rolling_actives
    got = q_rolling_actives(sf)

    d = ev.copy()
    d["day"] = (d["ts"].astype("datetime64[us]").astype("int64")
                // 86_400_000_000)
    for _, r in got.iterrows():
        day = r["day"]
        dau = d.loc[d["day"] == day, "user_id"].nunique()
        mau7 = d.loc[d["day"].between(day - 6, day), "user_id"].nunique()
        assert r["dau"] == dau, day
        assert r["mau7"] == mau7, day
    assert set(got["day"]) == set(d["day"].unique())
    assert (got["mau7"] >= got["dau"]).all()


def test_rolling_actives_single_user_runs(ray_session, tmp_path):
    # one user active on days 0, 3, 20: [0,6]+[3,9] merge, [20,26] apart
    days = [0, 3, 20]
    ev = pd.DataFrame({
        "event_id": np.arange(3, dtype="int64"),
        "user_id": np.zeros(3, dtype="int64"),
        "ts": pd.Timestamp("1970-01-01")
        + pd.to_timedelta(days, unit="D")})
    sf = _write(tmp_path, events=ev)
    from bb_ocr_ray.pipelines.queries import q_rolling_actives
    got = q_rolling_actives(sf).set_index("day")
    assert list(got.index) == [0, 3, 20]
    assert got["mau7"].tolist() == [1, 1, 1]   # never double-counted
    assert got["dau"].tolist() == [1, 1, 1]


# ----------------------------------------------------------- cohort LTV
def test_cohort_ltv_matches_pandas_merge(ray_session, tmp_path):
    rng = np.random.RandomState(14)
    n = 5000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.randint(0, 200, n).astype("int64"),
        "event_type": rng.choice(["signup", "purchase", "view"], n,
                                 p=[0.1, 0.3, 0.6]),
        "value": np.round(rng.gamma(2.0, 30.0, n), 2),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 70 * 86400, n), unit="s")})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_cohort_ltv
    got = q_cohort_ltv(sf)

    d = ev.copy()
    d["week"] = (d["ts"].astype("datetime64[us]").astype("int64")
                 // (7 * 86_400_000_000))
    s = (d[d["event_type"] == "signup"].groupby("user_id")["week"]
         .min().rename("cohort_week"))
    p = d[d["event_type"] == "purchase"].copy()
    p["cents"] = np.rint(p["value"].to_numpy() * 100).astype("int64")
    m = p.merge(s, left_on="user_id", right_index=True)   # inner
    m["week_offset"] = m["week"] - m["cohort_week"]
    want = (m.groupby(["cohort_week", "week_offset"])
            .agg(n_purchases=("cents", "size"),
                 revenue_cents=("cents", "sum")).reset_index()
            .sort_values(["cohort_week", "week_offset"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want.astype("int64"))
    # purchases before the user's first signup appear as negative offsets
    assert (got["week_offset"] < 0).any()


# ----------------------------------------------------------- norm bands
def test_norm_bands_matches_numpy(ray_session, tmp_path):
    rng = np.random.RandomState(2)
    vecs = [rng.normal(0, 1, 64).astype("float32") for _ in range(300)]
    vecs += [np.zeros(64, dtype="float32")]              # zero vector
    vecs += [(rng.normal(0, 1, 64) * 5).astype("float32")]  # un-normalized
    emb = pd.DataFrame({"vec_id": np.arange(len(vecs), dtype="int64"),
                        "embedding": vecs,
                        "label": np.zeros(len(vecs), dtype="int32")})
    sf = _write(tmp_path, embeddings=emb)

    from bb_ocr_ray.pipelines.queries import q_norm_bands
    got = q_norm_bands(sf)

    norms = np.round([np.sqrt((v.astype("float64") ** 2).sum())
                      for v in vecs], 4)
    bands = np.floor(norms * 10).astype("int64")
    for _, r in got.iterrows():
        m = bands == r["band"]
        assert r["n_vecs"] == m.sum()
        assert abs(r["min_norm"] - norms[m].min()) < 1e-9
        assert abs(r["max_norm"] - norms[m].max()) < 1e-9
    assert int(got["n_vecs"].sum()) == len(vecs)
    assert 0 in set(got["band"])                 # the zero vector's band


# ------------------------------------------------------------ term scan
def test_term_scan_matches_str_count(ray_session, tmp_path):
    texts = ["the table has a hash table inside",
             "merge batch merge batch merge batch",
             "tabletable",                        # non-overlapping: 2
             "hashhashhash", "", None,
             "no match here"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts, "lang": "en", "source": "s",
                       "n_chars": [len(t or "") for t in texts]})
    sf = _write(tmp_path, documents=df)

    from bb_ocr_ray.pipelines.queries import (_TERM_SCAN_PATTERNS,
                                              q_term_scan)
    got = q_term_scan(sf).set_index("term")

    for pat in _TERM_SCAN_PATTERNS:
        counts = [(t or "").count(pat) for t in texts]
        assert got.loc[pat, "n_occurrences"] == sum(counts)
        assert got.loc[pat, "n_docs"] == sum(1 for c in counts if c > 0)
    assert got.loc["zzz-absent-term", "n_occurrences"] == 0   # zero row
    assert got.loc["table", "n_occurrences"] == 4             # 2 + 2
    assert got.loc["merge batch", "n_occurrences"] == 3
