"""Round-5 seventh-session batch-A differentials: streak islands vs
per-user set walking, burst peak vs an O(n^2) brute force (with a
planted cross-midnight window), anomaly days vs direct z-scores, and
lag-1 autocorrelation vs numpy on a planted alternating series."""
import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


def _events(ts_us, user_id=None, event_type=None, value=None):
    n = len(ts_us)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(np.asarray(ts_us, dtype="int64"), unit="us"),
        "user_id": np.asarray(
            user_id if user_id is not None else np.zeros(n), dtype="int64"),
        "event_type": (event_type if event_type is not None
                       else ["click"] * n),
        "value": np.asarray(
            value if value is not None else np.ones(n), dtype="float64"),
        "props": ["{}"] * n})


_DAY = 86_400_000_000
_HOUR = 3_600_000_000


# ------------------------------------------------------------------ streak
def test_streak_matches_per_user_walk(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    rows = []
    for u in range(40):
        days = sorted(rng.choice(60, size=rng.randint(1, 25),
                                 replace=False))
        for d in days:
            # several events inside the day: the distinct step matters
            for off in rng.randint(0, _DAY, size=rng.randint(1, 3)):
                rows.append((u, d * _DAY + int(off)))
    # planted exact shapes
    rows += [(100, d * _DAY) for d in range(5)]          # streak 5
    rows += [(101, d * _DAY) for d in (0, 2, 3)]         # streak 2
    rows += [(102, 7 * _DAY)]                            # streak 1
    us = np.array([r[1] for r in rows], dtype="int64")
    uid = np.array([r[0] for r in rows], dtype="int64")
    sf = _write(tmp_path, events=_events(us, user_id=uid))

    from bb_ocr_ray.pipelines.queries import q_streak
    got = q_streak(sf)

    # independent per-user walk
    best = {}
    for u in np.unique(uid):
        days = sorted(set(us[uid == u] // _DAY))
        run = mx = 1
        for a, b in zip(days, days[1:]):
            run = run + 1 if b == a + 1 else 1
            mx = max(mx, run)
        best[u] = mx
    want = pd.Series(list(best.values())).value_counts().sort_index()
    assert list(got["streak"]) == list(want.index)
    assert list(got["n_users"]) == list(want.values)
    assert int(got.loc[got["streak"] == 5, "n_users"].iloc[0]) >= 1


# -------------------------------------------------------------- burst peak
def test_burst_peak_matches_bruteforce_incl_midnight(ray_session, tmp_path):
    rng = np.random.RandomState(11)
    ts = list(rng.randint(0, 10 * _DAY, size=400))
    # planted burst CROSSING midnight of day 3: 12 events in [day4-30min,
    # day4+20min] — the replicate path must see the previous day's tail
    base = 4 * _DAY - 30 * 60 * 1_000_000
    ts += [base + i * 4 * 60 * 1_000_000 for i in range(12)]
    et = ["click"] * len(ts)
    # second type with its own small peak
    ts2 = [7 * _DAY + i * 10 * 60 * 1_000_000 for i in range(5)]
    ts, et = ts + ts2, et + ["view"] * len(ts2)
    us = np.array(ts, dtype="int64")
    sf = _write(tmp_path, events=_events(us, event_type=et))

    from bb_ocr_ray.pipelines.queries import q_burst_peak
    got = q_burst_peak(sf).set_index("event_type")

    for t in ("click", "view"):
        x = np.sort(us[np.array(et) == t])
        c = (np.searchsorted(x, x, side="right")
             - np.searchsorted(x, x - _HOUR, side="left"))
        peak = int(c.max())
        peak_day = int((x[c == peak] // _DAY).min())
        assert int(got.loc[t, "peak"]) == peak, t
        assert int(got.loc[t, "peak_day"]) == peak_day, t
    # the planted cross-midnight window is the real peak and spans 2 days
    assert int(got.loc["click", "peak"]) >= 12


# ------------------------------------------------------------ anomaly days
def test_anomaly_days_matches_direct_z(ray_session, tmp_path):
    counts = [100] * 20 + [500]          # one planted spike day
    ts = []
    for d, c in enumerate(counts):
        ts += [d * _DAY + i * 1000 for i in range(c)]
    sf = _write(tmp_path, events=_events(np.array(ts, dtype="int64")))

    from bb_ocr_ray.pipelines.queries import q_anomaly_days
    got = q_anomaly_days(sf)

    n = np.array(counts, dtype="float64")
    z = (n - n.mean()) / n.std(ddof=0)
    want_days = [d for d, v in enumerate(z) if abs(round(v, 6)) >= 2]
    assert list(got["day"]) == want_days
    for _, r in got.iterrows():
        assert r["n_events"] == counts[int(r["day"])]
        assert abs(r["z"] - round(z[int(r["day"])], 6)) < 1e-9
    assert 20 in list(got["day"])        # the spike is flagged


# --------------------------------------------------------------- autocorr
def test_autocorr_matches_numpy_on_alternating_series(ray_session, tmp_path):
    counts = [10, 200] * 8               # strong negative lag-1
    ts = []
    for d, c in enumerate(counts):
        ts += [d * _DAY + i * 7919 for i in range(c)]
    sf = _write(tmp_path, events=_events(np.array(ts, dtype="int64")))

    from bb_ocr_ray.pipelines.queries import q_autocorr
    got = q_autocorr(sf)

    n = np.array(counts, dtype="float64")
    want = float(np.corrcoef(n[:-1], n[1:])[0, 1])
    assert int(got["n_pairs"].iloc[0]) == len(counts) - 1
    assert abs(got["autocorr"].iloc[0] - round(want, 6)) < 1e-9
    assert got["autocorr"].iloc[0] < -0.9
