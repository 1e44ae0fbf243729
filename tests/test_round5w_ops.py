"""Round-5 seventh-session batch-P differentials: rolling p95 vs a
direct window walk (spike days suppressed), and arrival rate via the
telescoping mean-gap identity vs explicit consecutive gaps."""
import math

import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


_DAY = 86_400_000_000


def _events(ts_us, event_type=None):
    n = len(ts_us)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(np.asarray(ts_us, dtype="int64"), unit="us"),
        "user_id": np.zeros(n, dtype="int64"),
        "event_type": event_type if event_type is not None
        else ["view"] * n,
        "value": 1.0, "props": "{}"})


# ----------------------------------------------------------- rolling median
def test_rolling_median_matches_window_walk(ray_session, tmp_path):
    counts = [100, 110, 90, 5000, 95, 105, 100, 98, 102, 97]  # one spike
    ts = []
    for d, c in enumerate(counts):
        ts += [d * _DAY + i * 1000 for i in range(c)]
    sf = _write(tmp_path, events=_events(ts))

    from bb_ocr_ray.pipelines.queries import q_rolling_median
    got = q_rolling_median(sf)

    n = np.array(counts)
    for i, r in got.iterrows():
        w = np.sort(n[max(0, i - 6):i + 1])
        want = int(w[math.ceil(0.5 * len(w)) - 1])
        assert int(r["med_7d"]) == want, i
        assert int(r["n"]) == counts[i]
    # the single spike day never moves the rolling median — the whole
    # point of the robust monitor
    assert (got["med_7d"] < 200).all()


# ------------------------------------------------------------- arrival rate
def test_arrival_rate_telescoping_identity(ray_session, tmp_path):
    rng = np.random.RandomState(6)
    ts_a = np.sort(rng.randint(0, 10 * _DAY, size=500))
    ts_b = np.array([0, 1_000_000, 3_000_000])     # gaps 1s, 2s
    ts = np.concatenate([ts_a, ts_b])
    et = ["click"] * len(ts_a) + ["view"] * len(ts_b)
    sf = _write(tmp_path, events=_events(ts, event_type=et))

    from bb_ocr_ray.pipelines.queries import q_arrival_rate
    got = q_arrival_rate(sf).set_index("event_type")

    # telescoping: mean gap == span/(n-1) == mean of explicit gaps
    gaps = np.diff(ts_a)
    assert int(got.loc["click", "span_us"]) == int(ts_a[-1] - ts_a[0])
    assert int(got.loc["click", "mean_gap_us"]) == \
        int((ts_a[-1] - ts_a[0]) // (len(ts_a) - 1))
    assert abs(int(got.loc["click", "mean_gap_us"])
               - int(gaps.mean())) <= 1          # integer floor
    # hand-checked small stream: span 3s, 2 gaps -> mean 1.5s
    assert int(got.loc["view", "mean_gap_us"]) == 1_500_000
    assert abs(got.loc["view", "per_hour"]
               - round(3_600_000_000 * 2 / 3_000_000, 6)) < 1e-9
