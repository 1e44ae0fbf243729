"""Round-5 seventh-session batch-I differentials: candidate-key
discovery on planted duplicate/NULL keys, and out-of-order rate on a
planted late-event stream."""
import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


# ------------------------------------------------------------ key discovery
def test_key_discovery_planted_duplicates_and_nulls(ray_session, tmp_path):
    # event_id unique; user_id repeats and contains NULL;
    # (user_id, ts) has one planted exact duplicate pair
    ev = pd.DataFrame({
        "event_id": np.arange(8, dtype="int64"),
        "ts": pd.to_datetime([0, 1, 2, 3, 3, 5, 6, 7], unit="us"),
        "user_id": pd.array([1, 1, 2, 3, 3, None, None, 4],
                            dtype="Int64"),
        "event_type": "view", "value": 1.0, "props": "{}"})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_key_discovery
    got = q_key_discovery(sf).set_index("candidate")

    assert int(got.loc["event_id", "n_distinct"]) == 8
    assert bool(got.loc["event_id", "is_key"])
    # distinct users: {1, 2, 3, 4, NULL} -> 5 (NULL counts once)
    assert int(got.loc["user_id", "n_distinct"]) == 5
    assert not bool(got.loc["user_id", "is_key"])
    # (user_id, ts): rows 3 and 4 are (3, t3) twice -> 7 distinct
    assert int(got.loc["user_id,ts", "n_distinct"]) == 7
    assert not bool(got.loc["user_id,ts", "is_key"])
    assert (got["n_rows"] == 8).all()


# ----------------------------------------------------------------- ooo rate
def test_ooo_rate_planted_late_events(ray_session, tmp_path):
    # user 0 ingest order: ts 10, 20, 15 (late!), 30  -> 1 ooo / 3 pairs
    # user 1 ingest order: ts 5, 4 (late), 3 (late)   -> 2 ooo / 2 pairs
    # user 2 single event -> no pairs
    rows = [(0, 0, 10), (0, 1, 20), (0, 2, 15), (0, 3, 30),
            (1, 4, 5), (1, 5, 4), (1, 6, 3),
            (2, 7, 100)]
    ev = pd.DataFrame({
        "event_id": np.array([r[1] for r in rows], dtype="int64"),
        "ts": pd.to_datetime([r[2] for r in rows], unit="us"),
        "user_id": np.array([r[0] for r in rows], dtype="int64"),
        "event_type": "view", "value": 1.0, "props": "{}"})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_ooo_rate
    got = q_ooo_rate(sf)

    assert int(got["n_pairs"].iloc[0]) == 5
    assert int(got["n_ooo"].iloc[0]) == 3
    assert abs(got["ooo_rate"].iloc[0] - 0.6) < 1e-9


def test_ooo_rate_zero_on_ordered_stream(ray_session, tmp_path):
    n = 500
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(np.arange(n) * 1000, unit="us"),
        "user_id": np.arange(n, dtype="int64") % 7,
        "event_type": "view", "value": 1.0, "props": "{}"})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_ooo_rate
    got = q_ooo_rate(sf)
    assert int(got["n_ooo"].iloc[0]) == 0
    assert got["ooo_rate"].iloc[0] == 0.0
    assert int(got["n_pairs"].iloc[0]) == n - 7
