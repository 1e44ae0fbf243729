"""Round-5 seventh-session batch-Q differentials: SRM chi-square on a
planted imbalanced assignment, and embedding outliers vs a direct
centroid-distance computation with planted far vectors."""
import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


# ------------------------------------------------------------------ ab srm
def test_ab_srm_flags_planted_imbalance(ray_session, tmp_path):
    # 600 even users vs 400 odd users -> chi2 = 40 >> 3.841
    uids = (list(range(0, 1200, 2)) + list(range(1, 800, 2)))
    ev = pd.DataFrame({
        "event_id": np.arange(len(uids) * 2, dtype="int64"),
        "ts": pd.Timestamp("2024-01-01"),
        "user_id": np.array(uids * 2, dtype="int64"),  # dup events
        "event_type": "view", "value": 1.0, "props": "{}"})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_ab_srm
    got = q_ab_srm(sf).iloc[0]

    assert int(got["n_a"]) == 600 and int(got["n_b"]) == 400
    want = (600 - 500) ** 2 / 500 + (400 - 500) ** 2 / 500
    assert abs(got["chi2"] - round(want, 6)) < 1e-9
    assert bool(got["srm"])


def test_ab_srm_balanced_passes(ray_session, tmp_path):
    uids = list(range(1000))
    ev = pd.DataFrame({
        "event_id": np.arange(1000, dtype="int64"),
        "ts": pd.Timestamp("2024-01-01"),
        "user_id": np.array(uids, dtype="int64"),
        "event_type": "view", "value": 1.0, "props": "{}"})
    sf = _write(tmp_path, events=ev)
    from bb_ocr_ray.pipelines.queries import q_ab_srm
    got = q_ab_srm(sf).iloc[0]
    assert got["chi2"] == 0.0 and not bool(got["srm"])


# ------------------------------------------------------------- emb outliers
def test_emb_outliers_planted_far_vectors(ray_session, tmp_path):
    rng = np.random.RandomState(14)
    d = 8
    tight = rng.randn(200, d).astype("float32") * 0.1      # label 0
    far = (rng.randn(5, d).astype("float32") * 0.1
           + np.float32(10.0))                             # planted, label 0
    other = rng.randn(100, d).astype("float32")            # label 1
    X = np.vstack([tight, far, other])
    labels = np.array([0] * 205 + [1] * 100, dtype="int32")
    emb = pd.DataFrame({
        "vec_id": np.arange(len(X), dtype="int64"),
        "embedding": [X[i] for i in range(len(X))],
        "label": labels})
    sf = _write(tmp_path, embeddings=emb)

    from bb_ocr_ray.pipelines.queries import q_emb_outliers
    got = q_emb_outliers(sf).set_index("label")

    # independent computation
    for lv in (0, 1):
        Xl = X[labels == lv].astype("float64")
        c = Xl.mean(axis=0)
        d2 = ((Xl - c) ** 2).sum(axis=1)
        thr = round(4.0 * d2.mean(), 6)
        n_out = int((np.round(d2, 6) > thr).sum())
        assert int(got.loc[lv, "n"]) == len(Xl)
        assert int(got.loc[lv, "n_out"]) == n_out, lv
        assert abs(got.loc[lv, "mean_d2"] - round(d2.mean(), 6)) < 1e-5
    # the 5 planted far vectors ARE the label-0 outliers
    assert int(got.loc[0, "n_out"]) == 5
