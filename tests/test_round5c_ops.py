"""Round-5 fifth-session operator differentials: the KS drift
statistic vs an explicit empirical-CDF reference, Welch's t vs the
textbook float formula, and the hashing-trick featurizer vs a plain
python reference."""
import math

import numpy as np
import pandas as pd

from bb_ocr_ray.functions.hashing import stable_u64, ws_tokens


def _write_docs(tmp_path, df):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    df.to_parquet(sf / "documents.parquet", index=False)
    return str(sf)


# ------------------------------------------------------------ KS test
def test_ks_test_matches_ecdf_reference(ray_session, tmp_path):
    rng = np.random.RandomState(11)
    # three sources with deliberately different length distributions
    parts = []
    for s, (lo, hi, n) in {"a": (10, 200, 400), "b": (150, 400, 300),
                           "c": (10, 400, 250)}.items():
        parts.append(pd.DataFrame({
            "doc_id": np.arange(n), "text": "x", "lang": "en",
            "source": s,
            "n_chars": rng.randint(lo, hi, n).astype("int64")}))
    df = pd.concat(parts, ignore_index=True)
    df["doc_id"] = np.arange(len(df), dtype="int64")
    sf = _write_docs(tmp_path, df)

    from bb_ocr_ray.pipelines.queries import q_ks_test
    got = q_ks_test(sf)

    # reference: explicit two-sample ECDF max-gap on the value grid
    recs = []
    for s in sorted(df["source"].unique()):
        a = np.sort(df.loc[df["source"] == s, "n_chars"].to_numpy())
        b = np.sort(df.loc[df["source"] != s, "n_chars"].to_numpy())
        grid = np.unique(np.concatenate([a, b]))
        fa = np.searchsorted(a, grid, side="right") / len(a)
        fb = np.searchsorted(b, grid, side="right") / len(b)
        recs.append({"source": s, "n_source": len(a),
                     "ks_d": np.max(np.abs(fa - fb))})
    want = pd.DataFrame(recs)
    assert list(got["source"]) == list(want["source"])
    assert list(got["n_source"]) == list(want["n_source"])
    np.testing.assert_allclose(got["ks_d"], want["ks_d"], atol=1e-6)
    # the exact integer cross-product path must agree with float ECDF
    assert (got["ks_d"] > 0).all()


# --------------------------------------------------------- Welch's t
def test_ab_test_matches_textbook_formula(ray_session, tmp_path):
    rng = np.random.RandomState(5)
    n = 6000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        "user_id": rng.randint(0, 500, n).astype("int64"),
        "event_type": rng.choice(["view", "click", "buy"], n),
        "value": np.round(rng.gamma(2.0, 40.0, n), 2),
        "props": "{}"})
    # shift one arm of one type so t is decisively nonzero
    shift = (ev["event_type"] == "buy") & (ev["user_id"] % 2 == 1)
    ev.loc[shift, "value"] = np.round(ev.loc[shift, "value"] + 25.0, 2)
    sf = tmp_path / "sf"
    sf.mkdir()
    ev.to_parquet(sf / "events.parquet", index=False)

    from bb_ocr_ray.pipelines.queries import q_ab_test
    got = q_ab_test(str(sf))

    cents = np.rint(ev["value"].to_numpy() * 100).astype("int64")
    arm = (ev["user_id"].to_numpy() % 2).astype("int64")
    for _, r in got.iterrows():
        m = ev["event_type"].to_numpy() == r["event_type"]
        xa, xb = cents[m & (arm == 0)], cents[m & (arm == 1)]
        assert r["n_a"] == len(xa) and r["n_b"] == len(xb)
        va, vb = xa.var(ddof=1), xb.var(ddof=1)
        t_ref = (xa.mean() - xb.mean()) / math.sqrt(
            va / len(xa) + vb / len(xb))
        assert abs(r["t_welch"] - t_ref) < 1e-5
        assert abs(r["mean_a_cents"] - xa.mean()) < 1e-5
    # the planted shift must be detected with a large negative t
    assert got.loc[got["event_type"] == "buy", "t_welch"].iloc[0] < -10


# ----------------------------------------------------- feature hashing
def test_feature_hash_matches_python_reference(ray_session, tmp_path):
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(300)]
    n = 410
    texts = [" ".join(rng.choice(vocab, rng.randint(3, 40)))
             for _ in range(n)]
    texts[41] = ""          # empty doc inside the probe sample
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                       "text": texts, "lang": "en", "source": "s",
                       "n_chars": [len(t) for t in texts]})
    sf = _write_docs(tmp_path, df)

    from bb_ocr_ray.pipelines.queries import q_feature_hash
    got = q_feature_hash(sf)

    recs = []
    for did in range(0, n, 41):
        acc: dict = {}
        for tok in ws_tokens(texts[did]):
            bk = stable_u64(tok) % 256
            acc[bk] = acc.get(bk, 0) + 1
        for bk in sorted(acc):
            recs.append({"doc_id": did, "bucket": bk, "n": acc[bk]})
    want = pd.DataFrame(recs).astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # empty probe doc contributes no rows
    assert 41 not in set(got["doc_id"])
