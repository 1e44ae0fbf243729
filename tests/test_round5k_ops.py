"""Round-5 seventh-session batch-D differentials: smoothed target
encoding vs closed-form arithmetic, balanced class weights vs direct
ratios, OOV rate vs explicit vocab sets, and the CUSUM changepoint on
a planted level shift."""
import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


_DAY = 86_400_000_000


# ------------------------------------------------------------ target encode
def test_target_encode_closed_form(ray_session, tmp_path):
    cust = pd.DataFrame({
        "c_custkey": np.arange(4, dtype="int64"),
        "c_name": "c", "c_nationkey": np.int32(0),
        "c_acctbal": 0.0,
        "c_mktsegment": ["AUTO", "AUTO", "BIKE", "BIKE"]})
    # AUTO orders: 10.00, 20.00; BIKE orders: 100.00 (one order)
    orders = pd.DataFrame({
        "o_orderkey": np.arange(3, dtype="int64"),
        "o_custkey": np.array([0, 1, 2], dtype="int64"),
        "o_orderstatus": "F",
        "o_totalprice": [10.0, 20.0, 100.0],
        "o_orderdate": pd.Timestamp("2024-01-01"),
        "o_orderpriority": "1-URGENT"})
    sf = _write(tmp_path, customer=cust, orders=orders)

    from bb_ocr_ray.pipelines.queries import q_target_encode
    got = q_target_encode(sf).set_index("c_mktsegment")

    g_mean = (10 + 20 + 100) / 3
    for seg, (s, n) in {"AUTO": (30.0, 2), "BIKE": (100.0, 1)}.items():
        assert int(got.loc[seg, "n"]) == n
        assert abs(got.loc[seg, "mean_price"] - round(s / n, 6)) < 1e-9
        want = (s + 10 * g_mean) / (n + 10)
        assert abs(got.loc[seg, "encoded"] - round(want, 6)) < 1e-9
    # smoothing pulls the 1-sample BIKE segment hard toward the prior
    assert abs(got.loc["BIKE", "encoded"] - g_mean) < \
        abs(got.loc["BIKE", "mean_price"] - g_mean)


# ------------------------------------------------------------ class weights
def test_class_weights_direct(ray_session, tmp_path):
    labels = np.array([0] * 90 + [1] * 9 + [2] * 1, dtype="int32")
    emb = pd.DataFrame({
        "vec_id": np.arange(100, dtype="int64"),
        "embedding": [np.zeros(4, dtype="float32")] * 100,
        "label": labels})
    sf = _write(tmp_path, embeddings=emb)

    from bb_ocr_ray.pipelines.queries import q_class_weights
    got = q_class_weights(sf).set_index("label")

    for lab, n in {0: 90, 1: 9, 2: 1}.items():
        assert int(got.loc[lab, "n"]) == n
        assert abs(got.loc[lab, "weight"] - round(100 / (3 * n), 6)) < 1e-9
    # rare class dominates the weighting
    assert got.loc[2, "weight"] > 30 * got.loc[0, "weight"]


# ----------------------------------------------------------------- oov rate
def test_oov_rate_planted_vocab(ray_session, tmp_path):
    # 25 distinct words; the 20 most frequent are 'w00'..'w19'
    texts, langs = [], []
    for i in range(20):
        texts += [f"w{i:02d} " * (30 - i)]          # freq 30-i >= 11
        langs += ["en"]
    texts += ["rare1 rare2 rare3 w00", "rare4 rare5"]
    langs += ["fr", "fr"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts, "lang": langs, "source": "s",
                       "n_chars": [len(t) for t in texts]})
    sf = _write(tmp_path, documents=df)

    from bb_ocr_ray.pipelines.queries import q_oov_rate
    got = q_oov_rate(sf).set_index("lang")

    # en docs consist only of top-20 words
    assert int(got.loc["en", "n_oov"]) == 0
    # fr: 6 tokens, 5 rare (oov), 1 known
    assert int(got.loc["fr", "n_tokens"]) == 6
    assert int(got.loc["fr", "n_oov"]) == 5
    assert abs(got.loc["fr", "oov_rate"] - round(5 / 6, 6)) < 1e-9


# -------------------------------------------------------------------- cusum
def test_cusum_finds_planted_level_shift(ray_session, tmp_path):
    # 15 days at 100/day then 15 days at 300/day: CUSUM peaks at the
    # last low day (day 14)
    counts = [100] * 15 + [300] * 15
    ts = []
    for d, c in enumerate(counts):
        ts += [d * _DAY + i * 1000 for i in range(c)]
    ev = pd.DataFrame({
        "event_id": np.arange(len(ts), dtype="int64"),
        "ts": pd.to_datetime(np.array(ts, dtype="int64"), unit="us"),
        "user_id": np.int64(0), "event_type": "click",
        "value": 1.0, "props": "{}"})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_cusum
    got = q_cusum(sf)

    n = np.array(counts, dtype="float64")
    cus = np.cumsum(n) - (np.arange(len(n)) + 1) * n.mean()
    k = int(np.argmax(np.abs(cus)))
    assert int(got["cp_day"].iloc[0]) == k == 14
    assert int(got["n_days"].iloc[0]) == 30
    assert abs(got["max_abs_cusum"].iloc[0] - round(abs(cus[k]), 6)) < 1e-6
