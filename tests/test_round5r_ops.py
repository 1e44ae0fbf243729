"""Round-5 seventh-session batch-K differentials: the langid confusion
matrix vs per-doc detect_lang calls, vocabulary coverage vs a sorted
cumulative walk, and conversion lag vs explicit per-user first-event
logic (incl. purchase-before-view exclusion)."""
import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


_DAY = 86_400_000_000


# ------------------------------------------------------------ lang confusion
def test_lang_confusion_matches_detect_lang(ray_session, tmp_path):
    texts = ["the quick brown fox and the lazy dog went to the market",
             "le chat et le chien sont dans la maison avec le pain",
             "der hund und die katze sind in dem haus mit der tür",
             "el perro y el gato están en la casa con el pan",
             "你好世界这是一个测试文档内容很多汉字",
             "zzz qqq xxx www"]
    langs = ["en", "fr", "de", "es", "zh", "en"]
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                         "text": texts, "lang": langs, "source": "s",
                         "n_chars": [len(t) for t in texts]})
    sf = _write(tmp_path, documents=docs)

    from bb_ocr_ray.pipelines.queries import q_lang_confusion
    got = q_lang_confusion(sf)

    from collections import Counter
    from bb_ocr_ray.functions.textstats import detect_lang
    want: Counter = Counter()
    for t, lang in zip(texts, langs):
        want[(lang, detect_lang(t))] += 1
    assert {(r["lang"], r["lang_pred"]): r["n"]
            for _, r in got.iterrows()} == dict(want)
    # row sums reproduce the per-lang doc counts (accuracy view's margin)
    assert got.groupby("lang")["n"].sum().to_dict() == \
        pd.Series(langs).value_counts().to_dict()


# ------------------------------------------------------------ vocab coverage
def test_vocab_coverage_matches_cumulative_walk(ray_session, tmp_path):
    rng = np.random.RandomState(2)
    vocab = [f"w{i:03d}" for i in range(300)]
    # Zipfian draws so the curve is strictly informative
    probs = 1.0 / np.arange(1, 301)
    probs /= probs.sum()
    texts = [" ".join(rng.choice(vocab, p=probs, size=40))
             for _ in range(150)]
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                         "text": texts, "lang": "en", "source": "s",
                         "n_chars": [len(t) for t in texts]})
    sf = _write(tmp_path, documents=docs)

    from bb_ocr_ray.pipelines.queries import q_vocab_coverage
    got = q_vocab_coverage(sf)

    from collections import Counter
    cnt: Counter = Counter()
    for t in texts:
        cnt.update(t.split())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    for _, r in got.iterrows():
        k = int(r["k"])
        want = sum(n for _, n in ordered[:k])
        assert int(r["n_covered"]) == want, k
        assert abs(r["coverage"] - round(want / total, 6)) < 1e-9
    assert list(got["k"]) == [k for k in (1, 2, 4, 8, 16, 32, 64, 128)
                              if k <= len(cnt)]
    assert got["coverage"].is_monotonic_increasing


# ------------------------------------------------------------ conversion lag
def test_conversion_lag_first_event_logic(ray_session, tmp_path):
    rows = []
    # user 0: view day 0, purchase day 3 -> lag 3
    rows += [(0, 0, "view"), (0, 3 * _DAY, "purchase")]
    # user 1: purchase BEFORE any view, then view day 2, purchase day 2
    # (same day, later us) -> lag 0; the early purchase must not count
    rows += [(1, 1 * _DAY, "purchase"), (1, 2 * _DAY, "view"),
             (1, 2 * _DAY + 5, "purchase")]
    # user 2: view only -> never converts, absent
    rows += [(2, 0, "view")]
    # user 3: purchase only -> no view anchor, absent
    rows += [(3, 0, "purchase")]
    # user 4: two views; lag anchors at the FIRST view (day 0), first
    # qualifying purchase day 5 -> lag 5
    rows += [(4, 0, "view"), (4, 4 * _DAY, "view"),
             (4, 5 * _DAY, "purchase")]
    ev = pd.DataFrame({
        "event_id": np.arange(len(rows), dtype="int64"),
        "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
        "user_id": np.array([r[0] for r in rows], dtype="int64"),
        "event_type": [r[2] for r in rows],
        "value": 1.0, "props": "{}"})
    sf = _write(tmp_path, events=ev)

    from bb_ocr_ray.pipelines.queries import q_conversion_lag
    got = q_conversion_lag(sf)

    assert dict(zip(got["lag_days"], got["n_users"])) == \
        {0: 1, 3: 1, 5: 1}
