"""Round-5 seventh-session batch-N differentials: WAND bounds vs a
direct per-term max-tf·idf computation, rare-category collapse on a
planted head/tail split, and casing classes on planted tokens."""
import math

import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


def _docs(texts, source=None):
    n = len(texts)
    return pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                         "text": texts, "lang": "en",
                         "source": source if source is not None
                         else ["s"] * n,
                         "n_chars": [len(t) for t in texts]})


# -------------------------------------------------------------- wand bounds
def test_wand_bounds_matches_direct(ray_session, tmp_path):
    rng = np.random.RandomState(8)
    vocab = [f"t{i}" for i in range(40)]
    texts = []
    for _ in range(120):
        toks = list(rng.choice(vocab, size=rng.randint(3, 25)))
        texts.append(" ".join(toks))
    # planted: a rare term with huge in-doc tf -> top bound
    texts.append(" ".join(["burst"] * 30))
    sf = _write(tmp_path, documents=_docs(texts))

    from bb_ocr_ray.pipelines.queries import q_wand_bounds
    got = q_wand_bounds(sf)

    from collections import Counter
    n_docs = len(texts)
    mx: dict = {}
    df: Counter = Counter()
    for t in texts:
        c = Counter(t.split())
        df.update(c.keys())
        for tok, n in c.items():
            mx[tok] = max(mx.get(tok, 0), n)
    want = sorted(
        ((tok, mx[tok], df[tok],
          round(mx[tok] * math.log(n_docs / df[tok]), 6))
         for tok in df),
        key=lambda r: (-r[3], r[0]))[:20]
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    # the planted rare-high-tf term tops the table
    assert got["tok"].iloc[0] == "burst"


# ------------------------------------------------------------ rare collapse
def test_rare_collapse_head_tail(ray_session, tmp_path):
    # 'head' = 60% of mass, 'mid' = 38%, 100 singleton tail tokens
    texts = [" ".join(["head"] * 300), " ".join(["mid"] * 190),
             " ".join(f"tail{i}" for i in range(10))]
    sf = _write(tmp_path, documents=_docs(texts))

    from bb_ocr_ray.pipelines.queries import q_rare_collapse
    got = q_rare_collapse(sf).set_index("category")

    total = 300 + 190 + 10
    # 1% threshold = 5: tail tokens (1 each) collapse
    assert int(got.loc["head", "n"]) == 300
    assert int(got.loc["mid", "n"]) == 190
    assert int(got.loc["__rare__", "n"]) == 10
    assert len(got) == 3
    assert int(got["n"].sum()) == total


# ---------------------------------------------------------------- case stats
def test_case_stats_planted_classes(ray_session, tmp_path):
    texts = ["the Cat SAT On THE mat A 123 héllo MiXeD"]
    sf = _write(tmp_path, documents=_docs(texts, source=["s1"]))

    from bb_ocr_ray.pipelines.queries import q_case_stats
    got = q_case_stats(sf).iloc[0]

    # lower: the, mat, on? 'On' is title. lower = {the, mat} -> 2
    assert int(got["n_lower"]) == 2
    # upper (2+): SAT, THE -> 2
    assert int(got["n_upper"]) == 2
    # title: Cat, On, A (single capital) -> 3
    assert int(got["n_title"]) == 3
    # other: 123, héllo (non-ascii), MiXeD -> 3
    assert int(got["n_other"]) == 3
