"""Round-5 fourth-session operator differentials: URL canonicalization
rules, resource-allocation link prediction vs a pandas reference, the
exact-integer EWMA recurrence vs a naive float loop, grouped Pearson
correlation vs numpy, and the histogram trimmed mean vs explicit
sorting."""
import math

import numpy as np
import pandas as pd
import pytest

from bb_ocr_ray.functions.urls import canonicalize_url


# ---------------------------------------------------------------- urls
@pytest.mark.parametrize("raw,want", [
    # case + default port + fragment
    ("HTTPS://Example.COM:443/a/b?x=1#frag", "https://example.com/a/b?x=1"),
    ("http://example.com:80/", "http://example.com/"),
    # non-default port survives
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # dot-segment resolution
    ("https://e.com/a/../b/./c", "https://e.com/b/c"),
    ("https://e.com/a/b/..", "https://e.com/a/"),
    ("https://e.com/../../x", "https://e.com/x"),
    # tracking params stripped, rest sorted, blanks kept
    ("https://e.com/p?utm_source=x&b=2&a=1&gclid=g",
     "https://e.com/p?a=1&b=2"),
    ("https://e.com/p?b=&a=1", "https://e.com/p?a=1&b="),
    ("https://e.com/p?UTM_CAMPAIGN=x&z=9", "https://e.com/p?z=9"),
    # empty path becomes /
    ("https://e.com?a=1", "https://e.com/?a=1"),
    # duplicate keys kept, sorted by (key, value)
    ("https://e.com/p?a=2&a=1", "https://e.com/p?a=1&a=2"),
    # trailing slash and duplicate slashes untouched
    ("https://e.com/a/", "https://e.com/a/"),
    ("https://e.com//a//b", "https://e.com//a//b"),
])
def test_canonicalize_url(raw, want):
    assert canonicalize_url(raw) == want
    # idempotent
    assert canonicalize_url(want) == want


# ------------------------------------------------------ link prediction
def test_link_predict_matches_pandas(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    n = 4000
    ev = pd.DataFrame({
        "event_id": rng.randint(0, 5000, n).astype("int64"),
        "ts": pd.Timestamp("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        "user_id": rng.randint(0, 120, n).astype("float64"),
        "event_type": "view", "value": 1.0, "props": "{}"})
    ev.loc[rng.rand(n) < 0.05, "user_id"] = np.nan
    sf = tmp_path / "sf"
    sf.mkdir()
    ev.to_parquet(sf / "events.parquet", index=False)

    from bb_ocr_ray.pipelines.queries import q_link_predict
    got = q_link_predict(str(sf))

    # reference: plain pandas
    e = ev.dropna(subset=["user_id"])
    e = pd.DataFrame({"u": e["user_id"].astype("int64"),
                      "item": e["event_id"] % 251}).drop_duplicates()
    e = e.sort_values(["u", "item"])
    e = e[e.groupby("u").cumcount() < 12]
    deg = e.groupby("u")["item"].transform("size")
    e = e.assign(w=27720 // deg)
    m = e.merge(e[["u", "item"]], on="u")
    m = m[m["item_x"] < m["item_y"]]
    want = (m.groupby(["item_x", "item_y"], as_index=False)
            .agg(n_users=("w", "size"), ra_scaled=("w", "sum")))
    want = want[want["n_users"] >= 2].rename(
        columns={"item_x": "i1", "item_y": "i2"})
    want = want.astype({c: "int64" for c in want.columns})
    want = want.sort_values(["i1", "i2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # weights exactly integral for every reachable degree
    assert all(27720 % d == 0 for d in range(1, 13))


# ----------------------------------------------------------------- ewma
def test_ewma_matches_naive_float_recurrence(ray_session, tmp_path):
    rng = np.random.RandomState(3)
    n = 3000
    ev = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.Timestamp("2024-05-01")
        + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        "user_id": rng.randint(0, 80, n).astype("float64"),
        "event_type": "view",
        "value": np.round(rng.uniform(0.01, 500.0, n), 2),
        "props": "{}"})
    ev.loc[rng.rand(n) < 0.04, "user_id"] = np.nan
    ev.loc[rng.rand(n) < 0.04, "value"] = np.nan
    sf = tmp_path / "sf"
    sf.mkdir()
    ev.to_parquet(sf / "events.parquet", index=False)

    from bb_ocr_ray.pipelines.queries import q_ewma
    got = q_ewma(str(sf))

    e = ev.dropna(subset=["user_id", "value"]).copy()
    e["u"] = e["user_id"].astype("int64")
    e = e.sort_values(["u", "ts", "event_id"], kind="mergesort")
    for u, g in e.groupby("u"):
        xs = np.rint(g["value"].to_numpy() * 100).astype("int64")[-8:]
        ew = float(xs[0])
        for x in xs[1:]:
            ew = (float(x) + 3.0 * ew) / 4.0
        row = got[got["user_id"] == u]
        assert len(row) == 1
        num = int(row["ewma_num"].iloc[0])
        den = int(row["ewma_den"].iloc[0])
        assert den == 4 ** (len(xs) - 1)
        # the scaled-integer pair reproduces the float recurrence
        assert math.isclose(num / den, ew, rel_tol=1e-12)
    assert len(got) == e["u"].nunique()


# --------------------------------------------------- grouped correlation
def test_corr_grouped_matches_numpy(ray_session, tmp_path):
    rng = np.random.RandomState(5)
    n = 20000
    q = rng.randint(1, 51, n).astype("float64")
    price = np.round(q * rng.uniform(900, 1100, n), 2)
    li = pd.DataFrame({
        "l_returnflag": rng.choice(list("ANR"), n),
        "l_quantity": q, "l_extendedprice": price})
    # pad the other lineitem columns the reader may prune to
    sf = tmp_path / "sf"
    sf.mkdir()
    li.to_parquet(sf / "lineitem.parquet", index=False)

    from bb_ocr_ray.pipelines.queries import q_corr_grouped
    got = q_corr_grouped(str(sf))
    for f, g in li.groupby("l_returnflag"):
        want = np.corrcoef(g["l_quantity"],
                           np.rint(g["l_extendedprice"] * 100))[0, 1]
        have = float(got[got["l_returnflag"] == f]["corr_qty_price"]
                     .iloc[0])
        # the engine emits at the 6 dp oracle grain
        assert abs(have - want) < 5.1e-7


# ------------------------------------------------------- trimmed mean
def test_trimmed_mean_matches_explicit_sort(ray_session, tmp_path):
    rng = np.random.RandomState(9)
    n = 7000
    li = pd.DataFrame({
        "l_returnflag": rng.choice(list("ANR"), n),
        "l_quantity": rng.randint(1, 51, n).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(1, 10**5, n), 2)})
    sf = tmp_path / "sf"
    sf.mkdir()
    li.to_parquet(sf / "lineitem.parquet", index=False)

    from bb_ocr_ray.pipelines.queries import q_trimmed_mean
    got = q_trimmed_mean(str(sf))
    for f, g in li.groupby("l_returnflag"):
        v = np.sort(g["l_quantity"].to_numpy())
        lo = len(v) // 10
        kept = v[lo: len(v) - lo]
        row = got[got["l_returnflag"] == f]
        assert int(row["n_kept"].iloc[0]) == len(kept)
        assert int(row["trimmed_sum"].iloc[0]) == int(kept.sum())
        assert abs(float(row["trimmed_mean"].iloc[0])
                   - kept.mean()) < 1e-6


# ---------------------------------------------------------- anchor text
def test_extract_anchor_texts_rules():
    from bb_ocr_ray.kernel.links import extract_anchor_texts

    html = ('<a href="/x"><b>Bold</b>\n  link</a>'
            '<a href="#share">Share</a>'          # fragment-only: drop
            '<a href="mailto:a@b">mail</a>'        # scheme: drop
            '<a class=c href=/y>plain</a>'
            '<a href="/img"><img src="i.png"></a>'  # empty text kept
            '<a href="/z?q=1#frag">frag stripped</a>'
            '<a href="/open">never closed')         # unterminated: drop
    got = extract_anchor_texts(html, "https://e.com/base")
    assert got == [
        ("https://e.com/x", "Bold link"),
        ("https://e.com/y", "plain"),
        ("https://e.com/img", ""),
        ("https://e.com/z?q=1", "frag stripped"),
    ]


def test_source_overlap_matches_pandas(ray_session, tmp_path):
    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(400):
        src = f"s{rng.randint(0, 4)}"
        text = " ".join(rng.choice(vocab, rng.randint(1, 12)))
        rows.append((d, text, "en", src, len(text)))
    docs = pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                       "source", "n_chars"])
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    from bb_ocr_ray.pipelines.queries import q_source_overlap
    got = q_source_overlap(str(sf))

    vocabs = {s: set(" ".join(g["text"]).split())
              for s, g in docs.groupby("source")}
    srcs = sorted(vocabs)
    assert len(got) == len(srcs) * (len(srcs) - 1) // 2
    for _, r in got.iterrows():
        a, b = vocabs[r["source_a"]], vocabs[r["source_b"]]
        assert int(r["n_common"]) == len(a & b)
        assert int(r["n_union"]) == len(a | b)
        assert abs(float(r["jaccard"]) - len(a & b) / len(a | b)) < 1e-6


# ------------------------------------------------------- graph QA stats
def _edges_ref(doc_ids: np.ndarray) -> pd.DataFrame:
    m = int(doc_ids.max()) + 1
    d = doc_ids
    return pd.DataFrame({
        "src": np.repeat(d, 3),
        "dst": np.stack([(d * d + 5) % m, (d * 7 + 3) % m,
                         (d // 3 + 11) % m], axis=1).reshape(-1)})


def test_degree_dist_matches_pandas(ray_session, tmp_path):
    docs = pd.DataFrame({"doc_id": np.arange(700, dtype="int64"),
                         "text": "t", "lang": "en", "source": "s",
                         "n_chars": 1})
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    from bb_ocr_ray.pipelines.queries import q_degree_dist
    got = q_degree_dist(str(sf))

    e = _edges_ref(docs["doc_id"].to_numpy())
    for direction, col in (("out", "src"), ("in", "dst")):
        deg = e.groupby(col).size()
        want = (np.floor(np.log2(deg.to_numpy("float64")))
                .astype("int64"))
        wh = pd.Series(want).value_counts().sort_index()
        sub = got[got["direction"] == direction]
        assert sub["bucket"].tolist() == wh.index.tolist()
        assert sub["n_nodes"].tolist() == wh.tolist()


def test_reciprocity_matches_brute_force(ray_session, tmp_path):
    docs = pd.DataFrame({"doc_id": np.arange(500, dtype="int64"),
                         "text": "t", "lang": "en", "source": "s",
                         "n_chars": 1})
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    from bb_ocr_ray.pipelines.queries import q_reciprocity
    got = q_reciprocity(str(sf))

    e = _edges_ref(docs["doc_id"].to_numpy()).drop_duplicates()
    es = set(map(tuple, e.to_numpy()))
    mutual = sum(1 for (s, d) in es if (d, s) in es)  # self-loop = own rev
    assert int(got["n_edges"].iloc[0]) == len(es)
    assert int(got["n_mutual"].iloc[0]) == mutual
    assert abs(float(got["reciprocity"].iloc[0]) - mutual / len(es)) < 1e-6
