"""Round-4 operator differentials: boilerplate removal (pandas
reference on a corpus with within-doc repeats, NULL text, per-domain
frequency structure), PMI pairs, the size-gated LM assembly paths,
sorted-neighborhood blocking, and embedding covariance."""
import numpy as np
import pandas as pd
import pytest


def _pandas_reference(df, max_ratio_pct=60, min_docs=2):
    rows = []
    for _, r in df.iterrows():
        for i, ln in enumerate((r["text"] or "").split("\n")):
            rows.append((r["doc_id"], r["source"], i, ln))
    lines = pd.DataFrame(rows, columns=["doc_id", "source", "idx", "line"])
    dfq = (lines.drop_duplicates(["doc_id", "source", "line"])
           .groupby(["source", "line"], as_index=False).size()
           .rename(columns={"size": "df"}))
    nd = df.groupby("source", as_index=False).size().rename(
        columns={"size": "n_docs"})
    j = dfq.merge(nd, on="source")
    freq = j[(j["df"] >= min_docs)
             & (j["df"] * 100 > max_ratio_pct * j["n_docs"])]
    fset = set(zip(freq["source"], freq["line"]))
    out = []
    for d, g in lines.sort_values(["doc_id", "idx"]).groupby("doc_id"):
        keep = [ln for s, ln in zip(g["source"], g["line"])
                if (s, ln) not in fset]
        out.append((d, len(g), len(keep), "\n".join(keep)))
    return pd.DataFrame(out, columns=["doc_id", "n_lines", "n_kept",
                                      "clean_text"])


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(3)
    rows = []
    for d in range(120):
        src = f"s{d % 4}"
        body = " ".join(rng.choice(["alpha", "beta", "gamma"], 5))
        parts = [f"banner {src}"]                     # df 100% -> drop
        if d % 8 < 4:
            # 50% per source (src = d%4, so d%2 would be 0 or 100%
            # within a source — d%8<4 alternates inside each source)
            parts.append(f"half {src}")               # ~50% -> keep
        if d % 5 < 4:
            parts.append(f"often {src}")              # 80% -> drop
        parts.append(body)
        if d % 7 == 0:
            # repeated WITHIN the doc: df must count it once
            parts.extend(["dup line", "dup line", "dup line"])
        parts.append(f"tail {d}")                     # unique -> keep
        rows.append((d, src, "\n".join(parts)))
    rows.append((900, "s0", None))                    # NULL text
    return pd.DataFrame(rows, columns=["doc_id", "source", "text"])


def test_remove_boilerplate_matches_pandas(ray_session, corpus):
    import ray.data as rd

    from bb_ocr_ray.stages.boilerplate import remove_boilerplate

    got = (remove_boilerplate(rd.from_pandas(corpus))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = (_pandas_reference(corpus)
            .sort_values("doc_id").reset_index(drop=True))
    got["doc_id"] = got["doc_id"].astype("int64")
    for c in ("doc_id", "n_lines", "n_kept", "clean_text"):
        assert got[c].tolist() == want[c].tolist(), c
    # the cascade actually fires: every planted doc lost its banner
    planted = got[got["doc_id"] != 900]
    assert (planted["n_kept"] < planted["n_lines"]).all()
    # the ~50% line survived where planted
    ev = planted[planted["doc_id"] % 8 < 4]
    assert all("half " in t for t in ev["clean_text"])


def test_remove_boilerplate_broadcast_vs_distributed(ray_session, corpus):
    """VERDICT r4 item 1: the frequent-set gate.  Default limit takes
    the zero-shuffle fused broadcast path; broadcast_limit=1 forces the
    explode + join + doc_id-bucket rebuild path.  Outputs must be
    row-identical, and the gate must report the forced choice."""
    import ray.data as rd

    from bb_ocr_ray.stages.boilerplate import remove_boilerplate

    choices = []
    fast = (remove_boilerplate(rd.from_pandas(corpus),
                               _on_choice=choices.append)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    slow = (remove_boilerplate(rd.from_pandas(corpus), broadcast_limit=1,
                               _on_choice=choices.append)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert choices == ["broadcast", "hash"]
    slow["doc_id"] = slow["doc_id"].astype("int64")
    fast["doc_id"] = fast["doc_id"].astype("int64")
    for c in ("doc_id", "n_lines", "n_kept", "clean_text"):
        assert fast[c].tolist() == slow[c].tolist(), c


def test_remove_boilerplate_dup_line_df_counts_docs(ray_session, corpus):
    """'dup line' appears 3x in each %7 doc (18 of 121 docs per the
    corpus, under every source's 60%), so within-doc repetition must
    NOT push it over the threshold — it stays."""
    import ray.data as rd

    from bb_ocr_ray.stages.boilerplate import remove_boilerplate

    got = remove_boilerplate(rd.from_pandas(corpus)).to_pandas()
    d0 = got[got["doc_id"] == 0]["clean_text"].iloc[0]
    assert d0.count("dup line") == 3


def test_pmi_pairs_deterministic_and_windowed(ray_session, tmp_path):
    """q_pmi_pairs: stable across runs, and distance-2 skip-grams are
    really counted (a corpus where 'a c' only ever cooccurs at d=2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bb_ocr_ray.pipelines.queries import q_pmi_pairs

    docs = ["a b c"] * 6 + ["b c a"] * 3 + ["c b a"] * 3
    tbl = pa.table({"doc_id": pa.array(range(12), "int64"),
                    "text": pa.array(docs, "string"),
                    "lang": pa.array(["en"] * 12, "string"),
                    "source": pa.array(["s"] * 12, "string"),
                    "n_chars": pa.array([5] * 12, "int64")})
    pq.write_table(tbl, tmp_path / "documents.parquet")

    r1 = q_pmi_pairs(str(tmp_path), min_count=2, topk=50)
    r2 = q_pmi_pairs(str(tmp_path), min_count=2, topk=50)
    assert r1.values.tolist() == r2.values.tolist()
    got = {(a, b): c for a, b, c in
           zip(r1["w1"], r1["w2"], r1["c12"])}
    # d=2 pair from 'a b c' (x6); d=1 'a b' also x6
    assert got[("a", "c")] == 6
    assert got[("a", "b")] == 6
    # ranking is (pmi desc, w1, w2): verify sortedness
    key = list(zip(-r1["pmi"], r1["w1"], r1["w2"]))
    assert key == sorted(key)


def test_lm_quality_assembly_paths_agree(ray_session, sf_tiny, monkeypatch):
    """The size-gated LM model assembly (driver pandas vs distributed
    fold+join) is a pure plan choice: forcing the distributed path
    with a 0-byte gate must yield identical scores."""
    import bb_ocr_ray.stages.joins as joins
    from bb_ocr_ray.pipelines.queries import q_lm_quality

    a = q_lm_quality(sf_tiny)
    monkeypatch.setattr(joins, "_BROADCAST_LIMIT_BYTES", 0)
    b = q_lm_quality(sf_tiny)
    assert a.values.tolist() == b.values.tolist()


def test_sorted_neighborhood_matches_pandas(ray_session):
    """Operator pairs == a direct pandas rank derivation, on a corpus
    engineered so pairs CROSS bucket boundaries (keys spread over many
    2-char prefixes) and one prefix is heavily skewed."""
    import ray.data as rd

    from bb_ocr_ray.stages.dedup import sorted_neighborhood_pairs

    rng = np.random.RandomState(9)
    texts = [f"{c}{c2} body {i}" for i, (c, c2) in
             enumerate(zip(rng.choice(list("abcd"), 200),
                           rng.choice(list("xy"), 200)))]
    texts += [f"zz skewed {i}" for i in range(60)]     # one hot bucket
    texts += ["", "", "éaccent unicode"]          # empties + unicode
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                       "text": texts})

    got = (sorted_neighborhood_pairs(rd.from_pandas(df)).to_pandas()
           .sort_values(["id_a", "id_b", "d"]).reset_index(drop=True))

    ref = df.copy()
    ref["bk"] = ref["text"].str[:12].fillna("")
    ref = ref.sort_values(["bk", "doc_id"],
                          kind="mergesort").reset_index(drop=True)
    rows = []
    for i in range(len(ref)):
        for d in range(1, 4):
            if i + d < len(ref):
                rows.append((ref["doc_id"][i], ref["doc_id"][i + d], d,
                             int(ref["bk"][i] == ref["bk"][i + d])))
    want = (pd.DataFrame(rows, columns=["id_a", "id_b", "d", "key_match"])
            .sort_values(["id_a", "id_b", "d"]).reset_index(drop=True))
    assert got.values.tolist() == want.values.tolist()
    # boundary pairs exist: some pair spans two different buckets
    assert (got["key_match"] == 0).any() and (got["key_match"] == 1).any()


def test_embed_covariance_matches_numpy(ray_session, sf_tiny):
    """Distributed matrix partial sums == np.cov (population) on the
    materialized embedding matrix."""
    import pyarrow.parquet as pq

    from bb_ocr_ray.pipelines.queries import q_embed_covariance

    got = q_embed_covariance(sf_tiny)
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in
                    pq.read_table(f"{sf_tiny}/embeddings.parquet",
                                  columns=["embedding"])
                    ["embedding"].to_pylist()])
    C = np.cov(X, rowvar=False, bias=True)      # population covariance
    iu, ju = np.triu_indices(X.shape[1])
    want = np.round(C[iu, ju], 6)
    assert got["i"].tolist() == (iu + 1).tolist()
    assert got["j"].tolist() == (ju + 1).tolist()
    np.testing.assert_allclose(got["cov"].to_numpy(), want, atol=2e-6)
    assert np.abs(got["cov"].to_numpy()).max() > 0   # non-degenerate


def test_typo_variant_pairs_matches_bruteforce(ray_session):
    """Deletion-neighborhood blocking == brute-force byte-Levenshtein
    over a vocabulary with planted distance-1 variants, a distance-2
    shared-variant false candidate ('ab...'/'ba...'), and a multibyte
    token proving the BYTE metric (DuckDB levenshtein parity)."""
    import ray.data as rd

    from bb_ocr_ray.stages.dedup import typo_variant_pairs

    vocab = ["table", "tble", "tabel", "chair", "chairs", "abcd",
             "bacd", "café", "cafe", "stone", "st0ne", "zzzz"]
    got = (typo_variant_pairs(
        rd.from_pandas(pd.DataFrame({"tok": vocab})))
        .to_pandas().sort_values(["tok_a", "tok_b"])
        .reset_index(drop=True))

    def lev(a, b):
        a, b = a.encode(), b.encode()
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = sorted((a, b) for i, a in enumerate(vocab)
                  for b in vocab[i + 1:] if lev(*sorted((a, b))) == 1
                  for a, b in [sorted((a, b))])
    assert list(zip(got["tok_a"], got["tok_b"])) == want
    pairs = set(zip(got["tok_a"], got["tok_b"]))
    assert ("table", "tble") in pairs            # deletion
    assert ("st0ne", "stone") in pairs           # substitution
    # transposition = distance 2; shares deletion variants with its
    # partner, so it IS a candidate — the verify must filter it
    assert ("abcd", "bacd") not in pairs
    # café/cafe differ by a 2-byte char swap -> byte distance 2
    assert ("cafe", "café") not in pairs


def test_crawl_schedule_null_domain_partition(ray_session, tmp_path):
    """A NULL domain is its own partition (SQL PARTITION BY
    semantics) and sorts last within each round — pandas groupby
    would silently DROP the NaN group without dropna=False."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bb_ocr_ray.pipelines.queries import q_crawl_schedule

    tbl = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5, 6], "int64"),
                    "text": pa.array(["a"] * 6, "string"),
                    "lang": pa.array(["en"] * 6, "string"),
                    "source": pa.array(["s1", "s2", None, "s1",
                                        None, "s2"], "string"),
                    "n_chars": pa.array([1] * 6, "int64")})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = q_crawl_schedule(str(tmp_path))
    assert got["doc_id"].tolist() == [1, 2, 3, 4, 6, 5]
    assert got["r"].tolist() == [1, 1, 1, 2, 2, 2]
    assert got["slot"].tolist() == [1, 2, 3, 4, 5, 6]


def test_hll_intersect_estimate_and_exact(ray_session, sf_small):
    """The part='x' row equals the true intersection, and the
    inclusion-exclusion estimate from the a/b/u register states lands
    within the compounded HLL error band (m=64 -> ~13% per sketch)."""
    import pyarrow.parquet as pq

    from bb_ocr_ray.functions.hashing import hll_estimate
    from bb_ocr_ray.pipelines.queries import q_hll_intersect

    out = q_hll_intersect(sf_small)
    ev = pq.read_table(f"{sf_small}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    ev = ev.dropna(subset=["user_id"])
    cu = set(ev[ev["event_type"] == "click"]["user_id"].astype(int))
    vu = set(ev[ev["event_type"] == "view"]["user_id"].astype(int))
    true_x = len(cu & vu)
    x = int(out[out["part"] == "x"]["val"].iloc[0])
    assert x == true_x

    def est(part):
        sub = out[out["part"] == part]
        return hll_estimate(dict(zip(sub["bucket"], sub["val"])))

    approx = est("a") + est("b") - est("u")
    assert abs(approx - true_x) <= max(0.5 * true_x, 10)
    # union registers really are the elementwise max
    a = out[out["part"] == "a"].set_index("bucket")["val"]
    b = out[out["part"] == "b"].set_index("bucket")["val"]
    u = out[out["part"] == "u"].set_index("bucket")["val"]
    for k in u.index:
        assert u[k] == max(a.get(k, 0), b.get(k, 0))
