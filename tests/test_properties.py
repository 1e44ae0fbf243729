"""Property-based hardening (hypothesis) for the oracle-parity layer.

These run WITHOUT Ray: they fuzz the pure kernels against the very
DuckDB SQL the driver gate uses (`pipelines.oracles`), on arbitrary
unicode the fixed fixtures cannot cover.  A failure here means the
Ray-vs-oracle gate would diverge on some real-world input even though
it passes on the shipped testdata.
"""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

# text with unicode whitespace, astral chars, CJK, punctuation — the
# classes that historically broke cross-engine parity
_texts = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Z", "S"),
        include_characters=" \t\n\r\f\v  一鿿😀é",
    ),
    max_size=300,
)


def _oracle_over(df: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", df)
    return con.sql(sql).df()


@settings(max_examples=30, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=5))
def test_fingerprint_oracle_parity_fuzz(texts):
    from bb_ocr_ray.functions.hashing import md5_hex, rolling_fingerprint
    from bb_ocr_ray.pipelines.oracles import ORACLES

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = _oracle_over(df, ORACLES["q_fingerprint"]).sort_values("doc_id")
    for _, row in got.iterrows():
        t = texts[int(row["doc_id"])]
        assert int(row["fingerprint"]) == rolling_fingerprint(t or "")
        assert row["content_md5"] == md5_hex(t or "")


@settings(max_examples=30, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=5))
def test_langid_oracle_parity_fuzz(texts):
    from bb_ocr_ray.functions.textstats import detect_lang
    from bb_ocr_ray.pipelines.oracles import ORACLES

    df = pd.DataFrame(
        {"doc_id": range(len(texts)),
         "text": texts,
         # lang column only feeds the agreement aggregate; use the
         # prediction itself so n_agree == n_docs iff parity holds
         "lang": [detect_lang(t) for t in texts]})
    got = _oracle_over(df, ORACLES["q_langid"])
    assert int(got["n_agree"].sum()) == len(texts), (
        f"oracle lang_pred diverged from detect_lang on {texts!r}")


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)),
                min_size=1, max_size=40))
def test_connected_components_matches_union_find(pairs):
    """Driver CC (min-label + pointer jumping) vs a plain union-find
    reference on random small graphs."""
    from bb_ocr_ray.stages.dedup import connected_components

    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    df = pd.DataFrame(pairs, columns=["id_a", "id_b"])

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    got = connected_components(df)
    got_map = dict(zip(got["doc_id"], got["component"]))
    # union-find roots are not guaranteed minimal per component; build
    # min-per-root before comparing
    comp_min: dict = {}
    for n, r in want.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want_min = {n: comp_min[r] for n, r in want.items()}
    assert got_map == want_min


@settings(max_examples=80, deadline=None)
@given(st.lists(
    st.text(alphabet="abcdefgh0123456789-", min_size=1, max_size=8),
    min_size=1, max_size=6))
def test_registrable_domain_properties(labels):
    from bb_ocr_ray.functions.scalars import registrable_domain

    host = ".".join(labels)
    out = registrable_domain(host)
    # idempotent, lowercase, and a dot-suffix of the lowered input
    assert registrable_domain(out) == out
    assert out == out.lower()
    low = host.lower().rstrip(".")
    assert low.endswith(out)
    assert out.count(".") <= 2


@settings(max_examples=50, deadline=None)
@given(_texts)
def test_ws_tokens_sql_parity_fuzz(text):
    """hashing.ws_tokens must agree with the RE2 split every sketch
    oracle uses, including on unicode whitespace Python's str.split()
    would treat differently."""
    from bb_ocr_ray.functions.hashing import ws_tokens

    got = duckdb.sql(
        "SELECT list_filter(regexp_split_to_array(?, "
        "'[ \t\n\r\f\v]+'), x -> x <> '') AS tk", params=[text]
    ).fetchone()[0]
    assert list(got) == ws_tokens(text)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9),
                min_size=1, max_size=60))
def test_cms_oracle_parity_fuzz(user_ids):
    """The q_cms_heavy_hitters register CTE (md5_number_upper % width
    per salted row) must agree with the engine's cms_buckets / min-
    over-rows estimate on arbitrary int64 keys — the identity the
    whole sketch oracle rests on."""
    from bb_ocr_ray.functions.hashing import _CMS_DEPTH, cms_buckets

    con = duckdb.connect()
    df = pd.DataFrame({"user_id": pd.array(user_ids, dtype="int64")})
    con.register("events", df)
    got = con.sql("""
        WITH ev AS (SELECT user_id, CAST(user_id AS VARCHAR) AS k
                    FROM events WHERE user_id IS NOT NULL),
        rowh AS (SELECT user_id,
                    CAST(md5_number_upper('cms0|' || k) % 1024 AS BIGINT) AS h0,
                    CAST(md5_number_upper('cms1|' || k) % 1024 AS BIGINT) AS h1,
                    CAST(md5_number_upper('cms2|' || k) % 1024 AS BIGINT) AS h2,
                    CAST(md5_number_upper('cms3|' || k) % 1024 AS BIGINT) AS h3
                 FROM ev)
        SELECT DISTINCT user_id, h0, h1, h2, h3 FROM rowh
    """).df()
    for _, row in got.iterrows():
        assert [int(row[f"h{i}"]) for i in range(_CMS_DEPTH)] == \
            cms_buckets(str(int(row["user_id"])))
    # and the min-over-rows estimate upper-bounds the true count
    import numpy as np

    from bb_ocr_ray.functions.hashing import _CMS_WIDTH

    reg = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
    keys, counts = np.unique(np.array(user_ids), return_counts=True)
    for k, c in zip(keys, counts):
        for i, b in enumerate(cms_buckets(str(int(k)))):
            reg[i, b] += int(c)
    for k, c in zip(keys, counts):
        est = min(reg[i, b] for i, b in
                  enumerate(cms_buckets(str(int(k)))))
        assert est >= c


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3),
                          st.floats(0, 100, allow_nan=False)),
                min_size=1, max_size=40))
def test_ntile_split_oracle_parity_fuzz(rows):
    """The engine's ntile split (first n mod k runs get the extra row,
    over (value, event_id) order) must agree with DuckDB's ntile on
    arbitrary groups, including heavy value ties."""
    import numpy as np

    con = duckdb.connect()
    df = pd.DataFrame({
        "event_id": range(len(rows)),
        "event_type": [f"t{g}" for g, _ in rows],
        # quantize to provoke ties across rows
        "value": [round(v, 1) for _, v in rows]})
    con.register("events", df)
    got = con.sql("""
        SELECT event_id, ntile(4) OVER (PARTITION BY event_type
                                        ORDER BY value, event_id) AS q
        FROM events
    """).df().set_index("event_id")["q"]
    for et, g in df.groupby("event_type"):
        g = g.sort_values(["value", "event_id"])
        n = len(g)
        base, extra = divmod(n, 4)
        sizes = [base + 1] * extra + [base] * (4 - extra)
        mine = np.repeat(np.arange(1, 5), sizes)[:n]
        theirs = got.loc[g["event_id"]].to_numpy()
        assert (mine == theirs).all(), (et, mine, theirs)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.floats(-5, 5, allow_nan=False)),
                min_size=1, max_size=40))
def test_mode_tiebreak_oracle_parity_fuzz(rows):
    """The engine's mode argmax (count desc, value asc) must agree
    with the QUALIFY row_number oracle under arbitrary tie patterns
    (including negative floors)."""
    import math

    con = duckdb.connect()
    df = pd.DataFrame({
        "event_type": [f"t{g}" for g, _ in rows],
        "value": [v for _, v in rows]})
    con.register("events", df)
    got = con.sql("""
        WITH c AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS v,
                          count(*) AS n
                   FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
        SELECT event_type, v AS mode_value, n AS n_mode FROM c
        QUALIFY row_number() OVER (PARTITION BY event_type
                                   ORDER BY n DESC, v) = 1
    """).df().set_index("event_type")
    for et, g in df.groupby("event_type"):
        counts = {}
        for v in g["value"]:
            fv = math.floor(v)
            counts[fv] = counts.get(fv, 0) + 1
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert int(got.loc[et, "mode_value"]) == best[0]
        assert int(got.loc[et, "n_mode"]) == best[1]
