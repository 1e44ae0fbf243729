"""DuckDB oracle SQL for every SQL-expressible query in the registry.

Column names and value semantics are mirrored EXACTLY against
``bb_ocr_ray.pipelines.queries`` (the driver sorts columns by name and
hashes values).  Conventions:
  - float aggregates rounded to the same decimals as the Ray side;
  - ratios emitted as integer (numerator, denominator) pairs;
  - whitespace collapse uses the ASCII class ``[ \\t\\n\\r\\f\\v]+`` —
    the same class the kernel's ``collapse_ws`` compiles;
  - the q_extract_pages / q_domain_stats oracles invert the pages
    template from ``bb_ocr_ray.sources.pages`` (url layout, megadoc
    K=8 repeat with '\\n\\n' separators) — keep in sync with it.

Queries with NO entry here (q_ivf_topk, q_binary_features) are
approximate-by-construction or have no SQL-expressible kernel; the
driver records a rows-only check and unit tests cover their semantics
on fixtures.  Everything else — including the sketch family
(minhash LSH, simhash, near-dup dedup) and the heuristics (langid,
fingerprint) — is oracled with SQL GENERATED at import time from the
engine's own constants (see the bottom of this file), so the two
sides cannot drift.
"""

# Shared SQL fragments (template inversion — see sources/pages.py)
_URL = (
    "'https://' || CASE WHEN doc_id % 10 < 3 THEN 'hot.example.com' "
    "ELSE 'site' || CAST(doc_id % 10 AS VARCHAR) || '.example.com' END "
    "|| '/doc-' || CAST(doc_id AS VARCHAR)"
)
_DOMAIN = (
    "CASE WHEN doc_id % 10 < 3 THEN 'hot.example.com' "
    "ELSE 'site' || CAST(doc_id % 10 AS VARCHAR) || '.example.com' END"
)
_NORM = r"trim(regexp_replace(coalesce(text, ''), '[ \t\n\r\f\v]+', ' ', 'g'))"
_NTOK = ("(length(coalesce(text, '')) - "
         "length(replace(coalesce(text, ''), ' ', '')) + 1)")

ORACLES = {
    "q1_pricing_summary": """
        -- Integer-cent exact money sums (mirror of the engine's int64
        -- fold; a float sum's rounding stopped matching at sf0.1)
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)        AS sum_qty,
               round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
                     / 100.0, 2)                AS sum_base_price,
               round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100.0) AS BIGINT)))
                     / 10000.0, 2)              AS sum_disc_price,
               count(*)                         AS count_order,
               round(sum(l_quantity) / count(*), 4) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2
    """,
    "q_filter_project": """
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_totalprice > 400000.0
    """,
    "q_topk_per_group": """
        SELECT o_orderkey, o_totalprice, o_orderpriority, rank FROM (
            SELECT o_orderkey, o_totalprice, o_orderpriority,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rank
            FROM orders) WHERE rank <= 3
    """,
    "q_distinct": """
        SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    "q_count_distinct": """
        SELECT c_mktsegment,
               count(DISTINCT c_nationkey) AS n_nations,
               count(*) AS n_customers
        FROM customer GROUP BY 1
    """,
    "q_hash_join": """
        SELECT o_orderstatus,
               round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100.0) AS BIGINT)))
                     / 10000.0, 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "q_broadcast_join_nation": """
        SELECT r_name, count(*) AS n_customers,
               round(sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) / 100.0, 2) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1
    """,
    "q5_revenue_by_nation": """
        SELECT n_name,
               round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100.0) AS BIGINT)))
                     / 10000.0, 2) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        GROUP BY 1
    """,
    "q_anti_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 300000.0)
    """,
    "q_semi_join": """
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
    """,
    "q_union": """
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 450000.0
        UNION ALL
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 1000.0
    """,
    "q_events_hourly": """
        SELECT event_type,
               CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
               count(*) AS n_events,
               coalesce(round(sum(value), 4), 0.0) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q_sessionize": """
        WITH g AS (
            SELECT user_id,
                   epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS gap
            FROM events WHERE user_id IS NOT NULL)
        SELECT user_id,
               count(*) AS n_events,
               count(CASE WHEN gap > 1800 THEN 1 END) + 1 AS n_sessions
        FROM g GROUP BY user_id
    """,
    "q_json_extract": r"""
        WITH x AS (
            SELECT event_type,
                   TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
            FROM events)
        SELECT event_type,
               CAST(sum(coalesce(k, 0)) AS BIGINT) AS sum_k,
               count(k) AS n_parsed,
               count(*) AS n_rows
        FROM x GROUP BY 1
    """,
    "q_doc_stats": f"""
        SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(sum({_NTOK}) AS BIGINT) AS sum_tokens,
               max(n_chars) AS max_chars, min(n_chars) AS min_chars
        FROM documents GROUP BY 1
    """,
    "q_doc_quality": f"""
        SELECT source, count(*) AS n_docs,
               CAST(sum({_NTOK}) AS BIGINT) AS sum_tokens,
               CAST(sum(len(list_filter(string_split(coalesce(text, ''), ' '),
                   x -> x IN ('the','a','and','of','to','in','is')))) AS BIGINT) AS sum_stop_tokens,
               CAST(sum(length(regexp_replace(coalesce(text, ''), '[\\w\\s]', '', 'g'))) AS BIGINT) AS sum_punct
        FROM documents GROUP BY 1
    """,
    "q_dedup_exact": """
        SELECT md5(coalesce(text, '')) AS content_md5,
               min(doc_id) AS keep_doc_id,
               count(*) AS n_copies
        FROM documents GROUP BY 1
    """,
    "q_jaccard_pairs": """
        WITH s AS (SELECT doc_id, list_distinct(string_split(coalesce(text, ''), ' ')) AS toks
                   FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.toks, b.toks)) AS inter,
               len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS uni
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE 2 * len(list_intersect(a.toks, b.toks))
              >= len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))
          AND len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) > 0
    """,
    "q_ann_topk": """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 10),
             pairs AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS score
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id),
             ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, neighbor_id) AS rank
                FROM pairs)
        SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
    """,
    # IVF-with-exact-refinement: output provably equals brute force
    # (triangle-inequality pruning, stages/ann.ivf_topk_exact), so the
    # oracle is the same cross-join SQL over this query's id range
    "q_ivf_topk": """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id >= 10 AND vec_id < 20),
             pairs AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS score
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id),
             ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, neighbor_id) AS rank
                FROM pairs)
        SELECT query_id, rank, neighbor_id FROM ranked WHERE rank <= 5
    """,
    # planted-twin probe: brute-force cosine between the 25 planted
    # twins (vec_id + 1e6, every coordinate + 0.01) and everything —
    # the Ray side restricts its LSH output to twin-involving pairs,
    # so both sides enumerate the same O(|twins| x n) pair space
    "q_embedding_near_dups": """
        WITH base AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings),
        twins AS (
            SELECT vec_id + 1000000 AS vec_id,
                   list_transform(v, x -> x + 0.01) AS v
            FROM base WHERE vec_id < 25),
        allv AS (SELECT * FROM base UNION ALL SELECT * FROM twins)
        SELECT DISTINCT least(t.vec_id, a.vec_id) AS id_a,
               greatest(t.vec_id, a.vec_id) AS id_b
        FROM twins t JOIN allv a ON a.vec_id <> t.vec_id
        WHERE list_cosine_similarity(t.v, a.v) >= 0.9
    """,
    "q_extract_pages": f"""
        WITH d AS (SELECT doc_id, {_NORM} AS norm FROM documents)
        SELECT {_URL} AS url,
               CASE WHEN length(norm) < 10 THEN ''
                    WHEN doc_id % 101 = 0
                    THEN norm || repeat(chr(10) || chr(10) || norm, 7)
                    ELSE norm END AS text,
               CASE WHEN length(norm) < 10 THEN 'empty' ELSE 'ok' END AS status,
               CAST(CASE WHEN length(norm) < 10 THEN 0
                         WHEN doc_id % 101 = 0 THEN 8
                         ELSE 1 END AS INTEGER) AS n_blocks_kept
        FROM d
    """,
    "q_domain_stats": f"""
        WITH d AS (SELECT doc_id, {_DOMAIN} AS domain,
                          length({_NORM}) AS L,
                          CASE WHEN doc_id % 101 = 0 THEN 8 ELSE 1 END AS K
                   FROM documents)
        SELECT domain, count(*) AS n_docs,
               CAST(sum(CASE WHEN L < 10 THEN 0
                             ELSE K * L + 2 * (K - 1) END) AS BIGINT)
                   AS extracted_chars,
               CAST(sum(CASE WHEN L < 10 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_errors
        FROM d GROUP BY 1
    """,
    "q_dedup_pages": f"""
        SELECT {_URL} AS url, lang FROM documents
    """,
}

ORACLES.update({
    "q_global_topk": """
        SELECT o_orderkey, o_totalprice, rank FROM (
            SELECT o_orderkey, o_totalprice,
                   row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank
            FROM orders) WHERE rank <= 20
    """,
    "q_offer_ranking": """
        WITH scored AS (
            SELECT p_brand, p_partkey, p_retailprice,
                   3.0 * (CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END)
                 + 1.5 * (CASE WHEN p_type LIKE 'ECONOMY%' THEN 1 ELSE 0 END)
                 + 1.0 * (CASE WHEN p_size BETWEEN 10 AND 20 THEN 1 ELSE 0 END)
                   AS score
            FROM part),
             ranked AS (
            SELECT p_brand, p_partkey, score, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY score DESC, p_retailprice, p_partkey)
                   AS rank
            FROM scored)
        SELECT p_brand, p_partkey, score, p_retailprice, rank
        FROM ranked WHERE rank <= 2
    """,
    "q_keyword_genre": """
        WITH scored AS (
            SELECT doc_id,
                   len(list_filter(string_split(coalesce(text, ''), ' '),
                       x -> x IN ('data','table','column','row')))   AS s_data,
                   len(list_filter(string_split(coalesce(text, ''), ' '),
                       x -> x IN ('query','filter','join','sort')))  AS s_query,
                   len(list_filter(string_split(coalesce(text, ''), ' '),
                       x -> x IN ('stream','window','batch','event'))) AS s_stream
            FROM documents),
             labeled AS (
            SELECT CASE
                     WHEN s_data = 0 AND s_query = 0 AND s_stream = 0 THEN 'none'
                     WHEN s_data >= s_query AND s_data >= s_stream THEN 'data'
                     WHEN s_query >= s_stream THEN 'query'
                     ELSE 'stream' END AS genre
            FROM scored)
        SELECT genre, count(*) AS n_docs FROM labeled GROUP BY 1
    """,
    "q_asof_join": """
        SELECT e.event_id,
               coalesce(CAST(floor(epoch(max(c.ts))) AS BIGINT), -1) AS last_click_epoch
        FROM events e
        LEFT JOIN events c
          ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
        WHERE e.event_type = 'error'
        GROUP BY e.event_id
    """,
    "q_events_sliding": """
        WITH hourly AS (
            SELECT event_type,
                   CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                   count(*) AS n
            FROM events GROUP BY 1, 2)
        SELECT a.event_type, a.hour_epoch,
               CAST(sum(b.n) AS BIGINT) AS n_events_6h
        FROM hourly a JOIN hourly b
          ON a.event_type = b.event_type
         AND b.hour_epoch > a.hour_epoch - 6 * 3600
         AND b.hour_epoch <= a.hour_epoch
        GROUP BY 1, 2
    """,
})

ORACLES.update({
    "q6_revenue_delta": """
        SELECT coalesce(round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                              * CAST(round(l_discount * 100.0) AS BIGINT))
                          / 10000.0, 2), 0.0)
                   AS revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 25
    """,
    "q_running_total": """
        WITH c AS (SELECT o_custkey FROM orders GROUP BY 1 HAVING count(*) >= 8)
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING), 2) AS running_total
        FROM orders WHERE o_custkey IN (SELECT o_custkey FROM c)
    """,
})

ORACLES.update({
    "q_reading_order": """
        SELECT l_orderkey AS page, l_linenumber AS item_id,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY (l_linenumber * 40) // 40,
                            (l_partkey % 7) * 140,
                            l_linenumber * 40,
                            l_linenumber) AS reading_rank
        FROM lineitem
    """,
})

ORACLES.update({
    "q_hash_sample": """
        SELECT doc_id FROM documents
        WHERE CAST('0x' || substr(md5(coalesce(text, '')), 1, 2) AS INTEGER) < 64
    """,
    "q_value_histogram": """
        SELECT event_type,
               CAST(least(greatest(CAST(floor((value - 0.0) / (100.0 - 0.0)
                    * 20) AS INTEGER), 0), 19) AS BIGINT) AS bin,
               count(*) AS n
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    """,
    "q_rollup": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0, 2) AS revenue
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
})

ORACLES.update({
    "q_median": """
        SELECT event_type, quantile_disc(value, 0.5) AS median_value
        FROM events GROUP BY 1
    """,
    "q_knn_label": """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 20),
             ranked AS (
                SELECT q.query_id, e.label,
                       row_number() OVER (PARTITION BY q.query_id
                           ORDER BY list_cosine_similarity(q.qv,
                                    CAST(e.embedding AS DOUBLE[])) DESC,
                                    e.vec_id) AS rank
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id <> q.query_id),
             votes AS (
                SELECT query_id, label, count(*) AS n
                FROM ranked WHERE rank <= 5 GROUP BY 1, 2),
             best AS (
                SELECT query_id, label AS pred_label,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY n DESC, label) AS r
                FROM votes)
        SELECT query_id, CAST(pred_label AS BIGINT) AS pred_label
        FROM best WHERE r = 1
    """,
})

ORACLES.update({
    "q_provider_fanout": """
        WITH exact AS (
            SELECT s_suppkey AS record_key, p_partkey AS listing_id,
                   p_retailprice AS amount, 'exact' AS provider
            FROM supplier JOIN part ON p_partkey = s_suppkey * 4),
             size_scan AS (
            SELECT s_suppkey AS record_key, p_partkey AS listing_id,
                   p_retailprice AS amount, 'size_scan' AS provider
            FROM supplier JOIN part ON p_size = s_suppkey % 50
            WHERE p_partkey % 25 = 0),
             merged AS (SELECT * FROM exact UNION ALL SELECT * FROM size_scan),
             deduped AS (
            SELECT record_key, listing_id, amount,
                   row_number() OVER (PARTITION BY record_key, provider,
                                      listing_id ORDER BY provider) AS rn
            FROM merged)
        SELECT CAST(record_key AS BIGINT) AS record_key,
               count(*) AS n_offers,
               min(amount) AS best_amount
        FROM deduped WHERE rn = 1 GROUP BY 1
    """,
})


# ---------------------------------------------------------------------------
# q_langid / q_fingerprint oracles — generated from the SAME constants
# the engine uses (bb_ocr_ray.functions.{textstats,hashing}) so the two
# sides cannot drift.  Every detect_lang step is SQL-mirrorable by
# construction: codepoint slice (substr), float CJK-share compare,
# ASCII-only lowering (translate), non-overlapping substring counts
# (length-difference // pattern length), earliest-wins argmax (CASE
# chain in _LANG_ORDER order).
# ---------------------------------------------------------------------------
def _langid_pred_cte() -> str:
    """The shared WITH…pred prefix: every detect_lang step mirrored in
    SQL generated from the engine's own profile tables.  Used by both
    the accuracy oracle (q_langid) and the confusion-matrix oracle
    (q_lang_confusion) so the classifier mirror cannot drift between
    them."""
    from bb_ocr_ray.functions.textstats import _LANG_ORDER, _LANG_PROFILES

    def score_expr(lang: str) -> str:
        terms = [
            f"(length(low) - length(replace(low, '{tri}', ''))) // {len(tri)}"
            for tri in _LANG_PROFILES[lang]
        ]
        return "(" + " + ".join(terms) + ")"

    scores = ",\n               ".join(
        f"{score_expr(lang)} AS s_{lang}" for lang in _LANG_ORDER)
    branches = []
    for i, lang in enumerate(_LANG_ORDER):
        conds = [f"s_{lang} > 0"] + [
            f"s_{lang} >= s_{other}" for other in _LANG_ORDER if other != lang
        ]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "\n                    ".join(branches)
    return f"""
        WITH s AS (
            SELECT lang,
                   substr(coalesce(text, ''), 1, 2000) AS samp,
                   translate(substr(coalesce(text, ''), 1, 2000),
                             'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                             'abcdefghijklmnopqrstuvwxyz') AS low
            FROM documents),
        sc AS (
            SELECT lang, samp,
               {scores},
               len(regexp_extract_all(samp, '[\\x{{4E00}}-\\x{{9FFF}}]')) AS cjk
            FROM s),
        pred AS (
            SELECT lang,
               CASE WHEN CAST(cjk AS DOUBLE) / greatest(1, length(samp)) > 0.2
                    THEN 'zh'
                    {case}
                    ELSE 'und' END AS lang_pred
            FROM sc)"""


def _langid_oracle_sql() -> str:
    return _langid_pred_cte() + """
        SELECT lang,
               CAST(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_agree,
               count(*) AS n_docs
        FROM pred GROUP BY 1
    """


def _lang_confusion_oracle_sql() -> str:
    return _langid_pred_cte() + """
        SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n
        FROM pred GROUP BY 1, 2 ORDER BY 1, 2
    """


def _fingerprint_oracle_sql() -> str:
    from bb_ocr_ray.functions.hashing import MERSENNE

    return f"""
        SELECT doc_id,
               CASE WHEN length(coalesce(text, '')) = 0 THEN 0
                    ELSE CAST(list_reduce(
                        list_prepend(CAST(0 AS HUGEINT), list_transform(
                            generate_series(1, length(coalesce(text, ''))),
                            i -> CAST(ord(substr(coalesce(text, ''), i, 1))
                                      AS HUGEINT))),
                        (acc, x) -> (acc * 257 + x) % {MERSENNE}
                    ) AS BIGINT) END AS fingerprint,
               md5(coalesce(text, '')) AS content_md5
        FROM documents
    """


ORACLES["q_sessionize_stream"] = ORACLES["q_sessionize"]

ORACLES.update({
    "q_langid": _langid_oracle_sql(),
    "q_fingerprint": _fingerprint_oracle_sql(),
})


# ---------------------------------------------------------------------------
# Sketch-family oracles (minhash LSH candidates, simhash near-dups, the
# full near-dup dedup pipeline) — generated from the engine's own seeded
# permutation constants.  Every arithmetic step is mirrored exactly:
#   - shingle hash = md5_number_upper == int.from_bytes(md5[:8],'little')
#     (bit-identical to functions.hashing.stable_u64, verified);
#   - the numpy uint64 WRAP in (x*a + b) % p is emulated in HUGEINT as
#     ((x*a) % 2^64 + b) % 2^64 % p;
#   - tokenization is the shared ASCII class [ \t\n\r\f\v]+ (ws_tokens);
#   - bucket cap 64 + consecutive-chain tail mirrored with row_number;
#   - the engine's md5-digest band surrogate is replaced by direct
#     band-value equality (identical grouping, no digest collisions on
#     fixed data);
#   - connected components as a recursive transitive closure with
#     min-label (equivalent to the engine's alternating-star result).
# ---------------------------------------------------------------------------
def _minhash_cte() -> str:
    from bb_ocr_ray.functions.hashing import _N_PERM, _PERM_A, _PERM_B

    perm_rows = ",".join(
        f"({p},{int(_PERM_A[p])},{int(_PERM_B[p])})" for p in range(_N_PERM))
    return f"""toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''),
                     '[ \t\n\r\f\v]+'), x -> x <> '') AS tk
  FROM documents),
sh AS (
  SELECT doc_id,
     CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
          WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
          ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
     END AS shs
  FROM toks),
hx AS (SELECT doc_id, md5_number_upper(unnest(shs)) AS x FROM sh),
perms(p, a, b) AS (VALUES {perm_rows}),
vals AS (
  SELECT doc_id, p,
         CAST(((CAST(x AS HUGEINT) * a) % 18446744073709551616 + b)
              % 18446744073709551616 % 2305843009213693951 AS UBIGINT) AS v
  FROM hx CROSS JOIN perms),
sig AS (SELECT doc_id, p, min(v) AS v FROM vals GROUP BY 1, 2),
sig2 AS (SELECT * FROM sig
         UNION ALL
         SELECT s.doc_id, r.range AS p,
                CAST(18446744073709551615 AS UBIGINT) AS v
         FROM sh s CROSS JOIN range(0, {_N_PERM}) r WHERE len(s.shs) = 0),
bands AS (
  SELECT doc_id, p // 4 AS band_id, list(v ORDER BY p) AS bv
  FROM sig2 GROUP BY 1, 2),
grp AS (
  SELECT band_id, bv, doc_id,
         row_number() OVER (PARTITION BY band_id, bv ORDER BY doc_id) AS rn
  FROM bands),
mh_pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM grp a JOIN grp b
    ON a.band_id = b.band_id AND a.bv = b.bv AND a.rn < b.rn
  WHERE b.rn <= 64 OR b.rn = a.rn + 1)"""


_SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''),
                     '[ \t\n\r\f\v]+'), x -> x <> '') AS tk
  FROM documents),
sh2 AS (
  SELECT doc_id,
     CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
          WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
          ELSE list_distinct(list_transform(generate_series(1, len(tk) - 1),
                 i -> tk[i] || ' ' || tk[i+1]))
     END AS shs
  FROM toks),
hx2 AS (SELECT doc_id, md5_number_upper(unnest(shs)) AS x FROM sh2),
bits AS (
  SELECT doc_id, r.range AS bit,
         sum(CASE WHEN (x >> r.range) & 1 = 1 THEN 1 ELSE 0 END) AS cnt,
         count(*) AS n
  FROM hx2 CROSS JOIN range(0, 64) r GROUP BY 1, 2),
shv0 AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN cnt * 2 > n
                       THEN CAST(CAST(1 AS UBIGINT) << bit AS HUGEINT)
                       ELSE 0 END) AS UBIGINT) AS sh
  FROM bits GROUP BY 1),
shv AS (SELECT * FROM shv0
        UNION ALL
        SELECT doc_id, CAST(0 AS UBIGINT) FROM sh2 WHERE len(shs) = 0),
ex AS (
  SELECT doc_id, sh, t.range AS table_id,
         CAST((sh >> (16 * t.range)) & 65535 AS BIGINT) AS band
  FROM shv CROSS JOIN range(0, 4) t),
grp AS (
  SELECT table_id, band, doc_id, sh,
         row_number() OVER (PARTITION BY table_id, band ORDER BY doc_id) AS rn
  FROM ex),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.sh, b.sh)) AS hamming
  FROM grp a JOIN grp b
    ON a.table_id = b.table_id AND a.band = b.band AND a.rn < b.rn
  WHERE b.rn <= 64 OR b.rn = a.rn + 1)
SELECT id_a, id_b, CAST(min(hamming) AS BIGINT) AS hamming
FROM cand WHERE hamming <= 3 GROUP BY 1, 2
"""


def _near_dup_dedup_sql() -> str:
    return f"""
WITH RECURSIVE {_minhash_cte()},
tsets AS (SELECT doc_id, list_distinct(string_split(coalesce(text, ''), ' ')) AS ts
          FROM documents),
vp AS (
  SELECT p.id_a, p.id_b
  FROM mh_pairs p
  JOIN tsets ta ON ta.doc_id = p.id_a
  JOIN tsets tb ON tb.doc_id = p.id_b
  WHERE len(ta.ts) + len(tb.ts) - len(list_intersect(ta.ts, tb.ts)) > 0
    AND 2 * len(list_intersect(ta.ts, tb.ts))
        >= len(ta.ts) + len(tb.ts) - len(list_intersect(ta.ts, tb.ts))),
sym AS (SELECT id_a AS a, id_b AS b FROM vp
        UNION SELECT id_b, id_a FROM vp),
reach(a, b) AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
comp AS (
  SELECT a AS node, least(min(b), a) AS component FROM reach GROUP BY a)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT node FROM comp WHERE component < node)
"""


ORACLES.update({
    "q_minhash_candidates":
        f"WITH {_minhash_cte()} SELECT id_a, id_b FROM mh_pairs",
    "q_minhash_est": f"""
        WITH {_minhash_cte()}
        SELECT p.id_a, p.id_b,
               count(*) FILTER (WHERE sa.v = sb.v) AS n_eq_slots
        FROM mh_pairs p
        JOIN sig2 sa ON sa.doc_id = p.id_a
        JOIN sig2 sb ON sb.doc_id = p.id_b AND sb.p = sa.p
        GROUP BY 1, 2
    """,
    "q_simhash_near_dups": _SIMHASH_SQL,
    "q_near_dup_dedup": _near_dup_dedup_sql(),
})


def _registrable_domain_sql() -> str:
    from bb_ocr_ray.functions.scalars import PSL_2LEVEL

    psl = ", ".join(f"'{s}'" for s in PSL_2LEVEL)
    return f"""
        WITH h AS (
            SELECT CASE doc_id % 5
                WHEN 0 THEN 'shop.site' || CAST(doc_id % 7 AS VARCHAR) || '.co.uk'
                WHEN 1 THEN 'news.site' || CAST(doc_id % 7 AS VARCHAR) || '.com.au'
                WHEN 2 THEN 'a.b.site' || CAST(doc_id % 7 AS VARCHAR) || '.com'
                WHEN 3 THEN 'site' || CAST(doc_id % 7 AS VARCHAR) || '.org'
                ELSE 'cdn.site' || CAST(doc_id % 7 AS VARCHAR) || '.co.jp'
            END AS host
            FROM documents),
        p AS (SELECT host, string_split(host, '.') AS parts FROM h),
        r AS (SELECT CASE
                WHEN len(parts) <= 2 THEN host
                WHEN parts[-2] || '.' || parts[-1] IN ({psl})
                    THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
                ELSE parts[-2] || '.' || parts[-1]
              END AS domain
              FROM p)
        SELECT domain, count(*) AS n_docs FROM r GROUP BY 1
    """


ORACLES["q_registrable_domain"] = _registrable_domain_sql()


ORACLES.update({
    # md5-prefix stratified sampling: identical predicate per stratum
    "q_stratified_sample": """
        SELECT doc_id, lang FROM documents
        WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                   AS INTEGER)
              < CASE lang WHEN 'en' THEN 128 WHEN 'de' THEN 64 ELSE 32 END
    """,
    # bit_length(n) == floor(log2(n)) + 1 for n >= 1; n_tokens >= 1 by
    # the shared length-difference token formula
    "q_token_histogram": f"""
        WITH t AS (SELECT lang, {_NTOK} AS n FROM documents)
        SELECT lang,
               CAST(CASE WHEN n = 0 THEN 0
                         ELSE CAST(floor(log2(n)) AS BIGINT) + 1 END
                    AS BIGINT) AS bin,
               count(*) AS n_docs
        FROM t GROUP BY 1, 2
    """,
})


ORACLES["q_frame_sample"] = """
    WITH p AS (SELECT doc_id, hex(encode(coalesce(text, ''))) AS h
               FROM documents),
    f AS (SELECT doc_id AS item_id, h,
                 unnest(generate_series(0, length(h) // 512 - 1))
                     AS frame_idx
          FROM p)
    SELECT item_id, frame_idx,
           substr(h, 1 + CAST(frame_idx AS INTEGER) * 512, 512) AS frame_hex
    FROM f WHERE frame_idx % 4 = 0
"""


ORACLES["q_band_join"] = """
    SELECT a.event_id AS view_id, b.event_id AS purchase_id
    FROM events a JOIN events b
      ON a.event_type = 'view' AND b.event_type = 'purchase'
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 30000000
"""


ORACLES["q_left_join"] = """
    SELECT c.c_custkey, c.c_mktsegment,
           count(o.o_custkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
"""


ORACLES["q_pivot_events"] = """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS n_click,
           count(*) FILTER (WHERE event_type = 'error')    AS n_error,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           count(*) FILTER (WHERE event_type = 'view')     AS n_view,
           round(coalesce(
               sum(value) FILTER (WHERE event_type = 'purchase'), 0), 2)
               AS purchase_value
    FROM events WHERE user_id IS NOT NULL GROUP BY 1
"""


ORACLES["q_event_gaps"] = """
    WITH lagged AS (
        SELECT user_id,
               date_diff('microsecond',
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id),
                         ts) AS gap_us
        FROM events WHERE ts IS NOT NULL)
    SELECT user_id,
           count(gap_us) AS n_gaps,
           CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
           max(gap_us)   AS max_gap_us
    FROM lagged GROUP BY 1 HAVING count(*) >= 2
"""


ORACLES["q_group_concat"] = """
    SELECT r_name,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           count(*) AS n_nations
    FROM nation JOIN region ON r_regionkey = n_regionkey
    GROUP BY 1
"""


ORACLES["q_cube"] = """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) / 100.0, 2) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# Tokenization fragment shared with the sketch oracles: the engine's
# ws_tokens (ASCII whitespace class, empties dropped).  The \t\n\r\f\v
# below are REAL characters in the SQL string — RE2 char class.
_TOKS = ("list_filter(regexp_split_to_array(coalesce(text, ''), "
         "'[ \t\n\r\f\v]+'), x -> x <> '')")

ORACLES["q_repetition"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    pc AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
    cnt AS (SELECT doc_id, tok, count(*) AS c FROM pc GROUP BY 1, 2),
    agg AS (SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_tokens,
                   count(*) AS n_distinct,
                   max(c) AS max_tok_count
            FROM cnt GROUP BY 1)
    SELECT t.doc_id,
           coalesce(a.n_tokens, 0) AS n_tokens,
           coalesce(a.n_distinct, 0) AS n_distinct,
           coalesce(a.max_tok_count, 0) AS max_tok_count
    FROM toks t LEFT JOIN agg a USING (doc_id)
"""

ORACLES["q_dup_spans"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    wins AS (SELECT doc_id,
                    CASE WHEN len(tk) < 8 THEN CAST([] AS VARCHAR[])
                         ELSE list_transform(generate_series(1, len(tk) - 7),
                                  i -> array_to_string(tk[i:i+7], ' '))
                    END AS ws
             FROM toks),
    occ AS (SELECT doc_id, unnest(ws) AS w FROM wins),
    tot AS (SELECT w, count(*) AS total FROM occ GROUP BY 1)
    SELECT o.doc_id,
           count(*) AS n_windows,
           CAST(sum(CASE WHEN t.total >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_windows
    FROM occ o JOIN tot t USING (w)
    GROUP BY 1
"""


ORACLES["q_decontaminate"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    sh AS (SELECT doc_id,
                  CASE WHEN len(tk) < 8 THEN CAST([] AS VARCHAR[])
                       ELSE list_transform(generate_series(1, len(tk) - 7),
                                i -> array_to_string(tk[i:i+7], ' '))
                  END AS shs
           FROM toks),
    ev AS (SELECT DISTINCT unnest(shs) AS s FROM sh WHERE doc_id % 50 = 0),
    cand AS (SELECT doc_id, unnest(shs) AS s FROM sh WHERE doc_id % 50 <> 0)
    SELECT c.doc_id, count(DISTINCT c.s) AS n_hit_shingles
    FROM cand c JOIN ev e USING (s) GROUP BY 1
"""


ORACLES["q_percentiles"] = """
    SELECT event_type,
           quantile_disc(value, 0.25) AS p25,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.75) AS p75
    FROM events GROUP BY 1
"""


ORACLES["q_first_last"] = """
    WITH ordered AS (
        SELECT user_id, event_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM events WHERE user_id IS NOT NULL)
    SELECT f.user_id,
           f.event_id   AS first_event_id,
           f.event_type AS first_type,
           l.event_id   AS last_event_id,
           l.event_type AS last_type,
           f.n          AS n_events
    FROM ordered f
    JOIN ordered l ON f.user_id = l.user_id AND l.rn = l.n
    WHERE f.rn = 1
"""


ORACLES["q_ngram_freq"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    bg AS (SELECT CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
                       ELSE list_transform(generate_series(1, len(tk) - 1),
                                i -> tk[i] || ' ' || tk[i+1])
                  END AS bgs
           FROM toks)
    SELECT ngram, count(*) AS n
    FROM (SELECT unnest(bgs) AS ngram FROM bg)
    GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20
"""


ORACLES["q_doc_freq"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    dt AS (SELECT DISTINCT doc_id, unnest(tk) AS tok FROM toks)
    SELECT tok, count(*) AS df FROM dt
    GROUP BY 1 ORDER BY df DESC, tok LIMIT 20
"""


ORACLES["q_hll_registers"] = """
    WITH h AS (SELECT md5_number_upper(CAST(user_id AS VARCHAR)) AS hv
               FROM events WHERE user_id IS NOT NULL),
    b AS (SELECT CAST(hv & 63 AS BIGINT) AS bucket, hv >> 6 AS suffix
          FROM h),
    r AS (SELECT bucket,
                 CASE WHEN suffix = 0 THEN 59
                      ELSE least(59, 1 + bit_count(
                               xor(suffix, suffix - 1) >> 1)) END AS rho
          FROM b)
    SELECT bucket, CAST(max(rho) AS BIGINT) AS max_rho FROM r GROUP BY 1
"""


ORACLES["q_composite_join"] = """
    SELECT l.l_linestatus AS status,
           round(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100.0) AS BIGINT)))
                 / 10000.0, 2) AS revenue,
           count(*) AS n
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_linestatus = o.o_orderstatus
    GROUP BY 1
"""


ORACLES["q_full_join"] = """
    WITH c AS (SELECT user_id, count(*) AS n_clicks FROM events
               WHERE event_type = 'click' AND user_id % 2 = 0 GROUP BY 1),
    p AS (SELECT user_id, count(*) AS n_purchases FROM events
          WHERE event_type = 'purchase' AND user_id % 3 = 0 GROUP BY 1)
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(n_clicks, 0)    AS n_clicks,
           coalesce(n_purchases, 0) AS n_purchases
    FROM c FULL JOIN p ON c.user_id = p.user_id
"""


ORACLES["q_training_prep"] = f"""
    WITH toks AS (SELECT doc_id, source, {_TOKS} AS tk,
                         coalesce(text, '') AS txt
                  FROM documents),
    qual AS (SELECT * FROM toks
             WHERE len(tk) >= 10 AND doc_id % 50 <> 0),
    keep AS (SELECT min(doc_id) AS doc_id FROM qual GROUP BY md5(txt)),
    surv AS (SELECT q.* FROM qual q JOIN keep k USING (doc_id)),
    esh AS (SELECT DISTINCT unnest(
                CASE WHEN len(tk) < 8 THEN CAST([] AS VARCHAR[])
                     ELSE list_transform(generate_series(1, len(tk) - 7),
                              i -> array_to_string(tk[i:i+7], ' '))
                END) AS s
            FROM toks WHERE doc_id % 50 = 0),
    ssh AS (SELECT doc_id, unnest(
                CASE WHEN len(tk) < 8 THEN CAST([] AS VARCHAR[])
                     ELSE list_transform(generate_series(1, len(tk) - 7),
                              i -> array_to_string(tk[i:i+7], ' '))
                END) AS s
            FROM surv),
    contaminated AS (SELECT DISTINCT doc_id FROM ssh JOIN esh USING (s)),
    clean AS (SELECT * FROM surv
              WHERE doc_id NOT IN (SELECT doc_id FROM contaminated))
    SELECT source,
           count(*) AS n_docs,
           CAST(sum((len(tk) - 1) // 24 + 1) AS BIGINT) AS n_chunks,
           CAST(sum(len(tk)) AS BIGINT) AS n_tokens
    FROM clean GROUP BY 1
"""


ORACLES["q_pushdown_filter"] = """
    SELECT count(*) AS n,
           round(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                     * (100 - CAST(round(l_discount * 100.0) AS BIGINT)))
                 / 10000.0, 2) AS revenue
    FROM lineitem WHERE l_quantity < 10.0
"""


ORACLES["q_inverted_index"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    dt AS (SELECT DISTINCT doc_id, unnest(tk) AS tok FROM toks),
    top AS (SELECT tok, count(*) AS df FROM dt
            GROUP BY 1 ORDER BY df DESC, tok LIMIT 10)
    SELECT t.tok, t.df,
           string_agg(d.doc_id, '|' ORDER BY d.doc_id) AS postings
    FROM top t JOIN dt d USING (tok)
    GROUP BY 1, 2
"""


ORACLES["q_chunk_docs"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    starts AS (SELECT doc_id, tk,
                      unnest(generate_series(1, len(tk), 24)) AS s
               FROM toks WHERE len(tk) > 0)
    SELECT doc_id,
           CAST((s - 1) / 24 + 1 AS BIGINT) AS chunk_id,
           array_to_string(tk[s:s+31], ' ') AS chunk_text,
           CAST(least(32, len(tk) - s + 1) AS BIGINT) AS n_tok
    FROM starts
"""


def _pii_redact_sql() -> str:
    """Three-stage RE2 cascade mirroring functions.pii.REDACTION_CASCADE
    — generated from the engine's own pattern constants so pattern
    edits cannot drift the oracle."""
    from bb_ocr_ray.functions.pii import EMAIL_PAT, IPV4_PAT, PHONE_PAT

    return f"""
    WITH t0 AS (SELECT doc_id, coalesce(text, '') AS tx FROM documents),
    s1 AS (SELECT doc_id,
                  len(regexp_extract_all(tx, '{EMAIL_PAT}')) AS n_emails,
                  regexp_replace(tx, '{EMAIL_PAT}', '<EMAIL>', 'g') AS tx
           FROM t0),
    s2 AS (SELECT doc_id, n_emails,
                  len(regexp_extract_all(tx, '{PHONE_PAT}')) AS n_phones,
                  regexp_replace(tx, '{PHONE_PAT}', '<PHONE>', 'g') AS tx
           FROM s1),
    s3 AS (SELECT doc_id, n_emails, n_phones,
                  len(regexp_extract_all(tx, '{IPV4_PAT}')) AS n_ips,
                  regexp_replace(tx, '{IPV4_PAT}', '<IP>', 'g') AS tx
           FROM s2)
    SELECT doc_id, tx AS clean_text, n_emails, n_phones, n_ips FROM s3
    """


ORACLES["q_pii_redact"] = _pii_redact_sql()


# Paragraph-level exact dedup: first global (doc_id, idx) occurrence of
# each non-empty paragraph wins; docs keep surviving paragraphs joined
# in original order.  One row per doc with >= 1 non-empty paragraph.
ORACLES["q_paragraph_dedup"] = """
    WITH p AS (SELECT doc_id,
                      string_split(coalesce(text, ''),
                                   chr(10) || chr(10)) AS ps
               FROM documents),
    ex AS (SELECT doc_id, ps,
                  unnest(generate_series(1, len(ps))) AS i
           FROM p),
    occ AS (SELECT doc_id, i, ps[i] AS para FROM ex WHERE ps[i] <> ''),
    rk AS (SELECT doc_id, i, para,
                  row_number() OVER (PARTITION BY para
                                     ORDER BY doc_id, i) AS rn
           FROM occ),
    tot AS (SELECT doc_id, count(*) AS n_paras FROM occ GROUP BY 1),
    kept AS (SELECT doc_id, count(*) AS n_kept,
                    string_agg(para, chr(10) || chr(10) ORDER BY i)
                        AS new_text
             FROM rk WHERE rn = 1 GROUP BY doc_id)
    SELECT t.doc_id, t.n_paras,
           coalesce(k.n_kept, 0) AS n_kept,
           coalesce(k.new_text, '') AS new_text
    FROM tot t LEFT JOIN kept k USING (doc_id)
"""


# TF-IDF top-3 per doc: the rank key is the integer triple
# (tf DESC, df ASC, tok ASC); the float score is decoration (round 6).
ORACLES["q_tfidf"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    pc AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM pc GROUP BY 1, 2),
    df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n FROM documents),
    rk AS (SELECT t.doc_id, t.tok, t.tf, d.df,
                  row_number() OVER (PARTITION BY t.doc_id
                                     ORDER BY t.tf DESC, d.df ASC, t.tok)
                      AS rn
           FROM tf t JOIN df d USING (tok))
    SELECT doc_id, tok, tf, df,
           round(tf * ln((SELECT n FROM n) * 1.0 / df), 6) AS score
    FROM rk WHERE rn <= 3
"""


# Bloom register state: md5-only Kirsch-Mitzenmacher double hashing,
# (h1 + i*h2) % 512 for i in 0..2 — mirrors hashing.bloom_positions_u64.
ORACLES["q_bloom_registers"] = """
    WITH h AS (SELECT md5_number_upper(CAST(o_custkey AS VARCHAR)) AS hv
               FROM orders WHERE o_custkey IS NOT NULL),
    d AS (SELECT CAST(hv & 4294967295 AS BIGINT) AS h1,
                 CAST(((hv >> 32) & 4294967295) | 1 AS BIGINT) AS h2
          FROM h),
    p AS (SELECT (h1 + i * h2) % 512 AS bit_pos
          FROM d, (SELECT unnest(generate_series(0, 2)) AS i) t)
    SELECT DISTINCT CAST(bit_pos AS BIGINT) AS bit_pos FROM p
"""


ORACLES["q_train_split"] = """
    WITH h AS (SELECT source, n_chars,
                      md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 AS b
               FROM documents),
    s AS (SELECT CASE WHEN b < 90 THEN 'train'
                      WHEN b < 95 THEN 'val'
                      ELSE 'test' END AS split,
                 source, n_chars
          FROM h)
    SELECT split, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM s GROUP BY 1, 2
"""


ORACLES["q_hll_grouped"] = """
    WITH h AS (SELECT event_type,
                      md5_number_upper(CAST(user_id AS VARCHAR)) AS hv
               FROM events WHERE user_id IS NOT NULL),
    b AS (SELECT event_type, CAST(hv & 63 AS BIGINT) AS bucket,
                 hv >> 6 AS suffix
          FROM h),
    r AS (SELECT event_type, bucket,
                 CASE WHEN suffix = 0 THEN 59
                      ELSE least(59, 1 + bit_count(
                               xor(suffix, suffix - 1) >> 1)) END AS rho
          FROM b)
    SELECT event_type, bucket, CAST(max(rho) AS BIGINT) AS max_rho
    FROM r GROUP BY 1, 2
"""


# Unigram LM cross-entropy: -avg ln(corpus_count(tok)/N) over each
# doc's token occurrences.  Empty docs emit no row on either engine.
ORACLES["q_lm_score"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    pc AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
    tc AS (SELECT tok, count(*) AS c FROM pc GROUP BY 1),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tc)
    SELECT p.doc_id, count(*) AS n_tok,
           round(-sum(ln(CAST(t.c AS DOUBLE) / (SELECT n FROM n)))
                 / count(*), 6) AS cross_entropy
    FROM pc p JOIN tc t USING (tok)
    GROUP BY p.doc_id
"""


# Concat-and-split packing: per-source doc_id-ordered token cumsum,
# integer-exact; each doc spans seqs st//L .. (st+n-1)//L.
ORACLES["q_pack_sequences"] = f"""
    WITH toks AS (SELECT doc_id, coalesce(source, '') AS source,
                         CAST(len({_TOKS}) AS BIGINT) AS n
                  FROM documents),
    nz AS (SELECT * FROM toks WHERE n > 0),
    c AS (SELECT source, doc_id, n,
                 CAST(sum(n) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n
                      AS BIGINT) AS st
          FROM nz),
    tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS total
            FROM nz GROUP BY 1),
    spans AS (SELECT source,
                     unnest(generate_series(st // 64, (st + n - 1) // 64))
                         AS seq_id
              FROM c),
    g AS (SELECT source, CAST(seq_id AS BIGINT) AS seq_id,
                 count(*) AS n_docs
          FROM spans GROUP BY 1, 2)
    SELECT g.source, g.seq_id, g.n_docs,
           CAST(least(64, t.total - g.seq_id * 64) AS BIGINT) AS n_tok
    FROM g JOIN tot t ON g.source = t.source
"""


# Hash-rank quota: rank by (md5 hash, doc_id) inside each source,
# keep the first 50.  md5_number_upper == hashing.stable_u64.
ORACLES["q_domain_quota"] = """
    WITH h AS (SELECT coalesce(source, '') AS source, n_chars, doc_id,
                      md5_number_upper(CAST(doc_id AS VARCHAR)) AS hv
               FROM documents WHERE doc_id IS NOT NULL),
    r AS (SELECT *, row_number() OVER (PARTITION BY source
                                       ORDER BY hv, doc_id) AS rn
          FROM h)
    SELECT source, count(*) AS n_total,
           CAST(sum(CASE WHEN rn <= 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(coalesce(sum(CASE WHEN rn <= 50 THEN n_chars END), 0)
                AS BIGINT) AS sum_chars_kept
    FROM r GROUP BY 1
"""


# C4 line filter: strip ' \t\r', require terminal [.!?"], >= 3 words
# ('[ \t\r\f\v]+' splitter, REAL chars below), no 'javascript' after
# an explicit A-Z -> a-z translate (never lower(): exotic case maps).
ORACLES["q_line_filter"] = """
    WITH lines AS (SELECT doc_id,
                          unnest(string_split(coalesce(text, ''),
                                              chr(10))) AS raw
                   FROM documents WHERE doc_id IS NOT NULL),
    s AS (SELECT doc_id, trim(raw, ' ' || chr(9) || chr(13)) AS line
          FROM lines),
    k AS (SELECT doc_id, line,
                 (line <> ''
                  AND regexp_matches(line, '[.!?"]$')
                  AND NOT contains(
                        translate(line, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                  'abcdefghijklmnopqrstuvwxyz'),
                        'javascript')
                  AND len(list_filter(regexp_split_to_array(line,
                        '[ \t\r\f\v]+'), x -> x <> '')) >= 3) AS keep
          FROM s)
    SELECT doc_id, count(*) AS n_lines,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(coalesce(sum(CASE WHEN keep THEN len(line) END), 0)
                + greatest(sum(CASE WHEN keep THEN 1 ELSE 0 END) - 1, 0)
                AS BIGINT) AS n_chars_kept
    FROM k GROUP BY 1
"""


# Per-label centroids in long form; dims 1-based, avg in DOUBLE.
ORACLES["q_centroids"] = """
    WITH e AS (SELECT label,
                      unnest(generate_series(1, len(embedding))) AS dim,
                      unnest(embedding) AS v
               FROM embeddings WHERE embedding IS NOT NULL)
    SELECT label, CAST(dim AS BIGINT) AS dim, count(*) AS n_vecs,
           round(avg(CAST(v AS DOUBLE)), 6) AS mean_val
    FROM e GROUP BY 1, 2
"""


# Outlier filter: exact quantile_disc bounds, per-source kept/dropped
# summary; NULL n_chars lands in no bucket (FILTER semantics).
ORACLES["q_outlier_filter"] = """
    WITH b AS (SELECT quantile_disc(n_chars, 0.01) AS lo,
                      quantile_disc(n_chars, 0.99) AS hi
               FROM documents)
    SELECT coalesce(source, '') AS source,
           CAST(coalesce(count(*) FILTER (n_chars >= lo
                                          AND n_chars <= hi), 0)
                AS BIGINT) AS n_kept,
           CAST(coalesce(count(*) FILTER (n_chars < lo), 0) AS BIGINT)
               AS n_low,
           CAST(coalesce(count(*) FILTER (n_chars > hi), 0) AS BIGINT)
               AS n_high,
           CAST(coalesce(sum(n_chars) FILTER (n_chars >= lo
                                              AND n_chars <= hi), 0)
                AS BIGINT) AS chars_kept,
           CAST(any_value(lo) AS BIGINT) AS lo,
           CAST(any_value(hi) AS BIGINT) AS hi
    FROM documents, b GROUP BY 1
"""


# Greedy-earliest 3-step funnel; strict (ts, event_id) succession.
ORACLES["q_funnel"] = """
    WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
               WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    u AS (SELECT DISTINCT user_id FROM e),
    v1 AS (SELECT user_id, ts, event_id FROM (
               SELECT user_id, ts, event_id,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS rn
               FROM e WHERE event_type = 'view') WHERE rn = 1),
    c1 AS (SELECT user_id, ts, event_id FROM (
               SELECT e.user_id, e.ts, e.event_id,
                      row_number() OVER (PARTITION BY e.user_id
                                         ORDER BY e.ts, e.event_id) AS rn
               FROM e JOIN v1 USING (user_id)
               WHERE e.event_type = 'click'
                 AND (e.ts, e.event_id) > (v1.ts, v1.event_id))
           WHERE rn = 1),
    p1 AS (SELECT user_id FROM (
               SELECT e.user_id,
                      row_number() OVER (PARTITION BY e.user_id
                                         ORDER BY e.ts, e.event_id) AS rn
               FROM e JOIN c1 USING (user_id)
               WHERE e.event_type = 'purchase'
                 AND (e.ts, e.event_id) > (c1.ts, c1.event_id))
           WHERE rn = 1)
    SELECT u.user_id,
           CAST(CASE WHEN p1.user_id IS NOT NULL THEN 3
                     WHEN c1.user_id IS NOT NULL THEN 2
                     WHEN v1.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage
    FROM u LEFT JOIN v1 ON u.user_id = v1.user_id
           LEFT JOIN c1 ON u.user_id = c1.user_id
           LEFT JOIN p1 ON u.user_id = p1.user_id
"""


# Cohort retention: epoch-day // 7 week index (never date_trunc);
# distinct users per (cohort_week, offset) cell.
ORACLES["q_retention"] = """
    WITH e AS (SELECT user_id, event_type,
                      CAST(datediff('day', DATE '1970-01-01',
                                    CAST(ts AS DATE)) // 7
                           AS BIGINT) AS wk
               FROM events
               WHERE ts IS NOT NULL AND user_id IS NOT NULL),
    s AS (SELECT user_id, min(wk) AS cohort_week FROM e
          WHERE event_type = 'signup' GROUP BY 1),
    a AS (SELECT DISTINCT e.user_id, s.cohort_week,
                          e.wk - s.cohort_week AS week_offset
          FROM e JOIN s USING (user_id))
    SELECT cohort_week, week_offset, count(*) AS n_users
    FROM a GROUP BY 1, 2
"""


# Five-stage CTE mirror of q_corpus_pipeline: short-line clean ->
# keep-min exact dedup on md5 -> hash-rank quota 50 -> 90/5/5 split.
ORACLES["q_corpus_pipeline"] = """
    WITH sp AS (SELECT doc_id, coalesce(source, '') AS source,
                       string_split(coalesce(text, ''), chr(10)) AS ls
                FROM documents WHERE doc_id IS NOT NULL),
    lines AS (SELECT doc_id, source, unnest(ls) AS raw,
                     unnest(generate_series(1, len(ls))) AS ln
              FROM sp),
    st AS (SELECT doc_id, source, ln,
                  trim(raw, ' ' || chr(9) || chr(13)) AS line
           FROM lines),
    k AS (SELECT * FROM st
          WHERE line <> ''
            AND NOT contains(
                  translate(line, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                            'abcdefghijklmnopqrstuvwxyz'), 'javascript')
            AND len(list_filter(regexp_split_to_array(line,
                  '[ \t\r\f\v]+'), x -> x <> '')) >= 15),
    cl AS (SELECT doc_id, any_value(source) AS source,
                  string_agg(line, chr(10) ORDER BY ln) AS ctext
           FROM k GROUP BY doc_id),
    dd AS (SELECT *, row_number() OVER (PARTITION BY md5(ctext)
                                        ORDER BY doc_id) AS rn
           FROM cl),
    d1 AS (SELECT doc_id, source, len(ctext) AS n FROM dd WHERE rn = 1),
    q AS (SELECT *, row_number() OVER (
              PARTITION BY source
              ORDER BY md5_number_upper(CAST(doc_id AS VARCHAR)),
                       doc_id) AS qr
          FROM d1),
    q1 AS (SELECT source, n,
                  md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 AS b
           FROM q WHERE qr <= 50),
    sp2 AS (SELECT CASE WHEN b < 90 THEN 'train'
                        WHEN b < 95 THEN 'val'
                        ELSE 'test' END AS split,
                   source, n
            FROM q1)
    SELECT split, source, count(*) AS n_docs,
           CAST(sum(n) AS BIGINT) AS sum_chars
    FROM sp2 GROUP BY 1, 2
"""


# Code-point Shannon entropy; log2 via ln/ln(2), per-occurrence sum.
ORACLES["q_char_entropy"] = """
    WITH ch AS (SELECT doc_id,
                       unnest(string_split_regex(text, '')) AS c
                FROM documents
                WHERE doc_id IS NOT NULL AND text IS NOT NULL
                  AND text <> ''),
    cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY 1, 2),
    agg AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n,
                   count(*) AS n_distinct,
                   sum(k * ln(CAST(k AS DOUBLE))) AS slk
            FROM cnt GROUP BY 1)
    SELECT doc_id, n AS n_chars, n_distinct,
           round((ln(CAST(n AS DOUBLE)) - slk / n) / ln(2.0), 6)
               AS entropy
    FROM agg
"""


# Count-Min sketch: register state and per-key estimate mirrored in
# integer SQL (md5_number_upper == hashing.stable_u64, verified
# bit-identical; salt 'cms{i}|' and width 1024 from hashing._CMS_*).
# Heavy hitter := TRUE count * 125 >= n (the engine's est-based
# prefilter is recall-1 because est >= true by construction, and its
# local-candidate pass is recall-1 by pigeonhole, so both sides name
# the same keys); est_count is reported alongside and must match the
# register math exactly.
ORACLES["q_cms_heavy_hitters"] = """
    WITH ev AS (SELECT user_id, CAST(user_id AS VARCHAR) AS k
                FROM events WHERE user_id IS NOT NULL),
    tot AS (SELECT count(*) AS n FROM ev),
    rowh AS (SELECT user_id,
                    CAST(md5_number_upper('cms0|' || k) % 1024 AS BIGINT) AS h0,
                    CAST(md5_number_upper('cms1|' || k) % 1024 AS BIGINT) AS h1,
                    CAST(md5_number_upper('cms2|' || k) % 1024 AS BIGINT) AS h2,
                    CAST(md5_number_upper('cms3|' || k) % 1024 AS BIGINT) AS h3
             FROM ev),
    reg AS (SELECT i, b, count(*) AS c FROM (
                SELECT 0 AS i, h0 AS b FROM rowh
                UNION ALL SELECT 1, h1 FROM rowh
                UNION ALL SELECT 2, h2 FROM rowh
                UNION ALL SELECT 3, h3 FROM rowh)
            GROUP BY 1, 2),
    keyh AS (SELECT user_id, any_value(h0) AS h0, any_value(h1) AS h1,
                    any_value(h2) AS h2, any_value(h3) AS h3
             FROM rowh GROUP BY user_id),
    est AS (SELECT kh.user_id,
                   least(r0.c, r1.c, r2.c, r3.c) AS est_count
            FROM keyh kh
            JOIN reg r0 ON r0.i = 0 AND r0.b = kh.h0
            JOIN reg r1 ON r1.i = 1 AND r1.b = kh.h1
            JOIN reg r2 ON r2.i = 2 AND r2.b = kh.h2
            JOIN reg r3 ON r3.i = 3 AND r3.b = kh.h3),
    truec AS (SELECT user_id, count(*) AS true_count FROM ev GROUP BY 1)
    SELECT e.user_id, CAST(e.est_count AS BIGINT) AS est_count,
           CAST(t.true_count AS BIGINT) AS true_count
    FROM est e JOIN truec t USING (user_id), tot
    WHERE t.true_count * 125 >= tot.n
    ORDER BY e.user_id
"""


ORACLES["q_rank_window"] = """
    WITH r AS (SELECT s_nationkey, s_name, s_acctbal,
                      rank() OVER (PARTITION BY s_nationkey
                                   ORDER BY s_acctbal DESC) AS rnk
               FROM supplier WHERE s_acctbal IS NOT NULL)
    SELECT n.n_name, r.s_name, round(r.s_acctbal, 2) AS s_acctbal,
           r.rnk
    FROM r JOIN nation n ON r.s_nationkey = n.n_nationkey
    WHERE r.rnk <= 3
    ORDER BY n.n_name, r.rnk, r.s_name
"""


ORACLES["q_cross_join"] = """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    ORDER BY 1, 2
"""


ORACLES["q_intersect"] = """
    SELECT user_id FROM events
    WHERE event_type = 'click' AND user_id IS NOT NULL
    INTERSECT
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND value > 90
      AND user_id IS NOT NULL
    ORDER BY user_id
"""


ORACLES["q_except"] = """
    SELECT user_id FROM events
    WHERE event_type = 'click' AND user_id IS NOT NULL
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND value > 90
      AND user_id IS NOT NULL
    ORDER BY user_id
"""


# Same binning expression as q_value_histogram; quantile pick via
# integer cross-multiplication (cum*den >= num*tot == cum >= ceil(q*tot)).
ORACLES["q_quantile_sketch"] = """
    WITH b AS (SELECT event_type,
                      CAST(least(greatest(CAST(floor((value - 0.0)
                           / (100.0 - 0.0) * 20) AS INTEGER), 0), 19)
                           AS BIGINT) AS bin
               FROM events WHERE value IS NOT NULL),
    h AS (SELECT event_type, bin, count(*) AS n FROM b GROUP BY 1, 2),
    c AS (SELECT event_type, bin, n,
                 sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
                 sum(n) OVER (PARTITION BY event_type) AS tot
          FROM h)
    SELECT event_type,
           min(CASE WHEN cum * 2 >= tot THEN bin END) AS p50_bin,
           min(CASE WHEN cum * 10 >= tot * 9 THEN bin END) AS p90_bin,
           min(CASE WHEN cum * 100 >= tot * 99 THEN bin END) AS p99_bin,
           CAST(any_value(tot) AS BIGINT) AS n
    FROM c GROUP BY 1 ORDER BY 1
"""


ORACLES["q_pseudo_shuffle"] = """
    SELECT doc_id, md5('shuf1|' || CAST(doc_id AS VARCHAR)) AS h,
           CAST(row_number() OVER (ORDER BY
               md5('shuf1|' || CAST(doc_id AS VARCHAR))) AS BIGINT)
               AS rank
    FROM documents WHERE doc_id IS NOT NULL
    ORDER BY h LIMIT 100
"""


# Six-moment OLS mirror; DuckDB's regr_*/corr use running algorithms
# that agree with the moment formulas to ~1e-12 here — round-6 on both
# sides absorbs it (the repo's float determinism convention).
ORACLES["q_regression"] = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(regr_slope(value, CAST(hour(ts) AS DOUBLE)), 6)
               AS slope,
           round(regr_intercept(value, CAST(hour(ts) AS DOUBLE)), 6)
               AS intercept,
           round(corr(value, CAST(hour(ts) AS DOUBLE)), 6) AS corr_xy
    FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1 ORDER BY 1
"""


ORACLES["q_mode"] = """
    WITH c AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS v,
                      count(*) AS n
               FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
    SELECT event_type, v AS mode_value, n AS n_mode
    FROM c
    QUALIFY row_number() OVER (PARTITION BY event_type
                               ORDER BY n DESC, v) = 1
    ORDER BY event_type
"""


ORACLES["q_zip_index"] = """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS row_id
    FROM documents WHERE doc_id IS NOT NULL
"""


ORACLES["q_weighted_sample"] = """
    SELECT doc_id, n_chars,
           CAST(md5_number_upper('ws|' || CAST(doc_id AS VARCHAR))
                % 10000 AS BIGINT) AS draw
    FROM documents
    WHERE doc_id IS NOT NULL
      AND CAST(md5_number_upper('ws|' || CAST(doc_id AS VARCHAR))
               % 10000 AS BIGINT)
          < least(coalesce(n_chars, 0), 9999)
"""


ORACLES["q_ntile"] = """
    WITH t AS (SELECT event_type, value,
                      ntile(4) OVER (PARTITION BY event_type
                                     ORDER BY value, event_id)
                          AS quartile
               FROM events WHERE value IS NOT NULL)
    SELECT event_type, CAST(quartile AS BIGINT) AS quartile,
           count(*) AS n,
           round(min(value), 4) AS min_value,
           round(max(value), 4) AS max_value
    FROM t GROUP BY 1, 2
    ORDER BY 1, 2
"""


ORACLES["q_densify_hours"] = """
    WITH agg AS (SELECT event_type,
                        CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
                            AS hour_epoch,
                        count(*) AS n
                 FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    b AS (SELECT min(hour_epoch) AS lo, max(hour_epoch) AS hi FROM agg),
    hours AS (SELECT unnest(generate_series(lo, hi, 3600)) AS hour_epoch
              FROM b),
    types AS (SELECT DISTINCT event_type FROM agg),
    grid AS (SELECT t.event_type, h.hour_epoch
             FROM types t CROSS JOIN hours h)
    SELECT g.event_type, g.hour_epoch, coalesce(a.n, 0) AS n
    FROM grid g LEFT JOIN agg a USING (event_type, hour_epoch)
    ORDER BY 1, 2
"""


ORACLES["q_transitions"] = """
    WITH s AS (SELECT user_id, event_type,
                      lag(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                          AS prev_type
               FROM events WHERE user_id IS NOT NULL)
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES["q_share_of_total"] = """
    WITH a AS (SELECT o_orderstatus,
                      count(*) AS n_orders,
                      sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
                          AS rev_c
               FROM orders GROUP BY 1)
    SELECT o_orderstatus, n_orders,
           round(CAST(rev_c AS DOUBLE) / 100.0, 2) AS revenue,
           round(100.0 * CAST(rev_c AS DOUBLE)
                 / CAST(sum(rev_c) OVER () AS DOUBLE), 4) AS share_pct
    FROM a ORDER BY o_orderstatus
"""


ORACLES["q_unpivot"] = """
    SELECT user_id, event_type, count(*) AS n
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES["q_bm25"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    lens AS (SELECT doc_id, len(tk) AS L FROM toks),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(sum(L) AS DOUBLE) / count(*) AS avglen
              FROM lens),
    pc AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM pc GROUP BY 1),
    terms AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT 3),
    tf AS (SELECT p.doc_id, p.tok, count(*) AS tf
           FROM pc p JOIN terms t ON p.tok = t.tok GROUP BY 1, 2),
    contrib AS (
        SELECT f.doc_id,
               ln((s.n_docs - t.df + 0.5) / (t.df + 0.5) + 1.0)
                 * f.tf * (1.2 + 1)
                 / (f.tf + 1.2 * (1 - 0.75 + 0.75 * l.L / s.avglen))
                 AS c,
               t.tok
        FROM tf f
        JOIN terms t ON t.tok = f.tok
        JOIN lens l ON l.doc_id = f.doc_id
        CROSS JOIN stats s),
    scored AS (
        -- sum order over the <=3 term contributions is engine-chosen;
        -- round-4 absorbs the last-bit difference vs the engine's
        -- fixed-order fold (same absorption rule as q_regression)
        SELECT l.doc_id, round(coalesce(sum(x.c), 0.0), 4) AS score
        FROM lens l LEFT JOIN contrib x ON x.doc_id = l.doc_id
        GROUP BY l.doc_id)
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id LIMIT 20
"""


# Independent derivation: the engine PARSES the noisy url; the oracle
# rebuilds the canonical string from the same doc_id arithmetic the
# synthesis uses.  A canonicalizer bug (port kept, tracking param
# kept, fragment leaking, case not folded) breaks string equality.
ORACLES["q_url_dedup"] = """
    WITH u AS (
        SELECT doc_id,
               'http://site' || (doc_id % 7) || '.example.com/path'
               || (doc_id % 5)
               || CASE WHEN doc_id % 4 IN (0, 1)
                       THEN '?id=' || (doc_id % 10) ELSE '' END
               AS canonical_url
        FROM documents)
    SELECT canonical_url, count(*) AS n_docs, min(doc_id) AS keep_doc_id
    FROM u GROUP BY 1
"""


# q_binary_features: the fake decode is md5-derived (width/height from
# the digest's first two bytes) and the features are pure byte math
# over the utf-8 payload, so the whole stage mirrors in SQL: DuckDB
# md5(VARCHAR) hashes the same utf-8 bytes the engine encodes, and the
# high nibble of byte i is hex char 2i-1 of hex(encode(text)).  The
# 16-term entropy sum's float order differs between engines; the
# driver's round-6 canon absorbs it (same rule as q_regression).
_HEXVAL = "(strpos('0123456789abcdef', lower({c})) - 1)"
ORACLES["q_binary_features"] = f"""
    WITH b AS (
        SELECT doc_id AS item_id,
               md5(coalesce(text, '')) AS d,
               hex(encode(coalesce(text, ''))) AS h
        FROM documents),
    nib AS (
        -- generate_series as a LIST function (lateral column args are
        -- unsupported as a table function — same trick as the
        -- fingerprint oracle)
        SELECT item_id,
               unnest(list_transform(
                   generate_series(1, CAST(length(h) // 2 AS BIGINT)),
                   i -> substr(h, 2 * i - 1, 1))) AS c
        FROM b),
    cnt AS (SELECT item_id, c, count(*) AS n FROM nib GROUP BY 1, 2),
    tot AS (SELECT item_id, sum(n) AS t FROM cnt GROUP BY 1),
    ent AS (
        SELECT c.item_id,
               -sum((c.n / t.t) * log2(c.n / t.t)) AS byte_entropy
        FROM cnt c JOIN tot t ON t.item_id = c.item_id
        GROUP BY 1)
    SELECT b.item_id,
           CAST(64 + ({_HEXVAL.format(c="substr(b.d, 1, 1)")} * 16
                      + {_HEXVAL.format(c="substr(b.d, 2, 1)")}) % 192
                AS INT) AS width,
           CAST(64 + ({_HEXVAL.format(c="substr(b.d, 3, 1)")} * 16
                      + {_HEXVAL.format(c="substr(b.d, 4, 1)")}) % 192
                AS INT) AS height,
           FALSE AS needs_resize,
           coalesce(e.byte_entropy, 0.0) AS byte_entropy
    FROM b LEFT JOIN ent e ON e.item_id = b.item_id
"""


def _pagerank_sql(iters: int = 10, damping: float = 0.85) -> str:
    """Unrolled power iteration (recursive CTEs cannot aggregate in the
    recursive term) — same leaky formulation as stages/graph.pagerank:
    teleport (1-d)/|V|, no dangling redistribution."""
    ctes = [f"""
    m AS (SELECT max(doc_id) + 1 AS mm FROM documents),
    edges AS (SELECT doc_id AS src,
                     unnest([(doc_id*doc_id+1)%mm, (doc_id//2+7)%mm,
                             (doc_id*3+11)%mm]) AS dst
              FROM documents, m),
    nodes AS (SELECT src AS node FROM edges
              UNION SELECT dst FROM edges),
    nv AS (SELECT count(*) AS n FROM nodes),
    deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
    pr0 AS (SELECT node, 1.0/(SELECT n FROM nv) AS rank FROM nodes)"""]
    for i in range(iters):
        ctes.append(f"""
    pr{i+1} AS (
        SELECT nd.node,
               {1.0 - damping}/(SELECT n FROM nv)
                   + {damping}*coalesce(s.msum, 0.0) AS rank
        FROM nodes nd LEFT JOIN (
            SELECT e.dst AS node, sum(p.rank/d.outdeg) AS msum
            FROM edges e
            JOIN pr{i} p ON e.src = p.node
            JOIN deg  d ON e.src = d.src
            GROUP BY 1) s ON nd.node = s.node)""")
    return ("WITH" + ",".join(ctes)
            + f"""
    SELECT node, round(rank, 6) AS rank FROM pr{iters} ORDER BY node""")


ORACLES["q_pagerank"] = _pagerank_sql()


ORACLES["q_crawl_diff"] = """
    WITH a AS (SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
                      md5(coalesce(text, '')) AS h_a
               FROM documents),
    b AS (SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
                 CASE WHEN doc_id % 5 = 0
                      THEN md5(coalesce(text, '') || '!')
                      ELSE md5(coalesce(text, '')) END AS h_b
          FROM documents WHERE doc_id % 7 <> 0
          UNION ALL
          SELECT 'u' || CAST(doc_id AS VARCHAR) || '-new',
                 md5('new' || CAST(doc_id AS VARCHAR))
          FROM documents WHERE doc_id % 11 = 0)
    SELECT coalesce(a.url, b.url) AS url,
           CASE WHEN a.url IS NULL THEN 'added'
                WHEN b.url IS NULL THEN 'removed'
                WHEN a.h_a = b.h_b THEN 'same'
                ELSE 'changed' END AS status
    FROM a FULL OUTER JOIN b ON a.url = b.url
"""


ORACLES["q_link_graph"] = f"""
    WITH d AS (SELECT {_DOMAIN} AS domain FROM documents),
    pc AS (SELECT domain, count(*) AS pages FROM d GROUP BY 1),
    paths(path, mult) AS (VALUES ('/', 2), ('/archive', 1), ('/tags', 1),
                                 ('/about', 1), ('/privacy', 1),
                                 ('/terms', 1), ('/contact', 1))
    SELECT domain, path, CAST(pages * mult AS BIGINT) AS n
    FROM pc CROSS JOIN paths
"""


ORACLES["q_incremental_dedup"] = """
    WITH idx AS (SELECT DISTINCT md5(coalesce(text, '')) AS h
                 FROM documents WHERE doc_id % 2 = 0),
    firsts AS (SELECT md5(coalesce(text, '')) AS content_md5,
                      min(doc_id) AS keep_doc_id
               FROM documents GROUP BY 1)
    SELECT f.content_md5, f.keep_doc_id
    FROM firsts f LEFT JOIN idx ON f.content_md5 = idx.h
    WHERE idx.h IS NULL
    ORDER BY f.content_md5
"""


ORACLES["q_lm_quality"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    bgr AS (SELECT doc_id,
                   unnest(CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
                          ELSE list_transform(generate_series(1, len(tk)-1),
                                   i -> tk[i] || ' ' || tk[i+1]) END) AS bg,
                   unnest(CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
                          ELSE list_transform(generate_series(1, len(tk)-1),
                                   i -> tk[i]) END) AS w1
            FROM toks),
    cnt AS (SELECT bg, count(*) AS c FROM bgr GROUP BY 1),
    ctx AS (SELECT w1, count(*) AS cc FROM bgr GROUP BY 1)
    SELECT b.doc_id, count(*) AS n_bigrams,
           round(sum(ln(cnt.c::DOUBLE / ctx.cc)) / count(*), 6) AS avg_logp
    FROM bgr b JOIN cnt ON b.bg = cnt.bg JOIN ctx ON b.w1 = ctx.w1
    GROUP BY 1 ORDER BY 1
"""


def _pii_scrub_sql() -> str:
    """Planted-PII variant of _pii_redact_sql: identical cascade
    (generated from the same engine pattern constants) over text
    dirtied by the same doc_id arithmetic as queries._plant_pii."""
    from bb_ocr_ray.functions.pii import EMAIL_PAT, IPV4_PAT, PHONE_PAT

    return f"""
    WITH t0 AS (
        SELECT doc_id,
               coalesce(text, '')
               || CASE WHEN doc_id % 5 = 0
                       THEN ' contact user' || doc_id || '@mail'
                            || (doc_id % 9) || '.example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 3 = 0
                       THEN ' call +' || (1 + doc_id % 98) || ' '
                            || (100 + doc_id % 900) || ' '
                            || (100 + (doc_id * 7) % 900) || ' '
                            || (1000 + doc_id % 9000)
                       ELSE '' END
               || CASE WHEN doc_id % 7 = 0
                       THEN ' from 10.' || (doc_id % 256) || '.'
                            || ((doc_id * 3) % 256) || '.'
                            || (doc_id % 100)
                       ELSE '' END AS tx
        FROM documents),
    s1 AS (SELECT doc_id,
                  len(regexp_extract_all(tx, '{EMAIL_PAT}')) AS n_emails,
                  regexp_replace(tx, '{EMAIL_PAT}', '<EMAIL>', 'g') AS tx
           FROM t0),
    s2 AS (SELECT doc_id, n_emails,
                  len(regexp_extract_all(tx, '{PHONE_PAT}')) AS n_phones,
                  regexp_replace(tx, '{PHONE_PAT}', '<PHONE>', 'g') AS tx
           FROM s1),
    s3 AS (SELECT doc_id, n_emails, n_phones,
                  len(regexp_extract_all(tx, '{IPV4_PAT}')) AS n_ips,
                  regexp_replace(tx, '{IPV4_PAT}', '<IP>', 'g') AS tx
           FROM s2)
    SELECT doc_id, n_emails, n_phones, n_ips, md5(tx) AS clean_md5
    FROM s3 ORDER BY doc_id
    """


ORACLES["q_pii_scrub"] = _pii_scrub_sql()


ORACLES["q_mix_balance"] = """
    WITH keyed AS (SELECT doc_id, coalesce(lang, '<null>') AS lang
                   FROM documents),
    cnt AS (SELECT lang, count(*) AS n FROM keyed GROUP BY 1),
    rates AS (SELECT lang, (10000 * (SELECT min(n) FROM cnt)) // n AS p
              FROM cnt)
    SELECT k.doc_id, k.lang
    FROM keyed k JOIN rates r ON k.lang = r.lang
    WHERE CAST(md5_number_upper('mix|' || CAST(k.doc_id AS VARCHAR))
               % 10000 AS BIGINT) < r.p
    ORDER BY k.doc_id
"""


ORACLES["q_skew_join"] = """
    WITH e AS (SELECT event_type,
                      CAST(round(value * 1000000) AS BIGINT) AS v_u
               FROM events),
    d AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                 SUM(v_u) AS sum_u
          FROM e GROUP BY 1)
    SELECT e.event_type AS event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN e.v_u * d.n_events > d.sum_u
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above
    FROM e JOIN d USING (event_type)
    GROUP BY 1
    ORDER BY 1
"""


ORACLES["q_connected_components"] = """
    WITH n AS (SELECT doc_id AS d FROM documents),
    e AS (SELECT a.d AS u FROM n a JOIN n b ON b.d = a.d + 1
          WHERE ((a.d * a.d + 3 * a.d) % 11) >= 3),
    s AS (SELECT d, CASE WHEN (d - 1) IN (SELECT u FROM e)
                         THEN NULL ELSE d END AS st
          FROM n)
    SELECT d AS doc_id,
           max(st) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS component
    FROM s
    ORDER BY d
"""


ORACLES["q_nb_classify"] = """
    WITH toks AS (
      SELECT doc_id, coalesce(lang, '<null>') AS lang,
             list_filter(regexp_split_to_array(coalesce(text, ''),
                         '[ \t\n\r\f\v]+'), x -> x <> '') AS tk
      FROM documents),
    train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
    test  AS (SELECT * FROM toks WHERE doc_id % 5 = 0 AND len(tk) > 0),
    tt  AS (SELECT lang, unnest(tk) AS tok FROM train),
    cnt AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
            FROM tt GROUP BY 1, 2),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM cnt GROUP BY 1),
    voc AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM cnt),
    prior AS (SELECT lang, CAST(count(*) AS BIGINT) AS nd
              FROM train GROUP BY 1),
    ntr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM train),
    langs AS (SELECT p.lang, p.nd, coalesce(t.tot, 0) AS tot
              FROM prior p LEFT JOIN tot t USING (lang)),
    dt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS f
           FROM (SELECT doc_id, unnest(tk) AS tok FROM test)
           GROUP BY 1, 2),
    sc AS (SELECT d.doc_id, l.lang,
                  ln(CAST(l.nd AS DOUBLE) / (SELECT n FROM ntr))
                + sum(d.f * ln((coalesce(c.c, 0) + 1.0)
                               / (l.tot + (SELECT v FROM voc)))) AS score
           FROM dt d CROSS JOIN langs l
           LEFT JOIN cnt c ON c.lang = l.lang AND c.tok = d.tok
           GROUP BY d.doc_id, l.lang, l.nd, l.tot),
    rk AS (SELECT doc_id, lang, round(score, 6) AS s6,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY round(score, 6) DESC,
                                              lang ASC) AS rn
           FROM sc)
    SELECT t.doc_id, t.lang AS lang, r.lang AS pred, r.s6 AS score6
    FROM rk r JOIN test t USING (doc_id)
    WHERE r.rn = 1
    ORDER BY t.doc_id
"""


ORACLES["q_triangle_count"] = """
    WITH n AS (SELECT doc_id AS d FROM documents),
    e1 AS (SELECT a.d AS u, b.d AS v FROM n a JOIN n b ON b.d = a.d + 1
           WHERE ((a.d * a.d + 3 * a.d) % 11) >= 3),
    e2 AS (SELECT a.d AS u, b.d AS v FROM n a JOIN n b ON b.d = a.d + 2
           WHERE ((7 * a.d + 5) % 13) >= 4),
    e AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2),
    w AS (SELECT x.u AS a, x.v AS b, y.v AS c
          FROM e x JOIN e y ON y.u = x.v),
    t AS (SELECT a, b, c FROM w
          WHERE EXISTS (SELECT 1 FROM e z WHERE z.u = w.a AND z.v = w.c))
    SELECT a % 10 AS bucket, CAST(count(*) AS BIGINT) AS n_triangles
    FROM t GROUP BY 1 ORDER BY 1
"""


ORACLES["q_interval_join"] = """
    WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS s,
                      epoch_us(ts)
                    + CAST(round(value * 3600) AS BIGINT) * 1000000 AS e
               FROM events WHERE event_type = 'click'),
    r AS (SELECT event_id, user_id, epoch_us(ts) AS s,
                 epoch_us(ts) + 1800000000 AS e
          FROM events WHERE event_type = 'error')
    SELECT c.event_id AS click_id, r.event_id AS error_id,
           least(c.e, r.e) - greatest(c.s, r.s) AS overlap_us
    FROM c JOIN r ON c.user_id = r.user_id
                 AND c.s <= r.e AND r.s <= c.e
    ORDER BY 1, 2
"""


ORACLES["q_boilerplate"] = """
    WITH dirty AS (
      SELECT doc_id, source,
             '(c) 2026 ' || source || ' all rights reserved' || chr(10) ||
             'home | about | contact ' || source || chr(10) ||
             CASE WHEN (doc_id // 20) % 2 = 0
                  THEN 'subscribe to ' || source || ' newsletter' || chr(10)
                  ELSE '' END ||
             CASE WHEN (doc_id // 20) % 4 < 3
                  THEN 'promo ' || source || ' deals' || chr(10)
                  ELSE '' END ||
             coalesce(text, '') || chr(10) ||
             'footnote ' || doc_id AS t
      FROM documents),
    ls AS (SELECT doc_id, source, string_split(t, chr(10)) AS ll
           FROM dirty),
    lines AS (SELECT doc_id, source,
                     unnest(list_transform(generate_series(1, len(ll)),
                                           i -> ll[i])) AS line,
                     unnest(generate_series(1, len(ll))) AS idx
              FROM ls),
    df AS (SELECT source, line, count(DISTINCT doc_id) AS df
           FROM lines GROUP BY 1, 2),
    nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
    freq AS (SELECT df.source, df.line
             FROM df JOIN nd ON df.source = nd.source
             WHERE df.df >= 2 AND df.df * 100 > 60 * nd.n_docs),
    flagged AS (SELECT l.doc_id, l.idx, l.line,
                       f.line IS NOT NULL AS bp
                FROM lines l LEFT JOIN freq f
                  ON l.source = f.source AND l.line = f.line)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE NOT bp) AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(line, chr(10) ORDER BY idx)
                        FILTER (WHERE NOT bp), '')) AS clean_md5
    FROM flagged GROUP BY 1 ORDER BY 1
"""


ORACLES["q_pmi_pairs"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    prs AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(tk)-1, 0)),
                                   i -> tk[i])) AS w1,
             unnest(list_transform(generate_series(1, greatest(len(tk)-1, 0)),
                                   i -> tk[i+1])) AS w2
      FROM toks
      UNION ALL
      SELECT unnest(list_transform(generate_series(1, greatest(len(tk)-2, 0)),
                                   i -> tk[i])),
             unnest(list_transform(generate_series(1, greatest(len(tk)-2, 0)),
                                   i -> tk[i+2]))
      FROM toks),
    cnt AS (SELECT w1, w2, count(*) AS c12 FROM prs GROUP BY 1, 2),
    uni AS (SELECT unnest(tk) AS tok FROM toks),
    uc AS (SELECT tok, count(*) AS c FROM uni GROUP BY 1),
    nt AS (SELECT count(*) AS n_tokens FROM uni),
    npr AS (SELECT count(*) AS n_pairs FROM prs)
    SELECT cnt.w1, cnt.w2, CAST(cnt.c12 AS BIGINT) AS c12,
           round(ln(cnt.c12::DOUBLE / npr.n_pairs * nt.n_tokens / u1.c
                    * nt.n_tokens / u2.c), 6) AS pmi
    FROM cnt
    JOIN uc u1 ON cnt.w1 = u1.tok
    JOIN uc u2 ON cnt.w2 = u2.tok
    CROSS JOIN nt CROSS JOIN npr
    WHERE cnt.c12 >= 5
    ORDER BY pmi DESC, cnt.w1, cnt.w2 LIMIT 20
"""


ORACLES["q_seed_distance"] = """
    WITH RECURSIVE e AS (
      SELECT d.doc_id AS src, d.doc_id + 1 AS dst FROM documents d
      WHERE (d.doc_id * d.doc_id + 3 * d.doc_id) % 11 >= 3
        AND EXISTS (SELECT 1 FROM documents x
                    WHERE x.doc_id = d.doc_id + 1)
      UNION ALL
      SELECT d.doc_id, d.doc_id + 2 FROM documents d
      WHERE (7 * d.doc_id + 5) % 13 >= 4
        AND EXISTS (SELECT 1 FROM documents x
                    WHERE x.doc_id = d.doc_id + 2)),
    bfs AS (
      SELECT doc_id AS node, 0 AS dist FROM documents
      WHERE doc_id % 97 = 0
      UNION ALL
      -- the edge rule only points to HIGHER doc_ids, so the graph is
      -- a DAG and path count is bounded (out-degree <= 2, depth <= 8)
      SELECT e.dst, b.dist + 1 FROM bfs b
      JOIN e ON e.src = b.node WHERE b.dist < 8)
    SELECT node, CAST(min(dist) AS BIGINT) AS dist
    FROM bfs GROUP BY 1 ORDER BY 1
"""


ORACLES["q_hybrid_rrf"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    lens AS (SELECT doc_id, len(tk) AS L FROM toks),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(sum(L) AS DOUBLE) / count(*) AS avglen
              FROM lens),
    pc AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
    df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM pc GROUP BY 1),
    terms AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT 3),
    tf AS (SELECT p.doc_id, p.tok, count(*) AS tf
           FROM pc p JOIN terms t ON p.tok = t.tok GROUP BY 1, 2),
    contrib AS (
        SELECT f.doc_id,
               ln((s.n_docs - t.df + 0.5) / (t.df + 0.5) + 1.0)
                 * f.tf * (1.2 + 1)
                 / (f.tf + 1.2 * (1 - 0.75 + 0.75 * l.L / s.avglen))
                 AS c
        FROM tf f
        JOIN terms t ON t.tok = f.tok
        JOIN lens l ON l.doc_id = f.doc_id
        CROSS JOIN stats s),
    scored AS (
        SELECT l.doc_id, round(coalesce(sum(x.c), 0.0), 4) AS score
        FROM lens l LEFT JOIN contrib x ON x.doc_id = l.doc_id
        GROUP BY l.doc_id),
    lex AS (SELECT doc_id,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS rl
            FROM scored ORDER BY score DESC, doc_id LIMIT 20),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
          WHERE vec_id = 0),
    dn0 AS (SELECT e.vec_id AS doc_id,
                   row_number() OVER (
                     ORDER BY round(list_cosine_similarity(
                       q.qv, CAST(e.embedding AS DOUBLE[])), 4) DESC,
                     e.vec_id) AS rd
            FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
    dn AS (SELECT doc_id, rd FROM dn0 WHERE rd <= 20)
    SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
           round(coalesce(1.0 / (60 + l.rl), 0), 6) AS lex_rrf,
           round(coalesce(1.0 / (60 + d.rd), 0), 6) AS dense_rrf,
           round(coalesce(1.0 / (60 + l.rl), 0)
                 + coalesce(1.0 / (60 + d.rd), 0), 6) AS rrf
    FROM lex l FULL OUTER JOIN dn d ON l.doc_id = d.doc_id
    ORDER BY 4 DESC, 1
"""


ORACLES["q_ctfidf"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    pc AS (SELECT t.doc_id, e.label, unnest(t.tk) AS token
           FROM toks t JOIN embeddings e ON e.vec_id = t.doc_id),
    ct AS (SELECT CAST(label AS BIGINT) AS label, token,
                  CAST(count(*) AS BIGINT) AS tf
           FROM pc GROUP BY 1, 2),
    ft AS (SELECT token, sum(tf) AS f FROM ct GROUP BY 1),
    a AS (SELECT CAST(sum(tf) AS DOUBLE)
                 / count(DISTINCT label) AS avg_per_class FROM ct),
    scored AS (
        SELECT ct.label, ct.token, ct.tf,
               round(ct.tf * ln(1.0 + a.avg_per_class / ft.f), 6) AS w
        FROM ct JOIN ft ON ct.token = ft.token CROSS JOIN a),
    ranked AS (
        SELECT label, token, tf, w,
               row_number() OVER (PARTITION BY label
                                  ORDER BY w DESC, token) AS rank
        FROM scored)
    SELECT label, CAST(rank AS BIGINT) AS rank, token, tf, w
    FROM ranked WHERE rank <= 5 ORDER BY 1, 2
"""


ORACLES["q_sorted_neighborhood"] = """
    WITH k AS (SELECT doc_id, substr(coalesce(text, ''), 1, 12) AS bk
               FROM documents),
    r AS (SELECT doc_id, bk,
                 row_number() OVER (ORDER BY bk, doc_id) AS rnk
          FROM k)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(b.rnk - a.rnk AS BIGINT) AS d,
           CAST(a.bk = b.bk AS BIGINT) AS key_match
    FROM r a JOIN r b ON b.rnk - a.rnk BETWEEN 1 AND 3
    ORDER BY 1, 2
"""


ORACLES["q_embed_covariance"] = """
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
               FROM embeddings),
    x AS (SELECT vec_id, unnest(generate_series(1, 64)) AS i,
                 unnest(list_transform(generate_series(1, 64),
                                       k -> e[k])) AS val
          FROM v),
    n AS (SELECT count(*) AS n FROM v),
    s AS (SELECT i, sum(val) AS sx FROM x GROUP BY 1),
    p AS (SELECT a.i AS i, b.i AS j, sum(a.val * b.val) AS sxy
          FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
          GROUP BY 1, 2)
    SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
           round((p.sxy - sa.sx * sb.sx / n.n) / n.n, 6) AS cov
    FROM p
    JOIN s sa ON sa.i = p.i
    JOIN s sb ON sb.i = p.j
    CROSS JOIN n
    ORDER BY 1, 2
"""


ORACLES["q_typo_pairs"] = f"""
    WITH t0 AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    dirty AS (
      SELECT d.doc_id,
             coalesce(d.text, '') ||
             CASE WHEN d.doc_id % 3 = 0 AND len(t0.tk) >= 1
                       AND len(t0.tk[1]) >= 4
                  THEN ' ' || substr(t0.tk[1], 1, 1) || substr(t0.tk[1], 3)
                  ELSE '' END AS text
      FROM documents d JOIN t0 ON t0.doc_id = d.doc_id),
    toks AS (SELECT doc_id, {_TOKS} AS tk FROM dirty),
    pc AS (SELECT DISTINCT doc_id, unnest(tk) AS tok FROM toks),
    df AS (SELECT tok, count(*) AS df FROM pc GROUP BY 1),
    v AS (SELECT tok FROM df WHERE df >= 5 AND len(tok) >= 4)
    SELECT a.tok AS tok_a, b.tok AS tok_b
    FROM v a JOIN v b ON a.tok < b.tok
    WHERE levenshtein(a.tok, b.tok) = 1
    ORDER BY 1, 2
"""


ORACLES["q_crawl_schedule"] = """
    WITH r AS (SELECT doc_id, source,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY doc_id) AS r
               FROM documents)
    SELECT doc_id, source, CAST(r AS BIGINT) AS r,
           CAST(row_number() OVER (ORDER BY r, source, doc_id)
                AS BIGINT) AS slot
    FROM r ORDER BY slot
"""


ORACLES["q_hll_intersect"] = """
    WITH e AS (SELECT event_type,
                      md5_number_upper(CAST(user_id AS VARCHAR)) AS hv
               FROM events
               WHERE user_id IS NOT NULL
                 AND event_type IN ('click', 'view')),
    r AS (SELECT CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END
                   AS part,
                 CAST(hv & 63 AS BIGINT) AS bucket,
                 CASE WHEN hv >> 6 = 0 THEN 59
                      ELSE least(59, 1 + bit_count(
                          xor(hv >> 6, (hv >> 6) - 1) >> 1)) END AS rho
          FROM e),
    ab AS (SELECT part, bucket, CAST(max(rho) AS BIGINT) AS val
           FROM r GROUP BY 1, 2),
    u AS (SELECT 'u' AS part, bucket, CAST(max(val) AS BIGINT) AS val
          FROM ab GROUP BY 2),
    cu AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'click' AND user_id IS NOT NULL),
    vu AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'view' AND user_id IS NOT NULL),
    x AS (SELECT 'x' AS part, CAST(-1 AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS val
          FROM cu JOIN vu USING (user_id))
    SELECT * FROM ab UNION ALL SELECT * FROM u UNION ALL
    SELECT * FROM x ORDER BY 1, 2
"""

ORACLES["q_heavy_hitters"] = """
    WITH keyed AS (
        SELECT CASE
                 WHEN user_id IS NULL THEN NULL
                 WHEN user_id % 3 = 0 THEN CAST(user_id % 13 AS VARCHAR)
                 WHEN user_id % 3 = 1
                   THEN CAST(100 + user_id % 97 AS VARCHAR)
                 ELSE CAST(event_id + 1000000000 AS VARCHAR)
               END AS key
        FROM events),
    nn AS (SELECT key FROM keyed WHERE key IS NOT NULL),
    tot AS (SELECT count(*) AS t FROM nn)
    SELECT key, CAST(count(*) AS BIGINT) AS n
    FROM nn CROSS JOIN tot
    GROUP BY key, tot.t
    HAVING count(*) * 50 > tot.t
    ORDER BY key
"""


def _hits_sql(iters: int = 5) -> str:
    """Unrolled HITS sweep — same graph generator as _pagerank_sql,
    L2 normalization after each half-step, hub update reading the
    just-normalized authorities (the engine's exact order).  Every
    CTE is MATERIALIZED: DuckDB inlines plain CTEs per reference, so
    an unrolled iterative chain with norm subqueries re-evaluates its
    whole prefix exponentially (observed: fd exhaustion from
    re-scanning the parquet view ~4^iters times)."""
    ctes = ["""
    m AS MATERIALIZED (SELECT max(doc_id) + 1 AS mm FROM documents),
    edges AS MATERIALIZED (
        SELECT doc_id AS src,
               unnest([(doc_id*doc_id+1)%mm, (doc_id//2+7)%mm,
                       (doc_id*3+11)%mm]) AS dst
        FROM documents, m),
    nodes AS MATERIALIZED (SELECT src AS node FROM edges
                           UNION SELECT dst FROM edges),
    h0 AS MATERIALIZED (SELECT node, 1.0 AS v FROM nodes)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""
    a{i}r AS MATERIALIZED (SELECT nd.node, coalesce(s.sm, 0.0) AS v
        FROM nodes nd LEFT JOIN (
            SELECT e.dst AS node, sum(h.v) AS sm
            FROM edges e JOIN h{i-1} h ON e.src = h.node
            GROUP BY 1) s ON nd.node = s.node),
    a{i}n AS MATERIALIZED (SELECT sqrt(sum(v*v)) AS nrm FROM a{i}r),
    a{i} AS MATERIALIZED (SELECT node,
        CASE WHEN n.nrm > 0 THEN v / n.nrm ELSE v END AS v
        FROM a{i}r, a{i}n n),
    h{i}r AS MATERIALIZED (SELECT nd.node, coalesce(s.sm, 0.0) AS v
        FROM nodes nd LEFT JOIN (
            SELECT e.src AS node, sum(a.v) AS sm
            FROM edges e JOIN a{i} a ON e.dst = a.node
            GROUP BY 1) s ON nd.node = s.node),
    h{i}n AS MATERIALIZED (SELECT sqrt(sum(v*v)) AS nrm FROM h{i}r),
    h{i} AS MATERIALIZED (SELECT node,
        CASE WHEN n.nrm > 0 THEN v / n.nrm ELSE v END AS v
        FROM h{i}r, h{i}n n)""")
    return ("WITH" + ",".join(ctes) + f"""
    SELECT a{iters}.node, round(a{iters}.v, 6) AS authority,
           round(h{iters}.v, 6) AS hub
    FROM a{iters} JOIN h{iters} ON a{iters}.node = h{iters}.node
    ORDER BY 1""")


ORACLES["q_hits"] = _hits_sql()


ORACLES["q_posting_lists"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    uni AS (SELECT doc_id, unnest(tk) AS term FROM toks),
    bi AS (SELECT doc_id,
                  unnest(list_transform(
                      generate_series(1, len(tk) - 1),
                      i -> tk[i] || '_' || tk[i + 1])) AS term
           FROM toks),
    pc AS (SELECT DISTINCT doc_id, term
           FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
    nd AS (SELECT count(*) AS n FROM documents),
    g AS (SELECT term, count(*) AS df,
                 string_agg(CAST(doc_id AS VARCHAR), ','
                            ORDER BY doc_id) AS postings
          FROM pc GROUP BY term)
    SELECT term, CAST(df AS BIGINT) AS df, postings
    FROM g CROSS JOIN nd
    WHERE df >= 5 AND df * 5 <= nd.n * 3
    ORDER BY term
"""


ORACLES["q_covisit"] = """
    WITH e AS (SELECT DISTINCT user_id AS u, event_id % 251 AS item
               FROM events WHERE user_id IS NOT NULL),
    r AS (SELECT u, item,
                 row_number() OVER (PARTITION BY u ORDER BY item) AS rn
          FROM e),
    k AS (SELECT u, item FROM r WHERE rn <= 12),
    p AS (SELECT a.item AS i1, b.item AS i2
          FROM k a JOIN k b ON a.u = b.u AND a.item < b.item)
    SELECT i1, i2, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY 1, 2 HAVING count(*) >= 2
    ORDER BY 1, 2
"""


ORACLES["q_funnel_windowed"] = """
    WITH e AS (SELECT user_id AS u, ts, event_id, event_type
               FROM events WHERE user_id IS NOT NULL),
    v1 AS (SELECT u, ts, event_id FROM (
        SELECT u, ts, event_id,
               row_number() OVER (PARTITION BY u
                                  ORDER BY ts, event_id) AS rn
        FROM e WHERE event_type = 'view') WHERE rn = 1),
    c1 AS (SELECT u, ts, event_id FROM (
        SELECT e.u, e.ts, e.event_id,
               row_number() OVER (PARTITION BY e.u
                                  ORDER BY e.ts, e.event_id) AS rn
        FROM e JOIN v1 ON e.u = v1.u
         AND (e.ts > v1.ts OR (e.ts = v1.ts AND e.event_id > v1.event_id))
         AND e.ts <= v1.ts + INTERVAL 24 HOUR
        WHERE e.event_type = 'click') WHERE rn = 1),
    p1 AS (SELECT DISTINCT e.u
        FROM e JOIN c1 ON e.u = c1.u
         AND (e.ts > c1.ts OR (e.ts = c1.ts AND e.event_id > c1.event_id))
         AND e.ts <= c1.ts + INTERVAL 24 HOUR
        WHERE e.event_type = 'purchase'),
    users AS (SELECT DISTINCT u FROM e),
    staged AS (SELECT users.u,
        CASE WHEN p1.u IS NOT NULL THEN 'purchase'
             WHEN c1.u IS NOT NULL THEN 'click'
             WHEN v1.u IS NOT NULL THEN 'view'
             ELSE 'none' END AS stage
        FROM users LEFT JOIN v1 ON users.u = v1.u
                   LEFT JOIN c1 ON users.u = c1.u
                   LEFT JOIN p1 ON users.u = p1.u)
    SELECT stage, CAST(count(*) AS BIGINT) AS n_users
    FROM staged GROUP BY stage ORDER BY stage
"""


ORACLES["q_exact_kth"] = """
    WITH v AS (SELECT value FROM events WHERE value IS NOT NULL),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
    med AS (SELECT value AS median FROM v, n
            ORDER BY value LIMIT 1 OFFSET (SELECT (n + 1) // 2 - 1 FROM n)),
    p90 AS (SELECT value AS p90 FROM v
            ORDER BY value LIMIT 1
            OFFSET (SELECT (9 * n + 9) // 10 - 1 FROM n))
    SELECT n.n, med.median, p90.p90 FROM n, med, p90
"""


ORACLES["q_cube_docs"] = """
    SELECT coalesce(CAST(lang AS VARCHAR), 'ALL') AS lang,
           coalesce(CAST(source AS VARCHAR), 'ALL') AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY CUBE (lang, source)
    ORDER BY 1, 2
"""


ORACLES["q_zorder"] = """
    SELECT doc_id,
           CAST((((doc_id % 65536) >> 0) & 1) * 1
             + (((n_chars % 65536) >> 0) & 1) * 2
             + (((doc_id % 65536) >> 1) & 1) * 4
             + (((n_chars % 65536) >> 1) & 1) * 8
             + (((doc_id % 65536) >> 2) & 1) * 16
             + (((n_chars % 65536) >> 2) & 1) * 32
             + (((doc_id % 65536) >> 3) & 1) * 64
             + (((n_chars % 65536) >> 3) & 1) * 128
             + (((doc_id % 65536) >> 4) & 1) * 256
             + (((n_chars % 65536) >> 4) & 1) * 512
             + (((doc_id % 65536) >> 5) & 1) * 1024
             + (((n_chars % 65536) >> 5) & 1) * 2048
             + (((doc_id % 65536) >> 6) & 1) * 4096
             + (((n_chars % 65536) >> 6) & 1) * 8192
             + (((doc_id % 65536) >> 7) & 1) * 16384
             + (((n_chars % 65536) >> 7) & 1) * 32768
             + (((doc_id % 65536) >> 8) & 1) * 65536
             + (((n_chars % 65536) >> 8) & 1) * 131072
             + (((doc_id % 65536) >> 9) & 1) * 262144
             + (((n_chars % 65536) >> 9) & 1) * 524288
             + (((doc_id % 65536) >> 10) & 1) * 1048576
             + (((n_chars % 65536) >> 10) & 1) * 2097152
             + (((doc_id % 65536) >> 11) & 1) * 4194304
             + (((n_chars % 65536) >> 11) & 1) * 8388608
             + (((doc_id % 65536) >> 12) & 1) * 16777216
             + (((n_chars % 65536) >> 12) & 1) * 33554432
             + (((doc_id % 65536) >> 13) & 1) * 67108864
             + (((n_chars % 65536) >> 13) & 1) * 134217728
             + (((doc_id % 65536) >> 14) & 1) * 268435456
             + (((n_chars % 65536) >> 14) & 1) * 536870912
             + (((doc_id % 65536) >> 15) & 1) * 1073741824
             + (((n_chars % 65536) >> 15) & 1) * 2147483648 AS BIGINT) AS zkey,
           CAST(((((doc_id % 65536) >> 0) & 1) * 1
             + (((n_chars % 65536) >> 0) & 1) * 2
             + (((doc_id % 65536) >> 1) & 1) * 4
             + (((n_chars % 65536) >> 1) & 1) * 8
             + (((doc_id % 65536) >> 2) & 1) * 16
             + (((n_chars % 65536) >> 2) & 1) * 32
             + (((doc_id % 65536) >> 3) & 1) * 64
             + (((n_chars % 65536) >> 3) & 1) * 128
             + (((doc_id % 65536) >> 4) & 1) * 256
             + (((n_chars % 65536) >> 4) & 1) * 512
             + (((doc_id % 65536) >> 5) & 1) * 1024
             + (((n_chars % 65536) >> 5) & 1) * 2048
             + (((doc_id % 65536) >> 6) & 1) * 4096
             + (((n_chars % 65536) >> 6) & 1) * 8192
             + (((doc_id % 65536) >> 7) & 1) * 16384
             + (((n_chars % 65536) >> 7) & 1) * 32768
             + (((doc_id % 65536) >> 8) & 1) * 65536
             + (((n_chars % 65536) >> 8) & 1) * 131072
             + (((doc_id % 65536) >> 9) & 1) * 262144
             + (((n_chars % 65536) >> 9) & 1) * 524288
             + (((doc_id % 65536) >> 10) & 1) * 1048576
             + (((n_chars % 65536) >> 10) & 1) * 2097152
             + (((doc_id % 65536) >> 11) & 1) * 4194304
             + (((n_chars % 65536) >> 11) & 1) * 8388608
             + (((doc_id % 65536) >> 12) & 1) * 16777216
             + (((n_chars % 65536) >> 12) & 1) * 33554432
             + (((doc_id % 65536) >> 13) & 1) * 67108864
             + (((n_chars % 65536) >> 13) & 1) * 134217728
             + (((doc_id % 65536) >> 14) & 1) * 268435456
             + (((n_chars % 65536) >> 14) & 1) * 536870912
             + (((doc_id % 65536) >> 15) & 1) * 1073741824
             + (((n_chars % 65536) >> 15) & 1) * 2147483648) // 67108864 AS BIGINT) AS zbucket
    FROM documents WHERE n_chars IS NOT NULL
    ORDER BY doc_id
"""


ORACLES["q_upsert"] = """
    WITH base AS (
        SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
               0 AS rev, 'I' AS op, md5(coalesce(text, '')) AS content_hash
        FROM documents),
    chg AS (
        SELECT 'u' || CAST(doc_id AS VARCHAR) AS url,
               1 AS rev, 'U' AS op,
               md5(coalesce(text, '') || '@1') AS content_hash
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT 'u' || CAST(doc_id AS VARCHAR), 2, 'U',
               md5(coalesce(text, '') || '@2')
        FROM documents WHERE doc_id % 9 = 0
        UNION ALL
        SELECT 'u' || CAST(doc_id AS VARCHAR), 3, 'D', NULL
        FROM documents WHERE doc_id % 7 = 0),
    log AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
    ranked AS (
        SELECT url, rev, op, content_hash,
               CAST(count(*) OVER (PARTITION BY url) AS BIGINT) AS n_versions,
               row_number() OVER (PARTITION BY url ORDER BY rev DESC) AS rn
        FROM log)
    SELECT url, CAST(rev AS BIGINT) AS last_rev, content_hash, n_versions
    FROM ranked WHERE rn = 1 AND op <> 'D'
    ORDER BY url
"""


ORACLES["q_scd2"] = """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type
        FROM events WHERE user_id IS NOT NULL),
    m AS (
        SELECT *, CASE WHEN lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY t_us, event_id)
                       IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        FROM e),
    g AS (
        SELECT *, sum(chg) OVER (PARTITION BY user_id
                                 ORDER BY t_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS grp
        FROM m),
    r AS (
        SELECT user_id, grp,
               min(event_type) AS event_type,
               min(t_us) AS valid_from_us,
               CAST(count(*) AS BIGINT) AS n_events
        FROM g GROUP BY user_id, grp)
    SELECT user_id, event_type,
           CAST(valid_from_us AS BIGINT) AS valid_from_us,
           CAST(lead(valid_from_us) OVER (
                PARTITION BY user_id ORDER BY grp) AS DOUBLE) AS valid_to_us,
           n_events
    FROM r
"""


def _kcore_sql(k: int = 3, rounds: int = 10) -> str:
    """Unrolled synchronous k-core peel — same edge generator as
    q_kcore (three offset conditions + existence join).  MATERIALIZED
    CTEs for the _hits_sql reason (plain CTEs re-evaluate the whole
    peel prefix exponentially)."""
    ctes = ["""
    e0 AS MATERIALIZED (
        SELECT d.doc_id AS src, d.doc_id + o.off AS dst
        FROM documents d
        JOIN (VALUES (1), (2), (5)) o(off) ON TRUE
        JOIN documents t ON t.doc_id = d.doc_id + o.off
        WHERE (o.off = 1 AND (d.doc_id * d.doc_id + 3 * d.doc_id) % 11 >= 3)
           OR (o.off = 2 AND (d.doc_id * 7 + 1) % 5 >= 2)
           OR (o.off = 5 AND (d.doc_id * 3 + 2) % 7 >= 3))"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""
    d{i} AS MATERIALIZED (
        SELECT node, count(*) AS deg FROM (
            SELECT src AS node FROM e{i-1}
            UNION ALL SELECT dst FROM e{i-1}) GROUP BY node),
    s{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k}),
    e{i} AS MATERIALIZED (
        SELECT e.src, e.dst FROM e{i-1} e
        JOIN s{i} a ON e.src = a.node
        JOIN s{i} b ON e.dst = b.node)""")
    return ("WITH" + ",".join(ctes) + f"""
    SELECT node, CAST(deg AS BIGINT) AS deg FROM (
        SELECT node, count(*) AS deg FROM (
            SELECT src AS node FROM e{rounds}
            UNION ALL SELECT dst FROM e{rounds}) GROUP BY node)
    WHERE deg >= {k} ORDER BY node
""")


ORACLES["q_kcore"] = _kcore_sql()


ORACLES["q_skyline"] = """
    WITH pts AS (
        SELECT doc_id, n_chars AS x, (doc_id * 37 + 11) % 1000 AS y
        FROM documents WHERE n_chars IS NOT NULL),
    w AS (
        SELECT doc_id, x, y,
               max(y) OVER (ORDER BY x DESC
                            RANGE BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS mgt,
               max(y) OVER (PARTITION BY x) AS meq
        FROM pts)
    SELECT doc_id, x, y FROM w
    WHERE (mgt IS NULL OR y > mgt) AND y = meq
    ORDER BY doc_id
"""


ORACLES["q_interval_coverage"] = """
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s,
               epoch_us(ts) + ((event_id * 7919) % 3600 + 60) * 1000000 AS e
        FROM events WHERE user_id IS NOT NULL),
    m AS (
        SELECT user_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS pm
        FROM iv),
    g AS (
        SELECT *, CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS ni
        FROM m),
    gi AS (
        SELECT *, sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS UNBOUNDED PRECEDING) AS isl
        FROM g),
    isl AS (
        SELECT user_id, isl, min(s) AS s0, max(e) AS e1
        FROM gi GROUP BY 1, 2)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(sum(e1 - s0) AS BIGINT) AS covered_us,
           count(*) AS n_islands
    FROM isl GROUP BY user_id ORDER BY user_id
"""


ORACLES["q_assortativity"] = """
    WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
    e AS (
        SELECT doc_id AS src, (doc_id * doc_id + 1) % m AS dst
        FROM documents, mx
        UNION ALL SELECT doc_id, (doc_id * 3 + 7) % m FROM documents, mx
        UNION ALL SELECT doc_id, (doc_id // 2 + 13) % m FROM documents, mx),
    ends AS (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e),
    deg AS (SELECT node, count(*) AS d FROM ends GROUP BY node),
    pairs AS (
        SELECT ds.d AS x, dd.d AS y
        FROM e JOIN deg ds ON e.src = ds.node JOIN deg dd ON e.dst = dd.node
        UNION ALL
        SELECT dd.d, ds.d
        FROM e JOIN deg ds ON e.src = ds.node JOIN deg dd ON e.dst = dd.node),
    s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
          FROM pairs)
    SELECT CAST(n AS BIGINT) AS n_ends,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS assortativity
    FROM s
"""


ORACLES["q_profile"] = """
    SELECT count(*) AS n_rows,
           count(*) - count(lang) AS null_lang,
           count(DISTINCT lang) AS distinct_lang,
           count(DISTINCT source) AS distinct_source,
           min(n_chars) AS min_n_chars,
           max(n_chars) AS max_n_chars,
           CAST(sum(n_chars) AS BIGINT) AS sum_n_chars,
           CAST(sum(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS empty_text
    FROM documents
"""


ORACLES["q_table_checksum"] = """
    SELECT count(*) AS n_rows,
           CAST(sum(CAST(concat('0x', substr(md5(
                        concat(CAST(doc_id AS VARCHAR), '|', text)
                    ), 1, 15)) AS BIGINT))
                % 9223372036854775807 AS BIGINT) AS checksum
    FROM documents
"""


ORACLES["q_url_canonical"] = """
    -- inverts q_url_canonical's deterministic mangling template: all
    -- five messy variants of a doc's URL canonicalize to this string
    SELECT 'https://site' || CAST(doc_id % 3 AS VARCHAR) ||
           '.com/p/' || CAST(doc_id // 16 AS VARCHAR) || '?a=1&b=2'
               AS canonical,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1 ORDER BY 1
"""


ORACLES["q_link_predict"] = """
    WITH e AS (SELECT DISTINCT user_id AS u, event_id % 251 AS item
               FROM events WHERE user_id IS NOT NULL),
    r AS (SELECT u, item,
                 row_number() OVER (PARTITION BY u ORDER BY item) AS rn
          FROM e),
    k AS (SELECT u, item FROM r WHERE rn <= 12),
    d AS (SELECT u, count(*) AS deg FROM k GROUP BY u),
    p AS (SELECT a.item AS i1, b.item AS i2, 27720 // d.deg AS w
          FROM k a JOIN k b ON a.u = b.u AND a.item < b.item
          JOIN d ON d.u = a.u)
    SELECT i1, i2, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(w) AS BIGINT) AS ra_scaled
    FROM p GROUP BY 1, 2 HAVING count(*) >= 2
    ORDER BY 1, 2
"""


ORACLES["q_corr_grouped"] = """
    -- same closed form from the same exact integers as the engine:
    -- HUGEINT sums, double conversion only at the final expression
    WITH s AS (SELECT l_returnflag AS flag,
                      CAST(count(*) AS HUGEINT) AS n,
                      sum(CAST(CAST(round(l_quantity) AS BIGINT)
                               AS HUGEINT)) AS sx,
                      sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                               AS HUGEINT)) AS sy,
                      sum(CAST(CAST(round(l_quantity) AS BIGINT)
                               AS HUGEINT) *
                          CAST(round(l_extendedprice * 100) AS BIGINT))
                          AS sxy,
                      sum(CAST(CAST(round(l_quantity) AS BIGINT)
                               AS HUGEINT) *
                          CAST(round(l_quantity) AS BIGINT)) AS sxx,
                      sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                               AS HUGEINT) *
                          CAST(round(l_extendedprice * 100) AS BIGINT))
                          AS syy
               FROM lineitem GROUP BY 1)
    SELECT flag AS l_returnflag, CAST(n AS BIGINT) AS n,
           round(CAST(n * sxy - sx * sy AS DOUBLE) /
                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                  sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS corr_qty_price
    FROM s ORDER BY 1
"""


ORACLES["q_ewma"] = """
    -- last-8-event EWMA, alpha = 1/4, as an exact scaled-integer pair:
    -- S_n = 4^(n-1) E_n = sum c_i x_i, c_1 = 3^(n-1),
    -- c_i = 3^(n-i) * 4^(i-2); powers <= 3^7*4^6 are exact doubles so
    -- the BIGINT casts are lossless
    WITH e AS (SELECT user_id AS u, value, ts, event_id FROM events
               WHERE user_id IS NOT NULL AND value IS NOT NULL),
    r AS (SELECT u, CAST(round(value * 100) AS BIGINT) AS x,
                 row_number() OVER (PARTITION BY u
                                    ORDER BY ts DESC, event_id DESC) AS rd
          FROM e),
    w AS (SELECT u, x, rd FROM r WHERE rd <= 8),
    s AS (SELECT u, x,
                 count(*) OVER (PARTITION BY u) AS n,
                 count(*) OVER (PARTITION BY u) - rd + 1 AS i
          FROM w)
    SELECT u AS user_id,
           CAST(sum(x * CASE WHEN i = 1
                             THEN CAST(power(3, n - 1) AS BIGINT)
                             ELSE CAST(power(3, n - i) AS BIGINT) *
                                  CAST(power(4, i - 2) AS BIGINT)
                        END) AS BIGINT) AS ewma_num,
           CAST(power(4, max(n) - 1) AS BIGINT) AS ewma_den
    FROM s GROUP BY u ORDER BY user_id
"""


ORACLES["q_trimmed_mean"] = """
    WITH r AS (SELECT l_returnflag AS f,
                      CAST(round(l_quantity) AS BIGINT) AS q,
                      row_number() OVER (PARTITION BY l_returnflag
                                         ORDER BY l_quantity) AS rn,
                      count(*) OVER (PARTITION BY l_returnflag) AS n
               FROM lineitem)
    SELECT f AS l_returnflag,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(q) AS BIGINT) AS trimmed_sum,
           round(CAST(sum(q) AS DOUBLE) / count(*), 6) AS trimmed_mean
    FROM r WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY f ORDER BY f
"""


ORACLES["q_anchor_terms"] = """
    -- inverts the synthetic chrome template: fixed anchors per page
    -- ('/' carries Home + Synthetic Corpus; share-widget anchors are
    -- fragment-only and must be absent), one page per document
    WITH n AS (SELECT count(*) AS pages FROM documents),
    t(path, term, mult) AS (VALUES
        ('/', 'home', 1), ('/', 'synthetic', 1), ('/', 'corpus', 1),
        ('/archive', 'archive', 1), ('/tags', 'tags', 1),
        ('/about', 'about', 1), ('/about', 'us', 1),
        ('/privacy', 'privacy', 1), ('/privacy', 'policy', 1),
        ('/terms', 'terms', 1), ('/contact', 'contact', 1))
    SELECT path, term, CAST(pages * mult AS BIGINT) AS n
    FROM t CROSS JOIN n ORDER BY path, term
"""


ORACLES["q_source_overlap"] = """
    WITH st AS (SELECT DISTINCT source,
                       unnest(list_filter(regexp_split_to_array(
                           coalesce(text, ''), '[ \t\n\r\f\v]+'),
                           x -> x <> '')) AS tok
                FROM documents),
    vocab AS (SELECT source, count(*) AS nv FROM st GROUP BY 1),
    srcs AS (SELECT DISTINCT source FROM documents),
    p AS (SELECT a.source AS sa, b.source AS sb
          FROM srcs a JOIN srcs b ON a.source < b.source),
    inter AS (SELECT x.source AS sa, y.source AS sb, count(*) AS n
              FROM st x JOIN st y
                ON x.tok = y.tok AND x.source < y.source
              GROUP BY 1, 2)
    SELECT p.sa AS source_a, p.sb AS source_b,
           CAST(coalesce(i.n, 0) AS BIGINT) AS n_common,
           CAST(va.nv + vb.nv - coalesce(i.n, 0) AS BIGINT) AS n_union,
           round(CAST(coalesce(i.n, 0) AS DOUBLE) /
                 (va.nv + vb.nv - coalesce(i.n, 0)), 6) AS jaccard
    FROM p LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb
    JOIN vocab va ON va.source = p.sa
    JOIN vocab vb ON vb.source = p.sb
    ORDER BY 1, 2
"""


ORACLES["q_degree_dist"] = """
    WITH mm AS (SELECT max(doc_id) + 1 AS m FROM documents),
    gen AS (SELECT doc_id AS src, (doc_id * doc_id + 5) % m AS dst
            FROM documents, mm
            UNION ALL
            SELECT doc_id, (doc_id * 7 + 3) % m FROM documents, mm
            UNION ALL
            SELECT doc_id, (doc_id // 3 + 11) % m FROM documents, mm),
    ends AS (SELECT 'out' AS direction, src AS node FROM gen
             UNION ALL
             SELECT 'in', dst FROM gen),
    deg AS (SELECT direction, node, count(*) AS d
            FROM ends GROUP BY 1, 2)
    SELECT direction, CAST(floor(log2(CAST(d AS DOUBLE))) AS BIGINT)
               AS bucket,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES["q_reciprocity"] = """
    WITH mm AS (SELECT max(doc_id) + 1 AS m FROM documents),
    gen AS (SELECT doc_id AS src, (doc_id * doc_id + 5) % m AS dst
            FROM documents, mm
            UNION ALL
            SELECT doc_id, (doc_id * 7 + 3) % m FROM documents, mm
            UNION ALL
            SELECT doc_id, (doc_id // 3 + 11) % m FROM documents, mm),
    e AS (SELECT DISTINCT src, dst FROM gen),
    mu AS (SELECT count(*) AS n_mutual
           FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src),
    tot AS (SELECT count(*) AS n_edges FROM e)
    SELECT CAST(mu.n_mutual AS BIGINT) AS n_mutual,
           CAST(tot.n_edges AS BIGINT) AS n_edges,
           round(CAST(mu.n_mutual AS DOUBLE) / tot.n_edges, 6)
               AS reciprocity
    FROM mu, tot
"""


ORACLES["q_ks_test"] = """
    WITH h AS (SELECT source, n_chars AS x, count(*) AS c
               FROM documents GROUP BY 1, 2),
    xs AS (SELECT DISTINCT n_chars AS x FROM documents),
    srcs AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    tot AS (SELECT count(*) AS gn FROM documents),
    grid AS (SELECT s.source, xs.x FROM srcs s CROSS JOIN xs),
    cum AS (SELECT g.source, g.x,
                   CAST(sum(coalesce(h.c, 0)) OVER
                        (PARTITION BY g.source ORDER BY g.x) AS HUGEINT)
                       AS cs
            FROM grid g LEFT JOIN h ON h.source = g.source AND h.x = g.x),
    ca AS (SELECT x, CAST(sum(cx) OVER (ORDER BY x) AS HUGEINT) AS call
           FROM (SELECT x, sum(c) AS cx FROM h GROUP BY 1)),
    d AS (SELECT cum.source,
                 max(abs(cum.cs * (tot.gn - s.n)
                         - (ca.call - cum.cs) * s.n)) AS dnum
          FROM cum JOIN ca USING (x)
          JOIN srcs s ON s.source = cum.source CROSS JOIN tot
          GROUP BY cum.source)
    SELECT d.source, CAST(s.n AS BIGINT) AS n_source,
           round(CAST(d.dnum AS DOUBLE)
                 / (CAST(s.n AS DOUBLE) * (tot.gn - s.n)), 6) AS ks_d
    FROM d JOIN srcs s ON s.source = d.source CROSS JOIN tot
    ORDER BY 1
"""


ORACLES["q_ab_test"] = """
    WITH e AS (SELECT event_type, CAST(user_id AS BIGINT) % 2 AS arm,
                      CAST(round(value * 100) AS HUGEINT) AS x
               FROM events
               WHERE user_id IS NOT NULL AND value IS NOT NULL),
    s AS (SELECT event_type, arm, count(*) AS n,
                 sum(x) AS sx, sum(x * x) AS sxx
          FROM e GROUP BY 1, 2),
    j AS (SELECT a.event_type,
                 a.n AS na, a.sx AS sa, a.sxx AS ssa,
                 b.n AS nb, b.sx AS sb, b.sxx AS ssb
          FROM s a JOIN s b ON a.event_type = b.event_type
          WHERE a.arm = 0 AND b.arm = 1)
    SELECT event_type,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           round(CAST(sa AS DOUBLE) / na, 6) AS mean_a_cents,
           round(CAST(sb AS DOUBLE) / nb, 6) AS mean_b_cents,
           round((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
                 / sqrt(((CAST(ssa AS DOUBLE)
                          - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / na)
                         / (na - 1)) / na
                        + ((CAST(ssb AS DOUBLE)
                            - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / nb)
                           / (nb - 1)) / nb),
                 6) AS t_welch
    FROM j ORDER BY 1
"""


ORACLES["q_feature_hash"] = f"""
    WITH probe AS (SELECT doc_id, text FROM documents
                   WHERE doc_id % 41 = 0),
    toks AS (SELECT doc_id, {_TOKS} AS tk FROM probe),
    pc AS (SELECT doc_id, unnest(tk) AS tok FROM toks)
    SELECT doc_id, CAST(md5_number_upper(tok) % 256 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM pc GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES["q_benford"] = """
    WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                                        AS BIGINT) AS VARCHAR), 1, 1)
                      AS BIGINT) AS digit
               FROM orders
               WHERE round(o_totalprice * 100) > 0),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
    t AS (SELECT sum(n) AS tot FROM c)
    SELECT c.digit, CAST(c.n AS BIGINT) AS n,
           round(CAST(c.n AS DOUBLE) / t.tot, 6) AS pct,
           round(log10(1.0 + 1.0 / c.digit), 6) AS benford_pct
    FROM c CROSS JOIN t ORDER BY 1
"""


ORACLES["q_lang_entropy"] = """
    WITH c AS (SELECT source, lang, count(*) AS c
               FROM documents GROUP BY 1, 2),
    n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
                 count(*) AS n_langs
          FROM c GROUP BY 1)
    SELECT c.source, n.n AS n_docs,
           CAST(n.n_langs AS BIGINT) AS n_langs,
           round(sum(-(CAST(c.c AS DOUBLE) / n.n)
                     * ln(CAST(c.c AS DOUBLE) / n.n)), 6) AS entropy_nats
    FROM c JOIN n USING (source)
    GROUP BY 1, 2, 3 ORDER BY 1
"""


ORACLES["q_user_concentration"] = """
    WITH c AS (SELECT user_id, count(*) AS c FROM events
               WHERE user_id IS NOT NULL GROUP BY 1),
    s AS (SELECT count(*) AS n_users,
                 CAST(sum(c) AS HUGEINT) AS n,
                 CAST(sum(c * c) AS HUGEINT) AS s2
          FROM c)
    SELECT CAST(n AS BIGINT) AS n_events,
           CAST(n_users AS BIGINT) AS n_users,
           round(CAST(s2 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS simpson,
           round(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                 / CAST(s2 AS DOUBLE), 6) AS eff_users
    FROM s
"""


ORACLES["q_chi2_cells"] = """
    WITH c AS (SELECT lang, source, count(*) AS o
               FROM documents GROUP BY 1, 2),
    r AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM c GROUP BY 1),
    k AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM c GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    g AS (SELECT r.lang, k.source, r.rt, k.ct FROM r CROSS JOIN k)
    SELECT g.lang, g.source,
           CAST(coalesce(c.o, 0) AS BIGINT) AS n_obs,
           round(CAST(g.rt AS DOUBLE) * g.ct / t.n, 6) AS expected,
           round(pow(coalesce(c.o, 0)
                     - CAST(g.rt AS DOUBLE) * g.ct / t.n, 2)
                 / (CAST(g.rt AS DOUBLE) * g.ct / t.n), 6) AS chi2_term
    FROM g LEFT JOIN c USING (lang, source) CROSS JOIN t
    ORDER BY 1, 2
"""


ORACLES["q_mad"] = """
    WITH c AS (SELECT l_returnflag,
                      CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
               FROM lineitem)
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
           round(median(cents) / 100.0, 6) AS median_price,
           round(mad(cents) / 100.0, 6) AS mad_price
    FROM c GROUP BY 1 ORDER BY 1
"""


ORACLES["q_mannwhitney"] = """
    WITH e AS (SELECT event_type, CAST(user_id AS BIGINT) % 2 AS arm,
                      CAST(round(value * 100) AS BIGINT) AS x
               FROM events
               WHERE user_id IS NOT NULL AND value IS NOT NULL),
    h AS (SELECT event_type, x,
                 count(*) FILTER (WHERE arm = 0) AS ca,
                 count(*) FILTER (WHERE arm = 1) AS cb
          FROM e GROUP BY 1, 2),
    w AS (SELECT event_type, x, ca, cb,
                 CAST(coalesce(sum(cb) OVER
                          (PARTITION BY event_type ORDER BY x
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0) AS HUGEINT)
                     AS cb_below
          FROM h),
    u AS (SELECT event_type,
                 CAST(sum(ca) AS HUGEINT) AS na,
                 CAST(sum(cb) AS HUGEINT) AS nb,
                 CAST(sum(ca * (2 * cb_below + cb)) AS HUGEINT) AS u2
          FROM w GROUP BY 1)
    SELECT event_type,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(u2 AS DOUBLE) / 2 AS u_a,
           round(CAST(u2 AS DOUBLE)
                 / (2 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS auc
    FROM u ORDER BY 1
"""


ORACLES["q_robots_filter"] = """
    WITH d AS (SELECT 'site' || CAST(doc_id % 3 AS VARCHAR) || '.com' AS host,
                      '/p/' || CAST(doc_id // 16 AS VARCHAR) AS path
               FROM documents),
    f AS (SELECT host,
                 CASE WHEN host = 'site0.com' AND path LIKE '/p/1%' THEN 1
                      WHEN host = 'site1.com' AND path LIKE '/p/7%' THEN 1
                      WHEN host = 'site2.com' AND path LIKE '/p/3%' THEN 1
                      ELSE 0 END AS blocked
          FROM d)
    SELECT host,
           CAST(count(*) FILTER (WHERE blocked = 0) AS BIGINT) AS n_allowed,
           CAST(count(*) FILTER (WHERE blocked = 1) AS BIGINT) AS n_blocked
    FROM f GROUP BY 1 ORDER BY 1
"""


ORACLES["q_market_basket"] = """
    WITH bi AS (SELECT DISTINCT l_orderkey AS o, l_partkey % 97 AS i
                FROM lineitem),
    n AS (SELECT count(DISTINCT o) AS n_orders FROM bi),
    ic AS (SELECT i, count(*) AS c FROM bi GROUP BY 1),
    p AS (SELECT a.i AS i1, b.i AS i2, count(*) AS sup
          FROM bi a JOIN bi b ON a.o = b.o AND a.i < b.i
          GROUP BY 1, 2 HAVING count(*) >= 25),
    r AS (SELECT i1 AS ante, i2 AS cons, sup FROM p
          UNION ALL SELECT i2, i1, sup FROM p)
    SELECT r.ante, r.cons, CAST(r.sup AS BIGINT) AS support,
           round(CAST(r.sup AS DOUBLE) / ca.c, 6) AS confidence,
           round(CAST(r.sup AS DOUBLE) * n.n_orders / (ca.c * cb.c), 6)
               AS lift
    FROM r JOIN ic ca ON ca.i = r.ante
           JOIN ic cb ON cb.i = r.cons CROSS JOIN n
    ORDER BY 1, 2
"""


ORACLES["q_clustering_coeff"] = """
    WITH nd AS (SELECT doc_id AS d FROM documents),
    e1 AS (SELECT a.d AS u, b.d AS v FROM nd a JOIN nd b ON b.d = a.d + 1
           WHERE ((a.d * a.d + 3 * a.d) % 11) >= 3),
    e2 AS (SELECT a.d AS u, b.d AS v FROM nd a JOIN nd b ON b.d = a.d + 2
           WHERE ((7 * a.d + 5) % 13) >= 4),
    e AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
          FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
          WHERE u <> v),
    sym AS (SELECT u AS node FROM e UNION ALL SELECT v FROM e),
    deg AS (SELECT node, CAST(count(*) AS HUGEINT) AS dg
            FROM sym GROUP BY 1),
    w AS (SELECT CAST(sum(dg * (dg - 1)) AS HUGEINT) // 2 AS wedges
          FROM deg),
    tri AS (SELECT count(*) AS t
            FROM e x JOIN e y ON y.u = x.v
                     JOIN e z ON z.u = x.u AND z.v = y.v)
    SELECT CAST(tri.t AS BIGINT) AS n_triangles,
           CAST(w.wedges AS BIGINT) AS n_wedges,
           round(3.0 * tri.t / w.wedges, 6) AS global_cc
    FROM tri CROSS JOIN w
"""


ORACLES["q_gini"] = """
    WITH c AS (SELECT user_id, count(*) AS c FROM events
               WHERE user_id IS NOT NULL GROUP BY 1),
    r AS (SELECT c, row_number() OVER (ORDER BY c) AS i FROM c),
    s AS (SELECT count(*) AS n, CAST(sum(c) AS HUGEINT) AS tot,
                 CAST(sum(CAST(i AS HUGEINT) * c) AS HUGEINT) AS sic
          FROM r)
    SELECT CAST(n AS BIGINT) AS n_users, CAST(tot AS BIGINT) AS n_events,
           round((2.0 * sic - (n + 1.0) * tot) / (1.0 * n * tot), 6) AS gini
    FROM s
"""


ORACLES["q_new_users"] = """
    WITH p AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
                      epoch_us(ts) // 86400000000 AS day
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    f AS (SELECT u, min(day) AS first_day FROM p GROUP BY 1),
    nn AS (SELECT first_day AS day, count(*) AS n_new FROM f GROUP BY 1),
    a AS (SELECT day, count(*) AS n_active FROM p GROUP BY 1)
    SELECT a.day, CAST(a.n_active AS BIGINT) AS n_active,
           CAST(coalesce(nn.n_new, 0) AS BIGINT) AS n_new,
           CAST(a.n_active - coalesce(nn.n_new, 0) AS BIGINT)
               AS n_returning
    FROM a LEFT JOIN nn USING (day) ORDER BY 1
"""


ORACLES["q_attribution"] = """
    WITH e AS (SELECT event_id, CAST(user_id AS BIGINT) AS u, event_type,
                      epoch_us(ts) AS t
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_type IN ('click', 'purchase')),
    w AS (SELECT *, max(CASE WHEN event_type = 'click'
                             THEN CAST(t AS HUGEINT) * 4294967296
                                  + event_id END) OVER
              (PARTITION BY u ORDER BY t, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lck
          FROM e)
    SELECT event_id AS purchase_id, u AS user_id,
           CASE WHEN lck IS NOT NULL
                 AND t - CAST(lck // 4294967296 AS BIGINT) <= 259200000000
                THEN CAST(lck % 4294967296 AS BIGINT) ELSE -1 END
               AS click_id,
           CASE WHEN lck IS NOT NULL
                 AND t - CAST(lck // 4294967296 AS BIGINT) <= 259200000000
                THEN t - CAST(lck // 4294967296 AS BIGINT) ELSE -1 END
               AS lag_us
    FROM w WHERE event_type = 'purchase' ORDER BY 1
"""


ORACLES["q_zipf_slope"] = f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
    pc AS (SELECT unnest(tk) AS tok FROM toks),
    cnt AS (SELECT tok, count(*) AS n FROM pc GROUP BY 1),
    top AS (SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS r
            FROM cnt ORDER BY n DESC, tok LIMIT 200)
    SELECT CAST(count(*) AS BIGINT) AS k,
           CAST(max(CASE WHEN r = 1 THEN n END) AS BIGINT) AS n_top1,
           CAST(max(CASE WHEN r = (SELECT count(*) FROM top) THEN n END)
                AS BIGINT) AS n_top_last,
           round(regr_slope(ln(CAST(n AS DOUBLE)),
                            ln(CAST(r AS DOUBLE))), 6) AS zipf_slope
    FROM top
"""


ORACLES["q_dup_ratio"] = """
    WITH h AS (SELECT source, md5(coalesce(text, '')) AS h,
                      count(*) AS c
               FROM documents GROUP BY 1, 2),
    s AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
                 CAST(count(*) AS BIGINT) AS n_distinct,
                 CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                     AS n_dup_docs
          FROM h GROUP BY 1)
    SELECT source, n_docs, n_distinct, n_dup_docs,
           round(CAST(n_dup_docs AS DOUBLE) / n_docs, 6) AS dup_ratio
    FROM s ORDER BY 1
"""


ORACLES["q_rolling_actives"] = """
    WITH p AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
                      epoch_us(ts) // 86400000000 AS day
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    d AS (SELECT day, count(*) AS dau FROM p GROUP BY 1)
    SELECT d.day, CAST(d.dau AS BIGINT) AS dau,
           CAST((SELECT count(DISTINCT p.u) FROM p
                 WHERE p.day BETWEEN d.day - 6 AND d.day) AS BIGINT)
               AS mau7
    FROM d ORDER BY 1
"""


ORACLES["q_cohort_ltv"] = """
    WITH s AS (SELECT CAST(user_id AS BIGINT) AS u,
                      min(epoch_us(ts) // 604800000000) AS cohort_week
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND event_type = 'signup' GROUP BY 1),
    p AS (SELECT CAST(user_id AS BIGINT) AS u,
                 epoch_us(ts) // 604800000000 AS week,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL
            AND value IS NOT NULL AND event_type = 'purchase')
    SELECT s.cohort_week, p.week - s.cohort_week AS week_offset,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(p.cents) AS BIGINT) AS revenue_cents
    FROM p JOIN s USING (u) GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES["q_norm_bands"] = """
    WITH n AS (SELECT round(sqrt(list_sum(list_transform(embedding,
                           x -> CAST(x AS DOUBLE) * x))), 4) AS norm
               FROM embeddings)
    SELECT CAST(floor(norm * 10) AS BIGINT) AS band,
           CAST(count(*) AS BIGINT) AS n_vecs,
           min(norm) AS min_norm, max(norm) AS max_norm
    FROM n GROUP BY 1 ORDER BY 1
"""


ORACLES["q_term_scan"] = """
    WITH t AS (SELECT coalesce(text, '') AS x FROM documents),
    terms(term) AS (VALUES ('table'), ('hash'), ('merge batch'),
                           ('zzz-absent-term'))
    SELECT terms.term,
           CAST(count(*) FILTER (WHERE contains(t.x, terms.term))
                AS BIGINT) AS n_docs,
           CAST(sum((length(t.x) - length(replace(t.x, terms.term, '')))
                    // length(terms.term)) AS BIGINT) AS n_occurrences
    FROM terms CROSS JOIN t GROUP BY 1 ORDER BY 1
"""


ORACLES["q_vocab_growth"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    pc AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
    f AS (SELECT tok, min(doc_id) AS fd FROM pc GROUP BY 1),
    b AS (SELECT CASE WHEN fd = 0 THEN 0
                 ELSE CAST(floor(log2(CAST(fd AS DOUBLE))) AS BIGINT) + 1
                 END AS k, count(*) AS n
          FROM f GROUP BY 1),
    grid AS (SELECT unnest(generate_series(0, (SELECT max(k) FROM b)))
                 AS k)
    SELECT grid.k, CAST(coalesce(b.n, 0) AS BIGINT) AS new_tokens,
           CAST(sum(coalesce(b.n, 0)) OVER (ORDER BY grid.k) AS BIGINT)
               AS vocab
    FROM grid LEFT JOIN b USING (k) ORDER BY 1
"""


ORACLES["q_shard_balance"] = f"""
    WITH d AS (SELECT {_DOMAIN} AS domain FROM documents),
    pd AS (SELECT domain, count(*) AS n_docs FROM d GROUP BY 1)
    SELECT CAST(md5_number_upper(domain) % 8 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_domains,
           CAST(sum(n_docs) AS BIGINT) AS n_docs
    FROM pd GROUP BY 1 ORDER BY 1
"""


ORACLES["q_dup_cluster_sizes"] = """
    WITH h AS (SELECT md5(substr(coalesce(text, ''), 1, 64)) AS h,
                      count(*) AS c
               FROM documents GROUP BY 1)
    SELECT CAST(c AS BIGINT) AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(c * count(*) AS BIGINT) AS n_docs
    FROM h GROUP BY c ORDER BY 1
"""


ORACLES["q_rfm"] = """
    WITH p AS (SELECT CAST(user_id AS BIGINT) AS u,
                      epoch_us(ts) // 86400000000 AS day,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 AND value IS NOT NULL AND event_type = 'purchase'),
    pu AS (SELECT u, max(day) AS last_day, count(*) AS f,
                  CAST(sum(cents) AS BIGINT) AS cents
           FROM p GROUP BY 1),
    band AS (SELECT ((SELECT max(day) FROM p) - last_day) // 7 AS r_band,
                    CAST(floor(log2(CAST(f AS DOUBLE))) AS BIGINT) + 1
                        AS f_band,
                    CASE WHEN cents // 100 = 0 THEN 0
                         ELSE CAST(floor(log2(CAST(cents // 100
                                                   AS DOUBLE)))
                                   AS BIGINT) + 1 END AS m_band
             FROM pu)
    SELECT r_band, f_band, m_band, CAST(count(*) AS BIGINT) AS n_users
    FROM band GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


ORACLES["q_streak"] = """
    WITH p AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
                      epoch_us(ts) // 86400000000 AS day
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    r AS (SELECT u, day,
                 day - row_number() OVER (PARTITION BY u ORDER BY day)
                     AS grp
          FROM p),
    runs AS (SELECT u, count(*) AS len FROM r GROUP BY u, grp),
    mx AS (SELECT u, max(len) AS streak FROM runs GROUP BY u)
    SELECT CAST(streak AS BIGINT) AS streak,
           CAST(count(*) AS BIGINT) AS n_users
    FROM mx GROUP BY 1 ORDER BY 1
"""


ORACLES["q_burst_peak"] = """
    WITH e AS (SELECT event_type, ts FROM events WHERE ts IS NOT NULL),
    c AS (SELECT x.event_type,
                 epoch_us(x.ts) // 86400000000 AS day,
                 count(*) AS c
          FROM e x JOIN e y
            ON y.event_type = x.event_type
           AND y.ts >= x.ts - INTERVAL 1 HOUR AND y.ts <= x.ts
          GROUP BY x.event_type, x.ts, day),
    m AS (SELECT event_type, max(c) AS peak FROM c GROUP BY 1)
    SELECT m.event_type, CAST(m.peak AS BIGINT) AS peak,
           CAST(min(c.day) AS BIGINT) AS peak_day
    FROM m JOIN c ON c.event_type = m.event_type AND c.c = m.peak
    GROUP BY 1, 2 ORDER BY 1
"""


ORACLES["q_anomaly_days"] = """
    WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                      count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1),
    s AS (SELECT avg(CAST(n AS DOUBLE)) AS m,
                 stddev_pop(CAST(n AS DOUBLE)) AS sd
          FROM d)
    SELECT CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n_events,
           round((n - m) / sd, 6) AS z
    FROM d, s
    WHERE sd > 0 AND abs(round((n - m) / sd, 6)) >= 2
    ORDER BY day
"""


ORACLES["q_autocorr"] = """
    WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                      count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1),
    l AS (SELECT n, lead(n) OVER (ORDER BY day) AS n1 FROM d)
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(CAST(n AS DOUBLE), CAST(n1 AS DOUBLE)), 6)
               AS autocorr
    FROM l WHERE n1 IS NOT NULL
"""


ORACLES["q_bpe_pairs"] = f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
    pc AS (SELECT unnest(tk) AS tok FROM toks),
    pr AS (SELECT substr(tok, CAST(i AS INT), 2) AS pair
           FROM (SELECT tok, unnest(range(1, length(tok))) AS i
                 FROM pc)),
    cnt AS (SELECT pair, count(*) AS n FROM pr GROUP BY 1)
    SELECT pair, CAST(n AS BIGINT) AS n FROM cnt
    ORDER BY n DESC, pair LIMIT 20
"""


ORACLES["q_hapax"] = f"""
    WITH toks AS (SELECT source, {_TOKS} AS tk FROM documents),
    pc AS (SELECT source, unnest(tk) AS tok FROM toks),
    cnt AS (SELECT source, tok, count(*) AS n FROM pc GROUP BY 1, 2)
    SELECT source, CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
           round(CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS hapax_ratio
    FROM cnt GROUP BY 1 ORDER BY 1
"""


ORACLES["q_js_divergence"] = f"""
    WITH toks AS (SELECT source, {_TOKS} AS tk FROM documents),
    pc AS (SELECT source, unnest(tk) AS tok FROM toks),
    cnt AS (SELECT source, tok, count(*) AS n FROM pc GROUP BY 1, 2),
    tot AS (SELECT source, sum(n) AS t FROM cnt GROUP BY 1),
    p AS (SELECT c.source, c.tok, CAST(c.n AS DOUBLE) / t.t AS p
          FROM cnt c JOIN tot t USING (source)),
    srcs AS (SELECT DISTINCT source FROM cnt),
    pairs AS (SELECT a.source AS src_a, b.source AS src_b
              FROM srcs a JOIN srcs b ON a.source < b.source),
    vocab AS (SELECT DISTINCT tok FROM cnt),
    u AS (SELECT pr.src_a, pr.src_b,
                 coalesce(x.p, 0) AS px, coalesce(y.p, 0) AS py
          FROM pairs pr
          CROSS JOIN vocab tk
          LEFT JOIN p x ON x.source = pr.src_a AND x.tok = tk.tok
          LEFT JOIN p y ON y.source = pr.src_b AND y.tok = tk.tok
          WHERE coalesce(x.p, 0) + coalesce(y.p, 0) > 0)
    SELECT src_a, src_b,
           round(sum(
               CASE WHEN px > 0
                    THEN px * ln(2 * px / (px + py)) ELSE 0 END
               + CASE WHEN py > 0
                      THEN py * ln(2 * py / (px + py)) ELSE 0 END)
               / 2 / ln(2), 6) AS js
    FROM u GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES["q_char_trigrams"] = """
    WITH s AS (SELECT lang,
                      regexp_replace(lower(coalesce(text, '')),
                                     '[ \t\n\r\f\v]+', ' ', 'g') AS s
               FROM documents),
    tri AS (SELECT lang, substr(s, CAST(i AS INT), 3) AS tri
            FROM (SELECT lang, s, unnest(range(1, length(s) - 1)) AS i
                  FROM s)),
    cnt AS (SELECT lang, tri, count(*) AS n FROM tri GROUP BY 1, 2),
    rk AS (SELECT lang, tri, n,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY n DESC, tri) AS r
           FROM cnt)
    SELECT lang, tri, CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS rank
    FROM rk WHERE r <= 10 ORDER BY lang, rank
"""


ORACLES["q_two_hop"] = """
    WITH nd AS (SELECT doc_id AS d FROM documents),
    e1 AS (SELECT a.d AS u, b.d AS v FROM nd a JOIN nd b ON b.d = a.d + 1
           WHERE ((a.d * a.d + 3 * a.d) % 11) >= 3),
    e2 AS (SELECT a.d AS u, b.d AS v FROM nd a JOIN nd b ON b.d = a.d + 2
           WHERE ((7 * a.d + 5) % 13) >= 4),
    e AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
          FROM (SELECT * FROM e1 UNION ALL SELECT * FROM e2)
          WHERE u <> v),
    sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT a AS node, count(*) AS dg FROM sym GROUP BY 1),
    seeds AS (SELECT node, dg FROM deg ORDER BY dg DESC, node LIMIT 5),
    h1 AS (SELECT s.node AS seed, sym.b AS w
           FROM seeds s JOIN sym ON sym.a = s.node),
    h2 AS (SELECT h1.seed, sym.b AS w FROM h1 JOIN sym ON sym.a = h1.w),
    allw AS (SELECT seed, w FROM h1 UNION SELECT seed, w FROM h2),
    cnt AS (SELECT seed, count(*) AS n2 FROM allw WHERE w <> seed
            GROUP BY 1)
    SELECT s.node AS seed, CAST(s.dg AS BIGINT) AS degree,
           CAST(coalesce(cnt.n2, 0) AS BIGINT) AS n_within_2
    FROM seeds s LEFT JOIN cnt ON cnt.seed = s.node ORDER BY 1
"""


ORACLES["q_churn"] = """
    WITH p AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
                      epoch_us(ts) // (86400000000 * 7) AS wk
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    mx AS (SELECT max(wk) AS m FROM p),
    c AS (SELECT a.wk,
                 count(*) AS n_active,
                 sum(CASE WHEN b.u IS NULL THEN 1 ELSE 0 END)
                     AS n_churned
          FROM p a LEFT JOIN p b ON b.u = a.u AND b.wk = a.wk + 1
          WHERE a.wk < (SELECT m FROM mx)
          GROUP BY 1)
    SELECT CAST(wk AS BIGINT) AS week,
           CAST(n_active AS BIGINT) AS n_active,
           CAST(n_churned AS BIGINT) AS n_churned,
           round(CAST(n_churned AS DOUBLE) / n_active, 6) AS churn_rate
    FROM c ORDER BY 1
"""


ORACLES["q_winsorize"] = """
    WITH q AS (SELECT l_returnflag AS f,
                      quantile_disc(l_quantity, 0.1) AS lo,
                      quantile_disc(l_quantity, 0.9) AS hi
               FROM lineitem GROUP BY 1)
    SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
           q.lo AS lo, q.hi AS hi,
           round(avg(CASE WHEN l.l_quantity < q.lo THEN q.lo
                          WHEN l.l_quantity > q.hi THEN q.hi
                          ELSE l.l_quantity END), 6) AS wmean
    FROM lineitem l JOIN q ON l.l_returnflag = q.f
    GROUP BY 1, q.lo, q.hi ORDER BY 1
"""


ORACLES["q_target_encode"] = """
    WITH j AS (SELECT c.c_mktsegment,
                      CAST(round(o.o_totalprice * 100) AS HUGEINT)
                          AS cents
               FROM orders o JOIN customer c
                 ON c.c_custkey = o.o_custkey),
    seg AS (SELECT c_mktsegment, count(*) AS n,
                   CAST(sum(cents) AS HUGEINT) AS cents
            FROM j GROUP BY 1),
    g AS (SELECT CAST(sum(cents) AS DOUBLE) / sum(n) / 100.0 AS mu
          FROM seg)
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
           round(CAST(cents AS DOUBLE) / n / 100.0, 6) AS mean_price,
           round((CAST(cents AS DOUBLE) / 100.0 + 10.0 * g.mu)
                 / (n + 10.0), 6) AS encoded
    FROM seg, g ORDER BY 1
"""


ORACLES["q_class_weights"] = """
    WITH c AS (SELECT CAST(label AS BIGINT) AS label, count(*) AS n
               FROM embeddings GROUP BY 1),
    s AS (SELECT sum(n) AS total, count(*) AS k FROM c)
    SELECT label, CAST(n AS BIGINT) AS n,
           round(CAST(s.total AS DOUBLE) / (s.k * n), 6) AS weight
    FROM c, s ORDER BY 1
"""


ORACLES["q_oov_rate"] = f"""
    WITH toks AS (SELECT lang, {_TOKS} AS tk FROM documents),
    pc AS (SELECT lang, unnest(tk) AS tok FROM toks),
    cnt AS (SELECT tok, count(*) AS n FROM pc GROUP BY 1),
    top AS (SELECT tok FROM cnt ORDER BY n DESC, tok LIMIT 20)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN tok IN (SELECT tok FROM top)
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
           round(CAST(sum(CASE WHEN tok IN (SELECT tok FROM top)
                               THEN 0 ELSE 1 END) AS DOUBLE)
                 / count(*), 6) AS oov_rate
    FROM pc GROUP BY 1 ORDER BY 1
"""


ORACLES["q_cusum"] = """
    WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                      count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1),
    m AS (SELECT avg(CAST(n AS DOUBLE)) AS mu,
                 count(*) AS nd FROM d),
    c AS (SELECT day,
                 round(abs(sum(CAST(n AS DOUBLE)) OVER (ORDER BY day)
                           - row_number() OVER (ORDER BY day)
                             * (SELECT mu FROM m)), 6) AS a
          FROM d)
    SELECT (SELECT CAST(nd AS BIGINT) FROM m) AS n_days,
           CAST(day AS BIGINT) AS cp_day, a AS max_abs_cusum
    FROM c ORDER BY a DESC, day LIMIT 1
"""


ORACLES["q_tok_len_dist"] = f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
    pc AS (SELECT unnest(tk) AS tok FROM toks)
    SELECT CAST(length(tok) AS BIGINT) AS tok_len,
           CAST(count(*) AS BIGINT) AS n
    FROM pc GROUP BY 1 ORDER BY 1
"""


ORACLES["q_ngram_entropy"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    bg AS (SELECT CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
                       ELSE list_transform(generate_series(1, len(tk) - 1),
                                i -> tk[i] || chr(1) || tk[i+1])
                  END AS bgs
           FROM toks),
    cnt AS (SELECT ngram, count(*) AS c
            FROM (SELECT unnest(bgs) AS ngram FROM bg) GROUP BY 1),
    marg AS (SELECT split_part(ngram, chr(1), 1) AS prev,
                    sum(c) AS cu
             FROM cnt GROUP BY 1),
    tot AS (SELECT sum(c) AS n FROM cnt),
    hj AS (SELECT ln(CAST(n AS DOUBLE))
                  - sum(c * ln(CAST(c AS DOUBLE))) / n AS h
           FROM cnt, tot GROUP BY n),
    hp AS (SELECT ln(CAST(n AS DOUBLE))
                  - sum(cu * ln(CAST(cu AS DOUBLE))) / n AS h
           FROM marg, tot GROUP BY n)
    SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_bigrams,
           round(hj.h / ln(2), 6) AS h_joint,
           round((hj.h - hp.h) / ln(2), 6) AS h_cond
    FROM hj, hp
"""


ORACLES["q_event_paths"] = """
    WITH seq AS (SELECT user_id,
                        list(event_type ORDER BY ts, event_id) AS s
                 FROM events
                 WHERE user_id IS NOT NULL AND ts IS NOT NULL
                 GROUP BY 1),
    tg AS (SELECT CASE WHEN len(s) < 3 THEN CAST([] AS VARCHAR[])
                       ELSE list_transform(generate_series(1, len(s) - 2),
                                i -> s[i] || '>' || s[i+1] || '>' || s[i+2])
                  END AS tgs
           FROM seq)
    SELECT path, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(tgs) AS path FROM tg)
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10
"""


ORACLES["q_zone_map"] = """
    WITH s AS (SELECT doc_id // 64 AS shard, min(n_chars) AS mn,
                      max(n_chars) AS mx, count(*) AS rows_
               FROM documents GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_shards,
           CAST(sum(CASE WHEN mx < 400 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_prunable,
           CAST(sum(CASE WHEN mx < 400 THEN rows_ ELSE 0 END) AS BIGINT)
               AS rows_skipped,
           round(CAST(sum(CASE WHEN mx < 400 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) AS prune_ratio
    FROM s
"""


ORACLES["q_tail_index"] = """
    WITH c AS (SELECT user_id, count(*) AS c FROM events
               WHERE user_id IS NOT NULL GROUP BY 1),
    kk AS (SELECT least(100, count(*) - 1) AS k FROM c),
    r AS (SELECT c, row_number() OVER (ORDER BY c DESC) AS i FROM c),
    xk AS (SELECT c AS xk1 FROM r, kk WHERE i = k + 1),
    h AS (SELECT sum(ln(CAST(r.c AS DOUBLE) / xk.xk1)) / kk.k AS hill
          FROM r, kk, xk WHERE r.i <= kk.k GROUP BY kk.k)
    SELECT (SELECT CAST(k AS BIGINT) FROM kk) AS k,
           (SELECT CAST(xk1 AS BIGINT) FROM xk) AS x_kplus1,
           round(h.hill, 6) AS hill,
           round(1.0 / h.hill, 6) AS alpha
    FROM h
"""


ORACLES["q_f2"] = """
    WITH c AS (SELECT user_id, CAST(count(*) AS HUGEINT) AS c
               FROM events WHERE user_id IS NOT NULL GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(c) AS BIGINT) AS n_rows,
           CAST(CAST(sum(c * c) AS HUGEINT) AS VARCHAR) AS f2
    FROM c
"""


ORACLES["q_integrity"] = """
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
               AS n_lineitem,
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
            LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderkey IS NULL) AS orphan_lineitem,
           (SELECT CAST(count(*) AS BIGINT) FROM orders)
               AS n_orders,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            LEFT JOIN customer c ON c.c_custkey = o.o_custkey
            WHERE c.c_custkey IS NULL) AS orphan_orders
"""


ORACLES["q_emb_quantize"] = """
    WITH x AS (SELECT CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v,
                      CAST(i AS BIGINT) AS d
               FROM embeddings,
                    unnest(range(1, len(embedding) + 1)) AS t(i)),
    mm AS (SELECT d, min(v) AS mn, max(v) AS mx FROM x GROUP BY 1),
    e AS (SELECT x.v, mm.mn, (mm.mx - mm.mn) / 255.0 AS sc
          FROM x JOIN mm USING (d)),
    r AS (SELECT v,
                 CASE WHEN sc = 0 THEN mn
                      ELSE mn + least(greatest(
                               floor((v - mn) / sc + 0.5), 0), 255) * sc
                 END AS recon
          FROM e)
    SELECT CAST(count(*) AS BIGINT) AS n_vals,
           round(max(abs(v - recon)), 6) AS max_abs_err,
           round(avg((v - recon) * (v - recon)) * 1e6, 6) AS mse_e6
    FROM r
"""


ORACLES["q_bounce_rate"] = """
    WITH e AS (SELECT CAST(user_id AS BIGINT) AS u, ts, event_id
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    l AS (SELECT u, ts,
                 lag(ts) OVER (PARTITION BY u ORDER BY ts, event_id)
                     AS prev
          FROM e),
    m AS (SELECT u, ts,
                 CASE WHEN prev IS NULL
                           OR epoch_us(ts) - epoch_us(prev) > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM l),
    s AS (SELECT u, sum(new_s) OVER (PARTITION BY u ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM m),
    z AS (SELECT u, sid, count(*) AS sz FROM s GROUP BY 1, 2)
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce,
           round(CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS bounce_rate
    FROM z
"""


ORACLES["q_lorenz"] = """
    WITH c AS (SELECT user_id, count(*) AS c FROM events
               WHERE user_id IS NOT NULL GROUP BY 1),
    r AS (SELECT c, row_number() OVER (ORDER BY c, user_id) AS i
          FROM c),
    cum AS (SELECT i, sum(c) OVER (ORDER BY i
                                   ROWS UNBOUNDED PRECEDING) AS cs
            FROM r),
    s AS (SELECT count(*) AS n, CAST(sum(c) AS HUGEINT) AS tot FROM c)
    SELECT CAST(g.k AS BIGINT) AS decile,
           CAST((g.k * s.n) // 10 AS BIGINT) AS n_users_cum,
           CAST(coalesce((SELECT cs FROM cum
                          WHERE i = (g.k * s.n) // 10), 0) AS BIGINT)
               AS n_events_cum,
           round(CAST(coalesce((SELECT cs FROM cum
                                WHERE i = (g.k * s.n) // 10), 0)
                      AS DOUBLE) / s.tot, 6) AS share
    FROM generate_series(1, 10) AS g(k), s
    ORDER BY 1
"""


ORACLES["q_ship_delay"] = """
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           CAST(min((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                    // 86400000000) AS BIGINT) AS min_days,
           CAST(max((epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                    // 86400000000) AS BIGINT) AS max_days,
           round(CAST(sum((epoch_us(l.l_shipdate)
                           - epoch_us(o.o_orderdate)) // 86400000000)
                      AS DOUBLE) / count(*), 6) AS avg_days
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1 ORDER BY 1
"""


ORACLES["q_key_discovery"] = """
    WITH s AS (SELECT count(*) AS n FROM events)
    SELECT * FROM (
      SELECT 'event_id' AS candidate,
             (SELECT CAST(n AS BIGINT) FROM s) AS n_rows,
             CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
             count(DISTINCT event_id) = (SELECT n FROM s) AS is_key
      FROM events
      UNION ALL
      SELECT 'user_id',
             (SELECT CAST(n AS BIGINT) FROM s),
             CAST(count(DISTINCT {'u': user_id}) AS BIGINT),
             count(DISTINCT {'u': user_id}) = (SELECT n FROM s)
      FROM events
      UNION ALL
      SELECT 'user_id,ts',
             (SELECT CAST(n AS BIGINT) FROM s),
             CAST(count(DISTINCT {'u': user_id, 't': ts}) AS BIGINT),
             count(DISTINCT {'u': user_id, 't': ts}) = (SELECT n FROM s)
      FROM events)
    ORDER BY candidate
"""


ORACLES["q_ooo_rate"] = """
    WITH e AS (SELECT CAST(user_id AS BIGINT) AS u, event_id, ts
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    l AS (SELECT u, ts,
                 lag(ts) OVER (PARTITION BY u ORDER BY event_id)
                     AS prev
          FROM e),
    p AS (SELECT count(*) AS n_pairs,
                 sum(CASE WHEN ts < prev THEN 1 ELSE 0 END) AS n_ooo
          FROM l WHERE prev IS NOT NULL)
    SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(n_ooo AS BIGINT) AS n_ooo,
           round(CAST(n_ooo AS DOUBLE) / n_pairs, 6) AS ooo_rate
    FROM p
"""


ORACLES["q_fim_split"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    s AS (SELECT doc_id, tk, len(tk) AS n,
                 len(tk) // 3 AS a, (2 * len(tk)) // 3 AS c
          FROM toks)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(a AS BIGINT) AS n_prefix,
           CAST(c - a AS BIGINT) AS n_middle,
           CAST(n - c AS BIGINT) AS n_suffix,
           md5(array_to_string(tk[1:a], ' ') || chr(1)
               || array_to_string(tk[c+1:n], ' ') || chr(1)
               || array_to_string(tk[a+1:c], ' ')) AS fim_md5
    FROM s ORDER BY doc_id
"""


ORACLES["q_hard_negatives"] = """
    WITH q AS (SELECT vec_id AS query_id,
                      CAST(embedding AS DOUBLE[]) AS qv,
                      CAST(label AS BIGINT) AS qlabel
               FROM embeddings WHERE vec_id < 10),
    p AS (SELECT q.query_id, q.qlabel,
                 CAST(e.vec_id AS BIGINT) AS neighbor_id,
                 CAST(e.label AS BIGINT) AS neg_label,
                 round(list_cosine_similarity(
                     q.qv, CAST(e.embedding AS DOUBLE[])), 4) AS score
          FROM q CROSS JOIN embeddings e
          WHERE CAST(e.label AS BIGINT) <> q.qlabel),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC,
                                                 neighbor_id) AS rk
          FROM p)
    SELECT CAST(query_id AS BIGINT) AS query_id, qlabel, neighbor_id,
           neg_label, score
    FROM r WHERE rk = 1 ORDER BY query_id
"""


ORACLES["q_lang_confusion"] = _lang_confusion_oracle_sql()


ORACLES["q_vocab_coverage"] = f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
    pc AS (SELECT unnest(tk) AS tok FROM toks),
    cnt AS (SELECT tok, count(*) AS n FROM pc GROUP BY 1),
    r AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok) AS i
          FROM cnt),
    cum AS (SELECT i, sum(n) OVER (ORDER BY i
                                   ROWS UNBOUNDED PRECEDING) AS cs
            FROM r),
    s AS (SELECT count(*) AS v, sum(n) AS tot FROM cnt),
    ks(k) AS (VALUES (1), (2), (4), (8), (16), (32), (64), (128))
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST((SELECT cs FROM cum WHERE i = ks.k) AS BIGINT)
               AS n_covered,
           round(CAST((SELECT cs FROM cum WHERE i = ks.k) AS DOUBLE)
                 / s.tot, 6) AS coverage
    FROM ks, s WHERE ks.k <= s.v ORDER BY 1
"""


ORACLES["q_conversion_lag"] = """
    WITH v AS (SELECT CAST(user_id AS BIGINT) AS u, min(ts) AS vts
               FROM events
               WHERE event_type = 'view' AND user_id IS NOT NULL
                 AND ts IS NOT NULL
               GROUP BY 1),
    p AS (SELECT v.u, min(e.ts) AS pts, min(v.vts) AS vts
          FROM v JOIN events e
            ON CAST(e.user_id AS BIGINT) = v.u
           AND e.event_type = 'purchase' AND e.ts >= v.vts
          GROUP BY 1)
    SELECT (epoch_us(pts) - epoch_us(vts)) // 86400000000 AS lag_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY 1 ORDER BY 1
"""


ORACLES["q_gopher_rules"] = f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
    f AS (SELECT len(tk) AS wc,
                 CASE WHEN len(tk) = 0 THEN 0.0
                      ELSE CAST(list_aggregate(
                               list_transform(tk, x -> length(x)),
                               'sum') AS DOUBLE) / len(tk) END AS mwl,
                 len(list_filter(tk, x -> x IN
                     ('the','a','and','of','to','in','is'))) AS stop,
                 len(list_filter(tk,
                     x -> regexp_matches(x, '^[a-zA-Z]+$'))) AS alpha
          FROM toks),
    r AS (SELECT (wc >= 40) AS r1,
                 (wc > 0 AND mwl >= 3.0 AND mwl <= 10.0) AS r2,
                 (stop >= 2) AS r3,
                 (wc > 0 AND alpha * 5 >= wc * 4) AS r4
          FROM f)
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_wordcount,
           CAST(sum(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_wordlen,
           CAST(sum(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_stopwords,
           CAST(sum(CASE WHEN r4 THEN 1 ELSE 0 END) AS BIGINT)
               AS pass_alpha,
           CAST(sum(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep
    FROM r
"""


ORACLES["q_budget_alloc"] = f"""
    WITH d AS (SELECT {_DOMAIN} AS domain FROM documents),
    c AS (SELECT domain, count(*) AS c FROM d GROUP BY 1),
    s AS (SELECT CAST(sum(c) AS HUGEINT) AS n FROM c),
    b AS (SELECT domain, c,
                 CAST((10000 * CAST(c AS HUGEINT)) // s.n AS BIGINT)
                     AS base,
                 CAST((10000 * CAST(c AS HUGEINT)) % s.n AS BIGINT)
                     AS rem
          FROM c, s),
    e AS (SELECT CAST(10000 - sum(base) AS BIGINT) AS extra FROM b),
    r AS (SELECT domain, c, base, rem,
                 row_number() OVER (ORDER BY rem DESC, domain) AS rk
          FROM b)
    SELECT domain, CAST(c AS BIGINT) AS n_docs,
           CAST(base + CASE WHEN rk <= (SELECT extra FROM e)
                            THEN 1 ELSE 0 END AS BIGINT) AS budget
    FROM r ORDER BY domain
"""


ORACLES["q_script_mix"] = """
    WITH t AS (SELECT lang, coalesce(text, '') AS s FROM documents)
    SELECT lang,
           CAST(sum(len(regexp_extract_all(s, '[A-Za-z]'))) AS BIGINT)
               AS n_latin,
           CAST(sum(len(regexp_extract_all(s, '[0-9]'))) AS BIGINT)
               AS n_digit,
           CAST(sum(len(regexp_extract_all(s, '[ \t\n\r\f\v]')))
                AS BIGINT) AS n_ws,
           CAST(sum(len(regexp_extract_all(s,
                '[\\x{4E00}-\\x{9FFF}]'))) AS BIGINT) AS n_cjk,
           CAST(sum(length(s)
                    - len(regexp_extract_all(s, '[A-Za-z]'))
                    - len(regexp_extract_all(s, '[0-9]'))
                    - len(regexp_extract_all(s, '[ \t\n\r\f\v]'))
                    - len(regexp_extract_all(s,
                          '[\\x{4E00}-\\x{9FFF}]'))) AS BIGINT)
               AS n_other
    FROM t GROUP BY 1 ORDER BY 1
"""


ORACLES["q_dup_flow"] = """
    WITH h AS (SELECT doc_id, source,
                      md5(substr(coalesce(text, ''), 1, 64)) AS h
               FROM documents),
    f AS (SELECT h, min(doc_id) AS keep FROM h GROUP BY 1),
    j AS (SELECT hf.source AS src_first, hd.source AS src_dup
          FROM f JOIN h hf ON hf.doc_id = f.keep
                 JOIN h hd ON hd.h = f.h AND hd.doc_id <> f.keep)
    SELECT src_first, src_dup, CAST(count(*) AS BIGINT) AS n
    FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES["q_wand_bounds"] = f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    pc AS (SELECT doc_id, unnest(tk) AS tok FROM toks),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM pc GROUP BY 1, 2),
    stats AS (SELECT tok, max(tf) AS max_tf, count(*) AS df
              FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS c FROM documents)
    SELECT tok, CAST(max_tf AS BIGINT) AS max_tf,
           CAST(df AS BIGINT) AS df,
           round(max_tf * ln(CAST(c AS DOUBLE) / df), 6) AS bound
    FROM stats, n
    ORDER BY round(max_tf * ln(CAST(c AS DOUBLE) / df), 6) DESC, tok
    LIMIT 20
"""


ORACLES["q_rare_collapse"] = f"""
    WITH toks AS (SELECT {_TOKS} AS tk FROM documents),
    pc AS (SELECT unnest(tk) AS tok FROM toks),
    cnt AS (SELECT tok, count(*) AS n FROM pc GROUP BY 1),
    s AS (SELECT sum(n) AS tot FROM cnt),
    r AS (SELECT CASE WHEN n * 100 < s.tot THEN '__rare__'
                      ELSE tok END AS category, n
          FROM cnt, s)
    SELECT category, CAST(sum(n) AS BIGINT) AS n
    FROM r GROUP BY 1 ORDER BY 1
"""


ORACLES["q_case_stats"] = f"""
    WITH toks AS (SELECT source, {_TOKS} AS tk FROM documents),
    pc AS (SELECT source, unnest(tk) AS tok FROM toks),
    c AS (SELECT source,
                 CASE WHEN regexp_matches(tok, '^[a-z]+$') THEN 0
                      WHEN regexp_matches(tok, '^[A-Z]{{2,}}$') THEN 1
                      WHEN regexp_matches(tok, '^[A-Z][a-z]*$') THEN 2
                      ELSE 3 END AS k
          FROM pc)
    SELECT source,
           CAST(sum(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lower,
           CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_upper,
           CAST(sum(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_title,
           CAST(sum(CASE WHEN k = 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_other
    FROM c GROUP BY 1 ORDER BY 1
"""


ORACLES["q_profit_by_brand"] = """
    WITH j AS (SELECT n.n_name, p.p_brand,
                      CAST(round(l.l_extendedprice * 100) AS HUGEINT)
                      * (100 - CAST(round(l.l_discount * 100)
                                    AS HUGEINT)) AS rev_c
               FROM lineitem l
               JOIN part p ON p.p_partkey = l.l_partkey
               JOIN supplier s ON s.s_suppkey = l.l_suppkey
               JOIN nation n ON n.n_nationkey = s.s_nationkey)
    SELECT n_name, p_brand, CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(rev_c) AS DOUBLE) / 10000.0, 2) AS revenue
    FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES["q_dow_profile"] = """
    WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
                      (epoch_us(ts) % 86400000000) // 3600000000 AS hod
               FROM events WHERE ts IS NOT NULL),
    c AS (SELECT (day + 4) % 7 AS dow, hod, count(*) AS n
          FROM e GROUP BY 1, 2),
    dd AS (SELECT (day + 4) % 7 AS dow, count(DISTINCT day) AS n_days
           FROM e GROUP BY 1)
    SELECT CAST(c.dow AS BIGINT) AS dow, CAST(c.hod AS BIGINT) AS hod,
           CAST(c.n AS BIGINT) AS n,
           CAST(dd.n_days AS BIGINT) AS n_days,
           round(CAST(c.n AS DOUBLE) / dd.n_days, 6) AS avg_events
    FROM c JOIN dd ON dd.dow = c.dow
    ORDER BY 1, 2
"""


ORACLES["q_rolling_median"] = """
    WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                      count(*) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1)
    SELECT CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n,
           CAST(quantile_disc(n, 0.5) OVER (
               ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS BIGINT) AS med_7d
    FROM d ORDER BY day
"""


ORACLES["q_arrival_rate"] = """
    WITH t AS (SELECT event_type, count(*) AS n,
                      epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
               FROM events WHERE ts IS NOT NULL GROUP BY 1)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(span_us AS BIGINT) AS span_us,
           CAST(span_us // greatest(n - 1, 1) AS BIGINT)
               AS mean_gap_us,
           CASE WHEN span_us > 0
                THEN round(3600000000.0 * (n - 1) / span_us, 6)
                ELSE 0.0 END AS per_hour
    FROM t ORDER BY 1
"""


ORACLES["q_ab_srm"] = """
    WITH u AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u
               FROM events WHERE user_id IS NOT NULL),
    c AS (SELECT sum(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
                 sum(CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END) AS n_b
          FROM u)
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(pow(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                 + pow(n_b - (n_a + n_b) / 2.0, 2)
                   / ((n_a + n_b) / 2.0), 6) AS chi2,
           round(pow(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                 + pow(n_b - (n_a + n_b) / 2.0, 2)
                   / ((n_a + n_b) / 2.0), 6) > 3.841 AS srm
    FROM c
"""


ORACLES["q_emb_outliers"] = """
    WITH x AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                      CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v,
                      CAST(i AS BIGINT) AS d
               FROM embeddings,
                    unnest(range(1, len(embedding) + 1)) AS t(i)),
    m AS (SELECT label, d, avg(v) AS c FROM x GROUP BY 1, 2),
    dist AS (SELECT x.vec_id, x.label,
                    sum((x.v - m.c) * (x.v - m.c)) AS d2
             FROM x JOIN m ON m.label = x.label AND m.d = x.d
             GROUP BY 1, 2),
    s AS (SELECT label, count(*) AS n,
                 avg(d2) AS mean_d2
          FROM dist GROUP BY 1)
    SELECT s.label, CAST(s.n AS BIGINT) AS n,
           round(s.mean_d2, 6) AS mean_d2,
           CAST(sum(CASE WHEN round(dist.d2, 6)
                              > round(4.0 * s.mean_d2, 6)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_out
    FROM s JOIN dist ON dist.label = s.label
    GROUP BY 1, 2, 3 ORDER BY 1
"""


ORACLES["q_dataset_card"] = f"""
    WITH toks AS (SELECT text, lang, source, {_TOKS} AS tk
                  FROM documents),
    s AS (SELECT count(*) AS n_docs,
                 CAST(sum(len(tk)) AS BIGINT) AS n_tokens,
                 CAST(sum(length(coalesce(text, ''))) AS BIGINT)
                     AS n_chars,
                 count(DISTINCT lang) AS n_langs,
                 count(DISTINCT source) AS n_sources,
                 count(DISTINCT md5(substr(coalesce(text, ''), 1, 64)))
                     AS n_clusters
          FROM toks),
    v AS (SELECT count(DISTINCT tok) AS vocab
          FROM (SELECT unnest(tk) AS tok FROM toks))
    SELECT CAST(s.n_docs AS BIGINT) AS n_docs, s.n_tokens,
           CAST(v.vocab AS BIGINT) AS vocab,
           CAST(s.n_langs AS BIGINT) AS n_langs,
           CAST(s.n_sources AS BIGINT) AS n_sources,
           round(CAST(s.n_docs - s.n_clusters AS DOUBLE) / s.n_docs, 6)
               AS prefix_dup_share,
           round(CAST(s.n_chars AS DOUBLE) / s.n_docs, 6)
               AS mean_doc_chars
    FROM s, v
"""


ORACLES["q_active_days"] = """
    WITH p AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
                      epoch_us(ts) // 86400000000 AS day
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    c AS (SELECT u, count(*) AS days FROM p GROUP BY 1)
    SELECT CAST(days AS BIGINT) AS days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM c GROUP BY 1 ORDER BY 1
"""


ORACLES["q_hhi"] = """
    WITH r AS (SELECT s.s_nationkey, l.l_suppkey,
                      CAST(sum(CAST(round(l.l_extendedprice * 100)
                                    AS HUGEINT)) AS HUGEINT) AS cents
               FROM lineitem l
               JOIN supplier s ON s.s_suppkey = l.l_suppkey
               GROUP BY 1, 2),
    a AS (SELECT s_nationkey, count(*) AS n_suppliers,
                 sum(cents * cents) AS sq,
                 sum(cents) AS tot
          FROM r GROUP BY 1)
    SELECT n.n_name, CAST(a.n_suppliers AS BIGINT) AS n_suppliers,
           round(CAST(a.sq AS DOUBLE)
                 / (CAST(a.tot AS DOUBLE) * CAST(a.tot AS DOUBLE)), 6)
               AS hhi
    FROM a JOIN nation n ON n.n_nationkey = a.s_nationkey
    WHERE a.tot > 0
    ORDER BY 1
"""


ORACLES["q_order_sizes"] = """
    WITH c AS (SELECT l_orderkey, count(*) AS c
               FROM lineitem GROUP BY 1)
    SELECT CAST(c AS BIGINT) AS basket_size,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM c GROUP BY 1 ORDER BY 1
"""


ORACLES["q_user_lifespan"] = """
    WITH p AS (SELECT CAST(user_id AS BIGINT) AS u,
                      min(epoch_us(ts) // 86400000000) AS mn,
                      max(epoch_us(ts) // 86400000000) AS mx
               FROM events
               WHERE user_id IS NOT NULL AND ts IS NOT NULL
               GROUP BY 1)
    SELECT CAST(mx - mn AS BIGINT) AS lifespan_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM p GROUP BY 1 ORDER BY 1
"""
