"""Query registry: one callable per implemented operator/pipeline.

Each function takes ``sf_dir`` and returns a Dataset / DataFrame /
pyarrow Table.  Every aggregate column is explicitly named to match the
DuckDB oracle in ``bb_ocr_ray.pipelines.oracles`` (the driver's
correctness gate hashes values after sorting columns by name).

Determinism conventions used throughout:
  - float aggregates are rounded to a fixed decimal count on BOTH
    sides (tiny summation-order drift is absorbed by rounding);
  - ratio-shaped outputs are emitted as integer (numerator,
    denominator) pairs instead of floats wherever possible;
  - every top-k has a total tiebreak order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from bb_ocr_ray.sources.tables import read_parquet_clean as _read_parquet
from ray.data.aggregate import Count, Max, Min, Sum

from bb_ocr_ray.stages.coarse import coarse_agg

from bb_ocr_ray.functions.hashing import md5_hex
from bb_ocr_ray.functions.textstats import (
    n_tokens_series,
    stop_token_counts,
)


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _round_sql(x, decimals: int):
    """Round half AWAY from zero — SQL round() semantics.  pandas/numpy
    .round() is banker's (half to even), which diverges from the DuckDB
    oracles on exactly-representable midpoints (e.g. 817/32 at 4 dp)."""
    f = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def _grouped_per_key(ds, key: str, fn, coarse_buckets: int | None = None):
    """See stages/coarse.grouped_per_key — natural keys (user_id, url,
    content hash) are row-cardinality, and Ray grouped ops pay
    per-GROUP overhead, so no query hands Ray a high-cardinality
    grouping key directly."""
    from bb_ocr_ray.stages.coarse import grouped_per_key

    return grouped_per_key(ds, key, fn, coarse_buckets)


# ---------------------------------------------------------------------------
# Relational: aggregation with partial pre-agg (TPC-H Q1 shape)
# ---------------------------------------------------------------------------
def q1_pricing_summary(sf_dir: str):
    """Filter -> partial per-batch agg (combiner) -> small final groupby.

    The partial agg inside map_batches collapses each ~64k-row batch to
    ≤ 6 rows (|returnflag|×|linestatus|), so the shuffle moves a few
    hundred partial rows instead of every lineitem row.

    Money sums are INTEGER-CENT exact: prices/discounts are 2-dp
    decimals, so ext_cents = round(price*100) and disc_pct =
    round(disc*100) are integers and the revenue sum is an int64 fold
    (unit 1e-4 dollars) that is order-independent — round-2 on a
    float sum stopped absorbing summation-order drift at sf0.1
    (600k rows; caught by the full sf0.1 gate), while integer sums
    are hash-identical to the oracle at ANY scale (int64 headroom
    ~1e18: good to ~sf1000)."""
    ds = _read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["l_shipdate"] <= pd.Timestamp("1998-09-02")]
        if batch.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype=d) for c, d in
                 [("l_returnflag", "object"), ("l_linestatus", "object"),
                  ("sum_qty", "float64"), ("base_cents", "int64"),
                  ("disc_units", "int64"), ("count_order", "int64")]}
            )
        ext_c = _round_sql(batch["l_extendedprice"] * 100.0,
                           0).astype("int64")
        disc_pct = _round_sql(batch["l_discount"] * 100.0,
                              0).astype("int64")
        batch = batch.assign(base_cents=ext_c,
                             disc_units=ext_c * (100 - disc_pct))
        g = batch.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            base_cents=("base_cents", "sum"),
            disc_units=("disc_units", "sum"),
            count_order=("l_quantity", "size"),
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=65536)
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("base_cents", alias_name="base_cents"),
        Sum("disc_units", alias_name="disc_units"),
        Sum("count_order", alias_name="count_order"),
    ).to_pandas()
    out["avg_qty"] = _round_sql(out["sum_qty"] / out["count_order"], 4)
    out["sum_qty"] = _round_sql(out["sum_qty"], 2)
    out["sum_base_price"] = _round_sql(
        out["base_cents"].astype("int64") / 100.0, 2)
    out["sum_disc_price"] = _round_sql(
        out["disc_units"].astype("int64") / 10000.0, 2)
    out["count_order"] = out["count_order"].astype("int64")
    return out.drop(columns=["base_cents", "disc_units"])


# ---------------------------------------------------------------------------
# Relational: filter + projection (read-level column pruning)
# ---------------------------------------------------------------------------
def q_filter_project(sf_dir: str):
    import pyarrow.compute as pc

    ds = _read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
    )
    return ds.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0)),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Relational: per-group top-k
# ---------------------------------------------------------------------------
def q_topk_per_group(sf_dir: str):
    ds = _read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
    )

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        # combiner: per-batch top-3 per group bounds shuffle input
        return (
            batch.sort_values(["o_orderpriority", "o_totalprice", "o_orderkey"],
                              ascending=[True, False, True], kind="mergesort")
            .groupby("o_orderpriority", as_index=False)
            .head(3)
        )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["o_totalprice", "o_orderkey"],
                              ascending=[False, True], kind="mergesort").head(3)
        g = g.assign(rank=pd.Series(range(1, len(g) + 1), dtype="int64").values)
        return g

    return (
        ds.map_batches(local_topk, batch_format="pandas")
        .groupby("o_orderpriority")
        .map_groups(final_topk, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Relational: distinct / count-distinct
# ---------------------------------------------------------------------------
def q_distinct(sf_dir: str):
    ds = _read_parquet(_t(sf_dir, "customer"),
                         columns=["c_mktsegment", "c_nationkey"])
    return ds.groupby(["c_mktsegment", "c_nationkey"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def q_count_distinct(sf_dir: str):
    ds = _read_parquet(_t(sf_dir, "customer"),
                         columns=["c_mktsegment", "c_nationkey"])
    # two-level: distinct pairs (with per-batch local distinct combiner),
    # then count per segment; plus a straight row count per segment
    local = ds.map_batches(
        lambda b: b.drop_duplicates(), batch_format="pandas"
    )
    pairs = local.groupby(["c_mktsegment", "c_nationkey"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
    n_nations = pairs.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_nations")
    ).to_pandas()
    n_customers = ds.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_customers")
    ).to_pandas()
    out = n_nations.merge(n_customers, on="c_mktsegment")
    out["n_nations"] = out["n_nations"].astype("int64")
    out["n_customers"] = out["n_customers"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------
def q_hash_join(sf_dir: str):
    """Large-large hash join (Dataset.join): lineitem ⋈ orders on orderkey,
    revenue per orderstatus."""
    from bb_ocr_ray.stages.joins import hash_join

    li = _read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        # pre-aggregate per order key INSIDE the map (combiner before
        # the join shuffle): ~4 lineitems/order collapse to one row, so
        # the join moves a quarter of the rows; revenue is additive
        # through the 1:1 orders join, n carries the lineitem count.
        # Measured at sf0.1/32cpus: +0.3 s local (pandas groupby cost
        # exceeds the saved shuffle at this size) — kept because at
        # 100 TB the shuffle bytes, not the per-batch CPU, dominate
        # revenue in integer 1e-4-dollar units: ext_cents*(100-disc_pct)
        # — an order-independent int64 fold (float sums drift past
        # round-2 at sf0.1; see q1)
        lambda b: pd.DataFrame(
            {"o_orderkey": b["l_orderkey"],
             "revenue_u": _round_sql(b["l_extendedprice"] * 100.0, 0)
             .astype("int64")
             * (100 - _round_sql(b["l_discount"] * 100.0, 0)
                .astype("int64")),
             "n": np.ones(len(b), dtype="int64")}
        ).groupby("o_orderkey", as_index=False).sum(),
        batch_format="pandas",
    )
    orders = _read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderstatus"])
    joined = hash_join(li, orders, on="o_orderkey")
    # partial agg per joined block — the final groupby shuffles a few
    # hundred partial rows instead of re-shuffling every joined row
    partials = joined.map_batches(
        lambda b: b.groupby("o_orderstatus", as_index=False).agg(
            revenue_u=("revenue_u", "sum"), n_lineitems=("n", "sum")),
        batch_format="pandas",
    )
    out = partials.groupby("o_orderstatus").aggregate(
        Sum("revenue_u", alias_name="revenue_u"),
        Sum("n_lineitems", alias_name="n_lineitems"),
    ).to_pandas()
    out["revenue"] = _round_sql(
        out["revenue_u"].astype("int64") / 10000.0, 2)
    out["n_lineitems"] = out["n_lineitems"].astype("int64")
    return out.drop(columns=["revenue_u"])


def q_broadcast_join_nation(sf_dir: str):
    """Broadcast join: customer ⋈ nation ⋈ region (small dims via ray.put),
    customer count + total acctbal per region name."""
    from bb_ocr_ray.stages.joins import broadcast_join

    nation = pd.read_parquet(_t(sf_dir, "nation"),
                             columns=["n_nationkey", "n_regionkey"])
    region = pd.read_parquet(_t(sf_dir, "region"),
                             columns=["r_regionkey", "r_name"])
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    dim = dim[["n_nationkey", "r_name"]].rename(columns={"n_nationkey": "c_nationkey"})

    cust = _read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey", "c_acctbal"])
    joined = broadcast_join(cust, dim, on="c_nationkey")
    joined = joined.map_batches(
        # integer cents (see q1: float sums drift past round-2 at sf0.1)
        lambda b: b.assign(acct_c=_round_sql(
            b["c_acctbal"] * 100.0, 0).astype("int64")),
        batch_format="pandas")
    out = joined.groupby("r_name").aggregate(
        Count(alias_name="n_customers"),
        Sum("acct_c", alias_name="total_acctbal"),
    ).to_pandas()
    out["total_acctbal"] = _round_sql(
        out["total_acctbal"].astype("int64") / 100.0, 2)
    out["n_customers"] = out["n_customers"].astype("int64")
    return out


def q5_revenue_by_nation(sf_dir: str):
    """Multi-join: lineitem ⋈ supplier ⋈ orders(hash) ⋈ customer ⋈
    nation(bcast), local-supplier condition (c_nationkey ==
    s_nationkey), revenue per nation name.  The scale-proportional
    sides (supplier, customer) go through the size-gated auto_join —
    broadcast while their parquet metadata says driver-sized, bucketed
    hash join beyond that (VERDICT r2 item 3: a driver pd.read_parquet
    broadcast of a side that grows with sf blows the driver at 100x).
    nation is constant-size and stays a driver broadcast."""
    from bb_ocr_ray.stages.joins import auto_join, broadcast_join, hash_join

    supp = _read_parquet(_t(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"]
                         ).rename_columns({"s_suppkey": "l_suppkey"})
    li = _read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li = auto_join(li, supp, on="l_suppkey")
    li = li.map_batches(
        # integer 1e-4-dollar revenue units (order-independent fold;
        # float sums drift past round-2 at sf0.1 — see q1)
        lambda b: pd.DataFrame(
            {"o_orderkey": b["l_orderkey"],
             "s_nationkey": b["s_nationkey"],
             "revenue_u": _round_sql(b["l_extendedprice"] * 100.0, 0)
             .astype("int64")
             * (100 - _round_sql(b["l_discount"] * 100.0, 0)
                .astype("int64"))}
        ),
        batch_format="pandas",
    )
    orders = _read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey"])
    # deliberately a HARD hash_join, not the size-gated auto_join:
    # o_orderkey is the probe side's own key (every lineitem row
    # matches), so a broadcast buys nothing and the per-batch pandas
    # merge against a row-cardinality broadcast frame dominates —
    # measured 2.3 s -> 10.8 s at sf0.1 when routed through the gate
    joined = hash_join(li, orders, on="o_orderkey")

    cust = _read_parquet(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey"]
                         ).rename_columns({"c_custkey": "o_custkey"})
    joined = auto_join(joined, cust, on="o_custkey")
    joined = joined.map_batches(
        lambda b: b[b["s_nationkey"] == b["c_nationkey"]],
        batch_format="pandas",
    )
    nation = pd.read_parquet(_t(sf_dir, "nation"),
                             columns=["n_nationkey", "n_name"])
    nation = nation.rename(columns={"n_nationkey": "s_nationkey"})
    joined = broadcast_join(joined, nation, on="s_nationkey")
    partials = joined.map_batches(
        lambda b: b.groupby("n_name", as_index=False).agg(
            revenue_u=("revenue_u", "sum"),
            n_lineitems=("revenue_u", "size")),
        batch_format="pandas",
    )
    out = partials.groupby("n_name").aggregate(
        Sum("revenue_u", alias_name="revenue_u"),
        Sum("n_lineitems", alias_name="n_lineitems"),
    ).to_pandas()
    out["revenue"] = _round_sql(
        out["revenue_u"].astype("int64") / 10000.0, 2)
    out["n_lineitems"] = out["n_lineitems"].astype("int64")
    return out.drop(columns=["revenue_u"])


def q_anti_join(sf_dir: str):
    """Customers with no high-value (>300k) order — the resume
    primitive (SURVEY.md J6), through the size-gated auto_anti: the
    orders key side grows with sf, so it is never .unique()'d to the
    driver unless its metadata estimate proves it driver-sized
    (VERDICT r2 item 3); beyond the gate it hash-partitions."""
    import pyarrow.compute as pc

    from bb_ocr_ray.stages.joins import auto_anti

    order_keys = (
        _read_parquet(_t(sf_dir, "orders"),
                        columns=["o_custkey", "o_totalprice"])
        .map_batches(
            lambda t: t.filter(pc.greater(t["o_totalprice"], 300000.0)),
            batch_format="pyarrow",
        )
        .rename_columns({"o_custkey": "c_custkey"})
        .select_columns(["c_custkey"])
    )
    cust = _read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name"])
    return auto_anti(cust, order_keys, "c_custkey")


def q_semi_join(sf_dir: str):
    """Suppliers that appear in lineitem — size-gated auto_semi (the
    lineitem key side is scale-proportional: broadcast only while the
    metadata estimate allows, else exact hash-partitioned semi)."""
    from bb_ocr_ray.stages.joins import auto_semi

    supp_keys = (
        _read_parquet(_t(sf_dir, "lineitem"), columns=["l_suppkey"])
        .rename_columns({"l_suppkey": "s_suppkey"})
    )
    supp = _read_parquet(_t(sf_dir, "supplier"),
                           columns=["s_suppkey", "s_name"])
    return auto_semi(supp, supp_keys, "s_suppkey")


def q_union(sf_dir: str):
    """ds.union of two disjoint filtered projections of orders."""
    import pyarrow.compute as pc

    ds = _read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice"])
    hi = ds.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 450000.0)),
        batch_format="pyarrow",
    )
    lo = ds.map_batches(
        lambda t: t.filter(pc.less(t["o_totalprice"], 1000.0)),
        batch_format="pyarrow",
    )
    return hi.union(lo)


# ---------------------------------------------------------------------------
# Events: windowed aggregate + sessionization + JSON parse
# ---------------------------------------------------------------------------
def q_events_hourly(sf_dir: str):
    """Tumbling 1h window per event_type (event-time, no watermark
    semantics needed for batch: groupby on truncated ts)."""
    ds = _read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # hour as epoch seconds (int64): avoids ns-vs-us timestamp
        # precision drift between engines in the value-hash compare
        # (total_seconds is unit-independent; .astype(int64) is not)
        hour = (
            (batch["ts"].dt.floor("h") - pd.Timestamp("1970-01-01"))
            .dt.total_seconds()
            .astype("int64")
        )
        batch = batch.assign(hour_epoch=hour)
        return batch.groupby(["event_type", "hour_epoch"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )

    # hour buckets grow with the corpus time span (x event types):
    # coarse_agg keeps the Ray group count bounded (per-group tax)
    out = coarse_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "hour_epoch"],
        {"n_events": ("n_events", "sum"),
         "sum_value": ("sum_value", "sum")},
    ).to_pandas()
    out["sum_value"] = _round_sql(out["sum_value"].fillna(0.0), 4)
    out["n_events"] = out["n_events"].astype("int64")
    return out


def q_sessionize(sf_dir: str):
    """Session windows per user (gap > 1800 s starts a new session):
    groupby(user).map_groups over ts-sorted events — the documented
    partitioning assumption is one user fits one group.  NULL user_id
    rows are dropped (repo convention for user aggregates; oracle
    mirrors with WHERE user_id IS NOT NULL)."""
    ds = _read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    ds = ds.map_batches(lambda b: b.dropna(subset=["user_id"]),
                        batch_format="pandas")

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts", kind="mergesort")
        gaps = g["ts"].diff().dt.total_seconds()
        n_sessions = int((gaps > 1800).sum()) + 1
        return pd.DataFrame(
            # int() first: the column arrives float64 when any block of
            # the raw table held a NULL user
            {"user_id": pd.Series([int(g["user_id"].iloc[0])], dtype="int64"),
             "n_sessions": pd.Series([n_sessions], dtype="int64"),
             "n_events": pd.Series([len(g)], dtype="int64")}
        )

    return _grouped_per_key(ds, "user_id", sessions)


def q_json_extract(sf_dir: str):
    """Robust JSON field extraction from the events props column (M10
    analog: LLM-response JSON repair) — vectorized regex extract, sum
    per event_type; unparseable rows count as errors, never raised."""
    ds = _read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "props"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        import re as _re

        k = batch["props"].str.extract(r'"k":\s*(-?\d+)', expand=False,
                                       flags=_re.ASCII)
        # parse with Python int (exact, arbitrary precision): float64
        # rounds literals in (2^53, 2^63) that TRY_CAST parses exactly;
        # the int64 bound is applied exactly too (TRY_CAST -> NULL when
        # outside [-2^63, 2^63-1])
        lo_i, hi_i = -(2**63), 2**63 - 1
        vals = np.zeros(len(k), dtype="int64")
        parsed = np.zeros(len(k), dtype="int64")
        for i, s in enumerate(k.to_numpy()):
            if isinstance(s, str):
                v = int(s)
                if lo_i <= v <= hi_i:
                    vals[i] = v
                    parsed[i] = 1
        return pd.DataFrame(
            {"event_type": batch["event_type"].to_numpy(),
             "k": vals,
             "parsed": parsed}
        ).groupby("event_type", as_index=False).agg(
            sum_k=("k", "sum"), n_parsed=("parsed", "sum"),
            n_rows=("parsed", "size"),
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("sum_k", alias_name="sum_k"),
                   Sum("n_parsed", alias_name="n_parsed"),
                   Sum("n_rows", alias_name="n_rows"))
        .to_pandas()
    )
    for c in ("sum_k", "n_parsed", "n_rows"):
        out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Documents: text analysis
# ---------------------------------------------------------------------------
def q_doc_stats(sf_dir: str):
    ds = _read_parquet(_t(sf_dir, "documents"),
                         columns=["lang", "text", "n_chars"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(text=batch["text"].fillna(""))
        batch = batch.assign(n_tokens=n_tokens_series(batch["text"]))
        return batch.groupby("lang", as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"),
            sum_tokens=("n_tokens", "sum"), max_chars=("n_chars", "max"),
            min_chars=("n_chars", "min"),
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_chars", alias_name="sum_chars"),
                   Sum("sum_tokens", alias_name="sum_tokens"),
                   Max("max_chars", alias_name="max_chars"),
                   Min("min_chars", alias_name="min_chars"))
        .to_pandas()
    )
    for c in ("n_docs", "sum_chars", "sum_tokens", "max_chars", "min_chars"):
        out[c] = out[c].astype("int64")
    return out


def q_doc_quality(sf_dir: str):
    """Quality features aggregated per source: integer numerators and
    denominators (no float ratios — exact cross-engine equality)."""
    ds = _read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"].fillna("")
        return pd.DataFrame(
            {"source": batch["source"],
             "n_tokens": n_tokens_series(t).astype("int64"),
             "n_stop_tokens": stop_token_counts(t).astype("int64"),
             # re.ASCII: RE2's \w/\s are ASCII-only; unicode-aware
             # counting would diverge on non-ASCII corpora
             "n_punct": t.str.count(r"[^\w\s]", flags=__import__("re").ASCII)
                        .astype("int64")}
        ).groupby("source", as_index=False).agg(
            n_docs=("n_tokens", "size"), sum_tokens=("n_tokens", "sum"),
            sum_stop_tokens=("n_stop_tokens", "sum"),
            sum_punct=("n_punct", "sum"),
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_tokens", alias_name="sum_tokens"),
                   Sum("sum_stop_tokens", alias_name="sum_stop_tokens"),
                   Sum("sum_punct", alias_name="sum_punct"))
        .to_pandas()
    )
    for c in out.columns:
        if c != "source":
            out[c] = out[c].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Documents: dedup family
# ---------------------------------------------------------------------------
def q_dedup_exact(sf_dir: str):
    """Exact dedup by content hash: keeper = min doc_id per md5(text)."""
    ds = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def hashed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"content_md5": [md5_hex(t or "") for t in batch["text"]],
             "doc_id": batch["doc_id"]}
        )

    # content hashes are row-cardinality: coarse_agg, never a direct
    # Ray groupby (per-group tax on every distinct document)
    out = coarse_agg(
        ds.map_batches(hashed, batch_format="pandas"),
        ["content_md5"],
        {"keep_doc_id": ("doc_id", "min"),
         "n_copies": ("doc_id", "size")},
    ).to_pandas()
    out["keep_doc_id"] = out["keep_doc_id"].astype("int64")
    out["n_copies"] = out["n_copies"].astype("int64")
    return out


def q_jaccard_pairs(sf_dir: str):
    """EXACT all-pairs distinct-token-set Jaccard join at J ≥ 0.5
    (integer output id_a, id_b, inter, uni) — prefix-filtered, not
    brute force: token (df, token)-order prefixes generate a provably
    complete candidate set, the distributed Bloom-pruned hash-join
    verify scores them, and the result is identical to the all-pairs
    SQL oracle (stages/dedup.set_similarity_join; VERDICT r2 item 6
    retired the known-quadratic driver loop this replaced).

    The algorithm is output-sensitive (candidates ≈ qualifying pairs;
    test_set_similarity_output_sensitive pins that), but on THIS
    synthetic corpus ~36% of ALL pairs qualify (90,752 of 124,750 at
    sf0.001) — the result set itself is quadratic, so the full sf0.1
    sweep keeps excluding this query: enumerating a ~450M-pair answer
    is the task's cost, not the algorithm's."""
    from bb_ocr_ray.stages.dedup import set_similarity_join

    docs = _read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"])
    return set_similarity_join(docs, min_jaccard=0.5)


def q_minhash_candidates(sf_dir: str):
    """MinHash+LSH near-dup candidate pairs.  Oracle-checked: the
    DuckDB mirror recomputes the full sketch from the engine's seeded
    permutation constants (md5_number_upper == stable_u64, uint64-wrap
    emulated in HUGEINT, bucket cap 64 + chain tail via row_number) —
    see oracles._minhash_cte."""
    from bb_ocr_ray.stages.dedup import minhash_candidates

    docs = _read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"])
    return minhash_candidates(docs)


def q_simhash_near_dups(sf_dir: str):
    """SimHash banded near-dup pairs with hamming distance.
    Oracle-checked: bit votes, 16-bit band blocking, cap+chain and the
    bit_count(xor) verify are all recomputed in SQL."""
    from bb_ocr_ray.stages.dedup import simhash_near_dups

    docs = _read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"])
    return simhash_near_dups(docs)


def q_langid(sf_dir: str):
    """Language-ID heuristic agreement with the table's lang column.
    Oracle-checked: every detect_lang step (codepoint slice, CJK-share
    float compare, ASCII lowering, non-overlapping trigram counts,
    earliest-wins argmax) is mirrored in SQL generated from the same
    profile tables (oracles._langid_oracle_sql)."""
    from bb_ocr_ray.stages.text_stats import add_lang_pred

    ds = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "lang", "text"])
    scored = ds.map_batches(add_lang_pred, batch_format="pandas")
    out = (
        scored.map_batches(
            lambda b: pd.DataFrame(
                {"lang": b["lang"],
                 "agree": (b["lang"] == b["lang_pred"]).astype("int64"),
                 "one": np.ones(len(b), dtype="int64")}
            ),
            batch_format="pandas",
        )
        .groupby("lang")
        .aggregate(Sum("agree", alias_name="n_agree"),
                   Sum("one", alias_name="n_docs"))
    )
    return out


def q_fingerprint(sf_dir: str):
    """Rolling-hash + md5 document fingerprints.  Oracle-checked: the
    codepoint Karp-Rabin fold is mirrored exactly in DuckDB via
    list_reduce over ord(substr(...)) in HUGEINT arithmetic, and
    content_md5 via DuckDB's md5()."""
    from bb_ocr_ray.stages.text_stats import add_fingerprints

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(add_fingerprints, batch_format="pandas").select_columns(
        ["doc_id", "fingerprint", "content_md5"]
    )


# ---------------------------------------------------------------------------
# Embeddings: similarity search
# ---------------------------------------------------------------------------
def q_ann_topk(sf_dir: str):
    """Exact cosine top-5 for query vectors vec_id < 10 (integer-only
    output: query_id, rank, neighbor_id)."""
    from bb_ocr_ray.stages.ann import ann_topk

    vecs = _read_parquet(_t(sf_dir, "embeddings"),
                           columns=["vec_id", "embedding"])
    return ann_topk(vecs, query_ids=list(range(10)), k=5)


def q_embedding_near_dups(sf_dir: str):
    """Embedding near-dup pairs via multi-table hyperplane LSH, probed
    with planted near-duplicate twins: each vec_id < 25 gets a twin
    (vec_id + 1_000_000, every coordinate + 0.01 — cosine ~0.997 to
    its source, SQL-expressible via list_transform), and the output is
    the pairs that involve a twin.  The restriction keeps the
    brute-force DuckDB oracle at O(|twins| x n); the planted pairs'
    huge margin (next-highest corpus cosine ~0.49 vs threshold 0.9)
    plus deterministic seeded planes make LSH recall exactly 1 on this
    probe set, so the oracle is a true value-hash gate."""
    from bb_ocr_ray.stages.ann import embedding_near_dups

    vecs = _read_parquet(_t(sf_dir, "embeddings"),
                           columns=["vec_id", "embedding"])

    def plant(b: pd.DataFrame) -> pd.DataFrame:
        t = b[b["vec_id"] < 25]
        return pd.DataFrame(
            {"vec_id": (t["vec_id"] + 1_000_000).astype("int64"),
             "embedding": [
                 (np.asarray(v, dtype=np.float64) + 0.01).astype(np.float32)
                 for v in t["embedding"]]}
        )

    twins = vecs.map_batches(plant, batch_format="pandas")
    pairs = embedding_near_dups(vecs.union(twins), threshold=0.9)
    return pairs.map_batches(
        lambda b: b[(b["id_a"] >= 1_000_000) | (b["id_b"] >= 1_000_000)],
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Flagship extraction + domain aggregation (full web pipeline)
# ---------------------------------------------------------------------------
def q_extract_pages(sf_dir: str):
    """Full pipeline: synthesize pages from documents -> extract ->
    (url, text, status, n_blocks_kept).  The oracle recomputes the
    expected text directly from documents (template inversion) — an
    end-to-end byte-identity check through SQL."""
    from bb_ocr_ray.pipelines.extract_pipeline import extract_from_sf_dir

    return extract_from_sf_dir(sf_dir).select_columns(
        ["url", "text", "status", "n_blocks_kept"]
    )


def q_domain_stats(sf_dir: str):
    """Salted per-domain aggregation over the extraction output."""
    from bb_ocr_ray.pipelines.extract_pipeline import extract_from_sf_dir
    from bb_ocr_ray.stages.domain_agg import domain_stats

    stats = domain_stats(extract_from_sf_dir(sf_dir)).to_pandas()
    out = stats[["domain", "n_docs", "extracted_chars", "n_errors"]].copy()
    for c in ("n_docs", "extracted_chars", "n_errors"):
        out[c] = out[c].astype("int64")
    return out


def q_dedup_pages(sf_dir: str):
    """Per-url dedup over pages (groupby + deterministic first row).
    The synthetic corpus has unique urls, so output rows == input rows —
    still a real shuffle + the oracle checks the invariant holds."""
    from bb_ocr_ray.sources.pages import read_pages

    # project BEFORE the shuffle: first_row only needs (url, warc_ts,
    # lang), so the multi-KB html payload never enters the exchange
    pages = read_pages(sf_dir).select_columns(["url", "warc_ts", "lang"])

    def first_row(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("warc_ts", kind="mergesort").head(1)
        return pd.DataFrame({"url": g["url"], "lang": g["lang"]})

    # url-cardinality == row count: coarse-bucketed per-key grouping
    # (one Ray group per key would pay the per-group tax on every row)
    return _grouped_per_key(pages, "url", first_row)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------
QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q_filter_project": q_filter_project,
    "q_topk_per_group": q_topk_per_group,
    "q_distinct": q_distinct,
    "q_count_distinct": q_count_distinct,
    "q_hash_join": q_hash_join,
    "q_broadcast_join_nation": q_broadcast_join_nation,
    "q5_revenue_by_nation": q5_revenue_by_nation,
    "q_anti_join": q_anti_join,
    "q_semi_join": q_semi_join,
    "q_union": q_union,
    "q_events_hourly": q_events_hourly,
    "q_sessionize": q_sessionize,
    "q_json_extract": q_json_extract,
    "q_doc_stats": q_doc_stats,
    "q_doc_quality": q_doc_quality,
    "q_dedup_exact": q_dedup_exact,
    "q_jaccard_pairs": q_jaccard_pairs,
    "q_minhash_candidates": q_minhash_candidates,
    "q_simhash_near_dups": q_simhash_near_dups,
    "q_langid": q_langid,
    "q_fingerprint": q_fingerprint,
    "q_ann_topk": q_ann_topk,
    "q_embedding_near_dups": q_embedding_near_dups,
    "q_extract_pages": q_extract_pages,
    "q_domain_stats": q_domain_stats,
    "q_dedup_pages": q_dedup_pages,
}


# ---------------------------------------------------------------------------
# Additional relational operators (round-1 widening)
# ---------------------------------------------------------------------------
def q_global_topk(sf_dir: str):
    """Global sort + limit: top-20 orders by (o_totalprice desc,
    o_orderkey) — ds.sort is the all-to-all range shuffle; limit
    truncates the stream."""
    ds = _read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_totalprice"])
    out = (
        ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    out["rank"] = pd.Series(range(1, len(out) + 1), dtype="int64")
    return out


def q_offer_ranking(sf_dir: str):
    """Scored top-k per key — re-expression of the reference's offer
    scoring+ranking (abebooks_html.py:149-161, 311-312: keyword hits
    3.0/1.5/1.0, sort by (score, -price), top-10): parts scored by
    deterministic feature hits, top-2 per brand by (score desc,
    p_retailprice asc, p_partkey)."""
    ds = _read_parquet(
        _t(sf_dir, "part"),
        columns=["p_partkey", "p_brand", "p_type", "p_size", "p_retailprice"],
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        s = (
            3.0 * batch["p_type"].str.contains("BRASS").astype("float64")
            + 1.5 * batch["p_type"].str.startswith("ECONOMY").astype("float64")
            + 1.0 * batch["p_size"].between(10, 20).astype("float64")
        )
        batch = batch.assign(score=s)
        # local top-k combiner bounds shuffle input
        return (
            batch.sort_values(["p_brand", "score", "p_retailprice", "p_partkey"],
                              ascending=[True, False, True, True],
                              kind="mergesort")
            .groupby("p_brand", as_index=False)
            .head(2)
        )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", "p_retailprice", "p_partkey"],
                              ascending=[False, True, True],
                              kind="mergesort").head(2)
        g = g.assign(rank=pd.Series(range(1, len(g) + 1), dtype="int64").values)
        return g[["p_brand", "p_partkey", "score", "p_retailprice", "rank"]]

    return (
        ds.map_batches(score, batch_format="pandas")
        .groupby("p_brand")
        .map_groups(final, batch_format="pandas")
    )


def q_keyword_genre(sf_dir: str):
    """Per-doc keyword-list argmax — the genre scoring heuristic
    (hueristics/book_extractor.py:149-178) over documents: count hits
    per keyword set, argmax with fixed tie order, aggregate counts."""
    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    genres = [
        ("data", ("data", "table", "column", "row")),
        ("query", ("query", "filter", "join", "sort")),
        ("stream", ("stream", "window", "batch", "event")),
    ]

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].fillna("").str.split(" ")
        scores = {}
        for name, kws in genres:
            kwset = frozenset(kws)
            scores[name] = toks.map(lambda ws: sum(1 for w in ws if w in kwset))
        df = pd.DataFrame(scores)
        # argmax with fixed tie order = first max in genre declaration order
        best = df.idxmax(axis=1)
        best[df.max(axis=1) == 0] = "none"
        return pd.DataFrame({"genre": best, "one": 1}).groupby(
            "genre", as_index=False
        ).agg(n_docs=("one", "sum"))

    out = (
        ds.map_batches(classify, batch_format="pandas")
        .groupby("genre")
        .aggregate(Sum("n_docs", alias_name="n_docs"))
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


def q_asof_join(sf_dir: str):
    """As-of join (SURVEY.md §2.4 custom-operator slot): for every
    'error' event, the most recent 'click' by the same user at or
    before it.  Partitioning assumption: one user's events fit one
    group; within the group pd.merge_asof does the ordered match."""
    ds = _read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "event_type", "ts"])

    def per_user(group: pd.DataFrame) -> pd.DataFrame:
        errors = group[group["event_type"] == "error"].sort_values(
            ["ts", "event_id"], kind="mergesort")
        clicks = group[group["event_type"] == "click"].sort_values(
            "ts", kind="mergesort")
        if errors.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "last_click_epoch": pd.Series([], dtype="int64")})
        merged = pd.merge_asof(
            errors[["event_id", "ts"]], clicks[["ts"]].assign(click_ts=clicks["ts"]),
            on="ts", direction="backward")
        # floor explicitly: sub-second ts fractions truncate the same
        # way in both engines (DuckDB CAST(double AS BIGINT) rounds)
        epoch = np.floor(
            (merged["click_ts"] - pd.Timestamp("1970-01-01"))
            .dt.total_seconds()
        )
        return pd.DataFrame(
            {"event_id": merged["event_id"].astype("int64"),
             "last_click_epoch": epoch.fillna(-1).astype("int64")}
        )

    return _grouped_per_key(ds, "user_id", per_user)


def q_events_sliding(sf_dir: str):
    """Sliding window (6h window, 1h hop) per event_type: rolling sum
    over the hourly pre-aggregate — windows computed per-type in one
    ordered group pass (hourly partials shuffle, not raw events)."""
    hourly = q_events_hourly(sf_dir)   # event_type, hour_epoch, n_events, ...

    def windows(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("hour_epoch", kind="mergesort").reset_index(drop=True)
        hours = g["hour_epoch"].to_numpy()
        counts = g["n_events"].to_numpy()
        out_n = []
        for h in hours:
            mask = (hours > h - 6 * 3600) & (hours <= h)
            out_n.append(int(counts[mask].sum()))
        return pd.DataFrame(
            {"event_type": g["event_type"],
             "hour_epoch": g["hour_epoch"].astype("int64"),
             "n_events_6h": pd.Series(out_n, dtype="int64")}
        )

    return (
        rd.from_pandas(hourly)
        .groupby("event_type")
        .map_groups(windows, batch_format="pandas")
    )


QUERIES.update(
    {
        "q_global_topk": q_global_topk,
        "q_offer_ranking": q_offer_ranking,
        "q_keyword_genre": q_keyword_genre,
        "q_asof_join": q_asof_join,
        "q_events_sliding": q_events_sliding,
    }
)


def q6_revenue_delta(sf_dir: str):
    """TPC-H Q6 shape: pure filter + scalar aggregate (single row) —
    the simplest partial+final reduction."""
    ds = _read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = (
            (batch["l_shipdate"] >= pd.Timestamp("1995-01-01"))
            & (batch["l_shipdate"] < pd.Timestamp("1997-01-01"))
            & (batch["l_discount"].between(0.03, 0.07))
            & (batch["l_quantity"] < 25)
        )
        sel = batch[m]
        # integer 1e-4-dollar units (ext_cents * disc_pct): the fold
        # is order-independent, so the scalar matches the oracle at
        # any scale (float sums drift past round-2 at sf0.1 — see q1)
        rev_u = (_round_sql(sel["l_extendedprice"] * 100.0, 0)
                 .astype("int64")
                 * _round_sql(sel["l_discount"] * 100.0, 0)
                 .astype("int64")).sum()
        return pd.DataFrame(
            {"revenue_u": pd.Series([rev_u], dtype="int64"),
             "n_rows": [int(m.sum())]}
        )

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=65536).to_pandas()
    return pd.DataFrame(
        {"revenue": [float(_round_sql(
            int(parts["revenue_u"].sum()) / 10000.0, 2))],
         "n_rows": pd.Series([parts["n_rows"].sum()], dtype="int64")}
    )


def q_running_total(sf_dir: str):
    """Windowed running aggregate per group: cumulative order value per
    customer in o_orderdate order (groupby(cust).map_groups cumsum) —
    output restricted to customers with ≥ 8 orders to keep rows bounded."""
    ds = _read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    )

    # coarse-bucket shuffle + fully vectorized inner window: one python
    # call per BUCKET (64), with pandas groupby().cumsum() doing every
    # customer at once — no per-customer python (23.5 s -> ~3 s at sf0.1)
    def add_coarse(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__coarse"] = (
            batch["o_custkey"].astype("uint64") * 2654435761 % (1 << 32)
        ) % 64
        return batch

    def running_bucket(group: pd.DataFrame) -> pd.DataFrame:
        counts = group["o_custkey"].value_counts()
        keep = counts[counts >= 8].index
        g = group[group["o_custkey"].isin(keep)].sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        return pd.DataFrame(
            {"o_custkey": g["o_custkey"].astype("int64"),
             "o_orderkey": g["o_orderkey"].astype("int64"),
             "running_total": _round_sql(
                 g.groupby("o_custkey")["o_totalprice"].cumsum(), 2)}
        )

    return (
        ds.map_batches(add_coarse, batch_format="pandas")
        .groupby("__coarse")
        .map_groups(running_bucket, batch_format="pandas")
    )


def q_ivf_topk(sf_dir: str):
    """IVF top-k with exact triangle-inequality refinement
    (stages/ann.ivf_topk_exact): probe the closest inverted lists,
    bound the unseen lists with centroid distance + cluster radius,
    rescan only the lists that could still hold a top-k member.  The
    result provably equals brute force, so the oracle is the exact
    cross-join SQL — this closes the last no_oracle row in the driver
    CORRECTNESS file (VERDICT r2 item 5); the plain approximate
    ivf_topk's recall contract stays covered by unit tests.  Query
    vectors are vec_id 10..19 (q_ann_topk owns 0..9)."""
    from bb_ocr_ray.stages.ann import ivf_topk_exact

    vecs = _read_parquet(_t(sf_dir, "embeddings"),
                           columns=["vec_id", "embedding"])
    return ivf_topk_exact(vecs, query_ids=list(range(10, 20)), k=5)


QUERIES.update(
    {
        "q6_revenue_delta": q6_revenue_delta,
        "q_running_total": q_running_total,
        "q_ivf_topk": q_ivf_topk,
    }
)


def q_reading_order(sf_dir: str):
    """Bounding-box reading-order sort (the layout/PDF branch core,
    reference: bbox region ordering enhanced_extractor.py:289-337):
    synthetic page layouts derived deterministically from lineitem
    (page = orderkey; one box per line item), banded reading order
    computed per page after one shuffle on the page key."""
    from bb_ocr_ray.stages.layout_stage import reading_order_stage

    ds = _read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_partkey"],
    )

    def to_boxes(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"page": batch["l_orderkey"].astype("int64"),
             "item_id": batch["l_linenumber"].astype("int64"),
             "x": ((batch["l_partkey"] % 7) * 140).astype("int64"),
             "y": (batch["l_linenumber"] * 40).astype("int64"),
             "w": 120, "h": 30}
        )

    boxes = ds.map_batches(to_boxes, batch_format="pandas")
    out = reading_order_stage(boxes, page_col="page", strategy="banded",
                              band_h=40)
    return out.select_columns(["page", "item_id", "reading_rank"])


QUERIES.update({"q_reading_order": q_reading_order})


def q_hash_sample(sf_dir: str):
    """Deterministic hash-based sampling (the reproducible-at-scale
    alternative to random_sample): keep rows whose md5(text) first byte
    < 64 (a ~25% sample that is stable across runs, partitions and
    engines — the SQL oracle computes the identical predicate)."""
    ds = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def sample(batch: pd.DataFrame) -> pd.DataFrame:
        keep = [int(md5_hex(t or "")[:2], 16) < 64 for t in batch["text"]]
        return batch[keep][["doc_id"]]

    return ds.map_batches(sample, batch_format="pandas")


def q_value_histogram(sf_dir: str):
    """Mergeable fixed-bin histogram sketch over events.value per
    event_type — the deterministic quantile-sketch pattern: per-batch
    partial histograms merge by addition; the oracle recomputes the
    same binning exactly (no approximation mismatch because the sketch
    IS the binning)."""
    ds = _read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "value"])
    lo, hi, nbins = 0.0, 100.0, 20

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # NULL values would NaN-poison the int cast — drop them here and
        # mirror with WHERE value IS NOT NULL in the oracle
        batch = batch[batch["value"].notna()]
        b = np.clip(((batch["value"] - lo) / (hi - lo) * nbins).astype(int),
                    0, nbins - 1)
        df = pd.DataFrame({"event_type": batch["event_type"], "bin": b,
                           "n": 1})
        return df.groupby(["event_type", "bin"], as_index=False).sum()

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["bin"] = out["bin"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def q_rollup(sf_dir: str):
    """Multi-level aggregate (rollup): order counts + revenue at
    (status, priority), (status), and grand total, via partial agg +
    union of levels — mirrors SQL GROUP BY ROLLUP."""
    ds = _read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # integer cents (see q1: float sums drift past round-2 at sf0.1)
        batch = batch.assign(rev_c=_round_sql(
            batch["o_totalprice"] * 100.0, 0).astype("int64"))
        return batch.groupby(["o_orderstatus", "o_orderpriority"],
                             as_index=False).agg(
            n_orders=("rev_c", "size"),
            revenue=("rev_c", "sum"),
        )

    fine = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    mid = fine.groupby("o_orderstatus", as_index=False).agg(
        n_orders=("n_orders", "sum"), revenue=("revenue", "sum"))
    mid["o_orderpriority"] = None
    total = pd.DataFrame(
        {"o_orderstatus": [None], "o_orderpriority": [None],
         "n_orders": [fine["n_orders"].sum()],
         "revenue": [fine["revenue"].sum()]}
    )
    out = pd.concat([fine, mid, total], ignore_index=True)
    out["revenue"] = _round_sql(out["revenue"].astype("int64") / 100.0, 2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out[["o_orderstatus", "o_orderpriority", "n_orders", "revenue"]]


QUERIES.update(
    {
        "q_hash_sample": q_hash_sample,
        "q_value_histogram": q_value_histogram,
        "q_rollup": q_rollup,
    }
)


def q_median(sf_dir: str):
    """Exact grouped median (discrete, lower element): per event_type,
    the value at index floor((n-1)/2) of the sorted values — computed
    per group after one shuffle on the (5-key) group column; mirrors
    DuckDB quantile_disc(0.5)."""
    ds = _read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "value"])

    def median(group: pd.DataFrame) -> pd.DataFrame:
        # quantile_disc ignores NULLs — drop them before indexing; an
        # all-NULL group yields a NULL median (quantile_disc semantics),
        # not an IndexError
        v = group["value"].dropna().sort_values(kind="mergesort").to_numpy()
        m = float(v[(len(v) - 1) // 2]) if len(v) else np.nan
        return pd.DataFrame({"event_type": [group["event_type"].iloc[0]],
                             "median_value": pd.Series([m], dtype="float64")})

    return ds.groupby("event_type").map_groups(median, batch_format="pandas")


def q_knn_label(sf_dir: str):
    """k-NN majority label vote: for query vectors vec_id < 20, the
    modal label among the 5 nearest neighbors (ties -> smallest label).
    Exact cosine path (ann_topk) + broadcast label lookup."""
    from bb_ocr_ray.stages.ann import ann_topk
    from bb_ocr_ray.stages.joins import broadcast_join

    vecs = _read_parquet(_t(sf_dir, "embeddings"),
                           columns=["vec_id", "embedding"])
    topk = ann_topk(vecs, query_ids=list(range(20)), k=5)
    labels = pd.read_parquet(_t(sf_dir, "embeddings"),
                             columns=["vec_id", "label"])
    labels = labels.rename(columns={"vec_id": "neighbor_id"})
    joined = broadcast_join(topk, labels, on="neighbor_id")

    def vote(group: pd.DataFrame) -> pd.DataFrame:
        counts = group["label"].value_counts()
        top = counts[counts == counts.max()].index.min()   # tie -> min label
        return pd.DataFrame(
            {"query_id": pd.Series([group["query_id"].iloc[0]], dtype="int64"),
             "pred_label": pd.Series([int(top)], dtype="int64")}
        )

    return joined.groupby("query_id").map_groups(vote, batch_format="pandas")


QUERIES.update({"q_median": q_median, "q_knn_label": q_knn_label})


def q_near_dup_dedup(sf_dir: str):
    """End-to-end near-dup dedup (MinHash+LSH -> Jaccard verify ->
    connected components -> keep min id).  Oracle-checked end-to-end:
    the DuckDB mirror recomputes the sketch candidates, the exact
    integer Jaccard verify, and the clustering as a recursive
    min-label transitive closure (oracles._near_dup_dedup_sql)."""
    from bb_ocr_ray.stages.dedup import near_dup_dedup

    docs = _read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"])
    return near_dup_dedup(docs).select_columns(["doc_id"])


QUERIES.update({"q_near_dup_dedup": q_near_dup_dedup})


def q_sessionize_stream(sf_dir: str):
    """Watermark/late-data sessionization (incremental actor state, the
    §2.9 streaming variant): events stream through a bank of stateful
    actors with an event-time watermark.  On an in-order stream no
    event is late, so the result provably equals the batch groupby
    sessionization — the oracle IS q_sessionize's SQL; the late-data
    semantics (buffer within lateness, count+drop beyond it) are
    covered by unit tests with out-of-order fixtures."""
    from bb_ocr_ray.stages.streaming import sessionize_watermark

    events = _read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])
    out, n_late = sessionize_watermark(events, allowed_lateness=300.0)
    assert n_late == 0  # in-order stream: nothing can be late
    return out


QUERIES.update({"q_sessionize_stream": q_sessionize_stream})


def q_registrable_domain(sf_dir: str):
    """Registrable-domain (eTLD+1) grouping: hostnames synthesized
    deterministically from doc_id across five shapes (ccTLD
    second-level registries, deep subdomains, bare domains) are
    reduced to their registrable domain and counted.  Oracle-checked:
    the suffix logic runs in SQL against the SAME embedded PSL subset
    (generated into the oracle), so 'shop.a.co.uk' and 'cdn.a.co.uk'
    group as 'a.co.uk' — the grouping bare netloc gets wrong."""
    from bb_ocr_ray.functions.scalars import registrable_domain

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    _SHAPES = ("shop.site{k}.co.uk", "news.site{k}.com.au",
               "a.b.site{k}.com", "site{k}.org", "cdn.site{k}.co.jp")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["doc_id"].to_numpy()
        hosts = [_SHAPES[int(x) % 5].format(k=int(x) % 7) for x in d]
        reg = [registrable_domain(h) for h in hosts]
        df = pd.DataFrame({"domain": reg, "n": np.ones(len(d), dtype="int64")})
        return df.groupby("domain", as_index=False).sum()

    # registrable domains are unbounded at web scale: coarse_agg
    out = coarse_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["domain"], {"n_docs": ("n", "sum")},
    ).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


QUERIES.update({"q_registrable_domain": q_registrable_domain})


def q_stratified_sample(sf_dir: str):
    """Per-stratum deterministic sampling (the data-mixing primitive:
    different keep rates per language) — md5(doc_id) first byte under
    a per-lang threshold (en 1/2, de 1/4, others 1/8).  Reproducible
    across engines, partitions and runs; the oracle computes the
    identical predicate."""
    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    thr = {"en": 128, "de": 64}

    def sample(batch: pd.DataFrame) -> pd.DataFrame:
        keep = [
            int(md5_hex(str(int(d)))[:2], 16) < thr.get(lg, 32)
            for d, lg in zip(batch["doc_id"], batch["lang"])
        ]
        return batch[keep]

    return ds.map_batches(sample, batch_format="pandas")


def q_token_histogram(sf_dir: str):
    """Token-length distribution per language in power-of-two bins
    (bin = bit_length(n_tokens)) — the corpus length profile every
    training-data pipeline reports.  Mergeable partial histograms;
    integer bins so no float-binning drift."""
    ds = _read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        n = n_tokens_series(batch["text"].fillna("")).astype("int64")
        bins = n.map(lambda x: int(x).bit_length()).astype("int64")
        df = pd.DataFrame({"lang": batch["lang"], "bin": bins,
                           "n": np.ones(len(batch), dtype="int64")})
        return df.groupby(["lang", "bin"], as_index=False).sum()

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "bin"])
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
    )
    out["bin"] = out["bin"].astype("int64")
    out["n_docs"] = out["n_docs"].astype("int64")
    return out


QUERIES.update({
    "q_stratified_sample": q_stratified_sample,
    "q_token_histogram": q_token_histogram,
})


def q_frame_sample(sf_dir: str):
    """Frame sampling over binary payloads (video frame-extraction
    analog): documents text encoded to bytes, treated as concatenated
    256-byte frames, every 4th full frame emitted.  Oracle-checked on
    the frame BYTES via their hex encoding — DuckDB has no blob
    slicing, but substr(hex(blob)) mirrors byte slicing exactly (2 hex
    chars per byte)."""
    from bb_ocr_ray.stages.multimodal import frame_sample

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def to_payload(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"item_id": b["doc_id"].astype("int64"),
             "payload": [(t or "").encode("utf-8") for t in b["text"]]})

    ds = docs.map_batches(to_payload, batch_format="pandas")
    frames = ds.map_batches(frame_sample, batch_format="pyarrow")

    def to_hex(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"item_id": b["item_id"].astype("int64"),
             "frame_idx": b["frame_idx"].astype("int64"),
             "frame_hex": [bytes(f).hex().upper() for f in b["frame"]]})

    return frames.map_batches(to_hex, batch_format="pandas")


QUERIES.update({"q_frame_sample": q_frame_sample})


def q_band_join(sf_dir: str):
    """Time-band range join: (view, purchase) event pairs within 30 s
    of each other — the interval/proximity join Ray Data lacks,
    composed as window-bucketed replication + one coarse shuffle +
    exact in-task band filter (stages/joins.band_join).  Integer-
    microsecond epochs on both sides so the band boundary is exact."""
    from bb_ocr_ray.stages.joins import band_join

    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_id", "event_type", "ts"])

    def prep(kind: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["event_type"] == kind]
            return pd.DataFrame(
                {"event_id": b["event_id"].astype("int64"),
                 "t_us": b["ts"].astype("datetime64[us]").astype("int64")})

        return fn

    views = ev.map_batches(prep("view"), batch_format="pandas")
    purchases = ev.map_batches(prep("purchase"), batch_format="pandas")
    pairs = band_join(views, purchases, time_col="t_us",
                      band_us=30_000_000)
    return pairs.map_batches(
        lambda b: pd.DataFrame(
            {"view_id": b["event_id"].astype("int64"),
             "purchase_id": b["event_id_r"].astype("int64")}),
        batch_format="pandas",
    )


QUERIES.update({"q_band_join": q_band_join})


def q_hll_registers(sf_dir: str):
    """HyperLogLog register state over events.user_id — the mergeable
    approximate-count-distinct sketch as a first-class aggregate.  The
    query emits the SKETCH STATE (bucket, max_rho), which is
    integer-exact and oracle-checked; the float estimate derived from
    it (hashing.hll_estimate) is asserted against the true
    cardinality in tests.  rho uses trailing zeros so the oracle can
    mirror it with bit_count in pure integer SQL."""
    from bb_ocr_ray.functions.hashing import hll_bucket_rho

    ds = _read_parquet(_t(sf_dir, "events"), columns=["user_id"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch["user_id"].dropna()
        if not len(u):
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "rho": pd.Series([], dtype="int64")})
        pairs = [hll_bucket_rho(str(int(x))) for x in u]
        df = pd.DataFrame(pairs, columns=["bucket", "rho"])
        return df.groupby("bucket", as_index=False).max()

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .aggregate(Max("rho", alias_name="max_rho"))
        .to_pandas()
    )
    out["bucket"] = out["bucket"].astype("int64")
    out["max_rho"] = out["max_rho"].astype("int64")
    return out


QUERIES.update({"q_hll_registers": q_hll_registers})


def q_hll_grouped(sf_dir: str):
    """GROUPED HyperLogLog: per event_type, the register state of the
    distinct-user sketch — approximate count-distinct per group as ONE
    mergeable aggregate pass (the shape that replaces an exact
    count-distinct shuffle at web scale: 5 groups x 64 registers of
    state instead of every (group, user) pair).  Integer-exact state;
    estimates asserted in tests."""
    from bb_ocr_ray.functions.hashing import hll_bucket_rho

    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_type", "user_id"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.dropna(subset=["user_id"])
        if not len(b):
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype="object"),
                 "bucket": pd.Series([], dtype="int64"),
                 "rho": pd.Series([], dtype="int64")})
        pairs = [hll_bucket_rho(str(int(x))) for x in b["user_id"]]
        df = pd.DataFrame(pairs, columns=["bucket", "rho"])
        df["event_type"] = b["event_type"].to_numpy()
        return df.groupby(["event_type", "bucket"], as_index=False).max()

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "bucket"])
        .aggregate(Max("rho", alias_name="max_rho"))
        .to_pandas()
    )
    out["bucket"] = out["bucket"].astype("int64")
    out["max_rho"] = out["max_rho"].astype("int64")
    return out


QUERIES.update({"q_hll_grouped": q_hll_grouped})


def q_binary_features(sf_dir: str):
    """Multimodal plumbing over real binary payloads: documents text
    encoded as bytes -> deterministic fake decode (dims) -> byte
    histogram + entropy.  SQL-oracled since round 3: the md5-derived
    fake dims and the high-nibble entropy both mirror in DuckDB
    (md5(VARCHAR) hashes the same utf-8 bytes; nibble i is hex char
    2i-1 of hex(encode(text))); the driver's round-6 canon absorbs the
    16-term float-sum order difference."""
    from bb_ocr_ray.stages.multimodal import (
        DecodeImageStub,
        byte_histogram_features,
        resize_stub,
    )

    docs = _read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"])

    def to_payload(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"item_id": batch["doc_id"].astype("int64"),
             "payload": [(t or "").encode("utf-8") for t in batch["text"]]}
        )

    ds = docs.map_batches(to_payload, batch_format="pandas")
    decoded = ds.map_batches(DecodeImageStub,
                             fn_constructor_kwargs={"fake": True},
                             batch_format="pyarrow", concurrency=(1, 2))
    resized = decoded.map_batches(resize_stub, batch_format="pyarrow")
    feats = resized.map_batches(byte_histogram_features, batch_format="pandas")
    return feats.select_columns(["item_id", "width", "height",
                                 "needs_resize", "byte_entropy"])


QUERIES.update({"q_binary_features": q_binary_features})


def q_provider_fanout(sf_dir: str):
    """Provider fan-out lookup (the reference's pricing pipeline shape,
    SURVEY.md §3.3): each supplier record queries three providers —
    an exact-key lookup, a range scan, and a stub — offers are merged
    with provider tags, deduped on (record, provider, listing) (the
    reference's seen-key includes the provider), then summarized per
    record."""
    import ray

    from bb_ocr_ray.stages.lookup import (
        dedup_offers,
        make_stub_provider,
        provider_fanout,
    )

    part = pd.read_parquet(_t(sf_dir, "part"),
                           columns=["p_partkey", "p_size", "p_retailprice"])
    part_ref = ray.put(part)

    def parts_exact(records: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(part_ref)
        m = records.merge(p, left_on=records["s_suppkey"] * 4,
                          right_on="p_partkey")
        return pd.DataFrame({"record_key": m["s_suppkey"],
                             "listing_id": m["p_partkey"],
                             "amount": m["p_retailprice"]})

    def parts_by_size(records: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(part_ref)
        r = records.assign(p_size=(records["s_suppkey"] % 50).astype("int32"))
        m = r.merge(p, on="p_size")
        m = m[m["p_partkey"] % 25 == 0]     # keep the scan sparse
        return pd.DataFrame({"record_key": m["s_suppkey"],
                             "listing_id": m["p_partkey"],
                             "amount": m["p_retailprice"]})

    providers = {
        "exact": parts_exact,
        "size_scan": parts_by_size,
        "stub": make_stub_provider("stub"),
    }
    records = _read_parquet(_t(sf_dir, "supplier"), columns=["s_suppkey"])
    offers = provider_fanout(records, providers, key_col="s_suppkey")
    offers = offers.map_batches(lambda b: b[b["status"] == "ok"].dropna(
        subset=["listing_id"]), batch_format="pandas")
    deduped = dedup_offers(offers)

    def summarize(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby("record_key", as_index=False).agg(
            n_offers=("listing_id", "size"), best_amount=("amount", "min"))

    # record keys scale with the catalog: coarse_agg (per-group tax)
    out = coarse_agg(
        deduped.map_batches(summarize, batch_format="pandas"),
        ["record_key"],
        {"n_offers": ("n_offers", "sum"),
         "best_amount": ("best_amount", "min")},
    ).to_pandas()
    out["record_key"] = out["record_key"].astype("int64")
    out["n_offers"] = out["n_offers"].astype("int64")
    return out


QUERIES.update({"q_provider_fanout": q_provider_fanout})


# ---------------------------------------------------------------------------
# Left outer join (hash_join how="left"): customers keep their row even
# with zero orders
# ---------------------------------------------------------------------------
def q_left_join(sf_dir: str):
    """Left outer join at scale: customer LEFT JOIN a per-custkey order
    aggregate; customers without any order survive with zeroed stats
    (the unmatched-row path of ``hash_join(how="left")``).

    Scale shape: orders are aggregated per custkey BEFORE the join
    (aggregate-then-join), so the join shuffle moves one row per
    ordering customer instead of every order row."""
    from bb_ocr_ray.stages.joins import hash_join

    orders = _read_parquet(_t(sf_dir, "orders"),
                           columns=["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_custkey", as_index=False).agg(
            n_orders=("o_totalprice", "size"),
            total_spent=("o_totalprice", "sum"))

    def final(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("o_custkey", as_index=False).agg(
            n_orders=("n_orders", "sum"),
            total_spent=("total_spent", "sum"))
        return g.rename(columns={"o_custkey": "c_custkey"})

    # The partial set is BOUNDED (<= ordering customers x blocks), so
    # the final aggregate coalesces into ONE pandas task instead of
    # Ray's sort-based Aggregate, whose per-block boundary cost ran
    # 1.2 s/block on 700-row partials (measured: 7.7 s -> ~1 s).  At
    # key cardinalities past one task's heap, use the salted
    # groupby path (stages/domain_agg) instead.  materialize():
    # hash_join's schema inspection executes a lazy pandas lineage
    # once and the join run would execute it again.
    agg = (
        orders.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
        .materialize()
    )
    cust = _read_parquet(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_mktsegment"])
    out = hash_join(cust, agg, on="c_custkey", how="left").to_pandas()
    out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
    out["total_spent"] = _round_sql(
        out["total_spent"].astype("float64").fillna(0.0), 2)
    return out


# ---------------------------------------------------------------------------
# Pivot (long -> wide): per-user event-type count columns
# ---------------------------------------------------------------------------
def q_pivot_events(sf_dir: str):
    """Pivot: one count column per event type plus summed purchase
    value, per user.  The per-batch partial is ALREADY wide (a local
    crosstab), so the groupby shuffles one wide row per (batch, user)
    instead of one long row per event.  NULL user_id rows are dropped
    (pd.crosstab excludes NaN index keys; the oracle mirrors with
    WHERE user_id IS NOT NULL — same convention as q_unpivot/q_funnel/
    q_cms)."""
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "event_type", "value"])
    types = ["click", "error", "purchase", "signup", "view"]
    cols = [f"n_{t}" for t in types]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(b["user_id"], b["event_type"])
        ct = ct.reindex(columns=types, fill_value=0)
        ct.columns = cols
        pv = (b[b["event_type"] == "purchase"]
              .groupby("user_id")["value"].sum())
        ct["purchase_value"] = pv.reindex(ct.index).fillna(0.0)
        return ct.reset_index()

    # user_id is row-cardinality: coarse_agg (per-group tax)
    spec = {c: (c, "sum") for c in cols}
    spec["purchase_value"] = ("purchase_value", "sum")
    out = coarse_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], spec,
    ).to_pandas()
    for c in cols:
        out[c] = out[c].astype("int64")
    # blocks containing NULL users arrive with a float64 user_id column;
    # crosstab dropped the NaN keys, so the cast is always exact
    out["user_id"] = out["user_id"].astype("int64")
    out["purchase_value"] = _round_sql(out["purchase_value"], 2)
    return out


# ---------------------------------------------------------------------------
# Window lag: per-user inter-event gaps (integer-microsecond exact)
# ---------------------------------------------------------------------------
def q_event_gaps(sf_dir: str):
    """Per-user inter-event gap stats via the lag window shape: events
    ordered by (ts, event_id) per user; gaps summed/maxed as EXACT
    integer microseconds (no float summation-order drift to absorb).
    Users with a single event have no gap and are omitted (mirrors
    HAVING count(*) >= 2)."""
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_id"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=["ts"])  # mirror WHERE ts IS NOT NULL
        if len(g) < 2:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "n_gaps": pd.Series([], dtype="int64"),
                                 "sum_gap_us": pd.Series([], dtype="int64"),
                                 "max_gap_us": pd.Series([], dtype="int64")})
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        # unit-safe exact microseconds (parquet timestamps arrive as
        # datetime64[us]; a plain .astype(int64) would be ns-dependent)
        d = (g["ts"].diff().dropna()
             .astype("timedelta64[us]").astype("int64"))
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_gaps": [len(d)],
                             "sum_gap_us": [int(d.sum())],
                             "max_gap_us": [int(d.max())]})

    return _grouped_per_key(ds, "user_id", gaps)


QUERIES.update({
    "q_left_join": q_left_join,
    "q_pivot_events": q_pivot_events,
    "q_event_gaps": q_event_gaps,
})


# ---------------------------------------------------------------------------
# Ordered fold (A6 as a query-level op): grouped string_agg
# ---------------------------------------------------------------------------
def q_group_concat(sf_dir: str):
    """Per region name, the '|'-joined ALPHABETICAL list of its nations
    — the reference's ordered list->string fold (authors -> CSV,
    `stages/sinks.flatten_metadata`) expressed as a grouped aggregate
    with a deterministic intra-group order."""
    from bb_ocr_ray.stages.joins import broadcast_join

    nation = _read_parquet(_t(sf_dir, "nation"),
                           columns=["n_regionkey", "n_name"])
    region = pd.read_parquet(_t(sf_dir, "region"),
                             columns=["r_regionkey", "r_name"])

    folded = nation.groupby("n_regionkey").map_groups(
        lambda g: pd.DataFrame({
            "n_regionkey": [int(g["n_regionkey"].iloc[0])],
            "nations": ["|".join(sorted(g["n_name"]))],
            "n_nations": [len(g)]}),
        batch_format="pandas")
    out = broadcast_join(
        folded, region.rename(columns={"r_regionkey": "n_regionkey"}),
        on="n_regionkey").to_pandas()
    out = out[["r_name", "nations", "n_nations"]]
    out["n_nations"] = out["n_nations"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# CUBE: all four grouping sets from one distributed pass
# ---------------------------------------------------------------------------
def q_cube(sf_dir: str):
    """GROUP BY CUBE (status, priority): the fine level comes from the
    one distributed partial-agg pass; the three coarser grouping sets
    — (status), (priority), () — are derived from the TINY fine-level
    aggregate on the driver (aggregate-of-aggregate; no second scan).
    Extends q_rollup's level-union pattern to the full cross."""
    ds = _read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # integer cents (see q1: float sums drift past round-2 at sf0.1)
        batch = batch.assign(rev_c=_round_sql(
            batch["o_totalprice"] * 100.0, 0).astype("int64"))
        return batch.groupby(["o_orderstatus", "o_orderpriority"],
                             as_index=False).agg(
            n_orders=("rev_c", "size"),
            revenue=("rev_c", "sum"))

    fine = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    by_status = fine.groupby("o_orderstatus", as_index=False).agg(
        n_orders=("n_orders", "sum"), revenue=("revenue", "sum"))
    by_status["o_orderpriority"] = None
    by_prio = fine.groupby("o_orderpriority", as_index=False).agg(
        n_orders=("n_orders", "sum"), revenue=("revenue", "sum"))
    by_prio["o_orderstatus"] = None
    total = pd.DataFrame(
        {"o_orderstatus": [None], "o_orderpriority": [None],
         "n_orders": [fine["n_orders"].sum()],
         "revenue": [fine["revenue"].sum()]})
    out = pd.concat([fine, by_status, by_prio, total], ignore_index=True)
    out["revenue"] = _round_sql(out["revenue"].astype("int64") / 100.0, 2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out[["o_orderstatus", "o_orderpriority", "n_orders", "revenue"]]


# ---------------------------------------------------------------------------
# Token-repetition quality stats (Gopher-style repetition filter inputs)
# ---------------------------------------------------------------------------
def q_repetition(sf_dir: str):
    """Per-document token-repetition stats — the inputs to a
    Gopher/C4-style repetition quality filter: total whitespace tokens,
    distinct tokens, and the frequency of the most repeated token.
    Doc-local by construction: one vectorized explode+groupby per
    batch, NO shuffle.  Tokenization is the shared ASCII class
    (`functions.hashing.ws_tokens`), the same one the sketch oracles
    mirror; zero-token docs emit zeros."""
    from bb_ocr_ray.functions.hashing import ws_tokens

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def rep(b: pd.DataFrame) -> pd.DataFrame:
        toks = [ws_tokens(t or "") for t in b["text"]]
        lens = [len(t) for t in toks]
        ex = pd.DataFrame({
            "doc_id": np.repeat(b["doc_id"].to_numpy(), lens),
            "tok": [w for t in toks for w in t]})
        pc = ex.groupby(["doc_id", "tok"], as_index=False).size()
        agg = pc.groupby("doc_id").agg(
            n_tokens=("size", "sum"), n_distinct=("size", "size"),
            max_tok_count=("size", "max")).reset_index()
        out = pd.DataFrame({"doc_id": b["doc_id"]}).merge(
            agg, on="doc_id", how="left").fillna(0)
        for c in ("n_tokens", "n_distinct", "max_tok_count"):
            out[c] = out[c].astype("int64")
        return out

    return ds.map_batches(rep, batch_format="pandas")


# ---------------------------------------------------------------------------
# Benchmark decontamination (train/eval n-gram overlap)
# ---------------------------------------------------------------------------
def q_decontaminate(sf_dir: str, k: int = 8):
    """Decontamination: flag corpus docs sharing any k-token shingle
    with the eval set (doc_id % 50 == 0) and count the DISTINCT
    overlapping shingles.  The eval side is a benchmark — inherently
    small — so its distinct-shingle set is built once and broadcast
    via ray.put; the corpus streams through one map_batches with no
    shuffle (the standard scale shape for training-data decontam)."""
    import functools

    import ray

    from bb_ocr_ray.functions.hashing import shingle_set

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    sh_of = functools.partial(shingle_set, k=k)

    eval_pd = docs.map_batches(lambda b: b[b["doc_id"] % 50 == 0],
                               batch_format="pandas").to_pandas()
    eval_sh = set().union(*map(sh_of, eval_pd["text"])) \
        if len(eval_pd) else set()
    ref = ray.put(eval_sh)

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        es = ray.get(ref)
        ids, hits = [], []
        for d, t in zip(b["doc_id"], b["text"]):
            if d % 50 == 0:
                continue
            n = len(sh_of(t) & es)
            if n:
                ids.append(int(d))
                hits.append(n)
        return pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                             "n_hit_shingles": pd.array(hits, dtype="int64")})

    out = docs.map_batches(flag, batch_format="pandas").to_pandas()
    if out.empty:
        # an all-empty Dataset loses its schema through to_pandas()
        # (Ray drops empty blocks); re-type the contamination report so
        # a clean corpus still yields the contract columns
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                            "n_hit_shingles": pd.Series([], dtype="int64")})
    return out


QUERIES.update({
    "q_group_concat": q_group_concat,
    "q_cube": q_cube,
    "q_repetition": q_repetition,
    "q_decontaminate": q_decontaminate,
})


# ---------------------------------------------------------------------------
# Grouped exact discrete quantiles (p25/p50/p75)
# ---------------------------------------------------------------------------
def q_percentiles(sf_dir: str):
    """Exact grouped quantiles at three points — extends q_median's
    shape.  quantile_disc picks the element at ceil(q*n)-1 of the
    NULL-free sorted values (probed against DuckDB for n=4..6), so the
    output is an exact element, bit-identical on both sides."""
    import math

    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_type", "value"])

    def qtl(group: pd.DataFrame) -> pd.DataFrame:
        v = group["value"].dropna().sort_values(kind="mergesort").to_numpy()

        def pick(q: float) -> float:
            return float(v[math.ceil(q * len(v)) - 1]) if len(v) else np.nan

        return pd.DataFrame({
            "event_type": [group["event_type"].iloc[0]],
            "p25": pd.Series([pick(0.25)], dtype="float64"),
            "p50": pd.Series([pick(0.50)], dtype="float64"),
            "p75": pd.Series([pick(0.75)], dtype="float64")})

    return ds.groupby("event_type").map_groups(qtl, batch_format="pandas")


# ---------------------------------------------------------------------------
# first_value / last_value window shape: first and last event per user
# ---------------------------------------------------------------------------
def q_first_last(sf_dir: str):
    """First and last event per user in (ts, event_id) order — the
    first_value/last_value window pair as one per-group pass (the
    sessionizer's ordering convention; NULL ts sorts last on both
    sides).  NULL user_id rows are dropped (repo convention; the
    oracle's self-join already drops them — made explicit there)."""
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_id", "event_type"])
    ds = ds.map_batches(lambda b: b.dropna(subset=["user_id"]),
                        batch_format="pandas")

    def fl(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "first_event_id": [int(g["event_id"].iloc[0])],
            "first_type": [g["event_type"].iloc[0]],
            "last_event_id": [int(g["event_id"].iloc[-1])],
            "last_type": [g["event_type"].iloc[-1]],
            "n_events": [len(g)]})

    return _grouped_per_key(ds, "user_id", fl)


# ---------------------------------------------------------------------------
# Corpus n-gram statistics (training-corpus vocabulary analysis)
# ---------------------------------------------------------------------------
def q_ngram_freq(sf_dir: str):
    """Top-20 corpus bigrams by total occurrence count.  The per-batch
    Counter partial bounds the shuffle at O(per-batch vocabulary) —
    one (ngram, n) row per distinct bigram per batch instead of one
    row per occurrence; the groupby-sum then moves counts, not text.
    Deterministic (count desc, ngram asc) tiebreak."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in b["text"]:
            tk = ws_tokens(t or "")
            c.update(tk[i] + " " + tk[i + 1] for i in range(len(tk) - 1))
        return pd.DataFrame({"ngram": list(c.keys()),
                             "n": pd.array(list(c.values()), dtype="int64")})

    # the ngram vocabulary is unbounded: coarse_agg (per-group tax)
    agg = coarse_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["ngram"], {"n": ("n", "sum")},
    ).to_pandas()
    agg["n"] = agg["n"].astype("int64")
    return (agg.sort_values(["n", "ngram"], ascending=[False, True],
                            kind="mergesort")
            .head(20).reset_index(drop=True))


# ---------------------------------------------------------------------------
# Document frequency (how many docs contain each token)
# ---------------------------------------------------------------------------
def q_doc_freq(sf_dir: str):
    """Top-20 tokens by DOCUMENT frequency (each doc counts once per
    token) — the IDF numerator of a corpus.  Per-batch distinct-per-doc
    Counter partial, groupby-sum, (df desc, token asc) tiebreak."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in b["text"]:
            c.update(set(ws_tokens(t or "")))
        return pd.DataFrame({"tok": list(c.keys()),
                             "df": pd.array(list(c.values()), dtype="int64")})

    # the token vocabulary is unbounded: coarse_agg (per-group tax)
    agg = coarse_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["tok"], {"df": ("df", "sum")},
    ).to_pandas()
    agg["df"] = agg["df"].astype("int64")
    return (agg.sort_values(["df", "tok"], ascending=[False, True],
                            kind="mergesort")
            .head(20).reset_index(drop=True))


QUERIES.update({
    "q_percentiles": q_percentiles,
    "q_first_last": q_first_last,
    "q_ngram_freq": q_ngram_freq,
    "q_doc_freq": q_doc_freq,
})


# ---------------------------------------------------------------------------
# MinHash Jaccard estimation (sketch-based similarity, integer-exact)
# ---------------------------------------------------------------------------
def q_minhash_est(sf_dir: str):
    """Signature-slot Jaccard estimate for every LSH candidate pair:
    ``n_eq_slots`` = number of equal MinHash slots (of 128), the
    integer numerator of est = n_eq/128 — reported as an int so the
    oracle comparison is exact.  Signatures are computed distributed
    for MENTIONED docs only and collected (bounded by the candidate
    set — the verify-stage pattern); the pair list never reshuffles."""
    import ray

    from bb_ocr_ray.functions.hashing import minhash_signature
    from bb_ocr_ray.stages.dedup import minhash_candidates

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    pairs = minhash_candidates(docs).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "n_eq_slots": pd.Series([], dtype="int64")})
    mentioned = frozenset(pairs["id_a"]) | frozenset(pairs["id_b"])
    ref = ray.put(mentioned)

    def sigs(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        rows = [(int(d), minhash_signature(t or "").tobytes())
                for d, t in zip(b["doc_id"], b["text"]) if d in m]
        return pd.DataFrame({"doc_id": pd.array([r[0] for r in rows],
                                                dtype="int64"),
                             "sig": [r[1] for r in rows]})

    sig_pd = docs.map_batches(sigs, batch_format="pandas").to_pandas()
    lut = {d: np.frombuffer(s, dtype=np.uint64)
           for d, s in zip(sig_pd["doc_id"], sig_pd["sig"])}
    out = pairs[["id_a", "id_b"]].copy()
    out["n_eq_slots"] = pd.array(
        [int((lut[a] == lut[b]).sum())
         for a, b in zip(pairs["id_a"], pairs["id_b"])], dtype="int64")
    return out


QUERIES.update({"q_minhash_est": q_minhash_est})


# ---------------------------------------------------------------------------
# Composite-key join: lineitem x orders on (orderkey, status)
# ---------------------------------------------------------------------------
def q_composite_join(sf_dir: str):
    """Two-column equality join: lineitem rows whose line status equals
    their order's status, revenue per status — exercises hash_join's
    composite keys (ordered-tuple bucket hash + multi-key acero join).
    Both sides project the key pair to shared names first (the join
    contract: align names, then join)."""
    from bb_ocr_ray.stages.joins import hash_join

    li = _read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linestatus", "l_extendedprice",
                 "l_discount"],
    ).map_batches(
        # integer 1e-4-dollar units (see q1: float sums drift at sf0.1)
        lambda b: pd.DataFrame(
            {"okey": b["l_orderkey"], "status": b["l_linestatus"],
             "revenue_u": _round_sql(b["l_extendedprice"] * 100.0, 0)
             .astype("int64")
             * (100 - _round_sql(b["l_discount"] * 100.0, 0)
                .astype("int64"))}),
        batch_format="pandas")
    orders = _read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderstatus"]
    ).map_batches(
        lambda b: pd.DataFrame({"okey": b["o_orderkey"],
                                "status": b["o_orderstatus"]}),
        batch_format="pandas")
    joined = hash_join(li, orders, on=["okey", "status"])
    partials = joined.map_batches(
        lambda b: b.groupby("status", as_index=False).agg(
            revenue_u=("revenue_u", "sum"), n=("revenue_u", "size")),
        batch_format="pandas")
    out = partials.groupby("status").aggregate(
        Sum("revenue_u", alias_name="revenue_u"),
        Sum("n", alias_name="n"),
    ).to_pandas()
    out["revenue"] = _round_sql(
        out["revenue_u"].astype("int64") / 10000.0, 2)
    out["n"] = out["n"].astype("int64")
    return out.drop(columns=["revenue_u"])


QUERIES.update({"q_composite_join": q_composite_join})


# ---------------------------------------------------------------------------
# Training-data chunking: fixed token windows with stride (flat_map)
# ---------------------------------------------------------------------------
def q_chunk_docs(sf_dir: str, window: int = 32, stride: int = 24):
    """Split each document into token windows of ``window`` tokens at
    ``stride`` spacing (overlap = window - stride) — the standard LLM
    training-prep chunker, expressed as a 1->N batch expansion.  Chunk
    starts are every stride-th token position, so every token lands in
    at least one chunk; empty docs produce none.  Doc-local: one
    map_batches, NO shuffle."""
    from bb_ocr_ray.functions.hashing import ws_tokens

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def chunk(b: pd.DataFrame) -> pd.DataFrame:
        ids, cids, texts, ntoks = [], [], [], []
        for d, t in zip(b["doc_id"], b["text"]):
            tk = ws_tokens(t or "")
            for ci, s in enumerate(range(0, len(tk), stride), start=1):
                w = tk[s:s + window]
                ids.append(int(d))
                cids.append(ci)
                texts.append(" ".join(w))
                ntoks.append(len(w))
        return pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "chunk_id": pd.array(cids, dtype="int64"),
            "chunk_text": pd.array(texts, dtype="object"),
            "n_tok": pd.array(ntoks, dtype="int64")})

    # returned as a STREAMING Dataset: chunks are corpus-sized (unlike
    # the decontamination report), so the consumer decides whether to
    # write or aggregate them — never materialized here
    return ds.map_batches(chunk, batch_format="pandas")


QUERIES.update({"q_chunk_docs": q_chunk_docs})


# ---------------------------------------------------------------------------
# Full outer join: two sparse per-user aggregates, either side survives
# ---------------------------------------------------------------------------
def q_full_join(sf_dir: str):
    """Full outer join (hash_join how="full"): click counts of
    even-id users x purchase counts of div-by-3-id users — the
    disjoint predicates guarantee unmatched rows on BOTH sides, which
    survive with zeroed counts (aggregate-then-join, as in
    q_left_join)."""
    from bb_ocr_ray.stages.joins import hash_join

    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "event_type"])

    def side(etype: str, mod: int, out_col: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b[(b["event_type"] == etype) & (b["user_id"] % mod == 0)]
            g = b.groupby("user_id", as_index=False).agg(
                **{out_col: ("event_type", "size")})
            return g

        def final(b: pd.DataFrame) -> pd.DataFrame:
            return b.groupby("user_id", as_index=False).agg(
                **{out_col: (out_col, "sum")})

        # bounded partial set -> one-task final aggregate +
        # materialize (see q_left_join for both rationales)
        return (ev.map_batches(fn, batch_format="pandas")
                .repartition(1)
                .map_batches(final, batch_format="pandas",
                             batch_size=None)
                .materialize())

    clicks = side("click", 2, "n_clicks")
    purchases = side("purchase", 3, "n_purchases")
    out = hash_join(clicks, purchases, on="user_id",
                    how="full").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["n_clicks"] = out["n_clicks"].fillna(0).astype("int64")
    out["n_purchases"] = out["n_purchases"].fillna(0).astype("int64")
    return out


QUERIES.update({"q_full_join": q_full_join})


# ---------------------------------------------------------------------------
# Flagship training-data prep: quality -> dedup -> decontam -> chunk
# ---------------------------------------------------------------------------
def q_training_prep(sf_dir: str):
    """END-TO-END training-data preparation as ONE streaming pipeline
    over the documents corpus:

      1. quality filter   — keep docs with >= 10 whitespace tokens
                            (and exclude the eval set doc_id%50==0);
      2. exact dedup      — keep the min doc_id per md5(text)
                            (`stages.dedup.dedup_exact`);
      3. decontamination  — drop docs sharing any 8-token shingle with
                            the eval set (shingle set broadcast once);
      4. chunking         — 32-token windows at stride 24 (counted,
                            not materialized);
      5. summary          — per-source surviving docs / chunks /
                            tokens (partial agg, tiny final groupby).

    Every stage streams; nothing corpus-sized touches the driver."""
    import functools

    import ray

    from bb_ocr_ray.functions.hashing import md5_hex, shingle_set, ws_tokens
    from bb_ocr_ray.stages.dedup import dedup_exact

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text", "source"])
    sh8 = functools.partial(shingle_set, k=8)

    eval_pd = docs.map_batches(lambda b: b[b["doc_id"] % 50 == 0],
                               batch_format="pandas").to_pandas()
    eval_sh = set().union(*map(sh8, eval_pd["text"])) \
        if len(eval_pd) else set()
    ref = ray.put(eval_sh)

    def qual_and_hash(b: pd.DataFrame) -> pd.DataFrame:
        keep = [d % 50 != 0 and len(ws_tokens(t or "")) >= 10
                for d, t in zip(b["doc_id"], b["text"])]
        b = b[pd.Series(keep, index=b.index)].copy()
        b["content_hash"] = [md5_hex(t or "") for t in b["text"]]
        return b

    qual = docs.map_batches(qual_and_hash, batch_format="pandas")
    survivors = dedup_exact(qual, key="content_hash",
                            order_col="doc_id")

    def decon(b: pd.DataFrame) -> pd.DataFrame:
        es = ray.get(ref)
        keep = [not (sh8(t) & es) if es else True for t in b["text"]]
        return b[pd.Series(keep, index=b.index)]

    clean = survivors.map_batches(decon, batch_format="pandas")

    def chunk_stats(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for s, t in zip(b["source"], b["text"]):
            n = len(ws_tokens(t or ""))
            rows.append((s, 1, (n - 1) // 24 + 1 if n else 0, n))
        df = pd.DataFrame(rows, columns=["source", "n_docs", "n_chunks",
                                         "n_tokens"])
        return df.groupby("source", as_index=False).sum()

    out = (
        clean.map_batches(chunk_stats, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_chunks", alias_name="n_chunks"),
                   Sum("n_tokens", alias_name="n_tokens"))
        .to_pandas()
    )
    for c in ("n_docs", "n_chunks", "n_tokens"):
        out[c] = out[c].astype("int64")
    return out


QUERIES.update({"q_training_prep": q_training_prep})


# ---------------------------------------------------------------------------
# Read-level predicate pushdown ("prune at the read" as a query)
# ---------------------------------------------------------------------------
def q_pushdown_filter(sf_dir: str):
    """The quantity predicate is evaluated INSIDE the parquet scan
    (``filter=`` pushes to the fragment reader; row-group statistics
    prune whole groups), so filtered-out rows never enter the object
    store — unlike q6's post-read mask.  Q6-shaped aggregate on the
    pushed-down subset."""
    import pyarrow.compute as pc

    ds = _read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_quantity", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_quantity") < 10.0),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # integer 1e-4-dollar units (see q1: float sums drift at sf0.1)
        rev_u = (_round_sql(b["l_extendedprice"] * 100.0, 0)
                 .astype("int64")
                 * (100 - _round_sql(b["l_discount"] * 100.0, 0)
                    .astype("int64"))).sum()
        return pd.DataFrame({"n": [len(b)],
                             "revenue_u": pd.Series([rev_u],
                                                    dtype="int64")})

    agg = (ds.map_batches(partial, batch_format="pandas")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("revenue_u", alias_name="revenue_u")))
    return pd.DataFrame({"n": pd.array([agg["n"]], dtype="int64"),
                         "revenue": [float(_round_sql(
                             int(agg["revenue_u"]) / 10000.0, 2))]})


# ---------------------------------------------------------------------------
# Inverted index build (search-index shape)
# ---------------------------------------------------------------------------
def q_inverted_index(sf_dir: str):
    """Inverted index for the 10 highest-document-frequency tokens:
    token -> '|'-joined doc-id posting list in ascending order.  Scale
    shape: document frequencies come from the bounded counts
    aggregate FIRST; only the winning tokens' (token, doc_id) pairs
    survive a broadcast filter into the 10-group ordered fold — the
    full vocabulary never becomes a map_groups key."""
    import ray

    from bb_ocr_ray.functions.hashing import ws_tokens

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c = Counter()
        for t in b["text"]:
            c.update(set(ws_tokens(t or "")))
        return pd.DataFrame({"tok": list(c.keys()),
                             "df": pd.array(list(c.values()),
                                            dtype="int64")})

    # Two corpus passes instead of one pinned (doc_id, tok) table: the
    # pair table is CORPUS-sized (every distinct token of every doc),
    # so materializing it to feed two consumers is the pin-vs-reread
    # trade paragraph_dedup's docstring argues against.  Pass 1 folds
    # to per-batch Counter partials (vocabulary-bounded shuffle);
    # pass 2 re-tokenizes and emits ONLY the 10 winners' pairs — the
    # second shuffle moves 10 posting lists, never the vocabulary.
    df_counts = coarse_agg(
        docs.map_batches(df_partial, batch_format="pandas"),
        ["tok"], {"df": ("df", "sum")},
    ).to_pandas()
    df_counts["df"] = df_counts["df"].astype("int64")
    top = (df_counts.sort_values(["df", "tok"], ascending=[False, True],
                                 kind="mergesort").head(10))
    top_ref = ray.put(frozenset(top["tok"]))

    def winner_pairs(b: pd.DataFrame) -> pd.DataFrame:
        winners = ray.get(top_ref)
        ids, tks = [], []
        for d, t in zip(b["doc_id"], b["text"]):
            for tok in set(ws_tokens(t or "")) & winners:
                ids.append(int(d))
                tks.append(tok)
        return pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                             "tok": pd.array(tks, dtype="object")})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(int(d) for d in g["doc_id"])
        return pd.DataFrame({"tok": [g["tok"].iloc[0]],
                             "df": pd.array([len(ids)], dtype="int64"),
                             "postings": ["|".join(map(str, ids))]})

    return (docs.map_batches(winner_pairs, batch_format="pandas")
            .groupby("tok").map_groups(fold, batch_format="pandas"))


QUERIES.update({"q_pushdown_filter": q_pushdown_filter,
                "q_inverted_index": q_inverted_index})


# ---------------------------------------------------------------------------
# PII detection + redaction (training-data hygiene transform)
# ---------------------------------------------------------------------------
def q_pii_redact(sf_dir: str):
    """Redact emails / international phone numbers / IPv4 literals from
    every document and count each category.  Pure per-row transform —
    one map_batches, zero shuffle, the ideal 100-TB shape: compiled
    patterns live in module scope (compiled once per worker process,
    not per batch), and the value-hash gate proves the redacted TEXT is
    byte-identical to the RE2 cascade in the oracle, not just the
    counts.  Pattern-parity rules in ``functions/pii.py``."""
    from bb_ocr_ray.functions.pii import redact_text

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def redact(b: pd.DataFrame) -> pd.DataFrame:
        out = [redact_text(t) for t in b["text"]]
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "clean_text": [r[0] for r in out],
            "n_emails": pd.array([r[1] for r in out], dtype="int64"),
            "n_phones": pd.array([r[2] for r in out], dtype="int64"),
            "n_ips": pd.array([r[3] for r in out], dtype="int64")})

    return ds.map_batches(redact, batch_format="pandas")


QUERIES.update({"q_pii_redact": q_pii_redact})


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (sub-document dedup granularity)
# ---------------------------------------------------------------------------
def q_paragraph_dedup(sf_dir: str):
    """Remove every repeated paragraph corpus-wide (first global
    occurrence by (doc_id, idx) wins, later copies dropped — including
    intra-document repeats) and re-emit each document's surviving
    text.  On the single-paragraph synthetic corpus this degenerates
    to whole-doc exact dedup; the edge fixture exercises the real
    multi-paragraph sharing.  Scale shape in
    ``stages.dedup.paragraph_dedup``: two coarse-bucket shuffles
    (paragraph hash, then doc id), paragraph text shuffled once,
    value-hash gate covers the reconstructed text byte-for-byte."""
    from bb_ocr_ray.stages.dedup import paragraph_dedup

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return paragraph_dedup(docs, id_col="doc_id", text_col="text")


QUERIES.update({"q_paragraph_dedup": q_paragraph_dedup})


def q_dup_spans(sf_dir: str):
    """Exact duplicated-substring statistics (Lee et al. ExactSubstr at
    fixed window size): per doc, how many 8-token windows exist and how
    many of them are duplicated anywhere in the corpus (within-doc
    repeats count — the synthetic megadocs repeat their body 8x, so
    they arrive fully duplicated).  Integer-only output; scale shape in
    ``stages.dedup.dup_span_stats`` (two coarse-bucket shuffles, 16-hex
    window hashes travel, never window text)."""
    from bb_ocr_ray.stages.dedup import dup_span_stats

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return dup_span_stats(docs, k=8)


QUERIES.update({"q_dup_spans": q_dup_spans})


# ---------------------------------------------------------------------------
# TF-IDF: top-3 scored terms per document
# ---------------------------------------------------------------------------
def q_tfidf(sf_dir: str, topk: int = 3):
    """Top-3 TF-IDF terms per document.  Two corpus passes, ZERO
    per-doc shuffle: pass 1 builds document frequencies (per-batch
    distinct-per-doc Counter partial -> vocabulary-sized groupby, the
    q_doc_freq shape), the df map is broadcast once via ray.put, and
    pass 2 re-tokenizes each doc and ranks locally.  Tokenizing twice
    trades pure CPU for not shuffling (doc_id, tok, tf) rows per doc
    — at 100 TB the per-doc shuffle (or a corpus-sized materialize
    feeding two consumers) loses to a second pruned read.
    Cross-engine determinism: the RANKING key is the integer triple
    (tf desc, df asc, tok asc) — never the float score, which only
    decorates the output (round 6, absorbed by the gate's rounding).
    Bounded-vocabulary assumption documented: the df map must fit one
    worker's heap (hundreds of MB at web scale after stopword-level
    truncation; this corpus: tiny)."""
    import math
    from collections import Counter

    import ray

    from bb_ocr_ray.functions.hashing import ws_tokens

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = ds.count()

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in b["text"]:
            c.update(set(ws_tokens(t or "")))
        return pd.DataFrame({"tok": list(c.keys()),
                             "df": pd.array(list(c.values()), dtype="int64")})

    df_pd = coarse_agg(
        ds.map_batches(df_partial, batch_format="pandas"),
        ["tok"], {"df": ("df", "sum")},
    ).to_pandas()
    df_ref = ray.put(dict(zip(df_pd["tok"], (int(x) for x in df_pd["df"]))))

    def rank(b: pd.DataFrame) -> pd.DataFrame:
        dfm = ray.get(df_ref)
        ids, toks, tfs, dfs, scores = [], [], [], [], []
        for d, t in zip(b["doc_id"], b["text"]):
            tf = Counter(ws_tokens(t or ""))
            top = sorted(tf.items(),
                         key=lambda kv: (-kv[1], dfm[kv[0]], kv[0]))[:topk]
            for tok, c in top:
                ids.append(int(d))
                toks.append(tok)
                tfs.append(c)
                dfs.append(dfm[tok])
                scores.append(float(_round_sql(
                    c * math.log(n_docs / dfm[tok]), 6)))
        return pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "tok": pd.array(toks, dtype="object"),
            "tf": pd.array(tfs, dtype="int64"),
            "df": pd.array(dfs, dtype="int64"),
            "score": pd.array(scores, dtype="float64")})

    return ds.map_batches(rank, batch_format="pandas")


QUERIES.update({"q_tfidf": q_tfidf})


# ---------------------------------------------------------------------------
# Bloom-filter register state (mergeable membership sketch)
# ---------------------------------------------------------------------------
def q_bloom_registers(sf_dir: str):
    """Set bit positions of a 512-bit / 3-hash Bloom filter built over
    every order's customer key — the register-state-as-output pattern
    of q_hll_registers applied to the join layer's membership filter
    (``stages.joins.build_bloom`` is the production consumer; this
    md5-only variant is the SQL-mirrorable cousin, see
    ``hashing.bloom_positions_u64``).  Per-batch partial bitmaps are
    64-byte numpy arrays OR-merged on the driver — the mergeable-
    sketch shape: shuffle bytes are O(batches × 64 B), never O(keys)."""
    import ray.data  # noqa: F401  (Dataset already imported)

    from bb_ocr_ray.functions.hashing import _BLOOM_BITS, bloom_positions_u64

    ds = _read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(_BLOOM_BITS, dtype=bool)
        for k in b["o_custkey"]:
            if pd.isna(k):
                continue
            for p in bloom_positions_u64(str(int(k))):
                bits[p] = True
        return pd.DataFrame({"bits": [np.packbits(bits).tobytes()]})

    merged = np.zeros(_BLOOM_BITS // 8, dtype=np.uint8)
    for part in ds.map_batches(partial,
                               batch_format="pandas").to_pandas()["bits"]:
        merged |= np.frombuffer(part, dtype=np.uint8)
    pos = np.nonzero(np.unpackbits(merged))[0]
    return pd.DataFrame({"bit_pos": pd.array(pos, dtype="int64")})


# ---------------------------------------------------------------------------
# Deterministic train/val/test split assignment
# ---------------------------------------------------------------------------
def q_train_split(sf_dir: str):
    """Hash-based 90/5/5 train/val/test assignment over documents with
    per-(split, source) doc and char counts — the canonical
    training-data partitioning step.  Assignment is a pure function of
    doc_id (stable md5 bucket % 100), so it is reproducible across
    runs, machines, and engines — never random state.  Per-batch
    partial -> one-task final groupby (bounded: 3 × |sources| keys)."""
    from bb_ocr_ray.functions.hashing import stable_u64

    ds = _read_parquet(_t(sf_dir, "documents"),
                       columns=["doc_id", "source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        buck = np.array([stable_u64(str(int(d))) % 100 for d in b["doc_id"]],
                        dtype=np.int64)
        split = np.where(buck < 90, "train",
                         np.where(buck < 95, "val", "test"))
        g = (b.assign(split=split)
             .groupby(["split", "source"], as_index=False)
             .agg(n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum")))
        return g

    def final(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["split", "source"], as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
        g["n_docs"] = g["n_docs"].astype("int64")
        g["sum_chars"] = g["sum_chars"].astype("int64")
        return g

    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


QUERIES.update({"q_bloom_registers": q_bloom_registers,
                "q_train_split": q_train_split})


# ---------------------------------------------------------------------------
# Unigram LM cross-entropy scoring (CCNet-style quality filter)
# ---------------------------------------------------------------------------
def q_lm_score(sf_dir: str):
    """Per-document cross-entropy under a corpus-trained unigram LM —
    the shape of CCNet's perplexity quality filter with the KenLM
    5-gram swapped for a unigram model (no LM artifacts in this env;
    the Ray plumbing — train pass, broadcast model, score pass — is
    identical).  Pass 1 builds corpus token counts (per-batch Counter
    partial -> vocabulary-sized groupby, the q_doc_freq shape with
    multiplicity), the model is broadcast ONCE via ray.put, and pass 2
    re-tokenizes and scores each doc locally: zero per-doc shuffle,
    same two-pass tradeoff as q_tfidf.  Bounded-vocabulary assumption:
    the count map must fit one worker's heap.  Empty/NULL-text docs
    produce no row (no tokens to score).  Float note: the per-doc sum
    of ln() terms accumulates ~1e-13 error across engines — absorbed
    by the gate's round-6."""
    import math
    from collections import Counter

    import ray

    from bb_ocr_ray.functions.hashing import ws_tokens

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def tc_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in b["text"]:
            c.update(ws_tokens(t or ""))
        return pd.DataFrame({"tok": list(c.keys()),
                             "c": pd.array(list(c.values()), dtype="int64")})

    tc_pd = coarse_agg(
        ds.map_batches(tc_partial, batch_format="pandas"),
        ["tok"], {"c": ("c", "sum")},
    ).to_pandas()
    n_total = int(tc_pd["c"].sum())
    model_ref = ray.put(dict(zip(tc_pd["tok"], (int(x) for x in tc_pd["c"]))))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        model = ray.get(model_ref)
        ids, ntoks, ces = [], [], []
        for d, t in zip(b["doc_id"], b["text"]):
            tf = Counter(ws_tokens(t or ""))
            n = sum(tf.values())
            if n == 0:
                continue
            lp = sum(c * math.log(model[tok] / n_total)
                     for tok, c in tf.items())
            ids.append(int(d))
            ntoks.append(n)
            ces.append(float(_round_sql(-lp / n, 6)))
        return pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "n_tok": pd.array(ntoks, dtype="int64"),
            "cross_entropy": pd.array(ces, dtype="float64")})

    return ds.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# Sequence packing (concat-and-split, GPT-style training prep)
# ---------------------------------------------------------------------------
def q_pack_sequences(sf_dir: str, seq_len: int = 64):
    """Concat-and-split sequence packing: within each source, token
    streams are concatenated in doc_id order and cut into fixed
    ``seq_len`` sequences (documents straddle cuts — the GPT
    pre-training packing discipline, vs first-fit bin packing which is
    neither order-stable nor SQL-mirrorable).  Emits one row per
    (source, seq_id): how many docs contributed and the sequence's
    token count (= seq_len except the tail).  Packing is inherently
    sequential per stream, so the unit of parallelism is the stream:
    ``groupby(source).map_groups`` gives each source one task that
    sorts by doc_id and does integer cumsum arithmetic — at 100 TB the
    stream key is the SHARD (source × shard_id), keeping groups
    worker-sized; a giant single source here would serialize, and
    that's a property of the semantics, not the plan.  Integer-exact:
    no floats anywhere.  Zero-token and NULL-text docs contribute
    nothing (they'd otherwise claim a phantom slot in whichever
    sequence the cursor is on)."""
    from bb_ocr_ray.functions.hashing import ws_tokens

    ds = _read_parquet(_t(sf_dir, "documents"),
                       columns=["doc_id", "source", "text"])

    def count_toks(b: pd.DataFrame) -> pd.DataFrame:
        n = pd.array([len(ws_tokens(t or "")) for t in b["text"]],
                     dtype="int64")
        out = pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                            "source": b["source"].fillna("").astype(object),
                            "n": n})
        return out[out["n"] > 0]

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        n = g["n"].to_numpy(dtype=np.int64)
        st = np.cumsum(n) - n                     # start offset per doc
        first = st // seq_len                     # first seq touched
        last = (st + n - 1) // seq_len            # last seq touched
        total = int(n.sum())
        n_seqs = (total + seq_len - 1) // seq_len
        # docs-per-seq via difference array (vectorized interval add)
        diff = np.zeros(n_seqs + 1, dtype=np.int64)
        np.add.at(diff, first, 1)
        np.add.at(diff, last + 1, -1)
        n_docs = np.cumsum(diff[:-1])
        seq_id = np.arange(n_seqs, dtype=np.int64)
        n_tok = np.minimum(seq_len, total - seq_id * seq_len)
        return pd.DataFrame({
            "source": pd.array([g["source"].iloc[0]] * n_seqs,
                               dtype="object"),
            "seq_id": pd.array(seq_id, dtype="int64"),
            "n_docs": pd.array(n_docs, dtype="int64"),
            "n_tok": pd.array(n_tok, dtype="int64")})

    return (ds.map_batches(count_toks, batch_format="pandas")
            .groupby("source")
            .map_groups(pack, batch_format="pandas"))


# ---------------------------------------------------------------------------
# Per-source quota cap (deterministic hash-rank downsampling)
# ---------------------------------------------------------------------------
def q_domain_quota(sf_dir: str, quota: int = 50):
    """Cap each source at ``quota`` documents chosen by ascending
    stable md5 hash of doc_id — the per-domain downsampling step every
    crawl pipeline runs so no single site dominates the training mix.
    Hash-rank selection is a reproducible "random" sample (pure
    function of doc_id, no RNG state).  Per-batch partial keeps only
    its local top-``quota`` per source plus (count, char-sum) totals,
    so the merge task sees O(sources × quota) candidate rows, never
    the corpus — the bounded-aggregate shape of q_train_split with a
    top-k twist.  Output per source: n_total, n_kept, sum_chars_kept."""
    from bb_ocr_ray.functions.hashing import stable_u64

    ds = _read_parquet(_t(sf_dir, "documents"),
                       columns=["doc_id", "source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"].notna()].copy()
        if not len(b):
            return pd.DataFrame({
                "source": pd.array([], dtype="object"),
                "hv": pd.array([], dtype="object"),
                "doc_id": pd.array([], dtype="int64"),
                "n_chars": pd.array([], dtype="float64"),
                "n_sub": pd.array([], dtype="int64")})
        b["source"] = b["source"].fillna("").astype(object)
        # object dtype: hashes are full-width uint64 (> int64 max)
        b["hv"] = pd.array(
            [stable_u64(str(int(d))) for d in b["doc_id"]], dtype="object")
        b["n_sub"] = 1  # rows this candidate row stands for (count only)
        keep = (b.sort_values(["source", "hv", "doc_id"], kind="mergesort")
                .groupby("source", as_index=False, sort=False)
                .head(quota))
        # totals rows: candidates dropped here must still be counted
        dropped = b.loc[~b.index.isin(keep.index)]
        if len(dropped):
            tot = dropped.groupby("source", as_index=False).agg(
                n_sub=("doc_id", "size"))
            tot["hv"] = None       # sorts nowhere: never selectable
            tot["doc_id"] = -1
            tot["n_chars"] = np.nan
            keep = pd.concat([keep, tot[keep.columns]], ignore_index=True)
        return keep

    def final(b: pd.DataFrame) -> pd.DataFrame:
        cand = b[b["hv"].notna()].copy()
        kept = (cand.sort_values(["source", "hv", "doc_id"],
                                 kind="mergesort")
                .groupby("source", as_index=False, sort=False)
                .head(quota))
        out = b.groupby("source", as_index=False).agg(
            n_total=("n_sub", "sum"))
        ks = kept.groupby("source", as_index=False).agg(
            n_kept=("doc_id", "size"),
            sum_chars_kept=("n_chars", "sum"))
        out = out.merge(ks, on="source", how="left")
        out["n_total"] = out["n_total"].astype("int64")
        out["n_kept"] = out["n_kept"].fillna(0).astype("int64")
        out["sum_chars_kept"] = (
            out["sum_chars_kept"].fillna(0).astype("int64"))
        return out

    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


# ---------------------------------------------------------------------------
# C4-style line-level filtering
# ---------------------------------------------------------------------------
_ASCII_LOWER = str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ",
                             "abcdefghijklmnopqrstuvwxyz")


def q_line_filter(sf_dir: str, min_words: int = 3):
    """C4's line-level cleaning rules as a doc-local batch transform:
    a line survives iff (after stripping ASCII space/tab/CR) it ends
    in terminal punctuation [.!?"], has >= ``min_words`` words, and
    does not mention 'javascript' (C4 drops boilerplate JS warnings).
    Emits per doc: total lines, kept lines, and the char length of the
    newline-rejoined cleaned text.  One map_batches, NO shuffle — the
    ideal 100-TB operator shape.  Cross-engine determinism: the
    case-fold for the javascript test is an explicit A-Z->a-z
    translate (Python .lower()/SQL lower() disagree on exotic unicode
    case maps, cf. detect_lang), the strip set and the word splitter
    '[ \\t\\r\\f\\v]+' are shared ASCII classes, and lengths are code
    points on both engines."""
    import re

    word_re = re.compile("[ \t\r\f\v]+")

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def clean(b: pd.DataFrame) -> pd.DataFrame:
        ids, nl, nk, nc = [], [], [], []
        for d, t in zip(b["doc_id"], b["text"]):
            if pd.isna(d):
                continue
            lines = (t or "").split("\n")
            kept_len = 0
            kept = 0
            for raw in lines:
                s = raw.strip(" \t\r")
                if not s or s[-1] not in '.!?"':
                    continue
                if "javascript" in s.translate(_ASCII_LOWER):
                    continue
                if len([w for w in word_re.split(s) if w]) < min_words:
                    continue
                kept += 1
                kept_len += len(s)
            ids.append(int(d))
            nl.append(len(lines))
            nk.append(kept)
            nc.append(kept_len + max(0, kept - 1))
        return pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "n_lines": pd.array(nl, dtype="int64"),
            "n_kept": pd.array(nk, dtype="int64"),
            "n_chars_kept": pd.array(nc, dtype="int64")})

    return ds.map_batches(clean, batch_format="pandas")


# ---------------------------------------------------------------------------
# Per-label embedding centroids
# ---------------------------------------------------------------------------
def q_centroids(sf_dir: str):
    """Per-label mean embedding in long form (label, dim, n_vecs,
    mean_val) — the assignment-free half of a k-means iteration and
    the class-prototype builder for embedding-space analytics.
    Per-batch partial: one float64 sum vector + count per label
    (mergeable, O(labels × 64) per batch regardless of batch size);
    final merge in one bounded task.  Accumulation is float64 even
    though storage is float32 — cast is exact, and cross-engine sum
    order differs by ~1e-13, absorbed by round-6."""
    ds = _read_parquet(_t(sf_dir, "embeddings"),
                       columns=["label", "embedding"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        sums: dict = {}
        counts: dict = {}
        for lab, emb in zip(b["label"], b["embedding"]):
            if emb is None or (isinstance(emb, float) and pd.isna(emb)):
                continue
            v = np.asarray(emb, dtype=np.float64)
            key = None if pd.isna(lab) else int(lab)
            if key in sums:
                sums[key] += v
                counts[key] += 1
            else:
                sums[key] = v.copy()
                counts[key] = 1
        labs, dims, ns, ss = [], [], [], []
        for key, v in sums.items():
            d = len(v)
            labs.extend([key] * d)
            dims.extend(range(1, d + 1))
            ns.extend([counts[key]] * d)
            ss.extend(v)
        return pd.DataFrame({
            "label": pd.array(labs, dtype="object"),
            "dim": pd.array(dims, dtype="int64"),
            "n_vecs": pd.array(ns, dtype="int64"),
            "s": pd.array(ss, dtype="float64")})

    def final(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["label", "dim"], as_index=False, dropna=False).agg(
            n_vecs=("n_vecs", "sum"), s=("s", "sum"))
        g["n_vecs"] = g["n_vecs"].astype("int64")
        g["mean_val"] = _round_sql(g["s"] / g["n_vecs"], 6)
        # labels are non-null in every fixture; a null would need the
        # Int64 extension dtype, which the gate's canon can't compare
        g["label"] = g["label"].astype("int64")
        return g[["label", "dim", "n_vecs", "mean_val"]]

    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


QUERIES.update({"q_lm_score": q_lm_score,
                "q_pack_sequences": q_pack_sequences,
                "q_domain_quota": q_domain_quota,
                "q_line_filter": q_line_filter,
                "q_centroids": q_centroids})


# ---------------------------------------------------------------------------
# Percentile-bounds outlier filter (two-pass, exact global quantiles)
# ---------------------------------------------------------------------------
def q_outlier_filter(sf_dir: str, lo_q: float = 0.01, hi_q: float = 0.99):
    """Drop length outliers outside the corpus's exact [p1, p99] of
    n_chars — the Gopher/RefinedWeb "remove the freak documents" step.
    Exact GLOBAL quantiles over an unbounded corpus normally need a
    sort; n_chars is a bounded-cardinality integer domain, so pass 1
    builds a value histogram instead (per-batch value->count partial
    -> distinct-value-sized groupby -> driver cumsum picks the
    quantile_disc element, ceil(q*n)-1 of the sorted multiset — exact
    at any corpus size with shuffle bytes O(distinct lengths)).  The
    two scalar bounds ride into pass 2 as closure constants; pass 2 is
    a shuffle-free per-source summary (kept / below / above + kept
    char mass).  NULL lengths fall in no bucket on either engine
    (NaN comparisons and SQL FILTER agree)."""
    import math

    ds = _read_parquet(_t(sf_dir, "documents"),
                       columns=["doc_id", "source", "n_chars"])

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["n_chars"].dropna().astype("int64").value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy(dtype=np.int64),
                             "c": vc.to_numpy(dtype=np.int64)})

    # distinct n_chars values are unbounded: coarse_agg
    hist = (coarse_agg(ds.map_batches(hist_partial, batch_format="pandas"),
                       ["v"], {"c": ("c", "sum")})
            .to_pandas().sort_values("v", kind="mergesort"))
    n = int(hist["c"].sum())
    cum = hist["c"].cumsum().to_numpy()
    vals = hist["v"].to_numpy(dtype=np.int64)

    def pick(q: float) -> int:
        # quantile_disc: element at index ceil(q*n)-1 of the sorted
        # multiset == first value whose cumulative count exceeds it
        return int(vals[np.searchsorted(cum, math.ceil(q * n) - 1,
                                        side="right")])

    lo, hi = pick(lo_q), pick(hi_q)

    def summary(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["source"] = b["source"].fillna("").astype(object)
        v = b["n_chars"]
        b["n_kept"] = ((v >= lo) & (v <= hi)).astype("int64")
        b["n_low"] = (v < lo).astype("int64")
        b["n_high"] = (v > hi).astype("int64")
        b["chars_kept"] = v.where(b["n_kept"] == 1, 0)
        g = b.groupby("source", as_index=False).agg(
            n_kept=("n_kept", "sum"), n_low=("n_low", "sum"),
            n_high=("n_high", "sum"), chars_kept=("chars_kept", "sum"))
        return g

    def final(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("source", as_index=False).agg(
            n_kept=("n_kept", "sum"), n_low=("n_low", "sum"),
            n_high=("n_high", "sum"), chars_kept=("chars_kept", "sum"))
        for c in ("n_kept", "n_low", "n_high", "chars_kept"):
            g[c] = g[c].astype("int64")
        g["lo"] = np.int64(lo)
        g["hi"] = np.int64(hi)
        return g

    return (ds.map_batches(summary, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


QUERIES.update({"q_outlier_filter": q_outlier_filter})


# ---------------------------------------------------------------------------
# Sequential funnel (view -> click -> purchase), per-user stage
# ---------------------------------------------------------------------------
def q_funnel(sf_dir: str):
    """Three-step strict-order funnel: each user's furthest stage,
    where a step counts only if it occurs strictly after the PREVIOUS
    matched step in (ts, event_id) order — the earliest view, then the
    earliest click after that view, then the earliest purchase after
    that click (MATCH_RECOGNIZE-lite; greedy-earliest matching is the
    standard funnel semantics and is order-deterministic).  NULL-ts
    events can't be ordered and NULL users can't be grouped; both are
    excluded on both engines.  One
    shuffle by user_id (inherent: the match is a per-user sequential
    scan), then a linear pass per group — the sessionizer's scale
    shape.  Output: (user_id, stage 0-3)."""
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_id", "event_type"])

    steps = ("view", "click", "purchase")

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["ts"].notna()]
        if not len(g):
            return pd.DataFrame({"user_id": pd.array([], dtype="int64"),
                                 "stage": pd.array([], dtype="int64")})
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        et = g["event_type"].to_numpy()
        stage = 0
        i = 0
        for step in steps:
            nxt = np.nonzero(et[i:] == step)[0]
            if not len(nxt):
                break
            stage += 1
            i += nxt[0] + 1   # next step must come strictly after
        return pd.DataFrame({
            "user_id": pd.array([int(g["user_id"].iloc[0])], dtype="int64"),
            "stage": pd.array([stage], dtype="int64")})

    def prefilter(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["ts"].notna() & b["user_id"].notna()]

    return _grouped_per_key(
        ds.map_batches(prefilter, batch_format="pandas"), "user_id", scan)


QUERIES.update({"q_funnel": q_funnel})


# ---------------------------------------------------------------------------
# Cohort retention matrix (signup week x week offset -> distinct users)
# ---------------------------------------------------------------------------
def q_retention(sf_dir: str):
    """Weekly cohort retention: users grouped by the week of their
    first 'signup' event, counted (distinct) in every week offset
    where they have ANY activity — the canonical product-analytics
    matrix.  Week index is integer epoch-day // 7 on both engines
    (never date_trunc: week-start conventions differ across engines).
    Plan: per-batch min-signup partial -> distributed groupby-Min
    (cohort side, user-cardinality — NOT assumed to fit anywhere),
    hash_join back to the batch-deduped (user, week) activity pairs,
    then a bounded groupby over (cohort_week, offset) cells whose
    group sizes are capped by cohort size.  NULL ts/user rows are
    unorderable/ungroupable and excluded on both engines.  Offsets
    can be negative (pre-signup activity) and are reported as such."""
    from bb_ocr_ray.stages.joins import hash_join

    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_type"])

    _US_PER_DAY = 86_400_000_000

    def _wk(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["ts"].notna() & b["user_id"].notna()].copy()
        us = b["ts"].astype("datetime64[us]").astype("int64")
        b["wk"] = (us // _US_PER_DAY // 7).astype("int64")
        b["user_id"] = b["user_id"].astype("int64")
        return b

    def sign_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = _wk(b)
        b = b[b["event_type"] == "signup"]
        return (b.groupby("user_id", as_index=False)
                .agg(cohort_week=("wk", "min")))

    # user_id is row-cardinality: coarse_agg (per-group tax)
    sign = coarse_agg(
        ds.map_batches(sign_partial, batch_format="pandas"),
        ["user_id"], {"cohort_week": ("cohort_week", "min")},
    ).materialize()

    def act_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = _wk(b)
        return (b[["user_id", "wk"]].drop_duplicates()
                .rename(columns={"wk": "act_week"}))

    act = ds.map_batches(act_partial, batch_format="pandas")

    def cell_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["week_offset"] = (b["act_week"].astype("int64")
                            - b["cohort_week"].astype("int64"))
        return (b[["cohort_week", "week_offset", "user_id"]]
                .drop_duplicates())

    def cell_count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cohort_week": pd.array([int(g["cohort_week"].iloc[0])],
                                    dtype="int64"),
            "week_offset": pd.array([int(g["week_offset"].iloc[0])],
                                    dtype="int64"),
            "n_users": pd.array([g["user_id"].nunique()], dtype="int64")})

    return (hash_join(act, sign, on="user_id", how="inner")
            .map_batches(cell_partial, batch_format="pandas")
            .groupby(["cohort_week", "week_offset"])
            .map_groups(cell_count, batch_format="pandas"))


QUERIES.update({"q_retention": q_retention})


# ---------------------------------------------------------------------------
# Flagship composition #2: clean -> dedup -> quota -> split -> summary
# ---------------------------------------------------------------------------
def q_corpus_pipeline(sf_dir: str, quota: int = 50):
    """Five-stage web-corpus curation pipeline composed from this
    round's operators, one streaming lineage end-to-end:

      1. line-level clean (RefinedWeb-style short-line removal:
         keep lines with >= 15 words and no 'javascript' — the C4
         terminal-punct rule has zero signal on this corpus), drop
         docs with no surviving line, rejoin kept lines with newline;
      2. exact dedup on md5(cleaned text), keep-min-doc_id (the
         q_dedup_exact discipline) — ONE sort shuffle on the 32-char
         hash, payload never shuffled twice;
      3. per-source quota cap by stable hash rank (q_domain_quota);
      4. deterministic 90/5/5 split (q_train_split);
      5. per-(split, source) doc/char summary.

    Stages 3-5 run on bounded data (partial top-quota per batch ->
    one merge task sees O(sources x quota)); stages 1-2 are the
    corpus-sized part and are shuffle-minimal.  The oracle is one CTE
    chain over the same five stages — integer/string-exact
    throughout, so the value-hash gate covers the whole composition,
    not just the stages in isolation."""
    import re

    from bb_ocr_ray.functions.hashing import md5_hex, stable_u64

    word_re = re.compile("[ \t\r\f\v]+")

    ds = _read_parquet(_t(sf_dir, "documents"),
                       columns=["doc_id", "source", "text"])

    def clean(b: pd.DataFrame) -> pd.DataFrame:
        ids, srcs, hs, ns = [], [], [], []
        for d, src, t in zip(b["doc_id"], b["source"], b["text"]):
            if pd.isna(d):
                continue
            kept = []
            for raw in (t or "").split("\n"):
                s = raw.strip(" \t\r")
                if (s and "javascript" not in s.translate(_ASCII_LOWER)
                        and len([w for w in word_re.split(s) if w]) >= 15):
                    kept.append(s)
            if not kept:
                continue
            ctext = "\n".join(kept)
            ids.append(int(d))
            srcs.append("" if pd.isna(src) else src)
            hs.append(md5_hex(ctext))
            ns.append(len(ctext))
        return pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "source": pd.array(srcs, dtype="object"),
            "h": pd.array(hs, dtype="object"),
            "n": pd.array(ns, dtype="int64")})

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values("doc_id", kind="mergesort").head(1)
                [["doc_id", "source", "n"]])

    def quota_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["hv"] = pd.array(
            [stable_u64(str(int(d))) for d in b["doc_id"]], dtype="object")
        return (b.sort_values(["source", "hv", "doc_id"], kind="mergesort")
                .groupby("source", as_index=False, sort=False).head(quota))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        kept = (b.sort_values(["source", "hv", "doc_id"], kind="mergesort")
                .groupby("source", as_index=False, sort=False)
                .head(quota).copy())
        buck = np.array([stable_u64(str(int(d))) % 100
                         for d in kept["doc_id"]], dtype=np.int64)
        kept["split"] = np.where(buck < 90, "train",
                                 np.where(buck < 95, "val", "test"))
        g = kept.groupby(["split", "source"], as_index=False).agg(
            n_docs=("doc_id", "size"), sum_chars=("n", "sum"))
        g["n_docs"] = g["n_docs"].astype("int64")
        g["sum_chars"] = g["sum_chars"].astype("int64")
        return g

    out = (_grouped_per_key(
               ds.map_batches(clean, batch_format="pandas"), "h", keep_min)
           .map_batches(quota_partial, batch_format="pandas")
           .repartition(1)
           .map_batches(finish, batch_format="pandas", batch_size=None)
           .to_pandas())
    if not len(out.columns):
        # all-empty Datasets lose their schema through to_pandas();
        # the output is report-shaped (splits x sources), so the
        # typed-empty driver-side fallback is the repo convention
        out = pd.DataFrame({"split": pd.array([], dtype="object"),
                            "source": pd.array([], dtype="object"),
                            "n_docs": pd.array([], dtype="int64"),
                            "sum_chars": pd.array([], dtype="int64")})
    return out


QUERIES.update({"q_corpus_pipeline": q_corpus_pipeline})


# ---------------------------------------------------------------------------
# Character-level Shannon entropy (quality signal)
# ---------------------------------------------------------------------------
def q_char_entropy(sf_dir: str):
    """Per-document Shannon entropy over code points, plus the
    distinct-char count — the Gopher-family "gibberish / binary
    spill" quality signal (natural text sits ~3.5-4.5 bits; base64
    blobs and repeated-char padding fall far outside).  Doc-local,
    one map_batches, NO shuffle.  entropy = log2(n) - (1/n) * sum
    c*log2(c) over char counts c — the engine folds per DISTINCT char
    while the oracle sums per occurrence; both accumulate ~1e-13
    float error, absorbed by round-6.  Empty/NULL docs emit no row
    (entropy of nothing is undefined, not zero)."""
    import math
    from collections import Counter

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def ent(b: pd.DataFrame) -> pd.DataFrame:
        ids, ns, nd, es = [], [], [], []
        for d, t in zip(b["doc_id"], b["text"]):
            if pd.isna(d) or not t:
                continue
            c = Counter(t)
            n = len(t)
            h = math.log2(n) - sum(v * math.log2(v)
                                   for v in c.values()) / n
            ids.append(int(d))
            ns.append(n)
            nd.append(len(c))
            es.append(float(_round_sql(h, 6)))
        return pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "n_chars": pd.array(ns, dtype="int64"),
            "n_distinct": pd.array(nd, dtype="int64"),
            "entropy": pd.array(es, dtype="float64")})

    return ds.map_batches(ent, batch_format="pandas")


QUERIES.update({"q_char_entropy": q_char_entropy})


# ---------------------------------------------------------------------------
# Count-Min-sketch heavy hitters (frequency sketch + exact verify)
# ---------------------------------------------------------------------------
def q_cms_heavy_hitters(sf_dir: str):
    """Heavy hitters over events.user_id via a Count-Min sketch
    (Cormode & Muthukrishnan 2005) with an exact verify pass — the
    missing member of the repo's mergeable-sketch family (MinHash /
    SimHash / HLL / Bloom).

    Pass A (ONE scan): each batch emits (a) its local DEPTH x WIDTH
    register partial — np.add.at over the batch's UNIQUE keys
    weighted by their local counts, so hashing cost is per unique
    key, not per row — and (b) its local heavy-hitter candidates
    (local_count * 125 >= local_n).  Pigeonhole: a key with global
    count >= n/125 must clear that bar in at least one batch, so
    candidate recall is exactly 1 without ever shuffling the key
    space.  Registers (4096 ints) and candidates (<= key
    cardinality) are bounded, so they finish in one repartition(1)
    task (the repo's bounded-aggregate pattern).

    Pass B: exact counts for the est-surviving candidates only —
    the sketch prunes the verify shuffle to heavy rows; the final
    filter is on the TRUE count, so the answer is exact while
    est_count (min over rows of the merged registers, >= true by
    construction) is reported alongside and oracle-checked
    integer-exactly.

    Distribution note: phi = 1/125 names 13 of 150 users at sf0.01;
    the synthetic corpus is UNIFORM with key cardinality growing with
    sf, so at sf0.1 (1500 users, mean count n/1500) no key reaches
    n/125 and the correct answer is empty — verified empty AGAINST
    THE ORACLE, not silently.  The planted-flood unit test covers the
    skewed case the sketch exists for."""
    from bb_ocr_ray.functions.hashing import (_CMS_DEPTH, _CMS_WIDTH,
                                              cms_buckets)

    PHI_DEN = 125  # heavy hitter := count * PHI_DEN >= n_total

    ds = _read_parquet(_t(sf_dir, "events"), columns=["user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].dropna().astype("int64")
        empty = pd.DataFrame({
            "kind": pd.array([], dtype="object"),
            "i": pd.array([], dtype="int64"),
            "b": pd.array([], dtype="int64"),
            "c": pd.array([], dtype="int64"),
            "key": pd.array([], dtype="int64")})
        if not len(u):
            return empty
        keys, counts = np.unique(u.to_numpy(), return_counts=True)
        reg = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
        for k, c in zip(keys, counts):
            bks = cms_buckets(str(int(k)))
            for i in range(_CMS_DEPTH):
                reg[i, bks[i]] += int(c)
        nz_i, nz_b = np.nonzero(reg)
        local_n = int(counts.sum())
        cand = keys[counts * PHI_DEN >= local_n]
        out = pd.DataFrame({
            "kind": np.concatenate([np.repeat("reg", len(nz_i)),
                                    np.repeat("cand", len(cand))]),
            "i": np.concatenate([nz_i.astype(np.int64),
                                 np.zeros(len(cand), dtype=np.int64)]),
            "b": np.concatenate([nz_b.astype(np.int64),
                                 np.zeros(len(cand), dtype=np.int64)]),
            "c": np.concatenate([reg[nz_i, nz_b],
                                 np.zeros(len(cand), dtype=np.int64)]),
            "key": np.concatenate([np.zeros(len(nz_i), dtype=np.int64),
                                   cand.astype(np.int64)])})
        return out

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        # Register rows sum across batches; candidate rows (i = -1,
        # key in "key") dedup to the union of local heavy hitters.
        r = b[b["kind"] == "reg"]
        g = r.groupby(["i", "b"], as_index=False)["c"].sum()
        cand = np.unique(b.loc[b["kind"] == "cand", "key"].to_numpy())
        return pd.DataFrame({
            "i": np.concatenate([g["i"].to_numpy(dtype=np.int64),
                                 np.full(len(cand), -1, dtype=np.int64)]),
            "b": np.concatenate([g["b"].to_numpy(dtype=np.int64),
                                 np.zeros(len(cand), dtype=np.int64)]),
            "c": np.concatenate([g["c"].to_numpy(dtype=np.int64),
                                 np.zeros(len(cand), dtype=np.int64)]),
            "key": np.concatenate([np.zeros(len(g), dtype=np.int64),
                                   cand.astype(np.int64)])})

    state = (ds.map_batches(partial, batch_format="pandas")
             .repartition(1)
             .map_batches(merge, batch_format="pandas", batch_size=None)
             .to_pandas())
    if not len(state):
        return pd.DataFrame({
            "user_id": pd.array([], dtype="int64"),
            "est_count": pd.array([], dtype="int64"),
            "true_count": pd.array([], dtype="int64")})

    reg = np.zeros((_CMS_DEPTH, _CMS_WIDTH), dtype=np.int64)
    rr = state[state["i"] >= 0]
    reg[rr["i"].to_numpy(), rr["b"].to_numpy()] = rr["c"].to_numpy()
    n_total = int(reg[0].sum())
    cands = sorted(int(x) for x in state.loc[state["i"] < 0, "key"])

    def est(k: int) -> int:
        bks = cms_buckets(str(k))
        return int(min(reg[i, bks[i]] for i in range(_CMS_DEPTH)))

    survivors = [k for k in cands if est(k) * PHI_DEN >= n_total]
    if not survivors:
        return pd.DataFrame({
            "user_id": pd.array([], dtype="int64"),
            "est_count": pd.array([], dtype="int64"),
            "true_count": pd.array([], dtype="int64")})

    # Pass B: exact counts for survivors only (bounded by |survivors|).
    keep = set(survivors)

    def exact_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].dropna().astype("int64")
        u = u[u.isin(keep)]
        if not len(u):
            return pd.DataFrame({"user_id": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        k, c = np.unique(u.to_numpy(), return_counts=True)
        return pd.DataFrame({"user_id": k.astype(np.int64),
                             "n": c.astype(np.int64)})

    def exact_merge(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("user_id", as_index=False)["n"].sum()
        g["user_id"] = g["user_id"].astype("int64")
        g["n"] = g["n"].astype("int64")
        return g

    truec = (ds.map_batches(exact_partial, batch_format="pandas")
             .repartition(1)
             .map_batches(exact_merge, batch_format="pandas",
                          batch_size=None)
             .to_pandas())
    tmap = dict(zip(truec["user_id"], truec["n"]))
    rows = [(k, est(k), int(tmap.get(k, 0))) for k in survivors
            if int(tmap.get(k, 0)) * PHI_DEN >= n_total]
    return pd.DataFrame(rows, columns=["user_id", "est_count",
                                       "true_count"]).astype("int64")


QUERIES.update({"q_cms_heavy_hitters": q_cms_heavy_hitters})


# ---------------------------------------------------------------------------
# Window rank per partition (SQL rank() OVER semantics, ties included)
# ---------------------------------------------------------------------------
def q_rank_window(sf_dir: str):
    """Top-3-ranked suppliers by account balance within each nation —
    rank() OVER (PARTITION BY ... ORDER BY ... DESC) with SQL tie
    semantics (equal balances share a rank; the next rank skips), so
    boundary ties can return MORE than 3 rows per nation.  Distinct
    from q_topk_per_group, which is row-limit top-k without a rank
    column.

    Shape: one groupby(s_nationkey).map_groups — partition key is the
    shuffle key, rank is computed group-locally via pandas
    rank(method="min") (== SQL rank()) — then the nation name comes
    from a broadcast dim lookup, never a second shuffle."""
    from bb_ocr_ray.stages.joins import broadcast_join

    sup = _read_parquet(
        _t(sf_dir, "supplier"),
        columns=["s_nationkey", "s_name", "s_acctbal"])

    def rnk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=["s_acctbal"])
        if not len(g):
            return pd.DataFrame({
                "s_nationkey": pd.array([], dtype="int64"),
                "s_name": pd.array([], dtype="object"),
                "s_acctbal": pd.array([], dtype="float64"),
                "rnk": pd.array([], dtype="int64")})
        out = g.copy()
        out["rnk"] = (out["s_acctbal"]
                      .rank(method="min", ascending=False)
                      .astype("int64"))
        out = out[out["rnk"] <= 3]
        return out[["s_nationkey", "s_name", "s_acctbal", "rnk"]]

    ranked = sup.groupby("s_nationkey").map_groups(
        rnk, batch_format="pandas")
    dim = _read_parquet(_t(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    dim = dim.rename(columns={"n_nationkey": "s_nationkey"})
    out = broadcast_join(ranked, dim, on="s_nationkey").to_pandas()
    out["s_acctbal"] = _round_sql(out["s_acctbal"].astype("float64"), 2)
    out = (out[["n_name", "s_name", "s_acctbal", "rnk"]]
           .sort_values(["n_name", "rnk", "s_name"])
           .reset_index(drop=True))
    return out


# ---------------------------------------------------------------------------
# Cross join (cartesian product via broadcast replication)
# ---------------------------------------------------------------------------
def q_cross_join(sf_dir: str):
    """region x nation cartesian product — the small side is put in
    the object store ONCE and replicated per batch with np.repeat /
    np.tile (each big-side batch of B rows expands to B x |small|
    rows inside the task, so the product streams and no shuffle
    happens).  At 100 TB the big side streams block-by-block and the
    broadcast side must be driver-small — the same contract as every
    broadcast join in the repo."""
    import ray

    nat = _read_parquet(_t(sf_dir, "nation"), columns=["n_name"])
    reg = _read_parquet(_t(sf_dir, "region"),
                        columns=["r_name"]).to_pandas()
    reg_ref = ray.put(reg["r_name"].to_numpy())

    def cross(b: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(reg_ref)
        return pd.DataFrame({
            "r_name": np.tile(r, len(b)),
            "n_name": np.repeat(b["n_name"].to_numpy(), len(r))})

    return (nat.map_batches(cross, batch_format="pandas")
            .sort(["r_name", "n_name"]))


QUERIES.update({"q_rank_window": q_rank_window,
                "q_cross_join": q_cross_join})


# ---------------------------------------------------------------------------
# Distributed set ops: INTERSECT / EXCEPT (tag -> union -> flag groupby)
# ---------------------------------------------------------------------------
def _set_op_users(sf_dir: str, keep: str):
    """Shared core of q_intersect / q_except: distinct click-users vs
    distinct BIG-purchase users (purchase with value > 90 — every user
    has every event type in the synthetic corpus, so a plain
    purchase right side would make EXCEPT vacuously empty).  Each side
    streams a per-batch DISTINCT partial with a side flag; the union
    shuffles only (key, flag_a, flag_b) distinct partials — one
    groupby on the key with Max flags, never the raw rows — then a
    flag filter picks the set op.  At scale the shuffle payload is
    bounded by key cardinality x blocks, the same combiner argument
    as q_dedup_exact."""
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id"])
        a = np.unique(
            b.loc[b["event_type"] == "click", "user_id"].to_numpy())
        p = np.unique(
            b.loc[(b["event_type"] == "purchase")
                  & (b["value"] > 90), "user_id"].to_numpy())
        keys = np.union1d(a, p)
        return pd.DataFrame({
            "user_id": keys.astype(np.int64),
            "in_a": np.isin(keys, a).astype(np.int64),
            "in_b": np.isin(keys, p).astype(np.int64)})

    flags = coarse_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"],
        {"in_a": ("in_a", "max"), "in_b": ("in_b", "max")},
    ).to_pandas()
    if not len(flags):
        return pd.DataFrame({"user_id": pd.array([], dtype="int64")})
    if keep == "intersect":
        out = flags[(flags["in_a"] == 1) & (flags["in_b"] == 1)]
    else:
        out = flags[(flags["in_a"] == 1) & (flags["in_b"] == 0)]
    return (out[["user_id"]].astype("int64")
            .sort_values("user_id").reset_index(drop=True))


def q_intersect(sf_dir: str):
    """Distinct users present in BOTH the click and purchase streams —
    SQL INTERSECT as a distributed tag-union-flag groupby (no
    driver-side sets, no pairwise join)."""
    return _set_op_users(sf_dir, "intersect")


def q_except(sf_dir: str):
    """Distinct users in the click stream but NOT the purchase stream —
    SQL EXCEPT via the same one-shuffle flag machinery as
    q_intersect (an anti-join restricted to distinct keys)."""
    return _set_op_users(sf_dir, "except")


# ---------------------------------------------------------------------------
# Approximate quantiles from the mergeable histogram sketch
# ---------------------------------------------------------------------------
def q_quantile_sketch(sf_dir: str):
    """p50/p90/p99 PER event_type estimated from the same fixed-bin
    histogram sketch as q_value_histogram — the scale path for
    quantiles (exact per-group percentiles need a per-group sort;
    the sketch is one additive shuffle of <=20 ints per group per
    block).  The estimate is the smallest bin whose cumulative count
    reaches ceil(q*n) — deterministic integer logic the oracle
    mirrors with integer cross-multiplication (cum * 2 >= n etc.),
    so the result is value-hash exact, not approximately compared.
    NULL values are excluded on both sides."""
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_type", "value"])
    lo, hi, nbins = 0.0, 100.0, 20

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["value"].notna()]
        b = np.clip(((batch["value"] - lo) / (hi - lo) * nbins).astype(int),
                    0, nbins - 1)
        df = pd.DataFrame({"event_type": batch["event_type"], "bin": b,
                           "n": 1})
        return df.groupby(["event_type", "bin"], as_index=False).sum()

    hist = (ds.map_batches(partial, batch_format="pandas")
            .groupby(["event_type", "bin"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())
    if not len(hist):
        return pd.DataFrame({
            "event_type": pd.array([], dtype="object"),
            "p50_bin": pd.array([], dtype="int64"),
            "p90_bin": pd.array([], dtype="int64"),
            "p99_bin": pd.array([], dtype="int64"),
            "n": pd.array([], dtype="int64")})

    rows = []
    for et, g in hist.groupby("event_type"):
        g = g.sort_values("bin")
        cum = g["n"].cumsum().to_numpy()
        bins = g["bin"].to_numpy()
        tot = int(cum[-1])
        def pick(num, den):
            # smallest bin with cum * den >= num * tot  (== ceil logic)
            return int(bins[np.argmax(cum * den >= num * tot)])
        rows.append((et, pick(1, 2), pick(9, 10), pick(99, 100), tot))
    return (pd.DataFrame(rows, columns=["event_type", "p50_bin",
                                        "p90_bin", "p99_bin", "n"])
            .sort_values("event_type").reset_index(drop=True))


QUERIES.update({"q_intersect": q_intersect,
                "q_except": q_except,
                "q_quantile_sketch": q_quantile_sketch})


# ---------------------------------------------------------------------------
# Deterministic global shuffle (hash-order training-data reordering)
# ---------------------------------------------------------------------------
def q_pseudo_shuffle(sf_dir: str):
    """Reproducible global shuffle for training-data ordering: sort by
    md5('shuf1|' || doc_id) — a seeded hash order that is identical
    across runs, partition layouts and engines, unlike
    random_shuffle() whose permutation depends on block boundaries.
    At scale this is ONE deterministic range-partitioned sort (the
    same cost as any global sort) and changing the seed string
    reshuffles every epoch.  Returns the first 100 docs of the
    shuffled order with their sort rank."""
    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["doc_id"])
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "h": [md5_hex(f"shuf1|{int(d)}") for d in b["doc_id"]]})

    head = (ds.map_batches(keyed, batch_format="pandas")
            .sort("h").limit(100).to_pandas())
    head["rank"] = np.arange(1, len(head) + 1, dtype=np.int64)
    return head


QUERIES.update({"q_pseudo_shuffle": q_pseudo_shuffle})


# ---------------------------------------------------------------------------
# Grouped linear regression / correlation (mergeable moment sketches)
# ---------------------------------------------------------------------------
def q_regression(sf_dir: str):
    """Per-event-type OLS of value against hour-of-day via the six
    mergeable moments (n, sum_x, sum_y, sum_xx, sum_yy, sum_xy) — the
    canonical distributed-statistics pattern: each batch collapses to
    one moment row per group, the shuffle carries only moments, and
    slope/intercept/corr are derived after the merge.  Float
    summation-order drift between engine and oracle is absorbed by
    round-6 (documented determinism convention).  Groups never have
    zero x-variance in the fixtures; a production guard would emit
    NULL like regr_slope does."""
    ds = _read_parquet(_t(sf_dir, "events"), columns=["event_type",
                                                      "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value"].notna() & b["ts"].notna()]
        if not len(b):
            return pd.DataFrame({
                "event_type": pd.array([], dtype="object"),
                **{c: pd.array([], dtype="float64")
                   for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}})
        x = b["ts"].dt.hour.to_numpy(dtype=np.float64)
        y = b["value"].to_numpy(dtype=np.float64)
        g = pd.DataFrame({"event_type": b["event_type"], "x": x, "y": y,
                          "xx": x * x, "yy": y * y, "xy": x * y,
                          "one": 1.0})
        agg = g.groupby("event_type", as_index=False).sum()
        return agg.rename(columns={"one": "n", "x": "sx", "y": "sy",
                                   "xx": "sxx", "yy": "syy",
                                   "xy": "sxy"})

    def final(b: pd.DataFrame) -> pd.DataFrame:
        m = b.groupby("event_type", as_index=False)[
            ["n", "sx", "sy", "sxx", "syy", "sxy"]].sum()
        n = m["n"]
        cov = m["n"] * m["sxy"] - m["sx"] * m["sy"]
        varx = m["n"] * m["sxx"] - m["sx"] ** 2
        vary = m["n"] * m["syy"] - m["sy"] ** 2
        slope = cov / varx
        return pd.DataFrame({
            "event_type": m["event_type"],
            "n": n.astype("int64"),
            "slope": _round_sql(slope, 6),
            "intercept": _round_sql((m["sy"] - slope * m["sx"]) / n, 6),
            "corr_xy": _round_sql(cov / np.sqrt(varx * vary), 6)})

    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None)
            .sort("event_type"))


# ---------------------------------------------------------------------------
# Grouped mode (most frequent value, deterministic tie-break)
# ---------------------------------------------------------------------------
def q_mode(sf_dir: str):
    """Most frequent floor(value) per event_type — the mode aggregate
    as a two-level count: per-batch (group, value) counts bound the
    shuffle by value cardinality x groups, then one groupby-sum and a
    deterministic argmax (highest count, smallest value on ties —
    QUALIFY row_number() mirror)."""
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["value"].notna()]
        if not len(b):
            return pd.DataFrame({
                "event_type": pd.array([], dtype="object"),
                "v": pd.array([], dtype="int64"),
                "n": pd.array([], dtype="int64")})
        g = pd.DataFrame({
            "event_type": b["event_type"],
            "v": np.floor(b["value"].to_numpy()).astype(np.int64),
            "n": 1})
        return g.groupby(["event_type", "v"], as_index=False).sum()

    def final(b: pd.DataFrame) -> pd.DataFrame:
        m = b.groupby(["event_type", "v"], as_index=False)["n"].sum()
        m = m.sort_values(["event_type", "n", "v"],
                          ascending=[True, False, True])
        top = m.groupby("event_type", as_index=False).first()
        return pd.DataFrame({
            "event_type": top["event_type"],
            "mode_value": top["v"].astype("int64"),
            "n_mode": top["n"].astype("int64")})

    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None)
            .sort("event_type"))


QUERIES.update({"q_regression": q_regression, "q_mode": q_mode})


# ---------------------------------------------------------------------------
# Global consecutive row numbering (distributed zipWithIndex)
# ---------------------------------------------------------------------------
def q_zip_index(sf_dir: str):
    """Assign globally consecutive row numbers in doc_id order — the
    zipWithIndex primitive Ray Data lacks, built scalably: a min/max
    pre-pass sizes the bucket width so the bucket COUNT is bounded at
    ~2^16 regardless of key range (a fixed width would put
    key_range/width offsets on the driver — 2e9 entries at 10^12
    docs); pass 2 collapses each batch to a per-bucket count
    histogram, the driver prefix-sums the ≤65k bucket offsets, and
    pass 3 shuffles once by bucket so each group sorts locally and
    emits offset[bucket] + local rank.  No global sort of the data
    itself and nothing row-sized ever on the driver.  Requires unique
    keys (doc_id is); ties would need a declared total order."""
    import ray

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def mm(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].dropna()
        if not len(d):
            return pd.DataFrame({"lo": pd.array([], dtype="int64"),
                                 "hi": pd.array([], dtype="int64")})
        return pd.DataFrame({"lo": [int(d.min())], "hi": [int(d.max())]})

    bounds = (ds.map_batches(mm, batch_format="pandas")
              .repartition(1)
              .map_batches(lambda b: b if not len(b) else pd.DataFrame(
                  {"lo": [int(b["lo"].min())], "hi": [int(b["hi"].max())]}),
                  batch_format="pandas", batch_size=None)
              .to_pandas())
    if not len(bounds):
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "row_id": pd.array([], dtype="int64")})
    BUCKET = max(512, (int(bounds["hi"][0]) - int(bounds["lo"][0])) // 65536)

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].dropna().astype("int64")
        if not len(d):
            return pd.DataFrame({"bucket": pd.array([], dtype="int64"),
                                 "n": pd.array([], dtype="int64")})
        k, c = np.unique(d.to_numpy() // BUCKET, return_counts=True)
        return pd.DataFrame({"bucket": k.astype(np.int64),
                             "n": c.astype(np.int64)})

    h = (ds.map_batches(hist, batch_format="pandas")
         .repartition(1)
         .map_batches(lambda b: b.groupby("bucket", as_index=False).sum(),
                      batch_format="pandas", batch_size=None)
         .to_pandas())
    if not len(h):
        return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                             "row_id": pd.array([], dtype="int64")})
    h = h.sort_values("bucket")
    offsets = dict(zip(h["bucket"].astype(int),
                       np.concatenate([[0], h["n"].cumsum().to_numpy()[:-1]])))
    off_ref = ray.put(offsets)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].dropna().astype("int64")
        return pd.DataFrame({"doc_id": d,
                             "bucket": (d // BUCKET).astype("int64")})

    def number(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values("doc_id").reset_index(drop=True)
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "row_id": np.arange(off + 1, off + len(g) + 1,
                                dtype=np.int64)})

    return (ds.map_batches(tag, batch_format="pandas")
            .groupby("bucket")
            .map_groups(number, batch_format="pandas"))


QUERIES.update({"q_zip_index": q_zip_index})


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (importance sampling for data mixing)
# ---------------------------------------------------------------------------
def q_weighted_sample(sf_dir: str):
    """Length-proportional importance sampling — each document is kept
    with probability min(n_chars, 9999)/10000, decided by comparing a
    seeded md5 draw (stable_u64('ws|' || doc_id) mod 10000) against
    its own weight.  The draw is integer-exact and per-row, so the
    sample is reproducible across runs, partition layouts and engines
    (the mixing-weights analog of q_hash_sample; swap n_chars for any
    quality/temperature weight column).  One streaming map, no
    shuffle.  The registry wrapper materializes driver-side only to
    give the legitimately-empty sample (low-weight corpora — the edge
    fixture) a typed schema: an all-empty Dataset loses its schema
    through to_pandas (repo convention); the `keep` primitive itself
    streams."""
    from bb_ocr_ray.functions.hashing import stable_u64

    ds = _read_parquet(_t(sf_dir, "documents"),
                       columns=["doc_id", "n_chars"])

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["doc_id"])
        if not len(b):
            return pd.DataFrame({
                "doc_id": pd.array([], dtype="int64"),
                "n_chars": pd.array([], dtype="int64"),
                "draw": pd.array([], dtype="int64")})
        d = b["doc_id"].astype("int64")
        draw = np.fromiter(
            (stable_u64(f"ws|{int(x)}") % 10000 for x in d),
            dtype=np.int64, count=len(d))
        w = np.minimum(b["n_chars"].fillna(0).astype("int64"), 9999)
        m = draw < w
        return pd.DataFrame({
            "doc_id": d[m],
            # mask BEFORE the int cast: a NULL n_chars row can never be
            # kept (weight coalesces to 0) but casting the whole column
            # first raises on the non-finite value.
            "n_chars": b["n_chars"][m].astype("int64"),
            "draw": draw[m]})

    out = ds.map_batches(keep, batch_format="pandas").to_pandas()
    if not len(out.columns):
        out = pd.DataFrame({
            "doc_id": pd.array([], dtype="int64"),
            "n_chars": pd.array([], dtype="int64"),
            "draw": pd.array([], dtype="int64")})
    return out


QUERIES.update({"q_weighted_sample": q_weighted_sample})


# ---------------------------------------------------------------------------
# ntile window: per-partition quantile bucket assignment
# ---------------------------------------------------------------------------
def q_ntile(sf_dir: str):
    """Quartile assignment per event_type (ntile(4) OVER (PARTITION BY
    event_type ORDER BY value, event_id)) summarized per bucket — the
    remaining window-family member after rank/row_number/lag/first:
    SQL ntile splits each n-row partition into k runs where the first
    n mod k runs get the extra row; the engine reproduces that exact
    split group-locally after the partition shuffle.  Output is the
    per-bucket count and value range (round-4), not the 10k raw
    assignments."""
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_id", "event_type", "value"])

    def tiles(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["value"].notna()].sort_values(["value", "event_id"])
        n = len(g)
        if not n:
            return pd.DataFrame({
                "event_type": pd.array([], dtype="object"),
                "quartile": pd.array([], dtype="int64"),
                "n": pd.array([], dtype="int64"),
                "min_value": pd.array([], dtype="float64"),
                "max_value": pd.array([], dtype="float64")})
        k = 4
        base, extra = divmod(n, k)
        sizes = [base + 1] * extra + [base] * (k - extra)
        q = np.repeat(np.arange(1, k + 1, dtype=np.int64), sizes)[:n]
        g = g.assign(quartile=q)
        out = g.groupby("quartile", as_index=False).agg(
            n=("value", "size"), min_value=("value", "min"),
            max_value=("value", "max"))
        out["event_type"] = g["event_type"].iloc[0]
        out["min_value"] = _round_sql(out["min_value"], 4)
        out["max_value"] = _round_sql(out["max_value"], 4)
        out["n"] = out["n"].astype("int64")
        return out[["event_type", "quartile", "n",
                    "min_value", "max_value"]]

    return (ds.groupby("event_type")
            .map_groups(tiles, batch_format="pandas")
            .sort(["event_type", "quartile"]))


QUERIES.update({"q_ntile": q_ntile})


# ---------------------------------------------------------------------------
# Calendar densification (gap-filled hourly series)
# ---------------------------------------------------------------------------
def q_densify_hours(sf_dir: str):
    """Zero-filled hourly event counts per type — the time-series
    densification step downstream dashboards/models need (a groupby
    emits only OBSERVED hours; forecasting wants the gaps as explicit
    zero rows).  The distributed part is the same partial+groupby as
    q_events_hourly; the grid join happens driver-side because the
    grid is aggregate-sized (types x hours), never row-sized.  Hours
    are epoch-second int64 (repo convention: unit-independent across
    engines)."""
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_type", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["ts"].notna()]
        if not len(batch):
            return pd.DataFrame({
                "event_type": pd.array([], dtype="object"),
                "hour_epoch": pd.array([], dtype="int64"),
                "n": pd.array([], dtype="int64")})
        hour = ((batch["ts"].dt.floor("h") - pd.Timestamp("1970-01-01"))
                .dt.total_seconds().astype("int64"))
        return (batch.assign(hour_epoch=hour, n=1)
                .groupby(["event_type", "hour_epoch"], as_index=False)
                ["n"].sum())

    # hour buckets grow with the corpus time span: coarse_agg
    agg = coarse_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "hour_epoch"], {"n": ("n", "sum")},
    ).to_pandas()
    if not len(agg):
        return pd.DataFrame({
            "event_type": pd.array([], dtype="object"),
            "hour_epoch": pd.array([], dtype="int64"),
            "n": pd.array([], dtype="int64")})
    lo, hi = int(agg["hour_epoch"].min()), int(agg["hour_epoch"].max())
    hours = np.arange(lo, hi + 1, 3600, dtype=np.int64)
    types = sorted(agg["event_type"].unique())
    grid = pd.DataFrame({
        "event_type": np.repeat(types, len(hours)),
        "hour_epoch": np.tile(hours, len(types))})
    out = grid.merge(agg, on=["event_type", "hour_epoch"], how="left")
    out["n"] = out["n"].fillna(0).astype("int64")
    out["hour_epoch"] = out["hour_epoch"].astype("int64")
    return out.sort_values(["event_type", "hour_epoch"]).reset_index(
        drop=True)


QUERIES.update({"q_densify_hours": q_densify_hours})


# ---------------------------------------------------------------------------
# Event-sequence transition counts (sequential pattern mining input)
# ---------------------------------------------------------------------------
def q_transitions(sf_dir: str):
    """Global counts of adjacent event-type transitions per user
    (prev -> curr in (ts, event_id) order) — the first-order Markov /
    sequence-mining input.  One coarse shuffle on user_id; the ordered
    pairing is BUCKET-local and fully vectorized: sort the bucket by
    (user_id, ts, event_id), shift once, and mask rows where the user
    changes — adjacency within a user is identical to a per-user sort
    because the bucket holds each user's whole sequence, and the
    vectorized shape skips the per-key pandas tax grouped_per_key pays
    (measured 4.4 -> ~1 s at sf0.1 with 1500 users).  The transition
    vocabulary (|types|^2) bounds the per-bucket output, so the final
    groupby moves at most 25 partial rows per bucket."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_id",
                                "event_type"])
    n_buckets = _auto_num_buckets()

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id"]).copy()
        b["__coarse"] = _bucket_ids(b, ["user_id"], n_buckets)
        return b

    _EMPTY = {"prev_type": pd.array([], dtype="object"),
              "next_type": pd.array([], dtype="object"),
              "n": pd.array([], dtype="int64")}

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame(_EMPTY)
        out = (pd.DataFrame({"prev_type": et[:-1][same],
                             "next_type": et[1:][same]})
               .groupby(["prev_type", "next_type"], as_index=False)
               .size().rename(columns={"size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    out = (ds.map_batches(stamp, batch_format="pandas")
           .groupby("__coarse").map_groups(bucket_pairs,
                                           batch_format="pandas")
           .groupby(["prev_type", "next_type"])
           .aggregate(Sum("n", alias_name="n"))
           .to_pandas())
    if not len(out):
        return pd.DataFrame({
            "prev_type": pd.array([], dtype="object"),
            "next_type": pd.array([], dtype="object"),
            "n": pd.array([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["prev_type", "next_type"]).reset_index(
        drop=True)


QUERIES.update({"q_transitions": q_transitions})


# ---------------------------------------------------------------------------
# Percent-of-total (window share over a grand total)
# ---------------------------------------------------------------------------
def q_share_of_total(sf_dir: str):
    """Revenue share per order status — x / sum(x) OVER () as a
    distributed aggregate: one integer-cent partial+groupby (see q1),
    then the share division happens on the aggregate-sized result
    where the grand total is exact, so the percentages are the same
    IEEE doubles the oracle computes from the same integers."""
    ds = _read_parquet(_t(sf_dir, "orders"),
                       columns=["o_orderstatus", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(rev_c=_round_sql(
            b["o_totalprice"] * 100.0, 0).astype("int64"))
        return b.groupby("o_orderstatus", as_index=False).agg(
            rev_c=("rev_c", "sum"), n_orders=("rev_c", "size"))

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("o_orderstatus")
           .aggregate(Sum("rev_c", alias_name="rev_c"),
                      Sum("n_orders", alias_name="n_orders"))
           .to_pandas())
    total = int(out["rev_c"].sum())
    out["revenue"] = _round_sql(out["rev_c"].astype("int64") / 100.0, 2)
    out["share_pct"] = _round_sql(
        100.0 * out["rev_c"].astype("int64") / total, 4)
    out["n_orders"] = out["n_orders"].astype("int64")
    return (out[["o_orderstatus", "n_orders", "revenue", "share_pct"]]
            .sort_values("o_orderstatus").reset_index(drop=True))


QUERIES.update({"q_share_of_total": q_share_of_total})


# ---------------------------------------------------------------------------
# Unpivot (wide -> long melt), inverse of q_pivot_events
# ---------------------------------------------------------------------------
def q_unpivot(sf_dir: str):
    """Melt the distributed pivot back to long (user_id, event_type,
    n) rows, dropping the zero cells the pivot introduced — the
    UNPIVOT relational op as an np.repeat/tile expansion.  Here it
    runs driver-side because q_pivot_events already returns its
    aggregate-sized frame (one wide row per user); on a row-sized
    wide Dataset the identical expansion goes inside map_batches
    (each wide row of k columns -> <=k long rows per task, streaming,
    no shuffle).  Oracle = the original long counts, so the round
    trip pivot∘unpivot == identity is what the gate checks."""
    types = ["click", "error", "purchase", "signup", "view"]
    cols = [f"n_{t}" for t in types]
    wide = q_pivot_events(sf_dir)

    vals = wide[cols].to_numpy(dtype=np.int64)
    users = np.repeat(wide["user_id"].to_numpy(dtype=np.int64),
                      len(types))
    etypes = np.tile(np.array(types, dtype=object), len(wide))
    n = vals.ravel()
    m = n > 0
    return (pd.DataFrame({"user_id": users[m], "event_type": etypes[m],
                          "n": n[m]})
            .sort_values(["user_id", "event_type"])
            .reset_index(drop=True))


QUERIES.update({"q_unpivot": q_unpivot})


# ---------------------------------------------------------------------------
# BM25 relevance scoring (retrieval / data-selection op)
# ---------------------------------------------------------------------------
def q_bm25(sf_dir: str):
    """BM25 top-20 docs for a deterministic 3-term query (the 3 highest
    document-frequency tokens, ties token-asc) — the retrieval /
    quality-selection scorer a training-data pipeline runs over a
    corpus (k1=1.2, b=0.75, the Robertson idf with +1).

    Shape: two aggregate passes (corpus stats fold to one row per
    batch; df is the q_doc_freq pattern), the 3 terms + constants
    broadcast in the task closure, then one scoring map with per-batch
    partial top-20 — nothing row-sized reaches the driver.  The float
    fold over terms is in FIXED term order on both sides; avglen is
    exact-integer-sum / count so the division is bit-identical to the
    oracle's CAST(sum() AS DOUBLE)/count(*)."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens

    k1, b = 1.2, 0.75
    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats_partial(bt: pd.DataFrame) -> pd.DataFrame:
        lens = [len(ws_tokens(t or "")) for t in bt["text"]]
        return pd.DataFrame({"n": pd.array([len(lens)], dtype="int64"),
                             "toks": pd.array([int(np.sum(lens)) if lens
                                               else 0], dtype="int64")})

    st = ds.map_batches(stats_partial, batch_format="pandas").to_pandas()
    n_docs = int(st["n"].sum())
    avglen = int(st["toks"].sum()) / n_docs

    def df_partial(bt: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in bt["text"]:
            c.update(set(ws_tokens(t or "")))
        return pd.DataFrame({"token": list(c.keys()),
                             "df": pd.array(list(c.values()),
                                            dtype="int64")})

    # the token vocabulary is unbounded: coarse_agg (per-group tax)
    dft = coarse_agg(
        ds.map_batches(df_partial, batch_format="pandas"),
        ["token"], {"df": ("df", "sum")},
    ).to_pandas()
    dft["df"] = dft["df"].astype("int64")
    top = dft.sort_values(["df", "token"], ascending=[False, True],
                          kind="mergesort").head(3)
    terms = list(top["token"])
    idf = {t: float(np.log((n_docs - int(d) + 0.5) / (int(d) + 0.5) + 1.0))
           for t, d in zip(top["token"], top["df"])}

    def score_partial(bt: pd.DataFrame) -> pd.DataFrame:
        ids, scores = [], []
        for did, t in zip(bt["doc_id"], bt["text"]):
            tk = ws_tokens(t or "")
            n_tok = len(tk)
            s = 0.0
            if n_tok:
                norm = k1 * (1 - b + b * n_tok / avglen)
                for q in terms:        # fixed fold order (oracle mirrors)
                    tf = tk.count(q)
                    if tf:
                        s += idf[q] * tf * (k1 + 1) / (tf + norm)
            ids.append(int(did))
            scores.append(s)
        out = pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                            "score": _round_sql(
                                pd.Series(scores, dtype="float64"), 4)})
        return out.sort_values(["score", "doc_id"],
                               ascending=[False, True],
                               kind="mergesort").head(20)

    parts = (ds.map_batches(score_partial, batch_format="pandas")
             .to_pandas())          # <=20 rows per batch: driver-sized
    return (parts.sort_values(["score", "doc_id"],
                              ascending=[False, True], kind="mergesort")
            .head(20).reset_index(drop=True))


QUERIES.update({"q_bm25": q_bm25})


# ---------------------------------------------------------------------------
# URL canonicalization dedup (crawl-frontier hygiene)
# ---------------------------------------------------------------------------
def q_url_dedup(sf_dir: str):
    """Canonical-URL dedup over deterministically synthesized noisy
    URLs: each doc_id yields one raw URL with crawl noise (uppercase
    scheme/host, default :80 port on every third, and one of four
    suffix shapes — utm_source tracking param, fbclid click id, a
    fragment, or clean), the engine canonicalizes
    (functions.scalars.canonical_url) and groups.  The oracle derives
    the EXPECTED canonical string independently from the same doc_id
    arithmetic — a genuine differential on the parser: any
    canonicalization bug breaks the string equality or the group
    counts.  One streaming map + one small groupby (canonical-url
    cardinality), the per-url dedup shape every crawl pipeline runs."""
    from bb_ocr_ray.functions.scalars import canonical_url

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def noisy_and_canonical(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].astype("int64")
        raw = []
        for x in d:
            x = int(x)
            base = (f"HTTP://Site{x % 7}.Example.COM"
                    + (":80" if x % 3 == 0 else "") + f"/path{x % 5}")
            suffix = (f"?utm_source=x&id={x % 10}",
                      f"?id={x % 10}&fbclid=abc",
                      f"#frag{x}", "")[x % 4]
            raw.append(base + suffix)
        return pd.DataFrame(
            {"canonical_url": [canonical_url(u) for u in raw],
             "doc_id": d})

    # canonical urls are row-cardinality: coarse_agg (per-group tax)
    out = coarse_agg(
        ds.map_batches(noisy_and_canonical, batch_format="pandas"),
        ["canonical_url"],
        {"n_docs": ("doc_id", "size"),
         "keep_doc_id": ("doc_id", "min")},
    ).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["keep_doc_id"] = out["keep_doc_id"].astype("int64")
    return out


QUERIES.update({"q_url_dedup": q_url_dedup})


# ---------------------------------------------------------------------------
# PageRank (web-graph link analysis)
# ---------------------------------------------------------------------------
def q_pagerank(sf_dir: str, iters: int = 10):
    """PageRank over a deterministic synthetic link graph: each doc
    links to 3 arithmetic targets mod (max_id + 1) — parallel edges
    kept (multiplicity), targets need not be existing docs (dangling
    sinks receive teleport mass only; leaky formulation, no dangling
    redistribution).  The graph generator stands in for a real edge
    table; the OPERATOR (``stages.graph.pagerank``) takes any (src,
    dst) edge Dataset.  Rank rounded to 6 dp (float sums drift below
    1e-12 across engines; in-degree is ~3 so association error is
    far under the rounding grain)."""
    from bb_ocr_ray.stages.graph import pagerank

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    import ray

    m = int(docs.max("doc_id")) + 1

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        # quadratic + 2-to-1 + affine: a deliberately NON-regular graph
        # (skewed in-degrees), so a wrong rank flow cannot hide behind
        # a uniform stationary distribution
        return pd.DataFrame({"src": np.repeat(d, 3),
                             "dst": np.stack([(d * d + 1) % m,
                                              (d // 2 + 7) % m,
                                              (d * 3 + 11) % m],
                                             axis=1).reshape(-1)})

    out = pagerank(docs.map_batches(edges, batch_format="pandas"),
                   iters=iters).to_pandas()
    out["rank"] = _round_sql(out["rank"], 6)
    return out.sort_values("node", kind="mergesort").reset_index(drop=True)


QUERIES.update({"q_pagerank": q_pagerank})


# ---------------------------------------------------------------------------
# Crawl snapshot diff (recrawl ops: added / removed / changed urls)
# ---------------------------------------------------------------------------
def q_crawl_diff(sf_dir: str):
    """Diff two crawl snapshots by url.  Snapshot A = every doc;
    snapshot B is derived deterministically: docs with
    ``doc_id % 7 == 0`` dropped (removed pages), docs with
    ``doc_id % 5 == 0`` get a changed content hash (re-crawled, new
    bytes), and synthetic new urls appear for ``doc_id % 11 == 0``
    (one new page per such doc, url suffixed ``-new``).  Output: one
    row per url in either snapshot with status added / removed /
    changed / same — the recrawl bookkeeping query, exercising the
    bucketed FULL OUTER join at url (row) cardinality.  Content
    identity is md5(text) (A) vs md5(text + '!') for the changed
    subset (B)."""
    from bb_ocr_ray.stages.joins import hash_join

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def side_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "url": [f"u{int(d)}" for d in b["doc_id"]],
            "h_a": [md5_hex(t or "") for t in b["text"]]})

    def side_b(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[b["doc_id"] % 7 != 0]
        urls = [f"u{int(d)}" for d in keep["doc_id"]]
        hs = [md5_hex((t or "") + "!") if int(d) % 5 == 0
              else md5_hex(t or "")
              for d, t in zip(keep["doc_id"], keep["text"])]
        new = b[b["doc_id"] % 11 == 0]
        urls += [f"u{int(d)}-new" for d in new["doc_id"]]
        hs += [md5_hex(f"new{int(d)}") for d in new["doc_id"]]
        return pd.DataFrame({"url": urls, "h_b": hs})

    a = docs.map_batches(side_a, batch_format="pandas")
    b = docs.map_batches(side_b, batch_format="pandas")
    j = hash_join(a, b, on="url", how="full")

    def classify(m: pd.DataFrame) -> pd.DataFrame:
        in_a = m["h_a"].notna()
        in_b = m["h_b"].notna()
        status = np.where(~in_a, "added",
                          np.where(~in_b, "removed",
                                   np.where(m["h_a"] == m["h_b"],
                                            "same", "changed")))
        return pd.DataFrame({"url": m["url"].astype(str),
                             "status": pd.array(status, dtype="object")})

    return j.map_batches(classify, batch_format="pandas")


QUERIES.update({"q_crawl_diff": q_crawl_diff})


# ---------------------------------------------------------------------------
# Out-link graph extraction (crawl graph from raw html)
# ---------------------------------------------------------------------------
def q_link_graph(sf_dir: str):
    """Out-link edge counts per (src domain, link path): REAL href
    extraction from the raw html bytes (compiled regex + RFC-3986
    urljoin, fragments dropped, duplicates kept — kernel/links.py),
    aggregated through ONE coarse shuffle.  The synthetic template
    emits a fixed anchor multiset per page ('/' twice via nav + header,
    six other paths once), so the oracle inverts the template
    arithmetically — same philosophy as the golden text extraction.
    At web scale this is the crawl-graph builder feeding
    stages/graph.pagerank."""
    from urllib.parse import urlsplit

    from bb_ocr_ray.kernel.links import extract_links
    from bb_ocr_ray.sources.pages import read_pages

    pages = read_pages(sf_dir)

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        doms, paths = [], []
        for url, html in zip(b["url"], b["html"]):
            txt = bytes(html).decode("utf-8", errors="replace")
            src = urlsplit(url).netloc
            for link in extract_links(txt, url):
                doms.append(src)
                paths.append(urlsplit(link).path)
        return pd.DataFrame({"domain": pd.array(doms, dtype="object"),
                             "path": pd.array(paths, dtype="object")})

    out = coarse_agg(
        pages.map_batches(edges, batch_format="pandas"),
        ["domain", "path"], {"n": ("path", "size")},
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


QUERIES.update({"q_link_graph": q_link_graph})


# ---------------------------------------------------------------------------
# Cross-run incremental dedup (persisted seen-set / recrawl hygiene)
# ---------------------------------------------------------------------------
def q_incremental_dedup(sf_dir: str):
    """Recrawl against a persisted seen-set: a prior run (the even
    doc_ids) built a shard-partitioned content-hash index
    (state/hash_index — the at-scale version of the reference's
    in-memory seen-set, aggregator.py:61-69); the new full crawl keeps
    one first-seen row per never-before-seen content hash.  The index
    build, the within-batch first-per-hash, and the anti-join are all
    distributed (one coarse shuffle each); the index lives on disk
    between the two phases, exactly as it would between real runs."""
    import shutil
    import tempfile

    from bb_ocr_ray.state.hash_index import (build_hash_index,
                                             incremental_dedup)

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def hashed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"content_md5": [md5_hex(t or "") for t in b["text"]],
             "doc_id": b["doc_id"].astype("int64")})

    # the (hash, id) projection is consumed by BOTH simulated runs —
    # materialize it once (two narrow int/hex columns, ~48 B/doc; in
    # real use the runs are separate processes and each hashes only
    # its own batch)
    hds = ds.map_batches(hashed, batch_format="pandas").materialize()
    prior = hds.map_batches(lambda b: b[b["doc_id"] % 2 == 0],
                            batch_format="pandas")
    tmp = tempfile.mkdtemp(prefix="hash_index_q_", dir="/tmp")
    try:
        idx = f"{tmp}/idx"
        build_hash_index(prior, idx, key="content_md5", n_shards=16)
        out = incremental_dedup(hds, idx, key="content_md5",
                                order_col="doc_id").to_pandas()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = out.rename(columns={"doc_id": "keep_doc_id"})
    out["keep_doc_id"] = out["keep_doc_id"].astype("int64")
    return (out[["content_md5", "keep_doc_id"]]
            .sort_values("content_md5").reset_index(drop=True))


QUERIES.update({"q_incremental_dedup": q_incremental_dedup})


# ---------------------------------------------------------------------------
# Corpus-LM quality scoring (CCNet-style perplexity filter)
# ---------------------------------------------------------------------------
def q_lm_quality(sf_dir: str):
    """Per-document bigram-LM log-likelihood (the scoring half of a
    CCNet/Gopher-style perplexity quality filter — Wenzek et al. 2020,
    public method): train bigram/context counts over the corpus, score
    each doc by the mean log P(w2|w1) of its bigrams.  Self-trained, so
    every doc bigram has count >= 1 (no smoothing needed; a real
    pipeline trains on a reference corpus and smooths — the operator
    shape is identical).

    Complementary to q_lm_score (unigram LM broadcast via ray.put —
    right when the model fits one worker's heap): here the model is
    bigram-sized, so counts attach to the scoring stream via
    DISTRIBUTED bucketed hash joins instead of a broadcast — the
    join-attached posture survives models that outgrow any heap.

    Scale shape (reworked after the sf0.1 sweep showed this the
    slowest query): the corpus-wide (doc, bigram) explode is computed
    TWICE (count fold + join probe) and shuffled ONCE — the context
    table cc(w1) is NOT a second corpus fold, it derives from the
    bigram-count table itself (every occurrence of bigram "w1 w2"
    contributes exactly once to both c and cc, so cc = sum of c over
    bigrams sharing w1 — a vocabulary-sized fold), and cc pre-joins
    into the count table (vocabulary-sized join on w1) so the probe
    stream attaches (c, cc) in a single hash join on bg.  Previously:
    three corpus explodes + four corpus-wide shuffles.  The model
    ASSEMBLY is size-gated: a heap-sized vocabulary builds (bg, c, cc)
    on the driver (two shuffles on a 10^3-row table are pure fixed
    overhead), a web-scale vocabulary routes to the distributed fold +
    join; the corpus-wide probe join is distributed on BOTH paths.  At 100 TB
    prune to top-V bigrams by document frequency first (the
    q_inverted_index pattern); the per-doc fold is one more
    coarse_agg.  Nothing row-unbounded on the driver.  avg_logp
    rounds to 6 dp (sum-order + libm-ulp drift is ~1e-13, far under
    the grain — the q_regression argument)."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens
    from bb_ocr_ray.stages.coarse import coarse_agg
    from bb_ocr_ray.stages.joins import hash_join

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def bigram_partials(b: pd.DataFrame) -> pd.DataFrame:
        ids, bgs, ks = [], [], []
        for d, t in zip(b["doc_id"], b["text"]):
            tk = ws_tokens(t or "")
            if len(tk) < 2:
                continue
            c = Counter(zip(tk[:-1], tk[1:]))
            for (w1, w2), k in c.items():
                ids.append(int(d))
                bgs.append(w1 + " " + w2)
                ks.append(k)
        return pd.DataFrame(
            {"doc_id": pd.array(ids, dtype="int64"),
             "bg": pd.array(bgs, dtype="object"),
             "k": pd.array(ks, dtype="int64")})

    import ray.data as rd

    from bb_ocr_ray.stages.joins import _BROADCAST_LIMIT_BYTES

    rows = ds.map_batches(bigram_partials, batch_format="pandas")
    # materialized so the assembly gate below reads real bytes; it is
    # bigram-vocabulary-sized — the LM model itself, not the corpus
    cnt = coarse_agg(rows, ["bg"], {"c": ("k", "sum")}).materialize()

    if cnt.size_bytes() <= _BROADCAST_LIMIT_BYTES:
        # vocabulary fits a heap: assemble (bg, c, cc) on the driver —
        # two shuffles on a 10^3-row table cost whole seconds of fixed
        # overhead (measured 3 s at 32 cpus).  The CORPUS-wide probe
        # join below stays distributed either way; the join-attached
        # posture this query demonstrates is the probe side, which
        # never fits a heap.
        mp = cnt.to_pandas()
        # ws_tokens splits on ASCII whitespace, so w1 never contains
        # a plain space — the first space in bg is exactly the seam
        mp["w1"] = mp["bg"].str.split(" ", n=1).str[0]
        cc = (mp.groupby("w1", as_index=False)["c"].sum()
              .rename(columns={"c": "cc"}))
        model = rd.from_pandas(
            mp.merge(cc, on="w1").drop(columns=["w1"]))
    else:
        def add_w1(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["w1"] = b["bg"].str.split(" ", n=1).str[0]
            return b

        # cnt_w1 feeds BOTH the context fold and the model join —
        # materialize so neither re-runs the corpus-wide bigram fold
        cnt_w1 = (cnt.map_batches(add_w1, batch_format="pandas")
                  .materialize())
        ctx = coarse_agg(cnt_w1, ["w1"], {"cc": ("c", "sum")})
        model = hash_join(cnt_w1, ctx, on="w1")

    j = hash_join(rows, model, on="bg")

    def lp(b: pd.DataFrame) -> pd.DataFrame:
        # explicit float64 coercion: join output columns can arrive
        # object-dtyped (schema degradation through shuffles) and
        # np.log on an object array falls back to per-element .log()
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"),
             "sum_lp": b["k"].astype("float64").to_numpy()
             * np.log(b["c"].astype("float64").to_numpy()
                      / b["cc"].astype("float64").to_numpy()),
             "n": b["k"].astype("int64")})

    out = coarse_agg(j.map_batches(lp, batch_format="pandas"),
                     ["doc_id"],
                     {"sum_lp": ("sum_lp", "sum"), "n_bigrams": ("n", "sum")}
                     ).to_pandas()
    out["n_bigrams"] = out["n_bigrams"].astype("int64")
    out["avg_logp"] = _round_sql(out["sum_lp"] / out["n_bigrams"], 6)
    return (out[["doc_id", "n_bigrams", "avg_logp"]]
            .sort_values("doc_id").reset_index(drop=True))


QUERIES.update({"q_lm_quality": q_lm_quality})


# ---------------------------------------------------------------------------
# PII scrubbing on PLANTED PII (proves the redaction cascade fires)
# ---------------------------------------------------------------------------
def _plant_pii(doc_id: int, text: str) -> str:
    """Deterministic PII synthesis from doc_id arithmetic (the
    q_pagerank/q_crawl_diff pattern — both engines derive the same
    dirty text): emails on %5, international phones on %3, IPv4 on %7.
    Phone digits are sized to functions/pii.PHONE_PAT exactly."""
    t = text or ""
    if doc_id % 5 == 0:
        t += f" contact user{doc_id}@mail{doc_id % 9}.example.com"
    if doc_id % 3 == 0:
        t += (f" call +{1 + doc_id % 98} {100 + doc_id % 900}"
              f" {100 + (doc_id * 7) % 900} {1000 + doc_id % 9000}")
    if doc_id % 7 == 0:
        t += f" from 10.{doc_id % 256}.{(doc_id * 3) % 256}.{doc_id % 100}"
    return t


def q_pii_scrub(sf_dir: str):
    """The REAL redaction cascade (functions/pii.redact_text —
    email -> phone -> IPv4, sequential, RE2-parity patterns) exercised
    on text with PLANTED PII.  q_pii_redact runs the same cascade on
    the raw corpus, which carries no PII — its value-hash gate proves
    only that clean text passes through unchanged.  This query plants
    deterministic emails/phones/IPs from doc_id arithmetic so the
    oracle verifies the cascade actually FIRES: per-category counts
    plus the md5 of the redacted text (byte-exact rewrite, not just
    counts).  One streaming map, no shuffle."""
    from bb_ocr_ray.functions.pii import redact_text

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def scrub(b: pd.DataFrame) -> pd.DataFrame:
        ids, n_em, n_ph, n_ip, digests = [], [], [], [], []
        for d, t in zip(b["doc_id"], b["text"]):
            d = int(d)
            clean, ke, kp, ki = redact_text(_plant_pii(d, t))
            ids.append(d)
            n_em.append(ke)
            n_ph.append(kp)
            n_ip.append(ki)
            digests.append(md5_hex(clean))
        return pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                             "n_emails": pd.array(n_em, dtype="int64"),
                             "n_phones": pd.array(n_ph, dtype="int64"),
                             "n_ips": pd.array(n_ip, dtype="int64"),
                             "clean_md5": pd.array(digests, dtype="object")})

    out = ds.map_batches(scrub, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES.update({"q_pii_scrub": q_pii_scrub})


# ---------------------------------------------------------------------------
# Data-mixing rebalance (downsample to the minority language)
# ---------------------------------------------------------------------------
def q_mix_balance(sf_dir: str):
    """Language-mix rebalancing (the data-mixing step of a pre-training
    pipeline): derive per-language keep probabilities that downsample
    every language to the MINORITY language's expected count, then keep
    rows by a seeded integer draw.  Unlike q_stratified_sample (fixed
    externally-given rates), the rates here are DERIVED from the data:
    p(lang) = floor(10000 * min_count / count(lang)).

    Scale shape: the per-language counts are one coarse fold
    (|langs|-sized), the rate table broadcasts as a dict, and the keep
    decision is one streaming map with the q_weighted_sample draw
    (stable_u64('mix|' || doc_id) % 10000 — integer-exact,
    reproducible across runs, layouts, and engines).  NULL langs form
    their own group ('<null>' key both sides)."""
    from bb_ocr_ray.functions.hashing import stable_u64

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def key(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"),
             "lang": b["lang"].fillna("<null>").astype(str)})

    keyed = ds.map_batches(key, batch_format="pandas")
    cnt = coarse_agg(keyed, ["lang"], {"n": ("doc_id", "size")}).to_pandas()
    mn = int(cnt["n"].min())
    rates = {l: (10000 * mn) // int(n)
             for l, n in zip(cnt["lang"], cnt["n"])}

    import ray

    rates_ref = ray.put(rates)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        r = ray.get(rates_ref)
        if not len(b):
            return b
        draw = np.fromiter(
            (stable_u64(f"mix|{int(x)}") % 10000 for x in b["doc_id"]),
            dtype=np.int64, count=len(b))
        p = b["lang"].map(r).astype("int64").to_numpy()
        return b[draw < p]

    out = keyed.map_batches(keep, batch_format="pandas").to_pandas()
    return (out.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "lang"]])


QUERIES.update({"q_mix_balance": q_mix_balance})


# ---------------------------------------------------------------------------
# Skew-salted join (hot-key mitigation; SURVEY §2.4 join family)
# ---------------------------------------------------------------------------
def q_skew_join(sf_dir: str):
    """Hot-key join through :func:`stages.joins.skew_join`: events
    (probe, every event_type is hot — 5 keys over the whole table, the
    worst case a hash-partitioned join can meet) joined to a derived
    per-type dim (built distributed and deliberately NOT broadcast:
    at web scale the build side is a domain/url dim that fits no
    heap).  Each hot key is salted across 8 buckets, so no single
    bucket owns 20% of the table.  Output per type: how many events
    exceed the type mean — the comparison is integer-exact
    (v_u * n > sum_u with v_u = round(value*1e6) as int64) so no
    float-mean boundary can drift between engines.  The join result
    is salt-invariant; the oracle is the plain join."""
    from bb_ocr_ray.stages.joins import skew_join

    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_type", "value"])

    def units(b: pd.DataFrame) -> pd.DataFrame:
        # v_u stays float64 carrying NaN for NULL values: SQL keeps the
        # row in count(*) but drops it from SUM(v_u) and evaluates the
        # above-mean predicate to NULL (-> not counted) — pandas skipna
        # sum + a NaN comparison (False) mirror all three exactly.  The
        # non-NaN values are integral floats; exact to 2^53 (~sf1e4).
        return pd.DataFrame({
            "event_type": b["event_type"].astype(object),
            "v_u": _round_sql(b["value"] * 1e6, 0).astype("float64")})

    evu = ev.map_batches(units, batch_format="pandas")
    dim = coarse_agg(evu, ["event_type"],
                     {"n_events": ("v_u", "size"), "sum_u": ("v_u", "sum")})
    j = skew_join(evu, dim, on="event_type", salt=8, hot_threshold=100)

    def above(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(above=(b["v_u"] * b["n_events"]
                            > b["sum_u"]).astype("int64"))
        return b.groupby("event_type", as_index=False).agg(
            n_events=("above", "size"), n_above=("above", "sum"))

    out = coarse_agg(
        j.map_batches(above, batch_format="pandas"),
        ["event_type"],
        {"n_events": ("n_events", "sum"), "n_above": ("n_above", "sum")},
    ).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["n_above"] = out["n_above"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


QUERIES.update({"q_skew_join": q_skew_join})


# ---------------------------------------------------------------------------
# Standalone connected components over a link graph (SURVEY §2.7 family)
# ---------------------------------------------------------------------------
def q_connected_components(sf_dir: str):
    """Distributed connected components (alternating large-star /
    small-star, Kiveris et al. 2014 — ``stages.dedup
    .connected_components_ds``) over a deterministic chain graph:
    doc d links to d+1 iff (d² + 3d) mod 11 ≥ 3 AND d+1 is a real doc
    (existence enforced by a distributed semi-join, so id gaps break
    chains on both engines).  Expected run length ~3.7 with an
    irregular tail, so convergence takes several star rounds — real
    multi-hop propagation, not one-hop lookups.  Components here are
    intervals by construction, which is what makes a WINDOW-function
    oracle possible (min-label over an arbitrary graph needs recursive
    SQL); the operator itself is exercised on arbitrary graphs by the
    near-dup differential tests.  Docs with no surviving edge are
    their own component (left join + fill)."""
    from bb_ocr_ray.stages.dedup import connected_components_ds
    from bb_ocr_ray.stages.joins import auto_semi, hash_join

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        d = d[((d * d + 3 * d) % 11) >= 3]
        return pd.DataFrame({"id_a": d, "id_b": d + 1})

    cand = docs.map_batches(edges, batch_format="pandas")
    real = auto_semi(
        cand.map_batches(lambda b: b.rename(columns={"id_b": "doc_id"}),
                         batch_format="pandas"),
        docs, on="doc_id",
    ).map_batches(lambda b: b.rename(columns={"doc_id": "id_b"}),
                  batch_format="pandas")

    cc = connected_components_ds(real)
    out = hash_join(docs, cc, on="doc_id", how="left").to_pandas()
    comp = out["component"].fillna(out["doc_id"]).astype("int64")
    return (pd.DataFrame({"doc_id": out["doc_id"].astype("int64"),
                          "component": comp})
            .sort_values("doc_id").reset_index(drop=True))


QUERIES.update({"q_connected_components": q_connected_components})


# ---------------------------------------------------------------------------
# Distributed multinomial Naive Bayes (train = count aggregation, score =
# broadcast-model map; the classic quality/language classifier shape)
# ---------------------------------------------------------------------------
def q_nb_classify(sf_dir: str):
    """Multinomial Naive Bayes with Laplace smoothing, trained and
    applied distributed: TRAINING is nothing but count aggregation —
    per-(lang, token) counts and per-lang doc counts, each one
    per-batch Counter partial + one coarse_agg — so the classic
    fastText-shaped corpus classifier needs no parameter server.  The
    fitted model (|V|·K counts) is broadcast ONCE via ray.put and the
    SCORE pass is shuffle-free (bounded-vocabulary assumption, the
    q_lm_score posture; at web-scale vocabularies attach counts by a
    token hash join instead — the q_lm_quality posture).

    Split: doc_id % 5 != 0 trains, % 5 == 0 is scored.  Zero-token
    test docs are skipped (no evidence, same rule as q_lm_score).
    score = ln(nd_L/N) + Σ_tok f·ln((c_{L,tok}+1)/(tot_L+V)), rounded
    to 6 dp on both engines before the argmax; ties break on lang
    ascending.  NULL lang trains as the '<null>' class (q_mix_balance
    convention)."""
    import math
    from collections import Counter

    import ray

    from bb_ocr_ray.functions.hashing import ws_tokens

    ds = _read_parquet(_t(sf_dir, "documents"),
                       columns=["doc_id", "lang", "text"])

    def tok_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] % 5 != 0]
        c = Counter()
        for lg, t in zip(b["lang"].fillna("<null>"), b["text"]):
            for tok in ws_tokens(t or ""):
                c[(lg, tok)] += 1
        ks = list(c.keys())
        return pd.DataFrame({
            "lang": pd.array([k[0] for k in ks], dtype="object"),
            "tok": pd.array([k[1] for k in ks], dtype="object"),
            "c": pd.array(list(c.values()), dtype="int64")})

    def doc_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] % 5 != 0]
        g = (b.assign(lang=b["lang"].fillna("<null>"))
             .groupby("lang", as_index=False).agg(nd=("doc_id", "size")))
        g["nd"] = g["nd"].astype("int64")
        return g

    cnt_pd = coarse_agg(
        ds.map_batches(tok_partial, batch_format="pandas"),
        ["lang", "tok"], {"c": ("c", "sum")}).to_pandas()
    prior_pd = coarse_agg(
        ds.map_batches(doc_partial, batch_format="pandas"),
        ["lang"], {"nd": ("nd", "sum")}).to_pandas()

    n_train = int(prior_pd["nd"].sum())
    vocab = int(cnt_pd["tok"].nunique())
    tot = {lg: int(s) for lg, s in
           cnt_pd.groupby("lang")["c"].sum().items()}
    nd = dict(zip(prior_pd["lang"], (int(x) for x in prior_pd["nd"])))
    langs = sorted(nd)
    model_ref = ray.put({
        "cnt": {(lg, tk): int(c) for lg, tk, c in
                zip(cnt_pd["lang"], cnt_pd["tok"], cnt_pd["c"])},
        "tot": tot, "nd": nd, "langs": langs,
        "n": n_train, "v": vocab})

    def score(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(model_ref)
        cnt, totl = m["cnt"], m["tot"]
        ids, truth, preds, s6s = [], [], [], []
        b = b[b["doc_id"] % 5 == 0]
        for d, lg, t in zip(b["doc_id"], b["lang"].fillna("<null>"),
                            b["text"]):
            tf = Counter(ws_tokens(t or ""))
            if not tf:
                continue
            best_s, best_l = None, None
            for L in m["langs"]:           # ascending: tie keeps min lang
                denom = totl.get(L, 0) + m["v"]
                s = math.log(m["nd"][L] / m["n"]) + sum(
                    f * math.log((cnt.get((L, tok), 0) + 1) / denom)
                    for tok, f in tf.items())
                s6 = float(_round_sql(s, 6))
                if best_s is None or s6 > best_s:
                    best_s, best_l = s6, L
            ids.append(int(d))
            truth.append(lg)
            preds.append(best_l)
            s6s.append(best_s)
        return pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "lang": pd.array(truth, dtype="object"),
            "pred": pd.array(preds, dtype="object"),
            "score6": pd.array(s6s, dtype="float64")})

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES.update({"q_nb_classify": q_nb_classify})


# ---------------------------------------------------------------------------
# Distributed triangle counting (web-graph analytics, SURVEY §2.7 family)
# ---------------------------------------------------------------------------
def q_triangle_count(sf_dir: str):
    """Triangle counting through the generic DEGREE-oriented
    wedge-closure operator (``stages.graph.triangle_count`` — Suri &
    Vassilvitskii WWW'11): degrees by a coarse fold, edges directed
    low->high (degree, id) so a celebrity node's neighbor square is
    never enumerated, wedges by a self hash-join on the source, closure
    by a packed-key semi-join.  No driver-side edge set anywhere.

    Graph: doc d links to d+1 iff (d²+3d) mod 11 ≥ 3 and to d+2 iff
    (7d+5) mod 13 ≥ 4, targets existence-checked (distributed
    semi-join).  ~37% of consecutive triples close into triangles.
    Output: triangle count per (min-vertex mod 10) bucket — multi-row,
    so the hash gate sees the distribution, not one scalar."""
    from bb_ocr_ray.stages.graph import triangle_count
    from bb_ocr_ray.stages.joins import auto_semi

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def gen(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        d1 = d[((d * d + 3 * d) % 11) >= 3]
        d2 = d[((7 * d + 5) % 13) >= 4]
        return pd.DataFrame({
            "src": np.concatenate([d1, d2]),
            "dst": np.concatenate([d1 + 1, d2 + 2])})

    cand = docs.map_batches(gen, batch_format="pandas")
    edges = auto_semi(
        cand.map_batches(lambda b: b.rename(columns={"dst": "doc_id"}),
                         batch_format="pandas"),
        docs, on="doc_id",
    ).map_batches(lambda b: b.rename(columns={"doc_id": "dst"}),
                  batch_format="pandas")

    tri = triangle_count(edges)

    out = coarse_agg(
        tri.map_batches(
            lambda b: pd.DataFrame({"bucket": b["a"].astype("int64") % 10}),
            batch_format="pandas"),
        ["bucket"], {"n_triangles": ("bucket", "size")},
    ).to_pandas()
    out["n_triangles"] = out["n_triangles"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


QUERIES.update({"q_triangle_count": q_triangle_count})


# ---------------------------------------------------------------------------
# Variable-length interval overlap join (SURVEY §2.4 custom-operator slot)
# ---------------------------------------------------------------------------
def q_interval_join(sf_dir: str):
    """Interval OVERLAP join with per-row lengths — click sessions
    ([ts, ts + value hours-as-seconds]) x error windows ([ts, ts+30 m])
    per user, via :func:`stages.joins.interval_join` (day buckets,
    variable replication, emit-at-overlap-start dedup).  Generalizes
    q_band_join's constant band to variable lengths.  Rows with NULL
    ts/value drop on both engines (SQL NULL predicate).  Output is the
    pair list plus the exact integer overlap length in microseconds."""
    from bb_ocr_ray.stages.joins import interval_join

    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_id", "user_id", "event_type",
                                "ts", "value"])

    def prep(kind: str, fixed_us: int | None):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["event_type"] == kind]
            # NULL user_id never matches an equality join; NULL ts
            # makes the whole predicate NULL — both drop, as in SQL
            b = b[b["ts"].notna() & b["user_id"].notna()]
            s = b["ts"].astype("datetime64[us]").astype("int64")
            if fixed_us is None:
                b = b[b["value"].notna()]
                s = b["ts"].astype("datetime64[us]").astype("int64")
                dur = (_round_sql(b["value"] * 3600.0, 0)
                       .astype("int64") * 1_000_000)
            else:
                dur = fixed_us
            return pd.DataFrame(
                {"event_id": b["event_id"].astype("int64"),
                 "user_id": b["user_id"].astype("int64"),
                 "s": s.to_numpy(),
                 "e": (s + dur).to_numpy()})

        return fn

    clicks = ev.map_batches(prep("click", None), batch_format="pandas")
    errors = ev.map_batches(prep("error", 1_800_000_000),
                            batch_format="pandas")
    pairs = interval_join(clicks, errors, key="user_id",
                          bucket_us=86_400_000_000)
    out = pairs.map_batches(
        lambda b: pd.DataFrame(
            {"click_id": b["event_id"].astype("int64"),
             "error_id": b["event_id_r"].astype("int64"),
             "overlap_us": (np.minimum(b["e"], b["e_r"])
                            - np.maximum(b["s"], b["s_r"])).astype("int64")}),
        batch_format="pandas").to_pandas()
    return (out.sort_values(["click_id", "error_id"])
            .reset_index(drop=True))


QUERIES.update({"q_interval_join": q_interval_join})


# ---------------------------------------------------------------------------
# Per-domain boilerplate line removal (CCNet/C4 corpus cleaning)
# ---------------------------------------------------------------------------
def _plant_boiler(doc_id: int, source: str, text: str) -> str:
    """Deterministic boilerplate synthesis from doc_id/source
    arithmetic (the q_pii_scrub pattern — both engines derive the same
    dirty text): a copyright banner and nav menu on EVERY doc of a
    source (df 100% -> dropped), a newsletter line on half of each
    source's docs (~50% -> kept, exercising the
    frequent-but-below-threshold branch), a promo line on 3/4 of them
    (~75% -> dropped), the original body, and a per-doc unique
    footnote (df 1 -> kept).  The conditions key on doc_id // 20 —
    the WITHIN-source index (source = doc_id % 20 in the synthetic
    tables), so the ratios hold inside every source; doc_id % 2 would
    be constant per source and degenerate to 0%/100%."""
    parts = [f"(c) 2026 {source} all rights reserved",
             f"home | about | contact {source}"]
    if (doc_id // 20) % 2 == 0:
        parts.append(f"subscribe to {source} newsletter")
    if (doc_id // 20) % 4 < 3:
        parts.append(f"promo {source} deals")
    parts.append(text or "")
    parts.append(f"footnote {doc_id}")
    return "\n".join(parts)


def q_boilerplate(sf_dir: str):
    """CCNet/C4-style per-domain boilerplate removal
    (:func:`stages.boilerplate.remove_boilerplate`) exercised on text
    with PLANTED banners: drop every line present in > 60% of a
    source's docs (and >= 2 of them), rebuild each doc from its kept
    lines in order.  The md5 of the rebuilt text proves the rewrite is
    byte-exact, not just counted; megadoc bodies carry real within-doc
    repeated lines, so the doc-local-distinct df counting is exercised
    too.  The keep/drop decision is exact integer arithmetic
    (df*100 > 60*n_docs) on both engines."""
    from bb_ocr_ray.stages.boilerplate import remove_boilerplate

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source", "text"])

    def dirty(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"),
             "source": b["source"],
             "text": [_plant_boiler(int(d), s, t) for d, s, t in
                      zip(b["doc_id"], b["source"], b["text"])]})

    cleaned = remove_boilerplate(
        docs.map_batches(dirty, batch_format="pandas"))
    out = cleaned.map_batches(
        lambda b: pd.DataFrame(
            {"doc_id": b["doc_id"].astype("int64"),
             "n_lines": b["n_lines"].astype("int64"),
             "n_kept": b["n_kept"].astype("int64"),
             "clean_md5": [md5_hex(t) for t in b["clean_text"]]}),
        batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES.update({"q_boilerplate": q_boilerplate})


# ---------------------------------------------------------------------------
# PMI cooccurrence pairs (word-association / phrase mining)
# ---------------------------------------------------------------------------
def q_pmi_pairs(sf_dir: str, window: int = 2, min_count: int = 5,
                topk: int = 20):
    """Pointwise mutual information over skip-gram token pairs (Church
    & Hanks 1990; the word2vec-era association-mining input — public
    method): for every ordered pair (t[i], t[i+d]), d in 1..window,
    PMI = ln(P(pair) / (P(w1) P(w2))) with P(pair) = c12/n_pairs and
    P(w) = c/n_tokens.  Top-k pairs by (pmi desc, w1, w2) at
    c12 >= min_count.

    Scale shape: per-batch Counter partials bound both explodes at
    per-doc vocabulary; the pair and unigram tables are
    vocabulary-sized coarse folds; the c12 >= min_count filter shrinks
    the pair table BEFORE the two unigram attachments (vocab-sized
    hash joins — never corpus-wide); the grand totals are two
    aggregate sums.  The sort ranks the filtered pair table only.
    pmi rounds to 6 dp before ranking (cross-engine libm drift is
    ~1e-13; ties break on the pair itself)."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens
    from bb_ocr_ray.stages.coarse import coarse_agg
    from bb_ocr_ray.stages.joins import hash_join

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def pair_partials(b: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in b["text"]:
            tk = ws_tokens(t or "")
            for d in range(1, window + 1):
                c.update(zip(tk[:-d], tk[d:]))
        if not c:
            return pd.DataFrame({"w1": pd.array([], dtype="object"),
                                 "w2": pd.array([], dtype="object"),
                                 "k": pd.array([], dtype="int64")})
        w1s, w2s = zip(*c.keys())
        return pd.DataFrame({"w1": pd.array(w1s, dtype="object"),
                             "w2": pd.array(w2s, dtype="object"),
                             "k": pd.array(list(c.values()),
                                           dtype="int64")})

    def tok_partials(b: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in b["text"]:
            c.update(ws_tokens(t or ""))
        return pd.DataFrame({"tok": pd.array(list(c.keys()),
                                             dtype="object"),
                             "k": pd.array(list(c.values()),
                                           dtype="int64")})

    # the pair table feeds the min_count filter AND the grand total —
    # pair-vocabulary-sized, materialize once so the corpus explode
    # runs exactly once for it
    pairs = coarse_agg(ds.map_batches(pair_partials,
                                      batch_format="pandas"),
                       ["w1", "w2"], {"c12": ("k", "sum")}).materialize()
    # unigram counts feed BOTH attachments and both grand totals —
    # vocabulary-sized, materialize once
    uni = coarse_agg(ds.map_batches(tok_partials, batch_format="pandas"),
                     ["tok"], {"c": ("k", "sum")}).materialize()

    n_tokens = int(uni.sum("c"))
    n_pairs = int(pairs.sum("c12"))
    kept = pairs.filter(expr=f"c12 >= {int(min_count)}")

    j = hash_join(
        kept.map_batches(lambda b: b.rename(columns={"w1": "tok"}),
                         batch_format="pandas"),
        uni, on="tok")
    j = hash_join(
        j.map_batches(
            lambda b: pd.DataFrame({"w1": b["tok"], "c1": b["c"],
                                    "w2": b["w2"], "c12": b["c12"]})
            .rename(columns={"w2": "tok"}), batch_format="pandas"),
        uni, on="tok")

    def score(b: pd.DataFrame) -> pd.DataFrame:
        c12 = b["c12"].astype("float64").to_numpy()
        c1 = b["c1"].astype("float64").to_numpy()
        c2 = b["c"].astype("float64").to_numpy()
        pmi = np.log(c12 / n_pairs * n_tokens / c1 * n_tokens / c2)
        return pd.DataFrame({"w1": b["w1"], "w2": b["tok"],
                             "c12": b["c12"].astype("int64"),
                             "pmi": _round_sql(pd.Series(pmi), 6)})

    out = (j.map_batches(score, batch_format="pandas")
           .sort(["pmi", "w1", "w2"], descending=[True, False, False])
           .limit(topk).to_pandas())
    return out.reset_index(drop=True)


QUERIES.update({"q_pmi_pairs": q_pmi_pairs})


# ---------------------------------------------------------------------------
# BFS seed distance over the link DAG (crawl-frontier depth metric)
# ---------------------------------------------------------------------------
def q_seed_distance(sf_dir: str, max_hops: int = 8,
                    visited_broadcast_limit: int | None = None,
                    _on_choice=None):
    """Minimum hop distance from a seed set over a directed link graph
    — the crawl-frontier depth / influence-radius metric (BFS from
    seeds, the seed-distance feature of crawl schedulers and
    link-spam analyses).  Frontier-based distributed BFS: each round
    expands the frontier through ONE bucketed hash join on the edge
    list, dedups the neighbor set with a coarse fold, and anti-joins
    the visited table so every node is labeled exactly once at its
    FIRST (= minimal) discovery round.  The edge list materializes
    once (data-bounded, the triangle_count precedent); the visited
    table grows to |reachable| rows, never on the driver.

    Graph: doc d -> d+1 iff (d²+3d) mod 11 >= 3 and d -> d+2 iff
    (7d+5) mod 13 >= 4 (the q_triangle_count rule), targets
    existence-checked; edges strictly increase doc_id, so the graph is
    a DAG and the oracle's recursive CTE is path-bounded.  Seeds:
    doc_id % 97 == 0.  Output: (node, dist) for every node within
    ``max_hops``; unreached nodes are absent on both engines."""
    import ray.data as rd

    from bb_ocr_ray.stages.coarse import coarse_agg
    from bb_ocr_ray.stages.joins import auto_anti, auto_semi, hash_join

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def gen(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        d1 = d[((d * d + 3 * d) % 11) >= 3]
        d2 = d[((7 * d + 5) % 13) >= 4]
        return pd.DataFrame({
            "src": np.concatenate([d1, d2]),
            "dst": np.concatenate([d1 + 1, d2 + 2])})

    cand = docs.map_batches(gen, batch_format="pandas")
    edges = auto_semi(
        cand.map_batches(lambda b: b.rename(columns={"dst": "doc_id"}),
                         batch_format="pandas"),
        docs, on="doc_id",
    ).map_batches(
        lambda b: pd.DataFrame({"node": b["src"].astype("int64"),
                                "dst": b["doc_id"].astype("int64")}),
        batch_format="pandas").materialize()

    def pick_seeds(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        d = d[d % 97 == 0]
        return pd.DataFrame({"node": d,
                             "dist": np.zeros(len(d), dtype="int64")})

    seeds = docs.map_batches(pick_seeds,
                             batch_format="pandas").materialize()

    # Loop shape is SIZE-GATED on the visited table (the pagerank /
    # HITS driver-fold posture): while visited fits the broadcast
    # limit, a hop is ONE shuffle-free map over the static edge list
    # (frontier set via ray.put, per-batch distinct dst partials,
    # driver setdiff) — no all-to-all at all.  If visited outgrows
    # the gate MID-RUN, the state spills into Datasets and the
    # distributed loop below finishes the remaining hops: per round
    # one bucketed join, one coarse neighbor-dedup fold (which also
    # re-compacts frontier blocks — the fold-free variant measured
    # SLOWER), one size-gated anti-join against the re-materialized
    # visited table (a LAZY visited union defeats auto_anti's gate
    # and forced a full visited shuffle per round: 26 s vs 11 s at
    # sf0.1/32 cpus before the driver path existed).
    import ray as _ray

    from bb_ocr_ray.stages.joins import _BROADCAST_LIMIT_BYTES
    limit = (_BROADCAST_LIMIT_BYTES if visited_broadcast_limit is None
             else visited_broadcast_limit)

    dist = None          # Dataset state (distributed path)
    frontier = None
    start_hop = 1
    # both gate checks use the same LOGICAL measure (16 B per
    # (node, dist) row) so entry and spill thresholds are consistent
    seeds_pd = (seeds.to_pandas()
                if seeds.count() * 16 <= limit else None)
    if seeds_pd is not None:
        if _on_choice is not None:
            _on_choice("driver")
        visited = np.unique(seeds_pd["node"].to_numpy(np.int64))
        frames = [pd.DataFrame({"node": visited,
                                "dist": np.int64(0)})]
        frontier_arr = visited
        for hop in range(1, max_hops + 1):
            if len(frontier_arr) == 0:
                break
            ref = _ray.put(frontier_arr)

            def expand(b: pd.DataFrame, ref=ref) -> pd.DataFrame:
                f = _ray.get(ref)
                m = np.isin(b["node"].to_numpy(np.int64), f)
                return pd.DataFrame({"node": np.unique(
                    b["dst"].to_numpy(np.int64)[m])})

            nbrs = np.unique(edges.map_batches(
                expand, batch_format="pandas")
                .to_pandas()["node"].to_numpy(np.int64))
            new_arr = np.setdiff1d(nbrs, visited, assume_unique=True)
            if len(new_arr) == 0:
                frontier_arr = new_arr
                break
            visited = np.union1d(visited, new_arr)
            frames.append(pd.DataFrame({"node": new_arr,
                                        "dist": np.int64(hop)}))
            frontier_arr = new_arr
            if len(visited) * 16 > limit and hop < max_hops:
                # visited outgrew the gate: spill state to Datasets
                # and let the distributed loop finish
                import ray.data as _rd
                dist = _rd.from_pandas(
                    pd.concat(frames, ignore_index=True)).materialize()
                frontier = _rd.from_pandas(
                    pd.DataFrame({"node": new_arr,
                                  "dist": np.int64(hop)})).materialize()
                start_hop = hop + 1
                break
        if dist is None:
            out = pd.concat(frames, ignore_index=True)
            out["node"] = out["node"].astype("int64")
            out["dist"] = out["dist"].astype("int64")
            return out.sort_values("node").reset_index(drop=True)
    else:
        dist = seeds
        frontier = seeds
    if _on_choice is not None:
        _on_choice("distributed")

    for hop in range(start_hop, max_hops + 1):
        nbrs = coarse_agg(
            hash_join(frontier.select_columns(["node"]), edges,
                      on="node").map_batches(
                lambda b: pd.DataFrame(
                    {"node": b["dst"].astype("int64")}),
                batch_format="pandas"),
            ["node"], {"n": ("node", "size")}).select_columns(["node"])
        new = auto_anti(nbrs, dist.select_columns(["node"]),
                        on="node").map_batches(
            lambda b, h=hop: pd.DataFrame(
                {"node": b["node"].astype("int64"),
                 "dist": np.full(len(b), h, dtype="int64")}),
            batch_format="pandas").materialize()
        if new.count() == 0:
            break
        dist = dist.union(new).materialize()
        frontier = new

    out = dist.to_pandas()
    out["node"] = out["node"].astype("int64")
    out["dist"] = out["dist"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


QUERIES.update({"q_seed_distance": q_seed_distance})


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 + dense cosine arms
# ---------------------------------------------------------------------------
def q_hybrid_rrf(sf_dir: str, k_fuse: int = 60):
    """Reciprocal-rank fusion of a lexical and a dense retrieval arm —
    the hybrid-retrieval step of a RAG / retrieval stack (Cormack,
    Clarke & Buettcher SIGIR'09; public method).  The arms are the
    existing operators: q_bm25's top-20 (corpus-stat folds + partial
    top-k scoring map) and ann_topk's exact cosine top-20 for query
    vector 0 (query broadcast once, corpus streams, distributed
    partial top-k).  Both arm outputs are k-row aggregates, so the
    fusion itself is driver-side arithmetic BY CONSTRUCTION — the
    distributed work is inside the arms.  RRF contributions
    1/(k_fuse + rank) are integer-ratio doubles, bit-identical across
    engines; outputs round to 6 dp (the canon grain).  BOTH arms rank
    at a fixed 4 dp grain — the BM25 arm rounds its score and the
    dense arm rounds the cosine (``score_round=4``, mirrored by
    ``round(list_cosine_similarity(...), 4)`` in the oracle) so a
    near-tie at the k=20 boundary cannot flip set membership between
    engines (ADVICE r4)."""
    from bb_ocr_ray.stages.ann import ann_topk

    lex = q_bm25(sf_dir).reset_index(drop=True)
    lex["r_lex"] = np.arange(1, len(lex) + 1, dtype="int64")

    vecs = _read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    dn = ann_topk(vecs, query_ids=[0], k=20, score_round=4).to_pandas()
    dn = pd.DataFrame({"doc_id": dn["neighbor_id"].astype("int64"),
                       "r_dense": dn["rank"].astype("int64")})

    f = lex[["doc_id", "r_lex"]].merge(dn, on="doc_id", how="outer")
    lexc = np.where(f["r_lex"].notna(),
                    1.0 / (k_fuse + f["r_lex"].fillna(0)), 0.0)
    denc = np.where(f["r_dense"].notna(),
                    1.0 / (k_fuse + f["r_dense"].fillna(0)), 0.0)
    out = pd.DataFrame({
        "doc_id": f["doc_id"].astype("int64"),
        "lex_rrf": _round_sql(pd.Series(lexc), 6),
        "dense_rrf": _round_sql(pd.Series(denc), 6),
        "rrf": _round_sql(pd.Series(lexc + denc), 6)})
    return (out.sort_values(["rrf", "doc_id"], ascending=[False, True])
            .reset_index(drop=True))


QUERIES.update({"q_hybrid_rrf": q_hybrid_rrf})


# ---------------------------------------------------------------------------
# c-TF-IDF cluster labeling (BERTopic-style top terms per cluster)
# ---------------------------------------------------------------------------
def q_ctfidf(sf_dir: str, topk: int = 5):
    """Class-based TF-IDF over the embedding clusters — the topic /
    cluster LABELING step of a BERTopic-style corpus map (Grootendorst
    2022; public method): every document joins its cluster id (the
    embeddings table's label column, 1:1 on id), per-(cluster, term)
    counts fold once, and W(t,c) = tf(t,c) * ln(1 + A / f(t)) ranks
    each cluster's characteristic terms, where f(t) is the term's
    corpus-wide count and A the mean tokens per cluster.

    Scale shape: one 1:1 bucketed hash join attaches cluster ids; the
    (cluster, term) table is one coarse fold bounded by cluster-local
    vocabulary; f(t) derives from THAT table (vocabulary-sized fold —
    the q_lm_quality trick, never a second corpus pass); A is an
    aggregate scalar; top-k per cluster is the partial-top-k +
    grouped-final pattern.  W rounds to 6 dp before ranking; ties
    break term-ascending on both engines."""
    from bb_ocr_ray.functions.hashing import ws_tokens
    from bb_ocr_ray.stages.joins import hash_join

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    labels = _read_parquet(_t(sf_dir, "embeddings"),
                           columns=["vec_id", "label"]).map_batches(
        lambda b: pd.DataFrame({"doc_id": b["vec_id"].astype("int64"),
                                "label": b["label"].astype("int64")}),
        batch_format="pandas")

    joined = hash_join(docs, labels, on="doc_id")

    def term_partials(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        c = Counter()
        for lab, t in zip(b["label"], b["text"]):
            for tok in ws_tokens(t or ""):
                c[(int(lab), tok)] += 1
        if not c:
            return pd.DataFrame({"label": pd.array([], dtype="int64"),
                                 "token": pd.array([], dtype="object"),
                                 "k": pd.array([], dtype="int64")})
        labs, toks = zip(*c.keys())
        return pd.DataFrame({"label": pd.array(labs, dtype="int64"),
                             "token": pd.array(toks, dtype="object"),
                             "k": pd.array(list(c.values()),
                                           dtype="int64")})

    # (cluster, term) counts — the model table; feeds f(t), A and the
    # scoring scan, so materialize once (vocabulary-sized)
    ct = coarse_agg(joined.map_batches(term_partials,
                                       batch_format="pandas"),
                    ["label", "token"], {"tf": ("k", "sum")}).materialize()

    ft = coarse_agg(ct, ["token"], {"f": ("tf", "sum")})
    n_classes = len(ct.unique("label"))
    total_tokens = int(ct.sum("tf"))
    avg_per_class = total_tokens / n_classes

    scored = hash_join(ct, ft, on="token")

    def score(b: pd.DataFrame) -> pd.DataFrame:
        w = (b["tf"].astype("float64").to_numpy()
             * np.log(1.0 + avg_per_class
                      / b["f"].astype("float64").to_numpy()))
        return pd.DataFrame({"label": b["label"].astype("int64"),
                             "token": b["token"],
                             "tf": b["tf"].astype("int64"),
                             "w": _round_sql(pd.Series(w), 6)})

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return (b.sort_values(["label", "w", "token"],
                              ascending=[True, False, True],
                              kind="mergesort")
                .groupby("label", as_index=False).head(topk))

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["w", "token"], ascending=[False, True],
                          kind="mergesort").head(topk)
        return g.assign(rank=pd.Series(range(1, len(g) + 1),
                                       dtype="int64").values)

    out = (scored.map_batches(score, batch_format="pandas")
           .map_batches(local_topk, batch_format="pandas")
           .groupby("label").map_groups(final_topk,
                                        batch_format="pandas")
           .to_pandas())
    return (out.sort_values(["label", "rank"])
            .reset_index(drop=True))


QUERIES.update({"q_ctfidf": q_ctfidf})


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking pairs (merge/purge dedup family)
# ---------------------------------------------------------------------------
def q_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood candidate pairs
    (:func:`stages.dedup.sorted_neighborhood_pairs`, window 3,
    blocking key = first 12 chars of text): the non-LSH dedup
    blocking strategy.  Rank parity holds across engines because the
    (key, doc_id) order is total, Python compares str by codepoint,
    and DuckDB's default binary collation compares UTF-8 bytes —
    UTF-8 preserves codepoint order, so the two sorts are identical
    on any text."""
    from bb_ocr_ray.stages.dedup import sorted_neighborhood_pairs

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    out = sorted_neighborhood_pairs(docs).to_pandas()
    return (out.sort_values(["id_a", "id_b"])
            .reset_index(drop=True))


QUERIES.update({"q_sorted_neighborhood": q_sorted_neighborhood})


# ---------------------------------------------------------------------------
# Distributed covariance of the embedding matrix (PCA input)
# ---------------------------------------------------------------------------
def q_embed_covariance(sf_dir: str, dim: int = 64):
    """Full covariance matrix of the embedding corpus — the input of a
    PCA / whitening stage, computed as DISTRIBUTED MATRIX PARTIAL
    SUMS: each batch contributes one vectorized X^T X (numpy matmul,
    upper triangle flattened to (i, j, sxy) rows), the column-sum
    vector, and its row count; one coarse fold merges the partials and
    the final (dim x (dim+1)/2)-row covariance assembles from the
    merged sums.  Nothing corpus-sized moves: the shuffle carries
    2,080 partial rows PER BATCH regardless of batch row count.

    Both engines evaluate the identical expression
    cov = (Sxy - Sx*Sy/n)/n from their own float64 sums; summation
    order differs (numpy pairwise vs DuckDB sequential) by ~1e-12
    relative, absorbed by the round-6 grain."""
    from bb_ocr_ray.stages.coarse import coarse_agg

    ds = _read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])
    iu, ju = np.triu_indices(dim)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        X = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in b["embedding"]])
        if not len(X):
            return pd.DataFrame({"i": pd.array([], dtype="int64"),
                                 "j": pd.array([], dtype="int64"),
                                 "s": pd.array([], dtype="float64")})
        if X.shape[1] != dim:
            # triu_indices(dim) silently indexes a sub-block of a
            # WIDER M — fail loudly on a schema change (ADVICE r4)
            raise ValueError(
                f"embedding width {X.shape[1]} != configured dim {dim}")
        M = X.T @ X                       # dim x dim, one BLAS call
        sx = X.sum(axis=0)
        # (i, j) 1-based upper triangle; (i, 0) rows carry the column
        # sums; (0, 0) carries the row count — one uniform fold key
        return pd.DataFrame({
            "i": np.concatenate([iu + 1, np.arange(1, dim + 1),
                                 [0]]).astype("int64"),
            "j": np.concatenate([ju + 1, np.zeros(dim, dtype=int),
                                 [0]]).astype("int64"),
            "s": np.concatenate([M[iu, ju], sx,
                                 [float(len(X))]])})

    merged = coarse_agg(ds.map_batches(partial, batch_format="pandas"),
                        ["i", "j"], {"s": ("s", "sum")}).to_pandas()

    n = float(merged.loc[(merged["i"] == 0) & (merged["j"] == 0),
                         "s"].iloc[0])
    sx = (merged[(merged["j"] == 0) & (merged["i"] > 0)]
          .set_index("i")["s"])
    up = merged[merged["j"] > 0]
    cov = ((up["s"].to_numpy()
            - sx.loc[up["i"]].to_numpy() * sx.loc[up["j"]].to_numpy() / n)
           / n)
    out = pd.DataFrame({"i": up["i"].astype("int64").to_numpy(),
                        "j": up["j"].astype("int64").to_numpy(),
                        "cov": _round_sql(pd.Series(cov), 6)})
    return out.sort_values(["i", "j"]).reset_index(drop=True)


QUERIES.update({"q_embed_covariance": q_embed_covariance})


# ---------------------------------------------------------------------------
# Typo-variant vocabulary pairs (SymSpell deletion-neighborhood blocking)
# ---------------------------------------------------------------------------
def q_typo_pairs(sf_dir: str):
    """Vocabulary pairs at byte-Levenshtein distance EXACTLY 1 via
    :func:`stages.dedup.typo_variant_pairs` (FastSS / SymSpell
    deletion-neighborhood blocking) — the spelling-variant mining /
    vocabulary-cleaning step of a corpus pipeline.  The clean
    synthetic vocabulary has no distance-1 pairs, so typos are
    PLANTED (the q_pii_scrub pattern): every doc_id % 3 == 0 doc
    appends its first token with the second character dropped; both
    engines derive the same dirty text, and the planted variants
    clear the df >= 5 vocabulary gate.  The oracle verifies with
    DuckDB's own levenshtein() over the vocabulary cross join — a
    genuinely independent distance implementation (byte-based, which
    is why the engine's verify runs on UTF-8 bytes)."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens
    from bb_ocr_ray.stages.dedup import typo_variant_pairs

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def dirty(b: pd.DataFrame) -> pd.DataFrame:
        texts = []
        for d, t in zip(b["doc_id"], b["text"]):
            t = t or ""
            tk = ws_tokens(t)
            if int(d) % 3 == 0 and tk and len(tk[0]) >= 4:
                t = t + " " + tk[0][:1] + tk[0][2:]
            texts.append(t)
        return pd.DataFrame({"doc_id": b["doc_id"].astype("int64"),
                             "text": pd.array(texts, dtype="object")})

    dd = ds.map_batches(dirty, batch_format="pandas")

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for t in b["text"]:
            c.update(set(ws_tokens(t or "")))
        return pd.DataFrame({"tok": pd.array(list(c.keys()),
                                             dtype="object"),
                             "df": pd.array(list(c.values()),
                                            dtype="int64")})

    vocab = coarse_agg(dd.map_batches(df_partial, batch_format="pandas"),
                       ["tok"], {"df": ("df", "sum")}).map_batches(
        lambda b: b[(b["df"].astype("int64") >= 5)
                    & (b["tok"].str.len() >= 4)][["tok"]],
        batch_format="pandas").materialize()

    out = typo_variant_pairs(vocab).to_pandas()
    if not len(out):
        return pd.DataFrame({"tok_a": pd.array([], dtype="object"),
                             "tok_b": pd.array([], dtype="object")})
    return (out.sort_values(["tok_a", "tok_b"])
            .reset_index(drop=True))


QUERIES.update({"q_typo_pairs": q_typo_pairs})


# ---------------------------------------------------------------------------
# Crawl-frontier politeness interleave (round-robin by domain)
# ---------------------------------------------------------------------------
def q_crawl_schedule(sf_dir: str):
    """Politeness-aware fetch ordering: round-robin by domain — every
    document gets its within-domain rank r, and the global schedule
    orders by (r, domain, doc_id), so two fetches of the same domain
    are always separated by one full pass over every other domain
    with that many pending docs (the crawl-frontier interleave of a
    polite fetcher).

    Scale shape: within-domain ranks come from ONE coarse shuffle on
    domain with an in-task sort (the q_transitions bucket pattern);
    the global slot needs NO data sort — r is bounded by the largest
    domain's doc count, so a per-r histogram prefix-sums on the
    driver (the q_zip_index trick with r as the bucket) and a second
    coarse shuffle on r assigns slot = offset[r] + local rank by
    (domain, doc_id)."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    n_buckets = _auto_num_buckets()
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source"])

    def stamp_dom(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__coarse"] = _bucket_ids(b, ["source"], n_buckets)
        return b

    def rank_in_domain(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["source", "doc_id"], kind="mergesort")
        # dropna=False: a NULL domain is its own partition (SQL
        # PARTITION BY semantics); pandas would otherwise DROP the
        # NaN group and cumcount would emit garbage for those rows
        r = (g.groupby("source", sort=False, dropna=False).cumcount()
             .to_numpy() + 1)
        return pd.DataFrame({"doc_id": g["doc_id"].astype("int64")
                             .to_numpy(),
                             "source": g["source"].to_numpy(),
                             "r": r.astype("int64")})

    ranked = (docs.map_batches(stamp_dom, batch_format="pandas")
              .groupby("__coarse").map_groups(rank_in_domain,
                                              batch_format="pandas")
              .materialize())

    hist = ranked.map_batches(
        lambda b: b.groupby("r", as_index=False)
        .size().rename(columns={"size": "n"}),
        batch_format="pandas").to_pandas()
    hist = (hist.groupby("r", as_index=False)["n"].sum()
            .sort_values("r", kind="mergesort"))
    # the offsets table has one row per RANK, and max rank == the
    # LARGEST domain's doc count — for a skew-dominated crawl corpus
    # that can approach corpus size, so it ships through the object
    # store ONCE (ray.put) and each slot task reads it zero-copyish,
    # never as a per-task closure copy (ADVICE r4)
    import ray as _ray

    offsets_ref = _ray.put(dict(zip(
        hist["r"], np.cumsum(np.r_[0, hist["n"].to_numpy()[:-1]]))))

    def stamp_r(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__coarse"] = b["r"].astype("int64") % n_buckets
        return b

    def slot_bucket(g: pd.DataFrame) -> pd.DataFrame:
        offsets = _ray.get(offsets_ref)
        parts = []
        for r, sub in g.groupby("r", sort=True):
            sub = sub.sort_values(["source", "doc_id"],
                                  kind="mergesort")
            parts.append(pd.DataFrame({
                "doc_id": sub["doc_id"].astype("int64").to_numpy(),
                "source": sub["source"].to_numpy(),
                "r": sub["r"].astype("int64").to_numpy(),
                "slot": int(offsets[r])
                + np.arange(len(sub), dtype="int64") + 1}))
        return pd.concat(parts, ignore_index=True)

    out = (ranked.map_batches(stamp_r, batch_format="pandas")
           .groupby("__coarse").map_groups(slot_bucket,
                                           batch_format="pandas")
           .to_pandas())
    return (out[["doc_id", "source", "r", "slot"]]
            .sort_values("slot").reset_index(drop=True))


QUERIES.update({"q_crawl_schedule": q_crawl_schedule})


# ---------------------------------------------------------------------------
# HLL set intersection (inclusion-exclusion over mergeable sketches)
# ---------------------------------------------------------------------------
def q_hll_intersect(sf_dir: str):
    """Approximate audience overlap — |click-users AND view-users| —
    via HLL inclusion-exclusion: the register states of sketch A
    (click users), sketch B (view users) and their UNION (elementwise
    register max — THE property that makes HLL mergeable) are all
    integer-exact and oracle-checked; the float estimates
    |A|+|B|-|A∪B| are asserted against truth in pytest (the
    q_hll_registers split).  An exact intersection row computed
    independently on both engines (distributed semi-join here, SQL
    join in DuckDB) rides along as part='x'.

    Scale shape: one streaming partial-fold pass builds both sketch
    states (<= 64 rows each regardless of corpus size); the union
    derives from those 128 aggregate rows on the driver; the exact
    row is one distinct-fold + size-gated semi-join + count."""
    from bb_ocr_ray.functions.hashing import hll_bucket_rho
    from bb_ocr_ray.stages.coarse import coarse_agg
    from bb_ocr_ray.stages.joins import auto_semi

    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_type", "user_id"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.dropna(subset=["user_id"])
        b = b[b["event_type"].isin(["click", "view"])]
        if not len(b):
            return pd.DataFrame({"part": pd.Series([], dtype="object"),
                                 "bucket": pd.Series([], dtype="int64"),
                                 "rho": pd.Series([], dtype="int64")})
        pairs = [hll_bucket_rho(str(int(x))) for x in b["user_id"]]
        df = pd.DataFrame(pairs, columns=["bucket", "rho"])
        df["part"] = np.where(b["event_type"].to_numpy() == "click",
                              "a", "b")
        return df.groupby(["part", "bucket"], as_index=False).max()

    regs = (ds.map_batches(partial, batch_format="pandas")
            .groupby(["part", "bucket"])
            .aggregate(Max("rho", alias_name="val"))
            .to_pandas())
    regs["bucket"] = regs["bucket"].astype("int64")
    regs["val"] = regs["val"].astype("int64")

    # union registers: elementwise max over the two aggregate-sized
    # states — 128 rows, driver arithmetic by construction
    u = (regs.groupby("bucket", as_index=False)["val"].max()
         .assign(part="u"))

    def users_of(kind: str):
        return coarse_agg(
            ds.map_batches(
                lambda b, k=kind: pd.DataFrame(
                    {"user_id": b.dropna(subset=["user_id"])
                     .loc[lambda d: d["event_type"] == k, "user_id"]
                     .astype("int64")}),
                batch_format="pandas"),
            ["user_id"], {"n": ("user_id", "size")}
        ).select_columns(["user_id"]).materialize()

    exact = auto_semi(users_of("click"), users_of("view"),
                      on="user_id").count()

    out = pd.concat([
        regs[["part", "bucket", "val"]], u[["part", "bucket", "val"]],
        pd.DataFrame({"part": ["x"], "bucket": [np.int64(-1)],
                      "val": [np.int64(exact)]})], ignore_index=True)
    out["bucket"] = out["bucket"].astype("int64")
    out["val"] = out["val"].astype("int64")
    return (out.sort_values(["part", "bucket"])
            .reset_index(drop=True))


QUERIES.update({"q_hll_intersect": q_hll_intersect})


# ---------------------------------------------------------------------------
# Exact distributed heavy hitters (two-pass candidate superset)
# ---------------------------------------------------------------------------
def q_heavy_hitters(sf_dir: str, k: int = 50):
    """Exact keys with count*k > N via :func:`stages.heavy.heavy_hitters`
    — the two-pass frequent-items pattern (Misra-Gries guarantee with
    vectorized batch-local counts): candidates from per-batch exact
    counts (a guaranteed superset by the averaging argument), then an
    exact recount of candidates only, so the full ~N-cardinality key
    column never folds through a shuffle.

    The key column is DERIVED deterministically from events so heavy
    hitters exist by construction: users % 3 == 0 map to 13 hot keys
    (~1/39 of rows each — above the N/50 bar), % 3 == 1 to 97 warm
    keys (~1/291 each — candidates in small batches but CUT by the
    exact global filter, proving the superset is filtered exactly),
    the rest to singletons; NULL users drop (the repo's NULL-user
    convention)."""
    from bb_ocr_ray.stages.heavy import heavy_hitters

    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_id", "user_id"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        m = b["user_id"].notna().to_numpy()
        u = pd.to_numeric(b["user_id"], errors="coerce").fillna(0)\
            .to_numpy(np.int64)
        e = b["event_id"].to_numpy(np.int64)
        key = np.where(
            u % 3 == 0, (u % 13).astype(str),
            np.where(u % 3 == 1, (100 + u % 97).astype(str),
                     (e + 1_000_000_000).astype(str)))
        out = pd.DataFrame({"key": key})
        out.loc[~m, "key"] = None
        return out

    out = heavy_hitters(ds.map_batches(keyed, batch_format="pandas"),
                        "key", k=k).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("key").reset_index(drop=True)


QUERIES.update({"q_heavy_hitters": q_heavy_hitters})


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg link analysis)
# ---------------------------------------------------------------------------
def q_hits(sf_dir: str, iters: int = 5):
    """HITS over the q_pagerank link graph (same deterministic
    3-targets-mod-m generator — skewed in-degrees, dangling ids) via
    :func:`stages.graph.hits`: per half-round one neighbor-sum fold +
    one L2 normalization, update order a_i from h_{i-1} then h_i from
    the JUST-normalized a_i, mirrored exactly by the unrolled SQL
    oracle.  Scores round to 6 dp (normalization drift is ~1e-13,
    far under the grain)."""
    from bb_ocr_ray.stages.graph import hits

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    m = int(docs.max("doc_id")) + 1

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        return pd.DataFrame({"src": np.repeat(d, 3),
                             "dst": np.stack([(d * d + 1) % m,
                                              (d // 2 + 7) % m,
                                              (d * 3 + 11) % m],
                                             axis=1).reshape(-1)})

    out = hits(docs.map_batches(edges, batch_format="pandas"),
               iters=iters).to_pandas()
    out["authority"] = _round_sql(out["authority"], 6)
    out["hub"] = _round_sql(out["hub"], 6)
    return out.sort_values("node").reset_index(drop=True)


QUERIES.update({"q_hits": q_hits})


# ---------------------------------------------------------------------------
# Inverted index build (term -> ordered posting list)
# ---------------------------------------------------------------------------
def q_posting_lists(sf_dir: str, min_df: int = 5):
    """Build the df-banded inverted index over documents: one row per
    surviving term with its document frequency and the FULL ordered
    posting list (comma-joined doc ids — value-hash-checkable).  Terms
    keep ``df >= min_df`` (typo/hapax floor) and ``df*5 <= 3*n_docs``
    (stopword ceiling, exact integer arithmetic — the 60% bar also
    BOUNDS every posting row, so no term can produce a corpus-sized
    output row; real indexers shard hotter terms instead of inlining
    them).

    Terms are unigrams AND adjacent bigrams (``a_b``): the synthetic
    corpus's 31-token unigram vocabulary is all stopword-frequency
    (the ceiling cuts every one — proving it fires), while the ~900
    bigrams spread across the band and the hapax floor.

    Scale shape: per-doc DISTINCT terms explode in-task (a doc never
    splits across batches), ONE coarse shuffle on the term moves
    (term, doc_id) pairs, and each bucket folds its terms with a
    sort + boundary scan.  n_docs is a parquet-metadata count."""
    from bb_ocr_ray.functions.hashing import ws_tokens
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    n_buckets = _auto_num_buckets()
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    n_docs = docs.count()

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        terms, ids = [], []
        for d, t in zip(b["doc_id"], b["text"]):
            tk = ws_tokens(t or "")
            distinct = set(tk)
            distinct.update(f"{a}_{b2}" for a, b2 in zip(tk, tk[1:]))
            for tok in distinct:
                terms.append(tok)
                ids.append(d)
        out = pd.DataFrame({"term": pd.array(terms, dtype="object"),
                            "doc_id": pd.array(ids, dtype="int64")})
        out["__coarse"] = _bucket_ids(out, ["term"], n_buckets)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"], kind="mergesort")
        t = g["term"].to_numpy()
        d = g["doc_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, t[1:] != t[:-1]])
        ends = np.r_[starts[1:], len(t)]
        terms, dfs, posts = [], [], []
        for s, e in zip(starts, ends):
            df = int(e - s)
            if df >= min_df and df * 5 <= 3 * n_docs:
                terms.append(t[s])
                dfs.append(df)
                posts.append(",".join(map(str, d[s:e])))
        return pd.DataFrame({"term": pd.array(terms, dtype="object"),
                             "df": pd.array(dfs, dtype="int64"),
                             "postings": pd.array(posts, dtype="object")})

    out = (docs.map_batches(explode, batch_format="pandas")
           .groupby("__coarse").map_groups(
               lambda g: fold(g.drop(columns=["__coarse"])),
               batch_format="pandas").to_pandas())
    return out.sort_values("term").reset_index(drop=True)


QUERIES.update({"q_posting_lists": q_posting_lists})


# ---------------------------------------------------------------------------
# Co-visitation pair counts (item-item collaborative counts)
# ---------------------------------------------------------------------------
def q_covisit(sf_dir: str, cap: int = 12, min_count: int = 2):
    """Item-item co-visitation counts — the collaborative-filtering /
    related-content primitive: for every pair of items interacted
    with by the same user, how many users share them.  Items derive
    deterministically as ``event_id % 251``; NULL users drop (the
    repo convention).

    Hot-user guard: a user's pair contribution is quadratic in their
    item count, so each user is CAPPED to their ``cap`` smallest
    distinct items before pairing (deterministic truncation —
    ``row_number() OVER (PARTITION BY u ORDER BY item) <= cap`` in
    the oracle — the degree-capping standard for co-visitation at
    scale; the triangle-count celebrity argument).  A power user with
    10^6 events contributes at most C(cap,2) pairs.

    Scale shape: TWO coarse shuffles total — one on user (in-bucket
    global distinct + cap + vectorized self-merge wedge join; all of
    a user's rows land in one bucket), one count fold on the pair."""
    from bb_ocr_ray.stages.coarse import _bucket_ids, coarse_agg
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    n_buckets = _auto_num_buckets()
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_id", "user_id"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id"])
        out = pd.DataFrame({
            "u": pd.to_numeric(b["user_id"]).astype("int64").to_numpy(),
            "item": (b["event_id"].to_numpy(np.int64) % 251)})
        # batch-local pre-dedup shrinks the shuffle (exactness comes
        # from the in-bucket global dedup)
        out = out.drop_duplicates()
        out["__coarse"] = _bucket_ids(out, ["u"], n_buckets)
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["u", "item"])
             .sort_values(["u", "item"], kind="mergesort"))
        rn = g.groupby("u", sort=False).cumcount().to_numpy() + 1
        g = g[rn <= cap]
        m = g.merge(g, on="u")
        m = m[m["item_x"] < m["item_y"]]
        return pd.DataFrame({"i1": m["item_x"].to_numpy(np.int64),
                             "i2": m["item_y"].to_numpy(np.int64),
                             "one": np.int64(1)})

    counted = coarse_agg(
        ds.map_batches(keyed, batch_format="pandas")
        .groupby("__coarse").map_groups(
            lambda g: pairs(g.drop(columns=["__coarse"])),
            batch_format="pandas"),
        ["i1", "i2"], {"n": ("one", "sum")})

    out = counted.map_batches(
        lambda b: b[b["n"].to_numpy(np.int64) >= min_count],
        batch_format="pandas").to_pandas()
    if not len(out):        # all-empty loses schema through to_pandas
        out = pd.DataFrame({"i1": pd.array([], dtype="int64"),
                            "i2": pd.array([], dtype="int64"),
                            "n": pd.array([], dtype="int64")})
    out = out.astype({"i1": "int64", "i2": "int64", "n": "int64"})
    return out.sort_values(["i1", "i2"]).reset_index(drop=True)


QUERIES.update({"q_covisit": q_covisit})


# ---------------------------------------------------------------------------
# Funnel analysis (ordered view -> click -> purchase progression)
# ---------------------------------------------------------------------------
def q_funnel_windowed(sf_dir: str, window_hours: int = 24):
    """Per-user WINDOWED funnel progression — the furthest stage of
    the ordered sequence view -> click -> purchase each user reaches,
    where each later stage must occur strictly AFTER the chosen
    earlier event in (ts, event_id) order AND within
    ``window_hours`` of it (greedy earliest-event semantics with a
    conversion window — the standard product-funnel definition; the
    window is what makes stages discriminating: unwindowed, every
    long-lived user trivially completes).  NULL users drop.
    Output: (stage, n_users), stages named none/view/click/purchase.

    Scale shape: one coarse shuffle on user (every user's events land
    in one bucket; in-bucket sort + per-user boundary scan — the
    q_transitions bucket pattern), then a 4-row count fold."""
    from bb_ocr_ray.stages.coarse import _bucket_ids, coarse_agg
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    n_buckets = _auto_num_buckets()
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_id", "ts", "user_id", "event_type"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id"])
        out = pd.DataFrame({
            "u": pd.to_numeric(b["user_id"]).astype("int64").to_numpy(),
            "ts": b["ts"].to_numpy(),
            "event_id": b["event_id"].to_numpy(np.int64),
            "event_type": b["event_type"].to_numpy()})
        out["__coarse"] = _bucket_ids(out, ["u"], n_buckets)
        return out

    STAGES = np.array(["none", "view", "click", "purchase"])

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts", "event_id"], kind="mergesort")
        u = g["u"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        tsv = g["ts"].to_numpy()
        W = np.timedelta64(window_hours * 3600 * 1_000_000, "us")
        counts = np.zeros(4, dtype=np.int64)
        for s, e in zip(starts, ends):
            t = et[s:e]
            ut = tsv[s:e]
            stage = 0
            vi = np.flatnonzero(t == "view")
            if len(vi):
                stage = 1
                v0 = vi[0]
                ci = np.flatnonzero((t[v0 + 1:] == "click")
                                    & (ut[v0 + 1:] <= ut[v0] + W))
                if len(ci):
                    stage = 2
                    c0 = v0 + 1 + ci[0]
                    if ((t[c0 + 1:] == "purchase")
                            & (ut[c0 + 1:] <= ut[c0] + W)).any():
                        stage = 3
            counts[stage] += 1
        m = counts > 0
        return pd.DataFrame({"stage": STAGES[m],
                             "n_users": counts[m]})

    out = coarse_agg(
        ds.map_batches(keyed, batch_format="pandas")
        .groupby("__coarse").map_groups(
            lambda g: fold(g.drop(columns=["__coarse"])),
            batch_format="pandas"),
        ["stage"], {"n_users": ("n_users", "sum")}).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("stage").reset_index(drop=True)


QUERIES.update({"q_funnel_windowed": q_funnel_windowed})


# ---------------------------------------------------------------------------
# Exact distributed selection (k-th smallest without a global sort)
# ---------------------------------------------------------------------------
def q_exact_kth(sf_dir: str):
    """Exact global median and p90 of events.value via
    :func:`stages.selection.kth_smallest` — iterative histogram
    narrowing (log_B(range) streaming passes, driver folds of
    block-count×(B+2) partial rows, one bounded candidate collect),
    never a global sort.  Selection returns an EXACT element, so the
    values are bit-identical to ``ORDER BY value LIMIT 1 OFFSET k-1``
    and no rounding grain is involved.  k conventions: median =
    ceil(n/2)-th smallest, p90 = ceil(0.9*n)-th (quantile_disc's
    element choice).  NULL values excluded on both engines."""
    from bb_ocr_ray.stages.selection import kth_smallest

    # materialize the ONE pruned column once: selection makes
    # log_B(range) passes per k (x2 ks + the count), and each pass
    # over a lazy read re-executes the parquet scan (the
    # heavy_hitters triple-rescan finding; measured 3.8 -> 2.6 s at
    # sf0.1).  Footprint: a single float column in the object store.
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["value"]).materialize()

    n = int(ds.map_batches(
        lambda b: pd.DataFrame(
            {"n": [np.int64(pd.to_numeric(b["value"], errors="coerce")
                            .notna().sum())]}),
        batch_format="pandas").to_pandas()["n"].sum())
    k_med = (n + 1) // 2
    k_p90 = -(-9 * n // 10)
    med = kth_smallest(ds, "value", k_med)
    p90 = kth_smallest(ds, "value", k_p90)
    return pd.DataFrame({"n": pd.array([n], dtype="int64"),
                         "median": [med], "p90": [p90]})


QUERIES.update({"q_exact_kth": q_exact_kth})


# ---------------------------------------------------------------------------
# CUBE aggregation (all grouping sets of two dimensions)
# ---------------------------------------------------------------------------
def q_cube_docs(sf_dir: str):
    """GROUP BY CUBE(lang, source) over documents — n_docs and total
    n_chars for every grouping set: (lang, source), (lang), (source)
    and the grand total, with 'ALL' marking the rolled-up dimension
    (q_rollup's lattice completed to the full cube).  All-integer
    aggregates, so no rounding grain anywhere.  Contract: the dim
    columns are non-null in this corpus (asserted by the oracle's
    coalesce semantics); a corpus with NULL dims would need a
    sentinel distinct from the 'ALL' rollup marker on BOTH engines.

    Scale shape: ONE corpus pass emits per-batch partials for the
    finest set only; the three coarser sets derive from the
    materialized (lang, source) table (aggregate-sized folds — never
    a second corpus pass; the q_lm_quality derive-from-the-table
    trick applied to grouping sets)."""
    from bb_ocr_ray.stages.coarse import coarse_agg

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["lang", "source", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.assign(n_docs=np.int64(1))
             .groupby(["lang", "source"], as_index=False, dropna=False)
             .agg(n_docs=("n_docs", "sum"), chars=("n_chars", "sum")))
        g["chars"] = g["chars"].astype("int64")
        return g

    fine = coarse_agg(
        docs.map_batches(partial, batch_format="pandas"),
        ["lang", "source"],
        {"n_docs": ("n_docs", "sum"), "chars": ("chars", "sum")}
    ).materialize()

    fine_pd = fine.to_pandas()      # aggregate-sized by construction
    fine_pd["lang"] = fine_pd["lang"].astype(str)
    fine_pd["source"] = fine_pd["source"].astype(str)

    by_lang = (fine_pd.groupby("lang", as_index=False)
               [["n_docs", "chars"]].sum().assign(source="ALL"))
    by_src = (fine_pd.groupby("source", as_index=False)
              [["n_docs", "chars"]].sum().assign(lang="ALL"))
    grand = pd.DataFrame({"lang": ["ALL"], "source": ["ALL"],
                          "n_docs": [fine_pd["n_docs"].sum()],
                          "chars": [fine_pd["chars"].sum()]})
    out = pd.concat([fine_pd, by_lang, by_src, grand], ignore_index=True)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["chars"] = out["chars"].astype("int64")
    return (out[["lang", "source", "n_docs", "chars"]]
            .sort_values(["lang", "source"]).reset_index(drop=True))


QUERIES.update({"q_cube_docs": q_cube_docs})


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering keys — multi-column locality layout
# ---------------------------------------------------------------------------
def _part1by1_u16(x: np.ndarray) -> np.ndarray:
    """Spread each of 16 bits to the even positions of a 32-bit word
    (classic Morton magic-number twiddling, fully vectorized)."""
    x = x.astype(np.uint32) & np.uint32(0xFFFF)
    x = (x | (x << np.uint32(8))) & np.uint32(0x00FF00FF)
    x = (x | (x << np.uint32(4))) & np.uint32(0x0F0F0F0F)
    x = (x | (x << np.uint32(2))) & np.uint32(0x33333333)
    x = (x | (x << np.uint32(1))) & np.uint32(0x55555555)
    return x


def q_zorder(sf_dir: str, bucket_bits: int = 6):
    """Z-order (Morton) clustering key per document over the two
    dimensions (doc_id % 2^16, n_chars % 2^16) — the lakehouse
    data-layout primitive: rows whose keys share a zkey prefix are
    close in BOTH dimensions, so range predicates on either column
    prune contiguous key ranges.  Emits (doc_id, zkey, zbucket) with
    zbucket = the top ``bucket_bits`` bits — the partition a
    z-ordered writer would send the row to.  Pure per-row integer
    arithmetic (magic-number bit spreading, vectorized); the oracle
    re-derives the interleave as an explicit 32-term bit sum, a
    genuinely independent implementation.  NULL n_chars rows drop
    (no meaningful position on the axis)."""
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "n_chars"])

    def zmap(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["n_chars"])
        a = b["doc_id"].to_numpy(np.int64).astype(np.uint64)
        c = pd.to_numeric(b["n_chars"]).to_numpy(np.int64).astype(np.uint64)
        z = (_part1by1_u16(a & np.uint64(0xFFFF)).astype(np.uint64)
             | (_part1by1_u16(c & np.uint64(0xFFFF)).astype(np.uint64)
                << np.uint64(1)))
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64").to_numpy(),
            "zkey": z.astype("int64"),
            "zbucket": (z >> np.uint64(32 - bucket_bits)).astype("int64")})

    out = docs.map_batches(zmap, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES.update({"q_zorder": q_zorder})


# ---------------------------------------------------------------------------
# CDC changelog merge (MERGE INTO / latest-crawl-wins upsert)
# ---------------------------------------------------------------------------
def q_upsert(sf_dir: str):
    """Apply an insert/update/delete changelog to a base snapshot,
    latest revision wins — the recrawl-bookkeeping MERGE that turns a
    WARC change stream back into a current-state table
    (:func:`stages.cdc.merge_changelog`).  Log derivation is
    deterministic from documents: every doc is a rev-0 insert; docs
    with ``doc_id % 3 == 0`` get a rev-1 update (content re-hashed
    with '@1'), ``% 9 == 0`` additionally a rev-2 update ('@2'), and
    ``% 7 == 0`` a rev-3 delete tombstone — so some keys carry 1–4
    log rows, deletes sometimes shadow updates, and the winner is
    never order-of-arrival dependent.  Output: surviving urls with
    the winning revision, its content hash, and how many log rows
    folded (tombstones included).

    Scale shape: the changelog never groups per-url in Ray — a
    per-block combiner keeps one candidate per key, ONE coarse
    shuffle folds candidates (stages/cdc.py)."""
    from bb_ocr_ray.stages.cdc import merge_changelog

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def _rows(sub: pd.DataFrame, rev: int, op: str, salt: str | None):
        return pd.DataFrame({
            "url": [f"u{int(d)}" for d in sub["doc_id"]],
            "rev": np.full(len(sub), rev, dtype=np.int64),
            "op": np.full(len(sub), op, dtype=object),
            "content_hash": [None] * len(sub) if salt is None else
            [md5_hex((t or "") + salt) for t in sub["text"]]})

    def base(b: pd.DataFrame) -> pd.DataFrame:
        return _rows(b, 0, "I", "")

    def delta(b: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([
            _rows(b[b["doc_id"] % 3 == 0], 1, "U", "@1"),
            _rows(b[b["doc_id"] % 9 == 0], 2, "U", "@2"),
            _rows(b[b["doc_id"] % 7 == 0], 3, "D", None),
        ], ignore_index=True)

    log = (docs.map_batches(base, batch_format="pandas")
           .union(docs.map_batches(delta, batch_format="pandas")))
    merged = merge_changelog(log, key="url", order_col="rev")

    out = merged.to_pandas()
    out = out.rename(columns={"rev": "last_rev"})
    out["last_rev"] = out["last_rev"].astype("int64")
    return (out[["url", "last_rev", "content_hash", "n_versions"]]
            .sort_values("url").reset_index(drop=True))


QUERIES.update({"q_upsert": q_upsert})


# ---------------------------------------------------------------------------
# SCD2 intervalization (dimension history from an event stream)
# ---------------------------------------------------------------------------
def q_scd2(sf_dir: str):
    """Slowly-changing-dimension type-2 build: collapse each user's
    event stream (ordered by ts, event_id) into validity intervals —
    one row per RUN of consecutive equal event_type, with
    valid_from_us = the run's first event time, valid_to_us = the next
    run's start (NaN/NULL for the open current interval) and the run's
    event count.  The warehouse-side history table a CDC feed
    (q_upsert's sibling) is normally loaded into.

    Scale shape: ONE user-bucket coarse shuffle; the fold is
    vectorized across ALL users in the bucket (shift-based run
    detection + one grouped agg — no per-user Python).  NULL user_id
    drops (repo convention); this corpus has no NULL ts/event_type
    (a corpus with them would need IS-DISTINCT-FROM run semantics
    aligned on both engines).  Times compare as integer microseconds
    (datetime64 vs DuckDB timestamp hash differently); valid_to_us is
    float64 because the open interval is NaN/NULL."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    nb = _auto_num_buckets()
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_id", "event_type"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id"]).copy()
        b["user_id"] = b["user_id"].astype("int64")
        b["t_us"] = b["ts"].astype("datetime64[us]").astype("int64")
        b = b.drop(columns=["ts"])
        b["__coarse"] = _bucket_ids(b, ["user_id"], nb)
        return b

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t_us", "event_id"],
                          kind="mergesort")
        chg = (g["user_id"].ne(g["user_id"].shift())
               | g["event_type"].ne(g["event_type"].shift()))
        runs = (g.assign(__rid=chg.cumsum())
                .groupby("__rid", sort=True)
                .agg(user_id=("user_id", "first"),
                     event_type=("event_type", "first"),
                     valid_from_us=("t_us", "first"),
                     n_events=("t_us", "size"))
                .reset_index(drop=True))
        same_user = runs["user_id"].eq(runs["user_id"].shift(-1))
        runs["valid_to_us"] = np.where(
            same_user, runs["valid_from_us"].shift(-1), np.nan)
        runs["n_events"] = runs["n_events"].astype("int64")
        return runs[["user_id", "event_type", "valid_from_us",
                     "valid_to_us", "n_events"]]

    out = (ds.map_batches(stamp, batch_format="pandas")
           .groupby("__coarse")
           .map_groups(fold, batch_format="pandas")
           .to_pandas())
    out["valid_from_us"] = out["valid_from_us"].astype("int64")
    out["valid_to_us"] = out["valid_to_us"].astype("float64")
    return (out.sort_values(["user_id", "valid_from_us"])
            .reset_index(drop=True))


QUERIES.update({"q_scd2": q_scd2})


# ---------------------------------------------------------------------------
# k-core decomposition (fixed-round synchronous peel)
# ---------------------------------------------------------------------------
def q_kcore(sf_dir: str):
    """3-core of a deterministic doc graph via 10 synchronous peel
    rounds (:func:`stages.graph.kcore`) — the link-farm/spam density
    filter of web-graph cleaning.  Graph: doc d links to d+o for
    offsets o in {1, 2, 5} under three independent mod conditions,
    targets existence-checked by a distributed semi-join (id gaps
    prune edges on both engines).  10 rounds IS the fixpoint at every
    test corpus (measured: 6/6/10 rounds to convergence at
    sf0.001/0.01/0.1) and the fixed count is what makes the oracle
    SQL-unrollable (the q_hits MATERIALIZED-CTE precedent); production
    callers pass rounds=None to peel to the fixpoint directly.
    Output: surviving nodes with their degree in the final subgraph."""
    from bb_ocr_ray.stages.graph import kcore
    from bb_ocr_ray.stages.joins import auto_semi

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def cand(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        parts = [
            pd.DataFrame({"src": s, "dst": s + o}) for o, s in (
                (1, d[(d * d + 3 * d) % 11 >= 3]),
                (2, d[(d * 7 + 1) % 5 >= 2]),
                (5, d[(d * 3 + 2) % 7 >= 3]),
            )]
        return pd.concat(parts, ignore_index=True)

    edges = auto_semi(
        docs.map_batches(cand, batch_format="pandas")
        .map_batches(lambda b: b.rename(columns={"dst": "doc_id"}),
                     batch_format="pandas"),
        docs, on="doc_id",
    ).map_batches(lambda b: b.rename(columns={"doc_id": "dst"}),
                  batch_format="pandas")

    out = kcore(edges, k=3, rounds=10).to_pandas()
    out["node"] = out["node"].astype("int64")
    out["deg"] = out["deg"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


QUERIES.update({"q_kcore": q_kcore})


# ---------------------------------------------------------------------------
# Skyline: 2-D Pareto frontier (local-prune + merge)
# ---------------------------------------------------------------------------
def q_skyline(sf_dir: str):
    """2-D Pareto skyline over documents — maximize length (n_chars)
    and an independent hash-derived quality axis ((doc_id*37+11)%1000,
    deterministic stand-in for a model score; independence keeps the
    frontier non-trivial where two correlated axes would collapse it
    to one point).  Local-prune + merge (:mod:`stages.skyline`):
    dominance is transitive so per-batch pruning is exact, and only
    local-skyline survivors reach the single merge task.  The oracle
    is the O(n log n) gaps-free window form (strictly-greater-x max
    via a RANGE frame), not NOT EXISTS — quadratic SQL would not
    finish at sf0.1."""
    from bb_ocr_ray.stages.skyline import skyline

    ds = _read_parquet(_t(sf_dir, "documents"),
                       columns=["doc_id", "n_chars"])

    def pts(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["n_chars"])
        d = b["doc_id"].to_numpy("int64")
        return pd.DataFrame({"doc_id": d,
                             "x": b["n_chars"].to_numpy("int64"),
                             "y": (d * 37 + 11) % 1000})

    out = skyline(ds.map_batches(pts, batch_format="pandas"),
                  x="x", y="y").to_pandas()
    return (out.astype({"doc_id": "int64", "x": "int64", "y": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


QUERIES.update({"q_skyline": q_skyline})


# ---------------------------------------------------------------------------
# Interval coverage: per-user union of overlapping spans
# ---------------------------------------------------------------------------
def q_interval_coverage(sf_dir: str):
    """Total covered time + merged-island count per user over
    overlapping event intervals [ts, ts + dur): dur is a deterministic
    function of event_id (((event_id*7919)%3600 + 60) seconds — 1 min
    to 1 h, pseudo-random across the stream), so overlaps and genuine
    gaps both occur at every corpus.  ONE coarse shuffle then a
    vectorized gaps-and-islands merge (:func:`stages.streaming
    .interval_coverage`); NULL users dropped (repo convention).
    Integer-µs arithmetic end to end — exact, hash-stable."""
    from bb_ocr_ray.stages.streaming import interval_coverage

    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_id"])

    def iv(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id"])
        s = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        eid = b["event_id"].to_numpy("int64")
        dur = ((eid * 7919) % 3600 + 60) * 1_000_000
        return pd.DataFrame({"user_id": b["user_id"].astype("int64")
                             .to_numpy(),
                             "s": s, "e": s + dur})

    out = interval_coverage(ds.map_batches(iv, batch_format="pandas"),
                            key="user_id", start="s", end="e").to_pandas()
    out = out.rename(columns={"covered": "covered_us"})
    return (out.astype({"user_id": "int64", "covered_us": "int64",
                        "n_islands": "int64"})
            .sort_values("user_id").reset_index(drop=True))


QUERIES.update({"q_interval_coverage": q_interval_coverage})


# ---------------------------------------------------------------------------
# Degree assortativity: global web-graph structure statistic
# ---------------------------------------------------------------------------
def q_assortativity(sf_dir: str):
    """Newman degree assortativity of a deterministic synthetic link
    graph (3 arithmetic link rules per doc, mod max_id+1 — quadratic +
    affine + halving so degrees are skewed, same generator family as
    q_pagerank with different constants).  The operator
    (:func:`stages.graph.assortativity`) folds each edge batch to ONE
    exact-integer moment row; the correlation is computed from
    Python-int sums so engine and oracle agree bit-for-bit before the
    6 dp rounding."""
    from bb_ocr_ray.stages.graph import assortativity

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    m = int(docs.max("doc_id")) + 1

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        return pd.DataFrame({"src": np.repeat(d, 3),
                             "dst": np.stack([(d * d + 1) % m,
                                              (d * 3 + 7) % m,
                                              (d // 2 + 13) % m],
                                             axis=1).reshape(-1)})

    res = assortativity(docs.map_batches(edges, batch_format="pandas"))
    return pd.DataFrame(
        {"n_ends": pd.Series([res["n_ends"]], dtype="int64"),
         "assortativity": pd.Series(
             [float(_round_sql(res["assortativity"], 6))],
             dtype="float64")})


QUERIES.update({"q_assortativity": q_assortativity})


# ---------------------------------------------------------------------------
# Table profiling + order-independent checksum (data QA / migration)
# ---------------------------------------------------------------------------
def q_profile(sf_dir: str):
    """Single-scan column profile of the documents table
    (:func:`stages.profile.profile_table`): row/null counts, n_chars
    min/max/sum, exact distinct counts of the low-cardinality lang and
    source columns (distincts travel as bounded per-batch sets — the
    declared-cardinality contract; unbounded distincts belong to
    q_count_distinct), and empty-text count.  One row out; partial
    traffic is one row per block."""
    from bb_ocr_ray.stages.profile import profile_table

    ds = _read_parquet(_t(sf_dir, "documents"),
                       columns=["doc_id", "text", "lang", "source",
                                "n_chars"])
    p = profile_table(ds, numeric=["n_chars"],
                      categorical=["lang", "source"], text=["text"])
    return pd.DataFrame(
        {"n_rows": pd.Series([p["n_rows"]], dtype="int64"),
         "null_lang": pd.Series([p["null_lang"]], dtype="int64"),
         "distinct_lang": pd.Series([p["distinct_lang"]], dtype="int64"),
         "distinct_source": pd.Series([p["distinct_source"]],
                                      dtype="int64"),
         "min_n_chars": pd.Series([p["min_n_chars"]], dtype="int64"),
         "max_n_chars": pd.Series([p["max_n_chars"]], dtype="int64"),
         "sum_n_chars": pd.Series([p["sum_n_chars"]], dtype="int64"),
         "empty_text": pd.Series([p["empty_text"]], dtype="int64")})


QUERIES.update({"q_profile": q_profile})


def q_table_checksum(sf_dir: str):
    """Order-independent content checksum of (doc_id, text)
    (:func:`stages.profile.table_checksum`): md5 per row, top 60 bits
    summed mod 2^63-1 — commutative, so block layout and parallelism
    cannot change the digest.  The migration validator: run on both
    sides of a copy, compare two integers instead of 100 TB."""
    from bb_ocr_ray.stages.profile import table_checksum

    ds = _read_parquet(_t(sf_dir, "documents"),
                       columns=["doc_id", "text"])
    c = table_checksum(ds, cols=["doc_id", "text"])
    return pd.DataFrame(
        {"n_rows": pd.Series([c["n_rows"]], dtype="int64"),
         "checksum": pd.Series([c["checksum"]], dtype="int64")})


QUERIES.update({"q_table_checksum": q_table_checksum})


# ---------------------------------------------------------------------------
# URL canonicalization dedup (crawl front-door identity)
# ---------------------------------------------------------------------------
def q_url_canonical(sf_dir: str):
    """Canonical-URL grouping over deterministically mangled URL
    spellings: each doc synthesizes one of five messy variants of its
    canonical URL (case-shifted scheme/host, shuffled param order,
    default port + fragment, utm_*/gclid tracking params, dot-segment
    path) and :func:`functions.urls.canonicalize_url` must reduce all
    five back to ``https://site{doc_id%3}.com/p/{doc_id//16}?a=1&b=2``.
    The oracle inverts the template arithmetically (the q_link_graph /
    q_registrable_domain philosophy), so every canonicalization rule is
    value-checked, not just smoke-tested.  One coarse shuffle; at web
    scale this is the seen-set key normalizer in front of
    state/hash_index (reference keys its seen-set on the raw location
    string — aggregator.py:61-69 — which double-crawls every
    tracking-param spelling)."""
    from bb_ocr_ray.functions.urls import canonicalize_url

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def mangled(b: pd.DataFrame) -> pd.DataFrame:
        urls = []
        for x in b["doc_id"].to_numpy("int64"):
            k, pid, v = int(x) % 3, int(x) // 16, int(x) % 5
            if v == 0:
                u = f"https://site{k}.com/p/{pid}?a=1&b=2"
            elif v == 1:
                u = f"HTTPS://SITE{k}.COM/p/{pid}?b=2&a=1"
            elif v == 2:
                u = f"https://site{k}.com:443/p/{pid}?a=1&b=2#frag"
            elif v == 3:
                u = (f"https://site{k}.com/p/{pid}"
                     f"?utm_source=feed&a=1&gclid=xyz&b=2")
            else:
                u = f"https://site{k}.com/p/../p/{pid}?a=1&b=2"
            urls.append(canonicalize_url(u))
        return pd.DataFrame({"canonical": pd.array(urls, dtype="object")})

    out = coarse_agg(
        ds.map_batches(mangled, batch_format="pandas"),
        ["canonical"], {"n_docs": ("canonical", "size")},
    ).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values("canonical").reset_index(drop=True)


QUERIES.update({"q_url_canonical": q_url_canonical})


# ---------------------------------------------------------------------------
# Link prediction (resource-allocation index over co-visitation)
# ---------------------------------------------------------------------------
def q_link_predict(sf_dir: str, cap: int = 12, min_users: int = 2):
    """Resource-Allocation link prediction (Zhou, Lu & Zhang, EPJ B
    2009): score(i1,i2) = sum over shared users u of 1/deg(u) — the
    co-visitation count of q_covisit, degree-discounted so hub users
    stop dominating the candidate ranking.  Same deterministic item
    derivation (event_id % 251) and hot-user cap (12 smallest distinct
    items) as q_covisit, so deg(u) in [2, cap] for every contributing
    user and the score is EXACT in integers: emitted scaled by
    lcm(1..12) = 27720 (27720/deg is integral for every reachable
    degree), hash-stable at any scale with zero float folds.

    Scale shape: identical to q_covisit — one coarse shuffle on user
    (in-bucket global distinct + cap + wedge self-merge, weight column
    attached from the capped group size), one count/score fold on the
    pair."""
    from bb_ocr_ray.stages.coarse import _bucket_ids, coarse_agg
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    n_buckets = _auto_num_buckets()
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_id", "user_id"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id"])
        out = pd.DataFrame({
            "u": pd.to_numeric(b["user_id"]).astype("int64").to_numpy(),
            "item": (b["event_id"].to_numpy(np.int64) % 251)})
        out = out.drop_duplicates()
        out["__coarse"] = _bucket_ids(out, ["u"], n_buckets)
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["u", "item"])
             .sort_values(["u", "item"], kind="mergesort"))
        rn = g.groupby("u", sort=False).cumcount().to_numpy() + 1
        g = g[rn <= cap]
        # capped degree per user -> exact integer RA weight
        deg = g.groupby("u", sort=False)["item"].transform("size")
        g = g.assign(w=(27720 // deg.to_numpy(np.int64)))
        m = g.merge(g[["u", "item"]], on="u")
        m = m[m["item_x"] < m["item_y"]]
        return pd.DataFrame({"i1": m["item_x"].to_numpy(np.int64),
                             "i2": m["item_y"].to_numpy(np.int64),
                             "one": np.int64(1),
                             "w": m["w"].to_numpy(np.int64)})

    scored = coarse_agg(
        ds.map_batches(keyed, batch_format="pandas")
        .groupby("__coarse").map_groups(
            lambda g: pairs(g.drop(columns=["__coarse"])),
            batch_format="pandas"),
        ["i1", "i2"], {"n_users": ("one", "sum"), "ra_scaled": ("w", "sum")})

    out = scored.map_batches(
        lambda b: b[b["n_users"].to_numpy(np.int64) >= min_users],
        batch_format="pandas").to_pandas()
    if not len(out):
        out = pd.DataFrame({c: pd.array([], dtype="int64")
                            for c in ("i1", "i2", "n_users", "ra_scaled")})
    out = out.astype({c: "int64" for c in ("i1", "i2", "n_users",
                                           "ra_scaled")})
    return out.sort_values(["i1", "i2"]).reset_index(drop=True)


QUERIES.update({"q_link_predict": q_link_predict})


# ---------------------------------------------------------------------------
# Grouped Pearson correlation (exact sufficient-statistics partials)
# ---------------------------------------------------------------------------
def q_corr_grouped(sf_dir: str):
    """Per-returnflag Pearson correlation of (quantity, extendedprice)
    through EXACT integer sufficient statistics: each batch folds to
    <= |flags| partial rows of (n, Sx, Sy, Sxy, Sxx, Syy) with x =
    quantity (integral) and y = price in CENTS, carried as DECIMAL
    STRINGS so the driver fold is Python-int exact at any magnitude
    (Syy alone is ~1e14 per row — an int64 partial column would
    overflow near 10^5-row batches; the string/py-int posture is the
    q_assortativity driver-fold precedent with unbounded headroom).
    Engine and oracle both evaluate the same closed form from the same
    exact integers, so the 6 dp rounding sees identical doubles.
    Driver traffic: 6 short strings per (flag, block)."""
    import math

    ds = _read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = np.rint(b["l_quantity"].to_numpy("float64")).astype("int64")
        y = np.rint(b["l_extendedprice"].to_numpy("float64") * 100
                    ).astype("int64")
        rows = []
        flags = b["l_returnflag"].to_numpy()
        for f in np.unique(flags):
            m = flags == f
            xv, yv = x[m], y[m]
            # per-batch python-int sums: object arrays avoid the int64
            # ceiling on sum(y*y) for large batches
            rows.append({
                "flag": f, "n": str(int(m.sum())),
                "sx": str(int(xv.sum())), "sy": str(int(yv.sum())),
                "sxy": str(int(np.dot(xv.astype("object"),
                                      yv.astype("object")))),
                "sxx": str(int(np.dot(xv, xv))),
                "syy": str(int(np.dot(yv.astype("object"),
                                      yv.astype("object"))))})
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    recs = []
    for f, g in parts.groupby("flag", sort=True):
        n = sum(int(v) for v in g["n"])
        sx = sum(int(v) for v in g["sx"])
        sy = sum(int(v) for v in g["sy"])
        sxy = sum(int(v) for v in g["sxy"])
        sxx = sum(int(v) for v in g["sxx"])
        syy = sum(int(v) for v in g["syy"])
        num = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        corr = float(num) / (math.sqrt(float(vx)) * math.sqrt(float(vy)))
        recs.append({"l_returnflag": f, "n": n,
                     "corr_qty_price": float(_round_sql(corr, 6))})
    out = pd.DataFrame(recs)
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


QUERIES.update({"q_corr_grouped": q_corr_grouped})


# ---------------------------------------------------------------------------
# Per-entity exponential smoothing (recency-weighted engagement score)
# ---------------------------------------------------------------------------
def q_ewma(sf_dir: str, window: int = 8):
    """Per-user EWMA of event value over the LAST ``window`` events in
    (ts, event_id) order — the recency-weighted engagement score that
    feeds crawl scheduling / ranking freshness.  alpha = 1/4, seeded at
    the window's oldest value: E_1 = x_1, E_i = (x_i + 3 E_{i-1}) / 4.
    Emitted EXACTLY as an integer (numerator, denominator) pair per the
    repo's ratio convention: S_n = 4^(n-1) E_n = sum c_i x_i with
    integer coefficients c_1 = 3^(n-1), c_i = 3^(n-i) 4^(i-2), x in
    cents — no float fold anywhere, so hash-stable at any scale (the
    bounded window also bounds the coefficients: max 3^7*4^6 ~ 9e6,
    int64-safe against any cent value).  One coarse shuffle on user;
    in-bucket work is one vectorized mergesort + coefficient lookup,
    no per-user Python."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    n_buckets = _auto_num_buckets()
    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_id", "user_id", "ts", "value"])

    pow3 = np.power(3, np.arange(window), dtype="int64")
    pow4 = np.power(4, np.arange(window), dtype="int64")

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["user_id"].notna() & b["value"].notna()]
        out = pd.DataFrame({
            "u": pd.to_numeric(b["user_id"]).astype("int64").to_numpy(),
            "t": b["ts"].astype("datetime64[us]").astype("int64").to_numpy(),
            "eid": b["event_id"].to_numpy(np.int64),
            "x": np.rint(b["value"].to_numpy("float64") * 100
                         ).astype("int64")})
        out["__coarse"] = _bucket_ids(out, ["u"], n_buckets)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "t", "eid"], kind="mergesort")
        # keep each user's last `window` rows, oldest-first
        rn_from_end = (g.iloc[::-1].groupby("u", sort=False).cumcount()
                       .to_numpy()[::-1])
        g = g[rn_from_end < window]
        i = g.groupby("u", sort=False).cumcount().to_numpy()        # 0-based
        n = g.groupby("u", sort=False)["x"].transform("size").to_numpy(
            np.int64)
        c = np.where(i == 0, pow3[n - 1], pow3[n - 1 - i] * pow4[
            np.maximum(i - 1, 0)])
        s = g.assign(term=c * g["x"].to_numpy(np.int64),
                     den=pow4[n - 1])
        agg = (s.groupby("u", sort=False)
               .agg(ewma_num=("term", "sum"), ewma_den=("den", "first"))
               .reset_index())
        return agg.rename(columns={"u": "user_id"})

    out = (ds.map_batches(keyed, batch_format="pandas")
           .groupby("__coarse").map_groups(
               lambda g: fold(g.drop(columns=["__coarse"])),
               batch_format="pandas")
           .to_pandas())
    out = out.astype({"user_id": "int64", "ewma_num": "int64",
                      "ewma_den": "int64"})
    return out.sort_values("user_id").reset_index(drop=True)


QUERIES.update({"q_ewma": q_ewma})


# ---------------------------------------------------------------------------
# Robust grouped stats: exact trimmed mean from a value histogram
# ---------------------------------------------------------------------------
def q_trimmed_mean(sf_dir: str):
    """Per-returnflag 10%-trimmed mean of quantity, EXACT without any
    global sort: quantity is declared low-cardinality (integral 1..50),
    so each group's full order statistics are recoverable from a
    (flag, qty) -> count histogram — one coarse fold over <= 150 cells,
    then the driver trims floor(n/10) ranks off each end by cumulative
    count arithmetic (pure ints).  The same histogram trick backs exact
    grouped medians/percentiles at any corpus size; contrast
    q_exact_kth, which handles UNBOUNDED value domains with
    multi-pass selection.  Output keeps the (sum, count) integer pair
    next to the rounded mean per the repo convention."""
    ds = _read_parquet(_t(sf_dir, "lineitem"),
                       columns=["l_returnflag", "l_quantity"])

    def cells(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "flag": b["l_returnflag"].to_numpy(),
            "q": np.rint(b["l_quantity"].to_numpy("float64")
                         ).astype("int64")})

    hist = coarse_agg(
        ds.map_batches(cells, batch_format="pandas"),
        ["flag", "q"], {"cnt": ("q", "size")},
    ).to_pandas()

    recs = []
    for f, g in hist.groupby("flag", sort=True):
        g = g.sort_values("q")
        q = g["q"].to_numpy("int64")
        c = g["cnt"].to_numpy("int64")
        n = int(c.sum())
        lo, hi = n // 10, n - n // 10          # keep ranks (lo, hi]
        cum = np.concatenate([[0], np.cumsum(c)])
        kept = np.minimum(cum[1:], hi) - np.maximum(cum[:-1], lo)
        kept = np.maximum(kept, 0)
        s = int(np.dot(q, kept))
        k = int(kept.sum())
        recs.append({"l_returnflag": f, "n_kept": k, "trimmed_sum": s,
                     "trimmed_mean": float(_round_sql(
                         float(s) / float(k), 6))})
    out = pd.DataFrame(recs)
    out = out.astype({"n_kept": "int64", "trimmed_sum": "int64"})
    return out.reset_index(drop=True)


QUERIES.update({"q_trimmed_mean": q_trimmed_mean})


# ---------------------------------------------------------------------------
# Anchor-text index (what OTHER pages call a URL — the ranking signal)
# ---------------------------------------------------------------------------
def q_anchor_terms(sf_dir: str):
    """Per-(target path, anchor term) counts from REAL (href, anchor
    text) pairing over the raw html bytes
    (:func:`kernel.links.extract_anchor_texts`: inner markup up to the
    first </a>, tags stripped, whitespace collapsed; fragment-only and
    non-http(s) anchors dropped — so the 3 share-widget anchors must
    NOT appear).  Terms are ASCII-lowercased whitespace tokens.  The
    synthetic chrome emits a fixed (path, term) multiset per page, so
    the oracle inverts the template arithmetically (the q_link_graph
    philosophy) and every pairing/strip/tokenize rule is value-checked.
    ONE coarse fold on the compound key; at web scale this is the
    anchor-text index build — the out-of-page labeling signal."""
    from urllib.parse import urlsplit

    from bb_ocr_ray.functions.textstats import _ASCII_LOWER
    from bb_ocr_ray.kernel.links import extract_anchor_texts
    from bb_ocr_ray.sources.pages import read_pages

    pages = read_pages(sf_dir)

    def terms(b: pd.DataFrame) -> pd.DataFrame:
        paths, toks = [], []
        for url, html in zip(b["url"], b["html"]):
            txt = bytes(html).decode("utf-8", errors="replace")
            for link, text in extract_anchor_texts(txt, url):
                p = urlsplit(link).path
                for w in text.translate(_ASCII_LOWER).split():
                    paths.append(p)
                    toks.append(w)
        return pd.DataFrame({"path": pd.array(paths, dtype="object"),
                             "term": pd.array(toks, dtype="object")})

    out = coarse_agg(
        pages.map_batches(terms, batch_format="pandas"),
        ["path", "term"], {"n": ("term", "size")},
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["path", "term"]).reset_index(drop=True)


QUERIES.update({"q_anchor_terms": q_anchor_terms})


# ---------------------------------------------------------------------------
# Dataset-level vocabulary overlap (corpus similarity / snapshot QA)
# ---------------------------------------------------------------------------
def q_source_overlap(sf_dir: str):
    """Exact vocabulary Jaccard between every SOURCE pair — the
    dataset-similarity probe (how much do two crawls / snapshots share
    a vocabulary?), computed without ever joining corpus-sized sets:
    distinct (source, token) pairs fold through ONE coarse shuffle on
    token; each bucket emits per-token source-SET membership collapsed
    to a '|'-joined mask, and masks have at most 2^|sources| values
    (sources are the declared low-cardinality column, q_profile
    contract), so the driver sees a bounded histogram and recovers
    every pairwise intersection/union by inclusion arithmetic — exact
    integers, zero float folds until the final ratio."""
    from bb_ocr_ray.functions.hashing import ws_tokens
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    n_buckets = _auto_num_buckets()
    ds = _read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        seen = set()
        for s, t in zip(b["source"], b["text"]):
            for w in set(ws_tokens(t or "")):
                seen.add((s, w))
        out = pd.DataFrame(list(seen) or None, columns=["source", "tok"])
        out["__coarse"] = _bucket_ids(out, ["tok"], n_buckets)
        return out

    def masks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["source", "tok"])
        if not len(g):
            return pd.DataFrame({"mask": pd.array([], dtype="object"),
                                 "n": pd.array([], dtype="int64")})
        # vectorized membership fold: sorted-source bit codes OR-reduced
        # per token run (no per-token Python); bit order == sorted order
        # so the decoded mask string is identical across buckets
        srcs = np.sort(g["source"].unique())
        assert len(srcs) <= 63, "source is the declared low-cardinality column"
        bit = {s: np.int64(1) << i for i, s in enumerate(srcs)}
        gv = g.sort_values("tok", kind="mergesort")
        codes = gv["source"].map(bit).to_numpy("int64")
        toks = gv["tok"].to_numpy(dtype=object)
        starts = np.concatenate(
            [[0], np.flatnonzero(toks[1:] != toks[:-1]) + 1])
        m = np.bitwise_or.reduceat(codes, starts)
        vals, counts = np.unique(m, return_counts=True)
        names = ["|".join(srcs[j] for j in range(len(srcs))
                          if int(v) >> j & 1) for v in vals]
        return pd.DataFrame({"mask": pd.array(names, dtype="object"),
                             "n": counts.astype("int64")})

    hist = (ds.map_batches(pairs, batch_format="pandas")
            .groupby("__coarse").map_groups(
                lambda g: masks(g.drop(columns=["__coarse"])),
                batch_format="pandas")
            .to_pandas())
    hist = hist.groupby("mask", as_index=False)["n"].sum()

    sources = sorted({s for m in hist["mask"] for s in m.split("|")})
    sets = [frozenset(m.split("|")) for m in hist["mask"]]
    ns = hist["n"].to_numpy("int64")
    recs = []
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            inter = int(sum(n for st, n in zip(sets, ns)
                            if a in st and b in st))
            union = int(sum(n for st, n in zip(sets, ns)
                            if a in st or b in st))
            recs.append({
                "source_a": a, "source_b": b,
                "n_common": inter, "n_union": union,
                "jaccard": float(_round_sql(
                    float(inter) / float(union), 6)) if union else 0.0})
    out = pd.DataFrame(recs)
    out = out.astype({"n_common": "int64", "n_union": "int64"})
    return out.reset_index(drop=True)


QUERIES.update({"q_source_overlap": q_source_overlap})


# ---------------------------------------------------------------------------
# Web-graph QA statistics: degree distribution + reciprocity
# ---------------------------------------------------------------------------
def q_degree_dist(sf_dir: str):
    """Log2-bucketed in/out-degree distribution of a deterministic
    synthetic link graph (the q_assortativity generator family with
    fresh constants) — THE first-look sanity statistic of any crawl
    graph (is it power-law-ish, did the frontier collapse onto a hub?).
    Two bounded folds: degrees by ONE coarse endpoint fold (|V|-row),
    then the log2 histogram (≤64 cells per direction) via a second
    tiny fold — per-node degrees never reach the driver.  Bucket =
    floor(log2(deg)): log2 of an exact power of two is exact in IEEE,
    and every other integer's log2 is irrational (margin ≫ 1 ulp), so
    engine and oracle floor identically."""
    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    m = int(docs.max("doc_id")) + 1

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        return pd.DataFrame({"src": np.repeat(d, 3),
                             "dst": np.stack([(d * d + 5) % m,
                                              (d * 7 + 3) % m,
                                              (d // 3 + 11) % m],
                                             axis=1).reshape(-1)})

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "direction": np.repeat(np.array(["out", "in"], dtype=object),
                                   len(b)),
            "node": np.concatenate([b["src"].to_numpy("int64"),
                                    b["dst"].to_numpy("int64")])})

    deg = coarse_agg(
        docs.map_batches(edges, batch_format="pandas")
        .map_batches(endpoints, batch_format="pandas"),
        ["direction", "node"], {"deg": ("node", "size")})

    def bucketed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "direction": b["direction"].to_numpy(dtype=object),
            "bucket": np.floor(np.log2(
                b["deg"].to_numpy("float64"))).astype("int64")})

    out = coarse_agg(
        deg.map_batches(bucketed, batch_format="pandas"),
        ["direction", "bucket"], {"n_nodes": ("bucket", "size")},
    ).to_pandas()
    out["n_nodes"] = out["n_nodes"].astype("int64")
    return (out.sort_values(["direction", "bucket"])
            .reset_index(drop=True))


QUERIES.update({"q_degree_dist": q_degree_dist})


def q_reciprocity(sf_dir: str):
    """Edge reciprocity of the directed synthetic graph — the share of
    DISTINCT edges whose reverse edge also exists (mutual-link rate, a
    core web-graph statistic: high reciprocity = social/nav structure,
    low = hierarchy).  The whole check is ONE coarse shuffle on the
    UNORDERED pair key {u,v} (min,max) — both directions of a pair and
    all duplicates land in the same bucket, so in-bucket logic is a
    vectorized distinct + pair-size fold; no self-join, no edge table
    on the driver.  Self-loops are their own reverse.  Exact integer
    (n_mutual, n_edges) + the 6 dp ratio."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    n_buckets = _auto_num_buckets()
    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    m = int(docs.max("doc_id")) + 1

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        src = np.repeat(d, 3)
        dst = np.stack([(d * d + 5) % m, (d * 7 + 3) % m,
                        (d // 3 + 11) % m], axis=1).reshape(-1)
        out = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
        out["lo"] = np.minimum(out["src"], out["dst"])
        out["hi"] = np.maximum(out["src"], out["dst"])
        out["__coarse"] = _bucket_ids(out, ["lo", "hi"], n_buckets)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["src", "dst"])
        sizes = g.groupby(["lo", "hi"], sort=False)["src"].transform("size")
        self_loop = (g["src"] == g["dst"]).to_numpy()
        # a 2-edge unordered group is a mutual pair (directions are
        # distinct rows); a self-loop is its own reverse
        mutual = int((sizes.to_numpy() == 2).sum()) + int(self_loop.sum())
        return pd.DataFrame({"n_mutual": pd.Series([mutual], dtype="int64"),
                             "n_edges": pd.Series([len(g)], dtype="int64")})

    parts = (docs.map_batches(edges, batch_format="pandas")
             .groupby("__coarse").map_groups(
                 lambda g: fold(g.drop(columns=["__coarse"])),
                 batch_format="pandas")
             .to_pandas())
    n_mutual = int(parts["n_mutual"].sum())
    n_edges = int(parts["n_edges"].sum())
    return pd.DataFrame(
        {"n_mutual": pd.Series([n_mutual], dtype="int64"),
         "n_edges": pd.Series([n_edges], dtype="int64"),
         "reciprocity": pd.Series(
             [float(_round_sql(float(n_mutual) / float(n_edges), 6))],
             dtype="float64")})


QUERIES.update({"q_reciprocity": q_reciprocity})


# ---------------------------------------------------------------------------
# Distribution-drift QA: Kolmogorov–Smirnov per source vs the rest
# ---------------------------------------------------------------------------
def q_ks_test(sf_dir: str):
    """Per-source two-sample Kolmogorov–Smirnov statistic of the
    n_chars length distribution against the REST of the corpus — the
    standard drift detector for "did this crawl source's content shape
    change?" (run-over-run data QA).  One corpus pass folds the
    (source, n_chars) histogram through coarse_agg; the histogram is
    VALUE-bounded (≤ |sources| × max_doc_len rows — aggregate-sized at
    any corpus scale, never row-cardinality), so the cumulative fold
    runs on the driver like q_trimmed_mean's order-statistic
    arithmetic.  D is EXACT: with per-source totals (n_s, n_r) constant,
    max_x |F_s − F_r| = max_x |cs·n_r − cr·n_s| / (n_s·n_r), so the max
    is taken over INTEGER cross-products (python ints — no overflow at
    any corpus size) and divided once, rounded 6 dp."""
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "n_chars"])
    hist = coarse_agg(docs, ["source", "n_chars"],
                      {"c": ("n_chars", "size")}).to_pandas()
    hist["c"] = hist["c"].astype("int64")
    pv = (hist.pivot_table(index="n_chars", columns="source", values="c",
                           aggfunc="sum", fill_value=0)
          .sort_index())
    cum = pv.cumsum(axis=0)
    n_s = pv.sum(axis=0)
    gn = int(n_s.sum())
    cum_all = cum.sum(axis=1)
    recs = []
    for s in sorted(pv.columns):
        ns = int(n_s[s])
        nr = gn - ns
        cs = cum[s].to_numpy("int64").astype(object)
        cr = cum_all.to_numpy("int64").astype(object) - cs
        d_num = max(abs(int(a) * nr - int(b) * ns)
                    for a, b in zip(cs, cr))
        ks = float(d_num) / (float(ns) * float(nr))
        recs.append({"source": s, "n_source": ns,
                     "ks_d": float(_round_sql(ks, 6))})
    out = pd.DataFrame(recs).sort_values("source").reset_index(drop=True)
    out["n_source"] = out["n_source"].astype("int64")
    return out


QUERIES.update({"q_ks_test": q_ks_test})


# ---------------------------------------------------------------------------
# A/B experiment readout: Welch's t per event type from exact moments
# ---------------------------------------------------------------------------
def q_ab_test(sf_dir: str):
    """Welch's t-test per event_type between two deterministic
    experiment arms (arm = user_id % 2) over event value — the A/B
    readout every event pipeline ships.  Sufficient statistics
    (n, Σx, Σx²) fold per batch into ≤ |types|×2 partial rows carried
    as DECIMAL STRINGS (the q_corr_grouped posture: the driver fold is
    python-int exact at any magnitude — Σx² in cents² overflows int64
    near 10^7 rows).  Engine and oracle evaluate the identical closed
    form from the identical exact integers, so the 6 dp rounding sees
    the same doubles.  Value is fixed to cents (rint(value·100)) before
    any summation; driver traffic is 3 short strings per
    (type, arm, block)."""
    import math

    ds = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_type", "user_id", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["user_id"].notna() & b["value"].notna()]
        arm = (b["user_id"].to_numpy("int64") % 2).astype("int64")
        x = np.rint(b["value"].to_numpy("float64") * 100).astype("int64")
        types = b["event_type"].to_numpy()
        rows = []
        for t in np.unique(types):
            for a in (0, 1):
                m = (types == t) & (arm == a)
                if not m.any():
                    continue
                xv = x[m]
                rows.append({
                    "event_type": t, "arm": str(a),
                    "n": str(int(m.sum())),
                    "sx": str(int(xv.sum())),
                    "sxx": str(int(np.dot(xv.astype("object"),
                                          xv.astype("object"))))})
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    stats: dict = {}
    for (t, a), g in parts.groupby(["event_type", "arm"], sort=True):
        stats[(t, int(a))] = (sum(int(v) for v in g["n"]),
                              sum(int(v) for v in g["sx"]),
                              sum(int(v) for v in g["sxx"]))
    recs = []
    for t in sorted({k[0] for k in stats}):
        na, sa, ssa = stats.get((t, 0), (0, 0, 0))
        nb, sb, ssb = stats.get((t, 1), (0, 0, 0))
        ma = float(sa) / na
        mb = float(sb) / nb
        # sample variance via the same expression shape as the oracle:
        # (Σx² − (Σx)²/n) / (n−1), everything double before dividing
        va = (float(ssa) - float(sa) * float(sa) / na) / (na - 1)
        vb = (float(ssb) - float(sb) * float(sb) / nb) / (nb - 1)
        tt = (ma - mb) / math.sqrt(va / na + vb / nb)
        recs.append({"event_type": t,
                     "n_a": na, "n_b": nb,
                     "mean_a_cents": float(_round_sql(ma, 6)),
                     "mean_b_cents": float(_round_sql(mb, 6)),
                     "t_welch": float(_round_sql(tt, 6))})
    out = pd.DataFrame(recs)
    out["n_a"] = out["n_a"].astype("int64")
    out["n_b"] = out["n_b"].astype("int64")
    return out.reset_index(drop=True)


QUERIES.update({"q_ab_test": q_ab_test})


# ---------------------------------------------------------------------------
# Hashing-trick vectorizer (fixed-width sparse features, doc-local)
# ---------------------------------------------------------------------------
def q_feature_hash(sf_dir: str, n_buckets: int = 256, probe_mod: int = 41):
    """Feature-hashing vectorizer (the 'hashing trick': Weinberger et
    al., ICML'09 — public method) over a deterministic doc sample:
    token OCCURRENCE counts folded into a fixed 256-bucket space via
    stable_u64(token) % 256 (md5_number_upper in the oracle), the
    vocabulary-free featurizer that feeds linear quality classifiers at
    corpus scale.  Entirely doc-local — each row's features are
    computed inside its own map task with a per-batch distinct-token
    memo, ZERO shuffles; output bounded by |sample| × n_buckets.  The
    probe gate (doc_id % 41) bounds the demo output; production drops
    the gate and writes per-shard parquet."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import stable_u64, ws_tokens

    ds = _read_parquet(_t(sf_dir, "documents"),
                       columns=["doc_id", "text"])

    def feats(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["doc_id"] % probe_mod == 0]
        memo: dict = {}
        ids, buckets, counts = [], [], []
        for did, tx in zip(b["doc_id"], b["text"]):
            acc: Counter = Counter()
            for tok, c in Counter(ws_tokens(tx or "")).items():
                bk = memo.get(tok)
                if bk is None:
                    bk = memo[tok] = stable_u64(tok) % n_buckets
                acc[bk] += c
            for bk in sorted(acc):
                ids.append(did)
                buckets.append(bk)
                counts.append(acc[bk])
        return pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "bucket": pd.array(buckets, dtype="int64"),
            "n": pd.array(counts, dtype="int64")})

    out = ds.map_batches(feats, batch_format="pandas").to_pandas()
    return (out.sort_values(["doc_id", "bucket"])
            .reset_index(drop=True))


QUERIES.update({"q_feature_hash": q_feature_hash})


# ---------------------------------------------------------------------------
# Benford first-digit distribution (ingest QA / anomaly screen)
# ---------------------------------------------------------------------------
def q_benford(sf_dir: str):
    """Benford's-law first-significant-digit distribution of order
    totals — the classic ingest-QA screen for fabricated or truncated
    numeric feeds (Benford 1938; Nigrini's audit use is public
    method).  Prices quantize to integer cents first (rint(x*100)),
    and the leading digit of the cents integer IS the leading
    significant digit of the dollar amount (scaling by a power of ten
    never changes it), so both engines read digit 1-9 off exact
    integers — no float log in the digit path.  Per-batch bincount
    partials (≤9 rows each) fold on the driver: traffic is 9 ints per
    block regardless of corpus size.  Output: observed count + share
    vs the Benford expectation log10(1+1/d), both 6 dp."""
    import math

    ds = _read_parquet(_t(sf_dir, "orders"), columns=["o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b["o_totalprice"].to_numpy("float64") * 100)
        cents = cents[np.isfinite(cents)].astype("int64")
        cents = cents[cents > 0]
        # leading digit: integer divide by 10 until < 10 (vectorized
        # loop over at most ~12 decades; no float log edge cases)
        while (cents >= 10).any():
            big = cents >= 10
            cents[big] //= 10
        cnt = np.bincount(cents, minlength=10)[1:10]
        return pd.DataFrame({"digit": np.arange(1, 10, dtype="int64"),
                             "n": cnt.astype("int64")})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("digit", as_index=False)["n"].sum()
    total = int(agg["n"].sum())
    agg = agg[agg["n"] > 0].copy()
    agg["pct"] = [float(_round_sql(int(n) / total, 6)) for n in agg["n"]]
    agg["benford_pct"] = [float(_round_sql(math.log10(1.0 + 1.0 / int(d)), 6))
                          for d in agg["digit"]]
    agg["digit"] = agg["digit"].astype("int64")
    agg["n"] = agg["n"].astype("int64")
    return agg.sort_values("digit").reset_index(drop=True)


QUERIES.update({"q_benford": q_benford})


# ---------------------------------------------------------------------------
# Per-source language-mix entropy (corpus composition QA)
# ---------------------------------------------------------------------------
def q_lang_entropy(sf_dir: str):
    """Per-source Shannon entropy (nats) of the language mix — the
    corpus-composition monitor a multilingual crawl ships next to
    q_ks_test's shape drift: a source whose lang entropy collapses
    started emitting one language (or lost its langid).  One corpus
    pass folds (source, lang) counts through coarse_agg — the table is
    |sources|x|langs|, aggregate-sized at any corpus scale — and the
    driver evaluates -sum(p ln p) per source over langs in ascending
    order from exact integer counts.  Cross-term float order differs
    from the oracle's unordered sum by <=1 ulp; 6 dp rounding absorbs
    it (the registry-wide convention for bounded float folds)."""
    import math

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "lang"])
    cnt = coarse_agg(docs, ["source", "lang"],
                     {"c": ("lang", "size")}).to_pandas()
    cnt["c"] = cnt["c"].astype("int64")
    recs = []
    for s, g in cnt.groupby("source", sort=True):
        g = g.sort_values("lang")
        n = int(g["c"].sum())
        h = sum(-(int(c) / n) * math.log(int(c) / n)
                for c in g["c"])
        recs.append({"source": s, "n_docs": n, "n_langs": len(g),
                     "entropy_nats": float(_round_sql(h, 6))})
    out = pd.DataFrame(recs)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_langs"] = out["n_langs"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


QUERIES.update({"q_lang_entropy": q_lang_entropy})


# ---------------------------------------------------------------------------
# Traffic concentration (Simpson index / effective-user count)
# ---------------------------------------------------------------------------
def q_user_concentration(sf_dir: str):
    """Simpson concentration of event traffic across users — the
    "is one bot eating the crawl budget?" QA scalar: sum p_u^2 (the
    collision probability of the user distribution) and its inverse,
    the effective user count.  Per-user totals need exactness, so ONE
    coarse fold produces the (user, count) table (row-bounded by
    |users|, never on the driver); a second map folds each batch to
    sufficient statistics (n_users, sum c, sum c^2) carried as DECIMAL
    STRINGS (the q_corr_grouped posture — sum c^2 outgrows int64 near
    10^9 events from one hot key), and the driver folds python ints.
    Both engines evaluate the identical closed forms from identical
    exact integers."""
    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    per_user = coarse_agg(
        ev.map_batches(
            lambda b: b[b["user_id"].notna()].astype({"user_id": "int64"}),
            batch_format="pandas"),
        ["user_id"], {"c": ("user_id", "size")})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy("int64").astype(object)
        return pd.DataFrame({"n_users": [str(len(c))],
                             "sc": [str(int((c).sum()))],
                             "sc2": [str(int((c * c).sum()))]})

    parts = per_user.map_batches(partial, batch_format="pandas").to_pandas()
    n_users = sum(int(v) for v in parts["n_users"])
    n = sum(int(v) for v in parts["sc"])
    s2 = sum(int(v) for v in parts["sc2"])
    simpson = float(s2) / (float(n) * float(n))
    eff = float(n) * float(n) / float(s2)
    return pd.DataFrame({
        "n_events": pd.array([n], dtype="int64"),
        "n_users": pd.array([n_users], dtype="int64"),
        "simpson": [float(_round_sql(simpson, 6))],
        "eff_users": [float(_round_sql(eff, 6))]})


QUERIES.update({"q_user_concentration": q_user_concentration})


# ---------------------------------------------------------------------------
# Chi-squared contingency cells (lang x source independence audit)
# ---------------------------------------------------------------------------
def q_chi2_cells(sf_dir: str):
    """Chi-squared independence audit of the lang x source contingency
    table, emitted PER CELL (observed, expected, chi2 term) rather than
    as one scalar — per-cell rows keep every double a pure function of
    exact integer marginals (no cross-cell float summation whose order
    could differ between engines) and tell the operator WHICH cell
    drives the dependence.  One coarse fold produces the observed
    counts (|langs|x|sources| — aggregate-sized); the driver completes
    the grid with zero cells (a missing combination still contributes
    its full expectation) and evaluates e = rt*ct/n and (o-e)^2/e with
    the same association order as the SQL."""
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["lang", "source"])
    obs = coarse_agg(docs, ["lang", "source"],
                     {"o": ("lang", "size")}).to_pandas()
    obs["o"] = obs["o"].astype("int64")
    rt = obs.groupby("lang")["o"].sum()
    ct = obs.groupby("source")["o"].sum()
    n = float(int(obs["o"].sum()))
    seen = {(l, s): int(o) for l, s, o in
            zip(obs["lang"], obs["source"], obs["o"])}
    recs = []
    for l in sorted(rt.index):
        for s in sorted(ct.index):
            o = seen.get((l, s), 0)
            e = float(int(rt[l])) * int(ct[s]) / n
            recs.append({"lang": l, "source": s,
                         "n_obs": o,
                         "expected": float(_round_sql(e, 6)),
                         "chi2_term": float(_round_sql((o - e) ** 2 / e, 6))})
    out = pd.DataFrame(recs)
    out["n_obs"] = out["n_obs"].astype("int64")
    return out.sort_values(["lang", "source"]).reset_index(drop=True)


QUERIES.update({"q_chi2_cells": q_chi2_cells})


# ---------------------------------------------------------------------------
# Grouped median absolute deviation (robust scale, no global sort)
# ---------------------------------------------------------------------------
def q_mad(sf_dir: str):
    """Grouped median-absolute-deviation of line-item price — the
    outlier-robust scale statistic (Hampel 1974, public method) for
    price-feed QA, computed EXACTLY with no global sort: prices live on
    a fixed cents grid, so one coarse fold builds the (flag, cents)
    value histogram (VALUE-bounded — the price grid, not row
    cardinality) and the driver extracts both nested medians by
    cumulative-count arithmetic, the q_trimmed_mean posture.  All
    order statistics stay in integer domain: the median is carried
    DOUBLED (med2 = lo+hi cents, exact even when interpolated), each
    deviation |2c - med2| is an exact integer, and the deviation
    median doubles again (mad4), so mad = mad4/4 is exact to the
    quarter-cent — bit-identical to DuckDB's interpolating
    median()/mad() at any corpus size."""
    li = _read_parquet(_t(sf_dir, "lineitem"),
                       columns=["l_returnflag", "l_extendedprice"])

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "flag": b["l_returnflag"],
            "cents": np.rint(b["l_extendedprice"].to_numpy("float64")
                             * 100).astype("int64")})

    hist = coarse_agg(li.map_batches(to_cents, batch_format="pandas"),
                      ["flag", "cents"],
                      {"c": ("cents", "size")}).to_pandas()
    hist["c"] = hist["c"].astype("int64")

    def med2_of(vals: np.ndarray, cnts: np.ndarray) -> int:
        # doubled interpolated median from a sorted value histogram
        n = int(cnts.sum())
        cum = np.cumsum(cnts)
        k1, k2 = (n + 1) // 2, (n + 2) // 2      # 1-indexed ranks
        lo = int(vals[np.searchsorted(cum, k1)])
        hi = int(vals[np.searchsorted(cum, k2)])
        return lo + hi

    recs = []
    for f, g in hist.groupby("flag", sort=True):
        g = g.sort_values("cents")
        vals = g["cents"].to_numpy("int64")
        cnts = g["c"].to_numpy("int64")
        med2 = med2_of(vals, cnts)
        dev = pd.DataFrame({"d2": np.abs(2 * vals - med2), "c": cnts})
        dev = dev.groupby("d2", as_index=False)["c"].sum().sort_values("d2")
        mad4 = med2_of(dev["d2"].to_numpy("int64"),
                       dev["c"].to_numpy("int64"))
        recs.append({
            "l_returnflag": f,
            "n_rows": int(cnts.sum()),
            "median_price": float(_round_sql(med2 / 200.0, 6)),
            "mad_price": float(_round_sql(mad4 / 400.0, 6))})
    out = pd.DataFrame(recs)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


QUERIES.update({"q_mad": q_mad})


# ---------------------------------------------------------------------------
# Mann-Whitney U / rank-biserial AUC per event type (nonparametric A/B)
# ---------------------------------------------------------------------------
def q_mannwhitney(sf_dir: str):
    """Mann-Whitney U between the two deterministic experiment arms
    (user_id % 2) per event type — the nonparametric sibling of
    q_ab_test's Welch t, and its U/(na*nb) normalization is exactly
    the ROC-AUC of "does arm A stochastically dominate arm B".
    Values quantize to cents; ONE coarse fold builds the
    (type, cents, arm) histogram (VALUE-bounded like q_ks_test) and
    the driver computes 2U as an exact python integer via cumulative
    counts with midrank tie handling: 2U_a = sum_v ca(v) *
    (2*cb_below(v) + cb_eq(v)).  The oracle evaluates the identical
    integer through one window cumsum (linear, no pair join).  U and
    AUC are then single divisions of exact integers on both sides."""
    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_type", "user_id", "value"])

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["user_id"].notna() & b["value"].notna()]
        return pd.DataFrame({
            "event_type": b["event_type"],
            "x": np.rint(b["value"].to_numpy("float64") * 100)
                   .astype("int64"),
            "arm": (b["user_id"].to_numpy("int64") % 2).astype("int64")})

    hist = coarse_agg(ev.map_batches(cents, batch_format="pandas"),
                      ["event_type", "x", "arm"],
                      {"c": ("x", "size")}).to_pandas()
    hist["c"] = hist["c"].astype("int64")
    recs = []
    for t, g in hist.groupby("event_type", sort=True):
        pv = (g.pivot_table(index="x", columns="arm", values="c",
                            aggfunc="sum", fill_value=0)
              .reindex(columns=[0, 1], fill_value=0).sort_index())
        ca = pv[0].to_numpy("int64")
        cb = pv[1].to_numpy("int64")
        na, nb = int(ca.sum()), int(cb.sum())
        cb_below = np.concatenate([[0], np.cumsum(cb)[:-1]])
        u2 = sum(int(a) * (2 * int(bl) + int(be))
                 for a, bl, be in zip(ca, cb_below, cb))
        recs.append({
            "event_type": t,
            "n_a": na, "n_b": nb,
            "u_a": u2 / 2.0,
            "auc": float(_round_sql(float(u2) / (2.0 * na * nb), 6))})
    out = pd.DataFrame(recs)
    out["n_a"] = out["n_a"].astype("int64")
    out["n_b"] = out["n_b"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


QUERIES.update({"q_mannwhitney": q_mannwhitney})


# ---------------------------------------------------------------------------
# Robots-style disallow-prefix filter (crawl-policy gate)
# ---------------------------------------------------------------------------
def q_robots_filter(sf_dir: str):
    """Crawl-policy gate: apply a per-host robots.txt-style DISALLOW
    prefix list to every page URL — the filter every polite crawl runs
    before fetch/refetch scheduling (robots exclusion is a public
    protocol, RFC 9309).  URLs reconstruct from the q_url_canonical
    template (host site{doc_id%3}.com, path /p/{doc_id//16}) and are
    parsed with the REAL stdlib parser (urllib), then matched against
    a broadcast rule list with vectorized str.startswith — rules are
    tiny (a robots file per host), so this is a pure map: ZERO
    shuffles; per-batch (host, allowed) count partials fold through
    one aggregate-sized coarse_agg.  The oracle inverts the template
    arithmetically and applies the same prefixes via LIKE."""
    from urllib.parse import urlsplit

    rules = {"site0.com": ("/p/1",),
             "site1.com": ("/p/7",),
             "site2.com": ("/p/3",)}

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        urls = [f"https://site{int(x) % 3}.com/p/{int(x) // 16}"
                for x in d]
        parts = [urlsplit(u) for u in urls]
        host = pd.Series([p.hostname for p in parts], dtype="object")
        path = pd.Series([p.path for p in parts], dtype="object")
        blocked = np.zeros(len(b), dtype=bool)
        for h, prefixes in rules.items():
            on_host = (host == h).to_numpy()
            for pre in prefixes:
                blocked |= on_host & path.str.startswith(pre).to_numpy()
        return pd.DataFrame({
            "host": host,
            "allowed": (~blocked).astype("int64"),
            "blocked_": blocked.astype("int64")})

    out = coarse_agg(ds.map_batches(gate, batch_format="pandas"),
                     ["host"], {"n_allowed": ("allowed", "sum"),
                                "n_blocked": ("blocked_", "sum")}).to_pandas()
    out["n_allowed"] = out["n_allowed"].astype("int64")
    out["n_blocked"] = out["n_blocked"].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


QUERIES.update({"q_robots_filter": q_robots_filter})


# ---------------------------------------------------------------------------
# Market-basket association rules (support / confidence / lift)
# ---------------------------------------------------------------------------
def q_market_basket(sf_dir: str, item_mod: int = 97, min_support: int = 25):
    """Association rules over order baskets (Agrawal & Srikant's
    classic support/confidence/lift frame, VLDB'94 — public method):
    items derive as l_partkey % 97, baskets are orders.  Scale shape:
    ONE coarse shuffle on the order key lands each basket in one
    bucket, where a vectorized self-merge emits its distinct item
    pairs PLUS tagged singleton/basket marker rows ((i,-1) per
    basket-item, (-2,-2) per basket), so a single count fold then
    yields pair supports, item supports, and the basket total in one
    aggregate-sized table (<= C(97,2)+97+1 rows) — no second corpus
    pass, nothing row-sized on the driver.  Basket size is
    schema-bounded (TPC-H caps lineitems per order), so no hot-key cap
    is needed — the q_covisit celebrity argument does not arise.
    Rules emit BOTH directions; confidence and lift are single
    divisions of exact integers, identical on both engines."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    n_buckets = _auto_num_buckets()
    li = _read_parquet(_t(sf_dir, "lineitem"),
                       columns=["l_orderkey", "l_partkey"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "o": b["l_orderkey"].to_numpy("int64"),
            "i": (b["l_partkey"].to_numpy("int64") % item_mod)})
        out = out.drop_duplicates()
        out["__coarse"] = _bucket_ids(out, ["o"], n_buckets)
        return out

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["o", "i"])
        m = g.merge(g, on="o")
        m = m[m["i_x"] < m["i_y"]]
        n_baskets = g["o"].nunique()
        return pd.DataFrame({
            "i1": np.concatenate([m["i_x"].to_numpy("int64"),
                                  g["i"].to_numpy("int64"),
                                  np.full(n_baskets, -2, dtype="int64")]),
            "i2": np.concatenate([m["i_y"].to_numpy("int64"),
                                  np.full(len(g), -1, dtype="int64"),
                                  np.full(n_baskets, -2, dtype="int64")])})

    counted = coarse_agg(
        li.map_batches(keyed, batch_format="pandas")
        .groupby("__coarse").map_groups(
            lambda g: emit(g.drop(columns=["__coarse"])),
            batch_format="pandas"),
        ["i1", "i2"], {"n": ("i1", "size")}).to_pandas()
    counted["n"] = counted["n"].astype("int64")

    n_orders = int(counted.loc[(counted["i1"] == -2)
                               & (counted["i2"] == -2), "n"].iloc[0])
    item_cnt = {int(r.i1): int(r.n) for r in
                counted[(counted["i2"] == -1)].itertuples()}
    pairs = counted[(counted["i1"] >= 0) & (counted["i2"] >= 0)
                    & (counted["n"] >= min_support)]
    recs = []
    for r in pairs.itertuples():
        sup = int(r.n)
        for a, c in ((int(r.i1), int(r.i2)), (int(r.i2), int(r.i1))):
            recs.append({
                "ante": a, "cons": c, "support": sup,
                "confidence": float(_round_sql(sup / item_cnt[a], 6)),
                "lift": float(_round_sql(
                    float(sup * n_orders)
                    / float(item_cnt[a] * item_cnt[c]), 6))})
    out = pd.DataFrame(recs)
    if not len(out):
        out = pd.DataFrame({c: pd.array([], dtype="int64")
                            for c in ("ante", "cons", "support")}
                           ).assign(confidence=pd.array([], dtype="float64"),
                                    lift=pd.array([], dtype="float64"))
    out = out.astype({"ante": "int64", "cons": "int64", "support": "int64"})
    return out.sort_values(["ante", "cons"]).reset_index(drop=True)


QUERIES.update({"q_market_basket": q_market_basket})


# ---------------------------------------------------------------------------
# Global clustering coefficient (triangles / wedges)
# ---------------------------------------------------------------------------
def q_clustering_coeff(sf_dir: str):
    """Global clustering coefficient 3T/W of the synthetic link graph
    — the one-scalar cohesion QA next to q_triangle_count's bucketed
    counts and q_degree_dist's histogram.  Triangles reuse the
    degree-oriented ``stages.graph.triangle_count`` (celebrity-safe);
    wedges W = sum_v deg(v)(deg(v)-1)/2 come from the SAME normalized
    undirected edge set via one coarse degree fold, with per-batch
    sum-of-d(d-1) partials carried as decimal strings (the
    q_user_concentration posture — a 10^6-degree hub's term alone
    nears int64).  The edge generator mirrors q_triangle_count
    verbatim so both operators audit one graph.  T and W are exact
    python ints; the coefficient is one division, 6 dp."""
    from bb_ocr_ray.stages.dedup import dedup_pairs
    from bb_ocr_ray.stages.graph import triangle_count
    from bb_ocr_ray.stages.joins import auto_semi

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def gen(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        d1 = d[((d * d + 3 * d) % 11) >= 3]
        d2 = d[((7 * d + 5) % 13) >= 4]
        return pd.DataFrame({
            "src": np.concatenate([d1, d2]),
            "dst": np.concatenate([d1 + 1, d2 + 2])})

    cand = docs.map_batches(gen, batch_format="pandas")
    edges = auto_semi(
        cand.map_batches(lambda b: b.rename(columns={"dst": "doc_id"}),
                         batch_format="pandas"),
        docs, on="doc_id",
    ).map_batches(lambda b: b.rename(columns={"doc_id": "dst"}),
                  batch_format="pandas")

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        u = b["src"].to_numpy(np.int64)
        v = b["dst"].to_numpy(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pd.DataFrame({"id_a": np.minimum(u, v),
                             "id_b": np.maximum(u, v)})

    und = dedup_pairs(
        edges.map_batches(norm, batch_format="pandas")).materialize()

    def both_ends(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [b["id_a"].to_numpy("int64"), b["id_b"].to_numpy("int64")])})

    deg = coarse_agg(und.map_batches(both_ends, batch_format="pandas"),
                     ["node"], {"d": ("node", "size")})

    def wedge_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["d"].to_numpy("int64").astype(object)
        return pd.DataFrame({"w2": [str(int((d * (d - 1)).sum()))]})

    parts = deg.map_batches(wedge_partial, batch_format="pandas").to_pandas()
    wedges = sum(int(v) for v in parts["w2"]) // 2

    tri = triangle_count(und.map_batches(
        lambda b: b.rename(columns={"id_a": "src", "id_b": "dst"}),
        batch_format="pandas"))
    n_tri = int(tri.count())

    cc = 3.0 * n_tri / wedges if wedges else 0.0
    return pd.DataFrame({
        "n_triangles": pd.array([n_tri], dtype="int64"),
        "n_wedges": pd.array([wedges], dtype="int64"),
        "global_cc": [float(_round_sql(cc, 6))]})


QUERIES.update({"q_clustering_coeff": q_clustering_coeff})


# ---------------------------------------------------------------------------
# Gini coefficient of per-user traffic (inequality QA next to Simpson)
# ---------------------------------------------------------------------------
def q_gini(sf_dir: str):
    """Gini coefficient of event traffic across users — the Lorenz
    inequality scalar next to q_user_concentration's Simpson index
    (both are public textbook statistics).  The rank formula
    G = (2*sum_i i*c_i - (n+1)*sum c) / (n*sum c) needs counts in
    sorted order, but NEVER a global row sort: per-user counts fold
    through one coarse shuffle (user-cardinality table, never on the
    driver), then a second fold collapses them to a COUNT-VALUE
    histogram (value-bounded — distinct traffic levels, not users; the
    q_trimmed_mean posture), from which the driver reconstructs
    sum_i i*c_i exactly: a run of m users at value v occupying ranks
    S+1..S+m contributes v*(S*m + m*(m+1)/2).  All integer arithmetic
    is python-int (sum i*c_i nears int64 at ~10^9 events); the final
    division is the only float, 6 dp on both engines."""
    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    per_user = coarse_agg(
        ev.map_batches(
            lambda b: b[b["user_id"].notna()].astype({"user_id": "int64"}),
            batch_format="pandas"),
        ["user_id"], {"c": ("user_id", "size")})
    hist = coarse_agg(per_user, ["c"], {"m": ("c", "size")}).to_pandas()
    hist = hist.astype({"c": "int64", "m": "int64"}).sort_values("c")

    S = 0          # users ranked so far
    sic = 0        # sum_i i*c_i, exact
    tot = 0
    for v, m in zip(hist["c"], hist["m"]):
        v, m = int(v), int(m)
        sic += v * (S * m + m * (m + 1) // 2)
        tot += v * m
        S += m
    gini = (2.0 * sic - (S + 1.0) * tot) / (1.0 * S * tot)
    return pd.DataFrame({
        "n_users": pd.array([S], dtype="int64"),
        "n_events": pd.array([tot], dtype="int64"),
        "gini": [float(_round_sql(gini, 6))]})


QUERIES.update({"q_gini": q_gini})


# ---------------------------------------------------------------------------
# Daily new-vs-returning user decomposition (growth accounting)
# ---------------------------------------------------------------------------
def q_new_users(sf_dir: str):
    """Daily active users split into NEW (first-ever activity that
    day) and returning — the growth-accounting readout next to
    q_retention's cohort matrix.  Day is integer epoch_us // 86400e6
    (never date_trunc: timezone/week conventions differ across
    engines).  Plan: one coarse fold computes each user's first-day
    (min — user-cardinality, stays distributed), a second folds it to
    (day, n_new); in parallel the deduped (user, day) activity pairs
    fold to (day, n_active).  Both result tables are |days|-bounded,
    so the final left-merge runs on the driver over aggregate-sized
    frames.  NULL user/ts rows drop on both engines."""
    _US_PER_DAY = 86_400_000_000
    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts"])
        us = b["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame({
            "u": pd.to_numeric(b["user_id"]).astype("int64").to_numpy(),
            "day": (us.to_numpy() // _US_PER_DAY).astype("int64")})

    pairs = ev.map_batches(keyed, batch_format="pandas")
    first = coarse_agg(pairs, ["u"], {"first_day": ("day", "min")})
    new_by_day = coarse_agg(first, ["first_day"],
                            {"n_new": ("first_day", "size")}).to_pandas()
    active = coarse_agg(
        coarse_agg(pairs, ["u", "day"], {"k": ("day", "size")}),
        ["day"], {"n_active": ("day", "size")}).to_pandas()

    out = active.merge(new_by_day.rename(columns={"first_day": "day"}),
                       on="day", how="left")
    out["n_new"] = out["n_new"].fillna(0).astype("int64")
    out["n_active"] = out["n_active"].astype("int64")
    out["day"] = out["day"].astype("int64")
    out["n_returning"] = (out["n_active"] - out["n_new"]).astype("int64")
    return out.sort_values("day").reset_index(drop=True)


QUERIES.update({"q_new_users": q_new_users})


# ---------------------------------------------------------------------------
# Last-touch click attribution for purchases (72 h lookback)
# ---------------------------------------------------------------------------
def q_attribution(sf_dir: str):
    """Last-touch attribution: each purchase is attributed to the SAME
    user's most recent click strictly before it in (ts, event_id)
    order, provided that click is within the 72 h lookback — the
    standard marketing-attribution rule (last non-direct touch).  The
    most-recent-click candidate is chosen FIRST, then the window test
    applies (an over-window click shadows older in-window ones — the
    textbook definition, and what the oracle's frame-excluded window
    cummax computes).  Unattributed purchases emit the -1 sentinel in
    click_id/lag_us so the output stays pure int64.

    Scale shape: filter to click/purchase rows at the read, ONE coarse
    shuffle on user, in-bucket (u, ts, event_id) sort, then a
    vectorized groupwise carry: cummax of click positions (pandas
    C-level cummax) shifted by one row so a purchase never attributes
    to itself-position; output is row-per-purchase."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    _W_US = 72 * 3600 * 1_000_000
    n_buckets = _auto_num_buckets()
    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_id", "ts", "user_id", "event_type"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts"])
        b = b[b["event_type"].isin(("click", "purchase"))]
        out = pd.DataFrame({
            "u": pd.to_numeric(b["user_id"]).astype("int64").to_numpy(),
            "t": b["ts"].astype("datetime64[us]").astype("int64").to_numpy(),
            "event_id": b["event_id"].to_numpy(np.int64),
            "is_click": (b["event_type"] == "click").to_numpy()})
        out["__coarse"] = _bucket_ids(out, ["u"], n_buckets)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "t", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        pos = np.arange(len(g), dtype="int64")
        g["cp"] = np.where(g["is_click"].to_numpy(), pos, -1)
        last = g.groupby("u", sort=False)["cp"].cummax()
        prev = last.groupby(g["u"], sort=False).shift(1, fill_value=-1)
        prev = prev.to_numpy("int64")
        is_p = ~g["is_click"].to_numpy()
        pt = g["t"].to_numpy()[is_p]
        pid = g["event_id"].to_numpy()[is_p]
        pu = g["u"].to_numpy()[is_p]
        cand = prev[is_p]
        has = cand >= 0
        ct = np.where(has, g["t"].to_numpy()[np.maximum(cand, 0)], 0)
        cid = np.where(has, g["event_id"].to_numpy()[np.maximum(cand, 0)], -1)
        lag = pt - ct
        ok = has & (lag <= _W_US)
        return pd.DataFrame({
            "purchase_id": pid,
            "user_id": pu,
            "click_id": np.where(ok, cid, -1).astype("int64"),
            "lag_us": np.where(ok, lag, -1).astype("int64")})

    out = (ev.map_batches(keyed, batch_format="pandas")
           .groupby("__coarse").map_groups(
               lambda g: fold(g.drop(columns=["__coarse"])),
               batch_format="pandas")
           .to_pandas())
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("purchase_id").reset_index(drop=True)


QUERIES.update({"q_attribution": q_attribution})


# ---------------------------------------------------------------------------
# Zipf slope of the token frequency spectrum (corpus-health scalar)
# ---------------------------------------------------------------------------
def q_zipf_slope(sf_dir: str):
    """OLS slope of ln(frequency) on ln(rank) over the corpus' top-200
    tokens — natural text sits near the Zipf -1 line, and a corpus
    whose slope drifts flat (boilerplate/templating) or steep
    (vocabulary collapse) fails ingest QA (Zipf 1949; public method).
    Per-batch token-count partials fold through one coarse shuffle
    (vocab-bounded table); the top-200 cut is a Dataset sort+limit
    with a total (n DESC, tok ASC) tiebreak so rank assignment is
    deterministic on both engines.  The slope is computed from
    centered sums in rank order; 200 same-magnitude float terms agree
    with the oracle's regr_slope within ulps — 6 dp absorbs it (the
    registry's bounded-float-fold convention)."""
    import math

    from bb_ocr_ray.functions.hashing import ws_tokens

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        cnt: Counter = Counter()
        for t in b["text"]:
            cnt.update(ws_tokens(t or ""))
        return pd.DataFrame({"tok": list(cnt.keys()),
                             "n": np.fromiter(cnt.values(), dtype="int64")})

    vocab = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                       ["tok"], {"n": ("n", "sum")})
    top = (vocab.sort(["n", "tok"], descending=[True, False])
           .limit(200).to_pandas())
    top["n"] = top["n"].astype("int64")
    k = len(top)
    x = np.log(np.arange(1, k + 1, dtype="float64"))
    y = np.log(top["n"].to_numpy("float64"))
    mx, my = x.mean(), y.mean()
    slope = float(((x - mx) * (y - my)).sum() / ((x - mx) ** 2).sum())
    return pd.DataFrame({
        "k": pd.array([k], dtype="int64"),
        "n_top1": pd.array([int(top["n"].iloc[0])], dtype="int64"),
        "n_top_last": pd.array([int(top["n"].iloc[-1])], dtype="int64"),
        "zipf_slope": [float(_round_sql(slope, 6))]})


QUERIES.update({"q_zipf_slope": q_zipf_slope})


# ---------------------------------------------------------------------------
# Per-source exact-duplicate share (ingest-QA ratio on content hashes)
# ---------------------------------------------------------------------------
def q_dup_ratio(sf_dir: str):
    """Per-source exact-duplicate share: of each source's docs, how
    many belong to a content-hash group of size > 1 WITHIN that source
    — the scalar a crawl operator watches before paying for near-dup
    passes (a source at 40% exact dups gets fixed upstream, not
    MinHashed).  Two chained coarse folds: (source, md5) group sizes
    (doc-cardinality in, hash-cardinality out, never on the driver),
    then per-batch partials over the group-size table fold to one row
    per source.  Only the 16-byte hashes ever shuffle — never text
    (the q_dedup_exact posture)."""
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def hashed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": b["source"],
            "h": [md5_hex(t or "") for t in b["text"]]})

    groups = coarse_agg(docs.map_batches(hashed, batch_format="pandas"),
                        ["source", "h"], {"c": ("h", "size")})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy("int64")
        g = pd.DataFrame({"source": b["source"], "n_docs": c,
                          "n_distinct": np.ones(len(b), dtype="int64"),
                          "n_dup_docs": np.where(c > 1, c, 0)})
        return g.groupby("source", as_index=False).sum()

    out = coarse_agg(groups.map_batches(partial, batch_format="pandas"),
                     ["source"], {"n_docs": ("n_docs", "sum"),
                                  "n_distinct": ("n_distinct", "sum"),
                                  "n_dup_docs": ("n_dup_docs", "sum")}
                     ).to_pandas()
    for c in ("n_docs", "n_distinct", "n_dup_docs"):
        out[c] = out[c].astype("int64")
    out["dup_ratio"] = [float(_round_sql(int(d) / int(n), 6))
                        for d, n in zip(out["n_dup_docs"], out["n_docs"])]
    return out.sort_values("source").reset_index(drop=True)


QUERIES.update({"q_dup_ratio": q_dup_ratio})


# ---------------------------------------------------------------------------
# Rolling 7-day distinct actives (windowed COUNT DISTINCT without a window)
# ---------------------------------------------------------------------------
def q_rolling_actives(sf_dir: str):
    """Rolling 7-day distinct active users per day (the WAU curve) —
    windowed COUNT(DISTINCT) computed WITHOUT re-counting each user in
    every window: a user active on day a covers days [a, a+6], so each
    user's active-day set becomes a union of intervals (runs split
    where consecutive active days gap by more than 7), each run emits
    a +1/-1 boundary delta, and the per-day delta fold + driver cumsum
    reconstructs the exact windowed distinct count — the classic
    sweep-line / gaps-and-islands reduction (q_interval_coverage's
    posture applied to a sliding window).  Traffic after the (u, day)
    dedup is two delta rows per user-run; the delta and day tables are
    |days|-bounded on the driver.  Output per ACTIVE day: that day's
    DAU and the trailing-7-day distinct count."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    _US_PER_DAY = 86_400_000_000
    n_buckets = _auto_num_buckets()
    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts"])
        us = b["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame({
            "u": pd.to_numeric(b["user_id"]).astype("int64").to_numpy(),
            "day": (us.to_numpy() // _US_PER_DAY).astype("int64")})

    # materialize the deduped pairs ONCE: both the DAU fold and the
    # run extraction consume them, and a lazy chain would re-execute
    # the read+dedup per consumer (the heavy_hitters rescan finding)
    pairs = coarse_agg(ev.map_batches(keyed, batch_format="pandas"),
                       ["u", "day"], {"k": ("day", "size")}).materialize()
    dau = coarse_agg(pairs, ["day"], {"dau": ("day", "size")}).to_pandas()

    def runs(b: pd.DataFrame) -> pd.DataFrame:
        g = b.sort_values(["u", "day"], kind="mergesort")
        u = g["u"].to_numpy("int64")
        d = g["day"].to_numpy("int64")
        new = np.r_[True, (u[1:] != u[:-1]) | (d[1:] - d[:-1] > 7)]
        starts = d[new]
        last = np.r_[new[1:], True]          # last element of each run
        ends = d[last] + 7                   # -1 lands at last_day + 7
        return pd.DataFrame({
            "day": np.concatenate([starts, ends]),
            "delta": np.concatenate([np.ones(len(starts), dtype="int64"),
                                     -np.ones(len(ends), dtype="int64")])})

    # per-user runs need each user whole in one task: bucket on u
    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__coarse"] = _bucket_ids(b, ["u"], n_buckets)
        return b

    deltas = coarse_agg(
        pairs.map_batches(stamp, batch_format="pandas")
        .groupby("__coarse").map_groups(
            lambda g: runs(g.drop(columns=["__coarse"])),
            batch_format="pandas"),
        ["day"], {"delta": ("delta", "sum")}).to_pandas()
    deltas = deltas.astype({"day": "int64", "delta": "int64"}
                           ).sort_values("day")
    dd = deltas["day"].to_numpy("int64")
    cum = deltas["delta"].to_numpy("int64").cumsum()

    out = dau.astype({"day": "int64", "dau": "int64"}
                     ).sort_values("day").reset_index(drop=True)
    idx = np.searchsorted(dd, out["day"].to_numpy("int64"), side="right")
    out["mau7"] = cum[idx - 1].astype("int64")   # idx >= 1: day has its +1
    return out


QUERIES.update({"q_rolling_actives": q_rolling_actives})


# ---------------------------------------------------------------------------
# Cohort lifetime value (signup-week cohorts x purchase-week offsets)
# ---------------------------------------------------------------------------
def q_cohort_ltv(sf_dir: str):
    """Cohort LTV: purchase revenue folded into (signup-week cohort,
    week offset) cells — q_retention's matrix with money instead of
    presence.  Week is integer epoch-day // 7 on both engines.  Plan:
    per-user min signup week folds through one coarse shuffle
    (user-cardinality, stays distributed), purchases key by user and
    attach their cohort through the bucketed hash_join (users without
    a signup drop — inner), then one aggregate-sized fold sums exact
    integer cents per cell.  Offsets can be negative (purchases before
    the first recorded signup) and are reported as such."""
    from bb_ocr_ray.stages.joins import hash_join

    _US_PER_WEEK = 7 * 86_400_000_000
    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_type", "value"])

    def keyed(kind):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.dropna(subset=["user_id", "ts"])
            b = b[b["event_type"] == kind]
            if kind == "purchase":
                b = b.dropna(subset=["value"])
            us = b["ts"].astype("datetime64[us]").astype("int64")
            out = pd.DataFrame({
                "u": pd.to_numeric(b["user_id"]).astype("int64").to_numpy(),
                "week": (us.to_numpy() // _US_PER_WEEK).astype("int64")})
            if kind == "purchase":
                out["cents"] = np.rint(
                    b["value"].to_numpy("float64") * 100).astype("int64")
            return out
        return fn

    cohorts = coarse_agg(
        ev.map_batches(keyed("signup"), batch_format="pandas"),
        ["u"], {"cohort_week": ("week", "min")})
    buys = ev.map_batches(keyed("purchase"), batch_format="pandas")
    joined = hash_join(buys, cohorts, on="u")

    def cells(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "cohort_week": b["cohort_week"].astype("int64"),
            "week_offset": (b["week"].astype("int64")
                            - b["cohort_week"].astype("int64")),
            "n_purchases": np.ones(len(b), dtype="int64"),
            "revenue_cents": b["cents"].astype("int64")})
        return g.groupby(["cohort_week", "week_offset"],
                         as_index=False).sum()

    out = coarse_agg(joined.map_batches(cells, batch_format="pandas"),
                     ["cohort_week", "week_offset"],
                     {"n_purchases": ("n_purchases", "sum"),
                      "revenue_cents": ("revenue_cents", "sum")}).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return (out.sort_values(["cohort_week", "week_offset"])
            .reset_index(drop=True))


QUERIES.update({"q_cohort_ltv": q_cohort_ltv})


# ---------------------------------------------------------------------------
# Embedding L2-norm bands (vector-ingest QA)
# ---------------------------------------------------------------------------
def q_norm_bands(sf_dir: str):
    """L2-norm distribution of the embedding column in 0.1-wide bands
    — the vector-ingest QA histogram (un-normalized or zero vectors
    land in the wrong band and fail the gate before any ANN index is
    built).  Pure map + one aggregate-sized fold; the float32 values
    widen to float64 BEFORE squaring on both engines, and the norm is
    rounded to 4 dp before banding so the ulp-level difference between
    numpy's pairwise and SQL's sequential summation (~1e-12) can never
    flip a band edge (band width 0.1 >> 5e-5 grain).  Output per band:
    count and the rounded min/max norm (rounding is monotone, so
    min/max commute with it)."""
    emb = _read_parquet(_t(sf_dir, "embeddings"),
                        columns=["vec_id", "embedding"])

    def bands(b: pd.DataFrame) -> pd.DataFrame:
        X = np.asarray([np.asarray(e, dtype="float64") for e in
                        b["embedding"]])
        norm = _round_sql(np.sqrt((X * X).sum(axis=1)), 4)
        g = pd.DataFrame({
            "band": np.floor(norm * 10).astype("int64"),
            "n_vecs": np.ones(len(b), dtype="int64"),
            "min_norm": norm, "max_norm": norm})
        return g.groupby("band", as_index=False).agg(
            n_vecs=("n_vecs", "sum"), min_norm=("min_norm", "min"),
            max_norm=("max_norm", "max"))

    out = coarse_agg(emb.map_batches(bands, batch_format="pandas"),
                     ["band"], {"n_vecs": ("n_vecs", "sum"),
                                "min_norm": ("min_norm", "min"),
                                "max_norm": ("max_norm", "max")}).to_pandas()
    out["band"] = out["band"].astype("int64")
    out["n_vecs"] = out["n_vecs"].astype("int64")
    return out.sort_values("band").reset_index(drop=True)


QUERIES.update({"q_norm_bands": q_norm_bands})


# ---------------------------------------------------------------------------
# Brand-safety / blocklist term scan (broadcast patterns, zero shuffle)
# ---------------------------------------------------------------------------
_TERM_SCAN_PATTERNS = ("table", "hash", "merge batch", "zzz-absent-term")


def q_term_scan(sf_dir: str):
    """Literal multi-term scan over the corpus — the brand-safety /
    blocklist counter every content pipeline runs (a tiny pattern list
    against every document).  The pattern list broadcasts by closure
    (bytes-sized); each batch counts NON-OVERLAPPING occurrences with
    vectorized ``Series.str.count`` on regex-escaped patterns —
    identical semantics to Python ``str.count`` and to the oracle's
    (len(text) - len(replace(text, pat, ''))) / len(pat) identity.
    Zero shuffles: per-batch partials are <= |patterns| rows and fold
    through one aggregate-sized coarse_agg.  Terms absent from the
    corpus still emit a zero row (the driver completes the pattern
    grid), so a clean corpus yields an all-zero report, not an empty
    one."""
    import re

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def scan(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"].fillna("")
        recs = []
        for pat in _TERM_SCAN_PATTERNS:
            c = t.str.count(re.escape(pat)).to_numpy("int64")
            recs.append({"term": pat,
                         "n_docs": int((c > 0).sum()),
                         "n_occurrences": int(c.sum())})
        return pd.DataFrame(recs)

    out = coarse_agg(docs.map_batches(scan, batch_format="pandas"),
                     ["term"], {"n_docs": ("n_docs", "sum"),
                                "n_occurrences": ("n_occurrences", "sum")}
                     ).to_pandas()
    grid = pd.DataFrame({"term": list(_TERM_SCAN_PATTERNS)})
    out = grid.merge(out, on="term", how="left").fillna(0)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_occurrences"] = out["n_occurrences"].astype("int64")
    return out.sort_values("term").reset_index(drop=True)


QUERIES.update({"q_term_scan": q_term_scan})


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth curve (corpus-health QA)
# ---------------------------------------------------------------------------
def q_vocab_growth(sf_dir: str):
    """Vocabulary size after each power-of-two doc_id prefix — the
    Heaps'-law growth curve (Heaps 1978, public method): natural
    corpora grow vocab ~ n^beta with beta<1, and a curve that goes
    flat (template spam) or linear (random noise/IDs) fails ingest QA.
    One pass: per-token FIRST doc_id folds through one coarse shuffle
    (vocab-bounded), collapses to a <=64-row histogram keyed by
    bit_length(first_doc_id) — token t is new in prefix 2^k exactly
    when k = bit_length(first) — and the driver cumsums.  Exact
    integers everywhere; doc_id 0 lands in bin 0 on both engines
    (oracle: floor(log2(fd))+1 is exact for all int64 because powers
    of two are exactly representable doubles)."""
    from bb_ocr_ray.functions.hashing import ws_tokens

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        first: dict = {}
        for did, t in zip(b["doc_id"].to_numpy("int64"), b["text"]):
            for tok in ws_tokens(t or ""):
                if tok not in first or did < first[tok]:
                    first[tok] = did
        return pd.DataFrame({"tok": list(first.keys()),
                             "fd": np.fromiter(first.values(),
                                               dtype="int64")})

    firsts = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                        ["tok"], {"fd": ("fd", "min")})

    def bins(b: pd.DataFrame) -> pd.DataFrame:
        k = np.array([int(x).bit_length() for x in b["fd"]], dtype="int64")
        return (pd.DataFrame({"k": k, "n": np.ones(len(b), dtype="int64")})
                .groupby("k", as_index=False).sum())

    hist = coarse_agg(firsts.map_batches(bins, batch_format="pandas"),
                      ["k"], {"n": ("n", "sum")}).to_pandas()
    hist = hist.astype({"k": "int64", "n": "int64"}).sort_values("k")
    ks = np.arange(int(hist["k"].max()) + 1, dtype="int64")
    new = np.zeros(len(ks), dtype="int64")
    new[hist["k"].to_numpy()] = hist["n"].to_numpy()
    return pd.DataFrame({"k": ks,
                         "new_tokens": new,
                         "vocab": new.cumsum().astype("int64")})


QUERIES.update({"q_vocab_growth": q_vocab_growth})


# ---------------------------------------------------------------------------
# Consistent-hash crawler shard balance (hot-domain skew QA)
# ---------------------------------------------------------------------------
def q_shard_balance(sf_dir: str, n_shards: int = 8):
    """Crawler shard assignment audit: domains consistent-hash to
    ``n_shards`` fetcher shards (stable md5 so a shard roster change
    never remaps everything — the public Karger consistent-hashing
    motivation), and the report shows per-shard domain and DOC counts.
    Domains derive from the corpus URL template (hot.example.com takes
    30% of docs), so one shard inherits the hot domain and the doc
    imbalance is visible even though DOMAIN counts are balanced —
    exactly the skew a per-domain-sharded fetcher must see before it
    ships.  Zero shuffles on rows: per-batch (shard, domain) count
    partials fold through one aggregate-sized coarse_agg."""
    from bb_ocr_ray.functions.hashing import stable_u64

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        m = d % 10
        doms = np.where(m < 3, "hot.example.com",
                        np.char.add(np.char.add(
                            "site", m.astype("U2")), ".example.com"))
        g = (pd.DataFrame({"domain": doms, "n_docs": 1})
             .groupby("domain", as_index=False).sum())
        g["shard"] = [stable_u64(x) % n_shards for x in g["domain"]]
        return g[["shard", "domain", "n_docs"]]

    per_dom = coarse_agg(docs.map_batches(assign, batch_format="pandas"),
                         ["shard", "domain"], {"n_docs": ("n_docs", "sum")})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"shard": b["shard"].astype("int64"),
                          "n_domains": np.ones(len(b), dtype="int64"),
                          "n_docs": b["n_docs"].astype("int64")})
        return g.groupby("shard", as_index=False).sum()

    out = coarse_agg(per_dom.map_batches(fold, batch_format="pandas"),
                     ["shard"], {"n_domains": ("n_domains", "sum"),
                                 "n_docs": ("n_docs", "sum")}).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("shard").reset_index(drop=True)


QUERIES.update({"q_shard_balance": q_shard_balance})


# ---------------------------------------------------------------------------
# Duplicate-cluster size histogram (dedup planning QA)
# ---------------------------------------------------------------------------
def q_dup_cluster_sizes(sf_dir: str):
    """Histogram of PREFIX-fingerprint cluster sizes — docs clustered
    by the md5 of their first 64 characters, the cheap template
    detector a crawl runs before committing to a full dedup pass
    (boilerplate-led pages share lead bytes long before they share
    bodies; a few million-member clusters mean the hot-key dedup path
    is needed).  Two chained hash-only folds: (md5 -> cluster size)
    is hash-cardinality and stays distributed; (size -> n_clusters)
    is value-bounded.  Only 16-byte hashes shuffle, never text
    (q_dedup_exact posture)."""
    docs = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    clusters = coarse_agg(
        docs.map_batches(
            lambda b: pd.DataFrame({"h": [md5_hex((t or "")[:64])
                                          for t in b["text"]]}),
            batch_format="pandas"),
        ["h"], {"c": ("h", "size")})
    out = coarse_agg(clusters, ["c"],
                     {"n_clusters": ("c", "size")}).to_pandas()
    out = out.rename(columns={"c": "cluster_size"})
    out["cluster_size"] = out["cluster_size"].astype("int64")
    out["n_clusters"] = out["n_clusters"].astype("int64")
    out["n_docs"] = (out["cluster_size"] * out["n_clusters"]).astype("int64")
    return out.sort_values("cluster_size").reset_index(drop=True)


QUERIES.update({"q_dup_cluster_sizes": q_dup_cluster_sizes})


# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary cells)
# ---------------------------------------------------------------------------
def q_rfm(sf_dir: str):
    """RFM segmentation of purchasers — users bucketed by Recency
    (weeks since last purchase, relative to the corpus' last purchase
    day), Frequency (bit_length of purchase count) and Monetary
    (bit_length of whole-dollar total), with user counts per cell —
    the classic direct-marketing segmentation (Hughes 1994; public
    method) on FIXED integer bands so both engines bucket exactly.
    Plan: purchases key once and materialize (three consumers — the
    global-max scalar, the per-user fold, the cells — must not re-read
    parquet); per-user (last_day, n, cents) folds through one coarse
    shuffle (user-cardinality, stays distributed); banding is a map;
    the cell fold is aggregate-sized."""
    _US_PER_DAY = 86_400_000_000
    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_type", "value"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts", "value"])
        b = b[b["event_type"] == "purchase"]
        us = b["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame({
            "u": pd.to_numeric(b["user_id"]).astype("int64").to_numpy(),
            "day": (us.to_numpy() // _US_PER_DAY).astype("int64"),
            "cents": np.rint(b["value"].to_numpy("float64")
                             * 100).astype("int64"),
            "one": np.ones(len(b), dtype="int64")})

    buys = ev.map_batches(keyed, batch_format="pandas").materialize()
    max_day = int(buys.max("day"))
    per_user = coarse_agg(buys, ["u"], {"last_day": ("day", "max"),
                                        "f": ("one", "sum"),
                                        "cents": ("cents", "sum")})

    def cells(b: pd.DataFrame) -> pd.DataFrame:
        r = ((max_day - b["last_day"].astype("int64")) // 7).astype("int64")
        f = np.array([int(x).bit_length() for x in b["f"]], dtype="int64")
        m = np.array([(int(x) // 100).bit_length() for x in b["cents"]],
                     dtype="int64")
        g = pd.DataFrame({"r_band": r, "f_band": f, "m_band": m,
                          "n_users": np.ones(len(b), dtype="int64")})
        return g.groupby(["r_band", "f_band", "m_band"],
                         as_index=False).sum()

    out = coarse_agg(per_user.map_batches(cells, batch_format="pandas"),
                     ["r_band", "f_band", "m_band"],
                     {"n_users": ("n_users", "sum")}).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return (out.sort_values(["r_band", "f_band", "m_band"])
            .reset_index(drop=True))


QUERIES.update({"q_rfm": q_rfm})


# ---------------------------------------------------------------------------
# Longest consecutive-day streak histogram (gaps-and-islands engagement QA)
# ---------------------------------------------------------------------------
def q_streak(sf_dir: str):
    """Longest consecutive-day activity streak per user, reported as a
    bounded histogram (streak length -> user count) — the classic
    gaps-and-islands engagement statistic.  Plan: per-batch distinct
    (user, day) partial -> ONE coarse shuffle on user (every user's
    full day set lands in one bucket) -> vectorized island detection
    across ALL users in the bucket at once (run ids from a
    consecutive-day mask, run lengths via bincount, per-user max) ->
    a streak-length-bounded histogram fold.  Nothing user-cardinality
    ever sits on the driver; the only all-to-all moves distinct
    (user, day) int64 pairs."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    nb = _auto_num_buckets()
    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts"])
        g = pd.DataFrame({
            "u": b["user_id"].astype("int64").to_numpy(),
            "day": (b["ts"].astype("datetime64[us]").astype("int64")
                    // 86_400_000_000)}).drop_duplicates()
        g["__coarse"] = _bucket_ids(g, ["u"], nb)
        return g

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["u", "day"])
             .sort_values(["u", "day"], kind="mergesort"))
        u = g["u"].to_numpy("int64")
        d = g["day"].to_numpy("int64")
        if len(u) == 0:
            return pd.DataFrame({"streak": pd.Series([], dtype="int64"),
                                 "n_users": pd.Series([], dtype="int64")})
        # a new run starts at any row that is not exactly +1 day of the
        # SAME user's previous row
        consec = np.concatenate(
            [[False], (u[1:] == u[:-1]) & (d[1:] == d[:-1] + 1)])
        run_id = np.cumsum(~consec) - 1
        run_len = np.bincount(run_id)
        run_user = u[np.concatenate([[True], run_id[1:] != run_id[:-1]])]
        per_user = (pd.DataFrame({"u": run_user, "len": run_len})
                    .groupby("u")["len"].max())
        hist = per_user.value_counts().sort_index()
        return pd.DataFrame({"streak": hist.index.to_numpy("int64"),
                             "n_users": hist.to_numpy("int64")})

    folded = (ev.map_batches(pairs, batch_format="pandas")
              .groupby("__coarse").map_groups(bucket, batch_format="pandas"))
    out = coarse_agg(folded, ["streak"],
                     {"n_users": ("n_users", "sum")}).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("streak").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Peak 1h sliding-window event rate per type (burst detection)
# ---------------------------------------------------------------------------
def q_burst_peak(sf_dir: str):
    """Per event_type: the PEAK number of events inside any backward
    1-hour window anchored at an event ([ts-1h, ts] inclusive), plus
    the earliest day that peak occurs — the traffic-burst /
    rate-limit QA statistic.  Scale shape: windows never cross more
    than one day boundary, so each event lands in its own
    (type, day) bucket as an anchor AND events in a day's final hour
    are replicated into the NEXT day's bucket as context-only rows
    (anchor=0).  One coarse shuffle on (type, day); in-bucket counts
    are two vectorized searchsorted calls over the bucket's sorted
    microsecond stamps; the per-(type, day) maxima then fold into a
    type-bounded table.  No self-join, no per-row loops, exact
    integer microsecond arithmetic throughout."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    _H = 3_600_000_000            # 1h in us
    _D = 86_400_000_000           # 1 day in us
    nb = _auto_num_buckets()
    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_type", "ts"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["ts"])
        us = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        day = us // _D
        et = b["event_type"].to_numpy()
        own = pd.DataFrame({"et": et, "day": day, "us": us,
                            "anchor": np.ones(len(us), dtype="int64")})
        tail = us - day * _D >= _D - _H      # final hour of the day
        rep = pd.DataFrame({"et": et[tail], "day": day[tail] + 1,
                            "us": us[tail],
                            "anchor": np.zeros(int(tail.sum()),
                                               dtype="int64")})
        g = pd.concat([own, rep], ignore_index=True)
        g["__coarse"] = _bucket_ids(g, ["et", "day"], nb)
        return g

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (et, day), sub in g.groupby(["et", "day"], sort=False):
            hay = np.sort(sub["us"].to_numpy("int64"))
            anch = sub.loc[sub["anchor"] == 1, "us"].to_numpy("int64")
            if len(anch) == 0:
                continue
            c = (np.searchsorted(hay, anch, side="right")
                 - np.searchsorted(hay, anch - _H, side="left"))
            outs.append((et, int(day), int(c.max())))
        if not outs:
            return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                                 "day": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        return pd.DataFrame(outs, columns=["event_type", "day", "c"])

    per_day = (ev.map_batches(stamp, batch_format="pandas")
               .groupby("__coarse").map_groups(bucket,
                                               batch_format="pandas"))
    # type-bounded: max peak, then earliest day achieving it
    days = per_day.to_pandas()
    days["c"] = days["c"].astype("int64")
    days["day"] = days["day"].astype("int64")
    peak = days.groupby("event_type")["c"].max().rename("peak")
    m = days.merge(peak, on="event_type")
    m = m[m["c"] == m["peak"]]
    out = (m.groupby("event_type", as_index=False)
           .agg(peak=("peak", "max"), peak_day=("day", "min")))
    out["peak"] = out["peak"].astype("int64")
    out["peak_day"] = out["peak_day"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Anomalous-day detection (z-score on the daily count series)
# ---------------------------------------------------------------------------
def q_anomaly_days(sf_dir: str):
    """Days whose total event count sits >= 2 population-z from the
    mean of the daily series — the ingest-volume anomaly monitor.
    The corpus folds to a day-bounded count table (per-batch day
    partials -> one coarse shuffle); mean/std and the z-scores are
    computed on that bounded series.  Membership is decided on the
    ROUNDED z (6 dp) on both engines so a float near-tie at the
    threshold cannot flip set membership (the q_hybrid_rrf
    convention)."""
    ev = _read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def days(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["ts"])
        d = (b["ts"].astype("datetime64[us]").astype("int64")
             // 86_400_000_000)
        vc = pd.Series(d).value_counts()
        return pd.DataFrame({"day": vc.index.to_numpy("int64"),
                             "n_events": vc.to_numpy("int64")})

    t = coarse_agg(ev.map_batches(days, batch_format="pandas"),
                   ["day"], {"n_events": ("n_events", "sum")}).to_pandas()
    t["day"] = t["day"].astype("int64")
    t["n_events"] = t["n_events"].astype("int64")
    n = t["n_events"].to_numpy("float64")
    mean = float(n.mean())
    sd = float(n.std(ddof=0))
    if sd == 0.0:
        return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                             "n_events": pd.Series([], dtype="int64"),
                             "z": pd.Series([], dtype="float64")})
    t["z"] = [float(_round_sql((x - mean) / sd, 6)) for x in n]
    out = t[t["z"].abs() >= 2.0][["day", "n_events", "z"]]
    return out.sort_values("day").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Lag-1 autocorrelation of the daily count series (drift/seasonality QA)
# ---------------------------------------------------------------------------
def q_autocorr(sf_dir: str):
    """Lag-1 Pearson autocorrelation of the daily event-count series
    (observed days in day order) — near-zero for a homogeneous
    synthetic stream, strongly positive under weekly seasonality or
    ramp-up, the one-scalar drift companion to q_ks_test.  The corpus
    folds to the day-bounded count table through one coarse shuffle;
    the correlation itself is a bounded-series computation
    (correlation is scale-invariant, so the sample/population ddof
    choice cancels; 6 dp absorbs summation-order ulps)."""
    ev = _read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def days(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["ts"])
        d = (b["ts"].astype("datetime64[us]").astype("int64")
             // 86_400_000_000)
        vc = pd.Series(d).value_counts()
        return pd.DataFrame({"day": vc.index.to_numpy("int64"),
                             "n": vc.to_numpy("int64")})

    t = coarse_agg(ev.map_batches(days, batch_format="pandas"),
                   ["day"], {"n": ("n", "sum")}).to_pandas()
    t = t.sort_values("day").reset_index(drop=True)
    n = t["n"].to_numpy("float64")
    x, y = n[:-1], n[1:]
    n_pairs = len(x)
    if n_pairs < 2 or x.std() == 0.0 or y.std() == 0.0:
        ac = float("nan")
    else:
        ac = float(np.corrcoef(x, y)[0, 1])
    return pd.DataFrame({
        "n_pairs": pd.array([n_pairs], dtype="int64"),
        "autocorr": [float(_round_sql(ac, 6))]})


QUERIES.update({
    "q_streak": q_streak,
    "q_burst_peak": q_burst_peak,
    "q_anomaly_days": q_anomaly_days,
    "q_autocorr": q_autocorr,
})


# ---------------------------------------------------------------------------
# BPE merge-candidate table (top adjacent char pairs inside tokens)
# ---------------------------------------------------------------------------
def q_bpe_pairs(sf_dir: str):
    """Top-20 adjacent character pairs inside tokens, weighted by token
    occurrence — the candidate table of the FIRST byte-pair-encoding
    merge step (Sennrich, Haddow & Birch, ACL 2016; public method).
    Per-batch partial: token occurrences are counted once (Counter),
    each DISTINCT token's pair multiset is derived once and scaled by
    its count (natural-text vocabularies are Zipfian, so the memo
    collapses almost all per-occurrence work); the shuffle then moves
    a pair-vocabulary-bounded (pair, n) table through one coarse
    fold.  Total (n desc, pair asc) tiebreak."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        occ: Counter = Counter()
        for t in b["text"]:
            occ.update(ws_tokens(t or ""))
        pairs: Counter = Counter()
        for tok, c in occ.items():
            for i in range(len(tok) - 1):
                pairs[tok[i:i + 2]] += c
        return pd.DataFrame({"pair": list(pairs.keys()),
                             "n": np.fromiter(pairs.values(),
                                              dtype="int64")})

    folded = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                        ["pair"], {"n": ("n", "sum")})
    out = (folded.sort(["n", "pair"], descending=[True, False])
           .limit(20).to_pandas())
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Per-source hapax legomena ratio (vocabulary-health ingest QA)
# ---------------------------------------------------------------------------
def q_hapax(sf_dir: str):
    """Per-source vocabulary size, hapax-legomena count (tokens seen
    exactly once in that source) and hapax ratio — the vocabulary-
    health QA metric: natural text runs ~40-60% hapax, templated or
    deduplicated-to-death corpora collapse toward 0 (Baayen's word
    frequency distributions; public method).  Two bounded folds: a
    (source, token)-keyed count fold (vocab x source bounded), then a
    source-bounded summary fold; raw token streams never shuffle."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for s, t in zip(b["source"], b["text"]):
            for tok in ws_tokens(t or ""):
                cnt[(s, tok)] += 1
        if not cnt:
            return pd.DataFrame({"source": pd.Series([], dtype="object"),
                                 "tok": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        ks = list(cnt.keys())
        return pd.DataFrame({"source": [k[0] for k in ks],
                             "tok": [k[1] for k in ks],
                             "n": np.fromiter(cnt.values(), dtype="int64")})

    cnt = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                     ["source", "tok"], {"n": ("n", "sum")})

    def summ(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": b["source"],
            "vocab": np.ones(len(b), dtype="int64"),
            "hapax": (b["n"].astype("int64") == 1).astype("int64")})

    out = coarse_agg(cnt.map_batches(summ, batch_format="pandas"),
                     ["source"], {"vocab": ("vocab", "sum"),
                                  "hapax": ("hapax", "sum")}).to_pandas()
    out["vocab"] = out["vocab"].astype("int64")
    out["hapax"] = out["hapax"].astype("int64")
    out["hapax_ratio"] = [
        float(_round_sql(h / v, 6))
        for h, v in zip(out["hapax"], out["vocab"])]
    return out.sort_values("source").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Pairwise source-distribution Jensen-Shannon divergence (mixture drift QA)
# ---------------------------------------------------------------------------
def q_js_divergence(sf_dir: str):
    """Jensen-Shannon divergence (bits) between every pair of sources'
    unigram distributions — the standard corpus-mixture drift monitor
    (Lin 1991; public method).  Scale shape: ONE (source, token) count
    fold; per-source totals are a source-bounded table shipped as a
    closure constant; the pairwise term sums accumulate inside a
    token-keyed bucket fold (each token's full source row lands in one
    bucket, where all C(S,2) pair contributions for that token are
    computed from a local pivot) and fold to a pairs-bounded table.
    The corpus shuffles token COUNTS exactly once; nothing
    vocabulary-sized touches the driver.  6 dp absorbs the
    summation-order ulps of the float term fold."""
    import math

    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    nb = _auto_num_buckets()
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for s, t in zip(b["source"], b["text"]):
            for tok in ws_tokens(t or ""):
                cnt[(s, tok)] += 1
        ks = list(cnt.keys())
        return pd.DataFrame({"source": [k[0] for k in ks],
                             "tok": [k[1] for k in ks],
                             "n": np.fromiter(cnt.values(), dtype="int64")})

    cnt = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                     ["source", "tok"], {"n": ("n", "sum")}).materialize()

    totals = coarse_agg(cnt, ["source"], {"t": ("n", "sum")}).to_pandas()
    tot = {s: int(t) for s, t in zip(totals["source"], totals["t"])}
    srcs = sorted(tot)
    prs = [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]]

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__coarse"] = _bucket_ids(b, ["tok"], nb)
        return b

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        pv = g.pivot_table(index="tok", columns="source", values="n",
                           aggfunc="sum", fill_value=0)
        p = {s: (pv[s].to_numpy("float64") / tot[s]
                 if s in pv.columns
                 else np.zeros(len(pv))) for s in srcs}
        rows = []
        for sa, sb in prs:
            px, py = p[sa], p[sb]
            m = (px + py) / 2.0
            with np.errstate(divide="ignore", invalid="ignore"):
                term = (np.where(px > 0, px * np.log(px / m), 0.0)
                        + np.where(py > 0, py * np.log(py / m), 0.0))
            rows.append((sa, sb, float(term.sum())))
        return pd.DataFrame(rows, columns=["src_a", "src_b", "part"])

    parts = (cnt.map_batches(stamp, batch_format="pandas")
             .groupby("__coarse").map_groups(bucket, batch_format="pandas"))
    out = coarse_agg(parts, ["src_a", "src_b"],
                     {"part": ("part", "sum")}).to_pandas()
    out["js"] = [float(_round_sql(x / 2.0 / math.log(2.0), 6))
                 for x in out["part"]]
    return (out[["src_a", "src_b", "js"]]
            .sort_values(["src_a", "src_b"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# Per-language char-trigram profile (the langid profile builder)
# ---------------------------------------------------------------------------
def q_char_trigrams(sf_dir: str):
    """Top-10 character trigrams per language over the lowercased,
    whitespace-collapsed text — the n-gram language-profile builder
    of Cavnar & Trenkle (1994; public method), the training half of
    q_langid's classifier.  Vectorized and unicode-exact: each doc's
    codepoints come from one utf-32 reinterpret (no per-char Python),
    trigram windows never cross documents, and windows pack into one
    int64 (3 x 21-bit codepoints) so the shuffle moves a
    trigram-vocabulary-bounded (lang, code, n) table through one
    coarse fold.  Ranking ties break on the decoded STRING (codepoint
    order == UTF-8 binary order, so both engines agree)."""
    import re

    _WS = re.compile(r"[ \t\n\r\f\v]+")
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["lang", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        per_lang: dict = {}
        for lang, t in zip(b["lang"], b["text"]):
            s = _WS.sub(" ", (t or "").lower())
            if len(s) < 3:
                continue
            cp = np.frombuffer(s.encode("utf-32-le"),
                               dtype="<u4").astype("int64")
            code = (cp[:-2] << 42) | (cp[1:-1] << 21) | cp[2:]
            per_lang.setdefault(lang, []).append(code)
        rows = []
        for lang, chunks in per_lang.items():
            u, c = np.unique(np.concatenate(chunks), return_counts=True)
            rows.append(pd.DataFrame({"lang": lang, "code": u,
                                      "n": c.astype("int64")}))
        if not rows:
            return pd.DataFrame({"lang": pd.Series([], dtype="object"),
                                 "code": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        return pd.concat(rows, ignore_index=True)

    folded = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                        ["lang", "code"], {"n": ("n", "sum")}).to_pandas()
    folded["code"] = folded["code"].astype("int64")
    folded["n"] = folded["n"].astype("int64")

    def decode(code: int) -> str:
        return "".join(chr((code >> s) & ((1 << 21) - 1))
                       for s in (42, 21, 0))

    folded["tri"] = [decode(c) for c in folded["code"]]
    folded = folded.sort_values(["lang", "n", "tri"],
                                ascending=[True, False, True],
                                kind="mergesort")
    folded["rank"] = folded.groupby("lang").cumcount() + 1
    out = folded[folded["rank"] <= 10][["lang", "tri", "n", "rank"]]
    out["rank"] = out["rank"].astype("int64")
    return out.sort_values(["lang", "rank"]).reset_index(drop=True)


QUERIES.update({
    "q_bpe_pairs": q_bpe_pairs,
    "q_hapax": q_hapax,
    "q_js_divergence": q_js_divergence,
    "q_char_trigrams": q_char_trigrams,
})


# ---------------------------------------------------------------------------
# 2-hop neighborhood size for the top-degree seeds (influence-reach QA)
# ---------------------------------------------------------------------------
def q_two_hop(sf_dir: str):
    """Size of the <=2-hop neighborhood (friends-of-friends reach) for
    the 5 highest-degree nodes of the synthetic link graph — the
    influence/blast-radius statistic next to q_degree_dist and
    q_clustering_coeff, over the SAME edge generator so the graph QA
    family audits one graph.  Scale shape: degrees fold through one
    coarse shuffle; the 5 seeds are an aggregate-sized sort+limit; the
    1-hop table is one map over the static edge list; the 2-hop
    expansion is a size-gated join of the edge list against the 1-hop
    table on each endpoint (auto_join: a celebrity seed's
    neighborhood routes to the bucketed hash join, never a blind
    broadcast), and the distinct fold is (seed, node)-keyed.  The
    driver only ever holds seed-bounded tables."""
    from bb_ocr_ray.stages.dedup import dedup_pairs
    from bb_ocr_ray.stages.joins import auto_join, auto_semi

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def gen(b: pd.DataFrame) -> pd.DataFrame:
        d = b["doc_id"].to_numpy("int64")
        d1 = d[((d * d + 3 * d) % 11) >= 3]
        d2 = d[((7 * d + 5) % 13) >= 4]
        return pd.DataFrame({
            "src": np.concatenate([d1, d2]),
            "dst": np.concatenate([d1 + 1, d2 + 2])})

    cand = docs.map_batches(gen, batch_format="pandas")
    edges = auto_semi(
        cand.map_batches(lambda b: b.rename(columns={"dst": "doc_id"}),
                         batch_format="pandas"),
        docs, on="doc_id",
    ).map_batches(lambda b: b.rename(columns={"doc_id": "dst"}),
                  batch_format="pandas")

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        u = b["src"].to_numpy(np.int64)
        v = b["dst"].to_numpy(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pd.DataFrame({"id_a": np.minimum(u, v),
                             "id_b": np.maximum(u, v)})

    und = dedup_pairs(
        edges.map_batches(norm, batch_format="pandas")).materialize()

    def both_ends(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [b["id_a"].to_numpy("int64"), b["id_b"].to_numpy("int64")]),
            "one": np.ones(2 * len(b), dtype="int64")})

    deg = coarse_agg(und.map_batches(both_ends, batch_format="pandas"),
                     ["node"], {"dg": ("one", "sum")})
    seeds = (deg.sort(["dg", "node"], descending=[True, False])
             .limit(5).to_pandas())
    seeds["node"] = seeds["node"].astype("int64")
    seeds["dg"] = seeds["dg"].astype("int64")
    seed_set = set(int(x) for x in seeds["node"])

    def hop1(b: pd.DataFrame) -> pd.DataFrame:
        a = b["id_a"].to_numpy("int64")
        c = b["id_b"].to_numpy("int64")
        ia = np.isin(a, list(seed_set))
        ib = np.isin(c, list(seed_set))
        return pd.DataFrame({
            "seed": np.concatenate([a[ia], c[ib]]),
            "w": np.concatenate([c[ia], a[ib]])})

    n1 = und.map_batches(hop1, batch_format="pandas").materialize()

    j1 = auto_join(und, n1.map_batches(
        lambda b: b.rename(columns={"w": "id_a"}),
        batch_format="pandas"), on="id_a").map_batches(
        lambda b: pd.DataFrame({"seed": b["seed"].astype("int64"),
                                "w": b["id_b"].astype("int64")}),
        batch_format="pandas")
    j2 = auto_join(und, n1.map_batches(
        lambda b: b.rename(columns={"w": "id_b"}),
        batch_format="pandas"), on="id_b").map_batches(
        lambda b: pd.DataFrame({"seed": b["seed"].astype("int64"),
                                "w": b["id_a"].astype("int64")}),
        batch_format="pandas")
    reach = n1.union(j1).union(j2).filter(
        lambda r: r["w"] != r["seed"])

    distinct = coarse_agg(reach, ["seed", "w"], {"c": ("w", "size")})
    cnt = coarse_agg(
        distinct.map_batches(
            lambda b: pd.DataFrame({
                "seed": b["seed"].astype("int64"),
                "one": np.ones(len(b), dtype="int64")}),
            batch_format="pandas"),
        ["seed"], {"n_within_2": ("one", "sum")}).to_pandas()

    out = seeds.rename(columns={"node": "seed", "dg": "degree"}).merge(
        cnt, on="seed", how="left")
    out["n_within_2"] = out["n_within_2"].fillna(0).astype("int64")
    return out.sort_values("seed").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Weekly churn rate (active week w, silent week w+1)
# ---------------------------------------------------------------------------
def q_churn(sf_dir: str):
    """Per-week churn: of the users active in week w, the share with NO
    activity in week w+1 — the classic product-analytics companion to
    q_retention's cohort matrix (this one is calendar-anchored, not
    cohort-anchored).  The final observed week is excluded (its future
    is unknown).  Plan: per-batch distinct (user, week) pairs -> ONE
    coarse shuffle on user (per-user week sets co-locate; w+1
    membership is a vectorized next-element check on the sorted unique
    weeks) -> a week-bounded (active, churned) fold.  Nothing
    user-cardinality touches the driver."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    _US_PER_WEEK = 7 * 86_400_000_000
    nb = _auto_num_buckets()
    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts"])
        g = pd.DataFrame({
            "u": b["user_id"].astype("int64").to_numpy(),
            "week": (b["ts"].astype("datetime64[us]").astype("int64")
                     // _US_PER_WEEK)}).drop_duplicates()
        g["__coarse"] = _bucket_ids(g, ["u"], nb)
        return g

    p = ev.map_batches(pairs, batch_format="pandas").materialize()
    max_week = int(p.max("week"))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["u", "week"])
             .sort_values(["u", "week"], kind="mergesort"))
        u = g["u"].to_numpy("int64")
        w = g["week"].to_numpy("int64")
        nxt_same = np.concatenate([(u[1:] == u[:-1]) & (w[1:] == w[:-1] + 1),
                                   [False]])
        keep = w < max_week
        w, nxt_same = w[keep], nxt_same[keep]
        if len(w) == 0:
            return pd.DataFrame({"week": pd.Series([], dtype="int64"),
                                 "n_active": pd.Series([], dtype="int64"),
                                 "n_churned": pd.Series([], dtype="int64")})
        t = pd.DataFrame({"week": w,
                          "n_active": np.ones(len(w), dtype="int64"),
                          "n_churned": (~nxt_same).astype("int64")})
        return t.groupby("week", as_index=False).sum()

    folded = (p.groupby("__coarse").map_groups(bucket,
                                               batch_format="pandas"))
    out = coarse_agg(folded, ["week"],
                     {"n_active": ("n_active", "sum"),
                      "n_churned": ("n_churned", "sum")}).to_pandas()
    for c in ("week", "n_active", "n_churned"):
        out[c] = out[c].astype("int64")
    out["churn_rate"] = [
        float(_round_sql(c / a, 6))
        for c, a in zip(out["n_churned"], out["n_active"])]
    return out.sort_values("week").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Grouped winsorized mean (clamp at exact p10/p90 order statistics)
# ---------------------------------------------------------------------------
def q_winsorize(sf_dir: str):
    """Grouped 10% WINSORIZED mean of l_quantity by return flag —
    values below the exact p10 order statistic clamp UP to it, above
    p90 clamp DOWN (Tukey's robust-mean family; q_trimmed_mean's
    sibling that keeps n constant instead of dropping rows).  Exact at
    any scale via the value-histogram posture: quantity's bounded
    integer-ish domain folds to a (flag, value, count) table through
    one coarse shuffle; the clamp bounds are cumulative-count order
    statistics (ceil(q*n)-1 of the sorted multiset — DuckDB
    quantile_disc semantics) and the clamped mean is a weighted sum
    over the histogram.  NO global sort, nothing row-sized on the
    driver."""
    li = _read_parquet(_t(sf_dir, "lineitem"),
                       columns=["l_returnflag", "l_quantity"])

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["l_returnflag", "l_quantity"], as_index=False)
             .size().rename(columns={"size": "c"}))
        return g

    h = coarse_agg(li.map_batches(hist, batch_format="pandas"),
                   ["l_returnflag", "l_quantity"],
                   {"c": ("c", "sum")}).to_pandas()
    h["c"] = h["c"].astype("int64")

    import math
    rows = []
    for f, sub in h.groupby("l_returnflag"):
        sub = sub.sort_values("l_quantity")
        v = sub["l_quantity"].to_numpy("float64")
        c = sub["c"].to_numpy("int64")
        n = int(c.sum())
        cum = np.cumsum(c)
        lo = float(v[np.searchsorted(cum, math.ceil(0.1 * n))])
        hi = float(v[np.searchsorted(cum, math.ceil(0.9 * n))])
        clamped = np.clip(v, lo, hi)
        wmean = float((clamped * c).sum() / n)
        rows.append((f, n, lo, hi, float(_round_sql(wmean, 6))))
    out = pd.DataFrame(rows, columns=["l_returnflag", "n", "lo", "hi",
                                      "wmean"])
    out["n"] = out["n"].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


QUERIES.update({
    "q_two_hop": q_two_hop,
    "q_churn": q_churn,
    "q_winsorize": q_winsorize,
})


# ---------------------------------------------------------------------------
# Smoothed target encoding (the classic categorical featurizer)
# ---------------------------------------------------------------------------
def q_target_encode(sf_dir: str):
    """Smoothed target-mean encoding of customer market segment against
    order value — encoded = (sum_y + m * global_mean) / (n + m) with
    m=10 (Micci-Barreca, SIGKDD Expl. 2001; public method).  All sums
    are exact integer cents; the join ships the customer dim through
    the size-gated auto_join (broadcast at test scale, bucketed hash
    join at warehouse scale) and the sums fold per segment through one
    coarse shuffle.  The global mean derives from the segment-bounded
    table — no second corpus pass."""
    from bb_ocr_ray.stages.joins import auto_join

    orders = _read_parquet(_t(sf_dir, "orders"),
                           columns=["o_custkey", "o_totalprice"])
    cust = _read_parquet(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_mktsegment"])

    keyed = orders.map_batches(
        lambda b: pd.DataFrame({
            "c_custkey": b["o_custkey"].astype("int64"),
            "cents": _round_sql(b["o_totalprice"] * 100.0, 0)
            .astype("int64")}),
        batch_format="pandas")
    j = auto_join(keyed, cust, on="c_custkey")
    seg = coarse_agg(j.map_batches(
        lambda b: pd.DataFrame({
            "c_mktsegment": b["c_mktsegment"],
            "n": np.ones(len(b), dtype="int64"),
            "cents": b["cents"].astype("int64")}),
        batch_format="pandas"),
        ["c_mktsegment"], {"n": ("n", "sum"),
                           "cents": ("cents", "sum")}).to_pandas()
    seg["n"] = seg["n"].astype("int64")
    seg["cents"] = seg["cents"].astype("int64")
    m = 10.0
    g_mean = float(seg["cents"].sum()) / float(seg["n"].sum()) / 100.0
    seg["mean_price"] = [
        float(_round_sql(c / n / 100.0, 6))
        for c, n in zip(seg["cents"], seg["n"])]
    seg["encoded"] = [
        float(_round_sql((c / 100.0 + m * g_mean) / (n + m), 6))
        for c, n in zip(seg["cents"], seg["n"])]
    out = seg[["c_mktsegment", "n", "mean_price", "encoded"]]
    return out.sort_values("c_mktsegment").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Inverse-frequency class weights (imbalanced-label training prep)
# ---------------------------------------------------------------------------
def q_class_weights(sf_dir: str):
    """Per-label inverse-frequency weights n_total / (k * n_label) —
    the sklearn-style 'balanced' class weighting every skewed-label
    training run starts with (King & Zeng 2001; public method).  One
    label-bounded count fold; the weights derive from that bounded
    table."""
    emb = _read_parquet(_t(sf_dir, "embeddings"), columns=["label"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["label"].astype("int64").value_counts()
        return pd.DataFrame({"label": vc.index.to_numpy("int64"),
                             "n": vc.to_numpy("int64")})

    t = coarse_agg(emb.map_batches(partial, batch_format="pandas"),
                   ["label"], {"n": ("n", "sum")}).to_pandas()
    t["label"] = t["label"].astype("int64")
    t["n"] = t["n"].astype("int64")
    total = int(t["n"].sum())
    k = len(t)
    t["weight"] = [float(_round_sql(total / (k * n), 6)) for n in t["n"]]
    return t.sort_values("label").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Out-of-vocabulary rate per language (tokenizer-coverage QA)
# ---------------------------------------------------------------------------
def q_oov_rate(sf_dir: str):
    """Per-language out-of-vocabulary rate against the corpus' global
    top-20 token vocabulary — the tokenizer-coverage QA run before
    committing a vocab (the OOV column of every tokenizer paper;
    public method).  Pass 1 folds the global vocabulary and takes the
    top-20 cut (n desc, tok asc tiebreak, aggregate-sized); the cut
    broadcasts as a closure frozenset into pass 2, whose per-language
    (total, oov) occurrence counts fold through one lang-bounded
    shuffle.  Both passes are column-pruned reads; raw token streams
    never shuffle."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def vocab_partial(b: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for t in b["text"]:
            cnt.update(ws_tokens(t or ""))
        return pd.DataFrame({"tok": list(cnt.keys()),
                             "n": np.fromiter(cnt.values(), dtype="int64")})

    vocab = coarse_agg(docs.map_batches(vocab_partial,
                                        batch_format="pandas"),
                       ["tok"], {"n": ("n", "sum")})
    top = (vocab.sort(["n", "tok"], descending=[True, False])
           .limit(20).to_pandas())
    known = frozenset(top["tok"])

    docs2 = _read_parquet(_t(sf_dir, "documents"),
                          columns=["lang", "text"])

    def oov_partial(b: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for lang, t in zip(b["lang"], b["text"]):
            tot, oov = rows.get(lang, (0, 0))
            for tok in ws_tokens(t or ""):
                tot += 1
                if tok not in known:
                    oov += 1
            rows[lang] = (tot, oov)
        return pd.DataFrame({
            "lang": list(rows.keys()),
            "n_tokens": np.array([v[0] for v in rows.values()],
                                 dtype="int64"),
            "n_oov": np.array([v[1] for v in rows.values()],
                              dtype="int64")})

    out = coarse_agg(docs2.map_batches(oov_partial, batch_format="pandas"),
                     ["lang"], {"n_tokens": ("n_tokens", "sum"),
                                "n_oov": ("n_oov", "sum")}).to_pandas()
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["n_oov"] = out["n_oov"].astype("int64")
    out["oov_rate"] = [
        float(_round_sql(o / t, 6)) if t else 0.0
        for o, t in zip(out["n_oov"], out["n_tokens"])]
    return out.sort_values("lang").reset_index(drop=True)


# ---------------------------------------------------------------------------
# CUSUM changepoint on the daily count series (level-shift detection)
# ---------------------------------------------------------------------------
def q_cusum(sf_dir: str):
    """CUSUM changepoint of the daily event-count series: the day k
    maximizing |sum_{i<=k}(x_i - mean)| — the standard level-shift
    locator (Page, Biometrika 1954; public method), the companion to
    q_anomaly_days' point anomalies.  The corpus folds to the
    day-bounded series through one coarse shuffle; the cumulative
    scan runs on that bounded series.  The argmax ranks on the
    ROUNDED |cusum| (6 dp, earliest-day tiebreak) so float ulps
    cannot flip the winner between engines."""
    ev = _read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def days(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["ts"])
        d = (b["ts"].astype("datetime64[us]").astype("int64")
             // 86_400_000_000)
        vc = pd.Series(d).value_counts()
        return pd.DataFrame({"day": vc.index.to_numpy("int64"),
                             "n": vc.to_numpy("int64")})

    t = coarse_agg(ev.map_batches(days, batch_format="pandas"),
                   ["day"], {"n": ("n", "sum")}).to_pandas()
    t = t.sort_values("day").reset_index(drop=True)
    n = t["n"].to_numpy("float64")
    mu = float(n.mean())
    cus = np.cumsum(n) - (np.arange(len(n)) + 1) * mu
    a = np.array([float(_round_sql(abs(x), 6)) for x in cus])
    i = int(np.lexsort((t["day"].to_numpy("int64"), -a))[0])
    return pd.DataFrame({
        "n_days": pd.array([len(t)], dtype="int64"),
        "cp_day": pd.array([int(t["day"].iloc[i])], dtype="int64"),
        "max_abs_cusum": [float(a[i])]})


QUERIES.update({
    "q_target_encode": q_target_encode,
    "q_class_weights": q_class_weights,
    "q_oov_rate": q_oov_rate,
    "q_cusum": q_cusum,
})


# ---------------------------------------------------------------------------
# Token length histogram (tokenizer fertility QA)
# ---------------------------------------------------------------------------
def q_tok_len_dist(sf_dir: str):
    """Histogram of token lengths by occurrence — the tokenizer
    fertility/shape QA every vocab decision starts from (mean token
    length drives bytes-per-token).  Per-batch Counter over lengths
    (a length-bounded dict), one length-bounded fold.  Output:
    (len, n) ascending."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for t in b["text"]:
            for tok in ws_tokens(t or ""):
                cnt[len(tok)] += 1
        return pd.DataFrame({
            "tok_len": np.fromiter(cnt.keys(), dtype="int64"),
            "n": np.fromiter(cnt.values(), dtype="int64")})

    out = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                     ["tok_len"], {"n": ("n", "sum")}).to_pandas()
    out["tok_len"] = out["tok_len"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("tok_len").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bigram conditional entropy (corpus predictability / LM-difficulty QA)
# ---------------------------------------------------------------------------
def q_ngram_entropy(sf_dir: str):
    """Joint and conditional entropy (bits) of the corpus' token-bigram
    distribution — H(joint) of bigram frequencies and
    H(next | prev) = H(joint) - H(prev margins), the corpus
    predictability statistic (Shannon 1951; public method).  One
    bigram count fold (doc-local pairs, vocab^2-bounded counts); the
    prev margins DERIVE from the bigram table inside a prev-keyed
    bucket fold (the q_lm_quality posture — no second corpus pass);
    per-bucket float partials (sum c*ln c over cells and over
    margins) fold to three scalars.  6 dp absorbs summation-order
    ulps."""
    import math

    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    nb = _auto_num_buckets()
    docs = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for t in b["text"]:
            tk = ws_tokens(t or "")
            for i in range(len(tk) - 1):
                cnt[(tk[i], tk[i + 1])] += 1
        ks = list(cnt.keys())
        return pd.DataFrame({"prev": [k[0] for k in ks],
                             "nxt": [k[1] for k in ks],
                             "n": np.fromiter(cnt.values(), dtype="int64")})

    bi = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                    ["prev", "nxt"], {"n": ("n", "sum")})

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__coarse"] = _bucket_ids(b, ["prev"], nb)
        return b

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g["n"].to_numpy("int64").astype("float64")
        cu = (g.groupby("prev")["n"].sum()
              .to_numpy().astype("float64"))
        return pd.DataFrame({
            "n_bigrams": [int(c.sum())],
            "s_cell": [float((c * np.log(c)).sum())],
            "s_marg": [float((cu * np.log(cu)).sum())]})

    parts = (bi.map_batches(stamp, batch_format="pandas")
             .groupby("__coarse").map_groups(bucket,
                                             batch_format="pandas")
             .to_pandas())
    n_total = int(parts["n_bigrams"].sum())
    if n_total == 0:
        return pd.DataFrame({"n_bigrams": pd.array([0], dtype="int64"),
                             "h_joint": [float("nan")],
                             "h_cond": [float("nan")]})
    ln_n = math.log(n_total)
    h_joint = (ln_n - float(parts["s_cell"].sum()) / n_total) / math.log(2)
    h_prev = (ln_n - float(parts["s_marg"].sum()) / n_total) / math.log(2)
    return pd.DataFrame({
        "n_bigrams": pd.array([n_total], dtype="int64"),
        "h_joint": [float(_round_sql(h_joint, 6))],
        "h_cond": [float(_round_sql(h_joint - h_prev, 6))]})


# ---------------------------------------------------------------------------
# Session path mining (top event-type trigram sequences)
# ---------------------------------------------------------------------------
def q_event_paths(sf_dir: str):
    """Top-10 3-step event-type paths across per-user ordered event
    streams — the sequence-mining view of q_transitions' pair matrix
    (Agrawal & Srikant's sequential patterns, ICDE'95; public
    method).  Per-user order is the strict (ts, event_id) total
    order; trigrams never cross users.  One coarse shuffle on user
    (ordered streams co-locate), per-bucket vectorized trigram
    extraction, then a path-vocabulary-bounded count fold with the
    (n desc, path asc) tiebreak."""
    from collections import Counter

    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    nb = _auto_num_buckets()
    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_id",
                                "event_type"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts"])
        g = pd.DataFrame({
            "u": b["user_id"].astype("int64").to_numpy(),
            "ts": b["ts"].astype("datetime64[us]").astype("int64")
            .to_numpy(),
            "event_id": b["event_id"].astype("int64").to_numpy(),
            "et": b["event_type"].to_numpy()})
        g["__coarse"] = _bucket_ids(g, ["u"], nb)
        return g

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "ts", "event_id"], kind="mergesort")
        u = g["u"].to_numpy("int64")
        et = g["et"].to_numpy()
        cnt: Counter = Counter()
        same3 = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        for i in np.nonzero(same3)[0]:
            cnt[f"{et[i]}>{et[i + 1]}>{et[i + 2]}"] += 1
        if not cnt:
            return pd.DataFrame({"path": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        return pd.DataFrame({"path": list(cnt.keys()),
                             "n": np.fromiter(cnt.values(),
                                              dtype="int64")})

    folded = (ev.map_batches(stamp, batch_format="pandas")
              .groupby("__coarse").map_groups(bucket,
                                              batch_format="pandas"))
    agg = coarse_agg(folded, ["path"], {"n": ("n", "sum")})
    out = (agg.sort(["n", "path"], descending=[True, False])
           .limit(10).to_pandas())
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


QUERIES.update({
    "q_tok_len_dist": q_tok_len_dist,
    "q_ngram_entropy": q_ngram_entropy,
    "q_event_paths": q_event_paths,
})


# ---------------------------------------------------------------------------
# Zone-map pruning effectiveness (storage-layout QA)
# ---------------------------------------------------------------------------
def q_zone_map(sf_dir: str):
    """Zone-map (block min/max) pruning effectiveness for the predicate
    n_chars >= 400 over fixed 64-doc shards — the storage-layout QA
    companion to q_zorder: a well-clustered layout prunes most shards,
    a shuffled one prunes none (Moerkotte's small materialized
    aggregates, VLDB'98; public method).  Shards are LOGICAL
    (doc_id // 64), so the statistic is layout-deterministic, not an
    artifact of runtime block boundaries.  One shard-bounded min/max/
    count fold; the pruning scan is arithmetic on that bounded
    table."""
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "n_chars"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "shard": b["doc_id"].astype("int64") // 64,
            "n_chars": b["n_chars"].astype("int64"),
            "one": np.ones(len(b), dtype="int64")})

    t = coarse_agg(docs.map_batches(stamp, batch_format="pandas"),
                   ["shard"], {"mn": ("n_chars", "min"),
                               "mx": ("n_chars", "max"),
                               "rows": ("one", "sum")}).to_pandas()
    for c in t.columns:
        t[c] = t[c].astype("int64")
    prunable = t["mx"] < 400
    n_shards = len(t)
    n_prun = int(prunable.sum())
    return pd.DataFrame({
        "n_shards": pd.array([n_shards], dtype="int64"),
        "n_prunable": pd.array([n_prun], dtype="int64"),
        "rows_skipped": pd.array([int(t.loc[prunable, "rows"].sum())],
                                 dtype="int64"),
        "prune_ratio": [float(_round_sql(n_prun / n_shards, 6))]})


# ---------------------------------------------------------------------------
# Hill tail-index estimator on the user-activity distribution
# ---------------------------------------------------------------------------
def q_tail_index(sf_dir: str):
    """Hill estimator of the activity distribution's tail exponent
    over the top-k=100 most active users (Hill, Ann. Stat. 1975;
    public method) — the heavy-tail QA twin of q_zipf_slope in the
    user domain: alpha near 1-2 means a few users dominate the
    stream (partition-skew early warning).  Per-user counts fold
    through one coarse shuffle; the top-(k+1) cut is a Dataset
    sort+limit on the aggregated table (value ties cannot change the
    chosen VALUE multiset, so no id tiebreak is needed); the log-sum
    runs on k+1 bounded values.  k shrinks to n_users-1 on tiny
    inputs, matching the oracle's least()."""
    import math

    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id"])
        vc = b["user_id"].astype("int64").value_counts()
        return pd.DataFrame({"u": vc.index.to_numpy("int64"),
                             "c": vc.to_numpy("int64")})

    cnt = coarse_agg(ev.map_batches(partial, batch_format="pandas"),
                     ["u"], {"c": ("c", "sum")}).materialize()
    n_users = cnt.count()
    k = min(100, n_users - 1)
    top = (cnt.sort("c", descending=True).limit(k + 1).to_pandas())
    x = np.sort(top["c"].to_numpy("int64"))[::-1].astype("float64")
    xk1 = float(x[k])
    hill = float(np.log(x[:k] / xk1).sum() / k)
    return pd.DataFrame({
        "k": pd.array([k], dtype="int64"),
        "x_kplus1": pd.array([int(xk1)], dtype="int64"),
        "hill": [float(_round_sql(hill, 6))],
        "alpha": [float(_round_sql(1.0 / hill, 6))]})


# ---------------------------------------------------------------------------
# Second frequency moment F2 (self-join size) of the user stream
# ---------------------------------------------------------------------------
def q_f2(sf_dir: str):
    """Exact second frequency moment F2 = sum_u c_u^2 of the user-id
    stream — the self-join size that drives every join-cardinality
    estimate (Alon, Matias & Szegedy, STOC'96 frame; computed exactly
    here).  Per-user counts fold through one coarse shuffle; each
    output batch contributes one Python-int partial (c^2 sums near a
    heavy user's square overflow int64 at web scale — the
    q_corr_grouped decimal-string posture), and the driver folds
    bucket partials with arbitrary-precision ints.  F2 is emitted as
    a decimal STRING on both engines."""
    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id"])
        vc = b["user_id"].astype("int64").value_counts()
        return pd.DataFrame({"u": vc.index.to_numpy("int64"),
                             "c": vc.to_numpy("int64")})

    cnt = coarse_agg(ev.map_batches(partial, batch_format="pandas"),
                     ["u"], {"c": ("c", "sum")})

    def sq(b: pd.DataFrame) -> pd.DataFrame:
        tot = sum(int(x) * int(x) for x in b["c"])
        return pd.DataFrame({"f2_part": [str(tot)],
                             "n_users": [len(b)],
                             "n_rows": [int(b["c"].astype("int64").sum())]})

    parts = cnt.map_batches(sq, batch_format="pandas").to_pandas()
    f2 = sum(int(s) for s in parts["f2_part"])
    return pd.DataFrame({
        "n_users": pd.array([int(parts["n_users"].sum())], dtype="int64"),
        "n_rows": pd.array([int(parts["n_rows"].sum())], dtype="int64"),
        "f2": [str(f2)]})


QUERIES.update({
    "q_zone_map": q_zone_map,
    "q_tail_index": q_tail_index,
    "q_f2": q_f2,
})


# ---------------------------------------------------------------------------
# Referential-integrity validation (FK orphan counts)
# ---------------------------------------------------------------------------
def q_integrity(sf_dir: str):
    """Referential-integrity audit over the star schema's two long FK
    edges: lineitems whose order is missing and orders whose customer
    is missing — the load-validation gate every warehouse ingest runs
    before publishing a snapshot.  Each orphan count is a size-gated
    anti-join (auto_anti: key-set broadcast when driver-sized, exact
    hash-partitioned anti-join at warehouse scale) followed by a
    distributed count; only four scalars reach the driver."""
    from bb_ocr_ray.stages.joins import auto_anti

    li = _read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey"])
    orders = _read_parquet(_t(sf_dir, "orders"),
                           columns=["o_orderkey", "o_custkey"])
    cust = _read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"])

    li_keyed = li.map_batches(
        lambda b: pd.DataFrame({"k": b["l_orderkey"].astype("int64")}),
        batch_format="pandas")
    ord_keys = orders.map_batches(
        lambda b: pd.DataFrame({"k": b["o_orderkey"].astype("int64")}),
        batch_format="pandas")
    orphan_li = auto_anti(li_keyed, ord_keys, on="k").count()

    ord_keyed = orders.map_batches(
        lambda b: pd.DataFrame({"k": b["o_custkey"].astype("int64")}),
        batch_format="pandas")
    cust_keys = cust.map_batches(
        lambda b: pd.DataFrame({"k": b["c_custkey"].astype("int64")}),
        batch_format="pandas")
    orphan_ord = auto_anti(ord_keyed, cust_keys, on="k").count()

    return pd.DataFrame({
        "n_lineitem": pd.array([li.count()], dtype="int64"),
        "orphan_lineitem": pd.array([orphan_li], dtype="int64"),
        "n_orders": pd.array([orders.count()], dtype="int64"),
        "orphan_orders": pd.array([orphan_ord], dtype="int64")})


# ---------------------------------------------------------------------------
# Embedding int8 quantization-error QA (compression readiness)
# ---------------------------------------------------------------------------
def q_emb_quantize(sf_dir: str):
    """Reconstruction error of per-dimension min/max int8 (256-level)
    quantization over the embedding table — the compression-readiness
    QA run before shipping vectors to an ANN index (asymmetric scalar
    quantization per Jegou et al.'s PQ framing, TPAMI 2011; public
    method).  Pass 1 folds per-dimension min/max (a dim-bounded
    table); pass 2 broadcasts the 2xD bounds as closure constants and
    folds (count, sum of squared error, max abs error) partials.
    Both engines quantize with the identical double-precision
    floor(x + 0.5) ladder, so max_abs_err matches bit-for-bit
    (max is summation-order-free) and the mean squared error is
    reported x1e6 at 6 dp to keep resolution above the rounding
    grain."""
    emb = _read_parquet(_t(sf_dir, "embeddings"), columns=["embedding"])

    def minmax(b: pd.DataFrame) -> pd.DataFrame:
        X = np.asarray([np.asarray(e, dtype="float64")
                        for e in b["embedding"]])
        dims = np.arange(X.shape[1], dtype="int64")
        return pd.DataFrame({"d": dims,
                             "mn": X.min(axis=0),
                             "mx": X.max(axis=0)})

    mm = coarse_agg(emb.map_batches(minmax, batch_format="pandas"),
                    ["d"], {"mn": ("mn", "min"),
                            "mx": ("mx", "max")}).to_pandas()
    mm = mm.sort_values("d").reset_index(drop=True)
    mn = mm["mn"].to_numpy("float64")
    mx = mm["mx"].to_numpy("float64")
    dim = len(mm)
    sc = (mx - mn) / 255.0

    def err(b: pd.DataFrame) -> pd.DataFrame:
        X = np.asarray([np.asarray(e, dtype="float64")
                        for e in b["embedding"]])
        assert X.shape[1] == dim, "embedding width changed mid-table"
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((X - mn) / sc + 0.5)
        q = np.clip(q, 0.0, 255.0)
        recon = np.where(sc == 0.0, mn, mn + q * sc)
        e = X - recon
        return pd.DataFrame({
            "n_vals": [int(e.size)],
            "sse": [float((e * e).sum())],
            "max_abs_err": [float(np.abs(e).max())]})

    p = emb.map_batches(err, batch_format="pandas").to_pandas()
    n_vals = int(p["n_vals"].sum())
    return pd.DataFrame({
        "n_vals": pd.array([n_vals], dtype="int64"),
        "max_abs_err": [float(_round_sql(float(p["max_abs_err"].max()),
                                         6))],
        "mse_e6": [float(_round_sql(
            float(p["sse"].sum()) / n_vals * 1e6, 6))]})


QUERIES.update({
    "q_integrity": q_integrity,
    "q_emb_quantize": q_emb_quantize,
})


# ---------------------------------------------------------------------------
# Session bounce rate (1-event sessions under the 1800s gap rule)
# ---------------------------------------------------------------------------
def q_bounce_rate(sf_dir: str):
    """Share of sessions containing exactly one event — the bounce
    rate, under the same gap->1800s sessionization rule as
    q_sessionize (strict (ts, event_id) order so equal timestamps
    cannot flip session boundaries between engines).  One coarse
    shuffle on user; session islands and their sizes are vectorized
    run-length arithmetic over the bucket; only (n_sessions,
    n_bounce) scalars fold to the driver."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    _GAP_US = 1_800_000_000
    nb = _auto_num_buckets()
    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_id"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts"])
        g = pd.DataFrame({
            "u": b["user_id"].astype("int64").to_numpy(),
            "us": b["ts"].astype("datetime64[us]").astype("int64")
            .to_numpy(),
            "event_id": b["event_id"].astype("int64").to_numpy()})
        g["__coarse"] = _bucket_ids(g, ["u"], nb)
        return g

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "us", "event_id"], kind="mergesort")
        u = g["u"].to_numpy("int64")
        us = g["us"].to_numpy("int64")
        if len(u) == 0:
            return pd.DataFrame({"n_sessions": pd.Series([], dtype="int64"),
                                 "n_bounce": pd.Series([], dtype="int64")})
        same = np.concatenate(
            [[False], (u[1:] == u[:-1]) & (us[1:] - us[:-1] <= _GAP_US)])
        run_id = np.cumsum(~same) - 1
        sizes = np.bincount(run_id)
        return pd.DataFrame({"n_sessions": [len(sizes)],
                             "n_bounce": [int((sizes == 1).sum())]})

    p = (ev.map_batches(stamp, batch_format="pandas")
         .groupby("__coarse").map_groups(bucket, batch_format="pandas")
         .to_pandas())
    n_sessions = int(p["n_sessions"].sum())
    n_bounce = int(p["n_bounce"].sum())
    return pd.DataFrame({
        "n_sessions": pd.array([n_sessions], dtype="int64"),
        "n_bounce": pd.array([n_bounce], dtype="int64"),
        "bounce_rate": [float(_round_sql(n_bounce / n_sessions, 6))
                        if n_sessions else 0.0]})


# ---------------------------------------------------------------------------
# Lorenz curve deciles of user-activity concentration
# ---------------------------------------------------------------------------
def q_lorenz(sf_dir: str):
    """Lorenz curve at user deciles: the cumulative share of all
    events held by the least-active k*10% of users, k=1..10 — the
    curve behind q_gini's scalar (Lorenz 1905; public method).
    Exact at any scale via the activity-value histogram: per-user
    counts fold once, then a (count-value, n_users) histogram fold —
    users sharing an activity count are interchangeable, so the
    decile cut inside a value group is exact integer arithmetic
    (partial_users * value), never a per-user sort."""
    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id"])
        vc = b["user_id"].astype("int64").value_counts()
        return pd.DataFrame({"u": vc.index.to_numpy("int64"),
                             "c": vc.to_numpy("int64")})

    cnt = coarse_agg(ev.map_batches(partial, batch_format="pandas"),
                     ["u"], {"c": ("c", "sum")})

    def hist(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["c"].astype("int64").value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy("int64"),
                             "m": vc.to_numpy("int64")})

    h = coarse_agg(cnt.map_batches(hist, batch_format="pandas"),
                   ["v"], {"m": ("m", "sum")}).to_pandas()
    h = h.sort_values("v").reset_index(drop=True)
    v = h["v"].to_numpy("int64")
    m = h["m"].to_numpy("int64")
    n = int(m.sum())
    tot = int((v * m).sum())
    cum_u = np.concatenate([[0], np.cumsum(m)])
    cum_e = np.concatenate([[0], np.cumsum(v * m)])
    rows = []
    for k in range(1, 11):
        p = (k * n) // 10
        # side="left" so a cut landing EXACTLY on a group boundary
        # resolves inside the finished group (partial term = full group)
        i = int(np.searchsorted(cum_u, p, side="left")) - 1
        ce = int(cum_e[i] + (p - cum_u[i]) * v[i]) if p > 0 else 0
        rows.append((k, p, ce, float(_round_sql(ce / tot, 6))))
    return pd.DataFrame(rows, columns=["decile", "n_users_cum",
                                       "n_events_cum", "share"]).astype(
        {"decile": "int64", "n_users_cum": "int64",
         "n_events_cum": "int64"})


# ---------------------------------------------------------------------------
# Order-to-ship delay stats per priority (fulfilment QA)
# ---------------------------------------------------------------------------
def q_ship_delay(sf_dir: str):
    """Per order priority: lineitem count and min/max/mean days from
    order date to ship date — the fulfilment-latency QA join.  The
    orders side ships through the size-gated auto_join (broadcast at
    test scale, bucketed hash join at warehouse scale); day deltas
    are exact integer microsecond floors and the mean folds from
    exact integer day sums."""
    from bb_ocr_ray.stages.joins import auto_join

    _D = 86_400_000_000
    li = _read_parquet(_t(sf_dir, "lineitem"),
                       columns=["l_orderkey", "l_shipdate"])
    orders = _read_parquet(_t(sf_dir, "orders"),
                           columns=["o_orderkey", "o_orderdate",
                                    "o_orderpriority"])

    li_k = li.map_batches(
        lambda b: pd.DataFrame({
            "o_orderkey": b["l_orderkey"].astype("int64"),
            "ship_us": b["l_shipdate"].astype("datetime64[us]")
            .astype("int64")}),
        batch_format="pandas")
    j = auto_join(li_k, orders, on="o_orderkey")

    def delays(b: pd.DataFrame) -> pd.DataFrame:
        d = ((b["ship_us"].astype("int64")
              - b["o_orderdate"].astype("datetime64[us]").astype("int64"))
             // _D)
        return pd.DataFrame({
            "o_orderpriority": b["o_orderpriority"],
            "n": np.ones(len(b), dtype="int64"),
            "sum_days": d.astype("int64"),
            "min_days": d.astype("int64"),
            "max_days": d.astype("int64")})

    out = coarse_agg(j.map_batches(delays, batch_format="pandas"),
                     ["o_orderpriority"],
                     {"n": ("n", "sum"), "sum_days": ("sum_days", "sum"),
                      "min_days": ("min_days", "min"),
                      "max_days": ("max_days", "max")}).to_pandas()
    for c in ("n", "sum_days", "min_days", "max_days"):
        out[c] = out[c].astype("int64")
    out["avg_days"] = [float(_round_sql(s / n, 6))
                       for s, n in zip(out["sum_days"], out["n"])]
    out = out[["o_orderpriority", "n", "min_days", "max_days",
               "avg_days"]]
    return out.sort_values("o_orderpriority").reset_index(drop=True)


QUERIES.update({
    "q_bounce_rate": q_bounce_rate,
    "q_lorenz": q_lorenz,
    "q_ship_delay": q_ship_delay,
})


# ---------------------------------------------------------------------------
# Candidate-key discovery (uniqueness audit over key combinations)
# ---------------------------------------------------------------------------
def q_key_discovery(sf_dir: str):
    """Uniqueness audit of three candidate keys over the event stream
    — the schema-discovery step every ingest contract starts from:
    n_distinct vs n_rows per candidate, and whether it is a key.
    Each candidate folds through ONE coarse count shuffle (per-batch
    local dedup partials first, so the all-to-all moves distinct
    candidate values, not rows); only three scalar pairs reach the
    driver.  NULLs count as values (the pragmatic dedup convention,
    mirrored by the oracle's count(DISTINCT (..)) on a struct)."""
    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_id", "user_id", "ts"])
    n_rows = ev.count()

    def distinct_count(cols) -> int:
        def local(b: pd.DataFrame) -> pd.DataFrame:
            return b[cols].drop_duplicates()

        d = coarse_agg(ev.map_batches(local, batch_format="pandas"),
                       cols, {"c": (cols[0], "size")})
        return d.count()

    cands = [("event_id", ["event_id"]),
             ("user_id", ["user_id"]),
             ("user_id,ts", ["user_id", "ts"])]
    rows = []
    for name, cols in cands:
        nd = distinct_count(cols)
        rows.append((name, n_rows, nd, nd == n_rows))
    out = pd.DataFrame(rows, columns=["candidate", "n_rows",
                                      "n_distinct", "is_key"])
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_distinct"] = out["n_distinct"].astype("int64")
    return out.sort_values("candidate").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Out-of-order event rate (ingest-sequence vs event-time QA)
# ---------------------------------------------------------------------------
def q_ooo_rate(sf_dir: str):
    """Per-user out-of-order rate: among consecutive events in INGEST
    order (event_id), how often event time goes backwards — the
    watermark-lateness QA a streaming consumer sizes its buffers
    from.  One coarse shuffle on user; adjacent-pair comparison is
    vectorized over each bucket's (user, event_id)-sorted rows; a
    single (pairs, inversions) scalar pair folds out.  The
    documented partitioning assumption: adjacency is PER USER
    (global adjacency would need a total event_id sort)."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    nb = _auto_num_buckets()
    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "event_id", "ts"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts"])
        g = pd.DataFrame({
            "u": b["user_id"].astype("int64").to_numpy(),
            "eid": b["event_id"].astype("int64").to_numpy(),
            "us": b["ts"].astype("datetime64[us]").astype("int64")
            .to_numpy()})
        g["__coarse"] = _bucket_ids(g, ["u"], nb)
        return g

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "eid"], kind="mergesort")
        u = g["u"].to_numpy("int64")
        us = g["us"].to_numpy("int64")
        same = u[1:] == u[:-1]
        pairs = int(same.sum())
        ooo = int(((us[1:] < us[:-1]) & same).sum())
        return pd.DataFrame({"n_pairs": [pairs], "n_ooo": [ooo]})

    p = (ev.map_batches(stamp, batch_format="pandas")
         .groupby("__coarse").map_groups(bucket, batch_format="pandas")
         .to_pandas())
    n_pairs = int(p["n_pairs"].sum())
    n_ooo = int(p["n_ooo"].sum())
    return pd.DataFrame({
        "n_pairs": pd.array([n_pairs], dtype="int64"),
        "n_ooo": pd.array([n_ooo], dtype="int64"),
        "ooo_rate": [float(_round_sql(n_ooo / n_pairs, 6))
                     if n_pairs else 0.0]})


QUERIES.update({
    "q_key_discovery": q_key_discovery,
    "q_ooo_rate": q_ooo_rate,
})


# ---------------------------------------------------------------------------
# Fill-in-the-middle training prep (PSM reorder per doc)
# ---------------------------------------------------------------------------
def q_fim_split(sf_dir: str):
    """Fill-in-the-middle training prep: each doc's token stream splits
    at the deterministic 1/3 and 2/3 cut points and reorders to PSM
    (prefix, suffix, middle) — the FIM transformation of Bavarian et
    al. (2022; public method), emitted as per-doc split sizes plus an
    md5 of the reordered text so the full transform is value-checked
    without shipping doc-sized strings through the compare.  Pure
    doc-local map work: no shuffle at any scale."""
    from bb_ocr_ray.functions.hashing import md5_hex, ws_tokens

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def fim(b: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "n_tokens": [], "n_prefix": [],
               "n_middle": [], "n_suffix": [], "fim_md5": []}
        for did, t in zip(b["doc_id"], b["text"]):
            tk = ws_tokens(t or "")
            n = len(tk)
            a, c = n // 3, (2 * n) // 3
            pre, mid, suf = tk[:a], tk[a:c], tk[c:]
            psm = "\x01".join((" ".join(pre), " ".join(suf),
                               " ".join(mid)))
            out["doc_id"].append(int(did))
            out["n_tokens"].append(n)
            out["n_prefix"].append(len(pre))
            out["n_middle"].append(len(mid))
            out["n_suffix"].append(len(suf))
            out["fim_md5"].append(md5_hex(psm))
        return pd.DataFrame({
            "doc_id": pd.Series(out["doc_id"], dtype="int64"),
            "n_tokens": pd.Series(out["n_tokens"], dtype="int64"),
            "n_prefix": pd.Series(out["n_prefix"], dtype="int64"),
            "n_middle": pd.Series(out["n_middle"], dtype="int64"),
            "n_suffix": pd.Series(out["n_suffix"], dtype="int64"),
            "fim_md5": pd.Series(out["fim_md5"], dtype="object")})

    return docs.map_batches(fim, batch_format="pandas").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Hard-negative mining for contrastive training
# ---------------------------------------------------------------------------
def q_hard_negatives(sf_dir: str):
    """Hardest negative per query vector: the highest-cosine neighbor
    with a DIFFERENT label, for query vec_id < 10 — the mining step of
    every contrastive/triplet training loop (Schroff et al.'s
    semi-hard mining frame, CVPR 2015; public method).  The 10-query
    matrix broadcasts once via ray.put (the ann_topk posture); each
    batch emits a per-query partial best among its different-label
    rows; a query-bounded reduce picks the global argmax.  Ranking is
    at the fixed 4 dp grain on BOTH engines so near-ties cannot flip
    the winner (the q_hybrid_rrf convention)."""
    import ray

    from bb_ocr_ray.stages.ann import _normalize, _to_matrix

    vecs = _read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding", "label"])

    import pyarrow.compute as pc

    # arrow-native filter: an empty pandas block with a list column
    # trips Ray's block size estimator (harmless but noisy); arrow
    # blocks size cleanly
    qrows = vecs.map_batches(
        lambda t: t.filter(pc.less(t["vec_id"], 10)),
        batch_format="pyarrow").to_pandas()
    qrows = qrows.sort_values("vec_id")
    q_ref = ray.put((qrows["vec_id"].astype("int64").tolist(),
                     qrows["label"].astype("int64").tolist(),
                     _normalize(_to_matrix(qrows["embedding"]))))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        qids, qlabs, qmat = ray.get(q_ref)
        ids = b["vec_id"].astype("int64").to_numpy()
        labs = b["label"].astype("int64").to_numpy()
        mat = _normalize(_to_matrix(b["embedding"]))
        sims = np.round(qmat @ mat.T, 4)
        rows = {"query_id": [], "qlabel": [], "neighbor_id": [],
                "neg_label": [], "score": []}
        for qi, (qid, qlab) in enumerate(zip(qids, qlabs)):
            mask = labs != qlab
            if not mask.any():
                continue
            s = sims[qi][mask]
            cand_ids = ids[mask]
            order = np.lexsort((cand_ids, -s))[0]
            rows["query_id"].append(qid)
            rows["qlabel"].append(qlab)
            rows["neighbor_id"].append(int(cand_ids[order]))
            rows["neg_label"].append(int(labs[mask][order]))
            rows["score"].append(float(s[order]))
        return pd.DataFrame({
            "query_id": pd.Series(rows["query_id"], dtype="int64"),
            "qlabel": pd.Series(rows["qlabel"], dtype="int64"),
            "neighbor_id": pd.Series(rows["neighbor_id"], dtype="int64"),
            "neg_label": pd.Series(rows["neg_label"], dtype="int64"),
            "score": pd.Series(rows["score"], dtype="float64")})

    parts = vecs.map_batches(partial, batch_format="pandas")

    def reduce_best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"],
                          ascending=[False, True],
                          kind="mergesort").head(1)
        return g.reset_index(drop=True)

    out = (parts.groupby("query_id")
           .map_groups(reduce_best, batch_format="pandas").to_pandas())
    for c in ("query_id", "qlabel", "neighbor_id", "neg_label"):
        out[c] = out[c].astype("int64")
    return out.sort_values("query_id").reset_index(drop=True)


QUERIES.update({
    "q_fim_split": q_fim_split,
    "q_hard_negatives": q_hard_negatives,
})


# ---------------------------------------------------------------------------
# Language-ID confusion matrix (classifier-eval view of q_langid)
# ---------------------------------------------------------------------------
def q_lang_confusion(sf_dir: str):
    """Full (true lang, predicted lang) confusion matrix of the n-gram
    language-ID heuristic — the eval table behind q_langid's per-lang
    accuracy scalar.  Same engine-side detect_lang and the same
    SQL-generated classifier mirror (oracles._langid_pred_cte), so
    the two operators cannot drift; one lang²-bounded count fold."""
    from bb_ocr_ray.stages.text_stats import add_lang_pred

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["lang", "text"])
    scored = ds.map_batches(add_lang_pred, batch_format="pandas")
    out = coarse_agg(
        scored.map_batches(
            lambda b: pd.DataFrame({
                "lang": b["lang"], "lang_pred": b["lang_pred"],
                "n": np.ones(len(b), dtype="int64")}),
            batch_format="pandas"),
        ["lang", "lang_pred"], {"n": ("n", "sum")}).to_pandas()
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["lang", "lang_pred"])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (tokenizer sizing)
# ---------------------------------------------------------------------------
def q_vocab_coverage(sf_dir: str):
    """Share of all token OCCURRENCES covered by the top-k vocabulary
    for k in {1,2,4,...,128} — the coverage curve every tokenizer
    vocab-size decision is read off (the OOV complement of q_oov_rate
    as a function of k).  One vocab-bounded count fold; the top-128
    cut is a Dataset sort+limit with the (n desc, tok asc) total
    tiebreak; the cumulative arithmetic runs on those 128 rows plus
    the aggregate total."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for t in b["text"]:
            cnt.update(ws_tokens(t or ""))
        return pd.DataFrame({"tok": list(cnt.keys()),
                             "n": np.fromiter(cnt.values(), dtype="int64")})

    vocab = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                       ["tok"], {"n": ("n", "sum")}).materialize()
    vocab_size = vocab.count()
    total = int(vocab.sum("n"))
    top = (vocab.sort(["n", "tok"], descending=[True, False])
           .limit(128).to_pandas())
    cum = np.cumsum(top["n"].to_numpy("int64"))
    rows = []
    for k in (1, 2, 4, 8, 16, 32, 64, 128):
        if k > vocab_size:
            break
        cov = int(cum[k - 1])
        rows.append((k, cov, float(_round_sql(cov / total, 6))))
    out = pd.DataFrame(rows, columns=["k", "n_covered", "coverage"])
    out["k"] = out["k"].astype("int64")
    out["n_covered"] = out["n_covered"].astype("int64")
    return out


# ---------------------------------------------------------------------------
# View-to-purchase conversion lag histogram
# ---------------------------------------------------------------------------
def q_conversion_lag(sf_dir: str):
    """Histogram of days from a user's FIRST view to their first
    purchase at-or-after it — the conversion-latency distribution
    behind q_funnel_windowed's fixed-window counts.  One coarse
    shuffle on user; first-view / first-qualifying-purchase are
    vectorized groupby mins inside the bucket; a day-bounded
    histogram folds out.  Users who never convert simply don't
    appear (INNER-join semantics, mirrored by the oracle)."""
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    _D = 86_400_000_000
    nb = _auto_num_buckets()
    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["user_id", "ts", "event_type"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts"])
        b = b[b["event_type"].isin(["view", "purchase"])]
        g = pd.DataFrame({
            "u": b["user_id"].astype("int64").to_numpy(),
            "us": b["ts"].astype("datetime64[us]").astype("int64")
            .to_numpy(),
            "et": b["event_type"].to_numpy()})
        g["__coarse"] = _bucket_ids(g, ["u"], nb)
        return g

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = (g[g["et"] == "view"].groupby("u")["us"].min()
             .rename("vts").reset_index())
        p = g[g["et"] == "purchase"][["u", "us"]].merge(v, on="u")
        p = p[p["us"] >= p["vts"]]
        if p.empty:
            return pd.DataFrame({"lag_days": pd.Series([], dtype="int64"),
                                 "n_users": pd.Series([], dtype="int64")})
        first = p.groupby("u", as_index=False).agg(
            pts=("us", "min"), vts=("vts", "min"))
        lag = ((first["pts"] - first["vts"]) // _D).astype("int64")
        vc = lag.value_counts()
        return pd.DataFrame({"lag_days": vc.index.to_numpy("int64"),
                             "n_users": vc.to_numpy("int64")})

    folded = (ev.map_batches(stamp, batch_format="pandas")
              .groupby("__coarse").map_groups(bucket,
                                              batch_format="pandas"))
    out = coarse_agg(folded, ["lag_days"],
                     {"n_users": ("n_users", "sum")}).to_pandas()
    out["lag_days"] = out["lag_days"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("lag_days").reset_index(drop=True)


QUERIES.update({
    "q_lang_confusion": q_lang_confusion,
    "q_vocab_coverage": q_vocab_coverage,
    "q_conversion_lag": q_conversion_lag,
})


# ---------------------------------------------------------------------------
# Gopher-style rule filter report (quality-gate pass counts)
# ---------------------------------------------------------------------------
def q_gopher_rules(sf_dir: str):
    """Pass counts for four Gopher-style document quality rules plus
    the all-rules keep count — the filter REPORT view next to
    q_doc_quality's feature sums (Rae et al. 2021 'Gopher' rule
    family; public method).  Rules: word count >= 40; mean word
    length in [3, 10]; >= 2 stopword hits; >= 80% purely-alphabetic
    tokens.  Pure vectorized doc-local flags, one five-scalar fold;
    the report is what a RefinedWeb-style cleaning run logs per
    shard."""
    from bb_ocr_ray.functions.hashing import ws_tokens
    from bb_ocr_ray.functions.textstats import STOPWORDS

    stop = frozenset(STOPWORDS)
    docs = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def flags(b: pd.DataFrame) -> pd.DataFrame:
        import re
        alpha = re.compile(r"^[a-zA-Z]+$")
        n = lenr = stopr = alphar = keep = docs_n = 0
        for t in b["text"]:
            tk = ws_tokens(t or "")
            wc = len(tk)
            r1 = wc >= 40
            r2 = (wc > 0
                  and 3.0 <= sum(len(x) for x in tk) / wc <= 10.0)
            r3 = sum(1 for x in tk if x in stop) >= 2
            r4 = wc > 0 and sum(
                1 for x in tk if alpha.match(x)) * 5 >= wc * 4
            docs_n += 1
            n += r1
            lenr += r2
            stopr += r3
            alphar += r4
            keep += (r1 and r2 and r3 and r4)
        return pd.DataFrame({
            "n_docs": [docs_n], "pass_wordcount": [n],
            "pass_wordlen": [lenr], "pass_stopwords": [stopr],
            "pass_alpha": [alphar], "n_keep": [keep]})

    p = docs.map_batches(flags, batch_format="pandas").to_pandas()
    out = pd.DataFrame({c: pd.array([int(p[c].sum())], dtype="int64")
                        for c in ("n_docs", "pass_wordcount",
                                  "pass_wordlen", "pass_stopwords",
                                  "pass_alpha", "n_keep")})
    return out


# ---------------------------------------------------------------------------
# Crawl budget allocation (largest-remainder apportionment)
# ---------------------------------------------------------------------------
def q_budget_alloc(sf_dir: str):
    """Apportion a fixed crawl budget of 10,000 fetches across domains
    proportionally to their doc counts with largest-remainder
    (Hamilton) rounding — exact integer arithmetic: base = B*c // N,
    then the B - sum(base) largest remainders (B*c % N, domain-asc
    tiebreak) get +1.  The domain-count fold is the only shuffle; the
    apportionment runs on the domain-bounded table (the same bounded
    posture as q_domain_stats' output side)."""
    _B = 10_000
    docs = _read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def dom(b: pd.DataFrame) -> pd.DataFrame:
        m = b["doc_id"].astype("int64") % 10
        d = np.where(m < 3, "hot.example.com",
                     "site" + m.astype(str) + ".example.com")
        vc = pd.Series(d).value_counts()
        return pd.DataFrame({"domain": vc.index.to_numpy(),
                             "c": vc.to_numpy("int64")})

    t = coarse_agg(docs.map_batches(dom, batch_format="pandas"),
                   ["domain"], {"c": ("c", "sum")}).to_pandas()
    t["c"] = t["c"].astype("int64")
    n = int(t["c"].sum())
    t["base"] = (_B * t["c"]) // n
    t["rem"] = (_B * t["c"]) % n
    t = t.sort_values(["rem", "domain"],
                      ascending=[False, True], kind="mergesort")
    extra = _B - int(t["base"].sum())
    t["budget"] = t["base"] + (np.arange(len(t)) < extra).astype("int64")
    out = t[["domain", "c", "budget"]].rename(columns={"c": "n_docs"})
    for c in ("n_docs", "budget"):
        out[c] = out[c].astype("int64")
    return out.sort_values("domain").reset_index(drop=True)


QUERIES.update({
    "q_gopher_rules": q_gopher_rules,
    "q_budget_alloc": q_budget_alloc,
})


# ---------------------------------------------------------------------------
# Script-mix histogram per language (charset QA)
# ---------------------------------------------------------------------------
def q_script_mix(sf_dir: str):
    """Per-language codepoint class counts — latin letters, digits,
    whitespace, CJK, other — the charset-mix QA that catches mojibake
    and mislabeled languages before they poison a tokenizer.  One
    utf-32 reinterpret per doc vectorizes the classification (no
    per-char Python); a lang-bounded five-column fold."""
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["lang", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for lang, t in zip(b["lang"], b["text"]):
            s = t or ""
            cp = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
            lat = int((((cp >= 65) & (cp <= 90))
                       | ((cp >= 97) & (cp <= 122))).sum())
            dig = int(((cp >= 48) & (cp <= 57)).sum())
            ws = int(np.isin(cp, (32, 9, 10, 13, 12, 11)).sum())
            cjk = int(((cp >= 0x4E00) & (cp <= 0x9FFF)).sum())
            oth = len(cp) - lat - dig - ws - cjk
            acc = rows.setdefault(lang, [0, 0, 0, 0, 0])
            for i, v in enumerate((lat, dig, ws, cjk, oth)):
                acc[i] += v
        ks = list(rows.keys())
        return pd.DataFrame({
            "lang": ks,
            "n_latin": np.array([rows[k][0] for k in ks], dtype="int64"),
            "n_digit": np.array([rows[k][1] for k in ks], dtype="int64"),
            "n_ws": np.array([rows[k][2] for k in ks], dtype="int64"),
            "n_cjk": np.array([rows[k][3] for k in ks], dtype="int64"),
            "n_other": np.array([rows[k][4] for k in ks], dtype="int64")})

    out = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                     ["lang"],
                     {c: (c, "sum") for c in
                      ("n_latin", "n_digit", "n_ws", "n_cjk",
                       "n_other")}).to_pandas()
    for c in out.columns:
        if c != "lang":
            out[c] = out[c].astype("int64")
    return out.sort_values("lang").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Duplicate-provenance flow matrix (who published first)
# ---------------------------------------------------------------------------
def q_dup_flow(sf_dir: str):
    """(first source, duplicating source) counts over PREFIX-content
    clusters (md5 of the first 64 chars — the q_dup_cluster_sizes
    key, non-degenerate at every corpus scale): for each cluster, the
    min-doc_id owner is the 'first publisher' and every other member
    charges one count to its own source — the provenance matrix
    behind q_dup_ratio's per-source totals (the dedup-auditing view
    of first-wins).  ONE coarse shuffle on the prefix hash co-locates
    each cluster; the in-bucket fold picks the min owner and emits
    source-pair counts; a source²-bounded fold finishes.  Doc text
    never shuffles, only 16-byte hashes + source labels."""
    from bb_ocr_ray.functions.hashing import md5_hex
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    nb = _auto_num_buckets()
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source", "text"])

    def stamp(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "source": b["source"],
            "h": [md5_hex((t or "")[:64]) for t in b["text"]]})
        g["__coarse"] = _bucket_ids(g, ["h"], nb)
        return g

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="mergesort")
        first = g.groupby("h").agg(keep=("doc_id", "min"),
                                   src_first=("source", "first"))
        m = g.merge(first, on="h")
        dups = m[m["doc_id"] != m["keep"]]
        if dups.empty:
            return pd.DataFrame({"src_first": pd.Series([], dtype="object"),
                                 "src_dup": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        out = (dups.groupby(["src_first", "source"], as_index=False)
               .size().rename(columns={"source": "src_dup",
                                       "size": "n"}))
        out["n"] = out["n"].astype("int64")
        return out

    folded = (docs.map_batches(stamp, batch_format="pandas")
              .groupby("__coarse").map_groups(bucket,
                                              batch_format="pandas"))
    out = coarse_agg(folded, ["src_first", "src_dup"],
                     {"n": ("n", "sum")}).to_pandas()
    if out.empty:
        out = pd.DataFrame({"src_first": pd.Series([], dtype="object"),
                            "src_dup": pd.Series([], dtype="object"),
                            "n": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["src_first", "src_dup"])
            .reset_index(drop=True))


QUERIES.update({
    "q_script_mix": q_script_mix,
    "q_dup_flow": q_dup_flow,
})


# ---------------------------------------------------------------------------
# WAND per-term score upper bounds (top-k retrieval pruning table)
# ---------------------------------------------------------------------------
def q_wand_bounds(sf_dir: str):
    """Per-term tf-idf upper bounds — max over docs of tf(t,d)·idf(t),
    the pruning table WAND-style top-k retrieval evaluates before
    touching postings (Broder et al., CIKM'03; public method).  Since
    idf is constant per term, the bound factors to max_tf·idf, so ONE
    coarse fold carries both statistics: per-batch partials emit each
    term's in-batch max per-doc tf AND its distinct-doc count, folded
    with (max, sum).  Ranking is at the 6 dp grain with a term-asc
    tiebreak on both engines."""
    from collections import Counter

    import math

    from bb_ocr_ray.functions.hashing import ws_tokens

    ds = _read_parquet(_t(sf_dir, "documents"), columns=["text"])
    n_docs = ds.count()

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        mx: dict = {}
        df: Counter = Counter()
        for t in b["text"]:
            c = Counter(ws_tokens(t or ""))
            df.update(c.keys())
            for tok, n in c.items():
                if n > mx.get(tok, 0):
                    mx[tok] = n
        ks = list(df.keys())
        return pd.DataFrame({
            "tok": ks,
            "max_tf": np.array([mx[k] for k in ks], dtype="int64"),
            "df": np.array([df[k] for k in ks], dtype="int64")})

    stats = coarse_agg(ds.map_batches(partial, batch_format="pandas"),
                       ["tok"], {"max_tf": ("max_tf", "max"),
                                 "df": ("df", "sum")}).to_pandas()
    stats["max_tf"] = stats["max_tf"].astype("int64")
    stats["df"] = stats["df"].astype("int64")
    stats["bound"] = [
        float(_round_sql(mt * math.log(n_docs / d), 6))
        for mt, d in zip(stats["max_tf"], stats["df"])]
    out = stats.sort_values(["bound", "tok"],
                            ascending=[False, True],
                            kind="mergesort").head(20)
    return out[["tok", "max_tf", "df", "bound"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# Rare-category collapse (tail-cardinality capping featurizer)
# ---------------------------------------------------------------------------
def q_rare_collapse(sf_dir: str):
    """Token histogram with every token under 1% of total occurrences
    collapsed to '__rare__' — the tail-capping every categorical
    featurizer applies before one-hot/hashing (cardinality control).
    Exact integer threshold (n·100 < total, no float compare); one
    vocab-bounded fold, then bounded recode arithmetic."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens

    docs = _read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cnt: Counter = Counter()
        for t in b["text"]:
            cnt.update(ws_tokens(t or ""))
        return pd.DataFrame({"tok": list(cnt.keys()),
                             "n": np.fromiter(cnt.values(), dtype="int64")})

    vocab = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                       ["tok"], {"n": ("n", "sum")}).to_pandas()
    vocab["n"] = vocab["n"].astype("int64")
    total = int(vocab["n"].sum())
    rare = vocab["n"] * 100 < total
    kept = vocab[~rare][["tok", "n"]].rename(columns={"tok": "category"})
    if rare.any():
        kept = pd.concat([kept, pd.DataFrame(
            {"category": ["__rare__"],
             "n": [int(vocab.loc[rare, "n"].sum())]})],
            ignore_index=True)
    kept["n"] = kept["n"].astype("int64")
    return kept.sort_values("category").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Token casing profile per source (OCR/mojibake artifact QA)
# ---------------------------------------------------------------------------
def q_case_stats(sf_dir: str):
    """Per-source token casing mix — all-lower, Title-case, ALL-UPPER
    (2+ chars), other — the casing QA that flags OCR shout-case
    artifacts and broken sentence segmentation.  Classes are disjoint
    ASCII regex classes evaluated in a fixed priority (lower, upper,
    title, other) identically on both engines; per-batch Counter with
    a distinct-token memo; one source-bounded fold."""
    import re

    from collections import Counter

    from bb_ocr_ray.functions.hashing import ws_tokens

    _LOW = re.compile(r"^[a-z]+$")
    _UP = re.compile(r"^[A-Z]{2,}$")
    _TI = re.compile(r"^[A-Z][a-z]*$")
    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def cls(tok: str) -> int:
        if _LOW.match(tok):
            return 0
        if _UP.match(tok):
            return 1
        if _TI.match(tok):
            return 2
        return 3

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        memo: dict = {}
        rows: dict = {}
        for s, t in zip(b["source"], b["text"]):
            acc = rows.setdefault(s, [0, 0, 0, 0])
            for tok in ws_tokens(t or ""):
                k = memo.get(tok)
                if k is None:
                    k = memo[tok] = cls(tok)
                acc[k] += 1
        ks = list(rows.keys())
        return pd.DataFrame({
            "source": ks,
            "n_lower": np.array([rows[k][0] for k in ks], dtype="int64"),
            "n_upper": np.array([rows[k][1] for k in ks], dtype="int64"),
            "n_title": np.array([rows[k][2] for k in ks], dtype="int64"),
            "n_other": np.array([rows[k][3] for k in ks], dtype="int64")})

    out = coarse_agg(docs.map_batches(partial, batch_format="pandas"),
                     ["source"],
                     {c: (c, "sum") for c in
                      ("n_lower", "n_upper", "n_title", "n_other")}
                     ).to_pandas()
    for c in out.columns:
        if c != "source":
            out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


QUERIES.update({
    "q_wand_bounds": q_wand_bounds,
    "q_rare_collapse": q_rare_collapse,
    "q_case_stats": q_case_stats,
})


# ---------------------------------------------------------------------------
# Revenue by supplier nation x part brand (TPC-H Q9-style join chain)
# ---------------------------------------------------------------------------
def q_profit_by_brand(sf_dir: str):
    """Revenue grouped by (supplier nation, part brand) — the Q9-style
    star chain lineitem⋈part⋈supplier⋈nation that exercises TWO
    size-gated dimension attaches on the same fact stream.  Revenue
    is exact integer cents with the q1/q5 rounding ladder
    (price·100 and disc·100 rounded to ints per row); partial
    aggregation runs before the one bounded (nation, brand) fold."""
    from bb_ocr_ray.stages.joins import auto_join

    li = _read_parquet(_t(sf_dir, "lineitem"),
                       columns=["l_partkey", "l_suppkey",
                                "l_extendedprice", "l_discount"])
    part = _read_parquet(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_brand"])
    supp = _read_parquet(_t(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"])
    nation = _read_parquet(_t(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name"])

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        ext_c = _round_sql(b["l_extendedprice"] * 100.0, 0)
        disc_pct = _round_sql(b["l_discount"] * 100.0, 0)
        return pd.DataFrame({
            "p_partkey": b["l_partkey"].astype("int64"),
            "s_suppkey": b["l_suppkey"].astype("int64"),
            "rev_c": (ext_c * (100 - disc_pct)).astype("int64")})

    j = auto_join(li.map_batches(keyed, batch_format="pandas"),
                  part, on="p_partkey")
    j = auto_join(j, supp, on="s_suppkey")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["s_nationkey", "p_brand"], as_index=False)
                .agg(rev_c=("rev_c", "sum"),
                     n_items=("rev_c", "size")))

    agg = coarse_agg(j.map_batches(partial, batch_format="pandas"),
                     ["s_nationkey", "p_brand"],
                     {"rev_c": ("rev_c", "sum"),
                      "n_items": ("n_items", "sum")})
    nat = nation.to_pandas()
    out = agg.to_pandas().merge(
        nat.rename(columns={"n_nationkey": "s_nationkey"}),
        on="s_nationkey")
    out["revenue"] = _round_sql(
        out["rev_c"].astype("int64") / 10_000.0, 2)
    out["n_items"] = out["n_items"].astype("int64")
    out = out[["n_name", "p_brand", "n_items", "revenue"]]
    return (out.sort_values(["n_name", "p_brand"])
            .reset_index(drop=True))


# ---------------------------------------------------------------------------
# Day-of-week x hour-of-day seasonality profile
# ---------------------------------------------------------------------------
def q_dow_profile(sf_dir: str):
    """Average events per (day-of-week, hour-of-day) cell — the
    seasonality fingerprint dashboards draw as a heatmap.  Both
    engines derive dow with pure integer arithmetic on epoch days
    ((day + 4) % 7, Monday=0 — never a calendar function, whose
    week-start conventions differ across engines).  One 168-cell
    fold; the per-cell denominator is how many distinct dates of
    that weekday the stream spans (exact ints, ratio at 6 dp)."""
    _D = 86_400_000_000
    _H = 3_600_000_000
    ev = _read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def cells(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["ts"])
        us = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        day = us // _D
        g = pd.DataFrame({"dow": (day + 4) % 7,
                          "hod": (us % _D) // _H,
                          "day": day})
        cnt = (g.groupby(["dow", "hod"], as_index=False)
               .agg(n=("day", "size")))
        return cnt

    cnt = coarse_agg(ev.map_batches(cells, batch_format="pandas"),
                     ["dow", "hod"], {"n": ("n", "sum")}).to_pandas()

    def days_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["ts"])
        us = b["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        day = np.unique(us // _D)
        return pd.DataFrame({"day": day})

    ev2 = _read_parquet(_t(sf_dir, "events"), columns=["ts"])
    days = coarse_agg(ev2.map_batches(days_partial,
                                      batch_format="pandas"),
                      ["day"], {"n": ("day", "size")}).to_pandas()
    dow_days = ((days["day"].astype("int64") + 4) % 7).value_counts()

    cnt["dow"] = cnt["dow"].astype("int64")
    cnt["hod"] = cnt["hod"].astype("int64")
    cnt["n"] = cnt["n"].astype("int64")
    cnt["n_days"] = [int(dow_days.get(d, 0)) for d in cnt["dow"]]
    cnt["avg_events"] = [
        float(_round_sql(n / d, 6))
        for n, d in zip(cnt["n"], cnt["n_days"])]
    return (cnt[["dow", "hod", "n", "n_days", "avg_events"]]
            .sort_values(["dow", "hod"]).reset_index(drop=True))


QUERIES.update({
    "q_profit_by_brand": q_profit_by_brand,
    "q_dow_profile": q_dow_profile,
})


# ---------------------------------------------------------------------------
# Rolling 7-day p95 of the daily count series (robust volume monitor)
# ---------------------------------------------------------------------------
def q_rolling_median(sf_dir: str):
    """Rolling 7-row MEDIAN (quantile_disc semantics) of the daily
    event count in day order — the robust alerting baseline that,
    unlike q_rolling_actives' mean-style windows, ignores single
    spike days (a 7-row p95 would just be the max, which is why the
    median is the grain here).  The corpus folds to the day-bounded
    series through one coarse shuffle; the rolling order statistics
    run on that bounded series with the exact ceil(q*n)-1 element
    pick, so the output is an exact element, bit-identical on both
    engines."""
    import math

    ev = _read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def days(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["ts"])
        d = (b["ts"].astype("datetime64[us]").astype("int64")
             // 86_400_000_000)
        vc = pd.Series(d).value_counts()
        return pd.DataFrame({"day": vc.index.to_numpy("int64"),
                             "n": vc.to_numpy("int64")})

    t = coarse_agg(ev.map_batches(days, batch_format="pandas"),
                   ["day"], {"n": ("n", "sum")}).to_pandas()
    t = t.sort_values("day").reset_index(drop=True)
    n = t["n"].to_numpy("int64")
    out = []
    for i in range(len(n)):
        w = np.sort(n[max(0, i - 6):i + 1])
        out.append(int(w[math.ceil(0.5 * len(w)) - 1]))
    t["med_7d"] = pd.array(out, dtype="int64")
    t["day"] = t["day"].astype("int64")
    t["n"] = t["n"].astype("int64")
    return t[["day", "n", "med_7d"]]


# ---------------------------------------------------------------------------
# Per-type arrival rate (shuffle-free exact mean inter-arrival)
# ---------------------------------------------------------------------------
def q_arrival_rate(sf_dir: str):
    """Per event type: event count, stream span, exact mean
    inter-arrival gap and hourly rate.  The mean of consecutive gaps
    telescopes to (max-min)/(n-1), so the WHOLE statistic is a
    min/max/count fold — no ordering, no shuffle of raw events, exact
    integer division on both engines.  (The telescoping identity is
    why no sort is needed at any scale — the max gap, which doesn't
    telescope, lives in q_event_gaps instead.)"""
    ev = _read_parquet(_t(sf_dir, "events"),
                       columns=["event_type", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["ts"])
        us = b["ts"].astype("datetime64[us]").astype("int64")
        g = pd.DataFrame({"event_type": b["event_type"],
                          "mn": us, "mx": us,
                          "one": np.ones(len(b), dtype="int64")})
        return g.groupby("event_type", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max"), one=("one", "sum"))

    t = coarse_agg(ev.map_batches(partial, batch_format="pandas"),
                   ["event_type"], {"mn": ("mn", "min"),
                                    "mx": ("mx", "max"),
                                    "one": ("one", "sum")}).to_pandas()
    t["n"] = t["one"].astype("int64")
    t["span_us"] = (t["mx"].astype("int64")
                    - t["mn"].astype("int64")).astype("int64")
    t["mean_gap_us"] = (t["span_us"]
                        // (t["n"] - 1).clip(lower=1)).astype("int64")
    t["per_hour"] = [
        float(_round_sql(3_600_000_000.0 * (n - 1) / s, 6))
        if s > 0 else 0.0
        for n, s in zip(t["n"], t["span_us"])]
    out = t[["event_type", "n", "span_us", "mean_gap_us", "per_hour"]]
    return out.sort_values("event_type").reset_index(drop=True)


QUERIES.update({
    "q_rolling_median": q_rolling_median,
    "q_arrival_rate": q_arrival_rate,
})


# ---------------------------------------------------------------------------
# Sample-ratio mismatch guardrail (chi-square on arm assignment)
# ---------------------------------------------------------------------------
def q_ab_srm(sf_dir: str):
    """Sample-ratio-mismatch check for the q_ab_test arms (user_id % 2,
    expected 50/50): chi-square goodness-of-fit on DISTINCT users per
    arm and the p<.05 flag (chi2 > 3.841) — the guardrail every
    experimentation platform runs before believing any A/B readout
    (Fabijan et al., KDD'19 frame; public method).  Distinct users
    fold through one coarse shuffle (per-batch dedup partials); the
    chi-square is two-scalar arithmetic, flagged on the ROUNDED
    statistic so a float near-tie at the threshold cannot flip the
    boolean between engines."""
    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id"])
        u = b["user_id"].astype("int64").drop_duplicates()
        return pd.DataFrame({"u": u.to_numpy()})

    users = coarse_agg(ev.map_batches(pairs, batch_format="pandas"),
                       ["u"], {"c": ("u", "size")})

    def arms(b: pd.DataFrame) -> pd.DataFrame:
        arm = (b["u"].astype("int64") % 2).to_numpy()
        return pd.DataFrame({
            "n_a": [int((arm == 0).sum())],
            "n_b": [int((arm == 1).sum())]})

    p = users.map_batches(arms, batch_format="pandas").to_pandas()
    n_a, n_b = int(p["n_a"].sum()), int(p["n_b"].sum())
    n = n_a + n_b
    exp = n / 2.0
    chi2 = float(_round_sql(
        (n_a - exp) ** 2 / exp + (n_b - exp) ** 2 / exp, 6)) if n else 0.0
    return pd.DataFrame({
        "n_a": pd.array([n_a], dtype="int64"),
        "n_b": pd.array([n_b], dtype="int64"),
        "chi2": [chi2],
        "srm": [bool(chi2 > 3.841)]})


# ---------------------------------------------------------------------------
# Embedding outliers vs own-label centroid (mislabel QA)
# ---------------------------------------------------------------------------
def q_emb_outliers(sf_dir: str):
    """Per label: vectors whose squared distance to their OWN label's
    centroid exceeds 4x the label's mean squared distance — the
    cheap mislabel/contamination screen run before trusting a labeled
    embedding set.  Pass 1 folds per-label vector sums (a label x dim
    bounded table) into centroids; pass 2 broadcasts them as closure
    constants and folds (n, sum d², outlier count) per label.  The
    outlier compare runs on 6 dp-rounded doubles on BOTH engines (the
    registry's boundary-stability convention)."""
    emb = _read_parquet(_t(sf_dir, "embeddings"),
                        columns=["vec_id", "embedding", "label"])

    def sums(b: pd.DataFrame) -> pd.DataFrame:
        X = np.asarray([np.asarray(e, dtype="float64")
                        for e in b["embedding"]])
        lab = b["label"].astype("int64").to_numpy()
        rows = []
        for lv in np.unique(lab):
            m = lab == lv
            s = X[m].sum(axis=0)
            for d, v in enumerate(s):
                rows.append((int(lv), d, float(v), int(m.sum()) if d == 0
                             else 0))
        return pd.DataFrame(rows, columns=["label", "d", "s", "n"])

    cs = coarse_agg(emb.map_batches(sums, batch_format="pandas"),
                    ["label", "d"], {"s": ("s", "sum"),
                                     "n": ("n", "sum")}).to_pandas()
    n_per = (cs.groupby("label")["n"].sum()).to_dict()
    cent = {int(lv): (sub.sort_values("d")["s"].to_numpy("float64")
                      / n_per[lv])
            for lv, sub in cs.groupby("label")}

    def dists(b: pd.DataFrame) -> pd.DataFrame:
        X = np.asarray([np.asarray(e, dtype="float64")
                        for e in b["embedding"]])
        lab = b["label"].astype("int64").to_numpy()
        rows = []
        for lv in np.unique(lab):
            m = lab == lv
            d2 = ((X[m] - cent[int(lv)]) ** 2).sum(axis=1)
            rows.append((int(lv), int(m.sum()), float(d2.sum())))
        return pd.DataFrame(rows, columns=["label", "n", "sum_d2"])

    t = coarse_agg(emb.map_batches(dists, batch_format="pandas"),
                   ["label"], {"n": ("n", "sum"),
                               "sum_d2": ("sum_d2", "sum")}).to_pandas()
    mean_d2 = {int(lv): float(s) / int(n)
               for lv, s, n in zip(t["label"], t["sum_d2"], t["n"])}

    def outliers(b: pd.DataFrame) -> pd.DataFrame:
        X = np.asarray([np.asarray(e, dtype="float64")
                        for e in b["embedding"]])
        lab = b["label"].astype("int64").to_numpy()
        rows = []
        for lv in np.unique(lab):
            m = lab == lv
            d2 = ((X[m] - cent[int(lv)]) ** 2).sum(axis=1)
            d2r = np.array([float(_round_sql(x, 6)) for x in d2])
            thr = float(_round_sql(4.0 * mean_d2[int(lv)], 6))
            rows.append((int(lv), int((d2r > thr).sum())))
        return pd.DataFrame(rows, columns=["label", "n_out"])

    o = coarse_agg(emb.map_batches(outliers, batch_format="pandas"),
                   ["label"], {"n_out": ("n_out", "sum")}).to_pandas()
    out = t.merge(o, on="label")
    out["label"] = out["label"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["n_out"] = out["n_out"].astype("int64")
    out["mean_d2"] = [float(_round_sql(mean_d2[int(lv)], 6))
                      for lv in out["label"]]
    return (out[["label", "n", "mean_d2", "n_out"]]
            .sort_values("label").reset_index(drop=True))


QUERIES.update({
    "q_ab_srm": q_ab_srm,
    "q_emb_outliers": q_emb_outliers,
})


# ---------------------------------------------------------------------------
# Corpus datasheet (one-row dataset card)
# ---------------------------------------------------------------------------
def q_dataset_card(sf_dir: str):
    """One-row corpus datasheet — docs, token occurrences, vocabulary,
    languages, sources, prefix-duplicate share, mean doc length — the
    'Datasheets for Datasets' summary (Gebru et al., CACM 2021;
    public method) every published training corpus ships with.  One
    doc-local scalar fold + one vocab-bounded fold + one
    prefix-hash-cardinality fold; each contributes aggregate-sized
    partials, so the card costs three bounded folds regardless of
    corpus size."""
    from collections import Counter

    from bb_ocr_ray.functions.hashing import md5_hex, ws_tokens

    docs = _read_parquet(_t(sf_dir, "documents"),
                         columns=["text", "lang", "source"])

    def scalars(b: pd.DataFrame) -> pd.DataFrame:
        toks = 0
        chars = 0
        langs = set()
        srcs = set()
        for t, lang, s in zip(b["text"], b["lang"], b["source"]):
            toks += len(ws_tokens(t or ""))
            chars += len(t or "")
            langs.add(lang)
            srcs.add(s)
        return pd.DataFrame({
            "n_docs": [len(b)], "n_tokens": [toks], "n_chars": [chars],
            "langs": ["|".join(sorted(langs))],
            "srcs": ["|".join(sorted(srcs))]})

    p = docs.map_batches(scalars, batch_format="pandas").to_pandas()
    n_docs = int(p["n_docs"].sum())
    n_tokens = int(p["n_tokens"].sum())
    n_chars = int(p["n_chars"].sum())
    langs = set()
    srcs = set()
    for ls, ss in zip(p["langs"], p["srcs"]):
        langs.update(x for x in ls.split("|") if x)
        srcs.update(x for x in ss.split("|") if x)

    def vocab_partial(b: pd.DataFrame) -> pd.DataFrame:
        c: Counter = Counter()
        for t in b["text"]:
            c.update(set(ws_tokens(t or "")))
        return pd.DataFrame({"tok": list(c.keys()),
                             "one": np.ones(len(c), dtype="int64")})

    vocab = coarse_agg(
        docs.map_batches(vocab_partial, batch_format="pandas"),
        ["tok"], {"one": ("one", "sum")}).count()

    def prefix_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"h": [md5_hex((t or "")[:64])
                                   for t in b["text"]]})

    clusters = coarse_agg(
        docs.map_batches(prefix_partial, batch_format="pandas"),
        ["h"], {"c": ("h", "size")})
    n_clusters = clusters.count()

    return pd.DataFrame({
        "n_docs": pd.array([n_docs], dtype="int64"),
        "n_tokens": pd.array([n_tokens], dtype="int64"),
        "vocab": pd.array([int(vocab)], dtype="int64"),
        "n_langs": pd.array([len(langs)], dtype="int64"),
        "n_sources": pd.array([len(srcs)], dtype="int64"),
        "prefix_dup_share": [float(_round_sql(
            (n_docs - n_clusters) / n_docs, 6)) if n_docs else 0.0],
        "mean_doc_chars": [float(_round_sql(n_chars / n_docs, 6))
                           if n_docs else 0.0]})


QUERIES.update({"q_dataset_card": q_dataset_card})


# ---------------------------------------------------------------------------
# Active-days distribution (L28-style engagement histogram)
# ---------------------------------------------------------------------------
def q_active_days(sf_dir: str):
    """Histogram of per-user distinct active days — the L28-style
    engagement distribution (how many days of the window each user
    showed up), the non-consecutive companion to q_streak.  Per-batch
    distinct (user, day) partials -> ONE coarse count fold on user ->
    a day-count-bounded histogram fold; users never reach the
    driver."""
    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts"])
        g = pd.DataFrame({
            "u": b["user_id"].astype("int64").to_numpy(),
            "day": (b["ts"].astype("datetime64[us]").astype("int64")
                    // 86_400_000_000)}).drop_duplicates()
        return g

    per_user = coarse_agg(ev.map_batches(pairs, batch_format="pandas"),
                          ["u", "day"], {"c": ("day", "size")})
    cnt = coarse_agg(per_user.map_batches(
        lambda b: pd.DataFrame({"u": b["u"].astype("int64"),
                                "one": np.ones(len(b), dtype="int64")}),
        batch_format="pandas"), ["u"], {"days": ("one", "sum")})
    hist = coarse_agg(cnt.map_batches(
        lambda b: pd.DataFrame({"days": b["days"].astype("int64"),
                                "n_users": np.ones(len(b),
                                                   dtype="int64")}),
        batch_format="pandas"), ["days"],
        {"n_users": ("n_users", "sum")}).to_pandas()
    hist["days"] = hist["days"].astype("int64")
    hist["n_users"] = hist["n_users"].astype("int64")
    return hist.sort_values("days").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Revenue concentration per nation (Herfindahl-Hirschman index)
# ---------------------------------------------------------------------------
def q_hhi(sf_dir: str):
    """Herfindahl-Hirschman concentration of lineitem revenue across
    suppliers, per supplier nation — HHI = Σ share² (procurement-risk
    QA; public method).  Exact at any magnitude: per-(nation,
    supplier) revenue folds once in integer cents; the Σr² and (Σr)²
    terms fold per nation as DECIMAL STRINGS (a big supplier's cents²
    overflows int64), Python-int driver fold, one float division at
    the end (6 dp)."""
    from bb_ocr_ray.stages.joins import auto_join

    li = _read_parquet(_t(sf_dir, "lineitem"),
                       columns=["l_suppkey", "l_extendedprice"])
    supp = _read_parquet(_t(sf_dir, "supplier"),
                         columns=["s_suppkey", "s_nationkey"])
    nation = _read_parquet(_t(sf_dir, "nation"),
                           columns=["n_nationkey", "n_name"])

    keyed = li.map_batches(
        lambda b: pd.DataFrame({
            "s_suppkey": b["l_suppkey"].astype("int64"),
            "cents": _round_sql(b["l_extendedprice"] * 100.0, 0)
            .astype("int64")}),
        batch_format="pandas")
    j = auto_join(keyed, supp, on="s_suppkey")
    per_supp = coarse_agg(j.map_batches(
        lambda b: pd.DataFrame({
            "s_nationkey": b["s_nationkey"].astype("int64"),
            "s_suppkey": b["s_suppkey"].astype("int64"),
            "cents": b["cents"].astype("int64")}),
        batch_format="pandas"),
        ["s_nationkey", "s_suppkey"], {"cents": ("cents", "sum")})

    def parts(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for nk, sub in b.groupby("s_nationkey"):
            sq = sum(int(c) * int(c) for c in sub["cents"])
            tot = int(sub["cents"].astype("int64").sum())
            rows.append((int(nk), len(sub), str(sq), str(tot)))
        return pd.DataFrame(rows, columns=["s_nationkey", "n_suppliers",
                                           "sq", "tot"])

    p = per_supp.map_batches(parts, batch_format="pandas").to_pandas()
    agg: dict = {}
    for nk, ns, sq, tot in zip(p["s_nationkey"], p["n_suppliers"],
                               p["sq"], p["tot"]):
        a = agg.setdefault(int(nk), [0, 0, 0])
        a[0] += int(ns)
        a[1] += int(sq)
        a[2] += int(tot)
    nat = nation.to_pandas()
    names = dict(zip(nat["n_nationkey"].astype("int64"),
                     nat["n_name"]))
    # mirror the oracle's float-op order (int->double each term, THEN
    # square and divide) so the rounding path is identical even past
    # 2^53 where big-int exactness ends
    rows = [(names[nk], a[0],
             float(_round_sql(float(a[1])
                              / (float(a[2]) * float(a[2])), 6)))
            for nk, a in agg.items() if a[2] > 0]
    out = pd.DataFrame(rows, columns=["n_name", "n_suppliers", "hhi"])
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


QUERIES.update({
    "q_active_days": q_active_days,
    "q_hhi": q_hhi,
})


# ---------------------------------------------------------------------------
# Basket-size distribution (lineitems per order)
# ---------------------------------------------------------------------------
def q_order_sizes(sf_dir: str):
    """Histogram of lineitems per order — the basket-size distribution
    feeding q_market_basket's support denominators and any batch-size
    planning.  One order-keyed count fold (per-batch partials), then a
    size-bounded histogram fold; order keys never reach the driver."""
    li = _read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["l_orderkey"].astype("int64").value_counts()
        return pd.DataFrame({"o": vc.index.to_numpy("int64"),
                             "c": vc.to_numpy("int64")})

    per_order = coarse_agg(li.map_batches(partial, batch_format="pandas"),
                           ["o"], {"c": ("c", "sum")})
    hist = coarse_agg(per_order.map_batches(
        lambda b: pd.DataFrame({"basket_size": b["c"].astype("int64"),
                                "n_orders": np.ones(len(b),
                                                    dtype="int64")}),
        batch_format="pandas"), ["basket_size"],
        {"n_orders": ("n_orders", "sum")}).to_pandas()
    hist["basket_size"] = hist["basket_size"].astype("int64")
    hist["n_orders"] = hist["n_orders"].astype("int64")
    return hist.sort_values("basket_size").reset_index(drop=True)


# ---------------------------------------------------------------------------
# User lifespan (tenure) histogram
# ---------------------------------------------------------------------------
def q_user_lifespan(sf_dir: str):
    """Histogram of per-user tenure in days (last activity day minus
    first activity day) — the retention-horizon distribution next to
    q_active_days' intensity histogram.  One (min, max) fold per user
    (exact integer epoch days), then a span-bounded histogram fold."""
    ev = _read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.dropna(subset=["user_id", "ts"])
        d = (b["ts"].astype("datetime64[us]").astype("int64")
             // 86_400_000_000)
        g = pd.DataFrame({"u": b["user_id"].astype("int64").to_numpy(),
                          "mn": d, "mx": d})
        return g.groupby("u", as_index=False).agg(mn=("mn", "min"),
                                                  mx=("mx", "max"))

    per_user = coarse_agg(ev.map_batches(partial, batch_format="pandas"),
                          ["u"], {"mn": ("mn", "min"),
                                  "mx": ("mx", "max")})
    hist = coarse_agg(per_user.map_batches(
        lambda b: pd.DataFrame({
            "lifespan_days": (b["mx"].astype("int64")
                              - b["mn"].astype("int64")),
            "n_users": np.ones(len(b), dtype="int64")}),
        batch_format="pandas"), ["lifespan_days"],
        {"n_users": ("n_users", "sum")}).to_pandas()
    hist["lifespan_days"] = hist["lifespan_days"].astype("int64")
    hist["n_users"] = hist["n_users"].astype("int64")
    return hist.sort_values("lifespan_days").reset_index(drop=True)


QUERIES.update({
    "q_order_sizes": q_order_sizes,
    "q_user_lifespan": q_user_lifespan,
})
