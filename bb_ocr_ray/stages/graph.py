"""Graph operators over edge Datasets.

PageRank is the classic web-graph workload for a Common-Crawl-scale
engine (host-level link analysis).  The implementation is the standard
power iteration (Page et al., 1999 — public algorithm) expressed as
Ray Data passes: each iteration is ONE bucketed hash join (rank vector
x edge list) plus ONE coarse aggregate, so the edge list never lands
on the driver and no stage ever sees a per-node group (per-group tax —
see stages/coarse.py).

Variant notes (both sides of the oracle agree): teleport mass is
``(1 - damping) / |V|``; dangling-node mass is NOT redistributed (the
leaky formulation), so ranks sum to < 1 when sinks exist — fine for
ranking, simpler to mirror exactly in SQL.
"""

from __future__ import annotations

import pandas as pd


def _distinct_nodes(edges_ds, coarse_buckets: int):
    """Distinct node ids from (src, dst) — coarse in-task dedup."""
    from bb_ocr_ray.stages.joins import _TAG_BATCH

    def locals_(b: pd.DataFrame) -> pd.DataFrame:
        ids = pd.concat([b["src"], b["dst"]], ignore_index=True)
        out = pd.DataFrame({"node": ids.drop_duplicates()
                            .astype("int64").to_numpy()})
        out["_nb"] = (pd.util.hash_array(
            out["node"].to_numpy().astype("float64"), categorize=False)
            % coarse_buckets).astype("int64")
        return out

    return (edges_ds.map_batches(locals_, batch_format="pandas",
                                 batch_size=_TAG_BATCH)
            .groupby("_nb").map_groups(
                lambda g: g.drop_duplicates("node").drop(columns=["_nb"]),
                batch_format="pandas"))


def pagerank(edges_ds, iters: int = 10, damping: float = 0.85,
             coarse_buckets: int | None = None):
    """Power-iteration PageRank over an edge Dataset (src, dst) —
    int64 node ids, parallel edges allowed (they carry multiplicity).

    Returns a Dataset of (node, rank), one row per distinct node.

    Scale shape: out-degrees and the node set are coarse aggregates;
    the per-iteration rank vector is materialized (bounded: |V| rows —
    the iterative-algorithm exception to no-mid-pipeline-materialize,
    same argument as connected_components_ds) so iteration N+1 does
    not re-execute 1..N through lazy lineage.
    """
    from bb_ocr_ray.stages.coarse import coarse_agg
    from bb_ocr_ray.stages.joins import _auto_num_buckets, hash_join

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()

    # no select_columns here: Project ops crash on pandas blocks, and
    # synthesized edge Datasets arrive as pandas — the contract is the
    # caller passes exactly (src, dst)
    deg = coarse_agg(edges_ds, ["src"], {"outdeg": ("dst", "size")},
                     coarse_buckets=coarse_buckets)
    # (src, dst, outdeg): attach the degree once, reuse every iteration
    edges2 = hash_join(edges_ds, deg, on="src").materialize()
    nodes = _distinct_nodes(edges_ds, coarse_buckets).materialize()
    n_nodes = nodes.count()
    teleport = (1.0 - damping) / n_nodes

    def init(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": b["node"].astype("int64"),
                             "rank": 1.0 / n_nodes})

    # the rank vector is keyed "src" so each iteration's join needs no
    # rename shuffle-side
    ranks = nodes.map_batches(init, batch_format="pandas").materialize()

    def zero_rows(b: pd.DataFrame) -> pd.DataFrame:
        # guarantees in-link-less nodes survive the contribution sum
        return pd.DataFrame({"dst": b["node"].astype("int64"),
                             "m": 0.0})

    zeros = nodes.map_batches(zero_rows, batch_format="pandas").materialize()

    for _ in range(iters):
        joined = hash_join(edges2, ranks, on="src")

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "dst": b["dst"].astype("int64"),
                "m": damping * b["rank"].to_numpy()
                / b["outdeg"].to_numpy()})

        received = coarse_agg(
            joined.map_batches(contrib, batch_format="pandas").union(zeros),
            ["dst"], {"m": ("m", "sum")}, coarse_buckets=coarse_buckets)

        def next_rank(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"src": b["dst"].astype("int64"),
                                 "rank": teleport + b["m"].to_numpy()})

        ranks = received.map_batches(
            next_rank, batch_format="pandas").materialize()

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["src"].astype("int64"),
                             "rank": b["rank"].astype("float64")})

    return ranks.map_batches(finish, batch_format="pandas")
