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

import math

import numpy as np
import pandas as pd


def _distinct_nodes(edges_ds, coarse_buckets: int):
    """Distinct node ids from (src, dst) — coarse in-task dedup.
    No forced batch_size (fusion trap — see stages/coarse.py)."""

    def locals_(b: pd.DataFrame) -> pd.DataFrame:
        ids = pd.concat([b["src"], b["dst"]], ignore_index=True)
        out = pd.DataFrame({"node": ids.drop_duplicates()
                            .astype("int64").to_numpy()})
        out["_nb"] = (pd.util.hash_array(
            out["node"].to_numpy().astype("float64"), categorize=False)
            % coarse_buckets).astype("int64")
        return out

    return (edges_ds.map_batches(locals_, batch_format="pandas")
            .groupby("_nb").map_groups(
                lambda g: g.drop_duplicates("node").drop(columns=["_nb"]),
                batch_format="pandas"))


def pagerank(edges_ds, iters: int = 10, damping: float = 0.85,
             coarse_buckets: int | None = None,
             tol: float | None = None, stats: dict | None = None,
             check_every: int | None = None,
             rank_broadcast_limit: int | None = None,
             _on_choice=None):
    """Power-iteration PageRank over an edge Dataset (src, dst) —
    int64 node ids, parallel edges allowed (they carry multiplicity).

    Returns a Dataset of (node, rank), one row per distinct node.

    Scale shape: out-degrees and the node set are coarse aggregates;
    the per-iteration rank vector is materialized (bounded: |V| rows —
    the iterative-algorithm exception to no-mid-pipeline-materialize,
    same argument as connected_components_ds) so iteration N+1 does
    not re-execute 1..N through lazy lineage.

    Convergence early-exit: on probe iterations the old and new rank
    vectors (both materialized, |V| rows — never the edge list) pair
    through one small hash join and the per-block |Δ| maxima stream to
    the driver (block-count rows).  Carrying the old rank through the
    per-EDGE contribution shuffle instead was measured 2.5 s slower
    at sf0.1: it adds a column to |E| rows and doubles the combiner
    work every iteration, vs a |V|-row join only when probing.  With
    ``tol=None`` (the oracle contract) iteration stops early ONLY on
    exact convergence — max |Δrank| == 0.0, after which every further
    iteration is bitwise a no-op, so the result still equals the full
    ``iters`` unrolled-SQL oracle; exact convergence takes O(hundreds)
    of iterations, so the probe runs every ``check_every`` (default 8)
    rounds.  With a positive ``tol`` (real-use mode) it stops once
    max |Δrank| <= tol (probed every round by default); the remaining
    drift vs the fixed-iteration result is bounded by
    ``tol*damping/(1-damping)``.  The last iteration never probes —
    breaking there saves nothing.

    Per-iteration join shape is SIZE-GATED on the rank vector
    (VERDICT r4 item 6): the |V|-row rank vector's real byte size is
    known after init, so when it fits ``rank_broadcast_limit`` a
    round is ONE shuffle-free map over the static, materialized edge
    list — fresh ranks broadcast via ``ray.put``, each task emits
    per-batch PARTIAL (dst, m) sums, and the driver folds the
    partials (bounded by blocks × |V|, both gate-bounded; the vector
    was coming to the driver for the broadcast anyway).  No
    all-to-all at all per round — the vocabulary-shuffle finding
    applied to the rank vector.  The convergence probe is one aligned
    numpy subtract.  A web-scale |V| (10^10 nodes ≈ 160 GB of rank
    vector) fails the gate and takes the original hash-join +
    coarse-fold path, where both sides shuffle.  ``_on_choice``
    (tests) receives "broadcast" or "hash" once.
    """
    from bb_ocr_ray.stages.coarse import coarse_agg
    from bb_ocr_ray.stages.joins import (_BROADCAST_LIMIT_BYTES,
                                         _auto_num_buckets,
                                         broadcast_join, hash_join)

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()

    # no select_columns here: Project ops crash on pandas blocks, and
    # synthesized edge Datasets arrive as pandas — the contract is the
    # caller passes exactly (src, dst)
    nodes = _distinct_nodes(edges_ds, coarse_buckets).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        # guard FIRST: an empty Dataset has no schema and the join
        # below would raise before any division by zero
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            "node": pd.array([], dtype="int64"),
            "rank": pd.array([], dtype="float64")}))
    # size the one-time setup shuffles from the graph too (the node
    # count is already known here)
    setup_buckets = max(8, min(coarse_buckets, n_nodes // 100_000 + 8))
    deg = coarse_agg(edges_ds, ["src"], {"outdeg": ("dst", "size")},
                     coarse_buckets=setup_buckets)
    # (src, dst, outdeg): attach the degree once, reuse every iteration
    edges2 = hash_join(edges_ds, deg, on="src",
                       num_buckets=setup_buckets).materialize()
    n_edges = edges2.count()
    # (no edge-list coalesce here: hash_join already sized its output
    # by setup_buckets, which scales with the graph — re-blocking was
    # measured a wash at sf0.1, unlike `hits` whose edge list inherits
    # the 64-fragment read layout)
    # per-iteration shuffle width scales with the GRAPH, not the
    # cluster ceiling: 10 iterations x 64-bucket sorts on a 5k-row
    # rank vector is pure scheduling overhead (measured 7-16 s at
    # sf0.1); at web scale the data term dominates and this equals
    # the cluster-sized count
    iter_buckets = max(8, min(coarse_buckets,
                              (n_nodes + n_edges) // 250_000 + 8))
    teleport = (1.0 - damping) / n_nodes

    # bound the rank-vector block count: the setup's coarse shuffles
    # leave ~bucket-count tiny blocks, and every iteration would drag
    # them (plus as many zero blocks) through the join and the union —
    # measured ~1-1.5 s/iteration of pure per-block overhead at 5k
    # nodes.  One block per 500k nodes keeps blocks worker-sized at
    # web scale and single-digit at test scale.
    rank_blocks = max(1, -(-n_nodes // 500_000))
    nodes = nodes.repartition(rank_blocks).materialize()

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

    if check_every is None:
        check_every = 1 if tol is not None else 8

    # the rank vector's size is FIXED across iterations (one row per
    # node), and `ranks` is materialized — gate once on real bytes
    limit = (_BROADCAST_LIMIT_BYTES if rank_broadcast_limit is None
             else rank_broadcast_limit)
    use_bcast = ranks.size_bytes() <= limit
    if _on_choice is not None:
        _on_choice("broadcast" if use_bcast else "hash")
    ranks_pd = ranks.to_pandas() if use_bcast else None

    # broadcast path: the per-round all-to-all is pure fixed overhead
    # for a gate-bounded vector (the vocabulary-shuffle finding), so
    # the round becomes ONE map over the static edges emitting
    # per-batch PARTIAL (dst, m) sums, folded on the driver.  Partial
    # traffic is bounded by blocks x |V| — both gate-bounded — and
    # the vector was coming to the driver for the broadcast anyway.
    nodes_idx = None
    if use_bcast:
        nodes_idx = np.sort(ranks_pd["src"].to_numpy(np.int64))

    iters_run, last_delta = 0, float("inf")
    for it in range(iters):
        if use_bcast:
            joined = broadcast_join(edges2, ranks_pd, on="src")

            def contrib_partial(b: pd.DataFrame) -> pd.DataFrame:
                m = (damping * b["rank"].to_numpy()
                     / b["outdeg"].to_numpy())
                g = (pd.DataFrame({"dst": b["dst"].astype("int64"), "m": m})
                     .groupby("dst", as_index=False)["m"].sum())
                return g

            parts = joined.map_batches(contrib_partial,
                                       batch_format="pandas").to_pandas()
            m = parts.groupby("dst")["m"].sum()
            # every node gets teleport; in-link-less nodes get 0 mass
            mass = (m.reindex(nodes_idx).fillna(0.0)
                    .to_numpy(np.float64))
            prev_pd, ranks_pd = ranks_pd, pd.DataFrame(
                {"src": nodes_idx, "rank": teleport + mass})
            iters_run += 1
            if (it + 1) % check_every == 0 and it < iters - 1:
                # both vectors are already driver-sized by the gate
                # and share nodes_idx order: the probe is one subtract
                old = (prev_pd.set_index("src")["rank"]
                       .reindex(nodes_idx).to_numpy(np.float64))
                max_delta = float(np.abs(
                    ranks_pd["rank"].to_numpy(np.float64) - old).max()
                    ) if len(nodes_idx) else 0.0
                last_delta = max_delta
                if (max_delta == 0.0
                        or (tol is not None and max_delta <= tol)):
                    break
            continue

        joined = hash_join(edges2, ranks, on="src",
                           num_buckets=iter_buckets)

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "dst": b["dst"].astype("int64"),
                "m": damping * b["rank"].to_numpy()
                / b["outdeg"].to_numpy()})

        received = coarse_agg(
            joined.map_batches(contrib, batch_format="pandas").union(zeros),
            ["dst"], {"m": ("m", "sum")}, coarse_buckets=iter_buckets)

        def next_rank(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"src": b["dst"].astype("int64"),
                                 "rank": teleport + b["m"].to_numpy()})

        prev = ranks
        ranks = received.map_batches(
            next_rank, batch_format="pandas").materialize()
        iters_run += 1
        probe = (it + 1) % check_every == 0 and it < iters - 1
        if probe:
            # probe: pair old/new (|V|-row vectors) with one small
            # join, stream per-block |Δ| maxima to the driver
            old_r = prev.map_batches(
                lambda b: pd.DataFrame({"src": b["src"],
                                        "old": b["rank"]}),
                batch_format="pandas")
            paired = hash_join(ranks, old_r, on="src",
                               num_buckets=iter_buckets)
            max_delta = float(paired.map_batches(
                lambda b: pd.DataFrame({"d": [float(np.abs(
                    b["rank"].to_numpy() - b["old"].to_numpy()).max())]}
                    if len(b) else {"d": [0.0]}),
                batch_format="pandas").to_pandas()["d"].max())
            last_delta = max_delta
            if max_delta == 0.0 or (tol is not None and max_delta <= tol):
                break

    if stats is not None:
        stats.update({"iters_run": iters_run, "max_delta": last_delta})

    if use_bcast:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"node": ranks_pd["src"].astype("int64").to_numpy(),
             "rank": ranks_pd["rank"].astype("float64").to_numpy()}))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["src"].astype("int64"),
                             "rank": b["rank"].astype("float64")})

    return ranks.map_batches(finish, batch_format="pandas")


def pagerank_static(edges_ds, iters: int = 10, damping: float = 0.85,
                    n_shards: int | None = None):
    """PageRank with ACTOR-RESIDENT edge partitions — the iteration
    optimization :func:`pagerank` documents: the edge list is static
    across rounds, so re-shuffling it every iteration (what any
    pure-Dataset join must do) wastes the dominant byte volume.  Here
    the edges hash-partition ONCE into ``n_shards`` bucket actors
    (src-keyed, with out-degree attached), and each round only the
    RANK VECTOR moves: rank rows shuffle to their bucket, the in-task
    UDF calls its shard actor, the actor joins locally and returns
    per-dst partial contributions.  This is the documented
    raw-actor exception (a shared static index the Dataset API would
    otherwise re-ship per round).

    Differentially tested equal to :func:`pagerank`; same leaky
    formulation.  Partitioning assumption: one bucket's edges fit one
    actor's heap.

    MEASURED VERDICT (2 M edges / 200k nodes / 5 iters, 32 cpus): the
    pure-Dataset :func:`pagerank` wins on one box — 14.0 s vs 58.5 s
    (16 shards; MORE shards are worse: 89 s at 64, 147 s at 128, as
    every blocked in-task ``ray.get`` parks a worker process and the
    actor round-trips pay object-store serialization both ways).  On
    shared memory the per-round edge "re-ship" is a memcpy, so the
    join path's extra bytes are cheap and its task parallelism wins.
    The resident-edge design only pays off where re-shipping crosses a
    NIC (real multi-node) AND edges >> rank vector; keep it as the
    documented alternative, default to :func:`pagerank`.
    """
    import ray

    from bb_ocr_ray.stages.coarse import _bucket_ids, coarse_agg
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    if n_shards is None:
        # one resident shard per reducer slot (edges ~ heap-bound)
        n_shards = max(8, _auto_num_buckets() // 4)

    @ray.remote
    class EdgeShard:
        def __init__(self):
            self.edges = None  # (src, dst, outdeg) for this bucket

        def ingest(self, edges_pd: pd.DataFrame) -> int:
            self.edges = edges_pd
            return len(edges_pd)

        def contribute(self, ranks_pd: pd.DataFrame,
                       damp: float) -> pd.DataFrame:
            if self.edges is None:
                # a bucket can hold rank rows (dst-only nodes hash
                # here) yet no edges — nothing to contribute
                return pd.DataFrame({"dst": pd.array([], dtype="int64"),
                                     "m": pd.array([], dtype="float64")})
            m = self.edges.merge(ranks_pd, on="src", how="inner")
            out = pd.DataFrame({
                "dst": m["dst"].to_numpy(),
                "m": damp * m["rank"].to_numpy() / m["outdeg"].to_numpy()})
            # per-dst partial sum before leaving the actor (combiner)
            return out.groupby("dst", as_index=False)["m"].sum()

    nodes = _distinct_nodes(edges_ds, _auto_num_buckets()).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            "node": pd.array([], dtype="int64"),
            "rank": pd.array([], dtype="float64")}))

    deg = coarse_agg(edges_ds, ["src"], {"outdeg": ("dst", "size")})

    def stamp_edges(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_sb"] = _bucket_ids(b, ["src"], n_shards)
        return b

    from bb_ocr_ray.stages.joins import hash_join

    edges2 = hash_join(edges_ds, deg, on="src")
    shards = [EdgeShard.remote() for _ in range(n_shards)]

    def load_shard(g: pd.DataFrame) -> pd.DataFrame:
        sid = int(g["_sb"].iloc[0])
        n = ray.get(shards[sid].ingest.remote(
            g.drop(columns=["_sb"]).reset_index(drop=True)))
        return pd.DataFrame({"shard": [sid], "n_edges": [n]})

    # .to_pandas() forces the load; the returned ledger is shard
    # row counts (differential test pins that nothing is lost —
    # an inline count() here would re-execute a lazy edge pipeline)
    (edges2.map_batches(stamp_edges, batch_format="pandas")
     .groupby("_sb").map_groups(load_shard, batch_format="pandas")
     .to_pandas())

    teleport = (1.0 - damping) / n_nodes

    ranks = nodes.map_batches(
        lambda b: pd.DataFrame({"src": b["node"].astype("int64"),
                                "rank": 1.0 / n_nodes}),
        batch_format="pandas").materialize()

    zeros = nodes.map_batches(
        lambda b: pd.DataFrame({"dst": b["node"].astype("int64"),
                                "m": 0.0}),
        batch_format="pandas").materialize()

    def stamp_ranks(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_sb"] = _bucket_ids(b, ["src"], n_shards)
        return b

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        sid = int(g["_sb"].iloc[0])
        return ray.get(shards[sid].contribute.remote(
            g.drop(columns=["_sb"]).reset_index(drop=True), damping))

    for _ in range(iters):
        received = (ranks.map_batches(stamp_ranks, batch_format="pandas")
                    .groupby("_sb")
                    .map_groups(probe, batch_format="pandas"))
        summed = coarse_agg(received.union(zeros), ["dst"],
                            {"m": ("m", "sum")})
        ranks = summed.map_batches(
            lambda b: pd.DataFrame({
                "src": b["dst"].astype("int64"),
                "rank": teleport + b["m"].to_numpy()}),
            batch_format="pandas").materialize()

    return ranks.map_batches(
        lambda b: pd.DataFrame({"node": b["src"].astype("int64"),
                                "rank": b["rank"].astype("float64")}),
        batch_format="pandas")


def triangle_count(edges_ds, coarse_buckets: int | None = None,
                   degree_broadcast_limit: int | None = None):
    """Distributed triangle enumeration with DEGREE orientation — the
    celebrity-node-safe variant of the wedge-closure method (Suri &
    Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW 2011; public algorithm).

    Input: (src, dst) int64 edge Dataset, read as UNDIRECTED; parallel
    edges, reversed duplicates, and self-loops are normalized away by
    a distributed first-per-pair fold.  Output: one row per triangle
    (a, b, c), a < b < c by plain id — each triangle exactly once.

    Why degree orientation: a plain id orientation enumerates, for
    every node, all pairs of its HIGHER-ID neighbors — a hub with 10^6
    neighbors contributes ~5·10^11 wedges to one task (the "last
    reducer").  Directing every edge from lower to higher (degree, id)
    caps each node's OUT-degree at O(sqrt(|E|)), so wedge volume is
    O(|E|^1.5) worst case and no single task owns a hub's neighbor
    square.  The hub's wedges simply do not exist: its edges all point
    INTO it.

    Plan (all existing primitives, nothing on the driver):
      degrees = coarse fold over both endpoints (materialized once —
                it feeds BOTH endpoint attachments);
      orient  = size-gated like ``auto_join``: the degree table is
                |V|-bounded, so when its (materialized, hence real)
                byte size fits ``degree_broadcast_limit`` it ships as
                one sorted-array ``ray.put`` and both endpoint degrees
                attach in a single searchsorted map — no shuffle; a
                web-scale |V| routes to the two hash joins instead;
      wedges  = self hash-join of oriented edges on their source;
      close   = hash semi-join of packed (lo<<32 | hi) wedge ends
                against packed oriented edges.
    """
    import ray.data as rd

    from bb_ocr_ray.stages.coarse import coarse_agg
    from bb_ocr_ray.stages.dedup import dedup_pairs
    from bb_ocr_ray.stages.joins import (_auto_num_buckets, hash_join,
                                         semi_join_hash)

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        u = b["src"].to_numpy(np.int64)
        v = b["dst"].to_numpy(np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        return pd.DataFrame({"id_a": np.minimum(u, v),
                             "id_b": np.maximum(u, v)})

    # und feeds BOTH the degree fold and the orientation; without a
    # materialize each consumer re-runs the dedup_pairs shuffle.  It is
    # the algorithm's own normalized edge set — data-bounded, the
    # connected_components_ds precedent.
    und = dedup_pairs(
        edges_ds.map_batches(norm, batch_format="pandas")).materialize()

    def both_ends(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [b["id_a"].to_numpy(np.int64), b["id_b"].to_numpy(np.int64)]),
            "one": np.int64(1)})

    # The degree table is consumed by BOTH endpoint attachments, so
    # materialize it once; it is |V|-row — the algorithm's own working
    # set, never the corpus.  Materialized metadata is real, so the
    # broadcast gate below reads actual bytes, not a lazy estimate
    # (estimate_size_bytes returns 0 for computed datasets).
    deg = coarse_agg(und.map_batches(both_ends, batch_format="pandas"),
                     ["node"], {"deg": ("one", "sum")},
                     coarse_buckets=coarse_buckets).materialize()

    from bb_ocr_ray.stages.joins import _BROADCAST_LIMIT_BYTES
    limit = (_BROADCAST_LIMIT_BYTES if degree_broadcast_limit is None
             else degree_broadcast_limit)

    if deg.size_bytes() <= limit:
        # Driver-sized |V|: ship the degree table once as two sorted
        # arrays and orient every edge in ONE map — saves two all-to-all
        # joins.  Every endpoint is in the table by construction (deg
        # was folded from these very edges), so searchsorted is total.
        import ray

        deg_pdf = deg.to_pandas()
        order = np.argsort(deg_pdf["node"].to_numpy(np.int64))
        nodes_sorted = deg_pdf["node"].to_numpy(np.int64)[order]
        degs_sorted = deg_pdf["deg"].to_numpy(np.int64)[order]
        ref = ray.put((nodes_sorted, degs_sorted))

        def orient_bcast(b: pd.DataFrame) -> pd.DataFrame:
            nodes, degs = ray.get(ref)
            na = b["id_a"].to_numpy(np.int64)
            nb = b["id_b"].to_numpy(np.int64)
            da = degs[np.searchsorted(nodes, na)]
            db = degs[np.searchsorted(nodes, nb)]
            a_first = (da < db) | ((da == db) & (na < nb))
            return pd.DataFrame({
                "s": np.where(a_first, na, nb),
                "t": np.where(a_first, nb, na),
                "dt": np.where(a_first, db, da)})

        # No materialize here: orientation from materialized `und` is
        # one shuffle-free searchsorted map, cheap for each of the
        # three downstream consumers to re-run.
        oe = und.map_batches(orient_bcast, batch_format="pandas")
    else:
        e1 = hash_join(
            und.map_batches(lambda b: b.rename(columns={"id_a": "node"}),
                            batch_format="pandas"), deg, on="node")
        e2 = hash_join(
            e1.map_batches(
                lambda b: pd.DataFrame({"na": b["node"].astype("int64"),
                                        "da": b["deg"].astype("int64"),
                                        "node": b["id_b"].astype("int64")}),
                batch_format="pandas"), deg, on="node")

        def orient(b: pd.DataFrame) -> pd.DataFrame:
            na = b["na"].to_numpy(np.int64)
            nb = b["node"].to_numpy(np.int64)
            da = b["da"].to_numpy(np.int64)
            db = b["deg"].to_numpy(np.int64)
            a_first = (da < db) | ((da == db) & (na < nb))
            return pd.DataFrame({
                "s": np.where(a_first, na, nb),
                "t": np.where(a_first, nb, na),
                "dt": np.where(a_first, db, da)})

        # Here oe's lineage holds two hash joins, too expensive for the
        # three consumers (both wedge sides + closure edge set) to
        # re-run — materialize the oriented edge list (data-bounded).
        oe = e2.map_batches(orient, batch_format="pandas").materialize()

    w1 = oe.map_batches(
        lambda b: pd.DataFrame({"s": b["s"].astype("int64"),
                                "p": b["t"].astype("int64"),
                                "dp": b["dt"].astype("int64")}),
        batch_format="pandas")
    w2 = oe.map_batches(
        lambda b: pd.DataFrame({"s": b["s"].astype("int64"),
                                "q": b["t"].astype("int64"),
                                "dq": b["dt"].astype("int64")}),
        batch_format="pandas")
    wedges = hash_join(w1, w2, on="s")

    def half(b: pd.DataFrame) -> pd.DataFrame:
        # keep one ordered copy per wedge, ordered by the SAME total
        # order the edges are oriented in, so the closing edge is
        # guaranteed to run lo -> hi under that order
        dp = b["dp"].to_numpy(np.int64)
        dq = b["dq"].to_numpy(np.int64)
        p = b["p"].to_numpy(np.int64)
        q = b["q"].to_numpy(np.int64)
        keep = (dp < dq) | ((dp == dq) & (p < q))
        b = b[keep]
        return pd.DataFrame({
            "src_node": b["s"].astype("int64"),
            "k": (b["p"].astype("int64") * (1 << 32)
                  + b["q"].astype("int64"))})

    packed_edges = oe.map_batches(
        lambda b: pd.DataFrame({"k": (b["s"].astype("int64") * (1 << 32)
                                      + b["t"].astype("int64"))}),
        batch_format="pandas")
    tri = semi_join_hash(wedges.map_batches(half, batch_format="pandas"),
                         packed_edges, on="k")

    def unpack(b: pd.DataFrame) -> pd.DataFrame:
        k = b["k"].to_numpy(np.int64)
        x = b["src_node"].to_numpy(np.int64)
        y = k >> 32
        z = k & ((1 << 32) - 1)
        arr = np.sort(np.stack([x, y, z], axis=1), axis=1)
        return pd.DataFrame({"a": arr[:, 0], "b": arr[:, 1],
                             "c": arr[:, 2]})

    return tri.map_batches(unpack, batch_format="pandas")


def hits(edges_ds, iters: int = 5, coarse_buckets: int | None = None,
         vec_broadcast_limit: int | None = None, _on_choice=None):
    """HITS hubs & authorities (Kleinberg 1999, public algorithm) over
    an edge Dataset (src, dst) — int64 node ids, parallel edges carry
    multiplicity.  Returns a Dataset of (node, authority, hub).

    Update order is the classic sequential sweep, mirrored exactly by
    the unrolled SQL oracle: a_i = L2-normalize(Σ_{s→n} h_{i-1}(s)),
    then h_i = L2-normalize(Σ_{n→t} a_i(t)) — the hub update reads the
    JUST-normalized authorities.  Nodes with no in-edges (out-edges)
    hold authority (hub) 0 through every round.

    Scale shape (the pagerank posture): the |V|-row score vectors are
    re-materialized every half-round, so their REAL byte size gates
    the join shape once — below ``vec_broadcast_limit`` the static
    edge list never shuffles (fresh vector via ``ray.put``, zero-copy
    map attach, one coarse fold per half-round; the L2 norm is driver
    arithmetic on the gate-bounded vector).  Above the gate both
    sides hash-join and the norm folds from per-block partial sums of
    squares (block-count rows to the driver).  ``_on_choice`` (tests)
    receives "broadcast" or "hash" once.
    """
    import ray

    from bb_ocr_ray.stages.coarse import coarse_agg
    from bb_ocr_ray.stages.joins import (_BROADCAST_LIMIT_BYTES,
                                         _auto_num_buckets,
                                         broadcast_join, hash_join)

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()
    limit = (_BROADCAST_LIMIT_BYTES if vec_broadcast_limit is None
             else vec_broadcast_limit)

    nodes = _distinct_nodes(edges_ds, coarse_buckets).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame({
            "node": pd.array([], dtype="int64"),
            "authority": pd.array([], dtype="float64"),
            "hub": pd.array([], dtype="float64")}))
    edges2 = edges_ds.map_batches(
        lambda b: pd.DataFrame({"src": b["src"].astype("int64"),
                                "dst": b["dst"].astype("int64")}),
        batch_format="pandas").materialize()
    n_edges = edges2.count()
    # the static edge list inherits the INPUT's block count (64 read
    # fragments at test scale for 15k edges), and every half-round maps
    # over it — coalesce to a size-appropriate count once so the
    # per-round task fan matches the data, not the read layout
    # (measured 0.46 s/half-round at 64 blocks vs ~0.1 s coalesced; at
    # web scale n_edges//250_000 dominates and this is a no-op)
    edge_blocks = max(1, min(edges2.num_blocks(), n_edges // 250_000 + 1))
    if edges2.num_blocks() > edge_blocks * 2:
        edges2 = edges2.repartition(edge_blocks).materialize()
    iter_buckets = max(8, min(coarse_buckets,
                              (n_nodes + n_edges) // 250_000 + 8))
    rank_blocks = max(1, -(-n_nodes // 500_000))
    nodes = nodes.repartition(rank_blocks).materialize()

    hvec = nodes.map_batches(
        lambda b: pd.DataFrame({"node": b["node"].astype("int64"),
                                "v": 1.0}),
        batch_format="pandas").materialize()
    use_bcast = hvec.size_bytes() * 2 <= limit
    if _on_choice is not None:
        _on_choice("broadcast" if use_bcast else "hash")

    zeros = nodes.map_batches(
        lambda b: pd.DataFrame({"node": b["node"].astype("int64"),
                                "v": 0.0}),
        batch_format="pandas").materialize()

    nodes_idx = (np.sort(zeros.to_pandas()["node"].to_numpy(np.int64))
                 if use_bcast else None)

    def _neighbor_sum(vec, key_from: str, key_to: str):
        """Σ over edges (key_from → key_to) of vec(key_from), as a
        normalized |V|-row vector (every node present).

        Broadcast path: ONE shuffle-free map over the static edges
        emitting per-batch PARTIAL (node, v) sums, folded and
        L2-normalized on the driver (the pagerank driver-fold shape —
        partial traffic bounded by blocks × |V|, both gate-bounded).
        Hash path: distributed join + coarse fold + per-block partial
        sums of squares for the norm."""
        if use_bcast:
            vpd = vec if isinstance(vec, pd.DataFrame) else vec.to_pandas()
            joined = broadcast_join(
                edges2, vpd.rename(columns={"node": key_from}),
                on=key_from)

            def partial(b: pd.DataFrame) -> pd.DataFrame:
                return (pd.DataFrame(
                    {"node": b[key_to].astype("int64"),
                     "v": b["v"].astype("float64")})
                    .groupby("node", as_index=False)["v"].sum())

            parts = joined.map_batches(partial,
                                       batch_format="pandas").to_pandas()
            s = parts.groupby("node")["v"].sum()
            vals = s.reindex(nodes_idx).fillna(0.0).to_numpy(np.float64)
            nrm = float(np.sqrt((vals ** 2).sum()))
            if nrm > 0:
                vals = vals / nrm
            return pd.DataFrame({"node": nodes_idx, "v": vals})

        joined = hash_join(
            edges2,
            vec.map_batches(
                lambda b: pd.DataFrame(
                    {key_from: b["node"].astype("int64"),
                     "v": b["v"]}),
                batch_format="pandas"),
            on=key_from, num_buckets=iter_buckets)
        summed = coarse_agg(
            joined.map_batches(
                lambda b: pd.DataFrame(
                    {"node": b[key_to].astype("int64"),
                     "v": b["v"].astype("float64")}),
                batch_format="pandas").union(zeros),
            ["node"], {"v": ("v", "sum")}, coarse_buckets=iter_buckets)
        mat = summed.materialize()
        parts = mat.map_batches(
            lambda b: pd.DataFrame(
                {"ss": [float((b["v"].to_numpy(np.float64) ** 2).sum())]}),
            batch_format="pandas").to_pandas()
        nrm = float(np.sqrt(parts["ss"].sum()))
        if nrm == 0:
            return mat
        return mat.map_batches(
            lambda b, nrm=nrm: pd.DataFrame(
                {"node": b["node"].astype("int64"),
                 "v": b["v"].to_numpy(np.float64) / nrm}),
            batch_format="pandas").materialize()

    avec = None
    for _ in range(iters):
        avec = _neighbor_sum(hvec, "src", "dst")     # authorities
        hvec = _neighbor_sum(avec, "dst", "src")     # hubs (new a)

    apd = avec if isinstance(avec, pd.DataFrame) else avec.to_pandas()
    hpd = hvec if isinstance(hvec, pd.DataFrame) else hvec.to_pandas()
    out = (apd.rename(columns={"v": "authority"})
           .merge(hpd.rename(columns={"v": "hub"}), on="node"))
    out["node"] = out["node"].astype("int64")
    import ray.data as rd

    return rd.from_pandas(
        out[["node", "authority", "hub"]]
        .sort_values("node").reset_index(drop=True))


def kcore(edges_ds, k: int = 3, rounds: int | None = None,
          coarse_buckets: int | None = None,
          broadcast_limit: int | None = None, _on_choice=None):
    """k-core peel over an undirected edge Dataset (src, dst) — the
    spam/link-farm density filter of web-graph cleaning (Seidman 1983;
    synchronous peeling a la Montresor et al.).  Each round computes
    every node's degree in the surviving subgraph and deletes nodes
    with degree < k together with their edges.  ``rounds=None``
    iterates to the fixpoint (detected by the surviving edge count —
    a metadata read on the materialized round result, never a
    collect); a fixed ``rounds`` runs exactly that many synchronous
    peels, which is the SQL-unrollable contract q_kcore couples to.
    (Peeling is monotone — once no node falls below the bar the
    subgraph is a fixpoint — so early-exit under a fixed ``rounds``
    returns the identical answer.)

    Returns (node, deg): nodes still meeting the bar after the final
    round, with their degree in the final surviving subgraph.

    Size gate (the pagerank/HITS round posture): round 1's degree
    table is |V|-bounded and materialized anyway, so its REAL byte
    size gates the loop shape.  Below ``broadcast_limit`` every later
    round is ONE map over the STATIC edge list — the survivor set
    ships via ray.put, each batch emits a partial (node, deg) count
    of edges whose endpoints both survive, and the driver folds the
    gate-bounded partials (traffic ≤ blocks × |surviving V|, and the
    vector was driver-sized by the gate anyway).  No per-round
    shuffle, no per-round edge materialization.  Above the gate the
    distributed shape survives: per round ONE coarse degree fold plus
    two size-gated semi-joins (auto_semi), edges re-materialized each
    round so round N+1 never re-executes 1..N through lazy lineage
    (the connected-components argument).  Edges must be canonical
    single-direction rows; parallel edges would double-count degree
    (callers dedup first).  ``_on_choice`` (tests) receives
    "broadcast" or "hash" at gate time.
    """
    from bb_ocr_ray.stages.coarse import coarse_agg
    from bb_ocr_ray.stages.joins import (_BROADCAST_LIMIT_BYTES,
                                         _auto_num_buckets, auto_semi)

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": pd.concat(
            [b["src"], b["dst"]], ignore_index=True).astype("int64")})

    def degrees(e):
        return coarse_agg(
            e.map_batches(endpoints, batch_format="pandas"),
            ["node"], {"deg": ("node", "size")},
            coarse_buckets=coarse_buckets)

    def meets_bar(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["deg"] >= k]

    def _empty():
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame(
            {"node": pd.Series(dtype="int64"),
             "deg": pd.Series(dtype="int64")}))

    edges = edges_ds.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return _empty()

    # peel 1's degree fold runs distributed either way; its |V|-row
    # output gates the loop shape on real bytes
    deg1 = degrees(edges).materialize()
    limit = (_BROADCAST_LIMIT_BYTES if broadcast_limit is None
             else broadcast_limit)
    use_bcast = deg1.size_bytes() <= limit
    if _on_choice is not None:
        _on_choice("broadcast" if use_bcast else "hash")

    if use_bcast:
        import ray

        def fold(surv_sorted: np.ndarray) -> pd.DataFrame:
            """Degree table of the subgraph induced by surv_sorted:
            one map over the static edges, partials driver-folded."""
            ref = ray.put(surv_sorted)

            def part(b: pd.DataFrame) -> pd.DataFrame:
                s = ray.get(ref)
                src = b["src"].to_numpy(np.int64)
                dst = b["dst"].to_numpy(np.int64)
                m = np.isin(src, s) & np.isin(dst, s)
                ends = np.concatenate([src[m], dst[m]])
                u, c = np.unique(ends, return_counts=True)
                return pd.DataFrame({"node": u, "deg": c})

            parts = edges.map_batches(
                part, batch_format="pandas").to_pandas()
            return parts.groupby("node", as_index=False)["deg"].sum()

        cur = deg1.to_pandas()          # deg over induced(S_{r-1})
        cur["node"] = cur["node"].astype("int64")
        r = 1
        while True:
            surv = cur[cur["deg"] >= k]
            if len(surv) == 0:
                return _empty()
            if len(surv) == len(cur):
                # every node in the current subgraph meets the bar:
                # fixpoint — cur IS the final degree table
                import ray.data as rd
                return rd.from_pandas(
                    surv.reset_index(drop=True).astype(
                        {"node": "int64", "deg": "int64"}))
            surv_nodes = np.sort(surv["node"].to_numpy(np.int64))
            if rounds is not None and r >= rounds:
                # rounds exhausted: one output fold over induced(S_R)
                final = fold(surv_nodes)
                final = final[final["deg"] >= k]
                import ray.data as rd
                return rd.from_pandas(
                    final.reset_index(drop=True).astype(
                        {"node": "int64", "deg": "int64"}))
            cur = fold(surv_nodes)      # peel r+1's degree table
            if len(cur) == 0:
                return _empty()
            r += 1

    r = 0
    while n_edges and (rounds is None or r < rounds):
        surv = degrees(edges).map_batches(
            meets_bar, batch_format="pandas").materialize()
        if surv.count() == 0:
            # the whole graph peeled away: an empty Dataset carries no
            # schema, which the joins below can't consume
            return _empty()
        e = auto_semi(
            edges.map_batches(lambda b: b.rename(columns={"src": "node"}),
                              batch_format="pandas"),
            surv, on="node", broadcast_limit=broadcast_limit,
        ).map_batches(lambda b: b.rename(columns={"node": "src"}),
                      batch_format="pandas")
        e = auto_semi(
            e.map_batches(lambda b: b.rename(columns={"dst": "node"}),
                          batch_format="pandas"),
            surv, on="node", broadcast_limit=broadcast_limit,
        ).map_batches(lambda b: b.rename(columns={"node": "dst"}),
                      batch_format="pandas")
        edges = e.materialize()
        n_now = edges.count()
        r += 1
        if rounds is None and n_now == n_edges:
            break
        n_edges = n_now

    if edges.count() == 0:
        return _empty()
    return degrees(edges).map_batches(meets_bar, batch_format="pandas")


def assortativity(edges_ds, coarse_buckets: int | None = None,
                  deg_broadcast_limit: int | None = None,
                  _on_choice=None):
    """Newman degree assortativity of an edge Dataset (src, dst):
    Pearson correlation of endpoint degrees over the symmetrized edge
    ends — the celebrity-vs-mesh structure probe of web-graph QA
    (Newman 2002, "Assortative mixing in networks").  Parallel edges
    and self-loops count with multiplicity, matching plain degree
    counting on the raw edge rows.

    Shape: one coarse degree fold (|V|-bounded), then the |V|-row
    degree table gates on REAL bytes — below the limit it broadcasts
    via ray.put and each edge batch attaches both endpoint degrees by
    searchsorted lookup; above, two bucketed hash joins attach them.
    Either way every batch collapses to ONE partial-moment row
    (n, Sx, Sy, Sxy, Sxx, Syy — int64-exact within a batch, Python-int
    exact in the driver fold, so the correlation is bit-stable against
    an exact-integer SQL oracle at any sum magnitude).  Driver traffic
    = 6 integers per block.  Returns (n_ends, assortativity) —
    UNROUNDED; callers round to their grain.
    """
    from bb_ocr_ray.stages.coarse import coarse_agg
    from bb_ocr_ray.stages.joins import (_BROADCAST_LIMIT_BYTES,
                                         _auto_num_buckets, hash_join)

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()

    def endpoints(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": pd.concat(
            [b["src"], b["dst"]], ignore_index=True).astype("int64")})

    edges = edges_ds.materialize()
    deg = coarse_agg(
        edges.map_batches(endpoints, batch_format="pandas"),
        ["node"], {"d": ("node", "size")},
        coarse_buckets=coarse_buckets).materialize()

    limit = (_BROADCAST_LIMIT_BYTES if deg_broadcast_limit is None
             else deg_broadcast_limit)
    use_bcast = deg.size_bytes() <= limit
    if _on_choice is not None:
        _on_choice("broadcast" if use_bcast else "hash")

    def moments(x: np.ndarray, y: np.ndarray) -> pd.DataFrame:
        # symmetrize: every edge contributes (x,y) AND (y,x).  In-batch
        # sums stay int64-exact while deg^2 x batch_rows < 2^63 (deg up
        # to ~1e6 at 64k-row batches) — beyond that, shrink batches.
        sall = int(x.sum()) + int(y.sum())
        sq = int((x * x).sum()) + int((y * y).sum())
        return pd.DataFrame({
            "n": pd.Series([2 * len(x)], dtype="int64"),
            "sx": pd.Series([sall], dtype="int64"),
            "sy": pd.Series([sall], dtype="int64"),
            "sxy": pd.Series([2 * int((x * y).sum())], dtype="int64"),
            "sxx": pd.Series([sq], dtype="int64"),
            "syy": pd.Series([sq], dtype="int64")})

    if use_bcast:
        import ray
        dpd = deg.to_pandas()
        order = np.argsort(dpd["node"].to_numpy(np.int64), kind="stable")
        ref = ray.put((dpd["node"].to_numpy(np.int64)[order],
                       dpd["d"].to_numpy(np.int64)[order]))

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            import ray as _ray
            nodes, dvals = _ray.get(ref)
            src = b["src"].to_numpy(np.int64)
            dst = b["dst"].to_numpy(np.int64)
            x = dvals[np.searchsorted(nodes, src)]
            y = dvals[np.searchsorted(nodes, dst)]
            return moments(x, y)

        parts = edges.map_batches(
            partial, batch_format="pandas").to_pandas()
    else:
        j = hash_join(
            edges.map_batches(lambda b: b.rename(columns={"src": "node"}),
                              batch_format="pandas"),
            deg.map_batches(lambda b: b.rename(columns={"d": "dx"}),
                            batch_format="pandas"),
            on="node", num_buckets=coarse_buckets,
        ).map_batches(lambda b: b.rename(columns={"node": "src",
                                                  "dst": "node"}),
                      batch_format="pandas")
        j = hash_join(
            j, deg.map_batches(lambda b: b.rename(columns={"d": "dy"}),
                               batch_format="pandas"),
            on="node", num_buckets=coarse_buckets)

        def partial2(b: pd.DataFrame) -> pd.DataFrame:
            return moments(b["dx"].to_numpy(np.int64),
                           b["dy"].to_numpy(np.int64))

        parts = j.map_batches(partial2, batch_format="pandas").to_pandas()

    # exact integer fold (Python ints: no overflow at any scale)
    n = int(parts["n"].sum())
    if n == 0:
        return {"n_ends": 0, "assortativity": float("nan")}
    sx = sum(int(v) for v in parts["sx"])
    sy = sum(int(v) for v in parts["sy"])
    sxy = sum(int(v) for v in parts["sxy"])
    sxx = sum(int(v) for v in parts["sxx"])
    syy = sum(int(v) for v in parts["syy"])
    num = n * sxy - sx * sy
    den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(
        float(n * syy - sy * sy))
    return {"n_ends": n,
            "assortativity": float(num) / den if den else float("nan")}
