"""Changelog merge (CDC upsert): latest-wins per key with tombstones.

The recrawl/ingest bookkeeping primitive a 100-TB corpus needs between
snapshots: a base table plus an insert/update/delete changelog fold to
the current state — the MERGE INTO / compaction step of log-structured
table formats, and the latest-crawl-wins rule for pages re-fetched
across WARC snapshots (the dedup_exact sibling with max-order instead
of min-order semantics and delete markers).

Scale shape: per-block combiner keeps one candidate winner per key and
a partial version count, then ONE coarse-bucketed shuffle (bounded
bucket key — never a per-url Ray group, stages/coarse.py per-group
tax) folds candidates with a vectorized in-task winner pick.  The
payload that shuffles is one row per distinct key per block, not the
full changelog.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def merge_changelog(ds, key: str, order_col: str, op_col: str = "op",
                    tombstone: str = "D", versions_col: str = "n_versions",
                    coarse_buckets: int | None = None):
    """Fold a changelog Dataset to its latest state per ``key``.

    Rows are full records stamped with ``op_col`` ('I'/'U'/``tombstone``)
    and a totally-ordered ``order_col`` (revision / timestamp; the
    caller guarantees (key, order) pairs are unique and ``key`` is
    non-null — ties would make the winner nondeterministic).  The
    max-``order_col`` row wins per key; keys whose winner is a
    ``tombstone`` row are dropped entirely.  ``versions_col`` reports
    how many log rows each surviving key folded (tombstones included).
    """
    from bb_ocr_ray.stages.coarse import _bucket_ids
    from bb_ocr_ray.stages.joins import _auto_num_buckets

    if coarse_buckets is None:
        coarse_buckets = _auto_num_buckets()

    def _winners(b: pd.DataFrame, counts: pd.Series) -> pd.DataFrame:
        w = (b.sort_values([key, order_col], kind="mergesort")
             .drop_duplicates(subset=[key], keep="last"))
        return w.assign(
            **{versions_col: w[key].map(counts).astype("int64")})

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        # combiner: one candidate per key per block + partial count
        counts = b.groupby(key, sort=False).size()
        w = _winners(b.drop(columns=[versions_col], errors="ignore"),
                     counts)
        w["__coarse"] = _bucket_ids(w, [key], coarse_buckets)
        return w

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        counts = g.groupby(key, sort=False)[versions_col].sum()
        w = _winners(g.drop(columns=[versions_col]), counts)
        w = w[w[op_col] != tombstone]
        return w.drop(columns=["__coarse"]).reset_index(drop=True)

    return (ds.map_batches(combine, batch_format="pandas")
            .groupby("__coarse").map_groups(fold, batch_format="pandas"))
