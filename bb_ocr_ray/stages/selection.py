"""Exact distributed selection — k-th smallest without a global sort
(iterative histogram narrowing; the classic median-of-10^12-rows
primitive, textbook distributed selection re-expressed as Ray Data
passes).

Each round is ONE streaming map over the pruned value column emitting
a fixed-width count histogram partial per block (B+2 rows each — the
shuffle-free pagerank-probe pattern: partials fold on the driver,
block-count × (B+2) rows total).  The bucket containing the k-th
value narrows the search interval; once the surviving interval holds
≤ ``collect_cap`` rows, ONE filtered collect brings exactly those
values to the driver for the final exact pick.  log_B(range) + 2
passes total, nothing ever sorts globally, and no pass moves more
than the candidate set.

NaN/None values are excluded (SQL ORDER BY ... OFFSET semantics over
non-null rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def kth_smallest(ds, col: str, k: int, n_buckets: int = 512,
                 collect_cap: int = 65536, max_rounds: int = 64) -> float:
    """Exact k-th smallest (1-based) non-null value of ``ds[col]``.

    Raises ``ValueError`` when k is out of range.  The result is an
    exact element of the column (selection, not interpolation), so it
    is bit-identical to ``ORDER BY col LIMIT 1 OFFSET k-1``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    # pass 0: global (min, max, count) from per-block partials
    def mm(b: pd.DataFrame) -> pd.DataFrame:
        v = pd.to_numeric(b[col], errors="coerce").to_numpy(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pd.DataFrame({"lo": [np.inf], "hi": [-np.inf],
                                 "n": [np.int64(0)]})
        return pd.DataFrame({"lo": [v.min()], "hi": [v.max()],
                             "n": [np.int64(len(v))]})

    parts = ds.map_batches(mm, batch_format="pandas").to_pandas()
    n_total = int(parts["n"].sum())
    if k > n_total:
        raise ValueError(f"k={k} > non-null rows {n_total}")
    lo = float(parts["lo"].min())
    hi = float(parts["hi"].max())

    for _ in range(max_rounds):
        if lo == hi:
            return lo

        # count rows inside the current interval; stop narrowing once
        # the candidate set is driver-sized
        width = (hi - lo) / n_buckets

        def hist(b: pd.DataFrame, lo=lo, hi=hi, width=width) -> pd.DataFrame:
            v = pd.to_numeric(b[col], errors="coerce").to_numpy(np.float64)
            v = v[~np.isnan(v)]
            below = int((v < lo).sum())
            inside = v[(v >= lo) & (v <= hi)]
            if width > 0:
                idx = np.minimum(((inside - lo) / width).astype(np.int64),
                                 n_buckets - 1)
            else:       # interval collapsed below float resolution
                idx = np.zeros(len(inside), dtype=np.int64)
            counts = np.bincount(idx, minlength=n_buckets)
            return pd.DataFrame({
                "bucket": np.arange(-1, n_buckets, dtype=np.int64),
                "n": np.concatenate([[below], counts]).astype(np.int64)})

        h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
             .groupby("bucket")["n"].sum())
        below = int(h.get(-1, 0))
        if k <= below:
            raise RuntimeError("selection invariant broken: k below lo")
        counts = h.drop(index=-1, errors="ignore").sort_index().to_numpy()
        cum = np.cumsum(counts)
        rem = k - below
        b_idx = int(np.searchsorted(cum, rem))
        in_bucket = int(counts[b_idx])
        rem -= int(cum[b_idx - 1]) if b_idx else 0

        new_lo = lo + b_idx * width
        new_hi = hi if b_idx == n_buckets - 1 else lo + (b_idx + 1) * width
        if in_bucket <= collect_cap or width == 0 or new_hi <= new_lo:
            # final exact pick: collect just the bucket's values.  The
            # bucket predicate must match hist()'s assignment exactly
            # (half-open below the last bucket, closed at the top).
            def grab(b: pd.DataFrame, lo=lo, hi=hi, width=width,
                     b_idx=b_idx) -> pd.DataFrame:
                v = pd.to_numeric(b[col],
                                  errors="coerce").to_numpy(np.float64)
                v = v[~np.isnan(v)]
                v = v[(v >= lo) & (v <= hi)]
                if width > 0:
                    idx = np.minimum(
                        ((v - lo) / width).astype(np.int64),
                        n_buckets - 1)
                    v = v[idx == b_idx]
                return pd.DataFrame({"v": v})

            vals = np.sort(ds.map_batches(grab, batch_format="pandas")
                           .to_pandas()["v"].to_numpy(np.float64))
            # np.sort copies: the collected array can arrive as a
            # read-only zero-copy Arrow view
            return float(vals[rem - 1])

        # k stays the GLOBAL rank: every round recounts rows below the
        # (new) lo globally, so rem = k - below is always the in-
        # interval rank — no incremental bookkeeping to get wrong
        lo, hi = new_lo, new_hi
    raise RuntimeError("selection failed to converge")
