"""Streaming-shaped processing with incremental actor state.

Ray Data has no event-time windows/watermarks (SURVEY.md §2.9); batch
re-expressions (q_events_hourly / q_sessionize) cover the reference's
needs.  This module is the documented LAST-RESORT pattern from the
task brief — raw Ray actors holding mutable state — for semantics a
Dataset genuinely can't express: processing an ORDERED event stream
incrementally, emitting results as windows close, without holding the
stream in memory.

Partitioning assumption (stated per the brief): events are routed to
one actor per key-hash bucket, and arrive at each actor in
non-decreasing ts order — guaranteed here by a global ts sort before
iteration.  State per actor is O(open keys), not O(events).
"""

from __future__ import annotations

import pandas as pd
import ray
from bb_ocr_ray.functions.hashing import crc32  # noqa: E402  (deterministic routing)


@ray.remote
class SessionActor:
    """Incremental gap-sessionizer for one key-hash bucket.

    State: per-user (last_ts, n_sessions, n_events).  ``ingest`` takes a
    ts-ordered chunk; ``finalize`` returns the per-user summary."""

    def __init__(self, gap_seconds: float):
        self.gap = gap_seconds
        self.state: dict = {}

    def ingest(self, users, ts_values) -> int:
        gap = self.gap
        st = self.state
        for u, t in zip(users, ts_values):
            rec = st.get(u)
            if rec is None:
                st[u] = [t, 1, 1]
            else:
                if (t - rec[0]) > gap:
                    rec[1] += 1
                rec[0] = t
                rec[2] += 1
        return len(st)

    def finalize(self) -> pd.DataFrame:
        return pd.DataFrame(
            {"user_id": pd.Series(list(self.state), dtype="int64"),
             "n_sessions": pd.Series([v[1] for v in self.state.values()],
                                     dtype="int64"),
             "n_events": pd.Series([v[2] for v in self.state.values()],
                                   dtype="int64")}
        )


def sessionize_streaming(events_ds, gap_seconds: float = 1800.0,
                         n_actors: int = 4) -> pd.DataFrame:
    """Stream events through a bank of stateful actors; return per-user
    (n_sessions, n_events).  Batch-equivalent of q_sessionize — the
    equality is asserted in tests."""
    actors = [SessionActor.remote(gap_seconds) for _ in range(n_actors)]
    ordered = events_ds.sort("ts")
    pending = []
    for batch in ordered.iter_batches(batch_size=4096, batch_format="pandas"):
        epoch = (
            (batch["ts"] - pd.Timestamp("1970-01-01")).dt.total_seconds()
        ).to_numpy()
        users = batch["user_id"].to_numpy()
        buckets = [crc32(str(u)) % n_actors for u in users]
        for a in range(n_actors):
            mask = [b == a for b in buckets]
            if any(mask):
                # per-actor calls are ordered FIFO: state sees the
                # stream in ts order within each bucket
                pending.append(
                    actors[a].ingest.remote(
                        [int(u) for u, m in zip(users, mask) if m],
                        [float(t) for t, m in zip(epoch, mask) if m],
                    )
                )
    ray.get(pending)
    parts = ray.get([a.finalize.remote() for a in actors])
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values("user_id").reset_index(drop=True)
