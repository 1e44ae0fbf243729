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


@ray.remote
class WatermarkSessionActor:
    """Gap-sessionizer with event-time watermark + allowed lateness.

    Events may arrive OUT of order.  Watermark = max event ts seen -
    ``allowed_lateness``.  An arriving event older than the watermark
    is LATE: counted and dropped (Flink-style default), never folded —
    so results are deterministic for a given arrival order.  Events at
    or above the watermark buffer per user; once the watermark passes
    them they are folded in ts order, which is safe because nothing
    older can arrive anymore.  State: O(open keys + buffered in-flight
    events within the lateness horizon), never O(stream)."""

    def __init__(self, gap_seconds: float, allowed_lateness: float):
        self.gap = gap_seconds
        self.lateness = allowed_lateness
        self.max_ts = float("-inf")
        self.buf: dict = {}     # user -> list[ts] awaiting watermark
        self.state: dict = {}   # user -> [last_ts, n_sessions, n_events]
        self.n_late = 0

    def _fold(self, u, ts_sorted):
        rec = self.state.get(u)
        for t in ts_sorted:
            if rec is None:
                rec = self.state[u] = [t, 1, 1]
            else:
                if (t - rec[0]) > self.gap:
                    rec[1] += 1
                rec[0] = t
                rec[2] += 1

    def ingest(self, users, ts_values) -> int:
        for u, t in zip(users, ts_values):
            # per-EVENT watermark: lateness is judged against the max
            # ts seen so far, not a per-chunk snapshot (chunk-boundary
            # watermarks would make late-ness depend on batch size)
            if t < self.max_ts - self.lateness:
                self.n_late += 1
                continue
            self.buf.setdefault(u, []).append(t)
            if t > self.max_ts:
                self.max_ts = t
        # advance the watermark once per chunk and flush ripe events
        wm = self.max_ts - self.lateness
        for u, pend in list(self.buf.items()):
            ripe = sorted(x for x in pend if x <= wm)
            if ripe:
                self._fold(u, ripe)
                rest = [x for x in pend if x > wm]
                if rest:
                    self.buf[u] = rest
                else:
                    del self.buf[u]
        return self.n_late

    def finalize(self) -> pd.DataFrame:
        for u, pend in sorted(self.buf.items()):
            self._fold(u, sorted(pend))
        self.buf.clear()
        return pd.DataFrame(
            {"user_id": pd.Series(list(self.state), dtype="int64"),
             "n_sessions": pd.Series([v[1] for v in self.state.values()],
                                     dtype="int64"),
             "n_events": pd.Series([v[2] for v in self.state.values()],
                                   dtype="int64"),
             "n_late": pd.Series([self.n_late] * len(self.state),
                                 dtype="int64")}
        )


def sessionize_watermark(events_ds, gap_seconds: float = 1800.0,
                         allowed_lateness: float = 0.0, n_actors: int = 4,
                         presorted: bool = False):
    """Watermark/late-data sessionization over a (possibly out-of-order)
    event stream.  Returns (per-user DataFrame, total late-dropped).

    With ``presorted=True`` the input is iterated as-is (true streaming
    arrival order); otherwise a ts sort makes the stream in-order, in
    which case the result equals the batch groupby sessionization for
    ANY lateness (asserted by the q_sessionize_stream oracle)."""
    actors = [WatermarkSessionActor.remote(gap_seconds, allowed_lateness)
              for _ in range(n_actors)]
    ordered = events_ds if presorted else events_ds.sort("ts")
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
                pending.append(
                    actors[a].ingest.remote(
                        [int(u) for u, m in zip(users, mask) if m],
                        [float(t) for t, m in zip(epoch, mask) if m],
                    )
                )
    ray.get(pending)
    parts = ray.get([a.finalize.remote() for a in actors])
    n_late = int(sum(p["n_late"].iloc[0] if len(p) else 0 for p in parts))
    out = pd.concat([p[["user_id", "n_sessions", "n_events"]] for p in parts],
                    ignore_index=True)
    return out.sort_values("user_id").reset_index(drop=True), n_late
