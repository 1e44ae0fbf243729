"""Size-aware repartition (north_rule skew handling).

Megadocs (multi-MB html payloads) make block sizes — and therefore task
times and worker heaps — wildly uneven if rows are bundled by count.
``split_by_bytes`` re-cuts every batch into sub-batches bounded by a
byte budget on a designated payload column; Ray turns each yielded
sub-batch into its own block, so downstream stages see bounded work
units regardless of row-size skew.  (The reference's analog is the
per-index OCR downscale cap, ``enhanced_extractor.py:487-512`` — bound
the worst-case work per unit.)
"""

from __future__ import annotations

import pyarrow as pa


def split_by_bytes(ds, payload_col: str = "html",
                   max_bytes: int = 8 * 1024 * 1024):
    """Yield sub-batches whose summed payload size ≤ max_bytes (a row
    bigger than the budget gets its own block)."""

    def splitter(batch: pa.Table):
        sizes = [len(v) if v is not None else 0
                 for v in batch.column(payload_col).to_pylist()]
        start = 0
        acc = 0
        for i, s in enumerate(sizes):
            if i > start and acc + s > max_bytes:
                yield batch.slice(start, i - start)
                start, acc = i, 0
            acc += s
        if start < batch.num_rows:
            yield batch.slice(start)

    return ds.map_batches(splitter, batch_format="pyarrow", batch_size=None)


import contextlib


@contextlib.contextmanager
def block_budget(max_bytes: int):
    """Temporarily set DataContext.target_max_block_size.

    The streaming executor rebuilds output blocks from generator yields
    up to ``target_max_block_size`` — so bounding per-yield payloads
    (split_by_bytes) only bounds BLOCKS when the context budget agrees.
    Use both together for megadoc stages — and note Ray snapshots the
    DataContext at *Dataset creation*, so the source read must also be
    inside the context:

        with block_budget(8 << 20):
            pages = ray.data.read_parquet(...)
            split_by_bytes(pages, "html", 8 << 20).write_parquet(out)
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev_max = ctx.target_max_block_size
    prev_min = getattr(ctx, "target_min_block_size", None)
    ctx.target_max_block_size = max_bytes
    if prev_min is not None:
        # blocks below target_min_block_size are never split — lower it
        # too or small budgets are silently ignored
        ctx.target_min_block_size = min(prev_min, max_bytes // 2)
    try:
        yield
    finally:
        ctx.target_max_block_size = prev_max
        if prev_min is not None:
            ctx.target_min_block_size = prev_min
