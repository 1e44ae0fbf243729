"""Stage 4: reading-order text emission with char spans.

THE byte-identity kernel.  The analog of the reference's OCR fragment
join (``enhanced_extractor.py:520-521``:
``" ".join(result[1] for result in results)`` in detector output
order — the "reading-order concatenation" invariant, SURVEY.md M5).
Here: kept blocks joined in segmentation order with a fixed separator,
and per-block char offsets into the emitted text are recorded so
``text[start:stop] == block.text`` holds exactly.
"""

from __future__ import annotations

from bb_ocr_ray.config import DEFAULT_EXTRACT, ExtractConfig


def emit(blocks: list, cfg: ExtractConfig = DEFAULT_EXTRACT) -> tuple[str, list]:
    """Join content blocks; return (text, [(start, stop), ...]) spans.

    Invariants (property-tested in tests/test_kernel.py): spans are
    sorted, non-overlapping, and round-trip (`text[s:e]` equals the
    block's text).  Deterministic for a fixed config: no dict/hash
    order anywhere — list order is segmentation order.
    """
    sep = cfg.block_separator
    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    pos = 0
    for blk in blocks:
        if not blk.is_content:
            continue
        if parts:
            pos += len(sep)
            parts.append(sep)
        start = pos
        parts.append(blk.text)
        pos += len(blk.text)
        spans.append((start, pos))
    return "".join(parts), spans
