"""Arrow schemas for every table the engine produces or consumes.

The reference declares its output shape as JSON Schema constants
(``pipeline_demo/extractor/enhanced_extractor.py:57-92``) and validates
records post-hoc; here the schema is an Arrow schema enforced by
construction in every ``map_batches`` stage (SURVEY.md §1.4).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: Common-Crawl-style web pages (BASELINE.json input_hint).
# ---------------------------------------------------------------------------
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),   # crawl-provided text; never used as ground truth
        ("lang", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Per-block features — the analog of the reference's bbox region list
# (``enhanced_extractor.py:289-337``: (x, y, w, h) contour boxes).  For web
# pages a "region" is a DOM text block with position = (tag_path, depth)
# and geometry = (text_density, link_density).
# ---------------------------------------------------------------------------
BLOCK_STRUCT = pa.struct(
    [
        ("block_id", pa.int32()),
        ("tag_path", pa.string()),
        ("depth", pa.int32()),
        ("text", pa.string()),
        ("text_density", pa.float64()),
        ("link_density", pa.float64()),
        ("is_content", pa.bool_()),
    ]
)

SPAN_STRUCT = pa.struct([("start", pa.int64()), ("stop", pa.int64())])

# ---------------------------------------------------------------------------
# Output: extracted main content, reading order, with char spans.
# ``text`` is the byte-identity target (north_rule); error-as-data columns
# follow the reference's fallback-record pattern
# (``enhanced_extractor.py:953-1002`` — never drop rows, never raise).
# ---------------------------------------------------------------------------
EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("domain", pa.string()),
        ("text", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("blocks", pa.list_(BLOCK_STRUCT)),
        ("n_blocks_kept", pa.int32()),
        ("html_bytes", pa.int64()),
        ("status", pa.string()),          # ok | empty | truncated | parse_error
        ("error", pa.string()),           # nullable detail
        ("steps_applied", pa.list_(pa.string())),  # audit trail (M1 analog)
    ]
)

# ---------------------------------------------------------------------------
# Lineage manifest (checkpoint/resume) — FIXTURES.md §3.
# ---------------------------------------------------------------------------
MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int64()),
        ("fragment_ids", pa.list_(pa.string())),
        ("row_count", pa.int64()),
        ("digest", pa.string()),
        ("completed_ts", pa.timestamp("us")),
    ]
)

# ---------------------------------------------------------------------------
# Per-domain aggregate (salted groupby output) — FIXTURES.md §4.
# ---------------------------------------------------------------------------
DOMAIN_STATS_SCHEMA = pa.schema(
    [
        ("domain", pa.string()),
        ("n_docs", pa.int64()),
        ("html_bytes", pa.int64()),
        ("extracted_chars", pa.int64()),
        ("n_errors", pa.int64()),
    ]
)

# ---------------------------------------------------------------------------
# Reference-shape metadata record (operator-parity fixtures) — mirrors the
# schema of ``pipeline_demo/extractor/process_book_enhanced.py:13-33``
# (the ``publication_date`` variant; SURVEY.md §1.3 "pick ONE").
# ---------------------------------------------------------------------------
METADATA_SCHEMA = pa.schema(
    [
        ("title", pa.string()),
        ("subtitle", pa.string()),
        ("authors", pa.list_(pa.string())),
        ("publisher", pa.string()),
        ("publication_date", pa.string()),
        ("isbn_10", pa.string()),
        ("isbn_13", pa.string()),
        ("asin", pa.string()),
        ("edition", pa.string()),
        ("binding_type", pa.string()),
        ("language", pa.string()),
        ("page_count", pa.int32()),
        ("categories", pa.list_(pa.string())),
        ("description", pa.string()),
        ("condition_keywords", pa.list_(pa.string())),
        ("price", pa.struct([("currency", pa.string()), ("amount", pa.float64())])),
        ("valid", pa.bool_()),
        ("validation_error", pa.string()),
    ]
)
