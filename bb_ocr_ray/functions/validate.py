"""Metadata record validation — the reference's schema + business rules
re-expressed as an error-as-data batch pass (SURVEY.md M12).

Rules rebuilt from ``pipeline_demo/extractor/process_book_enhanced.py:35-51``:
  - title required (non-empty string);
  - null arrays coerced to [] (authors, categories, condition_keywords);
  - isbn_10 must be exactly 10 chars when present, isbn_13 exactly 13;
  - page_count must be a positive int when present.
Invalid records are NOT dropped: ``valid=False`` + ``validation_error``
(dead-letter pattern, ``enhanced_extractor.py:953-1002``).
"""

from __future__ import annotations

ARRAY_FIELDS = ("authors", "categories", "condition_keywords")


def validate_record(rec: dict) -> dict:
    """Return the record with arrays coerced + (valid, validation_error) set."""
    out = dict(rec)
    errors = []
    for f in ARRAY_FIELDS:
        if out.get(f) is None:
            out[f] = []
    title = out.get("title")
    if not isinstance(title, str) or not title.strip():
        errors.append("title: required non-empty string")
    isbn10 = out.get("isbn_10")
    if isbn10 is not None and len(isbn10) != 10:
        errors.append(f"isbn_10: bad length {len(isbn10)}")
    isbn13 = out.get("isbn_13")
    if isbn13 is not None and len(isbn13) != 13:
        errors.append(f"isbn_13: bad length {len(isbn13)}")
    pc = out.get("page_count")
    if pc is not None and (not isinstance(pc, int) or pc <= 0):
        errors.append("page_count: must be positive int")
    out["valid"] = not errors
    out["validation_error"] = "; ".join(errors) if errors else None
    return out
