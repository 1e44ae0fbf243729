"""File-based sources — the reference's directory scanners re-expressed.

S1 (book-directory reader, ``enhanced_extractor.py:1013-1035``: scan a
directory, filter by extension, sort by filename) becomes an HTML-dir
reader on ``ray.data.read_binary_files(include_paths=True)``: one row
per file, the file path becomes the url, deterministic order is
irrelevant because every row is self-contained (SURVEY.md S1 note).

JSON/CSV ingestion covers the reference's JSON record files
(``process_book_enhanced.py:122-123`` outputs; S9 prior-run loader):
``read_pages_json`` / ``read_pages_csv`` normalize either format into
the canonical pages shape so the same extraction pipeline runs on all
three (Arrow casts at ingest = M14 input normalizer).
"""

from __future__ import annotations

import pandas as pd

HTML_EXTENSIONS = (".html", ".htm", ".xhtml")


def read_html_dir(root: str, extensions=HTML_EXTENSIONS):
    """Directory of html files -> pages-shaped Dataset.

    url = "file://" + path; warc_ts fixed epoch; crawl text/lang empty.
    """
    import ray.data as rd

    ds = rd.read_binary_files(root, include_paths=True)

    def to_pages(batch: pd.DataFrame) -> pd.DataFrame:
        mask = batch["path"].str.lower().str.endswith(tuple(extensions))
        b = batch[mask]
        return pd.DataFrame(
            {"url": "file://" + b["path"],
             "warc_ts": pd.Timestamp("2024-01-01"),
             "html": b["bytes"],
             "text": "",
             "lang": ""}
        )

    return ds.map_batches(to_pages, batch_format="pandas")


def _normalize_pages(batch: pd.DataFrame) -> pd.DataFrame:
    """Coerce loosely-typed rows to the canonical pages shape (M14)."""
    out = pd.DataFrame()
    out["url"] = batch["url"].astype(str)
    ts = pd.to_datetime(batch.get("warc_ts", pd.Timestamp("2024-01-01")))
    out["warc_ts"] = ts
    out["html"] = [
        h if isinstance(h, (bytes, bytearray))
        else h.encode("utf-8") if isinstance(h, str)
        else b""                                 # None/NaN -> empty page
        for h in batch["html"]
    ]
    out["text"] = (batch["text"].fillna("").astype(str)
                   if "text" in batch else "")
    out["lang"] = (batch["lang"].fillna("").astype(str)
                   if "lang" in batch else "")
    return out


def read_pages_json(paths):
    """JSONL page records -> canonical pages Dataset."""
    import ray.data as rd

    return rd.read_json(paths).map_batches(_normalize_pages,
                                           batch_format="pandas")


def read_pages_csv(paths):
    """CSV page records (html as utf-8 text column) -> pages Dataset."""
    import ray.data as rd

    return rd.read_csv(paths).map_batches(_normalize_pages,
                                          batch_format="pandas")
