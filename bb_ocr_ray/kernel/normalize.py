"""Stage 1: bytes -> unicode text, deterministically.

The analog of the reference's deterministic preprocess chain
(``pipeline_demo/ocr_testing/preprocessing/image_preprocessor.py:147-160``
— grayscale/resize/denoise/contrast with a ``steps_applied`` audit
list).  For HTML the "preprocess" is charset sniff + decode; the audit
trail survives as the ``steps_applied`` output column.

Decode policy (fixed, documented, never locale-dependent):
  1. BOM (utf-8-sig / utf-16 le+be) wins.
  2. ``<meta charset=...>`` / ``<meta http-equiv Content-Type>`` /
     ``<?xml encoding=...>`` declaration within the first
     ``charset_sniff_bytes`` bytes.
  3. strict utf-8 attempt.
  4. latin-1 (never fails; maps bytes 1:1).
Unknown/bogus declared charsets fall through to steps 3-4.
"""

from __future__ import annotations

import codecs
import re

from bb_ocr_ray.config import DEFAULT_EXTRACT, ExtractConfig

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]{0,256}?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]{2,32})""", re.I
)
_XML_DECL_RE = re.compile(
    rb"""<\?xml[^>]{0,256}?encoding\s*=\s*["']([a-zA-Z0-9_\-]{2,32})""", re.I
)

_BOMS = (
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def sniff_charset(data: bytes, cfg: ExtractConfig = DEFAULT_EXTRACT) -> str | None:
    """Return a declared charset name from BOM or meta/xml declaration, or None."""
    for bom, enc in _BOMS:
        if data.startswith(bom):
            return enc
    head = data[: cfg.charset_sniff_bytes]
    m = _META_CHARSET_RE.search(head) or _XML_DECL_RE.search(head)
    if m:
        return m.group(1).decode("ascii", "replace").lower()
    return None


def decode_html(data: bytes, cfg: ExtractConfig = DEFAULT_EXTRACT) -> tuple[str, list[str]]:
    """Decode HTML bytes to str; returns (text, steps_applied audit list)."""
    steps: list[str] = []
    declared = sniff_charset(data, cfg)
    if declared is not None:
        try:
            text = data.decode(declared)
            steps.append(f"decode:{declared}")
            return text, steps
        except (LookupError, UnicodeDecodeError):
            steps.append(f"decode_failed:{declared}")
    try:
        text = data.decode("utf-8")
        steps.append("decode:utf-8")
        return text, steps
    except UnicodeDecodeError:
        text = data.decode("latin-1")
        steps.append("decode:latin-1")
        return text, steps


# ASCII whitespace only — intentionally NOT \s (which is unicode-aware in
# Python but engine-dependent elsewhere).  This exact class is mirrored by
# the DuckDB oracle regexp in __ray_entry__.oracle_sql(), so keep the two
# in sync.
_WS_RE = re.compile(r"[ \t\n\r\f\v]+")


def collapse_ws(s: str) -> str:
    """Whitespace canonicalization: runs of ASCII whitespace -> one space, strip ends.

    Analog of the reference's normalizer ``re.sub(r"\\s+", " ", s).strip()``
    (``pipeline_demo/pricing_api/pricing_api/providers/abebooks_html.py:8-11``).
    """
    return _WS_RE.sub(" ", s).strip()
