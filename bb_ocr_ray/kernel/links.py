"""Out-link extraction from raw HTML — the crawl-graph side of the
extraction kernel (reference analog: the DOM walk in
``pipeline_demo/extractor/enhanced_extractor.py`` reads anchors for
boilerplate scoring; here the anchors themselves are the product).

Pure functions over one page so the stage is a vectorizable
``map_batches`` with no state; the per-page cost class is the same as
the text-extraction kernel (one compiled-regex scan of the html).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

# href value in single/double/no quotes; tolerates attributes before
# href and any case.  A regex (not a DOM walk) because anchors are the
# only node type needed and broken markup must not raise.
_HREF_RE = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))""",
    re.IGNORECASE | re.DOTALL,
)


def extract_links(html_text: str, base_url: str) -> list:
    """Absolute out-link URLs of a page, in document order.

    - relative hrefs resolve against ``base_url`` (RFC 3986 urljoin);
    - fragment-only hrefs (``#share``) are same-page references, not
      links — dropped;
    - fragments are stripped from kept links (the crawl frontier
      identity is the fragmentless URL);
    - empty hrefs dropped;  duplicates KEPT (multiset: link prominence
      is a real signal — callers dedup if they want the set).
    """
    out = []
    for m in _HREF_RE.finditer(html_text):
        href = next(g for g in m.groups() if g is not None).strip()
        if not href or href.startswith("#"):
            continue
        absu = urljoin(base_url, href)
        s = urlsplit(absu)
        if s.scheme not in ("http", "https"):
            continue  # mailto:, javascript:, data:
        out.append(s._replace(fragment="").geturl())
    return out


# anchor WITH inner markup, for (href, anchor-text) pairing — href
# group layout identical to _HREF_RE; inner stops at the first </a>
# (HTML5 forbids nested <a>, and broken markup must not raise)
_ANCHOR_RE = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>"']+))"""
    r"""[^>]*>(.*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_anchor_texts(html_text: str, base_url: str) -> list:
    """(absolute link, anchor text) pairs in document order — the
    anchor-text ranking/labeling signal (what OTHER pages call a URL).

    Link identity rules match :func:`extract_links` (fragment-only
    dropped, fragments stripped, non-http(s) schemes dropped); the
    anchor text is the inner markup with tags stripped and whitespace
    collapsed.  Anchors with empty text are kept with '' — a real
    signal (image links) the caller may filter.
    """
    out = []
    for m in _ANCHOR_RE.finditer(html_text):
        href = next(g for g in m.groups()[:3] if g is not None).strip()
        if not href or href.startswith("#"):
            continue
        absu = urljoin(base_url, href)
        s = urlsplit(absu)
        if s.scheme not in ("http", "https"):
            continue
        text = _WS_RE.sub(" ", _TAG_RE.sub(" ", m.group(4))).strip()
        out.append((s._replace(fragment="").geturl(), text))
    return out
