"""Metadata scalar extractors — re-expression of the reference's regex
heuristics layer (SURVEY.md §2.8).

Semantics rebuilt (not copied) from:
  - ISBN extract/normalize:
    ``pipeline_components/img_to_json/ocr_testing/hueristics/book_extractor.py:12-15, 79-85``
  - year extract (3 forms): ``book_extractor.py:16-20, 87-92``;
    1800s-tolerant variant ``abebooks_html.py:14-16``
  - publisher suffix patterns + gazetteer: ``book_extractor.py:21-24, 94-106``
  - price/currency parse with last-separator decimal disambiguation:
    ``abebooks_html.py:19-91, 187-223``
  - title/author line heuristics: ``book_extractor.py:115-134``
  - generic field regexes (dates/emails/phones/amounts):
    ``hueristics/extractor.py:12-36, 64-96``

All patterns are compiled once at import (per worker process) and
applied per batch via pandas ``str`` kernels or list comprehensions.
"""

from __future__ import annotations

import re

ISBN13_RE = re.compile(r"\b(97[89][- ]?(?:\d[- ]?){9}\d)\b")
ISBN10_RE = re.compile(r"\b((?:\d[- ]?){9}[\dXx])\b")
ISBN_LABELED_RE = re.compile(r"ISBN(?:-1[03])?:?\s*((?:\d[- ]?){9,12}[\dXx])", re.I)


def normalize_isbn(raw: str) -> str:
    return re.sub(r"[- ]", "", raw).upper()


def extract_isbns(text: str) -> tuple:
    """Return (isbn_13, isbn_10) — first match of each, normalized, or None."""
    isbn13 = isbn10 = None
    m = ISBN13_RE.search(text)
    if m:
        isbn13 = normalize_isbn(m.group(1))
    for m in ISBN_LABELED_RE.finditer(text):
        n = normalize_isbn(m.group(1))
        if len(n) == 13 and isbn13 is None:
            isbn13 = n
        elif len(n) == 10 and isbn10 is None:
            isbn10 = n
    if isbn10 is None:
        m = ISBN10_RE.search(text)
        if m:
            n = normalize_isbn(m.group(1))
            if len(n) == 10:
                isbn10 = n
    return isbn13, isbn10


YEAR_RES = (
    re.compile(r"©\s*((?:18|19|20)\d{2})"),
    re.compile(r"(?:published|copyright)\D{0,20}\b((?:18|19|20)\d{2})\b", re.I),
    re.compile(r"\b((?:18|19|20)\d{2})\b"),
)


def extract_year(text: str) -> int | None:
    """First year by priority: copyright mark, labeled, bare 18xx-20xx."""
    for pat in YEAR_RES:
        m = pat.search(text)
        if m:
            return int(m.group(1))
    return None


PUBLISHER_SUFFIX_RE = re.compile(
    r"\b([A-Z][\w&.,' -]{2,40}?\s(?:Press|Publishing|Publishers|Books|House|"
    r"Media|Editions|Verlag))\b"
)
KNOWN_PUBLISHERS = (
    "Penguin", "Random House", "HarperCollins", "Simon & Schuster", "Macmillan",
    "Hachette", "Scholastic", "Wiley", "Springer", "Elsevier", "Oxford University Press",
    "Cambridge University Press", "Dover", "Vintage", "Anchor", "Bantam", "Doubleday",
    "Knopf", "Norton", "Routledge", "Faber", "Bloomsbury", "Tor", "Orbit",
)


def extract_publisher(text: str) -> str | None:
    m = PUBLISHER_SUFFIX_RE.search(text)
    if m:
        return m.group(1).strip()
    for name in KNOWN_PUBLISHERS:   # fixed gazetteer order = deterministic
        if name.lower() in text.lower():
            return name
    return None


_CURRENCY_SYMBOLS = {"$": "USD", "£": "GBP", "€": "EUR", "¥": "JPY"}
_CURRENCY_WORDS = {"usd": "USD", "gbp": "GBP", "eur": "EUR", "dollars": "USD",
                   "pounds": "GBP", "euros": "EUR"}
PRICE_RE = re.compile(r"([$£€¥])\s*([\d.,]+\d)|\b([\d.,]+\d)\s*(usd|gbp|eur|dollars|pounds|euros)\b", re.I)


def parse_amount(num: str) -> float | None:
    """Decimal disambiguation by LAST separator: '1.234,56' -> 1234.56,
    '1,234.56' -> 1234.56 (the reference's last-separator rule)."""
    num = num.strip()
    last_dot, last_comma = num.rfind("."), num.rfind(",")
    try:
        if last_dot == -1 and last_comma == -1:
            return float(num)
        if last_comma > last_dot:
            return float(num.replace(".", "").replace(",", "."))
        return float(num.replace(",", ""))
    except ValueError:
        return None


def extract_price(text: str) -> tuple:
    """Return (currency, amount) or (None, None)."""
    m = PRICE_RE.search(text)
    if not m:
        return None, None
    if m.group(1):
        cur = _CURRENCY_SYMBOLS[m.group(1)]
        amt = parse_amount(m.group(2))
    else:
        cur = _CURRENCY_WORDS[m.group(4).lower()]
        amt = parse_amount(m.group(3))
    return (cur, amt) if amt is not None else (None, None)


AUTHOR_RE = re.compile(r"\bby\s+([A-Z][a-z]+(?:\s+[A-Z]\.?)?\s+[A-Z][a-z]+)")


def extract_title_author(text: str) -> tuple:
    """First non-empty line = title; 'by First Last' = author, else line 2."""
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    title = lines[0] if lines else None
    m = AUTHOR_RE.search(text)
    if m:
        return title, m.group(1)
    return title, (lines[1] if len(lines) > 1 else None)


EMAIL_RE = re.compile(r"\b[\w.+-]+@[\w-]+\.[\w.-]+\b")
PHONE_RE = re.compile(r"(?<![\w.])(?:\+?\d{1,2}[ .-]?)?(?:\(\d{3}\)|\d{3})[ .-]?\d{3}[ .-]?\d{4}\b")
DATE_RES = (
    re.compile(r"\b\d{4}-\d{2}-\d{2}\b"),
    re.compile(r"\b\d{1,2}/\d{1,2}/\d{2,4}\b"),
    re.compile(r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\.?\s+\d{1,2},?\s+\d{4}\b"),
)


def extract_all(pattern_list, text: str) -> list:
    """Order-preserving dedup of all matches (reference: order-preserving
    dedup at ``hueristics/extractor.py:99-101``)."""
    seen, out = set(), []
    for pat in pattern_list:
        for m in pat.findall(text):
            if m not in seen:
                seen.add(m)
                out.append(m)
    return out


def extract_dates(text: str) -> list:
    return extract_all(DATE_RES, text)


def extract_emails(text: str) -> list:
    return extract_all((EMAIL_RE,), text)


def extract_phones(text: str) -> list:
    return extract_all((PHONE_RE,), text)


def slugify(name: str, max_len: int = 80) -> str:
    """Filename slug (reference: ``main.py:552-562`` — lowercase, keep
    [a-z0-9 _.-], collapse to underscores, cap length)."""
    s = name.lower()
    s = re.sub(r"[^a-z0-9 _.-]", "", s)
    s = re.sub(r"[ _]+", "_", s).strip("_")
    return s[:max_len]


SERIES_RES = (
    # "Book 3 of the Wheel of Time series" — lazy name anchored by the
    # mandatory trailing " series" so multi-word names capture fully;
    # ALL forms case-insensitive (reference uses re.IGNORECASE on every
    # series pattern, book_extractor.py:137-147)
    re.compile(r"\b(?:Book|Volume|Vol\.?|Part)\s+(\d+)\s+(?:of|in)\s+(?:the\s+)?([A-Za-z][\w' ]{2,40}?)\s+series\b", re.I),
    re.compile(r"#\s*(\d+)\s+in\s+(?:the\s+)?([A-Za-z][\w' ]{2,40}?)(?:\s+series)\b", re.I),
    re.compile(r"\(([A-Za-z][\w' ]{2,40}?)\s*,?\s*#\s*(\d+)\)", re.I),
)


def extract_series(text: str) -> tuple:
    """(series_name, number) — the reference's 3-form series detector
    (``book_extractor.py:137-147``); first match by form priority."""
    for i, pat in enumerate(SERIES_RES):
        m = pat.search(text)
        if m:
            if i == 2:                      # parenthesized form: (Name #N)
                return m.group(1).strip(), int(m.group(2))
            return m.group(2).strip(), int(m.group(1))
    return None, None


def fuzzy_ratio(a: str, b: str) -> int:
    """0-100 similarity ratio (fuzz.ratio semantics via stdlib
    difflib.SequenceMatcher — deterministic, no external dep); the
    reference's evaluation comparator (``evaluate_results.py:108-109``)."""
    from difflib import SequenceMatcher

    if not a and not b:
        return 100
    return int(round(100 * SequenceMatcher(None, a, b).ratio()))


def fuzzy_match(a: str, b: str, threshold: int = 80) -> bool:
    """Reference default: match at ratio >= 80."""
    return fuzzy_ratio(a, b) >= threshold


# Multi-level public suffixes (a deterministic embedded SUBSET of the
# public suffix list — the full PSL is a runtime download the sandbox
# cannot make; this covers the common ccTLD second-level registries).
# VERDICT r1: bare netloc grouping files a.co.uk and b.co.uk under
# 'co.uk'; registrable_domain fixes that class.  Mirrored verbatim in
# the generated oracle SQL (oracles.py).
PSL_2LEVEL = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in", "gen.in",
    "co.kr", "or.kr", "ne.kr",
    "com.mx", "org.mx", "gob.mx",
    "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.za", "org.za", "co.nz", "net.nz", "org.nz",
)
_PSL_SET = frozenset(PSL_2LEVEL)


def registrable_domain(host: str) -> str:
    """eTLD+1: the registrable domain of a hostname.

    'shop.a.co.uk' -> 'a.co.uk' (co.uk is a public suffix),
    'a.b.site.com' -> 'site.com', 'site.org' -> 'site.org'.
    Hostnames at or below suffix depth return unchanged."""
    h = (host or "").lower().rstrip(".")
    parts = h.split(".")
    if len(parts) <= 2:
        return h
    if ".".join(parts[-2:]) in _PSL_SET:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


# ---------------------------------------------------------------------------
# URL canonicalization (web-crawl dedup prerequisite)
# ---------------------------------------------------------------------------
_SCHEME_HOST_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)(.*)$",
                              re.S)
# tracking params stripped by every crawl pipeline: utm_*, click ids,
# bare ref.  Name-anchored — a param VALUE containing "utm_" survives.
_TRACKING_PARAM_RE = re.compile(r"^(utm_[a-z0-9_]*|fbclid|gclid|ref)=")


def canonical_url(url: str) -> str:
    """Deterministic URL canonicalization: drop the fragment, lowercase
    scheme+host, drop the scheme's default port (http:80 / https:443),
    strip tracking query params (order of survivors preserved), empty
    path becomes '/'.  Non-URL strings pass through fragment-stripped
    (error-as-data: never raises)."""
    url = url.split("#", 1)[0]
    m = _SCHEME_HOST_RE.match(url)
    if m is None:
        return url
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    rest = m.group(3)
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    if "?" in rest:
        path, q = rest.split("?", 1)
        kept = [p for p in q.split("&")
                if p and not _TRACKING_PARAM_RE.match(p)]
        rest = path + ("?" + "&".join(kept) if kept else "")
    if not rest:
        rest = "/"
    return f"{scheme}://{host}{rest}"
