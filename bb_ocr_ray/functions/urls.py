"""URL canonicalization — the recrawl/dedup front-door normalizer.

Re-expresses the reference's URL-identity convention (the aggregator
keys its seen-set on the raw location string, pipeline_demo/
aggregator.py:61-69) as a real canonicalizer, because at web scale the
same resource arrives under dozens of spellings: case-shifted hosts,
default ports, dot-segment paths, tracking query params, fragments,
param order.  Canonical form follows RFC 3986 §6 normalization plus
the de-facto tracking-param strip every production crawler applies.

Pure function of the input string — safe to call row-wise inside
map_batches; all per-call state is local.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": 80, "https": 443}

# exact-match tracking params + the utm_* prefix family (Google
# Analytics / Ads / Facebook click ids — public, universally stripped)
_TRACKING_EXACT = frozenset({"gclid", "fbclid", "msclkid", "dclid",
                             "igshid", "mc_eid"})
_TRACKING_PREFIX = ("utm_",)


def _is_tracking(key: str) -> bool:
    k = key.lower()
    return k in _TRACKING_EXACT or k.startswith(_TRACKING_PREFIX)


def _normalize_path(path: str) -> str:
    """Resolve '.' and '..' segments (RFC 3986 §5.2.4) without
    collapsing duplicate slashes or touching the trailing slash —
    those are content-significant on real servers."""
    if not path:
        return "/"
    out: list[str] = []
    # split keeps '' for leading / trailing slash positions
    segs = path.split("/")
    for seg in segs:
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # re-add a trailing slash position when the path ended in '.'/'..'
    if segs and segs[-1] in (".", "..") and (not out or out[-1] != ""):
        out.append("")
    norm = "/".join(out)
    if not norm.startswith("/"):
        norm = "/" + norm
    return norm


def canonicalize_url(url: str) -> str:
    """Return the canonical spelling of ``url``.

    - scheme and host lowercased; default port dropped
    - dot-segments resolved in the path; empty path becomes '/'
    - tracking params (utm_*, gclid, ...) removed
    - remaining query params sorted by (key, value); blanks kept
    - fragment dropped
    """
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    netloc = host
    port = parts.port
    if port is not None and port != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = _normalize_path(parts.path)
    q = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
         if not _is_tracking(k)]
    q.sort()
    return urlunsplit((scheme, netloc, path, urlencode(q), ""))
