"""PII detection + redaction over document text (training-data hygiene).

The reference has no PII handling; this is one of the standard
training-corpus preparation stages (alongside dedup / decontamination /
quality filtering) that a 100-TB pipeline needs before text reaches a
tokenizer.

Pattern-parity contract: every pattern uses EXPLICIT ASCII classes
(``[0-9]``, never ``\\d``) because Python ``re`` classes are
unicode-aware on str while the DuckDB oracle runs RE2, whose classes
are ASCII-only — ``\\d`` would silently diverge on e.g. Arabic-Indic
digits.  No lookarounds (RE2 has none), no word boundaries (RE2 ``\\b``
is ASCII while Python's is unicode — they disagree next to non-ASCII
letters).  The documented consequence: the IPv4 pattern also matches
dotted version strings ("release 1.2.3.4"); identical on both sides.

Redaction is SEQUENTIAL — emails first, then phones, then IPs — with
each category counted on the text as redacted so far, so a phone number
inside an email address is counted once (as the email).  The DuckDB
oracle mirrors the same three-stage cascade with
``regexp_extract_all`` + ``regexp_replace(..., 'g')``.
"""

from __future__ import annotations

import re

# Explicit ASCII classes only — see module docstring.
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
# International-prefix form only (+CC ...): requiring the leading '+'
# keeps dates/timestamps ("2024-01-01 01") out of the match set.
PHONE_PAT = r"\+[0-9][0-9]?[0-9]?[- ]?[0-9][0-9][0-9][- ]?[0-9][0-9][0-9][- ]?[0-9][0-9][0-9][0-9]"
IPV4_PAT = r"[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?\.[0-9][0-9]?[0-9]?"

# (compiled pattern, raw pattern for the SQL mirror, replacement token)
REDACTION_CASCADE = (
    (re.compile(EMAIL_PAT), EMAIL_PAT, "<EMAIL>"),
    (re.compile(PHONE_PAT), PHONE_PAT, "<PHONE>"),
    (re.compile(IPV4_PAT), IPV4_PAT, "<IP>"),
)


def redact_text(text: str) -> tuple[str, int, int, int]:
    """(clean_text, n_emails, n_phones, n_ips) for one document.

    Counts are per redaction stage: each count is the number of
    non-overlapping matches in the text AFTER the previous stages'
    replacements (leftmost, non-overlapping — ``re.sub`` semantics,
    identical to RE2's 'g' replace scan).
    """
    t = text or ""
    counts = []
    for pat, _, token in REDACTION_CASCADE:
        t, n = pat.subn(token, t)
        counts.append(n)
    return t, counts[0], counts[1], counts[2]
