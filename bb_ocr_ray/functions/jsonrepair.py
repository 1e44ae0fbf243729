"""Robust JSON repair — the reference's LLM-response parser (M10).

Semantics rebuilt from ``enhanced_extractor.py:891-921``:
  1. strip markdown code fences (```json ... ```);
  2. slice from the first '{' to the last '}' (tolerate prose around);
  3. replace un-filled template placeholders with null;
  4. json.loads; on failure return (None, error) — error-as-data,
     feeding the fallback-record path (M11), never an exception.
"""

from __future__ import annotations

import json
import re

_FENCE_RE = re.compile(r"```(?:json)?\s*|\s*```", re.I)
# Template placeholders an LLM may leave verbatim.  The reference's own
# stub set (enhanced_extractor.py:906-913, matching the prompt template)
# is bracket-free quoted strings plus one array stub; angle-bracket
# variants are kept but the unquoted form is restricted to VALUE
# position so markup inside legitimate string values is never touched.
_ARRAY_STUB_RE = re.compile(r'\[\s*"string"\s*,\s*"\.\.\."\s*\]\s*\|\s*\[\s*\]')
_QUOTED_STUB_RE = re.compile(
    r'"(?:string|integer|float|YYYY|number|boolean)\s*\|\s*null"'
    r'|"<[^">]{1,40}>"'
)
_VALUE_POS_STUB_RE = re.compile(r'(?<=[:,])(\s*)<[a-zA-Z|_ ]{1,40}>')


def repair_json(raw: str) -> tuple:
    """Return (obj | None, error | None)."""
    if not raw or not raw.strip():
        return None, "empty response"
    s = _FENCE_RE.sub("", raw)
    start, end = s.find("{"), s.rfind("}")
    if start == -1 or end == -1 or end <= start:
        return None, "no JSON object found"
    s = s[start:end + 1]
    s = _ARRAY_STUB_RE.sub("[]", s)
    s = _QUOTED_STUB_RE.sub("null", s)
    s = _VALUE_POS_STUB_RE.sub(r"\1null", s)
    try:
        return json.loads(s), None
    except json.JSONDecodeError as exc:
        return None, f"JSONDecodeError: {exc}"
