"""Prompt/template assembly (SURVEY.md M8).

The reference builds an LLM prompt from an external template file plus
numbered OCR-context sections (``enhanced_extractor.py:563-586``;
template ``pipeline_demo/extractor/prompts/enhanced_book_metadata_prompt.txt``).
No LLM runs offline, but the assembly is a real, testable transform the
enrichment stage would use: deterministic section numbering, length
capping per section (M6 analog: 330-char OCR context cap), and a
``{context}`` placeholder substitution.
"""

from __future__ import annotations

DEFAULT_TEMPLATE = (
    "Extract structured metadata from the following page contexts.\n"
    "Respond with a single JSON object.\n\n{context}\n"
)


def assemble_prompt(sections: list, template: str = DEFAULT_TEMPLATE,
                    max_chars_per_section: int = 330) -> str:
    """Join numbered sections (capped per section) into the template.

    Sections longer than the cap are DROPPED, not truncated — the
    reference's behavior for over-long OCR text (M6,
    ``enhanced_extractor.py:688-704``).
    """
    kept = [s for s in sections if len(s) <= max_chars_per_section]
    numbered = "\n".join(
        f"[context {i + 1}]\n{s}" for i, s in enumerate(kept)
    )
    return template.format(context=numbered)
