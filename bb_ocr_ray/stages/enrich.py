"""Enrichment-model stage: the lifecycle slot where the reference calls
its LLM (``enhanced_extractor.py:843-864``: prompt → model → JSON
repair → metadata), re-expressed as an actor-pool ``map_batches``.

The backend is pluggable through ``functions.llm_client`` (the §2.10
extension surface); the client is built ONCE per actor in ``__init__``
(the T1 per-worker-state rule — a real backend holds an HTTP session
or loaded weights there).  Model output flows through the same robust
JSON repair as the reference (M10): parse failures become error-as-data
columns, never exceptions (M11)."""

from __future__ import annotations

import pandas as pd

from bb_ocr_ray.functions.jsonrepair import repair_json
from bb_ocr_ray.functions.templates import assemble_prompt


class EnrichStage:
    """Stateful enrichment worker (one LLM client per actor-pool slot)."""

    def __init__(self, backend: str = "fake", model: str = "fake-model"):
        from bb_ocr_ray.functions.llm_client import create_llm_client

        self.client = create_llm_client(backend)
        self.model = model

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        titles, digests, errors = [], [], []
        for text in batch["text"]:
            prompt = assemble_prompt([(text or "")[:300]])
            raw = self.client.generate(self.model, prompt)
            obj, err = repair_json(raw)
            if obj is None:
                titles.append(None)
                digests.append(None)
                errors.append(err)
            else:
                titles.append(obj.get("title"))
                digests.append(obj.get("digest"))
                errors.append(None)
        out = batch.copy()
        out["enriched_title"] = pd.Series(titles, dtype="object").values
        out["enrichment_digest"] = pd.Series(digests, dtype="object").values
        out["enrich_error"] = pd.Series(errors, dtype="object").values
        return out


def enrich(ds, backend: str = "fake", model: str = "fake-model",
           concurrency: int = 2, batch_size: int = 256):
    """Actor-pool enrichment over the extracted stream."""
    return ds.map_batches(
        EnrichStage,
        fn_constructor_kwargs={"backend": backend, "model": model},
        concurrency=concurrency,
        batch_size=batch_size,
        batch_format="pandas",
    )
