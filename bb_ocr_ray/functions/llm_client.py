"""LLM backend plugin surface (SURVEY.md §2.10, VERDICT r2 item 8).

The reference exposes a pluggable client ABC —
``pipeline_demo/llm_providers/client.py:19-24`` defines
``LLMClient.generate(model, prompt, images_b64, timeout_seconds)`` and
``:164-171`` the ``create_llm_client(backend)`` factory — so any
backend (Ollama, hosted API, fake) slots into the same extraction
lifecycle.  This module completes that extension surface for the Ray
engine:

* ``LLMClient`` — the ABC; implementors provide ``generate`` returning
  the raw model text (possibly fenced/dirty JSON; the caller repairs
  it with ``functions.jsonrepair`` exactly as the reference parses
  model output, M10).
* ``DeterministicFakeClient`` — the offline backend: echoes a JSON
  object derived purely from the prompt (stable hash + the numbered
  context sections), so pipelines exercise the full
  prompt→generate→repair→validate path with reproducible results and
  no network.  This is the stand-in the stub providers play in the
  reference (``providers/amazon_stub.py``).
* ``register_backend`` / ``create_llm_client`` — the factory.  New
  backends register a zero-arg constructor under a name; unknown
  names fail with the known list (mirrors the reference's
  backend/model compatibility gate, M15).

No network exists in this environment, so no HTTP backend ships; the
seam is the point — a real backend is one ``register_backend`` call.
"""

from __future__ import annotations

import abc
import json

from bb_ocr_ray.functions.hashing import stable_u64


class LLMClient(abc.ABC):
    """Backend contract: one text-in/text-out call per document."""

    @abc.abstractmethod
    def generate(self, model: str, prompt: str, images_b64=None,
                 timeout_seconds: float | None = None) -> str:
        """Return the raw model response text for ``prompt``."""


class DeterministicFakeClient(LLMClient):
    """Offline backend with reproducible output.

    The response is a fenced JSON object (fenced ON PURPOSE: it forces
    callers through the robust repair path) whose fields derive only
    from the prompt text: title = first context line, a stable 16-hex
    digest, and the context-section count.  Same prompt → same bytes,
    across processes and runs."""

    def generate(self, model: str, prompt: str, images_b64=None,
                 timeout_seconds: float | None = None) -> str:
        lines = [ln for ln in prompt.splitlines() if ln.strip()]
        ctx_headers = [ln for ln in lines if ln.startswith("[context ")]
        title = None
        for i, ln in enumerate(lines):
            if ln.startswith("[context ") and i + 1 < len(lines):
                title = lines[i + 1][:80]
                break
        body = {
            "title": title,
            "model": model,
            "n_contexts": len(ctx_headers),
            "digest": f"{stable_u64(prompt):016x}",
        }
        return "```json\n" + json.dumps(body, sort_keys=True) + "\n```"


class FlakyFakeClient(DeterministicFakeClient):
    """Chaos backend for exercising the retry path offline (no state
    shared across actor processes, so failure injection is driven by
    MARKERS in the prompt itself, which travel with the row):

    * ``[[fail_always]]`` in the prompt — every attempt raises.
    * ``[[fail_n:K]]`` — the first K attempts for this prompt raise,
      the (K+1)-th succeeds (per-instance attempt counter: retries
      happen inside one actor, so instance state is correct).
    * otherwise — behaves exactly like DeterministicFakeClient.
    """

    def __init__(self):
        self._attempts: dict = {}

    def generate(self, model: str, prompt: str, images_b64=None,
                 timeout_seconds: float | None = None) -> str:
        if "[[fail_always]]" in prompt:
            raise ConnectionError("injected permanent failure")
        marker = "[[fail_n:"
        pos = prompt.find(marker)
        if pos >= 0:
            k = int(prompt[pos + len(marker):prompt.index("]]", pos)])
            seen = self._attempts.get(prompt, 0)
            self._attempts[prompt] = seen + 1
            if seen < k:
                raise TimeoutError(
                    f"injected transient failure {seen + 1}/{k}")
        return super().generate(model, prompt, images_b64,
                                timeout_seconds)


class RetryingClient:
    """Retry/backoff/error-as-data wrapper around any ``LLMClient``
    (reference ``enhanced_extractor.py:843-864``: 3 attempts, LINEAR
    backoff, failures recorded as data — the pipeline never raises).

    Not an ``LLMClient`` itself: ``generate_with_retry`` returns
    ``(text | None, error | None, attempts)`` so callers can put the
    transport error in a column (M11 dead-letter semantics) instead of
    catching exceptions per row.  ``sleep`` is injectable for tests.
    """

    def __init__(self, inner: LLMClient, max_attempts: int = 3,
                 backoff_seconds: float = 1.0, sleep=None):
        import time

        self.inner = inner
        self.max_attempts = max(1, int(max_attempts))
        self.backoff_seconds = backoff_seconds
        self.sleep = sleep if sleep is not None else time.sleep

    def generate_with_retry(self, model: str, prompt: str, images_b64=None,
                            timeout_seconds: float | None = None):
        last_err = None
        for attempt in range(1, self.max_attempts + 1):
            try:
                text = self.inner.generate(model, prompt, images_b64,
                                           timeout_seconds)
                return text, None, attempt
            except Exception as exc:  # noqa: BLE001 — error-as-data seam
                last_err = f"{type(exc).__name__}: {exc}"
                if attempt < self.max_attempts:
                    # linear backoff: 1x, 2x, ... (reference's ladder)
                    self.sleep(self.backoff_seconds * attempt)
        return (None, f"{last_err} ({self.max_attempts} attempts)",
                self.max_attempts)


_BACKENDS: dict = {"fake": DeterministicFakeClient,
                   "flaky": FlakyFakeClient}


def register_backend(name: str, factory) -> None:
    """Register a zero-arg ``LLMClient`` constructor under ``name``."""
    _BACKENDS[name] = factory


def create_llm_client(backend: str) -> LLMClient:
    """Factory (reference ``client.py:164-171``): instantiate the named
    backend or fail listing the known ones."""
    try:
        factory = _BACKENDS[backend]
    except KeyError:
        raise ValueError(
            f"unknown LLM backend {backend!r}; known: "
            f"{sorted(_BACKENDS)}") from None
    return factory()
