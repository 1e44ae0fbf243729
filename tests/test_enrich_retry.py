"""Retry/backoff/error-as-data wrapper for the enrichment client
(VERDICT r3 item 5; reference behavior: enhanced_extractor.py:843-864
— 3 attempts, linear backoff, failures recorded, never raised)."""

import pandas as pd


def test_retrying_client_gives_up_after_max_attempts():
    from bb_ocr_ray.functions.llm_client import (FlakyFakeClient,
                                                 RetryingClient)

    sleeps = []
    rc = RetryingClient(FlakyFakeClient(), max_attempts=3,
                        backoff_seconds=0.5, sleep=sleeps.append)
    text, err, attempts = rc.generate_with_retry(
        "m", "[[fail_always]] doomed prompt")
    assert text is None
    assert attempts == 3
    assert "ConnectionError" in err and "(3 attempts)" in err
    # linear ladder: 1x, 2x — and no sleep after the final attempt
    assert sleeps == [0.5, 1.0]


def test_retrying_client_recovers_on_transient_failure():
    from bb_ocr_ray.functions.llm_client import (DeterministicFakeClient,
                                                 FlakyFakeClient,
                                                 RetryingClient)

    sleeps = []
    rc = RetryingClient(FlakyFakeClient(), max_attempts=3,
                        backoff_seconds=0.1, sleep=sleeps.append)
    prompt = "[[fail_n:2]] eventually fine"
    text, err, attempts = rc.generate_with_retry("m", prompt)
    assert err is None and attempts == 3
    # the recovered response is byte-identical to the healthy backend
    assert text == DeterministicFakeClient().generate("m", prompt)
    assert sleeps == [0.1, 0.2]

    # a healthy call costs exactly one attempt and zero sleeps
    sleeps.clear()
    text2, err2, attempts2 = rc.generate_with_retry("m", "clean prompt")
    assert err2 is None and attempts2 == 1 and sleeps == []
    assert text2 == DeterministicFakeClient().generate("m", "clean prompt")


def test_enrich_stage_records_errors_as_data(ray_session):
    """A batch mixing healthy, transient-failing, and always-failing rows
    flows through the actor-pool stage with no exception, one row out
    per row in, and per-row error/attempts columns."""
    import ray.data as rd

    from bb_ocr_ray.stages.enrich import enrich

    rows = [
        {"doc_id": 0, "text": "plain healthy document text"},
        {"doc_id": 1, "text": "[[fail_n:2]] transient then fine"},
        {"doc_id": 2, "text": "[[fail_always]] permanently broken"},
        {"doc_id": 3, "text": ""},
    ]
    out = (enrich(rd.from_items(rows), backend="flaky",
                  concurrency=1, backoff_seconds=0.0)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 4
    assert out.loc[0, "enrich_error"] is None
    assert out.loc[0, "enrich_attempts"] == 1
    assert out.loc[1, "enrich_error"] is None
    assert out.loc[1, "enrich_attempts"] == 3
    assert out.loc[1, "enrichment_digest"] is not None
    assert "ConnectionError" in out.loc[2, "enrich_error"]
    assert out.loc[2, "enrich_attempts"] == 3
    assert out.loc[2, "enriched_title"] is None
    assert out.loc[3, "enrich_error"] is None   # empty text still enriches


def test_enrich_stage_determinism_with_retries(ray_session):
    """Retried rows produce the SAME digest as an untouched backend
    would — the retry wrapper must not perturb payload semantics."""
    import ray.data as rd

    from bb_ocr_ray.stages.enrich import enrich

    rows = [{"doc_id": i, "text": f"[[fail_n:1]] document {i}"}
            for i in range(6)]
    a = (enrich(rd.from_items(rows), backend="flaky", concurrency=1,
                backoff_seconds=0.0).to_pandas()
         .sort_values("doc_id")["enrichment_digest"].tolist())
    b = (enrich(rd.from_items(rows), backend="fake", concurrency=1)
         .to_pandas().sort_values("doc_id")["enrichment_digest"].tolist())
    assert a == b
