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


def test_enrich_gpu_shaped_pool_loads_weights_once_per_actor(
        ray_session, tmp_path):
    """The GPU-pool spec (SURVEY §2.3 T5, VERDICT r4 item 4):
    concurrency=2 actors, many batches — the model constructor runs
    exactly twice (once per actor), generate runs once per row, and
    every row gets a digest.  num_gpus=0 stands in for the device
    claim offline.  The stand-in class is defined IN the test so
    cloudpickle ships it by value (a test-module-level class pickles
    by reference, which worker processes cannot import)."""
    import glob

    import ray.data as rd

    from bb_ocr_ray.stages.enrich import enrich

    marker_dir = str(tmp_path)

    class HeavyStandInModel:
        """CPU stand-in for a GPU model: a numpy 'embedder' whose
        weights build in __init__; marker files record constructor
        and generate calls."""

        def __init__(self, mdir: str):
            import os
            import uuid

            import numpy as np

            self.W = np.random.RandomState(0).rand(512, 64)
            self.marker_dir = mdir
            with open(os.path.join(
                    mdir, f"init-{os.getpid()}-{uuid.uuid4().hex}"),
                    "w"):
                pass

        def generate(self, model, prompt, images_b64=None,
                     timeout_seconds=None):
            import json
            import os
            import uuid

            import numpy as np

            with open(os.path.join(self.marker_dir,
                                   f"call-{uuid.uuid4().hex}"), "w"):
                pass
            v = np.frombuffer(prompt.encode()[:64].ljust(64, b"\0"),
                              dtype=np.uint8).astype(np.float64)
            score = float(v @ self.W[:64].mean(axis=1))
            return json.dumps(
                {"title": prompt[:10],
                 "digest": f"{int(score) & 0xffffffffffffffff:016x}"})

    n = 300
    ds = rd.from_items([{"doc_id": i, "text": f"document {i} body"}
                        for i in range(n)]).repartition(12)
    out = enrich(ds, concurrency=2, batch_size=25, num_gpus=0,
                 client_factory=lambda: HeavyStandInModel(marker_dir)
                 ).to_pandas()
    assert len(out) == n
    assert out["enrichment_digest"].notna().all()
    inits = glob.glob(f"{marker_dir}/init-*")
    calls = glob.glob(f"{marker_dir}/call-*")
    assert len(inits) == 2, inits      # once per actor, never per batch
    assert len(calls) == n             # one forward pass per row
    # and the two actors are distinct processes
    pids = {f.split("init-")[1].split("-")[0] for f in inits}
    assert len(pids) == 2


def test_enrich_gpu_spec_reaches_ray_remote_args(ray_session):
    """num_gpus / num_cpus flow into the map_batches operator spec
    (inspected without executing: the sandbox has no GPU to satisfy
    a real num_gpus=1 claim)."""
    import pandas as pd
    import ray.data as rd

    from bb_ocr_ray.stages.enrich import enrich

    ds = rd.from_pandas(pd.DataFrame({"text": ["a", "b"]}))
    out = enrich(ds, num_gpus=1, num_cpus=2, batch_size=8)
    args = out._logical_plan.dag._ray_remote_args
    assert args["num_gpus"] == 1
    assert args["num_cpus"] == 2
