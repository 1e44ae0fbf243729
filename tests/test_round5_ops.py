"""Round-5 second-session operator differentials: CDC changelog merge
(latest-wins + tombstones vs a pandas reference), SCD2
intervalization, and the fixed-round k-core peel."""
import numpy as np
import pandas as pd
import pytest


def _cdc_reference(log: pd.DataFrame) -> pd.DataFrame:
    counts = log.groupby("k").size()
    w = (log.sort_values(["k", "rev"], kind="mergesort")
         .drop_duplicates(subset=["k"], keep="last"))
    w = w.assign(n_versions=w["k"].map(counts).astype("int64"))
    return (w[w["op"] != "D"].sort_values("k")
            .reset_index(drop=True))


@pytest.fixture(scope="module")
def changelog():
    rng = np.random.RandomState(11)
    rows = []
    for k in range(300):
        n_rev = rng.randint(1, 6)
        for rev in range(n_rev):
            # ~15% of final revisions are tombstones
            op = ("D" if rev == n_rev - 1 and rng.rand() < 0.15
                  else ("I" if rev == 0 else "U"))
            rows.append((f"key-{k}", rev, op, f"v{k}.{rev}"))
    rng.shuffle(rows)
    return pd.DataFrame(rows, columns=["k", "rev", "op", "payload"])


def test_merge_changelog_matches_pandas(ray_session, changelog):
    import ray.data as rd

    from bb_ocr_ray.stages.cdc import merge_changelog

    # many small blocks so combiner candidates genuinely meet in the
    # fold from different blocks, and several coarse buckets
    ds = rd.from_pandas(changelog).repartition(16)
    got = (merge_changelog(ds, key="k", order_col="rev",
                           coarse_buckets=5)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = _cdc_reference(changelog)
    pd.testing.assert_frame_equal(
        got[["k", "rev", "op", "payload", "n_versions"]],
        want[["k", "rev", "op", "payload", "n_versions"]])


def test_merge_changelog_tombstone_edge_cases(ray_session):
    import ray.data as rd

    from bb_ocr_ray.stages.cdc import merge_changelog

    log = pd.DataFrame({
        "k": ["a", "a", "b", "c", "c", "c"],
        "rev": [0, 1, 0, 0, 1, 2],
        "op": ["I", "D", "I", "I", "D", "U"],  # c: delete then re-insert
        "payload": ["a0", None, "b0", "c0", None, "c2"],
    })
    got = (merge_changelog(rd.from_pandas(log).repartition(3),
                           key="k", order_col="rev", coarse_buckets=2)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # a: tombstone wins -> gone; b: plain insert; c: update after the
    # delete resurrects the key with all 3 log rows counted
    assert list(got["k"]) == ["b", "c"]
    assert list(got["payload"]) == ["b0", "c2"]
    assert list(got["n_versions"]) == [1, 3]
