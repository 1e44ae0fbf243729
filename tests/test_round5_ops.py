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


def test_scd2_hand_case(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bb_ocr_ray.pipelines.queries import q_scd2

    # user 1: view,view,click,view -> 3 runs; user 2: one open run;
    # NULL user drops
    ts = pd.to_datetime([
        "2026-01-01 00:00:00", "2026-01-01 00:10:00",
        "2026-01-01 00:20:00", "2026-01-01 00:30:00",
        "2026-01-01 01:00:00", "2026-01-01 01:30:00",
        "2026-01-01 02:00:00",
    ])
    events = pd.DataFrame({
        "event_id": np.arange(7, dtype="int64"),
        "ts": ts.astype("datetime64[us]"),
        "user_id": pd.array([1, 1, 1, 1, 2, 2, None], dtype="Int64"),
        "event_type": ["view", "view", "click", "view",
                       "buy", "buy", "view"],
        "value": np.ones(7), "props": ["{}"] * 7,
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                   sf / "events.parquet")

    out = q_scd2(str(sf))
    u1 = out[out["user_id"] == 1]
    assert list(u1["event_type"]) == ["view", "click", "view"]
    assert list(u1["n_events"]) == [2, 1, 1]
    # runs chain: each valid_to equals the next valid_from; last open
    assert list(u1["valid_to_us"].iloc[:2]) == list(
        u1["valid_from_us"].iloc[1:])
    assert np.isnan(u1["valid_to_us"].iloc[-1])
    u2 = out[out["user_id"] == 2]
    assert len(u2) == 1 and u2["n_events"].iloc[0] == 2
    assert np.isnan(u2["valid_to_us"].iloc[0])
    assert set(out["user_id"]) == {1, 2}


def _kcore_reference(edges: pd.DataFrame, k: int) -> pd.DataFrame:
    e = edges.copy()
    while True:
        deg = pd.concat([e["src"], e["dst"]]).value_counts()
        surv = set(deg[deg >= k].index)
        e2 = e[e["src"].isin(surv) & e["dst"].isin(surv)]
        if len(e2) == len(e):
            break
        e = e2
    deg = pd.concat([e["src"], e["dst"]]).value_counts()
    core = deg[deg >= k].sort_index()
    return pd.DataFrame({"node": core.index.to_numpy("int64"),
                         "deg": core.to_numpy("int64")})


@pytest.fixture(scope="module")
def random_graph():
    rng = np.random.RandomState(7)
    e = pd.DataFrame({"src": rng.randint(0, 120, 600),
                      "dst": rng.randint(0, 120, 600)})
    e = e[e["src"] < e["dst"]].drop_duplicates()  # canonical, no loops
    return e.reset_index(drop=True).astype("int64")


def test_kcore_fixpoint_matches_pandas(ray_session, random_graph):
    import ray.data as rd

    from bb_ocr_ray.stages.graph import kcore

    got = (kcore(rd.from_pandas(random_graph).repartition(8),
                 k=3, rounds=None)
           .to_pandas().sort_values("node").reset_index(drop=True)
           .astype("int64"))
    want = _kcore_reference(random_graph, 3)
    pd.testing.assert_frame_equal(got, want)


def test_kcore_forced_hash_path_equal(ray_session, random_graph):
    import ray.data as rd

    from bb_ocr_ray.stages.graph import kcore

    ds = rd.from_pandas(random_graph).repartition(8)
    choices = []
    bcast = (kcore(ds, k=3, rounds=4, _on_choice=choices.append)
             .to_pandas().sort_values("node").reset_index(drop=True))
    hashp = (kcore(ds, k=3, rounds=4, broadcast_limit=0,
                   _on_choice=choices.append)
             .to_pandas().sort_values("node").reset_index(drop=True))
    assert choices == ["broadcast", "hash"]
    pd.testing.assert_frame_equal(bcast.astype("int64"),
                                  hashp.astype("int64"))


def test_kcore_empty_core(ray_session):
    import ray.data as rd

    from bb_ocr_ray.stages.graph import kcore

    # a path graph has max degree 2: its 3-core is empty
    chain = pd.DataFrame({"src": np.arange(20, dtype="int64"),
                          "dst": np.arange(1, 21, dtype="int64")})
    got = kcore(rd.from_pandas(chain), k=3, rounds=None).to_pandas()
    assert len(got) == 0
