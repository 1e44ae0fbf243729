"""Cross-run persisted seen-set (state/hash_index): build, delta
update, shard pruning, and incremental dedup semantics."""

import os

import pandas as pd
import pytest


def _docs(rows):
    import ray.data as rd

    return rd.from_items(rows).repartition(3)


def test_build_update_dedup_roundtrip(ray_session, tmp_path):
    from bb_ocr_ray.functions.hashing import md5_hex
    from bb_ocr_ray.state.hash_index import (build_hash_index,
                                             incremental_dedup,
                                             read_hash_index,
                                             update_hash_index)

    def row(i, text):
        return {"content_hash": md5_hex(text), "url": f"u{i:03d}",
                "text": text}

    run1 = [row(i, f"doc {i}") for i in range(10)]
    idx = str(tmp_path / "idx")
    build_hash_index(_docs(run1), idx, n_shards=8)
    assert sorted(read_hash_index(idx).to_pandas()["content_hash"]) == \
        sorted({r["content_hash"] for r in run1})

    # run 2: 5 previously-seen contents + 4 new (one duplicated twice
    # inside the batch -> first-per-hash winner is the min url)
    run2 = ([row(100 + i, f"doc {i}") for i in range(5)]
            + [row(200, "new A"), row(201, "new B"), row(202, "new C"),
               row(203, "new C"), row(199, "new C")])
    out = (incremental_dedup(_docs(run2), idx, order_col="url")
           .to_pandas().sort_values("content_hash").reset_index(drop=True))
    assert len(out) == 3                      # A, B, C — seen ones gone
    c_hash = run2[-1]["content_hash"]
    assert out.set_index("content_hash").loc[c_hash, "url"] == "u199"

    # persist run 2's survivors; a rerun of the same update is a no-op
    survivors = (incremental_dedup(_docs(run2), idx, order_col="url")
                 .materialize())
    delta = update_hash_index(survivors, idx, n_shards=8)
    assert delta is not None and os.path.isdir(delta)
    # the same batch again -> same content address -> skipped
    assert update_hash_index(survivors, idx, n_shards=8) is None
    # and a batch with nothing new (everything now ingested) is a skip
    assert update_hash_index(
        incremental_dedup(_docs(run2), idx, order_col="url"),
        idx, n_shards=8) is None

    # run 3 sees run-2 content as already ingested
    run3 = [row(300, "new A"), row(301, "brand new D")]
    out3 = incremental_dedup(_docs(run3), idx, order_col="url").to_pandas()
    assert list(out3["url"]) == ["u301"]


def test_incremental_dedup_carries_nested_columns(ray_session, tmp_path):
    """Rows with list<> payload columns (the lifecycle sink's
    categories/authors shapes) must survive first-per-key dedup AND
    the distributed anti-join intact: Ray's pandas block rebuild
    rejects nested columns, so both operators must keep such payloads
    on arrow blocks end-to-end."""
    import pyarrow as pa
    import ray.data as rd

    from bb_ocr_ray.functions.hashing import md5_hex
    from bb_ocr_ray.state.hash_index import (build_hash_index,
                                             incremental_dedup)

    def tbl(rows):
        return pa.table({
            "content_hash": pa.array([md5_hex(r[0]) for r in rows]),
            "url": pa.array([r[1] for r in rows]),
            "tags": pa.array([r[2] for r in rows],
                             pa.list_(pa.string())),
        })

    prior = rd.from_arrow(tbl([("a", "u1", ["x"]), ("b", "u2", [])]))
    idx = str(tmp_path / "idx")
    build_hash_index(prior, idx, n_shards=4)

    new = rd.from_arrow(tbl([
        ("a", "u3", ["seen"]),              # already indexed: dropped
        ("c", "u5", ["k", "l"]),            # dup pair: u4 wins
        ("c", "u4", ["keep", "me"]),
        ("d", "u6", []),
    ])).repartition(2)
    out = (incremental_dedup(new, idx, order_col="url")
           .to_pandas().sort_values("url").reset_index(drop=True))
    assert list(out["url"]) == ["u4", "u6"]
    assert list(out.loc[0, "tags"]) == ["keep", "me"]
    assert list(out.loc[1, "tags"]) == []


def test_build_is_atomic_and_rerunnable(ray_session, tmp_path):
    from bb_ocr_ray.functions.hashing import md5_hex
    from bb_ocr_ray.state.hash_index import build_hash_index, read_hash_index

    rows = [{"content_hash": md5_hex(f"x{i}"), "url": f"u{i}"}
            for i in range(20)]
    idx = str(tmp_path / "idx")
    build_hash_index(_docs(rows), idx, n_shards=4)
    first = sorted(read_hash_index(idx).to_pandas()["content_hash"])
    # rebuild over the same data converges to the same index, no
    # leftover temp dirs
    build_hash_index(_docs(rows), idx, n_shards=4)
    assert sorted(read_hash_index(idx).to_pandas()["content_hash"]) == first
    assert not [d for d in os.listdir(tmp_path) if ".tmp" in d]


def test_meta_refuses_shard_count_drift(ray_session, tmp_path):
    """An update or read with mismatched key / n_shards must refuse
    loudly: a delta at a different shard count lands keys in the wrong
    shard dirs and silently breaks pruned reads."""
    from bb_ocr_ray.functions.hashing import md5_hex
    from bb_ocr_ray.state.hash_index import (build_hash_index,
                                             read_hash_index,
                                             update_hash_index)

    rows = [{"content_hash": md5_hex(f"m{i}"), "url": f"u{i}"}
            for i in range(8)]
    idx = str(tmp_path / "idx")
    build_hash_index(_docs(rows), idx, n_shards=8)
    with pytest.raises(RuntimeError, match="drift"):
        update_hash_index(_docs(rows), idx, n_shards=16)
    with pytest.raises(RuntimeError, match="drift"):
        read_hash_index(idx, key="url")
    # matching parameters still work
    assert read_hash_index(idx).count() == 8


def test_shard_pruning_reads_only_named_shards(ray_session, tmp_path):
    from bb_ocr_ray.functions.hashing import md5_hex
    from bb_ocr_ray.state.hash_index import (build_hash_index,
                                             read_hash_index, shard_of)

    rows = [{"content_hash": md5_hex(f"k{i}"), "url": f"u{i}"}
            for i in range(64)]
    idx = str(tmp_path / "idx")
    build_hash_index(_docs(rows), idx, n_shards=4)
    hashes = pd.Series([r["content_hash"] for r in rows])
    shards = shard_of(hashes, 4)
    want = int(shards[0])
    got = read_hash_index(idx, shards=[want]).to_pandas()["content_hash"]
    expect = sorted(hashes[shards == want])
    assert sorted(got) == expect
    # pruning to a shard reads a strict subset
    assert len(got) < len(rows)
