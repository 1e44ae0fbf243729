"""Round-5 seventh-session batch-M differentials: script-mix counts vs
per-char classification (unicode), and the dup-flow provenance matrix
vs explicit first-wins cluster logic."""
import hashlib

import numpy as np
import pandas as pd


def _write(tmp_path, **tables):
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    for name, df in tables.items():
        df.to_parquet(sf / f"{name}.parquet", index=False)
    return str(sf)


# --------------------------------------------------------------- script mix
def test_script_mix_matches_per_char(ray_session, tmp_path):
    texts = ["Hello World 123", "你好世界 abc", "a\tb\nc!", "", "¡café!"]
    langs = ["en", "zh", "en", "de", "es"]
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                         "text": texts, "lang": langs, "source": "s",
                         "n_chars": [len(t) for t in texts]})
    sf = _write(tmp_path, documents=docs)

    from bb_ocr_ray.pipelines.queries import q_script_mix
    got = q_script_mix(sf).set_index("lang")

    want: dict = {}
    for t, lang in zip(texts, langs):
        acc = want.setdefault(lang, [0, 0, 0, 0, 0])
        for ch in t:
            o = ord(ch)
            if (65 <= o <= 90) or (97 <= o <= 122):
                acc[0] += 1
            elif 48 <= o <= 57:
                acc[1] += 1
            elif o in (32, 9, 10, 13, 12, 11):
                acc[2] += 1
            elif 0x4E00 <= o <= 0x9FFF:
                acc[3] += 1
            else:
                acc[4] += 1
    for lang, (lat, dig, ws, cjk, oth) in want.items():
        r = got.loc[lang]
        assert (int(r["n_latin"]), int(r["n_digit"]), int(r["n_ws"]),
                int(r["n_cjk"]), int(r["n_other"])) == \
            (lat, dig, ws, cjk, oth), lang
    # the accents in '¡café!' land in n_other, not latin
    assert int(got.loc["es", "n_other"]) == 3     # ¡ é !


# ----------------------------------------------------------------- dup flow
def test_dup_flow_first_wins_matrix(ray_session, tmp_path):
    pad = "x" * 70                                 # >64 chars shared prefix
    texts = [pad + " original", pad + " copy one", pad + " copy two",
             "unique " + "y" * 70,
             "другой " + "z" * 70, "другой " + "z" * 70 + " v2"]
    srcs = ["src_a", "src_b", "src_a", "src_c", "src_b", "src_c"]
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                         "text": texts, "lang": "en", "source": srcs,
                         "n_chars": [len(t) for t in texts]})
    sf = _write(tmp_path, documents=docs)

    from bb_ocr_ray.pipelines.queries import q_dup_flow
    got = q_dup_flow(sf)

    # independent first-wins walk on the 64-char-prefix key
    first: dict = {}
    from collections import Counter
    want: Counter = Counter()
    for did, (t, s) in enumerate(zip(texts, srcs)):
        h = hashlib.md5(t[:64].encode()).hexdigest()
        if h not in first:
            first[h] = s
        else:
            want[(first[h], s)] += 1
    assert {(r["src_first"], r["src_dup"]): r["n"]
            for _, r in got.iterrows()} == dict(want)
    # cluster 1: first=src_a, dups src_b + src_a(self-source dup)
    assert want[("src_a", "src_b")] == 1
    assert want[("src_a", "src_a")] == 1
    # the unique doc contributes nothing
    assert sum(want.values()) == 3


def test_dup_flow_empty_when_all_unique(ray_session, tmp_path):
    texts = [f"doc {i} " + "q" * i for i in range(10)]
    docs = pd.DataFrame({"doc_id": np.arange(10, dtype="int64"),
                         "text": texts, "lang": "en", "source": "s",
                         "n_chars": [len(t) for t in texts]})
    sf = _write(tmp_path, documents=docs)

    from bb_ocr_ray.pipelines.queries import q_dup_flow
    got = q_dup_flow(sf)
    assert len(got) == 0
    assert list(got.columns) == ["src_first", "src_dup", "n"]
