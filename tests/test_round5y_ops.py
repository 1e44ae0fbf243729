"""Round-5 seventh-session capstone differential: the one-row dataset
card vs directly computed corpus facts, incl. planted prefix dups."""
import numpy as np
import pandas as pd


def test_dataset_card_matches_direct_facts(ray_session, tmp_path):
    pad = "p" * 70
    texts = [pad + " original", pad + " near copy",     # 1 prefix cluster
             "alpha beta gamma", "alpha beta", ""]
    langs = ["en", "en", "fr", "de", "en"]
    srcs = ["s1", "s2", "s1", "s3", "s1"]
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype="int64"),
                         "text": texts, "lang": langs, "source": srcs,
                         "n_chars": [len(t) for t in texts]})
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.to_parquet(sf / "documents.parquet", index=False)

    from bb_ocr_ray.pipelines.queries import q_dataset_card
    got = q_dataset_card(str(sf)).iloc[0]

    all_toks = [t.split() for t in texts]
    assert int(got["n_docs"]) == 5
    assert int(got["n_tokens"]) == sum(len(t) for t in all_toks)
    assert int(got["vocab"]) == len({w for t in all_toks for w in t})
    assert int(got["n_langs"]) == 3
    assert int(got["n_sources"]) == 3
    # 5 docs, 4 distinct 64-char prefixes -> dup share 1/5
    assert abs(got["prefix_dup_share"] - 0.2) < 1e-9
    want_mean = sum(len(t) for t in texts) / 5
    assert abs(got["mean_doc_chars"] - round(want_mean, 6)) < 1e-9
