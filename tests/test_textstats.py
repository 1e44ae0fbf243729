"""Text-analysis function tests: tokens, quality, lang-ID, hashing."""

import numpy as np
import pandas as pd

from bb_ocr_ray.functions.hashing import (
    hamming64,
    jaccard_tokens,
    md5_hex,
    minhash_bands,
    minhash_signature,
    rolling_fingerprint,
    simhash,
    stable_u64,
)
from bb_ocr_ray.functions.textstats import (
    bpe_ish_token_count,
    detect_lang,
    n_tokens_series,
    quality_features,
    stop_token_counts,
)


def test_n_tokens_formula():
    s = pd.Series(["a b c", "single", "x y"])
    assert n_tokens_series(s).tolist() == [3, 1, 2]


def test_stop_tokens():
    s = pd.Series(["the cat and the dog", "no stops here"])
    assert stop_token_counts(s).tolist() == [3, 0]


def test_quality_features_shapes():
    f = quality_features(pd.Series(["Hello, world! the end.", ""]))
    assert f.loc[0, "n_punct"] == 3
    assert f.loc[0, "n_stop_tokens"] == 1
    assert f.loc[1, "n_chars"] == 0


def test_detect_lang_heuristics():
    assert detect_lang("the quick brown fox jumping over the lazy dog of spring") == "en"
    assert detect_lang("der schnelle braune fuchs springt über den faulen hund und die katze") == "de"
    assert detect_lang("这是一个中文句子这是一个中文句子这是一个中文句子") == "zh"
    assert detect_lang("") == "und"


def test_bpe_ish_counts_monotone():
    s = pd.Series(["hello world", "hello world hello world"])
    c = bpe_ish_token_count(s)
    assert c.iloc[1] > c.iloc[0] > 0


def test_hashes_deterministic_across_calls():
    assert md5_hex("abc") == "900150983cd24fb0d6963f7d28e17f72"
    assert stable_u64("abc") == stable_u64("abc")
    assert rolling_fingerprint("hello") == rolling_fingerprint("hello")
    assert rolling_fingerprint("hello") != rolling_fingerprint("hellp")


def test_minhash_similarity_tracks_jaccard():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox jumps over the lazy cat " * 5   # near-dup
    c = "completely different words entirely unrelated content here now"
    sa, sb, sc = (minhash_signature(t) for t in (a, b, c))
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    # true shingle Jaccard(a,b) = 0.5 (repetition collapses the sets);
    # the signature estimate must track it and separate from unrelated
    assert sim_ab > 0.35
    assert sim_ac < 0.1


def test_minhash_bands_collide_for_near_dups():
    a = "the quick brown fox jumps over the lazy dog and runs far away today"
    bands_a = dict(minhash_bands(minhash_signature(a)))
    bands_a2 = dict(minhash_bands(minhash_signature(a)))
    assert bands_a == bands_a2


def test_simhash_hamming_small_for_near_dups():
    a = "the quick brown fox jumps over the lazy dog " * 10
    b = a + "extra tail words here"
    c = "totally different document about databases and query engines"
    assert hamming64(simhash(a), simhash(b)) < hamming64(simhash(a), simhash(c))


def test_jaccard_integer_pair():
    inter, union = jaccard_tokens({"a", "b", "c"}, {"b", "c", "d"})
    assert (inter, union) == (2, 4)


def test_simhash_empty():
    assert simhash("") == 0
    assert minhash_signature("").max() == np.iinfo(np.uint64).max


def test_nb_classify_beats_chance_and_is_deterministic(ray_session, sf_tiny):
    """The NB classifier must beat 5-class chance on held-out lang
    (the synthetic corpus is only weakly separable — majority-class
    level is expected, random level is a bug), score every
    doc_id%5==0 doc with tokens, and be run-to-run identical."""
    import pandas as pd

    from bb_ocr_ray.pipelines.queries import q_nb_classify

    out = q_nb_classify(sf_tiny)
    assert (out["doc_id"] % 5 == 0).all()
    assert set(out["pred"]) <= set(out["lang"]) | {"<null>"}
    acc = (out["lang"] == out["pred"]).mean()
    assert acc > 0.25, f"accuracy {acc:.2f} at chance level"
    out2 = q_nb_classify(sf_tiny)
    pd.testing.assert_frame_equal(out, out2)
