"""Unit tests for ops/lm.py (bigram LM perplexity scoring)."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from medcat_ray.ops.lm import add_lm_score, train_bigram_lm


def _ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_counts_and_score_by_hand(ray_session):
    # corpus: "a b a b" and "b c" -> uni: a:2 b:3 c:1 (V=3)
    # bigrams: (a,b):2 (b,a):1 (b,c):1
    texts = ["a b a b", "b c"]
    lm = train_bigram_lm(_ds(texts), alpha=0.1)
    assert lm.v == 3
    assert lm.vocab == {"a": 0, "b": 1, "c": 2}
    assert lm.uni_counts.tolist() == [2, 3, 1]
    out = add_lm_score(_ds(texts), lm).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    a = 0.1
    den_a, den_b = 2 + a * 4, 3 + a * 4
    lp0 = (math.log((2 + a) / den_a) + math.log((1 + a) / den_b)
           + math.log((2 + a) / den_a))
    lp1 = math.log((1 + a) / den_b)
    assert np.allclose(out.log_prob.tolist(), [lp0, lp1])
    assert out.n_bigrams.tolist() == [3, 1]
    assert np.allclose(out.ppl.tolist(),
                       [math.exp(-lp0 / 3), math.exp(-lp1)])


def test_short_and_empty_docs(ray_session):
    lm = train_bigram_lm(_ds(["x y"]), alpha=0.1)
    out = add_lm_score(_ds(["", "solo", None, "x y"]), lm).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.log_prob.tolist()[:3] == [0.0, 0.0, 0.0]
    assert out.ppl.tolist()[:3] == [1.0, 1.0, 1.0]
    assert out.n_bigrams.tolist() == [0, 0, 0, 1]


def test_unseen_bigram_smoothed(ray_session):
    lm = train_bigram_lm(_ds(["a b", "b a"]), alpha=0.1)
    # "a a" never seen: numerator alpha only
    out = add_lm_score(_ds(["a a"]), lm).to_pandas()
    a = 0.1
    want = math.log(a / (2 + a * 3))
    assert np.allclose(out.log_prob.tolist(), [want])


def test_max_vocab_prunes_to_unk(ray_session):
    # c is rarest -> pruned at max_vocab=2; OOV hits unk id with 0 count
    lm = train_bigram_lm(_ds(["a a a b b c"]), alpha=0.1, max_vocab=2)
    assert set(lm.vocab) == {"a", "b"}
    out = add_lm_score(_ds(["b c"]), lm).to_pandas()
    a = 0.1
    want = math.log(a / (2 + a * 3))   # C(b)=2, V=2
    assert np.allclose(out.log_prob.tolist(), [want])


def test_min_bigram_count_prunes(ray_session):
    lm = train_bigram_lm(_ds(["a b a b", "b c"]), alpha=0.1,
                         min_bigram_count=2)
    # only (a,b) with count 2 survives
    assert len(lm.big_keys) == 1
    assert lm.big_counts.tolist() == [2]
