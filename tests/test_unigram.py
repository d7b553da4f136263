"""Unigram-LM subword tokenizer (ops/unigram.py)."""

import itertools
import math

import numpy as np
import pandas as pd

import ray.data as rd

from medcat_ray.ops.unigram import (piece_logprobs, seed_piece_counts,
                                    top_pieces, unigram_learn,
                                    unigram_word_scores, viterbi)

DOCS = ["the cat sat on the mat", "the cats sat", "a mat on a cat",
        "concatenate the catalog", "sat sat sat the the"]


def _hist_df():
    from collections import Counter
    import re
    c = Counter()
    for t in DOCS:
        c.update(re.findall(r"[a-z0-9]+", t.lower()))
    return pd.DataFrame({"word": list(c.keys()),
                         "freq": [int(v) for v in c.values()]})


def _brute_best(word, lp, max_len):
    """All segmentations by cut-point powerset — max total log-prob."""
    n = len(word)
    best = None
    for bits in itertools.product([0, 1], repeat=n - 1):
        cuts = [0] + [i + 1 for i, b in enumerate(bits) if b] + [n]
        ps = [word[a:b] for a, b in zip(cuts, cuts[1:])]
        if any(len(p) > max_len or p not in lp for p in ps):
            continue
        s = sum(lp[p] for p in ps)
        if best is None or s > best:
            best = s
    return best


def test_viterbi_hand_case():
    lp = {"a": math.log(0.3), "b": math.log(0.2), "ab": math.log(0.4),
          "ba": math.log(0.1)}
    s, path = viterbi("abab", lp, max_piece_len=2)
    # ab|ab beats any char split: 2*ln(.4) > ln(.3)+ln(.2)+ln(.4) etc.
    assert path == ["ab", "ab"]
    assert abs(s - 2 * math.log(0.4)) < 1e-12
    assert _brute_best("abab", lp, 2) == s


def test_seed_topk_and_scores_match_brute(ray_session):
    hist = rd.from_pandas(_hist_df()).repartition(3)
    pieces = top_pieces(seed_piece_counts(hist, 3).materialize(), k=20)
    # every single char survives, and counts are occurrence-weighted
    chars = set("".join(_hist_df()["word"]))
    assert chars <= set(pieces["piece"])
    lp = piece_logprobs(pieces)
    got = unigram_word_scores(hist, pieces, max_piece_len=3).to_pandas()
    for w, s in zip(got["word"], got["score"]):
        assert abs(s - _brute_best(w, lp, 3)) < 1e-9, w


def test_seed_counts_exact(ray_session):
    hist = rd.from_pandas(pd.DataFrame(
        {"word": ["aba"], "freq": [2]}))
    got = dict(seed_piece_counts(hist, 2).to_pandas()
               .itertuples(index=False))
    # occurrences in 'aba' (freq 2): a×2, b×1, ab×1, ba×1
    assert got == {"a": 4, "b": 2, "ab": 2, "ba": 2}


def test_unigram_learn_invariants(ray_session):
    ds = rd.from_items([{"text": t} for t in DOCS]).repartition(2)
    v1 = unigram_learn(ds, vocab_size=24, n_iter=2, seed_size=40,
                       max_piece_len=3)
    v2 = unigram_learn(ds, vocab_size=24, n_iter=2, seed_size=40,
                       max_piece_len=3)
    pd.testing.assert_frame_equal(v1, v2)          # deterministic
    chars = set("".join(_hist_df()["word"]))
    assert chars <= set(v1["piece"])               # segmentability
    assert (v1["cnt"] >= 1).all()
    # lp is a normalized distribution over the final vocabulary
    assert abs(np.exp(v1["lp"]).sum() - 1.0) < 1e-9
    # frequent multi-char pieces won: 'the'/'at'-family present
    assert any(len(p) > 1 for p in v1["piece"])
    lp = dict(zip(v1["piece"], v1["lp"]))
    s, path = viterbi("thecat", lp, 3)
    assert "".join(path) == "thecat"
