"""Unit tests for ops/decontam.py (benchmark n-gram decontamination)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from medcat_ray.ops.decontam import (benchmark_gram_set, doc_gram_hashes,
                                     flag_contamination)
from medcat_ray.ops.hashing import poly_hashes


def _ref_grams(text, n=8):
    toks = (text or "").lower().split()
    if not toks:
        return np.array([], dtype=np.uint64)
    gs = ([" ".join(toks)] if len(toks) < n else
          [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)])
    return np.unique(poly_hashes(gs))


def test_gram_hashes_match_direct_poly():
    """The prefix-polynomial span hasher equals poly_hashes applied to
    each gram string, across token-count regimes and unicode."""
    import random
    rng = random.Random(7)
    words = ["alpha", "beta", "Gamma", "δέλτα", "e", "ffffff", "g1",
             "héllo", "x"]
    for _ in range(100):
        t = " ".join(rng.choice(words) for _ in range(rng.randrange(0, 25)))
        if rng.random() < 0.3:
            t = "  " + t + "\t "
        for n in (3, 8):
            got, want = doc_gram_hashes(t, n), _ref_grams(t, n)
            assert np.array_equal(got, want), (t, n)


def test_gram_hashes_edges():
    assert doc_gram_hashes("", 8).size == 0
    assert doc_gram_hashes(None, 8).size == 0
    assert doc_gram_hashes(" \t\n", 8).size == 0
    # short doc: one whole-sequence gram
    assert doc_gram_hashes("a b c", 8).size == 1
    # case-insensitive
    assert np.array_equal(doc_gram_hashes("A b C", 8),
                          doc_gram_hashes("a B c", 8))


def test_flag_contamination_end_to_end(ray_session):
    bench_texts = ["one two three four five six seven eight nine",
                   "zz short bench doc"]
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(bench_texts)}))
    bench_set = benchmark_gram_set(bench, n=8)
    # distinct grams: doc0 has 2 8-grams, doc1 one whole-sequence gram
    assert bench_set.size == 3
    assert np.array_equal(bench_set, np.sort(bench_set))

    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            # contains bench doc0's first 8-gram
            "intro one two three four five six seven eight outro",
            "totally unrelated text with enough words to form grams here",
            # short doc that exactly equals bench doc1 -> whole-seq gram
            "zz short bench doc",
            ""])}))
    out = flag_contamination(corpus, bench_set, n=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_overlap_grams"].tolist() == [1, 0, 1, 0]
    assert out["contaminated"].tolist() == [True, False, True, False]


def test_flag_contamination_empty_benchmark(ray_session):
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["some words here"])}))
    out = flag_contamination(corpus, np.array([], dtype=np.uint64),
                             n=8).to_pandas()
    assert out["n_overlap_grams"].tolist() == [0]
    assert not out["contaminated"].any()
