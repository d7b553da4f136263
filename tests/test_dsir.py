"""DSIR importance weighting (ops/dsir.py) — hand-computed twins."""

import numpy as np

import ray.data as rd

from medcat_ray.ops.decontam import doc_gram_hashes_all
from medcat_ray.ops.dsir import (add_dsir_weight, dsir_log_ratio,
                                 dsir_weights, hashed_bucket_counts)

RAW = ["the cat sat", "the dog ran fast", "ein hund lief", "", "ein hund",
       "the cat sat on the mat"]
TARGET = ["ein hund lief", "ein kater sass"]
B = 64


def _counts(texts, n=2):
    out = np.zeros(B, dtype=np.int64)
    for t in texts:
        g = doc_gram_hashes_all(t, n)
        np.add.at(out, (g % B).astype(np.int64), 1)
    return out


def _ds(texts):
    return rd.from_items([{"doc_id": i, "text": t}
                          for i, t in enumerate(texts)]).repartition(3)


def test_bucket_counts_match_naive(ray_session):
    got = hashed_bucket_counts(_ds(RAW), n=2, buckets=B)
    assert (got == _counts(RAW)).all()
    assert got.sum() == sum(max(len(t.split()) - 1, 1) if t.split() else 0
                            for t in RAW)


def test_weights_match_hand(ray_session):
    lr = dsir_log_ratio(_counts(TARGET), _counts(RAW), smoothing=1.0)
    out = add_dsir_weight(_ds(RAW), lr, n=2, id_col="doc_id") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(RAW):
        g = doc_gram_hashes_all(t, 2)
        assert out.loc[i, "n_grams"] == len(g)
        want = lr[(g % B).astype(np.int64)].sum() if len(g) else 0.0
        assert np.isclose(out.loc[i, "dsir_weight"], want, rtol=1e-12)


def test_target_like_docs_score_higher(ray_session):
    out = dsir_weights(_ds(RAW), _ds(TARGET), n=2, buckets=B,
                       id_col="doc_id").to_pandas() \
        .set_index("doc_id")["dsir_weight"]
    # "ein hund lief" is in the target; English-only docs are not
    assert out[2] > out[0]
    assert out[2] > out[1]
    assert out[3] == 0.0  # empty doc
