"""Product quantization ANN (ops/pq.py)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from medcat_ray.ops.pq import (_encode, _normalize, add_pq_codes, knn_pq,
                               train_pq)


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(3)
    return rng.normal(size=(500, 32)).astype(np.float32)


def test_train_pq_deterministic_and_learns(vectors):
    b1 = train_pq(vectors, m=4, ksub=8, iters=8, seed=7)
    b2 = train_pq(vectors, m=4, ksub=8, iters=8, seed=7)
    assert np.array_equal(b1, b2)
    assert b1.shape == (4, 8, 8)
    # trained codebook reconstructs better than an untrained (0-iter) one
    b0 = train_pq(vectors, m=4, ksub=8, iters=0, seed=7)

    def recon_err(books):
        V = _normalize(np.asarray(vectors, dtype=np.float64))
        codes = _encode(V, books)
        rec = np.concatenate(
            [books[j][codes[:, j]] for j in range(books.shape[0])],
            axis=1)
        return float(((V - rec) ** 2).sum())
    assert recon_err(b1) < recon_err(b0)


def test_train_pq_dim_validation(vectors):
    with pytest.raises(ValueError):
        train_pq(vectors, m=5)


def test_identical_vector_gets_query_codes(vectors):
    books = train_pq(vectors, m=4, ksub=8, iters=5)
    q = np.asarray(vectors[17], dtype=np.float64)
    qn = _normalize(q[None, :])
    scaled = _normalize((q * 2.5)[None, :])
    assert np.array_equal(_encode(qn, books), _encode(scaled, books))


def test_knn_pq_equals_bruteforce_on_planted(ray_session, vectors):
    from medcat_ray.ops.similarity import knn_bruteforce
    q = np.asarray(vectors[0], dtype=np.float64)
    rows = [{"vec_id": i, "embedding": v.tolist()}
            for i, v in enumerate(vectors)]
    rows += [{"vec_id": 3_000_000 + i,
              "embedding": (vectors[0] * np.float32(1.5 + 0.25 * i))
              .tolist()} for i in range(9)]
    df = pd.DataFrame(rows)
    books = train_pq(vectors, m=4, ksub=16, iters=8)
    got = knn_pq(rd.from_pandas(df).repartition(4), [0], q[None, :],
                 books, k=10, shortlist=64, concurrency=2).to_pandas() \
        .sort_values(["score", "neighbor_id"],
                     ascending=[False, True]).reset_index(drop=True)
    exact = knn_bruteforce(rd.from_pandas(df).repartition(4), [0],
                           q[None, :], k=10, concurrency=2).to_pandas() \
        .sort_values(["score", "neighbor_id"],
                     ascending=[False, True]).reset_index(drop=True)
    assert got["neighbor_id"].tolist() == exact["neighbor_id"].tolist()
    assert np.array_equal(got["score"].to_numpy(),
                          exact["score"].to_numpy())


def test_add_pq_codes_roundtrip(ray_session, vectors):
    books = train_pq(vectors, m=4, ksub=8, iters=5)
    df = pd.DataFrame({"vec_id": np.arange(20, dtype=np.int64),
                       "embedding": [v.tolist() for v in vectors[:20]]})
    out = add_pq_codes(rd.from_pandas(df), books).to_pandas()
    V = _normalize(np.asarray(vectors[:20], dtype=np.float64))
    expect = _encode(V, books)
    got = np.array(out.sort_values("vec_id")["pq_code"].tolist())
    assert np.array_equal(got, expect)
