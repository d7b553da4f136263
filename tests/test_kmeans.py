"""Distributed spherical k-means + SemDeDup (ops/kmeans.py).

The reference has no clustering op (SURVEY.md §2.5); this is the
training-data-pipeline addition.  Ground truth: a naive in-memory Lloyd
with identical semantics (first-k init, lowest-cluster tie-break,
empty-cluster retention) — the distributed partial-sum path must agree
exactly.
"""

import numpy as np
import pytest

import ray.data as rd

from medcat_ray.ops.kmeans import (kmeans_assign, kmeans_clusters,
                                   kmeans_fit, semantic_dedup_pairs)


def _unit(M):
    n = np.linalg.norm(M, axis=1)
    n[n == 0] = 1.0
    return M / n[:, None]


def _naive(vecs, ids, k, n_iter):
    U = _unit(np.asarray(vecs, dtype=np.float64))
    order = np.argsort(ids, kind="stable")
    C = U[order[:k]]
    for _ in range(n_iter - 1):
        a = np.argmax(U @ C.T, axis=1)
        C_new = C.copy()
        for c in range(k):
            m = a == c
            if m.any():
                C_new[c] = _unit(U[m].mean(axis=0)[None, :])[0]
        C = C_new
    return np.argmax(U @ C.T, axis=1)


@pytest.fixture(scope="module")
def blob_ds(ray_session):
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(4, 12)) * 4
    vecs = np.concatenate(
        [centers[i] + rng.normal(size=(25, 12)) * 0.3 for i in range(4)])
    ids = np.arange(len(vecs))
    ds = rd.from_items([{"vec_id": int(i), "embedding": vecs[i].tolist()}
                        for i in ids]).repartition(5)
    return ds, vecs, ids


@pytest.mark.parametrize("k,n_iter", [(4, 2), (6, 3), (3, 1)])
def test_matches_naive_lloyd(blob_ds, k, n_iter):
    ds, vecs, ids = blob_ds
    got = kmeans_clusters(ds, k, n_iter=n_iter).to_pandas() \
        .sort_values("vec_id")["cluster"].to_numpy()
    assert (got == _naive(vecs, ids, k, n_iter)).all()


def test_empty_cluster_keeps_centroid(ray_session):
    # two tight groups + k=3: the third seed (a duplicate direction)
    # loses every point after round 1, so its centroid must persist
    vecs = np.array([[1.0, 0.0], [1.0, 0.01], [1.0, -0.01],
                     [0.0, 1.0], [0.01, 1.0]])
    ds = rd.from_items([{"vec_id": i, "embedding": v.tolist()}
                        for i, v in enumerate(vecs)])
    C = kmeans_fit(ds, 3, n_iter=3)
    assert C.shape == (3, 2)
    assert not np.isnan(C).any()
    got = kmeans_assign(ds, C).to_pandas().sort_values("vec_id")
    assert (got["cluster"].to_numpy() == _naive(vecs, np.arange(5), 3, 3)).all()


def test_k_exceeds_rows_raises(ray_session):
    ds = rd.from_items([{"vec_id": 0, "embedding": [1.0, 0.0]}])
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fit(ds, 5, n_iter=2)


def test_sample_init_runs(blob_ds):
    ds, vecs, ids = blob_ds
    C = kmeans_fit(ds, 4, n_iter=2, init="sample", sample_size=64)
    out = kmeans_assign(ds, C).to_pandas()
    assert len(out) == len(vecs)
    assert out["cluster"].between(0, 3).all()


def test_semantic_dedup_finds_planted_only(ray_session):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(60, 16)) * 2
    rows = [{"vec_id": int(i), "embedding": vecs[i].tolist()}
            for i in range(60)]
    rows += [{"vec_id": int(1000 + i),
              "embedding": (vecs[i] * 2.5).tolist()} for i in range(6)]
    ds = rd.from_items(rows).repartition(4)
    out = semantic_dedup_pairs(ds, k=4, n_iter=2, threshold=0.999) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert list(out["id_a"]) == list(range(6))
    assert list(out["id_b"]) == [1000 + i for i in range(6)]
    assert (out["score"] == 1.0).all()


def test_semantic_dedup_cluster_cap(ray_session):
    vecs = np.random.default_rng(0).normal(size=(30, 8))
    ds = rd.from_items([{"vec_id": int(i), "embedding": vecs[i].tolist()}
                        for i in range(30)])
    with pytest.raises(Exception, match="max_cluster_rows"):
        semantic_dedup_pairs(ds, k=1, n_iter=1, threshold=0.9,
                             max_cluster_rows=10).to_pandas()


def test_semantic_dedup_keep_both_paths(ray_session):
    """keep = id == component min on transitive near-dup chains;
    broadcast and join paths agree."""
    import numpy as np
    from medcat_ray.ops.kmeans import semantic_dedup_keep
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(40, 12)) * 2
    rows = [{"vec_id": int(i), "embedding": vecs[i].tolist()}
            for i in range(40)]
    # chain 5 -> 105 -> 205 (scaled copies): one component, keeper 5
    rows += [{"vec_id": 105, "embedding": (vecs[5] * 2.0).tolist()},
             {"vec_id": 205, "embedding": (vecs[5] * 3.0).tolist()}]
    ds = rd.from_items(rows).repartition(3)
    for method in ("broadcast", "join"):
        out = semantic_dedup_keep(ds, k=4, n_iter=2, threshold=0.999,
                                  method=method).to_pandas()
        kept = sorted(out["vec_id"])
        assert kept == sorted(range(40)), (method, kept)
