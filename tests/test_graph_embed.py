"""PPMI + SVD concept embeddings (ops/graph_embed.py)."""

import numpy as np
import pandas as pd

import ray.data as rd

from medcat_ray.ops.graph_embed import concept_embeddings


def _pairs(seed=11, n=10):
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n):
        for o in range(n):
            if s != o and rng.random() < 0.5:
                rows.append((f"C{s:03d}", f"C{o:03d}",
                             int(rng.integers(1, 30))))
    return pd.DataFrame(rows, columns=["subj_cui", "obj_cui", "count"])


def _ppmi_matrix(df, vocab):
    idx = {c: i for i, c in enumerate(vocab)}
    t = df["count"].sum()
    cs = df.groupby("subj_cui")["count"].sum()
    co = df.groupby("obj_cui")["count"].sum()
    M = np.zeros((len(vocab), len(vocab)))
    for _, r in df.iterrows():
        pmi = np.log(r["count"] * t / (cs[r["subj_cui"]]
                                       * co[r["obj_cui"]]))
        M[idx[r["subj_cui"]], idx[r["obj_cui"]]] = max(pmi, 0.0)
    return np.maximum(M, M.T)


def test_full_rank_reconstructs_ppmi(ray_session):
    df = _pairs()
    vocab = sorted(set(df["subj_cui"]) | set(df["obj_cui"]))
    out = concept_embeddings(rd.from_pandas(df).repartition(3),
                             dim=len(vocab))
    assert list(out["cui"]) == vocab
    E = np.array(out["embedding"].tolist())
    M = _ppmi_matrix(df, vocab)
    # symmetric PSD-ish reconstruction: E @ E.T == M only when M is PSD;
    # instead check the SVD identity |M - U S V^T| via the stronger
    # spectral route: singular values of M match E's column norms^2
    sv = np.linalg.svd(M, compute_uv=False)
    assert np.allclose(np.sort((E ** 2).sum(axis=0))[::-1], sv,
                       rtol=1e-10, atol=1e-10)


def test_deterministic_and_sign_fixed(ray_session):
    df = _pairs(seed=4)
    a = concept_embeddings(rd.from_pandas(df), dim=8)
    b = concept_embeddings(rd.from_pandas(df).repartition(5), dim=8)
    assert list(a["cui"]) == list(b["cui"])
    assert np.allclose(np.array(a["embedding"].tolist()),
                       np.array(b["embedding"].tolist()), atol=1e-12)
    E = np.array(a["embedding"].tolist())
    for j in range(E.shape[1]):
        i = int(np.argmax(np.abs(E[:, j])))
        assert E[i, j] >= 0


def test_dot_products_rank_like_ppmi(ray_session):
    # low-rank embeddings: top-associated pair scores higher than a
    # zero-PPMI pair for a planted two-cluster graph
    rows = []
    for a in ["A1", "A2", "A3"]:
        for b in ["A1", "A2", "A3"]:
            if a != b:
                rows.append((a, b, 50))
    for a in ["B1", "B2", "B3"]:
        for b in ["B1", "B2", "B3"]:
            if a != b:
                rows.append((a, b, 50))
    rows.append(("A1", "B1", 1))
    df = pd.DataFrame(rows, columns=["subj_cui", "obj_cui", "count"])
    out = concept_embeddings(rd.from_pandas(df), dim=4)
    E = {c: np.array(e) for c, e in zip(out["cui"], out["embedding"])}
    assert E["A1"] @ E["A2"] > E["A1"] @ E["B2"]
    assert E["B1"] @ E["B3"] > E["A3"] @ E["B3"]


def test_empty(ray_session):
    df = _pairs().iloc[:0]
    out = concept_embeddings(rd.from_pandas(df), dim=4)
    assert len(out) == 0


def test_max_vocab_fail_loud(ray_session):
    import pytest
    df = _pairs()
    with pytest.raises(ValueError, match="max_vocab"):
        concept_embeddings(rd.from_pandas(df), dim=4, max_vocab=3)
