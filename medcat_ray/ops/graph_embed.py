"""Concept embeddings from the co-occurrence graph — PPMI + truncated
SVD (Levy & Goldberg 2014: SGNS word2vec factorizes the shifted-PMI
matrix; the explicit SVD-of-PPMI variant is deterministic and needs no
training loop).

Input: the pair-count table ``(subj, obj, count)`` from
``pipelines.kg.triple_counts`` — the distributed heavy lifting
(annotate → partial counts → merge) already happened; this operator's
exchanges are all model-sized.

Scale assumption (same as ``ops/pagerank.py``'s exact path): the
CONCEPT space is node-sized — a clinical CDB is 10^5..10^6 CUIs, so the
PPMI matrix (sparse) and its rank-``dim`` factorization fit on the
driver even when the corpus is 10^12 documents; the corpus-sized work
never runs here.  For an open-world token vocabulary use a hashed/
bucketed variant upstream (cap the vocabulary before pairing) — a
distributed randomized SVD is out of scope and documented as such.

Determinism: LAPACK SVD is sign-ambiguous per singular vector; each
column is flipped so its largest-|magnitude| entry is positive
(ties: first index wins), making outputs reproducible run-to-run.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd

import ray.data as rd


def concept_embeddings(pairs: rd.Dataset, dim: int = 32,
                       subj_col: str = "subj_cui",
                       obj_col: str = "obj_cui",
                       count_col: str = "count",
                       symmetrize: bool = True) -> pd.DataFrame:
    """(cui, embedding list<float64>) from rank-``dim`` SVD of the PPMI
    matrix.  ``symmetrize=True`` folds count(s,o)+count(o,s) so the
    matrix is symmetric and one vector per concept suffices (the
    subject- and object-role vocabularies are unioned either way).

    Embedding = U_k · sqrt(S_k) (the symmetric factorization); rows are
    L2-normalizable downstream but returned raw so dot products
    approximate PPMI."""
    from medcat_ray.ops.pmi import pmi_edges
    scored = pmi_edges(pairs, subj_col=subj_col, obj_col=obj_col,
                       count_col=count_col).to_pandas()
    if scored.empty or subj_col not in scored.columns:
        return pd.DataFrame({"cui": pd.Series([], dtype=object),
                             "embedding": pd.Series([], dtype=object)})
    vocab = sorted(set(scored[subj_col]) | set(scored[obj_col]))
    idx = {c: i for i, c in enumerate(vocab)}
    n = len(vocab)
    if n == 0:
        return pd.DataFrame({"cui": pd.Series([], dtype=object),
                             "embedding": pd.Series([], dtype=object)})
    M = np.zeros((n, n), dtype=np.float64)
    si = scored[subj_col].map(idx).to_numpy()
    oi = scored[obj_col].map(idx).to_numpy()
    ppmi = np.maximum(scored["pmi"].to_numpy(), 0.0)
    M[si, oi] = ppmi
    if symmetrize:
        M = np.maximum(M, M.T)
    k = min(dim, n)
    U, S, _ = np.linalg.svd(M, full_matrices=False)
    U, S = U[:, :k], S[:k]
    # deterministic sign: largest-|component| entry of each column > 0
    for j in range(k):
        i = int(np.argmax(np.abs(U[:, j])))
        if U[i, j] < 0:
            U[:, j] = -U[:, j]
    emb = U * np.sqrt(S)
    return pd.DataFrame({"cui": vocab,
                         "embedding": [row.tolist() for row in emb]})
