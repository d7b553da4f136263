"""Concept embeddings from the co-occurrence graph — PPMI + truncated
SVD (Levy & Goldberg 2014: SGNS word2vec factorizes the shifted-PMI
matrix; the explicit SVD-of-PPMI variant is deterministic and needs no
training loop).

Input: the pair-count table ``(subj, obj, count)`` from
``pipelines.kg.triple_counts`` — the distributed heavy lifting
(annotate → partial counts → merge) already happened; this operator's
exchanges are all model-sized.

Scale assumption: the implementation is a DENSE n×n float64 matrix +
full LAPACK SVD, so it is practical to roughly n ≈ 20k concepts
(3.2 GB, minutes of O(n³)); ``max_vocab`` fails loudly beyond that.
The corpus-sized work (annotate → pair counts) never runs here, but a
full 10^5..10^6-CUI ontology needs a sparse/truncated (randomized) SVD
— out of scope; cap or bucket the vocabulary upstream first.

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
                       symmetrize: bool = True,
                       max_vocab: int = 20_000) -> pd.DataFrame:
    """(cui, embedding list<float64>) from rank-``dim`` SVD of the PPMI
    matrix.  ``symmetrize=True`` takes the element-wise MAX of the
    directed PPMI cells (``max(PPMI(s,o), PPMI(o,s))``) — NOT a fold of
    the raw counts — so the matrix is symmetric and one vector per
    concept suffices; fold counts upstream if count-folding semantics
    are wanted.  Raises when the concept vocabulary exceeds
    ``max_vocab`` (dense-SVD bound, see module docstring).

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
    if n > max_vocab:
        raise ValueError(
            f"concept_embeddings: {n} concepts exceeds the dense-SVD "
            f"bound max_vocab={max_vocab} (n*n float64 = "
            f"{8 * n * n / 1e9:.1f} GB); cap or bucket the vocabulary "
            "upstream, or use a sparse/randomized SVD")
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
