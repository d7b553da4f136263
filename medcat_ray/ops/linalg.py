"""Distributed linear-algebra reductions over an embedding column —
the moment statistics a vector pipeline fits ONCE over the corpus
(covariance / Gram matrix → PCA whitening, the scale path behind
``state/vocab.py:calc_pca_matrix``'s driver-side reference parity).

Scale shape: each block contributes ONE partial — (count, Σx, XᵀX) —
computed by a single BLAS ``dot`` per batch; the driver folds O(blocks)
partials of size dim² (64² floats = 32 KB — model-sized, never
corpus-sized).  No shuffle at all: this is the canonical
map-then-tree-reduce moment fit, same shape as the k-means partial-sum
combiners (ops/kmeans.py)."""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _vecs(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    return np.asarray(flat, dtype=np.float64).reshape(batch.num_rows, -1)


def covariance_fit(ds: rd.Dataset, vec_col: str = "embedding"
                   ) -> Tuple[int, np.ndarray, np.ndarray]:
    """(n, mean, cov): population covariance (divide by n) of the
    vector column, from one streaming pass of per-block
    (count, Σx, XᵀX) partials."""
    def partial(batch: pa.Table) -> pa.Table:
        x = _vecs(batch, vec_col)
        return pa.table({
            "n": pa.array([x.shape[0]], type=pa.int64()),
            "s": pa.array([x.sum(axis=0).tolist()],
                          type=pa.list_(pa.float64())),
            "g": pa.array([(x.T @ x).reshape(-1).tolist()],
                          type=pa.list_(pa.float64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    if n == 0:
        raise ValueError("covariance_fit: empty input")
    s = np.sum(np.stack(parts["s"].to_numpy()), axis=0)
    g = np.sum(np.stack(parts["g"].to_numpy()), axis=0)
    dim = len(s)
    mean = s / n
    cov = g.reshape(dim, dim) / n - np.outer(mean, mean)
    return n, mean, cov


def pca_components(cov: np.ndarray, k: int) -> np.ndarray:
    """Top-k principal directions of a covariance matrix (rows =
    components, descending eigenvalue), sign-fixed so each component's
    largest-|.| coordinate is positive — deterministic across BLAS
    builds up to eigenvalue ties."""
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps


def covariance_long(ds: rd.Dataset, vec_col: str = "embedding"
                    ) -> pd.DataFrame:
    """(i, j, cov) long form of :func:`covariance_fit` — the
    oracle-facing surface (float rtol like doc_lm_ppl)."""
    _, _, cov = covariance_fit(ds, vec_col)
    dim = cov.shape[0]
    ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
    return pd.DataFrame({"i": ii.reshape(-1).astype(np.int64),
                         "j": jj.reshape(-1).astype(np.int64),
                         "cov": cov.reshape(-1)})
