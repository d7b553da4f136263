"""Trainable linear probe via sufficient statistics — ridge regression
fitted from ONE streaming pass of per-block moment partials
(XᵀX, Xᵀy), the closed-form cousin of the quality-classifier filters
LLM-data pipelines train over cheap per-doc features.

Scale shape: identical to ops/linalg.covariance_fit — each block
contributes one (count, XᵀX, Xᵀy) partial via a BLAS ``dot``; the
driver folds O(blocks) (d+1)²-sized partials and solves the
(d+1)×(d+1) system.  No shuffle; scoring is a stateless broadcast
``map_batches``.  The sufficient statistics are the oracle surface
(float rtol) — the solve itself is unit-tested against the numpy
closed form."""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _design(batch: pa.Table, feature_cols: Sequence[str]) -> np.ndarray:
    cols = [np.ones(batch.num_rows, dtype=np.float64)]
    cols += [np.asarray(batch[c].to_numpy(zero_copy_only=False),
                        dtype=np.float64) for c in feature_cols]
    return np.stack(cols, axis=1)


def ridge_stats(ds: rd.Dataset, feature_cols: Sequence[str],
                label_col: str) -> tuple:
    """(n, XᵀX, Xᵀy) with an implicit leading bias column, from one
    pass of per-block partials."""
    fc = list(feature_cols)

    def partial(batch: pa.Table) -> pa.Table:
        x = _design(batch, fc)
        y = np.asarray(batch[label_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        return pa.table({
            "n": pa.array([x.shape[0]], type=pa.int64()),
            "xtx": pa.array([(x.T @ x).reshape(-1).tolist()],
                            type=pa.list_(pa.float64())),
            "xty": pa.array([(x.T @ y).tolist()],
                            type=pa.list_(pa.float64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    d = len(fc) + 1
    xtx = np.sum(np.stack(parts["xtx"].to_numpy()), axis=0).reshape(d, d)
    xty = np.sum(np.stack(parts["xty"].to_numpy()), axis=0)
    return n, xtx, xty


def ridge_fit(ds: rd.Dataset, feature_cols: Sequence[str],
              label_col: str, l2: float = 0.0) -> np.ndarray:
    """Ridge weights (bias first): (XᵀX + λI)⁻¹ Xᵀy — the bias row of
    the regularizer is zeroed (standard convention)."""
    _, xtx, xty = ridge_stats(ds, feature_cols, label_col)
    reg = np.eye(xtx.shape[0]) * l2
    reg[0, 0] = 0.0
    return np.linalg.solve(xtx + reg, xty)


def ridge_score(ds: rd.Dataset, feature_cols: Sequence[str],
                weights: np.ndarray, out_col: str = "score",
                keep_cols: Sequence[str] | None = None) -> rd.Dataset:
    """Stateless broadcast scoring: out = [1, x] · w."""
    import ray
    fc = list(feature_cols)
    w_ref = ray.put(np.asarray(weights, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        import ray as _ray
        w = _ray.get(w_ref)
        s = _design(batch, fc) @ w
        out = batch if keep_cols is None else batch.select(list(keep_cols))
        return out.append_column(out_col,
                                 pa.array(s, type=pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow")


def stats_long(n: int, xtx: np.ndarray, xty: np.ndarray) -> pd.DataFrame:
    """(i, j, val) long form of the sufficient statistics; Xᵀy rows use
    j = -1 — the oracle-facing surface."""
    d = xtx.shape[0]
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    return pd.DataFrame({
        "i": np.concatenate([ii.reshape(-1),
                             np.arange(d)]).astype(np.int64),
        "j": np.concatenate([jj.reshape(-1),
                             -np.ones(d)]).astype(np.int64),
        "val": np.concatenate([xtx.reshape(-1), xty])})
