"""Mergeable log-bucketed histogram quantile sketch (HdrHistogram /
DDSketch family — fixed memory, bounded RELATIVE error) — the scale-path
complement of the exact-quantile operator (ops/quantiles.py, whose
shuffle is cardinality-sized): at 10^12 rows the sketch reduces with
ZERO shuffle, like the HLL/CMS sketches.

INTEGER-ONLY bucketing over non-negative int values (SQL-reproducible
bit-for-bit; no float log anywhere):

  * v < 2^(s+1)            → idx = v                   (exact region)
  * else, e = bit_length(v) − 1, shift = e − s,
    top = v >> shift ∈ [2^s, 2^(s+1))                  (s mantissa bits)
    → idx = (shift + 1)·2^s + (top − 2^s)
  * bucket upper bound (the reported estimate):
    rep(idx) = idx in the exact region, else
    ((top + 1) << shift) − 1 — so estimates are ≤ (1 + 2^−s)·true.

Per-batch partials are bincounts over the bounded index space
(≤ (64 − s + 1)·2^s entries), combined associatively; quantile targets
use integer ceiling arithmetic (rank = ⌈q·N⌉ as (N·num + den − 1)//den),
so engine and DuckDB twin agree exactly.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def bucket_index(v: np.ndarray, s: int = 5) -> np.ndarray:
    """Integer bucket index per value (int64 array, values ≥ 0)."""
    v = np.asarray(v, dtype=np.int64)
    if (v < 0).any():
        raise ValueError("values must be non-negative")
    exact = v < (1 << (s + 1))
    idx = v.copy()
    big = ~exact
    if big.any():
        vb = v[big]
        # bit_length(v) - 1 via log-free integer ops: highest set bit
        e = (63 - ((vb[:, None] >> np.arange(64, dtype=np.int64)[None, :])
                   != 0)[:, ::-1].argmax(axis=1)).astype(np.int64)
        shift = e - s
        top = vb >> shift
        idx[big] = (shift + 1) * (1 << s) + (top - (1 << s))
    return idx


def bucket_rep(idx: np.ndarray, s: int = 5) -> np.ndarray:
    """Upper-bound representative value per bucket index."""
    idx = np.asarray(idx, dtype=np.int64)
    rep = idx.copy()
    big = idx >= (1 << (s + 1))
    if big.any():
        shift = idx[big] // (1 << s) - 1
        top = (1 << s) + idx[big] % (1 << s)
        rep[big] = ((top + 1) << shift) - 1
    return rep


def loghist_counts(ds: rd.Dataset, value_col: str,
                   s: int = 5) -> np.ndarray:
    """Histogram counts (int64[(64 − s + 1)·2^s]) over ``value_col`` —
    one map_batches pass, zero shuffle."""
    m = (64 - s + 1) * (1 << s)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        h = (np.bincount(bucket_index(v, s), minlength=m)
             if len(v) else np.zeros(m, dtype=np.int64))
        return pa.table({"h": pa.array([h.astype(np.int64).tobytes()],
                                       pa.binary())})

    out = np.zeros(m, dtype=np.int64)
    for part in ds.map_batches(partial, batch_size=None,
                               batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for raw in part["h"].to_pylist():
            out += np.frombuffer(raw, dtype=np.int64)
    return out


def loghist_quantiles(counts: np.ndarray,
                      quantiles: Sequence[Tuple[int, int]],
                      s: int = 5) -> List[Tuple[float, int]]:
    """(q, estimate) per quantile, q given as (num, den) integer pairs;
    estimate = rep of the first bucket whose cumulative count reaches
    rank ⌈q·N⌉ (exact integer arithmetic)."""
    cum = np.cumsum(counts)
    n = int(cum[-1])
    out = []
    for num, den in quantiles:
        if n == 0:
            out.append((num / den, 0))
            continue
        rank = (n * num + den - 1) // den
        idx = int(np.searchsorted(cum, rank))
        out.append((num / den, int(bucket_rep(np.array([idx]), s)[0])))
    return out


def loghist_counts_grouped(ds: rd.Dataset, group_col: str,
                           value_col: str, s: int = 5) -> rd.Dataset:
    """Sparse (group, bucket, n) histogram — the grouped twin of
    :func:`loghist_counts` (same shape as grouped HyperLogLog,
    ops/sketch.py): per-batch sparse partials, then ONE native
    groupby(group, bucket).Sum; the shuffle carries at most
    groups × occupied-buckets rows, never values."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        idx = bucket_index(v, s)
        df = pd.DataFrame({group_col: g, "bucket": idx})
        cnt = df.groupby([group_col, "bucket"], sort=False) \
            .size().reset_index(name="n")
        return pa.table({
            group_col: pa.array(cnt[group_col], type=pa.string()),
            "bucket": pa.array(cnt["bucket"].to_numpy(),
                               type=pa.int64()),
            "n": pa.array(cnt["n"].to_numpy(), type=pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([group_col, "bucket"]).aggregate(Sum("n",
                                                      alias_name="n"))


def loghist_quantiles_grouped(counts: "pd.DataFrame", group_col: str,
                              quantiles: Sequence[Tuple[int, int]],
                              s: int = 5) -> "pd.DataFrame":
    """(group, q, estimate) per group from the sparse grouped counts —
    the driver fold runs over the groups × occupied-buckets table."""
    out_g, out_q, out_v = [], [], []
    for g, sub in counts.groupby(group_col, sort=True):
        sub = sub.sort_values("bucket")
        cum = sub["n"].cumsum().to_numpy()
        n = int(cum[-1]) if len(cum) else 0
        buckets = sub["bucket"].to_numpy()
        for num, den in quantiles:
            out_g.append(g)
            out_q.append(num / den)
            if n == 0:
                out_v.append(0)
                continue
            rank = (n * num + den - 1) // den
            idx = int(np.searchsorted(cum, rank))
            out_v.append(int(bucket_rep(
                np.array([buckets[idx]]), s)[0]))
    return pd.DataFrame({group_col: out_g, "q": out_q,
                         "estimate": out_v})
