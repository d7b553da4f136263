"""Product quantization ANN (Jégou et al. 2011, "Product Quantization
for Nearest Neighbor Search") — the memory side of the FAISS-style
scale path: a d-dim vector compresses to ``m`` uint8 codes (64-d float32
→ 8 bytes = 32× smaller), so 10^12 vectors fit where raw vectors never
would, and query scoring is ``m`` table lookups instead of a d-dim dot.

Pipeline shape (all Ray-Data-first):
* ``train_pq`` — deterministic per-subspace Lloyd k-means on a driver
  sample (codebooks are tiny: m×ksub×dsub);
* ``add_pq_codes`` — one streaming ``map_batches`` appending the code
  column (codebook broadcast via ``ray.put``);
* ``knn_pq`` — asymmetric-distance (ADC) shortlist per batch from the
  query's per-subspace lookup tables, then EXACT cosine re-rank of the
  shortlisted rows (the standard IVF-PQ + refine recipe) — so the
  output schema and scores match ``knn_bruteforce`` and the planted
  copy-cluster oracle (``__ray_entry__._plant_query_copies``) proves
  the approximate path equal to exact brute force end-to-end
  (driver query ``knn_pq_top10``).

Vectors are L2-normalized before quantization (cosine ⇒ inner product),
which also makes the planted scaled copies quantize to EXACTLY the
query's codes — they achieve the batch-maximal ADC score and can never
fall out of the shortlist.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _normalize(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return M / n


def train_pq(sample: np.ndarray, m: int = 8, ksub: int = 16,
             iters: int = 10, seed: int = 7) -> np.ndarray:
    """Per-subspace Lloyd k-means over L2-normalized ``sample`` rows.
    Deterministic: seeded init, argmin ties to the lowest centroid,
    empty clusters keep their previous centroid.  Returns
    ``(m, ksub, d/m)`` float64 codebooks."""
    X = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        Xj = X[:, j * dsub:(j + 1) * dsub]
        C = Xj[rng.choice(n, size=ksub, replace=n < ksub)].copy()
        for _ in range(iters):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ksub):
                mask = assign == c
                if mask.any():
                    C[c] = Xj[mask].mean(axis=0)
        books[j] = C
    return books


def _encode(V: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes for L2-normalized rows ``V``."""
    m, ksub, dsub = books.shape
    codes = np.empty((V.shape[0], m), dtype=np.uint8)
    for j in range(m):
        Vj = V[:, j * dsub:(j + 1) * dsub]
        d2 = ((Vj[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
    return codes


def add_pq_codes(ds: rd.Dataset, books: np.ndarray,
                 vec_col: str = "embedding",
                 out_col: str = "pq_code") -> rd.Dataset:
    """Append the ``m``-byte PQ code of each (normalized) vector."""
    books_ref = ray.put(np.ascontiguousarray(books))

    def _enc(batch: pa.Table) -> pa.Table:
        B = ray.get(books_ref)
        V = _normalize(np.array(batch[vec_col].to_pylist(),
                                dtype=np.float64))
        codes = _encode(V, B)
        return batch.append_column(
            out_col, pa.array(list(codes), pa.list_(pa.uint8())))

    return ds.map_batches(_enc, batch_format="pyarrow")


def knn_pq(ds: rd.Dataset, query_ids: Sequence[int],
           query_matrix: np.ndarray, books: np.ndarray, k: int = 10,
           shortlist: int = 100, id_col: str = "vec_id",
           vec_col: str = "embedding",
           concurrency: int = 4) -> rd.Dataset:
    """ADC shortlist + exact cosine re-rank, schema-compatible with
    ``knn_bruteforce`` (query_id, neighbor_id, score)."""
    Q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    m, ksub, dsub = books.shape
    # per-query inner-product lookup tables: (nq, m, ksub)
    luts = np.einsum("qmd,mkd->qmk",
                     Q.reshape(Q.shape[0], m, dsub), books)
    state_ref = ray.put((list(query_ids), Q, luts,
                         np.ascontiguousarray(books)))

    def _partial(batch: pa.Table) -> pa.Table:
        qids, Qm, LUT, B = ray.get(state_ref)
        ids = batch[id_col].to_numpy()
        V = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        Vn = _normalize(V)
        codes = _encode(Vn, B)                       # (n, m)
        rows_q, rows_n, rows_adc, rows_s = [], [], [], []
        nshort = min(shortlist, len(ids))
        for qi, qid in enumerate(qids):
            adc = LUT[qi][np.arange(m)[None, :], codes].sum(axis=1)
            top = np.argpartition(-adc, nshort - 1)[:nshort]
            # re-rank score matches BruteForceTopK exactly (same
            # normalization, same round_half_away(…, 6)) so the oracle
            # tie-break by neighbor_id is identical
            from medcat_ray.ops.numeric import round_half_away
            exact = round_half_away(Vn[top] @ Qm[qi], 6)
            rows_q.extend([qid] * len(top))
            rows_n.extend(ids[top].tolist())
            rows_adc.extend(adc[top].tolist())
            rows_s.extend(exact.tolist())
        return pa.table({
            "query_id": pa.array(rows_q, pa.int64()),
            "neighbor_id": pa.array(rows_n, pa.int64()),
            "adc": pa.array(rows_adc, pa.float64()),
            "score": pa.array(rows_s, pa.float64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              concurrency=concurrency)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        short = group.sort_values(["adc", "neighbor_id"],
                                  ascending=[False, True]).head(shortlist)
        return short.sort_values(["score", "neighbor_id"],
                                 ascending=[False, True]).head(k) \
            .drop(columns=["adc"])

    return partials.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pandas")
