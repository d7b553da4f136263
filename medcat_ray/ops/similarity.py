"""Similarity search over an embedding column (``list<float>``).

* brute-force cosine top-k — the exact baseline: per-batch numpy matmul
  against a broadcast query matrix, batch-local top-k partials, then one
  tiny global merge.  Scales linearly; the shuffle carries only
  ``n_queries × k`` rows per batch.
* LSH-bucketed ANN — random-hyperplane buckets with multi-probe: only
  buckets near a query's bucket are scanned.  The scale path when the
  corpus is 10^12 vectors.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from medcat_ray.ops.numeric import round_half_away
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _as_matrix(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _unit(M: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    return M / norms[:, None]


class BruteForceTopK:
    """Actor-pool stage: batch-local cosine top-k against the broadcast
    query matrix (queries are ``ray.put`` once, fetched once per actor)."""

    def __init__(self, queries_ref, k: int = 10, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> None:
        import ray
        queries = ray.get(queries_ref) if not isinstance(queries_ref, tuple) \
            else queries_ref
        self.query_ids, Q = queries
        self.Q = _unit(np.asarray(Q, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # upstream filters (knn_lsh keep_probed) can empty a block;
            # np.argpartition on a 0-col matrix raises AxisError
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             "neighbor_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        ids = np.asarray(batch[self.id_col].to_pylist())
        V = _unit(_as_matrix(batch[self.vec_col]))
        S = self.Q @ V.T                      # (n_queries, n_batch)
        k = min(self.k, S.shape[1])
        out_q, out_n, out_s = [], [], []
        # batch-local partial top-k per query (merged globally afterwards)
        top = np.argpartition(-S, k - 1, axis=1)[:, :k]
        for qi, qid in enumerate(self.query_ids):
            for j in top[qi]:
                out_q.append(qid)
                out_n.append(ids[j])
                out_s.append(S[qi, j])
        return pa.table({
            "query_id": pa.array(out_q),
            "neighbor_id": pa.array(out_n),
            "score": pa.array(round_half_away(np.asarray(out_s), 6)),
        })


def knn_bruteforce(ds: rd.Dataset, query_ids, query_matrix, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   concurrency: int = 4) -> rd.Dataset:
    """Exact cosine top-k for each query row: partial top-k per batch →
    global top-k per query (tiny groupby over n_queries × k × n_batches
    rows).  Ties broken by neighbor id ascending (deterministic)."""
    import ray
    queries_ref = ray.put((list(query_ids), np.asarray(query_matrix)))
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k,
                                   id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow", concurrency=concurrency)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["score", "neighbor_id"],
                                 ascending=[False, True]).head(k)
    return partials.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pandas")


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------


def knn_lsh(ds: rd.Dataset, query_ids, query_matrix, k: int = 10,
            n_planes: int = 8, multiprobe: int = 1,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 9, concurrency: int = 4) -> rd.Dataset:
    """Approximate top-k: scan only rows whose hyperplane sign-bucket is
    within ``multiprobe`` bit flips of the query's bucket.

    Recall < 1 by construction; the accepted trade for a 2^n_planes scan
    reduction.  Probed bucket sets are computed once on the driver."""
    Q = np.asarray(query_matrix, dtype=np.float64)
    dim = Q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(dim, n_planes))

    def bucket_of(M: np.ndarray) -> np.ndarray:
        signs = (M @ planes) > 0
        return (signs.astype(np.uint64) <<
                np.arange(n_planes, dtype=np.uint64)[None, :]).sum(axis=1)

    q_buckets = bucket_of(Q)
    probe_sets = []
    for qb in q_buckets:
        probes = {int(qb)}
        if multiprobe >= 1:
            for bit in range(n_planes):
                probes.add(int(qb) ^ (1 << bit))
        probe_sets.append(probes)
    wanted = set().union(*probe_sets) if probe_sets else set()
    wanted_arr = (np.sort(np.fromiter(wanted, dtype=np.uint64,
                                      count=len(wanted)))
                  if wanted else np.empty(0, dtype=np.uint64))

    import ray
    wanted_ref = ray.put(wanted_arr)

    def keep_probed(batch: pa.Table) -> pa.Table:
        V = _as_matrix(batch[vec_col])
        if V.size == 0:
            return batch
        b = bucket_of(V).astype(np.uint64)
        w = ray.get(wanted_ref)
        if len(w) == 0:
            mask = np.zeros(len(b), dtype=bool)
        else:
            idx = np.minimum(np.searchsorted(w, b), len(w) - 1)
            mask = w[idx] == b
        return batch.filter(pa.array(mask))

    pruned = ds.map_batches(keep_probed, batch_format="pyarrow")
    return knn_bruteforce(pruned, query_ids, query_matrix, k,
                          id_col, vec_col, concurrency)


# ---------------------------------------------------------------------------
# IVF ANN (coarse-quantizer scale path)
# ---------------------------------------------------------------------------


def train_ivf_centroids(sample: np.ndarray, n_cells: int, seed: int = 13,
                        iters: int = 10) -> np.ndarray:
    """Deterministic mini k-means (fixed seed + iteration count) on a
    driver-side sample — the coarse quantizer of an IVF index.  The sample
    is model-sized (n_cells × ~100 vectors), not corpus-sized."""
    rng = np.random.default_rng(seed)
    S = _unit(np.asarray(sample, dtype=np.float64))
    n_cells = min(n_cells, len(S))
    C = S[rng.choice(len(S), size=n_cells, replace=False)]
    for _ in range(iters):
        assign = np.argmax(S @ C.T, axis=1)
        for c in range(n_cells):
            members = S[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C


def knn_ivf(ds: rd.Dataset, query_ids, query_matrix, k: int = 10,
            n_cells: int = 16, nprobe: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 13, sample_size: int = 2048,
            concurrency: int = 4) -> rd.Dataset:
    """IVF approximate top-k: vectors partition into ``n_cells`` Voronoi
    cells of a trained coarse quantizer; each query scans only its
    ``nprobe`` nearest cells.

    Scale shape: centroids are broadcast (model-sized); cell assignment and
    the filtered brute-force scan are one fused ``map_batches``.  For the
    10^12-vector path where probed cells must prune at the READ, use
    :func:`build_ivf_index` + :func:`knn_ivf_indexed` (write-time cell
    partitioning).
    """
    import ray

    sample = np.array([r[vec_col] for r in ds.take(sample_size)],
                      dtype=np.float64)
    C = train_ivf_centroids(sample, n_cells, seed)
    Q = _unit(np.asarray(query_matrix, dtype=np.float64))
    # nprobe nearest cells per query
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    probed_sets = [set(row.tolist()) for row in probe]
    state_ref = ray.put((list(query_ids), Q, C, probed_sets))

    class IVFScan:
        def __init__(self) -> None:
            self.query_ids, self.Q, self.C, self.probed = ray.get(state_ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"query_id": pa.array([], type=pa.int64()),
                                 "neighbor_id": pa.array([], type=pa.int64()),
                                 "score": pa.array([], type=pa.float64())})
            ids = np.asarray(batch[id_col].to_pylist())
            V = _unit(_as_matrix(batch[vec_col]))
            cells = np.argmax(V @ self.C.T, axis=1)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.query_ids):
                mask = np.isin(cells, list(self.probed[qi]))
                if not mask.any():
                    continue
                sub_ids = ids[mask]
                S = self.Q[qi] @ V[mask].T
                kk = min(self.k, len(sub_ids))
                top = np.argpartition(-S, kk - 1)[:kk] if kk < len(sub_ids) \
                    else np.arange(len(sub_ids))
                for j in top:
                    out_q.append(qid)
                    out_n.append(sub_ids[j])
                    out_s.append(S[j])
            return pa.table({
                "query_id": pa.array(out_q),
                "neighbor_id": pa.array(out_n),
                "score": pa.array(round_half_away(np.asarray(out_s), 6)),
            })

    partials = ds.map_batches(IVFScan, batch_format="pyarrow",
                              concurrency=concurrency)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["score", "neighbor_id"],
                                 ascending=[False, True]).head(k)

    return partials.groupby("query_id").map_groups(final_topk,
                                                   batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF with a WRITE-TIME partitioned index (the 10^12-vector scale path):
# cell id becomes a parquet partition column, so probed cells prune at the
# READ — non-probed cells never leave storage.
# ---------------------------------------------------------------------------


def build_ivf_index(ds: rd.Dataset, index_dir: str, n_cells: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 13, sample_size: int = 2048) -> np.ndarray:
    """Materialize an IVF index: train the coarse quantizer on a sample,
    assign every vector's cell in one ``map_batches`` pass, and
    ``write_parquet(partition_cols=["cell"])`` so each Voronoi cell is its
    own directory.  Centroids are saved next to the data.  Returns the
    centroid matrix.

    A non-empty ``index_dir`` is cleared first: parquet writes APPEND new
    files into existing ``cell=`` directories, so rebuilding over a prior
    (or crashed) build would silently duplicate every vector."""
    import os
    import shutil
    import ray
    import pyarrow.compute as pc  # noqa: F401 (schema stability)

    if os.path.isdir(index_dir) and os.listdir(index_dir):
        shutil.rmtree(index_dir)

    sample = np.array([r[vec_col] for r in ds.take(sample_size)],
                      dtype=np.float64)
    C = train_ivf_centroids(sample, n_cells, seed)
    C_ref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        cen = ray.get(C_ref)
        V = _unit(_as_matrix(batch[vec_col]))
        if V.ndim != 2 or V.shape[0] == 0:
            return batch.append_column("cell",
                                       pa.array([], type=pa.int32()))
        cells = np.argmax(V @ cen.T, axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(cells, type=pa.int32()))

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["cell"])
    np.savez(os.path.join(index_dir, "centroids.npz"), C=C)
    return C


def knn_ivf_indexed(index_dir: str, query_ids, query_matrix, k: int = 10,
                    nprobe: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    concurrency: int = 4) -> rd.Dataset:
    """ANN over a :func:`build_ivf_index` directory with READ-TIME cell
    pruning: only the ``nprobe`` nearest cells' partitions are listed and
    read — at 10^12 vectors the scan is |probed cells| / n_cells of the
    corpus, enforced by the storage layout rather than a filter."""
    import glob
    import os

    C = np.load(os.path.join(index_dir, "centroids.npz"))["C"]
    Q = _unit(np.asarray(query_matrix, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    wanted_cells = sorted({int(c) for row in probe for c in row})
    # expand to the parquet FILES of each probed cell (read_parquet takes
    # a list of files; non-probed cell directories are never listed)
    paths = [f for c in wanted_cells
             for f in sorted(glob.glob(
                 os.path.join(index_dir, f"cell={c}", "*.parquet")))]
    if not paths:
        return rd.from_items([])
    pruned = rd.read_parquet(paths, columns=[id_col, vec_col])
    return knn_bruteforce(pruned, query_ids, np.asarray(query_matrix), k,
                          id_col, vec_col, concurrency)
