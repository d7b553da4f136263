"""Distributed spherical k-means + SemDeDup-style semantic dedup.

The reference has no clustering operator (SURVEY.md §2.5 — all aggregates
exact); this implements the clustering step a large-scale training-data
pipeline needs for semantic deduplication (Abbas et al., *SemDeDup*,
arXiv:2303.09540): cluster document embeddings with k-means in cosine
space, then mark near-duplicate pairs WITHIN each cluster, so the
pairwise comparison volume is O(Σ cluster_size²) instead of O(n²).

Scale shape (10^12 rows):

* Lloyd iterations are ONE ``map_batches`` pass per round emitting k
  partial rows (per-cluster vector sum + count) per block, combined by a
  per-block merge and a small ``repartition`` tree — the driver only ever
  sees ≤ ``combine_blocks × k`` rows of d doubles (model-sized), never
  the corpus.  Centroids are broadcast via ``ray.put`` once per round.
* The final assignment is a stateless vectorized ``map_batches``.
* Semantic dedup groups by the (uniform, model-chosen) cluster id; the
  per-cluster all-pairs matmul is chunked and guarded by
  ``max_cluster_rows`` — at scale k is chosen ~ n/target_cluster_size
  (SemDeDup uses 110k clusters for 1.3B docs) so a cluster stays
  comparison-sized; an oversize cluster fails loudly rather than running
  an O(n²) job silently.

Determinism: centroid init is the k smallest-id vectors (exactly
reproducible in SQL — the DuckDB twin unrolls the same iterations), ties
in the argmax assignment break toward the lowest cluster id on both
sides, and all arithmetic is float64 over unit vectors, so cosine scores
are scale-invariant and the planted-duplicate oracle queries compare
exactly (integer cluster ids; scores rounded half-away like every other
oracle-compared float column).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from medcat_ray.ops.numeric import round_half_away
from medcat_ray.ops.similarity import _as_matrix, _unit


def _first_k_by_id(ds: rd.Dataset, k: int, id_col: str,
                   vec_col: str) -> np.ndarray:
    """Unit vectors of the k smallest-id rows: per-block partial min-k
    (combiner — no shuffle), then a driver-side final min-k over
    ≤ k × n_blocks candidate rows.  SQL-reproducible init for the oracle
    path; for very large k prefer ``init="sample"``.
    """
    def per_block(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = np.argsort(ids, kind="stable")[:k]
        return batch.select([id_col, vec_col]).take(pa.array(np.sort(keep)))

    cand = ds.map_batches(per_block, batch_size=None,
                          batch_format="pyarrow").take_all()
    cand.sort(key=lambda r: r[id_col])
    top = cand[:k]
    if len(top) < k:
        raise ValueError(f"k={k} exceeds dataset size {len(top)}")
    return _unit(np.array([r[vec_col] for r in top], dtype=np.float64))


def kmeans_fit(ds: rd.Dataset, k: int, n_iter: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               init: str = "first_k", sample_size: int = 4096,
               seed: int = 13, batch_size: int = 4096,
               combine_blocks: int = 16) -> np.ndarray:
    """Spherical Lloyd k-means over the full dataset; returns unit
    centroids (k × d float64) after ``n_iter - 1`` update rounds (the
    n_iter-th pass is the caller's final :func:`kmeans_assign`).

    Each round: broadcast centroids → one map_batches pass emitting
    per-cluster partial sums of unit vectors → per-block combine →
    ``repartition(combine_blocks)`` (the partials are k × n_blocks rows,
    NOT corpus-sized) → second combine → driver merge of ≤
    combine_blocks × k rows.  Empty clusters keep their previous
    centroid.
    """
    import ray

    if init == "first_k":
        C = _first_k_by_id(ds, k, id_col, vec_col)
    elif init == "sample":
        sample = np.array([r[vec_col] for r in ds.take(sample_size)],
                          dtype=np.float64)
        rng = np.random.default_rng(seed)
        if len(sample) < k:
            raise ValueError(f"k={k} exceeds sample size {len(sample)}")
        C = _unit(sample[rng.choice(len(sample), size=k, replace=False)])
    else:
        raise ValueError(f"unknown init {init!r}")
    d = C.shape[1]

    def _empty_partial() -> pa.Table:
        return pa.table({"cluster": pa.array([], type=pa.int32()),
                         "psum": pa.array([], type=pa.list_(pa.float64())),
                         "n": pa.array([], type=pa.int64())})

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_partial()
        cl = batch["cluster"].to_numpy(zero_copy_only=False)
        sums = _as_matrix(batch["psum"])
        cnts = batch["n"].to_numpy(zero_copy_only=False)
        out_sum = np.zeros((k, d))
        np.add.at(out_sum, cl, sums)
        out_n = np.bincount(cl, weights=cnts, minlength=k).astype(np.int64)
        keep = np.flatnonzero(out_n)
        return pa.table({
            "cluster": pa.array(keep.astype(np.int32), type=pa.int32()),
            "psum": pa.array(out_sum[keep].tolist(),
                             type=pa.list_(pa.float64())),
            "n": pa.array(out_n[keep], type=pa.int64())})

    for _ in range(max(0, n_iter - 1)):
        cref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_partial()
            cent = ray.get(cref)
            V = _unit(_as_matrix(batch[vec_col]))
            a = np.argmax(V @ cent.T, axis=1)
            sums = np.zeros((k, d))
            np.add.at(sums, a, V)
            cnts = np.bincount(a, minlength=k)
            keep = np.flatnonzero(cnts)
            return pa.table({
                "cluster": pa.array(keep.astype(np.int32),
                                    type=pa.int32()),
                "psum": pa.array(sums[keep].tolist(),
                                 type=pa.list_(pa.float64())),
                "n": pa.array(cnts[keep].astype(np.int64),
                              type=pa.int64())})

        partials = ds.map_batches(partial, batch_size=batch_size,
                                  batch_format="pyarrow") \
            .map_batches(combine, batch_size=None, batch_format="pyarrow") \
            .repartition(combine_blocks) \
            .map_batches(combine, batch_size=None, batch_format="pyarrow")
        sums = np.zeros((k, d))
        cnts = np.zeros(k, dtype=np.int64)
        for row in partials.take_all():
            sums[row["cluster"]] += np.asarray(row["psum"])
            cnts[row["cluster"]] += row["n"]
        nonzero = cnts > 0
        C_new = C.copy()
        C_new[nonzero] = _unit(sums[nonzero] / cnts[nonzero, None])
        C = C_new
    return C


def kmeans_assign(ds: rd.Dataset, centroids: np.ndarray,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  keep_vec: bool = False,
                  batch_size: int = 4096) -> rd.Dataset:
    """Append an int32 ``cluster`` column (argmax cosine vs the broadcast
    centroids; ties → lowest cluster id).  Stateless vectorized pass."""
    import ray

    C = _unit(np.asarray(centroids, dtype=np.float64))
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        cols = [id_col, vec_col] if keep_vec else [id_col]
        if batch.num_rows == 0:
            return batch.select(cols).append_column(
                "cluster", pa.array([], type=pa.int32()))
        cent = ray.get(cref)
        V = _unit(_as_matrix(batch[vec_col]))
        a = np.argmax(V @ cent.T, axis=1).astype(np.int32)
        return batch.select(cols).append_column(
            "cluster", pa.array(a, type=pa.int32()))

    return ds.map_batches(assign, batch_size=batch_size,
                          batch_format="pyarrow")


def kmeans_clusters(ds: rd.Dataset, k: int, n_iter: int = 2,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    **fit_kwargs) -> rd.Dataset:
    """Fit + final assignment: (id, cluster) for every row."""
    C = kmeans_fit(ds, k, n_iter=n_iter, id_col=id_col, vec_col=vec_col,
                   **fit_kwargs)
    return kmeans_assign(ds, C, id_col=id_col, vec_col=vec_col)


def semantic_dedup_pairs(ds: rd.Dataset, k: int, n_iter: int = 2,
                         threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         max_cluster_rows: int = 200_000,
                         chunk: int = 2048) -> rd.Dataset:
    """SemDeDup: k-means in cosine space, then near-duplicate pairs
    (cosine ≥ threshold, id_a < id_b) WITHIN each cluster.

    Returns (cluster:int32, id_a, id_b, score:float64 rounded to 6).
    The per-cluster all-pairs matmul is chunked (never more than
    ``chunk²`` sims in flight) and refuses clusters above
    ``max_cluster_rows`` — at scale, size k so clusters stay below it.
    """
    C = kmeans_fit(ds, k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    assigned = kmeans_assign(ds, C, id_col=id_col, vec_col=vec_col,
                             keep_vec=True)

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group)
        if n > max_cluster_rows:
            raise ValueError(
                f"cluster of {n} rows exceeds max_cluster_rows="
                f"{max_cluster_rows}; raise k (SemDeDup sizes k ~ "
                "n/target_cluster_size) or the cap")
        if n < 2:
            return pd.DataFrame({"cluster": pd.Series([], dtype=np.int32),
                                 "id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "score": pd.Series([], dtype=np.float64)})
        order = np.argsort(group[id_col].to_numpy(), kind="stable")
        ids = group[id_col].to_numpy()[order]
        U = _unit(np.array(group[vec_col].tolist(),
                           dtype=np.float64)[order])
        cl = np.int32(group["cluster"].iloc[0])
        out_a, out_b, out_s = [], [], []
        for i0 in range(0, n, chunk):
            Ui = U[i0:i0 + chunk]
            for j0 in range(i0, n, chunk):
                S = Ui @ U[j0:j0 + chunk].T
                ii, jj = np.nonzero(S >= threshold)
                gi, gj = ii + i0, jj + j0
                m = gi < gj
                out_a.append(ids[gi[m]])
                out_b.append(ids[gj[m]])
                out_s.append(S[ii[m], jj[m]])
        id_a = np.concatenate(out_a) if out_a else np.array([], dtype=ids.dtype)
        id_b = np.concatenate(out_b) if out_b else np.array([], dtype=ids.dtype)
        sc = round_half_away(np.concatenate(out_s), 6) if out_s \
            else np.array([], dtype=np.float64)
        return pd.DataFrame({"cluster": np.full(len(id_a), cl,
                                                dtype=np.int32),
                             "id_a": id_a, "id_b": id_b, "score": sc})

    return assigned.groupby("cluster").map_groups(pairs,
                                                  batch_format="pandas")


def semantic_dedup_keep(ds: rd.Dataset, k: int, n_iter: int = 2,
                        threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        method: str = "auto",
                        broadcast_limit: int = 1_000_000,
                        num_partitions: int = 4,
                        **pair_kwargs) -> rd.Dataset:
    """Full SemDeDup keep-pass: near-dup pairs → connected components
    (min-label propagation) → every row keeps iff it IS its component's
    minimum id (rows in no near-dup pair always keep).  Returns the
    surviving (id) rows.

    The drop set is component-membership-sized (∝ near-dup rate), so it
    is auto-gated like exact_dedup: ``ray.put`` + per-batch probe below
    ``broadcast_limit``, a left-outer hash join above — nothing
    corpus-sized on the driver either way."""
    import pyarrow.compute as pc

    import ray
    from medcat_ray.ops.dedup import connected_components

    pairs = semantic_dedup_pairs(ds, k, n_iter=n_iter,
                                 threshold=threshold, id_col=id_col,
                                 vec_col=vec_col, **pair_kwargs)
    comp = connected_components(pairs, src_col="id_a", dst_col="id_b",
                                num_partitions=num_partitions)

    def drops_only(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.equal(batch["node"], batch["component"]))
        return batch.filter(mask).select(["node"])

    drop_ds = comp.map_batches(drops_only,
                               batch_format="pyarrow").materialize()
    if method == "auto":
        method = "broadcast" if drop_ds.count() <= broadcast_limit \
            else "join"

    if method == "join":
        if drop_ds.count() == 0:
            return ds.map_batches(lambda b: b.select([id_col]),
                                  batch_format="pyarrow")

        def as_key(batch: pa.Table) -> pa.Table:
            return pa.table({id_col: batch["node"],
                             "is_dup": pa.array([True] * batch.num_rows,
                                                type=pa.bool_())})

        keyed = drop_ds.map_batches(as_key, batch_format="pyarrow") \
            .repartition(num_partitions)
        joined = ds.map_batches(lambda b: b.select([id_col]),
                                batch_format="pyarrow") \
            .join(keyed, join_type="left_outer",
                  num_partitions=num_partitions, on=(id_col,))
        return joined.map_batches(
            lambda b: b.filter(pc.is_null(b["is_dup"]))
            .select([id_col]), batch_format="pyarrow")

    import numpy as np
    drops = np.sort(np.array([r["node"] for r in drop_ds.take_all()]))
    dref = ray.put(drops)

    def keep(batch: pa.Table) -> pa.Table:
        dr = ray.get(dref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(dr) == 0:
            mask = np.ones(len(ids), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(dr, ids), len(dr) - 1)
            mask = dr[pos] != ids
        return batch.select([id_col]).filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
