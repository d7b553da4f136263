"""Similarity (fuzzy-string) join between TWO tables — MinHash-LSH
bucketed candidates + exact k-shingle Jaccard verification.

The two-table generalization of the dedup family: the reference joins
mention surface forms to concept names EXACTLY (normalized
name → CUIs, ``medcat/cdb.py`` name index); this operator is the fuzzy
counterpart a web-scale entity-resolution pipeline needs — join records
whose join keys only *approximately* agree (typos, re-orderings,
truncation) without the O(L×R) cross product.

Shape (all Ray-native, nothing corpus-sized on the driver):

1. both sides → MinHash band keys (``ops.dedup.minhash_buckets`` — the
   SAME seed, so equal texts land in equal buckets by construction);
2. one hash join on ``(band, band_hash)`` → candidate (left, right) id
   pairs, deduped by a native groupby (a pair found by several bands
   survives once);
3. texts reach their pairs via two hash joins, then a vectorized exact
   Jaccard filter at ``threshold``.

Joins are materialized stage-by-stage: Ray 2.49 runs every join of one
streaming plan concurrently and each join pins ``num_partitions``
aggregator actors, so chaining three unmaterialized joins deadlocks
small sessions (see ops/triangles.py, same constraint).

Scale note: a band bucket with L left × R right members emits L·R
candidate rows — the inherent LSH-join hot-bucket risk.  Buckets are
keyed by a uniform 64-bit hash so skew only comes from genuinely
repeated near-identical text (e.g. boilerplate); cap such keys upstream
(drop buckets above a count bound via the same native-groupby prune the
dedup family uses) when joining boilerplate-heavy corpora.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count

from medcat_ray.ops.dedup import jaccard, minhash_buckets
from medcat_ray.ops.numeric import round_half_away


def _drop_hot_buckets(lb: rd.Dataset, rb: rd.Dataset,
                      max_bucket: int) -> tuple:
    """Remove (band, band_hash) keys with > max_bucket members on
    either side from BOTH bucket tables.  The oversize list is found by
    one native groupby-count per side and applied as a broadcast probe
    on the EXACT (band, band_hash) pair — a per-band sorted hash array,
    so no composite-key collision can prune an innocent bucket — with
    no shuffle join (band cardinality is the small ``bands`` constant)."""
    import logging

    import numpy as np
    import ray
    from ray.data.aggregate import Count

    def oversized(b: rd.Dataset) -> "np.ndarray":
        counts = b.groupby(["band", "band_hash"]) \
            .aggregate(Count(alias_name="n"))

        def big(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return batch.filter(pc.greater(batch["n"], max_bucket)) \
                .select(["band", "band_hash"])
        hot = counts.map_batches(big, batch_format="pyarrow").to_pandas()
        return np.stack([hot["band"].to_numpy().astype(np.int64),
                         hot["band_hash"].to_numpy().astype(np.int64)],
                        axis=1) if len(hot) else \
            np.empty((0, 2), dtype=np.int64)

    pairs = np.concatenate([oversized(lb), oversized(rb)], axis=0)
    if len(pairs) == 0:
        return lb, rb
    # exact per-band lookup: band → sorted unique hash array
    hot_map = {int(b): np.unique(pairs[pairs[:, 0] == b, 1])
               for b in np.unique(pairs[:, 0])}
    n_hot = sum(len(v) for v in hot_map.values())
    logging.getLogger(__name__).warning(
        "similarity_join: dropping %d oversized LSH buckets "
        "(max_bucket=%d)", n_hot, max_bucket)
    hot_ref = ray.put(hot_map)

    def prune(batch: pa.Table) -> pa.Table:
        import ray as _ray
        hm = _ray.get(hot_ref)
        band = batch["band"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        bh = batch["band_hash"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        drop = np.zeros(len(band), dtype=bool)
        for b, hashes in hm.items():            # ≤ `bands` iterations
            in_band = band == b
            if in_band.any():
                pos = np.searchsorted(hashes, bh[in_band])
                pos = np.minimum(pos, len(hashes) - 1)
                drop[in_band] = hashes[pos] == bh[in_band]
        return batch.filter(pa.array(~drop))

    return (lb.map_batches(prune, batch_format="pyarrow"),
            rb.map_batches(prune, batch_format="pyarrow"))


def similarity_join(left: rd.Dataset, right: rd.Dataset,
                    threshold: float = 0.5, k: int = 5,
                    num_perm: int = 64, bands: int = 16,
                    left_id: str = "id_l", left_text: str = "text",
                    right_id: str = "id_r", right_text: str = "text",
                    seed: int = 1,
                    num_partitions: Optional[int] = None,
                    max_bucket: Optional[int] = None) -> rd.Dataset:
    """(left_id, right_id, jaccard) for every cross-table pair with
    k-shingle Jaccard ≥ ``threshold`` that shares ≥ 1 MinHash band
    bucket (recall is the standard LSH S-curve at
    ``bands`` × ``num_perm/bands``; equal texts always collide).

    ``max_bucket``: hot-bucket guard for boilerplate-heavy corpora — a
    (band, band_hash) bucket with more than ``max_bucket`` members on
    EITHER side is dropped (with a log line) before the join, bounding
    the candidate blowup at L·R ≤ max_bucket².  Oversized buckets are
    rare by construction (uniform 64-bit keys; only genuinely repeated
    near-identical text inflates one), so the blocklist is tiny and is
    applied as a broadcast probe — no extra shuffle join.  Pairs whose
    ONLY shared bucket is oversized are lost: this trades recall on
    boilerplate for a hard cost bound, exactly like SemDeDup's
    oversize-cluster guard.  Default None = exact (the oracle path)."""
    if num_partitions is None:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 4)

    def bucketed(ds: rd.Dataset, id_col: str, text_col: str,
                 out_id: str) -> rd.Dataset:
        b = minhash_buckets(ds, num_perm=num_perm, bands=bands,
                            shingle_k=k, id_col=id_col,
                            text_col=text_col, seed=seed)

        def rename(batch: pa.Table) -> pa.Table:
            return pa.table({out_id: batch[id_col],
                             "band": batch["band"],
                             "band_hash": batch["band_hash"]})
        return b.map_batches(rename, batch_format="pyarrow")

    lb = bucketed(left, left_id, left_text, "id_l").materialize()
    rb = bucketed(right, right_id, right_text, "id_r").materialize()
    if lb.count() == 0 or rb.count() == 0:
        # legitimately-empty side: short-circuit (and dodge the Ray 2.49
        # join-finalize crash on schema-less empty blocks, see ROADMAP).
        # The bucket tables are ~16 int rows/doc, so materializing them
        # costs far less than the texts the join would pull anyway.
        def _idt(ds: rd.Dataset, col: str):
            s = ds.schema()   # ray.data Schema: parallel names/types lists
            return s.types[s.names.index(col)] if s else pa.int64()
        return rd.from_arrow(pa.table({
            "id_l": pa.array([], type=_idt(left, left_id)),
            "id_r": pa.array([], type=_idt(right, right_id)),
            "jaccard": pa.array([], type=pa.float64())}))

    if max_bucket is not None:
        lb, rb = _drop_hot_buckets(lb, rb, max_bucket)

    cand = lb.join(rb, join_type="inner",
                   num_partitions=num_partitions,
                   on=("band", "band_hash")) \
        .select_columns(["id_l", "id_r"]) \
        .groupby(["id_l", "id_r"]).aggregate(Count()) \
        .select_columns(["id_l", "id_r"]) \
        .repartition(num_partitions).materialize()
    # ^ distinct over pair keys; repartition rebuilds the schema-less
    # empty blocks a groupby can emit before they hit the next join
    # (Ray 2.49, see ROADMAP "join empty-block bug")

    def rename_docs(ds: rd.Dataset, id_col: str, text_col: str,
                    out_id: str, out_text: str) -> rd.Dataset:
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({out_id: batch[id_col],
                             out_text: batch[text_col]})
        return ds.map_batches(fn, batch_format="pyarrow")

    with_l = cand.join(rename_docs(left, left_id, left_text,
                                   "id_l", "text_l"),
                       join_type="inner",
                       num_partitions=num_partitions,
                       on=("id_l",)).materialize()
    joined = with_l.join(rename_docs(right, right_id, right_text,
                                     "id_r", "text_r"),
                         join_type="inner",
                         num_partitions=num_partitions,
                         on=("id_r",))

    def verify(batch: pa.Table) -> pa.Table:
        ids_l, ids_r, out_j = [], [], []
        for a, b, ta, tb in zip(batch["id_l"].to_pylist(),
                                batch["id_r"].to_pylist(),
                                batch["text_l"].to_pylist(),
                                batch["text_r"].to_pylist()):
            j = jaccard(ta or "", tb or "", k)
            if j >= threshold:
                ids_l.append(a)
                ids_r.append(b)
                out_j.append(float(round_half_away(j, 6)))
        return pa.table({"id_l": pa.array(ids_l, type=batch["id_l"].type),
                         "id_r": pa.array(ids_r, type=batch["id_r"].type),
                         "jaccard": pa.array(out_j, type=pa.float64())})

    return joined.map_batches(verify, batch_format="pyarrow")
