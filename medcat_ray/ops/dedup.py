"""Deduplication operators over a documents table.

All operate on a ``ray.data.Dataset`` with an id column and a text column
and are built from map_batches (vectorized, deterministic hashing) plus the
minimum number of groupby shuffles:

* exact          — content-hash → native groupby-Min/Count → broadcast
                   probe of duplicated hashes only
* MinHash + LSH  — shingle → minhash → band → groupby(band bucket) →
                   star edges → union-find (driver fast path) or
                   distributed min-label propagation (scale path)
* SimHash        — 64-bit signature, Manku 3-of-6-block bucket tables
                   (exact for Hamming ≤ 3, bounded bucket sizes)
* n-gram Jaccard — verification of candidate pairs
* embedding      — cosine near-dup via multi-table hyperplane LSH with
                   recursive oversize-bucket splitting

Scale notes (10^12 rows): every shuffle here is keyed by a uniform hash
(content hash / band hash / hyperplane bucket), so no skew hotspots; all
singleton buckets are pruned by NATIVE aggregates before any per-group
Python runs, so pair verification touches only colliding buckets (volume
∝ duplicate rate, not corpus size); cluster resolution offers both a
driver union-find (small corpora) and join+groupby min-label propagation
(nothing driver-side) — identical outputs, unit-tested.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
from medcat_ray.ops.numeric import round_half_away
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Min

from medcat_ray.ops.hashing import (band_keys, minhash_params,
                                    minhash_signature, poly_hashes,
                                    shingle_hashes, simhash64, stable_u64,
                                    text_hashes)

# ---------------------------------------------------------------------------
# Exact dedup (D-exact)
# ---------------------------------------------------------------------------


def add_content_hash(ds: rd.Dataset, text_col: str = "text",
                     out_col: str = "content_hash") -> rd.Dataset:
    """64-bit content hash, stored BIT-WRAPPED as int64 (bijective): Ray's
    hash-shuffle re-infers uint64 key columns and falls back to
    pickled-object blocks for values ≥ 2^63, which then crash joins on the
    key — int64 stays native end to end."""
    def _hash(batch: pa.Table) -> pa.Table:
        hashes = np.fromiter(text_hashes(batch[text_col].to_pylist()),
                             dtype=np.uint64,
                             count=batch.num_rows).view(np.int64)
        return batch.append_column(out_col,
                                   pa.array(hashes, type=pa.int64()))
    return ds.map_batches(_hash, batch_format="pyarrow")


def _join_partitions(num_partitions: Optional[int]) -> int:
    """Safe default partition count for ONE Dataset.join in a plan: each
    join spins ``num_partitions`` aggregator actors that hold a CPU."""
    if num_partitions is not None:
        return num_partitions
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(2, cpus // 4)


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id",
                text_col: str = "text", method: str = "auto",
                broadcast_limit: int = 1_000_000,
                num_partitions: Optional[int] = None) -> rd.Dataset:
    """Keep one representative row (min id) per distinct text.

    Shape (SURVEY.md §2.7 D5 analogue): one NATIVE hash-partitioned
    ``groupby(content_hash).aggregate(Min, Count)`` — no per-group Python
    call — then only the DUPLICATED hashes (volume ∝ duplicate rate, not
    corpus size) filter the stream, by one of two paths:

    * ``broadcast``: the (hash → keep_id) map is ``ray.put`` once and
      probed per batch — fastest while the dup map fits in memory;
    * ``join``: the dup table stays in the object store and reaches the
      stream through one hash join on content_hash; a row survives iff
      its hash is unique (null ``keep_id``) or it is the representative.
      Nothing O(dup-rate × corpus) ever lands on the driver — the
      Common-Crawl-scale path (30-50% dup rates × 10^12 docs).
    * ``auto`` (default): counts the dup table and picks."""
    hashed = add_content_hash(ds, text_col)
    agg = hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n"))

    def non_singleton(batch: pa.Table) -> pa.Table:
        return batch.select(["content_hash", "keep_id"]).filter(
            pc.greater(batch["n"], 1))

    dup_ds = agg.map_batches(non_singleton, batch_format="pyarrow")
    if method == "auto":
        dup_ds = dup_ds.materialize()
        method = "broadcast" if dup_ds.count() <= broadcast_limit \
            else "join"

    if method == "join":
        dup_ds = dup_ds.materialize()
        if dup_ds.count() == 0:   # a fully-empty join side has no schema
            return ds              # at all (Ray 2.49) — and needs no join
        p = _join_partitions(num_partitions)
        # repartition rebuilds the groupby's schema-less empty blocks
        # (Ray 2.49 join-finalize crash, see _propagate_labels)
        joined = hashed.join(dup_ds.repartition(p), join_type="left_outer",
                             num_partitions=p, on=("content_hash",))

        def keep_reps(batch: pa.Table) -> pa.Table:
            keep_id = batch["keep_id"]
            mask = pc.or_kleene(pc.is_null(keep_id),
                                pc.equal(keep_id, batch[id_col]))
            return batch.filter(pc.fill_null(mask, False))

        return joined.map_batches(keep_reps, batch_format="pyarrow") \
            .drop_columns(["content_hash", "keep_id"])

    import ray
    dup = dup_ds.to_pandas()
    keep_map = {} if dup.empty else dict(zip(dup["content_hash"],
                                             dup["keep_id"]))
    keep_ref = ray.put(keep_map)

    def drop_non_reps(batch: pa.Table) -> pa.Table:
        keep = ray.get(keep_ref)
        ids = batch[id_col].to_pylist()
        hashes = batch["content_hash"].to_pylist()
        mask = pa.array([keep.get(h, i) == i for i, h in zip(ids, hashes)])
        return batch.filter(mask)

    return hashed.map_batches(drop_non_reps, batch_format="pyarrow") \
        .drop_columns(["content_hash"])


def exact_dup_stats(ds: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text") -> rd.Dataset:
    """(content_hash, n_dups, min_id) per duplicated text — audit view."""
    hashed = add_content_hash(ds, text_col)
    agg = hashed.groupby("content_hash").aggregate(
        Count(alias_name="n_dups"), Min(id_col, alias_name="keep_id"))
    return agg.filter(expr="n_dups > 1")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (D-minhash)
# ---------------------------------------------------------------------------


def _minhash_band_table(batch: pa.Table, a: np.ndarray, b: np.ndarray,
                        bands: int, rows: int, shingle_k: int,
                        id_col: str, text_col: str) -> pa.Table:
    """text → MinHash signature → LSH band-key rows, one pass.

    Signature math is per-doc (a (num_perm × n_shingles) temporary that
    stays L2-resident beats a batch-wide matrix by ~30× — measured); row
    assembly is vectorized (``take`` on repeated indices, no Python-list
    growth across the bands explosion)."""
    texts = batch[text_col].to_pylist()
    n = batch.num_rows
    sigs = np.empty((n, bands * rows), dtype=np.uint64)
    for i, text in enumerate(texts):
        sh = shingle_hashes(text or "", shingle_k)
        sigs[i] = minhash_signature(sh, a, b)
    keys = np.empty((n, bands), dtype=np.uint64)
    for band in range(bands):
        keys[:, band] = band_keys(sigs, band * rows, (band + 1) * rows)
    keys = keys.reshape(-1)
    ids = pc.take(batch[id_col].combine_chunks(),
                  pa.array(np.repeat(np.arange(n, dtype=np.int64), bands)))
    band_col = np.tile(np.arange(bands, dtype=np.int32), n)
    # bit-wrap the uint64 key into int64 (bijective) like
    # add_content_hash: Ray's hash-aggregate re-infers key columns
    # from Python values and falls back to slow pickled-object blocks
    # for ints ≥ 2^63 — int64 stays native end to end.
    return pa.table({
        id_col: ids,
        "band": pa.array(band_col, type=pa.int32()),
        "band_hash": pa.array(keys.view(np.int64), type=pa.int64()),
    })


class MinHashStage:
    """Batch op: text → MinHash signature + LSH band keys.

    Permutation params are built once in ``__init__``.  The state is tiny
    (2 × num_perm uint64), so this also serializes cheaply as a plain
    task-pool callable — no actor pool needed (see
    :func:`minhash_buckets`)."""

    def __init__(self, num_perm: int = 64, bands: int = 16,
                 shingle_k: int = 5, id_col: str = "doc_id",
                 text_col: str = "text", seed: int = 1) -> None:
        assert num_perm % bands == 0
        self.a, self.b = minhash_params(num_perm, seed)
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _minhash_band_table(batch, self.a, self.b, self.bands,
                                   self.rows, self.shingle_k, self.id_col,
                                   self.text_col)


def minhash_buckets(ds: rd.Dataset, num_perm: int = 64, bands: int = 16,
                    shingle_k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text",
                    concurrency: int = 4, seed: int = 1) -> rd.Dataset:
    """(id, band, band_hash) rows — the exploded LSH index.

    Runs as a TASK pool, not an actor pool: the only per-worker state is
    the 1 KB permutation-parameter pair, so pinning actors would pay pool
    spin-up (~seconds) for nothing.  ``concurrency`` is kept for API
    stability but tasks schedule freely."""
    del concurrency  # task pool: scheduler-managed parallelism
    stage = MinHashStage(num_perm=num_perm, bands=bands,
                         shingle_k=shingle_k, id_col=id_col,
                         text_col=text_col, seed=seed)
    return ds.map_batches(stage, batch_format="pyarrow")


def _unionfind_labels(edge_df: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Exact connected components of the (id, rep) star-edge list via
    union-find (union by min root + path compression).  Driver-side: edge
    volume ∝ duplicate rate, the documented small-corpus fast path."""
    parent: Dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(edge_df[id_col], edge_df["rep"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # smaller id becomes the root
    nodes = sorted(set(edge_df[id_col]) | set(edge_df["rep"]))
    return pd.DataFrame({id_col: nodes, "rep": [find(n) for n in nodes]})


def _propagate_labels(edges: rd.Dataset, id_col: str,
                      max_rounds: int = 64,
                      num_partitions: int = 16) -> rd.Dataset:
    """Distributed connected components over (id, rep) star edges by
    min-label propagation: no edge or label table ever leaves the object
    store.  Each round is one hash join (labels onto edge endpoints) plus
    one groupby-min; converged when the (node, label) checksum stops
    changing.  The checksum is a Sum over a per-row BOUNDED hash
    (stable_u64 % 1e6+3): labels per node are monotone non-increasing, so
    an unchanged sum means an unchanged table up to a ~2^-43 collision —
    and unlike summing raw labels it works for STRING ids and cannot
    overflow int64 at 10^12 nodes (1e12 × 1e6 < 2^63).
    Rounds ∝ component diameter — LSH dup components are star-like, so a
    handful in practice (``max_rounds`` is a safety cap, asserted)."""
    from ray.data.aggregate import Sum

    _CKSUM_MOD = 1_000_003

    def add_checksum(batch: pa.Table) -> pa.Table:
        vals = [stable_u64(f"{n}\x00{l}".encode()) % _CKSUM_MOD
                for n, l in zip(batch["node"].to_pylist(),
                                batch["label"].to_pylist())]
        return pa.table({"cksum": pa.array(vals, type=pa.int64())})

    def checksum(label_ds: rd.Dataset) -> int:
        agg = label_ds.map_batches(add_checksum, batch_format="pyarrow") \
            .aggregate(Sum("cksum"))
        return agg["sum(cksum)"]

    def symmetrize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        reps = batch["rep"].combine_chunks()
        return pa.table({"src": pa.concat_arrays([ids, reps]),
                         "dst": pa.concat_arrays([reps, ids])})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow") \
        .materialize()

    def as_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["src"], "label": batch["dst"]})

    labels = sym.map_batches(as_labels, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("label", alias_name="label")) \
        .repartition(num_partitions).materialize()
    prev_sum = checksum(labels)
    for _ in range(max_rounds):
        # candidate label for each edge's src = its dst neighbor's label
        cand = sym.join(labels, join_type="inner",
                        num_partitions=num_partitions,
                        on=("dst",), right_on=("node",)) \
            .map_batches(lambda b: pa.table({"node": b["src"],
                                             "label": b["label"]}),
                         batch_format="pyarrow")
        # repartition rebuilds blocks: the groupby aggregator emits
        # schema-less empty blocks for empty partitions, which crash the
        # NEXT round's join finalize (Ray 2.49 — pa.Table.join can't
        # resolve the key on a zero-column right table)
        labels = labels.union(cand).groupby("node").aggregate(
            Min("label", alias_name="label")) \
            .repartition(num_partitions).materialize()
        cur_sum = checksum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"label propagation did not converge in {max_rounds} rounds")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch["node"], "rep": batch["label"]})
    return labels.map_batches(rename, batch_format="pyarrow")


def connected_components(edges: rd.Dataset, src_col: str = "src",
                         dst_col: str = "dst", max_rounds: int = 64,
                         num_partitions: int = 16) -> rd.Dataset:
    """Distributed connected components over an ARBITRARY undirected
    edge list: ``(node, component)`` for every endpoint, where component
    is the minimum node id reachable (the conventional min-label
    canonical representative).

    Public wrapper around the min-label propagation used by the dedup
    family (:func:`_propagate_labels` — one hash join + one groupby-min
    per round, bounded-hash convergence checksum, nothing driver-side).
    Rounds ∝ component diameter, so path-like graphs pay diameter
    rounds; dedup-style star components converge in a handful.
    """
    def star(batch: pa.Table) -> pa.Table:
        return pa.table({"node_id": batch[src_col].combine_chunks(),
                         "rep": batch[dst_col].combine_chunks()})

    labs = _propagate_labels(
        edges.map_batches(star, batch_format="pyarrow"),
        "node_id", max_rounds=max_rounds,
        num_partitions=num_partitions)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node_id"],
                         "component": batch["rep"]})
    return labs.map_batches(rename, batch_format="pyarrow")


def minhash_star_edges(ds: rd.Dataset, num_perm: int = 64,
                       bands: int = 16, shingle_k: int = 5,
                       id_col: str = "doc_id", text_col: str = "text",
                       concurrency: int = 4, method: str = "auto",
                       bucket_driver_limit: int = 4_000_000) -> rd.Dataset:
    """(id, rep) star edges: rep = min doc id of each shared LSH bucket.

    Star edges WITHOUT a per-group Python call (map_groups pays ~100µs
    of pandas overhead per bucket — 70k tiny buckets made it the whole
    wall time): one NATIVE groupby computes each bucket's (min id, size);
    only NON-singleton buckets — volume ∝ duplicate rate, not corpus
    size — are broadcast (per-band sorted hash arrays) and probed per
    batch with ``searchsorted`` to emit (id, rep) edges.  The bucket
    table is materialized ONCE — it feeds both the groupby and the probe
    (lazy re-execution would run the signature stage twice).  Edges are
    deduplicated per batch: near-identical docs collide in most of their
    ``bands`` buckets with the same representative, so the unique pass
    shrinks the edge table ~bands× before the cluster step counts it.

    Bucket-representative resolution is auto-gated like the cluster and
    representative steps: the distributed groupby spins aggregator actors
    whose fixed spin-up dwarfs small inputs, so when the (already
    materialized) bucket table is ≤ ``bucket_driver_limit`` rows
    (id + band + hash ≈ 24 B/row) it is resolved with one driver-side
    vectorized pass instead; above the limit — the 10^12-doc path — the
    NATIVE hash-partitioned groupby runs and nothing corpus-sized leaves
    the store."""
    import ray

    buckets = minhash_buckets(ds, num_perm, bands, shingle_k, id_col,
                              text_col, concurrency).materialize()
    if method == "auto":
        method = "driver" if buckets.count() <= bucket_driver_limit \
            else "distributed"

    if method == "driver":
        bdf = buckets.to_pandas()
        grp = bdf.groupby(["band", "band_hash"], sort=False)[id_col]
        rep = grp.transform("min")
        n = grp.transform("size")
        hit = bdf[n > 1]
        edges = pd.DataFrame({id_col: hit[id_col],
                              "rep": rep[n > 1]}).drop_duplicates()
        return rd.from_pandas(edges.reset_index(drop=True))

    bucket_rep = buckets.groupby(["band", "band_hash"]).aggregate(
        Min(id_col, alias_name="rep"), Count(alias_name="n"))

    def non_singleton(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["n"], 1))

    cand = bucket_rep.map_batches(non_singleton,
                                  batch_format="pyarrow").to_pandas()
    # per-band sorted (hash → rep) arrays: exact, vectorized probes
    band_tables = {}
    for b in range(bands):
        sel = cand[cand["band"] == b]
        order = np.argsort(sel["band_hash"].to_numpy(), kind="stable")
        band_tables[b] = (sel["band_hash"].to_numpy()[order],
                          sel["rep"].to_numpy()[order])
    rep_ref = ray.put(band_tables)

    def probe(batch: pa.Table) -> pa.Table:
        tables = ray.get(rep_ref)
        bh = batch["band_hash"].to_numpy(zero_copy_only=False)
        bd = batch["band"].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        hit = np.zeros(len(bh), dtype=bool)
        rep_at = np.empty(len(bh), dtype=object)
        for b, (hashes, reps) in tables.items():
            m = bd == b
            if len(hashes) == 0 or not m.any():
                continue
            v = bh[m]
            pos = np.minimum(np.searchsorted(hashes, v), len(hashes) - 1)
            found = hashes[pos] == v
            sub = np.zeros(len(bh), dtype=bool)
            sub[np.flatnonzero(m)[found]] = True
            hit |= sub
            rep_at[sub] = reps[pos[found]]
        id_type = batch[id_col].type  # keep typed even when empty
        out = pd.DataFrame({id_col: ids[hit],
                            "rep": rep_at[hit]}).drop_duplicates()
        return pa.table({id_col: pa.array(out[id_col], type=id_type),
                         "rep": pa.array(out["rep"], type=id_type)})

    return buckets.map_batches(probe, batch_format="pyarrow")


def minhash_dedup_clusters(ds: rd.Dataset, num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 5,
                           id_col: str = "doc_id", text_col: str = "text",
                           concurrency: int = 4,
                           method: str = "auto",
                           driver_limit: int = 2_000_000) -> rd.Dataset:
    """Near-dup clusters: (doc_id, rep) with rep = min doc id of the
    connected component induced by shared LSH buckets.

    Shingling, minhashing, band bucketing and star-edge generation are all
    distributed (map_batches + one groupby on the uniform band hash).
    Component resolution over the star edges has two paths:

    * ``method="driver"``: the edge list — docs sharing at least one
      bucket, volume ∝ duplicate rate — comes to the driver for an exact
      union-find.  The small/medium-corpus fast path.
    * ``method="distributed"``: iterated min-label propagation (join +
      groupby-min per round) entirely inside the object store — the
      10^12-doc path where the edge table no longer fits on the driver.
    * ``method="auto"`` (default): counts the (already materialized) edge
      table and picks — ≤ ``driver_limit`` edges union-find on the
      driver, above it nothing O(dup-rate × corpus) leaves the store.

    Both paths produce identical (id, rep) labels (unit-tested, including
    chained components A~C, B~C with A !~ B)."""
    edges = minhash_star_edges(ds, num_perm, bands, shingle_k, id_col,
                               text_col, concurrency)
    if method == "auto":
        edges = edges.materialize()
        method = "driver" if edges.count() <= driver_limit \
            else "distributed"
    if method == "distributed":
        return _propagate_labels(edges, id_col)
    return rd.from_pandas(_unionfind_labels(edges.to_pandas(), id_col))


def minhash_dedup(ds: rd.Dataset, num_partitions: Optional[int] = None,
                  **kw) -> rd.Dataset:
    """Representatives after near-dup clustering: drop every row whose
    cluster label names a different representative.

    ``method="driver"`` (small corpora): the union-find label table is
    already driver-side — the non-representative id set is broadcast and
    filtered per batch.

    ``method="distributed"`` (the 10^12-doc path): the label table from
    min-label propagation stays in the object store; non-representative
    ids ANTI-JOIN the docs stream (``join_type="left_anti"``) — nothing
    O(dup-rate × corpus) ever comes to the driver.  Outputs equal the
    broadcast path (unit-tested)."""
    id_col = kw.get("id_col", "doc_id")
    method = kw.get("method", "auto")
    clusters = minhash_dedup_clusters(ds, **kw)
    if method == "auto":
        # the label table is O(dup docs); gate the broadcast filter on it
        clusters = clusters.materialize()
        method = "driver" if clusters.count() <= \
            kw.get("driver_limit", 2_000_000) else "distributed"

    if method == "distributed":
        def nonrep_ids(batch: pa.Table) -> pa.Table:
            keep = pc.not_equal(batch[id_col], batch["rep"])
            return batch.select([id_col]).filter(keep)
        p = _join_partitions(num_partitions)
        nonrep = clusters.map_batches(nonrep_ids, batch_format="pyarrow") \
            .materialize()
        if nonrep.count() == 0:   # fully-empty join side: no schema (Ray
            return ds              # 2.49) — and nothing to drop anyway
        return ds.join(nonrep.repartition(p), join_type="left_anti",
                       num_partitions=p, on=(id_col,))

    import ray
    dup_df = clusters.to_pandas()
    dup_ids = set(dup_df.loc[dup_df[id_col] != dup_df["rep"], id_col])
    dup_ref = ray.put(dup_ids)

    def drop_dups(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        mask = pa.array([i not in dups for i in batch[id_col].to_pylist()])
        return batch.filter(mask)
    return ds.map_batches(drop_dups, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash near-dup (D-simhash)
# ---------------------------------------------------------------------------


def add_simhash(ds: rd.Dataset, text_col: str = "text",
                out_col: str = "simhash") -> rd.Dataset:
    def _sim(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch[text_col].to_pylist():
            toks = sorted(set((text or "").lower().split()))
            out.append(simhash64(poly_hashes(toks)))
        return batch.append_column(out_col, pa.array(out, type=pa.uint64()))
    return ds.map_batches(_sim, batch_format="pyarrow")


# Manku-style block scheme for Hamming distance ≤ 3 on 64 bits: 6 blocks
# (widths 11,11,11,11,10,10); if ham ≤ 3 at most 3 blocks differ, so some
# 3-of-6 block combination matches exactly → C(6,3)=20 bucket tables over a
# ≥2^32 keyspace (bucket size stays bounded as the corpus grows, unlike a
# 16-bit chunk key whose buckets grow linearly).  Cf. Manku, Jain & Sarma,
# "Detecting Near-Duplicates for Web Crawling", WWW 2007.
_SIM_WIDTHS = (11, 11, 11, 11, 10, 10)
_SIM_OFFS = tuple(int(np.cumsum((0,) + _SIM_WIDTHS)[i]) for i in range(6))
_SIM_COMBOS = tuple((i, j, k) for i in range(6) for j in range(i + 1, 6)
                    for k in range(j + 1, 6))  # 20 combos
_SIM_HAM_MAX = 3


def _simhash_block(h: np.ndarray, b: int) -> np.ndarray:
    mask = np.uint64((1 << _SIM_WIDTHS[b]) - 1)
    return (h >> np.uint64(_SIM_OFFS[b])) & mask


def simhash_candidates(ds: rd.Dataset, id_col: str = "doc_id",
                       text_col: str = "text", method: str = "auto",
                       bucket_driver_limit: int = 4_000_000,
                       sig_col: Optional[str] = None) -> rd.Dataset:
    """Near-dup candidate pairs: all doc pairs at SimHash Hamming
    distance ≤ 3 (exact by the 3-of-6-block pigeonhole; see scheme above).

    Shape: vectorized explode to 20 (bucket, id, simhash) rows per doc →
    one NATIVE groupby-count prunes singleton buckets (collision volume ∝
    near-dup rate, not corpus size) → vectorized XOR+popcount pair check
    inside the surviving buckets only → distinct over pair keys.

    Like the MinHash bucket step, candidate resolution is auto-gated: the
    distributed path costs three groupby shuffles whose aggregator-actor
    spin-up dwarfs small inputs, so a ≤ ``bucket_driver_limit``-row
    exploded table (20 rows/doc × 24 B) resolves in one vectorized
    driver pass — identical pairs, same triu/popcount kernels.  Above the
    limit the NATIVE shuffles run and nothing corpus-sized leaves the
    store."""
    import ray
    from medcat_ray.ops.hashing import popcount64

    if sig_col is None:
        sims = add_simhash(ds, text_col)
    else:
        # precomputed 64-bit signature (int64 bit-wrapped or uint64) —
        # e.g. an image perceptual hash (ops/multimodal.py:add_image_ahash);
        # the 3-of-6-block candidate machinery is signature-agnostic
        def as_simhash(batch: pa.Table) -> pa.Table:
            sig = batch[sig_col].to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            return pa.table({id_col: batch[id_col].combine_chunks(),
                             "simhash": pa.array(sig, type=pa.uint64())})
        sims = ds.map_batches(as_simhash, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        blocks = [_simhash_block(h, b) for b in range(6)]
        n = len(h)
        keys = np.empty((len(_SIM_COMBOS), n), dtype=np.uint64)
        for ci, (i, j, k) in enumerate(_SIM_COMBOS):
            # 3 concatenated block values (≤33 bits) + combo id in the top
            key = blocks[i] \
                | (blocks[j] << np.uint64(_SIM_WIDTHS[i])) \
                | (blocks[k] << np.uint64(_SIM_WIDTHS[i] + _SIM_WIDTHS[j]))
            keys[ci] = key | (np.uint64(ci) << np.uint64(36))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.tile(ids, len(_SIM_COMBOS))),
            "bucket": pa.array(keys.reshape(-1), type=pa.uint64()),
            "simhash": pa.array(np.tile(h, len(_SIM_COMBOS)),
                                type=pa.uint64()),
        })

    # materialized ONCE: it feeds both the count groupby and the keep_hot
    # probe — lazy re-execution would run simhashing + explode twice
    exploded = sims.map_batches(explode, batch_format="pyarrow") \
        .materialize()
    if method == "auto":
        method = "driver" if exploded.count() <= bucket_driver_limit \
            else "distributed"

    if method == "driver":
        df = exploded.to_pandas()
        bk = df["bucket"].to_numpy().astype(np.uint64)
        order = np.argsort(bk, kind="stable")
        bk_s = bk[order]
        ids_s = df[id_col].to_numpy()[order]
        h_s = df["simhash"].to_numpy().astype(np.uint64)[order]
        starts = np.flatnonzero(
            np.concatenate([[True], bk_s[1:] != bk_s[:-1]]))
        ends = np.concatenate([starts[1:], [len(bk_s)]])
        big = (ends - starts) > 1
        out_a: List[np.ndarray] = []
        out_b: List[np.ndarray] = []
        out_h: List[np.ndarray] = []
        for s, e in zip(starts[big], ends[big]):
            gi, gh = ids_s[s:e], h_s[s:e]
            srt = np.argsort(gi, kind="stable")
            gi, gh = gi[srt], gh[srt]
            iu, ju = np.triu_indices(e - s, k=1)
            ham = popcount64(gh[iu] ^ gh[ju])
            keep = (ham <= _SIM_HAM_MAX) & (gi[iu] != gi[ju])
            out_a.append(gi[iu][keep])
            out_b.append(gi[ju][keep])
            out_h.append(ham[keep])
        if out_a and sum(len(x) for x in out_a):
            pdf = pd.DataFrame({
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }).groupby(["id_a", "id_b"], as_index=False)["hamming"].min()
        else:
            pdf = pd.DataFrame({
                "id_a": pd.Series([], dtype=df[id_col].dtype),
                "id_b": pd.Series([], dtype=df[id_col].dtype),
                "hamming": pd.Series([], dtype="int64"),
            })
        return rd.from_pandas(pdf.reset_index(drop=True))

    counts = exploded.groupby("bucket").aggregate(Count(alias_name="n"))

    def non_singleton(batch: pa.Table) -> pa.Table:
        return batch.select(["bucket"]).filter(pc.greater(batch["n"], 1))

    hot = counts.map_batches(non_singleton, batch_format="pyarrow") \
        .to_pandas()
    hot_arr = np.array([], dtype=np.uint64) if hot.empty \
        else np.sort(hot["bucket"].to_numpy().astype(np.uint64))
    hot_ref = ray.put(hot_arr)

    def keep_hot(batch: pa.Table) -> pa.Table:
        hot_sorted = ray.get(hot_ref)
        b = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(hot_sorted) == 0:
            mask = np.zeros(len(b), dtype=bool)
        else:
            idx = np.minimum(np.searchsorted(hot_sorted, b),
                             len(hot_sorted) - 1)
            mask = hot_sorted[idx] == b
        return batch.filter(pa.array(mask))

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        h = g["simhash"].to_numpy().astype(np.uint64)
        iu, ju = np.triu_indices(len(ids), k=1)
        ham = popcount64(h[iu] ^ h[ju])
        keep = (ham <= _SIM_HAM_MAX) & (ids[iu] != ids[ju])
        return pd.DataFrame({"id_a": ids[iu][keep], "id_b": ids[ju][keep],
                             "hamming": ham[keep]})

    pairs = exploded.map_batches(keep_hot, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    # a pair can match in several block combos → distinct
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (D-jaccard)
# ---------------------------------------------------------------------------


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-shingle Jaccard similarity of two texts."""
    sa = set(shingle_hashes(text_a, k).tolist())
    sb = set(shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def verify_pairs_jaccard(pairs: rd.Dataset, docs: rd.Dataset,
                         threshold: float = 0.8, k: int = 5,
                         id_col: str = "doc_id",
                         text_col: str = "text", method: str = "auto",
                         broadcast_limit: int = 1_000_000,
                         num_partitions: Optional[int] = None) -> rd.Dataset:
    """Filter candidate pairs by exact Jaccard.

    Two paths, auto-gated on the measured candidate volume exactly like
    :func:`exact_dedup`:

    * ``broadcast``: the pair list comes to the driver and the needed
      texts are fetched by a broadcast id probe — fastest while the
      candidate set is small;
    * ``distributed``: :func:`verify_pairs_jaccard_distributed` — texts
      reach their pairs via two hash joins, nothing pair- or corpus-sized
      ever lands on the driver (the 30-50%-dup-rate × 10^12-doc path);
    * ``auto`` (default): counts the pair table and picks."""
    import ray
    if method == "auto":
        pairs = pairs.materialize()
        method = "broadcast" if pairs.count() <= broadcast_limit \
            else "distributed"
    if method == "distributed":
        return verify_pairs_jaccard_distributed(
            pairs, docs, threshold=threshold, k=k, id_col=id_col,
            text_col=text_col, num_partitions=num_partitions)
    pair_rows = pairs.to_pandas()
    need = np.unique(np.concatenate([pair_rows["id_a"].to_numpy(),
                                     pair_rows["id_b"].to_numpy()])) \
        if len(pair_rows) else np.array([], dtype=np.int64)
    need_ref = ray.put(need)

    def grab(batch: pa.Table) -> pa.Table:
        need_sorted = ray.get(need_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(need_sorted) == 0:
            mask = np.zeros(len(ids), dtype=bool)
        else:
            pos = np.minimum(np.searchsorted(need_sorted, ids),
                             len(need_sorted) - 1)
            mask = need_sorted[pos] == ids
        return batch.select([id_col, text_col]).filter(pa.array(mask))
    texts = {r[id_col]: r[text_col]
             for r in docs.map_batches(grab, batch_format="pyarrow")
             .to_pandas().to_dict("records")}
    out = []
    for r in pair_rows.to_dict("records"):
        j = jaccard(texts.get(r["id_a"], ""), texts.get(r["id_b"], ""), k)
        if j >= threshold:
            out.append({"id_a": r["id_a"], "id_b": r["id_b"],
                        "jaccard": float(round_half_away(j, 6))})
    return rd.from_pandas(pd.DataFrame(out,
                                       columns=["id_a", "id_b", "jaccard"]))


def verify_pairs_jaccard_distributed(pairs: rd.Dataset, docs: rd.Dataset,
                                     threshold: float = 0.8, k: int = 5,
                                     id_col: str = "doc_id",
                                     text_col: str = "text",
                                     num_partitions: Optional[int] = None
                                     ) -> rd.Dataset:
    """Distributed exact-Jaccard verification: candidate texts reach their
    pairs via two hash joins (pairs⋈docs on id_a, then on id_b) — no pair
    or text table ever comes to the driver.  The scale path when the
    candidate volume no longer fits the broadcast used by
    :func:`verify_pairs_jaccard` (same outputs, unit-tested)."""
    if num_partitions is None:
        # BOTH joins run concurrently in one streaming plan; their
        # aggregator actors each hold a CPU, so cap 2×P at the cluster
        # CPU count or the plan deadlocks on small sessions
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 4)

    def rename(col_id: str, col_text: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({col_id: batch[id_col],
                             col_text: batch[text_col]})
        return fn

    docs_a = docs.map_batches(rename("id_a", "text_a"),
                              batch_format="pyarrow")
    docs_b = docs.map_batches(rename("id_b", "text_b"),
                              batch_format="pyarrow")
    joined = pairs.join(docs_a, join_type="inner",
                        num_partitions=num_partitions, on=("id_a",)) \
        .join(docs_b, join_type="inner",
              num_partitions=num_partitions, on=("id_b",))

    def verify(batch: pa.Table) -> pa.Table:
        ids_a, ids_b, out_j = [], [], []
        for a, b, ta, tb in zip(batch["id_a"].to_pylist(),
                                batch["id_b"].to_pylist(),
                                batch["text_a"].to_pylist(),
                                batch["text_b"].to_pylist()):
            j = jaccard(ta or "", tb or "", k)
            if j >= threshold:
                ids_a.append(a)
                ids_b.append(b)
                out_j.append(float(round_half_away(j, 6)))
        return pa.table({"id_a": pa.array(ids_a, type=batch["id_a"].type),
                         "id_b": pa.array(ids_b, type=batch["id_b"].type),
                         "jaccard": pa.array(out_j, type=pa.float64())})

    return joined.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (D-embed)
# ---------------------------------------------------------------------------


def embedding_near_dups(ds: rd.Dataset, threshold: float = 0.95,
                        n_planes: int = 16, n_tables: int = 4,
                        max_bucket: int = 512, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        seed: int = 3, method: str = "auto",
                        broadcast_limit: int = 1_000_000,
                        num_partitions: Optional[int] = None) -> rd.Dataset:
    """Cosine near-duplicate pairs via multi-table random-hyperplane LSH.

    ``n_tables`` independent hash tables of ``n_planes`` sign bits each;
    per-table recall for a pair at angle θ is (1-θ/π)^n_planes, unioning
    tables raises it to 1-(1-p)^n_tables (pairs with *identical* sign
    patterns — e.g. scaled copies — are found with recall 1).  Bucket
    sizes are bounded two ways: the 2^n_planes keyspace per table, and a
    deterministic recursive sub-split with extra hyperplanes for any
    bucket larger than ``max_bucket`` (the whole-bucket dense matmul never
    exceeds max_bucket²).  Singleton buckets are pruned by a NATIVE
    groupby-count before any per-group Python runs, so the pair stage
    touches only colliding buckets (volume ∝ near-dup rate).

    The hot-bucket set itself is volume ∝ near-dup rate, so it is
    auto-gated like :func:`exact_dedup`: below ``broadcast_limit`` it is
    ``ray.put`` once and probed per batch (``method="broadcast"``); above
    it stays in the object store and reaches the stream through one inner
    hash join on the bucket key (``method="join"``) — nothing
    near-dup-rate-sized ever lands on the driver."""
    import ray
    from ray.data.aggregate import Max

    first = ds.take(1)
    if not first:
        return rd.from_items([])
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, dim, n_planes))
    _split_depth = 8
    split_planes = rng.normal(size=(_split_depth, dim, 4))
    shifts = np.arange(n_planes, dtype=np.uint64)[None, :]

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        n = len(vecs)
        keys = np.empty((n_tables, n), dtype=np.uint64)
        for t in range(n_tables):
            signs = (vecs @ planes[t]) > 0
            keys[t] = (signs.astype(np.uint64) << shifts).sum(axis=1) \
                | (np.uint64(t) << np.uint64(n_planes))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # bucket keys bit-wrapped to int64 (bijective) like
        # add_content_hash: int64 stays native through Ray's hash
        # aggregate AND is joinable on the distributed hot-bucket path
        return pa.table({
            id_col: pa.array(np.tile(ids, n_tables)),
            "bucket": pa.array(keys.reshape(-1).view(np.int64),
                               type=pa.int64()),
            vec_col: pa.concat_arrays(
                [batch[vec_col].combine_chunks()] * n_tables),
        })

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    counts = bucketed.groupby("bucket").aggregate(Count(alias_name="n"))

    def non_singleton(batch: pa.Table) -> pa.Table:
        return batch.select(["bucket"]).filter(pc.greater(batch["n"], 1))

    hot_ds = counts.map_batches(non_singleton, batch_format="pyarrow")
    if method == "auto":
        hot_ds = hot_ds.materialize()
        method = "broadcast" if hot_ds.count() <= broadcast_limit \
            else "join"

    if method == "join":
        p = _join_partitions(num_partitions)

        # Arrow's hash join rejects list-typed non-key fields — pack the
        # vector to a float64 binary blob for the join, decoded by
        # bucket_cosine_pairs (np.frombuffer, zero-copy)
        def pack_vec(batch: pa.Table) -> pa.Table:
            vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
            return pa.table({
                id_col: batch[id_col],
                "bucket": batch["bucket"],
                vec_col: pa.array([v.tobytes() for v in vecs],
                                  type=pa.binary()),
            })

        packed = bucketed.map_batches(pack_vec, batch_format="pyarrow")
        # repartition rebuilds the groupby's schema-less empty blocks
        # (Ray 2.49 join-finalize crash, see _propagate_labels)
        hot_rows = packed.join(hot_ds.repartition(p), join_type="inner",
                               num_partitions=p, on=("bucket",))
    else:
        hot = hot_ds.to_pandas()
        hot_arr = np.array([], dtype=np.int64) if hot.empty \
            else np.sort(hot["bucket"].to_numpy().astype(np.int64))
        hot_ref = ray.put(hot_arr)

        def keep_hot(batch: pa.Table) -> pa.Table:
            hot_sorted = ray.get(hot_ref)
            b = batch["bucket"].to_numpy(zero_copy_only=False)
            if len(hot_sorted) == 0:
                mask = np.zeros(len(b), dtype=bool)
            else:
                idx = np.minimum(np.searchsorted(hot_sorted, b),
                                 len(hot_sorted) - 1)
                mask = hot_sorted[idx] == b
            return batch.filter(pa.array(mask))

        hot_rows = bucketed.map_batches(keep_hot, batch_format="pyarrow")

    def bucket_cosine_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        cells = g[vec_col].tolist()
        if cells and isinstance(cells[0], (bytes, bytearray)):
            V = np.stack([np.frombuffer(c, dtype=np.float64)
                          for c in cells])
        else:
            V = np.array(cells, dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        U = V / norms[:, None]
        out_a, out_b, out_c = [], [], []

        def emit(sel: np.ndarray) -> None:
            S = U[sel] @ U[sel].T
            iu, ju = np.triu_indices(len(sel), k=1)
            keep = (S[iu, ju] >= threshold) & (ids[sel][iu] != ids[sel][ju])
            out_a.extend(ids[sel][iu][keep])
            out_b.extend(ids[sel][ju][keep])
            out_c.extend(round_half_away(S[iu, ju][keep], 6))

        def sub(sel: np.ndarray, depth: int) -> None:
            if len(sel) <= max_bucket or depth >= _split_depth:
                emit(sel)
                return
            # deterministic sub-split with extra planes; identical-sign
            # pairs (the near-dup signal) stay co-bucketed
            signs = (U[sel] @ split_planes[depth]) > 0
            sub_keys = (signs.astype(np.uint64) <<
                        np.arange(4, dtype=np.uint64)[None, :]).sum(axis=1)
            for key in np.unique(sub_keys):
                members = sel[sub_keys == key]
                if len(members) > 1:
                    sub(members, depth + 1)

        sub(np.arange(len(ids)), 0)
        return pd.DataFrame({
            "id_a": np.asarray(out_a, dtype=ids.dtype),
            "id_b": np.asarray(out_b, dtype=ids.dtype),
            "cosine": np.asarray(out_c, dtype=np.float64)})

    pairs = hot_rows.groupby("bucket").map_groups(bucket_cosine_pairs,
                                                  batch_format="pandas")
    # the same pair can collide in several tables → distinct
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("cosine", alias_name="cosine"))
