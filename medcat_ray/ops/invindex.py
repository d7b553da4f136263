"""Write-time partitioned inverted index (token → postings) with
READ-TIME shard pruning — the text twin of the IVF vector index
(ops/similarity.py:build_ivf_index): a lookup reads 1/n_shards of the
index, enforced by the storage layout rather than a filter.

* build: one ``map_batches`` pass explodes each document into
  ``(shard, term, doc_id, tf)`` postings (shard = splitmix64(term-hash)
  mod n_shards — uniform, no hot shards) →
  ``write_parquet(partition_cols=["shard"])``.  Postings are the only
  corpus-sized artifact and they stream straight to storage.
* lookup: hash the probe term, list ONLY its ``shard=`` directory, read
  with ``columns=`` pruning and filter to the exact term.

Tokenization matches the rest of the text-op family
(``text.lower().split()``), and the term hash is the SQL-recomputable
``poly_hashes`` stream, so a DuckDB twin can verify both the postings
and the shard assignment bit-for-bit.
"""

from __future__ import annotations

import glob
import os
import shutil
from typing import List

import numpy as np
import pyarrow as pa

import ray.data as rd

from medcat_ray.ops.hashing import poly_hashes


def term_shard(terms: List[str], n_shards: int) -> np.ndarray:
    """Shard id per term: poly+splitmix64 hash mod n_shards (int64)."""
    return (poly_hashes(terms) % np.uint64(n_shards)).astype(np.int64)


def build_inverted_index(ds: rd.Dataset, index_dir: str,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         n_shards: int = 32) -> str:
    """Materialize the index; returns ``index_dir``.  A non-empty dir is
    cleared first (parquet writes APPEND into existing ``shard=``
    directories — rebuilding over a crashed build would duplicate
    postings)."""
    if os.path.isdir(index_dir) and os.listdir(index_dir):
        shutil.rmtree(index_dir)

    def explode(batch: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            toks = (t or "").lower().split()
            if not toks:
                continue
            u, c = np.unique(np.asarray(toks, dtype=object),
                             return_counts=True)
            ids.extend([i] * len(u))
            terms.extend(u.tolist())
            tfs.append(c)
        tf = (np.concatenate(tfs).astype(np.int64) if tfs
              else np.array([], dtype=np.int64))
        shard = (term_shard(terms, n_shards) if terms
                 else np.array([], dtype=np.int64))
        return pa.table({
            "shard": pa.array(shard, type=pa.int64()),
            "term": pa.array(terms, type=pa.string()),
            id_col: pa.array(ids, type=batch[id_col].type),
            "tf": pa.array(tf, type=pa.int64())})

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(explode, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["shard"])
    return index_dir


def lookup_postings(index_dir: str, term: str, n_shards: int = 32,
                    id_col: str = "doc_id") -> rd.Dataset:
    """Postings (id, tf) of one term — reads ONLY the term's shard
    directory."""
    shard = int(term_shard([term.lower()], n_shards)[0])
    paths = sorted(glob.glob(os.path.join(index_dir, f"shard={shard}",
                                          "*.parquet")))
    if not paths:
        return rd.from_items([])
    posts = rd.read_parquet(paths, columns=["term", id_col, "tf"])

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.equal(batch["term"], term.lower())) \
            .select([id_col, "tf"])

    return posts.map_batches(keep, batch_format="pyarrow")
