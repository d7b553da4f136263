"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by the log importance ratio
of two hashed-n-gram bag models, one fit on a small TARGET corpus (the
distribution you want more of) and one on the RAW corpus, then keep the
high-weight tail.  Public method; no analogue in the reference (this is
the data-mixing/selection step of an LLM training-data pipeline).

Features are the bag of word-n-gram hashes (``decontam.doc_gram_hashes_all``
— one per OCCURRENCE) folded into ``buckets`` fixed buckets (gh mod B).
The two bucket-count models and the per-doc scorer reuse the repo's
standard shapes:

* model fit = one ``map_batches`` pass emitting per-batch sparse bucket
  partials (np.bincount) → per-block combine → small repartition tree →
  driver merge of a B-sized vector.  NO shuffle — the feature space is
  fixed-size by construction, exactly like the k-means partials.
* scoring = broadcast the B-sized log-ratio table (``ray.put`` once),
  probe per batch: weight(doc) = Σ_g lr[bucket(g)].  No shuffle.

Weight math (SQL-recomputable — the oracle recomputes the gram hashes
bit-for-bit via ``sql_oracle._gram_cte(distinct=False)`` and the same
add-s smoothed log ratio; floats compare with rtol like ``doc_lm_ppl``):

    lr[b]  = ln((t[b] + s) / (T + s·B)) − ln((r[b] + s) / (R + s·B))

with t/r the target/raw bucket counts and T/R their totals.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from medcat_ray.ops.decontam import doc_gram_hashes_all


def hashed_bucket_counts(ds: rd.Dataset, text_col: str = "text",
                         n: int = 2, buckets: int = 4096,
                         batch_size: int = 1024,
                         combine_blocks: int = 8) -> np.ndarray:
    """Bucket counts (int64[buckets]) of the bag of hashed word-n-grams
    over ``ds`` — the DSIR feature model.  Distributed partial
    np.bincount per batch, combined without a shuffle."""
    def partial(batch: pa.Table) -> pa.Table:
        grams = [doc_gram_hashes_all(t, n)
                 for t in batch[text_col].to_pylist()]
        counts = (np.bincount((np.concatenate(grams) % buckets)
                              .astype(np.int64), minlength=buckets)
                  if grams else np.zeros(buckets, dtype=np.int64))
        keep = np.flatnonzero(counts)
        return pa.table({"b": pa.array(keep, type=pa.int64()),
                         "c": pa.array(counts[keep], type=pa.int64())})

    def combine(batch: pa.Table) -> pa.Table:
        b = batch["b"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        out = np.zeros(buckets, dtype=np.int64)
        np.add.at(out, b, c)
        keep = np.flatnonzero(out)
        return pa.table({"b": pa.array(keep, type=pa.int64()),
                         "c": pa.array(out[keep], type=pa.int64())})

    parts = ds.map_batches(partial, batch_size=batch_size,
                           batch_format="pyarrow") \
        .map_batches(combine, batch_size=None, batch_format="pyarrow") \
        .repartition(combine_blocks) \
        .map_batches(combine, batch_size=None, batch_format="pyarrow")
    total = np.zeros(buckets, dtype=np.int64)
    for row in parts.take_all():
        total[row["b"]] += row["c"]
    return total


def dsir_log_ratio(target_counts: np.ndarray, raw_counts: np.ndarray,
                   smoothing: float = 1.0) -> np.ndarray:
    """Per-bucket smoothed log importance ratio (float64[buckets])."""
    t = np.asarray(target_counts, dtype=np.float64)
    r = np.asarray(raw_counts, dtype=np.float64)
    B = len(t)
    s = float(smoothing)
    return (np.log((t + s) / (t.sum() + s * B))
            - np.log((r + s) / (r.sum() + s * B)))


def add_dsir_weight(ds: rd.Dataset, log_ratio: np.ndarray,
                    text_col: str = "text", n: int = 2,
                    id_col: Optional[str] = None,
                    batch_size: int = 1024) -> rd.Dataset:
    """Append ``n_grams`` (gram occurrences) and ``dsir_weight``
    (Σ lr[bucket]) to every row; the B-sized ratio table is broadcast
    once.  Projects to (id, n_grams, dsir_weight) when ``id_col`` is
    given, else appends to the full row."""
    buckets = len(log_ratio)
    lr_ref = ray.put(np.asarray(log_ratio, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        lr = ray.get(lr_ref)
        texts = batch[text_col].to_pylist()
        n_grams = np.zeros(len(texts), dtype=np.int64)
        w = np.zeros(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            g = doc_gram_hashes_all(t, n)
            n_grams[i] = len(g)
            if len(g):
                w[i] = lr[(g % buckets).astype(np.int64)].sum()
        out = batch.select([id_col]) if id_col else batch
        return out.append_column(
            "n_grams", pa.array(n_grams, type=pa.int64())) \
            .append_column("dsir_weight", pa.array(w, type=pa.float64()))

    return ds.map_batches(score, batch_size=batch_size,
                          batch_format="pyarrow")


def dsir_weights(raw: rd.Dataset, target: rd.Dataset,
                 text_col: str = "text", n: int = 2,
                 buckets: int = 4096, smoothing: float = 1.0,
                 id_col: Optional[str] = None) -> rd.Dataset:
    """Fit both hashed-gram models and score every raw doc — the full
    DSIR weighting pass.  ``raw`` is consumed twice (model + scoring);
    both passes stream."""
    t_counts = hashed_bucket_counts(target, text_col, n, buckets)
    r_counts = hashed_bucket_counts(raw, text_col, n, buckets)
    lr = dsir_log_ratio(t_counts, r_counts, smoothing)
    return add_dsir_weight(raw, lr, text_col, n, id_col=id_col)
