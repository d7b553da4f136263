"""Per-document keyword extraction (TF-IDF): corpus document
frequencies via the distinct-term combiner → native groupby-Sum (the
shuffle carries one row per distinct term per batch, never occurrences),
DF table broadcast once, per-doc top-k scored vectorized per batch.

Ranking is INTEGER-deterministic — (tf desc, df asc, term asc) — so the
selected top-k is bit-reproducible and exactly recomputable by a SQL
oracle; the float ``tfidf = tf·ln(N/df)`` column is reported alongside
(rtol-compared by the driver) but never used for selection, because
mathematically-tied scores (e.g. 2·ln(N/250) vs 1·ln(N/125)) can order
differently across libm implementations.

``min_df`` prunes hapax terms from the broadcast DF table at corpus
scale (a pruned term cannot enter the top-k); the DF table is
vocabulary-sized, the natural broadcast side.

Reference analogue: none in MedCAT (LLM-training-data operator).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def doc_frequencies(ds: rd.Dataset, text_col: str = "text",
                    min_df: int = 1):
    """(terms, dfs) sorted-by-term arrays of document frequencies."""
    def _partial(batch: pa.Table) -> pa.Table:
        per_doc = [np.unique(np.asarray((t or "").lower().split(),
                                        dtype=object))
                   for t in batch[text_col].to_pylist()]
        per_doc = [u for u in per_doc if len(u)]
        if per_doc:
            w, c = np.unique(np.concatenate(per_doc), return_counts=True)
        else:
            w = np.array([], dtype=object)
            c = np.array([], dtype=np.int64)
        return pa.table({"w": pa.array(w, type=pa.string()),
                         "df": pa.array(c.astype(np.int64),
                                        type=pa.int64())})

    df = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby("w").aggregate(Sum("df", alias_name="df")).to_pandas()
    if min_df > 1:
        df = df[df["df"] >= min_df]
    df = df.sort_values("w").reset_index(drop=True)
    return (df["w"].to_numpy(dtype=object),
            df["df"].to_numpy(dtype=np.int64))


def top_keywords(ds: rd.Dataset, n_docs: int, terms: np.ndarray,
                 dfs: np.ndarray, text_col: str = "text",
                 id_col: str = "doc_id", k: int = 5) -> rd.Dataset:
    """Exploded (id, term, tf, df, tfidf, rank) rows of each document's
    top-k keywords under the deterministic (tf desc, df asc, term asc)
    ranking.  ``terms``/``dfs`` come from :func:`doc_frequencies` and are
    shipped once via ``ray.put``."""
    ref = ray.put((terms, dfs))
    log_n = float(n_docs)

    def _score(batch: pa.Table) -> pa.Table:
        tms, d = ray.get(ref)
        o_id, o_t, o_tf, o_df, o_s, o_r = [], [], [], [], [], []
        ids = batch[id_col].to_pylist()
        for i, t in zip(ids, batch[text_col].to_pylist()):
            if not len(tms):
                break
            toks = (t or "").lower().split()
            if not toks:
                continue
            w, tf = np.unique(np.asarray(toks, dtype=object),
                              return_counts=True)
            pos = np.searchsorted(tms, w)
            pos_c = np.minimum(pos, len(tms) - 1)
            known = tms[pos_c] == w
            w, tf, pos_c = w[known], tf[known], pos_c[known]
            if not len(w):
                continue
            df = d[pos_c]
            # deterministic ranking: tf desc, df asc, term asc
            order = np.lexsort((w, df, -tf))[:k]
            wk, tfk, dfk = w[order], tf[order], df[order]
            o_id.extend([i] * len(wk))
            o_t.extend(wk.tolist())
            o_tf.extend(tfk.tolist())
            o_df.extend(dfk.tolist())
            o_s.extend((tfk * np.log(log_n / dfk)).tolist())
            o_r.extend(range(1, len(wk) + 1))
        return pa.table({
            id_col: pa.array(o_id, type=pa.int64()),
            "term": pa.array(o_t, type=pa.string()),
            "tf": pa.array(o_tf, type=pa.int64()),
            "df": pa.array(o_df, type=pa.int64()),
            "tfidf": pa.array(o_s, type=pa.float64()),
            "rank": pa.array(o_r, type=pa.int64())})

    return ds.map_batches(_score, batch_format="pyarrow")
