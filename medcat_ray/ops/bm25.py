"""BM25 relevance scoring (Robertson/Lucene IDF variant) of a corpus
against a fixed query-term set — the ranked-retrieval companion of the
TF-IDF keyword extractor (ops/keywords.py).  No analogue in the
reference; public IR method.

    score(d, Q) = Σ_{q∈Q} ln((N − df_q + ½)/(df_q + ½) + 1)
                  · tf_qd·(k1 + 1) / (tf_qd + k1·(1 − b + b·|d|/avgdl))

Scale shape: one stats pass over the corpus emits per-batch partials
bounded by |Q| + 2 integers (doc count, token total, per-term document
frequencies — combined per block, then a driver merge: zero shuffle);
the scoring pass broadcasts the query model once and emits one row per
(doc, matching term).  Integers (tf, df) compare exactly in the DuckDB
twin; the float score rtol-compares like doc_lm_ppl.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def bm25_stats(ds: rd.Dataset, query_terms: List[str],
               text_col: str = "text") -> Tuple[int, int, np.ndarray]:
    """(n_docs, total_tokens, df per query term) in one streaming pass."""
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    tref = ray.put(np.asarray(terms, dtype=object))

    def partial(batch: pa.Table) -> pa.Table:
        tms = ray.get(tref)
        n = 0
        tot = 0
        df = np.zeros(len(tms), dtype=np.int64)
        for t in batch[text_col].to_pylist():
            toks = (t or "").lower().split()
            n += 1
            tot += len(toks)
            if toks:
                u = np.unique(np.asarray(toks, dtype=object))
                pos = np.searchsorted(tms, u)
                pos_c = np.minimum(pos, len(tms) - 1)
                df[pos_c[tms[pos_c] == u]] += 1
        return pa.table({"n": pa.array([n], type=pa.int64()),
                         "tot": pa.array([tot], type=pa.int64()),
                         "df": pa.array([df.tolist()],
                                        type=pa.list_(pa.int64()))})

    n_docs = 0
    total = 0
    dfs = np.zeros(len(terms), dtype=np.int64)
    for row in ds.map_batches(partial, batch_size=None,
                              batch_format="pyarrow").take_all():
        n_docs += row["n"]
        total += row["tot"]
        dfs += np.asarray(row["df"], dtype=np.int64)
    return n_docs, total, dfs


def bm25_scores(ds: rd.Dataset, query_terms: List[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> rd.Dataset:
    """(id, term, tf, df, score) rows for every document × matching
    query term.  Ranking/top-k is left to the caller (float ordering is
    not bit-stable across libms; the emitted integers are)."""
    terms = sorted(set(query_terms))
    n_docs, total, dfs = bm25_stats(ds, terms, text_col)
    if n_docs == 0:
        raise ValueError("empty corpus")
    avgdl = total / n_docs
    idf = np.log((n_docs - dfs + 0.5) / (dfs + 0.5) + 1.0)
    ref = ray.put((np.asarray(terms, dtype=object), dfs, idf))

    def score(batch: pa.Table) -> pa.Table:
        tms, d, w_idf = ray.get(ref)
        o_id, o_t, o_tf, o_df, o_s = [], [], [], [], []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            toks = (t or "").lower().split()
            if not toks:
                continue
            u, cnt = np.unique(np.asarray(toks, dtype=object),
                               return_counts=True)
            pos = np.searchsorted(tms, u)
            pos_c = np.minimum(pos, len(tms) - 1)
            hit = tms[pos_c] == u
            if not hit.any():
                continue
            qi = pos_c[hit]
            tf = cnt[hit].astype(np.float64)
            denom = tf + k1 * (1.0 - b + b * len(toks) / avgdl)
            s = w_idf[qi] * tf * (k1 + 1.0) / denom
            o_id.extend([i] * len(qi))
            o_t.extend(tms[qi].tolist())
            o_tf.extend(cnt[hit].tolist())
            o_df.extend(d[qi].tolist())
            o_s.extend(s.tolist())
        return pa.table({
            id_col: pa.array(o_id, type=batch[id_col].type),
            "term": pa.array(o_t, type=pa.string()),
            "tf": pa.array(o_tf, type=pa.int64()),
            "df": pa.array(o_df, type=pa.int64()),
            "score": pa.array(o_s, type=pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")
