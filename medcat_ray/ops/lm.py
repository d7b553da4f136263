"""N-gram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020 score documents with a KenLM n-gram model and
keep the low-perplexity tail; public method, reimplemented here as an
add-α-smoothed bigram LM trained on the corpus itself or any reference
corpus).

Scale design: training is two batch-level pre-aggregations (distinct
(gram, count) rows per batch — np.unique, no Python dicts) feeding
native ``groupby().aggregate(Sum)`` shuffles whose output is
vocabulary-sized, not corpus-sized; ``max_vocab`` / ``min_bigram_count``
bound the model for web-scale corpora (the CCNet models are pruned the
same way).  Scoring broadcasts the packed model once via ``ray.put`` and
probes it per batch with searchsorted over integer bigram keys — no
shuffle.

Scoring math (SQL-recomputable, see the ``doc_lm_ppl`` oracle):
  log P(doc) = Σ_i ln( (C(w_{i-1}, w_i) + α) / (C(w_{i-1}) + α·(V+1)) )
  ppl(doc)   = exp(−log P / n_bigrams)        (1.0 when n_bigrams = 0)
with V the unigram vocabulary size and out-of-vocabulary words mapped to
an <unk> id with zero counts.

Reference analogue: none in MedCAT — LLM-training-data operator.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum


@dataclass
class BigramLM:
    vocab: Dict[str, int]          # word -> id (0..V-1); OOV -> V
    uni_counts: np.ndarray         # int64[V]
    big_keys: np.ndarray           # sorted int64, key = id1*(V+1)+id2
    big_counts: np.ndarray         # int64, aligned with big_keys
    alpha: float = 0.1

    @property
    def v(self) -> int:
        return len(self.uni_counts)


def _tokens(text: str):
    return (text or "").lower().split()


def train_bigram_lm(ds: rd.Dataset, text_col: str = "text",
                    alpha: float = 0.1,
                    max_vocab: Optional[int] = None,
                    min_bigram_count: int = 1) -> BigramLM:
    """Count unigrams and bigrams over ``ds`` and pack them into a
    :class:`BigramLM`.  ``max_vocab`` keeps only the most frequent words
    (ties broken by word, deterministic); ``min_bigram_count`` drops rare
    bigrams — both bound the broadcast model size at corpus scale."""
    def _uni(batch: pa.Table) -> pa.Table:
        toks = []
        for t in batch[text_col].to_pylist():
            toks.extend(_tokens(t))
        if toks:
            w, c = np.unique(np.asarray(toks, dtype=object),
                             return_counts=True)
        else:
            w, c = np.array([], dtype=object), np.array([], dtype=np.int64)
        return pa.table({"w": pa.array(w, type=pa.string()),
                         "c": pa.array(c.astype(np.int64),
                                       type=pa.int64())})

    def _big(batch: pa.Table) -> pa.Table:
        grams = []
        for t in batch[text_col].to_pylist():
            tk = _tokens(t)
            grams.extend(f"{a} {b}" for a, b in zip(tk, tk[1:]))
        if grams:
            g, c = np.unique(np.asarray(grams, dtype=object),
                             return_counts=True)
        else:
            g, c = np.array([], dtype=object), np.array([], dtype=np.int64)
        return pa.table({"g": pa.array(g, type=pa.string()),
                         "c": pa.array(c.astype(np.int64),
                                       type=pa.int64())})

    uni = ds.map_batches(_uni, batch_format="pyarrow") \
        .groupby("w").aggregate(Sum("c", alias_name="c")).to_pandas()
    big = ds.map_batches(_big, batch_format="pyarrow") \
        .groupby("g").aggregate(Sum("c", alias_name="c")).to_pandas()

    if max_vocab is not None and len(uni) > max_vocab:
        uni = uni.sort_values(["c", "w"], ascending=[False, True]) \
            .head(max_vocab)
    uni = uni.sort_values("w").reset_index(drop=True)
    vocab = {w: i for i, w in enumerate(uni["w"])}
    uni_counts = uni["c"].to_numpy(dtype=np.int64)
    v = len(vocab)

    if min_bigram_count > 1:
        big = big[big["c"] >= min_bigram_count]
    keys = np.empty(len(big), dtype=np.int64)
    ok = np.ones(len(big), dtype=bool)
    for j, (g, _) in enumerate(zip(big["g"], big["c"])):
        w1, _, w2 = g.partition(" ")
        i1, i2 = vocab.get(w1), vocab.get(w2)
        if i1 is None or i2 is None:      # pruned vocab: drop the bigram
            ok[j] = False
        else:
            keys[j] = i1 * (v + 1) + i2
    counts = big["c"].to_numpy(dtype=np.int64)[ok]
    keys = keys[ok]
    order = np.argsort(keys)
    return BigramLM(vocab=vocab, uni_counts=uni_counts,
                    big_keys=keys[order], big_counts=counts[order],
                    alpha=alpha)


def add_lm_score(ds: rd.Dataset, lm: BigramLM,
                 text_col: str = "text") -> rd.Dataset:
    """Append ``log_prob`` (add-α bigram log-likelihood), ``n_bigrams``
    and ``ppl`` (per-bigram perplexity; 1.0 for docs with < 2 tokens).
    The packed model is shipped once (``ray.put``) and probed with
    searchsorted per batch."""
    lm_ref = ray.put(lm)

    def _score(batch: pa.Table) -> pa.Table:
        m: BigramLM = ray.get(lm_ref)
        v, a = m.v, m.alpha
        denom_base = a * (v + 1)
        texts = batch[text_col].to_pylist()
        lp = np.zeros(len(texts), dtype=np.float64)
        nb = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            tk = _tokens(t)
            if len(tk) < 2:
                continue
            ids = np.fromiter((m.vocab.get(w, v) for w in tk),
                              dtype=np.int64, count=len(tk))
            keys = ids[:-1] * (v + 1) + ids[1:]
            if len(m.big_keys):
                idx = np.searchsorted(m.big_keys, keys)
                idx[idx == len(m.big_keys)] = 0
                cb = np.where(m.big_keys[idx] == keys,
                              m.big_counts[idx], 0)
            else:
                cb = np.zeros(len(keys), dtype=np.int64)
            w1 = ids[:-1]
            if v:
                cu = np.where(w1 < v,
                              m.uni_counts[np.minimum(w1, v - 1)], 0)
            else:
                cu = np.zeros(len(w1), dtype=np.int64)
            lp[i] = np.log((cb + a) / (cu + denom_base)).sum()
            nb[i] = len(keys)
        ppl = np.where(nb > 0, np.exp(-lp / np.maximum(nb, 1)), 1.0)
        return (batch
                .append_column("log_prob", pa.array(lp,
                                                    type=pa.float64()))
                .append_column("n_bigrams", pa.array(nb,
                                                     type=pa.int64()))
                .append_column("ppl", pa.array(ppl, type=pa.float64())))

    return ds.map_batches(_score, batch_format="pyarrow")
