"""Distributed BPE (byte-pair-encoding) subword vocabulary learning
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units") — the tokenizer-training step an LLM-data pipeline runs
over the corpus it just cleaned.  The reference engine's vocabulary is
word-level (``medcat/vocab.py`` — see ``state/vocab.py`` here); this is
the subword analogue, built Ray-Data-first.

Scale shape — the corpus is touched exactly ONCE:

* ``word_histogram``: per-batch distinct-word combiner (one row per
  distinct word per block, the same pre-aggregation shape as the triple
  combiner) → native ``groupby(word).Sum``.  This is the only
  corpus-sized pass; everything after is VOCAB-sized (~1e8-1e9 distinct
  words at 10^12 docs — a cheap Dataset, not a cheap dict).
* each merge round: ``map_batches`` partial pair counts over the
  histogram → native ``groupby(s1, s2).Sum`` (shuffle carries distinct
  symbol pairs, not occurrences) → per-block argmax prune so the driver
  merges ≤ blocks candidate rows → one vectorized ``map_batches`` apply
  pass.  The histogram is re-materialized per round so no round replays
  its predecessors; only the merge rules (the model) live on the driver.

Determinism: candidate selection orders by (count desc, s1 asc, s2 asc)
— pure int64/ASCII comparisons, bit-identical in DuckDB, which lets the
oracle (``ops/sql_oracle.bpe_sql``) unroll the identical rounds: the
merge application is expressed as a single non-overlapping left-to-right
``replace`` over a U+001F-wrapped symbol string, which provably equals
the engine's left-to-right scan (a freshly merged token can never be the
left element of the same rule because rules have a non-empty right
part — see test_bpe.py for the adversarial "aaa" cases).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data as rd

WORD_RE = re.compile(r"[a-z0-9]+")
# DuckDB twin of WORD_RE over lower(text) — both engines are RE2-class
# on this pattern (no backtracking constructs).
WORD_SQL_RE = "[a-z0-9]+"

_EMPTY_PAIRS = pa.table({
    "s1": pa.array([], type=pa.string()),
    "s2": pa.array([], type=pa.string()),
    "cnt": pa.array([], type=pa.int64())})


def word_histogram(ds: rd.Dataset, text_col: str = "text",
                   min_freq: int = 1) -> rd.Dataset:
    """Corpus → (word, freq) histogram.  One distinct-word combiner pass
    + one native groupby-Sum; the shuffle carries distinct words per
    block, never occurrences."""
    from ray.data.aggregate import Sum

    def _combine(batch: pa.Table) -> pa.Table:
        words: list[str] = []
        for t in batch[text_col].to_pylist():
            if t:
                words.extend(WORD_RE.findall(t.lower()))
        if not words:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "freq": pa.array([], type=pa.int64())})
        uniq, cnt = np.unique(np.array(words, dtype=object),
                              return_counts=True)
        return pa.table({"word": pa.array(uniq, type=pa.string()),
                         "freq": pa.array(cnt.astype(np.int64))})

    hist = ds.map_batches(_combine, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("freq", alias_name="freq"))
    if min_freq > 1:
        import pyarrow.compute as pc

        def _floor(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.greater_equal(batch["freq"], min_freq))
        hist = hist.map_batches(_floor, batch_format="pyarrow")
    return hist


def _init_segments(hist: rd.Dataset) -> rd.Dataset:
    """word → space-joined character segmentation (symbols are [a-z0-9]
    strings, so ' ' is a safe separator forever)."""
    def _init(batch: pa.Table) -> pa.Table:
        segs = [" ".join(w) for w in batch["word"].to_pylist()]
        return batch.append_column("seg", pa.array(segs, type=pa.string()))
    return hist.map_batches(_init, batch_format="pyarrow")


def _pair_counts(vocab: rd.Dataset) -> rd.Dataset:
    """(s1, s2, cnt) — frequency-weighted adjacent symbol pairs over the
    current segmentation.  Vocab-sized input; per-block dict combiner so
    the groupby sees one row per distinct pair per block."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        segs = batch["seg"].to_pylist()
        freqs = batch["freq"].to_pylist()
        acc: dict[tuple[str, str], int] = {}
        for seg, f in zip(segs, freqs):
            syms = seg.split(" ")
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                acc[k] = acc.get(k, 0) + f
        if not acc:
            return _EMPTY_PAIRS
        ks = list(acc.keys())
        return pa.table({
            "s1": pa.array([k[0] for k in ks], type=pa.string()),
            "s2": pa.array([k[1] for k in ks], type=pa.string()),
            "cnt": pa.array([acc[k] for k in ks], type=pa.int64())})

    return vocab.map_batches(_partial, batch_format="pyarrow") \
        .groupby(["s1", "s2"]).aggregate(Sum("cnt", alias_name="cnt"))


def _best_pair(vocab: rd.Dataset) -> tuple[str, str, int] | None:
    """Global argmax under (cnt desc, s1 asc, s2 asc): per-block prune to
    one candidate each, then the driver picks among ≤ blocks rows."""
    def _partial_best(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_PAIRS
        import pandas as pd
        df = batch.to_pandas()
        df = df.sort_values(["cnt", "s1", "s2"],
                            ascending=[False, True, True]).head(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    rows = _pair_counts(vocab) \
        .map_batches(_partial_best, batch_format="pyarrow").take_all()
    if not rows:
        return None
    best = min(rows, key=lambda r: (-r["cnt"], r["s1"], r["s2"]))
    return best["s1"], best["s2"], int(best["cnt"])


def merge_symbols(syms: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping merge of adjacent (a, b) → a+b —
    the exact semantics of a delimiter-wrapped string replace (the SQL
    twin): a merge consumes both symbols and scanning resumes after the
    merged token."""
    out: list[str] = []
    ab = a + b
    i, n = 0, len(syms)
    while i < n:
        if syms[i] == a and i + 1 < n and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def segment_word(word: str, rules: list[tuple[str, str]],
                 cache: dict[str, list[str]]) -> list[str]:
    """Memoized merge-chain segmentation of one word — the ONE shared
    implementation behind bpe_encode and TokenizerWrapperBPE (the `a in
    s` prescreen skips rules whose left symbol is absent)."""
    s = cache.get(word)
    if s is None:
        s = list(word)
        for a, b in rules:
            if a in s:
                s = merge_symbols(s, a, b)
        cache[word] = s
    return s


def _apply_merge(vocab: rd.Dataset, a: str, b: str) -> rd.Dataset:
    pat = f" {a} {b} "
    def _apply(batch: pa.Table) -> pa.Table:
        segs = batch["seg"].to_pylist()
        out = []
        for seg in segs:
            # cheap vectorized-ish prescreen: the padded substring test
            # is a pure C scan; only hit words run the python merge
            if pat in f" {seg} ":
                out.append(" ".join(merge_symbols(seg.split(" "), a, b)))
            else:
                out.append(seg)
        return batch.set_column(batch.schema.get_field_index("seg"), "seg",
                                pa.array(out, type=pa.string()))
    return vocab.map_batches(_apply, batch_format="pyarrow")


def bpe_learn(ds: rd.Dataset, text_col: str = "text", n_merges: int = 8,
              min_freq: int = 1) -> tuple[list[tuple[str, str, int]],
                                          rd.Dataset]:
    """Learn ``n_merges`` BPE merge rules over the corpus.  Returns the
    ordered rules [(s1, s2, pair_count_at_selection)] and the final
    segmented vocabulary Dataset (word, freq, seg)."""
    vocab = _init_segments(word_histogram(ds, text_col, min_freq)) \
        .materialize()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = _best_pair(vocab)
        if best is None:
            break
        a, b, cnt = best
        merges.append((a, b, cnt))
        vocab = _apply_merge(vocab, a, b).materialize()
    return merges, vocab


def bpe_encode(ds: rd.Dataset, merges: list[tuple[str, str, int]],
               text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Apply learned merges to documents → (doc_id, n_tokens,
    n_distinct_tokens).  Stateless broadcast of the rule list (model-
    sized); segmentation is memoized per distinct word within a batch so
    hot words pay the merge chain once."""
    rules = [(a, b) for a, b, _ in merges]

    def _encode(batch: pa.Table) -> pa.Table:
        cache: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            return segment_word(word, rules, cache)

        n_tok, n_dis = [], []
        for t in batch[text_col].to_pylist():
            words = WORD_RE.findall(t.lower()) if t else []
            toks: list[str] = []
            for w in words:
                toks.extend(seg(w))
            n_tok.append(len(toks))
            n_dis.append(len(set(toks)))
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tok, type=pa.int64()),
            "n_distinct_tokens": pa.array(n_dis, type=pa.int64())})

    return ds.map_batches(_encode, batch_format="pyarrow")
