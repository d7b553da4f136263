"""Distributed unigram-LM subword tokenizer (SentencePiece-style,
Kudo 2018 "Subword Regularization") — the second tokenizer-training
family next to BPE (ops/bpe.py), built Ray-Data-first.

Deterministic HARD-EM variant (documented deviation from SentencePiece:
Viterbi counts instead of forward-backward expectations, and a fixed
top-k seed instead of the suffix-array/EM pruning schedule — the
*distributed execution shape* is the point here, the statistics are the
textbook ones):

* seed: every substring occurrence (length ≤ ``max_piece_len``) of the
  word histogram, frequency-weighted — a per-block dict combiner →
  ONE native ``groupby(piece).Sum`` (shuffle carries distinct pieces
  per block, never occurrences) → deterministic top-k by
  ``(cnt DESC, piece ASC)`` via per-block prune + driver merge of
  ≤ k·blocks candidate rows, UNION all single characters (guarantees
  every word stays segmentable);
* E-step: per distinct word, Viterbi best segmentation under the
  broadcast piece log-probs (``ray.put`` once, read per batch), counts
  weighted by word freq — dict combiner → native groupby-Sum;
* M-step + prune: counts → log-probs on the driver (the model is
  piece-sized, like BPE's merge list), keep ``vocab_size`` best.

The corpus is touched exactly once (the word histogram); every EM pass
runs over the VOCAB-sized histogram.  Scores are float64 ln-ratios —
the oracle (``ops/sql_oracle.unigram_score_sql``) recomputes the seed
vocabulary exactly (integer counts, same tie-break) and the Viterbi
max-score per word with an UNROLLED dp-per-position SQL (no recursion,
no argmax-path extraction), compared at rtol like doc_lm_ppl.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from medcat_ray.ops.bpe import word_histogram

_EMPTY_COUNTS = pa.table({
    "piece": pa.array([], type=pa.string()),
    "cnt": pa.array([], type=pa.int64())})


def seed_piece_counts(hist: rd.Dataset,
                      max_piece_len: int = 4) -> rd.Dataset:
    """(piece, cnt): frequency-weighted substring OCCURRENCE counts
    (every start position, every length ≤ ``max_piece_len``) over the
    (word, freq) histogram."""
    def _partial(batch: pa.Table) -> pa.Table:
        acc: Dict[str, int] = {}
        for w, f in zip(batch["word"].to_pylist(),
                        batch["freq"].to_pylist()):
            n = len(w)
            for i in range(n):
                for l in range(1, min(max_piece_len, n - i) + 1):
                    p = w[i:i + l]
                    acc[p] = acc.get(p, 0) + f
        if not acc:
            return _EMPTY_COUNTS
        return pa.table({
            "piece": pa.array(list(acc.keys()), type=pa.string()),
            "cnt": pa.array(list(acc.values()), type=pa.int64())})

    return hist.map_batches(_partial, batch_format="pyarrow") \
        .groupby("piece").aggregate(Sum("cnt", alias_name="cnt"))


def top_pieces(counts: rd.Dataset, k: int = 128) -> pd.DataFrame:
    """Deterministic top-k by (cnt DESC, piece ASC) UNION all
    single-character pieces — per-block prune to k + chars, driver
    merges ≤ (k + alphabet)·blocks candidate rows."""
    def _prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_COUNTS
        df = batch.to_pandas()
        top = df.sort_values(["cnt", "piece"],
                             ascending=[False, True]).head(k)
        chars = df[df["piece"].str.len() == 1]
        return pa.Table.from_pandas(
            pd.concat([top, chars]).drop_duplicates("piece"),
            preserve_index=False)

    cand = counts.map_batches(_prune, batch_format="pyarrow").to_pandas()
    cand = cand.drop_duplicates("piece")
    top = cand.sort_values(["cnt", "piece"],
                           ascending=[False, True]).head(k)
    chars = cand[cand["piece"].str.len() == 1]
    return pd.concat([top, chars]).drop_duplicates("piece") \
        .sort_values("piece").reset_index(drop=True)


def piece_logprobs(pieces: pd.DataFrame) -> Dict[str, float]:
    total = float(pieces["cnt"].sum())
    return {p: math.log(c / total)
            for p, c in zip(pieces["piece"], pieces["cnt"])}


def viterbi(word: str, lp: Dict[str, float],
            max_piece_len: int = 4) -> Tuple[float, List[str]]:
    """Best-score segmentation.  dp maximizes (score, -n_tokens); the
    candidate loop goes longest-piece-first and only a STRICTLY better
    tuple replaces, so ties resolve to the longer piece at the latest
    position — a fixed, twin-reproducible rule.  Positions are always
    reachable because every single character is in the vocabulary."""
    n = len(word)
    NEG = float("-inf")
    score = [NEG] * (n + 1)
    ntok = [0] * (n + 1)
    back = [0] * (n + 1)
    score[0] = 0.0
    for j in range(1, n + 1):
        for l in range(min(max_piece_len, j), 0, -1):
            p = word[j - l:j]
            v = lp.get(p)
            if v is None or score[j - l] == NEG:
                continue
            s = score[j - l] + v
            t = ntok[j - l] + 1
            if s > score[j] or (s == score[j] and t < ntok[j]):
                score[j], ntok[j], back[j] = s, t, l
    out: List[str] = []
    j = n
    while j > 0:
        out.append(word[j - back[j]:j])
        j -= back[j]
    return score[n], out[::-1]


def unigram_word_scores(hist: rd.Dataset, pieces: pd.DataFrame,
                        max_piece_len: int = 4,
                        max_word_len: Optional[int] = None) -> rd.Dataset:
    """(word, freq, score): Viterbi best log-probability per distinct
    word under the given piece table — the oracle-facing surface (score
    is a MAX, so no tie-break enters the comparison)."""
    import ray
    lp_ref = ray.put(piece_logprobs(pieces))

    def _score(batch: pa.Table) -> pa.Table:
        import ray as _ray
        lp = _ray.get(lp_ref)
        words, freqs, scores = [], [], []
        for w, f in zip(batch["word"].to_pylist(),
                        batch["freq"].to_pylist()):
            if max_word_len is not None and len(w) > max_word_len:
                continue
            s, _ = viterbi(w, lp, max_piece_len)
            words.append(w)
            freqs.append(f)
            scores.append(s)
        return pa.table({
            "word": pa.array(words, type=pa.string()),
            "freq": pa.array(freqs, type=pa.int64()),
            "score": pa.array(scores, type=pa.float64())})

    return hist.map_batches(_score, batch_format="pyarrow")


def unigram_learn(ds: rd.Dataset, text_col: str = "text",
                  vocab_size: int = 128, n_iter: int = 2,
                  seed_size: int = 256,
                  max_piece_len: int = 4) -> pd.DataFrame:
    """Hard-EM unigram vocabulary: seed top-k → ``n_iter`` rounds of
    (distributed Viterbi counts → native groupby-Sum → driver re-prune).
    Returns (piece, cnt, lp) sorted by piece; single characters are
    never pruned (segmentability invariant)."""
    import ray
    hist = word_histogram(ds, text_col=text_col).materialize()
    pieces = top_pieces(seed_piece_counts(hist, max_piece_len).
                        materialize(), k=seed_size)
    for _ in range(n_iter):
        lp_ref = ray.put((piece_logprobs(pieces), max_piece_len))

        def _estep(batch: pa.Table) -> pa.Table:
            import ray as _ray
            lp, mpl = _ray.get(lp_ref)
            acc: Dict[str, int] = {}
            for w, f in zip(batch["word"].to_pylist(),
                            batch["freq"].to_pylist()):
                for p in viterbi(w, lp, mpl)[1]:
                    acc[p] = acc.get(p, 0) + f
            if not acc:
                return _EMPTY_COUNTS
            return pa.table({
                "piece": pa.array(list(acc.keys()), type=pa.string()),
                "cnt": pa.array(list(acc.values()), type=pa.int64())})

        counts = hist.map_batches(_estep, batch_format="pyarrow") \
            .groupby("piece").aggregate(Sum("cnt", alias_name="cnt")) \
            .to_pandas()          # piece-sized: this is the MODEL
        # chars a Viterbi round stopped using keep a floor count of 1 so
        # every word stays segmentable next round
        chars = pieces[pieces["piece"].str.len() == 1][["piece"]]
        counts = counts.merge(chars, on="piece", how="outer")
        counts["cnt"] = counts["cnt"].fillna(1).astype("int64")
        top = counts.sort_values(["cnt", "piece"],
                                 ascending=[False, True]).head(vocab_size)
        keep_chars = counts[counts["piece"].str.len() == 1]
        pieces = pd.concat([top, keep_chars]).drop_duplicates("piece") \
            .sort_values("piece").reset_index(drop=True)
    total = float(pieces["cnt"].sum())
    pieces = pieces.copy()
    pieces["lp"] = np.log(pieces["cnt"].to_numpy(dtype=np.float64)
                          / total)
    return pieces.reset_index(drop=True)
