"""Vocab construction from a raw text corpus (SURVEY §2 S-series gap;
reference ``MakeVocab`` at /root/reference/medcat/utils/make_vocab.py:15-121
and ``create_vocab`` via medcat/utils/model_creator.py:128-131).

Reference semantics re-expressed Ray-Data-first:

* word counting — the reference loops documents in one process
  (make_vocab.py:88-110); here it is ``map_batches`` (tokenize + per-batch
  Counter partials) → one NATIVE ``groupby(word).Sum`` → a driver fold into
  the model-sized ``Vocab`` artifact (a vocab is a model, not data — it is
  *meant* to end up on the driver / in the object store).
* word vectors — the reference trains gensim Word2Vec
  (make_vocab.py:123-180), which is neither deterministic nor
  order-free.  Here vectors come from *random indexing* (Kanerva et al.,
  "Random indexing of text samples for latent semantic analysis", 2000):
  every word has a fixed hash-seeded random signature vector, and a word's
  embedding is the sum of the signatures of its window neighbors over the
  corpus.  Sums are commutative, so the distributed fold is order-free and
  bit-deterministic; distributionally-similar words still land close in
  cosine, which is all the context linker needs.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum

from medcat_ray.config import EngineConfig
from medcat_ray.functions.text import lemmatize, tag_tokens, tokenize
from medcat_ray.ops.hashing import stable_u64
from medcat_ray.state.cdb import CDB
from medcat_ray.state.vocab import Vocab


def _batch_tokens(texts, config: EngineConfig, normalize: bool):
    """Tokenized documents with space/punct dropped (reference
    make_vocab.py:95-99 keeps ``token.lower_`` of non-space non-punct)."""
    for text in texts:
        tokens = tag_tokens(tokenize(text or "", config.diacritics), config)
        words = []
        for t in tokens:
            if t.is_punct:
                continue
            w = t.lower
            if normalize and len(w) >= config.min_len_normalize:
                w = lemmatize(w)
            if w:
                words.append(w)
        yield words


def count_words(texts: rd.Dataset, config: Optional[EngineConfig] = None,
                text_col: str = "text",
                normalize_tokens: bool = False) -> rd.Dataset:
    """(word, cnt) rows over the corpus: per-batch Counter partials then a
    native groupby-Sum — the combiner pattern, no per-word shuffle rows."""
    config = config or EngineConfig()

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for words in _batch_tokens(batch[text_col].to_pylist(), config,
                                   normalize_tokens):
            counts.update(words)
        return pa.table({
            "word": pa.array(list(counts.keys()), type=pa.string()),
            "cnt": pa.array(list(counts.values()), type=pa.int64()),
        })

    return texts.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("cnt", alias_name="cnt"))


def build_vocab(texts: rd.Dataset, cdb: Optional[CDB] = None,
                config: Optional[EngineConfig] = None,
                text_col: str = "text",
                normalize_tokens: bool = False,
                join_cdb: bool = True) -> Vocab:
    """Count-only vocab (reference ``MakeVocab.make``,
    make_vocab.py:64-121): distributed word counts, then CDB words absent
    from the corpus are added with count 1 (``join_cdb`` semantics,
    make_vocab.py:113-118)."""
    counts = count_words(texts, config, text_col, normalize_tokens) \
        .to_pandas()
    vocab = Vocab()
    for word, cnt in zip(counts["word"], counts["cnt"]):
        vocab.add_word(word, cnt=int(cnt))
    if join_cdb and cdb is not None:
        for word in cdb.vocab:
            if word not in vocab:
                vocab.add_word(word, cnt=1)
    return vocab


def _signature(word: str, dim: int, seed: int) -> np.ndarray:
    """Fixed random unit signature per word (random-indexing index vector),
    seeded from a stable hash so every worker agrees."""
    rng = np.random.default_rng(
        (stable_u64(word.encode("utf-8", "surrogatepass")) ^ seed)
        & 0xFFFFFFFFFFFF)
    v = rng.normal(size=dim)
    return v / np.linalg.norm(v)


def add_vectors(vocab: Vocab, texts: rd.Dataset,
                config: Optional[EngineConfig] = None,
                text_col: str = "text", dim: int = 300, window: int = 10,
                min_count: int = 10, seed: int = 17,
                normalize_tokens: bool = False,
                overwrite: bool = False) -> Vocab:
    """Train word vectors over the corpus by random indexing (reference
    ``MakeVocab.add_vectors``, make_vocab.py:123-180, minus gensim): each
    occurrence of word w adds the signatures of its ≤``window`` left/right
    neighbors to vec(w).  Per-batch partials are (word, partial_vec) rows;
    the driver folds them into the model-sized vocab.  Only words with
    corpus count ≥ ``min_count`` receive vectors (w2v ``min_count``
    analogue); existing vectors are kept unless ``overwrite``."""
    config = config or EngineConfig()
    eligible = {w for w, c in vocab.word2cnt.items() if c >= min_count}
    import ray
    eligible_ref = ray.put(eligible)

    def partial(batch: pa.Table) -> pa.Table:
        elig = ray.get(eligible_ref)
        sig_cache: Dict[str, np.ndarray] = {}

        def sig(w: str) -> np.ndarray:
            s = sig_cache.get(w)
            if s is None:
                s = sig_cache[w] = _signature(w, dim, seed)
            return s

        acc: Dict[str, np.ndarray] = {}
        for words in _batch_tokens(batch[text_col].to_pylist(), config,
                                   normalize_tokens):
            n = len(words)
            for i, w in enumerate(words):
                if w not in elig:
                    continue
                vec = acc.get(w)
                if vec is None:
                    vec = acc[w] = np.zeros(dim, dtype=np.float64)
                for j in range(max(0, i - window),
                               min(n, i + window + 1)):
                    if j != i:
                        vec += sig(words[j])
        return pa.table({
            "word": pa.array(list(acc.keys()), type=pa.string()),
            "vec": pa.array([v.tolist() for v in acc.values()],
                            type=pa.list_(pa.float64())),
        })

    folded: Dict[str, np.ndarray] = {}
    for batch in texts.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for word, vec in zip(batch["word"].to_pylist(),
                             batch["vec"].to_pylist()):
            cur = folded.get(word)
            if cur is None:
                folded[word] = np.asarray(vec)
            else:
                folded[word] = cur + np.asarray(vec)

    for word, vec in sorted(folded.items()):
        if overwrite or vocab.vec(word) is None:
            vocab.add_word(word, cnt=vocab.word2cnt.get(word, 1),
                           vec=vec, replace=True)
    return vocab


def make_vocab(texts: rd.Dataset, cdb: Optional[CDB] = None,
               config: Optional[EngineConfig] = None,
               text_col: str = "text", dim: int = 300, window: int = 10,
               min_count: int = 10, seed: int = 17,
               normalize_tokens: bool = False) -> Vocab:
    """End-to-end ``MakeVocab.make`` + ``add_vectors`` equivalent."""
    vocab = build_vocab(texts, cdb, config, text_col, normalize_tokens)
    return add_vectors(vocab, texts, config, text_col, dim, window,
                       min_count, seed, normalize_tokens)
