"""Vocab — word → (count, embedding) store used for context similarity,
spell-check membership and negative sampling.

Reference: /root/reference/medcat/vocab.py:10-277.  Internally a 2-D float32
matrix + word→row map (SURVEY.md §1.1) instead of a dict of ndarrays, so the
annotate actor can gather context vectors with one fancy-index per entity.
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class Vocab:
    def __init__(self) -> None:
        self.word2idx: Dict[str, int] = {}      # only words WITH vectors
        self.word2cnt: Dict[str, int] = {}      # all words
        self.vectors: np.ndarray = np.zeros((0, 0), dtype=np.float32)
        self._unigram_table: Optional[np.ndarray] = None

    # -- build ------------------------------------------------------------

    def add_word(self, word: str, cnt: int = 1,
                 vec: Optional[Iterable[float]] = None,
                 replace: bool = True) -> None:
        if word in self.word2cnt and not replace:
            return
        self.word2cnt[word] = cnt
        if vec is not None:
            vec = np.asarray(list(vec), dtype=np.float32)
            if self.vectors.size == 0:
                self.vectors = vec[None, :].copy()
                self.word2idx[word] = 0
            elif word in self.word2idx:
                self.vectors[self.word2idx[word]] = vec
            else:
                self.word2idx[word] = self.vectors.shape[0]
                self.vectors = np.vstack([self.vectors, vec[None, :]])

    def add_words(self, path: str, replace: bool = True) -> None:
        """TSV loader: ``word\\tcnt[\\tvec space-separated]`` per line
        (reference ``Vocab.add_words``, /root/reference/medcat/vocab.py:154-177)."""
        with open(path) as fh:
            for line in fh:
                parts = line.strip("\n").split("\t")
                if not parts or not parts[0]:
                    continue
                word = parts[0]
                cnt = int(parts[1]) if len(parts) > 1 and parts[1] else 1
                vec = None
                if len(parts) > 2 and parts[2].strip():
                    vec = np.array(parts[2].split(), dtype=np.float32)
                self.add_word(word, cnt, vec, replace=replace)

    @classmethod
    def from_tsv(cls, path: str) -> "Vocab":
        vocab = cls()
        vocab.add_words(path)
        return vocab

    # -- lookup -----------------------------------------------------------

    def __contains__(self, word: str) -> bool:
        return word in self.word2cnt

    def __len__(self) -> int:
        return len(self.word2cnt)

    def vec(self, word: str) -> Optional[np.ndarray]:
        idx = self.word2idx.get(word)
        return self.vectors[idx] if idx is not None else None

    def vec_index(self, word: str) -> int:
        """Row in :attr:`vectors`, or -1 — vectorized gather path."""
        return self.word2idx.get(word, -1)

    @property
    def dim(self) -> int:
        return self.vectors.shape[1] if self.vectors.size else 0

    # -- negative sampling (training only) --------------------------------

    def make_unigram_table(self, table_size: int = 10_000_000) -> None:
        """Multinomial sampling table by unigram count^(3/4)
        (reference /root/reference/medcat/vocab.py:179-214); we keep the
        cumulative-probability array and use searchsorted."""
        words = sorted(self.word2idx)
        freqs = np.array([self.word2cnt.get(w, 1) for w in words],
                         dtype=np.float64) ** 0.75
        probs = freqs / freqs.sum()
        self._neg_words = words
        self._unigram_table = np.cumsum(probs)

    def get_negative_samples(self, n: int,
                             rng: Optional[np.random.Generator] = None) -> List[str]:
        if self._unigram_table is None:
            self.make_unigram_table()
        rng = rng or np.random.default_rng(0)
        draws = rng.random(n)
        inds = np.searchsorted(self._unigram_table, draws)
        return [self._neg_words[i] for i in inds]

    # -- serialization ----------------------------------------------------

    def content_hash(self) -> str:
        """Deterministic hash over words, counts AND vector bytes — vocab
        vectors feed context_similarity, so retraining them must
        invalidate the pack hash (resume correctness)."""
        import hashlib
        h = hashlib.sha256()
        for word in sorted(self.word2cnt):
            h.update(f"{word}:{self.word2cnt[word]}".encode())
            v = self.vec(word)
            if v is not None:
                h.update(np.ascontiguousarray(v, dtype=np.float32).tobytes())
        return h.hexdigest()[:16]

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        words = sorted(self.word2cnt)
        vecs = [self.vec(w) for w in words]
        pq.write_table(pa.table({
            "word": words,
            "cnt": [self.word2cnt[w] for w in words],
            "vec": pa.array([v.tolist() if v is not None else None for v in vecs],
                            type=pa.list_(pa.float32())),
        }), os.path.join(path, "vocab_vectors.parquet"))

    @classmethod
    def load(cls, path: str) -> "Vocab":
        vocab = cls()
        table = pq.read_table(os.path.join(path, "vocab_vectors.parquet"))
        words = table["word"].to_pylist()
        cnts = table["cnt"].to_pylist()
        vecs = table["vec"].to_pylist()
        with_vec: List[Tuple[str, list]] = []
        for word, cnt, vec in zip(words, cnts, vecs):
            vocab.word2cnt[word] = cnt
            if vec is not None:
                with_vec.append((word, vec))
        if with_vec:
            vocab.vectors = np.array([v for _, v in with_vec], dtype=np.float32)
            vocab.word2idx = {w: i for i, (w, _) in enumerate(with_vec)}
        return vocab


def calc_pca_matrix(vocab: "Vocab", target_size: int) -> np.ndarray:
    """PCA transformation matrix over the vocab's word vectors (reference
    ``vocab_utils.calc_matrix``, /root/reference/medcat/utils/
    vocab_utils.py:12-41): mean-center, covariance, eigh, top
    ``target_size`` eigenvectors (rows of the returned matrix)."""
    V = vocab.vectors
    if V.size == 0:
        raise ValueError("vocab has no vectors")
    centered = V.astype(np.float64) - V.mean(axis=0)
    cov = np.cov(centered, rowvar=False)
    eigenvalues, eigenvectors = np.linalg.eigh(cov)
    order = np.argsort(eigenvalues)[::-1]
    return eigenvectors[:, order][:, :target_size].T


def convert_vec(cur: np.ndarray, matrix: np.ndarray,
                target_dtype=np.float32) -> np.ndarray:
    """Project one vector (reference ``vocab_utils.convert_vec``,
    vocab_utils.py:44-59 — uniform float32 output)."""
    return (matrix @ cur).astype(target_dtype)


def compress_vectors(vocab: "Vocab", target_size: int) -> "Vocab":
    """Shrink ALL word vectors to ``target_size`` dims in place via PCA
    (the memory-optimiser path for 300-dim vocabs at 4M+ concepts)."""
    m = calc_pca_matrix(vocab, target_size)
    vocab.vectors = (vocab.vectors.astype(np.float64) @ m.T) \
        .astype(np.float32)
    return vocab
