"""Trainable token-classification NER (SURVEY.md T4 upgrade path).

The reference TransformersNER (/root/reference/medcat/ner/transformers_ner.py)
is a HuggingFace token classifier whose labels map to CUIs.  Torch is
absent here; this is a REAL trainable replacement producing the exact
``scorer(texts) -> List[List[dict]]`` callable that
:class:`medcat_ray.stages.transformers_ner.TransformersNERStage` injects —
the Ray stage, Arrow schema and downstream linking stay unchanged.

* scheme — BIO tags over CUI classes (B-<cui>/I-<cui>/O), decoded to
  character spans.
* features per token — hashed identity, lowercase, prefix-2/suffix-3
  (sub-word generalization standing in for word-pieces), neighbor token
  identities, shape flags (upper/digit).  Hashing trick, stable blake2b.
* model — multinomial logistic regression per token, deterministic GD
  (shared machinery with the meta/rel models).
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from medcat_ray.ops.hashing import stable_u64
from medcat_ray.stages.meta_model import _softmax

_TOK_RE = re.compile(r"[A-Za-z0-9]+")


def _tokens_with_spans(text: str) -> List[Tuple[str, int, int]]:
    return [(m.group(0), m.start(), m.end())
            for m in _TOK_RE.finditer(text)]


def _token_features(toks: List[Tuple[str, int, int]], i: int,
                    hash_bits: int) -> List[int]:
    mask = (1 << hash_bits) - 1
    t = toks[i][0]
    lo = t.lower()
    feats = [
        stable_u64(f"w:{lo}".encode()) & mask,
        stable_u64(f"p2:{lo[:2]}".encode()) & mask,
        stable_u64(f"s3:{lo[-3:]}".encode()) & mask,
        stable_u64(f"sh:{t.isupper()}:{t.isdigit()}".encode()) & mask,
        stable_u64(("prev:" + (toks[i - 1][0].lower() if i else "<s>"))
                   .encode()) & mask,
        stable_u64(("next:" + (toks[i + 1][0].lower()
                               if i + 1 < len(toks) else "</s>"))
                   .encode()) & mask,
    ]
    return feats


class LearnedNERModel:
    """BIO token classifier over hashed features; labels carry CUIs."""

    def __init__(self, cuis: Sequence[str], hash_bits: int = 15) -> None:
        self.labels = ["O"] + [f"{p}-{c}" for c in sorted(cuis)
                               for p in ("B", "I")]
        self.label2id = {l: i for i, l in enumerate(self.labels)}
        self.hash_bits = hash_bits
        self.W = np.zeros((1 << hash_bits, len(self.labels)),
                          dtype=np.float64)
        self.b = np.zeros(len(self.labels), dtype=np.float64)

    # -- features ---------------------------------------------------------

    def _X(self, toks) -> np.ndarray:
        X = np.zeros((len(toks), 1 << self.hash_bits), dtype=np.float64)
        for i in range(len(toks)):
            for f in _token_features(toks, i, self.hash_bits):
                X[i, f] += 1.0
        return X

    # -- training ---------------------------------------------------------

    def fit(self, samples: Sequence[Tuple[str, List[Tuple[int, int, str]]]],
            epochs: int = 250, lr: float = 0.5, l2: float = 1e-4,
            seed: int = 9) -> float:
        """samples = (text, [(start, end, cui), ...]).  Token-level BIO
        targets come from char-span overlap (the reference aligns word
        pieces to annotation offsets the same way)."""
        Xs, ys = [], []
        for text, spans in samples:
            toks = _tokens_with_spans(text)
            y = np.zeros(len(toks), dtype=np.int64)  # O
            for start, end, cui in spans:
                first = True
                for ti, (_, ts, te) in enumerate(toks):
                    if ts >= start and te <= end:
                        tag = ("B" if first else "I") + "-" + cui
                        y[ti] = self.label2id[tag]
                        first = False
            Xs.append(self._X(toks))
            ys.append(y)
        X = np.concatenate(Xs)
        y = np.concatenate(ys)
        rng = np.random.default_rng(seed)
        self.W = rng.normal(scale=1e-3, size=self.W.shape)
        self.b[:] = 0.0
        n = len(y)
        Y = np.zeros((n, len(self.labels)))
        Y[np.arange(n), y] = 1.0
        for _ in range(epochs):
            P = _softmax(X @ self.W + self.b)
            G = (P - Y) / n
            self.W -= lr * (X.T @ G + l2 * self.W)
            self.b -= lr * G.sum(axis=0)
        return float((np.argmax(X @ self.W + self.b, axis=1) == y).mean())

    # -- inference --------------------------------------------------------

    def tag_text(self, text: str) -> List[dict]:
        toks = _tokens_with_spans(text)
        if not toks:
            return []
        P = _softmax(self._X(toks) @ self.W + self.b)
        pred = np.argmax(P, axis=1)
        ents: List[dict] = []
        i = 0
        while i < len(toks):
            label = self.labels[pred[i]]
            if label.startswith("B-"):
                cui = label[2:]
                start = toks[i][1]
                end = toks[i][2]
                conf = [float(P[i, pred[i]])]
                j = i + 1
                while j < len(toks) and \
                        self.labels[pred[j]] == f"I-{cui}":
                    end = toks[j][2]
                    conf.append(float(P[j, pred[j]]))
                    j += 1
                ents.append({"start": start, "end": end, "cui": cui,
                             "source_value": text[start:end],
                             "context_similarity": float(np.mean(conf))})
                i = j
            else:
                i += 1
        return ents

    def as_scorer(self) -> Callable[[List[str]], List[List[dict]]]:
        """The injectable ``scorer`` for TransformersNERStage."""
        return lambda texts: [self.tag_text(t or "") for t in texts]

    @classmethod
    def fit_from_mct_export(cls, paths, hash_bits: int = 15,
                            **fit_kw) -> Tuple["LearnedNERModel", float]:
        """The reference's end-to-end train path — TransformersNER.train
        (medcat/ner/transformers_ner.py:183-236) builds its HF dataset
        from an MCT export JSON, then fine-tunes — re-expressed over the
        Ray source: :func:`read_transformers_ner` parses the export files
        in tasks (one per file), examples stream to the trainer via
        ``iter_batches``, CUI label space is discovered from the data.
        Labeled exports are ≪ corpus-sized, so the fit itself is a single
        driver-side stage (the reference's trainer is likewise one
        process/GPU).  Returns (model, train accuracy)."""
        from medcat_ray.sources.hf_datasets import read_transformers_ner
        samples: List[Tuple[str, List[Tuple[int, int, str]]]] = []
        cuis: set = set()
        for batch in read_transformers_ner(paths).iter_batches(
                batch_format="pyarrow"):
            for text, s, e, c in zip(batch["text"].to_pylist(),
                                     batch["ent_starts"].to_pylist(),
                                     batch["ent_ends"].to_pylist(),
                                     batch["ent_cuis"].to_pylist()):
                samples.append((text, list(zip(s, e, c))))
                cuis.update(c)
        model = cls(sorted(cuis), hash_bits=hash_bits)
        acc = model.fit(samples, **fit_kw)
        return model, acc

    # -- serialization ----------------------------------------------------

    def save(self, path: str) -> None:
        np.savez_compressed(path, W=self.W, b=self.b,
                            labels=np.array(self.labels, dtype=object),
                            bits=np.array([self.hash_bits]))

    @classmethod
    def load(cls, path: str) -> "LearnedNERModel":
        z = np.load(path, allow_pickle=True)
        labels = list(z["labels"])
        cuis = sorted({l[2:] for l in labels if l != "O"})
        m = cls(cuis, hash_bits=int(z["bits"][0]))
        assert m.labels == labels
        m.W = z["W"]
        m.b = z["b"]
        return m
