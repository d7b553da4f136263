"""Trainable relation scorer (SURVEY.md T3 upgrade path).

The reference RelCAT (/root/reference/medcat/rel_cat.py:551-611) scores
candidate entity pairs with a torch BERT model and writes
``doc._.relations`` entries {relation, confidence, ...}.  Torch is absent
here; this is a REAL trainable replacement over the same candidate
semantics (the char-window ordered pairs of ``stages/triples.py``):

* features — hashing-trick bags for three zones around a candidate pair:
  subject left context ("S:"), the between-entities span ("B:"), object
  right context ("O:"), distance-decayed like the meta model.  The between
  zone carries most relation signal ("X *inhibits* Y").
* model — multinomial logistic regression (shared machinery with
  :mod:`medcat_ray.stages.meta_model`), deterministic GD.
* inference — an actor-pool ``map_batches`` over ANNOTATED rows (text +
  ents) emitting (subj_cui, pred, obj_cui, confidence, key, spans) rows;
  candidates are the same window-bounded ordered pairs the co-occurrence
  triples use.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from medcat_ray.ops.hashing import stable_u64
from medcat_ray.stages.meta_model import _softmax
from medcat_ray.stages.annotate import tune_actor_gc

_TOK_RE = re.compile(r"[A-Za-z0-9]+")


def _toks(s: str) -> List[str]:
    return [m.group(0).lower() for m in _TOK_RE.finditer(s)]


def featurize_pair(text: str, subj: Tuple[int, int], obj: Tuple[int, int],
                   hash_bits: int = 15, cntx: int = 10) -> np.ndarray:
    """Hashed three-zone features for one ordered candidate pair."""
    dim = 1 << hash_bits
    mask = dim - 1
    x = np.zeros(dim, dtype=np.float64)
    left = _toks(text[: subj[0]])[-cntx:]
    between = _toks(text[subj[1]: obj[0]])
    right = _toks(text[obj[1]:])[:cntx]
    for dist, tok in enumerate(reversed(left)):
        x[stable_u64(f"S:{tok}".encode()) & mask] += 1.0 / (1 + dist)
    for tok in between:
        x[stable_u64(f"B:{tok}".encode()) & mask] += 1.0
    for dist, tok in enumerate(right):
        x[stable_u64(f"O:{tok}".encode()) & mask] += 1.0 / (1 + dist)
    return x


class LearnedRelModel:
    """Relation-label classifier over three-zone hashed features."""

    def __init__(self, label2id: Dict[str, int], hash_bits: int = 15,
                 cntx: int = 10) -> None:
        self.label2id = dict(label2id)
        self.id2label = {i: l for l, i in self.label2id.items()}
        self.hash_bits = hash_bits
        self.cntx = cntx
        self.W = np.zeros((1 << hash_bits, len(label2id)), dtype=np.float64)
        self.b = np.zeros(len(label2id), dtype=np.float64)

    def predict(self, text: str, subj: Tuple[int, int],
                obj: Tuple[int, int]) -> Tuple[str, float]:
        x = featurize_pair(text, subj, obj, self.hash_bits, self.cntx)
        p = _softmax((x @ self.W + self.b)[None, :])[0]
        k = int(np.argmax(p))
        return self.id2label[k], float(p[k])

    def fit(self, X: np.ndarray, y: np.ndarray, epochs: int = 200,
            lr: float = 0.5, l2: float = 1e-4, seed: int = 7) -> float:
        rng = np.random.default_rng(seed)
        self.W = rng.normal(scale=1e-3, size=self.W.shape)
        self.b[:] = 0.0
        n = len(y)
        Y = np.zeros((n, self.W.shape[1]))
        Y[np.arange(n), y] = 1.0
        for _ in range(epochs):
            P = _softmax(X @ self.W + self.b)
            G = (P - Y) / n
            self.W -= lr * (X.T @ G + l2 * self.W)
            self.b -= lr * G.sum(axis=0)
        return float((np.argmax(X @ self.W + self.b, axis=1) == y).mean())

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, W=self.W, b=self.b,
            meta=np.array([str(self.hash_bits), str(self.cntx)],
                          dtype=object),
            labels=np.array(sorted(self.label2id, key=self.label2id.get),
                            dtype=object))

    @classmethod
    def load(cls, path: str) -> "LearnedRelModel":
        z = np.load(path, allow_pickle=True)
        bits, cntx = z["meta"]
        labels = list(z["labels"])
        m = cls({l: i for i, l in enumerate(labels)},
                hash_bits=int(bits), cntx=int(cntx))
        m.W = z["W"]
        m.b = z["b"]
        return m


def train_rel_model(samples: Sequence[Tuple[str, Tuple[int, int],
                                            Tuple[int, int], str]],
                    hash_bits: int = 15, cntx: int = 10,
                    epochs: int = 200, lr: float = 0.5,
                    seed: int = 7) -> Tuple[LearnedRelModel, float]:
    """samples = (text, subj_span, obj_span, label) — e.g. from an MCT
    relations export.  Returns (model, train accuracy)."""
    labels = sorted({s[3] for s in samples})
    model = LearnedRelModel({l: i for i, l in enumerate(labels)},
                            hash_bits, cntx)
    X = np.stack([featurize_pair(t, s, o, hash_bits, cntx)
                  for t, s, o, _ in samples])
    y = np.array([model.label2id[s[3]] for s in samples])
    acc = model.fit(X, y, epochs=epochs, lr=lr, seed=seed)
    return model, acc


class RelScoreStage:
    """Actor: score window-bounded candidate pairs of annotated rows with a
    learned model → relation rows (reference doc._.relations analogue,
    rel_cat.py:595-607).  The model loads once per actor (``model_ref`` =
    ``ray.put`` handle or a .npz path)."""

    def __init__(self, model_ref, window: int = 300,
                 key_column: str = "url", text_column: str = "text",
                 min_confidence: float = 0.0) -> None:
        import ray
        if isinstance(model_ref, str):
            self.model = LearnedRelModel.load(model_ref)
        else:
            self.model = ray.get(model_ref)
        self.window = window
        self.key_column = key_column
        self.text_column = text_column
        self.min_confidence = min_confidence
        tune_actor_gc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys_out, subj_out, pred_out, obj_out, conf_out = [], [], [], [], []
        ss_out, os_out = [], []
        # pass 1: collect window-bounded candidate pairs for the whole
        # Arrow batch — the batch unit NN models score in one forward
        # (reference DataLoader batching, rel_cat.py:563-586)
        items: list = []    # (text, subj_span, obj_span)
        meta: list = []     # (key, subj_ent, obj_ent)
        for key, text, ents in zip(batch[self.key_column].to_pylist(),
                                   batch[self.text_column].to_pylist(),
                                   batch["ents"].to_pylist()):
            ents = ents or []
            n = len(ents)
            for i in range(n):
                for j in range(i + 1, n):
                    if ents[j]["start"] - ents[i]["start"] > self.window:
                        break  # ents sorted by start
                    if ents[j]["source_value"] == ents[i]["source_value"]:
                        continue
                    items.append((text or "",
                                  (ents[i]["start"], ents[i]["end"]),
                                  (ents[j]["start"], ents[j]["end"])))
                    meta.append((key, ents[i], ents[j]))
        if hasattr(self.model, "predict_many"):
            scored = self.model.predict_many(items)
        else:
            scored = [self.model.predict(t, s, o) for t, s, o in items]
        for (key, se, oe), (label, conf) in zip(meta, scored):
            if conf < self.min_confidence:
                continue
            keys_out.append(key)
            subj_out.append(se["cui"])
            pred_out.append(label)
            obj_out.append(oe["cui"])
            conf_out.append(conf)
            ss_out.append(se["start"])
            os_out.append(oe["start"])
        return pa.table({
            "subj_cui": pa.array(subj_out, type=pa.string()),
            "pred": pa.array(pred_out, type=pa.string()),
            "obj_cui": pa.array(obj_out, type=pa.string()),
            "confidence": pa.array(conf_out, type=pa.float64()),
            self.key_column: pa.array(
                keys_out, type=batch[self.key_column].type),
            "subj_start": pa.array(ss_out, type=pa.int32()),
            "obj_start": pa.array(os_out, type=pa.int32()),
        })


def score_relations(annotated, model, window: int = 300,
                    key_column: str = "url", text_column: str = "text",
                    min_confidence: float = 0.0, concurrency=2,
                    batch_size: int = 128):
    """Pipeline helper: learned relation scoring as its own actor-pool
    stage (own batch size / pool — add ``num_gpus`` for a GPU model)."""
    import ray
    model_ref = model if isinstance(model, str) else ray.put(model)
    return annotated.map_batches(
        RelScoreStage,
        fn_constructor_kwargs=dict(model_ref=model_ref, window=window,
                                   key_column=key_column,
                                   text_column=text_column,
                                   min_confidence=min_confidence),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
