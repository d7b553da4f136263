"""Torch-free BERT-encoder forward pass (SURVEY.md T4 + T3 parity path).

The reference's two remaining neural components are both BERT-family
eval passes this container cannot run:

* ``TransformersNER`` (/root/reference/medcat/ner/transformers_ner.py:36-
  120) wraps an HF ``AutoModelForTokenClassification`` — BERT encoder +
  per-token linear classifier;
* RelCAT (/root/reference/medcat/rel_cat.py:551-611 with
  /root/reference/medcat/utils/relation_extraction/models.py:170-222)
  runs the same encoder, then concatenates the pooled CLS output with
  the hidden states at the two entity start positions (``e1_e2_start``)
  and pushes through three dense layers (dropout = identity at eval);
  prediction = argmax, confidence = max softmax.

This module reimplements the shared encoder and both heads in numpy
over an exported HF ``state_dict`` weight layout
(``bert.embeddings.word_embeddings.weight``,
``bert.encoder.layer.{i}.attention.self.{query,key,value}.{weight,bias}``,
``...attention.output.dense`` + ``LayerNorm``, ``...intermediate.dense``
(exact erf-GELU), ``...output.dense`` + ``LayerNorm``,
``bert.pooler.dense`` (tanh), ``classifier.{weight,bias}`` /
``fc{1,2,3}.{weight,bias}``).  Eval semantics: post-LayerNorm residual
blocks, eps 1e-12, position ids ``arange``, token-type zeros.  Masked
(padding) key positions get ``-inf`` attention scores and padded hidden
rows are zeroed after every layer, so a sequence's states are identical
alone or right-padded in a batch (HF adds -10000 instead of -inf — a
<1e-40 probability difference; unit tests pin OUR naive per-sample
transcription against the vectorized path, plus a hand-computed
single-head case).

Like ``stages/bilstm.py``, real exported weights drop in unchanged; the
Ray plumbing stays :class:`medcat_ray.stages.transformers_ner.
TransformersNERStage` (token head, via :class:`BertNERScorer`) and
:class:`medcat_ray.stages.triples.RelScoreStage`-style scoring (pair
head).
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_erf = np.frompyfunc(math.erf, 1, 1)


def gelu_exact(x: np.ndarray) -> np.ndarray:
    """BERT's exact erf GELU: x/2 * (1 + erf(x/sqrt(2)))."""
    return x * 0.5 * (1.0 + _erf(x / math.sqrt(2.0)).astype(np.float64))


def layer_norm(x: np.ndarray, w: np.ndarray, b: np.ndarray,
               eps: float = 1e-12) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    z = x - np.max(x, axis=axis, keepdims=True)
    e = np.exp(z)
    return e / np.sum(e, axis=axis, keepdims=True)


class NumpyBertEncoder:
    """Eval-only numpy twin of HF ``BertModel`` (encoder + pooler)."""

    def __init__(self, weights: Dict[str, np.ndarray], num_layers: int,
                 num_heads: int, pad_id: int = 0,
                 prefix: str = "bert.") -> None:
        self.w = {k: np.asarray(v, dtype=np.float64)
                  for k, v in weights.items()}
        self.num_layers = int(num_layers)
        self.num_heads = int(num_heads)
        self.pad_id = int(pad_id)
        self.p = prefix
        emb = self.w[f"{prefix}embeddings.word_embeddings.weight"]
        self.hidden = emb.shape[1]
        if self.hidden % self.num_heads:
            raise ValueError("hidden size not divisible by num_heads")

    def _lin(self, x: np.ndarray, name: str) -> np.ndarray:
        return x @ self.w[f"{name}.weight"].T + self.w[f"{name}.bias"]

    def _ln(self, x: np.ndarray, name: str) -> np.ndarray:
        return layer_norm(x, self.w[f"{name}.weight"],
                          self.w[f"{name}.bias"])

    def _attention(self, X: np.ndarray, key_mask: np.ndarray,
                   layer: str) -> np.ndarray:
        """Multi-head self-attention, HF Bert layout.  ``key_mask``:
        (B, T) bool, True = real token."""
        B, T, H = X.shape
        nh, dh = self.num_heads, H // self.num_heads

        def split(t: np.ndarray) -> np.ndarray:
            return t.reshape(B, T, nh, dh).transpose(0, 2, 1, 3)

        q = split(self._lin(X, f"{layer}.attention.self.query"))
        k = split(self._lin(X, f"{layer}.attention.self.key"))
        v = split(self._lin(X, f"{layer}.attention.self.value"))
        scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(dh)
        scores = np.where(key_mask[:, None, None, :], scores, -np.inf)
        probs = softmax(scores, axis=-1)
        # all-masked query rows (padded positions) produce NaN — they are
        # zeroed by the caller after the block; kill NaN here so the
        # matmul stays finite
        probs = np.nan_to_num(probs, nan=0.0)
        ctx = (probs @ v).transpose(0, 2, 1, 3).reshape(B, T, H)
        return self._lin(ctx, f"{layer}.attention.output.dense")

    def hidden_states(self, seqs: Sequence[Sequence[int]],
                      token_type_ids: Optional[Sequence[Sequence[int]]]
                      = None) -> Tuple[np.ndarray, np.ndarray]:
        """(B, T, H) final hidden states (padded rows zero) + (B,) lens."""
        p = self.p
        lengths = np.array([len(s) for s in seqs], dtype=np.int64)
        T = max(1, int(lengths.max()) if len(seqs) else 1)
        B = len(seqs)
        ids = np.full((B, T), self.pad_id, dtype=np.int64)
        tt = np.zeros((B, T), dtype=np.int64)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s
            if token_type_ids is not None:
                tt[i, :len(s)] = list(token_type_ids[i])
        mask = np.arange(T)[None, :] < lengths[:, None]   # (B, T)

        X = (self.w[f"{p}embeddings.word_embeddings.weight"][ids]
             + self.w[f"{p}embeddings.position_embeddings.weight"][:T][None]
             + self.w[f"{p}embeddings.token_type_embeddings.weight"][tt])
        X = self._ln(X, f"{p}embeddings.LayerNorm")
        X = np.where(mask[:, :, None], X, 0.0)
        for i in range(self.num_layers):
            layer = f"{p}encoder.layer.{i}"
            a = self._attention(X, mask, layer)
            X = self._ln(X + a, f"{layer}.attention.output.LayerNorm")
            h = gelu_exact(self._lin(X, f"{layer}.intermediate.dense"))
            h = self._lin(h, f"{layer}.output.dense")
            X = self._ln(X + h, f"{layer}.output.LayerNorm")
            X = np.where(mask[:, :, None], X, 0.0)
        return X, lengths

    def pooled(self, H: np.ndarray) -> np.ndarray:
        """BertPooler: tanh(dense(h_CLS)) — (B, H)."""
        return np.tanh(self._lin(H[:, 0, :], f"{self.p}pooler.dense"))


class NumpyBertTokenClassifier:
    """``AutoModelForTokenClassification`` eval twin: encoder -> per-token
    linear head; per-token prediction = argmax, confidence = max softmax
    (transformers_ner.py eval pipeline semantics)."""

    def __init__(self, weights: Dict[str, np.ndarray], num_layers: int,
                 num_heads: int, pad_id: int = 0) -> None:
        self.encoder = NumpyBertEncoder(weights, num_layers, num_heads,
                                        pad_id)
        self.cls_w = np.asarray(weights["classifier.weight"], np.float64)
        self.cls_b = np.asarray(weights["classifier.bias"], np.float64)

    def logits(self, seqs: Sequence[Sequence[int]]) -> np.ndarray:
        H, _ = self.encoder.hidden_states(seqs)
        return H @ self.cls_w.T + self.cls_b

    def predict(self, seqs: Sequence[Sequence[int]]
                ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """Per sequence: (label ids, confidences), padding excluded."""
        if not len(seqs):
            return [], []
        lg = self.logits(seqs)
        labels, confs = [], []
        for i, s in enumerate(seqs):
            row = lg[i, :len(s)]
            labels.append(np.argmax(row, axis=1))
            confs.append(np.max(softmax(row, axis=1), axis=1))
        return labels, confs


class NumpyBertRelClassifier:
    """RelCAT pair-classifier eval twin (models.py:170-222 default
    branch): concat(pooled CLS, h[e1_start], h[e2_start]) ->
    fc1 -> fc2 -> fc3 (dropout identity, no activations between the
    dense layers — exactly the reference stack); prediction per
    rel_cat.py:585-596: label = argmax, confidence = max softmax."""

    def __init__(self, weights: Dict[str, np.ndarray], num_layers: int,
                 num_heads: int, pad_id: int = 0) -> None:
        self.encoder = NumpyBertEncoder(weights, num_layers, num_heads,
                                        pad_id)
        self.w = {k: np.asarray(weights[k], np.float64)
                  for k in ("fc1.weight", "fc1.bias", "fc2.weight",
                            "fc2.bias", "fc3.weight", "fc3.bias")}

    def pair_logits(self, H: np.ndarray, pooled: np.ndarray,
                    seq_idx: np.ndarray,
                    e1_e2_start: Sequence[Tuple[int, int]]) -> np.ndarray:
        """Pair head over PRE-COMPUTED encoder states: many pairs can
        share one encoded sequence (``seq_idx`` maps pair -> sequence
        row), so a document is encoded once however many entity pairs it
        yields."""
        starts = np.asarray(e1_e2_start, dtype=np.int64)
        idx = np.asarray(seq_idx, dtype=np.int64)
        x = np.concatenate([pooled[idx], H[idx, starts[:, 0]],
                            H[idx, starts[:, 1]]], axis=1)
        x = x @ self.w["fc1.weight"].T + self.w["fc1.bias"]
        x = x @ self.w["fc2.weight"].T + self.w["fc2.bias"]
        return x @ self.w["fc3.weight"].T + self.w["fc3.bias"]

    def logits(self, seqs: Sequence[Sequence[int]],
               e1_e2_start: Sequence[Tuple[int, int]]) -> np.ndarray:
        H, _ = self.encoder.hidden_states(seqs)
        return self.pair_logits(H, self.encoder.pooled(H),
                                np.arange(len(seqs)), e1_e2_start)

    def predict(self, seqs: Sequence[Sequence[int]],
                e1_e2_start: Sequence[Tuple[int, int]]
                ) -> Tuple[np.ndarray, np.ndarray]:
        if not len(seqs):
            return np.zeros(0, dtype=np.int64), np.zeros(0)
        lg = self.logits(seqs, e1_e2_start)
        return (np.argmax(lg, axis=1),
                np.max(softmax(lg, axis=1), axis=1))


def random_bert_weights(vocab_size: int, hidden: int, num_layers: int,
                        num_heads: int, intermediate: Optional[int] = None,
                        nclasses: int = 0, rel_classes: int = 0,
                        max_pos: int = 64, seed: int = 0,
                        prefix: str = "bert.") -> Dict[str, np.ndarray]:
    """Deterministic small random weights in HF state_dict layout — test
    fixture standing in for a real exported checkpoint."""
    rng = np.random.default_rng(seed)
    im = intermediate or 4 * hidden

    def lin(o, i):
        return (rng.normal(0, 0.2, (o, i)), rng.normal(0, 0.05, o))

    w: Dict[str, np.ndarray] = {}
    p = prefix
    w[f"{p}embeddings.word_embeddings.weight"] = rng.normal(
        0, 0.5, (vocab_size, hidden))
    w[f"{p}embeddings.position_embeddings.weight"] = rng.normal(
        0, 0.1, (max_pos, hidden))
    w[f"{p}embeddings.token_type_embeddings.weight"] = rng.normal(
        0, 0.1, (2, hidden))
    w[f"{p}embeddings.LayerNorm.weight"] = np.ones(hidden)
    w[f"{p}embeddings.LayerNorm.bias"] = np.zeros(hidden)
    for k in range(num_layers):
        L = f"{p}encoder.layer.{k}"
        for part in ("attention.self.query", "attention.self.key",
                     "attention.self.value", "attention.output.dense"):
            w[f"{L}.{part}.weight"], w[f"{L}.{part}.bias"] = lin(hidden,
                                                                 hidden)
        w[f"{L}.attention.output.LayerNorm.weight"] = np.ones(hidden)
        w[f"{L}.attention.output.LayerNorm.bias"] = np.zeros(hidden)
        w[f"{L}.intermediate.dense.weight"], \
            w[f"{L}.intermediate.dense.bias"] = lin(im, hidden)
        w[f"{L}.output.dense.weight"], w[f"{L}.output.dense.bias"] = \
            lin(hidden, im)
        w[f"{L}.output.LayerNorm.weight"] = np.ones(hidden)
        w[f"{L}.output.LayerNorm.bias"] = np.zeros(hidden)
    w[f"{p}pooler.dense.weight"], w[f"{p}pooler.dense.bias"] = lin(hidden,
                                                                   hidden)
    if nclasses:
        w["classifier.weight"], w["classifier.bias"] = lin(nclasses,
                                                           hidden)
    if rel_classes:
        w["fc1.weight"], w["fc1.bias"] = lin(hidden, 3 * hidden)
        w["fc2.weight"], w["fc2.bias"] = lin(hidden, hidden)
        w["fc3.weight"], w["fc3.bias"] = lin(rel_classes, hidden)
    return w


def rule_rel_weights(vocab_size: int, trigger_ids: Sequence[int],
                     max_pos: int = 128,
                     prefix: str = "bert.") -> Dict[str, np.ndarray]:
    """PLANTED saturated weights for :class:`NumpyBertRelClassifier`: the
    full encoder + pair-head forward provably computes "class 0 iff the
    e1 (subject) start token is a trigger token" with confidence EXACTLY
    1.0 — the driver-oracle trick for ``kg_rel_bert`` (the random-weight
    forward stays pinned by tests/test_bert.py's hand-computed twin).

    Construction (sign-exact through every float64 op):

    * word embeddings: triggers → (1, −1, 1, −1), everything else →
      (1, −1, −1, 1); position/token-type embeddings zero; all LayerNorm
      scales 1 / biases 0.  Each embedding row has mean 0 and variance 1
      EXACTLY, so every LayerNorm only rescales by 1/√(1+eps) —
      coordinate 2's SIGN encodes "is trigger" untouched;
    * all attention Q/K/V/output and FFN weights zero: attention adds 0
      (uniform probs × zero values) and the residual LayerNorms again
      preserve sign, so the final hidden state of token t is a function
      of token t alone;
    * pooler zero → pooled ≡ 0; head: fc1 picks 100 × coordinate 2 of
      h[e1_start] (concat offset 4+2), fc2 passes through, fc3 emits
      (+z, −z) — |logit gap| ≈ 200, so max softmax = 1.0 exactly.
    """
    hidden, nh = 4, 2
    p = prefix
    w: Dict[str, np.ndarray] = {}
    emb = np.tile(np.array([1.0, -1.0, -1.0, 1.0]), (vocab_size, 1))
    for t in trigger_ids:
        emb[int(t)] = np.array([1.0, -1.0, 1.0, -1.0])
    w[f"{p}embeddings.word_embeddings.weight"] = emb
    w[f"{p}embeddings.position_embeddings.weight"] = np.zeros((max_pos,
                                                               hidden))
    w[f"{p}embeddings.token_type_embeddings.weight"] = np.zeros((2, hidden))
    w[f"{p}embeddings.LayerNorm.weight"] = np.ones(hidden)
    w[f"{p}embeddings.LayerNorm.bias"] = np.zeros(hidden)
    L = f"{p}encoder.layer.0"
    for part in ("attention.self.query", "attention.self.key",
                 "attention.self.value", "attention.output.dense"):
        w[f"{L}.{part}.weight"] = np.zeros((hidden, hidden))
        w[f"{L}.{part}.bias"] = np.zeros(hidden)
    w[f"{L}.attention.output.LayerNorm.weight"] = np.ones(hidden)
    w[f"{L}.attention.output.LayerNorm.bias"] = np.zeros(hidden)
    w[f"{L}.intermediate.dense.weight"] = np.zeros((4 * hidden, hidden))
    w[f"{L}.intermediate.dense.bias"] = np.zeros(4 * hidden)
    w[f"{L}.output.dense.weight"] = np.zeros((hidden, 4 * hidden))
    w[f"{L}.output.dense.bias"] = np.zeros(hidden)
    w[f"{L}.output.LayerNorm.weight"] = np.ones(hidden)
    w[f"{L}.output.LayerNorm.bias"] = np.zeros(hidden)
    w[f"{p}pooler.dense.weight"] = np.zeros((hidden, hidden))
    w[f"{p}pooler.dense.bias"] = np.zeros(hidden)
    fc1 = np.zeros((hidden, 3 * hidden))
    fc1[0, hidden + 2] = 100.0            # coordinate 2 of h[e1_start]
    w["fc1.weight"], w["fc1.bias"] = fc1, np.zeros(hidden)
    fc2 = np.zeros((hidden, hidden))
    fc2[0, 0] = 1.0
    w["fc2.weight"], w["fc2.bias"] = fc2, np.zeros(hidden)
    w["fc3.weight"] = np.array([[1.0, 0.0, 0.0, 0.0],
                                [-1.0, 0.0, 0.0, 0.0]])
    w["fc3.bias"] = np.zeros(2)
    assert nh == 2 and hidden % nh == 0
    return w


def save_weights(weights: Dict[str, np.ndarray], path: str,
                 **meta: int) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{f"__{k}": v for k, v in meta.items()}, **weights)


def load_weights(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, int]]:
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    meta = {k[2:]: int(z[k]) for k in z.files if k.startswith("__")}
    return {k: z[k] for k in z.files if not k.startswith("__")}, meta


class BertNERScorer:
    """Adapts :class:`NumpyBertTokenClassifier` to the
    ``TransformersNERStage`` ``scorer(texts)`` seam: word-level tokenize
    with char offsets, classify tokens, decode BIO labels into entity
    dicts (start, end, cui, source_value, context_similarity =
    min token confidence over the span).

    ``id2label`` maps class ids to "O" / "B-<cui>" / "I-<cui>" (the
    reference's tokenizer.dat label map).  The reference tokenizes with
    wordpieces; word-level ids are this build's injectable stand-in —
    the model consumes whatever id space ``token2id`` defines.
    """

    def __init__(self, model: NumpyBertTokenClassifier,
                 token2id: Dict[str, int], id2label: Dict[int, str],
                 unk_id: int = 1, lowercase: bool = True,
                 max_len: int = 64) -> None:
        import re
        self.model = model
        self.token2id = dict(token2id)
        self.id2label = dict(id2label)
        self.unk_id = int(unk_id)
        self.lowercase = bool(lowercase)
        self.max_len = int(max_len)
        self._tok_re = re.compile(r"\S+")

    def __call__(self, texts: List[str]) -> List[List[dict]]:
        spans_per_text = []
        seqs = []
        for text in texts:
            toks = [(m.group(0), m.start(), m.end())
                    for m in self._tok_re.finditer(text or "")]
            toks = toks[: self.max_len]
            spans_per_text.append(toks)
            seqs.append([self.token2id.get(
                t.lower() if self.lowercase else t, self.unk_id)
                for t, _, _ in toks])
        labels, confs = self.model.predict(seqs)
        out: List[List[dict]] = []
        for toks, lab, cf in zip(spans_per_text,
                                 labels or [[]] * len(texts),
                                 confs or [[]] * len(texts)):
            ents: List[dict] = []
            cur: Optional[dict] = None
            for (tok, s, e), lid, c in zip(toks, lab, cf):
                tag = self.id2label.get(int(lid), "O")
                if tag.startswith("B-"):
                    cur = {"cui": tag[2:], "start": s, "end": e,
                           "context_similarity": float(c)}
                    ents.append(cur)
                elif tag.startswith("I-") and cur is not None \
                        and cur["cui"] == tag[2:]:
                    cur["end"] = e
                    cur["context_similarity"] = min(
                        cur["context_similarity"], float(c))
                else:
                    cur = None
            for ent in ents:
                ent["source_value"] = ""
            out.append(ents)
        # fill source_value from the original text
        for text, ents in zip(texts, out):
            for ent in ents:
                ent["source_value"] = (text or "")[ent["start"]:ent["end"]]
        return out


class BertRelScorer:
    """Adapts :class:`NumpyBertRelClassifier` to the
    ``RelScoreStage.model.predict(text, subj_span, obj_span)`` seam
    (stages/rel_model.py:129): word-level tokenize, map the two entity
    char spans to their start-token indices (the reference's
    ``e1_e2_start`` default branch, models.py:199-210), classify the
    pair.  Picklable -> shippable with ``ray.put`` like LearnedRelModel."""

    def __init__(self, model: NumpyBertRelClassifier,
                 token2id: Dict[str, int], id2label: Dict[int, str],
                 unk_id: int = 1, cls_id: Optional[int] = None,
                 lowercase: bool = True, max_len: int = 64) -> None:
        self.model = model
        self.token2id = dict(token2id)
        self.id2label = dict(id2label)
        self.unk_id = int(unk_id)
        self.cls_id = cls_id
        self.lowercase = bool(lowercase)
        self.max_len = int(max_len)

    def _encode(self, text: str, subj: Tuple[int, int],
                obj: Tuple[int, int],
                cache: Optional[dict] = None
                ) -> Tuple[List[int], Tuple[int, int]]:
        import re
        key = text
        if cache is not None and key in cache:
            toks, ids = cache[key]
        else:
            toks = [(m.group(0), m.start()) for m in
                    re.finditer(r"\S+", text or "")][: self.max_len]
            ids = [self.token2id.get(t.lower() if self.lowercase else t,
                                     self.unk_id) for t, _ in toks]
            if self.cls_id is not None:      # reference seqs start at [CLS]
                ids = [self.cls_id] + ids
            if cache is not None:
                cache[key] = (toks, ids)
        off = 1 if self.cls_id is not None else 0

        def tok_index(char_start: int) -> int:
            best = 0
            for i, (_, s) in enumerate(toks):
                if s <= char_start:
                    best = i
                else:
                    break
            return best + off

        return ids, (tok_index(subj[0]), tok_index(obj[0]))

    def predict(self, text: str, subj: Tuple[int, int],
                obj: Tuple[int, int]) -> Tuple[str, float]:
        ids, starts = self._encode(text, subj, obj)
        preds, confs = self.model.predict([ids], [starts])
        return self.id2label[int(preds[0])], float(confs[0])

    def predict_many(self, items: Sequence[Tuple[str, Tuple[int, int],
                                                 Tuple[int, int]]]
                     ) -> List[Tuple[str, float]]:
        """Batched pair scoring, factorized for the many-pairs-per-doc
        shape: each DISTINCT text is encoded once (one batched encoder
        forward over distinct sequences), then the three-dense pair head
        runs vectorized over all pairs via their (seq_idx, e1_e2_start)
        gathers — called by RelScoreStage when present."""
        if not items:
            return []
        cache: dict = {}
        text2row: dict = {}
        seqs: List[List[int]] = []
        seq_idx: List[int] = []
        starts: List[Tuple[int, int]] = []
        for text, subj, obj in items:
            ids, st = self._encode(text, subj, obj, cache)
            row = text2row.get(text)
            if row is None:
                row = text2row[text] = len(seqs)
                seqs.append(ids)
            seq_idx.append(row)
            starts.append(st)
        H, _ = self.model.encoder.hidden_states(seqs)
        lg = self.model.pair_logits(H, self.model.encoder.pooled(H),
                                    np.asarray(seq_idx), starts)
        probs = softmax(lg, axis=1)
        preds = np.argmax(lg, axis=1)
        confs = np.max(probs, axis=1)
        return [(self.id2label[int(p)], float(c))
                for p, c in zip(preds, confs)]
