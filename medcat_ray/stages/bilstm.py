"""Torch-free BiLSTM MetaCAT forward pass (SURVEY.md T2 parity path).

The reference MetaCAT's eval-time model is a torch ``nn.LSTM`` stack
(/root/reference/medcat/utils/meta_cat/models.py:11-84 ``LSTM.forward``):
``nn.Embedding(padding_idx)`` -> ``pack_padded_sequence`` ->
bidirectional multi-layer LSTM -> per-sample **max over the hidden states
at the entity's center positions** -> dropout (identity at eval) ->
``nn.Linear`` to class logits.  Prediction and confidence come from
``predict`` (/root/reference/medcat/utils/meta_cat/ml_utils.py:74-122):
``argmax(logits)`` and ``max(softmax(logits))``.

Torch is not in this container, so this module reimplements exactly that
forward pass in numpy over an exported weight dict (PyTorch
``state_dict`` key layout: ``embeddings.weight``, ``rnn.weight_ih_l{k}``
/ ``rnn.weight_hh_l{k}`` / ``rnn.bias_ih_l{k}`` / ``rnn.bias_hh_l{k}``
(+ ``_reverse`` twins), ``fc1.weight`` / ``fc1.bias``; gate order
i, f, g, o).  Packed-sequence semantics are honoured: positions at or
beyond a sample's length produce zero output rows and the backward
direction starts at ``length - 1`` per sample, not at the padded end —
so a sequence's states are identical whether it is evaluated alone or
right-padded inside a larger batch (unit-tested).

Window construction mirrors ``prepare_document``
(/root/reference/medcat/meta_cat.py:446-518): ``cntx_left`` token ids
before the entity's first token, the entity tokens, ``cntx_right`` after
its last; center positions are the entity-token indices re-based into
the window.  :class:`BiLSTMMetaScorer` adapts this to the
``score(left, right, center)`` seam of
:class:`medcat_ray.stages.meta.MetaAnnotateStage` so the Ray plumbing
(separate actor pool, per-entity windows, ``meta_anns`` structs) is
untouched — swap the rule lexicon / hashed-LR for real exported BiLSTM
weights by passing this scorer in ``rules=[...]``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _sigmoid(x: np.ndarray) -> np.ndarray:
    # numerically-stable logistic
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def softmax(x: np.ndarray, axis: int = -1) -> np.ndarray:
    z = x - np.max(x, axis=axis, keepdims=True)
    e = np.exp(z)
    return e / np.sum(e, axis=axis, keepdims=True)


def lstm_layer(X: np.ndarray, lengths: np.ndarray, w_ih: np.ndarray,
               w_hh: np.ndarray, b_ih: np.ndarray, b_hh: np.ndarray,
               reverse: bool = False) -> np.ndarray:
    """One LSTM direction over a right-padded batch, packed semantics.

    ``X``: (B, T, I); ``lengths``: (B,).  Returns (B, T, H) with zero rows
    at padded positions (``pad_packed_sequence`` zero-fill).  Gate order
    and update equations follow torch ``nn.LSTM`` exactly:
    ``i,f,g,o = split(W_ih x + b_ih + W_hh h + b_hh)``,
    ``c' = f*c + i*g``, ``h' = o * tanh(c')``.
    """
    B, T, _ = X.shape
    H = w_hh.shape[1]
    h = np.zeros((B, H), dtype=np.float64)
    c = np.zeros((B, H), dtype=np.float64)
    out = np.zeros((B, T, H), dtype=np.float64)
    rows = np.arange(B)
    for step in range(T):
        if reverse:
            # per-sample time index: packed backward starts at len-1
            t = lengths - 1 - step
            valid = t >= 0
            ti = np.clip(t, 0, T - 1)
        else:
            t = np.full(B, step, dtype=np.int64)
            valid = step < lengths
            ti = t
        if not valid.any():
            break
        xt = X[rows, ti]  # (B, I)
        g = xt @ w_ih.T + b_ih + h @ w_hh.T + b_hh
        i = _sigmoid(g[:, :H])
        f = _sigmoid(g[:, H:2 * H])
        gg = np.tanh(g[:, 2 * H:3 * H])
        o = _sigmoid(g[:, 3 * H:])
        c_new = f * c + i * gg
        h_new = o * np.tanh(c_new)
        m = valid[:, None]
        h = np.where(m, h_new, h)
        c = np.where(m, c_new, c)
        out[rows[valid], ti[valid]] = h[valid]
    return out


class NumpyBiLSTM:
    """Eval-only numpy twin of the reference MetaCAT ``LSTM`` module.

    ``weights`` uses the torch ``state_dict`` key layout described in the
    module docstring.  ``hidden_size`` is the CONCATENATED size (as in the
    reference config); each direction runs ``hidden_size//num_directions``
    units (models.py:28-32).
    """

    def __init__(self, weights: Dict[str, np.ndarray], padding_idx: int,
                 num_layers: int = 2, bidirectional: bool = True) -> None:
        self.w = {k: np.asarray(v, dtype=np.float64)
                  for k, v in weights.items()}
        self.padding_idx = int(padding_idx)
        self.num_layers = int(num_layers)
        self.bidirectional = bool(bidirectional)
        self.emb = self.w["embeddings.weight"]
        for k in range(self.num_layers):
            for suf in ([""] if not bidirectional else ["", "_reverse"]):
                for part in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
                    key = f"rnn.{part}_l{k}{suf}"
                    if key not in self.w:
                        raise KeyError(f"missing LSTM weight {key}")
        self.fc_w = self.w["fc1.weight"]   # (nclasses, hidden_size)
        self.fc_b = self.w["fc1.bias"]
        self.nclasses = self.fc_w.shape[0]

    # -- forward -----------------------------------------------------------
    def hidden_states(self, seqs: Sequence[Sequence[int]]
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """(B, T, hidden_size) padded hidden states + (B,) lengths."""
        lengths = np.array([len(s) for s in seqs], dtype=np.int64)
        T = max(1, int(lengths.max()) if len(seqs) else 1)
        ids = np.full((len(seqs), T), self.padding_idx, dtype=np.int64)
        for i, s in enumerate(seqs):
            ids[i, :len(s)] = s
        X = self.emb[ids]  # (B, T, E); pad rows never read past length
        for k in range(self.num_layers):
            fwd = lstm_layer(X, lengths, self.w[f"rnn.weight_ih_l{k}"],
                             self.w[f"rnn.weight_hh_l{k}"],
                             self.w[f"rnn.bias_ih_l{k}"],
                             self.w[f"rnn.bias_hh_l{k}"])
            if self.bidirectional:
                bwd = lstm_layer(X, lengths,
                                 self.w[f"rnn.weight_ih_l{k}_reverse"],
                                 self.w[f"rnn.weight_hh_l{k}_reverse"],
                                 self.w[f"rnn.bias_ih_l{k}_reverse"],
                                 self.w[f"rnn.bias_hh_l{k}_reverse"],
                                 reverse=True)
                X = np.concatenate([fwd, bwd], axis=2)
            else:
                X = fwd
        return X, lengths

    def logits(self, seqs: Sequence[Sequence[int]],
               center_positions: Sequence[Sequence[int]]) -> np.ndarray:
        """Per-sample logits: max over center-position hidden rows -> fc1
        (models.py:66-83, eval path: dropout = identity)."""
        if not len(seqs):
            return np.zeros((0, self.nclasses), dtype=np.float64)
        H, _ = self.hidden_states(seqs)
        pooled = np.stack([H[i, list(cp), :].max(axis=0)
                           for i, cp in enumerate(center_positions)])
        return pooled @ self.fc_w.T + self.fc_b

    def predict(self, seqs: Sequence[Sequence[int]],
                center_positions: Sequence[Sequence[int]]
                ) -> Tuple[np.ndarray, np.ndarray]:
        """(predictions, confidences) exactly as ml_utils.predict:74-122."""
        lg = self.logits(seqs, center_positions)
        if lg.shape[0] == 0:
            return (np.zeros(0, dtype=np.int64), np.zeros(0))
        return (np.argmax(lg, axis=1),
                np.max(softmax(lg, axis=1), axis=1))

    # -- persistence (model-pack artifact) ----------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, __padding_idx=self.padding_idx,
                 __num_layers=self.num_layers,
                 __bidirectional=int(self.bidirectional), **self.w)

    @classmethod
    def load(cls, path: str) -> "NumpyBiLSTM":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        meta = {k: z[k] for k in z.files if k.startswith("__")}
        w = {k: z[k] for k in z.files if not k.startswith("__")}
        return cls(w, padding_idx=int(meta["__padding_idx"]),
                   num_layers=int(meta["__num_layers"]),
                   bidirectional=bool(int(meta["__bidirectional"])))


def random_weights(vocab_size: int, embedding_size: int, hidden_size: int,
                   nclasses: int, num_layers: int = 2,
                   bidirectional: bool = True, padding_idx: int = 0,
                   seed: int = 0) -> Dict[str, np.ndarray]:
    """Deterministic small random weight dict in torch state_dict layout —
    for tests/fixtures (stands in for a real exported checkpoint)."""
    rng = np.random.default_rng(seed)
    dirs = 2 if bidirectional else 1
    h = hidden_size // dirs
    w: Dict[str, np.ndarray] = {
        "embeddings.weight": rng.normal(0, 0.5, (vocab_size,
                                                 embedding_size)),
        "fc1.weight": rng.normal(0, 0.5, (nclasses, hidden_size)),
        "fc1.bias": rng.normal(0, 0.1, nclasses),
    }
    w["embeddings.weight"][padding_idx] = 0.0
    for k in range(num_layers):
        in_size = embedding_size if k == 0 else hidden_size
        for suf in ([""] if not bidirectional else ["", "_reverse"]):
            w[f"rnn.weight_ih_l{k}{suf}"] = rng.normal(0, 0.4,
                                                       (4 * h, in_size))
            w[f"rnn.weight_hh_l{k}{suf}"] = rng.normal(0, 0.4, (4 * h, h))
            w[f"rnn.bias_ih_l{k}{suf}"] = rng.normal(0, 0.1, 4 * h)
            w[f"rnn.bias_hh_l{k}{suf}"] = rng.normal(0, 0.1, 4 * h)
    return w


def rule_negation_weights(vocab_size: int,
                          trigger_ids: Sequence[int],
                          padding_idx: int = 0) -> Dict[str, np.ndarray]:
    """PLANTED saturated weights: a 1-layer BiLSTM whose forward pass
    computes exactly "class 1 iff any trigger token appears at or before
    the last center position (within the window)" with confidence
    EXACTLY 1.0 — which makes the full NN forward SQL-derivable (the
    driver-oracle trick for ``kg_meta_bilstm``).

    Construction (all arithmetic float64-EXACT, not approximate):

    * embedding dim 1: trigger tokens → 1.0, everything else → 0.0;
    * forward LSTM unit with i = f = o = sigmoid(50) = 1.0 exactly
      (``1 + e^-50`` rounds to 1.0 in float64) and g = tanh(50·x) ∈
      {0.0, 1.0} exactly — so the cell state c COUNTS the triggers seen
      so far and h = tanh(c) is 0.0 iff none;
    * backward direction all-zero → h_bwd ≡ 0 (only the LEFT-looking
      direction decides, matching the reference rule's scope="left"
      plus the entity tokens themselves);
    * head: logits = (30 − 100·h_fwd, 100·h_fwd − 30), so the logit gap
      is ≥ 60 either way and max softmax = 1/(1 + e^-gap) = 1.0 exactly.

    The center (entity) tokens sit after the left window, so with
    trigger-free center tokens this equals the MetaRule lexicon rule
    over the 15-token left window — same SQL oracle."""
    h = 1                                    # per-direction hidden units
    w: Dict[str, np.ndarray] = {
        "embeddings.weight": np.zeros((vocab_size, 1)),
        "fc1.weight": np.array([[-100.0, 0.0], [100.0, 0.0]]),
        "fc1.bias": np.array([30.0, -30.0]),
    }
    for t in trigger_ids:
        w["embeddings.weight"][int(t), 0] = 1.0
    w["embeddings.weight"][padding_idx, 0] = 0.0
    # gate order i, f, g, o
    w["rnn.weight_ih_l0"] = np.array([[0.0], [0.0], [50.0], [0.0]])
    w["rnn.weight_hh_l0"] = np.zeros((4 * h, h))
    w["rnn.bias_ih_l0"] = np.array([50.0, 50.0, 0.0, 50.0])
    w["rnn.bias_hh_l0"] = np.zeros(4 * h)
    for part, shape in (("weight_ih", (4 * h, 1)),
                        ("weight_hh", (4 * h, h)),
                        ("bias_ih", (4 * h,)), ("bias_hh", (4 * h,))):
        w[f"rnn.{part}_l0_reverse"] = np.zeros(shape)
    return w


class BiLSTMMetaScorer:
    """Adapts :class:`NumpyBiLSTM` to the MetaAnnotateStage scorer seam.

    Window construction per the reference ``prepare_document``
    (meta_cat.py:491-515): ``tkns = ids[ctoken[0]-cntx_left :
    ctoken[-1]+1+cntx_right]`` clipped to the document; center positions
    are the entity-token indices re-based to the window start.  Tokens
    are mapped through ``token2id`` (unknowns -> ``unk_id``), mirroring
    the reference tokenizer contract (lowercased upstream by the stage).
    """

    needs_center = True

    def __init__(self, category: str, model: NumpyBiLSTM,
                 token2id: Dict[str, int], id2value: Dict[int, str],
                 unk_id: int = 1, cntx_left: int = 15,
                 cntx_right: int = 10) -> None:
        self.category = category
        self.model = model
        self.token2id = dict(token2id)
        self.id2value = dict(id2value)
        self.unk_id = int(unk_id)
        self.cntx_left = int(cntx_left)
        self.cntx_right = int(cntx_right)

    def _ids(self, toks: Sequence[str]) -> List[int]:
        t2i = self.token2id
        return [t2i.get(t, self.unk_id) for t in toks]

    def _window(self, left: Sequence[str], right: Sequence[str],
                center: Optional[Sequence[str]]
                ) -> Tuple[List[int], List[int]]:
        ctr = list(center) if center else [""]
        lw = self._ids(list(left)[-self.cntx_left:])
        cw = self._ids(ctr)
        rw = self._ids(list(right)[:self.cntx_right])
        return lw + cw + rw, list(range(len(lw), len(lw) + len(cw)))

    def score(self, left: List[str], right: List[str],
              center: Optional[List[str]] = None) -> Tuple[str, float]:
        seq, cpos = self._window(left, right, center)
        preds, confs = self.model.predict([seq], [cpos])
        return self.id2value[int(preds[0])], float(confs[0])

    def score_many(self, windows: Sequence[Tuple[Sequence[str],
                                                 Sequence[str],
                                                 Sequence[str]]]
                   ) -> List[Tuple[str, float]]:
        """Batched scoring: ONE padded LSTM forward for all entity
        windows of an Arrow batch (the reference's create_batch_piped_data
        batching, ml_utils.py:104-110) — called by MetaAnnotateStage when
        present."""
        if not windows:
            return []
        seqs, cposs = zip(*[self._window(l, r, c) for l, r, c in windows])
        preds, confs = self.model.predict(list(seqs), list(cposs))
        return [(self.id2value[int(p)], float(c))
                for p, c in zip(preds, confs)]
