"""NumpyBiLSTM parity with the reference MetaCAT LSTM eval semantics.

The fixture oracle here is a deliberately naive per-sample per-timestep
transcription of the torch nn.LSTM update equations (docs-exact: gate
order i,f,g,o; c' = f*c + i*g; h' = o*tanh(c'); bidirectional concat;
packed sequences -> backward starts at len-1, padded rows zero), checked
against the vectorized implementation, a hand-computed single-step case,
and the ml_utils.predict argmax/softmax contract."""

import math

import numpy as np
import pytest

from medcat_ray.stages.bilstm import (BiLSTMMetaScorer, NumpyBiLSTM,
                                      lstm_layer, random_weights, softmax)


def naive_lstm_states(seq_X, w_ih, w_hh, b_ih, b_hh):
    """One direction, one sample: list of h_t (length == len(seq_X))."""
    H = w_hh.shape[1]
    h = np.zeros(H)
    c = np.zeros(H)
    out = []
    for x in seq_X:
        g = w_ih @ x + b_ih + w_hh @ h + b_hh
        i = 1 / (1 + np.exp(-g[:H]))
        f = 1 / (1 + np.exp(-g[H:2 * H]))
        gg = np.tanh(g[2 * H:3 * H])
        o = 1 / (1 + np.exp(-g[3 * H:]))
        c = f * c + i * gg
        h = o * np.tanh(c)
        out.append(h.copy())
    return out


def naive_forward(seqs, cpos, w, num_layers, bidirectional, padding_idx):
    """Per-sample transcription of models.py LSTM.forward (eval path)."""
    emb = w["embeddings.weight"]
    pooled = []
    for s, cp in zip(seqs, cpos):
        X = [emb[i] for i in s]
        for k in range(num_layers):
            fwd = naive_lstm_states(X, w[f"rnn.weight_ih_l{k}"],
                                    w[f"rnn.weight_hh_l{k}"],
                                    w[f"rnn.bias_ih_l{k}"],
                                    w[f"rnn.bias_hh_l{k}"])
            if bidirectional:
                bwd = naive_lstm_states(X[::-1],
                                        w[f"rnn.weight_ih_l{k}_reverse"],
                                        w[f"rnn.weight_hh_l{k}_reverse"],
                                        w[f"rnn.bias_ih_l{k}_reverse"],
                                        w[f"rnn.bias_hh_l{k}_reverse"])[::-1]
                X = [np.concatenate([a, b]) for a, b in zip(fwd, bwd)]
            else:
                X = fwd
        stacked = np.stack([X[i] for i in cp])
        pooled.append(stacked.max(axis=0))
    pooled = np.stack(pooled)
    return pooled @ w["fc1.weight"].T + w["fc1.bias"]


def test_vectorized_matches_naive_transcription():
    w = random_weights(vocab_size=23, embedding_size=5, hidden_size=8,
                       nclasses=3, num_layers=2, bidirectional=True,
                       seed=7)
    model = NumpyBiLSTM(w, padding_idx=0, num_layers=2, bidirectional=True)
    rng = np.random.default_rng(11)
    seqs = [list(rng.integers(1, 23, size=n)) for n in (9, 4, 1, 13, 6)]
    cpos = [[min(2, len(s) - 1), len(s) - 1] for s in seqs]
    got = model.logits(seqs, cpos)
    want = naive_forward(seqs, cpos, w, 2, True, 0)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_unidirectional_matches_naive():
    w = random_weights(vocab_size=11, embedding_size=4, hidden_size=6,
                       nclasses=2, num_layers=1, bidirectional=False,
                       seed=3)
    model = NumpyBiLSTM(w, padding_idx=0, num_layers=1,
                        bidirectional=False)
    seqs = [[1, 2, 3, 4], [5, 6]]
    cpos = [[1, 2], [0]]
    np.testing.assert_allclose(model.logits(seqs, cpos),
                               naive_forward(seqs, cpos, w, 1, False, 0),
                               atol=1e-10)


def test_packed_semantics_padding_invariance():
    """A short sequence's states are identical alone vs padded in a batch
    (pack_padded_sequence contract), and padded rows are exactly zero."""
    w = random_weights(vocab_size=17, embedding_size=4, hidden_size=8,
                       nclasses=2, num_layers=2, bidirectional=True,
                       seed=5)
    model = NumpyBiLSTM(w, padding_idx=0)
    short = [3, 9, 2]
    long = [5, 8, 1, 14, 7, 6, 11, 2]
    H_batch, _ = model.hidden_states([short, long])
    H_alone, _ = model.hidden_states([short])
    np.testing.assert_allclose(H_batch[0, :3], H_alone[0], atol=1e-12)
    assert np.all(H_batch[0, 3:] == 0.0)  # pad_packed zero-fill


def test_single_step_hand_computed():
    """One token, one unit, zero hh/biases: h = sigm(wi·x)*tanh(sigm(wg·x))
    ... with the i,f,g,o layout written out by hand."""
    E = 1
    w = {
        "embeddings.weight": np.array([[0.0], [2.0]]),
        # gates: i=0.5x, f=0, g=1.0x, o=0.25x (w_hh = 0, biases = 0)
        "rnn.weight_ih_l0": np.array([[0.5], [0.0], [1.0], [0.25]]),
        "rnn.weight_hh_l0": np.zeros((4, 1)),
        "rnn.bias_ih_l0": np.zeros(4),
        "rnn.bias_hh_l0": np.zeros(4),
        "fc1.weight": np.array([[1.0], [-1.0]]),
        "fc1.bias": np.array([0.0, 0.0]),
    }
    model = NumpyBiLSTM(w, padding_idx=0, num_layers=1,
                        bidirectional=False)
    x = 2.0
    i = 1 / (1 + math.exp(-0.5 * x))
    g = math.tanh(1.0 * x)
    o = 1 / (1 + math.exp(-0.25 * x))
    h = o * math.tanh(i * g)   # c0 = 0 -> c1 = i*g
    lg = model.logits([[1]], [[0]])
    np.testing.assert_allclose(lg, [[h, -h]], atol=1e-12)


def test_predict_contract_argmax_softmax():
    w = random_weights(vocab_size=9, embedding_size=3, hidden_size=4,
                       nclasses=3, num_layers=1, bidirectional=True,
                       seed=2)
    model = NumpyBiLSTM(w, padding_idx=0, num_layers=1)
    seqs = [[1, 2, 3], [4, 5, 6, 7]]
    cpos = [[1], [0, 3]]
    lg = model.logits(seqs, cpos)
    preds, confs = model.predict(seqs, cpos)
    np.testing.assert_array_equal(preds, np.argmax(lg, axis=1))
    np.testing.assert_allclose(confs, np.max(softmax(lg, axis=1), axis=1))
    # empty batch
    p, c = model.predict([], [])
    assert len(p) == 0 and len(c) == 0


def test_center_position_max_pool_is_elementwise_max():
    w = random_weights(vocab_size=9, embedding_size=3, hidden_size=4,
                       nclasses=2, num_layers=1, bidirectional=True,
                       seed=9)
    model = NumpyBiLSTM(w, padding_idx=0, num_layers=1)
    seq = [1, 2, 3, 4, 5]
    H, _ = model.hidden_states([seq])
    pooled = np.maximum(H[0, 1], H[0, 3])
    want = pooled @ model.fc_w.T + model.fc_b
    np.testing.assert_allclose(model.logits([seq], [[1, 3]])[0], want,
                               atol=1e-12)


def test_save_load_roundtrip(tmp_path):
    w = random_weights(vocab_size=9, embedding_size=3, hidden_size=4,
                       nclasses=2, num_layers=2, bidirectional=True,
                       seed=4)
    model = NumpyBiLSTM(w, padding_idx=0)
    p = str(tmp_path / "bilstm.npz")
    model.save(p)
    back = NumpyBiLSTM.load(p)
    seqs, cpos = [[1, 2, 3]], [[1]]
    np.testing.assert_array_equal(model.logits(seqs, cpos),
                                  back.logits(seqs, cpos))


def test_scorer_window_and_seam():
    """Scorer builds the prepare_document window (cntx_left/right clip,
    center re-based) and returns (value, confidence)."""
    vocab = {w: i + 2 for i, w in enumerate(
        ["no", "sign", "of", "fracture", "seen", "today"])}
    w = random_weights(vocab_size=10, embedding_size=3, hidden_size=4,
                       nclasses=2, num_layers=1, bidirectional=True,
                       seed=6)
    model = NumpyBiLSTM(w, padding_idx=0, num_layers=1)
    sc = BiLSTMMetaScorer("Negation", model, vocab,
                          {0: "Affirmed", 1: "Negated"},
                          cntx_left=2, cntx_right=1)
    left = ["no", "sign", "of"]          # clipped to last 2
    right = ["seen", "today"]            # clipped to first 1
    value, conf = sc.score(left, right, ["fracture"])
    assert value in ("Affirmed", "Negated") and 0.0 < conf <= 1.0
    # window = sign,of | fracture | seen  -> center index 2
    seq = [vocab["sign"], vocab["of"], vocab["fracture"], vocab["seen"]]
    preds, confs = model.predict([seq], [[2]])
    assert value == {0: "Affirmed", 1: "Negated"}[int(preds[0])]
    assert conf == pytest.approx(float(confs[0]))
    # unknown tokens map to unk_id, not a crash
    v2, _ = sc.score(["zzz"], ["qqq"], ["unseenword"])
    assert v2 in ("Affirmed", "Negated")


def test_scorer_in_meta_stage(ray_session):
    """End-to-end: MetaAnnotateStage passes center tokens to a
    needs_center scorer and emits the meta_anns struct column."""
    import pyarrow as pa
    from medcat_ray.stages.meta import MetaAnnotateStage

    vocab = {w: i + 2 for i, w in enumerate(
        ["no", "fracture", "pain", "history", "of"])}
    w = random_weights(vocab_size=10, embedding_size=3, hidden_size=4,
                       nclasses=2, num_layers=1, bidirectional=True,
                       seed=8)
    sc = BiLSTMMetaScorer("Negation", NumpyBiLSTM(w, padding_idx=0,
                                                  num_layers=1),
                          vocab, {0: "Affirmed", 1: "Negated"})
    stage = MetaAnnotateStage(rules=[sc])
    batch = pa.table({
        "text": ["no fracture", "history of pain"],
        "ents": [[{"start": 3, "end": 11}], [{"start": 11, "end": 15}]],
    })
    out = stage(batch)
    meta = out["meta_anns"].to_pylist()
    assert len(meta) == 2 and len(meta[0][0]) == 1
    ann = meta[0][0][0]
    assert ann["name"] == "Negation"
    assert ann["value"] in ("Affirmed", "Negated")
    # deterministic: same input -> same value
    assert stage(batch)["meta_anns"].to_pylist() == meta


def test_score_many_equals_sequential():
    """Batched window scoring (one padded forward) == per-window score."""
    vocab = {w: i + 2 for i, w in enumerate(
        ["no", "sign", "of", "fracture", "seen", "today", "pain"])}
    w = random_weights(vocab_size=12, embedding_size=3, hidden_size=8,
                       nclasses=2, num_layers=2, bidirectional=True,
                       seed=14)
    sc = BiLSTMMetaScorer("Negation", NumpyBiLSTM(w, padding_idx=0),
                          vocab, {0: "Affirmed", 1: "Negated"})
    windows = [
        (["no", "sign", "of"], ["seen"], ["fracture"]),
        ([], ["today"], ["pain"]),
        (["seen", "today"], [], ["fracture", "pain"]),
        ([], [], [""]),
    ]
    many = sc.score_many(windows)
    one = [sc.score(list(l), list(r), list(c)) for l, r, c in windows]
    assert [m[0] for m in many] == [o[0] for o in one]
    np.testing.assert_allclose([m[1] for m in many],
                               [o[1] for o in one], atol=1e-12)
    assert sc.score_many([]) == []


def test_rule_negation_weights_exact_rule():
    """Planted saturated weights (the kg_meta_bilstm oracle trick):
    prediction == 'trigger at/before the center within the window',
    confidence EXACTLY 1.0 (not approximately) for every case."""
    from medcat_ray.stages.bilstm import (BiLSTMMetaScorer, NumpyBiLSTM,
                                          rule_negation_weights)
    t2i = {"slow": 2, "dup": 3, "fast": 4, "join": 5}
    m = NumpyBiLSTM(rule_negation_weights(8, [2, 3]), padding_idx=0,
                    num_layers=1)
    sc = BiLSTMMetaScorer("Negation", m, t2i,
                          {0: "Affirmed", 1: "Negated"})
    cases = [
        ((["fast", "slow"], ["fast"], ["join"]), "Negated"),
        ((["fast"], ["slow"], ["join"]), "Affirmed"),   # right ignored
        (([], [], ["join"]), "Affirmed"),
        ((["dup"] + ["x"] * 14, [], ["join"]), "Negated"),  # window edge
        ((["dup"] + ["x"] * 15, [], ["join"]), "Affirmed"),  # clipped out
        ((["unknownword"], [], ["join"]), "Affirmed"),  # unk != trigger
    ]
    for (left, right, center), want in cases:
        val, conf = sc.score(left, right, center)
        assert val == want, (left, right, center)
        assert conf == 1.0  # exact float64 saturation, not approx
