"""NumpyBertEncoder / token + pair heads vs a naive per-sample
transcription of the BERT eval equations (HF Bert layout: QKV multi-head
attention, post-LN residual blocks, erf-GELU, eps 1e-12), a hand-computed
single-head attention case, padding invariance, and the RelCAT
pair-pooling contract (models.py:170-222)."""

import math

import numpy as np
import pytest

from medcat_ray.stages.bert import (BertNERScorer, NumpyBertEncoder,
                                    NumpyBertRelClassifier,
                                    NumpyBertTokenClassifier, gelu_exact,
                                    layer_norm, load_weights,
                                    random_bert_weights, save_weights,
                                    softmax)


def naive_encoder(seq, w, num_layers, num_heads, prefix="bert."):
    """One sample, no padding: straight transcription of BertModel eval."""
    p = prefix
    T = len(seq)
    H = w[f"{p}embeddings.word_embeddings.weight"].shape[1]
    dh = H // num_heads
    X = (w[f"{p}embeddings.word_embeddings.weight"][list(seq)]
         + w[f"{p}embeddings.position_embeddings.weight"][:T]
         + w[f"{p}embeddings.token_type_embeddings.weight"][[0] * T])
    X = layer_norm(X, w[f"{p}embeddings.LayerNorm.weight"],
                   w[f"{p}embeddings.LayerNorm.bias"])
    for k in range(num_layers):
        L = f"{p}encoder.layer.{k}"
        q = X @ w[f"{L}.attention.self.query.weight"].T + \
            w[f"{L}.attention.self.query.bias"]
        kk = X @ w[f"{L}.attention.self.key.weight"].T + \
            w[f"{L}.attention.self.key.bias"]
        v = X @ w[f"{L}.attention.self.value.weight"].T + \
            w[f"{L}.attention.self.value.bias"]
        heads = []
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            scores = q[:, sl] @ kk[:, sl].T / math.sqrt(dh)
            probs = softmax(scores, axis=-1)
            heads.append(probs @ v[:, sl])
        ctx = np.concatenate(heads, axis=1)
        a = ctx @ w[f"{L}.attention.output.dense.weight"].T + \
            w[f"{L}.attention.output.dense.bias"]
        X = layer_norm(X + a, w[f"{L}.attention.output.LayerNorm.weight"],
                       w[f"{L}.attention.output.LayerNorm.bias"])
        hmid = gelu_exact(X @ w[f"{L}.intermediate.dense.weight"].T +
                          w[f"{L}.intermediate.dense.bias"])
        out = hmid @ w[f"{L}.output.dense.weight"].T + \
            w[f"{L}.output.dense.bias"]
        X = layer_norm(X + out, w[f"{L}.output.LayerNorm.weight"],
                       w[f"{L}.output.LayerNorm.bias"])
    return X


W = random_bert_weights(vocab_size=19, hidden=8, num_layers=2,
                        num_heads=2, nclasses=4, rel_classes=3, seed=13)


def test_vectorized_matches_naive_transcription():
    enc = NumpyBertEncoder(W, num_layers=2, num_heads=2)
    rng = np.random.default_rng(5)
    seqs = [list(rng.integers(1, 19, size=n)) for n in (7, 3, 11, 1)]
    H, lengths = enc.hidden_states(seqs)
    for i, s in enumerate(seqs):
        want = naive_encoder(s, enc.w, 2, 2)
        np.testing.assert_allclose(H[i, :len(s)], want, atol=1e-10)


def test_padding_invariance_and_zero_fill():
    enc = NumpyBertEncoder(W, num_layers=2, num_heads=2)
    short = [4, 9]
    long = [3, 8, 1, 14, 7, 6, 11, 2, 5]
    H_batch, _ = enc.hidden_states([short, long])
    H_alone, _ = enc.hidden_states([short])
    np.testing.assert_allclose(H_batch[0, :2], H_alone[0, :2], atol=1e-12)
    assert np.all(H_batch[0, 2:] == 0.0)


def test_single_head_attention_hand_computed():
    """T=2, one head, identity-ish weights: attention probabilities and
    context written out by hand."""
    H = 2
    p = "bert."
    w = {
        f"{p}embeddings.word_embeddings.weight": np.array(
            [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
        f"{p}embeddings.position_embeddings.weight": np.zeros((4, H)),
        f"{p}embeddings.token_type_embeddings.weight": np.zeros((2, H)),
        # LayerNorm disabled: weight 1 bias 0 still normalizes, so make
        # the embedding LN a pass-through by checking the attention
        # sub-computation directly instead.
        f"{p}embeddings.LayerNorm.weight": np.ones(H),
        f"{p}embeddings.LayerNorm.bias": np.zeros(H),
    }
    enc_w = dict(W)
    enc = NumpyBertEncoder(enc_w, num_layers=2, num_heads=2)
    # hand-check the attention kernel itself on a tiny crafted input
    X = np.array([[[1.0, 0.0], [0.0, 1.0]]])   # (1, 2, 2)
    wq = np.eye(2)
    lay = {
        "L.attention.self.query.weight": wq, "L.attention.self.query.bias":
            np.zeros(2),
        "L.attention.self.key.weight": wq, "L.attention.self.key.bias":
            np.zeros(2),
        "L.attention.self.value.weight": wq, "L.attention.self.value.bias":
            np.zeros(2),
        "L.attention.output.dense.weight": np.eye(2),
        "L.attention.output.dense.bias": np.zeros(2),
        f"{p}embeddings.word_embeddings.weight": np.zeros((3, 2)),
    }
    enc2 = NumpyBertEncoder.__new__(NumpyBertEncoder)
    enc2.w = {k: np.asarray(v, np.float64) for k, v in lay.items()}
    enc2.num_heads = 1
    enc2.hidden = 2
    got = enc2._attention(X, np.array([[True, True]]), "L")
    # scores = X X^T / sqrt(2): diag 1/sqrt2, off-diag 0
    a = math.exp(1 / math.sqrt(2))
    p00 = a / (a + 1)          # token0 attends to itself
    want0 = p00 * X[0, 0] + (1 - p00) * X[0, 1]
    want1 = (1 - p00) * X[0, 0] + p00 * X[0, 1]
    np.testing.assert_allclose(got[0, 0], want0, atol=1e-12)
    np.testing.assert_allclose(got[0, 1], want1, atol=1e-12)


def test_token_classifier_contract():
    m = NumpyBertTokenClassifier(W, num_layers=2, num_heads=2)
    seqs = [[1, 2, 3], [4, 5, 6, 7, 8]]
    lg = m.logits(seqs)
    labels, confs = m.predict(seqs)
    assert len(labels) == 2 and len(labels[0]) == 3 and len(labels[1]) == 5
    np.testing.assert_array_equal(labels[0],
                                  np.argmax(lg[0, :3], axis=1))
    np.testing.assert_allclose(
        confs[0], np.max(softmax(lg[0, :3], axis=1), axis=1))
    assert m.predict([]) == ([], [])


def test_rel_classifier_pair_pooling():
    """logits == fc3(fc2(fc1(concat(pooled, h[e1], h[e2])))) — the
    reference three-dense stack with no inter-layer activations."""
    m = NumpyBertRelClassifier(W, num_layers=2, num_heads=2)
    seqs = [[1, 2, 3, 4], [5, 6, 7]]
    starts = [(1, 3), (0, 2)]
    H, _ = m.encoder.hidden_states(seqs)
    pooled = m.encoder.pooled(H)
    for i, (s, (a, b)) in enumerate(zip(seqs, starts)):
        x = np.concatenate([pooled[i], H[i, a], H[i, b]])
        x = x @ m.w["fc1.weight"].T + m.w["fc1.bias"]
        x = x @ m.w["fc2.weight"].T + m.w["fc2.bias"]
        want = x @ m.w["fc3.weight"].T + m.w["fc3.bias"]
        np.testing.assert_allclose(m.logits(seqs, starts)[i], want,
                                   atol=1e-10)
    preds, confs = m.predict(seqs, starts)
    lg = m.logits(seqs, starts)
    np.testing.assert_array_equal(preds, np.argmax(lg, axis=1))
    np.testing.assert_allclose(confs, np.max(softmax(lg, axis=1), axis=1))


def test_pooler_is_tanh_of_cls():
    enc = NumpyBertEncoder(W, num_layers=2, num_heads=2)
    H, _ = enc.hidden_states([[1, 2, 3]])
    want = np.tanh(H[:, 0, :] @ enc.w["bert.pooler.dense.weight"].T
                   + enc.w["bert.pooler.dense.bias"])
    np.testing.assert_allclose(enc.pooled(H), want, atol=1e-12)


def test_weights_roundtrip(tmp_path):
    p = str(tmp_path / "bert.npz")
    save_weights(W, p, num_layers=2, num_heads=2)
    back, meta = load_weights(p)
    assert meta == {"num_layers": 2, "num_heads": 2}
    m1 = NumpyBertTokenClassifier(W, 2, 2)
    m2 = NumpyBertTokenClassifier(back, meta["num_layers"],
                                  meta["num_heads"])
    np.testing.assert_array_equal(m1.logits([[1, 2]]), m2.logits([[1, 2]]))


def test_ner_scorer_bio_decode():
    """BIO decode: B- opens, same-cui I- extends, O / mismatched I-
    closes; char offsets from the original text."""

    class FakeModel:
        def predict(self, seqs):
            # label ids per token: text "aa bb cc dd" -> B-C1 I-C1 O B-C2
            lab = {4: [np.array([1, 2, 0, 3])]}
            cf = {4: [np.array([0.9, 0.7, 0.5, 0.8])]}
            return lab[len(seqs[0])], cf[len(seqs[0])]

    sc = BertNERScorer(FakeModel(), {"aa": 2, "bb": 3, "cc": 4, "dd": 5},
                       {0: "O", 1: "B-C1", 2: "I-C1", 3: "B-C2"})
    [ents] = sc(["aa bb cc dd"])
    assert len(ents) == 2
    assert ents[0]["cui"] == "C1" and ents[0]["start"] == 0 \
        and ents[0]["end"] == 5 and ents[0]["source_value"] == "aa bb"
    assert ents[0]["context_similarity"] == pytest.approx(0.7)  # min span
    assert ents[1]["cui"] == "C2" and ents[1]["source_value"] == "dd"


def test_ner_scorer_in_transformers_stage(ray_session):
    """End-to-end: the numpy BERT token head drives the real
    TransformersNERStage actor and emits the dictionary-stage ents
    schema."""
    import ray.data as rd
    from medcat_ray.stages.transformers_ner import addl_ner

    vocab = {w: i + 2 for i, w in enumerate(
        ["patient", "has", "renal", "failure", "today"])}
    w = random_bert_weights(vocab_size=10, hidden=8, num_layers=1,
                            num_heads=2, nclasses=3, seed=21)
    model = NumpyBertTokenClassifier(w, num_layers=1, num_heads=2)
    sc = BertNERScorer(model, vocab, {0: "O", 1: "B-C77", 2: "I-C77"})
    docs = rd.from_items([
        {"url": "u1", "text": "patient has renal failure today"},
        {"url": "u2", "text": "renal failure"},
    ])
    out = addl_ner(docs, scorer=sc, concurrency=1).to_pandas()
    assert set(out.columns) >= {"url", "n_ents", "ents"}
    assert len(out) == 2
    for ents in out["ents"]:
        for e in ents:
            assert e["cui"] == "C77"
            assert e["end"] > e["start"]
    # deterministic across calls
    out2 = addl_ner(rd.from_items([
        {"url": "u1", "text": "patient has renal failure today"},
        {"url": "u2", "text": "renal failure"},
    ]), scorer=sc, concurrency=1).to_pandas()
    assert out["n_ents"].tolist() == out2["n_ents"].tolist()


def test_rel_scorer_in_rel_score_stage(ray_session):
    """The numpy BERT pair classifier rides RelScoreStage via
    BertRelScorer: relation rows with labels from id2label."""
    import ray
    import pyarrow as pa
    from medcat_ray.stages.bert import BertRelScorer
    from medcat_ray.stages.rel_model import RelScoreStage

    vocab = {w: i + 2 for i, w in enumerate(
        ["spark", "reads", "the", "table", "fast"])}
    w = random_bert_weights(vocab_size=10, hidden=8, num_layers=1,
                            num_heads=2, rel_classes=2, seed=31)
    sc = BertRelScorer(NumpyBertRelClassifier(w, num_layers=1,
                                              num_heads=2),
                       vocab, {0: "operates_on", 1: "none"})
    label, conf = sc.predict("spark reads the table", (0, 5), (16, 21))
    assert label in ("operates_on", "none") and 0.0 < conf <= 1.0
    stage = RelScoreStage(ray.put(sc))
    batch = pa.table({
        "url": ["u1"],
        "text": ["spark reads the table"],
        "ents": [[{"start": 0, "end": 5, "source_value": "spark",
                   "cui": "C1"},
                  {"start": 16, "end": 21, "source_value": "table",
                   "cui": "C9"}]],
    })
    out = stage(batch)
    assert out.num_rows == 1
    assert out["pred"].to_pylist()[0] in ("operates_on", "none")
    # determinism
    assert stage(batch).to_pylist() == out.to_pylist()


def test_predict_many_equals_sequential():
    """Factorized batched pair scoring (encode distinct texts once, pair
    head gathered) == per-pair predict."""
    from medcat_ray.stages.bert import BertRelScorer
    vocab = {w: i + 2 for i, w in enumerate(
        ["spark", "reads", "the", "table", "join", "runs"])}
    w = random_bert_weights(vocab_size=10, hidden=8, num_layers=1,
                            num_heads=2, rel_classes=3, seed=17)
    sc = BertRelScorer(NumpyBertRelClassifier(w, 1, 2), vocab,
                       {0: "a", 1: "b", 2: "c"})
    items = [
        ("spark reads the table", (0, 5), (16, 21)),
        ("spark reads the table", (6, 11), (16, 21)),   # same text
        ("join runs the table", (0, 4), (14, 19)),
        ("spark reads the table", (0, 5), (6, 11)),     # same text again
    ]
    many = sc.predict_many(items)
    one = [sc.predict(t, s, o) for t, s, o in items]
    assert [m[0] for m in many] == [o[0] for o in one]
    np.testing.assert_allclose([m[1] for m in many],
                               [o[1] for o in one], atol=1e-12)
    assert sc.predict_many([]) == []


def test_rule_rel_weights_exact_rule():
    """Planted saturated BERT weights (the kg_rel_bert oracle trick):
    the full encoder + pair head computes 'class 0 iff the e1 token is
    a trigger' with confidence EXACTLY 1.0 — sign-coded embeddings must
    survive the embedding LN and both residual LNs."""
    from medcat_ray.stages.bert import (BertRelScorer,
                                        NumpyBertRelClassifier,
                                        rule_rel_weights)
    t2i = {"spark": 2, "join": 3, "table": 4, "vector": 5}
    m = NumpyBertRelClassifier(rule_rel_weights(8, [2, 3]),
                               num_layers=1, num_heads=2)
    sc = BertRelScorer(m, t2i, {0: "operates_on", 1: "none"},
                       max_len=120)
    text = "spark join table vector"
    cases = [((0, 5), (11, 16), "operates_on"),   # spark -> table
             ((11, 16), (17, 23), "none"),        # table -> vector
             ((6, 10), (17, 23), "operates_on")]  # join -> vector
    for subj, obj, want in cases:
        label, conf = sc.predict(text, subj, obj)
        assert label == want
        assert conf == 1.0
    # batched path identical
    batched = sc.predict_many([(text, s, o) for s, o, _ in cases])
    assert [b[0] for b in batched] == [w for _, _, w in cases]
