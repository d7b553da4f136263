"""Tokenizer-wrapper API (medcat_ray/tokenizers.py) — the reference
meta_cat_tokenizers contract: __call__ str/list → offset_mapping +
input_ids + tokens, save/load round-trip, get_size / token_to_id /
get_pad_id."""

import ray.data as rd

from medcat_ray.tokenizers import (PAD_TOKEN, TokenizerWrapperBPE,
                                   TokenizerWrapperVocab)


def test_bpe_wrapper_trained_contract(ray_session, tmp_path):
    ds = rd.from_items([{"text": "low lower lowest new newer news"}] * 8)
    tok = TokenizerWrapperBPE.train(ds, n_merges=6)
    out = tok("lower new")
    assert set(out) == {"offset_mapping", "input_ids", "tokens"}
    assert len(out["tokens"]) == len(out["input_ids"]) \
        == len(out["offset_mapping"])
    # offsets reconstruct the source words exactly
    text = "lower new"
    assert "".join(text[s:e] for s, e in out["offset_mapping"]) \
        == "lowernew"
    # list input → list of dicts (reference overload)
    batch = tok(["low", "news"])
    assert isinstance(batch, list) and len(batch) == 2
    # save/load round-trips encoding + ids
    tok.save(str(tmp_path))
    tok2 = TokenizerWrapperBPE.load(str(tmp_path))
    assert tok2("lower new") == out
    assert tok2.get_size() == tok.get_size()
    assert tok2.get_pad_id() == tok2.token2id[PAD_TOKEN]
    assert tok2.token_to_id("missing-token") is None


def test_bpe_wrapper_merge_application():
    # hand rules: e+s -> es, es+t -> est
    tok = TokenizerWrapperBPE([("e", "s"), ("es", "t")],
                              {"t": 0, "es": 1, "est": 2, "l": 3, "a": 4})
    out = tok("latest")
    assert out["tokens"] == ["l", "a", "t", "est"]
    assert out["offset_mapping"] == [(0, 1), (1, 2), (2, 3), (3, 6)]
    assert out["input_ids"] == [3, 4, 0, 2]


def test_vocab_wrapper_contract(tmp_path):
    tok = TokenizerWrapperVocab({"fever": 0, "high": 1})
    out = tok("High fever spikes")
    assert out["tokens"] == ["high", "fever", "spikes"]
    assert out["input_ids"][:2] == [1, 0]
    assert out["input_ids"][2] == tok.token2id["<UNK>"]
    assert out["offset_mapping"] == [(0, 4), (5, 10), (11, 17)]
    tok.save(str(tmp_path))
    tok2 = TokenizerWrapperVocab.load(str(tmp_path))
    assert tok2("High fever spikes") == out
    # feeds the MetaCAT scorer seam directly
    from medcat_ray.stages.bilstm import (BiLSTMMetaScorer, NumpyBiLSTM,
                                          rule_negation_weights)
    t2i = {"slow": 2, "fast": 3}
    wtok = TokenizerWrapperVocab(t2i)
    m = NumpyBiLSTM(rule_negation_weights(wtok.get_size() + 2, [2]),
                    padding_idx=0, num_layers=1)
    sc = BiLSTMMetaScorer("Negation", m, wtok.token2id,
                          {0: "Affirmed", 1: "Negated"})
    assert sc.score(["slow"], [], ["fast"]) == ("Negated", 1.0)


def test_bpe_unknown_symbol_is_unk_not_pad():
    # the learned vocab has no byte coverage: an unseen character must
    # map to <UNK>'s own id, never collide with <PAD>
    from medcat_ray.tokenizers import TokenizerWrapperBPE
    tok = TokenizerWrapperBPE(merges=[("a", "b")],
                              token2id={"ab": 0, "x": 1, "y": 2})
    out = tok("x7y")
    unk = tok.token2id["<UNK>"]
    assert out["input_ids"][1] == unk
    assert unk != tok.get_pad_id()
    assert out["input_ids"][0] == 1 and out["input_ids"][2] == 2
