"""Reproduction of the reference NER/linking golden scenario.

Mirrors /root/reference/tests/test_ner.py:17-99 (class A_NERTests) exactly:
same CDB construction (add_names with prepare_name), same text, same config
mutations, same expected entity counts and ordering.  This is the per-document
``CAT.get_entities`` parity anchor required by BASELINE.json.
"""

import numpy as np
import pytest

from medcat_ray.config import EngineConfig
from medcat_ray.core.annotator import DocAnnotator
from medcat_ray.state.cdb import CDB, prepare_name
from medcat_ray.state.vocab import Vocab

TEXT = "CDB - I was running and then Movar    Viruses attacked and CDb"


def make_cdb_and_vocab(config):
    cdb = CDB(config)
    # reference setUpClass: cdb.add_names(cui=..., names=prepare_name(...))
    cdb.add_concept("S-229004", prepare_name("Movar", config), name_status="A")
    cdb.add_concept("S-229004", prepare_name("Movar viruses", config),
                    name_status="A")
    cdb.add_concept("S-229005", prepare_name("CDB", config), name_status="A")
    vocab = Vocab()
    rng = np.random.default_rng(3)
    for word in ["movar", "viruses", "attacked", "running", "was", "then"]:
        vocab.add_word(word, cnt=100, vec=rng.normal(size=8))
    return cdb, vocab


BASE = EngineConfig(spell_check=True, max_skip_tokens=1,
                    upper_case_limit_len=4, disamb_length_limit=2)


def linked(config):
    cdb, vocab = make_cdb_and_vocab(config)
    ann = DocAnnotator(cdb, vocab, config)
    return ann.annotate_full(TEXT)["linked"]


def test_cdb_names_golden():
    # /root/reference/tests/test_ner.py:69-71
    cdb, _ = make_cdb_and_vocab(BASE)
    assert cdb.cui2names == {
        "S-229004": {"movar~viruse", "movar", "movar~viruses"},
        "S-229005": {"cdb"},
    }


def test_entities_length():
    # test_ab: 2 entities with max_skip_tokens=1 (the 4-space gap blocks the
    # multi-token match)
    assert len(linked(BASE)) == 2


def test_entities_link_candidates():
    # test_ac: first entity (longest span) links to S-229004
    ents = linked(BASE)
    assert ents[0].link_candidates[0] == "S-229004"


def test_max_skip_entities_length():
    # test_ad: max_skip_tokens=3 admits movar~viruses → 3 entities
    assert len(linked(BASE.with_overrides(max_skip_tokens=3))) == 3


def test_upper_case_entities_length():
    # test_ae: upper_case_limit_len=3 additionally admits 'CDb' → 4
    assert len(linked(BASE.with_overrides(max_skip_tokens=3,
                                          upper_case_limit_len=3))) == 4


def test_min_name_entities_length():
    # test_af: min_name_len=4 drops both 'cdb' annotations → 2
    assert len(linked(BASE.with_overrides(max_skip_tokens=3,
                                          upper_case_limit_len=3,
                                          min_name_len=4))) == 2


def test_direct_link_similarity_is_one():
    # unambiguous A-status name → direct link, context_similarity == 1
    # (context_based_linker.py:111-115)
    ents = linked(BASE)
    assert all(e.context_similarity == 1.0 for e in ents)
    assert {e.cui for e in ents} == {"S-229004", "S-229005"}


def test_overlap_resolution_prefers_longest():
    cfg = BASE.with_overrides(max_skip_tokens=3)
    cdb, vocab = make_cdb_and_vocab(cfg)
    ann = DocAnnotator(cdb, vocab, cfg)
    out = ann.annotate(TEXT)
    # main annotations: 'movar' single is swallowed by 'Movar    Viruses'
    names = [e["detected_name"] for e in out]
    assert "movar~viruse" in names or "movar~viruses" in names
    assert "movar" not in names
    # and offsets point at the raw text
    for e in out:
        assert TEXT[e["start"]:e["end"]] == e["source_value"]
