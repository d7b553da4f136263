"""Context-vector disambiguation parity tests
(reference: medcat/linking/vector_context_model.py:95-185,
medcat/linking/context_based_linker.py:89-129)."""

import numpy as np

from medcat_ray.config import EngineConfig, weighted_average
from medcat_ray.core.annotator import DocAnnotator, _DocContext, _unitvec
from medcat_ray.functions.text import process_text
from medcat_ray.state.cdb import CDB, prepare_name
from medcat_ray.state.vocab import Vocab

DIM = 8
CFG = EngineConfig(spell_check=False,
                   prefer_primary_name=0.0, prefer_frequent_concepts=0.0)


def build_ambiguous_world():
    """One name 'probe' shared by two CUIs whose context vectors point at
    disjoint word clusters."""
    rng = np.random.default_rng(5)
    cdb = CDB(CFG)
    names = prepare_name("probe", CFG)
    cdb.add_concept("CUI-A", names, name_status="A")
    cdb.add_concept("CUI-B", prepare_name("probe", CFG), name_status="A")

    vocab = Vocab()
    vec_a = np.zeros(DIM); vec_a[0] = 1.0
    vec_b = np.zeros(DIM); vec_b[1] = 1.0
    for w in ["alpha", "amber", "apple"]:
        vocab.add_word(w, cnt=100, vec=vec_a + 0.01 * rng.normal(size=DIM))
    for w in ["bravo", "berry", "basil"]:
        vocab.add_word(w, cnt=100, vec=vec_b + 0.01 * rng.normal(size=DIM))
    vocab.add_word("probe", cnt=100, vec=0.5 * (vec_a + vec_b))

    ctxs = dict.fromkeys(CFG.context_vector_sizes, vec_a)
    cdb.set_context_vectors("CUI-A", ctxs, count_train=10)
    ctxs_b = dict.fromkeys(CFG.context_vector_sizes, vec_b)
    cdb.set_context_vectors("CUI-B", ctxs_b, count_train=10)
    return cdb, vocab


def test_disambiguation_picks_context_matching_cui():
    cdb, vocab = build_ambiguous_world()
    ann = DocAnnotator(cdb, vocab, CFG)
    ents_a = ann.annotate("alpha amber probe apple alpha")
    assert len(ents_a) == 1 and ents_a[0]["cui"] == "CUI-A"
    assert ents_a[0]["context_similarity"] > 0.25
    ents_b = ann.annotate("bravo berry probe basil bravo")
    assert len(ents_b) == 1 and ents_b[0]["cui"] == "CUI-B"


def test_below_threshold_entity_dropped():
    cdb, vocab = build_ambiguous_world()
    # orthogonal context → cosine ~0 < 0.25 static threshold
    vec_c = np.zeros(DIM); vec_c[2] = 1.0
    vocab.add_word("zeta", cnt=10, vec=vec_c)
    ann = DocAnnotator(cdb, vocab, CFG)
    assert ann.annotate("zeta zeta probe zeta zeta") == []


def test_untrained_cui_similarity_is_minus_one():
    cdb, vocab = build_ambiguous_world()
    cdb.cui2count_train["CUI-A"] = 0
    cdb.cui2count_train["CUI-B"] = 0
    ann = DocAnnotator(cdb, vocab, CFG)
    # both candidates have sim -1 → below threshold → dropped
    assert ann.annotate("alpha amber probe apple") == []


def test_prefer_primary_name_boost():
    cdb, vocab = build_ambiguous_world()
    cfg = CFG.with_overrides(prefer_primary_name=0.35)
    # make B the primary for 'probe'; give both IDENTICAL context vectors at
    # ~45° to the context (sim ≈ 0.7, below the reference's 0.99 boost cap)
    # so only the boost differentiates (vector_context_model.py:163-171)
    vec = np.zeros(DIM); vec[0] = 1.0; vec[2] = 1.0
    cdb.set_context_vectors("CUI-A", dict.fromkeys(CFG.context_vector_sizes, vec),
                            count_train=10)
    cdb.set_context_vectors("CUI-B", dict.fromkeys(CFG.context_vector_sizes, vec),
                            count_train=10)
    cdb.name2cuis2status["probe"]["CUI-B"] = "P"
    ann = DocAnnotator(cdb, vocab, cfg)
    ents = ann.annotate("alpha amber probe apple alpha")
    assert ents[0]["cui"] == "CUI-B"


def test_context_vector_window_weights():
    """The computed context vector equals the reference formula: mean of
    [decay-weighted left] + [center] + [decay-weighted right] vectors."""
    cdb, vocab = build_ambiguous_world()
    cfg = CFG
    text = "alpha amber probe apple basil"
    tokens = process_text(text, cfg)
    ctx = _DocContext(tokens, vocab, cfg)

    class FakeEnt:
        pass
    ent = FakeEnt()
    probe_tok = next(t for t in tokens if t.text == "probe")
    ent.tokens = [probe_tok]
    vectors = ctx.vectors_for(ent)

    v = {w: vocab.vec(w) for w in ["alpha", "amber", "probe", "apple", "basil"]}
    # short window (size 3): left = [amber(step0), alpha(step1)] reversed
    expected = np.mean([
        weighted_average(0) * v["amber"], weighted_average(1) * v["alpha"],
        v["probe"],
        weighted_average(0) * v["apple"], weighted_average(1) * v["basil"],
    ], axis=0)
    np.testing.assert_allclose(vectors["short"], expected, rtol=1e-5)


def test_dynamic_threshold():
    cdb, vocab = build_ambiguous_world()
    cfg = CFG.with_overrides(similarity_threshold_type="dynamic",
                             similarity_threshold=0.9)
    cdb.cui2average_confidence["CUI-A"] = 1.2  # dynamic cut at 1.08
    cdb.cui2average_confidence["CUI-B"] = 0.0  # dynamic cut at 0
    ann = DocAnnotator(cdb, vocab, cfg)
    ents = ann.annotate("bravo berry probe basil bravo")
    # B's context wins and its dynamic threshold (0) accepts it
    assert len(ents) == 1 and ents[0]["cui"] == "CUI-B"
    ents = ann.annotate("alpha amber probe apple alpha")
    # A wins with sim < 0.99 → dynamic threshold rejects
    assert ents == []


def test_empty_context_dict_stays_ineligible_in_matrix_path():
    """A CUI whose context-vector dict is EMPTY must score -1.0
    (ineligible) in the vectorized matrix path exactly as in the dict
    fallback — a zero matrix row would score 0.0 and could flip the
    disambiguation argmax when all trained candidates score negative."""
    cdb, vocab = build_ambiguous_world()
    # trained but with NO context vectors of any size
    cdb.add_concept("CUI-C", prepare_name("probe", CFG), name_status="A")
    cdb.set_context_vectors("CUI-C", {}, count_train=10)
    ann = DocAnnotator(cdb, vocab, CFG)
    assert ann._sim_matrix is not None      # matrix path active
    uv = ann._unit_context(
        dict.fromkeys(CFG.context_vector_sizes,
                      -np.ones(DIM) / np.sqrt(DIM)))
    cuis = ["CUI-A", "CUI-B", "CUI-C"]
    many = ann._similarity_many(cuis, uv)
    single = np.array([ann._similarity(c, uv) for c in cuis])
    np.testing.assert_allclose(many, single)
    assert many[2] == -1.0
