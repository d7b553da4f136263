"""Regression-suite harness (SURVEY.md §5): YAML placeholder cases,
sequential and distributed runners agree."""

import pytest

from tests.test_training import tiny_models


CASES_YAML = """
disorders:
  targeting:
    placeholders:
      - placeholder: '[DISORDER]'
        cuis: ['C1', 'C2']
  phrases:
    - 'patient diagnosed with [DISORDER] yesterday'
    - '[DISORDER] was ruled out'
impossible:
  targeting:
    placeholders:
      - placeholder: '[X]'
        cuis: ['C1']
  phrases:
    - 'totally unrelated [X]zzz text'
"""


@pytest.fixture(scope="module")
def cases(tmp_path_factory):
    from medcat_ray.regression import RegressionCase
    p = tmp_path_factory.mktemp("reg") / "cases.yml"
    p.write_text(CASES_YAML)
    return RegressionCase.from_yaml(str(p))


def test_regression_sequential(cases):
    from medcat_ray.regression import run_regression
    cdb, vocab, cfg = tiny_models()
    report = run_regression(cdb, vocab, cases, cfg)
    d = report["disorders"]
    # C1 has names kidney~failure + kf (kf too short for min_name_len=3
    # with upper rules? 'kf' len 2 < 3 → never matches); C2 heart~attack.
    # Substituted long names must all be found.
    assert d["total"] > 0
    long_name_fails = [f for f in d["failures"] if " " in f["name"]]
    assert long_name_fails == []
    assert d["success"] >= 4   # 2 long names × 2 phrases
    # glued placeholder substitution breaks token boundaries → failure case
    assert report["impossible"]["success"] == 0


def test_regression_distributed_matches(ray_session, cases):
    from medcat_ray.regression import (run_regression,
                                       run_regression_distributed)
    cdb, vocab, cfg = tiny_models()
    seq = run_regression(cdb, vocab, cases, cfg)
    dist = run_regression_distributed(cdb, vocab, cases, cfg, concurrency=1)
    for case in seq:
        assert dist[case]["total"] == seq[case]["total"]
        assert dist[case]["success"] == seq[case]["success"]


def test_finding_classification():
    """Span-relation findings (reference results.py Finding semantics)."""
    from medcat_ray.regression import classify_finding as cf

    def e(cui, s, t):
        return {"cui": cui, "start": s, "end": t}

    assert cf("C1", 10, 20, [e("C1", 10, 20)]) == "IDENTICAL"
    assert cf("C1", 10, 20, [e("C1", 10, 25)]) == "BIGGER_SPAN_RIGHT"
    assert cf("C1", 10, 20, [e("C1", 5, 20)]) == "BIGGER_SPAN_LEFT"
    assert cf("C1", 10, 20, [e("C1", 5, 25)]) == "BIGGER_SPAN_BOTH"
    assert cf("C1", 10, 20, [e("C1", 12, 18)]) == "SMALLER_SPAN"
    assert cf("C1", 10, 20, [e("C1", 15, 25)]) == "PARTIAL_OVERLAP"
    assert cf("C1", 10, 20, [e("C2", 10, 20)]) == "FOUND_OTHER"
    assert cf("C1", 10, 20, [e("C2", 0, 5)]) == "FAIL"
    assert cf("C1", 10, 20, []) == "FAIL"
    # identical beats a worse same-CUI candidate
    assert cf("C1", 10, 20, [e("C1", 15, 25), e("C1", 10, 20)]) \
        == "IDENTICAL"
    # ontology-aware exact-span findings
    pt2ch = {"C1": {"C1a"}, "CP": {"C1"}}
    assert cf("C1", 10, 20, [e("C1a", 10, 20)], pt2ch) == "FOUND_ANY_CHILD"
    assert cf("C1", 10, 20, [e("CP", 10, 20)], pt2ch) == "FOUND_DIR_PARENT"


def test_strictness_matrix_levels(cases):
    from medcat_ray.regression import STRICTNESS_MATRIX, run_regression
    assert STRICTNESS_MATRIX["STRICTEST"] == {"IDENTICAL"}
    assert "FOUND_DIR_PARENT" in STRICTNESS_MATRIX["LENIENT"]
    assert "FAIL" not in STRICTNESS_MATRIX["LENIENT"]
    cdb, vocab, cfg = tiny_models()
    strict = run_regression(cdb, vocab, cases, cfg,
                            strictness="STRICTEST")
    loose = run_regression(cdb, vocab, cases, cfg, strictness="ANYTHING")
    for case in strict:
        assert strict[case]["success"] <= loose[case]["success"]
        assert loose[case]["success"] == loose[case]["total"]
        assert sum(strict[case]["findings"].values()) \
            == strict[case]["total"]


def test_typo_injection_with_spell_check():
    """edit_distance=(1, seed, n): typo'd names still link when spell
    check is on — and the typo rows are really generated."""
    from medcat_ray.config import EngineConfig
    from medcat_ray.regression import (RegressionCase, edit_variants,
                                       run_regression)
    from medcat_ray.state.cdb import CDB, prepare_name

    cfg = EngineConfig(spell_check=True)
    cdb = CDB(cfg)
    # one long name so every typo'd token passes spell_check_len_limit=7
    cdb.add_concept("CT1", prepare_name("appendicitis", cfg),
                    name_status="P", type_ids={"T1"})
    from medcat_ray.state.vocab import Vocab
    case = RegressionCase("typos", "[D]", ["CT1"],
                          ["patient shows signs of [D] today"])
    vs = edit_variants("appendicitis", 1, 5, seed=3)
    assert len(vs) == 5 and all(v != "appendicitis" for v in vs)
    assert edit_variants("appendicitis", 1, 5, seed=3) == vs  # seeded

    rep = run_regression(cdb, Vocab(), [case], cfg, strictness="NORMAL",
                         edit_distance=(1, 3, 5))
    r = rep["typos"]
    assert r["total"] == 6          # 1 clean + 5 typo variants
    # clean always links; typos recover via the Norvig spell path unless
    # the edit makes the token known-ambiguous (single-concept CDB: never)
    assert r["success"] == 6, r
