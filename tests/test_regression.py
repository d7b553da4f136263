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
