"""Regression / conformance suite (SURVEY.md §5).

Reimplements the core of the reference's regression checker
(/root/reference/medcat/utils/regression/regression_checker.py:39-120;
case schema /root/reference/configs/default_regression_tests.yml): YAML test
cases with ``[PLACEHOLDER]`` phrase templates; for every target CUI, every
known name of that CUI is substituted into every phrase and the annotator
must find that CUI at the substituted span.

Two run modes:

* :func:`run_regression` — driver-side loop (small suites, exact parity
  with the reference's sequential checker).
* :func:`run_regression_distributed` — the generated (case, phrase, cui,
  name) matrix becomes a Ray Dataset streamed through the T1 annotate actor
  pool; per-row pass/fail folds with a groupby.  Same results, corpus-scale
  suites.
"""

from __future__ import annotations

import random
from typing import Dict, Iterable, List, Optional, Set, Tuple

from medcat_ray.config import EngineConfig
from medcat_ray.state.cdb import CDB
from medcat_ray.state.vocab import Vocab

# ---------------------------------------------------------------------------
# Finding classification + strictness matrix (reference results.py:10-330:
# Finding enum + STRICTNESS_MATRIX).  A finding describes HOW a recognised
# span compares to the expected (cui, start, end); a strictness level is the
# set of findings accepted as success.
# ---------------------------------------------------------------------------

FINDINGS = ("IDENTICAL", "BIGGER_SPAN_RIGHT", "BIGGER_SPAN_LEFT",
            "BIGGER_SPAN_BOTH", "SMALLER_SPAN", "PARTIAL_OVERLAP",
            "FOUND_ANY_CHILD", "FOUND_DIR_PARENT", "FOUND_OTHER", "FAIL")

STRICTNESS_MATRIX: Dict[str, Set[str]] = {
    "STRICTEST": {"IDENTICAL"},
    "STRICT": {"IDENTICAL", "FOUND_ANY_CHILD"},
    "NORMAL": {"IDENTICAL", "FOUND_ANY_CHILD", "BIGGER_SPAN_RIGHT",
               "BIGGER_SPAN_LEFT", "BIGGER_SPAN_BOTH", "SMALLER_SPAN",
               "PARTIAL_OVERLAP"},
    "LENIENT": {"IDENTICAL", "FOUND_ANY_CHILD", "BIGGER_SPAN_RIGHT",
                "BIGGER_SPAN_LEFT", "BIGGER_SPAN_BOTH", "SMALLER_SPAN",
                "PARTIAL_OVERLAP", "FOUND_DIR_PARENT"},
    "ANYTHING": set(FINDINGS),
}


def classify_finding(exp_cui: str, exp_start: int, exp_end: int,
                     ents: Iterable[dict],
                     pt2ch: Optional[Dict[str, Set[str]]] = None) -> str:
    """Classify how the annotator's entities met the expectation
    (reference FindingDeterminer, results.py:117-292).

    Precedence: same-CUI span relations first (identical > bigger/smaller/
    partial), then ontology-aware matches on the exact span (child of the
    expected CUI, then direct parent — needs ``pt2ch``), then any other
    CUI on the exact span, else FAIL."""
    pt2ch = pt2ch or {}
    same_cui = [e for e in ents if e["cui"] == exp_cui]
    for e in same_cui:                                    # exact first
        if e["start"] == exp_start and e["end"] == exp_end:
            return "IDENTICAL"
    best = None
    for e in same_cui:
        s, t = e["start"], e["end"]
        if t <= exp_start or s >= exp_end:
            continue                                      # no overlap
        if s <= exp_start and t >= exp_end:
            if s == exp_start:
                cand = "BIGGER_SPAN_RIGHT"
            elif t == exp_end:
                cand = "BIGGER_SPAN_LEFT"
            else:
                cand = "BIGGER_SPAN_BOTH"
        elif s >= exp_start and t <= exp_end:
            cand = "SMALLER_SPAN"
        else:
            cand = "PARTIAL_OVERLAP"
        if best is None or FINDINGS.index(cand) < FINDINGS.index(best):
            best = cand
    if best is not None:
        return best
    exact = [e for e in ents
             if e["start"] == exp_start and e["end"] == exp_end]
    children = pt2ch.get(exp_cui, set())
    for e in exact:
        if e["cui"] in children:
            return "FOUND_ANY_CHILD"
    for e in exact:
        if exp_cui in pt2ch.get(e["cui"], set()):
            return "FOUND_DIR_PARENT"
    if exact:
        return "FOUND_OTHER"
    return "FAIL"


# ---------------------------------------------------------------------------
# Typo injection (reference regression_checker.py edit_distance option:
# per name, a seeded random pick of N edit-distance-k variants, used to
# probe spell-check robustness).
# ---------------------------------------------------------------------------


def edit_variants(name: str, distance: int, n_picks: int,
                  seed: int) -> List[str]:
    """Deterministic sample of ``n_picks`` edit-distance-``distance``
    variants of ``name`` (single-char splits/deletes/transposes/replaces/
    inserts per level, like the reference's variant generator)."""
    from medcat_ray.functions.text import edits1
    variants = {name}
    for _ in range(max(0, distance)):
        variants = {v2 for v1 in variants for v2 in edits1(v1)}
    variants.discard(name)
    pool = sorted(variants)
    rng = random.Random(seed)
    if len(pool) <= n_picks:
        return pool
    return sorted(rng.sample(pool, n_picks))


class RegressionCase:
    def __init__(self, name: str, placeholder: str, cuis: List[str],
                 phrases: List[str]) -> None:
        self.name = name
        self.placeholder = placeholder
        self.cuis = list(cuis)
        self.phrases = list(phrases)

    @classmethod
    def from_yaml(cls, path: str) -> List["RegressionCase"]:
        """Load the reference YAML schema subset: per case
        ``targeting.placeholders[0]`` + ``phrases``."""
        import yaml
        with open(path) as fh:
            doc = yaml.safe_load(fh)
        cases = []
        for case_name, spec in doc.items():
            ph = spec["targeting"]["placeholders"][0]
            cases.append(cls(case_name, ph["placeholder"],
                             [str(c) for c in ph["cuis"]], spec["phrases"]))
        return cases


def _sub_cases(case: RegressionCase, cdb: CDB,
               edit_distance: Tuple[int, int, int] = (0, 0, 0)
               ) -> List[Tuple[str, str, str, str, int]]:
    """(case, cui, name, text, start) rows: every display name of every
    target CUI substituted into every phrase.  Display form = the stored
    normalized name with separators as spaces (the reference substitutes
    preprocessed names the same way).

    ``edit_distance=(k, seed, n)`` with k > 0 additionally substitutes
    ``n`` seeded edit-distance-``k`` typo variants of every display name
    (reference regression_checker.py edit_distance option) — the expected
    CUI is unchanged, probing spell-check recovery."""
    rows = []
    sep = cdb.config.separator
    k, seed, n_picks = edit_distance
    for cui in case.cuis:
        for name in sorted(cdb.cui2names.get(cui, ())):
            display = name.replace(sep, " ")
            forms = [display]
            if k > 0 and n_picks > 0:
                forms += edit_variants(display, k, n_picks, seed)
            for form in forms:
                for phrase in case.phrases:
                    if case.placeholder not in phrase:
                        continue
                    start = phrase.index(case.placeholder)
                    text = phrase.replace(case.placeholder, form)
                    rows.append((case.name, cui, form, text, start))
    return rows


def run_regression(cdb: CDB, vocab: Vocab, cases: List[RegressionCase],
                   config: Optional[EngineConfig] = None,
                   strictness: str = "NORMAL",
                   edit_distance: Tuple[int, int, int] = (0, 0, 0),
                   pt2ch: Optional[Dict[str, Set[str]]] = None
                   ) -> Dict[str, dict]:
    """Sequential checker; returns per-case {total, success, findings,
    failures} with success judged under ``strictness``
    (STRICTNESS_MATRIX) and per-finding counts reported like the
    reference's result descriptors."""
    from medcat_ray.core.annotator import DocAnnotator
    allowed = STRICTNESS_MATRIX[strictness]
    annotator = DocAnnotator(cdb, vocab, config)
    report: Dict[str, dict] = {}
    for case in cases:
        total = success = 0
        findings: Dict[str, int] = {}
        failures: List[dict] = []
        for case_name, cui, display, text, start in \
                _sub_cases(case, cdb, edit_distance):
            total += 1
            ents = annotator.annotate(text)
            f = classify_finding(cui, start, start + len(display), ents,
                                 pt2ch)
            findings[f] = findings.get(f, 0) + 1
            if f in allowed:
                success += 1
            else:
                failures.append({"cui": cui, "name": display,
                                 "finding": f, "phrase": text[:80]})
        report[case.name] = {"total": total, "success": success,
                             "findings": findings, "failures": failures}
    return report


def run_regression_distributed(cdb: CDB, vocab: Vocab,
                               cases: List[RegressionCase],
                               config: Optional[EngineConfig] = None,
                               concurrency=2,
                               strictness: str = "NORMAL",
                               edit_distance: Tuple[int, int, int] = (0, 0, 0),
                               pt2ch: Optional[Dict[str, Set[str]]] = None
                               ) -> Dict[str, dict]:
    """Same checks via the annotate actor pool (T1) over a generated-case
    Dataset; per-(case, finding) fold via groupby — equals
    :func:`run_regression` up to the failure examples (unit-tested)."""
    import pyarrow as pa
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum
    from medcat_ray.stages.annotate import AnnotateStage

    allowed = STRICTNESS_MATRIX[strictness]
    rows = []
    for case in cases:
        for case_name, cui, display, text, start in \
                _sub_cases(case, cdb, edit_distance):
            rows.append({"case": case_name, "cui": cui, "name": display,
                         "text": text, "start": start,
                         "length": len(display)})
    if not rows:
        return {}
    ds = rd.from_items(rows)
    models = ray.put((cdb, vocab))
    pt2ch_ref = ray.put(pt2ch or {})
    ann = ds.map_batches(
        AnnotateStage,
        fn_constructor_kwargs=dict(models=models, config=config,
                                   key_column="case",
                                   keep_columns=("cui", "start", "length")),
        batch_format="pyarrow", batch_size=64, concurrency=concurrency,
        num_cpus=1)

    def score(batch: pa.Table) -> pa.Table:
        p2c = ray.get(pt2ch_ref)
        fnds = []
        for cui, start, length, ents in zip(batch["cui"].to_pylist(),
                                            batch["start"].to_pylist(),
                                            batch["length"].to_pylist(),
                                            batch["ents"].to_pylist()):
            fnds.append(classify_finding(cui, start, start + length,
                                         ents or [], p2c))
        return pa.table({"case": batch["case"],
                         "finding": pa.array(fnds, pa.string()),
                         "n": pa.array([1] * len(fnds), pa.int64())})

    folded = ann.map_batches(score, batch_format="pyarrow") \
        .groupby(["case", "finding"]).aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    report: Dict[str, dict] = {}
    for _, r in folded.iterrows():
        rec = report.setdefault(r["case"], {"total": 0, "success": 0,
                                            "findings": {}})
        n = int(r["n"])
        rec["total"] += n
        rec["findings"][r["finding"]] = n
        if r["finding"] in allowed:
            rec["success"] += n
    return report
