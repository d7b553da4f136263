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

from typing import Dict, List, Optional, Tuple

from medcat_ray.config import EngineConfig
from medcat_ray.state.cdb import CDB
from medcat_ray.state.vocab import Vocab


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


def _sub_cases(case: RegressionCase, cdb: CDB
               ) -> List[Tuple[str, str, str, str, int]]:
    """(case, cui, name, text, start) rows: every display name of every
    target CUI substituted into every phrase.  Display form = the stored
    normalized name with separators as spaces (the reference substitutes
    preprocessed names the same way)."""
    rows = []
    sep = cdb.config.separator
    for cui in case.cuis:
        for name in sorted(cdb.cui2names.get(cui, ())):
            display = name.replace(sep, " ")
            for phrase in case.phrases:
                if case.placeholder not in phrase:
                    continue
                start = phrase.index(case.placeholder)
                text = phrase.replace(case.placeholder, display)
                rows.append((case.name, cui, display, text, start))
    return rows


def _check(annotator, cui: str, text: str, start: int, length: int) -> bool:
    ents = annotator.annotate(text)
    end = start + length
    return any(e["cui"] == cui and e["start"] >= start and e["end"] <= end
               and e["start"] < end for e in ents)


def run_regression(cdb: CDB, vocab: Vocab, cases: List[RegressionCase],
                   config: Optional[EngineConfig] = None) -> Dict[str, dict]:
    """Sequential checker; returns per-case {total, success, failures}."""
    from medcat_ray.core.annotator import DocAnnotator
    annotator = DocAnnotator(cdb, vocab, config)
    report: Dict[str, dict] = {}
    for case in cases:
        total = success = 0
        failures: List[dict] = []
        for case_name, cui, display, text, start in _sub_cases(case, cdb):
            total += 1
            if _check(annotator, cui, text, start, len(display)):
                success += 1
            else:
                failures.append({"cui": cui, "name": display,
                                 "phrase": text[:80]})
        report[case.name] = {"total": total, "success": success,
                             "failures": failures}
    return report


def run_regression_distributed(cdb: CDB, vocab: Vocab,
                               cases: List[RegressionCase],
                               config: Optional[EngineConfig] = None,
                               concurrency=2) -> Dict[str, dict]:
    """Same checks via the annotate actor pool (T1) over a generated-case
    Dataset; per-case fold via groupby."""
    import pyarrow as pa
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum
    from medcat_ray.stages.annotate import AnnotateStage

    rows = []
    for case in cases:
        for case_name, cui, display, text, start in _sub_cases(case, cdb):
            rows.append({"case": case_name, "cui": cui, "name": display,
                         "text": text, "start": start,
                         "length": len(display)})
    if not rows:
        return {}
    ds = rd.from_items(rows)
    models = ray.put((cdb, vocab))
    ann = ds.map_batches(
        AnnotateStage,
        fn_constructor_kwargs=dict(models=models, config=config,
                                   key_column="case",
                                   keep_columns=("cui", "start", "length")),
        batch_format="pyarrow", batch_size=64, concurrency=concurrency,
        num_cpus=1)

    def score(batch: pa.Table) -> pa.Table:
        ok = []
        for cui, start, length, ents in zip(batch["cui"].to_pylist(),
                                            batch["start"].to_pylist(),
                                            batch["length"].to_pylist(),
                                            batch["ents"].to_pylist()):
            end = start + length
            ok.append(int(any(
                e["cui"] == cui and e["start"] >= start and e["end"] <= end
                and e["start"] < end for e in ents or [])))
        return pa.table({"case": batch["case"],
                         "ok": pa.array(ok, pa.int64())})

    folded = ann.map_batches(score, batch_format="pyarrow") \
        .groupby("case").aggregate(Count(alias_name="total"),
                                   Sum("ok", alias_name="success")) \
        .to_pandas()
    return {r["case"]: {"total": int(r["total"]),
                        "success": int(r["success"])}
            for _, r in folded.iterrows()}
