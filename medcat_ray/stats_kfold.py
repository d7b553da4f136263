"""K-fold cross-validation orchestration (SURVEY.md A6 driver).

Reference: /root/reference/medcat/stats/kfold.py:137-480 —

* fold creators over an MCT export (``projects -> documents ->
  annotations``): contiguous per-document chunks
  (``PerDocsFoldCreator:177-196``), per-annotation walk with
  ``total//k`` sizes and the remainder on the LAST fold
  (``SimpleFoldCreator._init_per_fold:157-165`` +
  ``PerAnnsFoldCreator:198-236``), and annotation-weighted greedy
  bin-packing, heaviest document first into the lightest fold
  (``WeightedDocumentsCreator:239-261``);
* the replay driver (``get_per_fold_metrics:291-302``): for each fold,
  snapshot the CDB, train supervised on the OTHER k-1 folds, evaluate on
  the held-out fold, restore the snapshot;
* the metric merge (``get_metrics_mean:364-449``) — here the per-fold
  per-CUI (tp, fp, fn) frames fold through
  :func:`medcat_ray.stats.merge_fold_stats` (counters summed, P/R/F1
  recomputed over totals).

Scale note: folds are MODEL-sized (an MCT labelled export — thousands of
documents, not the corpus), so fold creation is driver-side by design;
the expensive parts — supervised replay and fold evaluation — run
through the same Trainer / Ray ``prf_per_cui`` paths as the full-data
queries, and evaluation is distributed (tagged union + two groupbys, no
driver row loops).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd

ProjInfo = Tuple[str, object, list, list]   # (name, id, cuis, tuis)


def iter_docs(export: dict) -> Iterator[Tuple[ProjInfo, dict]]:
    """(project-info, document) pairs in export order
    (reference utils/fold-helpers; kfold.py:183 `_all_docs`)."""
    for project in export.get("projects", []):
        info = (project.get("name", ""), project.get("id"),
                project.get("cuis", []), project.get("tuis", []))
        for doc in project.get("documents", []):
            yield info, doc


def iter_anns(export: dict) -> Iterator[Tuple[ProjInfo, dict, dict]]:
    for info, doc in iter_docs(export):
        for ann in doc.get("annotations", []):
            yield info, doc, ann


def count_all_docs(export: dict) -> int:
    return sum(1 for _ in iter_docs(export))


def count_all_annotations(export: dict) -> int:
    return sum(1 for _ in iter_anns(export))


def _new_project(info: ProjInfo) -> dict:
    name, pid, cuis, tuis = info
    proj = {"name": name, "id": pid, "cuis": cuis, "documents": []}
    if tuis:
        proj["tuis"] = tuis
    return proj


def _shallow_doc(doc: dict, annotations: Optional[list] = None) -> dict:
    out = {k: v for k, v in doc.items() if k != "annotations"}
    out["annotations"] = (list(doc.get("annotations", []))
                          if annotations is None else annotations)
    return out


def _export_with_documents(
        relevant_docs: Iterable[Tuple[ProjInfo, dict]]) -> dict:
    """Regroup (proj-info, doc) pairs into an export dict, preserving
    project identity (kfold.py:104-135)."""
    fold: dict = {"projects": []}
    by_name: Dict[str, dict] = {}
    for info, doc in relevant_docs:
        proj = by_name.get(info[0])
        if proj is None:
            proj = _new_project(info)
            by_name[info[0]] = proj
            fold["projects"].append(proj)
        proj["documents"].append(_shallow_doc(doc))
    return fold


# -- fold creators -----------------------------------------------------------

def folds_per_docs(export: dict, k: int) -> List[dict]:
    """Contiguous per-document chunks; the LAST fold absorbs the
    remainder (kfold.py:177-196)."""
    docs = list(iter_docs(export))
    if k <= 0 or len(docs) < k:
        raise ValueError(f"cannot make {k} folds from {len(docs)} docs")
    per = len(docs) // k
    return [_export_with_documents(
        docs[i * per: (len(docs) if i == k - 1 else (i + 1) * per)])
        for i in range(k)]


def _per_fold_sizes(total: int, k: int) -> List[int]:
    """total//k each, remainder added to the last fold
    (kfold.py:157-165); any non-positive fold size raises."""
    per = [total // k] * k
    per[-1] += total - sum(per)
    if any(p <= 0 for p in per):
        raise ValueError(f"Failed to calculate per-fold items. Got: {per}")
    return per


def folds_per_anns(export: dict, k: int) -> List[dict]:
    """Walk annotations in export order, cutting at the per-fold sizes;
    documents are replicated into every fold that takes one of their
    annotations (kfold.py:198-236)."""
    anns = list(iter_anns(export))
    sizes = _per_fold_sizes(len(anns), k)
    folds: List[dict] = []
    pos = 0
    for size in sizes:
        fold: dict = {"projects": []}
        by_proj: Dict[str, dict] = {}
        by_doc: Dict[Tuple[str, object], dict] = {}
        for info, doc, ann in anns[pos: pos + size]:
            proj = by_proj.get(info[0])
            if proj is None:
                proj = _new_project(info)
                by_proj[info[0]] = proj
                fold["projects"].append(proj)
            key = (info[0], doc.get("id", doc.get("name")))
            cur = by_doc.get(key)
            if cur is None:
                cur = _shallow_doc(doc, annotations=[])
                by_doc[key] = cur
                proj["documents"].append(cur)
            cur["annotations"].append(ann)
        folds.append(fold)
        pos += size
    return folds


def get_nr_of_annotations(doc: dict) -> int:
    return len(doc.get("annotations", []))


def folds_weighted_docs(
        export: dict, k: int,
        weight_calculator: Callable[[dict], int] = get_nr_of_annotations
) -> List[dict]:
    """Greedy balanced bin-packing: documents sorted by weight
    descending, each assigned to the currently-lightest fold
    (np.argmin — first index on ties), kfold.py:239-261."""
    docs = [(item, weight_calculator(item[1])) for item in iter_docs(export)]
    docs.sort(key=lambda d: d[1], reverse=True)
    doc_folds: List[list] = [[] for _ in range(k)]
    weights = [0] * k
    for item, w in docs:
        i = int(np.argmin(weights))
        doc_folds[i].append(item)
        weights[i] += w
    return [_export_with_documents(d) for d in doc_folds]


def create_folds(export: dict, k: int,
                 split_type: str = "weighted") -> List[dict]:
    """split_type: "docs" | "anns" | "weighted" (the reference default,
    kfold.py:264-288 SplitType.DOCUMENTS_WEIGHTED)."""
    if split_type == "docs":
        return folds_per_docs(export, k)
    if split_type == "anns":
        return folds_per_anns(export, k)
    if split_type == "weighted":
        return folds_weighted_docs(export, k)
    raise ValueError(f"Unknown split type: {split_type}")


# -- replay driver ------------------------------------------------------------

def _fold_tables(fold: dict) -> Tuple[List[dict], List[dict]]:
    """(docs rows, gold rows) for one fold: doc rows carry text; gold
    rows are exact (doc, start, cui) targets, skipping killed /
    alternative / deleted annotations (the same replay filter the
    trainer applies to positives)."""
    doc_rows: List[dict] = []
    gold_rows: List[dict] = []
    for _, doc in iter_docs(fold):
        doc_id = doc.get("id", doc.get("name"))
        doc_rows.append({"doc_id": doc_id, "text": doc.get("text", "")})
        for ann in doc.get("annotations", []):
            if ann.get("killed") or ann.get("alternative") or \
                    ann.get("deleted"):
                continue
            gold_rows.append({"doc_id": doc_id,
                              "start_pos": int(ann["start"]),
                              "cui": str(ann["cui"])})
    return doc_rows, gold_rows


def evaluate_fold(cdb, vocab, fold: dict, config=None) -> pd.DataFrame:
    """Held-out-fold metrics: annotate the fold's documents with the
    (trained) CDB, classify against the fold's gold annotations via the
    distributed (doc, start, cui) match (stats.prf_per_cui)."""
    import ray.data as rd
    from medcat_ray import stats
    from medcat_ray.core.annotator import DocAnnotator

    doc_rows, gold_rows = _fold_tables(fold)
    ann = DocAnnotator(cdb, vocab, config or cdb.config)
    pred_rows = [{"doc_id": d["doc_id"], "start_pos": int(e["start"]),
                  "cui": str(e["cui"])}
                 for d in doc_rows for e in ann.annotate(d["text"])]
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                          "start_pos": pd.Series([], dtype="int64"),
                          "cui": pd.Series([], dtype=object)})
    pred = rd.from_pandas(pd.DataFrame(pred_rows) if pred_rows else empty)
    gold = rd.from_pandas(pd.DataFrame(gold_rows) if gold_rows else empty)
    return stats.prf_per_cui(pred, gold)


def get_per_fold_metrics(cdb, vocab, folds: List[dict], config=None,
                         nepochs: int = 1) -> List[pd.DataFrame]:
    """For each fold: snapshot CDB -> train on the other k-1 folds ->
    evaluate on the held-out fold -> restore (kfold.py:291-302)."""
    from medcat_ray.core.trainer import Trainer
    from medcat_ray.state.cdb_state import captured_state_cdb

    metrics: List[pd.DataFrame] = []
    for i, fold in enumerate(folds):
        with captured_state_cdb(cdb):
            trainer = Trainer(cdb, vocab, config)
            for j, other in enumerate(folds):
                if j != i:
                    trainer.train_supervised_raw(other, nepochs=nepochs)
            metrics.append(evaluate_fold(cdb, vocab, fold, config))
    return metrics


def get_k_fold_stats(cdb, vocab, export: dict, k: int = 3,
                     split_type: str = "weighted", config=None,
                     nepochs: int = 1) -> pd.DataFrame:
    """Split -> per-fold train/eval replay -> merged per-CUI metrics
    (kfold.py:452-480 composed with stats.merge_fold_stats)."""
    from medcat_ray.stats import merge_fold_stats
    folds = create_folds(export, k, split_type=split_type)
    per_fold = get_per_fold_metrics(cdb, vocab, folds, config=config,
                                    nepochs=nepochs)
    return merge_fold_stats(per_fold)
