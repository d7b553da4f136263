"""MedCATtrainer export JSON source (SURVEY.md S6).

The export shape (projects → documents → annotations) is defined by the
reference's typed schema (/root/reference/medcat/stats/mctexport.py:5-35) and
consumed by supervised training (/root/reference/medcat/cat.py:803-840).
Here it explodes into flat Arrow rows: one row per annotation
(:func:`read_mct_annotations`) or per document (:func:`read_mct_documents`),
ready for joins against predicted-entity tables (SURVEY.md J5).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List

import pyarrow as pa
import ray.data as rd


def _load(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def read_mct_documents(path: str) -> rd.Dataset:
    """One row per (project, document): project_id, project_name, cuis
    filter string, doc_id, doc_name, text."""
    export = _load(path)
    rows: Dict[str, List[Any]] = {
        "project_id": [], "project_name": [], "project_cuis": [],
        "doc_id": [], "doc_name": [], "text": []}
    for project in export.get("projects", []):
        for doc in project.get("documents", []):
            rows["project_id"].append(str(project.get("id", "")))
            rows["project_name"].append(project.get("name", ""))
            rows["project_cuis"].append(project.get("cuis", "") or "")
            rows["doc_id"].append(str(doc.get("id", "")))
            rows["doc_name"].append(doc.get("name", ""))
            rows["text"].append(doc.get("text", ""))
    return rd.from_arrow(pa.table(
        {k: pa.array(v, pa.string()) for k, v in rows.items()}))


def read_mct_annotations(path: str) -> rd.Dataset:
    """One row per annotation with validation flags — the gold standard for
    the P/R/F1 harness (reference iter_anns, mctexport.py:49-54; flag
    semantics from stats filtering, medcat/stats/stats.py:102-146)."""
    export = _load(path)
    rows: Dict[str, List[Any]] = {
        "project_id": [], "doc_id": [], "start": [], "end": [],
        "cui": [], "value": [], "correct": [], "deleted": [],
        "alternative": [], "killed": [], "manually_created": []}
    for project in export.get("projects", []):
        pid = str(project.get("id", ""))
        for doc in project.get("documents", []):
            did = str(doc.get("id", ""))
            for ann in doc.get("annotations", []):
                rows["project_id"].append(pid)
                rows["doc_id"].append(did)
                rows["start"].append(int(ann["start"]))
                rows["end"].append(int(ann["end"]))
                rows["cui"].append(str(ann["cui"]))
                rows["value"].append(ann.get("value", ""))
                for flag in ("correct", "deleted", "alternative", "killed",
                             "manually_created"):
                    rows[flag].append(bool(ann.get(flag, False)))
    return rd.from_arrow(pa.table({
        "project_id": pa.array(rows["project_id"], pa.string()),
        "doc_id": pa.array(rows["doc_id"], pa.string()),
        "start": pa.array(rows["start"], pa.int32()),
        "end": pa.array(rows["end"], pa.int32()),
        "cui": pa.array(rows["cui"], pa.string()),
        "value": pa.array(rows["value"], pa.string()),
        "correct": pa.array(rows["correct"], pa.bool_()),
        "deleted": pa.array(rows["deleted"], pa.bool_()),
        "alternative": pa.array(rows["alternative"], pa.bool_()),
        "killed": pa.array(rows["killed"], pa.bool_()),
        "manually_created": pa.array(rows["manually_created"], pa.bool_()),
    }))
