"""MedMentions / PubTator corpus converter (SURVEY gap; reference
/root/reference/medcat/utils/medmentions.py:1-90).

PubTator format: per document a ``PMID|t|Title`` line, a ``PMID|a|Abstract``
line, then tab-separated entity rows ``PMID  start  end  name  types  cui``,
with a blank line between documents.  Offsets are over ``title + " " +
abstract`` — the reference reproduces exactly that concatenation
(medmentions.py:66, 46) and we keep it.

Ray-first shape: parsing is a pure function of one file's lines; a corpus
of many PubTator files parallelizes with ``read_binary_files`` +
``flat_map`` over documents.  The MCT-style JSON export is an annotation
artifact (model-sized) and stays a driver-side dict like the reference's.
"""

from __future__ import annotations

import json
from typing import Dict, Iterator, List, Optional

import pyarrow as pa

import ray.data as rd


def _parse_docs(lines: Iterator[str]) -> Iterator[dict]:
    doc: dict = {}
    for row in lines:
        if row.strip() == "":
            if doc:
                yield doc
                doc = {}
            continue
        if "|t|" in row[0:13]:
            head, title = row.split("|t|", 1)
            doc["doc_id"] = head.strip()
            doc["title"] = title.strip()
        elif "|a|" in row[0:13]:
            abstract = row.split("|a|", 1)[1].strip()
            # reference concatenation (medmentions.py:66): title SP abstract
            doc["text"] = doc.get("title", "") + " " + abstract
            doc["annotations"] = []
        else:
            parts = row.split("\t")
            doc.setdefault("annotations", []).append({
                "start": int(parts[1]),
                "end": int(parts[2]),
                "value": parts[3],
                "type_id": "|".join(parts[4].split(",")),
                "cui": parts[5].strip(),
            })
    if doc:
        yield doc


def read_pubtator_documents(path: str) -> rd.Dataset:
    """(doc_id, text, annotations list<struct>) rows — one per document."""
    with open(path, encoding="utf-8") as fh:
        docs = list(_parse_docs(fh))
    rows = [{
        "doc_id": d["doc_id"],
        "text": d.get("text", d.get("title", "")),
        "annotations": d.get("annotations", []),
    } for d in docs]
    return rd.from_items(rows)


def pubtator_concept_rows(path: str) -> rd.Dataset:
    """Distinct (cui, type_id, name, name_status) concept-CSV rows
    (reference ``original2concept_csv``, medmentions.py:5-30 — every
    entity row becomes a status-A concept row; duplicates preserved there,
    deduped here via one groupby so the CDB fold is smaller)."""
    docs = read_pubtator_documents(path)

    def explode(batch: pa.Table) -> pa.Table:
        cuis, types, names = [], [], []
        for anns in batch["annotations"].to_pylist():
            for a in anns or []:
                cuis.append(a["cui"])
                types.append(a["type_id"])
                names.append(a["value"])
        return pa.table({
            "cui": pa.array(cuis, type=pa.string()),
            "type_id": pa.array(types, type=pa.string()),
            "name": pa.array(names, type=pa.string()),
        })

    from ray.data.aggregate import Count
    agg = docs.map_batches(explode, batch_format="pyarrow") \
        .groupby(["cui", "type_id", "name"]).aggregate(Count(alias_name="n"))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "cui": batch["cui"],
            "type_id": batch["type_id"],
            "name": batch["name"],
            "name_status": pa.array(["A"] * n, type=pa.string()),
        })
    return agg.map_batches(finish, batch_format="pyarrow")


def pubtator_to_text(path: str, out_path: str) -> None:
    """Pure-text export, one document per line (reference
    ``original2pure_text``, medmentions.py:33-48 — trailing space kept)."""
    with open(path, encoding="utf-8") as fh, \
            open(out_path, "w", encoding="utf-8") as out:
        for d in _parse_docs(fh):
            out.write(d.get("text", d.get("title", "")) + " " + "\n")


def pubtator_to_mct(path: str, out_path: Optional[str] = None) -> Dict:
    """MCT-export-style JSON (reference ``original2json``,
    medmentions.py:51-90): one project named 'medmentions' containing every
    document with its annotations."""
    with open(path, encoding="utf-8") as fh:
        documents = [{"text": d.get("text", d.get("title", "")),
                      "annotations": d.get("annotations", [])}
                     for d in _parse_docs(fh)]
    data = {"projects": [{"name": "medmentions", "id": 0,
                          "documents": documents}]}
    if out_path is not None:
        with open(out_path, "w", encoding="utf-8") as out:
            json.dump(data, out)
    return data
