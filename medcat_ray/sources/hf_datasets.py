"""Ray-native loaders for the reference's HuggingFace dataset builders.

The reference ships three ``datasets.GeneratorBasedBuilder`` scripts whose
only real work is parsing a file into rows — the HF machinery around them
is incidental.  Re-expressed here as Ray Data sources (S9): bytes are read
with ``read_binary_files`` and parsed INSIDE tasks (one task per input
file — MCT exports and pickled annotation dumps are file-granular), so
loading scales with the file count and nothing is parsed on the driver.

Reference behavior mirrored exactly (schemas, annotation filters, year
markers):

* medcat/datasets/transformers_ner.py:33-121 → :func:`read_transformers_ner`
* medcat/datasets/medcat_annotations.py:39-93 → :func:`read_medcat_annotations`
* medcat/datasets/patient_concept_stream.py:35-94 → :func:`read_patient_concept_stream`

No torch / transformers / datasets import anywhere — these feed the
trainable NER/meta models (stages/ner_model.py) just as well as a GPU
stack would.
"""

from __future__ import annotations

import json
import pickle
from typing import List, Union

import pyarrow as pa
import ray.data as rd

NER_EXAMPLE_SCHEMA = pa.schema([
    ("id", pa.int32()),
    ("text", pa.string()),
    ("name", pa.string()),
    ("ent_starts", pa.list_(pa.int32())),
    ("ent_ends", pa.list_(pa.int32())),
    ("ent_cuis", pa.list_(pa.string())),
])


def _keep_annotation(entity: dict) -> bool:
    """The reference's correctness filter
    (medcat/datasets/transformers_ner.py:100-106): keep confirmed /
    manually-created / alternative annotations unless marked deleted,
    irrelevant or killed."""
    return (entity.get("correct", True)
            or entity.get("manually_created", False)
            or entity.get("alternative", False)) and not (
        entity.get("deleted", False)
        or entity.get("irrelevant", False)
        or entity.get("killed", False))


def _parse_mct_export(raw: bytes) -> pa.Table:
    projects = json.loads(raw)["projects"]
    ids, texts, names, starts, ends, cuis = [], [], [], [], [], []
    cnt = 0
    for project in projects:
        for doc in project["documents"]:
            s, e, c = [], [], []
            for entity in doc.get("annotations", []):
                if _keep_annotation(entity):
                    s.append(entity["start"])
                    e.append(entity["end"])
                    c.append(entity["cui"])
            ids.append(int(doc.get("id", cnt)))
            cnt += 1
            texts.append(str(doc["text"]))
            names.append(str(doc.get("name", "unknown")))
            starts.append(s)
            ends.append(e)
            cuis.append(c)
    return pa.table({
        "id": pa.array(ids, type=pa.int32()),
        "text": pa.array(texts, type=pa.string()),
        "name": pa.array(names, type=pa.string()),
        "ent_starts": pa.array(starts, type=pa.list_(pa.int32())),
        "ent_ends": pa.array(ends, type=pa.list_(pa.int32())),
        "ent_cuis": pa.array(cuis, type=pa.list_(pa.string())),
    })


def read_transformers_ner(paths: Union[str, List[str]]) -> rd.Dataset:
    """MCT-export JSON file(s) → NER training examples, one row per
    document (reference TransformersDatasetNER features): (id, text,
    name, ent_starts, ent_ends, ent_cuis) with the reference's
    annotation-status filter applied.  One parse task per file."""

    def parse(batch: pa.Table) -> pa.Table:
        tables = [_parse_mct_export(raw.as_py())
                  for raw in batch["bytes"]]
        return pa.concat_tables(tables) if tables \
            else NER_EXAMPLE_SCHEMA.empty_table()

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow")


def read_medcat_annotations(paths: Union[str, List[str]]) -> rd.Dataset:
    """Pickled MedCAT output (doc_id → {'entities': {...}}) → one row per
    entity with its left/center/right contexts (reference
    MedCATAnnotations features)."""

    def parse(batch: pa.Table) -> pa.Table:
        ids, doc_ids, lefts, rights, centers = [], [], [], [], []
        for raw in batch["bytes"]:
            docs = pickle.loads(raw.as_py())
            for doc_id in docs:
                for entity_id, entity in docs[doc_id]["entities"].items():
                    ids.append(int(entity_id))
                    doc_ids.append(str(doc_id))
                    lefts.append("".join(entity["context_left"]))
                    rights.append("".join(entity["context_right"]))
                    centers.append("".join(entity["context_center"]))
        return pa.table({
            "id": pa.array(ids, type=pa.int32()),
            "document_id": pa.array(doc_ids, type=pa.string()),
            "context_left": pa.array(lefts, type=pa.string()),
            "context_right": pa.array(rights, type=pa.string()),
            "context_center": pa.array(centers, type=pa.string()),
        })

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow")


def read_patient_concept_stream(paths: Union[str, List[str]]) -> rd.Dataset:
    """Pickled patient → [(cui, cnt, time, age_years), ...] stream →
    (patient_id, stream) rows where a patient's stream is the CUI
    sequence with the age (in years) spliced in whenever it advances —
    the reference's temporal-marker convention
    (medcat/datasets/patient_concept_stream.py:76-94)."""

    def parse(batch: pa.Table) -> pa.Table:
        pts, streams = [], []
        for raw in batch["bytes"]:
            pt2stream = pickle.loads(raw.as_py())
            for pt, stream in pt2stream.items():
                out, year = [], -1
                for data in stream:
                    # 0 - CUI, 1 - CNT, 2 - TIME, 3 - patient age in years
                    if data[3] > year:
                        out.append(str(data[3]))
                        year = data[3]
                    out.append(data[0])
                pts.append(str(pt))
                streams.append(out)
        return pa.table({
            "patient_id": pa.array(pts, type=pa.string()),
            "stream": pa.array(streams, type=pa.list_(pa.string())),
        })

    return rd.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow")
