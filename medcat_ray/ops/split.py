"""Deterministic train/test split (SURVEY.md O5).

Reference: ``make_mc_train_test`` (/root/reference/medcat/utils/data_utils.py)
splits an MCT export at document level, balancing per-CUI annotation counts.
At corpus scale a shuffle-based split is wrong (global state, reorder cost);
the Ray-native split is a pure hash of the document key — stable across
runs, machines and partitioning, and any row can be routed without seeing
any other row.
"""

from __future__ import annotations

from typing import Tuple

import pyarrow as pa
import ray.data as rd



def add_split(ds: rd.Dataset, key_column: str = "doc_id",
              test_fraction: float = 0.2, salt: str = "split") -> rd.Dataset:
    """Add a ``split`` column ("train"/"test") by hashing the key.

    The tag is the first 32 bits (big-endian) of ``md5(f"{salt}:{key}")``
    — md5 rather than blake2b because ANSI SQL can recompute it
    (``('0x' || substr(md5(s), 1, 8))::UBIGINT``), so the split is
    oracle-checkable end-to-end; distribution quality is equivalent."""
    import hashlib
    threshold = int(test_fraction * 2**32)

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_column].to_pylist()
        splits = ["test" if int.from_bytes(
                      hashlib.md5(f"{salt}:{k}".encode()).digest()[:4],
                      "big") < threshold else "train" for k in keys]
        return batch.append_column("split", pa.array(splits, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def make_mc_train_test(data: dict, test_size: float = 0.2,
                       min_test_count: int = 10,
                       max_test_fraction: float = 0.3,
                       seed: int = 11) -> Tuple[dict, dict, int, int]:
    """Count-balanced MCT-export split (reference ``make_mc_train_test``,
    /root/reference/medcat/utils/data_utils.py:817-955): documents go to
    the test set while (a) the overall test annotation fraction is below
    ``test_size`` and (b) no frequent CUI (total count ≥ ``min_test_count``)
    would exceed ``max_test_fraction`` of its occurrences in test.

    Deviations, documented: the reference permutes with the global numpy
    RNG (irreproducible); this version seeds a private generator, so the
    split is stable across runs.  The greedy selection is inherently
    sequential state (per-CUI running test counts), but an MCT export is
    an annotation artifact (thousands of documents, model-sized) — the
    sequential pass is over documents, while CUI counting is a flat fold.
    For corpus-scale splits use :func:`add_split` (pure hash, any row
    routable without global state).

    Returns (train_set, test_set, test_anns, total_anns)."""
    import numpy as np

    rng = np.random.default_rng(seed)

    def _anns(document):
        anns = document.get("annotations", [])
        return list(anns.values()) if isinstance(anns, dict) else anns

    def _filter(project):
        cuis = project.get("cuis", "").strip()
        return {c.strip() for c in cuis.split(",")} if cuis else None

    cnts: dict = {}
    total_anns = 0
    for project in data["projects"]:
        cf = _filter(project)
        for document in project["documents"]:
            for ann in _anns(document):
                if cf is None or ann["cui"] in cf:
                    cnts[ann["cui"]] = cnts.get(ann["cui"], 0) + 1
                    total_anns += 1

    test_cnts: dict = {}
    test_anns = 0
    test_prob = 0.90
    test_set: dict = {"projects": []}
    train_set: dict = {"projects": []}

    for i_project in rng.permutation(len(data["projects"])):
        project = data["projects"][i_project]
        cf = _filter(project)
        test_project = {k: ([] if k == "documents" else v)
                        for k, v in project.items()}
        train_project = {k: ([] if k == "documents" else v)
                         for k, v in project.items()}

        for i_document in rng.permutation(len(project["documents"])):
            if total_anns and test_anns / total_anns >= test_size:
                test_prob = 0
            document = project["documents"][i_document]
            doc_cnts: dict = {}
            for ann in _anns(document):
                if cf is None or ann["cui"] in cf:
                    doc_cnts[ann["cui"]] = doc_cnts.get(ann["cui"], 0) + 1
            is_test = any(
                cnts[cui] >= min_test_count and
                (v + test_cnts.get(cui, 0)) / cnts[cui] < max_test_fraction
                for cui, v in doc_cnts.items())
            if is_test and rng.random() < test_prob:
                test_project["documents"].append(document)
                for ann in _anns(document):
                    if cf is None or ann["cui"] in cf:
                        test_anns += 1
                        test_cnts[ann["cui"]] = \
                            test_cnts.get(ann["cui"], 0) + 1
            else:
                train_project["documents"].append(document)

        test_set["projects"].append(test_project)
        train_set["projects"].append(train_project)
    return train_set, test_set, test_anns, total_anns


def train_test_split(ds: rd.Dataset, key_column: str = "doc_id",
                     test_fraction: float = 0.2,
                     salt: str = "split") -> Tuple[rd.Dataset, rd.Dataset]:
    tagged = add_split(ds, key_column, test_fraction, salt)

    def keep(which: str):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return batch.filter(pc.equal(batch["split"], which)) \
                        .drop_columns(["split"])
        return fn

    return (tagged.map_batches(keep("train"), batch_format="pyarrow"),
            tagged.map_batches(keep("test"), batch_format="pyarrow"))
