"""Partition-resumable execution with per-partition lineage + metrics.

Ray gives task-level retry; JOB-level resume is ours to build (SURVEY.md §4).
The unit of resumability is the input fragment (one input parquet file →
one output partition directory), mirroring the reference's
``annotated_ids.pickle`` skip-set (/root/reference/medcat/cat.py:1403-1421)
but at fragment granularity so resume skips whole files without reading them.

Protocol per partition:
  1. run the pipeline for that fragment, writing to ``<out>/<kind>/part=<id>.tmp``
  2. atomically rename to ``<out>/<kind>/part=<id>``
  3. write ``<out>/_lineage/<id>.json`` with input path, row counts,
     model hash, extractor version and duration

On a rerun, fragments whose lineage record exists AND matches the current
model hash are skipped (a model change invalidates resume, like the
reference's model-pack hash, /root/reference/medcat/cat.py:151-178).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable, Dict, List, Optional, Sequence

import ray.data as rd


def partition_id(input_path: str) -> str:
    """Deterministic id for an input fragment."""
    return hashlib.sha1(os.path.basename(input_path).encode()).hexdigest()[:12]


def _lineage_path(out_dir: str, pid: str) -> str:
    return os.path.join(out_dir, "_lineage", f"{pid}.json")


def completed_partitions(out_dir: str, model_hash: str) -> Dict[str, dict]:
    """Lineage records of finished partitions for this model version."""
    lineage_dir = os.path.join(out_dir, "_lineage")
    done = {}
    if os.path.isdir(lineage_dir):
        for name in os.listdir(lineage_dir):
            if not name.endswith(".json"):
                continue
            try:
                with open(os.path.join(lineage_dir, name)) as fh:
                    rec = json.load(fh)
            except (OSError, json.JSONDecodeError):
                continue
            if rec.get("model_hash") == model_hash:
                done[rec["partition_id"]] = rec
    return done


def write_partition(ds: rd.Dataset, out_dir: str, kind: str, pid: str) -> int:
    """Atomic partition write: tmp dir → rename.  Returns rows written."""
    final = os.path.join(out_dir, kind, f"part={pid}")
    tmp = final + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    n_rows = sum(
        _parquet_rows(os.path.join(tmp, f)) for f in os.listdir(tmp)
        if f.endswith(".parquet"))
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return n_rows


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq
    return pq.ParquetFile(path).metadata.num_rows


def run_partitioned(input_files: Sequence[str], out_dir: str,
                    partition_fn: Callable[[str], Dict[str, rd.Dataset]],
                    model_hash: str,
                    extra_meta: Optional[dict] = None) -> List[dict]:
    """Run ``partition_fn(input_file) -> {kind: Dataset}`` for every fragment
    not yet committed; returns the lineage records of this run (old + new).

    Each partition's datasets stream independently through Ray's executor;
    a crash mid-partition leaves only ``.tmp`` dirs, which a rerun replaces.
    """
    os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)
    done = completed_partitions(out_dir, model_hash)
    records = list(done.values())
    for input_path in input_files:
        pid = partition_id(input_path)
        if pid in done:
            continue
        t0 = time.perf_counter()
        outputs = partition_fn(input_path)
        row_counts = {}
        for kind, ds in outputs.items():
            row_counts[kind] = write_partition(ds, out_dir, kind, pid)
        rec = {
            "partition_id": pid,
            "input": input_path,
            "rows_out": row_counts,
            "model_hash": model_hash,
            "duration_sec": round(time.perf_counter() - t0, 3),
            **(extra_meta or {}),
        }
        tmp = _lineage_path(out_dir, pid) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh, sort_keys=True)
        os.replace(tmp, _lineage_path(out_dir, pid))
        records.append(rec)
    return records
