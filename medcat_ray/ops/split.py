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

from medcat_ray.ops.hashing import stable_u64


def add_split(ds: rd.Dataset, key_column: str = "doc_id",
              test_fraction: float = 0.2, salt: str = "split") -> rd.Dataset:
    """Add a ``split`` column ("train"/"test") by hashing the key."""
    threshold = int(test_fraction * 2**32)

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_column].to_pylist()
        splits = ["test" if (stable_u64(f"{salt}:{k}".encode()) & 0xFFFFFFFF)
                  < threshold else "train" for k in keys]
        return batch.append_column("split", pa.array(splits, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


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
