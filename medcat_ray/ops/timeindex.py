"""Write-time RANGE-partitioned time index with READ-TIME bucket
pruning — the temporal member of the storage-layout-index family
(vector: ops/similarity.py:build_ivf_index; text:
ops/invindex.py:build_inverted_index): a time-range query reads only
the buckets its range overlaps, enforced by the directory layout
rather than a filter over the full table.

* build: ONE ``map_batches`` pass stamps each row with its bucket id
  (``epoch_us // bucket_us`` — fixed-width integer arithmetic, so the
  assignment is SQL-recomputable and needs no global statistics pass)
  → ``write_parquet(partition_cols=["tsb"])``.  Rows stream straight
  to storage; nothing is materialized driver-side.
* query: the [lo, hi] range maps to a CLOSED bucket-id interval; only
  those ``tsb=`` directories are listed and read (with ``columns=``
  pruning), then an exact vectorized ``ts BETWEEN`` filter trims the
  two boundary buckets.

At 100 TB this is the difference between a range scan touching
``range/width`` buckets and an all-partitions scan: resumable,
append-friendly (a late shard lands in its own bucket files), and the
pruning is provable — see the poisoned-bucket unit test.
"""

from __future__ import annotations

import glob
import os
import shutil
from datetime import datetime, timezone
from typing import Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 24 * US_PER_HOUR

TsLike = Union[str, datetime, int]


def _to_epoch_us(t: TsLike) -> int:
    """ISO string / datetime / raw integer microseconds → epoch µs.
    Naive inputs are taken as UTC (parquet timestamp[us] has no zone)."""
    if isinstance(t, int):
        return t
    if isinstance(t, str):
        t = datetime.fromisoformat(t)
    if t.tzinfo is None:
        t = t.replace(tzinfo=timezone.utc)
    # integer timedelta division — datetime.timestamp() is a float and
    # can drop the last microsecond on .999999 boundaries
    from datetime import timedelta
    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    return (t - epoch) // timedelta(microseconds=1)


def build_time_index(ds: rd.Dataset, index_dir: str, ts_col: str = "ts",
                     bucket_us: int = US_PER_DAY,
                     columns: Optional[Sequence[str]] = None) -> str:
    """Materialize ``ds`` under ``index_dir`` partitioned by time bucket
    ``tsb = epoch_us // bucket_us``; returns ``index_dir``.  A non-empty
    dir is cleared first (parquet writes APPEND into existing ``tsb=``
    directories — rebuilding over a crashed build would duplicate
    rows)."""
    if os.path.isdir(index_dir) and os.listdir(index_dir):
        shutil.rmtree(index_dir)

    def stamp(batch: pa.Table) -> pa.Table:
        if columns is not None:
            batch = batch.select(list(columns))
        us = pc.cast(batch[ts_col], pa.int64())
        tsb = pc.divide(us, bucket_us)  # epoch_us >= 0: floor == trunc
        return batch.append_column("tsb", pc.cast(tsb, pa.int64()))

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(stamp, batch_format="pyarrow") \
        .write_parquet(index_dir, partition_cols=["tsb"])
    return index_dir


def read_time_range(index_dir: str, lo: TsLike, hi: TsLike,
                    ts_col: str = "ts",
                    bucket_us: int = US_PER_DAY,
                    columns: Optional[Sequence[str]] = None) -> rd.Dataset:
    """Rows with ``lo <= ts <= hi`` (closed interval, microsecond
    resolution) — reads ONLY the ``tsb=`` directories the range
    overlaps."""
    lo_us, hi_us = _to_epoch_us(lo), _to_epoch_us(hi)
    if hi_us < lo_us:
        return rd.from_items([])
    lo_b, hi_b = lo_us // bucket_us, hi_us // bucket_us
    paths = []
    for b in range(lo_b, hi_b + 1):
        paths.extend(sorted(glob.glob(
            os.path.join(index_dir, f"tsb={b}", "*.parquet"))))
    if not paths:
        return rd.from_items([])
    cols = list(columns) if columns is not None else None
    if cols is not None and ts_col not in cols:
        cols = cols + [ts_col]
    rows = rd.read_parquet(paths, columns=cols)

    def trim(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch[ts_col], pa.int64())
        mask = pc.and_(pc.greater_equal(us, lo_us),
                       pc.less_equal(us, hi_us))
        out = batch.filter(mask)
        if columns is not None:
            out = out.select(list(columns))
        elif "tsb" in out.column_names:
            # read_parquet re-infers the hive partition column from the
            # tsb=K path segments; it is layout metadata, not data
            out = out.drop_columns(["tsb"])
        return out

    return rows.map_batches(trim, batch_format="pyarrow")
