"""Range-partitioned time index with read-time pruning (ops/timeindex.py)."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from medcat_ray.ops.timeindex import (US_PER_DAY, US_PER_HOUR,
                                      build_time_index, read_time_range)

BASE = pd.Timestamp("2024-01-01 00:00:00")


def _events(n=200, step_min=37):
    ts = [BASE + pd.Timedelta(minutes=step_min * i) for i in range(n)]
    return pd.DataFrame({"event_id": np.arange(n, dtype=np.int64),
                         "ts": pd.Series(ts).astype("datetime64[us]"),
                         "value": np.arange(n, dtype=np.float64) * 1.5})


def test_time_range_matches_filter(ray_session, tmp_path):
    df = _events()
    d = str(tmp_path / "tix")
    build_time_index(rd.from_pandas(df).repartition(3), d)
    lo, hi = "2024-01-02 03:00:00", "2024-01-04 12:30:00"
    got = read_time_range(d, lo, hi).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = df[(df["ts"] >= pd.Timestamp(lo)) & (df["ts"] <= pd.Timestamp(hi))] \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "ts", "value"]],
        want[["event_id", "ts", "value"]])
    # closed interval at microsecond resolution: exact endpoints included
    one = df["ts"].iloc[10]
    got1 = read_time_range(d, int(one.value // 1000), int(one.value // 1000)) \
        .to_pandas()
    assert got1["event_id"].tolist() == [10]


def test_time_range_prunes_buckets(ray_session, tmp_path):
    """Poisoned-bucket proof: garbage parquet in an out-of-range bucket
    does not affect a pruned read — and breaks an overlapping one."""
    d = str(tmp_path / "tix")
    build_time_index(rd.from_pandas(_events()), d)
    poisoned = sorted(glob.glob(os.path.join(d, "tsb=*")))[0]   # day 0
    with open(os.path.join(poisoned, "junk.parquet"), "wb") as f:
        f.write(b"this is not parquet")
    ok = read_time_range(d, "2024-01-03 00:00:00", "2024-01-03 23:59:59")
    assert ok.count() > 0                      # never touches day 0
    with pytest.raises(Exception):
        read_time_range(d, "2024-01-01 00:00:00",
                        "2024-01-03 23:59:59").count()


def test_time_range_edges_and_rebuild(ray_session, tmp_path):
    d = str(tmp_path / "tix")
    ds = rd.from_pandas(_events(50))
    build_time_index(ds, d, bucket_us=US_PER_HOUR)
    # empty interval and out-of-domain ranges return no rows
    assert read_time_range(d, "2024-01-02", "2024-01-01",
                           bucket_us=US_PER_HOUR).count() == 0
    assert read_time_range(d, "2030-01-01", "2030-01-02",
                           bucket_us=US_PER_HOUR).count() == 0
    # hour buckets: a 2h window reads at most 3 bucket dirs
    n_all = read_time_range(d, "2024-01-01", "2024-02-01",
                            bucket_us=US_PER_HOUR).count()
    assert n_all == 50
    # rebuild clears stale buckets (no duplicate appends)
    build_time_index(rd.from_pandas(_events(50)), d,
                     bucket_us=US_PER_HOUR)
    assert read_time_range(d, "2024-01-01", "2024-02-01",
                           bucket_us=US_PER_HOUR).count() == 50


def test_time_range_column_pruning(ray_session, tmp_path):
    d = str(tmp_path / "tix")
    build_time_index(rd.from_pandas(_events()), d)
    got = read_time_range(d, "2024-01-02", "2024-01-03",
                          columns=["event_id"]).to_pandas()
    assert list(got.columns) == ["event_id"] and len(got) > 0
