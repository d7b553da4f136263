"""Funnel analysis — per-user ordered-stage reachability (the product
-analytics classic: which users did click → view → purchase IN ORDER).

Semantics: stage k is reached iff there is an increasing timestamp
chain t₁ < t₂ < … < t_k hitting the stage event types in order.  The
greedy earliest chain is optimal (taking the earliest valid event for
stage i never hurts later stages), so the whole computation is
``len(stages)`` rounds of:

    m_k = groupby(user).Min(ts) over events of stage-k type
          with ts > m_{k-1}(user)

Each round is ONE hash join (previous stage's per-user min onto the
event stream) + one native groupby-Min — the BFS/label-propagation
execution shape (ops/bfs.py), with the per-user min table (users-sized,
not events-sized) as the only thing that moves between rounds.  Joins
are materialized stage-by-stage (Ray 2.49 concurrent-join constraint).
"""

from __future__ import annotations

from typing import List, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Min


def funnel_stages(events: rd.Dataset, stages: Sequence[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  num_partitions: int = 8) -> rd.Dataset:
    """(user, stage): the highest 1-based stage index each user reached
    via an in-order chain (users reaching no stage are absent)."""
    stages = list(stages)

    def of_type(t: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch[type_col], t)) \
                .select([user_col, ts_col])
        return fn

    def min_ts(ds: rd.Dataset, alias: str) -> rd.Dataset:
        return ds.groupby(user_col) \
            .aggregate(Min(ts_col, alias_name=alias)) \
            .repartition(num_partitions).materialize()
        # repartition: Ray 2.49 groupby→join empty-block workaround

    events = events.materialize()
    prev = min_ts(events.map_batches(of_type(stages[0]),
                                     batch_format="pyarrow"), "t_prev")
    results: List[rd.Dataset] = [prev]
    for k in range(1, len(stages)):
        if prev.count() == 0:
            break
        cand = events.map_batches(of_type(stages[k]),
                                  batch_format="pyarrow") \
            .join(prev, join_type="inner",
                  num_partitions=num_partitions, on=(user_col,)) \
            .map_batches(
                lambda b: b.filter(pc.greater(b[ts_col], b["t_prev"]))
                .select([user_col, ts_col]),
                batch_format="pyarrow")
        cur = min_ts(cand, "t_prev")
        results.append(cur)
        prev = cur

    parts = []
    for k, r in enumerate(results):
        def mk(stage_no: int):
            def fn(batch: pa.Table) -> pa.Table:
                return pa.table({
                    user_col: batch[user_col],
                    "stage": pa.array([stage_no] * batch.num_rows,
                                      type=pa.int64())})
            return fn
        parts.append(r.map_batches(mk(k + 1), batch_format="pyarrow"))
    union = parts[0]
    for p in parts[1:]:
        union = union.union(p)
    # highest stage per user: native groupby-Max over the tiny
    # users-sized union
    from ray.data.aggregate import Max
    return union.groupby(user_col).aggregate(Max("stage",
                                                 alias_name="stage"))
