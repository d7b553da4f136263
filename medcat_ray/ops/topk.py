"""Grouped top-k — the ``ROW_NUMBER() OVER (PARTITION BY ...) <= k``
window pattern, distributed as combiner → tiny shuffle:

1. Per-batch pre-aggregation keeps at most k rows per group per batch
   (one vectorized sort_values + groupby-head — no per-group Python),
   so the shuffle carries ≤ blocks·k rows per group, never the corpus.
2. A final per-group pass (``groupby().map_groups``) merges the
   partials; each surviving group holds ≤ blocks·k rows, so the
   documented per-group overhead is paid only on tiny groups.

Ordering is (val desc, tie asc) — ``tie`` is REQUIRED so the selected
rows are deterministic under equal values (and SQL-recomputable).

Reference analogue: O3/O4 leaderboards in stats.py use driver-side
top-k over small aggregates; this is the corpus-scale variant.
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd


def grouped_topk(ds: rd.Dataset, key: str, val: str, tie: str,
                 k: int = 3) -> rd.Dataset:
    """Top-k rows per ``key`` group by ``val`` desc (ties broken by
    ``tie`` asc), with a 1-based ``rank`` column appended."""
    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return df.sort_values([key, val, tie],
                              ascending=[True, False, True]) \
            .groupby(key, sort=False).head(k)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values([val, tie], ascending=[False, True]).head(k)
        out = out.copy()
        out["rank"] = range(1, len(out) + 1)
        return out

    return ds.map_batches(_partial, batch_format="pandas") \
        .groupby(key).map_groups(_final, batch_format="pandas")
