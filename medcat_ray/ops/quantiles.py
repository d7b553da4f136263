"""Exact distributed quantiles over a bounded-cardinality numeric
column, the histogram technique: one native ``groupby(value).count()``
shuffle produces the (value, n) histogram — cardinality-sized, not
corpus-sized — and the quantile walk runs over that tiny table.

Definition (discrete, lower): ``Q(q)`` is the smallest value whose
cumulative count reaches ``ceil(q · N)`` — exactly recomputable in SQL
(see the ``doc_len_quantiles`` oracle), no interpolation.

For unbounded/continuous columns, pre-bucket (round/scale) first — the
histogram shuffle assumes the distinct-value table fits comfortably in
one block, which holds for lengths, counts, scores×10^k, dates, etc.

Reference analogue: none in MedCAT (corpus-statistics operator).
"""

from __future__ import annotations

import math
from typing import List, Sequence

import pandas as pd

import ray.data as rd
from ray.data.aggregate import Count


def exact_quantiles(ds: rd.Dataset, col: str,
                    qs: Sequence[float]) -> pd.DataFrame:
    """DataFrame (q, value) of exact discrete quantiles of ``col``."""
    hist = ds.groupby(col).aggregate(Count(alias_name="n")).to_pandas()
    hist = hist.sort_values(col).reset_index(drop=True)
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum()
    out_q: List[float] = []
    out_v = []
    for q in qs:
        need = math.ceil(q * total)
        idx = int(cum.searchsorted(need, side="left"))
        idx = min(idx, len(hist) - 1)
        out_q.append(float(q))
        out_v.append(hist[col].iloc[idx])
    return pd.DataFrame({"q": out_q, "value": out_v})


def grouped_quantiles(ds: rd.Dataset, group_col: str, col: str,
                      qs: Sequence[float]) -> pd.DataFrame:
    """(group, q, value): exact discrete quantiles PER GROUP — one
    native ``groupby(group, value).count()`` shuffle (still
    cardinality-sized: groups × distinct values), then the quantile
    walk per group over that tiny table."""
    hist = ds.groupby([group_col, col]) \
        .aggregate(Count(alias_name="n")).to_pandas()
    out_g, out_q, out_v = [], [], []
    for g, sub in hist.groupby(group_col, sort=True):
        sub = sub.sort_values(col).reset_index(drop=True)
        total = int(sub["n"].sum())
        cum = sub["n"].cumsum()
        for q in qs:
            need = math.ceil(q * total)
            idx = min(int(cum.searchsorted(need, side="left")),
                      len(sub) - 1)
            out_g.append(g)
            out_q.append(float(q))
            out_v.append(sub[col].iloc[idx])
    return pd.DataFrame({group_col: out_g, "q": out_q, "value": out_v})
