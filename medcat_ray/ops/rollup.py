"""ROLLUP aggregates — multi-level grouped statistics where every
coarser level is derived from the FINEST level's (already tiny)
aggregate, never by re-scanning the corpus (the SQL twin:
``GROUP BY ROLLUP (a, b)``).

Scale shape: one corpus pass builds the finest (a, b) aggregate via the
usual per-block combiner → native groupby; the (a) subtotals and the
grand total are pandas folds over that group-cardinality-sized result
on the driver.  At 10^12 rows with 10^3 groups, the corpus is touched
once and the rollup costs nothing."""

from __future__ import annotations

from typing import List, Sequence

import pandas as pd

import ray.data as rd
from ray.data.aggregate import Count, Sum

ALL = "__all__"          # the NULL marker for rolled-up levels


def rollup_counts(ds: rd.Dataset, cols: Sequence[str],
                  weight_col: str | None = None) -> pd.DataFrame:
    """(c1, ..., ck, n) rows for every ROLLUP level: (c1..ck),
    (c1..ck-1, ALL), ..., (ALL, ..., ALL).  ``n`` is the row count (or
    the sum of ``weight_col``).  Rolled-up positions hold ``ALL`` —
    matching ``COALESCE(col, '__all__')`` over ``GROUP BY ROLLUP`` in
    the twin."""
    cols = list(cols)
    agg = Count(alias_name="n") if weight_col is None \
        else Sum(weight_col, alias_name="n")
    fine = ds.groupby(cols).aggregate(agg).to_pandas()
    # integer weights (and plain counts) stay int64; float weights keep
    # their dtype — "n is the sum of weight_col", never truncated
    int_n = pd.api.types.is_integer_dtype(fine["n"])
    if int_n:
        fine["n"] = fine["n"].astype("int64")
    levels: List[pd.DataFrame] = [fine[cols + ["n"]]]
    cur = fine
    for i in range(len(cols) - 1, -1, -1):
        keep = cols[:i]
        if keep:
            cur = cur.groupby(keep, as_index=False)["n"].sum()
        else:
            tot = cur["n"].sum()
            cur = pd.DataFrame({"n": [int(tot) if int_n else float(tot)]})
        lvl = cur.copy()
        for c in cols[i:]:
            lvl[c] = ALL
        levels.append(lvl[cols + ["n"]])
    out = pd.concat(levels, ignore_index=True)
    if int_n:
        out["n"] = out["n"].astype("int64")
    return out.sort_values(cols).reset_index(drop=True)
