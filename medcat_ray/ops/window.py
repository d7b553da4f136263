"""Window / reshaping operators: per-key LAG deltas, exact ntile
bucketing, and categorical pivot — the remaining relational-family
primitives (DuckDB twins: ``lag() OVER``, boundary-``CASE`` bucketing,
``FILTER`` aggregates).

Scale shapes:

* ``lag_deltas`` — ONE global sort by ``(key, ts, id)``; every row
  except each block's first resolves its predecessor inside its own
  sorted block (vectorized shift), and the unresolved residual is
  exactly ONE row per block plus each block's last row — O(blocks),
  not O(rows) — resolved in a single tiny pass (the as-of join's
  bounded-residual pattern, ops/asof.py).
* ``ntile_assign`` — exact quantile boundaries from the
  cardinality-sized histogram (ops/quantiles.py), broadcast once, then
  a stateless vectorized ``searchsorted`` per batch.  No second
  shuffle.
* ``pivot_counts`` — per-block pandas crosstab partials (one row per
  distinct key per block, columns fixed by the category set) → one
  native multi-column ``groupby(key).Sum``.  The category set is
  model-sized (discovered by a groupby when not given).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum


def lag_deltas(ds: rd.Dataset, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id") -> rd.Dataset:
    """(id, key, ts, delta_us): microseconds since the key's previous
    event in ``(ts, id)`` order; ``-1`` for each key's first event
    (the twin of ``date_diff('us', lag(ts) OVER (PARTITION BY key
    ORDER BY ts, id), ts)`` with NULL → -1)."""
    out_cols = [id_col, key_col, ts_col, "delta_us"]

    def split(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=out_cols + ["pos"])
        us = df[ts_col].astype("datetime64[us]").astype("int64")
        same = df[key_col].eq(df[key_col].shift())
        delta = np.where(same, us - us.shift(fill_value=0), -1) \
            .astype("int64")
        body = pd.DataFrame({
            id_col: df[id_col], key_col: df[key_col],
            ts_col: df[ts_col].astype("datetime64[us]"),
            "delta_us": delta, "pos": 2}).iloc[1:]
        first = pd.DataFrame({
            id_col: df[id_col].iloc[:1], key_col: df[key_col].iloc[:1],
            ts_col: df[ts_col].iloc[:1].astype("datetime64[us]"),
            "delta_us": np.array([-1], dtype="int64"), "pos": 0})
        last = pd.DataFrame({
            id_col: df[id_col].iloc[-1:], key_col: df[key_col].iloc[-1:],
            ts_col: df[ts_col].iloc[-1:].astype("datetime64[us]"),
            "delta_us": np.array([-1], dtype="int64"), "pos": 1})
        return pd.concat([body, first, last], ignore_index=True)

    tagged = ds.sort([key_col, ts_col, id_col]) \
        .map_batches(split, batch_format="pandas").materialize()

    def is_body(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["pos"] == 2][out_cols]

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        """Single tiny block: every block's first row finds its global
        predecessor among the blocks' last rows.  Sorting by the global
        key with firsts (pos 0) BEFORE lasts (pos 1) at identical rows
        means a single-row block can never pick itself."""
        df = df[df["pos"] != 2]
        if df.empty:
            return pd.DataFrame(columns=out_cols)
        df = df.sort_values([key_col, ts_col, id_col, "pos"],
                            kind="stable").reset_index(drop=True)
        is_last = df["pos"].eq(1)
        prev_key = df[key_col].where(is_last).ffill().shift()
        prev_us = df[ts_col].astype("datetime64[us]").astype("int64") \
            .where(is_last).ffill().shift()
        us = df[ts_col].astype("datetime64[us]").astype("int64")
        same = prev_key.eq(df[key_col]) & prev_us.notna()
        delta = np.where(same, us - prev_us.fillna(0), -1).astype("int64")
        out = df[df["pos"] == 0].copy()
        out["delta_us"] = delta[df["pos"].to_numpy() == 0]
        return out[out_cols]

    body = tagged.map_batches(is_body, batch_format="pandas")
    residual = tagged.map_batches(
        lambda df: df[df["pos"] != 2], batch_format="pandas") \
        .repartition(1) \
        .map_batches(resolve, batch_format="pandas")
    return body.union(residual)


def ntile_assign(ds: rd.Dataset, col: str, n: int = 4,
                 keep_cols: Optional[Sequence[str]] = None) -> rd.Dataset:
    """Adds ``bucket`` in [0, n): the count of exact quantile boundaries
    ``Q(i/n), i = 1..n-1`` strictly below the row's value (duplicate
    boundaries collapse buckets, same as the SQL ``SUM(CASE b < v)``
    twin).  One histogram shuffle for the boundaries, then stateless."""
    import ray
    from medcat_ray.ops.quantiles import exact_quantiles
    qs = [i / n for i in range(1, n)]
    bounds = np.sort(exact_quantiles(ds, col, qs)["value"].to_numpy())
    b_ref = ray.put(bounds)

    def assign(batch: pa.Table) -> pa.Table:
        import ray as _ray
        b = _ray.get(b_ref)
        v = batch[col].to_numpy(zero_copy_only=False)
        bucket = np.searchsorted(b, v, side="left").astype(np.int64)
        out = batch if keep_cols is None else batch.select(list(keep_cols))
        return out.append_column("bucket", pa.array(bucket,
                                                    type=pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def pivot_counts(ds: rd.Dataset, key_col: str, cat_col: str,
                 categories: Optional[List[str]] = None) -> rd.Dataset:
    """Wide per-key category counts: one column ``n_<cat>`` per
    category.  Unknown categories are discovered with a (tiny) groupby
    first; unseen-in-batch categories stay 0."""
    from ray.data.aggregate import Count
    if categories is None:
        cats = ds.groupby(cat_col).aggregate(Count()).to_pandas()
        categories = sorted(cats[cat_col].astype(str))
    cols = [f"n_{c}" for c in categories]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=[key_col] + cols)
        ct = pd.crosstab(df[key_col], df[cat_col])
        ct = ct.reindex(columns=categories, fill_value=0)
        ct.columns = cols
        return ct.astype("int64").reset_index()

    wide = ds.map_batches(partial, batch_format="pandas") \
        .groupby(key_col) \
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
    return wide
