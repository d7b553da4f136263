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


def window_suite(ds: rd.Dataset, key_col: str = "user_id",
                 ts_col: str = "ts", id_col: str = "event_id",
                 val_col: Optional[str] = None) -> rd.Dataset:
    """LAG delta + ROW_NUMBER + running SUM over ONE shared global sort.

    The three window twins over the same ``PARTITION BY key ORDER BY
    (ts, id)`` window each cost a full sort when run separately
    (``lag_deltas``, ``running_sum`` ×2); a real pipeline wants them in
    one pass.  This sorts ONCE, computes all three vectorized inside
    each sorted block, and resolves every cross-block dependency from a
    single O(blocks) boundary table on the driver (2 marker rows per
    block — the as-of residual pattern):

    * ``delta_us`` — µs since the key's previous event, ``-1`` for a
      key's first event; only each block's FIRST row needs its
      predecessor (= some earlier block's last row).
    * ``rn`` — 1-based per-key row number; only rows of each block's
      first key need an offset (keys are contiguous after the sort).
    * ``running`` — per-key cumulative sum of ``val_col`` (omitted when
      ``val_col`` is None); same offset rule.  Integer inputs ride
      int64 end-to-end (exact at any magnitude).

    Nothing corpus-sized reaches the driver: the boundary table is ≤2
    rows per block and the broadcast offset/predecessor maps are
    O(blocks)."""
    import ray
    out_cols = [id_col, key_col, ts_col, "delta_us", "rn"]
    if val_col is not None:
        out_cols.append("running")
    res_int = True  # refined per batch below (constant across blocks)

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        r_int = val_col is None or \
            pd.api.types.is_integer_dtype(df[val_col])
        tot_t = "int64" if r_int else "float64"
        helper = [("pos", "int64"), ("_bk", df[id_col].dtype),
                  ("_needs", bool), ("_first", bool),
                  ("_lk", df[key_col].dtype),
                  ("_tf_rn", "int64"), ("_tl_rn", "int64"),
                  ("_tf_rv", tot_t), ("_tl_rv", tot_t)]
        if df.empty:
            out = pd.DataFrame({id_col: df[id_col],
                                key_col: df[key_col],
                                ts_col: df[ts_col]
                                .astype("datetime64[us]")})
            out["delta_us"] = pd.Series([], dtype="int64")
            out["rn"] = pd.Series([], dtype="int64")
            if val_col is not None:
                out["running"] = pd.Series([], dtype=tot_t)
            for c, t in helper:
                out[c] = pd.Series([], dtype=t)
            return out
        us = df[ts_col].astype("datetime64[us]").astype("int64")
        keys = df[key_col].to_numpy()
        same = df[key_col].eq(df[key_col].shift())
        ones = np.ones(len(df), dtype=np.int64)
        first_key, last_key = df[key_col].iloc[0], df[key_col].iloc[-1]
        fk_mask = (df[key_col] == first_key).to_numpy()
        lk_mask = (df[key_col] == last_key).to_numpy()
        out = pd.DataFrame({
            id_col: df[id_col], key_col: df[key_col],
            ts_col: df[ts_col].astype("datetime64[us]"),
            "delta_us": np.where(same, us - us.shift(fill_value=0), -1)
            .astype("int64"),
            "rn": pd.Series(ones, index=df.index)
            .groupby(keys, sort=False).cumsum()})
        if val_col is not None:
            v = df[val_col].to_numpy()
            out["running"] = pd.Series(v, index=df.index) \
                .groupby(keys, sort=False).cumsum()
        else:
            v = ones
        cast = int if r_int else float
        body = out.copy()
        body["pos"] = 2
        body["_bk"] = df[id_col].iloc[0]
        body["_needs"] = fk_mask
        body["_first"] = np.arange(len(df)) == 0
        body["_lk"] = last_key
        body["_tf_rn"] = 0
        body["_tl_rn"] = 0
        body["_tf_rv"] = pd.Series(0 if r_int else 0.0, index=df.index,
                                   dtype=tot_t)
        body["_tl_rv"] = body["_tf_rv"]
        # two marker rows: the block's first and last input rows, the
        # first additionally carrying the block's per-key edge totals
        mk = body.iloc[[0]].copy()
        mk["pos"] = 0
        mk["_tf_rn"] = int(fk_mask.sum())
        mk["_tl_rn"] = int(lk_mask.sum())
        mk["_tf_rv"] = cast(v[fk_mask].sum())
        mk["_tl_rv"] = cast(v[lk_mask].sum())
        last = body.iloc[[-1]].copy()
        last["pos"] = 1
        return pd.concat([body, mk, last], ignore_index=True)

    tagged = ds.sort([key_col, ts_col, id_col]) \
        .map_batches(pass1, batch_format="pandas").materialize()

    bnd = tagged.map_batches(lambda df: df[df["pos"] != 2],
                             batch_format="pandas").to_pandas()
    offsets: dict = {}
    deltas: dict = {}
    if len(bnd):
        res_int = str(bnd["_tf_rv"].dtype) == "int64"
        # (a) predecessor deltas for block-first rows: order firsts
        # BEFORE lasts at identical rows so a 1-row block never picks
        # itself (ops/window.py:resolve invariant)
        d = bnd.sort_values([key_col, ts_col, id_col, "pos"],
                            kind="stable").reset_index(drop=True)
        is_last = d["pos"].eq(1)
        prev_key = d[key_col].where(is_last).ffill().shift()
        dus = d[ts_col].astype("datetime64[us]").astype("int64")
        prev_us = dus.where(is_last).ffill().shift()
        same = prev_key.eq(d[key_col]) & prev_us.notna()
        dv = np.where(same, dus - prev_us.fillna(0), -1).astype("int64")
        f = d["pos"].to_numpy() == 0
        deltas = dict(zip(d.loc[f, "_bk"], dv[f]))
        # (b) per-(block, key) exclusive offsets for rn / running
        # (ops/scan.py boundary algorithm, run once per metric)
        mk = bnd[bnd["pos"] == 0]
        for metric, tf, tl in (("rn", "_tf_rn", "_tl_rn"),
                               ("rv", "_tf_rv", "_tl_rv")):
            parts = [pd.DataFrame({
                "_bk": mk["_bk"], "_key": mk[key_col], "_tot": mk[tf],
                "_fk": mk[key_col], "_ts": mk[ts_col],
                "_id": mk[id_col]})]
            two = mk[mk["_lk"] != mk[key_col]]
            if len(two):
                parts.append(pd.DataFrame({
                    "_bk": two["_bk"], "_key": two["_lk"],
                    "_tot": two[tl], "_fk": two[key_col],
                    "_ts": two[ts_col], "_id": two[id_col]}))
            t = pd.concat(parts, ignore_index=True) \
                .sort_values(["_key", "_fk", "_ts", "_id"], kind="stable")
            off = t.groupby("_key", sort=False)["_tot"].cumsum() \
                - t["_tot"]
            for bk, k, o in zip(t["_bk"], t["_key"], off):
                if o != 0:
                    offsets.setdefault(metric, {})[(bk, k)] = o
    ref = ray.put((offsets, deltas, res_int))

    def pass2(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        off, dmap, r_int = _ray.get(ref)
        df = df[df["pos"] == 2]
        if df.empty:
            return df[out_cols]
        df = df.copy()
        first = df["_first"].to_numpy(bool)
        if dmap and first.any():
            bks = df["_bk"].to_numpy()
            df.loc[first, "delta_us"] = np.array(
                [dmap.get(bk, -1) for bk in bks[first]], dtype="int64")
        targets = [("rn", "rn")]
        if val_col is not None:
            targets.append(("rv", "running"))
        if off:
            present = set(df["_bk"].unique())
            needs = df["_needs"].to_numpy()
            bks = df["_bk"].to_numpy()
            keys = df[key_col].to_numpy()
            for metric, col in targets:
                m_off = off.get(metric, {})
                use_int = metric == "rn" or r_int
                adj = np.zeros(len(df),
                               dtype="int64" if use_int else "float64")
                zero = 0 if use_int else 0.0
                for (bk, k), o in m_off.items():
                    if bk in present:
                        adj += np.where(needs & (bks == bk) & (keys == k),
                                        o, zero)
                df[col] = df[col] + adj
        df["rn"] = df["rn"].astype("int64")
        if val_col is not None and r_int:
            df["running"] = df["running"].astype("int64")
        return df[out_cols]

    return tagged.map_batches(pass2, batch_format="pandas")


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
