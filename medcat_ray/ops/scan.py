"""Distributed per-key prefix scan — running sums / ROW_NUMBER in one
global sort + one O(blocks) chaining pass (the SQL window twins:
``SUM(v) OVER (PARTITION BY key ORDER BY ...)``, ``ROW_NUMBER()``).

The classic two-pass scan, Ray-Data-shaped:

1. sort by ``(key, *order_cols)`` → per sorted block, a vectorized
   in-block cumulative sum; every row is tagged with its block id
   (= the block's first row's value of the unique ``id_col`` — no
   counters, no driver state), and the block-FIRST row additionally
   carries the block's boundary totals (first key's and last key's
   in-block sums) so later passes stay correct under re-batching;
2. only keys that SPAN a block boundary need an offset, and keys are
   contiguous after the sort — so the boundary table is at most TWO
   rows per block.  One tiny single-block pass orders blocks by their
   first-row sort tuple and takes per-key exclusive cumsums → an
   O(blocks) offset map, broadcast once;
3. a stateless pass adds each block-first-key row its offset.

Nothing corpus-sized ever leaves the object store; the driver holds
only the offset map (≤ 2 rows per block).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd

import ray.data as rd

_HELPERS = ["_bk", "_needs", "_btag", "_tf", "_tl", "_lk"]


def running_sum(ds: rd.Dataset, key_col: str, order_cols: Sequence[str],
                id_col: str, val_col: Optional[str] = None,
                out_col: str = "running") -> rd.Dataset:
    """Adds ``out_col``: the per-``key_col`` cumulative sum of
    ``val_col`` (or the 1-based ROW_NUMBER when ``val_col`` is None) in
    ``order_cols + [id_col]`` order (``id_col`` must be unique — it
    breaks ties and names blocks)."""
    import ray
    order = list(order_cols) + [id_col]
    sort_keys = [key_col] + order

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        # boundary totals (_tf/_tl) ride in int64 for integer inputs
        # (and row numbers) — bit-exact at ANY magnitude; float64 only
        # for genuinely float value columns
        res_int = val_col is None or \
            pd.api.types.is_integer_dtype(df[val_col])
        tot_t = "int64" if res_int else "float64"
        if df.empty:
            out[out_col] = pd.Series([], dtype=tot_t)
            for c, t in [("_bk", df[id_col].dtype), ("_needs", bool),
                         ("_btag", "int64"), ("_tf", tot_t),
                         ("_tl", tot_t), ("_lk", df[key_col].dtype)]:
                out[c] = pd.Series([], dtype=t)
            return out
        v = df[val_col].to_numpy() if val_col is not None \
            else np.ones(len(df), dtype=np.int64)
        out[out_col] = pd.Series(v, index=df.index) \
            .groupby(df[key_col].to_numpy(), sort=False).cumsum()
        first_key = df[key_col].iloc[0]
        last_key = df[key_col].iloc[-1]
        out["_bk"] = df[id_col].iloc[0]
        out["_needs"] = df[key_col].eq(first_key)
        out["_btag"] = -1
        zero = 0 if res_int else 0.0
        out["_tf"] = pd.Series(zero, index=df.index, dtype=tot_t)
        out["_tl"] = pd.Series(zero, index=df.index, dtype=tot_t)
        out["_lk"] = last_key
        cast = int if res_int else float
        out.iloc[0, out.columns.get_loc("_btag")] = 0
        out.iloc[0, out.columns.get_loc("_tf")] = cast(
            v[(df[key_col] == first_key).to_numpy()].sum())
        out.iloc[0, out.columns.get_loc("_tl")] = cast(
            v[(df[key_col] == last_key).to_numpy()].sum())
        return out

    tagged = ds.sort(sort_keys) \
        .map_batches(pass1, batch_format="pandas").materialize()

    def boundary(df: pd.DataFrame) -> pd.DataFrame:
        """Block-first rows only — re-batching safe (the totals were
        computed inside pass1's own block).  ``_fk`` carries the block
        first row's KEY: blocks must be ordered by the first row's FULL
        sort tuple (key, *order), not by order alone."""
        cols = ["_bk", "_key", "_tot", "_fk"] + order
        df = df[df["_btag"] == 0]
        if df.empty:
            return pd.DataFrame(columns=cols)
        parts = [pd.DataFrame({"_bk": df["_bk"], "_key": df[key_col],
                               "_tot": df["_tf"], "_fk": df[key_col],
                               **{c: df[c] for c in order}})]
        two = df[df["_lk"] != df[key_col]]
        if len(two):
            parts.append(pd.DataFrame(
                {"_bk": two["_bk"], "_key": two["_lk"],
                 "_tot": two["_tl"], "_fk": two[key_col],
                 **{c: two[c] for c in order}}))
        return pd.concat(parts, ignore_index=True)[cols]

    bnd = tagged.map_batches(boundary, batch_format="pandas") \
        .repartition(1).to_pandas()
    offsets = {}
    if len(bnd):
        bnd = bnd.sort_values(["_key", "_fk"] + order, kind="stable")
        bnd["_off"] = bnd.groupby("_key", sort=False)["_tot"].cumsum() \
            - bnd["_tot"]
        for bk, k, off in zip(bnd["_bk"], bnd["_key"], bnd["_off"]):
            if off != 0:
                offsets[(bk, k)] = off
    off_ref = ray.put(offsets)

    def pass2(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray
        off = _ray.get(off_ref)
        res_int = val_col is None or \
            pd.api.types.is_integer_dtype(df[val_col])
        if len(df) and off:
            present = set(df["_bk"].unique())
            # int64 adjustments for integer inputs — exact at any
            # magnitude, not just below float64's 2^53 mantissa bound
            adj = np.zeros(len(df),
                           dtype="int64" if res_int else "float64")
            zero = 0 if res_int else 0.0
            needs = df["_needs"].to_numpy()
            bks = df["_bk"].to_numpy()
            keys = df[key_col].to_numpy()
            for (bk, k), o in off.items():
                if bk in present:
                    adj += np.where(needs & (bks == bk) & (keys == k),
                                    o, zero)
            df = df.copy()
            df[out_col] = df[out_col] + adj
        df = df.drop(columns=_HELPERS)
        if res_int:
            df[out_col] = df[out_col].astype("int64")
        return df

    return tagged.map_batches(pass2, batch_format="pandas")
