"""General relational pipelines over the TPC-H-ish testdata tables.

These exercise the engine's wide operators (groupby-aggregate, broadcast
join, sort/limit, windowed event aggregation) in SQL-checkable form — every
function here has a matching oracle in ``__ray_entry__.oracle_sql``.

Conventions for oracle parity:
* every aggregate/computed column is explicitly named, identically to the
  SQL alias;
* float aggregates are rounded (2 or 6 dp) on BOTH sides so summation-order
  epsilon can't flip the value hash;
* sorts carry a unique tie-break key.

Scale notes: aggregations pre-combine per batch where the key space is
small; the customer⋈orders⋈nation join broadcasts the dimension tables
(``ray.put`` once, dict probe per batch) instead of shuffling the fact
table — the SURVEY.md §2.4 J1/J2 pattern.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
import pandas as pd
from medcat_ray.ops.numeric import round_half_away
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem.

    Pre-aggregates per batch into (flag, status) partials — the combiner
    pattern — then one tiny groupby merges them."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        # pure Arrow combiner: no pandas round-trip per batch
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        g = batch.append_column("revenue", rev).group_by(
            ["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("revenue", "sum"), ("l_discount", "sum"),
             ("l_quantity", "count")])
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": g["l_quantity_sum"],
            "sum_base_price": g["l_extendedprice_sum"],
            "sum_disc_price": g["revenue_sum"],
            "sum_disc": g["l_discount_sum"],
            "count_order": g["l_quantity_count"],
        })

    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]).aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("sum_disc", alias_name="sum_disc"),
            Sum("count_order", alias_name="count_order")) \
        .to_pandas()
    merged["avg_qty"] = round_half_away(merged["sum_qty"] / merged["count_order"], 6)
    merged["avg_disc"] = round_half_away(merged["sum_disc"] / merged["count_order"], 6)
    for col in ("sum_qty", "sum_base_price", "sum_disc_price"):
        merged[col] = round_half_away(merged[col], 2)
    merged = merged.drop(columns=["sum_disc"])
    return merged.sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)


def revenue_by_nation(sf_dir: str, num_partitions: int = None) -> pd.DataFrame:
    """orders ⋈ customer ⋈ nation revenue rollup.

    Join shape for the 100× design point: customer is a FACT-SCALE
    dimension (a per-custkey broadcast dict stops fitting an object-store
    broadcast), so orders⋈customer is a hash SHUFFLE join on custkey;
    only nation — truly broadcast-sized — ships as a dict.  The joined
    stream pre-combines per batch (one partial row per nation per batch)
    before the final tiny groupby."""
    nation = pd.read_parquet(_t(sf_dir, "nation"),
                             columns=["n_nationkey", "n_name"])
    # dense-key vectorized lookup: nationkey -> name via np.take
    max_key = int(nation["n_nationkey"].max())
    name_arr = np.full(max_key + 2, "UNKNOWN", dtype=object)
    name_arr[nation["n_nationkey"].to_numpy()] = nation["n_name"].to_numpy()
    ref = ray.put(name_arr)

    if num_partitions is None:
        num_partitions = max(2, int(ray.cluster_resources()
                                    .get("CPU", 8)) // 4)
    customer = rd.read_parquet(_t(sf_dir, "customer"),
                               columns=["c_custkey", "c_nationkey"])
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])
    joined = orders.join(customer, join_type="inner",
                         num_partitions=num_partitions,
                         on=("o_custkey",), right_on=("c_custkey",))

    def partial(batch: pa.Table) -> pa.Table:
        names = ray.get(ref)
        keys = np.clip(batch["c_nationkey"].to_numpy(zero_copy_only=False),
                       0, len(names) - 1)
        g = batch.append_column(
            "n_name", pa.array(names[keys], type=pa.string())).group_by(
            "n_name").aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")])
        return pa.table({
            "n_name": g["n_name"],
            "revenue": g["o_totalprice_sum"],
            "n_orders": g["o_totalprice_count"],
        })

    out = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("n_name").aggregate(
            Sum("revenue", alias_name="revenue"),
            Sum("n_orders", alias_name="n_orders")).to_pandas()
    out["revenue"] = round_half_away(out["revenue"], 2)
    return out.sort_values("n_name").reset_index(drop=True)


def top_parts_by_price(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """sort + limit with a unique tie-break (p_partkey)."""
    ds = rd.read_parquet(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_name", "p_retailprice"])
    out = ds.sort(["p_retailprice", "p_partkey"],
                  descending=[True, False]).limit(k).to_pandas()
    out["p_retailprice"] = round_half_away(out["p_retailprice"], 2)
    return out


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate: events per (event_type, hour bucket).

    Ray Data has no event-time windows (SURVEY.md §2.9); a tumbling window
    over bounded data IS a groupby on the truncated timestamp."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        g = batch.append_column("hour", hour).group_by(
            ["event_type", "hour"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return pa.table({
            "event_type": g["event_type"],
            "hour": g["hour"],
            "n_events": g["value_count"],
            "sum_value": g["value_sum"],
        })

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hour"]).aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value")).to_pandas()
    out["sum_value"] = round_half_away(out["sum_value"], 3)
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def supplier_balance_by_nation(sf_dir: str) -> pd.DataFrame:
    """supplier ⋈ nation aggregate (small tables, broadcast pattern)."""
    nation = pd.read_parquet(_t(sf_dir, "nation"),
                             columns=["n_nationkey", "n_name"])
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    ref = ray.put(n2name)
    ds = rd.read_parquet(_t(sf_dir, "supplier"),
                         columns=["s_nationkey", "s_acctbal"])

    def enrich(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        names = pd.Series(batch["s_nationkey"].to_numpy(
            zero_copy_only=False)).map(m)
        return pa.table({"n_name": pa.array(names, type=pa.string()),
                         "s_acctbal": batch["s_acctbal"]})

    out = ds.map_batches(enrich, batch_format="pyarrow") \
        .groupby("n_name").aggregate(
            Sum("s_acctbal", alias_name="total_acctbal"),
            Count(alias_name="n_suppliers")).to_pandas()
    out["total_acctbal"] = round_half_away(out["total_acctbal"], 2)
    return out.sort_values("n_name").reset_index(drop=True)


def orders_priority_counts(sf_dir: str) -> pd.DataFrame:
    """Plain grouped count + min/max aggregate over orders."""
    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderpriority", "o_totalprice"])
    out = ds.groupby("o_orderpriority").aggregate(
        Count(alias_name="n_orders"),
        Min("o_totalprice", alias_name="min_price"),
        Max("o_totalprice", alias_name="max_price")).to_pandas()
    out["min_price"] = round_half_away(out["min_price"], 2)
    out["max_price"] = round_half_away(out["max_price"], 2)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def events_sliding(sf_dir: str, window_min: int = 60,
                   slide_min: int = 15) -> pd.DataFrame:
    """Sliding-window aggregate: per (event_type, window_start), counts/sums
    over a ``window_min`` window sliding every ``slide_min``.

    Ray-native shape: each event fans out to the window_min/slide_min
    windows that cover it (vectorized numpy bucket math), pre-combined per
    batch, then one small groupby — the exchange carries per-window partial
    rows, never per-event rows."""
    k = window_min // slide_min
    slide_us = slide_min * 60 * 1_000_000
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        # pure Arrow/numpy combiner: fan each event to its k covering
        # windows with a broadcast subtraction, no pandas round-trip
        epoch = pc.cast(batch["ts"], pa.int64()).to_numpy()     # µs
        base = (epoch // slide_us) * slide_us
        starts = (base[None, :] -
                  np.arange(k, dtype=np.int64)[:, None] * slide_us)
        et = batch["event_type"].combine_chunks()
        val = batch["value"].combine_chunks()
        fan = pa.table({
            "event_type": pa.concat_arrays([et] * k),
            "window_start": pa.array(starts.reshape(-1), type=pa.int64()),
            "value": pa.concat_arrays([val] * k),
        })
        g = fan.group_by(["event_type", "window_start"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return pa.table({
            "event_type": g["event_type"],
            "window_start": g["window_start"],
            "n_events": g["value_count"],
            "sum_value": g["value_sum"],
        })

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "window_start"]).aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value")).to_pandas()
    out["window_start"] = pd.to_datetime(out["window_start"], unit="us")
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = round_half_away(out["sum_value"], 3)
    return out.sort_values(["event_type", "window_start"]) \
        .reset_index(drop=True)


def _merge_session_runs(df: pd.DataFrame, gap: pd.Timedelta,
                        start_col: str, end_col: str) -> pd.DataFrame:
    """ONE vectorized chain-merge over rows sorted by (user, start): a new
    chain begins at a user change or a gap > ``gap`` since the previous
    row's end; aggregate per chain.  No per-user dispatch."""
    if df.empty:
        return df
    df = df.sort_values(["user_id", start_col, end_col]) \
        .reset_index(drop=True)
    new_chain = (df["user_id"] != df["user_id"].shift()) | \
        ((df[start_col] - df[end_col].shift()) > gap)
    if len(new_chain):
        new_chain.iloc[0] = True
    chain = new_chain.cumsum()
    out = df.groupby(chain).agg(
        user_id=("user_id", "first"),
        session_start=(start_col, "min"),
        session_end=(end_col, "max"),
        n_events=("n_events", "sum"),
        sum_value=("sum_value", "sum"))
    return out.reset_index(drop=True)


def _merge_sessions_distributed(sess: rd.Dataset, gap: pd.Timedelta,
                                single_block_limit: int = 2_000_000,
                                max_passes: int = 4) -> rd.Dataset:
    """Chain-merge candidate session rows WITHOUT a driver materialization.

    Each pass = sort by (user, start) + the vectorized chain-merge per
    batch; chains interior to a batch collapse, at most one split survives
    per batch boundary, so rows shrink by the events-per-session factor
    per pass.  When the table fits a single block, one final
    ``repartition(1)`` pass (whole block as one batch) makes the result
    exact — at 10^12 events the earlier passes have already collapsed
    volume by orders of magnitude before that point."""
    merge = (lambda df: _merge_session_runs(df, gap, "session_start",
                                            "session_end"))
    for _ in range(max_passes):
        sess = sess.materialize()
        if sess.count() <= single_block_limit:
            break
        sess = sess.sort(["user_id", "session_start", "session_end"]) \
            .map_batches(merge, batch_format="pandas")
    return sess.repartition(1).map_batches(merge, batch_format="pandas",
                                           batch_size=None)


def user_sessions(sf_dir: str, gap_min: int = 30) -> pd.DataFrame:
    """Sessionization: per user, events sorted by time split into sessions
    at gaps > ``gap_min`` minutes; one row per session.

    Scale shape (no per-user ``map_groups`` — one pandas call per user was
    the round-1 anti-pattern): global sort by (user_id, ts, event_id), then
    ONE vectorized shift/cumsum pass per sorted batch compresses events →
    candidate sessions; boundary-split sessions are chain-merged by
    :func:`_merge_sessions_distributed` — recursive sorted passes inside
    the object store, with a final single-block pass once the table is
    small.  No step materializes on the driver before the result."""
    gap = pd.Timedelta(minutes=gap_min)
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_id", "ts", "value"])

    def block_sessions(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "session_start", "session_end",
                "n_events", "sum_value"]
        if df.empty:
            return pd.DataFrame(columns=cols)
        new_s = (df["user_id"] != df["user_id"].shift()) | \
            ((df["ts"] - df["ts"].shift()) > gap)
        new_s.iloc[0] = True
        g = df.groupby(new_s.cumsum()).agg(
            user_id=("user_id", "first"), session_start=("ts", "min"),
            session_end=("ts", "max"), n_events=("ts", "size"),
            sum_value=("value", "sum"))
        return g.reset_index(drop=True)

    sess = ds.sort(["user_id", "ts", "event_id"]) \
        .map_batches(block_sessions, batch_format="pandas")
    out = _merge_sessions_distributed(sess, gap).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = round_half_away(out["sum_value"], 3)
    return out.sort_values(["user_id", "session_start"]) \
        .reset_index(drop=True)
