"""Distributed as-of join (backward): for every left row, the right row
with the largest ``right_time <= left_time`` and the same key — the
temporal-join primitive Ray Data lacks natively (pandas ``merge_asof`` /
DuckDB ``ASOF JOIN`` semantics, equal times match).

Shape (the ``user_sessions`` pattern — no per-key ``map_groups``):

1. Union the two sides into one tagged stream (right rows sort BEFORE
   left rows at equal (key, time) so equal-time matches resolve).
2. One global ``sort([key, time, side])`` — the only wide step.
3. Per sorted block, ONE vectorized groupby-ffill pass: left rows
   preceded by a right row of their key inside the block are DONE;
   boundary-split lefts stay pending, and each block keeps only its
   LAST right row per key (the only one later blocks can need).
4. Recurse on the pending remainder (markers + unresolved lefts) —
   geometrically smaller (∝ keys-per-block-boundary, not rows) — and
   finish with an ALWAYS-exact pass over the residual: a residual that
   fits ``single_block_rows`` gathers into one block (O(keys +
   never-matching lefts) after the shrink passes); a residual still
   larger at ``max_passes`` is hash-sharded by key
   (``groupby.map_groups``) instead — the exact finalize never
   single-blocks an oversized residual.

Left rows with no preceding right row anywhere get null match columns
(left-outer semantics).  Right (key, time) pairs must be unique — the
caller pre-aggregates (as any asof engine requires for determinism).

Reference analogue: none in MedCAT (relational/temporal operator named
by the engine brief).  Oracle: DuckDB ``ASOF LEFT JOIN`` — see the
``events_asof_orders`` driver query.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

import ray.data as rd


def _mk_pass(key: str, rcols: List[str], finalize: bool,
             sort_in_block: bool):
    def _pass(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(__done=pd.Series([], dtype=bool))
        if sort_in_block:
            df = df.sort_values([key, "__t", "__side"], kind="mergesort")
        df = df.reset_index(drop=True)
        is_r = df["__side"].to_numpy() == 0
        fill = ["__rt"] + rcols
        filled = df.groupby(key, sort=False)[fill].ffill()
        lefts = ~is_r
        resolved = lefts & filled["__rt"].notna().to_numpy()
        parts = []
        res = df[resolved].copy()
        res[fill] = filled[resolved]
        res["__done"] = True
        parts.append(res)
        unres = df[lefts & ~resolved].copy()
        unres["__done"] = bool(finalize)
        parts.append(unres)
        if not finalize:
            mk = df[is_r].groupby(key, sort=False).tail(1).copy()
            mk["__done"] = False
            parts.append(mk)
        return pd.concat(parts, ignore_index=True)
    return _pass


def asof_join(left: rd.Dataset, right: rd.Dataset, key: str,
              left_time: str, right_time: str,
              right_vals: Optional[List[str]] = None,
              max_passes: int = 3,
              single_block_rows: int = 500_000) -> rd.Dataset:
    """Backward as-of join of ``left`` against ``right`` on ``key``.

    Returns the left rows plus ``asof_time`` (the matched right time,
    null if none) and each of ``right_vals`` as ``asof_<col>``."""
    right_vals = list(right_vals or [])
    rcols = [f"asof_{c}" for c in right_vals]

    def _tag_left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__t"] = df[left_time]
        df["__side"] = np.int8(1)
        df["__rt"] = pd.Series(pd.NaT, index=df.index,
                               dtype="datetime64[us]")
        for c in rcols:
            df[c] = np.nan
        return df

    def _tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({key: df[key], "__t": df[right_time],
                            "__side": np.int8(0),
                            "__rt": df[right_time]})
        for c, src in zip(rcols, right_vals):
            out[c] = df[src].astype(np.float64)
        return out

    l = left.map_batches(_tag_left, batch_format="pandas")
    r = right.map_batches(_tag_right, batch_format="pandas")
    cur = l.union(r)

    done_parts: List[rd.Dataset] = []
    for it in range(max_passes):
        cur = cur.materialize()
        n = cur.count()
        if n == 0:
            break
        # final pass is ALWAYS exact.  A residual that fits one block
        # (O(keys + unmatched) after the shrink passes) gathers into it;
        # a residual still larger than ``single_block_rows`` at the last
        # pass is NEVER repartition(1)-ed — it hash-shards by key
        # (groupby.map_groups) so the exact pass stays distributed even
        # for high-cardinality key sets where most lefts never match.
        small = n <= single_block_rows
        finalize = small or (it == max_passes - 1)
        fin_pass = _mk_pass(key, rcols, finalize=True, sort_in_block=True)
        if finalize and small:
            out = cur.repartition(1).map_batches(
                fin_pass, batch_format="pandas",
                batch_size=None).materialize()
        elif finalize:
            # sharded exact finalize: each key's rows land in one group
            out = cur.groupby(key).map_groups(
                fin_pass, batch_format="pandas").materialize()
        else:
            out = cur.sort([key, "__t", "__side"]).map_batches(
                _mk_pass(key, rcols, finalize=False, sort_in_block=False),
                batch_format="pandas", batch_size=None).materialize()

        def _take_done(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["__done"] & (df["__side"] == 1)]

        def _take_pending(df: pd.DataFrame) -> pd.DataFrame:
            return df[~df["__done"]]

        done_parts.append(
            out.map_batches(_take_done, batch_format="pandas"))
        if finalize:
            break
        cur = out.map_batches(_take_pending, batch_format="pandas")

    def _project(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=["__t", "__side", "__done"])
        return out.rename(columns={"__rt": "asof_time"})

    if not done_parts:
        # both inputs empty: the first pass breaks before any part is
        # staged; emit an empty dataset with the projected LEFT schema
        # (left columns + asof_time + asof_<col>s) instead of IndexError.
        # An empty input yields no batches for map_batches, so build the
        # empty frame on the driver from the (metadata-only) left schema.
        import pyarrow as pa
        sch = left.schema()
        base = sch.base_schema
        if not isinstance(base, pa.Schema):     # pandas-block dataset
            base = pa.schema(list(zip(sch.names, sch.types)))
        empty = base.empty_table().to_pandas()
        empty["asof_time"] = pd.Series([], dtype="datetime64[us]")
        for c in rcols:
            empty[c] = pd.Series([], dtype=np.float64)
        return rd.from_pandas(empty)

    result = done_parts[0]
    for d in done_parts[1:]:
        result = result.union(d)

    return result.map_batches(_project, batch_format="pandas")


# ---------------------------------------------------------------------------
# Range (band) join
# ---------------------------------------------------------------------------

def range_join(left: rd.Dataset, right: rd.Dataset, key: str,
               left_time: str, right_time: str,
               lower: pd.Timedelta, upper: pd.Timedelta,
               num_partitions: int = 8) -> rd.Dataset:
    """Band join: every (left, right) pair with the same key and
    ``left_time + lower <= right_time <= left_time + upper``.

    Shape: bucket time by the band width w = upper − lower; each RIGHT
    row lands in exactly one bucket, each LEFT row is replicated to the
    (at most two) buckets its band can touch, and ONE native hash join
    on (key, bucket) co-locates candidates — every true pair meets in
    exactly one bucket (no dedup needed), candidate volume is ≤ 2× the
    true join input, and the exact inequality filters per batch.  Right
    payload columns are prefixed ``r_`` (the key keeps its name).
    """
    lo_ns = int(pd.Timedelta(lower).value)
    hi_ns = int(pd.Timedelta(upper).value)
    if hi_ns <= lo_ns:
        raise ValueError("upper must exceed lower")
    w = hi_ns - lo_ns

    def _tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={c: f"r_{c}" for c in df.columns
                                 if c != key})
        rt = df[right_time].astype("datetime64[ns]").astype("int64")
        out["__b"] = rt // w
        return out

    def _replicate_left(df: pd.DataFrame) -> pd.DataFrame:
        lt = df[left_time].astype("datetime64[ns]").astype("int64")
        b0 = (lt + lo_ns) // w
        b1 = (lt + hi_ns) // w
        both = df.assign(__b=b0)
        extra = df[(b1 != b0).to_numpy()].assign(
            __b=b1[(b1 != b0).to_numpy()])
        return pd.concat([both, extra], ignore_index=True)

    l = left.map_batches(_replicate_left, batch_format="pandas")
    r = right.map_batches(_tag_right, batch_format="pandas")
    joined = l.join(r.repartition(num_partitions), join_type="inner",
                    num_partitions=num_partitions, on=(key, "__b"))

    def _exact(df: pd.DataFrame) -> pd.DataFrame:
        lt = df[left_time].astype("datetime64[ns]").astype("int64")
        rt = df[f"r_{right_time}"].astype("datetime64[ns]") \
            .astype("int64")
        d = rt - lt
        return df[(d >= lo_ns) & (d <= hi_ns)].drop(columns=["__b"])

    return joined.map_batches(_exact, batch_format="pandas")
