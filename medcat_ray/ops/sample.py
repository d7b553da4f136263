"""Deterministic mixture sampling: keep each row with a per-source
probability (the "data mixing weights" step of LLM corpus construction —
GPT-3/Pile-style source reweighting), decided by pure hash arithmetic so
the sample is reproducible, shuffle-free, and exactly recomputable by a
SQL oracle.

A row with id ``i`` and source ``s`` survives iff
``mix64((i·P + seed) mod 2^64) < round(rate(s)·2^64)`` — i.e. a
splitmix64-finalized uniform draw in [0, 2^64) compared against the
source's integer threshold.  No RNG state, no coordination: every worker
decides locally, so the operator is a single stateless ``map_batches``
at any scale.

Reference analogue: none in MedCAT (LLM-training-data operator); the
hash-threshold technique matches ops/split.py's hash split.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from medcat_ray.ops.hashing import _POLY_BASE, _mix64

_TWO64 = 1 << 64


def rate_thresholds(rates: Dict[str, float]) -> Dict[str, int]:
    """Integer keep-thresholds from per-source rates: round(rate·2^64),
    clamped to [0, 2^64].  The SQL oracle must be generated from THESE
    integers (see ``stratified_sample_oracle_sql``) so both sides compare
    against identical constants."""
    out = {}
    for k, r in rates.items():
        t = int(round(r * _TWO64))
        out[k] = min(max(t, 0), _TWO64)
    return out


def stratified_sample(ds: rd.Dataset, rates: Dict[str, float],
                      key_col: str = "source", id_col: str = "doc_id",
                      seed: int = 1) -> rd.Dataset:
    """Filter ``ds`` to a deterministic per-source sample.  Sources
    missing from ``rates`` are dropped (rate 0)."""
    thr = rate_thresholds(rates)
    thr_ref = ray.put(thr)
    seed_u = np.uint64(seed)

    def _keep(batch: pa.Table) -> pa.Table:
        t = ray.get(thr_ref)
        ids = batch[id_col].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = _mix64(ids * _POLY_BASE + seed_u)
        keys = batch[key_col].to_pylist()
        lo = np.fromiter((min(t.get(k, 0), _TWO64 - 1) for k in keys),
                         dtype=np.uint64, count=len(keys))
        full = np.fromiter((t.get(k, 0) >= _TWO64 for k in keys),
                           dtype=bool, count=len(keys))
        return batch.filter(pa.array(full | (h < lo)))

    return ds.map_batches(_keep, batch_format="pyarrow")


def stratified_sample_oracle_sql(rates: Dict[str, float],
                                 table: str = "documents",
                                 key_col: str = "source",
                                 id_col: str = "doc_id",
                                 seed: int = 1) -> str:
    """DuckDB twin: identical mix64 arithmetic and identical integer
    thresholds; emits the surviving (id, key) rows."""
    from medcat_ray.ops.sql_oracle import _M64, _P, mix64_staged
    thr = rate_thresholds(rates)
    vals = ", ".join(f"('{k}', {v}::HUGEINT)" for k, v in
                     sorted(thr.items()))
    h = mix64_staged(table, f"{id_col}, {key_col}",
                     f"(CAST({id_col} AS HUGEINT) * {_P} + {seed})"
                     f" % {_M64}", "hv")
    return f"""
WITH h AS ({h}),
rates({key_col}, thr) AS (VALUES {vals})
SELECT h.{id_col}, h.{key_col}
FROM h JOIN rates r USING ({key_col})
WHERE h.hv < r.thr"""


def sample_exact_n(ds: rd.Dataset, n: int, id_col: str = "doc_id",
                   seed: int = 1):
    """Deterministic uniform sample of EXACTLY ``n`` rows: rank every
    row by ``mix64(id·P + seed)`` and keep the n smallest — equivalent
    to a seeded shuffle + LIMIT n, but shuffle-free: each block keeps
    its n smallest locally (argpartition) and the driver merges the
    ≤ blocks·n survivors (sample sizes fit a driver by definition).
    Ties (64-bit collisions) break by id.  Returns a pandas DataFrame
    of the selected rows plus their ``sample_rank`` (0-based).

    SQL twin: ORDER BY the identical mix64 expression, LIMIT n — see
    the ``doc_sample_n`` driver query."""
    import pandas as pd
    seed_u = np.uint64(seed)

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = _mix64(ids * _POLY_BASE + seed_u)
        k = min(n, len(ids))
        if k == 0:
            return batch.append_column("__h",
                                       pa.array([], type=pa.uint64()))
        keep = np.argpartition(h, k - 1)[:k]
        return (batch.take(pa.array(np.sort(keep)))
                .append_column("__h", pa.array(h[np.sort(keep)],
                                               type=pa.uint64())))

    part = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    part = part.sort_values(["__h", id_col]).head(n) \
        .reset_index(drop=True)
    part["sample_rank"] = pd.Series(range(len(part)), dtype="int64")
    return part.drop(columns=["__h"])


def sample_exact_n_oracle_sql(n: int, table: str = "documents",
                              id_col: str = "doc_id",
                              cols: str = "doc_id, source",
                              seed: int = 1) -> str:
    """DuckDB twin of :func:`sample_exact_n` over ``table``."""
    from medcat_ray.ops.sql_oracle import _M64, _P, mix64_staged
    h = mix64_staged(table, cols,
                     f"(CAST({id_col} AS HUGEINT) * {_P} + {seed})"
                     f" % {_M64}", "hv")
    return f"""
WITH h AS ({h}),
ranked AS (SELECT {cols},
                  row_number() OVER (ORDER BY hv, {id_col}) - 1
                      AS sample_rank
           FROM h)
SELECT {cols}, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank < {n}"""


def sample_n_per_group(ds, n: int, group_col: str = "source",
                       id_col: str = "doc_id", seed: int = 1):
    """Deterministic sample of EXACTLY ``n`` rows PER GROUP (the
    eval-set construction step: "N held-out docs per source/language").

    Same seeded hash ranking as :func:`sample_exact_n`, applied within
    each group: each block keeps its n smallest-hash rows per group
    (vectorized lexsort + segment heads — no per-group Python), the
    driver merges ≤ blocks·groups·n survivors.  Groups with fewer than
    n rows keep all of them.  Returns pandas with ``sample_rank``
    (0-based within group).

    SQL twin: ROW_NUMBER() OVER (PARTITION BY group ORDER BY hash, id)
    — :func:`sample_n_per_group_oracle_sql`, driver query
    ``doc_sample_per_source``."""
    import pandas as pd
    import pyarrow as pa
    seed_u = np.uint64(seed)

    def _partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.uint64)
        if len(ids) == 0:
            return batch.append_column("__h",
                                       pa.array([], type=pa.uint64()))
        with np.errstate(over="ignore"):
            h = _mix64(ids * _POLY_BASE + seed_u)
        grp = batch[group_col].to_numpy(zero_copy_only=False)
        # group-wise top-n by hash without per-group Python: sort by
        # (group, hash, id), then keep positions whose within-group
        # ordinal < n
        codes, _ = pd.factorize(grp, sort=False)
        order = np.lexsort((ids, h, codes))
        gsorted = codes[order]
        starts = np.r_[0, np.flatnonzero(np.diff(gsorted)) + 1]
        ordinal = np.arange(len(order)) - np.repeat(
            starts, np.diff(np.r_[starts, len(order)]))
        keep = np.sort(order[ordinal < n])
        return (batch.take(pa.array(keep))
                .append_column("__h", pa.array(h[keep],
                                               type=pa.uint64())))

    part = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    part = part.sort_values(["__h", id_col]) \
        .groupby(group_col, sort=False).head(n)
    part = part.sort_values([group_col, "__h", id_col]) \
        .reset_index(drop=True)
    part["sample_rank"] = part.groupby(group_col, sort=False) \
        .cumcount().astype("int64")
    return part.drop(columns=["__h"]) \
        .sort_values([group_col, "sample_rank"]).reset_index(drop=True)


def sample_n_per_group_oracle_sql(n: int, table: str = "documents",
                                  group_col: str = "source",
                                  id_col: str = "doc_id",
                                  cols: str = "doc_id, source",
                                  seed: int = 1) -> str:
    """DuckDB twin of :func:`sample_n_per_group`."""
    from medcat_ray.ops.sql_oracle import _M64, _P, mix64_staged
    h = mix64_staged(table, cols,
                     f"(CAST({id_col} AS HUGEINT) * {_P} + {seed})"
                     f" % {_M64}", "hv")
    return f"""
WITH h AS ({h}),
ranked AS (SELECT {cols},
                  row_number() OVER (PARTITION BY {group_col}
                                     ORDER BY hv, {id_col}) - 1
                      AS sample_rank
           FROM h)
SELECT {cols}, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank < {n}
ORDER BY {group_col}, sample_rank"""
