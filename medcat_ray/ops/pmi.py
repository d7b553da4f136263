"""PMI / NPMI edge scoring over a co-occurrence pair-count table — the
standard knowledge-graph edge-weighting step (Church & Hanks 1990;
Bouma 2009 for the normalized form): raw co-occurrence counts overweight
frequent concepts, PMI corrects by the marginals.

Input: a pair-count table ``(subj, obj, count)`` — e.g. the output of
``pipelines.kg.triple_counts`` — NOT the raw corpus; the expensive
distributed work (annotate → per-block partial counts → merge) already
happened upstream, and this operator adds only vocabulary-sized
aggregates on top:

1. ``T`` (total pair weight) and the row/column marginals
   ``c_s = Σ_o count(s,o)``, ``c_o = Σ_s count(s,o)`` — two native
   groupby-Sums whose outputs are VOCABULARY-sized (distinct subjects /
   objects), far smaller than the pair table;
2. attach marginals to every pair row: broadcast dict probe when the
   measured marginal cardinality is small (one ``ray.put``, zero
   shuffle), else two hash joins (each gated to ``cpus // 4``
   aggregator partitions and separated by a repartition — the Ray 2.49
   empty-block/join workaround, see ops/dedup.py:_propagate_labels);
3. stateless vectorized log math per batch:

   ``pmi  = ln(count · T / (c_s · c_o))``
   ``npmi = pmi / (-ln(count / T))``   (``1.0`` when count == T — the
   single-edge limit where the denominator vanishes).

Scale shape: nothing corpus-sized reaches the driver — the only
driver-resident state is the broadcast marginal maps, and only when
measured small; the join path keeps everything in the object store.

Reference analogue: none in MedCAT (the reference stops at raw
co-occurrence counts); this is a training-data / KG-quality operator.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum


def pmi_edges(pairs: rd.Dataset, subj_col: str = "subj_cui",
              obj_col: str = "obj_cui", count_col: str = "count",
              method: str = "auto", broadcast_limit: int = 2_000_000,
              num_partitions: Optional[int] = None) -> rd.Dataset:
    """Adds ``pmi`` and ``npmi`` columns to a pair-count table.

    ``method``: ``"broadcast"`` forces the dict-probe path,
    ``"join"`` the two-hash-join path, ``"auto"`` (default) picks by
    the MEASURED marginal cardinality vs ``broadcast_limit``.
    """
    import ray
    pairs = pairs.materialize()
    agg = pairs.aggregate(Sum(count_col, alias_name="t"))
    if not agg or agg.get("t") is None:
        # Sum yields t=None both for an EMPTY dataset (fine: pass the
        # empty stream through with empty score columns) and for a
        # non-empty dataset whose count column is all-null (fail loud —
        # scores would be undefined on real rows)
        if pairs.count() > 0:
            raise ValueError(
                f"pmi_edges: '{count_col}' sums to NULL over a non-empty "
                "pair table (all-null counts?)")
        return pairs.map_batches(_empty_scores(subj_col, obj_col,
                                               count_col),
                                 batch_format="pyarrow")
    total = int(agg["t"])
    row_m = pairs.groupby(subj_col) \
        .aggregate(Sum(count_col, alias_name="c_s")).materialize()
    col_m = pairs.groupby(obj_col) \
        .aggregate(Sum(count_col, alias_name="c_o")).materialize()
    if method == "auto":
        n_marg = row_m.count() + col_m.count()
        method = "broadcast" if n_marg <= broadcast_limit else "join"

    if method == "broadcast":
        rt = row_m.to_pandas()
        ct = col_m.to_pandas()
        ref = ray.put((dict(zip(rt[subj_col], rt["c_s"])),
                       dict(zip(ct[obj_col], ct["c_o"]))))

        def attach(batch: pa.Table) -> pa.Table:
            import ray as _ray
            rs, cs = _ray.get(ref)
            c_s = np.array([rs[s] for s in
                            batch[subj_col].to_pylist()], dtype=np.float64)
            c_o = np.array([cs[o] for o in
                            batch[obj_col].to_pylist()], dtype=np.float64)
            return _score(batch, count_col, total, c_s, c_o)

        return pairs.map_batches(attach, batch_format="pyarrow")

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 4)
    p = num_partitions
    # sequential joins, each preceded by a repartition: rebuilds the
    # schema-less empty blocks a groupby can emit (Ray 2.49), and the
    # joins never run concurrently in one plan (aggregator-actor CPU
    # deadlock, see .claude/skills/verify round-2 gotchas)
    with_rs = pairs.join(row_m.repartition(p), join_type="inner",
                         num_partitions=p, on=(subj_col,)).materialize()
    joined = with_rs.repartition(p) \
        .join(col_m.repartition(p), join_type="inner",
              num_partitions=p, on=(obj_col,))

    def finish(batch: pa.Table) -> pa.Table:
        c_s = batch["c_s"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        c_o = batch["c_o"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return _score(batch.drop_columns(["c_s", "c_o"]),
                      count_col, total, c_s, c_o)

    return joined.map_batches(finish, batch_format="pyarrow")


def _score(batch: pa.Table, count_col: str, total: int,
           c_s: np.ndarray, c_o: np.ndarray) -> pa.Table:
    c = batch[count_col].to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    if len(c) == 0:
        return batch.append_column("pmi", pa.array([], pa.float64())) \
            .append_column("npmi", pa.array([], pa.float64()))
    pmi = np.log(c * float(total) / (c_s * c_o))
    p_pair = c / float(total)
    with np.errstate(divide="ignore", invalid="ignore"):
        npmi = np.where(p_pair >= 1.0, 1.0, pmi / -np.log(p_pair))
    return batch.append_column("pmi", pa.array(pmi, pa.float64())) \
        .append_column("npmi", pa.array(npmi, pa.float64()))


def _empty_scores(subj_col: str, obj_col: str, count_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column("pmi", pa.array([], pa.float64())) \
            .append_column("npmi", pa.array([], pa.float64()))
    return fn
