"""Distributed BFS levels / hierarchy depth — min-distance from a root
set over an edge list (unit weights), the KG reachability primitive
behind "how deep is this concept in the ISA hierarchy" (reference:
``pt2ch`` + ``get_all_children`` walks, ``medcat/utils/preprocess_snomed.py``
— here as a corpus-scale operator instead of a driver-side dict walk).

Same execution shape as ``ops/dedup._propagate_labels`` (min-label
propagation): each round is ONE hash join (current depths onto edge
sources) + one native groupby-Min, nothing ever leaves the object
store.  Rounds ∝ graph eccentricity from the roots — ontology
hierarchies are ~15 deep, so a handful.

Convergence needs no checksum: with synchronous unit-edge relaxation
from the full root set, a node FIRST appears in round r iff its true
distance is r, and it appears with that final value — depths never
improve afterwards.  So the materialized row count (free metadata on a
materialized dataset) is monotone and stalls exactly at the fixpoint.

Like the dedup family, resolution is auto-gated on measured volume:
a ≤ ``driver_limit``-row edge table runs a vectorized numpy BFS on the
driver (sorted-CSR frontier expansion — the per-round Ray op overhead
dwarfs tiny graphs), anything larger runs the distributed rounds.
Both paths are unit-tested equal.

The edge table is materialized once and pinned across rounds (the
pagerank lesson: never let a lazy upstream replay per iteration).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Max, Min


def hierarchy_roots(edges: rd.Dataset, src_col: str = "src",
                    dst_col: str = "dst") -> rd.Dataset:
    """Nodes that appear as a source but never as a destination — the
    hierarchy's root set.  One native groupby-Max over (node, is_child)
    rows; no driver-side sets."""
    def _emit(batch: pa.Table) -> pa.Table:
        src = batch[src_col].combine_chunks()
        dst = batch[dst_col].combine_chunks()
        return pa.table({
            "node": pa.concat_arrays([src.cast(src.type), dst.cast(src.type)]),
            "is_child": pa.concat_arrays([
                pa.array([0] * len(src), type=pa.int8()),
                pa.array([1] * len(dst), type=pa.int8())])})

    flagged = edges.map_batches(_emit, batch_format="pyarrow") \
        .groupby("node").aggregate(Max("is_child", alias_name="is_child"))

    def _roots(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.equal(batch["is_child"], 0)) \
            .select(["node"])
    return flagged.map_batches(_roots, batch_format="pyarrow")


def _bfs_driver(src: np.ndarray, dst: np.ndarray,
                roots: np.ndarray) -> pd.DataFrame:
    """Vectorized driver BFS: factorize nodes, sort edges by source
    (CSR-style), expand the frontier with searchsorted range gathers.
    ``roots`` must be sorted-unique (the caller passes ``np.unique``
    output — the prefix alignment below relies on it)."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    if len(nodes) == 0 or len(roots) == 0:
        return pd.DataFrame({"node": nodes[:0],
                             "depth": np.array([], dtype=np.int64)})
    src_i, dst_i = inv[:len(src)], inv[len(src):]
    order = np.argsort(src_i, kind="stable")
    src_s, dst_s = src_i[order], dst_i[order]
    starts = np.searchsorted(src_s, np.arange(len(nodes)))
    ends = np.searchsorted(src_s, np.arange(len(nodes)) + 1)
    dist = np.full(len(nodes), -1, dtype=np.int64)
    # roots outside the edge table's node set are dropped here; the
    # caller re-adds them at depth 0 (the distributed path keeps them)
    idx = np.searchsorted(nodes, roots)
    idx = idx[idx < len(nodes)]
    frontier = idx[nodes[idx] == roots[:len(idx)]] if len(idx) else idx
    dist[frontier] = 0
    d = 0
    while len(frontier):
        spans = [dst_s[starts[f]:ends[f]] for f in frontier]
        if spans:
            cand = np.unique(np.concatenate(spans)) \
                if len(spans) > 1 else np.unique(spans[0])
        else:
            cand = np.array([], dtype=np.int64)
        new = cand[dist[cand] == -1]
        d += 1
        dist[new] = d
        frontier = new
    mask = dist >= 0
    return pd.DataFrame({"node": nodes[mask], "depth": dist[mask]})


def bfs_levels(edges: rd.Dataset, src_col: str = "src",
               dst_col: str = "dst", roots: rd.Dataset | None = None,
               max_rounds: int = 64, num_partitions: int = 16,
               method: str = "auto",
               driver_limit: int = 5_000_000) -> rd.Dataset:
    """(node, depth) = min #edges from the root set, for every reachable
    node.  ``roots`` is a Dataset with a ``node`` column; defaults to
    :func:`hierarchy_roots`.  Unreachable nodes are absent from the
    output (both here and in the recursive-CTE SQL twin)."""
    edges = edges.materialize()
    if method == "auto":
        method = "driver" if edges.count() <= driver_limit \
            else "distributed"
    if roots is None:
        roots = hierarchy_roots(edges, src_col, dst_col)

    if method == "driver":
        edf = edges.to_pandas()
        rdf = roots.to_pandas()
        src = edf[src_col].to_numpy()
        dst = edf[dst_col].to_numpy()
        # an empty Ray dataset can round-trip to a column-less DataFrame
        rts = np.unique(rdf["node"].to_numpy()) if "node" in rdf \
            else src[:0]
        out = _bfs_driver(src, dst, rts)
        # explicit roots absent from the edge table are still depth 0
        missing = rts[~np.isin(rts, out["node"].to_numpy())] \
            if len(out) else rts
        if len(missing):
            out = pd.concat([out, pd.DataFrame(
                {"node": missing,
                 "depth": np.zeros(len(missing), dtype=np.int64)})],
                ignore_index=True)
        return rd.from_pandas(out)

    def _zero(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"],
                         "depth": pa.array([0] * batch.num_rows,
                                           type=pa.int64())})

    # repartition before the first join: groupby-derived inputs can carry
    # schema-less empty blocks that crash the join finalize (Ray 2.49)
    dist = roots.map_batches(_zero, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    prev_n = dist.count()
    if prev_n == 0:
        # empty root set: nothing reachable (and empty blocks would trip
        # the Ray 2.49 join-finalize schema bug inside the loop)
        return dist
    for _ in range(max_rounds):
        cand = edges.join(dist, join_type="inner",
                          num_partitions=num_partitions,
                          on=(src_col,), right_on=("node",)) \
            .map_batches(
                lambda b: pa.table({
                    "node": b[dst_col],
                    "depth": pa.compute.add(b["depth"], 1)}),
                batch_format="pyarrow")
        dist = dist.union(cand).groupby("node") \
            .aggregate(Min("depth", alias_name="depth")) \
            .repartition(num_partitions).materialize()
        cur_n = dist.count()   # free: metadata of a materialized dataset
        if cur_n == prev_n:
            break
        prev_n = cur_n
    else:
        raise RuntimeError(f"BFS did not converge in {max_rounds} rounds")
    return dist
