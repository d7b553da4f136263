"""Distributed BFS levels / hierarchy depth — min-distance from a root
set over an edge list (unit weights), the KG reachability primitive
behind "how deep is this concept in the ISA hierarchy" (reference:
``pt2ch`` + ``get_all_children`` walks, ``medcat/utils/preprocess_snomed.py``
— here as a corpus-scale operator instead of a driver-side dict walk).

Same execution shape as ``ops/dedup._propagate_labels`` (min-label
propagation): Bellman-Ford with unit edges — each round is ONE hash join
(current depths onto edge sources) + one native groupby-Min, nothing
ever leaves the object store, and convergence is detected by the same
bounded-hash checksum (depths are monotone non-increasing per node and
nodes only get added, so an unchanged Sum means a fixpoint up to a
~2^-43 collision).  Rounds ∝ graph eccentricity from the roots —
ontology hierarchies are ~15 deep, so a handful.

The edge table is materialized once and pinned across rounds (the
pagerank lesson: never let a lazy upstream replay per iteration).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum

from medcat_ray.ops.hashing import stable_u64

_CKSUM_MOD = 1_000_003


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


def bfs_levels(edges: rd.Dataset, src_col: str = "src",
               dst_col: str = "dst", roots: rd.Dataset | None = None,
               max_rounds: int = 64,
               num_partitions: int = 16) -> rd.Dataset:
    """(node, depth) = min #edges from the root set, for every reachable
    node.  ``roots`` is a Dataset with a ``node`` column; defaults to
    :func:`hierarchy_roots`.  Unreachable nodes are absent from the
    output (both here and in the recursive-CTE SQL twin)."""
    edges = edges.materialize()
    if roots is None:
        roots = hierarchy_roots(edges, src_col, dst_col)

    def _zero(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"],
                         "depth": pa.array([0] * batch.num_rows,
                                           type=pa.int64())})

    def _cksum(batch: pa.Table) -> pa.Table:
        vals = [stable_u64(f"{n}\x00{d}".encode()) % _CKSUM_MOD
                for n, d in zip(batch["node"].to_pylist(),
                                batch["depth"].to_pylist())]
        return pa.table({"cksum": pa.array(vals, type=pa.int64())})

    def checksum(ds: rd.Dataset) -> int:
        return ds.map_batches(_cksum, batch_format="pyarrow") \
            .aggregate(Sum("cksum"))["sum(cksum)"]

    # repartition before the first join: groupby-derived inputs can carry
    # schema-less empty blocks that crash the join finalize (Ray 2.49)
    dist = roots.map_batches(_zero, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    if dist.count() == 0:
        # empty root set: nothing reachable (and empty blocks would trip
        # the Ray 2.49 join-finalize schema bug inside the loop)
        return dist
    prev_sum = checksum(dist)
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
        cur_sum = checksum(dist)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(f"BFS did not converge in {max_rounds} rounds")
    return dist
