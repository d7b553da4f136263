"""Triangle counting over an undirected edge list (graph clustering
structure for the concept co-occurrence KG).  No analogue in the
reference; classic graph analytics, implemented as the standard
two-join plan:

  canonical edges (a < b)
    ⋈ on b → wedges (a < b < c)
    ⋈ closing edge (a, c) → triangles

Scale shape: both joins are hash joins keyed by vertex / vertex-pair —
nothing driver-sized anywhere; the wedge stream is Σ deg(v)² which is
the irreducible cost of exact triangle listing (at web scale, cap it
upstream by degree-thresholding hub vertices before calling this).
Joins are materialized stage-by-stage — Ray 2.49 aggregator actors
deadlock when two joins run concurrently in one streaming plan (see
verify skill notes), and a groupby's empty blocks need a repartition
before each join.

Output: per-vertex triangle counts (node, triangles) — each triangle
increments all three of its corners.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum


def triangle_counts(edges: rd.Dataset, src_col: str = "src",
                    dst_col: str = "dst",
                    num_partitions: int = 4) -> rd.Dataset:
    """(node, triangles) for every vertex in ≥1 triangle."""
    def canonical(batch: pa.Table) -> pa.Table:
        a = batch[src_col].combine_chunks()
        b = batch[dst_col].combine_chunks()
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        keep = pc.invert(pc.equal(lo, hi))     # drop self-loops
        return pa.table({"a": lo.filter(keep), "b": hi.filter(keep)})

    # distinct canonical edges (a < b)
    canon = edges.map_batches(canonical, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["a", "b"]),
                     batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    if canon.count() == 0:
        return rd.from_items([])

    # wedges a-b-c with a<b<c: join (a,b) with (b,c) on the middle vertex
    def as_mid(batch: pa.Table) -> pa.Table:
        return pa.table({"m": batch["a"], "c": batch["b"]})

    mids = canon.map_batches(as_mid, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    wedges = canon.join(mids, join_type="inner",
                        num_partitions=num_partitions,
                        on=("b",), right_on=("m",)).materialize()

    # close the wedge: (a, c) must be a canonical edge
    def as_close(batch: pa.Table) -> pa.Table:
        return pa.table({"ca": batch["a"], "cb": batch["b"],
                         "hit": pa.array(np.ones(batch.num_rows,
                                                 dtype=np.int64))})

    closers = canon.map_batches(as_close, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    tri = wedges.join(closers, join_type="inner",
                      num_partitions=num_partitions,
                      on=("a", "c"), right_on=("ca", "cb")).materialize()

    # one row per triangle (a<b<c); credit all three corners
    def corners(batch: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays([batch["a"].combine_chunks(),
                                  batch["b"].combine_chunks(),
                                  batch["c"].combine_chunks()])
        return pa.table({"node": nodes,
                         "t": pa.array(np.ones(len(nodes),
                                               dtype=np.int64))})

    return tri.map_batches(corners, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("t", alias_name="triangles"))
