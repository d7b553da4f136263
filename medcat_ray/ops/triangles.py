"""Triangle counting over an undirected edge list (graph clustering
structure for the concept co-occurrence KG).  No analogue in the
reference; classic graph analytics, implemented with the standard
DEGREE-ORDERED orientation (compact-forward / Latapy):

  canonical edges (a < b)
    → orient each edge from its lower-(degree, id) endpoint to the
      higher one, so every vertex's OUT-degree is ≤ O(√m)
    ⋈ self-join on the tail → wedges (u→v, u→w), rank(v) < rank(w)
    ⋈ closing oriented edge (v→w) → each triangle found EXACTLY once
      (at its lowest-rank corner)

Scale shape: all joins are hash joins keyed by vertex / vertex-pair —
nothing driver-sized anywhere.  The orientation bounds the wedge
stream at Σ outdeg(v)² = O(m^1.5) instead of the naive Σ deg(v)²,
which is what defuses Zipf-skewed hubs (a pure hub/star vertex has
out-degree ~0 after orientation, so it contributes no wedges at all —
the head-CUI skew case, SURVEY §7.3).  ``max_degree`` additionally
DROPS vertices above a degree threshold up front (one native
groupby-count), giving the degree-bounded-subgraph approximation when
even the oriented plan is too hot.

Joins are materialized stage-by-stage — Ray 2.49 aggregator actors
deadlock when two joins run concurrently in one streaming plan (see
verify skill notes), and a groupby's empty blocks need a repartition
before each join.

Output: per-vertex triangle counts (node, triangles) — each triangle
increments all three of its corners.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Sum


def _rank_lt(da, na, db, nb):
    """Arrow bool array: (deg_a, node_a) < (deg_b, node_b) lexicographic —
    the orientation total order (degree, then id as tie-break)."""
    return pc.or_(pc.less(da, db),
                  pc.and_(pc.equal(da, db), pc.less(na, nb)))


def _triangles_driver(a: np.ndarray, b: np.ndarray,
                      max_degree: Optional[int]) -> "pd.DataFrame":
    """Vectorized-ish driver twin (the ``bfs_levels`` gate shape): same
    degree orientation, adjacency as per-tail sorted head arrays,
    wedge-closure via np.isin against each tail's out-neighbors."""
    import pandas as pd
    deg: dict = {}
    for u, v in zip(a, b):
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    if max_degree is not None:
        keep = {u for u, d in deg.items() if d <= max_degree}
        mask = np.array([u in keep and v in keep for u, v in zip(a, b)])
        a, b = a[mask], b[mask]
    rank = lambda u: (deg[u], u)                    # noqa: E731
    out: dict = {}
    for u, v in zip(a, b):
        t, h = (u, v) if rank(u) < rank(v) else (v, u)
        out.setdefault(t, []).append(h)
    adj = {t: np.array(sorted(hs, key=rank), dtype=object)
           for t, hs in out.items()}
    counts: dict = {}
    for t, hs in adj.items():
        for i, v in enumerate(hs[:-1]):             # rank(v) < rank(w)
            ws = hs[i + 1:]
            vout = adj.get(v)
            if vout is None:
                continue
            closed = ws[np.isin(ws, vout)]
            for w in closed:
                for n in (t, v, w):
                    counts[n] = counts.get(n, 0) + 1
    nodes = sorted(counts)
    return pd.DataFrame({"node": nodes,
                         "triangles": [counts[n] for n in nodes]})


def triangle_counts(edges: rd.Dataset, src_col: str = "src",
                    dst_col: str = "dst",
                    num_partitions: int = 4,
                    max_degree: Optional[int] = None,
                    broadcast_limit: int = 5_000_000,
                    method: str = "auto",
                    driver_limit: int = 50_000) -> rd.Dataset:
    """(node, triangles) for every vertex in ≥1 triangle.

    ``max_degree``: if set, vertices with degree > ``max_degree`` are
    dropped before counting (one groupby-count pass) — the result is the
    exact triangle count of the degree-bounded subgraph.  Leave None for
    the exact full-graph count (the degree orientation already bounds
    the wedge volume at O(m^1.5)).

    Like ``bfs_levels``, resolution auto-gates on MEASURED volume: a
    ≤ ``driver_limit``-edge canonical table runs the same oriented
    algorithm on the driver (the 4-join distributed plan costs ~10
    barrier ops of pure fixed overhead on a small graph), anything
    larger runs the distributed joins.  Both paths unit-tested equal.
    The default limit is deliberately conservative (50k edges): the
    driver twin's wedge closure is interpreted Python + per-tail
    np.isin — near-instant at 10^4 edges but a single-threaded cliff
    well before 10^6 — while the distributed plan's fixed overhead is
    seconds regardless of size."""
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

    if method == "auto":
        method = "driver" if canon.count() <= driver_limit \
            else "distributed"
    if method == "driver":
        cdf = canon.to_pandas()
        out = _triangles_driver(cdf["a"].to_numpy(), cdf["b"].to_numpy(),
                                max_degree)
        if len(out) == 0:
            return rd.from_items([])
        return rd.from_pandas(out)

    # per-vertex degree over the distinct canonical edges (one groupby)
    def _ends(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks()
        b = batch["b"].combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b.cast(a.type)]),
                         "d": pa.array(np.ones(2 * batch.num_rows,
                                               dtype=np.int64))})

    deg = canon.map_batches(_ends, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("d", alias_name="deg")) \
        .repartition(num_partitions).materialize()

    if max_degree is not None:
        def _ok(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.less_equal(batch["deg"], max_degree))
        deg = deg.map_batches(_ok, batch_format="pyarrow") \
            .repartition(num_partitions).materialize()
        if deg.count() == 0:
            return rd.from_items([])

    # attach degrees to both endpoints — auto-gated like the dedup
    # family: a node-sized degree table (≤ broadcast_limit, the CDB-scale
    # case) is ray.put once and probed per batch (searchsorted, no
    # shuffle); an open-world node set falls back to two hash joins,
    # which with max_degree also drop hub-incident edges for free
    if deg.count() <= broadcast_limit:
        import ray
        ddf = deg.to_pandas()
        order = np.argsort(ddf["node"].to_numpy())
        deg_ref = ray.put((ddf["node"].to_numpy()[order],
                           ddf["deg"].to_numpy()[order]))

        def attach(batch: pa.Table) -> pa.Table:
            import ray as _ray
            nodes_s, degs_s = _ray.get(deg_ref)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            ia = np.searchsorted(nodes_s, a)
            ib = np.searchsorted(nodes_s, b)
            if max_degree is not None:
                # dropped hubs are absent from the table: prune their edges
                ia = np.minimum(ia, len(nodes_s) - 1)
                ib = np.minimum(ib, len(nodes_s) - 1)
                keep = (nodes_s[ia] == a) & (nodes_s[ib] == b)
                batch = batch.filter(pa.array(keep))
                a, b, ia, ib = a[keep], b[keep], ia[keep], ib[keep]
            return pa.table({"a": batch["a"], "b": batch["b"],
                             "da": pa.array(degs_s[ia], type=pa.int64()),
                             "db": pa.array(degs_s[ib], type=pa.int64())})

        with_deg = canon.map_batches(attach, batch_format="pyarrow") \
            .repartition(num_partitions).materialize()
    else:
        def _deg_as(node: str, out: str):
            def f(batch: pa.Table) -> pa.Table:
                return pa.table({node: batch["node"], out: batch["deg"]})
            return f

        with_da = canon.join(
            deg.map_batches(_deg_as("na", "da"), batch_format="pyarrow")
               .repartition(num_partitions).materialize(),
            join_type="inner", num_partitions=num_partitions,
            on=("a",), right_on=("na",)).materialize()
        with_deg = with_da.join(
            deg.map_batches(_deg_as("nb", "db"), batch_format="pyarrow")
               .repartition(num_partitions).materialize(),
            join_type="inner", num_partitions=num_partitions,
            on=("b",), right_on=("nb",)).materialize()

    # orient: tail = lower (degree, id) endpoint, head = higher —
    # out-degree is then ≤ O(√m) for every vertex
    def orient(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks()
        b = batch["b"].combine_chunks()
        da = batch["da"].combine_chunks()
        db = batch["db"].combine_chunks()
        fwd = _rank_lt(da, a, db, b)
        return pa.table({
            "t": pc.if_else(fwd, a, b), "h": pc.if_else(fwd, b, a),
            "dt": pc.if_else(fwd, da, db), "dh": pc.if_else(fwd, db, da)})

    oriented = with_deg.map_batches(orient, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    # wedges (u→v, u→w) with rank(v) < rank(w): self-join on the tail
    def as_second(batch: pa.Table) -> pa.Table:
        return pa.table({"t2": batch["t"], "w": batch["h"],
                         "dw": batch["dh"]})

    second = oriented.map_batches(as_second, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    wedges = oriented.join(second, join_type="inner",
                           num_partitions=num_partitions,
                           on=("t",), right_on=("t2",)).materialize()

    def ordered(batch: pa.Table) -> pa.Table:
        keep = _rank_lt(batch["dh"].combine_chunks(),
                        batch["h"].combine_chunks(),
                        batch["dw"].combine_chunks(),
                        batch["w"].combine_chunks())
        out = batch.filter(keep)
        return pa.table({"u": out["t"], "v": out["h"], "wv": out["w"]})

    wedges = wedges.map_batches(ordered, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    if wedges.count() == 0:     # no wedges -> no triangles (and empty
        return rd.from_items([])  # blocks would trip the Ray 2.49 join)

    # close the wedge: (v, w) must be an oriented edge (rank(v)<rank(w)
    # on both sides, so the oriented table matches directly)
    def as_close(batch: pa.Table) -> pa.Table:
        return pa.table({"cv": batch["t"], "cw": batch["h"]})

    closers = oriented.map_batches(as_close, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()
    tri = wedges.join(closers, join_type="inner",
                      num_partitions=num_partitions,
                      on=("v", "wv"), right_on=("cv", "cw")).materialize()

    # one row per triangle (u, v, w distinct corners, found once);
    # credit all three corners
    def corners(batch: pa.Table) -> pa.Table:
        u = batch["u"].combine_chunks()
        nodes = pa.concat_arrays([u,
                                  batch["v"].combine_chunks().cast(u.type),
                                  batch["wv"].combine_chunks().cast(u.type)])
        return pa.table({"node": nodes,
                         "t": pa.array(np.ones(len(nodes),
                                               dtype=np.int64))})

    return tri.map_batches(corners, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("t", alias_name="triangles"))
