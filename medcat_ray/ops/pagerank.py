"""Exact fixed-point PageRank over an edge Dataset (KG centrality).

The reference emits per-doc relation edges (`medcat/rel_cat.py:551-611`)
but has no graph analytics; ranking concepts by centrality of the
co-occurrence graph is the canonical next step for a KG-construction
engine, so it ships as a first-class operator.

All arithmetic is FIXED-POINT INTEGER (scale = 10^9 by default, damping
85/100 as an exact rational, floor division), which makes every
iteration order-free — integer addition commutes, so block order,
batch boundaries and reducer merge order cannot change a single bit —
and lets the DuckDB oracle reproduce the result EXACTLY with HUGEINT
CTEs (see :func:`medcat_ray.ops.sql_oracle.pagerank_sql`).

Semantics per iteration (w = edge weight, treated as w parallel unit
edges; od = Σ out-weights of the source):

    pr'[v] = floor((1-d)·scale) + Σ_{(u,v,w)} w · floor(d·pr[u] / od[u])

Dangling mass is dropped (standard simplified variant); nodes with no
inbound edges hold the base term.

Scale shape (10^12 raw co-occurrence rows): feed this the WEIGHTED
distinct-edge dataset (e.g. ``kg.triple_counts`` output — the corpus →
edge reduction is that operator's already-salted shuffle).  Each
iteration is one streaming pass over the edge dataset: the node-sized
state (pr + out-degree, e.g. 4M CUIs ≈ tens of MB) is ``ray.put`` once
per round and read zero-copy by every task; per-batch contributions are
pre-summed by destination (combiner) so the driver only merges
``combine_blocks × nodes-touched`` partial rows — the edge stream never
lands on the driver.  Int64 safety is asserted up front
(n_nodes · scale bounded), with a per-batch exact big-int fallback for
weight products that would overflow.

Like ``bfs_levels``, resolution is auto-gated on measured node count
(:func:`pagerank`): a concept-graph-sized node set (≤ ``driver_limit``)
runs :func:`pagerank_exact` — broadcast state, combiner partials, the
fastest shape when the state fits one worker heap; an open-world node
set runs :func:`pagerank_distributed` — each round is ONE hash join
(state onto edge sources) + ONE native groupby-Sum (inflow partials
unioned with zero-inflow carrier rows, so od and the base term ride the
same groupby), nothing node-sized ever leaves the object store.  Both
paths compute the IDENTICAL fixed-point integers (unit-tested equal).

Edge weights must be ≥ 1 (fail-loud per batch): a source whose
out-weights sum to zero would otherwise divide by zero and numpy would
silently emit 0-contributions.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def pagerank_exact(edges: rd.Dataset, n_iter: int = 3,
                   scale: int = 10 ** 9,
                   d_num: int = 85, d_den: int = 100,
                   src_col: str = "src", dst_col: str = "dst",
                   weight_col: Optional[str] = None,
                   batch_size: int = 8192,
                   combine_blocks: int = 16) -> pd.DataFrame:
    """Run ``n_iter`` exact integer PageRank rounds; returns a pandas
    DataFrame (node, pr) — node-sized, like the CDB artifacts."""
    import ray
    from ray.data.aggregate import Sum

    # Pin the (already-reduced) edge table in the object store: power
    # iteration reads it n_iter+1 times, and without this every pass
    # would re-execute the upstream pipeline that produced the edges.
    # The object store spills oversized edge tables to disk — still one
    # upstream execution.
    edges = edges.materialize()
    w_expr = weight_col

    def edge_partials(batch: pa.Table) -> pa.Table:
        src = batch[src_col]
        dst = batch[dst_col]
        if w_expr is None:
            w = np.ones(batch.num_rows, dtype=np.int64)
        else:
            w = batch[w_expr].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if w.size and int(w.min()) < 1:
                raise ValueError(
                    "pagerank: edge weights must be >= 1 (a zero-weight "
                    f"source would divide by zero); got min={w.min()}")
        df = pd.DataFrame({"node": src.to_pandas(), "w_out": w})
        out_sum = df.groupby("node", sort=False)["w_out"].sum()
        d_df = pd.DataFrame({"node": dst.to_pandas()})
        in_nodes = d_df["node"].unique()
        nodes = pd.Index(out_sum.index).union(pd.Index(in_nodes))
        w_map = out_sum.reindex(nodes, fill_value=0)
        return pa.table({"node": pa.array(nodes.to_numpy()),
                         "w_out": pa.array(w_map.to_numpy(),
                                           type=pa.int64())})

    deg = edges.map_batches(edge_partials, batch_size=None,
                            batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("w_out", alias_name="od")) \
        .take_all()
    nodes = pd.Index([r["node"] for r in deg]).sort_values()
    od = np.zeros(len(nodes), dtype=np.int64)
    od[nodes.get_indexer([r["node"] for r in deg])] = \
        [r["od"] for r in deg]
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node": [], "pr": pd.Series([], dtype=np.int64)})
    if n * scale >= (1 << 62) // max(d_num, d_den):
        raise ValueError(
            f"n_nodes·scale too large for exact int64 path "
            f"({n}·{scale}); lower `scale`")

    base = ((d_den - d_num) * scale) // d_den
    pr = np.full(n, scale, dtype=np.int64)

    for _ in range(n_iter):
        ref = ray.put((nodes, pr, od))

        def contrib(batch: pa.Table) -> pa.Table:
            nds, p, o = ray.get(ref)
            si = nds.get_indexer(batch[src_col].to_pandas())
            di = nds.get_indexer(batch[dst_col].to_pandas())
            if w_expr is None:
                w = np.ones(batch.num_rows, dtype=np.int64)
            else:
                w = batch[w_expr].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
            per_src = (d_num * p[si]) // (d_den * o[si])
            # w · per_src fits int64 iff max product does (exact big-int
            # check, then vectorize; else per-element Python ints)
            if w.size and int(w.max()) * int(per_src.max()) < (1 << 62):
                c = w * per_src
            else:
                c = np.array([int(a) * int(b)
                              for a, b in zip(w, per_src)],
                             dtype=object)
            uniq, inv = np.unique(di, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=c.dtype)
            np.add.at(sums, inv, c)
            return pa.table({"di": pa.array(uniq, type=pa.int64()),
                             "c": pa.array(sums.astype(np.int64),
                                           type=pa.int64())})

        def combine(batch: pa.Table) -> pa.Table:
            di = batch["di"].to_numpy(zero_copy_only=False)
            c = batch["c"].to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(di, return_inverse=True)
            sums = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(sums, inv, c)
            return pa.table({"di": pa.array(uniq, type=pa.int64()),
                             "c": pa.array(sums, type=pa.int64())})

        partials = edges.map_batches(contrib, batch_size=batch_size,
                                     batch_format="pyarrow") \
            .map_batches(combine, batch_size=None,
                         batch_format="pyarrow") \
            .repartition(combine_blocks) \
            .map_batches(combine, batch_size=None, batch_format="pyarrow")
        inflow = np.zeros(n, dtype=np.int64)
        for row in partials.take_all():
            inflow[row["di"]] += row["c"]
        pr = base + inflow

    return pd.DataFrame({"node": nodes.to_numpy(), "pr": pr})


def _out_degrees(edges: rd.Dataset, src_col: str, dst_col: str,
                 weight_col: Optional[str]) -> rd.Dataset:
    """Materialized (node, od) table: Σ out-weights per source, with a
    zero-contribution row per destination so pure sinks keep a node row
    (and hence the base term).  Validates weights ≥ 1 (fail-loud)."""
    from ray.data.aggregate import Sum
    w_expr = weight_col

    def _tag(batch: pa.Table) -> pa.Table:
        src = batch[src_col].combine_chunks()
        dst = batch[dst_col].combine_chunks()
        if w_expr is None:
            w = np.ones(batch.num_rows, dtype=np.int64)
        else:
            w = batch[w_expr].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if w.size and int(w.min()) < 1:
                raise ValueError(
                    "pagerank: edge weights must be >= 1 (a zero-weight "
                    f"source would divide by zero); got min={w.min()}")
        return pa.table({
            "node": pa.concat_arrays([src, dst.cast(src.type)]),
            "w_out": pa.array(np.concatenate(
                [w, np.zeros(batch.num_rows, dtype=np.int64)]))})

    return edges.map_batches(_tag, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("w_out", alias_name="od")) \
        .materialize()


def pagerank_distributed(edges: rd.Dataset, n_iter: int = 3,
                         scale: int = 10 ** 9,
                         d_num: int = 85, d_den: int = 100,
                         src_col: str = "src", dst_col: str = "dst",
                         weight_col: Optional[str] = None,
                         num_partitions: int = 16,
                         deg: Optional[rd.Dataset] = None) -> rd.Dataset:
    """Join-based exact integer PageRank for open-world node sets —
    identical fixed-point arithmetic to :func:`pagerank_exact`, but the
    node-sized state (node, od, pr) stays a Dataset: each round is ONE
    hash join + ONE native groupby-Sum, nothing node-sized on the
    driver.  ``deg`` accepts a precomputed :func:`_out_degrees` table
    (the auto-gate passes its own so the degree shuffle runs once).
    Returns a (node, pr) Dataset."""
    from ray.data.aggregate import Sum
    edges = edges.materialize()
    w_expr = weight_col
    if deg is None:
        deg = _out_degrees(edges, src_col, dst_col, weight_col)
    n = deg.count()
    if n == 0:
        return rd.from_arrow(pa.table(
            {"node": pa.array([], type=pa.int64()),
             "pr": pa.array([], type=pa.int64())}))
    if n * scale >= (1 << 62) // max(d_num, d_den):
        raise ValueError(
            f"n_nodes·scale too large for exact int64 path "
            f"({n}·{scale}); lower `scale`")
    base = ((d_den - d_num) * scale) // d_den
    # size the per-round exchange to the MEASURED node count: each join
    # spins num_partitions aggregator ACTORS per round, so a small graph
    # with the full partition count pays pure actor-startup wall time
    # (measured 10s vs 3.9s at 12 nodes for 16 vs 4 partitions);
    # ~100k node-rows per partition keeps big graphs at the caller's cap
    num_partitions = max(2, min(num_partitions, n // 100_000 + 2))
    deg = deg.repartition(num_partitions).materialize()

    def _init(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pr", pa.array(np.full(batch.num_rows, scale,
                                   dtype=np.int64)))

    state = deg.map_batches(_init, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    # (node, od, c=0) carrier rows: unioned into every round's groupby so
    # ONE native groupby both sums the inflow and re-attaches od + the
    # base term for no-inbound nodes — no per-round second join
    def _zero_c(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"], "od": batch["od"],
            "c": pa.array(np.zeros(batch.num_rows, dtype=np.int64))})

    carrier = deg.map_batches(_zero_c, batch_format="pyarrow") \
        .repartition(num_partitions).materialize()

    for _ in range(n_iter):
        # join the (node, od, pr) state onto edge sources
        contrib_in = edges.join(
            state, join_type="inner", num_partitions=num_partitions,
            on=(src_col,), right_on=("node",)).materialize()

        def _contrib(batch: pa.Table) -> pa.Table:
            p = batch["pr"].to_numpy(zero_copy_only=False)
            o = batch["od"].to_numpy(zero_copy_only=False)
            if w_expr is None:
                w = np.ones(batch.num_rows, dtype=np.int64)
            else:
                w = batch[w_expr].to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
            per_src = (d_num * p) // (d_den * o)
            if w.size and int(w.max()) * int(per_src.max()) >= (1 << 62):
                c = np.array([int(a) * int(b)
                              for a, b in zip(w, per_src)], dtype=object)
            else:
                c = w * per_src
            # per-batch combiner: pre-sum by destination (od=0 — the
            # carrier rows hold the real od through the groupby-Sum)
            df = pd.DataFrame(
                {"node": batch[dst_col].to_pandas(),
                 "c": c.astype(np.int64)})
            g = df.groupby("node", sort=False, as_index=False)["c"].sum()
            g["od"] = np.int64(0)
            return pa.Table.from_pandas(g[["node", "od", "c"]],
                                        preserve_index=False)

        def _finish(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return pa.table({
                "node": batch["node"], "od": batch["od"],
                "pr": pc.add(pa.scalar(base, type=pa.int64()),
                             batch["c"].combine_chunks().cast(pa.int64()))})

        state = contrib_in.map_batches(_contrib, batch_format="pyarrow") \
            .union(carrier) \
            .groupby("node").aggregate(Sum("od", alias_name="od"),
                                       Sum("c", alias_name="c")) \
            .map_batches(_finish, batch_format="pyarrow") \
            .repartition(num_partitions).materialize()

    return state.select_columns(["node", "pr"])


def pagerank(edges: rd.Dataset, n_iter: int = 3, scale: int = 10 ** 9,
             d_num: int = 85, d_den: int = 100,
             src_col: str = "src", dst_col: str = "dst",
             weight_col: Optional[str] = None,
             method: str = "auto",
             driver_limit: int = 5_000_000,
             num_partitions: int = 16) -> rd.Dataset:
    """Auto-gated exact integer PageRank → (node, pr) Dataset.

    ``method="auto"`` counts the distinct nodes (one groupby over the
    already-materialized edges) and picks the broadcast driver path for
    concept-graph-sized node sets (≤ ``driver_limit``) or the join-based
    distributed rounds for open-world graphs — the ``bfs_levels`` gate
    shape.  Both paths are unit-tested bit-identical."""
    deg = None
    if method == "auto":
        # the gate's node count IS the degree table's cardinality —
        # compute (node, od) once here and hand it to the distributed
        # path so the gate costs no extra shuffle over the edges
        edges = edges.materialize()
        deg = _out_degrees(edges, src_col, dst_col, weight_col)
        n = deg.count()
        method = "driver" if n <= driver_limit else "distributed"
    if method == "driver":
        return rd.from_pandas(pagerank_exact(
            edges, n_iter=n_iter, scale=scale, d_num=d_num, d_den=d_den,
            src_col=src_col, dst_col=dst_col, weight_col=weight_col))
    return pagerank_distributed(
        edges, n_iter=n_iter, scale=scale, d_num=d_num, d_den=d_den,
        src_col=src_col, dst_col=dst_col, weight_col=weight_col,
        num_partitions=num_partitions, deg=deg)
