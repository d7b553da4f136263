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
