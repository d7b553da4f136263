"""Distributed BFS levels (ops/bfs.py)."""

import duckdb
import pandas as pd

import ray.data as rd

from medcat_ray.ops.bfs import bfs_levels, hierarchy_roots


def _py_bfs(edges, roots):
    """Reference multi-source BFS over an adjacency dict."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {r: 0 for r in roots}
    frontier = list(roots)
    while frontier:
        nxt = []
        for n in frontier:
            for m in adj.get(n, []):
                if m not in dist:
                    dist[m] = dist[n] + 1
                    nxt.append(m)
        frontier = nxt
    return dist


EDGES = [(1, 3), (1, 4), (2, 4), (4, 5), (5, 6), (3, 6), (6, 7),
         (9, 10), (10, 9),          # cycle, unreachable from roots
         (2, 8), (8, 5)]            # second parent path into 5


def test_hierarchy_roots(ray_session):
    e = rd.from_pandas(pd.DataFrame(EDGES, columns=["src", "dst"]))
    roots = sorted(r["node"] for r in hierarchy_roots(e).take_all())
    assert roots == [1, 2]


def test_bfs_matches_python_reference(ray_session):
    e = rd.from_pandas(pd.DataFrame(EDGES, columns=["src", "dst"])) \
        .repartition(3)
    got = {r["node"]: r["depth"] for r in bfs_levels(e).take_all()}
    want = _py_bfs(EDGES, [1, 2])
    assert got == want
    # multi-parent min: 5 via 2->8->5 and 1->4->5, both depth 2
    assert got[5] == 2
    # the 9<->10 cycle is unreachable and absent
    assert 9 not in got and 10 not in got


def test_bfs_matches_recursive_cte(ray_session):
    e = rd.from_pandas(pd.DataFrame(EDGES, columns=["src", "dst"]))
    got = pd.DataFrame(bfs_levels(e).take_all()) \
        .sort_values("node").reset_index(drop=True)
    con = duckdb.connect()
    con.register("edges", pd.DataFrame(EDGES, columns=["src", "dst"]))
    ora = con.execute("""
WITH RECURSIVE roots AS (
  SELECT DISTINCT src AS node FROM edges
  WHERE src NOT IN (SELECT dst FROM edges)),
d AS (SELECT node, 0 AS depth FROM roots
      UNION
      SELECT e.dst, d.depth + 1 FROM d JOIN edges e ON e.src = d.node
      WHERE d.depth < 64)
SELECT node, CAST(MIN(depth) AS BIGINT) AS depth
FROM d GROUP BY node ORDER BY node""").fetchdf()
    pd.testing.assert_frame_equal(
        got.astype({"node": "int64", "depth": "int64"}), ora)


def test_bfs_explicit_roots_and_empty(ray_session):
    e = rd.from_pandas(pd.DataFrame(EDGES, columns=["src", "dst"]))
    roots = rd.from_pandas(pd.DataFrame({"node": [9]}))
    got = {r["node"]: r["depth"]
           for r in bfs_levels(e, roots=roots).take_all()}
    assert got == {9: 0, 10: 1}
    none = rd.from_pandas(pd.DataFrame({"node": pd.array([], dtype="int64")}))
    assert bfs_levels(e, roots=none).take_all() == []


def test_bfs_distributed_equals_driver(ray_session):
    """Auto-gate twins: the numpy driver path and the join+groupby-Min
    rounds produce identical levels on a multi-path DAG."""
    import numpy as np
    n = np.arange(1, 240)
    tree = list(zip(n // 3, n))                    # ternary tree from 0
    extra = [(d // 2, d) for d in n if d % 7 == 0]  # shortcut edges
    df = pd.DataFrame(tree + extra, columns=["src", "dst"])
    e = rd.from_pandas(df).repartition(4)
    a = {r["node"]: r["depth"]
         for r in bfs_levels(e, method="driver").take_all()}
    b = {r["node"]: r["depth"]
         for r in bfs_levels(e, method="distributed",
                             num_partitions=4).take_all()}
    assert a == b and len(a) == 239 + 1
    assert a == _py_bfs(tree + extra, [0])
