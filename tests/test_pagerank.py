"""Exact fixed-point PageRank (ops/pagerank.py).

Ground truth: a python-int hand implementation of the identical
semantics (scale 10^9, damping 85/100, floor division, dangling mass
dropped) — integer arithmetic is order-free, so the distributed
partial-sum tree must agree bit-for-bit.
"""

import numpy as np
import pytest

import ray.data as rd

from medcat_ray.ops.pagerank import pagerank_exact

SCALE = 10 ** 9
BASE = (15 * SCALE) // 100


def _hand(edges, n_iter):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    od = {n: 0 for n in nodes}
    for s, _, w in edges:
        od[s] += w
    pr = {n: SCALE for n in nodes}
    for _ in range(n_iter):
        new = {n: BASE for n in nodes}
        for s, d, w in edges:
            new[d] += w * ((85 * pr[s]) // (100 * od[s]))
        pr = new
    return pr


EDGES = [("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("c", "a", 1),
         ("d", "a", 3)]


def test_weighted_matches_hand(ray_session):
    ds = rd.from_items([{"src": s, "dst": d, "w": w}
                        for s, d, w in EDGES]).repartition(3)
    out = pagerank_exact(ds, n_iter=3, weight_col="w")
    want = _hand(EDGES, 3)
    assert dict(zip(out["node"], out["pr"])) == want
    assert want["d"] == BASE  # no inbound edges -> base term only


def test_raw_edges_equal_weighted(ray_session):
    raw = rd.from_items([{"src": s, "dst": d}
                         for s, d, w in EDGES
                         for _ in range(w)]).repartition(4)
    out = pagerank_exact(raw, n_iter=3)
    assert dict(zip(out["node"], out["pr"])) == _hand(EDGES, 3)


def test_bigint_fallback_matches_hand(ray_session):
    # w.max() * per_src.max() overflows int64 in one batch -> the exact
    # python-int path must fire and still agree with the hand twin
    edges = [("a", "b", 1 << 41), ("c", "d", 1), ("d", "c", 1)]
    ds = rd.from_items([{"src": s, "dst": d, "w": w}
                        for s, d, w in edges]).repartition(1)
    out = pagerank_exact(ds, n_iter=2, weight_col="w")
    assert dict(zip(out["node"], out["pr"])) == _hand(edges, 2)


def test_empty_graph(ray_session):
    ds = rd.from_items([{"src": "a", "dst": "b", "w": 1}]).filter(
        lambda r: False)
    out = pagerank_exact(ds, n_iter=2, weight_col="w")
    assert len(out) == 0


def test_scale_guard(ray_session):
    ds = rd.from_items([{"src": "a", "dst": "b", "w": 1}])
    with pytest.raises(ValueError, match="scale"):
        pagerank_exact(ds, n_iter=1, weight_col="w", scale=1 << 62)


def test_distributed_matches_driver_bitwise(ray_session):
    from medcat_ray.ops.pagerank import pagerank, pagerank_distributed
    ds = rd.from_items([{"src": s, "dst": d, "w": w}
                        for s, d, w in EDGES]).repartition(3)
    want = _hand(EDGES, 3)
    dist = pagerank_distributed(ds, n_iter=3, weight_col="w",
                                num_partitions=3).to_pandas()
    assert dict(zip(dist["node"], dist["pr"])) == want
    # the auto gate picks the driver path for this tiny graph …
    auto = pagerank(ds, n_iter=3, weight_col="w").to_pandas()
    assert dict(zip(auto["node"], auto["pr"])) == want
    # … and driver_limit=0 forces the distributed path through the gate
    forced = pagerank(ds, n_iter=3, weight_col="w",
                      driver_limit=0, num_partitions=3).to_pandas()
    assert dict(zip(forced["node"], forced["pr"])) == want


def test_distributed_unweighted_and_empty(ray_session):
    from medcat_ray.ops.pagerank import pagerank_distributed
    raw = rd.from_items([{"src": s, "dst": d}
                         for s, d, w in EDGES
                         for _ in range(w)]).repartition(4)
    out = pagerank_distributed(raw, n_iter=2).to_pandas()
    assert dict(zip(out["node"], out["pr"])) == _hand(EDGES, 2)
    empty = rd.from_items([{"src": "a", "dst": "b", "w": 1}]).filter(
        lambda r: False)
    assert pagerank_distributed(empty, n_iter=1,
                                weight_col="w").count() == 0


def test_zero_weight_fails_loud(ray_session):
    from medcat_ray.ops.pagerank import pagerank_distributed
    ds = rd.from_items([{"src": "a", "dst": "b", "w": 0},
                        {"src": "b", "dst": "a", "w": 1}])
    with pytest.raises(Exception, match="weights must be >= 1"):
        pagerank_exact(ds, n_iter=1, weight_col="w")
    with pytest.raises(Exception, match="weights must be >= 1"):
        pagerank_distributed(ds, n_iter=1, weight_col="w").materialize()
