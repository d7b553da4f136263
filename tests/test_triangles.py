"""Triangle counting (ops/triangles.py)."""

import ray.data as rd

from medcat_ray.ops.triangles import triangle_counts


def test_k4_triangle_and_chain(ray_session):
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]  # K4
    edges += [(5, 6), (7, 8), (8, 9), (7, 9), (9, 7), (7, 7)]
    ds = rd.from_items([{"src": a, "dst": b}
                        for a, b in edges]).repartition(3)
    out = triangle_counts(ds).to_pandas()
    got = dict(zip(out["node"], out["triangles"]))
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 7: 1, 8: 1, 9: 1}


def test_reversed_duplicate_edges_count_once(ray_session):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3)]
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    out = triangle_counts(ds).to_pandas()
    assert dict(zip(out["node"], out["triangles"])) == {1: 1, 2: 1, 3: 1}


def test_no_triangles(ray_session):
    ds = rd.from_items([{"src": 1, "dst": 2}, {"src": 2, "dst": 3}])
    assert triangle_counts(ds).count() == 0


def _brute(edges):
    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        es.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    counts = {}
    for (a, b) in es:
        for c in adj[a] & adj[b]:
            if c > b:
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
    return counts


def test_random_graph_matches_bruteforce_both_paths(ray_session):
    import numpy as np
    rng = np.random.default_rng(3)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 40, (300, 2))]
    ds = rd.from_items([{"src": a, "dst": b}
                        for a, b in edges]).repartition(4)
    want = _brute(edges)
    for method in ("auto", "distributed"):   # auto -> driver gate here
        out = triangle_counts(ds, method=method).to_pandas()
        assert dict(zip(out["node"], out["triangles"])) == want, method


def test_max_degree_noop_on_bounded_graph(ray_session):
    # every vertex in K4 has degree 3: max_degree=3 must equal uncapped
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    capped = triangle_counts(ds, max_degree=3).to_pandas()
    uncapped = triangle_counts(ds).to_pandas()
    assert dict(zip(capped["node"], capped["triangles"])) == \
        dict(zip(uncapped["node"], uncapped["triangles"]))


def test_max_degree_drops_hub(ray_session):
    # hub 0 touches every vertex of a K4 + 20 spokes; max_degree below
    # the hub's degree counts the K4-only subgraph exactly (distributed
    # path forced; the driver twin is covered by the capped test below)
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(0, v) for v in range(1, 25)]
    ds = rd.from_items([{"src": a, "dst": b}
                        for a, b in edges]).repartition(3)
    capped = triangle_counts(ds, max_degree=8,
                             method="distributed").to_pandas()
    assert dict(zip(capped["node"], capped["triangles"])) == \
        {1: 3, 2: 3, 3: 3, 4: 3}
    # driver twin agrees on the capped subgraph
    capped_d = triangle_counts(ds, max_degree=8, method="driver").to_pandas()
    assert dict(zip(capped_d["node"], capped_d["triangles"])) == \
        {1: 3, 2: 3, 3: 3, 4: 3}
    # uncapped: hub corners count too (each K4 edge closes with the hub)
    full = triangle_counts(ds, method="distributed").to_pandas()
    got = dict(zip(full["node"], full["triangles"]))
    assert got[0] == 6 and got[1] == 3 + 3


def test_star_hub_zero_wedges(ray_session):
    # a pure star has no triangles; the degree orientation points every
    # spoke AT the hub, so the oriented self-join emits zero wedges
    # (the Σdeg² blowup the naive plan would hit)
    edges = [(0, v) for v in range(1, 200)]
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    assert triangle_counts(ds).count() == 0


def test_join_fallback_equals_broadcast(ray_session):
    # broadcast_limit=0 forces the open-world two-join degree attach;
    # both paths must agree with brute force
    import numpy as np
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 25, (150, 2))]
    ds = rd.from_items([{"src": a, "dst": b}
                        for a, b in edges]).repartition(3)
    via_join = triangle_counts(ds, broadcast_limit=0,
                               method="distributed").to_pandas()
    assert dict(zip(via_join["node"], via_join["triangles"])) == \
        _brute(edges)
    capped = triangle_counts(ds, max_degree=10, broadcast_limit=0,
                             method="distributed").to_pandas()
    deg = {}
    for a, b in set((min(a, b), max(a, b)) for a, b in edges if a != b):
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    keep = {n for n, d in deg.items() if d <= 10}
    sub = [(a, b) for a, b in edges if a in keep and b in keep]
    assert dict(zip(capped["node"], capped["triangles"])) == _brute(sub)
    capped_b = triangle_counts(ds, max_degree=10).to_pandas()
    assert dict(zip(capped_b["node"], capped_b["triangles"])) == \
        _brute(sub)
