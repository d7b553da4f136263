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
