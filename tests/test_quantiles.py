"""Unit tests for ops/quantiles.py (exact histogram quantiles)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from medcat_ray.ops.quantiles import exact_quantiles


def _ds(vals):
    return rd.from_arrow(pa.table({
        "v": pa.array(list(vals), pa.int64())}))


def test_quantiles_by_hand(ray_session):
    # 1..10: ceil(0.5*10)=5 -> value 5; ceil(0.9*10)=9 -> 9; q=1 -> 10
    out = exact_quantiles(_ds(range(1, 11)), "v", [0.5, 0.9, 1.0])
    assert out.value.tolist() == [5, 9, 10]


def test_quantiles_with_duplicates(ray_session):
    vals = [1] * 90 + [100] * 10
    out = exact_quantiles(_ds(vals), "v", [0.5, 0.9, 0.95])
    # cum(1)=90 covers ceil(50)=50 and ceil(90)=90; 0.95 needs 95 -> 100
    assert out.value.tolist() == [1, 1, 100]


def test_quantiles_match_numpy_inverted_cdf(ray_session):
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 200, 1000)
    qs = [0.25, 0.5, 0.75, 0.99]
    out = exact_quantiles(_ds(vals), "v", qs)
    s = np.sort(vals)
    for q, got in zip(qs, out.value):
        want = s[int(np.ceil(q * len(s))) - 1]
        assert got == want, (q, got, want)
