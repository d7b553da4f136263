"""Grouped quantiles (ops/quantiles.py) and unigram JS drift
(ops/drift.py)."""

import math

import numpy as np
import pandas as pd

import ray.data as rd

from medcat_ray.ops.drift import unigram_js_divergence
from medcat_ray.ops.quantiles import grouped_quantiles


def test_grouped_quantiles_exact(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"g": rng.choice(["a", "b"], 500),
                       "v": rng.integers(0, 50, 500).astype(np.int64)})
    got = grouped_quantiles(rd.from_pandas(df).repartition(4),
                            "g", "v", [0.25, 0.5, 0.75])
    for g in ["a", "b"]:
        vals = np.sort(df[df["g"] == g]["v"].to_numpy())
        for q in [0.25, 0.5, 0.75]:
            want = vals[math.ceil(q * len(vals)) - 1]
            assert got[(got["g"] == g) & (got["q"] == q)]["value"] \
                .iloc[0] == want


def test_js_divergence_hand_computed(ray_session):
    ds = rd.from_items([
        {"source": "x", "text": "aa bb"},
        {"source": "y", "text": "aa cc"},
        {"source": "z", "text": "aa bb"}]).repartition(2)
    got = unigram_js_divergence(ds)
    # x vs z identical distributions -> JS = 0
    xz = got[(got["group_a"] == "x") & (got["group_b"] == "z")]
    assert abs(xz["js"].iloc[0]) < 1e-12
    # x={aa:.5,bb:.5}, y={aa:.5,cc:.5}: JS = 0.5*ln(2) (disjoint halves)
    xy = got[(got["group_a"] == "x") & (got["group_b"] == "y")]
    assert abs(xy["js"].iloc[0] - 0.5 * math.log(2)) < 1e-12
    assert len(got) == 3          # all unordered pairs of 3 groups
    # bounded by ln 2
    assert (got["js"] <= math.log(2) + 1e-12).all() \
        and (got["js"] >= -1e-12).all()
