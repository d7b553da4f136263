"""Unit tests for ops/topk.py (grouped top-k)."""

import numpy as np
import pandas as pd
import ray.data as rd

from medcat_ray.ops.topk import grouped_topk


def test_grouped_topk_matches_window(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.integers(0, 8, 400),
                       "v": rng.integers(0, 50, 400),
                       "i": np.arange(400)})
    got = grouped_topk(rd.from_pandas(df).repartition(5),
                       key="g", val="v", tie="i", k=3).to_pandas() \
        .sort_values(["g", "rank"]).reset_index(drop=True)
    exp = df.sort_values(["g", "v", "i"],
                         ascending=[True, False, True]) \
        .groupby("g").head(3).reset_index(drop=True)
    assert got[["g", "v", "i"]].values.tolist() == \
        exp[["g", "v", "i"]].values.tolist()
    assert (got.groupby("g")["rank"].apply(
        lambda s: s.tolist() == list(range(1, len(s) + 1)))).all()


def test_grouped_topk_ties_deterministic(ray_session):
    df = pd.DataFrame({"g": ["a"] * 4, "v": [7, 7, 7, 7],
                       "i": [3, 1, 2, 0]})
    got = grouped_topk(rd.from_pandas(df).repartition(2),
                       key="g", val="v", tie="i", k=2).to_pandas()
    assert sorted(got["i"].tolist()) == [0, 1]


def test_grouped_topk_small_groups(ray_session):
    df = pd.DataFrame({"g": ["a", "b"], "v": [1, 2], "i": [0, 1]})
    got = grouped_topk(rd.from_pandas(df), key="g", val="v",
                       tie="i", k=5).to_pandas()
    assert len(got) == 2
    assert got["rank"].tolist() == [1, 1]
