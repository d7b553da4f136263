"""Log-bucket histogram quantile sketch (ops/loghist.py)."""

import numpy as np
import pytest

import ray.data as rd

from medcat_ray.ops.loghist import (bucket_index, bucket_rep,
                                    loghist_counts, loghist_quantiles)


def test_bucketing_exact_vs_bit_length():
    rng = np.random.default_rng(1)
    vals = np.concatenate([np.arange(0, 130),
                           rng.integers(0, 2 ** 60, size=2000)])
    idx = bucket_index(vals, s=5)
    for v, i in zip(vals.tolist(), idx.tolist()):
        if v < 64:
            assert i == v
        else:
            e = v.bit_length() - 1
            assert i == (e - 5 + 1) * 32 + ((v >> (e - 5)) - 32)
    rep = bucket_rep(idx, s=5)
    assert (rep >= vals).all()
    big = vals >= 64
    assert (rep[big] <= vals[big] * (1 + 2 ** -5) + 1).all()


def test_negative_raises():
    with pytest.raises(ValueError, match="non-negative"):
        bucket_index(np.array([-1]), s=5)


def test_quantiles_within_relative_error(ray_session):
    rng = np.random.default_rng(7)
    vals = rng.integers(1, 1_000_000, size=5000)
    ds = rd.from_items([{"v": int(x)} for x in vals]).repartition(4)
    counts = loghist_counts(ds, "v", s=5)
    assert counts.sum() == len(vals)
    qs = [(50, 100), (90, 100), (99, 100)]
    got = loghist_quantiles(counts, qs, s=5)
    srt = np.sort(vals)
    for (q, est), (num, den) in zip(got, qs):
        rank = (len(vals) * num + den - 1) // den
        true = int(srt[rank - 1])
        assert true <= est <= true * (1 + 2 ** -5) + 1, (q, est, true)


def test_merge_associativity(ray_session):
    vals = np.arange(1, 3001)
    a = rd.from_items([{"v": int(x)} for x in vals[:1000]])
    b = rd.from_items([{"v": int(x)} for x in vals[1000:]])
    whole = rd.from_items([{"v": int(x)} for x in vals])
    merged = loghist_counts(a, "v") + loghist_counts(b, "v")
    assert (merged == loghist_counts(whole, "v")).all()


def test_empty_dataset(ray_session):
    ds = rd.from_items([{"v": 1}]).filter(lambda r: False)
    counts = loghist_counts(ds, "v")
    assert counts.sum() == 0
    assert loghist_quantiles(counts, [(50, 100)]) == [(0.5, 0)]


def test_grouped_loghist_equals_per_subset(ray_session):
    """Grouped sketch == independent loghist per subset, and the
    quantile walk matches the global helper on each group."""
    import pandas as pd
    import ray.data as rd
    from medcat_ray.ops.loghist import (loghist_counts,
                                        loghist_counts_grouped,
                                        loghist_quantiles,
                                        loghist_quantiles_grouped)
    rng = np.random.default_rng(21)
    df = pd.DataFrame({
        "g": rng.choice(["a", "b"], 400).astype(object),
        "v": rng.integers(0, 100_000, 400).astype(np.int64)})
    ds = rd.from_pandas(df).repartition(4)
    sparse = loghist_counts_grouped(ds, "g", "v").to_pandas()
    qs = [(25, 100), (50, 100), (90, 100)]
    got = loghist_quantiles_grouped(sparse, "g", qs)
    for g in ["a", "b"]:
        sub = rd.from_pandas(df[df["g"] == g].reset_index(drop=True))
        counts = loghist_counts(sub, "v")
        want = loghist_quantiles(counts, qs)
        mine = got[got["g"] == g].sort_values("q")
        assert list(zip(mine["q"], mine["estimate"])) == want
        # sparse counts agree with the dense histogram
        dense = {i: int(c) for i, c in enumerate(counts) if c}
        sp = dict(zip(sparse[sparse["g"] == g]["bucket"],
                      sparse[sparse["g"] == g]["n"]))
        assert {int(k): int(v) for k, v in sp.items()} == dense
