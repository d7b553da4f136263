"""Unit tests for ops/asof.py (distributed backward as-of join)."""

import numpy as np
import pandas as pd
import ray.data as rd

from medcat_ray.ops.asof import asof_join


def _fixture(nl=600, nr=200, nk=12, seed=5):
    rng = np.random.default_rng(seed)
    lt = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 10**6, nl), unit="s")
    rt = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 10**6, nr), unit="s")
    left = pd.DataFrame({"k": rng.integers(0, nk, nl), "lt": lt,
                         "lid": np.arange(nl)})
    right = pd.DataFrame({"k": rng.integers(0, nk + 4, nr), "rt": rt,
                          "v": rng.normal(size=nr)}) \
        .drop_duplicates(["k", "rt"])
    exp = pd.merge_asof(left.sort_values("lt"), right.sort_values("rt"),
                        left_on="lt", right_on="rt", by="k") \
        .sort_values("lid").reset_index(drop=True)
    return left, right, exp


def _check(got, exp):
    got = got.sort_values("lid").reset_index(drop=True)
    assert len(got) == len(exp)
    e = pd.Timestamp(0)
    assert (got["asof_time"].fillna(e) == exp["rt"].fillna(e)).all()
    assert np.allclose(got["asof_v"].fillna(0.0), exp["v"].fillna(0.0))


def test_asof_matches_pandas_both_paths(ray_session):
    left, right, exp = _fixture()
    lds = rd.from_pandas(left).repartition(5)
    rds = rd.from_pandas(right).repartition(3)
    for sbr in (10, 10**6):   # recursive path / single-block path
        got = asof_join(lds, rds, key="k", left_time="lt",
                        right_time="rt", right_vals=["v"],
                        single_block_rows=sbr).to_pandas()
        _check(got, exp)


def test_asof_equal_times_match(ray_session):
    t = pd.to_datetime(["2024-01-01", "2024-01-02"])
    left = pd.DataFrame({"k": [1, 1], "lt": t, "lid": [0, 1]})
    right = pd.DataFrame({"k": [1, 1], "rt": t, "v": [10.0, 20.0]})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="k", left_time="lt", right_time="rt",
                    right_vals=["v"]).to_pandas() \
        .sort_values("lid").reset_index(drop=True)
    # backward-inclusive: each left matches the right row at its own time
    assert got["asof_v"].tolist() == [10.0, 20.0]


def test_asof_empty_right_all_null(ray_session):
    left = pd.DataFrame({
        "k": [1, 2], "lt": pd.to_datetime(["2024-01-01", "2024-01-02"]),
        "lid": [0, 1]})
    right = pd.DataFrame({
        "k": pd.Series([], dtype="int64"),
        "rt": pd.Series([], dtype="datetime64[ns]"),
        "v": pd.Series([], dtype="float64")})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="k", left_time="lt", right_time="rt",
                    right_vals=["v"]).to_pandas()
    assert len(got) == 2
    assert got["asof_time"].isna().all()
    assert got["asof_v"].isna().all()
