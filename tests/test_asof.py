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


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------

def test_range_join_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    nl, nr, nk = 500, 400, 15
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "k": rng.integers(0, nk, nl),
        "lt": base + pd.to_timedelta(rng.integers(0, 10**5, nl),
                                     unit="s"),
        "lid": np.arange(nl)})
    right = pd.DataFrame({
        "k": rng.integers(0, nk, nr),
        "rt": base + pd.to_timedelta(rng.integers(0, 10**5, nr),
                                     unit="s"),
        "rid": np.arange(nr)})
    lo, hi = pd.Timedelta("-30min"), pd.Timedelta("45min")
    from medcat_ray.ops.asof import range_join
    m = left.merge(right, on="k")
    d = m["rt"] - m["lt"]
    exp = set(zip(m[(d >= lo) & (d <= hi)].lid,
                  m[(d >= lo) & (d <= hi)].rid))
    got_df = range_join(rd.from_pandas(left).repartition(4),
                        rd.from_pandas(right).repartition(3),
                        key="k", left_time="lt", right_time="rt",
                        lower=lo, upper=hi).to_pandas()
    got = set(zip(got_df.lid, got_df.r_rid))
    # also: no duplicate pairs emitted
    assert len(got_df) == len(got) == len(exp)
    assert got == exp


def test_range_join_band_edges(ray_session):
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({"k": [1], "lt": [base], "lid": [0]})
    right = pd.DataFrame({
        "k": [1, 1, 1, 1],
        "rt": [base - pd.Timedelta("1h"), base,
               base + pd.Timedelta("1h"),
               base + pd.Timedelta("1h") + pd.Timedelta("1us")],
        "rid": [0, 1, 2, 3]})
    from medcat_ray.ops.asof import range_join
    got = range_join(rd.from_pandas(left), rd.from_pandas(right),
                     key="k", left_time="lt", right_time="rt",
                     lower=pd.Timedelta("-1h"),
                     upper=pd.Timedelta("1h")).to_pandas()
    # inclusive bounds; the +1us row falls outside
    assert sorted(got.r_rid.tolist()) == [0, 1, 2]


def test_range_join_rejects_empty_band(ray_session):
    import pytest
    from medcat_ray.ops.asof import range_join
    left = rd.from_pandas(pd.DataFrame({
        "k": [1], "lt": [pd.Timestamp("2024-01-01")]}))
    with pytest.raises(ValueError):
        range_join(left, left, key="k", left_time="lt",
                   right_time="lt", lower=pd.Timedelta("1h"),
                   upper=pd.Timedelta("1h"))


def test_asof_both_inputs_empty(ray_session):
    """Both sides empty: must return an empty dataset with the projected
    left schema (was IndexError on done_parts[0])."""
    left = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                         "lt": pd.Series([], dtype="datetime64[us]"),
                         "lid": pd.Series([], dtype=np.int64)})
    right = pd.DataFrame({"k": pd.Series([], dtype=np.int64),
                          "rt": pd.Series([], dtype="datetime64[us]"),
                          "v": pd.Series([], dtype=np.float64)})
    got = asof_join(rd.from_pandas(left), rd.from_pandas(right),
                    key="k", left_time="lt", right_time="rt",
                    right_vals=["v"])
    assert got.count() == 0
    # Ray's to_pandas() drops columns on a 0-row dataset; the dataset
    # schema is the stable contract
    assert {"k", "lt", "lid", "asof_time", "asof_v"} <= set(got.schema().names)


def test_asof_oversized_residual_sharded_finalize(ray_session):
    # residual (never-matching lefts) far exceeds single_block_rows at
    # max_passes: the exact finalize must hash-shard by key instead of
    # gathering one giant block, and still match pandas merge_asof
    rng = np.random.default_rng(11)
    nl = 400
    lt = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 10**6, nl), unit="s")
    # high-cardinality keys, right side covers none of them
    left = pd.DataFrame({"k": np.arange(nl), "lt": lt, "lid": np.arange(nl)})
    right = pd.DataFrame({"k": [10**6], "rt": [lt[0]], "v": [1.0]})
    exp = pd.merge_asof(left.sort_values("lt"), right.sort_values("rt"),
                        left_on="lt", right_on="rt", by="k") \
        .sort_values("lid").reset_index(drop=True)
    got = asof_join(rd.from_pandas(left).repartition(6),
                    rd.from_pandas(right), key="k", left_time="lt",
                    right_time="rt", right_vals=["v"],
                    max_passes=2, single_block_rows=20).to_pandas()
    _check(got, exp)
    assert got["asof_time"].isna().all()


def test_asof_sharded_finalize_with_matches(ray_session):
    # mixed residual: some keys match, many never do; tiny
    # single_block_rows + max_passes=1 forces the sharded finalize on
    # the FIRST pass (every row is residual)
    left, right, exp = _fixture(nl=300, nr=120, nk=40)
    got = asof_join(rd.from_pandas(left).repartition(5),
                    rd.from_pandas(right).repartition(3), key="k",
                    left_time="lt", right_time="rt", right_vals=["v"],
                    max_passes=1, single_block_rows=10).to_pandas()
    _check(got, exp)
