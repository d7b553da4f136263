"""Unit tests for ops/sample.py (deterministic mixture sampling)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from medcat_ray.ops.sample import rate_thresholds, stratified_sample


def _ds(n=2000, sources=("a", "b", "c")):
    ids = np.arange(n, dtype=np.int64)
    src = [sources[i % len(sources)] for i in range(n)]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "source": pa.array(src, pa.string())}))


def test_rate_edges_and_missing_source(ray_session):
    out = stratified_sample(
        _ds(300), {"a": 1.0, "b": 0.0}).to_pandas()
    # rate 1.0 keeps every 'a' row, rate 0 and missing 'c' keep none
    assert (out["source"] == "a").all()
    assert len(out) == 100


def test_deterministic_and_proportional(ray_session):
    rates = {"a": 0.5, "b": 0.25, "c": 0.75}
    a = stratified_sample(_ds(), rates).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = stratified_sample(_ds(), rates).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    frac = a.groupby("source").size() / (2000 / 3)
    assert abs(frac["a"] - 0.5) < 0.08
    assert abs(frac["b"] - 0.25) < 0.08
    assert abs(frac["c"] - 0.75) < 0.08


def test_seed_changes_sample(ray_session):
    rates = {"a": 0.5, "b": 0.5, "c": 0.5}
    a = stratified_sample(_ds(), rates, seed=1).to_pandas()
    b = stratified_sample(_ds(), rates, seed=2).to_pandas()
    assert set(a.doc_id) != set(b.doc_id)


def test_thresholds_exact():
    t = rate_thresholds({"x": 0.25, "y": 1.0, "z": 0.0, "w": 2.0})
    assert t["x"] == 1 << 62
    assert t["y"] == 1 << 64
    assert t["z"] == 0
    assert t["w"] == 1 << 64   # clamped


def test_sample_exact_n(ray_session):
    ds = _ds(500)
    a = __import__("medcat_ray.ops.sample", fromlist=["sample_exact_n"])
    out1 = a.sample_exact_n(ds, n=20, seed=1)
    out2 = a.sample_exact_n(_ds(500), n=20, seed=1)
    assert len(out1) == 20
    assert out1.sample_rank.tolist() == list(range(20))
    # deterministic across runs; different seed -> different sample
    assert out1.doc_id.tolist() == out2.doc_id.tolist()
    out3 = a.sample_exact_n(_ds(500), n=20, seed=2)
    assert out3.doc_id.tolist() != out1.doc_id.tolist()
    # n larger than dataset: returns everything
    small = a.sample_exact_n(_ds(9), n=50, seed=1)
    assert len(small) == 9


def test_sample_n_per_group_matches_duckdb(ray_session):
    import duckdb
    from medcat_ray.ops.sample import (sample_n_per_group,
                                       sample_n_per_group_oracle_sql)
    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "doc_id": np.arange(500, dtype=np.int64),
        "source": [f"src{int(i)}" for i in rng.integers(0, 7, 500)]})
    df.loc[df.source == "src6", "source"] = "tiny"
    df = df[~((df.source == "tiny") & (df.doc_id > 30))]
    got = sample_n_per_group(rd.from_pandas(df).repartition(6), n=5) \
        [["doc_id", "source", "sample_rank"]]
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(sample_n_per_group_oracle_sql(5)).df()
    exp["sample_rank"] = exp["sample_rank"].astype("int64")
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  exp[got.columns])
    sizes = got.groupby("source").size()
    assert (sizes.drop("tiny") == 5).all()
    assert sizes["tiny"] < 5                 # under-full group keeps all


def test_sample_n_per_group_partition_invariant(ray_session):
    from medcat_ray.ops.sample import sample_n_per_group
    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "source": [f"s{i % 4}" for i in range(200)]})
    a = sample_n_per_group(rd.from_pandas(df), n=7)
    b = sample_n_per_group(rd.from_pandas(df).repartition(9), n=7)
    pd.testing.assert_frame_equal(a, b)
