"""Distributed per-key prefix scan (ops/scan.py)."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from medcat_ray.ops.scan import running_sum


def _events(n=150, users=6, seed=11):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01") + \
        pd.to_timedelta(np.cumsum(rng.integers(1, 5000, n)), unit="s")
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts": pd.Series(ts).astype("datetime64[us]"),
        "cents": rng.integers(-50, 500, n).astype(np.int64)})


def _sql(df, expr):
    con = duckdb.connect()
    con.register("events", df)
    return con.execute(f"""
SELECT event_id, {expr} AS running FROM events ORDER BY event_id
""").fetchdf()


def test_running_sum_matches_sql(ray_session):
    df = _events()
    got = running_sum(rd.from_pandas(df).repartition(5), "user_id",
                      ["ts"], "event_id", val_col="cents").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = _sql(df, "SUM(cents) OVER (PARTITION BY user_id "
                    "ORDER BY ts, event_id)")
    assert (got["running"].to_numpy()
            == want["running"].to_numpy().astype("int64")).all()
    assert len(got) == len(df)


def test_row_number_matches_sql(ray_session):
    df = _events(97, users=4)
    got = running_sum(rd.from_pandas(df).repartition(7), "user_id",
                      ["ts"], "event_id", val_col=None,
                      out_col="rn").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
SELECT event_id, ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
FROM events ORDER BY event_id""").fetchdf()
    assert (got["rn"].to_numpy()
            == want["rn"].to_numpy().astype("int64")).all()


def test_key_spanning_many_blocks(ray_session):
    # one dominant key → guaranteed multi-block spans + chained offsets
    n = 200
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.where(np.arange(n) % 10 == 0, 1, 0).astype(np.int64),
        "ts": pd.Series(pd.Timestamp("2024-01-01")
                        + pd.to_timedelta(np.arange(n), unit="s"))
        .astype("datetime64[us]"),
        "cents": np.ones(n, dtype=np.int64)})
    got = running_sum(rd.from_pandas(df).repartition(20), "user_id",
                      ["ts"], "event_id", val_col="cents").to_pandas()
    want = _sql(df, "SUM(cents) OVER (PARTITION BY user_id "
                    "ORDER BY ts, event_id)")
    got = got.sort_values("event_id").reset_index(drop=True)
    assert (got["running"].to_numpy()
            == want["running"].to_numpy().astype("int64")).all()


def test_running_sum_empty(ray_session):
    df = _events(0)
    got = running_sum(rd.from_pandas(df), "user_id", ["ts"],
                      "event_id", val_col="cents")
    assert got.count() == 0


def test_int64_exact_beyond_float53(ray_session):
    # boundary offsets must be bit-exact int64: values near 2^60 lose
    # low bits if the totals ride through float64 (2^53 mantissa)
    n = 40
    big = np.int64(1) << 60
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.zeros(n, dtype=np.int64),
        "ts": pd.Series(pd.Timestamp("2024-01-01")
                        + pd.to_timedelta(np.arange(n), unit="s"))
        .astype("datetime64[us]"),
        # one huge value per block + odd remainders that float64 drops
        "cents": np.where(np.arange(n) % 5 == 0, big, 3).astype(np.int64)})
    got = running_sum(rd.from_pandas(df).repartition(8), "user_id",
                      ["ts"], "event_id", val_col="cents").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = df["cents"].cumsum()
    assert got["running"].dtype == np.int64
    assert (got["running"].to_numpy() == want.to_numpy()).all()
