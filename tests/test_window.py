"""Window / reshaping ops (ops/window.py)."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from medcat_ray.ops.window import lag_deltas, ntile_assign, pivot_counts


def _events(n=120, users=7, seed=3):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01") + \
        pd.to_timedelta(np.cumsum(rng.integers(1, 10_000, n)), unit="s")
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts": pd.Series(ts).astype("datetime64[us]"),
        "event_type": rng.choice(["click", "view", "buy"], n)})


def test_lag_deltas_matches_sql(ray_session):
    df = _events()
    got = lag_deltas(rd.from_pandas(df).repartition(5)).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
SELECT event_id, user_id, ts,
       COALESCE(CAST(date_diff('microsecond',
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
           ts) AS BIGINT), -1) AS delta_us
FROM events ORDER BY event_id""").fetchdf()
    pd.testing.assert_frame_equal(
        got.astype({"delta_us": "int64"}),
        want.astype({"delta_us": "int64",
                     "ts": "datetime64[us]"}))
    # no duplicated or dropped rows across body/residual
    assert len(got) == len(df)


def test_lag_deltas_single_row_blocks(ray_session):
    df = _events(6, users=2)
    got = lag_deltas(rd.from_pandas(df).repartition(6)).to_pandas()
    assert len(got) == 6
    firsts = got.sort_values(["user_id", "ts"]).groupby("user_id").head(1)
    assert (firsts["delta_us"] == -1).all()


def test_ntile_assign_quartiles(ray_session):
    df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                       "v": np.arange(100, dtype=np.int64)})
    out = ntile_assign(rd.from_pandas(df).repartition(4), "v", n=4) \
        .to_pandas().sort_values("doc_id")
    # Q(0.25)=24, Q(0.5)=49, Q(0.75)=74 (discrete-lower rule):
    # bucket = #{boundaries strictly below v}
    want = np.searchsorted(np.array([24, 49, 74]),
                           df["v"].to_numpy(), side="left")
    assert (out["bucket"].to_numpy() == want).all()
    assert out["bucket"].nunique() == 4


def test_pivot_counts_matches_crosstab(ray_session):
    df = _events(150)
    got = pivot_counts(rd.from_pandas(df).repartition(4),
                       "user_id", "event_type").to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    want = pd.crosstab(df["user_id"], df["event_type"]) \
        .reindex(columns=["buy", "click", "view"], fill_value=0)
    for c in ["buy", "click", "view"]:
        assert (got[f"n_{c}"].to_numpy()
                == want[c].to_numpy()).all()
    assert list(got.columns) == ["user_id", "n_buy", "n_click", "n_view"]


def test_window_suite_matches_sql(ray_session):
    from medcat_ray.ops.window import window_suite
    df = _events(150, users=6, seed=9)
    df["cents"] = np.random.default_rng(5).integers(-50, 500, len(df)) \
        .astype(np.int64)
    got = window_suite(rd.from_pandas(df).repartition(7),
                       val_col="cents").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute("""
SELECT event_id, user_id, ts,
       COALESCE(CAST(date_diff('microsecond',
           lag(ts) OVER w, ts) AS BIGINT), -1) AS delta_us,
       ROW_NUMBER() OVER w AS rn,
       SUM(cents) OVER w AS running
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id""").fetchdf()
    pd.testing.assert_frame_equal(
        got.astype({"delta_us": "int64", "rn": "int64",
                    "running": "int64"}),
        want.astype({"delta_us": "int64", "rn": "int64",
                     "running": "int64", "ts": "datetime64[us]"}))
    assert len(got) == len(df)


def test_window_suite_single_row_blocks_and_spans(ray_session):
    from medcat_ray.ops.window import window_suite
    # one dominant key spanning many 1-row-ish blocks + int64 exactness
    n = 60
    big = np.int64(1) << 60
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": np.where(np.arange(n) % 12 == 0, 1, 0)
        .astype(np.int64),
        "ts": pd.Series(pd.Timestamp("2024-01-01")
                        + pd.to_timedelta(np.arange(n), unit="s"))
        .astype("datetime64[us]"),
        "cents": np.where(np.arange(n) % 7 == 0, big, 3)
        .astype(np.int64)})
    got = window_suite(rd.from_pandas(df).repartition(20),
                       val_col="cents").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert got["running"].dtype == np.int64
    # python-side exact twin
    want_run = df.groupby("user_id")["cents"].cumsum()
    want_rn = df.groupby("user_id").cumcount() + 1
    assert (got["running"].to_numpy() == want_run.to_numpy()).all()
    assert (got["rn"].to_numpy() == want_rn.to_numpy()).all()
    us = df["ts"].astype("int64")
    prev = us.groupby(df["user_id"]).shift()
    want_d = (us - prev).fillna(-1).astype("int64")
    assert (got["delta_us"].to_numpy() == want_d.to_numpy()).all()


def test_window_suite_no_val(ray_session):
    from medcat_ray.ops.window import window_suite
    df = _events(40, users=3, seed=1)
    got = window_suite(rd.from_pandas(df).repartition(5)).to_pandas()
    assert "running" not in got.columns
    assert len(got) == 40


def test_window_suite_randomized_twins(ray_session):
    from medcat_ray.ops.window import window_suite
    for seed in (21, 22, 23, 24):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(30, 220))
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, int(rng.integers(1, 9)), n)
            .astype(np.int64),
            "ts": pd.Series(pd.Timestamp("2024-01-01") + pd.to_timedelta(
                np.cumsum(rng.integers(0, 900, n)), unit="s"))
            .astype("datetime64[us]"),
            "cents": rng.integers(-9, 9, n).astype(np.int64)})
        parts = int(rng.integers(1, 14))
        got = window_suite(rd.from_pandas(df).repartition(parts),
                           val_col="cents").to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        srt = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        want_run = srt.groupby("user_id")["cents"].cumsum()
        want_rn = srt.groupby("user_id").cumcount() + 1
        us = srt["ts"].astype("int64")
        want_d = (us - us.groupby(srt["user_id"]).shift()) \
            .fillna(-1).astype("int64")
        back = srt.assign(_run=want_run, _rn=want_rn, _d=want_d) \
            .sort_values("event_id").reset_index(drop=True)
        assert (got["running"].to_numpy() == back["_run"].to_numpy()).all(), seed
        assert (got["rn"].to_numpy() == back["_rn"].to_numpy()).all(), seed
        assert (got["delta_us"].to_numpy() == back["_d"].to_numpy()).all(), seed
