"""Funnel analysis (ops/funnel.py)."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from medcat_ray.ops.funnel import funnel_stages

STAGES = ["click", "view", "purchase"]


def _events(n=300, users=12, seed=13):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01") + \
        pd.to_timedelta(np.cumsum(rng.integers(1, 3000, n)), unit="s")
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "ts": pd.Series(ts).astype("datetime64[us]"),
        "event_type": rng.choice(STAGES + ["other"], n)})


def _sql_twin(df):
    con = duckdb.connect()
    con.register("events", df)
    return {int(u): int(s) for u, s in con.execute("""
WITH t1 AS (SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'click' GROUP BY user_id),
t2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
       JOIN t1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > t1.t GROUP BY e.user_id),
t3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e
       JOIN t2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > t2.t
       GROUP BY e.user_id)
SELECT t1.user_id,
       CASE WHEN t3.user_id IS NOT NULL THEN 3
            WHEN t2.user_id IS NOT NULL THEN 2 ELSE 1 END AS stage
FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
""").fetchall()}


def test_funnel_matches_sql(ray_session):
    df = _events()
    got = {int(u): int(s) for u, s in
           funnel_stages(rd.from_pandas(df).repartition(4), STAGES,
                         num_partitions=2).to_pandas()
           [["user_id", "stage"]].itertuples(index=False)}
    assert got == _sql_twin(df)


def test_funnel_order_matters(ray_session):
    # purchase BEFORE any click must not count as stage 3
    df = pd.DataFrame({
        "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
        "ts": pd.Series(pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 01:00", "2024-01-01 02:00",
            "2024-01-02 00:00", "2024-01-02 01:00"]))
        .astype("datetime64[us]"),
        "event_type": ["purchase", "click", "view",
                       "view", "click"]})
    got = {int(u): int(s) for u, s in
           funnel_stages(rd.from_pandas(df), STAGES, num_partitions=2)
           .to_pandas()[["user_id", "stage"]].itertuples(index=False)}
    # user 1: click(01) -> view(02), purchase was too early -> stage 2
    # user 2: click only (view came first) -> stage 1
    assert got == {1: 2, 2: 1}


def test_funnel_no_first_stage(ray_session):
    df = pd.DataFrame({
        "user_id": np.array([5], dtype=np.int64),
        "ts": pd.Series([pd.Timestamp("2024-01-01")])
        .astype("datetime64[us]"),
        "event_type": ["view"]})
    assert funnel_stages(rd.from_pandas(df), STAGES,
                         num_partitions=2).count() == 0
