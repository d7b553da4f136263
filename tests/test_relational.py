"""Distributed sessionization: the recursive chain-merge must equal the
single-shot driver merge, including when forced through multiple sorted
passes (tiny single_block_limit) and across block-boundary splits."""

import numpy as np
import pandas as pd


def _candidate_sessions(n_users=7, runs_per_user=30, seed=5):
    """Candidate session rows with deliberate adjacent (mergeable) chains:
    consecutive runs for a user sometimes gap < 30min (merge) and
    sometimes > 30min (new session)."""
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        t = pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=int(u))
        for r in range(runs_per_user):
            dur = pd.Timedelta(minutes=int(rng.integers(1, 20)))
            rows.append({"user_id": u, "session_start": t,
                         "session_end": t + dur,
                         "n_events": int(rng.integers(1, 9)),
                         "sum_value": float(rng.normal())})
            gap_min = int(rng.integers(5, 60))     # straddles the 30min cut
            t = t + dur + pd.Timedelta(minutes=gap_min)
    return pd.DataFrame(rows)


def test_distributed_session_merge_equals_driver(ray_session):
    import ray.data as rd
    from medcat_ray.pipelines.relational import (_merge_session_runs,
                                                 _merge_sessions_distributed)
    gap = pd.Timedelta(minutes=30)
    df = _candidate_sessions()
    # shuffle row order and split into many small blocks
    shuffled = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
    ds = rd.from_pandas(shuffled).repartition(16)

    want = _merge_session_runs(df, gap, "session_start", "session_end")
    want = want.sort_values(["user_id", "session_start"]) \
        .reset_index(drop=True)

    # force the recursive multi-pass path with a tiny single-block limit
    got = _merge_sessions_distributed(ds, gap, single_block_limit=40,
                                      max_passes=6).to_pandas()
    got = got.sort_values(["user_id", "session_start"]) \
        .reset_index(drop=True)

    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False, atol=1e-9)
    assert len(want) < len(df)          # merging actually happened
