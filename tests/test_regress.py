"""Ridge probe via sufficient statistics (ops/regress.py)."""

import numpy as np
import pandas as pd

import ray.data as rd

from medcat_ray.ops.regress import (ridge_fit, ridge_score, ridge_stats,
                                    stats_long)


def _data(n=400, seed=9):
    rng = np.random.default_rng(seed)
    x1 = rng.uniform(0, 10, n)
    x2 = rng.uniform(-3, 3, n)
    y = 2.0 + 1.5 * x1 - 0.7 * x2 + rng.normal(0, 0.1, n)
    return pd.DataFrame({"x1": x1, "x2": x2, "y": y})


def test_ridge_stats_and_fit_match_numpy(ray_session):
    df = _data()
    ds = rd.from_pandas(df).repartition(5)
    n, xtx, xty = ridge_stats(ds, ["x1", "x2"], "y")
    X = np.column_stack([np.ones(len(df)), df["x1"], df["x2"]])
    assert n == len(df)
    np.testing.assert_allclose(xtx, X.T @ X, rtol=1e-10)
    np.testing.assert_allclose(xty, X.T @ df["y"], rtol=1e-10)
    w = ridge_fit(ds, ["x1", "x2"], "y", l2=0.0)
    w_np = np.linalg.lstsq(X, df["y"].to_numpy(), rcond=None)[0]
    np.testing.assert_allclose(w, w_np, rtol=1e-8)
    np.testing.assert_allclose(w, [2.0, 1.5, -0.7], atol=0.05)
    # ridge shrinks non-bias weights
    w_r = ridge_fit(ds, ["x1", "x2"], "y", l2=1000.0)
    assert abs(w_r[1]) < abs(w[1]) and abs(w_r[2]) < abs(w[2])


def test_ridge_score_and_long_form(ray_session):
    df = _data(100)
    ds = rd.from_pandas(df).repartition(3)
    w = ridge_fit(ds, ["x1", "x2"], "y")
    scored = ridge_score(ds, ["x1", "x2"], w).to_pandas()
    X = np.column_stack([np.ones(len(df)), df["x1"], df["x2"]])
    got = scored.sort_values("x1")["score"].to_numpy()
    want = pd.DataFrame({"x1": df["x1"], "s": X @ w}) \
        .sort_values("x1")["s"].to_numpy()
    np.testing.assert_allclose(got, want, rtol=1e-10)
    n, xtx, xty = ridge_stats(ds, ["x1", "x2"], "y")
    long = stats_long(n, xtx, xty)
    assert len(long) == 12          # 3x3 xtx + 3 xty
    assert (long[long["j"] == -1]["val"].to_numpy() == xty).all()
