"""ROLLUP aggregates (ops/rollup.py) and covariance/PCA reductions
(ops/linalg.py)."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from medcat_ray.ops.linalg import (covariance_fit, covariance_long,
                                   pca_components)
from medcat_ray.ops.rollup import ALL, rollup_counts


def test_rollup_matches_sql(ray_session):
    rng = np.random.default_rng(2)
    df = pd.DataFrame({
        "lang": rng.choice(["en", "de", "fr"], 200),
        "source": rng.choice(["web", "wiki"], 200)})
    got = rollup_counts(rd.from_pandas(df).repartition(3),
                        ["lang", "source"])
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(f"""
SELECT COALESCE(lang, '{ALL}') AS lang,
       COALESCE(source, '{ALL}') AS source,
       CAST(COUNT(*) AS BIGINT) AS n
FROM t GROUP BY ROLLUP (lang, source)
ORDER BY lang, source""").fetchdf()
    pd.testing.assert_frame_equal(
        got.sort_values(["lang", "source"]).reset_index(drop=True), want)


def test_rollup_weighted(ray_session):
    df = pd.DataFrame({"a": ["x", "x", "y"], "w": [2, 3, 5]})
    got = rollup_counts(rd.from_pandas(df), ["a"], weight_col="w")
    assert dict(zip(got["a"], got["n"])) == {"x": 5, "y": 5, ALL: 10}


def test_covariance_matches_numpy(ray_session):
    rng = np.random.default_rng(4)
    x = rng.standard_normal((300, 8))
    ds = rd.from_items([{"embedding": r.tolist()} for r in x]) \
        .repartition(5)
    n, mean, cov = covariance_fit(ds)
    assert n == 300
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-10)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), rtol=1e-8,
                               atol=1e-12)
    long = covariance_long(ds)
    assert len(long) == 64
    np.testing.assert_allclose(
        long["cov"].to_numpy().reshape(8, 8), cov, rtol=1e-12)


def test_pca_components_recover_direction(ray_session):
    rng = np.random.default_rng(5)
    d = np.array([3.0, 1.0, 0.0, 0.0])
    basis = np.linalg.qr(rng.standard_normal((4, 4)))[0]
    x = (rng.standard_normal((2000, 4)) * d) @ basis.T
    ds = rd.from_items([{"embedding": r.tolist()} for r in x])
    _, _, cov = covariance_fit(ds)
    comps = pca_components(cov, 2)
    # first component aligns with the largest-variance basis vector
    assert abs(np.dot(comps[0], basis[:, 0])) > 0.99
    assert comps[0][np.argmax(np.abs(comps[0]))] > 0   # sign convention


def test_rollup_float_weights_not_truncated(ray_session):
    import pandas as pd
    import ray.data as rd
    from medcat_ray.ops.rollup import ALL, rollup_counts
    df = pd.DataFrame({"a": ["x", "x", "y"], "w": [0.5, 0.25, 1.5]})
    got = rollup_counts(rd.from_pandas(df), ["a"], weight_col="w")
    vals = dict(zip(got["a"], got["n"]))
    assert vals["x"] == 0.75 and vals["y"] == 1.5
    assert vals[ALL] == 2.25          # fractional grand total preserved
