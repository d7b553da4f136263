"""PMI / NPMI edge scoring (ops/pmi.py)."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from medcat_ray.ops.pmi import pmi_edges


def _pairs(n_subj=12, n_obj=10, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n_subj):
        for o in range(n_obj):
            if rng.random() < 0.55:
                rows.append((f"C{s:03d}", f"C{o + 100:03d}",
                             int(rng.integers(1, 40))))
    return pd.DataFrame(rows, columns=["subj_cui", "obj_cui", "count"])


def _sql(df):
    con = duckdb.connect()
    con.register("tc", df)
    return con.execute("""
WITH tot AS (SELECT SUM(count) AS t FROM tc),
rs AS (SELECT subj_cui, SUM(count) AS c_s FROM tc GROUP BY subj_cui),
cs AS (SELECT obj_cui, SUM(count) AS c_o FROM tc GROUP BY obj_cui)
SELECT tc.subj_cui, tc.obj_cui, tc.count,
       LN(tc.count * 1.0 * tot.t / (rs.c_s * cs.c_o)) AS pmi,
       CASE WHEN tc.count >= tot.t THEN 1.0
            ELSE LN(tc.count * 1.0 * tot.t / (rs.c_s * cs.c_o))
                 / (-LN(tc.count * 1.0 / tot.t)) END AS npmi
FROM tc JOIN rs USING (subj_cui) JOIN cs USING (obj_cui) CROSS JOIN tot
ORDER BY subj_cui, obj_cui""").fetchdf()


def _run(df, method):
    got = pmi_edges(rd.from_pandas(df).repartition(5),
                    method=method).to_pandas() \
        .sort_values(["subj_cui", "obj_cui"]).reset_index(drop=True)
    return got


def test_pmi_broadcast_matches_sql(ray_session):
    df = _pairs()
    got = _run(df, "broadcast")
    want = _sql(df)
    assert (got["subj_cui"].to_numpy() == want["subj_cui"].to_numpy()).all()
    assert np.allclose(got["pmi"], want["pmi"], rtol=1e-12)
    assert np.allclose(got["npmi"], want["npmi"], rtol=1e-12)
    # npmi bounded
    assert (got["npmi"].to_numpy() <= 1.0 + 1e-12).all()


def test_pmi_join_equals_broadcast(ray_session):
    df = _pairs(seed=3)
    a = _run(df, "broadcast")
    b = _run(df, "join")
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_pmi_single_edge_limit(ray_session):
    # one pair = whole corpus → p(s,o)=1, npmi defined as 1.0
    df = pd.DataFrame({"subj_cui": ["A"], "obj_cui": ["B"],
                       "count": [17]})
    got = _run(df, "broadcast")
    assert got["npmi"].iloc[0] == 1.0
    assert abs(got["pmi"].iloc[0] - np.log(17 * 17 / (17 * 17))) < 1e-12


def test_pmi_empty(ray_session):
    df = _pairs().iloc[:0]
    got = pmi_edges(rd.from_pandas(df), method="auto")
    assert got.count() == 0


def test_pmi_auto_gate(ray_session):
    df = _pairs(seed=5)
    # tiny broadcast_limit forces the join path through "auto"
    a = pmi_edges(rd.from_pandas(df).repartition(4), method="auto",
                  broadcast_limit=1).to_pandas() \
        .sort_values(["subj_cui", "obj_cui"]).reset_index(drop=True)
    b = _run(df, "broadcast")
    pd.testing.assert_frame_equal(b, a[b.columns])


def test_pmi_randomized_twins(ray_session):
    for seed in (31, 32, 33):
        rng = np.random.default_rng(seed)
        n_s, n_o = int(rng.integers(2, 25)), int(rng.integers(2, 25))
        df = _pairs(n_s, n_o, seed=seed)
        if df.empty:
            continue
        got = _run(df, "broadcast")
        t = df["count"].sum()
        cs = df.groupby("subj_cui")["count"].sum()
        co = df.groupby("obj_cui")["count"].sum()
        want = df.sort_values(["subj_cui", "obj_cui"]) \
            .reset_index(drop=True)
        pmi = np.log(want["count"].to_numpy() * t
                     / (cs[want["subj_cui"]].to_numpy()
                        * co[want["obj_cui"]].to_numpy()))
        assert np.allclose(got["pmi"].to_numpy(), pmi, rtol=1e-12), seed


def test_pmi_all_null_counts_fail_loud(ray_session):
    import pytest
    df = pd.DataFrame({"subj_cui": ["A", "B"], "obj_cui": ["B", "C"],
                       "count": pd.array([None, None], dtype="Int64")})
    with pytest.raises(Exception, match="NULL|null"):
        pmi_edges(rd.from_pandas(df)).to_pandas()
