"""HyperLogLog sketch (ops/sketch.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from medcat_ray.ops.sketch import (hll_estimate, hll_oracle_sql,
                                   hll_registers, _rho)


def test_rho_integer_arithmetic():
    bits = 52
    assert _rho(np.array([0], dtype=np.uint64), bits)[0] == bits + 1
    assert _rho(np.array([1], dtype=np.uint64), bits)[0] == bits
    top = np.uint64(1) << np.uint64(bits - 1)
    assert _rho(np.array([top], dtype=np.uint64), bits)[0] == 1
    assert _rho(np.array([top - np.uint64(1)], dtype=np.uint64),
                bits)[0] == 2


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    words = [f"tok{i}" for i in range(5000)]
    texts = [" ".join(rng.choice(words, size=rng.integers(5, 60)))
             for _ in range(400)]
    texts += ["", None, "Tab\tmixed CASE case"]
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                         "text": texts})


def test_hll_registers_match_duckdb_exactly(ray_session, corpus):
    reg = hll_registers(rd.from_pandas(corpus).repartition(5), p=10)
    nz = np.nonzero(reg)[0]
    got = pd.DataFrame({"bucket": nz.astype("int64"),
                        "register": reg[nz].astype("int64")})
    con = duckdb.connect()
    con.register("documents", corpus)
    exp = con.execute(hll_oracle_sql(p=10)).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_hll_estimate_accuracy(ray_session, corpus):
    true = len({w for t in corpus["text"] if t
                for w in t.lower().split()})
    reg = hll_registers(rd.from_pandas(corpus), p=10)
    est = hll_estimate(reg)
    assert abs(est - true) / true < 0.10      # ~3.2% typical at p=10

    # small-range branch: a handful of distinct tokens
    small = pd.DataFrame({"text": ["a b c d e"]})
    reg_s = hll_registers(rd.from_pandas(small), p=10)
    est_s = hll_estimate(reg_s)
    assert abs(est_s - 5) < 1.0


def test_hll_partials_associative(ray_session, corpus):
    one = hll_registers(rd.from_pandas(corpus), p=8)
    many = hll_registers(rd.from_pandas(corpus).repartition(11), p=8)
    assert np.array_equal(one, many)


def test_hll_p_validation(ray_session):
    with pytest.raises(ValueError):
        hll_registers(rd.from_pandas(pd.DataFrame({"text": ["x"]})), p=3)


def test_cms_matches_duckdb_exactly(ray_session, corpus):
    from medcat_ray.ops.sketch import cms_counts, cms_oracle_sql
    M = cms_counts(rd.from_pandas(corpus).repartition(5),
                   depth=4, width=512)
    rows = []
    for j in range(4):
        nz = np.nonzero(M[j])[0]
        for b in nz:
            rows.append((j, int(b), int(M[j, b])))
    got = pd.DataFrame(rows, columns=["row", "bucket", "count"]) \
        .astype("int64")
    con = duckdb.connect()
    con.register("documents", corpus)
    exp = con.execute(cms_oracle_sql(depth=4, width=512)).df()
    pd.testing.assert_frame_equal(
        got.sort_values(["row", "bucket"]).reset_index(drop=True), exp)


def test_cms_estimate_upper_bounds_truth(ray_session, corpus):
    from collections import Counter
    from medcat_ray.ops.sketch import cms_counts, cms_estimate
    M = cms_counts(rd.from_pandas(corpus), depth=4, width=1 << 12)
    true = Counter(w for t in corpus["text"] if t
                   for w in t.lower().split())
    probes = ["tok1", "tok99", "case", "never-seen-token"]
    est = cms_estimate(M, probes)
    for p, e in zip(probes, est):
        assert e >= true.get(p, 0)
    assert est[-1] >= 0
    # partials add associatively
    M2 = cms_counts(rd.from_pandas(corpus).repartition(9),
                    depth=4, width=1 << 12)
    assert np.array_equal(M, M2)


def test_hll_grouped_matches_per_group_registers(ray_session):
    """Grouped registers == running hll_registers per group subset, and
    per-group estimates land within 15% of true distincts."""
    import numpy as np
    import ray.data as rd
    from medcat_ray.ops.sketch import (hll_estimate_grouped, hll_registers,
                                       hll_registers_grouped)
    rng = np.random.default_rng(8)
    rows = []
    for i in range(400):
        g = f"g{i % 3}"
        words = [f"w{g}_{rng.integers(0, 500)}" for _ in range(20)]
        rows.append({"grp": g, "text": " ".join(words)})
    ds = rd.from_items(rows).repartition(4)
    grouped = hll_registers_grouped(ds, "grp", p=10).to_pandas()
    for g in ["g0", "g1", "g2"]:
        sub = rd.from_items([r for r in rows if r["grp"] == g])
        want = hll_registers(sub, p=10)
        got = np.zeros(1 << 10, dtype=np.int64)
        part = grouped[grouped["grp"] == g]
        got[part["bucket"].to_numpy()] = part["register"].to_numpy()
        assert (got == want).all(), g
    est = hll_estimate_grouped(grouped.to_dict("records"), p=10,
                               group_col="grp")
    for g in ["g0", "g1", "g2"]:
        true = len({w for r in rows if r["grp"] == g
                    for w in r["text"].split()})
        assert abs(est[g] - true) / true < 0.15, (g, est[g], true)


def test_cms_heavy_hitters_superset_and_exact_est(ray_session):
    import numpy as np
    import ray.data as rd
    from medcat_ray.ops.sketch import (cms_counts, cms_estimate,
                                       cms_heavy_hitters)
    rng = np.random.default_rng(4)
    # heavy terms h0..h2 (200+ occurrences), light tail
    texts = []
    for i in range(300):
        ws = [f"h{i % 3}"] + [f"t{rng.integers(0, 2000)}" for _ in range(8)]
        texts.append(" ".join(ws))
    ds = rd.from_items([{"text": t} for t in texts]).repartition(3)
    out = cms_heavy_hitters(ds, threshold=90, depth=4,
                            width=1 << 10).to_pandas()
    got = dict(zip(out["term"], out["est"]))
    # all true heavy terms present (CMS never underestimates)
    assert {"h0", "h1", "h2"} <= set(got)
    # estimates equal a direct sketch probe
    sk = cms_counts(ds, depth=4, width=1 << 10)
    probe = cms_estimate(sk, sorted(got))
    assert probe.tolist() == [got[t] for t in sorted(got)]
    # estimate upper-bounds the true count
    assert all(got[f"h{i}"] >= 100 for i in range(3))
