"""Exact substring dedup (ops/substr.py) — all paths vs the DuckDB twin."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from medcat_ray.ops.substr import (substring_dedup,
                                   substring_dedup_oracle_sql,
                                   _window_hashes)

BOILER = ("the quick brown fox jumps over the lazy dog again and again"
          " today")  # 13 tokens > window


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(50)]
    docs = []
    for i in range(40):
        body = " ".join(rng.choice(words, size=rng.integers(0, 30)))
        if i % 3 == 0:
            body += " " + BOILER + " " + " ".join(
                rng.choice(words, size=5))
        if i % 7 == 0:
            body = BOILER + " " + body
        docs.append(body)
    docs += ["", BOILER, BOILER]    # empty doc; fully-duplicated pair
    return pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                         "text": docs})


@pytest.mark.parametrize("method", ["broadcast", "join"])
def test_substring_dedup_matches_duckdb(ray_session, corpus, method):
    got = substring_dedup(rd.from_pandas(corpus), window=10,
                          method=method) \
        .select_columns(["doc_id", "clean_text", "n_removed_tokens"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", corpus)
    exp = con.execute(substring_dedup_oracle_sql(window=10)).df()
    exp["n_removed_tokens"] = exp["n_removed_tokens"].astype("int64")
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    assert got["n_removed_tokens"].sum() > 0          # removals happened


def test_substring_dedup_keeper_survives(ray_session):
    df = pd.DataFrame({
        "doc_id": np.array([5, 9, 11], dtype=np.int64),
        "text": [BOILER + " unique tail here",
                 BOILER,                       # loses the boiler span
                 "completely unrelated text"]})
    out = substring_dedup(rd.from_pandas(df), window=10,
                          method="broadcast").to_pandas() \
        .set_index("doc_id")
    # the keeper is the globally smallest (doc, pos): doc 5 keeps it
    assert out.loc[5, "clean_text"] == BOILER + " unique tail here"
    assert out.loc[5, "n_removed_tokens"] == 0
    assert out.loc[9, "clean_text"] == ""
    assert out.loc[9, "n_removed_tokens"] == len(BOILER.split())
    assert out.loc[11, "n_removed_tokens"] == 0
    # exactly one copy of every boiler window survives corpus-wide
    boiler_hashes = set(int(h) for h in _window_hashes(BOILER, 10)[2])
    count = 0
    for _, row in out.iterrows():
        hs = [int(h) for h in _window_hashes(row["clean_text"], 10)[2]]
        count += sum(1 for h in hs if h in boiler_hashes)
    assert count == len(boiler_hashes)


def test_substring_dedup_no_dups_is_identity_modulo_ws(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["a  b\tc", "totally different words"]})
    out = substring_dedup(rd.from_pandas(df), window=3,
                          method="broadcast").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_removed_tokens"]) == [0, 0]
    assert out.loc[0, "clean_text"] == "a b c"   # token-normalized


def test_substring_dedup_token_bound(ray_session):
    big = " ".join(["x"] * (1 << 20))
    df = pd.DataFrame({"doc_id": [0], "text": [big]})
    with pytest.raises(Exception) as ei:
        substring_dedup(rd.from_pandas(df), window=10,
                        method="broadcast").to_pandas()
    assert "2^20" in str(ei.value) or "RayTaskError" in str(type(ei.value))
