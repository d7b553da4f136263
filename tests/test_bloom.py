"""Bloom-filter incremental dedup (ops/bloom.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from medcat_ray.ops.bloom import (bloom_oracle_sql, build_bloom,
                                  probe_bloom)


@pytest.fixture(scope="module")
def split_corpus():
    texts = [f"document body number {i} with words" for i in range(60)]
    texts[31] = texts[30]          # planted exact dup (odd copies even)
    texts[7] = texts[6]
    texts[11] = ""                 # empty probe text
    texts[13] = None               # null probe text
    return pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                         "text": texts})


def test_bloom_matches_duckdb_fp_included(ray_session, split_corpus):
    # deliberately tiny filter so false positives are plausible — the
    # oracle recomputes the identical arithmetic either way
    M, K = 1 << 12, 4
    ex = split_corpus[split_corpus.doc_id % 2 == 0]
    nw = split_corpus[split_corpus.doc_id % 2 == 1]
    bloom = build_bloom(rd.from_pandas(ex), m_bits=M, k=K)
    got = probe_bloom(rd.from_pandas(nw), bloom, m_bits=M, k=K) \
        .select_columns(["doc_id", "maybe_seen"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", split_corpus)
    exp = con.execute(bloom_oracle_sql(
        "doc_id % 2 = 0", "doc_id % 2 = 1", m_bits=M, k=K)).df()
    pd.testing.assert_frame_equal(got, exp)


def test_bloom_no_false_negatives(ray_session, split_corpus):
    M, K = 1 << 20, 4
    ex = split_corpus[split_corpus.doc_id % 2 == 0]
    nw = split_corpus[split_corpus.doc_id % 2 == 1]
    bloom = build_bloom(rd.from_pandas(ex), m_bits=M, k=K)
    got = probe_bloom(rd.from_pandas(nw), bloom, m_bits=M, k=K) \
        .to_pandas().set_index("doc_id")
    assert bool(got.loc[31, "maybe_seen"])
    assert bool(got.loc[7, "maybe_seen"])
    # at 2^20 bits / 30 elements the planted dups should be the only hits
    assert int(got["maybe_seen"].sum()) == 2


def test_bloom_partials_or_associative(ray_session, split_corpus):
    # building from 1 block vs many blocks yields the identical bitmap
    ex = split_corpus[split_corpus.doc_id % 2 == 0]
    one = build_bloom(rd.from_pandas(ex), m_bits=1 << 12, k=3)
    many = build_bloom(rd.from_pandas(ex).repartition(7),
                       m_bits=1 << 12, k=3)
    assert np.array_equal(one, many)


def test_bloom_m_bits_validation(ray_session):
    with pytest.raises(ValueError):
        build_bloom(rd.from_pandas(
            pd.DataFrame({"text": ["x"]})), m_bits=100)
