"""BM25 scoring (ops/bm25.py) — hand-computed twin."""

import math

import numpy as np
import pytest

import ray.data as rd

from medcat_ray.ops.bm25 import bm25_scores, bm25_stats

DOCS = ["the spark engine", "spark spark stream", "a table of tables",
        "", "stream table spark stream"]


def _hand(query, k1=1.2, b=0.75):
    toks = [d.lower().split() for d in DOCS]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    out = {}
    for q in query:
        df = sum(1 for t in toks if q in t)
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, t in enumerate(toks):
            tf = t.count(q)
            if tf:
                out[(i, q)] = (tf, df, idf * tf * (k1 + 1)
                               / (tf + k1 * (1 - b + b * len(t) / avgdl)))
    return out


def test_stats(ray_session):
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(DOCS)]).repartition(2)
    n, tot, dfs = bm25_stats(ds, ["spark", "stream", "table"])
    assert n == 5 and tot == sum(len(d.split()) for d in DOCS)
    assert dfs.tolist() == [3, 2, 2]  # sorted terms: spark, stream, table


def test_scores_match_hand(ray_session):
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(DOCS)]).repartition(2)
    out = bm25_scores(ds, ["spark", "stream", "table"]).to_pandas()
    want = _hand(["spark", "stream", "table"])
    got = {(int(r.doc_id), r.term): (int(r.tf), int(r.df), r.score)
           for r in out.itertuples()}
    assert set(got) == set(want)
    for key, (tf, df, s) in want.items():
        gtf, gdf, gs = got[key]
        assert (gtf, gdf) == (tf, df)
        assert np.isclose(gs, s, rtol=1e-12)


def test_empty_terms_raises(ray_session):
    ds = rd.from_items([{"doc_id": 0, "text": "x"}])
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(ds, [])
