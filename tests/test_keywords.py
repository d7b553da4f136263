"""Unit tests for ops/keywords.py (TF-IDF keyword extraction)."""

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from medcat_ray.ops.keywords import doc_frequencies, top_keywords


def _ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_df_and_ranking_by_hand(ray_session):
    texts = ["apple apple banana", "banana cherry", "apple cherry cherry"]
    ds = _ds(texts)
    terms, dfs = doc_frequencies(ds)
    assert terms.tolist() == ["apple", "banana", "cherry"]
    assert dfs.tolist() == [2, 2, 2]
    out = top_keywords(ds, 3, terms, dfs, k=2).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    # doc0: apple tf=2 first, banana tf=1 second (df tie, term asc)
    assert out[out.doc_id == 0].term.tolist() == ["apple", "banana"]
    # doc1: banana/cherry tf=1 df=2 -> term asc
    assert out[out.doc_id == 1].term.tolist() == ["banana", "cherry"]
    # doc2: cherry tf=2 first
    assert out[out.doc_id == 2].term.tolist() == ["cherry", "apple"]
    got = out[(out.doc_id == 0) & (out.term == "apple")].tfidf.iloc[0]
    assert np.isclose(got, 2 * math.log(3 / 2))


def test_rarity_breaks_tf_ties(ray_session):
    texts = ["common rare", "common other", "common more"]
    ds = _ds(texts)
    terms, dfs = doc_frequencies(ds)
    out = top_keywords(ds, 3, terms, dfs, k=1).to_pandas()
    # tf all 1; df(common)=3 > df(rare)=1 -> rare wins in doc0
    assert out[out.doc_id == 0].term.tolist() == ["rare"]


def test_min_df_prunes_and_empty_docs(ray_session):
    texts = ["a a b", "", None, "a c"]
    ds = _ds(texts)
    terms, dfs = doc_frequencies(ds, min_df=2)
    assert terms.tolist() == ["a"]
    out = top_keywords(ds, 4, terms, dfs, k=5).to_pandas()
    # only 'a' survives; empty/None docs emit nothing
    assert sorted(out.doc_id.tolist()) == [0, 3]
    assert set(out.term) == {"a"}
