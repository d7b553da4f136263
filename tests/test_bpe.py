"""Distributed BPE learning (ops/bpe.py)."""

import duckdb
import pandas as pd
import pytest

import ray.data as rd

from medcat_ray.ops.bpe import (bpe_encode, bpe_learn, merge_symbols,
                                word_histogram)
from medcat_ray.ops.sql_oracle import bpe_sql

WORDS_SRC = ("SELECT word, CAST(count(*) AS BIGINT) AS freq FROM ("
             "SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))"
             " AS word FROM documents) GROUP BY word")


def test_merge_symbols_left_to_right():
    # non-overlapping left-to-right: "aaa" with (a,a) -> [aa, a]
    assert merge_symbols(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert merge_symbols(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    # freshly merged token never left-matches the same rule
    assert merge_symbols(["a", "b", "b"], "a", "b") == ["ab", "b"]
    assert merge_symbols(["a", "a", "b"], "a", "a") == ["aa", "b"]
    # adjacent occurrences both merge
    assert merge_symbols(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    assert merge_symbols(["x"], "a", "b") == ["x"]
    assert merge_symbols([], "a", "b") == []


def test_merge_symbols_equals_wrapped_replace():
    # the SQL twin applies merges via a wrapped-string replace; prove the
    # two formulations identical on adversarial symbol streams
    import itertools
    for syms in itertools.product("ab", repeat=6):
        syms = list(syms)
        for a, b in (("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")):
            ws = "\x1f" + "\x1f\x1f".join(syms) + "\x1f"
            ws2 = ws.replace(f"\x1f{a}\x1f\x1f{b}\x1f", f"\x1f{a}{b}\x1f")
            via_sql = ws2[1:-1].split("\x1f\x1f")
            assert merge_symbols(syms, a, b) == via_sql, (syms, a, b)


@pytest.fixture(scope="module")
def tiny_docs():
    return pd.DataFrame({"doc_id": range(6), "text": [
        "the cat sat on the mat", "the cats sat",
        "a banana and a bandana", "banana bandana banana",
        "aaa aab aaa baa", "the the the cat cat"]})


def test_bpe_learn_matches_sql_twin(ray_session, tiny_docs):
    ds = rd.from_pandas(tiny_docs).repartition(3)
    merges, vocab = bpe_learn(ds, n_merges=6)
    con = duckdb.connect()
    con.register("documents", tiny_docs)
    sql = "WITH " + bpe_sql(WORDS_SRC, 6) + \
        "\nSELECT merge_idx, s1, s2, cnt FROM merges ORDER BY merge_idx"
    ora = con.execute(sql).fetchdf()
    assert [(r.s1, r.s2, r.cnt) for r in ora.itertuples()] == merges
    seg_sql = "WITH " + bpe_sql(WORDS_SRC, 6) + """
SELECT word, freq, array_to_string(string_split(
    substr(ws, 2, length(ws) - 2), chr(31) || chr(31)), ' ') AS seg
FROM r6 ORDER BY word"""
    ora_seg = con.execute(seg_sql).fetchdf()
    got = vocab.to_pandas().sort_values("word").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["word", "freq", "seg"]], ora_seg)


def test_bpe_encode_counts(ray_session, tiny_docs):
    ds = rd.from_pandas(tiny_docs)
    merges, vocab = bpe_learn(ds, n_merges=4)
    seg_map = {r["word"]: r["seg"].split(" ")
               for r in vocab.to_pandas().to_dict("records")}
    enc = bpe_encode(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    import re
    for i, text in enumerate(tiny_docs["text"]):
        toks = []
        for w in re.findall(r"[a-z0-9]+", text.lower()):
            toks.extend(seg_map[w])
        assert enc.loc[i, "n_tokens"] == len(toks)
        assert enc.loc[i, "n_distinct_tokens"] == len(set(toks))
    # every doc token stream concatenates back to its letters
    for i, text in enumerate(tiny_docs["text"]):
        letters = "".join(re.findall(r"[a-z0-9]+", text.lower()))
        n = sum(len(s) for w in
                __import__("re").findall(r"[a-z0-9]+", text.lower())
                for s in seg_map[w])
        assert n == len(letters)


def test_word_histogram_min_freq(ray_session, tiny_docs):
    ds = rd.from_pandas(tiny_docs)
    h = word_histogram(ds, min_freq=2).to_pandas()
    assert (h["freq"] >= 2).all()
    assert "the" in set(h["word"])
    full = word_histogram(ds).to_pandas()
    assert set(full[full["freq"] >= 2]["word"]) == set(h["word"])


def test_bpe_learn_exhausts_gracefully(ray_session):
    # single-char words: no pairs at all -> zero merges, not an error
    docs = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "a b"]})
    merges, vocab = bpe_learn(rd.from_pandas(docs), n_merges=3)
    assert merges == []
    assert sorted(vocab.to_pandas()["seg"]) == ["a", "b", "c"]
