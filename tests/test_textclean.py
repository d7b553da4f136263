"""Unit tests for ops/textclean.py (C4-style line cleaning)."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from medcat_ray.ops.textclean import clean_lines


def _run(texts, **kw):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    return clean_lines(ds, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def test_line_filters():
    out = _run(["Keep this full line.\n"
                "menu\n"
                "Also keep this one here!\n"
                "And a quoted line stays \"\n"
                "no terminal punctuation line\n"
                "Please enable JavaScript to continue reading.\n"
                "Lorem ipsum dolor sit amet.\n"
                "var x = { a: 1 };\n"
                "Tail question keeps it alive?"])
    r = out.iloc[0]
    assert r.n_lines == 9
    assert r.n_kept_lines == 4
    assert r.clean_text.split("\n") == [
        "Keep this full line.",
        "Also keep this one here!",
        'And a quoted line stays "',
        "Tail question keeps it alive?"]
    assert bool(r.c4_keep)


def test_min_words_and_doc_threshold():
    out = _run(["One two.\nOne two three.\nFour five six seven.",
                "Only one good line here."],
               min_words=3, min_kept_lines=2)
    assert out.n_kept_lines.tolist() == [2, 1]
    assert out.c4_keep.tolist() == [True, False]
    # "One two." has 2 words -> dropped
    assert out.iloc[0].clean_text == "One two three.\nFour five six seven."


def test_empty_null_and_whitespace():
    out = _run(["", None, "   \n  "])
    assert out.n_kept_lines.tolist() == [0, 0, 0]
    assert (~out.c4_keep).all()
    assert out.clean_text.tolist() == ["", "", ""]
    # "" splits to one empty line; the whitespace doc has two lines
    assert out.n_lines.tolist() == [1, 1, 2]


def test_trailing_whitespace_rtrim():
    out = _run(["Ends with period then spaces.   \nAnd tab after bang!\t"],
               min_kept_lines=1)
    assert out.iloc[0].n_kept_lines == 2
    assert bool(out.iloc[0].c4_keep)


# ---------------------------------------------------------------------------
# span_dedup
# ---------------------------------------------------------------------------

_SPAN_DOCS = [
    (0, "A\nB\nC\nD\nunique0"),    # keeper of spans ABC and BCD
    (1, "x1\nA\nB\nC\nD\ny1"),     # dup ABC + BCD -> lines 1..4 removed
    (2, "A\nB\nC\nzz2"),           # dup ABC -> lines 0..2 removed
    (3, "totally\nunrelated\ndoc"),
    (4, "short"),                   # fewer than span lines: untouched
]


def _span_ds():
    import pyarrow as pa
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in _SPAN_DOCS], pa.int64()),
        "text": pa.array([t for _, t in _SPAN_DOCS])}))


def test_span_dedup_semantics(ray_session):
    from medcat_ray.ops.textclean import span_dedup
    out = span_dedup(_span_ds(), method="broadcast").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.n_removed_lines.tolist() == [0, 4, 3, 0, 0]
    assert out.clean_text.tolist()[:3] == [
        "A\nB\nC\nD\nunique0", "x1\ny1", "zz2"]


def test_span_dedup_join_equals_broadcast(ray_session):
    from medcat_ray.ops.textclean import span_dedup
    cols = ["doc_id", "n_removed_lines", "clean_text"]
    a = span_dedup(_span_ds(), method="broadcast").to_pandas()[cols] \
        .sort_values("doc_id").reset_index(drop=True)
    b = span_dedup(_span_ds(), method="join").to_pandas()[cols] \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_span_dedup_no_duplicates(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from medcat_ray.ops.textclean import span_dedup
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a\nb\nc\nd", "e\nf\ng\nh"])}))
    for method in ("broadcast", "join"):
        out = span_dedup(ds, method=method).to_pandas()
        assert out.n_removed_lines.tolist() == [0, 0]
        assert out.clean_text.tolist() == ["a\nb\nc\nd", "e\nf\ng\nh"]


# ---------------------------------------------------------------------------
# split_sentences
# ---------------------------------------------------------------------------

def test_split_sentences(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from medcat_ray.ops.textclean import split_sentences
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "First one. Second!  Third?? tail without end",
            "",
            "only.a.run...",
        ])}))
    out = split_sentences(ds).to_pandas() \
        .sort_values(["doc_id", "sent_idx"]).reset_index(drop=True)
    d0 = out[out.doc_id == 0]
    assert d0.sentence.tolist() == [
        "First one.", "Second!", "Third??", "tail without end"]
    assert d0.sent_idx.tolist() == [0, 1, 2, 3]
    assert (out.doc_id == 1).sum() == 0          # empty doc: no rows
    # the regex splits at every terminal-punctuation run (no
    # abbreviation heuristics) — defined, documented behavior
    assert out[out.doc_id == 2].sentence.tolist() == \
        ["only.", "a.", "run..."]


def test_span_dedup_rejects_over_maxpos_doc(ray_session):
    """A document with >= 2^20 lines would silently collide keeper keys
    into other documents; the bound must fail loudly instead."""
    import ray.data as rd
    from medcat_ray.ops import textclean

    orig = textclean._MAXPOS
    textclean._MAXPOS = 64            # shrink the bound for the test
    try:
        big = "\n".join(f"line {i}" for i in range(80))
        ds = rd.from_items([{"doc_id": 1, "text": big}])
        with pytest.raises(Exception) as ei:
            textclean.span_dedup(ds, method="broadcast").to_pandas()
        assert "lines-per-document bound" in str(ei.value)
        # under the bound: same pipeline succeeds
        small = "\n".join(f"line {i}" for i in range(40))
        out = textclean.span_dedup(
            rd.from_items([{"doc_id": 1, "text": small}]),
            method="broadcast").to_pandas()
        assert out["n_removed_lines"].iloc[0] == 0
    finally:
        textclean._MAXPOS = orig


def test_dedup_doc_lines_matches_duckdb(ray_session):
    import duckdb
    from medcat_ray.ops.textclean import (dedup_doc_lines,
                                          dedup_lines_oracle_sql)
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["a\nb\na\nc\nb", "x", "", None,
                 "same\nsame\nsame", "one\ntwo\nthree"]})
    got = dedup_doc_lines(rd.from_pandas(df)) \
        .select_columns(["doc_id", "clean_text", "n_removed_lines"]) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(dedup_lines_oracle_sql()).df()
    exp["n_removed_lines"] = exp["n_removed_lines"].astype("int64")
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    assert got.loc[0, "clean_text"] == "a\nb\nc"
    assert got.loc[4, "clean_text"] == "same"
    assert got.loc[4, "n_removed_lines"] == 2
