"""Unit tests for ops/textclean.py (C4-style line cleaning)."""

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
