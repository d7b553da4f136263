"""HTML→text extractor: frozen-behavior tests (the per-url byte-identity
contract, BASELINE.json input_hint)."""

from medcat_ray.functions.html import extract_text


def test_basic_blocks():
    html = "<html><body><p>Hello  world</p><p>Second para</p></body></html>"
    assert extract_text(html) == "Hello world\nSecond para"


def test_script_style_comment_dropped():
    html = ("<html><head><title>T</title><style>p{color:red}</style>"
            "<script>var x=1;</script></head>"
            "<body><!-- hidden --><p>Visible</p><noscript>no js</noscript>"
            "</body></html>")
    assert extract_text(html) == "T\nVisible"


def test_inline_tags_do_not_break_words():
    html = "<p>Hy<b>per</b>text and <i>italic</i> words</p>"
    assert extract_text(html) == "Hypertext and italic words"


def test_entities_decoded():
    assert extract_text("<p>a &amp; b &lt;c&gt; &#65;</p>") == "a & b <c> A"


def test_bytes_input_utf8():
    assert extract_text("<p>naïve café</p>".encode("utf-8")) == "naïve café"


def test_bytes_input_invalid_utf8_replaced():
    out = extract_text(b"<p>ok \xff bad</p>")
    assert out.startswith("ok")


def test_whitespace_collapsed_within_block():
    assert extract_text("<div>  a\n\t b   c  </div>") == "a b c"


def test_unclosed_tags_tolerated():
    assert extract_text("<p>open <div>block") == "open\nblock"


def test_empty_and_garbage():
    assert extract_text("") == ""
    assert extract_text("no tags at all") == "no tags at all"


def test_fast_extractor_differential_fuzz():
    """The fast scanner must be byte-identical to the HTMLParser path on
    every page it accepts (it may bail — never diverge).  Seeded tag-soup
    + noise fuzz; fixture corpora are covered by the byte-identity tests
    above and by the flagship oracle."""
    import random
    from medcat_ray.functions.html import _fast_extract, _TextExtractor

    def slow(html):
        p = _TextExtractor()
        try:
            p.feed(html)
            p.close()
        except Exception:
            pass
        return p.result()

    rng = random.Random(20260817)
    atoms = ["<div>", "</div>", "<p class='x y'>", "<span>", "</span>",
             "<script>", "</script>", "<script type=\"text/javascript\">",
             "var x = '<div>' < 3 && y;", "<style>", "</style>",
             "<!-- c -- >", "<!-- unterminated", "<!doctype html>",
             "<?php echo '>' ?>", "<![CDATA[x]]>", "<br/>",
             "<img src='a>b'/>", "<a href=\"x?a=1&amp;b=2\">", "</a>",
             "text &amp; more", "&lt;tag&gt;", "&#65;&#x42;", "&unknown;",
             "& loose", "plain words", "\n", "  ", "<", ">", "</>",
             "</ weird>", "<1notatag>", "<a b=c d>", "<li>", "</li>",
             "<A HREF='Y'>", "</A>", "café 中文", "&#;", "<!bogus>",
             "</p att='v'>", "<noscript>", "</noscript>", "<title>",
             "</title>", "<ScRiPt>", "</sCrIpT >"]
    n_ok = 0
    for _ in range(4000):
        s = "".join(rng.choice(atoms)
                    for _ in range(rng.randint(1, 12)))
        fast = _fast_extract(s)
        if fast is not None:
            assert fast == slow(s), repr(s)
            n_ok += 1
    alpha = "<>/!?&;#abcdABCD \"'=-\n"
    for _ in range(4000):
        s = "".join(rng.choice(alpha)
                    for _ in range(rng.randint(0, 60)))
        fast = _fast_extract(s)
        if fast is not None:
            assert fast == slow(s), repr(s)
            n_ok += 1
    assert n_ok > 4000   # the fast path must actually engage


def test_fast_extractor_handles_fixture_pages_without_bail():
    """Every generator-produced fixture page must take the fast path (the
    whole point), and match its stored text byte-for-byte."""
    import glob
    import pyarrow.parquet as pq
    from medcat_ray.functions.html import _fast_extract
    files = sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))
    # build a pages table from documents via the entry() generator path
    from medcat_ray.fixtures import pages_from_documents
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        pages_from_documents("/root/testdata/sf0.001/documents.parquet", d)
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            t = pq.read_table(f, columns=["html", "text"])
            for h, txt in zip(t["html"].to_pylist(),
                              t["text"].to_pylist()):
                got = _fast_extract(h.decode("utf-8", errors="replace"))
                assert got is not None and got == txt


def test_extract_text_without_fast_scanner(monkeypatch):
    """If CPython's private tolerant-tag regexes ever disappear, the
    module must import and extract via the authoritative HTMLParser
    path (gated by _HAVE_FAST) rather than fail."""
    from medcat_ray.functions import html as h
    page = "<html><body><p>Hello <b>world</b></p><script>x</script></body></html>"
    monkeypatch.setattr(h, "_HAVE_FAST", False)
    assert h.extract_text(page) == "Hello world"
    monkeypatch.undo()
    assert h.extract_text(page) == "Hello world"
