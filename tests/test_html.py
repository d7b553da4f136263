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
