"""Deterministic HTML → text extraction.

The reference (CogStack/MedCAT) has **no** HTML handling — it consumes plain
clinical text (`medcat/cat.py:492-536`).  Our north rule adds Common-Crawl-style
pages `(url, warc_ts, html, text, lang)` and requires per-url byte-identical
extracted text, so this module defines THE single frozen extractor: the fixture
generator, the test oracle and the pipeline all import ``extract_text`` from
here.  Behavior is versioned — any change must bump ``EXTRACTOR_VERSION``
(which is recorded in partition lineage and invalidates resume).

Rules (frozen, v1):
  * input is ``bytes`` (decoded as UTF-8, errors replaced) or ``str``;
  * content of <script> <style> <noscript> <template> <svg> <iframe> and
    HTML comments is dropped;
  * character/entity references are decoded;
  * block-level tags open/close a text block; inline tags do not break words;
  * whitespace inside a block is collapsed to single spaces and trimmed;
  * output is the non-empty blocks joined by a single ``\\n``.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List

EXTRACTOR_VERSION = "1"

_SKIP_CONTENT_TAGS = frozenset(
    {"script", "style", "noscript", "template", "svg", "iframe"})

_BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "details", "div", "dl", "dt", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header",
    "hr", "html", "li", "main", "nav", "ol", "option", "p", "pre", "section",
    "summary", "table", "tbody", "td", "tfoot", "th", "thead", "title", "tr",
    "ul",
})


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._blocks: List[str] = []
        self._cur: List[str] = []

    def _flush_block(self) -> None:
        if self._cur:
            text = " ".join("".join(self._cur).split())
            if text:
                self._blocks.append(text)
            self._cur = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_CONTENT_TAGS:
            self._skip_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush_block()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag in _BLOCK_TAGS:
            self._flush_block()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._flush_block()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._cur.append(data)

    def result(self) -> str:
        self._flush_block()
        return "\n".join(self._blocks)


def extract_text(html: "bytes | str") -> str:
    """Extract visible text from an HTML page.  Deterministic; see module doc."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # html.parser is tolerant; on a truly pathological page fall back to
        # whatever was accumulated so a poison row never fails a block
        # (reference analogue: per-doc try/except, medcat/cat.py:1683-1686).
        pass
    return parser.result()
