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


# ---------------------------------------------------------------------------
# Fast scanner.
#
# html.parser costs ~170µs/KB (regex-callback machinery, updatepos line
# counting, attr tuples we never read) and extraction is ~35% of the fused
# KG actor's wall time.  ``_fast_extract`` re-implements EXACTLY the subset
# of html.parser behavior the v1 extractor can observe (start/end/startend
# tag names, data runs, script/style CDATA mode, comments/PIs/doctype
# consumed silently) using CPython's OWN tolerant tag regexes, and returns
# ``None`` — caller falls back to the real HTMLParser — the moment the page
# shows any construct with nontrivial recovery semantics (unterminated
# tags/comments, junk inside a start tag, marked sections, EOF mid-tag).
# Byte-identity with the parser path is enforced by differential tests
# (fixtures + hypothesis fuzz, tests/test_html.py) and by every fixture's
# stored ``text`` column (north rule).  ~6× faster on Common-Crawl-style
# pages; EXTRACTOR_VERSION stays "1" because observable output is
# unchanged.
# ---------------------------------------------------------------------------

import re as _re
from html import unescape as _unescape

try:
    # CPython-private tolerant tag regexes: the fast scanner reuses them
    # to guarantee recovery-semantics parity with HTMLParser.  If a future
    # CPython renames/removes them, degrade to the authoritative
    # HTMLParser path instead of failing the whole module import.
    from html.parser import (tagfind_tolerant as _tagfind,
                             locatestarttagend_tolerant as _locatestart,
                             endtagfind as _endtagfind)
    _HAVE_FAST = True
except ImportError:            # pragma: no cover - interpreter-dependent
    _tagfind = _locatestart = _endtagfind = None
    _HAVE_FAST = False

_COMMENT_CLOSE = _re.compile(r"--\s*>")
_CDATA_TAGS = ("script", "style")   # HTMLParser.CDATA_CONTENT_ELEMENTS
_CDATA_CLOSE = {t: _re.compile(r"</\s*%s" % t, _re.IGNORECASE)
                for t in _CDATA_TAGS}


def _fast_extract(s: str):
    """Scanner twin of ``_TextExtractor`` over well-formed-enough pages;
    ``None`` = bail to the HTMLParser path (see block comment above)."""
    blocks: List[str] = []
    cur: List[str] = []
    skip_depth = 0
    find = s.find
    n = len(s)
    i = 0

    def flush() -> None:
        nonlocal cur
        if cur:
            text = " ".join("".join(cur).split())
            if text:
                blocks.append(text)
            cur = []

    while i < n:
        j = find("<", i)
        if j < 0:
            if skip_depth == 0 and i < n:
                cur.append(_unescape(s[i:n]))
            break
        if skip_depth == 0 and j > i:
            cur.append(_unescape(s[i:j]))
        c = s[j + 1:j + 2]
        if ("a" <= c <= "z") or ("A" <= c <= "Z"):
            m = _locatestart.match(s, j)
            if m is None:
                return None
            k = m.end()
            nxt = s[k:k + 1]
            if nxt == ">":
                selfclose = False
                end_k = k + 1
            elif nxt == "/" and s.startswith("/>", k):
                selfclose = True
                end_k = k + 2
            else:
                return None     # junk-in-tag / EOF recovery paths
            tag = _tagfind.match(s, j + 1).group(1).lower()
            if selfclose:
                # handle_startendtag override: block flush only (no skip
                # bump, no CDATA)
                if tag in _BLOCK_TAGS:
                    flush()
            else:
                if tag in _SKIP_CONTENT_TAGS:
                    skip_depth += 1
                if tag in _BLOCK_TAGS:
                    flush()
                if tag in _CDATA_TAGS:
                    # CDATA content model: raw scan for </tag; inner data
                    # is inside a skip tag, so it never reaches a block
                    close_re = _CDATA_CLOSE[tag]
                    p = end_k
                    while True:
                        mc = close_re.search(s, p)
                        if mc is None:
                            # parser drops the unterminated tail silently
                            # (cdata_elem suppresses the final flush);
                            # content is skip-depth-dropped here either way
                            i = n
                            break
                        gt = find(">", mc.start() + 1)
                        if gt < 0:
                            return None
                        me = _endtagfind.match(s, mc.start())
                        if me is not None and me.group(1).lower() == tag:
                            if skip_depth > 0:
                                skip_depth -= 1
                            i = me.end()
                            break
                        p = gt + 1      # foreign/bogus end tag: stay CDATA
                    continue
            i = end_k
            continue
        if c == "/":
            me = _endtagfind.match(s, j)
            if me is not None:
                tag = me.group(1).lower()
                if tag in _SKIP_CONTENT_TAGS and skip_depth > 0:
                    skip_depth -= 1
                if tag in _BLOCK_TAGS:
                    flush()
                i = me.end()
                continue
            if s.startswith("</>", j):
                i = j + 3
                continue
            nm = _tagfind.match(s, j + 2)
            if nm is None:
                pos = find(">", j + 2)      # bogus comment
                if pos < 0:
                    return None
                i = pos + 1
                continue
            tag = nm.group(1).lower()
            gt = find(">", nm.end())
            if gt < 0:
                return None
            if tag in _SKIP_CONTENT_TAGS and skip_depth > 0:
                skip_depth -= 1
            if tag in _BLOCK_TAGS:
                flush()
            i = gt + 1
            continue
        if c == "!":
            if s.startswith("<!--", j):
                mc = _COMMENT_CLOSE.search(s, j + 4)
                if mc is None:
                    return None
                i = mc.end()
                continue
            if s.startswith("<![", j):
                return None                 # marked section
            if s[j:j + 9].lower() == "<!doctype":
                gt = find(">", j + 9)
                if gt < 0:
                    return None
                i = gt + 1
                continue
            pos = find(">", j + 2)          # bogus comment
            if pos < 0:
                return None
            i = pos + 1
            continue
        if c == "?":
            gt = find(">", j + 2)
            if gt < 0:
                return None
            i = gt + 1
            continue
        # bare '<' not opening any construct: literal data
        if skip_depth == 0:
            cur.append("<")
        i = j + 1

    flush()
    return "\n".join(blocks)


def extract_text(html: "bytes | str") -> str:
    """Extract visible text from an HTML page.  Deterministic; see module doc."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    if _HAVE_FAST:
        try:
            fast = _fast_extract(html)
            if fast is not None:
                return fast
        except Exception:
            pass                # pathological page → authoritative path
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
