"""URL canonicalization and URL-keyed dedup for web corpora: the
standard Common-Crawl-style pre-pass that collapses trivially-different
URLs (case in scheme/host, fragments, default ports, tracking
parameters) before content-level dedup.

Canonicalization is a FIXED sequence of regex passes chosen to be
expressible identically in Python ``re`` and DuckDB/RE2 (no lookaround,
no backtracking subtleties), so the ``url_dedup_docs`` oracle recomputes
the exact same canonical strings in SQL:

  1. strip the fragment (``#...``);
  2. lowercase the ``scheme://authority`` prefix (rest untouched);
  3. drop default ports (``http...:80``, ``https...:443``);
  4. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``,
     ``ref``) wherever a ``?``/``&`` introduces them;
  5. tidy separator runs (``?&`` / ``&&``) and trailing ``?``/``&``;
  6. empty remainder after the authority becomes ``/``.

Known (documented) regex-level limitation: a literal ``&`` inside a path
segment can shadow step 4 — a full RFC 3986 parser is out of scope and
unnecessary for the dedup use-case.

Reference analogue: none in MedCAT (LLM-training-data operator).
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data as rd

_HEAD_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*")
_FRag_RE = re.compile(r"#.*$")
_P80_RE = re.compile(r"^(http://[^/?#]*):80$")
_P443_RE = re.compile(r"^(https://[^/?#]*):443$")
_TRACK_RE = re.compile(r"([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)"
                       r"=[^&#]*")
_SEP_RE = re.compile(r"([?&])&+")
_TAIL_RE = re.compile(r"[?&]+$")


def canonicalize_url(url: str) -> str:
    """Apply the module's fixed canonicalization passes to one URL.
    URLs without a ``scheme://authority`` prefix are only de-fragmented."""
    u = _FRag_RE.sub("", url or "")
    m = _HEAD_RE.match(u)
    if not m:
        return u
    head, tail = u[:m.end()].lower(), u[m.end():]
    head = _P80_RE.sub(r"\1", head)
    head = _P443_RE.sub(r"\1", head)
    tail = _TRACK_RE.sub(r"\1", tail)
    tail = _SEP_RE.sub(r"\1", tail)
    tail = _TAIL_RE.sub("", tail)
    if not tail:
        tail = "/"
    return head + tail


def canonical_url_sql(expr: str) -> str:
    """DuckDB expression computing :func:`canonicalize_url` of ``expr``
    with the identical pass sequence (RE2 twins of the module regexes)."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    head = f"regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')"
    lower_head = (f"regexp_replace(regexp_replace(lower({head}),"
                  f" '^(http://[^/?#]*):80$', '\\1'),"
                  f" '^(https://[^/?#]*):443$', '\\1')")
    tail = f"substr({u}, length({head}) + 1)"
    tail = (f"regexp_replace({tail},"
            f" '([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)=[^&#]*',"
            f" '\\1', 'g')")
    tail = f"regexp_replace({tail}, '([?&])&+', '\\1', 'g')"
    tail = f"regexp_replace({tail}, '[?&]+$', '')"
    tail = f"CASE WHEN {tail} = '' THEN '/' ELSE {tail} END"
    return (f"CASE WHEN {head} = '' THEN {u}"
            f" ELSE {lower_head} || {tail} END")


def add_canonical_url(ds: rd.Dataset, url_col: str = "url",
                      out_col: str = "canonical_url") -> rd.Dataset:
    """Append the canonical form of ``url_col`` to every row."""
    def _canon(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        return batch.append_column(
            out_col, pa.array([canonicalize_url(u) for u in urls],
                              type=pa.string()))
    return ds.map_batches(_canon, batch_format="pyarrow")


def url_dedup(ds: rd.Dataset, id_col: str = "doc_id",
              url_col: str = "url", **dedup_kwargs) -> rd.Dataset:
    """Keep one row (min id) per canonical URL — a composition of
    :func:`add_canonical_url` with ops.dedup.exact_dedup, inheriting its
    broadcast/join auto-gating (dup volume ∝ duplicate rate)."""
    from medcat_ray.ops.dedup import exact_dedup
    return exact_dedup(add_canonical_url(ds, url_col), id_col=id_col,
                       text_col="canonical_url", **dedup_kwargs)
