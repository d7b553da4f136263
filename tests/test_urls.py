"""Unit tests for ops/urls.py (URL canonicalization + dedup)."""

import duckdb
import pyarrow as pa
import ray.data as rd

from medcat_ray.ops.urls import (add_canonical_url, canonical_url_sql,
                                 canonicalize_url, url_dedup)

_URLS = [
    "HTTPS://WWW.Site3.Example:443/a/9?utm_source=f&id=9#frag",
    "http://site1.example:80/b/2",
    "http://site1.example/b/2",
    "https://x.example/?utm_a=1&utm_b=2",
    "https://x.example/p?id=1&utm_c=3&z=2",
    "https://x.example",
    "ftp://Host.X:21/file",
    "not a url#frag",
    "",
    "https://x.example/p?ref=abc",
    "https://x.example/p?gclid=1&fbclid=2",
    "http://UPPER.example:8080/Q?Utm_x=1",
    "https://x.example/p??&&id=1",
    "https://x.example:443/",
    "http://x.example:80",
]


def test_canonicalize_rules():
    assert canonicalize_url(_URLS[0]) == \
        "https://www.site3.example/a/9?id=9"
    assert canonicalize_url("http://site1.example:80/b/2") == \
        canonicalize_url("http://site1.example/b/2")
    assert canonicalize_url("https://x.example") == "https://x.example/"
    assert canonicalize_url("https://x.example/?utm_a=1") == \
        "https://x.example/"
    # non-default port and case-sensitive Utm_ survive
    assert canonicalize_url("http://UPPER.example:8080/Q?Utm_x=1") == \
        "http://upper.example:8080/Q?Utm_x=1"


def test_sql_twin_matches_python():
    """The DuckDB expression must equal the Python function on every
    fixture URL (same regex-pass sequence)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t(u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in _URLS])
    got = [r[0] for r in
           con.sql(f"SELECT {canonical_url_sql('u')} FROM t").fetchall()]
    assert got == [canonicalize_url(u) for u in _URLS]


def test_url_dedup_keeps_min_id(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "url": pa.array([
            "https://A.example:443/p?utm_x=1",
            "https://a.example/p",          # same canonical as doc 0
            "https://a.example/p?id=2",     # distinct
            "https://b.example/p"])}))
    out = url_dedup(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert out.doc_id.tolist() == [0, 2, 3]
    assert out.canonical_url.tolist()[0] == "https://a.example/p"


def test_add_canonical_column(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "url": pa.array(["HTTP://X.Y:80/#f"])}))
    out = add_canonical_url(ds).to_pandas()
    assert out.canonical_url.tolist() == ["http://x.y/"]
