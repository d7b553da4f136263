"""Partitioned inverted index (ops/invindex.py)."""

import glob
import os

import ray.data as rd

from medcat_ray.ops.invindex import (build_inverted_index, lookup_postings,
                                     term_shard)

DOCS = ["the spark engine", "spark spark stream", "a table of tables",
        "", "stream table spark stream"]


def _build(tmp_path, ray_session, n_shards=8):
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(DOCS)]).repartition(2)
    d = str(tmp_path / "idx")
    build_inverted_index(ds, d, n_shards=n_shards)
    return d


def test_lookup_postings(tmp_path, ray_session):
    d = _build(tmp_path, ray_session)
    out = lookup_postings(d, "spark", n_shards=8).to_pandas() \
        .sort_values("doc_id")
    assert dict(zip(out["doc_id"], out["tf"])) == {0: 1, 1: 2, 4: 1}
    # missing term -> empty
    assert lookup_postings(d, "zzz", n_shards=8).count() == 0


def test_lookup_reads_single_shard(tmp_path, ray_session):
    """The probe must touch only its term's shard directory."""
    d = _build(tmp_path, ray_session)
    shard = int(term_shard(["spark"], 8)[0])
    others = [p for p in glob.glob(os.path.join(d, "shard=*"))
              if not p.endswith(f"shard={shard}")]
    # poison every other shard: if the lookup listed them, read_parquet
    # would fail on the corrupt file
    for p in others:
        with open(os.path.join(p, "poison.parquet"), "wb") as fh:
            fh.write(b"not a parquet file")
    out = lookup_postings(d, "spark", n_shards=8).to_pandas()
    assert len(out) == 3


def test_rebuild_clears_stale(tmp_path, ray_session):
    d = _build(tmp_path, ray_session)
    first = lookup_postings(d, "spark", n_shards=8).to_pandas()
    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(DOCS)])
    build_inverted_index(ds, d, n_shards=8)   # rebuild over existing
    again = lookup_postings(d, "spark", n_shards=8).to_pandas()
    assert len(again) == len(first)           # no duplicated postings
