"""North-rule criteria as explicit tests:

* triple P/R vs the reference-semantics oracle ≥ 0.95 (measured: 1.0 —
  the engine reimplements the annotation rules exactly, verified per
  operator by the DuckDB oracles);
* per-url byte-identical extracted text.
"""

import os

import duckdb
import pandas as pd


SF = "/root/testdata/sf0.001"


def test_triple_precision_recall_vs_oracle(ray_session):
    import __ray_entry__
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    qs = __ray_entry__.queries()
    oracle = con.execute(__ray_entry__.oracle_sql()["kg_triples"]).df()
    got = qs["kg_triples"](SF)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    key = ["subj_cui", "pred", "obj_cui", "doc_id", "subj_start",
           "obj_start"]
    g = set(map(tuple, got[key].itertuples(index=False)))
    o = set(map(tuple, oracle[key].itertuples(index=False)))
    tp = len(g & o)
    precision = tp / max(1, len(g))
    recall = tp / max(1, len(o))
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0   # exact by construction


def test_extracted_text_byte_identity_per_url(ray_session, tmp_path):
    from medcat_ray.fixtures import pages_from_documents
    from medcat_ray.functions.html import extract_text
    import pyarrow.parquet as pq
    pages = str(tmp_path / "pages")
    pages_from_documents(os.path.join(SF, "documents.parquet"), pages)
    t = pq.read_table(pages)
    for html, text in zip(t["html"].to_pylist(), t["text"].to_pylist()):
        assert extract_text(html.decode("utf-8")) == text
