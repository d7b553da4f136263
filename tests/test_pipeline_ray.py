"""End-to-end Ray Data pipeline tests: pages → annotate → entities/triples,
byte-identity invariant, resumable partitioned runs (FIXTURES.md invariants
1, 3, 4, 5)."""

import glob
import os

import pyarrow as pa
import pytest

from medcat_ray.fixtures import build_fixture_models, make_pages_corpus
from medcat_ray.functions.html import extract_text


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory, fixture_models):
    cdb, _ = fixture_models
    d = tmp_path_factory.mktemp("pages")
    make_pages_corpus(str(d), n_pages=60, seed=42, cdb=cdb, rows_per_file=20)
    return str(d)


def oracle_entities(pages_dir, cdb, vocab):
    """Driver-side oracle: the same DocAnnotator applied sequentially —
    establishes that the distributed pipeline output matches the
    per-document reference semantics exactly (J5-style (url,start,cui)
    join, /root/reference/medcat/stats/stats.py:102-146)."""
    import pyarrow.parquet as pq
    from medcat_ray.core.annotator import DocAnnotator
    ann = DocAnnotator(cdb, vocab)
    expected = set()
    for f in sorted(glob.glob(os.path.join(pages_dir, "*.parquet"))):
        t = pq.read_table(f)
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            text = extract_text(html)
            for e in ann.annotate(text):
                expected.add((url, e["start"], e["cui"]))
    return expected


def test_pipeline_matches_sequential_oracle(ray_session, fixture_models,
                                            pages_dir):
    from medcat_ray.pipelines import kg
    cdb, vocab = fixture_models
    models = kg.broadcast_models(cdb, vocab)
    annotated = kg.annotate_pages(pages_dir, models, concurrency=2,
                                  batch_size=16)
    got_df = kg.entities(annotated).to_pandas()
    got = set(zip(got_df["url"], got_df["start"], got_df["cui"]))
    expected = oracle_entities(pages_dir, cdb, vocab)
    assert got == expected          # P/R == 1.0 on the deterministic config
    assert len(got) > 50            # corpus actually contains mentions


def test_triples_counts_reconcile(ray_session, fixture_models, pages_dir):
    from medcat_ray.pipelines import kg
    cdb, vocab = fixture_models
    models = kg.broadcast_models(cdb, vocab)
    ann1 = kg.annotate_pages(pages_dir, models, concurrency=2, batch_size=16)
    rows = kg.triples(ann1).to_pandas()
    ann2 = kg.annotate_pages(pages_dir, models, concurrency=2, batch_size=16)
    counts = kg.triple_counts(ann2).to_pandas()
    assert int(counts["count"].sum()) == len(rows)
    # window + ordering invariants on every provenance row
    d = rows["obj_start"] - rows["subj_start"]
    assert (d > 0).all() and (d <= 300).all()
    # counts equal a pandas recount of the provenance rows
    recount = rows.groupby(["subj_cui", "pred", "obj_cui"]).size()
    merged = counts.set_index(["subj_cui", "pred", "obj_cui"])["count"]
    assert recount.sort_index().equals(merged.sort_index().astype("int64"))


def test_extract_text_byte_identity(ray_session, pages_dir):
    import ray.data as rd
    pages = rd.read_parquet(pages_dir, columns=["html", "text"])

    def check(b: pa.Table) -> pa.Table:
        ok = [extract_text(h) == t
              for h, t in zip(b["html"].to_pylist(), b["text"].to_pylist())]
        return pa.table({"ok": pa.array(ok)})
    res = pages.map_batches(check, batch_format="pyarrow").to_pandas()
    assert res["ok"].all()


def test_partitioned_resume(ray_session, fixture_models, pages_dir, tmp_path):
    from medcat_ray.pipelines import kg
    from medcat_ray.pipelines.runner import (completed_partitions,
                                             run_partitioned)
    cdb, vocab = fixture_models
    models = kg.broadcast_models(cdb, vocab)
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    out = str(tmp_path / "kgout")

    def part_fn(path):
        a = kg.annotate_pages(path, models, concurrency=2, batch_size=16)
        return {"entities": kg.entities(a)}

    recs = run_partitioned(files, out, part_fn, cdb.content_hash())
    assert len(recs) == len(files)
    assert all(r["rows_out"]["entities"] > 0 for r in recs)
    # rerun: everything skipped (lineage respected)
    recs2 = run_partitioned(files, out, part_fn, cdb.content_hash())
    assert {r["partition_id"] for r in recs2} == {r["partition_id"] for r in recs}
    assert completed_partitions(out, cdb.content_hash())
    # model change invalidates
    assert completed_partitions(out, "other-hash") == {}


def test_partitioned_outputs_byte_identical_across_rerun(
        ray_session, fixture_models, pages_dir, tmp_path):
    import pandas as pd
    from medcat_ray.pipelines import kg
    from medcat_ray.pipelines.runner import run_partitioned
    cdb, vocab = fixture_models
    models = kg.broadcast_models(cdb, vocab)
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))[:2]

    def part_fn(path):
        a = kg.annotate_pages(path, models, concurrency=2, batch_size=16)
        return {"entities": kg.entities(a)}

    def run_to(out):
        run_partitioned(files, out, part_fn, cdb.content_hash())
        dfs = []
        for f in sorted(glob.glob(os.path.join(out, "entities", "part=*",
                                               "*.parquet"))):
            import pyarrow.parquet as pq
            dfs.append(pq.read_table(f).to_pandas())
        return pd.concat(dfs).sort_values(
            ["url", "start", "cui"]).reset_index(drop=True)

    a = run_to(str(tmp_path / "run_a"))
    b = run_to(str(tmp_path / "run_b"))
    pd.testing.assert_frame_equal(a, b)


def test_poison_document_does_not_fail_block(ray_session, fixture_models):
    import ray.data as rd
    from medcat_ray.pipelines import kg
    from medcat_ray.stages.annotate import AnnotateStage
    cdb, vocab = fixture_models
    docs = rd.from_items([
        {"url": "u1", "text": "patient has kidney lesion"},
        {"url": "u2", "text": None},          # null text
        {"url": "u3", "text": ""},            # empty
    ])
    out = kg.annotate(docs, (cdb, vocab), concurrency=1, batch_size=8) \
        .to_pandas()
    assert len(out) == 3
    assert out.loc[out["url"] == "u2", "n_ents"].iloc[0] == 0


def test_partitioned_crash_recovery(ray_session, fixture_models, pages_dir,
                                    tmp_path):
    """Simulated mid-partition crash: first fragment committed, second left
    as a stale ``.tmp`` (what a kill leaves behind).  The rerun must replace
    the stale tmp and produce output identical to an uninterrupted run."""
    import pandas as pd
    import pyarrow.parquet as pq
    from medcat_ray.pipelines import kg
    from medcat_ray.pipelines.runner import partition_id, run_partitioned
    cdb, vocab = fixture_models
    models = kg.broadcast_models(cdb, vocab)
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))[:2]

    def part_fn(path):
        a = kg.annotate_pages(path, models, concurrency=2, batch_size=16)
        return {"entities": kg.entities(a)}

    def collect(out):
        dfs = [pq.read_table(f).to_pandas() for f in sorted(
            glob.glob(os.path.join(out, "entities", "part=*", "*.parquet")))]
        return pd.concat(dfs).sort_values(
            ["url", "start", "cui"]).reset_index(drop=True)

    # "crashed" run: only file 0 committed; file 1 has garbage .tmp
    out = str(tmp_path / "crashed")
    run_partitioned(files[:1], out, part_fn, cdb.content_hash())
    stale = os.path.join(out, "entities",
                         f"part={partition_id(files[1])}.tmp")
    os.makedirs(stale)
    with open(os.path.join(stale, "garbage.parquet"), "w") as fh:
        fh.write("not parquet")

    # recovery run over all files
    recs = run_partitioned(files, out, part_fn, cdb.content_hash())
    assert len(recs) == 2
    assert not os.path.isdir(stale)

    ref_out = str(tmp_path / "clean")
    run_partitioned(files, ref_out, part_fn, cdb.content_hash())
    pd.testing.assert_frame_equal(collect(out), collect(ref_out))


def test_salted_counts_match_shuffle(ray_session, fixture_models, pages_dir):
    from medcat_ray.pipelines import kg
    cdb, vocab = fixture_models
    models = kg.broadcast_models(cdb, vocab)

    def ann():
        return kg.annotate_pages(pages_dir, models, concurrency=2,
                                 batch_size=16)
    base = kg.triple_counts(ann()).to_pandas() \
        .sort_values(["subj_cui", "pred", "obj_cui"]).reset_index(drop=True)
    salted = kg.triple_counts_salted(ann(), salt_buckets=4).to_pandas() \
        .sort_values(["subj_cui", "pred", "obj_cui"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(base, salted[base.columns.tolist()],
                                  check_dtype=False)


def test_materialize_graph(ray_session, fixture_models, pages_dir, tmp_path):
    import pyarrow.parquet as pq
    from medcat_ray.pipelines import kg
    cdb, vocab = fixture_models
    models = kg.broadcast_models(cdb, vocab)
    ann = kg.annotate_pages(pages_dir, models, concurrency=2, batch_size=16)
    out = str(tmp_path / "graph")
    res = kg.materialize_graph(ann, cdb, out, mode="tree")
    assert res["nodes"] == len(cdb.cui2names)
    assert res["edges"] > 0
    nodes = pq.read_table(os.path.join(out, "nodes", "nodes.parquet"))
    assert set(nodes.column_names) == {"cui", "pretty_name", "type_ids",
                                       "count_train"}
    edges = pq.read_table(os.path.join(out, "edges"))
    assert {"subj_cui", "pred", "obj_cui", "count"} <= set(edges.column_names)


def test_fused_count_stage_matches_unfused(ray_session, fixture_models,
                                           pages_dir):
    import pandas as pd
    from medcat_ray.pipelines import kg
    from medcat_ray.stages.annotate import AnnotateCountStage
    from medcat_ray.stages.triples import combine_partial_counts
    import ray.data as rd
    cdb, vocab = fixture_models
    models = kg.broadcast_models(cdb, vocab)
    base = kg.triple_counts(
        kg.annotate_pages(pages_dir, models, concurrency=2, batch_size=16),
        mode="tree").to_pandas().sort_values(
            ["subj_cui", "pred", "obj_cui"]).reset_index(drop=True)
    pages = rd.read_parquet(pages_dir, columns=["url", "html", "lang"])
    fused = pages.map_batches(
        AnnotateCountStage, fn_constructor_kwargs=dict(models=models),
        batch_format="pyarrow", batch_size=16, concurrency=2, num_cpus=1) \
        .repartition(1).map_batches(combine_partial_counts,
                                    batch_format="pyarrow") \
        .rename_columns({"n": "count"}).to_pandas().sort_values(
            ["subj_cui", "pred", "obj_cui"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, fused[base.columns.tolist()],
                                  check_dtype=False)


def test_enrich_entities_addl_info(ray_session, fixture_models, pages_dir):
    from medcat_ray.pipelines import kg
    cdb, vocab = fixture_models
    some_cui = sorted(cdb.cui2names)[0]
    cdb.addl_info["cui2icd10"][some_cui] = "N18.9"
    cdb.addl_info["cui2ontologies"][some_cui] = {"SNOMED", "MSH"}
    models = kg.broadcast_models(cdb, vocab)
    ann = kg.annotate_pages(pages_dir, models, concurrency=2, batch_size=16)
    out = kg.enrich_entities(kg.entities(ann), cdb).to_pandas()
    assert {"icd10", "opcs4", "ontologies"} <= set(out.columns)
    hit = out[out["cui"] == some_cui]
    if len(hit):
        assert (hit["icd10"] == "N18.9").all()
        assert (hit["ontologies"] == '["MSH", "SNOMED"]').all()
    other = out[out["cui"] != some_cui]
    assert other["icd10"].isna().all()
