"""End-to-end job entry point (`python -m medcat_ray.job`): build model
pack + pages, run, verify outputs + resume."""

import glob
import json
import os

import pytest


def test_job_end_to_end_and_resume(ray_session, tmp_path):
    from medcat_ray.fixtures import build_fixture_models, make_pages_corpus
    from medcat_ray.state.model_pack import save_model_pack
    from medcat_ray import job

    mdir = tmp_path / "m"
    mdir.mkdir()
    cdb, vocab = build_fixture_models(str(mdir), n_cuis=100)
    pack = str(tmp_path / "pack")
    save_model_pack(pack, cdb, vocab)
    pages = str(tmp_path / "pages")
    make_pages_corpus(pages, n_pages=60, seed=7, cdb=cdb, rows_per_file=20)
    out = str(tmp_path / "kg")

    rc = job.main(["--pages", pages, "--models", pack, "--out", out,
                   "--concurrency", "2", "--batch-size", "32"])
    assert rc == 0
    summary = json.load(open(os.path.join(out, "job_summary.json")))
    assert summary["partitions"] == 3
    assert summary["entities_rows"] > 0
    assert summary["triples_rows"] > 0
    assert summary["distinct_triples"] > 0
    assert len(glob.glob(os.path.join(out, "entities", "part=*"))) == 3
    assert len(glob.glob(os.path.join(out, "_lineage", "*.json"))) == 3

    # resume: second run skips all partitions (fast) and keeps counts
    rc2 = job.main(["--pages", pages, "--models", pack, "--out", out,
                    "--concurrency", "2", "--skip-triple-counts"])
    assert rc2 == 0
    summary2 = json.load(open(os.path.join(out, "job_summary.json")))
    assert summary2["entities_rows"] == summary["entities_rows"]
