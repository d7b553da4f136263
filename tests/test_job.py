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


def test_pack_hash_covers_vocab_vectors_and_cdb_metadata(tmp_path):
    """Perturbing output-affecting state the old hash missed (vocab
    vectors/counts, cui2preferred_name, cui2type_ids, cui2group in
    addl_info) must change the pack hash so resume recomputes."""
    import numpy as np
    from medcat_ray.fixtures import build_fixture_models
    from medcat_ray.state.model_pack import save_model_pack

    (tmp_path / "m").mkdir()
    cdb, vocab = build_fixture_models(str(tmp_path / "m"), n_cuis=20)
    base = save_model_pack(str(tmp_path / "p0"), cdb, vocab)

    # vocab vector perturbation
    if vocab.vectors.size:
        vocab.vectors[0, 0] += 1.0
        assert save_model_pack(str(tmp_path / "p1"), cdb, vocab) != base
        vocab.vectors[0, 0] -= 1.0
    # vocab count perturbation
    w = next(iter(vocab.word2cnt))
    vocab.word2cnt[w] += 1
    assert save_model_pack(str(tmp_path / "p2"), cdb, vocab) != base
    vocab.word2cnt[w] -= 1
    # preferred-name perturbation
    cui = next(iter(cdb.cui2names))
    old = cdb.cui2preferred_name.get(cui, "")
    cdb.cui2preferred_name[cui] = old + "_x"
    assert save_model_pack(str(tmp_path / "p3"), cdb, vocab) != base
    cdb.cui2preferred_name[cui] = old
    # type-ids perturbation
    cdb.cui2type_ids.setdefault(cui, set()).add("T999")
    assert save_model_pack(str(tmp_path / "p4"), cdb, vocab) != base
    cdb.cui2type_ids[cui].discard("T999")
    # cui2group (addl_info) perturbation
    cdb.addl_info.setdefault("cui2group", {})[cui] = "GROUP_X"
    assert save_model_pack(str(tmp_path / "p5"), cdb, vocab) != base
    cdb.addl_info["cui2group"].pop(cui)
    # restored state reproduces the base hash (determinism)
    assert save_model_pack(str(tmp_path / "p6"), cdb, vocab) == base


def test_lineage_hash_covers_engine_code_version(monkeypatch):
    """A lemmatizer/extractor version bump must change the LINEAGE key even
    for a pack whose stored pack_hash predates the bump — otherwise
    run_partitioned silently treats stale partitions as current."""
    import medcat_ray.functions.text as text_mod
    from medcat_ray.state.model_pack import lineage_model_hash

    base = lineage_model_hash("abcd1234")
    assert base != "abcd1234"           # never the raw pack hash
    monkeypatch.setattr(text_mod, "LEMMATIZER_VERSION", "999-test")
    assert lineage_model_hash("abcd1234") != base
    monkeypatch.undo()
    assert lineage_model_hash("abcd1234") == base   # deterministic
