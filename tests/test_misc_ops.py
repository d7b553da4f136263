"""Cleaners (M14), kfold merge (A6), top-error leaderboards (O4),
training checkpoints (T5), TransformersNER stub plumbing (T4)."""

import numpy as np
import pandas as pd
import pytest


def test_cleaners_reference_behavior():
    from medcat_ray.functions.cleaners import (basic_clean, clean_def,
                                               clean_name, clean_snomed_name,
                                               clean_snt, clean_text,
                                               clean_umls)
    # numbers get spaces; junk chars dropped; lowercased
    assert basic_clean("Blood pressure:120mmHg!!") == "blood pressure 120 mmhg"
    # repeated chars collapse to 2 — but digits are spared in basic_clean
    assert basic_clean("wheeee 111") == "whee 111"
    assert clean_text("take aspirin [daily] (oral)") == "take aspirin"
    assert clean_name("  heart   attack ") == "heart attack"
    # reference quirk kept: PH_RM runs after the collapse+strip, so the
    # substituted space survives (cleaners.py:158-176)
    assert clean_name("pain (finding)", umls=True) == "pain  "
    assert clean_umls("[x] heart [ab] (disorder)") == "heart"
    assert clean_def("fever (high temp) [lat]") == "fever"
    assert clean_snt("note [*PHI*] text __- done") == "note text done"
    assert clean_snomed_name("Myocardial infarction (disorder)") == \
        "Myocardial infarction"


def test_merge_fold_stats_and_top_errors():
    from medcat_ray.stats import merge_fold_stats, top_errors
    f1 = pd.DataFrame({"cui": ["A", "B"], "tp": [3, 1], "fp": [1, 0],
                       "fn": [0, 2]})
    f2 = pd.DataFrame({"cui": ["A", "C"], "tp": [2, 5], "fp": [0, 1],
                       "fn": [1, 0]})
    merged = merge_fold_stats([f1, f2])
    a = merged[merged["cui"] == "A"].iloc[0]
    assert (a["tp"], a["fp"], a["fn"]) == (5, 1, 1)
    assert a["prec"] == round(5 / 6, 6)
    assert list(top_errors(merged, "fp", 1)["cui"]) in (["A"], ["C"])
    # empty input
    assert merge_fold_stats([]).empty


def test_trainer_checkpoint_resume(tmp_path):
    from tests.test_training import tiny_models
    from medcat_ray.core.trainer import Trainer
    texts = ["patient with chronic kidney failure",
             "severe heart attack in patient",
             "kidney failure and heart attack",
             "acute kidney failure today"]
    ckpt = str(tmp_path / "ckpt")

    # full run with checkpoints every 2 docs
    cdb_a, vocab_a, cfg = tiny_models()
    tr_a = Trainer(cdb_a, vocab_a, cfg, seed=3)
    tr_a.train_unsupervised(texts, checkpoint_dir=ckpt, checkpoint_steps=2)
    import os
    assert any(n.startswith("checkpoint-") for n in os.listdir(ckpt))

    # interrupted run: train only the first 2 docs, checkpointed
    ckpt2 = str(tmp_path / "ckpt2")
    cdb_b, vocab_b, _ = tiny_models()
    tr_b = Trainer(cdb_b, vocab_b, cfg, seed=3)
    tr_b.train_unsupervised(texts[:2], checkpoint_dir=ckpt2,
                            checkpoint_steps=2)
    # resume from the snapshot, continuing with the full list
    cdb_c, vocab_c, _ = tiny_models()
    tr_c = Trainer(cdb_c, vocab_c, cfg, seed=3)
    tr_c.train_unsupervised(texts, checkpoint_dir=ckpt2, is_resumed=True,
                            checkpoint_steps=2)
    # resumed counts equal the uninterrupted run's
    assert cdb_c.cui2count_train == cdb_a.cui2count_train


def test_transformers_ner_stub(ray_session):
    import ray.data as rd
    from medcat_ray.stages.transformers_ner import (TransformersNERStage,
                                                    addl_ner)
    with pytest.raises(NotImplementedError):
        TransformersNERStage()          # no torch in this container

    def fake_scorer(texts):
        out = []
        for t in texts:
            ents = []
            pos = t.find("name")
            if pos >= 0:
                ents.append({"start": pos, "end": pos + 4, "cui": "PII-NAME",
                             "source_value": "name"})
            out.append(ents)
        return out

    docs = rd.from_items([{"url": "u1", "text": "the name is hidden"},
                          {"url": "u2", "text": "nothing here"}])
    out = addl_ner(docs, scorer=fake_scorer, concurrency=1).to_pandas()
    out = out.set_index("url")
    assert out.loc["u1", "n_ents"] == 1
    assert out.loc["u1", "ents"][0]["cui"] == "PII-NAME"
    assert out.loc["u2", "n_ents"] == 0


def test_make_mc_train_test_count_balanced():
    """Reference make_mc_train_test semantics: frequent CUIs capped at
    max_test_fraction of their occurrences in test; overall test share
    approaches test_size; deterministic under the fixed seed."""
    from medcat_ray.ops.split import make_mc_train_test

    docs = []
    # 60 docs with the frequent CUI (2 anns each), 20 with a rare CUI
    for i in range(60):
        docs.append({"id": f"d{i}", "annotations": [
            {"cui": "C_FREQ", "start": 0}, {"cui": "C_FREQ", "start": 5}]})
    for i in range(20):
        docs.append({"id": f"r{i}", "annotations": [
            {"cui": f"C_RARE{i % 7}", "start": 0}]})
    data = {"projects": [{"name": "p1", "documents": docs}]}

    train, test, test_anns, total_anns = make_mc_train_test(
        data, test_size=0.2, min_test_count=10, max_test_fraction=0.3)
    assert total_anns == 140
    n_train = len(train["projects"][0]["documents"])
    n_test = len(test["projects"][0]["documents"])
    assert n_train + n_test == 80
    # test share stops around test_size
    assert 0 < test_anns <= 0.35 * total_anns
    # frequent-CUI cap: <= max_test_fraction of its 120 occurrences + one
    # overshooting doc (the cap is checked before adding a 2-ann doc)
    freq_in_test = sum(
        1 for d in test["projects"][0]["documents"]
        for a in d["annotations"] if a["cui"] == "C_FREQ")
    assert freq_in_test <= 0.3 * 120 + 2
    # deterministic
    train2, test2, ta2, _ = make_mc_train_test(
        data, test_size=0.2, min_test_count=10, max_test_fraction=0.3)
    assert ta2 == test_anns
    assert [d["id"] for d in test2["projects"][0]["documents"]] == \
        [d["id"] for d in test["projects"][0]["documents"]]
