"""Training (T5/T6), distributed training, meta-annotation (T2),
DeId (M15), split (O5), CDB merge (J4)."""

import numpy as np
import pytest

from medcat_ray.config import EngineConfig
from medcat_ray.core.trainer import Trainer
from medcat_ray.state.cdb import CDB, prepare_name
from medcat_ray.state.vocab import Vocab


def tiny_models(dim=8):
    cfg = EngineConfig(spell_check=False)
    cdb = CDB(cfg)
    cdb.add_concept_rows([
        {"cui": "C1", "name": "kidney failure", "name_status": "P"},
        {"cui": "C2", "name": "heart attack", "name_status": "P"},
        # ambiguous short name linked to both
        {"cui": "C1", "name": "kf"},
    ])
    vocab = Vocab()
    rng = np.random.default_rng(7)
    words = ["kidney", "failure", "heart", "attack", "chronic", "acute",
             "patient", "with", "severe", "cardiac", "renal", "the", "a"]
    for w in words:
        vocab.add_word(w, cnt=100, vec=rng.normal(size=dim))
    return cdb, vocab, cfg


def test_trainer_unsupervised_updates_vectors():
    cdb, vocab, cfg = tiny_models()
    tr = Trainer(cdb, vocab, cfg, seed=1)
    texts = ["patient with chronic kidney failure",
             "severe heart attack in patient",
             "kidney failure and heart attack"]
    n = tr.train_unsupervised(texts, nepochs=2)
    assert n > 0
    assert "C1" in cdb.cui2context_vectors
    assert "C2" in cdb.cui2context_vectors
    assert cdb.cui2count_train["C1"] >= 2
    # name counts tracked (A2)
    assert cdb.name2count_train.get("kidney~failure", 0) >= 2
    # determinism: fresh run, same seed, same vectors
    cdb2, vocab2, _ = tiny_models()
    tr2 = Trainer(cdb2, vocab2, cfg, seed=1)
    tr2.train_unsupervised(texts, nepochs=2)
    for ct in cdb.cui2context_vectors["C1"]:
        np.testing.assert_allclose(cdb.cui2context_vectors["C1"][ct],
                                   cdb2.cui2context_vectors["C1"][ct])


def test_trainer_supervised_adds_and_negative_flips_status(tmp_path):
    import json
    cdb, vocab, cfg = tiny_models()
    export = {"projects": [{"id": 1, "name": "p", "cuis": "", "documents": [
        {"id": 1, "text": "patient has renal insufficiency today",
         "annotations": [
             {"start": 12, "end": 31, "cui": "C9",
              "value": "renal insufficiency", "correct": True,
              "deleted": False, "alternative": False, "killed": False}]},
        {"id": 2, "text": "no kidney failure seen", "annotations": [
            {"start": 3, "end": 17, "cui": "C1", "value": "kidney failure",
             "correct": False, "deleted": True, "alternative": False,
             "killed": False}]},
    ]}]}
    p = tmp_path / "export.json"
    p.write_text(json.dumps(export))
    tr = Trainer(cdb, vocab, cfg, seed=0)
    n = tr.train_supervised(str(p))
    assert n == 2
    # new concept added with the annotated name
    assert "C9" in cdb.cui2names
    assert "renal~insufficiency" in cdb.name2cuis
    # negative training flipped P → PD for (kidney~failure, C1)
    assert cdb.name2cuis2status["kidney~failure"]["C1"] == "PD"


def test_distributed_training_matches_mention_mean(ray_session, tmp_path):
    import ray
    import ray.data as rd
    from medcat_ray.pipelines.train import (apply_training,
                                            train_unsupervised_distributed)
    cdb, vocab, cfg = tiny_models()
    texts = ["patient with chronic kidney failure",
             "severe heart attack in patient",
             "kidney failure and heart attack",
             "acute kidney failure with cardiac arrest"] * 5
    docs = rd.from_items([{"doc_id": i, "text": t}
                          for i, t in enumerate(texts)])
    models = ray.put((cdb, vocab))
    result = train_unsupervised_distributed(docs, models, cfg,
                                            concurrency=2, batch_size=4)
    assert "C1" in result and "C2" in result
    assert result["C1"]["count"] == 15  # 3 mention-docs × 5
    # order-free: running twice gives identical means
    result2 = train_unsupervised_distributed(docs, models, cfg,
                                             concurrency=2, batch_size=7)
    for ct, v in result["C1"]["vectors"].items():
        np.testing.assert_allclose(v, result2["C1"]["vectors"][ct],
                                   rtol=1e-6)
    fresh = CDB(cfg)
    fresh.add_concept_rows([{"cui": "C1", "name": "kidney failure"}])
    apply_training(fresh, {"C1": result["C1"]})
    assert fresh.cui2count_train["C1"] == 15


def test_import_training_merge():
    cdb, vocab, cfg = tiny_models()
    other, _, _ = tiny_models()
    other.set_context_vectors("C1", {"short": np.ones(4, dtype=np.float32)},
                              count_train=10)
    cdb.set_context_vectors("C1", {"short": np.zeros(4, dtype=np.float32)},
                            count_train=4)
    cdb.import_training(other, overwrite=False)
    np.testing.assert_allclose(cdb.cui2context_vectors["C1"]["short"],
                               0.5 * np.ones(4))
    assert cdb.cui2count_train["C1"] == 14
    cdb.import_training(other, overwrite=True)
    np.testing.assert_allclose(cdb.cui2context_vectors["C1"]["short"],
                               np.ones(4))


def test_meta_annotate_stage(ray_session):
    import ray
    import ray.data as rd
    from medcat_ray.pipelines import kg
    cdb, vocab, cfg = tiny_models()
    docs = rd.from_items([
        {"url": "u1", "text": "patient denies kidney failure today"},
        {"url": "u2", "text": "history of heart attack in mother"},
        {"url": "u3", "text": "acute kidney failure confirmed"},
    ])
    ann = docs.map_batches(
        __import__("medcat_ray.stages.annotate",
                   fromlist=["AnnotateStage"]).AnnotateStage,
        fn_constructor_kwargs=dict(models=(cdb, vocab), config=cfg,
                                   keep_columns=("text",)),
        batch_format="pyarrow", concurrency=1)
    from medcat_ray.stages.meta import meta_annotate
    out = meta_annotate(ann, concurrency=1).to_pandas().set_index("url")
    m1 = {a["name"]: a["value"] for a in out.loc["u1", "meta_anns"][0]}
    assert m1["Negation"] == "Negated"
    m2 = {a["name"]: a["value"] for a in out.loc["u2", "meta_anns"][0]}
    assert m2["Temporality"] == "Past"
    assert m2["Experiencer"] == "Family"
    m3 = {a["name"]: a["value"] for a in out.loc["u3", "meta_anns"][0]}
    assert m3["Negation"] == "Affirmed"
    assert m3["Experiencer"] == "Patient"


def test_deid_rewrite(ray_session):
    import ray.data as rd
    from medcat_ray.functions.deid import deid, replace_entities_in_text
    from medcat_ray.stages.annotate import AnnotateStage
    cdb, vocab, cfg = tiny_models()
    docs = rd.from_items([
        {"url": "u1", "text": "patient with kidney failure now"}])
    ann = docs.map_batches(
        AnnotateStage,
        fn_constructor_kwargs=dict(models=(cdb, vocab), config=cfg,
                                   keep_columns=("text",)),
        batch_format="pyarrow", concurrency=1)
    out = deid(ann, (cdb, vocab)).to_pandas()
    assert out["text_deid"].iloc[0] == "patient with [kidney failure] now"
    out_r = deid(ann, (cdb, vocab), redact=True).to_pandas()
    assert out_r["text_deid"].iloc[0] == "patient with [**************] now"
    # pure-function parity with helpers.py ordering (right-to-left splice)
    ents = [{"start": 0, "end": 7, "cui": "C1"},
            {"start": 13, "end": 27, "cui": "C2"}]
    txt = replace_entities_in_text("patient with kidney failure now", ents,
                                   lambda c: c, redact=False)
    assert txt == "[C1] with [C2] now"


def test_train_test_split(ray_session):
    import ray.data as rd
    from medcat_ray.ops.split import add_split, train_test_split
    ds = rd.range(1000).map_batches(
        lambda b: __import__("pyarrow").table({"doc_id": b["id"]}),
        batch_format="pyarrow")
    tr, te = train_test_split(ds, test_fraction=0.2)
    n_tr, n_te = tr.count(), te.count()
    assert n_tr + n_te == 1000
    assert 120 <= n_te <= 280          # ~20%, hash-binomial tolerance
    # deterministic: same rows every time
    te2 = train_test_split(ds, test_fraction=0.2)[1]
    assert sorted(te.to_pandas()["doc_id"]) == \
        sorted(te2.to_pandas()["doc_id"])
