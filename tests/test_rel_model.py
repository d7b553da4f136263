"""Trainable relation scorer (T3 upgrade): learns relation labels from the
between-entities text, rides its own actor-pool stage, deterministic."""

import numpy as np
import pytest


def _make_rel_samples(n=150, seed=4):
    """(text, subj_span, obj_span, label): the verb between two concept
    words decides the relation — the model must learn verb → label."""
    rng = np.random.default_rng(seed)
    verbs = {"inhibits": "inhibits_rel", "activates": "activates_rel",
             "binds": "binds_rel"}
    subjects = ["spark", "query", "merge"]
    objects = ["table", "vector", "customer"]
    samples = []
    for i in range(n):
        v = list(verbs)[int(rng.integers(0, 3))]
        s = subjects[int(rng.integers(0, 3))]
        o = objects[int(rng.integers(0, 3))]
        filler = ["the", "report", "that"][int(rng.integers(0, 3))]
        text = f"{filler} {s} {v} the {o} today"
        s_start = text.index(s)
        o_start = text.index(o, s_start + len(s))
        samples.append((text, (s_start, s_start + len(s)),
                        (o_start, o_start + len(o)), verbs[v]))
    return samples


@pytest.fixture(scope="module")
def rel_model():
    from medcat_ray.stages.rel_model import train_rel_model
    samples = _make_rel_samples()
    model, acc = train_rel_model(samples, hash_bits=12)
    return model, acc, samples


def test_learns_verb_relations(rel_model):
    model, acc, _ = rel_model
    assert acc >= 0.98
    text = "today spark inhibits the table here"
    label, conf = model.predict(text, (6, 11), (25, 30))
    assert label == "inhibits_rel" and conf > 0.5
    label, _ = model.predict("a query activates the vector now",
                             (2, 7), (22, 28))
    assert label == "activates_rel"


def test_deterministic_and_roundtrip(rel_model, tmp_path):
    from medcat_ray.stages.rel_model import (LearnedRelModel,
                                             train_rel_model)
    model, _, samples = rel_model
    m2, _ = train_rel_model(samples, hash_bits=12)
    assert np.array_equal(model.W, m2.W)
    p = str(tmp_path / "rel.npz")
    model.save(p)
    back = LearnedRelModel.load(p)
    text, s, o, _ = samples[0]
    assert back.predict(text, s, o) == model.predict(text, s, o)


def test_rel_score_stage_end_to_end(rel_model, ray_session):
    """Annotate → learned relation scoring as a Ray actor stage: the
    emitted triple carries the learned predicate + confidence."""
    import ray.data as rd
    from medcat_ray.pipelines.docs_kg import DOCS_CONFIG, docs_cdb
    from medcat_ray.stages.annotate import AnnotateStage
    from medcat_ray.stages.rel_model import score_relations
    model, _, _ = rel_model
    cdb, vocab = docs_cdb()
    docs = rd.from_items([
        {"doc_id": 1, "text": "the spark inhibits the table today"},
        {"doc_id": 2, "text": "a query activates the vector now"},
    ])
    ann = docs.map_batches(
        AnnotateStage,
        fn_constructor_kwargs=dict(models=(cdb, vocab), config=DOCS_CONFIG,
                                   key_column="doc_id",
                                   keep_columns=("text",)),
        batch_format="pyarrow", concurrency=1, num_cpus=1)
    out = score_relations(ann, model, key_column="doc_id",
                          concurrency=1).to_pandas().set_index("doc_id")
    assert out.loc[1, "pred"] == "inhibits_rel"
    assert out.loc[1, "subj_cui"] == "C0000001"   # spark
    assert out.loc[1, "obj_cui"] == "C0000009"    # table
    assert out.loc[2, "pred"] == "activates_rel"
    assert (out["confidence"] > 0.5).all()
