"""Trainable meta-annotation model (T2 upgrade): learns real cue patterns
from MCT-style labels, plugs into the MetaAnnotateStage seam, serializes,
and is deterministic."""

import numpy as np
import pytest


def _make_negation_mct(n=120, seed=3):
    """Synthetic MCT export: 'Negation' meta-annotations where the label is
    decided by cue words the model has to LEARN (no overlap with the
    rule-lexicon default — proves it's not the trigger stand-in)."""
    rng = np.random.default_rng(seed)
    neg_cues = ["ruledout", "excludes", "unlikely"]
    aff_fill = ["shows", "confirms", "reveals", "notes"]
    docs = []
    for i in range(n):
        negated = bool(i % 2)
        cue = neg_cues[rng.integers(0, 3)] if negated \
            else aff_fill[rng.integers(0, 4)]
        filler = " ".join(rng.choice(
            ["exam", "today", "patient", "clinic", "report"], size=3))
        prefix = f"the {filler} {cue} "
        text = prefix + "fever and more text follows here"
        docs.append({
            "text": text,
            "annotations": [{
                "start": len(prefix), "end": len(prefix) + 5,
                "cui": "C0015967", "value": "fever",
                "meta_anns": {"Negation": {
                    "name": "Negation",
                    "value": "Negated" if negated else "Affirmed"}},
            }],
        })
    return {"projects": [{"name": "p", "documents": docs}]}


@pytest.fixture(scope="module")
def trained():
    from medcat_ray.stages.meta_model import (samples_from_mct,
                                              train_meta_model)
    data = _make_negation_mct()
    samples = samples_from_mct(data, "Negation")
    assert len(samples) == 120
    model, acc = train_meta_model(samples, "Negation", scope="left",
                                  hash_bits=12)
    return model, acc, samples


def test_learns_held_in_cues(trained):
    model, acc, _ = trained
    assert acc >= 0.98
    value, conf = model.score("the patient exam ruledout".split(), [])
    assert value == "Negated" and conf > 0.6
    value, conf = model.score("the report confirms".split(), [])
    assert value == "Affirmed" and conf > 0.6


def test_generalizes_to_unseen_windows(trained):
    model, _, _ = trained
    # cue word in a NEW sentence frame
    value, _ = model.score("scan today excludes".split(), [])
    assert value == "Negated"
    value, _ = model.score("summary notes".split(), [])
    assert value == "Affirmed"


def test_deterministic_training(trained):
    from medcat_ray.stages.meta_model import train_meta_model
    _, _, samples = trained
    m1, _ = train_meta_model(samples, "Negation", scope="left",
                             hash_bits=12)
    m2, _ = train_meta_model(samples, "Negation", scope="left",
                             hash_bits=12)
    assert np.array_equal(m1.W, m2.W) and np.array_equal(m1.b, m2.b)


def test_save_load_roundtrip(trained, tmp_path):
    from medcat_ray.stages.meta_model import LearnedMetaModel
    model, _, _ = trained
    p = str(tmp_path / "meta_negation.npz")
    model.save(p)
    back = LearnedMetaModel.load(p)
    assert np.array_equal(back.W, model.W)
    assert back.category_value2id == model.category_value2id
    v1 = model.score("exam ruledout".split(), [])
    v2 = back.score("exam ruledout".split(), [])
    assert v1 == v2


def test_plugs_into_meta_annotate_stage(trained, ray_session):
    """The learned model rides the SAME Ray actor stage as the rule
    models — meta_anns structs per entity, end to end."""
    import ray.data as rd
    from medcat_ray.pipelines import kg
    from medcat_ray.pipelines.docs_kg import DOCS_CONFIG, docs_cdb
    from medcat_ray.stages.meta import meta_annotate
    model, _, _ = trained
    cdb, vocab = docs_cdb()
    docs = rd.from_items([
        {"doc_id": 1, "text": "exam ruledout spark in the run"},
        {"doc_id": 2, "text": "report confirms spark again"},
    ])
    from medcat_ray.stages.annotate import AnnotateStage
    ann = docs.map_batches(
        AnnotateStage,
        fn_constructor_kwargs=dict(models=(cdb, vocab), config=DOCS_CONFIG,
                                   key_column="doc_id",
                                   keep_columns=("text",)),
        batch_format="pyarrow", concurrency=1, num_cpus=1)
    out = meta_annotate(ann, rules=[model], concurrency=1).to_pandas() \
        .set_index("doc_id")
    m1 = out.loc[1, "meta_anns"][0][0]
    m2 = out.loc[2, "meta_anns"][0][0]
    assert m1["name"] == "Negation" and m1["value"] == "Negated"
    assert m2["value"] == "Affirmed"


def test_distributed_featurization_matches_local(trained, ray_session):
    import ray.data as rd
    from medcat_ray.stages.meta_model import (featurize_samples_distributed,
                                              featurize_window)
    model, _, samples = trained
    sub = samples[:12]
    ds = rd.from_items([{"sid": i, "left": l, "right": [], "label": lbl}
                        for i, (l, r, lbl) in enumerate(sub)])
    out = featurize_samples_distributed(
        ds, model.category_value2id, hash_bits=12).to_pandas() \
        .set_index("sid").sort_index()   # block order is not deterministic
    assert len(out) == 12
    for i, (l, r, lbl) in enumerate(sub):
        ref = featurize_window(l, [], 12)
        assert np.allclose(np.asarray(out.loc[i, "x"]), ref)
        assert out.loc[i, "y"] == model.category_value2id[lbl]
