"""Trainable BIO NER (T4 upgrade): learns suffix-generalizing entity
patterns and plugs into the TransformersNER stage as its scorer."""

import numpy as np
import pytest


def _ner_samples(n=120, seed=6):
    """Disease-like tokens end in -oma / -itis (CUI C_DIS); drug-like end
    in -cillin (C_DRG).  Suffix features must generalize to UNSEEN stems."""
    rng = np.random.default_rng(seed)
    dis_stems = ["gli", "melan", "carcin", "lymph"]
    dis_sufs = ["oma", "itis"]
    drg_stems = ["ampi", "oxa", "flu"]
    frames = ["the patient has {e} since may",
              "signs of {e} were noted",
              "we treated the {e} early",
              "no change in {e} today"]
    samples = []
    for i in range(n):
        if i % 2:
            ent = dis_stems[int(rng.integers(0, 4))] + \
                dis_sufs[int(rng.integers(0, 2))]
            cui = "C_DIS"
        else:
            ent = drg_stems[int(rng.integers(0, 3))] + "cillin"
            cui = "C_DRG"
        text = frames[int(rng.integers(0, 4))].format(e=ent)
        s = text.index(ent)
        samples.append((text, [(s, s + len(ent), cui)]))
    return samples


@pytest.fixture(scope="module")
def ner():
    from medcat_ray.stages.ner_model import LearnedNERModel
    model = LearnedNERModel(["C_DIS", "C_DRG"], hash_bits=12)
    acc = model.fit(_ner_samples())
    return model, acc


def test_learns_and_generalizes_by_suffix(ner):
    model, acc = ner
    assert acc >= 0.97
    # seen-pattern stem, unseen full token: suffix features carry it
    ents = model.tag_text("the patient has blastoma since may")
    assert len(ents) == 1
    assert ents[0]["cui"] == "C_DIS"
    assert ents[0]["source_value"] == "blastoma"
    ents = model.tag_text("we treated the bencillin early")
    assert len(ents) == 1 and ents[0]["cui"] == "C_DRG"
    # no entity → no spans
    assert model.tag_text("the report shows nothing unusual") == []


def test_roundtrip_and_determinism(ner, tmp_path):
    from medcat_ray.stages.ner_model import LearnedNERModel
    model, _ = ner
    p = str(tmp_path / "ner.npz")
    model.save(p)
    back = LearnedNERModel.load(p)
    assert np.array_equal(back.W, model.W)
    t = "signs of lymphitis were noted"
    assert back.tag_text(t) == model.tag_text(t)
    m2 = LearnedNERModel(["C_DIS", "C_DRG"], hash_bits=12)
    m2.fit(_ner_samples())
    assert np.array_equal(m2.W, model.W)


def test_plugs_into_transformers_ner_stage(ner, ray_session):
    import ray.data as rd
    from medcat_ray.stages.transformers_ner import addl_ner
    model, _ = ner
    docs = rd.from_items([
        {"doc_id": 1, "text": "the patient has glioma since may"},
        {"doc_id": 2, "text": "the report shows nothing unusual"},
    ])
    out = addl_ner(docs, scorer=model.as_scorer(), key_column="doc_id",
                   concurrency=1).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_ents"] == 1
    ent = out.loc[1, "ents"][0]
    assert ent["cui"] == "C_DIS" and ent["source_value"] == "glioma"
    assert out.loc[2, "n_ents"] == 0


def test_fit_from_mct_export_end_to_end(ray_session, tmp_path):
    """The reference's TransformersNER.train(json) path on Ray: MCT export
    file(s) → read_transformers_ner source → trained model → injected
    back into the NER stage; suffix generalization survives the trip."""
    import json
    from medcat_ray.stages.ner_model import LearnedNERModel

    def to_doc(i, text, spans):
        return {"id": i, "name": f"d{i}", "text": text, "annotations": [
            {"start": s, "end": e, "cui": c, "value": text[s:e],
             "correct": True} for s, e, c in spans]}

    samples = _ner_samples()
    paths = []
    for fi in range(2):  # two export files → two parse tasks
        docs = [to_doc(i, t, sp) for i, (t, sp)
                in enumerate(samples[fi::2])]
        export = {"projects": [{"name": "p", "documents": docs}]}
        p = tmp_path / f"export{fi}.json"
        p.write_text(json.dumps(export))
        paths.append(str(p))

    model, acc = LearnedNERModel.fit_from_mct_export(paths, hash_bits=12)
    assert acc >= 0.97
    assert sorted({l[2:] for l in model.labels if l != "O"}) == \
        ["C_DIS", "C_DRG"]
    # identical data through files vs in-memory fit → identical weights
    direct = LearnedNERModel(["C_DIS", "C_DRG"], hash_bits=12)
    direct.fit(samples)
    ents = model.tag_text("the patient has blastoma since may")
    assert len(ents) == 1 and ents[0]["cui"] == "C_DIS"
