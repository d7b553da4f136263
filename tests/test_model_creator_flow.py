"""YAML model-creator flow (pipelines/model_creator.py) — the reference
create_models scenario (medcat/utils/model_creator.py:98-140 +
tests/model_creator/config_example.yml): concept CSV + line corpus →
CDB + vocab + trained vectors + saved pack → annotate with the pack."""

import os

import ray.data as rd

from medcat_ray.pipelines.model_creator import create_models
from medcat_ray.state.model_pack import load_model_pack


def _write_fixture(tmp: str) -> str:
    csv_path = os.path.join(tmp, "concepts.csv")
    with open(csv_path, "w") as fh:
        fh.write("cui,name,name_status,type_ids\n")
        fh.write("C01,headache,P,T047\n")
        fh.write("C02,fever,P,T047\n")
        fh.write("C03,aspirin,P,T121\n")
    corpus = os.path.join(tmp, "corpus.txt")
    lines = ["patient with headache and fever took aspirin",
             "fever resolved after aspirin",
             "headache persists without fever"] * 10
    with open(corpus, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    yml = os.path.join(tmp, "creator.yml")
    with open(yml, "w") as fh:
        fh.write(f"""
output_dir: {tmp}/out
concept_csv_file: {csv_path}
unsupervised_training_data_file: {corpus}
engine_config:
  spell_check: false
vocab:
  dim: 16
  min_count: 1
""")
    return yml


def test_create_models_end_to_end(ray_session, tmp_path):
    yml = _write_fixture(str(tmp_path))
    cdb, vocab, config, pack_path = create_models(yml)
    assert set(cdb.cui2names) == {"C01", "C02", "C03"}
    assert "headache" in vocab                 # corpus word with vector
    assert cdb.cui2count_train["C01"] == 20    # 2 corpus lines × 10
    assert cdb.cui2count_train["C03"] == 20
    # trained context vectors installed
    assert cdb.cui2context_vectors["C02"]

    # the saved pack round-trips and annotates
    cdb2, vocab2, config2, pack_hash = load_model_pack(pack_path)
    from medcat_ray.pipelines import kg
    docs = rd.from_items([
        {"doc_id": 1, "text": "severe headache treated with aspirin"},
        {"doc_id": 2, "text": "no findings"}])
    ann = kg.annotate(docs, (cdb2, vocab2), config2, concurrency=1,
                      key_column="doc_id")
    ents = kg.entities(ann, key_column="doc_id").to_pandas()
    got = set(zip(ents["doc_id"], ents["cui"]))
    assert got == {(1, "C01"), (1, "C03")}


def test_create_models_parquet_corpus(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    tmp = str(tmp_path)
    csv_path = os.path.join(tmp, "concepts.csv")
    with open(csv_path, "w") as fh:
        fh.write("cui,name,name_status,type_ids\n")
        fh.write("C01,nausea,P,T047\n")
    pq.write_table(pa.table({"text": ["nausea reported daily"] * 5}),
                   os.path.join(tmp, "corpus.parquet"))
    yml = os.path.join(tmp, "creator.yml")
    with open(yml, "w") as fh:
        fh.write(f"""
output_dir: {tmp}/out
concept_csv_file: {csv_path}
unsupervised_training_data_file: {tmp}/corpus.parquet
vocab:
  dim: 8
  min_count: 1
""")
    cdb, vocab, config, pack_path = create_models(yml)
    assert cdb.cui2count_train["C01"] == 5
    assert os.path.exists(os.path.join(pack_path, "pack_hash.txt"))
