"""CDB build/save/load tests (reference style: tests/test_cdb_maker.py,
tests/test_cdb.py)."""

import csv
import io

import numpy as np

from medcat_ray.config import EngineConfig
from medcat_ray.state.cdb import CDB, prepare_name
from medcat_ray.state.vocab import Vocab

CFG = EngineConfig()

CSV = """cui,name,ontologies,name_status,type_ids,description
C0000039,"Virus",MSH,P,T109|T123,A synthetic concept
C0000039,"Virus M|Virus K|Virus Z",,,,
C0000139,"Virus M|Virus K|Virus Z",,P,,
"""


def build_from_csv(text=CSV, full_build=True):
    cdb = CDB(CFG)
    cdb.add_concept_rows(csv.DictReader(io.StringIO(text)), full_build=full_build)
    return cdb


def test_multi_name_split_and_status():
    # reference CDBMaker semantics (/root/reference/medcat/cdb_maker.py:144-195)
    cdb = build_from_csv()
    assert "virus" in cdb.name2cuis
    assert cdb.name2cuis["virus"] == ["C0000039"]
    # shared names link to both CUIs, in build order
    assert cdb.name2cuis["virus~m"] == ["C0000039", "C0000139"]
    # second concept declared P for the shared name
    assert cdb.name2cuis2status["virus~m"] == {"C0000039": "A", "C0000139": "P"}
    assert cdb.cui2type_ids["C0000039"] == {"T109", "T123"}
    assert cdb.cui2preferred_name["C0000039"] == "Virus"


def test_snames_are_prefixes():
    cdb = build_from_csv()
    assert "virus" in cdb.snames and "virus~m" in cdb.snames
    assert cdb.cui2snames["C0000039"] >= {"virus", "virus~m", "virus~k"}


def test_word_vocab_counts():
    cdb = build_from_csv()
    # 'virus' appears in every name version of both CUIs
    assert cdb.vocab["virus"] >= 4
    assert "m" in cdb.vocab


def test_min_letters_required():
    # single-letter name rejected (prepare_name min_letters_required=2,
    # cleaners.py:53-54)
    names = prepare_name("M", CFG)
    assert names == {}
    names = prepare_name("Mg", CFG)
    assert "mg" in names


def test_prepare_name_versions():
    names = prepare_name("Movar viruses", CFG)
    assert set(names) == {"movar~viruses", "movar~viruse"}
    assert names["movar~viruses"]["snames"] == {"movar", "movar~viruses"}
    assert names["movar~viruses"]["is_upper"] is False


def test_save_load_roundtrip(tmp_path):
    cdb = build_from_csv()
    rng = np.random.default_rng(1)
    cdb.set_context_vectors(
        "C0000039", {ct: rng.normal(size=4) for ct in CFG.context_vector_sizes},
        count_train=7)
    h1 = cdb.save(str(tmp_path / "cdb"))
    loaded = CDB.load(str(tmp_path / "cdb"), CFG)
    assert loaded.name2cuis == cdb.name2cuis
    assert loaded.name2cuis2status == cdb.name2cuis2status
    assert loaded.snames == cdb.snames
    assert loaded.cui2names == cdb.cui2names
    assert loaded.cui2type_ids == cdb.cui2type_ids
    assert loaded.cui2count_train == cdb.cui2count_train
    assert loaded.vocab == cdb.vocab
    np.testing.assert_allclose(
        loaded.cui2context_vectors["C0000039"]["short"],
        cdb.cui2context_vectors["C0000039"]["short"])
    assert loaded.content_hash() == h1


def test_filter_by_cui_closure():
    cdb = build_from_csv()
    cdb.filter_by_cui(["C0000139"])
    # semi-join closure: shared names keep BOTH their CUIs (cdb.py:660-738)
    assert "C0000039" in cdb.name2cuis["virus~m"]
    # but the exclusive name of C0000039 is gone
    assert "virus" not in cdb.name2cuis


def test_vocab_tsv_roundtrip(tmp_path):
    p = tmp_path / "vocab.tsv"
    p.write_text("house\t34444\t0.3 0.1 1.2\nnovec\t5\n")
    vocab = Vocab.from_tsv(str(p))
    assert "house" in vocab and "novec" in vocab
    np.testing.assert_allclose(vocab.vec("house"), [0.3, 0.1, 1.2], rtol=1e-6)
    assert vocab.vec("novec") is None
    vocab.save(str(tmp_path / "v"))
    v2 = Vocab.load(str(tmp_path / "v"))
    assert v2.word2cnt == vocab.word2cnt
    np.testing.assert_allclose(v2.vec("house"), vocab.vec("house"))


def test_cdb_maker_reference_goldens():
    """Reproduce the reference CDBMaker load-test expectations
    (/root/reference/tests/test_cdb_maker.py:46-113) on the same concept
    CSV inputs (/root/reference/examples/cdb.csv, cdb_2.csv content)."""
    import csv
    import io
    from medcat_ray.config import EngineConfig
    from medcat_ray.state.cdb import CDB
    cdb = CDB(EngineConfig())
    csv1 = (
        "cui,name,ontologies,name_status,type_ids,description\n"
        'C0000039,"Virus",MSH,P,T109|T123,Synthetic phospholipid used\n'
        'C0000039,"Virus M",,,T234,\n'
        'C0000039,"Virus M |Virus K|Virus Z",,,,\n'
        'C0000139,"Virus M|Virus K|Virus Z",,P,,\n'
        'C0000139,"Virus",,A,,\n')
    csv2 = ("cui,name,ontologies,name_status,type_ids,description\n"
            'C0000239,"Second csv",,,,\n')
    for c in (csv1, csv2):
        cdb.add_concept_rows(csv.DictReader(io.StringIO(c)), full_build=True)

    # test_ab_cdb_names_output
    assert cdb.cui2names == {
        "C0000039": {"virus~k", "virus", "virus~m", "virus~z"},
        "C0000139": {"virus~k", "virus", "virus~m", "virus~z"},
        "C0000239": {"second~csv"}}
    # test_ad_cdb_snames_output
    assert cdb.cui2snames["C0000239"] == {"second", "second~csv"}
    # test_af_cdb_name_to_cuis_output
    assert cdb.name2cuis == {
        "virus": ["C0000039", "C0000139"],
        "virus~m": ["C0000039", "C0000139"],
        "virus~k": ["C0000039", "C0000139"],
        "virus~z": ["C0000039", "C0000139"],
        "second~csv": ["C0000239"]}
    # test_aj_cdb_cui_to_preferred_name_output
    assert cdb.cui2preferred_name == {"C0000039": "Virus",
                                      "C0000139": "Virus Z"}
    # test_ap_cdb_name_to_cui_to_status_output
    assert cdb.name2cuis2status == {
        "virus": {"C0000039": "P", "C0000139": "A"},
        "virus~m": {"C0000039": "A", "C0000139": "P"},
        "virus~k": {"C0000039": "A", "C0000139": "P"},
        "virus~z": {"C0000039": "A", "C0000139": "P"},
        "second~csv": {"C0000239": "A"}}
    # test_ar_cdb_cui_to_type_ids_output
    assert cdb.cui2type_ids == {"C0000039": {"T234", "T109", "T123"},
                                "C0000139": set(), "C0000239": set()}
    # test_at (addl_info subset)
    assert cdb.addl_info["cui2ontologies"] == {"C0000039": {"MSH"}}
    assert cdb.addl_info["cui2original_names"]["C0000139"] == {
        "Virus K", "Virus M", "Virus", "Virus Z"}
    assert cdb.addl_info["type_id2cuis"] == {
        "T109": {"C0000039"}, "T123": {"C0000039"}, "T234": {"C0000039"}}
    # empty training state (test_ak/am)
    assert cdb.cui2context_vectors == {}
    assert cdb.cui2count_train == {}


def test_vocab_reference_goldens(tmp_path):
    """Reference Vocab test expectations
    (/root/reference/tests/test_vocab.py:19-38) on the same TSV content
    (/root/reference/examples/vocab_data.txt)."""
    import numpy as np
    from medcat_ray.state.vocab import Vocab
    tsv = tmp_path / "vocab_data.txt"
    tsv.write_text("house\t34444\t 0.3232 0.123213 1.231231\n"
                   "dog\t14444\t0.76762 0.76767 1.45454\n")
    v = Vocab.from_tsv(str(tsv))
    assert sorted(v.word2cnt) == ["dog", "house"]
    assert v.word2cnt["house"] == 34444          # test_count
    assert "house" in v                          # membership
    v.add_word("test", cnt=31, vec=[1.42, 1.44, 1.55])
    assert "test" in v
    np.testing.assert_allclose(v.vec("test"), [1.42, 1.44, 1.55], rtol=1e-6)
    # save/load roundtrip keeps all words (test_save_and_load)
    v.save(str(tmp_path / "v"))
    v2 = Vocab.load(str(tmp_path / "v"))
    assert sorted(v2.word2cnt) == ["dog", "house", "test"]
    np.testing.assert_allclose(v2.vec("house"),
                               [0.3232, 0.123213, 1.231231], rtol=1e-6)
    # negative sampling draws only vector-bearing words, unigram^0.75
    v2.make_unigram_table()
    words = v2.get_negative_samples(200, rng=np.random.default_rng(32))
    assert set(words) <= {"dog", "house", "test"}
    # 'house' dominates (34444^0.75 share)
    assert words.count("house") > words.count("dog") > words.count("test")


def test_engine_config_roundtrip():
    from medcat_ray.config import DEFAULT_CONFIG, EngineConfig
    cfg = EngineConfig(min_name_len=4, cuis_allow=frozenset({"C1"}),
                      name_versions=("LOWER",))
    d = cfg.to_dict()
    import json
    json.dumps(d)                       # JSON-able
    back = EngineConfig.from_dict(d)
    assert back == cfg
    assert EngineConfig.from_dict(DEFAULT_CONFIG.to_dict()) == DEFAULT_CONFIG


def test_captured_state_cdb_restores_training_mutations(tmp_path):
    """Reference cdb_state semantics: training inside the context leaves
    no trace after exit (both memory and disk capture paths)."""
    import io, csv
    from medcat_ray.state.cdb import CDB
    from medcat_ray.state.cdb_state import captured_state_cdb
    from medcat_ray.config import EngineConfig

    csv_text = ("cui,name,ontologies,name_status,type_ids,description\n"
                "C1,Alpha,MSH,P,T1,x\nC2,Beta,MSH,P,T1,y\n")
    cdb = CDB(EngineConfig())
    cdb.add_concept_rows(csv.DictReader(io.StringIO(csv_text)))
    before_hash = cdb.content_hash()

    for disk in (False, True):
        with captured_state_cdb(cdb, save_state_to_disk=disk):
            cdb.cui2count_train["C1"] = 99
            import numpy as np
            cdb.cui2context_vectors["C1"] = {"long": np.ones(4)}
            cdb.cui2names["C1"].add("alphanew")
            assert cdb.cui2count_train.get("C1") == 99
        assert cdb.cui2count_train.get("C1") is None
        assert "C1" not in cdb.cui2context_vectors
        assert "alphanew" not in cdb.cui2names["C1"]
        assert cdb.content_hash() == before_hash


def test_pca_vector_compression_and_icd10_filter():
    import numpy as np
    from medcat_ray.state.vocab import (Vocab, calc_pca_matrix,
                                        compress_vectors, convert_vec)
    rng = np.random.default_rng(2)
    vocab = Vocab()
    # vectors with variance concentrated in the first 3 dims
    scale = np.array([10.0, 5.0, 2.0] + [0.01] * 13)
    for i in range(50):
        vocab.add_word(f"w{i}", cnt=5, vec=rng.normal(size=16) * scale)
    m = calc_pca_matrix(vocab, 3)
    assert m.shape == (3, 16)
    v0 = vocab.vec("w0").astype(np.float64).copy()
    proj = convert_vec(v0, m)
    assert proj.shape == (3,) and proj.dtype == np.float32
    compress_vectors(vocab, 3)
    assert vocab.vectors.shape == (50, 3)
    assert np.allclose(vocab.vec("w0"), proj, atol=1e-5)
    # dominant-variance directions preserved: projected variance ~ total
    var_kept = vocab.vectors.astype(np.float64).var(axis=0).sum()
    assert var_kept > 0.95 * (scale ** 2).sum() * 0.8

    import io, csv
    from medcat_ray.config import EngineConfig
    from medcat_ray.state.cdb import CDB, filter_cdb_by_icd10
    csv_text = ("cui,name,ontologies,name_status,type_ids,description\n"
                "C1,Alpha,MSH,P,T1,x\nC2,Beta,MSH,P,T1,y\nC3,Gama,MSH,P,T1,z\n")
    cdb = CDB(EngineConfig())
    cdb.add_concept_rows(csv.DictReader(io.StringIO(csv_text)))
    cdb.addl_info["cui2icd10"] = {"C1": ["A01"], "C3": ["B02"]}
    filter_cdb_by_icd10(cdb)
    assert set(cdb.cui2names) == {"C1", "C3"}
    assert "beta" not in cdb.name2cuis
