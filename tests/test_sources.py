"""Sources: UMLS MRCONSO (S3), SNOMED RF2 (S4), MCT export (S6),
model pack (S8)."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def umls_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("umls")
    # MRCONSO.RRF: 18 pipe-separated fields + trailing pipe.
    def conso(cui, lat, ispref, scui, sab, code, name):
        f = [""] * 18
        f[0], f[1], f[6], f[9], f[11], f[13], f[14] = \
            cui, lat, ispref, scui, sab, code, name
        return "|".join(f) + "|"
    rows = [
        conso("C01", "ENG", "Y", "111", "SNOMEDCT_US", "111", "kidney failure"),
        conso("C01", "ENG", "N", "111", "SNOMEDCT_US", "111", "renal failure"),
        conso("C01", "FRE", "Y", "", "MSHFRE", "F1", "insuffisance renale"),
        conso("C02", "ENG", "Y", "", "ICD10", "N18", "chronic kidney disease"),
        conso("C03", "ENG", "Y", "", "MSH", "D3", "unmapped concept"),
    ]
    (d / "MRCONSO.RRF").write_text("\n".join(rows) + "\n")
    sty = ["C01|T047|x|Disease|a||", "C02|T047|x|Disease|a||",
           "C02|T121|x|Drug|a||"]
    (d / "MRSTY.RRF").write_text("\n".join(sty) + "\n")
    return str(d)


def test_umls_concept_dataset(ray_session, umls_files):
    from medcat_ray.sources.umls import umls_concept_dataset
    df = umls_concept_dataset(
        os.path.join(umls_files, "MRCONSO.RRF"),
        os.path.join(umls_files, "MRSTY.RRF")).to_pandas()
    # FRE row dropped (language filter); C03 dropped (no TUI → inner join);
    # C02 fans out to 2 TUIs.
    assert len(df) == 4
    assert set(df["cui"]) == {"C01", "C02"}
    c02 = df[df["cui"] == "C02"]
    assert sorted(c02["type_ids"]) == ["T047", "T121"]
    assert set(df.columns) == {"cui", "name", "ontologies", "name_status",
                               "type_ids"}


def test_umls2snomed_and_source(ray_session, umls_files):
    from medcat_ray.sources.umls import umls2icd10, umls2snomed
    sn = umls2snomed(os.path.join(umls_files, "MRCONSO.RRF")).to_pandas()
    assert len(sn) == 2 and set(sn["SCUI"]) == {"111"}
    icd = umls2icd10(os.path.join(umls_files, "MRCONSO.RRF")).to_pandas()
    assert len(icd) == 1 and icd["CODE"].iloc[0] == "N18"


@pytest.fixture(scope="module")
def rf2_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("rf2")
    concept_hdr = "id\teffectiveTime\tactive\tmoduleId\tdefinitionStatusId"
    concepts = [concept_hdr,
                "1001\t20230101\t1\tm\tdef",
                "1002\t20230101\t1\tm\tdef",
                "1003\t20230101\t0\tm\tdef"]      # inactive
    (d / "concepts.txt").write_text("\n".join(concepts) + "\n")
    desc_hdr = ("id\teffectiveTime\tactive\tmoduleId\tconceptId\t"
                "languageCode\ttypeId\tterm\tcaseSignificanceId")
    descs = [desc_hdr,
             "d1\t2023\t1\tm\t1001\ten\t900000000000003001\t"
             "Myocardial infarction (disorder)\tcs",
             "d2\t2023\t1\tm\t1001\ten\t900000000000013009\tHeart attack\tcs",
             "d3\t2023\t1\tm\t1002\ten\t900000000000003001\t"
             "Aspirin (substance)\tcs",
             "d4\t2023\t0\tm\t1001\ten\t900000000000013009\tOld name\tcs",
             "d5\t2023\t1\tm\t1003\ten\t900000000000003001\t"
             "Inactive concept (disorder)\tcs"]
    (d / "descriptions.txt").write_text("\n".join(descs) + "\n")
    rel_hdr = ("id\teffectiveTime\tactive\tmoduleId\tsourceId\tdestinationId\t"
               "relationshipGroup\ttypeId\tcharacteristicTypeId\tmodifierId")
    rels = [rel_hdr,
            "r1\t2023\t1\tm\t1001\t1002\t0\t116680003\tc\tmod",   # is-a
            "r2\t2023\t1\tm\t1002\t1001\t0\t363698007\tc\tmod",   # finding site
            "r3\t2023\t0\tm\t1001\t1003\t0\t116680003\tc\tmod"]   # inactive
    (d / "relationships.txt").write_text("\n".join(rels) + "\n")
    return str(d)


def test_snomed_concepts(ray_session, rf2_files):
    from medcat_ray.sources.snomed import (snomed_concept_dataset,
                                           type_id_for_tag)
    df = snomed_concept_dataset(
        os.path.join(rf2_files, "concepts.txt"),
        os.path.join(rf2_files, "descriptions.txt")).to_pandas()
    # d4 inactive, d5's concept inactive → 3 rows.
    assert len(df) == 3
    mi = df[df["cui"] == "1001"].sort_values("name_status")
    assert list(mi["name_status"]) == ["A", "P"]
    assert set(mi["name"]) == {"Myocardial infarction (disorder)",
                               "Heart attack"}
    assert (df["ontologies"] == "SNOMED-CT").all()
    # type id = hashed FSN semantic tag, shared by both 1001 rows.
    expected = str(type_id_for_tag("disorder"))
    assert set(mi["type_ids"]) == {expected}


def test_snomed_relationships(ray_session, rf2_files):
    from medcat_ray.sources.snomed import (list_all_relationships,
                                           relationship_map,
                                           snomed_relationships)
    path = os.path.join(rf2_files, "relationships.txt")
    df = snomed_relationships(path).to_pandas()
    assert len(df) == 2       # r3 inactive
    assert set(zip(df["subj_cui"], df["pred"], df["obj_cui"])) == {
        ("1001", "116680003", "1002"), ("1002", "363698007", "1001")}
    assert list_all_relationships(path) == ["116680003", "363698007"]
    assert relationship_map(path, "116680003") == {"1002": ["1001"]}


@pytest.fixture(scope="module")
def mct_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("mct")
    export = {"projects": [{
        "name": "p", "id": 1, "cuis": "C01,C02", "tuis": "",
        "documents": [
            {"id": 10, "name": "doc10", "text": "kidney failure seen",
             "last_modified": "", "annotations": [
                 {"start": 0, "end": 14, "cui": "C01",
                  "value": "kidney failure", "correct": True,
                  "deleted": False, "alternative": False, "killed": False,
                  "manually_created": False}]},
            {"id": 11, "name": "doc11", "text": "no findings",
             "last_modified": "", "annotations": []},
        ]}]}
    p = d / "export.json"
    p.write_text(json.dumps(export))
    return str(p)


def test_mct_export(ray_session, mct_file):
    from medcat_ray.sources.mct_export import (read_mct_annotations,
                                               read_mct_documents)
    docs = read_mct_documents(mct_file).to_pandas()
    assert len(docs) == 2 and set(docs["doc_id"]) == {"10", "11"}
    anns = read_mct_annotations(mct_file).to_pandas()
    assert len(anns) == 1
    a = anns.iloc[0]
    assert (a["cui"], a["start"], a["end"], bool(a["correct"])) == \
        ("C01", 0, 14, True)


def test_model_pack_roundtrip(tmp_path):
    from medcat_ray.config import EngineConfig
    from medcat_ray.fixtures import build_fixture_models
    from medcat_ray.state.model_pack import load_model_pack, save_model_pack
    mdir = tmp_path / "models"
    mdir.mkdir()
    cdb, vocab = build_fixture_models(str(mdir), n_cuis=20)
    cfg = EngineConfig(min_name_len=4)
    pack = tmp_path / "pack"
    h1 = save_model_pack(str(pack), cdb, vocab, cfg)
    cdb2, vocab2, cfg2, h2 = load_model_pack(str(pack))
    assert h1 == h2
    assert cfg2.min_name_len == 4
    assert cdb2.name2cuis == cdb.name2cuis
    assert cdb2.content_hash() == cdb.content_hash()
    assert len(vocab2) == len(vocab)
    # hash must move when the model changes
    cdb.add_concept_rows([{"cui": "X99", "name": "brand new concept"}])
    h3 = save_model_pack(str(pack), cdb, vocab, cfg)
    assert h3 != h1


def test_refset_mapping_and_direct(ray_session, tmp_path):
    from medcat_ray.sources.snomed import (get_direct_refset_mapping,
                                           refset_mapping)
    hdr = ("id\teffectiveTime\tactive\tmoduleId\trefsetId\t"
           "referencedComponentId\tmapGroup\tmapPriority\tmapRule\t"
           "mapAdvice\tmapTarget\tcorrelationId\tmapCategoryId")
    rows = [hdr,
            "m1\t2023\t1\tm\tRS1\tSCUI1\t1\t1\tTRUE\tadvice\tTCUI1\tc\tmc",
            "m2\t2023\t1\tm\tRS1\tSCUI1\t1\t2\tTRUE\tadvice\tTCUI2\tc\tmc",
            "m3\t2023\t1\tm\tRS1\tSCUI1\t1\t3\tTRUE\tadvice\tTCUI3\tc\tmc",
            "m4\t2023\t0\tm\tRS1\tSCUI1\t1\t4\tTRUE\tadvice\tDEAD\tc\tmc",
            "m5\t2023\t1\tm\tRS2\tSCUI2\t1\t1\tTRUE\tadvice\tOPCS1\tc\tmc"]
    p = tmp_path / "refset.txt"
    p.write_text("\n".join(rows) + "\n")
    d = refset_mapping(str(p), refset_id="RS1")
    assert list(d) == ["SCUI1"]
    assert [e["code"] for e in d["SCUI1"]] == ["TCUI1", "TCUI2", "TCUI3"]
    # reference quirk: mapGroup mirrors mapPriority
    assert [e["mapGroup"] for e in d["SCUI1"]] == ["1", "2", "3"]
    # direct mapping: highest priority first (reference
    # tests/utils/test_preprocess_snomed.py:11-20 golden)
    example = {"SCUI1": [{"code": "TCUI1", "mapPriority": "1"},
                         {"code": "TCUI2", "mapPriority": "2"},
                         {"code": "TCUI3", "mapPriority": "3"}]}
    assert get_direct_refset_mapping(example) == {
        "SCUI1": ["TCUI3", "TCUI2", "TCUI1"]}
    import pytest as _pytest
    with _pytest.raises(KeyError):
        get_direct_refset_mapping(
            {"S": [{"code": "X"}]})          # no mapPriority
    with _pytest.raises(KeyError):
        get_direct_refset_mapping(
            {"S": [{"mapPriority": "1"}]})   # no code
    # unfiltered: both refsets present
    d_all = refset_mapping(str(p))
    assert set(d_all) == {"SCUI1", "SCUI2"}


def test_mrhier_pt2ch(ray_session, tmp_path):
    """Reference get_pt2ch semantics (preprocess_umls.py:191-260): isa rows
    of preferred atoms, parents resolved via AUI→CUI, self-loops dropped."""
    from medcat_ray.sources.umls import mrhier_pt2ch
    def conso(cui, lat, ispref, aui):
        f = [""] * 18
        f[0], f[1], f[6], f[7] = cui, lat, ispref, aui
        return "|".join(f) + "|"
    (tmp_path / "MRCONSO.RRF").write_text("\n".join([
        conso("C1", "ENG", "Y", "A1"),
        conso("C2", "ENG", "Y", "A2"),
        conso("C3", "ENG", "Y", "A3"),
        conso("C3", "ENG", "N", "A3b"),      # non-preferred atom
        conso("C4", "FRE", "Y", "A4"),       # language-filtered
    ]) + "\n")
    def hier(cui, aui, paui, rela):
        return f"{cui}|{aui}|1|{paui}|SRC|{rela}|ptr|hcd||"
    (tmp_path / "MRHIER.RRF").write_text("\n".join([
        hier("C2", "A2", "A1", "isa"),       # C1 -> C2
        hier("C3", "A3", "A1", "isa"),       # C1 -> C3
        hier("C3", "A3b", "A2", "isa"),      # dropped: non-preferred atom
        hier("C2", "A2", "A2", "isa"),       # self-parent dropped
        hier("C3", "A3", "A2", "part_of"),   # wrong RELA
    ]) + "\n")
    pt2ch = mrhier_pt2ch(str(tmp_path / "MRCONSO.RRF"),
                         str(tmp_path / "MRHIER.RRF"))
    assert pt2ch == {"C1": ["C2", "C3"]}


def test_pt2ch_and_children(ray_session, tmp_path):
    from medcat_ray.sources.snomed import get_all_children, pt2ch_map
    hdr = ("id\teffectiveTime\tactive\tmoduleId\tsourceId\tdestinationId\t"
           "relationshipGroup\ttypeId\tcharacteristicTypeId\tmodifierId")
    # A <- B, A <- C, C <- D (IS-A child pointing at parent), plus one
    # inactive row and one non-IS-A row that must be ignored
    rows = [hdr,
            "r1\t20230101\t1\tm\tB\tA\t0\t116680003\tc\tmod",
            "r2\t20230101\t1\tm\tC\tA\t0\t116680003\tc\tmod",
            "r3\t20230101\t1\tm\tD\tC\t0\t116680003\tc\tmod",
            "r4\t20230101\t0\tm\tE\tA\t0\t116680003\tc\tmod",   # inactive
            "r5\t20230101\t1\tm\tF\tA\t0\t363698007\tc\tmod"]   # not IS-A
    p = tmp_path / "rels.txt"
    p.write_text("\n".join(rows) + "\n")
    m = pt2ch_map(str(p))
    assert sorted(m["A"]) == ["B", "C"] and m["C"] == ["D"]
    assert "E" not in m.get("A", []) and "F" not in m.get("A", [])
    assert get_all_children("A", m) == ["A", "B", "C", "D"]
    assert get_all_children("C", m) == ["C", "D"]


def test_pubtator_medmentions_conversions(ray_session, tmp_path):
    from medcat_ray.sources.medmentions import (pubtator_concept_rows,
                                                pubtator_to_mct,
                                                pubtator_to_text,
                                                read_pubtator_documents)
    raw = (
        "100|t|Glioma study\n"
        "100|a|Gliomas arise from glial cells.\n"
        "100\t0\t6\tGlioma\tT191\tC0017638\n"
        "100\t13\t20\tGliomas\tT191,T047\tC0017638\n"
        "\n"
        "200|t|Second doc\n"
        "200|a|About seizures only.\n"
        "200\t17\t25\tseizures\tT033\tC0036572\n"
        "\n")
    p = tmp_path / "corpus.pubtator"
    p.write_text(raw)

    docs = read_pubtator_documents(str(p)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(docs["doc_id"]) == ["100", "200"]
    # reference concatenation: title + " " + abstract
    assert docs.loc[0, "text"] == "Glioma study Gliomas arise from glial cells."
    assert docs.loc[0, "annotations"][1]["type_id"] == "T191|T047"

    rows = pubtator_concept_rows(str(p)).to_pandas() \
        .sort_values(["cui", "name"]).reset_index(drop=True)
    assert set(rows["cui"]) == {"C0017638", "C0036572"}
    assert (rows["name_status"] == "A").all()
    assert len(rows) == 3  # (cui,type,name) distinct

    out_txt = tmp_path / "pure.txt"
    pubtator_to_text(str(p), str(out_txt))
    lines = out_txt.read_text().splitlines()
    assert lines[0].rstrip() == "Glioma study Gliomas arise from glial cells."

    mct = pubtator_to_mct(str(p), str(tmp_path / "mct.json"))
    assert mct["projects"][0]["name"] == "medmentions"
    docs_mct = mct["projects"][0]["documents"]
    assert len(docs_mct) == 2
    ann = docs_mct[0]["annotations"][0]
    assert (ann["start"], ann["end"], ann["cui"]) == (0, 6, "C0017638")
    # offsets index into the concatenated text exactly
    assert docs_mct[0]["text"][ann["start"]:ann["end"]] == "Glioma"


# ---------------------------------------------------------------------------
# S9 — HF dataset builders re-expressed as Ray sources (hf_datasets.py)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def mct_status_file(tmp_path_factory):
    """MCT export exercising every branch of the reference's
    annotation-status filter (transformers_ner.py:100-106)."""
    d = tmp_path_factory.mktemp("hf_ner")
    ann = lambda start, end, cui, **kw: {
        "start": start, "end": end, "cui": cui, "value": "x",
        "correct": kw.pop("correct", False), **kw}
    export = {"projects": [{"name": "p", "id": 1, "documents": [
        {"id": 10, "name": "doc10", "text": "kidney failure and flu seen",
         "annotations": [
             ann(0, 14, "C01", correct=True),                 # kept
             ann(19, 22, "C02", manually_created=True),       # kept
             ann(23, 27, "C03", alternative=True),            # kept
             ann(0, 6, "C04", correct=True, deleted=True),    # dropped
             ann(0, 6, "C05", correct=True, irrelevant=True), # dropped
             ann(0, 6, "C06", correct=True, killed=True),     # dropped
             ann(0, 6, "C07"),                                # dropped (all False)
         ]},
        {"text": "no annotations here", "annotations": []},   # id falls back to cnt
    ]}]}
    p = d / "export.json"
    p.write_text(json.dumps(export))
    return str(p)


def test_read_transformers_ner(ray_session, mct_status_file):
    from medcat_ray.sources.hf_datasets import read_transformers_ner
    df = read_transformers_ner(mct_status_file).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "text", "name", "ent_starts",
                                "ent_ends", "ent_cuis"]
    assert len(df) == 2
    d10 = df[df["id"] == 10].iloc[0]
    assert list(d10["ent_cuis"]) == ["C01", "C02", "C03"]
    assert list(d10["ent_starts"]) == [0, 19, 23]
    assert list(d10["ent_ends"]) == [14, 22, 27]
    # second doc: no "id" key → falls back to the running counter (1),
    # no "name" → "unknown", empty annotation lists survive typed.
    d1 = df[df["id"] == 1].iloc[0]
    assert d1["name"] == "unknown" and len(d1["ent_cuis"]) == 0


def test_read_medcat_annotations(ray_session, tmp_path):
    import pickle
    from medcat_ray.sources.hf_datasets import read_medcat_annotations
    docs = {"docA": {"entities": {
        7: {"id": 7, "context_left": ["seen ", "in "],
            "context_right": [" of", " note"],
            "context_center": ["kidney failure"]},
        9: {"id": 9, "context_left": [], "context_right": ["!"],
            "context_center": ["flu"]},
    }}}
    p = tmp_path / "anns.pickle"
    p.write_bytes(pickle.dumps(docs))
    df = read_medcat_annotations(str(p)).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert list(df.columns) == ["id", "document_id", "context_left",
                                "context_right", "context_center"]
    assert len(df) == 2
    assert df.iloc[0]["context_left"] == "seen in "    # "".join semantics
    assert df.iloc[0]["context_center"] == "kidney failure"
    assert df.iloc[1]["context_left"] == ""
    assert set(df["document_id"]) == {"docA"}


def test_read_patient_concept_stream(ray_session, tmp_path):
    import pickle
    from medcat_ray.sources.hf_datasets import read_patient_concept_stream
    # (CUI, CNT, TIME, age_years): age markers spliced in when age advances
    pt2stream = {
        "pt1": [("C01", 1, 100, 40), ("C02", 1, 101, 40),
                ("C03", 1, 200, 41), ("C01", 1, 201, 41)],
        "pt2": [("C09", 1, 50, 12)],
    }
    p = tmp_path / "stream.pickle"
    p.write_bytes(pickle.dumps(pt2stream))
    df = read_patient_concept_stream(str(p)).to_pandas() \
        .sort_values("patient_id").reset_index(drop=True)
    assert len(df) == 2
    assert list(df.iloc[0]["stream"]) == \
        ["40", "C01", "C02", "41", "C03", "C01"]
    assert list(df.iloc[1]["stream"]) == ["12", "C09"]
