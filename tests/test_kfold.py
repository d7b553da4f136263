"""K-fold orchestration (stats_kfold) vs reference kfold.py semantics:
fold-creator shapes pinned by hand, the train/eval replay driver
restores CDB state between folds, and the 3-fold metric merge matches a
hand-computed expectation."""

import numpy as np
import pandas as pd
import pytest

from medcat_ray import stats_kfold as kf
from medcat_ray.config import EngineConfig
from medcat_ray.state.cdb import CDB
from medcat_ray.state.vocab import Vocab


def make_export(n_docs=7, anns_per_doc=(3, 1, 2, 0, 4, 2, 1)):
    projects = [{"id": 1, "name": "projA", "cuis": "", "documents": []},
                {"id": 2, "name": "projB", "cuis": "", "documents": []}]
    for d in range(n_docs):
        doc = {"id": d + 1, "name": f"doc{d + 1}",
               "text": f"text of doc {d + 1}",
               "annotations": [
                   {"start": 10 * a, "end": 10 * a + 5, "cui": f"C{a % 3}",
                    "value": f"v{a}", "correct": True}
                   for a in range(anns_per_doc[d])]}
        projects[d % 2]["documents"].append(doc)
    return {"projects": projects}


def test_counts_and_iters():
    ex = make_export()
    assert kf.count_all_docs(ex) == 7
    assert kf.count_all_annotations(ex) == sum((3, 1, 2, 0, 4, 2, 1))
    names = [d.get("name") for _, d in kf.iter_docs(ex)]
    # export order: projA docs (1,3,5,7) then projB docs (2,4,6)
    assert names == ["doc1", "doc3", "doc5", "doc7",
                     "doc2", "doc4", "doc6"]


def test_folds_per_docs_contiguous_last_gets_remainder():
    ex = make_export()
    folds = kf.folds_per_docs(ex, 3)
    sizes = [kf.count_all_docs(f) for f in folds]
    assert sizes == [2, 2, 3]   # 7 docs, 7//3=2, last fold absorbs
    # contiguity in export order
    assert [d["name"] for _, d in kf.iter_docs(folds[0])] == \
        ["doc1", "doc3"]
    assert [d["name"] for _, d in kf.iter_docs(folds[2])] == \
        ["doc2", "doc4", "doc6"]
    # every doc appears exactly once across folds
    all_names = sorted(n for f in folds for _, d in kf.iter_docs(f)
                       for n in [d["name"]])
    assert all_names == sorted(d["name"] for _, d in kf.iter_docs(ex))
    with pytest.raises(ValueError):
        kf.folds_per_docs(ex, 8)


def test_folds_per_anns_sizes_and_replication():
    ex = make_export()   # 13 annotations
    folds = kf.folds_per_anns(ex, 3)
    sizes = [kf.count_all_annotations(f) for f in folds]
    assert sizes == [4, 4, 5]   # 13//3=4 each, remainder on last
    # a doc whose annotations straddle a cut appears in both folds,
    # split without loss or duplication
    total = sum(sizes)
    assert total == 13
    # zero-annotation docs are never replicated
    for f in folds:
        for _, d in kf.iter_docs(f):
            assert d["annotations"], "per-anns folds only carry ann docs"


def test_folds_weighted_greedy_binpack():
    ex = make_export()   # weights in export order: 3,2,4,1 | 1,0,2
    folds = kf.folds_weighted_docs(ex, 3)
    weights = [sum(len(d["annotations"]) for _, d in kf.iter_docs(f))
               for f in folds]
    # heaviest-first greedy: 4->f0, 3->f1, 2->f2, 2->f2(? lightest), ...
    # exact trace: docs sorted desc by weight [4,3,2,2,1,1,0]
    # f=[0,0,0] -> 4 to f0; [4,0,0] -> 3 to f1; [4,3,0] -> 2 to f2;
    # [4,3,2] -> 2 to f2; [4,3,4] -> 1 to f1; [4,4,4] -> 1 to f0;
    # [5,4,4] -> 0 to f1
    assert weights == [5, 4, 4]
    all_names = sorted(d["name"] for f in folds
                       for _, d in kf.iter_docs(f))
    assert all_names == sorted(d["name"] for _, d in kf.iter_docs(ex))


def test_create_folds_dispatch():
    ex = make_export()
    assert len(kf.create_folds(ex, 3, "docs")) == 3
    assert len(kf.create_folds(ex, 3, "anns")) == 3
    assert len(kf.create_folds(ex, 3, "weighted")) == 3
    with pytest.raises(ValueError):
        kf.create_folds(ex, 3, "nope")


def _kfold_models(dim=8):
    cfg = EngineConfig(spell_check=False)
    cdb = CDB(cfg)
    cdb.add_concept_rows([
        {"cui": "C1", "name": "kidney failure", "name_status": "P"},
        {"cui": "C2", "name": "heart attack", "name_status": "P"},
    ])
    vocab = Vocab()
    rng = np.random.default_rng(3)
    for w in ["kidney", "failure", "heart", "attack", "patient", "with",
              "chronic", "acute", "severe", "history", "of"]:
        vocab.add_word(w, cnt=100, vec=rng.normal(size=dim))
    return cdb, vocab, cfg


def _training_export():
    """6 docs; every doc mentions a concept the dictionary can find, so
    gold == pred for annotated mentions and per-fold metrics are exact."""
    texts = [
        ("patient with kidney failure", 13, 27, "C1"),
        ("chronic kidney failure noted", 8, 22, "C1"),
        ("severe heart attack", 7, 19, "C2"),
        ("history of heart attack", 11, 23, "C2"),
        ("acute kidney failure", 6, 20, "C1"),
        ("heart attack with pain", 0, 12, "C2"),
    ]
    docs = [{"id": i + 1, "name": f"d{i + 1}", "text": t,
             "annotations": [{"start": s, "end": e, "cui": c,
                              "value": t[s:e], "correct": True}]}
            for i, (t, s, e, c) in enumerate(texts)]
    return {"projects": [{"id": 1, "name": "p", "cuis": "",
                          "documents": docs}]}


def test_kfold_replay_restores_state_and_merges(ray_session):
    cdb, vocab, cfg = _kfold_models()
    export = _training_export()
    before_counts = dict(cdb.cui2count_train)
    merged = kf.get_k_fold_stats(cdb, vocab, export, k=3,
                                 split_type="docs", config=cfg)
    # CDB state restored after the replay (captured_state_cdb per fold)
    assert dict(cdb.cui2count_train) == before_counts
    # the dictionary finds every planted mention -> all TP, no FP/FN
    got = merged.set_index("cui")
    assert set(got.index) == {"C1", "C2"}
    assert int(got.loc["C1", "tp"]) == 3 and int(got.loc["C2", "tp"]) == 3
    assert int(got["fp"].sum()) == 0 and int(got["fn"].sum()) == 0
    assert float(got.loc["C1", "f1"]) == 1.0


def test_kfold_merge_matches_hand_computation():
    """merge_fold_stats over hand-built per-fold frames == hand-computed
    totals (the reference get_metrics_mean additive path)."""
    from medcat_ray.stats import merge_fold_stats
    f1 = pd.DataFrame({"cui": ["C1", "C2"], "tp": [2, 0], "fp": [1, 0],
                       "fn": [0, 1]})
    f2 = pd.DataFrame({"cui": ["C1"], "tp": [1], "fp": [0], "fn": [2]})
    f3 = pd.DataFrame({"cui": ["C2"], "tp": [3], "fp": [1], "fn": [0]})
    m = merge_fold_stats([f1, f2, f3]).set_index("cui")
    # C1: tp=3 fp=1 fn=2 -> prec 3/4, rec 3/5, f1 6/9
    assert int(m.loc["C1", "tp"]) == 3
    assert float(m.loc["C1", "prec"]) == 0.75
    assert float(m.loc["C1", "rec"]) == 0.6
    assert float(m.loc["C1", "f1"]) == pytest.approx(2 * 3 / (2 * 3 + 1 + 2),
                                                     abs=1e-6)
    # C2: tp=3 fp=1 fn=1
    assert float(m.loc["C2", "prec"]) == 0.75
    assert float(m.loc["C2", "rec"]) == 0.75


def test_per_fold_metrics_holds_out_each_fold(ray_session):
    """Each fold's eval runs on the held-out docs only: with k=3 on 6
    docs, each per-fold frame scores exactly 2 documents' mentions."""
    cdb, vocab, cfg = _kfold_models()
    export = _training_export()
    folds = kf.create_folds(export, 3, split_type="docs")
    per = kf.get_per_fold_metrics(cdb, vocab, folds, config=cfg)
    assert len(per) == 3
    for frame in per:
        assert int(frame["tp"].sum() + frame["fn"].sum()) == 2


def test_kfold_stats_query_matches_oracle(ray_session):
    """Driver-contract kfold_stats == its DuckDB oracle at sf0.001
    (the merged k-fold metrics equal corpus-wide counts because the
    held-out folds partition the documents exactly once)."""
    import duckdb
    from medcat_ray.pipelines.docs_kg import (kfold_stats,
                                              kfold_stats_oracle_sql)
    sf = "/root/testdata/sf0.001"
    got = kfold_stats(sf).sort_values("cui").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(kfold_stats_oracle_sql()).df() \
        .sort_values("cui").reset_index(drop=True)
    assert list(got["cui"]) == list(want["cui"])
    for c in ("tp", "fp", "fn"):
        assert list(got[c].astype(int)) == list(want[c].astype(int))
    for c in ("prec", "rec", "f1"):
        np.testing.assert_allclose(got[c].astype(float),
                                   want[c].astype(float), rtol=1e-4)
    # the fake-FN CUI is present and never predicted
    row = got.set_index("cui").loc["C0000999"]
    assert int(row["tp"]) == 0 and int(row["fn"]) > 0
