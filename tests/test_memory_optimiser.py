"""CDB memory optimiser (state/memory_optimiser.py) — reference
medcat/utils/memory_optimiser.py semantics."""

import copy

import pytest

from medcat_ray.state.memory_optimiser import (ColumnarDictView,
                                               DelegatingSnames,
                                               perform_optimisation,
                                               unoptimise_cdb)


def test_view_mapping_semantics():
    store = {}
    a = ColumnarDictView(store, 0, 2)
    b = ColumnarDictView(store, 1, 2)
    a["x"] = 1
    b["y"] = {"s"}
    assert "x" in a and "x" not in b
    assert a.get("x") == 1 and b.get("x", 9) == 9
    assert dict(a.items()) == {"x": 1}
    assert list(b) == ["y"]
    assert len(a) == 1 and len(b) == 1
    b["x"] = None                      # legitimate None survives
    assert "x" in b and b["x"] is None
    del a["x"]
    assert "x" not in a and "x" in b   # slot-local delete
    assert a.pop("z", "d") == "d"
    with pytest.raises(KeyError):
        a["x"]
    a.setdefault("w", 5)
    assert a["w"] == 5
    a.update({"w": 6, "v": 7})
    assert a["w"] == 6 and a["v"] == 7


def test_optimised_cdb_annotates_identically(fixture_models):
    from medcat_ray.core.annotator import DocAnnotator
    from medcat_ray.config import EngineConfig
    cdb, vocab = fixture_models
    cdb = copy.deepcopy(cdb)
    texts = ["the patient denies renal pain syndrome and fever",
             "suspected kidney stone with cardiac syndrome disorder",
             "hepatic benign complex noted in the liver"]
    plain = DocAnnotator(cdb, vocab, EngineConfig())
    before = [plain.annotate(t) for t in texts]

    perform_optimisation(cdb)
    assert "CUIS" in cdb._memory_optimised_parts
    assert isinstance(cdb.cui2names, ColumnarDictView)
    opt = DocAnnotator(cdb, vocab, EngineConfig())
    after = [opt.annotate(t) for t in texts]
    assert before == after
    assert sum(len(e) for e in before) > 0   # parity is not vacuous

    # training mutations go through the views and roundtrip exactly
    snapshot = {k: dict(getattr(cdb, k).items())
                for k in cdb._cui2many_names}
    unoptimise_cdb(cdb)
    assert not cdb._memory_optimised_parts
    for k, snap in snapshot.items():
        assert getattr(cdb, k) == snap
        assert isinstance(getattr(cdb, k), dict)


def test_roundtrip_preserves_all_dicts(fixture_models):
    cdb, _ = fixture_models
    cdb = copy.deepcopy(cdb)
    orig = {k: copy.deepcopy(getattr(cdb, k))
            for k in ("cui2names", "cui2snames", "cui2count_train",
                      "cui2type_ids", "cui2preferred_name",
                      "cui2average_confidence", "cui2context_vectors")}
    perform_optimisation(cdb)
    unoptimise_cdb(cdb)
    for k, v in orig.items():
        got = getattr(cdb, k)
        assert set(got) == set(v)
        if k != "cui2context_vectors":     # ndarray equality is fuzzy
            assert got == v


def test_delegating_snames_membership():
    c2s = {"C1": {"a", "ab"}, "C2": {"b"}}
    s = DelegatingSnames(c2s)
    assert "ab" in s and "b" in s and "zz" not in s
    assert sorted(s) == ["a", "ab", "b"]
    assert len(s) == 3
    with pytest.raises(RuntimeError):
        s.update({"x"})
    assert s.to_set() == {"a", "ab", "b"}


def test_optimise_snames_opt_in(fixture_models):
    from medcat_ray.core.annotator import DocAnnotator
    from medcat_ray.config import EngineConfig
    cdb, vocab = fixture_models
    cdb = copy.deepcopy(cdb)
    plain = DocAnnotator(cdb, vocab, EngineConfig())
    text = "patient reports renal pain syndrome in the kidney"
    before = plain.annotate(text)
    assert before
    perform_optimisation(cdb, optimise_snames=True)
    assert "snames" in cdb._memory_optimised_parts
    opt = DocAnnotator(cdb, vocab, EngineConfig())
    assert opt.annotate(text) == before
    unoptimise_cdb(cdb)
    assert isinstance(cdb.snames, set)
