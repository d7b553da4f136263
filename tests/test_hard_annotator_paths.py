"""Hard annotator paths over the HARD frozen concept space: greedy
multi-token extension (M6), stopword skip-gaps, P/N disambiguation with
real context similarity (M8/M10), overlap resolution (M11).  These are the
same semantics the kg_entities_hard DuckDB oracle checks end-to-end."""

from medcat_ray.core.annotator import DocAnnotator
from medcat_ray.pipelines.docs_kg import HARD_CONFIG, docs_cdb_hard


def _annotate(text):
    cdb, vocab = docs_cdb_hard()
    ann = DocAnnotator(cdb, vocab, HARD_CONFIG)
    return ann.annotate(text)


def _spans(ents):
    return [(e["cui"], e["start"], e["end"], e["source_value"])
            for e in ents]


def test_multitoken_adjacent_and_singles():
    text = "customer join spark"
    ents = _spans(_annotate(text))
    assert ents == [("C0000101", 0, 13, "customer join"),
                    ("C0000001", 14, 19, "spark")]


def test_skip_gap_one_and_two_stopwords():
    # "table the merge" (1-gap) and "hash a the query" (2-gap) both match;
    # source_value includes the skipped words (reference Span semantics)
    text = "table the merge hash a the query"
    ents = _spans(_annotate(text))
    assert ents == [("C0000102", 0, 15, "table the merge"),
                    ("C0000103", 16, 32, "hash a the query")]


def test_three_stopword_gap_exceeds_max_skip():
    # max_skip_tokens = 2: a 3-stopword gap must NOT extend — the two
    # words are annotated as singles instead
    text = "customer a the a join"
    ents = _spans(_annotate(text))
    assert ents == [("C0000012", 0, 8, "customer"),
                    ("C0000002", 17, 21, "join")]


def test_overlap_resolution_bigram_beats_singles():
    # "table" is claimed by table~merge, so its single is suppressed but
    # the trailing "hash query" bigram still fires
    text = "table merge hash query"
    ents = _spans(_annotate(text))
    assert ents == [("C0000102", 0, 11, "table merge"),
                    ("C0000103", 12, 22, "hash query")]


def test_ambiguous_name_disambiguates_to_primary():
    # "stream" has P (C0000006, ctx vector +u) and N (C0000200, -u)
    # candidates: similarity + primary-name boost must pick the P CUI
    ents = _annotate("fast stream value")
    assert len(ents) == 1
    assert ents[0]["cui"] == "C0000006"
    # the disambiguation branch really ran: boosted sim 0.99, not the
    # direct-link 1.0
    assert abs(ents[0]["context_similarity"] - 0.99) < 1e-9


def test_nstatus_single_cui_runs_disamb_with_similarity():
    # "column" has one candidate with status N → do_disamb branch; context
    # similarity (+1 vs its own vector) links it, clamped to 0.99 by the
    # prefer_frequent_concepts branch (reference min(0.99, ...) clamp)
    ents = _annotate("big column scan")
    assert len(ents) == 1
    assert ents[0]["cui"] == "C0000300"
    assert abs(ents[0]["context_similarity"] - 0.99) < 1e-9


def test_greedy_breaks_on_first_non_extension():
    # from "hash", the next non-skip token "hash" does not extend
    # ("hash~hash" not a name) → greedy breaks; the second "hash" starts
    # its own successful extension to "hash query"
    text = "hash the hash query"
    ents = _spans(_annotate(text))
    assert ents == [("C0000011", 0, 4, "hash"),
                    ("C0000103", 9, 19, "hash query")]


def test_spell_and_reverse_order_paths():
    """M5 spell correction ('custoner' → customer CUI via the sorted-
    tie-break Norvig candidates) and the M6 try_reverse_word_order branch
    ('beta alpha' surface matches the stored 'alpha beta' bigram), with
    the bigram overlap-claiming its tokens from the 'beta' single."""
    from medcat_ray.core.annotator import DocAnnotator
    from medcat_ray.pipelines.docs_kg import (SPELL_BETA_CUI, SPELL_CONFIG,
                                              SPELL_REV_CUI, docs_cdb_spell)
    cdb, vocab = docs_cdb_spell()
    ann = DocAnnotator(cdb, vocab, SPELL_CONFIG)
    ents = ann.annotate("custoner a beta alpha the join")
    by_src = {e["source_value"]: e for e in ents}
    assert by_src["custoner"]["cui"] == "C0000012"      # spell-corrected
    assert by_src["beta alpha"]["cui"] == SPELL_REV_CUI  # reverse bigram
    assert by_src["join"]["cui"] == "C0000002"
    assert SPELL_BETA_CUI not in {e["cui"] for e in ents}  # overlapped out
    assert len(ents) == 3
    # span arithmetic: bigram covers both tokens
    b = by_src["beta alpha"]
    assert b["end"] - b["start"] == len("beta alpha")

    # no reverse flag -> no bigram; beta single survives
    from medcat_ray.config import EngineConfig
    cfg2 = EngineConfig(spell_check=True, try_reverse_word_order=False)
    ann2 = DocAnnotator(cdb, vocab, cfg2)
    ents2 = ann2.annotate("custoner a beta alpha the join")
    srcs2 = {e["source_value"] for e in ents2}
    assert "beta alpha" not in srcs2 and "beta" in srcs2


def test_annotate_spans_matches_full_projection():
    """annotate_spans (the deep-fused count projection) must emit exactly
    the (start, cui, source_value) stream of the full per-entity dicts."""
    import pyarrow.parquet as pq
    from medcat_ray.core.annotator import DocAnnotator
    from medcat_ray.pipelines.docs_kg import DOCS_CONFIG, docs_cdb
    cdb, vocab = docs_cdb()
    ann = DocAnnotator(cdb, vocab, DOCS_CONFIG)
    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"])["text"].to_pylist()[:150]
    n_ents = 0
    for t in texts:
        full = ann.annotate(t)
        starts, cuis, sources = ann.annotate_spans(t)
        assert starts == [e["start"] for e in full]
        assert cuis == [e["cui"] for e in full]
        assert sources == [e["source_value"] for e in full]
        n_ents += len(full)
    assert n_ents > 0


def test_deep_fused_counts_equal_arrow_path():
    """AnnotateCountStage's array path == AnnotateStage → Arrow ents →
    partial_triple_counts, row for row (after sort)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medcat_ray.pipelines.docs_kg import DOCS_CONFIG, docs_cdb
    from medcat_ray.stages.annotate import AnnotateStage, AnnotateCountStage
    from medcat_ray.stages.triples import partial_triple_counts
    cdb, vocab = docs_cdb()
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    batch = pa.table({"doc_id": t["doc_id"].to_pylist()[:200],
                      "text": t["text"].to_pylist()[:200]})
    arrow_stage = AnnotateStage((cdb, vocab), DOCS_CONFIG,
                                key_column="doc_id")
    expected = partial_triple_counts(arrow_stage(batch),
                                     key_column="doc_id").to_pandas() \
        .sort_values(["subj_cui", "obj_cui"]).reset_index(drop=True)
    fused_stage = AnnotateCountStage((cdb, vocab), DOCS_CONFIG,
                                     key_column="doc_id", do_extract=False)
    got = fused_stage(batch).to_pandas() \
        .sort_values(["subj_cui", "obj_cui"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(expected, got)
    assert got["n"].sum() > 0
