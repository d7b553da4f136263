"""SQL-checkable KG pipeline over the driver's ``documents`` testdata table.

The documents corpus has a closed, lowercase, single-space vocabulary, which
lets the FULL annotate stage (tokenize → normalize → dictionary NER → link →
overlap-resolve → project) be verified against an exact ANSI-SQL oracle:
with single-token unambiguous P-status names, spell-check off, the engine's
entities are precisely the matching tokens with cumulative-length offsets —
expressible in DuckDB via string_split + window sums.

The concept space below is FROZEN; ``__ray_entry__.oracle_sql`` embeds the
same mapping as a VALUES list.  Every word: len ≥ 3 (``min_name_len``),
not a stopword (NER first-token rule), fixed under the lemmatizer (so
norm == lower == name), unique CUI (no disambiguation → similarity 1.0).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

from medcat_ray.config import EngineConfig
from medcat_ray.pipelines import kg
from medcat_ray.state.cdb import CDB, prepare_name
from medcat_ray.state.vocab import Vocab

DOC_CONCEPTS: Dict[str, str] = {
    "spark": "C0000001",
    "join": "C0000002",
    "filter": "C0000003",
    "merge": "C0000004",
    "window": "C0000005",
    "stream": "C0000006",
    "batch": "C0000007",
    "vector": "C0000008",
    "table": "C0000009",
    "query": "C0000010",
    "hash": "C0000011",
    "customer": "C0000012",
}

DOCS_CONFIG = EngineConfig(spell_check=False)

# Frozen per-concept semantic types (for the RelCAT type-pair rules):
# operator-like words vs object-like words.
DOC_TYPES: Dict[str, str] = {
    "spark": "T_OP", "join": "T_OP", "filter": "T_OP", "merge": "T_OP",
    "window": "T_OP", "stream": "T_OP", "batch": "T_OP", "query": "T_OP",
    "hash": "T_OP",
    "vector": "T_OBJ", "table": "T_OBJ", "customer": "T_OBJ",
}


def docs_cdb() -> Tuple[CDB, Vocab]:
    """CDB over the frozen concept words (status P, one CUI per name, one
    semantic type each) and an empty-vector vocab (no disambiguation needed
    — all names unambiguous)."""
    cdb = CDB(DOCS_CONFIG)
    for word, cui in sorted(DOC_CONCEPTS.items()):
        cdb.add_concept(cui, prepare_name(word, DOCS_CONFIG),
                        name_status="P", type_ids={DOC_TYPES[word]})
    return cdb, Vocab()


# ---------------------------------------------------------------------------
# HARD concept space: multi-token names, skip-token gaps, ambiguity — the
# annotator paths the single-token oracle can't reach (M6 extension loop,
# M7 acceptance, M8 do_disamb branches, M10 similarity + primary-name boost,
# M11 overlap resolution).  Still exactly SQL-expressible because:
#   * the three bigram names have disjoint first-word / second-word token
#     sets, so bigram matches never overlap each other — overlap resolution
#     reduces to "a bigram always claims its two tokens" (its char span is
#     strictly longer than any single-token span);
#   * skip_stopwords=True makes the gap rule purely positional: a bigram
#     (w1@i, w2@j) matches iff every token between i and j is a stopword
#     and j-i-1 <= max_skip_tokens;
#   * the ambiguous name's context vectors are constructed so the P-status
#     CUI wins for EVERY context (all vocab vectors equal u, P vector = u,
#     N vector = -u → sims are +1/-1 before the primary-name boost).
# ---------------------------------------------------------------------------

HARD_CONFIG = EngineConfig(spell_check=False, skip_stopwords=True)

# (w1, w2) -> cui; components are lemmatizer-fixed corpus words
DOC_MULTI: Dict[Tuple[str, str], str] = {
    ("customer", "join"): "C0000101",
    ("table", "merge"): "C0000102",
    ("hash", "query"): "C0000103",
}

AMBIG_NAME = "stream"          # P CUI (C0000006) + the N twin below
AMBIG_N_CUI = "C0000200"
NSTATUS_NAME = "column"        # single-CUI N-status name → disamb branch
NSTATUS_CUI = "C0000300"

_CORPUS_WORDS = ("key agg row scan slow fast table value part hash merge "
                 "batch spark a the line sort window join filter stream "
                 "vector query customer column small order dup big "
                 "empty").split()


def docs_cdb_hard() -> Tuple[CDB, Vocab]:
    """Extended frozen CDB + vocab with identical word vectors.

    Deterministic-by-construction disambiguation: every vocab word carries
    the SAME vector u, so any entity context vector is a positive multiple
    of u; the ambiguous P CUI (context vector u) scores +1 and its N twin
    (context vector -u) scores -1 for every occurrence — the similarity
    and primary-name-boost code paths run for real, with a provable
    winner."""
    import numpy as np

    cdb = CDB(HARD_CONFIG)
    for word, cui in sorted(DOC_CONCEPTS.items()):
        cdb.add_concept(cui, prepare_name(word, HARD_CONFIG),
                        name_status="P", type_ids={DOC_TYPES[word]})
    for (w1, w2), cui in sorted(DOC_MULTI.items()):
        cdb.add_concept(cui, prepare_name(f"{w1} {w2}", HARD_CONFIG),
                        name_status="P", type_ids={"T_OP"})
    cdb.add_concept(AMBIG_N_CUI, prepare_name(AMBIG_NAME, HARD_CONFIG),
                    name_status="N", type_ids={"T_OP"})
    cdb.add_concept(NSTATUS_CUI, prepare_name(NSTATUS_NAME, HARD_CONFIG),
                    name_status="N", type_ids={"T_OBJ"})

    u = np.ones(8, dtype=np.float64)
    vocab = Vocab()
    for w in sorted(_CORPUS_WORDS):
        vocab.add_word(w, cnt=100, vec=u)
    ctx_types = list(HARD_CONFIG.context_vector_sizes)
    for cui, vec in (("C0000006", u), (AMBIG_N_CUI, -u),
                     (NSTATUS_CUI, u)):
        cdb.cui2context_vectors[cui] = {t: vec.copy() for t in ctx_types}
        cdb.cui2count_train[cui] = 100
    return cdb, vocab


def kg_entities_hard(sf_dir: str) -> rd.Dataset:
    """kg_entities over the HARD concept space: exercises greedy
    multi-token extension, stopword skip-gaps, P/N disambiguation with
    context similarity, and longest-span overlap resolution — all
    SQL-checked."""
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cdb, vocab = docs_cdb_hard()
    ann = kg.annotate(docs, (cdb, vocab), HARD_CONFIG,
                      concurrency=2, batch_size=128, key_column="doc_id")
    ents = kg.entities(ann, key_column="doc_id")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "start_pos": batch["start"],
            "end_pos": batch["end"],
            "cui": batch["cui"],
            "source_value": batch["source_value"],
        })
    return ents.map_batches(project, batch_format="pyarrow")


def hard_entities_oracle_sql(max_skip: int = 2) -> str:
    """DuckDB oracle for :func:`kg_entities_hard`.

    Bigram matches: (w1@i, w2@j), all tokens strictly between are
    stopwords, gap = j-i-1 <= max_skip; span = w1 start .. w2 end
    (source_value read straight from the document text so gapped spans
    include the skipped words).  Singles: concept tokens not claimed by a
    bigram; ambiguity resolved to the frozen winners."""
    return _hard_cte(max_skip) + """
SELECT doc_id, start_pos, end_pos, cui, source_value FROM hard_ents
"""


def kg_triple_counts_hard(sf_dir: str, window: int = 300) -> pd.DataFrame:
    """Deduped triple counts over the HARD concept space — the T3 pair
    window runs over MULTI-TOKEN entity spans (subj/obj offsets come from
    greedy-extended, possibly gapped mentions), end-to-end SQL-checked."""
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cdb, vocab = docs_cdb_hard()
    ann = kg.annotate(docs, (cdb, vocab), HARD_CONFIG,
                      concurrency=2, batch_size=128, key_column="doc_id")
    out = kg.triple_counts(ann, window=window, key_column="doc_id",
                           mode="tree").to_pandas()
    out["count"] = out["count"].astype("int64")
    return out.sort_values(["subj_cui", "obj_cui"]).reset_index(drop=True)


def hard_triple_counts_oracle_sql(window: int = 300,
                                  max_skip: int = 2) -> str:
    return _hard_cte(max_skip) + f"""
SELECT s.cui AS subj_cui, 'co_occurs_with' AS pred, o.cui AS obj_cui,
       count(*) AS count
FROM hard_ents s JOIN hard_ents o
  ON s.doc_id = o.doc_id
 AND o.start_pos > s.start_pos
 AND o.start_pos - s.start_pos <= {window}
 AND s.source_value <> o.source_value
GROUP BY s.cui, o.cui
"""


def _hard_cte(max_skip: int = 2) -> str:
    """WITH-clause producing ``hard_ents(doc_id, start_pos, end_pos, cui,
    source_value)`` — the shared oracle entity space for the hard
    queries."""
    multi_rows = ", ".join(
        f"('{w1}', '{w2}', '{cui}')"
        for (w1, w2), cui in sorted(DOC_MULTI.items()))
    single_map = dict(DOC_CONCEPTS)
    single_map[NSTATUS_NAME] = NSTATUS_CUI     # N-status single-CUI concept
    single_rows = ", ".join(f"('{w}', '{c}')"
                            for w, c in sorted(single_map.items()))
    return f"""
WITH toks AS (
  SELECT doc_id, text,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
), pos AS (
  SELECT doc_id, text, tok, i,
         CAST(COALESCE(SUM(length(tok) + 1) OVER (
             PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
           AS start_pos
  FROM toks
), multi AS (
  SELECT p1.doc_id, p1.start_pos,
         CAST(p2.start_pos + length(p2.tok) AS INT) AS end_pos,
         m.cui, p1.i AS i1, p2.i AS i2, p1.text AS text
  FROM pos p1
  JOIN pos p2 ON p2.doc_id = p1.doc_id
             AND p2.i > p1.i AND p2.i <= p1.i + {max_skip + 1}
  JOIN (VALUES {multi_rows}) AS m(w1, w2, cui)
    ON p1.tok = m.w1 AND p2.tok = m.w2
  WHERE NOT EXISTS (
    SELECT 1 FROM pos g
    WHERE g.doc_id = p1.doc_id AND g.i > p1.i AND g.i < p2.i
      AND g.tok NOT IN ('a', 'the'))
), singles AS (
  SELECT p.doc_id, p.start_pos,
         CAST(p.start_pos + length(p.tok) AS INT) AS end_pos,
         s.cui, p.tok AS source_value
  FROM pos p
  JOIN (VALUES {single_rows}) AS s(name, cui) ON p.tok = s.name
  WHERE NOT EXISTS (
    SELECT 1 FROM multi m
    WHERE m.doc_id = p.doc_id AND p.i IN (m.i1, m.i2))
), hard_ents AS (
  SELECT doc_id, start_pos, end_pos, cui,
         substr(text, start_pos + 1, end_pos - start_pos) AS source_value
  FROM multi
  UNION ALL
  SELECT doc_id, start_pos, end_pos, cui, source_value FROM singles
)"""


# ---------------------------------------------------------------------------
# SPELL + REVERSE-ORDER concept space: exercises M5 (Norvig spell-correction
# through the deterministic sorted tie-break) and the M6 try_reverse_word_order
# branch in an exactly-SQL-checkable setting.  Construction:
#   * the corpus's only ≥ spell_check_len_limit (7) chars word is
#     'customer', which is IN cdb.vocab — so after the deterministic
#     transform below, 'custoner' is the single token that takes the spell
#     path, and its only known edit-1 candidate is 'customer'
#     (edits1 ∩ cdb.vocab = {'customer'} — the correction is a constant);
#   * 'beta' (single concept) + 'alpha beta' (stored bigram) use words that
#     never occur naturally, so the reversed surface 'beta alpha' appears
#     exactly at the planted positions with stopword buffers — no chained
#     overlapping bigrams, overlap resolution reduces to "bigram claims its
#     two tokens".
# ---------------------------------------------------------------------------

SPELL_CONFIG = EngineConfig(spell_check=True, try_reverse_word_order=True)
SPELL_BETA_CUI = "C0000500"
SPELL_REV_CUI = "C0000501"
_SPELL_PLANT = ("custoner", "a", "beta", "alpha", "the")


def docs_cdb_spell() -> Tuple[CDB, Vocab]:
    cdb = CDB(SPELL_CONFIG)
    for word, cui in sorted(DOC_CONCEPTS.items()):
        cdb.add_concept(cui, prepare_name(word, SPELL_CONFIG),
                        name_status="P", type_ids={DOC_TYPES[word]})
    cdb.add_concept(SPELL_BETA_CUI, prepare_name("beta", SPELL_CONFIG),
                    name_status="P", type_ids={"T_OBJ"})
    cdb.add_concept(SPELL_REV_CUI, prepare_name("alpha beta", SPELL_CONFIG),
                    name_status="P", type_ids={"T_OP"})
    return cdb, Vocab()


def _plant_spell_tokens(batch: pa.Table) -> pa.Table:
    """Deterministic token transform (mirrored in the oracle SQL): docs
    with ≥ 6 tokens get tokens 1-5 replaced by
    ('custoner', 'a', 'beta', 'alpha', 'the')."""
    out = []
    for t in batch["text"].to_pylist():
        toks = t.split(" ")
        if len(toks) >= 6:
            toks[0:5] = list(_SPELL_PLANT)
        out.append(" ".join(toks))
    return pa.table({"doc_id": batch["doc_id"],
                     "text": pa.array(out, type=pa.string())})


def kg_entities_spell(sf_dir: str) -> rd.Dataset:
    """Entities over the spell/reverse-planted corpus: 'custoner' links to
    the customer CUI through the spell checker; planted 'beta alpha'
    matches the stored 'alpha beta' bigram through try_reverse_word_order
    (and overlap-claims its tokens from the 'beta' single)."""
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"]) \
        .map_batches(_plant_spell_tokens, batch_format="pyarrow")
    cdb, vocab = docs_cdb_spell()
    ann = kg.annotate(docs, (cdb, vocab), SPELL_CONFIG,
                      concurrency=2, batch_size=128, key_column="doc_id")
    ents = kg.entities(ann, key_column="doc_id")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "start_pos": batch["start"],
            "end_pos": batch["end"],
            "cui": batch["cui"],
            "source_value": batch["source_value"],
        })
    return ents.map_batches(project, batch_format="pyarrow")


def spell_entities_oracle_sql() -> str:
    """DuckDB oracle for :func:`kg_entities_spell`.

    Singles = frozen concepts ∪ {('custoner' → customer CUI)} — the spell
    correction is a constant map by construction — ∪ {'beta'}; the planted
    adjacent ('beta', 'alpha') pair is the reverse-matched bigram, whose
    two token positions are excluded from singles (overlap resolution)."""
    single_map = dict(DOC_CONCEPTS)
    single_map["custoner"] = DOC_CONCEPTS["customer"]   # M5 spell path
    single_map["beta"] = SPELL_BETA_CUI
    single_rows = ", ".join(f"('{w}', '{c}')"
                            for w, c in sorted(single_map.items()))
    plant_list = ", ".join(f"'{w}'" for w in _SPELL_PLANT)
    return f"""
WITH orig AS (
  SELECT doc_id, string_split(text, ' ') AS toks0 FROM documents
), tr AS (
  SELECT doc_id, CASE WHEN len(toks0) >= 6
      THEN list_concat([{plant_list}], toks0[6:])
      ELSE toks0 END AS toks
  FROM orig
), tokd AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i
  FROM tr
), pos AS (
  SELECT doc_id, tok, i,
         CAST(COALESCE(SUM(length(tok) + 1) OVER (
             PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
           AS start_pos
  FROM tokd
), bigrams AS (
  SELECT p1.doc_id, p1.start_pos,
         CAST(p2.start_pos + length(p2.tok) AS INT) AS end_pos,
         '{SPELL_REV_CUI}' AS cui,
         p1.tok || ' ' || p2.tok AS source_value,
         p1.i AS i1, p2.i AS i2
  FROM pos p1
  JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.i = p1.i + 1
  WHERE p1.tok = 'beta' AND p2.tok = 'alpha'
), singles AS (
  SELECT p.doc_id, p.start_pos,
         CAST(p.start_pos + length(p.tok) AS INT) AS end_pos,
         s.cui, p.tok AS source_value
  FROM pos p
  JOIN (VALUES {single_rows}) AS s(name, cui) ON p.tok = s.name
  WHERE NOT EXISTS (
    SELECT 1 FROM bigrams b
    WHERE b.doc_id = p.doc_id AND p.i IN (b.i1, b.i2))
)
SELECT doc_id, start_pos, end_pos, cui, source_value FROM bigrams
UNION ALL
SELECT doc_id, start_pos, end_pos, cui, source_value FROM singles
"""


# ---------------------------------------------------------------------------
# LEMMA concept space (M4 on real inflected English): the CDB stores BASE
# forms only; the corpus is planted with INFLECTED mentions that link solely
# through token normalization — the reference's TestLemmatization scenario
# (tests/test_entity_linking.py:69-89, "falling" → Fall) replayed as an
# exact SQL oracle.  Two configs exercise both sides of the POS gate
# (medcat/utils/normalizers.py:185-187, medcat/config.py:407):
#   * kg_entities_lemma        — do_not_normalize = ∅ (the reference's own
#     model-creator scenario config, tests/model_creator/medcat.txt): every
#     planted form lemmatizes and links;
#   * kg_entities_lemma_gated  — reference-DEFAULT gate: VBG/VBD/JJS forms
#     ('falling', 'taken', 'highest') keep their surface form and must NOT
#     link, while the un-gated Latin plurals still do.
# Exactly SQL-expressible because the lemma of each planted form is a
# compile-time constant and the natural corpus vocabulary (31 closed words)
# contains no token that lemmatizes into any LEMMA_CONCEPTS name.
# ---------------------------------------------------------------------------

LEMMA_CONFIG = EngineConfig(spell_check=False,
                            do_not_normalize=frozenset())
LEMMA_GATED_CONFIG = EngineConfig(spell_check=False)   # default POS gate

LEMMA_CONCEPTS: Dict[str, str] = {
    "diagnosis": "C0000601",   # Latin -es plural (lookup table)
    "matrix": "C0000602",      # -ices plural
    "vertebra": "C0000603",    # -ae plural
    "fall": "C0000604",        # -ing suffix rule (floss double kept)
    "take": "C0000605",        # irregular participle AND past (taken/took)
    "high": "C0000606",        # superlative
    "child": "C0000607",       # irregular plural (r5: VERDICT item 4)
    "goose": "C0000608",       # irregular plural
    "criterion": "C0000609",   # Greek -a plural
    "think": "C0000610",       # irregular past (thought)
    "easy": "C0000611",        # irregular comparative (easier)
    "bacterium": "C0000612",   # Latin -a plural
}
# NOTE on picks: every planted FORM is >= min_len_normalize (5) chars —
# the reference only lemmatizes tokens that long (normalizers.py:181,
# config min_len_normalize) — and every BASE name is >= the
# upper_case_limit_len (4), since shorter lowercase names are rejected
# by maybe_annotate_name.  'mice'/'took' (4 chars, never normalized)
# and 'worse'->'bad' (3-char name) are deliberately absent.
# planted surface form -> base name it must lemmatize to
_LEMMA_PLANT: Tuple[Tuple[str, str], ...] = (
    ("diagnoses", "diagnosis"), ("matrices", "matrix"),
    ("vertebrae", "vertebra"), ("falling", "fall"),
    ("taken", "take"), ("highest", "high"),
    ("children", "child"), ("geese", "goose"),
    ("criteria", "criterion"), ("thought", "think"),
    ("easier", "easy"), ("bacteria", "bacterium"),
)
# forms whose morph_tag is in the default do_not_normalize gate — under
# LEMMA_GATED_CONFIG these keep their surface form and do not link
# (VBG falling, VBD/VBN taken+thought, JJS highest, JJR easier);
# irregular NOUN plurals are never gated and link under both configs
_LEMMA_GATED_FORMS = frozenset({"falling", "taken", "highest", "thought",
                                "easier"})


def docs_cdb_lemma(config: EngineConfig) -> Tuple[CDB, Vocab]:
    cdb = CDB(config)
    for name, cui in sorted(LEMMA_CONCEPTS.items()):
        cdb.add_concept(cui, prepare_name(name, config),
                        name_status="P", type_ids={"T_OBJ"})
    return cdb, Vocab()


def _plant_lemma_tokens(batch: pa.Table) -> pa.Table:
    """Docs with ≥ 13 tokens get tokens 1-12 replaced by the twelve
    planted inflected forms (mirrored verbatim in the oracle SQL);
    shorter docs stay unplanted on BOTH sides."""
    planted = [w for w, _ in _LEMMA_PLANT]
    out = []
    for t in batch["text"].to_pylist():
        toks = t.split(" ")
        if len(toks) >= 13:
            toks[0:12] = planted
        out.append(" ".join(toks))
    return pa.table({"doc_id": batch["doc_id"],
                     "text": pa.array(out, type=pa.string())})


def _kg_entities_lemma(sf_dir: str, config: EngineConfig) -> rd.Dataset:
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"]) \
        .map_batches(_plant_lemma_tokens, batch_format="pyarrow")
    cdb, vocab = docs_cdb_lemma(config)
    ann = kg.annotate(docs, (cdb, vocab), config,
                      concurrency=2, batch_size=128, key_column="doc_id")
    ents = kg.entities(ann, key_column="doc_id")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "start_pos": batch["start"],
            "end_pos": batch["end"],
            "cui": batch["cui"],
            "source_value": batch["source_value"],
        })
    return ents.map_batches(project, batch_format="pyarrow")


def kg_entities_lemma(sf_dir: str) -> rd.Dataset:
    """Entities over the lemma-planted corpus, POS gate emptied: every
    inflected mention links to its base-form concept through the
    normalizer (ref tests/test_entity_linking.py:81-84)."""
    return _kg_entities_lemma(sf_dir, LEMMA_CONFIG)


def kg_entities_lemma_gated(sf_dir: str) -> rd.Dataset:
    """Same corpus under the reference-DEFAULT ``do_not_normalize`` gate:
    VBG/VBD/JJS surface forms are kept un-normalized (so 'falling',
    'taken', 'highest' do NOT link); un-gated Latin plurals still do."""
    return _kg_entities_lemma(sf_dir, LEMMA_GATED_CONFIG)


def _lemma_oracle_sql(gated: bool) -> str:
    link = [(w, LEMMA_CONCEPTS[base]) for w, base in _LEMMA_PLANT
            if not (gated and w in _LEMMA_GATED_FORMS)]
    rows = ", ".join(f"('{w}', '{c}')" for w, c in sorted(link))
    plant_list = ", ".join(f"'{w}'" for w, _ in _LEMMA_PLANT)
    return f"""
WITH orig AS (
  SELECT doc_id, string_split(text, ' ') AS toks0 FROM documents
), tr AS (
  SELECT doc_id, CASE WHEN len(toks0) >= 13
      THEN list_concat([{plant_list}], toks0[13:])
      ELSE toks0 END AS toks
  FROM orig
), tokd AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i
  FROM tr
), pos AS (
  SELECT doc_id, tok, i,
         CAST(COALESCE(SUM(length(tok) + 1) OVER (
             PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
           AS start_pos
  FROM tokd
)
SELECT p.doc_id, p.start_pos,
       CAST(p.start_pos + length(p.tok) AS INT) AS end_pos,
       m.cui, p.tok AS source_value
FROM pos p
JOIN (VALUES {rows}) AS m(name, cui) ON p.tok = m.name
"""


def lemma_entities_oracle_sql() -> str:
    """DuckDB oracle for :func:`kg_entities_lemma`: the planted-form →
    CUI map is a compile-time constant (each lemma is frozen), so entities
    are exactly the planted token positions."""
    return _lemma_oracle_sql(gated=False)


def lemma_gated_entities_oracle_sql() -> str:
    """DuckDB oracle for :func:`kg_entities_lemma_gated`: the gated forms
    drop out of the link map."""
    return _lemma_oracle_sql(gated=True)


def _annotated(sf_dir: str, concurrency=2, batch_size: int = 128):
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cdb, vocab = docs_cdb()
    return kg.annotate(docs, (cdb, vocab), DOCS_CONFIG,
                       concurrency=concurrency, batch_size=batch_size,
                       key_column="doc_id")


def kg_entities(sf_dir: str) -> rd.Dataset:
    """One row per linked mention: (doc_id, start_pos, end_pos, cui,
    source_value)."""
    ents = kg.entities(_annotated(sf_dir), key_column="doc_id")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "start_pos": batch["start"],
            "end_pos": batch["end"],
            "cui": batch["cui"],
            "source_value": batch["source_value"],
        })
    return ents.map_batches(project, batch_format="pyarrow")


def kg_pmi_edges(sf_dir: str, window: int = 300) -> pd.DataFrame:
    """PMI/NPMI-weighted co-occurrence edges (ops/pmi.py over the
    distributed pair counts): the KG edge-weighting step — raw counts
    overweight head concepts; PMI corrects by the pair-table marginals.
    Marginals here are concept-space-sized → the auto-gate picks the
    broadcast probe; the join twin is unit-proven equal."""
    from medcat_ray.ops.pmi import pmi_edges
    tc = kg.triple_counts(_annotated(sf_dir), window=window,
                          key_column="doc_id", mode="tree")
    out = pmi_edges(tc).to_pandas()
    out["count"] = out["count"].astype("int64")
    return out.sort_values(["subj_cui", "obj_cui"]).reset_index(drop=True)


def kg_concept_embeddings(sf_dir: str, dim: int = 8,
                          window: int = 300) -> pd.DataFrame:
    """(cui, embedding) — PPMI+SVD over the distributed pair counts
    (ops/graph_embed.py, Levy & Goldberg 2014).  Deterministic
    (sign-fixed SVD) but not SQL-derivable: no oracle entry — rows-only
    driver check; the math is unit-proven (full-rank spectral identity,
    planted-cluster ranking, determinism across partitionings)."""
    from medcat_ray.ops.graph_embed import concept_embeddings
    tc = kg.triple_counts(_annotated(sf_dir), window=window,
                          key_column="doc_id", mode="tree")
    return concept_embeddings(tc, dim=dim)


def kg_mentions(sf_dir: str) -> pd.DataFrame:
    """(cui, n_mentions) over the corpus."""
    ents = kg.entities(_annotated(sf_dir), key_column="doc_id")
    out = ents.groupby("cui").aggregate(Count(alias_name="n_mentions")) \
        .to_pandas()
    return out.sort_values("cui").reset_index(drop=True)


def kg_triples(sf_dir: str, window: int = 300) -> rd.Dataset:
    """Provenance co-occurrence rows (subj_cui, pred, obj_cui, doc_id,
    subj_start, obj_start)."""
    return kg.triples(_annotated(sf_dir), window=window,
                      key_column="doc_id")


def kg_triple_counts(sf_dir: str, window: int = 300) -> pd.DataFrame:
    """Corpus-level deduped (subj_cui, pred, obj_cui, count).

    mode="tree": the concept space is closed (≤ len(DOC_CONCEPTS)² distinct
    triples), so the shuffle-free tree reduction is provably safe."""
    out = kg.triple_counts(_annotated(sf_dir), window=window,
                           key_column="doc_id", mode="tree").to_pandas()
    out["count"] = out["count"].astype("int64")
    return out.sort_values(["subj_cui", "obj_cui"]).reset_index(drop=True)


def kg_typed_triples(sf_dir: str, window: int = 300) -> pd.DataFrame:
    """Typed-predicate edges (RelCAT type-pair rules): only OP→OBJ and
    OBJ→OP pairs survive, labeled 'operates_on' / 'feeds'; grouped counts."""
    from ray.data.aggregate import Count
    rows = kg.triples(
        _annotated(sf_dir), window=window, key_column="doc_id",
        typed_preds={("T_OP", "T_OBJ"): "operates_on",
                     ("T_OBJ", "T_OP"): "feeds"})
    out = rows.groupby(["subj_cui", "pred", "obj_cui"]).aggregate(
        Count(alias_name="count")).to_pandas()
    out["count"] = out["count"].astype("int64")
    return out.sort_values(["subj_cui", "pred", "obj_cui"]) \
        .reset_index(drop=True)


def typed_triples_oracle_sql(window: int = 300) -> str:
    ops = ", ".join(f"'{w}'" for w, t in sorted(DOC_TYPES.items())
                    if t == "T_OP")
    objs = ", ".join(f"'{w}'" for w, t in sorted(DOC_TYPES.items())
                     if t == "T_OBJ")
    return (TOKEN_CTE.format(concepts=concept_values_sql()) + f"""
SELECT s.cui AS subj_cui,
       CASE WHEN s.source_value IN ({ops}) THEN 'operates_on'
            ELSE 'feeds' END AS pred,
       o.cui AS obj_cui, count(*) AS count
FROM ents s JOIN ents o
  ON s.doc_id = o.doc_id
 AND o.start_pos > s.start_pos
 AND o.start_pos - s.start_pos <= {window}
 AND s.source_value <> o.source_value
WHERE (s.source_value IN ({ops}) AND o.source_value IN ({objs}))
   OR (s.source_value IN ({objs}) AND o.source_value IN ({ops}))
GROUP BY 1, 2, 3
""")


def concept_values_sql() -> str:
    """The frozen concept mapping as a SQL VALUES list (oracle side)."""
    rows = ", ".join(f"('{w}', '{c}')" for w, c in sorted(DOC_CONCEPTS.items()))
    return f"(VALUES {rows}) AS concepts(name, cui)"


TOKEN_CTE = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
), pos AS (
  SELECT doc_id, tok, i,
         CAST(COALESCE(SUM(length(tok) + 1) OVER (
             PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
           AS start_pos
  FROM toks
), ents AS (
  SELECT p.doc_id, p.start_pos,
         CAST(p.start_pos + length(p.tok) AS INT) AS end_pos,
         concepts.cui, p.tok AS source_value, p.i AS tok_i
  FROM pos p JOIN {concepts} ON p.tok = concepts.name
)
"""


# Meta-annotation rule over corpus words (the documents vocabulary has no
# natural negation cues, so the trigger lexicon is drawn from it — the
# window/scope semantics are the reference's cntx_left=15).
META_TRIGGERS = ("slow", "dup")


def kg_meta(sf_dir: str) -> rd.Dataset:
    """SQL-checked meta-annotation (T2): one row per entity with the
    rule-model's Negation-style value over the 15-token left window."""
    from medcat_ray.stages.meta import MetaRule, meta_annotate
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cdb, vocab = docs_cdb()
    ann = docs.map_batches(
        __import__("medcat_ray.stages.annotate",
                   fromlist=["AnnotateStage"]).AnnotateStage,
        fn_constructor_kwargs=dict(models=(cdb, vocab), config=DOCS_CONFIG,
                                   key_column="doc_id",
                                   keep_columns=("text",)),
        batch_format="pyarrow", batch_size=128, concurrency=2, num_cpus=1)
    rules = [MetaRule("Negation", META_TRIGGERS, "Negated", "Affirmed",
                      scope="left")]
    meta = meta_annotate(ann, rules=rules, concurrency=2)

    def explode(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "start_pos": [], "cui": [], "negation": []}
        for doc_id, ents, metas in zip(batch["doc_id"].to_pylist(),
                                       batch["ents"].to_pylist(),
                                       batch["meta_anns"].to_pylist()):
            for ent, anns in zip(ents or [], metas or []):
                rows["doc_id"].append(doc_id)
                rows["start_pos"].append(ent["start"])
                rows["cui"].append(ent["cui"])
                rows["negation"].append(anns[0]["value"])
        return pa.table({"doc_id": pa.array(rows["doc_id"], pa.int64()),
                         "start_pos": pa.array(rows["start_pos"], pa.int32()),
                         "cui": pa.array(rows["cui"], pa.string()),
                         "negation": pa.array(rows["negation"], pa.string())})

    return meta.map_batches(explode, batch_format="pyarrow")


def meta_oracle_sql() -> str:
    trig = ", ".join(f"'{t}'" for t in META_TRIGGERS)
    return (TOKEN_CTE.format(concepts=concept_values_sql()) + f"""
SELECT e.doc_id, e.start_pos, e.cui,
       CASE WHEN EXISTS (
         SELECT 1 FROM pos q
         WHERE q.doc_id = e.doc_id
           AND q.i BETWEEN e.tok_i - 15 AND e.tok_i - 1
           AND q.tok IN ({trig}))
       THEN 'Negated' ELSE 'Affirmed' END AS negation
FROM ents e
""")


# J3 filter_by_cui keep-set (closure subset of the frozen CDB) and D1
# linking allow/exclude lists — the three gates compose: a mention links
# iff its CUI survives filter_by_cui AND is allowed AND not excluded.
FILTER_KEEP_CUIS = frozenset({"C0000001", "C0000003", "C0000006",
                              "C0000009", "C0000011", "C0000012"})
FILTER_ALLOW_CUIS = frozenset({"C0000001", "C0000009", "C0000011",
                               "C0000012"})
FILTER_EXCLUDE_CUIS = frozenset({"C0000011"})


def kg_entities_filtered(sf_dir: str) -> rd.Dataset:
    """kg_entities through BOTH filter surfaces: the CDB subset
    (J3 ``filter_by_cui`` — name/CUI closure, reference cdb.py:660-738)
    and the D1 linking filters (``cuis_allow`` ∩ not ``cuis_exclude``,
    reference utils/filters.py:7-80) — SQL-checked as the intersection
    of the three CUI sets."""
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cdb, vocab = docs_cdb()
    cdb.filter_by_cui(FILTER_KEEP_CUIS)
    cfg = DOCS_CONFIG.with_overrides(cuis_allow=FILTER_ALLOW_CUIS,
                                     cuis_exclude=FILTER_EXCLUDE_CUIS)
    ann = kg.annotate(docs, (cdb, vocab), cfg,
                      concurrency=2, batch_size=128, key_column="doc_id")
    ents = kg.entities(ann, key_column="doc_id")

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "start_pos": batch["start"],
            "end_pos": batch["end"],
            "cui": batch["cui"],
            "source_value": batch["source_value"],
        })
    return ents.map_batches(project, batch_format="pyarrow")


def filtered_entities_oracle_sql() -> str:
    eff = sorted((FILTER_KEEP_CUIS & FILTER_ALLOW_CUIS)
                 - FILTER_EXCLUDE_CUIS)
    cuis = ", ".join(f"'{c}'" for c in eff)
    return (TOKEN_CTE.format(concepts=concept_values_sql()) + f"""
SELECT doc_id, start_pos, end_pos, cui, source_value
FROM ents WHERE cui IN ({cuis})
""")


def meta_bilstm_oracle_sql() -> str:
    """Twin of kg_meta_bilstm: the planted saturated BiLSTM computes the
    MetaRule left-window trigger rule with confidence exactly 1.0 (see
    stages/bilstm.rule_negation_weights for the float64-exactness
    argument), so the NN query is fully SQL-derivable."""
    trig = ", ".join(f"'{t}'" for t in META_TRIGGERS)
    return (TOKEN_CTE.format(concepts=concept_values_sql()) + f"""
SELECT e.doc_id, e.start_pos, e.cui,
       CASE WHEN EXISTS (
         SELECT 1 FROM pos q
         WHERE q.doc_id = e.doc_id
           AND q.i BETWEEN e.tok_i - 15 AND e.tok_i - 1
           AND q.tok IN ({trig}))
       THEN 'Negated' ELSE 'Affirmed' END AS value,
       CAST(1.0 AS DOUBLE) AS confidence
FROM ents e
""")


def rel_bert_oracle_sql(window: int = 60) -> str:
    """Twin of kg_rel_bert: the planted saturated BERT pair classifier
    labels a pair 'operates_on' iff the SUBJECT token is a T_OP concept
    word (see stages/bert.rule_rel_weights), over the same
    window-bounded pair enumeration as RelScoreStage (sorted starts,
    distance ≤ window, distinct source values)."""
    ops = ", ".join(f"'{w}'" for w, t in sorted(DOC_TYPES.items())
                    if t == "T_OP")
    return (TOKEN_CTE.format(concepts=concept_values_sql()) + f"""
SELECT s.cui AS subj_cui,
       CASE WHEN s.source_value IN ({ops}) THEN 'operates_on'
            ELSE 'none' END AS pred,
       o.cui AS obj_cui, count(*) AS count
FROM ents s JOIN ents o
  ON s.doc_id = o.doc_id
 AND o.start_pos > s.start_pos
 AND o.start_pos - s.start_pos <= {window}
 AND s.source_value <> o.source_value
GROUP BY 1, 2, 3
""")


def kg_deid(sf_dir: str) -> rd.Dataset:
    """SQL-checked DeId (M15): concept tokens replaced by
    ``[<preferred name>]`` (which equals the token for this frozen CDB)."""
    from medcat_ray.functions.deid import deid
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cdb, vocab = docs_cdb()
    ann = docs.map_batches(
        __import__("medcat_ray.stages.annotate",
                   fromlist=["AnnotateStage"]).AnnotateStage,
        fn_constructor_kwargs=dict(models=(cdb, vocab), config=DOCS_CONFIG,
                                   key_column="doc_id",
                                   keep_columns=("text",)),
        batch_format="pyarrow", batch_size=128, concurrency=2, num_cpus=1)
    return deid(ann, (cdb, vocab), key_column="doc_id")


def deid_oracle_sql() -> str:
    names = ", ".join(f"'{w}'" for w in sorted(DOC_CONCEPTS))
    return (TOKEN_CTE.format(concepts=concept_values_sql()) + f"""
SELECT p.doc_id,
       string_agg(CASE WHEN p.tok IN ({names}) THEN '[' || p.tok || ']'
                       ELSE p.tok END, ' ' ORDER BY p.i) AS text_deid
FROM pos p
GROUP BY p.doc_id
""")


def kg_train_counts(sf_dir: str) -> pd.DataFrame:
    """SQL-checked distributed training (T5 order-free path): per-CUI
    trainable-mention counts from
    :func:`medcat_ray.pipelines.train.train_unsupervised_distributed`.
    With this frozen CDB every name is single-candidate non-N and ≥
    disamb_length_limit chars, so the count equals the mention count."""
    from medcat_ray.pipelines.train import train_unsupervised_distributed
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cdb, vocab = docs_cdb()
    # vectors need a non-empty vocab: train with word vectors present
    vv = Vocab()
    import numpy as np
    rng = np.random.default_rng(0)
    for w in sorted(DOC_CONCEPTS):
        vv.add_word(w, cnt=10, vec=rng.normal(size=4))
    result = train_unsupervised_distributed(docs, (cdb, vv), DOCS_CONFIG,
                                            concurrency=2)
    out = pd.DataFrame(
        {"cui": sorted(result),
         "n_train": [result[c]["count"] for c in sorted(result)]})
    out["n_train"] = out["n_train"].astype("int64")
    return out


def train_counts_oracle_sql() -> str:
    return (TOKEN_CTE.format(concepts=concept_values_sql())
            + "SELECT cui, count(*) AS n_train FROM ents GROUP BY cui")


def cdb_stats_oracle_sql() -> str:
    """Twin of the cdb_stats query (A3): the frozen CDB is trained on
    the corpus first, so n_concepts_trained / avg_train_per_trained are
    table-derivable (distinct CUIs mentioned / mean mentions per trained
    CUI); the structural counts equal the frozen concept list size."""
    return (TOKEN_CTE.format(concepts=concept_values_sql()) + f"""
, cstats AS (
  SELECT CAST(count(*) AS BIGINT) AS total,
         CAST(count(DISTINCT cui) AS BIGINT) AS trained
  FROM ents)
SELECT (SELECT CAST(count(*) AS BIGINT)
        FROM {concept_values_sql()}) AS n_concepts,
       (SELECT CAST(count(DISTINCT name) AS BIGINT)
        FROM {concept_values_sql()}) AS n_names,
       (SELECT CAST(count(DISTINCT name) AS BIGINT)
        FROM {concept_values_sql()}) AS n_snames,
       trained AS n_concepts_trained,
       ROUND(total * 1.0 / GREATEST(trained, 1), 6)
         AS avg_train_per_trained
FROM cstats
""")


def pages_flagship_oracle_sql() -> str:
    """DuckDB oracle for the HTML pages flagship (``pages_kg_flagship``).

    ``fixtures.pages_from_documents`` wraps each documents row in template
    HTML whose :func:`medcat_ray.functions.html.extract_text` output is
    byte-identically ``'doc <id>\\nhome nav\\n' + text`` (the north-rule
    invariant, unit-tested in tests/test_north_rule.py) with
    ``url = 'https://docs.example/' + doc_id`` — so the full
    read → extract_text → annotate path over pages equals the documents
    entity set with every offset shifted by the prefix length
    ``len('doc ') + len(doc_id) + len('\\nhome nav\\n') = 14 + len(id)``
    (the prefix tokens ``doc/<digits>/home/nav`` match no concept name)."""
    return (TOKEN_CTE.format(concepts=concept_values_sql()) + """
SELECT 'https://docs.example/' || CAST(doc_id AS VARCHAR) AS url,
       CAST(start_pos + 14 + length(CAST(doc_id AS VARCHAR)) AS INT)
         AS start_pos,
       CAST(end_pos + 14 + length(CAST(doc_id AS VARCHAR)) AS INT)
         AS end_pos,
       cui, source_value
FROM ents
""")


def entities_oracle_sql() -> str:
    return (TOKEN_CTE.format(concepts=concept_values_sql())
            + "SELECT doc_id, start_pos, end_pos, cui, source_value FROM ents")


def mentions_oracle_sql() -> str:
    return (TOKEN_CTE.format(concepts=concept_values_sql())
            + "SELECT cui, count(*) AS n_mentions FROM ents GROUP BY cui")


def pmi_edges_oracle_sql(window: int = 300) -> str:
    """Pair counts re-derived in SQL (the kg_triple_counts arithmetic),
    then PMI/NPMI from the in-SQL marginals — the ops/pmi.py math."""
    return (TOKEN_CTE.format(concepts=concept_values_sql()) + f"""
, tc AS (
  SELECT s.cui AS subj_cui,
         'co_occurs_with' AS pred,
         o.cui AS obj_cui,
         count(*) AS count
  FROM ents s JOIN ents o
    ON s.doc_id = o.doc_id
   AND o.start_pos > s.start_pos
   AND o.start_pos - s.start_pos <= {window}
   AND s.source_value <> o.source_value
  GROUP BY s.cui, o.cui
), tot AS (SELECT SUM(count) AS t FROM tc),
rs AS (SELECT subj_cui, SUM(count) AS c_s FROM tc GROUP BY subj_cui),
cs AS (SELECT obj_cui, SUM(count) AS c_o FROM tc GROUP BY obj_cui)
SELECT tc.subj_cui, tc.pred, tc.obj_cui,
       CAST(tc.count AS BIGINT) AS count,
       LN(tc.count * 1.0 * tot.t / (rs.c_s * cs.c_o)) AS pmi,
       CASE WHEN tc.count >= tot.t THEN 1.0
            ELSE LN(tc.count * 1.0 * tot.t / (rs.c_s * cs.c_o))
                 / (-LN(tc.count * 1.0 / tot.t)) END AS npmi
FROM tc JOIN rs USING (subj_cui) JOIN cs USING (obj_cui) CROSS JOIN tot
""")


def triple_counts_oracle_sql(window: int = 300) -> str:
    return (TOKEN_CTE.format(concepts=concept_values_sql()) + f"""
SELECT s.cui AS subj_cui,
       'co_occurs_with' AS pred,
       o.cui AS obj_cui,
       count(*) AS count
FROM ents s JOIN ents o
  ON s.doc_id = o.doc_id
 AND o.start_pos > s.start_pos
 AND o.start_pos - s.start_pos <= {window}
 AND s.source_value <> o.source_value
GROUP BY s.cui, o.cui
""")


# ---------------------------------------------------------------------------
# K-fold cross-validation over a deterministic labelled export (A6 driver,
# reference medcat/stats/kfold.py:452-480), oracle-checked end-to-end.
#
# Gold labels are a SQL-expressible asymmetry against the dictionary:
#   * 10 of the 12 concept words carry correct gold annotations -> TP;
#   * "spark" / "join" mentions are LEFT OUT of gold -> every predicted
#     mention of them is an FP;
#   * the sub-min-length token "a" carries gold annotations under a fake
#     CUI -> FN.  prepare_name("a") is empty under DOCS_CONFIG
#     (min_name_len=3), so the supervised replay of those annotations
#     provably cannot teach the dictionary to detect them — and the empty
#     fixture vocab means replay trains no context vectors — hence
#     predictions are fold-composition-independent and the merged k-fold
#     metrics equal corpus-wide counts, which DuckDB recomputes exactly.
# What the oracle then checks about the ORCHESTRATION itself: the union
# of held-out folds covers every document exactly once (any fold overlap
# or gap shifts the counts), state restoration between folds, and the
# merge arithmetic.
# ---------------------------------------------------------------------------

KFOLD_DOC_LIMIT = 60                    # model-sized labelled export
KFOLD_FP_WORDS = ("spark", "join")      # predicted but never gold
KFOLD_FN_WORD = "a"                     # gold but never predictable
KFOLD_FN_CUI = "C0000999"


def _kfold_export(sf_dir: str) -> dict:
    """Deterministic MCT-style export over the first KFOLD_DOC_LIMIT docs,
    gold positions computed with the same space-tokenization as TOKEN_CTE."""
    import pyarrow.parquet as pq
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id", "text"])
    docs = []
    for doc_id, text in sorted(zip(tbl["doc_id"].to_pylist(),
                                   tbl["text"].to_pylist())):
        if doc_id >= KFOLD_DOC_LIMIT:
            continue
        anns = []
        pos = 0
        for tok in (text or "").split(" "):
            if tok in DOC_CONCEPTS and tok not in KFOLD_FP_WORDS:
                anns.append({"start": pos, "end": pos + len(tok),
                             "cui": DOC_CONCEPTS[tok], "value": tok,
                             "correct": True})
            elif tok == KFOLD_FN_WORD:
                anns.append({"start": pos, "end": pos + len(tok),
                             "cui": KFOLD_FN_CUI, "value": tok,
                             "correct": True})
            pos += len(tok) + 1
        docs.append({"id": int(doc_id), "name": f"doc{doc_id}",
                     "text": text, "annotations": anns})
    return {"projects": [{"id": 1, "name": "kfold", "cuis": "",
                          "documents": docs}]}


def kfold_stats(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """3-fold weighted-split train/eval replay -> merged per-CUI metrics."""
    from medcat_ray.stats_kfold import get_k_fold_stats
    cdb, vocab = docs_cdb()
    merged = get_k_fold_stats(cdb, vocab, _kfold_export(sf_dir), k=k,
                              split_type="weighted", config=DOCS_CONFIG)
    for c in ("tp", "fp", "fn"):
        merged[c] = merged[c].astype("int64")
    return merged.sort_values("cui").reset_index(drop=True)


def kfold_stats_oracle_sql() -> str:
    fp_words = ", ".join(f"'{w}'" for w in KFOLD_FP_WORDS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE doc_id < {KFOLD_DOC_LIMIT}
), concepts AS (
  SELECT * FROM {concept_values_sql()}
), counted AS (
  SELECT c.cui,
         CASE WHEN c.name IN ({fp_words}) THEN 0 ELSE count(t.tok) END AS tp,
         CASE WHEN c.name IN ({fp_words}) THEN count(t.tok) ELSE 0 END AS fp,
         0 AS fn
  FROM concepts c LEFT JOIN toks t ON t.tok = c.name
  GROUP BY c.cui, c.name
  UNION ALL
  SELECT '{KFOLD_FN_CUI}' AS cui, 0 AS tp, 0 AS fp, count(*) AS fn
  FROM toks WHERE tok = '{KFOLD_FN_WORD}'
)
SELECT cui, tp, fp, fn,
       ROUND(tp / GREATEST(tp + fp, 1), 6) AS prec,
       ROUND(tp / GREATEST(tp + fn, 1), 6) AS rec,
       ROUND(2.0 * tp / GREATEST(2 * tp + fp + fn, 1), 6) AS f1
FROM counted
ORDER BY cui
"""


# ---------------------------------------------------------------------------
# Neural-head driver queries (rows-only: the BiLSTM/BERT forward passes are
# not SQL-expressible; determinism comes from fixed-seed weights and is
# pinned by unit tests in tests/test_bilstm.py / tests/test_bert.py).
# ---------------------------------------------------------------------------

def _docs_token_vocab() -> Dict[str, int]:
    """Closed corpus vocabulary -> stable token ids (0=pad, 1=unk)."""
    return {w: i + 2 for i, w in enumerate(_CORPUS_WORDS)}


def kg_meta_pipe(sf_dir: str) -> rd.Dataset:
    """The kg_meta pipeline rebuilt through the DECLARATIVE composer
    (pipelines/compose.py:RayPipe — the reference Pipe.add_* extension
    surface, medcat/pipe.py:78-186): add_annotator + add_meta_cat +
    add_component(explode).  Shares kg_meta's exact SQL oracle, proving
    the composed plan equals the hand-built chain end-to-end."""
    from medcat_ray.pipelines.compose import RayPipe
    from medcat_ray.stages.meta import MetaRule
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cdb, vocab = docs_cdb()
    rules = [MetaRule("Negation", META_TRIGGERS, "Negated", "Affirmed",
                      scope="left")]

    def explode(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "start_pos": [], "cui": [], "negation": []}
        for doc_id, ents, metas in zip(batch["doc_id"].to_pylist(),
                                       batch["ents"].to_pylist(),
                                       batch["meta_anns"].to_pylist()):
            for ent, anns in zip(ents or [], metas or []):
                rows["doc_id"].append(doc_id)
                rows["start_pos"].append(ent["start"])
                rows["cui"].append(ent["cui"])
                rows["negation"].append(anns[0]["value"])
        return pa.table({"doc_id": pa.array(rows["doc_id"], pa.int64()),
                         "start_pos": pa.array(rows["start_pos"],
                                               pa.int32()),
                         "cui": pa.array(rows["cui"], pa.string()),
                         "negation": pa.array(rows["negation"],
                                              pa.string())})

    pipe = (RayPipe(models=(cdb, vocab), config=DOCS_CONFIG,
                    key_column="doc_id")
            .add_annotator(concurrency=2)
            .add_meta_cat(rules, concurrency=2)
            .add_component(explode))
    return pipe.run(docs)


def kg_meta_bilstm(sf_dir: str) -> pd.DataFrame:
    """T2 neural path: the numpy BiLSTM MetaCAT scorer (stages/bilstm.py,
    reference meta_cat.py:447-634 eval semantics) over every linked
    entity, via the SAME actor-pool meta stage as kg_meta.

    SQL-checkable: the weights are the PLANTED saturated set
    (stages/bilstm.rule_negation_weights) whose full LSTM forward
    provably equals the MetaRule trigger-in-left-window rule with
    confidence exactly 1.0 — the random-weight forward stays pinned by
    tests/test_bilstm.py's naive-transcription twin."""
    from medcat_ray.stages.bilstm import (BiLSTMMetaScorer, NumpyBiLSTM,
                                          rule_negation_weights)
    from medcat_ray.stages.meta import meta_annotate
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cdb, vocab = docs_cdb()
    ann = docs.map_batches(
        __import__("medcat_ray.stages.annotate",
                   fromlist=["AnnotateStage"]).AnnotateStage,
        fn_constructor_kwargs=dict(models=(cdb, vocab), config=DOCS_CONFIG,
                                   key_column="doc_id",
                                   keep_columns=("text",)),
        batch_format="pyarrow", batch_size=128, concurrency=2, num_cpus=1)
    tok2id = _docs_token_vocab()
    scorer = BiLSTMMetaScorer(
        "Negation",
        NumpyBiLSTM(rule_negation_weights(
            vocab_size=len(tok2id) + 2,
            trigger_ids=[tok2id[t] for t in META_TRIGGERS]),
            padding_idx=0, num_layers=1),
        tok2id, {0: "Affirmed", 1: "Negated"})
    meta = meta_annotate(ann, rules=[scorer], concurrency=2)

    def explode(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "start_pos": [], "cui": [], "value": [],
                "confidence": []}
        for doc_id, ents, metas in zip(batch["doc_id"].to_pylist(),
                                       batch["ents"].to_pylist(),
                                       batch["meta_anns"].to_pylist()):
            for ent, anns in zip(ents or [], metas or []):
                rows["doc_id"].append(doc_id)
                rows["start_pos"].append(ent["start"])
                rows["cui"].append(ent["cui"])
                rows["value"].append(anns[0]["value"])
                rows["confidence"].append(anns[0]["confidence"])
        return pa.table({
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "start_pos": pa.array(rows["start_pos"], pa.int32()),
            "cui": pa.array(rows["cui"], pa.string()),
            "value": pa.array(rows["value"], pa.string()),
            "confidence": pa.array(rows["confidence"], pa.float64()),
        })

    out = meta.map_batches(explode, batch_format="pyarrow").to_pandas()
    out["confidence"] = out["confidence"].round(6)
    return out.sort_values(["doc_id", "start_pos"]).reset_index(drop=True)


def kg_rel_bert(sf_dir: str) -> pd.DataFrame:
    """T3 neural path: the numpy BERT pair classifier (stages/bert.py,
    reference rel_cat.py:551-611 + relation_extraction/models.py:170-222)
    over window-bounded entity pairs, via the RelScoreStage actor pool;
    grouped relation counts.

    SQL-checkable: the weights are the PLANTED saturated set
    (stages/bert.rule_rel_weights) whose full encoder + pair-head
    forward provably equals "operates_on iff the subject token is a
    T_OP concept word" with confidence exactly 1.0 — the random-weight
    forward stays pinned by tests/test_bert.py's hand-computed twin.
    max_len=120 covers every testdata document (max 100 words), so no
    truncation complicates the oracle."""
    import ray
    from ray.data.aggregate import Count
    from medcat_ray.stages.bert import (BertRelScorer,
                                        NumpyBertRelClassifier,
                                        rule_rel_weights)
    from medcat_ray.stages.rel_model import score_relations
    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    cdb, vocab = docs_cdb()
    ann = docs.map_batches(
        __import__("medcat_ray.stages.annotate",
                   fromlist=["AnnotateStage"]).AnnotateStage,
        fn_constructor_kwargs=dict(models=(cdb, vocab), config=DOCS_CONFIG,
                                   key_column="doc_id",
                                   keep_columns=("text",)),
        batch_format="pyarrow", batch_size=128, concurrency=2, num_cpus=1)
    tok2id = _docs_token_vocab()
    op_ids = [tok2id[w] for w, t in sorted(DOC_TYPES.items())
              if t == "T_OP"]
    scorer = BertRelScorer(
        NumpyBertRelClassifier(
            rule_rel_weights(vocab_size=len(tok2id) + 2,
                             trigger_ids=op_ids, max_pos=128),
            num_layers=1, num_heads=2),
        tok2id, {0: "operates_on", 1: "none"}, max_len=120)
    rels = score_relations(ann, scorer, window=60, key_column="doc_id",
                           concurrency=2)
    out = rels.groupby(["subj_cui", "pred", "obj_cui"]).aggregate(
        Count(alias_name="count")).to_pandas()
    out["count"] = out["count"].astype("int64")
    return out.sort_values(["subj_cui", "pred", "obj_cui"]) \
        .reset_index(drop=True)
