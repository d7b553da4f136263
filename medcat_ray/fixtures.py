"""Deterministic synthetic fixtures: concept CSV, vocab TSV, pages corpus.

Implements FIXTURES.md F1-F3.  Everything is seeded (no wall clock, no
external data).  Formats mirror the reference's own fixture formats
(/root/reference/examples/cdb.csv, /root/reference/examples/vocab_data.txt)
so the same artifacts could drive the reference.

The pages corpus embeds concept mentions with controlled phenomena
(multi-token names, lemmatization targets, ambiguity, uppercase
abbreviations, skip-token gaps, relation-window pairs) and wraps each text in
template HTML whose :func:`medcat_ray.functions.html.extract_text` output is
byte-identical to the stored ``text`` column (the north-rule invariant).
"""

from __future__ import annotations

import html as _html_mod
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from medcat_ray.config import EngineConfig
from medcat_ray.functions.html import extract_text
from medcat_ray.state.cdb import CDB, prepare_name
from medcat_ray.state.vocab import Vocab

EPOCH_US = 1_600_000_000_000_000  # fixed base for warc_ts (2020-09-13T12:26:40Z)

# ---------------------------------------------------------------------------
# Synthetic concept space.
#
# ~n_cuis concepts over a closed word list.  Concept names reuse "filler"
# words plus dedicated concept words so that mentions occur naturally in
# generated sentences.  ~10% of names are ambiguous (shared by two CUIs, one
# marked P) to exercise disambiguation.
# ---------------------------------------------------------------------------

_CONCEPT_WORDS = [
    "kidney", "liver", "cardiac", "renal", "hepatic", "gastric", "neural",
    "fibrosis", "stenosis", "lesion", "tumour", "sepsis", "anemia",
    "asthma", "diabetes", "failure", "disease", "syndrome", "infection",
    "carcinoma", "embolism", "fracture", "ulcer", "oedema", "pain",
    "chronic", "acute", "severe", "primary", "secondary", "malignant",
    "benign", "viral", "bacterial", "fungal", "cranial", "spinal",
    "arterial", "venous", "cortical",
]

_FILLER_WORDS = [
    "patient", "history", "noted", "report", "review", "clinic", "ward",
    "admitted", "discharged", "treated", "stable", "improving", "observed",
    "presented", "examination", "normal", "routine", "follow", "visit",
    "morning", "evening", "today", "again", "without", "signs", "shows",
    "recent", "known", "ongoing", "possible", "likely", "findings",
]


def make_concept_csv(path: str, n_cuis: int = 200, seed: int = 7) -> str:
    """Write a concept CSV in the reference format
    (/root/reference/examples/cdb.csv; consumed by
    CDBMaker.prepare_csvs, /root/reference/medcat/cdb_maker.py:60-199)."""
    rng = np.random.default_rng(seed)
    lines = ["cui,name,ontologies,name_status,type_ids,description"]
    words = _CONCEPT_WORDS
    for i in range(n_cuis):
        cui = f"C{i:07d}"
        w1 = words[i % len(words)]
        w2 = words[(i * 7 + 3) % len(words)]
        kind = i % 5
        if kind == 0:            # single-word name
            names = [w1]
        elif kind == 1:          # two-word name
            names = [f"{w1} {w2}", w1 + "x" + str(i % 13)]
        elif kind == 2:          # lemmatization target (plural form in corpus)
            names = [f"{w1} {w2} disorder"]
        elif kind == 3:          # uppercase abbreviation + long form
            names = [(w1[:2] + w2[:2]).upper(), f"{w1} {w2} syndrome"]
        else:                    # three-word name
            names = [f"{w1} {w2} complex", w2]
        type_id = f"T{100 + (i % 7)}"
        status = "P"
        name_field = "|".join(names)
        lines.append(f'{cui},"{name_field}",MSH,{status},{type_id},synthetic concept {i}')
        # ~10% ambiguity: the next CUI shares the first name, status A
        if i % 10 == 4 and i + 1 < n_cuis:
            amb_cui = f"C{i:07d}A"
            lines.append(f'{amb_cui},"{names[0]}",MSH,A,{type_id},ambiguous twin of {cui}')
    content = "\n".join(lines) + "\n"
    with open(path, "w") as fh:
        fh.write(content)
    return path


def make_vocab_tsv(path: str, cdb: CDB, dim: int = 8, seed: int = 11) -> str:
    """Write a vocab TSV (``word\\tcnt\\tvec``) in the reference format
    (/root/reference/medcat/vocab.py:154-177).

    Concept-name tokens get cluster-correlated unit vectors per their first
    CUI so that context disambiguation is decidable (FIXTURES.md F3)."""
    rng = np.random.default_rng(seed)
    words: Dict[str, np.ndarray] = {}
    # Assign each CUI a cluster center; tokens of its names get
    # center + small noise.
    for cui in sorted(cdb.cui2names):
        center = rng.normal(size=dim)
        for name in sorted(cdb.cui2names[cui]):
            for tok in name.split(cdb.config.separator):
                if tok not in words:
                    vec = center + 0.1 * rng.normal(size=dim)
                    words[tok] = vec / np.linalg.norm(vec)
    for w in _FILLER_WORDS + _CONCEPT_WORDS:
        lw = w.lower()
        if lw not in words:
            vec = rng.normal(size=dim)
            words[lw] = vec / np.linalg.norm(vec)
    lines = []
    for i, (word, vec) in enumerate(sorted(words.items())):
        cnt = 1000 + (i * 37) % 1000
        vec_str = " ".join(f"{x:.6f}" for x in vec)
        lines.append(f"{word}\t{cnt}\t{vec_str}")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return path


def build_fixture_models(tmp_dir: str, n_cuis: int = 200,
                         config: Optional[EngineConfig] = None,
                         dim: int = 8) -> Tuple[CDB, Vocab]:
    """Concept CSV + vocab TSV → (CDB, Vocab) with installed context vectors.

    Context vectors per CUI = mean of its name-token vectors (unit-normed),
    identical across context sizes — a deterministic stand-in for the
    order-dependent EMA training (SURVEY.md §7.4)."""
    config = config or EngineConfig()
    csv_path = os.path.join(tmp_dir, "concepts.csv")
    make_concept_csv(csv_path, n_cuis=n_cuis)
    cdb = CDB(config)
    import csv as _csv
    with open(csv_path) as fh:
        cdb.add_concept_rows(_csv.DictReader(fh), full_build=True)

    tsv_path = os.path.join(tmp_dir, "vocab.tsv")
    make_vocab_tsv(tsv_path, cdb, dim=dim)
    vocab = Vocab.from_tsv(tsv_path)

    for cui in sorted(cdb.cui2names):
        toks = sorted({t for name in cdb.cui2names[cui]
                       for t in name.split(config.separator)})
        vecs = [vocab.vec(t) for t in toks if vocab.vec(t) is not None]
        if vecs:
            center = np.mean(vecs, axis=0)
            cdb.set_context_vectors(
                cui, {ct: center for ct in config.context_vector_sizes},
                count_train=25)
    return cdb, vocab


# ---------------------------------------------------------------------------
# Pages corpus (F1)
# ---------------------------------------------------------------------------

_HTML_TEMPLATE = """<html><head><title>{title}</title>
<style>body {{ color: #222; }}</style>
<script>var t = {i}; console.log("noise");</script>
</head><body>
<!-- comment noise {i} -->
<div class="nav"><a href="/home">{nav}</a></div>
{paras}
<noscript>enable js</noscript>
</body></html>"""


def _sentence(rng: np.random.Generator, cdb_names: List[str]) -> str:
    """One seeded sentence over filler words + concept raw names."""
    n_fill = int(rng.integers(3, 9))
    words = [_FILLER_WORDS[int(rng.integers(0, len(_FILLER_WORDS)))]
             for _ in range(n_fill)]
    n_concepts = int(rng.integers(0, 3))
    for _ in range(n_concepts):
        raw = cdb_names[int(rng.integers(0, len(cdb_names)))]
        pos = int(rng.integers(0, len(words) + 1))
        words.insert(pos, raw)
    return " ".join(words)


def make_pages_corpus(out_path: str, n_pages: int = 1000, seed: int = 42,
                      cdb: Optional[CDB] = None,
                      rows_per_file: Optional[int] = None) -> str:
    """Write the pages Parquet table in the input-hint schema
    (url, warc_ts, html, text, lang) — BASELINE.json input_hint.

    ``text`` is stored as the byte-exact output of
    ``extract_text(html)`` so the invariant is testable by equality."""
    if cdb is None:
        names: List[str] = ["kidney failure", "cardiac disease", "sepsis"]
    else:
        names = sorted({raw for s in cdb.addl_info.get("cui2original_names",
                                                       {}).values()
                        for raw in s}) or sorted(cdb.name2cuis)
    rng = np.random.default_rng(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in range(n_pages):
        page_rng = np.random.default_rng(seed * 1_000_003 + i)
        n_paras = int(page_rng.integers(1, 4))
        paras = []
        for _ in range(n_paras):
            n_sents = int(page_rng.integers(1, 4))
            para = ". ".join(_sentence(page_rng, names) for _ in range(n_sents))
            paras.append(para)
        title = f"Synthetic page {i}"
        nav = "home nav"
        html = _HTML_TEMPLATE.format(
            title=title, i=i, nav=nav,
            paras="\n".join(f"<p>{_html_mod.escape(p)}</p>" for p in paras))
        text = extract_text(html)
        urls.append(f"https://site{i % 97}.example/page/{i}")
        tss.append(EPOCH_US + i * 1_000_000)
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append("de" if i % 29 == 0 else "en")

    table = pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(tss, type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })
    if rows_per_file:
        os.makedirs(out_path, exist_ok=True)
        n_files = (n_pages + rows_per_file - 1) // rows_per_file
        for f in range(n_files):
            chunk = table.slice(f * rows_per_file, rows_per_file)
            pq.write_table(chunk, os.path.join(out_path, f"part-{f:05d}.parquet"))
    else:
        pq.write_table(table, out_path)
    return out_path


def pages_from_documents(documents_path: str, out_path: str,
                         rows_per_file: int = 50_000) -> str:
    """Derive a pages table from the driver's ``documents`` testdata table
    (doc_id, text, lang, source) — deterministic wrap of each text in
    template HTML with the byte-identity invariant preserved."""
    table = pq.read_table(documents_path)
    os.makedirs(out_path, exist_ok=True)
    n = table.num_rows
    fidx = 0
    for off in range(0, n, rows_per_file):
        chunk = table.slice(off, rows_per_file)
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for doc_id, text, lang in zip(chunk["doc_id"].to_pylist(),
                                      chunk["text"].to_pylist(),
                                      chunk["lang"].to_pylist()):
            html = _HTML_TEMPLATE.format(
                title=f"doc {doc_id}", i=doc_id, nav="home nav",
                paras=f"<p>{_html_mod.escape(text)}</p>")
            urls.append(f"https://docs.example/{doc_id}")
            tss.append(EPOCH_US + int(doc_id) * 1_000_000)
            htmls.append(html.encode("utf-8"))
            texts.append(extract_text(html))
            langs.append(lang)
        out = pa.table({
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        })
        pq.write_table(out, os.path.join(out_path, f"part-{fidx:05d}.parquet"))
        fidx += 1
    with open(os.path.join(out_path, "_DONE"), "w") as fh:
        fh.write("ok")   # completeness marker: callers treat a dir without
    return out_path      # it as a crashed partial write and rebuild
