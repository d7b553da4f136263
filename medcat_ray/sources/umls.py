"""UMLS release-file source (SURVEY.md S3).

Reimplements the semantics of the reference's UMLS preprocessor
(/root/reference/medcat/utils/preprocess_umls.py:83-189) Ray-Data-first:
MRCONSO is the big pipe-separated table and is streamed through
``ray.data.read_csv``; MRSTY (CUI→TUI semantic types) is small and becomes a
broadcast map-side join inside ``map_batches`` instead of a shuffle join.

Output concept rows use the reference's column mapping
(``medcat_csv_mapper``, preprocess_umls.py:49-55):
  CUI→cui, STR→name, SAB→ontologies, ISPREF→name_status, TUI→type_ids.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import pyarrow as pa
import pyarrow.csv as pacsv
import ray
import ray.data as rd

# MRCONSO.RRF columns (preprocess_umls.py:7-26).
MRCONSO_COLUMNS = [
    "CUI", "LAT", "TS", "LUI", "STT", "SUI", "ISPREF", "AUI", "SAUI",
    "SCUI", "SDUI", "SAB", "TTY", "CODE", "STR", "SRL", "SUPPRESS", "CVF",
]
# MRSTY.RRF columns (preprocess_umls.py:28-35).
MRSTY_COLUMNS = ["CUI", "TUI", "STN", "STY", "ATUI", "CVF"]
# MRHIER.RRF columns (preprocess_umls.py:37-46).
MRHIER_COLUMNS = ["CUI", "AUI", "CXN", "PAUI", "SAB", "RELA", "PTR", "HCD",
                  "CVF"]


def _read_rrf(path: str, columns: List[str],
              sep: str = "|", **read_kwargs) -> rd.Dataset:
    """Stream a headerless RRF file.  RRF rows end with a trailing ``|``,
    which pyarrow parses as one extra empty column — declared here as
    ``_trail`` and dropped."""
    names = list(columns) + ["_trail"]
    ds = rd.read_csv(
        path,
        read_options=pacsv.ReadOptions(column_names=names),
        parse_options=pacsv.ParseOptions(delimiter=sep),
        convert_options=pacsv.ConvertOptions(
            column_types={c: pa.string() for c in names}),
        **read_kwargs)
    return ds.drop_columns(["_trail"])


def read_mrsty_map(mrsty_path: str, sep: str = "|") -> Dict[str, List[str]]:
    """CUI → [TUI, ...] from MRSTY.RRF (small; driver-side load)."""
    names = MRSTY_COLUMNS + ["_trail"]
    table = pacsv.read_csv(
        mrsty_path,
        read_options=pacsv.ReadOptions(column_names=names),
        parse_options=pacsv.ParseOptions(delimiter=sep),
        convert_options=pacsv.ConvertOptions(
            column_types={c: pa.string() for c in names}))
    out: Dict[str, List[str]] = {}
    for cui, tui in zip(table["CUI"].to_pylist(), table["TUI"].to_pylist()):
        out.setdefault(cui, []).append(tui)
    return out


def umls_concept_dataset(mrconso_path: str, mrsty_path: str,
                         allow_languages: Optional[Sequence[str]] = ("ENG",),
                         sep: str = "|") -> rd.Dataset:
    """MRCONSO ⋈ MRSTY → concept rows (cui, name, ontologies, name_status,
    type_ids), the input shape of :meth:`medcat_ray.state.cdb.CDB.add_concept_rows`.

    Reference: ``UMLS.to_concept_df`` (preprocess_umls.py:104-146) — language
    filter then an inner join with the semantic-types table.  The reference's
    pandas merge keys on CUI; here the small CUI→TUIs map is broadcast via
    ``ray.put`` and probed per batch (rows with multiple TUIs fan out, rows
    with no TUI drop — inner-join parity).
    """
    langs = list(allow_languages) if allow_languages else None
    sty_ref = ray.put(read_mrsty_map(mrsty_path, sep))

    def join(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if langs:
            batch = batch.filter(pc.is_in(batch["LAT"], pa.array(langs)))
        sty = ray.get(sty_ref)
        cuis, names, onts, statuses, tuis = [], [], [], [], []
        for cui, name, sab, ispref in zip(
                batch["CUI"].to_pylist(), batch["STR"].to_pylist(),
                batch["SAB"].to_pylist(), batch["ISPREF"].to_pylist()):
            for tui in sty.get(cui, ()):   # inner join: no TUI → row drops
                cuis.append(cui)
                names.append(name)
                onts.append(sab)
                statuses.append(ispref)
                tuis.append(tui)
        return pa.table({"cui": pa.array(cuis, pa.string()),
                         "name": pa.array(names, pa.string()),
                         "ontologies": pa.array(onts, pa.string()),
                         "name_status": pa.array(statuses, pa.string()),
                         "type_ids": pa.array(tuis, pa.string())})

    conso = _read_rrf(mrconso_path, MRCONSO_COLUMNS, sep)
    return conso.map_batches(join, batch_format="pyarrow")


def umls2source(mrconso_path: str, sources: Union[str, Sequence[str]],
                sep: str = "|") -> rd.Dataset:
    """Rows of MRCONSO restricted to the given source vocabularies with a
    non-null CODE, sorted by CODE (reference ``map_umls2source``,
    preprocess_umls.py:170-189)."""
    src = [sources] if isinstance(sources, str) else list(sources)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.and_(pc.is_in(batch["SAB"], pa.array(src)),
                       pc.is_valid(batch["CODE"]))
        return batch.filter(mask)

    ds = _read_rrf(mrconso_path, MRCONSO_COLUMNS, sep)
    return ds.map_batches(keep, batch_format="pyarrow").sort("CODE")


def umls2snomed(mrconso_path: str, sep: str = "|") -> rd.Dataset:
    """SNOMEDCT_US rows with a source CUI, sorted by SCUI (reference
    ``map_umls2snomed``, preprocess_umls.py:122-140)."""

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.and_(pc.equal(batch["SAB"], "SNOMEDCT_US"),
                       pc.is_valid(batch["SCUI"]))
        return batch.filter(mask)

    ds = _read_rrf(mrconso_path, MRCONSO_COLUMNS, sep)
    return ds.map_batches(keep, batch_format="pyarrow").sort("SCUI")


def umls2icd10(mrconso_path: str, sep: str = "|") -> rd.Dataset:
    """Reference ``map_umls2icd10`` (preprocess_umls.py:142-168)."""
    return umls2source(mrconso_path, "ICD10", sep)


def mrhier_pt2ch(mrconso_path: str, mrhier_path: str,
                 allow_languages: Optional[Sequence[str]] = ("ENG",),
                 sep: str = "|") -> Dict[str, List[str]]:
    """Parent CUI → child CUIs from MRHIER isa rows (reference
    ``UMLS.get_pt2ch``, preprocess_umls.py:191-260): AUI→CUI map from
    MRCONSO (language-filtered), hierarchy restricted to preferred atoms
    (ISPREF=Y) with RELA='isa', self-parents dropped.

    Streams both RRF files; the AUI→CUI map and the fold are driver-side
    (model-sized: atoms of the ontology, not a corpus)."""
    langs = list(allow_languages) if allow_languages else None

    conso = _read_rrf(mrconso_path, MRCONSO_COLUMNS, sep)

    def project_conso(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if langs:
            batch = batch.filter(pc.is_in(batch["LAT"], pa.array(langs)))
        return pa.table({"AUI": batch["AUI"], "CUI": batch["CUI"],
                         "ISPREF": batch["ISPREF"]})

    conso_df = conso.map_batches(project_conso,
                                 batch_format="pyarrow").to_pandas()
    aui_cui = dict(zip(conso_df["AUI"], conso_df["CUI"]))
    pref = conso_df[conso_df["ISPREF"] == "Y"]
    pref_pairs = set(zip(pref["AUI"], pref["CUI"]))

    hier = _read_rrf(mrhier_path, MRHIER_COLUMNS, sep)

    def project_hier(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        batch = batch.filter(pc.equal(batch["RELA"], "isa"))
        return pa.table({"CUI": batch["CUI"], "AUI": batch["AUI"],
                         "PAUI": batch["PAUI"]})

    hier_df = hier.map_batches(project_hier,
                               batch_format="pyarrow").to_pandas()
    pt2ch: Dict[str, set] = {}
    for cui, aui, paui in zip(hier_df["CUI"], hier_df["AUI"],
                              hier_df["PAUI"]):
        if paui is None or (aui, cui) not in pref_pairs:
            continue
        parent_cui = aui_cui.get(paui)
        if parent_cui is None or parent_cui == cui:
            continue
        pt2ch.setdefault(parent_cui, set()).add(cui)
    return {k: sorted(v) for k, v in pt2ch.items()}
