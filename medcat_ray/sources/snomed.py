"""SNOMED CT RF2 snapshot source (SURVEY.md S4).

Reimplements the reference's SNOMED preprocessor semantics
(/root/reference/medcat/utils/preprocess_snomed.py:316-472) Ray-Data-first.
The relationship files carry the reference's only first-class
``(subj, pred, obj)`` triples — :func:`snomed_relationships` streams them as
an edge Dataset, which is the same shape our KG materialize stage emits.

RF2 snapshot files are tab-separated WITH a header row; all identifier
columns stay strings (SCTIDs overflow nothing, but leading-zero safety and
reference parity both want strings).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data as rd

# RF2 description typeIds (preprocess_snomed.py:359-375).
FSN_TYPE = "900000000000003001"       # fully-specified name → status P
SYNONYM_TYPE = "900000000000013009"   # synonym → status A
# FSN semantic-tag extractor (preprocess_snomed.py:380-382).
_SEM_TAG = re.compile(r"\((\w+\s?.?\s?\w+.?\w+.?\w+.?)\)$")


def _read_rf2(path: str, **kwargs) -> rd.Dataset:
    return rd.read_csv(
        path,
        parse_options=pacsv.ParseOptions(delimiter="\t"),
        convert_options=pacsv.ConvertOptions(
            column_types={
                "id": pa.string(), "active": pa.string(),
                "conceptId": pa.string(), "typeId": pa.string(),
                "term": pa.string(), "sourceId": pa.string(),
                "destinationId": pa.string(), "moduleId": pa.string(),
                "effectiveTime": pa.string(),
                "relationshipGroup": pa.string(),
                "characteristicTypeId": pa.string(),
                "definitionStatusId": pa.string(),
                "languageCode": pa.string(),
                "caseSignificanceId": pa.string(),
                "modifierId": pa.string(),
            }),
        **kwargs)


def _active(ds: rd.Dataset) -> rd.Dataset:
    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.equal(batch["active"], "1"))
    return ds.map_batches(keep, batch_format="pyarrow")


def type_id_for_tag(semantic_tag: Optional[str]) -> int:
    """Hash a FSN semantic tag to an 8-digit type id
    (preprocess_snomed.py:387-389; hashes the string ``"None"`` when the
    FSN has no parenthetical — parity kept)."""
    return int(hashlib.sha256(str(semantic_tag).encode("utf-8"))
               .hexdigest(), 16) % 10 ** 8


def snomed_concept_dataset(concept_path: str,
                           description_path: str) -> rd.Dataset:
    """Active concepts ⋈ active descriptions → concept rows
    (cui, name, name_status, ontologies, type_ids).

    Reference ``Snomed.to_concept_df`` (preprocess_snomed.py:316-392):
    FSN descriptions → status P, synonyms → A; the per-concept type id is
    the hashed semantic tag of the concept's FSN.  The active-concept id set
    and the cui→semantic-tag map are small relative to the description
    stream, so both are driver-collected and broadcast (map-side join)
    rather than shuffled.
    """
    import ray

    # Active-concept id set: ~10^6 ids for full SNOMED — small enough to
    # collect on the driver and broadcast once.
    concepts = _active(_read_rf2(concept_path)).select_columns(["id"])
    active_ids = set(concepts.to_pandas()["id"].tolist())
    active_ref = ray.put(active_ids)

    descs = _active(_read_rf2(description_path))

    def fsn_tags(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        batch = batch.filter(pc.equal(batch["typeId"], FSN_TYPE))
        cuis, tags = [], []
        for cui, term in zip(batch["conceptId"].to_pylist(),
                             batch["term"].to_pylist()):
            m = _SEM_TAG.search(term or "")
            cuis.append(cui)
            tags.append(m.group(1) if m else None)
        return pa.table({"cui": pa.array(cuis, pa.string()),
                         "tag": pa.array(tags, pa.string())})

    tag_df = descs.map_batches(fsn_tags, batch_format="pyarrow").to_pandas()
    cui2tag: Dict[str, Optional[str]] = {}
    for cui, tag in zip(tag_df["cui"], tag_df["tag"]):
        cui2tag.setdefault(cui, tag if tag is not None else None)
    tag_ref = ray.put(cui2tag)

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.is_in(batch["typeId"], pa.array([FSN_TYPE, SYNONYM_TYPE]))
        batch = batch.filter(mask)
        keep = ray.get(active_ref)
        tags = ray.get(tag_ref)
        rows = {"cui": [], "name": [], "name_status": [],
                "ontologies": [], "type_ids": []}
        for cui, term, type_id in zip(batch["conceptId"].to_pylist(),
                                      batch["term"].to_pylist(),
                                      batch["typeId"].to_pylist()):
            if cui not in keep:
                continue
            rows["cui"].append(cui)
            rows["name"].append(term)
            rows["name_status"].append("P" if type_id == FSN_TYPE else "A")
            rows["ontologies"].append("SNOMED-CT")
            rows["type_ids"].append(str(type_id_for_tag(tags.get(cui))))
        return pa.table({k: pa.array(v, pa.string())
                         for k, v in rows.items()})

    return descs.map_batches(project, batch_format="pyarrow")


def snomed_relationships(relationship_path: str) -> rd.Dataset:
    """Active relationship rows as a KG edge stream
    ``(subj_cui=sourceId, pred=typeId, obj_cui=destinationId,
    relationship_group)`` — the ontology-triples analogue of our
    co-occurrence triples (preprocess_snomed.py:394-425 filters
    ``active == '1'``; SURVEY.md §2.1 S4)."""
    ds = _active(_read_rf2(relationship_path))

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "subj_cui": batch["sourceId"],
            "pred": batch["typeId"],
            "obj_cui": batch["destinationId"],
            "relationship_group": batch["relationshipGroup"],
        })

    return ds.map_batches(project, batch_format="pyarrow")


def list_all_relationships(relationship_path: str) -> List[str]:
    """Distinct active relationship typeIds
    (reference ``list_all_relationships``, preprocess_snomed.py:394-425)."""
    ds = snomed_relationships(relationship_path).select_columns(["pred"])
    return sorted(ds.unique("pred"))


def relationship_map(relationship_path: str,
                     relationship_code: str) -> Dict[str, List[str]]:
    """destinationId → [sourceId, ...] for one relationship type
    (reference ``relationship2json``, preprocess_snomed.py:427-472).
    Distributed filter + groupby; result is small (one relation type)."""
    ds = snomed_relationships(relationship_path)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.equal(batch["pred"], relationship_code))

    flt = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    out: Dict[str, List[str]] = {}
    for dst, src in zip(flt["obj_cui"], flt["subj_cui"]):
        out.setdefault(dst, []).append(src)
    return out


def refset_mapping(refset_path: str,
                   refset_id: Optional[str] = None) -> Dict[str, list]:
    """SNOMED extended-map refset (ICD-10 / OPCS4 mappings) → per-concept
    metadata dicts.

    Reference ``Snomed._map_snomed2refset`` + ``_refset_df2dict``
    (/root/reference/medcat/utils/preprocess_snomed.py:431-476 and 514-530):
    active rows, sorted by (referencedComponentId, mapPriority, mapGroup),
    folded to {cui: [{code, mapGroup, mapPriority, mapRule, mapAdvice}]}.
    The reference sets BOTH 'mapGroup' and 'mapPriority' from the
    mapPriority column (preprocess_snomed.py:526-527) — quirk reproduced.
    ``refset_id`` filters to one refset (the reference splits UK editions
    into ICD-10 vs OPCS4 this way, preprocess_snomed.py:468-473)."""
    ds = _active(rd.read_csv(
        refset_path,
        parse_options=__import__("pyarrow.csv", fromlist=["ParseOptions"])
        .ParseOptions(delimiter="\t"),
        convert_options=__import__("pyarrow.csv", fromlist=["ConvertOptions"])
        .ConvertOptions(column_types={
            "id": pa.string(), "active": pa.string(),
            "refsetId": pa.string(), "referencedComponentId": pa.string(),
            "mapGroup": pa.string(), "mapPriority": pa.string(),
            "mapRule": pa.string(), "mapAdvice": pa.string(),
            "mapTarget": pa.string(), "effectiveTime": pa.string(),
            "moduleId": pa.string(), "correlationId": pa.string(),
            "mapCategoryId": pa.string()})))
    if refset_id is not None:
        def keep(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return batch.filter(pc.equal(batch["refsetId"], refset_id))
        ds = ds.map_batches(keep, batch_format="pyarrow")
    df = ds.to_pandas().sort_values(
        ["referencedComponentId", "mapPriority", "mapGroup"])
    out: Dict[str, list] = {}
    for _, row in df.iterrows():
        out.setdefault(row["referencedComponentId"], []).append({
            "code": row["mapTarget"],
            "mapGroup": row["mapPriority"],     # reference quirk (see above)
            "mapPriority": row["mapPriority"],
            "mapRule": row["mapRule"],
            "mapAdvice": row["mapAdvice"],
        })
    return out


def get_direct_refset_mapping(refset_dict: Dict[str, list]
                              ) -> Dict[str, list]:
    """{cui: [codes]} ordered highest mapPriority first (reference
    ``get_direct_refset_mapping``, preprocess_snomed.py:14-33; KeyError on
    missing 'code'/'mapPriority' keys — same contract as its tests)."""
    out: Dict[str, list] = {}
    for cui, entries in refset_dict.items():
        ordered = sorted(entries, key=lambda e: e["mapPriority"],
                         reverse=True)
        out[cui] = [e["code"] for e in ordered]
    return out


def pt2ch_map(relationship_path: str,
              isa_code: str = "116680003") -> Dict[str, List[str]]:
    """Parent→children map over active IS-A rows (the structure the
    reference stores as ``cdb.addl_info['pt2ch']`` and walks with
    ``get_all_children``, preprocess_snomed.py:17-40).  In RF2 an IS-A row
    means sourceId IS-A destinationId, so parent = destinationId — exactly
    :func:`relationship_map` for the IS-A type."""
    return relationship_map(relationship_path, isa_code)


def get_all_children(sctid: str, pt2ch: Dict[str, List[str]]) -> List[str]:
    """Transitive closure of one concept's descendants (reference
    ``get_all_children``, preprocess_snomed.py:17-40: iterative stack walk,
    result includes the root, returned sorted-unique here for
    determinism)."""
    seen = set()
    stack = [sctid]
    while stack:
        cur = stack.pop()
        if cur in seen:
            continue
        seen.add(cur)
        stack.extend(pt2ch.get(cur, []))
    return sorted(seen)
