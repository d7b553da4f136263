"""CDB — the concept database (dictionary/linker model).

Reimplements the reference's CDB maps (/root/reference/medcat/cdb.py:26-111)
and build semantics (``CDBMaker.prepare_csvs``,
/root/reference/medcat/cdb_maker.py:60-199; ``prepare_name``,
/root/reference/medcat/preprocessing/cleaners.py:10-66;
``CDB._add_concept``, /root/reference/medcat/cdb.py:250-386) as plain
dicts + numpy — no spaCy, no dill.  Serialization is a directory of Parquet
tables (SURVEY.md §1.3 "Arrow design"), loaded once per annotate actor.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from typing import Dict, Iterable, List, Optional, Sequence, Set, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from medcat_ray.config import EngineConfig, weighted_average
from medcat_ray.functions.text import lemmatize, morph_tag, tag_tokens, tokenize

_ONLY_LETTERS = re.compile(r"[^A-Za-z]*")


def prepare_name(raw_name: str, config: EngineConfig,
                 names: Optional[Dict[str, dict]] = None) -> Dict[str, dict]:
    """Generate LOWER + CLEAN name versions with prefix-subnames.

    Reference: ``prepare_name``
    (/root/reference/medcat/preprocessing/cleaners.py:10-66).  CLEAN uses our
    frozen lemmatizer for tokens >= ``min_len_normalize`` chars (the
    reference uses spaCy lemmas gated on POS; SURVEY.md §7.4 documents the
    deviation — both CDB build and runtime normalization share
    :func:`medcat_ray.functions.text.lemmatize`, so matching is consistent).
    """
    if names is None:
        names = {}
    tokens_all = tag_tokens(tokenize(raw_name, config.diacritics), config)
    is_upper = raw_name.isupper()
    kept = [t for t in tokens_all if not t.to_skip]
    sep = config.separator
    min_letters = config.min_letters_required

    for version in config.name_versions:
        if version == "LOWER":
            tokens = [t.lower for t in kept]
        elif version == "CLEAN":
            # POS gate mirrors preprocessing/cleaners.py:41-46: short and
            # gated-tag tokens keep the surface form, others the lemma —
            # identical to the annotation-side normalizer so CLEAN names
            # and normalized mentions stay in the same key space.
            dnn = config.do_not_normalize
            tokens = [t.lower if (len(t.lower) < config.min_len_normalize
                                  or (dnn and morph_tag(t.lower) in dnn))
                      else lemmatize(t.lower) for t in kept]
        else:
            continue
        if not tokens:
            continue
        name = sep.join(tokens)
        if min_letters and len(_ONLY_LETTERS.sub("", name)) < min_letters:
            continue
        if name in names:
            continue
        snames: Set[str] = set()
        sname = ""
        for token in tokens:
            sname = token if not sname else sname + sep + token
            snames.add(sname.strip())
        names[name] = {"tokens": tokens, "snames": snames,
                       "raw_name": raw_name, "is_upper": is_upper}
    return names


class CDB:
    """Concept database: name→CUI maps, per-CUI metadata, context vectors.

    Maps mirror /root/reference/medcat/cdb.py:26-111 (SURVEY.md §1.3).
    Read-mostly at inference; built on the driver (the corpus is the big
    thing, not the CDB) and broadcast to actors.
    """

    def __init__(self, config: Optional[EngineConfig] = None) -> None:
        self.config = config or EngineConfig()
        self.name2cuis: Dict[str, List[str]] = {}
        self.name2cuis2status: Dict[str, Dict[str, str]] = {}
        self.snames: Set[str] = set()
        self.cui2names: Dict[str, Set[str]] = {}
        self.cui2snames: Dict[str, Set[str]] = {}
        self.cui2context_vectors: Dict[str, Dict[str, np.ndarray]] = {}
        self.cui2count_train: Dict[str, int] = {}
        self.cui2type_ids: Dict[str, Set[str]] = {}
        self.cui2preferred_name: Dict[str, str] = {}
        self.cui2average_confidence: Dict[str, float] = {}
        self.name2count_train: Dict[str, int] = {}
        self.name_isupper: Dict[str, bool] = {}
        self.vocab: Dict[str, int] = {}          # words in CDB names (spell check)
        self.mutation_count = 0   # bumped on add_concept; invalidates
        #                           annotator-side projection caches
        self.addl_info: Dict[str, dict] = {
            "cui2icd10": {}, "cui2opcs4": {}, "cui2ontologies": {},
            "cui2original_names": {}, "cui2description": {},
            "type_id2name": {}, "type_id2cuis": {}, "cui2group": {},
        }
        self.weighted_average_function = weighted_average

    # -- build ------------------------------------------------------------

    def add_concept(self, cui: str, names: Dict[str, dict],
                    ontologies: Optional[Set[str]] = None,
                    name_status: str = "A",
                    type_ids: Optional[Set[str]] = None,
                    description: str = "",
                    full_build: bool = False) -> None:
        """Reference ``CDB._add_concept`` (/root/reference/medcat/cdb.py:250-386)."""
        ontologies = ontologies or set()
        type_ids = type_ids or set()
        self.mutation_count += 1
        name_status = name_status.upper()
        if name_status not in ("P", "A", "N"):
            name_status = "A"

        if cui not in self.cui2names:
            self.cui2names[cui] = set()
            self.cui2snames[cui] = set()
            self.cui2type_ids[cui] = set(type_ids)
        else:
            self.cui2type_ids[cui].update(type_ids)

        name_info = None
        for name, name_info in names.items():
            self.snames.update(name_info["snames"])
            self.cui2names[cui].add(name)
            self.cui2snames[cui].update(name_info["snames"])
            self.name_isupper[name] = name_info["is_upper"]

            if name in self.name2cuis:
                if cui not in self.name2cuis[name]:
                    self.name2cuis[name].append(cui)
                    self.name2cuis2status[name][cui] = name_status
                elif name_status == "P":
                    self.name2cuis2status[name][cui] = name_status
            else:
                self.name2cuis[name] = [cui]
                self.name2cuis2status[name] = {cui: name_status}

            for token in name_info["tokens"]:
                self.vocab[token] = self.vocab.get(token, 0) + 1

        if name_info is not None and name_status == "P" \
                and cui not in self.cui2preferred_name:
            self.cui2preferred_name[cui] = name_info["raw_name"]

        if full_build:
            ai = self.addl_info
            if cui not in ai["cui2original_names"]:
                if ontologies:
                    ai["cui2ontologies"][cui] = set(ontologies)
                if description:
                    ai["cui2description"][cui] = description
                ai["cui2original_names"][cui] = {v["raw_name"] for v in names.values()}
            else:
                if ontologies:
                    ai["cui2ontologies"].setdefault(cui, set()).update(ontologies)
                if description:
                    ai["cui2description"][cui] = description
                ai["cui2original_names"][cui].update(v["raw_name"] for v in names.values())
            for type_id in type_ids:
                ai["type_id2cuis"].setdefault(type_id, set()).add(cui)

    def add_concept_rows(self, rows: Iterable[dict],
                         full_build: bool = False) -> None:
        """Fold concept-CSV rows (cui, name, ontologies, name_status,
        type_ids, description) into this CDB.

        Reference ``CDBMaker.prepare_csvs`` row loop
        (/root/reference/medcat/cdb_maker.py:144-195): multi-valued fields
        split on ``multi_separator``; status defaults to A; cui upper-cased.
        """
        sep = self.config.multi_separator
        for row in rows:
            cui = str(row.get("cui", "")).strip().upper()
            if not cui:
                continue
            ontologies = {o.strip() for o in
                          str(row.get("ontologies", "") or "").upper().split(sep)
                          if o.strip()}
            name_status = str(row.get("name_status", "") or "").strip().upper()
            if name_status not in ("P", "A", "N"):
                name_status = "A"
            type_ids = {t.strip() for t in
                        str(row.get("type_ids", "") or "").upper().split(sep)
                        if t.strip()}
            description = str(row.get("description", "") or "").strip()
            names: Dict[str, dict] = {}
            for raw_name in str(row.get("name", "") or "").split(sep):
                raw_name = raw_name.strip()
                if raw_name:
                    prepare_name(raw_name, self.config, names)
            self.add_concept(cui=cui, names=names, ontologies=ontologies,
                             name_status=name_status, type_ids=type_ids,
                             description=description, full_build=full_build)

    # -- training-adjacent mutation (driver-side, small scale) ------------

    def set_context_vectors(self, cui: str, vectors: Dict[str, np.ndarray],
                            count_train: int = 1) -> None:
        """Directly install learned context vectors (bypasses the reference's
        order-dependent EMA training, SURVEY.md §7.4)."""
        self.cui2context_vectors[cui] = {
            k: np.asarray(v, dtype=np.float32) for k, v in vectors.items()}
        self.cui2count_train[cui] = count_train

    def update_context_vector(self, cui: str, vectors: Dict[str, np.ndarray],
                              negative: bool = False,
                              lr: Optional[float] = None) -> None:
        """Sequential EMA update (reference /root/reference/medcat/cdb.py:406-471;
        lr schedule medcat/utils/ml_utils.py:1-9).  Driver-side small-scale
        training only — order-dependent, not a distributed op."""
        if cui not in self.cui2context_vectors:
            self.cui2context_vectors[cui] = {}
        count = self.cui2count_train.get(cui, 0)
        if lr is None:
            lr = max(0.0005, 1.0 / (1.0 + count))
        b = -1.0 if negative else 1.0
        for ctx_type, vec in vectors.items():
            vec = np.asarray(vec, dtype=np.float32)
            old = self.cui2context_vectors[cui].get(ctx_type)
            if old is None:
                self.cui2context_vectors[cui][ctx_type] = b * vec
            else:
                self.cui2context_vectors[cui][ctx_type] = (
                    old * (1 - lr) + b * vec * lr)
        if not negative:
            self.cui2count_train[cui] = count + 1

    def get_name(self, cui: str) -> str:
        """Preferred name, else the longest name, else the CUI
        (reference /root/reference/medcat/cdb.py:125-145)."""
        if cui in self.cui2preferred_name and self.cui2preferred_name[cui]:
            return self.cui2preferred_name[cui]
        names = self.cui2names.get(cui)
        if names:
            longest = max(sorted(names), key=len)
            return longest.replace(self.config.separator, " ")
        return cui

    def reset_training(self) -> None:
        """Drop learned vectors/counts (reference ``CDB.reset_training``,
        /root/reference/medcat/cdb.py:192-201) — used by
        ``train(fine_tune=False)``."""
        self.cui2count_train = {}
        self.cui2context_vectors = {}
        self.name2count_train = {}
        self.cui2average_confidence = {}

    def import_training(self, other: "CDB", overwrite: bool = True) -> None:
        """Merge another CDB's learned context vectors into this one
        (reference ``CDB.import_training``, /root/reference/medcat/cdb.py:585-611):
        overwrite replaces, else averages; counts always add.  Only concepts
        already present here are touched — the shape of a distributed
        training merge (SURVEY.md J4)."""
        for cui, vectors in other.cui2context_vectors.items():
            if cui not in self.cui2names:
                continue
            mine = self.cui2context_vectors.setdefault(cui, {})
            for ctx_type, vec in vectors.items():
                vec = np.asarray(vec, dtype=np.float32)
                if overwrite or ctx_type not in mine:
                    mine[ctx_type] = vec.copy()
                else:
                    mine[ctx_type] = (mine[ctx_type] + vec) / 2
            self.cui2count_train[cui] = (
                self.cui2count_train.get(cui, 0)
                + other.cui2count_train.get(cui, 0))

    def update_cui2average_confidence(self, cui: str, new_sim: float) -> None:
        # Reference /root/reference/medcat/cdb.py:145-148 (running mean).
        cnt = self.cui2count_train.get(cui, 0)
        avg = self.cui2average_confidence.get(cui, 0.0)
        self.cui2average_confidence[cui] = (avg * cnt + new_sim) / max(1, cnt + 1)

    # -- subsetting (J3) ---------------------------------------------------

    def filter_by_cui(self, cuis_to_keep: Iterable[str]) -> None:
        """Semi-join closure subset (reference /root/reference/medcat/cdb.py:660-738):
        keep names of the kept CUIs, then all CUIs of those names."""
        cuis_to_keep = set(cuis_to_keep)
        names_to_keep: Set[str] = set()
        for cui in cuis_to_keep:
            names_to_keep.update(self.cui2names.get(cui, set()))
        all_cuis: Set[str] = set()
        for name in names_to_keep:
            all_cuis.update(self.name2cuis.get(name, []))
        self.name2cuis = {n: cs for n, cs in self.name2cuis.items()
                          if n in names_to_keep}
        self.name2cuis2status = {n: s for n, s in self.name2cuis2status.items()
                                 if n in names_to_keep}
        for attr in ("cui2names", "cui2snames", "cui2context_vectors",
                     "cui2count_train", "cui2type_ids", "cui2preferred_name",
                     "cui2average_confidence"):
            d = getattr(self, attr)
            setattr(self, attr, {c: v for c, v in d.items() if c in all_cuis})
        self.snames = set()
        for snames in self.cui2snames.values():
            self.snames |= snames

    # -- stats (A3) --------------------------------------------------------

    def stats(self) -> Dict[str, float]:
        """Reference ``CDB.print_stats`` counts (/root/reference/medcat/cdb.py:740-749)."""
        n_trained = len([c for c, n in self.cui2count_train.items() if n > 0])
        total_train = sum(self.cui2count_train.values())
        return {
            "n_concepts": len(self.cui2names),
            "n_names": len(self.name2cuis),
            "n_snames": len(self.snames),
            "n_concepts_trained": n_trained,
            "avg_train_per_trained": (total_train / n_trained) if n_trained else 0.0,
        }

    # -- serialization: Parquet artifact directory ------------------------

    def save(self, path: str) -> str:
        """Write the CDB as Parquet tables + meta.json; returns content hash.

        Layout (SURVEY.md §1.3): names(name, cui, status, is_upper, seq),
        concepts(cui, preferred_name, type_ids, count_train, avg_confidence),
        vectors(cui, ctx_type, vec), vocab(word, cnt).  ``seq`` preserves the
        candidate order of ``name2cuis`` lists (argmax tie-breaks depend on
        it — determinism requirement)."""
        os.makedirs(path, exist_ok=True)
        names_rows = {"name": [], "cui": [], "status": [], "is_upper": [],
                      "seq": []}
        for name, cuis in sorted(self.name2cuis.items()):
            for seq, cui in enumerate(cuis):
                names_rows["name"].append(name)
                names_rows["cui"].append(cui)
                names_rows["status"].append(self.name2cuis2status[name][cui])
                names_rows["is_upper"].append(bool(self.name_isupper.get(name, False)))
                names_rows["seq"].append(seq)
        pq.write_table(pa.table(names_rows), os.path.join(path, "names.parquet"))

        cuis = sorted(self.cui2names)
        concepts = pa.table({
            "cui": cuis,
            "preferred_name": [self.cui2preferred_name.get(c, "") for c in cuis],
            "type_ids": [sorted(self.cui2type_ids.get(c, set())) for c in cuis],
            "names": [sorted(self.cui2names.get(c, set())) for c in cuis],
            "count_train": [self.cui2count_train.get(c, 0) for c in cuis],
            "avg_confidence": [self.cui2average_confidence.get(c, 0.0) for c in cuis],
        })
        pq.write_table(concepts, os.path.join(path, "concepts.parquet"))

        vec_rows = {"cui": [], "ctx_type": [], "vec": []}
        for cui in sorted(self.cui2context_vectors):
            for ctx_type in sorted(self.cui2context_vectors[cui]):
                vec_rows["cui"].append(cui)
                vec_rows["ctx_type"].append(ctx_type)
                vec_rows["vec"].append(
                    np.asarray(self.cui2context_vectors[cui][ctx_type],
                               dtype=np.float32))
        pq.write_table(
            pa.table({"cui": pa.array(vec_rows["cui"]),
                      "ctx_type": pa.array(vec_rows["ctx_type"]),
                      "vec": pa.array([v.tolist() for v in vec_rows["vec"]],
                                      type=pa.list_(pa.float32()))}),
            os.path.join(path, "vectors.parquet"))

        words = sorted(self.vocab)
        pq.write_table(pa.table({"word": words,
                                 "cnt": [self.vocab[w] for w in words]}),
                       os.path.join(path, "vocab.parquet"))

        meta = {
            "format_version": 1,
            "name2count_train": self.name2count_train,
            "addl_info": {k: _jsonable(v) for k, v in self.addl_info.items()},
        }
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump(meta, fh, sort_keys=True)
        content_hash = self.content_hash()
        with open(os.path.join(path, "hash.txt"), "w") as fh:
            fh.write(content_hash)
        return content_hash

    @classmethod
    def load(cls, path: str, config: Optional[EngineConfig] = None) -> "CDB":
        cdb = cls(config)
        names = pq.read_table(os.path.join(path, "names.parquet"))
        order: Dict[str, List[Tuple[int, str]]] = {}
        for name, cui, status, is_upper, seq in zip(
                names["name"].to_pylist(), names["cui"].to_pylist(),
                names["status"].to_pylist(), names["is_upper"].to_pylist(),
                names["seq"].to_pylist()):
            order.setdefault(name, []).append((seq, cui))
            cdb.name2cuis2status.setdefault(name, {})[cui] = status
            cdb.name_isupper[name] = is_upper
        for name, pairs in order.items():
            cdb.name2cuis[name] = [c for _, c in sorted(pairs)]

        concepts = pq.read_table(os.path.join(path, "concepts.parquet"))
        sep = cdb.config.separator
        for i in range(concepts.num_rows):
            cui = concepts["cui"][i].as_py()
            cdb.cui2preferred_name[cui] = concepts["preferred_name"][i].as_py()
            if not cdb.cui2preferred_name[cui]:
                del cdb.cui2preferred_name[cui]
            cdb.cui2type_ids[cui] = set(concepts["type_ids"][i].as_py())
            names_set = set(concepts["names"][i].as_py())
            cdb.cui2names[cui] = names_set
            snames: Set[str] = set()
            for name in names_set:
                toks = name.split(sep)
                sname = ""
                for tok in toks:
                    sname = tok if not sname else sname + sep + tok
                    snames.add(sname)
            cdb.cui2snames[cui] = snames
            cdb.snames |= snames
            count_train = concepts["count_train"][i].as_py()
            if count_train:
                cdb.cui2count_train[cui] = count_train
            avg_conf = concepts["avg_confidence"][i].as_py()
            if avg_conf:
                cdb.cui2average_confidence[cui] = avg_conf

        vectors = pq.read_table(os.path.join(path, "vectors.parquet"))
        for i in range(vectors.num_rows):
            cui = vectors["cui"][i].as_py()
            ctx_type = vectors["ctx_type"][i].as_py()
            vec = np.asarray(vectors["vec"][i].as_py(), dtype=np.float32)
            cdb.cui2context_vectors.setdefault(cui, {})[ctx_type] = vec

        vocab = pq.read_table(os.path.join(path, "vocab.parquet"))
        cdb.vocab = dict(zip(vocab["word"].to_pylist(), vocab["cnt"].to_pylist()))

        with open(os.path.join(path, "meta.json")) as fh:
            meta = json.load(fh)
        cdb.name2count_train = meta.get("name2count_train", {})
        for key, val in meta.get("addl_info", {}).items():
            cdb.addl_info[key] = val
        return cdb

    def content_hash(self) -> str:
        """Deterministic model hash recorded in partition lineage
        (reference analogue: medcat/utils/hasher.py via medcat/cdb.py:894-922)."""
        h = hashlib.sha256()
        for name in sorted(self.name2cuis):
            h.update(name.encode())
            for cui in self.name2cuis[name]:
                h.update(cui.encode())
                h.update(self.name2cuis2status[name][cui].encode())
        for cui in sorted(self.cui2context_vectors):
            h.update(cui.encode())
            for ctx_type in sorted(self.cui2context_vectors[cui]):
                h.update(ctx_type.encode())
                h.update(self.cui2context_vectors[cui][ctx_type].tobytes())
        for cui in sorted(self.cui2count_train):
            h.update(f"{cui}:{self.cui2count_train[cui]}".encode())
        # output-affecting metadata: pretty_name, type_ids and the cui2group
        # canonicalization map all change annotate output — a hash that
        # misses them lets run_partitioned skip stale partitions
        for cui in sorted(self.cui2preferred_name):
            h.update(f"p:{cui}={self.cui2preferred_name[cui]}".encode())
        for cui in sorted(self.cui2type_ids):
            h.update(f"t:{cui}={sorted(self.cui2type_ids[cui])}".encode())
        h.update(json.dumps(_jsonable(self.addl_info),
                            sort_keys=True, default=str).encode())
        return h.hexdigest()[:16]


def _jsonable(d):
    if isinstance(d, dict):
        return {k: _jsonable(v) for k, v in d.items()}
    if isinstance(d, (set, frozenset)):
        return sorted(d)
    return d


def filter_cdb_by_icd10(cdb: "CDB") -> "CDB":
    """Subset a CDB to concepts carrying an ICD-10 mapping (reference
    ``helpers.filter_cdb_by_icd10``, /root/reference/medcat/utils/
    helpers.py:218-231 — the reference reads ``cui2info``; our addl_info
    key is ``cui2icd10``, same content)."""
    icd10 = cdb.addl_info.get("cui2icd10", {})
    cdb.filter_by_cui([cui for cui in cdb.cui2names if cui in icd10])
    return cdb
