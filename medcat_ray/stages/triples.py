"""Triple emission + dedup/count — the KG edge stream (SURVEY.md §2.3 T3,
§2.5 A5, §2.7 D5).

Candidate semantics follow the reference RelCAT candidate generator
(/root/reference/medcat/utils/relation_extraction/rel_dataset.py:380-474 and
window config /root/reference/medcat/config_rel_cat.py:22), reduced to the
dictionary-driven co-occurrence predicate (v0, FIXTURES.md F5):

* entities of one document ordered by start offset;
* ordered pairs (subj before obj), char distance ``obj.start - subj.start``
  ≤ ``relation_window_chars`` (300);
* pairs with identical surface text excluded (reference
  ``str(ent1).strip() != str(ent2).strip()``, rel_dataset.py:411);
* per-document dedup is implicit (each ordered start-pair occurs once —
  reference dedups on ``ent1_ent2_start``, rel_dataset.py:459-472).

Scale design: pair generation is a stateless ``map_batches`` over the
one-row-per-document annotate output (no shuffle), and corpus-level counting
pre-aggregates per batch (combiner) before the single
``groupby(subj,pred,obj)`` — the partial aggregation defuses head-CUI skew
because hot triples collapse to one row per batch before the exchange
(SURVEY.md §7.3).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def explode_entities(batch: pa.Table, key_column: str = "url") -> pa.Table:
    """Flatten (url, ents list<struct>) → one row per entity (FIXTURES.md F4).

    Vectorized: list lengths + list_flatten + struct field extraction; no
    Python per-row loop.
    """
    ents = batch["ents"]
    if isinstance(ents, pa.ChunkedArray):
        ents = ents.combine_chunks()
    lengths = pc.list_value_length(ents).fill_null(0).to_numpy(zero_copy_only=False)
    keys = batch[key_column].to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(ents)
    cols: Dict[str, pa.Array] = {
        key_column: pa.array(np.repeat(keys, lengths), type=pa.string()),
    }
    struct_type = flat.type
    for i in range(struct_type.num_fields):
        field = struct_type.field(i)
        cols[field.name] = pc.struct_field(flat, field.name)
    return pa.table(cols)


def _doc_pairs(starts: List[int], cuis: List[str], sources: List[str],
               window: int) -> List[Tuple[str, str, int, int]]:
    """Ordered co-occurrence pairs for one document (entities pre-sorted by
    start)."""
    pairs = []
    n = len(starts)
    for i in range(n):
        s_i = starts[i]
        src_i = sources[i]
        for j in range(i + 1, n):
            if starts[j] - s_i > window:
                break  # sorted by start → no later j can be in window
            if sources[j] == src_i:
                continue  # identical surface text excluded (rel_dataset.py:411)
            pairs.append((cuis[i], cuis[j], s_i, starts[j]))
    return pairs


def gen_triple_rows(batch: pa.Table, window: int = 300,
                    pred: str = "co_occurs_with",
                    key_column: str = "url") -> pa.Table:
    """Stateless map_batches UDF: annotate output → provenance triple rows
    (subj_cui, pred, obj_cui, url, subj_start, obj_start)."""
    ents_col = batch["ents"].to_pylist()
    keys = batch[key_column].to_pylist()
    subj, obj, urls, s_starts, o_starts = [], [], [], [], []
    for key, ents in zip(keys, ents_col):
        if not ents or len(ents) < 2:
            continue
        starts = [e["start"] for e in ents]
        cuis = [e["cui"] for e in ents]
        sources = [e["source_value"] for e in ents]
        for s_cui, o_cui, s_st, o_st in _doc_pairs(starts, cuis, sources, window):
            subj.append(s_cui)
            obj.append(o_cui)
            urls.append(key)
            s_starts.append(s_st)
            o_starts.append(o_st)
    return pa.table({
        "subj_cui": pa.array(subj, type=pa.string()),
        "pred": pa.array([pred] * len(subj), type=pa.string()),
        "obj_cui": pa.array(obj, type=pa.string()),
        "url": pa.array(urls, type=pa.string()),
        "subj_start": pa.array(s_starts, type=pa.int32()),
        "obj_start": pa.array(o_starts, type=pa.int32()),
    })


def partial_triple_counts(batch: pa.Table, window: int = 300,
                          pred: str = "co_occurs_with",
                          key_column: str = "url") -> pa.Table:
    """Combiner: per-batch partial counts of (subj, pred, obj).

    Emits one row per distinct triple per batch — the pre-aggregation that
    makes the following global groupby cheap and skew-proof (SURVEY.md §7.3:
    hot triples collapse before the shuffle)."""
    ents_col = batch["ents"].to_pylist()
    counts: Dict[Tuple[str, str], int] = {}
    for ents in ents_col:
        if not ents or len(ents) < 2:
            continue
        starts = [e["start"] for e in ents]
        cuis = [e["cui"] for e in ents]
        sources = [e["source_value"] for e in ents]
        for s_cui, o_cui, _, _ in _doc_pairs(starts, cuis, sources, window):
            key = (s_cui, o_cui)
            counts[key] = counts.get(key, 0) + 1
    keys = sorted(counts)
    return pa.table({
        "subj_cui": pa.array([k[0] for k in keys], type=pa.string()),
        "pred": pa.array([pred] * len(keys), type=pa.string()),
        "obj_cui": pa.array([k[1] for k in keys], type=pa.string()),
        "n": pa.array([counts[k] for k in keys], type=pa.int64()),
    })
