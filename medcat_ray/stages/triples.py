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
        key_column: pa.array(np.repeat(keys, lengths),
                             type=batch[key_column].type),
    }
    struct_type = flat.type
    for i in range(struct_type.num_fields):
        field = struct_type.field(i)
        cols[field.name] = pc.struct_field(flat, field.name)
    return pa.table(cols)


def _doc_pairs(starts: List[int], cuis: List[str], sources: List[str],
               window: int) -> List[Tuple[str, str, int, int]]:
    """Ordered co-occurrence pairs for one document (entities pre-sorted by
    start).  Reference semantics; kept as the readable oracle used by unit
    tests — the hot path below is the vectorized equivalent."""
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


# triu index cache for SMALL documents only: n ≤ 128 bounds it to ≤127
# entries × ≤8k pairs ≈ 4 MB total (the round-1 cache was unbounded O(n²))
_TRIU_MAX_N = 128
_TRIU_CACHE: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}


def _batch_pair_indices(batch: pa.Table, window: int):
    """Vectorized pair generation for a whole batch.

    Returns (I, J, flat) where I/J index into the flattened entity arrays of
    the batch and ``flat`` is the flattened ents StructArray.  The index
    math lives in :func:`_pair_indices_arrays` (shared with the deep-fused
    count stage)."""
    ents = batch["ents"]
    if isinstance(ents, pa.ChunkedArray):
        ents = ents.combine_chunks()
    lengths = pc.list_value_length(ents).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(ents)
    starts = pc.struct_field(flat, "start").to_numpy(zero_copy_only=False)
    # dictionary-encode surface strings once per batch → int compare
    src_idx = pc.dictionary_encode(pc.struct_field(flat, "source_value")) \
        .indices.to_numpy(zero_copy_only=False)
    I, J = _pair_indices_arrays(lengths, starts, src_idx, window)
    return I, J, flat


def _pair_indices_arrays(lengths: np.ndarray, starts: np.ndarray,
                         src_idx: np.ndarray, window: int):
    """Window-bounded ordered-pair indices over per-doc entity runs.

    ``lengths[d]`` entities per document, ``starts``/``src_idx`` flattened
    and start-sorted within each document.  Small docs (n ≤ 128) take a
    cached-triu mask (fastest when the char window covers most pairs —
    measured 2× vs the range walk); large docs take the window-bounded
    path — each subject's objects are the ``searchsorted`` range
    (i, hi_i], materialized with a repeat/cumsum trick: O(pairs in
    window), not O(n²), with no unbounded cache."""
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    out_i: List[np.ndarray] = []
    out_j: List[np.ndarray] = []
    for d in range(len(lengths)):
        n = int(lengths[d])
        if n < 2:
            continue
        o = offsets[d]
        s = starts[o:o + n]
        src = src_idx[o:o + n]
        if n <= _TRIU_MAX_N:
            cached = _TRIU_CACHE.get(n)
            if cached is None:
                cached = _TRIU_CACHE[n] = np.triu_indices(n, 1)
            ti, tj = cached
            mask = (s[tj] - s[ti] <= window) & (src[ti] != src[tj])
        else:
            # per-subject window bound: objects are (i, hi[i])
            hi = np.searchsorted(s, s + window, side="right")
            counts = hi - np.arange(1, n + 1)
            np.clip(counts, 0, None, out=counts)
            total = int(counts.sum())
            if total == 0:
                continue
            ti = np.repeat(np.arange(n), counts)
            seg_start = np.arange(1, n + 1)  # first object per subject
            csum = np.concatenate(([0], np.cumsum(counts[:-1])))
            tj = np.arange(total) - np.repeat(csum, counts) \
                + np.repeat(seg_start, counts)
            mask = src[ti] != src[tj]
        if mask.any():
            out_i.append(o + ti[mask])
            out_j.append(o + tj[mask])
    if not out_i:
        empty = np.array([], dtype=np.int64)
        return empty, empty
    return np.concatenate(out_i), np.concatenate(out_j)


def partial_counts_from_arrays(lengths: np.ndarray, starts: np.ndarray,
                               cui_idx: np.ndarray, cui_values: List[str],
                               src_idx: np.ndarray, window: int,
                               pred: str) -> pa.Table:
    """Deep-fused combiner: partial (subj, pred, obj) counts straight from
    integer-coded per-doc entity arrays — no Arrow ents column is ever
    built (the AnnotateCountStage fast path).  Same pair semantics as
    :func:`partial_triple_counts` (shared :func:`_pair_indices_arrays`
    core + identical bincount keying)."""
    I, J = _pair_indices_arrays(lengths, starts, src_idx, window)
    if len(I) == 0:
        return pa.table({"subj_cui": pa.array([], type=pa.string()),
                         "pred": pa.array([], type=pa.string()),
                         "obj_cui": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    K = len(cui_values)
    cui_idx = cui_idx.astype(np.int64, copy=False)
    pair_keys = cui_idx[I] * K + cui_idx[J]
    uniq, counts = np.unique(pair_keys, return_counts=True)
    cui_arr = pa.array(cui_values, type=pa.string())
    return pa.table({
        "subj_cui": cui_arr.take(pa.array(uniq // K)),
        "pred": pa.array([pred] * len(uniq), type=pa.string()),
        "obj_cui": cui_arr.take(pa.array(uniq % K)),
        "n": pa.array(counts, type=pa.int64()),
    })


def _type_membership(flat, types_needed) -> Dict[str, np.ndarray]:
    """Per-entity bool mask "has type t" for each needed type id, from the
    ``type_ids`` list column — vectorized (flatten + repeat owner index)."""
    tl = pc.struct_field(flat, "type_ids")
    n = len(tl)
    lengths = pc.list_value_length(tl).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    owner = np.repeat(np.arange(n, dtype=np.int64), lengths)
    ft = np.asarray(pc.list_flatten(tl).to_pylist(), dtype=object)
    masks: Dict[str, np.ndarray] = {}
    for t in types_needed:
        m = np.zeros(n, dtype=bool)
        if len(ft):
            m[owner[ft == t]] = True
        masks[t] = m
    return masks


def apply_type_rules(I: np.ndarray, J: np.ndarray, flat,
                     type_filter_pairs=None, typed_preds=None,
                     default_pred: str = "co_occurs_with"):
    """RelCAT type semantics (reference
    /root/reference/medcat/utils/relation_extraction/rel_dataset.py:425-440):
    keep a pair iff some (t1, t2) rule matches (subj has t1, obj has t2);
    ``typed_preds`` additionally maps the FIRST matching rule to a predicate
    label (our typed-KG extension of the reference's filter).

    Returns (I, J, preds) with preds a list aligned to the kept pairs."""
    rules = list(typed_preds.items()) if typed_preds else \
        [(p, None) for p in (type_filter_pairs or [])]
    if not rules:
        return I, J, [default_pred] * len(I)
    types_needed = {t for (t1, t2), _ in
                    [((r[0][0], r[0][1]), r[1]) for r in rules]
                    for t in (t1, t2)}
    masks = _type_membership(flat, types_needed)
    keep = np.zeros(len(I), dtype=bool)
    pred_out = np.full(len(I), None, dtype=object)
    for (t1, t2), label in rules:
        m = masks[t1][I] & masks[t2][J] & ~keep
        keep |= masks[t1][I] & masks[t2][J]
        pred_out[m] = label if label is not None else default_pred
    if type_filter_pairs is not None or typed_preds is not None:
        I, J, pred_out = I[keep], J[keep], pred_out[keep]
    return I, J, pred_out.tolist()


def gen_triple_rows(batch: pa.Table, window: int = 300,
                    pred: str = "co_occurs_with",
                    key_column: str = "url",
                    type_filter_pairs=None,
                    typed_preds=None) -> pa.Table:
    """Stateless map_batches UDF: annotate output → provenance triple rows
    (subj_cui, pred, obj_cui, url, subj_start, obj_start)."""
    I, J, flat = _batch_pair_indices(batch, window)
    if type_filter_pairs or typed_preds:
        I, J, preds = apply_type_rules(I, J, flat, type_filter_pairs,
                                       typed_preds, pred)
        I = np.asarray(I, dtype=np.int64)
        J = np.asarray(J, dtype=np.int64)
    else:
        preds = None
    n_pairs = len(I)
    cui = pc.struct_field(flat, "cui")
    starts = pc.struct_field(flat, "start")
    # map pair indices back to their document's key: searchsorted on offsets
    ents = batch["ents"]
    if isinstance(ents, pa.ChunkedArray):
        ents = ents.combine_chunks()
    lengths = pc.list_value_length(ents).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.cumsum(lengths)
    doc_of_pair = np.searchsorted(offsets, I, side="right")
    keys = batch[key_column].combine_chunks() \
        if isinstance(batch[key_column], pa.ChunkedArray) else batch[key_column]
    return pa.table({
        "subj_cui": pc.take(cui, pa.array(I)),
        "pred": pa.array(preds if preds is not None else [pred] * n_pairs,
                         type=pa.string()),
        "obj_cui": pc.take(cui, pa.array(J)),
        key_column: pc.take(keys, pa.array(doc_of_pair)),
        "subj_start": pc.take(starts, pa.array(I)),
        "obj_start": pc.take(starts, pa.array(J)),
    })


def partial_triple_counts(batch: pa.Table, window: int = 300,
                          pred: str = "co_occurs_with",
                          key_column: str = "url") -> pa.Table:
    """Combiner: per-batch partial counts of (subj, pred, obj).

    Emits one row per distinct triple per batch — the pre-aggregation that
    makes the following global groupby cheap and skew-proof (SURVEY.md §7.3:
    hot triples collapse before the shuffle)."""
    I, J, flat = _batch_pair_indices(batch, window)
    if len(I) == 0:
        return pa.table({"subj_cui": pa.array([], type=pa.string()),
                         "pred": pa.array([], type=pa.string()),
                         "obj_cui": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    # dictionary-encode CUIs once → pair key = subj_id * K + obj_id → bincount
    cui_dict = pc.dictionary_encode(pc.struct_field(flat, "cui"))
    cui_idx = cui_dict.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    cui_vals = cui_dict.dictionary
    K = len(cui_vals)
    pair_keys = cui_idx[I] * K + cui_idx[J]
    uniq, counts = np.unique(pair_keys, return_counts=True)
    subj_ids = (uniq // K).astype(np.int64)
    obj_ids = (uniq % K).astype(np.int64)
    return pa.table({
        "subj_cui": pc.take(cui_vals, pa.array(subj_ids)),
        "pred": pa.array([pred] * len(uniq), type=pa.string()),
        "obj_cui": pc.take(cui_vals, pa.array(obj_ids)),
        "n": pa.array(counts, type=pa.int64()),
    })


def combine_partial_counts(batch: pa.Table) -> pa.Table:
    """Merge partial-count rows: group (subj,pred,obj) and sum n — one level
    of a tree reduction (pure Arrow group_by, no shuffle)."""
    if batch.num_rows == 0:
        return batch
    g = batch.group_by(["subj_cui", "pred", "obj_cui"]).aggregate([("n", "sum")])
    return g.rename_columns(["subj_cui", "pred", "obj_cui", "n"])
