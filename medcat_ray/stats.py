"""Evaluation harness: per-CUI and global precision/recall/F1 of a
predicted entity table against a gold table, plus CDB vector top-k.

Reference semantics: exact ``(doc, start, cui)`` matching classifies
TP/FP/FN (/root/reference/medcat/stats/stats.py:102-146); counters fold per
CUI and globally (stats.py:42-248, SURVEY.md §2.5 A1, §2.4 J5).

Distributed shape: both tables are tagged and unioned, one groupby on the
match key classifies each occurrence, a second (tiny, per-CUI) groupby
folds counters.  No driver-side loops over rows.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from medcat_ray.ops.numeric import round_half_away
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Sum


def prf_per_cui(pred: rd.Dataset, gold: rd.Dataset,
                doc_col: str = "doc_id", start_col: str = "start_pos",
                cui_col: str = "cui") -> pd.DataFrame:
    """Per-CUI (tp, fp, fn, prec, rec, f1) via exact (doc, start, cui) match."""

    def tag(flag: str):
        def _tag(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                doc_col: batch[doc_col],
                start_col: batch[start_col],
                cui_col: batch[cui_col],
                "in_pred": pa.array([1 if flag == "pred" else 0] * n,
                                    type=pa.int64()),
                "in_gold": pa.array([1 if flag == "gold" else 0] * n,
                                    type=pa.int64()),
            })
        return _tag

    both = pred.map_batches(tag("pred"), batch_format="pyarrow").union(
        gold.map_batches(tag("gold"), batch_format="pyarrow"))
    matched = both.groupby([cui_col, doc_col, start_col]).aggregate(
        Sum("in_pred", alias_name="p"), Sum("in_gold", alias_name="g"))

    def classify(batch: pa.Table) -> pa.Table:
        p = batch["p"].to_numpy(zero_copy_only=False)
        g = batch["g"].to_numpy(zero_copy_only=False)
        tp = ((p > 0) & (g > 0)).astype("int64")
        fp = ((p > 0) & (g == 0)).astype("int64")
        fn = ((p == 0) & (g > 0)).astype("int64")
        return pa.table({cui_col: batch[cui_col],
                         "tp": pa.array(tp), "fp": pa.array(fp),
                         "fn": pa.array(fn)})

    counts = matched.map_batches(classify, batch_format="pyarrow") \
        .groupby(cui_col).aggregate(
            Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"),
            Sum("fn", alias_name="fn")).to_pandas()
    tp, fp, fn = counts["tp"], counts["fp"], counts["fn"]
    counts["prec"] = round_half_away(tp / (tp + fp).clip(lower=1), 6)
    counts["rec"] = round_half_away(tp / (tp + fn).clip(lower=1), 6)
    denom = (2 * tp + fp + fn).clip(lower=1)
    counts["f1"] = round_half_away(2 * tp / denom, 6)
    return counts.sort_values(cui_col).reset_index(drop=True)


def prf_global(per_cui: pd.DataFrame) -> dict:
    tp, fp, fn = (int(per_cui["tp"].sum()), int(per_cui["fp"].sum()),
                  int(per_cui["fn"].sum()))
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    f1 = 2 * tp / max(1, 2 * tp + fp + fn)
    return {"tp": tp, "fp": fp, "fn": fn, "precision": round(prec, 6),
            "recall": round(rec, 6), "f1": round(f1, 6)}


def merge_fold_stats(folds: Sequence[pd.DataFrame]) -> pd.DataFrame:
    """K-fold metrics merge (SURVEY.md A6; reference
    /root/reference/medcat/stats/kfold.py:137-480): per-fold per-CUI
    (tp, fp, fn) frames summed, then P/R/F1 recomputed over the totals —
    identical to the reference folding of per-fold counters into overall
    metrics."""
    if not folds:
        return pd.DataFrame(columns=["cui", "tp", "fp", "fn",
                                     "prec", "rec", "f1"])
    merged = pd.concat([f[["cui", "tp", "fp", "fn"]] for f in folds]) \
        .groupby("cui", as_index=False).sum()
    tp, fp, fn = merged["tp"], merged["fp"], merged["fn"]
    merged["prec"] = round_half_away(tp / (tp + fp).clip(lower=1), 6)
    merged["rec"] = round_half_away(tp / (tp + fn).clip(lower=1), 6)
    merged["f1"] = round_half_away(2 * tp / (2 * tp + fp + fn).clip(lower=1), 6)
    return merged.sort_values("cui").reset_index(drop=True)


def top_errors(per_cui: pd.DataFrame, kind: str = "fp",
               n: int = 10) -> pd.DataFrame:
    """FP/FN leaderboards (SURVEY.md O4; reference
    /root/reference/medcat/stats/stats.py:207-228): sort counters desc,
    take the top n."""
    return per_cui.sort_values([kind, "cui"], ascending=[False, True]) \
        .head(n).reset_index(drop=True)


def most_similar(cdb, cui: str, ctx_type: str = "medium",
                 topn: int = 10) -> List[Tuple[str, float]]:
    """Brute-force cosine of one CUI's context vector against all others
    (reference ``CDB.most_similar``, /root/reference/medcat/cdb.py:760-850).
    Model-sized → driver numpy; at corpus scale this is
    ``ops.similarity.knn_bruteforce`` over a vectors Dataset."""
    if cui not in cdb.cui2context_vectors or \
            ctx_type not in cdb.cui2context_vectors[cui]:
        return []
    cuis = sorted(c for c in cdb.cui2context_vectors
                  if ctx_type in cdb.cui2context_vectors[c])
    M = np.stack([cdb.cui2context_vectors[c][ctx_type] for c in cuis]).astype(np.float64)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    U = M / norms[:, None]
    q = U[cuis.index(cui)]
    sims = U @ q
    order = sorted(range(len(cuis)), key=lambda i: (-sims[i], cuis[i]))
    out = [(cuis[i], round(float(sims[i]), 6)) for i in order
           if cuis[i] != cui][:topn]
    return out
