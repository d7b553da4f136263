"""Distributed, order-free unsupervised training (SURVEY.md T5, A2, J4).

The reference's EMA update (/root/reference/medcat/cdb.py:406-471) is
order-dependent (lr = 1/(count+1) over a running count), so it cannot be
parallelised bit-exactly (SURVEY.md §7.4).  The Ray-native analogue here is
order-FREE: the context vector of a CUI is the MEAN of the context vectors
of all its trainable mentions across the corpus — the fixed point the EMA
random-walks around.  Gating of which mentions train which CUI is identical
to the reference's Linker train branch
(/root/reference/medcat/linking/context_based_linker.py:62-88).

Scale shape: the actor stage emits per-batch PARTIAL sums keyed
(cui, ctx_type) — one row per distinct key per batch, never per mention —
and the final combine folds those partials.  The distinct-key space is
bounded by |CDB| × 4 context sizes (model-sized, not corpus-sized), so the
combine is a driver-side numpy fold; no shuffle of mention-level data ever
happens.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from medcat_ray.config import EngineConfig
from medcat_ray.state.cdb import CDB
from medcat_ray.state.vocab import Vocab


class ContextPartialStage:
    """Actor: per batch, sum context vectors of trainable mentions per
    (cui, ctx_type).  Model load once per actor (T1 pattern)."""

    def __init__(self, models, config: Optional[EngineConfig] = None,
                 text_column: str = "text") -> None:
        if isinstance(models, ray.ObjectRef):
            cdb, vocab = ray.get(models)
        else:
            cdb, vocab = models
        from medcat_ray.core.annotator import DocAnnotator
        self.cdb = cdb
        self.vocab = vocab
        self.config = config or cdb.config
        self.annotator = DocAnnotator(cdb, vocab, self.config)
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from medcat_ray.core.annotator import _DocContext
        from medcat_ray.functions.text import process_text
        cfg = self.config
        cdb = self.cdb
        sums: Dict[Tuple[str, str], np.ndarray] = {}
        counts: Dict[Tuple[str, str], int] = {}
        for text in batch[self.text_column].to_pylist():
            if not text:
                continue
            text = str(text).strip()[: cfg.max_document_length]
            toks = process_text(text, cfg, self.annotator.spell_checker,
                                self.annotator.stopwords)
            ents = self.annotator._ner(toks)
            if not ents:
                continue
            ctx = _DocContext(toks, self.vocab, cfg)
            for ent in ents:
                name = ent.detected_name
                cuis = ent.link_candidates
                if len(name) < cfg.disamb_length_limit:
                    continue
                statuses = cdb.name2cuis2status.get(name, {})
                if len(cuis) == 1:
                    train_cuis = [cuis[0]] if statuses.get(cuis[0], "") != "N" else []
                else:
                    train_cuis = [c for c in cuis
                                  if statuses.get(c, "") in ("P", "PD")]
                if not train_cuis:
                    continue
                vectors = ctx.vectors_for(ent)
                for cui in train_cuis:
                    for ctx_type, vec in vectors.items():
                        key = (cui, ctx_type)
                        if key in sums:
                            sums[key] += vec
                            counts[key] += 1
                        else:
                            sums[key] = vec.astype(np.float64, copy=True)
                            counts[key] = 1
        keys = sorted(sums)
        return pa.table({
            "cui": pa.array([k[0] for k in keys], pa.string()),
            "ctx_type": pa.array([k[1] for k in keys], pa.string()),
            "vec_sum": pa.array([sums[k].tolist() for k in keys],
                                pa.list_(pa.float64())),
            "n": pa.array([counts[k] for k in keys], pa.int64()),
        })


def train_unsupervised_distributed(
        docs: rd.Dataset,
        models: Union["ray.ObjectRef", Tuple[CDB, Vocab]],
        config: Optional[EngineConfig] = None,
        concurrency: Union[int, Tuple[int, int]] = 4,
        batch_size: int = 256,
        text_column: str = "text") -> Dict[str, dict]:
    """Stream the corpus through :class:`ContextPartialStage`, fold the
    partials, and return ``{cui: {"vectors": {ctx_type: mean_vec},
    "count": n_mentions}}`` — install with :func:`apply_training`."""
    partials = docs.map_batches(
        ContextPartialStage,
        fn_constructor_kwargs=dict(models=models, config=config,
                                   text_column=text_column),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
    pdf = partials.to_pandas()

    agg_sum: Dict[Tuple[str, str], np.ndarray] = {}
    agg_n: Dict[Tuple[str, str], int] = {}
    for cui, ctx_type, vec_sum, n in zip(pdf["cui"], pdf["ctx_type"],
                                         pdf["vec_sum"], pdf["n"]):
        key = (cui, ctx_type)
        v = np.asarray(vec_sum, dtype=np.float64)
        if key in agg_sum:
            agg_sum[key] += v
            agg_n[key] += int(n)
        else:
            agg_sum[key] = v
            agg_n[key] = int(n)

    result: Dict[str, dict] = {}
    for (cui, ctx_type), vec in agg_sum.items():
        entry = result.setdefault(cui, {"vectors": {}, "count": 0})
        entry["vectors"][ctx_type] = (vec / agg_n[(cui, ctx_type)]).astype(
            np.float32)
        entry["count"] = max(entry["count"], agg_n[(cui, ctx_type)])
    return result


def apply_training(cdb: CDB, result: Dict[str, dict]) -> CDB:
    """Install distributed-training means into a CDB (reference analogue:
    ``CDB.import_training``, /root/reference/medcat/cdb.py:585-611)."""
    for cui, entry in result.items():
        cdb.set_context_vectors(cui, entry["vectors"],
                                count_train=entry["count"])
    return cdb
