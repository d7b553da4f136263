"""Annotate stage — the T1 actor-pool stage (SURVEY.md §2.3).

``AnnotateStage`` is a callable CLASS for
``Dataset.map_batches(AnnotateStage, fn_constructor_kwargs=..., concurrency=N,
batch_format="pyarrow")``: the CDB + Vocab load happens ONCE per actor in
``__init__`` (the reference loads them per forked process,
/root/reference/medcat/cat.py:1642-1690), and ``__call__`` annotates one
Arrow batch of pages.

Output keeps one row per document with an ``ents`` list<struct> column so
that downstream pair generation never sees a document split across batch
boundaries (SURVEY.md §3.4).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import pyarrow as pa
import pyarrow.compute as pc

from medcat_ray.config import EngineConfig
from medcat_ray.core.annotator import DocAnnotator
from medcat_ray.functions.html import extract_text
from medcat_ray.state.cdb import CDB
from medcat_ray.state.vocab import Vocab

def tune_actor_gc() -> None:
    """CPython GC tuning for a long-lived model-holding actor.

    The loaded CDB is a graph of millions of dicts/sets/strings that stays
    alive for the actor's whole life, yet every full collection re-scans
    it; with per-doc Token/Entity churn triggering frequent collections,
    GC measured ~30% of annotate wall time.  ``gc.freeze()`` moves the
    loaded graph to the permanent generation (never re-scanned) and the
    raised thresholds make the remaining young-gen passes rare.  Cyclic
    garbage is still collected — just infrequently; per-doc objects are
    acyclic and die by refcount.  Call at the END of an actor
    ``__init__``, after all heavy state is built.
    """
    import gc
    gc.collect()
    gc.freeze()
    gc.set_threshold(100_000, 50, 50)


ENTITY_TYPE = pa.struct([
    ("ent_id", pa.int32()),
    ("cui", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("source_value", pa.string()),
    ("detected_name", pa.string()),
    ("context_similarity", pa.float32()),
    ("type_ids", pa.list_(pa.string())),
    ("pretty_name", pa.string()),
])

ENTS_LIST_TYPE = pa.list_(ENTITY_TYPE)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Stateless M16+M1 stage: html binary → extracted text.

    Drops the (large) ``html`` column from the stream so only text flows to
    the annotate stage.  Per-row failures yield empty text rather than
    failing the block (reference per-doc try/except, medcat/cat.py:1683-1686).
    """
    htmls = batch["html"]
    texts = pa.array((extract_text(h) for h in htmls.to_pylist()),
                     type=pa.string())
    cols = {name: batch[name] for name in batch.column_names if name != "html"}
    cols["text"] = texts
    return pa.table(cols)


class AnnotateStage:
    """Actor: dictionary NER + context linking over Arrow batches of pages.

    ``models`` may be a ``ray.ObjectRef`` to a ``(CDB, Vocab)`` tuple
    (broadcast once with ``ray.put`` — zero re-ship per batch), a plain
    tuple (local/unit-test use), or a path to an artifact directory
    (``<path>/cdb`` + ``<path>/vocab``) for load-from-disk workers.
    """

    def __init__(self, models: Union[Tuple[CDB, Vocab], str, "object"],
                 config: Optional[EngineConfig] = None,
                 text_column: str = "text", key_column: str = "url",
                 keep_columns: Tuple[str, ...] = ()) -> None:
        import ray
        if isinstance(models, ray.ObjectRef):
            cdb, vocab = ray.get(models)
        elif isinstance(models, str):
            import os
            cdb = CDB.load(os.path.join(models, "cdb"), config)
            vocab = Vocab.load(os.path.join(models, "vocab"))
        else:
            cdb, vocab = models
        self.annotator = DocAnnotator(cdb, vocab, config)
        self.text_column = text_column
        self.key_column = key_column
        self.keep_columns = keep_columns
        tune_actor_gc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        ents_col = []
        n_ents = []
        errors = []
        annotate = self.annotator.annotate
        for text in texts:
            try:
                ents = annotate(text) if text else []
                ents_col.append(ents)
                n_ents.append(len(ents))
                errors.append(None)
            except Exception as exc:  # poison row → null ents, not a dead block
                ents_col.append([])
                n_ents.append(0)
                errors.append(f"{type(exc).__name__}: {exc}")
        cols = {self.key_column: batch[self.key_column]}
        for name in self.keep_columns:
            if name in batch.column_names:
                cols[name] = batch[name]
        cols["n_ents"] = pa.array(n_ents, type=pa.int32())
        cols["ents"] = pa.array(ents_col, type=ENTS_LIST_TYPE)
        cols["error"] = pa.array(errors, type=pa.string())
        return pa.table(cols)


class AnnotateCountStage(AnnotateStage):
    """Fully-fused KG stage: extract_text → annotate → per-batch partial
    triple counts, all inside one actor call.

    Scale rationale: the intermediate entity stream (list<struct> per doc,
    ~1.3 KB/doc) never enters the object store — the actor emits only one
    row per distinct triple per batch.  On IPC-constrained hosts this
    removes the single largest inter-stage transfer of the pipeline; the
    cost is losing the reusable ``ents`` stream, so use this for
    count-only jobs and the unfused stages when entities/triples are also
    materialized.
    """

    def __init__(self, models, config=None, window: int = 300,
                 pred: str = "co_occurs_with", text_column: str = "text",
                 key_column: str = "url", do_extract: bool = True) -> None:
        super().__init__(models, config, text_column, key_column)
        self.window = window
        self.pred = pred
        self.do_extract = do_extract

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        from medcat_ray.stages.triples import partial_counts_from_arrays
        if self.do_extract and "html" in batch.column_names:
            batch = extract_text_batch(batch)
        texts = batch[self.text_column].to_pylist()
        ann = self.annotator.annotate_spans
        # integer-code cuis and surface strings batch-locally as they
        # stream in; no Arrow ents column, no per-entity dicts
        cui_code: dict = {}
        src_code: dict = {}
        cui_values: list = []
        lengths = np.empty(len(texts), dtype=np.int64)
        starts_all: list = []
        cui_all: list = []
        src_all: list = []
        for d, text in enumerate(texts):
            try:
                starts, cuis, sources = ann(text) if text else ([], [], [])
            except Exception:   # poison row → no pairs, not a dead block
                starts, cuis, sources = [], [], []
            lengths[d] = len(starts)
            starts_all.extend(starts)
            for c in cuis:
                code = cui_code.get(c)
                if code is None:
                    code = cui_code[c] = len(cui_code)
                    cui_values.append(c)
                cui_all.append(code)
            for s in sources:
                code = src_code.get(s)
                if code is None:
                    code = src_code[s] = len(src_code)
                src_all.append(code)
        return partial_counts_from_arrays(
            lengths,
            np.asarray(starts_all, dtype=np.int64),
            np.asarray(cui_all, dtype=np.int64), cui_values,
            np.asarray(src_all, dtype=np.int64),
            self.window, self.pred)
