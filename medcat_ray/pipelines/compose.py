"""Declarative pipeline composition — the Ray equivalent of the
reference's spaCy-style component registration surface
(``medcat/pipe.py:78-186``: ``add_tagger`` / ``add_ner`` / ``add_linker``
/ ``add_meta_cat`` / ``add_rel_cat`` / ``add_addl_ner`` over arbitrary
``Doc -> Doc`` callables, executed by the joblib ``PipeRunner``,
``medcat/pipeline/pipe_runner.py:14-103``).

Here a pipeline is an ordered list of STAGE SPECS, each compiling to one
``Dataset.map_batches`` call:

* stateless components (plain functions) become task-pool stages;
* stateful components (classes, models) become actor-pool stages with
  their own ``batch_size`` / ``concurrency`` / ``num_cpus`` — mirroring
  the reference's separate NN phase (``cat.py:1249-1277``) so a heavy
  meta/rel model never throttles the cheap extract stage;
* the tagger/normalizer/NER/linker chain is ONE fused stage
  (:class:`~medcat_ray.stages.annotate.AnnotateStage`) because in this
  engine those per-token steps share the tokenization — the reference
  runs them as separate spaCy pipe components only because spaCy forces
  that shape.

Usage::

    pipe = (RayPipe(models=(cdb, vocab), key_column="doc_id")
            .add_annotator(concurrency=4)
            .add_meta_cat(rules)
            .add_component(my_table_fn))        # arbitrary Table -> Table
    out = pipe.run(ds)                          # lazy Dataset, streams

``run`` never materializes: the composed plan is a single streaming
Dataset the caller consumes with ``write_parquet`` / ``iter_batches``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import ray.data as rd


class RayPipe:
    """Ordered, chainable stage list compiling to ``map_batches`` calls."""

    def __init__(self, models: Any = None, config: Any = None,
                 key_column: str = "url", text_column: str = "text",
                 keep_columns: Tuple[str, ...] = ("text",)) -> None:
        self.models = models
        self.config = config
        self.key_column = key_column
        self.text_column = text_column
        self.keep_columns = keep_columns
        self._specs: List[Tuple[Any, Dict[str, Any]]] = []

    # -- generic extension point (reference Pipe.add_* arbitrary
    # Doc->Doc callables; here: pa.Table -> pa.Table) -------------------

    def add_component(self, component: Any,
                      fn_constructor_kwargs: Optional[dict] = None,
                      batch_size: int = 256, concurrency: Any = None,
                      num_cpus: float = 1,
                      batch_format: str = "pyarrow") -> "RayPipe":
        """Register an arbitrary batch transform.  A CLASS becomes an
        actor-pool stage (state built once per actor in ``__init__``);
        a plain function becomes a task-pool stage."""
        kwargs: Dict[str, Any] = dict(batch_format=batch_format,
                                      batch_size=batch_size)
        if isinstance(component, type):
            kwargs["fn_constructor_kwargs"] = fn_constructor_kwargs or {}
            kwargs["concurrency"] = concurrency or 2
            kwargs["num_cpus"] = num_cpus
        elif concurrency is not None:
            kwargs["concurrency"] = concurrency
        self._specs.append((component, kwargs))
        return self

    # -- named components mirroring medcat/pipe.py:78-186 ----------------

    def add_annotator(self, batch_size: int = 128, concurrency: Any = 2,
                      num_cpus: float = 1) -> "RayPipe":
        """Tagger + normalizer + dictionary NER + linker as ONE fused
        actor stage (reference add_tagger/add_token_normalizer/add_ner/
        add_linker, pipe.py:78-145)."""
        from medcat_ray.stages.annotate import AnnotateStage
        if self.models is None:
            raise ValueError("RayPipe(models=...) required for "
                             "add_annotator")
        return self.add_component(
            AnnotateStage,
            fn_constructor_kwargs=dict(
                models=self.models, config=self.config,
                text_column=self.text_column, key_column=self.key_column,
                keep_columns=self.keep_columns),
            batch_size=batch_size, concurrency=concurrency,
            num_cpus=num_cpus)

    def add_meta_cat(self, rules: Optional[Sequence[Any]] = None,
                     batch_size: int = 128,
                     concurrency: Any = 2) -> "RayPipe":
        """Meta-annotation stage (reference add_meta_cat, pipe.py:147-160)
        — rule scorers or the numpy BiLSTM scorer both ride it."""
        from medcat_ray.stages.meta import MetaAnnotateStage
        return self.add_component(
            MetaAnnotateStage,
            fn_constructor_kwargs=dict(rules=rules,
                                       text_column=self.text_column),
            batch_size=batch_size, concurrency=concurrency)

    def add_rel_cat(self, model: Any, window: int = 300,
                    min_confidence: float = 0.0, batch_size: int = 128,
                    concurrency: Any = 2) -> "RayPipe":
        """Relation-scoring stage (reference add_rel_cat,
        pipe.py:162-173)."""
        import ray
        from medcat_ray.stages.rel_model import RelScoreStage
        model_ref = model if isinstance(model, str) else ray.put(model)
        return self.add_component(
            RelScoreStage,
            fn_constructor_kwargs=dict(
                model_ref=model_ref, window=window,
                key_column=self.key_column, text_column=self.text_column,
                min_confidence=min_confidence),
            batch_size=batch_size, concurrency=concurrency)

    def add_addl_ner(self, scorer: Any = None,
                     model_path: Optional[str] = None,
                     batch_size: int = 128,
                     concurrency: Any = 2) -> "RayPipe":
        """Additional transformer-NER stage (reference add_addl_ner,
        pipe.py:175-186)."""
        from medcat_ray.stages.transformers_ner import TransformersNERStage
        return self.add_component(
            TransformersNERStage,
            fn_constructor_kwargs=dict(model_path=model_path,
                                       scorer=scorer,
                                       text_column=self.text_column,
                                       key_column=self.key_column),
            batch_size=batch_size, concurrency=concurrency)

    # -- compile & run ----------------------------------------------------

    def run(self, ds: rd.Dataset) -> rd.Dataset:
        """Fold the registered stages into one lazy streaming plan."""
        if not self._specs:
            raise ValueError("RayPipe has no stages; add_* first")
        for component, kwargs in self._specs:
            ds = ds.map_batches(component, **kwargs)
        return ds

    __call__ = run
