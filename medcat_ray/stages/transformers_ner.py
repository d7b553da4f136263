"""TransformersNER additional-NER stage (SURVEY.md T4) — gated stub.

The reference wraps a HuggingFace token-classification model
(/root/reference/medcat/ner/transformers_ner.py) as another pipe component;
notably its multiprocessing path FORBIDS addl NER
(/root/reference/medcat/cat.py:1370-1372) — in Ray Data it is just another
actor-pool ``map_batches`` stage with its own batch size and ``num_gpus``.

torch/transformers are not installed in this container, so the HF model
load raises a clearly-marked ``NotImplementedError`` unless a ``scorer``
callable is injected.  Two REAL scorers exist:
:class:`medcat_ray.stages.bert.BertNERScorer` (numpy BERT
token-classification forward over exported HF weights — the reference
eval path, torch-free) and
:class:`medcat_ray.stages.ner_model.LearnedNERModel` (trainable BIO
tagger).  The Ray-side plumbing — actor signature, Arrow schema,
batching, output layout matching
:data:`medcat_ray.stages.annotate.ENTITY_TYPE` — is real and tested.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple, Union

import pyarrow as pa

from medcat_ray.stages.annotate import tune_actor_gc, ENTS_LIST_TYPE


class TransformersNERStage:
    """Actor: model-based NER producing the same ``ents`` schema as the
    dictionary stage, so downstream linking/triple stages are agnostic to
    which NER produced the mentions.

    ``scorer(texts) -> List[List[dict]]`` returns per-text entity dicts
    with keys (start, end, cui, source_value, context_similarity).
    """

    def __init__(self, model_path: Optional[str] = None,
                 scorer: Optional[Callable[[List[str]], List[List[dict]]]] = None,
                 text_column: str = "text", key_column: str = "url") -> None:
        if scorer is not None:
            self.scorer = scorer
        else:
            try:
                import transformers  # noqa: F401
                import torch  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "TransformersNERStage needs torch+transformers (not in "
                    "this container) or an injected `scorer` callable; see "
                    "module docstring.") from exc
            raise NotImplementedError(
                "real HF model loading not implemented in this build")
        self.text_column = text_column
        self.key_column = key_column
        tune_actor_gc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        per_text = self.scorer([t or "" for t in texts])
        ents_col = []
        for ents in per_text:
            ents_col.append([{
                "ent_id": i,
                "cui": e["cui"],
                "start": int(e["start"]),
                "end": int(e["end"]),
                "source_value": e.get("source_value", ""),
                "detected_name": e.get("detected_name",
                                       e.get("source_value", "")),
                "context_similarity": float(e.get("context_similarity", 1.0)),
                "type_ids": list(e.get("type_ids", [])),
                "pretty_name": e.get("pretty_name", ""),
            } for i, e in enumerate(ents)])
        return pa.table({
            self.key_column: batch[self.key_column],
            "n_ents": pa.array([len(e) for e in ents_col], pa.int32()),
            "ents": pa.array(ents_col, type=ENTS_LIST_TYPE),
            "error": pa.array([None] * batch.num_rows, pa.string()),
        })


def addl_ner(docs, scorer=None, model_path: Optional[str] = None,
             concurrency: Union[int, Tuple[int, int]] = 2,
             batch_size: int = 64, num_gpus: float = 0,
             text_column: str = "text", key_column: str = "url"):
    """Pipeline helper: a separate actor-pool stage (GPU-sizable via
    ``num_gpus``), unlike the reference's MP ban on addl NER."""
    kwargs = dict(
        fn_constructor_kwargs=dict(model_path=model_path, scorer=scorer,
                                   text_column=text_column,
                                   key_column=key_column),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    else:
        kwargs["num_cpus"] = 1
    return docs.map_batches(TransformersNERStage, **kwargs)
