"""Meta-annotation stage (SURVEY.md T2) — MetaCAT-equivalent plumbing.

The reference's MetaCAT (/root/reference/medcat/meta_cat.py:447-634) runs as
a SEPARATE phase after the dictionary pipeline (NN components are pulled out
and batched independently, /root/reference/medcat/cat.py:1249-1277), takes a
token context window of ``cntx_left=15`` / ``cntx_right=10`` around each
entity (/root/reference/medcat/config_meta_cat.py:55-57) and writes one
prediction per entity into ``ent._.meta_anns[category] = {value, confidence,
name}`` (/root/reference/medcat/meta_cat.py:620-634).

The BiLSTM/BERT scorer itself is a torch model this container cannot run.
Two scorers implement the ``score(left, right)`` seam:

* :class:`MetaRule` — deterministic trigger lexicon (SQL-checkable; used
  by the `kg_meta` oracle);
* :class:`medcat_ray.stages.meta_model.LearnedMetaModel` — a REAL
  trainable model (hashed-window logistic regression, trained from MCT
  labels) that plugs into ``MetaAnnotateStage(rules=[model])`` unchanged.

Everything Ray-side is real: a separate actor-pool ``map_batches`` stage
over annotated rows, entity-window batch unit, ``meta_anns`` appended to
each entity struct.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import pyarrow as pa
from medcat_ray.stages.annotate import tune_actor_gc

META_ANN_TYPE = pa.struct([
    ("name", pa.string()),
    ("value", pa.string()),
    ("confidence", pa.float32()),
])

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


class MetaRule:
    """One meta-annotation category: trigger lexicon in a token window.

    ``scope``: "left", "right" or "both" — which side(s) of the entity to
    scan.  Window sizes default to the reference's cntx_left/right.
    """

    def __init__(self, category: str, triggers: Sequence[str],
                 value_on_match: str, value_default: str,
                 scope: str = "both",
                 cntx_left: int = 15, cntx_right: int = 10) -> None:
        self.category = category
        self.triggers = frozenset(t.lower() for t in triggers)
        self.value_on_match = value_on_match
        self.value_default = value_default
        self.scope = scope
        self.cntx_left = cntx_left
        self.cntx_right = cntx_right

    def score(self, left: List[str], right: List[str]) -> Tuple[str, float]:
        window: List[str] = []
        if self.scope in ("left", "both"):
            window.extend(left[-self.cntx_left:])
        if self.scope in ("right", "both"):
            window.extend(right[: self.cntx_right])
        hits = sum(1 for w in window if w in self.triggers)
        if hits:
            return self.value_on_match, min(1.0, 0.5 + 0.25 * hits)
        return self.value_default, 1.0


DEFAULT_RULES: Tuple[MetaRule, ...] = (
    MetaRule("Negation",
             ("no", "not", "without", "denies", "denied", "absence",
              "negative", "never"),
             "Negated", "Affirmed", scope="left"),
    MetaRule("Temporality",
             ("history", "previous", "prior", "past", "former"),
             "Past", "Present", scope="left"),
    MetaRule("Experiencer",
             ("mother", "father", "family", "brother", "sister", "parent"),
             "Family", "Patient", scope="both"),
)


class MetaAnnotateStage:
    """Actor: adds a ``meta_anns`` list to every entity of every document row.

    Input rows need ``text`` plus the ``ents`` list column produced by
    :class:`medcat_ray.stages.annotate.AnnotateStage` (pass
    ``keep_columns=("text",)`` there).  Rules compile once per actor.
    """

    def __init__(self, rules: Optional[Sequence[MetaRule]] = None,
                 text_column: str = "text") -> None:
        self.rules = tuple(rules) if rules is not None else DEFAULT_RULES
        self.text_column = text_column
        tune_actor_gc()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import bisect
        texts = batch[self.text_column].to_pylist()
        ents_col = batch["ents"].to_pylist()
        # pass 1: entity windows for the whole Arrow batch — this is the
        # batch unit NN scorers see (reference batches entities across
        # docs the same way, meta_cat.py:578-600 `data` array)
        windows: List[tuple] = []           # (left, right, center)
        n_ents_per_doc: List[int] = []
        for text, ents in zip(texts, ents_col):
            tokens = [(m.group(0).lower(), m.start(), m.end())
                      for m in _TOKEN_RE.finditer(text or "")]
            words = [t[0] for t in tokens]
            starts = [t[1] for t in tokens]
            n = 0
            for ent in ents or []:
                lo = bisect.bisect_left(starts, ent["start"])
                hi = lo
                while hi < len(tokens) and tokens[hi][1] < ent["end"]:
                    hi += 1
                windows.append((words[:lo], words[hi:], words[lo:hi]))
                n += 1
            n_ents_per_doc.append(n)
        # pass 2: score per rule — batched when the scorer supports it
        per_rule: List[List[Tuple[str, float]]] = []
        for rule in self.rules:
            if hasattr(rule, "score_many"):
                per_rule.append(rule.score_many(windows))
            elif getattr(rule, "needs_center", False):
                per_rule.append([rule.score(l, r, c)
                                 for l, r, c in windows])
            else:
                per_rule.append([rule.score(l, r) for l, r, _ in windows])
        # pass 3: reassemble per-doc per-entity meta_anns
        out_meta: List[List[List[dict]]] = []
        pos = 0
        for n in n_ents_per_doc:
            doc_meta = []
            for i in range(pos, pos + n):
                doc_meta.append([
                    {"name": rule.category, "value": vals[i][0],
                     "confidence": float(vals[i][1])}
                    for rule, vals in zip(self.rules, per_rule)])
            out_meta.append(doc_meta)
            pos += n
        return batch.append_column(
            "meta_anns", pa.array(out_meta,
                                  type=pa.list_(pa.list_(META_ANN_TYPE))))


def meta_annotate(annotated, rules: Optional[Sequence[MetaRule]] = None,
                  concurrency=2, batch_size: int = 128,
                  text_column: str = "text"):
    """Pipeline helper: separate actor-pool stage, mirroring the reference's
    split NN phase (cat.py:1249-1277) — own batch size, own pool, GPU-ready
    (add ``num_gpus`` here when a real model replaces the rules)."""
    return annotated.map_batches(
        MetaAnnotateStage,
        fn_constructor_kwargs=dict(rules=rules, text_column=text_column),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
