"""De-identification text rewrite (SURVEY.md M15).

Reference: ``DeIdModel.deid_text`` (/root/reference/medcat/utils/ner/deid.py:76-93)
delegating to ``replace_entities_in_text``
(/root/reference/medcat/utils/ner/helpers.py:7-16): entities replaced
right-to-left with ``[<concept name>]``, or ``[*****]`` (span-length stars)
when redacting.  The reference detects PII with a TransformersNER model
(torch, unavailable here); our stage reuses the dictionary annotator, so any
CDB whose concepts are PII types gives the same rewrite semantics.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Tuple, Union

import pyarrow as pa


def replace_entities_in_text(text: str, entities: Iterable[dict],
                             get_cui_name: Callable[[str], str],
                             redact: bool = False) -> str:
    """helpers.py:7-16 parity: sort by start desc, splice right-to-left."""
    new_text = str(text)
    for ent in sorted(entities, key=lambda e: e["start"], reverse=True):
        r = "*" * (ent["end"] - ent["start"]) if redact \
            else get_cui_name(ent["cui"])
        new_text = new_text[:ent["start"]] + f"[{r}]" + new_text[ent["end"]:]
    return new_text


def deid(annotated, models, redact: bool = False,
         text_column: str = "text", key_column: str = "url"):
    """Stateless rewrite stage over annotated rows (needs ``text`` kept by
    the annotate stage).  The CUI→name map is broadcast inside ``models``
    (same object the annotate actors hold) — a map-side join, no shuffle."""
    import ray

    def rewrite(batch: pa.Table) -> pa.Table:
        if isinstance(models, ray.ObjectRef):
            cdb, _ = ray.get(models)
        else:
            cdb, _ = models
        texts = batch[text_column].to_pylist()
        ents_col = batch["ents"].to_pylist()
        out = [replace_entities_in_text(t or "", e or [], cdb.get_name,
                                        redact)
               for t, e in zip(texts, ents_col)]
        return pa.table({
            key_column: batch[key_column],
            "text_deid": pa.array(out, pa.string()),
        })

    return annotated.map_batches(rewrite, batch_format="pyarrow")
