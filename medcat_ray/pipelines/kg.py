"""The flagship KG-construction pipeline (SURVEY.md §3.4):

    read_parquet(pages) → extract_text (stateless tasks)
      → AnnotateStage (actor pool, CDB+Vocab pinned)
      → entities parquet  /  triple rows  /  triple counts (groupby-agg)

All functions take and return ``ray.data.Dataset`` and never call
``ray.init``.  Wide steps: exactly one groupby (triple counting), fed by
per-batch partial counts (combiner) so the exchange carries one row per
distinct triple per batch rather than one row per pair occurrence.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from medcat_ray.config import EngineConfig
from medcat_ray.state.cdb import CDB
from medcat_ray.state.vocab import Vocab
from medcat_ray.stages.annotate import AnnotateStage, extract_text_batch
from medcat_ray.stages.triples import (explode_entities, gen_triple_rows,
                                       partial_triple_counts)

PAGES_COLUMNS = ("url", "html", "lang")  # prune at the read: no warc_ts/text


def broadcast_models(cdb: CDB, vocab: Vocab) -> "ray.ObjectRef":
    """``ray.put`` the model once; every annotate actor reads the same copy
    from the object store instead of re-shipping per task."""
    return ray.put((cdb, vocab))


def read_pages(path: Union[str, Sequence[str]],
               columns: Sequence[str] = PAGES_COLUMNS,
               lang: Optional[str] = None) -> rd.Dataset:
    """Pages source with column pruning and optional language pushdown."""
    import pyarrow.dataset as pads
    filter_expr = (pads.field("lang") == lang) if lang else None
    return rd.read_parquet(path, columns=list(columns), filter=filter_expr)


def extract_text(pages: rd.Dataset) -> rd.Dataset:
    """M16: html → text, stateless tasks, drops the html column."""
    return pages.map_batches(extract_text_batch, batch_format="pyarrow")


def annotate(docs: rd.Dataset,
             models: Union["ray.ObjectRef", Tuple[CDB, Vocab], str],
             config: Optional[EngineConfig] = None,
             concurrency: Union[int, Tuple[int, int]] = 8,
             batch_size: int = 128,
             text_column: str = "text",
             key_column: str = "url") -> rd.Dataset:
    """T1 actor-pool stage; one row per document with an ``ents`` list."""
    return docs.map_batches(
        AnnotateStage,
        fn_constructor_kwargs=dict(models=models, config=config,
                                   text_column=text_column,
                                   key_column=key_column),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def entities(annotated: rd.Dataset, key_column: str = "url") -> rd.Dataset:
    """Flattened entities table (FIXTURES.md F4)."""
    return annotated.map_batches(
        lambda b: explode_entities(b, key_column), batch_format="pyarrow")


def enrich_entities(ents: rd.Dataset, cdb: CDB,
                    keys: Sequence[str] = ("cui2icd10", "cui2opcs4",
                                           "cui2ontologies")) -> rd.Dataset:
    """J2/M13 addl-info enrichment: append one column per requested
    ``addl_info`` map (reference output projection joins,
    /root/reference/medcat/cat.py:1761-1773) — broadcast map-side join,
    never a shuffle.  Values are JSON-encoded when non-scalar (open-schema
    maps → stable string columns)."""
    import json as _json
    maps = {k: dict(cdb.addl_info.get(k, {})) for k in keys}
    ref = ray.put(maps)

    def project(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        cuis = batch["cui"].to_pylist()
        for key in keys:
            col = []
            lookup = m[key]
            for cui in cuis:
                val = lookup.get(cui)
                if val is None:
                    col.append(None)
                elif isinstance(val, str):
                    col.append(val)
                else:
                    col.append(_json.dumps(sorted(val)
                                           if isinstance(val, (set, frozenset))
                                           else val, sort_keys=True))
            batch = batch.append_column(
                key.replace("cui2", ""), pa.array(col, pa.string()))
        return batch

    return ents.map_batches(project, batch_format="pyarrow")


def triples(annotated: rd.Dataset, window: int = 300,
            pred: str = "co_occurs_with",
            key_column: str = "url",
            type_filter_pairs=None, typed_preds=None) -> rd.Dataset:
    """Provenance triple rows — one row per co-occurrence pair.

    ``type_filter_pairs`` keeps only pairs whose entity types match a rule
    (reference RelCAT ``relation_type_filter_pairs``,
    /root/reference/medcat/utils/relation_extraction/rel_dataset.py:425-440);
    ``typed_preds`` additionally maps {(t1, t2): predicate} so edges carry
    typed predicates instead of the constant co-occurrence label."""
    return annotated.map_batches(
        lambda b: gen_triple_rows(b, window, pred, key_column,
                                  type_filter_pairs, typed_preds),
        batch_format="pyarrow")


def triple_counts(annotated: rd.Dataset, window: int = 300,
                  pred: str = "co_occurs_with",
                  key_column: str = "url",
                  mode: str = "shuffle") -> rd.Dataset:
    """Corpus-level deduped (subj, pred, obj, count) — A5/D5.

    Partial counts per batch (combiner) first; then either

    * ``mode="shuffle"`` (default, the scale path): one groupby-aggregate
      keyed by the triple columns — correct for open-world CDBs where the
      distinct-triple set can be arbitrarily large; the per-batch combiner
      already collapsed hot keys so skew is defused (SURVEY.md §7.3);
    * ``mode="tree"``: two levels of coalesce + Arrow group_by — no sort
      shuffle, near-zero fixed cost.  ONLY valid when the distinct triple
      count provably fits one block (e.g. a closed concept space: K² keys);
      callers with a small CDB should use this.

    Provenance stays in the :func:`triples` table (partition-resumable),
    keeping this exchange minimal either way."""
    from medcat_ray.stages.triples import combine_partial_counts
    partial = annotated.map_batches(
        lambda b: partial_triple_counts(b, window, pred, key_column),
        batch_format="pyarrow")
    if mode == "tree":
        final = partial.repartition(1).map_batches(
            combine_partial_counts, batch_format="pyarrow")
        return final.rename_columns({"n": "count"})
    return partial.groupby(["subj_cui", "pred", "obj_cui"]).aggregate(
        Sum("n", alias_name="count"))


def triple_counts_salted(annotated: rd.Dataset, window: int = 300,
                         pred: str = "co_occurs_with",
                         key_column: str = "url",
                         salt_buckets: int = 16) -> rd.Dataset:
    """Two-stage salted aggregation for open-world concept spaces with
    head-CUI skew (SURVEY.md §7.3).

    The per-batch combiner already collapses hot triples to one row per
    batch; at 10^12-doc scale a head triple still lands ``n_blocks`` rows on
    ONE reducer.  Stage 1 groups on (triple, salt) — salt spreads those rows
    over ``salt_buckets`` reducers — stage 2 merges the ≤ salt_buckets
    partials per triple.  Exchange volume is unchanged; per-reducer maximum
    drops by the bucket factor."""
    import pyarrow.compute as _pc
    from medcat_ray.ops.hashing import stable_u64

    def add_salt(batch: pa.Table) -> pa.Table:
        # Block-content salt: stable across retries of the same block,
        # different across blocks — exactly what spreads a hot key.
        if batch.num_rows == 0:
            return batch.append_column("salt", pa.array([], pa.int32()))
        h = stable_u64(
            b"%d:%s" % (batch.num_rows,
                        batch["subj_cui"][0].as_py().encode()
                        if batch.num_rows else b""))
        salt = int(h % salt_buckets)
        return batch.append_column(
            "salt", pa.array([salt] * batch.num_rows, pa.int32()))

    partial = annotated.map_batches(
        lambda b: partial_triple_counts(b, window, pred, key_column),
        batch_format="pyarrow").map_batches(add_salt, batch_format="pyarrow")
    stage1 = partial.groupby(["subj_cui", "pred", "obj_cui", "salt"]) \
        .aggregate(Sum("n", alias_name="n"))
    return stage1.groupby(["subj_cui", "pred", "obj_cui"]).aggregate(
        Sum("n", alias_name="count"))


def materialize_graph(annotated: rd.Dataset, cdb: CDB, out_dir: str,
                      window: int = 300, pred: str = "co_occurs_with",
                      key_column: str = "url",
                      mode: str = "shuffle") -> dict:
    """Graph materialize (SURVEY.md §7.1 step 7): write the KG as
    ``nodes/`` (one row per CUI with CDB attributes — model-sized,
    driver-built) and ``edges/`` (deduped triple counts) parquet.

    Returns {"nodes": n, "edges": n}."""
    import os
    cuis = sorted(cdb.cui2names)
    nodes = pa.table({
        "cui": pa.array(cuis, pa.string()),
        "pretty_name": pa.array([cdb.get_name(c) for c in cuis], pa.string()),
        "type_ids": pa.array([sorted(cdb.cui2type_ids.get(c, set()))
                              for c in cuis], pa.list_(pa.string())),
        "count_train": pa.array([cdb.cui2count_train.get(c, 0)
                                 for c in cuis], pa.int64()),
    })
    os.makedirs(os.path.join(out_dir, "nodes"), exist_ok=True)
    import pyarrow.parquet as pq
    pq.write_table(nodes, os.path.join(out_dir, "nodes", "nodes.parquet"))
    edges = triple_counts(annotated, window=window, pred=pred,
                          key_column=key_column, mode=mode)
    edges.write_parquet(os.path.join(out_dir, "edges"))
    import glob as _glob
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows for f in
                  _glob.glob(os.path.join(out_dir, "edges", "*.parquet")))
    return {"nodes": nodes.num_rows, "edges": n_edges}


def annotate_pages(pages_path: Union[str, Sequence[str]],
                   models: Union["ray.ObjectRef", Tuple[CDB, Vocab], str],
                   config: Optional[EngineConfig] = None,
                   lang: Optional[str] = None,
                   concurrency: Union[int, Tuple[int, int]] = 8,
                   batch_size: int = 128) -> rd.Dataset:
    """read → extract_text → annotate, the shared front of every KG run."""
    pages = read_pages(pages_path, lang=lang)
    return annotate(extract_text(pages), models, config,
                    concurrency=concurrency, batch_size=batch_size)
