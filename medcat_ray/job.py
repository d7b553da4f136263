"""KG-construction job entry point — the script you hand to
``ray job submit`` on a cluster (north rule: same script on N or 4N nodes):

    ray job submit --working-dir . -- \
        python -m medcat_ray.job --pages /data/pages --models /data/pack \
            --out /data/kg --concurrency 192

Single-node / local runs work identically (Ray auto-inits in local mode).
The run is PARTITION-RESUMABLE: one input parquet fragment → one committed
output partition + lineage record (``pipelines/runner.py``); re-submitting
the same job after a failure skips committed partitions, and a model-pack
hash change recomputes everything (reference analogue:
``annotated_ids.pickle`` skip-set, /root/reference/medcat/cat.py:1403-1421).

Outputs per partition: ``entities/part=<id>/`` and ``triples/part=<id>/``
parquet, plus corpus-level ``triple_counts.parquet`` written at the end
(salted-shuffle groupby over committed triple partitions).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Ray-Data KG construction over Common-Crawl-style pages")
    parser.add_argument("--pages", required=True,
                        help="dir of pages parquet (url, warc_ts, html, "
                             "text, lang)")
    parser.add_argument("--models", required=True,
                        help="model-pack dir (state.model_pack layout)")
    parser.add_argument("--out", required=True, help="output dir")
    parser.add_argument("--concurrency", type=int, default=8,
                        help="annotate actor pool size")
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--lang", default=None,
                        help="optional language pushdown filter")
    parser.add_argument("--window", type=int, default=300)
    parser.add_argument("--skip-triple-counts", action="store_true")
    parser.add_argument("--materialize-graph", action="store_true",
                        help="also write nodes/ + edges/ graph tables")
    args = parser.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto")
                 if os.environ.get("RAY_ADDRESS") else None,
                 ignore_reinit_error=True)

    from medcat_ray.pipelines import kg
    from medcat_ray.pipelines.runner import run_partitioned
    from medcat_ray.state.model_pack import (lineage_model_hash,
                                             load_model_pack)

    cdb, vocab, config, pack_hash = load_model_pack(args.models)
    # lineage key = pack content × engine code version, so a lemmatizer /
    # extractor bump recomputes partitions even under an old saved pack
    resume_hash = lineage_model_hash(pack_hash)
    models = kg.broadcast_models(cdb, vocab)
    files = sorted(glob.glob(os.path.join(args.pages, "*.parquet")))
    if not files:
        print(f"no parquet fragments under {args.pages}", file=sys.stderr)
        return 2

    def part_fn(path):
        # One annotate pass per fragment; materialize is safe here because
        # the unit is a single input fragment (bounded), and it lets both
        # the entities and triples projections read the same blocks.
        ann = kg.annotate_pages(path, models, config, lang=args.lang,
                                concurrency=args.concurrency,
                                batch_size=args.batch_size).materialize()
        return {"entities": kg.entities(ann),
                "triples": kg.triples(ann, window=args.window)}

    t0 = time.perf_counter()
    records = run_partitioned(files, args.out, part_fn, resume_hash,
                              extra_meta={"pages": args.pages})
    elapsed = time.perf_counter() - t0

    summary = {
        "partitions": len(records),
        "entities_rows": sum(r["rows_out"].get("entities", 0)
                             for r in records),
        "triples_rows": sum(r["rows_out"].get("triples", 0)
                            for r in records),
        "model_hash": pack_hash,
        "lineage_hash": resume_hash,
        "elapsed_sec": round(elapsed, 2),
    }

    if not args.skip_triple_counts:
        import pyarrow.parquet as pq
        import ray.data as rd
        triples = rd.read_parquet(
            os.path.join(args.out, "triples"),
            columns=["subj_cui", "pred", "obj_cui"])
        counts = triples.groupby(["subj_cui", "pred", "obj_cui"]).count()
        out_dir = os.path.join(args.out, "triple_counts")
        counts.write_parquet(out_dir)
        summary["distinct_triples"] = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(out_dir, "*.parquet")))

    if args.materialize_graph:
        ann = kg.annotate_pages(args.pages, models, config, lang=args.lang,
                                concurrency=args.concurrency,
                                batch_size=args.batch_size)
        summary["graph"] = kg.materialize_graph(
            ann, cdb, os.path.join(args.out, "graph"), window=args.window)

    with open(os.path.join(args.out, "job_summary.json"), "w") as fh:
        json.dump(summary, fh, sort_keys=True, indent=1)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
