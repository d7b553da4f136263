"""YAML-driven model creation: concept CSV + training corpus → model
pack, in one call — the reference's ``create_models`` flow
(/root/reference/medcat/utils/model_creator.py:17-140 and its
``tests/model_creator/config_example.yml``), rebuilt on the repo's
distributed pieces:

* ``create_cdb``      ← CDBMaker.prepare_csvs (state/cdb.add_concept_rows)
* ``create_vocab``    ← MakeVocab.make + add_vectors
                         (pipelines/vocab_builder.make_vocab, distributed
                         count/co-occurrence passes)
* ``train_unsupervised`` ← CAT.train (pipelines/train.
                         train_unsupervised_distributed, the order-free
                         partial-mean path, + apply_training)
* pack save           ← CAT.create_model_pack (state/model_pack)

YAML keys (reference names kept where they exist):

.. code-block:: yaml

    output_dir: /tmp/mypack               # pack written here
    concept_csv_file: concepts.csv        # cui,name[,ontologies,...]
    unsupervised_training_data_file: corpus.txt   # one doc per line,
                                          # OR a .parquet with `text`
    engine_config:                        # optional EngineConfig overrides
      spell_check: false
      min_len_normalize: 5
    vocab:                                # optional make_vocab params
      dim: 64
      min_count: 2

Scale shape: the concept CSV is model-sized (driver read, like the
reference); the training corpus streams through Ray Data (`read_text` /
`read_parquet`) for both the vocabulary passes and the context-vector
training — nothing corpus-sized lands on the driver.
"""

from __future__ import annotations

import csv
import os
from typing import Optional, Tuple

import ray.data as rd

from medcat_ray.config import EngineConfig
from medcat_ray.state.cdb import CDB
from medcat_ray.state.model_pack import save_model_pack
from medcat_ray.state.vocab import Vocab

_SET_FIELDS = ("do_not_normalize", "diacritics_words")


def _engine_config(overrides: Optional[dict]) -> EngineConfig:
    if not overrides:
        return EngineConfig()
    kw = dict(overrides)
    for f in _SET_FIELDS:
        if f in kw and isinstance(kw[f], (list, tuple, set)):
            kw[f] = frozenset(kw[f])
    return EngineConfig(**kw)


def create_cdb(concept_csv_file: str, config: EngineConfig,
               full_build: bool = True) -> CDB:
    """Concept CSV → CDB (CDBMaker.prepare_csvs semantics: multi-valued
    fields split on ``config.multi_separator``, cui upper-cased, status
    defaults to A — state/cdb.py:add_concept_rows)."""
    cdb = CDB(config)
    with open(concept_csv_file, newline="") as fh:
        cdb.add_concept_rows(csv.DictReader(fh), full_build=full_build)
    return cdb


def _read_corpus(path: str) -> rd.Dataset:
    """Training corpus as a streaming Dataset with a ``text`` column:
    ``.parquet`` (file or directory) or line-per-document text."""
    if path.endswith(".parquet") or os.path.isdir(path):
        return rd.read_parquet(path, columns=["text"])
    return rd.read_text(path)    # one row per line, column "text"


def create_models(config_file: str
                  ) -> Tuple[CDB, Vocab, EngineConfig, str]:
    """Run the full YAML flow; returns (cdb, vocab, config, pack_path).

    The returned pack directory round-trips through
    ``state.model_pack.load_model_pack`` and feeds
    ``pipelines.kg.annotate`` directly (scenario-tested in
    tests/test_model_creator_flow.py)."""
    import yaml
    from medcat_ray.pipelines.train import (apply_training,
                                            train_unsupervised_distributed)
    from medcat_ray.pipelines.vocab_builder import make_vocab

    with open(config_file) as fh:
        creator = yaml.safe_load(fh)
    config = _engine_config(creator.get("engine_config"))
    out_dir = creator["output_dir"]
    os.makedirs(out_dir, exist_ok=True)

    cdb = create_cdb(creator["concept_csv_file"], config)
    corpus = _read_corpus(creator["unsupervised_training_data_file"])
    vocab_kw = dict(creator.get("vocab") or {})
    vocab = make_vocab(corpus, cdb, config, **vocab_kw)

    # unsupervised context-vector training (CAT.train analogue) — a
    # fresh Dataset; the vocab passes consumed the first one.  The actor
    # pool must leave at least one CPU for the read tasks (a pool of
    # session-size actors deadlocks the streaming executor on small
    # sessions), so the default is 2; override with `train_concurrency`.
    corpus = _read_corpus(creator["unsupervised_training_data_file"])
    result = train_unsupervised_distributed(
        corpus, (cdb, vocab), config,
        concurrency=int(creator.get("train_concurrency", 2)))
    apply_training(cdb, result)   # installs vectors AND cui2count_train

    pack_path = os.path.join(out_dir, "model_pack")
    save_model_pack(pack_path, cdb, vocab, config)
    return cdb, vocab, config, pack_path


def main(argv=None) -> int:
    """CLI twin of the reference's ``python -m medcat.utils.model_creator
    <config.yml>`` (model_creator.py:143-156)."""
    import argparse
    parser = argparse.ArgumentParser(
        description="Create a model pack from a YAML creator config "
                    "(concept CSV + training corpus).")
    parser.add_argument("config_file", help="creator YAML path")
    args = parser.parse_args(argv)
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        _, _, _, pack_path = create_models(args.config_file)
        print(pack_path)
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
