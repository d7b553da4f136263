"""Model pack: a versioned artifact directory bundling CDB + Vocab + config
(SURVEY.md S8; reference ``CAT.create_model_pack``/``load_model_pack``,
/root/reference/medcat/cat.py:235-470 — a zip of cdb.dat/vocab.dat/
config.json).  Ours is a plain directory of Parquet artifacts whose combined
content hash (reference analogue medcat/cat.py:151-178) stamps every output
partition's lineage record; a hash change invalidates resume.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional, Tuple

from medcat_ray.config import EngineConfig
from medcat_ray.state.cdb import CDB
from medcat_ray.state.vocab import Vocab


def save_model_pack(path: str, cdb: CDB, vocab: Vocab,
                    config: Optional[EngineConfig] = None) -> str:
    """Write cdb/ + vocab/ + config.json + pack_hash.txt; returns the hash."""
    config = config or cdb.config
    os.makedirs(path, exist_ok=True)
    cdb_hash = cdb.save(os.path.join(path, "cdb"))
    vocab.save(os.path.join(path, "vocab"))
    cfg_json = json.dumps(config.to_dict(), sort_keys=True)
    with open(os.path.join(path, "config.json"), "w") as fh:
        fh.write(cfg_json)
    h = hashlib.sha256()
    h.update(cdb_hash.encode())
    h.update(cfg_json.encode())
    # full vocab content (words + counts + vector bytes): retrained word
    # vectors change context_similarity output, so they must invalidate
    # resume — a words-only prefix hash silently skipped stale partitions
    h.update(vocab.content_hash().encode())
    pack_hash = h.hexdigest()[:16]
    with open(os.path.join(path, "pack_hash.txt"), "w") as fh:
        fh.write(pack_hash)
    return pack_hash


def engine_code_version() -> str:
    """Versions of the deterministic text-processing code whose behavior
    changes annotate output (lemmatizer rules, HTML extractor).  Folded
    into the LINEAGE key (not the pack content hash): a code bump must
    invalidate partition resume even for packs saved under older code,
    else ``run_partitioned`` silently treats stale partitions as
    current — the same failure mode a vocab-content change used to have."""
    from medcat_ray.functions.html import EXTRACTOR_VERSION
    from medcat_ray.functions.text import LEMMATIZER_VERSION
    return f"lemma={LEMMATIZER_VERSION};extractor={EXTRACTOR_VERSION}"


def lineage_model_hash(pack_hash: str) -> str:
    """The model hash to stamp on output-partition lineage records:
    pack content hash × engine code version."""
    h = hashlib.sha256()
    h.update(pack_hash.encode())
    h.update(engine_code_version().encode())
    return h.hexdigest()[:16]


def load_model_pack(path: str) -> Tuple[CDB, Vocab, EngineConfig, str]:
    with open(os.path.join(path, "config.json")) as fh:
        config = EngineConfig.from_dict(json.load(fh))
    cdb = CDB.load(os.path.join(path, "cdb"), config)
    vocab = Vocab.load(os.path.join(path, "vocab"))
    with open(os.path.join(path, "pack_hash.txt")) as fh:
        pack_hash = fh.read().strip()
    return cdb, vocab, config, pack_hash
