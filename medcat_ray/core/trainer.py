"""Training (SURVEY.md T5/T6).

Two paths:

* :class:`Trainer` — the reference's sequential, order-dependent EMA
  training, kept driver-side and small-scale (SURVEY.md §7.4: lr depends on
  the running count, so bit-exact parallelism is impossible).  Reference:
  unsupervised loop ``CAT.train`` (/root/reference/medcat/cat.py:620-674),
  linker train path (/root/reference/medcat/linking/context_based_linker.py:39-88),
  ``ContextModel.train`` (/root/reference/medcat/linking/vector_context_model.py:187-241),
  ``CAT.add_and_train_concept`` (/root/reference/medcat/cat.py:730-800).
  Determinism deviation: the reference draws negative samples from the
  GLOBAL ``random`` module; we use a seeded ``numpy`` Generator.

* :func:`medcat_ray.pipelines.train.train_unsupervised_distributed` — the
  order-FREE Ray-native analogue (mean of mention contexts per CUI), for
  corpus-scale vector initialisation.  See that module.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Set

import numpy as np

from medcat_ray.config import EngineConfig
from medcat_ray.core.annotator import DocAnnotator, Entity, _DocContext, _unitvec
from medcat_ray.functions.text import Token
from medcat_ray.state.cdb import CDB, prepare_name
from medcat_ray.state.vocab import Vocab


class Trainer:
    def __init__(self, cdb: CDB, vocab: Vocab,
                 config: Optional[EngineConfig] = None,
                 seed: int = 0) -> None:
        self.cdb = cdb
        self.vocab = vocab
        self.config = config or cdb.config
        self.rng = np.random.default_rng(seed)
        # NER machinery only — linking similarity is recomputed fresh from
        # the mutating CDB, never from DocAnnotator's startup cache.
        self._annotator = DocAnnotator(cdb, vocab, self.config)

    # -- unsupervised (T5) -------------------------------------------------

    def train_unsupervised(self, texts: Iterable[str], nepochs: int = 1,
                           fine_tune: bool = True,
                           checkpoint_dir: Optional[str] = None,
                           checkpoint_steps: int = 1000,
                           is_resumed: bool = False) -> int:
        """Reference ``CAT.train`` (cat.py:620-674) + the Linker train branch
        (context_based_linker.py:62-88): for every detected mention, train
        its CUI iff the name is long enough AND (single candidate with
        status != N, or any candidate with status P/PD).  Returns number of
        positive updates.

        Checkpointing mirrors the reference ``CheckpointManager``
        (cat.py:601-618; utils/checkpoint.py:94-144): every
        ``checkpoint_steps`` documents the whole CDB is snapshotted to
        ``checkpoint_dir/checkpoint-<steps>-<count>``; ``is_resumed=True``
        restores the latest snapshot and fast-forwards the iterator."""
        if not fine_tune:
            self.cdb.reset_training()
        cfg = self.config
        n_updates = 0
        texts = list(texts)
        done_docs = 0
        if is_resumed and checkpoint_dir:
            done_docs = self._restore_checkpoint(checkpoint_dir)
        doc_idx = -1
        for _ in range(nepochs):
            for text in texts:
                doc_idx += 1
                if doc_idx < done_docs:
                    continue          # fast-forward (checkpoint.py:130-137)
                if not text:
                    continue
                text = str(text).strip()[: cfg.max_document_length]
                from medcat_ray.functions.text import process_text
                toks = process_text(text, cfg, self._annotator.spell_checker,
                                    self._annotator.stopwords)
                ents = self._annotator._ner(toks)
                ctx = _DocContext(toks, self.vocab, cfg)
                for ent in ents:
                    name = ent.detected_name
                    cuis = ent.link_candidates
                    if len(name) < cfg.disamb_length_limit:
                        continue
                    statuses = self.cdb.name2cuis2status.get(name, {})
                    if len(cuis) == 1:
                        if statuses.get(cuis[0], "") != "N":
                            self._train_mention(cuis[0], ent, ctx, name)
                            n_updates += 1
                    else:
                        for cui in cuis:
                            if statuses.get(cui, "") in ("P", "PD"):
                                self._train_mention(cui, ent, ctx, name)
                                n_updates += 1
                if checkpoint_dir and (doc_idx + 1) % checkpoint_steps == 0:
                    self._save_checkpoint(checkpoint_dir, doc_idx + 1)
        if checkpoint_dir:
            self._save_checkpoint(checkpoint_dir, doc_idx + 1)
        return n_updates

    def _save_checkpoint(self, checkpoint_dir: str, count: int) -> str:
        import os
        path = os.path.join(checkpoint_dir, f"checkpoint-1-{count}")
        os.makedirs(path, exist_ok=True)
        self.cdb.save(path)
        return path

    def _restore_checkpoint(self, checkpoint_dir: str) -> int:
        """Load the latest CDB snapshot in place; returns its doc count."""
        import os
        if not os.path.isdir(checkpoint_dir):
            return 0
        best = 0
        for name in os.listdir(checkpoint_dir):
            parts = name.split("-")
            if len(parts) == 3 and parts[0] == "checkpoint":
                best = max(best, int(parts[2]))
        if best:
            restored = CDB.load(
                os.path.join(checkpoint_dir, f"checkpoint-1-{best}"),
                self.config)
            self.cdb.cui2context_vectors = restored.cui2context_vectors
            self.cdb.cui2count_train = restored.cui2count_train
            self.cdb.name2count_train = restored.name2count_train
            self.cdb.cui2average_confidence = restored.cui2average_confidence
            self.cdb.name2cuis2status = restored.name2cuis2status
        return best

    def _train_mention(self, cui: str, ent: Entity, ctx: _DocContext,
                       name: str, negative: bool = False,
                       names_for_status: Optional[Iterable[str]] = None,
                       add_negative: bool = True) -> None:
        """ContextModel.train + Linker._train negative-sampling wrapper
        (vector_context_model.py:187-241; context_based_linker.py:39-54)."""
        cfg = self.config
        vectors = ctx.vectors_for(ent)
        if not vectors:
            return
        self.cdb.update_context_vector(cui, vectors, negative=negative)
        if not negative:
            self.cdb.name2count_train[name] = \
                self.cdb.name2count_train.get(name, 0) + 1
            if cfg.calculate_dynamic_threshold:
                sim = self._similarity(cui, vectors)
                self.cdb.update_cui2average_confidence(cui, sim)
            # negative_probability gate (config.py:564, default 0.5)
            if add_negative and \
                    cfg.negative_probability >= self.rng.random():
                self._train_negative_sampling(cui)
        else:
            # flip P→PD / A→N so the name always disambiguates
            # (vector_context_model.py:217-227)
            for nm in (names_for_status or []):
                st = self.cdb.name2cuis2status.get(nm, {}).get(cui, "")
                if st == "P":
                    self.cdb.name2cuis2status[nm][cui] = "PD"
                elif st == "A":
                    self.cdb.name2cuis2status[nm][cui] = "N"

    def _train_negative_sampling(self, cui: str) -> None:
        """vector_context_model.py:243-258: per context size, the mean of
        ``size`` negative-sample vectors, pushed as a negative update."""
        vectors: Dict[str, np.ndarray] = {}
        for ctx_type, size in self.config.context_vector_sizes.items():
            words = self.vocab.get_negative_samples(size, rng=self.rng)
            vecs = [self.vocab.vec(w) for w in words]
            vecs = [v for v in vecs if v is not None]
            if vecs:
                vectors[ctx_type] = np.average(vecs, axis=0)
        if vectors:
            self.cdb.update_context_vector(cui, vectors, negative=True)

    def _similarity(self, cui: str, vectors: Dict[str, np.ndarray]) -> float:
        cfg = self.config
        cui_vecs = self.cdb.cui2context_vectors.get(cui)
        if not cui_vecs:
            return -1.0
        sim = 0.0
        for ctx_type, weight in cfg.context_vector_weights.items():
            v, cv = vectors.get(ctx_type), cui_vecs.get(ctx_type)
            if v is not None and cv is not None:
                sim += weight * float(np.dot(
                    _unitvec(np.asarray(v, dtype=np.float64)),
                    _unitvec(np.asarray(cv, dtype=np.float64))))
        return sim

    # -- supervised (T6) ---------------------------------------------------

    def add_and_train_concept(self, cui: str, name: str, text: str,
                              start: int, end: int,
                              name_status: str = "A",
                              type_ids: Optional[Set[str]] = None,
                              negative: bool = False,
                              devalue_others: bool = False,
                              do_add_concept: bool = True) -> None:
        """Reference ``CAT.add_and_train_concept`` (cat.py:730-800): prepare
        the raw selected value, optionally add it to the CDB, then train the
        linker on the annotated span's context."""
        cfg = self.config
        names = prepare_name(name, cfg)
        if do_add_concept and not negative:
            self.cdb.add_concept(cui=cui, names=names,
                                 name_status=name_status,
                                 type_ids=type_ids or set(), full_build=True)
        from medcat_ray.functions.text import process_text
        toks = process_text(text[: cfg.max_document_length], cfg,
                            self._annotator.spell_checker,
                            self._annotator.stopwords)
        span = [t for t in toks if t.start >= start and t.end <= end]
        if not span:
            return
        ent = Entity(span, next(iter(names), name), [cui], 0)
        ctx = _DocContext(toks, self.vocab, cfg)
        self._train_mention(cui, ent, ctx, ent.detected_name,
                            negative=negative, names_for_status=names,
                            add_negative=False)
        if not negative and devalue_others:
            others: Set[str] = set()
            for nm in names:
                others.update(self.cdb.name2cuis.get(nm, []))
            others.discard(cui)
            for other in others:
                self._train_mention(other, ent, ctx, ent.detected_name,
                                    negative=True, add_negative=False)

    def train_supervised(self, mct_export_path: str, nepochs: int = 1,
                         use_filters: bool = False) -> int:
        """Replay an MCT export through :meth:`add_and_train_concept`
        (reference ``CAT.train_supervised_raw``, cat.py:841-1117 — the
        annotation-replay core; project filters and MetaCAT training are out
        of scope).  Annotations flagged deleted/killed train as negatives
        (cat.py:1050-1060); ``correct`` (or unvalidated) as positives."""
        from medcat_ray.sources.mct_export import _load
        return self.train_supervised_raw(_load(mct_export_path),
                                         nepochs=nepochs,
                                         use_filters=use_filters)

    def train_supervised_raw(self, export: dict, nepochs: int = 1,
                             use_filters: bool = False) -> int:
        """In-memory twin of :meth:`train_supervised` (reference
        ``CAT.train_supervised_raw`` takes the export dict directly) —
        the k-fold replay driver (stats_kfold.py) trains each fold
        without round-tripping through JSON files."""
        n = 0
        for _ in range(nepochs):
            for project in export.get("projects", []):
                for doc in project.get("documents", []):
                    text = doc.get("text", "")
                    for ann in doc.get("annotations", []):
                        if ann.get("killed") or ann.get("alternative"):
                            continue
                        negative = bool(ann.get("deleted"))
                        self.add_and_train_concept(
                            cui=str(ann["cui"]), name=ann.get("value", ""),
                            text=text, start=int(ann["start"]),
                            end=int(ann["end"]), negative=negative)
                        n += 1
        return n
