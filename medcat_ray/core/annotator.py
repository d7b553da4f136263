"""DocAnnotator — dictionary NER + context-vector linking for ONE document.

Pure Python/numpy, no Ray: this is the unit the annotate actor-pool stage
calls per row, and the unit the parity tests exercise directly.  Semantics
reimplemented from the reference:

* greedy longest-match NER      — /root/reference/medcat/ner/vocab_based_ner.py:24-97
* annotation acceptance rules   — /root/reference/medcat/ner/vocab_based_annotator.py:13-65
* linker decision rules         — /root/reference/medcat/linking/context_based_linker.py:57-138
* context vectors + similarity  — /root/reference/medcat/linking/vector_context_model.py:29-185
* overlap resolution            — /root/reference/medcat/utils/postprocessing.py:37-62
* output projection             — /root/reference/medcat/cat.py:1729-1795 (flattened schema, FIXTURES.md F4)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from medcat_ray.config import EngineConfig
from medcat_ray.functions.text import (SpellChecker, Token, process_text,
                                       STOPWORDS)
from medcat_ray.state.cdb import CDB
from medcat_ray.state.vocab import Vocab


class Entity:
    """A detected + linked mention (reference Span extensions, medcat/pipe.py:112-163)."""

    __slots__ = ("tokens", "detected_name", "link_candidates", "ent_id",
                 "cui", "context_similarity", "start", "end")

    def __init__(self, tokens: List[Token], detected_name: str,
                 link_candidates: List[str], ent_id: int) -> None:
        self.tokens = tokens
        self.detected_name = detected_name
        self.link_candidates = link_candidates
        self.ent_id = ent_id
        self.cui: Optional[str] = None
        self.context_similarity: float = 0.0
        self.start = tokens[0].start
        self.end = tokens[-1].end


class DocAnnotator:
    def __init__(self, cdb: CDB, vocab: Vocab,
                 config: Optional[EngineConfig] = None,
                 stopwords: Optional[Set[str]] = None) -> None:
        self.cdb = cdb
        self.vocab = vocab
        self.config = config or cdb.config
        self.stopwords = STOPWORDS if stopwords is None else stopwords
        self.spell_checker = SpellChecker(cdb.vocab, self.config) \
            if self.config.spell_check else None
        # per-annotator norm cache: (lower, is_punct) -> norm; amortizes
        # lemmatize/spell work across the documents one actor processes
        self.norm_cache: dict = {}
        # per-annotator token intern cache: raw token text -> every
        # offset-independent Token field (see process_text)
        self.tok_cache: dict = {}
        # Pre-normalize CUI vectors once: unitvec of each context vector
        # (reference recomputes unitvec per similarity call,
        # vector_context_model.py:131 — same value, done once here).
        self._cui_unit_vectors: Dict[str, Dict[str, np.ndarray]] = {}
        for cui, ctxs in cdb.cui2context_vectors.items():
            self._cui_unit_vectors[cui] = {
                t: _unitvec(np.asarray(v, dtype=np.float64))
                for t, v in ctxs.items()}
        self._build_sim_matrix()
        # per-CUI projection metadata (sorted type ids + pretty name),
        # computed once per annotator instead of per entity (~350 ents/doc
        # on dense pages made the per-ent sorted() a profile hotspot);
        # invalidated when cdb.mutation_count moves (trainer add_concept)
        self._cui_proj_meta: Dict[str, tuple] = {}
        self._cui_proj_version = getattr(cdb, "mutation_count", 0)
        # acceptance-rule constants hoisted out of the per-candidate path
        self._check_upper = self.config.check_upper_case_names
        self._min_name_len = self.config.min_name_len
        self._upper_limit = self.config.upper_case_limit_len
        self._name_isupper_get = cdb.name_isupper.get
        # memoized NER state machine (see _ner): per-token start
        # resolution and per-(name, token) extension steps.  Both caches
        # replay the ORIGINAL lookup logic on miss, so semantics are
        # identical; cleared whenever cdb.mutation_count moves (trainer
        # add_concept mutates snames/name2cuis under a live annotator).
        self._ner_start_cache: Dict[object, tuple] = {}
        self._ner_ext_cache: Dict[tuple, tuple] = {}
        self._ner_cache_version = getattr(cdb, "mutation_count", 0)

    def _build_sim_matrix(self) -> None:
        """Stack the per-CUI unit context vectors into ONE weighted matrix
        so disambiguation scores every candidate with a single gemv instead
        of k Python ``_similarity`` calls (k dict walks + 4k np.dot each).

        Layout: row r = CUI r; the row is the concatenation over
        ``config.context_vector_weights`` types of ``weight_t * unitvec_t``
        (zeros where the CUI lacks that type — a zero block contributes 0
        to the dot product, exactly the reference's both-sides-present
        gate, vector_context_model.py:112-139).  Eligibility
        (count_train >= threshold) stays a LIVE dict read per candidate —
        same semantics as the dict path for trainers that mutate counts
        under a constructed annotator."""
        self._sim_types = list(self.config.context_vector_weights.items())
        dim = None
        for ctxs in self._cui_unit_vectors.values():
            for v in ctxs.values():
                if dim is None:
                    dim = v.shape[0]
                elif v.shape[0] != dim:
                    self._sim_matrix = None   # ragged dims: dict fallback
                    return
        if dim is None or not self._sim_types:
            self._sim_matrix = None
            return
        n = len(self._cui_unit_vectors)
        k = len(self._sim_types)
        M = np.zeros((n, k * dim), dtype=np.float64)
        self._sim_row: Dict[str, int] = {}
        r = 0
        for cui, ctxs in self._cui_unit_vectors.items():
            # an EMPTY context-vector dict must stay off the matrix: the
            # dict path returns -1.0 (ineligible) for it, and a zero row
            # would instead score 0.0 and could flip a disambiguation
            # argmax when all trained candidates score negative
            if not ctxs:
                continue
            self._sim_row[cui] = r
            for j, (t, w) in enumerate(self._sim_types):
                v = ctxs.get(t)
                if v is not None:
                    M[r, j * dim:(j + 1) * dim] = w * v
            r += 1
        M = M[:r]
        self._sim_matrix = M
        self._sim_dim = dim

    def _sim_doc_vec(self, unit_vectors: Dict[str, np.ndarray]) -> np.ndarray:
        """Concatenate the doc-side unit context vectors in matrix block
        order (zeros for absent types)."""
        dim = self._sim_dim
        vcat = np.zeros(len(self._sim_types) * dim, dtype=np.float64)
        for j, (t, _w) in enumerate(self._sim_types):
            v = unit_vectors.get(t)
            if v is not None:
                vcat[j * dim:(j + 1) * dim] = v
        return vcat

    def _similarity_many(self, cuis: List[str],
                         unit_vectors: Dict[str, np.ndarray]) -> np.ndarray:
        """Vectorized ``_similarity`` over candidate CUIs: one row-gather +
        gemv.  Returns float64 sims with -1.0 for ineligible candidates
        (no vectors or count_train below threshold)."""
        sims = np.full(len(cuis), -1.0, dtype=np.float64)
        M = self._sim_matrix
        if M is None:
            for i, c in enumerate(cuis):
                sims[i] = self._similarity(c, unit_vectors)
            return sims
        row_get = self._sim_row.get
        cnt_get = self.cdb.cui2count_train.get
        thr = self.config.train_count_threshold
        rows: List[int] = []
        pos: List[int] = []
        for i, c in enumerate(cuis):
            r = row_get(c)
            if r is not None and cnt_get(c, 0) >= thr:
                rows.append(r)
                pos.append(i)
        if rows:
            sims[pos] = M[rows] @ self._sim_doc_vec(unit_vectors)
        return sims

    # -- public API -------------------------------------------------------

    def annotate(self, text: str) -> List[dict]:
        """Full per-document pipeline; returns flattened entity dicts
        (only the non-overlapping "main" annotations, like
        ``CAT.get_entities``)."""
        return self.annotate_full(text)["entities"]

    def annotate_full(self, text: str) -> dict:
        """Like :meth:`annotate` but also exposing the intermediate linked
        entities (the reference's ``doc._.ents`` after the Linker — sorted
        by span length desc as a side effect of create_main_ann,
        postprocessing.py:47) and the token list, for parity tests."""
        text = text[: self.config.max_document_length]
        tokens = process_text(text, self.config, self.spell_checker,
                              self.stopwords, self.norm_cache,
                              self.tok_cache)
        raw_ents = self._ner(tokens)
        linked = self._link(raw_ents, tokens)
        # span char length == end - start (offsets index into text); the
        # reference's len(text[start:end]) sliced a substring per entity
        linked_sorted = sorted(linked, key=lambda e: e.end - e.start,
                               reverse=True)
        main = self._resolve_overlaps(linked, text)
        return {"entities": self._project(main, text),
                "linked": linked_sorted, "tokens": tokens}

    def annotate_spans(self, text: str):
        """Count-job projection: the same M1-M12 chain as
        :meth:`annotate_full` but emitting only what triple counting
        consumes — ``(starts, cuis, sources)`` parallel lists sorted by
        start offset, with cui2group canonicalization applied.  Skips the
        per-entity dict/meta assembly of :meth:`_project` (the fused
        count stage is the hot caller; equality with the full projection
        is asserted in tests)."""
        text = text[: self.config.max_document_length]
        tokens = process_text(text, self.config, self.spell_checker,
                              self.stopwords, self.norm_cache,
                              self.tok_cache)
        raw_ents = self._ner(tokens)
        linked = self._link(raw_ents, tokens)
        main = self._resolve_overlaps(linked, text)
        main.sort(key=lambda e: e.start)
        cui2group = self.cdb.addl_info.get("cui2group", {})
        starts = [e.start for e in main]
        if cui2group:
            g = cui2group.get
            cuis = [g(e.cui, e.cui) for e in main]
        else:
            cuis = [e.cui for e in main]
        sources = [text[e.start:e.end] for e in main]
        return starts, cuis, sources

    # -- NER (M6-M7) ------------------------------------------------------

    def _ner(self, tokens: List[Token]) -> List[Entity]:
        """Greedy longest-match over snames/name2cuis
        (reference NER.__call__, vocab_based_ner.py:36-97).

        Memoized state machine: the start-token resolution (norm/lower vs
        snames/name2cuis precedence) and each extension step
        (concat+lookup, reverse-order probe) depend only on the token's
        (norm, lower) pair — resp. (name, norm, lower) — so both are
        cached per annotator with the acceptance verdict folded in
        (:meth:`_ner_start_state` / :meth:`_ner_ext_state` replay the
        reference logic on miss).  The hot loop is then one dict hit per
        token / per extension step.  ``is_stop`` and the all-upper token
        scan stay live (token-dependent)."""
        cdb = self.cdb
        cfg = self.config
        max_skip = cfg.max_skip_tokens
        ents: List[Entity] = []

        mc = getattr(cdb, "mutation_count", 0)
        if mc != self._ner_cache_version:
            self._ner_start_cache.clear()
            self._ner_ext_cache.clear()
            self._ner_cache_version = mc
        start_cache = self._ner_start_cache
        ext_cache = self._ner_ext_cache
        start_get = start_cache.get
        ext_get = ext_cache.get
        n_ents = 0

        _doc = [t for t in tokens if not t.to_skip]
        n = len(_doc)
        for i in range(n):
            tkn = _doc[i]
            norm = tkn.norm
            key = norm if norm == tkn.lower else (norm, tkn.lower)
            st = start_get(key)
            if st is None:
                st = start_cache[key] = self._ner_start_state(
                    norm, tkn.lower)
            name, code, cuis = st
            # code: 0 = no annotation; 1 = accept; 2 = accept iff token
            # is upper-case (single-token branch of the acceptance rules)
            if code and not tkn.is_stop and (code == 1 or tkn.is_upper):
                ents.append(Entity([tkn], name, cuis, n_ents))
                n_ents += 1
            if not name:
                continue
            tkns = [tkn]
            for j in range(i + 1, n):
                if _doc[j].idx - _doc[j - 1].idx - 1 > max_skip:
                    break
                tkn = _doc[j]
                tkns.append(tkn)
                ekey = (name, tkn.norm) if tkn.norm == tkn.lower \
                    else (name, tkn.norm, tkn.lower)
                ex = ext_get(ekey)
                if ex is None:
                    ex = ext_cache[ekey] = self._ner_ext_state(
                        name, tkn.norm, tkn.lower)
                new_name, code, cuis, is_ext = ex
                if is_ext is None:     # no extension, no reverse: stop
                    break
                # code: 0 = no annotation; 1 = accept; 2 = accept iff all
                # matched tokens are upper-case (multi-token branch)
                if code and (code == 1
                             or all(t.is_upper for t in tkns)):
                    ents.append(Entity(list(tkns), new_name, cuis, n_ents))
                    n_ents += 1
                if is_ext:             # reverse match keeps the old name
                    name = new_name
        if len(start_cache) > 1_000_000:   # bound per-actor heap
            start_cache.clear()
        if len(ext_cache) > 2_000_000:
            ext_cache.clear()
        return ents

    def _ner_start_state(self, norm: str, lower: str) -> tuple:
        """Start-token resolution + acceptance verdict, computed once per
        distinct (norm, lower).  Returns ``(name, code, cuis)`` where
        ``name`` is the resolved match prefix ('' = not in snames/names:
        no extension), ``cuis`` the live name2cuis list and ``code`` the
        single-token acceptance verdict (see _ner)."""
        snames = self.cdb.snames
        name2cuis = self.cdb.name2cuis
        nv_in_names = None
        nv_in_snames = None
        versions = (norm,) if norm == lower else (norm, lower)
        for name_version in versions:
            if nv_in_snames is None and name_version in snames:
                nv_in_snames = name_version
            if nv_in_names is None and name_version in name2cuis:
                nv_in_names = name_version
        if nv_in_names is not None:
            name = nv_in_names
        elif nv_in_snames is not None:
            name = nv_in_snames
        else:
            return ("", 0, None)
        cuis = name2cuis.get(name)
        if cuis is None or len(name) < self._min_name_len:
            return (name, 0, cuis)
        # single-token acceptance (vocab_based_annotator.py:13-65):
        # upper-CDB-name rule demands an upper token; short names demand
        # a single upper token — both collapse to "needs token.is_upper"
        alpha = self._check_upper and self._name_isupper_get(name, False)
        gamma = len(name) >= self._upper_limit
        return (name, 1 if (gamma and not alpha) else 2, cuis)

    def _ner_ext_state(self, name: str, norm: str, lower: str) -> tuple:
        """One extension step of the greedy matcher, computed once per
        distinct (name, norm, lower).  Returns
        ``(new_name, code, cuis, is_ext)``: ``is_ext`` None = dead end
        (break), True = name extended, False = reverse-order match (name
        stays); ``code`` is the multi-token acceptance verdict."""
        cfg = self.config
        snames = self.cdb.snames
        name2cuis = self.cdb.name2cuis
        sep = cfg.separator
        name_changed = False
        name_reverse = None
        new_name = None
        versions = (norm,) if norm == lower else (norm, lower)
        for name_version in versions:
            _name = name + sep + name_version
            if _name in snames:
                new_name = _name
                name_changed = True
                break
            if cfg.try_reverse_word_order:
                _name_rev = name_version + sep + name
                if _name_rev in snames:
                    name_reverse = _name_rev
        if name_changed:
            nm, is_ext = new_name, True
        elif name_reverse is not None:
            nm, is_ext = name_reverse, False
        else:
            return (None, 0, None, None)
        cuis = name2cuis.get(nm)
        if cuis is None or len(nm) < self._min_name_len \
                or len(nm) < self._upper_limit:
            # multi-token acceptance needs len >= upper_case_limit_len
            # (the single-upper-token arm can't fire with >1 token)
            return (nm, 0, cuis, is_ext)
        alpha = self._check_upper and self._name_isupper_get(nm, False)
        return (nm, 2 if alpha else 1, cuis, is_ext)

    def _maybe_annotate(self, name: str, tkns: List[Token],
                        ents: List[Entity]) -> None:
        """Acceptance rules (reference maybe_annotate_name,
        vocab_based_annotator.py:13-65).  Config constants hoisted to
        instance attributes (this runs once per CANDIDATE, ~350/doc on
        dense pages — attribute chains were a profile hotspot)."""
        if self._check_upper and self._name_isupper_get(name, False):
            if not all(t.is_upper for t in tkns):
                return
        if len(name) < self._min_name_len:
            return
        if len(name) >= self._upper_limit or \
                (len(tkns) == 1 and tkns[0].is_upper):
            ents.append(Entity(list(tkns), name,
                               self.cdb.name2cuis[name], len(ents)))

    # -- Linker (M8-M10) ---------------------------------------------------

    def _link(self, ents: List[Entity], tokens: List[Token]) -> List[Entity]:
        """Inference-path linking (reference Linker.__call__,
        context_based_linker.py:89-129)."""
        cfg = self.config
        cdb = self.cdb
        linked: List[Entity] = []
        ctx_cache: Optional[_DocContext] = None

        for ent in ents:
            name = ent.detected_name
            cuis = ent.link_candidates
            if not cuis:
                continue
            do_disamb = (len(name) < cfg.disamb_length_limit
                         or (len(cuis) == 1 and
                             cdb.name2cuis2status[name][cuis[0]] in ("N", "PD"))
                         or len(cuis) > 1)
            if do_disamb:
                if ctx_cache is None:
                    ctx_cache = _DocContext(tokens, self.vocab, cfg)
                cui, sim = self._disambiguate(cuis, ent, name, ctx_cache)
            else:
                cui = cuis[0]
                if cfg.always_calculate_similarity:
                    if ctx_cache is None:
                        ctx_cache = _DocContext(tokens, self.vocab, cfg)
                    sim = self._similarity(
                        cui, self._unit_context(ctx_cache.vectors_for(ent)))
                else:
                    sim = 1.0  # direct link (context_based_linker.py:115)

            if cui and cfg.check_filters(cui):
                th_type = cfg.similarity_threshold_type
                threshold = cfg.similarity_threshold
                if th_type == "dynamic":
                    threshold = cdb.cui2average_confidence.get(cui, 0.0) * threshold
                if sim >= threshold:
                    ent.cui = cui
                    ent.context_similarity = sim
                    linked.append(ent)
        return linked

    def _similarity(self, cui: str, unit_vectors: Dict[str, np.ndarray]
                    ) -> float:
        """Weighted cosine over context sizes (reference _similarity,
        vector_context_model.py:112-139).  Takes PRE-normalized doc-context
        vectors (see :meth:`_unit_context`): the same doc vector is scored
        against every candidate CUI, so normalizing per candidate wasted
        ~20% of annotate time; CUI-side unit vectors are precomputed at
        load (``_cui_unit_vectors``)."""
        cfg = self.config
        cdb = self.cdb
        cui_vecs = self._cui_unit_vectors.get(cui)
        if cui_vecs and cdb.cui2count_train.get(cui, 0) >= cfg.train_count_threshold:
            sim = 0.0
            for ctx_type, weight in cfg.context_vector_weights.items():
                v = unit_vectors.get(ctx_type)
                cv = cui_vecs.get(ctx_type)
                if v is not None and cv is not None:
                    sim += weight * float(np.dot(v, cv))
            return sim
        return -1.0

    @staticmethod
    def _unit_context(vectors: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return {k: _unitvec(v) for k, v in vectors.items()}

    def _disambiguate(self, cuis: List[str], ent: Entity, name: str,
                      ctx: "_DocContext") -> Tuple[Optional[str], float]:
        """Reference ContextModel.disambiguate
        (vector_context_model.py:141-185), incl. prefer_primary_name and
        prefer_frequent_concepts boosts."""
        cfg = self.config
        cdb = self.cdb
        if cfg.filter_before_disamb:
            cuis = [c for c in cuis if cfg.check_filters(c)]
        if not cuis:
            return None, 0.0
        unit_vectors = self._unit_context(ctx.vectors_for(ent))
        sims = self._similarity_many(cuis, unit_vectors)

        if cfg.prefer_primary_name > 0:
            statuses = cdb.name2cuis2status.get(name, {})
            for i, cui in enumerate(cuis):
                if sims[i] > 0 and statuses.get(cui, "") in ("P", "PD"):
                    sims[i] = min(0.99, sims[i] + sims[i] * cfg.prefer_primary_name)
        if cfg.prefer_frequent_concepts > 0:
            cnts = np.fromiter((cdb.cui2count_train.get(c, 0) for c in cuis),
                               dtype=np.float64, count=len(cuis))
            mn = cnts.min() if len(cnts) else 0.0
            m = mn if mn > 0 else 1.0
            scales = np.zeros(len(cuis), dtype=np.float64)
            hot = cnts > 10
            if hot.any():
                scales[hot] = np.log10(cnts[hot] / m) \
                    * cfg.prefer_frequent_concepts
            sims = np.minimum(0.99, sims + sims * scales)

        mx = int(np.argmax(sims))
        return cuis[mx], float(sims[mx])

    # -- overlap resolution (M11) -----------------------------------------

    def _resolve_overlaps(self, ents: List[Entity], text: str) -> List[Entity]:
        """Longest-span-first token-claim sweep (reference create_main_ann,
        postprocessing.py:37-62; stable sort by raw span length desc)."""
        ordered = sorted(ents, key=lambda e: e.end - e.start,
                         reverse=True)
        claimed: Set[int] = set()
        add = claimed.add
        main: List[Entity] = []
        ap = main.append
        for ent in ordered:
            tks = ent.tokens
            if len(tks) == 1:          # dominant case: no list/genexpr
                ix = tks[0].idx
                if ix not in claimed:
                    add(ix)
                    ap(ent)
                continue
            idxs = [t.idx for t in tks]
            if any(ix in claimed for ix in idxs):
                continue
            claimed.update(idxs)
            ap(ent)
        return main

    # -- projection (M12-M13) ---------------------------------------------

    def _project(self, ents: List[Entity], text: str) -> List[dict]:
        cdb = self.cdb
        cui2group = cdb.addl_info.get("cui2group", {})
        if getattr(cdb, "mutation_count", 0) != self._cui_proj_version:
            # trainer paths mutate the CDB under a live annotator
            self._cui_proj_meta.clear()
            self._cui_proj_version = getattr(cdb, "mutation_count", 0)
        meta_cache = self._cui_proj_meta
        out = []
        for ent in sorted(ents, key=lambda e: e.start):
            cui = ent.cui
            if cui2group:
                cui = cui2group.get(cui, cui)  # M12, postprocessing.py:12-14
            meta = meta_cache.get(cui)
            if meta is None:
                meta = meta_cache[cui] = (
                    sorted(cdb.cui2type_ids.get(cui, set())),
                    cdb.cui2preferred_name.get(cui, ""))
            out.append({
                "ent_id": ent.ent_id,
                "cui": cui,
                "start": ent.start,
                "end": ent.end,
                "source_value": text[ent.start:ent.end],
                "detected_name": ent.detected_name,
                "context_similarity": float(ent.context_similarity),
                "type_ids": meta[0],
                "pretty_name": meta[1],
            })
        return out


class _DocContext:
    """Per-document vectorized context state: one vocab gather per doc.

    Precomputes, for every token: its row in the vocab matrix (-1 if absent)
    and whether it is a context token (not skip/stop/digit/punct — reference
    get_context_tokens, vector_context_model.py:44-50).  Entity context
    vectors are then numpy slices + gathers instead of per-token dict walks.
    """

    def __init__(self, tokens: List[Token], vocab: Vocab,
                 config: EngineConfig) -> None:
        self.tokens = tokens
        self.vocab = vocab
        self.config = config
        n = len(tokens)
        self.vec_idx = np.fromiter(
            (vocab.word2idx.get(t.lower, -1) for t in tokens),
            dtype=np.int64, count=n)
        self.ctx_ok = np.fromiter(
            (not (t.to_skip or t.is_stop or t.is_digit or t.is_punct)
             for t in tokens), dtype=bool, count=n)
        # sorted positions of context-eligible tokens: window membership
        # becomes two scalar searchsorteds instead of a boolean scan +
        # nonzero per entity side
        self.ok_pos = np.nonzero(self.ctx_ok)[0]
        # distance-decay weights, precomputed out to the largest window
        self.max_size = max(config.context_vector_sizes.values(), default=0)
        self.decay = _decay_table(self.max_size)

    def vectors_for(self, ent: Entity) -> Dict[str, np.ndarray]:
        """Reference get_context_vectors (vector_context_model.py:54-93):
        mean of [decay-weighted left] + [center] + [decay-weighted right]
        vocab vectors, per context size.

        A smaller window's filtered-token list is a PREFIX of the largest
        window's (closest-to-entity first), with identical decay steps —
        so each side is gathered and decay-weighted once at ``max_size``
        and every context size reads one row of the running cumsum,
        instead of re-slicing and re-gathering per size."""
        cfg = self.config
        V = self.vocab.vectors
        start_ind = ent.tokens[0].idx
        end_ind = ent.tokens[-1].idx
        max_size = self.max_size
        vectors: Dict[str, np.ndarray] = {}

        opos = self.ok_pos
        a = int(opos.searchsorted(start_ind))          # first ok >= start
        b = int(opos.searchsorted(end_ind + 1))        # first ok > span end
        left_pos = opos[int(opos.searchsorted(start_ind - max_size)):a][::-1]
        right_pos = opos[b:int(opos.searchsorted(end_ind + 1 + max_size))]

        def side(pos: np.ndarray):
            # steps enumerate ALL filtered-context tokens (including
            # vocab-missing ones) — reference enumerate() semantics.
            idx = self.vec_idx[pos]
            mask = idx >= 0
            steps = np.nonzero(mask)[0]
            if not steps.size:
                return steps, None
            cum = np.cumsum(V[idx[mask]] * self.decay[steps][:, None],
                            axis=0)
            return steps, cum

        lsteps, lcum = side(left_pos)
        rsteps, rcum = side(right_pos)
        # Center = the full token range of the span INCLUDING skip-gap tokens
        # (reference: tokens_center = list(entity), a Span over
        # doc[start:end+1] — vector_context_model.py:48).
        center_idx = self.vec_idx[start_ind:end_ind + 1]
        center_idx = center_idx[center_idx >= 0]
        use_center = (not cfg.context_ignore_center_tokens) \
            and center_idx.size > 0
        if use_center:
            csum = V[center_idx].sum(axis=0, dtype=np.float64)

        for ctx_type, size in cfg.context_vector_sizes.items():
            ml = a - int(opos.searchsorted(start_ind - size))
            mr = int(opos.searchsorted(end_ind + 1 + size)) - b
            kl = int(lsteps.searchsorted(ml)) if lcum is not None else 0
            kr = int(rsteps.searchsorted(mr)) if rcum is not None else 0
            n_rows = kl + kr + (int(center_idx.size) if use_center else 0)
            if n_rows == 0:
                continue
            total = np.zeros(V.shape[1], dtype=np.float64)
            if kl:
                total += lcum[kl - 1]
            if use_center:
                total += csum
            if kr:
                total += rcum[kr - 1]
            vectors[ctx_type] = total / n_rows
        return vectors


_DECAY_CACHE: Dict[int, np.ndarray] = {}


def _decay_table(max_size: int) -> np.ndarray:
    """Distance-decay weights out to ``max_size`` steps, cached per size
    (previously rebuilt for every document's ``_DocContext``)."""
    tbl = _DECAY_CACHE.get(max_size)
    if tbl is None:
        from medcat_ray.config import weighted_average
        tbl = np.array([weighted_average(s) for s in range(max_size)],
                       dtype=np.float64)
        _DECAY_CACHE[max_size] = tbl
    return tbl


def _unitvec(v: np.ndarray) -> np.ndarray:
    # Reference medcat/utils/matutils.py:5.  sqrt(v·v) == np.linalg.norm
    # for 1-D real input, without the gufunc dispatch overhead.
    norm = np.sqrt(v @ v)
    return v / norm if norm > 0 else v
