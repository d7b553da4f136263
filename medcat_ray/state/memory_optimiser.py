"""CDB memory optimiser — re-expression of the reference's
``medcat/utils/memory_optimiser.py`` (perform_optimisation /
unoptimise_cdb, ``DelegatingDict`` / ``DelegatingValueSet``): the eight
``cui2<...>`` dicts share one key set, so storing them as EIGHT hash
tables wastes ~7 hash tables of overhead; the reference unifies them
into one ``cui2many`` dict of value-lists and replaces each attribute
with a delegating mapping view.  ``snames`` (the sub-name set used by
dictionary NER) is likewise delegated to membership over the values of
``cui2snames`` instead of a second materialized set.

This matters on a Ray actor pool: the CDB is broadcast once via
``ray.put`` but DESERIALIZED per actor — 24 actors × the dict overhead
is real worker heap.  The views keep full Mapping semantics (get /
set / del / contains / iter / len / keys / items / values), so the
annotator, trainers and filters run unmodified on an optimised CDB
(asserted by tests/test_memory_optimiser.py: identical entities,
identical training mutations, exact roundtrip).

Unset slots hold a ``_MISSING`` sentinel: a key present in one source
dict but absent from another must stay absent from the second's view —
exactly the reference's per-slot ``None``-default semantics, but
sentinel-based so legitimate ``None`` values survive.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Sequence

CUI_DICT_NAMES_TO_COMBINE = [
    "cui2names", "cui2snames", "cui2context_vectors",
    "cui2count_train", "cui2tags", "cui2type_ids",
    "cui2preferred_name", "cui2average_confidence",
]

_MISSING = object()


class ColumnarDictView:
    """Mapping view over one slot of a shared (key -> value-list) store
    (reference ``DelegatingDict``, memory_optimiser.py:67-135)."""

    __slots__ = ("store", "slot", "nslots")

    def __init__(self, store: Dict[str, List[Any]], slot: int,
                 nslots: int) -> None:
        self.store = store
        self.slot = slot
        self.nslots = nslots

    # -- read ----------------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        v = self.store[key][self.slot]
        if v is _MISSING:
            raise KeyError(key)
        return v

    def get(self, key: str, default: Any = None) -> Any:
        row = self.store.get(key)
        if row is None:
            return default
        v = row[self.slot]
        return default if v is _MISSING else v

    def __contains__(self, key: str) -> bool:
        row = self.store.get(key)
        return row is not None and row[self.slot] is not _MISSING

    def __iter__(self) -> Iterator[str]:
        slot = self.slot
        for k, row in self.store.items():
            if row[slot] is not _MISSING:
                yield k

    def __len__(self) -> int:
        slot = self.slot
        return sum(1 for row in self.store.values()
                   if row[slot] is not _MISSING)

    def keys(self):
        return iter(self)

    def values(self):
        slot = self.slot
        for row in self.store.values():
            if row[slot] is not _MISSING:
                yield row[slot]

    def items(self):
        slot = self.slot
        for k, row in self.store.items():
            if row[slot] is not _MISSING:
                yield k, row[slot]

    # -- write ---------------------------------------------------------
    def __setitem__(self, key: str, value: Any) -> None:
        row = self.store.get(key)
        if row is None:
            row = [_MISSING] * self.nslots
            self.store[key] = row
        row[self.slot] = value

    def setdefault(self, key: str, default: Any = None) -> Any:
        if key in self:
            return self[key]
        self[key] = default
        return default

    def __delitem__(self, key: str) -> None:
        if key not in self:
            raise KeyError(key)
        self.store[key][self.slot] = _MISSING

    def pop(self, key: str, default: Any = _MISSING) -> Any:
        try:
            v = self[key]
        except KeyError:
            if default is _MISSING:
                raise
            return default
        del self[key]
        return v

    def update(self, other) -> None:
        items = other.items() if hasattr(other, "items") else other
        for k, v in items:
            self[k] = v

    def to_dict(self) -> dict:
        return dict(self.items())

    def __eq__(self, other: object) -> bool:
        if isinstance(other, (dict, ColumnarDictView)):
            return dict(self.items()) == dict(
                other.items() if not isinstance(other, dict)
                else other.items())
        return NotImplemented

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"ColumnarDictView(slot={self.slot}, n={len(self)})"


class DelegatingSnames:
    """Set-like view answering ``x in snames`` from the union of
    ``cui2snames`` values without materializing the union (reference
    ``DelegatingValueSet``, memory_optimiser.py:138-171).  Membership
    is O(n_cuis) per probe — see the perform_optimisation docstring for
    why this is opt-in here, unlike the reference."""

    __slots__ = ("cui2snames",)

    def __init__(self, cui2snames) -> None:
        self.cui2snames = cui2snames

    def __contains__(self, value: str) -> bool:
        for s in (self.cui2snames.values()
                  if hasattr(self.cui2snames, "values")
                  else self.cui2snames):
            if value in s:
                return True
        return False

    def __iter__(self) -> Iterator[str]:
        seen = set()
        for s in self.cui2snames.values():
            for v in s:
                if v not in seen:
                    seen.add(v)
                    yield v

    def __len__(self) -> int:
        return sum(1 for _ in self)

    def update(self, values) -> None:
        raise RuntimeError(
            "snames is delegated to cui2snames while memory-optimised; "
            "unoptimise_cdb(cdb) before mutating it directly")

    def to_set(self) -> set:
        return set(self)


def perform_optimisation(cdb, optimise_cuis: bool = True,
                         optimise_snames: bool = False,
                         dict_names: Sequence[str] =
                         tuple(CUI_DICT_NAMES_TO_COMBINE)) -> None:
    """Unify the ``cui2<...>`` dicts of ``cdb`` into one
    ``cdb.cui2many`` store and replace each attribute with a view;
    optionally delegate ``snames`` (reference perform_optimisation,
    memory_optimiser.py:241-303).  Idempotent; skips absent attrs.

    DOCUMENTED DEVIATION: ``optimise_snames`` defaults to FALSE here
    (reference defaults True).  This engine's dictionary NER probes
    ``snames`` once per extension step in the hot loop
    (core/annotator.py:311,344), and the delegating set answers
    membership in O(n_cuis) — fine in the reference's spaCy-dominated
    pipeline, ruinous at 37k docs/s.  The cui2many unification gives
    the actual per-actor heap win either way."""
    parts = getattr(cdb, "_memory_optimised_parts", set())
    if optimise_cuis and "CUIS" not in parts:
        names = [n for n in dict_names if hasattr(cdb, n)]
        nslots = len(names)
        store: Dict[str, List[Any]] = {}
        for slot, attr in enumerate(names):
            for k, v in getattr(cdb, attr).items():
                row = store.get(k)
                if row is None:
                    row = [_MISSING] * nslots
                    store[k] = row
                row[slot] = v
        cdb.cui2many = store
        cdb._cui2many_names = list(names)
        for slot, attr in enumerate(names):
            setattr(cdb, attr, ColumnarDictView(store, slot, nslots))
        parts.add("CUIS")
    if optimise_snames and "snames" not in parts \
            and hasattr(cdb, "snames"):
        cdb.snames = DelegatingSnames(cdb.cui2snames)
        parts.add("snames")
    cdb._memory_optimised_parts = parts


def unoptimise_cdb(cdb) -> None:
    """Restore plain dicts/sets (reference unoptimise_cdb,
    memory_optimiser.py:338-352)."""
    parts = getattr(cdb, "_memory_optimised_parts", set())
    if "CUIS" in parts:
        for slot, attr in enumerate(cdb._cui2many_names):
            view = getattr(cdb, attr)
            setattr(cdb, attr, view.to_dict())
        del cdb.cui2many
        del cdb._cui2many_names
        parts.discard("CUIS")
    if "snames" in parts:
        cdb.snames = cdb.snames.to_set()
        parts.discard("snames")
    cdb._memory_optimised_parts = parts
