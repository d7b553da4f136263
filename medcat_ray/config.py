"""Engine configuration.

Defaults mirror the reference MedCAT config (``/root/reference/medcat/config.py``)
so that the annotation semantics match its unit-test expectations.  Unlike the
reference (mutable pydantic objects mutated mid-run, `medcat/cat.py:964-1038`),
our config is an immutable-by-convention snapshot taken at job start; stages
receive a frozen copy in their constructor.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace
from typing import Dict, FrozenSet, Tuple


def weighted_average(step: int, factor: float = 0.0004) -> float:
    """Distance-decay weight for context tokens.

    Reference: ``medcat/utils/config_utils.py:69-74``.
    """
    return max(0.1, 1 - (step ** 2 * factor))


@dataclass(frozen=True)
class EngineConfig:
    # --- general (medcat/config.py:360-430) ---
    separator: str = "~"                    # name-token join char (config.py:364)
    spell_check: bool = True                # config.py:367
    spell_check_deep: bool = False          # config.py:373
    spell_check_len_limit: int = 7          # config.py:376
    diacritics: bool = False                # config.py:370
    max_document_length: int = 1_000_000    # config.py:420

    # --- preprocessing (medcat/config.py:400-427) ---
    words_to_skip: FrozenSet[str] = frozenset({"nos"})          # config.py:403
    keep_punct: FrozenSet[str] = frozenset({".", ":"})          # config.py:405
    skip_stopwords: bool = False                                 # config.py:412
    min_len_normalize: int = 5                                   # config.py:414
    # POS tags whose tokens keep their surface form instead of the lemma
    # (config.py:407; consulted by both the normalizer,
    # utils/normalizers.py:185-187, and name cleaning,
    # preprocessing/cleaners.py:43-44).  The reference's own
    # lemmatization-sensitive test configs empty this set; here the
    # deterministic ``morph_tag`` stands in for spaCy's statistical tagger
    # (documented deviation, SURVEY.md §7.4).
    do_not_normalize: FrozenSet[str] = frozenset(
        {"VBD", "VBG", "VBN", "VBP", "JJS", "JJR"})              # config.py:407

    # --- cdb_maker (medcat/config.py:278-290) ---
    name_versions: Tuple[str, ...] = ("LOWER", "CLEAN")          # config.py:280
    multi_separator: str = "|"                                   # config.py:282
    min_letters_required: int = 2                                # config.py:288

    # --- ner (medcat/config.py:430-445) ---
    min_name_len: int = 3                    # config.py:432
    max_skip_tokens: int = 2                 # config.py:434
    check_upper_case_names: bool = False     # config.py:437
    upper_case_limit_len: int = 4            # config.py:439
    try_reverse_word_order: bool = False     # config.py:442

    # --- linking (medcat/config.py:530-580) ---
    context_vector_sizes: Dict[str, int] = field(
        default_factory=lambda: {"xlong": 27, "long": 18, "medium": 9, "short": 3})   # config.py:538
    context_vector_weights: Dict[str, float] = field(
        default_factory=lambda: {"xlong": 0.1, "long": 0.4, "medium": 0.4, "short": 0.1})  # config.py:540
    disamb_length_limit: int = 3             # config.py:549
    filter_before_disamb: bool = False       # config.py:551
    train_count_threshold: int = 1           # config.py:553
    always_calculate_similarity: bool = False  # config.py:556
    similarity_threshold_type: str = "static"  # config.py:562
    similarity_threshold: float = 0.25         # config.py:563
    prefer_primary_name: float = 0.35          # config.py:568
    prefer_frequent_concepts: float = 0.35     # config.py:570
    context_ignore_center_tokens: bool = False  # config.py:577
    negative_probability: float = 0.5           # config.py:564 (training)
    calculate_dynamic_threshold: bool = False   # config.py:558 (training)

    # --- linking filters (medcat/config.py:466-529): allow/deny CUI sets ---
    cuis_allow: FrozenSet[str] = frozenset()     # empty = allow all
    cuis_exclude: FrozenSet[str] = frozenset()

    # --- relations (medcat/config_rel_cat.py:18-22) ---
    relation_window_chars: int = 300
    relation_pred: str = "co_occurs_with"

    def check_filters(self, cui: str) -> bool:
        """Reference: ``medcat/utils/filters.py:7-80`` — allowlist ∩ blocklist."""
        if cui in self.cuis_exclude:
            return False
        return not self.cuis_allow or cui in self.cuis_allow

    def with_overrides(self, **kw) -> "EngineConfig":
        return replace(self, **kw)

    def to_dict(self) -> dict:
        """JSON-able snapshot (model-pack serialization, SURVEY.md S8)."""
        import dataclasses
        out = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, frozenset):
                v = sorted(v)
            elif isinstance(v, tuple):
                v = list(v)
            out[f.name] = v
        return out

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        import dataclasses
        kw = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            if isinstance(getattr(DEFAULT_CONFIG, f.name), frozenset):
                v = frozenset(v)
            elif isinstance(getattr(DEFAULT_CONFIG, f.name), tuple):
                v = tuple(v)
            kw[f.name] = v
        return cls(**kw)


# Compiled once at import; the reference compiles these in Config.__init__
# (medcat/config.py:610-615).
PUNCT_CHECKER = re.compile(r"[^a-z0-9]+")


def word_skipper_pattern(words_to_skip: FrozenSet[str]) -> "re.Pattern[str]":
    # medcat/config.py:612-613
    return re.compile("^({})$".format("|".join(sorted(words_to_skip)) or "a^"))


DEFAULT_CONFIG = EngineConfig()
