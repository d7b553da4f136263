"""Pure-Python text primitives: tokenizer, tagger, lemmatizer, normalizer,
spell checker.

These reimplement the *semantics* of the reference's spaCy-based
preprocessing without spaCy (not available here, and not needed for a
Ray-native engine):

* tokenizer   — ``spacy_split_all`` (/root/reference/medcat/preprocessing/tokenizers.py:38-54):
                every char outside ``[A-Za-z0-9@]`` splits; each such char is
                its own token; whitespace separates and is dropped.
* tagger      — ``tag_skip_and_punct`` (/root/reference/medcat/preprocessing/taggers.py:28-52).
* normalizer  — ``TokenNormalizer`` (/root/reference/medcat/utils/normalizers.py:162-205),
                with a frozen rule lemmatizer instead of spaCy's
                ``en_core_web_md`` (documented deviation, SURVEY.md §7.4): the
                SAME lemmatizer is used at CDB-build time and at annotation
                time, so name matching is internally consistent.
* spell check — ``BasicSpellChecker`` (/root/reference/medcat/utils/normalizers.py:10-124),
                with deterministic tie-breaking (the reference's
                ``max(set, key=P)`` depends on set iteration order; we sort
                candidates first — SURVEY.md §7.4).

Everything here is stateless module-level code plus small classes that are
constructed once per Ray actor (in the annotate stage ``__init__``) and then
invoked per batch.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Set, Tuple

from medcat_ray.config import EngineConfig, PUNCT_CHECKER, word_skipper_pattern

# ---------------------------------------------------------------------------
# Tokenizer (M2)
# ---------------------------------------------------------------------------

# spacy_split_all semantics: token chars are [A-Za-z0-9@]; any other
# non-space char is a single-char token (the reference's infix regex matches
# one char at a time, so runs of punctuation become one token per char).
#
# Whitespace: spaCy splits on single ' ' separators but EMITS tokens for all
# other whitespace — each extra space in a run, and each '\n'/'\t' char,
# occupies a token position (tagged punct+skip).  This matters for
# ``max_skip_tokens`` gap arithmetic: the reference golden
# (/root/reference/tests/test_ner.py:62,79-84) only holds if "Movar    Viruses"
# (4 spaces) has a 3-token gap.
_TOKEN_RE = re.compile(r"[A-Za-z0-9@]+|[^A-Za-z0-9@\s]")
_TOKEN_RE_DIACRITICS = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿ0-9@]+|[^A-Za-zÀ-ÖØ-öø-ÿ0-9@\s]")

_CONTAINS_NUMBER = re.compile(r"[0-9]+")  # medcat/utils/normalizers.py:7


class Token:
    """One annotated token; the transient per-doc IR (SURVEY.md §1.1)."""

    __slots__ = ("text", "lower", "start", "end", "idx",
                 "is_punct", "to_skip", "is_stop", "is_digit", "is_upper",
                 "norm")

    def __init__(self, text: str, start: int, end: int, idx: int) -> None:
        self.text = text
        self.lower = text.lower()
        self.start = start
        self.end = end
        self.idx = idx
        self.is_punct = False
        self.to_skip = False
        self.is_stop = False
        self.is_digit = text.isdigit()
        self.is_upper = text.isupper()
        self.norm = self.lower

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Token({self.text!r}@{self.start})"


_LOWER_ALNUM = frozenset("abcdefghijklmnopqrstuvwxyz0123456789")
_WORD_RE = re.compile(r"[A-Za-z0-9@]+")
_WORD_RE_DIACRITICS = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿ0-9@]+")


# One C-level scan for the whole tokenization (measured ~45% of annotate
# wall when this was a Python while-loop): word runs | any non-word
# non-space char (single-char token; '\n'/'\t' are NOT excluded — only the
# literal space is) | a space PRECEDED by a space (the 2nd..kth spaces of a
# run tokenize, the first separates — spaCy whitespace semantics above).
_SCAN_RE = re.compile(r"[A-Za-z0-9@]+|[^A-Za-z0-9@ ]|(?<= ) ")
_SCAN_RE_DIACRITICS = re.compile(
    r"[A-Za-zÀ-ÖØ-öø-ÿ0-9@]+|[^A-Za-zÀ-ÖØ-öø-ÿ0-9@ ]|(?<= ) ")


def tokenize(text: str, diacritics: bool = False) -> List[Token]:
    """Split ``text`` into tokens with char offsets (reference M2).

    Word chars group; every other non-space char (punctuation, '\\n', '\\t')
    is a single-char token; in a run of k spaces the first is a separator and
    the remaining k-1 are single-space tokens (spaCy whitespace-token
    semantics — see module comment)."""
    scan = _SCAN_RE_DIACRITICS if diacritics else _SCAN_RE
    return [Token(m.group(0), m.start(), m.end(), idx)
            for idx, m in enumerate(scan.finditer(text))]


# ---------------------------------------------------------------------------
# Stopwords — frozen English list.
#
# The reference takes ``token.is_stop`` from spaCy's English stopword list
# (used at medcat/ner/vocab_based_ner.py:60 and
# medcat/linking/vector_context_model.py:44-50).  We freeze a compact common
# English list; it is overridable per-job via ``tag_tokens(stopwords=...)``.
# ---------------------------------------------------------------------------

STOPWORDS: Set[str] = frozenset("""
a about above after again against all am an and any are as at be because been
before being below between both but by can cannot could did do does doing down
during each few for from further had has have having he her here hers herself
him himself his how i if in into is it its itself just me more most my myself
no nor not now of off on once only or other our ours ourselves out over own
same she should so some such than that the their theirs them themselves then
there these they this those through to too under until up very was we were
what when where which while who whom why will with you your yours yourself
yourselves
""".split())


def tag_tokens(tokens: List[Token], config: EngineConfig,
               stopwords: Optional[Set[str]] = None) -> List[Token]:
    """Tag punctuation / skip / stopword flags (reference M3,
    medcat/preprocessing/taggers.py:37-52)."""
    stop = STOPWORDS if stopwords is None else stopwords
    # The reference's word_skipper regex is ^(w1|w2|…)$ over the skip words
    # (medcat/config.py:612-613) — exactly set membership, which avoids both
    # the per-document pattern build and a per-token regex call.
    skip_words = config.words_to_skip
    keep_punct = config.keep_punct
    skip_stop = config.skip_stopwords
    for token in tokens:
        token.is_stop = token.lower in stop
        # PUNCT_CHECKER ([^a-z0-9]+, re.match) is true iff the FIRST char is
        # outside [a-z0-9] — a set test, not a regex call.
        if token.lower[0] not in _LOWER_ALNUM and token.text not in keep_punct:
            token.is_punct = True
            token.to_skip = True
        elif token.lower in skip_words:
            token.to_skip = True
        elif skip_stop and token.is_stop:
            token.to_skip = True
    return tokens


# ---------------------------------------------------------------------------
# Lemmatizer — frozen rule-based English lemmatizer (v1).
#
# Deviation from the reference (which uses spaCy ``en_core_web_md`` lemmas,
# medcat/utils/normalizers.py:183-192): no POS information is available, so a
# fixed suffix-rule set is applied.  The rule "strip a final 's'" is ordered
# first to reproduce the reference's observable golden behavior
# ('viruses' -> 'viruse', /root/reference/tests/test_ner.py:69-71).
# Consistency matters more than linguistic perfection: CDB name preparation
# and document normalization share this exact function.
# ---------------------------------------------------------------------------

_LEMMA_EXCEPTIONS: Dict[str, str] = {
    # --- common irregular plurals ---
    "children": "child", "men": "man", "women": "woman", "feet": "foot",
    "teeth": "tooth", "mice": "mouse", "geese": "goose", "people": "person",
    "lice": "louse", "oxen": "ox",
    # --- Latin/Greek plurals (the real-English medical-corpus gap:
    # mentions like 'diagnoses' only link to the CDB name 'diagnosis'
    # through the lemma; a suffix rule can't produce these) ---
    "diagnoses": "diagnosis", "prognoses": "prognosis",
    "metastases": "metastasis", "stenoses": "stenosis",
    "psychoses": "psychosis", "neuroses": "neurosis",
    "fibroses": "fibrosis", "scleroses": "sclerosis",
    "thromboses": "thrombosis", "anastomoses": "anastomosis",
    "prostheses": "prosthesis", "hypotheses": "hypothesis",
    "theses": "thesis", "syntheses": "synthesis", "analyses": "analysis",
    "crises": "crisis", "axes": "axis",
    "indices": "index", "appendices": "appendix", "matrices": "matrix",
    "vertices": "vertex", "apices": "apex", "cortices": "cortex",
    "varices": "varix", "helices": "helix",
    "nuclei": "nucleus", "fungi": "fungus", "bacilli": "bacillus",
    "bronchi": "bronchus", "alveoli": "alveolus", "calculi": "calculus",
    "stimuli": "stimulus", "radii": "radius", "foci": "focus",
    "loci": "locus", "thrombi": "thrombus", "villi": "villus",
    "glomeruli": "glomerulus", "emboli": "embolus", "uteri": "uterus",
    "vertebrae": "vertebra", "scapulae": "scapula", "ulnae": "ulna",
    "bursae": "bursa", "fistulae": "fistula", "sequelae": "sequela",
    "maculae": "macula", "papillae": "papilla", "petechiae": "petechia",
    "larvae": "larva", "aortae": "aorta",
    "criteria": "criterion", "phenomena": "phenomenon",
    "ganglia": "ganglion", "bacteria": "bacterium", "septa": "septum",
    "ova": "ovum", "sera": "serum", "atria": "atrium", "crania": "cranium",
    "labia": "labium", "ostia": "ostium", "diverticula": "diverticulum",
    "genera": "genus",
    # NOTE deliberately absent: 'data' (appears in the frozen documents
    # corpus vocabulary and is overwhelmingly used as a mass noun),
    # 'left'/'wound'/'bit'/'lay'/'rose'/'saw'/'ground' (noun/adjective
    # readings dominate in clinical text; a context-free lookup mapping
    # them to leave/wind/bite/... would corrupt more than it fixes).
}

# Irregular verb past / past-participle forms → base (fires only for
# tokens NOT gated by config.do_not_normalize — with the reference-default
# gate these tags are VBD/VBN and keep their surface form, matching
# medcat/utils/normalizers.py:185-187; with do_not_normalize=∅ — the
# reference's own model-creator scenario config — the lookup applies).
_IRREGULAR_VERB: Dict[str, str] = {
    "ran": "run", "took": "take", "taken": "take", "went": "go",
    "gone": "go", "fell": "fall", "fallen": "fall", "felt": "feel",
    "found": "find", "gave": "give", "given": "give", "got": "get",
    "gotten": "get", "had": "have", "kept": "keep", "knew": "know",
    "known": "know", "led": "lead", "lost": "lose", "made": "make",
    "meant": "mean", "met": "meet", "paid": "pay", "said": "say",
    "sold": "sell", "sent": "send", "sat": "sit", "spoke": "speak",
    "spoken": "speak", "stood": "stand", "told": "tell",
    "thought": "think", "threw": "throw", "thrown": "throw",
    "understood": "understand", "wore": "wear", "worn": "wear",
    "won": "win", "wrote": "write", "written": "write", "broke": "break",
    "broken": "break", "brought": "bring", "built": "build",
    "bought": "buy", "caught": "catch", "chose": "choose",
    "chosen": "choose", "came": "come", "done": "do", "drew": "draw",
    "drawn": "draw", "drank": "drink", "drunk": "drink", "drove": "drive",
    "driven": "drive", "eaten": "eat", "flew": "fly", "flown": "fly",
    "forgot": "forget", "forgotten": "forget", "froze": "freeze",
    "frozen": "freeze", "grew": "grow", "grown": "grow", "heard": "hear",
    "held": "hold", "hid": "hide", "hidden": "hide", "ridden": "ride",
    "risen": "rise", "rang": "ring", "rung": "ring", "sang": "sing",
    "sung": "sing", "sank": "sink", "sunk": "sink", "shaken": "shake",
    "shook": "shake", "shown": "show", "shrank": "shrink",
    "shrunk": "shrink", "slept": "sleep", "spent": "spend",
    "stolen": "steal", "stole": "steal", "struck": "strike",
    "swollen": "swell", "swam": "swim", "swum": "swim", "torn": "tear",
    "tore": "tear", "woke": "wake", "woken": "wake", "bled": "bleed",
    "bitten": "bite", "fed": "feed", "fought": "fight", "born": "bear",
    "borne": "bear",
}

# Closed comparative / superlative lists → base (JJR / JJS under the
# morphological tagger; lemma fires only when the tag is not gated).
_SUPERLATIVE: Dict[str, str] = {
    "largest": "large", "biggest": "big", "smallest": "small",
    "greatest": "great", "highest": "high", "lowest": "low",
    "best": "good", "worst": "bad", "oldest": "old",
    "youngest": "young", "newest": "new", "longest": "long",
    "shortest": "short", "fastest": "fast", "slowest": "slow",
    "strongest": "strong", "weakest": "weak", "earliest": "early",
    "latest": "late", "deepest": "deep", "widest": "wide",
    "heaviest": "heavy", "lightest": "light", "closest": "close",
    "nearest": "near", "furthest": "far", "farthest": "far",
    "easiest": "easy", "hardest": "hard", "simplest": "simple",
    "cheapest": "cheap", "safest": "safe", "broadest": "broad",
    "narrowest": "narrow", "thickest": "thick", "thinnest": "thin",
}
_COMPARATIVE: Dict[str, str] = {
    "larger": "large", "bigger": "big", "smaller": "small",
    "greater": "great", "higher": "high", "lower": "low",
    "better": "good", "worse": "bad", "older": "old",
    "younger": "young", "newer": "new", "longer": "long",
    "shorter": "short", "faster": "fast", "slower": "slow",
    "stronger": "strong", "weaker": "weak", "earlier": "early",
    "deeper": "deep", "wider": "wide", "heavier": "heavy",
    "lighter": "light", "closer": "close", "nearer": "near",
    "further": "far", "farther": "far", "easier": "easy",
    "harder": "hard", "simpler": "simple", "cheaper": "cheap",
    "safer": "safe", "broader": "broad", "narrower": "narrow",
    "thicker": "thick", "thinner": "thin", "fewer": "few",
    "lesser": "less",
}

# -ing words whose noun/function-word reading dominates out of context —
# the morphological tagger must not call these VBG (spaCy's statistical
# tagger reads them as NN/IN in typical clinical prose).
_ING_NOT_VERB = frozenset("""
morning evening during thing something anything nothing everything king
ring string spring wing sibling ceiling building finding feeling swelling
screening imaging dressing hearing bring sterling darling dumpling
""".split())

# -ed words that are not verb pasts (adjectives / nouns / -eed stems).
_ED_NOT_VERB = frozenset("""
hundred sacred naked wicked rugged crooked jagged ragged wretched
need feed speed seed bleed breed creed deed greed indeed reed exceed
proceed succeed red bed fed led wed shed sled bred
""".split())

LEMMATIZER_VERSION = "3"  # v3: POS-gating (do_not_normalize) + broadened
#                           lookup tables (Latin/Greek plurals, irregular
#                           verbs, comparatives/superlatives) + noun -es
#                           rules (ches/shes/xes/zes)


def morph_tag(word: str) -> Optional[str]:
    """Deterministic morphological tag guess for a lowercase word —
    ONLY for the tags the reference's ``do_not_normalize`` gate consults
    (medcat/config.py:407: VBD VBG VBN VBP JJS JJR).

    Deviation (documented, SURVEY.md §7.4): the reference reads
    ``token.tag_`` from spaCy's statistical tagger; with no context model
    here, suffix rules + closed exception lists decide.  VBP (non-3sg
    present) is indistinguishable from a base form without context and is
    never emitted.  Returns None for anything that doesn't look like a
    gated form."""
    if word in _IRREGULAR_VERB:
        return "VBD"                      # past/participle lookup forms
    if word in _SUPERLATIVE:
        return "JJS"
    if word in _COMPARATIVE:
        return "JJR"
    n = len(word)
    if word.endswith("ing") and n >= 5 and word not in _ING_NOT_VERB:
        return "VBG"
    if word.endswith("ed") and n >= 4 and not word.endswith("eed") \
            and word not in _ED_NOT_VERB:
        return "VBD"
    return None


def lemmatize(word: str) -> str:
    """Lemma of a lowercase word. Frozen v3 rules; see module docstring.

    Consults the closed lookup tables first (irregular plurals and verbs,
    comparatives/superlatives), then suffix rules.  Note the verb /
    adjective lookups are only REACHABLE from ``normalize_tokens`` when
    ``config.do_not_normalize`` doesn't gate their tag — with the
    reference-default gate (VBD/VBG/VBN/JJS/JJR kept as surface,
    medcat/utils/normalizers.py:185-187) these entries fire only for
    configs that empty the gate, e.g. the reference's own model-creator
    scenario (tests/model_creator/medcat.txt)."""
    exc = _LEMMA_EXCEPTIONS.get(word)
    if exc is not None:
        return exc
    exc = _IRREGULAR_VERB.get(word)
    if exc is not None:
        return exc
    exc = _SUPERLATIVE.get(word) or _COMPARATIVE.get(word)
    if exc is not None:
        return exc
    n = len(word)
    if word.endswith("ies") and n > 4:
        return word[:-3] + "y"
    if word.endswith(("ss", "us", "is")):
        # spaCy keeps these: reference goldens show 'virus'→'virus'
        # (tests/test_cdb_maker.py:47) while 'viruses'→'viruse'
        # (tests/test_ner.py:69-71) — the -s strip must not fire on
        # -us/-ss/-is words.
        return word
    if word.endswith("s") and n > 3:
        return word[:-1]
    if word.endswith("ing") and n >= 6:
        # nouns / function words whose -ing is not a verb suffix keep the
        # surface form (spaCy lemma of 'morning'/'swelling' is itself)
        if word in _ING_NOT_VERB:
            return word
        return _dedup_stem(word[:-3], word)
    if word.endswith("ed") and n >= 5:
        if word in _ED_NOT_VERB:
            return word
        return _dedup_stem(word[:-2], word)
    return word


# English "floss" consonants double in the base form (fall, spell, glass,
# buzz, staff) — a doubled final consonant outside this set comes from
# -ing/-ed doubling (run→running, stop→stopped) and is stripped.
_KEEP_DOUBLE = frozenset("lszf")


def _dedup_stem(stem: str, word: str) -> str:
    if len(stem) >= 2 and stem[-1] == stem[-2] \
            and stem[-1] not in _KEEP_DOUBLE:
        stem = stem[:-1]
    return stem if len(stem) >= 3 else word


# ---------------------------------------------------------------------------
# Spell checker (M5) — Norvig-style over the CDB word vocabulary.
# Reference: medcat/utils/normalizers.py:10-124.
# ---------------------------------------------------------------------------

_LETTERS = "abcdefghijklmnopqrstuvwxyz"
_LETTERS_DIACRITICS = _LETTERS + "àáâãäåæçèéêëìíîïðñòóôõöøùúûüýþÿ"


def edits1(word: str, diacritics: bool = False) -> Set[str]:
    """All edits one edit away (medcat/utils/normalizers.py:88-108)."""
    letters = _LETTERS_DIACRITICS if diacritics else _LETTERS
    splits = [(word[:i], word[i:]) for i in range(len(word) + 1)]
    deletes = [L + R[1:] for L, R in splits if R]
    transposes = [L + R[1] + R[0] + R[2:] for L, R in splits if len(R) > 1]
    replaces = [L + c + R[1:] for L, R in splits if R for c in letters]
    inserts = [L + c + R for L, R in splits for c in letters]
    return set(deletes + transposes + replaces + inserts)


class SpellChecker:
    """Candidate ranking by CDB word frequency ``P = -1/cnt``.

    The reference's tie-break (``max`` over an unordered set,
    medcat/utils/normalizers.py:51-55) is nondeterministic; we sort
    candidates lexicographically first so ties resolve to the smallest word
    (deterministic across runs and cluster sizes).
    """

    def __init__(self, cdb_vocab: Dict[str, int], config: EngineConfig) -> None:
        self.vocab = cdb_vocab
        self.config = config

    def __contains__(self, word: str) -> bool:
        # Reference __contains__ (normalizers.py:34-40) effectively returns
        # membership in the CDB vocab only (the data_vocab branch returns
        # False in both arms).
        return word in self.vocab

    def P(self, word: str) -> float:
        cnt = self.vocab.get(word, 0)
        return -1.0 / cnt if cnt != 0 else 0.0

    def known(self, words: Iterable[str]) -> Set[str]:
        return set(w for w in words if w in self.vocab)

    def candidates(self, word: str) -> List[str]:
        dia = self.config.diacritics
        if self.config.spell_check_deep:
            cands = (self.known([word])
                     or self.known(edits1(word, dia))
                     or self.known(e2 for e1 in edits1(word, dia)
                                   for e2 in edits1(e1, dia))
                     or [word])
        else:
            cands = (self.known([word]) or self.known(edits1(word, dia))
                     or [word])
        return sorted(cands)

    def fix(self, word: str) -> Optional[str]:
        fix = max(self.candidates(word), key=self.P)
        return fix if fix != word else None


# ---------------------------------------------------------------------------
# Normalizer (M4) — sets token.norm, optionally spell-fixing unknown words.
# Reference: medcat/utils/normalizers.py:181-205.
# ---------------------------------------------------------------------------

def normalize_tokens(tokens: List[Token], config: EngineConfig,
                     spell_checker: Optional[SpellChecker] = None,
                     cache: Optional[Dict[tuple, str]] = None
                     ) -> List[Token]:
    """M4 normalization.  ``cache`` (per-actor, keyed on
    (lower, is_punct, raw length) — the only inputs the norm depends on) amortizes
    lemmatize + spell-candidate generation across a corpus's repeated
    words; the spell path in particular enumerates ~60·len(word) edit
    strings per unknown word, which dominates without the cache."""
    min_len = config.min_len_normalize
    do_spell = config.spell_check and spell_checker is not None
    limit = config.spell_check_len_limit
    dnn = config.do_not_normalize
    for token in tokens:
        if cache is not None:
            # len(text) is in the key because the spell gate tests the
            # RAW length and Unicode lower() can change length
            key = (token.lower, token.is_punct, len(token.text))
            hit = cache.get(key)
            if hit is not None:
                token.norm = hit
                continue
        if len(token.lower) < min_len:
            token.norm = token.lower
        elif dnn and morph_tag(token.lower) in dnn:
            # POS gate (medcat/utils/normalizers.py:185-187): gated tags
            # keep the surface form.  morph_tag is None for non-gated
            # forms and None is never in dnn.
            token.norm = token.lower
        else:
            token.norm = lemmatize(token.lower)

        if do_spell:
            if (len(token.text) >= limit and not token.is_punct
                    and token.lower not in spell_checker
                    and not _CONTAINS_NUMBER.search(token.lower)):
                fix = spell_checker.fix(token.lower)
                if fix is not None:
                    if len(token.lower) < min_len:
                        token.norm = fix.lower()
                    else:
                        token.norm = lemmatize(fix.lower())
        if cache is not None:
            if len(cache) > 1_000_000:   # bound per-actor heap
                cache.clear()
            cache[key] = token.norm
    return tokens


def process_text(text: str, config: EngineConfig,
                 spell_checker: Optional[SpellChecker] = None,
                 stopwords: Optional[Set[str]] = None,
                 norm_cache: Optional[Dict[tuple, str]] = None,
                 tok_cache: Optional[Dict[str, tuple]] = None
                 ) -> List[Token]:
    """tokenize → tag → normalize, the full M2-M4 preprocessing chain.

    With ``tok_cache`` (a per-annotator dict), every field of a token
    except its offsets/index is computed ONCE per distinct raw token text
    — tag + norm flags depend only on the text under a fixed
    config/stopword set — and later occurrences are materialized with one
    dict hit + slot stores (the 3-pass chain costs lower()/isdigit()/
    isupper()/branching per occurrence instead).  The miss path runs the
    ORIGINAL tag/normalize code on a singleton token, so semantics are
    byte-identical."""
    if tok_cache is None:
        tokens = tokenize(text, config.diacritics)
        tag_tokens(tokens, config, stopwords)
        normalize_tokens(tokens, config, spell_checker, norm_cache)
        return tokens
    scan = _SCAN_RE_DIACRITICS if config.diacritics else _SCAN_RE
    tokens: List[Token] = []
    ap = tokens.append
    cache_get = tok_cache.get
    new = Token.__new__
    for idx, m in enumerate(scan.finditer(text)):
        s = m.group(0)
        proto = cache_get(s)
        if proto is None:
            tk = Token(s, 0, len(s), 0)
            tag_tokens([tk], config, stopwords)
            normalize_tokens([tk], config, spell_checker, norm_cache)
            if len(tok_cache) > 1_000_000:   # bound per-actor heap
                tok_cache.clear()
            proto = tok_cache[s] = (
                tk.lower, tk.is_punct, tk.to_skip, tk.is_stop,
                tk.is_digit, tk.is_upper, tk.norm)
        t = new(Token)
        t.text = s
        (t.lower, t.is_punct, t.to_skip, t.is_stop,
         t.is_digit, t.is_upper, t.norm) = proto
        t.start = m.start()
        t.end = m.end()
        t.idx = idx
        ap(t)
    return tokens
