"""Tokenizer / tagger / normalizer / spell-checker unit tests
(reference test style: /root/reference/tests/test_pipe.py, tests/preprocessing/)."""

from medcat_ray.config import EngineConfig
from medcat_ray.functions.text import (SpellChecker, edits1, lemmatize,
                                       normalize_tokens, process_text,
                                       tag_tokens, tokenize)

CFG = EngineConfig()


def test_tokenize_words_and_punct():
    toks = tokenize("Kidney failure, acute!")
    assert [t.text for t in toks] == ["Kidney", "failure", ",", "acute", "!"]
    assert [(t.start, t.end) for t in toks] == [
        (0, 6), (7, 14), (14, 15), (16, 21), (21, 22)]


def test_tokenize_punct_runs_are_single_char_tokens():
    toks = tokenize("a!!b")
    assert [t.text for t in toks] == ["a", "!", "!", "b"]


def test_tokenize_whitespace_run_gap():
    # "Movar    Viruses" (4 spaces) must have a 3-token gap — the spaCy
    # whitespace-token semantics the reference goldens rely on
    # (/root/reference/tests/test_ner.py:62,79-84).
    toks = tokenize("Movar    Viruses")
    words = [t for t in toks if t.text.strip()]
    assert [t.text for t in words] == ["Movar", "Viruses"]
    assert words[1].idx - words[0].idx - 1 == 3


def test_tokenize_newline_is_token():
    toks = tokenize("liver\nfailure")
    assert [t.text for t in toks] == ["liver", "\n", "failure"]


def test_tokenize_at_sign_is_word_char():
    toks = tokenize("w@rd here")
    assert [t.text for t in toks] == ["w@rd", "here"]


def test_tagger_punct_and_skip():
    # reference tag_skip_and_punct (medcat/preprocessing/taggers.py:37-52)
    toks = tag_tokens(tokenize("x . : ! nos word"), CFG)
    by_text = {t.start: t for t in toks}
    dot = next(t for t in toks if t.text == ".")
    colon = next(t for t in toks if t.text == ":")
    bang = next(t for t in toks if t.text == "!")
    nos = next(t for t in toks if t.text == "nos")
    word = next(t for t in toks if t.text == "word")
    assert not dot.is_punct and not dot.to_skip      # keep_punct {'.',':'}
    assert not colon.is_punct
    assert bang.is_punct and bang.to_skip
    assert nos.to_skip and not nos.is_punct          # word_skipper {'nos'}
    assert not word.to_skip


def test_lemmatizer_golden_viruses():
    # 'viruses' -> 'viruse' reproduces the reference golden
    # (/root/reference/tests/test_ner.py:69-71: cui2names has 'movar~viruse').
    assert lemmatize("viruses") == "viruse"
    assert lemmatize("studies") == "study"
    assert lemmatize("glass") == "glass"
    assert lemmatize("movar") == "movar"


def test_normalizer_short_words_not_lemmatized():
    toks = process_text("cats viruses", CFG.with_overrides(spell_check=False))
    assert toks[0].norm == "cats"      # len 4 < min_len_normalize 5
    assert toks[1].norm == "viruse"


def test_spell_checker_edit1_fix_deterministic():
    vocab = {"kidney": 100, "liver": 50}
    sc = SpellChecker(vocab, CFG)
    assert sc.fix("kidnye") == "kidney"      # transpose
    assert sc.fix("kidney") is None          # known → no fix
    assert sc.fix("zzzzzzz") is None         # no candidates → word itself
    assert "kidney" in sc and "zzz" not in sc


def test_spell_checker_applied_in_normalizer():
    cfg = CFG  # spell_check=True, len limit 7
    vocab = {"failure": 10}
    sc = SpellChecker(vocab, cfg)
    toks = tokenize("falure7x failmure")
    tag_tokens(toks, cfg)
    normalize_tokens(toks, cfg, sc)
    # 'falure7x' contains a digit → not spell-checked
    assert toks[0].norm == "falure7x"
    # 'failmure' (8 chars, no digit, unknown) → fixed to 'failure' → lemma
    assert toks[1].norm == "failure"


def test_edits1_counts():
    e = edits1("ab")
    assert "b" in e and "ba" in e and "aab" in e and "ab" not in {"x"}


def test_edits1_set_matches_reference():
    """edits1('abc') must contain exactly the 182 one-edit strings the
    reference enumerates (/root/reference/tests/utils/test_normalizers.py:8-45
    EXMAPLE_EDITS_ORDER — set semantics; ordering is explicitly not
    guaranteed there)."""
    from medcat_ray.functions.text import edits1
    got = edits1("abc")
    assert len(got) == 182
    ref = {
        'abqc', 'rbc', 'obc', 'fbc', 'abyc', 'azbc', 'ibc', 'xbc', 'apc',
        'abcl', 'abcr', 'abck', 'anc', 'abd', 'abkc', 'iabc', 'tbc', 'cabc',
        'abw', 'abp', 'abe', 'akbc', 'apbc', 'hbc', 'ubc', 'abic', 'babc',
        'abcq', 'wabc', 'abtc', 'aibc', 'yabc', 'asc', 'abrc', 'avbc',
        'abu', 'kabc', 'axc', 'fabc', 'nbc', 'rabc', 'abec', 'abcu', 'gbc',
        'amc', 'abce', 'abdc', 'abcy', 'bbc', 'dbc', 'abac', 'abvc', 'abuc',
        'avc', 'abi', 'abm', 'abjc', 'abcp', 'tabc', 'cbc', 'uabc', 'abz',
        'aby', 'qbc', 'abcf', 'abpc', 'axbc', 'abk', 'gabc', 'abc', 'mbc',
        'aqbc', 'abci', 'oabc', 'qabc', 'abf', 'vabc', 'abj', 'abbc',
        'aubc', 'acbc', 'abn', 'aebc', 'ebc', 'abfc', 'dabc', 'abh', 'arc',
        'aqc', 'albc', 'aac', 'abcb', 'sabc', 'ybc', 'abcv', 'absc', 'abca',
        'labc', 'ajbc', 'kbc', 'pabc', 'abcc', 'afbc', 'sbc', 'abl', 'awc',
        'ahbc', 'abco', 'anbc', 'abo', 'abg', 'abcn', 'awbc', 'adc', 'ahc',
        'habc', 'abb', 'vbc', 'aboc', 'abq', 'acc', 'agc', 'abcx', 'nabc',
        'abwc', 'lbc', 'abcm', 'afc', 'ab', 'atc', 'aybc', 'akc', 'abt',
        'aic', 'jbc', 'aec', 'zabc', 'agbc', 'abv', 'abnc', 'abcj', 'pbc',
        'abcg', 'bac', 'abr', 'aobc', 'abcd', 'alc', 'aoc', 'ajc', 'abx',
        'arbc', 'ayc', 'aba', 'abcw', 'eabc', 'abcs', 'abhc', 'adbc',
        'abgc', 'asbc', 'acb', 'abs', 'aabc', 'abzc', 'abxc', 'atbc',
        'ambc', 'jabc', 'bc', 'wbc', 'abcz', 'ablc', 'ac', 'azc', 'abct',
        'abmc', 'zbc', 'abch', 'auc', 'xabc', 'mabc'}
    assert got == ref


# ---------------------------------------------------------------------------
# Lemmatizer v3: POS gate (do_not_normalize) + lookup tables
# (reference medcat/utils/normalizers.py:185-187, medcat/config.py:407,
# tests/test_entity_linking.py:69-89 lemmatization scenarios)
# ---------------------------------------------------------------------------

def test_morph_tag_gated_forms():
    from medcat_ray.functions.text import morph_tag
    assert morph_tag("falling") == "VBG"
    assert morph_tag("taken") == "VBD"      # irregular participle lookup
    assert morph_tag("treated") == "VBD"    # -ed suffix rule
    assert morph_tag("highest") == "JJS"
    assert morph_tag("higher") == "JJR"
    # closed exception lists: noun/-eed readings are never verb tags
    assert morph_tag("morning") is None
    assert morph_tag("swelling") is None
    assert morph_tag("hundred") is None
    assert morph_tag("exceed") is None
    # base forms / non-gated shapes
    assert morph_tag("diagnoses") is None
    assert morph_tag("table") is None


def test_lemmatizer_v3_lookup_tables():
    # Latin/Greek plurals (suffix rules can't produce these)
    assert lemmatize("diagnoses") == "diagnosis"
    assert lemmatize("matrices") == "matrix"
    assert lemmatize("vertebrae") == "vertebra"
    assert lemmatize("criteria") == "criterion"
    # irregular verbs + comparatives/superlatives
    assert lemmatize("taken") == "take"
    assert lemmatize("fell") == "fall"
    assert lemmatize("better") == "good"
    assert lemmatize("highest") == "high"
    # -ing/-ed exception sets keep the dominant noun reading
    assert lemmatize("morning") == "morning"
    assert lemmatize("swelling") == "swelling"
    assert lemmatize("hundred") == "hundred"
    # suffix rules unchanged
    assert lemmatize("falling") == "fall"
    assert lemmatize("running") == "run"


def test_normalizer_pos_gate_default_vs_empty():
    # Default gate (config.py:407): VBG/VBD/JJS forms keep their surface
    # form; un-gated Latin plurals still lemmatize.
    cfg = CFG.with_overrides(spell_check=False)
    toks = process_text("falling taken highest diagnoses", cfg)
    assert [t.norm for t in toks] == ["falling", "taken", "highest",
                                      "diagnosis"]
    # Gate emptied (the reference model-creator scenario,
    # tests/model_creator/medcat.txt: do_not_normalize = {}): everything
    # lemmatizes — 'falling' links to Fall only through this path.
    cfg0 = cfg.with_overrides(do_not_normalize=frozenset())
    toks0 = process_text("falling taken highest diagnoses", cfg0)
    assert [t.norm for t in toks0] == ["fall", "take", "high", "diagnosis"]
