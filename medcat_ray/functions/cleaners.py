"""Scalar text/name cleaners (SURVEY.md M14).

Reimplement the regex scrubbers of
/root/reference/medcat/preprocessing/cleaners.py:69-239 — pure functions
applied either at CDB-build time (concept-name scrubbing) or as vectorized
``map_batches`` projections over text columns.  Behavior is frozen to the
reference's regexes (including their quirks, e.g. ``basic_clean`` keeping
the repeated-char rule off digits while ``clean_text`` applies it to all).
"""

from __future__ import annotations

import re
from typing import List, Optional

_NUM_SPACE = re.compile(r"([\.,%:\d\-]*[\d]+[\.,%:\d\-]*)")
_CHARS_RM = re.compile(r"[:;\\|!?%#@%\&=><\-\*\+\^]")
_DOT_RM = re.compile(r"[^A-Za-z0-9]+\.")
_COMMA_RM = re.compile(r",([^0-9])|([^0-9]),")
_TABS = re.compile(r"\t+")
_SPACES = re.compile(r"[ ]+")
_REPEAT_NONNUM = re.compile(r"([^0-9]{1})\1{2,}")
_REPEAT_ANY = re.compile(r"(.)\1{2,}")
_BRACKETS = re.compile(r"\[.*\]")
_PARENS = re.compile(r"\(.*\)")
_SLASH = re.compile(r"\/")

# clean_umls / clean_drugs_uk helpers (cleaners.py:140-145)
BR_U4 = re.compile(r"\[[^\]]{0,3}\]")
CB = re.compile(r"(\s)\([a-zA-Z]+[^\)\(]*\)(\s)")
CB_D = re.compile(r"(\s)\([a-z]+[^\)\(]*\)($)")
PH_RM = re.compile(
    r"(\(|\[)(observation|finding|symptoms|disease|observations|disorder"
    r"|disease/finding)(\)|\])", flags=re.I)


def basic_clean(text: str) -> str:
    """cleaners.py:69-99 — aggressive scrub, repeated-char rule spares
    digits."""
    text = _NUM_SPACE.sub(r" \1 ", text)
    text = _CHARS_RM.sub(" ", text)
    text = _DOT_RM.sub("", text)
    text = _COMMA_RM.sub(r"\2\1 ", text)
    text = _TABS.sub(" ", text)
    text = _SPACES.sub(" ", text)
    text = _REPEAT_NONNUM.sub(r"\1\1", text)
    return text.strip().lower()


def clean_text(text: str) -> str:
    """cleaners.py:101-139 — drops bracketed/parenthesised content first."""
    text = _BRACKETS.sub("", text)
    text = _PARENS.sub("", text)
    text = _NUM_SPACE.sub(r" \1 ", text)
    text = _SLASH.sub(" ", text)
    text = _CHARS_RM.sub(" ", text)
    text = _DOT_RM.sub("", text)
    text = _COMMA_RM.sub(r"\2\1 ", text)
    text = _TABS.sub(" ", text)
    text = _SPACES.sub(" ", text)
    text = _REPEAT_ANY.sub(r"\1\1", text)
    return text.strip().lower()


def clean_name(text: str, stopwords: Optional[List[str]] = None,
               umls: bool = False) -> str:
    """cleaners.py:158-176."""
    text = _SPACES.sub(" ", text).strip()
    if umls:
        text = PH_RM.sub(" ", text)
    if stopwords:
        text = " ".join(w for w in text.split(" ")
                        if w not in stopwords).strip()
    return text


def clean_drugs_uk(text: str, stopwords: Optional[List[str]] = None,
                   umls: bool = False) -> str:
    """cleaners.py:148-155 — strip inline parentheticals, keep if result
    still has substance."""
    _text = CB.sub(" ", text)
    _text = CB.sub(" ", _text)
    _text = CB_D.sub(" ", _text)
    if len(_text) > 8:
        text = _text
    return clean_name(text, stopwords, umls)


def clean_umls(text: str, stopwords: Optional[List[str]] = None) -> str:
    """cleaners.py:179-204 — drop tiny square-bracket tags and semantic-tag
    parentheticals."""
    text = BR_U4.sub(" ", text)
    text = PH_RM.sub(" ", text)
    text = _SPACES.sub(" ", text).strip()
    if stopwords:
        text = " ".join(w for w in text.split(" ")
                        if w not in stopwords).strip()
    return text


def clean_def(text: str) -> str:
    """cleaners.py:207-215."""
    text = re.sub(r"\([^\)]*\)", " ", text)
    text = re.sub(r"\[[^\]]*\]", " ", text)
    return _SPACES.sub(" ", text).strip()


def clean_snt(text: str) -> str:
    """cleaners.py:218-228 — de-identified-note scrubber."""
    text = re.sub(r"\[\*[^\]]*\*\]", " ", text)
    text = re.sub(r"[_-]{2,}", " ", text)
    return _SPACES.sub(" ", text).strip()


def clean_snomed_name(text: str) -> str:
    """cleaners.py:231-236 — drop the FSN semantic-tag suffix."""
    text = text.strip()
    return re.sub(r"\([^\)]*\)$", " ", text).strip()
