"""MetaCAT tokenizer-wrapper API — the reference's
``medcat/tokenizers/meta_cat_tokenizers.py`` surface (TokenizerWrapperBase
/ TokenizerWrapperBPE / TokenizerWrapperBERT) without the huggingface
dependency: the BPE wrapper is backed by the repo's own learned merge
rules (ops/bpe.py, trained distributed over a Ray Dataset), and the
word-level wrapper stands in for the BERT wordpiece tokenizer
(documented deviation — wordpiece needs a pretrained vocab file that the
environment doesn't ship; the id-space contract is identical).

Contract per the reference (meta_cat_tokenizers.py:16-43): calling the
wrapper with a str returns ``{'offset_mapping': [(s, e), ...],
'input_ids': [...], 'tokens': [...]}``; with a list of str, a list of
those dicts.  ``save(dir)`` / ``load(dir)`` round-trip, ``get_size()``
is the vocabulary size, ``token_to_id`` maps tokens, ``get_pad_id()``
returns the <PAD> id (appended last, mirroring
TokenizerWrapperBPE.__init__'s add_tokens(['<PAD>']))."""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Tuple, Union

WORD_RE = re.compile(r"[a-z0-9]+")
PAD_TOKEN = "<PAD>"
UNK_TOKEN = "<UNK>"


class TokenizerWrapperBase:
    """Shared wrapper contract (reference TokenizerWrapperBase)."""

    name: str = "base"

    def __call__(self, text: Union[str, List[str]]
                 ) -> Union[Dict, List[Dict]]:
        if isinstance(text, str):
            return self._encode(text)
        if isinstance(text, list):
            return [self._encode(t) for t in text]
        raise Exception(
            "Unsupported input type, supported: text/list, but got: "
            f"{type(text)}")

    # subclasses implement
    def _encode(self, text: str) -> Dict:
        raise NotImplementedError

    def save(self, dir_path: str) -> None:
        raise NotImplementedError

    @classmethod
    def load(cls, dir_path: str, **kwargs) -> "TokenizerWrapperBase":
        raise NotImplementedError

    def get_size(self) -> int:
        raise NotImplementedError

    def token_to_id(self, token: str) -> Optional[int]:
        raise NotImplementedError

    def get_pad_id(self) -> int:
        raise NotImplementedError


class TokenizerWrapperBPE(TokenizerWrapperBase):
    """BPE wrapper backed by the repo's learned merges (ops/bpe.py).

    ``merges`` is the ordered rule list [(a, b), ...]; ``token2id`` maps
    every reachable sub-word symbol.  ``train`` learns both from a Ray
    Dataset (distributed pair counting).  <PAD> takes the last id."""

    name = "bbpe"

    def __init__(self, merges: Optional[List[Tuple[str, str]]] = None,
                 token2id: Optional[Dict[str, int]] = None) -> None:
        self.merges = [tuple(m[:2]) for m in (merges or [])]
        self.token2id = dict(token2id or {})
        # the learned vocab has no full byte coverage (unlike the
        # reference's byte-level BPE), so UNK is reachable — it MUST
        # have its own id or unknown symbols would collide with padding
        if UNK_TOKEN not in self.token2id:
            self.token2id[UNK_TOKEN] = len(self.token2id)
        if PAD_TOKEN not in self.token2id:
            self.token2id[PAD_TOKEN] = len(self.token2id)
        self._seg_cache: Dict[str, List[str]] = {}

    # -- construction -------------------------------------------------
    @classmethod
    def train(cls, ds, n_merges: int = 32, text_col: str = "text",
              min_freq: int = 1) -> "TokenizerWrapperBPE":
        """Learn merges + symbol vocabulary over a Dataset (the
        distributed ops/bpe.bpe_learn path)."""
        from medcat_ray.ops.bpe import bpe_learn
        merges, vocab = bpe_learn(ds, text_col=text_col,
                                  n_merges=n_merges, min_freq=min_freq)
        symbols = set()
        for seg in vocab.to_pandas()["seg"]:
            symbols.update(seg.split(" "))
        token2id = {s: i for i, s in enumerate(sorted(symbols))}
        return cls([(a, b) for a, b, _ in merges], token2id)

    # -- encode --------------------------------------------------------
    def _segment(self, word: str) -> List[str]:
        from medcat_ray.ops.bpe import segment_word
        return segment_word(word, self.merges, self._seg_cache)

    def _encode(self, text: str) -> Dict:
        offsets: List[Tuple[int, int]] = []
        ids: List[int] = []
        tokens: List[str] = []
        unk = self.token2id[UNK_TOKEN]
        for m in WORD_RE.finditer((text or "").lower()):
            pos = m.start()
            for sym in self._segment(m.group(0)):
                offsets.append((pos, pos + len(sym)))
                ids.append(self.token2id.get(sym, unk))
                tokens.append(sym)
                pos += len(sym)
        return {"offset_mapping": offsets, "input_ids": ids,
                "tokens": tokens}

    # -- contract ------------------------------------------------------
    def save(self, dir_path: str) -> None:
        os.makedirs(dir_path, exist_ok=True)
        with open(os.path.join(dir_path, f"{self.name}-vocab.json"),
                  "w") as fh:
            json.dump(self.token2id, fh, sort_keys=True)
        with open(os.path.join(dir_path, f"{self.name}-merges.txt"),
                  "w") as fh:
            for a, b in self.merges:
                fh.write(f"{a} {b}\n")

    @classmethod
    def load(cls, dir_path: str, **kwargs) -> "TokenizerWrapperBPE":
        with open(os.path.join(dir_path, f"{cls.name}-vocab.json")) as fh:
            token2id = json.load(fh)
        merges = []
        with open(os.path.join(dir_path, f"{cls.name}-merges.txt")) as fh:
            for line in fh:
                a, b = line.rstrip("\n").split(" ")
                merges.append((a, b))
        return cls(merges, token2id)

    def get_size(self) -> int:
        return len(self.token2id)

    def token_to_id(self, token: str) -> Optional[int]:
        return self.token2id.get(token)

    def get_pad_id(self) -> int:
        return self.token2id[PAD_TOKEN]


class TokenizerWrapperVocab(TokenizerWrapperBase):
    """Word-level wrapper over a fixed token2id map — the id-space
    contract of the reference's TokenizerWrapperBERT with the wordpiece
    model swapped for whole words (documented deviation; it is what the
    repo's MetaCAT/RelCAT scorers consume via their ``token2id``
    argument)."""

    name = "vocab"

    def __init__(self, token2id: Optional[Dict[str, int]] = None) -> None:
        self.token2id = dict(token2id or {})
        if UNK_TOKEN not in self.token2id:
            self.token2id[UNK_TOKEN] = len(self.token2id)
        if PAD_TOKEN not in self.token2id:
            self.token2id[PAD_TOKEN] = len(self.token2id)

    def _encode(self, text: str) -> Dict:
        offsets, ids, tokens = [], [], []
        unk = self.token2id[UNK_TOKEN]
        for m in re.finditer(r"\S+", (text or "").lower()):
            offsets.append((m.start(), m.end()))
            ids.append(self.token2id.get(m.group(0), unk))
            tokens.append(m.group(0))
        return {"offset_mapping": offsets, "input_ids": ids,
                "tokens": tokens}

    def save(self, dir_path: str) -> None:
        os.makedirs(dir_path, exist_ok=True)
        with open(os.path.join(dir_path, f"{self.name}-vocab.json"),
                  "w") as fh:
            json.dump(self.token2id, fh, sort_keys=True)

    @classmethod
    def load(cls, dir_path: str, **kwargs) -> "TokenizerWrapperVocab":
        with open(os.path.join(dir_path, f"{cls.name}-vocab.json")) as fh:
            return cls(json.load(fh))

    def get_size(self) -> int:
        return len(self.token2id)

    def token_to_id(self, token: str) -> Optional[int]:
        return self.token2id.get(token)

    def get_pad_id(self) -> int:
        return self.token2id[PAD_TOKEN]
