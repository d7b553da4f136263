"""PII redaction over a text column — the standard web-corpus scrubbing
pass (C4 §2.2 badwords analogue; Dolma/BigScience public pipelines redact
emails / phone numbers / IP addresses before training).

Everything is RE2 via ``pyarrow.compute`` kernels
(``count_substring_regex`` + ``replace_substring_regex``) over the whole
batch — zero-copy Arrow in, Arrow out, no Python per row.  The patterns
are deliberately RE2-portable so a DuckDB oracle (also RE2) reproduces the
redaction byte-for-byte: the ``doc_pii_redact`` driver query applies the
SAME three patterns in the SAME order with ``regexp_replace(..., 'g')``.

Order matters and is fixed: emails first (so an IP-looking host inside an
email is consumed by ``<EMAIL>``), then phones, then IPv4.  Counts are
taken on the text state *at that stage* (post-previous-replacement),
matching the staged SQL twin.

Reference analogue: none in MedCAT — the closest is the DeId rewrite
(functions/deid.py); this is the LLM-training-data variant over raw web
text.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# RE2-portable patterns (no backrefs, no lookaround).  Each is paired with
# its replacement token; applied strictly in list order.
DEFAULT_PII_PATTERNS: Tuple[Tuple[str, str, str], ...] = (
    ("emails", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("phones", r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("ips", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(ds: rd.Dataset, text_col: str = "text",
               patterns: Sequence[Tuple[str, str, str]] =
               DEFAULT_PII_PATTERNS,
               out_col: str = "redacted_text") -> rd.Dataset:
    """Append ``n_<name>`` match counts (one per pattern, counted on the
    staged text) and ``out_col`` (all patterns replaced, in order).

    Streaming stateless map — safe at any corpus size; the regexes are
    applied by Arrow's RE2 engine over the batch's single string buffer.
    """
    pats = tuple((str(n), str(p), str(r)) for n, p, r in patterns)

    def _redact(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch[text_col].combine_chunks(), "")
        cols: List[pa.Array] = []
        names: List[str] = []
        for name, pat, repl in pats:
            cnt = pc.count_substring_regex(txt, pattern=pat)
            txt = pc.replace_substring_regex(txt, pattern=pat,
                                             replacement=repl)
            names.append(f"n_{name}")
            cols.append(cnt.cast(pa.int64()))
        out = batch
        for n, c in zip(names, cols):
            out = out.append_column(n, c)
        return out.append_column(out_col, txt)

    return ds.map_batches(_redact, batch_format="pyarrow")
