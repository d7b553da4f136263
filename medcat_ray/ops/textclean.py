"""C4-style line-level text cleaning (Raffel et al. 2020, §2.2 public
description): keep only lines that end in terminal punctuation, have at
least ``min_words`` words, and contain none of the boilerplate markers
("lorem ipsum", "javascript", "{"); a document survives when at least
``min_kept_lines`` lines survive.

Everything is pyarrow.compute kernels over the FLATTENED line stream of
the whole batch (split → flatten → vectorized predicates → filter →
rebuild list offsets → binary_join), so no Python touches a line.  The
parts of C4 this does not implement (bad-word list, three-sentence-span
dedup across documents) are separate operators (see ops/dedup.py for the
dedup family).

Reference analogue: none in MedCAT — this is an LLM-training-data
operator, oracle-checked end-to-end by the ``doc_c4_clean`` driver query
(DuckDB reapplies the same per-line predicates with list_filter).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

# terminal punctuation accepted by the C4 line rule
_TERMINALS = (".", "!", "?", '"')
_BAD_LOWER = ("lorem ipsum", "javascript")


def clean_lines(ds: rd.Dataset, text_col: str = "text",
                min_words: int = 3,
                min_kept_lines: int = 3) -> rd.Dataset:
    """Append ``n_lines``, ``n_kept_lines``, ``clean_text`` (kept lines
    re-joined with newlines) and ``c4_keep`` to every row.

    Word counting is RE2 ``\\S+`` runs (equals ``str.split()`` counts on
    ASCII whitespace); the terminal-punctuation check looks at the last
    character after rtrimming whitespace."""
    def _clean(batch: pa.Table) -> pa.Table:
        txt = batch[text_col].combine_chunks()
        txt = pc.fill_null(txt, "")
        ll = pc.split_pattern(txt, "\n")
        if isinstance(ll, pa.ChunkedArray):
            ll = ll.combine_chunks()
        flat = pc.list_flatten(ll)
        n_lines = pc.list_value_length(ll).to_numpy().astype(np.int64)

        rt = pc.utf8_rtrim_whitespace(flat)
        endp = None
        for t in _TERMINALS:
            e = pc.ends_with(rt, pattern=t)
            endp = e if endp is None else pc.or_(endp, e)
        wc = pc.count_substring_regex(flat, pattern=r"\S+")
        low = pc.utf8_lower(flat)
        bad = pc.match_substring(flat, "{")
        for m in _BAD_LOWER:
            bad = pc.or_(bad, pc.match_substring(low, m))
        keep = pc.and_(pc.and_(endp, pc.greater_equal(wc, min_words)),
                       pc.invert(bad))

        keep_np = keep.to_numpy(zero_copy_only=False).astype(np.int64)
        csum = np.zeros(len(keep_np) + 1, dtype=np.int64)
        np.cumsum(keep_np, out=csum[1:])
        bounds = np.zeros(len(n_lines) + 1, dtype=np.int64)
        np.cumsum(n_lines, out=bounds[1:])
        kept_per_doc = csum[bounds[1:]] - csum[bounds[:-1]]

        flat_kept = flat.filter(keep)
        la = pa.ListArray.from_arrays(
            pa.array(csum[bounds], type=pa.int32()), flat_kept)
        clean = pc.binary_join(la, "\n")
        return (batch
                .append_column("n_lines",
                               pa.array(n_lines, type=pa.int64()))
                .append_column("n_kept_lines",
                               pa.array(kept_per_doc, type=pa.int64()))
                .append_column("clean_text", clean)
                .append_column("c4_keep",
                               pa.array(kept_per_doc >= min_kept_lines,
                                        type=pa.bool_())))

    return ds.map_batches(_clean, batch_format="pyarrow")
