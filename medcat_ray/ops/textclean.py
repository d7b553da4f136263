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

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
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


# ---------------------------------------------------------------------------
# C4 cross-document span dedup
# ---------------------------------------------------------------------------

_MAXPOS = 1 << 20   # documented bound: < 1M lines per document


def _line_span_hashes(text: str, span: int):
    """(positions, hashes) of every ``span`` consecutive-line window of
    ``text`` — the hash is the poly+splitmix64 of the window's exact
    bytes (lines joined by newline), computed zero-copy over the
    document with the prefix-polynomial span hasher."""
    from medcat_ray.ops.decontam import _span_hashes
    t = text or ""
    lines = t.split("\n")
    n = len(lines)
    if n < span:
        return (np.array([], dtype=np.int64),
                np.array([], dtype=np.uint64))
    lens = np.fromiter((len(x) for x in lines), dtype=np.int64, count=n)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    m = n - span + 1
    ends = starts[span - 1:] + lens[span - 1:]
    return (np.arange(m, dtype=np.int64),
            _span_hashes(t, starts[:m], ends))


def span_dedup(ds: rd.Dataset, id_col: str = "doc_id",
               text_col: str = "text", span: int = 3,
               method: str = "auto",
               broadcast_limit: int = 1_000_000,
               num_partitions: int = 8) -> rd.Dataset:
    """C4's cross-document span dedup (Raffel et al. 2020 §2.2: "discard
    all but one of any three-sentence span occurring more than once"),
    over newline-delimited line spans: every occurrence of a duplicated
    ``span``-line window except its keeper (the globally smallest
    (doc, position)) has its lines removed from the document.

    Shape: span rows → one NATIVE ``groupby(sh).aggregate(Min, Count)``
    → duplicated hashes only (volume ∝ duplicate rate, not corpus).
    ``broadcast`` ships the (hash → keeper) map via ``ray.put`` and
    re-derives removals per batch; ``join`` keeps everything in the
    object store (spans ⋈ dups, then per-affected-doc position lists —
    only docs that LOSE lines pay a group — joined back to the stream),
    the 10^12-doc path; ``auto`` counts the dup table and picks.

    Returns the dataset with ``clean_text`` (surviving lines) and
    ``n_removed_lines`` appended.  Requires < 2^20 lines per document
    (keeper keys are doc_id·2^20 + position).
    """
    from ray.data.aggregate import Count, Min

    def _spans(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        texts = batch[text_col].to_pylist()
        out_sh, out_key = [], []
        for i, t in zip(ids, texts):
            pos, sh = _line_span_hashes(t, span)
            if len(pos):
                if len(pos) + span - 1 >= _MAXPOS:
                    # keeper keys pack position into the low 20 bits; a
                    # doc past the bound would silently collide into
                    # OTHER documents' keys and remove wrong lines —
                    # fail loudly instead
                    raise ValueError(
                        f"span_dedup: document {i!r} has "
                        f"{len(pos) + span - 1} lines, >= the 2^20 "
                        f"lines-per-document bound of the keeper-key "
                        f"encoding; split the document or raise _MAXPOS")
                out_sh.append(sh.view(np.int64))
                out_key.append(int(i) * _MAXPOS + pos)
        if out_sh:
            sh_all = np.concatenate(out_sh)
            key_all = np.concatenate(out_key)
        else:
            sh_all = np.array([], dtype=np.int64)
            key_all = np.array([], dtype=np.int64)
        return pa.table({"sh": pa.array(sh_all, type=pa.int64()),
                         "key": pa.array(key_all, type=pa.int64())})

    agg = ds.map_batches(_spans, batch_format="pyarrow") \
        .groupby("sh").aggregate(Min("key", alias_name="keeper"),
                                 Count(alias_name="n"))

    def _dups(batch: pa.Table) -> pa.Table:
        return batch.select(["sh", "keeper"]).filter(
            pc.greater(batch["n"], 1))

    dup_ds = agg.map_batches(_dups, batch_format="pyarrow")
    if method == "auto":
        dup_ds = dup_ds.materialize()
        method = ("broadcast" if dup_ds.count() <= broadcast_limit
                  else "join")

    def _rebuild(batch: pa.Table, removed_by_doc) -> pa.Table:
        """removed_by_doc: doc_id -> sorted np.ndarray of removed line
        indexes (already unioned across overlapping dup spans)."""
        ids = batch[id_col].to_numpy()
        texts = batch[text_col].to_pylist()
        clean, nrem = [], []
        for i, t in zip(ids, texts):
            rem = removed_by_doc.get(int(i))
            if rem is None or len(rem) == 0:
                clean.append(t)
                nrem.append(0)
                continue
            lines = (t or "").split("\n")
            keep = np.ones(len(lines), dtype=bool)
            keep[rem] = False
            clean.append("\n".join(
                l for l, k in zip(lines, keep) if k))
            nrem.append(int((~keep).sum()))
        return (batch
                .append_column("clean_text", pa.array(clean,
                                                      type=pa.string()))
                .append_column("n_removed_lines",
                               pa.array(nrem, type=pa.int64())))

    def _removed_positions(ids, texts, lookup) -> dict:
        """Per-doc removed line indexes from a {sh: keeper} mapping."""
        out = {}
        for i, t in zip(ids, texts):
            pos, sh = _line_span_hashes(t, span)
            if not len(pos):
                continue
            sh_i = sh.view(np.int64)
            keepers = np.fromiter(
                (lookup.get(int(h), -1) for h in sh_i),
                dtype=np.int64, count=len(sh_i))
            keys = int(i) * _MAXPOS + pos
            bad = (keepers != -1) & (keys != keepers)
            if bad.any():
                rem = np.unique((pos[bad][:, None]
                                 + np.arange(span)).ravel())
                out[int(i)] = rem
        return out

    if method == "broadcast":
        dup_pd = dup_ds.to_pandas()
        # a fully-empty aggregate output can be schema-less (Ray 2.49)
        lookup = ({} if len(dup_pd) == 0 or "sh" not in dup_pd.columns
                  else dict(zip(dup_pd["sh"].astype(np.int64),
                                dup_pd["keeper"].astype(np.int64))))
        lookup_ref = ray.put(lookup)

        def _apply(batch: pa.Table) -> pa.Table:
            lk = ray.get(lookup_ref)
            ids = batch[id_col].to_numpy()
            texts = batch[text_col].to_pylist()
            return _rebuild(batch, _removed_positions(ids, texts, lk))

        return ds.map_batches(_apply, batch_format="pyarrow")

    # join path: nothing O(dup-rate × corpus) on the driver
    dup_ds = dup_ds.materialize()
    if dup_ds.count() == 0:
        def _noop(batch: pa.Table) -> pa.Table:
            return (batch
                    .append_column("clean_text", batch[text_col])
                    .append_column(
                        "n_removed_lines",
                        pa.array(np.zeros(batch.num_rows, np.int64),
                                 type=pa.int64())))
        return ds.map_batches(_noop, batch_format="pyarrow")

    def _spans_with_pos(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        texts = batch[text_col].to_pylist()
        o_sh, o_key = [], []
        for i, t in zip(ids, texts):
            pos, sh = _line_span_hashes(t, span)
            if len(pos):
                o_sh.append(sh.view(np.int64))
                o_key.append(int(i) * _MAXPOS + pos)
        sh_all = (np.concatenate(o_sh) if o_sh
                  else np.array([], dtype=np.int64))
        key_all = (np.concatenate(o_key) if o_key
                   else np.array([], dtype=np.int64))
        return pa.table({"sh": pa.array(sh_all, type=pa.int64()),
                         "key": pa.array(key_all, type=pa.int64())})

    spans = ds.map_batches(_spans_with_pos, batch_format="pyarrow")
    # inner join against the (small, ∝ dup rate) dup table; repartition
    # rebuilds groupby's schema-less empty blocks (Ray 2.49 workaround)
    hit = spans.join(dup_ds.repartition(num_partitions),
                     join_type="inner",
                     num_partitions=num_partitions, on=("sh",))

    def _non_keeper(batch: pa.Table) -> pa.Table:
        mask = pc.invert(pc.equal(batch["key"], batch["keeper"]))
        kept = batch.filter(mask)
        keys = kept["key"].to_numpy()
        return pa.table({
            id_col: pa.array(keys // _MAXPOS, type=pa.int64()),
            "pos": pa.array(keys % _MAXPOS, type=pa.int64())})

    removed = hit.map_batches(_non_keeper, batch_format="pyarrow")

    def _collect(group: pd.DataFrame) -> pd.DataFrame:
        rem = np.unique((group["pos"].to_numpy()[:, None]
                         + np.arange(span)).ravel())
        return pd.DataFrame({
            id_col: [group[id_col].iloc[0]],
            "removed_csv": [",".join(map(str, rem))]})

    # only docs that actually lose lines pay the per-group cost
    per_doc = removed.groupby(id_col).map_groups(
        _collect, batch_format="pandas")

    joined = ds.join(per_doc.repartition(num_partitions),
                     join_type="left_outer",
                     num_partitions=num_partitions, on=(id_col,))

    def _apply_join(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        rem_csv = batch["removed_csv"].to_pylist()
        rbd = {int(i): np.array(c.split(","), dtype=np.int64)
               for i, c in zip(ids, rem_csv) if c}
        out = _rebuild(batch, rbd)
        return out.drop_columns(["removed_csv"])

    return joined.map_batches(_apply_join, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Sentence segmentation
# ---------------------------------------------------------------------------

_SENT_RE = re.compile(r"[^.!?]+[.!?]+|[^.!?]+$")


def sentence_list(text: str):
    """Stripped, non-empty sentences of ``text`` in order (the same
    maximal-run regex as :func:`split_sentences`)."""
    out = []
    for m in _SENT_RE.findall(text or ""):
        s = m.strip()
        if s:
            out.append(s)
    return out


def split_sentences(ds: rd.Dataset, text_col: str = "text",
                    id_col: str = "doc_id") -> rd.Dataset:
    """Exploded (id, sent_idx, sentence) rows: sentences are maximal
    runs ending in terminal punctuation plus an unterminated tail,
    Unicode-whitespace-stripped, empties dropped — a single regex with
    no lookaround, so a DuckDB/RE2 oracle applies the identical pattern
    (``regexp_extract_all``).  0-based ``sent_idx`` counts the KEPT
    sentences in document order."""
    def _split(batch: pa.Table) -> pa.Table:
        o_id, o_ix, o_s = [], [], []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            for idx, s in enumerate(sentence_list(t)):
                o_id.append(i)
                o_ix.append(idx)
                o_s.append(s)
        return pa.table({
            id_col: pa.array(o_id, type=pa.int64()),
            "sent_idx": pa.array(o_ix, type=pa.int64()),
            "sentence": pa.array(o_s, type=pa.string())})

    return ds.map_batches(_split, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Within-document repeated-line dedup
# ---------------------------------------------------------------------------


def dedup_doc_lines(ds: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text") -> rd.Dataset:
    """Remove REPEATED lines within each document, keeping the first
    occurrence (the within-doc half of web-text boilerplate cleaning —
    cross-document spans are ops/textclean.span_dedup; the public
    RefinedWeb/Dolma pipelines run both).

    Purely per-record → embarrassingly parallel, no shuffle.  Appends
    ``clean_text`` (surviving lines, original order) and
    ``n_removed_lines``.  Exact string match on the raw line bytes; the
    DuckDB twin is a ROW_NUMBER-over-(doc, line) keep rule
    (``dedup_lines_oracle_sql``)."""
    def _dedup(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        clean, nrem = [], []
        for t in texts:
            lines = (t or "").split("\n")
            seen = set()
            kept = []
            for l in lines:
                if l in seen:
                    continue
                seen.add(l)
                kept.append(l)
            clean.append("\n".join(kept))
            nrem.append(len(lines) - len(kept))
        return (batch
                .append_column("clean_text",
                               pa.array(clean, type=pa.string()))
                .append_column("n_removed_lines",
                               pa.array(np.asarray(nrem, dtype=np.int64),
                                        type=pa.int64())))

    return ds.map_batches(_dedup, batch_format="pyarrow")


def dedup_lines_oracle_sql(table: str = "documents",
                           id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    """DuckDB twin of :func:`dedup_doc_lines`."""
    return f"""
WITH lines AS (
  SELECT {id_col}, ord, ls[ord] AS l
  FROM (SELECT {id_col},
               string_split(COALESCE({text_col}, ''), chr(10)) AS ls
        FROM {table}),
       unnest(generate_series(1, len(ls))) AS g(ord)),
ranked AS (
  SELECT {id_col}, ord, l,
         ROW_NUMBER() OVER (PARTITION BY {id_col}, l ORDER BY ord) AS rn
  FROM lines)
SELECT d.{id_col},
       COALESCE(k.clean_text, '') AS clean_text,
       CAST(COALESCE(k.n_removed, 0) AS BIGINT) AS n_removed_lines
FROM {table} d LEFT JOIN (
  SELECT {id_col},
         string_agg(CASE WHEN rn = 1 THEN l END, chr(10) ORDER BY ord)
           FILTER (WHERE rn = 1) AS clean_text,
         COUNT(*) FILTER (WHERE rn > 1) AS n_removed
  FROM ranked GROUP BY {id_col}) k USING ({id_col})
ORDER BY d.{id_col}
"""
