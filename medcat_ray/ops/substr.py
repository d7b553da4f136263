"""Exact substring deduplication (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better"): remove every occurrence,
except one keeper, of any ``window``-token span that appears more than
once across the corpus.

This is the token-window formulation of the suffix-array algorithm that
actually distributes: one row per token position (the window stream),
ONE native ``groupby(sh).aggregate(Min, Count)`` — only duplicated
window hashes leave the aggregate, so post-shuffle volume is
∝ duplicate rate, not corpus size — then either a broadcast probe or a
fully-in-store join applies the removals (auto-gated on measured dup
volume, the same pattern as ops/dedup.py / textclean.span_dedup).

Window identity is the splitmix64-finalized polynomial hash of the
window's space-joined tokens, computed with the prefix-polynomial span
hasher (ops/decontam.py:_span_hashes) — O(doc) per document regardless
of window count, and bit-for-bit recomputable by a DuckDB oracle
(:func:`substring_dedup_oracle_sql`; driver query ``substr_dedup_docs``).

Output is token-normalized (surviving tokens joined by single spaces),
matching the published algorithm's operate-on-token-stream semantics.
Overlapping duplicated windows union their token sets before removal.

Scale note: the window stream is one row per corpus token — that IS the
exact algorithm's lower bound (every token must be looked at in a
global context).  At 100 TB the stream is wide but each row is 16 bytes
(two int64s), the shuffle key is a uniform hash (no skew), and the
aggregate prunes all unique windows before anything else runs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from medcat_ray.ops.decontam import _span_hashes

_MAXPOS = 1 << 20  # tokens-per-document bound of the keeper-key packing


def _window_hashes(text: str, window: int
                   ) -> Tuple[list, np.ndarray, np.ndarray]:
    """(tokens, window start positions, window hashes) of one document.

    Windows are every ``window`` consecutive tokens (stride 1) of
    ``text.split()``; the hash is the polynomial of the space-joined
    window's exact codepoints (prefix-polynomial, one pass per doc)."""
    toks = (text or "").split()
    t = len(toks)
    if t < window:
        return toks, np.array([], dtype=np.int64), \
            np.array([], dtype=np.uint64)
    joined = " ".join(toks)
    lens = np.fromiter((len(w) for w in toks), dtype=np.int64, count=t)
    tok_starts = np.zeros(t, dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=tok_starts[1:])
    m = t - window + 1
    ends = tok_starts[window - 1:] + lens[window - 1:]
    return toks, np.arange(m, dtype=np.int64), \
        _span_hashes(joined, tok_starts[:m], ends)


def substring_dedup(ds: rd.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", window: int = 10,
                    method: str = "auto",
                    broadcast_limit: int = 1_000_000,
                    num_partitions: int = 8) -> rd.Dataset:
    """Append ``clean_text`` (surviving tokens, space-joined) and
    ``n_removed_tokens`` to every row.

    ``method``: ``broadcast`` ships the duplicated (hash → keeper) map
    via ``ray.put``; ``join`` keeps everything in the object store (the
    10^12-doc path); ``auto`` counts the dup table and picks.  Requires
    < 2^20 tokens per document (keeper keys pack position into the low
    20 bits — enforced loudly)."""
    from ray.data.aggregate import Count, Min

    def _wins(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        texts = batch[text_col].to_pylist()
        o_sh, o_key = [], []
        for i, t in zip(ids, texts):
            toks, pos, sh = _window_hashes(t, window)
            if len(pos):
                if len(toks) >= _MAXPOS:
                    raise ValueError(
                        f"substring_dedup: document {i!r} has "
                        f"{len(toks)} tokens, >= the 2^20 bound of the "
                        f"keeper-key encoding; split the document")
                o_sh.append(sh.view(np.int64))
                o_key.append(int(i) * _MAXPOS + pos)
        sh_all = (np.concatenate(o_sh) if o_sh
                  else np.array([], dtype=np.int64))
        key_all = (np.concatenate(o_key) if o_key
                   else np.array([], dtype=np.int64))
        return pa.table({"sh": pa.array(sh_all, type=pa.int64()),
                         "key": pa.array(key_all, type=pa.int64())})

    agg = ds.map_batches(_wins, batch_format="pyarrow") \
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

    def _rebuild(batch: pa.Table, removed_by_doc: Dict[int, np.ndarray]
                 ) -> pa.Table:
        ids = batch[id_col].to_numpy()
        texts = batch[text_col].to_pylist()
        clean, nrem = [], []
        for i, t in zip(ids, texts):
            toks = (t or "").split()
            rem = removed_by_doc.get(int(i))
            if rem is None or len(rem) == 0:
                clean.append(" ".join(toks))
                nrem.append(0)
                continue
            keep = np.ones(len(toks), dtype=bool)
            keep[rem] = False
            clean.append(" ".join(w for w, k in zip(toks, keep) if k))
            nrem.append(int((~keep).sum()))
        return (batch
                .append_column("clean_text",
                               pa.array(clean, type=pa.string()))
                .append_column("n_removed_tokens",
                               pa.array(nrem, type=pa.int64())))

    if method == "broadcast":
        dup_pd = dup_ds.to_pandas()
        lookup = ({} if len(dup_pd) == 0 or "sh" not in dup_pd.columns
                  else dict(zip(dup_pd["sh"].astype(np.int64),
                                dup_pd["keeper"].astype(np.int64))))
        lookup_ref = ray.put(lookup)

        def _apply(batch: pa.Table) -> pa.Table:
            lk = ray.get(lookup_ref)
            ids = batch[id_col].to_numpy()
            texts = batch[text_col].to_pylist()
            rbd: Dict[int, np.ndarray] = {}
            for i, t in zip(ids, texts):
                _, pos, sh = _window_hashes(t, window)
                if not len(pos):
                    continue
                sh_i = sh.view(np.int64)
                keepers = np.fromiter(
                    (lk.get(int(h), -1) for h in sh_i),
                    dtype=np.int64, count=len(sh_i))
                keys = int(i) * _MAXPOS + pos
                bad = (keepers != -1) & (keys != keepers)
                if bad.any():
                    rbd[int(i)] = np.unique(
                        (pos[bad][:, None]
                         + np.arange(window)).ravel())
            return _rebuild(batch, rbd)

        return ds.map_batches(_apply, batch_format="pyarrow")

    # join path: nothing O(dup-rate × corpus) on the driver
    dup_ds = dup_ds.materialize()
    if dup_ds.count() == 0:
        return ds.map_batches(
            lambda b: _rebuild(b, {}), batch_format="pyarrow")

    wins = ds.map_batches(_wins, batch_format="pyarrow")
    # repartition rebuilds groupby's schema-less empty blocks (Ray 2.49
    # join workaround, see .claude/skills/verify/SKILL.md)
    hit = wins.join(dup_ds.repartition(num_partitions),
                    join_type="inner",
                    num_partitions=num_partitions, on=("sh",))

    def _non_keeper(batch: pa.Table) -> pa.Table:
        kept = batch.filter(
            pc.invert(pc.equal(batch["key"], batch["keeper"])))
        keys = kept["key"].to_numpy()
        return pa.table({
            id_col: pa.array(keys // _MAXPOS, type=pa.int64()),
            "pos": pa.array(keys % _MAXPOS, type=pa.int64())})

    removed = hit.map_batches(_non_keeper, batch_format="pyarrow")

    def _collect(group: pd.DataFrame) -> pd.DataFrame:
        rem = np.unique((group["pos"].to_numpy()[:, None]
                         + np.arange(window)).ravel())
        return pd.DataFrame({
            id_col: [group[id_col].iloc[0]],
            "removed_csv": [",".join(map(str, rem))]})

    # only docs that actually lose tokens pay the per-group cost
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
        return _rebuild(batch, rbd).drop_columns(["removed_csv"])

    return joined.map_batches(_apply_join, batch_format="pyarrow")


def substring_dedup_oracle_sql(table: str = "documents",
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               window: int = 10) -> str:
    """DuckDB twin: recomputes every window hash (polynomial over the
    space-joined window's codepoints + splitmix64), the keeper-min /
    count aggregate, the unioned removal positions and the surviving
    token join — bit-for-bit against :func:`substring_dedup`."""
    from medcat_ray.ops.sql_oracle import (_M64, _P, _WS_CLASS,
                                           mix64_staged)
    W = int(window)
    gram_poly = (f"list_reduce([CAST(unicode(substr(gram, i, 1))"
                 f" AS HUGEINT) for i in generate_series(1,"
                 f" length(gram))], (acc, x) -> (acc * {_P} + x)"
                 f" % {_M64})")
    winsrc = (f"(SELECT {id_col}, ord,"
              f" array_to_string(ts[ord:ord+{W - 1}], ' ') AS gram"
              f" FROM (SELECT {id_col}, ts,"
              f" unnest(generate_series(1, len(ts) - {W - 1})) AS ord"
              f" FROM tl WHERE len(ts) >= {W}))")
    return f"""
WITH tl AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array(COALESCE({text_col}, ''),
                                           '{_WS_CLASS}+'),
                     t -> t <> '') AS ts
  FROM {table}),
wh AS ({mix64_staged(winsrc, f"{id_col}, ord", gram_poly, "wh")}),
dups AS (
  SELECT wh, MIN({id_col} * {_MAXPOS} + (ord - 1)) AS keeper
  FROM wh GROUP BY wh HAVING COUNT(*) > 1),
rem AS (
  SELECT DISTINCT w.{id_col},
         unnest(generate_series(w.ord - 1, w.ord + {W - 2})) AS rp
  FROM wh w JOIN dups d ON w.wh = d.wh
  WHERE w.{id_col} * {_MAXPOS} + (w.ord - 1) <> d.keeper),
kept AS (
  SELECT t.{id_col},
         COALESCE(string_agg(t.tok, ' ' ORDER BY t.ord), '') AS clean_text
  FROM (SELECT {id_col}, ord, ts[ord] AS tok
        FROM (SELECT {id_col}, ts,
                     unnest(generate_series(1, len(ts))) AS ord
              FROM tl WHERE len(ts) > 0)) t
  LEFT JOIN rem r ON r.{id_col} = t.{id_col} AND r.rp = t.ord - 1
  WHERE r.rp IS NULL
  GROUP BY t.{id_col}),
nrem AS (SELECT {id_col}, COUNT(*) AS n FROM rem GROUP BY {id_col})
SELECT d.{id_col},
       COALESCE(k.clean_text, '') AS clean_text,
       CAST(COALESCE(n.n, 0) AS BIGINT) AS n_removed_tokens
FROM {table} d
LEFT JOIN kept k ON k.{id_col} = d.{id_col}
LEFT JOIN nrem n ON n.{id_col} = d.{id_col}
ORDER BY d.{id_col}
"""
