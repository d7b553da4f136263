"""Sequence packing: the training-corpus export step that turns a document
stream into fixed-length token blocks (the public GPT/T5 data pipelines
concat-and-chunk documents into ``block_size`` training examples).

Per-document chunking (each document yields ``ceil(n_tokens/L)`` blocks,
the last one ragged) — deterministic and embarrassingly parallel, so it
streams at any corpus size with zero shuffle.  Cross-document greedy
packing is intentionally NOT done here: it is order-dependent and
therefore not reproducible under Ray's nondeterministic block order; the
public pipelines that need it sort first (``ds.sort`` upstream) and then
this op applies per-partition.

Each emitted block row carries a 63-bit checksum of its token hashes
(order-independent sum of the splitmix64-finalized polynomial token
hashes — :func:`medcat_ray.ops.hashing.poly_hashes`), so a DuckDB oracle
can recompute every block byte-exactly (driver query ``doc_seq_blocks``).

Vectorization: tokens are ``str.split()`` per document (one C call), all
tokens of the batch are hashed in ONE ``poly_hashes`` call, block sums
are ``np.add.reduceat`` at precomputed boundaries — no Python loop over
tokens or blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from medcat_ray.ops.hashing import poly_hashes

_MASK63 = np.uint64((1 << 63) - 1)


def pack_sequences(ds: rd.Dataset, text_col: str = "text",
                   id_col: str = "doc_id",
                   block_size: int = 64) -> rd.Dataset:
    """One row per fixed-length token block:
    ``(id_col, block_idx, block_tokens, block_hash)``.

    ``block_tokens`` is ``block_size`` for all but possibly the last
    block of a document; documents with zero tokens yield zero rows.
    ``block_hash`` = (sum of the block's token hashes mod 2^64) & (2^63-1)
    as int64 — a content checksum of the exact token ids a trainer would
    see."""
    L = int(block_size)
    if L <= 0:
        raise ValueError("block_size must be positive")

    def _pack(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        toks_per_doc = [(t or "").split() for t in texts]
        n_tok = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        flat = [w for ts in toks_per_doc for w in ts]
        th = poly_hashes(flat)                      # uint64, one call

        n_blocks = -(-n_tok // L)                   # ceil; 0 for empty docs
        doc_rep = np.repeat(np.arange(len(ids)), n_blocks)
        total = int(n_blocks.sum())
        if total == 0:
            return pa.table({
                id_col: pa.array([], batch[id_col].type),
                "block_idx": pa.array([], pa.int64()),
                "block_tokens": pa.array([], pa.int64()),
                "block_hash": pa.array([], pa.int64())})
        # block_idx: 0..n_blocks[d]-1 within each doc
        starts_of_doc = np.repeat(np.cumsum(n_blocks) - n_blocks, n_blocks)
        block_idx = np.arange(total) - starts_of_doc
        # token-range boundaries in the flattened hash array
        doc_off = np.cumsum(n_tok) - n_tok          # first token of each doc
        blk_lo = doc_off[doc_rep] + block_idx * L
        blk_hi = np.minimum(blk_lo + L, (doc_off + n_tok)[doc_rep])
        block_tokens = blk_hi - blk_lo
        # reduceat needs sorted unique start indices; blk_lo is globally
        # non-decreasing by construction (docs in order, blocks in order)
        with np.errstate(over="ignore"):
            sums = np.add.reduceat(th, blk_lo) if th.size else np.array(
                [], dtype=np.uint64)
        # reduceat quirk: an index == len(arr)-0 slice works, but equal
        # consecutive indices (empty slice) can't occur here since every
        # block has >= 1 token.
        block_hash = (sums & _MASK63).astype(np.int64)
        return pa.table({
            id_col: pa.array(ids[doc_rep], batch[id_col].type),
            "block_idx": pa.array(block_idx, pa.int64()),
            "block_tokens": pa.array(block_tokens, pa.int64()),
            "block_hash": pa.array(block_hash, pa.int64())})

    return ds.map_batches(_pack, batch_format="pyarrow")


def packing_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text", block_size: int = 64) -> str:
    """DuckDB twin of :func:`pack_sequences` — recomputes the token
    hashes (poly over codepoints + splitmix64, via mix64_staged) and the
    per-block checksum arithmetic exactly."""
    from medcat_ray.ops.sql_oracle import _M64, _P, _WS_CLASS, mix64_staged
    tok_poly = (f"list_reduce([CAST(unicode(substr(tok, i, 1)) AS HUGEINT)"
                f" for i in generate_series(1, length(tok))],"
                f" (acc, x) -> (acc * {_P} + x) % {_M64})")
    toksrc = (f"(SELECT {id_col}, ord, ts[ord] AS tok FROM ("
              f"SELECT {id_col}, ts, unnest(generate_series(1, len(ts)))"
              f" AS ord FROM (SELECT {id_col},"
              f" list_filter(regexp_split_to_array(COALESCE({text_col},"
              f" ''), '{_WS_CLASS}+'), t -> t <> '') AS ts FROM {table})"
              f" WHERE len(ts) > 0))")
    return f"""
WITH th AS ({mix64_staged(toksrc, f"{id_col}, ord", tok_poly, "th")})
SELECT {id_col}, CAST((ord - 1) // {int(block_size)} AS BIGINT) AS block_idx,
       COUNT(*) AS block_tokens,
       CAST((SUM(th) % {_M64}) % {1 << 63} AS BIGINT) AS block_hash
FROM th GROUP BY {id_col}, block_idx
ORDER BY {id_col}, block_idx
"""
