"""Bloom-filter incremental dedup: the streaming-ingestion path of exact
dedup — an EXISTING corpus is summarized once into a fixed-size bit
array, and every NEW shard probes it with zero shuffle (the public
CCNet / Dolma pipelines use exactly this to dedup a new crawl against
already-ingested data without re-shuffling petabytes).

Everything is deterministic integer arithmetic so a DuckDB oracle can
rebuild the SAME filter and the SAME probe verdicts bit-for-bit, false
positives included (:func:`bloom_oracle_sql`; driver query
``bloom_dedup_incremental``):

* base hash  = splitmix64-finalized polynomial over the text's
  codepoints (ops/hashing.poly_hashes — the SQL-recomputable family);
* probe j    = splitmix64(base + j) mod ``m_bits``  (j = 0..k-1).

Scale shape: building the filter is one ``map_batches`` pass emitting a
per-batch partial bitmap (``m_bits/8`` bytes each, independent of batch
row count) OR-reduced on the driver — for the default 2^24 bits that is
2 MiB per partial; at cluster scale swap the driver loop for a
tree-reduce of the same OR.  Probing is a pure broadcast (``ray.put``
once, vectorized bit-gather per batch) — no shuffle ever touches the
new shard.  No false negatives: every exact duplicate of an existing
text is flagged; false-positive rate ~ (1 - e^(-k·n/m))^k.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from medcat_ray.ops.hashing import _mix64, poly_hashes


def _probe_positions(texts, m_bits: int, k: int) -> np.ndarray:
    """(n, k) int64 bloom positions for each text."""
    h = poly_hashes([t or "" for t in texts])          # uint64
    with np.errstate(over="ignore"):
        pos = _mix64(h[:, None] + np.arange(k, dtype=np.uint64)[None, :])
    return (pos % np.uint64(m_bits)).astype(np.int64)


def build_bloom(ds: rd.Dataset, text_col: str = "text",
                m_bits: int = 1 << 24, k: int = 4) -> np.ndarray:
    """Packed uint64 bitmap (length ``m_bits/64``) with every text's k
    probe bits set.  ``m_bits`` must be a multiple of 64."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    nwords = m_bits // 64

    def _partial(batch: pa.Table) -> pa.Table:
        bm = np.zeros(nwords, dtype=np.uint64)
        pos = _probe_positions(batch[text_col].to_pylist(),
                               m_bits, k).ravel()
        np.bitwise_or.at(bm, pos >> 6,
                         np.uint64(1) << (pos & 63).astype(np.uint64))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    out = np.zeros(nwords, dtype=np.uint64)
    for part in ds.map_batches(
            _partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for raw in part["bm"].to_pylist():
            out |= np.frombuffer(raw, dtype=np.uint64)
    return out


def probe_bloom(ds: rd.Dataset, bloom: np.ndarray,
                text_col: str = "text", m_bits: int = 1 << 24,
                k: int = 4, out_col: str = "maybe_seen") -> rd.Dataset:
    """Append ``out_col``: True iff all k probe bits are set in
    ``bloom`` (no false negatives; FP rate set by m/n/k).  The bitmap is
    shipped once via ``ray.put`` and bit-gathered per batch."""
    bloom_ref = ray.put(np.ascontiguousarray(bloom, dtype=np.uint64))

    def _probe(batch: pa.Table) -> pa.Table:
        bm = ray.get(bloom_ref)
        pos = _probe_positions(batch[text_col].to_pylist(), m_bits, k)
        bits = (bm[pos >> 6] >> (pos & 63).astype(np.uint64)) \
            & np.uint64(1)
        seen = bits.astype(bool).all(axis=1)
        return batch.append_column(out_col, pa.array(seen, pa.bool_()))

    return ds.map_batches(_probe, batch_format="pyarrow")


def bloom_oracle_sql(existing_where: str, probe_where: str,
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text", m_bits: int = 1 << 24,
                     k: int = 4) -> str:
    """DuckDB twin: rebuilds the exact probe-position set of the
    existing side and checks every probe row's k positions against it —
    identical verdicts to build_bloom+probe_bloom, false positives
    included."""
    from medcat_ray.ops.sql_oracle import _M64, _P, mix64_staged
    js = ", ".join(str(j) for j in range(int(k)))
    poly = (f"CASE WHEN length(t) = 0 THEN 0 ELSE"
            f" list_reduce([CAST(unicode(substr(t, i, 1)) AS HUGEINT)"
            f" for i in generate_series(1, length(t))],"
            f" (acc, x) -> (acc * {_P} + x) % {_M64}) END")

    def side(where: str, carry: str, src_cols: str) -> str:
        base = mix64_staged(
            f"(SELECT {src_cols}, COALESCE({text_col}, '') AS t"
            f" FROM {table} WHERE {where})", carry, poly, "h")
        return mix64_staged(
            f"(SELECT {carry}, h, unnest([{js}]) AS j FROM ({base}))",
            f"{carry}, j", f"(h + j) % {_M64}", "ph")

    return f"""
WITH expos AS (
  SELECT DISTINCT ph % {int(m_bits)} AS pos
  FROM ({side(existing_where, "1 AS one", "1 AS one")})),
probe AS (
  SELECT {id_col}, ph % {int(m_bits)} AS pos
  FROM ({side(probe_where, id_col, id_col)}))
SELECT p.{id_col},
       BOOL_AND(e.pos IS NOT NULL) AS maybe_seen
FROM probe p LEFT JOIN expos e ON e.pos = p.pos
GROUP BY p.{id_col}
ORDER BY p.{id_col}
"""
