"""HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
classic fixed-memory cardinality estimator a 100 TB pipeline uses where
an exact ``unique`` would be an all-to-all shuffle: per-batch register
arrays (2^p bytes each, independent of row count) max-combine
associatively, so the whole corpus reduces with ZERO shuffle — one
``map_batches`` pass + a driver (or tree) max.

Everything is deterministic integer arithmetic over the engine's
SQL-recomputable token hashes (ops/hashing.poly_hashes):

* bucket   = h >> (64 - p)                      (top p bits)
* w        = h  & (2^(64-p) - 1)                (remaining bits)
* rho(w)   = 1 + |{k in 1..64-p : w < 2^(64-p-k)}|   (leading zeros + 1)
* register = max rho per bucket

rho is computed by INTEGER threshold comparisons on both sides (numpy
searchsorted here, a thresholds join in DuckDB) — deliberately no
float ``log2``, whose boundary rounding could disagree across libms.
The ``corpus_hll_tokens`` driver query compares the raw registers
EXACTLY; the estimate is derived client-side (:func:`hll_estimate`,
classic alpha·m²/Σ2^-M with the small-range linear-counting branch)
and accuracy-tested against true distinct counts in tests.

Use p in [4, 18]; p=12 (4096 registers, ~±1.6% rel. error) default.
p <= 12 also keeps w < 2^52, int64-safe everywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from medcat_ray.ops.hashing import poly_hashes


def _rho(w: np.ndarray, bits: int) -> np.ndarray:
    """1 + leading-zero count of ``w`` within a ``bits``-wide word —
    integer threshold comparisons only (w == 0 → bits + 1)."""
    # thresholds 2^(bits-1) ... 2^0 descending; rho = 1 + count of
    # thresholds strictly greater than w
    thr = (np.uint64(1) << np.arange(bits - 1, -1, -1,
                                     dtype=np.uint64))
    # count thr > w  ==  bits - searchsorted(ascending thr, w, 'right')
    asc = thr[::-1]
    gt = bits - np.searchsorted(asc, w, side="right")
    return (gt + 1).astype(np.int64)


def hll_registers(ds: rd.Dataset, text_col: str = "text",
                  p: int = 12) -> np.ndarray:
    """HLL registers (int64 array of length 2^p) over the DISTINCT
    lowercased whitespace tokens of ``text_col``."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    bits = 64 - p

    def _partial(batch: pa.Table) -> pa.Table:
        toks = set()
        for t in batch[text_col].to_pylist():
            toks.update((t or "").lower().split())
        reg = np.zeros(m, dtype=np.int64)
        if toks:
            h = poly_hashes(sorted(toks))
            bucket = (h >> np.uint64(bits)).astype(np.int64)
            w = h & np.uint64((1 << bits) - 1)
            np.maximum.at(reg, bucket, _rho(w, bits))
        return pa.table({"reg": pa.array([reg.tobytes()], pa.binary())})

    out = np.zeros(m, dtype=np.int64)
    for part in ds.map_batches(
            _partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for raw in part["reg"].to_pylist():
            np.maximum(out, np.frombuffer(raw, dtype=np.int64), out=out)
    return out


def hll_estimate(registers: np.ndarray) -> float:
    """Cardinality estimate from a register array: alpha_m·m²/Σ2^-M,
    with the small-range linear-counting branch (Flajolet §4)."""
    m = len(registers)
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m >= 64:
        alpha = 0.709
    elif m >= 32:
        alpha = 0.697
    else:
        alpha = 0.673
    s = float(np.power(2.0, -registers.astype(np.float64)).sum())
    e = alpha * m * m / s
    if e <= 2.5 * m:
        zeros = int((registers == 0).sum())
        if zeros:
            return m * float(np.log(m / zeros))
    return e


def hll_oracle_sql(table: str = "documents", text_col: str = "text",
                   p: int = 12) -> str:
    """DuckDB twin: identical token hashes (poly + splitmix64), identical
    integer bucket/rho arithmetic, MAX per bucket.  Emits only NONZERO
    registers (bucket, register) — compare against
    ``hll_registers`` nonzero entries exactly."""
    from medcat_ray.ops.sql_oracle import _M64, _P, _WS_CLASS, mix64_staged
    bits = 64 - int(p)
    tok_poly = (f"list_reduce([CAST(unicode(substr(tok, i, 1)) AS HUGEINT)"
                f" for i in generate_series(1, length(tok))],"
                f" (acc, x) -> (acc * {_P} + x) % {_M64})")
    toksrc = (f"(SELECT DISTINCT tok FROM (SELECT unnest("
              f"regexp_split_to_array(lower(COALESCE({text_col}, '')),"
              f" '{_WS_CLASS}+')) AS tok FROM {table}) WHERE tok <> '')")
    thr_rows = ", ".join(f"({1 << b}::HUGEINT)"
                         for b in range(bits - 1, -1, -1))
    return f"""
WITH th AS ({mix64_staged(toksrc, "tok", tok_poly, "h")}),
hw AS (
  SELECT h // {1 << bits} AS bucket, h % {1 << bits} AS w FROM th),
thr(t) AS (VALUES {thr_rows}),
rho AS (
  SELECT bucket,
         1 + (SELECT COUNT(*) FROM thr WHERE w < t) AS r
  FROM hw)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(MAX(r) AS BIGINT) AS register
FROM rho GROUP BY bucket
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def cms_counts(ds: rd.Dataset, text_col: str = "text", depth: int = 4,
               width: int = 1 << 12) -> np.ndarray:
    """Count-min sketch of TOKEN OCCURRENCES (not distinct): a
    (depth, width) int64 count matrix.  Row j buckets a token by
    ``splitmix64(h + j) mod width`` over the SQL-recomputable token
    hash — the same j-salting as the bloom filter, so a DuckDB twin
    reproduces every cell exactly (:func:`cms_oracle_sql`).

    Per-batch partial matrices ADD associatively → zero-shuffle reduce,
    fixed memory (depth·width·8 bytes) at any corpus size — the
    heavy-hitter / frequency-estimation companion of the HLL sketch."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be positive")

    def _partial(batch: pa.Table) -> pa.Table:
        toks: list = []
        for t in batch[text_col].to_pylist():
            toks.extend((t or "").lower().split())
        M = np.zeros((depth, width), dtype=np.int64)
        if toks:
            h = poly_hashes(toks)
            from medcat_ray.ops.hashing import _mix64
            with np.errstate(over="ignore"):
                for j in range(depth):
                    pos = (_mix64(h + np.uint64(j))
                           % np.uint64(width)).astype(np.int64)
                    np.add.at(M[j], pos, 1)
        return pa.table({"m": pa.array([M.tobytes()], pa.binary())})

    out = np.zeros((depth, width), dtype=np.int64)
    for part in ds.map_batches(
            _partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for raw in part["m"].to_pylist():
            out += np.frombuffer(raw, dtype=np.int64).reshape(depth,
                                                              width)
    return out


def cms_estimate(sketch: np.ndarray, tokens) -> np.ndarray:
    """Point-query estimates (min over rows) for ``tokens`` — an upper
    bound on each token's true count, within eN/width w.h.p."""
    from medcat_ray.ops.hashing import _mix64
    depth, w = sketch.shape
    h = poly_hashes([str(t) for t in tokens])
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    with np.errstate(over="ignore"):
        for j in range(depth):
            pos = (_mix64(h + np.uint64(j)) % np.uint64(w)).astype(np.int64)
            est = np.minimum(est, sketch[j, pos])
    return est


def cms_oracle_sql(table: str = "documents", text_col: str = "text",
                   depth: int = 4, width: int = 1 << 12) -> str:
    """DuckDB twin of :func:`cms_counts`: every nonzero cell
    (row, bucket, count) exactly."""
    from medcat_ray.ops.sql_oracle import _M64, _P, _WS_CLASS, mix64_staged
    tok_poly = (f"list_reduce([CAST(unicode(substr(tok, i, 1)) AS HUGEINT)"
                f" for i in generate_series(1, length(tok))],"
                f" (acc, x) -> (acc * {_P} + x) % {_M64})")
    toksrc = (f"(SELECT tok, COUNT(*) AS n FROM (SELECT unnest("
              f"regexp_split_to_array(lower(COALESCE({text_col}, '')),"
              f" '{_WS_CLASS}+')) AS tok FROM {table})"
              f" WHERE tok <> '' GROUP BY tok)")
    js = ", ".join(str(j) for j in range(int(depth)))
    base = mix64_staged(toksrc, "tok, n", tok_poly, "h")
    salted = mix64_staged(
        f"(SELECT n, h, unnest([{js}]) AS j FROM ({base}))",
        "n, j", f"(h + j) % {_M64}", "ph")
    return f"""
SELECT CAST(j AS BIGINT) AS row,
       CAST(ph % {int(width)} AS BIGINT) AS bucket,
       CAST(SUM(n) AS BIGINT) AS count
FROM ({salted})
GROUP BY row, bucket
ORDER BY row, bucket
"""


def hll_registers_grouped(ds: rd.Dataset, group_col: str,
                          text_col: str = "text",
                          p: int = 12) -> rd.Dataset:
    """Grouped HLL: sparse ``(group, bucket, register)`` rows via one
    map_batches partial (per-group register max within the batch) and a
    NATIVE ``groupby(group, bucket).Max`` — the grouped-distinct
    substitute at scale.  Shuffle volume is bounded by distinct
    (group, bucket) pairs per batch (≤ groups·2^p, independent of row
    count), and the per-group register sets merge associatively, so a
    downstream consumer can keep folding them (e.g. per-day → per-month
    rollups) without ever touching raw tokens again."""
    from ray.data.aggregate import Max

    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p
    bits = 64 - p

    def _partial(batch: pa.Table) -> pa.Table:
        by_group: dict = {}
        for g, t in zip(batch[group_col].to_pylist(),
                        batch[text_col].to_pylist()):
            by_group.setdefault(g, set()).update((t or "").lower().split())
        gcol, bcol, rcol = [], [], []
        for g, toks in by_group.items():
            if not toks:
                continue
            h = poly_hashes(sorted(toks))
            bucket = (h >> np.uint64(bits)).astype(np.int64)
            w = h & np.uint64((1 << bits) - 1)
            reg = np.zeros(m, dtype=np.int64)
            np.maximum.at(reg, bucket, _rho(w, bits))
            nz = np.nonzero(reg)[0]
            gcol.extend([g] * len(nz))
            bcol.append(nz)
            rcol.append(reg[nz])
        bc = np.concatenate(bcol) if bcol else np.array([], dtype=np.int64)
        rc = np.concatenate(rcol) if rcol else np.array([], dtype=np.int64)
        return pa.table({
            group_col: pa.array(gcol, type=batch[group_col].type),
            "bucket": pa.array(bc, type=pa.int64()),
            "register": pa.array(rc, type=pa.int64())})

    return ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby([group_col, "bucket"]) \
        .aggregate(Max("register", alias_name="register"))


def hll_estimate_grouped(rows, p: int = 12,
                         group_col: str = "lang") -> dict:
    """Per-group cardinality estimates from the sparse grouped-register
    rows (driver-side convenience; absent buckets count as zero)."""
    m = 1 << p
    regs: dict = {}
    for r in rows:
        reg = regs.setdefault(r[group_col], np.zeros(m, dtype=np.int64))
        reg[r["bucket"]] = max(reg[r["bucket"]], r["register"])
    return {g: hll_estimate(reg) for g, reg in regs.items()}


def hll_grouped_oracle_sql(table: str = "documents",
                           group_col: str = "lang",
                           text_col: str = "text", p: int = 12) -> str:
    """DuckDB twin of :func:`hll_registers_grouped` — identical hashes
    and integer bucket/rho arithmetic, MAX per (group, bucket)."""
    from medcat_ray.ops.sql_oracle import _M64, _P, _WS_CLASS, mix64_staged
    bits = 64 - int(p)
    tok_poly = (f"list_reduce([CAST(unicode(substr(tok, i, 1)) AS HUGEINT)"
                f" for i in generate_series(1, length(tok))],"
                f" (acc, x) -> (acc * {_P} + x) % {_M64})")
    toksrc = (f"(SELECT DISTINCT grp, tok FROM (SELECT {group_col} AS grp,"
              f" unnest(regexp_split_to_array(lower(COALESCE({text_col},"
              f" '')), '{_WS_CLASS}+')) AS tok FROM {table})"
              f" WHERE tok <> '')")
    thr_rows = ", ".join(f"({1 << b}::HUGEINT)"
                         for b in range(bits - 1, -1, -1))
    return f"""
WITH th AS ({mix64_staged(toksrc, "grp", tok_poly, "h")}),
hw AS (
  SELECT grp, h // {1 << bits} AS bucket, h % {1 << bits} AS w FROM th),
thr(t) AS (VALUES {thr_rows}),
rho AS (
  SELECT grp, bucket,
         1 + (SELECT COUNT(*) FROM thr WHERE w < t) AS r
  FROM hw)
SELECT grp AS {group_col}, CAST(bucket AS BIGINT) AS bucket,
       CAST(MAX(r) AS BIGINT) AS register
FROM rho GROUP BY grp, bucket
ORDER BY {group_col}, bucket
"""


def cms_heavy_hitters(ds: rd.Dataset, threshold: int,
                      text_col: str = "text", depth: int = 4,
                      width: int = 1 << 12) -> rd.Dataset:
    """Heavy-hitter candidates via the count-min sketch: every distinct
    token whose CMS estimate reaches ``threshold`` (a superset of the
    true ≥-threshold set — CMS never underestimates), with its estimate.

    Scale shape: the sketch itself reduces with zero shuffle
    (:func:`cms_counts`); the candidate pass broadcasts the (depth ×
    width) matrix and emits per-batch distinct candidates only — at most
    total_occurrences / threshold distinct tokens can qualify, so the
    dedup groupby carries a threshold-bounded stream, never the corpus.
    Estimates are deterministic integers, so the DuckDB twin
    (:func:`cms_heavy_hitters_oracle_sql`) matches exactly, false
    positives included."""
    import ray
    from ray.data.aggregate import Max

    M = cms_counts(ds, text_col, depth, width)
    ref = ray.put(M)

    def cand(batch: pa.Table) -> pa.Table:
        sketch = ray.get(ref)
        toks = set()
        for t in batch[text_col].to_pylist():
            toks.update((t or "").lower().split())
        toks = sorted(toks)
        if toks:
            est = cms_estimate(sketch, toks)
            keep = est >= threshold
            terms = np.asarray(toks, dtype=object)[keep]
            est = est[keep]
        else:
            terms = np.array([], dtype=object)
            est = np.array([], dtype=np.int64)
        return pa.table({"term": pa.array(terms, type=pa.string()),
                         "est": pa.array(est.astype(np.int64),
                                         type=pa.int64())})

    return ds.map_batches(cand, batch_format="pyarrow") \
        .groupby("term").aggregate(Max("est", alias_name="est"))


def cms_heavy_hitters_oracle_sql(table: str = "documents",
                                 text_col: str = "text", depth: int = 4,
                                 width: int = 1 << 12,
                                 threshold: int = 100) -> str:
    """SQL twin of :func:`cms_heavy_hitters`: recompute every sketch
    cell, then each distinct token's min-over-rows estimate."""
    from medcat_ray.ops.sql_oracle import _M64, _P, _WS_CLASS, mix64_staged
    tok_poly = (f"list_reduce([CAST(unicode(substr(tok, i, 1)) AS HUGEINT)"
                f" for i in generate_series(1, length(tok))],"
                f" (acc, x) -> (acc * {_P} + x) % {_M64})")
    toksrc = (f"(SELECT tok, COUNT(*) AS n FROM (SELECT unnest("
              f"regexp_split_to_array(lower(COALESCE({text_col}, '')),"
              f" '{_WS_CLASS}+')) AS tok FROM {table})"
              f" WHERE tok <> '' GROUP BY tok)")
    js = ", ".join(str(j) for j in range(int(depth)))
    base = mix64_staged(toksrc, "tok, n", tok_poly, "h")
    salted = mix64_staged(
        f"(SELECT tok, n, h, unnest([{js}]) AS j FROM ({base}))",
        "tok, n, j", f"(h + j) % {_M64}", "ph")
    return f"""
WITH cells AS (
  SELECT j AS row, ph % {int(width)} AS bucket, SUM(n) AS cnt
  FROM ({salted}) GROUP BY row, bucket
),
probes AS (
  SELECT tok, j AS row, ph % {int(width)} AS bucket
  FROM ({salted})
),
est AS (
  SELECT p.tok, MIN(c.cnt) AS est
  FROM probes p JOIN cells c ON c.row = p.row AND c.bucket = p.bucket
  GROUP BY p.tok
)
SELECT tok AS term, CAST(est AS BIGINT) AS est
FROM est WHERE est >= {int(threshold)}
ORDER BY term
"""
