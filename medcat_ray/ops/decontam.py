"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation/benchmark set (the GPT-3/PaLM-style
"13-gram overlap" pass; n is configurable, default 8).

Scale design (100 TB corpus, bounded benchmark): the benchmark side is
small by construction (a few million n-grams even for a large eval
suite), so its distinct gram hashes are collected once, sorted, put in
the object store with ``ray.put``, and every ``map_batches`` task probes
them with a single ``np.searchsorted`` over the batch's concatenated
gram hashes — no shuffle, no join, volume ∝ corpus and one broadcast.

Gram hashing is the same SQL-recomputable arithmetic as the rest of the
dedup family (ops/hashing.py): a polynomial over UTF-32 codepoints of
the space-joined gram, mod 2^64, through the splitmix64 finalizer — so a
DuckDB oracle can rebuild the exact hash values (see
``decontaminate_oracle_sql`` in ops/sql_oracle.py) and the per-document
distinct-overlap counts match bit-for-bit, collisions included.

Tokenization parity: ``text.lower().split()`` (Python Unicode-whitespace
semantics) ↔ ``regexp_split_to_array(lower(text), WS+)`` with empties
filtered, the same pairing used by the simhash oracle.

Reference analogue: none in MedCAT (this is an LLM-training-data
operator); semantics follow the published decontamination procedure of
GPT-3 appendix C / PaLM §7 (n-gram overlap against benchmark sets).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

from medcat_ray.ops.hashing import _POLY_BASE, _mix64

# multiplicative inverse of the polynomial base mod 2^64 (base is odd),
# used by the prefix-polynomial span hasher below
_PINV = np.uint64(pow(int(_POLY_BASE), -1, 1 << 64))


def _span_hashes(joined: str, starts: np.ndarray,
                 ends: np.ndarray) -> np.ndarray:
    """Polynomial hashes (mod 2^64, splitmix64-finalized) of the
    ``joined[l:r]`` codepoint spans, vectorized with prefix polynomials.

    pref[k] = sum_{j<k} c[j]·P^(k-1-j) = P^k · sum_{j<k} c[j]·P^-(j+1),
    so one cumsum of c[j]·Pinv^(j+1) plus two power tables gives every
    prefix, and H(l, r) = pref[r] − pref[l]·P^(r−l); all arithmetic is
    deliberate uint64 wraparound (mod 2^64).
    """
    codes = np.frombuffer(joined.encode("utf-32-le", "surrogatepass"),
                          dtype=np.uint32).astype(np.uint64)
    n = len(codes)
    with np.errstate(over="ignore"):
        ppow = np.ones(n + 1, dtype=np.uint64)
        pinv = np.ones(n + 1, dtype=np.uint64)
        if n:
            np.cumprod(np.full(n, _POLY_BASE, dtype=np.uint64),
                       out=ppow[1:])
            np.cumprod(np.full(n, _PINV, dtype=np.uint64), out=pinv[1:])
        pref = np.zeros(n + 1, dtype=np.uint64)
        if n:
            np.cumsum(codes * pinv[1:], out=pref[1:])
            pref *= ppow
        h = pref[ends] - pref[starts] * ppow[ends - starts]
    return _mix64(h)


def doc_gram_hashes_all(text: str, n: int = 8) -> np.ndarray:
    """Word-n-gram hashes of one document, ONE PER OCCURRENCE (uint64,
    document order) — the bag-of-grams stream (used by DSIR importance
    weighting, ops/dsir.py).

    Grams are ``' '.join(tokens[i:i+n])`` over ``text.lower().split()``;
    a document with 1..n-1 tokens contributes its whole token sequence
    as a single gram (mirrored by the SQL oracle's short-doc branch);
    a tokenless document contributes nothing.
    """
    toks = (text or "").lower().split()
    t = len(toks)
    if t == 0:
        return np.array([], dtype=np.uint64)
    joined = " ".join(toks)
    if t < n:
        starts = np.array([0], dtype=np.int64)
        ends = np.array([len(joined)], dtype=np.int64)
    else:
        lens = np.fromiter((len(w) for w in toks), dtype=np.int64, count=t)
        tok_starts = np.zeros(t, dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=tok_starts[1:])
        m = t - n + 1
        starts = tok_starts[:m]
        ends = tok_starts[n - 1:] + lens[n - 1:]
    return _span_hashes(joined, starts, ends)


def doc_gram_hashes(text: str, n: int = 8) -> np.ndarray:
    """Distinct word-n-gram hashes of one document (uint64, sorted) —
    see :func:`doc_gram_hashes_all` for the gram semantics."""
    return np.unique(doc_gram_hashes_all(text, n))


def benchmark_gram_set(ds: rd.Dataset, text_col: str = "text",
                       n: int = 8) -> np.ndarray:
    """Sorted distinct gram hashes of a (small, by construction)
    benchmark dataset.  Per-batch distinct first, global distinct on the
    driver — the result is the broadcast side of the probe, assumed to
    fit in memory (eval suites are ≤ millions of grams)."""
    def _grams(batch: pa.Table) -> pa.Table:
        out = [doc_gram_hashes(txt, n) for txt in
               batch[text_col].to_pylist()]
        flat = (np.unique(np.concatenate(out)) if out
                else np.array([], dtype=np.uint64))
        return pa.table({"gh": pa.array(flat, type=pa.uint64())})

    parts = ds.map_batches(_grams, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return np.array([], dtype=np.uint64)
    return np.unique(parts["gh"].to_numpy().astype(np.uint64))


def flag_contamination(ds: rd.Dataset, bench_hashes: np.ndarray,
                       text_col: str = "text", n: int = 8) -> rd.Dataset:
    """Append ``n_overlap_grams`` (distinct doc grams that appear in the
    benchmark set) and ``contaminated`` to every row.  The benchmark
    array is shipped once via ``ray.put`` and probed with searchsorted —
    a broadcast semi-join, no shuffle."""
    bench_ref = ray.put(np.sort(np.asarray(bench_hashes,
                                           dtype=np.uint64)))

    def _flag(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        texts = batch[text_col].to_pylist()
        per_doc: List[np.ndarray] = [doc_gram_hashes(t, n) for t in texts]
        counts = np.fromiter((len(g) for g in per_doc), dtype=np.int64,
                             count=len(per_doc))
        if counts.sum() and len(bench):
            flat = np.concatenate(per_doc)
            idx = np.searchsorted(bench, flat)
            idx[idx == len(bench)] = 0
            hit = (bench[idx] == flat).astype(np.int64)
            # zero-length segments: reduceat needs nonempty groups —
            # prepend a sentinel per doc so every segment has width ≥ 1
            bounds = np.zeros(len(per_doc), dtype=np.int64)
            np.cumsum(counts[:-1], out=bounds[1:])
            seg = np.zeros(len(per_doc), dtype=np.int64)
            nz = counts > 0
            if nz.any():
                seg_nz = np.add.reduceat(hit, bounds[nz])
                seg[nz] = seg_nz
            n_overlap = seg
        else:
            n_overlap = np.zeros(len(per_doc), dtype=np.int64)
        return (batch
                .append_column("n_overlap_grams",
                               pa.array(n_overlap, type=pa.int64()))
                .append_column("contaminated",
                               pa.array(n_overlap > 0, type=pa.bool_())))

    return ds.map_batches(_flag, batch_format="pyarrow")
