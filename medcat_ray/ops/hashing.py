"""Deterministic hashing primitives shared by the dedup/fingerprint ops.

Python's builtin ``hash()`` is salted per process (PYTHONHASHSEED) and MUST
NOT be used in distributed transforms — two Ray workers would disagree.
Everything here is seed-stable across processes and platforms.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, List

import numpy as np

MERSENNE_PRIME = np.uint64((1 << 61) - 1)
_MAX_HASH = np.uint64((1 << 32) - 1)


def stable_u64(data: bytes) -> int:
    """64-bit stable hash (blake2b-8)."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def stable_hex(data: bytes, n: int = 16) -> str:
    return hashlib.blake2b(data, digest_size=n).hexdigest()


def text_hashes(texts: Iterable[str]) -> List[int]:
    """Stable 64-bit content hash per text (exact-dedup key)."""
    return [stable_u64(t.encode("utf-8", "surrogatepass")) for t in texts]


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit population count (SWAR; numpy<2 lacks
    ``np.bitwise_count``).  Returns int64 counts."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) + \
        ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >>
            np.uint64(56)).astype(np.int64)


_POLY_BASE = np.uint64(1_000_003)
_POLY_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-character-shingle hashes of a text as uint64.

    Character shingles (not word) so short/agglutinative texts still get a
    signature; k=5 is the common near-dup setting.  Hashing is a vectorized
    polynomial over UTF-32 codepoints with a splitmix-style finalizer —
    process-stable and ~1000× faster than per-shingle digests."""
    if not text:
        return np.array([], dtype=np.uint64)
    codes = np.frombuffer(text.encode("utf-32-le", "surrogatepass"),
                          dtype=np.uint32).astype(np.uint64)
    n = len(codes)
    if n < k:
        h = np.uint64(0)
        with np.errstate(over="ignore"):   # deliberate mod-2^64 wraparound
            for c in codes:
                h = h * _POLY_BASE + c
        return np.unique(_mix64(np.array([h], dtype=np.uint64)))
    m = n - k + 1
    with np.errstate(over="ignore"):
        H = np.zeros(m, dtype=np.uint64)
        for t in range(k):  # k adds of vectorized slices (k is tiny)
            H = H * _POLY_BASE + codes[t:t + m]
    return np.unique(_mix64(H))


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: spreads polynomial hashes over all 64 bits."""
    with np.errstate(over="ignore"):
        h = (h + _POLY_MIX)
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def minhash_params(num_perm: int, seed: int = 1) -> tuple:
    """(a, b) affine-permutation parameters for MinHash, seeded."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(MERSENNE_PRIME), size=num_perm, dtype=np.uint64)
    b = rng.integers(0, int(MERSENNE_PRIME), size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of ((a*h + b) mod p) & 32-bit."""
    if shingles.size == 0:
        return np.full(a.shape[0], int(_MAX_HASH), dtype=np.uint64)
    # (num_perm, n_shingles) broadcast; modular arithmetic in uint64 with
    # wraparound is fine for dedup purposes (stable, well mixed)
    vals = (a[:, None] * shingles[None, :] + b[:, None]) % MERSENNE_PRIME
    return (vals & _MAX_HASH).min(axis=1)


def band_key(sig: np.ndarray, band: int, rows: int) -> int:
    """Stable hash of one LSH band slice of a signature."""
    return int(band_keys(sig[None, :], band * rows, (band + 1) * rows)[0])


def band_keys(sigs: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Vectorized band keys for a (n_docs, num_perm) signature matrix:
    splitmix-finalized polynomial over the band's signature rows (columns
    ``lo:hi``), mod 2^64.  Equal band slices ⇒ equal keys (what LSH
    bucketing needs); pure arithmetic so a SQL oracle can recompute it
    exactly (unlike a digest) — see __ray_entry__ ``minhash_dedup_docs``."""
    with np.errstate(over="ignore"):
        h = np.zeros(sigs.shape[0], dtype=np.uint64)
        for c in range(lo, hi):
            h = h * _POLY_BASE + sigs[:, c]
    return _mix64(h)


def poly_hashes(strs: List[str]) -> np.ndarray:
    """Vectorized full-string hashes: the shingle polynomial + splitmix64
    finalizer applied to each whole string (uint64).  Used for SimHash
    token hashing — pure arithmetic, so a SQL oracle can recompute it
    (DuckDB ``list_reduce`` over codepoints; see ops/sql_oracle.py),
    unlike a blake2b digest."""
    if not strs:
        return np.array([], dtype=np.uint64)
    arrs = [np.frombuffer(s.encode("utf-32-le", "surrogatepass"),
                          dtype=np.uint32) for s in strs]
    lens = np.array([len(a) for a in arrs], dtype=np.int64)
    max_len = int(lens.max()) if len(lens) else 0
    mat = np.zeros((len(strs), max_len), dtype=np.uint64)
    for i, a in enumerate(arrs):
        mat[i, :len(a)] = a
    h = np.zeros(len(strs), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for t in range(max_len):   # max token length iterations, not n
            active = t < lens
            h[active] = h[active] * _POLY_BASE + mat[active, t]
    return _mix64(h)


def simhash64(token_hashes: np.ndarray, weights: np.ndarray = None) -> int:
    """64-bit SimHash over token hashes (bit-vote with optional weights)."""
    if token_hashes.size == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = bits * 2 - 1
    if weights is not None:
        votes = votes * weights[:, None]
    acc = votes.sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def rolling_fingerprint(text: str, base: int = 1_000_003,
                        mod: int = (1 << 61) - 1) -> int:
    """Rabin-Karp rolling-hash document fingerprint over the whole
    normalized text (whitespace-collapsed, lowercase)."""
    h = 0
    for ch in " ".join(text.lower().split()):
        h = (h * base + ord(ch)) % mod
    return h
