"""Property-based invariants (hypothesis) for the hashing/tokenize/dedup
primitives every distributed stage leans on."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from medcat_ray.functions.text import lemmatize, tokenize
from medcat_ray.ops.dedup import (_SIM_COMBOS, _SIM_WIDTHS, _simhash_block,
                                  jaccard)
from medcat_ray.ops.hashing import popcount64, stable_u64, text_hashes

TEXT = st.text(
    alphabet=st.characters(codec="utf-8",
                           blacklist_categories=("Cs",)),
    max_size=200)


@settings(max_examples=200, deadline=None)
@given(TEXT)
def test_tokenize_span_invariants(text):
    toks = tokenize(text)
    prev_end = -1
    for i, t in enumerate(toks):
        assert t.idx == i
        assert text[t.start:t.end] == t.text       # offsets index the text
        assert t.start >= prev_end                  # ordered, non-overlap
        prev_end = t.end
    # every non-space char is covered by exactly one token span
    covered = np.zeros(len(text), dtype=bool)
    for t in toks:
        covered[t.start:t.end] = True
    for i, ch in enumerate(text):
        if not ch.isspace():
            assert covered[i], (i, ch)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1,
               max_size=15))
def test_lemmatize_basic_properties(word):
    lemma = lemmatize(word)
    assert lemma == lemma.lower()
    assert len(lemma) <= len(word)
    # deterministic
    assert lemmatize(word) == lemma


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_popcount64_matches_python(x):
    arr = np.array([x], dtype=np.uint64)
    assert int(popcount64(arr)[0]) == bin(x).count("1")


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64))
def test_stable_u64_range_and_determinism(data):
    h = stable_u64(data)
    assert 0 <= h < 2**64
    assert stable_u64(data) == h


@settings(max_examples=100, deadline=None)
@given(TEXT, TEXT)
def test_jaccard_bounds_and_symmetry(a, b):
    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert jaccard(b, a) == j
    assert jaccard(a, a) == 1.0


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_simhash_blocks_partition_the_word(h):
    """The 6 blocks exactly reconstruct the 64-bit simhash."""
    arr = np.array([h], dtype=np.uint64)
    acc = np.uint64(0)
    off = 0
    for b in range(6):
        acc |= _simhash_block(arr, b)[0] << np.uint64(off)
        off += _SIM_WIDTHS[b]
    assert off == 64
    assert int(acc) == h


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1),
       st.lists(st.integers(min_value=0, max_value=63), min_size=0,
                max_size=3, unique=True))
def test_manku_pigeonhole_guarantee(h1, flip_bits):
    """Any pair at Hamming distance <= 3 shares at least one 3-of-6 block
    combination exactly — the property that makes simhash_candidates
    EXACT, for every possible bit pattern."""
    h2 = h1
    for b in flip_bits:
        h2 ^= 1 << b
    a1 = np.array([h1], dtype=np.uint64)
    a2 = np.array([h2], dtype=np.uint64)
    blocks1 = [int(_simhash_block(a1, b)[0]) for b in range(6)]
    blocks2 = [int(_simhash_block(a2, b)[0]) for b in range(6)]
    assert any(all(blocks1[x] == blocks2[x] for x in combo)
               for combo in _SIM_COMBOS)


@settings(max_examples=50, deadline=None)
@given(st.lists(TEXT, max_size=8))
def test_text_hashes_deterministic_and_distinct(texts):
    h1 = text_hashes(texts)
    h2 = text_hashes(texts)
    assert h1 == h2
    # identical texts hash identically; the map is a pure function
    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            if a == b:
                assert h1[i] == h1[j]
