"""Similarity (fuzzy-string) join (ops/simjoin.py)."""

import numpy as np
import pandas as pd

import ray.data as rd

from medcat_ray.ops.simjoin import similarity_join

LEFT = [
    (0, "acute myocardial infarction"),
    (1, "chronic kidney disease stage three"),
    (2, "type two diabetes mellitus"),
    (3, "essential arterial hypertension"),
    (4, "completely unrelated record"),
]
RIGHT = [
    (100, "acute myocardial infarction"),          # exact copy of 0
    (101, "acute myocardial infarctions"),         # near-copy of 0
    (102, "chronic kidney disease stage three"),   # exact copy of 1
    (103, "something else entirely different"),
    (104, "type two diabetes melitus"),            # near-copy of 2 (typo)
]


def _twin(threshold, k=5, num_perm=64, bands=16, seed=1):
    """Brute-force python twin mirroring the LSH candidate rule: a pair
    qualifies iff it shares >= 1 band key AND exact jaccard >= t."""
    from medcat_ray.ops.dedup import jaccard
    from medcat_ray.ops.hashing import (band_keys, minhash_params,
                                        minhash_signature, shingle_hashes)
    a, b = minhash_params(num_perm, seed)
    rows = num_perm // bands

    def keys(text):
        sig = minhash_signature(shingle_hashes(text, k), a, b) \
            .reshape(1, -1)
        return {(band, int(band_keys(sig, band * rows,
                                     (band + 1) * rows)[0]))
                for band in range(bands)}

    lk = {i: keys(t) for i, t in LEFT}
    rk = {i: keys(t) for i, t in RIGHT}
    out = []
    for i, tl in LEFT:
        for j, tr in RIGHT:
            if lk[i] & rk[j]:
                jac = jaccard(tl, tr, k)
                if jac >= threshold:
                    out.append((i, j, round(jac, 6)))
    return sorted(out)


def _run(threshold, **kw):
    left = rd.from_pandas(pd.DataFrame(LEFT, columns=["pid", "name"])) \
        .repartition(2)
    right = rd.from_pandas(pd.DataFrame(RIGHT, columns=["rid", "name"])) \
        .repartition(2)
    out = similarity_join(left, right, threshold=threshold,
                          left_id="pid", left_text="name",
                          right_id="rid", right_text="name",
                          num_partitions=2, **kw).to_pandas()
    return sorted((int(l), int(r), round(float(j), 6))
                  for l, r, j in zip(out["id_l"], out["id_r"],
                                     out["jaccard"]))


def test_similarity_join_matches_twin(ray_session):
    got = _run(0.5)
    want = _twin(0.5)
    assert got == want
    # the three planted matches are all found
    found = {(l, r) for l, r, _ in got}
    assert {(0, 100), (1, 102)} <= found
    exact = {(l, r): j for l, r, j in got}
    assert exact[(0, 100)] == 1.0 and exact[(1, 102)] == 1.0


def test_similarity_join_threshold_gates(ray_session):
    # at threshold 1.0 only the exact copies survive verification
    got = _run(1.0)
    assert {(l, r) for l, r, _ in got} == {(0, 100), (1, 102)}
    assert got == _twin(1.0)


def test_similarity_join_empty_side(ray_session):
    left = rd.from_pandas(pd.DataFrame(LEFT, columns=["pid", "name"]))
    right = rd.from_pandas(pd.DataFrame(
        {"rid": pd.array([], dtype="int64"),
         "name": pd.array([], dtype="string")}))
    out = similarity_join(left, right, threshold=0.5,
                          left_id="pid", left_text="name",
                          right_id="rid", right_text="name",
                          num_partitions=2)
    assert out.count() == 0


def test_similarity_join_max_bucket_guard(ray_session):
    """A boilerplate text repeated on both sides explodes one bucket;
    max_bucket drops it (bounding candidates) while distinct planted
    matches outside the hot bucket survive."""
    hot = [(1000 + i, "the exact same boilerplate header text")
           for i in range(30)]
    left = rd.from_pandas(pd.DataFrame(
        LEFT + hot, columns=["pid", "name"])).repartition(2)
    right = rd.from_pandas(pd.DataFrame(
        RIGHT + [(1000 + h, t) for h, t in hot],
        columns=["rid", "name"])).repartition(2)
    guarded = similarity_join(left, right, threshold=1.0,
                              left_id="pid", left_text="name",
                              right_id="rid", right_text="name",
                              num_partitions=2, max_bucket=10).to_pandas()
    pairs = {(int(l), int(r)) for l, r in zip(guarded["id_l"],
                                              guarded["id_r"])}
    # exact copies outside the hot bucket still found
    assert {(0, 100), (1, 102)} <= pairs
    # the 30x30 boilerplate block is gone
    assert not any(l >= 1000 or r >= 2000 for l, r in pairs)
    # unguarded: the block is present (sanity that the guard did it)
    full = similarity_join(left, right, threshold=1.0,
                           left_id="pid", left_text="name",
                           right_id="rid", right_text="name",
                           num_partitions=2).to_pandas()
    assert len(full) > len(guarded)


def test_hot_bucket_prune_exact_pair_no_collision(ray_session):
    """The hot-bucket prune must match the exact (band, band_hash) pair:
    a bucket in a DIFFERENT band whose hash collides under the old
    (band << 40) ^ hash fold must survive."""
    import pyarrow as pa
    import ray.data as rd
    from medcat_ray.ops.simjoin import _drop_hot_buckets
    H = 123456789
    collide = H ^ (1 << 40)      # (1, collide) folds to the same key as (0, H)
    rows = [{"id": i, "band": 0, "band_hash": H} for i in range(5)]
    rows.append({"id": 99, "band": 1, "band_hash": collide})
    lb = rd.from_arrow(pa.Table.from_pylist(rows))
    rb = rd.from_arrow(pa.Table.from_pylist(
        [{"id": 7, "band": 2, "band_hash": 42}]))
    pl, pr = _drop_hot_buckets(lb, rb, max_bucket=3)
    left = pl.to_pandas()
    # hot bucket (0, H) dropped; innocent (1, collide) kept
    assert left["id"].tolist() == [99]
    assert pr.count() == 1
