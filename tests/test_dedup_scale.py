"""Round-2 dedup correctness: chained-component clustering (driver
union-find vs distributed label propagation), Manku simhash exactness vs
brute force, planted embedding near-dups, empty-batch ANN guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# Connected components over star edges
# ---------------------------------------------------------------------------


def _edges_df(pairs):
    return pd.DataFrame({"doc_id": [a for a, _ in pairs],
                         "rep": [b for _, b in pairs]})


def test_unionfind_chained_component():
    """Buckets {1,3} and {2,3}: A~C, B~C, A!~B — the per-id-min fold got
    this wrong (doc 2 stayed its own rep); union-find must merge all."""
    from medcat_ray.ops.dedup import _unionfind_labels
    edges = _edges_df([(1, 1), (3, 1), (2, 2), (3, 2)])
    lbl = _unionfind_labels(edges, "doc_id")
    assert dict(zip(lbl["doc_id"], lbl["rep"])) == {1: 1, 2: 1, 3: 1}


def test_unionfind_long_chain_and_separate_component():
    from medcat_ray.ops.dedup import _unionfind_labels
    edges = _edges_df([(5, 4), (4, 3), (3, 2), (2, 1),
                       (10, 10), (11, 10)])
    lbl = _unionfind_labels(edges, "doc_id")
    got = dict(zip(lbl["doc_id"], lbl["rep"]))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_propagate_labels_matches_unionfind(ray_session):
    import ray.data as rd
    from medcat_ray.ops.dedup import _propagate_labels, _unionfind_labels
    pairs = [(1, 1), (3, 1), (2, 2), (3, 2),       # chained component
             (5, 4), (4, 3),                        # chains into the above
             (20, 20), (21, 20),                    # separate component
             (30, 30)]                              # self-edge only
    edges = rd.from_pandas(_edges_df(pairs))
    dist = _propagate_labels(edges, "doc_id").to_pandas()
    uf = _unionfind_labels(_edges_df(pairs), "doc_id")
    got = dict(zip(dist["doc_id"], dist["rep"]))
    want = dict(zip(uf["doc_id"], uf["rep"]))
    assert got == want
    assert got[5] == 1 and got[2] == 1 and got[21] == 20 and got[30] == 30


def test_minhash_clusters_driver_vs_distributed(ray_session):
    import ray.data as rd
    from medcat_ray.ops.dedup import minhash_dedup_clusters
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight looking for food") * 3
    docs = rd.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base.replace("green", "blue")},
        {"doc_id": 3, "text": "entirely different content " * 10},
        {"doc_id": 4, "text": base},
    ])
    drv = minhash_dedup_clusters(docs, method="driver").to_pandas()
    dst = minhash_dedup_clusters(docs, method="distributed").to_pandas()
    assert dict(zip(drv["doc_id"], drv["rep"])) == \
        dict(zip(dst["doc_id"], dst["rep"]))


# ---------------------------------------------------------------------------
# SimHash: Manku block scheme is exact for Hamming distance <= 3
# ---------------------------------------------------------------------------


def test_simhash_candidates_match_bruteforce(ray_session):
    import ray.data as rd
    from medcat_ray.ops.dedup import add_simhash, simhash_candidates
    from medcat_ray.ops.hashing import popcount64

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    for i in range(30):
        w = list(words)
        if i % 3 == 1:
            w[i % len(w)] = f"variant{i}"      # small token-set edit
        if i % 3 == 2:
            w = list(reversed(w))              # permutation → distance 0
        rows.append({"doc_id": i, "text": " ".join(w * 3)})
    ds = rd.from_items(rows)

    sims = add_simhash(ds).to_pandas().sort_values("doc_id")
    h = sims["simhash"].to_numpy().astype(np.uint64)
    ids = sims["doc_id"].to_numpy()
    iu, ju = np.triu_indices(len(ids), k=1)
    ham = popcount64(h[iu] ^ h[ju])
    keep = ham <= 3
    expected = {(int(ids[i]), int(ids[j]), int(d))
                for i, j, d in zip(iu[keep], ju[keep], ham[keep])}
    assert expected, "fixture must contain at least one close pair"

    got_df = simhash_candidates(ds).to_pandas()
    got = {(int(r.id_a), int(r.id_b), int(r.hamming))
           for r in got_df.itertuples()}
    assert got == expected


# ---------------------------------------------------------------------------
# Embedding near-dup: planted scaled copies must always be found
# ---------------------------------------------------------------------------


def test_embedding_near_dups_planted_scaled(ray_session):
    import ray.data as rd
    from medcat_ray.ops.dedup import embedding_near_dups

    rng = np.random.default_rng(7)
    n, dim, planted = 100, 32, 10
    V = rng.normal(size=(n, dim))
    rows = [{"vec_id": i, "embedding": V[i].tolist()} for i in range(n)]
    # scaled copies: identical direction → identical LSH signs → recall 1
    rows += [{"vec_id": 1000 + i, "embedding": (2.0 * V[i]).tolist()}
             for i in range(planted)]
    pairs = embedding_near_dups(rd.from_items(rows),
                                threshold=0.95).to_pandas()
    got = {(int(r.id_a), int(r.id_b)) for r in pairs.itertuples()}
    assert {(i, 1000 + i) for i in range(planted)} <= got

    # every reported pair is a true near-dup (precision check vs brute force)
    U = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = U @ U.T
    all_vecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in rows}
    for a, b in got:
        ua = all_vecs[a] / np.linalg.norm(all_vecs[a])
        ub = all_vecs[b] / np.linalg.norm(all_vecs[b])
        assert float(ua @ ub) >= 0.95 - 1e-9


def test_embedding_near_dups_oversize_bucket_split(ray_session):
    """A bucket larger than max_bucket still finds identical-direction
    pairs through the recursive sub-split."""
    import ray.data as rd
    from medcat_ray.ops.dedup import embedding_near_dups

    rng = np.random.default_rng(11)
    dim = 16
    base = rng.normal(size=dim)
    # 60 vectors tightly clustered around one direction → one big bucket
    rows = [{"vec_id": i,
             "embedding": (base + 0.01 * rng.normal(size=dim)).tolist()}
            for i in range(60)]
    pairs = embedding_near_dups(rd.from_items(rows), threshold=0.95,
                                max_bucket=8).to_pandas()
    assert len(pairs) > 0
    # all ids participate in at least one pair (cluster is one clique)
    seen = set(pairs["id_a"]) | set(pairs["id_b"])
    assert len(seen) >= 55


# ---------------------------------------------------------------------------
# ANN empty-batch guards
# ---------------------------------------------------------------------------


def test_bruteforce_topk_empty_batch(ray_session):
    import ray
    from medcat_ray.ops.similarity import BruteForceTopK
    q = np.ones((1, 4))
    ref = ray.put(([0], q))
    stage = BruteForceTopK(queries_ref=ref, k=5)
    empty = pa.table({"vec_id": pa.array([], type=pa.int64()),
                      "embedding": pa.array([], type=pa.list_(pa.float32()))})
    out = stage(empty)
    assert out.num_rows == 0
    assert out.column_names == ["query_id", "neighbor_id", "score"]


def test_knn_lsh_no_matching_bucket(ray_session):
    """All corpus rows pruned (no bucket collision) must not crash."""
    import ray.data as rd
    from medcat_ray.ops.similarity import knn_lsh
    rng = np.random.default_rng(3)
    rows = [{"vec_id": i, "embedding": rng.normal(size=8).tolist()}
            for i in range(20)]
    q = rng.normal(size=(1, 8))
    out = knn_lsh(rd.from_items(rows), [0], q, k=3, n_planes=8,
                  multiprobe=0, concurrency=1).to_pandas()
    assert len(out) <= 3  # may be empty; must not raise


# ---------------------------------------------------------------------------
# LangID accuracy self-check (frozen floor over a 20-sentence sample; the
# testdata lang column is label-only — its text is identical token soup for
# every language — so real-language sentences are the usable oracle)
# ---------------------------------------------------------------------------


def test_langid_accuracy_floor(ray_session):
    import ray.data as rd
    from medcat_ray.ops.textstats import add_langid
    samples = [
        ("en", "the weather was good and it is that time of the year for a walk in the park with his dog"),
        ("en", "it was the best of times and it was the worst of times for the people of the city"),
        ("en", "the committee is expected to vote on the proposal that was submitted in the spring"),
        ("en", "she said that the results of the study were consistent with the earlier findings"),
        ("fr", "le chat est dans la maison et les enfants jouent dans le jardin avec une balle"),
        ("fr", "la réunion est prévue pour le matin et les documents sont sur la table dans le bureau"),
        ("fr", "les élèves qui travaillent pour la science sont dans une salle avec des livres"),
        ("fr", "il est dans les montagnes pour une semaine et la neige est belle dans cette région"),
        ("es", "el perro está en la casa y los niños juegan en el parque con una pelota roja"),
        ("es", "la reunión es por la mañana y los documentos están en la mesa para el director"),
        ("es", "los estudiantes que trabajan para la ciencia están en una sala con los libros"),
        ("es", "es una ciudad grande con más parques que el resto del país pero con menos ruido"),
        ("de", "der Hund ist nicht mit der Katze auf dem Tisch und das ist ein gutes Zeichen"),
        ("de", "die Sitzung ist am Morgen und die Unterlagen sind auf dem Tisch von dem Chef"),
        ("de", "ein Student der mit der Wissenschaft arbeitet ist in einem Raum mit den Büchern"),
        ("de", "sich auf den Weg zu machen ist nicht leicht und die Reise ist von Anfang an lang"),
        ("zh", "这是一个中文文本的例子 其中包含很多汉字 用于测试语言识别的功能是否正确"),
        ("zh", "今天的天气非常好 我们决定去公园散步 然后在湖边吃午饭 下午回家休息"),
        ("zh", "机器学习是人工智能的一个分支 它通过数据训练模型 并用于各种预测任务"),
        ("zh", "这座城市有很多历史建筑 每年吸引大量游客 其中一些建筑已有数百年历史"),
    ]
    rows = [{"doc_id": i, "lang": l, "text": t}
            for i, (l, t) in enumerate(samples)]
    out = add_langid(rd.from_items(rows), concurrency=1).to_pandas()
    acc = (out["lang_pred"] == out["lang"]).mean()
    assert acc >= 0.95, f"langid accuracy {acc} below frozen floor"


def test_jaccard_verify_distributed_matches_broadcast(ray_session):
    import ray.data as rd
    from medcat_ray.ops.dedup import (verify_pairs_jaccard,
                                      verify_pairs_jaccard_distributed)
    a = "shared prefix of reasonable length for shingling purposes " * 4
    docs = rd.from_items([
        {"doc_id": 1, "text": a},
        {"doc_id": 2, "text": a + "tail"},
        {"doc_id": 3, "text": "unrelated words here entirely different"},
        {"doc_id": 4, "text": a + " extra shared suffix"},
    ])
    pairs = rd.from_items([{"id_a": 1, "id_b": 2}, {"id_a": 1, "id_b": 3},
                           {"id_a": 2, "id_b": 4}])
    bc = verify_pairs_jaccard(pairs, docs, threshold=0.8).to_pandas()
    dist = verify_pairs_jaccard_distributed(pairs, docs,
                                            threshold=0.8).to_pandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b", "jaccard"]]
                                .values.tolist()))
    assert key(bc) == key(dist)
    assert (1, 2) in {(r.id_a, r.id_b) for r in bc.itertuples()}


def test_jaccard_verify_auto_gate_both_branches(ray_session):
    """The auto gate routes small pair tables to broadcast and large ones
    (broadcast_limit=0 forces it) to the distributed twin — equal outputs."""
    import ray.data as rd
    from medcat_ray.ops.dedup import verify_pairs_jaccard
    a = "shared prefix of reasonable length for shingling purposes " * 4
    docs = rd.from_items([
        {"doc_id": 1, "text": a},
        {"doc_id": 2, "text": a + "tail"},
        {"doc_id": 3, "text": "unrelated words here entirely different"},
        {"doc_id": 4, "text": a + " extra shared suffix"},
    ])

    def mkpairs():
        return rd.from_items([{"id_a": 1, "id_b": 2}, {"id_a": 1, "id_b": 3},
                              {"id_a": 2, "id_b": 4}])

    bc = verify_pairs_jaccard(mkpairs(), docs, threshold=0.8).to_pandas()
    dist = verify_pairs_jaccard(mkpairs(), docs, threshold=0.8,
                                broadcast_limit=0).to_pandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b", "jaccard"]]
                                .values.tolist()))
    assert key(bc) == key(dist)
    assert (1, 2) in {(r.id_a, r.id_b) for r in bc.itertuples()}


def test_embedding_near_dups_join_path_matches_broadcast(ray_session):
    """broadcast_limit=0 forces the distributed hot-bucket join; outputs
    must equal the broadcast path on the planted-scaled-copy fixture."""
    import ray.data as rd
    from medcat_ray.ops.dedup import embedding_near_dups

    rng = np.random.default_rng(7)
    n, dim, planted = 60, 32, 8
    V = rng.normal(size=(n, dim))
    rows = [{"vec_id": i, "embedding": V[i].tolist()} for i in range(n)]
    rows += [{"vec_id": 1000 + i, "embedding": (2.0 * V[i]).tolist()}
             for i in range(planted)]

    bc = embedding_near_dups(rd.from_items(rows), threshold=0.95,
                             method="broadcast").to_pandas()
    jn = embedding_near_dups(rd.from_items(rows), threshold=0.95,
                             broadcast_limit=0).to_pandas()
    key = lambda df: sorted(map(tuple, df[["id_a", "id_b", "cosine"]]
                                .values.tolist()))
    assert key(bc) == key(jn)
    got = {(int(r.id_a), int(r.id_b)) for r in jn.itertuples()}
    assert {(i, 1000 + i) for i in range(planted)} <= got


# ---------------------------------------------------------------------------
# IVF write-time partitioned index: read-time pruning + recall
# ---------------------------------------------------------------------------


def test_ivf_indexed_prunes_at_read_and_recalls(ray_session, tmp_path):
    import os
    import ray.data as rd
    from medcat_ray.ops.similarity import (build_ivf_index, knn_bruteforce,
                                           knn_ivf_indexed)
    rng = np.random.default_rng(5)
    n, dim = 400, 16
    V = rng.normal(size=(n, dim))
    rows = [{"vec_id": i, "embedding": V[i].tolist()} for i in range(n)]
    idx_dir = str(tmp_path / "ivf")
    C = build_ivf_index(rd.from_items(rows), idx_dir, n_cells=8)
    assert C.shape == (8, dim)
    # storage layout: one directory per cell (the read-prune unit)
    cells = [d for d in os.listdir(idx_dir) if d.startswith("cell=")]
    assert 2 <= len(cells) <= 8

    Q = V[:3]
    exact = knn_bruteforce(rd.from_items(rows), [0, 1, 2], Q, k=5,
                           concurrency=1).to_pandas()
    approx = knn_ivf_indexed(idx_dir, [0, 1, 2], Q, k=5, nprobe=4,
                             concurrency=1).to_pandas()
    # each query's own vector must be found (it lands in a probed cell)
    for q in range(3):
        got = set(approx.loc[approx["query_id"] == q, "neighbor_id"])
        assert q in got
        want = set(exact.loc[exact["query_id"] == q, "neighbor_id"])
        # recall@5 with half the cells probed on random data
        assert len(got & want) >= 3


def test_propagate_labels_string_ids(ray_session):
    """The KG pipelines key on string url/doc ids; convergence detection
    must not require numeric labels (the old Sum(label) check crashed on
    strings and could overflow int64 at scale)."""
    import ray.data as rd
    from medcat_ray.ops.dedup import _propagate_labels, _unionfind_labels
    pairs = [("u1", "u1"), ("u3", "u1"), ("u2", "u2"), ("u3", "u2"),
             ("u9", "u8"), ("u8", "u7")]
    edges = rd.from_pandas(_edges_df(pairs))
    dist = _propagate_labels(edges, "doc_id").to_pandas()
    uf = _unionfind_labels(_edges_df(pairs), "doc_id")
    assert dict(zip(dist["doc_id"], dist["rep"])) == \
        dict(zip(uf["doc_id"], uf["rep"]))
    assert dict(zip(dist["doc_id"], dist["rep"]))["u9"] == "u7"


def test_minhash_dedup_antijoin_equals_broadcast(ray_session):
    """The distributed representative filter (left_anti join against the
    propagated label table, nothing driver-side) must keep exactly the
    rows the broadcast path keeps."""
    import ray.data as rd
    from medcat_ray.ops.dedup import minhash_dedup
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight looking for food") * 3
    rows = [{"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base.replace("green", "blue")},
            {"doc_id": 3, "text": "entirely different content " * 10},
            {"doc_id": 4, "text": base},
            {"doc_id": 5, "text": "another unique document here " * 8}]
    drv = minhash_dedup(rd.from_items(rows), method="driver").to_pandas()
    dst = minhash_dedup(rd.from_items(rows),
                        method="distributed").to_pandas()
    assert sorted(drv["doc_id"]) == sorted(dst["doc_id"])
    assert 1 in set(drv["doc_id"]) and 4 not in set(drv["doc_id"])


def test_exact_dedup_join_equals_broadcast(ray_session):
    import ray.data as rd
    from medcat_ray.ops.dedup import exact_dedup
    rows = [{"doc_id": i, "text": f"text {i % 4}"} for i in range(12)]
    b = exact_dedup(rd.from_items(rows), method="broadcast").to_pandas()
    j = exact_dedup(rd.from_items(rows), method="join").to_pandas()
    assert sorted(b["doc_id"]) == sorted(j["doc_id"]) == [0, 1, 2, 3]
    assert sorted(b.columns) == sorted(j.columns)


def test_exact_dedup_join_no_dups(ray_session):
    """Empty dup table through the join path (schema-less empty-block
    regression guard)."""
    import ray.data as rd
    from medcat_ray.ops.dedup import exact_dedup
    rows = [{"doc_id": i, "text": f"unique {i}"} for i in range(6)]
    j = exact_dedup(rd.from_items(rows), method="join").to_pandas()
    assert sorted(j["doc_id"]) == list(range(6))


def test_connected_components_general_graph(ray_session):
    """Public connected_components wrapper on a non-star graph (two
    chains + one triangle + an isolated edge) vs hand union-find."""
    import ray.data as rd
    from medcat_ray.ops.dedup import connected_components

    edges = [(1, 2), (2, 3), (3, 4),          # chain -> comp 1
             (10, 11), (11, 12),              # chain -> comp 10
             (20, 21), (21, 22), (22, 20),    # triangle -> comp 20
             (30, 31)]                        # edge -> comp 30
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges]) \
        .repartition(3)
    out = connected_components(ds, num_partitions=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
            20: 20, 21: 20, 22: 20, 30: 30, 31: 30}
    assert dict(zip(out["node"], out["component"])) == want
