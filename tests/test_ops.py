"""Training-data ops tests over the driver testdata tables
(documents / embeddings at sf0.001) and synthetic cases."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd
    return rd.read_parquet(f"{SF}/documents.parquet")


def test_exact_dedup_matches_pandas(ray_session, docs_ds):
    from medcat_ray.ops.dedup import exact_dedup
    import pyarrow.parquet as pq
    kept = exact_dedup(docs_ds).to_pandas()
    pdf = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    expected = pdf.loc[pdf.groupby("text")["doc_id"].idxmin()]
    assert sorted(kept["doc_id"]) == sorted(expected["doc_id"])


def test_minhash_finds_planted_near_dups(ray_session):
    import ray.data as rd
    from medcat_ray.ops.dedup import minhash_dedup_clusters, minhash_dedup
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest tonight looking for food") * 3
    near = base.replace("green", "blue")          # tiny edit → near-dup
    far = ("completely different content about machine learning pipelines "
           "and distributed execution engines with arrow batches") * 3
    docs = rd.from_items([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},
        {"doc_id": 3, "text": far},
        {"doc_id": 4, "text": base},              # exact dup of 1
    ])
    clusters = minhash_dedup_clusters(docs, num_perm=64, bands=16).to_pandas()
    rep = dict(zip(clusters["doc_id"], clusters["rep"]))
    assert rep.get(2) == 1 and rep.get(4) == 1
    assert rep.get(3, 3) == 3
    kept = minhash_dedup(docs, num_perm=64, bands=16).to_pandas()
    assert sorted(kept["doc_id"]) == [1, 3]


def test_simhash_candidates(ray_session):
    import ray.data as rd
    from medcat_ray.ops.dedup import simhash_candidates
    # SimHash over distinct-token sets is order-invariant: a permuted copy
    # has Hamming distance 0.  (A one-word edit on a SHORT doc flips many
    # bits — SimHash near-dup is a long-document technique.)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    a = " ".join(words * 5)
    b = " ".join(list(reversed(words)) * 5)
    c = "nothing shared here at all just other words entirely different"
    ds = rd.from_items([{"doc_id": 1, "text": a}, {"doc_id": 2, "text": b},
                        {"doc_id": 3, "text": c}])
    pairs = simhash_candidates(ds).to_pandas()
    assert {(r.id_a, r.id_b) for r in pairs.itertuples()} >= {(1, 2)}
    assert not any({r.id_a, r.id_b} == {1, 3} for r in pairs.itertuples())


def test_jaccard_verify(ray_session):
    import ray.data as rd
    from medcat_ray.ops.dedup import verify_pairs_jaccard, jaccard
    a = "shared prefix of reasonable length for shingling purposes " * 4
    b = a + "tail"
    assert jaccard(a, a) == 1.0
    docs = rd.from_items([{"doc_id": 1, "text": a}, {"doc_id": 2, "text": b},
                          {"doc_id": 3, "text": "unrelated words here"}])
    pairs = rd.from_items([{"id_a": 1, "id_b": 2}, {"id_a": 1, "id_b": 3}])
    ver = verify_pairs_jaccard(pairs, docs, threshold=0.8).to_pandas()
    assert list(zip(ver["id_a"], ver["id_b"])) == [(1, 2)]


def test_embedding_near_dups(ray_session):
    import ray.data as rd
    from medcat_ray.ops.dedup import embedding_near_dups
    rng = np.random.default_rng(0)
    v = rng.normal(size=16)
    rows = [{"vec_id": 1, "embedding": v.tolist()},
            {"vec_id": 2, "embedding": (v + 0.01 * rng.normal(size=16)).tolist()},
            {"vec_id": 3, "embedding": rng.normal(size=16).tolist()}]
    pairs = embedding_near_dups(rd.from_items(rows), threshold=0.95) \
        .to_pandas()
    assert {(r.id_a, r.id_b) for r in pairs.itertuples()} == {(1, 2)}


def test_token_counts_and_quality(ray_session, docs_ds):
    from medcat_ray.ops.textstats import add_token_counts, add_quality
    out = add_quality(add_token_counts(docs_ds)).to_pandas()
    assert (out["n_tokens_ws"] == out["text"].str.split().str.len()).all()
    assert (out["n_tokens_bpe"] >= out["n_tokens_ws"]).all()
    assert out["quality_score"].between(0, 1).all()
    assert (out["n_words"] == out["n_tokens_ws"]).all()


def test_langid_detects_english(ray_session):
    import ray.data as rd
    from medcat_ray.ops.textstats import add_langid
    rows = [
        {"doc_id": 1, "text": "the cat was on the mat and it is that simple for the dog"},
        {"doc_id": 2, "text": "der Hund ist nicht mit der Katze auf dem Tisch und das ist gut"},
        {"doc_id": 3, "text": "这是一个中文文本的例子 其中包含很多汉字 用于测试语言识别"},
        {"doc_id": 4, "text": ""},
    ]
    out = add_langid(rd.from_items(rows), concurrency=1).to_pandas() \
        .set_index("doc_id")["lang_pred"]
    assert out[1] == "en" and out[2] == "de" and out[3] == "zh"
    assert out[4] == "und"


def test_fingerprint_stable_under_whitespace(ray_session):
    import ray.data as rd
    from medcat_ray.ops.textstats import add_fingerprint
    rows = [{"doc_id": 1, "text": "a  b\tc"}, {"doc_id": 2, "text": "a b c"},
            {"doc_id": 3, "text": "a b d"}]
    out = add_fingerprint(rd.from_items(rows)).to_pandas() \
        .set_index("doc_id")["fingerprint"]
    assert out[1] == out[2] != out[3]


def test_knn_bruteforce_matches_numpy(ray_session):
    import ray.data as rd
    from medcat_ray.ops.similarity import knn_bruteforce
    import pyarrow.parquet as pq
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    V = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    q = V[0]
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = knn_bruteforce(ds, [0], q[None, :], k=10, concurrency=1).to_pandas()
    got = got.sort_values(["score", "neighbor_id"],
                          ascending=[False, True]).reset_index(drop=True)
    # numpy oracle
    U = V / np.linalg.norm(V, axis=1)[:, None]
    s = U @ (q / np.linalg.norm(q))
    order = sorted(range(len(s)), key=lambda i: (-round(s[i], 6), ids[i]))[:10]
    assert list(got["neighbor_id"]) == [ids[i] for i in order]
    np.testing.assert_allclose(got["score"], [round(s[i], 6) for i in order],
                               atol=1e-6)


def test_knn_lsh_recalls_top1(ray_session):
    import ray.data as rd
    from medcat_ray.ops.similarity import knn_lsh
    import pyarrow.parquet as pq
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    V = np.array(emb["embedding"].tolist(), dtype=np.float64)
    q = V[7]
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    got = knn_lsh(ds, [7], q[None, :], k=5, n_planes=6, concurrency=1) \
        .to_pandas()
    # the query vector itself must always be found (same bucket)
    assert 7 in set(got["neighbor_id"])
    assert got["score"].max() >= 0.999999


def test_multimodal_stub_stages(ray_session):
    import ray.data as rd
    from medcat_ray.ops.multimodal import decode_images, sample_audio_frames
    rows = [{"item_id": i, "data": bytes([i] * (10 + i))} for i in range(5)]
    imgs = decode_images(rd.from_items(rows), concurrency=1).to_pandas()
    assert "data" not in imgs.columns            # binary dropped early
    assert imgs["image_meta"].map(lambda m: m["decoder"]).eq("fake").all()
    assert imgs["features"].map(len).eq(8).all()
    # deterministic across runs
    imgs2 = decode_images(rd.from_items(rows), concurrency=1).to_pandas()
    assert imgs["features"].map(tuple).tolist() == \
        imgs2["features"].map(tuple).tolist()
    aud = sample_audio_frames(rd.from_items(rows), concurrency=1).to_pandas()
    assert aud["frame_energy"].map(len).eq(4).all()
    assert (aud["duration_sec"] > 0).all()


def test_knn_ivf_recall(ray_session):
    """IVF ANN: valid scores, deterministic, recall vs brute force ≥ 0.6
    at nprobe=4/16 cells on the fixture embeddings."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd
    from medcat_ray.ops.similarity import knn_bruteforce, knn_ivf
    path = "/root/testdata/sf0.001/embeddings.parquet"
    q = pq.read_table(path).to_pandas()
    Q = np.array(q["embedding"].head(4).tolist(), dtype=np.float64)
    qids = list(range(4))
    ds = rd.read_parquet(path)
    exact = knn_bruteforce(ds, qids, Q, k=10, concurrency=2).to_pandas()
    approx = knn_ivf(rd.read_parquet(path), qids, Q, k=10, n_cells=16,
                     nprobe=4, concurrency=2).to_pandas()
    approx2 = knn_ivf(rd.read_parquet(path), qids, Q, k=10, n_cells=16,
                      nprobe=4, concurrency=2).to_pandas()
    # deterministic across runs
    a = approx.sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    b = approx2.sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    assert a.equals(b)
    recalls = []
    for qid in qids:
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        ap = set(approx[approx["query_id"] == qid]["neighbor_id"])
        recalls.append(len(e & ap) / max(1, len(e)))
    assert sum(recalls) / len(recalls) >= 0.6
    # every approx hit must carry the exact cosine score
    merged = approx.merge(exact, on=["query_id", "neighbor_id"],
                          suffixes=("_a", "_e"))
    assert (abs(merged["score_a"] - merged["score_e"]) < 1e-6).all()


def test_repetition_signals_match_counter_brute_force(ray_session, docs_ds):
    """add_repetition's pooled-unique vectorization equals a per-doc
    Counter reference, including synthetic edge docs (empty, single
    token, all-identical tokens)."""
    from collections import Counter
    import ray.data as rd
    from medcat_ray.ops.textstats import add_repetition
    rows = [{"doc_id": 0, "text": "a b a b a b"},      # heavy 2-gram rep
            {"doc_id": 1, "text": "x"},                # no grams
            {"doc_id": 2, "text": ""},                 # empty
            {"doc_id": 3, "text": "w w w w w w w w"},  # all identical
            {"doc_id": 4, "text": "one two three four five"}]
    out = add_repetition(rd.from_items(rows)).to_pandas() \
        .set_index("doc_id")
    for r in rows:
        ws = [w for w in r["text"].split(" ") if w]
        g2, g3 = list(zip(ws, ws[1:])), list(zip(ws, ws[1:], ws[2:]))
        d2 = (len(g2) - len(set(g2))) / len(g2) if g2 else 0.0
        d3 = (len(g3) - len(set(g3))) / len(g3) if g3 else 0.0
        top = max((c * (len(a) + 1 + len(b))
                   for (a, b), c in Counter(g2).items()), default=0) \
            / max(1, len(r["text"]))
        got = out.loc[r["doc_id"]]
        assert got["dup_2gram_frac"] == pytest.approx(d2, abs=1e-6)
        assert got["dup_3gram_frac"] == pytest.approx(d3, abs=1e-6)
        assert got["top_2gram_char_frac"] == pytest.approx(top, abs=1e-6)
        assert bool(got["repetition_ok"]) == (top <= 0.20 and d3 <= 0.30)
    # and over the natural corpus: flag agrees with recomputation
    nat = add_repetition(docs_ds).to_pandas()
    assert len(nat) == docs_ds.count()
    assert (nat["repetition_ok"] == ((nat["top_2gram_char_frac"] <= 0.20)
            & (nat["dup_3gram_frac"] <= 0.30))).all()


def test_rounding_matches_sql_round_on_ties(ray_session):
    """Engine rounding must be half-away-from-zero (SQL ROUND), not
    numpy's half-to-even — this exact tie (0.0703125 = 9/128, binary-
    exact) is the CORRECTNESS_r03 doc_repetition hash failure: np.round
    gives 0.070312, DuckDB ROUND gives 0.070313."""
    import duckdb
    import ray.data as rd
    from medcat_ray.ops.numeric import round_half_away
    ties = [0.0703125, 0.5e-6, 1.5e-6, 2.5e-6, 0.1234565, -0.0703125]
    for v in ties:
        sql = duckdb.sql(
            f"SELECT ROUND(CAST({v!r} AS DOUBLE), 6) AS r").fetchone()[0]
        assert float(round_half_away(np.float64(v), 6)) == float(sql), v
    # and end-to-end through add_repetition: 129 tokens = 128 bigrams,
    # an 11-long "a" run gives exactly 9 repeated bigrams, the 118
    # unique tail tokens give none -> dup_2gram_frac == 9/128 =
    # 0.0703125 exactly (dyadic, binary-representable tie)
    from medcat_ray.ops.textstats import add_repetition
    body = " ".join(["a"] * 11 + [f"t{i}" for i in range(118)])
    out = add_repetition(rd.from_items([{"doc_id": 0, "text": body}])) \
        .to_pandas()
    frac = out["dup_2gram_frac"].iloc[0]
    sql = duckdb.sql(
        "SELECT ROUND(CAST(9.0/128 AS DOUBLE), 6) AS r").fetchone()[0]
    assert frac == float(sql) == 0.070313


def test_top_bigrams_matches_counter(ray_session, docs_ds):
    from collections import Counter
    import pyarrow.parquet as pq
    from medcat_ray.ops.textstats import top_bigrams
    got = top_bigrams(docs_ds, k=15).to_pandas()
    cc = Counter()
    for t in pq.read_table(f"{SF}/documents.parquet").to_pandas()["text"]:
        ws = [w for w in t.split(" ") if w]
        cc.update(zip(ws, ws[1:]))
    exp = sorted(cc.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [(r.w1, r.w2, r.pair_count) for r in got.itertuples()] \
        == [(a, b, c) for (a, b), c in exp]
