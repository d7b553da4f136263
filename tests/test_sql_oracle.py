"""SQL↔Python equivalence for the minhash oracle builders.

The natural-corpus dedup oracles (`minhash_dedup_docs`,
`jaccard_verified_dups` in __ray_entry__) are only as good as the SQL
twins of the hashing primitives — pin each step against
medcat_ray.ops.hashing on adversarial inputs (unicode, wraparound-heavy
constants, duplicate texts) without needing Ray.
"""

import duckdb
import numpy as np
import pytest

from medcat_ray.ops.hashing import (MERSENNE_PRIME, _mix64, band_keys,
                                    minhash_params, minhash_signature,
                                    shingle_hashes)
from medcat_ray.ops.sql_oracle import (jaccard_verified_dups_oracle_sql,
                                       minhash_clusters_oracle_sql,
                                       mix64_sql, shingle_cte_sql)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",   # exact dup
    "the quick brown fox jumps over the lazy dog!",  # near dup
    "naïve café über — unicode ¢ödepoints beyond ascii",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",                 # degenerate shingles
    "completely different content with no overlap at all whatsoever",
]


def expected_clusters(texts, num_perm=16, bands=4, shingle_k=5):
    """Reference clustering from the Python primitives: signatures →
    band keys → bucket star edges (min-id rep) → component closure →
    {doc_id: component min id} for docs in non-singleton components.
    The single source of truth the SQL oracle tests compare against."""
    rows = num_perm // bands
    a, b = minhash_params(num_perm, seed=1)
    sigs = np.stack([minhash_signature(shingle_hashes(t, shingle_k), a, b)
                     for t in texts])
    keys = np.stack([band_keys(sigs, bd * rows, (bd + 1) * rows)
                     for bd in range(bands)], axis=1)  # (n_docs, bands)
    buckets = {}
    for i in range(len(texts)):
        for bd in range(bands):
            buckets.setdefault((bd, int(keys[i, bd])), []).append(i)
    adj = {i: {i} for i in range(len(texts))}
    for members in buckets.values():
        if len(members) > 1:
            rep = min(members)
            for m in members:
                adj[m].add(rep)
                adj[rep].add(m)
    expected = {}
    for i in range(len(texts)):
        seen, stack = set(), [i]
        while stack:
            x = stack.pop()
            if x not in seen:
                seen.add(x)
                stack.extend(adj[x] - seen)
        if len(seen) > 1:
            expected[i] = min(seen)
    return expected


def docs_table(texts):
    """Fresh DuckDB connection with a ``docs(doc_id, text)`` table."""
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO docs VALUES (?, ?)", [i, t])
    return con


def test_mix64_sql_matches_python():
    vals = np.array([0, 1, 2**63, 2**64 - 1, 123456789, 2**61 - 1],
                    dtype=np.uint64)
    con = duckdb.connect()
    for v in vals:
        got = con.execute(
            f"SELECT {mix64_sql(f'{int(v)}::HUGEINT')}").fetchone()[0]
        assert int(got) == int(_mix64(np.array([v], dtype=np.uint64))[0])


def test_shingle_cte_matches_python():
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(TEXTS):
        con.execute("INSERT INTO docs VALUES (?, ?)", [i, t])
    sql = ("WITH " + shingle_cte_sql("docs", "doc_id", "text", 5) +
           " SELECT doc_id, sh FROM sh ORDER BY doc_id, sh")
    rows = con.execute(sql).fetchall()
    got = {}
    for doc_id, sh in rows:
        got.setdefault(doc_id, []).append(int(sh) % 2**64)
    for i, t in enumerate(TEXTS):
        exp = sorted(int(x) for x in shingle_hashes(t, 5))
        assert sorted(got[i]) == exp, f"doc {i}"


def test_full_cluster_oracle_matches_python_pipeline():
    """End-to-end: the SQL cluster oracle equals a hand-rolled Python
    LSH clustering (signature → band keys → bucket star edges →
    union-find) over the same texts."""
    expected = expected_clusters(TEXTS)
    con = docs_table(TEXTS)
    sql = minhash_clusters_oracle_sql(num_perm=16, bands=4, table="docs")
    got = dict(con.execute(sql).fetchall())
    assert got == expected
    # sanity: the dup/near-dup trio must actually cluster
    assert expected.get(0) == 0 and expected.get(1) == 0


def test_poly_hashes_matches_scalar_shingle_path():
    """poly_hashes(whole string) must equal shingle_hashes' short-text
    path (poly over all codepoints + mix64) — the two share constants."""
    from medcat_ray.ops.hashing import poly_hashes
    for s in ["a", "hi", "naïve", "tok42", "✓"]:
        assert int(poly_hashes([s])[0]) == int(shingle_hashes(s, k=99)[0])
    multi = poly_hashes(["alpha", "z", "beta"])
    assert int(multi[1]) == int(poly_hashes(["z"])[0])


def test_simhash_oracle_matches_python():
    from medcat_ray.ops.hashing import poly_hashes, simhash64
    from medcat_ray.ops.sql_oracle import simhash_candidates_oracle_sql
    # the empty/whitespace docs must pair at hamming 0 (simhash 0), and
    # Unicode whitespace (NBSP, ideographic space) must tokenize like
    # Python str.split() — the same token set via NBSP vs ASCII space
    # must land on identical simhashes
    texts = TEXTS + ["one shared token here", "one shared token there",
                     "", "   \t ", " 　",
                     "nbsp separated tokens here",
                     "nbsp separated tokens　here"]
    con = docs_table(texts)
    got = {(a, b): h for a, b, h in con.execute(
        simhash_candidates_oracle_sql(table="docs")).fetchall()}
    # brute-force expected pairs from the Python primitives
    sims = [simhash64(poly_hashes(sorted(set(t.lower().split()))))
            for t in texts]
    exp = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            ham = bin(sims[i] ^ sims[j]).count("1")
            if ham <= 3:
                exp[(i, j)] = ham
    assert got == exp
    assert (0, 1) in exp and exp[(0, 1)] == 0   # exact dup pair present


def test_langid_oracle_matches_python_detect():
    from medcat_ray.ops.sql_oracle import langid_oracle_sql
    from medcat_ray.ops.textstats import LangIdStage
    texts = [
        "the cat sat on the mat and it was warm for the season",
        "der hund ist nicht mit der katze auf den berg gegangen",
        "le chat est dans la maison pour que les souris restent",
        "el perro es una mascota que vive con las personas",
        "这是一个中文文本的例子，包含很多汉字字符来触发中日韩检测",
        "",                       # empty → und
        "zzz qqq xxx",            # no markers → und (floor)
        "the der le el",          # tie-ish: all langs score
        "naïve café does the thing with the stuff and the other thing",
        "the\xa0cat\xa0sat on the　mat and it was warm",  # unicode WS
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO docs VALUES (?, ?)", [i, t])
    got = dict(con.execute(langid_oracle_sql(table="docs")).fetchall())
    st = LangIdStage()
    exp = {i: st.detect(t) for i, t in enumerate(texts)}
    assert got == exp
    assert exp[0] == "en" and exp[1] == "de" and exp[4] == "zh"
    assert exp[5] == "und"


def test_cluster_oracle_short_and_empty_texts():
    """The SQL oracle must reproduce Python's short-text (<k chars) and
    empty-text (all-MAX signature) paths: two empty docs always cluster,
    identical 2-char docs always cluster."""
    texts = ["", "", "hi", "hi", "abc", "a completely normal sentence with "
             "plenty of shingles inside it", ""]
    expected = expected_clusters(texts)
    con = docs_table(texts)
    con.execute("INSERT INTO docs VALUES (99, NULL)")   # NULL ≡ empty
    got = dict(con.execute(minhash_clusters_oracle_sql(
        num_perm=16, bands=4, table="docs")).fetchall())
    # NULL-text doc 99 joins the empty cluster {0, 1, 6}
    expected_with_null = dict(expected)
    expected_with_null[99] = expected.get(0, 0)
    assert got == expected_with_null
    assert expected.get(0) == 0 and expected.get(1) == 0  # empties cluster
    assert expected.get(2) == 2 and expected.get(3) == 2  # short dups too


def test_cluster_oracle_property_random_texts():
    """Property: over seeded random corpora (with planted dup pairs and
    unicode noise), the SQL cluster oracle equals the Python primitives'
    clustering — same construction as the hand-rolled test above but over
    many corpora."""
    import numpy as np
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "naïve", "über", "tok",
             "data", "graph", "medical", "entity", "çöğüş"]
    for trial in range(5):
        n = 12
        texts = []
        for i in range(n):
            k = rng.integers(8, 16)
            texts.append(" ".join(rng.choice(words, size=k)))
        # plant one exact-dup pair and one near-dup pair
        texts[1] = texts[0]
        texts[3] = texts[2] + " extra"
        expected = expected_clusters(texts)
        con = docs_table(texts)
        got = dict(con.execute(minhash_clusters_oracle_sql(
            num_perm=16, bands=4, table="docs")).fetchall())
        assert got == expected, f"trial {trial}"
        assert expected.get(0) == 0 and expected.get(1) == 0


def test_jaccard_dups_oracle_runs_and_scores_dup_pair():
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(TEXTS):
        con.execute("INSERT INTO docs VALUES (?, ?)", [i, t])
    sql = jaccard_verified_dups_oracle_sql(table="docs")
    rows = con.execute(sql).fetchall()
    scores = {(ia, ib): j for ia, ib, j in rows}
    assert scores[(0, 1)] == pytest.approx(1.0)       # exact dup
    assert scores[(0, 2)] > 0.9                        # near dup
    assert all(j >= 0.5 for j in scores.values())


def test_kmeans_sql_empty_cluster_backfills_previous_round(ray_session):
    """A cluster that empties AFTER round 1 must be backfilled from the
    PREVIOUS round's centroid (the engine keeps C_new = C.copy()), not
    the initial c0 — seed 1447 is a searched fixture where the two
    diverge at n_iter=4 (latent for the n_iter<=2 driver queries)."""
    import ray.data as rd
    from medcat_ray.ops.kmeans import kmeans_clusters
    from medcat_ray.ops.sql_oracle import spherical_kmeans_assign_sql
    rng = np.random.default_rng(1447)
    n, d, k, it = 14, 3, 4, 4
    vecs = rng.normal(size=(n, d))
    ds = rd.from_items([{"vec_id": i, "embedding": vecs[i].tolist()}
                        for i in range(n)]).repartition(3)
    got = kmeans_clusters(ds, k, n_iter=it).to_pandas() \
        .sort_values("vec_id")["cluster"].to_numpy()

    con = duckdb.connect()
    con.execute("CREATE TABLE emb (id BIGINT, v DOUBLE[])")
    for i in range(n):
        con.execute("INSERT INTO emb VALUES (?, ?)",
                    [i, vecs[i].tolist()])
    sql = "WITH " + spherical_kmeans_assign_sql(
        "SELECT id, v FROM emb", k=k, dim=d, n_iter=it) + \
        "\nSELECT id, cluster FROM afin ORDER BY id"
    oracle = np.array([r[1] for r in con.execute(sql).fetchall()])
    assert (got == oracle).all()
