"""DuckDB SQL builders that recompute the MinHash-LSH dedup pipeline.

These exist so the *natural-corpus* dedup queries can be oracle-checked:
every arithmetic step of ``ops/hashing.py`` (polynomial shingle hash →
splitmix64 finalizer → affine minhash permutations → polynomial band keys)
is re-expressed in portable integer SQL, and the LSH bucket → star-edge →
connected-component labeling is re-expressed as a recursive CTE.  DuckDB
then reproduces ``minhash_dedup_clusters`` output bit-for-bit — no planted
corpus needed.

Arithmetic notes
----------------
* Python does uint64 wraparound; SQL lacks it, so everything runs in
  HUGEINT (int128) with explicit ``% 2^64``.
* ``x >> s`` becomes ``x // 2^s`` (values are non-negative).
* 64×64→64-bit multiplication would overflow int128's ~38 significant
  digits via naive ``(a*b) % 2^64`` only when both operands approach
  2^64 — splitmix's odd 64-bit constants do — so :func:`_mulmod64`
  splits the constant into 32-bit halves (schoolbook low-word product).
* DuckDB's recursive CTE re-evaluates every upstream CTE it references on
  EACH fixpoint iteration; ``MATERIALIZED`` on the edge table is what
  keeps the oracle O(pipeline + closure) instead of O(pipeline × rounds).

Both the minhash and simhash oracles cover every input regime of their
Python twins: k-shingles / whole-text polynomial (0 < len < k) / the
empty-NULL constant all-MAX signature for minhash, and the tokenless
``simhash64([]) == 0`` branch for simhash.
"""

from __future__ import annotations

from medcat_ray.ops.hashing import (MERSENNE_PRIME, _POLY_BASE, _POLY_MIX,
                                    minhash_params)

_M64 = str(1 << 64)
_P = int(_POLY_BASE)

# Python str.split() splits on the Unicode isspace() set; RE2's '\s' is
# ASCII-only, so the oracles must spell the set out (derived, not
# hand-listed, so a Python upgrade that widens isspace() shows up here).
_WS_CLASS = "[" + "".join(f"\\x{{{c:X}}}" for c in range(0x11000)
                          if chr(c).isspace()) + "]"


def _mulmod64(expr: str, const: int) -> str:
    """SQL for ``(expr * const) % 2**64`` safe against int128 overflow:
    splits ``const`` into 32-bit halves so no intermediate product exceeds
    ~2^96."""
    c0, c1 = const % 2**32, const // 2**32
    return (f"((({expr}) % 4294967296) * {c0} + (((({expr}) // 4294967296)"
            f" * {c0} + (({expr}) % 4294967296) * {c1}) % 4294967296)"
            f" * 4294967296) % {_M64}")


def mix64_sql(expr: str) -> str:
    """SQL equivalent of hashing._mix64 (splitmix64 finalizer), fully
    inlined.  Every xor doubles and every mulmod quadruples the input
    text, so ``expr`` ends up duplicated ~72×; fine for scalar/test use —
    per-row pipelines should use :func:`mix64_staged` instead."""
    h = f"(({expr}) + {int(_POLY_MIX)}) % {_M64}"
    h = f"xor({h}, ({h}) // {1 << 30})"
    h = _mulmod64(h, 0xBF58476D1CE4E5B9)
    h = f"xor({h}, ({h}) // {1 << 27})"
    h = _mulmod64(h, 0x94D049BB133111EB)
    return f"xor({h}, ({h}) // {1 << 31})"


def mix64_staged(src: str, carry: str, expr: str, out: str) -> str:
    """splitmix64 finalizer as six nested SELECTs over subquery ``src``
    (a FROM-able fragment, e.g. ``pos`` or ``(SELECT ...)``): each step
    references its input COLUMN exactly once, so the emitted SQL stays
    linear in the number of steps instead of exponential (and DuckDB
    never re-evaluates a step, CSE or not).  ``carry`` = columns to pass
    through; ``expr`` = the HUGEINT input expression; ``out`` = the
    finalized column name."""
    q = f"SELECT {carry}, ({expr} + {int(_POLY_MIX)}) % {_M64} AS h FROM {src}"
    steps = [
        f"xor(h, h // {1 << 30})",
        _mulmod64("h", 0xBF58476D1CE4E5B9),
        f"xor(h, h // {1 << 27})",
        _mulmod64("h", 0x94D049BB133111EB),
    ]
    for s in steps:
        q = f"SELECT {carry}, {s} AS h FROM ({q})"
    return f"SELECT {carry}, xor(h, h // {1 << 31}) AS {out} FROM ({q})"


def shingle_cte_sql(table: str, id_col: str, text_col: str,
                    shingle_k: int) -> str:
    """CTEs ``pos`` / ``sh``: distinct k-char-shingle hashes per doc —
    SQL twin of hashing.shingle_hashes, including the short-text path
    (0 < len < k hashes ALL codepoints in one polynomial).  Empty/NULL
    texts produce no ``sh`` rows — the caller handles their constant
    all-MAX signature separately."""
    def cp(j: int) -> str:
        return f"CAST(unicode(substr({text_col}, x+{j}, 1)) AS HUGEINT)"

    poly = cp(0)
    for j in range(1, shingle_k):
        poly = f"(({poly}) * {_P} + {cp(j)}) % {_M64}"
    whole = (f"list_reduce([CAST(unicode(substr({text_col}, i, 1))"
             f" AS HUGEINT) for i in generate_series(1,"
             f" length({text_col}))], (acc, x) -> (acc * {_P} + x)"
             f" % {_M64})")
    shingled = mix64_staged("pos", id_col, poly, "sh")
    short = mix64_staged(
        f"(SELECT {id_col}, {text_col} FROM {table}"
        f" WHERE length({text_col}) BETWEEN 1 AND {shingle_k - 1})",
        id_col, whole, "sh")
    return f"""
pos AS (
  SELECT {id_col}, {text_col},
         unnest(generate_series(1, length({text_col})
                                   - {shingle_k - 1})) AS x
  FROM {table} WHERE length({text_col}) >= {shingle_k}
),
sh AS (
  SELECT DISTINCT {id_col}, sh FROM ({shingled})
  UNION ALL
  {short}
)"""


def minhash_clusters_oracle_sql(num_perm: int = 64, bands: int = 16,
                                shingle_k: int = 5, seed: int = 1,
                                table: str = "documents",
                                id_col: str = "doc_id",
                                text_col: str = "text") -> str:
    """Full SQL twin of ops.dedup.minhash_dedup_clusters (defaults match):
    shingles → 32-bit minhash signature → per-band polynomial keys →
    bucket star edges (min-id rep, non-singleton buckets) → transitive
    closure → (doc_id, rep = component min id) for clustered docs."""
    import numpy as np

    from medcat_ray.ops.hashing import band_keys

    rows = num_perm // bands
    a, b = minhash_params(num_perm, seed=seed)
    perm_vals = ", ".join(f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)"
                          for i in range(num_perm))
    # empty/NULL text → all-MAX_HASH signature (hashing.minhash_signature)
    # → every band folds the same constant key; precompute it here
    empty_sig = np.full((1, num_perm), (1 << 32) - 1, dtype=np.uint64)
    empty_key = int(band_keys(empty_sig, 0, rows)[0])
    # pivot each band's `rows` signature slots into columns, then fold the
    # polynomial band key over them (hashing.band_keys)
    slot = lambda j: f"MAX(CASE WHEN i % {rows} = {j} THEN m END)"
    poly = slot(0)
    for j in range(1, rows):
        poly = f"(({poly}) * {_P} + {slot(j)}) % {_M64}"
    return f"""
WITH RECURSIVE {shingle_cte_sql(table, id_col, text_col, shingle_k)},
perms(i, a, b) AS (VALUES {perm_vals}),
sig AS (
  SELECT sh.{id_col}, perms.i,
         MIN(((perms.a * sh.sh + perms.b) % {_M64})
             % {int(MERSENNE_PRIME)} % 4294967296) AS m
  FROM sh CROSS JOIN perms GROUP BY sh.{id_col}, perms.i
),
bandv AS (
  SELECT {id_col}, i // {rows} AS band, {poly} AS p
  FROM sig GROUP BY {id_col}, i // {rows}
),
bkey AS (
  {mix64_staged("bandv", f"{id_col}, band", "p", "key")}
  UNION ALL
  SELECT {id_col}, CAST(b AS BIGINT) AS band, {empty_key}::HUGEINT AS key
  FROM {table} CROSS JOIN generate_series(0, {bands - 1}) AS gs(b)
  WHERE {text_col} IS NULL OR length({text_col}) = 0
),
bucket_rep AS (
  SELECT band, key, MIN({id_col}) AS rep, COUNT(*) AS n
  FROM bkey GROUP BY band, key
),
edges AS (
  SELECT DISTINCT k.{id_col} AS node, r.rep
  FROM bkey k JOIN bucket_rep r ON k.band = r.band AND k.key = r.key
  WHERE r.n > 1
),
sym AS MATERIALIZED (
  SELECT node, rep AS nbr FROM edges
  UNION
  SELECT rep AS node, node AS nbr FROM edges
),
lab AS (
  SELECT node, nbr AS label FROM sym
  UNION
  SELECT s.node, l.label FROM sym s JOIN lab l ON l.node = s.nbr
)
SELECT node AS {id_col}, MIN(LEAST(label, node)) AS rep
FROM lab GROUP BY node"""


def simhash_candidates_oracle_sql(table: str = "documents",
                                  id_col: str = "doc_id",
                                  text_col: str = "text") -> str:
    """SQL twin of ops.dedup.simhash_candidates: lowercase-whitespace
    tokens → distinct poly+splitmix64 token hashes (hashing.poly_hashes)
    → 64-bit SimHash bit vote → Manku 3-of-6-block bucket keys →
    bucketed pair check, exact Hamming ≤ 3 via xor+bit_count.

    Emits (id_a, id_b, hamming) with id_a < id_b, deduplicated across the
    20 bucket tables.  Tokenless docs (empty/NULL/whitespace-only text)
    carry Python's ``simhash64([]) == 0`` via an explicit branch."""
    from medcat_ray.ops.dedup import (_SIM_COMBOS, _SIM_HAM_MAX, _SIM_OFFS,
                                      _SIM_WIDTHS)
    tok_poly = (f"list_reduce([CAST(unicode(substr(tok, i, 1)) AS HUGEINT)"
                f" for i in generate_series(1, length(tok))],"
                f" (acc, x) -> (acc * {_P} + x) % {_M64})")
    pow2 = ", ".join(f"({b}, {1 << b}::HUGEINT)" for b in range(64))
    combo_rows = []
    for ci, (i, j, k) in enumerate(_SIM_COMBOS):
        combo_rows.append(
            f"({ci}, {1 << _SIM_OFFS[i]}::HUGEINT, {1 << _SIM_WIDTHS[i]},"
            f" {1 << _SIM_OFFS[j]}::HUGEINT, {1 << _SIM_WIDTHS[j]},"
            f" {1 << _SIM_WIDTHS[i]},"
            f" {1 << _SIM_OFFS[k]}::HUGEINT, {1 << _SIM_WIDTHS[k]},"
            f" {1 << (_SIM_WIDTHS[i] + _SIM_WIDTHS[j])})")
    return f"""
WITH toks AS (
  SELECT DISTINCT {id_col}, tok FROM (
    SELECT {id_col},
           unnest(regexp_split_to_array(lower({text_col}),
                                        '{_WS_CLASS}+')) AS tok
    FROM {table}) WHERE tok <> ''
),
th AS (
  {mix64_staged("toks", id_col, tok_poly, "th")}
),
pow2(b, pw) AS (VALUES {pow2}),
votes AS (
  SELECT {id_col}, b, pw,
         SUM(CASE WHEN (th // pw) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN pow2 GROUP BY {id_col}, b, pw
),
sim AS (
  SELECT {id_col},
         SUM(CASE WHEN v > 0 THEN pw ELSE 0 END) AS sh
  FROM votes GROUP BY {id_col}
  UNION ALL
  -- tokenless docs: hashing.simhash64([]) == 0
  SELECT {id_col}, 0::HUGEINT AS sh FROM {table}
  WHERE length(regexp_replace(COALESCE({text_col}, ''),
                              '{_WS_CLASS}', '', 'g')) = 0
),
combos(ci, di, mi, dj, mj, fj, dk, mk, fk) AS (VALUES {", ".join(combo_rows)}),
keys AS (
  SELECT {id_col}, sh,
         (sh // di) % mi + ((sh // dj) % mj) * fj
         + ((sh // dk) % mk) * fk + ci * {1 << 36}::HUGEINT AS key
  FROM sim CROSS JOIN combos
)
SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b,
       bit_count(CAST(xor(a.sh, b.sh) AS UBIGINT)) AS hamming
FROM keys a JOIN keys b ON a.key = b.key AND a.{id_col} < b.{id_col}
WHERE bit_count(CAST(xor(a.sh, b.sh) AS UBIGINT)) <= {_SIM_HAM_MAX}"""


def langid_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text") -> str:
    """SQL twin of ops.textstats.LangIdStage.detect over natural text:
    CJK-codepoint-ratio branch, marker-word set intersection (×3) +
    non-overlapping marker-gram counts (×0.1), alphabetical-first argmax,
    'und' floor.  Marker constants are imported from the stage so the two
    can never drift."""
    from medcat_ray.ops.textstats import _LANG_MARKERS
    langs = sorted(k for k in _LANG_MARKERS if k != "zh")

    def score(lang: str) -> str:
        prof = _LANG_MARKERS[lang]
        words = ", ".join(f"'{w}'" for w in sorted(prof["words"]))
        # str.count(g) == chars removed by replace() / len(g): both count
        # non-overlapping left-to-right occurrences
        grams = " + ".join(
            f"(length(lw) - length(replace(lw, '{g}', ''))) / {len(g)}"
            for g in sorted(prof["grams"])) or "0"
        return (f"3 * len(list_intersect(words, [{words}]))"
                f" + 0.1 * ({grams})")

    score_cols = ",\n         ".join(f"{score(l)} AS s_{l}" for l in langs)
    m = "GREATEST(" + ", ".join(f"s_{l}" for l in langs) + ")"
    best = "CASE " + " ".join(f"WHEN s_{l} = {m} THEN '{l}'"
                              for l in langs) + " END"
    best_s = "CASE " + " ".join(f"WHEN s_{l} = {m} THEN s_{l}"
                                for l in langs) + " END"
    return f"""
WITH base AS (
  SELECT {id_col},
         substr(COALESCE({text_col}, ''), 1, 500) AS t500,
         lower(substr(COALESCE({text_col}, ''), 1, 2000)) AS lw
  FROM {table}
),
feat AS (
  SELECT {id_col}, lw,
         length(regexp_replace(t500, '[^一-鿿]', '', 'g')) AS n_cjk,
         GREATEST(length(t500), 1) AS cjk_den,
         list_distinct([w for w in regexp_split_to_array(lw, '{_WS_CLASS}+')
                        if w <> '']) AS words
  FROM base
),
scores AS (
  SELECT {id_col}, n_cjk, cjk_den, len(words) AS total,
         {score_cols}
  FROM feat
)
SELECT {id_col},
       CASE WHEN n_cjk * 1.0 / cjk_den > 0.2 THEN 'zh'
            WHEN ({best_s}) / GREATEST(total, 1) > 0.0001 THEN {best}
            ELSE 'und' END AS lang_pred
FROM scores"""


def jaccard_verified_dups_oracle_sql(threshold: float = 0.5,
                                     shingle_k: int = 5,
                                     table: str = "documents",
                                     id_col: str = "doc_id",
                                     text_col: str = "text") -> str:
    """SQL twin of the composed `jaccard_verified_dups` query: MinHash-LSH
    clusters → (rep, member) candidate pairs → exact k-char-shingle
    Jaccard (plain substrings; equals the engine's hashed shingles absent
    64-bit collisions) → keep pairs >= threshold."""
    clusters = minhash_clusters_oracle_sql(
        table=table, id_col=id_col, text_col=text_col, shingle_k=shingle_k)
    # reuse the cluster query verbatim as a sub-select (it owns the
    # WITH RECURSIVE prefix), then rescore pairs against the raw texts
    return f"""
WITH clusters AS MATERIALIZED ({clusters}),
shset AS (
  -- Python shingle_hashes: len >= k → k-shingles; 0 < len < k → ONE
  -- whole-text element (shorter than k, so it can never equal a real
  -- k-shingle); len 0 → empty set
  SELECT {id_col},
         CASE WHEN length(COALESCE({text_col}, '')) >= {shingle_k}
              THEN list_distinct([substr({text_col}, x, {shingle_k})
                                  for x in generate_series(
                                      1, length({text_col})
                                         - {shingle_k - 1})])
              WHEN length(COALESCE({text_col}, '')) >= 1
              THEN [{text_col}]
              ELSE [] END AS s
  FROM {table}
),
pairs AS (
  SELECT rep AS id_a, {id_col} AS id_b FROM clusters
  WHERE {id_col} <> rep
),
scored AS (
  SELECT p.id_a, p.id_b,
         CASE WHEN len(a.s) = 0 AND len(b.s) = 0 THEN 1.0
              ELSE len(list_intersect(a.s, b.s)) * 1.0 /
                   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         END AS jaccard
  FROM pairs p
  JOIN shset a ON a.{id_col} = p.id_a
  JOIN shset b ON b.{id_col} = p.id_b
)
SELECT id_a, id_b, ROUND(jaccard, 6) AS jaccard
FROM scored WHERE jaccard >= {threshold}"""


def _gram_cte(src: str, id_col: str, text_col: str, n: int,
              toks: str, grams: str, gh: str,
              distinct: bool = True) -> str:
    """CTE fragments ``toks``/``grams``/``gh``: word-n-gram hashes per
    doc — SQL twin of decontam.doc_gram_hashes (lowercase
    Unicode-whitespace tokens → space-joined n-gram strings, short docs
    contribute their whole token sequence → codepoint polynomial →
    splitmix64).  ``distinct=False`` keeps one row per gram OCCURRENCE
    (twin of doc_gram_hashes_all, the DSIR bag-of-grams stream)."""
    poly = (f"list_reduce([CAST(unicode(substr(g, i, 1)) AS HUGEINT)"
            f" for i in generate_series(1, length(g))],"
            f" (acc, x) -> (acc * {_P} + x) % {_M64})")
    return f"""
{toks} AS (
  SELECT {id_col} AS id,
         [w for w in regexp_split_to_array(lower({text_col}),
                                           '{_WS_CLASS}+') if w <> ''] AS ws
  FROM {src}
),
{grams} AS (
  SELECT id, array_to_string(ws[i:i+{n - 1}], ' ') AS g
  FROM (SELECT id, ws, unnest(range(1, len(ws) - {n - 2})) AS i
        FROM {toks} WHERE len(ws) >= {n})
  UNION ALL
  SELECT id, array_to_string(ws, ' ') AS g
  FROM {toks} WHERE len(ws) BETWEEN 1 AND {n - 1}
),
{gh} AS (
  SELECT {"DISTINCT " if distinct else ""}id, gh
  FROM ({mix64_staged(grams, "id", poly, "gh")})
)"""


def decontaminate_oracle_sql(corpus_sql: str, bench_sql: str,
                             n: int = 8) -> str:
    """SQL twin of decontam.flag_contamination over an arbitrary corpus
    and benchmark SELECT (both must yield (doc_id, text)): per training
    doc, the count of its distinct gram HASHES that appear among the
    benchmark's distinct gram hashes — identical arithmetic to the
    engine, so even hash collisions agree."""
    return f"""
WITH corpus AS ({corpus_sql}),
bench AS ({bench_sql}),
{_gram_cte("corpus", "doc_id", "text", n, "ctoks", "cgrams", "cgh")},
{_gram_cte("bench", "doc_id", "text", n, "btoks", "bgrams", "bgh")},
bset AS (SELECT DISTINCT gh FROM bgh),
overlap AS (
  SELECT c.id, COUNT(*) AS n_ov
  FROM cgh c JOIN bset b ON c.gh = b.gh GROUP BY c.id
)
SELECT t.doc_id,
       CAST(COALESCE(o.n_ov, 0) AS BIGINT) AS n_overlap_grams,
       COALESCE(o.n_ov, 0) > 0 AS contaminated
FROM corpus t LEFT JOIN overlap o ON t.doc_id = o.id"""


def spherical_kmeans_assign_sql(src_sql: str, k: int, dim: int,
                                n_iter: int = 2) -> str:
    """Unrolled SQL twin of ops.kmeans (init = k smallest-id unit vectors,
    ``n_iter - 1`` centroid updates, final assignment; ties toward the
    lowest cluster id).  ``src_sql`` must yield (id BIGINT, v DOUBLE[]).
    Cosine similarity is scale-invariant, so neither side needs to
    renormalize updated centroids.  Emits CTEs ending in ``afin(id,
    cluster)``; the caller appends its own SELECT."""
    parts = [f"e AS ({src_sql})",
             f"""c0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cluster, v AS cv
  FROM e ORDER BY id LIMIT {k})""",
             f"dims AS (SELECT UNNEST(generate_series(1, {dim})) AS dim)"]

    def assign(name: str, cents: str) -> str:
        return f"""{name} AS (
  SELECT id, cluster FROM (
    SELECT e.id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY e.id
             ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                      c.cluster ASC) AS rn
    FROM e CROSS JOIN {cents} c) WHERE rn = 1)"""

    cents = "c0"
    for i in range(1, n_iter):
        a, m, c, cf = f"a{i}", f"m{i}", f"c{i}", f"c{i}f"
        parts.append(assign(a, cents))
        parts.append(f"""{m} AS (
  SELECT {a}.cluster, d.dim,
         AVG(list_extract(e.v, d.dim)
             / sqrt(list_inner_product(e.v, e.v))) AS mu
  FROM {a} JOIN e USING (id) CROSS JOIN dims d
  GROUP BY {a}.cluster, d.dim)""")
        parts.append(f"""{c} AS (
  SELECT cluster, LIST(mu ORDER BY dim) AS cv FROM {m} GROUP BY cluster)""")
        # empty-cluster backfill joins the PREVIOUS round's centroids
        # (the engine keeps C_new = C.copy()), not the initial c0 —
        # matters from n_iter >= 3 when a cluster empties after round 1
        parts.append(f"""{cf} AS (
  SELECT p.cluster, COALESCE({c}.cv, p.cv) AS cv
  FROM {cents} p LEFT JOIN {c} USING (cluster))""")
        cents = cf
    parts.append(assign("afin", cents))
    return ",\n".join(parts)


def pagerank_sql(edges_sql: str, n_iter: int = 3, scale: int = 10 ** 9,
                 d_num: int = 85, d_den: int = 100) -> str:
    """Unrolled HUGEINT twin of ops.pagerank.pagerank_exact.
    ``edges_sql`` must yield (src, dst, w HUGEINT).  Emits CTEs ending in
    ``it{n_iter}(node, pr)``; the caller appends its own SELECT."""
    base = ((d_den - d_num) * scale) // d_den
    parts = [f"edges AS ({edges_sql})",
             "nodes AS (SELECT src AS node FROM edges "
             "UNION SELECT dst FROM edges)",
             "outd AS (SELECT src, SUM(w) AS od FROM edges GROUP BY src)",
             f"it0 AS (SELECT node, CAST({scale} AS HUGEINT) AS pr "
             "FROM nodes)"]
    for i in range(1, n_iter + 1):
        parts.append(f"""it{i} AS (
  SELECT n.node,
         CAST({base} AS HUGEINT) + COALESCE(SUM(
           e.w * (({d_num}::HUGEINT * p.pr) // ({d_den}::HUGEINT * o.od))
         ), 0) AS pr
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN it{i - 1} p ON p.node = e.src
  LEFT JOIN outd o ON o.src = e.src
  GROUP BY n.node)""")
    return ",\n".join(parts)


def bpe_sql(words_src: str, n_merges: int) -> str:
    """Unrolled DuckDB twin of ops.bpe.bpe_learn.  ``words_src`` must
    yield (word, freq BIGINT).  Emits CTEs ending in ``merges(merge_idx,
    s1, s2, cnt)`` and ``r{n_merges}(word, freq, ws)`` where ``ws`` is
    the U+001F-wrapped symbol string; the caller appends its SELECT.

    The merge application is one non-overlapping left-to-right
    ``replace`` over the wrapped string — exactly ops.bpe.merge_symbols
    (a freshly merged token can't left-match the same rule since rules
    have a non-empty right part, and delimiter wrapping means matches
    never share characters)."""
    u = "chr(31)"
    parts = [
        f"words AS ({words_src})",
        f"r0 AS (SELECT word, freq, {u} || array_to_string("
        f"regexp_extract_all(word, '.'), {u} || {u}) || {u} AS ws "
        "FROM words)"]
    for r in range(1, n_merges + 1):
        prev = f"r{r - 1}"
        parts.append(
            f"l{r} AS (SELECT freq, string_split(substr(ws, 2, "
            f"length(ws) - 2), {u} || {u}) AS l FROM {prev})")
        parts.append(
            f"x{r} AS (SELECT unnest(generate_series(1, len(l) - 1)) "
            f"AS i, l, freq FROM l{r} WHERE len(l) >= 2)")
        parts.append(
            f"p{r} AS (SELECT l[i] AS s1, l[i + 1] AS s2, "
            f"CAST(SUM(freq) AS BIGINT) AS cnt FROM x{r} GROUP BY 1, 2)")
        parts.append(
            f"m{r} AS (SELECT s1, s2, cnt FROM p{r} "
            "ORDER BY cnt DESC, s1, s2 LIMIT 1)")
        parts.append(
            f"r{r} AS (SELECT w.word, w.freq, replace(w.ws, "
            f"{u} || m.s1 || {u} || {u} || m.s2 || {u}, "
            f"{u} || m.s1 || m.s2 || {u}) AS ws FROM {prev} w, m{r} m)")
    union = " UNION ALL ".join(
        f"SELECT {r} AS merge_idx, s1, s2, cnt FROM m{r}"
        for r in range(1, n_merges + 1))
    parts.append(f"merges AS ({union})")
    return ",\n".join(parts)


def shingle_cte_sql_prefixed(table: str, id_col: str, text_col: str,
                             shingle_k: int, prefix: str) -> str:
    """Prefixed variant of :func:`shingle_cte_sql` (CTE names
    ``{prefix}pos`` / ``{prefix}sh``) so two tables' shingle pipelines
    can coexist in one statement (the similarity-join oracle)."""
    def cp(j: int) -> str:
        return f"CAST(unicode(substr({text_col}, x+{j}, 1)) AS HUGEINT)"

    poly = cp(0)
    for j in range(1, shingle_k):
        poly = f"(({poly}) * {_P} + {cp(j)}) % {_M64}"
    whole = (f"list_reduce([CAST(unicode(substr({text_col}, i, 1))"
             f" AS HUGEINT) for i in generate_series(1,"
             f" length({text_col}))], (acc, x) -> (acc * {_P} + x)"
             f" % {_M64})")
    shingled = mix64_staged(f"{prefix}pos", id_col, poly, "sh")
    short = mix64_staged(
        f"(SELECT {id_col}, {text_col} FROM {table}"
        f" WHERE length({text_col}) BETWEEN 1 AND {shingle_k - 1})",
        id_col, whole, "sh")
    return f"""
{prefix}pos AS (
  SELECT {id_col}, {text_col},
         unnest(generate_series(1, length({text_col})
                                   - {shingle_k - 1})) AS x
  FROM {table} WHERE length({text_col}) >= {shingle_k}
),
{prefix}sh AS (
  SELECT DISTINCT {id_col}, sh FROM ({shingled})
  UNION ALL
  {short}
)"""


def band_keys_ctes(table: str, id_col: str, text_col: str, prefix: str,
                   num_perm: int = 64, bands: int = 16,
                   shingle_k: int = 5) -> str:
    """CTE fragments ``{prefix}pos/sh/sig/bandv/bkey``: per-id MinHash
    band keys — the reusable core of :func:`minhash_clusters_oracle_sql`
    (same math: shingles → 32-bit signature → polynomial band key →
    splitmix64), prefixed so one statement can band-key several tables.
    References a shared ``perms(i, a, b)`` CTE the caller emits once
    (see :func:`perms_values_sql`)."""
    import numpy as np

    from medcat_ray.ops.hashing import band_keys

    rows = num_perm // bands
    empty_sig = np.full((1, num_perm), (1 << 32) - 1, dtype=np.uint64)
    empty_key = int(band_keys(empty_sig, 0, rows)[0])
    slot = lambda j: f"MAX(CASE WHEN i % {rows} = {j} THEN m END)"
    poly = slot(0)
    for j in range(1, rows):
        poly = f"(({poly}) * {_P} + {slot(j)}) % {_M64}"
    return f"""
{shingle_cte_sql_prefixed(table, id_col, text_col, shingle_k, prefix)},
{prefix}sig AS (
  SELECT {prefix}sh.{id_col}, perms.i,
         MIN(((perms.a * {prefix}sh.sh + perms.b) % {_M64})
             % {int(MERSENNE_PRIME)} % 4294967296) AS m
  FROM {prefix}sh CROSS JOIN perms GROUP BY {prefix}sh.{id_col}, perms.i
),
{prefix}bandv AS (
  SELECT {id_col}, i // {rows} AS band, {poly} AS p
  FROM {prefix}sig GROUP BY {id_col}, i // {rows}
),
{prefix}bkey AS (
  {mix64_staged(f"{prefix}bandv", f"{id_col}, band", "p", "key")}
  UNION ALL
  SELECT {id_col}, CAST(b AS BIGINT) AS band, {empty_key}::HUGEINT AS key
  FROM {table} CROSS JOIN generate_series(0, {bands - 1}) AS gs(b)
  WHERE {text_col} IS NULL OR length({text_col}) = 0
)"""


def perms_values_sql(num_perm: int = 64, seed: int = 1) -> str:
    """The shared ``perms(i, a, b)`` CTE body (affine minhash
    permutation parameters, twin of hashing.minhash_params)."""
    a, b = minhash_params(num_perm, seed=seed)
    return ", ".join(f"({i}, {int(a[i])}::HUGEINT, {int(b[i])}::HUGEINT)"
                     for i in range(num_perm))


def similarity_join_oracle_sql(left_sql: str, right_sql: str,
                               threshold: float = 0.5,
                               shingle_k: int = 5, num_perm: int = 64,
                               bands: int = 16, seed: int = 1) -> str:
    """SQL twin of ops.simjoin.similarity_join: both sides' MinHash band
    keys recomputed bit-for-bit, candidates = DISTINCT cross-table pairs
    sharing a (band, key) bucket, then exact k-char-shingle Jaccard at
    ``threshold`` (plain substrings; equals the engine's hashed shingles
    absent 64-bit collisions).  ``left_sql`` / ``right_sql`` must yield
    columns ``(id, text)``."""
    def shset(src: str) -> str:
        return f"""
  SELECT id,
         CASE WHEN length(COALESCE(text, '')) >= {shingle_k}
              THEN list_distinct([substr(text, x, {shingle_k})
                                  for x in generate_series(
                                      1, length(text)
                                         - {shingle_k - 1})])
              WHEN length(COALESCE(text, '')) >= 1
              THEN [text]
              ELSE [] END AS s
  FROM {src}"""

    return f"""
WITH l_src AS ({left_sql}),
r_src AS ({right_sql}),
perms(i, a, b) AS (VALUES {perms_values_sql(num_perm, seed)}),
{band_keys_ctes("l_src", "id", "text", "l_", num_perm, bands, shingle_k)},
{band_keys_ctes("r_src", "id", "text", "r_", num_perm, bands, shingle_k)},
cand AS (
  SELECT DISTINCT l.id AS id_l, r.id AS id_r
  FROM l_bkey l JOIN r_bkey r ON l.band = r.band AND l.key = r.key
),
l_shset AS ({shset("l_src")}),
r_shset AS ({shset("r_src")}),
scored AS (
  SELECT c.id_l, c.id_r,
         CASE WHEN len(a.s) = 0 AND len(b.s) = 0 THEN 1.0
              ELSE len(list_intersect(a.s, b.s)) * 1.0 /
                   (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         END AS jaccard
  FROM cand c
  JOIN l_shset a ON a.id = c.id_l
  JOIN r_shset b ON b.id = c.id_r
)
SELECT id_l, id_r, ROUND(jaccard, 6) AS jaccard
FROM scored WHERE jaccard >= {threshold}"""


def unigram_score_sql(words_src: str, k_seed: int = 128,
                      max_piece_len: int = 4,
                      max_word_len: int = 12) -> str:
    """SQL twin of ops.unigram.unigram_word_scores over the SEED
    vocabulary: substring-occurrence counts → deterministic top-k
    ``(cnt DESC, piece ASC)`` ∪ single characters → ln-ratio log-probs →
    Viterbi max log-prob per word as an UNROLLED dp-per-position chain
    (no recursion, no argmax-path extraction — the emitted value is a
    MAX, so ties never enter the comparison).  ``words_src`` must yield
    (word, freq); words longer than ``max_word_len`` are excluded on
    BOTH sides (bounds the unroll).  The float score column compares at
    rtol like doc_lm_ppl."""
    # every CTE below is MATERIALIZED: DuckDB re-inlines plain CTEs per
    # reference, and the unrolled dp chain references lp ~max_word_len ×
    # max_piece_len times — un-materialized, each one re-opens the source
    # parquet ("Too many open files") and re-runs the seed aggregation
    parts = [
        f"words AS MATERIALIZED ({words_src})",
        f"wl AS MATERIALIZED (SELECT word, freq FROM words"
        f" WHERE length(word) <= {max_word_len})",
        f"""sub_counts AS MATERIALIZED (
  SELECT substr(word, x, l) AS piece, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM (SELECT word, freq,
               unnest(generate_series(1, length(word))) AS x FROM words)
  CROSS JOIN generate_series(1, {max_piece_len}) AS g(l)
  WHERE x + l - 1 <= length(word)
  GROUP BY piece)""",
        f"""topk AS MATERIALIZED (SELECT piece, cnt FROM sub_counts
  ORDER BY cnt DESC, piece LIMIT {k_seed})""",
        """pieces AS MATERIALIZED (
  SELECT DISTINCT piece, cnt FROM (
    SELECT * FROM topk
    UNION ALL
    SELECT piece, cnt FROM sub_counts WHERE length(piece) = 1))""",
        """lp AS MATERIALIZED (
  SELECT piece, ln(cnt * 1.0 / (SELECT SUM(cnt) FROM pieces)) AS lp
  FROM pieces)""",
        "dp0 AS MATERIALIZED (SELECT word, freq, 0.0::DOUBLE AS s FROM wl)",
    ]
    for p in range(1, max_word_len + 1):
        branches = []
        for l in range(1, min(max_piece_len, p) + 1):
            branches.append(f"""
    SELECT d.word, d.freq, d.s + lp.lp AS s
    FROM dp{p - l} d JOIN lp
      ON length(d.word) >= {p}
     AND lp.piece = substr(d.word, {p - l + 1}, {l})""")
        parts.append(
            f"dp{p} AS MATERIALIZED (SELECT word, freq, MAX(s) AS s FROM ("
            + " UNION ALL ".join(branches)
            + ") q GROUP BY word, freq)")
    finals = " UNION ALL ".join(
        f"SELECT word, freq, s FROM dp{p} WHERE length(word) = {p}"
        for p in range(1, max_word_len + 1))
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT word, CAST(freq AS BIGINT) AS freq, s AS score"
              f" FROM ({finals}) r")
