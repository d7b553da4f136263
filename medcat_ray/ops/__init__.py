"""Large-scale training-data operations over document / embedding tables:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine, exact substring, Bloom incremental), text analysis (language-ID,
quality, token counts, fingerprints, repetition), similarity search
(brute-force / LSH / IVF / IVF-indexed / PQ ANN), sketches (HyperLogLog,
count-min), cleaning (C4 lines, span dedup, within-doc line dedup, PII
redaction, sentence segmentation), corpus export (sequence packing,
mixture / exact-N / per-group sampling, train-test split), temporal
joins (as-of, range), TF-IDF keywords, LM perplexity, decontamination,
URL canonicalization, grouped top-k and exact quantiles.

These are first-class engine components alongside the KG operators: each
is a Ray Data transform (map_batches + groupby) with deterministic
hashing (no salted ``hash()``) so results are identical across workers
and runs — and nearly all carry an exact DuckDB SQL twin (see
``ops/sql_oracle.py`` and the per-module ``*_oracle_sql`` builders).
"""
