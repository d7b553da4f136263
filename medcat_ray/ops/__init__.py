"""Large-scale training-data operations over document / embedding tables:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), text analysis (language-ID, quality, token counts, fingerprints)
and similarity search (brute-force + LSH-bucketed ANN).

These are first-class engine components alongside the KG operators: each is
a Ray Data transform (map_batches + groupby) with deterministic hashing
(no salted ``hash()``) so results are identical across workers and runs.
"""
