"""Beyond-reference LLM-data-pipeline operators.

Deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
search over embeddings (brute-force + LSH-bucketed), text analysis
(lang-id, quality, tokens, fingerprints), and multimodal binary-column
plumbing.  All deterministic (hashes derived from md5, no RNG) so every
op that is SQL-expressible carries a DuckDB oracle.
"""
