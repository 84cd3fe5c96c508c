"""Training-data pipeline operators over document/embedding tables.

These are first-class engine components alongside the crawl loop: the tables
a crawl produces (interleaved text/media documents, BASELINE.json:15) are the
tables a large-scale training-data pipeline consumes. Modules:

- text: tokenization, quality scoring, language ID, fingerprinting
- dedup: exact, MinHash+LSH, SimHash, n-gram Jaccard
- similarity: brute-force and IVF cosine top-k over embeddings
- multimodal: binary media columns + decode/feature plumbing (decode stubbed)
"""
