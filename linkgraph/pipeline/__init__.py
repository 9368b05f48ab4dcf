"""Training-data pipeline operators over document/embedding tables.

Beyond the reference's graph surface: dedup (exact, MinHash-LSH, SimHash,
token Jaccard), ANN similarity search, text analysis (language-ID heuristic,
quality scores, token counting, fingerprinting), multimodal plumbing.
All hot paths are built-in Spark SQL functions or Arrow-vectorized pandas
UDFs — no per-row Python.
"""
