"""LLM-training-data operators (north-star extension, SURVEY §7.2.6).

Beyond the reference's own surface: the operations a large-scale
training-data pipeline runs over a corpus — deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard), similarity search over
embeddings (brute-force + IVF-bucketed), text analysis (language ID,
quality scoring, token counting, fingerprinting), and multimodal
binary-column plumbing.

Design rules:
- Everything hot-path is pyspark.sql.functions built-ins (array
  lambdas, md5-derived portable hashes) — JVM-side, codegen-friendly;
  Python only appears in the multimodal mapInPandas stubs where an
  external decoder would run.
- Determinism is cross-engine: hashes derive from md5 hex (identical
  in Spark and DuckDB), fixed-point integer arithmetic replaces
  order-dependent float sums, so every operator that SQL can express
  has an exact DuckDB oracle twin.
"""
