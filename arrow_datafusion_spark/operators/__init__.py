"""Large-scale data-pipeline operators built Spark-first:

- ``dedup``: exact, MinHash-LSH, SimHash deduplication (bucketed, never
  all-pairs)
- ``similarity``: brute-force and LSH-bucketed cosine top-k over embeddings
- ``text``: tokenization, language-ID, quality scoring, fingerprinting
- ``multimodal``: opaque-binary payload plumbing with Arrow-batched UDFs

These extend the reference's operator surface (it has no dedup/ANN/text
operators) per the project north star; each is exposed through
``__spark_entry__.queries()`` with a DuckDB oracle where SQL-expressible.
"""
