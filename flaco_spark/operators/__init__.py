"""Operator implementations.

- :mod:`relational` — the SURVEY.md §2.2 relational inventory
  (scan/filter/project/join/agg/window/set-op/scalar/subquery), each
  Spark-first with a DuckDB oracle.
- :mod:`dedup` — exact + MinHash-LSH + SimHash + n-gram-Jaccard +
  embedding-cosine deduplication.
- :mod:`similarity` — brute-force and LSH-bucketed nearest-neighbor
  search over embedding columns.
- :mod:`text` — language-ID, quality scoring, token counting,
  fingerprinting.
- :mod:`multimodal` — binary-column plumbing with stubbed decoders.
"""
