"""Spark-first analytics operators over the test tables.

Two groups:
- relational: the reference's metadata/"query" surface (projection,
  stats, filters, counts — fastparquet/api.py §2.4) re-expressed as
  Catalyst-optimized DataFrame queries, plus codec-analog queries that
  express our encoder's statistics (dictionary codes, run lengths,
  deltas, cardinality) in SQL so DuckDB can oracle-check them;
- training-data pipeline: dedup (exact/MinHash-LSH/SimHash/Jaccard),
  similarity search (cosine top-k, LSH buckets, IVF), text analysis
  (langid, quality, tokens, fingerprints), multimodal binary plumbing.

Every operator is a function (spark, sf_dir) -> DataFrame registered in
``registry.QUERIES`` together with its DuckDB oracle SQL.
"""
