"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo
``sasank484/Optimized-Climate-Data-Integration-with-Real-Time-LLM-Querying``.

The reference is four natural-language -> SQL-over-SQLite -> LLM-answer
pipelines (NOAA billion-dollar disasters, FEMA/HUD assistance, ERA5
monthly means, EDGAR GHG emissions).  This package re-expresses every
capability Spark-first:

- ``session``   — tuned SparkSession factory (AQE, arrow, UTC).
- ``catalog``   — schema registry + parquet table loading/views.
- ``queries``   — the operator inventory from SURVEY.md §2, each a
  named DataFrame builder with a DuckDB oracle SQL twin.
- ``operators`` — LLM-training-pipeline operators: dedup (exact,
  minhash-LSH, simhash, n-gram jaccard), similarity search, text
  analysis, multimodal column plumbing.
- ``plans``     — QuerySpec IR + planner (the reference's filters-dict
  IR formalized; SURVEY.md §3.3).
- ``nl``        — entity/metric/time resolvers + grounded LLM answerer
  (driver-side, mockable).
- ``streaming`` — Structured Streaming ingestion/rollup (tumbling
  monthly windows + watermark).
"""

__version__ = "0.1.0"
