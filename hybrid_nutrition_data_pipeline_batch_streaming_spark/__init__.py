"""PySpark-native hybrid batch + streaming analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (jmdu99/Hybrid-Nutrition-Data-Pipeline-Batch-Streaming),
re-expressed idiomatically on Apache Spark:

- ``session``    — tuned SparkSession builder (AQE, UTC, Arrow).
- ``catalog``    — testdata table loading + view registration.
- ``operators``  — relational / dedup / similarity / text / multimodal ops.
- ``functions``  — scalar helpers, JSON flatten, deterministic enrichment.
- ``plans``      — the named query registry checked against the DuckDB oracle.
- ``streaming``  — Structured Streaming ingest / windows / stateful dedup.
- ``pipeline``   — the end-to-end batch ETL emulation of the reference job.
"""

__version__ = "0.1.0"
