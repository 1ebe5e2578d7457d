"""trading212_etl_spark — a PySpark-native analytics engine.

A ground-up, Spark-first rebuild of the query and data-processing
capabilities of the reference ETL (oladimeji09/Trading212-ETL,
/root/reference/trading212.py), extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB scale.

Layout
------
- ``session``    SparkSession builder (AQE on, UTC, Arrow on)
- ``sources``    schema-pinned readers and partitioned Parquet writers
- ``functions``  scalar string/date canonicalization functions (F1-F14)
- ``operators``  relational, aggregate, window, dedup, similarity,
                 text-analysis and multimodal operators
- ``plans``      composed end-to-end pipelines (the flagship ETL chain)
- ``streaming``  Structured Streaming variants of the event operators
"""

__version__ = "0.1.0"
