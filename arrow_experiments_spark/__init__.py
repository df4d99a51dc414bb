"""PySpark-native analytics engine with the capabilities of
apache/arrow-experiments (reference surveyed in SURVEY.md).

Layout:
  session     — SparkSession factory (Arrow-enabled, UTC, AQE on)
  tables      — loaders for the driver testdata star schema
  registry    — query registry: name -> (PySpark builder, DuckDB oracle SQL)
  operators/  — the declared query surface (SURVEY.md §2.6 + north-star ops)
  functions/  — reusable column builders (decimal-exact aggregates, text, vectors)
  sources/    — Arrow IPC / HTTP ingest & egress, format conversions
  transport/  — HTTP server/client with content negotiation (SURVEY.md §2.3)
  streaming/  — Structured Streaming analogs (SURVEY.md §2.6 streaming row)
"""

from arrow_experiments_spark.registry import all_queries, get_query

__all__ = ["all_queries", "get_query"]
__version__ = "0.1.0"
