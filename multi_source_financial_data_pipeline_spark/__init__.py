"""multi_source_financial_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference pipeline (Myyscarlett/
Multi-Source-Financial-Data-Pipeline, a single-process pandas ETL tool):
multi-source OHLCV ingestion, per-ticker time-series features, data-quality
validation, cross-source price validation, macro-series handling, idempotent
persistence, and report/CSV sinks — plus large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Design rules (see SURVEY.md):
- DataFrame/SQL only in the data path; no RDDs, no driver-side row loops.
- Explicit StructType schemas everywhere (schemas.py), never inference.
- Operators are pure functions DataFrame -> DataFrame so each maps 1:1 to a
  driver `queries()` entry with a DuckDB `oracle_sql()` twin.
- An injectable run clock / request id keeps outputs deterministic.
"""

__version__ = "0.1.0"

from multi_source_financial_data_pipeline_spark.session import get_spark  # noqa: F401
