"""spark-graft: a PySpark-native warehouse-migration / analytics engine.

Re-expresses the capabilities of ``justinarndt/data-warehouse-migration``
(an ADF + T-SQL medallion warehouse — see SURVEY.md) as idiomatic Spark
DataFrame/SQL constructs, plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, event sessionization) designed for
100 TB scale.

Layout:
- ``session``      SparkSession factory (UTC, AQE, tuned shuffle)
- ``functions``    expression libraries (JDE codecs, calendar, text, vectors)
- ``operators``    composite DataFrame operators (SCD2, PIT join, dedup, ...)
- ``sources``      metadata-driven medallion ingestion (readers/writers)
- ``plans``        orchestration (stage sequencing, retry)
- ``streaming``    Structured Streaming variants of the event operators
"""

from data_warehouse_migration_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
