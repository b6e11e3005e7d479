"""flink_application_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference Flink CDR stream-enrichment application
(AnasDol/flink-application), plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
such an engine needs at 100 TB scale.

Layout
------
- ``session``    SparkSession builder tuned for the bench/test harness.
- ``catalog``    Loaders for the driver's parquet tables → temp views.
- ``functions``  Scalar/text/vector column-expression helpers (JVM-side).
- ``operators``  DataFrame→DataFrame operators (enrichment joins, as-of,
                 dedup family, similarity search, text analysis).
- ``plans``      Named end-to-end queries with DuckDB oracle SQL twins,
                 collected in ``plans.registry``.
- ``sources``    Batch/streaming sources & sinks (parquet, CSV-with-null-
                 literal, rate, kafka/jdbc shaped, synthetic generator).
- ``streaming``  Structured Streaming runner + stateful dedup.
"""

__version__ = "0.1.0"
