"""PySpark-native analytics engine with the query/data-processing surface of
wallace57/bigdata-streaming-absa-vehicle (reference: streaming ABSA + vehicle-count
pipelines on Kafka -> Spark -> Postgres -> dashboards), rebuilt Spark-first.

Layout:
  session      - SparkSession factory tuned for local test + cluster scale
  schemas      - every declared envelope/table schema in one place
  tables       - testdata parquet loaders + temp-view registration
  functions    - deterministic-aggregation & expression helpers
  queries      - the declared query surface (SURVEY.md section 2) as a registry;
                 each entry = PySpark impl + DuckDB oracle SQL
  operators    - custom operators (dedup, similarity, inference, multimodal)
  sources      - batch/stream source+sink builders (kafka, files, jdbc)
  streaming    - structured-streaming pipelines, event-time ops, idempotent sinks
"""

__version__ = "0.1.0"
