"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference sensor-data pipeline
(sinarshmar/sensor_data_pipeline__, surveyed in SURVEY.md).

The engine is Spark-first: logical plans are declared via the DataFrame /
Spark SQL API and Catalyst/Tungsten pick the physical strategy. The
reference's Flask + Postgres + dbt + Airflow medallion ETL is re-expressed
as:

- ``sources``   : ingest gate (all-or-nothing plaintext batches), bronze
                  append sink, parquet table readers.
- ``operators`` : bronze→silver typed parse, silver→gold daily power
                  aggregate, serving query, incremental merge emulation,
                  dedup / similarity / text-analysis / multimodal ops for
                  large-scale training-data pipelines.
- ``functions`` : column-expression builders (line parsing, datetime
                  parse/format, data-quality assertions).
- ``streaming`` : Structured Streaming front-end (file source +
                  foreachBatch, availableNow trigger).
- ``plans``     : plan-inspection helpers (pushdown/broadcast asserts).
"""

__version__ = "0.1.0"
