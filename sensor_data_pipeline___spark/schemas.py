"""Declared schemas for the medallion tables (SURVEY.md §1).

Reference DDL / dbt models:
- bronze.raw_readings  — scripts/init_db.sql:22-26
- silver.stg_readings  — dbt/models/staging/stg_readings.sql:102-109
- gold.mart_daily_power — dbt/models/marts/mart_daily_power.sql:71-87
"""

from __future__ import annotations

from pyspark.sql import types as T

BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("raw_line", T.StringType(), False),
        T.StructField("ingested_at", T.TimestampType(), False),
    ]
)

SILVER_SCHEMA = T.StructType(
    [
        T.StructField("raw_id", T.LongType(), False),
        T.StructField("reading_time", T.TimestampType(), False),
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("metric_value", T.DoubleType(), False),
        T.StructField("reading_date", T.DateType(), False),
        T.StructField("processed_at", T.TimestampType(), False),
    ]
)

GOLD_SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("metric_value", T.DoubleType(), False),
        T.StructField("reading_date", T.DateType(), False),
        T.StructField("reading_time", T.TimestampType(), False),
        T.StructField("calculated_at", T.TimestampType(), False),
    ]
)

# Wire output format of GET /data (reference: src/api/routes/data.py:22-26).
READING_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("time", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)
