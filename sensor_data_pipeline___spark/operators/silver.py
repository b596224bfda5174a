"""Bronze → silver transform: parse, validate, type
(reference dbt/models/staging/stg_readings.sql — operators P1,P3-P6,
P13,P14,F1,F2 in SURVEY.md §2).

The whole transform is narrow (no shuffle): tokenize + regex filter +
casts, all column expressions inside one whole-stage-codegen span. At
100 TB this runs as a pure map over bronze file splits; the only wide
operation in the silver path is the optional write partitioned by
``reading_date``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensor_data_pipeline___spark.functions import parsing


def bronze_to_silver(bronze: DataFrame) -> DataFrame:
    """SQL-path parse of raw lines into typed readings.

    Matches stg_readings.sql:41-109: single-space SPLIT_PART tokenize,
    empty-line guard, regex validity conjunction (invalid rows silently
    dropped), epoch→UTC timestamp, date derivation, wall-clock
    ``processed_at``.
    """
    line = F.col("raw_line")
    ts_str, name, value_str = parsing.silver_tokens(line)
    parsed = (
        bronze.filter(parsing.nonempty_line(line))
        .select(
            F.col("id").alias("raw_id"),
            ts_str.alias("timestamp_str"),
            name.alias("metric_name"),
            value_str.alias("value_str"),
            F.col("ingested_at"),
        )
        .filter(
            parsing.silver_valid(
                F.col("timestamp_str"), F.col("metric_name"), F.col("value_str")
            )
        )
    )
    return parsed.select(
        "raw_id",
        F.timestamp_seconds(F.col("timestamp_str").cast("long")).alias("reading_time"),
        "metric_name",
        F.col("value_str").cast("double").alias("metric_value"),
        F.to_date(F.timestamp_seconds(F.col("timestamp_str").cast("long"))).alias(
            "reading_date"
        ),
        F.current_timestamp().alias("processed_at"),
    )
