"""Silver → gold transform: daily power mart
(reference dbt/models/marts/mart_daily_power.sql — operators F3, A1, P9,
F5, P7, P8, P6 in SURVEY.md §2).

``Power(day) = AVG(Voltage) × AVG(Current)``; a day appears only if it
has at least one reading of BOTH metrics (mart_daily_power.sql:65-68).
Gold rows are stamped midnight UTC of their day (``reading_time``).

Physical shape: one hash aggregation keyed on ``reading_date`` with
map-side partial aggregation (Spark emits partial_avg automatically) —
the F3 metric filter is pushed below the agg and reaches the parquet
scan. One shuffle total, keyed on the same column the table is
partitioned by on disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Parameterized so the same operator serves the reference's
#: Voltage/Current domain and the testdata `events` analog.
DEFAULT_METRICS = ("Voltage", "Current")


def daily_pivot_avg(
    silver: DataFrame,
    metric_a: str = DEFAULT_METRICS[0],
    metric_b: str = DEFAULT_METRICS[1],
    date_col: str = "reading_date",
    name_col: str = "metric_name",
    value_col: str = "metric_value",
) -> DataFrame:
    """A1: grouped conditional average (manual pivot) —
    ``AVG(CASE WHEN name=a THEN value END)`` per day
    (mart_daily_power.sql:49-56). AVG ignores the CASE's NULLs, so each
    average is over only that metric's rows."""
    return (
        silver.filter(F.col(name_col).isin(metric_a, metric_b))
        .groupBy(date_col)
        .agg(
            F.avg(F.when(F.col(name_col) == metric_a, F.col(value_col))).alias("avg_a"),
            F.avg(F.when(F.col(name_col) == metric_b, F.col(value_col))).alias("avg_b"),
        )
    )


def silver_to_gold(
    silver: DataFrame,
    metric_a: str = DEFAULT_METRICS[0],
    metric_b: str = DEFAULT_METRICS[1],
    out_metric: str = "Power",
) -> DataFrame:
    """Full gold model: pivot-avg → both-present filter (F5) → product
    (P9) → literal metric name (P8), midnight-UTC timestamp (P7),
    wall-clock ``calculated_at`` (P6)."""
    daily = daily_pivot_avg(silver, metric_a, metric_b)
    return (
        daily.filter(F.col("avg_a").isNotNull() & F.col("avg_b").isNotNull())
        .select(
            F.lit(out_metric).alias("metric_name"),
            (F.col("avg_a") * F.col("avg_b")).alias("metric_value"),
            F.col("reading_date"),
            F.col("reading_date").cast("timestamp").alias("reading_time"),
            F.current_timestamp().alias("calculated_at"),
        )
    )
