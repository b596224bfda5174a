"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship serving query (SURVEY.md §3.2) on
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full operator
surface (sensor_data_pipeline___spark/queries.py) for the DuckDB
correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sensor_data_pipeline___spark import queries as _q
from sensor_data_pipeline___spark.session import apply_runtime_confs

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's GET /data lifecycle (filter + union-all + global
    sort + wire formatting) over the events stream mapped to the sensor
    schema, including the daily-power gold rows.
    """
    apply_runtime_confs(spark)
    return _q.QUERIES["serving_union"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; rows-only entries
    (approximate / hash-seeded algorithms) are intentionally absent."""
    return dict(_q.ORACLE)
