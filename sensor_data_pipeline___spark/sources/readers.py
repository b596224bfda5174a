"""Parquet table readers for the driver-provided testdata star schema
plus the warehouse layers (S3-S5 in SURVEY.md §2.1).

All reads are plain ``spark.read.parquet`` so Catalyst gets predicate
pushdown, column pruning and (for the partitioned warehouse tables)
partition pruning for free.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


@lru_cache(maxsize=256)
def _nanos_columns(path: str) -> tuple[str, ...]:
    """Column names stored as TIMESTAMP(NANOS) in the parquet footer.

    Spark's vectorized reader rejects nano-precision timestamps
    ([PARQUET_TYPE_ILLEGAL]); we read them as raw longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and convert. Footer-only
    read — a driver-side metadata fetch, cheap at any scale."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return tuple(
            f.name
            for f in schema
            if str(f.type) == "timestamp[ns]"
        )
    except Exception:
        return ()


def _normalize_event_time(df: DataFrame) -> DataFrame:
    """Canonicalize timestamp columns to session-TZ TIMESTAMP (LTZ).

    Parquet writers flip between tz-aware (``timestamp[us, tz=UTC]`` →
    Spark TIMESTAMP) and tz-naive (``timestamp[us]`` → TIMESTAMP_NTZ)
    flavors depending on how the file was produced; downstream epoch
    arithmetic (``cast("double")``) is only legal on the LTZ flavor.
    The session timezone is pinned UTC, so NTZ → LTZ is a pure type
    re-tag: the same wall-clock instant, bit-identical epoch values,
    and identical to DuckDB's treatment of naive timestamps. Top-level
    columns only — the testdata schema has no nested timestamps.
    """
    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp_ltz"))
    return df


def table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Read one testdata table (``{sf_dir}/{name}.parquet``)."""
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos = _nanos_columns(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        # integer `div` keeps full precision (a double round-trip would
        # lose sub-ms precision for 2024-epoch nanos > 2^53);
        # truncation toward zero matches DuckDB's ns→µs conversion.
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    # NOTE on scan parallelism: the testdata packs each table into a
    # single parquet row group, so every scan runs as one task (the
    # row group is parquet's split unit). An automatic round-robin
    # "parallelism floor" after the scan was measured here (interleaved
    # best-of-3 A/B at sf0.1) and REJECTED: it wins only on the
    # shingle-heavy minhash path (~20%) and costs 2-3x on every
    # scan→aggregate query, because Catalyst keeps narrow compute below
    # the added exchange while the shuffle overhead is pure cost. At
    # production scale real tables carry many row groups / files and
    # the question disappears.
    return _normalize_event_time(df)


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every testdata table as a temp view for Spark SQL use."""
    for name in TESTDATA_TABLES:
        table(spark, name, sf_dir).createOrReplaceTempView(name)
