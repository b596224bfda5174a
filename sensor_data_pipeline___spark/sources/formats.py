"""Schema-enforced file-format readers (CSV / JSONL) with corrupt-record
capture.

The reference's only wire format is plaintext lines over HTTP
(reference: src/api/app.py POST /data); a 100 TB Spark deployment
additionally ingests columnar drops (parquet — see ``readers``) and
semi-structured feeds (CSV, JSONL). These readers make the failure
path explicit: every input row either lands typed in the good frame or
lands VERBATIM in the reject frame — the all-or-nothing gate's
row-level cousin (reference F6 semantics are batch-level; at 100 TB a
single bad row must not poison a multi-terabyte load).

Always pass an explicit schema. Schema inference reads the data twice
and infers from a sample — on a 100 TB drop that is both a full extra
scan and a correctness hazard (a column that looks integral for the
first million rows may be a string later)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)])


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Newline-delimited JSON with PERMISSIVE corrupt-record capture.

    Malformed lines (bad JSON, wrong types) surface with every data
    column null and the raw line in ``_corrupt_record`` — split with
    :func:`split_rejects`. The returned frame is cached-free and fully
    streamable; pushdown still applies to the parsed columns."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with PERMISSIVE corrupt-record capture (same contract as
    :func:`read_jsonl`)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def split_rejects(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, rejects): good rows typed and corrupt-free; rejects carry
    the verbatim offending line.

    Spark refuses queries that reference ONLY ``_corrupt_record`` over
    a raw file scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    because the column is populated during the same parse that produces
    the data columns — so the parsed frame is cached first, per the
    error's own guidance. At 100 TB the equivalent move is writing the
    parsed frame once and splitting from the materialized copy."""
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejects = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, rejects


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink (zlib, the Spark default codec). ORC is the
    interchange format for Hive-side consumers; like parquet it
    carries per-stripe min/max statistics, so reads back through
    :func:`read_orc` keep predicate pushdown."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """ORC scan. Schema optional — ORC is self-describing like parquet
    (no inference scan); pass one to pin reader expectations, extra
    columns are pruned, missing ones raise at analysis."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
