"""Local replica of the driver's correctness gate: run QUERIES
entries on Spark and their ORACLE twins on DuckDB at sf0.001, compare
row-count + schema width + order-insensitive value hash with columns
sorted by name (BASELINE.md "Operative target").

Default scope (r16, VERDICT r15 #3): the driver-gate PRIORITY window
(the 50 entries the driver itself oracle-checks) — the full
196-entry replica pushed the default suite past the driver's
verification budget, so a real regression elsewhere in the suite
became invisible (``tests_ok: false`` by truncation). Set
``SPARK_GRAFT_FULL_ORACLE=1`` to sweep the whole surface (the
pre-r16 behavior; ``scripts/verify_driver.py`` also runs the full
surface at sf0.01 on demand)."""

from __future__ import annotations

import decimal
import math
import os

import duckdb
import pytest

from __spark_entry__ import _PRIORITY
from sensor_data_pipeline___spark.queries import ORACLE, QUERIES
from sensor_data_pipeline___spark.sources.readers import TESTDATA_TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
_FULL = os.environ.get("SPARK_GRAFT_FULL_ORACLE", "") == "1"
_ORACLE_NAMES = sorted(
    ORACLE if _FULL else (set(_PRIORITY) & set(ORACLE))
)
def _default_rows_only() -> "set[str]":
    # the benched rows-only entries (e.g. the xxhash64-keyed probe
    # twins) keep a default smoke run; the rest ride the full sweep
    from bench import BENCH_QUERIES

    return (set(_PRIORITY) | set(BENCH_QUERIES)) - set(ORACLE)


_ROWS_ONLY_NAMES = sorted(
    (set(QUERIES) - set(ORACLE)) if _FULL else _default_rows_only()
)


def _canon(value):
    """Engine-independent canonical form of a cell value.

    Decimal is deliberately NOT collapsed to int: the driver's gate
    fetches DuckDB over Arrow, where a HUGEINT aggregate arrives as
    decimal128(38,0) and hash-mismatches Spark's LongType even when
    values agree (the CORRECTNESS_r03 variant_props_extract failure).
    Tagging Decimal keeps this harness exactly as strict."""
    if value is None:
        return "<null>"
    if isinstance(value, decimal.Decimal):
        return f"decimal:{value}"
    if isinstance(value, bool):
        return str(value)
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == int(value) and abs(value) < 1e15:
            return str(int(value))
        return repr(value)
    if isinstance(value, int):
        return str(value)
    return str(value)


def _row_set(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_NAMES)
def test_oracle_match(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    # Fetch via Arrow — the driver's path — so DuckDB type flavors
    # (HUGEINT→decimal128, not →int) are reproduced locally.
    tbl = duck.execute(ORACLE[name]).arrow()
    duck_cols = list(tbl.schema.names)
    duck_rows = list(zip(*(tbl.column(c).to_pylist() for c in duck_cols)))

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_set = _row_set(spark_rows, spark_cols)
    d_set = _row_set(duck_rows, duck_cols)
    if s_set != d_set:
        diffs = [
            (a, b) for a, b in zip(s_set, d_set) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", _ROWS_ONLY_NAMES)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0  # runs and has a stable schema
    assert len(df.columns) > 0
