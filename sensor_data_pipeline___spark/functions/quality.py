"""Data-quality assertions — the dbt schema tests re-expressed as
DataFrame checks (SURVEY.md §5 tier 2).

Reference test definitions: dbt/models/staging/_staging.yml:13-46 and
dbt/models/marts/_marts.yml:15-48 (unique, not_null, accepted_values,
dbt_utils.expression_is_true with severity warn).

Each check compiles to ONE aggregate over the DataFrame (a violation
count), exactly as dbt compiles each schema test to a violation-counting
SELECT. ``run_checks`` unions them into a single job so a table's whole
test suite is one Spark action.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Severity = Literal["error", "warn"]


@dataclass(frozen=True)
class CheckResult:
    check: str
    column: str
    violations: int
    severity: Severity

    @property
    def passed(self) -> bool:
        return self.violations == 0


def _agg(df: DataFrame, cond, name: str, column: str, severity: Severity) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check"),
        F.lit(column).alias("column"),
        F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias("violations"),
        F.lit(severity).alias("severity"),
    )


def not_null(df: DataFrame, column: str, severity: Severity = "error") -> DataFrame:
    return _agg(df, F.col(column).isNull(), "not_null", column, severity)


def unique(df: DataFrame, column: str, severity: Severity = "error") -> DataFrame:
    """dbt `unique`: count of values appearing more than once."""
    dup = (
        df.filter(F.col(column).isNotNull())
        .groupBy(column)
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count("*").cast("long").alias("violations"))
    )
    return dup.select(
        F.lit("unique").alias("check"),
        F.lit(column).alias("column"),
        F.col("violations"),
        F.lit(severity).alias("severity"),
    )


def accepted_values(
    df: DataFrame, column: str, values: list, severity: Severity = "error"
) -> DataFrame:
    cond = F.col(column).isNotNull() & ~F.col(column).isin(values)
    return _agg(df, cond, "accepted_values", column, severity)


def expression_is_true(
    df: DataFrame, expression: str, severity: Severity = "error"
) -> DataFrame:
    """dbt_utils.expression_is_true — e.g. ``"metric_value >= 0"``
    (reference _marts.yml:33-37 uses severity warn)."""
    return _agg(df, ~F.expr(expression), "expression_is_true", expression, severity)


def run_checks(*checks: DataFrame) -> list[CheckResult]:
    """Run all checks in one Spark action; returns per-check results."""
    if not checks:
        return []
    combined = checks[0]
    for c in checks[1:]:
        combined = combined.unionByName(c)
    return [
        CheckResult(r["check"], r["column"], int(r["violations"] or 0), r["severity"])
        for r in combined.collect()
    ]


def assert_checks(*checks: DataFrame) -> list[CheckResult]:
    """Raise AssertionError on any error-severity violation (warn-severity
    results are returned but don't raise — dbt semantics)."""
    results = run_checks(*checks)
    errors = [r for r in results if not r.passed and r.severity == "error"]
    if errors:
        raise AssertionError(f"data-quality check failures: {errors}")
    return results
