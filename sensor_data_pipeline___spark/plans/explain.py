"""Plan-inspection helpers: assert the physical properties the 100 TB
posture depends on — filter pushdown into the parquet scan, column
pruning, broadcast joins for small dims, whole-stage codegen coverage.

These are the programmatic version of eyeballing
``df.explain("formatted")`` and are used by tests/test_plans.py to pin
each operator's physical shape.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters clauses of every parquet scan in the plan."""
    plan = formatted_plan(df)
    return "\n".join(ln.strip() for ln in plan.splitlines() if "PushedFilters" in ln)


def read_schema(df: DataFrame) -> str:
    """ReadSchema clauses — what the scans actually read (pruning)."""
    plan = formatted_plan(df)
    return "\n".join(ln.strip() for ln in plan.splitlines() if "ReadSchema" in ln)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return fragment in pushed_filters(df)


def reads_column(df: DataFrame, column: str) -> bool:
    return column in read_schema(df)


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def sort_merge_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("SortMergeJoin")


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")


import re


def exchange_count(df: DataFrame) -> int:
    """Shuffle count: unique Exchange nodes (excluding broadcast
    exchanges). The formatted plan shows each node in both the tree and
    the details section — count only the numbered detail headers."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange\s*$", plan, flags=re.M))


def single_partition_exchange_count(df: DataFrame) -> int:
    """Exchanges that funnel EVERYTHING to one task (the physical
    footprint of an unpartitioned window / global sort without limit).
    Zero means no stage collapses to a single partition — the property
    the sharded running-sum/rank formulations exist to guarantee."""
    return formatted_plan(df).count("Arguments: SinglePartition")


def hash_exchange_count(df: DataFrame) -> int:
    """Operator-induced shuffles only: hash/range-partitioned
    exchanges. Excludes the round-robin spread the read boundary adds
    when a file has too few row groups to feed the cluster
    (sources/readers.py parallelism floor) — that exchange reflects
    file layout, not the operator under test."""
    plan = formatted_plan(df)
    return len(
        re.findall(r"Arguments: (?:hashpartitioning|rangepartitioning)", plan)
    )
