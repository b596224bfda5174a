"""Query observability via ``df.observe`` (Observation API).

The reference exposes per-request timing/row-count logging on its HTTP
surface (reference: app/api/serve.go-style access logs); on Spark the
idiomatic equivalent is ``Observation`` metrics: arbitrary aggregate
expressions evaluated DURING the action that materializes the
DataFrame, collected on the driver afterwards.

Why this matters at 100 TB: a naive "count then collect" guard scans
the data twice; an Observation piggybacks on the single pass and costs
one extra aggregation pipeline per partition — the only sane way to
emit row-count / null-rate / min-max freshness metrics from a job that
reads terabytes.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to ``df``; read ``obs.get`` after
    the next action. ``metrics`` values are aggregate Columns
    (``F.count``, ``F.sum``, ``F.min`` ...)."""
    obs = Observation(name)
    return df.observe(obs, *(c.alias(k) for k, c in metrics.items())), obs


def freshness_metrics(df: DataFrame, ts_col: str) -> tuple[DataFrame, Observation]:
    """Standard ingest-health metrics: row count + event-time bounds +
    null-timestamp count, in one pass."""
    return observed(
        df,
        f"freshness_{ts_col}",
        n_rows=F.count(F.lit(1)),
        min_ts=F.min(ts_col),
        max_ts=F.max(ts_col),
        null_ts=F.count(F.when(F.col(ts_col).isNull(), 1)),
    )


@dataclass
class QueryTimer:
    """Wall-clock + Observation metrics for a batch of query runs —
    the driver-side access-log analog. Use::

        timer = QueryTimer()
        with timer.run("q1"):
            df.collect()
        timer.records  # [{"name": "q1", "seconds": ...}]
    """

    records: list[dict[str, Any]] = field(default_factory=list)

    def run(self, name: str, observation: Observation | None = None):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, exc_type, exc, tb):
                rec: dict[str, Any] = {
                    "name": name,
                    "seconds": round(time.perf_counter() - self.t0, 3),
                    "ok": exc_type is None,
                }
                if observation is not None and exc_type is None:
                    rec["metrics"] = observation.get
                timer.records.append(rec)
                return False

        return _Ctx()
