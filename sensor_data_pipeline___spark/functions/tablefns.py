"""Python UDTFs (Spark 4 user-defined table functions).

Capability surface only: a UDTF runs row-at-a-time in a Python worker,
so every shape here that CAN be an explode()/posexplode() composition
should be one in production (JVM-side, whole-stage codegen). The value
of the API is shapes that genuinely need imperative per-row expansion
with early termination or external state — the ``limit`` push-INTO the
generator below is the miniature of that: the Python side stops
producing rows the plan would discard, where explode-then-filter
materializes them first.

Reference parity note: the reference registers no UDTFs (SURVEY.md
§2.8 — its helpers are plain Python functions); this module exists for
the engine's capability checklist.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="doc_id: bigint, pos: int, term: string")
class FirstTerms:
    """Emit the first ``limit`` whitespace terms of each document as
    (doc_id, position, term) rows."""

    def eval(self, doc_id: int, text: str, limit: int):
        if text is None:
            return
        for i, term in enumerate(text.split(" ")):
            if i >= limit:
                break
            yield doc_id, i, term


def register_first_terms(spark: SparkSession) -> None:
    spark.udtf.register("first_terms", FirstTerms)
