"""Mergeable sketch operators: HyperLogLog distinct rollups and an
explicit count-min sketch.

The pattern that matters at 100 TB is RE-AGGREGABILITY: a per-partition
(here per-day) sketch is built once at ingest cost, and any later
rollup (per week, per metric, per anything) is a cheap union of
sketch binaries — no rescan of the raw data, unlike count(DISTINCT)
which cannot be pre-aggregated. This is the sensor-mart analog of the
reference's incremental gold recompute (mart_daily_power.sql:36-46):
instead of re-reading a day's raw rows, the day's sketch is the
reusable intermediate.

HLL uses Spark's built-in Datasketches bindings (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate — JVM-side, mergeable,
deterministic for a given input multiset). The count-min sketch is
built explicitly from DataFrame ops (xxhash64 bucket rows) rather than
F.count_min_sketch's opaque binary, because the point is showing the
sketch IS just a small groupBy table: d×w counters whose build is one
partial-agg shuffle and whose point query is a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default HLL precision (Datasketches lgConfigK): 2^12 registers,
#: ~1.6% relative standard error — 4 KB per sketch.
HLL_LG_K = 12


def hll_daily_sketches(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    lg_k: int = HLL_LG_K,
) -> DataFrame:
    """One HLL sketch binary per (group, day) — the pre-aggregated
    distinct-count intermediate. Build cost is the same one shuffle a
    count(DISTINCT) needs, but the output is mergeable forever after."""
    return events.groupBy(group, F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg(key, F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def hll_rollup(sketches: DataFrame, group: str = "event_type") -> DataFrame:
    """Union the per-day sketches per group and estimate distincts —
    sketch-sized shuffle (KBs per group), never touches raw data."""
    return sketches.groupBy(group).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_distinct"),
        F.count("*").alias("n_sketches"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch as a (row, bucket) -> count table: ``depth``
    independent hash rows of ``width`` counters each (Cormode &
    Muthukrishnan, 2005). One partial-agg shuffle of at most
    depth×width rows regardless of input size; each input row
    contributes to ``depth`` counters via xxhash64 seeded per row.
    """
    rows = df.select(
        F.explode(
            F.array(*[F.lit(i) for i in range(depth)])
        ).alias("_row"),
        F.col(col).alias("_k"),
    ).select(
        "_row",
        (F.pmod(F.xxhash64("_k", "_row"), F.lit(width))).alias("_bucket"),
    )
    return rows.groupBy("_row", "_bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    cms: DataFrame, keys: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each key's frequency: min over the key's
    ``depth`` counters. Guarantees est >= true count (one-sided), with
    overestimate bounded by collisions (~N/width per row w.h.p.).
    ``keys`` is expected to be small (candidate heavy hitters) — the
    probe is a broadcast-sized join against the depth×width table."""
    probes = keys.select(
        F.col(col),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("_row"),
    ).select(
        col,
        "_row",
        (F.pmod(F.xxhash64(F.col(col), F.col("_row")), F.lit(width))).alias(
            "_bucket"
        ),
    )
    return (
        probes.join(F.broadcast(cms), ["_row", "_bucket"])
        .groupBy(col)
        .agg(F.min("cnt").alias("est_count"))
    )
