"""Incremental pipeline runs: the dbt-incremental layer re-expressed as
watermark-filtered transforms + dynamic partition overwrite
(SURVEY.md §2.6 M1/M2/M5, §2.4 J1/J2, §4.2).

Semantics matched from the reference:

- **Silver (M1/J1)**: process only bronze rows with
  ``ingested_at > MAX(silver.processed_at)`` (arrival-time watermark,
  scalar subquery — stg_readings.sql:32-38); upsert on ``raw_id``
  (merge — stg_readings.sql:13-23). Emulation: new rows win over
  existing rows of the touched ``reading_date`` partitions
  (left-anti + union), partitions rewritten atomically.
- **Gold (M2/J2)**: recompute ONLY days that received new silver rows
  since ``MAX(gold.calculated_at)`` — the affected-day semi-join
  (mart_daily_power.sql:36-46) — but recompute each such day from ALL
  its silver rows (full-day recompute), then upsert one row per day.
  Late data for an old date therefore re-opens and corrects that day,
  with no lateness cutoff — update-mode semantics with an infinite
  watermark (SURVEY.md §2.8).
- **Full refresh (M5)**: rebuild from scratch, ignoring watermarks.

Scale posture: the only driver-side values are the two scalar
watermarks (single-row aggregates). Every data-path operation is a
DataFrame transform; per-run work is bounded by the touched partitions,
not table size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators.gold import silver_to_gold
from sensor_data_pipeline___spark.operators.silver import bronze_to_silver
from sensor_data_pipeline___spark.warehouse import BRONZE, GOLD, SILVER, Warehouse


def _scalar_watermark(df: DataFrame, col: str):
    """A2: MAX(col) over the target table — the one permitted
    driver-side scalar. MAX over an empty frame is already NULL →
    None → epoch floor (P10), so no separate emptiness probe: one
    column-pruned aggregate job, which matters in the streaming loop
    where this runs every micro-batch."""
    return df.agg(F.max(col)).first()[0]


def run_silver(wh: Warehouse, full_refresh: bool = False) -> int:
    """Bronze → silver incremental run. Returns rows written."""
    bronze = wh.read(BRONZE).select("id", "raw_line", "ingested_at")
    existing = wh.read(SILVER)

    if full_refresh or not wh.exists(SILVER):
        new_silver = bronze_to_silver(bronze)
        n = new_silver.count()
        wh.write(SILVER, new_silver, mode="overwrite", wipe=full_refresh)
        return n

    wm = _scalar_watermark(existing, "processed_at")
    if wm is not None:
        bronze = bronze.filter(F.col("ingested_at") > F.lit(wm))  # J1

    # localCheckpoint materializes the watermark-bounded parse ONCE
    # (the frame is batch-sized — bounded by the new-data increment,
    # never the table); the emptiness check, the merge's two uses, and
    # the returned count all replay the materialization instead of
    # re-running the bronze scan + parse three times. In the streaming
    # loop this is several jobs per micro-batch.
    new_silver = bronze_to_silver(bronze).localCheckpoint(eager=True)
    n = new_silver.count()
    if n == 0:
        return 0  # no new data — a re-run is a no-op (M1 idempotency)

    # M1 merge on raw_id within touched partitions: keep existing rows
    # that are NOT re-processed (left-anti on the merge key), new rows win.
    affected = new_silver.select("reading_date").distinct()
    existing_affected = existing.join(F.broadcast(affected), "reading_date", "left_semi")
    # allowMissingColumns: after a silver schema evolution, surviving
    # rows keep their evolved columns and re-derived rows carry null
    # there (bronze_to_silver only produces the declared columns)
    merged = existing_affected.join(
        new_silver.select("raw_id"), "raw_id", "left_anti"
    ).unionByName(new_silver, allowMissingColumns=True)
    wh.write(SILVER, merged)  # dynamic overwrite of touched partitions only
    return n


def run_gold(
    wh: Warehouse,
    full_refresh: bool = False,
    affected_days: "list | None" = None,
) -> int:
    """Silver → gold incremental run. Returns days (re)computed.

    ``affected_days`` (the streaming fast path) hands the touched days
    as a driver-side literal list: the calculated_at watermark scan and
    the processed_at semi-join both disappear, and the IN-filter on the
    partition column prunes the silver scan to exactly those days'
    partitions — in the micro-batch loop that is two table-scan jobs
    per trigger replaced by one pruned scan."""
    silver = wh.read(SILVER)

    if affected_days is not None and not full_refresh and wh.exists(GOLD):
        if not affected_days:
            return 0
        silver = silver.filter(F.col("reading_date").isin(affected_days))
    elif not full_refresh and wh.exists(GOLD):
        existing = wh.read(GOLD)
        wm = _scalar_watermark(existing, "calculated_at")
        if wm is not None:
            # J2: days with any NEW silver row — then FULL-day recompute
            affected = (
                silver.filter(F.col("processed_at") > F.lit(wm))
                .select("reading_date")
                .distinct()
            )
            silver = silver.join(F.broadcast(affected), "reading_date", "left_semi")

    # one row per (day, metric) — tiny; materializing once means the
    # count and the write don't each replay the silver aggregation
    # (same pattern as backfill_gold)
    new_gold = silver_to_gold(silver).localCheckpoint(eager=True)
    n = new_gold.count()
    if n == 0 and not full_refresh:
        return 0
    wh.write(GOLD, new_gold, mode="overwrite", wipe=full_refresh)
    return n


def run_pipeline(
    wh: Warehouse,
    full_refresh: bool = False,
    increment: "DataFrame | None" = None,
    affected_days: "list | None" = None,
    want_counts: bool = True,
) -> tuple[int, int]:
    """The hourly DAG body: staging then marts, ordinary call order
    (reference airflow/dags/sensor_data_pipeline.py:88,101).

    ``increment`` is the streaming fast path (VERDICT r6 directive #6):
    the micro-batch loop already HOLDS the exact new bronze rows, so
    re-deriving them from the table — a processed_at watermark scan of
    silver plus a bronze re-read that grows with batch history — is
    pure fixed overhead per trigger. With the increment handed in, the
    parse consumes it directly, the touched days become a driver-side
    literal list (bounded by the batch's distinct dates), and both the
    silver merge and the gold recompute prune to those days'
    PARTITIONS. Semantically identical to the watermark path by
    construction: the increment IS precisely the set of rows past the
    watermark (each batch merges to silver before its checkpoint
    commits; a replayed batch re-presents the same deterministic
    raw_ids and the merge upserts them idempotently — M1).

    Requires silver to already hold everything except the increment,
    which the streaming loop guarantees; callers without that
    guarantee use the watermark path (increment=None).

    ``affected_days`` (optional, with ``increment``) lets the caller
    hand in the increment's distinct reading dates when it already has
    them — the streaming gate aggregation derives them in its own
    scan, saving the distinct+collect job here. A SUPERSET of the true
    touched days is safe (an untouched day in the list is rewritten
    byte-identically and its gold recomputed to the same values);
    days with no valid rows cost one redundant partition rewrite.
    A SUBSET is safe too, but lossy for the increment: the parse is
    restricted to the listed days, so out-of-list increment rows are
    IGNORED this run (their days' existing partitions are untouched
    — never overwritten with increment-only rows) and must be
    re-presented with their day listed to land.

    ``want_counts=False`` (increment path only) skips the final
    silver-row count — one whole Spark action per trigger that exists
    only for the return value; callers that ignore the counts (the
    streaming loop) get ``-1`` as the silver count instead."""
    if increment is None or full_refresh or not wh.exists(SILVER):
        return run_silver(wh, full_refresh), run_gold(wh, full_refresh)

    bronze = increment.select("id", "raw_line", "ingested_at")
    # LAZY on purpose: the merged checkpoint below is the single
    # materialization — parsing inside it avoids a dedicated parse job
    # per trigger (the count at the end re-reads the caller's cached
    # increment, a fraction of a full parse job)
    new_silver = bronze_to_silver(bronze)
    if affected_days is not None:
        days = affected_days
        # CONTRACT GUARD: the merged frame is written with dynamic
        # partition overwrite, so any increment row whose day is NOT
        # in the caller's list would otherwise land in `merged` and
        # OVERWRITE that day's partition with increment-only rows —
        # silently deleting the day's existing silver. Restricting the
        # parse to the listed days makes a subset list non-destructive:
        # out-of-list increment rows are IGNORED this run (their days'
        # partitions untouched), and a superset list stays exactly as
        # documented. Callers that can't guarantee a superset should
        # pass affected_days=None and pay the distinct scan.
        new_silver = new_silver.filter(F.col("reading_date").isin(days))
    else:
        days = [
            r["reading_date"]
            for r in new_silver.select("reading_date").distinct().collect()
        ]
    if not days:
        return 0, 0
    # cached_schema: the streaming loop is the table's sole writer, so
    # the per-trigger mergeSchema footer job (the one read cost that
    # grows with silver's file count) is replaced by the recorded
    # write schema — the catalog-metadata emulation (see Warehouse.read)
    existing = wh.read(SILVER, cached_schema=True)
    # checkpoint the merged days ONCE: the silver write, and the gold
    # recompute below, both replay the materialization — without it,
    # gold would re-read silver (another mergeSchema footer job, a
    # second pruned scan, and a replay of the anti-join) per trigger
    merged = (
        existing.filter(F.col("reading_date").isin(days))  # pruned scan
        .join(new_silver.select("raw_id"), "raw_id", "left_anti")
        .unionByName(new_silver, allowMissingColumns=True)
    ).localCheckpoint(eager=True)
    wh.write(SILVER, merged)  # dynamic overwrite of touched partitions
    # gold for the touched days straight from the frame just written —
    # identical input to run_gold(affected_days=days) re-reading the
    # table, without the table read
    new_gold = silver_to_gold(merged)
    if not want_counts:
        # counts unwanted (the streaming loop): the day aggregate is a
        # handful of rows over the checkpointed merge, so fold it into
        # the write action itself — no checkpoint, no count job. An
        # empty aggregate writes NO partitions under dynamic overwrite
        # (a no-op), so the g>0 guard isn't needed either.
        wh.write(GOLD, new_gold)
        return -1, -1
    new_gold = new_gold.localCheckpoint(eager=True)
    g = int(new_gold.count())
    if g > 0:
        wh.write(GOLD, new_gold)
    return int(new_silver.count()), g


def backfill_gold(wh: Warehouse, start_date: str, end_date: str) -> int:
    """Bounded-range gold recompute: rebuild every day in
    ``[start_date, end_date]`` (inclusive ISO dates) directly from
    silver, ignoring the watermark. The surgical middle ground the
    reference runs as ``dbt run --full-refresh`` scoped by a date var:
    watermark-incremental (run_gold) can't repair days whose silver
    was corrected OUTSIDE an ingest (a manual patch doesn't bump
    processed_at), and full refresh (M5) pays the whole table.

    Two-part write: recomputed days land via dynamic partition
    overwrite (only their partitions rewritten); days in range that no
    longer have ANY silver rows get their gold partition DROPPED
    (ALTER TABLE DROP PARTITION analog — dynamic overwrite alone
    cannot delete a partition by writing zero rows for it, the classic
    silent-staleness gap of overwrite-based backfills). Out-of-range
    partitions are untouched bytes. Idempotent: re-running the same
    range rewrites the same partitions to the same content.

    Returns the number of day-metric gold rows written.
    """
    import shutil

    lo, hi = F.lit(start_date).cast("date"), F.lit(end_date).cast("date")
    silver = wh.read(SILVER).filter(
        F.col("reading_date").between(lo, hi)
    )
    # localCheckpoint materializes the silver-to-gold aggregation ONCE;
    # the count, the gold write, and the live-day collect below all
    # read the materialized partitions instead of re-running the scan.
    new_gold = silver_to_gold(silver).localCheckpoint(eager=True)
    n = new_gold.count()
    if n > 0:
        wh.write(GOLD, new_gold)  # dynamic overwrite: touched days only
    if wh.exists(GOLD):
        live = {
            str(r["reading_date"])
            for r in new_gold.select("reading_date").distinct().collect()
        }
        stale = (
            wh.read(GOLD)
            .filter(F.col("reading_date").between(lo, hi))
            .select("reading_date")
            .distinct()
        )
        for r in stale.collect():
            day = str(r["reading_date"])
            if day not in live:
                shutil.rmtree(
                    os.path.join(wh.path(GOLD), f"reading_date={day}"),
                    ignore_errors=True,
                )
    return n


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """CDC snapshot diff: classify every key as insert/update/delete.

    Full outer join on the key, then compare a single md5 digest of the
    tracked columns per side — the comparison row stays constant-width
    no matter how wide the table is, so the shuffle carries (key,
    digest) rather than two full row copies. Unchanged keys are
    filtered out before the result materializes. This is the
    change-data-feed a warehouse without Delta/Iceberg table history
    derives by diffing snapshots (the MERGE sources M1/M2 consume the
    OUTPUT of exactly this shape).

    Returns (key_cols..., change_type) with change_type in
    ('insert', 'update', 'delete').
    """
    compare_cols = compare_cols or [
        c for c in old.columns if c not in key_cols
    ]
    # Digest the JSON encoding of the column array, not a separator
    # join: JSON escaping makes field boundaries unambiguous (a value
    # containing any would-be separator byte can't shift them), and
    # SQL NULL renders as the JSON token `null`, distinct from every
    # string including "null" (which renders quoted).
    digest = F.md5(
        F.to_json(F.array(*[F.col(c).cast("string") for c in compare_cols]))
    )
    o = old.select(*key_cols, digest.alias("_old_digest"))
    n = new.select(*key_cols, digest.alias("_new_digest"))
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_old_digest").isNull(), F.lit("insert"))
        .when(F.col("_new_digest").isNull(), F.lit("delete"))
        .when(F.col("_old_digest") != F.col("_new_digest"), F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )
