"""Parquet warehouse: the medallion tables on disk with the layout that
replaces the reference's Postgres schemas and indexes (SURVEY.md §1.4,
§2.6 M3/M4).

Layout::

    {root}/bronze/raw_readings/   partitioned by ingest_date
    {root}/silver/stg_readings/   partitioned by reading_date
    {root}/gold/mart_daily_power/ partitioned by reading_date

The reference's secondary indexes on ``(reading_date)`` become
partition pruning; its composite ``(reading_date, metric_name)`` index
is partition + parquet min/max column stats. Dynamic partition
overwrite is the MERGE stand-in: rewriting exactly the touched
partitions reproduces dbt's incremental upsert because the partition
key contains the merge key (gold) or the merged rows are fully
recomputed per partition (silver).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sensor_data_pipeline___spark import schemas

BRONZE = "bronze/raw_readings"
SILVER = "silver/stg_readings"
GOLD = "gold/mart_daily_power"

#: Partition columns added on write (not part of the logical schema).
_PARTITION_COL = {
    BRONZE: "ingest_date",
    SILVER: "reading_date",
    GOLD: "reading_date",
}

_SCHEMA = {
    BRONZE: schemas.BRONZE_SCHEMA,
    SILVER: schemas.SILVER_SCHEMA,
    GOLD: schemas.GOLD_SCHEMA,
}


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # table -> schema of the most recent write through THIS
        # instance (the catalog-metadata emulation read(cached_schema=
        # True) consumes)
        self._write_schema: dict = {}

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        # local/posix path check; on HDFS/S3 this is a catalog lookup
        # (S9 table-existence check, reference airflow/hooks/database.py:66-101)
        return os.path.isdir(self.path(table))

    def read(self, table: str, cached_schema: bool = False) -> DataFrame:
        """Read a table; empty-with-schema if it doesn't exist yet.

        ``mergeSchema`` is on: after an in-place schema evolution (new
        parquet files carry a column the old files lack), the read
        exposes the union schema with nulls for the old files — default
        parquet inference samples ONE footer and would surface or drop
        the new column at random. Cost note for 100 TB: merge-schema
        inference is a distributed footer-read job over the table's
        files; a catalog-backed table format (Delta/Iceberg, absent in
        this container) records the evolved schema in metadata and
        makes this free — this is the documented emulation tradeoff.

        ``cached_schema=True`` emulates exactly that catalog shortcut
        for the per-trigger hot loop: if THIS Warehouse instance wrote
        the table since construction, the read uses the recorded write
        schema (no footer job at all — one whole Spark job saved per
        trigger, and the footer job is the one per-batch cost that
        GROWS with table file count). Falls back to mergeSchema when
        no write has been recorded. Contract: only safe while this
        instance is the table's sole writer (the streaming loop's
        situation); an external writer's evolution is picked up on the
        next non-cached read or write."""
        if not self.exists(table):
            schema = _SCHEMA[table]
            part = _PARTITION_COL[table]
            if part and part not in schema.fieldNames():
                schema = T.StructType(
                    list(schema.fields) + [T.StructField(part, T.DateType(), True)]
                )
            # local_df, not createDataFrame: even an EMPTY list-backed
            # frame plans a Python-RDD scan that pays a worker round
            # trip per action (operators/_local.py)
            from sensor_data_pipeline___spark.operators._local import (
                local_df,
            )

            return local_df(self.spark, [], schema)
        if cached_schema and table in self._write_schema:
            return self.spark.read.schema(
                self._write_schema[table]
            ).parquet(self.path(table))
        return self.spark.read.option("mergeSchema", "true").parquet(
            self.path(table)
        )

    def write(
        self, table: str, df: DataFrame, mode: str = "overwrite", wipe: bool = False
    ) -> None:
        """Write with the table's partition layout. ``overwrite`` +
        dynamic partitionOverwriteMode (session default) rewrites only
        the partitions present in ``df`` — the MERGE emulation.
        ``wipe=True`` forces static overwrite (drop ALL existing
        partitions first) — the full-refresh path (M5).

        Silver rows are sorted by ``metric_name`` within each partition
        file — the analog of the reference's composite
        ``(reading_date, metric_name)`` index (stg_readings.sql:18-21):
        partition pruning covers the date, parquet row-group min/max
        stats then skip by metric."""
        part = _PARTITION_COL[table]
        if part not in df.columns:
            if table == BRONZE:
                df = df.withColumn(part, F.to_date("ingested_at"))
            else:
                raise ValueError(f"{table}: missing partition column {part}")
        if table == SILVER:
            df = df.sortWithinPartitions(part, "metric_name")
        conf = "spark.sql.sources.partitionOverwriteMode"
        prior = self.spark.conf.get(conf)
        if wipe:
            self.spark.conf.set(conf, "static")
        try:
            df.write.mode(mode).partitionBy(part).parquet(self.path(table))
        finally:
            self.spark.conf.set(conf, prior)
        # record the write schema for read(cached_schema=True) — the
        # catalog-metadata emulation. UNION with the previous record,
        # never last-write-wins: a narrower write (an append without an
        # evolved column) must not make later cached reads silently
        # DROP that column — on-disk files still carry it, and a
        # dropped column would be made permanent by the next
        # partition-overwrite merge. Union-by-name is exactly what a
        # catalog does for additive evolution.
        prev = self._write_schema.get(table)
        if prev is None:
            self._write_schema[table] = df.schema
        else:
            known = {f.name for f in prev.fields}
            self._write_schema[table] = T.StructType(
                list(prev.fields)
                + [f for f in df.schema.fields if f.name not in known]
            )

    def append(self, table: str, df: DataFrame) -> None:
        self.write(table, df, mode="append")

    def max_id(self, table: str = BRONZE) -> int:
        if not self.exists(table):
            return 0
        val = self.read(table).agg(F.max("id")).first()[0]
        return int(val or 0)

    def file_stats(self, table: str) -> dict[str, tuple[int, int]]:
        """{partition_dir: (n_files, total_bytes)} from a filesystem
        listing — the input to the compaction decision. Local walk
        here; on HDFS/S3 the identical listing comes from the
        FileSystem API / S3 LIST (what table formats keep in their
        manifest instead)."""
        stats: dict[str, tuple[int, int]] = {}
        root = self.path(table)
        for dirpath, _dirs, files in os.walk(root):
            parts = [f for f in files if f.endswith(".parquet")]
            if not parts:
                continue
            rel = os.path.relpath(dirpath, root)
            total = sum(os.path.getsize(os.path.join(dirpath, f)) for f in parts)
            stats[rel] = (len(parts), total)
        return stats

    def compact(
        self,
        table: str,
        target_file_bytes: int = 128 << 20,
        small_file_threshold: float = 0.5,
    ) -> list[str]:
        """Rewrite partitions suffering small-files fragmentation so
        each holds ~``target_file_bytes`` parquet files. Returns the
        partition dirs rewritten (empty list = nothing to do).

        Streaming/incremental appends leave one file per (micro-batch,
        partition); a year of hourly batches is ~8 760 files per
        partition and scan planning, footer reads, and shuffle-read
        fan-in all degrade with file COUNT, not bytes — the classic
        100 TB operational failure. Compaction = maintenance rewrite:
        per fragmented partition, ``repartition(partition_col)`` routes
        its rows to one task and ``maxRecordsPerFile`` re-splits output
        at the target size, so large partitions still produce multiple
        right-sized files. Only partitions whose average file size is
        below ``small_file_threshold × target`` AND holding >1 file are
        rewritten (dynamic partition overwrite — untouched partitions
        keep their files byte-identical, so the rewrite is idempotent
        and re-run-safe, the same guarantee as the M1/M2 merges).

        Skew note: one task per fragmented partition is the safe
        default while partitions are partition-pruning-sized (the
        design point, SURVEY.md §7.3.6); a pathologically large
        partition compacts via ``write_zordered``-style range
        repartitioning instead.
        """
        part_col = _PARTITION_COL[table]
        stats = self.file_stats(table)
        frag = [
            rel
            for rel, (n, total) in stats.items()
            # "=" filters out non-hive dirs (an unpartitioned layout's
            # root-level files are not compactable by partition value)
            if "=" in rel
            and n > 1
            and total / n < small_file_threshold * target_file_bytes
        ]
        if not frag:
            return []
        # partition dir names are hive-style "<col>=<value>"
        values = [rel.split("=", 1)[1] for rel in frag]
        df = self.read(table).filter(F.col(part_col).cast("string").isin(values))
        rows = df.count()
        if rows == 0:
            return []
        # estimate records per target file from the fragmented
        # partitions' own on-disk bytes-per-row
        frag_bytes = sum(stats[rel][1] for rel in frag)
        per_row = max(frag_bytes / rows, 1.0)
        max_records = max(int(target_file_bytes / per_row), 1)
        out = df.repartition(F.col(part_col))
        if table == SILVER:
            # preserve the composite-index analog (see write())
            out = out.sortWithinPartitions(part_col, "metric_name")
        (
            out.write.mode("overwrite")
            .partitionBy(part_col)
            .option("maxRecordsPerFile", max_records)
            .parquet(self.path(table))
        )
        return sorted(frag)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed managed table (Hive-style layout).

    Bucketing is the engine's co-located-join device: two fact tables
    bucketed identically on their join key sort-merge-join with NO
    shuffle exchange on either side — at 100 TB this removes the
    dominant cost of repeated fact-to-fact joins (the reference has no
    analog; Postgres gets this from btree indexes + merge joins).

    Bucketed output requires ``saveAsTable`` (path-based parquet writes
    can't record bucket metadata).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def zvalue(a, b, bits: int = 16):
    """Morton code of two ``bits``-wide non-negative long Columns: bit
    i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1. Static
    2·bits-term shift/mask/or expression chain inside whole-stage
    codegen — no UDF. Shared by :func:`zorder_key` (data-derived
    bounds) and the fixed-bounds oracle query (``zorder_curve_stats``).

    Column ``&``/``|`` are LOGICAL operators in PySpark — bit ops need
    the explicit methods, and bitwiseAND requires matching operand
    types."""
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i + 1)
        )
    return z


def quantize(col, lo: float, hi: float, bits: int):
    """Map a Column to an integer rank in [0, 2**bits) against FIXED
    bounds (the histogram_sketch posture: bounds are layout schema, a
    re-bound is a rewrite) — the exactly-SQL-replayable flavor the
    oracle-gated Z-order query uses; :func:`zorder_key` derives bounds
    from the data instead (one broadcast agg), which is the
    maintenance-rewrite convenience. Values at ``hi`` clamp into the
    top cell."""
    cells = 1 << bits
    width = (hi - lo) / cells
    return (
        F.least(
            F.greatest(F.floor((col - F.lit(lo)) / F.lit(width)), F.lit(0)),
            F.lit(cells - 1),
        )
        .cast("long")
    )


def zorder_key(df: DataFrame, col_a: str, col_b: str, bits: int = 16) -> DataFrame:
    """Attach a Z-order (Morton) key interleaving two numeric columns.

    Each column is min-max normalized to a ``bits``-bit integer
    (bounds via one broadcast agg — the same two-pass shape as the
    histogram queries), then bit-interleaved into ``_z``. Sorting the
    layout by ``_z`` clusters rows so that EVERY file's min/max
    bounding box is tight in BOTH dimensions at once — a single-column
    sort gives tight boxes in that column only. Parquet/ORC footer
    stats then prune files/row-groups for 2-D predicates, which
    single-dimension partitioning cannot do.

    The interleave is a static 2·bits-term expression chain —
    JVM-side, codegen'd once; no UDF.
    """
    bounds = df.agg(
        F.min(col_a).alias("_za_lo"),
        F.max(col_a).alias("_za_hi"),
        F.min(col_b).alias("_zb_lo"),
        F.max(col_b).alias("_zb_hi"),
    )
    scale = (1 << bits) - 1
    with_b = df.crossJoin(F.broadcast(bounds))

    def norm(c, lo, hi):
        span = F.col(hi) - F.col(lo)
        frac = F.when(span > 0, (F.col(c) - F.col(lo)) / span).otherwise(F.lit(0.0))
        return F.least(F.floor(frac * scale), F.lit(scale - 1)).cast("long")

    ia, ib = norm(col_a, "_za_lo", "_za_hi"), norm(col_b, "_zb_lo", "_zb_hi")
    return with_b.withColumn("_z", zvalue(ia, ib, bits)).drop(
        "_za_lo", "_za_hi", "_zb_lo", "_zb_hi"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write parquet clustered by the Z-order key of (col_a, col_b):
    range-partition by ``_z`` (one skew-resistant sampled shuffle),
    sort within partitions, drop the key. Downstream scans prune via
    footer min/max on BOTH columns; no query-side change needed."""
    (
        zorder_key(df, col_a, col_b, bits)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def pruned_scan_units(path: str, box: "dict[str, tuple]") -> "dict":
    """How much of a parquet layout a min/max-pruning scan must READ
    for a conjunctive range predicate ``{col: (lo, hi)}`` — counted
    from the REAL footers (pyarrow metadata), at both granularities an
    engine skips at: whole files and row groups. A unit must be read
    iff its [min, max] interval intersects [lo, hi] on EVERY predicate
    column; units without stats on some predicate column count as
    must-read (the conservative rule every engine applies).

    This is the query-side payoff measurement for :func:`write_zordered`
    (VERDICT r6 directive #5): the same selective 2-D predicate over a
    Z-ordered layout touches a small fraction of units; over a
    random/hash layout every file's bounding box spans ~the whole
    domain, so nothing skips. Driver-side, O(row groups)."""
    import glob

    import pyarrow.parquet as pq

    out = {
        "files_total": 0, "files_read": 0,
        "row_groups_total": 0, "row_groups_read": 0,
    }

    def intersects(stats_by_col) -> bool:
        for name, (lo, hi) in box.items():
            st = stats_by_col.get(name)
            if st is None:
                return True  # no stats ⇒ cannot skip
            mn, mx = st
            try:
                if mx < lo or mn > hi:
                    return False
            except TypeError:
                # stats type incomparable with the predicate bounds
                # (e.g. string column vs numeric box) ⇒ cannot skip
                return True
        return True

    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        out["files_total"] += 1
        file_read = False
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            out["row_groups_total"] += 1
            stats: "dict[str, tuple]" = {}
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema in box and c.statistics is not None:
                    st = c.statistics
                    if st.has_min_max:
                        stats[c.path_in_schema] = (st.min, st.max)
            if intersects(stats):
                out["row_groups_read"] += 1
                file_read = True
        if file_read:
            out["files_read"] += 1
    return out


def file_stat_spans(path: str, cols: "list[str]") -> "list[dict]":
    """Per-file min/max spans from the REAL parquet footers (pyarrow
    metadata — the exact statistics any engine's file/row-group
    skipping reads). One dict per data file: ``{col: (min, max)}``
    plus ``{col}_span``, the fraction of the column's global domain
    the file covers. Driver-side and O(files) — the measurement side
    of :func:`write_zordered` (a z-ordered layout's spans are small
    rectangles; a hash layout's are ~1.0 on every column), in the same
    maintenance-diagnostic family as :meth:`Warehouse.file_stats`."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    per_file: "list[dict]" = []
    glo: "dict[str, list[float]]" = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins: "dict[str, float]" = {}
        maxs: "dict[str, float]" = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name not in cols or c.statistics is None:
                    continue
                st = c.statistics
                # chunks without min/max (e.g. all-null) carry a
                # statistics object whose min/max accessors throw —
                # skip them rather than crash the diagnostic
                if not st.has_min_max:
                    continue
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        # a file whose footers cover only a subset of the requested
        # columns would KeyError below — require the full set, the
        # same conservatism an engine's skipping logic applies (no
        # stats ⇒ the file can't be skipped ⇒ no span to report)
        if not all(name in mins for name in cols):
            continue
        entry = {"file": os.path.basename(f)}
        for name in cols:
            entry[name] = (mins[name], maxs[name])
            g = glo.setdefault(name, [mins[name], maxs[name]])
            g[0], g[1] = min(g[0], mins[name]), max(g[1], maxs[name])
        per_file.append(entry)
    for entry in per_file:
        for name in cols:
            lo, hi = glo[name]
            fmin, fmax = entry[name]
            dom = (hi - lo) or 1.0
            entry[f"{name}_span"] = (fmax - fmin) / dom
    return per_file
