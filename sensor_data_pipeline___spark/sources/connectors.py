"""IoT-style streaming source connectors (BASELINE.json
``spark_approach``: "Structured Streaming + IoT source connectors").

The reference's only inlet is HTTP POST of plaintext lines
(reference: src/api/routes/data.py:39-68). A Spark deployment fronts
the same wire format with whichever transport the fleet speaks; each
connector below yields the SAME single-column ``raw_line`` stream, so
everything downstream (the F6 all-or-nothing gate, silver/gold
transforms — see ``streaming.pipeline.ingest_stream``) is
transport-agnostic:

- file drop directory  — ``streaming.pipeline`` (the default; exactly
  replays the reference's batch POST bodies);
- TCP socket           — :func:`socket_reading_stream` (gateway that
  forwards device lines over a raw socket);
- synthetic generator  — :func:`synthetic_sensor_stream`
  (``rate-micro-batch`` source; deterministic load generator for soak
  and scale tests — no real devices needed).

Kafka is the production transport at 100 TB (the connector is one
``spark.readStream.format("kafka")`` swap away) but the container has
no Kafka broker or spark-sql-kafka package, so it is intentionally
absent rather than stubbed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Wire format of one reading (reference README.md:33-37).
LINE_COLUMN = "raw_line"


def socket_reading_stream(
    spark: SparkSession, host: str = "localhost", port: int = 9999
) -> DataFrame:
    """Streaming DataFrame of raw reading lines from a TCP socket.

    The socket source is at-most-once (no replay on failure) — suitable
    for demos and dev loops; durable transports (file drop, Kafka) own
    the production path. Schema: ``raw_line string``."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
        .select(F.col("value").alias(LINE_COLUMN))
    )


def synthetic_sensor_stream(
    spark: SparkSession,
    rows_per_batch: int = 1000,
    start_epoch: int = 1_650_000_000,
    metrics: tuple[str, ...] = ("Voltage", "Current"),
    invalid_every: int = 0,
) -> DataFrame:
    """Deterministic synthetic sensor feed: ``rate-micro-batch`` rows
    formatted into the reference wire grammar ``"{ts} {metric} {value}"``.

    Every field derives from the monotone row ``value`` (metric by
    modulo, reading value from xxhash64 — stable across runs and
    restarts), so soak tests can assert exact downstream aggregates.
    ``invalid_every > 0`` corrupts every k-th line (empty value token),
    exercising the F6 all-or-nothing gate under load. Schema:
    ``raw_line string``.

    Scale note: the rate source parallelizes across
    ``numPartitions``; at 1000 executors this generates load without
    touching storage, which is exactly what a shuffle/state soak needs.
    """
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    idx = F.col("value")  # monotone long, 0-based, deterministic
    metric = F.array(*[F.lit(m) for m in metrics])[
        (idx % len(metrics)).cast("int")
    ]
    # deterministic pseudo-random reading in [0, 100): xxhash64 is a
    # pure function of the row index
    reading = F.round((F.pmod(F.xxhash64(idx), F.lit(10_000)) / 100.0), 2)
    line = F.concat_ws(
        " ",
        (idx + F.lit(start_epoch)).cast("string"),
        metric,
        reading.cast("string"),
    )
    if invalid_every > 0:
        line = F.when(
            idx % invalid_every == invalid_every - 1,
            F.concat_ws(" ", (idx + F.lit(start_epoch)).cast("string"), metric),
        ).otherwise(line)
    return src.select(line.alias(LINE_COLUMN))


class OffsetReplaySource:
    """Kafka-shaped offset-replay contract over plain files (the
    container ships no broker; reference analog: the retrying POST
    clients, airflow/config/settings.py — 3 retries with backoff).

    A *topic* directory holds per-partition append-only segment files
    (``part-<n>.log``, one record per line); a record's explicit offset
    is its line position within its partition. Consumption is
    poll/commit, exactly a Kafka consumer group's shape:

    - :meth:`poll` returns every record STRICTLY PAST the committed
      offsets as a DataFrame ``(partition int, offset long, value
      string)`` — delivery, not consumption;
    - :meth:`commit` durably records the new positions (single JSON
      file written atomically via temp + ``os.replace``);
    - a consumer that crashes AFTER its sink write but BEFORE
      ``commit()`` re-polls the same records on restart: at-least-once
      redelivery, the precise failure window a checkpoint/offset log
      protects. Pairing redelivered batches with
      ``streaming.pipeline.dedup_stream`` (content-hash
      ``dropDuplicatesWithinWatermark``) or the ``batch_id``-keyed
      idempotent bronze writer yields effectively-once downstream —
      the contract this class exists to make testable.

    Scale note: poll reads segments with the distributed text reader
    and filters on (partition, offset) — predicate-pushdown-friendly;
    the committed-offset map is O(partitions) driver state, the same
    cardinality a Kafka consumer carries.
    """

    def __init__(self, spark: SparkSession, topic_dir: str, commit_path: str):
        self.spark = spark
        self.topic_dir = topic_dir
        self.commit_path = commit_path

    # -- producer side (test/load-generator helper) --------------------
    def append(self, partition: int, lines: list[str]) -> None:
        """Append records to a partition's segment (producer analog)."""
        import os

        os.makedirs(self.topic_dir, exist_ok=True)
        seg = os.path.join(self.topic_dir, f"part-{partition}.log")
        with open(seg, "a") as f:
            for line in lines:
                f.write(line + "\n")

    # -- consumer side -------------------------------------------------
    def committed(self) -> dict[int, int]:
        """{partition: next-offset-to-deliver}; empty before the first
        commit (earliest semantics)."""
        import json
        import os

        if not os.path.exists(self.commit_path):
            return {}
        with open(self.commit_path) as f:
            return {int(k): int(v) for k, v in json.load(f).items()}

    def poll(self) -> DataFrame:
        """All records past the committed offsets, with their explicit
        (partition, offset) identity."""
        import glob
        import os

        committed = self.committed()
        segs = sorted(glob.glob(os.path.join(self.topic_dir, "part-*.log")))
        frames = []
        for seg in segs:
            part = int(os.path.basename(seg)[len("part-") : -len(".log")])
            df = (
                self.spark.read.text(seg)
                .select(
                    F.lit(part).alias("partition"),
                    # monotone position within the partition segment =
                    # the record's durable, replay-stable offset. The
                    # single-partition window is bounded by the segment
                    # rotation size (Kafka's own per-segment index
                    # shape); a real broker SERVES offsets instead of
                    # recomputing them.
                    (F.row_number().over(
                        Window.orderBy(F.monotonically_increasing_id())
                    ) - 1).cast("long").alias("offset"),
                    F.col("value"),
                )
                .filter(F.col("offset") >= F.lit(committed.get(part, 0)))
            )
            frames.append(df)
        if not frames:
            from sensor_data_pipeline___spark.operators._local import (
                local_df,
            )

            return local_df(
                self.spark, [], "partition int, offset long, value string"
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    def next_offsets(self, polled: DataFrame) -> dict[int, int]:
        """End positions of a polled batch — the argument to
        :meth:`commit` after the sink write succeeds."""
        ends = self.committed()
        for r in polled.groupBy("partition").agg(
            F.max("offset").alias("last")
        ).collect():
            ends[int(r["partition"])] = int(r["last"]) + 1
        return ends

    def commit(self, offsets: dict[int, int]) -> None:
        """Atomically persist consumer positions (temp + rename — a
        reader never sees a torn commit file)."""
        import json
        import os

        tmp = self.commit_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({str(k): v for k, v in offsets.items()}, f)
        os.replace(tmp, self.commit_path)

    def consume_to_bronze(self, bronze_path: str) -> int:
        """One poll → bronze write → commit cycle with an IDEMPOTENT
        sink write, closing the torn-commit window between the sink
        write and ``commit()`` (VERDICT r5 directive #4).

        Batch identity is the batch's STARTING committed offsets —
        replay-stable by construction: a consumer that crashes after
        the bronze write but before ``commit()`` re-polls from the
        same positions on restart, producing the same ``ingest_key``,
        so the rewrite OVERWRITES its own ``ingest_key=...`` partition
        (dynamic partition overwrite, the `_write_changelog_batch`
        pattern) instead of appending a duplicate. Effectively-once in
        bronze from an at-least-once transport, without a broker.

        Returns the number of records landed (0 = nothing new)."""
        polled = self.poll()
        start = self.committed()
        key = (
            "-".join(f"{p}_{o}" for p, o in sorted(start.items())) or "origin"
        )
        # Snapshot the batch boundary FIRST, then bound every later
        # evaluation of the lazy plan to it. ``polled`` re-reads the
        # segments on each action; without the bound, a producer append
        # between the bronze write and the offset collection would be
        # covered by the committed offsets yet absent from bronze
        # (silent loss), and the returned count could disagree with
        # the rows actually written. With ``offset < end`` pinned per
        # partition, count / write / commit all observe the exact same
        # record set regardless of concurrent appends (the log is
        # append-only, so offsets below the snapshot are immutable).
        ends = self.next_offsets(polled)
        if not ends:
            return 0
        end_map = F.create_map(
            *[x for p, e in sorted(ends.items()) for x in (F.lit(p), F.lit(e))]
        )
        rows = polled.select(
            "partition",
            "offset",
            F.col("value").alias("raw_line"),
            F.current_timestamp().alias("ingested_at"),
            F.lit(key).alias("ingest_key"),
        ).filter(F.col("offset") < end_map[F.col("partition")])
        n = rows.count()
        if n == 0:
            return 0
        # pin dynamic overwrite for THIS write (restore after) — under
        # the static default an "overwrite" would wipe every previous
        # batch's partition, not just this batch's own
        from sensor_data_pipeline___spark.operators._writes import (
            overwrite_mode,
        )

        with overwrite_mode(self.spark, "dynamic"):
            rows.write.mode("overwrite").partitionBy("ingest_key").parquet(
                bronze_path
            )
        self.commit(ends)
        return n
