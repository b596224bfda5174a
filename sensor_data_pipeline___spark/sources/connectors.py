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

from pyspark.sql import DataFrame, SparkSession
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
