"""IoT source connectors: deterministic synthetic feed (rate-micro-batch)
and TCP socket line source, both emitting the reference wire grammar."""

from __future__ import annotations

import socketserver
import threading
import time

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.functions import parsing
from sensor_data_pipeline___spark.sources import connectors


def _drain_memory_sink(spark, stream_df, name, min_rows, timeout_s=60):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if spark.sql(f"SELECT count(*) AS n FROM {name}").first()["n"] >= min_rows:
                break
            time.sleep(0.3)
        return spark.table(name).collect()
    finally:
        q.stop()


def test_synthetic_stream_matches_batch_twin(spark):
    n = 500
    rows = _drain_memory_sink(
        spark,
        connectors.synthetic_sensor_stream(spark, rows_per_batch=n),
        "synth_ok",
        min_rows=n,
    )
    lines = sorted(r.raw_line for r in rows)[:n]
    # batch twin: the exact same expressions over spark.range — the
    # stream's first batch (value 0..n-1) must reproduce it verbatim
    idx = F.col("id")
    metric = F.array(F.lit("Voltage"), F.lit("Current"))[(idx % 2).cast("int")]
    reading = F.round((F.pmod(F.xxhash64(idx), F.lit(10_000)) / 100.0), 2)
    expected = sorted(
        r.l
        for r in spark.range(n)
        .select(
            F.concat_ws(
                " ",
                (idx + F.lit(1_650_000_000)).cast("string"),
                metric,
                reading.cast("string"),
            ).alias("l")
        )
        .collect()
    )
    assert lines == expected
    # every line passes the reference's API ingest gate
    df = spark.createDataFrame([(l,) for l in lines], ["raw_line"])
    n_valid = df.filter(parsing.gate_valid(F.col("raw_line"))).count()
    assert n_valid == n


def test_synthetic_stream_invalid_every(spark):
    n = 100
    rows = _drain_memory_sink(
        spark,
        connectors.synthetic_sensor_stream(
            spark, rows_per_batch=n, invalid_every=5
        ),
        "synth_bad",
        min_rows=n,
    )
    lines = [r.raw_line for r in rows][:n]
    df = spark.createDataFrame([(l,) for l in lines], ["raw_line"])
    n_invalid = df.filter(~parsing.gate_valid(F.col("raw_line"))).count()
    assert n_invalid == n // 5  # every 5th line fails the gate


class _LineHandler(socketserver.BaseRequestHandler):
    def handle(self):
        self.request.sendall(
            b"1649941817 Voltage 1.34\n"
            b"1649941818 Current 12.0\n"
            b"1649941819 Voltage 1.35\n"
            b"1649941820 Current 13.05\n"
        )
        # keep the connection open until the server shuts down, so the
        # socket source doesn't see EOF and fail the query early
        while not self.server.done.is_set():  # type: ignore[attr-defined]
            time.sleep(0.1)


def test_socket_reading_stream(spark):
    with socketserver.ThreadingTCPServer(("127.0.0.1", 0), _LineHandler) as srv:
        srv.done = threading.Event()  # type: ignore[attr-defined]
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            stream = connectors.socket_reading_stream(spark, "127.0.0.1", port)
            assert stream.isStreaming and stream.columns == ["raw_line"]
            rows = _drain_memory_sink(spark, stream, "sock", min_rows=4)
            got = sorted(r.raw_line for r in rows)
            assert got == [
                "1649941817 Voltage 1.34",
                "1649941818 Current 12.0",
                "1649941819 Voltage 1.35",
                "1649941820 Current 13.05",
            ]
        finally:
            srv.done.set()  # type: ignore[attr-defined]
            srv.shutdown()
