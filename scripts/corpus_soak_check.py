"""Corpus-ingest soak at 10x the bench volume (VERDICT r6 directive #7).

``bench_corpus_ingest`` measures 8 micro-batches of 10k docs; the
state-plateau soak (tests/test_streaming_soak.py) runs 55 tiny
batches. Neither covers the rows/s-vs-state-size interaction: the
dedup state store grows with every unique content hash ingested, and a
superlinear per-batch latency trend would only show at volume. This
script runs the SAME path (corpus_ingest_stream: JSONL drop → quality
gate → dropDuplicatesWithinWatermark → parquet clean store) for
``--n-files`` batches of ``--docs-per-file`` unique docs (default
80 x 10k = 800k docs, 10x the bench) and reports the per-batch
latency series split into thirds — flat thirds = no superlinear
growth.

One JSON line to stdout.

Usage::

    python scripts/corpus_soak_check.py [--docs-per-file 10000] \
        [--n-files 80]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-per-file", type=int, default=10_000)
    ap.add_argument("--n-files", type=int, default=80)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.session import get_spark
    from sensor_data_pipeline___spark.streaming import pipeline as sp

    spark = get_spark("corpus-soak-check")
    # retain the full batch history in recentProgress
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(args.n_files + 10)
    )

    with tempfile.TemporaryDirectory() as td:
        drop = os.path.join(td, "drop")
        total = args.docs_per_file * args.n_files
        (
            spark.range(total)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.lit(" ".join(f"tok{i}" for i in range(29)) + " uid"),
                    F.col("id").cast("string"),
                ).alias("text"),
                F.lit("en").alias("lang"),
                F.lit("bench").alias("source"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.col("id") % 3600
                ).alias("fetched_at"),
            )
            .repartition(args.n_files)
            .write.json(drop)
        )
        q = sp.corpus_ingest_stream(
            spark,
            drop,
            os.path.join(td, "out"),
            os.path.join(td, "ckpt"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(1800)
        done = sorted(
            (
                p
                for p in q.recentProgress
                if p["numInputRows"] > 0 and p["batchId"] >= 1
            ),
            key=lambda p: p["batchId"],
        )
        if len(done) < 9:
            raise RuntimeError(f"only {len(done)} measured batches")
        rows = sum(p["numInputRows"] for p in done)
        exec_ms = [p["durationMs"]["triggerExecution"] for p in done]
        third = len(exec_ms) // 3
        p50 = lambda xs: statistics.median(xs)  # noqa: E731
        out_rows = (
            spark.read.parquet(os.path.join(td, "out")).count()
        )
        print(
            json.dumps(
                {
                    "docs_per_file": args.docs_per_file,
                    "n_files": args.n_files,
                    "batches_measured": len(exec_ms),
                    "rows_ingested": rows,
                    "rows_in_clean_store": out_rows,
                    "rows_per_s": round(rows / (sum(exec_ms) / 1000.0), 1),
                    "batch_ms_p50_overall": round(p50(exec_ms), 1),
                    "batch_ms_p50_first_third": round(p50(exec_ms[:third]), 1),
                    "batch_ms_p50_mid_third": round(
                        p50(exec_ms[third : 2 * third]), 1
                    ),
                    "batch_ms_p50_last_third": round(
                        p50(exec_ms[2 * third :]), 1
                    ),
                    "batch_ms_max": max(exec_ms),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
