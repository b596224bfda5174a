"""One-off r15 adjudication harness (VERDICT r14 directive #2).

Measures the `corpus_neardup` bench arm best-of-3 on an idle host,
bracketed by `calib_scan` anchor readings, so the r14 official
202->110 rows/s move can be classified (noise / environment / code)
on the anchor-normalized basis SCALING.md's drift table uses.

Run from the repo root: ``python scripts/adjudicate_neardup_r15.py``.
Prints one JSON line per rep plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_corpus_neardup_ingest, calib_scan  # noqa: E402
from sensor_data_pipeline___spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("adjudicate-neardup")
    # warmup: JVM + codegen, same as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    calib0 = calib_scan(spark, sf_dir)
    reps = []
    for i in range(3):
        r = bench_corpus_neardup_ingest(spark)
        r["load_avg"] = [round(x, 2) for x in os.getloadavg()]
        print(json.dumps({"rep": i, **r}), flush=True)
        reps.append(r)
    calib1 = calib_scan(spark, sf_dir)
    best = max(r["corpus_neardup_rows_per_s"] for r in reps)
    print(
        json.dumps(
            {
                "summary": True,
                "best_rows_per_s": best,
                "p50_ms_of_best": min(
                    r["corpus_neardup_batch_latency_ms_p50"] for r in reps
                ),
                "calib_scan_s_start": calib0,
                "calib_scan_s_end": calib1,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
