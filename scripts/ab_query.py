"""Per-query A/B timing arm (guide §1): run ONE named query in THIS
checkout, N noop-sink reps after a discarded warmup rep, in a fresh
JVM (the caller launches one subprocess per arm and interleaves arms
— same-session before/after pairs are NOT an A/B; SCALING.md r15).

Usage: python scripts/ab_query.py <query_name> [reps=3] [sf_dir]
Prints one JSON line: {"query":..., "reps":[...], "min":..., "med":...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sensor_data_pipeline___spark.queries import QUERIES  # noqa: E402
from sensor_data_pipeline___spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark("ab_query")
    spark.sparkContext.setLogLevel("ERROR")

    def run_once() -> float:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run_once()  # discarded warmup (JVM/codegen/footer caches)
    times = [round(run_once(), 3) for _ in range(reps)]
    print(
        json.dumps(
            {
                "query": name,
                "reps": times,
                "min": round(min(times), 3),
                "med": round(statistics.median(times), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
