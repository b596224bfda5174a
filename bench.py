"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is fully materialized to the driver so the timing covers
scan → shuffle → result, not just plan construction. Materialization
uses the Arrow path (``toPandas`` with
``spark.sql.execution.arrow.pyspark.enabled``) — the engine's
idiomatic result-fetch: columnar Arrow batches instead of
per-row Python ``Row`` construction, which measured 1.6-9x slower on
the wide-result queries (silver_parse 1.6s→1.0s, session_window_batch
1.3s→0.35s) and bills Python object-allocation overhead to the
engine. Queries whose result types Arrow can't carry fall back to
``collect()``. A warmup query runs first so JVM/codegen startup isn't
billed to the first benchmark entry.
"""

from __future__ import annotations

import json
import os
import time

from sensor_data_pipeline___spark.queries import QUERIES
from sensor_data_pipeline___spark.session import get_spark

#: Headline set: the flagship serving query, the heavy relational
#: shapes, and one of each training-data operator family.
BENCH_QUERIES = [
    "serving_union",
    "gold_daily_power",
    "silver_parse",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "window_topk_orders",
    "rollup_lineitem",
    "dedup_exact",
    "text_quality",
    "minhash_near_dup",
    "similarity_topk",
    "gapfill_forward_fill",
    "mad_outliers",
    "pack_sequences",
    # second sharded-window rep: tracks the shard-and-stitch premium
    # round-over-round alongside pack_sequences (different stitch
    # shape: range-cut histogram vs running-sum packing)
    "equi_depth_histogram",
    # NOT set_similarity_pairs: the synthetic corpus's 31-word vocab
    # makes ~all doc pairs 0.9-Jaccard matches at sf0.1 — the OUTPUT is
    # quadratic (~1M pairs), so the query measures result size, not
    # engine speed. It stays oracle-gated at sf0.01.
    "tfidf_top_terms",
    "session_window_batch",
    "hll_distinct_rollup",
    "psi_value_drift",
    "m4_downsample",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")

    def materialize(df) -> None:
        try:
            df.toPandas()  # Arrow batches; see module docstring
        except Exception:
            df.collect()

    # warmup: JVM + codegen + parquet footer caches
    try:
        materialize(QUERIES["in_list_filter"](spark, sf_dir))
    except Exception:
        pass

    # best-of-3 per query: this host's timings swing up to 3x run-to-
    # run (shared VM); the minimum is the standard noise-robust
    # estimator of the query's true cost. The repetitions are
    # INTERLEAVED (full passes over all queries) so a multi-second
    # noise burst degrades one rep of several queries instead of every
    # rep of one; the first pass doubles as per-query warmup. One broken query must NOT zero the
    # whole artifact (the BENCH_r02 failure mode): failures are
    # recorded per-query and the JSON line is emitted regardless.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for _rep in range(3):
        for name in BENCH_QUERIES:
            if name in errors:
                continue
            try:
                start = time.perf_counter()
                materialize(QUERIES[name](spark, sf_dir))
                elapsed = time.perf_counter() - start
            except Exception as exc:  # noqa: BLE001 — record, keep going
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                timings.pop(name, None)
                continue
            timings[name] = round(min(timings.get(name, elapsed), elapsed), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
