"""Scale-sweep harness (SCALING.md, VERDICT r4 directive #8).

Replicates the sf0.1 tables k-fold with id-remapped keys (replica ``i``
offsets every surrogate/foreign key by ``i * _STRIDE`` so keys stay
globally unique while intra-replica joins stay aligned; ``region`` and
``nation`` are tiny fixed dims shared by all replicas), then runs the
FULL 21-query bench headline set at each factor with a ``noop`` sink
(measures engine work, not driver-side row transfer) and reports the
per-query scaling exponent ``log(t_k / t_1) / log(k)``.

Odd document replicas get a per-replica text suffix so the scaled
corpus contains both exact and near duplicates — the dedup operators
see a realistic mixture rather than a degenerate all-identical one.
``--doc-replica-mode exact`` (r15, VERDICT r14 directive #5) drops
the suffix so EVERY document replica is an exact copy — the
best-case corpus for the representative-decomposed release audit
(distinct-text count stays constant as k grows), isolating whether
its cost is truly flat in the copy count rather than merely
sub-linear on the mixed corpus.

Usage::

    python scripts/scale_sweep.py [--factor 10] [--reps 2] \
        [--src /root/testdata/sf0.1] [--work /tmp/spark_scale_sweep] \
        [--doc-replica-mode mixed|exact]

Writes one JSON line to stdout (markdown table to stderr) so it can be
piped straight into the SCALING.md round table.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from bench import BENCH_QUERIES
from sensor_data_pipeline___spark.queries import QUERIES
from sensor_data_pipeline___spark.session import get_spark

#: Key offset between replicas — far above any sf0.1 key, far below
#: int64 overflow at k<=1000.
_STRIDE = 10_000_000_000

#: (table, key columns to offset). region/nation are shared dims:
#: c_nationkey/s_nationkey stay valid against the un-replicated dims,
#: exactly as a 100 TB fact shares its small dimension tables.
_SCALED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_COPIED = ["region", "nation"]


def build_scaled(
    spark: SparkSession,
    src: str,
    dst: str,
    k: int,
    doc_replica_mode: str = "mixed",
) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in _COPIED:
        shutil.copy(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
    files = spark.sparkContext.defaultParallelism
    for name, keys in _SCALED.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        rep = df.withColumn(
            "_rep", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
        )
        for key in keys:
            rep = rep.withColumn(
                key, F.col(key) + F.col("_rep").cast("long") * _STRIDE
            )
        if name == "documents" and doc_replica_mode == "mixed":
            # odd replicas: near-duplicates; even replicas: exact dups
            # ('exact' mode skips this — all replicas verbatim copies)
            rep = rep.withColumn(
                "text",
                F.when(
                    F.col("_rep") % 2 == 1,
                    F.concat(
                        F.col("text"), F.lit(" r"), F.col("_rep")
                    ),
                ).otherwise(F.col("text")),
            ).withColumn("n_chars", F.length("text").cast("long"))
        # file layout bounds scan parallelism (SCALING.md defect #2):
        # target one file per core for facts, fewer for small tables
        n_files = max(2, min(files, rep.count() // 20_000 or 2))
        rep.drop("_rep").repartition(n_files).write.mode(
            "overwrite"
        ).parquet(f"{dst}/{name}.parquet")


def run_set(
    spark: SparkSession, sf_dir: str, reps: int,
    names: "list[str] | None" = None,
) -> dict[str, float]:
    names = names or BENCH_QUERIES
    timings: dict[str, float] = {}
    # warmup: codegen + parquet footer caches
    QUERIES["in_list_filter"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for _ in range(reps):
        for name in names:
            # construction INSIDE the timer, matching bench.py — some
            # queries (corpus_pipeline_stats) materialize eager
            # checkpoints while building; excluding that hides most of
            # their cost
            start = time.perf_counter()
            df: DataFrame = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            timings[name] = round(
                min(timings.get(name, elapsed), elapsed), 3
            )
    return timings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--work", default="/tmp/spark_scale_sweep")
    ap.add_argument(
        "--queries", nargs="*", default=None,
        help="subset of BENCH_QUERIES to sweep (default: all)",
    )
    ap.add_argument(
        "--doc-replica-mode", choices=("mixed", "exact"),
        default="mixed",
        help="'exact': every document replica is a verbatim copy "
        "(mass-dup best case for the rep-decomposed audit); "
        "'mixed' (default): odd replicas get a near-dup suffix",
    )
    args = ap.parse_args()
    names = args.queries or BENCH_QUERIES
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        ap.error(f"not registered: {unknown}")

    spark = get_spark("scale-sweep")
    suffix = "" if args.doc_replica_mode == "mixed" else "-exactdup"
    scaled_dir = os.path.join(args.work, f"x{args.factor}{suffix}")
    if not os.path.exists(os.path.join(scaled_dir, "_DONE")):
        build_scaled(
            spark, args.src, scaled_dir, args.factor,
            args.doc_replica_mode,
        )
        open(os.path.join(scaled_dir, "_DONE"), "w").close()

    t1 = run_set(spark, args.src, args.reps, names)
    tk = run_set(spark, scaled_dir, args.reps, names)

    rows = []
    for name in names:
        exp = math.log(tk[name] / t1[name]) / math.log(args.factor)
        rows.append((name, t1[name], tk[name], round(exp, 2)))
    print(
        f"| query (noop sink, sec) | ×1 | ×{args.factor} | exponent |",
        file=sys.stderr,
    )
    print("|---|---|---|---|", file=sys.stderr)
    for name, a, b, e in rows:
        print(f"| {name} | {a} | {b} | {e} |", file=sys.stderr)
    print(
        json.dumps(
            {
                "factor": args.factor,
                "x1": t1,
                "xk": tk,
                "exponent": {r[0]: r[3] for r in rows},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
