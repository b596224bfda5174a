"""CC label-store update cost vs store size (VERDICT r14 directive #3).

Before r15, ``cc_labels_update`` scanned the WHOLE raw label store per
batch for the endpoint semi-join and the affected-members fetch — an
O(store) per-batch term in the streaming near-dup loop. r15 adds the
footer-stats manifest + node-sorted base (the minhash band-manifest
cure): with ``prune_max_nodes`` the two scans open only the base files
whose [min, max] node / component ranges can hold the batch's keys.

This harness quantifies the claim directly: seed stores across a
size sweep (singleton labels, fixed rows-per-file so file count
scales with store size), run B update batches of fixed shape against
each with compaction OFF, and report per-batch wall time and
manifest-selected file counts, pruned vs unpruned. FLAT = pruned
per-batch cost is ~equal across store sizes while unpruned grows with
the store; files-read shrinks from all to ~(endpoints hit).

Updates in the harness force ``prune_min_files=1`` so the selective
path is characterized at EVERY store size; production callers keep
the default cost gate (small stores full-scan — see the SCALING.md
r15 addendum).

Usage::

    python scripts/cc_labels_scale_check.py
        [--sizes 200000 2000000 20000000] [--batches 8]
        [--pairs-per-batch 100] [--rows-per-file 20000]

One arm per subprocess; markdown table to stderr, JSON to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sensor_data_pipeline___spark.operators import dedup  # noqa: E402
from sensor_data_pipeline___spark.operators._writes import (  # noqa: E402
    resolve_current,
)
from sensor_data_pipeline___spark.session import get_spark  # noqa: E402


def run_arm(
    spark, n_nodes: int, batches: int, pairs: int,
    rows_per_file: int, prune: int,
) -> dict:
    """Seed an n_nodes singleton store, apply `batches` fixed-shape
    update batches (compaction OFF), return timing + pruning stats.
    Pair endpoints are deterministic (seeded by batch index) and
    chosen NOT to chain into a mega-cluster: batch b links node
    (b*2p + 2i) to (b*2p + 2i + 1) — disjoint doubleton merges, the
    common case for trickle near-dups."""
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "cc")
        seed = spark.range(n_nodes).selectExpr(
            "id as node", "id as component"
        )
        dedup.save_cc_labels(
            spark, path, seed, rows_per_file=rows_per_file
        )
        root = resolve_current(path)
        man = dedup._load_cc_manifest(root)
        total_files = len(man) if man else 0
        times = []
        files_read = []
        for b in range(batches):
            base_id = b * 2 * pairs
            pair_df = spark.range(pairs).selectExpr(
                f"{base_id} + id * 2 as doc_a",
                f"{base_id} + id * 2 + 1 as doc_b",
            )
            if prune > 0:
                ends = [base_id + i for i in range(2 * pairs)]
                sel = dedup._cc_select_base_files(root, ends, "node")
                files_read.append(
                    len(sel) if sel is not None else total_files
                )
            else:
                files_read.append(total_files)  # full scan reads all
            t0 = time.perf_counter()
            dedup.cc_labels_update(
                spark, path, pair_df, ingest_key=f"b{b}",
                prune_max_nodes=prune, prune_min_files=1,
            )
            times.append(time.perf_counter() - t0)
        return {
            "store_nodes": n_nodes,
            "prune_max_nodes": prune,
            "base_files_total": total_files,
            "base_files_selected_p50": statistics.median(files_read),
            "batch_s_p50": round(statistics.median(times), 3),
            "batch_s_first": round(times[0], 3),
            "batch_s_last": round(times[-1], 3),
        }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sizes", type=int, nargs="*",
        default=[200_000, 2_000_000, 20_000_000],
    )
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--pairs-per-batch", type=int, default=100)
    ap.add_argument("--rows-per-file", type=int, default=20_000)
    ap.add_argument(
        "--one-arm", type=int, nargs=2, metavar=("NODES", "PRUNE"),
        default=None,
        help="internal: run a single (store size, prune cap) arm in "
        "THIS process and print its JSON — the orchestrator spawns "
        "one subprocess per arm so no arm inherits another's JVM "
        "state (the first cut ran all arms in one session and the "
        "later arms' fixed job costs inflated 3x from accumulated "
        "driver/session state, confounding the comparison)",
    )
    args = ap.parse_args()

    if args.one_arm is not None:
        nodes, prune = args.one_arm
        spark = get_spark("cc-labels-scale-check")
        # warmup: JVM + codegen on a throwaway tiny arm
        run_arm(spark, 1_000, 2, 10, 500, prune)
        print(
            json.dumps(
                run_arm(
                    spark, nodes, args.batches, args.pairs_per_batch,
                    args.rows_per_file, prune,
                )
            )
        )
        spark.stop()
        return

    import subprocess

    arms = []
    for n in args.sizes:
        for prune in (0, 4096):
            out = subprocess.run(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--one-arm", str(n), str(prune),
                    "--batches", str(args.batches),
                    "--pairs-per-batch", str(args.pairs_per_batch),
                    "--rows-per-file", str(args.rows_per_file),
                ],
                capture_output=True, text=True, check=True,
            )
            arms.append(json.loads(out.stdout.strip().splitlines()[-1]))
    print(
        "| store nodes | prune | base files (sel/total) | "
        "p50 batch s | first→last s |", file=sys.stderr,
    )
    print("|---|---|---|---|---|", file=sys.stderr)
    for a in arms:
        print(
            f"| {a['store_nodes']} | {a['prune_max_nodes']} | "
            f"{a['base_files_selected_p50']}/{a['base_files_total']} | "
            f"{a['batch_s_p50']} | "
            f"{a['batch_s_first']}→{a['batch_s_last']} |",
            file=sys.stderr,
        )
    print(json.dumps({"arms": arms}))


if __name__ == "__main__":
    main()
