"""Streaming vector-ingest soak: the IVF twin of corpus_soak_check.

``vector_ingest_stream`` is the embedding counterpart of the near-dup
corpus loop — per micro-batch: identity gate → cosine probe against
the persisted IVF store (self-key excluded) → drop batch-internal
near-dups → append survivors effectively-once — with optional in-loop
maintenance (``ivf_maintenance``: compaction / retrain with a
versioned atomic swap). The unit tests pin each mechanism on 2-3
vectors; this soak drives the WHOLE loop at volume with planted
cross-batch semantic duplicates and asserts the end-state invariants:

1. zero planted near-duplicates admitted — a plant is a SCALED copy
   of an earlier file's vector (scalar multiples preserve cosine
   exactly at 1.0, but hash differently, so the stream's exact
   content dedup cannot catch them — only the index probe can);
2. the incremental store equals a from-scratch assignment of exactly
   the admitted vectors against the stored centroids (cell AND id,
   both directions) — ACROSS compaction generation swaps;
3. the serving generation's ingest-key count stays bounded by the
   maintenance cadence (the small-files term);
4. per-batch latency thirds, for the cost trend.

The probe runs at ``nprobe == ncells`` so invariant 1 is exact (the
production nprobe<ncells recall trade is measured separately by the
mining recall studies); plants share their base's direction, so they
land in the base's cell and even nprobe=1 would see them — full probe
just removes the caveat from the assertion.

One JSON line to stdout.

Usage::

    python scripts/vector_soak_check.py [--vecs-per-file 1500] \
        [--n-files 16] [--maintenance-every 8]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vecs-per-file", type=int, default=1_500)
    ap.add_argument("--n-files", type=int, default=16)
    ap.add_argument("--ncells", type=int, default=16)
    ap.add_argument(
        "--maintenance-every",
        type=int,
        default=8,
        help="run ivf_maintenance every N batches "
        "(compact_after_keys=N; retrain disabled so invariant 2's "
        "fixed-centroid comparison stays exact)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.session import get_spark
    from sensor_data_pipeline___spark.streaming import pipeline as sp

    spark = get_spark("vector-soak-check")
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(args.n_files + 10)
    )

    vpf, nf = args.vecs_per_file, args.n_files
    total = vpf * nf
    with tempfile.TemporaryDirectory() as td:
        base = sim.synthetic_mixture_corpus(spark, total, seed=7).withColumn(
            "embedding", F.transform("embedding", lambda x: x.cast("double"))
        )
        # plants: in odd files, ids with id % 20 == 7 carry the vector
        # of id - vpf (an even-file id, never itself planted) scaled
        # by 1.25 — cosine exactly 1.0 with a different byte content
        planted = (F.floor(F.col("vec_id") / vpf) % 2 == 1) & (
            F.col("vec_id") % 20 == 7
        )
        src = base.alias("v").join(
            base.select(
                (F.col("vec_id") + vpf).alias("vec_id"),
                F.col("embedding").alias("base_emb"),
            ).alias("b"),
            "vec_id",
            "left",
        ).select(
            "vec_id",
            F.when(
                planted,
                F.transform("base_emb", lambda x: x * F.lit(1.25)),
            )
            .otherwise(F.col("v.embedding"))
            .alias("embedding"),
            F.pmod(F.xxhash64("vec_id"), F.lit(1000)).cast("int").alias("label"),
            planted.alias("planted"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + F.col("vec_id") % 3600
            ).alias("fetched_at"),
        )
        n_planted = src.filter("planted").count()
        # one file per id-contiguous slab, with EXPLICITLY ascending
        # mtimes: invariant 1 (a plant's base arrives first) depends on
        # slab order, and the file source orders new files by modified
        # time — parallel-task part files get arbitrary mtimes, so a
        # bare distributed write can (and did) deliver slabs scrambled
        import shutil
        import time as _time

        stage = os.path.join(td, "stage")
        drop = os.path.join(td, "drop")
        os.makedirs(drop)
        (
            src.withColumn("f", F.floor(F.col("vec_id") / vpf).cast("int"))
            .drop("planted")
            .coalesce(1)
            .write.partitionBy("f")
            .json(stage)
        )
        t0 = _time.time() - nf * 10
        for i in range(nf):
            parts = glob.glob(os.path.join(stage, f"f={i}", "part-*.json"))
            assert len(parts) == 1, (i, parts)
            dst = os.path.join(drop, f"b{i:03d}.jsonl")
            shutil.move(parts[0], dst)
            os.utime(dst, (t0 + i * 10, t0 + i * 10))

        # cold-ish start: centroids trained on a disjoint seed corpus.
        # The seed MUST carry the same column shapes the stream appends
        # (label int via extra_cols, embedding array<double>) — the
        # store's schema-drift guard rejects metadata forks, and mixed
        # float/double vector files would break the union read.
        idx = os.path.join(td, "ivf_index")
        seed_vecs = (
            sim.synthetic_mixture_corpus(spark, 2_000, seed=99)
            .withColumn("vec_id", F.col("vec_id") + 10_000_000_000)
            .withColumn(
                "embedding",
                F.transform("embedding", lambda x: x.cast("double")),
            )
            .withColumn(
                "label",
                F.pmod(F.xxhash64("vec_id"), F.lit(1000)).cast("int"),
            )
        )
        sim.save_ivf_index(
            seed_vecs, idx, ncells=args.ncells, iters=2,
            extra_cols=("label",),
        )

        q = sp.vector_ingest_stream(
            spark,
            drop,
            os.path.join(td, "ckpt"),
            idx,
            threshold=0.999,
            nprobe=args.ncells,
            max_files_per_trigger=1,
            extra_cols=("label",),
            maintenance_every=args.maintenance_every,
            maintenance_kwargs={
                "retrain_balance": 1e18,  # compaction-only (see --help)
                "compact_after_keys": args.maintenance_every,
            },
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
        exec_ms = [p["durationMs"]["triggerExecution"] for p in done]
        third = len(exec_ms) // 3
        p50 = statistics.median

        root = sim._store_root(idx)
        stored = spark.read.parquet(root + "/vectors").filter(
            F.col("vec_id") < 10_000_000_000  # exclude the seed corpus
        )
        stored_ids = {r.vec_id for r in stored.select("vec_id").collect()}

        # (1) zero planted semantic duplicates admitted
        planted_ids = {r.vec_id for r in src.filter("planted").collect()}
        leaked = stored_ids & planted_ids
        assert not leaked, f"{len(leaked)} planted near-dups admitted"
        assert len(stored_ids) == total - n_planted, (
            len(stored_ids), total, n_planted
        )

        # (2) store == scratch assignment of the admitted vectors
        # against the STORED centroids, across the generation swap
        cents = sim._read_centroids(spark, idx)
        admitted = src.filter(~F.col("planted"))
        expect = sim.ivf_assign(
            admitted, cents, vec_col="embedding", id_col="vec_id"
        )
        got = stored.select("vec_id", "cell")
        d1 = got.exceptAll(expect).count()
        d2 = expect.exceptAll(got).count()
        assert d1 == 0 and d2 == 0, (d1, d2)

        # (3) serving generation's key census bounded by the cadence
        keys = {
            os.path.basename(d)
            for d in glob.glob(os.path.join(root, "vectors", "*", "*"))
            if os.path.isdir(d)
        }
        assert len(keys) <= args.maintenance_every + 1, sorted(keys)

        print(
            json.dumps(
                {
                    "vecs_per_file": vpf,
                    "n_files": nf,
                    "batches_measured": len(exec_ms),
                    "n_planted_neardups": n_planted,
                    "planted_admitted": 0,
                    "store_equals_scratch_assignment": True,
                    "final_generation": os.path.basename(root),
                    "ingest_keys_current_gen": len(keys),
                    "rows_per_s": round(
                        sum(p["numInputRows"] for p in done)
                        / (sum(exec_ms) / 1000.0),
                        1,
                    ),
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
