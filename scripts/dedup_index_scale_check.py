"""Persisted-minhash-index probe vs full re-dedup at a scaled corpus.

The incremental-ingest question: a new batch arrives — is checking it
for near-duplicates against the corpus O(batch) (sign batch + probe
the stored band keys) or O(corpus) (re-sign everything and run
minhash_near_dup over the union)? This script replicates the sf0.1
documents table k-fold (id-remapped; texts repeat, which only makes
the bucket guard work harder — the signing cost this measures is
text-volume-bound either way), builds the index once, then times

- full:  minhash_near_dup(corpus ∪ batch), cross-pair filter
- probe: near_dup_against_index(index, batch)

for a batch carved from held-out rows. One JSON line to stdout.

Usage::

    python scripts/dedup_index_scale_check.py [--factor 10] \
        [--batch 2000]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

SRC = "/root/testdata/sf0.1/documents.parquet"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2000)
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.session import get_spark

    spark = get_spark("dedup-index-scale-check")
    base = spark.read.parquet(SRC)
    stride = 10_000_000
    reps = spark.range(args.factor).select(F.col("id").alias("rep"))
    scaled = (
        base.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * stride).alias("doc_id"),
            # perturb replica text so replicas aren't exact dups of the
            # base (prefix token varies per replica) — keeps buckets
            # below the boilerplate guard
            F.concat(
                F.lit("rep"), F.col("rep").cast("string"), F.lit(" "),
                F.col("text"),
            ).alias("text"),
        )
        .repartition(32)
    )
    corpus = scaled.filter(F.col("doc_id") % 23 != 0).cache()
    batch = (
        scaled.filter(F.col("doc_id") % 23 == 0)
        .orderBy("doc_id")
        .limit(args.batch)
        .cache()
    )
    n, nb = corpus.count(), batch.count()
    print(f"corpus={n} batch={nb}", file=sys.stderr)

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        dedup.save_minhash_index(corpus, td + "/mh")
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        probe_pairs = dedup.near_dup_against_index(
            spark, td + "/mh", batch
        ).count()
        t_probe = time.perf_counter() - t0

        # warm probe: the generation's base partitions are now in the
        # probe cache (operators/_probe_cache.py), so this is the
        # steady-state per-batch cost the streaming loop pays — the
        # cold figure above bills the one-time checkpoint build
        t0 = time.perf_counter()
        probe_pairs_warm = dedup.near_dup_against_index(
            spark, td + "/mh", batch
        ).count()
        t_probe_warm = time.perf_counter() - t0
        assert probe_pairs_warm == probe_pairs

        t0 = time.perf_counter()
        batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
        full = dedup.minhash_near_dup(corpus.unionByName(batch))
        full_pairs = full.filter(
            F.col("doc_a").isin(batch_ids) != F.col("doc_b").isin(batch_ids)
        ).count()
        t_full = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "corpus": n,
                "batch": nb,
                "index_build_s": round(t_build, 2),
                "probe_s": round(t_probe, 2),
                "probe_warm_s": round(t_probe_warm, 2),
                "full_rerun_s": round(t_full, 2),
                "speedup_probe": round(t_full / t_probe, 2),
                "speedup_probe_warm": round(t_full / t_probe_warm, 2),
                "probe_pairs": probe_pairs,
                "full_cross_pairs": full_pairs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
