"""Blocked vs brute-force hard-negative mining at a scaled corpus.

Replicates the sf0.1 embeddings table k-fold (id-remapped, vectors
deterministically jittered per replica so replicas are near- but not
exact duplicates — same recipe as scripts/scale_sweep.py), then times

- brute:   hard_negatives(anchors, corpus)            O(A x N) pairs
- blocked: hard_negatives_ivf(..., ncells, nprobe)    O(A x probe mass)

and reports wall time plus recall@k of blocked against brute (the
accuracy cost of the probe). One JSON line to stdout.

``--mode replicate`` (default) is the original k-fold replica
recipe; ``--mode distinct`` generates a seeded Gaussian-mixture corpus
of DISTINCT vectors distributively (synthetic_mixture_corpus — no
replicas), removing the near-equal-cosine-tie confound so id-recall@k
is a clean metric (VERDICT r6 directive #4). ``--nprobe`` accepts a
comma list; each setting is mined and reported separately against the
one brute-force pass.

Usage::

    python scripts/mine_scale_check.py [--factor 200] [--anchors 500] \
        [--ncells 16] [--nprobe 2,4] [--k 5] [--mode distinct] [--n 400000]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

SRC = "/root/testdata/sf0.1/embeddings.parquet"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=200)
    ap.add_argument("--anchors", type=int, default=500)
    ap.add_argument("--ncells", type=int, default=16)
    ap.add_argument("--nprobe", type=str, default="2")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument(
        "--mode", choices=("replicate", "distinct"), default="replicate"
    )
    ap.add_argument("--n", type=int, default=400_000,
                    help="corpus size for --mode distinct")
    ap.add_argument("--labels", type=int, default=40,
                    help="mixture components for --mode distinct")
    ap.add_argument("--sigma", type=float, default=0.3)
    args = ap.parse_args()
    nprobes = [int(x) for x in args.nprobe.split(",")]

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import similarity as sim
    from sensor_data_pipeline___spark.session import get_spark

    spark = get_spark("mine-scale-check")

    if args.mode == "distinct":
        corpus = (
            sim.synthetic_mixture_corpus(
                spark, args.n, n_labels=args.labels, sigma=args.sigma
            )
            .repartition(32)
            .cache()
        )
        n = corpus.count()
        anchors = corpus.filter(F.col("vec_id") < args.anchors).cache()
        n_anchors = anchors.count()
        print(f"corpus={n} anchors={n_anchors} (distinct)", file=sys.stderr)
        return run_compare(spark, sim, corpus, anchors, n, n_anchors, args, nprobes)

    base = spark.read.parquet(SRC)

    reps = spark.range(args.factor).select(F.col("id").alias("rep"))
    stride = 1_000_000
    corpus = (
        base.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * stride).alias("vec_id"),
            "label",
            # deterministic per-replica jitter (~1%) so replicas are
            # near-duplicates, not bit-equal — keeps top-k nontrivial
            F.transform(
                "embedding",
                lambda x, i: x
                + (
                    F.pmod(
                        F.xxhash64(F.col("rep"), i, F.lit(7)), F.lit(1000)
                    ).cast("double")
                    / 50_000.0
                    - 0.01
                ).cast("float"),
            ).alias("embedding"),
        )
        .repartition(32)
        .cache()
    )
    n = corpus.count()
    anchors = corpus.filter(F.col("vec_id") < args.anchors).cache()
    n_anchors = anchors.count()
    print(f"corpus={n} anchors={n_anchors}", file=sys.stderr)
    return run_compare(spark, sim, corpus, anchors, n, n_anchors, args, nprobes)


def run_compare(spark, sim, corpus, anchors, n, n_anchors, args, nprobes):
    t0 = time.perf_counter()
    brute_df = sim.hard_negatives(anchors, corpus, k=args.k)
    brute_rows = brute_df.collect()
    brute = {(r.query_id, r.vec_id) for r in brute_rows}
    t_brute = time.perf_counter() - t0
    print(f"brute: {t_brute:.1f}s, {len(brute)} pairs", file=sys.stderr)

    t0 = time.perf_counter()
    cents = sim.ivf_centroids(
        corpus.sample(0.05, seed=7), ncells=args.ncells, iters=1
    )
    cents = cents.cache()
    cents.count()
    t_train = time.perf_counter() - t0

    # cosine regret alongside id-recall: on a replica-heavy corpus
    # id-recall punishes picking a tied near-equal-cosine copy of the
    # same base negative (the --mode distinct corpus removes that
    # confound); regret = mean drop in per-anchor mean top-k cosine.
    def mean_cos(rows):
        acc: dict[int, list[float]] = {}
        for r in rows:
            acc.setdefault(r.query_id, []).append(r.cosine)
        return {q: sum(v) / len(v) for q, v in acc.items()}

    bm = mean_cos(brute_rows)
    per_probe = []
    for nprobe in nprobes:
        t0 = time.perf_counter()
        blocked_rows = sim.hard_negatives_ivf(
            anchors, corpus, cents, k=args.k, nprobe=nprobe
        ).collect()
        blocked = {(r.query_id, r.vec_id) for r in blocked_rows}
        t_blocked = time.perf_counter() - t0
        recall = len(brute & blocked) / len(brute) if brute else 0.0
        km = mean_cos(blocked_rows)
        regrets = [bm[q] - km.get(q, 0.0) for q in bm]
        regret = sum(regrets) / len(regrets) if regrets else 0.0
        print(
            f"blocked nprobe={nprobe}: mine {t_blocked:.1f}s, "
            f"recall@{args.k}={recall:.3f}, regret={regret:.4f}",
            file=sys.stderr,
        )
        per_probe.append(
            {
                "nprobe": nprobe,
                "blocked_mine_s": round(t_blocked, 2),
                "speedup_mine": round(t_brute / t_blocked, 2),
                "recall_vs_brute": round(recall, 4),
                "mean_cosine_regret": round(regret, 6),
            }
        )

    print(
        json.dumps(
            {
                "mode": args.mode,
                "corpus": n,
                "anchors": n_anchors,
                "ncells": args.ncells,
                "k": args.k,
                "brute_s": round(t_brute, 2),
                "centroid_train_s": round(t_train, 2),
                "probes": per_probe,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
