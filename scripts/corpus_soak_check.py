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

``--mode neardup`` (VERDICT r7 directive #4) runs
``corpus_ingest_stream_neardup`` instead: the same harness with
PLANTED STRADDLING NEAR-DUPS — in every odd-indexed file, ids with
``id % 20 == 7`` carry the token stream of ``id - docs_per_file``
(an even-file, unplanted doc) with the last token tweaked (shingle
Jaccard ≈ 0.93) — and a cold-start minhash index composed in. After
the soak it ASSERTS the directive's two invariants: the clean store
contains no near-dup pairs at the 0.8 threshold (one of each planted
pair survives, whichever batch arrived first), and the incremental
index equals a from-scratch ``save_minhash_index`` build over exactly
the admitted corpus (signatures and band keys, compared
distributively via exceptAll).

``--mode full`` (round 8, capstone) composes the ENTIRE streaming
hygiene stack — quality gate → exact dedup (state) → benchmark
decontamination (index) → DSIR target selection (index) → near-dup
dedup (index), with optional in-loop index maintenance — and plants a
violation for EVERY stage: near-dups (residue 7, probabilistic recall
budget), contaminated docs (residue 3, exact zero tolerance), and
off-target documents in a disjoint vocabulary (residue 11, exact zero
tolerance — the DSIR scorer is fit on held-out corpora of the two
vocabularies and the threshold is the midpoint of the class means).

``--mode hygiene`` (round 8) composes the decontam half of that
stack: the neardup harness plus a persisted decontamination store
(50 benchmark docs in a token space disjoint from the corpus's) wired
in via ``decontam_index_path``. Contamination plants (ids with
``id % 20 == 3`` — disjoint from the near-dup plants' residue 7)
carry one verbatim benchmark 8-gram spliced mid-document. After the
soak it additionally ASSERTS the exact invariant: ZERO contaminated
docs reached the clean store (decontamination has no recall knob —
any leak is a bug, unlike the LSH miss budget).

Usage::

    python scripts/corpus_soak_check.py [--docs-per-file 10000] \
        [--n-files 80] [--mode exact|neardup|hygiene]
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
    ap.add_argument(
        "--mode",
        choices=("exact", "neardup", "hygiene", "full", "gramgrow"),
        default="exact",
    )
    ap.add_argument(
        "--maintenance-every",
        type=int,
        default=None,
        help="neardup/hygiene: run minhash_maintenance every N batches "
        "(compact_after_keys=N, so roughly every tick compacts) — the "
        "in-loop index-maintenance soak",
    )
    ap.add_argument(
        "--cc-labels",
        action="store_true",
        help="neardup/hygiene/full: maintain the persisted (node, "
        "component) label store from each batch's discovered pairs "
        "(r14 — prices the per-batch cc_labels_update tick against "
        "the same soak without it, and asserts the dropped plants "
        "are co-labeled with their bases)",
    )
    args = ap.parse_args()
    if args.cc_labels and args.mode not in ("neardup", "hygiene", "full"):
        ap.error(
            f"--cc-labels requires --mode neardup|hygiene|full "
            f"(got {args.mode!r}); it would be silently ignored"
        )

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.session import get_spark
    from sensor_data_pipeline___spark.streaming import pipeline as sp

    spark = get_spark("corpus-soak-check")
    # retain the full batch history in recentProgress
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", str(args.n_files + 10)
    )

    if args.mode == "gramgrow":
        # DECONTAM GRAM-STORE GROWTH soak (VERDICT r9 directive #7 /
        # r10 #5): the band store's maintained-soak A/B showed the
        # probe cache removes the growing-store scan term; the gram
        # store shares the mechanism but had no growth figure. Batch
        # harness (the gram store grows by benchmark ADMISSIONS, not
        # by the streamed corpus): each tick appends a fresh benchmark
        # slice (contamination_index_append) and times a fixed-size
        # probe (contaminated_against_index, cache_store=True);
        # --maintenance-every N folds the accumulated append deltas
        # into a new cached 'base' generation every N ticks
        # (contamination_index_compact). Flat p50 thirds under
        # maintenance = the same steady state the band store showed;
        # without maintenance every probe re-scans ALL live delta
        # partitions and the trend grows.
        import time as _time

        from sensor_data_pipeline___spark.operators import decontam

        p50 = statistics.median

        def _bench_slice(lo: int, count: int):
            return spark.range(lo, lo + count).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(29)),
                        lambda i: F.concat(
                            F.lit("g"),
                            F.pmod(
                                F.xxhash64(F.col("id"), i), F.lit(500_000)
                            ).cast("string"),
                        ),
                    ),
                ).alias("text"),
            )

        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "gram_index")
            decontam.save_contamination_index(
                _bench_slice(0, 50), path, n=8, key="xxhash64"
            )
            # fixed probe batch: docs_per_file docs, 30 hash-derived
            # tokens each, vocabulary disjoint from the benchmarks'
            probe = (
                spark.range(10_000_000, 10_000_000 + args.docs_per_file)
                .select(
                    F.col("id").alias("doc_id"),
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.sequence(F.lit(0), F.lit(29)),
                            lambda i: F.concat(
                                F.lit("p"),
                                F.pmod(
                                    F.xxhash64(F.col("id"), i),
                                    F.lit(500_000),
                                ).cast("string"),
                            ),
                        ),
                    ).alias("text"),
                )
                .localCheckpoint(eager=True)
            )
            secs = []
            for t in range(args.n_files):
                decontam.contamination_index_append(
                    spark, path,
                    _bench_slice(1000 * (t + 1), 500),
                    ingest_key=f"b{t:03d}",
                )
                t0 = _time.time()
                decontam.contaminated_against_index(
                    spark, path, probe, cache_store=True
                ).count()
                secs.append(round(_time.time() - t0, 3))
                if args.maintenance_every and (
                    (t + 1) % args.maintenance_every == 0
                ):
                    decontam.contamination_index_compact(spark, path)
            third = max(1, len(secs) // 3)
            root = decontam._cx_root(path)
            print(
                json.dumps(
                    {
                        "mode": "gramgrow",
                        "ticks": len(secs),
                        "bench_docs_per_tick": 500,
                        "probe_docs": args.docs_per_file,
                        "store_grams_final": spark.read.parquet(
                            root + "/grams"
                        ).count(),
                        "maintenance_every": args.maintenance_every,
                        "final_generation": os.path.basename(root),
                        "probe_s_p50_first_third": p50(secs[:third]),
                        "probe_s_p50_mid_third": p50(
                            secs[third : 2 * third]
                        ),
                        "probe_s_p50_last_third": p50(secs[2 * third :]),
                        "probe_s_max": max(secs),
                    }
                )
            )
        spark.stop()
        return

    with tempfile.TemporaryDirectory() as td:
        drop = os.path.join(td, "drop")
        total = args.docs_per_file * args.n_files
        dpf = args.docs_per_file
        if args.mode in ("neardup", "hygiene", "full"):
            # distinct-vocabulary docs (near-dup detection needs real
            # shingle structure, unlike the exact mode's shared-token
            # text): 30 tokens hash-derived from a BASE id. Planted
            # near-dups: odd-file ids with id % 20 == 7 reuse the
            # token stream of id - dpf (an even-file id, never itself
            # planted — no chains) with the tail token tweaked.
            planted = (F.floor(F.col("id") / dpf) % 2 == 1) & (
                F.col("id") % 20 == 7
            )
            base = F.when(planted, F.col("id") - dpf).otherwise(F.col("id"))
            toks = F.transform(
                F.sequence(F.lit(0), F.lit(28)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(base, i), F.lit(50_000)).cast("string"),
                ),
            )
            tail = F.when(
                planted, F.concat(F.lit("tweak"), F.col("id").cast("string"))
            ).otherwise(
                F.concat(
                    F.lit("w"),
                    F.pmod(F.xxhash64(base, F.lit(29)), F.lit(50_000)).cast(
                        "string"
                    ),
                )
            )
            text = F.concat_ws(" ", F.concat(toks, F.array(tail)))
            if args.mode in ("hygiene", "full"):
                # contamination plants (disjoint from near-dup plants:
                # residues 3 vs 7 mod 20): splice benchmark doc
                # (id % 50)'s full 8-token text into positions 6-13 —
                # exactly one benchmark 8-gram, in a token space
                # ("b...") disjoint from the corpus's ("w..."), so
                # decontam (exact) must drop ALL of them and the
                # splice can't create accidental near-dups
                contam = F.col("id") % 20 == 3
                bwin = F.transform(
                    F.sequence(F.lit(0), F.lit(7)),
                    lambda j: F.concat(
                        F.lit("b"),
                        F.pmod(F.col("id"), F.lit(50)).cast("string"),
                        F.lit("_"),
                        j.cast("string"),
                    ),
                )
                full = F.concat(toks, F.array(tail))
                spliced = F.concat(
                    F.slice(full, 1, 5), bwin, F.slice(full, 14, 17)
                )
                text = F.when(
                    contam, F.concat_ws(" ", spliced)
                ).otherwise(text)
            if args.mode == "full":
                # DSIR off-target plants (residue 11 — disjoint from
                # near-dup 7 and contamination 3): whole documents in
                # a "q..." vocabulary disjoint from the corpus's "w..."
                # — the target-selection gate must drop ALL of them
                # before they reach decontam, the index, or the store
                offt = F.col("id") % 20 == 11
                qtoks = F.transform(
                    F.sequence(F.lit(0), F.lit(29)),
                    lambda i: F.concat(
                        F.lit("q"),
                        F.pmod(
                            F.xxhash64(F.col("id"), i, F.lit(777)),
                            F.lit(50_000),
                        ).cast("string"),
                    ),
                )
                text = F.when(
                    offt, F.concat_ws(" ", qtoks)
                ).otherwise(text)
                # CCNet band-violation plants (residue 17, VERDICT r8
                # directive #7): whole documents of w-prefixed tokens
                # numbered ABOVE the 50k generator range — never in
                # the LM fit, so every token scores at the add-one
                # smoothing ceiling and the doc bands 'tail' with
                # certainty; with tail admission 0.0 the band gate
                # must drop ALL of them (exact zero tolerance, like
                # decontam/DSIR)
                bandp = F.col("id") % 20 == 17
                gtoks = F.transform(
                    F.sequence(F.lit(0), F.lit(29)),
                    lambda i: F.concat(
                        F.lit("w"),
                        (
                            F.lit(50_000)
                            + F.pmod(
                                F.xxhash64(F.col("id"), i, F.lit(555)),
                                F.lit(50_000),
                            )
                        ).cast("string"),
                    ),
                )
                text = F.when(
                    bandp, F.concat_ws(" ", gtoks)
                ).otherwise(text)
            gen = spark.range(total).select(
                F.col("id").alias("doc_id"),
                text.alias("text"),
                planted.alias("planted"),
                F.lit("en").alias("lang"),
                F.lit("bench").alias("source"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.col("id") % 3600
                ).alias("fetched_at"),
            )
            n_planted = gen.filter("planted").count()
            # one FILE per id-contiguous slab so "odd file" really
            # straddles micro-batches (repartition would scramble)
            gen.withColumn(
                "f", F.floor(F.col("doc_id") / dpf).cast("int")
            ).drop("planted").repartitionByRange(
                args.n_files, "f"
            ).drop("f").write.json(drop)
        else:
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
        if args.mode in ("neardup", "hygiene", "full"):
            from sensor_data_pipeline___spark.operators import decontam, dedup

            idx = os.path.join(td, "mh_index")
            seed = spark.createDataFrame([], "doc_id long, text string")
            dedup.save_minhash_index(seed, idx)  # cold start
            ccx = None
            if args.cc_labels:
                ccx = os.path.join(td, "cc_labels")
                dedup.save_cc_labels(
                    spark, ccx,
                    spark.createDataFrame(
                        [], "node long, component long"
                    ),
                )
            dix = None
            if args.mode in ("hygiene", "full"):
                dix = os.path.join(td, "decontam_index")
                bench_docs = spark.createDataFrame(
                    [(k, " ".join(f"b{k}_{j}" for j in range(8)))
                     for k in range(50)],
                    "doc_id long, text string",
                )
                decontam.save_contamination_index(
                    bench_docs, dix, n=8, key="xxhash64"
                )
            mk = (
                {"compact_after_keys": args.maintenance_every}
                if args.maintenance_every
                else None
            )
            dsx, thr, lmx = None, 0.0, None
            if args.mode == "full":
                # fit the DSIR scorer on held-out corpora from the
                # SAME two vocabularies (w = target+raw, q = raw
                # only), in a bucket space large enough that the two
                # 50k-token vocabularies don't alias (the default 10k
                # buckets would mix them ~5:5 per bucket); threshold =
                # midpoint of the two classes' per-gram score means,
                # all deterministic
                from sensor_data_pipeline___spark.operators import dsir

                def _fit(lo, n, prefix, salt):
                    t = F.transform(
                        F.sequence(F.lit(0), F.lit(29)),
                        lambda i: F.concat(
                            F.lit(prefix),
                            F.pmod(
                                F.xxhash64(F.col("id"), i, F.lit(salt)),
                                F.lit(50_000),
                            ).cast("string"),
                        ),
                    )
                    return spark.range(lo, lo + n).select(
                        F.col("id").alias("doc_id"),
                        F.concat_ws(" ", t).alias("text"),
                    )

                wfit = _fit(1_000_000_000, 20_000, "w", 0)
                qfit = _fit(2_000_000_000, 20_000, "q", 777)
                dsx = os.path.join(td, "dsir_index")
                dsir.save_dsir_index(
                    wfit, wfit.unionByName(qfit), dsx, n_buckets=200_000
                )
                avg_w = (
                    dsir.dsir_weights_against_index(spark, dsx, wfit)
                    .agg(F.avg(F.col("log_weight") / F.col("n_grams")))
                    .first()[0]
                )
                avg_q = (
                    dsir.dsir_weights_against_index(spark, dsx, qfit)
                    .agg(F.avg(F.col("log_weight") / F.col("n_grams")))
                    .first()[0]
                )
                assert avg_w > avg_q, (avg_w, avg_q)
                thr = (avg_w + avg_q) / 2.0
                # CCNet band store: fit on a 50/50 mixture of held-out
                # corpus-like w-docs and ONCE-ONLY rare-token r-docs,
                # so the tercile cut2 lands inside the r-cluster —
                # ordinary corpus docs (tokens seen ~12x in the fit)
                # score strictly below it (head/middle), while the
                # residue-17 plants' all-unseen tokens score at the
                # add-one ceiling, strictly above every fit score
                from sensor_data_pipeline___spark.operators import (
                    text as _text_ops,
                )

                wlm = _fit(3_000_000_000, 20_000, "w", 0)
                rlm = spark.range(4_000_000_000, 4_000_020_000).select(
                    F.col("id").alias("doc_id"),
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.sequence(F.lit(0), F.lit(29)),
                            lambda i: F.concat(
                                F.lit("r"),
                                F.col("id").cast("string"),
                                F.lit("_"),
                                i.cast("string"),
                            ),
                        ),
                    ).alias("text"),
                )
                lmx = os.path.join(td, "lm_store")
                _text_ops.save_unigram_lm(wlm.unionByName(rlm), lmx)
            q = sp.corpus_ingest_stream_neardup(
                spark,
                drop,
                os.path.join(td, "out"),
                os.path.join(td, "ckpt"),
                idx,
                max_files_per_trigger=1,
                decontam_index_path=dix,
                maintenance_every=args.maintenance_every,
                maintenance_kwargs=mk,
                dsir_index_path=dsx,
                dsir_min_avg_weight=thr,
                lm_store_path=lmx,
                lm_band_fractions=(
                    {"head": 1.0, "middle": 1.0, "tail": 0.0}
                    if lmx is not None
                    else None
                ),
                cc_labels_path=ccx,
            )
        else:
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
        extra = {}
        if args.mode in ("neardup", "hygiene", "full"):
            from sensor_data_pipeline___spark.operators import dedup

            store = spark.read.parquet(os.path.join(td, "out")).select(
                "doc_id", "text"
            )
            # THE hard invariant: the clean store contains no near-dup
            # pair detectable at the index's own geometry — whatever
            # the ingest probe could see, it dropped. (A planted pair
            # the 8x8 banding misses at ingest is missed identically
            # by this store-wide pass — same content-deterministic
            # signatures — so detector-consistency, not raw plant
            # count, is the invariant.)
            residual = dedup.minhash_near_dup(store).count()
            assert residual == 0, f"{residual} near-dup pairs in clean store"
            # recall bound: 8 bands x 8 rows at the plants' J ~ 0.93
            # has per-pair miss probability (1 - 0.93^8)^8 ~ 0.14%, so
            # ~5-6 of 4000 plants legitimately slip through; anything
            # beyond 1% signals a probe bug, not LSH variance.
            n_contam = n_offt = 0
            if args.mode in ("hygiene", "full"):
                # THE exact invariant: decontam is not probabilistic —
                # zero contaminated docs may reach the clean store
                contam_in_store = store.filter(
                    F.col("doc_id") % 20 == 3
                ).count()
                assert contam_in_store == 0, contam_in_store
                n_contam = total // 20
            n_band = 0
            band_counts = {}
            if args.mode == "full":
                # equally exact: the DSIR gate is a deterministic
                # score against a fixed store — zero off-target docs
                # may reach the clean store (or, via index == scratch
                # below, the signature index)
                offt_in_store = store.filter(
                    F.col("doc_id") % 20 == 11
                ).count()
                assert offt_in_store == 0, offt_in_store
                n_offt = total // 20
                # CCNet band invariants (directive #7): (1) zero
                # residue-17 plants admitted; (2) detector-consistent
                # per-band admitted mass — re-banding every admitted
                # doc against the same store finds NO doc in an
                # inadmissible band (tail fraction is 0.0, so a single
                # recomputed-'tail' row in the store is a gate bug);
                # (3) the plants really exercised the band stage:
                # regenerated plant texts all band 'tail'
                from sensor_data_pipeline___spark.operators import (
                    text as _text_ops,
                )

                band_in_store = store.filter(
                    F.col("doc_id") % 20 == 17
                ).count()
                assert band_in_store == 0, band_in_store
                n_band = total // 20
                rebanded = _text_ops.unigram_bands_against_lm(
                    spark, lmx, store
                )
                band_counts = {
                    r.band: r.n
                    for r in rebanded.groupBy("band")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
                assert band_counts.get("tail", 0) == 0, band_counts
                plant_bands = {
                    r.band
                    for r in _text_ops.unigram_bands_against_lm(
                        spark, lmx,
                        gen.filter(F.col("doc_id") % 20 == 17).select(
                            "doc_id", "text"
                        ),
                    ).select("band").distinct().collect()
                }
                assert plant_bands == {"tail"}, plant_bands
            n_missed = out_rows - (
                total - n_planted - n_contam - n_offt - n_band
            )
            assert 0 <= n_missed <= max(1, n_planted // 100), (
                out_rows, total, n_planted, n_missed
            )
            scratch = os.path.join(td, "mh_scratch")
            dedup.save_minhash_index(store, scratch)
            root = dedup._mh_root(idx)  # CURRENT generation (post-compact)
            for sub in ("/signatures", "/bands"):
                inc = spark.read.parquet(root + sub).drop("ingest_key")
                fs = spark.read.parquet(scratch + sub).drop("ingest_key")
                d1 = inc.exceptAll(fs).count()
                d2 = fs.exceptAll(inc).count()
                assert d1 == 0 and d2 == 0, (sub, d1, d2)
            extra = {
                "mode": args.mode,
                "n_planted_neardups": n_planted,
                "n_lsh_recall_misses": n_missed,
                "store_has_no_neardups": True,
                "index_equals_scratch_build": True,
            }
            if args.mode in ("hygiene", "full"):
                extra["n_planted_contaminated"] = n_contam
                extra["contaminated_in_store"] = 0
            if args.mode == "full":
                extra["n_planted_offtarget"] = n_offt
                extra["offtarget_in_store"] = 0
                extra["dsir_threshold"] = round(thr, 4)
                extra["n_planted_band_violations"] = n_band
                extra["band_violations_in_store"] = 0
                extra["store_band_counts"] = band_counts
            if args.cc_labels:
                # the maintained labeling's soak invariants (the exact
                # == full-recompute claim is unit-tested and gate-
                # checked; here we assert consistency at volume):
                # (1) resolution is unique per node; (2) the labeling
                # is a valid star forest (every component id labels
                # itself); (3) every DROPPED plant is co-labeled with
                # its base — the pair that killed it is in the store
                lab = dedup.read_cc_labels(spark, ccx).localCheckpoint(
                    eager=True
                )
                n_nodes = lab.count()
                assert lab.select("node").distinct().count() == n_nodes
                roots = lab.select(
                    F.col("component").alias("node")
                ).distinct()
                bad_roots = roots.join(
                    lab.filter(F.col("node") == F.col("component")),
                    "node",
                    "left_anti",
                ).count()
                assert bad_roots == 0, bad_roots
                dropped = (
                    gen.filter("planted")
                    .select("doc_id")
                    .join(store.select("doc_id"), "doc_id", "left_anti")
                )
                pl = lab.select(
                    F.col("node").alias("doc_id"),
                    F.col("component").alias("_cp"),
                )
                bl = lab.select(
                    (F.col("node") + dpf).alias("doc_id"),
                    F.col("component").alias("_cb"),
                )
                mis = (
                    dropped.join(pl, "doc_id", "left")
                    .join(bl, "doc_id", "left")
                    .filter(
                        F.col("_cp").isNull()
                        | F.col("_cb").isNull()
                        | (F.col("_cp") != F.col("_cb"))
                    )
                    .count()
                )
                assert mis == 0, f"{mis} dropped plants not co-labeled"
                extra["cc_labels_nodes"] = n_nodes
                extra["cc_labels_components"] = lab.select(
                    "component"
                ).distinct().count()
                extra["cc_labels_dropped_plants_colabeled"] = True
            if args.maintenance_every:
                import glob as _glob

                extra["maintenance_every"] = args.maintenance_every
                extra["final_generation"] = os.path.basename(root)
                extra["band_files_current_gen"] = len(
                    _glob.glob(root + "/bands/*/*/*.parquet")
                )
                extra["ingest_keys_current_gen"] = (
                    spark.read.parquet(root + "/signatures")
                    .select("ingest_key").distinct().count()
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
                    **extra,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
