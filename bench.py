"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE compact JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {the
20 r01-shared medians}, "sf": ..., "calib_scan_s": ...}`` — kept under
the driver's 2 KB stdout tail capture (the r13 full line grew to
~3.6 KB and the round's official record came back unparseable). The
FULL artifact — all ~39 query medians+mins, stream/warm arms, errors —
is written to ``BENCH_DETAIL.json`` beside this file every run.

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
import sys
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
    # the end-to-end pre-training corpus composition (dedup → quality
    # → split → decontaminate → mixture → shard): tracks the integrated
    # pipeline cost round-over-round, not just its stages
    "corpus_pipeline_stats",
    "session_window_batch",
    "hll_distinct_rollup",
    "psi_value_drift",
    "m4_downsample",
    # round-8 additions: the C4-style boilerplate-removal TRANSFORM
    # (census + flag join + in-order reassembly — three O(segments)
    # shuffles) and the composed Gopher quality filter (pure
    # single-pass column expressions — the cheap end of the family,
    # benched to keep it cheap)
    "segment_dedup_text",
    "gopher_filter_counts",
    # round-8 additions, second wave: unigram-LM quality scoring (two
    # O(tokens) shuffles + a vocabulary join) and exact-substring
    # duplication coverage (md5-keyed 20-gram census + interval fold)
    "unigram_lm_scores",
    "duplicate_ngram_coverage_fast",
    # round-9 additions: the exact-recall simhash twin (explode +
    # 60-vote groupBy fingerprint, segment-blocked pair join), the
    # iterated BPE driver (k bounded vocabulary-shuffle rounds), and
    # the CCNet band pair (persisted-LM probe + deterministic
    # stratified admission)
    "simhash_near_dup_exact",
    "bpe_merges_k5",
    "unigram_lm_band_assign",
    "band_stratified_admission",
    # round-8, third wave: the persisted-decontamination-index probe
    # (save a benchmark 8-gram store + O(batch) membership probe —
    # the index-maintenance cost and the probe cost ride one number;
    # xxhash64 keys, the 100 TB default, unlike the string-keyed gate
    # twin)
    "decontam_probe_bench",
    # round-8, fourth wave: DSIR target selection against a persisted
    # scorer (fit-once store write + per-batch broadcast-join scoring
    # — hashed-ngram featurize, count join, partial-agg sum; the
    # fit + probe lifecycle rides one number like decontam's)
    "dsir_probe_index",
    # round-11 additions: per-benchmark contamination attribution
    # (string-keyed gram join, the operational view the r10 verdict
    # flagged as gated-but-unbenched), the BPE encode half (fit +
    # persist + map-only fold tokenization — the full tokenizer
    # lifecycle rides one number), and the release-audit composite
    # (exact-dup + quality + attribution + simhash near-dup stitched
    # per doc — the artifact a release review reads)
    "contamination_attribution",
    "bpe_encode_k5",
    "release_audit",
    # round-12 additions: the bounded release-audit read (counts per
    # drop_reason + per-benchmark breakdown — the artifact a review
    # pages through where the per-doc audit is corpus-sized) and the
    # encoded-corpus token-length histogram (the vocab-review
    # diagnostic, gated this round) — benched on registration so no
    # gated operator ships unbenched
    "release_audit_summary",
    "bpe_token_length_hist",
    # round-12, second wave: the hashed-ngram quality classifier
    # (centered full-batch GD fit + map-side scoring + the bounded
    # confusion read — the distill-the-expensive-judge filter; the
    # fit-and-score lifecycle rides one number like bpe_encode_k5's).
    # NOT cluster_quality_reps: its 0.9-Jaccard pair list is
    # quadratic on this synthetic corpus at sf0.1 — the same
    # output-not-engine reason set_similarity_pairs is excluded; it
    # stays oracle-gated at sf0.01.
    "quality_classifier_eval",
    # round-13 addition: the token-budgeted persisted-tokenizer
    # mixture (BPE k=5 fit + encode + token-mass quotas + cumulative
    # prefix fill — the full lifecycle rides one number like
    # bpe_encode_k5's). NOT split_leakage_stats / cluster_aware_split /
    # cluster_split_leakage / corpus_pipeline_tokens: all consume the
    # exact-Jaccard pair list, quadratic on this synthetic corpus at
    # sf0.1 (the set_similarity_pairs exclusion reason); they stay
    # oracle-gated at sf0.01, and the streaming/cluster machinery they
    # compose is benched via its own tracks.
    "temperature_mixture_tokens",
]


def bench_streaming(
    spark, rows_per_batch: int = 20_000, n_batches: int = 8
) -> dict[str, float]:
    """End-to-end Structured Streaming ingest throughput: the
    rate-micro-batch synthetic sensor feed driving the FULL medallion
    body per micro-batch (F6 gate → bronze partition write → silver
    merge → gold day recompute), the north-star ingest path.

    Reports sustained rows/s over the measured batches (warmup batch
    excluded — it pays foreachBatch codegen) and the median micro-batch
    latency from the engine's own progress metrics
    (durationMs.triggerExecution covers source admission through sink
    commit).

    Metric-honesty note: the batch body persists the source frame, so
    ``numInputRows`` counts each row ONCE. Before that persist landed,
    the gate count and the bronze write each re-read the source and the
    metric double-counted input (40k reported for a 20k batch) —
    pre-persist rows/s figures are inflated ~2× and not comparable."""
    import statistics
    import tempfile

    from sensor_data_pipeline___spark.sources.connectors import (
        synthetic_sensor_stream,
    )
    from sensor_data_pipeline___spark.streaming import pipeline as sp
    from sensor_data_pipeline___spark.warehouse import Warehouse

    with tempfile.TemporaryDirectory() as td:
        wh = Warehouse(spark, os.path.join(td, "wh"))
        feed = synthetic_sensor_stream(spark, rows_per_batch=rows_per_batch)
        q = sp.ingest_stream(
            spark,
            None,
            wh,
            os.path.join(td, "ckpt"),
            lines=feed,
            trigger={"processingTime": "0 seconds"},
        )
        deadline = time.time() + 180
        try:
            while time.time() < deadline:
                lp = q.lastProgress
                # batchId is 0-based; +1 warmup batch excluded below
                if lp is not None and lp["batchId"] >= n_batches:
                    break
                if not q.isActive:
                    raise RuntimeError(f"ingest stream died: {q.exception()}")
                time.sleep(0.25)
        finally:
            q.stop()
            q.awaitTermination(60)
        done = [
            p
            for p in q.recentProgress
            if p["numInputRows"] > 0 and p["batchId"] >= 1
        ]
        if not done:
            raise RuntimeError("no measured micro-batches")
        total_rows = sum(p["numInputRows"] for p in done)
        exec_ms = [p["durationMs"]["triggerExecution"] for p in done]
        return {
            "streaming_ingest_rows_per_s": round(
                total_rows / (sum(exec_ms) / 1000.0), 1
            ),
            "streaming_batch_latency_ms_p50": round(
                statistics.median(exec_ms), 1
            ),
            "streaming_batches_measured": len(done),
        }


def bench_corpus_ingest(
    spark,
    docs_per_file: int = 10_000,
    n_files: int = 8,
    tokenizer_vocab_path: "str | None" = None,
    key_prefix: str = "corpus_ingest",
    classifier_path: "str | None" = None,
) -> dict[str, float]:
    """Streaming corpus ingest throughput (VERDICT r5 directive #5):
    the ``corpus_ingest_stream`` path — JSONL drop → quality gate →
    content-hash ``dropDuplicatesWithinWatermark`` → parquet clean
    store — measured batch-by-batch the same way as the sensor
    medallion (``bench_streaming``).

    The drop is a deterministic synthetic corpus (every doc passes the
    gate; content made unique by an id token so dedup state is
    exercised at full cardinality, the worst case for the state
    store). ``maxFilesPerTrigger=1`` slices it into ``n_files``
    micro-batches under one availableNow run; rows/s is input rows
    over triggerExecution time with the warmup batch (batchId 0, which
    pays sink/state init) excluded."""
    import statistics
    import tempfile

    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.streaming import pipeline as sp

    with tempfile.TemporaryDirectory() as td:
        drop = os.path.join(td, "drop")
        total = docs_per_file * n_files
        # ~30 tokens/doc, unique id token -> unique content_md5 per doc
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
            .repartition(n_files)
            .write.json(drop)
        )
        q = sp.corpus_ingest_stream(
            spark,
            drop,
            os.path.join(td, "out"),
            os.path.join(td, "ckpt"),
            max_files_per_trigger=1,
            tokenizer_vocab_path=tokenizer_vocab_path,
            classifier_path=classifier_path,
            # threshold 0 admits everything: the arm measures the
            # stateless scoring enrichment's cost, not admission change
            min_quality_score=0.0,
        )
        q.awaitTermination(300)
        done = [
            p
            for p in q.recentProgress
            if p["numInputRows"] > 0 and p["batchId"] >= 1
        ]
        if len(done) < 2:
            raise RuntimeError(
                f"need >=2 measured corpus batches, got {len(done)}"
            )
        rows = sum(p["numInputRows"] for p in done)
        exec_ms = [p["durationMs"]["triggerExecution"] for p in done]
        return {
            f"{key_prefix}_rows_per_s": round(
                rows / (sum(exec_ms) / 1000.0), 1
            ),
            f"{key_prefix}_batch_latency_ms_p50": round(
                statistics.median(exec_ms), 1
            ),
            f"{key_prefix}_batches_measured": len(done),
        }


def bench_corpus_ingest_tokenized(spark, sf_dir: str) -> dict[str, float]:
    """The tokenize-at-ingest arm of :func:`bench_corpus_ingest`
    (VERDICT r11 directive #5): the SAME synthetic drop and stream,
    plus a persisted k=5 BPE vocabulary composed in as the
    ``n_tokens_bpe`` enrichment — so the composition's cost is a
    tracked number (``corpus_ingest_tok_rows_per_s`` vs the base
    track) instead of an inference. The vocabulary is fit on the
    sf documents (real text) outside the measured window."""
    import tempfile

    from sensor_data_pipeline___spark.operators.text import save_bpe_vocab
    from sensor_data_pipeline___spark.sources import readers

    with tempfile.TemporaryDirectory() as td:
        vocab = os.path.join(td, "vocab")
        save_bpe_vocab(
            readers.table(spark, "documents", sf_dir), vocab, k=5
        )
        return bench_corpus_ingest(
            spark,
            tokenizer_vocab_path=vocab,
            key_prefix="corpus_ingest_tok",
        )


def bench_corpus_ingest_tokenized_k32768(spark) -> dict[str, float]:
    """The PRODUCTION-k tokenize-at-ingest arm (VERDICT r12 directive
    #6): same drop and stream as the k=5 arm, but the persisted store
    holds a 32,768-merge vocabulary, which flips the streaming
    enrichment onto the k-flat rank-dict Arrow pass
    (``operators/text.py:stamp_bpe_token_count`` dispatch — the
    inline JVM fold chain the k=5 arm uses is plan-linear in k and
    prohibitive here). The merge list is the well-formed prefix-chain
    construction over the stream's OWN vocabulary
    (``scripts/bpe_encode_scale_check.py --synthetic-ks`` harness:
    every merge's left operand is produced by a strictly earlier
    merge, and the merges FIRE on the streamed words — uid-prefix
    chains collapse most of each doc's id token — so this is a
    heavy-merge load, not a no-op sweep; learning 32k merges is a
    week of shuffles and encode behavior doesn't need it). Store
    built outside the measured window."""
    import tempfile

    from sensor_data_pipeline___spark.operators._local import local_df

    # the drop's exact word population (see bench_corpus_ingest):
    # 29 shared tok words + one uid<N> token per doc
    words = [f"tok{i}" for i in range(29)] + [
        f"uid{n}" for n in range(10_000 * 8)
    ]
    k = 32_768
    seen: set = set()
    merges: list = []
    for w in words:
        for i in range(1, len(w)):
            p = (w[:i], w[i])
            if p not in seen:
                seen.add(p)
                merges.append(p)
        if len(merges) >= k:
            break
    if len(merges) < k:
        raise RuntimeError(
            f"only {len(merges)} chain merges available < k={k}"
        )
    with tempfile.TemporaryDirectory() as td:
        vocab = os.path.join(td, "vocab_k32768")
        rows = [
            (rank, left, right, 0)
            for rank, (left, right) in enumerate(merges[:k], start=1)
        ]
        local_df(
            spark,
            rows,
            "merge_rank int, left string, right string, n long",
        ).coalesce(1).write.mode("overwrite").parquet(vocab + "/merges")
        return bench_corpus_ingest(
            spark,
            tokenizer_vocab_path=vocab,
            key_prefix="corpus_ingest_tok_k32768",
        )


def bench_corpus_ingest_classified(spark, sf_dir: str) -> dict[str, float]:
    """The learned-quality-gate arm of :func:`bench_corpus_ingest`
    (r13): same drop and stream, plus a persisted classifier composed
    in as the admission gate ahead of the dedup state
    (``classifier_path`` → ``classifier_score_expr``, the zero-
    exchange array-literal projection). Threshold 0 so every row is
    still admitted — the arm prices the scoring enrichment itself
    against the base track, the same isolation the k=5 tokenizer arm
    gives the tokenize enrichment. Store fit on the sf documents
    outside the measured window."""
    import tempfile

    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import classifier as C
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", sf_dir)
    labels = docs.select(
        "doc_id",
        F.when(F.col("n_chars") >= 150, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("label"),
    )
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "clf")
        # xxhash64 buckets: the production posture for the hot ingest
        # gate (measured ~1.6x faster per token than the md5 the
        # oracle-gated queries use; the store meta records the kind so
        # fit and score can never mismatch)
        C.save_classifier(docs, labels, path, hash_kind="xxhash64")
        return bench_corpus_ingest(
            spark,
            classifier_path=path,
            key_prefix="corpus_ingest_clf",
        )


def bench_classifier_score_warm(spark, sf_dir: str) -> dict[str, float]:
    """Warm (fit-excluded) classifier scoring throughput (VERDICT r12
    directive #4): the headline ``quality_classifier_eval`` number
    carries the 8-iteration GD fit lifecycle every call; THIS is the
    number that predicts the streaming ingest-gate cost — store
    pre-built via ``save_classifier`` outside the window, measure the
    zero-exchange array-literal scoring expression
    (``classifier_score_expr``) over the sf documents (3 reps, min —
    the ``bpe_encode_warm`` precedent). The aggregate sink forces
    per-row evaluation without billing row transfer."""
    import tempfile

    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import classifier as C
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", sf_dir)
    n_rows = docs.count()
    labels = docs.select(
        "doc_id",
        F.when(F.col("n_chars") >= 150, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("label"),
    )
    out = {}
    with tempfile.TemporaryDirectory() as td:
        for key, kind in (
            ("classifier_score_warm", "md5"),  # the oracle-gated kind
            # the r13 streaming-gate knob (~1.6x on the fold)
            ("classifier_score_warm_xx", "xxhash64"),
        ):
            path = os.path.join(td, f"clf_{kind}")
            C.save_classifier(docs, labels, path, hash_kind=kind)
            expr = C.classifier_score_expr(spark, path)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                docs.select(expr.alias("s")).agg(
                    F.count("*").alias("n"), F.sum("s").alias("tot")
                ).collect()
                times.append(time.perf_counter() - t0)
            best = min(times)
            out[f"{key}_s"] = round(best, 3)
            out[f"{key}_rows_per_s"] = round(n_rows / best, 1)
    return out


def bench_bpe_encode_warm(spark, sf_dir: str) -> dict[str, float]:
    """Warm-encode throughput (VERDICT r11 directive #4): the
    ``bpe_encode_k5`` headline number is the full lifecycle (fit +
    persist + encode); THIS isolates the steady-state cost a serving
    tokenizer actually pays — store pre-built outside the window,
    measure ``encode_against_vocab`` alone (3 reps, min). The map-only
    claim gets its own tracked figure."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators.text import (
        encode_against_vocab,
        save_bpe_vocab,
    )
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", sf_dir)
    n_rows = docs.count()
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "vocab")
        save_bpe_vocab(docs, path, k=5)
        out = {}
        for key, kwargs in (
            ("bpe_encode_warm", {}),  # auto: the map-only inline plan
            # the r12 large-k path (distinct-word Arrow encode + join
            # back) — k-independent, tracked alongside the inline arm
            ("bpe_encode_warm_wc", {"strategy": "word_cache"}),
        ):
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                encode_against_vocab(spark, path, docs, **kwargs).agg(
                    F.count("*").alias("n"),
                    F.sum("n_tokens").alias("tok"),
                ).collect()
                times.append(time.perf_counter() - t0)
            best = min(times)
            out[f"{key}_s"] = round(best, 3)
            out[f"{key}_rows_per_s"] = round(n_rows / best, 1)
        return out


def bench_corpus_neardup_ingest(
    spark,
    docs_per_file: int = 2_000,
    n_files: int = 5,
    key_prefix: str = "corpus_neardup",
    **stream_kwargs,
) -> dict[str, float]:
    """Near-dup-aware streaming corpus ingest (round 8): the
    ``corpus_ingest_stream_neardup`` probe→drop→append loop against a
    cold-start persisted minhash index — per batch: sign once, probe
    the store (self-key excluded), drop batch-internal near-dups,
    append survivors effectively-once, land the batch-keyed clean
    store. Smaller volume than the exact-dedup bench because every
    batch pays the fixed probe/append job set on top of signing; the
    per-batch latency is the figure to watch round-over-round (the
    corpus-linear band-scan term is characterized in SCALING.md's
    80-batch soak instead).

    A small throwaway ingest (2×200 docs against its own scratch
    store) runs FIRST: the r14 official reading (110 rows/s vs a warm
    steady state of ~200, adjudicated in SCALING.md r15) showed the
    arm's first execution in a JVM pays the streaming probe path's
    codegen+JIT ramp uniformly across its batches — the batchId>=1
    guard absorbs store cold-start but not JIT. The measured run
    should record steady-state throughput, same reason the per-query
    track treats its first interleaved pass as warmup."""
    import statistics
    import tempfile

    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.streaming import pipeline as sp

    def _run_ingest(td: str, docs_per_file: int, n_files: int):
        drop = os.path.join(td, "drop")
        total = docs_per_file * n_files
        # distinct-vocabulary docs (the near-dup path actually hashes
        # shingles; the exact bench's shared-token text would make
        # every doc a near-dup of every other)
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(50_000)).cast(
                    "string"
                ),
            ),
        )
        (
            spark.range(total)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", toks).alias("text"),
                F.lit("en").alias("lang"),
                F.lit("bench").alias("source"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.col("id") % 3600
                ).alias("fetched_at"),
            )
            .repartition(n_files)
            .write.json(drop)
        )
        idx = os.path.join(td, "mh_index")
        dedup.save_minhash_index(
            spark.createDataFrame([], "doc_id long, text string"), idx
        )
        q = sp.corpus_ingest_stream_neardup(
            spark,
            drop,
            os.path.join(td, "out"),
            os.path.join(td, "ckpt"),
            idx,
            max_files_per_trigger=1,
            **stream_kwargs,
        )
        q.awaitTermination(300)
        done = [
            p
            for p in q.recentProgress
            if p["numInputRows"] > 0 and p["batchId"] >= 1
        ]
        rows = sum(p["numInputRows"] for p in done)
        exec_ms = [p["durationMs"]["triggerExecution"] for p in done]
        return rows, exec_ms, len(done)

    with tempfile.TemporaryDirectory() as warm_td:
        _run_ingest(warm_td, 200, 2)  # JIT/codegen warmup, discarded
    with tempfile.TemporaryDirectory() as td:
        rows, exec_ms, n_done = _run_ingest(td, docs_per_file, n_files)
        if n_done < 2:
            raise RuntimeError(
                f"need >=2 measured neardup batches, got {n_done}"
            )
        return {
            f"{key_prefix}_rows_per_s": round(
                rows / (sum(exec_ms) / 1000.0), 1
            ),
            f"{key_prefix}_batch_latency_ms_p50": round(
                statistics.median(exec_ms), 1
            ),
            f"{key_prefix}_batches_measured": n_done,
        }


def bench_corpus_dsir_ingest(spark, sf_dir: str) -> dict[str, float]:
    """The DSIR-gated arm of :func:`bench_corpus_neardup_ingest`
    (VERDICT r14 directive #4): same drop and near-dup loop, plus a
    persisted DSIR importance-weight store composed in as the
    admission gate (``dsir_index_path`` → per-batch
    ``dsir_weights_against_index`` scoring + avg-log-weight
    threshold). Threshold at -1e18 admits every row — the arm prices
    the scoring enrichment itself against the base neardup track, the
    same isolation ``corpus_ingest_clf`` gives the classifier gate.
    Store fit on the sf documents outside the measured window with
    ``hash_kind='xxhash64'`` — the production posture for the hot
    ingest gate (the r14 store knob: ~2.25x fit / ~1.45x probe vs the
    md5 the oracle-gated queries use; the store meta records the kind
    so fit and probe can never mismatch)."""
    import tempfile

    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dsir
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", sf_dir)
    target = docs.filter(F.col("n_chars") >= 150)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "dsir")
        dsir.save_dsir_index(target, docs, path, hash_kind="xxhash64")
        return bench_corpus_neardup_ingest(
            spark,
            key_prefix="corpus_ingest_dsir",
            dsir_index_path=path,
            dsir_min_avg_weight=-1e18,
        )


def bench_export(spark, sf_dir: str, n_shards: int = 16) -> dict[str, float]:
    """Training-export write path: shard-assign + one-file-per-shard
    write of the documents table (operators/export.py:write_shards),
    reported as rows/s — the materialization throughput a trainer
    handoff pays, tracked round-over-round like the query timings."""
    import shutil
    import tempfile

    from sensor_data_pipeline___spark.operators.export import write_shards

    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.count()
    td = tempfile.mkdtemp(prefix="bench_shards_")
    try:
        best = None
        for _ in range(2):
            start = time.perf_counter()
            write_shards(docs, os.path.join(td, "out"), "doc_id", n_shards)
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
        # The documents table is 5k rows at sf0.1, so the legacy
        # number above is FIXED-OVERHEAD-dominated (a plain 5k-row
        # parquet write takes the same ~0.5-1 s as the full shard
        # path) and swings ~2x with sub-second scheduler/JIT noise —
        # the r8 "-35%" watch item adjudicated in SCALING.md (r9). It
        # stays for round-over-round comparability; the 60x-inflated
        # variant below is volume-dominated and is the actual write-
        # throughput guard rail.
        big = docs.withColumn(
            "_r", F.explode(F.sequence(F.lit(1), F.lit(60)))
        ).withColumn(
            "doc_id", F.col("doc_id") * 100 + F.col("_r")
        ).drop("_r")
        nb = n * 60
        best_big = None
        for _ in range(2):
            start = time.perf_counter()
            write_shards(big, os.path.join(td, "out_big"), "doc_id", n_shards)
            elapsed = time.perf_counter() - start
            best_big = elapsed if best_big is None else min(best_big, elapsed)
        return {
            "export_shard_write_rows_per_s": round(n / best, 1),
            "export_shard_write_rows_per_s_300k": round(nb / best_big, 1),
        }
    finally:
        shutil.rmtree(td, ignore_errors=True)


#: The 20 queries shared with the round-1 driver baseline
#: (BENCH_r01.json). These are the round-over-round comparison set the
#: judge grades against the 2x bar, so their medians ride the compact
#: stdout headline line; everything else lives in BENCH_DETAIL.json.
R01_SHARED_QUERIES = [
    "dedup_exact",
    "gapfill_forward_fill",
    "gold_daily_power",
    "hll_distinct_rollup",
    "m4_downsample",
    "mad_outliers",
    "minhash_near_dup",
    "pack_sequences",
    "psi_value_drift",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "rollup_lineitem",
    "serving_union",
    "session_window_batch",
    "silver_parse",
    "similarity_topk",
    "text_quality",
    "tfidf_top_terms",
    "window_topk_orders",
]


def calib_scan(spark, sf_dir: str, reps: int = 3) -> float:
    """Fixed host-speed calibration anchor (VERDICT r13 directive #5):
    count+sum over a pinned full lineitem scan — pure scan+partial-agg,
    no shuffle of consequence, unchanged across rounds — so
    round-over-round per-query deltas can be reported noise-normalized
    (three r13-era runs of the same code disagreed ±50% uniformly with
    host load; medians+load_avg made that diagnosable but not
    normalizable). Min-of-reps: the noise-robust estimator for a fixed
    workload on a shared host."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        df.agg(
            F.count("*").alias("n"),
            F.sum("l_extendedprice").alias("tot"),
        ).collect()
        elapsed = time.perf_counter() - t0
        best = elapsed if best is None else min(best, elapsed)
    return round(best, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_at_start = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark("bench")

    def materialize(df) -> None:
        try:
            df.toPandas()  # Arrow batches; see module docstring
        except Exception as exc:  # noqa: BLE001
            # the fallback changes WHAT is measured (per-row Row
            # construction vs Arrow batches) — never fall back silently
            print(
                f"bench: Arrow materialization failed "
                f"({type(exc).__name__}); falling back to collect()",
                file=sys.stderr,
            )
            df.collect()

    # warmup: JVM + codegen + parquet footer caches
    try:
        materialize(QUERIES["in_list_filter"](spark, sf_dir))
    except Exception:
        pass

    # calibration anchor, taken warm (post-JVM-warmup) and again at
    # the very end so drift DURING the run is also visible
    try:
        calib_start = calib_scan(spark, sf_dir)
    except Exception:  # noqa: BLE001 — the anchor must never kill the bench
        calib_start = None

    # best-of-3 per query: this host's timings swing up to 3x run-to-
    # run (shared VM); the minimum is the standard noise-robust
    # estimator of the query's true cost. The repetitions are
    # INTERLEAVED (full passes over all queries) so a multi-second
    # noise burst degrades one rep of several queries instead of every
    # rep of one; the first pass doubles as per-query warmup. One broken query must NOT zero the
    # whole artifact (the BENCH_r02 failure mode): failures are
    # recorded per-query and the JSON line is emitted regardless.
    samples: dict[str, list[float]] = {}
    errors: dict[str, str] = {}

    def run_one(name: str) -> None:
        try:
            start = time.perf_counter()
            materialize(QUERIES[name](spark, sf_dir))
            elapsed = time.perf_counter() - start
        except Exception as exc:  # noqa: BLE001 — record, keep going
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            samples.pop(name, None)
            return
        samples.setdefault(name, []).append(elapsed)

    for _rep in range(3):
        for name in BENCH_QUERIES:
            if name not in errors:
                run_one(name)
    # VERDICT r5 directive #3: sub-second queries whose run-to-run
    # swing exceeds 50% get a 4th rep — on this host their minimum is
    # the statistic most exposed to a single noise burst (the
    # session_window_batch r5 false alarm), and one extra sample
    # measurably tightens it at negligible cost
    for name, s in list(samples.items()):
        if name not in errors and min(s) < 1.0 and (max(s) - min(s)) > 0.5 * min(s):
            run_one(name)
    # VERDICT r12 directive #5: after two consecutive rounds spent
    # adjudicating uniform host drift against the min-of-3 statistic,
    # the MEDIAN is the headline per-query figure (robust to the
    # one-rep noise burst AND less exposed to the lucky-minimum that
    # made cross-round deltas ambiguous); the minimum stays in the
    # artifact as ``queries_min`` for continuity with r01–r12
    import statistics

    timings = {
        name: round(statistics.median(s), 3) for name, s in samples.items()
    }
    timings_min = {
        name: round(min(s), 3) for name, s in samples.items()
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # ``result`` is the FULL artifact — every query median+min, all
    # stream/warm arms, errors — written to BENCH_DETAIL.json. Stdout
    # gets a separate compact headline line (built at the end): the
    # r13 full line grew to ~3.6 KB and outgrew the driver's 2 KB tail
    # capture, so BENCH_r13.json came back parsed:null and the round's
    # official perf record was lost (VERDICT r13 directive #1).
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "per_query_stat": "median_of_3",
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
        # host-contention guard rail (VERDICT r8 directive #8): the
        # driver bench has followed a load spike every round, and
        # round-over-round judgments kept needing a manual quiet-host
        # A/B — the 1/5/15-minute load averages at bench start and
        # after the batch passes make the contention visible in the
        # artifact itself
        "load_avg_start": load_at_start,
        "load_avg_after_batch": [round(x, 2) for x in os.getloadavg()],
    }
    # streaming ingest throughput (VERDICT r4 directive #3) — tracked
    # round-over-round alongside the batch timings; a failure here must
    # not zero the batch artifact
    try:
        result.update(bench_streaming(spark))
    except Exception as exc:  # noqa: BLE001 — record, keep going
        errors["streaming_ingest"] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        result.update(bench_corpus_ingest(spark))
    except Exception as exc:  # noqa: BLE001 — record, keep going
        errors["corpus_ingest"] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        result.update(bench_corpus_ingest_tokenized(spark, sf_dir))
    except Exception as exc:  # noqa: BLE001 — record, keep going
        errors["corpus_ingest_tok"] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        result.update(bench_corpus_ingest_tokenized_k32768(spark))
    except Exception as exc:  # noqa: BLE001 — record, keep going
        errors["corpus_ingest_tok_k32768"] = (
            f"{type(exc).__name__}: {exc}"[:300]
        )
    try:
        result.update(bench_classifier_score_warm(spark, sf_dir))
    except Exception as exc:  # noqa: BLE001 — record, keep going
        errors["classifier_score_warm"] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        result.update(bench_corpus_ingest_classified(spark, sf_dir))
    except Exception as exc:  # noqa: BLE001 — record, keep going
        errors["corpus_ingest_clf"] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        result.update(bench_bpe_encode_warm(spark, sf_dir))
    except Exception as exc:  # noqa: BLE001 — record, keep going
        errors["bpe_encode_warm"] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        result.update(bench_corpus_neardup_ingest(spark))
    except Exception as exc:  # noqa: BLE001 — record, keep going
        errors["corpus_neardup_ingest"] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        result.update(bench_corpus_dsir_ingest(spark, sf_dir))
    except Exception as exc:  # noqa: BLE001 — record, keep going
        errors["corpus_ingest_dsir"] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        result.update(bench_export(spark, sf_dir))
    except Exception as exc:  # noqa: BLE001 — record, keep going
        errors["export_shard_write"] = f"{type(exc).__name__}: {exc}"[:300]
    if errors:
        result["errors"] = errors
    try:
        calib_end = calib_scan(spark, sf_dir)
    except Exception:  # noqa: BLE001
        calib_end = None
    result["calib_scan_s_start"] = calib_start
    result["calib_scan_s_end"] = calib_end
    calib_vals = [c for c in (calib_start, calib_end) if c is not None]
    # min of the two samples = the host's best observed fixed-workload
    # speed this run; SCALING.md drift adjudications divide per-query
    # deltas by the cross-round ratio of this anchor
    result["calib_scan_s"] = min(calib_vals) if calib_vals else None

    # full artifact → sidecar (git-tracked, committed per round).
    # Ad-hoc runs at a DIFFERENT sf must not clobber the committed
    # official per-round sf0.1 record in the working tree (advisor
    # r14): when the existing sidecar's sf differs, divert to an
    # sf-suffixed filename instead. SPARK_GRAFT_BENCH_DETAIL
    # overrides the path outright.
    env_path = os.environ.get("SPARK_GRAFT_BENCH_DETAIL")
    detail_path = env_path or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    if env_path is None:  # an explicit override is honored verbatim
        try:
            with open(detail_path) as fh:
                prior_sf = json.load(fh).get("sf")
        except (OSError, ValueError):
            prior_sf = None
        if prior_sf is not None and prior_sf != result["sf"]:
            root, ext = os.path.splitext(detail_path)
            detail_path = f"{root}.sf{result['sf']}{ext}"
    try:
        with open(detail_path, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError as exc:
        print(f"bench: could not write {detail_path}: {exc}", file=sys.stderr)

    # compact headline → the ONE stdout JSON line the driver captures.
    # Contents: totals, the 20 r01-shared query medians (the judge's
    # 2x-bar comparison set), load averages, the calibration anchor,
    # and a pointer to the detail sidecar. Everything else is in the
    # sidecar; the line stays well under the driver's 2 KB tail.
    headline = {
        "metric": "headline_queries_total",
        "value": result["value"],
        "unit": "sec",
        "sf": result["sf"],
        "per_query_stat": "median_of_3",
        "n_queries": len(timings),
        "queries": {
            q: timings[q] for q in R01_SHARED_QUERIES if q in timings
        },
        "shared20_total": round(
            sum(timings[q] for q in R01_SHARED_QUERIES if q in timings), 3
        ),
        "shared20_total_min": round(
            sum(
                timings_min[q]
                for q in R01_SHARED_QUERIES
                if q in timings_min
            ),
            3,
        ),
        "calib_scan_s": result["calib_scan_s"],
        "load_avg_start": load_at_start,
        "load_avg_end": [round(x, 2) for x in os.getloadavg()],
        "n_errors": len(errors),
        "detail_file": os.path.basename(detail_path),
    }
    line = json.dumps(headline)
    if len(line) > 1800:  # hard guard: never outgrow the tail again
        headline["queries"] = {}
        headline["queries_dropped"] = "headline_line_overflow"
        line = json.dumps(headline)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
