"""Sustained multi-batch streaming soak (SCALING.md "Streaming soak"):
the rate-micro-batch synthetic feed driven for 20+ micro-batches.

Two claims measured, not asserted from theory:

1. **ingest_stream end-to-end under sustained load** — every batch
   lands in bronze exactly once (deterministic ids stay distinct
   across the whole run) and the incremental silver/gold pipeline
   keeps up batch-over-batch.
2. **dedup_stream state is BOUNDED by the watermark** — the
   dropDuplicatesWithinWatermark state store plateaus at the
   duplicate-arrival horizon instead of growing with total rows
   processed (the difference between a demo and a 100 TB deployment).
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
import pytest

from sensor_data_pipeline___spark.sources.connectors import (
    synthetic_sensor_stream,
)
from sensor_data_pipeline___spark.streaming import pipeline as sp
from sensor_data_pipeline___spark.warehouse import BRONZE, GOLD, SILVER, Warehouse

MIN_BATCHES = 20


def _run_until_batches(q, n_batches: int, timeout_s: float = 300.0) -> None:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        lp = q.lastProgress
        if lp is not None and lp["batchId"] >= n_batches:
            break
        if not q.isActive:
            raise AssertionError(f"query died early: {q.exception()}")
        time.sleep(0.5)
    else:
        raise AssertionError(
            f"did not reach {n_batches} batches in {timeout_s}s "
            f"(last: {q.lastProgress and q.lastProgress['batchId']})"
        )
    q.stop()
    q.awaitTermination(60)


def test_soak_ingest_stream_rate_feed(spark, tmp_path):
    rows_per_batch = 100
    feed = synthetic_sensor_stream(spark, rows_per_batch=rows_per_batch)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    q = sp.ingest_stream(
        spark,
        None,
        wh,
        str(tmp_path / "ckpt"),
        lines=feed,
        trigger={"processingTime": "0 seconds"},
    )
    _run_until_batches(q, MIN_BATCHES + 1)

    bronze = wh.read(BRONZE)
    n_bronze = bronze.count()
    # ≥20 full batches landed, each exactly once, whole batches only
    assert n_bronze >= MIN_BATCHES * rows_per_batch
    assert n_bronze % rows_per_batch == 0
    # effectively-once: the deterministic surrogate ids never collide
    assert bronze.select("id").distinct().count() == n_bronze
    # the incremental pipeline kept up: silver trails bronze by at most
    # the batches in flight when the query was stopped
    n_silver = wh.read(SILVER).count()
    assert n_bronze - 2 * rows_per_batch <= n_silver <= n_bronze
    # gold materialized daily power rows over the synthetic days
    gold = wh.read(GOLD)
    assert gold.count() >= 1
    assert gold.filter(F.col("metric_value").isNull()).count() == 0


def test_soak_dedup_stream_state_bounded(spark, tmp_path):
    rows_per_batch = 200  # event time advances 200 s per batch
    watermark_s = 300
    feed = synthetic_sensor_stream(spark, rows_per_batch=rows_per_batch)
    q = sp.dedup_stream(
        spark,
        None,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        watermark=f"{watermark_s} seconds",
        lines=feed,
        trigger={"processingTime": "0 seconds"},
    )
    _run_until_batches(q, MIN_BATCHES + 2)

    # state-store row counts per batch, from the query's own metrics
    series = {}
    rows_processed = 0
    for p in q.recentProgress:
        ops = p["stateOperators"]
        if ops:
            series[p["batchId"]] = ops[0]["numRowsTotal"]
        rows_processed += sum(s["numInputRows"] for s in [p])
    assert series, "no state operator metrics captured"
    batches = sorted(series)
    peak = max(series.values())
    tail = [series[b] for b in batches if b >= MIN_BATCHES // 2]

    # enough load that unbounded growth would be visible
    total_rows = (max(batches) + 1) * rows_per_batch
    assert total_rows >= MIN_BATCHES * rows_per_batch
    # BOUNDED: state holds ~watermark-horizon rows plus the in-flight
    # batch plus one batch of watermark lag (the watermark is computed
    # from the PREVIOUS batch's max event time), never the full run.
    # Linear growth would put it at total_rows.
    bound = watermark_s + 3 * rows_per_batch  # 1 row/sec feed
    assert peak <= bound, f"state grew to {peak} (> bound {bound})"
    # PLATEAU: once the watermark starts evicting, the tail stops
    # climbing (within one batch of jitter)
    assert max(tail) - min(tail) <= 2 * rows_per_batch
    # soak metrics for SCALING.md
    print(
        f"\ndedup soak: batches={max(batches) + 1} total_rows={total_rows} "
        f"state_peak={peak} state_tail={tail[-5:]}"
    )


def test_soak_ewma_drift_replay_equivalence(spark, tmp_path):
    """Drive the stateful EWMA fold through 12 single-file micro-batches
    (maxFilesPerTrigger=1; the file source orders batches by file
    modification time) and check the final state equals a driver-side
    replay of the same batch-mean sequence — the multi-step correctness
    property the 2-batch unit test can't see. Also pins changelog
    volume: one row per (batch, updated key), never more."""
    import os

    drop = tmp_path / "drop"
    drop.mkdir()
    batch_means = [1.0, 3.0, 2.0, 6.0, 4.0, 5.0, 0.5, 7.0, 1.5, 2.5, 8.0, 3.5]
    for i, m in enumerate(batch_means):
        # two rows per batch, straddling the mean -> batch_mean == m
        lines = [
            f"{1649941817 + i} Voltage {m - 0.5}",
            f"{1649941817 + i} Voltage {m + 0.5}",
        ]
        path = drop / f"b{i:02d}.txt"
        path.write_text("\n".join(lines))
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    q = sp.ewma_drift_stream(
        spark,
        str(drop),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(240)

    rows = sorted(
        spark.read.parquet(str(tmp_path / "out")).collect(),
        key=lambda r: r["n_readings"],
    )
    assert len(rows) == len(batch_means)  # one changelog row per batch

    # driver-side replay of the fold
    e = None
    expected = []
    for m in batch_means:
        e = m if e is None else 0.3 * m + 0.7 * e
        expected.append(e)
    for row, m, exp in zip(rows, batch_means, expected):
        assert row["batch_mean"] == pytest.approx(m)
        assert row["ewma"] == pytest.approx(exp, rel=1e-12)
    assert rows[-1]["n_readings"] == 2 * len(batch_means)


def test_soak_corpus_ingest_state_plateaus_under_straddling_dupes(
    spark, tmp_path
):
    """VERDICT r5 directive #6: 50+ micro-batches of corpus ingest with
    duplicate arrivals BOTH inside the watermark horizon (must be
    dropped, held in state) and far beyond it (state already evicted,
    re-admitted — the documented handoff to the periodic batch exact
    dedup). The dropDuplicatesWithinWatermark state store must
    PLATEAU at the horizon's key mass, not grow with total keys
    processed."""
    import json as _json
    import os

    n_batches = 55
    step_s = 60          # event time advances 60 s per batch
    watermark_s = 300    # horizon ≈ 5-6 batches of keys
    t0 = 1_700_000_000
    drop = tmp_path / "drop"
    drop.mkdir()

    def doc(doc_id, uid, batch):
        text = " ".join(f"w{i}" for i in range(24)) + f" uid{uid}"
        ts = time.strftime(
            "%Y-%m-%dT%H:%M:%S", time.gmtime(t0 + batch * step_s)
        )
        return {
            "doc_id": doc_id, "text": text, "lang": "en",
            "source": "soak", "fetched_at": ts,
        }

    for b in range(n_batches):
        docs = [doc(b * 1000 + i, f"{b}_{i}", b) for i in range(20)]
        if b >= 1:  # within-horizon dupes: previous batch's content
            docs += [
                doc(b * 1000 + 100 + i, f"{b - 1}_{i}", b) for i in range(10)
            ]
        if b >= 20:  # straddling dupes: content from 20 batches
            # (1200 s) ago — an entry from batch j lives until the
            # watermark passes j*step + watermark_s (~11 batches), so a
            # 20-batch lag is safely past eviction: state gone,
            # re-admitted as new
            docs += [
                doc(b * 1000 + 200 + i, f"{b - 20}_{i}", b) for i in range(10)
            ]
        path = drop / f"b{b:03d}.jsonl"
        path.write_text("\n".join(_json.dumps(d) for d in docs))
        os.utime(path, (t0 + b, t0 + b))

    q = sp.corpus_ingest_stream(
        spark,
        str(drop),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        watermark=f"{watermark_s} seconds",
        max_files_per_trigger=1,
    )
    q.awaitTermination(600)

    series = {
        p["batchId"]: p["stateOperators"][0]["numRowsTotal"]
        for p in q.recentProgress
        if p["stateOperators"] and p["numInputRows"] > 0
    }
    assert len(series) >= 50, f"only {len(series)} measured batches"
    batches = sorted(series)
    peak = max(series.values())
    tail = [series[b] for b in batches if b >= n_batches // 2]

    # distinct content keys pushed through the whole run
    total_keys = n_batches * 20
    # BOUNDED: an entry lives ~11 batches (event_time + delay vs
    # the lagging watermark) × ≤30 admitted keys (+slack); linear
    # growth would be ~total_keys by the end
    bound = 11 * 30 + 90
    assert peak <= bound < total_keys, (
        f"state peaked at {peak} (bound {bound}, total keys {total_keys})"
    )
    # PLATEAU: the back half stops climbing (jitter ≤ ~1 batch of keys)
    assert max(tail) - min(tail) <= 40, tail[-10:]

    out = spark.read.parquet(str(tmp_path / "out"))
    n_fresh = n_batches * 20
    n_readmitted = (n_batches - 20) * 10
    # within-horizon dupes all dropped; straddling dupes re-admitted
    assert out.count() == n_fresh + n_readmitted
    # every re-admission is a cross-horizon copy: content distinct
    # count equals the fresh key count
    assert out.select("content_md5").distinct().count() == n_fresh
    print(
        f"\ncorpus soak: batches={len(series)} peak_state={peak} "
        f"tail={tail[-5:]} out_rows={out.count()}"
    )


def test_soak_release_audit_flags_planted_violations(spark, tmp_path):
    """VERDICT r10 directive #6 (second half): stream a corpus with a
    PLANTED violation for every release gate through the ingest path
    (corpus_ingest_stream: quality gate + watermark-bounded exact
    dedup), then run the release_audit composite over the clean store
    and assert each plant carries exactly its drop reason:

    - an exact duplicate resent 12 batches later (6x the 2-batch
      watermark horizon — state evicted, re-admitted at ingest; the
      documented handoff to the batch-side audit, which must flag it);
    - a 25-token doc (passes the ingest gate's min 20, fails the
      audit's Gopher min 30);
    - a doc with one verbatim benchmark 8-gram spliced in;
    - a reversed-word near-dup pair (identical token set -> simhash
      hamming 0; no shared 8-gram, not an exact dup) — keep-first
      rule: only the LARGER id is dropped;
    - distinct-vocabulary fillers, all 'kept'.
    """
    import json as _json
    import os

    from sensor_data_pipeline___spark.operators.export import release_audit

    n_batches = 16
    step_s = 60
    t0 = 1_700_000_000
    drop = tmp_path / "drop"
    drop.mkdir()

    def words(uid, n=32):
        return [f"w{uid}x{i}" for i in range(n)] + ["the", "of"]

    def doc(doc_id, text, batch):
        ts = time.strftime(
            "%Y-%m-%dT%H:%M:%S", time.gmtime(t0 + batch * step_s)
        )
        return {
            "doc_id": doc_id, "text": text, "lang": "en",
            "source": "soak", "fetched_at": ts,
        }

    bench_words = [f"bench{j}g" for j in range(12)]
    dup_text = " ".join(words("dup"))
    nd_words = words("nd")
    contam_text = " ".join(
        words("dirty", 24) + bench_words[2:10]  # one verbatim 8-gram
    )

    plants = {
        0: [doc(100, dup_text, 0)],
        2: [doc(2100, " ".join(nd_words), 2)],
        3: [doc(3100, " ".join(words("short", 23)[:25]), 3)],
        5: [doc(5100, contam_text, 5)],
        7: [doc(7100, " ".join(reversed(nd_words)), 7)],
        12: [doc(12100, dup_text, 12)],  # cross-horizon exact dup
    }
    for b in range(n_batches):
        docs = [
            doc(b * 1000 + i, " ".join(words(f"{b}_{i}")), b)
            for i in range(5)
        ] + plants.get(b, [])
        path = drop / f"b{b:03d}.jsonl"
        path.write_text("\n".join(_json.dumps(d) for d in docs))
        os.utime(path, (t0 + b, t0 + b))

    q = sp.corpus_ingest_stream(
        spark,
        str(drop),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        watermark="120 seconds",
        max_files_per_trigger=1,
    )
    q.awaitTermination(600)

    out = spark.read.parquet(str(tmp_path / "out")).select("doc_id", "text")
    # the within-horizon dedup must have admitted BOTH dup copies
    # (12-batch lag is far past the 2-batch horizon)
    assert out.filter(F.col("doc_id").isin(100, 12100)).count() == 2

    bench = spark.createDataFrame(
        [(0, " ".join(bench_words))], "bench_id long, text string"
    )
    audit = {
        r.doc_id: r.drop_reason
        for r in release_audit(out, bench, gram_key="string").collect()
    }
    assert audit[100] == "kept"          # keeper of the exact pair
    assert audit[12100] == "exact_dup"   # cross-horizon copy, flagged
    assert audit[3100] == "quality"      # 25 tokens < Gopher min 30
    assert audit[5100] == "contaminated"
    assert audit[2100] == "kept"         # near-dup keep-first rule
    assert audit[7100] == "near_dup"
    fillers = [
        k for k in audit
        if k not in (100, 12100, 3100, 5100, 2100, 7100)
    ]
    assert fillers and all(audit[k] == "kept" for k in fillers)
