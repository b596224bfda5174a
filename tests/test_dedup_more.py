

def test_minhash_index_cross_pairs_match_inmemory_union(spark, tmp_path):
    """near_dup_against_index over (index(corpus), batch) must equal
    minhash_near_dup(corpus ∪ batch) restricted to cross pairs — same
    signatures, same banding, same bucket guard, same agreement
    filter. Batch contains exact copies of corpus docs so the cross
    set is provably non-empty."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    # batch: the held-out docs PLUS exact copies of 5 corpus docs
    copies = (
        docs.filter(F.col("doc_id") % 3 == 1)
        .orderBy("doc_id")
        .limit(5)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    batch = docs.filter(F.col("doc_id") % 3 == 0).unionByName(copies)

    path = str(tmp_path / "mh")
    dedup.save_minhash_index(corpus, path)
    cross = {
        (min(r.new_id, r.corpus_id), max(r.new_id, r.corpus_id),
         round(r.est_jaccard, 6))
        for r in dedup.near_dup_against_index(
            spark, path, batch
        ).collect()
    }
    assert len(cross) >= 5  # the exact copies are all found

    corpus_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    full = {
        (r.doc_a, r.doc_b, round(r.est_jaccard, 6))
        for r in dedup.minhash_near_dup(
            corpus.unionByName(batch)
        ).collect()
        if (r.doc_a in corpus_ids) != (r.doc_b in corpus_ids)
    }
    assert cross == full

    # exact copies carry est_jaccard 1.0 against their source
    ones = {(a, b) for a, b, j in cross if j == 1.0}
    assert len(ones) >= 5


def test_minhash_index_append_then_probe(spark, tmp_path):
    """minhash_index_append admits a batch O(batch); a later probe of
    a copy of an appended doc finds it at est_jaccard 1.0, and the
    pre-append files are untouched bytes."""
    import glob

    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001")
    corpus = docs.filter(F.col("doc_id") < 300)
    late = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 350))

    path = str(tmp_path / "mh")
    dedup.save_minhash_index(corpus, path)
    before = set(glob.glob(path + "/signatures/*/*.parquet")) | set(
        glob.glob(path + "/bands/*/*.parquet")
    )
    dedup.minhash_index_append(spark, path, late)
    after = set(glob.glob(path + "/signatures/*/*.parquet")) | set(
        glob.glob(path + "/bands/*/*.parquet")
    )
    assert before <= after and len(after) > len(before)

    probe = late.orderBy("doc_id").limit(3).withColumn(
        "doc_id", F.col("doc_id") + 20_000_000
    )
    hits = dedup.near_dup_against_index(spark, path, probe).collect()
    by_new = {r.new_id: r for r in hits}
    for r in probe.collect():
        hit = by_new[r.doc_id]
        assert hit.est_jaccard == 1.0
        assert hit.corpus_id == r.doc_id - 20_000_000


def test_minhash_index_probe_plan_is_broadcast_no_cartesian(spark, tmp_path):
    """The probe must reach the stored bands via broadcast equi-joins
    on (band_idx, band_hash) — the store side is scanned narrow and
    never cartesian-joined or shuffled against the batch."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.plans import explain
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(corpus, path)
    plan = explain.formatted_plan(
        dedup.near_dup_against_index(spark, path, batch)
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan and "band_hash" in plan, plan


def test_minhash_index_stats_counts_guarded_buckets(spark, tmp_path):
    """Bucket stats agree with a direct recount, and buckets past
    max_bucket are exactly the probe's dropped population: with a mass
    of identical docs the bomb bucket shows up in n_over_max."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001")
    corpus = docs.filter(F.col("doc_id") < 200)
    # a boilerplate bomb: 30 exact copies of one doc
    bomb = (
        docs.filter(F.col("doc_id") == 0)
        .crossJoin(spark.range(30).select(F.col("id").alias("rep")))
        .select(
            (F.col("doc_id") + 1_000_000 + F.col("rep")).alias("doc_id"),
            "text",
        )
    )
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(
        corpus.select("doc_id", "text").unionByName(bomb), path
    )
    stats = dedup.minhash_index_stats(spark, path, max_bucket=20).collect()
    assert len(stats) == 8  # one row per band
    assert sum(r["n_buckets"] for r in stats) > 0
    # every band sees the >=31-member bomb bucket (identical text ->
    # identical signature -> same bucket in every band)
    for r in stats:
        assert r["max_bucket_size"] >= 31
        assert r["n_over_max"] >= 1
        assert r["docs_in_over_max"] >= 31


def test_minhash_index_append_replay_is_effectively_once(spark, tmp_path):
    """A streaming caller can crash between the index append and its
    checkpoint commit and replay the batch: with a replay-stable
    ingest_key the second append REPLACES the first attempt's
    partitions (dynamic overwrite) — no duplicate signatures, no
    duplicate band keys, probe results unchanged."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001")
    corpus = docs.filter(F.col("doc_id") < 300)
    late = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 330))
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(corpus, path)

    n_corpus = corpus.count()
    dedup.minhash_index_append(spark, path, late, ingest_key="batch-7")
    # crash + replay: same batch, same key
    dedup.minhash_index_append(spark, path, late, ingest_key="batch-7")

    sigs = spark.read.parquet(path + "/signatures")
    assert sigs.count() == n_corpus + late.count()
    assert sigs.select("doc_id").distinct().count() == sigs.count()
    bands_n = spark.read.parquet(path + "/bands").count()
    assert bands_n == (n_corpus + late.count()) * 8  # 8 bands, no dupes

    # probe of a copy of an appended doc still finds exactly it
    probe = late.orderBy("doc_id").limit(2).withColumn(
        "doc_id", F.col("doc_id") + 30_000_000
    )
    hits = dedup.near_dup_against_index(spark, path, probe).collect()
    exact = [r for r in hits if r.est_jaccard == 1.0
             and r.corpus_id == r.new_id - 30_000_000]
    assert len(exact) == 2


def test_sign_for_index_precomputed_sig_matches_and_feeds_append(spark, tmp_path):
    """ADVICE r7: the per-batch ingest loop signs ONCE via
    sign_for_index and hands the frame to both the probe and the
    append. (1) probe with precomputed_sig ≡ probe that signs
    internally; (2) append with the filtered signature frame produces
    a store equal to one built by a self-signing append; (3) the
    internal materialization is a localCheckpoint, not a lingering
    cache entry (no CacheManager accumulation in the hot loop)."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001")
    corpus = docs.filter(F.col("doc_id") % 3 != 0)
    copies = (
        docs.filter(F.col("doc_id") % 3 == 1)
        .orderBy("doc_id")
        .limit(5)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000)
    )
    batch = docs.filter(F.col("doc_id") % 3 == 0).unionByName(copies)

    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    dedup.save_minhash_index(corpus, p1)
    dedup.save_minhash_index(corpus, p2)

    spark.catalog.clearCache()
    sig = dedup.sign_for_index(spark, p1, batch)
    with_pre = {
        (r.new_id, r.corpus_id, round(r.est_jaccard, 6))
        for r in dedup.near_dup_against_index(
            spark, p1, batch, precomputed_sig=sig
        ).collect()
    }
    self_signed = {
        (r.new_id, r.corpus_id, round(r.est_jaccard, 6))
        for r in dedup.near_dup_against_index(spark, p2, batch).collect()
    }
    assert with_pre == self_signed and len(with_pre) >= 5
    # neither path registered a plan-cache entry (localCheckpoint
    # blocks are GC-reclaimed with the frame; a cache() entry would
    # pin in the CacheManager until explicit unpersist — the leak)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()

    # drop the duplicate-of-corpus docs, append survivors both ways
    dup_ids = {a for a, _, j in with_pre if j >= 0.8}
    surv_sig = sig.filter(~F.col("doc_id").isin(list(dup_ids)))
    surv = batch.filter(~F.col("doc_id").isin(list(dup_ids)))
    dedup.minhash_index_append(
        spark, p1, surv, ingest_key="b1", precomputed_sig=surv_sig
    )
    dedup.minhash_index_append(spark, p2, surv, ingest_key="b1")
    for sub in ("/signatures", "/bands"):
        a = sorted(
            map(tuple, spark.read.parquet(p1 + sub).collect())
        )
        b = sorted(
            map(tuple, spark.read.parquet(p2 + sub).collect())
        )
        assert a == b


def test_minhash_index_cold_start_from_empty_seed(spark, tmp_path):
    """The streaming cold start: save_minhash_index on an EMPTY frame
    must produce a probeable, appendable store (schema-explicit store
    reads — inference over an all-partition-pruned empty dataset would
    fail). First probe finds nothing, append admits, second probe
    finds the copy."""
    from sensor_data_pipeline___spark.operators import dedup

    path = str(tmp_path / "mh")
    seed = spark.createDataFrame([], "doc_id long, text string")
    dedup.save_minhash_index(seed, path)

    text = " ".join(f"t{i}" for i in range(24))
    b1 = spark.createDataFrame([(1, text)], "doc_id long, text string")
    assert dedup.near_dup_against_index(spark, path, b1).count() == 0
    dedup.minhash_index_append(spark, path, b1, ingest_key="b0")
    b2 = spark.createDataFrame([(2, text)], "doc_id long, text string")
    hits = dedup.near_dup_against_index(spark, path, b2).collect()
    assert [(r.new_id, r.corpus_id, r.est_jaccard) for r in hits] == [
        (2, 1, 1.0)
    ]


def test_minhash_index_compact_folds_batches_and_probe_is_unchanged(
    spark, tmp_path
):
    """Compaction folds per-batch ingest_key partitions into one
    'base' generation under a versioned root with an atomic CURRENT
    swap: probe results are row-identical before and after, the file
    count collapses, the old generation stays on disk, and
    post-compact appends land in the NEW generation."""
    import glob
    import os

    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001")
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 200), path)
    for i, lo in enumerate(range(200, 320, 30)):
        late = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 30)
        )
        dedup.minhash_index_append(spark, path, late, ingest_key=f"b{i}")

    probe = docs.filter(F.col("doc_id") < 320).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    before_hits = sorted(
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in dedup.near_dup_against_index(spark, path, probe).collect()
    )
    assert len(before_hits) >= 320  # every copy found pre-compact
    files_before = len(glob.glob(path + "/bands/*/*/*.parquet"))

    new_root = dedup.minhash_index_compact(spark, path)
    assert os.path.basename(new_root) == "v1"
    assert os.path.isdir(path + "/bands")  # v0 untouched

    after_hits = sorted(
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in dedup.near_dup_against_index(spark, path, probe).collect()
    )
    assert after_hits == before_hits
    files_after = len(glob.glob(path + "/v1/bands/*/*/*.parquet"))
    assert files_after < files_before / 3

    # appends continue against the new generation; a fresh probe of an
    # appended doc's copy hits at 1.0
    late = docs.filter(
        (F.col("doc_id") >= 320) & (F.col("doc_id") < 330)
    )
    dedup.minhash_index_append(spark, path, late, ingest_key="post")
    assert (
        spark.read.parquet(path + "/v1/signatures")
        .filter(F.col("ingest_key") == "post")
        .count()
        == 10
    )
    p2 = late.withColumn("doc_id", F.col("doc_id") + 60_000_000)
    hits = dedup.near_dup_against_index(spark, path, p2).collect()
    assert (
        len([r for r in hits
             if r.est_jaccard == 1.0
             and r.corpus_id == r.new_id - 60_000_000]) == 10
    )

    # a fresh save over the compacted store resets to flat layout
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 50), path)
    assert not os.path.exists(path + "/CURRENT")
    assert dedup.near_dup_against_index(
        spark, path,
        docs.filter(F.col("doc_id") < 5).withColumn(
            "doc_id", F.col("doc_id") + 70_000_000
        ),
    ).count() == 5


def test_minhash_fresh_save_over_compacted_store_not_stale(spark, tmp_path):
    """Review r8: a fresh save over a previously COMPACTED store must
    not build its bands from the old generation's signatures (the
    stale CURRENT pointer has to be retired BEFORE the band build
    reads the signatures back). The re-save corpus here is
    content-DISJOINT from the original, so a stale-bands read would
    make every probe miss."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup

    path = str(tmp_path / "mh")
    corpus_a = spark.createDataFrame(
        [(i, " ".join(f"alpha{i}w{j}" for j in range(24))) for i in range(20)],
        "doc_id long, text string",
    )
    dedup.save_minhash_index(corpus_a, path)
    dedup.minhash_index_compact(spark, path)  # CURRENT -> v1

    corpus_b = spark.createDataFrame(
        [(i, " ".join(f"beta{i}w{j}" for j in range(24))) for i in range(20)],
        "doc_id long, text string",
    )
    dedup.save_minhash_index(corpus_b, path)  # fresh flat store

    probe = corpus_b.withColumn("doc_id", F.col("doc_id") + 1_000)
    hits = dedup.near_dup_against_index(spark, path, probe).collect()
    found = {(r.new_id, r.corpus_id) for r in hits if r.est_jaccard == 1.0}
    assert found == {(i + 1_000, i) for i in range(20)}


def test_minhash_fresh_save_after_append_retires_appended_docs(
    spark, tmp_path
):
    """Round-8 fix pin: a fresh save must STATIC-overwrite the whole
    store — under the session's dynamic partition-overwrite default
    only the written 'base' partitions would be replaced, and an
    earlier append's ingest_key partitions would keep serving their
    retired signatures (probes would still match the old corpus)."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup

    mk = lambda pre, base: spark.createDataFrame(
        [(base + i, " ".join(f"{pre}{i}w{j}" for j in range(24)))
         for i in range(5)],
        "doc_id long, text string",
    )
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(mk("x", 0), path)
    dedup.minhash_index_append(spark, path, mk("y", 10), ingest_key="b1")
    dedup.save_minhash_index(mk("z", 20), path)  # fresh store

    stale = dedup.near_dup_against_index(
        spark, path, mk("y", 10).withColumn("doc_id", F.col("doc_id") + 1000)
    )
    assert stale.count() == 0  # appended docs fully retired
    fresh = dedup.near_dup_against_index(
        spark, path, mk("z", 20).withColumn("doc_id", F.col("doc_id") + 1000)
    )
    assert fresh.count() == 5  # the new corpus is served


def test_minhash_maintenance_policy_chooses_and_acts(spark, tmp_path):
    """minhash_maintenance is the decision layer over the compact
    lifecycle (the dedup twin of ivf_maintenance, minus retrain):
    fresh store -> none; accumulated append keys past the threshold ->
    compact, with probe results row-identical across the swap; the
    post-compact tick is a no-op again."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001")
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 200), path)

    out = dedup.minhash_maintenance(spark, path)
    assert out == {"action": "none", "n_ingest_keys": 1, "new_root": None}

    for i, lo in enumerate((200, 260, 320)):
        dedup.minhash_index_append(
            spark, path,
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 60)),
            ingest_key=f"b{i}",
        )
    probe = docs.filter(F.col("doc_id") < 380).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    before = sorted(
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in dedup.near_dup_against_index(spark, path, probe).collect()
    )
    out = dedup.minhash_maintenance(spark, path, compact_after_keys=2)
    assert out["action"] == "compact" and out["n_ingest_keys"] == 4
    assert dedup._mh_root(path) == out["new_root"]
    after = sorted(
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in dedup.near_dup_against_index(spark, path, probe).collect()
    )
    assert after == before
    assert dedup.minhash_maintenance(
        spark, path, compact_after_keys=2
    )["action"] == "none"


def test_minhash_maintenance_on_cold_start_store_is_noop(spark, tmp_path):
    """Review r8: the maintenance tick must survive the documented
    streaming cold start — an empty-seed store has NO signature part
    files, and schema inference would throw where the schema-explicit
    reader yields an empty frame (0 ingest keys, action none)."""
    from sensor_data_pipeline___spark.operators import dedup

    path = str(tmp_path / "mh")
    dedup.save_minhash_index(
        spark.createDataFrame([], "doc_id long, text string"), path
    )
    out = dedup.minhash_maintenance(spark, path)
    assert out == {"action": "none", "n_ingest_keys": 0, "new_root": None}


def test_simhash_exact_blocking_equals_brute_force_both_modes(spark):
    """simhash_near_dup_exact's pigeonhole blocking has EXACT recall:
    its output equals a brute-force all-pairs Hamming check over the
    collected fingerprints — in the md5c60 oracle-parity mode AND for
    the production xxhash64 fingerprint the prefix-blocked variant
    uses (where blocked output must be a SUBSET of brute force, with
    identical-fingerprint pairs always found)."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001").filter(
        F.col("doc_id") < 60
    )
    # planted exact copies: hamming 0 in every mode
    docs = docs.unionByName(
        docs.filter(F.col("doc_id") < 3).withColumn(
            "doc_id", F.col("doc_id") + 1000
        )
    )

    def brute(fp_rows, k):
        out = set()
        ids = sorted(fp_rows)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                h = bin(fp_rows[a] ^ fp_rows[b]).count("1")
                if h <= k:
                    out.add((a, b, h))
        return out

    # exact mode: blocked == brute
    fps = {
        r.doc_id: r.simhash60
        for r in dedup.simhash_md5c60(docs).collect()
    }
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_near_dup_exact(docs, max_hamming=3).collect()
    }
    assert got == brute(fps, 3)
    assert {(0, 1000, 0), (1, 1001, 0), (2, 1002, 0)} <= got

    # production mode: prefix-blocked subset of brute, identical pairs found
    fps64 = {r.doc_id: r.simhash64 & ((1 << 64) - 1)
             for r in dedup.simhash(docs).collect()}
    got64 = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_near_dup(docs, max_hamming=3).collect()
    }
    assert got64 <= brute(fps64, 3)
    assert {(0, 1000, 0), (1, 1001, 0), (2, 1002, 0)} <= got64


def test_cc_labels_store_lifecycle_replay_and_compact(spark, tmp_path):
    """save_cc_labels / cc_labels_update / read_cc_labels /
    cc_labels_compact (r14): (1) batched updates resolve to the full
    star-CC recompute over all edges; (2) replaying an update under
    the same ingest_key is a no-op on the resolved labels (the
    effectively-once contract the streaming loop relies on); (3)
    compaction folds the deltas without changing resolution and later
    updates keep working against the new generation."""
    from sensor_data_pipeline___spark.operators import dedup

    path = str(tmp_path / "cc")
    dedup.save_cc_labels(
        spark, path,
        spark.createDataFrame([], "node long, component long"),
    )
    b0 = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    # b1 merges the two b0 components and introduces a fresh one
    b1 = spark.createDataFrame(
        [(2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    dedup.cc_labels_update(spark, path, b0, ingest_key="b0")
    dedup.cc_labels_update(spark, path, b1, ingest_key="b1")
    resolved = lambda: sorted(
        map(tuple, dedup.read_cc_labels(spark, path).collect())
    )
    want = sorted(
        map(
            tuple,
            dedup.connected_components_star(b0.union(b1)).collect(),
        )
    )
    assert resolved() == want
    assert want == [(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)]

    # replay b1 (crash-after-write): resolved labels unchanged
    dedup.cc_labels_update(spark, path, b1, ingest_key="b1")
    assert resolved() == want

    # compact: resolution unchanged, one base partition
    dedup.cc_labels_compact(spark, path)
    assert resolved() == want
    raw = dedup._read_cc_rows(spark, path)
    assert raw.select("ingest_key").distinct().collect()[0][0] == "base"
    assert raw.count() == len(want)

    # post-compact update against the new generation still works and
    # merges across compacted components
    b2 = spark.createDataFrame([(4, 10)], "doc_a long, doc_b long")
    dedup.cc_labels_update(spark, path, b2, ingest_key="b2")
    assert resolved() == [
        (1, 1), (2, 1), (3, 1), (4, 1), (10, 1), (11, 1),
    ]


def test_cc_labels_update_selective_prune(spark, tmp_path):
    """r15 (VERDICT r14 #3): the manifest-pruned update path.
    (1) a seeded base is node-sorted across multiple files and the
    footer manifest selects a strict subset for a small batch's
    endpoints; (2) pruned updates resolve identically to the
    full-scan path, including merges that span base files and
    post-compact generations; (3) a store without a manifest and an
    over-cap batch both fall back to the full scan unchanged."""
    import os

    from sensor_data_pipeline___spark.operators import dedup
    from sensor_data_pipeline___spark.operators._writes import (
        resolve_current,
    )

    path = str(tmp_path / "cc")
    # 1000 singleton labels, 100 rows/file -> ~10 node-sorted base files
    seed = spark.range(1000).selectExpr(
        "id as node", "id as component"
    )
    dedup.save_cc_labels(spark, path, seed, rows_per_file=100)
    root = resolve_current(path)
    man = dedup._load_cc_manifest(root)
    assert man is not None and len(man) >= 8
    # node ranges are tight+disjoint: a 4-key probe opens few files
    sel = dedup._cc_select_base_files(root, [1, 2, 500, 501], "node")
    assert 0 < len(sel) <= 4 < len(man)

    # pruned update == full-scan update (run both against copies)
    pairs1 = spark.createDataFrame(
        [(1, 2), (500, 501)], "doc_a long, doc_b long"
    )
    pairs2 = spark.createDataFrame(
        [(2, 500), (999, 0)], "doc_a long, doc_b long"
    )
    dedup.cc_labels_update(
        spark, path, pairs1, ingest_key="b0", prune_max_nodes=64, prune_min_files=1
    )
    dedup.cc_labels_update(
        spark, path, pairs2, ingest_key="b1", prune_max_nodes=64, prune_min_files=1
    )
    want = {
        (n, 0 if n in (0, 999) else (1 if n in (1, 2, 500, 501) else n))
        for n in range(1000)
    }
    got = {
        tuple(r) for r in dedup.read_cc_labels(spark, path).collect()
    }
    assert got == want

    # compact regenerates the manifest; a cross-generation merge that
    # spans the singleton cluster and both merged clusters still
    # resolves exactly under the pruned path
    dedup.cc_labels_compact(spark, path, rows_per_file=100)
    root2 = resolve_current(path)
    assert root2 != root and dedup._load_cc_manifest(root2)
    pairs3 = spark.createDataFrame(
        [(501, 999), (700, 700)], "doc_a long, doc_b long"
    )
    dedup.cc_labels_update(
        spark, path, pairs3, ingest_key="b2", prune_max_nodes=64, prune_min_files=1
    )
    want = {
        (n, 0 if n in (0, 1, 2, 500, 501, 999) else n)
        for n in range(1000)
    }
    got = {
        tuple(r) for r in dedup.read_cc_labels(spark, path).collect()
    }
    assert got == want

    # fallback 1: manifest removed -> full scan, same resolution
    os.remove(os.path.join(root2, "labels_manifest.json"))
    dedup._MANIFEST_CACHE.pop((root2, "cc"), None)
    pairs4 = spark.createDataFrame([(3, 4)], "doc_a long, doc_b long")
    dedup.cc_labels_update(
        spark, path, pairs4, ingest_key="b3", prune_max_nodes=64, prune_min_files=1
    )
    want = {(n, 3 if n in (3, 4) else c) for n, c in want}
    got = {
        tuple(r) for r in dedup.read_cc_labels(spark, path).collect()
    }
    assert got == want

    # fallback 2: over-cap batch (prune_max_nodes=1 < 2 endpoints)
    pairs5 = spark.createDataFrame([(5, 6)], "doc_a long, doc_b long")
    dedup.cc_labels_update(
        spark, path, pairs5, ingest_key="b4", prune_max_nodes=1
    )
    want = {(n, 5 if n in (5, 6) else c) for n, c in want}
    got = {
        tuple(r) for r in dedup.read_cc_labels(spark, path).collect()
    }
    assert got == want
