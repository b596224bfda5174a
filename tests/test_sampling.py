"""Deterministic hash splits: stability across runs and corpus growth,
boundary proportions, salt re-deal; stratified sampling reproducibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators import sampling


def _splits(spark, n, salt="split-v1"):
    df = sampling.hash_split(spark.range(n), "id", salt=salt)
    return {r.id: r.split for r in df.collect()}


def test_split_deterministic_and_stable_under_growth(spark):
    small = _splits(spark, 1000)
    again = _splits(spark, 1000)
    assert small == again  # same run-to-run
    grown = _splits(spark, 5000)
    # growing the corpus never moves an existing row
    assert all(grown[i] == small[i] for i in range(1000))


def test_split_proportions(spark):
    df = sampling.hash_split(spark.range(20_000), "id")
    counts = {r.split: r.n for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    assert abs(counts["test"] / 20_000 - 0.1) < 0.01


def test_salt_redeals(spark):
    a = _splits(spark, 2000, salt="v1")
    b = _splits(spark, 2000, salt="v2")
    moved = sum(1 for i in a if a[i] != b[i])
    assert moved > 500  # a new salt re-deals a large fraction


def test_stratified_sample_reproducible(spark):
    df = spark.range(5000).withColumn("cls", (F.col("id") % 3).cast("int"))
    frac = {0: 0.5, 1: 0.1, 2: 0.9}
    s1 = sampling.stratified_sample(df, "cls", frac, seed=7).collect()
    s2 = sampling.stratified_sample(df, "cls", frac, seed=7).collect()
    assert sorted(r.id for r in s1) == sorted(r.id for r in s2)
    by_cls = {}
    for r in s1:
        by_cls[r.cls] = by_cls.get(r.cls, 0) + 1
    # stratum 1 kept at ~10%, stratum 2 at ~90% (Bernoulli tolerance)
    assert by_cls[1] < by_cls[0] < by_cls[2]


def test_deterministic_sample_layout_invariant(spark):
    """The sample must depend only on content — identical under any
    repartitioning (seeded sample()/sampleBy() fails this)."""
    df = spark.range(3000).withColumn("cls", (F.col("id") % 4).cast("int"))
    a = sampling.deterministic_sample(df, "cls", "id", k=15).collect()
    b = sampling.deterministic_sample(df.repartition(7), "cls", "id", k=15).collect()
    assert sorted((r.cls, r.id) for r in a) == sorted((r.cls, r.id) for r in b)
    counts = {}
    for r in a:
        counts[r.cls] = counts.get(r.cls, 0) + 1
    assert counts == {0: 15, 1: 15, 2: 15, 3: 15}


def test_deterministic_sample_growth_stability(spark):
    """Adding rows may evict border rows but never reshuffles the
    sample: the new sample is a subset of old-sample ∪ new-rows."""
    small = spark.range(1000).withColumn("cls", F.lit(0))
    big = spark.range(2000).withColumn("cls", F.lit(0))
    s_small = {r.id for r in sampling.deterministic_sample(small, "cls", "id", 50).collect()}
    s_big = {r.id for r in sampling.deterministic_sample(big, "cls", "id", 50).collect()}
    assert s_big <= s_small | set(range(1000, 2000))


def test_weighted_sample_layout_invariant_and_weighted(spark):
    """A-ES weighted sampling: the winning set is identical under any
    partition layout, excludes non-positive weights, and is biased
    toward heavy rows (sample mean weight > corpus mean weight)."""
    from sensor_data_pipeline___spark.operators.sampling import weighted_sample
    from sensor_data_pipeline___spark.sources.readers import table

    docs = table(spark, "documents", "/root/testdata/sf0.001")
    ids = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())
    s1 = ids(weighted_sample(docs, "n_chars", 50))
    s2 = ids(weighted_sample(docs.repartition(17), "n_chars", 50))
    s3 = ids(weighted_sample(docs.coalesce(1), "n_chars", 50))
    assert s1 == s2 == s3
    assert len(s1) == 50

    from pyspark.sql import functions as F

    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = (
        weighted_sample(docs, "n_chars", 50).agg(F.avg("n_chars")).first()[0]
    )
    assert sample_mean > corpus_mean

    # a different salt names a different (but equally stable) sample
    s4 = ids(weighted_sample(docs, "n_chars", 50, salt="wsample-v2"))
    assert s4 != s1


def test_contamination_short_docs_no_crash(spark, tmp_path):
    """Regression: docs with fewer than 8 words (including empty text)
    used to hit Spark's descending sequence(1, 0) == [1, 0] and crash
    slice(w, 0, 8) with INVALID_PARAMETER_VALUE.START. Short docs must
    simply contribute no 8-grams, matching the oracle's
    generate_series(1, len-7) empty-range semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sensor_data_pipeline___spark.queries import QUERIES

    texts = [
        "",  # 0 meaningful words (splits to [''])
        "one",
        "a b c d e f g",  # 7 words: one short of a gram
        "a b c d e f g h",  # exactly 8: one gram
        "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["fixture"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    row = QUERIES["train_test_contamination"](spark, str(tmp_path)).first()
    assert row["n_train"] + row["n_test"] <= len(texts)
    assert 0 <= row["n_contaminated_train"] <= row["n_train"]


def test_hash_stratified_sample_nests_and_is_layout_invariant(spark):
    """hash_stratified_sample: (1) a stratum sampled at a smaller
    fraction is a SUBSET of the same stratum at a larger fraction
    under the same salt (threshold inclusion — the nested-subset
    property); (2) membership survives repartitioning; (3) strata
    absent from the map are dropped; (4) per-stratum rates land near
    the requested fractions."""
    from sensor_data_pipeline___spark.operators import sampling
    from sensor_data_pipeline___spark.sources import readers

    docs = readers.table(spark, "documents", "/root/testdata/sf0.001")

    small = sampling.hash_stratified_sample(
        docs, "lang", {"en": 0.2}, "doc_id"
    )
    big = sampling.hash_stratified_sample(
        docs, "lang", {"en": 0.6}, "doc_id"
    )
    s_ids = {r.doc_id for r in small.select("doc_id").collect()}
    b_ids = {r.doc_id for r in big.select("doc_id").collect()}
    assert s_ids <= b_ids and len(s_ids) > 0

    relaid = sampling.hash_stratified_sample(
        docs.repartition(13), "lang", {"en": 0.6}, "doc_id"
    )
    assert {r.doc_id for r in relaid.select("doc_id").collect()} == b_ids

    # absent strata dropped
    assert big.filter(F.col("lang") != "en").count() == 0

    # rate ≈ fraction (md5 is uniform; 193 en docs at sf0.001)
    n_en = docs.filter(F.col("lang") == "en").count()
    assert abs(len(b_ids) / n_en - 0.6) < 0.15


def test_thresholds_round_not_truncate(spark):
    """Pin the ADVICE r7 fix: binary-inexact fractions (0.29 × 10000 =
    2899.999…) must round to the documented ``fraction × BUCKETS``
    cutoff, not truncate one bucket short — a cross-engine oracle
    computing the threshold exactly (2900) would otherwise mismatch on
    any id hashing to the boundary bucket."""
    df = spark.range(5000).withColumn("s", F.lit("en"))

    kept = sampling.hash_stratified_sample(df, "s", {"en": 0.29}, "id")
    exact = df.filter(
        sampling.hash_bucket(F.col("id"), "strat-v1") < 2900
    )
    assert {r.id for r in kept.collect()} == {r.id for r in exact.collect()}

    # hash_split: train=0.7 → boundary exactly 7000 (0.7×10000 is
    # 6999.999… in binary), val=0.1 → 7000+1000
    split = sampling.hash_split(df, "id", train=0.7, val=0.1)
    b = sampling.hash_bucket(F.col("id"), "split-v1")
    ref = df.withColumn(
        "want",
        F.when(b < 7000, "train").when(b < 8000, "val").otherwise("test"),
    )
    joined = split.join(ref.select("id", "want"), "id")
    assert joined.filter(F.col("split") != F.col("want")).count() == 0


def test_split_leakage_stats_cells(spark):
    """Fixture-pinned cell arithmetic: least/greatest normalization
    folds (train,test)/(test,train) into one cell and is_leak flags
    exactly the off-diagonal ones."""
    splits = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "val")],
        "doc_id long, split string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4)], "doc_a long, doc_b long"
    )
    got = {
        (r.split_a, r.split_b): (r.n_pairs, r.is_leak, r.uncovered)
        for r in sampling.split_leakage_stats(pairs, splits).collect()
    }
    assert got == {
        ("test", "train"): (1, True, False),
        ("train", "train"): (1, False, False),
        ("test", "val"): (1, True, False),
    }


def test_split_leakage_stats_surfaces_uncovered_endpoints(spark):
    """Advisor r13 + r14: pairs whose endpoints are missing from the
    split table must NOT vanish from the audit — they surface as an
    'unknown' split cell, and EVERY unknown-containing cell (the
    fully-unassigned ('unknown','unknown') diagonal included) is
    flagged both is_leak and uncovered, so an incomplete split table
    fails loudly instead of shrinking the leak count to zero and a
    consumer filtering on is_leak can never silently drop the
    unassigned near-dup mass."""
    splits = spark.createDataFrame(
        [(1, "train")], "doc_id long, split string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "doc_a long, doc_b long"
    )
    got = {
        (r.split_a, r.split_b): (r.n_pairs, r.is_leak, r.uncovered)
        for r in sampling.split_leakage_stats(pairs, splits).collect()
    }
    assert got == {
        ("train", "unknown"): (1, True, True),
        ("unknown", "unknown"): (1, True, True),
    }


def test_cluster_hash_split_whole_clusters(spark):
    """Every member of a connected component gets the component
    min-id as split_key (so clusters land whole); pair-free docs key
    on their own id and match plain hash_split exactly."""
    docs = spark.range(1, 11).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: (r.split_key, r.split)
        for r in sampling.cluster_hash_split(docs, pairs).collect()
    }
    assert {out[i][0] for i in (1, 2, 3)} == {1}
    assert {out[i][0] for i in (5, 6)} == {5}
    assert len({out[i][1] for i in (1, 2, 3)}) == 1
    assert len({out[i][1] for i in (5, 6)}) == 1
    plain = {
        r.doc_id: r.split
        for r in sampling.hash_split(docs, "doc_id").collect()
    }
    for i in (4, 7, 8, 9, 10):
        assert out[i] == (i, plain[i])


def test_cluster_hash_split_no_cross_split_pairs(spark):
    """The structural claim: after cluster_hash_split, zero near-dup
    pairs straddle a split boundary (the leakage split_leakage_stats
    measures for plain hash_split)."""
    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    # chain 0-1-2-...-9 plus scattered pairs
    rows = [(i, i + 1) for i in range(9)] + [(20, 40), (41, 77), (40, 77)]
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    splits = sampling.cluster_hash_split(docs, pairs).select(
        "doc_id", "split"
    )
    leaks = sampling.split_leakage_stats(pairs, splits).filter(
        F.col("is_leak")
    )
    assert leaks.count() == 0
