"""Persisted decontamination-index lifecycle (operators/decontam.py):
probe equivalence to the inline pass, key-mode equivalence,
effectively-once append replay, and the edge cases the oracle's
generate_series semantics pin (short docs, empty benchmark)."""

import datetime  # noqa: F401  (convention with sibling suites)

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators import decontam
from sensor_data_pipeline___spark.sources import readers

SF = "/root/testdata/sf0.001"


def _inline_contaminated(spark, bench, batch, n=8):
    """The train_test_contamination recipe, inline: batch doc ids that
    share >=1 word n-gram (single-space split, lowered) with bench."""
    g = decontam._gram_exprs("text", n, "string")
    bg = bench.select(F.explode(g).alias("g")).distinct()
    tg = batch.select("doc_id", F.explode(g).alias("g")).distinct()
    return {
        r.doc_id
        for r in tg.join(bg, "g", "left_semi")
        .select("doc_id")
        .distinct()
        .collect()
    }


def test_probe_matches_inline_pass_and_counts(spark, tmp_path):
    docs = readers.table(spark, "documents", SF)
    bench = docs.filter(F.col("doc_id") % 5 == 0)
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    n = 3  # dense overlap at this width — non-degenerate hit set

    path = str(tmp_path / "ix")
    decontam.save_contamination_index(bench, path, n=n, key="string")
    rep = decontam.contaminated_against_index(spark, path, batch).collect()

    assert len(rep) == batch.count()  # full spine, zero rows included
    got = {r.doc_id for r in rep if r.is_contaminated}
    assert got == _inline_contaminated(spark, bench, batch, n=n)
    assert got  # non-degenerate
    by_id = {r.doc_id: r.n_contaminated_grams for r in rep}
    assert all(
        (by_id[i] > 0) == (i in got) for i in by_id
    )


def test_key_modes_agree_and_decontaminate_drops_exactly(spark, tmp_path):
    """xxhash64 (the 100 TB default) and string keys must produce the
    same contamination set; decontaminate survivors = batch minus it."""
    docs = readers.table(spark, "documents", SF)
    bench = docs.filter(F.col("doc_id") % 5 == 0)
    batch = docs.filter(F.col("doc_id") % 5 != 0)

    sets = {}
    for key in ("string", "xxhash64"):
        p = str(tmp_path / key)
        decontam.save_contamination_index(bench, p, n=3, key=key)
        rep = decontam.contaminated_against_index(spark, p, batch)
        sets[key] = {r.doc_id for r in rep.collect() if r.is_contaminated}
    assert sets["string"] == sets["xxhash64"] != set()

    p = str(tmp_path / "xxhash64")
    clean = decontam.decontaminate_against_index(spark, p, batch)
    assert clean.columns == batch.columns  # schema preserved
    survivors = {r.doc_id for r in clean.select("doc_id").collect()}
    all_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    assert survivors == all_ids - sets["xxhash64"]


def test_append_is_effectively_once_and_widens_membership(spark, tmp_path):
    docs = readers.table(spark, "documents", SF)
    bench_a = docs.filter(F.col("doc_id") % 10 == 0)
    bench_b = docs.filter(F.col("doc_id") % 10 == 1)
    batch = docs.filter(F.col("doc_id") % 10 > 1)

    path = str(tmp_path / "ix")
    decontam.save_contamination_index(bench_a, path, n=3, key="xxhash64")
    before = {
        r.doc_id
        for r in decontam.contaminated_against_index(spark, path, batch)
        .collect()
        if r.is_contaminated
    }

    decontam.contamination_index_append(spark, path, bench_b, ingest_key="b1")
    store1 = sorted(
        r.g for r in decontam._read_grams(spark, path).collect()
    )
    # crash-replay of the SAME ingest key replaces its own partition
    decontam.contamination_index_append(spark, path, bench_b, ingest_key="b1")
    assert sorted(
        r.g for r in decontam._read_grams(spark, path).collect()
    ) == store1

    after = {
        r.doc_id
        for r in decontam.contaminated_against_index(spark, path, batch)
        .collect()
        if r.is_contaminated
    }
    # appended benchmark only ever ADDS contaminated docs, and equals
    # a from-scratch build over bench_a ∪ bench_b
    assert before <= after
    p2 = str(tmp_path / "rebuilt")
    decontam.save_contamination_index(
        bench_a.unionByName(bench_b), p2, n=3, key="xxhash64"
    )
    rebuilt = {
        r.doc_id
        for r in decontam.contaminated_against_index(spark, p2, batch)
        .collect()
        if r.is_contaminated
    }
    assert after == rebuilt


def test_short_docs_and_empty_benchmark(spark, tmp_path):
    """Docs under n tokens yield no grams (the oracle's generate_series
    yields no rows); an EMPTY benchmark store probes to all-zero, not
    a read failure."""
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "ix")
    decontam.save_contamination_index(
        docs.filter(F.lit(False)), path, n=8, key="xxhash64"
    )
    rep = decontam.contaminated_against_index(spark, path, docs).collect()
    assert {r.doc_id: r.n_contaminated_grams for r in rep} == {1: 0, 2: 0}

    # a benchmark CONTAINING the long doc contaminates it but never the
    # short one (no 8-grams exist to match)
    decontam.contamination_index_append(
        spark, path, docs.filter(F.col("doc_id") == 2), ingest_key="b1"
    )
    rep = decontam.contaminated_against_index(spark, path, docs).collect()
    assert {r.doc_id: r.is_contaminated for r in rep} == {1: False, 2: True}


def test_stats_track_partitions_and_distinct_total(spark, tmp_path):
    docs = readers.table(spark, "documents", SF)
    path = str(tmp_path / "ix")
    decontam.save_contamination_index(
        docs.filter(F.col("doc_id") % 10 == 0), path, n=3
    )
    decontam.contamination_index_append(
        spark, path, docs.filter(F.col("doc_id") % 10 == 0), ingest_key="dup"
    )
    rows = {
        r.ingest_key: r.n_grams
        for r in decontam.contamination_index_stats(spark, path).collect()
    }
    assert set(rows) == {"base", "dup", "__total_distinct__"}
    # identical benchmark appended twice: per-partition counts double
    # the distinct total — the compaction signal the docstring names
    assert rows["base"] == rows["dup"] == rows["__total_distinct__"]


def test_fresh_save_after_append_retires_appended_grams(spark, tmp_path):
    """Round-8 fix pin: a fresh save must STATIC-overwrite the whole
    store — under the session's dynamic partition-overwrite default,
    only the written 'base' partition would be replaced and an earlier
    append's ingest_key partition would silently keep serving its
    grams."""
    a = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(2, "k l m n o p q r s t")], "doc_id long, text string"
    )
    c = spark.createDataFrame(
        [(3, "u v w x y z aa bb cc dd")], "doc_id long, text string"
    )
    path = str(tmp_path / "ix")
    decontam.save_contamination_index(a, path, n=8, key="string")
    decontam.contamination_index_append(spark, path, b, ingest_key="b1")
    decontam.save_contamination_index(c, path, n=8, key="string")

    rep = {
        r.doc_id: r.is_contaminated
        for r in decontam.contaminated_against_index(
            spark, path, a.unionByName(b).unionByName(c)
        ).collect()
    }
    # only the fresh corpus's grams are served
    assert rep == {1: False, 2: False, 3: True}


def test_compact_folds_appends_and_probe_is_unchanged(spark, tmp_path):
    """contamination_index_compact (r9): appended benchmark partitions
    fold into one DISTINCT base generation under a versioned root with
    an atomic CURRENT swap — probe results are row-identical before
    and after, cross-partition duplicate grams collapse, post-compact
    appends land in the new generation, and a fresh save retires the
    pointer (the stale-store rule)."""
    import os

    docs = readers.table(spark, "documents", SF)
    path = str(tmp_path / "ix")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    batch = docs.filter(F.col("doc_id") % 10 != 0)
    decontam.save_contamination_index(bench, path, n=3)
    # append the SAME benchmark twice: pure cross-partition duplicates
    decontam.contamination_index_append(spark, path, bench, ingest_key="dup")
    before = sorted(
        (r.doc_id, r.n_contaminated_grams)
        for r in decontam.contaminated_against_index(spark, path, batch)
        .collect()
    )
    counts = {
        r.ingest_key: r.n_grams
        for r in decontam.contamination_index_stats(spark, path).collect()
    }
    assert counts["base"] == counts["dup"] == counts["__total_distinct__"]

    new_root = decontam.contamination_index_compact(spark, path)
    assert os.path.basename(new_root) == "v1"
    after = sorted(
        (r.doc_id, r.n_contaminated_grams)
        for r in decontam.contaminated_against_index(spark, path, batch)
        .collect()
    )
    assert after == before
    counts2 = {
        r.ingest_key: r.n_grams
        for r in decontam.contamination_index_stats(spark, path).collect()
    }
    assert counts2 == {
        "base": counts["__total_distinct__"],
        "__total_distinct__": counts["__total_distinct__"],
    }

    # post-compact append lands in the new generation and is probed
    extra = spark.createDataFrame(
        [(999, "zqx1 zqx2 zqx3")], "doc_id long, text string"
    )
    decontam.contamination_index_append(spark, path, extra, ingest_key="b9")
    probe = spark.createDataFrame(
        [(1, "pad zqx1 zqx2 zqx3 pad2")], "doc_id long, text string"
    )
    rep = decontam.contaminated_against_index(spark, path, probe).collect()
    assert rep[0].is_contaminated

    # fresh save over the same path retires the compacted generation
    decontam.save_contamination_index(bench, path, n=3)
    assert not os.path.exists(os.path.join(path, "CURRENT"))
    rep2 = decontam.contaminated_against_index(spark, path, probe).collect()
    assert not rep2[0].is_contaminated  # zqx grams retired with v1


def test_gram_store_lifecycle_on_file_uri(spark, tmp_path):
    """r11 Hadoop-FS branch coverage for the GRAM store (the minhash
    twin lives in test_probe_pruning): save → append → probe →
    compact(CURRENT swap) → probe on a ``file:`` URI root must behave
    identically to a plain-path store — pointer and store reads route
    through operators/_fsio.py's Hadoop branch."""
    from sensor_data_pipeline___spark.operators import _fsio

    docs = readers.table(spark, "documents", SF)
    bench = docs.filter(F.col("doc_id") % 5 == 0)
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    path = "file:" + str(tmp_path / "ix_uri")
    assert _fsio.is_uri(path)

    decontam.save_contamination_index(bench, path, n=3, key="string")
    before = {
        r.doc_id
        for r in decontam.contaminated_against_index(
            spark, path, batch
        ).collect()
        if r.is_contaminated
    }
    assert before == _inline_contaminated(spark, bench, batch, n=3)

    # widen membership via an effectively-once append, then compact:
    # the CURRENT pointer swaps through the Hadoop branch
    extra = docs.filter(F.col("doc_id") % 5 == 1).limit(5)
    decontam.contamination_index_append(spark, path, extra, ingest_key="b1")
    new_root = decontam.contamination_index_compact(spark, path)
    assert new_root.startswith("file:") and new_root != path
    assert decontam._cx_root(path) == new_root
    after = {
        r.doc_id
        for r in decontam.contaminated_against_index(
            spark, path, batch
        ).collect()
        if r.is_contaminated
    }
    widened = _inline_contaminated(
        spark, bench.unionByName(extra), batch, n=3
    )
    assert after == widened and before <= after
