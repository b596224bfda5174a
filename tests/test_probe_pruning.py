"""Pruned probe scans + probe cache for the persisted index stores
(VERDICT r8 directive #1).

Three contracts:

- compacted band files are range-DISJOINT and sorted, with the footer
  manifest recording tight [min, max] per file;
- a selective probe (few keys) reads a small fraction of the base band
  files via the manifest and returns row-identical results to the
  full scan;
- the probe cache serves the immutable base partitions while live
  appends stay visible, and a fresh save invalidates it.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators import dedup
from sensor_data_pipeline___spark.sources import readers

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return readers.table(spark, "documents", SF)


def _compacted_store(spark, tmp_path, files_per_band=8):
    docs = _docs(spark)
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 300), path)
    dedup.minhash_index_compact(spark, path, files_per_band=files_per_band)
    return path, docs


def test_compact_band_manifest_ranges_disjoint(spark, tmp_path):
    """files_per_band > 1 compaction range-partitions each band's keys:
    the manifest's per-band [min, max] intervals are pairwise disjoint
    — the property that makes a point-key probe prunable at all."""
    path, _ = _compacted_store(spark, tmp_path, files_per_band=8)
    root = dedup._mh_root(path)
    man = dedup._load_band_manifest(root)
    assert man is not None and len(man) == 8  # one entry set per band
    for band_idx, files in man.items():
        assert len(files) >= 4, (band_idx, files)
        ordered = sorted(files)
        for (lo1, hi1, _), (lo2, hi2, _) in zip(ordered, ordered[1:]):
            assert hi1 < lo2, f"band {band_idx}: overlapping file ranges"


def test_selective_probe_prunes_files_and_matches_full(spark, tmp_path):
    """A 2-doc probe (16 band keys) against a 64-file compacted store
    must read a minority of base files per the manifest, and the
    pruned probe's result must be row-identical to the full scan —
    pruning may only skip files that cannot contain a probe key."""
    path, docs = _compacted_store(spark, tmp_path, files_per_band=8)
    root = dedup._mh_root(path)

    # planted copies of two corpus docs under fresh ids
    batch = docs.filter(F.col("doc_id").isin(5, 7)).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )

    # manifest-level payoff: the probe's exact keys select few files
    num_hashes, bands, shingle_n = dedup._load_minhash_meta(spark, path)
    keys = [
        (r["band_idx"], r["band_hash"])
        for r in dedup._banded_keys(
            dedup.minhash_signature(batch, num_hashes=num_hashes,
                                    shingle_n=shingle_n),
            "doc_id", num_hashes, bands,
        ).select("band_idx", "band_hash").distinct().collect()
    ]
    files, total = dedup._manifest_select_files(root, keys)
    assert total >= 32, total  # the store really is many-filed
    assert len(files) <= len(keys) + 4, (len(files), len(keys))
    assert len(files) < total / 2  # a pruned scan, not a rename of full

    pruned = sorted(
        (r.new_id, r.corpus_id, round(r.est_jaccard, 9))
        for r in dedup.near_dup_against_index(
            spark, path, batch, prune_max_keys=64, cache_store=False
        ).collect()
    )
    full = sorted(
        (r.new_id, r.corpus_id, round(r.est_jaccard, 9))
        for r in dedup.near_dup_against_index(
            spark, path, batch, prune_max_keys=0, cache_store=False
        ).collect()
    )
    assert pruned == full
    assert {(50_000_005, 5), (50_000_007, 7)} <= {
        (a, b) for a, b, _ in pruned
    }


def test_big_batch_skips_pruning_but_matches(spark, tmp_path):
    """A batch whose key count exceeds prune_max_keys falls back to
    the full-scan path (uniform keys would hit every file anyway) and
    still returns identical results."""
    path, docs = _compacted_store(spark, tmp_path, files_per_band=8)
    batch = docs.filter(F.col("doc_id") < 40).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    pruned_mode = sorted(
        (r.new_id, r.corpus_id)
        for r in dedup.near_dup_against_index(
            spark, path, batch, prune_max_keys=16, cache_store=False
        ).collect()
    )
    full = sorted(
        (r.new_id, r.corpus_id)
        for r in dedup.near_dup_against_index(
            spark, path, batch, cache_store=False
        ).collect()
    )
    assert pruned_mode == full and len(full) >= 40


def test_probe_cache_serves_base_and_sees_live_appends(spark, tmp_path):
    """cache_store=True: the base generation is checkpointed once and
    reused, while appended partitions are read live — a dup planted by
    an append is found by the very next cached probe, and a fresh save
    over the same path invalidates the cached base."""
    docs = _docs(spark)
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 100), path)

    probe = docs.filter(F.col("doc_id").isin(150)).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    # warm the cache: doc 150 is not in the store yet
    assert (
        dedup.near_dup_against_index(spark, path, probe).count() == 0
    )
    # live append becomes visible through the cached path immediately
    dedup.minhash_index_append(
        spark, path, docs.filter(F.col("doc_id") == 150), ingest_key="b1"
    )
    hits = {
        (r.new_id, r.corpus_id)
        for r in dedup.near_dup_against_index(spark, path, probe).collect()
    }
    assert (50_000_150, 150) in hits

    # fresh save over the SAME path: the cached base must not keep
    # serving the retired corpus
    dedup.save_minhash_index(
        docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400)), path
    )
    assert dedup.near_dup_against_index(spark, path, probe).count() == 0


def test_probe_cache_rotates_on_compaction_swap(spark, tmp_path):
    """A compaction's CURRENT swap rotates the cache key: the next
    cached probe reads the new generation and stays row-identical."""
    docs = _docs(spark)
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 100), path)
    dedup.minhash_index_append(
        spark, path, docs.filter(F.col("doc_id") == 200), ingest_key="b1"
    )
    probe = docs.filter(F.col("doc_id").isin(5, 200)).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    before = sorted(
        (r.new_id, r.corpus_id)
        for r in dedup.near_dup_against_index(spark, path, probe).collect()
    )
    dedup.minhash_index_compact(spark, path)
    after = sorted(
        (r.new_id, r.corpus_id)
        for r in dedup.near_dup_against_index(spark, path, probe).collect()
    )
    assert after == before
    assert {(50_000_005, 5), (50_000_200, 200)} <= set(after)


def test_band_files_carry_band_hash_footer_stats(spark, tmp_path):
    """Every written band file (save, append, compact) carries real
    band_hash min/max footer statistics — the raw material for both
    the manifest and parquet page-index skipping."""
    import pyarrow.parquet as pq

    docs = _docs(spark)
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 100), path)
    dedup.minhash_index_append(
        spark, path, docs.filter(F.col("doc_id") == 200), ingest_key="b1"
    )
    files = glob.glob(path + "/bands/**/*.parquet", recursive=True)
    assert files
    for f in files:
        md = pq.ParquetFile(f).metadata
        got = False
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == "band_hash":
                    assert c.statistics is not None and c.statistics.has_min_max
                    got = True
        assert got, f


def test_selective_probe_prunes_signature_files_too(spark, tmp_path):
    """The verify join's signature read is pruned by the signatures
    manifest when the selective path engages: with a range-partitioned
    compacted store, a 2-doc probe's candidate ids select a strict
    minority of signature files, and the sig manifest's intervals are
    disjoint like the band manifest's."""
    path, docs = _compacted_store(spark, tmp_path, files_per_band=8)
    root = dedup._mh_root(path)
    sman = dedup._load_sig_manifest(root)
    assert sman is not None and len(sman) >= 4
    ordered = sorted(sman)
    for (lo1, hi1, _), (lo2, hi2, _) in zip(ordered, ordered[1:]):
        assert hi1 < lo2, "overlapping signature file ranges"
    # candidates of a 2-doc probe are the two corpus twins -> their
    # ids land in at most 2 signature files of the 8
    hits = {
        (lo, hi)
        for lo, hi, _ in sman
        if lo <= 5 <= hi or lo <= 7 <= hi
    }
    assert len(hits) <= 2


def test_recreated_generation_refreshes_manifest_cache(spark, tmp_path):
    """Review r9: save -> compact (v1, manifest cached by a pruned
    probe) -> fresh save (retires CURRENT) -> compact again RECREATES
    v1 with new part-file names. The pruned probe must serve the NEW
    manifest, not the cached retired one — a stale entry would either
    crash on deleted paths or silently scan nothing."""
    docs = _docs(spark)
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 100), path)
    dedup.minhash_index_compact(spark, path, files_per_band=4)
    probe = docs.filter(F.col("doc_id").isin(5)).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    hits = dedup.near_dup_against_index(
        spark, path, probe, prune_max_keys=64, cache_store=False
    )
    assert (50_000_005, 5) in {(r.new_id, r.corpus_id) for r in hits.collect()}

    # fresh save over a DIFFERENT corpus slice, then compact: v1 is
    # recreated; the pruned probe must find doc 205's twin via the
    # NEW manifest
    dedup.save_minhash_index(
        docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 300)), path
    )
    dedup.minhash_index_compact(spark, path, files_per_band=4)
    probe2 = docs.filter(F.col("doc_id").isin(205)).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    hits2 = dedup.near_dup_against_index(
        spark, path, probe2, prune_max_keys=64, cache_store=False
    )
    assert (50_000_205, 205) in {
        (r.new_id, r.corpus_id) for r in hits2.collect()
    }
    # and the retired corpus is really gone through the pruned path
    assert dedup.near_dup_against_index(
        spark, path, probe, prune_max_keys=64, cache_store=False
    ).count() == 0


def test_probe_cache_invalidate_rebuilds_identical(spark, tmp_path):
    """The failure/retry contract (_probe_cache.py cluster caveat,
    VERDICT r9 directive #5): checkpoint blocks are not
    lineage-recoverable, so a caller retrying a probe after executor
    loss must invalidate() the store. Pin the contract's observable
    half: force-invalidate between probes (simulating the retry hook)
    and assert the next probe rebuilds a fresh cache entry and returns
    row-identical results."""
    from sensor_data_pipeline___spark.operators import _probe_cache

    docs = _docs(spark)
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 100), path)
    dedup.minhash_index_append(
        spark, path, docs.filter(F.col("doc_id") == 200), ingest_key="b1"
    )
    probe = docs.filter(F.col("doc_id").isin(5, 200)).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    before = sorted(
        (r.new_id, r.corpus_id)
        for r in dedup.near_dup_against_index(spark, path, probe).collect()
    )
    warmed = [k for k in _probe_cache._REG if k[0] == path]
    assert warmed, "first probe should have warmed the cache"
    entry_before = _probe_cache._REG[warmed[0]]

    _probe_cache.invalidate(path)  # the retry hook's required call
    assert not any(k[0] == path for k in _probe_cache._REG)

    after = sorted(
        (r.new_id, r.corpus_id)
        for r in dedup.near_dup_against_index(spark, path, probe).collect()
    )
    assert after == before
    assert {(50_000_005, 5), (50_000_200, 200)} <= set(after)
    rebuilt = [k for k in _probe_cache._REG if k[0] == path]
    assert rebuilt, "retry probe should rebuild the cache entry"
    assert _probe_cache._REG[rebuilt[0]][1] is not entry_before[1]


def test_store_lifecycle_on_file_uri_exercises_hadoop_fs_branch(
    spark, tmp_path
):
    """r11: the driver-side metadata I/O (CURRENT pointer, footer
    manifests, probe-cache base discovery) routes URIs through the
    Hadoop FileSystem API (operators/_fsio.py). A ``file:`` store root
    runs that exact branch against local disk: the full save → append
    → probe → compact(swap) → pruned-probe lifecycle must behave
    identically to the plain-path stores above, with the manifests and
    pointer readable through _fsio and the probe cache's base
    discovery engaging."""
    from sensor_data_pipeline___spark.operators import _fsio, _probe_cache

    docs = _docs(spark)
    path = "file:" + str(tmp_path / "mh_uri")
    assert _fsio.is_uri(path)
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 100), path)
    dedup.minhash_index_append(
        spark, path, docs.filter(F.col("doc_id") == 200), ingest_key="b1"
    )
    probe = docs.filter(F.col("doc_id").isin(5, 200)).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    before = sorted(
        (r.new_id, r.corpus_id)
        for r in dedup.near_dup_against_index(
            spark, path, probe, cache_store=True
        ).collect()
    )
    assert {(50_000_005, 5), (50_000_200, 200)} <= set(before)
    # base discovery engaged through the Hadoop branch (probe cache)
    assert _probe_cache._base_dirs(dedup._mh_root(path), "bands")

    dedup.minhash_index_compact(spark, path, files_per_band=4)
    root = dedup._mh_root(path)
    assert root != path and root.startswith("file:")  # pointer swapped
    assert _fsio.exists(root + "/bands_manifest.json")
    man = dedup._load_band_manifest(root)
    assert man is not None and len(man) == 8
    after = sorted(
        (r.new_id, r.corpus_id)
        for r in dedup.near_dup_against_index(
            spark, path, probe, prune_max_keys=64, cache_store=False
        ).collect()
    )
    assert after == before


def test_torn_pointer_swap_recovers_forward(tmp_path):
    """Review r11: a crash inside a non-atomic pointer swap (delete
    succeeded, rename didn't — possible only on FS without FileContext
    overwrite-rename) leaves just CURRENT.tmp. resolve_current must
    fall FORWARD to the complete new pointer it holds, never regress
    to the flat root; retire_current must clear the tmp so a retired
    generation cannot resurrect."""
    from sensor_data_pipeline___spark.operators import _writes

    root = str(tmp_path / "store")
    import os

    os.makedirs(root)
    os.makedirs(os.path.join(root, "v2"))  # fully written pre-swap
    # healthy swap, then simulate the torn window: CURRENT deleted,
    # fully-written tmp left behind
    _writes.swap_current(root, os.path.join(root, "v1"))
    assert _writes.resolve_current(root).endswith("v1")
    with open(os.path.join(root, "CURRENT.tmp"), "w") as f:
        f.write("v2")
    os.remove(os.path.join(root, "CURRENT"))
    assert _writes.resolve_current(root).endswith("v2")  # forward, not flat
    _writes.retire_current(root)
    assert _writes.resolve_current(root) == root  # tmp cleared too


def test_partial_pointer_tmp_falls_back_to_flat_root(tmp_path):
    """Review r12: a crash DURING the tmp write (before close/flush)
    leaves CURRENT.tmp partial or empty — following it would name a
    nonexistent generation and make the store unreadable. The tmp is
    trusted only if it is exactly ``v<N>`` AND that generation dir
    exists; otherwise the flat root serves."""
    from sensor_data_pipeline___spark.operators import _writes

    root = str(tmp_path / "store")
    import os

    os.makedirs(root)
    tmp = os.path.join(root, "CURRENT.tmp")
    # empty tmp (crash before any byte flushed)
    open(tmp, "w").close()
    assert _writes.resolve_current(root) == root
    # garbage tmp (partial/corrupt content)
    with open(tmp, "w") as f:
        f.write("v")  # truncated mid-write
    assert _writes.resolve_current(root) == root
    # well-formed pointer but the generation dir is absent
    with open(tmp, "w") as f:
        f.write("v7")
    assert _writes.resolve_current(root) == root
    # once the named generation exists, forward recovery engages
    os.makedirs(os.path.join(root, "v7"))
    assert _writes.resolve_current(root).endswith("v7")


def test_manifest_never_written_partial(spark, tmp_path, monkeypatch):
    """Review r11: if footer-stats extraction fails mid-scan, the
    manifest writers must persist NOTHING — a partial file list would
    make the selective probe treat unlisted base files as nonexistent
    (silent missed duplicates). Probes then take the full scan."""
    import os

    docs = _docs(spark)
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 100), path)

    calls = {"n": 0}
    real = dedup._fsio.list_files_recursive

    def flaky(p, suffix):
        calls["n"] += 1
        raise OSError("transient listing failure")

    monkeypatch.setattr(dedup._fsio, "list_files_recursive", flaky)
    dedup._MANIFEST_CACHE.clear()
    root = dedup._mh_root(path)
    for f in ("bands_manifest.json", "signatures_manifest.json"):
        if os.path.exists(os.path.join(root, f)):
            os.remove(os.path.join(root, f))
    dedup._write_band_manifest(root)
    dedup._write_sig_manifest(root, "doc_id")
    assert calls["n"] == 2
    assert not os.path.exists(os.path.join(root, "bands_manifest.json"))
    assert not os.path.exists(
        os.path.join(root, "signatures_manifest.json")
    )
    monkeypatch.setattr(dedup._fsio, "list_files_recursive", real)
    # and the pruned probe still answers correctly via the full scan
    probe = docs.filter(F.col("doc_id").isin(5)).withColumn(
        "doc_id", F.col("doc_id") + 50_000_000
    )
    hits = {
        (r.new_id, r.corpus_id)
        for r in dedup.near_dup_against_index(
            spark, path, probe, prune_max_keys=64, cache_store=False
        ).collect()
    }
    assert (50_000_005, 5) in hits


def test_failed_manifest_rewrite_drops_stale_manifest(
    spark, tmp_path, monkeypatch
):
    """Review r12 (advice): a REWRITTEN generation root (compact over a
    stale v<N>, resave over the flat root) may still carry the previous
    incarnation's manifest. If the new footer scan fails, the writer
    must DELETE that stale manifest and pop the cache — pruning against
    ranges that describe files which no longer exist silently misses
    duplicates outside them."""
    import os

    docs = _docs(spark)
    path = str(tmp_path / "mh")
    dedup.save_minhash_index(docs.filter(F.col("doc_id") < 100), path)
    root = dedup._mh_root(path)
    assert os.path.exists(os.path.join(root, "bands_manifest.json"))
    assert os.path.exists(os.path.join(root, "signatures_manifest.json"))
    # warm the cache so the pop is observable
    dedup._load_band_manifest(root)
    dedup._load_sig_manifest(root)
    assert root in dedup._MANIFEST_CACHE
    assert (root, "sig") in dedup._MANIFEST_CACHE

    def flaky(p, suffix):
        raise OSError("transient listing failure")

    monkeypatch.setattr(dedup._fsio, "list_files_recursive", flaky)
    dedup._write_band_manifest(root)
    dedup._write_sig_manifest(root, "doc_id")
    # stale manifests gone, caches popped — probes take the full scan
    assert not os.path.exists(os.path.join(root, "bands_manifest.json"))
    assert not os.path.exists(os.path.join(root, "signatures_manifest.json"))
    assert root not in dedup._MANIFEST_CACHE
    assert (root, "sig") not in dedup._MANIFEST_CACHE


def test_cc_manifest_ranges_disjoint_and_failure_contract(
    spark, tmp_path, monkeypatch
):
    """r15 (VERDICT r14 #3): the CC label store's base manifest gives
    the same guarantees the band manifest does — (1) node-sorted base
    files carry tight range-DISJOINT [node min, node max] intervals
    (what makes endpoint pruning selective), every component interval
    satisfies cmin <= nmin (component = cluster-min node id); (2) a
    failed footer scan persists NOTHING and DELETES a previous
    incarnation's manifest + cache entry, so updates fall back to the
    correct full scan instead of pruning against dead ranges."""
    import os

    from sensor_data_pipeline___spark.operators._writes import (
        resolve_current,
    )

    path = str(tmp_path / "cc")
    seed = spark.range(1_000).selectExpr(
        "id as node", "id as component"
    )
    dedup.save_cc_labels(spark, path, seed, rows_per_file=100)
    root = resolve_current(path)
    man = dedup._load_cc_manifest(root)
    assert man is not None and len(man) >= 8
    spans = sorted((e["nmin"], e["nmax"]) for e in man)
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert lo1 <= hi1 < lo2  # sorted, disjoint
    assert spans[0][0] == 0 and spans[-1][1] == 999  # full coverage
    for e in man:
        assert e["cmin"] <= e["nmin"]  # component <= member node id

    # failure contract: flaky listing -> manifest removed, cache popped
    assert (root, "cc") in dedup._MANIFEST_CACHE

    def flaky(p, suffix):
        raise OSError("transient listing failure")

    monkeypatch.setattr(dedup._fsio, "list_files_recursive", flaky)
    dedup._write_cc_manifest(root)
    assert not os.path.exists(os.path.join(root, "labels_manifest.json"))
    assert (root, "cc") not in dedup._MANIFEST_CACHE
    monkeypatch.undo()

    # and the selective update still answers correctly via full scan
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    dedup.cc_labels_update(
        spark, path, pairs, ingest_key="b0", prune_max_nodes=64
    )
    got = dict(
        (r.node, r.component)
        for r in dedup.read_cc_labels(spark, path).collect()
    )
    assert got[1] == 1 and got[2] == 1 and got[3] == 3
