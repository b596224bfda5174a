"""Deduplication operators for large-scale training-data pipelines.

Four families, all expressed with built-in JVM-side functions (no
row-at-a-time Python in any hot path):

- exact:     hash-groupBy on a 128-bit content hash;
- token-set: order-insensitive exact dedup (Jaccard = 1.0 shortcut);
- MinHash:   shingle → k minhashes → LSH bands → bucket join →
             candidate pairs → exact-Jaccard verification;
- SimHash:   per-token 64-bit hash, bitwise majority vote → fingerprint;
             near-dups = fingerprints at small Hamming distance.

Scale design: every self-join here is blocked (LSH band bucket / simhash
prefix), never a cross join. The shuffle key is always a fixed-width
hash, not document text, so shuffle volume is O(rows × signature), not
O(corpus bytes). At 100 TB the band count / band width trade recall vs
bucket skew; hot buckets (boilerplate docs) are handled by AQE skew
splitting plus the bucket-size cap below.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators import _fsio, _probe_cache
from sensor_data_pipeline___spark.operators._local import local_df
from sensor_data_pipeline___spark.operators._writes import (
    next_generation,
    overwrite_mode,
    resolve_current,
    retire_current,
    swap_current,
)
from sensor_data_pipeline___spark.operators._caches import BoundedCache

# ---------------------------------------------------------------------------
# Exact
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonical representative (min id) + multiplicity per distinct
    text. Grouping key is md5(text) — constant-width shuffle rows
    regardless of document size."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "n_copies")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _zipped_windows(toks: F.Column, n: int) -> F.Column:
    """Length-n sliding windows as an array of n-field structs, built
    from n shifted slices zipped together. One slice per OFFSET (n
    total per document), not one per window — the per-window
    ``slice(toks, i, n)`` formulation allocates an array per shingle
    inside an interpreted higher-order function and measures ~3x
    slower at 260k shingles."""
    width = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    return F.arrays_zip(*[F.slice(toks, i + 1, width).alias(f"t{i}") for i in range(n)])


def _shingles(text_col: str, n: int) -> F.Column:
    """Distinct word n-gram shingles of the whitespace-tokenized text."""
    toks = F.split(F.col(text_col), r"\s+")
    if n == 1:
        return F.array_distinct(toks)
    return F.array_distinct(
        F.transform(
            _zipped_windows(toks, n),
            lambda s: F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)]),
        )
    )


def _hashed_shingles(text_col: str, n: int) -> F.Column:
    """Distinct 64-bit hashes of word n-gram shingles — skips
    materializing the shingle strings entirely (multi-arg xxhash64 over
    the window's tokens). Feed this to minhash: the signature only ever
    consumes the hash, so the string concat is pure waste."""
    toks = F.split(F.col(text_col), r"\s+")
    if n == 1:
        return F.array_distinct(F.transform(toks, lambda t: F.xxhash64(t)))
    return F.array_distinct(
        F.transform(
            _zipped_windows(toks, n),
            lambda s: F.xxhash64(*[s[f"t{i}"] for i in range(n)]),
        )
    )


def minhash_signature(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, signature array<long>) — k independent minhashes over the
    shingle set.

    Physical shape chosen for codegen: explode shingles, hash each
    shingle string ONCE (xxhash64), derive the k permutations by
    re-hashing that 8-byte value with the permutation index, and take
    k ``min`` aggregates in a single groupBy pass. Everything stays in
    whole-stage codegen with map-side partial mins — unlike a nested
    higher-order-function formulation, which Spark evaluates
    interpreted per element (~100× slower at 50k docs)."""
    ex = docs.select(
        F.col(id_col), F.explode(_hashed_shingles(text_col, shingle_n)).alias("_h")
    )
    mins = [
        F.min(F.xxhash64(F.col("_h"), F.lit(j))).alias(f"_m{j}")
        for j in range(num_hashes)
    ]
    return (
        ex.groupBy(id_col)
        .agg(*mins)
        .select(
            id_col,
            F.array(*[F.col(f"_m{j}") for j in range(num_hashes)]).alias("signature"),
        )
    )


def minhash_near_dup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 200,
    precomputed_sig: "DataFrame | None" = None,
) -> DataFrame:
    """Near-duplicate pairs via banded LSH over minhash signatures,
    verified by estimated Jaccard (signature agreement rate).

    ``precomputed_sig`` reuses an existing (id, signature) frame
    (e.g. :func:`sign_for_index`'s per-batch checkpoint in the ingest
    loop, which needs BOTH the cross-index probe and this
    batch-internal pass from one signing) — it must have been signed
    with the same ``num_hashes``/``shingle_n``.

    Band geometry: with b bands of r rows the candidate threshold is
    ≈ (1/b)^(1/r); the default 8×8 targets J≈0.8 — a pair at the
    threshold is caught with ~77% per-run recall (production sweeps
    band counts or unions two geometries for higher recall).

    Pipeline (shuffle-lean): signature → ``bands`` band-hashes →
    groupBy (band, hash) bucket → in-bucket pair expansion from the
    grouped id array (no self-join; one shuffle) → buckets larger than
    ``max_bucket`` dropped whole (boilerplate-bomb guard — at 100 TB a
    hot bucket means near-identical mass duplicates, handled by exact
    dedup instead) → distinct pairs → signatures re-joined for only
    the surviving pairs → agreement-rate filter.

    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b.
    """
    rows_per_band = num_hashes // bands
    # the signature feeds three plan branches (banding + both sides of
    # the verification join) — cache it rather than recompute; ~0.5 KB
    # per doc, LRU-evicted (at 100 TB this is a materialized table)
    sig = (
        precomputed_sig
        if precomputed_sig is not None
        else minhash_signature(
            docs, text_col, id_col, num_hashes, shingle_n
        ).cache()
    )
    # static per-band expressions (python loop, not a higher-order
    # function): stays in whole-stage codegen, and xxhash64 consumes the
    # signature slice directly — no per-band string materialization
    banded = sig.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    # all ordered pairs from the sorted id array: for each position i,
    # pair ids[i] with every id after it
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size("ids") - 1),
            lambda i: F.transform(
                F.slice(F.col("ids"), i + 1, F.size("ids") - i),
                lambda other: F.struct(
                    F.col("ids")[i - 1].alias("doc_a"), other.alias("doc_b")
                ),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.doc_a"), F.col("p.doc_b"))
        .distinct()
    )
    sig_a = sig.select(
        F.col(id_col).alias("doc_a"), F.col("signature").alias("sig_a")
    )
    sig_b = sig.select(
        F.col(id_col).alias("doc_b"), F.col("signature").alias("sig_b")
    )
    verified = pairs.join(sig_a, "doc_a").join(sig_b, "doc_b")
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        verified.select(
            "doc_a", "doc_b", (agree / F.lit(num_hashes)).alias("est_jaccard")
        )
        .filter(F.col("est_jaccard") >= jaccard_threshold)
    )


def save_minhash_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 8,
    shingle_n: int = 3,
) -> None:
    """Persist the corpus's minhash signatures + banded LSH keys so a
    NEW batch can be near-dup-checked against the corpus WITHOUT
    re-signing it (:func:`near_dup_against_index`) — the dedup twin of
    ``save_ivf_index``'s lifecycle: signing is the expensive pass
    (shingle + hash over all text); the index makes it one-time.

    Layout: ``signatures/`` (id, signature) and ``bands/``
    (id, band_hash) hive-partitioned by ``band_idx`` — a batch probe
    is an equi-join on (band_idx, band_hash) against a narrow long
    table, never a re-scan of the text. Band geometry is part of the
    index identity (a probe with different geometry would silently
    find nothing), so it's recorded in ``meta/`` and validated by the
    probe/append paths."""
    # a fresh save IS the new store: retire any stale CURRENT pointer
    # from an earlier compacted generation FIRST — the band build
    # below reads the signatures back through _read_signatures, which
    # resolves the pointer, and a stale one would silently pair the
    # NEW flat signatures with the OLD generation's band keys (every
    # subsequent probe would then find nothing)
    retire_current(path)
    _META_CACHE.pop(path, None)  # a fresh save may change the geometry
    _MANIFEST_CACHE.pop(path, None)
    _MANIFEST_CACHE.pop((path, "sig"), None)
    _probe_cache.invalidate(path)  # base is rewritten under this root
    sig = minhash_signature(
        docs, text_col, id_col, num_hashes, shingle_n
    ).withColumn("ingest_key", F.lit("base"))
    # STATIC overwrite: a fresh save must replace the WHOLE store —
    # under the session's dynamic default only the written 'base'
    # partitions would be replaced, and any earlier append's
    # ingest_key=<batch> partitions would silently keep serving their
    # retired signatures (see operators/_writes.py)
    with overwrite_mode(docs.sparkSession, "static"):
        # sorted-within-files (see _sorted_for_write): footer min/max
        # stats become real, which the selective-probe manifest path
        # and parquet page-index skipping both rely on
        _sorted_for_write(sig, "ingest_key", id_col).write.mode(
            "overwrite"
        ).partitionBy("ingest_key").parquet(path + "/signatures")
        _sorted_for_write(
            _banded_keys(
                _read_signatures(docs.sparkSession, path, id_col),
                id_col, num_hashes, bands, keep=("ingest_key",),
            ),
            "band_idx", "ingest_key", "band_hash",
        ).write.mode("overwrite").partitionBy(
            "band_idx", "ingest_key"
        ).parquet(path + "/bands")
    _write_band_manifest(path)
    _write_sig_manifest(path, id_col)
    meta = local_df(
        docs.sparkSession,
        [(num_hashes, bands, shingle_n)],
        "num_hashes int, bands int, shingle_n int",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(path + "/meta")


def _banded_keys(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int,
    keep: "tuple[str, ...]" = (),
) -> DataFrame:
    """(id, band_idx, band_hash[, *keep]) from a signature frame — the
    exact banding expressions of :func:`minhash_near_dup`, shared so
    the persisted index and the in-memory path bucket identically."""
    rows_per_band = num_hashes // bands
    return sig.select(
        id_col,
        *keep,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.slice(
                            F.col("signature"),
                            b * rows_per_band + 1,
                            rows_per_band,
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )


def _sorted_for_write(df: DataFrame, *cols: str) -> DataFrame:
    """Sort within write tasks so every data file carries TIGHT footer
    min/max stats on the trailing (non-partition) sort columns. The
    leading columns must be the write's ``partitionBy`` set: the
    partitioned-write planner requires output ordered by the partition
    columns and would otherwise insert its OWN sort, destroying the
    data-column order this exists to create. Task-local — no shuffle."""
    return df.sortWithinPartitions(*cols)


def _write_band_manifest(root: str) -> None:
    """Footer-stats manifest of the generation's band files — one JSON
    line of (relative file, band_idx, band_hash min/max) per data file,
    read back by the selective-probe path (:func:`near_dup_against_index`
    ``prune_max_keys``) to turn a few-key probe into a pruned scan that
    opens only the files whose [min, max] interval can contain a probe
    key. Driver-side pyarrow over the files just written (save/compact
    already cost O(corpus); footers are O(files)). Covers exactly the
    immutable ``ingest_key=base`` partitions, so it can never go stale
    within a generation — appends land under other ingest_keys and are
    always read unpruned."""
    import json

    try:
        stats_list = _base_file_stats(
            os.path.join(root, "bands"), "band_hash"
        )
    except _ManifestUnavailable:
        # write NOTHING — but a REWRITTEN generation root (compact over
        # a stale v<N>, resave over the flat root) may still carry the
        # PREVIOUS incarnation's manifest, whose min/max ranges describe
        # files that no longer exist; probes pruning against it would
        # silently miss duplicates outside the stale ranges (review
        # r12). Drop the old manifest and its cache entry so probes
        # truly fall back to the full scan.
        _fsio.remove(os.path.join(root, "bands_manifest.json"))
        _MANIFEST_CACHE.pop(root, None)
        return
    entries = []
    for rel, stats in stats_list:
        band_idx = None
        for part in rel.split(os.sep):
            if part.startswith("band_idx="):
                band_idx = int(part.split("=", 1)[1])
        if band_idx is None:
            continue
        entries.append(
            {"file": rel, "band_idx": band_idx, "min": stats[0], "max": stats[1]}
        )
    _fsio.write_text_atomic(
        os.path.join(root, "bands_manifest.json"),
        json.dumps({"files": entries}),
    )
    # a REWRITTEN manifest must invalidate its own cache entry: a
    # fresh-save-then-compact sequence RECREATES a vN root whose old
    # manifest may still be cached (review r9)
    _MANIFEST_CACHE.pop(root, None)


class _ManifestUnavailable(Exception):
    """Footer-stats extraction failed for the store's filesystem (no
    listing/pyarrow driver for the scheme, or a transient read error
    mid-scan). The manifest writers catch this and write NOTHING — a
    partial manifest would make the selective probe treat the unlisted
    base files as nonexistent (silent missed duplicates, review r11);
    no manifest just means probes take the correct-but-unpruned full
    scan."""


def _base_file_stats_multi(table_dir: str, cols):
    """([(relative file, {col: (min, max)})], total base files) for
    every ``ingest_key=base`` data file's footer stats — the shared
    scanner behind all three manifests, one listing + one footer pass
    regardless of column count. A file appears in the list only with
    stats for ALL requested columns; ``total`` lets callers enforce
    completeness (a stat-less file in a pruned read would be treated
    as nonexistent — the silent-miss the r11 contract forbids).
    Driver-side pyarrow, O(files). Listing rides
    ``operators/_fsio.py`` (glob on local paths, Hadoop FS on URIs);
    footer reads use pyarrow's filesystem driver for the scheme.
    ALL-OR-NOTHING: any listing or footer-read failure raises
    :class:`_ManifestUnavailable` so the caller never persists a
    partial file list."""
    import pyarrow.parquet as pq

    def _open_metadata(f: str):
        if not _fsio.is_uri(f):
            return pq.ParquetFile(f).metadata
        import pyarrow.fs as pafs

        fs, rel_path = pafs.FileSystem.from_uri(f)
        with fs.open_input_file(rel_path) as fh:
            return pq.ParquetFile(fh).metadata

    try:
        files = _fsio.list_files_recursive(table_dir, ".parquet")
        table_dir = _fsio.normalize(table_dir)
    except Exception as exc:
        raise _ManifestUnavailable(str(exc)) from exc
    out = []
    total = 0
    for f in files:
        rel = os.path.relpath(f, table_dir)
        if "ingest_key=base" not in rel:
            continue
        total += 1
        try:
            md = _open_metadata(f)
        except Exception as exc:
            raise _ManifestUnavailable(f"{f}: {exc}") from exc
        agg: dict = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema in cols and c.statistics is not None:
                    st = c.statistics
                    if st.has_min_max:
                        lo, hi = agg.get(
                            c.path_in_schema, (st.min, st.max)
                        )
                        agg[c.path_in_schema] = (
                            min(lo, st.min), max(hi, st.max)
                        )
        if all(c in agg for c in cols):
            out.append((rel, agg))
    return out, total


def _base_file_stats(table_dir: str, col: str):
    """Single-column convenience wrapper over
    :func:`_base_file_stats_multi` (the band/signature manifests)."""
    stats, _total = _base_file_stats_multi(table_dir, (col,))
    return [(rel, st[col]) for rel, st in stats]


def _write_sig_manifest(root: str, id_col: str) -> None:
    """Footer-stats manifest of the generation's SIGNATURE files (id
    min/max per base file) — the verify-join half of the selective
    probe: once candidates are known, only the signature files whose
    id range can contain a candidate corpus id need opening. Same
    staleness-free contract as the bands manifest (base files only)."""
    import json

    try:
        stats_list = _base_file_stats(
            os.path.join(root, "signatures"), id_col
        )
    except _ManifestUnavailable:
        # see _write_band_manifest: never persist a partial list, and
        # drop any previous incarnation's manifest so probes fall back
        # to the full scan instead of pruning against stale ranges
        _fsio.remove(os.path.join(root, "signatures_manifest.json"))
        _MANIFEST_CACHE.pop((root, "sig"), None)
        return
    entries = [
        {"file": rel, "min": s[0], "max": s[1]} for rel, s in stats_list
    ]
    _fsio.write_text_atomic(
        os.path.join(root, "signatures_manifest.json"),
        json.dumps({"files": entries, "id_col": id_col}),
    )
    _MANIFEST_CACHE.pop((root, "sig"), None)  # see _write_band_manifest


def _load_sig_manifest(root: str):
    key = (root, "sig")
    if key not in _MANIFEST_CACHE:
        import json

        p = os.path.join(root, "signatures_manifest.json")
        if not _fsio.exists(p):
            _MANIFEST_CACHE[key] = None
        else:
            raw = json.loads(_fsio.read_text(p))["files"]
            _MANIFEST_CACHE[key] = [
                (e["min"], e["max"], e["file"]) for e in raw
            ]
    return _MANIFEST_CACHE[key]


#: resolved generation root -> parsed manifest (or None when the
#: generation predates manifests). Generations are immutable, so the
#: cache can never serve stale entries; fresh saves pop their root.
_MANIFEST_CACHE: dict = BoundedCache()


def _load_band_manifest(root: str):
    if root not in _MANIFEST_CACHE:
        import json

        p = os.path.join(root, "bands_manifest.json")
        if not _fsio.exists(p):
            _MANIFEST_CACHE[root] = None
        else:
            raw = json.loads(_fsio.read_text(p))["files"]
            by_band: dict = {}
            for e in raw:
                by_band.setdefault(e["band_idx"], []).append(
                    (e["min"], e["max"], e["file"])
                )
            for v in by_band.values():
                v.sort()
            _MANIFEST_CACHE[root] = by_band
    return _MANIFEST_CACHE[root]


def _manifest_select_files(root: str, keys) -> "tuple[list, int] | None":
    """Files of the generation's base band table that a probe with
    ``keys`` = [(band_idx, band_hash), ...] must read, per the footer
    manifest: a file is selected iff its [min, max] can contain one of
    the probe's keys for its band. Returns (absolute paths, total base
    files), or None when the generation has no manifest. Plain
    O(K x files-per-band) interval checks driver-side — K is capped at
    ``prune_max_keys`` (the path never engages for big batches), and
    exhaustive containment checks stay correct for OVERLAPPING
    intervals too (per-task sort runs from an un-ranged save), where a
    binary-search walk could stop early and silently drop candidates."""
    man = _load_band_manifest(root)
    if man is None:
        return None
    total = sum(len(v) for v in man.values())
    chosen: set = set()
    for band_idx, h in keys:
        for lo, hi, rel in man.get(band_idx, ()):
            if lo <= h <= hi:
                chosen.add(rel)
    return (
        [os.path.join(root, "bands", rel) for rel in sorted(chosen)],
        total,
    )


#: path -> (num_hashes, bands, shingle_n). Band geometry is immutable
#: for a store's lifetime (compaction preserves it; only a fresh
#: save_minhash_index changes it, and that invalidates below) — so the
#: per-batch ingest loop shouldn't pay a driver job re-reading the
#: one-row meta parquet three times per trigger (sign, probe, append).
_META_CACHE: dict = BoundedCache()


def _load_minhash_meta(spark, path: str) -> tuple:
    if path not in _META_CACHE:
        r = spark.read.parquet(path + "/meta").first()
        _META_CACHE[path] = (
            int(r["num_hashes"]), int(r["bands"]), int(r["shingle_n"])
        )
    return _META_CACHE[path]


def _mh_root(path: str) -> str:
    """Resolve the CURRENT version of a minhash index store — same
    pointer protocol as the IVF store's ``_store_root``: flat layout
    from :func:`save_minhash_index` is the implicit v0; each
    :func:`minhash_index_compact` writes a complete ``path/v<N>/`` and
    atomically swaps ``path/CURRENT``. ``meta/`` (band geometry) is
    version-invariant and stays at the top level. Thin delegate to
    the shared protocol in ``operators/_writes.py``."""
    return resolve_current(path)


def _read_signatures(
    spark, path: str, id_col: str, cache: bool = False
) -> DataFrame:
    """Schema-explicit read of ``signatures/`` at the CURRENT version —
    an index saved from an EMPTY seed corpus (the streaming cold
    start) has partition dirs for no keys at all, and schema inference
    would fail where an explicit schema correctly yields an empty
    frame. ``cache=True`` serves the immutable ``'base'`` partitions
    from the probe cache (appends always read live) — the per-batch
    probe/identity-gate hot path."""
    return _probe_cache.store_read(
        spark, path, "signatures", _mh_root(path),
        f"{id_col} long, signature array<bigint>, ingest_key string",
        cache=cache,
    )


def _read_bands(spark, path: str, id_col: str, cache: bool = False) -> DataFrame:
    """Schema-explicit read of ``bands/`` (see :func:`_read_signatures`)."""
    return _probe_cache.store_read(
        spark, path, "bands", _mh_root(path),
        f"{id_col} long, band_hash bigint, band_idx int, ingest_key string",
        cache=cache,
    )


def minhash_index_append(spark, path: str, new_docs: DataFrame,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         ingest_key: "str | None" = None,
                         precomputed_sig: "DataFrame | None" = None) -> None:
    """Admit a new batch into the index: sign it with the STORED
    geometry and append signatures + band keys. O(batch), existing
    files untouched — same append posture as ``ivf_index_append``.
    The ingest loop is: probe (:func:`near_dup_against_index`) → drop
    duplicates → append the survivors here.

    ``ingest_key`` makes the append EFFECTIVELY-ONCE from an
    at-least-once caller (a streaming foreachBatch that can replay
    after a crash between this append and its checkpoint commit): the
    batch's rows land in ``ingest_key=<key>`` partitions via dynamic
    partition overwrite, so a replay with the same key REPLACES its
    own earlier attempt instead of appending duplicate signatures —
    the same batch-identity trick as the bronze torn-commit fix. Pass
    a replay-stable key (e.g. the micro-batch id); with ``None`` the
    write is a plain append under key 'adhoc' and a replay WILL
    duplicate (fine for one-shot batch use).

    ``precomputed_sig`` (from :func:`sign_for_index` — stored-geometry
    signatures, already materialized) lets the probe→drop→append
    ingest loop reuse the probe's signing pass instead of re-running
    shingle+hash here; filter it to the admitted ids first."""
    num_hashes, bands, shingle_n = _load_minhash_meta(spark, path)
    # materialize the signature pass ONCE: both writes replay the
    # checkpoint instead of each re-running the shingle+hash pass (the
    # expensive part this function exists to bound at O(batch))
    sig = (
        precomputed_sig.select(id_col, "signature")
        if precomputed_sig is not None
        else minhash_signature(
            new_docs, text_col, id_col, num_hashes, shingle_n
        )
    ).withColumn("ingest_key", F.lit(ingest_key or "adhoc"))
    if precomputed_sig is None:
        sig = sig.localCheckpoint(eager=True)
    mode = "overwrite" if ingest_key is not None else "append"
    root = _mh_root(path)
    # DYNAMIC, pinned (not inherited): a replay must overwrite only
    # its own ingest_key partitions (see operators/_writes.py)
    with overwrite_mode(spark, "dynamic"):
        _sorted_for_write(sig, "ingest_key", id_col).write.mode(
            mode
        ).partitionBy("ingest_key").parquet(root + "/signatures")
        _sorted_for_write(
            _banded_keys(sig, id_col, num_hashes, bands, keep=("ingest_key",)),
            "band_idx", "ingest_key", "band_hash",
        ).write.mode(mode).partitionBy("band_idx", "ingest_key").parquet(
            root + "/bands"
        )


def minhash_index_stats(
    spark, path: str, max_bucket: int = 200
) -> DataFrame:
    """Per-band bucket-population stats for a :func:`save_minhash_index`
    store: (band_idx, n_buckets, max_bucket_size, p99_bucket_size,
    n_over_max, docs_in_over_max) — the operational view of the
    boilerplate-bomb guard. Buckets past ``max_bucket`` are exactly
    the ones :func:`near_dup_against_index` drops whole; a growing
    ``docs_in_over_max`` share means mass near-identical content is
    accumulating (handle with exact dedup upstream) or the band
    geometry needs re-tuning. One narrow aggregate over the band
    table — the same maintenance cadence as ``ivf_index_stats``."""
    bands = spark.read.parquet(_mh_root(path) + "/bands")
    per_bucket = bands.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("sz")
    )
    return (
        per_bucket.groupBy("band_idx")
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("sz").alias("max_bucket_size"),
            F.percentile_approx("sz", 0.99).alias("p99_bucket_size"),
            F.sum(F.when(F.col("sz") > max_bucket, 1).otherwise(0)).alias(
                "n_over_max"
            ),
            F.sum(
                F.when(F.col("sz") > max_bucket, F.col("sz")).otherwise(0)
            ).alias("docs_in_over_max"),
        )
        .orderBy("band_idx")
    )


def minhash_index_compact(
    spark,
    path: str,
    id_col: str = "doc_id",
    files_per_band: int = 1,
) -> str:
    """Fold an index's accumulated per-batch ``ingest_key`` partitions
    into one compact generation — the small-files maintenance the
    streaming ingest loop creates by design (every micro-batch appends
    its own ``ingest_key=b<id>`` partition under every band: an
    80-batch soak leaves ~650 partition dirs of tiny files, and probe
    cost at scale is dominated by file-open/footer overhead long
    before bytes).

    Same versioned-root protocol as ``ivf_retrain``: the current
    generation's signatures are rewritten under ``path/v<N>/`` with a
    single ``ingest_key='base'``, band keys are REBUILT from the
    compacted signatures (cheap — xxhash over signature slices, no
    text), and the ``CURRENT`` pointer swaps atomically. Readers
    resolve the pointer first; a crash before the swap leaves the old
    generation serving; old generations are immutable until
    maintenance deletes them.

    QUIESCE ingest during compaction: a batch that replays its append
    AFTER the swap would recreate its ``ingest_key`` partition in the
    new generation while its rows are already folded into 'base' —
    duplicate signatures. Run on the maintenance cadence between
    triggers (the same contract as compacting any changelog sink).
    The streaming ingest loop satisfies this two ways: its
    ``maintenance_every`` tick runs inside the single writer's batch
    body (no concurrent append by construction), and its identity gate
    (``corpus_neardup_batch_fn``) drops already-indexed ids on a
    crash-replay across the swap — the one interleaving the cadence
    alone can't exclude.

    Returns the new generation's root path."""
    num_hashes, bands, _ = _load_minhash_meta(spark, path)
    root = _mh_root(path)
    sig = (
        _read_signatures(spark, path, id_col)
        .drop("ingest_key")
        .withColumn("ingest_key", F.lit("base"))
    )
    new_root = next_generation(path)
    # STATIC overwrite: the target vN may be a STALE generation left
    # behind by a later fresh save (which resets CURRENT to the flat
    # root without deleting old version dirs) — under the session's
    # dynamic default its old ingest_key partitions would survive
    # into the "new" generation (see operators/_writes.py)
    with overwrite_mode(spark, "static"):
        # files_per_band == 1 (default): single-task fold, one sorted
        # file per band dir. files_per_band > 1: range-partition +
        # sort, so each compacted file covers a DISJOINT contiguous
        # key range — tight footer min/max stats that let the
        # selective-probe manifest path read ~(probe keys) files
        # instead of the whole band table.
        if files_per_band > 1:
            sig_w = sig.repartitionByRange(files_per_band, F.col(id_col))
        else:
            sig_w = sig.coalesce(1)
        sig_w.sortWithinPartitions("ingest_key", id_col).write.mode(
            "overwrite"
        ).partitionBy("ingest_key").parquet(new_root + "/signatures")
        compacted = spark.read.schema(
            f"{id_col} long, signature array<bigint>, ingest_key string"
        ).parquet(new_root + "/signatures")
        banded = _banded_keys(
            compacted, id_col, num_hashes, bands, keep=("ingest_key",)
        )
        if files_per_band > 1:
            banded = banded.repartitionByRange(
                bands * files_per_band, "band_idx", "band_hash"
            )
        else:
            banded = banded.coalesce(1)
        banded.sortWithinPartitions(
            "band_idx", "ingest_key", "band_hash"
        ).write.mode("overwrite").partitionBy(
            "band_idx", "ingest_key"
        ).parquet(new_root + "/bands")
    _write_band_manifest(new_root)
    _write_sig_manifest(new_root, id_col)
    swap_current(path, new_root)  # atomic
    return new_root


def minhash_maintenance(
    spark,
    path: str,
    compact_after_keys: int = 16,
    files_per_band: int = 1,
    id_col: str = "doc_id",
) -> dict:
    """The maintenance POLICY over a :func:`save_minhash_index` store —
    the dedup twin of ``similarity.ivf_maintenance``, minus retrain
    (band geometry is fixed at save time; there are no centroids to
    drift): if the store has accumulated > ``compact_after_keys``
    per-append ``ingest_key`` partitions (each band fans every batch
    key into its own directory of tiny files, so probe cost grows with
    batch COUNT via footer/open overhead, not with bytes), run
    :func:`minhash_index_compact`; else do nothing.

    One call per maintenance tick. Safe inside the single writer's
    ``foreachBatch`` body (``corpus_neardup_batch_fn``'s
    ``maintenance_every``): that caller's identity gate drops
    already-indexed ids on a crash-replay, which is exactly the window
    the compact docstring's quiesce contract warns about.

    The decision input is one bounded aggregate over the signature
    table's partition-value column (directory names, not data pages).

    Returns ``{"action": "compact"|"none", "n_ingest_keys": int,
    "new_root": str | None}``.
    """
    # schema-explicit read: a cold-start (empty-seed) store has no
    # part files yet, and inference would throw where the shared
    # reader returns an empty frame
    n_keys = (
        _read_signatures(spark, path, id_col)
        .select("ingest_key")
        .distinct()
        .count()
    )
    out = {"action": "none", "n_ingest_keys": n_keys, "new_root": None}
    if n_keys > compact_after_keys:
        out["action"] = "compact"
        out["new_root"] = minhash_index_compact(
            spark, path, id_col=id_col, files_per_band=files_per_band
        )
    return out


def sign_for_index(
    spark,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sign a batch with the STORED geometry of a
    :func:`save_minhash_index` store and materialize the result
    (eager ``localCheckpoint`` — blocks are freed when the frame is
    GC'd, unlike a ``cache()`` entry that pins in the CacheManager
    until an explicit unpersist). The ingest loop signs each batch
    ONCE here and hands the frame to BOTH
    :func:`near_dup_against_index` and :func:`minhash_index_append`
    via ``precomputed_sig`` — signing is the expensive pass
    (shingle + hash over the batch text), so the probe→drop→append
    loop shouldn't pay it twice."""
    num_hashes, _, shingle_n = _load_minhash_meta(spark, path)
    return minhash_signature(
        new_docs, text_col, id_col, num_hashes, shingle_n
    ).localCheckpoint(eager=True)


def near_dup_against_index(
    spark,
    path: str,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    max_bucket: int = 200,
    precomputed_sig: "DataFrame | None" = None,
    exclude_ingest_key: "str | None" = None,
    cache_store: bool = True,
    prune_max_keys: int = 0,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and a
    :func:`save_minhash_index` corpus — the incremental-ingest dedup
    check, costing O(batch signing + probe) instead of O(corpus).

    Store-scan cost (VERDICT r8 directive #1) is handled per regime:

    - ``cache_store`` (default on): the generation's immutable
      ``ingest_key='base'`` partitions are kept in executor storage
      memory across probes (MEMORY_AND_DISK, generation-keyed, LRU —
      see ``operators/_probe_cache.py``), so the per-micro-batch
      probe's store side is a memory scan, not a parquet re-read;
      appended partitions are still read live (partition-pruned
      ``ingest_key != 'base'``), so new appends are always visible.
    - ``prune_max_keys`` > 0 enables the SELECTIVE-probe pruned scan:
      when the batch's distinct band keys number at most this cap,
      they are collected (bounded driver list, ≤ cap rows) and the
      footer-stats manifest written at save/compact selects only the
      base band files whose [min, max] can contain a probe key — a
      few-doc audit probe then opens ~(keys) files instead of the
      band table. Deliberately OFF by default: probe keys are uniform
      64-bit hashes, so a streaming-sized batch (~16k keys) hits
      essentially every file of any realistic layout and the check
      would only add a driver job; stats pruning of point probes pays
      exactly when probe keys ≪ scan units.

    ``exclude_ingest_key`` drops that key's partitions from the probed
    store (partition-pruned — ingest_key is a partition column on both
    subdirs). The at-least-once ingest loop passes its OWN batch key:
    on a crash-replay AFTER the append landed, the store already holds
    this batch's signatures, and probing against them would match
    every batch doc to itself — wrongly rejecting the whole batch and
    (under the batch-keyed store overwrite) DELETING its rows. With
    the self-key excluded a replay probes exactly the store state the
    first attempt saw.

    Semantics pinned to :func:`minhash_near_dup` over corpus ∪ batch,
    restricted to cross pairs (tests): the batch is signed with the
    stored geometry, its band keys probe the stored ``bands/`` table
    with a BROADCAST equi-join on (band_idx, band_hash) — the store is
    scanned narrow (two longs + id), never re-signed, and never
    shuffled. The bucket guard matches too: a probed bucket's size is
    its stored members + its batch members, and buckets past
    ``max_bucket`` are dropped whole (the boilerplate-bomb rule).
    Batch-internal duplicates are out of scope — run
    :func:`minhash_near_dup` on the batch itself for those.

    ``precomputed_sig`` (from :func:`sign_for_index`) skips the
    signing pass — the per-batch ingest loop signs once and shares
    the frame with :func:`minhash_index_append`. Without it the
    signature is materialized via an eager ``localCheckpoint`` whose
    blocks are GC-reclaimed with the frame — NOT ``cache()``, which
    would accumulate CacheManager entries across the long-lived
    per-batch probe loop this function is the hot path of.

    Returns (new_id, corpus_id, est_jaccard)."""
    num_hashes, bands, shingle_n = _load_minhash_meta(spark, path)
    new_sig = (
        precomputed_sig
        if precomputed_sig is not None
        else minhash_signature(
            new_docs, text_col, id_col, num_hashes, shingle_n
        ).localCheckpoint(eager=True)
    )
    new_bands = _banded_keys(new_sig, id_col, num_hashes, bands).select(
        F.col(id_col).alias("new_id"), "band_idx", "band_hash"
    )
    root = _mh_root(path)
    band_schema = f"{id_col} long, band_hash bigint, band_idx int, ingest_key string"
    bands_raw = None
    # gate on the manifest FIRST: probing a pre-manifest store would
    # otherwise pay the probe-keys collect job on every probe only to
    # fall back to the full scan anyway (review r9)
    if prune_max_keys > 0 and _load_band_manifest(root) is not None:
        probe_keys = new_bands.select("band_idx", "band_hash").distinct(
        ).limit(prune_max_keys + 1).collect()
        if len(probe_keys) <= prune_max_keys:
            sel = _manifest_select_files(
                root, [(r["band_idx"], r["band_hash"]) for r in probe_keys]
            )
            if sel is not None:
                files, _total = sel
                pruned_base = (
                    spark.read.schema(band_schema)
                    .option("basePath", root + "/bands")
                    .parquet(*files)
                    if files
                    else spark.createDataFrame([], band_schema)
                )
                delta = spark.read.schema(band_schema).parquet(
                    root + "/bands"
                ).filter(F.col("ingest_key") != "base")
                bands_raw = pruned_base.unionByName(delta)
    pruning = bands_raw is not None
    if bands_raw is None:
        bands_raw = _read_bands(spark, path, id_col, cache=cache_store)
    if exclude_ingest_key is not None:
        bands_raw = bands_raw.filter(
            F.col("ingest_key") != exclude_ingest_key
        )
    store = bands_raw.select(
        F.col(id_col).alias("corpus_id"), "band_idx", "band_hash"
    )
    # probe: stored members of the batch's buckets (broadcast the
    # batch side — it's the small one by construction)
    probed = store.join(
        F.broadcast(new_bands.select("band_idx", "band_hash").distinct()),
        ["band_idx", "band_hash"],
    )
    # bucket guard over the UNION membership, matching minhash_near_dup
    stored_n = probed.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("_ns")
    )
    new_n = new_bands.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("_nn")
    )
    ok = (
        stored_n.join(F.broadcast(new_n), ["band_idx", "band_hash"])
        .filter((F.col("_ns") + F.col("_nn")) <= max_bucket)
        .select("band_idx", "band_hash")
    )
    cand = (
        probed.join(F.broadcast(ok), ["band_idx", "band_hash"])
        .join(F.broadcast(new_bands), ["band_idx", "band_hash"])
        .select("new_id", "corpus_id")
        .filter(F.col("new_id") != F.col("corpus_id"))
        .distinct()
    )
    sig_schema = f"{id_col} long, signature array<bigint>, ingest_key string"
    sigs_raw = None
    if pruning:
        # verify-join half of the selective probe: the candidates are
        # few by construction (pruned keys x bucket cap), so collect
        # their corpus ids (bounded; materialize cand ONCE for reuse
        # downstream) and open only the signature files whose id range
        # can contain one, per the signatures manifest
        sman = _load_sig_manifest(root)
        if sman is not None:
            cand = cand.localCheckpoint(eager=True)
            ids = [
                r[0]
                for r in cand.select("corpus_id").distinct()
                .limit(8193).collect()
            ]
            if len(ids) <= 8192:
                chosen = sorted(
                    {
                        rel
                        for lo, hi, rel in sman
                        for i in ids
                        if lo <= i <= hi
                    }
                )
                sig_files = [
                    os.path.join(root, "signatures", rel) for rel in chosen
                ]
                pruned_sig = (
                    spark.read.schema(sig_schema)
                    .option("basePath", root + "/signatures")
                    .parquet(*sig_files)
                    if sig_files
                    else spark.createDataFrame([], sig_schema)
                )
                sig_delta = spark.read.schema(sig_schema).parquet(
                    root + "/signatures"
                ).filter(F.col("ingest_key") != "base")
                sigs_raw = pruned_sig.unionByName(sig_delta)
    if sigs_raw is None:
        sigs_raw = _read_signatures(spark, path, id_col, cache=cache_store)
    if exclude_ingest_key is not None:
        sigs_raw = sigs_raw.filter(
            F.col("ingest_key") != exclude_ingest_key
        )
    sig_store = sigs_raw.select(
        F.col(id_col).alias("corpus_id"), F.col("signature").alias("sig_c")
    )
    verified = cand.join(
        F.broadcast(
            new_sig.select(
                F.col(id_col).alias("new_id"),
                F.col("signature").alias("sig_n"),
            )
        ),
        "new_id",
    ).join(sig_store, "corpus_id")
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_n"), F.col("sig_c"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return verified.select(
        "new_id",
        "corpus_id",
        (agree / F.lit(num_hashes)).alias("est_jaccard"),
    ).filter(F.col("est_jaccard") >= jaccard_threshold)


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for (doc_a, doc_b) candidate pairs —
    the verification stage after LSH candidate generation."""
    sh = docs.select(
        F.col(id_col), _shingles(text_col, shingle_n).alias("_sh")
    )
    j = (
        candidate_pairs.join(
            sh.withColumnRenamed(id_col, "doc_a").withColumnRenamed("_sh", "sh_a"),
            "doc_a",
        )
        .join(
            sh.withColumnRenamed(id_col, "doc_b").withColumnRenamed("_sh", "sh_b"),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return j.select(
        "doc_a",
        "doc_b",
        (inter / union.cast("double")).alias("jaccard"),
    )


def set_similarity_join(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact-threshold Jaccard self-join with AllPairs/PPJoin-style
    prefix filtering (Bayardo et al., WWW'07; Xiao et al., WWW'08) —
    the scalable alternative to a cross join when EXACT (not
    LSH-approximate) similarity semantics are required.

    Candidate generation: two documents at Jaccard >= t MUST share a
    token within the first ``|x| - ceil(t*|x|) + 1`` tokens of each,
    once every document orders its tokens by a single global ranking.
    Ranking rarest-document-frequency-first keeps high-frequency tokens
    out of prefixes, so candidate buckets stay small on natural-language
    corpora. Pairs passing the prefix join and the length filter
    (``t*|x| <= |y| <= |x|/t``) are verified with exact
    intersection/union arithmetic.

    Scale design: shuffles are keyed by token (document-frequency join +
    prefix-candidate join) and by doc id (per-document prefix window) —
    never an unblocked cross join. Token document frequencies are a
    vocabulary-sized table (AQE broadcasts it when small). Hot prefix
    tokens are exactly the rare ones, so bucket skew is bounded by
    construction; stopword-heavy corpora degrade gracefully because
    frequent tokens never enter a prefix until t forces near-whole-set
    prefixes.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("_toks"),
    ).withColumn("_sz", F.size("_toks"))

    exploded = toks.select("_id", "_sz", F.explode("_toks").alias("_tok"))
    token_df = exploded.groupBy("_tok").agg(F.count("*").alias("_df"))

    # Global prefix ordering: (document frequency asc, token asc) is a
    # total order — no global rank materialization needed, the window
    # below is partitioned per document.
    pos = F.row_number().over(
        Window.partitionBy("_id").orderBy(F.col("_df").asc(), F.col("_tok").asc())
    )
    # 1e-9 slack: t is inexact in binary (0.9*20 > 18.0), and a too-
    # short prefix / too-tight length filter silently LOSES exact-
    # boundary pairs. Slack only lengthens prefixes — never unsound.
    prefix_len = (
        F.col("_sz") - F.ceil(F.lit(threshold) * F.col("_sz") - F.lit(1e-9)) + 1
    )
    prefix = (
        exploded.join(token_df, "_tok")
        .withColumn("_pos", pos)
        .filter(F.col("_pos") <= prefix_len)
        .select("_tok", F.col("_id"), F.col("_sz"))
    )

    a = prefix.select(
        "_tok", F.col("_id").alias("doc_a"), F.col("_sz").alias("_sz_a")
    )
    b = prefix.select(
        "_tok", F.col("_id").alias("doc_b"), F.col("_sz").alias("_sz_b")
    )
    candidates = (
        a.join(b, "_tok")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.col("_sz_b") * F.lit(threshold) - F.lit(1e-9) <= F.col("_sz_a"))
            & (F.col("_sz_a") * F.lit(threshold) - F.lit(1e-9) <= F.col("_sz_b"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )

    verified = (
        candidates.join(
            toks.select(F.col("_id").alias("doc_a"), F.col("_toks").alias("_ta")),
            "doc_a",
        )
        .join(
            toks.select(F.col("_id").alias("doc_b"), F.col("_toks").alias("_tb")),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.size("_ta") + F.size("_tb") - inter
    return (
        verified.select(
            "doc_a", "doc_b", (inter / union.cast("double")).alias("jaccard")
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _bit_mask(bit: int) -> int:
    # two's-complement long literal for bit 63
    return (1 << bit) if bit < 63 else -(1 << 63)


def _simhash_fp(
    docs: DataFrame, hashes: F.Column, id_col: str, bits: int, out: str
) -> DataFrame:
    """Bitwise-majority fingerprint over per-token hash longs, shaped
    like :func:`minhash_signature`: explode the distinct hashes and
    take ``bits`` conditional-sum aggregates in ONE groupBy pass —
    map-side partial aggregation, whole-stage codegen, each hash
    visited once. The tempting narrow formulation (one ``F.aggregate``
    fold per bit over the hash array) re-traverses the array ``bits``
    times in interpreted higher-order functions and measured ~10x
    slower at 5k docs (scale-sweep r9). ``explode_outer`` keeps the
    one-row-per-document contract for NULL text (a plain explode would
    silently drop those docs — review r9): the NULL hash row votes -1
    on every bit, reproducing the old fold's fp = 0.

    Precondition (review r9): ``id_col`` must be UNIQUE — the groupBy
    collapses duplicate ids into ONE fingerprint with token votes
    mixed across their rows (the per-row select formulation emitted
    one fingerprint per row instead). Every caller in this repo feeds
    the documents surrogate key; dedupe ids first if yours aren't."""
    ex = docs.select(F.col(id_col), F.explode_outer(hashes).alias("_h"))
    aggs = [
        F.sum(
            F.when(
                F.col("_h").bitwiseAND(F.lit(_bit_mask(b)).cast("long")) != 0,
                1,
            ).otherwise(-1)
        ).alias(f"_v{b}")
        for b in range(bits)
    ]
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp.bitwiseOR(
            F.when(
                F.col(f"_v{b}") > 0, F.lit(_bit_mask(b)).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        )
    return ex.groupBy(id_col).agg(*aggs).select(id_col, fp.alias(out))


def simhash(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash fingerprint per document: xxhash64 each distinct
    token, take the bitwise majority across tokens. One explode +
    one partially-aggregated groupBy — no UDF (see :func:`_simhash_fp`;
    note its unique-``id_col`` precondition)."""
    toks = F.array_distinct(F.split(F.col(text_col), r"\s+"))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    return _simhash_fp(docs, hashes, id_col, 64, "simhash64")


def simhash_md5c60(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash in ORACLE-PARITY mode: single-space tokens and a
    per-token hash of the md5 digest's first 15 hex chars — both ends
    exactly computable by any ANSI engine (DuckDB:
    ``('0x' || substring(md5(t),1,15))::BIGINT``), unlike Spark's
    seeded xxhash64. Same geometry, same voting, same Hamming
    semantics as :func:`simhash`; the production default stays
    xxhash64 (one hash pass instead of a 128-bit digest) — a pinning
    test holds both modes to the same planted near-dup pairs."""
    toks = F.array_distinct(F.split(F.col(text_col), " ", -1))
    hashes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
    )
    return _simhash_fp(docs, hashes, id_col, 60, "simhash60")


def simhash_near_dup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    prefix_bits: int = 16,
    materialize_fp: bool = True,
) -> DataFrame:
    """Near-dup pairs = simhash fingerprints within ``max_hamming`` bits,
    blocked on the fingerprint's high ``prefix_bits`` (docs differing
    inside the prefix are missed — the standard recall/cost trade;
    production runs 4 rotated prefix tables for exact ≤3-bit recall).

    ``materialize_fp`` (default): the fingerprint table is eagerly
    ``localCheckpoint``-ed before the self-join (r15): the two join
    sides otherwise each recompute the whole tokenize+hash+majority-
    vote pipeline — the query's dominant cost — because a broadcast
    subtree can never ReuseExchange with a shuffle subtree. The
    checkpoint materializes the doc-sized narrow (id, fingerprint)
    frame once; both sides then read blocks. Opt out for mid-plan
    inputs whose exchanges the enclosing job reuses (see
    :func:`simhash_near_dup_exact`)."""
    fp = simhash(docs, text_col, id_col)
    if materialize_fp:
        fp = fp.localCheckpoint(eager=True)
    blocked = fp.withColumn(
        "block", F.shiftrightunsigned(F.col("simhash64"), 64 - prefix_bits)
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(
        F.col("a.simhash64").bitwiseXOR(F.col("b.simhash64"))
    )
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_near_dup_exact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    materialize_fp: bool = True,
) -> DataFrame:
    """Near-dup pairs at Hamming <= ``max_hamming`` with EXACT recall —
    the oracle-gradable twin of :func:`simhash_near_dup` (VERDICT r8
    directive #5), over the :func:`simhash_md5c60` parity fingerprint.

    Blocking is the multi-index pigeonhole (Norouzi et al., CVPR'12):
    split the 60 fingerprint bits into ``max_hamming + 1`` disjoint
    segments — two fingerprints within ``max_hamming`` differing bits
    CANNOT differ in every segment, so candidates = pairs agreeing
    exactly on at least one (segment_idx, segment_value) key. Unlike
    the production prefix block (a recall/cost trade), this misses
    nothing, which is what makes a brute-force all-pairs DuckDB twin a
    valid whole-output oracle: blocked output == brute output proves
    the blocking's exact recall, not just the Hamming arithmetic.

    Physical shape: one shuffle keyed by (segment_idx, segment_value)
    — ``max_hamming + 1`` rows per doc, never an unblocked self-join;
    verification is bit_count(xor) on the joined fingerprints. With
    ``materialize_fp`` (the default) the fingerprint table is eagerly
    ``localCheckpoint``-ed before the self-join (r15): the
    md5-per-token + 60-majority-vote pipeline is the dominant cost and
    the planner computed it ONCE PER JOIN SIDE (the plan put one side
    under a BroadcastExchange, so ReuseExchange could never fire
    across the two subtrees); materializing the doc-sized narrow
    (id, fingerprint) frame halves the heavy work and is what both
    sides of the join then read. Pass ``materialize_fp=False`` when
    ``docs`` is itself a mid-plan frame inside a larger single-action
    query whose OTHER branches share its exchanges (the release_audit
    posture: its reps lineage is reused across the audit's branches at
    runtime, and an eager side-job re-pays the clusters shuffle
    instead — measured slower both ways at sf0.1, interleaved
    fresh-JVM arms, SCALING.md r15 addendum 4).

    Returns (doc_a, doc_b, hamming) with doc_a < doc_b.
    """
    bits = 60
    segs = max_hamming + 1
    if bits % segs:
        raise ValueError(f"60 bits must divide into {segs} segments")
    seg_bits = bits // segs
    seg_mask = (1 << seg_bits) - 1
    fp = simhash_md5c60(docs, text_col, id_col)
    if materialize_fp:
        fp = fp.localCheckpoint(eager=True)
    blocked = fp.select(
        id_col,
        "simhash60",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash60"), i * seg_bits)
                    .bitwiseAND(F.lit(seg_mask))
                    for i in range(segs)
                ]
            )
        ).alias("seg_idx", "seg_val"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    ham = F.bit_count(
        F.col("a.simhash60").bitwiseXOR(F.col("b.simhash60"))
    ).cast("int")
    return (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair can agree on several segments
    )


def simhash_exact_oracle_sql(
    table: str = "documents", max_hamming: int = 3
) -> str:
    """The brute-force ANSI twin of :func:`simhash_near_dup_exact`:
    recompute the md5c60 fingerprint per document (60 per-bit majority
    votes, generated expressions) and emit ALL pairs at
    bit_count(xor) <= ``max_hamming`` — no blocking, so equality with
    the Spark output proves the segment blocking's exact recall."""
    vote_terms = " +\n      ".join(
        f"(CASE WHEN sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0"
        f" THEN (1::BIGINT << {i}) ELSE 0::BIGINT END)"
        for i in range(60)
    )
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, t
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM {table})
    ), h AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS h
      FROM toks
    ), fp AS (
      SELECT doc_id, {vote_terms} AS f
      FROM h GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.f, b.f)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.f, b.f)) <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# Composition: the production dedup pipeline
# ---------------------------------------------------------------------------


def dedup_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **minhash_kwargs,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The documented pipeline order: EXACT dedup first, then MinHash
    near-dup over the surviving representatives only.

    Running exact dedup first is what keeps LSH well-behaved on real
    corpora: mass-duplicated boilerplate otherwise saturates every band
    bucket its copies share and pair expansion grows quadratically in
    the copy count (measured in SCALING.md's 30x-replicated corpus).
    After exact dedup each retained text is unique, so bucket sizes
    reflect genuine near-duplicate structure.

    Returns (representatives, exact_groups, near_dup_pairs):
      representatives — one row per distinct text (min-id exemplar,
        full original columns);
      exact_groups    — (id, n_copies) per distinct text;
      near_dup_pairs  — (doc_a, doc_b, est_jaccard) among exemplars.
    """
    groups = exact_dedup(docs, text_col, id_col)
    reps = docs.join(
        groups.select(id_col), id_col, "left_semi"
    )
    pairs = minhash_near_dup(reps, text_col, id_col, **minhash_kwargs)
    return reps, groups, pairs


# ---------------------------------------------------------------------------
# Clustering: pairs → connected components → representatives
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for the undirected graph given as an edge list —
    the step that turns pairwise near-dup output into dedup GROUPS
    (component id = min node id in the component).

    Label propagation to a fixpoint: every node repeatedly adopts the
    minimum label among itself and its neighbors. Each iteration is one
    shuffle (groupBy node); convergence needs O(diameter) rounds, and
    near-dup graphs are overwhelmingly tiny star/clique components, so
    2-3 rounds typically suffice. The driver-side loop only ever moves
    an aggregated change COUNT, never data.

    At 100 TB scale the same loop holds (iterations are Spark jobs over
    checkpointed intermediates — ``localCheckpoint`` every round cuts
    the lineage that would otherwise re-run all prior rounds); graphs
    with long chains switch to :func:`connected_components_star` (the
    large-star/small-star alternation — same shuffle class per round,
    provably O(log² n) rounds; measured 22 s vs ~5.4 h projected on a
    20k-node path, SCALING.md r12).
    """
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .union(pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
    ).localCheckpoint()
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"], "inner")
            .select(F.col("u").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()  # cut lineage: each round is one job, not a replay
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "node")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # cap exhausted without a zero-change round: labels are
        # best-so-far, components may still be split (advisor r12 —
        # don't let the final select mask a non-converged run); long
        # diameters should use connected_components_star instead
        import warnings

        warnings.warn(
            "connected_components: label propagation did NOT reach a "
            f"fixpoint within max_iterations={max_iterations}; "
            "returned components may be over-split (raise "
            "max_iterations or use connected_components_star)",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select("node", F.col("label").alias("component"))


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) via the alternating large-star / small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the documented long-chain escalation of
    :func:`connected_components`: min-label propagation needs
    O(diameter) rounds (a pathological chain of pairwise near-dups —
    timestamped boilerplate, serial numbers — can make diameter ≈
    component size), where the star alternation provably converges in
    O(log² n) rounds (O(log n) in practice) by rewiring the edge set
    itself toward component minima instead of diffusing labels along
    it:

    - **large-star** (per node u): every neighbor v > u re-attaches to
      m = min(N(u) ∪ {u});
    - **small-star** (per node u, over edges oriented large→small):
      u and every smaller neighbor re-attach to m.

    Both steps preserve connectivity and only ever decrease the
    (sum-of-labels) potential; at the fixpoint the edge set IS the
    star forest (v → component-min), read off directly. Each round is
    two self-shaped shuffles over the current edge set (groupBy node +
    join back), checkpointed to cut lineage — the same per-round cost
    class as one propagation round. Convergence is detected by an
    aggregated (count, hash) signature, a 1-row driver scalar.

    Same contract as :func:`connected_components` (component id = min
    node id, any orderable id type, nodes in no pair are absent);
    pinned equal to it and to a driver-side union-find by property
    tests, including the long-path regime where propagation's round
    count is the difference between converging and not."""
    # nodes from the RAW pairs: a self-pair (a,a) contributes node a as
    # its own singleton component (matching connected_components),
    # while the edge itself is dropped before the alternation
    nodes = (
        pairs.select(F.col(a_col).alias("node"))
        .union(pairs.select(F.col(b_col).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def _signature(e: DataFrame) -> tuple:
        # Two INDEPENDENT aggregates of two independent hashes
        # (xor of h(u,v), decimal sum of h(v,u)) — a same-cardinality
        # edge-set change would have to collide both simultaneously
        # (~2^-128) for convergence to fire early; still one bounded
        # 1-row driver scalar per round (advisor r12 — the
        # count+single-xor form was a lone 64-bit check)
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.bit_xor(F.xxhash64(F.col("u"), F.col("v"))), F.lit(0)
            ).alias("h"),
            F.coalesce(
                F.sum(
                    F.xxhash64(F.col("v"), F.col("u")).cast("decimal(30,0)")
                ),
                F.lit(0).cast("decimal(30,0)"),
            ).alias("s"),
        ).collect()[0]
        return (row["n"], row["h"], row["s"])

    sig = None
    converged = False
    for _ in range(max_iterations):
        # large-star: symmetric neighborhoods; larger neighbors hook
        # onto min(N(u) ∪ {u})
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn")).select(
            "u", F.least(F.col("_mn"), F.col("u")).alias("m")
        )
        edges = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # small-star: orient large→small; u and its smaller neighbors
        # all hook onto the minimum
        oriented = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        joined = oriented.join(mins, "u")
        edges = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(
                joined.select(F.col("u").alias("u"), F.col("m").alias("v"))
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        new_sig = _signature(edges)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # surface the capped run instead of silently reading off a
        # not-yet-star edge set as components (advisor r12): at
        # O(log² n) guaranteed rounds, hitting 50 means something is
        # deeply wrong with the input, not a tuning matter
        import warnings

        warnings.warn(
            "connected_components_star: star-forest fixpoint NOT "
            f"reached within max_iterations={max_iterations}; "
            "returned components are best-so-far and may be wrong "
            "(raise max_iterations)",
            RuntimeWarning,
            stacklevel=2,
        )
    # fixpoint: edges are the star forest (node → component min);
    # roots (the minima) and singletons map to themselves. The min
    # aggregate also guards the max_iterations-exhausted case: a
    # not-yet-star node with several out-edges yields ONE row (its
    # best-so-far label, the propagation cap's failure mode) rather
    # than duplicate rows
    return (
        nodes.join(
            edges.groupBy(F.col("u").alias("node")).agg(
                F.min("v").alias("_c")
            ),
            "node",
            "left",
        )
        .select(
            "node", F.coalesce(F.col("_c"), F.col("node")).alias("component")
        )
    )


def connected_components_incremental(
    labels: DataFrame,
    new_pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(node, component) after merging NEW edges into an existing
    component labeling — recomputing only the components the new
    edges touch (r13): the incremental-maintenance shape a persisted
    near-dup index needs at 100 TB, where each ingest batch yields a
    bounded set of new pairs and re-running CC over the whole corpus
    (``connected_components_star`` from scratch) would be O(corpus)
    per batch.

    Correctness rests on the star-contraction invariant: an existing
    labeling IS a star forest (node → component), and the connected
    components of (star edges ∪ new edges) equal those of
    (original edges ∪ new edges) — stars preserve exactly the old
    connectivity. So:

    1. ``touched`` components = labels of the new edges' endpoints;
    2. the SUBGRAPH = star edges of nodes in touched components
       ∪ the new edges (endpoints never labeled before enter here);
    3. :func:`connected_components_star` on the subgraph (the old
       components are pre-collapsed stars, so the alternation
       converges in a couple of rounds regardless of the ORIGINAL
       graph's shape);
    4. untouched components pass through unchanged.

    Component ids stay canonical (min node id of the merged
    component — the global min is reachable through the star edges),
    so the output is exactly what a full recompute over all edges
    would produce, pinned by property test against the batch variant.

    Cost: two id-keyed semi/anti joins over the label table plus the
    star rounds over the AFFECTED subgraph only — O(new edges +
    affected cluster sizes) per batch, independent of corpus size.
    """
    ends = (
        new_pairs.select(F.col(a_col).alias("node"))
        .union(new_pairs.select(F.col(b_col).alias("node")))
        .distinct()
    )
    touched_comps = (
        labels.join(ends, "node", "left_semi")
        .select("component")
        .distinct()
        .localCheckpoint(eager=True)
    )
    affected = labels.join(
        touched_comps, "component", "left_semi"
    ).localCheckpoint(eager=True)
    star_edges = affected.filter(
        F.col("node") != F.col("component")
    ).select(F.col("node").alias(a_col), F.col("component").alias(b_col))
    # self-pairs keep singleton/never-labeled endpoints present even
    # if no new edge survives dedup (mirrors the batch variant's
    # nodes-from-raw-pairs contract)
    singletons = affected.filter(
        F.col("node") == F.col("component")
    ).select(F.col("node").alias(a_col), F.col("node").alias(b_col))
    sub = star_edges.union(singletons).union(
        new_pairs.select(a_col, b_col)
    )
    sub_cc = connected_components_star(
        sub, a_col, b_col, max_iterations=max_iterations
    )
    untouched = labels.join(touched_comps, "component", "left_anti")
    return untouched.select("node", "component").union(
        sub_cc.select("node", "component")
    )


# ---------------------------------------------------------------------------
# Persisted component labeling (maintained by the streaming near-dup loop)
# ---------------------------------------------------------------------------


#: path -> node type — version-invariant per save, cached driver-side
#: like the minhash geometry / DSIR meta caches (the per-micro-batch
#: update would otherwise pay a meta parquet read + collect per call)
_CC_META_CACHE: dict = BoundedCache()


def _read_cc_rows(spark, path: str) -> DataFrame:
    """Schema-explicit read of a :func:`save_cc_labels` store's RAW
    delta rows (base + per-batch appends; a node can have several rows
    across generations — resolve with :func:`read_cc_labels`)."""
    if path not in _CC_META_CACHE:
        _CC_META_CACHE[path] = str(
            spark.read.parquet(path + "/meta").first()["node_type"]
        )
    node_t = _CC_META_CACHE[path]
    return spark.read.schema(
        f"node {node_t}, component {node_t}, ingest_key string"
    ).parquet(resolve_current(path) + "/labels")


def _write_cc_manifest(root: str) -> None:
    """Footer-stats manifest of a CC label store generation's ``base``
    files — per file, [min, max] on BOTH ``node`` and ``component`` —
    read back by :func:`cc_labels_update`'s selective path
    (``prune_max_nodes``) so the per-batch endpoint lookup and
    affected-members fetch open only the base files whose ranges can
    contain a key, instead of scanning the whole store (VERDICT r14
    directive #3 — the same footer-manifest cure as the minhash band
    store). Base files are range-partitioned and sorted by ``node`` at
    save/compact, so node intervals are tight and disjoint; component
    intervals are whatever the footer says (conservative — a
    mega-cluster widens the ranges of the files holding its members,
    degrading pruning there but never correctness). Same all-or-nothing
    + drop-stale contract as :func:`_write_band_manifest`: on stats
    failure, write NOTHING and remove any previous incarnation so
    updates fall back to the full scan."""
    import json

    try:
        stats, total = _base_file_stats_multi(
            root + "/labels", ("node", "component")
        )
        # COMPLETENESS, not just failure-atomicity (self-review r15):
        # the scanner lists a file only when its footer carries
        # min/max for BOTH columns; a manifest missing a base file
        # would make the selective path treat its rows as nonexistent
        # (the exact silent-miss the r11 all-or-nothing contract
        # forbids), so a stat-less file means NO manifest. (This
        # engine's own writers always emit stats for these columns —
        # the check guards stores produced by writers that don't.)
        if len(stats) != total:
            raise _ManifestUnavailable(
                f"footer stats cover {len(stats)} of {total} base files"
            )
    except _ManifestUnavailable:
        _fsio.remove(root + "/labels_manifest.json")
        _MANIFEST_CACHE.pop((root, "cc"), None)
        return
    entries = [
        {
            "file": rel,
            "nmin": st["node"][0],
            "nmax": st["node"][1],
            "cmin": st["component"][0],
            "cmax": st["component"][1],
        }
        for rel, st in stats
    ]
    _fsio.write_text_atomic(
        root + "/labels_manifest.json", json.dumps({"files": entries})
    )
    _MANIFEST_CACHE.pop((root, "cc"), None)  # see _write_band_manifest


def _load_cc_manifest(root: str):
    key = (root, "cc")
    if key not in _MANIFEST_CACHE:
        import json

        p = root + "/labels_manifest.json"
        if not _fsio.exists(p):
            _MANIFEST_CACHE[key] = None
        else:
            _MANIFEST_CACHE[key] = json.loads(_fsio.read_text(p))["files"]
    return _MANIFEST_CACHE[key]


def _cc_select_base_files(root: str, keys, field: str):
    """Absolute paths of the generation's base label files whose
    [min, max] on ``field`` ('node' or 'component') can contain one of
    ``keys``, per the footer manifest — or None when the generation has
    no manifest. Exhaustive containment checks (not binary search), as
    in :func:`_manifest_select_files`: correct for overlapping
    intervals too."""
    man = _load_cc_manifest(root)
    if man is None:
        return None
    lo_k, hi_k = ("nmin", "nmax") if field == "node" else ("cmin", "cmax")
    return [
        os.path.join(root, "labels", e["file"])
        for e in man
        if any(e[lo_k] <= k <= e[hi_k] for k in keys)
    ]


def _cc_sorted_base(spark, lab: DataFrame, rows_per_file: int) -> DataFrame:
    """Range-partition + sort a base label frame by ``node`` so each
    written file covers a tight, disjoint node interval (what makes the
    manifest's node pruning selective). File count targets
    ``rows_per_file`` from a metadata-cheap raw count; range
    partitioning samples the frame, acceptable at save/compact cadence
    (both already pay O(store)). The eager ``localCheckpoint``
    materializes the (possibly expensive) upstream ONCE for the three
    passes this costs (count, range sampling, write); blocks are
    GC-freed with the frame."""
    lab = lab.localCheckpoint(eager=True)
    n_rows = lab.count()
    n_files = max(1, -(-n_rows // max(1, rows_per_file)))
    # _sorted_for_write leads with ingest_key (the write's partitionBy
    # column — constant 'base' here) so the partitioned-write planner
    # accepts the ordering instead of inserting its own sort above it
    # (self-review r15; see the helper's docstring)
    return _sorted_for_write(
        lab.repartitionByRange(n_files, "node"), "ingest_key", "node"
    )


def save_cc_labels(
    spark,
    path: str,
    labels: DataFrame,
    node_col: str = "node",
    component_col: str = "component",
    rows_per_file: int = 4_000_000,
) -> None:
    """Initialize the persisted (node → component) labeling a streaming
    near-dup loop maintains incrementally (VERDICT r13 directive #4):
    the label store lives beside the minhash index, each ingest batch
    folds its newly discovered pairs in via
    :func:`cc_labels_update` (O(new edges + affected clusters), the
    :func:`connected_components_incremental` shape), and consumers —
    ``sampling.cluster_hash_split`` above all — read the maintained
    table instead of re-running full star-CC over the pair index per
    call.

    Layout: ``labels/`` hive-partitioned by ``ingest_key`` ('base' for
    this seed write, ``b<batch>`` per streaming append), ``meta/``
    recording the node type (version-invariant, top level). Same
    versioned-root + CURRENT-pointer protocol as the minhash store;
    :func:`cc_labels_compact` folds accumulated deltas.

    Cold start: pass an EMPTY frame with the right schema (the
    streaming loop's usual bootstrap, as with ``save_minhash_index``).
    """
    retire_current(path)
    _CC_META_CACHE.pop(path, None)  # a fresh save may change the type
    lab = labels.select(
        F.col(node_col).alias("node"),
        F.col(component_col).alias("component"),
    ).withColumn("ingest_key", F.lit("base"))
    # STATIC overwrite: a fresh save replaces the WHOLE store (see
    # save_minhash_index — dynamic would leave stale batch partitions)
    with overwrite_mode(spark, "static"):
        _cc_sorted_base(spark, lab, rows_per_file).write.mode(
            "overwrite"
        ).partitionBy("ingest_key").parquet(path + "/labels")
    node_t = dict(labels.dtypes)[node_col]
    local_df(spark, [(node_t,)], "node_type string").coalesce(
        1
    ).write.mode("overwrite").parquet(path + "/meta")
    _write_cc_manifest(path)


def read_cc_labels(spark, path: str) -> DataFrame:
    """(node, component) resolved across base + per-batch deltas.

    The LATEST label per node is simply the MINIMUM across its rows:
    components only ever MERGE (edges are only added), a merge
    relabels every member to the merged component's min node id — so
    a node's label sequence is strictly decreasing — and a dead
    component id can never be re-issued (the node bearing that id now
    sits in a component with a smaller min). No generation column, no
    window: resolution is one groupBy-min over the label rows."""
    return (
        _read_cc_rows(spark, path)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def cc_labels_update(
    spark,
    path: str,
    new_pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    ingest_key: "str | None" = None,
    max_iterations: int = 50,
    prune_max_nodes: int = 0,
    prune_min_files: int = 16,
) -> None:
    """Fold a batch of NEW edges into a :func:`save_cc_labels` store —
    the persisted form of :func:`connected_components_incremental`:
    only the components the new edges touch are re-clustered, and the
    batch writes a DELTA partition holding just the affected nodes'
    new labels (O(new edges + affected cluster sizes) written per
    batch; untouched labels are never rewritten — min-resolution in
    :func:`read_cc_labels` supersedes their rows lazily).

    The touched/affected selection works on raw delta rows without a
    global resolve pass: a touched component is some endpoint's LATEST
    label (min over that endpoint's rows — endpoint-sized work), and
    any row claiming a LIVE component is current (a merge relabels all
    members in the same delta, so stale rows only ever point at dead
    component ids, which cannot be some node's latest).

    ``ingest_key`` gives the same effectively-once replay contract as
    ``minhash_index_append``: the delta lands under its own partition
    via dynamic overwrite, so a crash-replay REPLACES its earlier
    attempt (and recomputing against a store that already absorbed
    that attempt is idempotent — re-merging merged components is a
    no-op). ``None`` appends under 'adhoc' (one-shot batch use).

    ``prune_max_nodes`` > 0 enables the SELECTIVE store read (VERDICT
    r14 directive #3): when the batch's distinct endpoints number at
    most this cap, they are collected (bounded driver list) and the
    two store scans prune to the base files the footer manifest says
    can hold them — the endpoint lookup by node ranges (tight: base is
    node-sorted at save/compact), then the affected-members fetch by
    component ranges for the collected touched-component ids (at most
    one per endpoint). Delta partitions are always read whole, like
    minhash appends — the maintenance-tick compaction folds them back
    under the manifest. Correctness does not depend on pruning:
    selection is conservative interval containment, and a store with
    no manifest (or an over-cap batch) takes the full scan exactly as
    before. This removes the one O(store)-per-batch term the streaming
    loop had left: update cost becomes O(endpoints x files-they-hit +
    delta pile) instead of O(store).

    ``prune_min_files`` is the cost gate in the OTHER direction (the
    dual of the minhash probe's prune_max_keys rule "never engage for
    big batches" — never engage for SMALL stores): the selective path
    pays ~2 extra bounded driver jobs (endpoint + touched-component
    collects) per batch, which is pure overhead while the base is
    smaller than this many files and a full scan is already cheap.
    Measured in-loop (SCALING.md r15): on a cold-start soak store the
    ungated selective path grew the labels tick from 17% to 42% of
    ingest throughput; with the gate the small-store cost is the r14
    full-scan cost, and the big-store cost is the pruned path's —
    each regime keeps its cheaper plan."""
    ends = (
        new_pairs.select(F.col(a_col).alias("node"))
        .union(new_pairs.select(F.col(b_col).alias("node")))
        .distinct()
    )
    root = resolve_current(path)
    node_t = _read_cc_rows(spark, path).schema["node"].dataType.simpleString()
    schema = f"node {node_t}, component {node_t}, ingest_key string"

    def _base_union_delta(files: list) -> DataFrame:
        base = (
            spark.read.schema(schema)
            .option("basePath", root + "/labels")
            .parquet(*files)
            if files
            else spark.createDataFrame([], schema)
        )
        delta = (
            spark.read.schema(schema)
            .parquet(root + "/labels")
            .filter(F.col("ingest_key") != "base")
        )
        return base.unionByName(delta).select("node", "component")

    rows = end_keys = None
    # gate on the manifest FIRST (see near_dup_against_index: a
    # pre-manifest store must not pay the endpoint collect only to
    # fall back to the full scan anyway), then on base file count
    # (small stores scan cheaper than the selective path's fixed
    # driver jobs — see prune_min_files above)
    man = _load_cc_manifest(root) if prune_max_nodes > 0 else None
    if man is not None and len(man) >= prune_min_files:
        end_rows = ends.limit(prune_max_nodes + 1).collect()
        if len(end_rows) <= prune_max_nodes:
            end_keys = [r["node"] for r in end_rows]
            rows = _base_union_delta(
                _cc_select_base_files(root, end_keys, "node")
            )
    if end_keys is not None:
        # the COLLECTED keys drive both the file selection and the
        # lookup: re-joining against the `ends` frame here could
        # recompute a different endpoint set than the one the files
        # were pruned for (self-review r15), and the literal IN also
        # pushes to the parquet scan where a semi-join cannot
        touched = (
            rows.filter(F.col("node").isin(end_keys))
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .select("component")
            .distinct()
        )
    else:
        rows = _read_cc_rows(spark, path).select("node", "component")
        touched = (
            rows.join(ends, "node", "left_semi")
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .select("component")
            .distinct()
        )
    if end_keys is not None:
        # selective path, second scan: the touched components are at
        # most one per collected endpoint — bounded collect, then open
        # only the base files whose component range can hold one
        touched_ids = [r["component"] for r in touched.collect()]
        member_rows = _base_union_delta(
            _cc_select_base_files(root, touched_ids, "component")
        )
        affected = (
            member_rows.filter(F.col("component").isin(touched_ids))
            .distinct()
            .localCheckpoint(eager=True)
            if touched_ids
            else member_rows.filter(F.lit(False)).localCheckpoint(
                eager=True
            )
        )
    else:
        affected = (
            rows.join(touched, "component", "left_semi")
            .distinct()
            .localCheckpoint(eager=True)
        )
    star = affected.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(a_col), F.col("component").alias(b_col)
    )
    singles = affected.filter(F.col("node") == F.col("component")).select(
        F.col("node").alias(a_col), F.col("node").alias(b_col)
    )
    sub = star.union(singles).union(new_pairs.select(a_col, b_col))
    sub_cc = connected_components_star(
        sub, a_col, b_col, max_iterations=max_iterations
    )
    delta = sub_cc.select("node", "component").withColumn(
        "ingest_key", F.lit(ingest_key or "adhoc")
    )
    mode = "overwrite" if ingest_key is not None else "append"
    # DYNAMIC, pinned: a replay overwrites only its own partition
    with overwrite_mode(spark, "dynamic"):
        delta.write.mode(mode).partitionBy("ingest_key").parquet(
            resolve_current(path) + "/labels"
        )


def cc_labels_compact(
    spark, path: str, rows_per_file: int = 4_000_000
) -> str:
    """Fold a label store's accumulated delta partitions into one
    resolved 'base' generation (the small-files maintenance tick, same
    versioned-root + atomic CURRENT swap and the same single-writer
    quiesce contract as :func:`minhash_index_compact`), range-sorted by
    node with a fresh footer-stats manifest so subsequent updates'
    selective path prunes against it. Returns the new generation
    root."""
    resolved = read_cc_labels(spark, path).withColumn(
        "ingest_key", F.lit("base")
    )
    new_root = next_generation(path)
    # STATIC: the target vN may be a stale generation dir (see
    # minhash_index_compact)
    with overwrite_mode(spark, "static"):
        _cc_sorted_base(spark, resolved, rows_per_file).write.mode(
            "overwrite"
        ).partitionBy("ingest_key").parquet(new_root + "/labels")
    _write_cc_manifest(new_root)
    swap_current(path, new_root)
    return new_root


def cluster_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """One surviving row per near-dup cluster: the min-id member of each
    connected component keeps its full document row; documents in no
    pair survive untouched. This is the final emit of the dedup
    pipeline (exact → LSH pairs → components → keep one per cluster)."""
    comp = connected_components(pairs)
    keep_clustered = comp.groupBy("component").agg(F.min("node").alias(id_col))
    clustered_ids = comp.select(F.col("node").alias(id_col))
    survivors = docs.join(clustered_ids, id_col, "left_anti").select(id_col).union(
        keep_clustered.select(id_col)
    )
    return docs.join(survivors, id_col, "left_semi")
