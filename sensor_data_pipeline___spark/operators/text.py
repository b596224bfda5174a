"""Text-analysis operators for training-data pipelines: quality
scoring, token counting, language-ID heuristic, fingerprinting.

Everything is built-in column expressions (split / transform / filter /
aggregate) — narrow ops that stay inside whole-stage codegen; no Python
in the per-document path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators._caches import BoundedCache

#: Tiny per-language stopword profiles for the n-gram/stopword
#: language-ID heuristic (public-knowledge common words).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "of", "and", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "es": ["el", "la", "de", "que", "los", "un", "es"],
    "zh": ["的", "是", "了", "在", "和"],
}

STOPWORDS_EN = LANG_STOPWORDS["en"] + ["that", "for", "on", "with", "as"]


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality features: token count, average token length,
    stopword ratio. Mirrors the DuckDB oracle in queries.py exactly
    (same stopword list, same rounding)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    avg_token_len = F.length(F.regexp_replace(F.col(text_col), " ", "")) / n_tokens.cast(
        "double"
    )
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "to")))
    return docs.select(
        id_col,
        "n_chars",
        n_tokens.alias("n_tokens"),
        F.round(avg_token_len, 6).alias("avg_token_len"),
        F.round(stop / n_tokens.cast("double"), 6).alias("stopword_ratio"),
    )


def token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword estimate
    (word-chunks + punctuation via regex extraction — a deterministic
    stand-in for a real tokenizer at 4 chars/token granularity)."""
    ws = F.size(F.split(F.col(text_col), r"\s+"))
    # chunk every word into <=4-char pieces, count pieces + punctuation
    bpe_ish = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"\w{1,4}|[^\w\s]"), 0)
    )
    return docs.select(
        id_col, ws.alias("ws_tokens"), bpe_ish.alias("bpe_ish_tokens")
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language ID: score = per-language stopword hit
    count over the token set; prediction = argmax (ties → language name
    order). Returns (id, pred_lang, best_score)."""
    toks = F.array_distinct(_tokens(text_col))

    def _hit(words):
        # closure (not a default arg — PySpark reads the lambda's arity)
        def predicate(t):
            return t.isin(*words)

        return predicate

    scored = docs.select(
        F.col(id_col),
        *[
            F.size(F.filter(toks, _hit(words))).alias(f"_s_{lang}")
            for lang, words in LANG_STOPWORDS.items()
        ],
    )
    langs = list(LANG_STOPWORDS)
    # argmax via array_max over (score, lang) structs — struct comparison
    # is field-order lexicographic, so ties on score resolve to the
    # lexicographically greatest language code (stable, documented).
    score_struct = F.array(
        *[
            F.struct(F.col(f"_s_{lang}").alias("score"), F.lit(lang).alias("lang"))
            for lang in langs
        ]
    )
    best = F.array_max(score_struct)
    return scored.select(
        id_col,
        best["lang"].alias("pred_lang"),
        best["score"].alias("best_score"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 (exact identity) + xxhash64 (cheap
    64-bit) + a rolling-window hash over 8-token windows (shingle
    fingerprint for containment checks)."""
    from sensor_data_pipeline___spark.operators.dedup import _zipped_windows

    toks = F.split(F.col(text_col), r"\s+")
    # zipped shifted slices (one slice per offset, not per window) —
    # same formulation as dedup shingling, ~3x cheaper than per-index
    # slice inside the interpreted transform
    window_hashes = F.transform(
        _zipped_windows(toks, 8),
        lambda s: F.xxhash64(*[s[f"t{i}"] for i in range(8)]),
    )
    return docs.select(
        id_col,
        F.md5(F.col(text_col)).alias("md5"),
        F.xxhash64(F.col(text_col)).alias("xxh64"),
        F.array_min(window_hashes).alias("min_window_hash"),
    )


#: Redaction rules: (pattern, replacement token), applied in order.
#: Simple character-class patterns only — identical semantics in Java
#: regex (Spark) and RE2/PCRE-style engines, so redaction output is
#: cross-engine verifiable. Order matters: hex runs would otherwise be
#: partially eaten by the digit rule.
REDACTION_RULES: tuple[tuple[str, str], ...] = (
    (r"[0-9a-fA-F]{16,}", "<HEX>"),  # long hex runs (keys, hashes)
    (r"[0-9]{7,}", "<ID>"),  # long digit runs (phone/account numbers)
    (r"[0-9]+", "<NUM>"),  # remaining numerics
)


def redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Pattern redaction — the ACTION stage of the PII-scrub pass whose
    detection stage is the ``content_pattern_profile`` query: replace
    sensitive-shaped spans with stable placeholder tokens, in rule
    order. A pure ``regexp_replace`` chain: JVM-side, codegen'd, no
    UDF; the transform is a narrow projection (no shuffle), so it
    composes into any scan at zero extra passes.

    Replaces ``text_col`` in place and records the original length in
    ``orig_n_chars`` so downstream stats can measure redaction volume.
    """
    out = F.col(text_col)
    for pattern, token in REDACTION_RULES:
        out = F.regexp_replace(out, pattern, token)
    return docs.withColumn("orig_n_chars", F.length(F.col(text_col))).withColumn(
        text_col, out
    )


def collapse_repeats(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Intra-document repetition scrub: collapse CONSECUTIVE repeated
    tokens to one occurrence (the Dolma/C4-style within-doc cleanup
    whose cross-doc counterpart is dedup; the trigram_repetition query
    is the detection stage, this is the action). Pure higher-order
    array expressions — one narrow projection, no shuffle, no Python.

    Adds ``n_tokens_before`` / ``n_tokens_after`` audit columns and
    rewrites ``text``. ``F.get`` (0-based, null on out-of-range) not
    ``element_at`` (throws on index 0): filter lambdas are not
    guaranteed to short-circuit, so the i=0 probe of the previous
    token must be total; the null-safe inequality then keeps the
    first token (null previous ⇒ "different")."""
    toks = F.split(F.col(text_col), " ", -1)
    kept = F.filter(
        toks,
        lambda t, i: (i == F.lit(0)) | ~t.eqNullSafe(F.get(toks, i - 1)),
    )
    return (
        docs.withColumn("n_tokens_before", F.size(toks))
        .withColumn("n_tokens_after", F.size(kept))
        .withColumn(text_col, F.array_join(kept, " "))
    )


def char_entropy(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap
    perplexity proxy: degenerate/boilerplate text (repeated chars,
    padding, binary junk) scores low, natural language high.

    Scale shape: explode to (doc, char) then two partial-aggregated
    groupBys — map-side combine collapses each task's chars to
    O(docs × alphabet) before either exchange, so the shuffle never
    carries per-character rows. Entropy uses the sufficient-statistic
    form  log2(L) − Σ c·log2(c) / L  over integer counts; the float
    sum is rounded by callers for cross-engine comparison."""
    chars = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).filter(F.col("ch") != "")
    per = chars.groupBy(id_col, "ch").agg(F.count("*").alias("c"))
    L = F.sum("c")
    return per.groupBy(id_col).agg(
        F.count("*").cast("long").alias("distinct_chars"),
        (
            F.log2(L)
            - F.sum(F.col("c") * F.log2("c")) / L
        ).alias("char_entropy"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap —
    the embedding-prep step (chunk → embed → index) and the
    long-document normalization for context-bounded training.

    One row per (doc, chunk): ``chunk_ix`` (0-based), ``chunk_text``,
    ``chunk_n_tokens``. Chunks start every ``stride`` tokens
    (``stride < chunk_tokens`` ⇒ overlap of ``chunk_tokens − stride``);
    the final chunk is the ragged tail (``slice`` clamps at the array
    end) and every token is covered — chunk count is
    ``ceil(max(size − chunk, 0) / stride) + 1``, computed explicitly
    rather than via a ``sequence(start, stop, step)`` whose stop could
    fall below its start (Spark's ``sequence`` runs DESCENDING then —
    the decontamination-fix pitfall) or stop early and silently drop
    the tail. A document shorter than one chunk yields exactly one
    chunk — never zero, so no document vanishes from the index.

    Shape: narrow projection + explode — no shuffle; the per-chunk
    ``slice`` is interpreted but runs once per CHUNK (~len/stride per
    doc), not once per token position, so the zipped-slices escalation
    the 8-gram path needs is unnecessary here."""
    if not (0 < stride <= chunk_tokens):
        raise ValueError("require 0 < stride <= chunk_tokens")
    toks = F.split(F.col(text_col), " ", -1)
    tail = F.greatest(F.size(toks) - chunk_tokens, F.lit(0))
    nchunks = F.floor((tail + (stride - 1)) / stride).cast("int") + 1
    chunks = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda j: F.struct(
            j.alias("chunk_ix"),
            F.concat_ws(
                " ", F.slice(toks, j * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.size(F.slice(toks, j * stride + 1, chunk_tokens)).alias(
                "chunk_n_tokens"
            ),
        ),
    )
    return docs.select(
        id_col, F.explode(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_ix").alias("chunk_ix"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.chunk_n_tokens").alias("chunk_n_tokens"),
    )


def segment_docs(
    docs: DataFrame,
    seg_tokens: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, seg_idx, segment): fixed-width token windows — the segment
    granularity for cross-document boilerplate analysis on corpora
    whose text has no native line structure (a corpus with newlines
    would segment on those instead; the downstream ops only see
    (id, seg_idx, segment) and don't care). The ragged tail window is
    kept. Narrow: split + slice expressions, one generate — no
    shuffle."""
    toks = F.split(F.col(text_col), r"\s+")
    n_segs = F.ceil(F.size(toks) / F.lit(float(seg_tokens))).cast("int")
    return docs.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_segs - 1)).alias("seg_idx", "_i"),
        toks.alias("_toks"),
    ).select(
        id_col,
        "seg_idx",
        F.concat_ws(
            " ", F.slice(F.col("_toks"), F.col("_i") * seg_tokens + 1, seg_tokens)
        ).alias("segment"),
    )


def drop_repeated_segments(
    docs: DataFrame,
    seg_tokens: int = 10,
    max_repeat: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate removal (the C4/RefinedWeb
    line-dedup recipe at segment granularity): drop every segment
    whose GLOBAL occurrence count exceeds ``max_repeat`` — headers,
    navigation chrome, license blocks that repeat across a crawl — and
    reassemble each document from its surviving segments in order.
    Documents reduced to nothing are dropped (empty text carries no
    training signal).

    Scale shape: segments shuffle once on their md5 (constant-width
    key, not segment text) for the global count; counts join back as
    a hash equi-join; reassembly is one groupBy with
    ``sort_array(collect_list(struct(seg_idx, segment)))`` — order
    restored without a window. Total shuffle volume is O(segments),
    independent of how often boilerplate repeats. Returns
    (id, text, n_dropped_segments)."""
    segs = segment_docs(docs, seg_tokens, text_col, id_col).withColumn(
        "_h", F.md5(F.col("segment"))
    )
    freq = segs.groupBy("_h").agg(F.count("*").alias("_n"))
    flagged = segs.join(freq, "_h").withColumn(
        "_keep", F.col("_n") <= max_repeat
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("_keep"),
                        F.struct("seg_idx", "segment"),
                    )
                )
            ).alias("_kept"),
            F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).alias(
                "n_dropped_segments"
            ),
        )
        .select(
            id_col,
            F.concat_ws(
                " ", F.transform(F.col("_kept"), lambda s: s["segment"])
            ).alias(text_col),
            F.col("n_dropped_segments").cast("long"),
        )
        .filter(F.length(text_col) > 0)
    )


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_avg_len: float = 3.0,
    max_avg_len: float = 10.0,
    min_distinct_trigram_frac: float = 0.3,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Composed Gopher-style document quality filter (Rae et al. 2021
    §A1.1, the public rule set every LLM corpus pipeline re-implements):
    per document, one boolean per rule plus the conjunction — the form
    a pipeline actually ships, where the individual features
    (:func:`quality_features`, the trigram census) are the diagnostics.

    Rules: token count within [min_tokens, max_tokens]; mean token
    length within [min_avg_len, max_avg_len]; distinct-trigram
    fraction ≥ threshold (in-document repetition — the mirror of the
    CROSS-document :func:`drop_repeated_segments`); at least
    ``min_stopword_hits`` distinct stopwords present (the
    gibberish/listing detector). All rules are single-pass narrow
    column expressions over the tokenization — no shuffle, no UDF; at
    100 TB this rides the same scan as ingest parsing.

    Returns (id, n_tokens, ok_token_count, ok_avg_len, ok_repetition,
    ok_stopwords, passed)."""
    toks = _tokens(text_col)
    n = F.size(toks)
    avg_len = F.length(F.regexp_replace(F.col(text_col), " ", "")) / n.cast(
        "double"
    )
    from sensor_data_pipeline___spark.operators.dedup import _zipped_windows

    tri = F.transform(
        _zipped_windows(toks, 3),
        lambda s: F.concat_ws(" ", s["t0"], s["t1"], s["t2"]),
    )
    tri_frac = F.size(F.array_distinct(tri)) / F.size(tri).cast("double")
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to")]),
        )
    )
    ok_count = (n >= min_tokens) & (n <= max_tokens)
    ok_avg = (avg_len >= min_avg_len) & (avg_len <= max_avg_len)
    ok_rep = (F.size(tri) > 0) & (tri_frac >= min_distinct_trigram_frac)
    ok_stop = stop_hits >= min_stopword_hits
    return docs.select(
        F.col(id_col),
        n.alias("n_tokens"),
        ok_count.alias("ok_token_count"),
        ok_avg.alias("ok_avg_len"),
        ok_rep.alias("ok_repetition"),
        ok_stop.alias("ok_stopwords"),
        (ok_count & ok_avg & ok_rep & ok_stop).alias("passed"),
    )


def unigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document unigram cross-entropy under a LM trained on the
    corpus itself — the CCNet-recipe quality signal (Wenzek et al.
    2020: score each doc by LM perplexity, then filter or stratify by
    score bands; a full KenLM is env-blocked here, but the unigram
    member of the family is exactly expressible in relational ops and
    carries the same pipeline shape).

    P(w) = count(w) / total_tokens over the corpus (no smoothing
    needed in-corpus — every scored token was counted), score =
    mean(-ln P(w)) per document: low = stereotypical text, high =
    rare-token-heavy (gibberish or genuinely novel — the CCNet bands).

    Scale shape: explode tokens → one groupBy(token) for the
    frequency table (vocabulary-sized — AQE broadcasts the join back
    when small), token-frequency equi-join, one groupBy(doc) for the
    mean. Shuffle volume O(tokens) with constant-width keys; the
    vocabulary table is the only state and it is a fraction of corpus
    bytes at any scale. Returns (id, n_tokens, avg_neg_logprob)."""
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("tok")
    )
    # the vocabulary table is checkpointed (r15): it feeds BOTH the
    # broadcast total (its own job) and the scoring join — without the
    # materialization the corpus-wide explode + groupBy(token) pass
    # ran once per consumer. Vocabulary-sized, a fraction of corpus
    # bytes at any scale; token counts are integers, so the values are
    # bit-identical however many times they are (re)computed.
    freq = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    total = freq.agg(F.sum("c").alias("t"))
    scored = toks.join(freq, "tok").crossJoin(F.broadcast(total))
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(-F.log(F.col("c") / F.col("t"))), 6).alias(
                "avg_neg_logprob"
            ),
        )
    )


def _gram_key(s, n: int, key: str):
    """n-gram window → constant-width key: multi-arg xxhash64 over the
    window's tokens (no gram string materialized — the scale default)
    or md5 of the joined string (engine-identical — the oracle mode).
    See duplicate_ngram_coverage's docstring for the trade."""
    if key == "md5":
        return F.md5(F.concat_ws(" ", *[s[f"t{i}"] for i in range(n)]))
    return F.xxhash64(*[s[f"t{i}"] for i in range(n)]).cast("string")


def duplicate_ngram_coverage(
    docs: DataFrame,
    n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    key: str = "xxhash64",
) -> DataFrame:
    """Per-document coverage by CROSS-DOCUMENT duplicated ``n``-token
    substrings — the measurement behind exact-substring dedup (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better": drop or trim spans of ≥N tokens that appear verbatim in
    more than one document). A true suffix array doesn't map to
    relational ops, but its n-gram-window form does exactly: a token
    position is covered iff some duplicated n-gram window contains it,
    and the union length of fixed-width sorted intervals folds in one
    pass over each doc's sorted duplicate-window starts:
    ``n + Σ min(n, gap)``.

    Keys are constant-width hashes of the n-gram. The default
    (``key="xxhash64"``) hashes the window's tokens directly —
    multi-arg xxhash64, no per-position 20-token string ever
    materialized, the same trick as ``_hashed_shingles`` and the
    right constant at scale (the md5 variant measured ~0.69 scaling
    exponent at ×10 mostly from gram-string concat+md5 bytes).
    ``key="md5"`` concatenates and md5s the gram string instead —
    engine-identical keys, which is what the DuckDB oracle twin
    recomputes; collision risk is immaterial either way (64-bit over
    ~10⁶ grams per partition-of-comparison), and a pinning test holds
    both variants to identical coverage on the test corpus. Shape: one posexplode (O(tokens) rows), one
    groupBy(md5) census with a HAVING on distinct docs, a hash join
    back, one groupBy(doc) with an in-group sorted fold — no window
    function, no self-join; every shuffle key is fixed-width. The
    reported ``dup_fraction`` is the trim/drop decision input (e.g.
    C4 drops docs with >X% duplicated mass; the span list for actual
    trimming is the same join's output).

    Returns (id, n_tokens, covered_tokens, dup_fraction) for docs with
    at least one duplicated window."""
    from sensor_data_pipeline___spark.operators.dedup import _zipped_windows

    toks = _tokens(text_col)
    grams = docs.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.posexplode(
            F.transform(
                _zipped_windows(toks, n),
                lambda s: _gram_key(s, n, key),
            )
        ).alias("pos", "h"),
    ).filter(F.col("n_tokens") >= n)
    dup = (
        grams.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("h")
    )
    per_doc = (
        grams.join(dup, "h")
        .groupBy(id_col)
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.sort_array(F.collect_list("pos")).alias("_starts"),
        )
    )
    sz = F.size("_starts")
    gaps = F.zip_with(
        F.slice(F.col("_starts"), 2, sz - 1),
        F.slice(F.col("_starts"), 1, sz - 1),
        lambda cur, prev: F.least(F.lit(n), cur - prev),
    )
    covered = F.aggregate(
        gaps, F.lit(n).cast("long"), lambda acc, v: acc + v.cast("long")
    )
    return per_doc.select(
        id_col,
        F.col("n_tokens").cast("long"),
        covered.alias("covered_tokens"),
        F.round(
            covered / F.col("n_tokens").cast("double"), 6
        ).alias("dup_fraction"),
    )


def trim_duplicate_ngrams(
    docs: DataFrame,
    n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    key: str = "xxhash64",
) -> DataFrame:
    """The TRANSFORM half of exact-substring dedup: remove every token
    covered by a cross-document duplicated ``n``-gram window (the Lee
    et al. 2022 action — trim the verbatim-shared spans, keep the
    document's unique remainder; :func:`duplicate_ngram_coverage` is
    the measurement half). Documents trimmed to nothing are dropped.

    Same census/join as the coverage pass; the trim itself is a pure
    column expression — for each doc, token ``i`` survives iff no
    duplicated start ``s`` has ``s ≤ i ≤ s+n−1``, evaluated with a
    nested higher-order filter over the doc's (small, sorted) start
    list. Per-doc cost is O(tokens × dup-starts); dup-starts is
    bounded by tokens, and in practice by the doc's shared mass.
    Untouched documents pass through with their original text.

    Returns (id, text, n_removed_tokens)."""
    from sensor_data_pipeline___spark.operators.dedup import _zipped_windows

    toks = _tokens(text_col)
    grams = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                _zipped_windows(toks, n),
                lambda s: _gram_key(s, n, key),
            )
        ).alias("pos", "h"),
    )
    dup = (
        grams.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("h")
    )
    starts = (
        grams.join(dup, "h")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("_starts"))
    )
    with_starts = docs.join(starts, id_col, "left").withColumn(
        "_starts", F.coalesce(F.col("_starts"), F.array())
    )
    tk = _tokens(text_col)
    idx = F.sequence(F.lit(0), F.size(tk) - 1)
    kept = F.filter(
        F.zip_with(tk, idx, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            F.col("_starts"),
            lambda st: (s["i"] >= st) & (s["i"] <= st + (n - 1)),
        ),
    )
    new_text = F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
    return (
        with_starts.select(
            F.col(id_col),
            new_text.alias(text_col),
            (F.size(tk) - F.size(kept)).cast("long").alias(
                "n_removed_tokens"
            ),
        )
        .filter(F.length(text_col) > 0)
    )


def bpe_pair_counts(
    docs: DataFrame,
    text_col: str = "text",
    top_k: "int | None" = None,
) -> DataFrame:
    """(pair, n) — corpus frequency of every adjacent CHARACTER pair
    inside words: the candidate ranking of byte-pair-encoding's first
    merge step (Sennrich et al. 2016), which at pretraining scale is a
    corpus-wide counting job, not a tokenizer-library detail — vocab
    induction over 100 TB is exactly the kind of pass this engine
    exists for.

    Shape: tokenize → aggregate the word VOCABULARY first (one shuffle
    on word; the explode that follows runs over distinct words, not
    word occurrences — the corpus can repeat a word a billion times,
    the pair explode still costs vocabulary size) → explode each
    word's 2-char substring windows → sum word frequencies per pair
    (one shuffle on pair — a keyspace bounded by alphabet², tiny).
    Pairs are 1-based substring windows, not split-on-empty, because
    substring semantics are identical in every engine (the oracle
    trade documented in operators/sampling.py).

    ``top_k`` adds the (n desc, pair asc) TakeOrdered head — the
    actual merge-candidate list; None returns the full table (the
    input to an iterated BPE driver).
    """
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = words.groupBy("w").agg(F.count("*").alias("freq"))
    pairs = vocab.select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    out = pairs.groupBy("pair").agg(F.sum("freq").alias("n"))
    if top_k is not None:
        out = out.orderBy(F.col("n").desc(), F.col("pair").asc()).limit(
            top_k
        )
    return out


def _rx_lit(s: str) -> str:
    """Quote ``s`` as a LITERAL for Java regex — ``Pattern.quote``:
    wrap in ``\\Q…\\E``, splitting around any embedded ``\\E`` so no
    symbol text can escape the quoted region."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _rx_repl(s: str) -> str:
    """Quote ``s`` as a LITERAL replacement for Java regex —
    ``Matcher.quoteReplacement``: escape backslashes and ``$`` (group
    references)."""
    return s.replace("\\", "\\\\").replace("$", "\\$")


def _merge_rx(col: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping application of ONE merge
    (left, right) to a space-joined symbol string, as a single
    codegen'd ``regexp_replace``: "a a a" with merge (a,a) becomes
    "aa a". Java ``replaceAll`` scans left-to-right and resumes AFTER
    each match, which IS the greedy non-overlapping fold semantics
    (and a merged symbol is replacement text, never rescanned, so it
    cannot re-participate in the same round — exactly the old
    ``F.aggregate`` state machine, which compared the raw next symbol
    against ``left``). The boundary lookarounds are zero-width —
    ``(?<![^ ])`` / ``(?![^ ])`` — so a shared delimiter space stays
    available to the next candidate match, and symbol-internal
    substrings can never match (symbols never contain spaces — the
    exact-replay contract with the recursive-CTE oracles). Replaced
    the interpreted per-symbol struct fold in r16: higher-order
    ``F.aggregate`` does not codegen and measured ~10× slower than
    JVM regex on the same pass."""
    pat = f"(?<![^ ]){_rx_lit(left)} {_rx_lit(right)}(?![^ ])"
    return F.regexp_replace(col, pat, _rx_repl(left + right))


def _learn_merges(
    docs: DataFrame, k: int, text_col: str
) -> "list[tuple[int, str, int]]":
    """The iterated-BPE driver loop shared by :func:`bpe_learn_merges`
    (returns the table) and :func:`save_bpe_vocab` (persists it):
    k rounds of vocabulary-weighted pair counting + one bounded argmax
    collect + the greedy merge fold, ``localCheckpoint`` per round.
    Returns [(merge_rank, "left right", n), ...]."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    vocab = (
        words.groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("s"), "freq"
        )
        .localCheckpoint(eager=True)
    )
    merges: "list[tuple[int, str, int]]" = []
    for rnd in range(1, k + 1):
        syms = F.split(F.col("s"), " ", -1)
        # sequence(1, 0) would be DESCENDING in Spark — guard the
        # single-symbol (fully merged) words to an empty pair list,
        # matching generate_series's empty result
        idxs = F.when(
            F.size(syms) >= 2, F.sequence(F.lit(1), F.size(syms) - 1)
        ).otherwise(F.array().cast("array<int>"))
        pair_col = F.explode(
            F.transform(
                idxs,
                lambda i: F.concat_ws(
                    " ", F.element_at(syms, i), F.element_at(syms, i + 1)
                ),
            )
        )
        counts = (
            vocab.select("freq", pair_col.alias("pair"))
            .groupBy("pair")
            .agg(F.sum("freq").alias("n"))
        )
        best = counts.orderBy(
            F.col("n").desc(), F.col("pair").asc()
        ).limit(1).collect()
        if not best:
            break  # vocabulary fully merged — nothing left to count
        pair, n = best[0]["pair"], best[0]["n"]
        left, right = pair.split(" ")
        merges.append((rnd, pair, int(n)))
        if rnd == k:
            # the post-round fold is only input to round rnd+1 — after
            # the final argmax it is dead work (r16: was an
            # unconditional fold + checkpoint job per round)
            break
        vocab = vocab.select(
            _merge_rx(F.col("s"), left, right).alias("s"), "freq"
        )
        # checkpoint every other round, not every round (r16): the
        # next round's argmax job re-runs at most ONE lazy regexp fold
        # past the last cut — cheaper than the per-round checkpoint
        # job it replaces — while the cadence still bounds the live
        # plan at 2 fold rounds for any k (the apply_merge_rounds
        # chunked posture)
        if rnd % 2 == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def bpe_learn_merges(
    docs: DataFrame, k: int = 5, text_col: str = "text"
) -> DataFrame:
    """(merge_rank, pair, n) — the first ``k`` LEARNED byte-pair
    merges (Sennrich et al. 2016), closing the loop from
    :func:`bpe_pair_counts`'s one-shot candidate ranking to an actual
    iterated vocabulary induction (VERDICT r8 directive #6).

    Each round: count adjacent symbol pairs over the VOCABULARY
    (weighted by word frequency — the explode costs distinct words,
    never word occurrences), pick the (n DESC, pair ASC) argmax as one
    bounded driver scalar, then apply the merge to every word with the
    standard greedy left-to-right non-overlapping fold ("a a a" with
    merge (a,a) becomes "aa a"), expressed as an ``F.aggregate`` state
    machine (prefix, last) — a narrow codegen'd pass, no UDF. The
    vocabulary is ``localCheckpoint``-ed per round, the same
    iterative-DataFrame posture as ``graph.pagerank`` (k bounded
    shuffles over a vocabulary-sized table; lineage cut per round).

    Exactly replayable by CTE unrolling: the same fold is a per-word
    recursive state machine in ANSI SQL (:func:`bpe_merges_oracle_sql`)
    — symbols never contain spaces, so the space-joined symbol string
    is a faithful sequence encoding in both engines.
    """
    from sensor_data_pipeline___spark.operators._local import local_df

    return local_df(
        docs.sparkSession,
        _learn_merges(docs, k, text_col),
        "merge_rank int, pair string, n long",
    )


def _bpe_learn_parts(table: str, k: int) -> "list[str]":
    """The learn-phase CTE parts shared by
    :func:`bpe_merges_oracle_sql` and :func:`bpe_encode_oracle_sql`:
    vocab0..vocab{k} (the evolving reference vocabulary) and
    best1..best{k} (the per-round (n DESC, pair ASC) argmax merges)."""
    parts = [
        f"""vocab0 AS MATERIALIZED (
      SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s,
             count(*)::BIGINT AS freq
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM {table})
      WHERE len(w) >= 2
      GROUP BY w
    )"""
    ]
    for r in range(1, k + 1):
        prev = f"vocab{r - 1}"
        parts.append(f"""pairs{r} AS MATERIALIZED (
      SELECT syms[i] || ' ' || syms[i+1] AS pair, sum(freq)::BIGINT AS n
      FROM (SELECT string_split(s, ' ') AS syms, freq FROM {prev}),
           unnest(generate_series(1, len(syms)-1)) AS g(i)
      GROUP BY 1
    )""")
        parts.append(
            f"best{r} AS MATERIALIZED (SELECT pair, n FROM pairs{r} "
            f"ORDER BY n DESC, pair ASC LIMIT 1)"
        )
        parts.append(f"""fold{r} AS (
      SELECT freq, syms, 2 AS i, ''::TEXT AS pre, syms[1] AS last
      FROM (SELECT string_split(s, ' ') AS syms, freq FROM {prev})
      UNION ALL
      SELECT freq, syms, i + 1,
        CASE WHEN last = (SELECT split_part(pair,' ',1) FROM best{r})
              AND syms[i] = (SELECT split_part(pair,' ',2) FROM best{r})
             THEN pre ELSE pre || ' ' || last END,
        CASE WHEN last = (SELECT split_part(pair,' ',1) FROM best{r})
              AND syms[i] = (SELECT split_part(pair,' ',2) FROM best{r})
             THEN last || syms[i] ELSE syms[i] END
      FROM fold{r} WHERE i <= len(syms)
    )""")
        parts.append(
            f"vocab{r} AS MATERIALIZED (SELECT trim(pre || ' ' || last) AS s, freq "
            f"FROM fold{r} WHERE i = len(syms) + 1)"
        )
    return parts


def bpe_merges_oracle_sql(table: str = "documents", k: int = 5) -> str:
    """The ANSI twin of :func:`bpe_learn_merges`: k rounds unrolled as
    chained CTEs — pair counting over the evolving vocabulary, an
    (n DESC, pair ASC) argmax per round, and the greedy merge fold as
    a per-word RECURSIVE state machine carrying (prefix, last) —
    the same exact-replay pattern as ``graph.pagerank_oracle_sql``."""
    parts = _bpe_learn_parts(table, k)
    unions = "\n      UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS merge_rank, pair, n FROM best{r}"
        for r in range(1, k + 1)
    )
    return (
        "WITH RECURSIVE\n    "
        + ",\n    ".join(parts)
        + f"\n    {unions}"
    )


def _bpe_encode_parts(table: str, k: int) -> "list[str]":
    """The encode-phase CTE parts of :func:`bpe_encode_oracle_sql`
    (appended after :func:`_bpe_learn_parts`): the DISTINCT corpus
    word list char-split (ew0), k chained recursive merge folds
    carrying the original word (ef1..ef{k} / ew1..ew{k} — the same
    (prefix, last) state machine as the learn phase's fold{r}, re-run
    per CORPUS word instead of per reference-vocabulary entry), and
    the positional reassembly (dw / encd). If learning exhausted
    before round r (best{r} empty), the scalar subqueries are NULL,
    the CASE never matches, and the fold is a faithful no-op — the
    same early-break the Spark side takes."""
    parts = [
        f"""ew0 AS MATERIALIZED (
      SELECT w, trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s
      FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
            FROM {table})
      WHERE len(w) >= 1
    )"""
    ]
    for r in range(1, k + 1):
        parts.append(f"""ef{r} AS (
      SELECT w, syms, 2 AS i, ''::TEXT AS pre, syms[1] AS last
      FROM (SELECT w, string_split(s, ' ') AS syms FROM ew{r - 1})
      UNION ALL
      SELECT w, syms, i + 1,
        CASE WHEN last = (SELECT split_part(pair,' ',1) FROM best{r})
              AND syms[i] = (SELECT split_part(pair,' ',2) FROM best{r})
             THEN pre ELSE pre || ' ' || last END,
        CASE WHEN last = (SELECT split_part(pair,' ',1) FROM best{r})
              AND syms[i] = (SELECT split_part(pair,' ',2) FROM best{r})
             THEN last || syms[i] ELSE syms[i] END
      FROM ef{r} WHERE i <= len(syms)
    )""")
        parts.append(
            f"ew{r} AS MATERIALIZED (SELECT w, trim(pre || ' ' || last)"
            f" AS s FROM ef{r} WHERE i = len(syms) + 1)"
        )
    parts.append(f"""dw AS (
      SELECT doc_id, ws[i] AS w, i
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM {table}),
           unnest(generate_series(1, len(ws))) AS g(i)
      WHERE len(ws[i]) > 0
    )""")
    parts.append(f"""encd AS (
      SELECT doc_id, string_agg(s, ' ' ORDER BY i) AS encoded
      FROM dw JOIN ew{k} USING (w)
      GROUP BY doc_id
    )""")
    return parts


def bpe_encode_oracle_sql(table: str = "documents", k: int = 5) -> str:
    """The ANSI twin of fit-then-encode (:func:`save_bpe_vocab` on
    ``table`` + :func:`encode_against_vocab` over the same table):
    the k learned merges come from :func:`_bpe_learn_parts`'s chain,
    then every DISTINCT corpus word is char-split and folded through
    the k merges in rank order (:func:`_bpe_encode_parts`), and docs
    are reassembled positionally. The LEFT join keeps zero-word docs
    as (n_tokens 0, encoded '') — matching the Spark side's map-only
    projection, which preserves every input row."""
    parts = _bpe_learn_parts(table, k) + _bpe_encode_parts(table, k)
    return (
        "WITH RECURSIVE\n    "
        + ",\n    ".join(parts)
        + f"""
    SELECT d.doc_id,
           CAST(coalesce(len(string_split(e.encoded, ' ')), 0) AS BIGINT)
             AS n_tokens,
           coalesce(e.encoded, '') AS encoded
    FROM {table} d LEFT JOIN encd e USING (doc_id)"""
    )


def save_bpe_vocab(
    ref_docs: DataFrame,
    path: str,
    k: int = 5,
    text_col: str = "text",
) -> None:
    """Fit a BPE vocabulary on a REFERENCE corpus and persist it —
    the missing encode half of the tokenizer loop (VERDICT r9
    directive #1): :func:`bpe_learn_merges` learns merges,
    THIS persists them, :func:`encode_against_vocab` applies them to
    any corpus. The same fit-once-offline / probe-O(batch) persisted-
    index posture as :func:`save_unigram_lm`.

    Layout: ``merges/`` one parquet of (merge_rank, left, right, n),
    rank order = application order (BPE merges are order-sensitive).
    The table is k rows — driver-bounded by construction, so encode
    time collects it whole and inlines the merges as codegen'd fold
    literals rather than joining."""
    from sensor_data_pipeline___spark.operators._local import local_df

    merges = _learn_merges(ref_docs, k, text_col)
    rows = [
        (rank, pair.split(" ")[0], pair.split(" ")[1], n)
        for rank, pair, n in merges
    ]
    local_df(
        ref_docs.sparkSession,
        rows,
        "merge_rank int, left string, right string, n long",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/merges")


def load_bpe_merges(spark, path: str) -> "list[tuple[str, str]]":
    """The ordered (left, right) merge list of a
    :func:`save_bpe_vocab` store — k rows, a bounded driver collect
    (the same scalar class as the watermark pattern,
    operators/incremental.py:38)."""
    rows = (
        spark.read.parquet(path + "/merges")
        .orderBy("merge_rank")
        .collect()
    )
    return [(r["left"], r["right"]) for r in rows]


def encode_against_vocab(
    spark,
    path: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    strategy: str = "auto",
    checkpoint_every: int = 64,
    word_encoder: str = "auto",
) -> DataFrame:
    """Tokenize a batch against a :func:`save_bpe_vocab` store:
    ``(id_col, n_tokens, encoded)`` where ``encoded`` is the
    space-joined BPE token sequence (symbols never contain spaces, so
    the join is a faithful sequence encoding — the same exact-replay
    contract as :func:`_merge_rx`) and ``n_tokens`` counts REAL
    learned-vocabulary tokens, the number :func:`queries.pack_sequences`
    wants instead of whitespace word counts.

    Two strategies, selected by merge-list size (VERDICT r11
    directive #1 — the large-k story):

    - ``inline`` (auto for k ≤ 64): map-only — each word is
      char-split then folded through the k merges in rank order via
      :func:`_merge_rx` regexp rounds (codegen'd ``regexp_replace``,
      no UDF). NO shuffle, NO join: the merge list is k
      driver-bounded literals baked into the plan, so this is a
      narrow pass that scales with input splits — encoding never
      moves a row. The plan is k stacked projections, so Catalyst
      analysis is linear-ish in k: the right shape for demo-sized
      vocabularies, the wrong one at production k≈30k.
    - ``word_cache`` (auto for k > 64): BPE is word-local, so encode
      the DISTINCT words — a vocabulary-sized table, orders of
      magnitude under the corpus — through the same per-round fold
      chain, cut the plan every ``checkpoint_every`` rounds with the
      repo's chunked ``localCheckpoint`` posture (``_learn_merges``,
      text.py) so analysis stays O(k) while only the tiny word table
      ever materializes, then hash-join the word→tokens map back to
      the posexploded corpus and regroup by document. Corpus-side
      cost: one explode + join + one groupBy — INDEPENDENT of k,
      which is what makes a 30k-merge vocabulary viable at 100 TB
      (the word side is broadcast-eligible and AQE picks that up at
      real scales). Measured at sf0.1 in SCALING.md (k∈{5,32,256}).

    Within word_cache, ``word_encoder`` picks how the distinct-word
    table itself is encoded: ``"arrow"`` (:func:`_arrow_word_encode` —
    Arrow-batched Python with a set-membership guard per merge,
    amortizing k away for the huge majority of merges that cannot
    touch a given word; the auto default up to k=4096),
    ``"rankdict"`` (:func:`_rankdict_word_encode` — greedy
    lowest-rank-pair merging off a hash map, per-word cost
    INDEPENDENT of k: the production-tokenizer shape and the auto
    default above k=4096, valid for the well-formed merge lists
    :func:`save_bpe_vocab` emits) or ``"fold"`` (the JVM merge-fold
    chain with chunked ``localCheckpoint``, O(vocab × k) expression
    evaluation — the pure-JVM fallback for clusters where Python
    workers are unwelcome in the plan).

    Every input row is preserved on both paths (zero-word/NULL docs
    encode to n_tokens 0 / encoded '').

    Expression shape matters on the inline path: each merge round is
    its OWN projection over the per-doc word-symbol array, and inside
    a round the fold only references its ``transform`` lambda
    variable. Chaining the rounds as one nested Python-built
    expression instead (fold-of-fold-of-fold on the raw string)
    re-embeds each round's whole subtree at every one of the ~4
    places the next round references it — a 4^k expression blowup
    that measured 239 s at sf0.1 (vs ~2 s for this form) before
    Catalyst ever saw a row."""
    merges = load_bpe_merges(spark, path)
    if strategy == "auto":
        strategy = "inline" if len(merges) <= 64 else "word_cache"
    if strategy == "inline":
        out = apply_merge_rounds(
            docs.select(F.col(id_col), F.col(text_col)),
            merges,
            text_col,
            "_toks",
        )
        return out.select(
            id_col,
            F.size("_toks").cast("long").alias("n_tokens"),
            F.array_join("_toks", " ").alias("encoded"),
        )
    if strategy != "word_cache":
        raise ValueError(f"unknown encode strategy: {strategy!r}")
    if word_encoder == "auto":
        # measured at every k in {5, 32, 256} (SCALING.md r12): the
        # Arrow per-word pass beats the fold chain's O(vocab × k) JVM
        # expression evaluation throughout word_cache's regime and the
        # gap widens with k (no crossover in fold's favor). Above
        # k=4096 the Arrow pass's own O(k) per-word guard sweep
        # becomes the cost and the rank-dict greedy (per-word cost
        # independent of k — the production-tokenizer shape) takes
        # over; learned vocabularies are well-formed, which is the
        # precondition rankdict needs (see _rankdict_word_encode).
        # "fold" stays available as the pure-JVM path (no Python
        # workers in the plan) and keeps its pins.
        word_encoder = "arrow" if len(merges) <= 4096 else "rankdict"
    words_arr = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1),
        lambda w: F.length(w) > 0,
    )
    exploded = docs.select(
        F.col(id_col), F.posexplode(words_arr).alias("_pos", "_w")
    )
    vocab = exploded.select(F.col("_w").alias("w")).distinct()
    if word_encoder == "fold":
        enc = apply_merge_rounds(
            vocab, merges, "w", "_wtoks",
            checkpoint_every=checkpoint_every,
        ).select(F.col("w").alias("_w"), "_wtoks")
    elif word_encoder == "arrow":
        enc = _arrow_word_encode(vocab, merges).select(
            F.col("w").alias("_w"), "_wtoks"
        )
    elif word_encoder == "rankdict":
        enc = _rankdict_word_encode(vocab, merges).select(
            F.col("w").alias("_w"), "_wtoks"
        )
    else:
        raise ValueError(f"unknown word_encoder: {word_encoder!r}")
    regrouped = (
        exploded.join(enc, "_w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("_pos").alias("p"),
                                F.col("_wtoks").alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                )
            ).alias("_toks")
        )
    )
    spine = docs.select(id_col)
    out = spine.join(regrouped, id_col, "left").withColumn(
        "_toks",
        F.coalesce(F.col("_toks"), F.array().cast("array<string>")),
    )
    return out.select(
        id_col,
        F.size("_toks").cast("long").alias("n_tokens"),
        F.array_join("_toks", " ").alias("encoded"),
    )


def _arrow_word_encode(
    vocab: DataFrame, merges: "list[tuple[str, str]]"
) -> DataFrame:
    """``(w, _wtoks)`` — BPE-encode each DISTINCT word with an
    Arrow-batched Python loop instead of the JVM fold chain: the
    word-cache strategy's per-word term costs O(vocab × k) expression
    evaluation under the folds, which is the one k-proportional cost
    word_cache retains; at production merge counts (k in the
    thousands) the per-word Python pass — a set-membership guard per
    merge (both operand symbols must be live in the word, O(1)) plus
    the greedy left-to-right pass only for merges that can fire —
    beats it by roughly the ratio of merges that cannot touch the
    word, which is nearly all of them (SCALING.md r12). Semantics are
    EXACTLY the fold's sequential full-pass-per-merge in rank order,
    valid for any merge list; the merge list (k driver-bounded rows)
    ships in the task closure."""

    def _encode_batches(it):
        import pandas as pd

        def enc(w: str) -> "list[str]":
            syms = list(w)
            present = set(syms)
            for left, right in merges:
                if left not in present or right not in present:
                    continue
                out: "list[str]" = []
                i, n, hit = 0, len(syms), False
                while i < n:
                    if (
                        i + 1 < n
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                        hit = True
                    else:
                        out.append(syms[i])
                        i += 1
                if hit:
                    syms = out
                    present = set(syms)
            return syms

        for pdf in it:
            yield pd.DataFrame(
                {"w": pdf["w"], "_wtoks": [enc(w) for w in pdf["w"]]}
            )

    return vocab.mapInPandas(
        _encode_batches, "w string, _wtoks array<string>"
    )


def _rankdict_word_encode(
    vocab: DataFrame, merges: "list[tuple[str, str]]"
) -> DataFrame:
    """``(w, _wtoks)`` — BPE-encode each DISTINCT word by repeatedly
    merging its lowest-RANK adjacent pair (one full left-to-right
    pass per selected rank), looked up in a hash map: per-word cost
    is O(passes × word_len), INDEPENDENT of k — the production
    tokenizer shape (HuggingFace/tiktoken encode greedily by min
    rank), where :func:`_arrow_word_encode` still pays an O(k) guard
    sweep per word. At k ≈ 30k that sweep IS the cost; this is the
    encoder that makes real vocabularies flat in k (measured in
    SCALING.md r12, k up to 32768).

    Semantics: equivalent to the sequential full-pass-per-merge rank
    order (:func:`_merge_rx`) for WELL-FORMED merge lists — ones
    where each merge's operands are only producible by strictly
    earlier merges, which is what :func:`_learn_merges` /
    :func:`save_bpe_vocab` emit (a merge never re-enables an
    earlier-rank pair, so greedy-by-rank visits the same passes in
    the same order, skipping no-ops; pinned against the pure-Python
    sequential reference in tests/test_properties.py). For ARBITRARY
    hand-built lists (e.g. a pair whose operands are created by a
    LATER merge, or symbol aliasing where two different merge chains
    build equal strings) the two orders can diverge — use
    ``word_encoder="arrow"`` there; duplicate pairs keep their first
    (lowest) rank here."""
    enc = _make_rankdict_encoder(merges)

    def _encode_batches(it):
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {"w": pdf["w"], "_wtoks": [enc(w) for w in pdf["w"]]}
            )

    return vocab.mapInPandas(
        _encode_batches, "w string, _wtoks array<string>"
    )


def _make_rankdict_encoder(merges: "list[tuple[str, str]]"):
    """The greedy lowest-rank-pair word encoder as a picklable
    closure — the shared core of :func:`_rankdict_word_encode` (batch
    word-cache) and :func:`rankdict_token_count` (streaming row-local).
    Per-word cost O(passes × word_len), independent of k; valid for
    WELL-FORMED merge lists (see :func:`_rankdict_word_encode`)."""
    rank: "dict[tuple[str, str], int]" = {}
    for i, pair in enumerate(merges):
        rank.setdefault(pair, i)

    def enc(w: str) -> "list[str]":
        syms = list(w)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                rk = rank.get((syms[i], syms[i + 1]))
                if rk is not None and (best is None or rk < best):
                    best = rk
            if best is None:
                break
            left, right = merges[best]
            # one full left-to-right pass for the selected rank —
            # exactly one _merge_rx round
            out: "list[str]" = []
            i, n = 0, len(syms)
            while i < n:
                if (
                    i + 1 < n
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    return enc


def rankdict_token_count(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    out_col: str = "n_tokens_bpe",
) -> DataFrame:
    """Stamp ``out_col`` = the REAL learned-vocabulary BPE token count
    of ``text_col`` in ONE stateless Arrow pass — the PRODUCTION-k
    streaming tokenize (VERDICT r12 directive #6). The inline
    :func:`apply_merge_rounds` plan is k stacked projections: fine at
    demo k ≤ 64, prohibitive at k ≈ 30k (Catalyst analysis alone
    creeps superlinear, and the per-row fold cost is linear in k).
    This instead ships the rank dict in the task closure and encodes
    per word with the greedy lowest-rank-pair loop — per-word cost
    independent of k — memoizing word → token count per Arrow
    partition (a batch's DISTINCT words are far fewer than its word
    occurrences; the memo is the row-local analogue of the batch
    word-cache strategy's distinct-word table, bounded by the
    partition's vocabulary and dropped with the task).

    Streaming-legal: purely row-local and deterministic (no state, no
    join, no shuffle) — same replay-stability argument as the inline
    enrichment it replaces at large k. Matches the inline path's
    semantics exactly for the WELL-FORMED merge lists
    :func:`save_bpe_vocab` emits (the :func:`_rankdict_word_encode`
    contract): NULL text → 0 tokens; whitespace runs contribute no
    empty words; a word of length 1 is one token."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        df.schema.fields + [StructField(out_col, LongType())]
    )

    def _batches(it):
        enc = _make_rankdict_encoder(merges)
        memo: "dict[str, int]" = {}

        def count(text) -> int:
            if text is None:
                return 0
            tot = 0
            for w in text.split(" "):
                if not w:
                    continue
                c = memo.get(w)
                if c is None:
                    c = len(enc(w))
                    memo[w] = c
                tot += c
            return tot

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [count(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(_batches, out_schema)


def stamp_bpe_token_count(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str = "text",
    out_col: str = "n_tokens_bpe",
) -> DataFrame:
    """The tokenize-at-ingest enrichment with the batch encode's auto
    dispatch brought to streaming: demo-sized merge lists (k ≤ 64)
    take the pure-JVM inline fold chain (:func:`apply_merge_rounds` —
    codegen'd, oracle-twinned), production-sized ones the row-local
    rank-dict Arrow pass (:func:`rankdict_token_count`), whose
    per-row cost is flat in k. Both are stateless row-local
    projections, so either is legal on a streaming DataFrame; both
    stamp the same counts for well-formed (learned) vocabularies
    (pinned by test)."""
    if len(merges) <= 64:
        return (
            apply_merge_rounds(df, merges, text_col, "_bpe_toks")
            .withColumn(out_col, F.size("_bpe_toks").cast("long"))
            .drop("_bpe_toks")
        )
    return rankdict_token_count(df, merges, text_col, out_col)


def apply_merge_rounds(
    df: DataFrame,
    merges: "list[tuple[str, str]]",
    text_col: str,
    out_col: str,
    checkpoint_every: int = 0,
) -> DataFrame:
    """Append ``out_col`` = the BPE token array of ``text_col`` under
    the ordered ``merges`` list — the shared encode core of
    :func:`encode_against_vocab` and the streaming tokenize-at-ingest
    enrichment (``streaming/pipeline.py:corpus_ingest_stream``).
    Purely row-local and deterministic, so it is legal on streaming
    DataFrames (with the default ``checkpoint_every=0``); each merge
    round is its OWN plain projection (the linear expression shape —
    see :func:`encode_against_vocab`'s docstring for the measured 4^k
    trap the per-round aliasing avoids).

    Representation (r16): the whole document rides ONE space-joined
    symbol string — each word char-split, words joined by a DOUBLE
    space. Symbols never contain spaces, so a merge pattern
    (``"L R"``, single interior space) can never match across the
    two-space word boundary, and every merge round is a single
    codegen'd ``regexp_replace`` over one string column
    (:func:`_merge_rx`) instead of a per-word interpreted
    ``F.aggregate`` fold under a ``transform`` lambda — the r15
    undersplit profile showed this fold as the dominant CPU sink of
    every BPE-lifecycle query, and higher-order functions never
    codegen. The final token array splits on spaces and drops the
    empties the double boundaries leave.

    ``checkpoint_every=N`` (batch only) cuts the plan with an eager
    ``localCheckpoint`` every N merge rounds — the ``_learn_merges``
    chunked posture. A k-projection plan is linear to BUILD but
    Catalyst re-walks the whole tree per added node, so analysis
    creeps superlinear past a few hundred rounds; chunking caps the
    live plan at N projections. Only worth paying when ``df`` is
    small (the word-cache encode's distinct-word table — vocabulary-
    sized), since each cut materializes ``df`` to executor storage."""
    words = F.filter(
        # NULL text encodes like empty text (empty token array),
        # matching the batch oracle's LEFT-join fallback row
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1),
        lambda w: F.length(w) > 0,
    )
    df = df.withColumn(
        out_col,
        F.array_join(
            F.transform(
                words, lambda w: F.trim(F.regexp_replace(w, "(.)", "$1 "))
            ),
            "  ",
        ),
    )
    for i, (left, right) in enumerate(merges, 1):
        df = df.withColumn(
            out_col, _merge_rx(F.col(out_col), left, right)
        )
        if (
            checkpoint_every
            and i % checkpoint_every == 0
            and i < len(merges)
        ):
            df = df.localCheckpoint(eager=True)
    return df.withColumn(
        out_col,
        F.filter(
            F.split(F.col(out_col), " ", -1),
            lambda s: F.length(s) > 0,
        ),
    )


#: path -> (total, vocab, cut1, cut2). LM geometry is immutable for a
#: store's lifetime (only a fresh save_unigram_lm changes it, which
#: invalidates here) — the per-batch scoring loop shouldn't pay a
#: driver job re-reading the one-row meta parquet every trigger.
_LM_META_CACHE: dict = BoundedCache()


def save_unigram_lm(
    ref_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist a unigram LM fit on a REFERENCE corpus, plus the CCNet
    band cut points (Wenzek et al. 2020: score documents by LM
    perplexity, split the reference's score distribution into
    head/middle/tail terciles, then filter or stratify incoming data
    by band). The streaming stack scores every micro-batch against
    THIS store (:func:`unigram_bands_against_lm`) — fit once offline,
    probe O(batch), the same persisted-index posture as
    ``save_dsir_index``.

    Layout: ``freq/`` (tok, c) sorted by token (vocabulary-sized — a
    fraction of corpus bytes at any scale, broadcast candidate at
    probe time) and ``meta/`` one row (total, vocab, cut1, cut2).
    Scoring smooths add-one over the stored vocabulary
    (``-ln((c+1)/(total+vocab))``), so out-of-vocabulary probe tokens
    score at the rare-token ceiling instead of dividing by zero; the
    reference's own scores (same smoothing) fix the tercile cuts.
    Scores are rounded to 6dp BEFORE the cuts and band compares, so
    cross-engine ln/summation-order noise cannot flip a band."""
    from sensor_data_pipeline___spark.operators._local import local_df

    from sensor_data_pipeline___spark.operators import _probe_cache

    spark = ref_docs.sparkSession
    toks = ref_docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("tok")
    )
    # Materialize the vocabulary ONCE before any store write (the agg,
    # the self-scoring join, and the final freq/ write all reuse it).
    # ALL validation runs against this in-memory copy BEFORE the first
    # mode('overwrite') touches the store: a failed fit on an empty
    # corpus must never leave a mixed-generation store (empty freq/ +
    # stale meta/) that later loads without error and silently
    # mis-bands every batch — review r10.
    freq = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("double").alias("c"))
        .localCheckpoint(eager=True)
    )
    agg = freq.agg(
        F.sum("c").alias("t"), F.count("*").cast("double").alias("v")
    ).first()
    if agg["t"] is None:
        # empty reference fit: no tokens were counted at all — refuse
        # loudly, BEFORE writing anything, instead of persisting a
        # store with no distribution (the empty-seed posture of
        # save_minhash_index / save_contamination_index is an empty
        # but VALID store; an LM with no distribution has no valid
        # smoothing constants or band cuts — review r9/r10)
        raise ValueError(
            "save_unigram_lm: reference corpus produced no scores "
            "(empty or all-unsplittable docs) — cannot fit an LM"
        )
    total, vocab = float(agg["t"]), float(agg["v"])
    # self-score the reference to fix the band cuts (exact percentile
    # over 6dp-rounded scores — one bounded aggregate)
    ref_scores = (
        toks.join(freq, "tok")
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(-F.log((F.col("c") + 1.0) / F.lit(total + vocab))), 6
            ).alias("s")
        )
    )
    cuts = ref_scores.agg(
        F.percentile("s", F.lit(1.0 / 3.0)).alias("c1"),
        F.percentile("s", F.lit(2.0 / 3.0)).alias("c2"),
    ).first()
    if cuts["c1"] is None or cuts["c2"] is None:
        # unreachable once the freq guard passed (non-empty freq ⇒
        # non-empty toks ⇒ the self-score join matches ⇒ percentile
        # over ≥1 score) — kept as a belt against future refactors;
        # still fires BEFORE any write
        raise ValueError(
            "save_unigram_lm: reference corpus produced no scores "
            "(empty or all-unsplittable docs) — cannot fit band cuts"
        )
    # validation passed — only now mutate the store (and the caches
    # keyed on it)
    _LM_META_CACHE.pop(path, None)
    _probe_cache.invalidate(path)  # freq is rewritten under this root
    freq.sortWithinPartitions("tok").write.mode("overwrite").parquet(
        path + "/freq"
    )
    meta = local_df(
        spark,
        [(total, vocab, float(cuts["c1"]), float(cuts["c2"]))],
        "total double, vocab double, cut1 double, cut2 double",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(path + "/meta")


def _load_lm_meta(spark, path: str) -> tuple:
    if path not in _LM_META_CACHE:
        r = spark.read.parquet(path + "/meta").first()
        _LM_META_CACHE[path] = (
            float(r["total"]), float(r["vocab"]),
            float(r["cut1"]), float(r["cut2"]),
        )
    return _LM_META_CACHE[path]


def unigram_bands_against_lm(
    spark,
    path: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cache_store: bool = True,
) -> DataFrame:
    """Score a batch against a :func:`save_unigram_lm` store and
    assign CCNet bands: ``(id_col, n_tokens, lm_score, band)`` with
    band = 'head' (score <= cut1), 'middle' (<= cut2), else 'tail' —
    low score = stereotypical reference-like text.

    Plan: explode batch tokens → LEFT join the vocabulary-sized freq
    table (broadcast candidate; OOV tokens coalesce to count 0 and
    take the add-one ceiling) → one partial-aggregated groupBy(doc).
    The store is never re-fit or shuffled; determinism is what lets
    the streaming admission stay effectively-once under replay.
    ``cache_store`` (default on) checkpoints the freq table once per
    store — it is IMMUTABLE after save (the LM has no append path),
    so per-batch scoring is a memory scan, not a parquet re-read."""
    from sensor_data_pipeline___spark.operators import _probe_cache

    total, vocab, cut1, cut2 = _load_lm_meta(spark, path)
    freq = _probe_cache.immutable_read(
        spark, path, "freq", "tok string, c double", cache=cache_store
    )
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("tok")
    )
    neg_lp = -F.log(
        (F.coalesce(F.col("c"), F.lit(0.0)) + 1.0) / F.lit(total + vocab)
    )
    scored = (
        toks.join(freq, "tok", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(neg_lp), 6).alias("lm_score"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        "lm_score",
        F.when(F.col("lm_score") <= cut1, "head")
        .when(F.col("lm_score") <= cut2, "middle")
        .otherwise("tail")
        .alias("band"),
    )
