"""Hashed-ngram linear classifier — fit and score as DataFrame ops.

The distill-the-expensive-judge pattern every large-scale training-data
pipeline converges on (CCNet's fastText language/quality filters, the
GPT-3 data work's LR-over-features quality classifier): an expensive
gate — human labels, an LLM judge, a slow heuristic conjunction —
labels a bounded reference set, a CHEAP linear model over hashed token
features learns to mimic it, and the cheap model scores the full
corpus as a map-side pass. This module is that loop, Spark-first:

- :func:`featurize_hashed` — bag-of-hashed-unigram counts
  (md5 → 32-bit → mod ``n_buckets``, the ``dsir._bucket``
  construction) plus a constant bias feature per document;
- :func:`fit_linear_classifier` — full-batch gradient descent with
  MEAN-CENTERED features, each iteration two joins plus bounded
  aggregations over the cached feature table;
- :func:`classifier_score` — broadcast the (``n_buckets``+1)-row
  weight table, one per-doc sum, squash.

Centering WITHOUT densifying: raw bag-of-words counts are
all-positive and badly conditioned for GD (every gradient step pushes
all weights the same direction and the model saturates at the base
rate). Centering fixes that, but materializing ``x − mean`` would turn
the sparse feature table dense — ``n_buckets × corpus`` rows, a
non-starter at 100 TB. The loop instead keeps the algebraic identity
sparse:

    s(d)    = Σ_f x(d,f)·w(f) − c,        c = Σ_f m(f)·w(f)
    grad(f) = Σ_d x(d,f)·r(d) − m(f)·R,   R = Σ_d r(d)

so the centered fit costs exactly the sparse fit plus two
BOUNDED aggregates per iteration (``c`` over the weight table, ``R``
over the residuals — both 1-row broadcasts). The bias feature is
excluded from centering (its centered value would be identically 0).

Scale posture (100 TB): the feature table is built ONCE and
``localCheckpoint``-ed (it is re-joined every iteration — the
``graph.pagerank`` edges posture; at real scale persist it to the
warehouse instead). The weight table is ``n_buckets``+1 rows by
construction — broadcastable at ANY corpus size, like the DSIR count
tables. Gradient aggregation shuffles O(buckets) rows per iteration;
scoring is one broadcast join + one per-doc partial-agg shuffle. In
production the FIT runs on the small labeled reference set and only
:func:`classifier_score` touches the full corpus.

Cross-engine exactness (why this family is oracle-HASH-gated instead
of rows-only, despite being iterative floating-point):

- feature values are integer token counts (exact in double);
- the squashing function is the rational fast sigmoid
  ``p = 0.5 + 0.5*s/(1 + abs(s))`` — ``+ * / abs`` only, IEEE
  bit-identical across engines, where ``exp``-based logistic is not;
- every aggregation (per-doc score sums, per-bucket gradient sums,
  the ``c``/``R`` centering scalars) runs in DECIMAL(30,10) — the
  ``time_weighted_avg`` recipe — so cross-engine summation ORDER
  cannot move a ULP;
- everything elementwise on identical doubles is bit-identical.

After T unrolled iterations the weights and per-document scores are
therefore bit-identical between the Spark loop and the DuckDB twin
(:func:`classifier_scores_oracle_sql` unrolls the same T steps as
chained CTEs — the ``pagerank_oracle_sql`` precedent for "iterative
is not unverifiable"). ``round(..., 6)`` on the gated outputs is
belt-and-braces house style, not load-bearing.

Reference scope note: the reference engine (Flask + dbt) has no ML
surface; this family is part of the north-star training-data-pipeline
extension set (BASELINE.json), alongside dedup/DSIR/decontamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators._caches import BoundedCache

_DEC = "decimal(30,10)"
N_BUCKETS = 256
SALT = "qclf-v1"
BIAS_BUCKET = -1
ITERS = 8
LR = 2.0


def _bucket(
    col: Column, salt: str, n_buckets: int, hash_kind: str = "md5"
) -> Column:
    """Token → bucket. ``"md5"`` (default): first 32 bits of
    md5(salt|value) mod ``n_buckets`` — identical to ``dsir._bucket``
    / ``sampling.hash_bucket``, ANSI-replayable, what every
    oracle-gated query uses. ``"xxhash64"``: pmod(xxhash64(salt,
    value), n_buckets) — measured ~1.6× faster per-token on the
    scoring fold (SCALING.md r13), the knob for the hot streaming
    ingest gate where cross-engine replay isn't needed; carries no
    oracle claim. Fit and score must use the SAME kind — the
    persisted store records it in ``meta/`` so the probe paths can
    never mismatch."""
    if hash_kind == "md5":
        h = F.md5(F.concat_ws("|", F.lit(salt), col))
        return (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets
        )
    if hash_kind == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(salt), col), F.lit(n_buckets))
    raise ValueError(f"unknown hash_kind: {hash_kind!r}")


def _fast_sigmoid(s: Column) -> Column:
    """``0.5 + 0.5*s/(1+|s|)`` — a sigmoid-shaped rational squash in
    (0,1), monotone, p(0)=0.5. Chosen over ``1/(1+exp(-s))`` because
    it uses only IEEE-exact basic ops: ``exp`` is correctly-rounded in
    NEITHER engine and its last-ulp disagreements would break the
    bit-identical cross-engine replay this module guarantees."""
    return F.lit(0.5) + F.lit(0.5) * s / (F.lit(1.0) + F.abs(s))


def _dec_sum(prod: Column) -> Column:
    """Order-independent double sum: cast each elementwise term to
    DECIMAL(30,10) (deterministic — both engines round the same
    double the same way), sum exactly in decimal, cast back. The
    ``time_weighted_avg`` recipe, applied inside an iteration."""
    return F.sum(prod.cast(_DEC)).cast("double")


def featurize_hashed(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    salt: str = SALT,
    bigrams: bool = False,
    hash_kind: str = "md5",
) -> DataFrame:
    """``(id, bucket, x)`` — x = the count of the document's
    whitespace tokens hashing into ``bucket``, plus the constant bias
    feature (``bucket = -1, x = 1``) every document carries (so
    zero-token documents still score, at the learned base rate).

    ``bigrams=True`` additionally hashes adjacent-token bigrams (the
    ``dsir.hashed_ngram_buckets`` construction — the fastText-faithful
    feature set; word order starts to matter). The gated queries keep
    the unigram default; a persisted fit records the flag in its
    ``meta/``, and both probe paths
    (:func:`classifier_score_against_index`,
    :func:`classifier_score_expr`) replay it automatically, so a
    bigram fit can never be silently probed with unigram features.

    One explode + one (id, bucket) partial-agg shuffle; counts are
    integers, exact in double."""
    t = F.split(F.col(text_col), " ")
    grams = F.filter(t, lambda w: F.length(w) > 0)
    if bigrams:
        tail = F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))
        big = F.filter(
            F.zip_with(
                t,
                tail,
                lambda a, b: F.when(
                    b.isNotNull() & (F.length(a) > 0) & (F.length(b) > 0),
                    F.concat_ws(" ", a, b),
                ),
            ),
            lambda x: x.isNotNull(),
        )
        grams = F.concat(grams, big)
    toks = docs.select(F.col(id_col), F.explode(grams).alias("_tk"))
    counts = (
        toks.select(
            id_col,
            _bucket(F.col("_tk"), salt, n_buckets, hash_kind).alias(
                "bucket"
            ),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count("*").cast("double").alias("x"))
    )
    bias = docs.select(
        F.col(id_col),
        F.lit(BIAS_BUCKET).cast("long").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    return counts.unionByName(bias)


def fit_linear_classifier(
    feats: DataFrame,
    labels: DataFrame,
    iters: int = ITERS,
    lr: float = LR,
    id_col: str = "doc_id",
    label_col: str = "label",
    feats_materialized: bool = False,
) -> DataFrame:
    """``(bucket, m, w)`` after ``iters`` full-batch gradient steps
    from w=0 on labels in {0,1}, over mean-centered features (sparse
    identity — see module docstring):

    ``s(d) = Σ_f x(d,f)·w(f) − Σ_f m(f)·w(f)``;
    ``p = fast_sigmoid(s)``;  ``r = y − p``;
    ``w(f) += (lr/N)·(Σ_d x(d,f)·r(d) − m(f)·Σ_d r(d))``.

    ``m`` is the per-bucket mean count over the fit corpus (0 for the
    bias bucket) and rides along in the returned weight table so
    :func:`classifier_score` applies the same centering. The feature
    and label tables are checkpointed once (re-joined every
    iteration); weights checkpoint per iteration to cut the
    iterative-lineage blowup (the ``pagerank`` posture). ``N`` is the
    one driver scalar, the watermark class.

    CONTRACT: ``feats`` must cover exactly the documents in
    ``labels`` (every in-repo caller featurizes the labeled set
    itself). The centering mean ``m`` is ``Σ x / N`` with ``N`` from
    ``labels`` — feats rows for UNLABELED docs would inflate the
    numerator but not ``N``, silently skewing ``m`` while the
    gradient's inner join drops those docs, making fit and score
    inconsistent. Featurize the labeled subset, not the corpus
    (advisor r12; a semi-join here would hide the mismatch at a
    per-fit shuffle cost instead of surfacing the caller bug).

    CONTRACT (advisor r15): every labeled document must carry the
    BIAS feature row (``bucket = BIAS_BUCKET, x = 1.0``), which
    :func:`featurize_hashed` always emits. The per-iteration residual
    total ``R = Σ_d r(d)`` is read off the bias bucket's gradient —
    bit-exactly equal because ``1.0 · r`` is an exact IEEE identity
    and the decimal sum is exact — so custom features WITHOUT bias
    rows would yield a NULL ``R`` and all-NULL weights rather than a
    skewed fit. Use :func:`featurize_hashed` (or replicate its bias
    row) for any custom featurization.

    ``feats_materialized=True`` declares that the caller has ALREADY
    eagerly materialized ``feats`` (e.g. a query-level
    ``localCheckpoint`` feeding both this fit and a scoring pass) —
    the internal checkpoint is skipped instead of pinning a second
    block copy of the full feature table for the fit's lifetime
    (advisor r15)."""
    if not feats_materialized:
        feats = feats.localCheckpoint(eager=True)
    labels = labels.select(
        F.col(id_col), F.col(label_col).cast("double").alias("_y")
    ).localCheckpoint(eager=True)
    n = labels.count()
    if n == 0:
        return (
            feats.select("bucket")
            .distinct()
            .withColumn("m", F.lit(0.0))
            .withColumn("w", F.lit(0.0))
        )
    step = lr / n  # same IEEE division the oracle runs SQL-side
    w = (
        feats.groupBy("bucket")
        .agg((_dec_sum(F.col("x")) / F.lit(float(n))).alias("m"))
        .withColumn(
            "m",
            F.when(
                F.col("bucket") == BIAS_BUCKET, F.lit(0.0)
            ).otherwise(F.col("m")),
        )
        .withColumn("w", F.lit(0.0))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        c = w.agg(_dec_sum(F.col("m") * F.col("w")).alias("_c"))
        s = (
            feats.join(F.broadcast(w.select("bucket", "w")), "bucket")
            .groupBy(id_col)
            .agg(_dec_sum(F.col("x") * F.col("w")).alias("_sr"))
        )
        resid = (
            labels.join(s, id_col, "left")
            .crossJoin(F.broadcast(c))
            .select(
                F.col(id_col),
                (
                    F.col("_y")
                    - _fast_sigmoid(
                        F.coalesce(F.col("_sr"), F.lit(0.0))
                        - F.col("_c")
                    )
                ).alias("_r"),
            )
            # NOT checkpointed, deliberately: resid feeds only grad
            # now (see below), so there is nothing to share
        )
        grad = (
            feats.join(resid, id_col)
            .groupBy("bucket")
            .agg(_dec_sum(F.col("x") * F.col("_r")).alias("_g"))
        )
        # Σ_d r(d) == the bias bucket's gradient, BIT-EXACTLY: every
        # doc carries the bias feature with x = 1.0 (featurize_hashed),
        # 1.0 * r is an exact IEEE identity, the decimal cast of equal
        # doubles is equal, and the decimal sum is exact hence
        # order-insensitive. r16: _R is read via an UNPARTITIONED
        # window over the bucket-sized joined frame (≤ n_buckets+1
        # rows by construction, one tiny SinglePartition exchange), so
        # the gradient shuffle, the _R read and the weight update all
        # ride the ONE w-checkpoint job — before r16 the gradient was
        # checkpointed in its own job and _R was a separate
        # broadcast-build job (3 jobs/iteration → 1, and no pinned
        # per-iteration gradient blocks). sum() skips the NULL _g of
        # buckets absent from grad and sees exactly the single bias
        # row — the same one-row sum rtot always was.
        _R = F.sum(
            F.when(F.col("bucket") == BIAS_BUCKET, F.col("_g"))
        ).over(Window.partitionBy())
        w = (
            w.join(grad, "bucket", "left")
            .select(
                "bucket",
                "m",
                (
                    F.col("w")
                    + F.lit(step)
                    * (
                        F.coalesce(F.col("_g"), F.lit(0.0))
                        - F.col("m") * _R
                    )
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
    return w


def classifier_score(
    feats: DataFrame, weights: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """``(id, score)`` for every document in ``feats`` — broadcast the
    bounded ``(bucket, m, w)`` table, one per-doc decimal-exact sum,
    subtract the centering constant, squash. The full-corpus pass at
    100 TB: map-side join + one partial-agg shuffle on the doc id."""
    c = weights.agg(_dec_sum(F.col("m") * F.col("w")).alias("_c"))
    return (
        feats.join(F.broadcast(weights.select("bucket", "w")), "bucket")
        .groupBy(id_col)
        .agg(_dec_sum(F.col("x") * F.col("w")).alias("_sr"))
        .crossJoin(F.broadcast(c))
        .select(
            F.col(id_col),
            _fast_sigmoid(F.col("_sr") - F.col("_c")).alias("score"),
        )
    )


_META_CACHE: "dict[str, tuple[int, str]]" = BoundedCache()


def save_classifier(
    docs: DataFrame,
    labels: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = ITERS,
    lr: float = LR,
    n_buckets: int = N_BUCKETS,
    salt: str = SALT,
    bigrams: bool = False,
    hash_kind: str = "md5",
) -> None:
    """Fit the classifier ONCE on a labeled reference corpus and
    persist it: ``weights/`` (the (bucket, m, w) table —
    ``n_buckets``+1 rows) plus ``meta/`` (the featurize geometry the
    probe side must replay, INCLUDING the n-gram order, so a bigram
    fit can never be silently probed with unigram features). The same fit-once-offline /
    probe-O(batch) posture as ``save_dsir_index`` /
    ``save_unigram_lm``: the full corpus is only ever touched by
    :func:`classifier_score_against_index` or the row-local
    :func:`classifier_score_expr`."""
    from sensor_data_pipeline___spark.operators._local import local_df

    _META_CACHE.pop(path, None)
    feats = featurize_hashed(
        docs, text_col, id_col, n_buckets, salt, bigrams=bigrams,
        hash_kind=hash_kind,
    )
    w = fit_linear_classifier(feats, labels, iters, lr, id_col=id_col)
    w.coalesce(1).write.mode("overwrite").parquet(path + "/weights")
    local_df(
        docs.sparkSession,
        [(n_buckets, salt, bool(bigrams), str(hash_kind))],
        "n_buckets int, salt string, bigrams boolean, hash_kind string",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/meta")


def _load_meta(spark, path: str) -> "tuple[int, str, bool, str]":
    if path not in _META_CACHE:
        r = spark.read.parquet(path + "/meta").first()
        d = r.asDict()
        _META_CACHE[path] = (
            int(d["n_buckets"]),
            str(d["salt"]),
            # stores written before the flag existed are unigram
            bool(d.get("bigrams", False)),
            # stores written before the column existed are md5
            str(d.get("hash_kind") or "md5"),
        )
    return _META_CACHE[path]


def classifier_score_against_index(
    spark,
    path: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``(id, score)`` for a batch against a :func:`save_classifier`
    store — featurize with the STORED geometry, broadcast the stored
    weight table, score. Identical arithmetic to
    :func:`classifier_score` over the in-memory fit (pinned equal by
    test); per batch: one scan + broadcast join + one partial-agg
    shuffle."""
    n_buckets, salt, bigrams, hash_kind = _load_meta(spark, path)
    w = spark.read.parquet(path + "/weights")
    feats = featurize_hashed(
        docs, text_col, id_col, n_buckets, salt, bigrams=bigrams,
        hash_kind=hash_kind,
    )
    return classifier_score(feats, w, id_col)


def classifier_score_expr(spark, path: str, text_col: str = "text") -> Column:
    """Score ``text_col`` against a :func:`save_classifier` store as a
    PURE PROJECTION — no shuffle, no join, no state: the weight table
    (driver-bounded at ``n_buckets``+1 rows, the ``load_bpe_merges``
    scalar class) is collected once and baked into the plan as a map
    literal, and the per-token sum runs inside ``F.aggregate`` over
    the split array. This is the streaming-legal variant (a stateless
    row-local enrichment, the tokenize-at-ingest posture — legal
    BEFORE a watermarked dedup, so junk never occupies state) and the
    serving-side one.

    Arithmetic note: the fold sums left-to-right in token order —
    deterministic per row, but a float-ORDER difference from the
    batch path's decimal-exact sums: agreement is ~1e-9, not
    bit-identical (pinned by test). Buckets unseen at fit time carry
    no weight row and contribute 0, exactly like the batch path's
    inner join. A bigram-fit store (meta flag) folds the adjacent-
    pair grams in a second stateless pass — still zero exchanges.

    Lookup shape: the weights are baked as an ARRAY literal indexed
    by bucket (``element_at`` on an array literal is an O(1) indexed
    read), not a map literal — Spark's ``GetMapValue`` on a
    ``create_map`` literal is a linear key scan, O(n_buckets) PER
    TOKEN, which degrades the hot streaming path as bucket counts
    grow (advisor r12; ~257 comparisons/token at the default 256 was
    tolerable, 64k-bucket fits would not be). Buckets with no weight
    row hold an explicit 0.0 — same value the map path's coalesce
    produced, so scores are bit-identical.

    The per-token hash replays the store's recorded ``hash_kind``
    (md5 default; the xxhash64 variant measured ~1.6× faster on this
    fold — the streaming ingest-gate knob, SCALING.md r13)."""
    n_buckets, salt, bigrams, hash_kind = _load_meta(spark, path)
    rows = spark.read.parquet(path + "/weights").collect()
    bias = 0.0
    c = 0.0
    dense = [0.0] * n_buckets
    # bucket-sorted: c is a float fold, so its summation ORDER is part
    # of the function's deterministic contract across store re-reads
    for r in sorted(rows, key=lambda r: r["bucket"]):
        c += float(r["m"]) * float(r["w"])
        if int(r["bucket"]) == BIAS_BUCKET:
            bias = float(r["w"])
        else:
            dense[int(r["bucket"])] = float(r["w"])
    warr = F.array(*[F.lit(w) for w in dense])

    def _fold(arr: Column) -> Column:
        return F.aggregate(
            arr,
            F.lit(0.0),
            lambda acc, t: acc
            + F.element_at(
                warr,
                (_bucket(t, salt, n_buckets, hash_kind) + 1).cast("int"),
            ),
        )

    t = F.split(F.coalesce(F.col(text_col), F.lit("")), " ", -1)
    toks = F.filter(t, lambda w: F.length(w) > 0)
    s = _fold(toks) + F.lit(bias) - F.lit(c)
    if bigrams:
        tail = F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0)))
        big = F.filter(
            F.zip_with(
                t,
                tail,
                lambda a, b: F.when(
                    b.isNotNull() & (F.length(a) > 0) & (F.length(b) > 0),
                    F.concat_ws(" ", a, b),
                ),
            ),
            lambda x: x.isNotNull(),
        )
        s = s + _fold(big)
    return _fast_sigmoid(s)


def _oracle_parts(
    iters: int,
    lr: float,
    n_buckets: int,
    salt: str,
    label_expr: str,
    table: str,
    id_col: str,
    text_col: str,
    fit_where: str = "TRUE",
    probe_where: str = "TRUE",
    bigrams: bool = False,
) -> "list[str]":
    """The shared CTE chain of the DuckDB twins: featurize, means, w0,
    then ``iters`` unrolled (score, residual, gradient, update) steps
    — the ``pagerank_oracle_sql`` fixed-depth precedent. Ends with
    ``sc`` = per-doc final score (bit-identical to
    :func:`classifier_score` over :func:`fit_linear_classifier`).
    ``fit_where`` restricts the FIT corpus, ``probe_where`` the docs
    the final score pass runs over (the held-out-split shape of
    ``quality_classifier_probe_index``); both default to the whole
    table. ``bigrams`` mirrors :func:`featurize_hashed`'s flag: the
    tok CTE additionally unnests adjacent-token bigrams (both parts
    non-empty — the zip_with guard's exact twin)."""
    lr_lit = repr(float(lr))
    dsum = "CAST(sum(CAST({t} AS DECIMAL(30,10))) AS DOUBLE)"
    fsig = "(0.5 + 0.5 * {s} / (1.0 + abs({s})))"
    feats_cte = """{name} AS MATERIALIZED (
      SELECT doc_id,
             CAST(('0x' || substr(md5('{salt}' || '|' || tk), 1, 8))
                  AS BIGINT) % {nb} AS bucket,
             CAST(count(*) AS DOUBLE) AS x
      FROM {tok} WHERE len(tk) > 0
      GROUP BY doc_id, bucket
      UNION ALL
      SELECT {id} AS doc_id, CAST(-1 AS BIGINT) AS bucket, 1.0 AS x
      FROM {tbl} WHERE {where}
    )"""
    if bigrams:
        tok_tpl = (
            "{name} AS (\n"
            "      SELECT {id} AS doc_id,\n"
            "             unnest(t || [t[i] || ' ' || t[i+1]\n"
            "                          for i in generate_series(1, len(t)-1)\n"
            "                          if len(t[i]) > 0 AND len(t[i+1]) > 0])\n"
            "               AS tk\n"
            "      FROM (SELECT {id}, string_split({txt}, ' ') AS t\n"
            "            FROM {tbl} WHERE {where})\n"
            "    )"
        )
    else:
        tok_tpl = (
            "{name} AS (\n"
            "      SELECT {id} AS doc_id, unnest(string_split({txt}, ' ')) AS tk\n"
            "      FROM {tbl} WHERE {where}\n"
            "    )"
        )
    parts = [
        tok_tpl.format(
            name="tokq", id=id_col, txt=text_col, tbl=table,
            where=fit_where,
        ),
        feats_cte.format(
            name="featsq", salt=salt, nb=n_buckets, tok="tokq",
            id=id_col, tbl=table, where=fit_where,
        ),
        f"""labq AS MATERIALIZED (
      SELECT {id_col} AS doc_id, CAST({label_expr} AS DOUBLE) AS y
      FROM {table} WHERE {fit_where}
    )""",
        """nnq AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM labq)""",
        f"""w0 AS MATERIALIZED (
      SELECT bucket,
             CASE WHEN bucket = -1 THEN 0.0
                  ELSE {dsum.format(t='x')} / (SELECT n FROM nnq)
             END AS m,
             0.0 AS w
      FROM featsq GROUP BY bucket
    )""",
    ]
    for t in range(1, iters + 1):
        prev, cur = f"w{t - 1}", f"w{t}"
        cexp = (
            f"(SELECT {dsum.format(t='m * w')} FROM {prev})"
        )
        sarg = f"(coalesce(s.s, 0.0) - {cexp})"
        parts.append(
            f"""s{t} AS MATERIALIZED (
      SELECT f.doc_id, {dsum.format(t='f.x * w.w')} AS s
      FROM featsq f JOIN {prev} w USING (bucket)
      GROUP BY f.doc_id
    )"""
        )
        parts.append(
            f"""r{t} AS MATERIALIZED (
      SELECT l.doc_id, l.y - {fsig.format(s=sarg)} AS r
      FROM labq l LEFT JOIN s{t} s USING (doc_id)
    )"""
        )
        parts.append(
            f"""g{t} AS MATERIALIZED (
      SELECT f.bucket, {dsum.format(t='f.x * r.r')} AS g
      FROM featsq f JOIN r{t} r USING (doc_id)
      GROUP BY f.bucket
    )"""
        )
        parts.append(
            f"""{cur} AS MATERIALIZED (
      SELECT w.bucket, w.m,
             w.w + ({lr_lit} / (SELECT n FROM nnq))
                   * (coalesce(g.g, 0.0)
                      - w.m * (SELECT {dsum.format(t='r')} FROM r{t}))
               AS w
      FROM {prev} w LEFT JOIN g{t} g USING (bucket)
    )"""
        )
    wf = f"w{iters}"
    cfin = f"(SELECT {dsum.format(t='m * w')} FROM {wf})"
    sfin = f"(t.sr - {cfin})"
    if probe_where == fit_where:
        probe_feats = "featsq"
    else:
        probe_feats = "featsp"
        parts.append(
            tok_tpl.format(
                name="tokp", id=id_col, txt=text_col, tbl=table,
                where=probe_where,
            )
        )
        parts.append(
            feats_cte.format(
                name="featsp", salt=salt, nb=n_buckets, tok="tokp",
                id=id_col, tbl=table, where=probe_where,
            )
        )
    parts.append(
        f"""srf AS (
      SELECT f.doc_id, {dsum.format(t='f.x * w.w')} AS sr
      FROM {probe_feats} f JOIN {wf} w USING (bucket)
      GROUP BY f.doc_id
    )"""
    )
    parts.append(
        f"""sc AS (
      SELECT t.doc_id, {fsig.format(s=sfin)} AS score FROM srf t
    )"""
    )
    return parts


_LABEL_EXPR = "CASE WHEN n_chars >= 150 THEN 1.0 ELSE 0.0 END"


def classifier_scores_oracle_sql(
    iters: int = ITERS,
    lr: float = LR,
    n_buckets: int = N_BUCKETS,
    salt: str = SALT,
    label_expr: str = _LABEL_EXPR,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = False,
) -> str:
    """DuckDB twin of fit-then-score: per-doc (score, label)."""
    parts = _oracle_parts(
        iters, lr, n_buckets, salt, label_expr, table, id_col, text_col,
        bigrams=bigrams,
    )
    return (
        "WITH\n    "
        + ",\n    ".join(parts)
        + """
    SELECT s.doc_id, round(s.score, 6) AS score,
           CAST(l.y AS BIGINT) AS label
    FROM sc s JOIN labq l USING (doc_id)"""
    )


def classifier_calibration_oracle_sql(
    iters: int = ITERS,
    lr: float = LR,
    n_buckets: int = N_BUCKETS,
    salt: str = SALT,
    label_expr: str = _LABEL_EXPR,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = False,
) -> str:
    """DuckDB twin of the reliability diagram: decile score bins ×
    (count, mean score, empirical positive rate). Bin assignment is
    floor(score·10) over the bit-identical scores; per-bin means run
    in DECIMAL. Defaults track the module constants so a tuned
    hyperparameter moves every classifier oracle together."""
    parts = _oracle_parts(
        iters, lr, n_buckets, salt, label_expr, table, id_col, text_col,
        bigrams=bigrams,
    )
    return (
        "WITH\n    "
        + ",\n    ".join(parts)
        + """
    SELECT CAST(floor(s.score * 10) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(s.score AS DECIMAL(30,10)))
                      AS DOUBLE) / count(*), 6) AS mean_score,
           round(CAST(sum(CAST(l.y AS DECIMAL(30,10)))
                      AS DOUBLE) / count(*), 6) AS frac_positive
    FROM sc s JOIN labq l USING (doc_id)
    GROUP BY 1"""
    )


def classifier_probe_oracle_sql(
    iters: int = ITERS,
    lr: float = LR,
    n_buckets: int = N_BUCKETS,
    salt: str = SALT,
    label_expr: str = _LABEL_EXPR,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    fit_where: str = "doc_id % 2 = 0",
    probe_where: str = "doc_id % 2 = 1",
) -> str:
    """DuckDB twin of the PERSISTED lifecycle: fit on the
    ``fit_where`` half, score the held-out ``probe_where`` half
    against the store (scoring against stored weights is exact — no
    approximation to twin away — so the oracle recomputes the same
    fit from the fit split, the ``dsir_probe_index`` precedent)."""
    parts = _oracle_parts(
        iters, lr, n_buckets, salt, label_expr, table, id_col,
        text_col, fit_where=fit_where, probe_where=probe_where,
    )
    return (
        "WITH\n    "
        + ",\n    ".join(parts)
        + """
    SELECT doc_id, round(score, 6) AS score FROM sc"""
    )


def classifier_eval_oracle_sql(
    iters: int = ITERS,
    lr: float = LR,
    n_buckets: int = N_BUCKETS,
    salt: str = SALT,
    label_expr: str = _LABEL_EXPR,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    bigrams: bool = False,
) -> str:
    """DuckDB twin of the bounded confusion summary: one row per
    (label, prediction) cell with count and decimal-exact mean score —
    the review-facing artifact where per-doc scores are corpus-sized."""
    parts = _oracle_parts(
        iters, lr, n_buckets, salt, label_expr, table, id_col, text_col,
        bigrams=bigrams,
    )
    return (
        "WITH\n    "
        + ",\n    ".join(parts)
        + """
    SELECT CAST(l.y AS BIGINT) AS label,
           CAST(CASE WHEN s.score >= 0.5 THEN 1 ELSE 0 END AS BIGINT)
             AS predicted,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(CAST(sum(CAST(s.score AS DECIMAL(30,10)))
                      AS DOUBLE) / count(*), 6) AS mean_score
    FROM sc s JOIN labq l USING (doc_id)
    GROUP BY 1, 2"""
    )
