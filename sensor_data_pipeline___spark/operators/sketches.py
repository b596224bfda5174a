"""Mergeable sketch operators: HyperLogLog distinct rollups and an
explicit count-min sketch.

The pattern that matters at 100 TB is RE-AGGREGABILITY: a per-partition
(here per-day) sketch is built once at ingest cost, and any later
rollup (per week, per metric, per anything) is a cheap union of
sketch binaries — no rescan of the raw data, unlike count(DISTINCT)
which cannot be pre-aggregated. This is the sensor-mart analog of the
reference's incremental gold recompute (mart_daily_power.sql:36-46):
instead of re-reading a day's raw rows, the day's sketch is the
reusable intermediate.

HLL uses Spark's built-in Datasketches bindings (hll_sketch_agg /
hll_union_agg / hll_sketch_estimate — JVM-side, mergeable,
deterministic for a given input multiset). The count-min sketch is
built explicitly from DataFrame ops (xxhash64 bucket rows) rather than
F.count_min_sketch's opaque binary, because the point is showing the
sketch IS just a small groupBy table: d×w counters whose build is one
partial-agg shuffle and whose point query is a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default HLL precision (Datasketches lgConfigK): 2^12 registers,
#: ~1.6% relative standard error — 4 KB per sketch.
HLL_LG_K = 12


def hll_daily_sketches(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    lg_k: int = HLL_LG_K,
) -> DataFrame:
    """One HLL sketch binary per (group, day) — the pre-aggregated
    distinct-count intermediate. Build cost is the same one shuffle a
    count(DISTINCT) needs, but the output is mergeable forever after."""
    return events.groupBy(group, F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg(key, F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def hll_rollup(sketches: DataFrame, group: str = "event_type") -> DataFrame:
    """Union the per-day sketches per group and estimate distincts —
    sketch-sized shuffle (KBs per group), never touches raw data."""
    return sketches.groupBy(group).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_distinct"),
        F.count("*").alias("n_sketches"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch as a (row, bucket) -> count table: ``depth``
    independent hash rows of ``width`` counters each (Cormode &
    Muthukrishnan, 2005). One partial-agg shuffle of at most
    depth×width rows regardless of input size; each input row
    contributes to ``depth`` counters via xxhash64 seeded per row.
    """
    rows = df.select(
        F.explode(
            F.array(*[F.lit(i) for i in range(depth)])
        ).alias("_row"),
        F.col(col).alias("_k"),
    ).select(
        "_row",
        (F.pmod(F.xxhash64("_k", "_row"), F.lit(width))).alias("_bucket"),
    )
    return rows.groupBy("_row", "_bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    cms: DataFrame, keys: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each key's frequency: min over the key's
    ``depth`` counters. Guarantees est >= true count (one-sided), with
    overestimate bounded by collisions (~N/width per row w.h.p.).
    ``keys`` is expected to be small (candidate heavy hitters) — the
    probe is a broadcast-sized join against the depth×width table."""
    probes = keys.select(
        F.col(col),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("_row"),
    ).select(
        col,
        "_row",
        (F.pmod(F.xxhash64(F.col(col), F.col("_row")), F.lit(width))).alias(
            "_bucket"
        ),
    )
    return (
        probes.join(F.broadcast(cms), ["_row", "_bucket"])
        .groupBy(col)
        .agg(F.min("cnt").alias("est_count"))
    )


# ---------------------------------------------------------------------------
# Bloom-filter runtime pre-filter
# ---------------------------------------------------------------------------
#
# Spark's own runtime row-level filtering (InjectRuntimeFilter /
# bloom_filter_agg) is an internal optimizer rule not exposed to SQL or
# the DataFrame API, so the pattern is built explicitly from DataFrame
# ops: the build side is one explode + bit_or groupBy (map-side
# combined, num_bits/64 result rows), the probe is a pure codegen
# expression against a literal word array. The 100 TB story is shuffle
# avoidance: fact rows whose key cannot exist on the dim side are
# dropped at the SCAN, before the join exchange moves them.


def bloom_build(
    df: DataFrame, key_col: str, num_bits: int = 1 << 16, num_hashes: int = 5
) -> list[int]:
    """Build a Bloom filter over ``df[key_col]`` as a list of 64-bit
    words (driver-side, ``num_bits/8`` bytes — broadcast-sized state,
    the same class as a collected watermark). Bit positions come from
    ``xxhash64(key, i)`` for i in [0, num_hashes)."""
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits))
                for i in range(num_hashes)
            ]
        )
    ).alias("p")
    rows = (
        df.select(pos)
        .select(
            F.expr("cast(p div 64 as int)").alias("w"),
            F.expr("cast(p % 64 as int)").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(1L, b))").alias("word"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_might_contain(
    words: list[int], key_col: str, num_bits: int, num_hashes: int = 5
) -> "F.Column":
    """Membership predicate against a built filter — pure JVM
    expression (element_at + bit ops on a literal array), false
    negatives impossible.

    The word array is bound ONCE: the bit positions are computed by
    ``transform`` over ``sequence(0, num_hashes-1)`` and tested with
    ``forall``, so the expression tree carries a single copy of the
    num_bits/64-element literal instead of one per hash (at the 1024-
    word default, 5 inlined copies measurably inflate parse/codegen).
    ``sequence`` yields the same int values ``bloom_build`` hashes as
    literals, so probe and build positions agree. For filters too big
    to inline as a literal (num_bits beyond ~2^20), the escalation is
    the same bitmap as a (word_idx, word) table joined broadcast on
    ``p div 64``."""
    arr_sql = "array(" + ",".join(f"{w}L" for w in words) + ")"
    key_sql = "`" + key_col.replace("`", "``") + "`"
    return F.expr(
        f"forall("
        f"  transform(sequence(0, {num_hashes - 1}),"
        f"            i -> pmod(xxhash64({key_sql}, i), {num_bits})),"
        f"  p -> (element_at({arr_sql}, cast(p div 64 as int) + 1)"
        f"        & shiftleft(1L, cast(p % 64 as int))) != 0"
        f")"
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> DataFrame:
    """LEFT SEMI join with a Bloom runtime pre-filter on the fact side.

    Result is EXACTLY ``fact.join(dim, key, "left_semi")`` — the bloom
    admits no false negatives and the real semi join removes its false
    positives — but fact rows that cannot match are dropped before the
    join exchange. At 1000 executors this is the difference between
    shuffling the full fact table and shuffling the matching slice.
    """
    words = bloom_build(dim, key, num_bits, num_hashes)
    pre = fact.filter(bloom_might_contain(words, key, num_bits, num_hashes))
    return pre.join(dim.select(key).distinct(), key, "left_semi")


def histogram_sketch(
    df: DataFrame,
    group_cols: "list[str]",
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Fixed-bin histogram sketch in LONG form: (group..., bin, cnt) —
    the mergeable quantile sketch completing the sketch family (HLL =
    mergeable distinct, CMS = mergeable frequency, this = mergeable
    distribution). Unlike ``percentile``/``approx_percentile``
    aggregates, pre-aggregated sketches RE-AGGREGATE: daily sketches
    roll up to any coarser grain by integer addition, with quantile
    error bounded by the bin width — and, being integer counts under a
    fixed binning, the whole path is exactly replayable cross-engine
    (a hash-verifiable oracle, where HLL/CMS settle for accuracy
    contracts).

    Bounds are FIXED UPFRONT (the production posture: bounds are part
    of the sketch schema; re-binning is a rebuild). One partial-
    aggregated groupBy; values at ``hi`` clamp into the last bin.
    NULL values are EXCLUDED before binning (matching what SQL
    aggregates do with nulls) — without the filter, a null makes the
    floor() expression null and ``greatest(null, 0)`` lands it
    silently in bin 0, inflating low-quantile mass."""
    width = (hi - lo) / n_bins
    df = df.filter(F.col(value_col).isNotNull())
    b = (
        F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
                F.lit(0),
            ),
            F.lit(n_bins - 1),
        )
        .cast("int")
        .alias("bin")
    )
    return df.groupBy(*group_cols, b).agg(F.count("*").alias("cnt"))


def histogram_merge(sketches: DataFrame, group_cols: "list[str]") -> DataFrame:
    """Roll sketches up to ``group_cols`` grain — integer addition per
    (group, bin); associative/commutative, so any rollup tree gives
    identical counts."""
    return sketches.groupBy(*group_cols, "bin").agg(
        F.sum("cnt").alias("cnt")
    )


def _quantile_label(q: float) -> str:
    """Column-safe label covering the full quantile value: integer
    percents stay short (0.5 → ``50``), anything finer keeps every
    significant digit (0.125 → ``12_5``, 0.504 → ``50_4``) so distinct
    quantiles can never alias to the same column name."""
    # round kills float-product noise (0.1*100 == 10.000000000000002)
    # without collapsing real sub-percent quantiles
    pct = round(q * 100, 10)
    if pct == int(pct):
        return str(int(pct))
    return repr(pct).replace(".", "_").replace("-", "neg")


def histogram_quantile(
    sketches: DataFrame,
    group_cols: "list[str]",
    q: "float | list[float]",
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Quantile estimates from a (merged) sketch: for each requested
    ``q``, the midpoint of the first bin whose cumulative count
    reaches ``q × total``. Adds one ``q{label}_est`` column per
    quantile, where the label is derived from the FULL quantile value
    (0.5 → ``q50_est``, 0.125 → ``q12_5_est``) — labelling from
    ``round(q*100)`` would mislabel non-integer percents (0.125 →
    q12) and collide close quantiles (0.5 vs 0.504 → two q50_est
    columns, an ambiguous frame downstream); duplicate labels raise. A
    LIST of quantiles reads them all from ONE cumulative pass instead
    of one window + join per quantile. Error vs the exact interpolated
    quantile is bounded by ~2 bin widths (chosen-bin membership of
    both interpolation ranks). Cumulative is a per-group window over
    ``n_bins`` rows — O(groups × bins) state, never O(rows)."""
    from pyspark.sql import Window

    qs = [float(q)] if isinstance(q, (int, float)) else [float(x) for x in q]
    labels = [_quantile_label(qq) for qq in qs]
    if len(set(labels)) != len(labels):
        raise ValueError(f"duplicate quantile labels: {sorted(labels)}")
    width = (hi - lo) / n_bins
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*group_cols)
    cum = F.sum("cnt").over(w)
    total = F.sum("cnt").over(tot)
    scanned = sketches.select(
        *group_cols, "bin", cum.alias("_cum"), total.alias("_total")
    )
    aggs = [
        (
            F.lit(lo)
            + (
                F.min(F.when(F.col("_cum") >= qq * F.col("_total"), F.col("bin")))
                + 0.5
            )
            * F.lit(width)
        ).alias(f"q{label}_est")
        for qq, label in zip(qs, labels)
    ]
    return scanned.groupBy(*group_cols).agg(*aggs)
