"""Sketch operators: HLL mergeability/accuracy, CMS one-sided error."""

from __future__ import annotations

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators.sketches import (
    cms_build,
    cms_estimate,
    hll_daily_sketches,
    hll_rollup,
)
from sensor_data_pipeline___spark.sources import readers

SF = "/root/testdata/sf0.001"


def test_hll_union_of_daily_sketches_matches_global_sketch(spark):
    """Union(per-day sketches) must estimate the same as one sketch
    over all rows — the mergeability property that makes pre-
    aggregation valid."""
    ev = readers.table(spark, "events", SF)
    via_union = {
        r["event_type"]: r["est_distinct"]
        for r in hll_rollup(hll_daily_sketches(ev)).collect()
    }
    via_global = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est"))
        .collect()
    }
    assert via_union == via_global


def test_hll_estimate_within_tolerance_of_exact(spark):
    ev = readers.table(spark, "events", SF)
    est = {r["event_type"]: r["est_distinct"] for r in hll_rollup(hll_daily_sketches(ev)).collect()}
    exact = {
        r["event_type"]: r["x"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("x")).collect()
    }
    for k, x in exact.items():
        assert abs(est[k] - x) <= 0.05 * x, (k, est[k], x)


def test_cms_estimates_are_one_sided_and_bounded(spark):
    ev = readers.table(spark, "events", SF)
    depth, width = 4, 256
    cms = cms_build(ev, "user_id", depth, width)
    # sketch is genuinely sketch-sized
    assert cms.count() <= depth * width
    exact = ev.groupBy("user_id").agg(F.count("*").alias("x"))
    est = cms_estimate(cms, exact.select("user_id"), "user_id", depth, width)
    n_total = ev.count()
    joined = exact.join(est, "user_id").collect()
    assert len(joined) == exact.count()
    for r in joined:
        assert r["est_count"] >= r["x"], r  # CMS never undercounts
        # loose sanity bound on overestimate: 4x the expected
        # per-row collision mass
        assert r["est_count"] - r["x"] <= 4 * n_total / width, r


def test_bloom_no_false_negatives_and_low_fp(spark):
    from sensor_data_pipeline___spark.operators import sketches as sk

    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    words = sk.bloom_build(keys, "k", num_bits=1 << 16, num_hashes=5)
    # every inserted key must probe positive (bloom's hard guarantee)
    hits = keys.filter(sk.bloom_might_contain(words, "k", 1 << 16, 5)).count()
    assert hits == 2000
    # disjoint probe range: false-positive rate near the theoretical
    # (1 - e^(-kn/m))^k ≈ 0.6% at n=2000, m=65536, k=5
    probe = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    fp = probe.filter(sk.bloom_might_contain(words, "k", 1 << 16, 5)).count()
    assert fp / 10_000 < 0.05


def test_bloom_semi_join_equals_plain_semi_join(spark):
    from sensor_data_pipeline___spark.operators import sketches as sk
    from sensor_data_pipeline___spark.sources import readers

    li = readers.table(spark, "lineitem", "/root/testdata/sf0.001")
    orders = readers.table(spark, "orders", "/root/testdata/sf0.001")
    dim = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    got = sorted(
        r.l_orderkey
        for r in sk.bloom_semi_join(li.select("l_orderkey"), dim, "l_orderkey")
        .collect()
    )
    want = sorted(
        r.l_orderkey
        for r in li.select("l_orderkey").join(dim, "l_orderkey", "left_semi").collect()
    )
    assert got == want and len(want) > 0


def test_bloom_probe_key_needing_backticks(spark):
    # A key column whose name needs quoting (dot/space) must work —
    # the probe splices the column into generated SQL.
    from sensor_data_pipeline___spark.operators import sketches as sk

    keys = spark.range(100).select(F.col("id").alias("odd name.dot"))
    words = sk.bloom_build(keys, "`odd name.dot`", num_bits=1 << 12, num_hashes=3)
    hits = keys.filter(
        sk.bloom_might_contain(words, "odd name.dot", 1 << 12, 3)
    ).count()
    assert hits == 100


def test_histogram_sketch_mergeability(spark):
    """Rollup of per-day sketches must equal the sketch built over the
    whole table in one pass — integer addition is exact, no
    approximation drift (the HLL mergeability property, but bitwise)."""
    from pyspark.sql import functions as F

    from sensor_data_pipeline___spark.operators.sketches import (
        histogram_merge,
        histogram_sketch,
    )
    from sensor_data_pipeline___spark.sources import readers

    ev = readers.table(spark, "events", "/root/testdata/sf0.001").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    lo, hi = ev.agg(
        F.min("value").cast("double"), F.max("value").cast("double")
    ).first()
    daily = histogram_sketch(ev, ["event_type", "day"], "value", lo, hi, 32)
    rolled = {
        (r.event_type, r.bin): r.cnt
        for r in histogram_merge(daily, ["event_type"]).collect()
    }
    direct = {
        (r.event_type, r.bin): r.cnt
        for r in histogram_sketch(ev, ["event_type"], "value", lo, hi, 32).collect()
    }
    assert rolled == direct
    # clamp rule: every count accounted for, bins within range
    assert sum(rolled.values()) == ev.count()
    assert all(0 <= b < 32 for _, b in rolled)


def test_histogram_sketch_excludes_nulls(spark):
    """NULL values must be excluded before binning — without the
    filter, floor(NULL)/greatest(NULL, 0) lands every null silently in
    bin 0, inflating low-quantile mass (what SQL aggregates never do)."""
    from sensor_data_pipeline___spark.operators.sketches import histogram_sketch

    df = spark.createDataFrame(
        [("a", 5.0), ("a", None), ("a", None), ("a", 95.0)],
        "k string, v double",
    )
    counts = {
        r.bin: r.cnt
        for r in histogram_sketch(df, ["k"], "v", 0.0, 100.0, 10).collect()
    }
    assert counts == {0: 1, 9: 1}  # 2 nulls contribute nowhere


def test_histogram_quantile_labels_full_value(spark):
    """Sub-percent quantiles keep every significant digit in their
    column label (0.125 -> q12_5_est, not q12_est) and near-identical
    quantiles can never silently collide into duplicate columns."""
    import pytest

    from sensor_data_pipeline___spark.operators.sketches import (
        histogram_quantile,
        histogram_sketch,
    )

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(100)], "k string, v double"
    )
    sk = histogram_sketch(df, ["k"], "v", 0.0, 100.0, 100)
    out = histogram_quantile(sk, ["k"], [0.125, 0.5, 0.504], 0.0, 100.0, 100)
    assert set(out.columns) == {"k", "q12_5_est", "q50_est", "q50_4_est"}
    row = out.collect()[0]
    # distinct estimates from distinct labels (bin midpoints)
    assert row["q12_5_est"] == 12.5 and row["q50_est"] == 49.5
    assert row["q50_4_est"] == 50.5  # 0.504 picks the NEXT bin up
    # 0.5 vs 0.50000000001 would produce the same printable label ->
    # an ambiguous frame; the guard raises instead
    with pytest.raises(ValueError, match="duplicate quantile labels"):
        histogram_quantile(sk, ["k"], [0.5, 0.5], 0.0, 100.0, 100)
