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
