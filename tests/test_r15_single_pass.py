"""r15 optimization pins: subtrees a query used to pay for twice are
materialized once (eager localCheckpoint) — the plan-visible half of
the duplicate-work removals in OPTIMIZATION_r15.md. Value identity is
pinned elsewhere (the DuckDB oracle replica + the Python-reference
fit test); these assert the PHYSICAL shape so a refactor can't quietly
reintroduce the second computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators.dedup import (
    simhash_near_dup,
    simhash_near_dup_exact,
)
from sensor_data_pipeline___spark.plans import explain
from sensor_data_pipeline___spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "wholly different words here")],
        "doc_id long, text string",
    )


def test_simhash_exact_fingerprints_once(spark):
    """Both sides of the segment-blocked self-join must read the SAME
    materialized fingerprint frame: the final plan carries the
    checkpoint scan and no md5 fingerprint recompute (before r15 the
    md5-per-token + majority-vote subtree appeared once per side)."""
    df = simhash_near_dup_exact(_docs(spark))
    plan = explain.formatted_plan(df)
    assert "Scan ExistingRDD" in plan, plan
    assert "md5" not in plan, plan
    # and the result still finds exactly the planted exact-dup pair
    rows = [(r.doc_a, r.doc_b, r.hamming) for r in df.collect()]
    assert rows == [(1, 2, 0)], rows


def test_simhash_prod_fingerprints_once(spark):
    df = simhash_near_dup(_docs(spark))
    plan = explain.formatted_plan(df)
    assert "Scan ExistingRDD" in plan, plan
    assert "xxhash64" not in plan, plan
    assert {(r.doc_a, r.doc_b) for r in df.collect()} == {(1, 2)}, plan


def test_temperature_mixture_tokens_single_encode(spark):
    """The BPE encode feeds the quota broadcast AND the admission
    window; post-r15 the query plan reads the checkpointed narrow
    (doc_id, source, n_tokens) frame — the interpreted merge fold
    (F.aggregate over the symbol array) must be absent from the final
    plan on BOTH sides of the quota join."""
    df = QUERIES["temperature_mixture_tokens"](spark, SF)
    plan = explain.formatted_plan(df)
    assert "Scan ExistingRDD" in plan, plan
    assert "aggregate(" not in plan, plan  # the fold ran pre-checkpoint


def test_classifier_eval_featurizes_once(spark):
    """quality_classifier_eval's scoring pass reads the checkpointed
    feature frame instead of re-running explode + md5-per-token from
    the parquet scan (the fit's weights are driver-materialized by the
    GD loop, so any md5/explode in the FINAL plan could only be the
    scoring-side featurize recompute this pins away)."""
    df = QUERIES["quality_classifier_eval"](spark, SF)
    plan = explain.formatted_plan(df)
    assert "Scan ExistingRDD" in plan, plan
    assert "md5" not in plan, plan
    assert "posexplode" not in plan and "Generate explode" not in plan, plan
