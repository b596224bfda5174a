"""Robust z-score: the applyInPandas grouped-map path must be
row-identical to the DataFrame-native path, and both must flag planted
spikes without being moved by them."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from sensor_data_pipeline___spark.operators import anomaly
from sensor_data_pipeline___spark.sources import readers

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def readings(spark):
    return readers.table(spark, "events", SF).select("event_id", "event_type", "value")


def test_grouped_matches_native(spark, readings):
    native = {
        r.event_id: r.score
        for r in anomaly.robust_zscore_native(readings, "event_type", "value").collect()
    }
    grouped = {
        r.event_id: r.score
        for r in anomaly.robust_zscore_grouped(readings, "event_type", "value").collect()
    }
    assert native.keys() == grouped.keys()
    for k in native:
        assert native[k] == pytest.approx(grouped[k], rel=1e-12, abs=1e-12)


def test_planted_spike_is_flagged(spark):
    rows = [(i, "Voltage", 1.3 + (i % 7) * 0.01) for i in range(200)]
    rows.append((999, "Voltage", 500.0))  # the spike
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    scored = anomaly.robust_zscore_native(df, "event_type", "value")
    flagged = [r.event_id for r in scored.filter(F.col("score") > 3.0).collect()]
    assert flagged == [999]
    # robustness: the spike must not drag the center — normal rows stay low
    normal_max = (
        scored.filter(F.col("event_id") != 999).agg(F.max("score")).first()[0]
    )
    assert normal_max < 3.0
