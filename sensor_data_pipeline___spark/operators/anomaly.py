"""Robust anomaly scoring for sensor streams: per-metric robust z-score
(median / MAD), in two interchangeable implementations.

1. :func:`robust_zscore_native` — pure DataFrame ops (two median
   aggregations + broadcast joins back). Everything stays JVM-side;
   this is the production path, and the shape the DuckDB oracle checks.

2. :func:`robust_zscore_grouped` — ``applyInPandas`` grouped-map: each
   metric's rows arrive as ONE Arrow-backed pandas frame and the whole
   score is computed in vectorized numpy. This is the engine's template
   for per-group logic Spark expressions can't reach (iterative fits,
   scipy calls, model scoring); the pytest suite pins it row-identical
   to the native path, so swapping a real model in inherits a checked
   harness.

Why robust: sensor feeds carry spikes and stuck-at faults; mean/stddev
move with the outliers they're meant to flag, median/MAD don't. The
0.6745 factor (1/1.4826) scales MAD to σ-equivalents under normality.

Scale: the grouped-map path shuffles each group to one task — right
for per-metric groups (thousands of metrics × bounded rows), wrong for
a single giant group (use the native path, which is all partial aggs
and broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: MAD → σ consistency factor under a normal distribution.
MAD_SIGMA = 1.4826


def robust_zscore_native(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Adds ``score`` = |x − median| / (1.4826 · MAD) per group —
    DataFrame-native (two grouped medians, broadcast joined back)."""
    med = df.groupBy(group_col).agg(F.median(value_col).alias("_med"))
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "_absdev", F.abs(F.col(value_col) - F.col("_med"))
    )
    mad = dev.groupBy(group_col).agg(F.median("_absdev").alias("_mad"))
    return (
        dev.join(F.broadcast(mad), group_col)
        .withColumn(
            "score", F.col("_absdev") / (F.lit(MAD_SIGMA) * F.col("_mad"))
        )
        .drop("_med", "_absdev", "_mad")
    )


def robust_zscore_grouped(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Same contract as :func:`robust_zscore_native`, computed per group
    in one vectorized pandas pass (``applyInPandas`` grouped-map)."""
    import numpy as np

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, score double"

    def score(pdf):
        x = pdf[value_col].to_numpy(dtype=float)
        med = float(np.median(x))
        mad = float(np.median(np.abs(x - med)))
        pdf = pdf.copy()
        with np.errstate(divide="ignore", invalid="ignore"):
            pdf["score"] = np.abs(x - med) / (MAD_SIGMA * mad)
        return pdf

    return df.groupBy(group_col).applyInPandas(score, schema=schema)


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Percentile clamp: values outside the group's [lo, hi] exact
    interpolated percentiles are pulled to the boundary — the standard
    outlier TREATMENT where :func:`robust_zscore_native` is the
    detection (scoring flags, winsorizing repairs; both keep the row,
    unlike a filter).

    Adds ``value_w`` (clamped), ``_lo``/``_hi`` (the bounds applied).
    Shape: one grouped percentile aggregation (partial-aggregated,
    O(groups) output) broadcast-joined back onto the scan — the same
    two-pass broadcast-stats pattern as the histogram bounds and the
    robust z-score; nothing wide, nothing driver-side. At extreme
    cardinality the bounds frame outgrows broadcast and AQE falls back
    to a shuffled join on the group key — still one exchange.

    Exact `percentile` (not `approx_percentile`) keeps the bounds
    cross-engine verifiable (≡ DuckDB `quantile_cont`); the approx
    sketch is the scale escalation when a group's value set won't fit
    an exact-percentile buffer.
    """
    bounds = df.groupBy(group_col).agg(
        F.percentile(value_col, lo).alias("_lo"),
        F.percentile(value_col, hi).alias("_hi"),
    )
    v = F.col(value_col)
    return df.join(F.broadcast(bounds), group_col).withColumn(
        "value_w",
        F.least(F.greatest(v, F.col("_lo")), F.col("_hi")),
    )
