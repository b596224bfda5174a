"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship serving query (SURVEY.md §3.2) on
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full operator
surface (sensor_data_pipeline___spark/queries.py) for the DuckDB
correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sensor_data_pipeline___spark import queries as _q
from sensor_data_pipeline___spark.session import apply_runtime_confs

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's GET /data lifecycle (filter + union-all + global
    sort + wire formatting) over the events stream mapped to the sensor
    schema, including the daily-power gold rows.
    """
    apply_runtime_confs(spark)
    return _q.QUERIES["serving_union"](spark, SF0001)


# The driver's correctness gate caps at the FIRST 50 registered
# queries, so ordering is part of the contract. Rows-only (no-oracle)
# entries ride the local replica harness
# (tests/test_queries_oracle.py) instead of spending gate slots.
# Round-9 rotation (standing policy from VERDICT r6 directive #1,
# refreshed per VERDICT r8 directive #2): the window keeps the
# 11-entry veteran spine (reference-parity core that never rotates,
# the TPC-H flagship, the corpus composite, dedup_exact, the
# session_window_batch watch item), adds the FIVE r9-registered
# never-gated entries (the exact-recall simhash twin per directive
# #5, the iterated-BPE driver per #6, the CCNet band store +
# stratified-admission pair per #7, and per-benchmark contamination
# attribution), and fills the remaining 34 slots with the STALEST
# previously-gated cohort exactly as the r8 verdict prescribed: all
# 29 entries last gated in r5 (TPC-H q5/q10/q12/q22, as-of/range/PIT
# joins, gap-fill, sessionization, sketches-adjacent rollups,
# sampling, profiling) plus the first 5 (name order) of the r6-last
# cohort (accuracy-contract sketches, text profiling). The
# ledger invariant ("every oracle-backed entry gated at least once")
# is auditable in GATE_LEDGER.md, regenerated per round by
# scripts/gen_gate_ledger.py. Displaced veterans stay covered by the
# local replica harness and scripts/verify_driver.py's full-surface
# sf0.01 sweep.
_PRIORITY = (
    # reference parity core (SURVEY.md §2) — never rotates out
    "silver_parse",
    "gold_daily_power",
    "serving_union",
    "watermark_incremental",
    "affected_days_recompute",
    "coalesce_last_purchase",
    "date_range_orders",
    # veteran spine
    "q1_pricing_summary",
    "corpus_pipeline_stats",
    "dedup_exact",
    "session_window_batch",  # r5 bench watch item — keep it gated
    # --- never-gated (registered r9, gated r9): the exact-recall
    # simhash twin, the iterated-BPE driver, the CCNet band store +
    # stratified-admission pair, and per-benchmark contamination
    # attribution ---
    "simhash_near_dup_exact",
    "bpe_merges_k5",
    "unigram_lm_band_assign",
    "band_stratified_admission",
    "contamination_attribution",
    # --- stalest refresh: last gated r5 (all 29 remaining) ---
    "gapfill_linear_interp",
    "hll_distinct_rollup",
    "m4_downsample",
    "mad_outliers",
    "multimodal_binary_meta",
    "pack_sequences",
    "pit_join_click_version",
    "pivot_daily_avg",
    "q10_returned_revenue",
    "q12_shipmode_priority",
    "q22_idle_rich_customers",
    "q5_region_revenue",
    "range_join_purchase_clicks",
    "redaction_stats",
    "rolling_median_power",
    "rollup_lineitem",
    "scd2_purchase_values",
    "sessionization",
    "set_similarity_pairs",
    "similarity_topk",
    "snapshot_diff_orders",
    "sql_api_nation_revenue",
    "tfidf_top_terms",
    "time_weighted_avg",
    "train_test_contamination",
    "unpivot_charges",
    "variant_props_extract",
    "weighted_sample_docs",
    "window_topk_orders",
    # --- stalest refresh: last gated r6 (first 5 by name; the sixth
    # slot went to contamination_attribution above — never-gated
    # entries take precedence over stale refresh) ---
    "approx_distinct_accuracy",
    "approx_percentile_accuracy",
    "char_entropy_quality",
    "chunk_documents_stats",
    "cms_heavy_hitters",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, priority
    window first (the driver gate reads the first 50)."""
    ordered = {name: _q.QUERIES[name] for name in _PRIORITY}
    ordered.update(_q.QUERIES)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; rows-only entries
    (approximate / hash-seeded algorithms) are intentionally absent."""
    return dict(_q.ORACLE)
