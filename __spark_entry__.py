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
# Round-12 rotation (standing policy from VERDICT r6 directive #1,
# window prescription per VERDICT r11 directive #2): the window keeps
# the 11-entry veteran spine (reference-parity core that never
# rotates, the TPC-H flagship, the corpus composite, dedup_exact, the
# session_window_batch watch item), adds the TEN never-gated
# entries (bpe_token_length_hist, registered after r11's gate ran —
# the one ledger exception — plus the r12-registered
# release_audit_summary per directive #6, cluster_quality_reps, and
# the five classifier queries quality_classifier_scores /
# quality_classifier_eval / quality_classifier_probe_index /
# quality_classifier_calibration / quality_classifier_bigram_eval,
# the star-CC twin connected_components_star_fuzzy, and the
# temperature mixing temperature_mixture_sample — registering into
# the CURRENT window so never-gated stays empty after this round's
# gate), and fills the remaining 29 slots with the STALEST
# previously-gated cohort: the first 29 (by name) of the 37 entries
# last gated in r7 (anti_join_inactive_customers …
# segment_frequency_stats — recomputed from
# the CORRECTNESS_r*.json union this round; semi_join_active_customers,
# string_functions_parts, text_quality, token_counts,
# user_event_sequences, window_running_total and
# winnowing_fingerprint slide to the front of the r13 staleness
# queue behind zorder_curve_stats; text_quality and token_counts
# stay benched at sf0.1 every round regardless). The r11 window's 39 non-spine
# entries rotate out. The ledger invariant ("every
# oracle-backed entry gated at least once") is auditable in
# GATE_LEDGER.md, regenerated per round by
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
    # --- never-gated: registered after r11's gate ran (ledger
    # exception) + the r12-registered bounded release-audit read and
    # quality-argmax cluster representatives ---
    "bpe_token_length_hist",
    "release_audit_summary",
    "cluster_quality_reps",
    "quality_classifier_scores",
    "quality_classifier_eval",
    "quality_classifier_probe_index",
    "connected_components_star_fuzzy",
    "quality_classifier_calibration",
    "temperature_mixture_sample",
    "quality_classifier_bigram_eval",
    # --- stalest refresh: last gated r7 (first 29 by name) ---
    "anti_join_inactive_customers",
    "benford_first_digit",
    "column_profile_orders",
    "content_pattern_profile",
    "cube_orders",
    "dedup_exact_stats",
    "dedup_token_set",
    "distinct_agg_suppliers",
    "distinct_projection",
    "embedding_near_dup",
    "fingerprint_md5",
    "hash_stratified_counts",
    "hourly_tumbling_window",
    "in_list_filter",
    "interarrival_histogram",
    "inverted_index_sample",
    "iso_multiformat_parse",
    "lag_daily_power_delta",
    "lang_distribution",
    "lang_id_heuristic",
    "ntile_deciles",
    "percentile_prices",
    "psi_value_drift",
    "q13_customer_distribution",
    "q14_brand_revenue_share",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "segment_frequency_stats",
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
