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
# Round-13 rotation (standing policy from VERDICT r6 directive #1;
# this round's prescription per VERDICT r12 directives #1–#3): the
# window keeps the 11-entry veteran spine (reference-parity core that
# never rotates, the TPC-H flagship, the corpus composite,
# dedup_exact, the session_window_batch watch item), adds the EIGHT
# entries whose oracle surface is new this round
# (split_leakage_stats, cluster_aware_split,
# temperature_mixture_tokens, cluster_split_leakage,
# stratified_sample_counts upgraded rows-only → oracle-backed, the
# corpus_pipeline_tokens composite, the minhash_accuracy_contract
# boolean-pinned LSH precision/recall floors, and the
# connected_components_incremental_fuzzy maintenance twin —
# registering into the
# CURRENT window so the ledger's never-gated list stays empty after
# this round's gate), then the r13 staleness-queue head (the 8
# entries last gated r7: semi_join_active_customers,
# string_functions_parts, text_quality, token_counts,
# user_event_sequences, window_running_total, winnowing_fingerprint,
# zorder_curve_stats), and fills the remaining 23 slots with the
# first 23 (by name) of the 39 entries last gated r8
# (asof_last_purchase … next_event_training_pairs; the remaining 16
# — q19_discounted_revenue … unigram_lm_scores — slide to the front
# of the r14 queue; q3_top_revenue_orders stays benched at sf0.1
# every round regardless). Recomputed from the
# CORRECTNESS_r*.json union this round. The r12 window's non-spine entries rotate out (all green in
# r12). The ledger invariant ("every oracle-backed entry gated at
# least once") is auditable in GATE_LEDGER.md, regenerated per round
# by scripts/gen_gate_ledger.py. Displaced veterans stay covered by
# the local replica harness and scripts/verify_driver.py's
# full-surface sf0.01 sweep.
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
    # --- r13-registered (gate in the round they land: VERDICT r12
    # directives #2 and #3, plus this round's additional surfaces) ---
    "split_leakage_stats",
    "cluster_aware_split",
    "temperature_mixture_tokens",
    "cluster_split_leakage",
    # rows-only → oracle-backed this round (accuracy-contract
    # booleans); gates with the other r13 registrations
    "stratified_sample_counts",
    # the r13 end-to-end composition (cluster-aware split +
    # token-budgeted mixture in the corpus_pipeline_stats posture)
    "corpus_pipeline_tokens",
    # the seeded-LSH accuracy contract (precision/recall floors vs the
    # exact shingle-Jaccard ground truth, boolean-pinned)
    "minhash_accuracy_contract",
    # incremental CC maintenance vs the full-closure oracle
    "connected_components_incremental_fuzzy",
    # --- staleness queue head: last gated r7 ---
    "semi_join_active_customers",
    "string_functions_parts",
    "text_quality",
    "token_counts",
    "user_event_sequences",
    "window_running_total",
    "winnowing_fingerprint",
    "zorder_curve_stats",
    # --- stalest refresh: last gated r8 (first 23 by name) ---
    "asof_last_purchase",
    "asof_next_click",
    "bloom_semi_join_lineitem",
    "bpe_merge_candidates",
    "cohort_retention",
    "connected_components_fuzzy",
    "decontam_probe_index",
    "deterministic_stratified_sample",
    "dsir_log_weights",
    "dsir_probe_index",
    "dsir_resample_top100",
    "duplicate_ngram_coverage",
    "equi_depth_histogram",
    "ewma_daily_value",
    "fuzzy_name_pairs",
    "gapfill_forward_fill",
    "gopher_filter_counts",
    "hard_negative_mining_indexed_exact",
    "lsh_bucket_invariants",
    "minhash_band_invariants",
    "nation_trade_pagerank",
    "near_dup_probe_exact",
    "next_event_training_pairs",
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
