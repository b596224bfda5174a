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
# Round-8 rotation (standing policy from VERDICT r6 directive #1,
# refreshed per VERDICT r7 directive #2): the window keeps the
# 11-entry veteran spine (reference-parity core that never rotates,
# the TPC-H flagship, the corpus composite, dedup_exact, the
# session_window_batch watch item), adds all TEN never-gated
# entries per GATE_LEDGER.md — the two persisted-index exact-mode
# twins (near_dup_probe_exact / hard_negative_mining_indexed_exact,
# VERDICT r7 directive #1), the reassembled-boilerplate-removal
# whole-output query (segment_dedup_text, directive #3), the two
# invariant-oracle graduations (lsh_bucket_invariants /
# minhash_band_invariants, directive #8), and the six r8-registered
# LLM-pipeline queries (gopher_filter_counts, unigram_lm_scores,
# semantic_dedup_exact, duplicate_ngram_coverage,
# trim_duplicate_ngrams_text, decontam_probe_index — registered this
# round, gated this round) — and fills the remaining 28 slots with
# the STALEST previously-gated entries: all 12 last gated in r4
# (TPC-H q2-q9/q19/q21, set ops, trigram) plus the first 16 (name
# order) of the r5-last cohort (as-of joins, gap-fill, sketches,
# profiling). The
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
    # --- never-gated (GATE_LEDGER.md): the r7 flagship index ops'
    # exact-mode twins + the reassembly whole-output oracle ---
    "near_dup_probe_exact",
    "hard_negative_mining_indexed_exact",
    "segment_dedup_text",
    # --- stalest refresh: last gated r4 ---
    "q19_discounted_revenue",
    "q21_sole_supplier_failed_orders",
    "q2_min_cost_supplier",
    "q3_top_revenue_orders",
    "q4_order_priority",
    "q6_revenue_change",
    "q7_nation_trade",
    "q8_market_share",
    "q9_product_profit",
    "set_except_all_customers",
    "set_intersect_all_customers",
    "trigram_repetition",
    "gopher_filter_counts",
    "unigram_lm_scores",
    "semantic_dedup_exact",
    "duplicate_ngram_coverage",
    "trim_duplicate_ngrams_text",
    "decontam_probe_index",
    # --- stalest refresh: last gated r5 (first 16 by name) ---
    "asof_last_purchase",
    "asof_next_click",
    "bloom_semi_join_lineitem",
    "cohort_retention",
    "connected_components_fuzzy",
    "deterministic_stratified_sample",
    "equi_depth_histogram",
    "ewma_daily_value",
    "fuzzy_name_pairs",
    "gapfill_forward_fill",
    # --- never-gated: r8 next-event training-pair export (displacing
    # gapfill_linear_interp, r5-gated, to the replica harness) ---
    "next_event_training_pairs",
    # --- never-gated: r8 tokenizer-vocab induction (displacing
    # hll_distinct_rollup, r6-gated, to the replica harness) ---
    "bpe_merge_candidates",
    # --- never-gated: the r8 iterative-graph family (fixed-depth
    # PageRank with an unrolled-CTE oracle) — registered this round,
    # gated this round (displacing m4_downsample, r5-gated, to the
    # replica harness) ---
    "nation_trade_pagerank",
    # --- never-gated: the r8 invariant-oracle graduations (directive
    # #8) — registered this round, gated this round ---
    "lsh_bucket_invariants",
    "minhash_band_invariants",
    # --- never-gated: the r8 DSIR importance-resampling family —
    # registered this round, gated this round (displacing the last
    # three of the r5-stalest cohort, mad_outliers /
    # multimodal_binary_meta / pack_sequences, to the replica
    # harness) ---
    "dsir_log_weights",
    "dsir_resample_top100",
    "dsir_probe_index",
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
