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
# Round-14 rotation (standing policy from VERDICT r6 directive #1;
# this round per VERDICT r13 directive #2): the window keeps the
# 11-entry veteran spine (reference-parity core that never rotates,
# the TPC-H flagship, the corpus composite, dedup_exact, the
# session_window_batch watch item), adds the NINE entries whose
# oracle surface is new or changed this round —
# cc_labels_maintained_fuzzy (the persisted maintained-labeling
# lifecycle, new), cluster_split_from_labels (the maintained-store
# split consumer, new — same closure oracle as cluster_aware_split),
# dedup_pipeline_stats + cluster_stats_exact
# (rows-only → oracle-backed via the exact-Jaccard pair source,
# VERDICT r13 #7), minhash_accuracy_contract (oracle shingle space
# realigned to \s+ per advisor r13), split_leakage_stats (left-join
# 'unknown' audit semantics per advisor r13) + cluster_split_leakage
# (re-gated because it runs through the changed shared operator; its
# own oracle keeps inner joins — the cluster split covers every doc,
# so no 'unknown' cell can arise there), release_audit +
# release_audit_summary (Spark side
# reworked to exact-dup representatives, VERDICT r13 #3 — unchanged
# output, re-gated on principle) — then the r14 staleness-queue head
# (the 16 entries last gated r8: q19_discounted_revenue …
# unigram_lm_scores), and fills the remaining 14 slots with the
# first 14 (by name) of the 39 entries last gated r10
# (approx_distinct_accuracy … pack_sequences; the rest, from
# pit_join_click_version on, slide to the front of the r15 queue). Recomputed from the
# CORRECTNESS_r*.json union this round; the r13 window's non-spine
# entries rotate out (all green in r13). The ledger invariant
# ("every oracle-backed entry gated at least once") is auditable in
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
    # --- r14 new/changed oracle surface (gate in the round they
    # land/change) ---
    "cc_labels_maintained_fuzzy",
    "cluster_split_from_labels",
    "dedup_pipeline_stats",
    "cluster_stats_exact",
    "minhash_accuracy_contract",
    "split_leakage_stats",
    "cluster_split_leakage",
    "release_audit",
    "release_audit_summary",
    # --- staleness queue head: last gated r8 (the 16 the r13 window
    # couldn't fit) ---
    "q19_discounted_revenue",
    "q21_sole_supplier_failed_orders",
    "q2_min_cost_supplier",
    "q3_top_revenue_orders",
    "q4_order_priority",
    "q6_revenue_change",
    "q7_nation_trade",
    "q8_market_share",
    "q9_product_profit",
    "segment_dedup_text",
    "semantic_dedup_exact",
    "set_except_all_customers",
    "set_intersect_all_customers",
    "trigram_repetition",
    "trim_duplicate_ngrams_text",
    "unigram_lm_scores",
    # --- next-stalest refresh: last gated r10 (first 14 by name) ---
    "approx_distinct_accuracy",
    "approx_percentile_accuracy",
    "band_stratified_admission",
    "bpe_merges_k5",
    "char_entropy_quality",
    "chunk_documents_stats",
    "cms_heavy_hitters",
    "contamination_attribution",
    "gapfill_linear_interp",
    "hll_distinct_rollup",
    "m4_downsample",
    "mad_outliers",
    "multimodal_binary_meta",
    "pack_sequences",
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
