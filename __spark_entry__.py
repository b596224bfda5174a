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
# Round-15 rotation (standing policy from VERDICT r6 directive #1;
# this round per VERDICT r14 directive #1): the window keeps the
# 11-entry veteran spine (reference-parity core that never rotates,
# the TPC-H flagship, the corpus composite, dedup_exact, the
# session_window_batch watch item), re-gates the TWO entries whose
# operator surface changes this round — cc_labels_maintained_fuzzy
# (its lifecycle runs through cc_labels_update, which gains
# node-pruned store reads per VERDICT r14 directive #3) and
# split_leakage_stats (gains the 'uncovered' audit flag per advisor
# r14) — then drains the staleness queue: ALL 25 entries last gated
# r10 (pit_join_click_version … window_topk_orders, the remainder the
# r14 window couldn't fit) and the first 12 (by name) of the 38
# entries last gated r11 (ann_topk_ivf_exact …
# embedding_quantization_stats; the rest, from
# full_outer_click_purchase on, head the r16 queue). Recomputed from
# the CORRECTNESS_r*.json union this round (see the last-gated
# histogram in GATE_LEDGER.md); the r14 window's non-spine entries
# rotate out (all green in r14). The ledger invariant ("every
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
    # --- r15 changed operator surface (gate in the round it changes)
    "cc_labels_maintained_fuzzy",
    "split_leakage_stats",
    # --- staleness queue: last gated r10 (all 25 remaining) ---
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
    "simhash_near_dup_exact",
    "similarity_topk",
    "snapshot_diff_orders",
    "sql_api_nation_revenue",
    "tfidf_top_terms",
    "time_weighted_avg",
    "train_test_contamination",
    "unigram_lm_band_assign",
    "unpivot_charges",
    "variant_props_extract",
    "weighted_sample_docs",
    "window_topk_orders",
    # --- next-stalest refresh: last gated r11 (first 12 by name) ---
    "ann_topk_ivf_exact",
    "ann_topk_lsh_exact",
    "bpe_encode_k5",
    "collapse_repeat_tokens",
    "conditional_boolean_aggs",
    "corr_regression_returnflag",
    "daily_new_vs_returning",
    "duplicated_gram_fraction",
    "embedding_centroid_norm",
    "embedding_component_stats",
    "embedding_dim_variance",
    "embedding_quantization_stats",
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
