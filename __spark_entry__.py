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
# queries, so ordering is part of the contract. The priority window
# packs the strongest oracle-hash-verifiable coverage: reference
# parity, the full TPC-H adaptation, the queries fixed/resharded this
# round, and the advanced joins/set-ops/profiling families. Rows-only
# (no-oracle) entries ride the local replica harness
# (tests/test_queries_oracle.py) instead of spending gate slots.
# Round-5 rotation (VERDICT r4 directive #1): the gate window swaps
# ~24 long-green veterans for never-driver-checked oracle-backed
# entries, so the driver independently verifies fresh families (as-of
# joins, range join, sessionization, OLAP rollup/pivot, gap-fill,
# sketch rollups, EWMA fold, decontamination, redaction, weighted
# sampling). Displaced veterans (TPC-H mid-pack q2-q9/q13-q21,
# interarrival_histogram, ntile_deciles, inverted_index_sample,
# set_*_all_customers, column_profile_orders, benford_first_digit,
# trigram_repetition, content_pattern_profile) stay green on the local
# replica harness (tests/test_queries_oracle.py), which mirrors the
# driver's Arrow fetch exactly; all 132 were re-verified green at
# sf0.01 under a hostile session before this rotation landed.
# r6 rotation candidates (never driver-gated, oracle-backed, added in
# r5): corpus composite members already gated; swap veterans for
# shard_assignment, mixture_sample_docs, collapse_repeat_tokens,
# char_entropy_quality, chunk_documents_stats, winsorize_event_values,
# duplicated_gram_fraction, embedding_quantization_stats.
_PRIORITY = (
    # reference parity core (SURVEY.md §2) — never rotates out
    "silver_parse",
    "gold_daily_power",
    "serving_union",
    "watermark_incremental",
    "affected_days_recompute",
    "coalesce_last_purchase",
    "date_range_orders",
    # TPC-H flagships + the three re-ranged in round 4 (one more
    # independent check on the formerly vacuous predicates)
    "q1_pricing_summary",
    "q5_region_revenue",
    "q10_returned_revenue",
    "q12_shipmode_priority",
    "q22_idle_rich_customers",
    # long-horizon composites that keep their slot
    "time_weighted_avg",
    "pack_sequences",
    "equi_depth_histogram",
    "set_similarity_pairs",
    "pit_join_click_version",
    "scd2_purchase_values",
    "dedup_exact",
    # r5: corpus_pipeline_stats (the end-to-end dedup→quality→split→
    # decontaminate→mixture→shard composition, new this round) takes
    # dedup_exact_stats's slot — that operator stays gate-covered via
    # dedup_exact in-window and green on the local replica harness.
    "corpus_pipeline_stats",
    "snapshot_diff_orders",
    "deterministic_stratified_sample",
    "bloom_semi_join_lineitem",
    "connected_components_fuzzy",
    "variant_props_extract",
    "sql_api_nation_revenue",
    # --- first-time gate entries (24) ---
    # round-4 additions, never driver-checked
    "train_test_contamination",
    "redaction_stats",
    "weighted_sample_docs",
    "ewma_daily_value",
    # time-series repair + robust stats
    "gapfill_linear_interp",
    "gapfill_forward_fill",
    "rolling_median_power",
    "mad_outliers",
    # behavioral analytics
    "cohort_retention",
    "sessionization",
    "session_window_batch",
    # as-of / range temporal joins
    "asof_last_purchase",
    "asof_next_click",
    "range_join_purchase_clicks",
    # fuzzy matching
    "fuzzy_name_pairs",
    # window + OLAP shapes
    "window_topk_orders",
    "rollup_lineitem",
    "pivot_daily_avg",
    "unpivot_charges",
    # text / similarity / multimodal / sketches
    "tfidf_top_terms",
    "m4_downsample",
    "similarity_topk",
    "multimodal_binary_meta",
    "hll_distinct_rollup",
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
