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
# Round-11 rotation (standing policy from VERDICT r6 directive #1,
# window prescription per VERDICT r10 directive #2): the window keeps
# the 11-entry veteran spine (reference-parity core that never
# rotates, the TPC-H flagship, the corpus composite, dedup_exact, the
# session_window_batch watch item), adds the THREE r11-registered
# never-gated entries (the BPE encode half bpe_encode_k5 +
# pack_sequences_bpe per directive #1, the release_audit composite
# per #6), and fills the remaining 36 slots with the STALEST
# previously-gated cohort: all 34 entries last gated in r6
# (accuracy-contract sketches, profiling, set ops, funnels, text
# stats, embedding column stats) plus the first 2 (name order) of the
# r7-last cohort (the exact ANN twins). The five r9-registered
# entries gated green in both r9 and r10 rotate out. The ledger
# invariant ("every oracle-backed entry gated at least once") is
# auditable in GATE_LEDGER.md, regenerated per round by
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
    # --- never-gated (registered r11): the BPE encode half + its
    # pack_sequences integration, and the release-audit composite ---
    "bpe_encode_k5",
    "pack_sequences_bpe",
    "release_audit",
    # --- stalest refresh: last gated r6 (all 34) ---
    "collapse_repeat_tokens",
    "conditional_boolean_aggs",
    "corr_regression_returnflag",
    "daily_new_vs_returning",
    "duplicated_gram_fraction",
    "embedding_centroid_norm",
    "embedding_component_stats",
    "embedding_dim_variance",
    "embedding_quantization_stats",
    "full_outer_click_purchase",
    "funnel_conversion",
    "grouping_sets_priority",
    "hard_negative_mining",
    "hard_negative_mining_blocked",
    "hash_split_sizes",
    "histogram_sketch_quantiles",
    "json_extract_props",
    "latest_event_per_user",
    "mixture_sample_docs",
    "quality_assertion_counts",
    "range_frame_user_spend",
    "rank_distribution",
    "revenue_share_by_nation",
    "set_except_customers",
    "set_intersect_customers",
    "shard_assignment",
    "string_agg_nations",
    "text_normalization",
    "top_bigrams",
    "top_terms",
    "udtf_first_terms",
    "value_histogram",
    "waveform_envelope",
    "winsorize_event_values",
    # --- stalest refresh: last gated r7 (first 2 by name) ---
    "ann_topk_ivf_exact",
    "ann_topk_lsh_exact",
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
