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
_PRIORITY = (
    # reference parity core (SURVEY.md §2)
    "silver_parse",
    "gold_daily_power",
    "serving_union",
    "watermark_incremental",
    "affected_days_recompute",
    "coalesce_last_purchase",
    "date_range_orders",
    # TPC-H adaptation (COVERAGE.md)
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_top_revenue_orders",
    "q4_order_priority",
    "q5_region_revenue",
    "q6_revenue_change",
    "q7_nation_trade",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_revenue",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_brand_revenue_share",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "q21_sole_supplier_failed_orders",
    "q22_idle_rich_customers",
    # fixed / resharded in round 3
    "time_weighted_avg",
    "psi_value_drift",
    "interarrival_histogram",
    "pack_sequences",
    "equi_depth_histogram",
    "ntile_deciles",
    "inverted_index_sample",
    # advanced joins, set ops, SCD2/PIT, profiling, LLM-pipeline reps
    "set_similarity_pairs",
    "pit_join_click_version",
    "scd2_purchase_values",
    "set_except_all_customers",
    "set_intersect_all_customers",
    "column_profile_orders",
    "benford_first_digit",
    "dedup_exact",
    "dedup_exact_stats",
    # new in round 3 (CDC, content-keyed sampling, bloom pre-filter,
    # recursive-closure-verified clustering, Spark 4 VARIANT)
    "snapshot_diff_orders",
    "deterministic_stratified_sample",
    "bloom_semi_join_lineitem",
    "connected_components_fuzzy",
    "variant_props_extract",
    # promoted in round 4 (oracle-cast fixes landed): text profiling
    # and the spark.sql front-door path. Displaced in_list_filter /
    # distinct_projection / iso_multiformat_parse — single-op parity
    # entries, green since round 1, still covered by the local replica
    # harness and the golden pipeline tests.
    "trigram_repetition",
    "content_pattern_profile",
    "sql_api_nation_revenue",
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
