"""Execution smoke for the mining/curation family at the smallest
fixture: every query must EXECUTE (not just plan) on near-empty inputs
— empty frequent-pair sets, single-run SCD histories, gap-free spines —
with a stable schema. The oracle gate covers sf0.01; this covers the
degenerate tail it never sees."""

import pytest

from iceberg_catalog_migrator_spark.queries import all_queries

SF = "/root/testdata/sf0.001"

MINING = [
    "basket_frequent_part_pairs",
    "fuzzy_join_customer_supplier_names",
    "events_multi_grain_rollup",
    "events_top_paths",
    "events_cdc_snapshot_diff",
    "histogram_order_totals",
    "doc_quality_decile_bands",
    "table_fingerprint_orders",
    "events_scd2_history",
    "incremental_agg_maintenance",
    "skew_key_diagnostics",
    "graph_copurchase_triangles",
    "orders_priority_transitions",
    "customer_rfm_segments",
    "part_abc_revenue_classes",
    "events_burst_user_flags",
    "events_hourly_gap_fill",
    "events_rolling_7d_active_users",
    "window_distribution_functions",
    "dedup_url_canonical_groups",
    "multimodal_patch_grid",
    "events_error_rate_slo",
    "orders_dow_seasonality",
    "orders_cohort_ltv",
    "events_conversion_latency_percentiles",
    "multimodal_video_frame_stats",
]


@pytest.mark.parametrize("name", MINING)
def test_executes_on_smallest_fixture(spark, name):
    df = all_queries()[name].fn(spark, SF)
    n = df.count()
    assert n >= 0
    assert len(df.columns) >= 1
