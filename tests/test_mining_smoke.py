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


def test_basket_pair_expansion_guard(spark):
    """A synthetic hot basket past the frequent-item cap must fail the
    task loudly (named remedy) instead of materializing the quadratic
    pair array; baskets at the cap still work."""
    import pytest
    from pyspark.sql import functions as F

    from iceberg_catalog_migrator_spark.queries.mining import (
        MIN_ITEM_SUPPORT,
        pair_supports_from_sets,
    )

    n_items = 60
    # every item is frequent: it appears in MIN_ITEM_SUPPORT small baskets
    small = [
        (100 * i + b, [i]) for i in range(n_items) for b in range(MIN_ITEM_SUPPORT)
    ]
    # two identical hot baskets so surviving pairs meet MIN_PAIR_SUPPORT
    hot = [(999_998, list(range(n_items))), (999_999, list(range(n_items)))]
    sets = spark.createDataFrame(
        small + hot, "l_orderkey bigint, items array<bigint>"
    )
    with pytest.raises(Exception, match="frequent items .* quadratic"):
        pair_supports_from_sets(sets, max_items=50).count()
    # at the cap, the same data flows through
    ok = pair_supports_from_sets(sets, max_items=n_items)
    assert ok.count() == n_items * (n_items - 1) // 2
