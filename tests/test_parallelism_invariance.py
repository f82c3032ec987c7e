"""Determinism across parallelism: the same query at different shuffle
partition counts must return identical rows. This is the correctness
class the DuckDB oracle cannot see (it runs Spark once): floating
aggregation order, collect_list ordering, ntile cuts, and xor
checksums all vary with partitioning unless the query was built for
invariance. Queries whose shared stage caches would short-circuit the
second run (dedup/similarity/basket families) are excluded — their
invariance is enforced by their construction rules instead (decimal
sums, array_sort, seeded hashes)."""

import pytest

from iceberg_catalog_migrator_spark.queries import all_queries

SF = "/root/testdata/sf0.001"

QUERIES = [
    "events_top_paths",  # sorted collect_list paths
    "table_fingerprint_orders",  # xor checksum
    "incremental_agg_maintenance",  # decimal partial merge
    "events_scd2_history",  # run collapse + lead intervals
    "doc_quality_decile_bands",  # ntile cuts
    "customer_rfm_segments",  # three global ntile windows
    "events_conversion_latency_percentiles",  # exact percentiles
    "q1_pricing_summary",  # decimal-sum flagship
    # round-7 queries
    "skyline_parts_price_size",  # two-phase sweep: set must not depend on chunking
    "events_hourly_ewma",  # integer dyadic weights
    "events_attribution_multitouch",  # (ts, event_id) first/last tiebreaks
    "approx_percentile_with_tolerance",  # rank-discrete exact side + sketch gate
    "dq_constraint_report",  # conditional aggregates + anti-join counts
    "graph_reachability_recursive",  # recursive CTE frontier dedup
    "synthetic_source_type_stats",  # generator splits must not leak into results
]


def _snapshot(spark, name):
    pdf = all_queries()[name].fn(spark, SF).toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).astype(str)
    return sorted(map(tuple, pdf.itertuples(index=False, name=None)))


@pytest.mark.parametrize("name", QUERIES)
def test_same_rows_at_different_partitionings(spark, name):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _snapshot(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _snapshot(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b
