"""Bucketed co-located join: the zero-shuffle join strategy for big
fact-fact joins at 100 TB.

Writing both sides bucketed by the join key into the session warehouse
lets Spark plan the join with NO exchange on either side — the physical
plan must contain zero shuffles. This is the pre-partitioning strategy
the engine recommends for repeated fact-fact joins (vs AQE-tuned
shuffle joins for ad-hoc ones)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_migrator_spark.plans import plan_audit
from iceberg_catalog_migrator_spark.sources import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # managed tables in the session's default warehouse; DROP TABLE
    # removes the files (spark-warehouse/ is gitignored)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    for df, name, key in [(li, "li_bucketed", "l_orderkey"), (orders, "ord_bucketed", "o_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    yield "li_bucketed", "ord_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    li_t, ord_t = bucketed_tables
    li = spark.table(li_t)
    orders = spark.table(ord_t)
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    a = plan_audit(joined)
    assert a.n_shuffles == 0, f"bucketed join must not exchange:\n{a.text[:800]}"
    # and it is still the correct join
    expected = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert joined.count() == expected


def test_bucketed_aggregation_reuses_bucketing(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    agg = spark.table(li_t).groupBy("l_orderkey").agg(F.count("*").alias("n"))
    a = plan_audit(agg)
    # grouping on the bucket key needs no exchange either
    assert a.n_shuffles == 0
