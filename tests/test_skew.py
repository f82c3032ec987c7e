"""Salted-join equivalence: the skew tool must be a pure optimization —
identical multiset result to the plain join, hot key spread across
partitions."""

from pyspark.sql import functions as F

from iceberg_catalog_migrator_spark.functions.skew import salted_join
from iceberg_catalog_migrator_spark.sources import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    plain = orders.join(cust, "o_custkey").groupBy("c_nationkey").agg(
        F.count("*").alias("n"), F.sum("o_orderkey").alias("s")
    )
    salted = salted_join(orders, cust, "o_custkey", salt=8).groupBy("c_nationkey").agg(
        F.count("*").alias("n"), F.sum("o_orderkey").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_hot_key(spark):
    # one key carries 99% of rows; salting must spread it over >1 bucket
    big = spark.range(10_000).select(
        F.when(F.col("id") < 9_900, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([(1, "hot")] + [(i, "cold") for i in range(9_900, 10_000)], "k long, tag string")
    out = salted_join(big, small, "k", salt=8)
    assert out.count() == 10_000
    # inspect the salted big side directly: the hot key occupies many buckets
    from iceberg_catalog_migrator_spark.functions.skew import SALT_COL
    salted_big = big.withColumn(SALT_COL, (F.rand(seed=42) * 8).cast("int"))
    n_buckets = salted_big.filter(F.col("k") == 1).select(SALT_COL).distinct().count()
    assert n_buckets == 8
