"""Sink coverage: partitioned/sorted parquet writes round-trip.

The reference's sinks are identifier report files (covered in
test_cli.py); an analytics engine additionally needs data sinks. These
tests pin the two write shapes that matter at 100 TB: hive-style
partitioning (partition pruning on read) and sorted-within-partition
files (row-group skipping)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_migrator_spark.sources import load_table


def test_partitioned_write_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "li_by_flag")
    li.write.partitionBy("l_returnflag").parquet(out)
    # hive-style directories exist
    flags = {d.split("=")[1] for d in os.listdir(out) if d.startswith("l_returnflag=")}
    assert flags == {r.l_returnflag for r in li.select("l_returnflag").distinct().collect()}
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    # a partition filter must prune at planning time, not scan-and-filter
    pruned = back.filter(F.col("l_returnflag") == "R")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "l_returnflag=R" in plan
    assert pruned.count() == li.filter(F.col("l_returnflag") == "R").count()


def test_sorted_write_roundtrip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_sorted")
    (
        orders.repartition(4, "o_custkey")
        .sortWithinPartitions("o_orderdate")
        .write.parquet(out)
    )
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # values survive the round-trip exactly
    a = orders.agg(F.sum("o_orderkey"), F.min("o_orderdate"), F.max("o_totalprice")).collect()
    b = back.agg(F.sum("o_orderkey"), F.min("o_orderdate"), F.max("o_totalprice")).collect()
    assert a == b
