"""SparkSession factory.

One place to configure the session so every entry point (tests, bench,
CLI, ``__spark_entry__``) gets identical semantics:

- UTC session timezone — timestamps in the testdata parquet are
  timezone-naive; pinning UTC makes ``date_trunc``/``extract`` agree with
  the DuckDB oracle.
- AQE on — runtime coalescing of shuffle partitions and skew-join
  handling; at 100 TB this is what keeps the 32 (locally) /
  thousands (cluster) of shuffle partitions right-sized.
- Arrow on — every Pandas UDF crosses the JVM/Python boundary in
  columnar batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "iceberg-catalog-migrator-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32) so local runs
    saturate the container; on a real cluster the caller passes the real
    master / lets spark-submit inject it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # split size = min(maxPartitionBytes, max(openCostInBytes,
        # totalBytes/parallelism)); a small open cost lets the local
        # bench's ~10 MB fixtures split into one task per core instead
        # of one task per file (cluster deployments override this).
        .config("spark.sql.files.openCostInBytes", str(128 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
