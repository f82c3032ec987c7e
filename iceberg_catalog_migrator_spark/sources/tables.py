"""Loaders for the testdata star schema (TESTDATA.md).

All reads go through ``spark.read.parquet`` so Catalyst's vectorized
parquet scan, predicate pushdown, and column pruning apply. Nothing here
collects to the driver.

**Ingest cache.** The driver's fixtures are single-file, single-row-group
parquet — unsplittable, so every scan (and the partial aggregation fused
into its stage) runs on ONE core no matter the cluster size. A real
engine ingests data into its preferred layout (what an Iceberg table
write with sized files does); here that step is a one-time, driver-side
re-chunk of each large fixture into ``$SPARK_GRAFT_INGEST_CACHE``
(default ``/tmp/spark_graft_ingest``) with one row group per local core,
after which Spark's byte-range splits parallelize the scan. Rows, types
and values are byte-identical; set ``SPARK_GRAFT_NO_INGEST_CACHE=1`` to
read the originals directly.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor the
# star schema supports (region/nation are bounded; customer/supplier/part
# grow with SF but stay orders of magnitude below the fact tables).
BROADCASTABLE = frozenset({"region", "nation"})


INGEST_CACHE_DIR = os.environ.get("SPARK_GRAFT_INGEST_CACHE", "/tmp/spark_graft_ingest")
# low threshold: even a 5k-row documents table fans out 380k shingles
# downstream, so single-partition scans serialize whole pipelines.
# Tables below this are broadcast-size dims where splits buy nothing.
INGEST_MIN_ROWS = 1_000
TARGET_SPLITS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _ingested_path(sf_dir: str, name: str) -> str:
    """Path to a splittable copy of the fixture (see module docstring).

    Returns the original path for small tables, already-chunked files,
    or when the cache is disabled/unavailable."""
    src = os.path.join(sf_dir, f"{name}.parquet")
    if os.environ.get("SPARK_GRAFT_NO_INGEST_CACHE"):
        return src
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover
        return src
    try:
        md = pq.ParquetFile(src).metadata
    except Exception:  # pragma: no cover - unreadable footer: let Spark error
        return src
    if md.num_rows < INGEST_MIN_ROWS or md.num_row_groups >= TARGET_SPLITS:
        return src
    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    dst = os.path.join(INGEST_CACHE_DIR, key, f"{name}.parquet")
    if os.path.exists(dst) and os.path.getmtime(dst) >= os.path.getmtime(src):
        return dst
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    rows_per_group = -(-md.num_rows // TARGET_SPLITS)
    tmp = f"{dst}.tmp.{os.getpid()}"
    pq.write_table(pq.read_table(src), tmp, row_group_size=rows_per_group)
    os.replace(tmp, dst)  # atomic: concurrent sessions see old or new, never partial
    return dst


# Unresolved-DataFrame memo: `spark.read.parquet` pays a driver-side
# file listing + footer schema read per call, and a bench/oracle run
# issues hundreds of load_table calls for the same ten paths. The memo
# returns the SAME DataFrame object (an immutable logical plan — no
# data or results are cached; every action still scans the parquet),
# keyed by applicationId so a new session never reuses a stopped
# session's plan.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _DF_CACHE.get(key)
    if cached is None:
        if name == "events":
            cached = _load_events(spark, sf_dir)
        else:
            cached = spark.read.parquet(_ingested_path(sf_dir, name))
        _DF_CACHE[key] = cached
    return cached


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events, normalizing ``ts`` to TimestampType.

    Fixture generations differ: some store ``ts`` as parquet
    TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
    nanos as long via the legacy conf, then convert with integer
    division, never through double, which loses precision above 2**53),
    current ones store plain ``timestamp[us]``. Branch on the schema
    Spark actually read so both work; either way downstream code sees
    a session-semantics TimestampType column."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(_ingested_path(sf_dir, "events"))
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
