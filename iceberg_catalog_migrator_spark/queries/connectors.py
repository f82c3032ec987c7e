"""Queries over the Python Data Source connector (sources/synthetic.py).

The connector generates rows as a pure function of the row index, so
DuckDB replays the identical dataset from ``range(n)`` — a zero-input
partition-parallel source whose output is still fully value-checked
cross-engine. ``sf_dir`` is accepted (registry contract) but unused:
the source's size comes from its options, not the fixture directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, dsum_expr
from ..sources.synthetic import (
    SYNTH_SOURCE_NAME,
    register_synthetic_source,
    synthetic_oracle_cte,
)
from .registry import register_query

_ROWS = 120_000
_USERS = 997


@register_query(
    "synthetic_source_type_stats",
    oracle=f"""
    WITH {synthetic_oracle_cte(_ROWS, _USERS)}
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {dsum_expr("value")} AS sum_value,
           MIN(ts) AS min_ts, MAX(ts) AS max_ts
    FROM ev
    GROUP BY event_type
    """,
    description=(
        "per-type stats over the zero-input Python Data Source connector "
        "(Arrow-batched partition-parallel generator, DuckDB replays from range())"
    ),
)
def synthetic_source_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_synthetic_source(spark)
    ev = (
        spark.read.format(SYNTH_SOURCE_NAME)
        .option("rows", str(_ROWS))
        .option("n_users", str(_USERS))
        .load()
    )
    return ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        dsum("value").alias("sum_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
