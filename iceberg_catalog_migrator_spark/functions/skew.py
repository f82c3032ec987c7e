"""Skew mitigation: salted equi-join.

AQE's skew-join split handles most skew at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on in ``session.get_spark``),
but it only splits *sort-merge* join partitions. When a hot key must go
through a shuffle join and AQE can't help (e.g. aggregation-after-join
pipelines that pin the partitioning), explicit salting is the tool:
replicate the small side SALT ways, scatter the big side's hot keys
uniformly across the salt space, join on (key, salt).

Cost model: big side gets one extra uniform-random column (no extra
shuffle — the salt rides into the join's own exchange); small side is
replicated SALT×, so keep SALT modest (8-32) and the small side small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salt-scattered
    partitioning for skewed keys.

    Each big-side row lands in one of ``salt`` buckets via seeded
    ``F.rand`` — the seed makes *placement* reproducible, but the join
    result equals the plain join's multiset for ANY placement (every
    (key, salt) pair exists on the replicated small side), so the
    randomness never reaches the output; tests assert exact equality."""
    salted_big = big.withColumn(
        SALT_COL, (F.rand(seed=42) * salt).cast("int")
    )
    salts = big.sparkSession.range(salt).select(F.col("id").cast("int").alias(SALT_COL))
    salted_small = small.crossJoin(F.broadcast(salts))
    joined = salted_big.join(salted_small, [on, SALT_COL], how)
    return joined.drop(SALT_COL)
